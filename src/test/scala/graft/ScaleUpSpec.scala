package graft

import org.apache.spark.sql.functions._

/** [[ScaleUp]] — the sf1 spot-bench generator. The properties that make
  * the scaled corpus a FAIR reps× (and not an artificially easy or
  * quadratically hard one) are pinned here: replica-0 identity, key
  * disjointness, the permutation invariants (token multiset preserved;
  * within-replica exact-dup and prefix-aligned near-dup structure
  * intact; cross-replica clone shingle overlap destroyed — including
  * for pure-tail docs shorter than one 13-block), order-invariant
  * per-doc statistics (quality / langId / token count) preserved
  * bit-for-bit, and embedding rotation preserving within-replica dot
  * products.
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  // word 3-gram Jaccard — the dedup family's similarity measure
  private def jac(a: String, b: String): Double = {
    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private val long26 = (1 to 26).map(i => f"a$i%02d").mkString(" ")
  private val short10 = (1 to 10).map(i => f"b$i%02d").mkString(" ")
  private val prefix26 = (1 to 26).map(i => f"c$i%02d").mkString(" ")
  // every movable length class must offer ≥ 2 affine strides (size 5
  // gives units {2,3,4}) so the generation rename (reps > 12) supports
  // maxGen 2 — vocabRenames rejects thinner corpora loudly (spec'd below)
  private val stoppy = "the cat sat bat the mat and it is that good mood here nows yess"
  private val docs = Seq(
    (0L, long26, "en", "src0"),
    (1L, long26, "en", "src1"), // exact dup of 0
    (2L, short10, "de", "src0"), // pure-tail doc (< one 13-block)
    (3L, prefix26 + " c27", "fr", "src2"), // prefix-aligned near-dup pair
    (4L, prefix26 + " c27 c28", "fr", "src2"),
    (5L, stoppy, "en", "src3"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def textsOf(out: org.apache.spark.sql.DataFrame, orig: Long, reps: Int): Seq[String] =
    (0 until reps).map { r =>
      out.filter(col("doc_id") === orig + r * 10000000L)
        .select("text").as[String].head()
    }

  test("reps× rows, disjoint keys, replica 0 bit-identical") {
    val out = ScaleUp.scaleDocuments(spark, docs, 3).cache()
    assert(out.count() === 18L)
    assert(out.select("doc_id").distinct().count() === 18L)
    val rep0 = out.filter(col("doc_id") < 10000000L)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val src = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(rep0 === src)
  }

  test("permutation: token multiset preserved, n_chars recomputed") {
    val out = ScaleUp.scaleDocuments(spark, docs, 3)
    val bad = out.select(
        sort_array(split(col("text"), " ")).as("sorted"),
        pmod(col("doc_id"), lit(10000000L)).as("orig"),
        col("n_chars"), length(col("text")).as("len"))
      .join(docs.select(col("doc_id").as("orig"),
        sort_array(split(col("text"), " ")).as("src_sorted")), "orig")
      .filter(col("sorted") =!= col("src_sorted") || col("n_chars") =!= col("len"))
    assert(bad.count() === 0L)
  }

  test("within-replica exact dups survive; cross-replica clones never collide") {
    val out = ScaleUp.scaleDocuments(spark, docs, 3).cache()
    // docs 0 and 1 are exact dups (same text, same length → same perm):
    // each replica holds exactly one dup group, never cross-replica
    val dupGroups = out.groupBy(col("text")).count().filter(col("count") >= 2)
    assert(dupGroups.count() === 3L)
  }

  test("cross-replica clone 3-gram overlap destroyed — full-block and pure-tail docs") {
    val out = ScaleUp.scaleDocuments(spark, docs, 3).cache()
    for (orig <- Seq(0L, 2L)) { // 26-token (2 full blocks) and 10-token (pure tail)
      val ts = textsOf(out, orig, 3)
      for (i <- 0 until 3; j <- i + 1 until 3)
        assert(jac(ts(i), ts(j)) <= 0.15,
          s"doc $orig reps $i/$j too similar: ${ts(i)} | ${ts(j)}")
    }
  }

  test("short pure-tail docs (2–10 tokens) never repeat rep 0; clone families bounded") {
    // L ≤ 4 hits the deal's k = 1 identity floor, L = 5..8 collapses
    // most reps onto the same k, and L = 9's k-cap collides reps 5/6 —
    // without the ShortTailPerms table those lengths clone across
    // reps. L = 10 exercises the first real deal; L = 1 is the
    // documented invariant floor.
    val short = Seq(
      (10L, "s1", "en", "srcS"),
      (11L, "t1 t2", "en", "srcS"),
      (12L, "u1 u2 u3", "en", "srcS"),
      (13L, "v1 v2 v3 v4", "en", "srcS"),
      (14L, "w1 w2 w3 w4 w5", "en", "srcS"),
      (15L, "x1 x2 x3 x4 x5 x6", "en", "srcS"),
      (16L, "y1 y2 y3 y4 y5 y6 y7", "en", "srcS"),
      (17L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "srcS"),
      (18L, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "en", "srcS"),
      (19L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10", "en", "srcS"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = ScaleUp.scaleDocuments(spark, short, 12).cache()
    for (orig <- 11L to 19L) {
      val ts = textsOf(out, orig, 12)
      // token multiset preserved by every perm
      assert(ts.forall(_.split(" ").sorted.sameElements(ts.head.split(" ").sorted)))
      for (r <- 1 until 12)
        assert(ts(r) != ts(0), s"doc $orig rep $r reproduced rep 0: ${ts(r)}")
    }
    // L ≥ 4: the table perms (and the L = 10 deal) are pairwise
    // DISTINCT across all perturbed reps — no cross-replica clone
    // families at all
    for (orig <- 13L to 19L) {
      val ts = textsOf(out, orig, 12)
      assert(ts.distinct.size === ts.size,
        s"doc $orig has identical texts across replicas: $ts")
    }
    // L = 3 cycles 5 non-identity perms: worst family ⌈11/5⌉ = 3
    assert(textsOf(out, 12L, 12).drop(1).groupBy(identity).values.map(_.size).max <= 3)
    // the documented floors: a 1-token doc is invariant under every
    // perm; a 2-token doc has exactly one non-identity perm (the swap)
    assert(textsOf(out, 10L, 12).toSet === Set("s1"))
    assert(textsOf(out, 11L, 12).drop(1).toSet === Set("t2 t1"))
  }

  test("short pure-tail docs: every cross-replica pair strictly below the 0.5 Jaccard gate") {
    // The ADVICE-r9 hole: rep-keyed ROTATION left L ≤ 8 pure-tail docs
    // at word-3-gram Jaccard ≥ 0.5 across replicas (28/28 rotation
    // pairs at L = 8 passed the engine's jac_micro ≥ 500000 gate),
    // re-forming the reps² candidate cliques the generator exists to
    // avoid. The ShortTailPerms tables are offline-verified to stay
    // strictly below: zero shared 3-grams at L = 5..9, ≤ 1 of 2
    // (Jaccard 1/3) at L = 4. Pinned here against rep 0 AND pairwise,
    // with L = 10 covering the first length the deal owns.
    val short = (4 to 10).map { l =>
      (20L + l, (1 to l).map(i => s"g${l}x$i").mkString(" "), "en", "srcG")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = ScaleUp.scaleDocuments(spark, short, 12).cache()
    for (l <- 4 to 10) {
      val ts = textsOf(out, 20L + l, 12)
      for (i <- 0 until 12; j <- i + 1 until 12)
        assert(jac(ts(i), ts(j)) < 0.5,
          s"L=$l reps $i/$j at/above the gate: ${ts(i)} | ${ts(j)}")
    }
    // and through the ENGINE's own near-dup gate: zero cross-replica
    // pairs at the default jac_micro >= 500000 threshold
    val pairs = graft.operators.Dedup.jaccardPairs(out, "doc_id", "text")
      .filter(floor(col("id1") / 10000000L) =!= floor(col("id2") / 10000000L))
    assert(pairs.count() === 0L)
  }

  test("prefix-aligned near-dup pairs keep their within-replica Jaccard") {
    val out = ScaleUp.scaleDocuments(spark, docs, 3).cache()
    val t3 = textsOf(out, 3L, 3)
    val t4 = textsOf(out, 4L, 3)
    val base = jac(t3(0), t4(0)) // rep 0 = the source pair: ≈ 0.96
    assert(base >= 0.9)
    for (r <- 1 until 3)
      assert(jac(t3(r), t4(r)) >= 0.8, // shared full blocks exact; only tails drift
        s"rep $r near-dup pair decorrelated: ${jac(t3(r), t4(r))}")
  }

  test("order-invariant per-doc statistics identical across replicas") {
    import graft.functions.TextFunctions
    val out = ScaleUp.scaleDocuments(spark, docs, 3)
    val distinctStats = out.select(
        pmod(col("doc_id"), lit(10000000L)).as("orig"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.langId(col("text")).as("lg"),
        TextFunctions.tokenCount(col("text")).as("nt"))
      .groupBy("orig").agg(countDistinct(col("q"), col("lg"), col("nt")).as("n"))
      .filter(col("n") =!= 1L)
    assert(distinctStats.count() === 0L)
  }

  test("generations (reps > 12): cross-generation clones decorrelated, stats preserved") {
    // 26 reps = bases 0..11 over generations 0, 1, 2. Replicas that
    // share a base but differ in generation have IDENTICAL positional
    // structure — only the vocabulary rename separates them, so this
    // pins the rename axis in isolation.
    val reps = 26
    val out = ScaleUp.scaleDocuments(spark, docs, reps).cache()
    assert(out.count() === docs.count() * reps)
    assert(out.select("doc_id").distinct().count() === docs.count() * reps)
    for (orig <- Seq(0L, 2L, 5L)) { // full-block, pure-tail, stopword-heavy
      val t = textsOf(out, orig, reps)
      // same base, different generation: the hardest pair (identical
      // perm) — gen 2 exists only for bases 0..1 (26 = 12+12+2 reps)
      for (b <- Seq(0, 1, 3); (g1, g2) <- Seq((0, 1), (0, 2), (1, 2))
           if b + 12 * g2 < reps) {
        val j = jac(t(b + 12 * g1), t(b + 12 * g2))
        assert(j < 0.5, s"doc $orig base $b gens $g1/$g2: jaccard $j")
      }
      // different base AND generation stays decorrelated too
      assert(jac(t(1), t(14)) < 0.5, s"doc $orig reps 1/14")
    }
    // order-invariant per-doc statistics identical across ALL 26 reps
    import graft.functions.TextFunctions
    val distinctStats = out.select(
        pmod(col("doc_id"), lit(10000000L)).as("orig"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.langId(col("text")).as("lg"),
        TextFunctions.tokenCount(col("text")).as("nt"),
        length(col("text")).as("nc"))
      .groupBy("orig")
      .agg(countDistinct(col("q"), col("lg"), col("nt"), col("nc")).as("n"))
      .filter(col("n") =!= 1L)
    assert(distinctStats.count() === 0L)
  }

  test("generations: renames are bijections, so within-generation structure is intact") {
    val reps = 26
    val out = ScaleUp.scaleDocuments(spark, docs, reps).cache()
    // exact-dup pair (0, 1) stays an exact pair inside EVERY replica
    for (r <- 0 until reps)
      assert(textsOf(out, 0L, reps)(r) === textsOf(out, 1L, reps)(r),
        s"rep $r: exact-dup pair broken")
    // prefix-aligned near-dup pair keeps its Jaccard in a renamed
    // generation (a token bijection is a shingle bijection)
    val t3 = textsOf(out, 3L, reps); val t4 = textsOf(out, 4L, reps)
    for (r <- Seq(13, 25))
      assert(jac(t3(r), t4(r)) >= 0.8, s"rep $r: ${jac(t3(r), t4(r))}")
    // token multiset sizes preserved (rename never merges two words)
    val badCounts = out.select(pmod(col("doc_id"), lit(10000000L)).as("orig"),
        size(split(col("text"), " ")).as("n"))
      .groupBy("orig").agg(countDistinct(col("n")).as("d"))
      .filter(col("d") =!= 1L)
    assert(badCounts.count() === 0L)
  }

  test("generations: any two renames agree on at most ONE movable word per class") {
    // 15 same-length words — the size where composite-modulus affine
    // maps collide on up to gcd(u−u′, 15) = 3 words; the prime-prefix
    // scheme (p = 13 here) must hold the ≤ 1 bound for every pair of
    // generations INCLUDING gen 0 (the identity)
    val words = (1 to 15).map(i => f"w$i%02d")
    val corpus = Seq((0L, (words ++ Seq("the", "a")).mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val maxGen = 4
    val renames = ScaleUp.vocabRenames(corpus, maxGen)
    val maps: Seq[Map[String, String]] =
      words.map(w => w -> w).toMap +: renames.map(m => words.map(w => w -> m.getOrElse(w, w)).toMap)
    for (g1 <- maps.indices; g2 <- maps.indices if g1 < g2) {
      val agree = words.count(w => maps(g1)(w) == maps(g2)(w))
      // p = 13 movable under the prime prefix; the 2-word remainder is
      // fixed in every generation and counts toward the overlap budget
      assert(agree <= 1 + (words.size - 13),
        s"gens $g1/$g2 agree on $agree movable words")
    }
    // and every rename is a bijection over its movable prefix
    renames.foreach { m => assert(m.values.toSet.size == m.size) }
  }

  test("generations: a corpus with a too-small movable length class is rejected loudly") {
    // {on, ok} is a 2-member movable class — generations 0 and 2 would
    // collide on it (rotation by 2 mod 2 = identity), silently sharing
    // those words' shingles across generations; the generator must
    // refuse rather than degrade the cross-replica guarantee
    val thin = Seq((0L, "the on ok cat sat mat rat bat hat pat vat fat " +
        "tat oat eat", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val e = intercept[IllegalArgumentException] {
      ScaleUp.scaleDocuments(spark, thin, 26).collect()
    }
    assert(e.getMessage.contains("movable length class"))
  }

  test("eras (reps > 48): cross-era clones decorrelated, stats preserved") {
    // 100 reps = bases 0..11 × generations 0..3 × eras 0..2 — the sf10
    // decomposition. Same-base same-gen cross-era pairs are the
    // hardest (identical positional structure AND identical generation
    // rename — only the character cipher separates them).
    val reps = 100
    val out = ScaleUp.scaleDocuments(spark, docs, reps).cache()
    assert(out.count() === docs.count() * reps)
    assert(out.select("doc_id").distinct().count() === docs.count() * reps)
    for (orig <- Seq(0L, 2L, 5L)) { // full-block, pure-tail, stopword-heavy
      val t = textsOf(out, orig, reps)
      // (base, gen) fixed, era varies: reps r, r+48, r+96
      for (r <- Seq(0, 1, 13); (e1, e2) <- Seq((0, 1), (0, 2), (1, 2))
           if r + 48 * e2 < reps) {
        val j = jac(t(r + 48 * e1), t(r + 48 * e2))
        assert(j < 0.5, s"doc $orig rep $r eras $e1/$e2: jaccard $j")
      }
      // different base AND gen AND era stays decorrelated too
      assert(jac(t(1), t(62)) < 0.5, s"doc $orig reps 1/62")
    }
    // order-invariant per-doc statistics identical across ALL 100 reps
    import graft.functions.TextFunctions
    val distinctStats = out.select(
        pmod(col("doc_id"), lit(10000000L)).as("orig"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.langId(col("text")).as("lg"),
        TextFunctions.tokenCount(col("text")).as("nt"),
        TextFunctions.stopwordCount(col("text")).as("sw"),
        length(col("text")).as("nc"))
      .groupBy("orig")
      .agg(countDistinct(col("q"), col("lg"), col("nt"), col("sw"),
        col("nc")).as("n"))
      .filter(col("n") =!= 1L)
    assert(distinctStats.count() === 0L)
    // the cipher is a token bijection: within-replica structure intact
    // in the deepest era — exact dups stay exact, near-dups keep Jaccard
    val t0 = textsOf(out, 0L, reps); val t1 = textsOf(out, 1L, reps)
    for (r <- Seq(50, 99)) assert(t0(r) === t1(r), s"rep $r: exact-dup pair broken")
    val t3 = textsOf(out, 3L, reps); val t4 = textsOf(out, 4L, reps)
    for (r <- Seq(50, 99))
      assert(jac(t3(r), t4(r)) >= 0.8, s"rep $r: ${jac(t3(r), t4(r))}")
  }

  test("eras: token sets of distinct eras share ONLY scorer-fixed words") {
    val reps = 100
    val out = ScaleUp.scaleDocuments(spark, docs, reps).cache()
    def toks(rep: Long): Set[String] =
      out.filter(col("doc_id") >= rep * 10000000L &&
          col("doc_id") < (rep + 1) * 10000000L)
        .select(explode(split(col("text"), " ")).as("t"))
        .distinct().as[String].collect().toSet
    // reps 0 / 48 / 96 = eras 0 / 1 / 2 at base 0, gen 0
    val fixedish = Set("the", "a", "an", "of", "and", "is", "in", "to",
      "it", "that", "slow", "drop", "error") ++
      Seq("der", "die", "das", "und", "ist", "nicht", "el", "la", "de",
        "y", "es", "no", "le", "et", "est", "pas", "not")
    for ((r1, r2) <- Seq((0L, 48L), (0L, 96L), (48L, 96L))) {
      val shared = toks(r1).intersect(toks(r2))
      assert(shared.subsetOf(fixedish),
        s"reps $r1/$r2 share movable words: ${shared.diff(fixedish)}")
    }
  }

  test("eras: a vocabulary realizing constant-shift partner words is rejected loudly") {
    // eras 1 and 2 share a multiplier (3) and differ by offset 2, so
    // cipher1(w') == cipher2(w) exactly when w' = w shifted by
    // 2·3⁻¹ = 18 letters: 'ace' + 18 = 'suw'. With one era the pair
    // is harmless (era 1 never collides with era 0 — no fixed
    // letters), but at 2 eras the generator must refuse rather than
    // share shingles across eras
    val v = Seq("ace", "suw", "cat", "dog", "pig", "bat", "rat",
      "mole", "lion", "wolf", "hare", "toad",
      "zebra", "tiger", "otter", "stoat", "moose")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.eraRenames(v, 2)
    }
    assert(e.getMessage.contains("era ciphers collide"))
    // one era is fine on the same vocabulary
    assert(ScaleUp.eraRenames(v, 1).head.size == v.size)
  }

  test("reps beyond the replica space are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      ScaleUp.scaleDocuments(spark, docs, 129).collect()
    }
    assert(e.getMessage.contains("1..128"))
  }

  private val embs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f, 4.0f), 0),
    (1L, Seq(4.0f, 3.0f, 2.0f, 1.0f), 1),
    (2L, Seq(0.0f, 1.0f, 0.0f, -1.0f), 0))
    .toDF("vec_id", "embedding", "label")

  test("embeddings: cyclic rotation preserves within-replica pairwise dot products") {
    val out = ScaleUp.scaleEmbeddings(spark, embs, 3).cache()
    assert(out.count() === 9L)
    assert(out.select("vec_id").distinct().count() === 9L)
    def dots(rep: Long): Map[(Long, Long), Double] = {
      val v = out.filter(col("vec_id") >= rep * 10000000L &&
          col("vec_id") < (rep + 1) * 10000000L)
        .select(pmod(col("vec_id"), lit(10000000L)).as("id"), col("embedding"))
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          aggregate(zip_with(col("a.embedding"), col("b.embedding"),
            (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("dot"))
        .as[(Long, Long, Double)].collect()
        .map { case (i, j, d) => (i, j) -> d }.toMap
    }
    val d0 = dots(0)
    assert(dots(1) === d0)
    assert(dots(2) === d0)
    // and the rotation actually moved values for rep 1 (dim 4, off 1)
    val v0 = out.filter(col("vec_id") === 0L).select("embedding").as[Seq[Float]].head()
    val v1 = out.filter(col("vec_id") === 10000000L).select("embedding").as[Seq[Float]].head()
    assert(v0 != v1 && v0.sorted === v1.sorted)
  }

  test("embeddings past the rotation space: sign-flip era keeps dots exact, decorrelates replicas") {
    // dim 4 → reps 5..8 re-enter rotations 0..3 with the odd-coordinate
    // sign flip (rep/dim odd). The flip is diagonal ±1 (orthogonal):
    // within-replica pairwise dot products stay EXACT, while the same
    // base vector never repeats across the 8 transforms.
    val reps = 8
    val out = ScaleUp.scaleEmbeddings(spark, embs, reps).cache()
    assert(out.count() === 3L * reps)
    def dots(rep: Long): Map[(Long, Long), Double] = {
      val v = out.filter(col("vec_id") >= rep * 10000000L &&
          col("vec_id") < (rep + 1) * 10000000L)
        .select(pmod(col("vec_id"), lit(10000000L)).as("id"), col("embedding"))
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          aggregate(zip_with(col("a.embedding"), col("b.embedding"),
            (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("dot"))
        .as[(Long, Long, Double)].collect()
        .map { case (i, j, d) => (i, j) -> d }.toMap
    }
    val d0 = dots(0)
    for (r <- 1 until reps) assert(dots(r) === d0, s"rep $r dots drifted")
    // all 8 transforms of vector 0 are pairwise distinct (no replica
    // is a verbatim copy of another), and every one preserves the
    // value multiset up to sign
    val vs = (0 until reps).map { r =>
      out.filter(col("vec_id") === r * 10000000L)
        .select("embedding").as[Seq[Float]].head()
    }
    assert(vs.distinct.size === reps, s"duplicate embedding transforms: $vs")
    assert(vs.forall(_.map(math.abs).sorted == vs.head.map(math.abs).sorted))
    // the flip half really flips: rep 4 = rotation 0 + odd flips
    assert(vs(4) === vs(0).zipWithIndex.map { case (x, i) =>
      if (i % 2 == 1) -x else x })
  }

  test("embeddings Walsh eras (reps > 2·dim): exact within-replica dots, all transforms distinct") {
    // dim 4 → 4 rotations × 4 Walsh sign patterns (e = rep/4 ∈ 0..3)
    // = 16 replicas. The two-era scheme cycled e mod 2, so rep ≥ 8
    // would have been an IDENTICAL copy of rep − 8; the Walsh axis
    // must keep all 16 pairwise distinct while every diagonal ±1
    // pattern preserves within-replica dot products exactly.
    val reps = 16
    val out = ScaleUp.scaleEmbeddings(spark, embs, reps).cache()
    assert(out.count() === 3L * reps)
    def dots(rep: Long): Map[(Long, Long), Double] = {
      val v = out.filter(col("vec_id") >= rep * 10000000L &&
          col("vec_id") < (rep + 1) * 10000000L)
        .select(pmod(col("vec_id"), lit(10000000L)).as("id"), col("embedding"))
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          aggregate(zip_with(col("a.embedding"), col("b.embedding"),
            (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("dot"))
        .as[(Long, Long, Double)].collect()
        .map { case (i, j, d) => (i, j) -> d }.toMap
    }
    val d0 = dots(0)
    for (r <- 1 until reps) assert(dots(r) === d0, s"rep $r dots drifted")
    val vs = (0 until reps).map { r =>
      out.filter(col("vec_id") === r * 10000000L)
        .select("embedding").as[Seq[Float]].head()
    }
    assert(vs.distinct.size === reps, s"duplicate embedding transforms: $vs")
    // era 1 IS the legacy odd-coordinate flip: corpora generated under
    // the two-era scheme reproduce bit-for-bit
    assert(vs(4) === vs(0).zipWithIndex.map { case (x, i) =>
      if (i % 2 == 1) -x else x })
    // the Walsh half-difference property the decorrelation claim rests
    // on: any two distinct patterns disagree on EXACTLY dim/2 indices
    for (e1 <- 0 until 4; e2 <- 0 until 4 if e1 < e2)
      assert((0 until 4).count(i =>
        Integer.bitCount(i & e1) % 2 != Integer.bitCount(i & e2) % 2) == 2,
        s"patterns $e1 vs $e2")
    // past the replica space: rejected loudly, not silently duplicated
    val e = intercept[IllegalArgumentException] {
      ScaleUp.scaleEmbeddings(spark, embs, 17).collect()
    }
    assert(e.getMessage.contains("1..16"))
  }

  test("events/lineitem: key shifts only — payloads untouched, counts scale") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"),
      7L, "click", 1.5d, "{}")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ScaleUp.scaleEvents(spark, ev, 4).cache()
    assert(out.count() === 4L)
    assert(out.select("event_id").distinct().count() === 4L)
    assert(out.select("user_id").distinct().count() === 4L)
    assert(out.select("ts", "event_type", "value", "props").distinct().count() === 1L)
    val li = Seq((1L, 2L, 3L, 1, 5.0d, 100.0d, 0.1d, 0.02d, "N", "O",
      java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))).toDF(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val lo = ScaleUp.scaleLineitem(spark, li, 4).cache()
    assert(lo.count() === 4L)
    assert(lo.select("l_orderkey").distinct().count() === 4L)
    assert(lo.drop("l_orderkey").distinct().count() === 1L)
  }
}
