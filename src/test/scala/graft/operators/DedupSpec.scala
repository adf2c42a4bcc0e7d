package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit, pmod, shiftleft, size, slice, zip_with}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words entirely here now"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "unrelated text about spark and scala engines")
  ).toDF("doc_id", "text")

  test("exactGroups: one survivor per identical text, min id, copy count") {
    val g = Dedup.exactGroups(docs, Seq("text"), "doc_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g === Set((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
    val surv = Dedup.exactSurvivors(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(surv === Set(0L, 1L, 2L, 4L))
  }

  test("jaccardPairs: hand-computed 3-gram jaccard") {
    // docs 0/1: 7 shingles each, 6 shared → j = 6/8 = 0.75
    // docs 0/3: identical → j = 1
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L, 750000L), (0L, 3L, 1000000L), (1L, 3L, 750000L)))
  }

  test("lshCandidates finds exact and high-jaccard dups") {
    val cand = Dedup.lshCandidates(docs, "doc_id", "text").as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 3L)), "exact dup must collide in every band")
    assert(cand.contains((0L, 1L)) && cand.contains((1L, 3L)),
      s"0.75-jaccard pair should collide in ≥1 of 8 bands (p≈0.98): $cand")
  }

  test("lshVerifiedPairs == jaccardPairs restricted to LSH candidates") {
    val v = Dedup.lshVerifiedPairs(docs, "doc_id", "text").as[(Long, Long, Long)].collect().toSet
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(v.subsetOf(j))
    assert(v.contains((0L, 3L, 1000000L)))
  }

  // a 6-wide template mega-cluster (identical texts → identical band
  // keys in EVERY band) next to one ordinary near-dup pair — the
  // 100 TB failure shape the bucket-width cap exists for, in miniature
  private lazy val templated: DataFrame = {
    val template = "some boilerplate navigation header repeated on every single crawled page"
    (Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (2L, "completely different words entirely here now")) ++
      (10L to 15L).map(i => (i, template))).toDF("doc_id", "text")
  }

  test("maxBucketWidth: mega-cluster buckets dropped whole; narrow-bucket pairs survive") {
    // uncapped: the 6-clique contributes C(6,2)=15 exact-dup pairs
    val un = Dedup.lshVerifiedPairs(templated, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(un.count { case (a, b, _) => a >= 10L && b >= 10L } === 15)
    assert(un.contains((0L, 1L, 750000L)))
    // capped at 4: every template bucket has width 6 > 4 → dropped in
    // every band → zero template pairs; the (0,1) pair lives in
    // width-2 buckets and keeps its exact verified score
    val capped = Dedup.lshVerifiedPairs(templated, "doc_id", "text",
      maxBucketWidth = Some(4)).as[(Long, Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b, _) => a >= 10L && b >= 10L },
      s"mega-cluster pairs leaked through the cap: $capped")
    assert(capped.contains((0L, 1L, 750000L)))
    // same contract on the bare candidate path
    val cand = Dedup.lshCandidates(templated, "doc_id", "text",
      maxBucketWidth = Some(4)).as[(Long, Long)].collect().toSet
    assert(!cand.exists { case (a, b) => a >= 10L && b >= 10L })
    assert(cand.contains((0L, 1L)))
  }

  test("lshBucketAudit: per-band drop accounting matches the mega-cluster") {
    val audit = Dedup.lshBucketAudit(templated, "doc_id", "text", maxBucketWidth = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(audit.length === 8) // one row per band
    for ((band, nBuckets, maxW, nDropped, rowsDropped) <- audit) {
      assert(maxW === 6L, s"band $band max width $maxW")
      assert(nDropped === 1L, s"band $band dropped $nDropped buckets")
      assert(rowsDropped === 6L, s"band $band dropped $rowsDropped rows")
      assert(nBuckets >= 2L && nBuckets <= 4L, s"band $band has $nBuckets buckets")
    }
  }

  test("hammingPairs maxBucketWidth: identical-signature clique dropped, close pair kept") {
    val hashed = ((1L to 5L).map(i => (i, 1234567L)) ++
      Seq((10L, 7654321L), (11L, 7654321L ^ 1L))).toDF("id", "sig")
    val un = Dedup.hammingPairs(hashed, "id", "sig", maxHamming = 1, bits = 64, bands = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(un.count { case (a, b, _) => a <= 5L && b <= 5L } === 10) // C(5,2) at hamming 0
    assert(un.contains((10L, 11L, 1L)))
    val capped = Dedup.hammingPairs(hashed, "id", "sig", maxHamming = 1, bits = 64,
      bands = 4, maxBucketWidth = Some(3)).as[(Long, Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b, _) => a <= 5L && b <= 5L },
      s"identical-signature clique leaked through the cap: $capped")
    // the close pair still collides in a band whose bucket holds only
    // the two of them (band 1: 0x74), even though the shared-zero top
    // bands (width 7) are dropped
    assert(capped.contains((10L, 11L, 1L)))
  }

  test("cosinePairsLsh maxBucketWidth: identical-embedding cluster dropped, other pair kept") {
    // the classic embedding mega-cluster: a broken encoder emits the
    // same vector for thousands of items — every copy shares every
    // hyperplane signature, so one (table, signature) bucket per table
    // holds the whole cluster
    val vecA = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val vecB = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val embs = ((10L to 15L).map(i => (i, vecA)) ++ Seq((1L, vecB), (2L, vecB)))
      .toDF("id", "vec")
    val un = Dedup.cosinePairsLsh(embs, "id", "vec", minCosineMicro = 900000L,
      dim = 4, planes = 4, tables = 2).as[(Long, Long, Long)].collect().toSet
    assert(un.count { case (a, b, _) => a >= 10L && b >= 10L } === 15)
    assert(un.contains((1L, 2L, 1000000L)))
    val capped = Dedup.cosinePairsLsh(embs, "id", "vec", minCosineMicro = 900000L,
      dim = 4, planes = 4, tables = 2, maxBucketWidth = Some(4))
      .as[(Long, Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b, _) => a >= 10L && b >= 10L },
      s"embedding mega-cluster leaked through the cap: $capped")
    assert(capped.contains((1L, 2L, 1000000L)))
  }

  test("simHashPairs maxBucketWidth: identical-text signature clique dropped") {
    val un = Dedup.simHashPairs(templated, "doc_id", "text", maxHamming = 2,
      bits = 32, bands = 4).as[(Long, Long, Long)].collect().toSet
    assert(un.count { case (a, b, h) => a >= 10L && b >= 10L && h == 0L } === 15)
    val capped = Dedup.simHashPairs(templated, "doc_id", "text", maxHamming = 2,
      bits = 32, bands = 4, maxBucketWidth = Some(4))
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(un))
    assert(!capped.exists { case (a, b, _) => a >= 10L && b >= 10L },
      s"signature clique leaked through the cap: $capped")
  }

  test("lshDedupAgainst maxBucketWidth: capped corpus mega-cluster stops gating the batch") {
    val template = "some boilerplate navigation header repeated on every single crawled page"
    val corpus = (10L to 15L).map(i => (i, template)).toDF("doc_id", "text")
    val batch = Seq((100L, template), // near-dup (exact) of the mega-cluster
      (101L, "genuinely novel content nothing else resembles anywhere")).toDF("doc_id", "text")
    // uncapped: the templated batch doc is contaminated and dropped
    val un = Dedup.lshDedupAgainst(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(un === Set(101L))
    // capped at 4: the corpus-side buckets (width 6) are dropped, so
    // the templated batch doc SURVIVES — the documented recall
    // contract: mega-cluster membership is template-rule territory,
    // not pairwise dedup
    val capped = Dedup.lshDedupAgainst(batch, corpus, "doc_id", "text",
      maxBucketWidth = Some(4)).select("doc_id").as[Long].collect().toSet
    assert(capped === Set(100L, 101L))
  }

  test("simHash: identical texts get identical hashes; banded pairs complete vs brute force") {
    val h = docs.select($"doc_id", Dedup.simHash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) === h(3L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))

    // banded join must find exactly the pairs brute force finds
    val banded = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3, bits = 32, bands = 4)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (i, hi) <- h; (j, hj) <- h if i < j
      ham = java.lang.Long.bitCount(hi ^ hj)
      if ham <= 3
    } yield (i, j, ham.toLong)).toSet
    assert(banded === brute)
  }

  test("simHash64Pairs: banded 64-bit join complete vs brute force over packed signatures") {
    // rebuild the packed signature exactly as the operator does and
    // brute-force all pairs — the banding equi-join must find the same set
    val th = graft.functions.TextFunctions.tokenHashArray(
      graft.functions.TextFunctions.tokens($"text"))
    val sigs = docs.select($"doc_id", th.as("th")).filter(size($"th") >= 2)
      .select($"doc_id",
        Dedup.simHashFromHashes($"th", 32).as("lo"),
        Dedup.simHashFromHashes(zip_with(
          slice($"th", lit(1), size($"th") - 1), slice($"th", lit(2), size($"th") - 1),
          (a, b) => pmod(a * 131 + b, lit(1000000007L))), 32).as("hi"))
      .select($"doc_id", shiftleft($"hi", 34).bitwiseOR($"lo").as("sig"))
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j
      ham = java.lang.Long.bitCount(si ^ sj)
      if ham <= 3
    } yield (i, j, ham.toLong)).toSet
    assert(brute.nonEmpty, "fixture should contain a near pair (0/3 are exact dups)")
    val banded = Dedup.simHash64Pairs(docs, "doc_id", "text", maxHamming = 3, bands = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("hammingPairs: bits=64 signatures with the sign bit set band completely") {
    // top-band keys sign-extend (shiftright is arithmetic); both join
    // sides must key identically so negative signatures still pair
    val sigs = Map(
      1L -> (Long.MinValue | 5L),  // 1000...0101
      2L -> (Long.MinValue | 7L),  // 1000...0111  ham(1,2)=1
      3L -> 5L)                    // 0000...0101  ham(1,3)=1 (bit 63), ham(2,3)=2
    val df = sigs.toSeq.toDF("id", "sig")
    val got = Dedup.hammingPairs(df, "id", "sig", maxHamming = 1, bits = 64, bands = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("lshDedupAgainst: batch near-dups of corpus dropped; novel batch docs survive") {
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // exact dup of corpus 0
      (101L, "the quick brown fox jumps over the lazy cat"), // near-dup of corpus 0
      (102L, "totally novel content with no corpus overlap at all")
    ).toDF("doc_id", "text")
    val corpus = docs.select($"doc_id", $"text")
    val surv = Dedup.lshDedupAgainst(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(surv === Set(102L), s"got $surv")
  }

  test("cosinePairs: colinear vectors score 1e6, orthogonal filtered out") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(2.0, 0.0)), (2L, Seq(0.0, 1.0))
    ).toDF("id", "vec")
    val pairs = Dedup.cosinePairs(vecs, "id", "vec", 900000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L, 1000000L)))
  }

  test("cosinePairsLsh ⊆ exact cosinePairs; identical vectors always found") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val lsh = Dedup.cosinePairsLsh(emb, "vec_id", "embedding",
        minCosineMicro = 350000L, dim = 64, planes = 12, tables = 4)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Dedup.cosinePairs(emb, "vec_id", "embedding", 350000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "LSH discovery found nothing on the test corpus")
    assert(lsh.subsetOf(exact), "LSH pair not confirmed by exact scoring")
    // colinear duplicates agree on every plane -> always candidates
    import org.apache.spark.sql.functions._
    val dup = emb.limit(1).select(lit(999999L).as("vec_id"), $"embedding", $"label")
    val withDup = emb.select($"vec_id", $"embedding", $"label").unionAll(dup)
    val orig = emb.limit(1).select($"vec_id").as[Long].head()
    val found = Dedup.cosinePairsLsh(withDup, "vec_id", "embedding",
        minCosineMicro = 999999L, dim = 64, planes = 12, tables = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(found.exists(p => p._1 == orig && p._2 == 999999L),
      s"exact duplicate must collide in every table: $found")
  }

  test("jaccardPairs maxDocFreq: boilerplate shingles excluded from universe and fan-out") {
    // 20 docs sharing ONE boilerplate shingle + 2 true near-dups.
    // Uncapped: boilerplate alone creates 190 candidate pairs (none
    // survive the 0.5 threshold but all pay join fan-out). Capped at
    // df<=5 the boilerplate shingle leaves the universe entirely.
    val boiler = (10L until 30L).map(i => (i, s"standard legal disclaimer text u$i v$i w$i x$i"))
    val skewed = (Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon eta")) ++ boiler)
      .toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(skewed, "doc_id", "text", 3, 500000L,
      maxDocFreq = Some(5L)).as[(Long, Long, Long)].collect().toSet
    // docs 0/1: 4 shingles each, 3 shared -> 3/5 = 0.6; no boilerplate pair survives
    assert(capped === Set((0L, 1L, 600000L)))
    // with the cap above the max doc-freq, results equal the uncapped path
    val uncapped = Dedup.jaccardPairs(skewed, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Long)].collect().toSet
    val cappedHigh = Dedup.jaccardPairs(skewed, "doc_id", "text", 3, 500000L,
      maxDocFreq = Some(1000L)).as[(Long, Long, Long)].collect().toSet
    assert(cappedHigh === uncapped)
  }

  test("nearDupClusters: multi-hop chain resolves to ONE cluster; disjoint stays apart") {
    // 1–2, 2–3, 3–4 is a diameter-3 chain: a pairwise view never links
    // 1 and 4, the transitive closure must (needs ≥ 3 propagation hops)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val got = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("nearDupClusters: reliable-checkpoint mode yields identical clusters") {
    // the cluster-deployment configuration: lineage cut through a real
    // checkpoint directory instead of executor-local blocks
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val got = Dedup.nearDupClusters(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // the checkpoint actually landed on storage (not localCheckpoint)
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    assert(anyFile(new java.io.File(dir)), s"no checkpoint data under $dir")
  }

  test("nearDupClusters: empty pair set yields empty clustering") {
    val pairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.nearDupClusters(pairs).count() === 0L)
  }

  test("nearDupSurvivors: one row per cluster survives (min id), singletons kept") {
    val rows = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val kept = Dedup.nearDupSurvivors(rows, pairs, "doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 5L, 10L))
  }

  test("nearDupClusters on real near-dup pairs: cluster members share the survivor") {
    // exact dup (0,3) + near dup (0,1) chain through doc 0 ⇒ {0,1,3}
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 500000L)
      .select("id1", "id2")
    val got = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 3L -> 0L))
  }

  test("dedupAgainst: within-batch election AND cross-corpus anti both drop") {
    val existing = Seq(
      (100L, "standing corpus text one"),
      (101L, "standing corpus text two")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "fresh text alpha"),
      (2L, "fresh text alpha"),          // within-batch dup: loses to 1
      (3L, "standing corpus text two"),  // already in corpus: dropped
      (4L, "fresh text beta")
    ).toDF("doc_id", "text")
    val surv = Dedup.dedupAgainst(incoming, existing, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(surv === Set(1L, 4L))
    // empty corpus: only the within-batch election applies
    val none = existing.filter(lit(false))
    val survAll = Dedup.dedupAgainst(incoming, none, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(survAll === Set(1L, 3L, 4L))
  }

  test("chunkDedup: exact window boundaries, global first occurrence survives") {
    val d = Seq(
      (10L, "AAAABBBBCC"), // chunks at size 4: AAAA, BBBB, CC
      (11L, "BBBBAAAAZZ"), // BBBB/AAAA repeat doc 10's chunks at other positions
      (12L, "CCXX")        // CC repeats doc 10's tail chunk
    ).toDF("doc_id", "text")
    val surv = Dedup.chunkDedup(d, "doc_id", "text", chunkSize = 4)
      .as[(Long, Long, String)].collect().toSet
    // every distinct chunk keeps exactly its smallest (id, idx) occurrence
    assert(surv === Set(
      (10L, 0L, "AAAA"), (10L, 1L, "BBBB"), (10L, 2L, "CC"),
      (11L, 2L, "ZZ"), (12L, 0L, "CCXX")))
  }

  test("chunkDedup: within-doc repeats keep the smallest chunk_idx; empty text is one empty chunk") {
    val d = Seq((5L, "XYXYXY"), (6L, ""), (7L, "")).toDF("doc_id", "text")
    val surv = Dedup.chunkDedup(d, "doc_id", "text", chunkSize = 2)
      .as[(Long, Long, String)].collect().toSet
    // "XY" appears at idx 0,1,2 in doc 5 — only idx 0 survives; both
    // empty docs collapse to doc 6's single empty chunk
    assert(surv === Set((5L, 0L, "XY"), (6L, 0L, "")))
  }

  test("chunkDedup: disjoint corpora keep everything (no false merges)") {
    val d = Seq((1L, "abcdefgh"), (2L, "ijklmnop")).toDF("doc_id", "text")
    val surv = Dedup.chunkDedup(d, "doc_id", "text", chunkSize = 3)
      .as[(Long, Long, String)].collect()
    assert(surv.length === 6) // abc def gh | ijk lmn op — all distinct
    assert(surv.map(_._3).toSet.size === 6)
  }
}
