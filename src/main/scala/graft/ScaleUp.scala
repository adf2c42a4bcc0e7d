package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-up generator for the sf1 spot-bench: replicates the
  * four bench-heavy tables (`documents`, `embeddings`, `events`,
  * `lineitem`) `reps`× with per-replica key shifts, so the scaled
  * corpus has `reps`× the DISTINCT keys — not `reps` exact copies of
  * every row, which would turn the dedup queries into an artificial
  * pair-explosion (10 identical copies of each doc is 45 pairs per
  * text group, a quadratically heavier workload than a real 10×
  * corpus).
  *
  * Content perturbation, chosen so each replica is an independent
  * near-dup universe (cross-replica rows must NOT become near-dups of
  * each other, or candidate volume scales ~reps² instead of ~reps):
  *  - `documents.text`: a per-replica token PERMUTATION. Rotation
  *    would NOT work here: word-n-gram shingle sets are
  *    rotation-invariant (only the ≤ n−1 grams spanning the cut
  *    change), so rotated clones would be detected as near-dups and
  *    the dedup workload would scale reps², not reps. Instead, tokens
  *    are partitioned into consecutive 13-blocks and each full block
  *    is reordered by the stride map `j → j·(rep+1) mod 13` (13 prime
  *    → every stride 1..12 is a unit). The map is (a) identity at
  *    rep 0 (stride 1), (b) position-keyed and length-independent over
  *    full blocks, so the corpus's prefix-aligned near-dup pairs
  *    transform identically in both members and keep their Jaccard,
  *    and (c) consecutive output positions sit stride-apart in the
  *    source, so two replicas with different strides share ZERO
  *    positional 3-grams inside full blocks. The ragged tail
  *    (< 13 tokens — and the WHOLE text for docs shorter than one
  *    block, which would otherwise repeat verbatim across replicas)
  *    is dealt into k piles (every-k-th-token interleave: a
  *    permutation for any length, pile-internal source spacing k so
  *    different k share no positional 3-grams), with k walking 2..7
  *    per rep, capped at L−3 (k = L is identity and k = L−1
  *    near-identity — the cap excludes both), and reps 7..12 dealing
  *    over the REVERSED tail (spacing −k), doubling the variant space
  *    so even a 10-token pure-tail doc gets distinct perms for all
  *    reps. Tails of 2..9 tokens — where the capped deal degenerates
  *    (identity at L ≤ 4, mostly-rep-independent at L = 5..8, a k-cap
  *    collision at L = 9) and where a rep-keyed ROTATION would leave
  *    cross-replica word-3-gram Jaccard ≥ 0.5 (two rotations of an
  *    L-token ring share ≥ L−6 of its L cyclic 3-grams) — read a
  *    per-length table of offline-verified permutations instead (see
  *    `ShortTailPerms`). The tail deal depends on the tail length,
  *    so near-dup pairs of unequal length lose only their ≤ 12-token
  *    tail overlap — full-block overlap, which dominates for the
  *    planted prefix-aligned pairs, is exact. Because quality score,
  *    language ID, token/char counts, and token df profiles are
  *    order-invariant token-multiset functions, every per-doc
  *    statistic the pipeline filters on is preserved bit-for-bit.
  *    `n_chars` is recomputed from the reassembled text.
  *    Beyond 12 replicas the positional-perm space is exhausted (the
  *    strides live mod 13), so larger reps add two more orthogonal
  *    axes. Replica `r` decomposes as `(base = r mod 12,
  *    gen = (r / 12) mod 4, era = r / 48)`; base picks the positional
  *    perm above; gen applies a same-length vocabulary rename
  *    ([[scaleDocuments]] → `vocabRenames`: affine-permute each
  *    length class of the realized vocab with a per-gen stride,
  *    stopwords / blocklist / langId markers fixed), so two replicas
  *    in different generations share a word 3-gram only across the
  *    scorer-fixed words plus ≤ 1 coinciding word per length class;
  *    era applies an affine CHARACTER cipher to every movable word
  *    ([[eraRenames]] — the third axis the sf10 decade needs), so two
  *    replicas in different eras share ONLY the scorer-fixed words.
  *    All three transformations are far below every near-dup gate
  *    (spec-asserted) while every per-doc statistic stays preserved
  *    (renames and ciphers are length- and stopword-preserving
  *    bijections on the realized vocabulary).
  *  - `embeddings.embedding`: cyclic rotation by `rep mod dim`
  *    positions — norm-preserving, within-replica cosine structure
  *    intact, cross-replica neighborhoods decorrelated; rotation eras
  *    past `dim` replicas (`rep / dim` odd) additionally sign-flip
  *    the odd coordinates (orthogonal, so within-replica structure
  *    stays exact — see [[scaleEmbeddings]]).
  *  - `events` / `lineitem`: key shifts only (timestamps untouched, so
  *    the one-month event span keeps its density profile — 10× events
  *    per day, the realistic growth axis).
  *
  * Replica 0 is bit-identical to the source. Deterministic end to end
  * (no rand), so the scaled corpus is reproducible by anyone.
  *
  * Usage: `runMain graft.ScaleUp <srcSfDir> <dstDir> <reps>`
  */
object ScaleUp {

  private val KeyShift = 10000000L // doc/user/vec id space per replica
  private val BigShift = 1000000000L // event/order id space per replica

  /** Permutation tables for ragged tails of 2..9 tokens, indexed
    * `ShortTailPerms(L−2)(permIdx)(outputPos) = sourcePos` with
    * `permIdx = (rep−1) mod 12`. Found by offline greedy search
    * (exhaustive over all L! permutations for L ≤ 8, rejection-sampled
    * at L = 9) and verified by ScaleUpSpec: for L = 5..9 the 12 table
    * perms plus the identity (rep 0) share ZERO consecutive-position
    * 3-grams pairwise; at L = 4 at most 1 of 2 (Jaccard 1/3) — every
    * pair strictly below the engine's ≥ 0.5 near-dup gate, which a
    * rotation scheme cannot achieve (rotations of one ring are
    * pairwise ≥ 0.5 at L = 8). L = 9 is in the table rather than the
    * deal because the deal's k-cap (L−3 = 6) collides reps 5 and 6
    * onto the same k = 6 there; from L = 10 up, k = 2..7 with the rev
    * doubling yields 12 distinct zero-overlap perms.
    * L = 3 cycles the 5 non-identity perms (worst cross-replica clone
    * family ⌈11/5⌉ = 3 — at ≤ 3 tokens the engine's shingle fallback
    * is the whole text, so only EXACT clones pair up) and L = 2 has
    * only the swap (all 11 perturbed reps coincide — the documented
    * floor, like the necessarily invariant 1-token tail).
    */
  private val ShortTailPerms: Seq[Seq[Seq[Int]]] = Seq(
    Seq.fill(12)(Seq(1, 0)), // L=2: the swap is the only non-identity perm
    Seq(Seq(0, 2, 1), Seq(1, 0, 2), Seq(1, 2, 0), Seq(2, 0, 1), Seq(2, 1, 0),
      Seq(0, 2, 1), Seq(1, 0, 2), Seq(1, 2, 0), Seq(2, 0, 1), Seq(2, 1, 0),
      Seq(0, 2, 1), Seq(1, 0, 2)), // L=3: 5-cycle of the non-identity perms
    Seq(Seq(2, 1, 0, 3), Seq(2, 3, 1, 0), Seq(1, 0, 2, 3), Seq(1, 3, 2, 0),
      Seq(3, 1, 2, 0), Seq(1, 3, 0, 2), Seq(0, 2, 1, 3), Seq(0, 3, 2, 1),
      Seq(2, 3, 0, 1), Seq(2, 0, 3, 1), Seq(2, 0, 1, 3), Seq(1, 0, 3, 2)),
    Seq(Seq(2, 1, 3, 4, 0), Seq(4, 1, 0, 3, 2), Seq(4, 0, 2, 3, 1),
      Seq(2, 1, 4, 3, 0), Seq(3, 0, 1, 4, 2), Seq(0, 4, 3, 1, 2),
      Seq(1, 2, 0, 3, 4), Seq(1, 0, 2, 4, 3), Seq(2, 4, 1, 3, 0),
      Seq(2, 4, 0, 3, 1), Seq(3, 2, 0, 4, 1), Seq(0, 1, 3, 2, 4)),
    Seq(Seq(2, 3, 5, 0, 1, 4), Seq(1, 0, 5, 2, 4, 3), Seq(3, 4, 0, 2, 1, 5),
      Seq(0, 4, 2, 1, 3, 5), Seq(1, 0, 4, 5, 2, 3), Seq(0, 1, 3, 2, 4, 5),
      Seq(1, 5, 4, 2, 3, 0), Seq(3, 1, 2, 4, 0, 5), Seq(4, 5, 1, 0, 2, 3),
      Seq(4, 2, 5, 3, 0, 1), Seq(3, 2, 5, 4, 1, 0), Seq(4, 3, 1, 5, 0, 2)),
    Seq(Seq(2, 4, 3, 0, 5, 6, 1), Seq(3, 2, 0, 6, 5, 4, 1),
      Seq(6, 1, 0, 3, 2, 5, 4), Seq(1, 6, 4, 0, 2, 3, 5),
      Seq(3, 4, 6, 0, 1, 5, 2), Seq(0, 3, 1, 2, 5, 6, 4),
      Seq(1, 6, 2, 0, 4, 5, 3), Seq(1, 2, 0, 3, 5, 4, 6),
      Seq(1, 5, 3, 6, 0, 2, 4), Seq(1, 4, 0, 3, 6, 5, 2),
      Seq(4, 5, 2, 6, 3, 0, 1), Seq(6, 5, 3, 0, 2, 1, 4)),
    Seq(Seq(2, 3, 5, 1, 4, 0, 6, 7), Seq(4, 3, 5, 7, 2, 6, 0, 1),
      Seq(1, 5, 0, 4, 6, 3, 7, 2), Seq(2, 5, 6, 4, 1, 0, 7, 3),
      Seq(6, 0, 3, 1, 7, 5, 2, 4), Seq(6, 3, 2, 1, 0, 5, 4, 7),
      Seq(0, 6, 1, 2, 4, 7, 3, 5), Seq(2, 0, 5, 7, 1, 3, 4, 6),
      Seq(0, 3, 6, 7, 2, 5, 4, 1), Seq(7, 6, 5, 3, 0, 2, 4, 1),
      Seq(0, 7, 5, 1, 6, 3, 4, 2), Seq(3, 4, 7, 0, 5, 2, 6, 1)),
    Seq(Seq(6, 8, 0, 2, 4, 3, 1, 5, 7), Seq(5, 3, 4, 1, 2, 8, 0, 7, 6),
      Seq(4, 1, 5, 0, 2, 3, 8, 6, 7), Seq(6, 5, 4, 7, 1, 3, 8, 2, 0),
      Seq(3, 5, 7, 0, 1, 4, 6, 2, 8), Seq(1, 8, 5, 7, 6, 0, 3, 4, 2),
      Seq(8, 3, 6, 1, 4, 7, 2, 5, 0), Seq(3, 0, 5, 2, 7, 1, 8, 4, 6),
      Seq(1, 3, 4, 6, 0, 7, 5, 8, 2), Seq(8, 6, 4, 0, 2, 5, 3, 7, 1),
      Seq(4, 2, 8, 5, 0, 3, 7, 6, 1), Seq(2, 7, 4, 3, 6, 0, 5, 1, 8)))

  private def withReps(spark: SparkSession, df: DataFrame, reps: Int): DataFrame =
    // repartition AFTER the fan-out: the source tables are one small
    // parquet file each (one input split), and the broadcast cross
    // join preserves partitioning — without the exchange the whole
    // reps× expansion plus the per-token permutation/rename
    // expressions run as ONE task (measured: a single core pegged for
    // the entire reps=100 documents write while 31 idled). The rows
    // shuffled are the SOURCE rows × reps, paid once, and every
    // downstream transform is per-row, so content is partitioning-
    // independent.
    df.crossJoin(broadcast(spark.range(reps).toDF("rep")))
      .repartition(spark.sparkContext.defaultParallelism)

  /** Fixed-point words a generation rename must NOT move: every word
    * an engine-side per-doc scorer tests by NAME — the quality/Gopher
    * stopword seed set, the q144 blocklist terms, and every langId
    * marker word — so stopword ratios, stopword-kind counts,
    * blocklist densities, and language guesses are preserved
    * bit-for-bit across generations. Pulled from the scorers'
    * own lists so the two cannot drift. */
  private val RenameFixed: Set[String] =
    graft.functions.TextFunctions.EnglishStopwords.toSet ++
      graft.functions.TextFunctions.LangMarkers.flatMap(_._2) ++
      graft.functions.TextFunctions.BlocklistTerms

  /** The corpus's realized vocabulary (distinct space-split tokens,
    * sorted) — vocab-bounded driver traffic (the BPE wordTable rule),
    * collected once and shared by the generation renames and the era
    * ciphers. */
  private def realizedVocab(src: DataFrame): Seq[String] =
    src.select(explode(split(col("text"), " ")).as("t"))
      .distinct().collect().map(_.getString(0)).filter(_.nonEmpty).sorted.toSeq

  /** Per-ERA affine character ciphers — the third replica axis (reps
    * > 48). Era `e ≥ 1` maps every lowercase letter `c →
    * (c−'a')·a + bₑ (mod 26)` inside every MOVABLE word (the
    * [[RenameFixed]] scorer-tested words never move); non-letter
    * characters pass through. Parameter discipline (the same
    * no-shared-agreement argument the generation strides make over
    * their prime modulus, here over the letter ring):
    *
    *  - vs the IDENTITY (era 0): `bₑ` ODD ⇒ `(a−1)c ≡ −bₑ (mod 26)`
    *    has no solution (a−1 even, so the left side is always even) —
    *    NO fixed letters, every movable word changes in every era;
    *  - era vs era: the SAME multiplier `a` with distinct odd offsets
    *    ⇒ two eras agree where `0·c ≡ bₑ′−bₑ (mod 26)` — nowhere —
    *    so the same word NEVER collides across eras. (Distinct
    *    multipliers would agree on gcd(aₑ−aₑ′, 26) = 2 letters, and a
    *    word spelled entirely in those two letters would be shared.)
    *
    * What the letter algebra cannot exclude is two DIFFERENT realized
    * words colliding across eras (with one multiplier that requires
    * the vocabulary to contain a word AND its constant-letter-shift
    * partner) — [[eraRenames]] checks image-set disjointness over the
    * realized vocab and rejects loudly, the vocabRenames thin-class
    * discipline. */
  private val EraCiphers: Seq[(Int, Int)] = Seq((3, 7), (3, 9))

  private def cipherWord(w: String, a: Int, b: Int): String =
    w.map { c =>
      if (c >= 'a' && c <= 'z') (((c - 'a') * a + b) % 26 + 'a').toChar
      else c
    }

  /** Per-era rename maps over the realized movable vocabulary. A
    * letterwise bijection is injective on words, so an era never
    * merges two words (df profiles are permuted, not changed) and is
    * length-preserving (per-doc char sums exact). Two hazards, both
    * handled loudly rather than silently: a cipher image COLLIDING
    * with a [[RenameFixed]] scorer word (it would inflate a stopword/
    * marker/blocklist count — such words are excluded to a fixpoint,
    * which then trips the disjointness check below), and any overlap
    * between the TOKEN SETS of two eras (which would share shingles
    * across eras and re-grow the reps² candidate cliques) — the
    * corpus is rejected with the offending words named, the
    * vocabRenames thin-class discipline. The bench corpus passes
    * cleanly (spec-asserted). */
  private[graft] def eraRenames(
      vocab: Seq[String], maxEra: Int): Seq[Map[String, String]] = {
    require(maxEra <= EraCiphers.size,
      s"maxEra=$maxEra: only ${EraCiphers.size} era ciphers are defined")
    val movable = vocab.filterNot(RenameFixed)
    val maps = (1 to maxEra).map { e =>
      val (a, b) = EraCiphers(e - 1)
      var excluded = Set.empty[String]
      var grew = true
      while (grew) {
        val staying = RenameFixed ++ excluded
        val bad = movable
          .filterNot(excluded)
          .filter(w => staying(cipherWord(w, a, b)))
        grew = bad.nonEmpty
        excluded ++= bad
      }
      movable.filterNot(excluded)
        .map(w => w -> cipherWord(w, a, b)).toMap
    }
    // cross-era image disjointness over the REALIZED vocab: the
    // cipher algebra already makes same-word collisions impossible
    // (see EraCiphers); a different-word collision needs the corpus
    // to realize both a word and its constant-shift partner — refuse
    // loudly rather than silently share shingles across eras
    val tokenSets = movable.toSet +: maps.map(m =>
      movable.map(w => m.getOrElse(w, w)).toSet)
    for (i <- tokenSets.indices; j <- tokenSets.indices if i < j) {
      val shared = tokenSets(i).intersect(tokenSets(j))
      require(shared.isEmpty,
        s"era ciphers collide on the realized vocabulary between eras " +
          s"$i and $j (${shared.take(3).mkString(",")},…) — this corpus " +
          s"does not support ${maxEra + 1} eras")
    }
    maps
  }

  /** Per-GENERATION vocabulary renames for reps > 12 (see
    * [[scaleDocuments]]): generation g ≥ 1 permutes the first `p`
    * words of each same-LENGTH class of the corpus's realized
    * vocabulary — `p` = the largest PRIME ≤ the class size — by the
    * affine map `i → i·(g+1) + g  (mod p)` over the sorted index
    * space, leaving [[RenameFixed]] words, singleton classes, and the
    * (size − p) class remainder in place.
    *
    * Length preservation keeps per-doc char sums and mean word length
    * exact; each map is a bijection, so corpus-wide df profiles are
    * permuted among same-length words, not changed. The STRIDE is
    * what distinct generations cannot share (g+1, pairwise distinct,
    * never 1): a plain rotation (stride 1) maps consecutive
    * sorted-class indices to consecutive indices, so a corpus whose
    * texts enumerate the vocabulary in order would keep ~all its
    * shingles across generations; distinct strides map a consecutive
    * run to runs of different spacing, which can never coincide as an
    * ordered 3-gram. The PRIME modulus is what makes the agreement
    * bound real: two maps `i·u+g` and `i·u'+g'` agree where
    * `(u−u')·i ≡ g'−g (mod p)` — over a prime, a nonzero slope has
    * EXACTLY one solution (and vs the gen-0 identity, slope
    * `u−1 = g ≠ 0` likewise), whereas over a composite s the slope
    * can share a factor with s and the maps agree on gcd(u−u', s)
    * indices (e.g. s=15, strides 2 and 8: three shared words).
    * So any two generations share AT MOST one movable word per class
    * plus the fixed/remainder words — a cross-generation 3-gram
    * needs three consecutive tokens from that handful, far below any
    * near-dup gate (spec-asserted, including on an adversarial
    * enumerating corpus). The realized vocabulary is vocab-bounded
    * driver traffic (the BPE wordTable rule). */
  private[graft] def vocabRenames(src: DataFrame, maxGen: Int): Seq[Map[String, String]] =
    vocabRenamesFrom(realizedVocab(src), maxGen)

  private def vocabRenamesFrom(vocab: Seq[String], maxGen: Int): Seq[Map[String, String]] = {
    val classes = vocab.filterNot(RenameFixed)
      .groupBy(_.length).values.map(_.sorted).toSeq
    def isPrime(x: Int): Boolean =
      x >= 2 && (2 to math.sqrt(x.toDouble).toInt).forall(x % _ != 0)
    val movable = classes.filter(_.size >= 2).map { c =>
      c.take((c.size to 2 by -1).find(isPrime).getOrElse(0))
    }
    movable.foreach { c =>
      // strides are 2..maxGen+1 and must stay below the prime modulus
      require(c.size >= maxGen + 2,
        s"maxGen=$maxGen: movable length class with prime prefix " +
          s"${c.size} (${c.take(3).mkString(",")},…) supports only " +
          s"${math.max(c.size - 2, 0)} generations — they would collide on it")
    }
    (1 to maxGen).map { g =>
      movable.flatMap { c =>
        val p = c.size
        val u = g + 1
        c.indices.map(i => c(i) -> c((i * u + g) % p))
      }.toMap
    }
  }

  /** Generations per era: maxGen = 3 (strides 2..4) needs every
    * movable length class's prime prefix ≥ 5 — which the bench
    * corpus's thinnest classes (5 members) supply exactly; a larger
    * per-era generation count would demand thicker classes than the
    * corpus has (vocabRenames rejects loudly). */
  private val GensPerEra = 4

  def scaleDocuments(spark: SparkSession, src: DataFrame, reps: Int): DataFrame = {
    // THREE orthogonal axes span the replica space
    // (rep = base + 12·gen + 48·era):
    //  - base = rep mod 12: the positional permutation (block stride +
    //    tail deal/table) — strides base+1 must be units mod 13;
    //  - gen = (rep / 12) mod 4: a vocabulary rename (vocabRenames)
    //    applied AFTER the positional perm, so replicas in different
    //    generations share (almost) no tokens and therefore no
    //    shingles — ≤ 1 coinciding movable word per length class;
    //  - era = rep / 48: an affine character cipher over every
    //    movable word ([[eraRenames]]) applied after the generation
    //    rename, so replicas in different eras share ONLY the
    //    scorer-fixed words — the axis that extends the
    //    zero-cross-replica-near-dup guarantee past the 48-replica
    //    positional×generation ceiling (round-12 verdict: reps = 100,
    //    the sf10 decade, needs a third verified-independent axis).
    // Capacity: 12 × 4 × (1 + |EraCiphers|) = 144, capped at 128 — the
    // historical embedding-flip bound, kept as the four-table corpus
    // ceiling (the embeddings axis alone now extends to dim·2^⌊log₂
    // dim⌋ = 4096 via Walsh sign patterns — see [[scaleEmbeddings]]
    // and the `vectors` mode in [[main]]).
    require(reps >= 1 && reps <= 128, s"reps=$reps: supported range is 1..128")
    val maxGen = math.min(GensPerEra - 1, (reps - 1) / 12)
    val maxEra = (reps - 1) / (12 * GensPerEra)
    val vocab =
      if (maxGen >= 1 || maxEra >= 1) realizedVocab(src) else Nil
    val renames = if (maxGen >= 1) vocabRenamesFrom(vocab, maxGen) else Nil
    val eras = if (maxEra >= 1) eraRenames(vocab, maxEra) else Nil
    val B = 13
    val toks = split(col("text"), " ")
    val sz = size(toks)
    val base = pmod(col("rep"), lit(12)).cast("int")
    val gen = pmod(floor(col("rep") / 12), lit(GensPerEra)).cast("int")
    val era = floor(col("rep") / (12 * GensPerEra)).cast("int")
    val stride = (base + 1).cast("int")
    val tailStart = sz - pmod(sz, lit(B)) // 0-based start of the ragged tail
    val tailLen = pmod(sz, lit(B))
    // output position o (0-based) reads source position
    //   (o - o mod 13) + (o mod 13)·stride mod 13     inside full blocks;
    //   tailStart + pile(p) + j·k  (deal into k piles) in the ragged tail
    val permTab = typedlit(ShortTailPerms)
    val permuted = transform(sequence(lit(0), sz - 1), o => {
      val blockStart = o - pmod(o, lit(B))
      val t = o - tailStart // 0-based position within the tail
      // tail deal parameters — only evaluated for rep ≥ 1 (the rep-0
      // branch keeps the source text verbatim) and tails ≥ 10 (shorter
      // tails read ShortTailPerms): k walks 2..7 and the second six
      // reps deal over the REVERSED tail, doubling the variant space —
      // at L ≥ 10 the L−3 cap no longer binds inside the k range, so
      // the 12 (k, rev) variants are pairwise-distinct zero-overlap
      // perms (k = L would be identity, k = L−1 near-identity — both
      // excluded by the cap)
      val idx = stride - 2 // = rep − 1
      val rev = pmod(idx, lit(12)) >= 6
      val k = least(lit(2) + pmod(idx, lit(6)), greatest(tailLen - 3, lit(1)))
      val q = floor(tailLen / k).cast("int") // pile base size ≥ 1 (k ≤ L)
      val r = pmod(tailLen, k) // first r piles hold q+1 elements
      val boundary = r * (q + 1)
      val p = when(t < boundary, floor(t / (q + 1)).cast("int"))
        .otherwise(r + floor((t - boundary) / q).cast("int"))
      val j = when(t < boundary, pmod(t, q + 1)).otherwise(pmod(t - boundary, q))
      val dealPos = p + j * k
      // Tails of 2..9 tokens get little-to-no decorrelation from the
      // deal (at L ≤ 4 the k = 1 floor deals to the IDENTITY; at
      // L = 5..8 the L−3 cap collapses most reps onto the same k; at
      // L = 9 it collides reps 5/6), and rep-keyed rotation — the
      // round-9 scheme — is not enough either: two rotations of an
      // L-token ring share all but ≤ 6 of its L cyclic 3-grams, so at
      // L = 8 every rotation pair sits exactly AT the engine's ≥ 0.5
      // near-dup gate and short pure-tail docs formed cross-replica
      // near-dup cliques (ADVICE r9). Those tails instead read a
      // per-length table of offline-searched perms with verified
      // pairwise 3-gram overlap (zero at L = 5..9, ≤ 1 of 2 at L = 4 —
      // Jaccard ≤ 1/3, strictly under every gate); see ShortTailPerms
      // for the L ≤ 3 exact-clone floors. The deal owns L ≥ 10 where
      // it yields distinct zero-overlap perms. All floors and the
      // < 0.5 cross-replica bound are spec'd in ScaleUpSpec.
      val tablePos = element_at(
        element_at(element_at(permTab, (tailLen - 1).cast("int")),
          (pmod(idx, lit(12)) + 1).cast("int")),
        (t + 1).cast("int"))
      element_at(toks, lit(1) +
        when(o < tailStart,
          blockStart + pmod(pmod(o, lit(B)) * stride, lit(B)))
          .otherwise(tailStart +
            when(tailLen <= 1, t)
              .when(tailLen <= 9, tablePos)
              .otherwise(when(rev, tailLen - 1 - dealPos)
                .otherwise(dealPos))))
    })
    // base 0 in a later generation is the IDENTITY positional perm
    // (the perm machinery is only defined for base ≥ 1) — the
    // generation rename still applies, so gen ≥ 1 base-0 replicas are
    // renamed verbatim-order copies, disjoint from every other replica
    val permutedToks = when(base === 0, toks).otherwise(permuted)
    // per-token map = era cipher ∘ generation rename (both map within
    // or out of the realized vocabulary, so the composition is one
    // nested fold over two tiny literal maps per token); era 0 / gen 0
    // are identities
    def genRenamed(t: Column): Column =
      if (renames.isEmpty) t
      else renames.zipWithIndex.foldLeft(t) { case (acc, (m, i)) =>
        when(gen === (i + 1), coalesce(element_at(typedlit(m), t), t))
          .otherwise(acc)
      }
    def eraRenamed(t: Column): Column =
      if (eras.isEmpty) t
      else eras.zipWithIndex.foldLeft(t) { case (acc, (m, i)) =>
        when(era === (i + 1), coalesce(element_at(typedlit(m), t), t))
          .otherwise(acc)
      }
    val renamed =
      if (renames.isEmpty && eras.isEmpty) permutedToks
      else transform(permutedToks, t => eraRenamed(genRenamed(t)))
    withReps(spark, src, reps)
      .select((col("doc_id") + col("rep") * KeyShift).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat_ws(" ", renamed)).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def scaleEmbeddings(spark: SparkSession, src: DataFrame, reps: Int): DataFrame = {
    val v = col("embedding")
    val dim = size(v)
    val off = pmod(col("rep"), dim).cast("int")
    val rotated = concat(slice(v, off + lit(1), dim - off), slice(v, lit(1), off))
    // second axis for reps > dim (the rotation space is exhausted —
    // rep and rep+dim would otherwise be IDENTICAL copies and the ANN
    // workload would collapse cross-replica neighborhoods): the flip
    // era e = rep / dim picks the WALSH sign pattern
    // sign_i = (−1)^popcount(i AND e). Each pattern is a diagonal ±1
    // orthogonal map, so within-replica dot products / distances /
    // norms stay EXACT (D² = I); the patterns form a group under
    // composition (Dₑ·Dₑ′ = D_{e XOR e′}, since parities add mod 2
    // bitwise), so any two DISTINCT eras differ by a nonzero pattern —
    // and over a power-of-two dim a nonzero mask has odd parity on
    // EXACTLY half the coordinate indices, so a replica's vectors sit
    // near-orthogonal to every other era's (the half-positive/half-
    // negative split of Σ±x² ≈ 0 for generic vectors). Era 1 IS the
    // historical odd-coordinate flip (popcount(i AND 1) = i mod 2),
    // so every corpus generated under the two-era scheme (sf1/sf3/
    // sf10, reps ≤ 128 → e ∈ {0,1}) reproduces bit-for-bit. Capacity:
    // dim · 2^⌊log₂ dim⌋ transforms — 4096 at dim 64, the headroom
    // the vectors-only ANN maintenance corpus needs (round-13
    // verdict: the 2–5 M-vector decade escapes the 128-rep ceiling
    // on the embeddings axis alone).
    // the replica-space bound is derived from the DATA (first row's
    // dim). Two contracts made explicit (round-15 advice): an empty
    // source fails with a clear message instead of a bare
    // NoSuchElementException, and the capacity check assumes a
    // UNIFORM dim — the per-row transform uses each row's own
    // size(embedding), so a mixed-dim source could pass the require
    // yet realize eras outside the validated space. The generated
    // tables are uniform by construction; a foreign source is
    // asserted here rather than trusted.
    // one min/max agg (partial-agg, no distinct shuffle, round-15
    // advice): min==max IS the uniformity assertion, and the same
    // pass proves non-emptiness
    val dimStats = src.agg(min(size(col("embedding"))).as("mn"),
      max(size(col("embedding"))).as("mx"),
      count(lit(1)).as("n")).collect().head
    require(dimStats.getLong(2) > 0, "scaleEmbeddings: empty " +
      "embeddings source — no rows to derive the replica-space bound from")
    require(dimStats.getInt(0) == dimStats.getInt(1),
      "scaleEmbeddings: mixed embedding dims " +
        s"(${dimStats.getInt(0)}..${dimStats.getInt(1)}) — the Walsh " +
        "replica capacity is only valid over a uniform-dim corpus")
    val dimVal = dimStats.getInt(0)
    val eraSpace = Integer.highestOneBit(dimVal)
    require(reps >= 1 && reps <= dimVal * eraSpace,
      s"reps=$reps: embeddings replica space at dim=$dimVal is " +
        s"1..${dimVal * eraSpace} (rotations × Walsh sign patterns)")
    val flipEra = floor(col("rep") / dim).cast("long")
    val transformed = when(flipEra === 0, rotated).otherwise(
      transform(rotated, (x, i) =>
        when(pmod(bit_count(i.cast("long").bitwiseAND(flipEra)), lit(2)) === 1,
          -x).otherwise(x)))
    withReps(spark, src, reps)
      .select((col("vec_id") + col("rep") * KeyShift).as("vec_id"),
        when(col("rep") === 0, v).otherwise(transformed).as("embedding"),
        col("label"))
  }

  def scaleEvents(spark: SparkSession, src: DataFrame, reps: Int): DataFrame =
    withReps(spark, src, reps)
      .select((col("event_id") + col("rep") * BigShift).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * KeyShift).as("user_id"),
        col("event_type"), col("value"), col("props"))

  def scaleLineitem(spark: SparkSession, src: DataFrame, reps: Int): DataFrame =
    withReps(spark, src, reps)
      .select((col("l_orderkey") + col("rep") * BigShift).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))

  def main(args: Array[String]): Unit = {
    val Array(src, dst, repsS) = args.take(3)
    val reps = repsS.toInt
    // optional 4th arg `vectors`: embeddings-ONLY corpus. The ANN
    // maintenance/probe benches need millions of VECTORS but none of
    // the text axes, and the embeddings replica space (dim·2^⌊log₂
    // dim⌋ = 4096 at dim 64) extends far past the documents' 128-rep
    // ceiling — this mode is how the data-bound maintenance decade is
    // generated without inventing new text perms.
    val mode = if (args.length > 3) args(3) else "all"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-scaleup")
    // Tables.load handles the events table's TIMESTAMP(NANOS) encoding
    // (Spark 4 rejects it raw); the scaled copy is written back at
    // Spark-native micros, which downstream loads pass through.
    def read(t: String): DataFrame = Tables.load(spark, src, t)
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    if (mode == "vectors")
      write(scaleEmbeddings(spark, read("embeddings"), reps), "embeddings")
    else {
      write(scaleDocuments(spark, read("documents"), reps), "documents")
      write(scaleEmbeddings(spark, read("embeddings"), reps), "embeddings")
      write(scaleEvents(spark, read("events"), reps), "events")
      write(scaleLineitem(spark, read("lineitem"), reps), "lineitem")
    }
    spark.stop()
  }
}
