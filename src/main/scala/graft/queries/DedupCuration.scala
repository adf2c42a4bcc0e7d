package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Knn, Packing, SimilaritySearch}

/** Deduplication (operators/Dedup) and corpus-curation queries: exact /
  * near / incremental dedup, retrieval, rebalancing, contamination and
  * drift audits. Split out of the former monolithic `Queries` object —
  * pure move, no semantic change.
  */
private[graft] trait DedupCurationQueries extends QueryContext {

  // ---------------------------------------------------------------------
  // Deduplication (operators/Dedup)
  // ---------------------------------------------------------------------

  /** Exact dedup over a corpus with planted duplicates (every 10th doc
    * re-appears under a shifted id): survivor id + copy count per group. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val aug = docs.unionAll(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    Dedup.exactGroups(aug, Seq("text"), "doc_id")
      .select(col("keep_id"), col("n_copies"))
  }

  /** Exact word-3-gram Jaccard near-dup pairs ≥ 0.5. */
  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L)

  /** MinHash(24) + LSH(8 bands × 3) candidates, verified with exact
    * Jaccard ≥ 0.5 — the discovery path for web-scale near-dedup. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.lshVerifiedPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      numHashes = 24, bands = 8, shingleN = 3, minJaccardMicro = 500000L)

  /** [[minhashLsh]] under a bucket-width cap of 2 — the 100 TB guard
    * against a template mega-cluster turning one (band, key) bucket
    * into an all-pairs join ([[graft.operators.Dedup.dropWideBuckets]]).
    * The cap is deliberately set low enough to FIRE on the test corpus
    * (sf0.01 has 8 width-3 buckets), so the oracle gates the drop
    * mechanism, not a no-op: pairs only discoverable through over-wide
    * buckets vanish, pairs with any surviving narrow band stay. Recall
    * vs the uncapped [[minhashLsh]] is documented in BASELINE.md. */
  def cappedLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.lshVerifiedPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      numHashes = 24, bands = 8, shingleN = 3, minJaccardMicro = 500000L,
      maxBucketWidth = Some(2))

  /** [[graft.operators.Dedup.lshBucketAudit]] at the same parameters
    * and cap as [[cappedLsh]] — the drop accounting a pipeline alerts
    * on (per band: bucket count, max width, buckets/rows over the
    * cap). Everything integer-exact, so the oracle pins the banding
    * bit-for-bit. */
  def lshBucketAudit(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.lshBucketAudit(t(spark, sfDir, "documents"), "doc_id", "text",
      maxBucketWidth = 2, numHashes = 24, bands = 8, shingleN = 3)

  /** 32-bit SimHash pairs within Hamming distance 2 (pigeonhole-banded
    * join, popcount-verified). */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simHashPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      maxHamming = 2, bits = 32, bands = 4)

  /** [[simhashPairs]] under a bucket-width cap of 8 — the Hamming-family
    * twin of [[cappedLsh]], and on THIS corpus the cap is no toy: the
    * dense ~31-token synthetic vocabulary crowds SimHash space so hard
    * that sf0.01's widest (band, key) bucket holds 195 of 500 docs and
    * uncapped Hamming ≤ 2 yields 805 pairs — the signature-crowding
    * mega-cluster shape a boilerplate-heavy crawl produces at 100 TB.
    * Cap 8 keeps only the 36 pairs discoverable through narrow
    * buckets. The oracle replicates banding + width filter + popcount
    * verification (the uncapped q19 oracle can use brute force because
    * banding is complete; a capped result is banding-specific, so the
    * oracle must band). */
  def cappedSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simHashPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      maxHamming = 2, bits = 32, bands = 4, maxBucketWidth = Some(8))

  /** 64-bit two-level SimHash pairs within Hamming distance 3 — gates
    * [[graft.operators.Dedup.hammingPairs]] (the image-dedup family's
    * distributed core) at its `bits = 64` sign-extending configuration
    * on an oracle-replayable text-derived signature (round-8 advice:
    * the Hamming banding join previously rode on specs alone). */
  def simhash64Pairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simHash64Pairs(t(spark, sfDir, "documents"), "doc_id", "text",
      maxHamming = 3, bands = 8)

  /** Embedding-cosine near-dup pairs ≥ 0.35 over a 1-in-5 sample —
    * the EXACT all-pairs verification path, deliberately run on a
    * sample only (it is O(n²) by construction; discovery at scale is
    * [[cosineLsh]]). */
  def cosinePairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cosinePairs(
      t(spark, sfDir, "embeddings").filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", minCosineMicro = 350000L)

  /** Embedding-cosine near-dup pairs ≥ 0.35 via hyperplane-LSH
    * discovery (12 planes × 4 tables) over the FULL embeddings table —
    * the 100 TB path: bucketed candidate equi-join + exact verify on
    * candidates only. */
  def cosineLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cosinePairsLsh(t(spark, sfDir, "embeddings"), "vec_id", "embedding",
      minCosineMicro = 350000L, dim = 64, planes = 12, tables = 4)

  /** Embedding mean-pooling per group (chunk→document pooling, class
    * centroids): every vector element is first quantized to an exact
    * integer micro value — floats summed in shuffle order are NOT
    * reproducible, floor-micro longs are — then one partial-agged
    * groupBy per (label, dim position) emits the pooled mean. The
    * explode is positional (`posexplode`), so the shuffle carries
    * (label, pos, micro) longs, never vectors. */
  def meanPoolEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("x") * 1000000.0).cast("long").as("micro"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("micro")).as("sum_micro"))
      .withColumn("mean_micro",
        floor(col("sum_micro").cast("double") / col("n")).cast("long"))

  /** Inverted-index retrieval — search as a first-class pipeline op:
    * the q56 eval split becomes a QUERY set and every query ranks the
    * corpus by token overlap weighted inverse-document-frequency,
    * `score = Σ_{t ∈ q∩d} ⌊1e6 / df(t)⌋` (pure integer — rare shared
    * terms dominate, boilerplate terms contribute ~nothing). Shapes:
    * df is one partial-agged groupBy; candidate generation is a
    * token-keyed shuffle join (never all-pairs — only docs SHARING a
    * term pair up); per-query top-3 goes through the bounded-heap
    * aggregator, no Window. Scale lever for web corpora: cap/drop
    * ultra-high-df terms before the join (q34's doc-freq-cap pattern)
    * — fan-out per term is q_count·doc_count; [[retrievalCapped]]
    * (q113) is that lever shipped and sf1-measured (linear where this
    * worst case is ~quadratic — BASELINE.md scaling table). Bench
    * note: THIS
    * synthetic corpus has a ~31-token vocabulary, so every query
    * shares terms with nearly every doc and the candidate matrix is
    * fully dense — the worst case by construction; real corpora are
    * sparse in exactly the way the join shape exploits. */
  def retrieval(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    graft.GraftSession.tune(spark)
    val docs = t(spark, sfDir, "documents")
    def distinctToks(df: DataFrame, idAs: String): DataFrame =
      df.select(col("doc_id").as(idAs),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
    val corpus = distinctToks(docs.filter(col("doc_id") % 25 =!= 0), "doc_id")
    // weight computed once per TERM (tiny relation), not per joined row
    val dfreq = corpus.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"), floor(lit(1000000L) / col("df")).cast("long").as("w"))
    val qtoks = distinctToks(docs.filter(col("doc_id") % 25 === 0), "query_id")
    // Candidate-join shape (round-21, guide §2.5): on a dense vocab
    // EVERY term is a hot key — candidate volume per term is
    // q_count(t)·doc_count(t) while the join key has only |vocab|
    // distinct values, so hash partitioning caps the fan-out at
    // |vocab| tasks and AQE's byte-based coalescing (which sees the
    // tiny INPUTS, not the multiplicative output) collapses it
    // further — measured at sf0.1: the whole 17M-row candidate join +
    // partial agg ran as ONE task, 6.2 s of single-core CPU. So:
    //  (a) the per-term weight joins onto the QUERY side first (tiny ×
    //      tiny — algebraically identical, and the 17M-row join output
    //      feeds the partial agg directly instead of re-probing a
    //      second hash table per candidate row);
    //  (b) the posting side is SALTED by doc hash and the query side
    //      replicated across the salts, so the fan-out spreads over
    //      |vocab| × salts cells regardless of vocab density;
    //  (c) both sides repartition with an EXPLICIT partition count
    //      (user-specified counts are exempt from AQE coalescing, and
    //      the join reuses the co-partitioning — no extra exchange).
    // Same candidate multiset — each (q,t) meets (d,t) exactly once,
    // at salt(d) — so scores and hashes are unchanged.
    val salts = spark.sparkContext.defaultParallelism
    val qw = qtoks
      .join(dfreq.hint("shuffle_hash"), Seq("tok"))
      .select(col("tok"), col("query_id"), col("w"),
        explode(sequence(lit(0), lit(salts - 1))).as("salt"))
      .repartition(salts, col("tok"), col("salt"))
    val csalted = corpus
      .select(col("tok"), col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(salts)).cast("int").as("salt"))
      .repartition(salts, col("tok"), col("salt"))
    val scored = qw
      .join(csalted.hint("shuffle_hash"), Seq("tok", "salt"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
    scored
      .groupBy(col("query_id"))
      .agg(operators.TopK.topK(3)(
        -col("score").cast("double"), col("doc_id"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("doc_id"), (-col("n.dist")).cast("long").as("score"))
  }

  /** Df-capped PHRASE retrieval — [[retrieval]]'s documented scale
    * lever, hash-gated (the sf1 spot-bench names q79 as the dense-vocab
    * quadratic worst case; this is the production shape that absorbs
    * it). Two changes, both named in q79's scaladoc: (a) terms are
    * BIGRAM phrases, restoring index sparsity on corpora whose unigram
    * vocabulary is degenerate-dense (this corpus: 31 unigrams at ~75%
    * df each vs ~900 bigrams at ≤ 9% df); (b) an ABSOLUTE document-
    * frequency cap (df ≤ 30, the q34 pattern) drops stop-phrases
    * BEFORE the posting join, so per-term fan-out is ≤ maxDf rows and
    * candidate volume is ≤ query_phrases × maxDf — LINEAR in the query
    * set no matter how dense the corpus gets. The cap relation is
    * vocab-bounded (Heaps-law) and joins shuffle-hash like every
    * corpus-derived relation (q79/q105 discipline); top-3 rides the
    * bounded-heap aggregator, no Window. */
  def retrievalCapped(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    graft.GraftSession.tune(spark)
    val docs = t(spark, sfDir, "documents")
    val toks = TextFunctions.tokens(col("text"))
    def phrases(df: DataFrame, idAs: String): DataFrame =
      df.filter(size(toks) >= 2).select(col("doc_id").as(idAs),
        explode(array_distinct(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b)))).as("ph"))
    val corpus = phrases(docs.filter(col("doc_id") % 25 =!= 0), "doc_id")
    val dfc = corpus.groupBy(col("ph")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 30)
      .select(col("ph"), floor(lit(1000000L) / col("df")).cast("long").as("w"))
    val qtoks = phrases(docs.filter(col("doc_id") % 25 === 0), "query_id")
    val scored = qtoks
      .join(dfc.hint("shuffle_hash"), Seq("ph")) // cap prunes BEFORE the posting join
      .join(corpus.hint("shuffle_hash"), Seq("ph"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
    scored
      .groupBy(col("query_id"))
      .agg(operators.TopK.topK(3)(
        -col("score").cast("double"), col("doc_id"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("doc_id"), (-col("n.dist")).cast("long").as("score"))
  }

  /** Substring-level duplicate detection — the CONTAINMENT complement
    * to doc-level Jaccard (q17 asks "are these docs similar?"; this
    * asks "do they share any long run of text?", catching a quoted
    * paragraph inside an otherwise-unrelated page, the classic
    * eval-contamination / boilerplate vector). Every doc emits
    * polynomial fingerprints of its 64-char windows at stride 32;
    * pairs sharing ≥ 1 fingerprint surface with their shared-window
    * count. Detection semantics, stated exactly: a shared run is
    * caught iff its offsets in the two docs differ by ≡ 0 (mod 32)
    * and it spans a full window — always true for whole-doc and
    * shared-prefix duplication, a 1-in-32 alignment lottery per run
    * otherwise; stride 1 buys the exact guarantee at 32× the
    * fingerprint volume (the knob to turn when auditing, not when
    * sweeping). Same scale shape as q17: per-row
    * fingerprinting (codegen'd substr + poly hash, no strings kept),
    * one fingerprint-keyed shuffle self-join bounded by real
    * collisions, never all-pairs. */
  def substringDups(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.PolyHashArrayExpr
    val docs = t(spark, sfDir, "documents")
    val win = docs
      .select(col("doc_id"),
        posexplode(sequence(lit(1L),
          greatest(col("n_chars") - 63L, lit(1L)), lit(32L)))
          .as(Seq("pos", "start")),
        col("text"))
      .select(col("doc_id"),
        element_at(PolyHashArrayExpr(
          array(col("text").substr(col("start").cast("int"), lit(64)))), 1).as("fp"))
      .distinct()
    val a = win.as("a"); val b = win.as("b")
    a.join(b.hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  /** [[operators.Dedup.dupPassageExcision]] under the oracle gate —
    * the cleaning ACTION q80 only detects: shared ≥64-char runs are
    * cut from every lower-priority doc (fingerprint owned by the
    * smallest containing doc id; the owner's text is untouched, so one
    * copy of every passage survives) and the kept segments are spliced
    * back in offset order. The gate hashes every doc's surviving
    * length AND the polynomial fingerprint of the surviving TEXT —
    * the splice itself is what's pinned per round, not just how much
    * was cut. Same detection semantics as q80 (stride-32 window
    * alignment lottery for unaligned runs, stated there); the splice
    * is a per-row bounded fold over the sorted cut starts — no Window,
    * no all-pairs, owner/cut relations shuffle-hash pinned (corpus-
    * derived, never broadcast). */
  def dupExcision(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.PolyHashArrayExpr
    val docs = t(spark, sfDir, "documents")
    operators.Dedup.dupPassageExcision(docs, "doc_id", "text")
      .select(col("doc_id"), col("orig_chars"),
        length(col("kept_text")).cast("long").as("kept_chars"),
        element_at(PolyHashArrayExpr(array(col("kept_text"))), 1).as("kept_fp"))
  }

  /** [[operators.Sampling.rebalanceRatiosPpm]] under the oracle gate —
    * language-REBALANCED corpus mixing with DATA-DERIVED ratios (q66's
    * weighted mix uses hand-picked constants; a real multilingual mix
    * derives them from the crawl): every language is hash-admitted
    * down to the smallest language's count. Two-phase plan: a
    * partial-agged stats pass (|langs| rows), then a pure per-row
    * admission predicate — the 100 TB corpus is never shuffled; the
    * ratio table is group-domain-bounded and deliberately broadcast.
    * The gate pins the achieved per-language kept counts, so the
    * admission hash AND the ratio arithmetic are both checked. */
  def langRebalance(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Sampling
    val docs = t(spark, sfDir, "documents")
    val ratios = Sampling.rebalanceRatiosPpm(docs, "lang")
    val kept = docs.join(broadcast(ratios), "lang")
      .filter(Sampling.bucket(col("doc_id"), 1000000) < col("keep_ppm"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    ratios.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"), col("keep_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Tokenizer-vocabulary coverage — the OOV audit a pipeline runs
    * before committing to a vocabulary: the top-V corpus tokens by
    * frequency (deterministic (count desc, token asc) tie-break)
    * become the vocab, and every document reports its token count,
    * OOV count, and OOV rate in ppm. V=10 here so the synthetic
    * ~31-token corpus yields real OOV spread (27%–85%).
    *
    * Scale shape: the vocab election is a partial-agged wordcount into
    * a bounded global top-V (TakeOrderedAndProject — V rows cross the
    * driver, nothing else); the per-doc join probes the V-row vocab as
    * a broadcast (domain-bounded by construction, the q93 discipline);
    * OOV counting partial-aggs on the doc key. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10)
      .select(col("tok"), lit(1L).as("inv"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        floor(col("n_oov") * 1000000.0 / col("n_tokens")).cast("long").as("oov_ppm"))
  }

  /** SCD2-style validity intervals from an event stream — the
    * warehouse history-build that q91's latest-record compaction is
    * the endpoint of: per user, each run of consecutive equal
    * event_type values collapses to one interval row with
    * [valid_from, valid_to) micros (open interval → NULL valid_to,
    * the current state). Change detection and interval closing are
    * lag/lead windows partitioned by the HIGH-CARDINALITY user key
    * (the q97 discipline — each task sorts short per-user histories;
    * never a global or low-cardinality sort), and the change filter
    * runs between them so the lead window sorts only change points. */
  def scdIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events").select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
  }

  /** Budget-capped quality selection — keep each language's best ~25%
    * of documents by the q13 quality score, THRESHOLD-based: the
    * per-language 75th percentile (discrete — an actual member of the
    * bounded [0,1000] score domain, the q83/q90 portability rule)
    * becomes an admission threshold, and selection is a pure per-row
    * predicate against the broadcast |langs|-row threshold table.
    * This is the shape a 100 TB curriculum pass actually runs: the
    * tempting sort-by-quality-and-take-prefix is a global (or
    * per-lang, = low-cardinality-partition) sort — a scale-killer;
    * the threshold plan costs one stats agg + one filter, no corpus
    * sort, no corpus shuffle. Docs tying the threshold are kept
    * (≥ thr), so kept counts can exceed the exact quartile — stated
    * semantics, deterministic on both engines. */
  def qualityBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val sc = t(spark, sfDir, "documents").select(col("doc_id"), col("lang"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"))
    val thr = sc.groupBy(col("lang")).agg(
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY quality)")
        .cast("long").as("thr"))
    sc.join(broadcast(thr), "lang")
      .filter(col("quality") >= col("thr"))
      .groupBy(col("lang"), col("thr"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .select(col("lang"), col("thr"), col("n_kept"), col("tokens_kept"))
  }

  /** Quality-WEIGHTED deterministic subsampling — score-proportional
    * Bernoulli admission without an RNG: doc d is admitted iff
    * `hash(doc_id) mod 1000 < quality(d)`, so P(admit) = quality/1000
    * exactly, per-doc decisions are reproducible across engines, runs,
    * and retries (the property that makes the sample auditable and the
    * pipeline idempotent — a seeded RNG loses it the moment
    * partitioning changes), and the whole pass is a map-only
    * projection + one partial-agged rollup. The hash is an explicit
    * affine-mod chain (`(id·2654435761 + 12345) mod 1000003 mod 1000`,
    * prime modulus to decorrelate from id patterns; the 3-in-1000003
    * residue bias is deterministic and documented) rather than an
    * engine-native hash, so any SQL engine replays it bit-for-bit.
    * This is the admission shape score-filtered corpus construction
    * actually uses at 100 TB: no sort, no threshold recomputation, no
    * state — each executor admits its rows independently. */
  def weightedAdmission(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val sc = t(spark, sfDir, "documents").select(col("doc_id"), col("lang"),
      col("source"), tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"))
    val adm = when(
      pmod(pmod(col("doc_id") * 2654435761L + 12345L, lit(1000003L)), lit(1000L))
        < col("quality"), 1L).otherwise(0L)
    sc.select(col("source"), col("lang"), col("n_tokens"), adm.as("adm"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_in"),
        sum(col("adm")).as("n_admitted"),
        sum(when(col("adm") === 1L, col("n_tokens")).otherwise(0L))
          .as("tokens_admitted"))
  }

  /** Template-lead consolidation with a PROVENANCE-RANKED survivor
    * election: docs sharing the same 6-token lead (the same boilerplate
    * intro / template family) form a group, and the group keeps the
    * copy from the highest-priority source — priority DERIVED FROM THE
    * DATA as the source's corpus-wide mean quality (milli-units), ties
    * broken by lowest doc_id. This is the dedup policy real curation
    * uses when copies differ by provenance ("keep the curated mirror's
    * copy, not the crawl's"), vs q49's neutral min-id rule. The
    * election is ONE partial-agged argmax per group: the composite
    * preference (priority desc, doc_id asc) is packed into a single
    * monotonic long (`prio·10⁹ − doc_id`; doc_id < 10⁹ by corpus id
    * discipline, prio ≤ 10⁶ ⇒ no overflow), so `max_by` carries the
    * survivor's payload with map-side combine — no Window, no
    * join-back. The priority relation is source-domain-bounded (tiny)
    * and broadcast; the corpus shuffles once on the group key. */
  def leadSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val sc = t(spark, sfDir, "documents").select(col("doc_id"), col("source"),
      concat_ws(" ", slice(tokens(col("text")), 1, 6)).as("pfx"),
      qualityScore(col("text")).as("quality"))
    val prio = sc.groupBy(col("source")).agg(
      floor(sum(col("quality")) * lit(1000.0) / count(lit(1))).cast("long")
        .as("prio"))
    val key = col("prio") * 1000000000L - col("doc_id")
    sc.join(broadcast(prio), "source")
      .groupBy(col("pfx"))
      .agg(max_by(col("doc_id"), key).as("doc_id"),
        max_by(col("source"), key).as("source"),
        count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("source"), col("n_copies"))
  }

  /** Temperature-scaled language sampling (T = 2) — the multilingual
    * rebalance multilingual pre-training actually uses (sample
    * languages ∝ share^(1/T), flattening the head without letting the
    * tail dominate). Where [[langRebalance]] (q101) equalizes toward
    * uniform, this interpolates: per-lang weight w_l = ⌊√(n_l·10⁶)⌋,
    * relative rate ρ_l ∝ w_l·N/(Σw·n_l), normalized so the rarest
    * language samples at 1.0, and each doc admitted by the q114
    * deterministic hash rule (admit iff h·10⁶ < rate_micro·1000003 —
    * an exact floor-proportioned fraction of the prime hash range, no
    * RNG, idempotent). Everything after the one √ is INTEGER
    * arithmetic: the √ of an exactly-representable double is
    * correctly rounded by IEEE-754 in every engine, the weight sums
    * are exact integer sums (no FP accumulation-order hazard), and the
    * ratios are decimal(38) integral divides (the q109 technique).
    * Scale shape: two lang-domain-bounded aggregates broadcast into
    * one map-side admission projection over a single corpus scan. */
  def temperatureSampling(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val dec = "decimal(38,0)"
    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val grand = counts.agg(sum(col("n_l")).as("n_total"))
    val w = counts.crossJoin(broadcast(grand))
      .select(col("lang"), col("n_l"), col("n_total"),
        floor(sqrt(col("n_l").cast("double") * lit(1000000.0))).cast("long")
          .as("w_l"))
    val sw = w.agg(sum(col("w_l")).as("sum_w"))
    val rho = w.crossJoin(broadcast(sw))
      .select(col("lang"),
        expr(s"CAST((CAST(w_l AS $dec) * CAST(n_total AS $dec)" +
          s" * CAST(1000000 AS $dec)) div" +
          s" (CAST(sum_w AS $dec) * CAST(n_l AS $dec)) AS LONG)").as("rho"))
    val m = rho.agg(max(col("rho")).as("mx"))
    val rates = rho.crossJoin(broadcast(m))
      .select(col("lang"),
        expr(s"CAST((CAST(rho AS $dec) * CAST(1000000 AS $dec))" +
          s" div CAST(mx AS $dec) AS LONG)").as("rate_micro"))
    val adm = when(
      pmod(col("doc_id") * 2654435761L + 12345L, lit(1000003L)) * 1000000L
        < col("rate_micro") * 1000003L, 1L).otherwise(0L)
    docs.join(broadcast(rates), "lang")
      .select(col("lang"), col("rate_micro"), col("n_tokens"), adm.as("adm"))
      .groupBy(col("lang"), col("rate_micro"))
      .agg(count(lit(1)).as("n_in"),
        sum(col("adm")).as("n_admitted"),
        sum(when(col("adm") === 1L, col("n_tokens")).otherwise(0L))
          .as("tokens_admitted"))
  }

  /** Quality-classifier CALIBRATION buckets — the audit a curation
    * pipeline runs on its own admission rule: per (source, global
    * quality decile), how many docs the per-lang 75th-percentile gate
    * ([[qualityBudget]]'s rule) actually admits. A well-calibrated
    * score admits monotonically more per rising decile WITHIN each
    * source; a source whose curve inverts is mislabeled or gamed —
    * this surfaces that per-source, which a global admit rate hides.
    * Composition of the q83 decile-binning shape with the q104
    * admission rule: decile boundaries are one 9-value global
    * aggregate and the per-lang thresholds one tiny aggregate, both
    * broadcast into a single map-side projection; the histogram is one
    * partial-agged groupBy on (source, bin). Three column-pruned
    * corpus scans (two collapse immediately to tiny aggregates, one
    * does the binning); no Window, no sort, no corpus-sized join.
    * Rates are floor-permille (identical-op-order doubles in both
    * engines). */
  def calibrationBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val sc = t(spark, sfDir, "documents").select(col("lang"), col("source"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"))
    val bs = (1 to 9).map(i =>
      expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY quality)")
        .cast("long").as(s"b$i"))
    val bounds = sc.agg(bs.head, bs.tail: _*)
    val thr = sc.groupBy(col("lang")).agg(
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY quality)")
        .cast("long").as("thr"))
    val bin = (1 to 9).map(i =>
      when(col("quality") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
    sc.join(broadcast(thr), "lang")
      .crossJoin(broadcast(bounds))
      .select(col("source"), bin.cast("long").as("bin"),
        when(col("quality") >= col("thr"), 1L).otherwise(0L).as("adm"),
        col("n_tokens"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("adm")).as("n_admitted"),
        floor(sum(col("adm")) * lit(1000.0) / count(lit(1))).cast("long")
          .as("admit_permille"),
        sum(col("n_tokens")).as("tokens_total"))
  }

  /** Token-rarity document scoring — the integer-exact stand-in for
    * the unigram-LM perplexity filter a curation pipeline runs (rare
    * tokens ⇒ higher information ⇒ the doc is unusual for the corpus):
    * per token, `idf_int = ⌊log₂(N_docs / df)⌋` computed WITHOUT
    * floating point as `length(bin(N DIV df)) − 1` (identical in both
    * engines — no log() ULP drift can flip a floor); per doc, the
    * occurrence-summed idf and its per-token mean in milli-units.
    *
    * Scale shape: token df is a partial-agged distinct count on the
    * token key; N_docs is a 1-row aggregate deliberately broadcast
    * over the VOCAB relation (Heaps-law bounded — millions of rows at
    * 100 TB, never corpus-sized); the per-occurrence probe joins token
    * rows to the vocab relation SHUFFLE-HASH (corpus-derived sides are
    * never broadcast, the q79 discipline); the final agg partial-aggs
    * on the doc key. The corpus is scanned once for the df pass and
    * once for the probe — no Window, no sort, no driver loop. */
  def tokenRarity(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = tok.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"),
        (length(bin(expr("n_docs DIV df"))) - 1).cast("long").as("idf"))
    tok.join(idf.hint("shuffle_hash"), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("idf")).as("sum_idf"))
      .select(col("doc_id"), col("n_tokens"), col("sum_idf"),
        floor(col("sum_idf") * 1000.0 / col("n_tokens")).cast("long")
          .as("rarity_milli"))
  }

  /** Vocabulary-drift monitor between a standing corpus and an
    * incoming batch (q85's ingest split: `doc_id % 5 == 0` is the new
    * batch) — the distribution-shift check a pipeline runs at ingest
    * before the batch can poison downstream token statistics: per
    * token, document frequency and per-document rate (ppm) on both
    * sides, the rate delta, and a new-token flag. All integer (floor
    * on ratio-derived values).
    *
    * Scale shape: ONE corpus scan — the side tag is a per-row
    * predicate folded into two conditional distinct-counts on the
    * token key (partial-agged; the expand for the two distincts is
    * vocab×2, not corpus×2 after the per-(token,doc) dedup); the two
    * side totals are a 1-row aggregate deliberately broadcast over the
    * vocab-bounded stats relation. No join against the corpus, no
    * Window, no sort. */
  def vocabDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val isBatch = col("doc_id") % 5 === 0
    val tok = docs.select(col("doc_id"), isBatch.as("b"),
      explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
    val totals = docs.agg(
      sum(when(isBatch, 1L).otherwise(0L)).as("n_new"),
      sum(when(isBatch, 0L).otherwise(1L)).as("n_old"))
    tok.groupBy(col("tok"))
      .agg(count(when(!col("b"), 1L)).as("df_old"),
        count(when(col("b"), 1L)).as("df_new"))
      .crossJoin(broadcast(totals))
      .select(col("tok"), col("df_old"), col("df_new"),
        floor(col("df_old") * 1000000.0 / col("n_old")).cast("long").as("rate_old_ppm"),
        floor(col("df_new") * 1000000.0 / col("n_new")).cast("long").as("rate_new_ppm"),
        (floor(col("df_new") * 1000000.0 / col("n_new")) -
          floor(col("df_old") * 1000000.0 / col("n_old"))).cast("long").as("delta_ppm"),
        when(col("df_old") === 0L, 1L).otherwise(0L).as("is_new_token"))
  }

  /** Train/test split-leakage audit — the eval-hygiene composition a
    * pipeline runs after splitting (q37) and near-dup discovery (q17):
    * near-dup pairs (exact 3-gram Jaccard ≥ 0.5) cross-tabulated by
    * the split membership of their two members. A pair straddling
    * train and test is LEAKED eval signal (its test member is
    * effectively memorizable), flagged `is_leak`. Split tags are
    * computed ARITHMETICALLY from the pair ids (the split is a pure
    * hash of the key — no join back to the corpus at all), so the
    * audit costs one projection + a 4-row aggregate on top of the pair
    * discovery it reuses. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.{Dedup, Sampling}
    val pairs = Dedup.jaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L)
    pairs.select(
        least(Sampling.splitTag(col("id1"), 10, 8),
          Sampling.splitTag(col("id2"), 10, 8)).as("split_a"),
        greatest(Sampling.splitTag(col("id1"), 10, 8),
          Sampling.splitTag(col("id2"), 10, 8)).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        when(col("split_a") =!= col("split_b"), 1L).otherwise(0L).as("is_leak"))
  }

  /** Per-source trigram diversity — the template/boilerplate-source
    * detector: a source whose docs are stamped from a shared template
    * repeats the same word trigrams across documents, so its
    * distinct-trigram share of total trigram occurrences collapses.
    * Emits per source the doc count, total trigram occurrences,
    * distinct trigrams, diversity ppm (floor(distinct·10⁶/total)) and
    * the `is_template` flag (< 450000 ppm = worse than ~2.2×
    * average repetition per trigram).
    *
    * Scale shape: trigrams build per-row with zip_with over shifted
    * slices (the q47 bigram idiom — no self-join); the distinct count
    * is a TWO-LEVEL aggregate — partial-agged count on the
    * (source, trigram) key (high cardinality, distributes), then a
    * per-source fold — never a count(DISTINCT) Expand over the corpus.
    * One scan, two shuffles, the second on the tiny source key. */
  def sourceDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val tk = TextFunctions.tokens(col("text"))
    val trigrams = when(size(tk) >= 3,
      zip_with(
        zip_with(slice(tk, lit(1), size(tk) - 2), slice(tk, lit(2), size(tk) - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(tk, lit(3), size(tk) - 2),
        (ab, c) => concat(ab, lit(" "), c)))
      .otherwise(array().cast("array<string>"))
    t(spark, sfDir, "documents")
      .select(col("source"), explode(trigrams).as("tg"))
      .groupBy(col("source"), col("tg"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_trigrams"),
        count(lit(1)).as("n_distinct"))
      .select(col("source"), col("n_trigrams"), col("n_distinct"),
        floor(col("n_distinct") * 1000000.0 / col("n_trigrams")).cast("long")
          .as("diversity_ppm"))
      .withColumn("is_template",
        when(col("diversity_ppm") < 450000L, 1L).otherwise(0L))
  }

  /** Source-vs-corpus token-distribution divergence — the ingest
    * anomaly detector: per source, the exact TOTAL VARIATION distance
    * between the source's token-occurrence distribution and the whole
    * corpus's, in ppm. A source whose docs are machine-generated,
    * mis-languaged, or boilerplate sits far from the corpus
    * distribution; TVD (unlike KL) is bounded, symmetric-enough, and
    * computable in EXACT integer arithmetic: with obs_t = source
    * occurrences, c_t = corpus occurrences, S/T the totals,
    * `tvd = Σ_t |obs_t·T − c_t·S| / (2·S·T)`. Tokens ABSENT from the
    * source contribute c_t·S each; their sum is recovered WITHOUT
    * scanning the absent set as `S·T − Σ_present c_t·S` (Σ_t c_t = T),
    * so only present (source, token) pairs are ever materialized.
    * Products ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): at
    * trillion-token scale c_t·S overflows a long, and the two engines
    * must agree bit-for-bit.
    *
    * Scale shape: one corpus scan → (source, token) partial-agged
    * counts; corpus per-token counts fold from that same relation
    * (vocab-sized, Heaps-bounded) — the probe back is a SHUFFLE-HASH
    * join on the token key between two vocab-bounded relations, never
    * a corpus broadcast; per-source totals (handful of rows) broadcast
    * onto the final fold. */
  def sourceDivergence(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val st = t(spark, sfDir, "documents")
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("obs"))
    val corpus = st.groupBy(col("tok")).agg(sum(col("obs")).as("c_t"))
    val totals = st.groupBy(col("source")).agg(sum(col("obs")).as("s_total"))
    val grand = corpus.agg(sum(col("c_t")).as("t_total"))
    val dec = "decimal(38,0)"
    st.join(corpus.hint("shuffle_hash"), "tok")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .groupBy(col("source"))
      .agg(
        max(col("s_total")).as("s_total"),
        max(col("t_total")).as("t_total"),
        sum(abs(col("obs").cast(dec) * col("t_total").cast(dec) -
          col("c_t").cast(dec) * col("s_total").cast(dec))).as("present_num"),
        sum(col("c_t").cast(dec) * col("s_total").cast(dec)).as("present_ct"))
      .select(col("source"), col("s_total"),
        ((col("present_num") +
          (col("t_total").cast(dec) * col("s_total").cast(dec) - col("present_ct"))) *
          lit(1000000).cast(dec)).as("num"),
        (lit(2).cast(dec) * col("s_total").cast(dec) * col("t_total").cast(dec))
          .as("den"))
      // integral divide, never decimal FP division: decimal `/` rounds
      // to a derived scale before floor() could run — `div` is exact
      .select(col("source"), col("s_total"),
        expr("CAST(num div den AS LONG)").as("tvd_ppm"))
  }

  /** Exact sufficient statistics for correlation/covariance, per
    * group: (n, Σx, Σy, Σxy, Σx², Σy²) over integer-cast measures —
    * every FP statistical aggregate (`corr`, `covar_pop`, stddev)
    * composes from these six, but unlike the FP aggregates the sums
    * are EXACT integers, hash-portable, partial-agged map-side, and
    * mergeable across any partitioning (the same reason the mean-pool
    * and salted-agg queries integerize first: float accumulation
    * order is not reproducible; integer sums are). Compose
    * driver-side: corr = (n·Σxy − ΣxΣy) / √((n·Σx²−Σx²ᵗ)(n·Σy²−Σy²ᵗ)).
    *
    * Overflow headroom is a UNIT choice: y is integer DOLLARS
    * (Σy² ≈ 7·10¹⁵ at sf0.1 — 3 decimal orders of long headroom);
    * cents would overflow Σy² at this very scale. When row counts ×
    * squared magnitudes approach 2⁶³, move the sums to decimal(38,0)
    * — same plan shape, wider accumulator.
    */
  def corrSums(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))

  /** [[operators.TimeSeries]] under the oracle gate: every user's
    * event-value series reduces to a 4-segment PAA sketch (integer
    * segment sums over the first 16 events in (ts, id) order) and the
    * top-3 most-similar users surface by exact integer sketch
    * distance — the sketch-then-refine data-series search pattern,
    * deterministic end to end. */
  def seriesSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val sketch = operators.TimeSeries.paaSketch(
      t(spark, sfDir, "events"), "user_id", "ts", "event_id",
      round(col("value") * 100).cast("long"), take = 16, segments = 4)
    operators.TimeSeries.similarSeries(sketch, "user_id", k = 3)
  }

  /** [[operators.TimeSeries.similarSeriesLsh]] under the oracle gate —
    * q82's 100 TB path with its QUALITY pinned per round (the q44
    * discipline): recall@3 of the multi-probe quantized-projection LSH
    * path against the exact sketch baseline, PLUS the directed
    * candidate-pair count the LSH actually verified — so the recall
    * floor and the pruning factor (candidates ≪ keys·(keys−1)) are both
    * integer-exact under the hash. Deterministic plane grids mean the
    * DuckDB oracle replays bucketing, probing, verification, and the
    * recall number itself.
    *
    * The exact baseline is SAMPLE-BOUNDED (round-10 advice): 64 keys
    * picked by deterministic hash order receive an exact top-3 against
    * ALL keys — |sample| × keys work, linear in the corpus — and
    * recall is measured on those keys only. The gate itself is now
    * 100×-safe; the production LSH path (and its candidate count) is
    * still computed over the FULL corpus, so the pruning factor stays
    * the real one. The unsampled all-pairs twin remains q82's
    * documented verification-only role. */
  def seriesLshRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val sketch = operators.TimeSeries.paaSketch(
      t(spark, sfDir, "events"), "user_id", "ts", "event_id",
      round(col("value") * 100).cast("long"), take = 16, segments = 4)
    // deterministic fixed-size sample of gate keys: hash-order + limit
    // plans as TakeOrderedAndProject (no global sort materialized)
    val gateKeys = sketch.select(col("user_id").cast("long").as("qk")).distinct()
      .orderBy(pmod(col("qk") * 2654435761L + 12345L, lit(1000003L)), col("qk"))
      .limit(64)
    val exact = operators.TimeSeries.similarSeries(sketch, "user_id", k = 3,
        queries = Some(gateKeys))
      .select(col("user_id"), col("other"))
    val lsh = operators.TimeSeries
      .similarSeriesLsh(sketch, "user_id", k = 3, segments = 4)
      .select(col("user_id"), col("other"))
    val cand = operators.TimeSeries.lshCandidatePairs(
      operators.TimeSeries.sketchVectors(sketch, "user_id"),
      segments = 4, planes = 4, tables = 8, widthCents = 6000L)
    val hits = exact.join(lsh, Seq("user_id", "other"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val tot = exact.agg(count(lit(1)).as("possible"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    hits.crossJoin(tot).crossJoin(nc).select(
      lit("paa_lsh").as("method"), col("hits"), col("possible"),
      col("n_candidates"),
      floor(col("hits") * 1000000.0 / col("possible")).cast("long")
        .as("recall_micro"))
  }

  /** [[Dedup.dedupAgainst]] under the oracle gate: the incremental
    * ingest shape — docs arriving as the "new batch" (doc_id % 5 = 0)
    * survive only if first-in-batch by text AND absent from the
    * standing corpus (the rest). One within-batch survivor election +
    * one left-anti probe of the corpus, both key-partitioned, nothing
    * broadcast. */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    Dedup.dedupAgainst(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      keyCols = Seq("text"), idCol = "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** Cross-snapshot dedup DRIFT — [[incrementalDedup]]'s shape run
    * corpus-vs-corpus: two overlapping crawl snapshots (deterministic
    * doc_id mod-3 slices, 2/3 of the corpus each, 1/3 shared), each
    * exact-deduped by text with a min-id survivor election, then
    * classified per surviving text as retained / added / removed and
    * rolled up per source. This is the between-snapshot report a
    * recurring-crawl pipeline publishes: how much of yesterday's
    * deduped corpus survived, what churned, and which sources drive
    * the churn. Scale shape: each election is ONE partial-agged
    * groupBy on the text key (`min_by` carries the survivor's payload
    * — no join-back second shuffle); the drift classification is a
    * single full-outer join of two text-unique relations on the SAME
    * key their elections just shuffled on; the rollup is a tiny
    * partial agg. Corpus-derived relations are never broadcast. */
  def snapshotDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    def survivors(snap: DataFrame): DataFrame =
      snap.groupBy(col("text")).agg(
        min_by(col("source"), col("doc_id")).as("src"),
        min_by(col("n_chars"), col("doc_id")).as("ch"))
    val a = survivors(docs.filter(col("doc_id") % 3 < 2))
      .select(col("text"), col("src").as("src_a"), col("ch").as("ch_a"))
    val b = survivors(docs.filter(col("doc_id") % 3 > 0))
      .select(col("text"), col("src").as("src_b"), col("ch").as("ch_b"))
    a.join(b, Seq("text"), "full_outer")
      .select(
        when(col("src_a").isNotNull && col("src_b").isNotNull, lit("retained"))
          .when(col("src_a").isNotNull, lit("removed"))
          .otherwise(lit("added")).as("status"),
        coalesce(col("src_a"), col("src_b")).as("source"),
        coalesce(col("ch_a"), col("ch_b")).as("n_chars"))
      .groupBy(col("status"), col("source"))
      .agg(count(lit(1)).as("n_texts"), sum(col("n_chars")).as("chars_total"))
  }

  /** [[Dedup.lshDedupAgainst]] under the oracle gate — incremental
    * NEAR-dedup of an arriving batch (doc_id % 7 = 0) against the
    * standing corpus (the rest): LSH-banded cross-side candidate join,
    * exact-Jaccard ≥ 0.5 verification, left-anti survival. [[q85
    * incrementalDedup|incrementalDedup]] is this at exact-key level;
    * real crawl ingest needs the near-dup level because re-crawled
    * pages drift (boilerplate, timestamps) without becoming new
    * content. */
  def incrementalNearDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    Dedup.lshDedupAgainst(
      docs.filter(col("doc_id") % 7 === 0),
      docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** MinHash ESTIMATION quality under the gate (the q53 discipline
    * applied to similarity sketches): for every exact near-dup pair,
    * the Jaccard estimate read off 24 MinHash signature components
    * (fraction of agreeing slots) next to the exact score. Both are
    * deterministic integers — the signatures are hash-derived, so any
    * engine regenerates them bit-for-bit and the ESTIMATE itself is
    * oracle-portable, pinning sketch quality per round, not just
    * plan shape. Signatures join to the (tiny) pair relation
    * shuffle-hash; at corpus scale the signature relation is the
    * already-staged LSH input, so the estimate is a free column. */
  def minhashEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L)
      .select(col("id1"), col("id2"), col("jac_micro").as("exact_micro"))
    val sigs = docs.select(col("doc_id"),
      Dedup.minHashSignature(col("text"), numHashes = 24).as("sig"))
    val matches = aggregate(
      zip_with(col("s1"), col("s2"), (a, b) => when(a === b, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    pairs
      .join(sigs.select(col("doc_id").as("id1"), col("sig").as("s1"))
        .hint("shuffle_hash"), Seq("id1"))
      .join(sigs.select(col("doc_id").as("id2"), col("sig").as("s2"))
        .hint("shuffle_hash"), Seq("id2"))
      .select(col("id1"), col("id2"), col("exact_micro"),
        floor(matches * lit(1000000.0) / lit(24)).cast("long").as("est_micro"))
  }

  /** [[jaccardPairs]] with a document-frequency cap (shingles in > 5
    * docs dropped from the universe) — bounded join fan-out on corpora
    * with boilerplate shingles; set sizes recomputed over survivors. */
  def jaccardCapped(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L, maxDocFreq = Some(5L))

  /** Near-dup group resolution: exact-Jaccard pairs ≥ 0.5 resolved into
    * transitive clusters (connected components by distributed min-label
    * propagation — a–b + b–c ⇒ one cluster), emitted for EVERY document
    * (singletons are their own cluster). cluster_id = smallest member
    * id, the same survivor convention as exact dedup. */
  def neardupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L)
    val clusters = Dedup.nearDupClusters(pairs)
    docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** q43's clustering served from a persisted build-once ARTIFACT —
    * the [[annIvfPersisted]] (q146) discipline applied to the single
    * most expensive corpus derivative in the suite: the near-dup
    * clustering is recomputed by SEVEN consumers (q49/q118/q131/q133/
    * q139/q142 plus the q150/q151 funnel pair) when run standalone,
    * and at 100 TB no pipeline rebuilds its clustering per consumer —
    * it is built once per corpus snapshot and read many times. First
    * touch per run builds the artifact ([[neardupClusters]] verbatim →
    * atomic-publish parquet, [[graft.sources.Artifacts]]); every later
    * consumer pays one parquet scan. The q152 gate shares q43's oracle
    * VERBATIM, so any round-trip drift (row loss, type widening,
    * encoding) is a hash flip against the same ground truth. */
  def neardupClustersPersisted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    val path = Artifacts.ensure("cluster_index", sfDir) { p =>
      Artifacts.publish(neardupClusters(spark, sfDir), p)
    }
    spark.read.parquet(path)
  }

  /** q43's clustering over CAPPED pair discovery — the 100 TB path for
    * the clustering family, shipped the round its need was measured
    * (BASELINE round-11): at sf3 the uncapped exact-Jaccard join under
    * q43 went quadratic (candidate pairs 125 M → 1.06 B at 3× data —
    * shingle df grows with corpus size once the shingle universe
    * saturates, and boilerplate shingles saturate ANY corpus
    * eventually), while the df-cap held q34/q113 at ≤ 2.6×. Same
    * discovery as q34 (shingles in > 5 docs dropped from the universe,
    * Jaccard recomputed over survivors; read from the shared
    * `cappedPairsShared` artifact), same checkpointed CC and
    * singleton coalesce as q43 — so the only semantic delta vs q43 is
    * pairs discoverable ONLY through stop-shingles, and q157 measures
    * that delta as data. The q79→q113 / q19→q123 twin discipline: q43
    * stays the exact worst-case gate; this is the production path. */
  /** The df-capped pair relation (q34's exact parameters) as a
    * build-once-per-run ARTIFACT — the capped discovery is the
    * production pipeline's materialized output, and THREE consumers
    * here (q156's clustering, q157 via q156, q160's provenance
    * matrix) would otherwise each re-pay the shingle join per run.
    * The discovery arithmetic itself stays inline-gated by q34 (the
    * q43-inline/q152-artifact split applied to pairs). */
  private def cappedPairsShared(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    val path = Artifacts.ensure("capped_pairs", sfDir) { p =>
      Artifacts.publish(
        Dedup.jaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text",
          shingleN = 3, minJaccardMicro = 500000L, maxDocFreq = Some(5L)), p)
    }
    spark.read.parquet(path)
  }

  def cappedNeardupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val clusters = Dedup.nearDupClusters(cappedPairsShared(spark, sfDir))
    docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** INCREMENTAL clustering maintenance — merge an ingest batch into
    * an existing clustering WITHOUT re-running pair discovery over the
    * standing corpus, and prove the result identical to a full rebuild
    * (this query shares q43's oracle VERBATIM — the merge is
    * bit-equal to clustering the whole corpus from scratch, which is
    * the correctness contract incremental maintenance must meet).
    *
    * Why it works: the standing clustering's `(cluster_id, id)`
    * assignments are a spanning set of edges for every old component,
    * so connected components over `old-assignment edges ∪ pairs
    * touching the batch` equals components over ALL pairs — two old
    * docs connected only through a new doc still merge via their
    * batch edges, and old-old connectivity is preserved by the
    * assignment edges. Pair discovery therefore runs only on
    * within-batch ([[Dedup.jaccardPairs]] on the batch) and
    * batch-vs-corpus ([[Dedup.jaccardPairsAgainst]], exact) — at a
    * 1% ingest rate that is ~1% of the full discovery's shuffle; the
    * old side contributes one already-computed assignment relation
    * (in deployment: the q152 artifact of the PREVIOUS snapshot).
    *
    * Batch split = the q85/q106 ingest convention (`doc_id % 5 == 0`).
    */
  def incrClusterMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val oldEdges = Dedup.nearDupClusters(
        Dedup.jaccardPairs(old, "doc_id", "text",
          shingleN = 3, minJaccardMicro = 500000L))
      .filter(col("cluster_id") =!= col("id"))
      .select(col("cluster_id").as("id1"), col("id").as("id2"))
    val withinBatch = Dedup.jaccardPairs(batch, "doc_id", "text",
        shingleN = 3, minJaccardMicro = 500000L)
      .select(col("id1"), col("id2"))
    val crossPairs = Dedup.jaccardPairsAgainst(batch, old, "doc_id", "text",
        shingleN = 3, minJaccardMicro = 500000L)
      .select(col("id1"), col("id2"))
    val merged = Dedup.nearDupClusters(
      oldEdges.unionAll(withinBatch).unionAll(crossPairs))
    docs.select(col("doc_id"))
      .join(merged.select(col("id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** The previous-snapshot clustering ARTIFACT the q168 deployment
    * path reads: the standing corpus slice (`doc_id % 5 =!= 0` — the
    * q85/q106 ingest convention's "already ingested" side) clustered
    * once and persisted (the q152 mechanism applied to the old
    * slice). In deployment this file IS last snapshot's q152 output —
    * nothing here is recomputed at merge time. */
  private def oldSliceClustersPersisted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    val path = Artifacts.ensure("cluster_index_old", sfDir) { p =>
      val old = t(spark, sfDir, "documents").filter(col("doc_id") % 5 =!= 0)
      val clusters = Dedup.nearDupClusters(
        Dedup.jaccardPairs(old, "doc_id", "text",
          shingleN = 3, minJaccardMicro = 500000L))
      Artifacts.publish(old.select(col("doc_id"))
        .join(clusters.select(col("id").as("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")), p)
    }
    spark.read.parquet(path)
  }

  /** q166's incremental merge on the DEPLOYMENT path — old-side
    * connectivity comes from the persisted previous-snapshot
    * clustering ([[oldSliceClustersPersisted]] — one parquet scan)
    * instead of being re-discovered in-query, so the merge itself
    * pays only batch discovery: within-batch pairs + batch-vs-corpus
    * pairs (~the batch's share of full discovery at a bounded ingest
    * rate) + one CC over assignment edges ∪ batch edges. Same
    * spanning-edge argument as q166, same q43-verbatim oracle, so
    * bit-equality to a full rebuild is inherited — this gate closes
    * the round-11 verdict's "deployment claim unmeasured" gap: q166
    * defines correctness with old-side discovery inline; q168 proves
    * the artifact-fed merge identical and measures what a deployment
    * actually pays (the BASELINE.md sf1 row). */
  def incrClusterMergeDeployed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val oldEdges = oldSliceClustersPersisted(spark, sfDir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("cluster_id").as("id1"), col("doc_id").as("id2"))
    val withinBatch = Dedup.jaccardPairs(batch, "doc_id", "text",
        shingleN = 3, minJaccardMicro = 500000L)
      .select(col("id1"), col("id2"))
    val crossPairs = Dedup.jaccardPairsAgainst(batch, old, "doc_id", "text",
        shingleN = 3, minJaccardMicro = 500000L)
      .select(col("id1"), col("id2"))
    val merged = Dedup.nearDupClusters(
      oldEdges.unionAll(withinBatch).unionAll(crossPairs))
    docs.select(col("doc_id"))
      .join(merged.select(col("id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Exact-vs-capped clustering AGREEMENT audit — the number that
    * licenses running q156 instead of q43 in production: for every
    * doc, do the two clusterings elect the same representative
    * (cluster_id = smallest member, so equality of cluster_id IS
    * same-verdict)? Emitted as one row (n_docs, n_same, same_ppm,
    * n_clusters_exact, n_clusters_capped). A same_ppm drop between
    * corpus snapshots means stop-shingle-only duplicate families are
    * growing — the signal to tighten the cap or add template rules,
    * read as data exactly like q122's bucket audit. The exact side
    * reads the q152 artifact (one parquet scan); only the capped side
    * is computed. */
  def clusteringAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = neardupClustersPersisted(spark, sfDir)
      .select(col("doc_id"), col("cluster_id").as("c_exact"))
    val capped = cappedNeardupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id").as("c_capped"))
    // the per-(c_exact, c_capped) rollup shrinks the relation to
    // |distinct cluster pairs| BEFORE any distinct counting; the two
    // distinct-cluster counts then come from a TAGGED UNION of the
    // rollup (side 'e' keyed by c_exact, side 'c' by c_capped) and
    // two more keyed partial aggs — a chain of ordinary group-bys,
    // no countDistinct, so the dual-distinct Expand (3 projections
    // per input row) never plans. Both union branches share the
    // rollup's shuffle verbatim, so ReuseExchange computes the doc
    // join + rollup ONCE; the duplicated final agg runs over
    // cluster-count rows.
    val rolled = exact.join(capped.hint("shuffle_hash"), "doc_id")
      .groupBy(col("c_exact"), col("c_capped"))
      .agg(count(lit(1)).as("n_pair_docs"),
        sum(when(col("c_exact") === col("c_capped"), 1L).otherwise(0L))
          .as("n_pair_same"))
    // doc/same totals ride side 'e' only (each rollup row counted once)
    rolled.select(lit("e").as("side"), col("c_exact").as("cid"),
        col("n_pair_docs"), col("n_pair_same"))
      .unionAll(rolled.select(lit("c").as("side"),
        col("c_capped").as("cid"),
        lit(0L).as("n_pair_docs"), lit(0L).as("n_pair_same")))
      .groupBy(col("side"), col("cid"))
      .agg(sum(col("n_pair_docs")).as("d"), sum(col("n_pair_same")).as("s"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("d")).as("d"), sum(col("s")).as("s"))
      .agg(coalesce(max(when(col("side") === "e", col("d"))), lit(0L))
          .as("n_docs"),
        coalesce(max(when(col("side") === "e", col("s"))), lit(0L))
          .as("n_same"),
        coalesce(max(when(col("side") === "e", col("n_clusters"))),
          lit(0L)).as("n_clusters_exact"),
        coalesce(max(when(col("side") === "c", col("n_clusters"))),
          lit(0L)).as("n_clusters_capped"))
      // zero joined docs: the pre-rewrite countDistinct aggregate
      // returned 0s, not NULLs — coalesce (and the DIV-by-zero guard
      // on same_ppm) preserves that contract; non-empty inputs are
      // untouched (n_docs > 0 and every max is non-null there).
      .select(col("n_docs"), col("n_same"),
        coalesce(expr("(n_same * 1000000) DIV n_docs"), lit(0L))
          .as("same_ppm"),
        col("n_clusters_exact"), col("n_clusters_capped"))
  }

  /** Cross-source COPY matrix — dedup provenance: for every unordered
    * source pair, how many near-dup pairs straddle it (and how many
    * stay within one source — the diagonal). The table that answers
    * "which feeds mirror which": a hot off-diagonal cell is two crawls
    * of the same site (drop one feed), a hot diagonal cell is a
    * self-duplicating source (templating). Reads the SHARED
    * df-capped pair artifact (`cappedPairsShared` — q34's relation,
    * built once per run, also feeding q156/q157): the provenance
    * audit must run at corpus scale, where the uncapped q17 join is
    * quadratic (BASELINE round 11); sources are canonicalized
    * `least/greatest` so the matrix is one triangle.
    *
    * Scale shape: one pairs-artifact scan + two shuffle-hash
    * id→source probes + a source²-bounded partial agg. */
  def sourceCopyMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    cappedPairsShared(spark, sfDir)
      .join(src.select(col("doc_id").as("id1"), col("source").as("s1"))
        .hint("shuffle_hash"), Seq("id1"))
      .join(src.select(col("doc_id").as("id2"), col("source").as("s2"))
        .hint("shuffle_hash"), Seq("id2"))
      .groupBy(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Shingle SATURATION audit — the alarm that predicts exactly the
    * failure the round-11 sf3 bench measured: once a corpus's distinct
    * shingle count stops growing (tiny realized vocab, or boilerplate
    * dominating a web crawl), per-shingle document frequency grows
    * linearly with corpus size and every shingle-keyed discovery join
    * (q17/q43) goes QUADRATIC. One row of integer health numbers:
    * shingle occurrences vs distinct shingles (mean df), the max df,
    * and the occurrence mass sitting in stop-shingles (df > 5 — the
    * exact mass the q34/q156 cap drops, so `stop_mass_ppm` is also
    * the cap's predicted recall exposure). Trended across snapshots,
    * rising `mean_df_milli` at flat `n_distinct_shingles` is the
    * signal to switch clustering from q43 to q156.
    *
    * Scale shape: one exploded distinct-(doc,shingle) stream, one
    * partial-agged df count, one 1-row rollup — strictly cheaper than
    * any discovery join it gates. */
  def shingleSaturation(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val ex = docs.select(col("doc_id"),
      explode(Dedup.shingleSet(col("text"), 3)).as("sh"))
    val dfs = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val nd = docs.select(count(lit(1)).as("n_docs"))
    dfs.agg(
        count(lit(1)).as("n_distinct_shingles"),
        sum(col("df")).as("n_occurrences"),
        max(col("df")).as("max_df"),
        sum(when(col("df") > 5L, 1L).otherwise(0L)).as("n_stop_shingles"),
        sum(when(col("df") > 5L, col("df")).otherwise(0L)).as("stop_occurrences"))
      .crossJoin(broadcast(nd))
      .select(col("n_docs"), col("n_distinct_shingles"), col("n_occurrences"),
        col("max_df"), col("n_stop_shingles"), col("stop_occurrences"),
        expr("(n_occurrences * 1000) DIV n_distinct_shingles").as("mean_df_milli"),
        expr("(stop_occurrences * 1000000) DIV n_occurrences").as("stop_mass_ppm"))
  }

  /** CLUSTERING POLICY — q161's alarm with its action attached (the
    * round-11 verdict's ask): one row that reads the saturation
    * signals and ELECTS the clustering path for this corpus snapshot.
    * The rule, calibrated on the measured sf0.01 → sf3 trajectory
    * (BASELINE.md's saturation table + the q43-vs-q156 runtimes):
    *
    *  - `mean_df_milli > 10000` (mean shingle df > 10 — the uncapped
    *    join's per-shingle fan-out is quadratic-regime) OR
    *    `stop_mass_ppm > 500000` (most occurrence mass already sits
    *    in stop-shingles the cap would drop, so the cap's recall
    *    exposure is priced and its savings are large)
    *    → **capped_q156** (df-capped discovery + CC; 1.3× at 3× data
    *      where exact is 14.1×);
    *  - otherwise → **exact_q43** (the shingle universe still grows
    *    with the corpus; exact discovery is ~linear and keeps the
    *    stop-shingle-only pairs q157 would otherwise price).
    *
    * The decision is DATA, not configuration: a pipeline runs this
    * query per snapshot and branches on `policy`, exactly like q122's
    * bucket audit gates LSH parameters. Integer thresholds, integer
    * signals — engine-portable, and the q157 agreement audit is the
    * standing check on what the capped choice costs. */
  def clusteringPolicy(spark: SparkSession, sfDir: String): DataFrame =
    shingleSaturation(spark, sfDir)
      .select(col("n_docs"), col("n_distinct_shingles"),
        col("mean_df_milli"), col("stop_mass_ppm"),
        lit(5L).as("df_cap"),
        when(col("mean_df_milli") > 10000L || col("stop_mass_ppm") > 500000L,
          lit("capped_q156")).otherwise(lit("exact_q43")).as("policy"))

  /** Near-dup cluster-size DISTRIBUTION — the dedup-health audit run
    * after clustering ([[neardupClusters]]): how many clusters exist at
    * each size, and how many docs they hold. The number ops teams watch
    * is the tail: a mega-cluster (thousands of "near-dups" of one
    * template) means boilerplate broke shingling and the dedup pass is
    * about to delete a source wholesale. Two tiny partial-agged
    * groupBys on top of the clustering — the histogram's cardinality
    * is bounded by the largest cluster size, so every relation past
    * the first agg is negligible at any corpus scale. Reads the
    * [[neardupClustersPersisted]] artifact — the audit is exactly the
    * kind of secondary consumer that must not re-pay the clustering. */
  def clusterSizeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    neardupClustersPersisted(spark, sfDir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** Bigram-LM predictability score — the engine-native analogue of the
    * CCNet/Gopher perplexity quality filter (score each doc by how
    * well a language model trained ON the corpus predicts it; gibberish
    * and boilerplate-shredded text land in the tails). No external LM
    * binary exists in a pure-Spark pipeline, so the model IS a corpus
    * artifact: add-one-smoothed bigram transition probabilities,
    * p(w2|w1) = (c(w1 w2)+1)/(c(w1·)+V), built from the same scan.
    *
    * Determinism: probabilities are integer ppm, floored model-side
    * (`(c12+1)*1e6 DIV (c1+V)` — all counts, no FP), and the per-doc
    * score is the integer mean of its bigrams' ppm — any engine replays
    * the exact longs, so the gate hashes model AND scoring.
    *
    * Scale shape: the model is one partial-agged wordpair count —
    * bounded by the corpus's REALIZED bigram vocabulary, not its row
    * count — with its probability column computed once, model-side.
    * Scoring is a single bigram-keyed shuffle-hash equi-join (the
    * model is deliberately NOT broadcast: a realized BPE-level bigram
    * table is tens of GB at 100 TB corpus scale) followed by a per-doc
    * partial agg. The V scalar rides a 1-row cross join. Nothing is
    * ever all-pairs and no relation exceeds the exploded token stream
    * the wordcount (q36) already pays. */
  def bigramLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val tk = TextFunctions.tokens(col("text"))
    val bg = when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val docBg = docs.select(col("doc_id"), explode(bg).as("bigram"))
    val bgCounts = docBg.groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val leftCounts = bgCounts.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(tk).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val model = bgCounts.join(leftCounts, "w1").crossJoin(vocab)
      .select(col("bigram"),
        expr("((c12 + 1) * 1000000) DIV (c1 + v)").as("p_ppm"))
    docBg.join(model.hint("shuffle_hash"), "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s DIV n_bigrams").as("lm_ppm"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor in a deterministic 1-in-10 sample, the single most
    * cosine-similar vector carrying a DIFFERENT label (the "looks like
    * X, labeled Y" example a contrastive or reranker objective needs;
    * random negatives are trivially easy and teach nothing).
    *
    * Scale shape: the q21/q54 discipline — the anchor set is the
    * bounded side (a FIXED-SIZE 256-anchor deterministic hash sample,
    * the q44 sampled-gate shape: a mining batch is bounded, it does
    * not grow with the corpus) and is broadcast; the corpus STREAMS
    * through the label-mismatch BNLJ once, and the per-anchor argmax
    * is a partial-aggable lexicographic `min` on a
    * `(−cos_micro, id, label)` struct, so the shuffle carries one
    * struct per anchor per partition. Similarity is floored to integer
    * micro BEFORE the ordering, so the winner (and its id tie-break)
    * replays exactly in any engine. Mining EVERY corpus row flips the
    * broadcast to the [[annLsh]]/[[annIvf]] bucketed discovery path —
    * mining is an ANN consumer, not a new join shape. */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val emb = t(spark, sfDir, "embeddings")
    val q = emb
      .orderBy(pmod(col("vec_id") * 2654435761L + 12345L, lit(1000003L)),
        col("vec_id"))
      .limit(256)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val it = emb.select(col("vec_id").as("i_id"), col("embedding").as("i_vec"),
      col("label").as("i_label"))
    it.join(broadcast(q), col("i_label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"),
        struct(
          (-floor(VectorFunctions.cosineSimilarity(col("q_vec"), col("i_vec"))
            * 1000000.0).cast("long")).as("nc"),
          col("i_id").as("nid"), col("i_label").as("nlabel")).as("s"))
      .groupBy(col("query_id"), col("q_label"))
      .agg(min(col("s")).as("m"))
      .select(col("query_id"), col("q_label"),
        col("m.nid").as("neighbor_id"), col("m.nlabel").as("neighbor_label"),
        (-col("m.nc")).as("cos_micro"))
  }

  /** k-NN label-purity audit — label-noise detection over a labeled
    * embedding corpus: for each anchor in a deterministic 1-in-7
    * sample, how many of its 5 nearest neighbors (cosine distance)
    * share its label. Low purity flags probable mislabels / ambiguous
    * samples — the confident-learning signal a curation pipeline uses
    * to quarantine training rows before a fine-tune.
    *
    * Scale shape: anchors broadcast, corpus streams (q21 discipline);
    * the anchor set is a FIXED-SIZE 128-row deterministic hash sample
    * (q44 sampled-gate shape — an audit runs on a sample, so the gate
    * itself stays linear in the corpus at any sf); the per-anchor
    * top-5 is the bounded-heap [[operators.TopK]] partial agg; the
    * neighbor-label resolution joins the corpus's label relation
    * against the BROADCAST anchor×5 top list (the bounded side), then
    * one partial-agged purity count per anchor. Nothing corpus-sized
    * ever shuffles on a non-key. */
  def labelPurity(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val emb = t(spark, sfDir, "embeddings")
    val a = emb
      .orderBy(pmod(col("vec_id") * 2654435761L + 12345L, lit(1000003L)),
        col("vec_id"))
      .limit(128)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label"))
    val it = emb.select(col("vec_id").as("i_id"), col("embedding").as("i_vec"),
      col("label").as("i_label"))
    val top = it.join(broadcast(a), col("i_id") =!= col("a_id"))
      .select(col("a_id"), col("a_label"),
        VectorFunctions.cosineDistance(col("a_vec"), col("i_vec")).as("dist"),
        col("i_id"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(operators.TopK.topK(5)(col("dist"), col("i_id"), col("i_id")).as("top"))
      .select(col("a_id"), col("a_label"), explode(col("top")).as("n"))
      .select(col("a_id"), col("a_label"), col("n.id").as("i_id"))
    emb.select(col("vec_id").as("i_id"), col("label").as("i_label"))
      .join(broadcast(top), Seq("i_id"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("i_label") === col("a_label"), 1L).otherwise(0L)).as("n_match"))
      .select(col("a_id").as("vec_id"), col("a_label").as("label"),
        col("n_neighbors"), col("n_match"),
        expr("(n_match * 1000000) DIV n_neighbors").as("purity_ppm"))
  }

  /** [[operators.SemDedup.semDedup]] under the oracle gate — SEMANTIC
    * dedup (k-means-partitioned within-cluster cosine) with the entire
    * pipeline, deterministic Lloyd clustering included, replayed by the
    * oracle: 8 clusters, 2 Lloyd rounds over milli-quantized vectors,
    * drop at cosine ≥ 0.35 against a smaller-id cluster-mate. The gate
    * therefore pins the quantization, the codebook seeding, both
    * centroid updates, the final assignment, AND the dedup verdicts —
    * not just the pair arithmetic. See the operator scaladoc for why
    * the k-means stage is what makes semantic dedup affordable at
    * corpus scale (`k ∝ n` bounds within-cluster all-pairs). */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    operators.SemDedup.semDedup(t(spark, sfDir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 2, minCosineMicro = 350000L)

  /** q127 under a WIDTH CAP ([[operators.SemDedup.semDedup]]'s
    * `maxClusterWidth`) — the q121/q123 discipline applied to
    * SemDeDup's one residual blow-up: "raise k" bounds the AVERAGE
    * cluster width, but a template mega-cluster concentrates mass in
    * one centroid regardless of k, and that cluster alone pays
    * width²/2 cosine comparisons. Clusters wider than the cap are
    * excluded from the pair join (members all KEPT — no verdict
    * reached). The cap is set deliberately low (65) so the drop path
    * itself is oracle-gated at the verification SF: two of the eight
    * sf0.01 clusters exceed it and their members' verdicts flip to
    * kept vs q127 — the gate pins the exclusion, not just the happy
    * path. At sf0.1's uniform widths (~250) every cluster trips the
    * cap — the mega-cluster regime, where the capped cost is Lloyd
    * only; q154 is the audit that makes that visible as data. */
  def cappedSemDedup(spark: SparkSession, sfDir: String): DataFrame =
    operators.SemDedup.semDedup(t(spark, sfDir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 2, minCosineMicro = 350000L,
      maxClusterWidth = Some(65))

  /** Per-cluster width audit under q153's cap
    * ([[operators.SemDedup.clusterWidthAudit]], the q122 pattern):
    * same corpus, same Lloyd parameters, per-cluster width and the
    * dropped flag a capped run would apply — the number an ops team
    * watches for a template family concentrating in one centroid.
    * ≤ k rows out of one partial-agged groupBy. */
  def semDedupWidthAudit(spark: SparkSession, sfDir: String): DataFrame =
    operators.SemDedup.clusterWidthAudit(t(spark, sfDir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 2, maxClusterWidth = 65)

  /** Duplicate-n-gram fraction — the Gopher-family CROSS-CORPUS
    * repetition signal (q55 measures repetition WITHIN a doc; this
    * measures how much of a doc is text that also appears elsewhere):
    * per document, the fraction of its word 4-grams whose corpus
    * document-frequency is ≥ 2, in ppm. High values mark boilerplate
    * shells and template families — the docs near-dedup is about to
    * cluster — making this the cheap pre-filter a pipeline runs BEFORE
    * the (more expensive) pairwise passes.
    *
    * Scale shape: one exploded n-gram stream (the q36/q47 cost), a
    * partial-agged per-gram distinct-doc count (single-distinct
    * rewrite, no Expand), and one gram-keyed shuffle-hash join back —
    * the gram relation is corpus-derived and never broadcast. All
    * arithmetic integer (ppm via exact DIV). */
  def dupNgramFraction(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    // grams built from four shifted slices (the q47 idiom): the token
    // array is staged once per row behind a projection — an
    // element_at-per-index lambda would re-evaluate the split per
    // element reference (measured 10× slower on this corpus)
    val tk = col("tk")
    val grams = when(size(tk) >= 4,
      zip_with(
        zip_with(slice(tk, lit(1), size(tk) - 3),
          slice(tk, lit(2), size(tk) - 3), (a, b) => concat(a, lit(" "), b)),
        zip_with(slice(tk, lit(3), size(tk) - 3),
          slice(tk, lit(4), size(tk) - 3), (a, b) => concat(a, lit(" "), b)),
        (x, y) => concat(x, lit(" "), y)))
      .otherwise(array().cast("array<string>"))
    val dg = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(grams).as("g"))
    val dfreq = dg.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("df"))
    dg.join(dfreq.hint("shuffle_hash"), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("(n_dup * 1000000) DIV n_grams").as("dup_ppm"))
  }

  /** BPE merge-round — the tokenizer-TRAINING precursor: from the
    * corpus word frequencies, the top-20 adjacent character-pair merge
    * candidates by total weighted occurrence (the statistic byte-pair
    * encoding greedily merges on). One gated round; a full BPE train
    * loops this, and after round one the loop runs entirely on the
    * VOCAB-BOUNDED (word, freq) table — the corpus is scanned exactly
    * once, which is what makes tokenizer training on 100 TB feasible
    * (the expensive part is this word count, already partial-agged).
    *
    * Scale shape: token-stream partial-agg wordcount → per-word char
    * pairs built from two shifted slices (the q47/q128 idiom, never an
    * index lambda) weighted by word freq → pair partial-agg →
    * TakeOrderedAndProject top-20 (20 rows cross the driver, nothing
    * else). Deterministic (weight desc, pair asc) total order. */
  def bpeMergeRound(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val words = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // split-by-empty-regex appends a trailing "" under Spark's -1
    // limit — bound the char array to the word's length
    val ch = slice(split(col("w"), ""), lit(1), length(col("w")))
    val pairs = zip_with(slice(ch, lit(1), size(ch) - 1),
      slice(ch, lit(2), size(ch) - 1), (a, b) => concat(a, lit(" "), b))
    words
      .select(col("freq"), explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("weight"))
      .orderBy(col("weight").desc, col("pair").asc)
      .limit(20)
  }

  /** Count-min-sketch heavy-hitter gate — the q53 discipline applied
    * to the THIRD sketch family (HLL++ q53, t-digest q99, CMS here):
    * Spark's mergeable `count_min_sketch` aggregate (one partial-agged
    * pass, a few KB of state at ANY corpus size) is probed for the
    * top-20 corpus tokens and must satisfy both CMS guarantees against
    * the exact counts — never an underestimate, and within `ε·N` above
    * (ε = 0.001, δ = 0.001, fixed seed ⇒ deterministic flags). The
    * oracle replays the exact top-20 and literal pass flags, so a
    * sketch-quality regression (or a Spark CMS behavior change) flips
    * a flag and fails the hash gate.
    *
    * Scale shape: the sketch and the token count ride ONE partial agg
    * over the exploded token stream; the exact top-20 twin is the
    * vocab-bounded wordcount (TakeOrderedAndProject). The only driver
    * traffic is the KB sketch + 20 rows (probing 20 values against a
    * driver-held sketch is the IVF-codebook kind of driver-legitimate;
    * at 100 TB the CMS replaces the exact side, which is exactly why
    * its quality is gated here against the exact twin at test scale).
    */
  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions
    import org.apache.spark.util.sketch.CountMinSketch
    val docs = t(spark, sfDir, "documents")
    val tok = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    val row = tok.agg(
      expr("count_min_sketch(tok, 0.001d, 0.999d, 42)").as("cms"),
      count(lit(1)).as("n")).head()
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val bound = math.ceil(0.001 * row.getLong(1)).toLong
    val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.toSeq.map { case (t, c) =>
      val e = cms.estimateCount(t)
      (t, c, if (e >= c) 1L else 0L, if (e <= c + bound) 1L else 0L)
    }.toDF("tok", "exact_cnt", "no_underestimate", "within_eps")
  }

  /** SOFT dedup — near-dup-aware training weights instead of drops:
    * every document keeps `weight_ppm = ⌊1e6 / cluster_size⌋` over its
    * q43 near-dup cluster, so each content neighborhood contributes
    * ~one document's worth of gradient mass regardless of how many
    * copies the crawl collected. The reweighting alternative to hard
    * dedup (q49 drops losers outright) — the right tool when copies
    * carry signal (popularity) that a drop would erase but raw counts
    * would over-train on.
    *
    * Scale shape: reads the [[neardupClustersPersisted]] artifact
    * (one parquet scan) plus one cluster-keyed count and one
    * shuffle-hash join-back — both bounded by the corpus, nothing
    * broadcast. */
  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val cl = neardupClustersPersisted(spark, sfDir)
    val sizes = cl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    cl.join(sizes.hint("shuffle_hash"), "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        expr("CAST(1000000 DIV cluster_size AS BIGINT)").as("weight_ppm"))
  }

}
