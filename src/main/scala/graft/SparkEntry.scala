package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Knn, Packing, SimilaritySearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY §2
  * (reference-parity surface) or the LLM-pipeline extension set, expressed
  * over the driver's parquet testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the hash-match gate.
  *
  * FP-portability rule for oracle-checked outputs: integers, or doubles
  * produced by per-row deterministic arithmetic — never order-dependent
  * FP aggregation (sums of non-integral doubles are emitted as per-row
  * rounded integer cents instead).
  */
object SparkEntry {

  /** Flagship: end-to-end KNN classification (the reference's one query,
    * Hadoop.java) over the sf0.001 embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnPredict(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}

/** The declared query set. Kept separate from the [[SparkEntry]] contract
  * object so it can grow without touching the driver-facing surface.
  */
object Queries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  // ---------------------------------------------------------------------
  // Reference-parity surface (SURVEY §2)
  // ---------------------------------------------------------------------

  /** §2 #1/#3 — scan + projection (column pruning reaches the parquet scan). */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** §2 #2 — filter (predicate pushdown to the scan). */
  def filterPushdown(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  /** §2 #10-analog — grouped aggregation (map-side partial agg). Money sums
    * are per-row-rounded integer cents so the result is FP-order-proof. */
  def aggSum(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_price_cents"),
        count(lit(1)).as("cnt"))

  /** §2 #4-analog — broadcast equi-join of two small dims. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = t(spark, sfDir, "nation")
    val region = t(spark, sfDir, "region")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
  }

  /** Fact-to-dim join chain + aggregation (shuffle join on the fact side,
    * broadcast dims). */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    val nation = t(spark, sfDir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
  }

  /** §2 #7-analog — per-group top-n via window (the small-group path;
    * the bounded-aggregator path is exercised by [[knnPredict]]). */
  def windowTopN(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** §2 #5+#6+#7+#10 — the reference's entire pipeline: cross join ×
    * squared-Euclidean distance × bounded top-k × plurality vote, over the
    * embeddings table. Queries = every 25th vector; train = the rest.
    */
  def knnPredict(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val test = emb.filter(col("vec_id") % 25 === 0)
    val train = emb.filter(col("vec_id") % 25 =!= 0)
    Knn.classify(
      train = train, test = test, k = 5,
      trainId = "vec_id", testId = "vec_id",
      trainVec = "embedding", testVec = "embedding",
      labelCol = "label")
  }

  /** §2 #12 — accuracy evaluation of [[knnPredict]] against true labels,
    * emitted as exact integers (correct, total). */
  def knnAccuracy(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    Knn.accuracy(
      knnPredict(spark, sfDir),
      emb.filter(col("vec_id") % 25 === 0),
      truthId = "vec_id", truthLabel = "label")
  }

  // ---------------------------------------------------------------------
  // Text analysis (LLM-pipeline extension set; functions/TextFunctions)
  // ---------------------------------------------------------------------

  /** Token counting: whitespace tokens, distinct tokens, chars, BPE-ish
    * sub-word count — the per-document stats a data pipeline filters on. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_distinct"),
      charCount(col("text")).as("n_chars_actual"),
      bpeTokenCount(col("text")).as("bpe_tokens"))
  }

  /** Quality scoring: integer-exact score in [0,1000] from length +
    * stopword-density components. */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      stopwordCount(col("text")).as("stop_cnt"),
      qualityScore(col("text")).as("quality"))
  }

  /** Language ID: marker-word heuristic, deterministic tie-break. */
  def langIdQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      langId(col("text")).as("lang_guess"))
  }

  /** Document fingerprint: order-sensitive rolling hash mod 1e9+7. */
  def fingerprintQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"))
  }

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
    val scored = qtoks
      .join(corpus.hint("shuffle_hash"), Seq("tok"))
      .join(dfreq.hint("shuffle_hash"), Seq("tok"))
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

  /** Near-dup cluster-size DISTRIBUTION — the dedup-health audit run
    * after clustering ([[neardupClusters]]): how many clusters exist at
    * each size, and how many docs they hold. The number ops teams watch
    * is the tail: a mega-cluster (thousands of "near-dups" of one
    * template) means boilerplate broke shingling and the dedup pass is
    * about to delete a source wholesale. Two tiny partial-agged
    * groupBys on top of the clustering — the histogram's cardinality
    * is bounded by the largest cluster size, so every relation past
    * the first agg is negligible at any corpus scale. */
  def clusterSizeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    neardupClusters(spark, sfDir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  // ---------------------------------------------------------------------
  // Similarity search (operators/SimilaritySearch)
  // ---------------------------------------------------------------------

  /** Exact cosine top-5 neighbors for every 10th vector (brute force —
    * the correctness baseline for ANN). */
  def annExact(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    SimilaritySearch.cosineTopK(
      emb.filter(col("vec_id") % 10 === 0), emb.filter(col("vec_id") % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_micro"))
  }

  /** Approximate cosine top-5 via MULTI-PROBE random-hyperplane LSH
    * (5 planes × 12 tables, 5 one-bit probe flips — recall@5 0.90 at
    * sf0.1 vs 0.54 for round-6's unprobed 5×12, at the SAME corpus
    * cost; swept by `graft.TuneAnn`). Each query probes its own bucket
    * plus the 5 buckets one hyperplane-vote away, so only the QUERY
    * side fans out ×6 — the corpus (100 TB) side still emits exactly
    * `tables` rows per item. Deterministic planes let the DuckDB
    * oracle replicate it exactly. Scale rule: planes grow
    * ~log₂(corpus / target-bucket-size) so buckets stay bounded;
    * tables buy recall at corpus-shuffle cost, probe flips buy it at
    * query-shuffle cost — spend flips first. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    SimilaritySearch.approxCosineTopK(
      emb.filter(col("vec_id") % 10 === 0), emb.filter(col("vec_id") % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding",
      dim = 64, planes = 5, tables = 12, probeFlips = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_micro"))
  }

  /** IVF-flat approximate top-5 (64 deterministic sampled centroids,
    * probe 16, MULTI-ASSIGN 2 — recall@5 0.80 at sf0.1 vs 0.56 for
    * round-6's 32/8/1, scan fraction 16·2/64 = 0.5; swept by
    * `graft.TuneAnn`) — the second ANN scale path next to hyperplane
    * LSH: broadcast codebook, per-item nearest-centroid assignment
    * with map-side sort+slice, exact search only in probed inverted
    * lists. Multi-assignment replicates each item into its 2 nearest
    * cells, the recall lever for lossy cell boundaries (index ×2, a
    * candidate de-dup pays one extra candidate-sized exchange). Scale
    * rule: centroids ∝ √corpus keeps cells balanced (the coarse 64
    * here is the test-scale value — at 100 TB the fraction falls as
    * centroids grow); probes × assignments trade recall for scan
    * fraction. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    SimilaritySearch.ivfTopK(
      emb.filter(col("vec_id") % 10 === 0), emb.filter(col("vec_id") % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding",
      centroids = 64, probes = 16, assignments = 2)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_micro"))
  }

  /** ANN recall as a first-class oracle query: recall@5 of both
    * approximate paths ([[annLsh]], [[annIvf]]) against the exact
    * brute-force baseline, as integer-exact overlap counts (hits of
    * possible) — so ANN *quality*, not just plan shape, is
    * hash-checked per round.
    *
    * The gate is SAMPLE-BOUNDED (round-10 advice): 64 queries picked
    * by deterministic hash order run all three paths — exact
    * brute-force, LSH, IVF — against the FULL item corpus, so the
    * exact side costs |sample| × corpus (linear) instead of the
    * queries × corpus product that made the unsampled gate ~quadratic
    * in sf. The full-query approximate paths remain q22/q39; at real
    * scale a recall gate is always run on a query sample — this makes
    * the shipped gate that shape. */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val items = emb.filter(col("vec_id") % 10 =!= 0)
    // deterministic fixed-size query sample (TakeOrderedAndProject)
    val sq = emb.filter(col("vec_id") % 10 === 0)
      .orderBy(pmod(col("vec_id") * 2654435761L + 12345L, lit(1000003L)),
        col("vec_id"))
      .limit(64)
    val ex = SimilaritySearch.cosineTopK(sq, items,
        k = 5, "vec_id", "vec_id", "embedding", "embedding")
      .select(col("query_id"), col("neighbor_id"))
    def one(method: String, approx: DataFrame): DataFrame = {
      val hits = ex.join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      val tot = ex.agg(count(lit(1)).as("possible"))
      hits.crossJoin(tot).select(
        lit(method).as("method"), col("hits"), col("possible"),
        floor(col("hits") * 1000000.0 / col("possible")).cast("long").as("recall_micro"))
    }
    one("ivf", SimilaritySearch.ivfTopK(sq, items,
        k = 5, "vec_id", "vec_id", "embedding", "embedding",
        centroids = 64, probes = 16, assignments = 2))
      .unionAll(one("lsh", SimilaritySearch.approxCosineTopK(sq, items,
        k = 5, "vec_id", "vec_id", "embedding", "embedding",
        dim = 64, planes = 5, tables = 12, probeFlips = 5)))
  }

  /** Int8-quantized brute-force top-5 over the q21 query/item split —
    * the memory-bandwidth ANN path: codes are 4× narrower than float32
    * and the squared-Euclidean over codes is INTEGER-exact, so unlike
    * the float paths the full ranked result (not a floor-micro
    * projection) is hash-gated. Scale = one corpus-global max|x|
    * aggregate, broadcast into the quantization projection (same
    * "tiny separate job" shape as the IVF codebook). */
  def quantAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    SimilaritySearch.quantizedTopK(
      emb.filter(col("vec_id") % 10 === 0), emb.filter(col("vec_id") % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("qdist"))
  }

  /** Recall@5 of the int8-quantized sweep against the FLOAT
    * squared-Euclidean exact top-5 on the same split — quantization
    * loss, gated as integer-exact overlap counts per round (the
    * [[annRecall]] discipline applied to the quantized path). */
  def quantRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val exact = Knn.knnJoin(
      emb.filter(col("vec_id") % 10 === 0), emb.filter(col("vec_id") % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding",
      metric = "squaredEuclidean")
      .select(col("query_id"), col("neighbor_id"))
    val approx = quantAnn(spark, sfDir).select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val tot = exact.agg(count(lit(1)).as("possible"))
    hits.crossJoin(tot).select(
      lit("int8").as("method"), col("hits"), col("possible"),
      floor(col("hits") * 1000000.0 / col("possible")).cast("long").as("recall_micro"))
  }

  // ---------------------------------------------------------------------
  // Relational surface beyond the reference (sorts, set ops, semi/anti,
  // grouping sets, time windows) — all built-in Catalyst
  // ---------------------------------------------------------------------

  /** Global sort + limit with a deterministic tie-break. */
  def sortLimit(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))

  /** Set operations: customers with orders ∩/∖ customers with high-value
    * orders, as one unioned tagged result. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val all = orders.select(col("o_custkey").as("custkey"))
    val high = orders.filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey"))
    val both = all.intersect(high).withColumn("tag", lit("high"))
    val onlyLow = all.except(high).withColumn("tag", lit("low_only"))
    both.unionAll(onlyLow)
  }

  /** BAG-semantics set operations — the multiset twins of q24's
    * set-semantics ops: `EXCEPT ALL` keeps multiplicity differences
    * (a customer with 5 orders, 2 of them high-value, survives 3
    * times) and `INTERSECT ALL` keeps the minimum multiplicity. Both
    * plan as aggregate-and-replicate under Catalyst (no distinct
    * collapse), and the result is aggregated to (tag, custkey, n) so
    * multiplicities — the whole point — are what the oracle hashes. */
  def bagSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val all = orders.select(col("o_custkey").as("custkey"))
    val high = orders.filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey"))
    def counted(tag: String, df: DataFrame): DataFrame =
      df.groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .select(lit(tag).as("tag"), col("custkey"), col("n"))
    counted("except_all", all.exceptAll(high))
      .unionAll(counted("intersect_all", all.intersectAll(high)))
  }

  /** Left-semi and left-anti joins: per-nation counts of customers with
    * and without orders. */
  def semiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders").select(col("o_custkey"))
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
  }

  /** ROLLUP grouping sets over lineitem (returnflag × linestatus). */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("cnt"))

  /** CUBE grouping sets: all 2² aggregation granularities of
    * (returnflag, linestatus) in one pass. */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("cnt"))

  /** Nested-array aggregation: per nation, the sorted distinct set of
    * order statuses — collection results hash-match the oracle only
    * with a canonical (sorted, distinct) element order, which is the
    * same discipline any deterministic pipeline needs. The set is
    * emitted `array_join`ed to one comparable string (the harness's
    * row-hash comparator cannot hash array cells); the aggregation
    * under it is the real collect_set. */
  def collectAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sort_array(collect_set(col("o_orderstatus"))).as("statuses_arr"),
        count(lit(1)).as("n_orders"))
      .select(col("c_nationkey"),
        array_join(col("statuses_arr"), ",").as("statuses"),
        col("n_orders"))
  }

  /** Distinct aggregation (absent from the reference, SURVEY §2.1):
    * per-flag distinct suppliers/parts + plain counts in one pass. */
  def distinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("cnt"))

  /** Tumbling 1-hour event-time windows over the events table — the
    * batch shape of the streaming windowed aggregation
    * (streaming/StreamingOps uses the same window spec on readStream). */
  def eventsWindowed(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("value_cents"))

  // ---------------------------------------------------------------------
  // Time-series operators over events (as-of join, sessionization)
  // ---------------------------------------------------------------------

  /** As-of join: each click matched to the user's most recent error at
    * or before it (−1 when none) — union-window formulation, one
    * shuffle (operators/AsOfJoin). */
  def asofClickError(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
    AsOfJoin.asofJoin(clicks, errors, Seq("user_id"), "ts", "err_ts",
        rightPayload = Seq("matched_err" -> col("err_id")),
        rightTieBreak = col("err_id"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("matched_err"), lit(-1L)).as("matched_err"))
  }

  /** Gap-based sessionization (10-minute inactivity gap): per-user
    * session count, total events, and largest session. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = 600L * 1000000L
    val sessions = t(spark, sfDir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(w))
    sessions.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy(col("user_id"))
      .agg(max(col("sid")).as("n_sessions"),
        sum(col("sess_events")).as("n_events"),
        max(col("sess_events")).as("longest_session"))
  }

  /** PIVOT: per-returnflag counts spread across linestatus columns —
    * grouping-transpose surface (fixed value list keeps the schema
    * static, as a scale pipeline requires). */
  def pivotAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))

  /** Corpus word count: explode tokens → frequency → top 100 by
    * (count desc, token asc) — the canonical explode+agg+sort shape,
    * and the vocabulary-head query of a text pipeline. */
  def wordCount(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    t(spark, sfDir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(100)
  }

  /** Deterministic train/test split by content hash — rand()-free, so
    * every engine/retry reproduces the identical assignment (the
    * DuckDB oracle replicates it with plain arithmetic). */
  def deterministicSplit(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      operators.Sampling.bucket(col("doc_id"), 10).as("bucket"),
      operators.Sampling.splitTag(col("doc_id"), 10, 8).as("split"))

  /** [[operators.Sampling.mixKeep]] under the oracle gate: per-source
    * admission totals for a weighted data-mixing config (explicit ppm
    * for four sources, a default for the rest). ONE scan, one
    * partial-agged groupBy — the keep decision is a per-row predicate
    * folded into a conditional aggregate, no join, no second pass. */
  def sourceMix(spark: SparkSession, sfDir: String): DataFrame = {
    val weights = Map(
      "src0" -> 1000000L, // keep all
      "src1" -> 500000L,  // half
      "src2" -> 250000L,  // quarter
      "src3" -> 0L)       // drop entirely
    val keep = operators.Sampling.mixKeep(
      col("doc_id"), col("source"), weights, defaultPpm = 750000L)
    t(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(keep, lit(1L)).otherwise(lit(0L))).as("n_kept"))
      .withColumn("kept_ppm",
        floor(col("n_kept") * lit(1000000.0) / col("n_total")).cast("long"))
  }

  /** [[graft.functions.TextFunctions.redact]] under the oracle gate:
    * PII-style scrubbing of the events payload — digit runs masked to
    * a fixed token, with `n_digit_runs` = digit runs present in the
    * RAW pre-redaction text as the audit column (it can exceed the
    * digit pass's replacement count, since the email/URL passes may
    * consume digits first — a prevalence signal, not a replacement
    * tally). A pure map-only projection (no shuffle at any scale); the
    * regex subset is the engine-portable one (character classes +
    * repetition, no lookaround), so Java and RE2 engines agree
    * match-for-match. */
  def redactEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    t(spark, sfDir, "events").select(
      col("event_id"),
      TextFunctions.redact(col("props"),
        Seq(TextFunctions.EmailRe, TextFunctions.UrlRe, TextFunctions.DigitRunRe),
        "<X>").as("clean"),
      TextFunctions.matchCount(col("props"), TextFunctions.DigitRunRe)
        .as("n_digit_runs"))
  }

  /** [[operators.FrequentItems.misraGries]] under the oracle gate: the
    * token stream's top-10 with sketch estimates joined against the
    * exact counts. k=64 exceeds this corpus's vocabulary, so every
    * stage (per-partition updates, shuffle merge of 32 partial
    * sketches, final reduction) must reproduce the EXACT counts —
    * hash-gated; the eviction regime's n/(k+1) bounds are spec-pinned
    * on adversarial streams. The sketch agg itself ships O(k) state
    * per partition: at 100 TB the exchange carries 64 pairs per
    * partition, never the token stream. */
  def freqItems(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val toks = t(spark, sfDir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val sketch = toks
      .agg(operators.FrequentItems.misraGries(64)(col("token")).as("s"))
      .select(explode(col("s")).as("fi"))
      .select(col("fi.item").as("token"), col("fi.est").as("est_n"))
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
      .limit(10)
    top.join(sketch, Seq("token"), "left")
      .select(col("token"), col("exact_n"),
        coalesce(col("est_n"), lit(0L)).as("est_n"))
  }

  /** The END-TO-END pre-training pipeline under ONE hash gate:
    * admission filter (q48's lang/quality/token thresholds) → exact
    * dedup survivors (q16's min-id election) → weighted source mixing
    * (q66's ppm config) → fixed-capacity sequence packing (q59's
    * concat-and-chunk windows). Each stage keeps its own scale shape —
    * conjunctive scan predicates, one content-keyed partial agg + semi
    * join, a per-row hash predicate, a shard-partitioned running sum —
    * so the composition adds NO new exchange beyond its parts. The
    * oracle replays the whole chain in SQL: any drift in any stage
    * (or in how they compose) moves the final pack summary and fails
    * the hash. */
  def pipelineE2E(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val admitted = docs.select(
        col("doc_id"), col("source"), col("text"),
        TextFunctions.langId(col("text")).as("lang_guess"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"))
      .filter(col("lang_guess") === "en" && col("quality") >= 300 &&
        col("bpe_tokens").between(10, 2000))
    val survivors = Dedup.exactSurvivors(admitted, Seq("text"), "doc_id")
    val mixed = operators.Sampling.weightedMix(
      survivors, "doc_id", "source",
      Map("src0" -> 1000000L, "src1" -> 500000L,
        "src2" -> 250000L, "src3" -> 0L),
      defaultPpm = 750000L)
    val sized = mixed.select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    Packing.packSummary(sized, groupCol = "source", orderCol = "doc_id",
      tokensCol = "n_tokens", capacity = 512L)
  }

  /** Text normalization (training-data cleaning): lowercase, strip
    * punctuation runs to single spaces, trim; plus the normalized
    * token count. */
  def normalizeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    t(spark, sfDir, "documents").select(
      col("doc_id"),
      TextFunctions.normalizeText(col("text")).as("norm_text"),
      TextFunctions.tokenCount(TextFunctions.normalizeText(col("text"))).as("norm_tokens"))
  }

  /** Windowed range join: for each click, how many errors the same
    * user hit in the preceding 10 minutes — bucketed equi-join
    * (operators/RangeJoin), never an O(n²) per-key theta join. */
  def rangeClickErrors(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"))
    operators.RangeJoin.rangeCount(clicks, errors, Seq("user_id"),
      "ts", "err_ts", windowMicros = 600L * 1000000L,
      leftId = "event_id", countCol = "n_prior_errors")
  }

  /** Explicit GROUPING SETS — the general grouping-lattice surface
    * (ROLLUP q26 and CUBE q40 are its fixed specializations): per
    * (flag, status), per flag, and grand total in ONE pass — one scan,
    * one expand, one partial-agged shuffle, vs three scans unioned. */
  def groupingSetsAgg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
  }

  /** Grouped exact percentiles (p25/p50/p75 of order quantity per
    * return flag), emitted ×100 as exact integers: quantities are
    * integral and quartile positions interpolate at exact binary
    * fractions, so the result is FP-portable across engines.
    *
    * Scale note: EXACT percentile sorts each group — fine for
    * low-cardinality grouped stats (the shuffle carries (flag, qty)
    * pairs, partial-aggregated); for per-row-scale quantiles at 100 TB
    * the path is `approx_percentile` (t-digest sketch, map-side
    * mergeable), which this query deliberately is not: it is the
    * ground-truth twin an approx rollout is validated against.
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        floor(expr("percentile(l_quantity, 0.25)") * 100).cast("long").as("p25_x100"),
        floor(expr("percentile(l_quantity, 0.5)") * 100).cast("long").as("p50_x100"),
        floor(expr("percentile(l_quantity, 0.75)") * 100).cast("long").as("p75_x100"),
        count(lit(1)).as("cnt"))

  /** Running (cumulative) per-customer order totals + per-order delta —
    * the ordered-window surface (frame-bounded running sum, lag).
    * Integer cents keep the running sum FP-order-proof. Partitioning
    * is by customer (high cardinality), so the window sort distributes;
    * contrast [[stratifiedSampleQ]] for the few-groups-safe shape. */
  def runningTotals(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .withColumn("run_cents",
        sum(col("price_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("delta_cents",
        col("price_cents") - lag(col("price_cents"), 1, 0).over(w))
  }

  /** Sliding TIME-window aggregate (RANGE frame): per user, the sum
    * and count of event value-cents within the trailing hour of each
    * event — the rate/quota/rolling-metric shape. The frame is a
    * `rangeBetween` on integer epoch seconds (not `rowsBetween`:
    * irregular event spacing means N rows ≠ a time horizon), the
    * window partitions by the HIGH-cardinality user key so the sort is
    * per-user-slice and distributes; integer cents keep the fold
    * order irrelevant and the oracle hash-exact. */
  def slidingUserWindow(spark: SparkSession, sfDir: String): DataFrame = {
    // exact integer microseconds: no floor-vs-round drift across
    // engines, and no artificial peer ties from second-truncation
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("epoch_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("hour_cents", sum(col("cents")).over(w))
      .withColumn("hour_events", count(lit(1)).over(w))
  }

  /** [[operators.Profile.profile]] under the oracle gate: per-column
    * row/null/exact-distinct counts over the events table in one scan
    * (Expand-planned multi-distinct). The HLL variant
    * ([[operators.Profile.approxProfile]] — the 100 TB default, no
    * Expand) is spec-gated within its error bound against this exact
    * twin. */
  def profileEvents(spark: SparkSession, sfDir: String): DataFrame =
    operators.Profile.profile(t(spark, sfDir, "events"),
      Seq("event_id", "user_id", "event_type", "value", "props"))

  /** Top-100 word bigrams corpus-wide — co-occurrence head of the
    * vocabulary (n-gram LM / tokenizer-training precursor). Bigrams
    * are built per-row with zip_with over two shifted slices (no
    * self-join), then explode → partial-agg count → total-order top-k. */
  def topBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val tk = TextFunctions.tokens(col("text"))
    val bigrams = when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    t(spark, sfDir, "documents")
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(100)
  }

  /** The composed training-data admission filter: English, quality
    * score ≥ 300, BPE-ish token count in [10, 2000] — the realistic
    * multi-metric document gate, all metrics from single-pass column
    * expressions (one scan, conjunctive predicates). */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        langId(col("text")).as("lang_guess"),
        qualityScore(col("text")).as("quality"),
        bpeTokenCount(col("text")).as("bpe_tokens"))
      .filter(col("lang_guess") === "en" && col("quality") >= 300 &&
        col("bpe_tokens").between(10, 2000))
  }

  /** Near-dup SURVIVORS — the keep/drop decision a pipeline acts on:
    * exact-Jaccard pairs ≥ 0.5 resolved to clusters
    * ([[Dedup.nearDupClusters]]), every non-representative dropped
    * via one left-anti join. Output = the admitted doc ids. */
  def neardupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      shingleN = 3, minJaccardMicro = 500000L)
    Dedup.nearDupSurvivors(docs.select(col("doc_id")), pairs, "doc_id")
  }

  /** Deterministic stratified sample: 200 vectors per label by content
    * hash ([[operators.Sampling.stratifiedSample]]) — balanced
    * class subsampling through the bounded-heap top-k aggregator
    * (map-side partial heaps; NO per-label global sort, which with ~10
    * labels would collapse to ~10 tasks at scale). */
  def stratifiedSampleQ(spark: SparkSession, sfDir: String): DataFrame =
    operators.Sampling.stratifiedSample(
        t(spark, sfDir, "embeddings")
          .select(col("label").cast("long").as("label"), col("vec_id")),
        "label", "vec_id", n = 200)

  /** Per-document top-3 TF-IDF terms — corpus-weighted term importance
    * (operators/Tfidf): tf and df from two partial-agged groupBys, a
    * term-keyed shuffle join, then the bounded-heap [[operators.TopK
    * .topTerms]] per-doc top-k (NO per-doc Window sort). Score is the
    * integer-portable `floor(1e6·tf/df)`; ties by term (binary asc). */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame =
    operators.Tfidf.topTerms(t(spark, sfDir, "documents"), "doc_id", "text", k = 3)

  /** The approx sketches — the actual 100 TB aggregation path — gated
    * against their exact twins: `approx_count_distinct` (HLL++, rsd
    * 0.05) within 3σ = 15% of q32-style exact distincts, and
    * `approx_percentile` (within one quantity unit of q45-style exact
    * medians), emitted as integer pass/fail columns the oracle asserts
    * are 1 (the sketch values themselves are not engine-portable; the
    * bound check is). Both sketches are map-side-mergeable partial
    * aggregates — at scale they replace the exact twins, which must
    * shuffle (distinct) or sort (percentile) the full column.
    *
    * Plan note: the exact `countDistinct` runs in its OWN aggregation,
    * joined back on the 3-row flag key. Mixed into the sketch agg it
    * triggers Catalyst's distinct-rewrite, which re-keys stage one on
    * (flag, suppkey) and then maintains a full percentile buffer (ALL
    * values), a t-digest, and an HLL per distinct-key group — measured
    * 3.4 s vs 1.0 s split at sf0.1, and unboundedly worse at scale. */
  def approxSketchCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val exactDistinct = li
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
    val sketches = li
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_suppkey"), 0.05).as("_acd"),
        floor(expr("percentile(l_quantity, 0.5)") * 100).cast("long").as("p50_x100"),
        floor(expr("approx_percentile(l_quantity, 0.5, 10000)") * 100)
          .cast("long").as("_ap50"))
    sketches.join(exactDistinct, "l_returnflag")
      .select(col("l_returnflag"), col("n_supp"), col("p50_x100"),
        when(abs(col("_acd") - col("n_supp")) * 1000 <= col("n_supp") * 150, 1L)
          .otherwise(0L).as("acd_ok"),
        when(abs(col("_ap50") - col("p50_x100")) <= 100, 1L)
          .otherwise(0L).as("p50_ok"))
  }

  /** [[knnPredict]] through the block-nested query path
    * ([[Knn.knnJoinBlocked]], blocks = 4): the 100 TB shape when the
    * query set exceeds broadcast size — each hash-disjoint query slice
    * broadcasts separately against the streamed item table. Same oracle
    * as q07: the union of per-slice passes must be bit-equal. */
  def knnPredictBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    Knn.classify(
      train = emb.filter(col("vec_id") % 25 =!= 0),
      test = emb.filter(col("vec_id") % 25 === 0),
      k = 5,
      trainId = "vec_id", testId = "vec_id",
      trainVec = "embedding", testVec = "embedding",
      labelCol = "label", blocks = 4)
  }

  /** Repetition-based quality signals (the Gopher-rule family): per-doc
    * duplicate-token fraction and top-bigram mass fraction, plus the
    * composed keep/drop flag (> 0.30 dup tokens or > 0.18 top bigram =
    * repetitive). The bigram stats are a (doc, bigram) partial-agged
    * count folded to per-doc max/sum — the same explode shape as q47,
    * keyed by high-cardinality doc_id so it distributes. */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.distinctTokenCount(col("text")).as("n_distinct"))
    val tk = TextFunctions.tokens(col("text"))
    val bigrams = when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val bg = docs.select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bg"), sum(col("c")).as("n_bg"))
    base.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        floor((col("n_tokens") - col("n_distinct")) * lit(1000000L) / col("n_tokens"))
          .cast("long").as("dup_token_frac_micro"),
        coalesce(floor(col("top_bg") * lit(1000000L) / col("n_bg")), lit(0L))
          .cast("long").as("top_bigram_frac_micro"))
      .withColumn("repetitive",
        when(col("dup_token_frac_micro") > 300000L
          || col("top_bigram_frac_micro") > 180000L, 1L).otherwise(0L))
  }

  /** Benchmark decontamination — the pipeline gate that keeps eval data
    * out of training corpora: every 25th doc stands in for the eval
    * set; a training doc is contaminated when it shares ≥ 1 distinct
    * word-4-gram with it (real pipelines use 8–13-grams for the same
    * selectivity these synthetic docs reach at 4). The eval side is
    * DELIBERATELY broadcast: unlike the corpus-derived relations the
    * dedup paths must never broadcast, an eval set is small by
    * construction (that asymmetry is the whole design — corpus
    * streams, benchmark replicates, exactly like the KNN query side). */
  def decontamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val benchShingles = docs.filter(col("doc_id") % 25 === 0)
      .select(explode(Dedup.shingleSet(col("text"), 4)).as("sh"))
      .distinct()
    val trainShingles = docs.filter(col("doc_id") % 25 =!= 0)
      .select(col("doc_id"), explode(Dedup.shingleSet(col("text"), 4)).as("sh"))
    trainShingles.join(broadcast(benchShingles), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Eval-side contamination REPORT — [[decontamination]]'s complement:
    * q56 answers "which TRAIN docs leak eval content?" (drop them from
    * training); this answers "which EVAL docs are compromised, and how
    * broadly?" (drop or re-source THEM — the integrity audit a
    * benchmark owner runs before trusting a score). Per contaminated
    * eval doc: distinct train docs sharing ≥ 1 word-4-gram and distinct
    * shared 4-grams. Same shingle-hash join as q56 keyed the other way;
    * the train side is corpus-scale so it rides shuffle-hash (never
    * broadcast); the two count-distincts expand only the MATCHED pair
    * relation (bounded by actual leakage, not the corpus). */
  def evalContamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), explode(Dedup.shingleSet(col("text"), 4)).as("s"))
    val train = docs.filter(col("doc_id") % 25 =!= 0)
      .select(col("doc_id").as("tid"), explode(Dedup.shingleSet(col("text"), 4)).as("s"))
    bench.join(train.hint("shuffle_hash"), "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tid")).as("n_train_docs"),
        countDistinct(col("s")).as("n_shared_ngrams"))
  }

  /** [[decontamination]] through the Bloom-runtime-filter scale path
    * ([[Dedup.sharedKeyCountsBloom]]): when the eval suite outgrows
    * broadcast, the shingle join must shuffle — this variant builds a
    * Bloom filter over the bench shingles (one small aggregation, a
    * few MB sketch) and evaluates `might_contain` per corpus shingle
    * BEFORE the exchange, so the shuffle carries only (contaminated +
    * fpp·rest) rows instead of the whole exploded corpus. The exact
    * join then drops Bloom false positives, making the result
    * bit-identical to q56 — they share one oracle. */
  def decontaminationBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val benchShingles = docs.filter(col("doc_id") % 25 === 0)
      .select(explode(Dedup.shingleSet(col("text"), 4)).as("sh"))
      .distinct()
    val trainShingles = docs.filter(col("doc_id") % 25 =!= 0)
      .select(col("doc_id"), explode(Dedup.shingleSet(col("text"), 4)).as("sh"))
    Dedup.sharedKeyCountsBloom(trainShingles, benchShingles,
      idCol = "doc_id", keyCol = "sh", expectedItems = 200000L)
      .select(col("doc_id"), col("n_shared").as("n_shared_ngrams"))
  }

  /** Sequence packing ([[Packing.packSummary]]): assign docs to
    * fixed-512-token pre-training context windows by concat-and-chunk
    * order within each source shard, then summarize each window. One
    * running-sum window partitioned by the shard key — parallelism =
    * shard cardinality, no global sort. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents").select(
      col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    Packing.packSummary(docs, groupCol = "source", orderCol = "doc_id",
      tokensCol = "n_tokens", capacity = 512L)
  }

  /** Packing-efficiency audit — the two numbers a pre-training team
    * tracks about its context-window layout ([[packSequences]]'s
    * concat-and-chunk model): the STRADDLE rate (docs cut by a window
    * boundary — their attention span is damaged; a doc straddles when
    * its last token's window differs from its first's) and the TAIL
    * waste (the one partially-filled final window per shard — concat-
    * and-chunk's only padding). Per source: doc/window/token counts,
    * straddling docs, floor-permille straddle rate, tail waste. Same
    * scale shape as q59 (one per-shard running-sum window, then one
    * partial-agged rollup); integer-exact throughout. Straddle-aware
    * window counting (`max(end_pack)+1`) lives in
    * [[graft.operators.Packing.packAudit]]. */
  def packingEfficiency(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents").select(
      col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    Packing.packAudit(docs, groupCol = "source", orderCol = "doc_id",
      tokensCol = "n_tokens", capacity = 512L)
  }

  /** Semi-structured extraction: parse the `props` JSON column with an
    * explicit schema (`from_json` — codegen'd Jackson parse, no UDF)
    * and aggregate by event type and a derived key bucket. The parse
    * stays inside whole-stage codegen and the aggregate partial-aggs
    * map-side like any other groupBy. */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    ev.select(col("event_type"), col("value"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** Overlapping document chunking — the retrieval/embedding prep step:
    * cut each doc into 512-char windows every 384 chars (128 overlap)
    * with `sequence` + `posexplode` + `substr`, all pure column
    * expressions. Per-row fan-out only (ceil(n_chars/384) chunks), zero
    * shuffle: chunking composes with downstream embedding/dedup without
    * materializing the corpus twice. */
  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    docs
      .select(col("doc_id"),
        posexplode(sequence(lit(1L), greatest(col("n_chars"), lit(1L)), lit(384L)))
          .as(Seq("pos", "chunk_start")),
        col("text"))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("chunk_start"),
        col("text").substr(col("chunk_start"), lit(512)).as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
  }

  /** [[operators.Dedup.chunkDedup]] under the oracle gate: per-doc
    * chunk-dedup summary — total 256-char chunks vs chunks this doc
    * keeps as the global first occurrence. `n_chunks` is derived
    * ARITHMETICALLY from the pruned (doc_id, n_chars) scan — the text
    * column is read once, by the survivor branch only; the per-doc
    * join of the two counts is pinned shuffle-hash (the kept side is
    * corpus-cardinality, broadcasting it would die at scale). */
  def chunkDedupSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val kept = Dedup.chunkDedup(docs, "doc_id", "text", chunkSize = 256)
      .groupBy(col("id")).agg(count(lit(1)).as("n_kept"))
      .select(col("id").as("doc_id"), col("n_kept"))
    val tot = docs.select(col("doc_id"),
      (floor((greatest(col("n_chars"), lit(1L)) - 1) / 256) + 1)
        .cast("long").as("n_chunks"))
    tot.join(kept.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** [[operators.Layout.zValue]] under the oracle gate: the Morton
    * curve value the clustered-write path sorts by, as a ranked
    * projection (top-100 by (z, key) — plans TakeOrderedAndProject,
    * no global sort). Pure integer bit arithmetic → bit-exact in any
    * engine; the layout operator itself ([[operators.Layout.zOrdered]],
    * range exchange + local sort) is plan- and boundary-asserted in
    * LayoutSpec. */
  def zOrderKeys(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        operators.Layout.zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** Fixed-width histogram as integer binning: prices to cents (the
    * q23 rounding discipline), bin = cents ÷ 50000 (500.00-wide bins
    * from origin 0) — pure integer arithmetic end to end, one
    * partial-agged groupBy on the bin id. The declarative twin of an
    * `approx_percentile`-style distribution sketch: at 100 TB this is
    * the one-pass shape dashboards bin with. */
  def priceHistogram(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .select(floor(col("cents") / 50000L).cast("long").as("bin"), col("cents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))

  /** [[operators.Skew.saltedCountSum]] under the oracle gate: two-phase
    * salted aggregation over the 3-hot-key returnflag column must merge
    * to exactly the plain groupBy totals (integer cents, so the fold
    * order is irrelevant and ANY salt assignment hash-matches). */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    operators.Skew.saltedCountSum(
      t(spark, sfDir, "lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents")),
      key = "l_returnflag", salt = 16, value = "cents")

  // ---------------------------------------------------------------------
  // SQL-text surface: spark.sql over registered views + the engine's
  // native functions exposed through GraftExtensions
  // ---------------------------------------------------------------------

  /** Correlated EXISTS / NOT EXISTS in SQL text — the subquery
    * DECORRELATION path: Catalyst's RewritePredicateSubquery must turn
    * both predicates into semi/anti joins (a per-row subquery execution
    * would be O(n²) death at scale; the rewrite is what makes the SQL
    * shape safe to ship). Same SQL runs verbatim in DuckDB. */
  def sqlExists(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT n_nationkey, n_name,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 150000.0)) AS big_spenders,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey)) AS no_orders
         FROM nation n""")
  }

  /** ntile decile ranking: customers cut into 10 balance deciles with
    * per-decile stats. The ORDER BY carries an explicit unique
    * tie-break (cents, custkey) — ntile assigns by position, so a
    * nondeterministic tie order would shuffle boundary rows between
    * deciles on every run (and against the oracle).
    *
    * Scale scoping: position-based ntile NEEDS a global order (one
    * sort task) — a REPORTING shape for small or pre-aggregated
    * relations, exactly as used here. Corpus-scale decile assignment
    * goes value-based instead — implemented as [[valueDeciles]]
    * (q83): percentile boundaries broadcast into a per-row bin
    * projection, which distributes but differs from ntile on ties by
    * design. */
  def balanceDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("cents"), col("c_custkey"))
    t(spark, sfDir, "customer")
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
  }

  /** Calendar rollup: monthly order revenue as INTEGER (year, month)
    * keys — timestamp truncation expressed as integer field extraction
    * so the hash gate never depends on engine timestamp formatting;
    * one partial-agged groupBy. */
  def monthlyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))

  /** Order→ship lag: calendar-day difference between each lineitem's
    * ship date and its order's date, aggregated by order priority —
    * integer day arithmetic (both engines diff on DATE-truncated
    * values), one shuffle join keyed by orderkey + one partial agg. */
  def shipLag(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(col("o_orderkey"),
      col("o_orderpriority"), col("o_orderdate"))
    val l = t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("lag_days")).as("sum_lag_days"),
        min(col("lag_days")).as("min_lag_days"),
        max(col("lag_days")).as("max_lag_days"))
  }

  /** VALUE-based decile binning — the distributed decile path that
    * [[balanceDeciles]]' scaladoc promises: nine DISCRETE percentile
    * boundaries (one tiny aggregate) broadcast into a per-row bin
    * projection, `bin = Σᵢ [cents > bᵢ]`. Discrete (ANSI
    * `percentile_disc`: smallest value with cume_dist ≥ p), not
    * interpolated: each boundary is an actual member of the integer
    * cents domain, so no float interpolation exists whose 1-ULP drift
    * at an integer boundary could flip a floor() between engines —
    * the round-6 advice hardening. No global sort anywhere: the
    * boundary agg partial-aggregates, the binning is a map-only
    * projection, and the final histogram is one partial-agged groupBy.
    * Differs from position-based ntile on ties by design (equal values
    * always share a bin here). */
  def valueDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = t(spark, sfDir, "customer")
      .select(round(col("c_acctbal") * 100).cast("long").as("cents"))
    val bs = (1 to 9).map(i =>
      expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as(s"b$i"))
    val bounds = cents.agg(bs.head, bs.tail: _*)
    val bin = (1 to 9).map(i =>
      when(col("cents") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
    cents.crossJoin(broadcast(bounds))
      .select(col("cents"), bin.cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
  }

  /** Gap-filled densification: nation × month revenue with EMPTY cells
    * materialized as explicit zero rows — the reporting/feature-store
    * shape where "no orders that month" must be a row, not an absence
    * (time-series models and SLA dashboards both break on missing
    * periods). The fact table aggregates FIRST (partial-agged shuffle,
    * the only fact-scale exchange), then densifies against a GENERATED
    * calendar dimension: the month spine comes from `sequence(min,max)`
    * exploded from a 1-row aggregate (never collected to the driver,
    * never a stored table), cross-joined with the nation dim — both
    * sides tiny and broadcast, so the grid costs nothing at any scale.
    * The left-outer fill join probes the aggregated relation, whose
    * cardinality is bounded by the grid itself (≤ nations × months no
    * matter how many fact rows), so broadcasting it is safe at 100 TB. */
  def gapFillMonthly(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("mi"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val c = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"))
    val m = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("nationkey"), col("mi"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
    val months = o.agg(min(col("mi")).as("mn"), max(col("mi")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("mi"))
    val nations = t(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("nationkey"))
    broadcast(nations).crossJoin(broadcast(months))
      .join(broadcast(m), Seq("nationkey", "mi"), "left")
      .select(col("nationkey"), col("mi"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev_cents"), lit(0L)).as("rev_cents"))
  }

  /** First-touch funnel: per user, the first `view` and first `purchase`
    * timestamps and whether the view preceded the purchase — conversion
    * attribution as ONE conditional partial-agged groupBy over the raw
    * event stream (no self-join, no window: `min(CASE WHEN …)` folds
    * each funnel stage into the same aggregate pass, so adding stages
    * adds columns, not scans). Timestamps emit as exact integer epoch
    * microseconds (the q71 portability discipline). */
  def funnelConversion(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts"))))
          .as("first_view_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("first_purchase_us"))
      .select(col("user_id"), col("first_view_us"), col("first_purchase_us"),
        when(col("first_view_us").isNotNull
          && col("first_purchase_us").isNotNull
          && col("first_view_us") < col("first_purchase_us"), 1L)
          .otherwise(0L).as("converted"))

  /** Wide→long melt via native `unpivot`: the four lineitem money/ratio
    * measures become (measure, cents) rows, then one partial-agged
    * groupBy per (flag, measure). Unpivot plans as a map-side `Expand`
    * — each input row emits its 4 long rows in place, so the only
    * exchange is the final aggregation's, and the 4× row inflation
    * never hits the shuffle unreduced (partial aggs absorb it). The
    * portable twin of q35's pivot. */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("extendedprice"),
        round(col("l_discount") * 100).cast("long").as("discount"),
        round(col("l_tax") * 100).cast("long").as("tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "measure", "cents")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  /** Market-basket co-occurrence: for every unordered pair of event
    * types, how many users exhibit both — the association-mining
    * primitive (and, on documents, the tag/domain co-occurrence shape).
    * Distinct (user, type) first — collapsing repeat events BEFORE the
    * pair join is the scale move: fan-out per user is then ≤ T² over
    * the distinct-type count T, not the raw event count² — and the
    * self-join keys on the user id (shuffle-hash, co-partitioned both
    * sides, nothing broadcast). For large item domains the per-user
    * item list gets capped first (the q34 doc-freq-cap pattern). */
  def typeCooccurrence(spark: SparkSession, sfDir: String): DataFrame = {
    val ut = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    // SHUFFLE_HASH pin: both sides are the same corpus-derived relation,
    // so Catalyst's post-agg size estimate would broadcast it at test
    // scale — the q18-class bug at deployment scale
    ut.as("a").join(ut.as("b").hint("shuffle_hash"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** IQR outlier screen: per-group Tukey fences (Q1/Q3 ± 1.5·IQR, all
    * integer arithmetic via `DIV`) computed in one tiny partial-agged
    * percentile pass, broadcast back onto the fact scan, outlier counts
    * in a second partial agg — the standard numeric-cleaning pass
    * before training-data admission. The boundary relation is bounded
    * by the group count (not the row count), so the broadcast is safe
    * at any fact scale; the fences stay exact integers — DISCRETE
    * quartiles (ANSI `percentile_disc`: an actual member of the cents
    * domain, so no interpolated float whose 1-ULP drift could flip a
    * floor() between engines — the round-6 advice hardening) and
    * truncating `DIV` on the non-negative IQR — so the gate hash can't
    * drift on FP. */
  def iqrOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem").select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val bounds = l.groupBy(col("flag")).agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("q1"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("q3"))
      .select(col("flag"),
        expr("q1 - (q3 - q1) * 3 DIV 2").as("lo"),
        expr("q3 + (q3 - q1) * 3 DIV 2").as("hi"))
    l.join(broadcast(bounds), "flag")
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        min(col("lo")).as("lo_cents"),
        max(col("hi")).as("hi_cents"))
  }

  /** [[iqrOutliers]]' APPROX twin under the q53 gate discipline —
    * closing q90's scale note: exact per-group `percentile` holds an
    * OpenHashMap of every distinct value per group (bounded here by
    * the cents domain and 3 groups, unbounded if a caller swaps in a
    * high-cardinality value column), while `approx_percentile`'s
    * t-digest is O(accuracy) state per group forever and map-side
    * mergeable — the quartile path a 100 TB cleaning pass actually
    * runs. The sketch values themselves are not engine-portable, so
    * the query emits the EXACT discrete quartiles (portable) plus
    * integer pass/fail columns asserting each t-digest quartile lands
    * within 1% of the group's IQR of its exact twin — the oracle
    * asserts the flags are 1, making sketch QUALITY (not just plan
    * shape) hash-gated per round, exactly like q53/q77. The band's
    * IQR term is floored at 100 (in the ×100-scaled comparison domain),
    * which allows 1 CENT of absolute drift even when a degenerate group
    * has q1 == q3 — without the floor such a group would demand exact
    * equality and fail the gate on any 1-member t-digest drift
    * (round-7 advice; floor semantics clarified round 9). */
  def iqrApproxCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem").select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val exact = l.groupBy(col("flag")).agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("q1"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("q3"))
    val approx = l.groupBy(col("flag")).agg(
      floor(expr("approx_percentile(cents, 0.25, 10000)")).cast("long").as("_a1"),
      floor(expr("approx_percentile(cents, 0.75, 10000)")).cast("long").as("_a3"))
    approx.join(exact, "flag")
      .select(col("flag"), col("q1"), col("q3"),
        when(abs(col("_a1") - col("q1")) * 100
            <= greatest(col("q3") - col("q1"), lit(100L)), 1L)
          .otherwise(0L).as("ap_q1_ok"),
        when(abs(col("_a3") - col("q3")) * 100
            <= greatest(col("q3") - col("q1"), lit(100L)), 1L)
          .otherwise(0L).as("ap_q3_ok"))
  }

  /** CDC-style latest-record compaction: the newest event per user —
    * with its full payload — as ONE mergeable argmax aggregate:
    * `max(struct(ts_us, event_id, payload…))` orders on the unique
    * (ts_us, event_id) prefix, so the payload rides along and the
    * election is a partial-agged groupBy with map-side combine. No
    * Window (the naive latest-per-key sorts every key's history), no
    * join-back (the usual max-then-rejoin needs a second exchange);
    * state per key is one struct at every stage, which is why this is
    * the shape log-compaction and CDC snapshotting actually use. */
  def latestEvents(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("user_id"), struct(
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents")).as("rec"))
      .groupBy(col("user_id"))
      .agg(max(col("rec")).as("m"))
      .select(col("user_id"), col("m.ts_us").as("ts_us"),
        col("m.event_id").as("event_id"), col("m.event_type").as("event_type"),
        col("m.cents").as("cents"))

  /** Cohort retention matrix: users bucketed by first-activity DAY
    * (the synthetic event stream spans one month, so day is the
    * granularity with signal; epoch-day integers via `datediff` keep
    * the keys engine-portable), counted per days-since-cohort offset —
    * the standard retention triangle. The cohort assignment is one
    * partial-agged min per user; the activity join keys on the user id
    * (shuffle-hash pinned: the cohort relation is one row per user,
    * corpus-derived, so test-scale stats would wrongly broadcast it);
    * the distinct-user count per (cohort, offset) cell plans as
    * Spark's two-phase distinct agg. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events").select(col("user_id"),
      datediff(col("ts"), lit("1970-01-01")).cast("long").as("di"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("di")).as("cohort_day"))
    e.join(cohort.hint("shuffle_hash"), "user_id")
      .groupBy(col("cohort_day"), (col("di") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Association-rule mining over the q89 co-occurrence pairs: support,
    * directional confidence, and lift per unordered type pair, all as
    * exact ppm integers (`(n_ab·1e6) DIV n_a`,
    * `(n_ab·N·1e6) DIV (n_a·n_b)`) so the gate hash is FP-proof. The
    * per-item totals and the 1-row user count are item-domain-bounded
    * — broadcast onto the pair relation costs nothing at any corpus
    * scale; the only corpus-scale work is the distinct + pair join
    * audited at q89. Overflow headroom is a stated choice: ppm on
    * BIGINT keeps `n_ab·N·1e6` under 2⁶³ up to ~3 M users per item
    * pair; beyond that the ratio moves to decimal(38). */
  def associationRules(spark: SparkSession, sfDir: String): DataFrame = {
    val ut = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val pairs = ut.as("a").join(ut.as("b").hint("shuffle_hash"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(totals.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_total"),
        expr("(n_ab * 1000000) DIV n_a").as("conf_a_to_b_ppm"),
        expr("(n_ab * n_total * 1000000) DIV (n_a * n_b)").as("lift_ppm"))
  }

  /** Ratio-to-report / share-of-total: each nation's share of global
    * order revenue as exact ppm integers — computed WITHOUT the naive
    * `sum() OVER ()` (an unpartitioned window collapses the relation
    * to one task at scale). Instead the global total is a second
    * 1-row branch of the same aggregated relation, broadcast into a
    * map-only projection; the group aggregation partial-aggs and the
    * grand total reuses its exchange. */
  def revenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val byNation = joinAgg(spark, sfDir) // n_name, n_orders, total_cents
    val total = byNation.agg(sum(col("total_cents")).as("grand_cents"))
    byNation.crossJoin(broadcast(total))
      .select(col("n_name"), col("n_orders"), col("total_cents"),
        col("grand_cents"),
        expr("(total_cents * 1000000) DIV grand_cents").as("share_ppm"))
  }

  /** Period-over-period delta: each day's event revenue next to the
    * previous day's, as a self-join on the SHIFTED integer day key —
    * the scale-safe `lag`: a global-order window needs a total sort
    * (one partition at the limit), while the shifted-key equi-join of
    * the already-aggregated per-period relation stays hash-partitioned
    * and, being period-domain-bounded, broadcastable. Missing previous
    * days surface as NULL (first day) by the left join, exactly like
    * `lag`'s boundary. */
  def dailyDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val d = t(spark, sfDir, "events")
      .groupBy(datediff(col("ts"), lit("1970-01-01")).cast("long").as("di"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val prev = d.select((col("di") + 1).as("di"), col("cents").as("prev_cents"))
    d.join(broadcast(prev), Seq("di"), "left")
      .select(col("di"), col("cents"), col("prev_cents"),
        (col("cents") - coalesce(col("prev_cents"), lit(0L))).as("delta_cents"))
  }

  /** Rolling 7-day active users per day (the WAU curve) — window-free:
    * Spark (and SQL generally) can't do COUNT(DISTINCT) over a sliding
    * RANGE frame, and buffering per-day user sets in a window would be
    * quadratic anyway. Instead each distinct (user, active-day) row
    * explodes onto the 7 window-end days it contributes to (a
    * broadcast 7-row offset dim), de-dups, and partial-agg-counts per
    * end day — shuffle volume is 7× the distinct activity relation
    * (already collapsed from raw events), not events × window. Window
    * ends past the last observed day are dropped; early partial
    * windows keep standard trailing semantics. */
  def rollingActives(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = t(spark, sfDir, "events").select(col("user_id"),
      datediff(col("ts"), lit("1970-01-01")).cast("long").as("di")).distinct()
    val offsets = spark.range(0, 7).select(col("id").as("off"))
    val maxd = ud.agg(max(col("di")).as("maxd"))
    ud.crossJoin(broadcast(offsets))
      .select(col("user_id"), (col("di") + col("off")).as("wend"))
      .distinct()
      .crossJoin(broadcast(maxd))
      .filter(col("wend") <= col("maxd"))
      .groupBy(col("wend"))
      .agg(count(lit(1)).as("actives_7d"))
  }

  /** Event-type transition matrix: counts of consecutive (from → to)
    * event pairs per user timeline — the Markov-chain / next-action
    * preprocessing op. The ordering window partitions by the
    * high-cardinality user key (each task sorts only its users'
    * short histories — the q46 argument), ties broken by the unique
    * event id; the matrix itself is one partial-agged groupBy bounded
    * by the type domain squared. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Multi-join revenue rollup written as SQL text (parser → Catalyst →
    * same physical plans as the DataFrame API). */
  def sqlJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT n_name, l_returnflag, count(*) AS cnt,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, l_returnflag""")
  }

  /** The native codegen vector functions, called from SQL text via
    * [[GraftExtensions]] (same expressions the Column API plans). */
  def sqlVectorTopK(spark: SparkSession, sfDir: String): DataFrame = {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (
           SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id,
             vector_sqeuclidean(q.embedding, i.embedding) AS dist,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY vector_sqeuclidean(q.embedding, i.embedding), i.vec_id) AS rank
           FROM (SELECT * FROM embeddings WHERE vec_id % 50 = 0) q
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id % 50 <> 0) i)
         WHERE rank <= 3""")
  }

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (scanProject _),
    "q02_filter_pushdown" -> (filterPushdown _),
    "q03_agg_sum" -> (aggSum _),
    "q04_join_broadcast" -> (joinBroadcast _),
    "q05_join_agg" -> (joinAgg _),
    "q06_window_topn" -> (windowTopN _),
    "q07_knn_predict" -> (knnPredict _),
    "q08_knn_accuracy" -> (knnAccuracy _),
    "q12_token_stats" -> (tokenStats _),
    "q13_text_quality" -> (textQuality _),
    "q14_lang_id" -> (langIdQuery _),
    "q15_fingerprint" -> (fingerprintQuery _),
    "q16_dedup_exact" -> (dedupExact _),
    "q17_jaccard_pairs" -> (jaccardPairs _),
    "q18_minhash_lsh" -> (minhashLsh _),
    "q19_simhash_pairs" -> (simhashPairs _),
    "q20_cosine_pairs" -> (cosinePairs _),
    "q21_ann_exact" -> (annExact _),
    "q22_ann_lsh" -> (annLsh _),
    "q23_sort_limit" -> (sortLimit _),
    "q24_set_ops" -> (setOps _),
    "q25_semi_anti" -> (semiAnti _),
    "q26_rollup" -> (rollupAgg _),
    "q27_events_windowed" -> (eventsWindowed _),
    "q28_sql_join_agg" -> (sqlJoinAgg _),
    "q29_sql_vector_topk" -> (sqlVectorTopK _),
    "q30_asof_join" -> (asofClickError _),
    "q31_sessionize" -> (sessionize _),
    "q32_distinct_agg" -> (distinctAgg _),
    "q33_cosine_lsh" -> (cosineLsh _),
    "q34_jaccard_capped" -> (jaccardCapped _),
    "q35_pivot" -> (pivotAgg _),
    "q36_wordcount" -> (wordCount _),
    "q37_det_split" -> (deterministicSplit _),
    "q38_normalize" -> (normalizeDocs _),
    "q39_ann_ivf" -> (annIvf _),
    "q40_cube" -> (cubeAgg _),
    "q41_collect" -> (collectAgg _),
    "q42_range_join" -> (rangeClickErrors _),
    "q43_neardup_clusters" -> (neardupClusters _),
    "q44_ann_recall" -> (annRecall _),
    "q45_percentiles" -> (percentiles _),
    "q46_running_totals" -> (runningTotals _),
    "q47_top_bigrams" -> (topBigrams _),
    "q48_quality_filter" -> (qualityFilter _),
    "q49_neardup_survivors" -> (neardupSurvivors _),
    "q50_stratified_sample" -> (stratifiedSampleQ _),
    "q51_grouping_sets" -> (groupingSetsAgg _),
    "q52_tfidf" -> (tfidfTopTerms _),
    "q53_sketch_check" -> (approxSketchCheck _),
    "q54_knn_blocked" -> (knnPredictBlocked _),
    "q55_repetition" -> (repetitionSignals _),
    "q56_decontam" -> (decontamination _),
    "q57_salted_agg" -> (saltedAgg _),
    "q58_bloom_decontam" -> (decontaminationBloom _),
    "q59_pack_sequences" -> (packSequences _),
    "q60_json_extract" -> (jsonProps _),
    "q61_chunking" -> (chunkDocuments _),
    "q62_quant_ann" -> (quantAnn _),
    "q63_quant_recall" -> (quantRecall _),
    "q64_chunk_dedup" -> (chunkDedupSummary _),
    "q65_zorder" -> (zOrderKeys _),
    "q66_source_mix" -> (sourceMix _),
    "q67_redact" -> (redactEvents _),
    "q68_histogram" -> (priceHistogram _),
    "q69_freq_items" -> (freqItems _),
    "q70_pipeline" -> (pipelineE2E _),
    "q71_sliding_window" -> (slidingUserWindow _),
    "q72_profile" -> (profileEvents _),
    "q73_sql_exists" -> (sqlExists _),
    "q74_ntile" -> (balanceDeciles _),
    "q75_monthly" -> (monthlyRevenue _),
    "q76_ship_lag" -> (shipLag _),
    "q77_minhash_est" -> (minhashEstimate _),
    "q78_mean_pool" -> (meanPoolEmbeddings _),
    "q79_retrieval" -> (retrieval _),
    "q80_substring_dups" -> (substringDups _),
    "q81_corr_sums" -> (corrSums _),
    "q82_series_sim" -> (seriesSimilarity _),
    "q83_value_deciles" -> (valueDeciles _),
    "q84_bag_set_ops" -> (bagSetOps _),
    "q85_incr_dedup" -> (incrementalDedup _),
    "q86_gap_fill" -> (gapFillMonthly _),
    "q87_funnel" -> (funnelConversion _),
    "q88_unpivot" -> (unpivotMeasures _),
    "q89_cooccur" -> (typeCooccurrence _),
    "q90_iqr_outliers" -> (iqrOutliers _),
    "q91_latest_record" -> (latestEvents _),
    "q92_cohort_retention" -> (cohortRetention _),
    "q93_assoc_rules" -> (associationRules _),
    "q94_revenue_share" -> (revenueShare _),
    "q95_daily_delta" -> (dailyDelta _),
    "q96_rolling_actives" -> (rollingActives _),
    "q97_transitions" -> (eventTransitions _),
    "q98_series_lsh_recall" -> (seriesLshRecall _),
    "q99_iqr_approx_check" -> (iqrApproxCheck _),
    "q100_dup_excision" -> (dupExcision _),
    "q101_lang_rebalance" -> (langRebalance _),
    "q102_vocab_coverage" -> (vocabCoverage _),
    "q103_scd_intervals" -> (scdIntervals _),
    "q104_quality_budget" -> (qualityBudget _),
    "q105_token_rarity" -> (tokenRarity _),
    "q106_vocab_drift" -> (vocabDrift _),
    "q107_split_leakage" -> (splitLeakage _),
    "q108_source_diversity" -> (sourceDiversity _),
    "q109_source_divergence" -> (sourceDivergence _),
    "q110_simhash64_pairs" -> (simhash64Pairs _),
    "q111_calibration_buckets" -> (calibrationBuckets _),
    "q112_snapshot_drift" -> (snapshotDrift _),
    "q113_retrieval_capped" -> (retrievalCapped _),
    "q114_weighted_admission" -> (weightedAdmission _),
    "q115_lead_survivors" -> (leadSurvivors _),
    "q116_incr_near_dedup" -> (incrementalNearDedup _),
    "q117_packing_efficiency" -> (packingEfficiency _),
    "q118_cluster_sizes" -> (clusterSizeHistogram _),
    "q119_eval_contamination" -> (evalContamination _),
    "q120_temperature_sampling" -> (temperatureSampling _),
    "q121_capped_lsh" -> (cappedLsh _),
    "q122_lsh_bucket_audit" -> (lshBucketAudit _))

  /** q07's oracle, shared verbatim with q54 (the blocked variant must be
    * bit-equal to the broadcast-whole path). */
  private val knnPredictOracle: String =
    """WITH test AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
         train AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
         scored AS (
           SELECT t.vec_id AS test_id, tr.label, tr.vec_id AS train_id,
             (SELECT sum((x - y) * (x - y)) FROM
               (SELECT unnest(t.embedding)::DOUBLE AS x,
                       unnest(tr.embedding)::DOUBLE AS y)) AS dist
           FROM test t CROSS JOIN train tr),
         knn AS (
           SELECT test_id, label FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY dist ASC, train_id ASC) AS rn
             FROM scored) WHERE rn <= 5),
         votes AS (
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
         SELECT test_id, CAST(label AS BIGINT) AS prediction FROM (
           SELECT test_id, label,
             row_number() OVER (PARTITION BY test_id
               ORDER BY cnt DESC, label ASC) AS vr
           FROM votes) WHERE vr = 1"""

  /** DuckDB-dialect oracle SQL, one per query, same column names/types. */
  /** q56's oracle, shared verbatim with q58: the Bloom-prefiltered
    * shuffle path must be bit-equal to the broadcast path (no false
    * negatives; false positives die in the exact join). */
  private val decontamOracle: String =
    """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-3),
                         i -> array_to_string(toks[i:i+3], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         b AS (SELECT DISTINCT unnest(sh) AS s FROM shh WHERE doc_id % 25 = 0),
         tr AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id % 25 <> 0)
         SELECT doc_id, count(*) AS n_shared_ngrams
         FROM tr JOIN b USING (s)
         GROUP BY doc_id"""

  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q02_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0""",
    "q03_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q04_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "q05_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q06_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 3""",
    "q07_knn_predict" -> knnPredictOracle,
    "q08_knn_accuracy" ->
      """WITH test AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 = 0),
         train AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
         scored AS (
           SELECT t.vec_id AS test_id, tr.label, tr.vec_id AS train_id,
             (SELECT sum((x - y) * (x - y)) FROM
               (SELECT unnest(t.embedding)::DOUBLE AS x,
                       unnest(tr.embedding)::DOUBLE AS y)) AS dist
           FROM test t CROSS JOIN train tr),
         knn AS (
           SELECT test_id, label FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY dist ASC, train_id ASC) AS rn
             FROM scored) WHERE rn <= 5),
         votes AS (
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label),
         preds AS (
           SELECT test_id, label AS prediction FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY cnt DESC, label ASC) AS vr
             FROM votes) WHERE vr = 1)
         SELECT CAST(sum(CASE WHEN p.prediction = t.label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
                count(*) AS total
         FROM preds p JOIN test t ON p.test_id = t.vec_id""",
    "q12_token_stats" ->
      """SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
           length(text) AS n_chars_actual,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
         FROM documents""",
    "q13_text_quality" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt
           FROM tk)
         SELECT doc_id, n_tokens, stop_cnt,
           least(n_tokens, 100) * 5
             + CAST(floor(stop_cnt * 500.0 / n_tokens) AS BIGINT) AS quality
         FROM c""",
    "q14_lang_id" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr
           FROM tk)
         SELECT doc_id,
           CASE
             WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
             WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
             WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
             WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
             ELSE 'fr'
           END AS lang_guess
         FROM c""",
    "q15_fingerprint" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007))),
             (f, h) -> (f * 31 + h) % 1000000007) AS fp
         FROM documents""",
    "q16_dedup_exact" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
         SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM aug GROUP BY text""",
    "q17_jaccard_pairs" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id1, id2,
           CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jac_micro
         FROM common
         WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000""",
    "q18_minhash_lsh" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
           FROM bands a JOIN bands b2
             ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         jac AS (
           SELECT id1, id2,
             CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jac_micro
           FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000)
         SELECT j.id1, j.id2, j.jac_micro
         FROM jac j JOIN cand USING (id1, id2)""",
    "q19_simhash_pairs" ->
      """WITH th AS (
           SELECT doc_id, unnest(list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS h
           FROM documents),
         bitsum AS (
           SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM th, (SELECT unnest(generate_series(0, 31)) AS j)
           GROUP BY doc_id, j),
         simh AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
           FROM bitsum GROUP BY doc_id)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         FROM simh a JOIN simh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""",
    "q20_cosine_pairs" ->
      """WITH v AS (
           SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 5 = 0),
         p AS (
           SELECT a.id AS id1, b.id AS id2, a.e AS ea, b.e AS eb
           FROM v a JOIN v b ON a.id < b.id),
         s AS (
           SELECT id1, id2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS dot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))),
               (x, y) -> x + y) AS na,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(eb)),
                 i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS nb
           FROM p)
         SELECT id1, id2, cos_micro FROM (
           SELECT id1, id2,
             CAST(floor(1000000.0 * (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END)) AS BIGINT) AS cos_micro
           FROM s)
         WHERE cos_micro >= 350000""",
    "q21_ann_exact" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT qid, iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM q CROSS JOIN it))
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q22_ann_lsh" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         qs0 AS (
           SELECT qid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(qe[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM q, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         qs AS (
           SELECT qid, tbl,
             CASE WHEN pb < 0 THEN sig
                  ELSE xor(sig, CAST(1 AS BIGINT) << pb) END AS sig
           FROM qs0, (SELECT unnest(generate_series(-1, 4)) AS pb)),
         its AS (
           SELECT iid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(ie[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM it, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         cand AS (
           SELECT DISTINCT qs.qid, its.iid
           FROM qs JOIN its ON qs.tbl = its.tbl AND qs.sig = its.sig),
         scored AS (
           SELECT c.qid, c.iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT c.qid, c.iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM cand c JOIN q ON c.qid = q.qid JOIN it ON c.iid = it.iid) c)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q23_sort_limit" ->
      """SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q24_set_ops" ->
      """SELECT custkey, 'high' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders
           INTERSECT
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0)
         UNION ALL
         SELECT custkey, 'low_only' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0)""",
    "q25_semi_anti" ->
      """WITH w AS (
           SELECT c_nationkey, count(*) AS n_with_orders FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1),
         wo AS (
           SELECT c_nationkey, count(*) AS n_without_orders FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1)
         SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
           coalesce(n_with_orders, 0) AS n_with_orders,
           coalesce(n_without_orders, 0) AS n_without_orders
         FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey""",
    "q26_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q27_events_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2""",
    "q28_sql_join_agg" ->
      """SELECT n_name, l_returnflag, count(*) AS cnt,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, l_returnflag""",
    "q29_sql_vector_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
         i AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
         scored AS (
           SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(q.embedding)),
                 x -> (CAST(q.embedding[x] AS DOUBLE) - CAST(i.embedding[x] AS DOUBLE))
                    * (CAST(q.embedding[x] AS DOUBLE) - CAST(i.embedding[x] AS DOUBLE)))),
               (a, b) -> a + b) AS dist
           FROM q CROSS JOIN i)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (
           SELECT query_id, neighbor_id, dist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor_id) AS rank
           FROM scored)
         WHERE rank <= 3""",
    "q30_asof_join" ->
      """SELECT l.event_id, l.user_id, coalesce(r.rid, -1) AS matched_err
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT max(event_id) AS rid, user_id AS ruid, ts AS rts
                         FROM events WHERE event_type = 'error'
                         GROUP BY user_id, ts) r
           ON l.user_id = r.ruid AND l.ts >= r.rts""",
    "q31_sessionize" ->
      """WITH s AS (
           SELECT user_id, ts, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         flagged AS (
           SELECT user_id,
             CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 600000000
                  THEN 1 ELSE 0 END AS new_sess,
             ts, event_id
           FROM s),
         sid AS (
           SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged),
         per_sess AS (
           SELECT user_id, sid, count(*) AS sess_events FROM sid GROUP BY 1, 2)
         SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
           CAST(sum(sess_events) AS BIGINT) AS n_events,
           CAST(max(sess_events) AS BIGINT) AS longest_session
         FROM per_sess GROUP BY user_id""",
    "q32_distinct_agg" ->
      """SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q33_cosine_lsh" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
         sigs AS (
           SELECT id, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 11), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(e[d+1] AS DOUBLE) *
                     (CAST((((tbl*12+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM v, (SELECT unnest(generate_series(0, 3)) AS tbl)),
         cand AS (
           SELECT DISTINCT a.id AS id1, b.id AS id2
           FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.id < b.id),
         p AS (
           SELECT c.id1, c.id2, a.e AS ea, b.e AS eb
           FROM cand c JOIN v a ON c.id1 = a.id JOIN v b ON c.id2 = b.id),
         s AS (
           SELECT id1, id2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS dot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))),
               (x, y) -> x + y) AS na,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(eb)),
                 i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS nb
           FROM p)
         SELECT id1, id2, cos_micro FROM (
           SELECT id1, id2,
             CAST(floor(1000000.0 * (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END)) AS BIGINT) AS cos_micro
           FROM s)
         WHERE cos_micro >= 350000""",
    "q34_jaccard_capped" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex0 AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         keep AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= 5),
         kept AS (SELECT doc_id, s FROM ex0 JOIN keep USING (s)),
         n AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
           FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id1, id2,
           CAST(floor(c * 1000000.0 / (na.n + nb.n - c)) AS BIGINT) AS jac_micro
         FROM common
         JOIN n na ON common.id1 = na.doc_id
         JOIN n nb ON common.id2 = nb.doc_id
         WHERE floor(c * 1000000.0 / (na.n + nb.n - c)) >= 500000""",
    "q35_pivot" ->
      """SELECT l_returnflag,
           count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_cnt,
           count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_cnt,
           count(CASE WHEN l_linestatus = 'P' THEN 1 END) AS p_cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q36_wordcount" ->
      """SELECT token, count(*) AS cnt FROM (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents)
         GROUP BY token
         ORDER BY cnt DESC, token ASC
         LIMIT 100""",
    "q37_det_split" ->
      """SELECT doc_id,
           (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 10 AS bucket,
           CASE WHEN (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 10 < 8
                THEN 'train' ELSE 'test' END AS split
         FROM documents""",
    "q38_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text,
           len(regexp_split_to_array(
             trim(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
             '\s+')) AS norm_tokens
         FROM documents""",
    "q39_ann_ivf" ->
      """WITH it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         cb AS (
           SELECT iid AS cid, ie AS ce FROM it
           ORDER BY (((iid % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 1000003, iid
           LIMIT 64),
         assign AS (
           SELECT iid, ie, cid FROM (
             SELECT i.iid, i.ie, c.cid,
               row_number() OVER (PARTITION BY i.iid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(i.ie)),
                     x -> (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM it i CROSS JOIN cb c) WHERE rn <= 2),
         probe AS (
           SELECT qid, qe, cid FROM (
             SELECT q.qid, q.qe, c.cid,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(q.qe)),
                     x -> (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM q CROSS JOIN cb c) WHERE rn <= 16),
         scored AS (
           SELECT p.qid, a.iid,
             min(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(p.qe)),
                 x -> (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE))
                    * (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE)))),
               (a2, b2) -> a2 + b2)) AS dist
           FROM probe p JOIN assign a ON p.cid = a.cid
           GROUP BY p.qid, a.iid)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q40_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q41_collect" ->
      """SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
           count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey""",
    "q42_range_join" ->
      """SELECT l.event_id, count(r.ts) AS n_prior_errors
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         LEFT JOIN (SELECT user_id AS ruid, ts FROM events WHERE event_type = 'error') r
           ON l.user_id = r.ruid
          AND epoch_us(r.ts) >= epoch_us(l.ts) - 600000000
          AND epoch_us(r.ts) <= epoch_us(l.ts)
         GROUP BY l.event_id""",
    "q43_neardup_clusters" ->
      """WITH RECURSIVE tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         pairs AS (
           SELECT id1, id2 FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         edges AS (
           SELECT id1 AS a, id2 AS b FROM pairs
           UNION ALL
           SELECT id2, id1 FROM pairs),
         reach AS (
           SELECT a, b AS r FROM edges
           UNION
           SELECT e.a, t.r FROM edges e JOIN reach t ON e.b = t.a),
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a)
         SELECT d.doc_id,
           CAST(CASE WHEN m.a IS NULL THEN d.doc_id
                     ELSE least(m.mr, d.doc_id) END AS BIGINT) AS cluster_id
         FROM documents d LEFT JOIN mins m ON d.doc_id = m.a""",
    "q44_ann_recall" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0
           ORDER BY (vec_id * 2654435761 + 12345) % 1000003, vec_id
           LIMIT 64),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         e_scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT qid, iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM q CROSS JOIN it)),
         exact AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM e_scored)
           WHERE rn <= 5),
         qs0 AS (
           SELECT qid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(qe[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM q, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         qs AS (
           SELECT qid, tbl,
             CASE WHEN pb < 0 THEN sig
                  ELSE xor(sig, CAST(1 AS BIGINT) << pb) END AS sig
           FROM qs0, (SELECT unnest(generate_series(-1, 4)) AS pb)),
         its AS (
           SELECT iid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(ie[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM it, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         l_cand AS (
           SELECT DISTINCT qs.qid, its.iid
           FROM qs JOIN its ON qs.tbl = its.tbl AND qs.sig = its.sig),
         l_scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT c.qid, c.iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM l_cand c JOIN q ON c.qid = q.qid JOIN it ON c.iid = it.iid)),
         lsh AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM l_scored)
           WHERE rn <= 5),
         cb AS (
           SELECT iid AS cid, ie AS ce FROM it
           ORDER BY (((iid % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 1000003, iid
           LIMIT 64),
         assign AS (
           SELECT iid, ie, cid FROM (
             SELECT i.iid, i.ie, c.cid,
               row_number() OVER (PARTITION BY i.iid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(i.ie)),
                     x -> (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM it i CROSS JOIN cb c) WHERE rn <= 2),
         probe AS (
           SELECT qid, qe, cid FROM (
             SELECT q.qid, q.qe, c.cid,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(q.qe)),
                     x -> (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM q CROSS JOIN cb c) WHERE rn <= 16),
         i_scored AS (
           SELECT p.qid, a.iid,
             min(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(p.qe)),
                 x -> (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE))
                    * (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE)))),
               (a2, b2) -> a2 + b2)) AS dist
           FROM probe p JOIN assign a ON p.cid = a.cid
           GROUP BY p.qid, a.iid),
         ivf AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM i_scored)
           WHERE rn <= 5)
         SELECT method, hits, possible,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM (
           SELECT 'ivf' AS method,
             (SELECT count(*) FROM exact e JOIN ivf a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id) AS hits,
             (SELECT count(*) FROM exact) AS possible
           UNION ALL
           SELECT 'lsh' AS method,
             (SELECT count(*) FROM exact e JOIN lsh a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id) AS hits,
             (SELECT count(*) FROM exact) AS possible)""",
    "q45_percentiles" ->
      """SELECT l_returnflag,
           CAST(floor(quantile_cont(l_quantity, 0.25) * 100) AS BIGINT) AS p25_x100,
           CAST(floor(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_x100,
           CAST(floor(quantile_cont(l_quantity, 0.75) * 100) AS BIGINT) AS p75_x100,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q46_running_totals" ->
      """SELECT o_custkey, o_orderkey, price_cents,
           CAST(sum(price_cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
           CAST(price_cents - coalesce(lag(price_cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey), 0) AS BIGINT) AS delta_cents
         FROM (SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
               FROM orders)""",
    "q47_top_bigrams" ->
      """WITH tk AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         bg AS (
           SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2)
         SELECT bigram, count(*) AS cnt FROM bg
         GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 100""",
    "q48_quality_filter" ->
      """WITH tk AS (
           SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
           FROM tk),
         m AS (
           SELECT doc_id,
             CASE
               WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
               WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
               WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
               WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
               ELSE 'fr'
             END AS lang_guess,
             least(n_tokens, 100) * 5
               + CAST(floor(stop_cnt * 500.0 / n_tokens) AS BIGINT) AS quality,
             bpe_tokens
           FROM c)
         SELECT doc_id, lang_guess, CAST(quality AS BIGINT) AS quality,
           CAST(bpe_tokens AS BIGINT) AS bpe_tokens
         FROM m
         WHERE lang_guess = 'en' AND quality >= 300
           AND bpe_tokens BETWEEN 10 AND 2000""",
    "q49_neardup_survivors" ->
      """WITH RECURSIVE tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         pairs AS (
           SELECT id1, id2 FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         edges AS (
           SELECT id1 AS a, id2 AS b FROM pairs
           UNION ALL
           SELECT id2, id1 FROM pairs),
         reach AS (
           SELECT a, b AS r FROM edges
           UNION
           SELECT e.a, t.r FROM edges e JOIN reach t ON e.b = t.a),
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a)
         SELECT d.doc_id
         FROM documents d LEFT JOIN mins m ON d.doc_id = m.a
         WHERE m.a IS NULL OR m.mr >= d.doc_id""",
    "q50_stratified_sample" ->
      """SELECT CAST(label AS BIGINT) AS label, vec_id, CAST(rn AS BIGINT) AS rn
         FROM (
           SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY
               ((((vec_id % 1000000007 + 1) * 2654435761) % 1000000007)
                 * 2246822519) % 1000000007 % 1000003,
               vec_id) AS rn
           FROM embeddings)
         WHERE rn <= 200""",
    "q51_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
    "q52_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         df AS (
           SELECT term, count(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT doc_id, term, tf, df,
             CAST(floor(tf * 1000000.0 / df) AS BIGINT) AS score_micro
           FROM tf JOIN df USING (term))
         SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df, score_micro
         FROM (
           SELECT doc_id, term, tf, df, score_micro,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_micro DESC, term ASC) AS rn
           FROM sc)
         WHERE rn <= 3""",
    "q53_sketch_check" ->
      """SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(floor(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_x100,
           CAST(1 AS BIGINT) AS acd_ok,
           CAST(1 AS BIGINT) AS p50_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q54_knn_blocked" -> knnPredictOracle,
    "q55_repetition" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         base AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct
           FROM tk),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2),
         bgc AS (
           SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
         bgs AS (
           SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgc GROUP BY doc_id),
         j AS (
           SELECT b.doc_id, b.n_tokens,
             CAST(floor((b.n_tokens - b.n_distinct) * 1000000.0 / b.n_tokens) AS BIGINT)
               AS dup_token_frac_micro,
             CAST(coalesce(floor(s.top_bg * 1000000.0 / s.n_bg), 0) AS BIGINT)
               AS top_bigram_frac_micro
           FROM base b LEFT JOIN bgs s USING (doc_id))
         SELECT doc_id, n_tokens, dup_token_frac_micro, top_bigram_frac_micro,
           CAST(CASE WHEN dup_token_frac_micro > 300000
                       OR top_bigram_frac_micro > 180000
                     THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         FROM j""",
    "q56_decontam" -> decontamOracle,
    "q58_bloom_decontam" -> decontamOracle,
    "q57_salted_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_value
         FROM lineitem GROUP BY l_returnflag""",
    "q59_pack_sequences" ->
      """WITH tk AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         a AS (
           SELECT source, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM tk)
         SELECT source, CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM a GROUP BY source, pack_id""",
    "q60_json_extract" ->
      """SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY event_type, k_bucket""",
    "q61_chunking" ->
      """WITH s AS (
           SELECT doc_id, text,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars, 1) AS BIGINT), CAST(384 AS BIGINT))) AS gs
           FROM documents)
         SELECT doc_id,
           CAST((gs - 1) // 384 AS BIGINT) AS chunk_idx,
           CAST(gs AS BIGINT) AS chunk_start,
           substring(text, CAST(gs AS INT), 512) AS chunk,
           CAST(length(substring(text, CAST(gs AS INT), 512)) AS BIGINT) AS chunk_chars
         FROM s""",
    "q62_quant_ann" ->
      """WITH mxs AS (
           SELECT max(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))))) AS mx
           FROM embeddings),
         q AS (
           SELECT vec_id AS qid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS qa
           FROM embeddings, mxs WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS ia
           FROM embeddings, mxs WHERE vec_id % 10 <> 0),
         scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(qa)),
                 i -> (qa[i] - ia[i]) * (qa[i] - ia[i]))), (a, b) -> a + b) AS qdist
           FROM q CROSS JOIN it)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id, qdist
         FROM (SELECT qid, iid, qdist,
                 row_number() OVER (PARTITION BY qid ORDER BY qdist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q63_quant_recall" ->
      """WITH mxs AS (
           SELECT max(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))))) AS mx
           FROM embeddings),
         q AS (
           SELECT vec_id AS qid, embedding AS qe,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS qa
           FROM embeddings, mxs WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS ia
           FROM embeddings, mxs WHERE vec_id % 10 <> 0),
         e_scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(qe)),
                 i -> (CAST(qe[i] AS DOUBLE) - CAST(ie[i] AS DOUBLE)) *
                      (CAST(qe[i] AS DOUBLE) - CAST(ie[i] AS DOUBLE)))),
               (x, y) -> x + y) AS dist
           FROM q CROSS JOIN it),
         exact AS (
           SELECT qid, iid FROM (
             SELECT qid, iid,
               row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
             FROM e_scored) WHERE rn <= 5),
         q_scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(qa)),
                 i -> (qa[i] - ia[i]) * (qa[i] - ia[i]))), (a, b) -> a + b) AS qdist
           FROM q CROSS JOIN it),
         quant AS (
           SELECT qid, iid FROM (
             SELECT qid, iid,
               row_number() OVER (PARTITION BY qid ORDER BY qdist, iid) AS rn
             FROM q_scored) WHERE rn <= 5),
         hitrow AS (
           SELECT count(*) AS hits FROM exact e JOIN quant a USING (qid, iid)),
         tot AS (SELECT count(*) AS possible FROM exact)
         SELECT 'int8' AS method, hits, possible,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM hitrow, tot""",
    "q64_chunk_dedup" ->
      """WITH c AS (
           SELECT doc_id,
             CAST((gs - 1) // 256 AS BIGINT) AS chunk_idx,
             substring(text, CAST(gs AS INT), 256) AS chunk
           FROM (
             SELECT doc_id, text,
               unnest(generate_series(CAST(1 AS BIGINT),
                 CAST(greatest(n_chars, 1) AS BIGINT), CAST(256 AS BIGINT))) AS gs
             FROM documents)),
         f AS (
           SELECT chunk, min({'d': doc_id, 'c': chunk_idx}) AS m
           FROM c GROUP BY chunk),
         k AS (
           SELECT CAST(m.d AS BIGINT) AS doc_id,
             count(*) AS n_kept
           FROM f GROUP BY 1)
         SELECT d.doc_id,
           CAST((greatest(n_chars, 1) - 1) // 256 + 1 AS BIGINT) AS n_chunks,
           COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
         FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id""",
    "q65_zorder" ->
      """WITH base AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_partkey & 65535 AS a, l_suppkey & 65535 AS b
           FROM lineitem),
         s1 AS (SELECT l_orderkey, l_linenumber,
                  (a | (a << 8)) & 16711935 AS a1,
                  (b | (b << 8)) & 16711935 AS b1 FROM base),
         s2 AS (SELECT l_orderkey, l_linenumber,
                  (a1 | (a1 << 4)) & 252645135 AS a2,
                  (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
         s3 AS (SELECT l_orderkey, l_linenumber,
                  (a2 | (a2 << 2)) & 858993459 AS a3,
                  (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
         s4 AS (SELECT l_orderkey, l_linenumber,
                  (a3 | (a3 << 1)) & 1431655765 AS a4,
                  (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
         SELECT l_orderkey, l_linenumber, a4 | (b4 << 1) AS zval
         FROM s4
         ORDER BY zval, l_orderkey, l_linenumber
         LIMIT 100""",
    "q66_source_mix" ->
      """SELECT source, count(*) AS n_total,
           CAST(sum(CASE WHEN
             (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(floor(CAST(sum(CASE WHEN
             (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)
             THEN 1 ELSE 0 END) AS BIGINT) * 1000000.0 / count(*)) AS BIGINT)
             AS kept_ppm
         FROM documents GROUP BY source""",
    "q67_redact" ->
      """SELECT event_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(props,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<X>', 'g'),
               'https?://[^\s]+', '<X>', 'g'),
             '[0-9]+', '<X>', 'g') AS clean,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_digit_runs
         FROM events""",
    "q68_histogram" ->
      """WITH c AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
         SELECT CAST(cents // 50000 AS BIGINT) AS bin,
           count(*) AS n,
           min(cents) AS min_cents,
           max(cents) AS max_cents
         FROM c GROUP BY 1""",
    "q69_freq_items" ->
      """WITH t AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents),
         e AS (SELECT token, count(*) AS exact_n FROM t GROUP BY token)
         SELECT token, exact_n, exact_n AS est_n
         FROM e ORDER BY exact_n DESC, token LIMIT 10""",
    "q70_pipeline" ->
      """WITH tk AS (
           SELECT doc_id, source, text,
             regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, source, text, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
           FROM tk),
         adm AS (
           SELECT doc_id, source, text, n_tokens FROM (
             SELECT doc_id, source, text, n_tokens,
               CASE
                 WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                 WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
                 WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
                 WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
                 ELSE 'fr'
               END AS lang_guess,
               least(n_tokens, 100) * 5
                 + CAST(floor(stop_cnt * 500.0 / n_tokens) AS BIGINT) AS quality,
               bpe_tokens
             FROM c)
           WHERE lang_guess = 'en' AND quality >= 300
             AND bpe_tokens BETWEEN 10 AND 2000),
         surv AS (
           SELECT a.doc_id, a.source, a.n_tokens
           FROM adm a
           JOIN (SELECT text, min(doc_id) AS keep_id FROM adm GROUP BY text) g
             ON a.doc_id = g.keep_id),
         mixed AS (
           SELECT doc_id, source, n_tokens FROM surv
           WHERE (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)),
         a AS (
           SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM mixed)
         SELECT source, CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM a GROUP BY source, pack_id""",
    "q71_sliding_window" ->
      """WITH e AS (
           SELECT event_id, user_id,
             epoch_us(ts) AS epoch_us,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
         SELECT event_id, user_id, epoch_us, cents,
           CAST(sum(cents) OVER w AS BIGINT) AS hour_cents,
           CAST(count(*) OVER w AS BIGINT) AS hour_events
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "q72_profile" ->
      """SELECT 'event_id' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
         UNION ALL
         SELECT 'user_id', count(*),
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         UNION ALL
         SELECT 'event_type', count(*),
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT) FROM events
         UNION ALL
         SELECT 'value', count(*),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT) FROM events
         UNION ALL
         SELECT 'props', count(*),
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT props) AS BIGINT) FROM events""",
    "q73_sql_exists" ->
      """SELECT n_nationkey, n_name,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 150000.0)) AS big_spenders,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey)) AS no_orders
         FROM nation n""",
    "q74_ntile" ->
      """WITH c AS (
           SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         d AS (
           SELECT cents,
             CAST(ntile(10) OVER (ORDER BY cents, c_custkey) AS BIGINT) AS decile
           FROM c)
         SELECT decile, count(*) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
         FROM d GROUP BY decile""",
    "q75_monthly" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
         FROM orders GROUP BY 1, 2""",
    "q76_ship_lag" ->
      """WITH j AS (
           SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS lag_days
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
         SELECT o_orderpriority, count(*) AS n,
           CAST(sum(lag_days) AS BIGINT) AS sum_lag_days,
           CAST(min(lag_days) AS BIGINT) AS min_lag_days,
           CAST(max(lag_days) AS BIGINT) AS max_lag_days
         FROM j GROUP BY o_orderpriority""",
    "q77_minhash_est" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         pairs AS (
           SELECT id1, id2,
             CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS exact_micro
           FROM (
             SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb,
               count(*) AS c
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh)
         SELECT p.id1, p.id2, p.exact_micro,
           CAST(floor(len(list_filter(generate_series(1, 24),
             i -> s1.sig[i] = s2.sig[i])) * 1000000.0 / 24) AS BIGINT) AS est_micro
         FROM pairs p
         JOIN sig s1 ON p.id1 = s1.doc_id
         JOIN sig s2 ON p.id2 = s2.doc_id""",
    "q78_mean_pool" ->
      """WITH s AS (
           SELECT label, embedding,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(len(embedding) AS BIGINT), CAST(1 AS BIGINT))) AS i
           FROM embeddings),
         m AS (
           SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
             CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0)
               AS BIGINT) AS micro
           FROM s)
         SELECT label, pos, count(*) AS n,
           CAST(sum(micro) AS BIGINT) AS sum_micro,
           CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_micro
         FROM m GROUP BY label, pos""",
    "q79_retrieval" ->
      """WITH ct AS (
           SELECT doc_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
           FROM documents WHERE doc_id % 25 <> 0),
         dfreq AS (SELECT tok, count(*) AS df FROM ct GROUP BY tok),
         qt AS (
           SELECT doc_id AS query_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
           FROM documents WHERE doc_id % 25 = 0),
         sc AS (
           SELECT q.query_id, c.doc_id,
             CAST(sum(1000000 // d.df) AS BIGINT) AS score
           FROM qt q
           JOIN ct c ON q.tok = c.tok
           JOIN dfreq d ON c.tok = d.tok
           GROUP BY 1, 2)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score FROM (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rn
           FROM sc) WHERE rn <= 3""",
    "q80_substring_dups" ->
      """WITH w AS (
           SELECT doc_id, text,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars - 63, 1) AS BIGINT), CAST(32 AS BIGINT))) AS gs
           FROM documents),
         fp AS (
           SELECT DISTINCT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substring(text, CAST(gs AS INT), 64), ''),
                 c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007) AS fp
           FROM w)
         SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared_windows
         FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    "q81_corr_sums" ->
      """WITH m AS (
           SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
           FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
         FROM m GROUP BY l_returnflag""",
    "q82_series_sim" ->
      """WITH r AS (
           SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, CAST((rn - 1) // 4 AS BIGINT) AS seg,
             CAST(sum(cents) AS BIGINT) AS seg_sum
           FROM r WHERE rn <= 16 GROUP BY 1, 2),
         fullk AS (
           SELECT user_id FROM (
             SELECT user_id, count(*) AS n FROM r WHERE rn <= 16 GROUP BY 1)
           WHERE n = 16),
         pf AS (SELECT p.* FROM p JOIN fullk USING (user_id)),
         d AS (
           SELECT a.user_id AS ka, b.user_id AS kb,
             CAST(sum((a.seg_sum - b.seg_sum) * (a.seg_sum - b.seg_sum))
               AS BIGINT) AS dist
           FROM pf a JOIN pf b ON a.seg = b.seg AND a.user_id <> b.user_id
           GROUP BY 1, 2)
         SELECT ka AS user_id, CAST(rn2 AS BIGINT) AS rank, kb AS other, dist
         FROM (
           SELECT ka, kb, dist,
             row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
           FROM d)
         WHERE rn2 <= 3""",
    "q83_value_deciles" ->
      """WITH c AS (
           SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
         b AS (
           SELECT
             CAST(quantile_disc(cents, 0.1) AS BIGINT) AS b1,
             CAST(quantile_disc(cents, 0.2) AS BIGINT) AS b2,
             CAST(quantile_disc(cents, 0.3) AS BIGINT) AS b3,
             CAST(quantile_disc(cents, 0.4) AS BIGINT) AS b4,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS b5,
             CAST(quantile_disc(cents, 0.6) AS BIGINT) AS b6,
             CAST(quantile_disc(cents, 0.7) AS BIGINT) AS b7,
             CAST(quantile_disc(cents, 0.8) AS BIGINT) AS b8,
             CAST(quantile_disc(cents, 0.9) AS BIGINT) AS b9
           FROM c),
         x AS (
           SELECT cents,
             (CASE WHEN cents > b1 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b2 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b3 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b4 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b5 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b6 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b7 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b8 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b9 THEN 1 ELSE 0 END) AS bin
           FROM c, b)
         SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
         FROM x GROUP BY 1""",
    "q84_bag_set_ops" ->
      """WITH a AS (SELECT o_custkey AS custkey FROM orders),
         h AS (SELECT o_custkey AS custkey FROM orders
               WHERE o_totalprice > 200000.0),
         ea AS (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM h),
         ia AS (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM h)
         SELECT 'except_all' AS tag, custkey, count(*) AS n
         FROM ea GROUP BY custkey
         UNION ALL
         SELECT 'intersect_all', custkey, count(*) FROM ia GROUP BY custkey""",
    "q85_incr_dedup" ->
      """WITH inc AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         ex AS (SELECT text FROM documents WHERE doc_id % 5 <> 0),
         surv AS (
           SELECT i.* FROM inc i
           JOIN (SELECT text, min(doc_id) AS keep_id FROM inc GROUP BY text) g
             ON i.doc_id = g.keep_id)
         SELECT s.doc_id, s.source, s.n_chars
         FROM surv s
         WHERE NOT EXISTS (SELECT 1 FROM ex e WHERE e.text = s.text)""",
    "q86_gap_fill" ->
      """WITH RECURSIVE o AS (
           SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         m AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey, mi,
             count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS rev_cents
           FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         months(mi) AS (
           SELECT (SELECT min(mi) FROM o)
           UNION ALL
           SELECT mi + 1 FROM months WHERE mi < (SELECT max(mi) FROM o)),
         grid AS (SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
                    CAST(mi AS BIGINT) AS mi
                  FROM nation, months)
         SELECT g.nationkey, g.mi,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.rev_cents, 0) AS rev_cents
         FROM grid g LEFT JOIN m ON g.nationkey = m.nationkey AND g.mi = m.mi""",
    "q87_funnel" ->
      """WITH f AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_purchase_us
           FROM events GROUP BY user_id)
         SELECT user_id, first_view_us, first_purchase_us,
           CAST(CASE WHEN first_view_us IS NOT NULL
                  AND first_purchase_us IS NOT NULL
                  AND first_view_us < first_purchase_us
                THEN 1 ELSE 0 END AS BIGINT) AS converted
         FROM f""",
    "q88_unpivot" ->
      """WITH l AS (
           SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS quantity,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS extendedprice,
             CAST(round(l_discount * 100) AS BIGINT) AS discount,
             CAST(round(l_tax * 100) AS BIGINT) AS tax
           FROM lineitem),
         u AS (
           SELECT l_returnflag, 'quantity' AS measure, quantity AS cents FROM l
           UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM l
           UNION ALL SELECT l_returnflag, 'discount', discount FROM l
           UNION ALL SELECT l_returnflag, 'tax', tax FROM l)
         SELECT l_returnflag, measure, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM u GROUP BY 1, 2""",
    "q89_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2""",
    "q90_iqr_outliers" ->
      """WITH l AS (
           SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
         b AS (
           SELECT flag,
             CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
             CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3
           FROM l GROUP BY flag),
         f AS (
           SELECT flag, q1 - (q3 - q1) * 3 // 2 AS lo,
             q3 + (q3 - q1) * 3 // 2 AS hi
           FROM b)
         SELECT l.flag, count(*) AS n,
           CAST(sum(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           min(lo) AS lo_cents, max(hi) AS hi_cents
         FROM l JOIN f ON l.flag = f.flag
         GROUP BY l.flag""",
    "q91_latest_record" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn = 1""",
    "q92_cohort_retention" ->
      """WITH e AS (
           SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di
           FROM events),
         c AS (SELECT user_id, min(di) AS cohort_day FROM e GROUP BY user_id)
         SELECT c.cohort_day, e.di - c.cohort_day AS offset_days,
           count(DISTINCT e.user_id) AS n_users
         FROM e JOIN c ON e.user_id = c.user_id
         GROUP BY 1, 2""",
    "q93_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
         nu AS (SELECT count(DISTINCT user_id) AS n_total FROM ut),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_ab
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, n_ab, ta.n AS n_a, tb.n AS n_b, n_total,
           (n_ab * 1000000) // ta.n AS conf_a_to_b_ppm,
           (n_ab * n_total * 1000000) // (ta.n * tb.n) AS lift_ppm
         FROM p
         JOIN tot ta ON p.type_a = ta.event_type
         JOIN tot tb ON p.type_b = tb.event_type
         CROSS JOIN nu""",
    "q94_revenue_share" ->
      """WITH bn AS (
           SELECT n_name, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name),
         g AS (SELECT CAST(sum(total_cents) AS BIGINT) AS grand_cents FROM bn)
         SELECT n_name, n_orders, total_cents, grand_cents,
           (total_cents * 1000000) // grand_cents AS share_ppm
         FROM bn CROSS JOIN g""",
    "q95_daily_delta" ->
      """WITH d AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1)
         SELECT d.di, d.cents, p.cents AS prev_cents,
           d.cents - COALESCE(p.cents, 0) AS delta_cents
         FROM d LEFT JOIN d p ON d.di = p.di + 1""",
    "q96_rolling_actives" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di
           FROM events),
         o AS (SELECT CAST(gs AS BIGINT) AS off
               FROM generate_series(0, 6) AS t(gs)),
         w AS (SELECT DISTINCT user_id, di + off AS wend
               FROM ud CROSS JOIN o),
         mx AS (SELECT max(di) AS maxd FROM ud)
         SELECT wend, count(*) AS actives_7d
         FROM w CROSS JOIN mx
         WHERE wend <= maxd
         GROUP BY wend""",
    "q97_transitions" ->
      """WITH s AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
         FROM s WHERE next_type IS NOT NULL
         GROUP BY 1, 2""",
    "q98_series_lsh_recall" ->
      """WITH r AS (
           SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, CAST((rn - 1) // 4 AS BIGINT) AS seg,
             CAST(sum(cents) AS BIGINT) AS seg_sum
           FROM r WHERE rn <= 16 GROUP BY 1, 2),
         fullk AS (
           SELECT user_id FROM (
             SELECT user_id, count(*) AS n FROM r WHERE rn <= 16 GROUP BY 1)
           WHERE n = 16),
         pf AS (SELECT p.* FROM p JOIN fullk USING (user_id)),
         v AS (SELECT user_id, list(seg_sum ORDER BY seg) AS vec
               FROM pf GROUP BY 1),
         sk AS (
           SELECT user_id FROM fullk
           ORDER BY (user_id * 2654435761 + 12345) % 1000003, user_id
           LIMIT 64),
         dx AS (
           SELECT a.user_id AS ka, b.user_id AS kb,
             CAST(sum((a.seg_sum - b.seg_sum) * (a.seg_sum - b.seg_sum))
               AS BIGINT) AS dist
           FROM pf a JOIN sk ON a.user_id = sk.user_id
           JOIN pf b ON a.seg = b.seg AND a.user_id <> b.user_id
           GROUP BY 1, 2),
         ex AS (
           SELECT ka, kb FROM (
             SELECT ka, kb,
               row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
             FROM dx)
           WHERE rn2 <= 3),
         cells AS (
           SELECT user_id, tbl,
             list_transform(generate_series(0, 3), p ->
               CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(0, 3), d ->
                   CAST(vec[d+1] AS DOUBLE) *
                   (CAST((((tbl*4+p)*6700417 + d + 1) * 2654435761)
                     % 1000000007 AS DOUBLE) / 1000000007.0 - 0.5))),
                 (x,y) -> x+y) / 6000.0) AS BIGINT)) AS f
           FROM v, (SELECT unnest(generate_series(0, 7)) AS tbl)),
         ctr AS (
           SELECT user_id, tbl, array_to_string(f, ',') AS sig FROM cells),
         spine(ax, dl) AS (
           VALUES (0,-1),(0,1),(1,-1),(1,1),(2,-1),(2,1),(3,-1),(3,1)),
         pr AS (
           SELECT user_id, tbl, sig FROM ctr
           UNION ALL
           SELECT user_id, tbl,
             array_to_string(list_transform(generate_series(0, 3), i ->
               CASE WHEN i = ax THEN f[i+1] + dl ELSE f[i+1] END), ',') AS sig
           FROM cells, spine),
         cand AS (
           SELECT DISTINCT a.user_id AS ka, b.user_id AS kb
           FROM pr a JOIN ctr b
           ON a.tbl = b.tbl AND a.sig = b.sig AND a.user_id <> b.user_id),
         dcand AS (
           SELECT c.ka, c.kb,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 4), i ->
                 (va.vec[i] - vb.vec[i]) * (va.vec[i] - vb.vec[i]))),
               (x,y) -> x+y) AS BIGINT) AS dist
           FROM cand c
           JOIN v va ON c.ka = va.user_id
           JOIN v vb ON c.kb = vb.user_id),
         lsh AS (
           SELECT ka, kb FROM (
             SELECT ka, kb,
               row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
             FROM dcand)
           WHERE rn2 <= 3),
         h AS (SELECT count(*) AS hits
               FROM ex JOIN lsh ON ex.ka = lsh.ka AND ex.kb = lsh.kb),
         t_ AS (SELECT count(*) AS possible FROM ex),
         nc AS (SELECT count(*) AS n_candidates FROM cand)
         SELECT 'paa_lsh' AS method, hits, possible, n_candidates,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM h, t_, nc""",
    "q99_iqr_approx_check" ->
      """WITH l AS (
           SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
         SELECT flag,
           CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
           CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3,
           CAST(1 AS BIGINT) AS ap_q1_ok,
           CAST(1 AS BIGINT) AS ap_q3_ok
         FROM l GROUP BY flag""",
    "q100_dup_excision" ->
      """WITH w AS (
           SELECT doc_id, text, n_chars,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars - 63, 1) AS BIGINT),
               CAST(32 AS BIGINT))) AS s
           FROM documents),
         fp AS (
           SELECT doc_id, s,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substring(text, CAST(s AS INT), 64), ''),
                 c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007) AS fp
           FROM w),
         own AS (SELECT fp, min(doc_id) AS owner FROM fp GROUP BY 1),
         dup AS (
           SELECT DISTINCT f.doc_id, f.s
           FROM fp f JOIN own o ON f.fp = o.fp
           WHERE o.owner < f.doc_id),
         isl AS (
           SELECT doc_id, s,
             CASE WHEN s > coalesce(lag(s) OVER (PARTITION BY doc_id ORDER BY s),
               CAST(-100 AS BIGINT)) + 63 THEN 1 ELSE 0 END AS brk
           FROM dup),
         grp AS (
           SELECT doc_id, s,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS g
           FROM isl),
         merged AS (
           SELECT doc_id, min(s) AS lo, max(s) + 63 AS hi
           FROM grp GROUP BY doc_id, g),
         segs AS (
           SELECT doc_id,
             coalesce(lag(hi) OVER (PARTITION BY doc_id ORDER BY lo),
               CAST(0 AS BIGINT)) + 1 AS klo,
             lo - 1 AS khi
           FROM merged
           UNION ALL
           SELECT doc_id, max(hi) + 1 AS klo, CAST(NULL AS BIGINT) AS khi
           FROM merged GROUP BY doc_id),
         kept AS (
           SELECT sg.doc_id,
             string_agg(
               CASE
                 WHEN sg.khi IS NULL THEN
                   CASE WHEN sg.klo <= d.n_chars
                     THEN substring(d.text, CAST(sg.klo AS INT),
                       CAST(d.n_chars - sg.klo + 1 AS INT))
                     ELSE '' END
                 WHEN sg.khi >= sg.klo THEN
                   substring(d.text, CAST(sg.klo AS INT),
                     CAST(sg.khi - sg.klo + 1 AS INT))
                 ELSE '' END, '' ORDER BY sg.klo) AS kept_text
           FROM segs sg JOIN documents d USING (doc_id)
           GROUP BY sg.doc_id),
         res AS (
           SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS orig_chars,
             coalesce(k.kept_text, d.text) AS kt
           FROM documents d LEFT JOIN kept k USING (doc_id))
         SELECT doc_id, orig_chars,
           CAST(length(kt) AS BIGINT) AS kept_chars,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(kt, ''),
               c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 131 + c) % 1000000007) AS kept_fp
         FROM res""",
    "q101_lang_rebalance" ->
      """WITH stats AS (
           SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
         m AS (SELECT min(n_total) AS m FROM stats),
         ratios AS (
           SELECT lang, CAST(n_total AS BIGINT) AS n_total,
             CAST((m * 1000000) // n_total AS BIGINT) AS keep_ppm
           FROM stats, m),
         kept AS (
           SELECT d.lang, count(*) AS n_kept
           FROM documents d JOIN ratios r ON d.lang = r.lang
           WHERE (((d.doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
                 * 2246822519 % 1000000007 % 1000000 < r.keep_ppm
           GROUP BY 1)
         SELECT r.lang, r.n_total, r.keep_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
         FROM ratios r LEFT JOIN kept k ON r.lang = k.lang""",
    "q102_vocab_coverage" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         cnt AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
         vocab AS (SELECT tok FROM cnt ORDER BY n DESC, tok ASC LIMIT 10),
         per_doc AS (
           SELECT t.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
           FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
           GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(floor(n_oov * 1000000.0 / n_tokens) AS BIGINT) AS oov_ppm
         FROM per_doc""",
    "q103_scd_intervals" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, ts_us, event_id, event_type FROM e
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type,
           CAST(ts_us AS BIGINT) AS valid_from_us,
           CAST(lead(ts_us) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) AS BIGINT) AS valid_to_us
         FROM ch""",
    "q104_quality_budget" ->
      """WITH sc AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         thr AS (
           SELECT lang, CAST(quantile_disc(quality, 0.75) AS BIGINT) AS thr
           FROM sc GROUP BY 1)
         SELECT s.lang, t.thr, count(*) AS n_kept,
           CAST(sum(s.n_tokens) AS BIGINT) AS tokens_kept
         FROM sc s JOIN thr t ON s.lang = t.lang
         WHERE s.quality >= t.thr
         GROUP BY 1, 2""",
    "q105_token_rarity" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         n AS (SELECT count(*) AS n_docs FROM documents),
         df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         idf AS (
           SELECT tok, CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf
           FROM df, n)
         SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(i.idf) AS BIGINT) AS sum_idf,
           CAST(floor(sum(i.idf) * 1000.0 / count(*)) AS BIGINT) AS rarity_milli
         FROM tok t JOIN idf i ON t.tok = i.tok
         GROUP BY 1""",
    "q106_vocab_drift" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, doc_id % 5 = 0 AS b,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         totals AS (
           SELECT CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_old
           FROM documents),
         df AS (
           SELECT tok,
             CAST(count(CASE WHEN NOT b THEN 1 END) AS BIGINT) AS df_old,
             CAST(count(CASE WHEN b THEN 1 END) AS BIGINT) AS df_new
           FROM tok GROUP BY 1)
         SELECT tok, df_old, df_new,
           CAST(floor(df_old * 1000000.0 / n_old) AS BIGINT) AS rate_old_ppm,
           CAST(floor(df_new * 1000000.0 / n_new) AS BIGINT) AS rate_new_ppm,
           CAST(floor(df_new * 1000000.0 / n_new)
             - floor(df_old * 1000000.0 / n_old) AS BIGINT) AS delta_ppm,
           CAST(CASE WHEN df_old = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_new_token
         FROM df, totals""",
    "q107_split_leakage" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         pairs AS (
           SELECT id1, id2 FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         tagged AS (
           SELECT
             CASE WHEN (((id1 % 1000000007 + 1) * 2654435761) % 1000000007)
                       * 2246822519 % 1000000007 % 10 < 8
                  THEN 'train' ELSE 'test' END AS t1,
             CASE WHEN (((id2 % 1000000007 + 1) * 2654435761) % 1000000007)
                       * 2246822519 % 1000000007 % 10 < 8
                  THEN 'train' ELSE 'test' END AS t2
           FROM pairs)
         SELECT least(t1, t2) AS split_a, greatest(t1, t2) AS split_b,
           count(*) AS n_pairs,
           CAST(CASE WHEN least(t1, t2) <> greatest(t1, t2) THEN 1 ELSE 0 END
             AS BIGINT) AS is_leak
         FROM tagged GROUP BY 1, 2""",
    "q108_source_diversity" ->
      """WITH tk AS (
           SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         tg AS (
           SELECT source, unnest(list_transform(generate_series(1, len(toks)-2),
             i -> array_to_string(toks[i:i+2], ' '))) AS tg
           FROM tk WHERE len(toks) >= 3),
         cnt AS (SELECT source, tg, count(*) AS occ FROM tg GROUP BY 1, 2),
         agg AS (
           SELECT source, CAST(sum(occ) AS BIGINT) AS n_trigrams,
             CAST(count(*) AS BIGINT) AS n_distinct
           FROM cnt GROUP BY 1)
         SELECT source, n_trigrams, n_distinct,
           CAST(floor(n_distinct * 1000000.0 / n_trigrams) AS BIGINT)
             AS diversity_ppm,
           CAST(CASE WHEN floor(n_distinct * 1000000.0 / n_trigrams) < 450000
             THEN 1 ELSE 0 END AS BIGINT) AS is_template
         FROM agg""",
    "q109_source_divergence" ->
      """WITH tok AS (
           SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS obs
           FROM tok GROUP BY 1, 2),
         corpus AS (SELECT tok, CAST(sum(obs) AS BIGINT) AS c_t FROM st GROUP BY 1),
         totals AS (SELECT source, CAST(sum(obs) AS BIGINT) AS s_total
           FROM st GROUP BY 1),
         grand AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_total FROM corpus),
         j AS (
           SELECT s.source, t.s_total, g.t_total,
             sum(abs(CAST(s.obs AS HUGEINT) * CAST(g.t_total AS HUGEINT)
               - CAST(c.c_t AS HUGEINT) * CAST(t.s_total AS HUGEINT))) AS present_num,
             sum(CAST(c.c_t AS HUGEINT) * CAST(t.s_total AS HUGEINT)) AS present_ct
           FROM st s
           JOIN corpus c ON s.tok = c.tok
           JOIN totals t ON s.source = t.source
           CROSS JOIN grand g
           GROUP BY 1, 2, 3)
         SELECT source, s_total,
           CAST(((present_num + (CAST(t_total AS HUGEINT) * CAST(s_total AS HUGEINT)
               - present_ct)) * 1000000)
             // (CAST(2 AS HUGEINT) * CAST(s_total AS HUGEINT)
               * CAST(t_total AS HUGEINT)) AS BIGINT) AS tvd_ppm
         FROM j""",
    // The oracle replays the two-level SimHash SEMANTICS, not the
    // banding plan: the packed-64-bit Hamming distance equals the sum
    // of the two 32-bit halves' distances, so no 64-bit packing (which
    // would overflow DuckDB's BIGINT at bit 63) is needed.
    "q110_simhash64_pairs" ->
      """WITH th AS (
           SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007)) AS hs
           FROM documents
           WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 2),
         uni AS (SELECT doc_id, unnest(hs) AS h FROM th),
         big AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(hs)-1), i ->
             (hs[i] * 131 + hs[i+1]) % 1000000007)) AS h FROM th),
         simlo AS (
           SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh
           FROM (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM uni, (SELECT unnest(generate_series(0, 31)) AS j) AS js(j)
                 GROUP BY doc_id, j) bs
           GROUP BY doc_id),
         simhi AS (
           SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh
           FROM (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM big, (SELECT unnest(generate_series(0, 31)) AS j) AS js(j)
                 GROUP BY doc_id, j) bs
           GROUP BY doc_id),
         sig AS (SELECT l.doc_id, l.sh AS lo, h.sh AS hi
           FROM simlo l JOIN simhi h USING (doc_id))
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.lo,b.lo)) + bit_count(xor(a.hi,b.hi)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.lo,b.lo)) + bit_count(xor(a.hi,b.hi)) <= 3""",
    "q111_calibration_buckets" ->
      """WITH sc AS (
           SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         b AS (
           SELECT CAST(quantile_disc(quality, 0.1) AS BIGINT) AS b1,
                  CAST(quantile_disc(quality, 0.2) AS BIGINT) AS b2,
                  CAST(quantile_disc(quality, 0.3) AS BIGINT) AS b3,
                  CAST(quantile_disc(quality, 0.4) AS BIGINT) AS b4,
                  CAST(quantile_disc(quality, 0.5) AS BIGINT) AS b5,
                  CAST(quantile_disc(quality, 0.6) AS BIGINT) AS b6,
                  CAST(quantile_disc(quality, 0.7) AS BIGINT) AS b7,
                  CAST(quantile_disc(quality, 0.8) AS BIGINT) AS b8,
                  CAST(quantile_disc(quality, 0.9) AS BIGINT) AS b9
           FROM sc),
         thr AS (
           SELECT lang, CAST(quantile_disc(quality, 0.75) AS BIGINT) AS thr
           FROM sc GROUP BY 1),
         x AS (
           SELECT s.source,
             (CASE WHEN quality > b1 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b2 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b3 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b4 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b5 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b6 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b7 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b8 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b9 THEN 1 ELSE 0 END) AS bin,
             CASE WHEN s.quality >= t.thr THEN 1 ELSE 0 END AS adm,
             s.n_tokens
           FROM sc s JOIN thr t USING (lang) CROSS JOIN b)
         SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(floor(sum(adm) * 1000.0 / count(*)) AS BIGINT) AS admit_permille,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total
         FROM x GROUP BY 1, 2""",
    "q112_snapshot_drift" ->
      """WITH a AS (
           SELECT text, arg_min(source, doc_id) AS src, arg_min(n_chars, doc_id) AS ch
           FROM documents WHERE doc_id % 3 < 2 GROUP BY text),
         b AS (
           SELECT text, arg_min(source, doc_id) AS src, arg_min(n_chars, doc_id) AS ch
           FROM documents WHERE doc_id % 3 > 0 GROUP BY text),
         j AS (
           SELECT CASE WHEN a.text IS NOT NULL AND b.text IS NOT NULL THEN 'retained'
                       WHEN a.text IS NOT NULL THEN 'removed'
                       ELSE 'added' END AS status,
             coalesce(a.src, b.src) AS source,
             coalesce(a.ch, b.ch) AS n_chars
           FROM a FULL OUTER JOIN b ON a.text = b.text)
         SELECT status, source, count(*) AS n_texts,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
         FROM j GROUP BY 1, 2""",
    "q113_retrieval_capped" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1])) AS ph
           FROM tk WHERE len(toks) >= 2),
         ct AS (SELECT doc_id, ph FROM bg WHERE doc_id % 25 <> 0),
         dfc AS (
           SELECT ph, CAST(1000000 // count(*) AS BIGINT) AS w
           FROM ct GROUP BY ph HAVING count(*) <= 30),
         qt AS (SELECT doc_id AS query_id, ph FROM bg WHERE doc_id % 25 = 0),
         sc AS (
           SELECT q.query_id, c.doc_id, CAST(sum(d.w) AS BIGINT) AS score
           FROM qt q
           JOIN dfc d ON q.ph = d.ph
           JOIN ct c ON q.ph = c.ph
           GROUP BY 1, 2)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score FROM (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rn
           FROM sc) WHERE rn <= 3""",
    "q114_weighted_admission" ->
      """WITH sc AS (
           SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         adm AS (
           SELECT source, lang, n_tokens,
             CASE WHEN (doc_id * 2654435761 + 12345) % 1000003 % 1000 < quality
               THEN 1 ELSE 0 END AS adm
           FROM sc)
         SELECT source, lang, count(*) AS n_in,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(sum(CASE WHEN adm = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_admitted
         FROM adm GROUP BY 1, 2""",
    "q115_lead_survivors" ->
      """WITH sc AS (
           SELECT doc_id, source,
             array_to_string(regexp_split_to_array(trim(text), '\s+')[1:6], ' ')
               AS pfx,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         prio AS (
           SELECT source,
             CAST(floor(sum(quality) * 1000.0 / count(*)) AS BIGINT) AS prio
           FROM sc GROUP BY 1)
         SELECT
           arg_max(s.doc_id, p.prio * 1000000000 - s.doc_id) AS doc_id,
           arg_max(s.source, p.prio * 1000000000 - s.doc_id) AS source,
           count(*) AS n_copies
         FROM sc s JOIN prio p USING (source)
         GROUP BY s.pfx""",
    "q116_incr_near_dedup" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS bid, c.doc_id AS cid
           FROM bands a JOIN bands c ON a.b = c.b AND a.bh = c.bh
           WHERE a.doc_id % 7 = 0 AND c.doc_id % 7 <> 0),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS bid, c.doc_id AS cid, a.n AS na, c.n AS nc,
             count(*) AS cnt
           FROM ex a JOIN ex c ON a.s = c.s
           JOIN cand ON cand.bid = a.doc_id AND cand.cid = c.doc_id
           GROUP BY 1, 2, 3, 4),
         hits AS (
           SELECT DISTINCT bid FROM common
           WHERE floor(cnt * 1000000.0 / (na + nc - cnt)) >= 500000)
         SELECT d.doc_id, d.source, d.n_chars FROM documents d
         WHERE d.doc_id % 7 = 0
           AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.bid = d.doc_id)""",
    "q117_packing_efficiency" ->
      """WITH tk AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         a AS (
           SELECT source, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM tk),
         b AS (
           SELECT source, n_tokens,
             CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
             CAST(floor((tok_before + n_tokens - 1) / 512.0) AS BIGINT) AS end_pack
           FROM a)
         SELECT source, count(*) AS n_docs,
           CAST(max(end_pack) + 1 AS BIGINT) AS n_packs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN end_pack <> pack_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddling,
           CAST(floor(sum(CASE WHEN end_pack <> pack_id THEN 1 ELSE 0 END)
             * 1000.0 / count(*)) AS BIGINT) AS straddle_permille,
           CAST((max(end_pack) + 1) * 512 - sum(n_tokens) AS BIGINT) AS tail_waste
         FROM b GROUP BY source""",
    "q118_cluster_sizes" ->
      """WITH RECURSIVE tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         pairs AS (
           SELECT id1, id2 FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         edges AS (
           SELECT id1 AS a, id2 AS b FROM pairs
           UNION ALL
           SELECT id2, id1 FROM pairs),
         reach AS (
           SELECT a, b AS r FROM edges
           UNION
           SELECT e.a, t.r FROM edges e JOIN reach t ON e.b = t.a),
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a),
         cl AS (
           SELECT d.doc_id,
             CAST(CASE WHEN m.a IS NULL THEN d.doc_id
                       ELSE least(m.mr, d.doc_id) END AS BIGINT) AS cluster_id
           FROM documents d LEFT JOIN mins m ON d.doc_id = m.a),
         sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM cl GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         FROM sz GROUP BY cluster_size""",
    "q119_eval_contamination" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-3),
                         i -> array_to_string(toks[i:i+3], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         b AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id % 25 = 0),
         tr AS (SELECT doc_id AS tid, unnest(sh) AS s FROM shh WHERE doc_id % 25 <> 0)
         SELECT b.doc_id,
           CAST(count(DISTINCT tr.tid) AS BIGINT) AS n_train_docs,
           CAST(count(DISTINCT b.s) AS BIGINT) AS n_shared_ngrams
         FROM b JOIN tr ON b.s = tr.s
         GROUP BY b.doc_id""",
    "q120_temperature_sampling" ->
      """WITH d AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
           FROM documents),
         c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM d GROUP BY 1),
         g AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_total FROM c),
         w AS (
           SELECT lang, n_l, n_total,
             CAST(floor(sqrt(CAST(n_l AS DOUBLE) * 1000000.0)) AS BIGINT) AS w_l
           FROM c, g),
         sw AS (SELECT CAST(sum(w_l) AS BIGINT) AS sum_w FROM w),
         rho AS (
           SELECT lang, n_l,
             CAST((CAST(w_l AS HUGEINT) * CAST(n_total AS HUGEINT) * 1000000)
               // (CAST(sum_w AS HUGEINT) * CAST(n_l AS HUGEINT)) AS BIGINT) AS rho
           FROM w, sw),
         m AS (SELECT max(rho) AS mx FROM rho),
         rates AS (
           SELECT lang,
             CAST((CAST(rho AS HUGEINT) * 1000000) // CAST(mx AS HUGEINT)
               AS BIGINT) AS rate_micro
           FROM rho, m),
         x AS (
           SELECT d.lang, r.rate_micro, d.n_tokens,
             CASE WHEN ((d.doc_id * 2654435761 + 12345) % 1000003) * 1000000
                  < r.rate_micro * 1000003 THEN 1 ELSE 0 END AS adm
           FROM d JOIN rates r USING (lang))
         SELECT lang, rate_micro, count(*) AS n_in,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(sum(CASE WHEN adm = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_admitted
         FROM x GROUP BY 1, 2""",
    "q121_capped_lsh" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         bw AS (SELECT b, bh, count(*) AS w FROM bands GROUP BY b, bh),
         kept AS (
           SELECT bands.doc_id, bands.b, bands.bh
           FROM bands JOIN bw USING (b, bh) WHERE w <= 2),
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
           FROM kept a JOIN kept b2
             ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         jac AS (
           SELECT id1, id2,
             CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jac_micro
           FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000)
         SELECT j.id1, j.id2, j.jac_micro
         FROM jac j JOIN cand USING (id1, id2)""",
    "q122_lsh_bucket_audit" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         bw AS (SELECT b, bh, count(*) AS w FROM bands GROUP BY b, bh)
         SELECT CAST(b AS BIGINT) AS band,
           count(*) AS n_buckets,
           CAST(max(w) AS BIGINT) AS max_width,
           CAST(sum(CASE WHEN w > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN w > 2 THEN w ELSE 0 END) AS BIGINT) AS rows_dropped
         FROM bw GROUP BY b""")
}
