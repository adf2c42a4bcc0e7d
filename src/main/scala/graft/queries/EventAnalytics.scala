package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Knn, Packing, SimilaritySearch}

/** Time-series operators over events, packing/chunking, skew and
  * sketch checks, the SQL-text surface, and reporting analytics.
  * Split out of the former monolithic `Queries` object — pure move,
  * no semantic change.
  */
private[graft] trait EventAnalyticsQueries extends QueryContext {
  // revenueShare builds on joinAgg (q05) from the reference-parity trait;
  // neardupSurvivors reads the q152 clustering artifact from the dedup trait
  this: ReferenceSurfaceQueries with DedupCurationQueries =>

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
    * every doc that is not its cluster's smallest id dropped via one
    * left-anti join. Output = the admitted doc ids. Reads the q152
    * clustering artifact ([[neardupClustersPersisted]] — a singleton
    * has `cluster_id == doc_id` there, so "loser" is exactly
    * `cluster_id != doc_id`, the [[Dedup.nearDupSurvivors]] convention
    * without re-paying pair discovery + CC per run). */
  def neardupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val losers = neardupClustersPersisted(spark, sfDir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"))
    docs.select(col("doc_id"))
      .join(losers.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
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

}
