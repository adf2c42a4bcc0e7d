package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based curation queries (round 10): classifiers, survivor
  * elections, and layout planners a training-data pipeline runs AFTER
  * the statistical filters — each one a corpus-trained artifact applied
  * back to the corpus, the CCNet/fastText pattern re-expressed as pure
  * relational plans with integer-exact arithmetic.
  */
private[graft] trait ModelCurationQueries extends QueryContext {
  self: DedupCurationQueries =>

  /** Token-evidence quality classifier — the engine-native analogue of
    * the trained quality filter every web-scale curation stack ships
    * (GPT-3's "looks like WebText" LR, CCNet's fastText): label the
    * corpus with a reference heuristic (q13's integer quality score,
    * ≥ 500 = high), TRAIN a Bernoulli token-evidence model on those
    * labels, and SCORE every document with it — heuristic distillation
    * into a per-token model, all distributive. On this corpus the
    * model recovers every positive label (28/28) and over-fires on the
    * margin (157 predicted hi / 28 true — evidence voting on a 6%
    * positive class), which is the behavior such filters are used with
    * in practice: threshold the SCORE, not the sign. The gate pins
    * per-doc score, prediction, AND label, so train+score arithmetic
    * and agreement are all hash-checked per round.
    *
    * Determinism: no FP log anywhere — per-token evidence is the
    * Graham/Robinson spam-filter combiner (the classic trained token
    * classifier predating fastText): smoothed per-class presence rates
    * in ppm, `r_c = (df_c+1)·10⁶ DIV (n_c+2)`, and the centered
    * evidence weight `w = r₊·10⁶ DIV (r₊+r₋) − 500000` — a monotone
    * integer transform of the NB likelihood ratio, 0 for uninformative
    * tokens, ±5·10⁵ saturated (a ⌊log₂⌋-via-bin-length weight is also
    * integer-exact but quantizes this corpus's ratios, which all sit
    * in (½,2), to a constant 0 — measured, hence the ppm form). Every
    * product is bounded by 10¹² (`r_c ≤ 10⁶` by construction), so the
    * arithmetic is exact at any corpus size with df ≤ ~9·10¹². Scoring
    * is FULL Bernoulli evidence (absent tokens vote too — dropping
    * them length-biases the score toward long docs; measured: 493/500
    * predicted positive without it), algebraically folded so it stays
    * sparse: `score = prior + Σ_vocab w_absent + Σ_{t∈doc}(w_present −
    * w_absent)` — the vocab-wide absence sum is ONE scalar, and the
    * per-doc work is still only the doc's own tokens. `greatest(·,1)`
    * guards the degenerate zero-rate denominators (possible only past
    * 10⁶ docs per class, but the guard keeps the expression total).
    *
    * Scale shape: training is one partial-agged per-(token, class)
    * distinct-doc count — vocab-bounded, like every model artifact
    * here; scoring is a single token-keyed shuffle-hash join of the
    * doc-distinct-token stream against the weight relation (the model
    * is corpus-derived and deliberately NOT broadcast — the q124 LM
    * rule) followed by a per-doc partial agg. The two scalar totals
    * ride 1-row broadcasts. Nothing is all-pairs; the whole query
    * costs two exploded-token scans (train + score share the same
    * relation, one scan under ReuseExchange). */
  def nbQualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val y = (TextFunctions.qualityScore(col("text")) >= 500).cast("long")
    val dt = docs.select(col("doc_id"), y.as("y"),
      explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
    val totals = docs.agg(
      sum(y).as("n_pos"), sum(lit(1L) - y).as("n_neg"))
    val weights = dt.groupBy(col("tok"))
      .agg(sum(col("y")).as("df_pos"), sum(lit(1L) - col("y")).as("df_neg"))
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        expr("((df_pos + 1) * 1000000) DIV (n_pos + 2)").as("r_pos"),
        expr("((df_neg + 1) * 1000000) DIV (n_neg + 2)").as("r_neg"))
      .select(col("tok"),
        expr("(r_pos * 1000000) DIV greatest(r_pos + r_neg, 1) - 500000")
          .as("w_p"),
        expr("((1000000 - r_pos) * 1000000) " +
          "DIV greatest(2000000 - r_pos - r_neg, 1) - 500000").as("w_a"))
    val wAbsTotal = weights.agg(sum(col("w_a")).as("w_abs_total"))
    val prior = totals.select(
      expr("((n_pos + 1) * 1000000) DIV (n_pos + n_neg + 2) - 500000")
        .as("prior_w"))
    dt.join(weights.hint("shuffle_hash"), "tok")
      .groupBy(col("doc_id"), col("y"))
      .agg(count(lit(1)).as("n_features"),
        sum(col("w_p") - col("w_a")).as("sw"))
      .crossJoin(broadcast(prior)).crossJoin(broadcast(wAbsTotal))
      .select(col("doc_id"), col("n_features"),
        (col("sw") + col("w_abs_total") + col("prior_w")).as("nb_score"),
        (col("sw") + col("w_abs_total") + col("prior_w") > 0)
          .cast("long").as("pred_hi"),
        col("y").as("is_hi"))
  }

  /** Quality-argmax survivor election — the keep/drop policy real
    * dedup pipelines actually ship: within every q43 near-dup cluster,
    * keep the HIGHEST-QUALITY copy (q13's integer quality score), not
    * the smallest id. The smallest-id convention ([[neardupSurvivors]]
    * q49) is the right CLUSTERING canonicalization but the wrong
    * CURATION policy — when a crawl holds five copies of a page, the
    * one worth training on is the cleanest, and "first crawled" is
    * uncorrelated with clean. Tie-break on smaller doc_id keeps the
    * election total and deterministic.
    *
    * Scale shape: reads the q152 clustering artifact (one parquet
    * scan; the first toucher per run builds it); the election is the
    * packed-struct argmax (q115's idiom): one shuffle-hash join of the
    * membership onto the per-doc quality relation, then a partial-agged
    * lexicographic `min` on `(−quality, doc_id)` per cluster — one
    * struct per cluster per partition crosses the wire, no Window. */
  def qualitySurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val q = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    neardupClustersPersisted(spark, sfDir)
      .join(q.hint("shuffle_hash"), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(struct((-col("quality")).as("nq"), col("doc_id").as("id"))).as("m"))
      .select(col("cluster_id"), col("cluster_size"),
        col("m.id").as("keep_id"), (-col("m.nq")).as("keep_quality"))
  }

  /** Deterministic training-order shard layout — the global shuffle a
    * data loader needs, as a pure function of the corpus: every doc is
    * assigned `(shard, pos)` by a fixed multiplicative hash, so the
    * training order is reproducible from the corpus alone (restart a
    * run, re-derive the permutation; resume = seek to `(shard, pos)`),
    * neighboring docs land in different shards, and each shard is an
    * independently readable unit. The alternative — `ORDER BY rand()`
    * — is neither reproducible nor resumable, and a single global sort
    * is the one thing a 100 TB layout pass must never do.
    *
    * Scale shape: the scramble key is a per-row projection; the only
    * ordered step is a row_number PER SHARD (Window partitioned on
    * `shard`), so the sort is sharded into `nShards` independent
    * sorts — nShards scales with the cluster (here 8; a 1000-executor
    * layout run uses thousands), keeping every sort partition-sized.
    * No global Window, no driver traffic. At write time this column
    * pair IS the partitionBy/sortBy spec of the bucketed output. */
  def shardLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val nShards = 8
    val skey = pmod(col("doc_id") * 2654435761L + 40503L, lit(1000003L))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), skey.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .select(col("doc_id"), col("source"), col("shard"),
        (row_number().over(w) - 1).cast("long").as("pos"))
  }

  /** Content-defined chunking + chunk dedup — the SHIFT-ROBUST
    * complement to fixed-stride chunk dedup (q64 cuts every 20 tokens,
    * so one inserted word misaligns every later chunk; q80/q100's
    * stride-32 char windows have the same 1-in-stride alignment
    * lottery, documented there). CDC (the FastCDC/rsync idea, at token
    * granularity) instead cuts where the CONTENT says so: a boundary
    * falls after token i iff the rolling hash of the last 4 token
    * hashes ≡ 0 (mod 8) — a pure local predicate, so an insertion
    * re-chunks only the window it touches and every chunk after the
    * next content-chosen boundary realigns. Mean chunk ≈ 8 tokens by
    * construction. Emitted per doc: chunk count, how many of its
    * chunks also occur elsewhere in the corpus (same boundary-to-
    * boundary token-hash fingerprint, occurrence count ≥ 2 corpus-wide
    * — intra-doc repeats count, documented), and the duplicated share
    * of its tokens in ppm.
    *
    * Scale shape: everything before the dedup agg is per-row array
    * math (token hashes once via the codegen'd PolyHashArrayExpr, the
    * 4-window gear hash via three shifted-slice zip_withs — the
    * q47/q128 idiom — boundary selection and per-chunk fingerprint
    * folds as HOFs over the one hashes array; no strings leave the
    * row, no Window, no explode until chunks). Then ONE fingerprint-
    * keyed partial agg and one shuffle-hash join-back of the
    * corpus-derived count relation (never broadcast). Cost ≈ q64's,
    * plus the per-row folds. */
  def cdcChunkDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val perChunk = operators.Cdc.chunks(docs, "doc_id", "text",
      window = 4, divisor = 8)
    val occ = perChunk.groupBy(col("fp")).agg(count(lit(1)).as("occ"))
    perChunk.join(occ.hint("shuffle_hash"), "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("len")).as("n_tokens"),
        sum(when(col("occ") >= 2, col("len")).otherwise(0L)).as("dup_tokens"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        col("n_tokens"),
        expr("(dup_tokens * 1000000) DIV n_tokens").as("dup_ppm"))
  }

  /** Multi-round BPE training ([[operators.Bpe]]) — q129 ran ONE gated
    * merge-statistics round; this trains an actual merge list: three
    * greedy rounds, each picking the max-weight adjacent symbol pair
    * and fusing it corpus-wide, exactly the sentencepiece/HF trainer
    * loop. The corpus is scanned once (the q129 wordcount); every
    * round after runs on the vocab-bounded symbol table — the
    * structural reason BPE training is feasible at 100 TB at all
    * (documented at [[operators.Bpe]]). The gate replays all three
    * greedy choices end-to-end in the oracle (unrolled, the q127
    * Lloyd discipline), so merge ORDER — not just the pair set — is
    * hash-pinned.
    *
    * Scale shape: per round, one vocab-bounded pair agg + a 1-ROW
    * collect (the chosen merge parametrizes the next round's
    * expression — IVF-codebook-style driver-legitimate traffic) + one
    * per-row array fold, localCheckpoint-ed so round r doesn't replan
    * r fold layers (the q43 CC discipline). */
  def bpeTrain3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, sfDir, "documents")
    val (merges, _) = operators.Bpe.train(
      operators.Bpe.wordTable(docs, "text"), rounds = 3)
    merges.toDF("round", "lhs", "rhs", "weight")
      .select(col("round").cast("long").as("round"), col("lhs"),
        col("rhs"), col("weight"))
  }

  /** BPE application — tokenize the corpus with the q136-trained merge
    * list and emit per-doc post-BPE segment counts (the number that
    * prices a doc in context-window terms). The 100 TB trick mirrors
    * training: merges are applied to the DISTINCT-word table (a
    * vocab-bounded array-fold per merge), and the corpus only pays a
    * word-keyed shuffle-hash join of its token stream against the
    * `(word, n_segments)` relation — the corpus is never
    * char-exploded, and the segment relation is corpus-derived so it
    * is never broadcast. */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame =
    bpeSegmentedWordStream(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_seg")).as("bpe_tokens"))

  /** The shared q137/q138 substrate: q136-trained merges applied to
    * the DISTINCT-word table, segment counts joined back to the
    * exploded corpus word stream — `(doc_id, source, w, n_seg)`. One
    * definition so the encoding contract (3 rounds, shuffle-hash
    * join, vocab-side application) cannot drift between the per-doc
    * and per-source consumers. */
  private def bpeSegmentedWordStream(
      spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val (_, finalWords) = operators.Bpe.train(
      operators.Bpe.wordTable(docs, "text"), rounds = 3)
    val segs = finalWords.select(col("w"),
      size(col("sym")).cast("long").as("n_seg"))
    docs.select(col("doc_id"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .join(segs.hint("shuffle_hash"), "w")
  }

  /** Per-source tokenizer FERTILITY — chars per post-BPE segment, the
    * tokenizer-health number a multilingual/multi-domain pipeline
    * watches per source: a source whose fertility runs hot against the
    * corpus mean is being shredded by the vocabulary (its text costs
    * disproportionate sequence length per character), which silently
    * taxes its share of every downstream token budget. Computed with
    * the q136-trained merges, so the audit tracks the ACTUAL tokenizer,
    * not a proxy.
    *
    * Scale shape: rides q137's vocab-side segmentation (merges applied
    * to DISTINCT words; the corpus pays one word-keyed shuffle-hash
    * join) followed by a per-source partial agg — source cardinality
    * bounds the output. Fertility is integer milli (floor), n_chars
    * from the word lengths themselves. */
  def bpeFertility(spark: SparkSession, sfDir: String): DataFrame =
    bpeSegmentedWordStream(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_seg")).as("bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("bpe_tokens"),
        expr("(n_chars * 1000) DIV bpe_tokens").as("fertility_milli"))

  /** Effective token budget per source AFTER soft dedup — the
    * accounting that connects q131's near-dup-aware weights to the
    * mixture planner: each doc contributes
    * `⌊n_tokens · weight_ppm / 10⁶⌋` effective tokens (weight =
    * 1/cluster_size over its q43 cluster), so a source whose volume is
    * crawl-duplication collapses toward its distinct content mass.
    * Raw-vs-effective per source is exactly the number a data-mixture
    * decision needs (feeding RAW counts into mixing weights over-trains
    * on the most-duplicated sources).
    *
    * Scale shape: reads the q152 clustering artifact (one parquet
    * scan) + one cluster-size count + two shuffle-hash joins (weights onto
    * docs, token counts per row) + a source-bounded partial agg.
    * Per-doc flooring keeps every emitted value integer-exact. */
  def effectiveTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val cl = neardupClustersPersisted(spark, sfDir)
    val sizes = cl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val weighted = cl.join(sizes.hint("shuffle_hash"), "cluster_id")
      .select(col("doc_id"),
        expr("CAST(1000000 DIV cluster_size AS BIGINT)").as("weight_ppm"))
    docs.select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .join(weighted.hint("shuffle_hash"), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        sum(expr("(n_tokens * weight_ppm) DIV 1000000")).as("eff_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("eff_tokens"),
        expr("(eff_tokens * 1000000) DIV raw_tokens").as("eff_ppm"))
  }

  /** The q132 scored relation as a build-once-per-run ARTIFACT — the
    * [[cappedPairsShared]] discipline for the classifier: TWO
    * consumers here (q141's calibration, q158's uncertainty sample)
    * would otherwise each re-pay q132's train+score per run, and no
    * deployment re-trains its quality filter per consumer — it scores
    * the corpus once and every downstream read is a scan. The
    * train+score arithmetic stays inline-gated by q132 itself, and
    * both consumers' oracles replay the FULL train+score chain, so
    * any artifact round-trip drift is a hash flip against the same
    * ground truth (the q152/q155 shared-oracle argument). All columns
    * are integer-exact, so parquet round-trips bit-equal. */
  private def nbScoresShared(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    val path = Artifacts.ensure("nb_scores", sfDir) { p =>
      Artifacts.publish(nbQualityClassifier(spark, sfDir), p)
    }
    spark.read.parquet(path)
  }

  /** Classifier calibration table — the eval q132's scaladoc tells its
    * consumer to run ("threshold the SCORE, not the sign"): documents
    * bucketed into nine DISCRETE score deciles (q83's broadcast
    * percentile-boundary binning — no global sort, no ntile Window)
    * with the per-decile true-high rate in ppm. Reading up from the
    * top decile gives the precision/volume trade at every candidate
    * threshold; a monotone hi_rate column is the calibration signal
    * that the trained scores actually rank quality. The gate pins
    * boundary election, binning, and rates, so a score-quality
    * regression in q132's trainer shows up here as a hash flip even
    * when q132 itself still passes.
    *
    * Scale shape: reads the per-run [[nbScoresShared]] artifact (one
    * parquet scan; the first toucher per run pays q132's two
    * exploded-token passes), then one tiny percentile_disc aggregate
    * broadcast into a map-side binning projection and a 10-row
    * partial agg.
    *
    * Boundary DEFINITION (engine-independent, pinned by the oracle
    * with explicit rank arithmetic rather than the oracle engine's
    * own quantile function): boundary p = the `ceil(p·n/10)`-th
    * smallest score — exactly the ANSI `percentile_disc` semantics
    * ("smallest value whose cume_dist ≥ p") Spark implements, and
    * well-defined under ties since rank selection reads a VALUE from
    * the sorted multiset. */
  def scoreCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = nbScoresShared(spark, sfDir)
      .select(col("nb_score"), col("is_hi"))
    val bs = (1 to 9).map(i =>
      expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY nb_score)")
        .cast("long").as(s"b$i"))
    val bounds = scored.agg(bs.head, bs.tail: _*)
    val bin = (1 to 9).map(i =>
      when(col("nb_score") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
    scored.crossJoin(broadcast(bounds))
      .select(col("nb_score"), col("is_hi"), bin.cast("long").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("is_hi")).as("n_hi"),
        min(col("nb_score")).as("lo_score"),
        max(col("nb_score")).as("hi_score"))
      .select(col("decile"), col("n"), col("n_hi"), col("lo_score"),
        col("hi_score"), expr("(n_hi * 1000000) DIV n").as("hi_rate_ppm"))
  }

  /** Uncertainty sampling — the ACTIVE-LEARNING batch selector every
    * trained-filter loop (q132's classifier included) runs next: the
    * 64 documents whose score sits closest to the decision boundary
    * (smallest |nb_score|, ties to the smaller doc_id) are exactly the
    * ones whose human labels most improve the model. Emitted with the
    * SIGNED score so the labeling queue shows which side of the
    * boundary each candidate leans.
    *
    * Scale shape: reads the per-run [[nbScoresShared]] artifact (one
    * parquet scan), then ONE ungrouped bounded-heap
    * [[operators.TopK]] aggregation — O(64) state per partition,
    * map-side partial heaps, no global sort of the corpus (the q44
    * sampled-gate discipline: a `orderBy(abs).limit(64)` would plan a
    * TakeOrdered over every scored row, which is fine, but the heap
    * agg composes into further aggregations without a sort at all). */
  def uncertaintySample(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = nbScoresShared(spark, sfDir)
      .select(col("doc_id"), col("nb_score"))
    scored
      .agg(operators.TopK.topK(64)(
        abs(col("nb_score")).cast("double"), col("doc_id"),
        col("nb_score")).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "n")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("n.id").as("doc_id"), col("n.label").as("nb_score"))
  }

  /** Per-DIMENSION embedding statistics — the feature-standardization
    * pass every vector pipeline runs before quantization (q62) or IVF
    * cell assignment (q39): per dimension, the exact integer
    * sufficient statistics (n, Σx, Σx², min, max over milli-quantized
    * values — the q81 sufficient-statistics discipline) plus derived
    * mean and variance. A dimension whose variance collapses (dead
    * feature) or whose range explodes (scaling bug upstream) is the
    * audit signal; the stats table itself is the input to a
    * standardize-then-quantize step.
    *
    * Determinism: values are milli-quantized ([[operators.SemDedup
    * .quantizeMilli]]) so Σ and Σx² are exact 64-bit integers in any
    * engine; mean is a single floored IEEE divide (exact per the FP
    * rule — |Σ| ≪ 2⁵³); variance numerator `n·Σx² − (Σx)²` stays
    * integer and non-negative, so integer DIV is engine-portable.
    * The numerator is computed in 128-bit integers (Spark
    * decimal(38,0), DuckDB HUGEINT — both exact): in 64 bits `n·Σx²`
    * wraps silently once n·Σx² > 2⁶³ (≈1.5 M rows at |x|≤2000 milli),
    * far below corpus scale; the widened product holds to ~10³⁸
    * (n ≤ ~10¹² rows at this magnitude) and the final quotient is a
    * per-dim variance ≤ max(x)², safely back in long range.
    *
    * Scale shape: one positional explode + a dim-keyed partial agg —
    * output rows = vector dimensionality, independent of corpus size. */
  def embeddingDimStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(posexplode(
        operators.SemDedup.quantizeMilli(col("embedding"))).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_milli"),
        sum(col("x") * col("x")).as("sumsq_milli"),
        min(col("x")).as("min_milli"),
        max(col("x")).as("max_milli"))
      .select(col("dim"), col("n"), col("sum_milli"), col("sumsq_milli"),
        col("min_milli"), col("max_milli"),
        floor(col("sum_milli").cast("double") / col("n")).cast("long")
          .as("mean_milli"),
        expr("""(CAST(n AS DECIMAL(38,0)) * sumsq_milli
                - CAST(sum_milli AS DECIMAL(38,0)) * sum_milli)
               DIV (CAST(n AS DECIMAL(38,0)) * n)""")
          .as("var_milli2"))

  /** Cluster-aware train/test split — the ACTION for q107's finding:
    * q107 measures how many near-dup pairs straddle a doc-hash split
    * (train/test leakage); this query prevents them BY CONSTRUCTION by
    * hashing the q43 CLUSTER id instead of the doc id, so an entire
    * near-dup clique lands on one side ([[SplitLeakageSpec]] asserts
    * zero straddling pairs — the same property is impossible for any
    * per-doc assignment). Same affine-mod bucket arithmetic as q37
    * (engine-portable, idempotent, survives retries); 80/20.
    *
    * Scale shape: reads the q152 clustering artifact (one parquet
    * scan), then a pure per-row projection — no additional shuffle. */
  def clusterSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Sampling
    neardupClustersPersisted(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"),
        Sampling.splitTag(col("cluster_id"), 10, 8).as("split"))
  }

  /** Winnowing-fingerprint duplicate pairs ([[operators.Winnow]], the
    * MOSS algorithm) — the GUARANTEED substring detector next to q80's
    * stride lottery: window-minimum selection over k-gram hashes means
    * any shared token run ≥ w + k − 1 = 7 tokens yields a shared
    * fingerprint at ANY alignment (q80 catches unaligned runs with
    * probability 1/stride; its scaladoc states the lottery — this
    * closes it), at ~2/(w+1) the index density. The standard
    * plagiarism/clone-detection primitive, and the index a substring-
    * level contamination audit should build at 100 TB.
    *
    * Scale shape: per-row array math to the fingerprint set, then the
    * q80 join shape — fingerprint-keyed shuffle self-join bounded by
    * real collisions, never all-pairs. */
  def winnowPairs(spark: SparkSession, sfDir: String): DataFrame =
    operators.Winnow.pairs(t(spark, sfDir, "documents"), "doc_id", "text",
      k = 4, w = 4)

  /** Curation FUNNEL — the observability table every curation run
    * logs: how many documents survive each stage of the composed
    * pipeline, as one row per stage. Stages (cumulative — a doc
    * reaches stage k only through k−1):
    *
    *  1. corpus;
    *  2. Gopher-rule admission (q147);
    *  3. blocklist density screen (q144);
    *  4. exact-text dedup survivors (smallest id per text among
    *     stage-3 docs);
    *  5. near-dup survivors (smallest stage-4 id per q43 cluster);
    *  6. winnow decontamination (q148's flagged docs dropped).
    *
    * Where the volume falls off is the FIRST question a pipeline
    * review asks; each stage's implementation is the gated query it
    * names, so this funnel is the composition contract over them.
    *
    * Scale shape: the per-doc reached-stage flags are one pass of
    * per-row predicates plus the same keyed joins the component
    * queries pay (text-min election, cluster-min election, winnow
    * fp semi-join — all shuffle-hash, q43 rides the checkpointed
    * clustering); the funnel itself is a 6-row explode + partial agg.
    * No Window, no driver loops. */
  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelReached(spark, sfDir)
      .select(explode(sequence(lit(1L), lit(6L))).as("stage"), col("reached"))
      .filter(col("reached") >= col("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-doc highest-stage-reached of the q150 funnel, with the source
    * carried through — the single definition of the staged composition
    * consumed by [[curationFunnel]] and [[curationFunnelBySource]]. */
  private def funnelReached(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val gop = gopherRules(spark, sfDir)
      .select(col("doc_id"), col("admitted").as("f2"))
    val blk = blocklistFilter(spark, sfDir)
      .select(col("doc_id"), col("admitted").as("b_adm"))
    val base = docs.select(col("doc_id"), col("source"), col("text"))
      .join(gop.hint("shuffle_hash"), "doc_id")
      .join(blk.hint("shuffle_hash"), "doc_id")
      .withColumn("f3", (col("f2") === 1L && col("b_adm") === 1L).cast("long"))
    // stage 4: exact-text election among stage-3 docs
    val exKeep = base.filter(col("f3") === 1L)
      .groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
    val withF4 = base
      .join(exKeep.hint("shuffle_hash"), Seq("text"), "left")
      .withColumn("f4",
        (col("f3") === 1L && col("doc_id") === col("keep_id")).cast("long"))
    // stage 5: near-dup election among stage-4 docs
    val cl = neardupClustersPersisted(spark, sfDir)
    val clKeep = cl.join(
        withF4.filter(col("f4") === 1L).select(col("doc_id")), "doc_id")
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("ckeep_id"))
    val withF5 = withF4.join(cl.hint("shuffle_hash"), "doc_id")
      .join(clKeep.hint("shuffle_hash"), Seq("cluster_id"), "left")
      .withColumn("f5",
        (col("f4") === 1L && col("doc_id") === col("ckeep_id")).cast("long"))
    // stage 6: drop q148-flagged docs (winnow fp shared with the eval
    // slice) — served from the q155 persisted index, not re-fingerprinted
    val contaminated = winnowDecontamPersisted(spark, sfDir)
      .select(col("doc_id"), lit(1L).as("cont"))
    withF5
      .join(contaminated.hint("shuffle_hash"), Seq("doc_id"), "left")
      .withColumn("f6",
        (col("f5") === 1L && col("cont").isNull).cast("long"))
      .select(col("source"),
        (lit(1L) + col("f2") + col("f3") + col("f4") + col("f5")
          + col("f6")).as("reached"))
  }

  /** Per-SOURCE curation funnel — q150's stage counts broken down by
    * source, the drill-down a pipeline review actually acts on: a
    * source bleeding at stage 2 has a quality problem, at stage 4/5 a
    * duplication problem, at stage 6 a contamination problem — three
    * different owners. Same per-doc reached-stage flags as q150 (the
    * composition cannot drift — one private helper computes them for
    * both), grouped by (source, stage).
    *
    * Scale shape: identical to q150 plus the source column riding the
    * same pass; output is source × 6 rows. */
  def curationFunnelBySource(spark: SparkSession, sfDir: String): DataFrame =
    funnelReached(spark, sfDir)
      .select(col("source"),
        explode(sequence(lit(1L), lit(6L))).as("stage"), col("reached"))
      .filter(col("reached") >= col("stage"))
      .groupBy(col("source"), col("stage"))
      .agg(count(lit(1)).as("n_docs"))

  /** Tokenizer-DRIFT audit — would ingesting the incoming batch change
    * the tokenizer? Trains the q136 merge list twice — on the full
    * corpus and on the corpus WITHOUT the incoming batch (`doc_id % 5
    * == 0`, the q85/q106 ingest split) — and emits the two merge
    * choices per round side by side with a `same` bit. A flipped
    * early merge is the alarm an ingest pipeline needs BEFORE
    * committing a batch: tokenizer-dependent artifacts downstream
    * (packed sequences, token budgets, vocab coverage) all silently
    * shift when the merge list moves. The oracle unrolls BOTH greedy
    * chains (two prefixed copies of the q136 CTE chain in one
    * statement), so both trainings and the comparison are hash-gated.
    *
    * Scale shape: two q136 trainings — two partial-agged wordcounts
    * (the batch filter is a pushed-down scan predicate on the second)
    * and vocab-bounded merge rounds; the comparison is 3 rows. */
  def bpeDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, sfDir, "documents")
    val full = operators.Bpe.train(
      operators.Bpe.wordTable(docs, "text"), rounds = 3)._1
    val wo = operators.Bpe.train(
      operators.Bpe.wordTable(
        docs.filter(col("doc_id") % 5 =!= 0), "text"), rounds = 3)._1
    full.zip(wo).map { case ((r, a, b, w), (_, a2, b2, w2)) =>
      (r.toLong, a + b, w, a2 + b2, w2,
        if (a == a2 && b == b2) 1L else 0L)
    }.toDF("round", "merge_full", "weight_full",
      "merge_wo_batch", "weight_wo_batch", "same")
  }

  /** Winnowing-index decontamination — q56's eval-contamination scan
    * upgraded with q143's GUARANTEE: a train doc is flagged iff it
    * shares a winnowing fingerprint with any eval doc, which catches
    * EVERY shared run ≥ 7 tokens at any alignment (q56's exact 4-gram
    * shingles catch runs ≥ 4 but index every position; the winnow
    * index is ~2/(w+1) the size with a run-length-7 contract — the
    * index you can actually afford to keep resident for a 100 TB
    * train corpus). Emits per flagged train doc the shared-fingerprint
    * count — the triage ordering for manual review.
    *
    * Scale shape: per-row fingerprinting both sides, then ONE
    * fp-keyed cross-side equi-join (eval side distinct-fp bounded;
    * shuffle-hash pinned like every corpus-derived relation — a small
    * eval suite could broadcast, but the plan must survive an
    * eval-suite library the size of a corpus, the q116 cross-side
    * rule) and a per-doc partial agg. */
  def winnowDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Winnow
    val docs = t(spark, sfDir, "documents")
    val evalFps = Winnow.fingerprints(
        docs.filter(col("doc_id") % 25 === 0), "doc_id", "text")
      .select(col("fp")).distinct()
    Winnow.fingerprints(
        docs.filter(col("doc_id") % 25 =!= 0), "doc_id", "text")
      .join(evalFps.hint("shuffle_hash"), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_fps"))
  }

  /** q148's decontamination served from a persisted winnow INDEX —
    * the MOSS index is the canonical build-once artifact (its whole
    * point is amortization: ~2/(w+1) of the k-gram count, small
    * enough to keep resident per corpus snapshot and probe on every
    * eval-suite revision), yet inline q148 re-fingerprints the full
    * train corpus per run. First touch per run fingerprints the train
    * side once and atomic-publishes it ([[graft.sources.Artifacts]],
    * the q152 discipline); every probe after that pays one parquet
    * scan of the index plus per-row fingerprinting of the EVAL side
    * only — the small, frequently-changing side. (A cluster
    * deployment would additionally bucket the index by `fp` to make
    * repeat probes shuffle-free on the train side; plain parquet
    * keeps the artifact engine-portable here and the probe join still
    * shuffles only index-density rows, not k-grams.) The q155 gate
    * shares q148's oracle VERBATIM, so index round-trip drift is a
    * hash flip against the same ground truth. */
  def winnowDecontamPersisted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    import operators.Winnow
    val docs = t(spark, sfDir, "documents")
    val path = Artifacts.ensure("winnow_index", sfDir) { p =>
      Artifacts.publish(
        Winnow.fingerprints(
          docs.filter(col("doc_id") % 25 =!= 0), "doc_id", "text"), p)
    }
    val evalFps = Winnow.fingerprints(
        docs.filter(col("doc_id") % 25 === 0), "doc_id", "text")
      .select(col("fp")).distinct()
    spark.read.parquet(path)
      .join(evalFps.hint("shuffle_hash"), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_fps"))
  }

  /** Gopher-rule admission bundle — the canonical document-level
    * quality screen (Rae et al., Gopher appendix A): word-count
    * bounds, mean-word-length bounds, and required-stopword presence,
    * each emitted as its own pass bit plus the combined admission
    * flag (per-rule bits make the table an auditable rule report, not
    * just a filter — which RULE kills a source's docs is the
    * actionable number). The repetition rules of the same appendix
    * live in q55 (`repetitionSignals`) — this bundle is the
    * shape/lexicon half. All integer (mean word length in milli via
    * an exact char-sum fold; no FP).
    *
    * Scale shape: map-only — every signal is a per-row projection
    * over the token array; no shuffle, no join, nothing collected. */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val tk = TextFunctions.tokens(col("text"))
    val stops = Seq("the", "a", "an", "of", "and", "is", "in", "to")
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        aggregate(tk, lit(0L), (a, t) => a + length(t)).as("sum_chars"),
        size(filter(array_distinct(tk), t => t.isin(stops: _*)))
          .cast("long").as("n_stop_kinds"))
      .withColumn("mean_wlen_milli",
        expr("(sum_chars * 1000) DIV n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("mean_wlen_milli"),
        col("n_stop_kinds"),
        col("n_tokens").between(50L, 100000L).cast("long").as("r_len"),
        col("mean_wlen_milli").between(3000L, 10000L).cast("long").as("r_wlen"),
        (col("n_stop_kinds") >= 2L).cast("long").as("r_stop"))
      .withColumn("admitted",
        (col("r_len") === 1L && col("r_wlen") === 1L && col("r_stop") === 1L)
          .cast("long"))
  }

  /** IVF index as a persisted ARTIFACT — q39's search served from a
    * parquet index ([[operators.SimilaritySearch.buildIvfIndex]] →
    * [[operators.SimilaritySearch.ivfTopKFromIndex]]): build once
    * (codebook + cell-partitioned assignments), probe many — the
    * deployment shape of ANN at 100 TB, where re-deriving assignments
    * per query batch would re-pay the corpus scan every time, and
    * where `partitionBy(c_id)` means a probe's scan prunes to its
    * cells' files. The oracle is q39's VERBATIM (the q54/q58
    * shared-oracle bit-equality contract): same parameters, same
    * results, through a parquet round-trip. */
  def annIvfPersisted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    import operators.SimilaritySearch
    val emb = t(spark, sfDir, "embeddings")
    // a FIXED per-corpus artifact location (keyed by the FULL sanitized
    // corpus path — an Int hashCode can collide between corpora and
    // silently serve the wrong index), published build-dir-then-rename
    // so a concurrent reader never sees a half-written index; single
    // writer per corpus is the deployment contract (Artifacts scaladoc).
    // Build-ONCE-per-run via ensure (round-20): this was the one
    // artifact query that re-published its tree on every invocation —
    // each bench pass re-paid the codebook derivation and the
    // cell-partitioned re-write the scaladoc's "build once, probe
    // many" exists to avoid (measured ~2.5 s per repeat invocation).
    val path = Artifacts.ensure("ivf_index", sfDir) { p =>
      Artifacts.publishTree(spark, p) { build =>
        SimilaritySearch.buildIvfIndex(
          emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
          centroids = 64, assignments = 2, build)
      }
    }
    SimilaritySearch.ivfTopKFromIndex(
      emb.filter(col("vec_id") % 10 === 0), path, k = 5,
      "vec_id", "embedding", probes = 16)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_micro"))
  }

  /** Duplicate-taxonomy audit — crosses the two orthogonal duplicate
    * detectors: q17's whole-document Jaccard pairs (SEMANTIC near-dup:
    * the documents are mostly the same text) and q143's winnowing
    * pairs (CONTAINMENT: they share at least one ≥ 7-token run,
    * however different the rest is). The full-outer cross-tab tells an
    * ops team what their duplication actually IS — `both` = classic
    * crawl copies (near-dup pass handles them), `containment_only` =
    * quoting/boilerplate/template (needs passage excision q100, not
    * doc drops), `semantic_only` = paraphrase-level rewrites that
    * share no long literal run (only the shingle-set detector sees
    * them). Which bucket dominates decides which dedup pass runs
    * first at 100 TB — that ordering is the single biggest cost knob
    * in a multi-pass dedup pipeline.
    *
    * Scale shape: both pair relations are fingerprint/shingle-keyed
    * shuffle joins bounded by real collisions (q17/q143 discipline);
    * the cross-tab is one full-outer join on the pair key + a 3-row
    * partial agg. */
  def dupTaxonomy(spark: SparkSession, sfDir: String): DataFrame = {
    val jac = jaccardPairs(spark, sfDir)
      .select(col("id1"), col("id2"), lit(1L).as("semantic"))
    val win = winnowPairs(spark, sfDir)
      .select(col("id1"), col("id2"), lit(1L).as("containment"))
    jac.join(win, Seq("id1", "id2"), "full_outer")
      .select(
        when(col("semantic").isNotNull && col("containment").isNotNull, "both")
          .when(col("semantic").isNotNull, "semantic_only")
          .otherwise("containment_only").as("family"))
      .groupBy(col("family"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Blocklist density filter — the C4-style wordlist screen: count
    * blocklisted-term occurrences per document and admit only below a
    * density threshold (2% here; an absolute-zero policy is the same
    * plan with threshold 1). The blocklist rides the expression as
    * literals (a real deployment broadcasts a blocklist relation —
    * either way the screen is a MAP-ONLY projection; nothing shuffles,
    * nothing joins). Both the counts and the admission bit are gated,
    * so policy drift is a hash flip. */
  def blocklistFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val bad = TextFunctions.BlocklistTerms
    val toks = TextFunctions.tokens(col("text"))
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        size(filter(toks, tk => tk.isin(bad: _*))).cast("long").as("n_bad"))
      .withColumn("bad_ppm", expr("(n_bad * 1000000) DIV n_tokens"))
      .withColumn("admitted", (col("bad_ppm") < 20000L).cast("long"))
  }

  /** Epoch planner — per-language repeat factors under a fixed token
    * budget (the Muennighoff-style "how many epochs of each slice"
    * table a run recipe starts from): budget B = 2× the corpus's raw
    * tokens, fair share F = B DIV n_langs, every language capped at 3
    * epochs of itself (the repeat caution for web-scale data).
    * Languages too small to absorb F cap out; ONE
    * redistribution round hands the leftover to uncapped languages in
    * proportion to their size, then re-caps. Exact water-filling
    * iterates to a fixed point; a single round is the standard planner
    * compromise, and on this corpus the full mechanism fires with a
    * MIXED outcome — the smallest language (`de`) caps at 3 epochs and
    * its leftover flows pro-rata to the four uncapped languages (the
    * gate would go stale if either branch went dead). Every
    * step is integer floor division, so any engine replays the exact
    * allocation.
    *
    * Scale shape: one partial-agged per-language token count (group-
    * domain-bounded), two 1-row scalar aggregates broadcast back, and
    * pure projections — the corpus is scanned once and never
    * shuffled. */
  def epochPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = t(spark, sfDir, "documents")
    val src = docs.groupBy(col("lang"))
      .agg(sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
    val tot = src.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_langs"))
    val a1 = src.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"), col("total_tokens"),
        expr("(2 * total_tokens) DIV n_langs").as("fair"))
      .select(col("lang"), col("n_tokens"), col("total_tokens"),
        col("fair"),
        least(col("fair"), col("n_tokens") * 3).as("alloc1"),
        (col("n_tokens") * 3 > col("fair")).cast("long").as("uncapped"))
    val pool = a1.agg(
      (max(col("total_tokens")) * 2 - sum(col("alloc1"))).as("leftover"),
      sum(when(col("uncapped") === 1, col("n_tokens")).otherwise(0L))
        .as("uncapped_tokens"))
    a1.crossJoin(broadcast(pool))
      .select(col("lang"), col("n_tokens"), col("alloc1"),
        when(col("uncapped") === 1 && col("uncapped_tokens") > 0,
          least(col("n_tokens") * 3,
            col("alloc1") +
              expr("(leftover * n_tokens) DIV uncapped_tokens")))
          .otherwise(col("alloc1")).as("alloc_tokens"))
      .select(col("lang"), col("n_tokens"), col("alloc_tokens"))
      .withColumn("repeat_ppm", expr("(alloc_tokens * 1000000) DIV n_tokens"))
      .withColumn("capped", (col("repeat_ppm") >= 3000000L).cast("long"))
  }
}
