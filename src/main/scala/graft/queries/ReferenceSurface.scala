package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Knn, Packing, SimilaritySearch}

/** Reference-parity surface (SURVEY §2), text-analysis functions, the
  * similarity-search family, and the relational surface beyond the
  * reference. Split out of the former monolithic `Queries` object —
  * pure move, no semantic change.
  */
private[graft] trait ReferenceSurfaceQueries extends QueryContext {

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

  /** Product quantization ([[operators.Pq]]): every embedding encoded
    * as 8 subspace codes (8×8 dims, 64 centroids each — 48-bit codes,
    * 42× compression; parameters from the `TunePq` sweep) with its
    * exact integer reconstruction error. The gate replays the WHOLE
    * pipeline in the oracle — eight independent unrolled
    * deterministic-Lloyd chains (the q127 discipline per subspace),
    * assignment ties, and the milli² error arithmetic — so codebook
    * training, encoding, and the quality audit are all hash-pinned. */
  def pqEncode(spark: SparkSession, sfDir: String): DataFrame =
    operators.Pq.encodeWithError(t(spark, sfDir, "embeddings"),
      "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 2)

  /** PQ asymmetric-distance (ADC) top-5 — the search the codes exist
    * for: queries stay exact, the corpus side is its 48-bit codes
    * (trained on the corpus split only — queries never leak into the
    * codebooks), per-pair distance = Σ per-subspace ||q_sub −
    * centroid(code)||² in exact longs. Same broadcast-query /
    * streaming-corpus / bounded-heap plan as q21 but scanning codes
    * instead of vectors — the 42×-smaller scan IS the operator's
    * value at 100 TB. Deterministic end to end, so the gate pins the
    * SEARCH RESULTS, not just a recall summary; q164 adds the exact
    * re-rank that makes the candidates production-grade. */
  def pqAdcTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (q, coded, cbs) = pqSearchParts(spark, sfDir)
    operators.Pq.adcTopK(q, coded, cbs,
      dim = 64, topK = 5, "vec_id", "embedding")
  }

  /** PQ candidates + EXACT re-rank — the IVF-PQ deployment pattern:
    * ADC proposes a wide top-50 from the compressed scan, exact float
    * squared-Euclidean re-scores only those 50 per query, the final
    * top-5 ships. Measured by `TunePq`: recall@5 vs exact = 0.90 at
    * this bit budget where raw ADC is 0.36 — the re-rank is where PQ
    * earns its compression. The re-rank join touches 50 vectors per
    * query (not the corpus), so the full-vector relation is read
    * ~50·|Q| rows regardless of corpus size. */
  def pqRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    // candidates from the SHARED persisted index (the q165 artifact,
    // bit-equal to inline by its own gate) — the deployment reads the
    // index it already has rather than retraining codebooks per batch
    rerankTop5(spark, sfDir, q,
      operators.Pq.adcTopKFromIndex(q, pqIndexPath(spark, sfDir),
        dim = 64, topK = 50, "vec_id", "embedding"))
  }

  /** The shared exact re-rank tail of every PQ candidate path
    * (q164/q167): exact float squared-Euclidean on the ≤ width
    * candidates per query — the re-rank join touches width·|Q|
    * vectors, not the corpus — then the final top-5 with floored
    * micro distances. One definition, the gates cannot drift.
    *
    * Since round 17 the corpus side is the per-corpus ID-KEYED VECTOR
    * STORE ([[graft.operators.VectorStore]] — bucketed+sorted by
    * vec_id, built once per corpus) and the candidates side is
    * broadcast: the re-rank join carries NO corpus-side exchange (the
    * round-16 verdict's last wrong-shape plan; both no-exchange plan
    * shapes asserted in VectorStoreSpec). Same rows — the store IS
    * the embeddings relation keyed by id — so every gate that ends
    * here is hash-unchanged under its verbatim oracle. */
  private def rerankTop5(spark: SparkSession, sfDir: String, q: DataFrame,
      candidates: DataFrame): DataFrame = {
    import graft.operators.VectorStore
    VectorStore.ensure(spark, sfDir, t(spark, sfDir, "embeddings"),
      "vec_id", "embedding")
    VectorStore.rerankTopK(VectorStore.vectors(spark, sfDir), q,
      candidates, k = 5)
  }

  /** IVFADC — the COMPOSED index (q167): Lloyd-trained coarse cells
    * prune the scan to `probes/centroids` of the (×`assignments`)
    * coded corpus, residual-encoded PQ codes compress what survives
    * ~42×, exact re-rank of the wide top-50 restores production
    * recall. This is the 100 TB ANN plan both halves existed for:
    * q146 pruned cells but scanned VECTORS, q165 scanned codes but
    * ALL of them — here scan bytes ≈ corpus · (probes·assignments /
    * centroids) / 42. Parameters from the TunePq sweep
    * (32/12/2/residual → rerank50 recall@5 = 0.708 at sf0.1, ≥ the
    * q164 full-scan 0.697; on this synthetic near-uniform corpus
    * recall tracks scan fraction — no cluster structure to exploit —
    * so the sweep table in BASELINE.md is the dial, and clustered
    * real corpora prune far deeper at equal recall). Candidates come
    * from the per-corpus persisted artifact ([[ivfPqIndexPath]]); the
    * oracle replays the ENTIRE pipeline — coarse Lloyd, residual
    * quantization, eight Lloyd chains over residuals, replica
    * encoding, probe-bounded ADC, exact re-rank — so index build and
    * search are both hash-pinned. */
  def ivfPqRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    rerankTop5(spark, sfDir, q,
      operators.Pq.ivfPqCandidates(q, ivfPqIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding"))
  }

  /** The per-corpus IVF-PQ index artifact: 32 Lloyd-trained coarse
    * cells, 8×64 residual PQ codebooks, each item coded into its 2
    * nearest cells, codes partitioned by cell (one build per run; the
    * q164/q165 artifact discipline). Parameters are the TunePq
    * sweep's pick — see the q167 scaladoc. */
  private def ivfPqIndexPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    Artifacts.ensure("ivfpq_index", sfDir) { p =>
      operators.Pq.buildIvfPqIndex(
        t(spark, sfDir, "embeddings").filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 2,
        centroids = 32, path = p, assignments = 2)
    }
  }

  /** IVFADC incremental maintenance, gated (q170): the q168 move
    * applied to ANN. The standing index is built on the corpus MINUS
    * an ingest batch (vec_id % 7 = 3 of the item split), the batch is
    * then APPENDED — encoded against the standing codebooks, its code
    * files renamed into the live cell partitions
    * ([[graft.operators.Pq.appendIvfPqIndex]]) — and the search runs
    * q167's verbatim probe + re-rank over the grown index. Codebooks
    * fixed ⇒ codes are a pure projection ⇒ the appended index is
    * bit-equal to a full re-encode (the q166 argument), which the
    * independent oracle replays: codebooks trained WITHOUT the batch,
    * encoding covering old ∪ batch. At a bounded ingest rate the
    * refresh costs the BATCH share instead of `buildIvfPqIndex`'s
    * full-corpus rebuild — measured at sf1 in BASELINE.md. The search
    * also runs CHUNKED (maxQueryBatch = 32 → 2 chunks at the sf0.01
    * gate), so the enforced query-batch budget path is oracle-gated
    * end to end, not just spec-pinned. */
  def ivfPqIncrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    rerankTop5(spark, sfDir, q,
      operators.Pq.ivfPqCandidates(q, ivfPqIncrIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding",
        maxQueryBatch = 32))
  }

  /** The per-corpus incrementally-maintained IVF-PQ artifact: build
    * on the batch-less corpus, append the batch (one build+append per
    * run; the artifact discipline). */
  private def ivfPqIncrIndexPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    Artifacts.ensure("ivfpq_incr_index", sfDir) { p =>
      val items = t(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 10 =!= 0)
      operators.Pq.buildIvfPqIndex(
        items.filter(col("vec_id") % 7 =!= 3),
        "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 2,
        centroids = 32, path = p, assignments = 2)
      // tagged, like the streaming append sink always is — the tag
      // is what gives the write history an identity: q184 classifies
      // the files it names, q186 forecasts from the marker count
      // (rows are tag-independent, so q170/q183 hash unchanged)
      operators.Pq.appendIvfPqIndex(
        items.filter(col("vec_id") % 7 === 3), "vec_id", "embedding", p,
        batchTag = Some("ingest1"))
    }
  }

  /** Codebook-drift audit (q171) — the q149 pattern for the ANN
    * index, the alarm that tells q170's append path when retraining
    * is due: retrain PQ codebooks WITH vs WITHOUT the ingest batch
    * (m=4/k=16, the audit budget — the pattern is the point, and the
    * audit must stay cheap next to the index it audits), price the
    * GROWN corpus's reconstruction error under both, and decide
    * `retrain` when the standing codebooks cost > 5% more error than
    * a retrain would buy back. Pure integer throughout: recon error
    * is the exact milli² distance to the assigned (= argmin)
    * centroid, and the 5% threshold is the multiplication
    * `20·(err_standing − err_retrained) > err_retrained` — no
    * division, no rounding mode to diverge on. On this near-uniform
    * synthetic corpus a random batch barely moves the codebooks
    * (decision = keep); the alarm fires when ingest shifts the
    * embedding distribution — exactly the q161/q169 discipline. */
  def pqDriftAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Pq
    val emb = t(spark, sfDir, "embeddings")
    val grown = emb.filter(col("vec_id") % 10 =!= 0)
    val standingSrc = grown.filter(col("vec_id") % 7 =!= 3)
    val (m, k, iters) = (4, 16, 2)
    val standing = Pq.codebooks(standingSrc, "vec_id", "embedding",
      dim = 64, m = m, k = k, iters = iters)
    val retrained = Pq.codebooks(grown, "vec_id", "embedding",
      dim = 64, m = m, k = k, iters = iters)
    val eOld = Pq.encodeWith(grown, "vec_id", "embedding", 64, standing)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("recon_err")).as("err_standing"))
    val eNew = Pq.encodeWith(grown, "vec_id", "embedding", 64, retrained)
      .agg(sum(col("recon_err")).as("err_retrained"))
    eOld.crossJoin(eNew).select(
      col("n_rows"),
      col("err_standing"),
      col("err_retrained"),
      when((col("err_standing") - col("err_retrained")) * 20 >
        col("err_retrained"), lit("retrain"))
        .otherwise(lit("keep")).as("decision"))
  }

  /** Cell-occupancy audit of the incrementally-maintained IVF-PQ
    * index (q172) — the SECOND maintenance alarm, next to q171's
    * codebook drift: q170's append path grows cells in place, and a
    * drifted ingest distribution skews occupancy even while
    * per-subspace reconstruction error stays flat (codebooks can be
    * fine while the COARSE partition is not). Probe cost is
    * proportional to the probed cells' occupancy, so a hot cell
    * inflates every query that probes it and an empty cell wastes a
    * probe slot — occupancy skew IS the probe-latency forecast. One
    * row from a codes-only scan of the artifact (c_id is the
    * PARTITION column: the audit reads directory names + row counts,
    * never decoding a code): occupied/empty cell counts,
    * max/min/total rows, `skew_milli` = max·occupied·1000 DIV total
    * (1000 = perfectly balanced), and the integer decision —
    * `rebalance` when the hottest cell exceeds 4× the mean or > 25%
    * of cells sit empty. Near-uniform synthetic corpus ⇒ `keep`; the
    * alarm fires when appends concentrate, the q161/q169/q171
    * data-not-config discipline. The oracle replays cell membership
    * from q170's `rep` chain (coarse codebooks trained WITHOUT the
    * batch, replication covering old ∪ batch — replicas count, as
    * they must: each replica's codes live in its cell's files). */
  def ivfPqOccupancy(spark: SparkSession, sfDir: String): DataFrame =
    operators.Pq.occupancyAudit(spark, ivfPqIncrIndexPath(spark, sfDir))

  /** IVFADC coarse-rebalance, gated (q173) — the MIDDLE rung of the
    * maintenance ladder (q170 append < q173 rebalance < full
    * rebuild), the op the q172 occupancy alarm calls for: retrain
    * ONLY the coarse cells over the grown corpus, keep the standing
    * PQ codebooks (skipping the m per-subspace Lloyd chains that
    * dominate a full rebuild), re-encode, then run q167's verbatim
    * probe + re-rank over the re-cut tree. The standing index is
    * q170's built-then-appended artifact, so the ladder is gated end
    * to end on one lineage. The independent oracle replays the
    * asymmetry exactly: a FRESH coarse Lloyd chain over old ∪ batch
    * cuts the cells (replication, residuals, probes all against the
    * NEW centroids) while the per-subspace PQ chains still train on
    * the batch-less corpus's residuals against the OLD cells — the
    * standing-codebook caveat lives in the gate, not in prose.
    * Chunked (maxQueryBatch = 32) like q170, so the enforced
    * query-batch budget stays oracle-gated. */
  def ivfPqRebalanced(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    rerankTop5(spark, sfDir, q,
      operators.Pq.ivfPqCandidates(q, ivfPqRebalIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding",
        maxQueryBatch = 32))
  }

  /** The rebalanced per-corpus artifact: q170's incrementally-
    * maintained tree re-cut over the grown corpus by
    * [[graft.operators.Pq.rebalanceIvfPqIndex]]. */
  private def ivfPqRebalIndexPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    Artifacts.ensure("ivfpq_rebal_index", sfDir) { p =>
      operators.Pq.rebalanceIvfPqIndex(
        t(spark, sfDir, "embeddings").filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", ivfPqIncrIndexPath(spark, sfDir), p)
    }
  }

  /** ANN maintenance POLICY (q174) — the roll-up that closes the
    * maintenance loop, the q169 discipline applied to the ANN index:
    * one row electing the next maintenance op from the two measured
    * alarms, instead of a config knob or tribal knowledge. Signals:
    * q171's codebook drift (exact integer reconstruction error of the
    * grown corpus under standing vs retrained PQ codebooks) and
    * q172's occupancy skew (integer probe-latency forecast from the
    * cell partition). Decision ladder, priced in the order the ops
    * cost: `retrain` (full rebuild) when the drift test fires —
    * 20·(err_standing − err_retrained) > err_retrained, codebooks no
    * longer fit and nothing cheaper helps; else `rebalance` (q173's
    * coarse-only re-cut) when the hottest cell exceeds 4× the mean or
    * > 25 % of cells sit empty; else `append` (q170's batch-share
    * path) — the default that costs the least. Pure integer
    * throughout, both alarm chains replayed in ONE independent
    * oracle. On this near-uniform corpus with a random batch both
    * alarms stay quiet ⇒ `append` — the measured statement that the
    * cheap path is currently the right one. */
  def annMaintenancePolicy(spark: SparkSession, sfDir: String): DataFrame = {
    val centroids = operators.Pq
      .readIvfPqMeta(spark, ivfPqIncrIndexPath(spark, sfDir)).centroids
    val drift = pqDriftAudit(spark, sfDir)
      .select(col("n_rows"), col("err_standing"), col("err_retrained"))
    val occ = ivfPqOccupancy(spark, sfDir)
      .select(col("skew_milli"), col("n_cells_empty"))
    drift.crossJoin(occ).select(
      col("n_rows"), col("err_standing"), col("err_retrained"),
      col("skew_milli"), col("n_cells_empty"),
      when((col("err_standing") - col("err_retrained")) * 20 >
          col("err_retrained"), lit("retrain"))
        .when(col("skew_milli") > 4000 ||
          col("n_cells_empty") * 4 > centroids.toLong, lit("rebalance"))
        .otherwise(lit("append")).as("decision"))
  }

  /** RESIDUAL-SPACE maintenance policy (q175) — q174's refined twin,
    * built from the instrument the AnnDriftBench measurement showed
    * q174 lacks: the flat-subvector drift audit (q171) fires on ANY
    * distribution move, including pure translations that q173's
    * coarse-only rebalance fully absorbs (residuals are
    * translation-invariant; the bench measured rebalance restoring
    * recall 0.032 → 0.411 ≈ the rebuild's 0.417 at ~30 % of its
    * price while the flat audit cried retrain). This policy prices
    * the standing PQ codebooks in the representation the deployment
    * would rebalance INTO — residuals against a freshly re-cut
    * coarse over the grown corpus ([[graft.operators.Pq
    * .residualDriftAudit]]) — and elects `retrain` only when even
    * the re-cut cannot save them, `rebalance` when the q172
    * occupancy alarm fires, `append` otherwise. Same output shape as
    * q174; on this near-uniform corpus with a random batch both
    * agree on `append`, and they part ways exactly on the
    * translation events the bench measured. The oracle replays both
    * full-width coarse chains (standing AND re-cut), all eight
    * audit-budget residual Lloyd chains, both error sums, and the
    * occupancy roll-up — integer end to end. */
  def annMaintPolicyResidual(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Pq
    val centroids = 32
    val emb = t(spark, sfDir, "embeddings")
    val grown = emb.filter(col("vec_id") % 10 =!= 0)
    val old = grown.filter(col("vec_id") % 7 =!= 3)
    // both coarse codebooks already exist as artifacts: the standing
    // tree's ivf/ IS lloydCentroids(old) and the rebalanced tree's
    // ivf/ IS lloydCentroids(grown) — bit-equal by the q170/q173
    // gate contracts — so the audit reads them instead of retraining
    // two full-width Lloyd chains (13.8 → ~5 s at sf0.1)
    val standingTree = ivfPqIncrIndexPath(spark, sfDir)
    val oldCb = Pq.readIvfCb(spark, standingTree)
    val newCb = Pq.readIvfCb(spark, ivfPqRebalIndexPath(spark, sfDir))
    // the eight audit-budget residual Lloyd chains are pure corpus
    // derivatives too, so they persist as VERSIONED artifacts
    // (round-15, the q152/q164 discipline applied to the audit): the
    // gates keep trust off and rebuild per run as ever, while a
    // trust-on deployment run on an unchanged corpus pays only the
    // eval pass. Codebooks round-trip parquet as exact longs, and
    // both eval lookups are (code → centroid) maps, so on-disk order
    // cannot flip the arithmetic.
    def cbsArtifact(kind: String, items: org.apache.spark.sql.DataFrame,
        coarse: Seq[(Long, Seq[Long])]): Seq[Seq[(Long, Seq[Long])]] = {
      import graft.sources.Artifacts
      import spark.implicits._
      val p = Artifacts.ensure(kind, sfDir) { path =>
        val cbs = Pq.auditResidualCodebooks(items, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, iters = 2, coarse)
        Artifacts.publishTree(spark, path) { build =>
          cbs.zipWithIndex
            .flatMap { case (cb, s) => cb.map { case (c, cv) => (s, c, cv) } }
            .toDF("subspace", "code", "cv")
            .coalesce(1).write.parquet(s"$build/codebooks")
        }
      }
      Pq.readPqCbs(spark, p)
    }
    val drift = Pq.residualDriftAudit(old, grown, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, iters = 2, centroids = centroids,
      oldCoarse = Some(oldCb),
      newCoarse = Some(newCb),
      standingCbs = Some(cbsArtifact("resid_cbs_standing", old, oldCb)),
      retrainedCbs = Some(cbsArtifact("resid_cbs_retrained", grown, newCb)))
    val occ = Pq.occupancyAudit(spark, standingTree)
      .select(col("skew_milli"), col("n_cells_empty"))
    drift.crossJoin(occ).select(
      col("n_rows"), col("err_standing"), col("err_retrained"),
      col("skew_milli"), col("n_cells_empty"),
      when(col("residual_decision") === "retrain", lit("retrain"))
        .when(col("skew_milli") > 4000 ||
          col("n_cells_empty") * 4 > centroids.toLong, lit("rebalance"))
        .otherwise(lit("append")).as("decision"))
  }

  /** Scan-BUDGET IVFADC search, gated (q176) — the latency-SLO lever
    * the occupancy story calls for: fixed `probes` bounds the CELL
    * count, so one hot cell (q172's alarm, measured skew 7607 on the
    * drifted append) inflates every probe that touches it; a scan
    * budget bounds the ROWS scanned instead — each query walks its
    * cells in coarse-distance order and stops once the strictly-
    * preceding cells already hold `scanBudget` codes (the nearest
    * cell always probes). Worst-case probe cost is flat by
    * construction no matter how skewed the appends were, trading
    * recall exactly where the index is hottest — the dial a
    * deployment sizes to its SLO. Runs against q170's appended tree
    * (the lineage the occupancy audit watches), chunked like q170;
    * the oracle replays the budget walk as a cumulative-occupancy
    * window over the replica relation, integer end to end. */
  def ivfPqBudgetRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    rerankTop5(spark, sfDir, q,
      operators.Pq.ivfPqCandidatesBudget(q, ivfPqIncrIndexPath(spark, sfDir),
        dim = 64, topK = 50, scanBudget = 1200L, "vec_id", "embedding",
        maxQueryBatch = 32))
  }

  /** ADAPTIVE search-mode dispatch, gated (q177) — the closed loop
    * the q172 `search_mode` column exists for: read the occupancy
    * audit of the standing appended tree, then run the search in the
    * mode the alarm elects — fixed probes while the partition is
    * balanced, the q176 scan-budget walk once a hot cell would
    * inflate every fixed probe that touches it ("switch to the
    * bounded dial until the rebalance lands"). The elected mode is
    * carried as a result column. On the near-uniform gate corpus the
    * alarm deterministically says `fixed_probes`, so the oracle
    * replays the occupancy roll-up (for the carried column) plus the
    * fixed-probe walk — if a corpus change ever flipped the Spark-side
    * election, both the carried column and the result rows would
    * hash-mismatch loudly rather than silently diverge. Same lineage
    * as q170/q172/q176 (the appended tree), chunked like q170. */
  def ivfPqAdaptiveRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val path = ivfPqIncrIndexPath(spark, sfDir)
    val mode = operators.Pq.occupancyAudit(spark, path)
      .select(col("search_mode")).collect().head.getString(0)
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val cand =
      if (mode == "scan_budget")
        operators.Pq.ivfPqCandidatesBudget(q, path, dim = 64, topK = 50,
          scanBudget = 1200L, "vec_id", "embedding", maxQueryBatch = 32)
      else
        operators.Pq.ivfPqCandidates(q, path, dim = 64, topK = 50,
          probes = 12, "vec_id", "embedding", maxQueryBatch = 32)
    rerankTop5(spark, sfDir, q, cand).withColumn("search_mode", lit(mode))
  }

  /** BIT-BUDGET (resolution) audit, gated (q178) — the verdict for
    * the one maintenance outcome the ladder cannot fix. AnnDriftBench
    * measured it: on the compress ingest (mutual distances collapse
    * below PQ resolution) q175 elects `retrain`, retrain runs, and
    * recall stays ~0.02 on EVERY ladder arm — before this query that
    * dead-ended in prose, so a deployment would retrain, measure
    * nothing improved, and have no next move the system names. The
    * audit ([[graft.operators.Pq.resolutionAudit]]) runs the discrete
    * resolution test on the POST-RETRAIN representation (q167's
    * artifact tree — codebooks trained on the corpus they encode):
    * a populated cell whose rows collapse onto > 4× fewer code
    * tuples than rows holds items the CURRENT bit budget provably
    * cannot rank (same cell + same tuple ⇒ ADC distance zero), and
    * no refresh re-cuts that — `bit_budget` means escalate PAST
    * `retrain`: more bits, or the q146 exact-vector IVF path that
    * q179 wires. Integer end to end off a codes-only scan; the
    * oracle replays the full build (q167's chains) plus the per-cell
    * tuple rollup. On this corpus every evaluated cell sits at
    * 1000 milli (zero collisions) ⇒ `fit`; the drift bench shows the
    * compress rebuild at 8653 milli with 47 % of codes flagged.
    *
    * Since round 16 the census runs ONCE, at index-publish time, and
    * is STAMPED into the tree (`resolution/`,
    * [[graft.operators.Pq.resolutionStamp]]) — this query and the
    * q179/q181 dispatches read the one stamped row instead of
    * re-censusing per invocation (the verdict can only change when a
    * publish swaps the tree; the adaptive sink's scaladoc argument,
    * now honored batch-side). The oracle still replays the FULL
    * census from the raw corpus, so a stale or wrong stamp
    * hash-mismatches. */
  def annBitBudgetAudit(spark: SparkSession, sfDir: String): DataFrame =
    operators.Pq.resolutionStamp(spark, ivfPqIndexPath(spark, sfDir))

  /** EXACT-FALLBACK dispatch, gated (q179) — the wired next move for
    * the q178 verdict, q177's closed-loop pattern one rung up: read
    * the resolution audit of the standing IVFADC tree, and when it
    * says `bit_budget` — the bits cannot rank the corpus, no refresh
    * helps — serve the query batch from the EXACT-vector IVF path
    * instead (q146's artifact layout: cells store vectors, probes
    * prune files, distances are exact floats — probe-bounded cost
    * without quantization), else the normal IVFADC probe + re-rank.
    * The elected arm travels as a `search_arm` column the oracle
    * independently re-elects, so a silently flipped election
    * hash-mismatches both the column and the rows. AnnDriftBench's
    * compress scenario measures the fallback arm restoring the
    * recall every PQ arm loses. */
  def ivfPqExactFallback(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Pq
    val pqTree = ivfPqIndexPath(spark, sfDir)
    // one stamped row, not a census — the verdict was computed when
    // the tree was published (q178's scaladoc) — and CACHED on the
    // publish signature (round-16 verdict #5: a query service re-reads
    // audit metadata only when the tree moved)
    val verdict = Pq.audits.resolutionDecision(spark, pqTree)
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val arm = if (verdict == "bit_budget") "exact_ivf" else "ivfpq"
    val res =
      if (verdict == "bit_budget")
        // q146's exact-vector tree over the same corpus split — built
        // only when the verdict dispatches here (never on a healthy
        // corpus), searched with q146's parameters and output shape
        exactIvfArm(spark, sfDir)
      else
        rerankTop5(spark, sfDir, q,
          Pq.ivfPqCandidates(q, pqTree, dim = 64, topK = 50, probes = 12,
            "vec_id", "embedding"))
    res.withColumn("search_arm", lit(arm))
  }

  /** The FULL search dispatch, gated (q181) — q180's search-side
    * twin, composing BOTH live alarms into the one election a query
    * service makes per batch: the q178 resolution audit of the
    * post-retrain representation elects the ARM (`exact_ivf` when
    * the bits cannot rank the corpus — q179's escalation — else
    * `ivfpq`), and inside the ivfpq arm the q172 occupancy audit of
    * the standing APPENDED tree elects the WALK (`scan_budget` once
    * a hot cell would inflate fixed probes — q177's loop). The two
    * audits deliberately watch DIFFERENT lineages: occupancy is a
    * property of the live tree appends mutate between rebalances;
    * resolution is a property of the freshest retrained
    * representation (it cannot improve with any refresh, so it is
    * read from the tree a retrain would produce). Both elections
    * travel as columns the oracle independently re-derives — either
    * flipping silently mismatches the columns AND the rows. On the
    * gate corpus: arm `ivfpq`, mode `fixed_probes`, q170's verbatim
    * probe + re-rank.
    *
    * `rerankWidth` (round-16) is the RECALL dial the round-15
    * measurement identified — at 10⁶⁺ items recall is bound by the
    * candidate width the exact re-rank sees, not by scan share —
    * surfaced as a parameter so a deployment passes
    * [[graft.operators.Pq.sizeRerankWidth]]'s output instead of
    * editing the dispatch; the default keeps the gates at width 50
    * (hash-unchanged), and q182 gates the SIZED election.
    *
    * The escalation is THREE-rung since round 16: a `bit_budget`
    * verdict first tries the INT8 exact arm
    * ([[graft.operators.SimilaritySearch.buildIvfIndexInt8]] — byte
    * cells, 8× fewer probed bytes than float64, measured ≥ 0.90
    * recall at vec1m/vec4m and 0.747 on the compress-drift event
    * where every PQ arm sits at ~0.02), falling through to the
    * float exact arm only when the int8 tree's OWN publish-time
    * stamp says the corpus collapses below the int8 step too — the
    * same census instrument, applied per representation, electing
    * how far down the ladder a query batch must go. The stamp
    * contract is one-sided (AnnDriftBench round-16: a census that
    * CLEARS proves only distinguishability, not rank quality — the
    * m16k64 rebuild clears at recall 0.043), so the rung order is
    * fixed by MEASURED recall, and the census only decides whether
    * a rung is provably unusable. q179 deliberately keeps the
    * single maximal-certainty arm (float exact). */
  def ivfPqSearchDispatch(spark: SparkSession, sfDir: String,
      rerankWidth: Int = 50): DataFrame = {
    import operators.Pq
    // every audit read below goes through [[Pq.audits]] (round-16
    // verdict #5): the stamp and occupancy are re-collected only when
    // the tree's state signature moved — an unchanged tree costs this
    // dispatch metadata stats, not Spark jobs (spec-pinned in
    // DispatchCacheSpec)
    val arm = Pq.audits.resolutionDecision(
        spark, ivfPqIndexPath(spark, sfDir)) match {
      case "bit_budget" =>
        // walk down: int8 unless ITS stamp says the step can't rank
        val p8 = int8IvfArmPath(spark, sfDir)
        if (Pq.audits.stampDecision(spark, p8) == "fit") "exact_int8"
        else "exact_ivf"
      case _ => "ivfpq"
    }
    val res =
      if (arm == "exact_int8")
        exactInt8Arm(spark, sfDir).withColumn("search_mode", lit("exact"))
      else if (arm == "exact_ivf")
        exactIvfArm(spark, sfDir).withColumn("search_mode", lit("exact"))
      else {
        val path = ivfPqIncrIndexPath(spark, sfDir)
        val mode = Pq.audits.occupancy(spark, path).searchMode
        val emb = t(spark, sfDir, "embeddings")
        val q = emb.filter(col("vec_id") % 10 === 0)
        val cand =
          if (mode == "scan_budget")
            Pq.ivfPqCandidatesBudget(q, path, dim = 64, topK = rerankWidth,
              scanBudget = 1200L, "vec_id", "embedding", maxQueryBatch = 32)
          else
            Pq.ivfPqCandidates(q, path, dim = 64, topK = rerankWidth,
              probes = 12, "vec_id", "embedding", maxQueryBatch = 32)
        rerankTop5(spark, sfDir, q, cand).withColumn("search_mode", lit(mode))
      }
    res.withColumn("search_arm", lit(arm))
  }

  /** Width-SIZED search dispatch, gated (q182): q181 with the rerank
    * width elected by the [[graft.operators.Pq.sizeRerankWidth]] rule
    * instead of hardcoded — the deployment shape after the round-15
    * finding that width, not scan depth, is the recall lever at the
    * data-bound decade. Corpus size comes from the same split the
    * index covers; the recall target is the 500-milli point the
    * AnnRecallBench grid prices. Both rule outputs travel as columns
    * (`rerank_width_raw` — the unclamped inversion, exercising the
    * pow/ln arithmetic — and `rerank_width`, the clamped election)
    * and the oracle RE-DERIVES both from `count(*)` plus the same
    * formula, then bounds its own candidate rank by its own derived
    * width: a width-rule drift mismatches the columns, a
    * width-threading drift mismatches the rows. On the gate corpora
    * the rule lands in the CLAMP branch (a few-hundred-item corpus
    * saturates at width ≪ 50, so the floor owns the answer and the
    * result rows equal q181's at width 50); the unclamped branch is
    * property-specced ([[graft.operators.Pq.sizeRerankWidth]]) and
    * priced at the vec decade by AnnRecallBench. */
  def ivfPqSearchDispatchSized(spark: SparkSession, sfDir: String,
      calib: operators.Pq.RerankCalibration =
        operators.Pq.RerankCalibration()): DataFrame = {
    import operators.Pq
    // corpus size read off the index the ivfpq arm serves — the
    // cached occupancy snapshot's n_codes over the meta's assignments
    // (every item is replicated into exactly `assignments` cells, so
    // the division is exact) — instead of a count() that re-scans the
    // corpus filter per invocation (round-16 verdict #7); the same
    // cached row feeds the dispatch's mode election below, so an
    // unchanged tree prices this dispatch at metadata reads only
    val path = ivfPqIncrIndexPath(spark, sfDir)
    val n = Pq.audits.occupancy(spark, path).nCodes /
      math.max(1, Pq.audits.meta(spark, path).assignments)
    val target = 500L
    val raw = Pq.rerankWidthRaw(n, target, calib)
    val width = Pq.sizeRerankWidth(n, target, calib = calib)
    ivfPqSearchDispatch(spark, sfDir, rerankWidth = width.toInt)
      .withColumn("rerank_width_raw", lit(raw))
      .withColumn("rerank_width", lit(width))
  }

  /** Rerank-width CALIBRATION re-fit, gated (q185) — the round-16
    * verdict's #2: [[graft.operators.Pq.RerankCalibration]] shipped
    * one corpus's constants hardcoded, and a deployment re-fit meant
    * editing source (which would silently diverge from q182's
    * oracle). Now the fit is an operator
    * ([[graft.operators.Pq.fitRerankCalibration]] — the BASELINE.md
    * closed-form 2×2 recipe as fixed-order arithmetic), the constants
    * are a VERSIONED one-row artifact
    * ([[graft.operators.Pq.publishRerankCalibration]], read back by
    * [[graft.operators.Pq.readRerankCalibration]] and accepted by the
    * sized dispatch's `calib` parameter), and this gate round-trips
    * the whole loop: fit the canonical measured grid (the round-15/16
    * AnnRecallBench table: width {50,400} × corpus {921600, 3686400},
    * recall milli {255,563,184,455}), publish, READ BACK, and carry
    * the artifact's constants (micro-floored) plus the widths the
    * re-read calibration elects at the calibrated decade. The oracle
    * re-derives every column from the same grid LITERALS with the
    * same fixed-order ln/exp arithmetic — a drifted fit, a lossy
    * artifact round-trip, or a broken inversion all hash-mismatch.
    * (The fitted constants differ from the shipped hand-rounded
    * defaults in the 4th decimal; the elected widths agree at 921k
    * and differ by one candidate at 3.69M — 541 vs 540, a raw
    * solution 0.03 from the boundary, recall-immaterial —
    * CalibrationSpec pins both elections, which is why q182 can keep
    * the defaults.) */
  def rerankCalibrationFit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    import operators.Pq
    val grid = Seq((50L, 921600L, 255L), (400L, 921600L, 563L),
      (50L, 3686400L, 184L), (400L, 3686400L, 455L))
    val path = Artifacts.ensure("rerank_calibration", sfDir) { p =>
      Pq.publishRerankCalibration(spark, grid, p)
    }
    val calib = Pq.readRerankCalibration(spark, path)
    import spark.implicits._
    Seq((grid.size.toLong,
        math.floor(calib.c * 1000000.0).toLong,
        math.floor(calib.beta * 1000000.0).toLong,
        math.floor(calib.gamma * 1000000.0).toLong,
        Pq.sizeRerankWidth(921600L, 500L, calib = calib),
        Pq.sizeRerankWidth(3686400L, 500L, calib = calib)))
      .toDF("n_grid", "c_micro", "beta_micro", "gamma_micro",
        "width_1m", "width_4m")
  }

  /** Compaction CADENCE election, gated rows-only (q186) — the
    * round-16 verdict's #4: q184 says compact/keep about the standing
    * tree; this closes the loop with WHEN, forecasting from the
    * tree's own write history (committed markers = batches,
    * tag-prefixed files = what they added) how many more append
    * batches until the small-files threshold crosses
    * ([[graft.operators.Pq.compactionCadence]] — integers off one
    * metadata listing, no Spark job). Runs on q170's live appended
    * artifact, same as q184. No DuckDB oracle BY CONSTRUCTION — same
    * contract as q184: every input is write history (file counts,
    * marker counts), not corpus; SQL replaying the rows lands them in
    * its own layout with no history at all. IvfPqSpec pins the
    * decision branches; the streaming append sink surfaces the same
    * election per micro-batch (StreamingSpec pins the flip). */
  def ivfPqCompactionCadence(spark: SparkSession, sfDir: String): DataFrame =
    operators.Pq.compactionCadence(spark, ivfPqIncrIndexPath(spark, sfDir))

  /** COMPACTED-index search, gated (q183) — q170's appended tree
    * rewritten by [[graft.operators.Pq.compactIvfPqIndex]] to one
    * file per cell, then q167's verbatim probe + re-rank over the
    * compacted tree. Compaction changes file boundaries, not rows,
    * so the gate is BIT-EQUALITY: the oracle is q170's full
    * independent replay (train-without-batch, encode old ∪ batch,
    * probe, re-rank) — any row compaction drops (an orphan-filter
    * bug), duplicates (a marker-carry bug), or re-encodes (it must
    * never) mismatches. The small-files LATENCY claim that motivates
    * the operator is measured by IvfPqCompactBench at the vec
    * decade, not asserted here. */
  def ivfPqCompacted(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    rerankTop5(spark, sfDir, q,
      operators.Pq.ivfPqCandidates(q, ivfPqCompactIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding",
        maxQueryBatch = 32))
  }

  /** The compacted per-corpus artifact: q170's incrementally-
    * maintained tree, compacted. */
  private def ivfPqCompactIndexPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    Artifacts.ensure("ivfpq_compact_index", sfDir) { p =>
      operators.Pq.compactIvfPqIndex(spark,
        ivfPqIncrIndexPath(spark, sfDir), p)
    }
  }

  /** FILE-LAYOUT audit of the live appended tree (q184) — the
    * small-files alarm ([[graft.operators.Pq.fileAudit]]) on q170's
    * artifact: one metadata-only row classifying every code file by
    * the append commit protocol and electing `compact` when the
    * listing would shrink ≥ 4×. No DuckDB oracle BY CONSTRUCTION:
    * file layout is a property of the write history, not of the
    * corpus — the same rows replayed by SQL land in whatever layout
    * the replaying engine picks, so there is nothing corpus-derived
    * to compare against. The driver's rows-only check plus
    * IvfPqSpec's decision-branch specs gate it; q183 gates the
    * operator the alarm dispatches to. */
  def ivfPqFileAudit(spark: SparkSession, sfDir: String): DataFrame =
    operators.Pq.fileAudit(spark, ivfPqIncrIndexPath(spark, sfDir))

  /** Incrementally-maintained VECTOR STORE, gated (q187) — the
    * lockstep axis the round-17 store opened: the store is a SECOND
    * corpus-derived artifact beside the index, and q170's ingest
    * story is only complete when BOTH absorb the batch — an appended
    * index re-ranked against a stale store silently DROPS the
    * appended items from top-k (the re-rank join is inner; no error,
    * just missing neighbors — VectorStoreSpec pins the failure mode).
    * This gate runs q170's verbatim candidates (the appended index)
    * but re-ranks against a store built on the corpus MINUS the
    * ingest batch and then grown by
    * [[graft.operators.VectorStore.appendVectors]] (the index
    * append's protocol: staged bucketed files renamed in, tag marker
    * committed last) — and shares q170's oracle VERBATIM: a dropped
    * append, a duplicated replay, or a bucket-id mismatch between the
    * staged and live layouts all hash-mismatch against the same
    * ground truth. */
  def ivfPqIncrStoreRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.{Pq, VectorStore}
    val emb = t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val key = incrVectorStoreKey(spark, sfDir)
    VectorStore.rerankTopK(spark.table(VectorStore.tableName(key)), q,
      Pq.ivfPqCandidates(q, ivfPqIncrIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding",
        maxQueryBatch = 32),
      k = 5)
  }

  /** The incrementally-maintained store lineage shared by
    * q187/q188/q189: base = corpus minus the `% 7 = 3` ingest batch,
    * then the ingest batch through the composed
    * [[graft.operators.VectorStore.lockstepAppend]] — which pins the
    * CROSS-ARTIFACT ORDERING CONTRACT in the gate path itself: store
    * FIRST, then index, one shared tag (round-18; a crash between the
    * halves must leave the harmless store-ahead regime — extra
    * vectors the index cannot yet name as candidates — never
    * index-ahead, whose candidates silently vanish from top-k). The
    * index half short-circuits here by construction: q170's artifact
    * is built WITH its `ingest1` append (marker carried by the
    * publish), so the composed call exercises the order and the
    * shared-tag idempotence without double-applying. Ensure is
    * JVM-memoized and the tagged store append short-circuits on its
    * marker, so repeat callers pay metadata. */
  private def incrVectorStoreKey(spark: SparkSession, sfDir: String): String = {
    import operators.VectorStore
    val emb = t(spark, sfDir, "embeddings")
    val key = sfDir + "#vecstore_incr"
    VectorStore.ensure(spark, key,
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding")
    VectorStore.lockstepAppend(spark, key,
      ivfPqIncrIndexPath(spark, sfDir),
      emb.filter(col("vec_id") % 7 === 3), "vec_id", "embedding",
      batchTag = "ingest1")
    key
  }

  /** Vector-store FILE-LAYOUT audit, gated rows-only (q188) — the
    * q184 instrument for the OTHER aging artifact: runs
    * [[graft.operators.VectorStore.storeAudit]] on q187's
    * incrementally-appended store (base build + one tagged ingest
    * batch), so the gate row carries a real append history —
    * `sorted_scan = forfeited` (the first append costs the merge-join
    * regime its sort-free scan) and the rebuild/keep election. Same
    * no-oracle contract as q184/q186: every input is write history;
    * the decision branches are spec-pinned in VectorStoreSpec and the
    * repair (re-ensure = one corpus shuffle) is the same operator the
    * build gate exercises. */
  def vecStoreAudit(spark: SparkSession, sfDir: String): DataFrame =
    operators.VectorStore.storeAudit(spark, incrVectorStoreKey(spark, sfDir))

  /** Vector-store REBUILD-cadence forecast, gated rows-only (q189) —
    * the q186 instrument for the store's own aging: runs
    * [[graft.operators.VectorStore.storeCadence]] on q187's
    * incrementally-appended store, so the gate row carries a real
    * append history (one committed batch, its tag-prefixed files, a
    * finite `batches_to_threshold` horizon toward the factor-4
    * rebuild line). Same no-oracle contract as q184/q186/q188: batch
    * count = commit markers, growth rate = tag-prefixed file counts —
    * pure write history a SQL replay cannot see. Decision branches
    * spec-pinned in VectorStoreSpec; the dispatched-to repair is
    * [[graft.operators.VectorStore.ensure]]'s rebuild, the same
    * operator every store gate exercises. */
  def vecStoreCadence(spark: SparkSession, sfDir: String): DataFrame =
    operators.VectorStore.storeCadence(spark, incrVectorStoreKey(spark, sfDir))

  /** Vector-store BUCKET-COUNT sizing rule, gated (q190) —
    * [[graft.operators.VectorStore.sizeBuckets]] on the embeddings
    * corpus at a 64 KiB target file size (a deployment's 128 MB
    * target elects 1 bucket on every test corpus — the gate's small
    * target exercises the ceil-division and clamps on real counts).
    * Fully corpus-derived — count, max vector width, the integer
    * payload model, the clamped ceil division — so unlike the
    * write-history audits this sizing rule has a REAL oracle. */
  def storeSizing(spark: SparkSession, sfDir: String): DataFrame =
    operators.VectorStore.sizeBuckets(t(spark, sfDir, "embeddings"),
      "embedding", targetFileBytes = 64L << 10)

  /** PRUNED re-rank plan, oracle-hash-gated (q191) — the round-18
    * verdict's #2: the deployment-DEFAULT store plan (≥ 256 buckets →
    * candidate-id isin pushdown → Spark bucket pruning) was
    * spec-pinned bit-equal and A/B-benched, but every CORRECTNESS
    * gate store sat at 32 buckets, below the dial — so the plan a
    * 100 TB deployment actually runs had never been through the
    * DuckDB hash. This gate rebuilds the tail of q170 over a store
    * bucketed ABOVE `minPruneBuckets` and a query batch narrow
    * enough that the prune dial engages (|ids| ≤ buckets/2), then
    * REQUIRES the pruned scan in its own physical plan
    * (`SelectedBucketsCount` strictly between 0 and the bucket
    * count) — a silently-disengaged dial fails the gate rather than
    * quietly hash-matching through the full-scan plan.
    *
    * Bucket count: q190's sizing arithmetic ([[graft.operators
    * .VectorStore.sizeBuckets]]) at a gate-scale 128-BYTE target file
    * (a deployment's 128 MB target at the 100 TB corpus elects ~400k
    * buckets — the gate scales the target down so the elected count
    * stands in the same relation to the candidate width: thousands of
    * buckets vs hundreds of ids), floored at 2·`minPruneBuckets` so
    * the dial engages at every test scale. Queries are q170's
    * `% 100 = 0` SUBSET (q170 probes `% 10 = 0`), so the oracle is
    * q170's verbatim replay filtered to the subset's query ids — per
    * query, probe + re-rank are functions of the query vector and the
    * index alone, so the subset's rows are exactly the filtered
    * superset's. */
  def vecStorePrunedRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.{Pq, VectorStore}
    val emb = t(spark, sfDir, "embeddings")
    val sized = VectorStore.sizeBuckets(emb, "embedding",
      targetFileBytes = 128L).collect().head.getAs[Long]("n_buckets")
    val buckets = math.max(512L, sized).toInt
    val key = sfDir + "#vecstore_pruned"
    val name = VectorStore.ensure(spark, key, emb, "vec_id", "embedding",
      buckets = buckets)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val out = VectorStore.rerankTopK(spark.table(name), q,
      Pq.ivfPqCandidates(q, ivfPqIncrIndexPath(spark, sfDir),
        dim = 64, topK = 50, probes = 12, "vec_id", "embedding",
        maxQueryBatch = 32),
      k = 5)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(out.queryExecution.executedPlan.toString)
    require(sel.exists(m =>
      m.group(1).toInt > 0 && m.group(1).toInt < m.group(2).toInt),
      s"q191 must run the PRUNED store scan (got " +
        s"${sel.map(_.matched).getOrElse("no SelectedBucketsCount")} " +
        s"at $buckets buckets) — the dial disengaged, so the gate " +
        s"would hash-match through the wrong plan")
    out
  }

  /** The exact-vector arm shared by q179 and q181 — q146's layout
    * over the same corpus split, built only when dispatched to. */
  private def exactIvfArm(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Artifacts
    import operators.SimilaritySearch
    val emb = t(spark, sfDir, "embeddings")
    val path = Artifacts.ensure("ivf_exact_fallback", sfDir) { p =>
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

  /** The INT8 exact tree for q181's middle rung — [[exactIvfArm]]'s
    * corpus split and probe shape with byte cells; built (and its
    * resolution stamped) only when the PQ verdict dispatches past
    * ivfpq. */
  private def int8IvfArmPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    import operators.SimilaritySearch
    val emb = t(spark, sfDir, "embeddings")
    Artifacts.ensure("ivf_int8_fallback", sfDir) { p =>
      Artifacts.publishTree(spark, p) { build =>
        SimilaritySearch.buildIvfIndexInt8(
          emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
          centroids = 64, assignments = 2, build)
      }
    }
  }

  /** q181's `exact_int8` rung: probe the byte cells, dequantized
    * distances floored to micros — [[exactIvfArm]]'s output shape. */
  private def exactInt8Arm(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.SimilaritySearch
    val emb = t(spark, sfDir, "embeddings")
    SimilaritySearch.ivfTopKFromIndexInt8(
        emb.filter(col("vec_id") % 10 === 0),
        int8IvfArmPath(spark, sfDir), k = 5,
        "vec_id", "embedding", probes = 16)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_micro"))
  }

  /** The FULL maintenance ladder, gated (q180) — q175's refresh
    * policy extended with q178's bit-budget verdict into one
    * four-rung election: `exact_fallback` when the resolution audit
    * says the bits cannot rank even the post-retrain representation
    * (AnnDriftBench measured that event at recall ~0.02 on EVERY
    * refresh arm, 0.998 on the exact arm — no refresh buys it back,
    * so it outranks `retrain`), else q175's `retrain` > `rebalance`
    * > `append`. Both sub-elections travel as columns
    * (`refresh_decision`, `resolution_decision`) so the final call is
    * explainable from its own row; the oracle composes the two full
    * replay chains as WITH-scoped derived tables and re-elects
    * independently. One row — THE maintenance query a deployment
    * schedules. */
  def annMaintLadder(spark: SparkSession, sfDir: String): DataFrame = {
    val refresh = annMaintPolicyResidual(spark, sfDir)
      .withColumnRenamed("decision", "refresh_decision")
    val resolution = annBitBudgetAudit(spark, sfDir)
      .select(col("n_cells_flagged"), col("max_tuple_load_milli"),
        col("decision").as("resolution_decision"))
    refresh.crossJoin(resolution)
      .withColumn("decision",
        when(col("resolution_decision") === "bit_budget",
          lit("exact_fallback"))
          .otherwise(col("refresh_decision")))
  }

  /** q163's ADC search served from a PERSISTED PQ index — the q146/
    * q152/q155 artifact discipline applied to the compressed-corpus
    * relation: build once per corpus (codebooks + codes,
    * atomically published), probe per query batch from the 42×-smaller
    * parquet scan. Shares q163's oracle VERBATIM, so any index
    * round-trip drift is a hash flip against the same ground truth. */
  def pqAdcPersisted(spark: SparkSession, sfDir: String): DataFrame = {
    import operators.Pq
    val emb = t(spark, sfDir, "embeddings")
    Pq.adcTopKFromIndex(emb.filter(col("vec_id") % 10 === 0),
      pqIndexPath(spark, sfDir), dim = 64, topK = 5, "vec_id", "embedding")
  }

  /** The per-corpus PQ index artifact (one build per run, shared by
    * q164/q165 — one definition, the gates cannot drift). */
  private def pqIndexPath(spark: SparkSession, sfDir: String): String = {
    import graft.sources.Artifacts
    Artifacts.ensure("pq_index", sfDir) { p =>
      operators.Pq.buildIndex(
        t(spark, sfDir, "embeddings").filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 2, p)
    }
  }

  /** Shared q163 pieces: the query split, the coded corpus, and the
    * corpus-trained codebooks (inline — q163 is the DEFINITION the
    * persisted q165 is gated against). */
  private def pqSearchParts(spark: SparkSession, sfDir: String) = {
    import operators.Pq
    val emb = t(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding",
      dim = 64, m = 8, k = 64, iters = 2)
    val coded = Pq.encodeWith(corpus, "vec_id", "embedding", 64, cbs)
      .select(col("vec_id") +: (0 until 8).map(s => col(s"code$s")): _*)
    (emb.filter(col("vec_id") % 10 === 0), coded, cbs)
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

}
