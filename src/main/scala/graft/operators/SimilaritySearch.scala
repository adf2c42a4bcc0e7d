package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column — brute-force exact top-k
  * as the baseline, random-hyperplane LSH bucketing as the
  * approximate scale path.
  *
  * The reference engine's KNN (Hadoop.java) *is* brute-force similarity
  * search specialized to squared-Euclidean + majority vote; [[Knn.knnJoin]]
  * generalizes it to any metric. This module adds the
  * approximate path a 100 TB corpus needs: exact scoring only inside
  * LSH buckets, so compute is O(rows × bucket width), not O(rows²).
  */
object SimilaritySearch {

  /** Exact cosine top-k: brute force over all items per query
    * (BroadcastNestedLoopJoin + bounded top-k aggregation — see
    * [[Knn.knnJoin]] for the physical shape).
    * @return (query_id, rank, neighbor_id, neighbor_label, dist) where
    *         dist = 1 − cosine similarity
    */
  def cosineTopK(
      queries: DataFrame,
      items: DataFrame,
      k: Int,
      queryId: String,
      itemId: String,
      queryVec: String,
      itemVec: String): DataFrame =
    Knn.knnJoin(queries, items, k, queryId, itemId, queryVec, itemVec,
      metric = "cosine")

  /** Deterministic pseudo-random unit-ish hyperplane component: a value
    * in [−0.5, 0.5) derived from (plane, dim) by integer hashing — both
    * engines (and any re-run) regenerate the identical planes, no RNG
    * state to ship (see
    * [[graft.functions.HyperplaneSignatureExpr.planeComponent]]).
    */
  private[operators] def planeComponent(plane: Int, dim: Int): Double =
    graft.functions.HyperplaneSignatureExpr.planeComponent(plane, dim)

  /** Random-hyperplane (SRP) signature: bit p of the result is 1 iff
    * `vec · plane_(planeOffset+p) ≥ 0`. Cosine-similar vectors agree on
    * most bits. One fused codegen loop over the vector with all plane
    * dots accumulated per element
    * ([[graft.functions.HyperplaneSignatureExpr]]); the interpreted
    * `zip_with`+`aggregate` twin is kept as [[hyperplaneSignatureHof]]
    * for the bit-equality spec. `planeOffset` selects an independent
    * plane set per LSH table.
    */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int, planeOffset: Int = 0): Column =
    graft.functions.SignatureExprs.hyperplaneSignature(vec, planes, dim, planeOffset)

  /** Declarative HOF twin of [[hyperplaneSignature]] — the executable
    * spec of the native expression (bit-equality test-enforced; FP fold
    * order per plane is element-index order in both).
    */
  private[graft] def hyperplaneSignatureHof(vec: Column, planes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val v = vec.cast("array<double>")
    (0 until planes).map { p =>
      val plane = typedLit((0 until dim).map(d => planeComponent(planeOffset + p, d)))
      val dot = aggregate(
        zip_with(v, plane, (x, c) => x * c), lit(0.0), (acc, t) => acc + t)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF-flat approximate top-k (squared-Euclidean): the second ANN
    * scale path next to hyperplane LSH ([[approxCosineTopK]]).
    *
    *  - **Coarse centroids**: `centroids` item vectors picked by
    *    deterministic content-hash order ([[Sampling.bucket]]) — no
    *    k-means RNG, so any engine (and the DuckDB oracle) regenerates
    *    the identical codebook. Sampled-centroid IVF trades a little
    *    cluster balance for full reproducibility. The codebook is
    *    collected to the driver (O(centroids·dim) — definitionally
    *    tiny; IVF codebook "training" is always a separate small job)
    *    and inlined as literal expressions.
    *  - **Assignment**: nearest centroid is a pure PER-ROW projection —
    *    `array_min` over the (dist, centroidId) structs against the
    *    codebook literals (argmin by lexicographic (dist, id) — total
    *    order). Zero exchange: the corpus is scanned once and never
    *    shuffled for assignment.
    *  - **Probing**: each query ranks the same codebook literals
    *    (sort + slice, again per-row) and searches the `probes`
    *    nearest inverted lists. The probed relation (queries × probes
    *    rows) is BROADCAST into the search join, so the corpus side
    *    streams through unpartitioned — the join is never keyed by the
    *    `centroids` distinct centroid ids (which would cap parallelism
    *    at `centroids` tasks and skew-kill a 100 TB run).
    *  - **Multi-assignment** (`assignments` > 1): each item is
    *    replicated into its `assignments` nearest inverted lists, the
    *    standard recall lever for lossy cell boundaries (a true
    *    neighbor straddling two cells is findable through either).
    *    Index size and corpus-side scan both grow ×`assignments`; the
    *    scan fraction is `probes·assignments / centroids`. A pair can
    *    then meet in up to min(assignments, probes) cells, so the
    *    candidate relation is de-duplicated (one extra
    *    candidate-sized exchange, only paid when `assignments` > 1).
    *
    * Scale shape: the only corpus-sized exchanges are the bounded
    * top-k partial aggregation (map-side partials, O(k) per query per
    * partition) and — under multi-assignment — the candidate de-dup.
    * Recall < 1 by construction (a true neighbor assigned only to
    * unprobed lists is missed); raise `probes` or `assignments` for
    * recall, `centroids` for selectivity.
    *
    * @return (query_id, rank, neighbor_id, dist) — dist = Σ(aᵢ−bᵢ)²
    */
  def ivfTopK(
      queries: DataFrame,
      items: DataFrame,
      k: Int,
      queryId: String,
      itemId: String,
      queryVec: String,
      itemVec: String,
      centroids: Int = 16,
      probes: Int = 2,
      assignments: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= centroids)
    require(assignments >= 1 && assignments <= centroids)
    graft.GraftSession.tune(queries.sparkSession)

    val it = items.select(col(itemId).cast("long").as("i_id"), col(itemVec).as("i_vec"))
    val q = queries.select(col(queryId).cast("long").as("q_id"), col(queryVec).as("q_vec"))
    val codebook = deriveCodebook(it, centroids)
    ivfSearch(q, assignItems(it, codebook, assignments), codebook,
      k, probes, dedupCells = assignments > 1)
  }

  /** Deterministic codebook: first `centroids` items in content-hash
    * order (ties by id); collected — a TakeOrdered job over the items
    * scan — and inlined as literals by the consumers. */
  private[operators] def deriveCodebook(
      it: DataFrame, centroids: Int): Seq[(Long, Seq[Double])] =
    it.orderBy(Sampling.bucket(col("i_id"), 1000003), col("i_id"))
      .limit(centroids)
      .select(col("i_id").as("c_id"), col("i_vec").cast("array<double>").as("c_vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq

  /** (dist, centroid id) structs against the codebook literals — a
    * per-row expression, no join. */
  private[operators] def centroidScores(
      vec: Column, codebook: Seq[(Long, Seq[Double])]): Column =
    array(codebook.map { case (cid, cvec) =>
      struct(
        VectorFunctions.squaredEuclidean(vec, typedLit(cvec)).as("d"),
        lit(cid).as("c"))
    }: _*)

  /** Assignment: argmin by lexicographic (d, c) — pure projection;
    * multi-assignment replicates each item into its `assignments`
    * nearest lists (same total order, sort + slice per row). */
  private def assignItems(it: DataFrame, codebook: Seq[(Long, Seq[Double])],
      assignments: Int): DataFrame = {
    val effAssign = math.min(assignments, codebook.size)
    if (effAssign == 1)
      it.select(col("i_id"), col("i_vec"),
        array_min(centroidScores(col("i_vec"), codebook)).getField("c").as("c_id"))
    else
      it.select(col("i_id"), col("i_vec"),
          explode(slice(array_sort(centroidScores(col("i_vec"), codebook)), 1, effAssign))
            .as("cs"))
        .select(col("i_id"), col("i_vec"), col("cs.c").as("c_id"))
  }

  /** Probe + exact-search the assigned lists: the `probes` nearest
    * cells per query (same total order as assignment), broadcast of
    * the small probed relation, corpus streams through, bounded-heap
    * top-k. `dedupCells` collapses pairs that met in several cells
    * (multi-assignment). */
  private def ivfSearch(q: DataFrame, assigned: DataFrame,
      codebook: Seq[(Long, Seq[Double])], k: Int, probes: Int,
      dedupCells: Boolean): DataFrame = {
    val effProbes = math.min(probes, codebook.size)
    val probed = q.select(col("q_id"), col("q_vec"),
        explode(slice(array_sort(centroidScores(col("q_vec"), codebook)), 1, effProbes))
          .as("cs"))
      .select(col("q_id"), col("q_vec"), col("cs.c").as("c_id"))
    val scored0 = assigned.join(broadcast(probed), "c_id")
      .select(col("q_id"),
        VectorFunctions.squaredEuclidean(col("q_vec"), col("i_vec")).as("dist"),
        col("i_id"))
    val scored =
      if (!dedupCells) scored0
      else scored0.groupBy(col("q_id"), col("i_id")).agg(min(col("dist")).as("dist"))
    scored
      .groupBy(col("q_id"))
      .agg(TopK.topK(k)(col("dist"), col("i_id"), col("i_id")).as("nbrs"))
      .select(col("q_id"), posexplode(col("nbrs")).as(Seq("pos", "n")))
      .select(
        col("q_id").as("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"),
        col("n.dist").as("dist"))
  }

  /** Persist the IVF index as a parquet ARTIFACT — the build-once /
    * probe-many deployment shape an ANN service actually runs at
    * 100 TB (re-deriving codebook + assignments per query batch, as
    * [[ivfTopK]] does for the oracle gate, re-pays the full corpus
    * scan every time). Two relations under `path`: `codebook/`
    * (c_id, c_vec — `centroids` rows) and `assigned/` (i_id, i_vec,
    * c_id — corpus-sized, PARTITIONED BY c_id so a probe touches only
    * its cells' files: partition pruning is what makes the persisted
    * index cheaper than the inline path, not just amortization).
    * Parquet round-trips float/double arrays bit-exactly, so
    * [[ivfTopKFromIndex]] is bit-equal to [[ivfTopK]] at the same
    * parameters ([[IvfIndexSpec]] + the q146 oracle, which is q39's
    * verbatim — the q54/q58 shared-oracle contract). */
  def buildIvfIndex(items: DataFrame, itemId: String, itemVec: String,
      centroids: Int, assignments: Int, path: String): Unit = {
    require(centroids >= 1, "centroids must be >= 1")
    require(assignments >= 1 && assignments <= centroids,
      "assignments must be in [1, centroids]")
    import items.sparkSession.implicits._
    val it = items.select(col(itemId).cast("long").as("i_id"), col(itemVec).as("i_vec"))
    val codebook = deriveCodebook(it, centroids)
    codebook.toDF("c_id", "c_vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    assignItems(it, codebook, assignments)
      .write.mode("overwrite").partitionBy("c_id").parquet(s"$path/assigned")
  }

  /** Search a [[buildIvfIndex]] artifact. The codebook (a few KB) is
    * collected and inlined as literals exactly like the inline path;
    * the assigned relation is scanned with its c_id partition column,
    * so the probe join prunes to the probed cells' files. */
  def ivfTopKFromIndex(queries: DataFrame, path: String, k: Int,
      queryId: String, queryVec: String, probes: Int,
      dedupCells: Boolean = true): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    require(k >= 1, "k must be >= 1")
    val spark = queries.sparkSession
    graft.GraftSession.tune(spark)
    val codebook: Seq[(Long, Seq[Double])] =
      spark.read.parquet(s"$path/codebook")
        .orderBy(col("c_id")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val assigned = spark.read.parquet(s"$path/assigned")
      .select(col("i_id"), col("i_vec"), col("c_id").cast("long").as("c_id"))
    val q = queries.select(col(queryId).cast("long").as("q_id"),
      col(queryVec).as("q_vec"))
    ivfSearch(q, assigned, codebook, k, probes, dedupCells)
  }

  /** INT8-quantized exact-vector IVF index — the middle rung between
    * the IVFADC codes (48 bits/item, quantization bounds recall) and
    * the full exact-vector arm (512 bytes/item at float64 cells,
    * 5–9× IVFADC probe latency at the vec decade): cells store each
    * vector as `dim` bytes under ONE global symmetric scale
    * (`q = floor(x · 127/absMax + 0.5)`), cutting probed bytes 8×
    * against the float64 cells while keeping distances
    * per-coordinate-faithful to within half a step — on corpora
    * whose neighbor gaps exceed `absMax/127` the ranking is
    * near-exact (AnnDriftBench/AnnRecallBench price exactly that).
    * The coarse codebook and assignment are [[buildIvfIndex]]'s
    * verbatim, so cell pruning (and its recall loss) is IDENTICAL to
    * the float arm: the two arms differ only in stored bytes.
    *
    * Tree: `codebook/` (float cells, probe ranking), `scale/` (one
    * row: absMax, dim), `assigned/` (i_id, i_q array<tinyint>,
    * partitioned by c_id), and `resolution/` — the SAME bit-budget
    * census the PQ tree stamps ([[Pq.resolutionCensus]] over the
    * quantized tuples): a corpus whose mutual distances collapse
    * below the int8 step quantizes onto few distinct byte tuples,
    * and the stamp says so at publish — the dispatch's signal that
    * this rung, too, cannot rank the corpus and the full exact arm
    * is the remaining move. Global (not per-dim) scale keeps the
    * integer distance exactly `real/(absMax/127)²`-proportional, so
    * ranking by the byte-array distance IS ranking by the
    * dequantized distance. */
  def buildIvfIndexInt8(items: DataFrame, itemId: String, itemVec: String,
      centroids: Int, assignments: Int, path: String): Unit = {
    require(centroids >= 1, "centroids must be >= 1")
    require(assignments >= 1 && assignments <= centroids,
      "assignments must be in [1, centroids]")
    import items.sparkSession.implicits._
    val it = items.select(col(itemId).cast("long").as("i_id"),
      col(itemVec).as("i_vec"))
    val codebook = deriveCodebook(it, centroids)
    val absMax = it.agg(max(greatest(
        abs(array_max(col("i_vec").cast("array<double>"))),
        abs(array_min(col("i_vec").cast("array<double>"))))))
      .collect().head.getDouble(0)
    require(absMax > 0.0,
      s"buildIvfIndexInt8: corpus absMax=$absMax — an all-zero corpus " +
        "has no scale to quantize against")
    Seq(absMax).toDF("abs_max")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/scale")
    codebook.toDF("c_id", "c_vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    val assigned = assignItems(it, codebook, assignments)
      .select(col("i_id"), int8Quantize(col("i_vec"), absMax).as("i_q"),
        col("c_id"))
    assigned.write.mode("overwrite").partitionBy("c_id")
      .parquet(s"$path/assigned")
    // the bit-budget census at THIS representation, stamped at
    // publish like the PQ tree's (one distinct-quantized-tuple
    // rollup per cell)
    graft.operators.Pq.resolutionCensus(
        items.sparkSession.read.parquet(s"$path/assigned"),
        Seq(col("i_q")), graft.operators.Pq.ResolutionMinCell,
        graft.operators.Pq.ResolutionLoadFactor)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/resolution")
  }

  /** `floor(x · 127/absMax + 0.5)` per coordinate, SATURATED to
    * [−127, 127], cast to byte — round-half-up symmetric
    * quantization. Corpus values satisfy |x| ≤ absMax by the scale's
    * definition, but QUERY vectors are foreign (the corpus split
    * excludes them) and may overshoot the corpus range — saturating
    * them is the standard int8 contract (a coordinate beyond the
    * corpus's range is "maximally far" at this resolution, which is
    * all the ranking needs). A build-time / query-side one-pass
    * projection, so the HOF is fine here (the PROBE hot path reads
    * the bytes natively). */
  private def int8Quantize(vec: Column, absMax: Double): Column =
    transform(vec.cast("array<double>"),
      x => greatest(lit(-127.0), least(lit(127.0),
        floor(x * lit(127.0 / absMax) + lit(0.5)))).cast("byte"))

  /** Search a [[buildIvfIndexInt8]] artifact: coarse probe ranking on
    * the FLOAT query against the float codebook (identical cell
    * pruning to the float arm), then the byte-array native distance
    * over the probed cells — 8× fewer scanned bytes — dequantized at
    * the end (`dist = int_dist · (absMax/127)²`) so the output is in
    * corpus units. The returned dist is the QUANTIZED-space distance
    * in corpus units, not the exact float distance — callers wanting
    * exact top-k re-rank the top candidates like every PQ arm. */
  def ivfTopKFromIndexInt8(queries: DataFrame, path: String, k: Int,
      queryId: String, queryVec: String, probes: Int,
      dedupCells: Boolean = true): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    require(k >= 1, "k must be >= 1")
    val spark = queries.sparkSession
    graft.GraftSession.tune(spark)
    val codebook: Seq[(Long, Seq[Double])] =
      spark.read.parquet(s"$path/codebook")
        .orderBy(col("c_id")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val absMax = spark.read.parquet(s"$path/scale")
      .collect().head.getDouble(0)
    val step2 = (absMax / 127.0) * (absMax / 127.0)
    val assigned = spark.read.parquet(s"$path/assigned")
      .select(col("i_id"), col("i_q"), col("c_id").cast("long").as("c_id"))
    val effProbes = math.min(probes, codebook.size)
    val q0 = queries.select(col(queryId).cast("long").as("q_id"),
      col(queryVec).as("q_vec"))
    val probed = q0.select(col("q_id"), col("q_vec"),
        explode(slice(array_sort(centroidScores(col("q_vec"), codebook)),
          1, effProbes)).as("cs"))
      .select(col("q_id"), int8Quantize(col("q_vec"), absMax).as("q_q"),
        col("cs.c").as("c_id"))
    val scored0 = assigned.join(broadcast(probed), "c_id")
      .select(col("q_id"),
        VectorFunctions.squaredEuclidean(col("q_q"), col("i_q")).as("dist"),
        col("i_id"))
    val scored =
      if (!dedupCells) scored0
      else scored0.groupBy(col("q_id"), col("i_id"))
        .agg(min(col("dist")).as("dist"))
    scored
      .groupBy(col("q_id"))
      .agg(TopK.topK(k)(col("dist"), col("i_id"), col("i_id")).as("nbrs"))
      .select(col("q_id"), posexplode(col("nbrs")).as(Seq("pos", "n")))
      .select(
        col("q_id").as("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"),
        (col("n.dist") * lit(step2)).as("dist"))
  }

  /** Approximate cosine top-k: queries and items are bucketed by their
    * `planes`-bit hyperplane signature; exact cosine runs only within a
    * bucket. Recall < 1 by construction (a true neighbor in another
    * bucket is missed); raise recall by probing more buckets (smaller
    * `planes`), unioning several independent signature sets
    * (`tables`), or multi-probing (`probeFlips`).
    *
    * **Multi-probe** (`probeFlips` > 0): each QUERY additionally
    * probes the buckets whose signature differs from its own in one of
    * the first `probeFlips` bits — the nearest-miss buckets, since one
    * flipped bit is exactly one hyperplane voting the other way
    * (Lv et al., "Multi-Probe LSH", VLDB 2007). Recall rises like
    * adding ~`probeFlips` tables but only the QUERY side fans out
    * (×(1+probeFlips) rows); the corpus side — the 100 TB side — still
    * emits exactly `tables` rows per item. That asymmetry is the whole
    * point at scale: tables cost corpus shuffle, probes cost query
    * shuffle.
    *
    * Scale shape: the signature is per-row compute; the bucket join is a
    * hash equi-join on (table, signature) — corpus shuffle
    * O(rows × tables), never O(rows²).
    *
    * @return (query_id, rank, neighbor_id, dist) — dist = 1 − cosine
    */
  def approxCosineTopK(
      queries: DataFrame,
      items: DataFrame,
      k: Int,
      queryId: String,
      itemId: String,
      queryVec: String,
      itemVec: String,
      dim: Int,
      planes: Int = 8,
      tables: Int = 2,
      probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= planes)

    // top-k agg fallback-threshold fix for user-built sessions too
    graft.GraftSession.tune(queries.sparkSession)

    def signatures(df: DataFrame, id: String, vec: String, side: String): DataFrame =
      df.select(
        col(id).cast("long").as(s"${side}_id"),
        col(vec).as(s"${side}_vec"),
        posexplode(array((0 until tables).map(t =>
          hyperplaneSignature(col(vec), planes, dim, planeOffset = t * planes)): _*))
          .as(Seq("tbl", "sig")))

    val q0 = signatures(queries, queryId, queryVec, "q")
    // query-side probe fan-out: own bucket + each 1-bit-flipped bucket
    val q =
      if (probeFlips == 0) q0
      else q0.select(col("q_id"), col("q_vec"), col("tbl"),
        explode(array(col("sig") +: (0 until probeFlips).map(b =>
          col("sig").bitwiseXOR(lit(1L << b))): _*)).as("sig"))
    val it = signatures(items, itemId, itemVec, "i")

    val scored = q.join(it, Seq("tbl", "sig"))
      .select(
        col("q_id"),
        VectorFunctions.cosineDistance(col("q_vec"), col("i_vec")).as("dist"),
        col("i_id"))
      // a pair can collide in several tables; keep one copy
      .groupBy(col("q_id"), col("i_id")).agg(min(col("dist")).as("dist"))

    scored
      .groupBy(col("q_id"))
      .agg(TopK.topK(k)(col("dist"), col("i_id"), col("i_id")).as("nbrs"))
      .select(col("q_id"), posexplode(col("nbrs")).as(Seq("pos", "n")))
      .select(
        col("q_id").as("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"),
        col("n.dist").as("dist"))
  }

  /** Symmetric int8 scalar quantization of a vector column against a
    * CORPUS-GLOBAL scale: `qᵢ = round(xᵢ · 127 / maxAbs)` ∈ [−127, 127]
    * (zeros when `maxAbs` is 0 or null). A global scale — not
    * per-vector — is what keeps the quantized space metric-comparable
    * ACROSS rows: squared-Euclidean over the int codes is then a
    * monotone approximation of the true distance, so ranking needs no
    * per-item float rescale and stays integer-exact (engine-portable).
    *
    * Codes are carried as integral `array<double>` so the existing
    * fused-codegen distance kernels ([[VectorFunctions]]) apply
    * unchanged; every distance they produce is an exact integer (the
    * max possible 64-dim code distance, 64·254², is ≪ 2⁵³). The 4×
    * width saving of a physical `array<byte>` is a storage-layout
    * concern; at the operator layer the win is the integer-exact
    * metric, which is what a rescore-free ANN sweep needs.
    */
  def int8Quantize(vec: Column, maxAbs: Column): Column =
    graft.functions.QuantizeExpr(vec, maxAbs)

  /** Declarative HOF twin of [[int8Quantize]] — the executable spec of
    * the native expression (bit-equality test-enforced; the HOF path
    * evaluates its lambda per element through the interpreter, so the
    * native loop is what a corpus-scan quantization projection runs). */
  private[graft] def int8QuantizeHof(vec: Column, maxAbs: Column): Column = {
    val v = vec.cast("array<double>")
    when(maxAbs.isNull || maxAbs === 0.0, transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => round(x * lit(127.0) / maxAbs)))
  }

  /** Per-vector max |xᵢ| — aggregate over a corpus to get the global
    * quantization scale. */
  def maxAbsElem(vec: Column): Column =
    array_max(transform(vec.cast("array<double>"), x => abs(x)))

  /** Quantized brute-force top-k: both sides int8-quantized against the
    * shared corpus scale (computed here as a 1-row aggregate over
    * `items` ∪ `queries`, broadcast into the quantization projection —
    * at 100 TB the scale is a tiny separate agg job exactly like the
    * IVF codebook), then ranked by integer squared-Euclidean over the
    * codes. Distances are exact integers → the whole result is
    * hash-portable, unlike float-scored ANN paths that gate on
    * `floor(dist·1e6)`.
    *
    * Memory-bandwidth story at scale: int8 codes are 4× narrower than
    * float32, so a scan-heavy sweep moves 4× less data; recall loss is
    * bounded by the quantization step (gate it per round like
    * [[graft.SparkEntry.annRecall]] does for LSH/IVF).
    *
    * @return (query_id, rank, neighbor_id, qdist) — qdist integral
    */
  def quantizedTopK(
      queries: DataFrame,
      items: DataFrame,
      k: Int,
      queryId: String,
      itemId: String,
      queryVec: String,
      itemVec: String): DataFrame = {
    val scale = queries.select(maxAbsElem(col(queryVec)).as("m"))
      .unionAll(items.select(maxAbsElem(col(itemVec)).as("m")))
      .agg(max(col("m")).as("mx"))
    def quantized(df: DataFrame, id: String, vec: String): DataFrame =
      df.crossJoin(broadcast(scale)).select(
        col(id).cast("long").as(id),
        int8Quantize(col(vec), col("mx")).as("qvec"))
    Knn.knnJoin(
      quantized(queries, queryId, queryVec),
      quantized(items, itemId, itemVec),
      k, queryId, itemId, "qvec", "qvec",
      metric = "squaredEuclidean")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dist").cast("long").as("qdist"))
  }
}
