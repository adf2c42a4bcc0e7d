package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions

/** Semantic deduplication over an embedding corpus — the SemDeDup shape
  * (cluster the embedding space with k-means, then run exact pairwise
  * cosine only WITHIN each cluster and drop all but one member of every
  * near-duplicate group). K-means exists here for exactly one reason:
  * it turns the intractable corpus-wide all-pairs cosine into k
  * independent within-cluster all-pairs, each bounded by cluster width
  * — pick `k ∝ n / targetClusterWidth` and the pair stage costs
  * `n · targetClusterWidth / 2` comparisons regardless of corpus size.
  *
  * Everything is deterministic and engine-portable, so the whole
  * pipeline (clustering INCLUDED) replays bit-for-bit in the DuckDB
  * oracle:
  *
  *  - vectors are quantized once to integer milli-units
  *    (`⌊x·1000⌋` per element) — Lloyd distances and centroid means
  *    then stay in exact 64-bit integer arithmetic, immune to
  *    FP-summation ordering;
  *  - initial centroids are the `k` smallest-id vectors (cluster id =
  *    rank in that order), the [[SimilaritySearch]] codebook
  *    convention;
  *  - assignment argmin breaks ties lexicographically on
  *    `(distance, cluster id)`;
  *  - centroid updates use floored integer means (`⌊Σ/n⌋` per
  *    element); a cluster that loses all members simply drops out of
  *    the codebook (deterministic in any engine — no re-seeding).
  *
  * Scale shape: each Lloyd iteration is one per-row argmin against the
  * k-row codebook literals (a pure projection — no join, the corpus
  * never shuffles for assignment) plus one positional-explode
  * partial-agg for the means; only `k × dim` longs ever reach the
  * driver (the IVF codebook discipline, `SimilaritySearch.ivfTopK`).
  * The quantized relation is persisted across iterations — Lloyd is
  * the one genuinely iterative operator here, and recomputing the
  * quantization per iteration would rescan the corpus `iters` times.
  * The within-cluster pair join is a cluster-keyed shuffle-hash
  * self-join (corpus-derived, never broadcast) bounded by
  * `Σ widthᵢ²/2`; a skew-prone corpus caps widths upstream by raising
  * `k` (the same mega-bucket discipline as `Dedup.dropWideBuckets`).
  */
object SemDedup {

  /** Σ (aᵢ−bᵢ)² in exact long arithmetic (milli-quantized inputs).
    * Shared with [[Pq]] (per-subspace assignment + reconstruction
    * error run on the same integer contract). */
  private[operators] def sqDistInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Milli-quantized copy of the vector column. */
  def quantizeMilli(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * 1000.0).cast("long"))

  /** Nearest-centroid id for a milli-quantized vector against codebook
    * literals — the per-row assignment projection (lexicographic
    * `(distance, cluster id)` argmin; no join, the corpus never
    * shuffles to be assigned). Shared by the batch Lloyd loop and the
    * streaming twin (`StreamingOps.semDedupStream`).
    *
    * Since round 20 this dispatches to the fused native
    * [[graft.functions.NearestCentroidExpr]] — one plan node and one
    * `long[][]` reference instead of k struct branches of interpreted
    * HOF folds (the q162/q163 Lloyd chains carried 2.4 MiB task
    * binaries and paid ~3 s/query of driver planning on the
    * declarative trees). Bit-equal by construction (integer argmin,
    * identical tie-break and null fallback); the replaced formulation
    * stays below as [[assignClusterMilliHof]], the executable spec
    * NearestCentroidExprSpec pins the twin pair on. */
  def assignClusterMilli(mv: Column, centroids: Seq[(Long, Seq[Long])]): Column =
    graft.functions.NearestCentroidExpr(mv, centroids).getField("c")

  /** [[assignWithDistMilli]]'s `d` field is the assigned centroid's
    * exact distance — the PQ encode path reads it instead of re-paying
    * a map-lookup `sqDistInt` per subspace. */
  def assignWithDistMilli(mv: Column, centroids: Seq[(Long, Seq[Long])]): Column =
    graft.functions.NearestCentroidExpr(mv, centroids)

  /** The declarative argmin [[assignClusterMilli]] replaced — kept as
    * the executable spec of the assignment's semantics (k struct
    * branches, `array_min`'s struct ordering, HOF integer folds). */
  private[graft] def assignClusterMilliHof(
      mv: Column, centroids: Seq[(Long, Seq[Long])]): Column =
    array_min(array(centroids.map { case (cid, cv) =>
      struct(sqDistInt(mv, typedLit(cv)).as("d"), lit(cid).as("c"))
    }: _*)).getField("c")

  /** Deterministic Lloyd codebook: seed from the `k` smallest-id
    * vectors (cluster id = rank in that order), run `iters`
    * assign+update rounds, return the final `(cluster id, centroid)`
    * codebook — `k × dim` longs, the only driver traffic. */
  def lloydCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Seq[(Long, Seq[Long])] = {
    require(k >= 1 && iters >= 0)
    val milli = df
      .select(col(idCol).cast("long").as("id"),
        quantizeMilli(col(vecCol)).as("mv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Seq[(Long, Seq[Long])] = milli.orderBy(col("id")).limit(k)
        .collect()
        .map(_.getSeq[Long](1))
        .zipWithIndex
        .map { case (cv, i) => (i.toLong, cv.toSeq) }
        .toSeq
      for (_ <- 1 to iters) {
        // two selects: a generator (posexplode) sharing a Project with
        // the struct-argmin strips the struct's field names during the
        // Generate rewrite and breaks the .getField("c") extraction
        centroids = milli
          .select(col("mv"),
            assignClusterMilli(col("mv"), centroids).as("cluster"))
          .select(col("cluster"), posexplode(col("mv")).as(Seq("pos", "x")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .select(col("cluster"), col("pos"),
            floor(col("s").cast("double") / col("n")).cast("long").as("m"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (cid, rows) =>
            (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
          }
          .toSeq.sortBy(_._1)
      }
      centroids
    } finally milli.unpersist()
  }

  /** Deterministic Lloyd k-means assignment: [[lloydCentroids]] then
    * one final assignment scan. Returns `(id, cluster)` for every
    * input row; cluster ids are the initial codebook ranks (0-based,
    * id order) and survive cluster death.
    */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val centroids = lloydCentroids(df, idCol, vecCol, k, iters)
    // the quantized vector must be a named attribute before the
    // struct-argmin — a complex child loses the struct's field names
    // during analysis and breaks the .getField("c") extraction
    df.select(col(idCol).cast("long").as("id"),
        quantizeMilli(col(vecCol)).as("mv"))
      .select(col("id"),
        assignClusterMilli(col("mv"), centroids).as("cluster"))
  }

  /** SemDeDup: [[kmeansAssign]] + within-cluster exact cosine; a vector
    * is dropped when a smaller-id near-duplicate (`cos_micro ≥`
    * threshold, computed on the ORIGINAL float vectors with the
    * engine's per-row fold) shares its cluster. One row per input
    * vector: `(vec_id, cluster, kept)`.
    *
    * `maxClusterWidth` (recommended at corpus scale) excludes clusters
    * wider than the cap from the pair join — the
    * [[Dedup.dropWideBuckets]] discipline for THIS operator's one
    * residual blow-up: "raise k" bounds the AVERAGE width, but a
    * template mega-cluster concentrates mass in one centroid
    * regardless of k, and that cluster alone pays width²/2
    * comparisons. Dropping the whole over-wide cluster (never
    * truncating — row-order-dependent) bounds every cluster's fan-out
    * at cap²; its members are all KEPT (no dedup verdict is reached
    * for them), and a cluster that hot is template boilerplate a
    * pipeline handles by rules, not pairwise cosine. The drop is
    * observable: [[clusterWidthAudit]] emits per-cluster width +
    * dropped-flag accounting under the same cap.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      minCosineMicro: Long,
      maxClusterWidth: Option[Int] = None): DataFrame = {
    val assigned = kmeansAssign(df, idCol, vecCol, k, iters)
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val cl0 = vecs.join(assigned.hint("shuffle_hash"), "id")
    val cl = maxClusterWidth.fold(cl0) { cap =>
      require(cap >= 2,
        s"maxClusterWidth must be >= 2 (a 1-wide cluster pairs nothing), got $cap")
      // one partial-agged width count + a left-anti probe, both keyed on
      // the cluster id the pair join shuffles on anyway; the wide
      // relation is corpus-derived (could hold many hot clusters at
      // scale) so the probe is shuffle-hash pinned, and the survivor
      // relation is re-pinned for the pair join (dropWideBuckets's rule)
      val wide = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") > cap)
        .select(col("cluster"))
      cl0.join(wide.hint("shuffle_hash"), Seq("cluster"), "left_anti")
        .hint("shuffle_hash")
    }
    val dropped = cl.as("a")
      .join(cl.as("b").hint("shuffle_hash"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(floor(VectorFunctions.cosineSimilarity(col("a.vec"), col("b.vec"))
        * 1000000.0).cast("long") >= minCosineMicro)
      .select(col("b.id").as("id")).distinct()
      .withColumn("hit", lit(1))
    assigned.join(dropped.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cluster"),
        when(col("hit").isNull, 1L).otherwise(0L).as("kept"))
  }

  /** Per-cluster width accounting under a `maxClusterWidth` cap — the
    * observability half of [[semDedup]]'s cap (the
    * [[Dedup.lshBucketAudit]] pattern): what a capped run over the
    * same corpus and Lloyd parameters would exclude from the pair
    * join, as data. A pipeline alerts on `dropped` widths drifting up
    * — a new template family concentrating in one centroid — exactly
    * like it alerts on LSH mega-buckets. One partial-agged groupBy on
    * the assignment; output is ≤ k rows.
    *
    * @return (cluster, width, dropped) — dropped = 1 iff width > cap
    */
  def clusterWidthAudit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      maxClusterWidth: Int): DataFrame = {
    require(maxClusterWidth >= 2,
      s"maxClusterWidth must be >= 2, got $maxClusterWidth")
    kmeansAssign(df, idCol, vecCol, k, iters)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("width"))
      .select(col("cluster"), col("width"),
        (col("width") > maxClusterWidth).cast("long").as("dropped"))
  }
}
