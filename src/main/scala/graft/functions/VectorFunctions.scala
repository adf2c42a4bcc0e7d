package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns.
  *
  * The reference engine's single scalar function is the squared
  * Euclidean distance over all-but-the-label columns
  * (`/root/reference/src/main/java/Hadoop.java:155-165`); it
  * deliberately skips the `sqrt` because ranking by squared distance is
  * order-preserving. We keep that shortcut ([[squaredEuclidean]]) and add
  * the neighboring vector ops a similarity-search / dedup pipeline needs.
  *
  * Two implementations with identical (bit-for-bit) results:
  *  - the default entry points delegate to [[VectorDistanceExpr]], a
  *    native Catalyst expression with fused codegen loops — the hot
  *    path for KNN/ANN/dedup scans;
  *  - the `*Hof` variants are the declarative higher-order-function
  *    formulation (`aggregate`/`zip_with`). Spark plans those as
  *    CodegenFallback (interpreted lambdas + an intermediate array), an
  *    order of magnitude slower per row — kept as the readable
  *    reference semantics and cross-checked in `VectorDistanceExprSpec`.
  *
  * All functions promote elements to double before accumulating, so
  * `array<float>` (the testdata embedding type) and `array<double>`
  * behave identically and match a DuckDB oracle that casts to DOUBLE.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Σ (aᵢ−bᵢ)² — rank-preserving distance, no sqrt (Hadoop.java:155-165). */
  def squaredEuclidean(a: Column, b: Column): Column =
    VectorDistanceExpr.squaredEuclidean(a, b)

  /** True L2 (Euclidean) distance. */
  def euclidean(a: Column, b: Column): Column = sqrt(squaredEuclidean(a, b))

  /** Σ aᵢ·bᵢ */
  def dotProduct(a: Column, b: Column): Column =
    VectorDistanceExpr.dotProduct(a, b)

  /** dot(a,b) / (‖a‖·‖b‖); NaN-free for zero vectors (returns 0). */
  def cosineSimilarity(a: Column, b: Column): Column =
    VectorDistanceExpr.cosineSimilarity(a, b)

  /** 1 − cosineSimilarity. */
  def cosineDistance(a: Column, b: Column): Column =
    VectorDistanceExpr.cosineDistance(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** a / ‖a‖₂ — unit-normalized copy (zero vectors pass through as
    * zeros rather than NaN). Normalize once at ingest and cosine
    * becomes a bare dot product for every downstream ANN/dedup pass. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0 || n.isNull, d(a)).otherwise(transform(d(a), x => x / n))
  }

  // --- declarative HOF formulations (reference semantics) ---------------

  /** [[squaredEuclidean]], as interpreted higher-order functions. */
  def squaredEuclideanHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** [[dotProduct]], as interpreted higher-order functions. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** [[l2Norm]], as interpreted higher-order functions. */
  def l2NormHof(a: Column): Column = sqrt(dotProductHof(a, a))

  /** [[cosineSimilarity]], as interpreted higher-order functions. */
  def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = l2NormHof(a) * l2NormHof(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProductHof(a, b) / denom)
  }

  /** [[cosineDistance]], as interpreted higher-order functions. */
  def cosineDistanceHof(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarityHof(a, b)
}
