package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns, as pure Catalyst column
  * expressions (codegen'd higher-order functions — no UDFs, no
  * serialization boundary in the hot path).
  *
  * The reference engine's single scalar function is the squared
  * Euclidean distance over all-but-the-label columns
  * (`/root/reference/src/main/java/Hadoop.java:155-165`); it
  * deliberately skips the `sqrt` because ranking by squared distance is
  * order-preserving. We keep that shortcut ([[squaredEuclidean]]) and add
  * the neighboring vector ops a similarity-search / dedup pipeline needs.
  *
  * All functions promote elements to double before accumulating, so
  * `array<float>` (the testdata embedding type) and `array<double>`
  * behave identically and match a DuckDB oracle that casts to DOUBLE.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Σ (aᵢ−bᵢ)² — rank-preserving distance, no sqrt (Hadoop.java:155-165). */
  def squaredEuclidean(a: Column, b: Column): Column =
    aggregate(
      zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** True L2 (Euclidean) distance. */
  def euclidean(a: Column, b: Column): Column = sqrt(squaredEuclidean(a, b))

  /** Σ aᵢ·bᵢ */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(a), (x, y) => x * y), lit(0.0), (acc, v) => acc + v))

  /** dot(a,b) / (‖a‖·‖b‖); NaN-free for zero vectors (returns 0). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** 1 − cosineSimilarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)
}
