package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib interop: bridge between this engine's `array<float|double>`
  * embedding columns and `org.apache.spark.ml.linalg.Vector`, plus an
  * MLlib-backed approximate-neighbor path
  * (BucketedRandomProjectionLSH — Euclidean LSH from spark.ml) as a
  * cross-check and integration point for MLlib pipelines.
  *
  * The engine's own paths ([[Knn.knnJoin]] exact,
  * [[SimilaritySearch.approxCosineTopK]] approximate) stay primary: they
  * plan as one broadcast join + bounded top-k aggregation, while the
  * MLlib estimator materializes hash tables as vector columns. Use this
  * when composing with existing `spark.ml` stages.
  */
object MlInterop {

  /** `array<numeric>` → `ml.linalg.Vector` (dense). */
  def toMlVector(c: Column): Column = array_to_vector(c.cast("array<double>"))

  /** `ml.linalg.Vector` → `array<double>`. */
  def fromMlVector(c: Column): Column = vector_to_array(c)

  /** Euclidean near-pairs via MLlib's BucketedRandomProjectionLSH
    * `approxSimilarityJoin`: (id_a, id_b, dist) with id_a < id_b and
    * euclidean distance ≤ `threshold`.
    */
  def mllibEuclideanPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bucketLength: Double = 2.0,
      numHashTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val vecs = df.select(col(idCol).cast("long").as("id"),
      toMlVector(col(vecCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setSeed(seed)
      .setInputCol("features")
      .setOutputCol("hashes")
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, threshold, "dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("dist"))
      .filter(col("id_a") < col("id_b"))
  }
}
