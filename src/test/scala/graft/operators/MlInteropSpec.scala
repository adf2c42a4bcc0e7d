package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlInteropSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("array -> ml Vector -> array round-trips") {
    val rt = emb.select(
      $"embedding".cast("array<double>").as("orig"),
      MlInterop.fromMlVector(MlInterop.toMlVector($"embedding")).as("round"))
      .as[(Seq[Double], Seq[Double])].collect()
    rt.foreach { case (o, r) => assert(o === r) }
  }

  test("MLlib LSH pairs are a (useful) subset of exact euclidean pairs") {
    // exact pairs under the threshold, via the engine's own expression
    val v = emb.select($"vec_id".cast("long").as("id"), $"embedding".as("vec"))
    val exact = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        sqrt(graft.functions.VectorFunctions.squaredEuclidean(
          col("a.vec"), col("b.vec"))).as("d"))
      .filter($"d" <= 3.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    val approx = MlInterop.mllibEuclideanPairs(emb, "vec_id", "embedding",
      threshold = 3.5).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    assert(approx.subsetOf(exact), s"LSH returned non-pairs: ${approx.diff(exact).take(5)}")
    if (exact.nonEmpty) {
      val recall = approx.size.toDouble / exact.size
      assert(recall >= 0.5, s"MLlib LSH recall $recall too low (exact=${exact.size})")
    }
  }
}
