package graft

import org.apache.spark.sql.functions._

/** ANN tuning sweep: recall@5 + wall time for candidate hyperplane-LSH
  * and IVF configs against the exact brute-force baseline —
  * `runMain graft.TuneAnn [sfDir]`. The shipped q22/q39 parameters come
  * from this sweep (see their scaladoc); re-run it when the embedding
  * distribution changes. Recall is measured the same way q44 gates it
  * (left-semi overlap of (query, neighbor) pairs).
  */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32), "graft-tune")
    import graft.operators.SimilaritySearch
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val it = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = SimilaritySearch.cosineTopK(q, it, 5, "vec_id", "vec_id", "embedding", "embedding")
      .select(col("query_id"), col("neighbor_id")).cache()
    val possible = exact.count()

    def recall(approx: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val t0 = System.nanoTime()
      val hits = exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      ((System.nanoTime() - t0) / 1e9, hits.toDouble / possible)
    }

    for ((planes, tables) <- Seq((5, 8), (4, 12), (4, 16), (5, 12), (6, 12), (4, 24))) {
      val (dt, r) = recall(SimilaritySearch.approxCosineTopK(
        q, it, 5, "vec_id", "vec_id", "embedding", "embedding",
        dim = 64, planes = planes, tables = tables))
      println(f"TUNE lsh planes=$planes tables=$tables recall@5=$r%.3f time=$dt%.1fs")
    }
    for ((c, p) <- Seq((16, 3), (32, 6), (32, 8), (64, 12), (64, 16))) {
      val (dt, r) = recall(SimilaritySearch.ivfTopK(
        q, it, 5, "vec_id", "vec_id", "embedding", "embedding",
        centroids = c, probes = p))
      println(f"TUNE ivf centroids=$c probes=$p recall@5=$r%.3f time=$dt%.1fs")
    }
    spark.stop()
  }
}
