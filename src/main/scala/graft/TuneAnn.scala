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

    for ((planes, tables, flips) <- Seq(
        (5, 12, 0), (5, 12, 5), (5, 8, 5), (6, 8, 6), (6, 12, 6), (7, 8, 7),
        (6, 16, 6), (7, 12, 7))) {
      val (dt, r) = recall(SimilaritySearch.approxCosineTopK(
        q, it, 5, "vec_id", "vec_id", "embedding", "embedding",
        dim = 64, planes = planes, tables = tables, probeFlips = flips))
      println(f"TUNE lsh planes=$planes tables=$tables flips=$flips recall@5=$r%.3f time=$dt%.1fs")
    }
    for ((c, p, a) <- Seq(
        (32, 8, 1), (32, 8, 2), (32, 10, 2), (32, 12, 2), (64, 12, 2),
        (64, 16, 2), (64, 16, 3), (32, 10, 3))) {
      val (dt, r) = recall(SimilaritySearch.ivfTopK(
        q, it, 5, "vec_id", "vec_id", "embedding", "embedding",
        centroids = c, probes = p, assignments = a))
      println(f"TUNE ivf centroids=$c probes=$p assign=$a recall@5=$r%.3f time=$dt%.1fs")
    }
    spark.stop()
  }
}
