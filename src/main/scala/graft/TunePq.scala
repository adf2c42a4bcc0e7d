package graft

import org.apache.spark.sql.functions._

/** PQ tuning sweep: ADC recall@5 vs the exact squared-Euclidean top-5
  * across (m, k, iters) bit budgets — `runMain graft.TunePq [sfDir]`.
  * The shipped q162/q163 parameters come from this sweep (see their
  * scaladoc); the [[TuneAnn]] discipline applied to the PQ operator.
  * Raw PQ recall rises with the bit budget (m·log₂k bits/vector);
  * production systems additionally re-rank ADC candidates with exact
  * distances (IVF-PQ), which this sweep also measures via the
  * rerank column (ADC top-50 → exact re-rank → top-5).
  */
object TunePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32), "graft-tune-pq")
    import graft.operators.{Knn, Pq}
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val it = emb.filter(col("vec_id") % 10 =!= 0)
    val exact = Knn.knnJoin(q, it, 5, "vec_id", "vec_id",
        "embedding", "embedding", metric = "squaredEuclidean")
      .select(col("query_id"), col("neighbor_id")).cache()
    val possible = exact.count()

    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / possible

    for ((m, k, iters) <- Seq(
        (4, 16, 2), (4, 64, 2), (8, 16, 2), (8, 64, 2),
        (16, 16, 2), (16, 64, 2), (16, 64, 5), (32, 16, 2))) {
      val t0 = System.nanoTime()
      val cbs = Pq.codebooks(it, "vec_id", "embedding", 64, m, k, iters)
      val coded = Pq.encodeWith(it, "vec_id", "embedding", 64, cbs)
      val top5 = recall(Pq.adcTopK(q, coded, cbs, 64, 5, "vec_id", "embedding"))
      // re-rank shape: wide ADC candidate set, exact distances on it
      val cand = Pq.adcTopK(q, coded, cbs, 64, 50, "vec_id", "embedding")
        .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
      val rerank = {
        import graft.functions.VectorFunctions
        val joined = cand
          .join(q.select(col("vec_id").as("q_id"), col("embedding").as("qe")), "q_id")
          .join(it.select(col("vec_id").as("i_id"), col("embedding").as("ie"))
            .hint("shuffle_hash"), "i_id")
          .select(col("q_id"),
            VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("dist"),
            col("i_id"))
          .groupBy(col("q_id").as("query_id"))
          .agg(operators.TopK.topK(5)(col("dist"), col("i_id"), col("i_id")).as("top"))
          .select(col("query_id"), explode(col("top")).as("n"))
          .select(col("query_id"), col("n.id").as("neighbor_id"))
        recall(joined)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val bits = m * (math.log(k) / math.log(2)).round
      println(f"TUNE pq m=$m k=$k iters=$iters bits=$bits adc_recall@5=$top5%.3f rerank50_recall@5=$rerank%.3f time=$dt%.1fs")
    }

    // IVF-PQ sweep: does residual encoding earn its place (Jégou §IV
    // says yes), and how many probes buy back the cell-pruning recall
    // loss? rerank50 is the production number (the q167 shape).
    for ((centroids, probes, residual, assignments) <- Seq(
        (16, 2, true, 1), (16, 4, true, 1), (16, 4, false, 1),
        (16, 8, true, 1), (32, 8, true, 1),
        (16, 2, true, 2), (16, 4, true, 2), (16, 4, false, 2),
        (16, 6, true, 2), (32, 8, true, 2), (32, 12, true, 2),
        (16, 4, true, 3))) {
      val t0 = System.nanoTime()
      val path = s"${sys.props("java.io.tmpdir")}/graft_tune_ivfpq"
      Pq.buildIvfPqIndex(it, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, centroids = centroids, path = path,
        residual = residual, assignments = assignments)
      // residual/assignments now travel in the index's meta sidecar
      val cand = Pq.ivfPqCandidates(q, path, dim = 64, topK = 50,
          probes = probes, "vec_id", "embedding")
        .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
      val rerank = {
        import graft.functions.VectorFunctions
        val joined = cand
          .join(q.select(col("vec_id").as("q_id"), col("embedding").as("qe")), "q_id")
          .join(it.select(col("vec_id").as("i_id"), col("embedding").as("ie"))
            .hint("shuffle_hash"), "i_id")
          .select(col("q_id"),
            VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("dist"),
            col("i_id"))
          .groupBy(col("q_id").as("query_id"))
          .agg(operators.TopK.topK(5)(col("dist"), col("i_id"), col("i_id")).as("top"))
          .select(col("query_id"), explode(col("top")).as("n"))
          .select(col("query_id"), col("n.id").as("neighbor_id"))
        recall(joined)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val frac = probes.toDouble * assignments / centroids
      println(f"TUNE ivfpq centroids=$centroids probes=$probes assign=$assignments residual=$residual scan_frac=$frac%.3f rerank50_recall@5=$rerank%.3f time=$dt%.1fs")
    }
    spark.stop()
  }
}
