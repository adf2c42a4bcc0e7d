package graft.operators

import graft.SparkSpec

class KnnBlockedSpec extends SparkSpec {
  import spark.implicits._

  test("knnJoinBlocked == knnJoin for any block count") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 10 === 0)
    val items = emb.filter($"vec_id" % 10 =!= 0)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    val whole = run(Knn.knnJoin(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding"))
    for (blocks <- Seq(1, 3, 7)) {
      val blocked = run(Knn.knnJoinBlocked(queries, items, 5, blocks,
        "vec_id", "vec_id", "embedding", "embedding"))
      assert(blocked === whole, s"blocks=$blocks")
    }
  }
}
