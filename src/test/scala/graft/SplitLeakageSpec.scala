package graft

import org.apache.spark.sql.functions._

/** Pins q142's reason to exist: a CLUSTER-keyed split admits zero
  * near-dup pairs across the train/test boundary by construction —
  * the leakage q107 measures for doc-keyed splits.
  */
class SplitLeakageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cluster-aware split strands zero near-dup pairs across the boundary") {
    val split = Queries.clusterSplit(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = Queries.jaccardPairs(spark, sf)
      .select(col("id1"), col("id2"))
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val strad = pairs
      .join(split.select(col("doc_id").as("id1"), col("split").as("s1")), "id1")
      .join(split.select(col("doc_id").as("id2"), col("split").as("s2")), "id2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(strad === 0L, s"$strad near-dup pairs straddle the cluster split")
  }

  test("doc-keyed split (q37 semantics) DOES leak on the same corpus — the contrast") {
    import operators.Sampling
    val docSplit = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Sampling.splitTag(col("doc_id"), 10, 8).as("split"))
    val pairs = Queries.jaccardPairs(spark, sf).select(col("id1"), col("id2"))
    val strad = pairs
      .join(docSplit.select(col("doc_id").as("id1"), col("split").as("s1")), "id1")
      .join(docSplit.select(col("doc_id").as("id2"), col("split").as("s2")), "id2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(strad > 0L,
      "doc-hash split should strand at least one near-dup pair here; " +
        "if not, the fixture no longer demonstrates the q142 contrast")
  }

  test("split fractions stay near 80/20 at corpus scale") {
    val byTag = Queries.clusterSplit(spark, "/root/testdata/sf0.01")
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byTag.values.sum.toDouble
    val train = byTag.getOrElse("train", 0L)
    assert(train / total > 0.65 && train / total < 0.95,
      s"train fraction ${train / total} (byTag=$byTag)")
  }
}
