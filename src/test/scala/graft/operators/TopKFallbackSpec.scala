package graft.operators

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkSpec}

/** Regression guard for the ObjectHashAggregate sort-based fallback
  * cliff: Spark silently switches the top-k aggregation to a sort-based
  * path once a partition sees more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` groups
  * (default 128) — with a Kryo-serialized buffer that was a measured
  * 4-27x slowdown at sf0.1. The engine raises the threshold in every
  * session it touches ([[GraftSession.tune]]); this spec pins that
  * behavior with a query-set size (500 groups) that would trip the
  * default.
  */
class TopKFallbackSpec extends SparkSpec {

  test("engine sessions raise the objectHashAggregate fallback threshold") {
    // the SparkSpec session goes through GraftSession.tune
    val v = spark.conf.get(GraftSession.ObjectHashFallbackKey).toInt
    assert(v > 128, s"threshold $v would sort-fallback any real query set")
    assert(v == GraftSession.ObjectHashFallbackValue)
  }

  test("knnJoin with 500 query groups plans ObjectHashAggregate and stays correct") {
    val q = spark.range(500).select(
      col("id").as("query_id"),
      array((col("id") % 97).cast("double"), (col("id") % 13).cast("double"))
        .as("query_vec"))
    val items = spark.range(2000).select(
      col("id").as("item_id"),
      array((col("id") % 97).cast("double"), (col("id") % 13).cast("double"))
        .as("item_vec"))
    val res = Knn.knnJoin(q, items, k = 3)
    val rows = res.collect()
    assert(rows.length === 500 * 3)
    // nearest neighbor of each query is an exact vector match (dist 0):
    // ids congruent mod lcm(97,13) share a vector, so rank-1 dist is 0
    val rank1 = rows.filter(_.getAs[Int]("rank") == 1)
    assert(rank1.forall(_.getAs[Double]("dist") == 0.0))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    // tune() must have run on this session via the operator entry point
    assert(spark.conf.get(GraftSession.ObjectHashFallbackKey).toInt > 500)
  }
}
