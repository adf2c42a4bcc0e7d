package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join path for the
  * repeated fact-to-fact joins a 100 TB deployment lives on: bucket
  * both tables on the join key at write time and the sort-merge join
  * needs no Exchange at read time.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previous aborted run can leave orphan table dirs the catalog no
    // longer tracks — DROP TABLE won't clear those; resolve the
    // location through the catalog (the suite runs under a non-default
    // warehouse.dir, so a hardcoded ./spark-warehouse would miss)
    for (t <- Seq("li_b", "o_b")) {
      val p = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t)))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }

    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // at this tier Spark would (rightly) broadcast the tiny orders side;
    // disable it so the test exercises the bucketed sort-merge path the
    // configuration exists for at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // bucketed scan on both sides -> SortMergeJoin with zero Exchange
    // before the join (the aggregation reuses the same partitioning too)
    assert(plan.contains("SortMergeJoin"), plan.take(900))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    assert(plan.contains("Bucketed: true"), plan.take(1500))

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
