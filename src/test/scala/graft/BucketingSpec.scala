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
    // tables land in the default ./spark-warehouse (warehouse.dir is a
    // static conf); dropped at the end, and the dir is gitignored
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previous aborted run can leave orphan table dirs the catalog no
    // longer tracks — DROP TABLE won't clear those
    for (t <- Seq("li_b", "o_b")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
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
