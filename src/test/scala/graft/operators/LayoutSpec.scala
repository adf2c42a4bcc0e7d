package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: interleave bit-by-bit. */
  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue: matches a bit-by-bit interleave reference, masks to 16 bits") {
    val samples = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL),
      (12345L, 54321L), (65535L, 1L),
      (0x12345L, 0x6789AL), // > 16 bits: must mask, not overflow
      (987654321L, 123456789L))
    val got = samples.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, z) <- got)
      assert(z === zRef(a & 0xFFFFL, b & 0xFFFFL), s"z($a, $b)")
    // corners: interleave identities
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((0L, 0L)) === 0L)
    assert(m((1L, 0L)) === 1L)
    assert(m((0L, 1L)) === 2L)
    assert(m((0xFFFFL, 0xFFFFL)) === 0xFFFFFFFFL)
  }

  test("zOrdered: range exchange + local sort; partition z-intervals are disjoint") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val clustered = Layout.zOrdered(df, "l_partkey", "l_suppkey", partitions = 4)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(1200))
    assert(plan.contains("Sort"), plan.take(1200))
    // each output partition must cover a z interval disjoint from the
    // others — that's what makes per-file min/max stats prune 2-D
    // range predicates after a clustered write
    val ranges = clustered
      .select(spark_partition_id().as("p"), col("zval"))
      .groupBy("p").agg(min("zval").as("lo"), max("zval").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    for (w <- ranges.sliding(2) if w.length == 2)
      assert(w(0)._3 <= w(1)._2,
        s"overlapping partition z-ranges: ${ranges.mkString(", ")}")
    // clustering only reorders: same multiset of rows
    assert(clustered.count() === df.count())
  }

  test("zOrdered: rows inside each partition are sorted by z") {
    val df = Seq.tabulate(1000)(i => (i.toLong * 7919 % 65536, i.toLong * 104729 % 65536))
      .toDF("a", "b")
    val parts = Layout.zOrdered(df, "a", "b", partitions = 3)
      .select(spark_partition_id().as("p"), col("zval"))
      .as[(Int, Long)].collect().groupBy(_._1)
    for ((_, rows) <- parts) {
      val zs = rows.map(_._2).toSeq
      assert(zs === zs.sorted, "partition not locally sorted by z")
    }
  }
}
