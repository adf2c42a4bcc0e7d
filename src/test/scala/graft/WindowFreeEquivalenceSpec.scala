package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-free query formulations must equal their textbook window
  * twins row-for-row on the real testdata — the twin is the executable
  * spec of the semantics, the shipped shape is the one that scales
  * (no single-partition sort, no per-key history sort).
  */
class WindowFreeEquivalenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("q91 struct-argmax compaction ≡ per-key row_number window top-1") {
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val windowed = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(sortedRows(Queries.latestEvents(spark, sf)) === sortedRows(windowed))
  }

  test("q94 broadcast grand-total share ≡ sum() OVER () window formulation") {
    val byNation = Queries.joinAgg(spark, sf)
    val w = Window.partitionBy() // deliberate: the anti-pattern twin
    val windowed = byNation
      .withColumn("grand_cents", sum(col("total_cents")).over(w))
      .select(col("n_name"), col("n_orders"), col("total_cents"),
        col("grand_cents"),
        expr("(total_cents * 1000000) DIV grand_cents").as("share_ppm"))
    assert(sortedRows(Queries.revenueShare(spark, sf)) === sortedRows(windowed))
  }

  // Equivalence holds because the event stream is gap-free (30
  // consecutive days): lag pairs each day with the previous EXISTING
  // day, the shifted-key join with the previous CALENDAR day. The
  // shipped semantics is calendar adjacency — on gappy data the join
  // yields NULL after a gap where lag would reach across it.
  test("q95 shifted-key join delta ≡ lag() over the global day order") {
    val d = Tables.load(spark, sf, "events")
      .groupBy(datediff(col("ts"), lit("1970-01-01")).cast("long").as("di"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.orderBy(col("di")) // deliberate: the anti-pattern twin
    val windowed = d.withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .select(col("di"), col("cents"), col("prev_cents"),
        (col("cents") - coalesce(col("prev_cents"), lit(0L))).as("delta_cents"))
    assert(sortedRows(Queries.dailyDelta(spark, sf)) === sortedRows(windowed))
  }
}
