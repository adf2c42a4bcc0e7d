package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a"), Some(1.5)),
    (Some(2L), Some("a"), None),
    (Some(3L), None, Some(2.5)),
    (None, Some("b"), Some(1.5)),
    (Some(3L), Some("b"), None) // dup id, dup double
  ).toDF("id", "tag", "x")

  test("profile: exact per-column row/null/distinct counts; nulls excluded from distinct") {
    val p = Profile.profile(df, Seq("id", "tag", "x"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(p === Map(
      "id" -> ((5L, 1L, 3L)),   // 1,2,3,3 → 3 distinct
      "tag" -> ((5L, 1L, 2L)),  // a,b
      "x" -> ((5L, 2L, 2L))))   // 1.5, 2.5
  }

  test("approxProfile: same rows/nulls; distinct within HLL error of the exact twin") {
    val wide = (0L until 5000L).map(i => (i % 997, s"t${i % 53}")).toDF("k", "t")
    val exact = Profile.profile(wide, Seq("k", "t"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val approx = Profile.approxProfile(wide, Seq("k", "t"), rsd = 0.05)
      .as[(String, Long, Long, Long)].collect()
    for ((c, rows, nulls, dist) <- approx) {
      assert(rows === 5000L && nulls === 0L)
      val ex = exact(c).toDouble
      assert(math.abs(dist - ex) / ex <= 0.15, s"$c: approx $dist vs exact $ex")
    }
  }

  test("plan shapes: exact multi-distinct Expands; the HLL variant must not") {
    val exactPlan = Profile.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan.take(800))
    val approxPlan = Profile.approxProfile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan.take(800))
    // the HLL path partial-aggregates map-side like any other agg
    assert(approxPlan.contains("partial_approx_count_distinct")
      || approxPlan.toLowerCase.contains("partial"), approxPlan.take(800))
  }
}
