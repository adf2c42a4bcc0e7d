package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // clicks for two users; errors placed just inside/outside a 10-minute
  // window, plus a boundary-exact case and a different-user decoy
  private lazy val clicks = Seq(
    (1L, 10L, ts("2024-01-01 12:00:00")),
    (2L, 10L, ts("2024-01-01 12:30:00")),
    (3L, 20L, ts("2024-01-01 12:00:00")),
    (4L, 30L, ts("2024-01-01 12:00:00")) // user with no errors at all
  ).toDF("event_id", "user_id", "ts")

  private lazy val errors = Seq(
    (10L, ts("2024-01-01 11:50:00")), // exactly W before click 1: inclusive
    (10L, ts("2024-01-01 11:49:59")), // 1s too early for click 1
    (10L, ts("2024-01-01 12:00:00")), // same instant as click 1: inclusive
    (10L, ts("2024-01-01 12:29:00")), // inside click 2's window
    (20L, ts("2024-01-01 11:55:00")), // inside click 3's window, other user
    (20L, ts("2024-01-01 12:31:00"))  // after click 3 — never matches
  ).toDF("user_id", "err_ts")

  private val W = 600L * 1000000L

  test("rangeCount: inclusive bounds, per-user isolation, zero-match rows present") {
    val got = RangeJoin.rangeCount(clicks, errors, Seq("user_id"),
      "ts", "err_ts", W, "event_id", "n").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("rangeJoin inner == naive theta join on the same window") {
    val bucketed = RangeJoin.rangeJoin(clicks, errors, Seq("user_id"),
      "ts", "err_ts", W)
      .select($"event_id", $"err_ts").as[(Long, Timestamp)].collect().toSet
    val naive = clicks.as("l").join(errors.as("r"),
        $"l.user_id" === $"r.user_id" &&
          unix_micros($"r.err_ts") >= unix_micros($"l.ts") - W &&
          unix_micros($"r.err_ts") <= unix_micros($"l.ts"))
      .select($"event_id", $"err_ts").as[(Long, Timestamp)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("rangeJoin left_outer: exact multiplicities, no bucket-copy duplicates") {
    // the standalone outer join (not folded through rangeCount) must
    // emit an unmatched left row EXACTLY once (null right), and a left
    // row with matches must get its matches only — no spurious
    // null-extended row from the other candidate bucket
    val out = RangeJoin.rangeJoin(clicks, errors, Seq("user_id"),
      "ts", "err_ts", W, joinType = "left_outer")
      .select($"event_id", $"err_ts")
      .as[(Long, Option[Timestamp])].collect().toSeq
    val naive = clicks.as("l").join(errors.as("r"),
        $"l.user_id" === $"r.user_id" &&
          unix_micros($"r.err_ts") >= unix_micros($"l.ts") - W &&
          unix_micros($"r.err_ts") <= unix_micros($"l.ts"), "left_outer")
      .select($"event_id", $"err_ts")
      .as[(Long, Option[Timestamp])].collect().toSeq
    // multiset equality — duplicates matter here
    assert(out.groupBy(identity).view.mapValues(_.size).toMap ===
      naive.groupBy(identity).view.mapValues(_.size).toMap)
    // click 4 (user 30, no errors): exactly one null-extended row
    assert(out.count(_._1 == 4L) === 1)
    assert(out.filter(_._1 == 4L).head._2.isEmpty)
    // click 2 matches exactly one error: one row, no null extension
    assert(out.filter(_._1 == 2L) === Seq((2L, Some(ts("2024-01-01 12:29:00")))))
  }

  test("rangeJoin plans as a hash equi-join on (key, bucket), not a nested loop") {
    val j = RangeJoin.rangeJoin(clicks, errors, Seq("user_id"), "ts", "err_ts", W)
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("matches the oracle formulation on real events data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, sf, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val errs = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("err_ts"))
    val bucketed = RangeJoin.rangeCount(clicks, errs, Seq("user_id"),
      "ts", "err_ts", W, "event_id", "n").as[(Long, Long)].collect().toMap
    val naive = clicks.as("l").join(errs.as("r"),
        $"l.user_id" === $"r.user_id" &&
          unix_micros($"r.err_ts") >= unix_micros($"l.ts") - W &&
          unix_micros($"r.err_ts") <= unix_micros($"l.ts"), "left_outer")
      .groupBy($"event_id").agg(count($"err_ts").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bucketed === naive)
    assert(bucketed.values.exists(_ > 0), "test data has no in-window errors")
  }
}
