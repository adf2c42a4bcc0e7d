package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    // (key, qts, quote_id)
    ("A", 10L, 100L), ("A", 20L, 101L), ("A", 20L, 102L), ("A", 40L, 103L),
    ("B", 15L, 200L)
  ).toDF("k", "qts", "quote_id")

  private lazy val trades = Seq(
    // (key, tts, trade_id)
    ("A", 5L, 1L),   // before any quote → null
    ("A", 20L, 2L),  // ties with quotes at 20 → greatest quote_id (102)
    ("A", 30L, 3L),  // latest ≤ 30 is 20 → 102
    ("A", 50L, 4L),  // → 103
    ("B", 14L, 5L),  // before B's quote → null
    ("B", 99L, 6L),  // → 200
    ("C", 7L, 7L)    // key with no quotes → null
  ).toDF("k", "tts", "trade_id")

  test("asof semantics: greatest right ts <= left ts per key, ties by tie-break, null when none") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"), "tts", "qts",
        rightPayload = Seq("quote_id" -> col("quote_id")),
        rightTieBreak = col("quote_id"))
      .select($"trade_id", $"quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> None, 2L -> Some(102L), 3L -> Some(102L), 4L -> Some(103L),
      5L -> None, 6L -> Some(200L), 7L -> None))
  }

  test("left columns pass through unchanged") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"), "tts", "qts",
      rightPayload = Seq("quote_id" -> col("quote_id")),
      rightTieBreak = col("quote_id"))
    assert(out.columns.toSeq === Seq("k", "tts", "trade_id", "quote_id"))
    assert(out.count() === 7)
  }

  test("single shuffle: plan has exactly one exchange for the union-window") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"), "tts", "qts",
      rightPayload = Seq("quote_id" -> col("quote_id")),
      rightTieBreak = col("quote_id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most one shuffle (+reuse), got:\n$plan")
  }
}
