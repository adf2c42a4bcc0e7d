package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the canonical time-series operator
  * Spark has no built-in for: each left row is matched with the right
  * row having the greatest `rightTs ≤ leftTs` within the same key.
  *
  * Physical shape (the scale-correct one): tag and union both inputs,
  * ONE shuffle on the key, ONE sort on (time, tag), and a running
  * `last(_, ignoreNulls)` window carries the latest right payload
  * forward into each left row. No per-key loops, no range cross join —
  * cost is a sort-based window over `|L| + |R|` rows regardless of time
  * distribution. (A union-window beats the range-join formulation
  * whenever most left rows have *some* match window: the range join
  * explodes to |L|×avg-window rows first and top-1s later.)
  *
  * Ordering contract: ties on `rightTs` (same key, same instant) break
  * toward the greatest `rightTieBreak` value — fully deterministic.
  * Right rows at exactly `leftTs` are included (≤, ASOF semantics).
  */
object AsOfJoin {

  /** @param left          left (probe) table
    * @param right         right (reference) table
    * @param on            equi-key column names present in both inputs
    * @param leftTs        event-time column in `left`
    * @param rightTs       event-time column in `right`
    * @param rightPayload  right columns to attach (name → expression
    *                      over `right`)
    * @param rightTieBreak deterministic tie-break column in `right`
    * @return `left.*` plus each payload column (null when no right row
    *         precedes the left row)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[(String, Column)],
      rightTieBreak: Column): DataFrame = {

    val keyCols = on.map(col)
    val payload = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)

    val r = right.select(
      (keyCols :+ col(rightTs).as("_t") :+ lit(0).as("_tag") :+
        rightTieBreak.as("_tie") :+ payload.as("_rp")): _*)
    val leftCols = left.columns.toSeq.map(c => col(c).as(s"_l_$c"))
    val l = left.select(
      (keyCols :+ col(leftTs).as("_t") :+ lit(1).as("_tag") :+
        lit(null).cast(r.schema("_tie").dataType).as("_tie") :+
        lit(null).cast(r.schema("_rp").dataType).as("_rp")) ++ leftCols: _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    matched.select(
      left.columns.map(c => col(s"_l_$c").as(c)) ++
        rightPayload.map { case (n, _) => col(s"_match.$n").as(n) }: _*)
  }
}
