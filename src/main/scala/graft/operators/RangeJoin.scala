package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed range (interval) join: for each left row, every right row
  * with the same key whose timestamp falls in
  * `[leftTs − window, leftTs]`.
  *
  * The naive formulation is an inequality theta-join — per key it
  * degenerates to an O(|L|·|R|) nested loop (Spark plans it as a
  * BroadcastNestedLoopJoin or a per-key cartesian), which is fatal at
  * event-log scale. This operator instead BUCKETIZES time by the window
  * width: a right row at `rts` can only match left rows in the two
  * `W`-wide buckets `{⌊rts/W⌋, ⌊rts/W⌋ + 1}` (since
  * `lts ∈ [rts, rts + W]`), so the RIGHT side explodes ×2 onto its
  * candidate buckets, the left keeps its single bucket `⌊lts/W⌋`, the
  * join becomes a hash EQUI-join on (key, bucket), and the exact
  * `[lts − W, lts]` predicate filters the candidates. Shuffle =
  * |L| + 2·|R| rows, partitioned by (key, bucket) — skewed keys spread
  * over their time buckets instead of landing on one task.
  *
  * Exploding the RIGHT side (not the left) is what makes `left_outer`
  * exact: every left row enters the join exactly once, so an unmatched
  * left row is emitted exactly once with null right columns — no
  * bucket-copy duplicates to fold away. A (left, right) pair can
  * satisfy the bucket condition only once (the left row has exactly
  * one bucket; the right row's two copies carry distinct buckets), so
  * no dedup is needed on the inner side either.
  *
  * Column contract: `left` and `right` may share ONLY the `keys`
  * column names (the join is resolved through an internal rename, so
  * self-joins of the same source are safe); right's non-key columns
  * come through under their own names.
  */
object RangeJoin {

  private val P = "_rj_" // internal right-side prefix

  /** Windowed range join (`inner` or `left_outer`).
    *
    * @param leftTs   timestamp column name in `left`
    * @param rightTs  timestamp column name in `right` (must differ from
    *                 every `left` column name)
    * @param windowMicros  window width W in microseconds; matches
    *                      `rightTs ∈ [leftTs − W, leftTs]`, inclusive
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      joinType: String = "inner"): DataFrame = {
    require(windowMicros > 0, "window must be positive")
    require(Seq("inner", "left_outer", "left").contains(joinType),
      s"unsupported join type $joinType (inner | left_outer)")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"left/right may only share key columns; both have: $overlap")

    val l = left.withColumn("_bkt",
      floor(unix_micros(col(leftTs)) / windowMicros).cast("long"))
    // disjoint naming makes the (possibly self-) join unambiguous
    val rp = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, P + c))
    val rb = floor(unix_micros(col(P + rightTs)) / windowMicros).cast("long")
    val r = rp.withColumn(P + "bkt", explode(array(rb, rb + 1L)))

    val cond = keys.map(k => col(k) === col(P + k)).reduce(_ && _) &&
      col("_bkt") === col(P + "bkt") &&
      unix_micros(col(P + rightTs)) >= unix_micros(col(leftTs)) - windowMicros &&
      unix_micros(col(P + rightTs)) <= unix_micros(col(leftTs))

    // explode defeats size estimates exactly like the dedup self-joins;
    // pin the partitioned hash join
    val joined = l.hint("shuffle_hash")
      .join(r.hint("shuffle_hash"), cond,
        if (joinType == "inner") "inner" else "left_outer")
    val rightOut = right.columns.filterNot(keys.contains)
      .map(c => col(P + c).as(c))
    joined.select((left.columns.map(col) ++ rightOut).toIndexedSeq: _*)
  }

  /** Per-left-row match count over the window — the common "events in
    * the preceding W" feature. Every left row appears (0 when nothing
    * matched); `countCol` counts right rows in `[leftTs − W, leftTs]`
    * (`count(rightTs)` ignores the null of an unmatched row).
    */
  def rangeCount(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      leftId: String,
      countCol: String = "n_in_window"): DataFrame =
    rangeJoin(left, right, keys, leftTs, rightTs, windowMicros, "left_outer")
      .groupBy(col(leftId))
      .agg(count(col(rightTs)).as(countCol))
}
