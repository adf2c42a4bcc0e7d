package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join splitting covers joins; for
  * *aggregations* over power-law keys (one key = 30% of a 100 TB
  * table), pre-salting bounds any single task's input: phase 1
  * aggregates on (key, salt) — hot keys spread over `salt` tasks —
  * phase 2 merges the per-salt partials. Works for any agg whose
  * partial is itself mergeable (count/sum/min/max here).
  */
object Skew {

  /** Two-phase salted count+sum aggregation.
    *
    * @param df    input
    * @param key   group key column name
    * @param salt  number of salt buckets a hot key spreads across
    * @param value numeric column to sum
    * @return (key, cnt, sum_value) — same groups and totals as the
    *         unsalted `groupBy(key).agg(count, sum)`: count/sum are
    *         decomposable, so ANY salt assignment merges to the same
    *         result for integral values. Caveat: for floating-point
    *         sums the two-phase fold reorders additions, so results can
    *         differ from the single-phase plan in the last ulps (and
    *         across retries, since the salt below is position-derived).
    */
  def saltedCountSum(df: DataFrame, key: String, salt: Int, value: String): DataFrame = {
    require(salt >= 1)
    // salt = hash of (value, partition-position): position-derived, NOT
    // content-deterministic — a shuffle-retry can reorder rows and
    // assign different salts. That is safe here because the merged
    // result is salt-invariant (see @return); rand() is avoided only to
    // keep the column pure within one execution.
    val s = pmod(xxhash64(col(value), monotonically_increasing_id()), lit(salt))
    df.withColumn("_salt", s)
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(value)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"), sum(col("_s")).as("sum_value"))
  }
}
