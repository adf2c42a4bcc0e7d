package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) interleaving of two key
  * columns, plus the range-partition + local-sort shape that turns the
  * curve value into an on-disk clustering.
  *
  * Why this is a 100 TB operator and not a toy: multi-dimensional
  * predicate locality is THE lever for scan pruning on petabyte
  * parquet lakes — rows close in (a, b) land in the same files, so a
  * 2-D range predicate prunes to a small file subset via min/max
  * statistics instead of reading everything sorted by just one key.
  * The curve value is pure per-row bit arithmetic (codegen'd, no
  * shuffle); the clustering itself is ONE range exchange + local sort,
  * exactly what a `repartitionByRange().sortWithinPartitions()` write
  * pipeline runs anyway for a 1-D sort key.
  */
object Layout {

  /** Interleave the low 16 bits of a long: bit i moves to bit 2i
    * (the classic mask-shift spread, 4 steps). Input is masked to
    * 16 bits first, so any long is accepted.
    */
  def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z (Morton) value of two 16-bit keys: `a`'s bits at even
    * positions, `b`'s at odd. Total order over the Z curve; pure
    * integer arithmetic, so any engine (and the DuckDB oracle)
    * reproduces it bit-for-bit.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Cluster a relation along the Z curve of two key columns: one
    * range exchange on the curve value (sampled range boundaries →
    * balanced output files) + a partition-local sort. Written out,
    * each file covers a tight Z interval, so parquet min/max stats on
    * BOTH keys prune 2-D range predicates.
    *
    * @param partitions target file/partition count (at scale: total
    *                   data / target file size)
    */
  def zOrdered(
      df: DataFrame,
      aCol: String,
      bCol: String,
      partitions: Int,
      zName: String = "zval"): DataFrame = {
    val withZ = df.withColumn(zName, zValue(col(aCol), col(bCol)))
    withZ.repartitionByRange(partitions, col(zName))
      .sortWithinPartitions(col(zName))
  }
}
