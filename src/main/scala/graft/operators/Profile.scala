package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the observability pass a pipeline runs before
  * trusting an input drop: per-column row/null/distinct counts in ONE
  * scan.
  *
  * Shapes:
  *  - [[profile]] uses EXACT `count(DISTINCT …)`. Spark plans multiple
  *    distinct aggregates with an Expand (the input is replicated once
  *    per distinct column internally) — exact and still single-scan,
  *    but the expanded exchange grows with `cols × rows`. Right for
  *    audits and the oracle gate.
  *  - [[approxProfile]] swaps in `approx_count_distinct` (HLL++):
  *    no Expand, one partial-agged pass, constant sketch state per
  *    column — the 100 TB default; spec-gated within HLL's error
  *    bound against the exact twin (the q53 discipline).
  *
  * Both return one row per profiled column:
  * `(col_name, n_rows, n_null, n_distinct)` — distinct counts ignore
  * nulls (the shared SQL convention, DuckDB included).
  */
object Profile {

  private def unpivot(base: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = cols.map(c => s"'$c', `__null_$c`, `__dist_$c`").mkString(", ")
    base.selectExpr("`__rows`",
        s"stack(${cols.size}, $stackExpr) as (col_name, n_null, n_distinct)")
      .select(col("col_name"), col("__rows").as("n_rows"),
        col("n_null"), col("n_distinct").cast("long").as("n_distinct"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"__null_$c"),
      count_distinct(col(c)).as(s"__dist_$c")))
    unpivot(df.agg(count(lit(1)).as("__rows"), aggs: _*), cols)
  }

  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"__null_$c"),
      approx_count_distinct(col(c), rsd).as(s"__dist_$c")))
    unpivot(df.agg(count(lit(1)).as("__rows"), aggs: _*), cols)
  }
}
