package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared table loader for the per-domain query traits mixed into
  * [[graft.Queries]] — one choke point onto [[graft.Tables.load]]
  * (which owns the timestamp-encoding normalization).
  */
private[graft] trait QueryContext {
  protected def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)
}
