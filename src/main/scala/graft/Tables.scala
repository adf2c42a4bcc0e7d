package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table carries parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs
    * and rebuild a proper timestamp column (microsecond precision —
    * exact for any sub-second analytics here).
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    GraftSession.tune(spark) // top-k agg fallback threshold; see GraftSession
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
