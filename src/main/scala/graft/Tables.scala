package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table's `ts` column has shipped in two physical shapes:
    * parquet TIMESTAMP(NANOS) — which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs and rebuilt — and
    * tz-less timestamp[us] (pandas/pyarrow default), which Spark infers
    * as TIMESTAMP_NTZ, a type the time-arithmetic surface
    * (`unix_micros` et al.) rejects. Normalize both to session-local
    * TIMESTAMP here, the single choke point every loader flows through.
    * The NTZ→LTZ cast is exact under the engine's pinned UTC session
    * ([[GraftSession.local]]); `tune` additionally disables NTZ
    * inference so fresh reads land on TIMESTAMP directly, making this
    * branch a belt-and-suspenders for sessions built outside the engine.
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    GraftSession.tune(spark) // top-k agg fallback threshold + NTZ inference; see GraftSession
    // Resolve each source table ONCE per (session, corpus state): a
    // bare spark.read.parquet re-lists files and re-reads footers for
    // schema inference on EVERY call — one driver job (~35 ms) per
    // table per query, ~600 jobs per bench run for ten static tables.
    // The resolved relation is memoized as a session-scoped temp view
    // whose name carries a digest of the table files' (name, length,
    // mtime) listing, so a rewritten corpus resolves to a NEW view and
    // can never be served stale — the same metadata-not-results
    // invalidation discipline as Pq.audits. This caches file listing
    // and schema only, never data.
    val path = s"$sfDir/$table.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fp = operators.LayoutCensus.dirFingerprint(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$path|$fp".getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val view = s"graft_src_${table}_$digest"
    if (!spark.catalog.tableExists(view)) {
      val df = spark.read.parquet(path)
      val normalized = df.schema.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
      normalized.createOrReplaceTempView(view)
    }
    spark.table(view)
  }

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
