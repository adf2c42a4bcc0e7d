package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.{SparkSpec, Tables}

/** Regression gate for the TIMESTAMP_NTZ testdata shape (VERDICT r8).
  *
  * The driver's `events.parquet` regenerated as tz-less timestamp[us]
  * (the pandas/pyarrow default), which Spark infers as TIMESTAMP_NTZ —
  * a type `unix_micros` and the rest of the time-arithmetic surface
  * reject at analysis. [[graft.Tables.load]] must normalize that shape
  * to session-local TIMESTAMP (exact under the pinned UTC session), so
  * a future testdata regeneration can't silently break the engine.
  */
class NtzTablesSpec extends SparkSpec {

  /** Write a parquet fixture whose ts column is physically tz-less
    * (isAdjustedToUTC=false), mirroring what pandas/pyarrow emit.
    */
  private def writeNtzFixture(): String = {
    val dir = Files.createTempDirectory("graft-ntz").toFile
    dir.deleteOnExit()
    import spark.implicits._
    val df = Seq(
      (1L, "2024-03-01 00:00:00.000001", 10L),
      (2L, "2024-03-01 12:30:45.500000", 11L),
      (3L, "2024-03-02 23:59:59.999999", 10L)
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", to_timestamp_ntz($"ts_s"))
      .drop("ts_s")
    assert(df.schema("ts").dataType == TimestampNTZType)
    df.coalesce(1).write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
    dir.getPath
  }

  test("Tables.load normalizes a tz-less parquet ts column to TIMESTAMP") {
    val dir = writeNtzFixture()
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts surfaced as ${ev.schema("ts").dataType}; time arithmetic would fail analysis")
    // The analysis failure mode of the r8 regression: unix_micros on NTZ
    // throws DATATYPE_MISMATCH. Must both analyze and produce the exact
    // UTC instants the tz-less literals denote.
    val micros = ev.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val expected = Array(
      1709251200000001L, // 2024-03-01T00:00:00.000001Z
      1709296245500000L, // 2024-03-01T12:30:45.500000Z
      1709423999999999L  // 2024-03-02T23:59:59.999999Z
    )
    assert(micros.sameElements(expected), s"got ${micros.mkString(",")}")
  }

  test("real driver testdata events.ts loads as TIMESTAMP and unix_micros analyzes") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // End-to-end through the exact call shape that broke in r8.
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
