package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** A local filesystem whose every file OPEN pays a configurable
  * latency — the object-store cost model for the small-files tax
  * (round-16 verdict #6). The local-FS compaction numbers in
  * BASELINE.md are the FLOOR of the write-history tax: local opens
  * cost ~0.05–0.2 ms, while an object store bills a full round-trip
  * per GET (S3 first-byte ~10–50 ms; the parquet reader opens each
  * file at least twice — footer, then row groups). This wrapper makes
  * that knob MEASURABLE instead of modeled: register it under the
  * `slow://` scheme, point the probe at `slow:///same/local/tree`,
  * and the identical bytes are served with per-open latency injected
  * — so the fragmented-vs-compacted probe delta under 10–50 ms opens
  * is a measurement, not an extrapolation (IvfPqCompactBench's
  * `SPARK_GRAFT_OPEN_DELAY_MS`; re-derivation table in BASELINE.md).
  *
  * Registration (hadoop conf, settable on a live session):
  * {{{
  *   sc.hadoopConfiguration.set("fs.slow.impl",
  *     classOf[graft.sources.SlowOpenFileSystem].getName)
  *   sc.hadoopConfiguration.setLong("fs.slow.open.delay.ms", 25L)
  * }}}
  *
  * Extends [[RawLocalFileSystem]] (no checksum shadow files), so a
  * `slow:///p` tree is byte-identical to `file:/p` — only open()
  * latency differs. The delay is per open() CALL: metadata ops
  * (listing, getFileStatus) stay free, matching the part of an object
  * store's profile this model prices (LIST costs are a separate knob
  * a deployment adds the same way). */
class SlowOpenFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "slow"

  override def getUri: URI = URI.create("slow:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val delay = getConf.getLong(SlowOpenFileSystem.DelayKey, 0L)
    if (delay > 0L) Thread.sleep(delay)
    super.open(f, bufferSize)
  }
}

object SlowOpenFileSystem {
  val DelayKey = "fs.slow.open.delay.ms"

  /** Register the scheme + delay on a live session and return the
    * `slow://` twin of a local path. */
  def register(spark: org.apache.spark.sql.SparkSession, delayMs: Long): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slow.impl", classOf[SlowOpenFileSystem].getName)
    // no fs-cache entry for the scheme: each getFileSystem reads the
    // LIVE conf, so a re-register with a new delay takes effect
    // without closing the process-wide fs cache under a running job
    hc.setBoolean("fs.slow.impl.disable.cache", true)
    hc.setLong(DelayKey, delayMs)
  }

  def slowPath(localPath: String): String =
    "slow://" + (if (localPath.startsWith("/")) localPath else "/" + localPath)
}
