package graft.sources

import graft.SparkSpec

/** [[SlowOpenFileSystem]] — the measured object-store cost model:
  * `slow:///p` serves the same bytes as `/p`, with a per-open latency
  * the conf injects. */
class SlowOpenFileSystemSpec extends SparkSpec {
  import spark.implicits._

  test("slow:// serves identical rows and pays the per-open delay") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_slowfs_spec"
    (1L to 100L).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)

    SlowOpenFileSystem.register(spark, 0L)
    val slow = SlowOpenFileSystem.slowPath(dir)
    val viaSlow = spark.read.parquet(slow).collect().map(_.getLong(0)).sorted
    val viaLocal = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(viaSlow.toSeq == viaLocal.toSeq)

    // with a 300 ms per-open delay, even one file's footer+data opens
    // make the read measurably slower than the free twin — loose
    // bound (≥ one delay) so host noise can't flake it
    SlowOpenFileSystem.register(spark, 300L)
    val t0 = System.nanoTime()
    spark.read.parquet(slow).collect()
    val slowSec = (System.nanoTime() - t0) / 1e9
    assert(slowSec >= 0.3,
      f"a 300 ms-per-open read finished in $slowSec%.3f s — the delay never applied")
    SlowOpenFileSystem.register(spark, 0L)
  }
}
