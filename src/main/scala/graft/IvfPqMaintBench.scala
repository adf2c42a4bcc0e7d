package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Measures the q170 claim: incremental IVFADC maintenance costs the
  * BATCH share, a full rebuild costs the corpus. Three timings on the
  * given SF dir's embeddings (corpus = vec_id % 10 ≠ 0, ingest batch
  * = the % 7 = 3 slice ≈ 1/7 of it):
  *
  *  1. `full_build` — [[Pq.buildIvfPqIndex]] over the whole corpus
  *     (what a rebuild-on-ingest deployment would pay per refresh);
  *  2. `standing_build` — the same build over corpus − batch (paid
  *     ONCE, before the batch exists; printed for context);
  *  3. `append` — [[Pq.appendIvfPqIndex]] of the batch into the
  *     standing index (what the incremental deployment pays per
  *     refresh instead of #1);
  *  4. `rebalance` — [[Pq.rebalanceIvfPqIndex]] of the appended tree
  *     over the grown corpus (the middle rung: new coarse cells,
  *     standing PQ codebooks, full re-encode — what the q172
  *     occupancy alarm triggers).
  *
  * Usage: `runMain graft.IvfPqMaintBench <sfDir>`; prints one
  * `MAINT …` line per timing.
  */
object IvfPqMaintBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-ivfpq-maint")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val items = emb.filter(col("vec_id") % 10 =!= 0)
    val old = items.filter(col("vec_id") % 7 =!= 3)
    val batch = items.filter(col("vec_id") % 7 === 3)
    val tmp = sys.props("java.io.tmpdir")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"MAINT $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("full_build") {
      Pq.buildIvfPqIndex(items, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, centroids = 32,
        path = s"$tmp/graft_maint_full", assignments = 2)
    }
    timed("standing_build") {
      Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, centroids = 32,
        path = s"$tmp/graft_maint_standing", assignments = 2)
    }
    timed("append") {
      Pq.appendIvfPqIndex(batch, "vec_id", "embedding",
        s"$tmp/graft_maint_standing")
    }
    timed("rebalance") {
      Pq.rebalanceIvfPqIndex(items, "vec_id", "embedding",
        s"$tmp/graft_maint_standing", s"$tmp/graft_maint_rebal")
    }
    // sanity: the appended index covers the full corpus row count
    val n = spark.read.parquet(s"$tmp/graft_maint_standing/codes").count()
    val nf = spark.read.parquet(s"$tmp/graft_maint_full/codes").count()
    println(s"MAINT rows appended=$n full=$nf")
    spark.stop()
  }
}
