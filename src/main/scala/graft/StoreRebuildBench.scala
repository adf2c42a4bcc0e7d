package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorStore

/** Prices [[graft.operators.VectorStore.rebuildStore]] — the repair
  * the q188/q189 election dispatches — at the data-bound decade, so
  * the cadence forecast's "book the rebuild N batches out" has a cost
  * on the other side of the ledger (the index side's number is
  * IvfPqCompactBench's 26–47 s compaction): build a store at each
  * bucket count, AGE it with tagged appends (multi-file buckets,
  * sortBy forfeited), then time the in-process rebuild-and-flip and
  * verify the audit flips back to `intact`/`keep`.
  *
  * Knobs (env): `SPARK_GRAFT_BUCKETS` (default 2048),
  * `SPARK_GRAFT_APPENDS` — number of aging append batches (default 4,
  * 50k rows each).
  *
  * Usage: `runMain graft.StoreRebuildBench <corpusDir>` (e.g.
  * /tmp/vec4m). Prints `SRB <step> buckets=<B> <secs> s` lines;
  * table lands in BASELINE.md.
  */
object StoreRebuildBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val buckets = sys.env.get("SPARK_GRAFT_BUCKETS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2048))
    val nAppends = sys.env.get("SPARK_GRAFT_APPENDS").map(_.toInt).getOrElse(4)
    val spark = GraftSession.local(cpus, "graft-store-rebuild")
    val emb = Tables.load(spark, dir, "embeddings")
    println(s"SRB corpus $dir n=${emb.count()}")

    def timed(label: String, b: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SRB $label buckets=$b ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    buckets.foreach { b =>
      val key = s"$dir#srb_$b"
      timed("build", b) {
        VectorStore.ensure(spark, key, emb, "vec_id", "embedding", buckets = b)
      }
      timed("age_appends", b) {
        (1 to nAppends).foreach { i =>
          VectorStore.appendVectors(spark, key,
            emb.orderBy(xxhash64(col("vec_id"), lit(i))).limit(50000)
              .select((col("vec_id") + i * 100000000L).as("vec_id"),
                col("embedding")),
            "vec_id", "embedding", batchTag = Some(s"age$i"))
        }
      }
      val aged = VectorStore.storeAudit(spark, key).collect().head
      println(s"SRB aged_audit buckets=$b sorted_scan=" +
        s"${aged.getAs[String]("sorted_scan")} n_files=${aged.getAs[Long]("n_files")}")
      timed("rebuild_and_flip", b) {
        VectorStore.rebuildStore(spark, key)
      }
      val fresh = VectorStore.storeAudit(spark, key).collect().head
      println(s"SRB rebuilt_audit buckets=$b sorted_scan=" +
        s"${fresh.getAs[String]("sorted_scan")} n_files=${fresh.getAs[Long]("n_files")}" +
        s" decision=${fresh.getAs[String]("decision")}")
      require(fresh.getAs[String]("sorted_scan") == "intact")
    }
    spark.stop()
  }
}
