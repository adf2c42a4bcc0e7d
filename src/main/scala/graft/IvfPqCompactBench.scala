package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Prices the SMALL-FILES effect the q184 file audit alarms on and
  * the q183 compaction repairs — the fragmentation cost a streamed
  * index pays with its WRITE HISTORY while its rows never change.
  *
  * Shape: build the shipped-parameter IVFADC tree on the corpus
  * minus a holdout (the q170 split: `vec_id % 7 = 3` held out), then
  * append the holdout in `SPARK_GRAFT_APPENDS` (default 16) tagged
  * batches — exactly what the streaming append sink does per
  * micro-batch, each batch scattering a part file into every cell
  * partition it touches. The fragmented tree and the compacted tree
  * hold IDENTICAL rows (q183's gate pins that bit-equal), so the
  * probe delta is pure file-count: per-file open + footer decode +
  * scan-task scheduling, paid inside the probed cells every query
  * batch. Local-FS numbers are the FLOOR of the effect — an object
  * store bills a round-trip per file open, so the 100 TB delta is
  * strictly worse than what this bench shows.
  *
  * Prints one `COMPACT <k>=<v>…` line per measurement: the file
  * audit before/after (n_files, files_per_cell_milli, decision),
  * probe seconds before/after (min of 2, forced via noop write,
  * plan+scan both inside the clock — fragmentation taxes BOTH), and
  * the one-shot compaction cost.
  *
  * Usage: `runMain graft.IvfPqCompactBench <sfDir>` (the vec-decade
  * corpora: /tmp/vec1m, /tmp/vec4m). */
object IvfPqCompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val nAppends = sys.env.get("SPARK_GRAFT_APPENDS").map(_.toInt)
      .getOrElse(16)
    val spark = GraftSession.local(cpus, "graft-ivfpq-compact")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val q = emb.filter(col("vec_id") < 2000 && col("vec_id") % 10 === 0)
      .localCheckpoint()

    val tmp = sys.props("java.io.tmpdir")
    val frag = s"$tmp/graft_cptbench_frag"
    val t0 = System.nanoTime()
    Pq.buildIvfPqIndex(corpus.filter(col("vec_id") % 7 =!= 3),
      "vec_id", "embedding", dim = 64, m = 8, k = 64, iters = 2,
      centroids = 32, path = frag, assignments = 2)
    println(f"COMPACT build=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(corpus minus holdout)")
    // the streaming-ingest history: the holdout lands in nAppends
    // tagged micro-batches, each scattering files into the cells
    val holdout = corpus.filter(col("vec_id") % 7 === 3)
    val tA = System.nanoTime()
    (0 until nAppends).foreach { i =>
      Pq.appendIvfPqIndex(
        holdout.filter(pmod(col("vec_id"), lit(7L * nAppends))
          === lit(3L + 7L * i)),
        "vec_id", "embedding", frag, batchTag = Some(s"batch$i"))
    }
    println(f"COMPACT appends=$nAppends in ${(System.nanoTime() - tA) / 1e9}%.1f s")

    def auditLine(tag: String, path: String): Unit = {
      val a = Pq.fileAudit(spark, path).collect().head
      println(s"COMPACT audit_$tag n_cells=${a.getLong(0)} " +
        s"n_files=${a.getLong(1)} n_orphans=${a.getLong(2)} " +
        s"files_per_cell_milli=${a.getLong(3)} decision=${a.getString(4)}")
    }
    def probeMin2(tag: String, path: String): Unit = {
      val ts = (1 to 2).map { _ =>
        val s0 = System.nanoTime()
        Pq.ivfPqCandidates(q, path, dim = 64, topK = 50, probes = 12,
            "vec_id", "embedding")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
      println(f"COMPACT probe_$tag ${ts.min}%.2f s (runs ${
        ts.map(t => f"$t%.2f").mkString("/")})")
    }

    auditLine("fragmented", frag)
    probeMin2("fragmented", frag)

    val cpt = s"$tmp/graft_cptbench_cpt"
    val tC = System.nanoTime()
    Pq.compactIvfPqIndex(spark, frag, cpt)
    println(f"COMPACT compact_cost=${(System.nanoTime() - tC) / 1e9}%.1f s")
    auditLine("compacted", cpt)
    probeMin2("compacted", cpt)

    // honesty check, not a gate: identical row counts (the bit-equal
    // contract is q183's oracle; this is the cheap scale-run version)
    val nf = spark.read.parquet(s"$frag/codes").count()
    val nc = spark.read.parquet(s"$cpt/codes").count()
    println(s"COMPACT rows fragmented=$nf compacted=$nc equal=${nf == nc}")

    // round-17 (verdict #6): the OBJECT-STORE open-cost model,
    // measured rather than modeled — serve the IDENTICAL trees
    // through [[graft.sources.SlowOpenFileSystem]] (`slow://` = local
    // bytes + a per-open sleep) at each delay in
    // SPARK_GRAFT_OPEN_DELAY_MS (comma-separated, e.g. "10,25,50" ≈
    // S3 first-byte latitudes). Local numbers are the tax FLOOR; these
    // rows are where the q184/fileAudit `factor` threshold gets
    // re-derived for remote stores (BASELINE.md table).
    sys.env.get("SPARK_GRAFT_OPEN_DELAY_MS").foreach { ds =>
      ds.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).foreach { d =>
        graft.sources.SlowOpenFileSystem.register(spark, d)
        probeMin2(s"fragmented_open${d}ms",
          graft.sources.SlowOpenFileSystem.slowPath(frag))
        probeMin2(s"compacted_open${d}ms",
          graft.sources.SlowOpenFileSystem.slowPath(cpt))
      }
    }
    spark.stop()
  }
}
