package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Measures ANN search cost at a FIXED query batch against a growing
  * corpus — the deployment shape. The per-round gate queries (q165/
  * q167) draw their batch as `vec_id % 10 = 0`, so the batch grows
  * WITH the corpus and the gate's bench rows are |Q|·|corpus|
  * products (at sf10 that is 100× the sf1 product — correct for the
  * gate, wrong as a deployment number: a search service's query rate
  * does not scale with its index size). Here the batch is pinned to
  * the 200 replica-0 queries (`vec_id < 2000 AND vec_id % 10 = 0` —
  * the same logical vectors at every ScaleUp factor), so timings
  * across SF dirs isolate the corpus-side growth the probe design is
  * supposed to bound.
  *
  * Timings (REPEAT passes each, min kept, warm index):
  *  1. `ivfpq_build`  — [[Pq.buildIvfPqIndex]] over the corpus
  *     (vec_id % 10 ≠ 0), q167's parameters; paid once per corpus.
  *  2. `ivfpq_probe`  — [[Pq.ivfPqCandidates]] top-50 at probes=12
  *     (scan share = probes·assignments/centroids = 75% of codes).
  *  3. `pq_build`     — [[Pq.buildIndex]], the q165 full-scan
  *     artifact, for the unpruned contrast.
  *  4. `pq_fullscan`  — [[Pq.adcTopKFromIndex]] top-50 (reads 100%
  *     of codes).
  *
  * Usage: `runMain graft.AnnProbeBench <sfDir>`; prints one
  * `ANNPROBE <name> <sec> s` line per timing.
  */
object AnnProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2)
    // builds dominate wall-clock at the 10⁶-vector decade (a vec4m
    // IVFADC build is ~25 min) — SPARK_GRAFT_BUILD_REPEAT=1 pays each
    // build once while the probe/fullscan timings keep their
    // min-of-`repeat` warm-plan discipline
    val buildRepeat = sys.env.get("SPARK_GRAFT_BUILD_REPEAT")
      .map(_.toInt).getOrElse(repeat)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-ann-probe")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    // replica-0 batch: the same 200 logical queries at every SF
    val q = emb.filter(col("vec_id") < 2000 && col("vec_id") % 10 === 0)
    val tmp = sys.props("java.io.tmpdir")
    val ivfPath = s"$tmp/graft_annprobe_ivfpq"
    val pqPath = s"$tmp/graft_annprobe_pq"
    def timedN(name: String, n: Int)(f: => Unit): Unit = {
      val best = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"ANNPROBE $name $best%.2f s")
    }
    def timed(name: String)(f: => Unit): Unit = timedN(name, repeat)(f)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_REUSE_IVFPQ=<path>: probe an index that already
    // exists (e.g. IvfPqMaintBench's full-corpus tree, built with the
    // SAME parameters over the SAME corpus split) instead of paying a
    // multi-10-minute build twice at the 10⁶-vector decade
    sys.env.get("SPARK_GRAFT_REUSE_IVFPQ") match {
      case Some(p) =>
        // the reused tree must have been built with THIS bench's
        // parameters or the probe timings silently stop being
        // comparable with the built-here rows (round-15 advice: only
        // dim was verified downstream). The meta sidecar records the
        // build layout, so require it and print it on the record.
        val meta = Pq.readIvfPqMeta(spark, p)
        require(meta.dim == 64 && meta.m == 8 && meta.k == 64 &&
          meta.centroids == 32 && meta.assignments == 2,
          s"SPARK_GRAFT_REUSE_IVFPQ=$p was built with dim=${meta.dim} " +
            s"m=${meta.m} k=${meta.k} centroids=${meta.centroids} " +
            s"assignments=${meta.assignments}; this bench's layout is " +
            "dim=64 m=8 k=64 centroids=32 assignments=2 — timings " +
            "would not be comparable")
        println(s"ANNPROBE ivfpq_build reused $p (dim=${meta.dim} " +
          s"m=${meta.m} k=${meta.k} centroids=${meta.centroids} " +
          s"assignments=${meta.assignments})")
      case None =>
        timedN("ivfpq_build", buildRepeat) {
          Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 64, m = 8,
            k = 64, iters = 2, centroids = 32, path = ivfPath, assignments = 2)
        }
    }
    val probeIdx = sys.env.getOrElse("SPARK_GRAFT_REUSE_IVFPQ", ivfPath)
    timed("ivfpq_probe") {
      force(Pq.ivfPqCandidates(q, probeIdx, dim = 64, topK = 50,
        probes = 12, "vec_id", "embedding"))
    }
    // SPARK_GRAFT_BUDGETS=b1,b2,…: time the scan-budget dial (q176's
    // operator) on the same index and query batch — rows-bounded
    // probing against the fixed probes=12 reference above
    sys.env.get("SPARK_GRAFT_BUDGETS").foreach { bs =>
      bs.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).foreach { b =>
        timed(s"ivfpq_budget_$b") {
          force(Pq.ivfPqCandidatesBudget(q, probeIdx, dim = 64, topK = 50,
            scanBudget = b, "vec_id", "embedding"))
        }
      }
    }
    // SPARK_GRAFT_SKIP_PQ=1 drops the full-scan contrast (its build is
    // another multi-10-minute pass at the 10⁶-vector decade; the
    // scan-share growth contrast is already carried by smaller SFs)
    if (!sys.env.contains("SPARK_GRAFT_SKIP_PQ")) {
      timedN("pq_build", buildRepeat) {
        Pq.buildIndex(corpus, "vec_id", "embedding", dim = 64, m = 8,
          k = 64, iters = 2, path = pqPath)
      }
      timed("pq_fullscan") {
        force(Pq.adcTopKFromIndex(q, pqPath, dim = 64, topK = 50,
          "vec_id", "embedding"))
      }
    }
    println(s"ANNPROBE queries=${q.count()} corpus=${corpus.count()}")
    spark.stop()
  }
}
