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
    def timed(name: String)(f: => Unit): Unit = {
      val best = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"ANNPROBE $name $best%.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("ivfpq_build") {
      Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, centroids = 32, path = ivfPath, assignments = 2)
    }
    timed("ivfpq_probe") {
      force(Pq.ivfPqCandidates(q, ivfPath, dim = 64, topK = 50,
        probes = 12, "vec_id", "embedding"))
    }
    timed("pq_build") {
      Pq.buildIndex(corpus, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, path = pqPath)
    }
    timed("pq_fullscan") {
      force(Pq.adcTopKFromIndex(q, pqPath, dim = 64, topK = 50,
        "vec_id", "embedding"))
    }
    println(s"ANNPROBE queries=${q.count()} corpus=${corpus.count()}")
    spark.stop()
  }
}
