package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Pq, SimilaritySearch, TopK}

/** Runs the WHOLE ANN maintenance loop on two canonical DRIFTED
  * ingests — the live demonstration the unit-fired decision branches
  * and the near-uniform gate corpus cannot give. Each scenario
  * appends a distribution-shifted copy of the corpus into (a copy of)
  * the same standing index, audits it with both alarms, then prices
  * all three ladder arms (append / rebalance / full rebuild) on probe
  * latency AND exact-re-rank recall@5 for queries drawn from the
  * drifted region:
  *
  *  - `compress` (x → 0.1·x): the corpus collapses toward the origin.
  *    A CODEBOOK event — occupancy stays balanced (on a norm-uniform
  *    corpus the ball spreads across cells via the correlation term)
  *    while the q171-style audit fires `retrain` (~14 % error
  *    buy-back). And the measured punchline is the honest one: at
  *    this bit budget NO ladder arm restores recall@5 inside the
  *    collapsed ball (mutual distances fall below PQ resolution —
  *    high-dim near-degenerate neighborhoods). Since round 15 that
  *    dead end is instrumented and wired: the q178 resolution audit
  *    (per-cell code-tuple census, [[graft.operators.Pq
  *    .resolutionAudit]]) fires `bit_budget` on exactly this
  *    scenario's REBUILT tree and nowhere else, and the exact-vector
  *    IVF fallback arm (q179's dispatch target, measured below)
  *    restores the recall every PQ arm loses at the same probe
  *    shape.
  *  - `shift` (x → x + 0.3): the corpus translates; mutual distances
  *    are PRESERVED. An OCCUPANCY event — every shifted point chases
  *    the few standing centroids with the largest component along the
  *    shift direction, so the q172 alarm fires on append (measured
  *    skew 7607, max cell 17k of 72k) and hot-region probes scan the
  *    bloated cells. Residuals are translation-invariant, so q173's
  *    coarse-only rebalance restores recall to the rebuild's level
  *    (0.032 → 0.411 vs 0.417) at ~30 % of the rebuild's cost —
  *    rebuild-quality results at the middle rung's price.
  *
  * Together the two scenarios justify the q174 ladder: alarms
  * diagnose WHICH event happened, and the cheapest sufficient op
  * differs per event. Two honest nuances the run surfaces: (1) the
  * flat-subvector codebook audit ALSO fires on the translation (any
  * distribution move shifts flat codebooks) although the rebalance
  * proves sufficient — a residual-space drift audit (residuals vs the
  * re-cut coarse) would separate the two events and is the documented
  * refinement; (2) on the bimodal grown corpus the re-cut tree's own
  * occupancy audit keeps complaining (a balanced cut need not exist
  * over clustered data) while latency and recall are fine — skew is a
  * probe-latency FORECAST, not a quality signal, and its alarm is an
  * upper bound, not a fixpoint criterion.
  *
  * Usage: `runMain graft.AnnDriftBench <sfDir>`; prints `DRIFT …`
  * lines. Probe timings are min of 2 same-JVM runs (warm plan).
  */
object AnnDriftBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-ann-drift")
    val tmp = sys.props("java.io.tmpdir")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIFT $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val items = emb.filter(col("vec_id") % 10 =!= 0)

    // ONE standing index, copied per scenario (append mutates it)
    val standing0 = s"$tmp/graft_drift_standing"
    timed("standing_build") {
      Pq.buildIvfPqIndex(items, "vec_id", "embedding", dim = 64, m = 8,
        k = 64, iters = 2, centroids = 32, path = standing0,
        assignments = 2)
    }
    def copyTree(src: String, dst: String): Unit = {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sessionState.newHadoopConf()
      val fs = new Path(src).getFileSystem(conf)
      if (fs.exists(new Path(dst))) fs.delete(new Path(dst), true)
      FileUtil.copy(fs, new Path(src), fs, new Path(dst), false, conf)
    }

    val scenarios: Seq[(String, Column => Column)] = Seq(
      ("compress", c => transform(c, x => x * lit(0.1f))),
      ("shift", c => transform(c, x => x + lit(0.3f))))

    scenarios.foreach { case (scen, tf) =>
      val batch = items.select((col("vec_id") + 10000000L).as("vec_id"),
        tf(col("embedding")).as("embedding"))
      val grown = items.unionByName(batch)

      val appended = s"$tmp/graft_drift_${scen}_appended"
      copyTree(standing0, appended)
      timed(s"${scen}_append") {
        Pq.appendIvfPqIndex(batch, "vec_id", "embedding", appended)
      }
      println(s"DRIFT ${scen} occupancy appended: " +
        Pq.occupancyAudit(spark, appended).collect().head)

      // the q171-style codebook-drift audit on this ingest (audit
      // budget m=4/k=16; exact integer reconstruction error)
      val standingCbs = Pq.codebooks(items, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, iters = 2)
      val retrainedCbs = Pq.codebooks(grown, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, iters = 2)
      def reconErr(cbs: Seq[Seq[(Long, Seq[Long])]]): Long =
        Pq.encodeWith(grown, "vec_id", "embedding", 64, cbs)
          .agg(sum(col("recon_err"))).collect().head.getLong(0)
      val (eOld, eNew) = (reconErr(standingCbs), reconErr(retrainedCbs))
      println(s"DRIFT ${scen} codebook audit: err_standing=$eOld " +
        s"err_retrained=$eNew decision=${
          if ((eOld - eNew) * 20 > eNew) "retrain" else "keep"}")
      // the residual-space audit (q175's instrument): prices the
      // standing codebooks in the post-rebalance representation —
      // should say `keep` for the translation (rebalance suffices)
      // and `retrain` for the compression (it does not)
      println(s"DRIFT ${scen} residual audit: " +
        Pq.residualDriftAudit(items, grown, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, iters = 2, centroids = 32)
          .collect().head)

      val rebal = s"$tmp/graft_drift_${scen}_rebal"
      timed(s"${scen}_rebalance") {
        Pq.rebalanceIvfPqIndex(grown, "vec_id", "embedding", appended, rebal)
      }
      println(s"DRIFT ${scen} occupancy rebalanced: " +
        Pq.occupancyAudit(spark, rebal).collect().head)

      val rebuild = s"$tmp/graft_drift_${scen}_rebuild"
      timed(s"${scen}_full_rebuild") {
        Pq.buildIvfPqIndex(grown, "vec_id", "embedding", dim = 64, m = 8,
          k = 64, iters = 2, centroids = 32, path = rebuild,
          assignments = 2)
      }

      // hot-region queries: held-out ids, drifted like the batch (the
      // AnnProbeBench fixed-|Q| convention — 200 logical queries)
      val hotQ = emb.filter(col("vec_id") < 2000 && col("vec_id") % 10 === 0)
        .select(col("vec_id"), tf(col("embedding")).as("embedding"))
        .localCheckpoint()
      def candidates(path: String): DataFrame =
        Pq.ivfPqCandidates(hotQ, path, dim = 64, topK = 50, probes = 12,
          "vec_id", "embedding")
      def probeTimed(arm: String, path: String): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          force(candidates(path))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"DRIFT ${scen} probe_$arm ${ts.min}%.2f s " +
          s"(runs ${ts.map(t => f"$t%.2f").mkString("/")})")
      }
      probeTimed("appended", appended)
      probeTimed("rebalanced", rebal)
      probeTimed("rebuilt", rebuild)

      // exact ground truth over the grown corpus, and the
      // exact-re-rank recall@5 each arm's candidates deliver.
      // Threshold counting (round-15 advice, and load-bearing HERE:
      // the collapsed ball is all ties, so id-set intersection would
      // punish an arm for returning equally-nearest ball members):
      // an arm neighbor counts whenever it is at least as close as
      // the exact 5th, capped at 5 per query.
      def top5(scored: DataFrame): Map[Long, Seq[(Long, Double)]] = scored
        .groupBy(col("q_id"))
        .agg(TopK.topK(5)(col("d"), col("i_id"), col("i_id")).as("top"))
        .select(col("q_id"), explode(col("top")).as("n"))
        .select(col("q_id"), col("n.id"), col("n.dist"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .toSeq.groupBy(_._1).map { case (qid, xs) => qid -> xs.map(_._2) }
      val exact = top5(
        hotQ.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
          .crossJoin(grown.select(col("vec_id").as("i_id"),
            col("embedding").as("ie")))
          .select(col("q_id"),
            VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("d"),
            col("i_id")))
      val exactN = exact.valuesIterator.map(_.size).sum
      val d5 = exact.map { case (qid, ms) => qid -> ms.map(_._2).max }
      def recallOf(cand: DataFrame): Double = {
        val got = top5(cand
          .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
          .join(hotQ.select(col("vec_id").as("q_id"),
            col("embedding").as("qe")), "q_id")
          .join(grown.select(col("vec_id").as("i_id"),
            col("embedding").as("ie")).hint("shuffle_hash"), "i_id")
          .select(col("q_id"),
            VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("d"),
            col("i_id")))
        got.iterator.map { case (qid, ms) =>
          math.min(exact.getOrElse(qid, Nil).size,
            ms.count(_._2 <= d5.getOrElse(qid, Double.NegativeInfinity)))
        }.sum.toDouble / exactN
      }
      def recall(path: String): Double = recallOf(candidates(path))
      println(f"DRIFT ${scen} recall5 appended=${recall(appended)}%.3f " +
        f"rebalanced=${recall(rebal)}%.3f rebuilt=${recall(rebuild)}%.3f")

      // the q176 arm where it matters: the SKEWED appended tree. Fixed
      // probes=12 pays the hot cell on every probe that touches it; a
      // scan budget bounds ROWS instead. Budget points at 1/16, 1/8,
      // 1/4, and 3/8 of the appended tree's total codes, each priced
      // on probe latency (min of 2 warm) AND exact-re-rank recall@5 —
      // the probes=12 rows above are the fixed-probe reference.
      val nCodes = Pq.occupancyAudit(spark, appended)
        .select(col("n_codes")).collect().head.getLong(0)
      (Seq(16L, 8L, 4L).map(nCodes / _) :+ nCodes * 3 / 8).foreach { b =>
        def cand = Pq.ivfPqCandidatesBudget(hotQ, appended, dim = 64,
          topK = 50, scanBudget = b, "vec_id", "embedding")
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          force(cand)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"DRIFT ${scen} budget=$b probe ${ts.min}%.2f s " +
          f"recall5=${recallOf(cand)}%.3f")
      }

      // the q178 resolution audit on all three PQ trees: the verdict
      // must fire exactly where no refresh helps (the compress
      // REBUILD — post-retrain, codes still collide) and stay `fit`
      // on the translation event a rebalance fixes
      Seq("appended" -> appended, "rebalanced" -> rebal,
          "rebuilt" -> rebuild).foreach { case (arm, p) =>
        println(s"DRIFT ${scen} resolution_$arm: " +
          Pq.resolutionAudit(spark, p).collect().head)
      }

      // the WIRED fallback (q179's arm) on the same ingest: the q146
      // exact-vector IVF layout over the grown corpus at the SAME
      // probe shape as the IVFADC trees (32 cells / 12 probes / 2
      // assignments — identical 75 % scan share, but the cells store
      // VECTORS and distances are exact floats, so quantization can't
      // erase the collapsed ball's mutual distances). This is the arm
      // the `bit_budget` verdict dispatches to, priced on the event
      // where every PQ ladder arm fails.
      val exactIvf = s"$tmp/graft_drift_${scen}_exact_ivf"
      timed(s"${scen}_exact_ivf_build") {
        SimilaritySearch.buildIvfIndex(grown, "vec_id", "embedding",
          centroids = 32, assignments = 2, exactIvf)
      }
      def exactCand = SimilaritySearch.ivfTopKFromIndex(hotQ, exactIvf,
          k = 5, "vec_id", "embedding", probes = 12)
        .select(col("query_id"), col("neighbor_id"))
      val tsE = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        force(exactCand)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DRIFT ${scen} exact_fallback probe ${tsE.min}%.2f s " +
        f"recall5=${recallOf(exactCand)}%.3f")

      if (scen == "compress") {
        // the "MORE BITS" escalation arm (round-16): the q178
        // scaladoc names two escalations — raise m·log₂k, or the
        // exact-vector path — and only the second was priced. Rebuild
        // the compress-drift tree at raised bit budgets and put
        // build/probe/recall AND the resolution verdict at each
        // budget next to the exact arm's row, so the dispatch's
        // byte-budget trade is measured, not argued. Bits per item:
        // shipped m8k64 = 48, m8k256 = 64, m16k64 = 96, m16k256 =
        // 128 — vs 2 048 byte-equivalent for float32 vectors.
        Seq(("m8k256", 8, 256), ("m16k64", 16, 64),
            ("m16k256", 16, 256)).foreach { case (tag, mm, kk) =>
          val p = s"$tmp/graft_drift_${scen}_bits_$tag"
          timed(s"${scen}_bits_${tag}_build") {
            Pq.buildIvfPqIndex(grown, "vec_id", "embedding", dim = 64,
              m = mm, k = kk, iters = 2, centroids = 32, path = p,
              assignments = 2)
          }
          def cand = Pq.ivfPqCandidates(hotQ, p, dim = 64, topK = 50,
            probes = 12, "vec_id", "embedding")
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            force(cand)
            (System.nanoTime() - t0) / 1e9
          }
          println(f"DRIFT ${scen} bits_$tag probe ${ts.min}%.2f s " +
            f"recall5=${recallOf(cand)}%.3f")
          println(s"DRIFT ${scen} bits_$tag resolution: " +
            Pq.resolutionAudit(spark, p).collect().head)
        }

        // the INT8 middle rung (round-16): q146's exact layout with
        // byte cells — 8× fewer probed bytes than the float64 exact
        // arm. The collapsed ball's MUTUAL gaps are 0.1·(original
        // gaps), the int8 step is absMax/127 of the mixed corpus —
        // whether the ball still resolves at this representation is
        // exactly what the rung's own publish-time stamp answers.
        val int8Ivf = s"$tmp/graft_drift_${scen}_int8_ivf"
        timed(s"${scen}_exact_int8_build") {
          SimilaritySearch.buildIvfIndexInt8(grown, "vec_id", "embedding",
            centroids = 32, assignments = 2, int8Ivf)
        }
        println(s"DRIFT ${scen} exact_int8 stamp: " +
          spark.read.parquet(s"$int8Ivf/resolution").collect().head)
        def int8Cand = SimilaritySearch.ivfTopKFromIndexInt8(hotQ, int8Ivf,
            k = 5, "vec_id", "embedding", probes = 12)
          .select(col("query_id"), col("neighbor_id"))
        val ts8 = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          force(int8Cand)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"DRIFT ${scen} exact_int8 probe ${ts8.min}%.2f s " +
          f"recall5=${recallOf(int8Cand)}%.3f")
      }
    }
    spark.stop()
  }
}
