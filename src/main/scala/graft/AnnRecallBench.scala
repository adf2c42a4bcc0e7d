package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Pq, TopK}

/** Pins RECALL at the data-bound decade — the round-14 verdict's
  * missing measurement: vec1m/vec4m priced probe LATENCY and
  * maintenance cost, but no recall gate ran at ≥ 1 M items with the
  * shipped IVFADC parameters (BASELINE.md's recall rows stopped at
  * sf1). Same sampled-exact discipline as the q44 gate: a FIXED
  * 200-query batch (replica-0 ids — the same logical queries at
  * every scale), exact squared-Euclidean top-5 over the full corpus
  * as ground truth (sample × corpus — bounded, the whole point of
  * sampling the gate), and rerank-50 recall@5 for each search arm:
  *
  *  - `ivfpq_probes12` — [[Pq.ivfPqCandidates]] at the shipped
  *    parameters (q167's), exact re-rank of the wide top-50;
  *  - `ivfpq_budget_<b>` — the q176 scan-budget walk at each budget
  *    in `SPARK_GRAFT_BUDGETS` (comma-separated), re-ranked the same;
  *  - `pq_fullscan` — the unpruned full-scan ADC contrast
  *    ([[Pq.adcTopKFromIndex]]) when `SPARK_GRAFT_PQ_INDEX` points at
  *    a q165-layout artifact.
  *
  * The expectation going in was recall ≈ scan share (the sf0.1 sweep
  * finding on this near-uniform corpus); the measurement REFUTED it
  * at 10⁶–10⁷ codes: at a fixed rerank width recall@5 decays with
  * corpus size while being nearly FLAT in scan share (budget 1/16 ≈
  * fixed probes ≈ the 100 % full scan), because the binding
  * constraint is how many of the true top-5 survive into the
  * width-bounded ADC candidate pool as the corpus grows around it.
  * `SPARK_GRAFT_TOPK` sweeps the width (default 50, the gates'
  * setting) — widening it is the recall lever at this decade, and it
  * prices as a larger re-rank join (width·|Q| vector lookups), not a
  * deeper scan. Numbers in BASELINE.md's data-bound recall table.
  *
  * `SPARK_GRAFT_REUSE_IVFPQ=<path>` probes an existing tree (layout
  * verified against the shipped parameters via the meta sidecar, the
  * AnnProbeBench contract) instead of paying a multi-10-minute build.
  *
  * Usage: `runMain graft.AnnRecallBench <sfDir>`; prints one
  * `RECALL <arm> recall5=<r> (<hits>/<n>)` line per arm.
  */
object AnnRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    // rerank width (the candidate pool the exact re-score sees):
    // default 50 = the shipped gates' width; the data-bound decade
    // measurement sweeps it because at 10⁶⁺ items recall@5 turns out
    // to be WIDTH-bound, not scan-share-bound
    val topK = sys.env.get("SPARK_GRAFT_TOPK").map(_.toInt).getOrElse(50)
    val spark = GraftSession.local(cpus, "graft-ann-recall")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val q = emb.filter(col("vec_id") < 2000 && col("vec_id") % 10 === 0)
      .localCheckpoint()

    val idx = sys.env.get("SPARK_GRAFT_REUSE_IVFPQ") match {
      case Some(p) =>
        val meta = Pq.readIvfPqMeta(spark, p)
        require(meta.dim == 64 && meta.m == 8 && meta.k == 64 &&
          meta.centroids == 32 && meta.assignments == 2,
          s"reused tree $p layout ${meta} != shipped 64/8/64/32/2")
        println(s"RECALL index reused $p")
        p
      case None =>
        val p = s"${sys.props("java.io.tmpdir")}/graft_annrecall_ivfpq"
        Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 64, m = 8,
          k = 64, iters = 2, centroids = 32, path = p, assignments = 2)
        p
    }

    // top-5 per query WITH the exact distances. TopK breaks rank-5
    // ties deterministically by (dist, id), but an arm whose candidate
    // set contains the OTHER equal-distance id would be penalized for
    // an equally-good answer — so recall below counts an arm neighbor
    // as a hit whenever it is at least as close as the exact 5th
    // (threshold counting, round-15 advice), capped at 5 per query.
    def top5(scored: DataFrame): Map[Long, Seq[(Long, Double)]] = scored
      .groupBy(col("q_id"))
      .agg(TopK.topK(5)(col("d"), col("i_id"), col("i_id")).as("top"))
      .select(col("q_id"), explode(col("top")).as("n"))
      .select(col("q_id"), col("n.id"), col("n.dist"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toSeq.groupBy(_._1).map { case (qid, xs) => qid -> xs.map(_._2) }

    // exact ground truth: sample × corpus, the q21 broadcast-query /
    // streaming-corpus plan with the native distance expression
    val exact = top5(
      q.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        .crossJoin(corpus.select(col("vec_id").as("i_id"),
          col("embedding").as("ie")))
        .select(col("q_id"),
          VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("d"),
          col("i_id")))
    val exactN = exact.valuesIterator.map(_.size).sum
    // the exact 5th-nearest distance per query — the hit threshold
    val d5 = exact.map { case (qid, ms) => qid -> ms.map(_._2).max }
    println(s"RECALL exact ground truth: $exactN pairs " +
      s"(queries=${q.count()}, corpus=${corpus.count()})")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def min2(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // the exact re-rank tail every PQ arm pays: width·|Q| vector
    // lookups + the bounded top-5 heap. Two implementations measured
    // side by side (round-17, verdict #1): the round-16 shape —
    // corpus-side shuffle_hash exchange per query batch — and the
    // id-keyed VECTOR STORE (bucketed+sorted by vec_id, candidates
    // broadcast, corpus side a bare scan with ZERO exchange), which
    // is what the gates now run
    def scoredOfShuffle(cand: DataFrame): DataFrame = cand
      .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
      .join(q.select(col("vec_id").as("q_id"),
        col("embedding").as("qe")), "q_id")
      .join(corpus.select(col("vec_id").as("i_id"),
        col("embedding").as("ie")).hint("shuffle_hash"), "i_id")
      .select(col("q_id"),
        VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("d"),
        col("i_id"))
    val tStore = {
      val t0 = System.nanoTime()
      graft.operators.VectorStore.ensure(spark, sfDir, emb,
        "vec_id", "embedding")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"RECALL vector store build=$tStore%.2f s (once per corpus)")
    val store = graft.operators.VectorStore.vectors(spark, sfDir)
    def scoredOfStore(cand: DataFrame): DataFrame = {
      val c = cand
        .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
        .join(q.select(col("vec_id").as("q_id"),
          col("embedding").as("qe")), "q_id")
      broadcast(c)
        .join(store.select(col("vec_id").as("i_id"), col("v").as("ie")), "i_id")
        .select(col("q_id"),
          VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("d"),
          col("i_id"))
    }

    // rerank-w recall@5 AND its price, decomposed: probe = candidate
    // generation alone; rerank = the exact re-score join + final
    // top-5 timed from MATERIALIZED candidates (localCheckpoint), so
    // the two legs don't contaminate each other — rerank is the leg
    // whose claimed corpus-size-independence this bench verifies,
    // timed under BOTH join shapes (store = the shipped path,
    // shuffle = the round-16 contrast)
    def recallOf(arm: String, cand: => DataFrame): Unit = {
      val tProbe = min2(force(cand))
      val candCp = cand.select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      def rerankTime(scored: DataFrame): Double =
        min2(force(scored.groupBy(col("q_id"))
          .agg(TopK.topK(5)(col("d"), col("i_id"), col("i_id")).as("top"))
          .select(col("q_id"), explode(col("top")).as("n"))))
      val scored = scoredOfStore(candCp)
      val tRerank = rerankTime(scored)
      val tRerankShuffle = rerankTime(scoredOfShuffle(candCp))
      val got = top5(scored)
      val hits = got.iterator.map { case (qid, ms) =>
        math.min(exact.getOrElse(qid, Nil).size,
          ms.count(_._2 <= d5.getOrElse(qid, Double.NegativeInfinity)))
      }.sum
      println(f"RECALL $arm probe=$tProbe%.2f s rerank=$tRerank%.2f s " +
        f"rerank_shuffle=$tRerankShuffle%.2f s " +
        f"total=${tProbe + tRerank}%.2f s " +
        f"recall5=${hits.toDouble / exactN}%.3f ($hits/$exactN)")
    }

    // the width SWEEP (round-16): SPARK_GRAFT_WIDTHS=50,100,200,400
    // prices the recall table's missing seconds column — one ground
    // truth, every width — next to the sizing rule's predictions
    val widths = sys.env.get("SPARK_GRAFT_WIDTHS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(Seq(topK))
    val nCorpus = corpus.count()
    widths.foreach { w =>
      println(s"RECALL rule n=$nCorpus w=$w " +
        s"estimate_milli=${Pq.estimateRerankRecallMilli(w.toLong, nCorpus)}")
    }
    Seq(300L, 500L, 700L).foreach { t =>
      println(s"RECALL rule n=$nCorpus target=$t " +
        s"sized_width=${Pq.sizeRerankWidth(nCorpus, t)}")
    }

    widths.foreach { w =>
      recallOf(s"ivfpq_probes12_w$w", Pq.ivfPqCandidates(q, idx, dim = 64,
        topK = w, probes = 12, "vec_id", "embedding"))
      sys.env.get("SPARK_GRAFT_BUDGETS").foreach { bs =>
        bs.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).foreach { b =>
          recallOf(s"ivfpq_budget_${b}_w$w", Pq.ivfPqCandidatesBudget(q, idx,
            dim = 64, topK = w, scanBudget = b, "vec_id", "embedding"))
        }
      }
      sys.env.get("SPARK_GRAFT_PQ_INDEX").foreach { p =>
        recallOf(s"pq_fullscan_w$w", Pq.adcTopKFromIndex(q, p, dim = 64,
          topK = w, "vec_id", "embedding"))
      }
    }

    // SPARK_GRAFT_INT8=1: the quantized middle rung at this decade —
    // q146's exact layout with byte cells (8× fewer probed bytes than
    // float64 cells, the same coarse pruning), the
    // `exact_int8` candidate the round-15 verdict asked to price
    if (sys.env.contains("SPARK_GRAFT_INT8")) {
      import graft.operators.SimilaritySearch
      val p = s"${sys.props("java.io.tmpdir")}/graft_annrecall_int8_ivf"
      val t0 = System.nanoTime()
      SimilaritySearch.buildIvfIndexInt8(corpus, "vec_id", "embedding",
        centroids = 64, assignments = 2, p)
      println(f"RECALL exact_int8_build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println("RECALL exact_int8 stamp: " +
        spark.read.parquet(s"$p/resolution").collect().head)
      recallOf("exact_int8_probes16",
        SimilaritySearch.ivfTopKFromIndexInt8(q, p, k = 5,
            "vec_id", "embedding", probes = 16)
          .select(col("query_id"), col("neighbor_id")))
    }
    // SPARK_GRAFT_EXACT_IVF=1: price the q179/q181 EXACT-VECTOR
    // fallback arm at this decade — q146's layout at the wired
    // parameters (64 cells / 16 probes / 2 assignments): cells store
    // vectors, so the probe scans ~probes·assignments/centroids of
    // the corpus at 42× the bytes-per-row of codes, buying exact
    // distances (recall limited ONLY by cell pruning — the honest
    // price/quality point of the escalation the bit-budget verdict
    // dispatches to)
    if (sys.env.contains("SPARK_GRAFT_EXACT_IVF")) {
      import graft.operators.SimilaritySearch
      val p = s"${sys.props("java.io.tmpdir")}/graft_annrecall_exact_ivf"
      val t0 = System.nanoTime()
      SimilaritySearch.buildIvfIndex(corpus, "vec_id", "embedding",
        centroids = 64, assignments = 2, p)
      println(f"RECALL exact_ivf_build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      def cand = SimilaritySearch.ivfTopKFromIndex(q, p, k = 5,
          "vec_id", "embedding", probes = 16)
        .select(col("query_id"), col("neighbor_id"))
      val ts = (1 to 2).map { _ =>
        val s0 = System.nanoTime()
        cand.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
      println(f"RECALL exact_ivf_probe ${ts.min}%.2f s (runs ${
        ts.map(t => f"$t%.2f").mkString("/")})")
      recallOf("exact_ivf_probes16", cand)
    }
    spark.stop()
  }
}
