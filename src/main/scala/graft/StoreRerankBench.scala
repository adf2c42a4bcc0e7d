package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VectorStore

/** Prices the vector-store RE-RANK leg at the data-bound decade under
  * every regime the operator ships (round-18 verdict #2/#7): the
  * broadcast regime with and without bucket pruning, and the
  * no-broadcast SMJ backfill regime against a fresh (one file per
  * bucket, sortBy trusted) vs an AGED store (appended — multi-file
  * buckets forfeit the sort metadata, the SMJ side re-sorts; q188's
  * warning priced rather than storied). Candidates are synthetic —
  * width·|Q| deterministic corpus ids — because this bench prices the
  * RE-RANK leg alone (AnnRecallBench prices probe+rerank end to end):
  * the leg's cost is a function of the id set and the store layout,
  * not of how a probe produced the ids.
  *
  * Knobs (env):
  *  - `SPARK_GRAFT_BUCKETS` — comma list of store bucket counts
  *    (default 512). Deployment sizes buckets to corpus bytes / file
  *    size, so pruning's win grows with the bucket count: the scan
  *    reads ~min(|ids|, B) of B buckets.
  *  - `SPARK_GRAFT_NQ` — comma list of query-batch sizes (default
  *    "8,200"): 8 = the point-lookup shape where pruning prunes
  *    deepest; 200 = AnnRecallBench's batch, where width·|Q| ids can
  *    touch every bucket (the honest no-win case).
  *  - `SPARK_GRAFT_WIDTH` — candidates per query (default 50).
  *  - `SPARK_GRAFT_PRUNE_ONLY=1` — skip the aged-store build and the
  *    SMJ arms: at the 16k–64k decade (the round-18 verdict's third
  *    point on the pruning growth curve) a second full store build
  *    plus 64k-bucket append stages would double a run that only the
  *    pruned-vs-unpruned pair informs.
  *
  * Usage: `runMain graft.StoreRerankBench <corpusDir>` (e.g.
  * /tmp/vec1m). Prints `RRB <arm> buckets=<B> nq=<n> <secs> s
  * [selected=<x>/<B>]` lines; table lands in BASELINE.md.
  */
object StoreRerankBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val buckets = sys.env.get("SPARK_GRAFT_BUCKETS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(512))
    val nqs = sys.env.get("SPARK_GRAFT_NQ")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(8, 200))
    val width = sys.env.get("SPARK_GRAFT_WIDTH").map(_.toInt).getOrElse(50)
    val spark = GraftSession.local(cpus, "graft-store-rerank")
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val nCorpus = emb.count()
    println(s"RRB corpus $dir n=$nCorpus")

    // deterministic query batch + candidate ids (hash-ordered corpus
    // sample — no RNG, same ids every run/host)
    val maxNq = nqs.max
    val qAll = emb.orderBy(xxhash64(col("vec_id"), lit(1))).limit(maxNq)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val candIdsAll = emb.orderBy(xxhash64(col("vec_id"), lit(2)))
      .limit(width * maxNq).select(col("vec_id")).collect()
      .map(_.getLong(0))

    def candidatesFor(nq: Int): DataFrame = {
      val qIds = qAll.limit(nq).select("vec_id").collect().map(_.getLong(0))
      val pairs = candIdsAll.take(width * nq).zipWithIndex.map {
        case (cid, i) => (qIds(i % nq), cid)
      }.toSeq
      pairs.toDF("query_id", "neighbor_id")
    }

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def min2(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def selectedBuckets(df: DataFrame): String = {
      force(df) // AQE final plan
      "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(m => s"selected=${m.group(1)}/${m.group(2)}").getOrElse("selected=all")
    }

    val pruneOnly = sys.env.get("SPARK_GRAFT_PRUNE_ONLY").contains("1")
    buckets.foreach { b =>
      // FRESH store at this bucket count
      val freshKey = s"$dir#rrb_fresh_$b"
      val t0 = System.nanoTime()
      VectorStore.ensure(spark, freshKey, emb, "vec_id", "embedding", buckets = b)
      println(f"RRB store_build buckets=$b ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val fresh = spark.table(VectorStore.tableName(freshKey))
      // AGED store: same base, one appended batch of NEW ids (the
      // store's own small-files aging — multi-file buckets, sortBy
      // forfeited)
      val aged = if (pruneOnly) fresh else {
        val agedKey = s"$dir#rrb_aged_$b"
        VectorStore.ensure(spark, agedKey, emb, "vec_id", "embedding", buckets = b)
        VectorStore.appendVectors(spark, agedKey,
          emb.orderBy(xxhash64(col("vec_id"), lit(3))).limit(50000)
            .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding")),
          "vec_id", "embedding", batchTag = Some("age1"))
        spark.table(VectorStore.tableName(agedKey))
      }

      nqs.foreach { nq =>
        val cand = candidatesFor(nq).localCheckpoint()
        def arm(name: String, df: => DataFrame, note: => String = ""): Unit = {
          val t = min2(force(df))
          println(f"RRB $name buckets=$b nq=$nq $t%.2f s $note")
        }
        val prunedDf = VectorStore.rerankTopK(fresh, qAll, cand, k = 5)
        arm("bcast_pruned", VectorStore.rerankTopK(fresh, qAll, cand, k = 5),
          selectedBuckets(prunedDf))
        arm("bcast_unpruned", VectorStore.rerankTopK(fresh, qAll, cand, k = 5,
          pruneStoreBuckets = false))
        if (!pruneOnly) {
          arm("bcast_pruned_aged", VectorStore.rerankTopK(aged, qAll, cand, k = 5))
          // the backfill SMJ regime: candidates too large to broadcast —
          // the bucketed+sorted store side needs no exchange and (fresh)
          // no sort; the AGED store re-sorts (the q188 forfeiture, priced)
          val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try {
            arm("smj_fresh", VectorStore.rerankTopK(fresh, qAll, cand, k = 5,
              broadcastCandidates = false))
            arm("smj_aged", VectorStore.rerankTopK(aged, qAll, cand, k = 5,
              broadcastCandidates = false))
          } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
        }
      }

      def arm2(name: String, nq: Int, df: => DataFrame,
          note: String = ""): Unit = {
        val t = min2(force(df))
        println(f"RRB $name buckets=$b nq=$nq $t%.2f s $note")
      }

      // the OBJECT-STORE arm: the same bytes behind a per-open latency
      // (slow:// = RawLocalFileSystem + sleep per open). Local NVMe
      // hides what pruning saves — OPENS — so this is where the dial's
      // threshold actually gets priced: an external bucketed table over
      // the fresh store's own files, scanned with and without the isin
      // pushdown. Metadata-only DDL; DROP leaves the files (external).
      val delay = sys.env.get("SPARK_GRAFT_OPEN_DELAY_MS").map(_.toLong)
        .getOrElse(25L)
      if (delay > 0L) {
        graft.sources.SlowOpenFileSystem.register(spark, delay)
        val loc = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(
            VectorStore.tableName(freshKey))).location.getPath
        val slowTable = s"rrb_slow_$b"
        spark.sql(s"DROP TABLE IF EXISTS $slowTable")
        spark.sql(
          s"""CREATE TABLE $slowTable (vec_id BIGINT, v ARRAY<FLOAT>)
             |USING PARQUET
             |CLUSTERED BY (vec_id) SORTED BY (vec_id) INTO $b BUCKETS
             |LOCATION '${graft.sources.SlowOpenFileSystem.slowPath(loc)}'
             |""".stripMargin)
        val slow = spark.table(slowTable)
        nqs.foreach { nq =>
          val cand = candidatesFor(nq).localCheckpoint()
          val prunedDf = VectorStore.rerankTopK(slow, qAll, cand, k = 5)
          arm2(s"slow${delay}ms_pruned", nq,
            VectorStore.rerankTopK(slow, qAll, cand, k = 5),
            selectedBuckets(prunedDf))
          arm2(s"slow${delay}ms_unpruned", nq,
            VectorStore.rerankTopK(slow, qAll, cand, k = 5,
              pruneStoreBuckets = false))
        }
        spark.sql(s"DROP TABLE IF EXISTS $slowTable")
      }
    }
    spark.stop()
  }
}
