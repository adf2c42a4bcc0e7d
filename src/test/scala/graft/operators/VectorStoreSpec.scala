package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The id-keyed vector store behind the exact re-rank (round-16
  * verdict #1): same rows as the raw embeddings join, and — the
  * operator's whole point — NO corpus-side exchange in either join
  * regime (broadcast candidates → BHJ over a bare bucketed scan;
  * no-broadcast backfill → SMJ where the bucketed+sorted store needs
  * neither exchange nor sort). */
class VectorStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = graft.Tables.load(spark, sf, "embeddings")
  private lazy val q = emb.filter(col("vec_id") % 10 === 0)
  // a deterministic candidate relation: 7 fake "neighbors" per query
  // (the plan shapes don't care that they came from a real probe)
  private lazy val candidates = q.select(col("vec_id").as("query_id"))
    .crossJoin(emb.filter(col("vec_id") % 9 === 2).limit(7)
      .select(col("vec_id").as("neighbor_id")))

  private lazy val storeName = VectorStore.ensure(spark, sf, emb,
    "vec_id", "embedding")

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    val root = df.queryExecution.executedPlan
    root.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(root)
  }

  private def hasStoreScan(p: SparkPlan): Boolean =
    p.toString.contains(storeName)

  private def hasScanOf(p: SparkPlan, name: String): Boolean =
    p.toString.contains(name)

  /** Pre-order walk that DESCENDS INTO AQE query stages (TreeNode
    * .collect stops at stage boundaries — a stage's materialized plan
    * is an inner child, not a child). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p +: kids.flatMap(walk)
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    walk(p).collect(pf)

  /** The store-side child of the re-rank join (the subtree holding the
    * bucketed scan) — the subtree that must stay exchange-free. */
  private def storeSide(plan: SparkPlan): SparkPlan =
    storeSideOf(plan, storeName)

  private def storeSideOf(plan: SparkPlan, name: String): SparkPlan = {
    val joins = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.children.exists(hasScanOf(_, name)) => j
    }
    assert(joins.nonEmpty, s"no join over the store in:\n${plan.toString.take(2000)}")
    // the BOTTOM-most such join (the re-rank join itself)
    val j = joins.last
    val sides = j.children.filter(hasScanOf(_, name))
    assert(sides.size == 1,
      s"store scan must feed exactly one join side:\n${j.toString.take(2000)}")
    sides.head
  }

  test("store rows equal the embeddings relation") {
    val n = emb.count()
    val store = spark.table(storeName)
    assert(store.count() === n)
    assert(store.join(emb, store("vec_id") === emb("vec_id")).count() === n)
  }

  test("store-backed rerank is row-identical to the raw embeddings join") {
    val viaStore = VectorStore.rerankTopK(
      spark.table(storeName), q, candidates, k = 5)
    import graft.functions.VectorFunctions
    val reference = candidates
      .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
      .join(q.select(col("vec_id").as("q_id"), col("embedding").as("qe")), "q_id")
      .join(emb.select(col("vec_id").as("i_id"), col("embedding").as("ie"))
        .hint("shuffle_hash"), "i_id")
      .select(col("q_id"),
        VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("dist"),
        col("i_id"))
      .groupBy(col("q_id").as("query_id"))
      .agg(TopK.topK(5)(col("dist"), col("i_id"), col("i_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"),
        floor(col("n.dist") * 1000000.0).cast("long").as("dist_micro"))
    val a = viaStore.collect().map(_.toSeq).toSet
    val b = reference.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("broadcast regime: BHJ with ZERO exchange and zero sort on the store side") {
    val plan = finalPlan(VectorStore.rerankTopK(
      spark.table(storeName), q, candidates, k = 5))
    assert(plan.toString.contains("BroadcastHashJoin"),
      plan.toString.take(1500))
    val side = storeSide(plan)
    assert(collectAll(side) { case e: ShuffleExchangeLike => e }.isEmpty,
      s"corpus-side exchange in the re-rank join:\n${side.toString.take(2000)}")
    assert(collectAll(side) {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      s"corpus-side sort in the re-rank join:\n${side.toString.take(2000)}")
  }

  test("backfill regime: SMJ where the bucketed store side needs neither exchange nor sort") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(VectorStore.rerankTopK(
        spark.table(storeName), q, candidates, k = 5,
        broadcastCandidates = false))
      val s = plan.toString
      assert(s.contains("SortMergeJoin"), s.take(1500))
      assert(s.contains("Bucketed: true"), s.take(2500))
      val side = storeSide(plan)
      assert(collectAll(side) { case e: ShuffleExchangeLike => e }.isEmpty,
        s"bucketed store side exchanged:\n${side.toString.take(2000)}")
      assert(collectAll(side) {
        case x: org.apache.spark.sql.execution.SortExec => x }.isEmpty,
        s"bucketed store side re-sorted (multi-file buckets?):\n${side.toString.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("bucket pruning: the bounded candidate id set prunes the store scan to its buckets") {
    // one candidate id can hash into at most ONE of the buckets — the
    // pruned scan must say so (at deployment bucket counts this is
    // the full-corpus-scan vs width·|Q|-bucket-files difference).
    // The candidate relation is a LOCAL relation on purpose: a
    // literal-filtered one would let InferFiltersFromConstraints push
    // the id through the join anyway (verified — that shape prunes
    // without our help), while real probe-derived candidates carry no
    // such constraint, which is exactly what the isin pushdown is for
    import spark.implicits._
    val qid = q.limit(1).select("vec_id").collect().head.getLong(0)
    val oneCand = Seq((qid, 42L)).toDF("query_id", "neighbor_id")
    // minPruneBuckets = 1: the suite's 4-bucket store sits far below
    // the deployment dial (256+), where pruning's win covers its
    // planning cost — the dial itself is asserted at the end
    val pruned = VectorStore.rerankTopK(
      spark.table(storeName), q, oneCand, k = 5, minPruneBuckets = 1)
    val plan = finalPlan(pruned)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan.toString)
    assert(sel.isDefined,
      s"no bucket pruning on the store scan:\n${plan.toString.take(2500)}")
    assert(sel.get.group(1).toInt == 1 && sel.get.group(2).toInt ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"one id must select one bucket: ${sel.get.matched}")
    // still the exchange-free BHJ shape on the store side
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString.take(1200))
    val side = storeSide(plan)
    assert(collectAll(side) { case e: ShuffleExchangeLike => e }.isEmpty)
    // pruning is a pure scan optimization: rows identical to unpruned.
    // (The annotation itself also prints on a FULL scan — IsNotNull on
    // the bucket column defines a select-everything bucket set — so
    // the contrast is selected < total, not presence vs absence.)
    def selectedOf(df: DataFrame): (Int, Int) = {
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(finalPlan(df).toString)
      m.map(x => (x.group(1).toInt, x.group(2).toInt)).getOrElse((-1, -1))
    }
    val unpruned = VectorStore.rerankTopK(
      spark.table(storeName), q, oneCand, k = 5, pruneStoreBuckets = false)
    val (selU, totU) = selectedOf(unpruned)
    assert(selU == totU || selU == -1,
      s"the unpruned twin must scan every bucket, got $selU/$totU")
    assert(pruned.collect().map(_.toSeq).toSet ===
      unpruned.collect().map(_.toSeq).toSet)
    // a candidate pool wider than maxPruneIds falls back to the
    // unpruned scan (correct, corpus-priced) instead of planning a
    // giant InSet
    val capped = VectorStore.rerankTopK(
      spark.table(storeName), q, candidates, k = 5, maxPruneIds = 2,
      minPruneBuckets = 1)
    val (selC, totC) = selectedOf(capped)
    assert(selC == totC || selC == -1,
      s"past maxPruneIds the scan must stay unpruned, got $selC/$totC")
    assert(capped.collect().map(_.toSeq).toSet ===
      VectorStore.rerankTopK(spark.table(storeName), q, candidates, k = 5,
        pruneStoreBuckets = false).collect().map(_.toSeq).toSet)
    // the DIAL: at the default minPruneBuckets (deployment bucket
    // counts) a 4-bucket store keeps the plain full-scan plan — no
    // checkpoint, no collect, no In-literal planning cost on the
    // gates (measured +0.8–5 s per rerank gate when forced on)
    val dialed = VectorStore.rerankTopK(
      spark.table(storeName), q, oneCand, k = 5)
    val (selD, totD) = selectedOf(dialed)
    assert(selD == totD || selD == -1,
      s"below minPruneBuckets the scan must stay unpruned, got $selD/$totD")
  }

  test("appendVectors: lockstep ingest — idempotent replay, crash cleanup, stale store drops candidates") {
    import org.apache.hadoop.fs.Path
    val key = sf + "#spec_incr"
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val name = VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    // candidates drawn FROM the ingest batch: the items a stale store
    // is missing — their vectors aren't in the base store
    val batchCandidates = q.select(col("vec_id").as("query_id"))
      .crossJoin(batch.limit(7).select(col("vec_id").as("neighbor_id")))
    // THE FAILURE MODE the append exists to prevent: candidates whose
    // vectors are missing from the store don't fail the re-rank —
    // they silently vanish (inner join), shrinking the result
    val staleRows = VectorStore.rerankTopK(
      spark.table(name), q, batchCandidates, k = 5).count()
    VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
      batchTag = Some("ing1"))
    assert(spark.table(name).count() === emb.count())
    assert(staleRows === 0L,
      "every candidate was in the missing batch — the stale store must drop them ALL, silently")
    val freshRows = VectorStore.rerankTopK(
      spark.table(name), q, batchCandidates, k = 5)
    assert(freshRows.count() > 0L,
      "the appended store must restore the dropped candidates")
    // appended store ≡ the full store, row for row
    val fullRows = VectorStore.rerankTopK(
      spark.table(storeName), q, batchCandidates, k = 5)
      .collect().map(_.toSeq).toSet
    assert(freshRows.collect().map(_.toSeq).toSet === fullRows)
    // idempotent replay: the marker short-circuits
    VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
      batchTag = Some("ing1"))
    assert(spark.table(name).count() === emb.count(), "replay must no-op")
    // crash cleanup: plant a partial attempt's tagged file; the retry
    // sweeps it before re-applying, so rows stay exact
    val loc = new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val donor = fs.listStatus(loc)
      .map(_.getPath).filter(_.getName.startsWith("ing1-")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
      new Path(loc, s"ing2-${donor.getName.stripPrefix("ing1-")}"), false,
      spark.sessionState.newHadoopConf())
    spark.catalog.refreshTable(name)
    VectorStore.appendVectors(spark, key,
      batch.limit(0), "vec_id", "embedding", batchTag = Some("ing2"))
    assert(spark.table(name).count() === emb.count(),
      "the crashed attempt's planted file must be swept by its tag prefix")
  }

  test("appended store: broadcast regime still exchange-free; SMJ regime degrades to a visible sort") {
    val key = sf + "#spec_incr2"
    VectorStore.ensure(spark, key,
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding")
    VectorStore.appendVectors(spark, key,
      emb.filter(col("vec_id") % 7 === 3), "vec_id", "embedding",
      batchTag = Some("ing1"))
    val incrName = VectorStore.tableName(key)
    val store = spark.table(incrName)
    // broadcast regime (the deployment default): appended files are
    // still parseable bucket files; the store side stays a bare scan
    val bhj = finalPlan(VectorStore.rerankTopK(store, q, candidates, k = 5))
    assert(bhj.toString.contains("BroadcastHashJoin"), bhj.toString.take(1200))
    val side = storeSideOf(bhj, incrName)
    assert(collectAll(side) { case e: ShuffleExchangeLike => e }.isEmpty)
    assert(collectAll(side) {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty)
    // SMJ regime: multi-file buckets forfeit the sortBy metadata, so
    // the store side re-SORTS (correct, visibly degraded — the
    // store's own small-files aging; rebuild is its compaction) while
    // still needing NO exchange (bucketing survives appends)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = finalPlan(VectorStore.rerankTopK(store, q, candidates,
        k = 5, broadcastCandidates = false))
      assert(smj.toString.contains("SortMergeJoin"), smj.toString.take(1200))
      val s2 = storeSideOf(smj, incrName)
      assert(collectAll(s2) { case e: ShuffleExchangeLike => e }.isEmpty,
        "bucketing must survive appends — no exchange even degraded")
      assert(collectAll(s2) {
        case x: org.apache.spark.sql.execution.SortExec => x }.nonEmpty,
        "multi-file buckets must re-sort (if this starts passing " +
          "sort-free, the ordering metadata is being trusted wrongly)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("storeAudit: intact fresh, forfeited after one append, rebuild past the threshold; orphans counted") {
    import org.apache.hadoop.fs.Path
    val key = sf + "#spec_audit"
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val name = VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    val fresh = VectorStore.storeAudit(spark, key).collect().head
    assert(fresh.getAs[String]("sorted_scan") == "intact", fresh)
    assert(fresh.getAs[String]("decision") == "keep", fresh)
    assert(fresh.getAs[Long]("n_files") ==
      fresh.getAs[Long]("n_buckets"), fresh)
    // the FIRST append forfeits the merge-join regime's sort-free scan
    VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
      batchTag = Some("a1"))
    val one = VectorStore.storeAudit(spark, key).collect().head
    assert(one.getAs[String]("sorted_scan") == "forfeited", one)
    assert(one.getAs[Long]("n_files") > one.getAs[Long]("n_buckets"), one)
    // keep appending: the same factor-4 line as the index's audit
    var i = 2
    while (VectorStore.storeAudit(spark, key).collect().head
        .getAs[String]("decision") == "keep" && i < 40) {
      VectorStore.appendVectors(spark, key, batch.limit(3),
        "vec_id", "embedding", batchTag = Some(s"a$i"))
      i += 1
    }
    val tripped = VectorStore.storeAudit(spark, key).collect().head
    assert(tripped.getAs[String]("decision") == "rebuild",
      s"appends never tripped the rebuild line: $tripped")
    assert(tripped.getAs[Long]("n_files") + tripped.getAs[Long]("n_orphans")
      >= 4L * tripped.getAs[Long]("n_buckets"), tripped)
    // orphans (tagged, no marker) count toward the line — probes scan
    // them; and they classify as orphans, not committed
    val loc = new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val donor = fs.listStatus(loc)
      .map(_.getPath).filter(_.getName.startsWith("a1-")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
      new Path(loc, s"zz9-${donor.getName.stripPrefix("a1-")}"), false,
      spark.sessionState.newHadoopConf())
    val orph = VectorStore.storeAudit(spark, key).collect().head
    assert(orph.getAs[Long]("n_orphans") == 1L, orph)
    assert(orph.getAs[Long]("n_files") == tripped.getAs[Long]("n_files"), orph)
    // the janitor (the index's sweepOrphans, store-side): removes
    // exactly the markerless tagged file, committed files untouched
    val preSweepRows = spark.table(name).count()
    val orphanRows = spark.read.parquet(
      fs.listStatus(loc).map(_.getPath)
        .filter(_.getName.startsWith("zz9-")).head.toString).count()
    assert(VectorStore.sweepOrphans(spark, key) === 1L)
    val swept = VectorStore.storeAudit(spark, key).collect().head
    assert(swept.getAs[Long]("n_orphans") == 0L, swept)
    assert(swept.getAs[Long]("n_files") == orph.getAs[Long]("n_files"), swept)
    assert(spark.table(name).count() === preSweepRows - orphanRows,
      "sweep must remove exactly the orphan's visible rows")
    // the REPAIR is the build path: a fresh one-file-per-bucket store
    // over the same rows audits intact/keep again (rebuild = drop +
    // ensure under a new key here, since ensure memoizes per JVM)
    val key2 = sf + "#spec_audit_rebuilt"
    VectorStore.ensure(spark, key2, spark.table(name), "vec_id", "v")
    val rebuilt = VectorStore.storeAudit(spark, key2).collect().head
    assert(rebuilt.getAs[String]("sorted_scan") == "intact", rebuilt)
    assert(rebuilt.getAs[String]("decision") == "keep", rebuilt)
  }

  test("lockstepAppend: the crash window between the halves is store-ahead (correct) — index-ahead serves missing neighbors") {
    import graft.operators.Pq
    import org.apache.hadoop.fs.Path
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    def buildIdx(p: String): Unit = {
      val ppath = new Path(p)
      if (fs.exists(ppath)) fs.delete(ppath, true)
      Pq.buildIvfPqIndex(base, "vec_id", "embedding", dim = 64, m = 8,
        k = 16, iters = 1, centroids = 4, path = p, assignments = 1)
    }
    def cands(p: String) = Pq.ivfPqCandidates(q, p, dim = 64, topK = 20,
      probes = 4, "vec_id", "embedding", maxQueryBatch = 32)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet

    // THE FORBIDDEN ORDER (index first), killed between the halves:
    // the index names batch ids as candidates, the store has no
    // vectors for them — the inner join SILENTLY DROPS them
    val idxA = s"${sys.props("java.io.tmpdir")}/graft_lockstep_idxA"
    buildIdx(idxA)
    val keyA = sf + "#lockstep_idxahead"
    VectorStore.ensure(spark, keyA, base, "vec_id", "embedding")
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", idxA,
      batchTag = Some("w1")) // crash before the store half
    val candA = cands(idxA)
    val namedBatch = candA.select("neighbor_id").collect()
      .map(_.getLong(0)).toSet.intersect(batchIds)
    assert(namedBatch.nonEmpty,
      "probe must surface some appended items as candidates for the " +
        "regime to be observable")
    val servedA = VectorStore.rerankTopK(
        spark.table(VectorStore.tableName(keyA)), q, candA, k = 20)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(servedA.intersect(batchIds).isEmpty,
      "index-ahead: every batch candidate silently vanished from the " +
        "served top-k — the wrong-results regime lockstepAppend forbids")

    // THE CONTRACT ORDER (store first), killed between the halves:
    // the store holds extra vectors the index cannot name — the batch
    // is invisible, every served row is correct
    val idxB = s"${sys.props("java.io.tmpdir")}/graft_lockstep_idxB"
    buildIdx(idxB)
    val keyB = sf + "#lockstep_storeahead"
    val nameB = VectorStore.ensure(spark, keyB, base, "vec_id", "embedding")
    VectorStore.appendVectors(spark, keyB, batch, "vec_id", "embedding",
      batchTag = Some("b1")) // crash before the index half
    val candB = cands(idxB)
    assert(candB.select("neighbor_id").collect().map(_.getLong(0)).toSet
      .intersect(batchIds).isEmpty,
      "store-ahead: the index cannot name the batch as candidates yet")
    val servedB = VectorStore.rerankTopK(spark.table(nameB), q, candB, k = 20)
      .collect().map(_.toSeq).toSet
    // correct = what a pre-ingest pair serves (batch not yet visible)
    val preIngest = VectorStore.rerankTopK(
      spark.table(VectorStore.tableName(keyA)), q, candB, k = 20)
      .collect().map(_.toSeq).toSet
    assert(servedB === preIngest,
      "store-ahead must serve exactly the pre-ingest results")

    // RETRY lands the pair: the store half no-ops on its marker, the
    // index half applies — composed state == a clean lockstep pair
    VectorStore.lockstepAppend(spark, keyB, idxB, batch,
      "vec_id", "embedding", batchTag = "b1")
    val idxC = s"${sys.props("java.io.tmpdir")}/graft_lockstep_idxC"
    buildIdx(idxC)
    val keyC = sf + "#lockstep_clean"
    VectorStore.ensure(spark, keyC, base, "vec_id", "embedding")
    VectorStore.lockstepAppend(spark, keyC, idxC, batch,
      "vec_id", "embedding", batchTag = "b1")
    val afterRetry = VectorStore.rerankTopK(spark.table(nameB), q,
      cands(idxB), k = 20).collect().map(_.toSeq).toSet
    val clean = VectorStore.rerankTopK(
      spark.table(VectorStore.tableName(keyC)), q, cands(idxC), k = 20)
      .collect().map(_.toSeq).toSet
    assert(afterRetry === clean,
      "retried crash-window pair must serve exactly the clean pair")
    assert(afterRetry.exists(r =>
      batchIds.contains(r(2).asInstanceOf[Long])),
      "the landed pair must serve batch items as neighbors")
  }

  test("storeCadence: keep with no history, rebuild_within with a shrinking horizon, rebuild_now past the line") {
    val key = sf + "#spec_store_cadence"
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val batch = emb.filter(col("vec_id") % 7 === 3)
    VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    val fresh = VectorStore.storeCadence(spark, key).collect().head
    assert(fresh.getAs[String]("decision") == "keep", fresh)
    assert(fresh.getAs[Long]("batches_to_threshold") == -1L, fresh)
    assert(fresh.getAs[Long]("n_batches") == 0L, fresh)
    // one committed batch: a growth rate exists — finite horizon
    VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
      batchTag = Some("c1"))
    val one = VectorStore.storeCadence(spark, key).collect().head
    assert(one.getAs[String]("decision") == "rebuild_within", one)
    assert(one.getAs[Long]("batches_to_threshold") >= 1L, one)
    assert(one.getAs[Long]("n_batches") == 1L, one)
    assert(one.getAs[Long]("append_files") > 0L, one)
    // steady appends: the horizon never grows, and the election flips
    // to rebuild_now exactly when the audit's factor-4 line trips
    var horizons = List(one.getAs[Long]("batches_to_threshold"))
    var i = 2
    var row = one
    while (row.getAs[String]("decision") == "rebuild_within" && i < 40) {
      VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
        batchTag = Some(s"c$i"))
      row = VectorStore.storeCadence(spark, key).collect().head
      if (row.getAs[String]("decision") == "rebuild_within")
        horizons ::= row.getAs[Long]("batches_to_threshold")
      i += 1
    }
    assert(row.getAs[String]("decision") == "rebuild_now",
      s"appends never tripped the line: $row")
    assert(row.getAs[Long]("batches_to_threshold") == 0L, row)
    val ordered = horizons.reverse
    assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => b <= a },
      s"forecast horizon grew under steady appends: $ordered")
    // the election and the audit share one threshold (LayoutCensus):
    // the audit must read rebuild on the same listing
    assert(VectorStore.storeAudit(spark, key).collect().head
      .getAs[String]("decision") == "rebuild")
  }

  test("sizeBuckets: integer payload model, exact ceil division, both clamps") {
    val n = emb.count()
    val r = VectorStore.sizeBuckets(emb, "embedding",
      targetFileBytes = 1000L).collect().head
    assert(r.getAs[Long]("n_items") === n)
    assert(r.getAs[Long]("dim") === 64L)
    val payload = n * (8L + 4L * 64L)
    assert(r.getAs[Long]("payload_bytes") === payload)
    assert(r.getAs[Long]("target_file_bytes") === 1000L)
    assert(r.getAs[Long]("n_buckets") === (payload + 999L) / 1000L)
    // floor clamp: a deployment-sized target elects 1 on a tiny corpus
    assert(VectorStore.sizeBuckets(emb, "embedding").collect().head
      .getAs[Long]("n_buckets") === 1L)
    // cap clamp: a 1-byte target wants n_items·264 buckets — capped
    assert(VectorStore.sizeBuckets(emb, "embedding",
      targetFileBytes = 1L, maxBuckets = 7L).collect().head
      .getAs[Long]("n_buckets") === 7L)
    // degenerate input (round-18 advice): an EMPTY corpus must elect
    // the floor clamp of 1, not maxBuckets — max() over zero rows is
    // NULL, and null-skipping least/greatest would pick the cap
    val empty = VectorStore.sizeBuckets(emb.limit(0), "embedding")
      .collect().head
    assert(empty.getAs[Long]("n_items") === 0L, empty)
    assert(empty.getAs[Long]("dim") === 0L, empty)
    assert(empty.getAs[Long]("payload_bytes") === 0L, empty)
    assert(empty.getAs[Long]("n_buckets") === 1L, empty)
  }

  test("the store writes one file per bucket (the sorted-scan guarantee)") {
    storeName // force build
    // resolve through the catalog — the suite runs under a NON-default
    // spark.sql.warehouse.dir precisely so a hardcoded ./spark-warehouse
    // path here (or in the operator) would fail loudly
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(storeName)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(loc), s"warehouse dir missing: $loc")
    assert(loc.toString.contains("graft_test_warehouse"),
      s"store must live under the configured warehouse, got $loc")
    val dataFiles = fs.listStatus(loc).filter(f =>
      f.getPath.getName.startsWith("part-") &&
        !f.getPath.getName.endsWith(".crc"))
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(dataFiles.length <= buckets,
      s"${dataFiles.length} data files for $buckets buckets — " +
        "multi-file buckets forfeit the sortBy metadata")
  }

  test("writer lease: a second writer fails loudly and tears nothing; retries and committed appends self-heal") {
    import org.apache.hadoop.fs.Path
    val key = sf + "#spec_lease"
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val name = VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    val baseCount = spark.table(name).count()
    val loc = new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    // simulate writer x1 crashed MID-WRITE (lease standing, no marker):
    // every other mutator must fail loudly — the round-18 alternative
    // was silent corruption (unsynchronized renames and sweeps)
    AppendProtocol.acquireLease(fs, loc, "append:x1")
    val e1 = intercept[IllegalStateException] {
      VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
        batchTag = Some("x2"))
    }
    assert(e1.getMessage.contains("leased by writer 'append:x1'"), e1.getMessage)
    intercept[IllegalStateException] { VectorStore.sweepOrphans(spark, key) }
    intercept[IllegalStateException] { VectorStore.rebuildStore(spark, key) }
    assert(spark.table(name).count() === baseCount,
      "failed acquisitions must leave the store untouched")
    assert(fs.exists(AppendProtocol.leasePath(loc)),
      "a failed acquisition must not release someone else's lease")
    // x1's OWN retry re-enters on the identical owner (the
    // single-writer rule says nobody else may run as x1) and releases
    VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
      batchTag = Some("x1"))
    assert(spark.table(name).count() === emb.count())
    assert(!fs.exists(AppendProtocol.leasePath(loc)),
      "a completed append must release the lease")
    // crash in the commit-to-release window: x1's marker landed but
    // its lease stayed — provably complete, so the NEXT writer breaks
    // it unattended (the streaming sink's batches keep flowing)
    AppendProtocol.acquireLease(fs, loc, "append:x1")
    VectorStore.appendVectors(spark, key, batch.limit(0),
      "vec_id", "embedding", batchTag = Some("x3"))
    assert(!fs.exists(AppendProtocol.leasePath(loc)))
    // breaking a finished holder's lease must RE-ACQUIRE under the
    // breaker's own owner — a lease still naming the finished holder
    // would let a third writer draw the same stale conclusion and run
    // concurrently with the live breaker
    AppendProtocol.acquireLease(fs, loc, "append:x1") // x1 is committed
    AppendProtocol.acquireLease(fs, loc, "append:x9",
      staleIf = held => held == "append:x1")
    val in = fs.open(AppendProtocol.leasePath(loc))
    val ownerNow = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(ownerNow === "append:x9",
      "the breaker must own the lease it broke")
    // and a writer that can NOT prove x9 finished now fails loudly
    intercept[IllegalStateException] {
      VectorStore.appendVectors(spark, key, batch.limit(0),
        "vec_id", "embedding", batchTag = Some("x10"))
    }
    assert(AppendProtocol.breakLease(fs, loc))
    // release is OWNER-CHECKED: a holder exiting late (its lease
    // legitimately broken-and-reacquired while it lingered in the
    // commit-to-release window) must not delete the breaker's live
    // lease on the way out
    AppendProtocol.withWriterLease(fs, loc, "append:w1") {
      fs.delete(AppendProtocol.leasePath(loc), false) // the break...
      AppendProtocol.acquireLease(fs, loc, "append:w2") // ...and re-acquire
    }
    val in2 = fs.open(AppendProtocol.leasePath(loc))
    val survivor = try scala.io.Source.fromInputStream(in2).mkString
      finally in2.close()
    assert(survivor === "append:w2",
      "w1's exit must not release w2's lease")
    assert(AppendProtocol.breakLease(fs, loc))
    // repair owners are per-PROCESS identities: another process's
    // live repair (different nonce) must fail loudly, never re-enter
    AppendProtocol.acquireLease(fs, loc, "rebuild#other-host-pid")
    intercept[IllegalStateException] { VectorStore.rebuildStore(spark, key) }
    assert(AppendProtocol.breakLease(fs, loc))
    // ...while a COMMITTED append's stale lease is breakable by a
    // repair too — the restarted stream's replayed batch skips on its
    // marker without touching the lease, so the next writer of ANY
    // kind must be able to proceed unattended
    AppendProtocol.acquireLease(fs, loc, "append:x1") // x1 is committed
    assert(VectorStore.sweepOrphans(spark, key) >= 0L)
    assert(!fs.exists(AppendProtocol.leasePath(loc)))
    // a stale NON-append lease (crashed janitor/rebuild) stays loud —
    // breakLease is the documented manual remedy
    AppendProtocol.acquireLease(fs, loc, "rebuild")
    intercept[IllegalStateException] {
      VectorStore.appendVectors(spark, key, batch.limit(0),
        "vec_id", "embedding", batchTag = Some("x4"))
    }
    assert(AppendProtocol.breakLease(fs, loc))
    VectorStore.appendVectors(spark, key, batch.limit(0),
      "vec_id", "embedding", batchTag = Some("x4"))
    // tag hygiene (round-19): a leading '_'/'.' would rename the
    // batch's data files into scan-invisibility — rejected up front
    intercept[IllegalArgumentException] {
      VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
        batchTag = Some("_x5"))
    }
    intercept[IllegalArgumentException] {
      VectorStore.appendVectors(spark, key, batch, "vec_id", "embedding",
        batchTag = Some(".x5"))
    }
  }

  test("rebuildStore: in-process rebuild-and-flip — bit-equal committed rows, layout restored, markers carried, memo re-pointed") {
    import org.apache.hadoop.fs.Path
    val key = sf + "#spec_rebuild"
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val ingest = emb.filter(col("vec_id") % 7 === 3)
    val b1 = ingest.filter(col("vec_id") % 2 === 0)
    val b2 = ingest.filter(col("vec_id") % 2 === 1)
    val name = VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    VectorStore.appendVectors(spark, key, b1, "vec_id", "embedding", Some("r1"))
    VectorStore.appendVectors(spark, key, b2, "vec_id", "embedding", Some("r2"))
    // a crashed third appender's orphan: the rebuild must SWEEP it,
    // not bake its partial rows into anonymous part files (which
    // would double-apply when the crashed batch retries)
    val locBefore = new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    val fs = locBefore.getFileSystem(spark.sessionState.newHadoopConf())
    val donor = fs.listStatus(locBefore)
      .map(_.getPath).filter(_.getName.startsWith("r1-")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
      new Path(locBefore, s"zz7-${donor.getName.stripPrefix("r1-")}"), false,
      spark.sessionState.newHadoopConf())
    spark.catalog.refreshTable(name)
    assert(VectorStore.storeAudit(spark, key).collect().head
      .getAs[String]("sorted_scan") == "forfeited")
    val expected = emb
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").as("v"))
      .collect().map(_.toSeq).toSet

    assert(VectorStore.rebuildStore(spark, key) === name)

    // the FLIP: same name, fresh location, old tree purged
    val locAfter = new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    assert(locAfter !== locBefore)
    assert(!fs.exists(locBefore), "the old tree must be dropped")
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(name + "_rebuild")),
      "the stage entry must not outlive the flip")
    assert(!fs.exists(AppendProtocol.leasePath(locAfter)),
      "the rebuild must release the new root's lease")
    // committed rows bit-equal (orphan swept, never baked in)
    assert(spark.table(name).collect().map(_.toSeq).toSet === expected)
    // layout restored: the audit the election reads flips back
    val audit = VectorStore.storeAudit(spark, key).collect().head
    assert(audit.getAs[String]("sorted_scan") == "intact", audit)
    assert(audit.getAs[String]("decision") == "keep", audit)
    assert(audit.getAs[Long]("n_orphans") === 0L, audit)
    // markers CARRIED (the compaction discipline): a replayed batch
    // still short-circuits — dropping markers would double-apply
    val cad = VectorStore.storeCadence(spark, key).collect().head
    assert(cad.getAs[Long]("n_batches") === 2L, cad)
    assert(cad.getAs[Long]("append_files") === 0L, cad)
    assert(cad.getAs[String]("decision") == "keep",
      s"nothing has grown since the rebuild — the live-epoch rate " +
        s"must not extrapolate carried history: $cad")
    val n = spark.table(name).count()
    VectorStore.appendVectors(spark, key, b1, "vec_id", "embedding", Some("r1"))
    assert(spark.table(name).count() === n, "replayed r1 must no-op")
    // the SMJ regime's sort-free scan is back (what the election
    // promised the rebuild would buy)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = finalPlan(VectorStore.rerankTopK(spark.table(name), q,
        candidates, k = 5, broadcastCandidates = false))
      val side = storeSideOf(smj, name)
      assert(collectAll(side) {
        case x: org.apache.spark.sql.execution.SortExec => x }.isEmpty,
        "the rebuilt store must merge-join sort-free again")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    // the ensure memo was re-pointed: a later ensure serves the
    // REBUILT table (location unchanged — no silent second rebuild)
    assert(VectorStore.ensure(spark, key, emb, "vec_id", "embedding") === name)
    assert(new Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
      === locAfter)
    // and an in-process DROP + re-ensure now REBUILDS instead of
    // serving the stale memo (the round-18 "worse than failing" case)
    spark.sql(s"DROP TABLE $name")
    assert(VectorStore.ensure(spark, key, emb, "vec_id", "embedding") === name)
    assert(spark.table(name).count() === emb.count())
  }

  test("repair x repair: index compaction and store rebuild interleave in either order — served rows never change") {
    import graft.operators.Pq
    import org.apache.hadoop.fs.Path
    // both repairs are row-preserving, so ANY interleaving of the two
    // (each under its own artifact's writer lease) must serve
    // identical results — the contract stated by round-18 verdict #7,
    // pinned here on one adversarial interleave in each order
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    val idx = s"${sys.props("java.io.tmpdir")}/graft_rxr_idx"
    if (fs.exists(new Path(idx))) fs.delete(new Path(idx), true)
    val base = emb.filter(col("vec_id") % 7 =!= 3)
    val ingest = emb.filter(col("vec_id") % 7 === 3)
    Pq.buildIvfPqIndex(base, "vec_id", "embedding", dim = 64, m = 8,
      k = 16, iters = 1, centroids = 4, path = idx, assignments = 1)
    val key = sf + "#spec_rxr"
    VectorStore.ensure(spark, key, base, "vec_id", "embedding")
    // fragment BOTH artifacts with three lockstep batches
    Seq(0L, 1L, 2L).foreach { i =>
      VectorStore.lockstepAppend(spark, key, idx,
        ingest.filter(col("vec_id") % 3 === i), "vec_id", "embedding",
        batchTag = s"rx$i")
    }
    val name = VectorStore.tableName(key)
    def probe(p: String): Set[Seq[Any]] =
      VectorStore.rerankTopK(spark.table(name), q,
        Pq.ivfPqCandidates(q, p, dim = 64, topK = 20, probes = 4,
          "vec_id", "embedding", maxQueryBatch = 32), k = 10)
        .collect().map(_.toSeq).toSet
    val served = probe(idx)
    // order A: compact the index, probe, THEN rebuild the store, probe
    val idxC = s"${sys.props("java.io.tmpdir")}/graft_rxr_idx_c"
    Pq.compactIvfPqIndex(spark, idx, idxC)
    assert(probe(idxC) === served, "index compaction changed served rows")
    VectorStore.rebuildStore(spark, key)
    assert(probe(idxC) === served, "store rebuild changed served rows")
    // order B: fragment again (FRESH ids — a replayed id set would
    // duplicate store rows), rebuild the store FIRST, then compact
    VectorStore.lockstepAppend(spark, key, idxC,
      ingest.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", batchTag = "rx3")
    val served2 = probe(idxC)
    assert(served2.nonEmpty)
    VectorStore.rebuildStore(spark, key)
    assert(probe(idxC) === served2, "store rebuild changed served rows (order B)")
    val idxC2 = s"${sys.props("java.io.tmpdir")}/graft_rxr_idx_c2"
    Pq.compactIvfPqIndex(spark, idxC, idxC2)
    assert(probe(idxC2) === served2, "index compaction changed served rows (order B)")
  }

  test("ensure recovers an aborted run's leftover location under a configured warehouse") {
    // the aborted-run scenario the cleanup exists for: a table
    // directory exists at the catalog's default path but the (fresh,
    // in-memory) catalog doesn't track it — DROP TABLE no-ops and CTAS
    // would fail on the non-empty location. The old hardcoded
    // ./spark-warehouse cleanup silently no-ops under this suite's
    // configured warehouse; the catalog-derived cleanup must recover.
    val key = sf + "#spec_aborted"
    val name = VectorStore.tableName(key)
    val p = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name)))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    spark.sql(s"DROP TABLE IF EXISTS $name")
    fs.mkdirs(p)
    fs.create(new org.apache.hadoop.fs.Path(p, "part-junk.parquet"), true)
      .close() // the aborted run's leftover
    val built = VectorStore.ensure(spark, key, emb, "vec_id", "embedding")
    assert(built === name)
    assert(spark.table(name).count() === emb.count())
    val audit = VectorStore.storeAudit(spark, key).collect().head
    assert(audit.getAs[String]("sorted_scan") == "intact", audit)
  }
}
