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
  private def storeSide(plan: SparkPlan): SparkPlan = {
    val joins = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.children.exists(hasStoreScan) => j
    }
    assert(joins.nonEmpty, s"no join over the store in:\n${plan.toString.take(2000)}")
    // the BOTTOM-most such join (the re-rank join itself)
    val j = joins.last
    val sides = j.children.filter(hasStoreScan)
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

  test("the store writes one file per bucket (the sorted-scan guarantee)") {
    storeName // force build
    val dir = new java.io.File(s"spark-warehouse/$storeName")
    assert(dir.exists(), s"warehouse dir missing: $dir")
    val dataFiles = dir.listFiles().filter(f =>
      f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(dataFiles.length <= buckets,
      s"${dataFiles.length} data files for $buckets buckets — " +
        "multi-file buckets forfeit the sortBy metadata")
  }
}
