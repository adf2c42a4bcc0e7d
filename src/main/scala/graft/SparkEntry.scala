package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY §2
  * (reference-parity surface) or the LLM-pipeline extension set, expressed
  * over the driver's parquet testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the hash-match gate.
  *
  * FP-portability rule for oracle-checked outputs: integers, or doubles
  * produced by per-row deterministic arithmetic — never order-dependent
  * FP aggregation (sums of non-integral doubles are emitted as per-row
  * rounded integer cents instead).
  */
object SparkEntry {

  /** Flagship: end-to-end KNN classification (the reference's one query,
    * Hadoop.java) over the sf0.001 embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnPredict(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}

/** The declared query set. Kept separate from the [[SparkEntry]] contract
  * object so it can grow without touching the driver-facing surface.
  */
object Queries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  // ---------------------------------------------------------------------
  // Reference-parity surface (SURVEY §2)
  // ---------------------------------------------------------------------

  /** §2 #1/#3 — scan + projection (column pruning reaches the parquet scan). */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** §2 #2 — filter (predicate pushdown to the scan). */
  def filterPushdown(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  /** §2 #10-analog — grouped aggregation (map-side partial agg). Money sums
    * are per-row-rounded integer cents so the result is FP-order-proof. */
  def aggSum(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_price_cents"),
        count(lit(1)).as("cnt"))

  /** §2 #4-analog — broadcast equi-join of two small dims. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = t(spark, sfDir, "nation")
    val region = t(spark, sfDir, "region")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
  }

  /** Fact-to-dim join chain + aggregation (shuffle join on the fact side,
    * broadcast dims). */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    val nation = t(spark, sfDir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
  }

  /** §2 #7-analog — per-group top-n via window (the small-group path;
    * the bounded-aggregator path is exercised by [[knnPredict]]). */
  def windowTopN(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** §2 #5+#6+#7+#10 — the reference's entire pipeline: cross join ×
    * squared-Euclidean distance × bounded top-k × plurality vote, over the
    * embeddings table. Queries = every 25th vector; train = the rest.
    */
  def knnPredict(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val test = emb.filter(col("vec_id") % 25 === 0)
    val train = emb.filter(col("vec_id") % 25 =!= 0)
    Knn.classify(
      train = train, test = test, k = 5,
      trainId = "vec_id", testId = "vec_id",
      trainVec = "embedding", testVec = "embedding",
      labelCol = "label")
  }

  /** §2 #12 — accuracy evaluation of [[knnPredict]] against true labels,
    * emitted as exact integers (correct, total). */
  def knnAccuracy(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    Knn.accuracy(
      knnPredict(spark, sfDir),
      emb.filter(col("vec_id") % 25 === 0),
      truthId = "vec_id", truthLabel = "label")
  }

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (scanProject _),
    "q02_filter_pushdown" -> (filterPushdown _),
    "q03_agg_sum" -> (aggSum _),
    "q04_join_broadcast" -> (joinBroadcast _),
    "q05_join_agg" -> (joinAgg _),
    "q06_window_topn" -> (windowTopN _),
    "q07_knn_predict" -> (knnPredict _),
    "q08_knn_accuracy" -> (knnAccuracy _))

  /** DuckDB-dialect oracle SQL, one per query, same column names/types. */
  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q02_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0""",
    "q03_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q04_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "q05_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q06_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 3""",
    "q07_knn_predict" ->
      """WITH test AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
         train AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
         scored AS (
           SELECT t.vec_id AS test_id, tr.label, tr.vec_id AS train_id,
             (SELECT sum((x - y) * (x - y)) FROM
               (SELECT unnest(t.embedding)::DOUBLE AS x,
                       unnest(tr.embedding)::DOUBLE AS y)) AS dist
           FROM test t CROSS JOIN train tr),
         knn AS (
           SELECT test_id, label FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY dist ASC, train_id ASC) AS rn
             FROM scored) WHERE rn <= 5),
         votes AS (
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
         SELECT test_id, CAST(label AS BIGINT) AS prediction FROM (
           SELECT test_id, label,
             row_number() OVER (PARTITION BY test_id
               ORDER BY cnt DESC, label ASC) AS vr
           FROM votes) WHERE vr = 1""",
    "q08_knn_accuracy" ->
      """WITH test AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 = 0),
         train AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
         scored AS (
           SELECT t.vec_id AS test_id, tr.label, tr.vec_id AS train_id,
             (SELECT sum((x - y) * (x - y)) FROM
               (SELECT unnest(t.embedding)::DOUBLE AS x,
                       unnest(tr.embedding)::DOUBLE AS y)) AS dist
           FROM test t CROSS JOIN train tr),
         knn AS (
           SELECT test_id, label FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY dist ASC, train_id ASC) AS rn
             FROM scored) WHERE rn <= 5),
         votes AS (
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label),
         preds AS (
           SELECT test_id, label AS prediction FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY cnt DESC, label ASC) AS vr
             FROM votes) WHERE vr = 1)
         SELECT CAST(sum(CASE WHEN p.prediction = t.label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
                count(*) AS total
         FROM preds p JOIN test t ON p.test_id = t.vec_id""")
}
