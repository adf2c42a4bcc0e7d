package graft.plans

import org.apache.spark.sql.functions._
import graft.{GraftExtensions, SparkSpec}
import graft.functions.VectorFunctions

class NativeRewriteSpec extends SparkSpec {
  import spark.implicits._

  // arrays built from the id column: NOT constant-foldable, so the
  // optimized plan keeps real expressions for inspection (literal rows
  // would collapse to a LocalRelation before the rewrite is visible)
  private lazy val df = spark.range(2).select(
    array($"id" + 1.0, $"id" + 2.0, $"id" + 3.0).as("a"),
    array($"id" * 2 + 4.0, $"id" * 2 + 6.0, $"id" * 2 + 8.0).as("b"))

  // id=0: a=[1,2,3],  b=[4,6,8]  -> sq = 9+16+25 = 50,  dot = 4+12+24 = 40
  // id=1: a=[2,3,4],  b=[6,8,10] -> sq = 16+25+36 = 77, dot = 12+24+40 = 76
  private def installed(): Unit = NativeRewrite.install(spark)

  // leave the shared session clean: the HOF-twin bit-equality suites
  // need the declarative path to execute as written
  override def afterAll(): Unit = {
    NativeRewrite.uninstall(spark)
    super.afterAll()
  }

  test("declarative sqeuclidean fold is rewritten to the native expression") {
    installed()
    val q = df.select(VectorFunctions.squaredEuclideanHof($"a", $"b").as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_sqeuclidean"), optimized)
    assert(!optimized.contains("aggregate(zip_with"), optimized)
    assert(q.as[Double].collect().sorted.toSeq === Seq(50.0, 77.0))
  }

  test("declarative dot fold is rewritten; results equal the HOF evaluation") {
    installed()
    val q = df.select(VectorFunctions.dotProductHof($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    assert(q.as[Double].collect().sorted.toSeq === Seq(40.0, 76.0))
  }

  test("SQL text with a hand-written aggregate(zip_with(...)) gets the native loop") {
    installed()
    df.createOrReplaceTempView("vecs_rw")
    val q = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) AS d
         FROM vecs_rw""")
    assert(q.queryExecution.optimizedPlan.toString.contains("vector_sqeuclidean"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.as[Double].collect().sorted.toSeq === Seq(50.0, 77.0))
  }

  test("non-matching folds are left untouched") {
    installed()
    df.createOrReplaceTempView("vecs_rw")
    // different combiner, different seed, different merge: all survive
    val keep = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) AS s1,
                aggregate(zip_with(a, b, (x, y) -> x * y),
                          CAST(1.0 AS DOUBLE), (acc, t) -> acc + t) AS s2,
                aggregate(zip_with(a, b, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc * t) AS s3
         FROM vecs_rw""")
    val plan = keep.queryExecution.optimizedPlan.toString
    assert(!plan.contains("vector_"), plan)
    val r = keep.orderBy(col("s1")).collect().head // id=0 row
    assert(r.getDouble(0) === 5.0 + 8.0 + 11.0)
    assert(r.getDouble(1) === 1.0 + 40.0)
    assert(r.getDouble(2) === 0.0)
  }

  test("rewrite is observationally equivalent on unequal-length arrays (null)") {
    installed()
    // zip_with pads the shorter side with nulls and the fold returns
    // NULL; the strict native expression must do the same — not read
    // past the array end
    val uneven = spark.range(2).select(
      array($"id" + 1.0, $"id" + 2.0, $"id" + 3.0).as("a"),
      array($"id" + 1.0, $"id" + 2.0).as("b"))
    val q = uneven.select(VectorFunctions.squaredEuclideanHof($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vector_sqeuclidean"))
    assert(q.collect().forall(_.isNullAt(0)))
  }

  test("rewrite is observationally equivalent on null elements (null)") {
    installed()
    val withNull = spark.range(2).select(
      array($"id" + 1.0, when($"id" >= 0, lit(null)).cast("double"), $"id" + 3.0).as("a"),
      array($"id" + 1.0, $"id" + 2.0, $"id" + 3.0).as("b"))
    val q = withNull.select(VectorFunctions.dotProductHof($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    assert(q.collect().forall(_.isNullAt(0)))
  }

  test("legacy-mode cosine divide fuses to one vector_cosine_raw loop") {
    installed()
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      df.createOrReplaceTempView("vecs_rw")
      val q = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)
                  / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))
                   * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))) AS c
           FROM vecs_rw""")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("vector_cosine_raw"), plan)
      assert(!plan.contains("aggregate(zip_with"), plan)
      // id=0: a=[1,2,3] b=[4,6,8]: dot=40, |a|=sqrt(14), |b|=sqrt(116)
      val expected = 40.0 / (math.sqrt(14.0) * math.sqrt(116.0))
      val got = q.as[Double].collect().min
      assert(got === expected)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("legacy cosine of a zero vector is NULL, matching legacy Divide") {
    installed()
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val zeros = spark.range(1).select(
        array(lit(0.0), $"id" * 0.0).as("a"), array(lit(1.0), lit(2.0)).as("b"))
      zeros.createOrReplaceTempView("vecs_rw_zero")
      val q = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)
                  / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))
                   * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y),
                            CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))) AS c
           FROM vecs_rw_zero""")
      assert(q.queryExecution.optimizedPlan.toString.contains("vector_cosine_raw"))
      assert(q.collect().head.isNullAt(0))
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("ANSI-mode cosine divide is NOT fused (error semantics) but folds are") {
    installed()
    // under ANSI the divide must throw on a zero denominator, so only
    // the three inner folds become native loops
    df.createOrReplaceTempView("vecs_rw")
    val q = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)
                / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))
                 * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, t) -> acc + t))) AS c
         FROM vecs_rw""")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    assert(!plan.contains("vector_cosine_raw"), plan)
    assert(plan.contains("vector_dot"), plan)
    val expected = 40.0 / (math.sqrt(14.0) * math.sqrt(116.0))
    assert(q.as[Double].collect().min === expected)
  }

  test("extension-class path injects the rule too") {
    // constructible + function/rule wiring (Class.forName deploy path)
    val ext = new GraftExtensions()
    val fake = new org.apache.spark.sql.SparkSessionExtensions
    ext(fake) // must not throw; rule + function registration accepted
  }
}
