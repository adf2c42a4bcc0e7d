package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen expression must be bit-for-bit identical to the HOF
  * formulation — the DuckDB oracle gate hashes raw doubles, so even a
  * 1-ulp divergence (e.g. from reassociating the fold) would break it.
  */
class VectorDistanceExprSpec extends SparkSpec {
  import spark.implicits._

  // the HOF→native rewrite must be OFF: these tests compare the native
  // expression against the genuinely-interpreted HOF execution; with the
  // rule installed both columns would plan to the same expression
  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.NativeRewrite.uninstall(spark)
  }

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs = {
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    a.join(b, $"ida" % 7 === $"idb" % 7 && $"ida" < $"idb").limit(2000)
  }

  test("bitwise equality with HOF on real float embeddings: sqeuclidean, dot, cosine") {
    val df = pairs.select(
      VectorFunctions.squaredEuclidean($"va", $"vb").as("sq_native"),
      VectorFunctions.squaredEuclideanHof($"va", $"vb").as("sq_hof"),
      VectorFunctions.dotProduct($"va", $"vb").as("dot_native"),
      VectorFunctions.dotProductHof($"va", $"vb").as("dot_hof"),
      VectorFunctions.cosineDistance($"va", $"vb").as("cd_native"),
      VectorFunctions.cosineDistanceHof($"va", $"vb").as("cd_hof"),
      VectorFunctions.cosineSimilarity($"va", $"vb").as("cs_native"),
      VectorFunctions.cosineSimilarityHof($"va", $"vb").as("cs_hof"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((n, h) <- Seq((0, 1), (2, 3), (4, 5), (6, 7)))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(n)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(h)),
          s"native ${r.getDouble(n)} != hof ${r.getDouble(h)} at col $n")
    }
  }

  test("byte arrays (int8 cells): exact integer-valued distances, codegen and interpreted agree") {
    // the exact_int8 arm's hot loop: array<tinyint> inputs promote
    // per-element to double, so Σ(Δ²) ≤ dim·254² is exact in double
    // Seq[Byte] (not Array[Byte], which encodes as BINARY) makes a
    // real array<tinyint> column — the type the int8 cells store
    val df = Seq(
      (Seq[Byte](1, -2, 3, 127), Seq[Byte](-127, 0, 3, -128)),
      (Seq[Byte](0, 0, 0, 0), Seq[Byte](0, 0, 0, 0)))
      .toDF("qa", "qb")
    val got = df.select(
        VectorFunctions.squaredEuclidean($"qa", $"qb").as("sq"),
        VectorFunctions.dotProduct($"qa", $"qb").as("dot"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val want0 = (Seq(1, -2, 3, 127) zip Seq(-127, 0, 3, -128))
      .map { case (x, y) => ((x - y).toDouble * (x - y), x.toDouble * y) }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(got(0) == want0 && got(1) == ((0.0, 0.0)), got.mkString(";"))
    // interpreted == codegen on bytes too
    val interp = df.select(VectorFunctions.squaredEuclidean($"qa", $"qb"))
    interp.queryExecution // force analysis
    assert(interp.collect().map(_.getDouble(0)).toSeq ==
      Seq(want0._1, 0.0))
  }

  test("interpreted eval path matches codegen (double arrays, zero vectors)") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 8.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0)),
      (Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0))
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.squaredEuclidean($"a", $"b").as("sq"),
      VectorFunctions.cosineSimilarity($"a", $"b").as("cs"),
      VectorFunctions.cosineDistance($"a", $"b").as("cd"))
      .as[(Double, Double, Double)].collect().toSeq
    assert(got(0)._1 === 50.0)
    assert(got(1) === ((14.0, 0.0, 1.0)))
    assert(got(2) === ((0.0, 0.0, 1.0)))
  }

  test("null array input yields null") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dotProduct($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("whole-stage codegen actually kicks in (distance Project runs inside a codegen stage)") {
    val df = pairs.select(VectorFunctions.squaredEuclidean($"va", $"vb").as("d"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix marks a WholeStageCodegen stage; the distance
    // Project must carry it (a CodegenFallback expression would strip it)
    assert("""\*\(\d+\) Project \[vector_sqeuclidean""".r.findFirstIn(plan).isDefined,
      plan.take(800))
  }
}
