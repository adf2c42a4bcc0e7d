package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 8.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT vector_sqeuclidean(a, b) AS sq, vector_dot(a, b) AS dot,
         vector_cosine_sim(a, a) AS cs,
         poly_hash_array(array('a', 'ab')) AS ph FROM vecs""").head()
    assert(r.getDouble(0) === 50.0)
    assert(r.getDouble(1) === 40.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getSeq[Long](3) === Seq(97L, (97L * 131 + 98) % 1000000007L))
  }

  test("extension class wires the same registry entries") {
    // the class is exercised via spark.sql.extensions in a real deploy;
    // here assert it enumerates exactly the registered names
    assert(GraftExtensions.all.map(_._1).toSet === Set(
      "vector_sqeuclidean", "vector_dot", "vector_cosine_distance",
      "vector_cosine_sim", "poly_hash_array",
      "minhash_signature", "simhash", "hyperplane_signature",
      "z_value", "det_bucket", "redact_pii", "shingle_hash", "int8_quantize",
      "cdc_chunks", "winnow_fingerprints"))
    new GraftExtensions() // constructible (Class.forName path)
  }

  test("int8_quantize in SQL equals the Column API") {
    GraftExtensions.register(spark)
    val sqlV = spark.sql(
      "SELECT int8_quantize(array(1.0D, -0.5D), 2.0D) AS q").head().getSeq[Double](0)
    val apiV = Seq("x").toDF("x").select(
      operators.SimilaritySearch.int8Quantize(
        array(lit(1.0), lit(-0.5)), lit(2.0)).as("q")).head().getSeq[Double](0)
    assert(sqlV.toList === apiV.toList && sqlV.toList === List(64.0, -32.0))
  }

  test("shingle_hash in SQL equals the Column API") {
    GraftExtensions.register(spark)
    val sqlV = spark.sql(
      "SELECT shingle_hash(array('a','b','c','d'), 3) AS s").head().getSeq[Long](0)
    val apiV = Seq("x").toDF("x").select(
      graft.functions.ShingleHashExpr(array(lit("a"), lit("b"), lit("c"), lit("d")), 3)
        .as("s")).head().getSeq[Long](0)
    assert(sqlV.toList === apiV.toList && sqlV.length === 2)
  }

  test("cdc_chunks in SQL equals the Column API") {
    GraftExtensions.register(spark)
    val hashes = (1 to 30).map(i => (i * 7919L) % 1000000007L)
    val hSql = hashes.mkString("array(", "L,", "L)")
    val sqlV = spark.sql(s"SELECT cdc_chunks($hSql, 4, 8) AS c")
      .head().getSeq[Long](0)
    val apiV = Seq("x").toDF("x").select(
      graft.functions.CdcChunksExpr(
        array(hashes.map(lit): _*), 4, 8).as("c")).head().getSeq[Long](0)
    assert(sqlV.toList === apiV.toList && sqlV.nonEmpty)
    // packed contract: lens sum to the input length
    assert(sqlV.map(_ % 4294967296L).sum === 30L)
  }

  test("winnow_fingerprints in SQL equals the Column API") {
    GraftExtensions.register(spark)
    val hashes = (1 to 40).map(i => (i * 6007L) % 1000000007L)
    val hSql = hashes.mkString("array(", "L,", "L)")
    val sqlV = spark.sql(s"SELECT winnow_fingerprints($hSql, 4, 4) AS f")
      .head().getSeq[Long](0)
    val apiV = Seq("x").toDF("x").select(
      graft.functions.WinnowFingerprintsExpr(
        array(hashes.map(lit): _*), 4, 4).as("f")).head().getSeq[Long](0)
    assert(sqlV.toList === apiV.toList && sqlV.nonEmpty)
  }

  test("composite SQL functions equal their Column-API originals") {
    GraftExtensions.register(spark)
    Seq((12345L, 54321L, "ping 10.0.0.1 from bob@x.io"))
      .toDF("a", "b", "text").createOrReplaceTempView("comp")
    val sqlRow = spark.sql(
      """SELECT z_value(a, b) AS z, det_bucket(a, 10) AS bk,
         redact_pii(text) AS red, redact_pii(text, '#') AS red2
         FROM comp""").head()
    val apiRow = spark.table("comp").select(
      operators.Layout.zValue($"a", $"b"),
      operators.Sampling.bucket($"a", 10),
      graft.functions.TextFunctions.redact($"text",
        Seq(graft.functions.TextFunctions.EmailRe,
          graft.functions.TextFunctions.UrlRe,
          graft.functions.TextFunctions.DigitRunRe), "<X>"),
      graft.functions.TextFunctions.redact($"text",
        Seq(graft.functions.TextFunctions.EmailRe,
          graft.functions.TextFunctions.UrlRe,
          graft.functions.TextFunctions.DigitRunRe), "#")).head()
    assert(sqlRow.getLong(0) === apiRow.getLong(0))
    assert(sqlRow.getLong(1) === apiRow.getLong(1))
    assert(sqlRow.getString(2) === apiRow.getString(2))
    assert(sqlRow.getString(3) === apiRow.getString(3))
    assert(sqlRow.getString(2) === "ping <X>.<X>.<X>.<X> from <X>")
  }

  test("a foldable NULL literal argument fails with the argument's name, not an NPE") {
    GraftExtensions.register(spark)
    Seq(("a 42 b")).toDF("text").createOrReplaceTempView("nulltok")
    val e = intercept[Exception] {
      spark.sql("SELECT redact_pii(text, NULL) FROM nulltok").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("token must be a non-null literal"))),
      s"got: $e")
  }
}
