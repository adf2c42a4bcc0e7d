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
      "minhash_signature", "simhash", "hyperplane_signature"))
    new GraftExtensions() // constructible (Class.forName path)
  }
}
