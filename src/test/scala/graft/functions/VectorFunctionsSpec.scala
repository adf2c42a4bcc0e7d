package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import VectorFunctions._

  private def eval1(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.cast("double").as("v")).head().getDouble(0)
  }

  private val a = array(lit(1.0), lit(2.0), lit(3.0))
  private val b = array(lit(4.0), lit(6.0), lit(8.0))

  test("squaredEuclidean matches hand computation, no sqrt (Hadoop.java:155-165)") {
    assert(eval1(squaredEuclidean(a, b)) === 9.0 + 16.0 + 25.0)
    assert(eval1(squaredEuclidean(a, a)) === 0.0)
  }

  test("euclidean is the sqrt of squaredEuclidean") {
    assert(math.abs(eval1(euclidean(a, b)) - math.sqrt(50.0)) < 1e-12)
  }

  test("dot product and l2 norm") {
    assert(eval1(dotProduct(a, b)) === 4.0 + 12.0 + 24.0)
    assert(math.abs(eval1(l2Norm(a)) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine: identical vectors → sim 1 / dist 0; zero vector → sim 0") {
    assert(math.abs(eval1(cosineSimilarity(a, a)) - 1.0) < 1e-12)
    assert(math.abs(eval1(cosineDistance(a, a))) < 1e-12)
    val z = array(lit(0.0), lit(0.0), lit(0.0))
    assert(eval1(cosineSimilarity(a, z)) === 0.0)
  }

  test("float arrays promote to double (testdata embedding type)") {
    val af = array(lit(1.0f), lit(2.0f), lit(3.0f))
    assert(eval1(squaredEuclidean(af, a)) === 0.0)
  }

  test("l2Normalize: unit norm, direction preserved, zero vector passes through") {
    import spark.implicits._
    def vec(c: org.apache.spark.sql.Column): Seq[Double] =
      Seq(1).toDF("x").select(c.as("v")).head().getSeq[Double](0).toList
    val n = vec(l2Normalize(array(lit(3.0), lit(4.0))))
    assert(math.abs(math.sqrt(n.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(n === Seq(0.6, 0.8))
    val z = vec(l2Normalize(array(lit(0.0), lit(0.0))))
    assert(z === Seq(0.0, 0.0)) // no NaN
    // normalized-then-dot equals cosine similarity of the originals
    val cs = eval1(dotProduct(l2Normalize(a), l2Normalize(b)))
    assert(math.abs(cs - eval1(cosineSimilarity(a, b))) < 1e-12)
  }
}
