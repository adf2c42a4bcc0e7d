package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pq]] — product quantization: per-subspace codebook training,
  * encoding, reconstruction error, and ADC search semantics. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups per subspace half: vectors 0-2 live at (1,0|0,1)-ish,
  // 10-12 at (5,5|5,5)-ish — k=2 per subspace must separate them
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
    (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
    (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
    (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
    (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
    .toDF("vec_id", "embedding")

  test("codebooks: one per subspace, k-bounded, deterministic") {
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2)
    assert(cbs.size == 2)
    assert(cbs.forall(_.size <= 2))
    assert(cbs.forall(_.forall(_._2.size == 2))) // 2-dim sub-centroids
    val again = Pq.codebooks(corpus, "vec_id", "embedding", 4, 2, 2, 2)
    assert(cbs == again)
  }

  test("encode separates the two groups and group-mates share codes") {
    val out = Pq.encodeWithError(corpus, "vec_id", "embedding",
        dim = 4, m = 2, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (lowCodes, hiCodes) = (out(0L), out(10L))
    assert(lowCodes._1 == out(1L)._1 && lowCodes._2 == out(1L)._2)
    assert(hiCodes._1 == out(11L)._1 && hiCodes._2 == out(11L)._2)
    assert(lowCodes._1 != hiCodes._1, "subspace 0 must separate the groups")
    // reconstruction error is nonneg and small relative to the group gap
    assert(out.values.forall(_._3 >= 0L))
  }

  test("adcTopK ranks the query's own group first") {
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding", 4, 2, 2, 2)
    val coded = Pq.encodeWith(corpus, "vec_id", "embedding", 4, cbs)
      .select(col("vec_id"), col("code0"), col("code1"))
    val q = Seq((100L, Seq(1.0f, 0.05f, 0.05f, 1.0f))).toDF("vec_id", "embedding")
    val top = Pq.adcTopK(q, coded, cbs, 4, 3, "vec_id", "embedding")
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    // all three low-group members (ADC-tied at the shared centroid,
    // tie-broken by id) before any high-group member
    assert(top == Seq(0L, 1L, 2L), top)
  }

  test("fused training is bit-identical to per-subspace lloydCentroids") {
    val fused = Pq.codebooks(corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2)
    val perSub = (0 until 2).map { s =>
      SemDedup.lloydCentroids(
        corpus.select(col("vec_id").as("id"),
          slice(col("embedding"), s * 2 + 1, 2).as("subv")),
        "id", "subv", k = 2, iters = 2)
    }
    assert(fused == perSub)
  }

  test("m must divide dim") {
    intercept[IllegalArgumentException] {
      Pq.codebooks(corpus, "vec_id", "embedding", dim = 4, m = 3, k = 2, iters = 1)
    }
  }
}
