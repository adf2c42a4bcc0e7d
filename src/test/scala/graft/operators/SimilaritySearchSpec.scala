package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" % 10 === 0)

  test("exact cosine top-k: ranks ascend by distance, k per query") {
    val r = SimilaritySearch.cosineTopK(queries, emb.filter($"vec_id" % 10 =!= 0),
      k = 5, "vec_id", "vec_id", "embedding", "embedding")
    val rows = r.select("query_id", "rank", "dist").as[(Long, Int, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.length == 5))
    for ((_, rs) <- byQ) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("hyperplane signature: deterministic, within planes-bit range, similar-to-self") {
    val sig = emb.select(
      SimilaritySearch.hyperplaneSignature($"embedding", planes = 8, dim = 64).as("s"))
      .as[Long].collect()
    assert(sig.forall(s => s >= 0 && s < 256))
    val again = emb.select(
      SimilaritySearch.hyperplaneSignature($"embedding", planes = 8, dim = 64).as("s"))
      .as[Long].collect()
    assert(sig.toSeq === again.toSeq)
  }

  test("approx cosine top-k: decent recall@5 of the exact result on sf0.001") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val exact = SimilaritySearch.cosineTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = SimilaritySearch.approxCosineTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding", dim = 64, planes = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // uniform random embeddings are LSH's worst case (no cluster
    // structure), so assert (a) recall well above the 5/450 ≈ 0.011-per-
    // pick chance baseline (random 5 picks → expected overlap 0.055) and
    // (b) the bucketing actually pruned the candidate space
    assert(approx.nonEmpty)
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.2, s"recall@5 = $recall too low for planes=4, tables=8")
  }

  test("IVF top-k: results ⊆ probed lists, exact within, decent recall vs brute force") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val ivf = SimilaritySearch.ivfTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding", centroids = 8, probes = 3)
      .select("query_id", "rank", "neighbor_id", "dist")
      .as[(Long, Int, Long, Double)].collect()
    val byQ = ivf.groupBy(_._1)
    assert(byQ.nonEmpty)
    // ranks ascend by distance within each query
    for ((_, rs) <- byQ) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(p => p.head <= p.last))
    }
    val exact = Knn.knnJoin(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map { q =>
      byQ.getOrElse(q, Array.empty).map(_._3).toSet.intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * 5)
    // probing 3 of 8 sampled cells on unclustered data: must beat chance
    // (3/8 of the corpus ≈ 0.375 expected recall for random assignment)
    assert(recall >= 0.3, s"IVF recall@5 = $recall")
  }

  test("multi-probe LSH: recall@5 never below the unprobed config's") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val exact = SimilaritySearch.cosineTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(flips: Int): Double = {
      val a = SimilaritySearch.approxCosineTopK(queries, items, 5,
        "vec_id", "vec_id", "embedding", "embedding",
        dim = 64, planes = 5, tables = 8, probeFlips = flips)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.toSeq.map(q =>
        a.getOrElse(q, Set.empty).intersect(exact(q)).size).sum.toDouble /
        (exact.size * 5)
    }
    // probing only ADDS candidate buckets per query: the candidate set is
    // a superset, so top-5-vs-exact overlap cannot fall
    val (r0, rp) = (recall(0), recall(5))
    assert(rp >= r0, s"multi-probe recall $rp < unprobed $r0")
    // and at full 1-bit probing the lift on this SF is material, not noise
    assert(rp >= r0 + 0.1 || rp >= 0.9, s"probed=$rp unprobed=$r0")
  }

  test("IVF multi-assignment: recall@5 never below single-assignment's") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val exact = Knn.knnJoin(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(assign: Int): Double = {
      val a = SimilaritySearch.ivfTopK(queries, items, 5,
        "vec_id", "vec_id", "embedding", "embedding",
        centroids = 8, probes = 3, assignments = assign)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.toSeq.map(q =>
        a.getOrElse(q, Set.empty).intersect(exact(q)).size).sum.toDouble /
        (exact.size * 5)
    }
    // replicating items into more lists only ADDS candidates per query
    val (r1, r2) = (recall(1), recall(2))
    assert(r2 >= r1, s"multi-assign recall $r2 < single $r1")
    // de-dup invariant: no neighbor may appear twice for one query
    val dup = SimilaritySearch.ivfTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding",
      centroids = 8, probes = 3, assignments = 3)
      .groupBy($"query_id", $"neighbor_id").count().filter($"count" > 1).count()
    assert(dup === 0L)
  }

  test("q44 recall query: integer-exact counts, recall floors hold on sf0.001") {
    val rows = graft.Queries.annRecall(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.keySet === Set("ivf", "lsh"))
    for ((m, (hits, possible, recallMicro)) <- rows) {
      assert(possible > 0 && hits >= 0 && hits <= possible, s"$m: $hits/$possible")
      assert(recallMicro === math.floor(hits * 1000000.0 / possible).toLong)
      // both approximate paths must beat 20% recall@5 at this SF
      assert(recallMicro >= 200000L, s"$m recall@5 = $recallMicro micro")
    }
  }

  test("int8Quantize: codes integral, bounded by ±127, zeros on zero scale") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Seq(0.25f, -0.125f, 1.0f, -0.33f))).toDF("id", "v")
    val mx = lit(1.0)
    val codes = df.select($"id",
      SimilaritySearch.int8Quantize($"v", mx).as("q"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(codes(1L) === Seq(127.0, -127.0, 64.0, 0.0)) // round(63.5) → 64 (HALF_UP)
    assert(codes(2L) === Seq(32.0, -16.0, 127.0, -42.0))
    assert(codes.values.flatten.forall(c => c == math.rint(c) || c == math.floor(c) + 1))
    assert(codes.values.flatten.forall(c => c >= -127.0 && c <= 127.0))
    val zeroed = df.select(
      SimilaritySearch.int8Quantize($"v", lit(0.0)).as("q"))
      .as[Seq[Double]].collect()
    assert(zeroed.forall(_.forall(_ == 0.0)))
  }

  test("int8Quantize native expr bit-equals the HOF twin on the corpus and edge cases") {
    // whole corpus, real scale
    val mx = emb.agg(max(SimilaritySearch.maxAbsElem($"embedding"))).as[Double].head()
    val mismatch = emb.select(
        SimilaritySearch.int8Quantize($"embedding", lit(mx)).as("native"),
        SimilaritySearch.int8QuantizeHof($"embedding", lit(mx)).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatch === 0L)
    // edges: zero scale (zeros, nulls included), null scale, null element
    val arr = array(lit(1.0), lit(null).cast("double"), lit(-0.5))
    def row(n: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
      Seq(1).toDF("x").select(n.as("n"), h.as("h")).head()
    val z = row(SimilaritySearch.int8Quantize(arr, lit(0.0)),
      SimilaritySearch.int8QuantizeHof(arr, lit(0.0)))
    assert(z.getSeq[java.lang.Double](0) === z.getSeq[java.lang.Double](1))
    val nl = row(SimilaritySearch.int8Quantize(arr, lit(null).cast("double")),
      SimilaritySearch.int8QuantizeHof(arr, lit(null).cast("double")))
    assert(nl.getSeq[java.lang.Double](0) === nl.getSeq[java.lang.Double](1))
    val real = row(SimilaritySearch.int8Quantize(arr, lit(2.0)),
      SimilaritySearch.int8QuantizeHof(arr, lit(2.0)))
    assert(real.getSeq[java.lang.Double](0) === real.getSeq[java.lang.Double](1))
    // 1.0·127/2 = 63.5 → 64 (HALF_UP); −0.5·127/2 = −31.75 → −32
    assert(real.getSeq[java.lang.Double](0).toList === List[java.lang.Double](
      java.lang.Double.valueOf(64.0), null, java.lang.Double.valueOf(-32.0)))
  }

  test("quantizedTopK: distances are exact integers matching a hand quantization") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val r = SimilaritySearch.quantizedTopK(queries.limit(4), items, 3,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "rank", "neighbor_id", "qdist")
      .as[(Long, Int, Long, Long)].collect()
    assert(r.nonEmpty && r.groupBy(_._1).values.forall(_.length == 3))
    // recompute one (query, neighbor) distance by hand on the driver
    val mx = emb.select(SimilaritySearch.maxAbsElem($"embedding").as("m"))
      .agg(max($"m")).as[Double].head()
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def q8(v: Seq[Float]): Seq[Long] = v.map(x =>
      BigDecimal(x * 127.0 / mx).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    for ((qid, _, nid, qdist) <- r.take(5)) {
      val (qa, ia) = (q8(vecs(qid)), q8(vecs(nid)))
      val expect = qa.zip(ia).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(qdist === expect, s"($qid,$nid)")
    }
  }

  test("quantizedTopK: near-lossless recall vs exact on sf0.001; self at distance 0") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    val exact = Knn.knnJoin(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = SimilaritySearch.quantizedTopK(queries, items, 5,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map { q =>
      quant.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * 5)
    // int8 against a global scale loses little: well above any ANN floor
    assert(recall >= 0.7, s"int8 recall@5 = $recall")
    // an item used as its own query quantizes identically on both sides
    val self = items.limit(3).select($"vec_id", $"embedding")
    val s = SimilaritySearch.quantizedTopK(self, items, 1,
      "vec_id", "vec_id", "embedding", "embedding")
      .select("query_id", "neighbor_id", "qdist").as[(Long, Long, Long)].collect()
    assert(s.length === 3 && s.forall(t => t._1 == t._2 && t._3 == 0L), s.mkString(", "))
  }

  test("IVF top-k: identical query finds itself when its list is probed first") {
    val items = emb.filter($"vec_id" % 10 =!= 0)
    // use an item AS the query: its nearest neighbor is itself at dist 0,
    // and its own centroid list is always the first probe
    val self = items.limit(3).select($"vec_id", $"embedding")
    val r = SimilaritySearch.ivfTopK(self, items, 1,
      "vec_id", "vec_id", "embedding", "embedding", centroids = 8, probes = 1)
      .select("query_id", "neighbor_id", "dist").as[(Long, Long, Double)].collect()
    assert(r.length === 3)
    assert(r.forall(t => t._1 == t._2 && t._3 == 0.0), r.mkString(", "))
  }
}
