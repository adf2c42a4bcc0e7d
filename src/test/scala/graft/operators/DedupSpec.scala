package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words entirely here now"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "unrelated text about spark and scala engines")
  ).toDF("doc_id", "text")

  test("exactGroups: one survivor per identical text, min id, copy count") {
    val g = Dedup.exactGroups(docs, Seq("text"), "doc_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g === Set((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
    val surv = Dedup.exactSurvivors(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(surv === Set(0L, 1L, 2L, 4L))
  }

  test("jaccardPairs: hand-computed 3-gram jaccard") {
    // docs 0/1: 7 shingles each, 6 shared → j = 6/8 = 0.75
    // docs 0/3: identical → j = 1
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L, 750000L), (0L, 3L, 1000000L), (1L, 3L, 750000L)))
  }

  test("lshCandidates finds exact and high-jaccard dups") {
    val cand = Dedup.lshCandidates(docs, "doc_id", "text").as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 3L)), "exact dup must collide in every band")
    assert(cand.contains((0L, 1L)) && cand.contains((1L, 3L)),
      s"0.75-jaccard pair should collide in ≥1 of 8 bands (p≈0.98): $cand")
  }

  test("lshVerifiedPairs == jaccardPairs restricted to LSH candidates") {
    val v = Dedup.lshVerifiedPairs(docs, "doc_id", "text").as[(Long, Long, Long)].collect().toSet
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(v.subsetOf(j))
    assert(v.contains((0L, 3L, 1000000L)))
  }

  test("simHash: identical texts get identical hashes; banded pairs complete vs brute force") {
    val h = docs.select($"doc_id", Dedup.simHash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) === h(3L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))

    // banded join must find exactly the pairs brute force finds
    val banded = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3, bits = 32, bands = 4)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (i, hi) <- h; (j, hj) <- h if i < j
      ham = java.lang.Long.bitCount(hi ^ hj)
      if ham <= 3
    } yield (i, j, ham.toLong)).toSet
    assert(banded === brute)
  }

  test("cosinePairs: colinear vectors score 1e6, orthogonal filtered out") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(2.0, 0.0)), (2L, Seq(0.0, 1.0))
    ).toDF("id", "vec")
    val pairs = Dedup.cosinePairs(vecs, "id", "vec", 900000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L, 1000000L)))
  }
}
