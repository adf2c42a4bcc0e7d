package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Bloom-runtime-filter decontamination path (q58) must be
  * bit-identical to the broadcast path (q56): a Bloom filter has no
  * false negatives, and its false positives die in the exact join.
  */
class BloomDecontamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered shared counts == broadcast shared counts (q58 ≡ q56)") {
    val a = graft.Queries.decontamination(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = graft.Queries.decontaminationBloom(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.nonEmpty, "decontam query found no contaminated docs — test data degenerate")
    assert(b.toSeq === a.toSeq)
  }

  test("might_contain has no false negatives and prefilters before the exchange") {
    import spark.implicits._
    val keys = Seq(1L, 42L, 7777L, -3L).toDF("k")
    val bloom = Dedup.bloomBits(keys, "k", expectedItems = 100L)
    assert(bloom.isDefined)
    val probes = Seq(1L, 2L, 42L, -3L, 999L).toDF("k")
    val hits = probes.filter(Dedup.mightContain(bloom.get, col("k")))
      .as[Long].collect().toSet
    assert(Set(1L, 42L, -3L).subsetOf(hits)) // no false negatives, ever
  }

  test("empty build side yields no bloom, and the operator returns zero rows") {
    import spark.implicits._
    val corpus = Seq((1L, 10L), (2L, 20L)).toDF("id", "k")
    val empty = Seq.empty[Long].toDF("k")
    assert(Dedup.bloomBits(empty, "k", 10L).isEmpty)
    val out = Dedup.sharedKeyCountsBloom(corpus, empty, "id", "k", 10L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("id", "n_shared"))
  }

  test("plan: bloom predicate sits below the shuffle exchange of a shuffle-hash join") {
    val plan = graft.Queries.decontaminationBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom predicate in plan:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"join did not shuffle-hash:\n$plan")
    // the Filter carrying might_contain must be a descendant of an Exchange
    // (i.e., evaluated map-side, before rows hit the wire)
    val lines = plan.linesIterator.toVector
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    val bloomIdx = lines.indexWhere(_.contains("might_contain"))
    assert(exchangeIdx >= 0 && bloomIdx > exchangeIdx,
      s"might_contain not under an exchange (exchange@$exchangeIdx bloom@$bloomIdx):\n$plan")
  }
}
