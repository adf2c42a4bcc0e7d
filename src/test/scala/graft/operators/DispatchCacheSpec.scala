package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pq.audits]] — the dispatch-side audit cache (round-16 verdict
  * #5): an unchanged tree costs a dispatch metadata stats only; each
  * cache invalidates on exactly the event that can change its value
  * (appends move occupancy but not the publish-time stamp; a
  * republish moves both). */
class DispatchCacheSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
    (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
    (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)))
    .toDF("vec_id", "embedding")

  test("unchanged tree: one load; append reloads occupancy but not the stamp; republish reloads both") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_dispatch_cache_spec"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 1)

    def loads() = (Pq.audits.metaLoads.get(), Pq.audits.resolutionLoads.get(),
      Pq.audits.occupancyLoads.get())

    val base = loads()
    val meta1 = Pq.audits.meta(spark, path)
    val res1 = Pq.audits.resolutionDecision(spark, path)
    val occ1 = Pq.audits.occupancy(spark, path)
    val afterFirst = loads()
    assert(afterFirst == (base._1 + 1, base._2 + 1, base._3 + 1))

    // unchanged tree: the dispatch's re-reads are cache hits — no
    // new loads, identical values
    assert(Pq.audits.meta(spark, path) == meta1)
    assert(Pq.audits.resolutionDecision(spark, path) == res1)
    assert(Pq.audits.occupancy(spark, path) == occ1)
    assert(loads() == afterFirst, "an unchanged tree must not re-read")

    // a tagged append moves the state signature: occupancy reloads
    // (its value changed); meta and the publish-time stamp do NOT —
    // an append can change neither (the q178 doctrine)
    Pq.appendIvfPqIndex(
      Seq((2L, Seq(0.9f, 0.1f, 0.1f, 0.9f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, batchTag = Some("c1"))
    val occ2 = Pq.audits.occupancy(spark, path)
    assert(occ2.nCodes == occ1.nCodes + 1, s"$occ1 -> $occ2")
    assert(Pq.audits.resolutionDecision(spark, path) == res1)
    assert(Pq.audits.meta(spark, path) == meta1)
    val afterAppend = loads()
    assert(afterAppend == (afterFirst._1, afterFirst._2, afterFirst._3 + 1),
      s"append must reload ONLY occupancy: $afterFirst -> $afterAppend")

    // a republish (full rebuild over the grown corpus) moves the
    // meta data-file fingerprint: every cache reloads on next read.
    // No mtime-granularity sleep — the key is (name, length, mtime)
    // of the sidecar's data files, and a publish writes fresh file
    // names, so the key moves even when every mtime ties (the
    // round-17 advice: 1 s local-fs granularity / object stores with
    // no directory mtime must not serve a stale dispatch arm)
    Pq.buildIvfPqIndex(corpus.unionAll(
        Seq((2L, Seq(0.9f, 0.1f, 0.1f, 0.9f))).toDF("vec_id", "embedding")),
      "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 1)
    Pq.audits.meta(spark, path)
    Pq.audits.resolutionDecision(spark, path)
    Pq.audits.occupancy(spark, path)
    val afterRepublish = loads()
    assert(afterRepublish ==
      (afterAppend._1 + 1, afterAppend._2 + 1, afterAppend._3 + 1),
      s"republish must reload all three: $afterAppend -> $afterRepublish")
  }
}
