package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SemDedup]] — deterministic quantized k-means + within-cluster
  * cosine dedup. The oracle gate (q127) pins the full pipeline against
  * DuckDB; these specs pin the semantics the gate can't show directly:
  * cluster separation on a constructed corpus, drop directionality,
  * cluster-death behavior, and re-run determinism.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated groups on orthogonal axes, plus one near-dup in
  // each group (ids 10/11 are scaled copies => cosine 1; 20/21 likewise).
  // NB the deterministic codebook seeds from the two smallest ids (both
  // group A) — two Lloyd rounds must still recover the group split.
  private def corpus = Seq(
    (10L, Seq(1.0f, 0.0f, 0.1f)),
    (11L, Seq(1.05f, 0.0f, 0.105f)),
    (12L, Seq(0.9f, 0.1f, 0.0f)),
    (20L, Seq(0.0f, 1.0f, 0.1f)),
    (21L, Seq(0.0f, 1.05f, 0.105f)),
    (22L, Seq(0.1f, 0.9f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("kmeans separates orthogonal groups into distinct clusters") {
    val a = SemDedup.kmeansAssign(corpus, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(10L) == a(11L) && a(11L) == a(12L))
    assert(a(20L) == a(21L) && a(21L) == a(22L))
    assert(a(10L) != a(20L))
  }

  test("semDedup drops the larger id of a within-cluster near-dup pair") {
    val out = SemDedup.semDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 2, minCosineMicro = 990000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // scaled copies have cosine 1 => larger ids 11 and 21 are dropped,
    // their seniors 10 and 20 survive, the merely-nearby 12/22 survive
    assert(out == Map(10L -> 1L, 11L -> 0L, 12L -> 1L,
      20L -> 1L, 21L -> 0L, 22L -> 1L))
  }

  test("cross-cluster near-dups are NOT dropped (clustering bounds recall)") {
    // k=6 on 6 vectors: every vector seeds its own cluster, so the
    // near-dup pairs never share one and nothing is dropped — the
    // documented recall/k trade-off, visible at the degenerate extreme
    val out = SemDedup.semDedup(corpus, "vec_id", "embedding",
      k = 6, iters = 1, minCosineMicro = 990000L)
    assert(out.filter(col("kept") === 0L).count() == 0)
  }

  test("k larger than the corpus degrades to |corpus| clusters") {
    val a = SemDedup.kmeansAssign(corpus, "vec_id", "embedding", k = 10, iters = 1)
    assert(a.count() == 6)
    assert(a.select("cluster").distinct().count() <= 6)
  }

  test("re-running reproduces the identical clustering and verdicts") {
    def run() = SemDedup.semDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 2, minCosineMicro = 990000L)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("width cap excludes over-wide clusters: their members are all kept") {
    // k=2 on the 6-vector corpus gives two width-3 clusters; cap=2
    // trips both, so the pair join sees nothing and every near-dup
    // that an uncapped run drops (11, 21) survives — the documented
    // "cap drops the whole cluster, members kept" contract
    val out = SemDedup.semDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 2, minCosineMicro = 990000L,
      maxClusterWidth = Some(2))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.forall(_ == 1L))
    assert(out.size == 6)
  }

  test("cap at or above the max width is a no-op vs the uncapped run") {
    def rows(cap: Option[Int]) =
      SemDedup.semDedup(corpus, "vec_id", "embedding",
        k = 2, iters = 2, minCosineMicro = 990000L, maxClusterWidth = cap)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(rows(Some(3)) == rows(None))
  }

  test("clusterWidthAudit reports widths and the dropped flag under the cap") {
    val audit = SemDedup.clusterWidthAudit(corpus, "vec_id", "embedding",
      k = 2, iters = 2, maxClusterWidth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // both clusters are width 3 > cap 2 => both flagged dropped
    assert(audit.map(_._2) == Set(3L))
    assert(audit.forall(_._3 == 1L))
    assert(audit.size == 2)
    // and the audit's widths agree with the assignment it describes
    val widths = SemDedup.kmeansAssign(corpus, "vec_id", "embedding", 2, 2)
      .groupBy(col("cluster")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit.map(t => t._1 -> t._2).toMap == widths)
  }

  test("cap below 2 is rejected") {
    intercept[IllegalArgumentException] {
      SemDedup.semDedup(corpus, "vec_id", "embedding",
        k = 2, iters = 2, minCosineMicro = 990000L, maxClusterWidth = Some(1))
        .collect()
    }
  }
}
