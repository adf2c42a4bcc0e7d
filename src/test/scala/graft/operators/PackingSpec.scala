package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "id", "toks")
  }

  test("concat-and-chunk assignment: a doc lands in the window its first token falls in") {
    // cum-before: 0, 200, 400, 600, 1112 → packs 0, 0, 0, 1, 2 at capacity 512
    val d = docs(("a", 1, 200), ("a", 2, 200), ("a", 3, 200), ("a", 4, 512), ("a", 5, 1))
    val out = Packing.assignPacks(d, "src", "id", "toks", 512L)
      .orderBy("id").select("id", "tok_before", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 0L, 0L), (2L, 200L, 0L), (3L, 400L, 0L),
      (4L, 600L, 1L), (5L, 1112L, 2L)))
  }

  test("shards pack independently — ids reused across shards don't interact") {
    val d = docs(("a", 1, 500), ("b", 1, 500), ("a", 2, 500), ("b", 2, 20))
    val out = Packing.assignPacks(d, "src", "id", "toks", 512L)
      .select("src", "id", "pack_id")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out(("a", 1L)) === 0L && out(("a", 2L)) === 0L) // 500 < 512 still window 0
    assert(out(("b", 1L)) === 0L && out(("b", 2L)) === 0L)
    val sum = Packing.packSummary(d, "src", "id", "toks", 512L)
      .filter(col("src") === "a" && col("pack_id") === 0)
      .select("n_docs", "pack_tokens").head
    assert(sum.getLong(0) === 2L && sum.getLong(1) === 1000L)
  }

  test("plan: running sum partitions by the shard key (no single-partition exchange)") {
    val d = docs(("a", 1, 10), ("b", 2, 10))
    val plan = Packing.assignPacks(d, "src", "id", "toks", 512L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(src"), s"window not shard-partitioned:\n$plan")
    assert(!plan.contains("SinglePartition"), s"global sort in packing plan:\n$plan")
  }

  test("audit counts the straddled final window — tail_waste never negative") {
    // A lone 600-token doc occupies windows 0 and 1: n_packs = 2 (from
    // end_pack, not pack_id), tail_waste = 2*512 - 600 = 424, and the
    // doc itself counts as straddling.
    val d = docs(("a", 1, 600))
    val r = Packing.packAudit(d, "src", "id", "toks", 512L).head
    assert(r.getAs[Long]("n_packs") === 2L)
    assert(r.getAs[Long]("tail_waste") === 424L)
    assert(r.getAs[Long]("n_straddling") === 1L)
    // Non-straddling shard: 500 + 12 tokens exactly fill window 0.
    val full = docs(("b", 1, 500), ("b", 2, 12))
    val rf = Packing.packAudit(full, "src", "id", "toks", 512L).head
    assert(rf.getAs[Long]("n_packs") === 1L)
    assert(rf.getAs[Long]("tail_waste") === 0L)
    assert(rf.getAs[Long]("n_straddling") === 0L)
  }

  test("capacity must be positive") {
    intercept[IllegalArgumentException] {
      Packing.assignPacks(docs(("a", 1, 1)), "src", "id", "toks", 0L)
    }
  }
}
