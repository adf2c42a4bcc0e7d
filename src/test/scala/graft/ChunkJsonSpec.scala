package graft

import org.apache.spark.sql.functions._

/** q60 (semi-structured JSON extraction) and q61 (overlapping document
  * chunking) invariants beyond the DuckDB hash gate. */
class ChunkJsonSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("chunking: stride/window invariants and exact substring semantics") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val chunks = Queries.chunkDocuments(spark, sf).collect()
    assert(chunks.length === docs.valuesIterator
      .map { case (_, n) => math.ceil(math.max(n, 1) / 384.0).toLong }.sum)
    chunks.foreach { r =>
      val (id, idx, start, chunk) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(start === 1 + 384 * idx, s"doc $id chunk $idx start $start")
      assert(chunk.length <= 512)
      val text = docs(id)._1
      val expected = text.substring((start - 1).toInt,
        math.min(start - 1 + 512, text.length).toInt)
      assert(chunk === expected, s"doc $id chunk $idx substring mismatch")
      assert(r.getLong(4) === chunk.length.toLong)
    }
  }

  test("chunking plan: per-row generate only — no exchange, no join") {
    val plan = Queries.chunkDocuments(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"no explode in plan:\n$plan")
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("json extraction: malformed or missing keys become null, not errors") {
    import spark.implicits._
    val df = Seq("""{"k": 7}""", """{"other": 1}""", "not json", null)
      .toDF("props")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k").as("k"))
    val out = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(7L), None, None, None))
  }

  test("json aggregate partial-aggs map-side") {
    val plan = Queries.jsonProps(spark, sf).queryExecution.executedPlan.toString
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"no partial aggregation in plan:\n$plan")
  }
}
