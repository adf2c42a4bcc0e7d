package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("native array hash == HOF tokenHash per element on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextFunctions.tokenHashArray(TextFunctions.tokens($"text")).as("native"),
      transform(TextFunctions.tokens($"text"), t => TextFunctions.tokenHash(t)).as("hof"))
    val rows = both.as[(Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("null elements hash to null; scalar helper matches") {
    val df = Seq(Seq(Some("abc"), None, Some(""))).toDF("a")
    val r = df.select(TextFunctions.tokenHashArray($"a")).head().getSeq[Any](0)
    assert(r(0) === PolyHashArrayExpr.hash("abc"))
    assert(r(1) === null)
    assert(r(2) === 0L)
    // spot value: "a" -> 97
    assert(PolyHashArrayExpr.hash("a") === 97L)
    assert(PolyHashArrayExpr.hash("ab") === (97L * 131 + 98) % 1000000007L)
  }
}
