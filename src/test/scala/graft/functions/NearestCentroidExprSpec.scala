package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SemDedup

/** [[NearestCentroidExpr]] — the fused native argmin must be BIT-equal
  * to the declarative `array_min(array(struct(sqDistInt, cid), …))`
  * formulation it replaced ([[SemDedup.assignClusterMilliHof]]),
  * including the struct ordering's tie-break and the null/length
  * fallback (all-null distances → min centroid id), and its `d` field
  * must equal the assigned centroid's exact integer distance (the
  * PQ-encode reconstruction-error contract). */
class NearestCentroidExprSpec extends SparkSpec {
  import spark.implicits._

  // deliberately UNSORTED ids, a duplicate centroid (7 ≡ 2) so ties in
  // d are real, and one centroid at the origin
  private val cbs: Seq[(Long, Seq[Long])] = Seq(
    (3L, Seq(1000L, -2000L, 0L)),
    (0L, Seq(0L, 0L, 0L)),
    (7L, Seq(500L, 500L, -500L)),
    (2L, Seq(500L, 500L, -500L)))

  private val rows = Seq(
    Some(Seq(999L, -1999L, 1L)),       // nearest 3
    Some(Seq(0L, 0L, 0L)),             // exactly centroid 0
    Some(Seq(500L, 500L, -500L)),      // TIE between 7 and 2 → 2
    Some(Seq(250L, 250L, -250L)),      // between 0 and the 2/7 pair
    None,                              // null vector → (null, min id)
    Some(Seq(1L, 2L)),                 // wrong length → (null, min id)
    Some(Seq(-1000000L, 1000000L, 123456L)))
    .toDF("mv")

  test("native assignment bit-equal to the HOF argmin (ties, nulls, lengths)") {
    val out = rows.select(
      SemDedup.assignClusterMilli(col("mv"), cbs).as("native"),
      SemDedup.assignClusterMilliHof(col("mv"), cbs).as("hof")).collect()
    out.foreach { r => assert(r.getLong(0) == r.getLong(1), r.toString) }
  }

  test("null ELEMENT falls back like the HOF twin") {
    val withNullElem = Seq(Tuple1(Seq(Some(1L), None, Some(3L))))
      .toDF("raw")
      .select(col("raw").cast("array<long>").as("mv"))
    val out = withNullElem.select(
      SemDedup.assignClusterMilli(col("mv"), cbs).as("native"),
      SemDedup.assignClusterMilliHof(col("mv"), cbs).as("hof")).collect()
    out.foreach { r => assert(r.getLong(0) == r.getLong(1), r.toString) }
  }

  test("d field = exact integer distance of the assigned centroid") {
    val cbMap = typedLit(cbs.toMap)
    val nc = SemDedup.assignWithDistMilli(col("mv"), cbs)
    val out = rows.filter(col("mv").isNotNull && size(col("mv")) === 3)
      .select(nc.getField("d").as("d"),
        // the replaced map-lookup fold, against the native code
        aggregate(zip_with(col("mv"),
          element_at(cbMap, nc.getField("c")), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("expect"))
      .collect()
    out.foreach { r => assert(r.getLong(0) == r.getLong(1), r.toString) }
    // the fallback rows carry a null d (the HOF error sum is null too)
    val fb = rows.filter(col("mv").isNull || size(col("mv")) =!= 3)
      .select(nc.getField("d").as("d")).collect()
    fb.foreach { r => assert(r.isNullAt(0), r.toString) }
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import org.apache.spark.sql.graft.Bridge
    val inputs = Seq(Seq(999L, -1999L, 1L), Seq(500L, 500L, -500L), null)
    inputs.foreach { mv =>
      // literal child → Expression.eval walks the interpreted path
      val e = NearestCentroidExpr(
        Literal.create(mv, ArrayType(LongType)), cbs)
      val interp = e.eval(null).asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
      val viaDf = Seq(Tuple1(Option(mv).map(_.toSeq))).toDF("raw")
        .select(col("raw").cast("array<long>").as("mv"))
        .select(Bridge.column(NearestCentroidExpr(
          Bridge.expression(col("mv")), cbs)).as("nc"))
        .collect().head.getStruct(0)
      assert(interp.isNullAt(0) == viaDf.isNullAt(0))
      if (!interp.isNullAt(0)) assert(interp.getLong(0) == viaDf.getLong(0))
      assert(interp.getLong(1) == viaDf.getLong(1))
    }
  }
}
