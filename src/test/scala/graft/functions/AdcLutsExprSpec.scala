package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AdcLutsExpr]] — the fused native ADC lookup-table build must be
  * BIT-equal to the declarative m·k HOF-fold formulation it replaced
  * (integer arithmetic, so equality is exact, including dead-code 0
  * slots and the residual subtraction). */
class AdcLutsExprSpec extends SparkSpec {
  import spark.implicits._

  // m=2 subspaces of sub=3 dims, k=3 with a DEAD code (1) in subspace 1
  private val cbs: Seq[Seq[(Long, Seq[Long])]] = Seq(
    Seq((0L, Seq(1L, 2L, 3L)), (1L, Seq(-5L, 0L, 9L)), (2L, Seq(0L, 0L, 0L))),
    Seq((0L, Seq(7L, -1L, 4L)), (2L, Seq(100L, 50L, -2L))))
  private val k = 3

  /** the replaced formulation: one aggregate(zip_with) fold per
    * (subspace, code), dead codes → 0, flattened in s·k+code order */
  private def hofLuts(qmv: Column, cellCv: Column): Column = {
    def sqDistInt(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val sub = 3
    array((0 until cbs.size).flatMap { s =>
      val live = cbs(s).toMap
      val qr = zip_with(slice(qmv, s * sub + 1, sub),
        slice(cellCv, s * sub + 1, sub), (x, c) => x - c)
      (0 until k).map { code =>
        live.get(code.toLong)
          .map(cv => sqDistInt(qr, typedLit(cv)))
          .getOrElse(lit(0L))
      }
    }: _*)
  }

  private val rows = Seq(
    (Seq(10L, -3L, 0L, 7L, 7L, 7L), Seq(1L, 1L, 1L, 0L, -2L, 3L)),
    (Seq(0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L)),
    (Seq(-1000L, 2000L, -1500L, 999L, -999L, 1L), Seq(500L, -500L, 250L, -250L, 125L, -125L)))
    .toDF("qmv", "cell")

  test("native LUTs bit-equal the HOF formulation (residual cell)") {
    val out = rows.select(
      AdcLutsExpr(col("qmv"), col("cell"), cbs, k).as("native"),
      hofLuts(col("qmv"), col("cell")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("zero cell centroid = raw ADC; dead code slots are 0") {
    val zeros = typedLit(Seq.fill(6)(0L))
    val out = rows.select(
      AdcLutsExpr(col("qmv"), zeros, cbs, k).as("native"),
      hofLuts(col("qmv"), zeros).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
      assert(r.getSeq[Long](0)(k + 1) == 0L, "dead code (s=1,c=1) must be 0")
    }
  }

  test("interpreted eval (nullSafeEval) matches the codegen/HOF result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val inputs = Seq(
      (Seq(10L, -3L, 0L, 7L, 7L, 7L), Seq(1L, 1L, 1L, 0L, -2L, 3L)),
      (Seq(0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L)),
      (Seq(-1000L, 2000L, -1500L, 999L, -999L, 1L),
        Seq(500L, -500L, 250L, -250L, 125L, -125L)))
    val hof = rows.select(hofLuts(col("qmv"), col("cell")).as("h"))
      .collect().map(_.getSeq[Long](0))
    inputs.zip(hof).foreach { case ((qmv, cell), expect) =>
      // literal children → Expression.eval walks nullSafeEval, never codegen
      val e = AdcLutsExpr(
        Literal.create(qmv, ArrayType(LongType)),
        Literal.create(cell, ArrayType(LongType)), cbs, k)
      val got = e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      assert(got == expect, s"$got vs $expect")
    }
  }
}
