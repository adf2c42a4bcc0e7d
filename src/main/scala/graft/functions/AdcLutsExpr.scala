package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the ADC lookup-table build — the
  * per-query (or per-query-per-cell, under IVF) step of product
  * quantization: for every subspace `s` and every code `c`,
  *
  *   LUT[s·k + c] = Σ_j ((qmv[s·sub+j] − cellCv[s·sub+j]) − cv_c[j])²
  *
  * over the milli-quantized query vector `qmv`, the coarse-cell
  * centroid `cellCv` (all-zeros for raw, non-residual ADC — the
  * subtraction is then the identity), and the per-subspace PQ
  * codebook centroids `cv` (inlined at plan time, referenced as one
  * flat `long[][]` from generated code). Dead codes (per-subspace
  * cluster death in the deterministic Lloyd) leave a 0 slot no live
  * code ever indexes.
  *
  * Why native: the declarative formulation is m·k independent
  * `aggregate(zip_with(...))` folds per row — 512 expressions at the
  * shipped m=8/k=64 — and higher-order functions are CodegenFallback
  * in Spark (interpreted lambda dispatch plus an intermediate array
  * PER FOLD). The probe side of the IVF-PQ search builds
  * |Q|·probes LUT rows per batch, and the HOF formulation measured
  * ~25 s at sf1 where this fused loop is sub-second — the same
  * HOF-vs-native gap [[VectorDistanceExpr]] closes for the distance
  * scan. Integer arithmetic end to end, so the result is bit-equal to
  * the HOF twin by construction ([[AdcLutsExprSpec]] pins it) and the
  * DuckDB oracles are untouched.
  */
case class AdcLutsExpr(
    left: Expression,
    right: Expression,
    codebooks: Seq[Seq[(Long, Seq[Long])]],
    k: Int) extends BinaryExpression {

  private val m = codebooks.size
  private val sub = codebooks.head.head._2.size

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "adc_luts"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!ok(left) || !ok(right))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (codebooks.exists(_.exists(_._2.size != sub)))
      TypeCheckResult.TypeCheckFailure("ragged codebook subspace widths")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** m·k rows of sub-centroid values; null row = dead code (slot 0). */
  @transient private lazy val table: Array[Array[Long]] = {
    val t = Array.ofDim[Array[Long]](m * k)
    codebooks.zipWithIndex.foreach { case (cb, s) =>
      cb.foreach { case (code, cv) =>
        require(code >= 0 && code < k, s"code $code out of [0,$k)")
        t(s * k + code.toInt) = cv.toArray
      }
    }
    t
  }

  /** Input arrays shorter than m·sub would hit UnsafeArrayData's
    * UNCHECKED accessor and fold garbage into every LUT entry (wrong
    * dim, mis-sliced caller) — fail loudly instead; the check is one
    * compare per ROW next to an m·k·sub loop (round-12 advice). */
  private def checkLen(n: Int, side: String): Unit =
    if (n < m * sub)
      throw new IllegalArgumentException(
        s"adc_luts: $side array has $n elements, need >= ${m * sub} (m=$m x sub=$sub)")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    checkLen(a.numElements(), "query")
    checkLen(c.numElements(), "cell-centroid")
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val base = s * sub
      var code = 0
      while (code < k) {
        val cv = table(s * k + code)
        if (cv != null) {
          var acc = 0L
          var j = 0
          while (j < sub) {
            val d = a.getLong(base + j) - c.getLong(base + j) - cv(j)
            acc += d * d
            j += 1
          }
          out(s * k + code) = acc
        }
        code += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val tbl = ctx.addReferenceObj("adcTable", table, "long[][]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val gad = classOf[GenericArrayData].getName
      s"""
         |if ($a.numElements() < ${m * sub} || $c.numElements() < ${m * sub}) {
         |  throw new IllegalArgumentException(
         |    "adc_luts: input arrays have " + $a.numElements() + "/" +
         |    $c.numElements() + " elements, need >= ${m * sub} (m=$m x sub=$sub)");
         |}
         |long[] $out = new long[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $sub;
         |  for (int $code = 0; $code < $k; $code++) {
         |    long[] $cv = $tbl[$s * $k + $code];
         |    if ($cv != null) {
         |      long $acc = 0L;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        long $d = $a.getLong($base + $j) - $c.getLong($base + $j) - $cv[$j];
         |        $acc += $d * $d;
         |      }
         |      $out[$s * $k + $code] = $acc;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcLutsExpr {
  /** All m LUTs, flat (`lut[s·k + code]`; `element_at` index =
    * s·k + code + 1). `cellCv` = the coarse centroid for residual
    * ADC, or an all-zeros literal for raw ADC. */
  def apply(qmv: Column, cellCv: Column,
      codebooks: Seq[Seq[(Long, Seq[Long])]], k: Int): Column =
    Bridge.column(AdcLutsExpr(
      Bridge.expression(qmv), Bridge.expression(cellCv), codebooks, k))
}
