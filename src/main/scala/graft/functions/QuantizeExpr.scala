package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native int8 symmetric quantization: `array<double|float> × double →
  * array<double>` of `round(xᵢ · 127 / maxAbs)` in one fused
  * per-row loop — replacing the per-element interpreted lambda of the
  * higher-order `transform` formulation (kept as
  * [[graft.operators.SimilaritySearch.int8QuantizeHof]], the
  * executable spec; bit-equality test-enforced).
  *
  * DELIBERATELY `CodegenFallback`, and that choice is load-bearing —
  * a measured 6×, not a shortcut: the quantized column feeds
  * broadcast-nested-loop KNN sweeps, and whole-stage codegen DEFERS a
  * stream-side expression no join condition references into the
  * per-pair inner loop — a fully-codegen'd quantize re-runs per PAIR
  * (measured: q62 1.2 s → 7 s at sf0.1). The fallback boundary forces
  * the projection to materialize once per row, and the materialized
  * UnsafeRow stores the codes as a primitive double array — which the
  * distance kernel then reads without boxing. The interpreted loop
  * itself costs ~0.3 s per 225k×64 floats (measured), noise next to
  * the sweep it feeds.
  *
  * Bit-contract: rounding is Spark `round()`'s
  * decimal-string-HALF_UP — `BigDecimal.valueOf(x).setScale(0,
  * HALF_UP)` — NOT `Math.rint` (half-even) and NOT `Math.round`
  * (half-up on the binary value), so the q62/q63 oracle hashes are
  * unchanged. Null/zero scale yields all-zeros (a degenerate corpus
  * quantizes to zeros rather than NaN — zero-scale zeros EVERY slot,
  * nulls included, matching the HOF twin's constant-lambda branch);
  * with a real scale, null elements stay null.
  */
case class QuantizeExpr(vec: Expression, maxAbs: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = maxAbs
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "int8_quantize"

  // mx null → zeros, so null-intolerance only applies to the array side
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, maxAbs.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (v, m) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, double), got (${v.sql}, ${m.sql})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val m = maxAbs.eval(input)
    val n = arr.numElements()
    val out = new Array[Any](n)
    val mx = if (m == null) 0.0 else m.asInstanceOf[Double]
    var i = 0
    while (i < n) {
      if (mx == 0.0) out(i) = 0.0
      else if (!arr.isNullAt(i)) {
        out(i) = QuantizeExpr.roundHalfUp(arr.getDouble(i) * 127.0 / mx)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, maxAbs = newRight)
}

object QuantizeExpr {
  /** Spark round() semantics for doubles: decimal-string HALF_UP. */
  def roundHalfUp(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def apply(vec: Column, maxAbs: Column): Column =
    Bridge.column(QuantizeExpr(
      Bridge.expression(vec.cast("array<double>")),
      Bridge.expression(maxAbs.cast("double"))))
}
