package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native int8 symmetric quantization: `array<double|float> × double →
  * array<double>` of `round(xᵢ · 127 / maxAbs)` — one fused codegen
  * loop per row, replacing the interpreted `transform` lambda on the
  * corpus-scan hot path (higher-order functions evaluate per-element
  * through the interpreter; at 100 TB the quantization projection IS
  * a full-corpus scan).
  *
  * Bit-contract (spec-enforced against the HOF twin
  * [[graft.operators.SimilaritySearch.int8QuantizeHof]], and what the
  * q62/q63 oracle hashes assume): rounding is Spark `round()`'s
  * HALF_UP-on-decimal-string semantics — `BigDecimal.valueOf(x)
  * .setScale(0, HALF_UP)` — NOT `Math.rint` (half-even) and NOT
  * `Math.round` (half-up on the binary value; differs from the
  * decimal route on values whose shortest decimal representation
  * sits on .5). Null/zero scale yields all-zeros (a degenerate corpus
  * quantizes to zeros rather than NaN); null elements stay null.
  */
case class QuantizeExpr(vec: Expression, maxAbs: Expression)
    extends BinaryExpression {

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
      // zero scale zeros EVERY slot (nulls included — the HOF twin's
      // constant-lambda transform does the same); a real scale maps
      // null elements to null
      if (mx == 0.0) out(i) = 0.0
      else if (!arr.isNullAt(i)) {
        out(i) = QuantizeExpr.roundHalfUp(arr.getDouble(i) * 127.0 / mx)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val mxGen = maxAbs.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    val mx = ctx.freshName("mx")
    val cls = QuantizeExpr.getClass.getName.stripSuffix("$")
    val code =
      code"""
         |${vecGen.code}
         |boolean ${ev.isNull} = ${vecGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${mxGen.code}
         |  double $mx = ${mxGen.isNull} ? 0.0 : ${mxGen.value};
         |  int $n = ${vecGen.value}.numElements();
         |  Object[] $out = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($mx == 0.0) { $out[$i] = (Double) 0.0; }
         |    else if (!${vecGen.value}.isNullAt($i)) {
         |      $out[$i] = (Double) $cls.roundHalfUp(${vecGen.value}.getDouble($i) * 127.0 / $mx);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    ev.copy(code = code)
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
