package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen polynomial string hash over a string-array column:
  * for each element, `h ← (h·131 + codepoint) mod 1e9+7` folded over
  * its characters (h₀ = 0) — the hash at the core of document
  * fingerprinting, shingle/MinHash dedup, and SimHash
  * ([[TextFunctions.tokenHash]]).
  *
  * The declarative formulation (`transform(arr, t → aggregate(
  * split(t, ""), …))`) is interpreted per character *and* allocates a
  * per-character string array; this expression is one fused loop per
  * token. On a 100 TB corpus the char loop is the dedup pipeline's
  * dominant cost.
  *
  * Bit/behavior contract vs the HOF path (spec-checked): identical for
  * all BMP text (`ascii` on single-char strings = the codepoint).
  * Non-BMP input: this loop folds true codepoints, while Java's
  * `split("")` splits surrogate *pairs* — the native result is the
  * correct one; the corpora and oracles here are BMP-only.
  * Null elements hash to null, like the HOF path.
  */
case class PolyHashArrayExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "poly_hash_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = PolyHashArrayExpr.hash(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    String $s = $a.getUTF8String($i).toString();
         |    long $h = 0L;
         |    int $j = 0;
         |    while ($j < $s.length()) {
         |      int $cp = $s.codePointAt($j);
         |      $h = ($h * 131L + $cp) % 1000000007L;
         |      $j += Character.charCount($cp);
         |    }
         |    $out[$i] = (Long) $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashArrayExpr {
  /** Shared scalar loop (interpreter path + tests). */
  def hash(s: String): Long = {
    var h = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h = (h * 131L + cp) % 1000000007L
      j += Character.charCount(cp)
    }
    h
  }

  /** `array<string> → array<long>` polynomial hash, fused codegen. */
  def apply(c: Column): Column = Bridge.column(PolyHashArrayExpr(Bridge.expression(c)))
}
