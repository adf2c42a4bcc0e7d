package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

object CdcChunksExpr {
  /** `array<long>` of token hashes → `array<long>` of packed chunks
    * `(fp << 32) | len` ([[graft.operators.Cdc]] boundary semantics).
    * One fused loop; the HOF twin ([[graft.operators.Cdc.chunksHof]])
    * pays an interpreted zip_with stack plus a per-chunk interpreted
    * fold. fp < 2³⁰ (mod 1e9+7) and len < 2³¹ (array-index bound), so
    * the pack is exact and non-negative. */
  def apply(tokenHashes: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcChunksExpr(
      Bridge.expression(tokenHashes), window, divisor))
}

/** Content-defined chunking in one pass: maintains the running chunk
  * fingerprint `f ← (f·31 + h) mod P` while testing, at every position
  * with a full `window` of history and at least one token remaining,
  * the boundary predicate `poly(last window hashes) % divisor == 0`;
  * a hit closes the chunk. Null elements hash as 0 (the inputs —
  * [[PolyHashArrayExpr]] over tokens — never produce them; the clamp
  * just keeps the expression total). Empty array → empty array; null
  * array → null.
  */
case class CdcChunksExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2 && window <= 64, "window must be in [2, 64]")
  require(divisor >= 2, "divisor must be >= 2")

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var fp = 0L
    var len = 0L
    var idx = 0
    while (idx < n) {
      val h = if (arr.isNullAt(idx)) 0L else arr.getLong(idx)
      fp = (fp * 31L + h) % P
      len += 1L
      if (idx >= window - 1 && idx < n - 1) {
        var g = 0L
        var k = idx - window + 1
        while (k <= idx) {
          g = (g * 131L + (if (arr.isNullAt(k)) 0L else arr.getLong(k))) % P
          k += 1
        }
        if (g % divisor == 0) {
          out += ((fp << 32) | len)
          fp = 0L
          len = 0L
        }
      }
      idx += 1
    }
    out += ((fp << 32) | len)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val g = ctx.freshName("g")
      val fp = ctx.freshName("fp")
      val len = ctx.freshName("len")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |long[] $buf = new long[$n == 0 ? 0 : $n + 1];
         |int $cnt = 0;
         |long $fp = 0L; long $len = 0L;
         |for (int $idx = 0; $idx < $n; $idx++) {
         |  long $h = $a.isNullAt($idx) ? 0L : $a.getLong($idx);
         |  $fp = ($fp * 31L + $h) % ${P}L;
         |  $len += 1L;
         |  if ($idx >= ${window - 1} && $idx < $n - 1) {
         |    long $g = 0L;
         |    for (int $k = $idx - ${window - 1}; $k <= $idx; $k++) {
         |      $g = ($g * 131L + ($a.isNullAt($k) ? 0L : $a.getLong($k))) % ${P}L;
         |    }
         |    if ($g % ${divisor}L == 0L) {
         |      $buf[$cnt++] = ($fp << 32) | $len;
         |      $fp = 0L; $len = 0L;
         |    }
         |  }
         |}
         |if ($n > 0) $buf[$cnt++] = ($fp << 32) | $len;
         |Object[] $out = new Object[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) $out[$i] = (Long) $buf[$i];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
