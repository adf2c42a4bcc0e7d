package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

object WinnowFingerprintsExpr {
  /** `array<long>` of token hashes → `array<long>` of DISTINCT
    * winnowing fingerprints (window-minimum k-gram hashes,
    * [[graft.operators.Winnow]] semantics incl. the short-input
    * fallbacks), in first-occurrence order. One fused loop per row —
    * the HOF twin pays a zip_with stack plus an interpreted
    * slice+array_min per window. */
  def apply(tokenHashes: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprintsExpr(
      Bridge.expression(tokenHashes), k, w))
}

/** Winnowing fingerprints in one pass: k-gram rolling hashes
  * `g(j) = fold h[j..j+k-1] of (acc·131 + h) mod P`, window minima over
  * every `w` consecutive g values, distinct-ed in first-occurrence
  * order. Fallbacks (the [[graft.operators.Winnow]] contract): fewer
  * than `w` k-grams → the single global k-gram minimum; fewer than `k`
  * tokens → the whole-document fold `(acc·31 + h) mod P`. Null
  * elements hash as 0 (inputs never produce them; the clamp keeps the
  * expression total); null array → null; empty array → empty array.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 64, "k must be in [2, 64]")
  require(w >= 1 && w <= 1024, "w must be in [1, 1024]")

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    def h(i: Int): Long = if (arr.isNullAt(i)) 0L else arr.getLong(i)
    if (n < k) {
      var f = 0L
      var i = 0
      while (i < n) { f = (f * 31L + h(i)) % P; i += 1 }
      return new GenericArrayData(Array[Any](f))
    }
    val m = n - k + 1
    val g = new Array[Long](m)
    var j = 0
    while (j < m) {
      var acc = 0L
      var i = j
      while (i < j + k) { acc = (acc * 131L + h(i)) % P; i += 1 }
      g(j) = acc
      j += 1
    }
    if (m < w) {
      var mn = g(0)
      var i = 1
      while (i < m) { if (g(i) < mn) mn = g(i); i += 1 }
      return new GenericArrayData(Array[Any](mn))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s <= m - w) {
      var mn = g(s)
      var i = s + 1
      while (i < s + w) { if (g(i) < mn) mn = g(i); i += 1 }
      seen.add(mn)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val f = ctx.freshName("f")
      val acc = ctx.freshName("acc")
      val g = ctx.freshName("g")
      val m = ctx.freshName("m")
      val mn = ctx.freshName("mn")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val it = ctx.freshName("it")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else if ($n < $k) {
         |  long $f = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $f = ($f * 31L + ($a.isNullAt($i) ? 0L : $a.getLong($i))) % ${P}L;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[]{ (Long) $f });
         |} else {
         |  int $m = $n - ${k - 1};
         |  long[] $g = new long[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $acc = 0L;
         |    for (int $i = $j; $i < $j + $k; $i++) {
         |      $acc = ($acc * 131L + ($a.isNullAt($i) ? 0L : $a.getLong($i))) % ${P}L;
         |    }
         |    $g[$j] = $acc;
         |  }
         |  if ($m < $w) {
         |    long $mn = $g[0];
         |    for (int $i = 1; $i < $m; $i++) if ($g[$i] < $mn) $mn = $g[$i];
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[]{ (Long) $mn });
         |  } else {
         |    java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>();
         |    for (int $s = 0; $s <= $m - $w; $s++) {
         |      long $mn = $g[$s];
         |      for (int $i = $s + 1; $i < $s + $w; $i++) if ($g[$i] < $mn) $mn = $g[$i];
         |      $seen.add((Long) $mn);
         |    }
         |    Object[] $out = new Object[$seen.size()];
         |    int $o = 0;
         |    java.util.Iterator<Long> $it = $seen.iterator();
         |    while ($it.hasNext()) { $out[$o++] = $it.next(); }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
