package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused word-n-gram shingle hashing over a token-array column:
  * `array<string> → array<long>` where element w is the polynomial
  * hash ([[PolyHashArrayExpr.hash]]) of `tokens[w..w+n-1]` joined by
  * single spaces — BIT-EQUAL to
  * `poly_hash_array(transform(sequence, slice+array_join))`
  * (the declarative twin kept as
  * [[TextFunctions.shingleHashesHof]], equality spec-enforced), with
  * the whole-sequence single shingle for documents of ≤ n tokens and
  * array_join's skip-null semantics.
  *
  * Why it exists: the declarative path MATERIALIZES every shingle
  * string (slice array + join buffer + UTF8String per window) before
  * hashing — measured as the single dominant cost of the Jaccard
  * dedup family (~3 s of q17's 5.9 s at sf0.1; every token's chars
  * are copied n times). This expression never builds a string.
  * Instead it uses rolling polynomial composition: one pass
  * precomputes each token's hash `ph(t)` and length power
  * `pw(t) = 131^len(t) mod P`, then every window combines in O(n)
  * long multiplications —
  * `h ← ((h·131 + ' ') · pw(t) + ph(t)) mod P` per appended token —
  * exact because `hash(a ++ b) = hash(a)·131^len(b) + hash(b) (mod P)`
  * and every factor stays below 2⁶³/P. Total work drops from
  * O(chars · n) copies + O(chars · n) hash steps to O(chars) hash
  * steps + O(tokens · n) multiplies.
  */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val ph = new Array[Long](m)
    val pw = new Array[Long](m)
    val nul = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) { nul(i) = true; pw(i) = 1L }
      else {
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var p = 1L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 131L + cp) % ShingleHashExpr.P
          p = (p * 131L) % ShingleHashExpr.P
          j += Character.charCount(cp)
        }
        ph(i) = h; pw(i) = p
      }
      i += 1
    }
    val nOut = if (m <= n) 1 else m - n + 1
    val width = if (m <= n) m else n
    val out = new Array[Any](nOut)
    var w = 0
    while (w < nOut) {
      var h = 0L
      var first = true
      var t = w
      while (t < w + width) {
        if (!nul(t)) {
          if (!first) h = (h * 131L + 32L) % ShingleHashExpr.P
          h = (h * pw(t) + ph(t)) % ShingleHashExpr.P
          first = false
        }
        t += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val ph = ctx.freshName("ph")
      val pw = ctx.freshName("pw")
      val nul = ctx.freshName("nul")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val nOut = ctx.freshName("nOut")
      val width = ctx.freshName("width")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val t = ctx.freshName("t")
      val first = ctx.freshName("first")
      s"""
         |int $m = $a.numElements();
         |long[] $ph = new long[$m];
         |long[] $pw = new long[$m];
         |boolean[] $nul = new boolean[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($a.isNullAt($i)) { $nul[$i] = true; $pw[$i] = 1L; }
         |  else {
         |    String $s = $a.getUTF8String($i).toString();
         |    long $h = 0L;
         |    long $p = 1L;
         |    int $j = 0;
         |    while ($j < $s.length()) {
         |      int $cp = $s.codePointAt($j);
         |      $h = ($h * 131L + $cp) % 1000000007L;
         |      $p = ($p * 131L) % 1000000007L;
         |      $j += Character.charCount($cp);
         |    }
         |    $ph[$i] = $h; $pw[$i] = $p;
         |  }
         |}
         |int $nOut = ($m <= $n) ? 1 : ($m - $n + 1);
         |int $width = ($m <= $n) ? $m : $n;
         |Object[] $out = new Object[$nOut];
         |for (int $w = 0; $w < $nOut; $w++) {
         |  long $h = 0L;
         |  boolean $first = true;
         |  for (int $t = $w; $t < $w + $width; $t++) {
         |    if (!$nul[$t]) {
         |      if (!$first) $h = ($h * 131L + 32L) % 1000000007L;
         |      $h = ($h * $pw[$t] + $ph[$t]) % 1000000007L;
         |      $first = false;
         |    }
         |  }
         |  $out[$w] = (Long) $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashExpr {
  val P = 1000000007L

  /** `array<string> tokens → array<long>` hashed word-n-gram shingles,
    * fused codegen. */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashExpr(Bridge.expression(tokens), n))
}
