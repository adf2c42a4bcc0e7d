package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Native Catalyst expression for the vector-distance hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * [[VectorFunctions]]) is CodegenFallback in Spark: every row pays
  * interpreted lambda dispatch plus an intermediate product array. This
  * expression generates a fused primitive loop (`doGenCode`) — no
  * allocation, no virtual calls — which is what a 100 TB KNN/dedup scan
  * needs (the reference's entire workload is this one inner loop,
  * `/root/reference/src/main/java/Hadoop.java:155-165`).
  *
  * Numeric contract: identical floating-point result, bit for bit, to
  * the HOF formulation — same left-to-right fold from a 0.0 seed, same
  * float→double element promotion — so results keep hash-matching the
  * DuckDB oracles (which fold in index order too). Verified by
  * `VectorDistanceExprSpec`.
  *
  * Semantics: by default (`strict = false`) both inputs must have the
  * same length (callers guarantee it — embeddings of one table share a
  * dimension) and elements must be non-null; a null ARRAY input yields
  * null. With `strict = true` the expression is total: a length
  * mismatch or any null element yields null — exactly the result of the
  * declarative `aggregate(zip_with(...))` fold, where `zip_with` pads
  * the shorter array with nulls and the `acc + t` merge then propagates
  * the null to the final value. [[graft.plans.NativeRewrite]] emits
  * strict instances because it rewrites user-written SQL with no
  * equal-length/no-null guarantee; the engine's own callers keep the
  * check-free loop.
  *
  * `cosine_raw` (strict-rewrite only, not SQL-registered) is
  * `dot/(√Σa²·√Σb²)` with NULL on a zero denominator — the exact
  * semantics of Spark's legacy-mode `Divide` over the three user
  * folds, which returns null (not IEEE NaN/Inf) on a zero divisor.
  */
case class VectorDistanceExpr(
    left: Expression,
    right: Expression,
    metric: String,
    strict: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_$metric"

  // strict can return null on non-null inputs (length mismatch / null
  // element), and cosine_raw on a zero denominator
  override def nullable: Boolean =
    strict || metric == "cosine_raw" || super.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    }
    if (!ok(left) || !ok(right))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double|tinyint> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!VectorDistanceExpr.Metrics.contains(metric))
      TypeCheckResult.TypeCheckFailure(s"unknown metric '$metric'")
    else TypeCheckResult.TypeCheckSuccess
  }

  @inline private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    // int8-quantized vectors (the exact_int8 search arm): byte values
    // promote exactly into double, so sums over dim*254^2 stay exact
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"bad element type $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (strict) {
      if (n != b.numElements()) return null
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    metric match {
      case "sqeuclidean" =>
        var acc = 0.0; var i = 0
        while (i < n) { val d = get(a, i, ta) - get(b, i, tb); acc += d * d; i += 1 }
        acc
      case "dot" =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += get(a, i, ta) * get(b, i, tb); i += 1 }
        acc
      case "cosine_distance" | "cosine_sim" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = get(a, i, ta); val y = get(b, i, tb)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        val sim = if (denom == 0.0) 0.0 else dot / denom
        if (metric == "cosine_sim") sim else 1.0 - sim
      case "cosine_raw" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = get(a, i, ta); val y = get(b, i, tb)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      def elem(arr: String, idx: String, t: DataType): String = t match {
        case DoubleType => s"$arr.getDouble($idx)"
        case FloatType => s"(double) $arr.getFloat($idx)"
        case ByteType => s"(double) $arr.getByte($idx)"
        case _ => throw new IllegalStateException(s"bad element type $t")
      }
      val ea = elem(a, i, elemType(left))
      val eb = elem(b, i, elemType(right))
      val core = metric match {
        case "sqeuclidean" =>
          val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
          s"""
             |int $n = $a.numElements();
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = $ea - $eb;
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case "dot" =>
          val acc = ctx.freshName("acc")
          s"""
             |int $n = $a.numElements();
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += $ea * $eb;
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case "cosine_distance" | "cosine_sim" | "cosine_raw" =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
          val x = ctx.freshName("x"); val y = ctx.freshName("y")
          val denom = ctx.freshName("denom")
          s"""
             |int $n = $a.numElements();
             |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $ea;
             |  double $y = $eb;
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |double $denom = Math.sqrt($na) * Math.sqrt($nb);
             |${
               metric match {
                 case "cosine_sim" =>
                   s"${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);"
                 case "cosine_distance" =>
                   s"${ev.value} = ($denom == 0.0) ? 1.0 : (1.0 - $dot / $denom);"
                 case _ => // cosine_raw: legacy-Divide null on zero denominator
                   s"""if ($denom == 0.0) { ${ev.isNull} = true; }
                      |else { ${ev.value} = $dot / $denom; }""".stripMargin
               }}
           """.stripMargin
      }
      if (!strict) core
      else {
        // strict: total function — length mismatch or any null element
        // yields null, matching the zip_with-padded declarative fold
        val j = ctx.freshName("j")
        val nn = ctx.freshName("nn")
        val hit = ctx.freshName("nullsHit")
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $hit = false;
           |  int $nn = $a.numElements();
           |  for (int $j = 0; $j < $nn && !$hit; $j++) {
           |    $hit = $a.isNullAt($j) || $b.isNullAt($j);
           |  }
           |  if ($hit) {
           |    ${ev.isNull} = true;
           |  } else {
           |    $core
           |  }
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDistanceExpr {
  val Metrics: Set[String] =
    Set("sqeuclidean", "dot", "cosine_distance", "cosine_sim", "cosine_raw")

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def toCol(e: Expression): Column = Bridge.column(e)

  /** Σ (aᵢ−bᵢ)² — fused codegen loop. */
  def squaredEuclidean(a: Column, b: Column): Column =
    toCol(VectorDistanceExpr(expr(a), expr(b), "sqeuclidean"))

  /** Σ aᵢ·bᵢ — fused codegen loop. */
  def dotProduct(a: Column, b: Column): Column =
    toCol(VectorDistanceExpr(expr(a), expr(b), "dot"))

  /** 1 − cos(a, b); zero vectors → 1. Fused codegen loop. */
  def cosineDistance(a: Column, b: Column): Column =
    toCol(VectorDistanceExpr(expr(a), expr(b), "cosine_distance"))

  /** cos(a, b); zero vectors → 0. Fused codegen loop. */
  def cosineSimilarity(a: Column, b: Column): Column =
    toCol(VectorDistanceExpr(expr(a), expr(b), "cosine_sim"))
}
