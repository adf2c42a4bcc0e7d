package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VectorDistanceExpr

/** Optimizer rule: rewrite the declarative vector-distance fold
  *
  *   `aggregate(zip_with(a, b, (x, y) => f(x, y)), 0.0, (acc, t) => acc + t)`
  *
  * — with `f` = `(x−y)·(x−y)` (squared Euclidean) or `x·y` (dot) —
  * into the fused-codegen [[VectorDistanceExpr]], and the full cosine
  * formulation
  *
  *   `dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))`
  *
  * into ONE fused three-accumulator loop (`cosine_raw`).
  *
  * Why this is sound: higher-order functions are CodegenFallback in
  * Spark (interpreted lambda dispatch per element, ~10–30× slower in
  * hot loops), and the STRICT `VectorDistanceExpr` is observationally
  * equivalent to the fold for ALL inputs, not just the engine's
  * guaranteed equal-length/no-null vectors:
  *
  *  - equal-length, null-free arrays: bit-identical result — same
  *    left-to-right accumulation from a 0.0 seed, same float→double
  *    element promotion (spec-enforced in `VectorDistanceExprSpec`);
  *  - length mismatch: `zip_with` pads the shorter array with nulls and
  *    the `acc + t` merge propagates the null ⇒ fold yields NULL; the
  *    strict expression checks lengths and yields NULL;
  *  - a null element (parquet arrays are `containsNull = true`):
  *    fold yields NULL ⇒ strict expression scans for nulls and yields
  *    NULL;
  *  - null array input: both yield NULL.
  *
  * The cosine divide is fused only when the `Divide` is LEGACY-mode:
  * legacy double division returns NULL on a zero divisor (a zero
  * vector), which `cosine_raw` reproduces exactly. An ANSI-mode
  * `Divide` must THROW on a zero denominator, so it is left in place —
  * its three inner folds still each get the fused loop, so ANSI
  * sessions keep native per-element code and exact ANSI error
  * semantics.
  *
  * Matching is deliberately strict (literal 0.0 seed, pure `acc + t`
  * merge, identity finish, each lambda variable used exactly as the
  * pattern demands, semantically-equal self-dot arguments for cosine);
  * anything else is left untouched.
  */
object NativeRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  /** merge lambda must be exactly (acc, t) => acc + t over its own vars */
  private def isPlusFold(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, t: NamedLambdaVariable), _) =>
      l.exprId == a.exprId && r.exprId == t.exprId
    case _ => false
  }

  /** finish lambda must be the identity (acc) => acc */
  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** zip lambda → metric name, when it is one of the two recognized
    * element combiners over exactly its own (x, y) variables. */
  private def metricOf(zipF: Expression): Option[String] = zipF match {
    case LambdaFunction(
        Multiply(Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                 Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if x1.exprId == x.exprId && x2.exprId == x.exprId &&
           y1.exprId == y.exprId && y2.exprId == y.exprId =>
      Some("sqeuclidean")
    case LambdaFunction(
        Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if x1.exprId == x.exprId && y1.exprId == y.exprId =>
      Some("dot")
    case _ => None
  }

  /** The recognized distance fold: (left array, right array, metric). */
  private object DistFold {
    def unapply(e: Expression): Option[(Expression, Expression, String)] = e match {
      case ArrayAggregate(
          ZipWith(left, right, zipF),
          Literal(0.0, DoubleType),
          merge, finish)
          if isDoubleArray(left) && isDoubleArray(right) &&
             isPlusFold(merge) && isIdentity(finish) =>
        metricOf(zipF).map((left, right, _))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // full cosine similarity: dot(a,b) / (√dot(a,a) · √dot(b,b)) →
      // one fused loop. LEGACY divide only (see scaladoc); if the guard
      // fails, the inner folds are still rewritten individually below.
      case d @ Divide(DistFold(a, b, "dot"),
          Multiply(Sqrt(DistFold(a1, a2, "dot")), Sqrt(DistFold(b1, b2, "dot")), _), _)
          if d.evalMode == EvalMode.LEGACY &&
             a1.semanticEquals(a) && a2.semanticEquals(a) &&
             b1.semanticEquals(b) && b2.semanticEquals(b) =>
        VectorDistanceExpr(a, b, "cosine_raw", strict = true)
      case DistFold(left, right, m) =>
        VectorDistanceExpr(left, right, m, strict = true)
    }

  /** Install on an existing session (the extensions path,
    * `spark.sql.extensions=graft.GraftExtensions`, covers sessions
    * built with the extension; this covers everything else). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(NativeRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ NativeRewrite
  }

  /** Remove from a session — the HOF-twin bit-equality specs need the
    * declarative formulation to actually EXECUTE as written (with the
    * rule active they would compare the native expression to itself). */
  def uninstall(spark: SparkSession): Unit = {
    val exp = spark.experimental
    exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == NativeRewrite)
  }
}
