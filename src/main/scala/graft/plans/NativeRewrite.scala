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
  * into the fused-codegen [[VectorDistanceExpr]].
  *
  * Why this is sound: higher-order functions are CodegenFallback in
  * Spark (interpreted lambda dispatch per element, ~10–30× slower in
  * hot loops), and `VectorDistanceExpr` is bit-identical to this exact
  * fold — same left-to-right accumulation from a 0.0 seed, same
  * float→double element promotion (spec-enforced in
  * `VectorDistanceExprSpec`). So a user who writes the natural
  * declarative formulation gets the native loop automatically —
  * including SQL text using `aggregate(zip_with(...))` directly.
  *
  * Matching is deliberately strict (literal 0.0 seed, pure `acc + t`
  * merge, identity finish, each lambda variable used exactly as the
  * pattern demands); anything else is left untouched.
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(left, right, zipF),
          Literal(0.0, DoubleType),
          merge, finish)
          if isDoubleArray(left) && isDoubleArray(right) &&
             isPlusFold(merge) && isIdentity(finish) &&
             metricOf(zipF).isDefined =>
        VectorDistanceExpr(left, right, metricOf(zipF).get)
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
