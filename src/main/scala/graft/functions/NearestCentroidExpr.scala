package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native Catalyst expression for the nearest-centroid assignment — the
  * per-row argmin every Lloyd iteration, PQ encode, IVF coarse
  * assignment and semantic-dedup cluster projection runs against
  * codebook literals:
  *
  *   out = struct(d, c) where (d, c) = lexicographic min over the
  *         codebook of (Σ_j (mv_j − cv_j)², centroid id)
  *
  * Why native: the declarative formulation
  * (`array_min(array(struct(sqDistInt(mv, cv₀), c₀), …)).getField`)
  * builds k struct branches of `aggregate(zip_with(...))` folds — ~4k
  * expression nodes at the shipped k=64 — and higher-order functions
  * are CodegenFallback in Spark (interpreted lambda dispatch plus an
  * intermediate array per fold, per centroid, per row). Measured on
  * q162/q163 (the 8-subspace trainer, sf0.1): each Lloyd-iteration job
  * carried a 2.4 MiB task binary and ~1.7 s of interpreted assignment,
  * plus ~3 s/query of driver planning over the giant trees; this fused
  * loop is one plan node referencing one `long[][]`. Integer
  * arithmetic end to end, so the result is bit-equal to the HOF twin
  * ([[graft.operators.SemDedup.assignClusterMilliHof]], pinned by
  * NearestCentroidExprSpec) and every oracle hash is untouched.
  *
  * Bit-contract beyond the happy path (the HOF formulation's exact
  * semantics, reproduced):
  *  - ties in `d` break toward the smaller centroid id (struct
  *    ordering — the shop-wide lexicographic `(dist, id)` total
  *    order);
  *  - a null input array, a null element, or a length ≠ the codebook's
  *    width makes EVERY per-centroid distance null (zip_with pads with
  *    null, the fold propagates it), and `array_min`'s struct ordering
  *    then falls through to the id field: the result is
  *    `struct(null, min centroid id)` — NOT a null struct. The fused
  *    loop returns exactly that.
  */
case class NearestCentroidExpr(child: Expression,
    centroids: Seq[(Long, Seq[Long])]) extends UnaryExpression {

  private val sub = centroids.head._2.size

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = true),
    StructField("c", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (centroids.isEmpty)
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-empty codebook")
      else if (centroids.exists(_._2.size != sub))
        TypeCheckResult.TypeCheckFailure("ragged codebook centroid widths")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  @transient private lazy val ids: Array[Long] = centroids.map(_._1).toArray
  @transient private lazy val cvs: Array[Array[Long]] =
    centroids.map(_._2.toArray).toArray
  @transient private lazy val minId: Long = ids.min

  /** The whole per-row computation, shared verbatim by interpreted
    * eval and generated code (one static-shaped call per row — the
    * loop body is where the time goes, not the dispatch). */
  def assign(v: Any): InternalRow = {
    var fallback = v == null
    var arr: ArrayData = null
    if (!fallback) {
      arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != sub) fallback = true
      else {
        var j = 0
        while (j < sub && !fallback) {
          if (arr.isNullAt(j)) fallback = true
          j += 1
        }
      }
    }
    if (fallback)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, minId))
    else {
      var bestD = Long.MaxValue
      var bestC = 0L
      var first = true
      var i = 0
      val n = ids.length
      while (i < n) {
        val cv = cvs(i)
        var acc = 0L
        var j = 0
        while (j < sub) {
          val d = arr.getLong(j) - cv(j)
          acc += d * d
          j += 1
        }
        if (first || acc < bestD || (acc == bestD && ids(i) < bestC)) {
          bestD = acc; bestC = ids(i); first = false
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestD, bestC))
    }
  }

  override def eval(input: InternalRow): Any = assign(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("nce", this, classOf[NearestCentroidExpr].getName)
    val code =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = $self.assign(
          ${childGen.isNull} ? null : (Object) ${childGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidExpr {
  /** struct(d, c) of the nearest centroid — see class doc. */
  def apply(mv: Column, centroids: Seq[(Long, Seq[Long])]): Column =
    Bridge.column(NearestCentroidExpr(Bridge.expression(mv), centroids))
}
