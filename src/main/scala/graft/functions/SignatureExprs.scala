package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen sketch signatures — MinHash, SimHash, and
  * random-hyperplane (SRP) — for the dedup/ANN hot paths.
  *
  * Each has a declarative higher-order-function twin (kept in
  * [[graft.operators.Dedup]] / [[graft.operators.SimilaritySearch]] for
  * bit-equality specs), but the HOF stack is CodegenFallback in Spark:
  * a MinHash-24 signature pays 24 interpreted `transform`+`array_min`
  * passes *per row*, SimHash-32 pays 32 interpreted `aggregate` folds,
  * and each hyperplane dot pays an interpreted `zip_with`+`aggregate`.
  * At sf0.1 those interpreted passes dominated the dedup bench (q18
  * 74 s, q19 46 s); on a 100 TB corpus they are the pipeline. These
  * expressions compute the whole signature in ONE fused primitive loop
  * per row — the same treatment [[VectorDistanceExpr]] and
  * [[PolyHashArrayExpr]] already give distances and string hashing.
  */
object SignatureExprs {

  /** MinHash signature: element i of the result is
    * `min over s of ((2i+1)·s + i·1000003) mod P` — one fused loop. */
  def minHashSignature(shingleHashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(shingleHashes), numHashes))

  /** SimHash: bit j is set iff more element hashes have bit j set than
    * clear — one fused loop. */
  def simHash(tokenHashes: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokenHashes), bits))

  /** Random-hyperplane signature: bit p set iff
    * `vec · plane_(planeOffset+p) ≥ 0` — one fused loop over the vector,
    * all planes accumulated per element. */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int, planeOffset: Int = 0): Column =
    Bridge.column(HyperplaneSignatureExpr(Bridge.expression(vec), planes, dim, planeOffset))

  /** Quantized-projection signature (the p-stable / E2LSH family, for
    * EUCLIDEAN neighborhoods): element p of the result is
    * `floor((vec · plane_(planeOffset+p)) / width)` — the cell index of
    * the vector along deterministic direction p at grid width `width`.
    * Same fused-loop shape and the same deterministic plane matrix as
    * [[hyperplaneSignature]]; hyperplane bits capture DIRECTION (cosine),
    * these cells capture POSITION, which is what a squared-Euclidean
    * search needs. */
  def quantizedProjection(
      vec: Column, planes: Int, dim: Int, planeOffset: Int, width: Long): Column =
    Bridge.column(QuantizedProjectionExpr(
      Bridge.expression(vec), planes, dim, planeOffset, width))
}

/** `array<long> → array<long>` of length `numHashes`: slot i holds
  * `min over non-null s of ((2i+1)·s + i·1000003) mod 1e9+7`; slots are
  * null when the input has no non-null element (matching
  * `array_min(transform(...))` on an empty/all-null array). A null
  * input array yields null.
  *
  * Inputs are shingle hashes in [0, P) ([[PolyHashArrayExpr]]), so the
  * products stay far below 2^63 for any practical `numHashes`.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 512, "numHashes must be in [1, 512]")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val s = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = (s * (2L * i + 1L) + i * 1000003L) % 1000000007L
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](numHashes)
    if (any) {
      var i = 0
      while (i < numHashes) { out(i) = mins(i); i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    $any = true;
         |    long $s = $a.getLong($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = ($s * (2L * $i + 1L) + $i * 1000003L) % 1000000007L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$numHashes];
         |if ($any) {
         |  for (int $i = 0; $i < $numHashes; $i++) $out[$i] = (Long) $mins[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> → bigint`: bit j of the result is set iff
  * `Σ over elements of (bit j of h set ? +1 : −1) > 0`. A null element
  * contributes −1 to every bit (matching the HOF fold's
  * `when(...).otherwise(-1)` on a null hash); a null input array yields
  * null. One fused loop — all `bits` counters updated per element.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var b = 0
        while (b < bits) { counts(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(j)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var res = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) res |= (1L << b); b += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val res = ctx.freshName("res")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) {
         |    for (int $b = 0; $b < $bits; $b++) $counts[$b] -= 1;
         |  } else {
         |    long $h = $a.getLong($j);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ((($h >> $b) & 1L) == 1L) $counts[$b] += 1; else $counts[$b] -= 1;
         |    }
         |  }
         |}
         |long $res = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] > 0) $res |= (1L << $b);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<float|double> → bigint`: bit p of the result is set iff the
  * dot product of the vector with deterministic pseudo-random hyperplane
  * `planeOffset + p` is ≥ 0. The plane matrix is derived from
  * [[HyperplaneSignatureExpr.planeComponent]] at construction and shipped
  * as a codegen reference object — no RNG state, any engine regenerates
  * identical planes (which is what lets the DuckDB oracle replicate the
  * LSH bucketing exactly).
  *
  * FP contract: each plane's dot accumulates in element-index order from
  * a 0.0 seed with float→double promotion — bit-identical to the HOF
  * `aggregate(zip_with(...))` twin, spec-enforced. Elements must be
  * non-null; vectors must have `dim` elements (extra elements are
  * ignored, shorter vectors use the available prefix).
  */
case class HyperplaneSignatureExpr(
    child: Expression,
    planes: Int,
    dim: Int,
    planeOffset: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")
  require(dim >= 1, "dim must be >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  /** Flat [planes × dim] matrix, row-major. */
  @transient private lazy val planeMatrix: Array[Double] = {
    val m = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dim) {
        m(p * dim + d) = HyperplaneSignatureExpr.planeComponent(planeOffset + p, d)
        d += 1
      }
      p += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val t = elemType
    val accs = new Array[Double](planes)
    var d = 0
    while (d < n) {
      val x = t match {
        case DoubleType => arr.getDouble(d)
        case _ => arr.getFloat(d).toDouble
      }
      var p = 0
      while (p < planes) { accs(p) += x * planeMatrix(p * dim + d); p += 1 }
      d += 1
    }
    var res = 0L
    var p = 0
    while (p < planes) { if (accs(p) >= 0.0) res |= (1L << p); p += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("planeMatrix", planeMatrix, "double[]")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val accs = ctx.freshName("accs")
      val res = ctx.freshName("res")
      val getX = elemType match {
        case DoubleType => s"$a.getDouble($d)"
        case _ => s"(double) $a.getFloat($d)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $accs = new double[$planes];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = $getX;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    $accs[$p] += $x * $mat[$p * $dim + $d];
         |  }
         |}
         |long $res = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  if ($accs[$p] >= 0.0) $res |= (1L << $p);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignatureExpr {
  /** Deterministic pseudo-random hyperplane component in [−0.5, 0.5),
    * derived from (plane, dim) by integer hashing. The multiplicative
    * mixing (large multiplier wrapping the modulus many times between
    * adjacent dims) is essential — an additive-only variant leaves all
    * planes nearly parallel to the all-ones direction (degenerate
    * buckets).
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = ((plane.toLong * 6700417L + dim.toLong + 1L) * 2654435761L) % 1000000007L
    (h.toDouble / 1000000007.0) - 0.5
  }
}

/** `array<bigint|float|double> → array<bigint>` of length `planes`:
  * element p is `floor((Σ_d vec[d] · plane_(planeOffset+p)[d]) / width)`
  * — the E2LSH-style grid cell of the vector's projection onto
  * deterministic direction `planeOffset+p` (cf. Datar et al., SoCG'04:
  * locality-sensitive hashing with p-stable projections). Two vectors at
  * Euclidean distance ≪ width land in the same cell on most directions;
  * a multi-probe reader additionally visits the ±1 cells to catch
  * boundary splits.
  *
  * Planes come from [[HyperplaneSignatureExpr.planeComponent]] — no RNG
  * state, so any engine (including the DuckDB oracle) regenerates
  * identical grids.
  *
  * FP contract: each projection accumulates in element-index order from
  * a 0.0 seed; the cell is `floor(acc / (double) width)` — bit-identical
  * to the HOF `aggregate(zip_with(...))` twin
  * ([[graft.operators.TimeSeries.quantizedProjectionHof]]),
  * spec-enforced. Elements must be non-null; vectors shorter than `dim`
  * use the available prefix, extra elements are ignored.
  */
case class QuantizedProjectionExpr(
    child: Expression,
    planes: Int,
    dim: Int,
    planeOffset: Int,
    width: Long) extends UnaryExpression {

  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")
  require(dim >= 1, "dim must be >= 1")
  require(width >= 1L, "width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantized_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|float|double>, got ${t.sql}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  /** Flat [planes × dim] matrix, row-major — same grid any engine can
    * regenerate from (planeOffset, dim). */
  @transient private lazy val planeMatrix: Array[Double] = {
    val m = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dim) {
        m(p * dim + d) = HyperplaneSignatureExpr.planeComponent(planeOffset + p, d)
        d += 1
      }
      p += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val t = elemType
    val accs = new Array[Double](planes)
    var d = 0
    while (d < n) {
      val x = t match {
        case DoubleType => arr.getDouble(d)
        case FloatType => arr.getFloat(d).toDouble
        case _ => arr.getLong(d).toDouble
      }
      var p = 0
      while (p < planes) { accs(p) += x * planeMatrix(p * dim + d); p += 1 }
      d += 1
    }
    val out = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      out(p) = math.floor(accs(p) / width.toDouble).toLong
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("planeMatrix", planeMatrix, "double[]")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val accs = ctx.freshName("accs")
      val out = ctx.freshName("out")
      val getX = elemType match {
        case DoubleType => s"$a.getDouble($d)"
        case FloatType => s"(double) $a.getFloat($d)"
        case _ => s"(double) $a.getLong($d)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $accs = new double[$planes];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = $getX;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    $accs[$p] += $x * $mat[$p * $dim + $d];
         |  }
         |}
         |long[] $out = new long[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  $out[$p] = (long) java.lang.Math.floor($accs[$p] / (double) ${width}L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
