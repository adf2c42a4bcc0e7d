package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{HyperplaneSignatureExpr, MinHashSignatureExpr, PolyHashArrayExpr, SimHashExpr, VectorDistanceExpr}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT vector_sqeuclidean(a, b) …")` works like any
  * built-in:
  *
  *  - as a session extension:
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - or at runtime on an existing session:
  *    `GraftExtensions.register(spark)`.
  *
  * Functions: `vector_sqeuclidean`, `vector_dot`,
  * `vector_cosine_distance`, `vector_cosine_sim` (array<float|double> ×2
  * → double, fused codegen — see [[graft.functions.VectorDistanceExpr]])
  * and `poly_hash_array` (array<string> → array<long> —
  * [[graft.functions.PolyHashArrayExpr]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // declarative HOF distance folds -> fused codegen VectorDistanceExpr
    ext.injectOptimizerRule(_ => graft.plans.NativeRewrite)
  }
}

object GraftExtensions {

  private def vec(metric: String)(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"vector_$metric expects 2 arguments")
    VectorDistanceExpr(args(0), args(1), metric)
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorDistanceExpr].getName, null, name, usage, "")

  /** (name, info, builder) triples for every SQL-exposed function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_sqeuclidean",
      info("vector_sqeuclidean", "vector_sqeuclidean(a, b) - sum of squared element differences"),
      vec("sqeuclidean") _),
    ("vector_dot",
      info("vector_dot", "vector_dot(a, b) - dot product"),
      vec("dot") _),
    ("vector_cosine_distance",
      info("vector_cosine_distance", "vector_cosine_distance(a, b) - 1 minus cosine similarity"),
      vec("cosine_distance") _),
    ("vector_cosine_sim",
      info("vector_cosine_sim", "vector_cosine_sim(a, b) - cosine similarity"),
      vec("cosine_sim") _),
    ("poly_hash_array",
      new ExpressionInfo(classOf[PolyHashArrayExpr].getName, null, "poly_hash_array",
        "poly_hash_array(arr) - polynomial rolling hash of each string element", ""),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash_array expects 1 argument")
        PolyHashArrayExpr(args.head)
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, null, "minhash_signature",
        "minhash_signature(hashes, numHashes) - MinHash signature of a hash-set column", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature expects 2 arguments")
        MinHashSignatureExpr(args(0), intArg(args(1), "numHashes"))
      }),
    ("simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, null, "simhash",
        "simhash(hashes, bits) - SimHash of a token-hash column", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash expects 2 arguments")
        SimHashExpr(args(0), intArg(args(1), "bits"))
      }),
    ("hyperplane_signature",
      new ExpressionInfo(classOf[HyperplaneSignatureExpr].getName, null, "hyperplane_signature",
        "hyperplane_signature(vec, planes, dim[, offset]) - random-hyperplane LSH signature", ""),
      (args: Seq[Expression]) => {
        require(args.length == 3 || args.length == 4,
          "hyperplane_signature expects 3 or 4 arguments")
        val off = if (args.length == 4) intArg(args(3), "offset") else 0
        HyperplaneSignatureExpr(args(0), intArg(args(1), "planes"), intArg(args(2), "dim"), off)
      }),
    ("int8_quantize",
      new ExpressionInfo(classOf[graft.functions.QuantizeExpr].getName, null, "int8_quantize",
        "int8_quantize(vec, max_abs) - symmetric int8 codes round(x*127/max_abs) as integral doubles", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "int8_quantize expects 2 arguments")
        graft.functions.QuantizeExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(args(0),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Cast(args(1),
            org.apache.spark.sql.types.DoubleType))
      }),
    ("shingle_hash",
      new ExpressionInfo(classOf[graft.functions.ShingleHashExpr].getName, null, "shingle_hash",
        "shingle_hash(tokens, n) - fused polynomial hashes of word n-gram shingles", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash expects 2 arguments")
        graft.functions.ShingleHashExpr(args(0), intArg(args(1), "n"))
      }),
    ("cdc_chunks",
      new ExpressionInfo(classOf[graft.functions.CdcChunksExpr].getName, null, "cdc_chunks",
        "cdc_chunks(hashes, window, divisor) - content-defined chunks packed (fp<<32)|len", ""),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cdc_chunks expects 3 arguments")
        graft.functions.CdcChunksExpr(args(0),
          intArg(args(1), "window"), intArg(args(2), "divisor"))
      }),
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[graft.functions.WinnowFingerprintsExpr].getName, null,
        "winnow_fingerprints",
        "winnow_fingerprints(hashes, k, w) - distinct window-minimum k-gram hashes (MOSS)", ""),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fingerprints expects 3 arguments")
        graft.functions.WinnowFingerprintsExpr(args(0),
          intArg(args(1), "k"), intArg(args(2), "w"))
      }),
    // composite builders: Column-level operators re-exposed to SQL text
    // as directly-composed catalyst trees (a Column→Expression bridge
    // round-trip leaves unresolved nodes inside a registry builder).
    // SQL ≡ Column-API equality is spec-enforced, so the two
    // formulations can't drift silently.
    ("z_value",
      new ExpressionInfo("graft.operators.Layout", null, "z_value",
        "z_value(a, b) - Morton interleave of the low 16 bits of two integer keys", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "z_value expects 2 arguments")
        Composite.zValue(args(0), args(1))
      }),
    ("det_bucket",
      new ExpressionInfo("graft.operators.Sampling", null, "det_bucket",
        "det_bucket(key, n) - deterministic rand-free bucket in [0, n) by integer hash", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, "det_bucket expects 2 arguments")
        Composite.detBucket(args(0), intArg(args(1), "n"))
      }),
    ("redact_pii",
      new ExpressionInfo("graft.functions.TextFunctions", null, "redact_pii",
        "redact_pii(text[, token]) - scrub emails, URLs, and digit runs (default token '<X>')", ""),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "redact_pii expects 1 or 2 arguments")
        val token = if (args.length == 2) strArg(args(1), "token") else "<X>"
        Composite.redactPii(args(0), token)
      }))

  /** Catalyst formulations of the composite Column operators (same
    * arithmetic as [[graft.operators.Layout.zValue]],
    * [[graft.operators.Sampling.bucket]],
    * [[graft.functions.TextFunctions.redact]] — equality
    * spec-enforced in GraftExtensionsSpec). */
  private object Composite {
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseOr, Cast, Literal, Multiply, Pmod, RegExpReplace, Remainder, ShiftLeft}
    import org.apache.spark.sql.types.LongType

    private def spread16(x: Expression): Expression = {
      val m0 = BitwiseAnd(Cast(x, LongType), Literal(0xFFFFL))
      val m1 = BitwiseAnd(BitwiseOr(m0, ShiftLeft(m0, Literal(8))), Literal(0x00FF00FFL))
      val m2 = BitwiseAnd(BitwiseOr(m1, ShiftLeft(m1, Literal(4))), Literal(0x0F0F0F0FL))
      val m3 = BitwiseAnd(BitwiseOr(m2, ShiftLeft(m2, Literal(2))), Literal(0x33333333L))
      BitwiseAnd(BitwiseOr(m3, ShiftLeft(m3, Literal(1))), Literal(0x55555555L))
    }

    def zValue(a: Expression, b: Expression): Expression =
      BitwiseOr(spread16(a), ShiftLeft(spread16(b), Literal(1)))

    def detBucket(key: Expression, n: Int): Expression = {
      val p = Literal(1000000007L)
      Pmod(
        Pmod(
          Multiply(
            Pmod(
              Multiply(
                Add(Remainder(Cast(key, LongType), p), Literal(1L)),
                Literal(2654435761L)),
              p),
            Literal(2246822519L)),
          p),
        Literal(n.toLong))
    }

    def redactPii(text: Expression, token: String): Expression = {
      import graft.functions.TextFunctions.{DigitRunRe, EmailRe, UrlRe}
      Seq(EmailRe, UrlRe, DigitRunRe).foldLeft(text)((e, pat) =>
        RegExpReplace(e, Literal(pat), Literal(token)))
    }
  }

  /** Extract a foldable integer argument (signature widths are plan-time
    * constants — they shape the generated code). */
  private def intArg(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }

  /** Extract a foldable string argument. */
  private def strArg(e: Expression, name: String): String = {
    require(e.foldable, s"$name must be a literal")
    val v = e.eval()
    // a foldable NULL literal passes the foldable check; fail with the
    // argument's name, not an opaque NPE from toString
    require(v != null, s"$name must be a non-null literal")
    v.toString
  }

  /** Register all functions (and the HOF→native optimizer rule) on an
    * already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
    all.foreach { case (name, i, builder) =>
      reg.registerFunction(FunctionIdentifier(name), i, builder)
    }
    graft.plans.NativeRewrite.install(spark)
  }
}
