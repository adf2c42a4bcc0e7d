package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
  * algorithm): per document, the set of window-minimum k-gram hashes —
  * in every sliding window of `w` consecutive k-gram hashes, keep the
  * minimum. The winnowing THEOREM is what q80's stride windows lack:
  * any token run of length ≥ w + k − 1 shared by two documents
  * contains one complete, identical window of k-grams in both, whose
  * minimum is therefore a shared fingerprint — detection is
  * GUARANTEED, at any alignment ([[WinnowSpec]] pins this with
  * deliberately misaligned planted runs). Density is ~2/(w+1) of the
  * k-gram count, so the index is a fraction of the q80 stride index
  * with a stronger contract.
  *
  * Short-document fallbacks (the q43 shingle convention): fewer than
  * `w` k-grams → the single global k-gram minimum; fewer than `k`
  * tokens → one whole-document fold hash.
  *
  * Scale shape: per-row array math only (token hashes via the codegen
  * [[graft.functions.PolyHashArrayExpr]], k-gram rolling hashes via
  * shifted-slice zip_withs, window minima via slice+array_min HOFs) —
  * no shuffle until the fingerprint-keyed join in the consumer.
  */
object Winnow {

  private val P = 1000000007L

  /** `(idCol, fp)` — one row per DISTINCT winnowing fingerprint.
    * Hot path: the fused native
    * [[graft.functions.WinnowFingerprintsExpr]] (k-gram hashes,
    * window minima, and first-occurrence dedup in one codegen loop
    * per row — the [[graft.functions.SignatureExprs]] treatment);
    * [[fingerprintsHof]] is the declarative twin, spec-pinned
    * bit-equal ([[WinnowSpec]]). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    import graft.functions.{TextFunctions, WinnowFingerprintsExpr}
    df.select(col(idCol),
        explode(WinnowFingerprintsExpr(
          TextFunctions.tokenHashArray(TextFunctions.tokens(col(textCol))),
          k, w)).as("fp"))
      .distinct()
  }

  /** Declarative higher-order-function twin of [[fingerprints]] —
    * interpreted (CodegenFallback); kept for the bit-equality spec
    * and as executable documentation of the algorithm. */
  def fingerprintsHof(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    import graft.functions.TextFunctions
    val h = col("h")
    val n = size(h)
    // k-gram rolling hashes g(j) over h[j..j+k-1], j = 1..n-k+1 — the
    // shared convention with Cdc (one helper, no drift)
    val g = TextFunctions.kgramRollingHashes(h, k)
    val wholeDocFp = aggregate(h, lit(0L), (f, x) => (f * 31L + x) % P)
    val fps =
      when(size(col("g")) >= w,
        array_distinct(transform(
          sequence(lit(1), size(col("g")) - (w - 1)),
          j => array_min(slice(col("g"), j, lit(w))))))
      .when(size(col("g")) >= 1, array(array_min(col("g"))))
      .otherwise(array(col("whole")))
    df.select(col(idCol),
        TextFunctions.tokenHashArray(TextFunctions.tokens(col(textCol))).as("h"))
      .filter(n >= 1)
      .withColumn("g", when(n >= k, g).otherwise(array().cast("array<long>")))
      .withColumn("whole", wholeDocFp)
      .select(col(idCol), explode(fps).as("fp"))
      .distinct()
  }

  /** Pairs sharing ≥ `minShared` winnowing fingerprints, with the
    * shared count — same join shape as q80 (fingerprint-keyed
    * shuffle self-join, bounded by real collisions, never all-pairs)
    * but with the winnowing detection guarantee. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 1L): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
    val a = fps.as("a"); val b = fps.as("b")
    a.join(b.hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
