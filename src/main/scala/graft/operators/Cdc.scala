package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the FastCDC/rsync idea at token
  * granularity): a chunk boundary falls after token i iff the rolling
  * hash of the last `window` token hashes ≡ 0 (mod `divisor`) — a pure
  * LOCAL predicate, so an edit re-chunks only the tokens whose hash
  * windows it touches and everything after the next content-chosen
  * boundary realigns ([[CdcSpec]] pins this: prepending a token leaves
  * every chunk after the first boundary bit-identical). Fixed-stride
  * chunking (q64; q80's stride-32 char windows) loses alignment on any
  * insertion — CDC is the dedup-robust alternative.
  *
  * All per-row array math: token hashes once (codegen'd
  * [[graft.functions.PolyHashArrayExpr]]), the gear hash via shifted-
  * slice zip_withs (the q47/q128 idiom), boundary selection and
  * per-chunk fingerprints as HOF folds over the one hashes array. No
  * shuffle, no Window, no strings past tokenization.
  */
object Cdc {

  private val P = 1000000007L

  /** `(idCol, fp, len)` per chunk: `fp` the order-sensitive polynomial
    * fingerprint of the chunk's token hashes, `len` its token count.
    * Chunks partition the token stream (Σ len = n_tokens). Mean chunk
    * length ≈ `divisor` tokens.
    *
    * Hot path: the fused native [[graft.functions.CdcChunksExpr]]
    * (hash→boundary→fingerprint in one codegen loop per row; the HOF
    * stack is CodegenFallback and paid 2.5× at sf0.1 — the
    * [[graft.functions.SignatureExprs]] treatment). [[chunksHof]] is
    * the declarative twin, spec-pinned bit-equal ([[CdcSpec]]). */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, divisor: Int = 8): DataFrame =
    df.select(col(idCol),
        explode(packedChunks(col(textCol), window, divisor)).as("packed"))
      .select(col(idCol), fpOf(col("packed")).as("fp"),
        lenOf(col("packed")).as("len"))

  /** The packed chunk ARRAY as a composable column — for callers that
    * need to carry other columns through the chunk explosion
    * ([[graft.streaming.StreamingOps.ingestPipelineStream]]); unpack
    * with [[fpOf]]/[[lenOf]] so the `(fp<<32)|len` convention has one
    * definition. */
  def packedChunks(text: Column, window: Int = 4, divisor: Int = 8): Column = {
    import graft.functions.{CdcChunksExpr, TextFunctions}
    CdcChunksExpr(
      TextFunctions.tokenHashArray(TextFunctions.tokens(text)), window, divisor)
  }

  /** Chunk fingerprint half of a [[packedChunks]] element. */
  def fpOf(packed: Column): Column = shiftright(packed, 32)

  /** Token-length half of a [[packedChunks]] element. */
  def lenOf(packed: Column): Column = packed % 4294967296L

  /** Declarative higher-order-function twin of [[chunks]] — same
    * boundary and fingerprint semantics via shifted-slice zip_withs
    * and per-chunk folds. Interpreted (CodegenFallback); kept for the
    * bit-equality spec and as executable documentation of the
    * algorithm. */
  def chunksHof(df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, divisor: Int = 8): DataFrame = {
    import graft.functions.TextFunctions
    val h = col("h")
    val n = size(h)
    // gear hash g(j) over hashes[j..j+window-1], j = 1..n-window+1
    val g = TextFunctions.kgramRollingHashes(h, window)
    // boundary after token i = j+window-1 for g(j) % divisor == 0,
    // i < n (a trailing boundary would open an empty chunk)
    val starts = concat(array(lit(1)),
      when(n >= window + 1,
        transform(
          filter(sequence(lit(1), greatest(n - window, lit(1))),
            j => element_at(g, j) % divisor === 0),
          j => j + window))
        .otherwise(array().cast("array<int>")))
    val chunkStructs = transform(sequence(lit(1), size(col("starts"))), k => {
      val s = element_at(col("starts"), k)
      val e = when(k < size(col("starts")),
        element_at(col("starts"), k + 1) - 1).otherwise(size(col("h")))
      struct(
        aggregate(slice(col("h"), s, e - s + 1), lit(0L),
          (f, x) => (f * 31L + x) % P).as("fp"),
        (e - s + 1).cast("long").as("len"))
    })
    df.select(col(idCol),
        TextFunctions.tokenHashArray(TextFunctions.tokens(col(textCol))).as("h"))
      .filter(n >= 1)
      .withColumn("starts", starts)
      .select(col(idCol), explode(chunkStructs).as("c"))
      .select(col(idCol), col("c.fp").as("fp"), col("c.len").as("len"))
  }
}
