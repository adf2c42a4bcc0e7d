package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-up generator for the sf1 spot-bench: replicates the
  * four bench-heavy tables (`documents`, `embeddings`, `events`,
  * `lineitem`) `reps`× with per-replica key shifts, so the scaled
  * corpus has `reps`× the DISTINCT keys — not `reps` exact copies of
  * every row, which would turn the dedup queries into an artificial
  * pair-explosion (10 identical copies of each doc is 45 pairs per
  * text group, a quadratically heavier workload than a real 10×
  * corpus).
  *
  * Content perturbation, chosen so each replica is an independent
  * near-dup universe (cross-replica rows must NOT become near-dups of
  * each other, or candidate volume scales ~reps² instead of ~reps):
  *  - `documents.text`: a per-replica token PERMUTATION. Rotation
  *    would NOT work here: word-n-gram shingle sets are
  *    rotation-invariant (only the ≤ n−1 grams spanning the cut
  *    change), so rotated clones would be detected as near-dups and
  *    the dedup workload would scale reps², not reps. Instead, tokens
  *    are partitioned into consecutive 13-blocks and each full block
  *    is reordered by the stride map `j → j·(rep+1) mod 13` (13 prime
  *    → every stride 1..12 is a unit). The map is (a) identity at
  *    rep 0 (stride 1), (b) position-keyed and length-independent over
  *    full blocks, so the corpus's prefix-aligned near-dup pairs
  *    transform identically in both members and keep their Jaccard,
  *    and (c) consecutive output positions sit stride-apart in the
  *    source, so two replicas with different strides share ZERO
  *    positional 3-grams inside full blocks. The ragged tail
  *    (< 13 tokens — and the WHOLE text for docs shorter than one
  *    block, which would otherwise repeat verbatim across replicas)
  *    is dealt into k piles (every-k-th-token interleave: a
  *    permutation for any length, pile-internal source spacing k so
  *    different k share no positional 3-grams), with k walking 2..7
  *    per rep, capped at L−3 (k = L is identity and k = L−1
  *    near-identity — the cap excludes both), and reps 7..12 dealing
  *    over the REVERSED tail (spacing −k), doubling the variant space
  *    so even a 10-token pure-tail doc gets distinct perms for all
  *    reps. Tails of ≤ 8 tokens — where the capped deal degenerates
  *    (identity at L ≤ 4, mostly-rep-independent at L = 5..8) — use a
  *    rep-keyed rotation instead (see the inline note at `dealPos`).
  *    The tail deal depends on the tail length,
  *    so near-dup pairs of unequal length lose only their ≤ 12-token
  *    tail overlap — full-block overlap, which dominates for the
  *    planted prefix-aligned pairs, is exact. Because quality score,
  *    language ID, token/char counts, and token df profiles are
  *    order-invariant token-multiset functions, every per-doc
  *    statistic the pipeline filters on is preserved bit-for-bit.
  *    `n_chars` is recomputed from the reassembled text.
  *  - `embeddings.embedding`: cyclic rotation by `rep mod dim`
  *    positions — norm-preserving, within-replica cosine structure
  *    intact, cross-replica neighborhoods decorrelated.
  *  - `events` / `lineitem`: key shifts only (timestamps untouched, so
  *    the one-month event span keeps its density profile — 10× events
  *    per day, the realistic growth axis).
  *
  * Replica 0 is bit-identical to the source. Deterministic end to end
  * (no rand), so the scaled corpus is reproducible by anyone.
  *
  * Usage: `runMain graft.ScaleUp <srcSfDir> <dstDir> <reps>`
  */
object ScaleUp {

  private val KeyShift = 10000000L // doc/user/vec id space per replica
  private val BigShift = 1000000000L // event/order id space per replica

  private def withReps(spark: SparkSession, df: DataFrame, reps: Int): DataFrame =
    df.crossJoin(broadcast(spark.range(reps).toDF("rep")))

  def scaleDocuments(spark: SparkSession, src: DataFrame, reps: Int): DataFrame = {
    // strides rep+1 must all be units mod 13: rep ≤ 11
    require(reps >= 1 && reps <= 12, s"reps=$reps: block stride needs rep+1 < 13")
    val B = 13
    val toks = split(col("text"), " ")
    val sz = size(toks)
    val stride = (col("rep") + 1).cast("int")
    val tailStart = sz - pmod(sz, lit(B)) // 0-based start of the ragged tail
    val tailLen = pmod(sz, lit(B))
    // output position o (0-based) reads source position
    //   (o - o mod 13) + (o mod 13)·stride mod 13     inside full blocks;
    //   tailStart + pile(p) + j·k  (deal into k piles) in the ragged tail
    val permuted = transform(sequence(lit(0), sz - 1), o => {
      val blockStart = o - pmod(o, lit(B))
      val t = o - tailStart // 0-based position within the tail
      // tail deal parameters — only evaluated for rep ≥ 1 (the rep-0
      // branch keeps the source text verbatim): k walks 2..7 and the
      // second six reps deal over the REVERSED tail, doubling the
      // variant space so even a 10-token pure-tail doc gets 9 distinct
      // non-identity perms (k = L would be identity, k = L−1 is
      // near-identity — both excluded by the L−3 cap)
      val idx = stride - 2 // = rep − 1
      val rev = pmod(idx, lit(12)) >= 6
      val k = least(lit(2) + pmod(idx, lit(6)), greatest(tailLen - 3, lit(1)))
      val q = floor(tailLen / k).cast("int") // pile base size ≥ 1 (k ≤ L)
      val r = pmod(tailLen, k) // first r piles hold q+1 elements
      val boundary = r * (q + 1)
      val p = when(t < boundary, floor(t / (q + 1)).cast("int"))
        .otherwise(r + floor((t - boundary) / q).cast("int"))
      val j = when(t < boundary, pmod(t, q + 1)).otherwise(pmod(t - boundary, q))
      // Tails of ≤ 8 tokens get little-to-no decorrelation from the
      // deal: at L ≤ 4 the k = 1 floor deals to the IDENTITY (a
      // pure-tail doc that short would repeat verbatim across reps
      // 1..6 — an artificial cross-replica exact-dup family), and at
      // L = 5..8 the L−3 cap collapses most reps onto the same k
      // (e.g. L = 6 pins k = 3 for reps 2..6: a 5-wide clone family).
      // Those tails rotate by 1 + (rep−1) mod (L−1) instead: never
      // ≡ 0 mod L, so no rep reproduces rep 0's text, and with the
      // rev doubling the variant count is 2(L−1) — the worst clone
      // group is ⌈6/(L−1)⌉ ≤ 2 for L ≥ 4 (3 at L = 3; at L = 2 the
      // swap is the ONLY non-identity perm, so all 11 perturbed reps
      // coincide — the documented floor, like the necessarily
      // invariant 1-token tail). Rotated clones share only cyclic
      // 3-grams (cross-replica Jaccard ≤ ~0.5 at L = 8, less below —
      // under every near-dup threshold the engine gates on), which is
      // why the deal still owns L ≥ 9 where it yields distinct
      // zero-overlap perms. All floors are spec'd in ScaleUpSpec.
      val rotAmt = lit(1) + pmod(idx, greatest(tailLen - 1, lit(1)))
      val dealPos = when(tailLen <= 8, pmod(t + rotAmt, tailLen))
        .otherwise(p + j * k)
      // rev ∘ rotation degenerates to the identity exactly at L = 2
      // (reverse IS the swap) — guard so reps 7..12 can't reproduce
      // rep 0 there
      element_at(toks, lit(1) +
        when(o < tailStart,
          blockStart + pmod(pmod(o, lit(B)) * stride, lit(B)))
          .otherwise(tailStart +
            when(rev && (tailLen > 2), tailLen - 1 - dealPos)
              .otherwise(dealPos)))
    })
    withReps(spark, src, reps)
      .select((col("doc_id") + col("rep") * KeyShift).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat_ws(" ", permuted)).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def scaleEmbeddings(spark: SparkSession, src: DataFrame, reps: Int): DataFrame = {
    val v = col("embedding")
    val dim = size(v)
    val off = pmod(col("rep"), dim).cast("int")
    val rotated = concat(slice(v, off + lit(1), dim - off), slice(v, lit(1), off))
    withReps(spark, src, reps)
      .select((col("vec_id") + col("rep") * KeyShift).as("vec_id"),
        when(col("rep") === 0, v).otherwise(rotated).as("embedding"),
        col("label"))
  }

  def scaleEvents(spark: SparkSession, src: DataFrame, reps: Int): DataFrame =
    withReps(spark, src, reps)
      .select((col("event_id") + col("rep") * BigShift).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * KeyShift).as("user_id"),
        col("event_type"), col("value"), col("props"))

  def scaleLineitem(spark: SparkSession, src: DataFrame, reps: Int): DataFrame =
    withReps(spark, src, reps)
      .select((col("l_orderkey") + col("rep") * BigShift).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))

  def main(args: Array[String]): Unit = {
    val Array(src, dst, repsS) = args.take(3)
    val reps = repsS.toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-scaleup")
    // Tables.load handles the events table's TIMESTAMP(NANOS) encoding
    // (Spark 4 rejects it raw); the scaled copy is written back at
    // Spark-native micros, which downstream loads pass through.
    def read(t: String): DataFrame = Tables.load(spark, src, t)
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    write(scaleDocuments(spark, read("documents"), reps), "documents")
    write(scaleEmbeddings(spark, read("embeddings"), reps), "embeddings")
    write(scaleEvents(spark, read("events"), reps), "events")
    write(scaleLineitem(spark, read("lineitem"), reps), "lineitem")
    spark.stop()
  }
}
