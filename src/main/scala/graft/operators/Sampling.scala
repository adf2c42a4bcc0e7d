package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `rand()`-based sampling is unusable at scale: a retry or a re-run
  * reassigns rows, so downstream artifacts (train/test splits, eval
  * sets) silently shift. Everything here derives the assignment from
  * row CONTENT via integer hashing — any engine, any retry, any day
  * reproduces the identical split, and an external system (or the
  * DuckDB oracle) can replicate it with plain arithmetic.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from an integral key: two
    * rounds of multiply-mod over the prime 1e9+7
    * (`(((key mod P + 1)·2654435761 mod P) · 2246822519 mod P) mod
    * buckets`). One round leaves consecutive keys stepping by a
    * constant modulo small bucket counts (runs of identical buckets);
    * the second multiply breaks the lattice.
    *
    * Total over ALL long keys: the key is first reduced `mod P`
    * (signed remainder — identical to the raw key for |key| < P, so
    * existing assignments are unchanged), which bounds every later
    * product by `P·2654435761 < 2^62` — no silent 64-bit wraparound
    * for wide keys, and any engine with 64-bit integers (the DuckDB
    * oracle included, whose BIGINT multiply would raise on overflow
    * rather than wrap) reproduces the assignment exactly.
    */
  def bucket(key: Column, buckets: Int): Column = {
    require(buckets >= 1, "buckets must be >= 1")
    val p = lit(1000000007L)
    pmod(pmod(pmod((key.cast("long") % p + 1L) * 2654435761L, p) * 2246822519L, p),
      lit(buckets))
  }

  /** Tag each row `train` / `test` by deterministic key hash:
    * `trainBuckets` of `buckets` go to train. */
  def splitTag(key: Column, buckets: Int, trainBuckets: Int): Column = {
    require(trainBuckets >= 0 && trainBuckets <= buckets)
    when(bucket(key, buckets) < trainBuckets, lit("train")).otherwise(lit("test"))
  }

  /** The `fraction ≈ trainBuckets/buckets` deterministic subsample of
    * `df` (the "train" side of [[splitTag]]). */
  def deterministicSample(
      df: DataFrame, keyCol: String, buckets: Int, keep: Int): DataFrame =
    df.filter(bucket(col(keyCol), buckets) < keep)

  /** Deterministic stratified sample: exactly `min(n, |group|)` rows per
    * `groupCol` value, chosen as the `n` smallest `(hash(key), key)`
    * pairs — a reproducible uniform draw (the hash is [[bucket]]'s
    * two-round multiply-mod, so any engine replays the same pick).
    *
    * Scale shape: per-group top-n runs through the bounded-heap
    * [[TopK]] aggregator — map-side partial heaps of size n merge in
    * the shuffle, so the exchange carries `partitions × groups × n`
    * rows, NOT the corpus. The tempting
    * `row_number().over(Window.partitionBy(groupCol))` formulation is
    * a scale-killer with few groups (10 labels = 10 sort tasks over
    * the entire table); this shape stays balanced regardless of group
    * cardinality. Hash collisions are broken by the key itself, so
    * the order is total and the sample deterministic.
    *
    * @return (groupCol, keyCol, rn) with rn in [1, n] densely ranked by
    *         (hash, key) within the group
    */
  def stratifiedSample(
      df: DataFrame, groupCol: String, keyCol: String, n: Int,
      hashBuckets: Int = 1000003): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // the key is hashed through integer arithmetic and carried as long:
    // fail loudly at plan time on a non-integral key (a silent cast
    // would truncate doubles / throw opaquely inside the encoder)
    val keyType = df.schema(keyCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(keyType.typeName),
      s"stratifiedSample keyCol '$keyCol' must be an integral type " +
        s"(byte/short/int/long), got ${keyType.typeName}; hash or cast it explicitly first")
    df.select(col(groupCol),
        bucket(col(keyCol), hashBuckets).cast("double").as("_h"),
        col(keyCol).cast("long").as("_k"))
      .groupBy(col(groupCol))
      .agg(TopK.topK(n)(col("_h"), col("_k"), col("_k")).as("picks"))
      .select(col(groupCol), posexplode(col("picks")).as(Seq("pos", "p")))
      .select(col(groupCol), col("p.id").as(keyCol),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** Deterministic weighted source mixing — the data-mixing primitive
    * of a pre-training pipeline: each group (source/domain/language)
    * is independently downsampled to its target rate, expressed in
    * parts-per-million. A row survives iff
    * `bucket(id, 1e6) < weightPpm(group)`, so:
    *  - the draw is uniform within every group (the hash ignores the
    *    group) and exactly reproducible on any engine — reruns,
    *    backfills, and the DuckDB oracle keep the identical rows;
    *  - mixing is a pure per-row predicate: zero shuffle, zero join,
    *    composable under the scan with every other filter.
    * Weights > 1e6 keep everything (upsampling is a separate concern —
    * repeat-epoch factors live in the training loader, not the
    * engine); weight 0 drops the group.
    */
  def mixKeep(
      id: Column,
      group: Column,
      weightsPpm: Map[String, Long],
      defaultPpm: Long): Column = {
    val w = weightsPpm.foldLeft(lit(defaultPpm)) { case (acc, (k, v)) =>
      when(group === lit(k), lit(v)).otherwise(acc)
    }
    bucket(id, 1000000) < w
  }

  /** Filter `df` to the [[mixKeep]] survivors. */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weightsPpm: Map[String, Long],
      defaultPpm: Long): DataFrame =
    df.filter(mixKeep(col(idCol), col(groupCol), weightsPpm, defaultPpm))

  /** DATA-DERIVED mix ratios — [[mixKeep]]'s weights computed from the
    * corpus itself instead of hand-picked constants: every group's
    * keep-ppm downsamples it to the size of the SMALLEST group
    * (`keep_ppm = ⌊min_count·1e6 / n_total⌋`, pure integer), the
    * balanced-corpus rebalance a multilingual pre-training mix runs
    * when one language dominates the crawl.
    *
    * Scale shape: one partial-agged count per group, one 1-row global
    * min broadcast back over the group-domain-bounded stats relation —
    * the ratio table is |groups| rows, broadcastable at any corpus
    * size. Admission stays [[bucket]]'s per-row predicate: the
    * two-phase plan (stats pass, then filter pass) is how a 100 TB
    * rebalance actually runs — the stats relation is tiny, the corpus
    * is never shuffled at all.
    *
    * @return (groupCol, n_total, keep_ppm) — one row per group
    */
  def rebalanceRatiosPpm(df: DataFrame, groupCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_total"))
    val m = stats.agg(min(col("n_total")).as("m"))
    stats.crossJoin(broadcast(m))
      .select(col(groupCol), col("n_total"),
        expr("m * 1000000 div n_total").as("keep_ppm"))
  }
}
