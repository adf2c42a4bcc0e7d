package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-token-capacity
  * context windows for LLM pre-training ("concat-and-chunk": documents
  * are concatenated in a deterministic order and the stream is cut
  * every `capacity` tokens; a document belongs to the window its first
  * token lands in).
  *
  * Absent from the reference engine (SURVEY §2.1 — it has no text
  * surface); part of the training-data extension set.
  *
  * Semantics are deliberately the *deterministic* industry shape, not a
  * bin-packing heuristic: best-fit packing is order-dependent and
  * driver-sequential, while concat-and-chunk is a pure running sum —
  * one window function, reproducible across runs and engines (the
  * DuckDB oracle replays it verbatim).
  *
  * Scale shape: the running sum partitions by `groupCol` (shard key) —
  * each shard packs independently, so parallelism = shard cardinality.
  * Pick a shard key with enough distinct values to spread (source,
  * (source, date), or a hash-derived shard id); packing NEVER needs a
  * global order, because windows never straddle shard boundaries by
  * construction. A single giant shard degrades to one sort task — that
  * is a data-layout decision, not an engine limit, and mirrors how real
  * pipelines shard corpora before packing.
  */
object Packing {

  /** Per-document pack assignment: adds `pack_id` (0-based window index
    * within the shard) and `tok_before` (tokens accumulated in the
    * shard before this doc — the doc's start offset in the concat
    * stream).
    *
    * @param docs      input relation
    * @param groupCol  shard key; packs never cross shards
    * @param orderCol  deterministic concat order within a shard
    * @param tokensCol per-doc token count (integral)
    * @param capacity  window size in tokens
    */
  def assignPacks(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("tok_before") / capacity).cast("long"))
  }

  /** Pack-level summary: docs per window and the window's token load.
    * `pack_tokens` can exceed `capacity` only via the straddling last
    * doc (its tail spills into the next window in the concat stream).
    */
  def packSummary(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      capacity: Long): DataFrame =
    assignPacks(docs, groupCol, orderCol, tokensCol, capacity)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("pack_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))

  /** Packing-efficiency audit per shard: straddle rate (docs cut by a
    * window boundary) and tail waste (padding in the one partially
    * filled final window). The shard's window count is
    * `max(end_pack)+1`, NOT `max(pack_id)+1`: when the last doc itself
    * straddles the final boundary it still occupies that last window
    * (`end_pack >= pack_id` always, since every doc has >= 1 token),
    * and counting start-windows only would drive `tail_waste` negative
    * there (e.g. a lone 600-token doc at capacity 512 occupies 2
    * windows and wastes 424 tokens, not -88).
    */
  def packAudit(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      capacity: Long): DataFrame =
    assignPacks(docs, groupCol, orderCol, tokensCol, capacity)
      .withColumn("end_pack",
        floor((col("tok_before") + col(tokensCol) - 1) / capacity).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        (max(col("end_pack")) + 1).as("n_packs"),
        sum(col(tokensCol)).cast("long").as("total_tokens"),
        sum(when(col("end_pack") =!= col("pack_id"), 1L).otherwise(0L))
          .as("n_straddling"))
      .select(col(groupCol), col("n_docs"), col("n_packs"),
        col("total_tokens"), col("n_straddling"),
        floor(col("n_straddling") * lit(1000.0) / col("n_docs")).cast("long")
          .as("straddle_permille"),
        (col("n_packs") * capacity - col("total_tokens")).as("tail_waste"))
}
