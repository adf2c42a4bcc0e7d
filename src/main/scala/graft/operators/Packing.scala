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
}
