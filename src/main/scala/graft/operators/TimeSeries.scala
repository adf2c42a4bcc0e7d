package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series similarity search over per-key event streams — the
  * distributed data-series pattern (cf. REPOSE ICDE'21 / Odyssey
  * VLDB'23: sketch locally, compare sketches, refine): each key's
  * series reduces to a Piecewise Aggregate Approximation (PAA) sketch
  * and similarity runs on sketches, never on raw series.
  *
  * Determinism discipline: the series order is a UNIQUE total order
  * (event time, then id), segment aggregates are integer sums (equal
  * segment widths make sum ≡ mean up to a constant factor, with none
  * of mean's float-division portability risk), and sketch distance is
  * an exact integer Σ(aₛ−bₛ)². Every stage is engine-portable.
  *
  * Scale shape: the per-key prefix rank is a Window over the
  * HIGH-cardinality key (per-key sort slices, distributes — q46's
  * shape); segment aggregation is one partial-agged groupBy. The
  * sketch relation is one ROW PER KEY — orders of magnitude smaller
  * than the event stream — so the pairwise stage operates on the
  * reduced relation (and at extreme key counts would bucket sketches
  * by an LSH of the PAA vector, the [[Dedup]] discovery pattern,
  * rather than self-join).
  */
object TimeSeries {

  /** PAA sketch: for each key with ≥ `take` events, the integer sums
    * of `value` over `segments` equal windows of its first `take`
    * events (ordered by (ts, tieCol)).
    * @return (key, seg ∈ 0..segments−1, seg_sum) — `segments` rows per
    *         qualifying key
    */
  def paaSketch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCents: org.apache.spark.sql.Column,
      take: Int,
      segments: Int): DataFrame = {
    require(take % segments == 0, "take must divide into segments")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val ranked = events
      .select(col(keyCol), col(tsCol), col(tieCol), valueCents.as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= take)
    val full = ranked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_ev"))
      .filter(col("n_ev") === take)
      .select(col(keyCol))
    ranked.join(full.hint("shuffle_hash"), Seq(keyCol))
      .select(col(keyCol),
        floor((col("rn") - 1) / (take / segments)).cast("long").as("seg"),
        col("cents"))
      .groupBy(col(keyCol), col("seg"))
      .agg(sum(col("cents")).as("seg_sum"))
  }

  /** Top-k most-similar keys per key by exact integer squared distance
    * between PAA sketches. The pairwise stage is deliberately
    * ALL-PAIRS — but over the one-row-per-key sketch relation, not
    * the event stream: keys² sketch-pair rows (per segment) is the
    * honest cost, affordable precisely because the sketch reduction
    * already happened. When keys² itself is too big, bucket the PAA
    * vectors with LSH first (the [[Dedup]] discovery pattern) — same
    * refinement, pruned candidate set.
    * @return (key, rank, other, dist) — dist = Σₛ (aₛ−bₛ)²
    */
  def similarSeries(sketch: DataFrame, keyCol: String, k: Int): DataFrame = {
    graft.GraftSession.tune(sketch.sparkSession)
    val a = sketch.select(col(keyCol).cast("long").as("ka"),
      col("seg"), col("seg_sum").as("va"))
    val b = sketch.select(col(keyCol).cast("long").as("kb"),
      col("seg"), col("seg_sum").as("vb"))
    val dists = a.join(b.hint("shuffle_hash"), Seq("seg"))
      .filter(col("ka") =!= col("kb"))
      .select(col("ka"), col("kb"),
        ((col("va") - col("vb")) * (col("va") - col("vb"))).as("d2"))
      .groupBy(col("ka"), col("kb"))
      .agg(sum(col("d2")).as("dist"))
    dists.groupBy(col("ka"))
      .agg(TopK.topK(k)(col("dist").cast("double"), col("kb"), col("kb")).as("top"))
      .select(col("ka").as(keyCol), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col(keyCol), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("other"), col("n.dist").cast("long").as("dist"))
  }
}
