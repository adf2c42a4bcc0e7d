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
    *
    * `queries` restricts the LEFT side (the keys that RECEIVE a top-k)
    * to a given key relation — the recall-gate sampling hook: with a
    * fixed-size query sample the pairwise stage is |queries| × keys,
    * LINEAR in the corpus, while each sampled key still ranks against
    * every other key exactly. The sample relation is bounded by
    * construction, so it broadcasts.
    *
    * @param queries single-column relation of keys to score (defaults
    *                to all keys — the symmetric all-pairs shape)
    * @return (key, rank, other, dist) — dist = Σₛ (aₛ−bₛ)²
    */
  def similarSeries(
      sketch: DataFrame,
      keyCol: String,
      k: Int,
      queries: Option[DataFrame] = None): DataFrame = {
    graft.GraftSession.tune(sketch.sparkSession)
    val aAll = sketch.select(col(keyCol).cast("long").as("ka"),
      col("seg"), col("seg_sum").as("va"))
    val a = queries.fold(aAll) { q =>
      val keys = broadcast(q.toDF("ka").select(col("ka").cast("long").as("ka")))
      aAll.join(keys, Seq("ka"), "left_semi")
    }
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

  /** Long-format sketch (key, seg, seg_sum) collapsed to one
    * seg-ordered integer vector per key — the input shape the LSH path
    * buckets on. `array_sort` over (seg, seg_sum) structs makes the
    * collapse shuffle-order-proof (seg is unique per key).
    * @return (id: long, vec: array<long> in seg order)
    */
  def sketchVectors(sketch: DataFrame, keyCol: String): DataFrame =
    sketch.groupBy(col(keyCol).cast("long").as("id"))
      .agg(array_sort(collect_list(struct(col("seg"), col("seg_sum")))).as("sv"))
      .select(col("id"), transform(col("sv"), _.getField("seg_sum")).as("vec"))

  /** HOF twin of [[graft.functions.QuantizedProjectionExpr]] for
    * bit-equality specs: same plane matrix, same element-index fold
    * order from a 0.0 seed, same `floor(dot / width)` cell. */
  def quantizedProjectionHof(
      vec: org.apache.spark.sql.Column, planes: Int, dim: Int,
      planeOffset: Int, width: Long): org.apache.spark.sql.Column = {
    import graft.functions.HyperplaneSignatureExpr.planeComponent
    val cells = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(
          transform(vec, _.cast("double")),
          array((0 until dim).map(d => lit(planeComponent(planeOffset + p, d))): _*),
          (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      floor(dot / lit(width.toDouble)).cast("long")
    }
    array(cells: _*)
  }

  /** The q82 scale path: top-k most-similar keys per key, with the
    * pairwise stage pruned by multi-probe quantized-projection LSH
    * (E2LSH family — [[graft.functions.QuantizedProjectionExpr]])
    * instead of the all-pairs sketch self-join of [[similarSeries]].
    *
    * Shape: per table t, every key lands in the grid cell of its
    * `planes` floored projections; the candidate join matches each
    * key's PROBE cells (center plus ±1 along each axis — catches
    * neighbors split by a cell boundary) against other keys' center
    * cells, on the (table, cell) equi-key. Candidates then verify by
    * the same exact integer Σ(aₛ−bₛ)² as the exact path. Everything is
    * deterministic — the plane grid regenerates from integers, the
    * cell key is a string of floored integers — so the DuckDB oracle
    * replicates bucketing, verification, and the recall number itself.
    *
    * Scale rules: candidates ∝ Σ_pairs p_collision (never keys²
    * materialized — the join is an equi-join on cell keys, plan-audit
    * pinned); `width` sets the grid pitch — shrink it as corpus density
    * rises (neighbors get closer) to keep per-cell occupancy bounded;
    * `planes` grows ~log(keys) to keep cells from saturating; `tables`
    * buys recall linearly in cost. Probe rows are (2·planes+1)·tables
    * per key — the multi-probe trade: ~9× the index rows for the
    * recall a 3–4× larger table count would buy (Lv et al., VLDB'07).
    *
    * Defaults (planes=4, tables=8, width=6000 cents) measured on the
    * events PAA shape: recall@3 0.97 at sf0.01 / 0.99 at sf0.1 with
    * ~26% of all-pairs verified (gated per round by q98).
    * @return (key, rank, other, dist) — same shape as [[similarSeries]]
    */
  def similarSeriesLsh(
      sketch: DataFrame,
      keyCol: String,
      k: Int,
      segments: Int,
      planes: Int = 4,
      tables: Int = 8,
      widthCents: Long = 6000L,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    graft.GraftSession.tune(sketch.sparkSession)
    val vecs = sketchVectors(sketch, keyCol)
    val cand = lshCandidatePairs(vecs, segments, planes, tables, widthCents,
      maxBucketWidth)
    val dists = cand
      .join(vecs.select(col("id").as("ka"), col("vec").as("va")).hint("shuffle_hash"), Seq("ka"))
      .join(vecs.select(col("id").as("kb"), col("vec").as("vb")).hint("shuffle_hash"), Seq("kb"))
      .select(col("ka"), col("kb"),
        aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, d) => acc + d).as("dist"))
    dists.groupBy(col("ka"))
      .agg(TopK.topK(k)(col("dist").cast("double"), col("kb"), col("kb")).as("top"))
      .select(col("ka").as(keyCol), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col(keyCol), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("other"), col("n.dist").cast("long").as("dist"))
  }

  /** Directed candidate pairs of the multi-probe LSH stage (exposed so
    * callers can gate the PRUNING FACTOR, not just recall): (ka, kb)
    * present iff some table puts kb's center cell among ka's probe
    * cells. The join is an equi-join on the (table, cell-string) key —
    * never a keys² product.
    *
    * `maxBucketWidth` caps the CENTER-cell index side per (table,
    * cell) bucket ([[Dedup.dropWideBuckets]]) — the series analogue of
    * the text/embedding mega-cluster guard (a fleet of flat-lined
    * series all sketch to one cell). Capping the index side alone
    * breaks the quadratic: every probe row then matches ≤ cap index
    * rows, so a hot cell's fan-out is linear in its membership.
    *
    * @param vecs [[sketchVectors]] output (id, vec)
    */
  def lshCandidatePairs(
      vecs: DataFrame,
      segments: Int,
      planes: Int,
      tables: Int,
      widthCents: Long,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    def sigStr(f: org.apache.spark.sql.Column) =
      array_join(transform(f, _.cast("string")), ",")
    def bumped(f: org.apache.spark.sql.Column, axis: Int, d: Int) =
      transform(f, (x, i) => when(i === lit(axis), x + lit(d.toLong)).otherwise(x))
    // one row per (id, table) carrying that table's cell vector
    val cells = vecs.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        graft.functions.SignatureExprs.quantizedProjection(
          col("vec"), planes, segments, t * planes, widthCents)): _*))
        .as(Seq("tbl", "f")))
    val idx0 = cells.select(col("id"), col("tbl"), sigStr(col("f")).as("sig"))
      .hint("shuffle_hash") // post-explode size defeats broadcast estimates
    val idx = maxBucketWidth.fold(idx0)(Dedup.dropWideBuckets(idx0, "tbl", "sig", _))
    val probes = cells.select(col("id"), col("tbl"),
        explode(array((sigStr(col("f")) +: (0 until planes).flatMap(a =>
          Seq(-1, 1).map(d => sigStr(bumped(col("f"), a, d))))): _*)).as("sig"))
      .hint("shuffle_hash")
    probes.as("a")
      .join(idx.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig")
          && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ka"), col("b.id").as("kb"))
      .distinct()
  }
}
