package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Knn

/** Structured Streaming surface — the reference engine is batch-only
  * (SURVEY §2.1: no watermarks, windows, or state), so this is pure
  * extension: the same operators, lifted onto unbounded inputs.
  *
  *  - [[windowedEventCounts]]: event-time tumbling windows + watermark —
  *    the streaming twin of the batch `q27_events_windowed` query (same
  *    window spec, same aggregates).
  *  - [[knnScoringWriter]]: per-micro-batch KNN classification against a
  *    static (broadcast) train set via `foreachBatch` — scoring never
  *    needs cross-batch state, so each batch is a plain batch KNN.
  *  - [[runningUserStats]]: custom keyed state with `mapGroupsWithState`
  *    — running per-user counters that survive across micro-batches.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a watermark for state
    * eviction. Append mode emits a window only once its watermark
    * passes — at 100 TB/day the state store holds just the open
    * windows per key, bounded by the watermark horizon.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("win_start"), col(keyCol),
        col("n_events"), col("value_cents"))

  /** KNN-score an unbounded stream of query vectors against a static
    * train table: every micro-batch runs the batch [[Knn.classify]]
    * (train side broadcast once per batch by Catalyst) and hands the
    * predictions to `sink`. Stateless across batches by design.
    */
  def knnScoringWriter(
      stream: DataFrame,
      train: DataFrame,
      k: Int,
      idCol: String,
      vecCol: String,
      trainIdCol: String,
      trainVecCol: String,
      labelCol: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val preds = Knn.classify(
          train = train, test = batch.toDF(), k = k,
          trainId = trainIdCol, testId = idCol,
          trainVec = trainVecCol, testVec = vecCol,
          labelCol = labelCol)
        sink(preds, batchId)
      }

  /** Running per-user event statistics carried across micro-batches in
    * the state store: (user_id, events_so_far, value_cents_so_far).
    * State is one small struct per user — the 100 TB concern is key
    * cardinality, not event volume.
    */
  def runningUserStats(
      spark: SparkSession,
      events: DataFrame): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var c = c0
          rows.foreach { case (_, cents) => n += 1; c += cents }
          state.update((n, c))
          (user, n, c)
      }
  }
}
