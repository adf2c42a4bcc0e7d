package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedEventCounts: tumbling windows with watermark, append on close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.windowedEventCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      watermarkDelay = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:45:00"), "view", 3.0))
      q.processAllAvailable()
      // watermark far past 11:00 closes the 10:00 window
      in.addData((ts("2024-01-01 13:00:00"), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select($"win_start".cast("string"), $"event_type", $"n_events", $"value_cents")
        .as[(String, String, Long, Long)].collect().toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00", "click", 2L, 300L),
        ("2024-01-01 10:00:00", "view", 1L, 300L)))
    } finally q.stop()
  }

  test("dedupAgainstCorpusStream: corpus members dropped, novel docs flow through") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "already ingested text one"),
      (2L, "already ingested text two")
    ).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val out = StreamingOps.dedupAgainstCorpusStream(
      in.toDF().toDF("doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("corpus_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (10L, "already ingested text one"), // dup of corpus 1 → dropped
        (11L, "fresh novel content"),
        (12L, "already ingested text two")) // dup of corpus 2 → dropped
      q.processAllAvailable()
      in.addData((13L, "another novel doc"))
      q.processAllAvailable()
      val got = spark.table("corpus_dedup").select($"doc_id").as[Long].collect().toSet
      assert(got === Set(11L, 13L))
    } finally q.stop()
  }

  test("knnScoringWriter: per-batch KNN predictions against static train") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (1L, Seq(0.0, 0.0), 0L), (2L, Seq(0.1, 0.1), 0L), (3L, Seq(0.2, 0.0), 0L),
      (4L, Seq(5.0, 5.0), 1L), (5L, Seq(5.1, 5.0), 1L), (6L, Seq(5.0, 5.2), 1L)
    ).toDF("id", "vec", "label")
    val in = MemoryStream[(Long, Seq[Double])]
    val collected = scala.collection.mutable.Map[Long, Long]()
    val writer = StreamingOps.knnScoringWriter(
      in.toDF().toDF("id", "vec"), train, k = 3,
      "id", "vec", "id", "vec", "label") { (preds, _) =>
      preds.collect().foreach(r => collected.synchronized {
        collected(r.getLong(0)) = r.getLong(1)
      })
    }
    val q = writer.start()
    try {
      in.addData((100L, Seq(0.05, 0.05)), (101L, Seq(5.05, 5.05)))
      q.processAllAvailable()
      in.addData((102L, Seq(0.0, 0.1)))
      q.processAllAvailable()
      assert(collected.toMap === Map(100L -> 0L, 101L -> 1L, 102L -> 0L))
    } finally q.stop()
  }

  test("dedupDocStream: first-seen doc survives, duplicates across batches dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.dedupDocStream(
      in.toDF().toDF("doc_id", "text", "ts"), watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_docs")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, "alpha beta gamma", ts("2024-01-01 10:00:00")),
        (2L, "delta epsilon zeta", ts("2024-01-01 10:00:30")),
        (3L, "alpha beta gamma", ts("2024-01-01 10:01:00"))) // dup of 1, same batch
      q.processAllAvailable()
      in.addData(
        (4L, "alpha beta gamma", ts("2024-01-01 10:02:00")), // dup of 1, later batch
        (5L, "fresh new content", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_docs").select($"doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("ingestPipelineStream: admission + dedup + corpus dedup + contamination ppm, batch-parity") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col => c, lit => l}
    val corpusText = (1 to 60).map(i => s"k${i % 13}m${(i * 3) % 7}").mkString(" ")
    val corpus = Seq((900L, corpusText)).toDF("doc_id", "text")
    // the quality gate needs stopwords: build texts with 'the'/'a' mixed in
    def quality(t: String): Long =
      graft.SparkSpec.session.range(1).select(
        graft.functions.TextFunctions.qualityScore(l(t))).head().getLong(0)
    val good = (1 to 80).map(i => if (i % 3 == 0) "the" else s"g${i}x").mkString(" ")
    val contaminated = "fresh start here then " + corpusText + " and the a the end bits"
    val lowQ = "z1 z2 z3 z4 z5 z6" // no stopwords, short → below 300
    assert(quality(good) >= 300 && quality(contaminated) >= 300 && quality(lowQ) < 300)
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.ingestPipelineStream(
      in.toDF().toDF("doc_id", "text", "ts"), corpus, "ts")
    val q = out.writeStream.format("memory").queryName("ingest_pipe")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, good, ts("2024-01-01 10:00:00")),
        (2L, good, ts("2024-01-01 10:01:00")), // within-stream dup of 1
        (3L, corpusText, ts("2024-01-01 10:02:00")), // exact corpus dup
        (4L, contaminated, ts("2024-01-01 10:03:00")),
        (5L, lowQ, ts("2024-01-01 10:04:00"))) // fails admission
      q.processAllAvailable()
      in.addData((99L, good + " later", ts("2024-01-01 14:00:00"))) // advance watermark
      q.processAllAvailable()
      val got = spark.table("ingest_pipe")
        .select(c("doc_id"), c("dup_chunk_ppm"))
        .as[(Long, Long)].collect().toMap
      assert(got.keySet === Set(1L, 4L),
        s"survivors must be 1 (first copy) and 4 (contaminated-but-new): $got")
      assert(got(1L) === 0L, s"doc 1 shares nothing with the corpus: $got")
      // doc 4 embeds the full corpus text: most of its tokens sit in
      // corpus-known chunks, and parity with the batch formulation holds
      val batchPpm = {
        val chunks = graft.operators.Cdc.chunks(
          Seq((4L, contaminated)).toDF("doc_id", "text"), "doc_id", "text")
        val known = graft.operators.Cdc.chunks(corpus, "doc_id", "text")
          .select(c("fp")).distinct().withColumn("known", l(1L))
        val r = chunks.join(known, Seq("fp"), "left_outer")
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(c("known").isNotNull, c("len"))
              .otherwise(l(0L))).as("dup"),
            org.apache.spark.sql.functions.sum(c("len")).as("n")).head()
        r.getLong(0) * 1000000L / r.getLong(1)
      }
      assert(got(4L) === batchPpm, s"stream ppm ${got(4L)} != batch $batchPpm")
      assert(got(4L) > 500000L, s"contamination should dominate doc 4: ${got(4L)}")
    } finally q.stop()
  }

  test("cdcChunkStream: chunk flags match the batch computation; insertions don't hide shared passages") {
    implicit val sqlCtx = spark.sqlContext
    val corpusText = (1 to 60).map(i => s"c${i % 17}x${(i * 5) % 7}").mkString(" ")
    val corpus = Seq((100L, corpusText)).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val out = StreamingOps.cdcChunkStream(in.toDF().toDF("doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("cdc_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val fresh = "totally unseen words only here"
      // doc 1: corpus passage with a PREPENDED insertion — fixed-stride
      // chunking would misalign everything; CDC must still flag the
      // passage's interior chunks as known
      in.addData((1L, "inserted " + corpusText), (2L, fresh))
      q.processAllAvailable()
      import org.apache.spark.sql.functions.{col => c}
      val got = spark.table("cdc_stream")
        .groupBy(c("doc_id"))
        .agg(org.apache.spark.sql.functions.sum(c("in_corpus")).as("known"),
          org.apache.spark.sql.functions.count(c("fp")).as("n"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(1L)._1 >= got(1L)._2 - 2,
        s"shifted passage: all but the boundary chunks flag known, got ${got(1L)}")
      assert(got(2L)._1 === 0L, s"fresh doc must flag nothing: ${got(2L)}")
      // exact parity with the batch formulation on the same rows
      val batchDocs = Seq((1L, "inserted " + corpusText), (2L, fresh))
        .toDF("doc_id", "text")
      val batch = graft.operators.Cdc.chunks(batchDocs, "doc_id", "text")
        .join(graft.operators.Cdc.chunks(corpus, "doc_id", "text")
          .select(c("fp")).distinct().withColumn("known",
            org.apache.spark.sql.functions.lit(1L)), Seq("fp"), "left_outer")
        .select(c("doc_id"), c("fp"), c("len"),
          org.apache.spark.sql.functions.coalesce(c("known"),
            org.apache.spark.sql.functions.lit(0L)).as("in_corpus"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val streamed = spark.table("cdc_stream")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(streamed === batch, "stream result must equal batch result")
    } finally q.stop()
  }

  test("lshCandidateStream: near-dups arriving in different batches become candidates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = StreamingOps.lshCandidateStream(spark,
      in.toDF().toDF("doc_id", "text"))
    val q = pairs.toDF("id1", "id2").writeStream
      .format("memory").queryName("lsh_cands")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (0L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different words entirely here now"))
      q.processAllAvailable()
      in.addData(
        (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
        (3L, "the quick brown fox jumps over the lazy dog")) // exact dup of 0
      q.processAllAvailable()
      val got = spark.table("lsh_cands").as[(Long, Long)].collect().toSet
      assert(got.contains((0L, 3L)), s"exact dup collides in every band: $got")
      assert(got.contains((0L, 1L)), s"0.75-jaccard near-dup should collide: $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
        s"unrelated doc must not pair: $got")
      // matches the batch candidate generator on the same corpus
      val batchDocs = Seq(
        (0L, "the quick brown fox jumps over the lazy dog"),
        (1L, "the quick brown fox jumps over the lazy cat"),
        (2L, "completely different words entirely here now"),
        (3L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
      val batch = graft.operators.Dedup.lshCandidates(batchDocs, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("lshCandidateStream: cold buckets evict via event-time TTL; fresh twins still pair") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val text = "the quick brown fox jumps over the lazy dog"
    val pairs = StreamingOps.lshCandidateStream(spark,
      in.toDF().toDF("doc_id", "text", "ts"),
      tsCol = Some("ts"), watermarkDelay = "10 seconds", bucketTtl = "10 minutes")
    val q = pairs.toDF("id1", "id2").writeStream
      .format("memory").queryName("lsh_cands_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((0L, text, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark hours past the buckets' TTL; second batch
      // lets the timeout (vs the previous batch's watermark) fire
      in.addData((50L, "unrelated filler words one", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((51L, "other unrelated filler two", ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      // doc 0's buckets are gone: an exact dup arriving now must NOT pair
      in.addData((1L, text, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      // but it re-created the bucket: the NEXT twin pairs with it
      in.addData((2L, text, ts("2024-01-01 12:31:00")))
      q.processAllAvailable()
      val got = spark.table("lsh_cands_ttl").as[(Long, Long)].collect().toSet
      assert(!got.contains((0L, 1L)), s"expired bucket must not pair: $got")
      assert(got.contains((1L, 2L)), s"fresh twins must pair: $got")
    } finally q.stop()
  }

  test("hammingPairStream: verified pairs across batches; matches batch hammingPairs") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    // sign-bit-set 64-bit signatures drive the arithmetic-shiftright
    // top-band path, the image-dHash configuration (cf. batch spec)
    val base = 0x8000F00D1234567L | Long.MinValue
    val pairs = StreamingOps.hammingPairStream(spark,
      in.toDF().toDF("media_id", "hash64"), maxHamming = 2, bits = 64, bands = 8)
    val q = pairs.toDF("id1", "id2", "hamming").writeStream
      .format("memory").queryName("ham_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((0L, base), (2L, 0x00FF00FF00FF00FFL))
      q.processAllAvailable()
      in.addData((1L, base ^ 3L), // hamming 2 from 0, later batch
        (3L, base))               // exact dup of 0
      q.processAllAvailable()
      val got = spark.table("ham_pairs").as[(Long, Long, Long)].collect().toSet
      assert(got.contains((0L, 3L, 0L)), s"exact dup: $got")
      assert(got.contains((0L, 1L, 2L)), s"hamming-2 pair: $got")
      assert(got.contains((1L, 3L, 2L)), s"transitive pair: $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L), s"far doc must not pair: $got")
      // pairs may repeat across bands — the DISTINCT result must equal
      // the batch twin on the same corpus
      val batchHashed = Seq((0L, base), (1L, base ^ 3L),
        (2L, 0x00FF00FF00FF00FFL), (3L, base)).toDF("id", "sig")
      val batch = graft.operators.Dedup.hammingPairs(
        batchHashed, "id", "sig", maxHamming = 2, bits = 64, bands = 8)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("intervalJoinStream: stream-stream join within the window; matches the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val errors = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.intervalJoinStream(
      clicks.toDF().toDF("click_id", "user_id", "ts"),
      errors.toDF().toDF("err_id", "user_id", "err_ts"),
      keyCol = "user_id", leftTsCol = "ts", rightTsCol = "err_ts",
      window = "10 minutes", watermarkDelay = "30 minutes")
    val q = joined.select($"click_id", $"err_id").writeStream
      .format("memory").queryName("interval_join")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: error at 10:00; clicks at 10:05 (match), 10:10 exactly
      // at the window edge (match), 10:11 (no match — err outside);
      // error arrives in a LATER batch than the first click: the
      // buffered state must still join them
      clicks.addData((100L, 1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      errors.addData((900L, 1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      clicks.addData(
        (101L, 1L, ts("2024-01-01 10:10:00")),
        (102L, 1L, ts("2024-01-01 10:11:00")),
        (103L, 2L, ts("2024-01-01 10:05:00"))) // other user: no match
      q.processAllAvailable()
      val got = spark.table("interval_join").as[(Long, Long)].collect().toSet
      assert(got === Set((100L, 900L), (101L, 900L)), s"got $got")
      // the batch range-join counts agree on the same data
      val clicksB = Seq((100L, 1L, ts("2024-01-01 10:05:00")),
        (101L, 1L, ts("2024-01-01 10:10:00")),
        (102L, 1L, ts("2024-01-01 10:11:00")),
        (103L, 2L, ts("2024-01-01 10:05:00"))).toDF("event_id", "user_id", "ts")
      val errorsB = Seq((900L, 1L, ts("2024-01-01 10:00:00")))
        .toDF("err_id", "user_id", "err_ts")
      val batch = graft.operators.RangeJoin.rangeCount(
        clicksB, errorsB.select($"user_id", $"err_ts"), Seq("user_id"),
        "ts", "err_ts", windowMicros = 600L * 1000000L,
        leftId = "event_id", countCol = "n")
        .as[(Long, Long)].collect().toMap
      val streamCounts = got.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(batch.filter(_._2 > 0) === streamCounts,
        s"stream $streamCounts vs batch $batch")
    } finally q.stop()
  }

  test("sessionWindowCounts: inactivity gap closes sessions; matches the batch gap rule") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val sess = StreamingOps.sessionWindowCounts(
      in.toDF().toDF("ts", "user_id"),
      gap = "10 minutes", watermarkDelay = "30 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: 3 events within 10-min gaps = one session; then a 30-min
      // silence; then 1 more event = a second session. user 2: 1 event.
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:08:00"), 1L),
        (ts("2024-01-01 10:16:00"), 1L),
        (ts("2024-01-01 10:50:00"), 1L),
        (ts("2024-01-01 10:05:00"), 2L))
      q.processAllAvailable()
      // advance the watermark far enough to close everything
      in.addData((ts("2024-01-01 14:00:00"), 99L))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"user_id", $"sess_start".cast("string"), $"sess_events")
        .as[(Long, String, Long)].collect().toSet
      assert(rows.contains((1L, "2024-01-01 10:00:00", 3L)), rows)
      assert(rows.contains((1L, "2024-01-01 10:50:00", 1L)), rows)
      assert(rows.contains((2L, "2024-01-01 10:05:00", 1L)), rows)
      // same sessions the batch q31 gap rule derives: 600s gap, so the
      // 10:16→10:50 silence (34 min) splits and nothing else does
      val batch = Seq(
        (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:08:00"), 1L),
        (ts("2024-01-01 10:16:00"), 1L), (ts("2024-01-01 10:50:00"), 1L),
        (ts("2024-01-01 10:05:00"), 2L))
        .toDF("ts", "user_id")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts")
      val sessions = batch
        .withColumn("prev", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull || unix_micros($"ts") - $"prev" > 600000000L, 1L).otherwise(0L))
        .withColumn("sid", sum($"new_sess").over(w))
        .groupBy($"user_id", $"sid").agg(count(lit(1)).as("n"))
        .select($"user_id", $"n").as[(Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val streamed = rows.toSeq.filter(_._1 != 99L)
        .groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
      assert(streamed === sessions, s"stream $streamed vs batch $sessions")
    } finally q.stop()
  }

  test("sessionWindowCounts: events spaced EXACTLY gap apart merge — same as the batch > rule") {
    // the boundary case the round-5 advice flagged: batch splits only on
    // gap STRICTLY greater than 600s (equality merges); session_window's
    // half-open [t, t+gap) windows also merge an event landing exactly at
    // t+gap (probed: Spark treats next.start <= current.end as overlap).
    // Pin both so a Spark-side semantic change breaks loudly.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val sess = StreamingOps.sessionWindowCounts(
      in.toDF().toDF("ts", "user_id"),
      gap = "10 minutes", watermarkDelay = "30 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:10:00"), 1L)) // exactly gap later
      q.processAllAvailable()
      in.addData((ts("2024-01-01 14:00:00"), 99L)) // close everything
      q.processAllAvailable()
      val streamed = spark.table("sessions_boundary")
        .filter($"user_id" === 1L)
        .select($"sess_events").as[Long].collect().toSeq
      assert(streamed === Seq(2L), s"session_window must merge at exact gap: $streamed")
      // the batch gap rule (q31's comparator: split on diff > gap) agrees
      val batch = Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L))
        .toDF("ts", "user_id")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts")
      val nSessions = batch
        .withColumn("prev", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull || unix_micros($"ts") - $"prev" > 600000000L, 1L).otherwise(0L))
        .agg(sum($"new_sess")).as[Long].collect().head
      assert(nSessions === 1L, "batch > comparator must also merge at exact gap")
    } finally q.stop()
  }

  test("runningUserStats: idle users evict via event-time TTL and restart cleanly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Timestamp)]
    val stats = StreamingOps.runningUserStats(spark,
      in.toDF().toDF("user_id", "value", "ts"),
      tsCol = Some("ts"), watermarkDelay = "10 seconds", idleTtl = "10 minutes")
    val q = stats.toDF("user_id", "n", "cents").writeStream
      .format("memory").queryName("user_stats_ttl")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((7L, 1.0, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark hours past 7's TTL; two batches so the
      // timeout (evaluated against the PREVIOUS batch's watermark) fires
      in.addData((99L, 0.0, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((99L, 0.0, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      // 7 returns after eviction: counters restart from zero
      in.addData((7L, 5.0, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val sevens = spark.table("user_stats_ttl").filter($"user_id" === 7L)
        .as[(Long, Long, Long)].collect().toSet
      assert(sevens.contains((7L, 1L, 500L)),
        s"re-appearing user must restart from zero, got $sevens")
      assert(!sevens.exists(_._2 > 1L),
        s"state survived past the TTL horizon: $sevens")
    } finally q.stop()
  }

  test("runningUserStats: keyed state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val stats = StreamingOps.runningUserStats(spark,
      in.toDF().toDF("user_id", "value"))
    val q = stats.toDF("user_id", "n", "cents").writeStream
      .format("memory").queryName("user_stats")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((7L, 1.0), (7L, 2.0), (8L, 10.0))
      q.processAllAvailable()
      in.addData((7L, 3.0))
      q.processAllAvailable()
      // memory sink in update mode appends updated rows; take the last
      // emission per user
      val last = spark.table("user_stats").as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(last(7L) === ((7L, 3L, 600L)))
      assert(last(8L) === ((8L, 1L, 1000L)))
    } finally q.stop()
  }

  test("stateless pipeline stages (redact + weighted mix) apply identically on a stream") {
    // the admission stages are pure per-row projections/predicates, so
    // the SAME Column expressions run under readStream with no state,
    // no watermark, and per-micro-batch output equal to the batch run
    import graft.functions.TextFunctions
    import graft.operators.Sampling
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "keepsrc" else "dropsrc", s"id $i mail u$i@x.io"))
    val weights = Map("keepsrc" -> 600000L, "dropsrc" -> 0L)
    def stage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.filter(Sampling.mixKeep($"id", $"src", weights, 0L))
        .select($"id",
          TextFunctions.redact($"text",
            Seq(TextFunctions.EmailRe, TextFunctions.DigitRunRe), "<X>").as("clean"))

    val batch = stage(rows.toDF("id", "src", "text"))
      .as[(Long, String)].collect().toSet
    val in = MemoryStream[(Long, String, String)]
    val q = stage(in.toDF().toDF("id", "src", "text"))
      .writeStream.format("memory").queryName("stateless_stage")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows.take(120): _*)
      q.processAllAvailable()
      in.addData(rows.drop(120): _*)
      q.processAllAvailable()
      val streamed = spark.table("stateless_stage")
        .as[(Long, String)].collect().toSet
      assert(streamed === batch)
      assert(batch.nonEmpty && batch.forall(_._2.contains("<X>")))
      assert(batch.forall { case (id, _) => id % 2 == 0 })
    } finally q.stop()
  }

  test("semDedupStream: static-codebook assignment + in-order arrivals match batch semDedup") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.SemDedup
    // the SemDedupSpec corpus: two orthogonal groups, one scaled-copy
    // near-dup (cosine 1) in each
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.1f)),
      (11L, Seq(1.05f, 0.0f, 0.105f)),
      (12L, Seq(0.9f, 0.1f, 0.0f)),
      (20L, Seq(0.0f, 1.0f, 0.1f)),
      (21L, Seq(0.0f, 1.05f, 0.105f)),
      (22L, Seq(0.1f, 0.9f, 0.0f)))
    val codebook = SemDedup.lloydCentroids(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 2, iters = 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val out = StreamingOps.semDedupStream(spark,
      in.toDF().toDF("vec_id", "embedding"), codebook,
      minCosineMicro = 990000L)
    val q = out.toDF("vec_id", "cluster", "kept").writeStream
      .format("memory").queryName("semdedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // id-order arrival, one micro-batch per doc => first-wins ==
      // batch smallest-id-survives
      corpus.foreach { row => in.addData(row); q.processAllAvailable() }
      val got = spark.table("semdedup_stream")
        .as[(Long, Long, Long)].collect().toSet
      val batch = SemDedup.semDedup(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 2, minCosineMicro = 990000L)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
      assert(got.count(_._3 == 0L) == 2, s"exactly the two copies drop: $got")
    } finally q.stop()
  }

  test("adcTopKStream: streamed queries against the static coded corpus match batch adcTopK") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    // the PqSpec corpus: two tight groups per subspace half
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
      .toDF("vec_id", "embedding")
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2)
    val coded = Pq.encodeWith(corpus, "vec_id", "embedding", 4, cbs)
      .select(col("vec_id"), col("code0"), col("code1"))
    val queries = Seq(
      (100L, Seq(1.0f, 0.05f, 0.05f, 1.0f), ts("2024-01-01 10:00:00")),
      (200L, Seq(5.0f, 5.05f, 5.05f, 5.0f), ts("2024-01-01 10:01:00")))
    val in = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingOps.adcTopKStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), coded, cbs,
      dim = 4, topK = 3, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("adc_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      queries.foreach { row => in.addData(row); q.processAllAvailable() }
      // advance the watermark past both query windows to finalize
      in.addData((999L, Seq(0.0f, 0.0f, 0.0f, 0.0f), ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("adc_stream")
        .filter($"query_id" =!= 999L)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Pq.adcTopK(
        queries.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding"),
        coded, cbs, dim = 4, topK = 3, "vec_id", "embedding")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
      assert(got.size == 6, s"two queries × top-3: $got")
    } finally q.stop()
  }

  test("ivfPqTopKStream: probe-bounded streamed search matches batch ivfPqCandidates") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
      .toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_stream_spec"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 2)
    val queries = Seq(
      (100L, Seq(1.0f, 0.05f, 0.05f, 1.0f), ts("2024-01-01 10:00:00")),
      (200L, Seq(5.0f, 5.05f, 5.05f, 5.0f), ts("2024-01-01 10:01:00")))
    val in = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingOps.ivfPqTopKStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), path,
      dim = 4, topK = 3, probes = 2, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ivfpq_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      queries.foreach { row => in.addData(row); q.processAllAvailable() }
      in.addData((999L, Seq(0.0f, 0.0f, 0.0f, 0.0f), ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("ivfpq_stream")
        .filter($"query_id" =!= 999L)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Pq.ivfPqCandidates(
        queries.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding"),
        path, dim = 4, topK = 3, probes = 2, "vec_id", "embedding")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
      assert(got.size == 6, s"two queries × top-3: $got")
      // multi-assignment replicas min-merged: no duplicate neighbor per query
      val pairs = got.toSeq.map(r => (r._1, r._3))
      assert(pairs.distinct.size == pairs.size)
    } finally q.stop()
  }

  test("ivfPqTopKStream over a REBALANCED tree: the maintenance ladder composes with the twin") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
      .toDF("vec_id", "embedding")
    // build standing on a subset, append the rest, re-cut the cells —
    // the stream must serve the rebalanced tree like any other index
    val standing = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_stream_rebal_standing"
    Pq.buildIvfPqIndex(corpus.filter($"vec_id" =!= 2L && $"vec_id" =!= 12L),
      "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2,
      centroids = 2, path = standing, assignments = 2)
    Pq.appendIvfPqIndex(corpus.filter($"vec_id" === 2L || $"vec_id" === 12L),
      "vec_id", "embedding", standing)
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_stream_rebal"
    Pq.rebalanceIvfPqIndex(corpus, "vec_id", "embedding", standing, path)
    val queries = Seq(
      (100L, Seq(1.0f, 0.05f, 0.05f, 1.0f), ts("2024-01-01 10:00:00")),
      (200L, Seq(5.0f, 5.05f, 5.05f, 5.0f), ts("2024-01-01 10:01:00")))
    val in = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingOps.ivfPqTopKStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), path,
      dim = 4, topK = 3, probes = 2, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ivfpq_stream_rebal")
      .outputMode(OutputMode.Append()).start()
    try {
      queries.foreach { row => in.addData(row); q.processAllAvailable() }
      // a late arrival advances the watermark so the two queries emit
      in.addData((999L, Seq(0.0f, 0.0f, 0.0f, 0.0f), ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("ivfpq_stream_rebal")
        .filter($"query_id" =!= 999L)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Pq.ivfPqCandidates(
        queries.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding"),
        path, dim = 4, topK = 3, probes = 2, "vec_id", "embedding")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === batch, s"stream $got != batch $batch")
      assert(got.size == 6, s"two queries × top-3: $got")
    } finally q.stop()
  }

  test("ivfPqSearchWriter: per-batch search matches batch candidates and prunes to probed cells") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
      .toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_searchwriter_spec"
    // assignments = 1 so the two cells hold DISJOINT file sets and the
    // per-batch pruning is observable as a 1-of-2 partition count
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 1)
    val queries = Seq(
      (100L, Seq(1.0f, 0.05f, 0.05f, 1.0f)),
      (200L, Seq(5.0f, 5.05f, 5.05f, 5.0f)))
    val got = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val parts = scala.collection.mutable.ArrayBuffer[Int]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqSearchWriter(
      in.toDF().toDF("vec_id", "embedding"), path,
      dim = 4, topK = 3, probes = 1) { (res, _) =>
      got ++= res.as[(Long, Long, Long, Long)].collect()
      // the collect above finalized the adaptive plan; unwrap AQE to
      // reach the codes scan (the PlanAuditSpec idiom)
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val root = res.queryExecution.executedPlan
      val finalPlan = root.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root)
      parts ++= finalPlan.collect {
        case f: FileSourceScanExec if f.toString.contains("codes") =>
          f.selectedPartitions.partitionCount
      }
    }.start()
    // one query per micro-batch — each probes exactly one cell
    try queries.foreach { row => in.addData(row); q.processAllAvailable() }
    finally q.stop()
    // parity with the batch plan (and, transitively, with the
    // continuous twin — its batch parity is pinned two tests up)
    val batch = Pq.ivfPqCandidates(queries.toDF("vec_id", "embedding"),
      path, dim = 4, topK = 3, probes = 1, "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.toSet === batch, s"stream $got != batch $batch")
    // the batch path's STATIC pruning survived the stream: each
    // micro-batch's codes scan read exactly its one probed cell of
    // the two on disk (the continuous twin reads both every batch)
    assert(parts.nonEmpty && parts.forall(_ == 1),
      s"expected 1 of 2 cell partitions read per micro-batch, got $parts")
    // scan-budget mode: the same sink obeying the q172 search_mode
    // alarm — a huge budget probes every cell, matching the batch
    // budget walk on the same arrivals
    val gotB = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val inB = MemoryStream[(Long, Seq[Float])]
    val qB = StreamingOps.ivfPqSearchWriter(
      inB.toDF().toDF("vec_id", "embedding"), path,
      dim = 4, topK = 3, probes = 1,
      scanBudget = Some(Long.MaxValue)) { (res, _) =>
      gotB ++= res.as[(Long, Long, Long, Long)].collect()
    }.start()
    try queries.foreach { row => inB.addData(row); qB.processAllAvailable() }
    finally qB.stop()
    val batchB = Pq.ivfPqCandidatesBudget(queries.toDF("vec_id", "embedding"),
      path, dim = 4, topK = 3, scanBudget = Long.MaxValue,
      "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotB.toSet === batchB, s"budget stream $gotB != batch $batchB")
  }

  test("ivfPqSearchWriter adaptive: a skewed append mid-stream flips the walk, no sink restart") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    // 8 well-separated one-item clusters → 8 balanced cells (skew
    // 1000); the q172 skew alarm needs max > 4× mean, which needs
    // > 4 occupied cells (skew_milli ≤ 1000·occupied by construction)
    val corpus = (0 until 8).map { i =>
      (i.toLong, Seq(10f * i, 10f * i, 10f * i, 10f * i))
    }.toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_adaptive_spec"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 8, path = path, assignments = 1)
    assert(Pq.occupancyAudit(spark, path).collect().head
      .getAs[String]("search_mode") == "fixed_probes")
    // the hot batch: 100 arrivals inside cluster 0's cell → cell 0
    // holds 101 of 108 codes, skew 101·8·1000/108 = 7481 > 4000
    val hot = (0 until 100).map { i =>
      (1000L + i, Seq(0.01f * i, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val query = Seq((500L, Seq(0.1f, 0.05f, 0.05f, 0.1f)))
    val probes = 2
    val got = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Long, String)]]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqSearchWriter(
      in.toDF().toDF("vec_id", "embedding"), path,
      dim = 4, topK = 3, probes = probes, adaptive = true) { (res, bid) =>
      got(bid) = res.as[(Long, Long, Long, Long, String)].collect().toSeq
    }.start()
    try {
      // arrival 1: balanced partition → the election says fixed probes
      in.addData(query.head); q.processAllAvailable()
      // the skewed append lands while the SAME query keeps running
      Pq.appendIvfPqIndex(hot, "vec_id", "embedding", path,
        batchTag = Some("hotbatch"))
      assert(Pq.occupancyAudit(spark, path).collect().head
        .getAs[String]("search_mode") == "scan_budget")
      // arrival 2: the per-batch audit read flips the walk
      in.addData(query.head); q.processAllAvailable()
    } finally q.stop()
    val (first, second) = (got(got.keys.min), got(got.keys.max))
    assert(got.size == 2 && first.nonEmpty && second.nonEmpty, got)
    assert(first.forall(_._5 == "fixed_probes") &&
      second.forall(_._5 == "scan_budget"),
      s"expected fixed_probes then scan_budget on the same running " +
        s"query, got $got")
    // row parity for the flipped batch: it must equal the batch
    // budget walk under the SIZED budget the sink derives from the
    // live audit (probes · mean occupancy rows per query)
    val audit = Pq.occupancyAudit(spark, path)
      .select(col("n_codes"), col("n_cells_occupied")).collect().head
    val sized = Pq.sizeScanBudget(spark, path,
      math.max(1L, probes * (audit.getLong(0) / audit.getLong(1))))
    val want = Pq.ivfPqCandidatesBudget(query.toDF("vec_id", "embedding"),
        path, dim = 4, topK = 3, scanBudget = sized, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(second.map(t => (t._1, t._2, t._3, t._4)).toSet == want,
      s"budget-mode batch $second != $want")
  }

  test("ivfPqSearchWriter adaptive width rule: the recall target re-sizes the rerank width as the corpus grows") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    // the flip test's corpus: 8 balanced one-item cells, then a hot
    // 100-row append — the width rule must follow the corpus size
    // (8 items → width 3 = the topK floor; 108 items → width 4) on
    // the same running query, no sink edit
    val corpus = (0 until 8).map { i =>
      (i.toLong, Seq(10f * i, 10f * i, 10f * i, 10f * i))
    }.toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_width_spec"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 8, path = path, assignments = 1)
    val hot = (0 until 100).map { i =>
      (1000L + i, Seq(0.01f * i, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val query = Seq((500L, Seq(0.1f, 0.05f, 0.05f, 0.1f)))
    val target = 500L
    assert(Pq.sizeRerankWidth(8L, target, minWidth = 3L) == 3L)
    assert(Pq.sizeRerankWidth(108L, target, minWidth = 3L) == 4L)
    val widths = scala.collection.mutable.ArrayBuffer[Long]()
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqSearchWriter(
      in.toDF().toDF("vec_id", "embedding"), path,
      dim = 4, topK = 3, probes = 2, adaptive = true,
      recallTargetMilli = Some(target)) { (res, _) =>
      val rows = res.collect()
      widths ++= rows.map(_.getAs[Long]("rerank_width")).distinct
      got(widths.last) =
        rows.map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("neighbor_id"))).toSet
    }.start()
    try {
      in.addData(query.head); q.processAllAvailable()
      Pq.appendIvfPqIndex(hot, "vec_id", "embedding", path,
        batchTag = Some("hotw"))
      in.addData(query.head); q.processAllAvailable()
    } finally q.stop()
    assert(widths.toSeq == Seq(3L, 4L),
      s"expected the sized width to grow 3 -> 4 with the corpus, got $widths")
    // row parity at the sized width: batch twin at topK = 4 under the
    // same elected walk (the appended tree is skewed -> budget mode)
    val audit = Pq.occupancyAudit(spark, path)
      .select(col("n_codes"), col("n_cells_occupied")).collect().head
    val sized = Pq.sizeScanBudget(spark, path,
      math.max(1L, 2 * (audit.getLong(0) / audit.getLong(1))))
    val want = Pq.ivfPqCandidatesBudget(query.toDF("vec_id", "embedding"),
        path, dim = 4, topK = 4, scanBudget = sized, "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(got(4L) == want, s"${got(4L)} != $want")
  }

  test("ivfPqAppendSink: streamed micro-batch appends == one batch append (bit-equal codes)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)))
      .toDF("vec_id", "embedding")
    val arrivals = Seq(
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
    def build(p: String): Unit =
      Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
        k = 2, iters = 2, centroids = 2, path = p, assignments = 2)
    // streamed: one arrival per micro-batch through the sink
    val streamed = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_sink_stream"
    build(streamed)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), streamed).start()
    try arrivals.foreach { row => in.addData(row); q.processAllAvailable() }
    finally q.stop()
    // batch twin: the same rows appended in one call
    val batched = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_sink_batch"
    build(batched)
    Pq.appendIvfPqIndex(arrivals.toDF("vec_id", "embedding"),
      "vec_id", "embedding", batched)
    def codes(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(codes(streamed) == codes(batched))
    assert(codes(streamed).size == 12, "4 standing + 2 appended, x2 assignments")
  }

  test("ivfPqAppendSink fragmentation trips the file audit; compaction repairs it bit-equal") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_sink_frag"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 2)
    // 8 single-row micro-batches — the sink's own write pattern:
    // every batch scatters a tagged part file into each cell its
    // rows assign to (x2 assignments here = 2 cells per batch)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), path).start()
    try (1L to 8L).foreach { i =>
      in.addData((20L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f)))
      q.processAllAvailable()
    } finally q.stop()
    val fragAudit = Pq.fileAudit(spark, path).collect().head
    assert(fragAudit.getAs[String]("decision") == "compact",
      s"8 micro-batches must fragment past 4x cells: $fragAudit")
    def codes(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = codes(path)
    val cpt = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_sink_frag_cpt"
    Pq.compactIvfPqIndex(spark, path, cpt)
    assert(codes(cpt) == before, "compaction must change no rows")
    assert(Pq.fileAudit(spark, cpt).collect().head
      .getAs[String]("decision") == "keep")
    // the streaming idempotence contract survives compaction: a
    // replayed micro-batch (checkpoint retry re-delivers batchId 0)
    // still short-circuits on its carried marker
    Pq.appendIvfPqIndex(
      Seq((21L, Seq(1.01f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cpt, batchTag = Some("b0"))
    assert(codes(cpt) == before,
      "a replayed streaming batch must no-op on the compacted tree")
  }

  test("ivfPqAppendSink with a store: streamed lockstep ingest == one batch pair; replay no-ops; store cadence surfaces") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Pq, VectorStore}
    import org.apache.hadoop.fs.Path
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)))
      .toDF("vec_id", "embedding")
    val arrivals = Seq(
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    def build(p: String): Unit = {
      if (fs.exists(new Path(p))) fs.delete(new Path(p), true)
      Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
        k = 2, iters = 2, centroids = 2, path = p, assignments = 2)
    }
    // streamed: each micro-batch lands in BOTH artifacts through the
    // sink's lockstepAppend (store first, tag = b<batchId>)
    val streamedIdx = s"${sys.props("java.io.tmpdir")}/graft_lockstep_sink_idx"
    build(streamedIdx)
    val storeKey = "graft#lockstep_sink_stream"
    VectorStore.ensure(spark, storeKey, corpus, "vec_id", "embedding")
    val elections = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), streamedIdx,
      storeCorpus = Some(storeKey),
      storeCadence = Some { (row, batchId) =>
        val r = row.collect().head
        elections += ((batchId, r.getAs[String]("decision"),
          r.getAs[Long]("n_batches")))
      }).start()
    try arrivals.foreach { row => in.addData(row); q.processAllAvailable() }
    finally q.stop()
    // batch twin: one composed lockstepAppend of the same rows
    val batchIdx = s"${sys.props("java.io.tmpdir")}/graft_lockstep_batch_idx"
    build(batchIdx)
    val batchKey = "graft#lockstep_sink_batch"
    VectorStore.ensure(spark, batchKey, corpus, "vec_id", "embedding")
    VectorStore.lockstepAppend(spark, batchKey, batchIdx,
      arrivals.toDF("vec_id", "embedding"), "vec_id", "embedding",
      batchTag = "one")
    def codes(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def storeRows(k: String) = spark.table(VectorStore.tableName(k))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(codes(streamedIdx) == codes(batchIdx),
      "streamed index half must be bit-equal to the batch pair's")
    assert(storeRows(storeKey) == storeRows(batchKey),
      "streamed store half must be row-equal to the batch pair's")
    // replay: a checkpoint retry re-delivers batchId 0 — BOTH halves
    // short-circuit on their markers, nothing double-applies
    VectorStore.lockstepAppend(spark, storeKey, streamedIdx,
      Seq(arrivals.head).toDF("vec_id", "embedding"), "vec_id", "embedding",
      batchTag = "b0")
    assert(storeRows(storeKey) == storeRows(batchKey), "store replay must no-op")
    assert(codes(streamedIdx) == codes(batchIdx), "index replay must no-op")
    // the store-cadence election surfaced once per applied batch, on
    // the store's own growing history
    assert(elections.map(e => (e._1, e._3)) == Seq((0L, 1L), (1L, 2L)),
      s"one election per batch with the marker count growing: $elections")
    assert(elections.forall(_._2 == "rebuild_within"),
      s"two one-file appends against a 4-bucket store sit inside the " +
        s"factor-4 line with a finite horizon: $elections")
  }

  test("lockstep sink: the store-cadence election flips to rebuild_now under fragmenting appends") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Pq, VectorStore}
    import org.apache.hadoop.fs.Path
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val idx = s"${sys.props("java.io.tmpdir")}/graft_storecad_idx"
    val idxPath = new Path(idx)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(idxPath)) fs.delete(idxPath, true)
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = idx, assignments = 1)
    val key = "graft#storecad_sink"
    VectorStore.ensure(spark, key, corpus, "vec_id", "embedding")
    // 4 test buckets -> the factor-4 rebuild line is 16 scanned files;
    // the base build ships <= 4 and every single-row batch adds one,
    // so the election must walk rebuild_within -> rebuild_now and the
    // appender (the sink) is the process that surfaces the walk
    val elections = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), idx,
      storeCorpus = Some(key),
      storeCadence = Some { (row, batchId) =>
        val r = row.collect().head
        elections += ((batchId, r.getAs[String]("decision"),
          r.getAs[Long]("batches_to_threshold")))
      }).start()
    try (1L to 16L).foreach { i =>
      in.addData((100L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(elections.size == 16, elections)
    assert(elections.head._2 == "rebuild_within", elections.head)
    val horizons = elections.filter(_._2 == "rebuild_within").map(_._3)
    assert(horizons.zip(horizons.drop(1)).forall { case (a, b) => b <= a },
      s"forecast horizon grew under steady appends: $elections")
    assert(elections.last._2 == "rebuild_now", elections.last)
    val flipAt = elections.indexWhere(_._2 == "rebuild_now")
    assert(flipAt > 0 && elections.drop(flipAt).forall(_._2 == "rebuild_now"),
      s"election must not flap back after the flip: $elections")
    // the surfaced election is the batch operator's own, and the
    // standing audit agrees the line is crossed
    assert(VectorStore.storeCadence(spark, key).collect().head
      .getAs[String]("decision") == "rebuild_now")
    assert(VectorStore.storeAudit(spark, key).collect().head
      .getAs[String]("decision") == "rebuild")
  }

  test("ivfPqAppendSink cadence telemetry: election surfaces per batch and flips to compact_now") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pq
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_sink_cadence"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 2)
    // the appender IS the process that knows when files land: each
    // micro-batch hands the cadence election to the callback
    val elections = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), path,
      cadence = Some { (row, batchId) =>
        val r = row.collect().head
        elections += ((batchId, r.getAs[String]("decision"),
          r.getAs[Long]("batches_to_threshold")))
      }).start()
    try (1L to 8L).foreach { i =>
      in.addData((20L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(elections.size == 8, elections)
    // growing fragmentation: the forecast horizon never grows, and
    // the election flips compact_within -> compact_now before the
    // stream ends (the fragmentation test pins that 8 batches cross)
    val horizons = elections.filter(_._2 == "compact_within").map(_._3)
    assert(horizons.zip(horizons.drop(1)).forall { case (a, b) => b <= a },
      s"forecast horizon grew under steady appends: $elections")
    assert(elections.head._2 == "compact_within", elections.head)
    assert(elections.last._2 == "compact_now", elections.last)
    val flipAt = elections.indexWhere(_._2 == "compact_now")
    assert(elections.drop(flipAt).forall(_._2 == "compact_now"),
      s"election must not flap back after the flip: $elections")
    // the surfaced election is the batch operator's own
    assert(Pq.compactionCadence(spark, path).collect().head
      .getAs[String]("decision") == "compact_now")
  }

  test("semDedupStream: cluster-width cap bounds state; beyond it arrivals pass unchecked") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.SemDedup
    val base = Seq((0L, Seq(1.0f, 0.0f, 0.0f)))
    val codebook = SemDedup.lloydCentroids(
      base.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 1, iters = 0)
    val in = MemoryStream[(Long, Seq[Float])]
    val out = StreamingOps.semDedupStream(spark,
      in.toDF().toDF("vec_id", "embedding"), codebook,
      minCosineMicro = 990000L, maxClusterWidth = 2)
    val q = out.toDF("vec_id", "cluster", "kept").writeStream
      .format("memory").queryName("semdedup_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      // 0 and 1 fill the width-2 state (1 is a dup of 0 — dropped but
      // retained as a comparator, the batch-parity rule); 2 is
      // near-identical to 0 but state is full, so it is only compared
      // against the retained prefix {0, 1} — still caught; 3 is far
      // from both retained members and kept even though it duplicates
      // the UNRETAINED... nothing (orthogonal) — kept
      in.addData((0L, Seq(1.0f, 0.0f, 0.0f))); q.processAllAvailable()
      in.addData((1L, Seq(1.0f, 0.0f, 0.001f))); q.processAllAvailable()
      in.addData((2L, Seq(1.0f, 0.001f, 0.0f))); q.processAllAvailable()
      in.addData((3L, Seq(0.0f, 1.0f, 0.0f))); q.processAllAvailable()
      val kept = spark.table("semdedup_cap")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(kept === Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 1L), s"$kept")
    } finally q.stop()
  }

  test("winnowDecontamStream: contaminated arrivals flagged with q148's exact shared-fp counts") {
    implicit val sqlCtx = spark.sqlContext
    // eval doc plants a 12-token run; 101 embeds it mid-doc (≥ 7-token
    // shared run ⇒ winnowing GUARANTEES a shared fingerprint at any
    // alignment), 102 shares nothing
    val evalRun = (1 to 12).map(i => s"e${i}v").mkString(" ")
    val evalDocs = Seq((900L, evalRun)).toDF("doc_id", "text")
    val contaminated = "lead tokens here then " + evalRun + " trailing bits"
    val clean = (1 to 20).map(i => s"c${i}x").mkString(" ")
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.winnowDecontamStream(
      in.toDF().toDF("doc_id", "text", "ts"), evalDocs, "ts")
    val q = out.writeStream.format("memory").queryName("winnow_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (101L, contaminated, ts("2024-01-01 10:00:00")),
        (102L, clean, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // at-least-once replay of 101 within the watermark horizon: the
      // doc_id dedup must swallow it, or the count would double
      in.addData((101L, contaminated, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData((103L, clean + " later", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val rows = spark.table("winnow_stream").as[(Long, Long)].collect()
      assert(rows.length == rows.toMap.size,
        s"exactly one finalized row per doc (replay must not re-emit): ${rows.toSeq}")
      val got = rows.toMap
      // batch twin: the q148 shape on the same two relations
      val batch = {
        import graft.operators.Winnow
        val ev = Winnow.fingerprints(evalDocs, "doc_id", "text")
          .select(col("fp")).distinct()
        Winnow.fingerprints(
            Seq((101L, contaminated), (102L, clean)).toDF("doc_id", "text"),
            "doc_id", "text")
          .join(ev, Seq("fp"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
          .as[(Long, Long)].collect().toMap
      }
      assert(batch.contains(101L) && !batch.contains(102L), s"batch: $batch")
      assert(got === batch,
        s"stream flags must equal the batch q148 computation: $got vs $batch")
    } finally q.stop()
  }

  test("ingestPipelineStream: restart from checkpoint recovers dedup state, watermark, and emits exactly once") {
    // The one durability property the keyed-state paths pin that the
    // COMPOSED ingest pipeline didn't: kill the query mid-stream and
    // restore from its checkpoint across a batch boundary. Recovery
    // must carry (a) the within-stream dedup hash state — a dup of a
    // PRE-restart doc arriving after the restart is still dropped;
    // (b) the watermark — the pre-restart doc's window closes exactly
    // once, after the restart, with no replayed emission; (c) novel
    // post-restart docs flow through. The memory sink refuses
    // checkpoint recovery by design, so the ledger is a foreachBatch
    // append into a concurrent buffer — the fault-tolerant sink shape
    // a real ingest ledger uses.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{lit => l}
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ingest_ckpt").toString
    val corpusText = (1 to 60).map(i => s"k${i % 13}m${(i * 3) % 7}").mkString(" ")
    val corpus = Seq((900L, corpusText)).toDF("doc_id", "text")
    def quality(t: String): Long =
      graft.SparkSpec.session.range(1).select(
        graft.functions.TextFunctions.qualityScore(l(t))).head().getLong(0)
    val good = (1 to 80).map(i => if (i % 3 == 0) "the" else s"g${i}x").mkString(" ")
    val novel = (1 to 80).map(i => if (i % 3 == 0) "the" else s"n${i}y").mkString(" ")
    assert(quality(good) >= 300 && quality(novel) >= 300)
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.ingestPipelineStream(
      in.toDF().toDF("doc_id", "text", "ts"), corpus, "ts")
    val ledger = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = out.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select($"doc_id", $"dup_chunk_ppm").collect()
          .foreach(r => ledger.add((r.getLong(0), r.getLong(1))))
      }
      .start()
    var q = start()
    try {
      in.addData(
        (1L, good, ts("2024-01-01 10:00:00")),
        (2L, good, ts("2024-01-01 10:01:00"))) // within-stream dup of 1
      q.processAllAvailable()
      // kill mid-stream: nothing has emitted yet (watermark below the
      // 10:00 window close), all survivor knowledge lives in the
      // checkpointed state store
      q.stop()
      assert(ledger.isEmpty, s"no window closed before the kill: $ledger")
      // data arriving while the query is down, processed on restore:
      // 6 duplicates the PRE-restart doc 1 within the watermark
      // horizon — only recovered dedup state can drop it; 7 is novel
      in.addData(
        (6L, good, ts("2024-01-01 10:10:00")),
        (7L, novel, ts("2024-01-01 10:12:00")))
      q = start()
      q.processAllAvailable()
      // advance the watermark past 11:00 → the 10:00 window finalizes
      in.addData((99L, novel + " later", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val got = ledger.toArray(Array.empty[(Long, Long)]).toSeq
      assert(got.map(_._1).sorted == Seq(1L, 7L),
        s"survivors must be 1 (first copy, pre-restart) and 7 (novel); " +
          s"2 and 6 are dups — 6 provable only via recovered state: $got")
      assert(got.count(_._1 == 1L) == 1,
        s"doc 1's window must finalize exactly once across the restart: $got")
      assert(got.forall(_._2 == 0L),
        s"neither survivor shares corpus chunks: $got")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("lifecycle soak: BOTH elections dispatched LIVE mid-stream — compaction flips the index, rebuildStore flips the store, served rows never change") {
    // round-18 verdict #5: N fragmenting micro-batches through the
    // lockstep sink with both maintenance arms actually FIRING from
    // the cadence callbacks the sink hands the deployment — index
    // compaction (compact to a fresh tree, flip the serving path) and
    // the store's rebuildStore (in-process, same JVM that computed
    // the election) — with probes pinned bit-equal around every
    // dispatch and the end state equal to a clean one-shot pair.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{AppendProtocol, Pq, VectorStore}
    import org.apache.hadoop.fs.Path
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)))
      .toDF("vec_id", "embedding")
    val arrivals = (1 to 16).map { i =>
      if (i % 2 == 0) (100L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f))
      else (100L + i, Seq(5.0f + i * 0.01f, 5.0f, 5.0f, 5.0f))
    }
    val queries = Seq(
      (900L, Seq(1.0f, 0.05f, 0.05f, 1.0f)),
      (901L, Seq(5.0f, 5.05f, 5.05f, 5.0f))).toDF("vec_id", "embedding")
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    def build(p: String): Unit = {
      if (fs.exists(new Path(p))) fs.delete(new Path(p), true)
      Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
        k = 2, iters = 2, centroids = 2, path = p, assignments = 1)
    }
    val idx = s"${sys.props("java.io.tmpdir")}/graft_soak_idx"
    build(idx)
    val key = "graft#soak_store"
    val name = VectorStore.ensure(spark, key, corpus, "vec_id", "embedding")
    def probe(p: String): Set[Seq[Any]] = {
      // the probing session is a SEPARATE reader from the ingesting
      // foreachBatch session (Spark clones it per micro-batch), and a
      // file-backed table's listing is cached per session — a serving
      // session refreshes before reading, or it serves the listing
      // from whenever it last looked (standard Spark semantics; the
      // rebuild operator itself refreshes defensively for the same
      // reason)
      spark.catalog.refreshTable(name)
      VectorStore.rerankTopK(spark.table(name), queries,
        Pq.ivfPqCandidates(queries, p, dim = 4, topK = 6, probes = 2,
          "vec_id", "embedding"), k = 4)
        .collect().map(_.toSeq).toSet
    }
    // every dispatch records (batchId, arm, probe-before == probe-after)
    val dispatched = scala.collection.mutable.ArrayBuffer[(Long, String, Boolean)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), idx,
      storeCorpus = Some(key),
      cadence = Some { (row, batchId) =>
        if (row.collect().head.getAs[String]("decision") == "compact_now") {
          val pre = probe(idx)
          // compact-and-flip, executed by the JVM that read the
          // election — the operator owns the staged tree, the lease
          // across the flip, and the crash retries (the appender is
          // this same serial thread, so nothing writes mid-flip)
          Pq.compactIvfPqIndexInPlace(spark, idx)
          dispatched += ((batchId, "compact", probe(idx) == pre))
        }
      },
      storeCadence = Some { (row, batchId) =>
        if (row.collect().head.getAs[String]("decision") == "rebuild_now") {
          val pre = probe(idx)
          VectorStore.rebuildStore(spark, key)
          dispatched += ((batchId, "rebuild", probe(idx) == pre))
        }
      }).start()
    try arrivals.foreach { row => in.addData(row); q.processAllAvailable() }
    finally q.stop()
    assert(dispatched.exists(_._2 == "compact"),
      s"the index compaction arm never fired: $dispatched")
    assert(dispatched.exists(_._2 == "rebuild"),
      s"the store rebuild arm never fired: $dispatched")
    assert(dispatched.forall(_._3),
      s"a maintenance dispatch changed served rows: $dispatched")
    // maintenance left both artifacts healthy and unleased
    assert(Pq.fileAudit(spark, idx).collect().head
      .getAs[Long]("n_orphans") == 0L)
    assert(VectorStore.storeAudit(spark, key).collect().head
      .getAs[Long]("n_orphans") == 0L)
    assert(!fs.exists(AppendProtocol.leasePath(new Path(idx))))
    assert(!fs.exists(AppendProtocol.leasePath(new Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location))))
    // end state == a CLEAN one-shot pair over the same rows: fresh
    // index built on the corpus + ONE append of every arrival (the
    // bit-equality contract), fresh store over corpus ∪ arrivals
    val cleanIdx = s"${sys.props("java.io.tmpdir")}/graft_soak_clean_idx"
    build(cleanIdx)
    Pq.appendIvfPqIndex(arrivals.toDF("vec_id", "embedding"),
      "vec_id", "embedding", cleanIdx)
    val cleanKey = "graft#soak_clean_store"
    val cleanName = VectorStore.ensure(spark, cleanKey,
      corpus.union(arrivals.toDF("vec_id", "embedding")),
      "vec_id", "embedding")
    val cleanServed = VectorStore.rerankTopK(spark.table(cleanName), queries,
      Pq.ivfPqCandidates(queries, cleanIdx, dim = 4, topK = 6, probes = 2,
        "vec_id", "embedding"), k = 4)
      .collect().map(_.toSeq).toSet
    spark.catalog.refreshTable(name)
    assert(spark.table(name).collect().map(_.toSeq).toSet ===
      spark.table(cleanName).collect().map(_.toSeq).toSet,
      s"the soaked store must hold exactly the clean pair's rows " +
        s"(dispatched: $dispatched)")
    assert(spark.read.parquet(s"$idx/codes").select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq ===
      spark.read.parquet(s"$cleanIdx/codes").select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "the soaked index must code exactly the clean pair's items")
    assert(probe(idx) === cleanServed,
      "the soaked deployment must serve exactly the clean pair's rows")
  }

  test("self-maintaining sink: autoMaintain dispatches both repairs itself — audits never finish above the line, rows equal the clean pair") {
    // the callback-less deployment: the sink reads its own elections
    // and fires compactIvfPqIndexInPlace / rebuildStore before the
    // next batch. Telemetry callbacks still see the pre-dispatch
    // election, so the `_now` arms are observable exactly when an
    // external scheduler would have had to act.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{AppendProtocol, Pq, VectorStore}
    import org.apache.hadoop.fs.Path
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
      (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
      (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)))
      .toDF("vec_id", "embedding")
    val arrivals = (1 to 16).map { i =>
      if (i % 2 == 0) (200L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f))
      else (200L + i, Seq(5.0f + i * 0.01f, 5.0f, 5.0f, 5.0f))
    }
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    def build(p: String): Unit = {
      if (fs.exists(new Path(p))) fs.delete(new Path(p), true)
      Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
        k = 2, iters = 2, centroids = 2, path = p, assignments = 1)
    }
    val idx = s"${sys.props("java.io.tmpdir")}/graft_automaint_idx"
    build(idx)
    val key = "graft#automaint_store"
    val name = VectorStore.ensure(spark, key, corpus, "vec_id", "embedding")
    val elections = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ivfPqAppendSink(
      in.toDF().toDF("vec_id", "embedding"), idx,
      cadence = Some { (row, bid) =>
        elections += ((bid, "idx", row.collect().head.getAs[String]("decision")))
      },
      storeCorpus = Some(key),
      storeCadence = Some { (row, bid) =>
        elections += ((bid, "store", row.collect().head.getAs[String]("decision")))
      },
      autoMaintain = true).start()
    try arrivals.foreach { row => in.addData(row); q.processAllAvailable() }
    finally q.stop()
    // the elections DID reach their dispatch arms (telemetry is the
    // pre-dispatch view, so the `_now` rows prove repairs fired)...
    assert(elections.exists(e => e._2 == "idx" && e._3 == "compact_now"),
      s"the index election never reached compact_now: $elections")
    assert(elections.exists(e => e._2 == "store" && e._3 == "rebuild_now"),
      s"the store election never reached rebuild_now: $elections")
    // ...and the self-maintained artifacts never FINISH above the
    // line (16 fragmenting batches would otherwise sit far past
    // factor 4 — the fragmentation spec above pins that), with no
    // stale stage trees or leases left behind
    assert(Pq.fileAudit(spark, idx).collect().head
      .getAs[String]("decision") == "keep")
    assert(VectorStore.storeAudit(spark, key).collect().head
      .getAs[String]("decision") == "keep")
    assert(!fs.exists(new Path(idx + ".compacting")))
    assert(!fs.exists(AppendProtocol.leasePath(new Path(idx))))
    // end state == the clean one-shot pair over the same rows
    val cleanIdx = s"${sys.props("java.io.tmpdir")}/graft_automaint_clean_idx"
    build(cleanIdx)
    Pq.appendIvfPqIndex(arrivals.toDF("vec_id", "embedding"),
      "vec_id", "embedding", cleanIdx)
    val cleanKey = "graft#automaint_clean_store"
    val cleanName = VectorStore.ensure(spark, cleanKey,
      corpus.union(arrivals.toDF("vec_id", "embedding")),
      "vec_id", "embedding")
    spark.catalog.refreshTable(name)
    assert(spark.table(name).collect().map(_.toSeq).toSet ===
      spark.table(cleanName).collect().map(_.toSeq).toSet,
      "the self-maintained store must hold exactly the clean pair's rows")
    assert(spark.read.parquet(s"$idx/codes").select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq ===
      spark.read.parquet(s"$cleanIdx/codes").select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "the self-maintained index must code exactly the clean pair's items")
    val queries = Seq(
      (900L, Seq(1.0f, 0.05f, 0.05f, 1.0f)),
      (901L, Seq(5.0f, 5.05f, 5.05f, 5.0f))).toDF("vec_id", "embedding")
    def served(p: String, n: String): Set[Seq[Any]] =
      VectorStore.rerankTopK(spark.table(n), queries,
        Pq.ivfPqCandidates(queries, p, dim = 4, topK = 6, probes = 2,
          "vec_id", "embedding"), k = 4)
        .collect().map(_.toSeq).toSet
    assert(served(idx, name) === served(cleanIdx, cleanName),
      "the self-maintained deployment must serve the clean pair's rows")
  }
}
