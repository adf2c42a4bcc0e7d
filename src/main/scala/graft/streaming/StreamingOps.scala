package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, Knn}

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
  *  - [[dedupDocStream]]: streaming exact dedup on content hash with
  *    watermark-bounded state — the ingest-time gate of a training-data
  *    pipeline.
  *  - [[lshCandidateStream]]: streaming MinHash-LSH near-dup candidate
  *    pairs via per-bucket keyed state — near-dup discovery at ingest
  *    without re-scanning the corpus.
  *  - [[hammingPairStream]]: streaming Hamming-banded near-dup pairs
  *    over precomputed signatures (SimHash / image dHash) — the
  *    ingest-time twin of the batch `hammingPairs`, emitting verified
  *    pairs (signatures are small enough to live in state).
  *  - [[winnowDecontamStream]]: ingest-time eval-contamination flags —
  *    per-row winnow fingerprinting probed against the static eval
  *    index (the q148/q155 relation, evaluated at arrival).
  *  - [[semDedupStream]]: streaming semantic dedup against a static
  *    Lloyd codebook — per-cluster keyed state, the ingest-time twin
  *    of the batch `SemDedup.semDedup`.
  *  - [[adcTopKStream]]: streaming ADC vector search against the
  *    standing PQ-coded corpus — static codebook literals, native
  *    per-arrival LUT build, watermark-bounded per-query heaps; the
  *    ingest-time twin of the batch `Pq.adcTopK`/q165.
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

  /** Streaming IVFADC INGEST — q170's append path as a sink: every
    * micro-batch of arriving vectors is encoded against the STANDING
    * coarse + PQ codebooks and its code files renamed into the live
    * cell partitions ([[graft.operators.Pq.appendIvfPqIndex]]).
    * Micro-batches run serially (Structured Streaming's foreachBatch
    * contract), so the single-writer-per-artifact rule holds; a
    * concurrent probe sees some prefix of the appended files — results
    * only grow, never tear. Index contents are EFFECTIVELY-ONCE under
    * replay: the micro-batch's `batchId` (stable across retries by
    * the Structured Streaming checkpoint contract) is passed as the
    * append's idempotence tag, so a replayed batch is detected by its
    * commit marker and skipped, and a crash mid-append is cleaned up
    * by the tag-prefix scan before the retry re-applies
    * ([[graft.operators.Pq.appendIvfPqIndex]]'s delivery contract).
    * That matters because the probe paths do NOT dedup beyond the
    * index contract ("≤ assignments copies per id"): for an
    * `assignments == 1` index a duplicated code row would surface as
    * a duplicate `neighbor_id` in top-k — prevented here at ingest,
    * not papered over at query. Bit-equality of the appended tree to
    * a batch append of the same rows is spec-pinned.
    *
    * `storeCorpus` (round-18, closing round-17's one silent-wrong-
    * results gap) makes the sink the full ingest TRANSACTION: the
    * index is only half of what a batch must land in — an appended
    * index re-ranked against a stale store silently DROPS the
    * appended items from every top-k (inner join; VectorStoreSpec
    * pins the shrinkage). With a store attached, each micro-batch
    * goes through [[graft.operators.VectorStore.lockstepAppend]] —
    * STORE FIRST, then index, both under the same `b<batchId>` tag —
    * so the only crash window is store-ahead (extra vectors the index
    * cannot yet name as candidates: served results stay correct),
    * never index-ahead (missing neighbors). Replay composes: each
    * half short-circuits on its own marker, so a retry after a crash
    * between the halves re-applies only the index half.
    *
    * `cadence` (round-17) closes the LAYOUT loop from the ingest
    * side: every append fragments the cell directories (the q184
    * small-files tax), and the appender is the one process that knows
    * when files landed — so after each applied batch the sink hands
    * the [[graft.operators.Pq.compactionCadence]] election
    * (`compact_now` / `compact_within` + `batches_to_threshold` /
    * `keep`) to the callback with the batch id, and the deployment's
    * scheduler books the compaction instead of discovering the tax in
    * probe latency. The election row is CACHED on
    * [[graft.operators.Pq.indexStateSignature]] (an applied append
    * moves the signature; a replay-skipped batch does not), so
    * replayed batches cost no re-listing. `storeCadence` is the same
    * loop for the store's own aging ([[graft.operators.VectorStore
    * .storeCadence]]: every append fragments the bucket layout toward
    * the rebuild line), cached on
    * [[graft.operators.VectorStore.storeStateSignature]].
    *
    * `autoMaintain` (round-19) closes the loop WITHOUT a scheduler:
    * when an election lands on its `_now` arm, the sink itself
    * dispatches the repair before the next batch —
    * [[graft.operators.Pq.compactIvfPqIndexInPlace]] for the index,
    * [[graft.operators.VectorStore.rebuildStore]] for the store —
    * on the same serial foreachBatch thread, so the dispatch holds
    * the single-writer rule for free and no append can land
    * mid-repair. Both repairs are row-preserving (spec-pinned,
    * including the repair×repair interleave), so served results
    * never change across a dispatch; both carry markers, so replay
    * idempotence survives. The callbacks still fire FIRST with the
    * election as computed (telemetry sees `compact_now`/`rebuild_now`
    * exactly when the deployment would have had to act); a
    * deployment that books repairs externally keeps
    * `autoMaintain = false` and owns the dispatch. The self-
    * maintained deployment's steady state: audits hover below the
    * factor line forever, probes never meet an aged layout
    * (StreamingOpsSpec's self-maintaining twin pins both, plus
    * end-state bit-equality to a clean one-shot pair). */
  def ivfPqAppendSink(
      stream: DataFrame,
      indexPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      cadence: Option[(DataFrame, Long) => Unit] = None,
      cadenceFactor: Long = 4L,
      storeCorpus: Option[String] = None,
      storeCadence: Option[(DataFrame, Long) => Unit] = None,
      storeCadenceFactor: Long = 4L,
      autoMaintain: Boolean = false): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(storeCadence.isEmpty || storeCorpus.nonEmpty,
      "storeCadence needs storeCorpus — there is no store to forecast")
    // micro-batches run serially on the driver: plain closure vars are
    // the cache (the ivfPqSearchWriter discipline)
    var cadSig: String = null
    var cadRow: DataFrame = null
    var storeSig: String = null
    var storeRow: DataFrame = null
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          storeCorpus match {
            case Some(corpus) =>
              graft.operators.VectorStore.lockstepAppend(
                spark, corpus, indexPath, batch.toDF(), idCol, vecCol,
                batchTag = s"b$batchId")
            case None =>
              graft.operators.Pq.appendIvfPqIndex(
                batch.toDF(), idCol, vecCol, indexPath,
                batchTag = Some(s"b$batchId"))
          }
          if (cadence.nonEmpty || autoMaintain) {
            val sig = graft.operators.Pq.indexStateSignature(spark, indexPath)
            if (sig != cadSig) {
              cadRow = graft.operators.Pq.compactionCadence(
                spark, indexPath, cadenceFactor)
              cadSig = sig
            }
            cadence.foreach(_(cadRow, batchId))
            if (autoMaintain && cadRow.collect().head
                .getAs[String]("decision") == "compact_now") {
              graft.operators.Pq.compactIvfPqIndexInPlace(spark, indexPath)
              cadSig = null // the flip rewrote the tree — re-elect fresh
            }
          }
          if (storeCadence.nonEmpty || (autoMaintain && storeCorpus.nonEmpty)) {
            val corpus = storeCorpus.get
            val sig = graft.operators.VectorStore
              .storeStateSignature(spark, corpus)
            if (sig != storeSig) {
              storeRow = graft.operators.VectorStore.storeCadence(
                spark, corpus, storeCadenceFactor)
              storeSig = sig
            }
            storeCadence.foreach(_(storeRow, batchId))
            if (autoMaintain && storeRow.collect().head
                .getAs[String]("decision") == "rebuild_now") {
              graft.operators.VectorStore.rebuildStore(spark, corpus)
              storeSig = null // the flip moved the table — re-elect fresh
            }
          }
        }
      }
  }

  /** Streaming exact dedup: keep the first-seen document per content
    * hash, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` evicts a hash once the watermark
    * passes its last occurrence + delay). The batch twin is
    * [[graft.operators.Dedup.exactSurvivors]]; at ingest scale the
    * watermark horizon — not corpus size — bounds the state store.
    *
    * Hashing the text (xxhash64) rather than keying state on the full
    * document keeps per-entry state O(1); at 64 bits the collision
    * probability across a watermark window of n docs is ~n²/2⁶⁵ —
    * an acceptable dedup false-positive rate for training-data ingest
    * (a colliding doc is dropped as a "duplicate").
    */
  def dedupDocStream(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("_content_hash", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("_content_hash")
      .drop("_content_hash")

  /** Ingest-time dedup against the STANDING corpus — the stream-static
    * twin of [[graft.operators.Dedup.dedupAgainst]] (and the streaming
    * half of the q116 incremental shape): an arriving doc is dropped
    * when its content hash already exists in the static corpus
    * relation. Structured Streaming's stream-static LEFT ANTI join
    * (stream left, static right) keeps this stateless on the stream
    * side — the static side is planned per micro-batch like any batch
    * relation, so corpus-side pruning/bucketing applies and nothing
    * lives in the state store. Compose with [[dedupDocStream]] upstream
    * for within-stream first-wins semantics; the 64-bit content-hash
    * collision analysis there applies here unchanged.
    *
    * @param corpus static relation holding already-ingested documents
    * @return the stream rows whose text is absent from the corpus
    */
  def dedupAgainstCorpusStream(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String = "text"): DataFrame = {
    val corpusHashes = corpus
      .select(xxhash64(col(textCol)).as("_content_hash")).distinct()
    stream.withColumn("_content_hash", xxhash64(col(textCol)))
      .join(corpusHashes, Seq("_content_hash"), "left_anti")
      .drop("_content_hash")
  }

  /** Ingest-time CONTENT-DEFINED chunk contamination — the streaming
    * twin of q135 ([[graft.operators.Cdc]]): each arriving document is
    * chunked per row (the fused native `CdcChunksExpr` is a pure
    * projection, so this stage is STATELESS — nothing in the state
    * store), and every chunk fingerprint is probed against the static
    * corpus's chunk relation via a stream-static LEFT OUTER join
    * (stream left — stateless per micro-batch, static side planned
    * like any batch relation so corpus pruning applies). Emits one row
    * per chunk with an `in_corpus` flag; chunk-granular because CDC
    * boundaries survive insertions, this catches a quoted/plagiarized
    * passage inside otherwise-fresh text at ingest — the streaming
    * complement of [[dedupAgainstCorpusStream]]'s whole-doc hash.
    * Downstream policy (drop doc over X% contaminated chunks)
    * composes as a watermarked per-doc aggregation.
    *
    * At deployment the corpus chunk relation is a precomputed artifact
    * of the ingest that built the corpus (the q116 convention), not
    * re-chunked per run. */
  def cdcChunkStream(
      stream: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Int = 4,
      divisor: Int = 8): DataFrame = {
    import graft.operators.Cdc
    Cdc.chunks(stream, idCol, textCol, window, divisor)
      .join(corpusChunkFps(corpus, idCol, textCol, window, divisor),
        Seq("fp"), "left_outer")
      .select(col(idCol), col("fp"), col("len"),
        coalesce(col("known"), lit(0L)).as("in_corpus"))
  }

  /** Streaming winnow DECONTAMINATION — the ingest-time twin of the
    * batch q148/q155 scan: each arriving train doc is winnow-
    * fingerprinted in place (a per-row projection — `array_distinct`
    * BEFORE the explode keeps the fp set per doc, so no stream-side
    * dedup state is needed) and probed against the STATIC eval-suite
    * fingerprint index via a stream-static inner join (stateless);
    * the per-doc shared-fp count is the one stateful step — a
    * watermark-bounded tumbling-window aggregation (the
    * [[ingestPipelineStream]] stage-4 discipline), finalized
    * append-mode within ≤ 2× the configured delay. Emits
    * `(doc_id, n_shared_fps)` per CONTAMINATED arrival — exactly
    * q148's relation, evaluated at ingest instead of by corpus
    * rescan. Eval-side fps are computed batch-side once per query
    * start (a deployment reads the q155 parquet index here — same
    * relation).
    *
    * At-least-once sources replay rows: a redelivered doc would pair
    * its whole fp set with the index again and double its count, so
    * arrivals are deduplicated by `doc_id` FIRST (watermark-bounded
    * state, first delivery wins — the [[dedupDocStream]] contract at
    * id granularity). A replay arriving after the watermark passed
    * its first delivery is a new row by definition; the dedup horizon
    * IS the watermark horizon, as everywhere else in this module.
    */
  def winnowDecontamStream(
      stream: DataFrame,
      evalDocs: DataFrame,
      tsCol: String,
      watermarkDelay: String = "1 hour",
      k: Int = 4,
      w: Int = 4): DataFrame = {
    import graft.functions.{TextFunctions, WinnowFingerprintsExpr}
    import graft.operators.Winnow
    val evalFps = Winnow.fingerprints(evalDocs, "doc_id", "text", k, w)
      .select(col("fp")).distinct()
    stream
      .withWatermark(tsCol, watermarkDelay)
      // dropDuplicatesWithinWatermark, NOT dropDuplicates: plain
      // dropDuplicates on a non-event-time subset never evicts its
      // state (Spark only ages out dedup state when the event-time
      // column is part of the key), so doc_id state would grow with
      // the stream; the WithinWatermark variant evicts at the
      // watermark horizon — which is exactly the documented contract.
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col(tsCol),
        explode(array_distinct(WinnowFingerprintsExpr(
          TextFunctions.tokenHashArray(TextFunctions.tokens(col("text"))),
          k, w))).as("fp"))
      .join(evalFps, Seq("fp"))
      .groupBy(window(col(tsCol), watermarkDelay), col("doc_id"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .select(col("doc_id"), col("n_shared_fps"))
  }

  /** The standing corpus's distinct chunk-fingerprint relation with a
    * `known = 1` marker — the static probe side shared by
    * [[cdcChunkStream]] and [[ingestPipelineStream]] (one definition
    * of "what the corpus contains"). */
  private def corpusChunkFps(corpus: DataFrame, idCol: String,
      textCol: String, window: Int, divisor: Int): DataFrame =
    graft.operators.Cdc.chunks(corpus, idCol, textCol, window, divisor)
      .select(col("fp")).distinct()
      .withColumn("known", lit(1L))

  /** End-to-end streaming INGEST pipeline — the streaming counterpart
    * of the batch q70 composition, chaining the stages a recurring
    * crawl actually runs in arrival order:
    *
    *  1. admission screen (quality + token bounds — pure per-row
    *     projections, stateless; compose langId or any other per-row
    *     predicate upstream the same way);
    *  2. within-stream exact dedup (watermark-bounded state,
    *     [[dedupDocStream]] — first arrival wins);
    *  3. standing-corpus exact dedup (stream-static left-anti,
    *     [[dedupAgainstCorpusStream]] — stateless);
    *  4. CDC chunk-contamination annotation against the corpus's
    *     chunk relation ([[cdcChunkStream]] semantics): the arriving
    *     doc's chunks are a per-row projection (no join to get them),
    *     each probes the static corpus chunk relation (stream-static
    *     LEFT join, stateless), and the per-DOC duplicated-token ppm
    *     is a WATERMARK-BOUNDED windowed aggregation — the one
    *     stateful agg in the pipeline; tumbling windows of
    *     `watermarkDelay`, so a doc's state lives (and its ledger row
    *     finalizes, append-mode, exactly once) within ≤ 2× the
    *     configured delay of its event time.
    *
    * Emits one row per SURVIVING doc: `(doc_id, quality, n_tokens,
    * dup_chunk_ppm)` — the admission record an ingest ledger stores.
    * Stages 1/3 hold nothing in the state store; stage 2's state is
    * the watermark-bounded hash set; stage 4's is the
    * watermark-bounded per-doc partial sums. The spec pins batch
    * parity of the full composition ([[StreamingOpsSpec]]). */
  def ingestPipelineStream(
      stream: DataFrame,
      corpus: DataFrame,
      tsCol: String,
      watermarkDelay: String = "1 hour",
      minQuality: Long = 300L,
      window: Int = 4,
      divisor: Int = 8): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.Cdc
    val admitted = stream
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .filter(col("quality") >= minQuality && col("n_tokens") >= 5)
    val deduped = dedupAgainstCorpusStream(
      dedupDocStream(admitted, tsCol = tsCol, watermarkDelay = watermarkDelay),
      corpus)
    deduped
      .withColumn("packed",
        explode(Cdc.packedChunks(col("text"), window, divisor)))
      .select(col("doc_id"), col("quality"), col("n_tokens"), col(tsCol),
        Cdc.fpOf(col("packed")).as("fp"), Cdc.lenOf(col("packed")).as("len"))
      // the watermark set by dedupDocStream flows through the
      // stateless joins — redefining it here is disallowed. Window
      // size = watermarkDelay, so emission latency (and per-doc state
      // lifetime) stays within 2× the configured delay.
      .join(corpusChunkFps(corpus, "doc_id", "text", window, divisor),
        Seq("fp"), "left_outer")
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), watermarkDelay),
        col("doc_id"), col("quality"), col("n_tokens"))
      .agg(sum(when(col("known").isNotNull, col("len")).otherwise(0L))
        .as("dup_tokens"))
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        expr("(dup_tokens * 1000000) DIV n_tokens").as("dup_chunk_ppm"))
  }

  /** Streaming MinHash-LSH near-dup candidates: each arriving document
    * is banded exactly like the batch path
    * ([[graft.operators.Dedup.lshCandidates]] — same shingle hashes,
    * same signature permutations, same band keys), then per-bucket
    * keyed state remembers the ids already seen in that (band, bandHash)
    * bucket and emits a candidate pair for each new×seen collision.
    *
    * State per bucket is capped at `maxBucketWidth` ids: a hot bucket
    * (boilerplate shingles) would otherwise grow state — and pair
    * fan-out — without bound; beyond the cap new members pair only
    * against the retained prefix (recall loss on pathological buckets).
    * Bucket *count* is bounded by event-time eviction when `tsCol` is
    * given (the production configuration): the input gets a watermark
    * of `watermarkDelay`, and a bucket whose last arrival is more than
    * `bucketTtl` behind the watermark is dropped from the state store —
    * so state holds only the buckets touched within the TTL horizon,
    * not every band hash the stream has ever produced. Docs arriving
    * after their twin's bucket expired no longer pair with it (the
    * recall window IS the TTL — pick it as the dedup horizon).
    * With `tsCol = None` (tests / bounded replays) no state is ever
    * evicted and the stream must be finite.
    *
    * Pairs may repeat across buckets; dedup downstream per batch if
    * exact-once pairs matter.
    *
    * @return stream of (id1, id2) candidate pairs, id1 < id2
    */
  def lshCandidateStream(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 24,
      bands: Int = 8,
      shingleN: Int = 3,
      maxBucketWidth: Int = 64,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour",
      bucketTtl: String = "1 hour"): Dataset[(Long, Long)] = {
    import spark.implicits._
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val withMark = tsCol match {
      case Some(t) => docs.withWatermark(t, watermarkDelay)
      case None    => docs
    }
    // epoch-0 sentinel ts keeps one tuple shape for both modes; it is
    // never read in NoTimeout mode. NO cast on the real column: a Cast
    // wrapper strips the watermark metadata off the attribute and
    // EventTimeTimeout then rejects the query (withWatermark already
    // guarantees a timestamp type)
    val tsExpr = tsCol.map(col(_))
      .getOrElse(lit(new java.sql.Timestamp(0L)))
    val timeout =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    withMark
      .select(col(idCol).cast("long").as("id"), tsExpr.as("ts"),
        Dedup.shingleSet(col(textCol), shingleN).as("sh"))
      .select(col("id"), col("ts"),
        Dedup.minHashSignatureFromHashes(col("sh"), numHashes).as("sig"))
      .select(col("id"), col("ts"),
        posexplode(Dedup.lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bh")))
      .select(col("id"), col("band"), col("bh"), col("ts"))
      .as[(Long, Int, Long, java.sql.Timestamp)]
      .groupByKey(t => (t._2, t._3))
      .flatMapGroupsWithState[List[Long], (Long, Long)](
        OutputMode.Append(), timeout) {
        case (_, rows: Iterator[(Long, Int, Long, java.sql.Timestamp)],
            state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer[(Long, Long)]()
            var members = seen
            var maxTs = Long.MinValue
            rows.foreach { t =>
              if (t._4 != null && t._4.getTime > maxTs) maxTs = t._4.getTime
              val id = t._1
              if (!members.contains(id)) {
                members.foreach { m =>
                  if (m != id) out += ((math.min(m, id), math.max(m, id)))
                }
                if (members.size < maxBucketWidth) members = id :: members
              }
            }
            state.update(members)
            if (timeout == GroupStateTimeout.EventTimeTimeout && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, bucketTtl)
            out.iterator
          }
      }
  }

  /** Streaming Hamming near-dup pairs over a precomputed fixed-width
    * signature column (SimHash, image dHash) — the streaming twin of
    * [[graft.operators.Dedup.hammingPairs]], completing ingest-time
    * parity for the SimHash/image dedup family the way
    * [[lshCandidateStream]] does for MinHash. Each arriving signature
    * is sliced into the same `bands` pigeonhole keys as the batch path
    * (agreement on ≥ 1 whole slice is implied by Hamming ≤ maxHamming
    * when `maxHamming < bands`); per-bucket keyed state remembers the
    * (id, signature) pairs already seen in that (band, key) bucket.
    *
    * Unlike the MinHash stream — whose exact-Jaccard verification
    * needs shingle sets far too big for the state store — a signature
    * is 8 bytes, so state holds it and pairs are emitted ALREADY
    * VERIFIED (popcount ≤ maxHamming), not as candidates.
    *
    * Same state discipline as [[lshCandidateStream]]: bucket width
    * capped at `maxBucketWidth` members (the batch twin's
    * `maxBucketWidth` option is the same guard), bucket count bounded
    * by event-time TTL when `tsCol` is given; with `tsCol = None`
    * (tests / bounded replays) nothing evicts and the stream must be
    * finite. Pairs may repeat across bands; dedup downstream per batch
    * if exact-once pairs matter.
    *
    * @param hashed stream of (idCol, hashCol) — hashCol a long holding
    *               the low `bits` bits of the signature
    * @return stream of (id1, id2, hamming), id1 < id2, verified
    */
  def hammingPairStream(
      spark: SparkSession,
      hashed: DataFrame,
      idCol: String = "media_id",
      hashCol: String = "hash64",
      maxHamming: Int = 3,
      bits: Int = 64,
      bands: Int = 8,
      maxBucketWidth: Int = 64,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour",
      bucketTtl: String = "1 hour"): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    require(maxHamming < bands, s"banding is only complete for maxHamming < bands")
    require(bits % bands == 0, "bits must divide into bands")
    require(bits >= bands && bits <= 64, "bits must be in [bands, 64]")
    val w = bits / bands
    val mask = if (w == 64) -1L else (1L << w) - 1
    val withMark = tsCol match {
      case Some(t) => hashed.withWatermark(t, watermarkDelay)
      case None    => hashed
    }
    // epoch-0 sentinel ts keeps one tuple shape for both modes (see
    // lshCandidateStream for why the real column must NOT be cast)
    val tsExpr = tsCol.map(col(_))
      .getOrElse(lit(new java.sql.Timestamp(0L)))
    val timeout =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    withMark
      .select(col(idCol).cast("long").as("id"), col(hashCol).as("sig"),
        tsExpr.as("ts"))
      .select(col("id"), col("sig"), col("ts"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * w).bitwiseAND(mask)): _*))
          .as(Seq("band", "bk")))
      .as[(Long, Long, java.sql.Timestamp, Int, Long)]
      .groupByKey(t => (t._4, t._5))
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Long)](
        OutputMode.Append(), timeout) {
        case (_, rows: Iterator[(Long, Long, java.sql.Timestamp, Int, Long)],
            state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
            var members = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            rows.foreach { t =>
              if (t._3 != null && t._3.getTime > maxTs) maxTs = t._3.getTime
              val (id, sig) = (t._1, t._2)
              if (!members.exists(_._1 == id)) {
                members.foreach { case (mid, msig) =>
                  val h = java.lang.Long.bitCount(sig ^ msig).toLong
                  if (mid != id && h <= maxHamming)
                    out += ((math.min(mid, id), math.max(mid, id), h))
                }
                if (members.size < maxBucketWidth) members = (id, sig) :: members
              }
            }
            state.update(members)
            if (timeout == GroupStateTimeout.EventTimeTimeout && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, bucketTtl)
            out.iterator
          }
      }
  }

  /** Event-time session windows via the built-in `session_window`: a
    * session is a run of events per key with gaps < `gap`, closed by
    * inactivity — the streaming twin of the batch sessionize query
    * (same gap rule; q31 derives the same sessions with a lag/cumsum
    * window). Watermark + append mode emit each session exactly once,
    * after the watermark passes its close; state holds only sessions
    * still open within the watermark horizon — Spark's native session
    * state merge, no hand-rolled `mapGroupsWithState` needed.
    *
    * @return (key, sess_start, sess_end, sess_events) per closed session
    */
  def sessionWindowCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      gap: String = "10 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("sess_events"))
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("sess_events"))

  /** Stream–stream interval join — the streaming twin of the batch
    * range join (q42's shape): each left event matched to right events
    * of the same key whose timestamp falls in
    * `[leftTs − window, leftTs]`. Both sides carry watermarks, and the
    * join condition's time bound is what lets Spark EVICT buffered
    * rows: a right row older than `watermark − window` can never match
    * a future left row, so state is bounded by the watermark horizon ×
    * arrival rate — the stream-side analogue of the batch
    * bucketed-equi-join argument (state, like shuffle, must not grow
    * with history).
    *
    * Inner join only here: stream–stream outer joins emit nulls at
    * watermark expiry, which makes results arrival-order-dependent in
    * exactly the way this engine's determinism discipline forbids;
    * count-style "how many priors" queries belong on the batch path.
    *
    * @return left rows joined to qualifying right rows (one output row
    *         per match), with both timestamps kept
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      window: String = "10 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
      .withColumnRenamed(keyCol, s"_r_$keyCol")
    l.join(r,
      col(keyCol) === col(s"_r_$keyCol") &&
        col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL $window") &&
        col(rightTsCol) <= col(leftTsCol),
      "inner")
      .drop(s"_r_$keyCol")
  }

  /** Running per-user event statistics carried across micro-batches in
    * the state store: (user_id, events_so_far, value_cents_so_far).
    * State is one small struct per user — the 100 TB concern is key
    * CARDINALITY, so eviction is first-class: with `tsCol` given (the
    * production configuration, same pattern as [[lshCandidateStream]])
    * the input gets a watermark of `watermarkDelay` and a user idle for
    * more than `idleTtl` behind the watermark is dropped from the state
    * store — state holds only users active within the TTL horizon, not
    * every key the stream has ever carried. A user re-appearing after
    * eviction restarts from zero (the counters' scope IS the activity
    * window — pick the TTL accordingly). With `tsCol = None` (tests /
    * bounded replays) state never expires and the stream must be finite.
    */
  def runningUserStats(
      spark: SparkSession,
      events: DataFrame,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour",
      idleTtl: String = "1 hour"): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    val withMark = tsCol match {
      case Some(t) => events.withWatermark(t, watermarkDelay)
      case None    => events
    }
    // epoch-0 sentinel keeps one tuple shape; never read in NoTimeout
    // mode. NO cast on the real column — a Cast wrapper strips the
    // watermark metadata and EventTimeTimeout rejects the query
    val tsExpr = tsCol.map(col(_))
      .getOrElse(lit(new java.sql.Timestamp(0L)))
    val timeout =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    withMark
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100).cast("long").as("cents"), tsExpr.as("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update(), timeout) {
        case (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (n0, c0) = state.getOption.getOrElse((0L, 0L))
            var n = n0; var c = c0; var maxTs = Long.MinValue
            rows.foreach { case (_, cents, ts) =>
              n += 1; c += cents
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update((n, c))
            if (timeout == GroupStateTimeout.EventTimeTimeout && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, idleTtl)
            Iterator.single((user, n, c))
          }
      }
  }

  /** Index-order cosine in micro units — the same fold order as the
    * engine's `VectorDistanceExpr.cosineSimilarity`, so streaming
    * verdicts match the batch twin's at identical inputs. */
  private def cosMicro(a: Seq[Double], b: Array[Double]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0L else math.floor(1000000.0 * (dot / den)).toLong
  }

  /** Streaming SEMANTIC dedup — the ingest-time twin of
    * [[graft.operators.SemDedup.semDedup]]: each arriving vector is
    * assigned to its nearest centroid from a STATIC codebook (built
    * once from the standing corpus via
    * [[graft.operators.SemDedup.lloydCentroids]] — assignment is a
    * pure per-row projection against literals, no join, no shuffle),
    * then per-cluster keyed state remembers the vectors already seen
    * in that cluster and marks an arrival `kept = 0` when a retained
    * cluster-mate is cosine-≥-threshold near it. First-wins semantics:
    * with arrivals in id order this reproduces the batch twin's
    * smallest-id-survives verdicts exactly (spec-pinned), and — like
    * the batch side, where dropped docs still suppress later
    * near-dups of themselves — every arrival (kept or dropped) joins
    * the state up to `maxClusterWidth`.
    *
    * State per cluster is capped at `maxClusterWidth` vectors (the
    * cluster-width bound that makes SemDeDup affordable is exactly
    * what bounds this state); cluster COUNT is bounded by the
    * codebook, so unlike the banding streams no TTL is needed for the
    * key domain — `tsCol` adds event-time eviction of cold clusters
    * anyway for long-running jobs whose corpus drifts.
    *
    * @return stream of (vec_id, cluster, kept)
    */
  def semDedupStream(
      spark: SparkSession,
      vecs: DataFrame,
      centroids: Seq[(Long, Seq[Long])],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minCosineMicro: Long = 990000L,
      maxClusterWidth: Int = 1024,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour",
      clusterTtl: String = "1 hour"): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    import graft.operators.SemDedup
    require(centroids.nonEmpty, "codebook must be non-empty")
    val withMark = tsCol match {
      case Some(t) => vecs.withWatermark(t, watermarkDelay)
      case None    => vecs
    }
    val tsExpr = tsCol.map(col(_))
      .getOrElse(lit(new java.sql.Timestamp(0L)))
    val timeout =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    withMark
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"),
        SemDedup.quantizeMilli(col(vecCol)).as("mv"),
        tsExpr.as("ts"))
      .select(col("id"), col("v"),
        SemDedup.assignClusterMilli(col("mv"), centroids).as("cluster"),
        col("ts"))
      .as[(Long, Seq[Double], Long, java.sql.Timestamp)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Array[Double])], (Long, Long, Long)](
        OutputMode.Append(), timeout) {
        case (cluster: Long,
            rows: Iterator[(Long, Seq[Double], Long, java.sql.Timestamp)],
            state: GroupState[List[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
            var members = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            rows.foreach { case (id, v, _, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              if (!members.exists(_._1 == id)) {
                val dup = members.exists { case (mid, mv) =>
                  mid != id && cosMicro(v, mv) >= minCosineMicro
                }
                out += ((id, cluster, if (dup) 0L else 1L))
                if (members.size < maxClusterWidth)
                  members = (id, v.toArray) :: members
              }
            }
            state.update(members)
            if (timeout == GroupStateTimeout.EventTimeTimeout && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs, clusterTtl)
            out.iterator
          }
      }
  }

  /** Streaming ADC top-k — the ingest-time twin of
    * [[graft.operators.Pq.adcTopK]]/q165: arriving QUERY vectors are
    * searched against the STANDING coded corpus (the persisted PQ
    * index's `codes/` relation — static, re-planned per micro-batch
    * like every stream-static side in this module, so the scan reads
    * codes, not vectors). Per arrival the m ADC lookup tables are ONE
    * native fused projection against the codebook literals
    * ([[graft.functions.AdcLutsExpr]] — codebooks are literals by
    * construction, a few KB collected once at plan time, exactly the
    * batch discipline); the join with the coded side is stateless;
    * the per-query bounded top-k heap is the one stateful step — a
    * watermark-bounded tumbling-window aggregation (the
    * [[ingestPipelineStream]] stage-4 discipline), finalized
    * append-mode when the watermark passes the window.
    *
    * Batch parity: on the same query rows this emits exactly
    * `Pq.adcTopK(queries, coded, cbs, …)`'s rows (spec-pinned) — the
    * heap state merges partial heaps across micro-batches, so a query
    * whose candidates span batches still converges to the batch
    * verdict as long as its event-time window is open; the watermark
    * horizon IS the result-finality horizon, as everywhere else in
    * this module.
    *
    * @return append stream of (query_id, rank, neighbor_id, adc_dist)
    */
  def adcTopKStream(
      queries: DataFrame,
      coded: DataFrame,
      cbs: Seq[Seq[(Long, Seq[Long])]],
      dim: Int,
      topK: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import graft.operators.{SemDedup, TopK}
    require(cbs.nonEmpty, "codebooks must be non-empty")
    val m = cbs.size
    val k = cbs.map(_.map(_._1).max).max.toInt + 1
    val q = queries
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("long").as("q_id"), col(tsCol).as("__ts"),
        graft.functions.AdcLutsExpr(
          SemDedup.quantizeMilli(col(vecCol)),
          typedLit(Seq.fill(dim)(0L)), cbs, k).as("luts"))
      .withColumn("__one", lit(1))
    val dist = (0 until m).map { s =>
      element_at(col("luts"), lit(s * k) + col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    q.join(coded.withColumn("__one", lit(1)), Seq("__one"))
      .select(col("q_id"), col("__ts"), col("vec_id"), dist.as("adc"))
      .groupBy(window(col("__ts"), watermarkDelay), col("q_id"))
      .agg(TopK.topK(topK)(col("adc").cast("double"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("q_id").as("query_id"),
        posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"),
        col("n.dist").cast("long").as("adc_dist"))
  }

  /** Streaming IVFADC top-k — the PROBE-BOUNDED ingest-time twin of
    * [[graft.operators.Pq.ivfPqCandidates]]/q167, replacing
    * [[adcTopKStream]]'s full coded cross-join with the deployment
    * plan: per arriving query, coarse-probe scoring and the
    * per-(query, cell) residual LUT builds are STATELESS native
    * projections (the same [[graft.functions.AdcLutsExpr]] fused
    * loops as the batch path — the machinery is stateless per query,
    * which is why it lifts to a stream unchanged), and the scored
    * relation is a stream-static EQUI-JOIN on `c_id` against the
    * index's cell-partitioned codes, so each query row fans out to
    * its `probes` cells' codes only — |arrivals|·(probes/centroids)·
    * |corpus|/42 pairs per micro-batch where the full-scan twin pays
    * |arrivals|·|corpus| — instead of a broadcast LUT relation (the
    * batch side's query-batch budget is the micro-batch itself here).
    * What a stream CANNOT do is the batch path's static partition
    * pruning (probed cells are per-arrival, not known at plan time):
    * the static side is re-planned per micro-batch and the join
    * discards unprobed cells' rows after the scan — on a cluster,
    * dynamic file pruning on the `c_id` join key is the lever that
    * restores scan-byte pruning.
    *
    * Multi-assignment replica estimates min-merge inside the ONE
    * stateful operator ([[graft.operators.TopK.topKDistinctMin]] —
    * widened heap, dedup-by-id at finish), the same single-exchange
    * merge the batch path plans; layout (m, k, residual, assignments)
    * derives from the index's meta sidecar exactly like the batch
    * probe. Batch parity on the same arrivals is spec-pinned against
    * q167's candidate relation.
    *
    * @return append stream of (query_id, rank, neighbor_id, adc_dist)
    */
  def ivfPqTopKStream(
      queries: DataFrame,
      indexPath: String,
      dim: Int,
      topK: Int,
      probes: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import graft.operators.{Pq, SemDedup, TopK}
    val spark = queries.sparkSession
    val meta = Pq.readIvfPqMeta(spark, indexPath)
    require(meta.dim == dim,
      s"ivf-pq index at $indexPath was built at dim=${meta.dim}, searched at dim=$dim")
    val ivfCb = Pq.readIvfCb(spark, indexPath)
    val cbs = Pq.readPqCbs(spark, indexPath)
    val m = cbs.size
    val k = cbs.map(_.map(_._1).max).max.toInt + 1
    val effProbes = math.min(probes, ivfCb.size)
    val coarseK = ivfCb.map(_._1).max.toInt + 1
    val q0 = queries
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("long").as("q_id"), col(tsCol).as("__ts"),
        SemDedup.quantizeMilli(col(vecCol)).as("qmv"))
    val probed = q0
      .select(col("q_id"), col("__ts"), col("qmv"),
        graft.functions.AdcLutsExpr(col("qmv"),
          typedLit(Seq.fill(dim)(0L)), Seq(ivfCb), coarseK).as("cluts"))
      .select(col("q_id"), col("__ts"), col("qmv"),
        explode(slice(array_sort(array(ivfCb.map { case (cid, _) =>
          struct(element_at(col("cluts"), lit(cid.toInt) + 1).as("d"),
            lit(cid).as("c"))
        }: _*)), 1, effProbes)).as("cs"))
      .select(col("q_id"), col("__ts"), col("qmv"), col("cs.c").as("c_id"))
    val cellCv =
      if (meta.residual) element_at(typedLit(ivfCb.toMap), col("c_id"))
      else typedLit(Seq.fill(dim)(0L))
    val luts = probed.select(col("q_id"), col("__ts"), col("c_id"),
      graft.functions.AdcLutsExpr(col("qmv"), cellCv, cbs, k).as("luts"))
    val codes = spark.read.parquet(s"$indexPath/codes")
      .select(col("vec_id") +: col("c_id").cast("long").as("c_id") +:
        (0 until m).map(s => col(s"code$s")): _*)
    val dist = (0 until m).map { s =>
      element_at(col("luts"), lit(s * k) + col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    val heap =
      if (meta.assignments == 1) TopK.topK(topK)
      else TopK.topKDistinctMin(topK, meta.assignments)
    luts.join(codes, Seq("c_id"))
      .select(col("q_id"), col("__ts"), col("vec_id"), dist.as("adc"))
      .groupBy(window(col("__ts"), watermarkDelay), col("q_id"))
      .agg(heap(col("adc").cast("double"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("q_id").as("query_id"),
        posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"),
        col("n.dist").cast("long").as("adc_dist"))
  }

  /** Streaming IVFADC search as a foreachBatch SINK — the micro-batch
    * twin of [[ivfPqTopKStream]] that RECOVERS the batch path's static
    * partition pruning: each micro-batch of arriving queries runs the
    * batch [[graft.operators.Pq.ivfPqCandidates]] plan — probed cells
    * collected into a static partition filter, so only the probed
    * cells' FILES are read (the q167 scan shape), per-chunk LUT
    * broadcasts under the same `maxQueryBatch` budget, one heap-first
    * merge — and hands (query_id, rank, neighbor_id, adc_dist) to
    * `sink` with the batch id. The continuous twin keeps per-arrival
    * cells inside one stream-static equi-join and therefore SCANS
    * every cell file each micro-batch (its documented cost, dynamic
    * file pruning being the cluster-side mitigation); this sink pays
    * per-batch query planning instead and prunes like the batch path
    * today — the right trade when arrivals come in bursts rather than
    * a steady trickle. Stateless across batches (queries are
    * independent), so no watermark or state store: a micro-batch's
    * results are complete when its job finishes.
    *
    * `scanBudget` switches the per-batch search to the q176
    * rows-bounded walk ([[graft.operators.Pq.ivfPqCandidatesBudget]])
    * — the latency-SLO dial for a skewed index, so a streaming
    * deployment can obey the q172 `search_mode` alarm ("bounded dial
    * until the rebalance lands") without changing sinks.
    *
    * `adaptive` (round-15: q177's loop, streaming-side) makes the
    * sink obey the alarm ITSELF: at each micro-batch start it reads
    * the q172 occupancy audit of the live index — a one-row result,
    * but computing it is a real aggregation job over the codes
    * relation (a cell-count group-by; `c_id` is the partition column
    * so no code bytes decode, but every batch would still pay a scan
    * proportional to the codes file count). The index is APPENDED TO
    * while the query runs, so the election must be per-batch, not
    * per-sink-construction — yet most batches see an UNCHANGED index,
    * so the audit row is cached keyed on
    * [[graft.operators.Pq.indexStateSignature]] (meta mtime + tagged
    * append markers, two metadata reads) and the aggregation re-runs
    * only when a republish or a tagged append actually landed
    * (round-15 advice; untagged out-of-band appends are invisible to
    * the signature — they already forfeit replay safety, and the
    * streaming append sink always tags). The batch then runs in the
    * elected mode — fixed probes while the partition is balanced, the
    * budget walk once a skewed append lands, with no sink restart in
    * between.
    * The elected budget is `scanBudget` when given, else SIZED from
    * the live occupancy map ([[graft.operators.Pq.sizeScanBudget]])
    * to fixed-probe row parity on a balanced partition
    * (`probes · mean cell occupancy` rows per query — the "equal row
    * share" point the scan-budget bench prices). Each batch's result
    * carries the elected mode as a `search_mode` column, so the
    * downstream sink can log mode flips.
    *
    * `recallTargetMilli` (round-16, adaptive only) adds the WIDTH
    * dial the round-15 recall measurement identified: recall at the
    * data-bound decade is bound by the rerank width, so per batch the
    * sink sizes its candidate width with
    * [[graft.operators.Pq.sizeRerankWidth]] from the live corpus size
    * (the cached audit's `n_codes` over the meta's `assignments` —
    * no extra read) with `topK` as the floor — a deployment's recall
    * floor survives corpus growth without a sink edit, and the sized
    * width travels as a `rerank_width` column beside `search_mode`.
    *
    * What the adaptive mode deliberately does NOT re-elect per batch
    * is the q178 BIT-BUDGET verdict: that event changes only when a
    * retrained index is PUBLISHED (its instrument is a full
    * code-tuple census, not a partition-column read), and its
    * escalation target is a different artifact layout entirely (the
    * exact-vector tree q179 dispatches to). A deployment hitting
    * `bit_budget` switches sinks at index-publish time — the batch
    * dispatch (q179) is the template; per-micro-batch re-election
    * would pay a full codes scan to re-learn a verdict that cannot
    * have changed.
    */
  def ivfPqSearchWriter(
      stream: DataFrame,
      indexPath: String,
      dim: Int,
      topK: Int,
      probes: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxQueryBatch: Int = 256,
      scanBudget: Option[Long] = None,
      adaptive: Boolean = false,
      recallTargetMilli: Option[Long] = None)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(recallTargetMilli.isEmpty || adaptive,
      "recallTargetMilli sizes the rerank width per batch from the " +
        "live index state — that loop only exists in adaptive mode")
    // occupancy-audit cache: micro-batches run sequentially on the
    // driver, so plain vars captured by the foreachBatch closure are
    // the per-query state store for the elected-mode inputs
    var auditSig: String = null
    var auditRow: org.apache.spark.sql.Row = null
    var metaAssignments: Int = 1
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.Pq
          val spark = batch.sparkSession
          def budgetSearch(b: Long, k: Int) = Pq.ivfPqCandidatesBudget(
            batch.toDF(), indexPath, dim, k, b, idCol, vecCol,
            maxQueryBatch)
          def probeSearch(k: Int) = Pq.ivfPqCandidates(
            batch.toDF(), indexPath, dim, k, probes, idCol, vecCol,
            maxQueryBatch)
          val cand =
            if (adaptive) {
              // the election, re-checked per micro-batch: appends land
              // between batches, and a flipped alarm must flip THIS
              // batch's walk (q177's loop without a sink restart) —
              // but the audit aggregation itself re-runs only when
              // the tree's signature moved (see scaladoc)
              val sig = Pq.indexStateSignature(spark, indexPath)
              if (sig != auditSig) {
                auditRow = Pq.occupancyAudit(spark, indexPath)
                  .select(col("search_mode"), col("n_codes"),
                    col("n_cells_occupied"), col("max_cell")).collect().head
                metaAssignments = Pq.readIvfPqMeta(spark, indexPath)
                  .assignments
                auditSig = sig
              }
              val audit = auditRow
              val mode = audit.getString(0)
              // the WIDTH dial (round-16): recall at the data-bound
              // decade is rerank-width-bound, so a recall target
              // sizes the candidate width from the live corpus size
              // (codes / assignments — both already in hand from the
              // cached audit + meta) and the sink's recall floor
              // survives corpus growth without a sink edit; `topK`
              // is the floor, [[Pq.sizeRerankWidth]] the rule
              val width = recallTargetMilli.map { t =>
                Pq.sizeRerankWidth(
                  math.max(1L, audit.getLong(1) / math.max(1, metaAssignments)),
                  t, minWidth = topK.toLong)
              }
              val k = width.map(_.toInt).getOrElse(topK)
              val searched =
                if (mode == "scan_budget") {
                  // budget sized from the SAME audit row (its
                  // max_cell is the sizing rule's only occupancy
                  // input) — no second codes-listing per batch
                  val target = math.max(1L, probes * (audit.getLong(1) /
                    math.max(1L, audit.getLong(2))))
                  val b = scanBudget.getOrElse(
                    Pq.sizeScanBudgetFromMax(audit.getLong(3), target))
                  budgetSearch(b, k)
                } else probeSearch(k)
              val modeCol = searched.withColumn("search_mode", lit(mode))
              width.map(w => modeCol.withColumn("rerank_width", lit(w)))
                .getOrElse(modeCol)
            } else scanBudget.map(budgetSearch(_, topK))
              .getOrElse(probeSearch(topK))
          sink(cand, batchId)
        }
      }
  }
}
