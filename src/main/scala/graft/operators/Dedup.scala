package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication for large text/embedding corpora — exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Absent from the reference engine (SURVEY §2.1); part of the
  * LLM-training-data extension set. Designed scale-first:
  *
  *  - Every *signature* (shingle set, MinHash signature, SimHash bits,
  *    LSH band keys) is computed per-row with pure column expressions —
  *    zero shuffle until candidate generation.
  *  - Candidate generation is always an equi-join on a compact key
  *    (shingle hash / band key), never an all-pairs cross join, so the
  *    shuffle carries O(rows × keys), not O(rows²).
  *  - Verification (exact Jaccard / Hamming / cosine) runs only on
  *    candidate pairs.
  *
  * At 100 TB: the exact-Jaccard shingle join is the verification path;
  * MinHash-LSH ([[lshCandidates]]) is the discovery path (band keys bound
  * the join fan-out); SimHash banding ([[simHashPairs]]) is pigeonhole-
  * complete for `maxHamming < bands`.
  */
object Dedup {

  /** Explicit partition count for CPU-bound per-row stages (signature
    * hashing). An explicit count matters: a bare `repartition(col)` is
    * an AQE-optimizable shuffle, and AQE coalesces by *bytes* — a small
    * corpus with heavy per-row compute gets squeezed into one task
    * (observed: 5s → 150s swings at sf0.1). Compute cost is per ROW
    * here, not per byte, so pin full parallelism.
    */
  private def computeParallelism(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism


  /** Exact dedup: one survivor (smallest `idCol`) per identical
    * `keyCols` tuple, plus the copy count. The groupBy shuffles only
    * (key, id) after map-side partial aggregation.
    */
  def exactGroups(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup survivors: the full rows whose id won [[exactGroups]]. */
  def exactSurvivors(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val keep = exactGroups(df, keyCols, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Incremental ingest dedup — the "new crawl against the standing
    * corpus" shape: a survivor from `incoming` must be (a) the first
    * occurrence of its key WITHIN the batch ([[exactSurvivors]]) and
    * (b) absent from `existing` (one left-anti join on the key). Both
    * legs are key-partitioned shuffles; nothing is broadcast (the
    * standing corpus is by definition the big side, and the anti join
    * probes it hash-partitioned). At deployment scale the existing
    * side is the content-keyed dedup INDEX (key + survivor id), not
    * the full corpus — pass that projection in.
    */
  def dedupAgainst(
      incoming: DataFrame,
      existing: DataFrame,
      keyCols: Seq[String],
      idCol: String): DataFrame =
    exactSurvivors(incoming, keyCols, idCol)
      .join(existing.select(keyCols.map(col): _*).hint("shuffle_hash"),
        keyCols, "left_anti")

  /** Chunk-level exact dedup — the granularity between whole-document
    * ([[exactGroups]]) and near-dup shingling: documents are cut into
    * fixed non-overlapping `chunkSize`-char windows and each DISTINCT
    * chunk keeps one global survivor, the lexicographically smallest
    * (id, chunk_idx) occurrence. This is the pre-training-data shape
    * (dedup the training sequences, not the documents): boilerplate
    * shared across otherwise-distinct pages dies here while the unique
    * remainder of each page survives.
    *
    * Scale shape: chunking is a pure per-row projection
    * (`sequence` + `posexplode` + `substr`, no shuffle, total output
    * volume ≈ input text volume), and survivor election is ONE
    * map-side-partial `min` aggregation keyed by chunk content — the
    * same single-exchange shape as [[exactGroups]]. Nothing is
    * broadcast, nothing is windowed.
    *
    * @return (id, chunk_idx, chunk) — the surviving occurrences
    */
  def chunkDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 256): DataFrame = {
    val step = chunkSize.toLong
    df.select(
        col(idCol).cast("long").as("id"),
        posexplode(sequence(
          lit(1L), greatest(length(col(textCol)).cast("long"), lit(1L)), lit(step)))
          .as(Seq("pos", "start")),
        col(textCol))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col(textCol).substr(col("start").cast("int"), lit(chunkSize)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("w"))
      .select(col("w.id").as("id"), col("w.chunk_idx").as("chunk_idx"), col("chunk"))
  }

  /** Distinct hashed word-`n`-gram shingles of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingleHashes(text, n))

  /** Exact n-gram Jaccard near-dup pairs: documents sharing ≥ 1 shingle,
    * scored `floor(1e6·|A∩B| / |A∪B|)`, kept when ≥ `minJaccardMicro`.
    *
    * Shuffle = one row per (doc, distinct shingle); pairs exist only for
    * docs that truly share a shingle. Skew warning: a shingle appearing
    * in F docs fans out F² — on web-scale corpora drop ultra-frequent
    * shingles first or go through [[lshCandidates]].
    *
    * @return (id1, id2, jac_micro) with id1 < id2
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccardMicro: Long = 500000L,
      maxDocFreq: Option[Long] = None): DataFrame = {
    // repartition BEFORE the per-doc hashing: a small corpus often sits
    // in one file split, and any plan that later broadcasts or
    // single-partition-scans this relation would hash every document in
    // one task; at real scale the distribute-then-compute shape is what
    // a 1000-executor cluster runs anyway
    val sets = df.repartition(computeParallelism(df), col(idCol)).select(
      col(idCol).cast("long").as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
    // SHUFFLE_HASH: Catalyst sizes this self-join from the parquet file
    // stats, not the post-explode row count, and happily broadcasts
    // hundreds of thousands of exploded shingle rows (~10× slower here;
    // impossible at corpus scale). Both sides are the same exploded
    // relation — a partitioned hash join is the right physical plan at
    // every scale.
    maxDocFreq match {
      case None =>
        val ex = sets
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
          .hint("shuffle_hash")
        val a = ex.as("a"); val b = ex.as("b")
        a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
            col("a.n").as("na"), col("b.n").as("nb"))
          .agg(count(lit(1)).as("c"))
          .withColumn("jac_micro",
            floor(col("c") * lit(1000000.0) / (col("na") + col("nb") - col("c"))).cast("long"))
          .filter(col("jac_micro") >= minJaccardMicro)
          .select(col("id1"), col("id2"), col("jac_micro"))
      case Some(cap) =>
        // document-frequency cap: a shingle appearing in F docs fans out
        // F² pairs in the self-join, so one boilerplate shingle on a
        // web-scale corpus is one exploding task. Drop shingles with
        // doc-freq > cap from the UNIVERSE (set sizes recomputed over
        // survivors), so the score stays a true Jaccard on the filtered
        // sets and the join fan-out is bounded by cap².
        //
        // The exploded (id, s) relation feeds several consumers (the
        // freq groupBy, the filter join, the size recount, both pair-
        // join sides), so it is staged behind its own exchange on s —
        // ReuseExchange then runs the char-level shingle hashing once,
        // not once per branch. Filtered set sizes are attached to the
        // AGGREGATED pair relation (small) rather than widening every
        // exploded shuffle row.
        val ex0 = sets.select(col("id"), explode(col("sh")).as("s"))
          .repartition(computeParallelism(df), col("s"))
        val keep = ex0.groupBy(col("s")).agg(count(lit(1)).as("df_c"))
          .filter(col("df_c") <= cap)
          .select(col("s"))
        val kept = ex0.join(keep.hint("shuffle_hash"), "s").hint("shuffle_hash")
        val n = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
        val a = kept.as("a"); val b = kept.as("b")
        val common = a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
          .agg(count(lit(1)).as("c"))
        common
          .join(n.select(col("id").as("id1"), col("n").as("na")).hint("shuffle_hash"), "id1")
          .join(n.select(col("id").as("id2"), col("n").as("nb")).hint("shuffle_hash"), "id2")
          .withColumn("jac_micro",
            floor(col("c") * lit(1000000.0) / (col("na") + col("nb") - col("c"))).cast("long"))
          .filter(col("jac_micro") >= minJaccardMicro)
          .select(col("id1"), col("id2"), col("jac_micro"))
    }
  }

  /** EXACT cross-side Jaccard pairs — every (batch doc, corpus doc)
    * pair sharing ≥ 1 shingle, scored exactly like [[jaccardPairs]],
    * canonicalized `id1 < id2`. The exact counterpart of
    * [[lshDedupAgainst]]'s banded discovery, for consumers that need
    * the FULL pair set a whole-corpus run would find restricted to
    * pairs touching the batch (incremental clustering maintenance —
    * the bit-equality contract of q166 — needs exactness; ingest
    * FILTERING should keep using the banded path). The two sides must
    * be id-disjoint; the join GUARDS the worst violation (a shared id
    * pairing with its own twin rows — `a.id =!= b.id` in the join
    * condition, free on disjoint inputs) but a doc present on both
    * sides still double-counts its pairs with third docs, so
    * disjointness stays the caller's contract. Within-batch pairs
    * come from [[jaccardPairs]] on the batch alone.
    *
    * Scale shape: shingle-keyed cross-side equi-join — shuffle =
    * batch shingles + corpus shingles, fan-out bounded by real
    * per-shingle collisions (the [[jaccardPairs]] skew warning
    * applies; at saturated-shingle scale use the banded path).
    */
  def jaccardPairsAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccardMicro: Long = 500000L): DataFrame = {
    def ex(df: DataFrame) =
      df.repartition(computeParallelism(df), col(idCol))
        .select(col(idCol).cast("long").as("id"),
          shingleSet(col(textCol), shingleN).as("sh"))
        .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
        .hint("shuffle_hash")
    // The id-disjointness precondition is ENFORCED, not assumed: a
    // shared id would otherwise pair with its own twin rows (id1==id2
    // self-pairs with inconsistent na/nb) and corrupt downstream CC
    // silently. The extra conjunct is free on disjoint inputs.
    ex(batch).as("a")
      .join(ex(corpus).as("b"),
        col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
      .groupBy(
        least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"),
        when(col("a.id") < col("b.id"), col("a.n")).otherwise(col("b.n")).as("na"),
        when(col("a.id") < col("b.id"), col("b.n")).otherwise(col("a.n")).as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jac_micro",
        floor(col("c") * lit(1000000.0) / (col("na") + col("nb") - col("c"))).cast("long"))
      .filter(col("jac_micro") >= minJaccardMicro)
      .select(col("id1"), col("id2"), col("jac_micro"))
  }

  /** MinHash signature from a *precomputed* distinct-shingle-hash array
    * column: `numHashes` permutations `hᵢ(s) = ((2i+1)·s + i·1000003)
    * mod P`; element i of the result is `min hᵢ`. One fused codegen
    * loop per row ([[graft.functions.MinHashSignatureExpr]]) — the
    * interpreted-HOF formulation ([[minHashSignatureFromHashesHof]])
    * paid `numHashes` interpreted `transform`+`array_min` passes per
    * row and dominated the dedup bench.
    */
  def minHashSignatureFromHashes(shingleHashSet: Column, numHashes: Int): Column =
    graft.functions.SignatureExprs.minHashSignature(shingleHashSet, numHashes)

  /** Declarative HOF twin of [[minHashSignatureFromHashes]] — kept as
    * the executable spec of the native expression (bit-equality is
    * test-enforced; interpreted, so never in a hot path).
    */
  private[graft] def minHashSignatureFromHashesHof(shingleHashSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleHashSet, s => (s * (2 * i + 1) + lit(i * 1000003L)) % P))
    }: _*)

  /** [[minHashSignatureFromHashes]] over a text column directly — for
    * one-off use; pipelines should stage [[shingleSet]] first. */
  def minHashSignature(text: Column, numHashes: Int, shingleN: Int = 3): Column =
    minHashSignatureFromHashes(shingleSet(text, shingleN), numHashes)

  /** LSH band keys from a MinHash signature: `bands` rolling hashes of
    * `rowsPerBand` consecutive signature slots each. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      (0 until rowsPerBand).foldLeft(lit(0L)) { (h, r) =>
        (h * 131L + element_at(sig, b * rowsPerBand + r + 1)) % P
      }
    }: _*)

  /** Drop `(band, key)` buckets wider than `cap` rows from a keyed
    * banding relation before its candidate join — the batch twin of
    * [[graft.streaming.StreamingOps.lshCandidateStream]]'s per-bucket
    * state cap, and the banding analogue of [[jaccardPairs]]'s
    * document-frequency cap.
    *
    * WHY: a banding self-join's cost is Σ width² over buckets. One
    * template mega-cluster (a boilerplate page crawled a million
    * times) lands its members in ONE bucket per band and that bucket
    * alone joins 10¹² pairs — the single remaining all-pairs blow-up a
    * 100 TB corpus can trigger in these paths. Dropping the whole
    * over-wide bucket (not truncating it — truncation is
    * row-order-dependent and thus non-deterministic in batch) bounds
    * every bucket's fan-out at cap², at a recall cost confined to
    * pairs ONLY discoverable through mega-buckets: members of such a
    * cluster still pair up via any band whose bucket stays narrow, and
    * a cluster so hot that every band overflows is exactly the
    * boilerplate a curation pipeline handles by template-level rules,
    * not pairwise dedup. The drop is observable: [[lshBucketAudit]]
    * emits per-band dropped-bucket accounting under the same cap.
    *
    * One aggregation + one left-anti join, both keyed on (band, key) —
    * the same partitioning the candidate join shuffles on anyway, so
    * the cap's own cost is a partial-agged count per bucket. The wide
    * relation is corpus-derived (could hold millions of hot buckets at
    * scale), so the anti probe is shuffle-hash pinned like every other
    * corpus-derived join here.
    */
  private[operators] def dropWideBuckets(
      keyed: DataFrame,
      bandCol: String,
      keyCol: String,
      cap: Int): DataFrame = {
    require(cap >= 2, s"maxBucketWidth must be >= 2 (a 1-wide bucket joins nothing), got $cap")
    val wide = keyed.groupBy(col(bandCol), col(keyCol))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") > cap)
      .select(col(bandCol), col(keyCol))
    keyed.join(wide.hint("shuffle_hash"), Seq(bandCol, keyCol), "left_anti")
      // re-pin after the anti join: the surviving keyed relation is the
      // candidate join's input and inherits none of the pre-anti hint
      .hint("shuffle_hash")
  }

  /** MinHash-LSH candidate pairs: docs agreeing on ≥ 1 of the
    * `bands` band keys. The join key is (band index, band hash) — at
    * scale this is the discovery path: shuffle = rows × bands, with the
    * collision probability of a pair at Jaccard j being
    * `1 − (1 − j^rowsPerBand)^bands`.
    *
    * `maxBucketWidth` (recommended at corpus scale) drops (band, key)
    * buckets wider than the cap before the self-join — see
    * [[dropWideBuckets]] for the blow-up this prevents and the recall
    * contract.
    *
    * @return (id1, id2) with id1 < id2, distinct
    */
  def lshCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 24,
      bands: Int = 8,
      shingleN: Int = 3,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val keyed0 = df.repartition(computeParallelism(df), col(idCol)) // parallelize per-doc hashing (see jaccardPairs)
      .select(col(idCol).cast("long").as("id"),
        shingleSet(col(textCol), shingleN).as("sh"))
      .select(col("id"),
        minHashSignatureFromHashes(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        posexplode(lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bh")))
      .hint("shuffle_hash") // see jaccardPairs: post-explode size defeats broadcast estimates
    val keyed = maxBucketWidth.fold(keyed0)(dropWideBuckets(keyed0, "band", "bh", _))
    val a = keyed.as("a"); val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Per-band bucket-width accounting for the MinHash-LSH banding of a
    * corpus under a width cap — the observability half of
    * [[dropWideBuckets]]: what a `maxBucketWidth`-capped
    * [[lshCandidates]]/[[lshVerifiedPairs]] run over the same corpus
    * and parameters would drop, as data instead of a log line. A
    * pipeline alerts on `n_dropped`/`rows_dropped` drifting up (a new
    * boilerplate template entering the crawl) exactly like it alerts
    * on [[jaccardPairs]]'s df-cap via term-frequency profiles.
    *
    * One partial-agged groupBy per (band, key) then a tiny per-band
    * rollup — strictly cheaper than the candidate join it audits.
    *
    * @return (band, n_buckets, max_width, n_dropped, rows_dropped) —
    *         buckets counted at width > `maxBucketWidth`
    */
  def lshBucketAudit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBucketWidth: Int,
      numHashes: Int = 24,
      bands: Int = 8,
      shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    df.repartition(computeParallelism(df), col(idCol))
      .select(col(idCol).cast("long").as("id"),
        minHashSignatureFromHashes(shingleSet(col(textCol), shingleN), numHashes).as("sig"))
      .select(col("id"),
        posexplode(lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("w"))
      .groupBy(col("band").cast("long").as("band")).agg(
        count(lit(1)).as("n_buckets"),
        max(col("w")).as("max_width"),
        sum(when(col("w") > maxBucketWidth, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("w") > maxBucketWidth, col("w")).otherwise(0L)).as("rows_dropped"))
  }

  /** MinHash-LSH near-dup pairs, verified: LSH candidates re-scored with
    * exact Jaccard and kept when ≥ `minJaccardMicro`.
    *
    * Scale shape:
    *  - The per-doc shingle sets are staged ONCE behind a hash exchange
    *    on id; the band self-join and both sides of the verify join all
    *    consume that same exchange (Spark's ReuseExchange), so the
    *    char-level shingle hashing runs exactly once over the corpus.
    *  - The candidate-pair relation is joined back with *shuffle* hash
    *    equi-joins, never broadcast: candidates grow with the corpus and
    *    its near-dup density, so a driver-side broadcast bound is a
    *    scale-killer even though it happens to fit at test scale.
    *  - `maxBucketWidth` (recommended at corpus scale) drops over-wide
    *    (band, key) buckets before the candidate self-join — see
    *    [[dropWideBuckets]] for the mega-cluster blow-up this prevents
    *    and [[lshBucketAudit]] for the drop accounting.
    *
    * @return (id1, id2, jac_micro)
    */
  def lshVerifiedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 24,
      bands: Int = 8,
      shingleN: Int = 3,
      minJaccardMicro: Long = 500000L,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val par = computeParallelism(df)
    // first exchange distributes the raw text so the CPU-bound hashing
    // runs partition-parallel (see the computeParallelism note); the
    // second — keyed by id — is the materialization point every
    // downstream branch reuses
    val sets = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .repartition(par)
      .select(col("id"), shingleSet(col("text"), shingleN).as("sh"))
      .repartition(par, col("id"))
    val keyed0 = sets
      .select(col("id"), minHashSignatureFromHashes(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        posexplode(lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bh")))
      .hint("shuffle_hash") // post-explode size defeats broadcast estimates
    val keyed = maxBucketWidth.fold(keyed0)(dropWideBuckets(keyed0, "band", "bh", _))
    val a = keyed.as("a"); val b = keyed.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id1"), col("sh").as("sha")).hint("shuffle_hash"), "id1")
      .join(sets.select(col("id").as("id2"), col("sh").as("shb")).hint("shuffle_hash"), "id2")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jac_micro",
        floor(col("c") * lit(1000000.0)
          / (size(col("sha")) + size(col("shb")) - col("c"))).cast("long"))
      .filter(col("jac_micro") >= minJaccardMicro)
      .select(col("id1"), col("id2"), col("jac_micro"))
  }

  /** Incremental NEAR-dedup — the crawl-ingest shape: a batch doc is
    * dropped when LSH discovery + exact-Jaccard verification finds a
    * near-dup of it in the standing CORPUS. This is [[dedupAgainst]]
    * lifted from exact-key to near-dup semantics, and the #1 dedup
    * pass a recurring-crawl pipeline runs (new crawl vs everything
    * already ingested).
    *
    * Scale shape: both sides are corpus-scale, so NOTHING broadcasts —
    * candidate generation is the banded signature equi-join on
    * (band, band-hash) between the two keyed relations (shuffle-hash
    * pinned; only signature collisions pair up, never all-pairs);
    * verification joins the candidate pairs back to both sides'
    * shingle sets and keeps exact Jaccard ≥ threshold; the surviving
    * batch is one left-anti on the batch id.
    *
    * Each side's per-doc tokenization + shingle hashing runs ONCE: the
    * id-keyed repartition in `prep` is the materialization point, and
    * both its consumers (band-key derivation and the verify join) read
    * the same shuffle output via Spark's ReuseExchange — the identical
    * discipline as [[lshVerifiedPairs]], pinned by the PlanAuditSpec
    * q116 exchange-reuse test (>=2 ReusedExchange/ReusedQueryStage
    * nodes in the executed plan). At deployment scale the corpus-side
    * signatures and sets are precomputed artifacts of the ingest that
    * built the corpus, so an incremental run pays only the batch's
    * hashing plus the keyed joins.
    *
    * @return batch rows whose text has no verified near-dup in corpus
    */
  def lshDedupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 24,
      bands: Int = 8,
      shingleN: Int = 3,
      minJaccardMicro: Long = 500000L,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    // the width cap applies PER SIDE: a (band, key) bucket's cross-join
    // cost is |batch bucket| × |corpus bucket|, so capping each side at
    // `cap` bounds every bucket's fan-out at cap² without either side
    // needing the other's widths ([[dropWideBuckets]] contract)
    def prep(df: DataFrame): (DataFrame, DataFrame) = {
      val par = computeParallelism(df)
      val sets = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .repartition(par)
        .select(col("id"), shingleSet(col("text"), shingleN).as("sh"))
        .repartition(par, col("id"))
      val keyed0 = sets
        .select(col("id"), minHashSignatureFromHashes(col("sh"), numHashes).as("sig"))
        .select(col("id"),
          posexplode(lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bh")))
        .hint("shuffle_hash") // post-explode size defeats broadcast estimates
      (sets, maxBucketWidth.fold(keyed0)(dropWideBuckets(keyed0, "band", "bh", _)))
    }
    val (bSets, bKeys) = prep(batch)
    val (cSets, cKeys) = prep(corpus)
    val cand = bKeys.as("a").join(cKeys.as("c"),
        col("a.band") === col("c.band") && col("a.bh") === col("c.bh"))
      .select(col("a.id").as("bid"), col("c.id").as("cid")).distinct()
    val contaminated = cand
      .join(bSets.select(col("id").as("bid"), col("sh").as("sha"))
        .hint("shuffle_hash"), "bid")
      .join(cSets.select(col("id").as("cid"), col("sh").as("shc"))
        .hint("shuffle_hash"), "cid")
      .withColumn("c", size(array_intersect(col("sha"), col("shc"))))
      .filter(floor(col("c") * lit(1000000.0)
        / (size(col("sha")) + size(col("shc")) - col("c"))).cast("long")
        >= minJaccardMicro)
      .select(col("bid")).distinct()
    // the contaminated-id relation is bounded by the BATCH, which is
    // corpus-scale at deployment — pin the anti probe shuffle-hash
    // like every corpus-derived join here (AQE would broadcast it at
    // test scale and discover the overflow only in production)
    batch.join(contaminated.hint("shuffle_hash"),
      batch(idCol).cast("long") === contaminated("bid"), "left_anti")
  }

  /** Connected components over near-dup PAIRS → (id, cluster_id), where
    * `cluster_id` is the smallest id reachable through the pair graph
    * (a total, deterministic cluster representative — the same
    * "smallest id survives" convention as [[exactGroups]]).
    *
    * Every pair-producing operator here ([[jaccardPairs]],
    * [[lshVerifiedPairs]], [[simHashPairs]], [[cosinePairsLsh]]) stops
    * at pairs; a training-data pipeline needs keep/drop decisions,
    * which requires resolving pairs into transitive groups (a–b + b–c
    * ⇒ {a,b,c} is ONE duplicate cluster).
    *
    * Algorithm: iterative min-label propagation. Each iteration is one
    * shuffle equi-join (labels onto edge endpoints) + one partial-agg
    * min — fully distributed, nothing driver-side except the
    * convergence counter. Label state is checkpointed per iteration:
    * without the lineage cut, iteration i replans i copies of the whole
    * join tree. `checkpointDir = None` (default) uses executor-local
    * `localCheckpoint` — right for single-box runs; at cluster
    * deployment scale pass a reliable-storage directory and each
    * iteration cuts lineage through a real `checkpoint` instead
    * (localCheckpoint blocks survive neither executor loss nor
    * dynamic-allocation scale-in). Converges in O(cluster
    * diameter) iterations; near-dup clusters are shallow by
    * construction (members are all near ONE content neighborhood), so
    * the default bound is generous. Throws if the bound is hit without
    * convergence rather than returning a half-merged clustering.
    *
    * Only ids that appear in ≥ 1 pair come back; singletons are their
    * own cluster by definition (callers: left-join + coalesce to id).
    *
    * @return (id, cluster_id)
    */
  def nearDupClusters(
      pairs: DataFrame,
      id1Col: String = "id1",
      id2Col: String = "id2",
      maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.storage.StorageLevel
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val edges = pairs.select(col(id1Col).cast("long").as("src"), col(id2Col).cast("long").as("dst"))
    // The union inherits the SUM of its inputs' partition counts (a
    // 3-way pair union read back symmetrized lands at ~130 partitions
    // locally), and every propagation iteration re-scans the cached
    // relation at that width — paying per-task scheduling and task-
    // binary deserialization once per cached partition per iteration.
    // A narrow coalesce (no shuffle) bounds the cached width at the
    // session's shuffle parallelism — the width every iteration's join
    // shuffles to anyway, at any scale.
    val symWidth = math.max(spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val sym = edges
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .coalesce(symWidth)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Initial label = min(id ∪ N(id)) — exactly what iteration 1 of
    // the loop would compute from comp₀ = id, but as ONE direct
    // aggregation over the edge relation instead of a join + checkpoint
    // + convergence count (the distinct() the id-labeled init paid is
    // the same exchange this groupBy pays). Saves one full iteration
    // round per clustering; the fixpoint (component-min labels) and
    // the convergence check are unchanged.
    var comp = cut(sym.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"),
        least(col("src"), col("nmin")).as("comp")))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // min label among each node's neighbors, one hop
      val nbrMin = sym
        .join(comp.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("comp")).as("nmin"))
        .select(col("src").as("id"), col("nmin"))
      val next = cut(comp
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp")))
      changed = next.filter(col("comp") < col("prev")).count()
      comp = next.select(col("id"), col("comp"))
      iter += 1
    }
    sym.unpersist()
    require(changed == 0,
      s"nearDupClusters did not converge in $maxIters iterations — " +
        "component diameter exceeds the bound; raise maxIters")
    comp.select(col("id"), col("comp").as("cluster_id"))
  }

  /** Near-dup survivors: drop every row whose id belongs to a pair
    * cluster but is not that cluster's smallest id. The full-row
    * analogue of [[exactSurvivors]] for NEAR duplicates: feed it the
    * pairs from any discovery operator and the original relation.
    */
  def nearDupSurvivors(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      id1Col: String = "id1",
      id2Col: String = "id2"): DataFrame = {
    val losers = nearDupClusters(pairs, id1Col, id2Col)
      .filter(col("cluster_id") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** `bits`-bit SimHash from a *precomputed* token-hash array column:
    * bit j of the result is 1 iff more token hashes have bit j set than
    * clear. One fused codegen loop per row
    * ([[graft.functions.SimHashExpr]]); the interpreted-HOF twin
    * ([[simHashFromHashesHof]]) paid `bits` interpreted `aggregate`
    * folds per row.
    */
  def simHashFromHashes(tokenHashes: Column, bits: Int = 32): Column =
    graft.functions.SignatureExprs.simHash(tokenHashes, bits)

  /** Declarative HOF twin of [[simHashFromHashes]] — the executable
    * spec of the native expression (bit-equality test-enforced).
    */
  private[graft] def simHashFromHashesHof(tokenHashes: Column, bits: Int = 32): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
    (0 until bits).map { j =>
      val bitSum = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** [[simHashFromHashes]] over a text column directly — for one-off
    * use; pipelines should stage the token hashes first. */
  def simHash(text: Column, bits: Int = 32): Column =
    simHashFromHashes(tokenHashArray(tokens(text)), bits)

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`.
    *
    * Candidate generation is pigeonhole banding: the `bits` are cut into
    * `bands` contiguous slices; two hashes within `maxHamming` must agree
    * exactly on ≥ 1 slice whenever `maxHamming < bands`, so the equi-join
    * on (band, slice value) is complete — no O(n²) cross join. Verified
    * with an exact popcount on the XOR.
    *
    * @return (id1, id2, hamming) with id1 < id2
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 2,
      bits: Int = 32,
      bands: Int = 4,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val hashed = df.repartition(computeParallelism(df), col(idCol)) // parallelize per-doc hashing (see jaccardPairs)
      .select(col(idCol).cast("long").as("id"),
        tokenHashArray(tokens(col(textCol))).as("th"))
      .select(col("id"), simHashFromHashes(col("th"), bits).as("sh"))
    hammingPairs(hashed, "id", "sh", maxHamming, bits, bands, maxBucketWidth)
  }

  /** 64-bit two-level SimHash near-dup pairs: the low 32 signature bits
    * are the unigram-token-hash SimHash (the q19 signature), the high
    * bits a SimHash over BIGRAM hashes `(h_i·131 + h_{i+1}) mod
    * 1 000 000 007` — token-level plus phrase-order locality in one
    * fixed-width signature. The bigram half is packed at bit 34 (token
    * hashes carry < 2^30 of signal, so each SimHash half occupies bits
    * 0..29): its top signal bit lands on bit 63, making the packed long
    * NEGATIVE for some docs — deliberately exercising
    * [[hammingPairs]]' sign-extended top-band path at `bits = 64`, the
    * exact configuration the image dHash pipeline
    * ([[graft.multimodal.ImageHash.imageNearDupPairs]]) runs. Packing
    * shifts bit positions but no bits collide, so the packed Hamming
    * distance equals `hamming(lo half) + hamming(hi half)` — which is
    * how a SQL oracle replays this without 64-bit overflow.
    *
    * Docs with fewer than two tokens have no bigrams and are excluded
    * (a 0-bigram SimHash would be a degenerate all-zero half).
    *
    * @return (id1, id2, hamming) with id1 < id2, hamming ≤ maxHamming
    */
  def simHash64Pairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 8,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val th = col("th")
    val bigrams = zip_with(
      slice(th, lit(1), size(th) - 1), slice(th, lit(2), size(th) - 1),
      (a, b) => pmod(a * 131 + b, lit(1000000007L)))
    val hashed = df.repartition(computeParallelism(df), col(idCol)) // parallelize per-doc hashing (see jaccardPairs)
      .select(col(idCol).cast("long").as("id"),
        tokenHashArray(tokens(col(textCol))).as("th"))
      .filter(size(th) >= 2)
      .select(col("id"),
        simHashFromHashes(th, 32).as("lo"),
        simHashFromHashes(bigrams, 32).as("hi"))
      .select(col("id"), shiftleft(col("hi"), 34).bitwiseOR(col("lo")).as("sig"))
    hammingPairs(hashed, "id", "sig", maxHamming, bits = 64, bands = bands,
      maxBucketWidth = maxBucketWidth)
  }

  /** Hamming-distance pairs over ANY precomputed fixed-width hash
    * signature column (SimHash, image dHash, …): pigeonhole banding
    * candidate equi-join + exact popcount verification — the shared
    * tail under [[simHashPairs]] and
    * [[graft.multimodal.ImageHash.imageNearDupPairs]].
    *
    * Completeness: two hashes within `maxHamming` must agree exactly on
    * ≥ 1 of the `bands` contiguous slices whenever `maxHamming < bands`.
    * Top-band keys sign-extend for `bits = 64` (`shiftright` is
    * arithmetic) — consistent on both join sides, so correctness is
    * unaffected.
    *
    * `maxBucketWidth` drops (band, key) buckets wider than the cap
    * before the candidate join ([[dropWideBuckets]]) — the guard
    * against a mega-cluster of (near-)identical signatures turning one
    * bucket into an all-pairs join. Completeness then holds only for
    * pairs with ≥ 1 agreeing band whose bucket is within the cap.
    *
    * @param hashed (idCol, hashCol) — hashCol a long holding the low
    *               `bits` bits of the signature
    * @return (id1, id2, hamming) with id1 < id2
    */
  def hammingPairs(
      hashed: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int,
      bits: Int,
      bands: Int,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    require(maxHamming < bands, s"banding is only complete for maxHamming < bands")
    require(bits % bands == 0, "bits must divide into bands")
    require(bits >= bands && bits <= 64, "bits must be in [bands, 64]")
    val w = bits / bands
    val mask = if (w == 64) -1L else (1L << w) - 1
    val keyed0 = hashed
      .select(col(idCol).cast("long").as("id"), col(hashCol).as("sh"))
      .select(col("id"), col("sh"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sh"), b * w).bitwiseAND(mask)): _*)).as(Seq("band", "bk")))
      .hint("shuffle_hash") // see jaccardPairs: post-explode size defeats broadcast estimates
    // the cap costs a WHOLE-SIGNATURE dedup nothing here: identical
    // hashes stay distinct rows (distinct ids), so a mega-cluster of
    // byte-identical images is exactly the width blow-up being dropped
    val keyed = maxBucketWidth.fold(keyed0)(dropWideBuckets(keyed0, "band", "bk", _))
    val a = keyed.as("a"); val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bk") === col("b.bk")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      // filter BEFORE the distinct: hamming is a function of the pair, so
      // dedup sees only surviving pairs instead of shuffling every
      // band-collision candidate it is about to drop
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs, exact: `floor(1e6·cos)` ≥
    * `minCosineMicro` over ALL pairs — an O(n²) theta-join.
    *
    * VERIFICATION-SCALE ONLY: this is the ground-truth path for audits
    * and recall measurement on samples; it is a scale-killer by
    * construction. The discovery path is [[cosinePairsLsh]] (bucketed
    * equi-join, shuffle O(rows × tables)).
    *
    * @return (id1, id2, cos_micro) with id1 < id2
    */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosineMicro: Long): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val a = v.as("a"); val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        floor(VectorFunctions.cosineSimilarity(col("a.vec"), col("b.vec"))
          * 1000000.0).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= minCosineMicro)
  }

  /** Serialized Bloom filter over a key column — the build side of the
    * runtime-filter pattern Spark itself injects for shuffle joins
    * (`InjectRuntimeFilter`), constructed manually so a pipeline can
    * stage it once and reuse it across queries. One partial-agged
    * aggregation over `keys`; the merged sketch (a few MB for tens of
    * millions of keys at the default 3% fpp) returns to the driver.
    *
    * `None` when `keys` is empty (no filter to build — callers treat
    * "no bloom" as "nothing can match").
    *
    * The key column must be integral or string (the sketch hashes
    * longs/binary natively); our shingle hashes are already longs.
    */
  def bloomBits(keys: DataFrame, keyCol: String, expectedItems: Long): Option[Array[Byte]] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val agg = new BloomFilterAggregate(
      Bridge.expression(col(keyCol)), expectedItems).toAggregateExpression()
    Option(keys.select(Bridge.column(agg).as("bf")).head.getAs[Array[Byte]]("bf"))
  }

  /** `might_contain(bloom, key)` as a codegen'd Catalyst predicate —
    * false ⇒ the key is definitely NOT in the build set (no false
    * negatives), true ⇒ probably is. The filter evaluates per-row with
    * zero shuffle, so placed under a join's probe-side exchange it cuts
    * shuffled volume to (true matches + fpp·rest).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.BinaryType
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(key)))
  }

  /** Bloom-prefiltered shared-key counts — the shuffle-scale path of
    * benchmark decontamination. The broadcast formulation (q56) is
    * right while the bench shingle set fits an executor; when the eval
    * suite grows past broadcast comfort the join must shuffle, and a
    * naive shuffle join moves EVERY corpus shingle — at 100 TB that is
    * the whole exploded corpus through the wire to discard ~all of it.
    * This path builds a Bloom filter over the bench keys (one small
    * aggregation), evaluates `might_contain` per corpus row BEFORE the
    * exchange, and shuffle-joins only the survivors: shuffled volume
    * drops from O(corpus shingles) to O(contaminated + fpp · corpus).
    * False positives are removed by the exact join, so the result is
    * bit-identical to the unfiltered join — same oracle as q56.
    *
    * @param corpusKeys (idCol, keyCol) exploded corpus relation
    * @param benchKeys  distinct bench keys, same keyCol
    * @return (idCol, n_shared) — corpus ids sharing ≥ 1 key, with count
    */
  def sharedKeyCountsBloom(
      corpusKeys: DataFrame,
      benchKeys: DataFrame,
      idCol: String,
      keyCol: String,
      expectedItems: Long): DataFrame = {
    val spark = corpusKeys.sparkSession
    bloomBits(benchKeys, keyCol, expectedItems) match {
      case None =>
        import org.apache.spark.sql.types.LongType
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol, corpusKeys.schema(idCol).dataType),
            org.apache.spark.sql.types.StructField("n_shared", LongType, nullable = false))))
      case Some(bloom) =>
        corpusKeys
          .filter(mightContain(bloom, col(keyCol)))
          .join(benchKeys.hint("shuffle_hash"), keyCol) // the can't-broadcast scale case
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_shared"))
    }
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH — the
    * discovery path: candidate pairs are docs sharing a `planes`-bit
    * hyperplane signature in ≥ 1 of `tables` independent plane sets;
    * only candidates pay the exact cosine. Recall < 1 by construction
    * (a cosine-θ pair agrees on one table's signature with probability
    * `(1 − θ/π)^planes`, any of the tables with
    * `1 − (1 − (1−θ/π)^planes)^tables`); raise `tables` (or lower
    * `planes`) for recall, the reverse for candidate volume.
    *
    * Scale shape: signatures are one fused per-row pass
    * ([[graft.functions.HyperplaneSignatureExpr]]); candidates come
    * from a bucketed self-equi-join on (table, signature) — shuffle
    * O(rows × tables), never O(rows²) — and the vector lookups are
    * shuffle equi-joins on id (nothing corpus-derived is broadcast).
    * `maxBucketWidth` (recommended at corpus scale) drops over-wide
    * (table, signature) buckets before the self-join —
    * [[dropWideBuckets]], the guard against an embedding mega-cluster
    * (a default/zero vector emitted by a broken encoder is the classic
    * case: every copy shares every signature).
    *
    * @return (id1, id2, cos_micro) with id1 < id2, cos ≥ minCosineMicro
    */
  def cosinePairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosineMicro: Long,
      dim: Int,
      planes: Int = 10,
      tables: Int = 4,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    import graft.functions.SignatureExprs
    val par = computeParallelism(df)
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .repartition(par, col("id")) // shared materialization point (see lshVerifiedPairs)
    val keyed0 = v.select(col("id"),
        posexplode(array((0 until tables).map(t =>
          SignatureExprs.hyperplaneSignature(col("vec"), planes, dim, t * planes)): _*))
          .as(Seq("tbl", "sig")))
      .hint("shuffle_hash") // post-explode size defeats broadcast estimates
    // same mega-cluster guard as the MinHash/Hamming paths: a burst of
    // (near-)identical embeddings lands in one (table, signature)
    // bucket per table — dropWideBuckets bounds that bucket's fan-out
    val keyed = maxBucketWidth.fold(keyed0)(dropWideBuckets(keyed0, "tbl", "sig", _))
    val a = keyed.as("a"); val b = keyed.as("b")
    val cand = a.join(b, col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(v.select(col("id").as("id1"), col("vec").as("va")).hint("shuffle_hash"), "id1")
      .join(v.select(col("id").as("id2"), col("vec").as("vb")).hint("shuffle_hash"), "id2")
      .select(col("id1"), col("id2"),
        floor(VectorFunctions.cosineSimilarity(col("va"), col("vb"))
          * 1000000.0).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= minCosineMicro)
  }

  /** Duplicate-passage EXCISION — the cleaning *action* that
    * substring-level detection (q80's window fingerprints) only
    * reports: shared ≥`window`-char runs are REMOVED from every
    * lower-priority document and the surviving text is reassembled,
    * the boilerplate/contamination-stripping op an LLM data pipeline
    * runs after detection flags a quoted passage.
    *
    * Semantics, stated exactly:
    *  1. Every doc emits polynomial fingerprints of its `window`-char
    *     windows at stride `stride` (same family as the q80 detector —
    *     a shared run is caught iff it spans a full window at matching
    *     `mod stride` alignment; stride 1 buys the exact guarantee at
    *     `stride`× the fingerprint volume).
    *  2. A fingerprint is OWNED by the smallest doc id that contains
    *     it (priority = id order, the deterministic convention every
    *     dedup op here uses). Windows whose fingerprint is owned by a
    *     *different, earlier* doc are duplicate passages; the owner
    *     keeps its text untouched (so one copy of every passage always
    *     survives the corpus).
    *  3. Per doc, the duplicate windows `[start, start+window)` are
    *     merged (overlapping/adjacent cuts coalesce) and the kept
    *     complement segments are spliced back IN OFFSET ORDER — the
    *     deterministic reassembly: a single fold over the sorted cut
    *     starts tracks a cursor; each cut emits the text between the
    *     cursor and the cut, then advances the cursor past the cut
    *     (`max(cursor, start+window)` — overlap merging for free).
    *
    * Scale shape: fingerprinting is one codegen pass per row (no
    * strings retained — `window` chars hashed to one long); ownership
    * is a partial-agged `min` groupBy on the fingerprint key; the
    * duplicate-window probe is one fingerprint-keyed equi-join
    * (shuffle-hash pinned — the owner relation is corpus-derived,
    * never broadcast); the splice is per-row bounded work over the
    * collected cut-start array (≤ `n_chars/stride` longs per doc —
    * document-bounded state, the q61 chunking discipline). Never
    * all-pairs, no Window, no driver collect.
    *
    * @return one row per input doc: (`idCol`, orig_chars, kept_text)
    *         — kept_text == original text when nothing was excised.
    */
  def dupPassageExcision(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 64,
      stride: Int = 32): DataFrame = {
    import graft.functions.PolyHashArrayExpr
    val base = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val win = base.select(col("id"),
        explode(sequence(lit(1L),
          greatest(col("n_chars") - (window - 1).toLong, lit(1L)),
          lit(stride.toLong))).as("start"),
        col("text"))
      .select(col("id"), col("start"),
        element_at(PolyHashArrayExpr(
          array(col("text").substr(col("start").cast("int"), lit(window)))), 1).as("fp"))
    val owner = win.groupBy(col("fp")).agg(min(col("id")).as("owner"))
    val cutStarts = win
      .join(owner.hint("shuffle_hash"), Seq("fp"))
      .filter(col("owner") < col("id"))
      .groupBy(col("id"))
      .agg(array_sort(collect_set(col("start"))).as("starts"))
    base.join(cutStarts.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id").as(idCol), col("n_chars").as("orig_chars"),
        when(col("starts").isNull, col("text"))
          .otherwise(spliceOut(col("text"), col("starts"), col("n_chars"), window))
          .as("kept_text"))
  }

  /** The offset-ordered splice of [[dupPassageExcision]]: fold the
    * sorted cut starts with a (kept-so-far, cursor) state; emits only
    * inter-cut segments, coalescing overlaps via the cursor max. Kept
    * as a composition of codegen'd built-ins (`aggregate`/`substr`/
    * `concat`) — per-row bounded, no UDF. */
  private[graft] def spliceOut(
      text: Column, starts: Column, nChars: Column, window: Int): Column =
    aggregate(
      starts,
      struct(lit("").as("acc"), lit(1L).as("cur")),
      (st, s) => struct(
        concat(st.getField("acc"),
          when(s > st.getField("cur"),
            text.substr(st.getField("cur").cast("int"),
              (s - st.getField("cur")).cast("int")))
            .otherwise(lit(""))).as("acc"),
        greatest(st.getField("cur"), s + window.toLong).as("cur")),
      st => concat(st.getField("acc"),
        when(st.getField("cur") <= nChars,
          text.substr(st.getField("cur").cast("int"),
            (nChars - st.getField("cur") + 1L).cast("int")))
          .otherwise(lit(""))))
}
