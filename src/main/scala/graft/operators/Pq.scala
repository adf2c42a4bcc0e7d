package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — THE vector-compression
  * operator for corpus-scale ANN: split each `dim`-vector into `m`
  * equal subvectors, learn an independent `k`-centroid codebook per
  * subspace, and store each vector as `m` small codes (m·log₂k bits —
  * 64 float dims → 4 bytes at m=4/k=16, a 64× compression) plus
  * nothing else. Distances are then computed code-to-centroid
  * (asymmetric distance computation, ADC): the query stays exact,
  * every corpus vector is approximated by its per-subspace centroids,
  * and the error is bounded by the per-subspace quantization error
  * this module also measures.
  *
  * Everything reuses [[SemDedup]]'s deterministic integer Lloyd
  * machinery (milli-quantization, smallest-id seeding, floored
  * integer means, lexicographic argmin), so the ENTIRE train + encode
  * + error pipeline replays bit-for-bit in the DuckDB oracle — the
  * q127 discipline applied per subspace.
  *
  * Scale shape: training collects only `m·k·(dim/m) = k·dim` longs to
  * the driver (the IVF-codebook rule; one corpus pass per subspace —
  * m is small and fixed); encoding and reconstruction error are pure
  * per-row projections against codebook literals (no join, no
  * shuffle); ADC search is the q21 broadcast-query / streaming-corpus
  * discipline with the bounded-heap [[TopK]] per query.
  */
object Pq {

  /** Per-subspace deterministic Lloyd codebooks over the
    * milli-quantized subvectors: `codebooks(s)` = the subspace-`s`
    * `(code, centroid)` list. `k·dim` longs of driver traffic.
    *
    * All `m` subspaces train FUSED in one job chain — one exploded
    * `(id, s, mv)` relation persisted once, one assignment+update agg
    * per Lloyd round covering every subspace (grouped on `(s,
    * cluster, pos)`) — instead of `m` independent chains each paying
    * seed/iterate jobs; at m=8 that is 4 corpus-touching jobs instead
    * of 32. Bit-identical to running [[SemDedup.lloydCentroids]] per
    * subspace ([[PqSpec]] pins it; the q162 oracle replays the
    * per-subspace formulation): the k smallest ids seed EVERY
    * subspace (every id carries all m subvectors), assignment argmin,
    * floored integer means, and per-subspace cluster death all
    * commute with the fusion. */
  def codebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    trainFused(df
      .select(col(idCol).cast("long").as("id"),
        array((0 until m).map(s =>
          SemDedup.quantizeMilli(slice(col(vecCol), s * sub + 1, sub))): _*)
          .as("subs"))
      .select(col("id"), posexplode(col("subs")).as(Seq("s", "mv"))),
      m, k, iters)
  }

  /** The fused Lloyd loop over an already-exploded `(id, s, mv)`
    * relation — mv-source-agnostic, so the RESIDUAL codebooks of the
    * IVF-PQ index ([[residualCodebooks]]) train through the identical
    * job chain as the raw-subvector ones. */
  private def trainFused(
      subs: DataFrame, m: Int, k: Int, iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    require(k >= 1 && iters >= 0)
    import org.apache.spark.storage.StorageLevel
    val milli = subs.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // seed: the k smallest-id rows of EVERY subspace are the same k
      // ids — one collect returns all m seed codebooks
      var cbs: Seq[Seq[(Long, Seq[Long])]] = {
        val seeds = milli.orderBy(col("id"), col("s")).limit(k * m).collect()
        (0 until m).map { s =>
          seeds.filter(_.getInt(1) == s).sortBy(_.getLong(0)).take(k)
            .zipWithIndex
            .map { case (r, i) => (i.toLong, r.getSeq[Long](2).toSeq) }
            .toSeq
        }
      }
      def assignExpr(cs: Seq[Seq[(Long, Seq[Long])]]): Column =
        (0 until m).foldLeft(lit(-1L)) { (acc, s) =>
          when(col("s") === s,
            SemDedup.assignClusterMilli(col("mv"), cs(s))).otherwise(acc)
        }
      for (_ <- 1 to iters) {
        cbs = {
          val rows = milli
            .select(col("s"), col("mv"), assignExpr(cbs).as("cluster"))
            .select(col("s"), col("cluster"), posexplode(col("mv")).as(Seq("pos", "x")))
            .groupBy(col("s"), col("cluster"), col("pos"))
            .agg(sum(col("x")).as("sum"), count(lit(1)).as("n"))
            .select(col("s"), col("cluster"), col("pos"),
              floor(col("sum").cast("double") / col("n")).cast("long").as("mval"))
            .collect()
          (0 until m).map { s =>
            rows.filter(_.getInt(0) == s)
              .groupBy(_.getLong(1))
              .map { case (cid, rs) =>
                (cid, rs.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq)
              }
              .toSeq.sortBy(_._1)
          }
        }
      }
      cbs
    } finally milli.unpersist()
  }

  /** PQ-encode every vector and measure its reconstruction error:
    * one row per vector — the `m` assigned codes plus
    * `recon_err` = Σ over subspaces of the exact integer milli²
    * squared distance to the assigned centroid. The error column is
    * the operator's own quality audit (rising recon error at a fixed
    * bit budget = the corpus outgrew the codebooks — retrain), and
    * the codes table is what an ADC index stores.
    */
  def encodeWithError(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int): DataFrame = {
    val cbs = codebooks(df, idCol, vecCol, dim, m, k, iters)
    encodeWith(df, idCol, vecCol, dim, cbs)
  }

  /** [[encodeWithError]] against already-trained codebooks (the
    * build-once/encode-many split a deployment uses). */
  def encodeWith(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      cbs: Seq[Seq[(Long, Seq[Long])]]): DataFrame = {
    val m = cbs.size
    val sub = dim / m
    // milli subvectors must be NAMED attributes before the
    // struct-argmin (the kmeansAssign analysis quirk)
    val stage1 = df.select(
      col(idCol).cast("long").as("vec_id") +:
        (0 until m).map(s =>
          SemDedup.quantizeMilli(slice(col(vecCol), s * sub + 1, sub))
            .as(s"mv$s")): _*)
    // one fused argmin per subspace; its `d` field IS the assigned
    // centroid's exact distance, so the reconstruction error needs no
    // second map-lookup fold (bit-equal: same centroid, same integer
    // arithmetic)
    val stage2 = stage1.select(
      col("vec_id") +:
        (0 until m).map(s =>
          SemDedup.assignWithDistMilli(col(s"mv$s"), cbs(s)).as(s"nc$s")): _*)
    val err = (0 until m).map(s => col(s"nc$s").getField("d")).reduce(_ + _)
    stage2.select(
      col("vec_id") +:
        (0 until m).map(s => col(s"nc$s").getField("c").as(s"code$s")) :+
        err.as("recon_err"): _*)
  }

  /** Build the PQ index as a persisted ARTIFACT (the q146 IVF / q152
    * clustering discipline): codebooks (m·k rows of (subspace, code,
    * centroid)) + the coded corpus (one row of m codes per vector) as
    * one atomically-published parquet tree. At 100 TB the coded
    * relation is the ~42×-compressed scan every ADC query reads —
    * re-deriving it per query batch would re-pay the full-vector
    * corpus pass the compression exists to avoid. */
  def buildIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      path: String): Unit = {
    import df.sparkSession.implicits._
    val cbs = codebooks(df, idCol, vecCol, dim, m, k, iters)
    graft.sources.Artifacts.publishTree(df.sparkSession, path) { build =>
      cbs.zipWithIndex
        .flatMap { case (cb, s) => cb.map { case (code, cv) => (s, code, cv) } }
        .toDF("subspace", "code", "cv")
        .coalesce(1).write.parquet(s"$build/codebooks")
      encodeWith(df, idCol, vecCol, dim, cbs)
        .drop("recon_err")
        .write.parquet(s"$build/codes")
    }
  }

  /** ADC search served from a [[buildIndex]] artifact: the codebooks
    * (m·k·dim/m longs — a few KB) are collected and inlined as
    * literals exactly like the inline path; the coded relation is
    * scanned from parquet. Bit-equal to [[adcTopK]] over the same
    * training corpus (the q146/q152 shared-oracle contract). */
  def adcTopKFromIndex(
      queries: DataFrame,
      path: String,
      dim: Int,
      topK: Int,
      queryId: String,
      queryVec: String): DataFrame = {
    val spark = queries.sparkSession
    val cbs: Seq[Seq[(Long, Seq[Long])]] =
      spark.read.parquet(s"$path/codebooks")
        .orderBy(col("subspace"), col("code")).collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Long](2).toSeq)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(_._2).toSeq)
    adcTopK(queries, spark.read.parquet(s"$path/codes"), cbs,
      dim, topK, queryId, queryVec)
  }

  /** ADC (asymmetric distance) top-`topK` search: queries stay exact
    * (milli), corpus vectors are their codes — per pair the distance
    * is Σ over subspaces of ||q_sub − centroid(code_s)||², i.e. the
    * per-query lookup-table formulation inlined as codebook literals.
    * Queries broadcast (bounded by construction), the coded corpus
    * streams into the bounded-heap [[TopK]] — the q21 plan shape with
    * a 64×-smaller corpus side, which is the whole point at 100 TB:
    * the scan reads codes, not vectors.
    *
    * @return (query_id, rank, neighbor_id, adc_dist)
    */
  def adcTopK(
      queries: DataFrame,
      coded: DataFrame,
      cbs: Seq[Seq[(Long, Seq[Long])]],
      dim: Int,
      topK: Int,
      queryId: String,
      queryVec: String): DataFrame = {
    val m = cbs.size
    val sub = dim / m
    val k = cbs.map(_.map(_._1).max).max.toInt + 1
    // the TEXTBOOK ADC split: each query precomputes its m lookup
    // tables — LUT_s[cid] = ||q_sub − centroid_cid||², k·m longs per
    // query, built ONCE per query row from the codebook literals —
    // and the per-PAIR distance collapses to m array indexes + adds.
    // Folding the codebook into the pair expression instead (the
    // naive formulation) pays k centroid probes per subspace per
    // PAIR: measured 5× slower at sf1. Dead centroids (cluster
    // death) leave a 0 slot no live code ever indexes. The LUT build
    // itself is ONE fused native loop per row
    // ([[graft.functions.AdcLutsExpr]] — the m·k HOF-fold formulation
    // it replaces bit-equally is interpreted per fold and dominated
    // the probe cost); the zero cell centroid makes it raw (not
    // residual) ADC.
    val q = queries.select(
      col(queryId).cast("long").as("q_id"),
      graft.functions.AdcLutsExpr(
        SemDedup.quantizeMilli(col(queryVec)),
        typedLit(Seq.fill(dim)(0L)), cbs, k).as("luts"))
    val dist = (0 until m).map { s =>
      element_at(col("luts"), lit(s * k) + col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    // pin full parallelism on the coded side BEFORE the fan-out: the
    // codes relation is tiny in BYTES (that is the point of PQ), so
    // both the scan split count and AQE's byte-based coalescing put
    // the whole ×|Q| ADC fan-out into one task (observed: a single
    // task carrying the entire sf1 search; the
    // Dedup.computeParallelism discipline)
    coded
      .repartition(coded.sparkSession.sparkContext.defaultParallelism,
        col("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), dist.as("adc"))
      .groupBy(col("q_id").as("query_id"))
      .agg(TopK.topK(topK)(col("adc").cast("double"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), col("n.dist").cast("long").as("adc_dist"))
  }

  // ---------------------------------------------------------------------
  // IVF-PQ: the composed index (FAISS IVFADC; Jégou et al. §IV)
  // ---------------------------------------------------------------------

  /** (integer distance, cell id) structs of a milli vector against
    * the milli coarse codebook — the IVF scoring projection. Argmin /
    * sort over these is lexicographic `(dist, cid)` — the shop-wide
    * total order. Coarse centroids are LLOYD-TRAINED in milli space
    * ([[SemDedup.lloydCentroids]]) rather than hash-sampled items:
    * the TunePq sweep measured sampled-item cells costing ~0.3 of
    * recall@5 at equal scan fraction (bad cells put true neighbors in
    * unprobed lists — no downstream stage can recover that), and
    * trained cells are what make residual encoding worth its name. */
  private def coarseScoresMilli(
      mv: Column, ivfCb: Seq[(Long, Seq[Long])]): Column =
    array(ivfCb.map { case (cid, cv) =>
      struct(SemDedup.sqDistInt(mv, typedLit(cv)).as("d"), lit(cid).as("c"))
    }: _*)

  /** Subspace-`s` milli subvector for IVF-PQ: the RESIDUAL to the
    * row's assigned coarse centroid — `milli(x)ⱼ − cⱼ`, pure LONG
    * subtraction (both sides already milli), with the centroid slice
    * looked up from an inlined `c_id → slice` map literal — or the
    * raw milli subvector when `residual` is off. Residual encoding is
    * the accuracy half of IVFADC (Jégou §IV): the PQ codebooks only
    * have to cover the spread WITHIN a cell, not the whole space, so
    * the same bit budget quantizes much finer. Integer end to end —
    * nothing for an engine to diverge on. */
  private def subMilli(milliVec: Column, cId: Column,
      ivfCb: Seq[(Long, Seq[Long])], s: Int, sub: Int,
      residual: Boolean): Column = {
    val mvSlice = slice(milliVec, s * sub + 1, sub)
    if (!residual) mvSlice
    else {
      val sliceMap = typedLit(
        ivfCb.map { case (cid, cv) => cid -> cv.slice(s * sub, (s + 1) * sub) }
          .toMap)
      zip_with(mvSlice, element_at(sliceMap, cId), (x, c) => x - c)
    }
  }

  /** Per-subspace codebooks over the cell-residual subvectors — ONE
    * global codebook set trained on every row's residual (the
    * textbook IVFADC layout: per-cell codebooks would multiply
    * codebook storage ×centroids for marginal gain). Same fused
    * deterministic-Lloyd chain as [[codebooks]]; `k·dim` longs of
    * driver traffic. */
  private def residualCodebooks(
      it: DataFrame,
      dim: Int, m: Int, k: Int, iters: Int,
      ivfCb: Seq[(Long, Seq[Long])],
      residual: Boolean): Seq[Seq[(Long, Seq[Long])]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    trainFused(it
      .select(col("i_id").as("id"),
        SemDedup.quantizeMilli(col("i_vec")).as("mv"))
      .select(col("id"), col("mv"),
        SemDedup.assignClusterMilli(col("mv"), ivfCb).as("c_id"))
      .select(col("id"),
        array((0 until m).map(s =>
          subMilli(col("mv"), col("c_id"), ivfCb, s, sub, residual)): _*)
          .as("subs"))
      .select(col("id"), posexplode(col("subs")).as(Seq("s", "mv"))),
      m, k, iters)
  }

  /** Build the COMPOSED IVF-PQ index as one persisted artifact tree —
    * the 100 TB ANN layout (FAISS IVFADC): coarse cells prune the
    * scan, PQ codes compress what's left, residual encoding keeps the
    * codes accurate. Three relations under `path`:
    *
    *  - `ivf/` — the coarse codebook (c_id, c_vec; `centroids` rows,
    *    derived deterministically like [[SimilaritySearch
    *    .buildIvfIndex]]);
    *  - `codebooks/` — the PQ codebooks over cell residuals
    *    (subspace, code, cv; m·k rows);
    *  - `codes/` — the coded corpus (vec_id, code0..m−1),
    *    PARTITIONED BY c_id, so a probe-bounded search reads only the
    *    probed cells' files (the q146 partition-pruning lever) AND
    *    each file holds codes, not vectors (the q165 compression
    *    lever) — the composition is what neither half delivers alone:
    *    scan bytes ≈ corpus · (probes/centroids) / compression.
    */
  def buildIvfPqIndex(
      items: DataFrame,
      itemId: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      centroids: Int,
      path: String,
      residual: Boolean = true,
      assignments: Int = 1): Unit = {
    require(centroids >= 1)
    require(assignments >= 1 && assignments <= centroids)
    import items.sparkSession.implicits._
    val it = items.select(col(itemId).cast("long").as("i_id"),
      col(vecCol).as("i_vec"))
    // coarse codebook: deterministic integer Lloyd over the FULL milli
    // vectors — k·dim longs of driver traffic, same budget rule as the
    // PQ codebooks
    val ivfCb = SemDedup.lloydCentroids(it, "i_id", "i_vec",
      k = centroids, iters = 2)
    // PQ codebooks train on PRIMARY-cell residuals only: replicas of
    // one id would seed duplicate rows nondeterministically (two rows
    // tie on the seed's (id, subspace) sort key with different
    // residuals) — and the primary residual distribution is the one
    // the codes must cover anyway
    val cbs = residualCodebooks(it, dim, m, k, iters, ivfCb, residual)
    val effAssign = math.min(assignments, ivfCb.size)
    graft.sources.Artifacts.publishTree(items.sparkSession, path) { build =>
      // meta travels WITH the index: the probe path derives every
      // layout parameter (dim, m, k, residual, assignments) from here
      // instead of trusting the caller to re-supply matching values —
      // a residual or assignments mismatch fails silently (duplicate
      // neighbors, wrong distances), not loudly (round-12 advice)
      Seq((dim, m, k, centroids, iters, residual, effAssign))
        .toDF("dim", "m", "k", "centroids", "iters", "residual", "assignments")
        .coalesce(1).write.parquet(s"$build/meta")
      ivfCb.toDF("c_id", "cv")
        .coalesce(1).write.parquet(s"$build/ivf")
      cbs.zipWithIndex
        .flatMap { case (cb, s) => cb.map { case (code, cv) => (s, code, cv) } }
        .toDF("subspace", "code", "cv")
        .coalesce(1).write.parquet(s"$build/codebooks")
      encodeCodes(it, ivfCb, cbs, dim, residual, effAssign)
        .write.partitionBy("c_id").parquet(s"$build/codes")
      stampResolution(items.sparkSession, build, m)
    }
  }

  /** Default thresholds of the [[resolutionAudit]] — shared with the
    * publish-time stamp so the stamped verdict and a live census at
    * defaults cannot disagree. */
  val ResolutionMinCell: Long = 16L
  val ResolutionLoadFactor: Long = 4L

  /** Census the just-written codes of a BUILD tree and persist the
    * 1-row audit as `<build>/resolution` — the resolution verdict
    * STAMPED at publish time (round-15 verdict: the verdict is a
    * property of the published representation; q179/q181 were
    * re-running the full code-tuple census per dispatch to re-learn
    * an answer that can only change when a publish swaps the tree).
    * Appends deliberately do NOT restamp: the q178 doctrine reads the
    * verdict off the post-RETRAIN representation (no refresh can
    * clear it, so appended collisions don't change the escalation
    * call), and the stamp travels inside the publishTree rename, so
    * a stale verdict after a retrain is impossible — the rebuilt
    * tree ships its own stamp or ships nothing. */
  private def stampResolution(spark: org.apache.spark.sql.SparkSession,
      build: String, m: Int): Unit =
    resolutionAuditOf(spark.read.parquet(s"$build/codes"), m,
        ResolutionMinCell, ResolutionLoadFactor)
      .coalesce(1).write.parquet(s"$build/resolution")

  /** The resolution verdict of an index tree — ONE row read from the
    * `resolution/` stamp written at publish ([[buildIvfPqIndex]] /
    * [[rebalanceIvfPqIndex]]); a pre-stamp tree (built before the
    * stamp format) falls back to the live census, paying the one
    * codes scan the stamp exists to amortize. This is what a
    * dispatch reads ([[graft.queries]] q178/q179/q181): the verdict
    * can only change at index-publish time, so per-dispatch
    * re-censusing is wasted work (the adaptive sink's scaladoc
    * argument, now honored by the batch dispatches too). */
  def resolutionStamp(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/resolution")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$path/resolution")
    else resolutionAudit(spark, path)
  }

  /** The encode projection shared by [[buildIvfPqIndex]] and
    * [[appendIvfPqIndex]]: `(i_id, i_vec)` rows → `(vec_id, c_id,
    * code0..m−1)` against FIXED codebooks. Staged selects: milli +
    * c_id as NAMED attributes before the residual projections,
    * residual subvectors named before the struct-argmin (the
    * kmeansAssign analysis quirk). Under multi-assignment each item
    * is replicated into its `assignments` nearest cells (the q39
    * recall lever) and encoded against EACH cell's residual — the
    * replica's codes describe it from that cell's vantage. Codebooks
    * fixed ⇒ this is a pure per-row projection, which is what makes
    * the incremental append bit-equal to a full re-encode. */
  private def encodeCodes(
      it: DataFrame,
      ivfCb: Seq[(Long, Seq[Long])],
      cbs: Seq[Seq[(Long, Seq[Long])]],
      dim: Int,
      residual: Boolean,
      effAssign: Int): DataFrame = {
    val m = cbs.size
    val sub = dim / m
    val s1 = it.select(col("i_id").as("vec_id"),
      SemDedup.quantizeMilli(col("i_vec")).as("mv"))
    val s2 =
      if (effAssign == 1)
        s1.select(col("vec_id"), col("mv"),
          SemDedup.assignClusterMilli(col("mv"), ivfCb).as("c_id"))
      else
        s1.select(col("vec_id"), col("mv"),
            explode(slice(array_sort(coarseScoresMilli(col("mv"), ivfCb)),
              1, effAssign)).as("cs"))
          .select(col("vec_id"), col("mv"), col("cs.c").as("c_id"))
    val s3 = s2.select(col("vec_id") +: col("c_id") +:
      (0 until m).map(s =>
        subMilli(col("mv"), col("c_id"), ivfCb, s, sub, residual).as(s"mv$s")): _*)
    s3.select(col("vec_id") +: col("c_id") +:
      (0 until m).map(s =>
        SemDedup.assignClusterMilli(col(s"mv$s"), cbs(s)).as(s"code$s")): _*)
  }

  /** The build parameters persisted beside a [[buildIvfPqIndex]]
    * tree — the probe/append paths derive layout from here rather
    * than trusting call-site arguments. */
  case class IvfPqMeta(dim: Int, m: Int, k: Int, centroids: Int,
      iters: Int, residual: Boolean, assignments: Int)

  /** Read the one-row `meta/` relation of an IVF-PQ artifact. A tree
    * without the sidecar (built before the meta format, or not an
    * IVF-PQ artifact at all) fails with an actionable message instead
    * of a bare path-does-not-exist. */
  def readIvfPqMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqMeta = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaPath)) throw new IllegalStateException(
      s"ivf-pq index at $path has no meta/ sidecar — the tree predates " +
        "the meta format (or is not an IVF-PQ artifact); rebuild it " +
        "with buildIvfPqIndex")
    val r = spark.read.parquet(s"$path/meta").collect() match {
      case Array(row) => row
      case rows => throw new IllegalStateException(
        s"ivf-pq index at $path: meta must be exactly 1 row, got ${rows.length}")
    }
    IvfPqMeta(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getBoolean(5), r.getInt(6))
  }

  /** Incremental IVFADC maintenance — the q168 move applied to ANN:
    * encode an ingest batch against the STANDING coarse + PQ
    * codebooks and APPEND its code files into the existing cell
    * partitions, leaving the rest of the tree untouched. Codebooks
    * fixed ⇒ codes are a pure per-row projection of the batch
    * ([[encodeCodes]]) ⇒ the appended index is BIT-EQUAL to a full
    * re-encode of old ∪ batch against the same codebooks (the q166
    * bit-equality argument; q170's gate pins it against an
    * independent oracle) — at the cost of the BATCH share instead of
    * a full-corpus rebuild, which at a bounded ingest rate is the
    * whole difference at 100 TB.
    *
    * Publish protocol: the batch codes are written cell-partitioned
    * into a private `<path>.append` staging tree, then each finished
    * part file is RENAMED into its live `codes/c_id=…/` directory
    * (creating the directory when the batch opens a new cell). File
    * renames are atomic per file, and append-only means a concurrent
    * reader sees some prefix of the new files — results only grow,
    * never tear; single writer per artifact path, as everywhere in
    * [[graft.sources.Artifacts]]. What the append does NOT do is
    * retrain: drift of the standing codebooks against the grown
    * corpus is the separate q171 audit's job.
    *
    * Delivery semantics hinge on `batchTag`. WITHOUT a tag the call
    * is AT-LEAST-ONCE: a retry after a crash mid-rename re-encodes
    * and re-renames the whole batch under fresh names, duplicating
    * the rows the first attempt already landed — for an
    * `assignments == 1` index those duplicates surface as duplicate
    * `neighbor_id`s in top-k (the probe's heap assumes the index
    * contract "≤ assignments copies per id"). WITH a tag the append
    * is IDEMPOTENT (effectively-once): a per-batch commit marker
    * (`<path>/appends/<tag>`, written LAST) short-circuits an
    * already-applied batch, live file names carry a `<tag>-` prefix,
    * and a retry with no marker first deletes any tagged files a
    * partial attempt left behind before re-applying — so callers with
    * a stable batch identity (Structured Streaming's `batchId`, an
    * ingest ledger id) get exactly-once index contents under replay.
    *
    * Tag contract (round-15 advice): the retry cleanup deletes live
    * files by the `<tag>-` NAME PREFIX, so the tag alphabet excludes
    * `-` (a tag could otherwise be a proper prefix of another
    * committed tag — deleting `b7` would sweep `b7-x`'s files while
    * its marker still stood) and the exact tag `part` is rejected
    * (Spark names data files `part-*`; tag `part` would sweep the
    * base build's own files on the first retry — longer tags like
    * `partition7` sweep `partition7-`, which cannot prefix a
    * `part-*` file, so the rest of the namespace stays usable). The
    * marker also binds the index to ONE batch-id lineage: tags
    * encode identity, not contents, so a stream whose checkpoint is
    * wiped while the index is kept restarts batchIds at 0 and
    * genuinely new batches are silently skipped by the stale
    * markers. Wiping a checkpoint means wiping the index's
    * `appends/` directory with it (or appending under a fresh tag
    * namespace). */
  def appendIvfPqIndex(
      batch: DataFrame,
      itemId: String,
      vecCol: String,
      path: String,
      batchTag: Option[String] = None): Unit = {
    import org.apache.hadoop.fs.Path
    batchTag.foreach(AppendProtocol.validateTag)
    val spark = batch.sparkSession
    val meta = readIvfPqMeta(spark, path)
    val ivfCb = readIvfCb(spark, path)
    val cbs = readPqCbs(spark, path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val markersDir = new Path(s"$path/appends")
    if (batchTag.exists(AppendProtocol.applied(fs, markersDir, _)))
      return // batch already fully applied (read-only check, no lease)
    // owner + stale adjudication are the SHARED definitions — a held
    // lease whose tagged append COMMITTED (marker landed inside the
    // commit-to-release crash window) is provably done and breakable
    AppendProtocol.withWriterLease(fs, new Path(path),
        AppendProtocol.appendOwner(batchTag),
        AppendProtocol.committedAppendStaleIf(fs, markersDir)) {
      val codesRoot = new Path(s"$path/codes")
      // crash cleanup: a prior tagged attempt may have renamed SOME of
      // this batch's files before dying — the tag prefix makes them
      // findable, so the retry starts from a clean slate
      batchTag.filter(_ => fs.exists(codesRoot)).foreach { t =>
        fs.listStatus(codesRoot)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
          .foreach(cell => AppendProtocol.sweepTag(fs, cell.getPath, t))
      }
      val it = batch.select(col(itemId).cast("long").as("i_id"),
        col(vecCol).as("i_vec"))
      val stage = path + ".append"
      val stagePath = new Path(stage)
      if (fs.exists(stagePath)) fs.delete(stagePath, true)
      encodeCodes(it, ivfCb, cbs, meta.dim, meta.residual,
          math.min(meta.assignments, ivfCb.size))
        .write.partitionBy("c_id").parquet(s"$stage/codes")
      val prefix = batchTag.map(_ + "-").getOrElse("")
      fs.listStatus(new Path(s"$stage/codes"))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
        .foreach { cell =>
          val target = new Path(s"$path/codes/${cell.getPath.getName}")
          if (!fs.exists(target)) fs.mkdirs(target)
          AppendProtocol.renameIn(fs, cell.getPath, target, prefix, "ivf-pq")
        }
      fs.delete(stagePath, true)
      // commit point: the marker lands only after every rename, so a
      // crash anywhere above leaves no marker and the retry cleans up
      batchTag.foreach(AppendProtocol.commitMarker(fs, markersDir, _))
    }
  }

  /** The data files of one `codes/c_id=…` cell directory, split into
    * COMMITTED (the base build's `part-*` files plus `<tag>-part-*`
    * files whose `appends/<tag>` marker landed) and ORPHANED (tagged
    * files whose append crashed before its marker — their rows are a
    * partial batch a retry will re-apply). Tags match
    * `[A-Za-z0-9._]+` (no `-`), so the segment before the first `-`
    * IS the tag, and `part` itself is a rejected tag — the parse is
    * unambiguous. Hidden bookkeeping files (`_`/`.` prefixes) are
    * neither. */
  private def splitCellFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      cell: org.apache.hadoop.fs.Path,
      committedTags: Set[String]): (Seq[org.apache.hadoop.fs.Path],
        Seq[org.apache.hadoop.fs.Path]) = {
    val files = fs.listStatus(cell)
      .filter(st => !st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath).toSeq
    files.partition(f => LayoutCensus.isCommitted(f.getName, committedTags))
  }

  /** The committed tag set of an index tree — the names under
    * `appends/`, each one a fully-applied [[appendIvfPqIndex]]
    * batch. */
  private def committedTags(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Set[String] =
    LayoutCensus.committedTags(fs,
      new org.apache.hadoop.fs.Path(s"$path/appends"))

  /** FILE-LAYOUT audit of an index tree (q184) — the small-files
    * alarm. Every [[appendIvfPqIndex]] batch adds its own part files
    * to each cell it touches, so a streamed index accumulates
    * `O(batches × cells)` files whose per-file open/footer/seek cost
    * eventually dominates the probe (the classic small-files problem
    * — at 100 TB the scan is billed per FILE as much as per row).
    * This audit is pure metadata: one namenode listing of the cell
    * directories (no data read, no Spark job), classifying each file
    * by the [[appendIvfPqIndex]] commit protocol. One row:
    *
    *  - `n_cells`, `n_files` — committed data files across cells;
    *  - `n_orphans` — tagged files with NO commit marker: a crashed
    *    append's partial leavings, surfaced because only the batch's
    *    own retry, [[sweepOrphans]] (the janitor for streams that
    *    will never retry), or a compaction's exclusion ever deals
    *    with them;
    *  - `files_per_cell_milli` — 1000·n_files/n_cells, integer;
    *  - `decision` — `compact` when `n_files + n_orphans ≥ factor ×
    *    n_cells` (compaction + an orphan sweep rewrite the listing to
    *    one file per cell, so the threshold reads "shrinking the
    *    listing would save ≥ `factor`×" — factor 4 is the same
    *    discipline as the occupancy and resolution audits). Orphans
    *    COUNT toward the threshold (round-16 advice): a probe scans
    *    orphan files too (the documented visible torn state), so a
    *    tree accumulating orphans from a decommissioned stream pays
    *    the per-file open tax exactly like committed fragmentation —
    *    only the REPAIR differs ([[sweepOrphans]] vs
    *    [[compactIvfPqIndex]], and a compact-to-new-path drops the
    *    orphans anyway).
    *
    * `factor` is a parameter because the threshold is a function of
    * the STORE's per-file-open cost, not a constant of the algorithm:
    * the local-FS tax curve (IvfPqCompactBench: 1.78× probe tax at
    * 17k files, 8.9× at 65k) is the FLOOR, and an object store
    * billing 10–50 ms per file open crosses "compaction pays" at a
    * lower files/cell — the slow-open re-derivation in BASELINE.md
    * sizes it.
    *
    * Unlike the occupancy/resolution audits this one is NOT
    * oracle-replayable — file layout is a property of the write
    * history, not of the corpus (DuckDB sees the same rows in any
    * layout) — so its gate is the weaker rows-only check plus specs;
    * the LATENCY claim behind the decision is measured by
    * IvfPqCompactBench, not asserted. */
  def fileAudit(spark: org.apache.spark.sql.SparkSession,
      path: String, factor: Long = 4L): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(factor >= 1, s"fileAudit factor=$factor must be >= 1")
    readIvfPqMeta(spark, path) // validate the tree before listing it
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val tags = committedTags(fs, path)
    val cells = fs.listStatus(new Path(s"$path/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
    val (nFiles, nOrphans) = cells.foldLeft((0L, 0L)) { case ((f, o), cell) =>
      val (committed, orphans) = splitCellFiles(fs, cell.getPath, tags)
      (f + committed.size, o + orphans.size)
    }
    val nCells = cells.length.toLong
    require(nCells > 0, s"fileAudit: $path/codes has no cell directories")
    val decision =
      LayoutCensus.elect(nFiles + nOrphans, nCells, factor, "compact")
    Seq((nCells, nFiles, nOrphans, nFiles * 1000L / nCells, decision))
      .toDF("n_cells", "n_files", "n_orphans", "files_per_cell_milli",
        "decision")
  }

  /** Delete ORPHANED append files — tagged code files whose
    * `appends/<tag>` marker never landed. The retrying appender
    * sweeps its OWN tag before re-applying, so orphans normally die
    * at retry; but a decommissioned stream never retries, and its
    * crashed final batch then sits in the cell directories forever —
    * counted by [[fileAudit]]'s `n_orphans`, scanned by every probe
    * (a partial batch is VISIBLE, the documented torn state between
    * crash and retry), and excluded-but-not-removed by
    * [[compactIvfPqIndex]]. This is the janitor for that terminal
    * case. Deleting an orphan is always safe for correctness — no
    * marker means the batch never committed, so a late retry
    * re-applies the WHOLE batch from scratch (the marker contract);
    * what is NOT safe is racing a live appender mid-batch, whose
    * not-yet-committed files look exactly like orphans — this op is
    * a WRITE under the single-writer-per-artifact rule, same as the
    * appender itself. Returns the number of files deleted. */
  def sweepOrphans(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    AppendProtocol.withWriterLease(fs, new Path(path),
        AppendProtocol.repairOwner("janitor"),
        AppendProtocol.committedAppendStaleIf(fs, new Path(s"$path/appends"))) {
      val tags = committedTags(fs, path)
      fs.listStatus(new Path(s"$path/codes"))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
        .foldLeft(0L) { (n, cell) =>
          val orphans = splitCellFiles(fs, cell.getPath, tags)._2
          orphans.foreach(f => fs.delete(f, false))
          n + orphans.size
        }
    }
  }

  /** Compaction CADENCE policy (q185's operator) — closes the layout
    * loop the way q169/q174 closed theirs: [[fileAudit]] says
    * compact/keep about the tree AS IT STANDS, but a deployment
    * schedules maintenance against the tree as it is GROWING, and
    * "how many more append batches until the probe tax crosses the
    * line" is derivable from the same metadata listing — committed
    * tags count the applied batches, tag-prefixed files count what
    * those batches added, and the ratio is the measured growth rate
    * of this tree's own write history (not a config guess). One row
    * of integers, no Spark job:
    *
    *  - `n_cells`, `n_files`, `n_orphans` — [[fileAudit]]'s census;
    *  - `n_batches` — committed append batches (`appends/` markers);
    *  - `append_files` — committed files those batches added
    *    (tag-prefixed); `files_per_batch_milli` = 1000·append_files /
    *    n_batches;
    *  - `batches_to_threshold` — ⌈(factor·n_cells − n_files −
    *    n_orphans) · n_batches / append_files⌉, the forecast horizon
    *    (0 when already over the line, −1 when there is no append
    *    history to extrapolate);
    *  - `decision` — `compact_now` when the [[fileAudit]] threshold
    *    is already crossed (probes pay the tax TODAY); `compact_within`
    *    when append history exists and the forecast horizon is finite
    *    (book the compaction `batches_to_threshold − 1` batches out —
    *    its cost is one codes shuffle, measured 26–47 s at the vec
    *    decade, vs a probe tax that compounds per batch after the
    *    line); else `keep` (no append history — nothing is growing).
    *
    * Orphans count toward the standing tax (probes scan them) but NOT
    * toward the growth rate (they are a crashed batch's leavings, not
    * a trend). Same rows-only gate contract as q184 — write history,
    * not corpus. The streaming append sink surfaces this election per
    * micro-batch ([[graft.streaming.StreamingOps.ivfPqAppendSink]]),
    * cached on [[indexStateSignature]] so replay-skipped batches
    * don't re-list the tree. */
  def compactionCadence(spark: org.apache.spark.sql.SparkSession,
      path: String, factor: Long = 4L): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(factor >= 1, s"compactionCadence factor=$factor must be >= 1")
    readIvfPqMeta(spark, path) // validate the tree before listing it
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val tags = committedTags(fs, path)
    val cells = fs.listStatus(new Path(s"$path/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
    require(cells.nonEmpty,
      s"compactionCadence: $path/codes has no cell directories")
    var nFiles = 0L; var nOrphans = 0L; var appendFiles = 0L
    val liveTags = scala.collection.mutable.Set[String]()
    cells.foreach { cell =>
      val (committed, orphans) = splitCellFiles(fs, cell.getPath, tags)
      nFiles += committed.size
      nOrphans += orphans.size
      committed.filterNot(_.getName.startsWith("part-")).foreach { f =>
        appendFiles += 1
        liveTags += f.getName.takeWhile(_ != '-')
      }
    }
    val nCells = cells.length.toLong
    val nBatches = tags.size.toLong
    // growth RATE on the LIVE epoch only (round-19): a compaction
    // carries markers (idempotence) but folds the tagged files into
    // anonymous part files, so rating appendFiles over the LIFETIME
    // marker count would mix epochs — post-repair the rate collapses
    // toward zero and the forecast under-books the next compaction.
    // The batches that still have files standing (distinct surviving
    // tags) are exactly the current epoch's appends.
    val liveBatches = liveTags.size.toLong
    val (decision, horizon) = LayoutCensus.forecast(
      nFiles + nOrphans, nCells, factor, liveBatches, appendFiles,
      "compact_now", "compact_within")
    Seq((nCells, nFiles, nOrphans, nBatches, appendFiles,
        if (liveBatches > 0L) appendFiles * 1000L / liveBatches else 0L,
        horizon, decision))
      .toDF("n_cells", "n_files", "n_orphans", "n_batches", "append_files",
        "files_per_batch_milli", "batches_to_threshold", "decision")
  }

  /** COMPACT an IVF-PQ index — rewrite the accumulated per-append
    * code files into one file per cell, changing NOTHING about the
    * rows: no retraining, no re-encoding, no re-assignment. The
    * cheapest maintenance op of all (one shuffle-by-cell of the
    * codes relation — it never touches vectors, codebooks, or Lloyd
    * chains) and the only one the [[fileAudit]] small-files alarm
    * calls for: append-heavy ingest fragments the cell directories,
    * and at scan time every file costs an open + footer read before
    * its first row, so probe latency degrades with WRITE HISTORY
    * while the data is unchanged. Compaction restores the
    * one-file-per-cell layout a fresh build ships. q183 gates it
    * bit-equal: the compacted tree's search results replay under
    * q170's verbatim oracle, because compaction by definition
    * changes no rows.
    *
    * Crash-consistency: only COMMITTED files are compacted — the
    * base build's plus tagged files whose `appends/<tag>` marker
    * landed ([[splitCellFiles]]). An ORPHANED partial batch (crashed
    * before its marker) is deliberately left behind: baking its rows
    * into anonymous compacted files would strand them beyond the
    * retrying appender's `<tag>-` cleanup sweep, double-applying the
    * batch when the retry lands. The `appends/` markers are CARRIED
    * onto the compacted tree — the compacted codes contain every
    * committed batch's rows, so a replayed batch (stream restart
    * from an old checkpoint) must still short-circuit on its marker;
    * dropping the markers would double-apply history. The
    * `resolution/` stamp is carried too: compaction permutes file
    * boundaries, not code tuples, so the publish-time verdict is
    * unchanged by construction (a pre-stamp source tree gets stamped
    * fresh from the rewritten codes).
    *
    * Output layout: `repartition(col("c_id"))` then
    * `partitionBy("c_id")` — each cell's rows land in exactly one
    * task, one file. `maxRecordsPerFile` (> 0) caps rows per file
    * for very hot cells (several files per cell, still O(1) per
    * compaction instead of O(batches)). Published via the same
    * all-or-nothing [[graft.sources.Artifacts.publishTree]] rename
    * as every build: a crash mid-compaction leaves the source tree
    * untouched and no target.
    *
    * Scale note: the committed-file list is enumerated on the driver
    * and handed to the reader as explicit paths (that is what makes
    * orphan EXCLUSION exact — an input_file_name filter would read
    * the orphan bytes before dropping their rows). At extreme
    * fragmentation (many millions of files) the FULL path list is
    * driver memory, so `cellBatch` (> 0) bounds it: the sorted cell
    * directories are processed in groups of ≤ `cellBatch` cells, each
    * group enumerating, reading, and writing ONLY its own cells'
    * committed files — the driver holds one group's list at a time,
    * and every group appends into the same build tree under the ONE
    * [[graft.sources.Artifacts.publishTree]] rename (groups own
    * disjoint cells, so the appends never collide and the composed
    * result is file-for-file the unbatched layout; spec-pinned
    * bit-equal in IvfPqSpec). Compacting earlier is still cheaper —
    * that is the audit's whole job — but the bounded path no longer
    * depends on it.
    *
    * Operational note: compact to a NEW path and flip the serving
    * pointer, don't compact in place under live readers —
    * publishTree's delete-then-rename leaves a window where the
    * target path has no tree at all, and a reader listing inside it
    * fails loudly (unlike the append protocol, whose per-file
    * renames readers see as grown prefixes). Compaction counts as a
    * WRITE under the single-writer-per-artifact rule: the appender
    * is PAUSED from compaction start to the end of the codes read —
    * enforced since round 19 by holding the source tree's writer
    * lease (owner `compact`), because a batch landed on the old tree
    * mid-compaction would be missing from the new tree's codes yet
    * invisible to a replay (markers are a start-of-compaction
    * snapshot); the window from lease release to the caller's
    * pointer flip remains the caller's serialization (appends landed
    * there go to a tree about to be dropped). Batches applied BEFORE the
    * compaction began are safe on both sides: their rows are in the
    * compacted codes and their carried markers short-circuit any
    * replay after the flip. */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String,
      maxRecordsPerFile: Long = 0L,
      cellBatch: Int = 0): Unit = {
    import org.apache.hadoop.fs.Path
    // (tree validation happens in compactInto's own meta read)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    // "pause the appender from compaction start to pointer flip" is
    // now ENFORCED, not prose (round-18 verdict #3): compaction holds
    // the SOURCE tree's writer lease for its whole read — an append
    // landing mid-compaction would be missing from the new tree's
    // codes yet invisible to replay (markers are a start-of-compaction
    // snapshot), so it must fail loudly instead. The caller's pointer
    // flip after this returns is its own serialization problem
    // (or use [[compactIvfPqIndexInPlace]], which holds the lease
    // ACROSS its flip).
    AppendProtocol.withWriterLease(fs, new Path(path),
        AppendProtocol.repairOwner("compact"),
        AppendProtocol.committedAppendStaleIf(fs, new Path(s"$path/appends"))) {
      compactInto(spark, path, outPath, maxRecordsPerFile, cellBatch)
    }
  }

  /** [[compactIvfPqIndex]]'s body, for callers already holding the
    * source tree's writer lease. */
  private def compactInto(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String,
      maxRecordsPerFile: Long,
      cellBatch: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val meta = readIvfPqMeta(spark, path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val tags = committedTags(fs, path)
    val cells = fs.listStatus(new Path(s"$path/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .map(_.getPath).sortBy(_.getName)
    // one group = the whole tree (legacy path) or ≤ cellBatch cells;
    // each group's committed-file list is the only one the driver
    // holds, and groups write disjoint cell partitions so appending
    // into the same build tree composes to the unbatched layout
    val groups =
      if (cellBatch <= 0) Seq(cells.toSeq)
      else cells.grouped(cellBatch).map(_.toSeq).toSeq
    graft.sources.Artifacts.publishTree(spark, outPath) { build =>
      // marker creation and build-side writes go through the BUILD
      // path's filesystem (round-16 advice): the scaladoc recommends
      // compacting to a NEW path, which may live on a different fs
      // than the source (hdfs → local, local → s3) — deriving the
      // marker fs from the source would land the carried markers on
      // the wrong filesystem and silently drop replay idempotence
      val outFs = new Path(build)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Seq("meta", "ivf", "codebooks").foreach { d =>
        spark.read.parquet(s"$path/$d")
          .coalesce(1).write.parquet(s"$build/$d")
      }
      var wroteAny = false
      groups.foreach { group =>
        val committed = group.flatMap(cell => splitCellFiles(fs, cell, tags)._1)
        if (committed.nonEmpty) {
          wroteAny = true
          // basePath keeps the c_id partition column while the
          // explicit file list excludes orphans
          val codes = spark.read.option("basePath", s"$path/codes")
            .parquet(committed.map(_.toString).toIndexedSeq: _*)
          val writer = codes.repartition(col("c_id"))
            .write.mode("append").partitionBy("c_id")
          (if (maxRecordsPerFile > 0L)
             writer.option("maxRecordsPerFile", maxRecordsPerFile)
           else writer).parquet(s"$build/codes")
        }
      }
      require(wroteAny,
        s"compactIvfPqIndex: $path/codes has no committed data files")
      val stamp = new Path(s"$path/resolution")
      if (fs.exists(stamp))
        spark.read.parquet(s"$path/resolution")
          .coalesce(1).write.parquet(s"$build/resolution")
      else stampResolution(spark, build, meta.m)
      tags.foreach { t =>
        val mk = new Path(s"$build/appends/$t")
        outFs.mkdirs(mk.getParent)
        outFs.create(mk, false).close()
      }
    }
  }

  /** COMPACT-AND-FLIP in place — the index-side twin of
    * [[VectorStore.rebuildStore]] (round-19): [[compactIvfPqIndex]]
    * compacts to a NEW path and leaves the pointer flip to the
    * caller, which is right for a deployment with a serving pointer —
    * but the maintenance dispatch the streaming sink's cadence
    * callback runs (the q186 election's repair arm) serves from ONE
    * fixed path, and hand-rolled delete+rename at every call site is
    * exactly the drift the shared protocol exists to prevent. This
    * operator owns the whole sequence under the artifact's writer
    * lease: compact to `<path>.compacting`, delete the live tree,
    * rename the compacted tree in. Holding the lease ACROSS the flip
    * closes the window [[compactIvfPqIndex]]'s scaladoc leaves to the
    * caller (an append between compaction and flip would land on a
    * tree about to be dropped); re-entry uses the `compact-flip`
    * owner (per-process — [[AppendProtocol.repairOwner]]), so the
    * operator's own same-process retries self-heal.
    *
    * Crash windows, walked: before the delete — live tree intact,
    * `.compacting` is rebuilt-from-scratch on retry (publishTree
    * replaces it). Between delete and rename — the live path is
    * MISSING (readers fail loudly, never wrongly; the same window the
    * compact-to-new-path + pointer-flip deployment avoids entirely —
    * a fixed-path deployment accepts it, which is why both operators
    * exist) and the retry completes the rename because `.compacting`
    * is a full tree. After the rename — done; retry rebuilds a fresh
    * `.compacting` from the already-compacted tree and swaps again,
    * idempotent by rows. */
  def compactIvfPqIndexInPlace(spark: org.apache.spark.sql.SparkSession,
      path: String, maxRecordsPerFile: Long = 0L,
      cellBatch: Int = 0): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new Path(path + ".compacting")
    val owner = AppendProtocol.repairOwner("compact-flip")
    AppendProtocol.withWriterLease(fs, live, owner,
        AppendProtocol.committedAppendStaleIf(fs, new Path(s"$path/appends"))) {
      // retry of a crash AFTER the delete: the live path holds no
      // tree (at most the just-created lease file — acquiring the
      // lease recreates the bare directory, so exists() can't tell)
      // but the staged one is complete — finish the flip, don't
      // recompact. publishTree's all-or-nothing rename is what makes
      // "staged meta exists" equal "staged tree is complete".
      val liveIsTree = fs.exists(new Path(live, "meta"))
      val stagedIsTree = fs.exists(new Path(staged, "meta"))
      if (!liveIsTree && stagedIsTree) {
        fs.delete(live, true) // the bare lease-only shell
        require(fs.rename(staged, live), s"compact flip rename failed: $staged")
      } else {
        compactInto(spark, path, staged.toString, maxRecordsPerFile, cellBatch)
        // carry THIS writer's lease inside the staged tree, so the
        // post-rename live tree is leased by us the instant it lands
        // (withWriterLease's owner-checked finally then releases it)
        AppendProtocol.acquireLease(fs, staged, owner)
        // the flip: between this delete and the rename the live path
        // is MISSING — a reader fails loudly, never wrongly (the
        // window a serving-pointer deployment avoids by using
        // [[compactIvfPqIndex]] + its own flip), and a WRITER racing
        // in acquires a lease whose create recreates the bare live
        // dir, which makes our rename NEST the staged tree inside it
        // (Hadoop rename-into-existing-dir semantics) — so the
        // post-flip shape is verified loudly below instead of
        // trusting rename's return value.
        fs.delete(live, true)
        require(fs.rename(staged, live), s"compact flip rename failed: $staged")
      }
      require(fs.exists(new Path(live, "meta")),
        s"compact flip left no index tree at $live — a concurrent " +
          s"writer re-created the path mid-flip (its lease landed " +
          s"between delete and rename, nesting the staged tree); the " +
          s"staged data is intact under $live — recover it manually. " +
          s"This is the loud form of a single-writer violation.")
    }
  }

  /** Coarse-rebalance of an IVF-PQ index — the MIDDLE rung of the
    * maintenance ladder between [[appendIvfPqIndex]] (batch share)
    * and [[buildIvfPqIndex]] (full retrain): retrain ONLY the coarse
    * codebook over the grown corpus, keep the STANDING PQ codebooks
    * verbatim, re-encode every item against the new cells. The q172
    * occupancy audit is what calls for it: appends grow cells in
    * place, and a drifted ingest skews the COARSE partition (hot
    * cells inflate every probe that touches them) even while
    * per-subspace reconstruction error stays flat — re-cutting the
    * cells restores probe-cost balance without paying the m
    * per-subspace Lloyd chains that dominate a full rebuild. Caveat
    * carried honestly: the standing PQ codebooks were trained on
    * residuals against the OLD cells; after a rebalance they quantize
    * residuals against cells they never saw. On a stationary corpus
    * the residual distribution barely moves (q173's gate pins
    * end-to-end search quality); under real distribution drift the
    * q171 audit fires first and the answer is a full rebuild.
    */
  def rebalanceIvfPqIndex(
      items: DataFrame,
      itemId: String,
      vecCol: String,
      path: String,
      outPath: String): Unit = {
    val spark = items.sparkSession
    import spark.implicits._
    val meta = readIvfPqMeta(spark, path)
    val cbs = readPqCbs(spark, path)
    val it = items.select(col(itemId).cast("long").as("i_id"),
      col(vecCol).as("i_vec"))
    // new coarse cells over the GROWN corpus — the same deterministic
    // integer Lloyd and driver budget as buildIvfPqIndex's coarse step
    val ivfCb = SemDedup.lloydCentroids(it, "i_id", "i_vec",
      k = meta.centroids, iters = 2)
    val effAssign = math.min(meta.assignments, ivfCb.size)
    graft.sources.Artifacts.publishTree(spark, outPath) { build =>
      Seq((meta.dim, meta.m, meta.k, meta.centroids, meta.iters,
          meta.residual, effAssign))
        .toDF("dim", "m", "k", "centroids", "iters", "residual",
          "assignments")
        .coalesce(1).write.parquet(s"$build/meta")
      ivfCb.toDF("c_id", "cv")
        .coalesce(1).write.parquet(s"$build/ivf")
      // standing PQ codebooks travel verbatim — rebalance retrains
      // nothing below the coarse level
      cbs.zipWithIndex
        .flatMap { case (cb, s) => cb.map { case (code, cv) => (s, code, cv) } }
        .toDF("subspace", "code", "cv")
        .coalesce(1).write.parquet(s"$build/codebooks")
      encodeCodes(it, ivfCb, cbs, meta.dim, meta.residual, effAssign)
        .write.partitionBy("c_id").parquet(s"$build/codes")
      stampResolution(spark, build, meta.m)
    }
  }

  /** RESIDUAL-SPACE codebook-drift audit (q175's operator) — the
    * refined instrument the `AnnDriftBench` measurement called for:
    * the flat-subvector audit ([[codebooks]] + [[encodeWith]], q171)
    * fires on ANY distribution move, including pure translations that
    * a coarse-only rebalance fully absorbs (residuals are
    * translation-invariant). This audit instead prices the standing
    * PQ codebooks in the representation a deployment would actually
    * rebalance INTO: residuals against a freshly re-cut coarse
    * codebook over the grown corpus. Standing-proxy codebooks train
    * on the OLD corpus's residuals vs the OLD coarse (the audit-
    * budget analogue of the index's standing codebooks); retrained
    * codebooks train on the GROWN corpus's residuals vs the NEW
    * coarse; BOTH are evaluated on the grown-residuals-vs-new-coarse
    * rows — exact integer reconstruction error, the q171 arithmetic.
    * `retrain` fires only when even after a re-cut the standing
    * codebooks cost > 5 % more error than retraining buys back —
    * i.e. when the event is genuinely a codebook event, not a
    * partition event. */
  def residualDriftAudit(
      oldItems: DataFrame,
      grownItems: DataFrame,
      itemId: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      centroids: Int,
      oldCoarse: Option[Seq[(Long, Seq[Long])]] = None,
      newCoarse: Option[Seq[(Long, Seq[Long])]] = None,
      standingCbs: Option[Seq[Seq[(Long, Seq[Long])]]] = None,
      retrainedCbs: Option[Seq[Seq[(Long, Seq[Long])]]] = None): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val o = oldItems.select(col(itemId).cast("long").as("i_id"),
      col(vecCol).as("i_vec"))
    val g = grownItems.select(col(itemId).cast("long").as("i_id"),
      col(vecCol).as("i_vec"))
    // the two coarse codebooks usually already EXIST as artifacts —
    // the standing tree's ivf/ (old corpus) and the rebalanced
    // tree's ivf/ (grown corpus) — so callers pass them in instead
    // of retraining (q175 reads both via [[readIvfCb]]; the audit
    // then costs only the m audit-budget chains + one eval pass).
    // The audit-budget RESIDUAL codebook sets are likewise pure
    // corpus derivatives ([[auditResidualCodebooks]]), so a caller
    // that persists them as versioned artifacts pays only the eval
    // pass on a warm run (round-15: q175's amortization).
    val oldCb = oldCoarse.getOrElse(SemDedup.lloydCentroids(
      o, "i_id", "i_vec", k = centroids, iters = 2))
    val newCb = newCoarse.getOrElse(SemDedup.lloydCentroids(
      g, "i_id", "i_vec", k = centroids, iters = 2))
    residualDriftEval(g, dim, m, newCb,
      standingCbs.getOrElse(
        residualCodebooks(o, dim, m, k, iters, oldCb, residual = true)),
      retrainedCbs.getOrElse(
        residualCodebooks(g, dim, m, k, iters, newCb, residual = true)))
  }

  /** The m audit-budget residual Lloyd chains of [[residualDriftAudit]]
    * as a standalone trainer — public so callers can persist the
    * codebook sets as versioned artifacts (they are pure derivatives
    * of (`items`, `coarse`)) and feed them back via the audit's
    * `standingCbs`/`retrainedCbs`, leaving only the eval pass on the
    * warm path. */
  def auditResidualCodebooks(
      items: DataFrame,
      itemId: String,
      vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int,
      coarse: Seq[(Long, Seq[Long])]): Seq[Seq[(Long, Seq[Long])]] =
    residualCodebooks(
      items.select(col(itemId).cast("long").as("i_id"),
        col(vecCol).as("i_vec")),
      dim, m, k, iters, coarse, residual = true)

  /** The EVAL pass of [[residualDriftAudit]]: grown residuals vs the
    * new coarse, priced under both codebook sets. */
  private def residualDriftEval(
      g: DataFrame,
      dim: Int, m: Int,
      newCb: Seq[(Long, Seq[Long])],
      standing: Seq[Seq[(Long, Seq[Long])]],
      retrained: Seq[Seq[(Long, Seq[Long])]]): DataFrame = {
    val sub = dim / m
    // grown residuals vs the NEW coarse — the post-rebalance
    // representation; staged selects per the kmeansAssign quirk
    val s1 = g.select(col("i_id").as("id"),
        SemDedup.quantizeMilli(col("i_vec")).as("mv"))
      .select(col("id"), col("mv"),
        SemDedup.assignClusterMilli(col("mv"), newCb).as("c_id"))
      .select(col("id") +: (0 until m).map(s =>
        subMilli(col("mv"), col("c_id"), newCb, s, sub,
          residual = true).as(s"mv$s")): _*)
    val s2 = s1.select(col("id") +: (0 until m).flatMap(s => Seq(
      col(s"mv$s"),
      SemDedup.assignClusterMilli(col(s"mv$s"), standing(s)).as(s"ca$s"),
      SemDedup.assignClusterMilli(col(s"mv$s"), retrained(s)).as(s"cb$s"))): _*)
    def errOf(cbs: Seq[Seq[(Long, Seq[Long])]], p: String) =
      (0 until m).map { s =>
        SemDedup.sqDistInt(col(s"mv$s"),
          element_at(typedLit(cbs(s).toMap), col(s"$p$s")))
      }.reduce(_ + _)
    s2.agg(count(lit(1)).as("n_rows"),
        sum(errOf(standing, "ca")).as("err_standing"),
        sum(errOf(retrained, "cb")).as("err_retrained"))
      .select(col("n_rows"), col("err_standing"), col("err_retrained"),
        when((col("err_standing") - col("err_retrained")) * 20 >
          col("err_retrained"), lit("retrain"))
          .otherwise(lit("keep")).as("residual_decision"))
  }

  /** Cell-occupancy audit of an IVF-PQ index tree (q172's operator):
    * one row of integer occupancy statistics + the rebalance decision
    * from a codes-only scan — `c_id` is the PARTITION column, so the
    * audit reads directory names and row counts, never decoding a
    * code. `skew_milli` = max·occupied·1000 DIV total (1000 =
    * perfectly balanced); decision `rebalance` when the hottest cell
    * exceeds 4× the mean occupancy or > 25 % of cells sit empty —
    * probe cost is proportional to the probed cells' occupancy, so
    * skew IS the probe-latency forecast, and an empty cell wastes a
    * probe slot. */
  def occupancyAudit(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    occupancyAuditOf(spark.read.parquet(s"$path/codes"),
      readIvfPqMeta(spark, path).centroids)

  /** Cheap change-signature of an IVF-PQ index tree: the `meta/`
    * sidecar's data-file fingerprint (a
    * [[graft.sources.Artifacts.publishTree]] republish — build,
    * rebalance, retrain — swaps in a freshly written tree, so the
    * file names/lengths/mtimes move; see [[LayoutCensus.dirFingerprint]] for why
    * the directory's own mtime is NOT the key) plus the sorted `appends/`
    * marker names (every TAGGED append writes one, LAST). Two metadata
    * reads, no Spark job — the invalidation key the adaptive search
    * sink caches its occupancy-audit row on. What it deliberately
    * cannot see: an UNTAGGED `appendIvfPqIndex` leaves no marker; the
    * streaming append sink always tags (its batchId IS the tag), and
    * out-of-band untagged appends are already documented as
    * at-least-once/non-idempotent — a deployment doing them forfeits
    * audit caching along with replay safety. */
  def indexStateSignature(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val appends = new Path(s"$path/appends")
    val tags =
      if (fs.exists(appends))
        fs.listStatus(appends).map(_.getPath.getName).sorted.mkString(",")
      else ""
    s"${LayoutCensus.dirFingerprint(fs, new Path(s"$path/meta"))}|$tags"
  }

  /** The fields of one cached occupancy-audit row ([[occupancyAudit]]
    * projected to what the dispatches consume). */
  final case class OccupancySnapshot(searchMode: String, nCodes: Long,
      nCellsOccupied: Long, maxCell: Long)

  /** Driver-side cache of the per-tree audit reads a search dispatch
    * makes — the streaming search sink's round-15 discipline
    * (recompute only when the tree's state signature moved) unified
    * for the BATCH dispatches (round-16 verdict: q181/q182 made 4
    * sequential 1-row collects per invocation; a query service pays
    * metadata reads only when the tree moved). Three caches, each
    * keyed on the narrowest signature that can invalidate it:
    *
    *  - meta ([[readIvfPqMeta]]) and the resolution verdict
    *    ([[resolutionStamp]]) change only at PUBLISH — keyed on the
    *    `meta/` sidecar's data-file fingerprint (appends move the full
    *    [[indexStateSignature]] but can change neither);
    *  - the occupancy snapshot changes with every append — keyed on
    *    the full [[indexStateSignature]];
    *  - a bare stamp directory (the int8 arm's tree has no `meta/`) —
    *    keyed on the `resolution/` data-file fingerprint.
    *
    * Values are O(1) rows; the maps never hold data-sized state. Load
    * counters are exposed for the spec that pins "no re-read on an
    * unchanged tree". */
  object audits {
    import java.util.concurrent.ConcurrentHashMap
    import java.util.concurrent.atomic.AtomicLong
    private val metaCache = new ConcurrentHashMap[String, (String, IvfPqMeta)]()
    private val resCache = new ConcurrentHashMap[String, (String, String)]()
    private val occCache =
      new ConcurrentHashMap[String, (String, OccupancySnapshot)]()
    private val stampCache = new ConcurrentHashMap[String, (String, String)]()
    private val ivfCbCache =
      new ConcurrentHashMap[String, (String, Seq[(Long, Seq[Long])])]()
    private val pqCbsCache =
      new ConcurrentHashMap[String, (String, Seq[Seq[(Long, Seq[Long])]])]()
    private val cellOccCache =
      new ConcurrentHashMap[String, (String, Map[Long, Long])]()
    private[graft] val metaLoads = new AtomicLong
    private[graft] val resolutionLoads = new AtomicLong
    private[graft] val occupancyLoads = new AtomicLong
    private[graft] val stampLoads = new AtomicLong
    private[graft] val codebookLoads = new AtomicLong
    private[graft] val cellOccLoads = new AtomicLong

    /** The meta sidecar's data-file fingerprint ([[LayoutCensus.dirFingerprint]]):
      * a publish rewrites the sidecar's files, an append touches only
      * `codes/` + `appends/` — so this key moves exactly when meta or
      * the resolution verdict can have changed, independent of
      * filesystem mtime granularity. */
    private def metaKey(spark: org.apache.spark.sql.SparkSession,
        path: String): String = {
      val p = new org.apache.hadoop.fs.Path(s"$path/meta")
      LayoutCensus.dirFingerprint(
        p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }

    def meta(spark: org.apache.spark.sql.SparkSession,
        path: String): IvfPqMeta = {
      val key = metaKey(spark, path)
      metaCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { metaLoads.incrementAndGet()
          (key, readIvfPqMeta(spark, path)) })._2
    }

    def resolutionDecision(spark: org.apache.spark.sql.SparkSession,
        path: String): String = {
      val key = metaKey(spark, path)
      resCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { resolutionLoads.incrementAndGet()
          (key, resolutionStamp(spark, path)
            .select(col("decision")).collect().head.getString(0)) })._2
    }

    def occupancy(spark: org.apache.spark.sql.SparkSession,
        path: String): OccupancySnapshot = {
      val key = indexStateSignature(spark, path)
      occCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { occupancyLoads.incrementAndGet()
          val r = occupancyAudit(spark, path)
            .select(col("search_mode"), col("n_codes"),
              col("n_cells_occupied"), col("max_cell")).collect().head
          (key, OccupancySnapshot(r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3))) })._2
    }

    /** Both codebook relations of an index tree, collected once per
      * PUBLISH (round-20: every probe invocation re-collected ~4 KB of
      * codebooks through two plan+job round-trips — ~2 jobs × 9
      * rerank-family gates × 2 bench passes on an unchanged tree).
      * Keyed on [[metaKey]]: `ivf/` and `codebooks/` are rewritten
      * only by a publish (append touches codes/ + appends/ only), and
      * every publish rewrites the `meta/` sidecar in the same renamed
      * tree. */
    def ivfCb(spark: org.apache.spark.sql.SparkSession,
        path: String): Seq[(Long, Seq[Long])] = {
      val key = metaKey(spark, path)
      ivfCbCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { codebookLoads.incrementAndGet()
          (key, readIvfCb(spark, path)) })._2
    }

    def pqCbs(spark: org.apache.spark.sql.SparkSession,
        path: String): Seq[Seq[(Long, Seq[Long])]] = {
      val key = metaKey(spark, path)
      pqCbsCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { codebookLoads.incrementAndGet()
          (key, readPqCbs(spark, path)) })._2
    }

    /** The full per-cell occupancy map the scan-budget walk reads
      * (≤ `centroids` rows) — keyed on the full
      * [[indexStateSignature]] like the occupancy snapshot, because
      * every append moves it. */
    def cellOccupancy(spark: org.apache.spark.sql.SparkSession,
        path: String): Map[Long, Long] = {
      val key = indexStateSignature(spark, path)
      cellOccCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { cellOccLoads.incrementAndGet()
          (key, cellCounts(spark.read.parquet(s"$path/codes")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap) })._2
    }

    /** The `resolution/` stamp of a tree WITHOUT a `meta/` sidecar
      * (the int8 arm) — keyed on the stamp's own data-file
      * fingerprint (same mtime-granularity rationale as [[metaKey]]). */
    def stampDecision(spark: org.apache.spark.sql.SparkSession,
        path: String): String = {
      val p = new org.apache.hadoop.fs.Path(s"$path/resolution")
      val key = LayoutCensus.dirFingerprint(
        p.getFileSystem(spark.sessionState.newHadoopConf()), p)
      stampCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == key) prev
        else { stampLoads.incrementAndGet()
          (key, spark.read.parquet(s"$path/resolution")
            .select(col("decision")).collect().head.getString(0)) })._2
    }
  }

  /** Per-cell occupancy of a codes relation — the ONE occupancy
    * reader shared by [[occupancyAuditOf]] (the q172 audit) and the
    * scan-budget probe path (the q176 dial), so the two readers can't
    * drift. `c_id` is the PARTITION column and parquet partition
    * discovery infers it as int — the cast to long is load-bearing
    * (collectors read `getLong`, and every other c_id in this file is
    * a long). */
  private[graft] def cellCounts(codes: DataFrame): DataFrame =
    codes
      .groupBy(col("c_id").cast("long").as("c_id"))
      .agg(count(lit(1)).as("cell_n"))

  /** [[occupancyAudit]] over an explicit codes relation — the
    * formula, separated so the decision branches are spec-testable
    * without engineering a skewed Lloyd outcome. */
  private[graft] def occupancyAuditOf(codes: DataFrame,
      centroids: Int): DataFrame =
    cellCounts(codes)
      .agg(count(lit(1)).as("n_cells_occupied"),
        sum(col("cell_n")).as("n_codes"),
        max(col("cell_n")).as("max_cell"),
        min(col("cell_n")).as("min_cell"))
      .select(col("n_cells_occupied"),
        (lit(centroids.toLong) - col("n_cells_occupied"))
          .as("n_cells_empty"),
        col("n_codes"), col("max_cell"), col("min_cell"),
        expr("max_cell * n_cells_occupied * 1000 DIV n_codes")
          .as("skew_milli"))
      .withColumn("decision",
        when(col("skew_milli") > 4000 ||
          col("n_cells_empty") * 4 > centroids.toLong, lit("rebalance"))
          .otherwise(lit("keep")))
      // the SEARCH-side half of the alarm: a rebalance takes time to
      // land, and until it does every fixed-probe query that touches
      // the hot cell pays its inflated occupancy — so the same skew
      // signal that elects `rebalance` ALSO switches searches to the
      // scan-budget dial ([[ivfPqCandidatesBudget]]), which bounds
      // ROWS scanned instead of cells probed and is flat under skew
      // by construction. Empty cells alone don't flip the mode: they
      // waste probe slots but cost no scan bytes.
      .withColumn("search_mode",
        when(col("skew_milli") > 4000, lit("scan_budget"))
          .otherwise(lit("fixed_probes")))

  /** BIT-BUDGET (resolution) audit of an IVF-PQ index tree — the
    * instrument for the one maintenance outcome the ladder cannot
    * fix: when an ingest's mutual distances fall below the PQ bit
    * budget's resolution, retraining measures nothing improved
    * (AnnDriftBench's compress scenario: recall ~0.02 on append,
    * rebalance AND full rebuild). The discrete resolution test: two
    * items in the same cell with the SAME code tuple have ADC
    * distance zero between them — the index literally cannot rank
    * them — so a populated cell whose rows collapse onto few code
    * tuples is a cell the CURRENT bit budget cannot resolve, no
    * matter how fresh the codebooks are. Run it on the
    * POST-RETRAIN representation (a tree whose codebooks trained on
    * the corpus they encode, e.g. q167's artifact): a flag there
    * means more bits (raise m·log₂k) or the exact-vector IVF path
    * ([[SimilaritySearch.buildIvfIndex]] — cells store vectors,
    * distances are exact floats) — the escalation ABOVE `retrain`
    * on the maintenance ladder.
    *
    * One row of integers from a codes-only scan: per cell, row count
    * and DISTINCT code-tuple count (two chained group-bys — partial
    * aggs, no countDistinct, no Expand); a cell with ≥ `minCell`
    * rows is flagged when its rows outnumber its tuples more than
    * `loadFactor`-fold (tuples·loadFactor < rows ⟺ > loadFactor
    * rows per indistinguishable tuple on average). Thresholds from
    * measurement on the drift trees: a healthy or merely-translated
    * corpus sits at exactly 1.000 rows/tuple (zero collisions, sf1
    * and the 1.8 M-code vec1m tree alike) while the compress
    * ingest's REBUILT tree hits 8.65 rows/tuple with 47 % of all
    * codes in flagged cells — the factor-4 flag sits between two
    * regimes separated by ~9×.
    *
    * Scale shape: group-by over the coded relation (42× smaller than
    * the corpus), centroids-bounded second level, 1-row output —
    * strictly cheaper than the drift audit it escalates. */
  def resolutionAudit(spark: org.apache.spark.sql.SparkSession,
      path: String, minCell: Long = ResolutionMinCell,
      loadFactor: Long = ResolutionLoadFactor): DataFrame = {
    val meta = readIvfPqMeta(spark, path)
    resolutionAuditOf(
      spark.read.parquet(s"$path/codes"), meta.m, minCell, loadFactor)
  }

  /** [[resolutionAudit]] over an explicit codes relation — the
    * formula, separated so the decision branches are spec-testable
    * on constructed code relations. */
  private[graft] def resolutionAuditOf(codes: DataFrame, m: Int,
      minCell: Long, loadFactor: Long): DataFrame =
    resolutionCensus(codes, (0 until m).map(s => col(s"code$s")),
      minCell, loadFactor)

  /** The census itself, REPRESENTATION-GENERIC (round-16): per cell,
    * rows vs distinct stored-tuple count, flagged when rows outnumber
    * tuples more than `loadFactor`-fold. The PQ audit passes its
    * code columns; the int8 exact arm passes its quantized-vector
    * column ([[SimilaritySearch.buildIvfIndexInt8]]) — two items a
    * representation stores identically are items it provably cannot
    * rank, whatever the representation is, so every lossy rung of
    * the search ladder stamps the SAME instrument at publish and the
    * dispatch walks down until a rung's own stamp says it can
    * resolve the corpus. */
  private[graft] def resolutionCensus(rel: DataFrame,
      tupleCols: Seq[Column], minCell: Long, loadFactor: Long): DataFrame = {
    require(minCell >= 1 && loadFactor >= 1)
    val eval = col("cell_n") >= minCell
    val flagged = eval && col("n_tuples") * loadFactor < col("cell_n")
    rel
      .groupBy(col("c_id").cast("long").as("c_id") +: tupleCols: _*)
      .agg(count(lit(1)).as("tuple_n"))
      .groupBy(col("c_id"))
      .agg(sum(col("tuple_n")).as("cell_n"),
        count(lit(1)).as("n_tuples"))
      .agg(sum(col("cell_n")).as("n_codes"),
        sum(eval.cast("long")).as("n_cells_eval"),
        sum(flagged.cast("long")).as("n_cells_flagged"),
        sum(when(flagged, col("cell_n")).otherwise(0L)).as("flagged_codes"),
        coalesce(max(when(eval,
            expr("cell_n * 1000 DIV n_tuples"))), lit(0L))
          .as("max_tuple_load_milli"))
      .withColumn("decision",
        when(col("n_cells_flagged") > 0, lit("bit_budget"))
          .otherwise(lit("fit")))
  }

  /** Collect the coarse codebook relation of an index tree (≤
    * `centroids` rows — driver-bounded like every codebook). */
  private[graft] def readIvfCb(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, Seq[Long])] =
    spark.read.parquet(s"$path/ivf")
      .orderBy(col("c_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq

  /** Collect the PQ codebooks relation of an index tree (m·k rows). */
  private[graft] def readPqCbs(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Seq[(Long, Seq[Long])]] =
    spark.read.parquet(s"$path/codebooks")
      .orderBy(col("subspace"), col("code")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Long](2).toSeq)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).toSeq)

  /** Probe-bounded ADC candidate search over a [[buildIvfPqIndex]]
    * artifact — the IVFADC query plan:
    *
    *  1. both codebooks (a few KB each) are collected and inlined as
    *     literals, like every codebook in this shop;
    *  2. each query ranks the coarse centroids per-row and keeps its
    *     `probes` nearest cells; per (query, cell) it precomputes the
    *     m RESIDUAL lookup tables — LUT_s[code] = ||(q−c)_sub −
    *     centroid_code||² in exact longs (the [[adcTopK]] LUT
    *     discipline; residual LUTs are per-cell by definition, which
    *     is why IVFADC batches queries: the broadcast relation is
    *     |Q|·probes rows × m·k longs, the operator's explicit
    *     query-batch budget);
    *  3. the DISTINCT probed cell ids (≤ `centroids` longs — a
    *     driver-bounded collect like the codebooks) become a static
    *     partition filter on the coded scan, so only the probed
    *     cells' files are READ — scan bytes ≈ corpus ·
    *     (probes/centroids) / 42, vs [[adcTopKFromIndex]]'s full
    *     coded scan;
    *  4. parallelism is re-pinned on the byte-tiny filtered scan (the
    *     q163 single-task trap), then the broadcast-LUT equi-join on
    *     c_id fans out into the bounded-heap [[TopK]].
    *
    * Recall < 1 two ways (cell pruning + code quantization); both are
    * priced by the TunePq sweep and recovered by the exact re-rank
    * the q167 gate runs on these candidates.
    *
    * Layout parameters (m, k, residual, assignments) are DERIVED from
    * the index's persisted `meta/` relation — the caller supplies
    * only search knobs; `dim` is cross-checked against meta and a
    * mismatch fails loudly (round-12 advice: a trusted-argument
    * mismatch fails silently with duplicate neighbors or wrong
    * distances).
    *
    * The LUT broadcast is |Q|·probes rows × m·k longs — ~49 KB per
    * query at the shipped m=8/k=64/probes=12 — so `maxQueryBatch`
    * ENFORCES the documented query-batch budget instead of just
    * stating it: a larger query relation is split into
    * ⌈|Q|/maxQueryBatch⌉ hash-disjoint chunks, each searched under
    * its own bounded broadcast, and the per-chunk top-k union IS the
    * whole answer (queries are independent — the split partitions
    * them, it never splits one query's candidates). Default 256 ≈ a
    * 13 MB broadcast ceiling.
    *
    * Chunks run as INDEPENDENT JOBS, each `localCheckpoint`ed before
    * the union: the codebooks/cell-map literals appear in every
    * chunk's plan, so a lazy N-way union would hand the analyzer one
    * plan that grows with |Q| (measured: a 1250-chunk union pinned
    * the driver in `DeduplicateRelations` for over half an hour at
    * sf10 — analysis cost must NOT scale with the data-dependent
    * chunk count). Checkpointing truncates each chunk to its ≤
    * topK·|chunk| result rows, which is also the deployment shape: a
    * query stream drains budget-bounded batches one at a time.
    * Up to [[ChunkConcurrency]] chunk jobs run at once (each chunk
    * has per-job fixed costs — scheduling, the LUT broadcast, the
    * checkpoint write — measured ~0.85 s/chunk when sequential:
    * 63 sequential chunks cost 56 s where one batch costs ~4 s).
    * Concurrency bounds wall-clock at ⌈chunks/4⌉ waves while at most
    * 4 × the per-chunk LUT budget is broadcast-live at any moment;
    * the query relation is checkpointed ONCE so the per-chunk filter
    * scans |Q| materialized rows, not the query source plan.
    *
    * @return (query_id, rank, neighbor_id, adc_dist)
    */
  def ivfPqCandidates(
      queries: DataFrame,
      path: String,
      dim: Int,
      topK: Int,
      probes: Int,
      queryId: String,
      queryVec: String,
      maxQueryBatch: Int = 256): DataFrame = {
    require(probes >= 1)
    ivfPqCandidatesImpl(queries, path, dim, topK, Left(probes),
      queryId, queryVec, maxQueryBatch)
  }

  /** Size a scan budget to a per-query scanned-rows SLO — the
    * deployment rule behind the q176/q177 dial (round-14 verdict:
    * "size the budget to your latency SLO" needs arithmetic, not
    * prose). The budget walk keeps a query's next-nearest cell while
    * the strictly-preceding kept cells hold < `budget` codes, so the
    * worst case a query scans is `budget − 1` prior rows plus one
    * final cell — at most `budget − 1 + max_cell` rows. Solving for
    * the SLO: `budget = targetRowsPerQuery − max_cell + 1` guarantees
    * every query scans ≤ `targetRowsPerQuery` rows, for ANY skew the
    * appends produce, because `max_cell` is read from the live
    * occupancy map (the same ≤ centroids-row driver-bounded
    * [[cellCounts]] read the audit and the dial share). Floored at 1:
    * the nearest non-empty cell is always probed, so `max_cell` rows
    * is the irreducible worst case — a target below it sizes the
    * walk to that floor rather than failing. Monotone in the target
    * by construction (a looser SLO never shrinks the walk). */
  def sizeScanBudget(occ: Map[Long, Long], targetRowsPerQuery: Long): Long =
    sizeScanBudgetFromMax(
      if (occ.isEmpty) 0L else occ.valuesIterator.max, targetRowsPerQuery)

  /** The sizing formula itself — `max_cell` is its ONLY occupancy
    * input, so callers already holding an audit row (q172's
    * `max_cell` column) size without a second occupancy read. */
  def sizeScanBudgetFromMax(maxCell: Long, targetRowsPerQuery: Long): Long = {
    require(targetRowsPerQuery >= 1, "targetRowsPerQuery must be >= 1")
    require(maxCell >= 0, "maxCell must be >= 0")
    math.max(1L, targetRowsPerQuery - maxCell + 1L)
  }

  /** Calibration of the rerank-width recall model — the constants of
    * `recall ≈ c · width^beta / corpusSize^gamma`, fitted in log
    * space to AnnRecallBench's measured width×size grid at the
    * data-bound decade (sf 0.1 tree parameters 32/12/2, exact-rerank
    * recall@5; BASELINE.md round-15/16 tables):
    * width 50 → 0.255 @ 921k items / 0.184 @ 3.69M; width 400 →
    * 0.563 / 0.455. Fit residuals ≤ ±6 % relative at all four
    * points. The model is an honest POWER-LAW INTERPOLATION of that
    * grid, not physics: it holds in the regime the grid covers
    * (near-uniform corpora past ~10⁶ items, where recall is
    * width-bound — the round-15 measurement) and saturates below it
    * (at sf0.1's 1.8k items the true recall 0.708 exceeds the
    * extrapolation's cap-clamped value, which is why the sizing rule
    * floors at the gates' width 50 instead of trusting the model
    * down there). A deployment re-fits the three constants from its
    * own AnnRecallBench grid — the rule's SHAPE, not its numbers, is
    * the contract. */
  final case class RerankCalibration(
      c: Double = 0.723778, beta: Double = 0.408133,
      gamma: Double = 0.194287) {
    require(c > 0 && beta > 0 && gamma >= 0,
      s"calibration must have c>0, beta>0, gamma>=0, got $this")
  }

  /** Fit the [[RerankCalibration]] constants from a measured
    * width×size recall grid — the re-fit operator the round-16
    * verdict asked for (#2): "a deployment re-fits from its own grid"
    * was scaladoc prose, and a re-fit meant editing source. This is
    * the BASELINE.md fit recipe as arithmetic, replayable by the
    * DuckDB oracle (q185) because every operation is a fixed-order
    * scalar expression over the grid literals:
    *
    *  - `beta` = mean of the two width slopes:
    *    (ln(r(w_hi,n_lo)/r(w_lo,n_lo)) + ln(r(w_hi,n_hi)/r(w_lo,n_hi)))
    *    / (2·ln(w_hi/w_lo));
    *  - `gamma` = mean of the two size slopes (negated):
    *    (ln(r(w_lo,n_lo)/r(w_lo,n_hi)) + ln(r(w_hi,n_lo)/r(w_hi,n_hi)))
    *    / (2·ln(n_hi/n_lo));
    *  - `ln c` = mean intercept over the four points in the fixed
    *    order (w_lo,n_lo), (w_lo,n_hi), (w_hi,n_lo), (w_hi,n_hi).
    *
    * The grid must be a 2×2 FACTORIAL (two widths × two sizes, each
    * combination once) — the saturated design where this closed form
    * IS the least-squares solution; a deployment with a denser grid
    * subsamples its extreme corners (the shape the AnnRecallBench
    * sweep produces anyway). Recalls are MILLI integers (the grid is
    * measured by the bench as hits/n — milli is its native
    * portability unit).
    *
    * Provenance note: the shipped [[RerankCalibration]] defaults are
    * the round-16 HAND fit of the same table, rounded to 6 decimals
    * (c 0.723778 vs this fit's 0.726141, gamma 0.194287 vs 0.194515 —
    * sub-±0.4 % constant deltas from rounding order). At target 500
    * milli both elect width 280 @ 921k; at 3.69M they differ by ONE
    * candidate (shipped 540 — raw solution 539.97, a hair under the
    * integer boundary — vs this fit's 541; recall-immaterial, the
    * out-of-sample run measured 0.509 against the 0.500 target
    * there, and BASELINE's "541" quote was this fit's value). The
    * defaults stay as shipped (q182 hash-stable) while deployments
    * re-fit through here — CalibrationSpec pins both elections. */
  def fitRerankCalibration(grid: Seq[(Long, Long, Long)]): RerankCalibration = {
    require(grid.size == 4,
      s"fitRerankCalibration needs a 2×2 factorial grid (4 points), got ${grid.size}")
    grid.foreach { case (w, n, rm) =>
      require(w >= 1 && n >= 1 && rm >= 1 && rm <= 1000,
        s"grid point (w=$w, n=$n, recall_milli=$rm) out of range") }
    val ws = grid.map(_._1).distinct.sorted
    val ns = grid.map(_._2).distinct.sorted
    require(ws.size == 2 && ns.size == 2,
      s"grid must span exactly 2 widths × 2 sizes, got widths=$ws sizes=$ns")
    val r = grid.map(g => ((g._1, g._2), g._3.toDouble / 1000.0)).toMap
    require(r.size == 4, "grid repeats a (width, size) point")
    val (wLo, wHi) = (ws(0), ws(1))
    val (nLo, nHi) = (ns(0), ns(1))
    val beta = (math.log(r((wHi, nLo)) / r((wLo, nLo))) +
        math.log(r((wHi, nHi)) / r((wLo, nHi)))) /
      (2.0 * math.log(wHi.toDouble / wLo.toDouble))
    val gamma = (math.log(r((wLo, nLo)) / r((wLo, nHi))) +
        math.log(r((wHi, nLo)) / r((wHi, nHi)))) /
      (2.0 * math.log(nHi.toDouble / nLo.toDouble))
    val pts = Seq((wLo, nLo), (wLo, nHi), (wHi, nLo), (wHi, nHi))
    val lnC = pts.map { case (w, n) =>
      math.log(r((w, n))) - beta * math.log(w.toDouble) +
        gamma * math.log(n.toDouble)
    }.sum / 4.0
    RerankCalibration(math.exp(lnC), beta, gamma)
  }

  /** Persist a fitted calibration as a VERSIONED one-row artifact
    * (c/beta/gamma as exact doubles — parquet round-trips them
    * bit-identically, so a dispatch fed the artifact equals one fed
    * the in-memory fit — plus the grid it was fitted from, so the
    * artifact answers "calibrated against what"). Published via the
    * same all-or-nothing rename as every artifact. */
  def publishRerankCalibration(spark: org.apache.spark.sql.SparkSession,
      grid: Seq[(Long, Long, Long)], path: String): RerankCalibration = {
    import spark.implicits._
    val calib = fitRerankCalibration(grid)
    val sorted = grid.sortBy(g => (g._1, g._2))
    graft.sources.Artifacts.publish(
      Seq((calib.c, calib.beta, calib.gamma,
          sorted.map(_._1), sorted.map(_._2), sorted.map(_._3)))
        .toDF("c", "beta", "gamma", "grid_w", "grid_n", "grid_recall_milli")
        .coalesce(1),
      path)
    calib
  }

  /** Read a [[publishRerankCalibration]] artifact back — the exact
    * constants the fit produced. */
  def readRerankCalibration(spark: org.apache.spark.sql.SparkSession,
      path: String): RerankCalibration = {
    val r = spark.read.parquet(path).select(
      col("c"), col("beta"), col("gamma")).collect() match {
      case Array(row) => row
      case rows => throw new IllegalStateException(
        s"calibration at $path must be exactly 1 row, got ${rows.length}")
    }
    RerankCalibration(r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  /** Predicted exact-rerank recall@5 (milli, capped at 1000) of a
    * rerank `width` over a `corpusSize`-item index at the calibrated
    * probe shape — floor(1000 · c · width^beta / corpusSize^gamma).
    * The estimate half of the [[sizeRerankWidth]] rule, exposed so a
    * deployment can read the model's opinion of the width it runs. */
  def estimateRerankRecallMilli(width: Long, corpusSize: Long,
      calib: RerankCalibration = RerankCalibration()): Long = {
    require(width >= 1 && corpusSize >= 1,
      s"width=$width and corpusSize=$corpusSize must be >= 1")
    val r = 1000.0 * calib.c * math.pow(width.toDouble, calib.beta) /
      math.pow(corpusSize.toDouble, calib.gamma)
    math.min(1000L, math.floor(r).toLong)
  }

  /** Size the exact-rerank WIDTH to a recall target — the round-15
    * measurement ("recall at 10⁶⁺ items is rerank-width-bound, not
    * scan-share-bound; width prices as a corpus-size-independent
    * re-rank join") turned into the deployment rule, the
    * [[sizeScanBudget]] discipline one lever over. Inverting the
    * calibrated model for the smallest width whose predicted recall
    * clears `recallTargetMilli`:
    *
    *   width = floor(exp((ln(target/1000) − ln c + gamma·ln n) / beta)) + 1
    *
    * — the smallest integer STRICTLY above the real-valued solution
    * (the safe side of both the fit and the floating-point
    * boundary), clamped to `[minWidth, corpusSize]`. Monotone
    * non-decreasing in the target and in the corpus size (beta,
    * gamma > 0 ⇒ the inner expression is), so a raised recall floor
    * or a grown corpus never SHRINKS the width — and when unclamped,
    * `estimateRerankRecallMilli(sizeRerankWidth(n, t), n) ≥ t` by
    * construction (spec-pinned, the sizeScanBudget bound
    * discipline). `minWidth` defaults to 50 — the gates' width,
    * below which the model is extrapolating outside its grid (small
    * corpora saturate; the floor, not the model, owns that regime).
    * The cap at `corpusSize` is the other honesty bound: reranking
    * more candidates than the corpus holds is the exact scan. An
    * unreachable target (the model caps at the corpus size) returns
    * the cap — the caller reads the estimate to see the shortfall. */
  def sizeRerankWidth(corpusSize: Long, recallTargetMilli: Long,
      minWidth: Long = 50L,
      calib: RerankCalibration = RerankCalibration()): Long = {
    require(minWidth >= 1, s"minWidth=$minWidth must be >= 1")
    math.min(corpusSize,
      math.max(minWidth, rerankWidthRaw(corpusSize, recallTargetMilli, calib)))
  }

  /** The unclamped inversion — exposed so the q182 gate can carry
    * (and its oracle re-derive) the raw rule output next to the
    * clamped width. */
  private[graft] def rerankWidthRaw(corpusSize: Long,
      recallTargetMilli: Long,
      calib: RerankCalibration = RerankCalibration()): Long = {
    require(corpusSize >= 1, s"corpusSize=$corpusSize must be >= 1")
    require(recallTargetMilli >= 1 && recallTargetMilli <= 1000,
      s"recallTargetMilli=$recallTargetMilli must be in [1, 1000]")
    math.floor(math.exp(
      (math.log(recallTargetMilli / 1000.0) - math.log(calib.c) +
        calib.gamma * math.log(corpusSize.toDouble)) / calib.beta)).toLong + 1L
  }

  /** [[sizeScanBudget]] against a live index tree: reads the
    * occupancy map (≤ `centroids` rows) and sizes the budget. */
  def sizeScanBudget(spark: org.apache.spark.sql.SparkSession,
      path: String, targetRowsPerQuery: Long): Long =
    sizeScanBudget(
      cellCounts(spark.read.parquet(s"$path/codes")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      targetRowsPerQuery)

  /** [[ivfPqCandidates]] under a SCAN BUDGET instead of a fixed probe
    * count — the latency-SLO lever for a skewed index: each query
    * probes its cells in coarse-distance order and stops once the
    * strictly-preceding cells already hold `scanBudget` codes (the
    * nearest cell is always probed). Fixed `probes` bounds the CELL
    * count, so a hot cell (q172's alarm) inflates every probe that
    * touches it; a scan budget bounds the ROWS scanned — worst-case
    * probe cost stays flat no matter how skewed the appends were, at
    * the price of fewer cells (less recall) exactly where the index
    * is hottest. Occupancy comes from the same ≤ `centroids`-row
    * driver-bounded count the q172 audit reads; empty cells cost no
    * budget. Same chunked-query-batch machinery and min-merge as the
    * fixed-probe path. */
  def ivfPqCandidatesBudget(
      queries: DataFrame,
      path: String,
      dim: Int,
      topK: Int,
      scanBudget: Long,
      queryId: String,
      queryVec: String,
      maxQueryBatch: Int = 256): DataFrame = {
    require(scanBudget >= 1)
    ivfPqCandidatesImpl(queries, path, dim, topK, Right(scanBudget),
      queryId, queryVec, maxQueryBatch)
  }

  private def ivfPqCandidatesImpl(
      queries: DataFrame,
      path: String,
      dim: Int,
      topK: Int,
      probeSel: Either[Int, Long],
      queryId: String,
      queryVec: String,
      maxQueryBatch: Int): DataFrame = {
    require(maxQueryBatch >= 1)
    val spark = queries.sparkSession
    // meta + codebooks are cached on the tree's publish fingerprint
    // ([[audits]]) — an unchanged tree costs repeat invocations no
    // Spark jobs for them (round-20; was ~3 collect jobs per call)
    val meta = audits.meta(spark, path)
    require(meta.dim == dim,
      s"ivf-pq index at $path was built at dim=${meta.dim}, searched at dim=$dim")
    val ivfCb = audits.ivfCb(spark, path)
    val cbs = audits.pqCbs(spark, path)
    // scan-budget probing needs the cell-occupancy map: ≤ `centroids`
    // rows, identical per chunk, read through the same aggregation
    // shape the q172 audit reads ([[cellCounts]] — one reader, the
    // audit and the dial can't drift) and cached on the tree's append
    // signature ([[audits.cellOccupancy]])
    val occ: Option[Map[Long, Long]] = probeSel match {
      case Right(_) => Some(audits.cellOccupancy(spark, path))
      case Left(_) => None
    }
    val q = queries.select(col(queryId).cast("long").as("q_id"),
      col(queryVec).as("q_vec"))
    // checkpoint FIRST so the query source plan runs exactly once:
    // the count below and every chunk filter scan the materialized
    // rows, not the source plan (which for a non-trivial query side
    // would otherwise run once per consumer)
    val qc0 = q.localCheckpoint()
    val nq = qc0.count() // the query side is batch-bounded by contract
    // the checkpoint inherits the query SOURCE's partitioning (32 scan
    // partitions at local defaults), and every chunk job re-scans it —
    // 16 chunks × 32 near-empty tasks per invocation. Coalesce (narrow,
    // no exchange, no extra job) to a width derived from the measured
    // row count: ~4k query rows per task keeps the per-chunk coarse-LUT
    // projection tens of ms while capping task count at the row count's
    // scale, not the source's split count.
    val qc = qc0.coalesce(math.max(1,
      math.min(spark.sparkContext.defaultParallelism,
        math.ceil(nq / 4096.0).toInt)))
    val nChunks = math.max(1, math.ceil(nq.toDouble / maxQueryBatch).toInt)
    // the occupancy map sizes the ADC fan-out width on BOTH probe
    // selectors (round-21; cached on the tree's append signature, so
    // an unchanged tree costs repeat invocations no job), and one
    // codes read serves every chunk — 16 chunks each re-resolving
    // `parquet(codes)` paid 16 listing/schema rounds per invocation
    val occAll = audits.cellOccupancy(spark, path)
    val codesAll = spark.read.parquet(s"$path/codes")
    if (nChunks == 1)
      ivfPqCandidatesBatch(qc, codesAll, meta, ivfCb, cbs, topK, probeSel, occ, occAll)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      // every chunk's probed-cell set AND scored-row count, from ONE
      // job over the whole checkpointed query relation instead of one
      // distinct+collect job PER CHUNK (round-20: 16 chunks at sf0.1
      // paid 16 tiny jobs plus 16 plan analyses for sets this single
      // aggregation yields; the per-chunk walk is the same probe
      // projection filtered by the same hash, so the sets are
      // identical). The scored-row count — Σ over the chunk's (query,
      // probed cell) pairs of that cell's occupancy — is exactly the
      // ADC rows the chunk will score; it sizes the chunk's fan-out
      // repartition. Still driver-bounded: ≤ nChunks · centroids longs.
      val cellsByChunk: Map[Int, (Seq[Long], Long)] =
        probedCells(qc, dim, meta, ivfCb, probeSel, occ)
          .select(pmod(xxhash64(col("q_id")), lit(nChunks)).cast("int")
            .as("chunk"), col("c_id"))
          .groupBy(col("chunk"))
          .agg(collect_set(col("c_id")).as("cells"),
            sum(coalesce(element_at(typedLit(occAll), col("c_id")), lit(0L)))
              .as("scored"))
          .collect()
          .map(r => r.getInt(0) ->
            (r.getSeq[Long](1), r.getLong(2)))
          .toMap
      val pool = java.util.concurrent.Executors.newFixedThreadPool(ChunkConcurrency)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val fs = (0 until nChunks).map { i =>
          Future {
            val chunk = qc.filter(pmod(xxhash64(col("q_id")), lit(nChunks)) === i)
            val (cells, scored) = cellsByChunk.getOrElse(i, (Seq.empty[Long], 0L))
            ivfPqCandidatesBatch(chunk, codesAll, meta, ivfCb, cbs, topK, probeSel, occ,
              occAll, knownCells = Some((cells, scored)))
              .localCheckpoint() // eager: runs the chunk job in this thread
          }
        }
        // chunk-index order kept, so the union plan is deterministic
        Await.result(Future.sequence(fs), Duration.Inf).reduce(_ union _)
      } finally pool.shutdown()
    }
  }

  /** Partitions for the ×|Q| ADC fan-out of one query batch: derived
    * from the EXACT number of rows the batch will score (Σ over its
    * (query, probed cell) pairs of cell occupancy — the same map the
    * q172 audit reads), not a constant. The codes relation is tiny in
    * BYTES (that is the point of PQ), so both the scan split count and
    * AQE's byte-based coalescing mis-size the fan-out in both
    * directions: a constant `defaultParallelism` pays a full-width
    * exchange + reduce per chunk when the chunk scores thousands of
    * rows (the sf0.1 dispatch floor: 16 chunks × 3 32-task stages of
    * microsecond tasks), and byte-based sizing puts a whole sf1 search
    * into ONE task. ~256k scored rows per task ≈ tens of ms of fused
    * LUT adds — small enough to parallelize real work, large enough
    * that scheduling doesn't dominate. Capped at defaultParallelism
    * (the cluster's slot count), floored at 1. */
  private[graft] def adcFanoutWidth(spark: org.apache.spark.sql.SparkSession,
      scoredRows: Long): Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism,
      math.ceil(scoredRows.toDouble / AdcRowsPerTask).toInt))
  private val AdcRowsPerTask: Long = 1L << 18

  /** Concurrent chunk jobs in [[ivfPqCandidates]]: caps live LUT
    * broadcasts at this × the per-chunk budget. */
  private val ChunkConcurrency = 4

  /** The probe walk shared by the chunked impl (per-chunk cell-set
    * precompute) and the batch plan: `(q_id, q_vec)` queries → one
    * `(q_id, qmv, c_id)` row per probed cell, cells ranked by the
    * native coarse LUT. One definition, so the precomputed per-chunk
    * cell sets and the cells a chunk's own plan probes cannot drift. */
  private def probedCells(
      queries: DataFrame,
      dim: Int,
      meta: IvfPqMeta,
      ivfCb: Seq[(Long, Seq[Long])],
      probeSel: Either[Int, Long],
      occ: Option[Map[Long, Long]]): DataFrame = {
    val q0 = queries.select(col("q_id"),
      SemDedup.quantizeMilli(col("q_vec")).as("qmv"))
    // coarse probe scoring is ITSELF one native LUT build — a single
    // "subspace" of full width over the coarse codebook (the
    // m·k-fold HOF scorer was the other interpreted hot spot on the
    // probe path); the (dist, cid) structs then just index it
    val coarseK = ivfCb.map(_._1).max.toInt + 1
    val qs = q0.select(col("q_id"), col("qmv"),
      graft.functions.AdcLutsExpr(col("qmv"),
        typedLit(Seq.fill(dim)(0L)), Seq(ivfCb), coarseK).as("cluts"))
    val rankedCells = array_sort(array(ivfCb.map { case (cid, _) =>
      struct(element_at(col("cluts"), lit(cid.toInt) + 1).as("d"),
        lit(cid).as("c"))
    }: _*))
    probeSel match {
      case Left(probes) =>
        val effProbes = math.min(probes, ivfCb.size)
        qs.select(col("q_id"), col("qmv"),
            explode(slice(rankedCells, 1, effProbes)).as("cs"))
          .select(col("q_id"), col("qmv"), col("cs.c").as("c_id"))
      case Right(budget) =>
        // scan-budget probing: walk cells in distance order, keep each
        // while the strictly-preceding cells hold < `budget` codes
        // (the nearest cell always probes). Occupancy is the
        // ≤ centroids-row driver-bounded map the impl read once for
        // all chunks; the window runs over |chunk|·centroids tiny rows.
        val occMap = occ.getOrElse(throw new IllegalStateException(
          "scan-budget probe reached the chunk without an occupancy map"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("pos"))
          .rowsBetween(Long.MinValue, -1)
        qs.select(col("q_id"), col("qmv"),
            posexplode(rankedCells).as(Seq("pos", "cs")))
          .select(col("q_id"), col("qmv"), col("pos"),
            col("cs.c").as("c_id"),
            coalesce(element_at(typedLit(occMap), col("cs.c")), lit(0L))
              .as("occ"))
          .withColumn("prior", coalesce(sum(col("occ")).over(w), lit(0L)))
          .filter(col("prior") < budget)
          .select(col("q_id"), col("qmv"), col("c_id"))
    }
  }

  /** One bounded query chunk of [[ivfPqCandidates]] — the plan the
    * scaladoc above describes, with the LUT broadcast bounded by the
    * chunk size. `knownCells` = this chunk's (probed cell ids, scored
    * rows) when the impl already computed them (one job for all
    * chunks); None = one aggregation here (the single-batch path). */
  private def ivfPqCandidatesBatch(
      queries: DataFrame,
      codesAll: DataFrame,
      meta: IvfPqMeta,
      ivfCb: Seq[(Long, Seq[Long])],
      cbs: Seq[Seq[(Long, Seq[Long])]],
      topK: Int,
      probeSel: Either[Int, Long],
      occ: Option[Map[Long, Long]],
      occAll: Map[Long, Long],
      knownCells: Option[(Seq[Long], Long)] = None): DataFrame = {
    val spark = queries.sparkSession
    graft.GraftSession.tune(spark)
    val dim = meta.dim
    val residual = meta.residual
    val assignments = meta.assignments
    val m = cbs.size
    val k = cbs.map(_.map(_._1).max).max.toInt + 1

    val probed = probedCells(queries, dim, meta, ivfCb, probeSel, occ)
    // per (query, cell): all m residual LUTs in ONE fused native loop
    // ([[graft.functions.AdcLutsExpr]]; the cell centroid comes from
    // an inlined c_id → centroid map literal, zeros when the index
    // holds raw codes)
    val cellCv =
      if (residual) element_at(typedLit(ivfCb.toMap), col("c_id"))
      else typedLit(Seq.fill(dim)(0L))
    val luts = probed.select(col("q_id"), col("c_id"),
      graft.functions.AdcLutsExpr(col("qmv"), cellCv, cbs, k).as("luts"))

    // static probe-bounded partition pruning (≤ `centroids` cell ids)
    // plus the batch's scored-row count — one aggregation, same shape
    // as the chunked impl's per-chunk precompute
    val (cells, scoredRows) = knownCells.getOrElse {
      val r = probed
        .agg(collect_set(col("c_id")).as("cells"),
          sum(coalesce(element_at(typedLit(occAll), col("c_id")), lit(0L)))
            .as("scored"))
        .collect().head
      (r.getSeq[Long](0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val width = adcFanoutWidth(spark, scoredRows)
    val codesPruned = codesAll
      .filter(col("c_id").isin(cells: _*))
      .select(col("vec_id") +: col("c_id").cast("long").as("c_id") +:
        (0 until m).map(s => col(s"code$s")): _*)
    // width 1 = the whole fan-out fits one task's budget: a narrow
    // coalesce merges the scan splits with NO exchange (one stage job
    // + one AQE round fewer per chunk). width > 1 keeps the hash
    // repartition — only an exchange can spread rows past the scan's
    // split count, which for byte-tiny PQ codes under-splits (one task
    // carried the whole sf1 search; see [[adcFanoutWidth]]).
    val codes =
      if (width == 1) codesPruned.coalesce(1)
      else codesPruned.repartition(width, col("vec_id"))

    val dist = (0 until m).map { s =>
      element_at(col("luts"), lit(s * k) + col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    val scored = codes.join(broadcast(luts), "c_id")
      .select(col("q_id"), col("vec_id"), dist.as("adc"))
    // Under multi-assignment a pair can meet in up to
    // min(assignments, probes) cells with different residual codes;
    // the merged estimate is the per-pair MIN. A groupBy(q, item)
    // BEFORE the heap would shuffle the ENTIRE scored pair relation
    // (measured 6× slower than the full-scan ADC at sf1 — the one
    // exchange this operator exists to avoid), so instead the heap
    // runs FIRST at width topK·assignments: every entry of a distinct
    // pair's ≤ `assignments` copies sorts at-or-after its min copy,
    // so the k-th smallest distinct merged pair sits within the first
    // k·assignments heap entries — the widened prefix provably
    // contains the true top-k. Since round 13 the widened heap, the
    // min-merge, and the re-trim are ONE aggregation
    // ([[TopK.topKDistinctMin]] — dedup-by-id at heap FINISH over
    // ≤ topK·assignments in-memory entries), so the whole merge is a
    // single exchange and the scored relation only ever feeds
    // map-side partial heaps, exactly like the full-scan ADC plan.
    val heap =
      if (assignments == 1) TopK.topK(topK)
      else TopK.topKDistinctMin(topK, assignments)
    scored
      .groupBy(col("q_id").as("query_id"))
      .agg(heap(col("adc").cast("double"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), col("n.dist").cast("long").as("adc_dist"))
  }
}
