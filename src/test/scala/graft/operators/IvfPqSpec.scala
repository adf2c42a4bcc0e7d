package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pq.buildIvfPqIndex]] / [[Pq.ivfPqCandidates]] — the composed
  * IVFADC index: cell-partitioned layout on disk, probe-bounded file
  * pruning in the scan plan, multi-assignment replication with
  * min-merge dedup, and search semantics on a separable corpus. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // the PqSpec corpus: two tight groups per subspace half
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Seq(1.1f, 0.0f, 0.0f, 1.1f)),
    (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
    (10L, Seq(5.0f, 5.0f, 5.0f, 5.0f)),
    (11L, Seq(5.1f, 4.9f, 5.1f, 4.9f)),
    (12L, Seq(4.9f, 5.1f, 4.9f, 5.1f)))
    .toDF("vec_id", "embedding")

  private def query = Seq((100L, Seq(1.0f, 0.05f, 0.05f, 1.0f)))
    .toDF("vec_id", "embedding")

  private def build(path: String, assignments: Int = 1): Unit =
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path,
      assignments = assignments)

  test("index tree: ivf + codebooks + codes partitioned by c_id") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_tree"
    build(path)
    val ivf = spark.read.parquet(s"$path/ivf")
    assert(ivf.columns.toSet == Set("c_id", "cv"))
    assert(ivf.count() <= 2)
    val cells = new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.startsWith("c_id=")).map(_.getName).toSet
    assert(cells.nonEmpty, "codes must be hive-partitioned by c_id")
    // every corpus row coded exactly once at assignments=1
    assert(spark.read.parquet(s"$path/codes").count() == 6)
  }

  test("probe scan reads ONLY the probed cells' files (static partition pruning)") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_prune"
    build(path)
    val cand = Pq.ivfPqCandidates(query, path, dim = 4, topK = 3,
      probes = 1, "vec_id", "embedding")
    val scan = cand.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("codes"))
      .getOrElse(fail("no codes scan in plan"))
    // the probed-cell in-list must reach the scan as a PARTITION
    // filter (file-level pruning), not a post-scan data filter
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("c_id"), scan.take(800))
    // and the pruning MECHANISM: the same shape of scan+in-list (no
    // AQE wrapping on a scan-only plan, so the scan node is reachable)
    // reads exactly one of the two cell directories
    val oneCell = spark.read.parquet(s"$path/codes")
      .filter(col("c_id").isin(spark.read.parquet(s"$path/ivf")
        .orderBy("c_id").collect().head.getLong(0)))
    val files = oneCell.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(files.nonEmpty && files.head == 1,
      s"expected 1 of 2 cell partitions read, got $files")
  }

  test("search ranks the query's own group first; ADC dists are nonneg longs") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_search"
    build(path)
    val top = Pq.ivfPqCandidates(query, path, dim = 4, topK = 3,
        probes = 2, "vec_id", "embedding")
      .orderBy("rank").collect()
    // the query's own (low) group fills the top-3 — within-group order
    // is a quantization artifact (codes can tie or split residuals),
    // and the exact re-rank downstream restores it
    assert(top.map(_.getLong(2)).toSet == Set(0L, 1L, 2L), top.toSeq)
    assert(top.forall(_.getLong(3) >= 0L))
  }

  test("multi-assignment: replicas on disk, min-merged in search (no duplicate pairs)") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_multi"
    build(path, assignments = 2)
    assert(spark.read.parquet(s"$path/codes").count() == 12,
      "each vector coded into its 2 nearest cells")
    val out = Pq.ivfPqCandidates(query, path, dim = 4, topK = 6,
        probes = 2, "vec_id", "embedding")
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(2)))
    assert(pairs.distinct.length == pairs.length, "pairs must be deduped")
    assert(out.length == 6, "all corpus vectors reachable, once each")
  }

  test("residual=false index round-trips and searches too") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_raw"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, residual = false)
    // residual mode is DERIVED from the persisted meta, not re-supplied
    val top = Pq.ivfPqCandidates(query, path, dim = 4, topK = 3,
        probes = 2, "vec_id", "embedding")
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(top == Seq(0L, 1L, 2L), top)
  }

  test("meta sidecar: layout derived from the tree; a dim mismatch fails loudly") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_meta"
    build(path, assignments = 2)
    val meta = Pq.readIvfPqMeta(spark, path)
    assert(meta == Pq.IvfPqMeta(dim = 4, m = 2, k = 2, centroids = 2,
      iters = 2, residual = true, assignments = 2))
    val e = intercept[IllegalArgumentException] {
      Pq.ivfPqCandidates(query, path, dim = 8, topK = 3, probes = 2,
        "vec_id", "embedding")
    }
    assert(e.getMessage.contains("built at dim=4"))
  }

  test("chunked query batches: maxQueryBatch=1 union == unchunked result") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_chunk"
    build(path, assignments = 2)
    val qs = corpus.select(col("vec_id") + 100, col("embedding"))
      .toDF("vec_id", "embedding") // 6 queries
    def run(batch: Int) =
      Pq.ivfPqCandidates(qs, path, dim = 4, topK = 3, probes = 2,
          "vec_id", "embedding", maxQueryBatch = batch)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(Int.MaxValue), "per-query chunks must union to the unchunked answer")
    assert(run(4) == run(Int.MaxValue))
  }

  test("append: batch codes land in cell partitions, search == full re-encode build") {
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    val batch = corpus.filter(col("vec_id") === 2 || col("vec_id") === 12)
    // standing index trained + encoded on OLD rows only
    val incr = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_incr"
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = incr, assignments = 2)
    val before = spark.read.parquet(s"$incr/codes").count()
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", incr)
    assert(spark.read.parquet(s"$incr/codes").count() == before + 4,
      "2 batch rows x 2 assignments appended")
    // reference: same codebooks (trained on OLD), full re-encode of
    // old ∪ batch — codes are a pure projection of fixed codebooks,
    // so the appended index must be BIT-EQUAL
    val full = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_incr_full"
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = full, assignments = 2)
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", full)
    val a = spark.read.parquet(s"$incr/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = spark.read.parquet(s"$full/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
    def search(p: String) =
      Pq.ivfPqCandidates(query, p, dim = 4, topK = 6, probes = 2,
          "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(search(incr) == search(full))
    // and the appended rows are reachable: batch member 2 surfaces
    assert(search(incr).map(_._3).contains(2L))
  }

  test("tagged append is idempotent: replay no-ops, a crashed attempt is cleaned, untagged duplicates") {
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    val batch = corpus.filter(col("vec_id") === 2 || col("vec_id") === 12)
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_idem"
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = path, assignments = 2)
    def rows() = spark.read.parquet(s"$path/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
      batchTag = Some("b7"))
    val once = rows()
    // replay with the same tag: the commit marker short-circuits
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
      batchTag = Some("b7"))
    assert(rows() == once, "a replayed tagged batch must be a no-op")
    // crash simulation: marker gone but the renamed files present —
    // the retry must sweep the tagged files before re-applying, so
    // the batch still lands exactly once
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/appends/b7"), false)
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
      batchTag = Some("b7"))
    assert(rows() == once, "a retried partial batch must not duplicate rows")
    // the UNTAGGED call is the documented at-least-once: a replay
    // re-lands the batch (2 rows × 2 assignments)
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path)
    assert(rows().size == once.size + 4)
    // and a malformed tag fails loudly instead of writing a weird path
    val e = intercept[IllegalArgumentException] {
      Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
        batchTag = Some("../escape"))
    }
    assert(e.getMessage.contains("batchTag must match"))
    // the cleanup sweep deletes live files by '<tag>-' NAME PREFIX, so
    // the two tags that could sweep someone ELSE's files are
    // rejected: a '-' inside a tag ('b7' would prefix a committed
    // 'b7-x' batch's files) and the exact tag 'part' (Spark's own
    // data files are part-*; sweep prefix 'part-' would hit the base
    // build). Longer part* tags sweep '<tag>-' which cannot prefix a
    // part-* name, so they stay usable (round-15 advice).
    val dash = intercept[IllegalArgumentException] {
      Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
        batchTag = Some("b7-x"))
    }
    assert(dash.getMessage.contains("batchTag must match"))
    val part = intercept[IllegalArgumentException] {
      Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
        batchTag = Some("part"))
    }
    assert(part.getMessage.contains("must not be exactly 'part'"))
    val beforeP7 = rows().size
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
      batchTag = Some("partition7"))
    assert(rows().size == beforeP7 + 4,
      "a 'part'-prefixed (but not exactly 'part') tag must append normally")
  }

  test("indexStateSignature: stable on reads, moves on tagged append and republish") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_sig"
    build(path)
    val s0 = Pq.indexStateSignature(spark, path)
    // pure reads (audit, probe) don't move the signature
    Pq.occupancyAudit(spark, path).collect()
    assert(Pq.indexStateSignature(spark, path) == s0,
      "reads must not invalidate the cached audit")
    // a tagged append writes a marker → new signature
    Pq.appendIvfPqIndex(query, "vec_id", "embedding", path,
      batchTag = Some("sig1"))
    val s1 = Pq.indexStateSignature(spark, path)
    assert(s1 != s0, "a tagged append must move the signature")
    // a replayed tag is a no-op append AND a no-op signature
    Pq.appendIvfPqIndex(query, "vec_id", "embedding", path,
      batchTag = Some("sig1"))
    assert(Pq.indexStateSignature(spark, path) == s1)
    // a republish (rebuild at the same path) swaps the tree → the
    // meta mtime moves even though no marker changed (markers are
    // gone entirely on a fresh tree)
    Thread.sleep(5) // local-fs mtime granularity
    build(path)
    assert(Pq.indexStateSignature(spark, path) != s1,
      "a republished tree must move the signature")
  }

  test("rebalance: fresh coarse cells, standing PQ codebooks verbatim, search sane") {
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    val batch = corpus.filter(col("vec_id") === 2 || col("vec_id") === 12)
    val standing = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_rebal_standing"
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = standing, assignments = 2)
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", standing)
    val rebal = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_rebal"
    Pq.rebalanceIvfPqIndex(corpus, "vec_id", "embedding", standing, rebal)
    // PQ codebooks travel verbatim — rebalance retrains nothing below
    // the coarse level
    val cbA = spark.read.parquet(s"$standing/codebooks")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val cbB = spark.read.parquet(s"$rebal/codebooks")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(cbA == cbB, "PQ codebooks must travel verbatim")
    // the coarse codebook is retrained over the GROWN corpus
    val wantIvf = SemDedup.lloydCentroids(
      corpus.select(col("vec_id").cast("long").as("i_id"),
        col("embedding").as("i_vec")), "i_id", "i_vec", k = 2, iters = 2)
    val gotIvf = spark.read.parquet(s"$rebal/ivf").orderBy("c_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    assert(gotIvf == wantIvf.map { case (c, v) => (c, v.toSeq) },
      "coarse codebook must be retrained over the grown corpus")
    // all ids re-encoded with `assignments` replicas; meta carried
    val codes = spark.read.parquet(s"$rebal/codes")
    assert(codes.count() == 12 &&
      codes.select("vec_id").distinct().count() == 6)
    assert(Pq.readIvfPqMeta(spark, rebal) ==
      Pq.IvfPqMeta(4, 2, 2, 2, 2, residual = true, 2))
    // search over the rebalanced tree still ranks the query's group
    val top = Pq.ivfPqCandidates(query, rebal, dim = 4, topK = 3,
        probes = 2, "vec_id", "embedding")
      .orderBy("rank").collect().map(_.getLong(2)).toSet
    assert(top == Set(0L, 1L, 2L))
  }

  test("occupancy audit: skew and empty-cell branches fire; tree form reads the artifact") {
    def occ(cells: Seq[(Long, Int)], centroids: Int) =
      Pq.occupancyAuditOf(
        cells.flatMap { case (c, n) => (0 until n).map(i => (c * 1000 + i, c)) }
          .toDF("vec_id", "c_id"), centroids)
        .collect().head
    // balanced: 4 cells × 5 codes, no empties → keep, skew 1000
    val bal = occ(Seq((0L, 5), (1L, 5), (2L, 5), (3L, 5)), 4)
    assert(bal.getAs[String]("decision") == "keep" &&
      bal.getAs[Long]("skew_milli") == 1000L &&
      bal.getAs[String]("search_mode") == "fixed_probes", bal)
    // hot cell: 25 + 5×1 over 6 occupied of 6 → max = 5× mean, skew
    // 5000 > 4000 → rebalance (the skew branch), and searches switch
    // to the scan-budget dial until the rebalance lands
    val hot = occ(Seq((0L, 25), (1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 1)), 6)
    assert(hot.getAs[String]("decision") == "rebalance" &&
      hot.getAs[Long]("skew_milli") == 5000L &&
      hot.getAs[String]("search_mode") == "scan_budget", hot)
    // empties: 2 balanced cells of 8 declared → 6 empty > 25% →
    // rebalance even though realized cells are perfectly even; the
    // search dial does NOT flip (empty cells cost no scan bytes)
    val emp = occ(Seq((0L, 5), (1L, 5)), 8)
    assert(emp.getAs[String]("decision") == "rebalance" &&
      emp.getAs[Long]("n_cells_empty") == 6L &&
      emp.getAs[Long]("skew_milli") == 1000L &&
      emp.getAs[String]("search_mode") == "fixed_probes", emp)
    // the tree form derives centroids from the meta sidecar and reads
    // the partitioned codes relation
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_occ"
    build(path, assignments = 2)
    val audit = Pq.occupancyAudit(spark, path)
    val tree = audit.collect().head
    assert(tree.getAs[Long]("n_codes") == 12L &&
      tree.getAs[Long]("n_cells_occupied") +
        tree.getAs[Long]("n_cells_empty") == 2L, tree)
    // and the scan reads ZERO data columns: c_id is the partition
    // column, so the audit costs directory listings + row-group
    // metadata, never a code byte — the property that keeps it at
    // 0.9 s over a 200k-vector corpus
    val scan = audit.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("codes"))
      .getOrElse(fail("no codes scan in plan"))
    val read = """ReadSchema: struct<([^>]*)>""".r
      .findFirstMatchIn(scan).map(_.group(1))
    assert(read.contains(""), s"expected empty ReadSchema, got $read")
  }

  test("scan-budget probing: budget=1 ≡ probes=1; huge budget ≡ all cells probed") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_budget"
    build(path, assignments = 2)
    val qs = corpus.select(col("vec_id") + 100, col("embedding"))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    // budget 1: the strictly-preceding occupancy of the FIRST cell is
    // 0 < 1 and of the second ≥ 1 — exactly the nearest cell, i.e.
    // the fixed probes=1 walk
    assert(rows(Pq.ivfPqCandidatesBudget(qs, path, dim = 4, topK = 3,
        scanBudget = 1L, "vec_id", "embedding")) ==
      rows(Pq.ivfPqCandidates(qs, path, dim = 4, topK = 3,
        probes = 1, "vec_id", "embedding")))
    // a budget past the corpus size probes every cell
    assert(rows(Pq.ivfPqCandidatesBudget(qs, path, dim = 4, topK = 6,
        scanBudget = Long.MaxValue, "vec_id", "embedding")) ==
      rows(Pq.ivfPqCandidates(qs, path, dim = 4, topK = 6,
        probes = 2, "vec_id", "embedding")))
    // and the budget path chunks like the fixed path
    assert(rows(Pq.ivfPqCandidatesBudget(qs, path, dim = 4, topK = 3,
        scanBudget = 4L, "vec_id", "embedding", maxQueryBatch = 2)) ==
      rows(Pq.ivfPqCandidatesBudget(qs, path, dim = 4, topK = 3,
        scanBudget = 4L, "vec_id", "embedding")))
  }

  test("residual drift audit: identical old and grown corpora → equal errors, keep") {
    val out = Pq.residualDriftAudit(corpus, corpus, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2, centroids = 2).collect().head
    assert(out.getAs[Long]("n_rows") == 6L)
    assert(out.getAs[Long]("err_standing") ==
      out.getAs[Long]("err_retrained"),
      "identical inputs must train identical codebooks either side")
    assert(out.getAs[String]("residual_decision") == "keep")
  }

  test("sizeScanBudget: SLO bound under any skew, monotone, floored at the nearest cell") {
    val occ = Map(0L -> 100L, 1L -> 10L, 2L -> 1L, 3L -> 5L)
    // the walk keeps a cell while prior < budget, so the worst case a
    // query scans is (budget − 1) + max_cell rows — the bound the
    // helper sizes to. For every target ≥ max_cell the walk under the
    // sized budget scans ≤ target rows, for ANY cell visit order.
    for (target <- Seq(100L, 101L, 116L, 150L, 500L)) {
      val b = Pq.sizeScanBudget(occ, target)
      assert(b - 1 + 100L <= target, s"target=$target sized b=$b")
    }
    // monotone: a looser SLO never shrinks the walk
    val sized = (1L to 300L).map(Pq.sizeScanBudget(occ, _))
    assert(sized.zip(sized.tail).forall { case (a, c) => a <= c })
    // floor: a target below max_cell sizes to the irreducible walk
    // (budget 1 = the nearest non-empty cell only)
    assert(Pq.sizeScanBudget(occ, 1L) == 1L)
    assert(Pq.sizeScanBudget(occ, 100L) == 1L)
    assert(Pq.sizeScanBudget(occ, 150L) == 51L)
    // and the sized budget reproduces the walk it promises: at
    // target = max_cell the walk IS the probes=1 scan
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_slo"
    build(path)
    // 6 codes in 2 cells of 3 → max_cell 3; target 10 → budget 8
    assert(Pq.sizeScanBudget(spark, path, 10L) == 8L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Pq.ivfPqCandidatesBudget(query, path, dim = 4, topK = 3,
        scanBudget = Pq.sizeScanBudget(spark, path, 3L),
        "vec_id", "embedding")) ==
      rows(Pq.ivfPqCandidates(query, path, dim = 4, topK = 3,
        probes = 1, "vec_id", "embedding")))
  }

  test("resolution audit: collision branches fire; the healthy tree audits fit") {
    // constructed codes (m=2): cell 0 healthy (18 rows, 18 distinct
    // tuples), cell 1 collapsed (20 rows on 4 tuples — 4·4 < 20 →
    // flagged: >4 rows per indistinguishable tuple), cell 2 populated
    // but below the evaluation floor (8 rows < minCell 16)
    val codes = ((0 until 18).map(i => (0L, i.toLong, i.toLong)) ++
      (0 until 20).map(i => (1L, (i % 4).toLong, 0L)) ++
      (0 until 8).map(_ => (2L, 0L, 0L))).toDF("c_id", "code0", "code1")
    val row = Pq.resolutionAuditOf(codes, m = 2, minCell = 16L,
      loadFactor = 4L).collect().head
    assert(row.getAs[Long]("n_codes") == 46L, row)
    assert(row.getAs[Long]("n_cells_eval") == 2L, row)
    assert(row.getAs[Long]("n_cells_flagged") == 1L, row)
    assert(row.getAs[Long]("flagged_codes") == 20L, row)
    assert(row.getAs[Long]("max_tuple_load_milli") == 5000L, row)
    assert(row.getAs[String]("decision") == "bit_budget", row)
    // without the collapsed cell: collision-free census, fit
    val healthy = Pq.resolutionAuditOf(codes.filter(col("c_id") =!= 1L),
      m = 2, minCell = 16L, loadFactor = 4L).collect().head
    assert(healthy.getAs[Long]("max_tuple_load_milli") == 1000L, healthy)
    assert(healthy.getAs[String]("decision") == "fit", healthy)
    // tree form: derives m from the meta sidecar; the spec corpus is
    // tiny so no cell reaches the floor — evaluated as fit, loudly
    // countable (n_cells_eval = 0, max load 0)
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_resaudit"
    build(path)
    val tree = Pq.resolutionAudit(spark, path).collect().head
    assert(tree.getAs[Long]("n_codes") == 6L, tree)
    assert(tree.getAs[Long]("n_cells_eval") == 0L &&
      tree.getAs[Long]("max_tuple_load_milli") == 0L &&
      tree.getAs[String]("decision") == "fit", tree)
  }

  test("sizeScanBudget property: simulated budget walks never scan past max(target, max_cell)") {
    // the guarantee the helper sells, validated against the ACTUAL
    // stop rule (keep the next cell while the previously-kept cells'
    // cumulative occupancy is below the budget) over random occupancy
    // maps and random cell-visit orders — the walk is order-dependent
    // per query, the bound must not be
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val occ = (0L to rnd.nextInt(40).toLong)
        .map(c => c -> (rnd.nextInt(1000) + 1).toLong).toMap
      val maxCell = occ.values.max
      val target = 1L + rnd.nextInt(3000)
      val b = Pq.sizeScanBudget(occ, target)
      var prior = 0L
      rnd.shuffle(occ.keys.toSeq).foreach { c =>
        if (prior < b) prior += occ(c)
      }
      assert(prior <= math.max(target, maxCell),
        s"occ=$occ target=$target budget=$b scanned=$prior")
    }
  }

  test("resolution stamp: equals the live census at publish, survives appends, rewritten by republish") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_stamp"
    build(path)
    def stampRow() = Pq.resolutionStamp(spark, path).collect().head
    val stamped = stampRow()
    assert(stamped == Pq.resolutionAudit(spark, path).collect().head,
      "the publish-time stamp must equal a live census of the same tree")
    // an append does NOT restamp (the verdict is a publish-time
    // property of the retrained representation — the sink doctrine)
    Pq.appendIvfPqIndex(query, "vec_id", "embedding", path,
      batchTag = Some("st1"))
    assert(stampRow() == stamped, "appends must not move the stamp")
    // a republish over a corpus the bits cannot rank rewrites the
    // stamp in the same rename — a stale `fit` after a retrain is
    // impossible by construction
    val dim = 64
    val ball = Seq.fill(dim)(100.0f)
    val collapsed = ((1L to 40L).map(id => (id, ball)) ++
      (41L to 60L).map(id => (id,
        (0 until dim).map(j => ((id * 31 + j * 7) % 97) / 10.0f))))
      .toDF("vec_id", "embedding")
    Pq.buildIvfPqIndex(collapsed, "vec_id", "embedding", dim = dim, m = 2,
      k = 2, iters = 2, centroids = 2, path = path)
    val restamped = stampRow()
    assert(restamped.getAs[String]("decision") == "bit_budget", restamped)
    assert(restamped == Pq.resolutionAudit(spark, path).collect().head)
    // and the rebalance publish stamps too
    val rebal = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_stamp_rb"
    Pq.rebalanceIvfPqIndex(collapsed, "vec_id", "embedding", path, rebal)
    val rbRow = Pq.resolutionStamp(spark, rebal).collect().head
    assert(rbRow == Pq.resolutionAudit(spark, rebal).collect().head)
  }

  test("sizeRerankWidth: monotone, round-trips the estimate, clamps at the floor and the corpus") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val n = 1000L + rnd.nextInt(100000000).toLong
      val t = 1L + rnd.nextInt(1000)
      val w = Pq.sizeRerankWidth(n, t, minWidth = 1L)
      // the bound the rule sells: when unclamped, the sized width's
      // predicted recall clears the target (the sizeScanBudget
      // discipline, recall-side)
      if (w < n)
        assert(Pq.estimateRerankRecallMilli(w, n) >= t, s"n=$n t=$t w=$w")
      // monotone: a raised floor or a grown corpus never shrinks it
      if (t < 1000)
        assert(Pq.sizeRerankWidth(n, t + 1, minWidth = 1L) >= w, s"n=$n t=$t")
      assert(Pq.sizeRerankWidth(n * 2, t, minWidth = 1L) >= w, s"n=$n t=$t")
      // clamps
      assert(Pq.sizeRerankWidth(n, t) >= math.min(50L, n) && w <= n)
    }
    // the rule reproduces the measured-grid arithmetic at the decade
    // the calibration came from (BASELINE round-15 recall tables)
    assert(Pq.sizeRerankWidth(921000L, 500L) == 280L)
    assert(Pq.sizeRerankWidth(3690000L, 500L) == 541L)
    // and the estimate sits within the fit's tolerance of the
    // measured points it was calibrated on
    assert(math.abs(Pq.estimateRerankRecallMilli(50L, 921000L) - 255L) <= 20,
      Pq.estimateRerankRecallMilli(50L, 921000L).toString)
    assert(math.abs(Pq.estimateRerankRecallMilli(400L, 3690000L) - 455L) <= 20,
      Pq.estimateRerankRecallMilli(400L, 3690000L).toString)
    // gate corpora land in the clamp branch: the floor owns small-n
    assert(Pq.sizeRerankWidth(450L, 500L) == 50L)
  }

  test("q181 width dial: a narrower rerank width shrinks the per-query pool") {
    // threading pin the sf gates can't give (their sized width clamps
    // to the default 50): width 1 means a 1-candidate re-rank pool,
    // so every query emits exactly rank 1
    val sfDir = "/root/testdata/sf0.001"
    val out50 = graft.Queries.ivfPqSearchDispatch(spark, sfDir).collect()
    val out1 = graft.Queries.ivfPqSearchDispatch(spark, sfDir,
      rerankWidth = 1).collect()
    assert(out50.count(_.getAs[Long]("rank") == 1L) == out1.length,
      s"${out50.length} vs ${out1.length}")
    assert(out1.nonEmpty && out1.forall(_.getAs[Long]("rank") == 1L))
    assert(out50.length > out1.length)
  }

  test("q179 dispatch: a collapsed corpus flips the arm to exact_ivf and the exact arm ranks it") {
    // the arm the sf gates can never exercise (their corpora audit
    // `fit`), pinned here end to end on a synthetic bit-budget event:
    // 30 IDENTICAL vectors (mutual distances zero — maximally below
    // any quantizer's resolution) far from a spread cloud. The
    // resolution audit must flag the collapsed cells (1 code tuple,
    // ≥ 16 rows), q178 must say bit_budget, and q179 must dispatch to
    // the exact-vector IVF arm — which, unlike any PQ arm, ranks the
    // collapsed mass correctly because its distances are exact floats.
    val dir = s"${sys.props("java.io.tmpdir")}/graft_bitbudget_corpus"
    val dim = 64
    val collapsed = Seq.fill(dim)(100.0f)
    def spread(i: Int): Seq[Float] =
      (0 until dim).map(j => ((i * 31 + j * 7) % 97) / 10.0f)
    val rows =
      (1L to 33L).filter(_ % 10 != 0).map(id => (id, collapsed)) ++   // 30 collapsed corpus rows
      (34L to 119L).filter(_ % 10 != 0).map(id => (id, spread(id.toInt))) ++ // spread corpus
      Seq((10L, collapsed.map(_ + 0.0001f)),                          // query at the ball
        (20L, spread(20)), (40L, spread(40)))                         // far queries
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    graft.sources.Artifacts.resetMemo() // force fresh artifact builds for this dir
    val audit = graft.Queries.annBitBudgetAudit(spark, dir).collect().head
    assert(audit.getAs[String]("decision") == "bit_budget", audit)
    assert(audit.getAs[Long]("n_cells_flagged") >= 1, audit)
    val res = graft.Queries.ivfPqExactFallback(spark, dir)
    val out = res.collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("search_arm") == "exact_ivf"),
      out.take(5).mkString("; "))
    // the ball query's exact top-5 is inside the collapsed mass —
    // the ranking every PQ arm provably cannot produce there
    val ballTop = out.filter(_.getAs[Long]("query_id") == 10L)
      .map(_.getAs[Long]("neighbor_id")).toSet
    val collapsedIds = (1L to 33L).filter(_ % 10 != 0).toSet
    assert(ballTop.size == 5 && ballTop.subsetOf(collapsedIds),
      s"ball query neighbors $ballTop not within the collapsed mass")
    // q181's three-rung walk on the same corpus: IDENTICAL vectors
    // collapse at every representation — the int8 fallback's own
    // stamp flags too — so the dispatch falls through the int8 rung
    // to the float exact arm. (The (bit_budget, int8-fit) middle
    // case needs sub-PQ-resolution-but-distinct data, which no unit
    // corpus at the shipped 64-code budget produces; AnnDriftBench's
    // compress event measures it live: int8 stamp fit, recall 0.747
    // vs every PQ arm's 0.02.)
    val disp = graft.Queries.ivfPqSearchDispatch(spark, dir).collect()
    assert(disp.nonEmpty &&
      disp.forall(_.getAs[String]("search_arm") == "exact_ivf"),
      disp.take(3).mkString("; "))
    graft.sources.Artifacts.resetMemo() // don't leak this dir's memo into other specs
  }

  test("single-agg distinct-min merge == explicit heap/explode/min/re-heap") {
    import spark.implicits._
    val scored = Seq(
      (1L, 10L, 5.0), (1L, 10L, 3.0), (1L, 11L, 4.0), (1L, 12L, 6.0),
      (1L, 13L, 1.0), (2L, 10L, 2.0), (2L, 10L, 2.0), (2L, 14L, 7.0))
      .toDF("q_id", "vec_id", "adc")
    val k = 2; val widen = 2
    val one = scored.groupBy(col("q_id"))
      .agg(TopK.topKDistinctMin(k, widen)(col("adc"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("q_id"), col("pos"), col("n.id"), col("n.dist"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val three = scored.groupBy(col("q_id"))
      .agg(TopK.topK(k * widen)(col("adc"), col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("q_id"), explode(col("top")).as("n"))
      .select(col("q_id"), col("n.id").as("vec_id"),
        col("n.dist").as("adc"))
      .groupBy(col("q_id"), col("vec_id")).agg(min(col("adc")).as("adc"))
      .groupBy(col("q_id"))
      .agg(TopK.topK(k)(col("adc"), col("vec_id"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("q_id"), col("pos"), col("n.id"), col("n.dist"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(one == three)
  }

  test("compaction: bit-equal rows+search, one file per cell, markers+stamp carried, replay no-ops") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_src"
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 2)
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 2),
      "vec_id", "embedding", src, batchTag = Some("b1"))
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
      "vec_id", "embedding", src, batchTag = Some("b2"))
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def searchOf(p: String) =
      Pq.ivfPqCandidates(query, p, dim = 4, topK = 6, probes = 2,
          "vec_id", "embedding")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val rows0 = codesOf(src)
    val search0 = searchOf(src)
    val stamp0 = Pq.resolutionStamp(spark, src).collect().head

    val out = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_out"
    Pq.compactIvfPqIndex(spark, src, out)
    assert(codesOf(out) == rows0, "compaction must change no rows")
    assert(searchOf(out) == search0, "compacted search must be bit-equal")
    assert(spark.read.parquet(s"$out/resolution").collect().head == stamp0,
      "the resolution stamp is carried (file layout cannot move it)")
    // one file per cell — the layout a fresh build ships
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(s"$out/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .foreach { cell =>
        val data = fs.listStatus(cell.getPath).map(_.getPath.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith("."))
        assert(data.length == 1, s"${cell.getPath.getName}: $data")
      }
    // markers carried: a replayed batch short-circuits on the
    // compacted tree too (its rows are already in the compacted codes)
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 2),
      "vec_id", "embedding", out, batchTag = Some("b1"))
    assert(codesOf(out) == rows0, "replayed tag must no-op after compaction")
  }

  test("compaction excludes orphaned append files; fileAudit counts and decides") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_orph"
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 2)
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 2),
      "vec_id", "embedding", src, batchTag = Some("b1"))
    val rowsCommitted = spark.read.parquet(s"$src/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // plant a crashed append: a tagged file with NO commit marker —
    // its rows are a partial batch only the retry may re-apply, so
    // compaction must NOT bake them into anonymous compacted files
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    val cell = fs.listStatus(new Path(s"$src/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .head.getPath
    val donor = fs.listStatus(cell)
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val orphan = new Path(cell, s"zz-${donor.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs, orphan, false,
      spark.sessionState.newHadoopConf())
    val audit = Pq.fileAudit(spark, src).collect().head
    assert(audit.getAs[Long]("n_orphans") == 1L, audit)
    // orphans COUNT toward the threshold (round-16 advice: probes
    // scan them, so they are part of the tax the decision prices)
    assert(audit.getAs[String]("decision") ==
      (if (audit.getAs[Long]("n_files") + audit.getAs[Long]("n_orphans") >=
           4L * audit.getAs[Long]("n_cells"))
         "compact" else "keep"), audit)
    val out = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_orph_out"
    Pq.compactIvfPqIndex(spark, src, out)
    assert(spark.read.parquet(s"$out/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == rowsCommitted,
      "orphan rows must not survive compaction")
    val outAudit = Pq.fileAudit(spark, out).collect().head
    assert(outAudit.getAs[Long]("n_orphans") == 0L, outAudit)
    assert(outAudit.getAs[String]("decision") == "keep", outAudit)
    // fragmentation fires the alarm: enough committed single-row
    // appends push n_files past 4x n_cells on this 2-cell tree
    (1 to 8).foreach { i =>
      Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
        "vec_id", "embedding", out, batchTag = Some(s"frag$i"))
    }
    val fragAudit = Pq.fileAudit(spark, out).collect().head
    assert(fragAudit.getAs[String]("decision") == "compact", fragAudit)
  }

  test("sweepOrphans deletes only uncommitted tagged files; a late retry re-applies cleanly") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_sweep"
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    val batch = corpus.filter(col("vec_id") === 2)
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 2)
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", src,
      batchTag = Some("ok1"))
    def rows() = spark.read.parquet(s"$src/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val committed = rows()
    // a decommissioned stream's crashed final batch: tagged files,
    // no marker — visible to probes, never retried
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    val cell = fs.listStatus(new Path(s"$src/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .head.getPath
    val donor = fs.listStatus(cell)
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    fs.rename(donor, new Path(cell, s"dead-${donor.getName}"))
    assert(Pq.fileAudit(spark, src).collect().head
      .getAs[Long]("n_orphans") == 1L)
    assert(Pq.sweepOrphans(spark, src) == 1L)
    assert(Pq.fileAudit(spark, src).collect().head
      .getAs[Long]("n_orphans") == 0L)
    // the donor file was REMOVED (renamed to the orphan name, then
    // swept) — the surviving rows are committed minus the donor's;
    // committed tagged files are untouched (the ok1 batch row stays)
    val after = rows()
    assert(after.size < committed.size)
    assert(after.exists(_.head == 2L), "the committed ok1 batch row survives")
    // and a late retry of the swept tag re-applies the WHOLE batch —
    // the no-marker contract: sweep never strands a batch, it only
    // advances the cleanup its own retry would have done
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
      "vec_id", "embedding", src, batchTag = Some("dead"))
    assert(rows().count(_.head == 12L) == 2,
      "the retried batch lands in full (2 assignments)")
  }

  test("compact-and-flip handoff: replays short-circuit, new batches land, parity with a never-compacted twin") {
    // the deployment choreography the compactIvfPqIndex scaladoc
    // promises: batches b0/b1 land on the serving tree, the appender
    // pauses, compaction publishes the new path, the pointer flips —
    // then a REPLAY of b0/b1 (stream restart from an old checkpoint)
    // must no-op on the new tree, a genuinely new b2 must land, and
    // the final tree must equal a never-compacted twin that took the
    // same three batches, bit-for-bit
    val serving = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_flip_a"
    val twin = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_flip_twin"
    val old = corpus.filter(col("vec_id") =!= 1 && col("vec_id") =!= 2 &&
      col("vec_id") =!= 12)
    val batches = Seq(
      corpus.filter(col("vec_id") === 1),
      corpus.filter(col("vec_id") === 2),
      corpus.filter(col("vec_id") === 12))
    Seq(serving, twin).foreach { p =>
      Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
        k = 2, iters = 2, centroids = 2, path = p, assignments = 2)
    }
    batches.zipWithIndex.take(2).foreach { case (b, i) =>
      Pq.appendIvfPqIndex(b, "vec_id", "embedding", serving,
        batchTag = Some(s"b$i"))
    }
    // appender paused; compact; flip the pointer to the new path
    val flipped = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_flip_b"
    Pq.compactIvfPqIndex(spark, serving, flipped)
    // stream restarts from an old checkpoint: b0 and b1 re-deliver
    batches.zipWithIndex.take(2).foreach { case (b, i) =>
      Pq.appendIvfPqIndex(b, "vec_id", "embedding", flipped,
        batchTag = Some(s"b$i"))
    }
    // and the genuinely new batch lands
    Pq.appendIvfPqIndex(batches(2), "vec_id", "embedding", flipped,
      batchTag = Some("b2"))
    // twin: same three batches, no compaction, same tags
    batches.zipWithIndex.foreach { case (b, i) =>
      Pq.appendIvfPqIndex(b, "vec_id", "embedding", twin,
        batchTag = Some(s"b$i"))
    }
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(codesOf(flipped) == codesOf(twin),
      "the flipped tree must be bit-equal to the never-compacted twin")
    def searchOf(p: String) =
      Pq.ivfPqCandidates(query, p, dim = 4, topK = 8, probes = 2,
          "vec_id", "embedding")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(searchOf(flipped) == searchOf(twin))
  }

  test("compaction with maxRecordsPerFile: several files per cell, rows unchanged, audit consistent") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_mrpf_src"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 2)
    val rows0 = spark.read.parquet(s"$src/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val out = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_mrpf_out"
    Pq.compactIvfPqIndex(spark, src, out, maxRecordsPerFile = 2L)
    assert(spark.read.parquet(s"$out/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == rows0)
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    val perCell = fs.listStatus(new Path(s"$out/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .map { cell =>
        (spark.read.parquet(cell.getPath.toString).count(),
          fs.listStatus(cell.getPath).map(_.getPath.getName)
            .count(n => !n.startsWith("_") && !n.startsWith(".")).toLong)
      }
    perCell.foreach { case (n, files) =>
      assert(files == (n + 1) / 2,
        s"cell with $n rows at maxRecordsPerFile=2 must split into ceil(n/2) files, got $files")
    }
    val audit = Pq.fileAudit(spark, out).collect().head
    assert(audit.getAs[Long]("n_files") == perCell.map(_._2).sum, audit)
  }

  test("batched cell-range compaction ≡ unbatched: bit-equal rows, one file per cell") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_batched_src"
    val old = corpus.filter(col("vec_id") =!= 2 && col("vec_id") =!= 12)
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 2)
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 2),
      "vec_id", "embedding", src, batchTag = Some("b1"))
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
      "vec_id", "embedding", src, batchTag = Some("b2"))
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_full"
    val ranged = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cpt_ranged"
    Pq.compactIvfPqIndex(spark, src, full)
    // cellBatch=1: every cell is its own bounded range — the extreme
    // batching; the composed result must equal the unbatched compaction
    Pq.compactIvfPqIndex(spark, src, ranged, cellBatch = 1)
    assert(codesOf(ranged) == codesOf(full),
      "ranged ∘ all ranges must be bit-equal to full compaction")
    val fs = new Path(ranged).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(s"$ranged/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .foreach { cell =>
        val data = fs.listStatus(cell.getPath).map(_.getPath.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith("."))
        assert(data.length == 1, s"${cell.getPath.getName}: $data")
      }
    // markers carried and the audit sane on the batched result too
    val audit = Pq.fileAudit(spark, ranged).collect().head
    assert(audit.getAs[Long]("n_orphans") == 0L, audit)
    assert(audit.getAs[String]("decision") == "keep", audit)
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 2),
      "vec_id", "embedding", ranged, batchTag = Some("b1"))
    assert(codesOf(ranged) == codesOf(full),
      "replayed tag must still no-op on the batch-compacted tree")
  }

  test("fileAudit: orphans trip the threshold; factor is a dial; non-index path fails loudly") {
    import org.apache.hadoop.fs.Path
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_audit_orph"
    Pq.buildIvfPqIndex(corpus, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 1)
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    val cells = fs.listStatus(new Path(s"$src/codes"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
      .map(_.getPath)
    val before = Pq.fileAudit(spark, src).collect().head
    assert(before.getAs[String]("decision") == "keep", before)
    // plant enough ORPHANS (tagged, no marker) to cross 4× alone —
    // a decommissioned stream's leavings must trip the alarm even
    // though committed files never grew (round-16 advice)
    val donor = fs.listStatus(cells.head)
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val need = 4 * cells.length
    (1 to need).foreach { i =>
      org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
        new Path(cells.head, s"dead$i-${donor.getName}"), false,
        spark.sessionState.newHadoopConf())
    }
    val after = Pq.fileAudit(spark, src).collect().head
    assert(after.getAs[Long]("n_orphans") == need.toLong, after)
    assert(after.getAs[String]("decision") == "compact",
      s"orphans alone must trip the threshold: $after")
    // factor dial: a laxer store (higher factor) keeps the same tree
    val lax = Pq.fileAudit(spark, src, factor = 100L).collect().head
    assert(lax.getAs[String]("decision") == "keep", lax)
    // a non-index path fails with the actionable meta message, not a
    // raw FileNotFoundException from the listing
    val e = intercept[IllegalStateException] {
      Pq.fileAudit(spark, s"${sys.props("java.io.tmpdir")}/graft_no_such_tree")
    }
    assert(e.getMessage.contains("meta"), e.getMessage)
  }

  test("compactionCadence: keep with no history, compact_within forecasts, compact_now past the line") {
    val src = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_spec_cadence"
    val old = corpus.filter(col("vec_id") =!= 12)
    Pq.buildIvfPqIndex(old, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 2, centroids = 2, path = src, assignments = 1)
    // fresh build: no append history — nothing growing, keep
    val fresh = Pq.compactionCadence(spark, src).collect().head
    assert(fresh.getAs[String]("decision") == "keep", fresh)
    assert(fresh.getAs[Long]("batches_to_threshold") == -1L, fresh)
    assert(fresh.getAs[Long]("n_batches") == 0L, fresh)
    // one append batch: history exists, forecast is finite and
    // consistent with the integer arithmetic
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
      "vec_id", "embedding", src, batchTag = Some("g1"))
    val one = Pq.compactionCadence(spark, src).collect().head
    assert(one.getAs[String]("decision") == "compact_within", one)
    val horizon = one.getAs[Long]("batches_to_threshold")
    val scanned = one.getAs[Long]("n_files") + one.getAs[Long]("n_orphans")
    val perBatch = one.getAs[Long]("append_files")
    assert(horizon ==
      (4L * one.getAs[Long]("n_cells") - scanned + perBatch - 1L) / perBatch,
      one)
    // keep appending: the horizon shrinks monotonically, then the
    // decision flips to compact_now exactly when fileAudit's does
    var prev = horizon
    var flipped = false
    (2 to 12).takeWhile { i =>
      Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 12),
        "vec_id", "embedding", src, batchTag = Some(s"g$i"))
      val row = Pq.compactionCadence(spark, src).collect().head
      val d = row.getAs[String]("decision")
      if (d == "compact_within") {
        assert(row.getAs[Long]("batches_to_threshold") <= prev,
          s"forecast must not grow under steady appends: $row (prev $prev)")
        prev = row.getAs[Long]("batches_to_threshold")
        true
      } else {
        assert(d == "compact_now", row)
        assert(row.getAs[Long]("batches_to_threshold") == 0L, row)
        assert(Pq.fileAudit(spark, src).collect().head
          .getAs[String]("decision") == "compact",
          "compact_now must agree with fileAudit's standing decision")
        flipped = true
        false
      }
    }
    assert(flipped, "appends never tripped compact_now")
  }

  test("writer lease: a mid-write crash blocks other writers loudly; compaction pauses the appender") {
    import org.apache.hadoop.fs.Path
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_lease"
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    build(path)
    val batch = corpus.filter(col("vec_id") === 2)
    // a crashed appender's standing lease (no marker): every other
    // writer fails loudly instead of corrupting the tree silently
    AppendProtocol.acquireLease(fs, new Path(path), "append:z1")
    intercept[IllegalStateException] {
      Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
        batchTag = Some("z2"))
    }
    intercept[IllegalStateException] { Pq.sweepOrphans(spark, path) }
    intercept[IllegalStateException] {
      Pq.compactIvfPqIndex(spark, path,
        s"${sys.props("java.io.tmpdir")}/graft_ivfpq_lease_cpt0")
    }
    // z1's own retry re-enters (identical owner) and releases
    Pq.appendIvfPqIndex(batch, "vec_id", "embedding", path,
      batchTag = Some("z1"))
    assert(!fs.exists(AppendProtocol.leasePath(new Path(path))))
    // compaction HOLDS the source lease for its whole read — the
    // "pause the appender" operational rule enforced: an append
    // racing a live compaction fails instead of landing rows the new
    // tree will silently miss. Simulated via the lease a live
    // compaction would hold (same owner string).
    AppendProtocol.acquireLease(fs, new Path(path), "compact")
    intercept[IllegalStateException] {
      Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", path, batchTag = Some("z3"))
    }
    AppendProtocol.breakLease(fs, new Path(path))
    // and a real compaction releases on exit — the appender resumes
    val cpt = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_lease_cpt"
    Pq.compactIvfPqIndex(spark, path, cpt)
    assert(!fs.exists(AppendProtocol.leasePath(new Path(path))))
    Pq.appendIvfPqIndex(corpus.filter(col("vec_id") === 1),
      "vec_id", "embedding", path, batchTag = Some("z3"))
  }

  test("compactIvfPqIndexInPlace: bit-equal rows at the same path, markers carried, crash-after-delete retry completes the flip") {
    import org.apache.hadoop.fs.Path
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_inplace"
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    build(path)
    (1 to 4).foreach { i =>
      Pq.appendIvfPqIndex(
        Seq((20L + i, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 1.0f)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", path, batchTag = Some(s"p$i"))
    }
    def codes() = spark.read.parquet(s"$path/codes")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val before = codes()
    assert(Pq.fileAudit(spark, path).collect().head
      .getAs[String]("decision") == "compact")
    Pq.compactIvfPqIndexInPlace(spark, path)
    assert(codes() == before, "in-place compaction must change no rows")
    assert(Pq.fileAudit(spark, path).collect().head
      .getAs[String]("decision") == "keep")
    assert(!fs.exists(new Path(path + ".compacting")))
    assert(!fs.exists(AppendProtocol.leasePath(new Path(path))))
    // markers carried: a replayed batch still short-circuits
    Pq.appendIvfPqIndex(
      Seq((21L, Seq(9.9f, 9.9f, 9.9f, 9.9f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, batchTag = Some("p1"))
    assert(codes() == before, "replay must no-op on the flipped tree")
    // crash AFTER the delete, before the rename: live path gone (or a
    // bare lease-only shell — the retry recreates it by acquiring),
    // staged tree complete. The retry must finish the flip without
    // recompacting a missing source.
    val staged = new Path(path + ".compacting")
    fs.mkdirs(staged)
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(path), fs,
      new Path(staged.toString + ".tmp"), false,
      spark.sessionState.newHadoopConf())
    fs.delete(staged, true)
    require(fs.rename(new Path(staged.toString + ".tmp"), staged))
    fs.delete(new Path(path), true) // the crash: live tree gone
    Pq.compactIvfPqIndexInPlace(spark, path)
    assert(codes() == before, "the retry must serve the staged tree's rows")
    assert(!fs.exists(new Path(path + ".compacting")))
  }
}
