package graft
package queries

/** DuckDB oracle SQL for the round-10 model-curation queries (q132+).
  * Same dialect discipline as [[OracleSqlA]]–[[OracleSqlC]]: integer
  * arithmetic everywhere the gate hashes, `bin()`-length for ⌊log₂⌋,
  * explicit BIGINT casts on every aggregate-derived column.
  */
private[graft] trait OracleSqlD {

  /** One unrolled BPE round (the q127 unrolled-Lloyd discipline): from
    * symbol table `sym{i}`, derive the round's winning pair `t{i}`
    * (max freq-weighted adjacent count, ties to the smaller
    * `"l r"` string) and the merged table `sym{i+1}` via the
    * greedy-left-to-right window formulation — run-parity on identical
    * symbols reproduces the non-overlapping fold exactly
    * ([[operators.Bpe.mergeSyms]] semantics). */
  private def bpeRoundSql(np: String, i: Int): String =
    s"""${np}p$i AS (
           SELECT sym[i] AS l, sym[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS wgt
           FROM (SELECT freq, sym, unnest(generate_series(1, len(sym) - 1)) AS i
                 FROM ${np}sym$i)
           GROUP BY 1, 2),
         ${np}t$i AS (
           SELECT l, r, wgt FROM ${np}p$i
           ORDER BY wgt DESC, l || ' ' || r ASC LIMIT 1),
         ${np}e$i AS (
           SELECT w, freq, i, sym[i] AS s
           FROM (SELECT w, freq, sym, unnest(generate_series(1, len(sym))) AS i
                 FROM ${np}sym$i)),
         ${np}f$i AS (
           -- LEFT JOIN (not a cross join) against the 1-row winner: on
           -- a degenerate corpus the pair table exhausts before the
           -- last round, t$i is empty, and a cross join would silently
           -- drop the whole symbol table; with NULL l/r no row can
           -- satisfy the merge predicate, so symbols pass through
           -- unchanged — Bpe.train's early-stop semantics
           SELECT e.*, t.l, t.r,
             CASE WHEN lag(e.s) OVER (PARTITION BY e.w ORDER BY e.i)
               IS DISTINCT FROM e.s THEN 1 ELSE 0 END AS chg,
             lead(e.s) OVER (PARTITION BY e.w ORDER BY e.i) AS nxt
           FROM ${np}e$i e LEFT JOIN ${np}t$i t ON TRUE),
         ${np}g$i AS (
           SELECT *, sum(chg) OVER (PARTITION BY w ORDER BY i) AS run_id
           FROM ${np}f$i),
         ${np}h$i AS (
           SELECT *, min(i) OVER (PARTITION BY w, run_id) AS run_start
           FROM ${np}g$i),
         ${np}m$i AS (
           SELECT *, CASE WHEN s = l AND nxt = r
               AND (l <> r OR (i - run_start) % 2 = 0)
             THEN 1 ELSE 0 END AS mg
           FROM ${np}h$i),
         ${np}c$i AS (
           SELECT *, lag(mg, 1, 0) OVER (PARTITION BY w ORDER BY i) AS consumed
           FROM ${np}m$i),
         ${np}sym${i + 1} AS (
           SELECT w, freq,
             list(CASE WHEN mg = 1 THEN l || r ELSE s END ORDER BY i) AS sym
           FROM ${np}c$i WHERE consumed = 0 GROUP BY w, freq)"""

  /** Shared prefix: corpus wordcount → char symbol table, then
    * `rounds` unrolled merge rounds ending at `sym{rounds+1}`. */
  private def bpePrefixSql(rounds: Int): String =
    s"""WITH ${bpeChainSql("", rounds, "")}"""

  /** The full CTE list (no WITH) of one BPE training chain whose CTE
    * names carry prefix `np` and whose corpus is `documents $where` —
    * lets q149 unroll TWO chains (with/without the incoming batch) in
    * one statement. `np = ""` reproduces the q136–q138 text verbatim. */
  private def bpeChainSql(np: String, rounds: Int, where: String): String =
    s"""${np}w0 AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents $where),
         ${np}sym1 AS (
           SELECT w, CAST(count(*) AS BIGINT) AS freq, string_split(w, '') AS sym
           FROM ${np}w0 GROUP BY w),
         ${(1 to rounds).map(i => bpeRoundSql(np, i)).mkString(",\n         ")}"""

  /** Shared q43-clustering CTE chain (verbatim semantics of the
    * q43_neardup_clusters oracle in [[OracleSqlA]]): word-3-gram
    * shingle hashes → ≥0.5-Jaccard pairs → recursive reachability →
    * `cl(doc_id, cluster_id)`. Factored so the q133/q139/q142 oracles
    * cannot drift from each other; `tokCte` is the shared tokenizer. */
  private val tokCte: String =
    """tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents)"""

  private val jaccardPairsCte: String =
    """shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-2),
                         i -> array_to_string(toks[i:i+2], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         pairs AS (
           SELECT id1, id2 FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000)"""

  private val clusterCte: String =
    s"""$jaccardPairsCte,
         edges AS (
           SELECT id1 AS a, id2 AS b FROM pairs
           UNION ALL
           SELECT id2, id1 FROM pairs),
         reach AS (
           SELECT a, b AS r FROM edges
           UNION
           SELECT e.a, t.r FROM edges e JOIN reach t ON e.b = t.a),
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a),
         cl AS (
           SELECT d.doc_id,
             CAST(CASE WHEN m.a IS NULL THEN d.doc_id
                       ELSE least(m.mr, d.doc_id) END AS BIGINT) AS cluster_id
           FROM documents d LEFT JOIN mins m ON d.doc_id = m.a)"""

  /** Capped-discovery clustering chain (q156 semantics; expects
    * `shh(doc_id, sh)` from [[jaccardPairsCte]] upstream): the q34
    * df-cap (shingles in > 5 docs dropped, Jaccard over survivors)
    * feeding the same recursive reachability as [[clusterCte]] —
    * CTE names prefixed `c` so q157 can run both chains in one
    * statement. */
  private val cappedClusterCte: String =
    """ex0 AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         ckeep AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= 5),
         ckept AS (SELECT doc_id, s FROM ex0 JOIN ckeep USING (s)),
         cn AS (SELECT doc_id, count(*) AS n FROM ckept GROUP BY doc_id),
         ccommon AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb,
             count(*) AS c
           FROM (SELECT k.doc_id, k.s, cn.n FROM ckept k JOIN cn USING (doc_id)) a
           JOIN (SELECT k.doc_id, k.s, cn.n FROM ckept k JOIN cn USING (doc_id)) b
             ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         cpairs AS (
           SELECT id1, id2 FROM ccommon
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         cedges AS (
           SELECT id1 AS a, id2 AS b FROM cpairs
           UNION ALL
           SELECT id2, id1 FROM cpairs),
         creach AS (
           SELECT a, b AS r FROM cedges
           UNION
           SELECT e.a, t.r FROM cedges e JOIN creach t ON e.b = t.a),
         cmins AS (SELECT a, min(r) AS mr FROM creach GROUP BY a),
         ccl AS (
           SELECT d.doc_id,
             CAST(CASE WHEN m.a IS NULL THEN d.doc_id
                       ELSE least(m.mr, d.doc_id) END AS BIGINT) AS cluster_id
           FROM documents d LEFT JOIN cmins m ON d.doc_id = m.a)"""

  /** One unrolled deterministic-Lloyd chain over the embedding
    * SUBVECTOR `[lo:hi]` (the q127 oracle parameterized for PQ): seed
    * from the k smallest-id subvectors, two assign+update rounds,
    * final assignment — ends at `{p}a2(id, cid)` with live centroids
    * `{p}c2(cid, cv)` and milli subvectors `{p}mv(id, mv)`. `where`
    * restricts the training rows (q163 trains on the corpus split
    * only). */
  private def pqChainSql(p: String, lo: Int, hi: Int, k: Int,
      where: String): String = {
    val L = hi - lo + 1
    s"""${p}mv AS (
           SELECT vec_id AS id,
             list_transform(embedding[$lo:$hi],
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mv
           FROM embeddings $where),
         ${pqChainFromMv(p, L, k)}"""
  }

  /** The chain AFTER `{p}mv` — mv-source-agnostic, so the IVF-PQ
    * oracle (q167) trains the identical unrolled Lloyd over RESIDUAL
    * subvectors by swapping in its own `{p}mv` CTE (mirrors
    * `Pq.trainFused`'s refactoring on the Spark side). */
  private def pqChainFromMv(p: String, L: Int, k: Int): String = {
    def dStep(i: Int, cSrc: String): String =
      s"""${p}d$i AS (
           SELECT m.id, c.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, $L),
                 i -> (m.mv[i] - c.cv[i]) * (m.mv[i] - c.cv[i]))),
               (x, y) -> x + y) AS d
           FROM ${p}mv m CROSS JOIN $cSrc c),
         ${p}a$i AS (SELECT id, cid FROM (
             SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM ${p}d$i) WHERE rn = 1)"""
    def cStep(i: Int, aPrev: String): String =
      s"""${p}c$i AS (
           SELECT cid, list(mj ORDER BY j) AS cv FROM (
             SELECT a.cid, g.j,
               CAST(floor(CAST(sum(m.mv[g.j]) AS DOUBLE) / count(*)) AS BIGINT)
                 AS mj
             FROM $aPrev a JOIN ${p}mv m USING (id)
             CROSS JOIN (SELECT unnest(generate_series(1, $L)) AS j) g
             GROUP BY a.cid, g.j) t
           GROUP BY cid)"""
    s"""${p}c00 AS (SELECT id, mv FROM ${p}mv ORDER BY id LIMIT $k),
         ${p}c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, mv AS cv
                    FROM ${p}c00),
         ${dStep(0, s"${p}c0")},
         ${cStep(1, s"${p}a0")},
         ${dStep(1, s"${p}c1")},
         ${cStep(2, s"${p}a1")},
         ${dStep(2, s"${p}c2")}"""
  }

  /** Per-subspace assignment + reconstruction-error CTE (`{p}e(id,
    * cid, err)`) on top of [[pqChainSql]]'s endpoints. */
  private def pqErrCte(p: String, L: Int): String =
    s"""${p}e AS (
           SELECT a.id, a.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, $L),
                 j -> (m.mv[j] - c.cv[j]) * (m.mv[j] - c.cv[j]))),
               (x, y) -> x + y) AS err
           FROM ${p}a2 a JOIN ${p}mv m USING (id)
           JOIN ${p}c2 c ON a.cid = c.cid)"""

  // m = 8 subspaces of 8 dims, k = 64 codes (48-bit vectors, 42×
  // compression) — chosen by the TunePq sweep: ADC-top-50 + exact
  // re-rank recalls 0.90 of the exact top-5 at this budget
  private val pqSubspaces: Seq[(String, Int, Int)] =
    (0 until 8).map(s => (s"s$s", s * 8 + 1, (s + 1) * 8))
  private val pqK = 64

  /** Exact double squared-Euclidean between two list columns, left
    * fold in index order (the q39 IVF arithmetic, factored). */
  private def sqDistDoubleSql(a: String, b: String, n: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(generate_series(1, $n),
               x -> (CAST($a[x] AS DOUBLE) - CAST($b[x] AS DOUBLE))
                  * (CAST($a[x] AS DOUBLE) - CAST($b[x] AS DOUBLE)))),
             (acc, v) -> acc + v)"""

  // q167 IVF-PQ parameters — the TunePq sweep's pick (32 cells /
  // 12 probes / 2 assignments / residual codes: rerank50 recall@5
  // 0.708 at sf0.1 ≥ the q164 full-scan level 0.697), m=8/k=64
  private val ivfPqCentroids = 32
  private val ivfPqProbes = 12
  private val ivfPqAssign = 2

  /** Exact integer squared distance between two BIGINT list columns,
    * left fold in index order (the milli-space metric). */
  private def sqDistIntSql(a: String, b: String, n: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, $n),
               x -> ($a[x] - $b[x]) * ($a[x] - $b[x]))),
             (acc, v) -> acc + v)"""

  /** The IVF-PQ (q167) pipeline as CTEs — replays `Pq.buildIvfPqIndex`
    * + `Pq.ivfPqCandidates` end to end, INTEGER end to end: coarse
    * codebook = one unrolled deterministic-Lloyd chain over the FULL
    * 64-dim milli vectors ([[pqChainFromMv]] with prefix `c` — the
    * q127 machinery at full width), per-item cell assignment `ca2`,
    * RESIDUAL subvectors = pure long subtraction `milli(x) − c`,
    * eight more Lloyd chains over the PRIMARY-cell residuals, each
    * item REPLICATED into its `assignments` nearest cells and encoded
    * against each cell's residual (`{p}rcode`), probe-bounded ADC
    * restricted to each query's `probes` nearest cells under the same
    * integer metric, replica estimates merged by min. Ends at
    * `adc(qid, id, dist)`.
    *
    * `trainWhere` vs `corpusWhere` split (round 13): the codebooks —
    * coarse AND residual — train over `trainWhere` rows only, while
    * replication/encoding (`rep`, `{p}rcode`) covers `corpusWhere`.
    * For q167 the two coincide; for q170 (incremental append) the
    * training side excludes the appended batch, replaying an index
    * built before the batch arrived whose codes nonetheless cover
    * old ∪ batch — the bit-equality contract of codebook-fixed
    * encoding.
    *
    * `rebalance` (round 13, q173): replay a COARSE-only retrain — a
    * fresh full-width Lloyd chain (prefix `g`) over the GROWN corpus
    * cuts the cells, and replication (`rep`), residual encoding
    * (`{p}rmv`), query probes (`probe`) and query residuals (`qrm`)
    * all run against the NEW centroids `gc2`, while the per-subspace
    * PQ codebooks still train on the batch-less corpus's residuals
    * against the OLD cells `cc2` — the standing-codebook asymmetry of
    * `Pq.rebalanceIvfPqIndex`, replayed in the gate. */
  private def ivfPqCtes(
      corpusWhere: String = "vec_id % 10 <> 0",
      trainWhere: String = "vec_id % 10 <> 0",
      rebalance: Boolean = false,
      scanBudget: Option[Long] = None): String = {
    // the ENCODING coarse codebook: the training chain's cells (cc2)
    // normally; under rebalance a fresh chain (gc2) over the grown
    // corpus re-cuts them while the PQ codebooks stand
    val enc = if (rebalance) "gc2" else "cc2"
    // the probe CTE: fixed probe count normally; under a scan budget
    // (q176) each query walks cells in (distance, cid) order and
    // keeps them while the strictly-preceding cells' cumulative
    // occupancy (rep rows — replicas count) is below the budget
    val probeCte = scanBudget match {
      case None =>
        s"""probe AS (
           SELECT qid, cid FROM (
             SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 ${sqDistIntSql("q.mv", "c.cv", "64")}, c.cid) AS rn
             FROM qmv q CROSS JOIN $enc c) WHERE rn <= $ivfPqProbes)"""
      case Some(b) =>
        s"""bpocc AS (
           SELECT cid, count(*) AS cell_n FROM rep GROUP BY cid),
         probe AS (
           SELECT qid, cid FROM (
             SELECT s.qid, s.cid,
               coalesce(sum(s.cell_n) OVER (PARTITION BY s.qid
                 ORDER BY s.d, s.cid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prior
             FROM (
               SELECT q.qid, c.cid,
                 ${sqDistIntSql("q.mv", "c.cv", "64")} AS d,
                 coalesce(p.cell_n, 0) AS cell_n
               FROM qmv q CROSS JOIN $enc c
               LEFT JOIN bpocc p ON p.cid = c.cid) s)
           WHERE prior < $b)"""
    }
    val gChain =
      if (rebalance)
        s"""gmv AS (SELECT id, mv FROM xmv),
         ${pqChainFromMv("g", 64, ivfPqCentroids)},
         """
      else ""
    s"""cmv AS (
           SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mv
           FROM embeddings WHERE $trainWhere),
         xmv AS (
           SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mv
           FROM embeddings WHERE $corpusWhere),
         $gChain${pqChainFromMv("c", 64, ivfPqCentroids)},
         qmv AS (
           SELECT vec_id AS qid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mv
           FROM embeddings WHERE vec_id % 10 = 0),
         ${pqSubspaces.map { case (p, lo, hi) =>
            s"""${p}mv AS (
             SELECT a.id,
               list_transform(generate_series($lo, $hi),
                 j -> m.mv[j] - c.cv[j]) AS mv
             FROM ca2 a JOIN cmv m USING (id) JOIN cc2 c ON a.cid = c.cid),
           ${pqChainFromMv(p, hi - lo + 1, pqK)}"""
          }.mkString(",\n         ")},
         rep AS (
           SELECT id, cid FROM (
             SELECT m.id, c.cid,
               row_number() OVER (PARTITION BY m.id ORDER BY
                 ${sqDistIntSql("m.mv", "c.cv", "64")}, c.cid) AS rn
             FROM xmv m CROSS JOIN $enc c) WHERE rn <= $ivfPqAssign),
         ${pqSubspaces.map { case (p, lo, hi) =>
            s"""${p}rmv AS (
             SELECT r.id, r.cid,
               list_transform(generate_series($lo, $hi),
                 j -> m.mv[j] - c.cv[j]) AS mv
             FROM rep r JOIN xmv m USING (id)
             JOIN $enc c ON r.cid = c.cid),
           ${p}rcode AS (
             SELECT id, cid, code FROM (
               SELECT v.id, v.cid, c2.cid AS code,
                 row_number() OVER (PARTITION BY v.id, v.cid ORDER BY
                   ${sqDistIntSql("v.mv", "c2.cv", (hi - lo + 1).toString)}, c2.cid) AS rn
               FROM ${p}rmv v CROSS JOIN ${p}c2 c2) WHERE rn = 1)"""
          }.mkString(",\n         ")},
         $probeCte,
         qrm AS (
           SELECT pr.qid, pr.cid,
             ${pqSubspaces.map { case (p, lo, hi) =>
               s"""list_transform(generate_series($lo, $hi),
                 j -> m.mv[j] - c.cv[j]) AS qm$p"""
             }.mkString(",\n             ")}
           FROM probe pr JOIN qmv m ON pr.qid = m.qid
           JOIN $enc c ON pr.cid = c.cid),
         adc0 AS (
           SELECT r.qid, rep.id,
             ${pqSubspaces.map { case (p, lo, hi) =>
               s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, ${hi - lo + 1}),
                   j -> (r.qm$p[j] - ${p}cv.cv[j])
                      * (r.qm$p[j] - ${p}cv.cv[j]))),
                 (x, y) -> x + y)"""}.mkString("\n             + ")}
             AS dist
           FROM qrm r
           JOIN rep ON rep.cid = r.cid
           ${pqSubspaces.map { case (p, _, _) =>
             s"JOIN ${p}rcode ON ${p}rcode.id = rep.id AND ${p}rcode.cid = rep.cid" }
             .mkString("\n           ")}
           ${pqSubspaces.map { case (p, _, _) =>
             s"JOIN ${p}c2 ${p}cv ON ${p}rcode.code = ${p}cv.cid" }
             .mkString("\n           ")}),
         adc AS (
           SELECT qid, id, min(dist) AS dist FROM adc0 GROUP BY qid, id)"""
  }

  /** The q171 codebook-drift audit as CTEs ending at `tot(n_rows,
    * err_standing, err_retrained)`: standing PQ chains (`ta*`,
    * trained batch-less) and retrained chains (`tb*`, trained on the
    * grown corpus) at the m=4/k=16 audit budget, reconstruction error
    * of every grown-corpus row under each codebook set (assignment is
    * the argmin, so the assigned-centroid error IS the per-row min).
    * Shared verbatim by q171 and q174 so the two gates cannot drift
    * on the drift arithmetic. */
  private def pqDriftCtes(): String = {
    val auditSubs = (0 until 4).map(s => (s"ta$s", s"tb$s", s * 16 + 1, (s + 1) * 16))
    s"""${auditSubs.map { case (pa, _, lo, hi) =>
          pqChainSql(pa, lo, hi, 16,
            "WHERE vec_id % 10 <> 0 AND vec_id % 7 <> 3") }
          .mkString(",\n         ")},
         ${auditSubs.map { case (_, pb, lo, hi) =>
          pqChainSql(pb, lo, hi, 16, "WHERE vec_id % 10 <> 0") }
          .mkString(",\n         ")},
         ${auditSubs.map { case (pa, pb, lo, hi) =>
          s"""${pa}err AS (
             SELECT m.id, min(${sqDistIntSql("m.mv", "c.cv", (hi - lo + 1).toString)}) AS d
             FROM ${pb}mv m CROSS JOIN ${pa}c2 c GROUP BY m.id),
           ${pb}err AS (
             SELECT m.id, min(${sqDistIntSql("m.mv", "c.cv", (hi - lo + 1).toString)}) AS d
             FROM ${pb}mv m CROSS JOIN ${pb}c2 c GROUP BY m.id)"""
          }.mkString(",\n         ")},
         tot AS (
           SELECT
             CAST((SELECT count(*) FROM tb0mv) AS BIGINT) AS n_rows,
             CAST((${auditSubs.map { case (pa, _, _, _) =>
               s"(SELECT sum(d) FROM ${pa}err)" }.mkString(" + ")}) AS BIGINT)
               AS err_standing,
             CAST((${auditSubs.map { case (_, pb, _, _) =>
               s"(SELECT sum(d) FROM ${pb}err)" }.mkString(" + ")}) AS BIGINT)
               AS err_retrained)"""
  }

  /** The q178 resolution-audit rollup as CTEs ending at `bbagg`:
    * assemble each replica row's full code TUPLE off the
    * `rep`/`{p}rcode` chain (whichever [[ivfPqCtes]] lineage the
    * caller put in scope), census distinct tuples per cell, and roll
    * up to one row of integers — two chained GROUP BYs, mirroring
    * [[graft.operators.Pq.resolutionAuditOf]] exactly (no DISTINCT
    * aggregates on either side, so neither engine's distinct
    * planning is in the arithmetic's way). */
  private def bitBudgetCtes(minCell: Long = 16L,
      loadFactor: Long = 4L): String =
    s"""bbt AS (
           SELECT r.id, r.cid,
             ${pqSubspaces.map { case (p, _, _) => s"${p}rcode.code AS ${p}t" }
               .mkString(", ")}
           FROM rep r
           ${pqSubspaces.map { case (p, _, _) =>
             s"JOIN ${p}rcode ON ${p}rcode.id = r.id AND ${p}rcode.cid = r.cid" }
             .mkString("\n           ")}),
         bbg AS (
           SELECT cid,
             ${pqSubspaces.map { case (p, _, _) => s"${p}t" }.mkString(", ")},
             count(*) AS tuple_n
           FROM bbt
           GROUP BY ${(1 to pqSubspaces.size + 1).mkString(", ")}),
         bbcell AS (
           SELECT cid, CAST(sum(tuple_n) AS BIGINT) AS cell_n,
             CAST(count(*) AS BIGINT) AS n_tuples
           FROM bbg GROUP BY cid),
         bbagg AS (
           SELECT CAST(sum(cell_n) AS BIGINT) AS n_codes,
             CAST(sum(CASE WHEN cell_n >= $minCell THEN 1 ELSE 0 END)
               AS BIGINT) AS n_cells_eval,
             CAST(sum(CASE WHEN cell_n >= $minCell
                 AND n_tuples * $loadFactor < cell_n
               THEN 1 ELSE 0 END) AS BIGINT) AS n_cells_flagged,
             CAST(sum(CASE WHEN cell_n >= $minCell
                 AND n_tuples * $loadFactor < cell_n
               THEN cell_n ELSE 0 END) AS BIGINT) AS flagged_codes,
             CAST(coalesce(max(CASE WHEN cell_n >= $minCell
               THEN (cell_n * 1000) // n_tuples END), 0) AS BIGINT)
               AS max_tuple_load_milli
           FROM bbcell)"""

  /** The q175 oracle, also the `p` leg of q180's composition —
    * occupancy off the appended lineage + the residual-space drift
    * audit (see the q175 map comment). */
  private def residualPolicySql: String = {
    val auditSubs = (0 until 4).map(s => (s"ra$s", s"rb$s", s * 16 + 1, (s + 1) * 16))

      s"""WITH ${ivfPqCtes(
            corpusWhere = "vec_id % 10 <> 0",
            trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3")},
         percell AS (
           SELECT cid, count(*) AS cell_n FROM rep GROUP BY cid),
         occ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells_occupied,
             CAST(sum(cell_n) AS BIGINT) AS n_codes,
             CAST(max(cell_n) AS BIGINT) AS max_cell
           FROM percell),
         occ2 AS (
           SELECT (max_cell * n_cells_occupied * 1000) // n_codes
               AS skew_milli,
             CAST($ivfPqCentroids - n_cells_occupied AS BIGINT)
               AS n_cells_empty
           FROM occ),
         gmv AS (SELECT id, mv FROM xmv),
         ${pqChainFromMv("g", 64, ivfPqCentroids)},
         ${auditSubs.map { case (ra, rb, lo, hi) =>
            s"""${ra}mv AS (
             SELECT a.id,
               list_transform(generate_series($lo, $hi),
                 j -> m.mv[j] - c.cv[j]) AS mv
             FROM ca2 a JOIN cmv m USING (id) JOIN cc2 c ON a.cid = c.cid),
           ${pqChainFromMv(ra, hi - lo + 1, 16)},
           ${rb}mv AS (
             SELECT a.id,
               list_transform(generate_series($lo, $hi),
                 j -> m.mv[j] - c.cv[j]) AS mv
             FROM ga2 a JOIN gmv m USING (id) JOIN gc2 c ON a.cid = c.cid),
           ${pqChainFromMv(rb, hi - lo + 1, 16)}"""
          }.mkString(",\n         ")},
         ${auditSubs.map { case (ra, rb, lo, hi) =>
            s"""${ra}xe AS (
             SELECT m.id, min(${sqDistIntSql("m.mv", "c.cv", (hi - lo + 1).toString)}) AS d
             FROM ${rb}mv m CROSS JOIN ${ra}c2 c GROUP BY m.id),
           ${rb}xe AS (
             SELECT m.id, min(${sqDistIntSql("m.mv", "c.cv", (hi - lo + 1).toString)}) AS d
             FROM ${rb}mv m CROSS JOIN ${rb}c2 c GROUP BY m.id)"""
          }.mkString(",\n         ")},
         rtot AS (
           SELECT
             CAST((SELECT count(*) FROM rb0mv) AS BIGINT) AS n_rows,
             CAST((${auditSubs.map { case (ra, _, _, _) =>
               s"(SELECT sum(d) FROM ${ra}xe)" }.mkString(" + ")}) AS BIGINT)
               AS err_standing,
             CAST((${auditSubs.map { case (_, rb, _, _) =>
               s"(SELECT sum(d) FROM ${rb}xe)" }.mkString(" + ")}) AS BIGINT)
               AS err_retrained)
         SELECT t.n_rows, t.err_standing, t.err_retrained,
           o.skew_milli, o.n_cells_empty,
           CASE WHEN (t.err_standing - t.err_retrained) * 20
                     > t.err_retrained THEN 'retrain'
                WHEN o.skew_milli > 4000
                     OR o.n_cells_empty * 4 > $ivfPqCentroids
                     THEN 'rebalance'
                ELSE 'append' END AS decision
         FROM rtot t CROSS JOIN occ2 o"""
  }

  /** The q178 oracle, also the `b` leg of q180's composition: the
    * default (post-retrain) chain + the collision census, one row. */
  /** The q182 width rule in DuckDB: `Pq.sizeRerankWidth`'s
    * arithmetic re-derived from `count(*)` — target 500 milli,
    * calibration constants verbatim from `Pq.RerankCalibration`
    * (c = 0.723778, beta = 0.408133, gamma = 0.194287), raw =
    * floor(exp((ln(target) − ln c + γ·ln n) / β)) + 1, clamped to
    * [50, n]. One definition used by both the width-bound leg and
    * the carried columns, so the two cannot drift. Cross-engine FP
    * note: exp/ln differ from the JVM's by ≲ 1 ulp; the floor
    * boundary is safe because the raw solution sits ≥ 0.09 from an
    * integer at every gate corpus (checked at sf0.001/0.01/0.1). */
  private def rerankWidthSql: String =
    s"""SELECT rerank_width_raw,
           CAST(least(n_corpus, greatest(50, rerank_width_raw)) AS BIGINT)
             AS rerank_width
         FROM (
           SELECT CAST(count(*) AS BIGINT) AS n_corpus,
             CAST(floor(exp((ln(500.0 / 1000.0) - ln(0.723778)
               + 0.194287 * ln(CAST(count(*) AS DOUBLE))) / 0.408133))
               AS BIGINT) + 1 AS rerank_width_raw
           FROM embeddings WHERE vec_id % 10 <> 0)"""

  /** The INT8 rung's resolution census in DuckDB (round-16): replay
    * the exact-fallback tree's coarse chain (q39's cb/assign CTEs
    * verbatim — 64 cells, 2 assignments over the non-query split),
    * quantize each assigned vector with the SAME op order as
    * `SimilaritySearch.buildIvfIndexInt8` (scaleInv = 127/absMax
    * once; floor(x·scaleInv + 0.5) clamped to ±127 — all exactly
    * representable integers, so the list group-by partitions rows
    * identically to the byte-tuple group-by), then the per-cell
    * rows-vs-distinct-tuples census. Returns one row:
    * `i8_flagged` > 0 ⟺ the int8 stamp would read bit_budget. */
  private def int8FlaggedSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS i8_flagged FROM (
         WITH it8 AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings
           WHERE vec_id % 10 <> 0),
         cb8 AS (
           SELECT iid AS cid, ie AS ce FROM it8
           ORDER BY (((iid % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 1000003, iid
           LIMIT 64),
         asg8 AS (
           SELECT iid, ie, cid FROM (
             SELECT i.iid, i.ie, c.cid,
               row_number() OVER (PARTITION BY i.iid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(i.ie)),
                     x -> (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM it8 i CROSS JOIN cb8 c) WHERE rn <= 2),
         sc8 AS (
           SELECT 127.0 / max(greatest(
               abs(CAST(list_max(ie) AS DOUBLE)),
               abs(CAST(list_min(ie) AS DOUBLE)))) AS sinv
           FROM it8),
         iq8 AS (
           SELECT a.cid,
             list_transform(a.ie, x -> greatest(-127.0, least(127.0,
               floor(CAST(x AS DOUBLE) * sc8.sinv + 0.5)))) AS q
           FROM asg8 a CROSS JOIN sc8),
         tup8 AS (
           SELECT cid, q, count(*) AS tuple_n FROM iq8 GROUP BY 1, 2),
         cell8 AS (
           SELECT cid, CAST(sum(tuple_n) AS BIGINT) AS cell_n,
             count(*) AS n_tuples
           FROM tup8 GROUP BY 1)
         SELECT 1 AS one FROM cell8
         WHERE cell_n >= 16 AND n_tuples * 4 < cell_n)"""

  /** The q181/q182 three-rung arm election in DuckDB: the PQ census
    * elects past ivfpq; the int8 census elects between the int8 and
    * float exact rungs. Both replays are independent of the Spark
    * side's stamps — a stale stamp or a silently flipped rung
    * mismatches the column (and the rows, since the arms' outputs
    * differ). */
  private def searchArmSql: String =
    s"""SELECT CASE WHEN b.n_cells_flagged > 0 THEN
           (CASE WHEN i8.i8_flagged > 0 THEN 'exact_ivf'
            ELSE 'exact_int8' END)
         ELSE 'ivfpq' END AS search_arm
       FROM ($bitBudgetSql) b CROSS JOIN ($int8FlaggedSql) i8"""

  private def bitBudgetSql: String =
    s"""WITH ${ivfPqCtes()},
         ${bitBudgetCtes()}
         SELECT n_codes, n_cells_eval, n_cells_flagged, flagged_codes,
           max_tuple_load_milli,
           CASE WHEN n_cells_flagged > 0 THEN 'bit_budget' ELSE 'fit' END
             AS decision
         FROM bbagg"""

  /** The IVF-PQ probe + exact-re-rank query over an [[ivfPqCtes]]
    * chain (ends at `adc(qid, id, dist)`): wide top-50 candidates,
    * exact double squared-Euclidean re-score, final top-5 with
    * floored micro distances — q167's tail, shared verbatim by q170
    * so the two gates cannot drift on the re-rank. `modeCol` (q177)
    * additionally replays the q172 occupancy arithmetic over the
    * `rep` chain and carries the elected `search_mode` on every row —
    * the adaptive dispatch's election, independently recomputed.
    * `armCol` (q179) does the same one rung up: it replays the q178
    * resolution audit over the chain and carries the elected
    * `search_arm` — on a flagged corpus the Spark side would have
    * served the exact-vector fallback instead, so the rows AND the
    * column would both mismatch. */
  private def ivfPqRerankSql(ctes: String, modeCol: Boolean = false,
      armCol: Boolean = false, widthSql: String = "50"): String = {
    val modeCtes = if (!modeCol) "" else s""",
         opercell AS (
           SELECT cid, count(*) AS cell_n FROM rep GROUP BY cid),
         oocc AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells_occupied,
             CAST(sum(cell_n) AS BIGINT) AS n_codes,
             CAST(max(cell_n) AS BIGINT) AS max_cell
           FROM opercell),
         omode AS (
           SELECT CASE WHEN (max_cell * n_cells_occupied * 1000) // n_codes > 4000
                  THEN 'scan_budget' ELSE 'fixed_probes' END AS search_mode
           FROM oocc)"""
    val armCtes = if (!armCol) "" else s""",
         ${bitBudgetCtes()},
         barm AS (
           SELECT CASE WHEN n_cells_flagged > 0 THEN 'exact_ivf'
                  ELSE 'ivfpq' END AS search_arm
           FROM bbagg)"""
    val modeSel = (if (modeCol) ",\n           m.search_mode" else "") +
      (if (armCol) ",\n           a.search_arm" else "")
    val modeFrom = (if (modeCol) " CROSS JOIN omode m" else "") +
      (if (armCol) " CROSS JOIN barm a" else "")
    s"""WITH $ctes$modeCtes$armCtes,
         cand AS (
           SELECT qid, id FROM (
             SELECT qid, id,
               row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
             FROM adc) WHERE rank <= $widthSql),
         ex AS (
           SELECT c.qid, c.id,
             ${sqDistDoubleSql("qe.embedding", "ie.embedding", "64")} AS dist
           FROM cand c
           JOIN embeddings qe ON c.qid = qe.vec_id
           JOIN embeddings ie ON c.id = ie.vec_id),
         rr AS (
           SELECT qid, id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
           FROM ex)
         SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
           id AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro$modeSel
         FROM rr$modeFrom WHERE rank <= 5"""
  }

  /** The shared ADC candidate-distance CTE chain for q163/q164:
    * trained-on-corpus chains + query subvectors + per-pair summed
    * subspace distances `adc(qid, id, dist)`. */
  private def pqAdcCtes(): String =
    s"""${pqSubspaces.map { case (p, lo, hi) =>
          pqChainSql(p, lo, hi, pqK, "WHERE vec_id % 10 <> 0") }
          .mkString(",\n         ")},
         qv AS (
           SELECT vec_id AS qid,
             ${pqSubspaces.map { case (p, lo, hi) =>
               s"""list_transform(embedding[$lo:$hi],
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qm$p"""}
               .mkString(",\n             ")}
           FROM embeddings WHERE vec_id % 10 = 0),
         adc AS (
           SELECT q.qid, s0a2.id,
             ${pqSubspaces.map { case (p, lo, hi) =>
               s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, ${hi - lo + 1}),
                   j -> (q.qm$p[j] - ${p}cv.cv[j]) * (q.qm$p[j] - ${p}cv.cv[j]))),
                 (x, y) -> x + y)"""}.mkString("\n             + ")}
             AS dist
           FROM qv q CROSS JOIN s0a2
           ${pqSubspaces.drop(1).map { case (p, _, _) =>
             s"JOIN ${p}a2 ON s0a2.id = ${p}a2.id" }.mkString("\n           ")}
           ${pqSubspaces.map { case (p, _, _) =>
             s"JOIN ${p}c2 ${p}cv ON ${p}a2.cid = ${p}cv.cid" }
             .mkString("\n           ")})"""

  /** Shared winnowing CTE chain (q143 semantics): per-token polynomial
    * hashes → 4-gram rolling hashes → window-minimum fingerprints →
    * `fpx(doc_id, fp)` distinct. Shared with q145 so the two
    * containment relations cannot diverge. */
  private val winnowCte: String =
    """hs AS (
           SELECT doc_id, list_transform(toks, tok ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007)) AS h
           FROM tk),
         gg AS (
           SELECT doc_id, h, len(h) AS n,
             CASE WHEN len(h) >= 4 THEN
               list_transform(generate_series(1, len(h) - 3), j ->
                 ((((((h[j] * 131 + h[j+1]) % 1000000007) * 131 + h[j+2])
                   % 1000000007) * 131 + h[j+3]) % 1000000007))
             ELSE CAST([] AS BIGINT[]) END AS g
           FROM hs),
         fp0 AS (
           SELECT doc_id,
             CASE WHEN len(g) >= 4 THEN
                 list_distinct(list_transform(generate_series(1, len(g) - 3),
                   j -> list_min(g[j:j+3])))
               WHEN len(g) >= 1 THEN [list_min(g)]
               ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), h),
                 (f, x) -> (f * 31 + x) % 1000000007)]
             END AS fps
           FROM gg),
         fpx AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM fp0)"""

  /** Shared CTE chain for q132/q141: q13-labeled docs, token-evidence
    * weights, and the per-doc scored relation `nbfinal(doc_id,
    * n_features, nb_score, y)`. */
  private val nbScoredSql: String =
    """WITH lab AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         ql AS (
           SELECT doc_id, toks,
             CAST(CASE WHEN least(len(toks), 100) * 5
               + CAST(floor(len(list_filter(toks, t -> t IN
                   ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(toks)) AS BIGINT) >= 500
               THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM lab),
         dt AS (
           SELECT DISTINCT doc_id, y, unnest(toks) AS tok FROM ql),
         totals AS (
           SELECT CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
           FROM ql),
         cnt AS (
           SELECT tok, CAST(sum(y) AS BIGINT) AS df_pos,
             CAST(sum(1 - y) AS BIGINT) AS df_neg
           FROM dt GROUP BY 1),
         rates AS (
           SELECT tok,
             ((df_pos + 1) * 1000000) // (n_pos + 2) AS r_pos,
             ((df_neg + 1) * 1000000) // (n_neg + 2) AS r_neg
           FROM cnt, totals),
         w AS (
           SELECT tok,
             CAST((r_pos * 1000000) // greatest(r_pos + r_neg, 1) - 500000
               AS BIGINT) AS w_p,
             CAST(((1000000 - r_pos) * 1000000)
               // greatest(2000000 - r_pos - r_neg, 1) - 500000
               AS BIGINT) AS w_a
           FROM rates),
         wt AS (SELECT CAST(sum(w_a) AS BIGINT) AS w_abs_total FROM w),
         prior AS (
           SELECT CAST(((n_pos + 1) * 1000000) // (n_pos + n_neg + 2) - 500000
             AS BIGINT) AS prior_w
           FROM totals),
         scored AS (
           SELECT d.doc_id, d.y, CAST(count(*) AS BIGINT) AS n_features,
             CAST(sum(w.w_p - w.w_a) AS BIGINT) AS sw
           FROM dt d JOIN w USING (tok)
           GROUP BY 1, 2),
         nbfinal AS (
           SELECT doc_id, y, n_features,
             CAST(sw + w_abs_total + prior_w AS BIGINT) AS nb_score
           FROM scored, prior, wt)"""

  /** q147's rule-signal CTE (`grules`) and q144's blocklist CTE
    * (`blk`) — shared with the q150 funnel so the rule logic has one
    * definition per engine. Both expect `tk(doc_id, toks)` upstream. */
  private val gopherRulesCte: String =
    """grules AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, t -> CAST(length(t) AS BIGINT))),
               (a, b) -> a + b) * 1000) // len(toks) AS BIGINT) AS mean_wlen_milli,
             CAST(len(list_filter(list_distinct(toks), t -> t IN
               ('the','a','an','of','and','is','in','to'))) AS BIGINT) AS n_stop_kinds
           FROM tk),
         grules2 AS (
           SELECT *,
             CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_len,
             CAST(CASE WHEN mean_wlen_milli BETWEEN 3000 AND 10000 THEN 1 ELSE 0 END AS BIGINT) AS r_wlen,
             CAST(CASE WHEN n_stop_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop
           FROM grules)"""

  private val blocklistCte: String =
    """blk AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, t -> t IN ('slow','drop','error')))
               AS BIGINT) AS n_bad
           FROM tk),
         blk2 AS (
           SELECT doc_id, n_tokens, n_bad,
             CAST((n_bad * 1000000) // n_tokens AS BIGINT) AS bad_ppm
           FROM blk)"""

  /** q150/q151's shared funnel CTE chain (expects tokCte, clusterCte,
    * winnowCte, gopherRulesCte, blocklistCte upstream): per-doc stage
    * flags folded to `rr(source, reached)`. */
  private val funnelCte: String =
    """b3 AS (
           SELECT d.doc_id, d.source, d.text,
             CAST(CASE WHEN g.r_len = 1 AND g.r_wlen = 1 AND g.r_stop = 1
               THEN 1 ELSE 0 END AS BIGINT) AS f2,
             CAST(CASE WHEN g.r_len = 1 AND g.r_wlen = 1 AND g.r_stop = 1
               AND k.bad_ppm < 20000 THEN 1 ELSE 0 END AS BIGINT) AS f3
           FROM documents d
           JOIN grules2 g USING (doc_id) JOIN blk2 k USING (doc_id)),
         ex4 AS (
           SELECT text, min(doc_id) AS keep_id FROM b3 WHERE f3 = 1 GROUP BY 1),
         b4 AS (
           SELECT b3.doc_id, b3.source, b3.f2, b3.f3,
             CAST(CASE WHEN b3.f3 = 1 AND b3.doc_id = e.keep_id
               THEN 1 ELSE 0 END AS BIGINT) AS f4
           FROM b3 LEFT JOIN ex4 e ON b3.text = e.text),
         cm AS (
           SELECT cl.cluster_id, min(cl.doc_id) AS ckeep
           FROM cl JOIN b4 ON cl.doc_id = b4.doc_id AND b4.f4 = 1
           GROUP BY 1),
         b5 AS (
           SELECT b4.doc_id, b4.source, b4.f2, b4.f3, b4.f4,
             CAST(CASE WHEN b4.f4 = 1 AND b4.doc_id = cm.ckeep
               THEN 1 ELSE 0 END AS BIGINT) AS f5
           FROM b4 JOIN cl ON b4.doc_id = cl.doc_id
           LEFT JOIN cm ON cl.cluster_id = cm.cluster_id),
         cont AS (
           SELECT DISTINCT t.doc_id
           FROM (SELECT doc_id, fp FROM fpx WHERE doc_id % 25 <> 0) t
           JOIN (SELECT DISTINCT fp FROM fpx WHERE doc_id % 25 = 0) e USING (fp)),
         b6 AS (
           SELECT b5.*,
             CAST(CASE WHEN b5.f5 = 1 AND c.doc_id IS NULL
               THEN 1 ELSE 0 END AS BIGINT) AS f6
           FROM b5 LEFT JOIN cont c ON b5.doc_id = c.doc_id),
         rr AS (
           SELECT source, 1 + f2 + f3 + f4 + f5 + f6 AS reached FROM b6)"""

  protected val oracleSqlD: Map[String, String] = Map(
    "q136_bpe_train" ->
      s"""${bpePrefixSql(3)}
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS round, l AS lhs, r AS rhs, wgt AS weight FROM t1
           UNION ALL
           SELECT CAST(2 AS BIGINT), l, r, wgt FROM t2
           UNION ALL
           SELECT CAST(3 AS BIGINT), l, r, wgt FROM t3)""",
    "q137_bpe_encode" ->
      s"""${bpePrefixSql(3)},
         segs AS (SELECT w, CAST(len(sym) AS BIGINT) AS n_seg FROM sym4),
         tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_seg) AS BIGINT) AS bpe_tokens
         FROM tok JOIN segs USING (w)
         GROUP BY doc_id""",
    "q138_bpe_fertility" ->
      s"""${bpePrefixSql(3)},
         segs AS (SELECT w, CAST(len(sym) AS BIGINT) AS n_seg FROM sym4),
         tok AS (
           SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(w)) AS BIGINT) AS n_chars,
           CAST(sum(n_seg) AS BIGINT) AS bpe_tokens,
           CAST((sum(length(w)) * 1000) // sum(n_seg) AS BIGINT) AS fertility_milli
         FROM tok JOIN segs USING (w)
         GROUP BY source""",
    "q139_effective_tokens" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte,
         sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1),
         wts AS (
           SELECT doc_id, CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
           FROM cl JOIN sz USING (cluster_id)),
         tc AS (
           SELECT d.doc_id, d.source, CAST(len(t.toks) AS BIGINT) AS n_tokens
           FROM documents d JOIN tk t USING (doc_id))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(sum((n_tokens * weight_ppm) // 1000000) AS BIGINT) AS eff_tokens,
           CAST((sum((n_tokens * weight_ppm) // 1000000) * 1000000)
             // sum(n_tokens) AS BIGINT) AS eff_ppm
         FROM tc JOIN wts USING (doc_id)
         GROUP BY source""",
    "q140_epoch_plan" ->
      """WITH src AS (
           SELECT lang,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS n_langs
           FROM src),
         a1 AS (
           SELECT lang, n_tokens, total_tokens,
             least((2 * total_tokens) // n_langs, n_tokens * 3) AS alloc1,
             CASE WHEN n_tokens * 3 > (2 * total_tokens) // n_langs
               THEN 1 ELSE 0 END AS uncapped
           FROM src, tot),
         pool AS (
           SELECT CAST(max(total_tokens) * 2 - sum(alloc1) AS BIGINT) AS leftover,
             CAST(sum(CASE WHEN uncapped = 1 THEN n_tokens ELSE 0 END)
               AS BIGINT) AS uncapped_tokens
           FROM a1),
         a2 AS (
           SELECT lang, n_tokens,
             CASE WHEN uncapped = 1 AND uncapped_tokens > 0
               THEN least(n_tokens * 3,
                 alloc1 + (leftover * n_tokens) // uncapped_tokens)
               ELSE alloc1 END AS alloc_tokens
           FROM a1, pool)
         SELECT lang, n_tokens, CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
           CAST((alloc_tokens * 1000000) // n_tokens AS BIGINT) AS repeat_ppm,
           CAST(CASE WHEN (alloc_tokens * 1000000) // n_tokens >= 3000000
             THEN 1 ELSE 0 END AS BIGINT) AS capped
         FROM a2""",
    "q142_cluster_split" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte
         SELECT doc_id, cluster_id,
           CASE WHEN (((cluster_id % 1000000007 + 1) * 2654435761) % 1000000007)
                  * 2246822519 % 1000000007 % 10 < 8
                THEN 'train' ELSE 'test' END AS split
         FROM cl""",
    "q143_winnow_pairs" ->
      s"""WITH $tokCte,
         $winnowCte
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    "q144_blocklist" ->
      s"""WITH $tokCte,
         $blocklistCte
         SELECT doc_id, n_tokens, n_bad, bad_ppm,
           CAST(CASE WHEN bad_ppm < 20000 THEN 1 ELSE 0 END AS BIGINT) AS admitted
         FROM blk2""",
    "q145_dup_taxonomy" ->
      s"""WITH $tokCte,
         $jaccardPairsCte,
         $winnowCte,
         wpairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id),
         crossed AS (
           SELECT CASE WHEN j.id1 IS NOT NULL AND w.id1 IS NOT NULL THEN 'both'
                       WHEN j.id1 IS NOT NULL THEN 'semantic_only'
                       ELSE 'containment_only' END AS family
           FROM pairs j FULL OUTER JOIN wpairs w
             ON j.id1 = w.id1 AND j.id2 = w.id2)
         SELECT family, CAST(count(*) AS BIGINT) AS n_pairs
         FROM crossed GROUP BY family""",
    "q147_gopher_rules" ->
      s"""WITH $tokCte,
         $gopherRulesCte
         SELECT doc_id, n_tokens, mean_wlen_milli, n_stop_kinds,
           r_len, r_wlen, r_stop,
           CAST(CASE WHEN r_len = 1 AND r_wlen = 1 AND r_stop = 1
             THEN 1 ELSE 0 END AS BIGINT) AS admitted
         FROM grules2""",
    "q148_winnow_decontam" ->
      s"""WITH $tokCte,
         $winnowCte
         SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_fps
         FROM (SELECT doc_id, fp FROM fpx WHERE doc_id % 25 <> 0) t
         JOIN (SELECT DISTINCT fp FROM fpx WHERE doc_id % 25 = 0) e USING (fp)
         GROUP BY 1""",
    "q149_bpe_drift" ->
      s"""WITH ${bpeChainSql("f", 3, "")},
         ${bpeChainSql("g", 3, "WHERE doc_id % 5 <> 0")}
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS round,
             f.l || f.r AS merge_full, f.wgt AS weight_full,
             g.l || g.r AS merge_wo_batch, g.wgt AS weight_wo_batch,
             CAST(CASE WHEN f.l = g.l AND f.r = g.r THEN 1 ELSE 0 END
               AS BIGINT) AS same
           FROM ft1 f, gt1 g
           UNION ALL
           SELECT CAST(2 AS BIGINT), f.l || f.r, f.wgt, g.l || g.r, g.wgt,
             CAST(CASE WHEN f.l = g.l AND f.r = g.r THEN 1 ELSE 0 END AS BIGINT)
           FROM ft2 f, gt2 g
           UNION ALL
           SELECT CAST(3 AS BIGINT), f.l || f.r, f.wgt, g.l || g.r, g.wgt,
             CAST(CASE WHEN f.l = g.l AND f.r = g.r THEN 1 ELSE 0 END AS BIGINT)
           FROM ft3 f, gt3 g)""",
    "q150_curation_funnel" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte,
         $winnowCte,
         $gopherRulesCte,
         $blocklistCte,
         $funnelCte,
         st AS (
           SELECT unnest(generate_series(1, 6)) AS stage, reached FROM rr)
         SELECT CAST(stage AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM st WHERE reached >= stage
         GROUP BY 1""",
    "q151_funnel_by_source" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte,
         $winnowCte,
         $gopherRulesCte,
         $blocklistCte,
         $funnelCte,
         st AS (
           SELECT source, unnest(generate_series(1, 6)) AS stage, reached
           FROM rr)
         SELECT source, CAST(stage AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM st WHERE reached >= stage
         GROUP BY 1, 2""",
    "q135_cdc_chunks" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         hs AS (
           SELECT doc_id, list_transform(toks, tok ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007)) AS h
           FROM tk),
         gg AS (
           SELECT doc_id, h, len(h) AS n,
             CASE WHEN len(h) >= 4 THEN
               list_transform(generate_series(1, len(h) - 3), j ->
                 ((((((h[j] * 131 + h[j+1]) % 1000000007) * 131 + h[j+2])
                   % 1000000007) * 131 + h[j+3]) % 1000000007))
             ELSE CAST([] AS BIGINT[]) END AS g
           FROM hs),
         st AS (
           SELECT doc_id, h, n,
             list_prepend(CAST(1 AS BIGINT), CASE WHEN n >= 5 THEN
               list_transform(
                 list_filter(generate_series(1, greatest(n - 4, 1)),
                   j -> g[j] % 8 = 0),
                 j -> j + 4)
             ELSE CAST([] AS BIGINT[]) END) AS starts
           FROM gg),
         kx AS (
           SELECT doc_id, h, starts,
             unnest(generate_series(1, len(starts))) AS k
           FROM st),
         ch AS (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               h[starts[k]:CASE WHEN k < len(starts) THEN starts[k+1] - 1
                           ELSE len(h) END]),
               (f, x) -> (f * 31 + x) % 1000000007) AS fp,
             CAST((CASE WHEN k < len(starts) THEN starts[k+1] - 1
                   ELSE len(h) END) - starts[k] + 1 AS BIGINT) AS len
           FROM kx),
         occ AS (SELECT fp, count(*) AS occ FROM ch GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(sum(len) AS BIGINT) AS n_tokens,
           CAST((sum(CASE WHEN occ >= 2 THEN len ELSE 0 END) * 1000000)
             // sum(len) AS BIGINT) AS dup_ppm
         FROM ch JOIN occ USING (fp)
         GROUP BY doc_id""",
    "q132_nb_classifier" ->
      s"""$nbScoredSql
         SELECT doc_id, n_features, nb_score,
           CAST(CASE WHEN nb_score > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred_hi,
           y AS is_hi
         FROM nbfinal""",
    "q141_score_calibration" ->
      s"""$nbScoredSql,
         -- decile boundaries by EXPLICIT integer rank arithmetic (not
         -- quantile_disc, whose index/tie convention is engine-lore):
         -- boundary p = the ceil(p*n/10)-th smallest score, which is
         -- precisely the ANSI percentile_disc definition Spark
         -- implements (smallest value whose cume_dist >= p) — the
         -- value at a given rank in the sorted multiset is well-
         -- defined regardless of tie order, so both engines agree by
         -- construction
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nbfinal),
         rkd AS (
           SELECT nb_score,
             row_number() OVER (ORDER BY nb_score) AS rk
           FROM nbfinal),
         b AS (
           SELECT
             CAST(max(CASE WHEN rk = (1*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b1,
             CAST(max(CASE WHEN rk = (2*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b2,
             CAST(max(CASE WHEN rk = (3*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b3,
             CAST(max(CASE WHEN rk = (4*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b4,
             CAST(max(CASE WHEN rk = (5*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b5,
             CAST(max(CASE WHEN rk = (6*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b6,
             CAST(max(CASE WHEN rk = (7*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b7,
             CAST(max(CASE WHEN rk = (8*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b8,
             CAST(max(CASE WHEN rk = (9*n + 9) // 10 THEN nb_score END) AS BIGINT) AS b9
           FROM rkd, nn),
         x AS (
           SELECT nb_score, y,
             (CASE WHEN nb_score > b1 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b2 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b3 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b4 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b5 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b6 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b7 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b8 THEN 1 ELSE 0 END) +
             (CASE WHEN nb_score > b9 THEN 1 ELSE 0 END) AS decile
           FROM nbfinal, b)
         SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_hi,
           CAST(min(nb_score) AS BIGINT) AS lo_score,
           CAST(max(nb_score) AS BIGINT) AS hi_score,
           CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS hi_rate_ppm
         FROM x
         GROUP BY decile""",
    "q133_quality_survivors" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte,
         qual AS (
           SELECT doc_id,
             CAST(least(len(toks), 100) * 5
               + CAST(floor(len(list_filter(toks, t -> t IN
                   ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(toks)) AS BIGINT) AS BIGINT) AS quality
           FROM tk),
         sel AS (
           SELECT cluster_id, doc_id, quality,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY quality DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS cs
           FROM cl JOIN qual USING (doc_id))
         SELECT cluster_id, CAST(cs AS BIGINT) AS cluster_size,
           doc_id AS keep_id, quality AS keep_quality
         FROM sel WHERE rn = 1""",
    "q162_pq_encode" ->
      s"""WITH ${pqSubspaces.map { case (p, lo, hi) =>
            pqChainSql(p, lo, hi, pqK, "") }.mkString(",\n         ")},
         ${pqSubspaces.map { case (p, lo, hi) =>
            pqErrCte(p, hi - lo + 1) }.mkString(",\n         ")}
         SELECT s0e.id AS vec_id,
           ${pqSubspaces.zipWithIndex.map { case ((p, _, _), i) =>
             s"CAST(${p}e.cid AS BIGINT) AS code$i" }.mkString(",\n           ")},
           CAST(${pqSubspaces.map { case (p, _, _) => s"${p}e.err" }
             .mkString(" + ")} AS BIGINT) AS recon_err
         FROM s0e ${pqSubspaces.drop(1).map { case (p, _, _) =>
           s"JOIN ${p}e USING (id)" }.mkString(" ")}""",
    "q163_pq_adc" ->
      s"""WITH ${pqAdcCtes()},
         r AS (
           SELECT qid, id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
           FROM adc)
         SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
           id AS neighbor_id, CAST(dist AS BIGINT) AS adc_dist
         FROM r WHERE rank <= 5""",
    "q164_pq_rerank" ->
      s"""WITH ${pqAdcCtes()},
         cand AS (
           SELECT qid, id FROM (
             SELECT qid, id,
               row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
             FROM adc) WHERE rank <= 50),
         ex AS (
           SELECT c.qid, c.id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 i -> (CAST(qe.embedding[i] AS DOUBLE) - CAST(ie.embedding[i] AS DOUBLE))
                   * (CAST(qe.embedding[i] AS DOUBLE) - CAST(ie.embedding[i] AS DOUBLE)))),
               (x, y) -> x + y) AS dist
           FROM cand c
           JOIN embeddings qe ON c.qid = qe.vec_id
           JOIN embeddings ie ON c.id = ie.vec_id),
         rr AS (
           SELECT qid, id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
           FROM ex)
         SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
           id AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM rr WHERE rank <= 5""",
    "q167_ivfpq_rerank" -> ivfPqRerankSql(ivfPqCtes()),
    // q170: the INCREMENTALLY MAINTAINED index — codebooks trained
    // before the batch arrived (vec_id % 7 = 3 excluded from
    // training), codes covering old ∪ batch (the appended files).
    // Same probe + rerank pipeline; an independent replay, not a
    // shared oracle, because the training subset genuinely differs
    // from q167's.
    "q170_ivfpq_incr" -> ivfPqRerankSql(ivfPqCtes(
      corpusWhere = "vec_id % 10 <> 0",
      trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3")),
    // q176: scan-budget probing over q170's appended lineage — the
    // probe CTE becomes a cumulative-occupancy walk (budget 1200)
    // q177: adaptive dispatch — the q172 occupancy arithmetic elects
    // the mode (deterministically fixed_probes on this corpus), the
    // fixed-probe walk runs, and the elected mode is carried on every
    // row; a flipped election would mismatch BOTH the column and rows
    "q177_ivfpq_adaptive" -> ivfPqRerankSql(ivfPqCtes(
      corpusWhere = "vec_id % 10 <> 0",
      trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3"),
      modeCol = true),
    "q176_ivfpq_budget" -> ivfPqRerankSql(ivfPqCtes(
      corpusWhere = "vec_id % 10 <> 0",
      trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3",
      scanBudget = Some(1200L))),
    // q178: the bit-budget (resolution) audit on the POST-RETRAIN
    // representation — q167's chain (codebooks trained on the corpus
    // they encode), per-cell distinct code-tuple census, one-row
    // integer rollup + verdict. On this corpus every evaluated cell
    // censuses collision-free (1000 milli) ⇒ 'fit'; the compress
    // drift ingest is where it flags (AnnDriftBench / BASELINE.md).
    "q178_ann_bit_budget" -> bitBudgetSql,
    // q179: exact-fallback dispatch — the q178 audit elects the arm
    // (deterministically 'ivfpq' on this corpus), q167's fixed-probe
    // rerank runs, and the elected arm is carried on every row; a
    // flipped election would mismatch BOTH the column and the rows
    // (the Spark side would have served exact-vector results).
    "q179_ann_exact_fallback" -> ivfPqRerankSql(ivfPqCtes(),
      armCol = true),
    // q181: the FULL search dispatch — q180's search-side twin. The
    // ivfpq leg is q177's oracle verbatim (incr-lineage rerank with
    // the occupancy-elected search_mode re-derived and carried); the
    // ARM election re-derives the q178 census over the post-retrain
    // chain in its own WITH-scoped derived table (the q180
    // composition trick), so the two chains' CTE names never meet.
    "q181_ann_search_dispatch" ->
      s"""SELECT r.*, a.search_arm
         FROM (${ivfPqRerankSql(ivfPqCtes(
           corpusWhere = "vec_id % 10 <> 0",
           trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3"),
           modeCol = true)}) r
         CROSS JOIN ($searchArmSql) a""",
    // q182: the width-SIZED dispatch — q181 with the rerank width
    // elected by the sizeRerankWidth rule. The oracle re-derives BOTH
    // rule outputs from count(*) + the calibrated inversion (raw =
    // floor(exp((ln(target)−ln c + γ·ln n)/β))+1, clamped to
    // [50, n]) and bounds its own candidate rank by its own derived
    // width, so a rule drift mismatches the columns and a threading
    // drift mismatches the rows.
    "q182_ann_dispatch_sized" ->
      s"""SELECT r.*, a.search_arm,
           w.rerank_width_raw, w.rerank_width
         FROM (${ivfPqRerankSql(ivfPqCtes(
           corpusWhere = "vec_id % 10 <> 0",
           trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3") +
           s",\n         wrule AS ($rerankWidthSql)",
           modeCol = true,
           widthSql = "(SELECT rerank_width FROM wrule)")}) r
         CROSS JOIN ($searchArmSql) a
         CROSS JOIN ($rerankWidthSql) w""",
    // q173: coarse-rebalance — q170's lineage with the cells re-cut
    // by a fresh coarse chain over the grown corpus while the PQ
    // codebooks keep training batch-less against the old cells
    "q173_ivfpq_rebalance" -> ivfPqRerankSql(ivfPqCtes(
      corpusWhere = "vec_id % 10 <> 0",
      trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3",
      rebalance = true)),
    // q172: cell-occupancy audit of the appended index — cell
    // membership is q170's `rep` chain verbatim (coarse trained
    // without the batch, replication over old ∪ batch; unreferenced
    // CTEs of the shared chain cost nothing), rolled up to one row
    // of integer occupancy stats + the rebalance decision.
    "q172_ivfpq_occupancy" -> {
      s"""WITH ${ivfPqCtes(
            corpusWhere = "vec_id % 10 <> 0",
            trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3")},
         percell AS (
           SELECT cid, count(*) AS cell_n FROM rep GROUP BY cid),
         occ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells_occupied,
             CAST(sum(cell_n) AS BIGINT) AS n_codes,
             CAST(max(cell_n) AS BIGINT) AS max_cell,
             CAST(min(cell_n) AS BIGINT) AS min_cell
           FROM percell)
         SELECT n_cells_occupied,
           CAST($ivfPqCentroids - n_cells_occupied AS BIGINT)
             AS n_cells_empty,
           n_codes, max_cell, min_cell,
           (max_cell * n_cells_occupied * 1000) // n_codes AS skew_milli,
           CASE WHEN (max_cell * n_cells_occupied * 1000) // n_codes > 4000
                  OR ($ivfPqCentroids - n_cells_occupied) * 4 > $ivfPqCentroids
                THEN 'rebalance' ELSE 'keep' END AS decision,
           CASE WHEN (max_cell * n_cells_occupied * 1000) // n_codes > 4000
                THEN 'scan_budget' ELSE 'fixed_probes' END AS search_mode
         FROM occ"""
    },
    // q175: the residual-space maintenance policy — q174's refined
    // twin. Occupancy comes from the APPENDED tree's cells (rep vs
    // cc2, the rebalance=false chain), the drift side prices the
    // standing-proxy codebooks in the post-rebalance representation:
    // a fresh full-width coarse chain over the grown corpus (gc2),
    // standing-proxy residual chains (ra*: old residuals vs OLD
    // coarse), retrained chains (rb*: grown residuals vs NEW coarse),
    // both error-summed over the grown-vs-new-coarse rows.
    "q175_ann_maint_residual" -> residualPolicySql,
    // q180: the FULL four-rung ladder in one election — q175's
    // refresh policy and q178's resolution audit composed (each leg a
    // WITH-scoped derived table, so the two chains' CTE namespaces
    // never meet), final decision `exact_fallback` when the bits
    // cannot rank even the post-retrain representation (no refresh
    // op can buy that back — AnnDriftBench), else q175's election.
    "q180_ann_maint_ladder" ->
      s"""SELECT p.n_rows, p.err_standing, p.err_retrained,
           p.skew_milli, p.n_cells_empty,
           p.decision AS refresh_decision,
           b.n_cells_flagged, b.max_tuple_load_milli,
           b.decision AS resolution_decision,
           CASE WHEN b.decision = 'bit_budget' THEN 'exact_fallback'
                ELSE p.decision END AS decision
         FROM ($residualPolicySql) p CROSS JOIN ($bitBudgetSql) b""",
    // q171: codebook-drift audit — the q149 pattern for the ANN
    // index. Two full PQ trainings (m=4 × 16-dim subspaces, k=16,
    // the audit budget) over the standing corpus (batch excluded)
    // and the grown corpus; both codebook sets price the GROWN
    // corpus's reconstruction error; the retrain decision is a pure
    // integer comparison (drift > 5% ⟺ 20·(standing − retrained) >
    // retrained), no division rounding to diverge on.
    "q171_pq_drift" ->
      s"""WITH ${pqDriftCtes()}
         SELECT n_rows, err_standing, err_retrained,
           CASE WHEN (err_standing - err_retrained) * 20 > err_retrained
                THEN 'retrain' ELSE 'keep' END AS decision
         FROM tot""",
    // q174: the maintenance POLICY — both alarm chains (q171 drift,
    // q172 occupancy) replayed in ONE oracle, rolled up to the
    // three-way decision ladder retrain > rebalance > append. The
    // occupancy side reuses ivfPqCtes' `rep` (only the coarse chain
    // is referenced; the unreferenced probe/ADC CTEs cost nothing),
    // the drift side is q171's chains verbatim (disjoint ta*/tb*
    // prefixes).
    "q174_ann_maint_policy" -> {
      s"""WITH ${ivfPqCtes(
            corpusWhere = "vec_id % 10 <> 0",
            trainWhere = "vec_id % 10 <> 0 AND vec_id % 7 <> 3")},
         percell AS (
           SELECT cid, count(*) AS cell_n FROM rep GROUP BY cid),
         occ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells_occupied,
             CAST(sum(cell_n) AS BIGINT) AS n_codes,
             CAST(max(cell_n) AS BIGINT) AS max_cell
           FROM percell),
         occ2 AS (
           SELECT (max_cell * n_cells_occupied * 1000) // n_codes
               AS skew_milli,
             CAST($ivfPqCentroids - n_cells_occupied AS BIGINT)
               AS n_cells_empty
           FROM occ),
         ${pqDriftCtes()}
         SELECT t.n_rows, t.err_standing, t.err_retrained,
           o.skew_milli, o.n_cells_empty,
           CASE WHEN (t.err_standing - t.err_retrained) * 20
                     > t.err_retrained THEN 'retrain'
                WHEN o.skew_milli > 4000
                     OR o.n_cells_empty * 4 > $ivfPqCentroids
                     THEN 'rebalance'
                ELSE 'append' END AS decision
         FROM tot t CROSS JOIN occ2 o"""
    },
    "q160_source_copy_matrix" ->
      s"""WITH RECURSIVE $tokCte,
         $jaccardPairsCte,
         $cappedClusterCte
         SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM cpairs p
         JOIN documents da ON p.id1 = da.doc_id
         JOIN documents db ON p.id2 = db.doc_id
         GROUP BY 1, 2""",
    "q161_shingle_saturation" ->
      s"""WITH $tokCte,
         $jaccardPairsCte,
         sx AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         dfs AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sx GROUP BY s),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_distinct_shingles,
             CAST(sum(df) AS BIGINT) AS n_occurrences,
             CAST(max(df) AS BIGINT) AS max_df,
             CAST(sum(CASE WHEN df > 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stop_shingles,
             CAST(sum(CASE WHEN df > 5 THEN df ELSE 0 END) AS BIGINT)
               AS stop_occurrences
           FROM dfs)
         SELECT n_docs, n_distinct_shingles, n_occurrences, max_df,
           n_stop_shingles, stop_occurrences,
           CAST((n_occurrences * 1000) // n_distinct_shingles AS BIGINT)
             AS mean_df_milli,
           CAST((stop_occurrences * 1000000) // n_occurrences AS BIGINT)
             AS stop_mass_ppm
         FROM agg, nd""",
    "q169_clustering_policy" ->
      s"""WITH $tokCte,
         $jaccardPairsCte,
         sx AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         dfs AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sx GROUP BY s),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_distinct_shingles,
             CAST(sum(df) AS BIGINT) AS n_occurrences,
             CAST(sum(CASE WHEN df > 5 THEN df ELSE 0 END) AS BIGINT)
               AS stop_occurrences
           FROM dfs),
         sig AS (
           SELECT n_docs, n_distinct_shingles,
             CAST((n_occurrences * 1000) // n_distinct_shingles AS BIGINT)
               AS mean_df_milli,
             CAST((stop_occurrences * 1000000) // n_occurrences AS BIGINT)
               AS stop_mass_ppm
           FROM agg, nd)
         SELECT n_docs, n_distinct_shingles, mean_df_milli, stop_mass_ppm,
           CAST(5 AS BIGINT) AS df_cap,
           CASE WHEN mean_df_milli > 10000 OR stop_mass_ppm > 500000
                THEN 'capped_q156' ELSE 'exact_q43' END AS policy
         FROM sig""",
    "q158_uncertainty_sample" ->
      s"""$nbScoredSql,
         r AS (
           SELECT doc_id, nb_score,
             row_number() OVER (ORDER BY abs(nb_score), doc_id) AS rank
           FROM nbfinal)
         SELECT CAST(rank AS BIGINT) AS rank, doc_id, nb_score
         FROM r WHERE rank <= 64""",
    "q159_dim_stats" ->
      """WITH e AS (
           SELECT unnest(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))) AS x,
             unnest(generate_series(1, len(embedding))) AS dimpos
           FROM embeddings),
         s AS (
           SELECT CAST(dimpos - 1 AS BIGINT) AS dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sum_milli,
             CAST(sum(x * x) AS BIGINT) AS sumsq_milli,
             CAST(min(x) AS BIGINT) AS min_milli,
             CAST(max(x) AS BIGINT) AS max_milli
           FROM e GROUP BY 1)
         SELECT dim, n, sum_milli, sumsq_milli, min_milli, max_milli,
           CAST(floor(CAST(sum_milli AS DOUBLE) / n) AS BIGINT) AS mean_milli,
           CAST((CAST(n AS HUGEINT) * sumsq_milli
                 - CAST(sum_milli AS HUGEINT) * sum_milli)
                // (CAST(n AS HUGEINT) * n)
             AS BIGINT) AS var_milli2
         FROM s""",
    "q156_capped_clusters" ->
      s"""WITH RECURSIVE $tokCte,
         $jaccardPairsCte,
         $cappedClusterCte
         SELECT doc_id, cluster_id FROM ccl""",
    "q157_clustering_agreement" ->
      s"""WITH RECURSIVE $tokCte,
         $clusterCte,
         $cappedClusterCte
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cl.cluster_id = ccl.cluster_id
             THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
           CAST((sum(CASE WHEN cl.cluster_id = ccl.cluster_id
             THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS same_ppm,
           CAST(count(DISTINCT cl.cluster_id) AS BIGINT) AS n_clusters_exact,
           CAST(count(DISTINCT ccl.cluster_id) AS BIGINT) AS n_clusters_capped
         FROM cl JOIN ccl USING (doc_id)""",
    "q134_shard_layout" ->
      """WITH s AS (
           SELECT doc_id, source,
             (doc_id * 2654435761 + 40503) % 1000003 AS skey
           FROM documents)
         SELECT doc_id, source, CAST(skey % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY skey % 8
             ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
         FROM s""",
    // q185: the calibration re-fit replayed from the same grid
    // LITERALS with the same fixed-order arithmetic as
    // Pq.fitRerankCalibration (beta = mean width slope, gamma = mean
    // size slope, lnc = mean intercept in the order (wLo,nLo),
    // (wLo,nHi), (wHi,nLo), (wHi,nHi)), then the sized widths via
    // the q182 inversion — including the ln(exp(lnc)) round-trip,
    // because the Spark side reads c = exp(lnc) from the artifact
    // and re-takes its log inside sizeRerankWidth. Cross-engine FP
    // note: same contract as q182 — exp/ln agree to ≲ 1 ulp and
    // every floored value sits ≥ 0.01 from its integer boundary
    // (checked: c·1e6 frac 0.66, width fracs 0.016/0.22).
    // q190: the store bucket-count sizing rule — pure integer corpus
    // arithmetic (count, max vector width, 8+4·dim payload model,
    // clamped ceil division at the gate's 64 KiB target), replayed
    // exactly (// is DuckDB integer division; every term BIGINT).
    // max() is coalesced to 0 — the Spark side's empty-corpus guard
    // mirrored (round-18 advice), so a degenerate input elects the
    // floor clamp of 1 in both engines, not maxBuckets.
    "q190_store_sizing" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(coalesce(max(len(embedding)), 0) AS BIGINT) AS dim,
           CAST(count(*) * (8 + 4 * coalesce(max(len(embedding)), 0))
             AS BIGINT) AS payload_bytes,
           CAST(65536 AS BIGINT) AS target_file_bytes,
           CAST(greatest(1, least(1048576,
             (count(*) * (8 + 4 * coalesce(max(len(embedding)), 0))
               + 65535) // 65536))
             AS BIGINT) AS n_buckets
         FROM embeddings""",

    "q185_rerank_calibration" ->
      """WITH bg AS (
           SELECT
             (ln((563.0/1000.0)/(255.0/1000.0)) + ln((455.0/1000.0)/(184.0/1000.0)))
               / (2.0 * ln(400.0/50.0)) AS beta,
             (ln((255.0/1000.0)/(184.0/1000.0)) + ln((563.0/1000.0)/(455.0/1000.0)))
               / (2.0 * ln(3686400.0/921600.0)) AS gamma),
         cc AS (
           SELECT beta, gamma,
             ((((ln(255.0/1000.0) - beta*ln(50.0) + gamma*ln(921600.0))
              + (ln(184.0/1000.0) - beta*ln(50.0) + gamma*ln(3686400.0)))
              + (ln(563.0/1000.0) - beta*ln(400.0) + gamma*ln(921600.0)))
              + (ln(455.0/1000.0) - beta*ln(400.0) + gamma*ln(3686400.0))) / 4.0 AS lnc
           FROM bg),
         w AS (
           SELECT beta, gamma, lnc,
             CAST(floor(exp((ln(500.0/1000.0) - ln(exp(lnc)) + gamma*ln(921600.0))/beta)) AS BIGINT) + 1 AS raw1m,
             CAST(floor(exp((ln(500.0/1000.0) - ln(exp(lnc)) + gamma*ln(3686400.0))/beta)) AS BIGINT) + 1 AS raw4m
           FROM cc)
         SELECT CAST(4 AS BIGINT) AS n_grid,
           CAST(floor(exp(lnc)*1000000.0) AS BIGINT) AS c_micro,
           CAST(floor(beta*1000000.0) AS BIGINT) AS beta_micro,
           CAST(floor(gamma*1000000.0) AS BIGINT) AS gamma_micro,
           CAST(least(921600, greatest(50, raw1m)) AS BIGINT) AS width_1m,
           CAST(least(3686400, greatest(50, raw4m)) AS BIGINT) AS width_4m
         FROM w""")
}
