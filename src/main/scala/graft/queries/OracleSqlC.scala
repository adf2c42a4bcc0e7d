package graft
package queries

/** DuckDB-dialect oracle SQL, queries q94–q122. Split out of the former
  * monolithic `Queries` object — pure move, no semantic change.
  */
private[graft] trait OracleSqlC extends OracleShared {

  /** Unrolled deterministic-Lloyd CTE chain shared by the q127/q153/
    * q154 oracles (milli-quantized embeddings -> smallest-id seeded
    * codebook -> 2 assign+update rounds -> final assignment
    * `a2(id, cid)`, with `mv` carrying the original vectors) — one
    * definition so the capped twin and the width audit cannot drift
    * from q127's clustering. */
  private val semdedupLloydCte: String =
    """mv AS (
           SELECT vec_id AS id, embedding AS e,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mv
           FROM embeddings),
         c00 AS (SELECT id, mv FROM mv ORDER BY id LIMIT 8),
         c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, mv AS cv
                FROM c00),
         d0 AS (
           SELECT m.id, c.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 64),
                 i -> (m.mv[i] - c.cv[i]) * (m.mv[i] - c.cv[i]))),
               (x, y) -> x + y) AS d
           FROM mv m CROSS JOIN c0 c),
         a0 AS (SELECT id, cid FROM (
             SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM d0) WHERE rn = 1),
         c1 AS (
           SELECT cid, list(mj ORDER BY j) AS cv FROM (
             SELECT a.cid, g.j,
               CAST(floor(CAST(sum(m.mv[g.j]) AS DOUBLE) / count(*)) AS BIGINT)
                 AS mj
             FROM a0 a JOIN mv m USING (id)
             CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) g
             GROUP BY a.cid, g.j) t
           GROUP BY cid),
         d1 AS (
           SELECT m.id, c.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 64),
                 i -> (m.mv[i] - c.cv[i]) * (m.mv[i] - c.cv[i]))),
               (x, y) -> x + y) AS d
           FROM mv m CROSS JOIN c1 c),
         a1 AS (SELECT id, cid FROM (
             SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM d1) WHERE rn = 1),
         c2 AS (
           SELECT cid, list(mj ORDER BY j) AS cv FROM (
             SELECT a.cid, g.j,
               CAST(floor(CAST(sum(m.mv[g.j]) AS DOUBLE) / count(*)) AS BIGINT)
                 AS mj
             FROM a1 a JOIN mv m USING (id)
             CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) g
             GROUP BY a.cid, g.j) t
           GROUP BY cid),
         d2 AS (
           SELECT m.id, c.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 64),
                 i -> (m.mv[i] - c.cv[i]) * (m.mv[i] - c.cv[i]))),
               (x, y) -> x + y) AS d
           FROM mv m CROSS JOIN c2 c),
         a2 AS (SELECT id, cid FROM (
             SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM d2) WHERE rn = 1)"""

  /** q127's full SemDeDup oracle, optionally width-capped: with
    * `cap`, clusters wider than it are excluded from the pair join
    * (members all kept) — [[operators.SemDedup.semDedup]]'s
    * `maxClusterWidth` semantics replayed in SQL. */
  private def semdedupSql(cap: Option[Int]): String = {
    val src = if (cap.isDefined) "clc" else "cl"
    val capCtes = cap.map(c => s""",
         cw AS (SELECT cid, count(*) AS w FROM a2 GROUP BY cid),
         clc AS (
           SELECT cl.id, cl.cluster, cl.e FROM cl
           JOIN cw ON cl.cluster = cw.cid AND cw.w <= $c)""").getOrElse("")
    s"""WITH $semdedupLloydCte,
         cl AS (SELECT a2.id, a2.cid AS cluster, m.e
                FROM a2 JOIN mv m USING (id))$capCtes,
         p AS (
           SELECT x.id AS id1, y.id AS id2,
             CAST(floor(1000000.0 *
               (CASE WHEN sqrt(
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(generate_series(1, 64),
                       i -> CAST(x.e[i] AS DOUBLE) * CAST(x.e[i] AS DOUBLE))),
                     (u, v) -> u + v)) *
                 sqrt(
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(generate_series(1, 64),
                       i -> CAST(y.e[i] AS DOUBLE) * CAST(y.e[i] AS DOUBLE))),
                     (u, v) -> u + v)) = 0 THEN 0.0
               ELSE
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, 64),
                     i -> CAST(x.e[i] AS DOUBLE) * CAST(y.e[i] AS DOUBLE))),
                   (u, v) -> u + v) /
                 (sqrt(
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(generate_series(1, 64),
                       i -> CAST(x.e[i] AS DOUBLE) * CAST(x.e[i] AS DOUBLE))),
                     (u, v) -> u + v)) *
                  sqrt(
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(generate_series(1, 64),
                       i -> CAST(y.e[i] AS DOUBLE) * CAST(y.e[i] AS DOUBLE))),
                     (u, v) -> u + v)))
               END)) AS BIGINT) AS cos_micro
           FROM $src x JOIN $src y ON x.cluster = y.cluster AND x.id < y.id),
         drp AS (SELECT DISTINCT id2 AS id FROM p WHERE cos_micro >= 350000)
         SELECT a2.id AS vec_id, a2.cid AS cluster,
           CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         FROM a2 LEFT JOIN drp d ON a2.id = d.id"""
  }

  protected val oracleSqlC: Map[String, String] = Map(
    "q94_revenue_share" ->
      """WITH bn AS (
           SELECT n_name, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name),
         g AS (SELECT CAST(sum(total_cents) AS BIGINT) AS grand_cents FROM bn)
         SELECT n_name, n_orders, total_cents, grand_cents,
           (total_cents * 1000000) // grand_cents AS share_ppm
         FROM bn CROSS JOIN g""",
    "q95_daily_delta" ->
      """WITH d AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1)
         SELECT d.di, d.cents, p.cents AS prev_cents,
           d.cents - COALESCE(p.cents, 0) AS delta_cents
         FROM d LEFT JOIN d p ON d.di = p.di + 1""",
    "q96_rolling_actives" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di
           FROM events),
         o AS (SELECT CAST(gs AS BIGINT) AS off
               FROM generate_series(0, 6) AS t(gs)),
         w AS (SELECT DISTINCT user_id, di + off AS wend
               FROM ud CROSS JOIN o),
         mx AS (SELECT max(di) AS maxd FROM ud)
         SELECT wend, count(*) AS actives_7d
         FROM w CROSS JOIN mx
         WHERE wend <= maxd
         GROUP BY wend""",
    "q97_transitions" ->
      """WITH s AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
         FROM s WHERE next_type IS NOT NULL
         GROUP BY 1, 2""",
    "q98_series_lsh_recall" ->
      """WITH r AS (
           SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, CAST((rn - 1) // 4 AS BIGINT) AS seg,
             CAST(sum(cents) AS BIGINT) AS seg_sum
           FROM r WHERE rn <= 16 GROUP BY 1, 2),
         fullk AS (
           SELECT user_id FROM (
             SELECT user_id, count(*) AS n FROM r WHERE rn <= 16 GROUP BY 1)
           WHERE n = 16),
         pf AS (SELECT p.* FROM p JOIN fullk USING (user_id)),
         v AS (SELECT user_id, list(seg_sum ORDER BY seg) AS vec
               FROM pf GROUP BY 1),
         sk AS (
           SELECT user_id FROM fullk
           ORDER BY (user_id * 2654435761 + 12345) % 1000003, user_id
           LIMIT 64),
         dx AS (
           SELECT a.user_id AS ka, b.user_id AS kb,
             CAST(sum((a.seg_sum - b.seg_sum) * (a.seg_sum - b.seg_sum))
               AS BIGINT) AS dist
           FROM pf a JOIN sk ON a.user_id = sk.user_id
           JOIN pf b ON a.seg = b.seg AND a.user_id <> b.user_id
           GROUP BY 1, 2),
         ex AS (
           SELECT ka, kb FROM (
             SELECT ka, kb,
               row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
             FROM dx)
           WHERE rn2 <= 3),
         cells AS (
           SELECT user_id, tbl,
             list_transform(generate_series(0, 3), p ->
               CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(0, 3), d ->
                   CAST(vec[d+1] AS DOUBLE) *
                   (CAST((((tbl*4+p)*6700417 + d + 1) * 2654435761)
                     % 1000000007 AS DOUBLE) / 1000000007.0 - 0.5))),
                 (x,y) -> x+y) / 6000.0) AS BIGINT)) AS f
           FROM v, (SELECT unnest(generate_series(0, 7)) AS tbl)),
         ctr AS (
           SELECT user_id, tbl, array_to_string(f, ',') AS sig FROM cells),
         spine(ax, dl) AS (
           VALUES (0,-1),(0,1),(1,-1),(1,1),(2,-1),(2,1),(3,-1),(3,1)),
         pr AS (
           SELECT user_id, tbl, sig FROM ctr
           UNION ALL
           SELECT user_id, tbl,
             array_to_string(list_transform(generate_series(0, 3), i ->
               CASE WHEN i = ax THEN f[i+1] + dl ELSE f[i+1] END), ',') AS sig
           FROM cells, spine),
         cand AS (
           SELECT DISTINCT a.user_id AS ka, b.user_id AS kb
           FROM pr a JOIN ctr b
           ON a.tbl = b.tbl AND a.sig = b.sig AND a.user_id <> b.user_id),
         dcand AS (
           SELECT c.ka, c.kb,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 4), i ->
                 (va.vec[i] - vb.vec[i]) * (va.vec[i] - vb.vec[i]))),
               (x,y) -> x+y) AS BIGINT) AS dist
           FROM cand c
           JOIN v va ON c.ka = va.user_id
           JOIN v vb ON c.kb = vb.user_id),
         lsh AS (
           SELECT ka, kb FROM (
             SELECT ka, kb,
               row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
             FROM dcand)
           WHERE rn2 <= 3),
         h AS (SELECT count(*) AS hits
               FROM ex JOIN lsh ON ex.ka = lsh.ka AND ex.kb = lsh.kb),
         t_ AS (SELECT count(*) AS possible FROM ex),
         nc AS (SELECT count(*) AS n_candidates FROM cand)
         SELECT 'paa_lsh' AS method, hits, possible, n_candidates,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM h, t_, nc""",
    "q99_iqr_approx_check" ->
      """WITH l AS (
           SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
         SELECT flag,
           CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
           CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3,
           CAST(1 AS BIGINT) AS ap_q1_ok,
           CAST(1 AS BIGINT) AS ap_q3_ok
         FROM l GROUP BY flag""",
    "q100_dup_excision" ->
      """WITH w AS (
           SELECT doc_id, text, n_chars,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars - 63, 1) AS BIGINT),
               CAST(32 AS BIGINT))) AS s
           FROM documents),
         fp AS (
           SELECT doc_id, s,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substring(text, CAST(s AS INT), 64), ''),
                 c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007) AS fp
           FROM w),
         own AS (SELECT fp, min(doc_id) AS owner FROM fp GROUP BY 1),
         dup AS (
           SELECT DISTINCT f.doc_id, f.s
           FROM fp f JOIN own o ON f.fp = o.fp
           WHERE o.owner < f.doc_id),
         isl AS (
           SELECT doc_id, s,
             CASE WHEN s > coalesce(lag(s) OVER (PARTITION BY doc_id ORDER BY s),
               CAST(-100 AS BIGINT)) + 63 THEN 1 ELSE 0 END AS brk
           FROM dup),
         grp AS (
           SELECT doc_id, s,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS g
           FROM isl),
         merged AS (
           SELECT doc_id, min(s) AS lo, max(s) + 63 AS hi
           FROM grp GROUP BY doc_id, g),
         segs AS (
           SELECT doc_id,
             coalesce(lag(hi) OVER (PARTITION BY doc_id ORDER BY lo),
               CAST(0 AS BIGINT)) + 1 AS klo,
             lo - 1 AS khi
           FROM merged
           UNION ALL
           SELECT doc_id, max(hi) + 1 AS klo, CAST(NULL AS BIGINT) AS khi
           FROM merged GROUP BY doc_id),
         kept AS (
           SELECT sg.doc_id,
             string_agg(
               CASE
                 WHEN sg.khi IS NULL THEN
                   CASE WHEN sg.klo <= d.n_chars
                     THEN substring(d.text, CAST(sg.klo AS INT),
                       CAST(d.n_chars - sg.klo + 1 AS INT))
                     ELSE '' END
                 WHEN sg.khi >= sg.klo THEN
                   substring(d.text, CAST(sg.klo AS INT),
                     CAST(sg.khi - sg.klo + 1 AS INT))
                 ELSE '' END, '' ORDER BY sg.klo) AS kept_text
           FROM segs sg JOIN documents d USING (doc_id)
           GROUP BY sg.doc_id),
         res AS (
           SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS orig_chars,
             coalesce(k.kept_text, d.text) AS kt
           FROM documents d LEFT JOIN kept k USING (doc_id))
         SELECT doc_id, orig_chars,
           CAST(length(kt) AS BIGINT) AS kept_chars,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(kt, ''),
               c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 131 + c) % 1000000007) AS kept_fp
         FROM res""",
    "q101_lang_rebalance" ->
      """WITH stats AS (
           SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
         m AS (SELECT min(n_total) AS m FROM stats),
         ratios AS (
           SELECT lang, CAST(n_total AS BIGINT) AS n_total,
             CAST((m * 1000000) // n_total AS BIGINT) AS keep_ppm
           FROM stats, m),
         kept AS (
           SELECT d.lang, count(*) AS n_kept
           FROM documents d JOIN ratios r ON d.lang = r.lang
           WHERE (((d.doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
                 * 2246822519 % 1000000007 % 1000000 < r.keep_ppm
           GROUP BY 1)
         SELECT r.lang, r.n_total, r.keep_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
         FROM ratios r LEFT JOIN kept k ON r.lang = k.lang""",
    "q102_vocab_coverage" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         cnt AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
         vocab AS (SELECT tok FROM cnt ORDER BY n DESC, tok ASC LIMIT 10),
         per_doc AS (
           SELECT t.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
           FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
           GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(floor(n_oov * 1000000.0 / n_tokens) AS BIGINT) AS oov_ppm
         FROM per_doc""",
    "q103_scd_intervals" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, ts_us, event_id, event_type FROM e
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type,
           CAST(ts_us AS BIGINT) AS valid_from_us,
           CAST(lead(ts_us) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) AS BIGINT) AS valid_to_us
         FROM ch""",
    "q104_quality_budget" ->
      """WITH sc AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         thr AS (
           SELECT lang, CAST(quantile_disc(quality, 0.75) AS BIGINT) AS thr
           FROM sc GROUP BY 1)
         SELECT s.lang, t.thr, count(*) AS n_kept,
           CAST(sum(s.n_tokens) AS BIGINT) AS tokens_kept
         FROM sc s JOIN thr t ON s.lang = t.lang
         WHERE s.quality >= t.thr
         GROUP BY 1, 2""",
    "q105_token_rarity" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         n AS (SELECT count(*) AS n_docs FROM documents),
         df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         idf AS (
           SELECT tok, CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf
           FROM df, n)
         SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(i.idf) AS BIGINT) AS sum_idf,
           CAST(floor(sum(i.idf) * 1000.0 / count(*)) AS BIGINT) AS rarity_milli
         FROM tok t JOIN idf i ON t.tok = i.tok
         GROUP BY 1""",
    "q106_vocab_drift" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, doc_id % 5 = 0 AS b,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         totals AS (
           SELECT CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_old
           FROM documents),
         df AS (
           SELECT tok,
             CAST(count(CASE WHEN NOT b THEN 1 END) AS BIGINT) AS df_old,
             CAST(count(CASE WHEN b THEN 1 END) AS BIGINT) AS df_new
           FROM tok GROUP BY 1)
         SELECT tok, df_old, df_new,
           CAST(floor(df_old * 1000000.0 / n_old) AS BIGINT) AS rate_old_ppm,
           CAST(floor(df_new * 1000000.0 / n_new) AS BIGINT) AS rate_new_ppm,
           CAST(floor(df_new * 1000000.0 / n_new)
             - floor(df_old * 1000000.0 / n_old) AS BIGINT) AS delta_ppm,
           CAST(CASE WHEN df_old = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_new_token
         FROM df, totals""",
    "q107_split_leakage" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         tagged AS (
           SELECT
             CASE WHEN (((id1 % 1000000007 + 1) * 2654435761) % 1000000007)
                       * 2246822519 % 1000000007 % 10 < 8
                  THEN 'train' ELSE 'test' END AS t1,
             CASE WHEN (((id2 % 1000000007 + 1) * 2654435761) % 1000000007)
                       * 2246822519 % 1000000007 % 10 < 8
                  THEN 'train' ELSE 'test' END AS t2
           FROM pairs)
         SELECT least(t1, t2) AS split_a, greatest(t1, t2) AS split_b,
           count(*) AS n_pairs,
           CAST(CASE WHEN least(t1, t2) <> greatest(t1, t2) THEN 1 ELSE 0 END
             AS BIGINT) AS is_leak
         FROM tagged GROUP BY 1, 2""",
    "q108_source_diversity" ->
      """WITH tk AS (
           SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         tg AS (
           SELECT source, unnest(list_transform(generate_series(1, len(toks)-2),
             i -> array_to_string(toks[i:i+2], ' '))) AS tg
           FROM tk WHERE len(toks) >= 3),
         cnt AS (SELECT source, tg, count(*) AS occ FROM tg GROUP BY 1, 2),
         agg AS (
           SELECT source, CAST(sum(occ) AS BIGINT) AS n_trigrams,
             CAST(count(*) AS BIGINT) AS n_distinct
           FROM cnt GROUP BY 1)
         SELECT source, n_trigrams, n_distinct,
           CAST(floor(n_distinct * 1000000.0 / n_trigrams) AS BIGINT)
             AS diversity_ppm,
           CAST(CASE WHEN floor(n_distinct * 1000000.0 / n_trigrams) < 450000
             THEN 1 ELSE 0 END AS BIGINT) AS is_template
         FROM agg""",
    "q109_source_divergence" ->
      """WITH tok AS (
           SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS obs
           FROM tok GROUP BY 1, 2),
         corpus AS (SELECT tok, CAST(sum(obs) AS BIGINT) AS c_t FROM st GROUP BY 1),
         totals AS (SELECT source, CAST(sum(obs) AS BIGINT) AS s_total
           FROM st GROUP BY 1),
         grand AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_total FROM corpus),
         j AS (
           SELECT s.source, t.s_total, g.t_total,
             sum(abs(CAST(s.obs AS HUGEINT) * CAST(g.t_total AS HUGEINT)
               - CAST(c.c_t AS HUGEINT) * CAST(t.s_total AS HUGEINT))) AS present_num,
             sum(CAST(c.c_t AS HUGEINT) * CAST(t.s_total AS HUGEINT)) AS present_ct
           FROM st s
           JOIN corpus c ON s.tok = c.tok
           JOIN totals t ON s.source = t.source
           CROSS JOIN grand g
           GROUP BY 1, 2, 3)
         SELECT source, s_total,
           CAST(((present_num + (CAST(t_total AS HUGEINT) * CAST(s_total AS HUGEINT)
               - present_ct)) * 1000000)
             // (CAST(2 AS HUGEINT) * CAST(s_total AS HUGEINT)
               * CAST(t_total AS HUGEINT)) AS BIGINT) AS tvd_ppm
         FROM j""",
    // The oracle replays the two-level SimHash SEMANTICS, not the
    // banding plan: the packed-64-bit Hamming distance equals the sum
    // of the two 32-bit halves' distances, so no 64-bit packing (which
    // would overflow DuckDB's BIGINT at bit 63) is needed.
    "q110_simhash64_pairs" ->
      """WITH th AS (
           SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007)) AS hs
           FROM documents
           WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 2),
         uni AS (SELECT doc_id, unnest(hs) AS h FROM th),
         big AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(hs)-1), i ->
             (hs[i] * 131 + hs[i+1]) % 1000000007)) AS h FROM th),
         simlo AS (
           SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh
           FROM (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM uni, (SELECT unnest(generate_series(0, 31)) AS j) AS js(j)
                 GROUP BY doc_id, j) bs
           GROUP BY doc_id),
         simhi AS (
           SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh
           FROM (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM big, (SELECT unnest(generate_series(0, 31)) AS j) AS js(j)
                 GROUP BY doc_id, j) bs
           GROUP BY doc_id),
         sig AS (SELECT l.doc_id, l.sh AS lo, h.sh AS hi
           FROM simlo l JOIN simhi h USING (doc_id))
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.lo,b.lo)) + bit_count(xor(a.hi,b.hi)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.lo,b.lo)) + bit_count(xor(a.hi,b.hi)) <= 3""",
    "q111_calibration_buckets" ->
      """WITH sc AS (
           SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         b AS (
           SELECT CAST(quantile_disc(quality, 0.1) AS BIGINT) AS b1,
                  CAST(quantile_disc(quality, 0.2) AS BIGINT) AS b2,
                  CAST(quantile_disc(quality, 0.3) AS BIGINT) AS b3,
                  CAST(quantile_disc(quality, 0.4) AS BIGINT) AS b4,
                  CAST(quantile_disc(quality, 0.5) AS BIGINT) AS b5,
                  CAST(quantile_disc(quality, 0.6) AS BIGINT) AS b6,
                  CAST(quantile_disc(quality, 0.7) AS BIGINT) AS b7,
                  CAST(quantile_disc(quality, 0.8) AS BIGINT) AS b8,
                  CAST(quantile_disc(quality, 0.9) AS BIGINT) AS b9
           FROM sc),
         thr AS (
           SELECT lang, CAST(quantile_disc(quality, 0.75) AS BIGINT) AS thr
           FROM sc GROUP BY 1),
         x AS (
           SELECT s.source,
             (CASE WHEN quality > b1 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b2 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b3 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b4 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b5 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b6 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b7 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b8 THEN 1 ELSE 0 END) +
             (CASE WHEN quality > b9 THEN 1 ELSE 0 END) AS bin,
             CASE WHEN s.quality >= t.thr THEN 1 ELSE 0 END AS adm,
             s.n_tokens
           FROM sc s JOIN thr t USING (lang) CROSS JOIN b)
         SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(floor(sum(adm) * 1000.0 / count(*)) AS BIGINT) AS admit_permille,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total
         FROM x GROUP BY 1, 2""",
    "q112_snapshot_drift" ->
      """WITH a AS (
           SELECT text, arg_min(source, doc_id) AS src, arg_min(n_chars, doc_id) AS ch
           FROM documents WHERE doc_id % 3 < 2 GROUP BY text),
         b AS (
           SELECT text, arg_min(source, doc_id) AS src, arg_min(n_chars, doc_id) AS ch
           FROM documents WHERE doc_id % 3 > 0 GROUP BY text),
         j AS (
           SELECT CASE WHEN a.text IS NOT NULL AND b.text IS NOT NULL THEN 'retained'
                       WHEN a.text IS NOT NULL THEN 'removed'
                       ELSE 'added' END AS status,
             coalesce(a.src, b.src) AS source,
             coalesce(a.ch, b.ch) AS n_chars
           FROM a FULL OUTER JOIN b ON a.text = b.text)
         SELECT status, source, count(*) AS n_texts,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
         FROM j GROUP BY 1, 2""",
    "q113_retrieval_capped" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1])) AS ph
           FROM tk WHERE len(toks) >= 2),
         ct AS (SELECT doc_id, ph FROM bg WHERE doc_id % 25 <> 0),
         dfc AS (
           SELECT ph, CAST(1000000 // count(*) AS BIGINT) AS w
           FROM ct GROUP BY ph HAVING count(*) <= 30),
         qt AS (SELECT doc_id AS query_id, ph FROM bg WHERE doc_id % 25 = 0),
         sc AS (
           SELECT q.query_id, c.doc_id, CAST(sum(d.w) AS BIGINT) AS score
           FROM qt q
           JOIN dfc d ON q.ph = d.ph
           JOIN ct c ON q.ph = c.ph
           GROUP BY 1, 2)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score FROM (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rn
           FROM sc) WHERE rn <= 3""",
    "q114_weighted_admission" ->
      """WITH sc AS (
           SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         adm AS (
           SELECT source, lang, n_tokens,
             CASE WHEN (doc_id * 2654435761 + 12345) % 1000003 % 1000 < quality
               THEN 1 ELSE 0 END AS adm
           FROM sc)
         SELECT source, lang, count(*) AS n_in,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(sum(CASE WHEN adm = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_admitted
         FROM adm GROUP BY 1, 2""",
    "q115_lead_survivors" ->
      """WITH sc AS (
           SELECT doc_id, source,
             array_to_string(regexp_split_to_array(trim(text), '\s+')[1:6], ' ')
               AS pfx,
             CAST(least(len(regexp_split_to_array(trim(text), '\s+')), 100) * 5
               + floor(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the','a','an','of','and','is','in','to','it','that')))
                 * 500.0 / len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS quality
           FROM documents),
         prio AS (
           SELECT source,
             CAST(floor(sum(quality) * 1000.0 / count(*)) AS BIGINT) AS prio
           FROM sc GROUP BY 1)
         SELECT
           arg_max(s.doc_id, p.prio * 1000000000 - s.doc_id) AS doc_id,
           arg_max(s.source, p.prio * 1000000000 - s.doc_id) AS source,
           count(*) AS n_copies
         FROM sc s JOIN prio p USING (source)
         GROUP BY s.pfx""",
    "q116_incr_near_dedup" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS bid, c.doc_id AS cid
           FROM bands a JOIN bands c ON a.b = c.b AND a.bh = c.bh
           WHERE a.doc_id % 7 = 0 AND c.doc_id % 7 <> 0),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS bid, c.doc_id AS cid, a.n AS na, c.n AS nc,
             count(*) AS cnt
           FROM ex a JOIN ex c ON a.s = c.s
           JOIN cand ON cand.bid = a.doc_id AND cand.cid = c.doc_id
           GROUP BY 1, 2, 3, 4),
         hits AS (
           SELECT DISTINCT bid FROM common
           WHERE floor(cnt * 1000000.0 / (na + nc - cnt)) >= 500000)
         SELECT d.doc_id, d.source, d.n_chars FROM documents d
         WHERE d.doc_id % 7 = 0
           AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.bid = d.doc_id)""",
    "q117_packing_efficiency" ->
      """WITH tk AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         a AS (
           SELECT source, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM tk),
         b AS (
           SELECT source, n_tokens,
             CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
             CAST(floor((tok_before + n_tokens - 1) / 512.0) AS BIGINT) AS end_pack
           FROM a)
         SELECT source, count(*) AS n_docs,
           CAST(max(end_pack) + 1 AS BIGINT) AS n_packs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN end_pack <> pack_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddling,
           CAST(floor(sum(CASE WHEN end_pack <> pack_id THEN 1 ELSE 0 END)
             * 1000.0 / count(*)) AS BIGINT) AS straddle_permille,
           CAST((max(end_pack) + 1) * 512 - sum(n_tokens) AS BIGINT) AS tail_waste
         FROM b GROUP BY source""",
    "q118_cluster_sizes" ->
      """WITH RECURSIVE tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
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
           FROM documents d LEFT JOIN mins m ON d.doc_id = m.a),
         sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM cl GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         FROM sz GROUP BY cluster_size""",
    "q119_eval_contamination" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         shg AS (
           SELECT doc_id,
             CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(generate_series(1, len(toks)-3),
                         i -> array_to_string(toks[i:i+3], ' '))
             END AS shingles
           FROM tk),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(shingles, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS sh
           FROM shg),
         b AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id % 25 = 0),
         tr AS (SELECT doc_id AS tid, unnest(sh) AS s FROM shh WHERE doc_id % 25 <> 0)
         SELECT b.doc_id,
           CAST(count(DISTINCT tr.tid) AS BIGINT) AS n_train_docs,
           CAST(count(DISTINCT b.s) AS BIGINT) AS n_shared_ngrams
         FROM b JOIN tr ON b.s = tr.s
         GROUP BY b.doc_id""",
    "q120_temperature_sampling" ->
      """WITH d AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
           FROM documents),
         c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM d GROUP BY 1),
         g AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_total FROM c),
         w AS (
           SELECT lang, n_l, n_total,
             CAST(floor(sqrt(CAST(n_l AS DOUBLE) * 1000000.0)) AS BIGINT) AS w_l
           FROM c, g),
         sw AS (SELECT CAST(sum(w_l) AS BIGINT) AS sum_w FROM w),
         rho AS (
           SELECT lang, n_l,
             CAST((CAST(w_l AS HUGEINT) * CAST(n_total AS HUGEINT) * 1000000)
               // (CAST(sum_w AS HUGEINT) * CAST(n_l AS HUGEINT)) AS BIGINT) AS rho
           FROM w, sw),
         m AS (SELECT max(rho) AS mx FROM rho),
         rates AS (
           SELECT lang,
             CAST((CAST(rho AS HUGEINT) * 1000000) // CAST(mx AS HUGEINT)
               AS BIGINT) AS rate_micro
           FROM rho, m),
         x AS (
           SELECT d.lang, r.rate_micro, d.n_tokens,
             CASE WHEN ((d.doc_id * 2654435761 + 12345) % 1000003) * 1000000
                  < r.rate_micro * 1000003 THEN 1 ELSE 0 END AS adm
           FROM d JOIN rates r USING (lang))
         SELECT lang, rate_micro, count(*) AS n_in,
           CAST(sum(adm) AS BIGINT) AS n_admitted,
           CAST(sum(CASE WHEN adm = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_admitted
         FROM x GROUP BY 1, 2""",
    "q121_capped_lsh" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         bw AS (SELECT b, bh, count(*) AS w FROM bands GROUP BY b, bh),
         kept AS (
           SELECT bands.doc_id, bands.b, bands.bh
           FROM bands JOIN bw USING (b, bh) WHERE w <= 2),
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
           FROM kept a JOIN kept b2
             ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
         ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shh),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb, count(*) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         jac AS (
           SELECT id1, id2,
             CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jac_micro
           FROM common
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000)
         SELECT j.id1, j.id2, j.jac_micro
         FROM jac j JOIN cand USING (id1, id2)""",
    "q122_lsh_bucket_audit" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh),
         bands AS (
           SELECT doc_id, b,
             list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*3+1 : b*3+3]),
               (h, v) -> (h * 131 + v) % 1000000007) AS bh
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
         bw AS (SELECT b, bh, count(*) AS w FROM bands GROUP BY b, bh)
         SELECT CAST(b AS BIGINT) AS band,
           count(*) AS n_buckets,
           CAST(max(w) AS BIGINT) AS max_width,
           CAST(sum(CASE WHEN w > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN w > 2 THEN w ELSE 0 END) AS BIGINT) AS rows_dropped
         FROM bw GROUP BY b""",
    "q123_capped_simhash" ->
      """WITH th AS (
           SELECT doc_id, unnest(list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007))) AS h
           FROM documents),
         bitsum AS (
           SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM th, (SELECT unnest(generate_series(0, 31)) AS j)
           GROUP BY doc_id, j),
         simh AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
           FROM bitsum GROUP BY doc_id),
         keyed AS (
           SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS bk
           FROM simh, (SELECT unnest(generate_series(0, 3)) AS b)),
         bw AS (SELECT b, bk, count(*) AS w FROM keyed GROUP BY 1, 2),
         kept AS (SELECT keyed.* FROM keyed JOIN bw USING (b, bk) WHERE w <= 8),
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2,
             a.simhash AS sa, b2.simhash AS sb
           FROM kept a JOIN kept b2
             ON a.b = b2.b AND a.bk = b2.bk AND a.doc_id < b2.doc_id)
         SELECT id1, id2, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 2""",
    "q124_bigram_lm" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2),
         m AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY bigram),
         m1 AS (SELECT split_part(bigram, ' ', 1) AS w1, bigram, c12 FROM m),
         c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM m1 GROUP BY w1),
         v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
               FROM (SELECT unnest(toks) AS tok FROM tk)),
         p AS (
           SELECT m1.bigram,
             CAST(((c12 + 1) * 1000000) // (c1.c1 + v.v) AS BIGINT) AS p_ppm
           FROM m1 JOIN c1 USING (w1) CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(p_ppm) // count(*) AS BIGINT) AS lm_ppm
         FROM bg JOIN p USING (bigram)
         GROUP BY doc_id""",
    "q125_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding AS qe, label AS q_label
           FROM embeddings
           ORDER BY (vec_id * 2654435761 + 12345) % 1000003, vec_id
           LIMIT 256),
         it AS (
           SELECT vec_id AS i_id, embedding AS ie, label AS i_label
           FROM embeddings),
         s AS (
           SELECT query_id, q_label, i_id, i_label,
             CAST(floor(1000000.0 * (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END)) AS BIGINT) AS cos_micro
           FROM (
             SELECT query_id, q_label, i_id, i_label,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM q CROSS JOIN it WHERE i_label <> q_label))
         SELECT query_id, q_label, i_id AS neighbor_id,
           i_label AS neighbor_label, cos_micro
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_micro DESC, i_id ASC) AS rn FROM s)
         WHERE rn = 1""",
    "q126_label_purity" ->
      """WITH a AS (
           SELECT vec_id AS a_id, embedding AS ae, label AS a_label
           FROM embeddings
           ORDER BY (vec_id * 2654435761 + 12345) % 1000003, vec_id
           LIMIT 128),
         it AS (
           SELECT vec_id AS i_id, embedding AS ie, label AS i_label
           FROM embeddings),
         s AS (
           SELECT a_id, a_label, i_id, i_label,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT a_id, a_label, i_id, i_label,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ae)),
                   i -> CAST(ae[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ae)),
                   i -> CAST(ae[i] AS DOUBLE) * CAST(ae[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM a CROSS JOIN it WHERE i_id <> a_id)),
         r AS (SELECT *, row_number() OVER (PARTITION BY a_id
                 ORDER BY dist, i_id) AS rn FROM s)
         SELECT a_id AS vec_id, a_label AS label,
           count(*) AS n_neighbors,
           CAST(sum(CASE WHEN i_label = a_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_match,
           CAST((sum(CASE WHEN i_label = a_label THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS purity_ppm
         FROM r WHERE rn <= 5
         GROUP BY a_id, a_label""",
    "q127_semdedup" -> semdedupSql(None),
    "q153_capped_semdedup" -> semdedupSql(Some(65)),
    "q154_semdedup_widths" ->
      s"""WITH $semdedupLloydCte
         SELECT CAST(cid AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS width,
           CAST(CASE WHEN count(*) > 65 THEN 1 ELSE 0 END AS BIGINT)
             AS dropped
         FROM a2 GROUP BY cid""",
    "q128_dup_ngrams" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         gr AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 3),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
               || toks[i+3])) AS g
           FROM tk WHERE len(toks) >= 4),
         d AS (SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)
         SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST((sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS dup_ppm
         FROM gr JOIN d USING (g)
         GROUP BY doc_id""",
    "q129_bpe_merges" ->
      """WITH tk AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         wd AS (SELECT unnest(toks) AS w FROM tk),
         wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM wd GROUP BY w),
         p AS (
           SELECT unnest(list_transform(generate_series(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1])) AS pair, freq
           FROM wf WHERE len(w) >= 2)
         SELECT pair, CAST(sum(freq) AS BIGINT) AS weight
         FROM p GROUP BY pair
         ORDER BY weight DESC, pair ASC
         LIMIT 20""",
    "q130_cms_check" ->
      """WITH tk AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         w AS (SELECT unnest(toks) AS tok FROM tk)
         SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt,
           CAST(1 AS BIGINT) AS no_underestimate,
           CAST(1 AS BIGINT) AS within_eps
         FROM w GROUP BY tok
         ORDER BY exact_cnt DESC, tok ASC
         LIMIT 20""",
    "q131_soft_dedup" ->
      """WITH RECURSIVE tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         shg AS (
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
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
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
           FROM documents d LEFT JOIN mins m ON d.doc_id = m.a),
         sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM cl GROUP BY cluster_id)
         SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
           CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
         FROM cl JOIN sz USING (cluster_id)""")
}
