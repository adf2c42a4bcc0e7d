package graft
package queries

/** DuckDB-dialect oracle SQL, queries q54–q93. Split out of the former
  * monolithic `Queries` object — pure move, no semantic change.
  */
private[graft] trait OracleSqlB extends OracleShared {

  protected val oracleSqlB: Map[String, String] = Map(
    "q54_knn_blocked" -> knnPredictOracle,
    "q55_repetition" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         base AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct
           FROM tk),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2),
         bgc AS (
           SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
         bgs AS (
           SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgc GROUP BY doc_id),
         j AS (
           SELECT b.doc_id, b.n_tokens,
             CAST(floor((b.n_tokens - b.n_distinct) * 1000000.0 / b.n_tokens) AS BIGINT)
               AS dup_token_frac_micro,
             CAST(coalesce(floor(s.top_bg * 1000000.0 / s.n_bg), 0) AS BIGINT)
               AS top_bigram_frac_micro
           FROM base b LEFT JOIN bgs s USING (doc_id))
         SELECT doc_id, n_tokens, dup_token_frac_micro, top_bigram_frac_micro,
           CAST(CASE WHEN dup_token_frac_micro > 300000
                       OR top_bigram_frac_micro > 180000
                     THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         FROM j""",
    "q56_decontam" -> decontamOracle,
    "q58_bloom_decontam" -> decontamOracle,
    "q57_salted_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_value
         FROM lineitem GROUP BY l_returnflag""",
    "q59_pack_sequences" ->
      """WITH tk AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         a AS (
           SELECT source, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM tk)
         SELECT source, CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM a GROUP BY source, pack_id""",
    "q60_json_extract" ->
      """SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY event_type, k_bucket""",
    "q61_chunking" ->
      """WITH s AS (
           SELECT doc_id, text,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars, 1) AS BIGINT), CAST(384 AS BIGINT))) AS gs
           FROM documents)
         SELECT doc_id,
           CAST((gs - 1) // 384 AS BIGINT) AS chunk_idx,
           CAST(gs AS BIGINT) AS chunk_start,
           substring(text, CAST(gs AS INT), 512) AS chunk,
           CAST(length(substring(text, CAST(gs AS INT), 512)) AS BIGINT) AS chunk_chars
         FROM s""",
    "q62_quant_ann" ->
      """WITH mxs AS (
           SELECT max(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))))) AS mx
           FROM embeddings),
         q AS (
           SELECT vec_id AS qid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS qa
           FROM embeddings, mxs WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS ia
           FROM embeddings, mxs WHERE vec_id % 10 <> 0),
         scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(qa)),
                 i -> (qa[i] - ia[i]) * (qa[i] - ia[i]))), (a, b) -> a + b) AS qdist
           FROM q CROSS JOIN it)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id, qdist
         FROM (SELECT qid, iid, qdist,
                 row_number() OVER (PARTITION BY qid ORDER BY qdist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q63_quant_recall" ->
      """WITH mxs AS (
           SELECT max(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))))) AS mx
           FROM embeddings),
         q AS (
           SELECT vec_id AS qid, embedding AS qe,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS qa
           FROM embeddings, mxs WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS ia
           FROM embeddings, mxs WHERE vec_id % 10 <> 0),
         e_scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(qe)),
                 i -> (CAST(qe[i] AS DOUBLE) - CAST(ie[i] AS DOUBLE)) *
                      (CAST(qe[i] AS DOUBLE) - CAST(ie[i] AS DOUBLE)))),
               (x, y) -> x + y) AS dist
           FROM q CROSS JOIN it),
         exact AS (
           SELECT qid, iid FROM (
             SELECT qid, iid,
               row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
             FROM e_scored) WHERE rn <= 5),
         q_scored AS (
           SELECT qid, iid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(qa)),
                 i -> (qa[i] - ia[i]) * (qa[i] - ia[i]))), (a, b) -> a + b) AS qdist
           FROM q CROSS JOIN it),
         quant AS (
           SELECT qid, iid FROM (
             SELECT qid, iid,
               row_number() OVER (PARTITION BY qid ORDER BY qdist, iid) AS rn
             FROM q_scored) WHERE rn <= 5),
         hitrow AS (
           SELECT count(*) AS hits FROM exact e JOIN quant a USING (qid, iid)),
         tot AS (SELECT count(*) AS possible FROM exact)
         SELECT 'int8' AS method, hits, possible,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM hitrow, tot""",
    "q64_chunk_dedup" ->
      """WITH c AS (
           SELECT doc_id,
             CAST((gs - 1) // 256 AS BIGINT) AS chunk_idx,
             substring(text, CAST(gs AS INT), 256) AS chunk
           FROM (
             SELECT doc_id, text,
               unnest(generate_series(CAST(1 AS BIGINT),
                 CAST(greatest(n_chars, 1) AS BIGINT), CAST(256 AS BIGINT))) AS gs
             FROM documents)),
         f AS (
           SELECT chunk, min({'d': doc_id, 'c': chunk_idx}) AS m
           FROM c GROUP BY chunk),
         k AS (
           SELECT CAST(m.d AS BIGINT) AS doc_id,
             count(*) AS n_kept
           FROM f GROUP BY 1)
         SELECT d.doc_id,
           CAST((greatest(n_chars, 1) - 1) // 256 + 1 AS BIGINT) AS n_chunks,
           COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
         FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id""",
    "q65_zorder" ->
      """WITH base AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_partkey & 65535 AS a, l_suppkey & 65535 AS b
           FROM lineitem),
         s1 AS (SELECT l_orderkey, l_linenumber,
                  (a | (a << 8)) & 16711935 AS a1,
                  (b | (b << 8)) & 16711935 AS b1 FROM base),
         s2 AS (SELECT l_orderkey, l_linenumber,
                  (a1 | (a1 << 4)) & 252645135 AS a2,
                  (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
         s3 AS (SELECT l_orderkey, l_linenumber,
                  (a2 | (a2 << 2)) & 858993459 AS a3,
                  (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
         s4 AS (SELECT l_orderkey, l_linenumber,
                  (a3 | (a3 << 1)) & 1431655765 AS a4,
                  (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
         SELECT l_orderkey, l_linenumber, a4 | (b4 << 1) AS zval
         FROM s4
         ORDER BY zval, l_orderkey, l_linenumber
         LIMIT 100""",
    "q66_source_mix" ->
      """SELECT source, count(*) AS n_total,
           CAST(sum(CASE WHEN
             (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(floor(CAST(sum(CASE WHEN
             (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)
             THEN 1 ELSE 0 END) AS BIGINT) * 1000000.0 / count(*)) AS BIGINT)
             AS kept_ppm
         FROM documents GROUP BY source""",
    "q67_redact" ->
      """SELECT event_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(props,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<X>', 'g'),
               'https?://[^\s]+', '<X>', 'g'),
             '[0-9]+', '<X>', 'g') AS clean,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_digit_runs
         FROM events""",
    "q68_histogram" ->
      """WITH c AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
         SELECT CAST(cents // 50000 AS BIGINT) AS bin,
           count(*) AS n,
           min(cents) AS min_cents,
           max(cents) AS max_cents
         FROM c GROUP BY 1""",
    "q69_freq_items" ->
      """WITH t AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents),
         e AS (SELECT token, count(*) AS exact_n FROM t GROUP BY token)
         SELECT token, exact_n, exact_n AS est_n
         FROM e ORDER BY exact_n DESC, token LIMIT 10""",
    "q70_pipeline" ->
      """WITH tk AS (
           SELECT doc_id, source, text,
             regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, source, text, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
           FROM tk),
         adm AS (
           SELECT doc_id, source, text, n_tokens FROM (
             SELECT doc_id, source, text, n_tokens,
               CASE
                 WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                 WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
                 WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
                 WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
                 ELSE 'fr'
               END AS lang_guess,
               least(n_tokens, 100) * 5
                 + CAST(floor(stop_cnt * 500.0 / n_tokens) AS BIGINT) AS quality,
               bpe_tokens
             FROM c)
           WHERE lang_guess = 'en' AND quality >= 300
             AND bpe_tokens BETWEEN 10 AND 2000),
         surv AS (
           SELECT a.doc_id, a.source, a.n_tokens
           FROM adm a
           JOIN (SELECT text, min(doc_id) AS keep_id FROM adm GROUP BY text) g
             ON a.doc_id = g.keep_id),
         mixed AS (
           SELECT doc_id, source, n_tokens FROM surv
           WHERE (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007)
               * 2246822519 % 1000000007 % 1000000 <
             (CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 250000
                          WHEN 'src3' THEN 0
                          ELSE 750000 END)),
         a AS (
           SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
           FROM mixed)
         SELECT source, CAST(floor(tok_before / 512.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM a GROUP BY source, pack_id""",
    "q71_sliding_window" ->
      """WITH e AS (
           SELECT event_id, user_id,
             epoch_us(ts) AS epoch_us,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
         SELECT event_id, user_id, epoch_us, cents,
           CAST(sum(cents) OVER w AS BIGINT) AS hour_cents,
           CAST(count(*) OVER w AS BIGINT) AS hour_events
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "q72_profile" ->
      """SELECT 'event_id' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
         UNION ALL
         SELECT 'user_id', count(*),
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         UNION ALL
         SELECT 'event_type', count(*),
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT) FROM events
         UNION ALL
         SELECT 'value', count(*),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT) FROM events
         UNION ALL
         SELECT 'props', count(*),
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT props) AS BIGINT) FROM events""",
    "q73_sql_exists" ->
      """SELECT n_nationkey, n_name,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 150000.0)) AS big_spenders,
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey)) AS no_orders
         FROM nation n""",
    "q74_ntile" ->
      """WITH c AS (
           SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         d AS (
           SELECT cents,
             CAST(ntile(10) OVER (ORDER BY cents, c_custkey) AS BIGINT) AS decile
           FROM c)
         SELECT decile, count(*) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
         FROM d GROUP BY decile""",
    "q75_monthly" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
         FROM orders GROUP BY 1, 2""",
    "q76_ship_lag" ->
      """WITH j AS (
           SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS lag_days
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
         SELECT o_orderpriority, count(*) AS n,
           CAST(sum(lag_days) AS BIGINT) AS sum_lag_days,
           CAST(min(lag_days) AS BIGINT) AS min_lag_days,
           CAST(max(lag_days) AS BIGINT) AS max_lag_days
         FROM j GROUP BY o_orderpriority""",
    "q77_minhash_est" ->
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
         pairs AS (
           SELECT id1, id2,
             CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS exact_micro
           FROM (
             SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS na, b.n AS nb,
               count(*) AS c
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000),
         sig AS (
           SELECT doc_id, list_transform(generate_series(0, 23), i ->
             list_min(list_transform(sh, s -> ((2*i+1)*s + i*1000003) % 1000000007))) AS sig
           FROM shh)
         SELECT p.id1, p.id2, p.exact_micro,
           CAST(floor(len(list_filter(generate_series(1, 24),
             i -> s1.sig[i] = s2.sig[i])) * 1000000.0 / 24) AS BIGINT) AS est_micro
         FROM pairs p
         JOIN sig s1 ON p.id1 = s1.doc_id
         JOIN sig s2 ON p.id2 = s2.doc_id""",
    "q78_mean_pool" ->
      """WITH s AS (
           SELECT label, embedding,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(len(embedding) AS BIGINT), CAST(1 AS BIGINT))) AS i
           FROM embeddings),
         m AS (
           SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
             CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0)
               AS BIGINT) AS micro
           FROM s)
         SELECT label, pos, count(*) AS n,
           CAST(sum(micro) AS BIGINT) AS sum_micro,
           CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_micro
         FROM m GROUP BY label, pos""",
    "q79_retrieval" ->
      """WITH ct AS (
           SELECT doc_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
           FROM documents WHERE doc_id % 25 <> 0),
         dfreq AS (SELECT tok, count(*) AS df FROM ct GROUP BY tok),
         qt AS (
           SELECT doc_id AS query_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
           FROM documents WHERE doc_id % 25 = 0),
         sc AS (
           SELECT q.query_id, c.doc_id,
             CAST(sum(1000000 // d.df) AS BIGINT) AS score
           FROM qt q
           JOIN ct c ON q.tok = c.tok
           JOIN dfreq d ON c.tok = d.tok
           GROUP BY 1, 2)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score FROM (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rn
           FROM sc) WHERE rn <= 3""",
    "q80_substring_dups" ->
      """WITH w AS (
           SELECT doc_id, text,
             unnest(generate_series(CAST(1 AS BIGINT),
               CAST(greatest(n_chars - 63, 1) AS BIGINT), CAST(32 AS BIGINT))) AS gs
           FROM documents),
         fp AS (
           SELECT DISTINCT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substring(text, CAST(gs AS INT), 64), ''),
                 c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007) AS fp
           FROM w)
         SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared_windows
         FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    "q81_corr_sums" ->
      """WITH m AS (
           SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
           FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
         FROM m GROUP BY l_returnflag""",
    "q82_series_sim" ->
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
         d AS (
           SELECT a.user_id AS ka, b.user_id AS kb,
             CAST(sum((a.seg_sum - b.seg_sum) * (a.seg_sum - b.seg_sum))
               AS BIGINT) AS dist
           FROM pf a JOIN pf b ON a.seg = b.seg AND a.user_id <> b.user_id
           GROUP BY 1, 2)
         SELECT ka AS user_id, CAST(rn2 AS BIGINT) AS rank, kb AS other, dist
         FROM (
           SELECT ka, kb, dist,
             row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn2
           FROM d)
         WHERE rn2 <= 3""",
    "q83_value_deciles" ->
      """WITH c AS (
           SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
         b AS (
           SELECT
             CAST(quantile_disc(cents, 0.1) AS BIGINT) AS b1,
             CAST(quantile_disc(cents, 0.2) AS BIGINT) AS b2,
             CAST(quantile_disc(cents, 0.3) AS BIGINT) AS b3,
             CAST(quantile_disc(cents, 0.4) AS BIGINT) AS b4,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS b5,
             CAST(quantile_disc(cents, 0.6) AS BIGINT) AS b6,
             CAST(quantile_disc(cents, 0.7) AS BIGINT) AS b7,
             CAST(quantile_disc(cents, 0.8) AS BIGINT) AS b8,
             CAST(quantile_disc(cents, 0.9) AS BIGINT) AS b9
           FROM c),
         x AS (
           SELECT cents,
             (CASE WHEN cents > b1 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b2 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b3 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b4 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b5 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b6 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b7 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b8 THEN 1 ELSE 0 END) +
             (CASE WHEN cents > b9 THEN 1 ELSE 0 END) AS bin
           FROM c, b)
         SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
         FROM x GROUP BY 1""",
    "q84_bag_set_ops" ->
      """WITH a AS (SELECT o_custkey AS custkey FROM orders),
         h AS (SELECT o_custkey AS custkey FROM orders
               WHERE o_totalprice > 200000.0),
         ea AS (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM h),
         ia AS (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM h)
         SELECT 'except_all' AS tag, custkey, count(*) AS n
         FROM ea GROUP BY custkey
         UNION ALL
         SELECT 'intersect_all', custkey, count(*) FROM ia GROUP BY custkey""",
    "q85_incr_dedup" ->
      """WITH inc AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         ex AS (SELECT text FROM documents WHERE doc_id % 5 <> 0),
         surv AS (
           SELECT i.* FROM inc i
           JOIN (SELECT text, min(doc_id) AS keep_id FROM inc GROUP BY text) g
             ON i.doc_id = g.keep_id)
         SELECT s.doc_id, s.source, s.n_chars
         FROM surv s
         WHERE NOT EXISTS (SELECT 1 FROM ex e WHERE e.text = s.text)""",
    "q86_gap_fill" ->
      """WITH RECURSIVE o AS (
           SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         m AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey, mi,
             count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS rev_cents
           FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         months(mi) AS (
           SELECT (SELECT min(mi) FROM o)
           UNION ALL
           SELECT mi + 1 FROM months WHERE mi < (SELECT max(mi) FROM o)),
         grid AS (SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
                    CAST(mi AS BIGINT) AS mi
                  FROM nation, months)
         SELECT g.nationkey, g.mi,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.rev_cents, 0) AS rev_cents
         FROM grid g LEFT JOIN m ON g.nationkey = m.nationkey AND g.mi = m.mi""",
    "q87_funnel" ->
      """WITH f AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_purchase_us
           FROM events GROUP BY user_id)
         SELECT user_id, first_view_us, first_purchase_us,
           CAST(CASE WHEN first_view_us IS NOT NULL
                  AND first_purchase_us IS NOT NULL
                  AND first_view_us < first_purchase_us
                THEN 1 ELSE 0 END AS BIGINT) AS converted
         FROM f""",
    "q88_unpivot" ->
      """WITH l AS (
           SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS quantity,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS extendedprice,
             CAST(round(l_discount * 100) AS BIGINT) AS discount,
             CAST(round(l_tax * 100) AS BIGINT) AS tax
           FROM lineitem),
         u AS (
           SELECT l_returnflag, 'quantity' AS measure, quantity AS cents FROM l
           UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM l
           UNION ALL SELECT l_returnflag, 'discount', discount FROM l
           UNION ALL SELECT l_returnflag, 'tax', tax FROM l)
         SELECT l_returnflag, measure, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM u GROUP BY 1, 2""",
    "q89_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2""",
    "q90_iqr_outliers" ->
      """WITH l AS (
           SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
         b AS (
           SELECT flag,
             CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
             CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3
           FROM l GROUP BY flag),
         f AS (
           SELECT flag, q1 - (q3 - q1) * 3 // 2 AS lo,
             q3 + (q3 - q1) * 3 // 2 AS hi
           FROM b)
         SELECT l.flag, count(*) AS n,
           CAST(sum(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           min(lo) AS lo_cents, max(hi) AS hi_cents
         FROM l JOIN f ON l.flag = f.flag
         GROUP BY l.flag""",
    "q91_latest_record" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn = 1""",
    "q92_cohort_retention" ->
      """WITH e AS (
           SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS di
           FROM events),
         c AS (SELECT user_id, min(di) AS cohort_day FROM e GROUP BY user_id)
         SELECT c.cohort_day, e.di - c.cohort_day AS offset_days,
           count(DISTINCT e.user_id) AS n_users
         FROM e JOIN c ON e.user_id = c.user_id
         GROUP BY 1, 2""",
    "q93_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
         nu AS (SELECT count(DISTINCT user_id) AS n_total FROM ut),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_ab
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, n_ab, ta.n AS n_a, tb.n AS n_b, n_total,
           (n_ab * 1000000) // ta.n AS conf_a_to_b_ppm,
           (n_ab * n_total * 1000000) // (ta.n * tb.n) AS lift_ppm
         FROM p
         JOIN tot ta ON p.type_a = ta.event_type
         JOIN tot tb ON p.type_b = tb.event_type
         CROSS JOIN nu""")
}
