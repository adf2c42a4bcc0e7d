package graft
package queries

/** DuckDB-dialect oracle SQL, queries q01–q53. Split out of the former
  * monolithic `Queries` object — pure move, no semantic change.
  */
private[graft] trait OracleSqlA extends OracleShared {

  protected val oracleSqlA: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q02_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0""",
    "q03_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q04_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "q05_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q06_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 3""",
    "q07_knn_predict" -> knnPredictOracle,
    "q08_knn_accuracy" ->
      """WITH test AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 = 0),
         train AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 25 <> 0),
         scored AS (
           SELECT t.vec_id AS test_id, tr.label, tr.vec_id AS train_id,
             (SELECT sum((x - y) * (x - y)) FROM
               (SELECT unnest(t.embedding)::DOUBLE AS x,
                       unnest(tr.embedding)::DOUBLE AS y)) AS dist
           FROM test t CROSS JOIN train tr),
         knn AS (
           SELECT test_id, label FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY dist ASC, train_id ASC) AS rn
             FROM scored) WHERE rn <= 5),
         votes AS (
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label),
         preds AS (
           SELECT test_id, label AS prediction FROM (
             SELECT test_id, label,
               row_number() OVER (PARTITION BY test_id
                 ORDER BY cnt DESC, label ASC) AS vr
             FROM votes) WHERE vr = 1)
         SELECT CAST(sum(CASE WHEN p.prediction = t.label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
                count(*) AS total
         FROM preds p JOIN test t ON p.test_id = t.vec_id""",
    "q12_token_stats" ->
      """SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
           length(text) AS n_chars_actual,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
         FROM documents""",
    "q13_text_quality" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt
           FROM tk)
         SELECT doc_id, n_tokens, stop_cnt,
           least(n_tokens, 100) * 5
             + CAST(floor(stop_cnt * 500.0 / n_tokens) AS BIGINT) AS quality
         FROM c""",
    "q14_lang_id" ->
      """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr
           FROM tk)
         SELECT doc_id,
           CASE
             WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
             WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
             WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
             WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
             ELSE 'fr'
           END AS lang_guess
         FROM c""",
    "q15_fingerprint" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_split_to_array(trim(text), '\s+'), t ->
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007))),
             (f, h) -> (f * 31 + h) % 1000000007) AS fp
         FROM documents""",
    "q16_dedup_exact" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
         SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM aug GROUP BY text""",
    "q17_jaccard_pairs" ->
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
           GROUP BY 1, 2, 3, 4)
         SELECT id1, id2,
           CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jac_micro
         FROM common
         WHERE floor(c * 1000000.0 / (na + nb - c)) >= 500000""",
    "q18_minhash_lsh" ->
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
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
           FROM bands a JOIN bands b2
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
    "q19_simhash_pairs" ->
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
           FROM bitsum GROUP BY doc_id)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         FROM simh a JOIN simh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""",
    "q20_cosine_pairs" ->
      """WITH v AS (
           SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 5 = 0),
         p AS (
           SELECT a.id AS id1, b.id AS id2, a.e AS ea, b.e AS eb
           FROM v a JOIN v b ON a.id < b.id),
         s AS (
           SELECT id1, id2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS dot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))),
               (x, y) -> x + y) AS na,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(eb)),
                 i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS nb
           FROM p)
         SELECT id1, id2, cos_micro FROM (
           SELECT id1, id2,
             CAST(floor(1000000.0 * (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END)) AS BIGINT) AS cos_micro
           FROM s)
         WHERE cos_micro >= 350000""",
    "q21_ann_exact" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT qid, iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM q CROSS JOIN it))
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q22_ann_lsh" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         qs0 AS (
           SELECT qid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(qe[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM q, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         qs AS (
           SELECT qid, tbl,
             CASE WHEN pb < 0 THEN sig
                  ELSE xor(sig, CAST(1 AS BIGINT) << pb) END AS sig
           FROM qs0, (SELECT unnest(generate_series(-1, 4)) AS pb)),
         its AS (
           SELECT iid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(ie[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM it, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         cand AS (
           SELECT DISTINCT qs.qid, its.iid
           FROM qs JOIN its ON qs.tbl = its.tbl AND qs.sig = its.sig),
         scored AS (
           SELECT c.qid, c.iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT c.qid, c.iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM cand c JOIN q ON c.qid = q.qid JOIN it ON c.iid = it.iid) c)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q23_sort_limit" ->
      """SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q24_set_ops" ->
      """SELECT custkey, 'high' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders
           INTERSECT
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0)
         UNION ALL
         SELECT custkey, 'low_only' AS tag FROM (
           SELECT o_custkey AS custkey FROM orders
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0)""",
    "q25_semi_anti" ->
      """WITH w AS (
           SELECT c_nationkey, count(*) AS n_with_orders FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1),
         wo AS (
           SELECT c_nationkey, count(*) AS n_without_orders FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1)
         SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
           coalesce(n_with_orders, 0) AS n_with_orders,
           coalesce(n_without_orders, 0) AS n_without_orders
         FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey""",
    "q26_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q27_events_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2""",
    "q28_sql_join_agg" ->
      """SELECT n_name, l_returnflag, count(*) AS cnt,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, l_returnflag""",
    "q29_sql_vector_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
         i AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
         scored AS (
           SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(q.embedding)),
                 x -> (CAST(q.embedding[x] AS DOUBLE) - CAST(i.embedding[x] AS DOUBLE))
                    * (CAST(q.embedding[x] AS DOUBLE) - CAST(i.embedding[x] AS DOUBLE)))),
               (a, b) -> a + b) AS dist
           FROM q CROSS JOIN i)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (
           SELECT query_id, neighbor_id, dist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor_id) AS rank
           FROM scored)
         WHERE rank <= 3""",
    "q30_asof_join" ->
      """SELECT l.event_id, l.user_id, coalesce(r.rid, -1) AS matched_err
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT max(event_id) AS rid, user_id AS ruid, ts AS rts
                         FROM events WHERE event_type = 'error'
                         GROUP BY user_id, ts) r
           ON l.user_id = r.ruid AND l.ts >= r.rts""",
    "q31_sessionize" ->
      """WITH s AS (
           SELECT user_id, ts, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         flagged AS (
           SELECT user_id,
             CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 600000000
                  THEN 1 ELSE 0 END AS new_sess,
             ts, event_id
           FROM s),
         sid AS (
           SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged),
         per_sess AS (
           SELECT user_id, sid, count(*) AS sess_events FROM sid GROUP BY 1, 2)
         SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
           CAST(sum(sess_events) AS BIGINT) AS n_events,
           CAST(max(sess_events) AS BIGINT) AS longest_session
         FROM per_sess GROUP BY user_id""",
    "q32_distinct_agg" ->
      """SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q33_cosine_lsh" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
         sigs AS (
           SELECT id, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 11), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(e[d+1] AS DOUBLE) *
                     (CAST((((tbl*12+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM v, (SELECT unnest(generate_series(0, 3)) AS tbl)),
         cand AS (
           SELECT DISTINCT a.id AS id1, b.id AS id2
           FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.id < b.id),
         p AS (
           SELECT c.id1, c.id2, a.e AS ea, b.e AS eb
           FROM cand c JOIN v a ON c.id1 = a.id JOIN v b ON c.id2 = b.id),
         s AS (
           SELECT id1, id2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS dot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(ea)),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))),
               (x, y) -> x + y) AS na,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(eb)),
                 i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) AS nb
           FROM p)
         SELECT id1, id2, cos_micro FROM (
           SELECT id1, id2,
             CAST(floor(1000000.0 * (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
               ELSE dot / (sqrt(na) * sqrt(nb)) END)) AS BIGINT) AS cos_micro
           FROM s)
         WHERE cos_micro >= 350000""",
    "q34_jaccard_capped" ->
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
         ex0 AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         keep AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= 5),
         kept AS (SELECT doc_id, s FROM ex0 JOIN keep USING (s)),
         n AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
           FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id1, id2,
           CAST(floor(c * 1000000.0 / (na.n + nb.n - c)) AS BIGINT) AS jac_micro
         FROM common
         JOIN n na ON common.id1 = na.doc_id
         JOIN n nb ON common.id2 = nb.doc_id
         WHERE floor(c * 1000000.0 / (na.n + nb.n - c)) >= 500000""",
    "q35_pivot" ->
      """SELECT l_returnflag,
           count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_cnt,
           count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_cnt,
           count(CASE WHEN l_linestatus = 'P' THEN 1 END) AS p_cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q36_wordcount" ->
      """SELECT token, count(*) AS cnt FROM (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents)
         GROUP BY token
         ORDER BY cnt DESC, token ASC
         LIMIT 100""",
    "q37_det_split" ->
      """SELECT doc_id,
           (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 10 AS bucket,
           CASE WHEN (((doc_id % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 10 < 8
                THEN 'train' ELSE 'test' END AS split
         FROM documents""",
    "q38_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text,
           len(regexp_split_to_array(
             trim(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
             '\s+')) AS norm_tokens
         FROM documents""",
    "q39_ann_ivf" ->
      """WITH it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         cb AS (
           SELECT iid AS cid, ie AS ce FROM it
           ORDER BY (((iid % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 1000003, iid
           LIMIT 64),
         assign AS (
           SELECT iid, ie, cid FROM (
             SELECT i.iid, i.ie, c.cid,
               row_number() OVER (PARTITION BY i.iid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(i.ie)),
                     x -> (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM it i CROSS JOIN cb c) WHERE rn <= 2),
         probe AS (
           SELECT qid, qe, cid FROM (
             SELECT q.qid, q.qe, c.cid,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(q.qe)),
                     x -> (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM q CROSS JOIN cb c) WHERE rn <= 16),
         scored AS (
           SELECT p.qid, a.iid,
             min(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(p.qe)),
                 x -> (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE))
                    * (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE)))),
               (a2, b2) -> a2 + b2)) AS dist
           FROM probe p JOIN assign a ON p.cid = a.cid
           GROUP BY p.qid, a.iid)
         SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, iid AS neighbor_id,
           CAST(floor(dist * 1000000.0) AS BIGINT) AS dist_micro
         FROM (SELECT qid, iid, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
               FROM scored)
         WHERE rn <= 5""",
    "q40_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q41_collect" ->
      """SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
           count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey""",
    "q42_range_join" ->
      """SELECT l.event_id, count(r.ts) AS n_prior_errors
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         LEFT JOIN (SELECT user_id AS ruid, ts FROM events WHERE event_type = 'error') r
           ON l.user_id = r.ruid
          AND epoch_us(r.ts) >= epoch_us(l.ts) - 600000000
          AND epoch_us(r.ts) <= epoch_us(l.ts)
         GROUP BY l.event_id""",
    "q43_neardup_clusters" ->
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
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a)
         SELECT d.doc_id,
           CAST(CASE WHEN m.a IS NULL THEN d.doc_id
                     ELSE least(m.mr, d.doc_id) END AS BIGINT) AS cluster_id
         FROM documents d LEFT JOIN mins m ON d.doc_id = m.a""",
    "q44_ann_recall" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0
           ORDER BY (vec_id * 2654435761 + 12345) % 1000003, vec_id
           LIMIT 64),
         it AS (
           SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id % 10 <> 0),
         e_scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT qid, iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM q CROSS JOIN it)),
         exact AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM e_scored)
           WHERE rn <= 5),
         qs0 AS (
           SELECT qid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(qe[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM q, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         qs AS (
           SELECT qid, tbl,
             CASE WHEN pb < 0 THEN sig
                  ELSE xor(sig, CAST(1 AS BIGINT) << pb) END AS sig
           FROM qs0, (SELECT unnest(generate_series(-1, 4)) AS pb)),
         its AS (
           SELECT iid, tbl,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 4), p ->
                 CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(0, 63), d ->
                     CAST(ie[d+1] AS DOUBLE) *
                     (CAST((((tbl*5+p)*6700417 + d + 1) * 2654435761) % 1000000007 AS DOUBLE)
                       / 1000000007.0 - 0.5))), (x,y) -> x+y) >= 0
                 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)), (a,b) -> a+b) AS sig
           FROM it, (SELECT unnest(generate_series(0, 11)) AS tbl)),
         l_cand AS (
           SELECT DISTINCT qs.qid, its.iid
           FROM qs JOIN its ON qs.tbl = its.tbl AND qs.sig = its.sig),
         l_scored AS (
           SELECT qid, iid,
             1.0 - (CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                    ELSE dot / (sqrt(na) * sqrt(nb)) END) AS dist
           FROM (
             SELECT c.qid, c.iid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS dot,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(qe)),
                   i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (x,y) -> x+y) AS na,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, len(ie)),
                   i -> CAST(ie[i] AS DOUBLE) * CAST(ie[i] AS DOUBLE))), (x,y) -> x+y) AS nb
             FROM l_cand c JOIN q ON c.qid = q.qid JOIN it ON c.iid = it.iid)),
         lsh AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM l_scored)
           WHERE rn <= 5),
         cb AS (
           SELECT iid AS cid, ie AS ce FROM it
           ORDER BY (((iid % 1000000007 + 1) * 2654435761) % 1000000007) * 2246822519 % 1000000007 % 1000003, iid
           LIMIT 64),
         assign AS (
           SELECT iid, ie, cid FROM (
             SELECT i.iid, i.ie, c.cid,
               row_number() OVER (PARTITION BY i.iid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(i.ie)),
                     x -> (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(i.ie[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM it i CROSS JOIN cb c) WHERE rn <= 2),
         probe AS (
           SELECT qid, qe, cid FROM (
             SELECT q.qid, q.qe, c.cid,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(q.qe)),
                     x -> (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE))
                        * (CAST(q.qe[x] AS DOUBLE) - CAST(c.ce[x] AS DOUBLE)))),
                   (a, b) -> a + b), c.cid) AS rn
             FROM q CROSS JOIN cb c) WHERE rn <= 16),
         i_scored AS (
           SELECT p.qid, a.iid,
             min(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(p.qe)),
                 x -> (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE))
                    * (CAST(p.qe[x] AS DOUBLE) - CAST(a.ie[x] AS DOUBLE)))),
               (a2, b2) -> a2 + b2)) AS dist
           FROM probe p JOIN assign a ON p.cid = a.cid
           GROUP BY p.qid, a.iid),
         ivf AS (
           SELECT qid AS query_id, iid AS neighbor_id
           FROM (SELECT qid, iid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, iid) AS rn
                 FROM i_scored)
           WHERE rn <= 5)
         SELECT method, hits, possible,
           CAST(floor(hits * 1000000.0 / possible) AS BIGINT) AS recall_micro
         FROM (
           SELECT 'ivf' AS method,
             (SELECT count(*) FROM exact e JOIN ivf a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id) AS hits,
             (SELECT count(*) FROM exact) AS possible
           UNION ALL
           SELECT 'lsh' AS method,
             (SELECT count(*) FROM exact e JOIN lsh a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id) AS hits,
             (SELECT count(*) FROM exact) AS possible)""",
    "q45_percentiles" ->
      """SELECT l_returnflag,
           CAST(floor(quantile_cont(l_quantity, 0.25) * 100) AS BIGINT) AS p25_x100,
           CAST(floor(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_x100,
           CAST(floor(quantile_cont(l_quantity, 0.75) * 100) AS BIGINT) AS p75_x100,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""",
    "q46_running_totals" ->
      """SELECT o_custkey, o_orderkey, price_cents,
           CAST(sum(price_cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
           CAST(price_cents - coalesce(lag(price_cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey), 0) AS BIGINT) AS delta_cents
         FROM (SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
               FROM orders)""",
    "q47_top_bigrams" ->
      """WITH tk AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
         bg AS (
           SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2)
         SELECT bigram, count(*) AS cnt FROM bg
         GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 100""",
    "q48_quality_filter" ->
      """WITH tk AS (
           SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN
               ('the','a','an','of','and','is','in','to','it','that'))) AS stop_cnt,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS c_en,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es','no'))) AS c_es,
             len(list_filter(toks, t -> t IN ('le','la','de','et','est','pas'))) AS c_fr,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpe_tokens
           FROM tk),
         m AS (
           SELECT doc_id,
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
         SELECT doc_id, lang_guess, CAST(quality AS BIGINT) AS quality,
           CAST(bpe_tokens AS BIGINT) AS bpe_tokens
         FROM m
         WHERE lang_guess = 'en' AND quality >= 300
           AND bpe_tokens BETWEEN 10 AND 2000""",
    "q49_neardup_survivors" ->
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
         mins AS (SELECT a, min(r) AS mr FROM reach GROUP BY a)
         SELECT d.doc_id
         FROM documents d LEFT JOIN mins m ON d.doc_id = m.a
         WHERE m.a IS NULL OR m.mr >= d.doc_id""",
    "q50_stratified_sample" ->
      """SELECT CAST(label AS BIGINT) AS label, vec_id, CAST(rn AS BIGINT) AS rn
         FROM (
           SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY
               ((((vec_id % 1000000007 + 1) * 2654435761) % 1000000007)
                 * 2246822519) % 1000000007 % 1000003,
               vec_id) AS rn
           FROM embeddings)
         WHERE rn <= 200""",
    "q51_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
    "q52_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         df AS (
           SELECT term, count(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT doc_id, term, tf, df,
             CAST(floor(tf * 1000000.0 / df) AS BIGINT) AS score_micro
           FROM tf JOIN df USING (term))
         SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df, score_micro
         FROM (
           SELECT doc_id, term, tf, df, score_micro,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_micro DESC, term ASC) AS rn
           FROM sc)
         WHERE rn <= 3""",
    "q53_sketch_check" ->
      """SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(floor(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_x100,
           CAST(1 AS BIGINT) AS acd_ok,
           CAST(1 AS BIGINT) AS p50_ok
         FROM lineitem GROUP BY l_returnflag""")
}
