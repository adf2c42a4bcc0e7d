package graft
package queries

/** Oracle SQL shared verbatim between query pairs (bit-equality
  * contracts between alternative physical paths).
  */
private[graft] trait OracleShared {

  /** q07's oracle, shared verbatim with q54 (the blocked variant must be
    * bit-equal to the broadcast-whole path). */
  protected val knnPredictOracle: String =
    """WITH test AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
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
           SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
         SELECT test_id, CAST(label AS BIGINT) AS prediction FROM (
           SELECT test_id, label,
             row_number() OVER (PARTITION BY test_id
               ORDER BY cnt DESC, label ASC) AS vr
           FROM votes) WHERE vr = 1"""

  /** q56's oracle, shared verbatim with q58: the Bloom-prefiltered
    * shuffle path must be bit-equal to the broadcast path (no false
    * negatives; false positives die in the exact join). */
  protected val decontamOracle: String =
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
         b AS (SELECT DISTINCT unnest(sh) AS s FROM shh WHERE doc_id % 25 = 0),
         tr AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id % 25 <> 0)
         SELECT doc_id, count(*) AS n_shared_ngrams
         FROM tr JOIN b USING (s)
         GROUP BY doc_id"""
}
