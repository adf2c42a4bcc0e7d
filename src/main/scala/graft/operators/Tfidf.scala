package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-weighted term importance (TF-IDF family) — the staple ranking
  * behind text-pipeline filtering and near-dup blocking. The reference
  * engine has no text surface at all (SURVEY §2.1); this closes the one
  * gap the round-5 review named first: the corpus document frequency that
  * the capped-Jaccard path already computes (Dedup.scala doc-freq cap)
  * but threw away becomes a first-class ranking signal here.
  *
  * FP-portability: the score is `floor(1e6 · tf / df)` — a quotient of
  * two sub-2^53 integers, so the IEEE double division is exact whenever
  * the true quotient is integral and correctly rounded otherwise; `floor`
  * of it is engine-portable (the same discipline as the percentile and
  * quality-score queries). A true `ln(N/df)` idf is NOT portable across
  * engines (libm differences), so the monotone integer surrogate ranks
  * identically per document without the logarithm: within one document,
  * higher tf / lower df wins either way.
  *
  * Scale shape (100 TB):
  *  - tf: one `groupBy(doc, term)` — partial-aggregated, shuffle keyed by
  *    (doc, term), high cardinality, distributes;
  *  - df: one `groupBy(term)` over the (doc, term) relation — again
  *    partial-aggregated (counting each term once per doc, not per
  *    occurrence);
  *  - score join: shuffle-hash on `term` (high cardinality; boilerplate
  *    mega-terms skew is bounded because the per-doc side of a term is
  *    at most |docs|, and AQE skew-split handles the head);
  *  - per-doc top-k: the bounded-heap [[TopK.topTerms]] aggregator —
  *    map-side partial heaps of size k, so the final exchange carries
  *    `partitions × docs × k` rows, never the full scored relation, and
  *    NO per-doc Window sort appears anywhere in the plan.
  */
object Tfidf {

  /** Per-document top-k terms by `floor(1e6 · tf / df)`, ties broken by
    * term (ascending, binary collation).
    *
    * @return (doc_id, rn ∈ 1..k, term, tf, df, score_micro) — rn densely
    *         ranked by (score desc, term asc)
    */
  def topTerms(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df derives from tf, and the trivially-true filter is load-bearing:
    // it forces the df branch to consume tf's count column, so Catalyst
    // cannot prune the aggregate down to a bare distinct — both branches
    // then plan the IDENTICAL (doc_id, term) partial-agg exchange and
    // ReuseExchange collapses them: the corpus is scanned and exploded
    // ONCE, not once per branch (measured: the pruned variant re-scans).
    val df = tf.filter(col("tf") >= 1)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // vocabulary is corpus-derived (unbounded at 100 TB): pin the term
    // join to shuffle-hash rather than letting small-SF stats broadcast it
    val scored = tf.join(df.hint("shuffle_hash"), "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        floor(col("tf") * lit(1000000L) / col("df")).cast("long").as("score_micro"))
    scored
      .groupBy(col("doc_id"))
      .agg(TopK.topTerms(k)(
        col("score_micro"), col("term"), col("tf"), col("df")).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("rn"),
        col("t.term").as("term"),
        col("t.tf").as("tf"),
        col("t.df").as("df"),
        col("t.score").as("score_micro"))
  }
}
