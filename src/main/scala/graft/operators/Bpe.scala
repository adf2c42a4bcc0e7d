package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, Spark-first.
  *
  * The feasibility argument for BPE at 100 TB (SURVEY §8, q129): the
  * corpus is scanned exactly ONCE, for the partial-agged wordcount;
  * every merge round after that runs on the VOCAB-BOUNDED `(word,
  * freq, symbols)` table — Heaps-law sized, millions of rows at any
  * corpus scale, never the corpus — which is exactly how production
  * BPE trainers (sentencepiece, HF tokenizers) are structured: they
  * too train on word counts, not the raw stream. Application is the
  * same trick in reverse: tokenize the DISTINCT words (vocab-side
  * array transform), then join the segment counts back to the
  * corpus's word stream — the corpus is never char-exploded.
  *
  * Merge semantics (pinned by [[BpeSpec]] and the q136 oracle): one
  * round replaces every adjacent symbol pair `(a, b)` with the fused
  * symbol `a+b`, greedy LEFT-TO-RIGHT and non-overlapping — in a run
  * `aaa` with merge `(a,a)`, positions 1–2 fuse and position 3
  * survives alone. The trainer picks the pair with the highest
  * freq-weighted adjacent-occurrence count, ties toward the
  * lexicographically smaller pair string, so training is a total
  * deterministic order and any engine replays the same merge list.
  */
object Bpe {

  /** `documents(textCol)` → the weighted word table BPE trains on:
    * `(w, freq, sym)` with `sym` the word's character symbols. One
    * corpus scan, partial-agged. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // CODE-POINT split, not split-by-empty-regex: an empty-pattern
      // split cuts UTF-16 code units, shearing surrogate pairs in
      // half, while the DuckDB oracle's string_split is code-point
      // exact — `(?s).` matches one full code point (incl. newlines),
      // so non-BMP words keep intact symbols in both engines
      .withColumn("sym",
        regexp_extract_all(col("w"), lit("(?s)."), lit(0)))
  }

  /** Freq-weighted adjacent-pair statistics of the current symbol
    * table: `(left, right, weight)`. Overlapping occurrences all
    * count (`aaa` contributes weight 2·freq to `(a,a)`) — the
    * standard BPE statistic. Vocab-bounded input and output. */
  def pairStats(words: DataFrame): DataFrame = {
    val s = col("sym")
    val pairs = zip_with(slice(s, lit(1), size(s) - 1),
      slice(s, lit(2), size(s) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
    words
      .select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("weight"))
  }

  /** The round's winning merge: max weight, ties toward the smaller
    * `"left right"` pair string. Returns None on an exhausted table
    * (every word a single symbol). */
  def topPair(words: DataFrame): Option[(String, String, Long)] = {
    pairStats(words)
      .orderBy(col("weight").desc, concat_ws(" ", col("left"), col("right")).asc)
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** One greedy left-to-right non-overlapping merge pass over a symbol
    * array column — a pure per-row fold (no shuffle): state is
    * `(out, prev)`; `prev == a` meeting `s == b` fuses and clears
    * `prev`, so a fused symbol never chain-merges within the round. */
  def mergeSyms(sym: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit("").as("prev"))
    val folded = aggregate(sym, init,
      (st, s) =>
        when(st.getField("prev") === lit(a) && s === lit(b),
          struct(
            concat(st.getField("out"), array(lit(a + b))).as("out"),
            lit("").as("prev")))
        .otherwise(struct(
          when(st.getField("prev") === "", st.getField("out"))
            .otherwise(concat(st.getField("out"),
              array(st.getField("prev")))).as("out"),
          s.as("prev"))))
    when(folded.getField("prev") === "", folded.getField("out"))
      .otherwise(concat(folded.getField("out"),
        array(folded.getField("prev"))))
  }

  /** `rounds` greedy merge rounds. Returns the learned merge list
    * `(round, left, right, weight)` and the final symbol table. Each
    * round is one vocab-bounded agg (+ a 1-row collect — the merge
    * must parametrize the next round's expression, the IVF-codebook
    * kind of driver-legitimate) and one per-row array fold;
    * `localCheckpoint` cuts the per-round lineage so round r doesn't
    * replan r fold layers. */
  def train(words0: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var words = words0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      topPair(words) match {
        case Some((a, b, wgt)) =>
          merges += ((r, a, b, wgt))
          words = words
            .withColumn("sym", mergeSyms(col("sym"), a, b))
            .localCheckpoint()
        case None => exhausted = true
      }
      r += 1
    }
    (merges.result(), words)
  }
}
