package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Bpe]]'s merge semantics — the greedy left-to-right
  * non-overlapping fold the q136 oracle replays via run-parity windows.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergeOne(word: String, a: String, b: String): Seq[String] = {
    val df = Seq(word).toDF("w")
      .withColumn("sym", slice(split(col("w"), ""), lit(1), length(col("w"))))
      .select(Bpe.mergeSyms(col("sym"), a, b).as("m"))
    df.collect().head.getSeq[String](0)
  }

  test("merge fuses every non-overlapping occurrence left to right") {
    assert(mergeOne("abab", "a", "b") === Seq("ab", "ab"))
    assert(mergeOne("xabby", "a", "b") === Seq("x", "ab", "b", "y"))
    assert(mergeOne("aab", "a", "b") === Seq("a", "ab"))
  }

  test("identical-pair runs merge at even offsets only (greedy, non-overlapping)") {
    assert(mergeOne("aaa", "a", "a") === Seq("aa", "a"))
    assert(mergeOne("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(mergeOne("baaab", "a", "a") === Seq("b", "aa", "a", "b"))
  }

  test("a fused symbol never chain-merges within the same round") {
    // merge (a,b) on "abb": after fusing positions 1-2 the new "ab"
    // must NOT consume the trailing b
    assert(mergeOne("abb", "a", "b") === Seq("ab", "b"))
  }

  test("no-occurrence and single-symbol words pass through") {
    assert(mergeOne("xyz", "a", "b") === Seq("x", "y", "z"))
    assert(mergeOne("a", "a", "b") === Seq("a"))
  }

  test("multi-round training fuses multi-char symbols and is deterministic") {
    val docs = Seq("peppery pepper", "pepper pot", "pepper").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val (merges, finalWords) = Bpe.train(words, rounds = 3)
    assert(merges.size === 3)
    // round 1 must pick the globally heaviest pair; weights are
    // freq-weighted so "pe" (appears in every pepper occurrence,
    // twice per word) dominates
    val (r1, a1, b1, w1) = merges.head
    assert(r1 === 1 && (a1 + b1) === "pe" && w1 >= 8)
    // re-train on the same input: identical merge list (total order)
    val (merges2, _) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 3)
    assert(merges2 === merges)
    // symbols always re-concatenate to the original word
    val bad = finalWords
      .filter(concat_ws("", col("sym")) =!= col("w")).count()
    assert(bad === 0L)
  }

  test("training on single-char words exhausts gracefully") {
    val docs = Seq("a b a", "b a").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val (merges, _) = Bpe.train(words, rounds = 3)
    assert(merges.isEmpty) // no adjacent pairs exist at all
  }
}
