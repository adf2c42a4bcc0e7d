package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Cdc]]'s two contracts: chunks PARTITION the token stream, and
  * boundaries are CONTENT-LOCAL — an edit re-chunks only the window it
  * touches (the property fixed-stride chunking lacks, and the reason
  * q135 exists next to q64).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Long, Long)] =
    Cdc.chunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("fp"), col("len")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private val base = (1 to 200)
    .map(i => s"tok${i % 37}v${(i * 7) % 11}").mkString(" ")

  test("chunks partition the token stream: lengths sum to n_tokens") {
    val cs = chunksOf(base)
    assert(cs.map(_._2).sum === 200L)
    assert(cs.nonEmpty && cs.forall(_._2 >= 1L))
    // divisor 8 → mean chunk ≈ 8 tokens; sanity-bound the realized count
    assert(cs.size >= 5 && cs.size <= 100, cs.size)
  }

  test("shift robustness: prepending a token leaves every chunk after the first boundary identical") {
    val cs = chunksOf(base)
    val shifted = chunksOf("inserted " + base)
    // every boundary of the original re-appears (hash windows fully
    // inside the original text are unchanged), so the original's chunk
    // sequence minus its prefix chunk is a suffix of the shifted doc's
    val tailOrig = cs.drop(1)
    assert(shifted.takeRight(tailOrig.size) === tailOrig)
    // a FIXED-stride chunker (q64 semantics) realigns nothing: stride-8
    // windows of the shifted doc share no fingerprint past the first
    // boundary — verified here only in that CDC's overlap is total
    assert(tailOrig.nonEmpty)
  }

  test("native CdcChunksExpr is bit-equal to the HOF twin on varied docs") {
    val docs = ((1L, base) +: (2L to 40L).map(i =>
      (i, (1 to i.toInt * 3).map(j => s"w${(j * 13 + i) % 29}").mkString(" "))))
      .toDF("doc_id", "text")
    for ((w, d) <- Seq((4, 8), (3, 5), (5, 16))) {
      val native = Cdc.chunks(docs, "doc_id", "text", w, d)
        .orderBy("doc_id", "fp", "len").collect().toSeq
      val hof = Cdc.chunksHof(docs, "doc_id", "text", w, d)
        .orderBy("doc_id", "fp", "len").collect().toSeq
      assert(native === hof, s"window=$w divisor=$d")
    }
  }

  test("short documents yield one whole-document chunk") {
    val cs = chunksOf("a b c")
    assert(cs.size === 1 && cs.head._2 === 3L)
  }

  test("identical texts chunk identically; a mid-document edit only perturbs nearby chunks") {
    val cs1 = chunksOf(base)
    val words = base.split(" ").toVector
    val edited = (words.take(100) ++ Vector("EDIT") ++ words.drop(100)).mkString(" ")
    val cs2 = chunksOf(edited)
    // suffix after the edit's realignment boundary is shared
    val common = cs1.reverse.zip(cs2.reverse).takeWhile { case (a, b) => a == b }
    assert(common.size >= 1, "no shared suffix chunks after a single edit")
    // prefix before the edit is shared too
    val commonPrefix = cs1.zip(cs2).takeWhile { case (a, b) => a == b }
    assert(commonPrefix.size >= 1, "no shared prefix chunks before a single edit")
  }
}
