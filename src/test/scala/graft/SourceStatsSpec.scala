package graft

import org.apache.spark.sql.functions._

/** Fixture semantics for the per-source corpus-statistics queries —
  * the sf0.01 oracle gate (q108/q109) checks engine agreement, but the
  * synthetic corpus is uniformly diverse, so the DECISION semantics
  * (the template flag firing; the TVD extremes) never fire there. This
  * spec pins them on a hand-computed corpus written as a temp
  * `documents.parquet` so the REAL query entry points (sfDir-loading,
  * not a test-only seam) are what is exercised.
  */
class SourceStatsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_srcstats").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q108: a template-stamped source trips is_template; a diverse one does not") {
    // template source: 12 docs stamped from one 10-token text →
    // 8 distinct trigrams over 96 occurrences → 83333 ppm
    val stamp = (1 to 10).map(i => s"t$i").mkString(" ")
    val diverse = (1 to 13).map(i => s"d$i").mkString(" ")
    val dir = writeDocs(
      (1 to 12).map(i => (i.toLong, stamp, "tmpl")) :+ (99L, diverse, "var"))
    val out = Queries.sourceDiversity(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("tmpl", 96L, 8L, 83333L, 1L),
      ("var", 11L, 11L, 1000000L, 0L)))
  }

  test("q108: docs under 3 tokens contribute no trigrams") {
    val dir = writeDocs(Seq((1L, "a b", "s"), (2L, "a b c", "s")))
    val out = Queries.sourceDiversity(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("s", 1L, 1L, 1000000L, 0L)))
  }

  test("q109: hand-computed TVD — minority alien source diverges more") {
    // source A: 10 occurrences of token x; source B: 30 of token y.
    // T = 40. TVD(A) = (|1/4 − 1| + |0 − 3/4|)/2 = 3/4 → 750000 ppm;
    // TVD(B) = 1/4 → 250000 ppm. The ABSENT-token mass (recovered
    // algebraically, never scanned) dominates both.
    val dir = writeDocs(Seq(
      (1L, Seq.fill(10)("x").mkString(" "), "A"),
      (2L, Seq.fill(30)("y").mkString(" "), "B")))
    val out = Queries.sourceDivergence(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("A", 10L, 750000L), ("B", 30L, 250000L)))
  }

  test("q109: a source matching the corpus distribution has zero TVD") {
    // both sources are 50/50 x/y → every per-token share matches the
    // corpus exactly
    val dir = writeDocs(Seq(
      (1L, "x y x y", "A"),
      (2L, "x y x y x y", "B")))
    val out = Queries.sourceDivergence(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("A", 4L, 0L), ("B", 6L, 0L)))
  }
}
