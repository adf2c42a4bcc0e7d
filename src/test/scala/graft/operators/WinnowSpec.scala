package graft.operators

import graft.SparkSpec

/** Pins the winnowing THEOREM q143 trades on: any shared token run of
  * length ≥ w + k − 1 (= 7 at the shipped k=4, w=4) is detected at ANY
  * alignment — the guarantee q80's stride-32 windows only deliver for
  * stride-aligned offsets.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    Winnow.pairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val run = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = w+k-1

  test("a 7-token shared run is detected at every alignment offset") {
    // doc 1 embeds the run at offset 0; docs 2..6 embed it at offsets
    // 1..5 inside otherwise-unrelated filler — every pair (1, i) must
    // surface, regardless of alignment
    val filler = (1 to 40).map(i => s"f${i}x").mkString(" ")
    val fillers = (0 to 5).map(o => (1 to o).map(i => s"p${i}q").mkString(" "))
    val docs = (0 to 5).map { o =>
      val pre = fillers(o)
      ((o + 1).toLong, (if (pre.isEmpty) "" else pre + " ") + run + " " + filler)
    }
    val got = pairsOf(docs)
    for (i <- 2L to 6L)
      assert(got.contains((1L, i)), s"offset ${i - 1} must be detected: $got")
  }

  test("documents with no shared run of length >= 7 share no fingerprint here") {
    val d1 = (1L, (1 to 30).map(i => s"a${i}b").mkString(" "))
    val d2 = (2L, (1 to 30).map(i => s"c${i}d").mkString(" "))
    assert(pairsOf(Seq(d1, d2)).isEmpty)
  }

  test("short-document fallbacks: sub-k docs fingerprint whole-doc; exact clones pair") {
    val docs = Seq((1L, "one two"), (2L, "one two"), (3L, "three four"))
    val got = pairsOf(docs)
    assert(got === Set((1L, 2L)))
  }

  test("randomized guarantee sweep: 25 planted runs at random offsets/lengths all detected in one pass") {
    // one Spark job over 50 docs: pair i = (2i+1, 2i+2) shares a random
    // run of length 7..12 planted at random offsets in otherwise
    // pair-unique filler — every pair must surface, no cross-pair leaks
    val rnd = new scala.util.Random(4242)
    val docs = (0 until 25).flatMap { i =>
      val runLen = 7 + rnd.nextInt(6)
      val run = (1 to runLen).map(j => s"r${i}s$j").mkString(" ")
      def filler(side: Int, n: Int) =
        (1 to n).map(j => s"u$i${side}v$j").mkString(" ")
      val o1 = rnd.nextInt(10); val o2 = rnd.nextInt(10)
      Seq(
        ((2 * i + 1).toLong,
          Seq(filler(0, o1), run, filler(1, 20)).filter(_.nonEmpty).mkString(" ")),
        ((2 * i + 2).toLong,
          Seq(filler(2, o2), run, filler(3, 20)).filter(_.nonEmpty).mkString(" ")))
    }
    val got = pairsOf(docs)
    for (i <- 0 until 25) {
      val expect = ((2 * i + 1).toLong, (2 * i + 2).toLong)
      assert(got.contains(expect), s"planted pair $expect missing")
    }
    assert(got.size === 25, s"cross-pair false positives: ${got.size} pairs")
  }

  test("native WinnowFingerprintsExpr is bit-equal to the HOF twin on varied docs and configs") {
    import spark.implicits._
    val long = (1 to 250).map(i => s"w${(i * 7) % 41}z${i % 13}").mkString(" ")
    val docs = ((1L, long) +: (2L to 40L).map(i =>
      (i, (1 to i.toInt * 2).map(j => s"v${(j * 17 + i) % 31}").mkString(" "))))
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 4), (3, 5), (5, 2))) {
      val native = Winnow.fingerprints(docs, "doc_id", "text", k, w)
        .orderBy("doc_id", "fp").collect().toSeq
      val hof = Winnow.fingerprintsHof(docs, "doc_id", "text", k, w)
        .orderBy("doc_id", "fp").collect().toSeq
      assert(native === hof, s"k=$k w=$w")
    }
  }

  test("fingerprint density is a fraction of the k-gram count") {
    val text = (1 to 400).map(i => s"tok${i % 53}u${(i * 11) % 17}").mkString(" ")
    val nFps = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").count()
    // theoretical density 2/(w+1) = 0.4 of the 397 k-grams; distinct-ing
    // pushes it lower. Assert it's a real index, not one-per-gram.
    assert(nFps > 20 && nFps < 250, s"density off: $nFps fingerprints")
  }
}
