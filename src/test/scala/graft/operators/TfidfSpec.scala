package graft.operators

import graft.SparkSpec

class TfidfSpec extends SparkSpec {

  test("term buffer: keeps the k best by (score desc, term asc)") {
    val b = new TermTopKBuffer(3)
    Seq((5L, "e"), (9L, "a"), (1L, "z"), (7L, "m"), (9L, "b"))
      .foreach { case (s, t) => b.insert(s, t, 1L, 1L) }
    assert(b.sorted.map(t => (t.score, t.term)) ===
      Seq((9L, "a"), (9L, "b"), (7L, "m")))
  }

  test("term buffer: ties at the boundary break by byte-ascending term") {
    val b = new TermTopKBuffer(2)
    b.insert(4L, "foo", 1, 1); b.insert(4L, "bar", 1, 1); b.insert(4L, "baz", 1, 1)
    assert(b.sorted.map(_.term) === Seq("bar", "baz"))
  }

  test("term buffer: merge is a true k-bound across partial heaps") {
    val b1 = new TermTopKBuffer(3)
    Seq((10L, "p"), (6L, "q"), (2L, "r")).foreach { case (s, t) => b1.insert(s, t, 1, 1) }
    val b2 = new TermTopKBuffer(3)
    Seq((9L, "x"), (7L, "y"), (1L, "z")).foreach { case (s, t) => b2.insert(s, t, 1, 1) }
    assert(b1.mergeFrom(b2).sorted.map(_.score) === Seq(10L, 9L, 7L))
  }

  test("aggregator == sort.take(k) for random inputs under any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val n = 30 + rnd.nextInt(50)
      val k = 1 + rnd.nextInt(5)
      val nPart = 1 + rnd.nextInt(7)
      // distinct (group, term) identities so the oracle is unambiguous
      val data = Seq.tabulate(n) { i =>
        (rnd.nextInt(4), rnd.nextInt(10).toLong, s"t${i}_${rnd.nextInt(100)}",
          rnd.nextInt(9).toLong + 1, rnd.nextInt(9).toLong + 1)
      }
      val got = data.toDF("g", "score", "term", "tf", "df").repartition(nPart)
        .groupBy($"g")
        .agg(TopK.topTerms(k)($"score", $"term", $"tf", $"df").as("top"))
        .as[(Int, Seq[(Long, String, Long, Long)])]
        .collect().toMap
      val want = data.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3, r._4, r._5))
          .sortBy { case (s, t, _, _) => (-s, t) }.take(k)
      }
      assert(got.keySet === want.keySet, s"trial $trial")
      for (g <- want.keys) assert(got(g) === want(g), s"trial $trial group $g")
    }
  }

  test("topTerms: tf counts occurrences, df counts documents, score ranks") {
    import spark.implicits._
    // "rare" appears 3x in doc 1 only (tf=3, df=1 → score 3_000_000);
    // "common" appears in all 3 docs (df=3 → score ≤ 666_666);
    // "mid" in docs 1,2 (df=2)
    val docs = Seq(
      (1L, "rare rare rare common mid"),
      (2L, "common mid other"),
      (3L, "common x y z")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val d1 = out(1L)
    assert(d1.head._3 === "rare")
    assert(d1.head._4 === 3L) // tf
    assert(d1.head._5 === 1L) // df
    assert(d1.head._6 === 3000000L) // floor(1e6 * 3 / 1)
    // doc 3's best is one of its unique terms (df=1, tf=1 → 1_000_000),
    // tie broken by term bytes: "x" < "y" < "z"
    assert(out(3L).map(_._3) === Seq("x", "y"))
  }

  test("topTerms: rn is dense 1..k and every doc appears") {
    import spark.implicits._
    val docs = Seq.tabulate(20)(i => (i.toLong, s"w$i shared common t${i % 3}"))
      .toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, String, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length === 20)
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(rows => rows.map(_._2).sorted.toSeq == (1L to rows.length)))
  }
}
