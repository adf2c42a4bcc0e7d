package graft.operators

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("buffer: insert keeps the k smallest by (dist, id)") {
    val b = new TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (0.5, 4L), (4.0, 5L))
      .foreach { case (d, i) => b.insert(d, i, i) }
    assert(b.sorted.map(n => (n.dist, n.id)) === Seq((0.5, 4L), (1.0, 2L), (3.0, 3L)))
  }

  test("buffer: merge is a true bound, not the reference's positional merge") {
    // The interleaved case that breaks Hadoop.java:208-235 (SURVEY §2 #9):
    // incoming [2,4,6] vs final [1,3,5] must yield [1,2,3], not [1,3,5].
    val b1 = new TopKBuffer(3)
    Seq(1.0, 3.0, 5.0).zipWithIndex.foreach { case (d, i) => b1.insert(d, i.toLong, i.toLong) }
    val b2 = new TopKBuffer(3)
    Seq(2.0, 4.0, 6.0).zipWithIndex.foreach { case (d, i) => b2.insert(d, 10L + i, i.toLong) }
    assert(b1.mergeFrom(b2).sorted.map(_.dist) === Seq(1.0, 2.0, 3.0))
  }

  test("buffer: ties at the k boundary break by smaller id (deterministic)") {
    val b = new TopKBuffer(2)
    b.insert(1.0, 7L, 0); b.insert(1.0, 3L, 0); b.insert(1.0, 5L, 0)
    assert(b.sorted.map(_.id) === Seq(3L, 5L))
  }

  test("aggregator == sort.take(k) for random inputs under any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 10) {
      val n = 30 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      val nPart = 1 + rnd.nextInt(7)
      // distinct (dist, id) identities so the oracle is unambiguous
      val data = Seq.tabulate(n) { i =>
        (rnd.nextInt(4), rnd.nextInt(20).toDouble, i.toLong, rnd.nextInt(5).toLong)
      }
      val got = data.toDF("g", "dist", "id", "label").repartition(nPart)
        .groupBy($"g")
        .agg(TopK.topK(k)($"dist", $"id", $"label").as("nbrs"))
        .as[(Int, Seq[(Double, Long, Long)])]
        .collect().toMap
      val want = data.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3, r._4)).sortBy(r => (r._1, r._2)).take(k)
      }
      assert(got.keySet === want.keySet, s"trial $trial")
      for (g <- want.keys)
        assert(got(g) === want(g), s"trial $trial group $g k=$k parts=$nPart")
    }
  }
}
