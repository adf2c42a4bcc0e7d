package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(FrequentItems.misraGries(k)($"item").as("s"))
      .select(explode($"s").as("fi"))
      .select($"fi.item", $"fi.est").as[(String, Long)]
      .collect().toMap

  test("exact regime: distinct ≤ k reproduces exact counts under any partitioning") {
    val stream = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c")
    val exact = Map("a" -> 40L, "b" -> 25L, "c" -> 9L)
    for (parts <- Seq(1, 4, 13))
      assert(sketch(scala.util.Random.shuffle(stream), k = 8, parts) === exact)
  }

  test("eviction regime: estimates are lower bounds within n/(k+1); heavy items tracked") {
    // n = 100, k = 4 → error bound 20; "a" (35) and "b" (25) exceed it
    val stream = scala.util.Random.shuffle(
      Seq.fill(35)("a") ++ Seq.fill(25)("b") ++
        (0 until 40).map(i => s"x$i")) // 40 singletons force evictions
    val n = stream.length
    val bound = n / (4 + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (parts <- Seq(1, 8)) {
      val s = sketch(stream, k = 4, parts)
      assert(s.size <= 4)
      for ((item, est) <- s) {
        assert(est <= exact(item), s"$item overestimated: $est > ${exact(item)}")
        assert(exact(item) - est <= bound, s"$item below bound: $est vs ${exact(item)}")
      }
      // anything with true count > n/(k+1) must still be tracked
      assert(s.contains("a") && s.contains("b"), s"heavy hitters lost: ${s.keys}")
    }
  }

  test("merge reduction: skewed partials collapse to ≤ k items, bounds hold") {
    // each partition sees a disjoint singleton flood plus the shared
    // heavy item — merge must reconcile sketches with disjoint key sets
    val stream = (0 until 8).flatMap { p =>
      Seq.fill(30)("hot") ++ (0 until 10).map(i => s"p${p}_$i")
    }
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val s = sketch(stream, k = 6, parts = 8)
    val bound = stream.length / (6 + 1)
    assert(s.size <= 6)
    for ((item, est) <- s) {
      assert(est <= exact(item))
      assert(exact(item) - est <= bound)
    }
    assert(s.contains("hot")) // 240 of 320 — far above every bound
  }

  test("single element and empty input") {
    assert(sketch(Seq("only"), k = 3, parts = 2) === Map("only" -> 1L))
    val empty = Seq.empty[String].toDF("item")
      .agg(FrequentItems.misraGries(3)($"item").as("s"))
      .select(size($"s")).as[Int].head()
    assert(empty === 0)
  }
}
