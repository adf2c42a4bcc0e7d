package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(10000).select($"id".as("k"))

  test("bucket: deterministic across runs, bounded, roughly uniform") {
    val a = df.select($"k", Sampling.bucket($"k", 10).as("b")).as[(Long, Long)].collect()
    val b = df.select($"k", Sampling.bucket($"k", 10).as("b")).as[(Long, Long)].collect()
    assert(a.toMap === b.toMap, "same key must always hash to the same bucket")
    assert(a.forall { case (_, bk) => bk >= 0 && bk < 10 })
    val counts = a.groupBy(_._2).view.mapValues(_.size)
    // multiplicative hash over a prime: each bucket within ±30% of 1000
    assert(counts.values.forall(c => c > 700 && c < 1300), counts.toMap)
  }

  test("splitTag: train fraction ~ trainBuckets/buckets, assignment stable") {
    val tags = df.select($"k", Sampling.splitTag($"k", 10, 8).as("t"))
      .as[(Long, String)].collect()
    val train = tags.count(_._2 == "train")
    assert(train > 7500 && train < 8500, s"train=$train of 10000")
    // sample == the train side of the tagging, by construction
    val sampled = Sampling.deterministicSample(df.toDF(), "k", 10, 8)
      .as[Long].collect().toSet
    assert(sampled === tags.filter(_._2 == "train").map(_._1).toSet)
  }

  test("bucket is total: extreme long keys match a BigInt reference, no wraparound") {
    val P = BigInt(1000000007L)
    def ref(key: Long, buckets: Int): Long = {
      def pm(x: BigInt): BigInt = ((x % P) + P) % P
      val h = pm(pm((BigInt(key) % P + 1) * BigInt(2654435761L)) * BigInt(2246822519L))
      (((h % buckets) + buckets) % buckets).toLong
    }
    val keys = Seq(Long.MaxValue, Long.MinValue, Long.MaxValue - 1,
      -3500000000L, 3500000000L, 0L, -1L, 42L)
    val got = keys.toDF("k")
      .select($"k", Sampling.bucket($"k", 10).as("b")).as[(Long, Long)].collect().toMap
    keys.foreach { k =>
      assert(got(k) === ref(k, 10), s"key $k diverges from exact-arithmetic reference")
    }
  }

  test("stratifiedSample: exactly n per group, deterministic, ≡ the window formulation") {
    val data = spark.range(5000)
      .select(($"id" % 7).as("g"), $"id".as("k"))
    val got = Sampling.stratifiedSample(data.toDF(), "g", "k", n = 50)
      .as[(Long, Long, Long)].collect()
    // exactly n rows per group, rn densely 1..n
    val byG = got.groupBy(_._1)
    assert(byG.keySet === (0L until 7L).toSet)
    byG.foreach { case (g, rows) =>
      assert(rows.length === 50, s"group $g")
      assert(rows.map(_._3).sorted.toSeq === (1L to 50L), s"group $g ranks")
    }
    // deterministic across runs
    val again = Sampling.stratifiedSample(data.toDF(), "g", "k", n = 50)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === again.toSet)
    // the bounded-heap path must equal the (scale-unsafe) window twin
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g")
      .orderBy(Sampling.bucket($"k", 1000003).asc, $"k".asc)
    val twin = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 50).select($"g", $"k", $"rn".cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === twin.toSet)
    // a group smaller than n yields its full membership
    val tiny = spark.range(30).select(lit(0L).as("g"), $"id".as("k")).toDF()
    assert(Sampling.stratifiedSample(tiny, "g", "k", n = 50).count() === 30)
  }

  test("stratifiedSample: non-integral key fails loudly at plan time") {
    val data = spark.range(10)
      .select(($"id" % 2).as("g"), ($"id" * 1.5).as("k")).toDF()
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(data, "g", "k", n = 3)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("consecutive ids do not land in consecutive buckets (hash, not modulo)") {
    val firstTen = df.filter($"k" < 10)
      .select(Sampling.bucket($"k", 10)).as[Long].collect().toSeq
    assert(firstTen.toSet.size > 5, s"0..9 collapsed to $firstTen — looks like plain modulo")
    assert(firstTen !== (0L to 9L), "must not be the identity assignment")
  }

  test("weightedMix: weight 0 drops all, 1e6 keeps all, default for unlisted groups") {
    val df = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val weights = Map("g0" -> 1000000L, "g1" -> 0L)
    val kept = Sampling.weightedMix(df, "id", "grp", weights, defaultPpm = 500000L)
      .as[(Long, String)].collect()
    val byG = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byG.getOrElse("g0", 0) === 1000) // weight 1e6: every row
    assert(!byG.contains("g1"))             // weight 0: none
    val g2 = byG.getOrElse("g2", 0)         // default 0.5: binomial around 500
    assert(g2 > 350 && g2 < 650, s"default-rate group kept $g2 of 1000")
  }

  test("weightedMix: deterministic across runs and independent of group label") {
    val df = (0L until 2000L).map(i => (i, if (i < 1000) "a" else "b")).toDF("id", "grp")
    val w = Map("a" -> 300000L, "b" -> 300000L)
    val once = Sampling.weightedMix(df, "id", "grp", w, 0L)
      .select("id").as[Long].collect().toSet
    val again = Sampling.weightedMix(df, "id", "grp", w, 0L)
      .select("id").as[Long].collect().toSet
    assert(once === again)
    // the draw hashes the id only: the same id would survive under any
    // group label at equal weight (uniformity is within-group by
    // construction)
    val relabeled = Sampling.weightedMix(
      df.withColumn("grp", lit("a")), "id", "grp", w, 0L)
      .select("id").as[Long].collect().toSet
    assert(once === relabeled)
  }

  test("rebalanceRatiosPpm: every group's ppm targets the smallest group's count") {
    // groups of 100 / 200 / 400 → min 100 → ppm 1e6 / 500000 / 250000
    val df = ((0L until 100L).map((_, "small")) ++
      (100L until 300L).map((_, "mid")) ++
      (300L until 700L).map((_, "big"))).toDF("id", "grp")
    val r = Sampling.rebalanceRatiosPpm(df, "grp")
      .as[(String, Long, Long)].collect()
      .map { case (g, n, p) => g -> ((n, p)) }.toMap
    assert(r === Map("small" -> ((100L, 1000000L)),
      "mid" -> ((200L, 500000L)), "big" -> ((400L, 250000L))))
    // composing with weightedMix-style admission lands near the target
    val ratios = Sampling.rebalanceRatiosPpm(df, "grp")
    val kept = df.join(ratios, "grp")
      .filter(Sampling.bucket(col("id"), 1000000) < col("keep_ppm"))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 100L) // ppm 1e6 keeps everything
    assert(kept("mid") > 60L && kept("mid") < 140L, kept.toString)
    assert(kept("big") > 60L && kept("big") < 140L, kept.toString)
  }

  test("rebalanceRatiosPpm: floor arithmetic is exact integer (no FP drift)") {
    // 3 / 7 groups: ppm = floor(3e6/7) = 428571
    val df = ((0L until 3L).map((_, "a")) ++ (3L until 10L).map((_, "b")))
      .toDF("id", "grp")
    val r = Sampling.rebalanceRatiosPpm(df, "grp")
      .as[(String, Long, Long)].collect()
      .map { case (g, _, p) => g -> p }.toMap
    assert(r === Map("a" -> 1000000L, "b" -> 428571L))
  }
}
