package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // three users with 4-event series (take=4, segments=2 → 2-sum sketches):
  //   u1: 10,20,30,40 → (30, 70)
  //   u2: 10,20,31,41 → (30, 72)   (close to u1)
  //   u3: 90,90,90,90 → (180, 180) (far)
  //   u4: only 3 events → excluded by the completeness filter
  private lazy val events = Seq(
    (1L, ts(0), 1L, 10L), (1L, ts(1), 2L, 20L), (1L, ts(2), 3L, 30L), (1L, ts(3), 4L, 40L),
    (2L, ts(0), 5L, 10L), (2L, ts(1), 6L, 20L), (2L, ts(2), 7L, 31L), (2L, ts(3), 8L, 41L),
    (3L, ts(0), 9L, 90L), (3L, ts(1), 10L, 90L), (3L, ts(2), 11L, 90L), (3L, ts(3), 12L, 90L),
    (4L, ts(0), 13L, 50L), (4L, ts(1), 14L, 50L), (4L, ts(2), 15L, 50L)
  ).toDF("user_id", "ts", "event_id", "cents")

  test("paaSketch: hand-computed segment sums; short series excluded") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
        $"cents", take = 4, segments = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(sk === Set(
      (1L, 0L, 30L), (1L, 1L, 70L),
      (2L, 0L, 30L), (2L, 1L, 72L),
      (3L, 0L, 180L), (3L, 1L, 180L)))
  }

  test("similarSeries: exact integer distances, self excluded, nearest first") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val sim = TimeSeries.similarSeries(sk, "user_id", k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // d(u1,u2) = 0 + 2² = 4; d(u1,u3) = 150² + 110² = 34600
    assert(sim(1L) === Seq((2L, 4L), (3L, 34600L)))
    assert(sim(2L) === Seq((1L, 4L), (3L, 150L * 150L + 108L * 108L)))
    assert(sim(3L).head._1 != 3L) // never itself
    assert(!sim.contains(4L))     // incomplete series has no sketch
  }

  test("sketchVectors: seg-ordered integer vectors, shuffle-order-proof") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val vecs = TimeSeries.sketchVectors(sk, "user_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(vecs === Map(1L -> Seq(30L, 70L), 2L -> Seq(30L, 72L),
      3L -> Seq(180L, 180L)))
    val shuffled = TimeSeries.sketchVectors(sk.orderBy(rand(7)), "user_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(shuffled === vecs)
  }

  test("lshCandidatePairs: directed, self-free, and complete at a coarse grid") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val vecs = TimeSeries.sketchVectors(sk, "user_id")
    // width far above the value range -> every key in cell 0 or -1 on
    // each axis, and the ±1 probes bridge those -> all directed pairs
    val all = TimeSeries.lshCandidatePairs(vecs, segments = 2,
        planes = 2, tables = 2, widthCents = 1000000L)
      .as[(Long, Long)].collect().toSet
    assert(all === Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (2L, 3L), (3L, 2L)))
    assert(all.forall { case (a, b) => a != b })
  }

  test("similarSeries queries sample: only sampled keys ranked — against ALL other keys") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val full = TimeSeries.similarSeries(sk, "user_id", k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sampled = TimeSeries.similarSeries(sk, "user_id", k = 2,
        queries = Some(Seq(2L).toDF("qk")))
      .as[(Long, Long, Long, Long)].collect().toSet
    // the sampled run is exactly the full run restricted to key 2:
    // same neighbors, same exact distances (u2 still ranks against
    // BOTH u1 and u3, not just other sampled keys)
    assert(sampled === full.filter(_._1 == 2L))
    assert(sampled.map(_._3) === Set(1L, 3L))
  }

  test("lshCandidatePairs maxBucketWidth: flat-lined sketch cluster dropped from the index") {
    import org.apache.spark.sql.DataFrame
    // six identical sketches (every table's cell identical — the
    // flat-lined-series mega-cluster) next to one distinct close pair
    // far away in sketch space
    val vecs: DataFrame = ((10L to 15L).map(i => (i, Seq(0L, 0L))) ++
      Seq((1L, Seq(900000L, 900000L)), (2L, Seq(900010L, 900010L))))
      .toDF("id", "vec")
    val un = TimeSeries.lshCandidatePairs(vecs, segments = 2, planes = 2,
      tables = 2, widthCents = 1000L).as[(Long, Long)].collect().toSet
    assert(un.count { case (a, b) => a >= 10L && b >= 10L } === 30) // 6·5 directed
    assert(un.contains((1L, 2L)) && un.contains((2L, 1L)))
    val capped = TimeSeries.lshCandidatePairs(vecs, segments = 2, planes = 2,
      tables = 2, widthCents = 1000L, maxBucketWidth = Some(4))
      .as[(Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b) => a >= 10L && b >= 10L },
      s"sketch mega-cluster leaked through the cap: $capped")
    assert(capped.contains((1L, 2L)) && capped.contains((2L, 1L)))
  }

  test("similarSeriesLsh == similarSeries when the grid degenerates to one bucket") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val exact = TimeSeries.similarSeries(sk, "user_id", k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val lsh = TimeSeries.similarSeriesLsh(sk, "user_id", k = 2, segments = 2,
        planes = 2, tables = 2, widthCents = 1000000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("similarSeriesLsh at a fine grid returns a subset with exact distances") {
    val sk = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", take = 4, segments = 2)
    val exactDists = TimeSeries.similarSeries(sk, "user_id", k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    // width 50: u1/u2 (dist 4) collide or probe-bridge; u3 is 150+ cells
    // away on some axis — whatever comes back must carry EXACT distances
    val lsh = TimeSeries.similarSeriesLsh(sk, "user_id", k = 2, segments = 2,
        planes = 2, tables = 2, widthCents = 50L)
      .as[(Long, Long, Long, Long)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (ka, _, kb, dist) =>
      assert(exactDists((ka, kb)) === dist, s"pair ($ka,$kb)")
    }
    // ranks are contiguous from 1 per key
    lsh.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.length).toSeq)
    }
  }

  test("sketching is order-insensitive to input row order (total order comes from ts, id)") {
    val shuffled = events.orderBy(rand(42))
    val a = TimeSeries.paaSketch(events, "user_id", "ts", "event_id",
      $"cents", 4, 2).as[(Long, Long, Long)].collect().toSet
    val b = TimeSeries.paaSketch(shuffled, "user_id", "ts", "event_id",
      $"cents", 4, 2).as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }
}
