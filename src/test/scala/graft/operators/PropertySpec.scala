package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative (ScalaCheck) properties for the driver-side cores of the
  * custom aggregation buffers — the pieces whose correctness must hold
  * under ARBITRARY partitionings and merge orders, which example-based
  * specs can only sample. Pure JVM: no Spark jobs, hundreds of cases
  * per property.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // --- TopKBuffer: bounded heap ≡ global sort-take under any split ----

  private val neighborGen: Gen[(Double, Long)] = for {
    d <- Gen.chooseNum(0.0, 100.0)
    id <- Gen.chooseNum(0L, 50L) // small id range → frequent (dist,id) ties
  } yield (d, id)

  test("TopKBuffer: arbitrary items, k, and split points ≡ sorted.take(k)") {
    val gen = for {
      items <- Gen.listOf(neighborGen)
      k <- Gen.chooseNum(1, 12)
      splits <- Gen.listOf(Gen.chooseNum(0, math.max(items.size, 1)))
    } yield (items, k, splits)
    check(Prop.forAll(gen) { case (items, k, splits) =>
      // partition the stream at the (sorted, deduped) split points and
      // build one buffer per slice, then fold-merge in order
      val cuts = (splits.filter(_ <= items.size).sorted.distinct :+ items.size)
        .distinct.sorted
      val slices = (0 +: cuts).zip(cuts).map { case (a, b) => items.slice(a, b) }
      val merged = slices.map { sl =>
        val b = new TopKBuffer(k)
        sl.foreach { case (d, id) => b.insert(d, id, id) }
        b
      }.reduceLeft(_.mergeFrom(_))
      val got = merged.sorted.map(n => (n.dist, n.id))
      val want = items.sortBy { case (d, id) => (d, id) }.take(k)
      got == want
    })
  }

  // --- CdcChunksExpr: fused native loop ≡ plain-Scala reference ------

  /** Reference model of [[graft.functions.CdcChunksExpr]]: sequential
    * chunk build with an O(w) window hash at each candidate boundary. */
  private def cdcRef(hs: Array[Long], w: Int, d: Int): Seq[Long] = {
    val P = 1000000007L
    if (hs.isEmpty) return Nil
    val out = Seq.newBuilder[Long]
    var fp = 0L; var len = 0L
    for (i <- hs.indices) {
      fp = (fp * 31L + hs(i)) % P; len += 1
      if (i >= w - 1 && i < hs.length - 1) {
        var g = 0L
        for (k <- (i - w + 1) to i) g = (g * 131L + hs(k)) % P
        if (g % d == 0) { out += ((fp << 32) | len); fp = 0L; len = 0L }
      }
    }
    out += ((fp << 32) | len)
    out.result()
  }

  test("CdcChunksExpr: eval ≡ reference for arbitrary hash arrays and (window, divisor)") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val gen = for {
      hs <- Gen.listOf(Gen.chooseNum(0L, 1000000006L))
      w <- Gen.chooseNum(2, 8)
      d <- Gen.chooseNum(2, 16)
    } yield (hs.toArray, w, d)
    check(Prop.forAll(gen) { case (hs, w, d) =>
      val expr = graft.functions.CdcChunksExpr(Literal(1L), w, d)
      val got = expr.nullSafeEval(new GenericArrayData(hs.map(x => x: Any)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      val want = cdcRef(hs, w, d)
      // packed contract: identical chunks AND lengths repartition n
      got == want && got.map(_ % 4294967296L).sum == hs.length.toLong
    })
  }

  // --- MgBuffer: Misra–Gries guarantees under any split --------------

  private val streamGen: Gen[List[String]] = Gen.listOf(
    Gen.frequency(
      (5, Gen.const("hot")),
      (3, Gen.oneOf("w1", "w2", "w3")),
      (2, Gen.chooseNum(0, 500).map(i => s"r$i")))) // long singleton tail

  test("MgBuffer: est ≤ true, true − est ≤ n/(k+1), heavy items tracked — any split") {
    val gen = for {
      stream <- streamGen
      k <- Gen.chooseNum(1, 10)
      nSplits <- Gen.chooseNum(1, 6)
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield (stream, k, nSplits, seed)
    check(Prop.forAll(gen) { case (stream, k, nSplits, seed) =>
      val rnd = new scala.util.Random(seed)
      val slices = stream.groupBy(_ => rnd.nextInt(nSplits)).values.toList
      val merged = slices.map { sl =>
        val b = new MgBuffer(k)
        sl.foreach(b.add)
        b
      } match {
        case Nil => new MgBuffer(k)
        case h :: t => t.foldLeft(h)(_.mergeWith(_))
      }
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = stream.length
      val bound = n / (k + 1)
      val est = merged.result.map(f => f.item -> f.est).toMap
      val lower = est.forall { case (i, e) => e <= exact(i) }
      val withinBound = est.forall { case (i, e) => exact(i) - e <= bound }
      val heavyTracked = exact.forall { case (i, c) =>
        c <= bound || est.contains(i)
      }
      lower && withinBound && heavyTracked && merged.result.size <= k
    })
  }

  // --- Z-order spread algebra: mask-shift ≡ bit-by-bit interleave ----

  test("z-value mask-shift algebra ≡ bit-by-bit interleave for arbitrary longs") {
    // the same 4-step spread both Layout.zValue (Column) and the SQL
    // z_value builder compose; validated here as pure integer algebra
    def spread(x0: Long): Long = {
      val m0 = x0 & 0xFFFFL
      val m1 = (m0 | (m0 << 8)) & 0x00FF00FFL
      val m2 = (m1 | (m1 << 4)) & 0x0F0F0F0FL
      val m3 = (m2 | (m2 << 2)) & 0x33333333L
      (m3 | (m3 << 1)) & 0x55555555L
    }
    def zAlg(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
    def zRef(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val gen = for {
      a <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      zAlg(a, b) == zRef(a & 0xFFFFL, b & 0xFFFFL)
    }, min = 500)
  }
}
