package graft.operators

import graft.SparkSpec

/** [[Pq.fitRerankCalibration]] / the versioned calibration artifact
  * (round-16 verdict #2): the fit reproduces the BASELINE recipe's
  * numbers from the canonical grid, the artifact round-trips the
  * constants bit-exactly, and a deployment re-fit moves the sized
  * widths WITHOUT a source edit. */
class CalibrationSpec extends SparkSpec {

  private val canonicalGrid = Seq(
    (50L, 921600L, 255L), (400L, 921600L, 563L),
    (50L, 3686400L, 184L), (400L, 3686400L, 455L))

  test("fit of the canonical grid: known constants, same widths as the shipped defaults") {
    val fit = Pq.fitRerankCalibration(canonicalGrid)
    // the closed-form fit, micro-floored (cross-checked against an
    // independent DuckDB evaluation of the same fixed-order arithmetic)
    assert(math.floor(fit.c * 1e6).toLong == 726140L, fit)
    assert(math.floor(fit.beta * 1e6).toLong == 408133L, fit)
    assert(math.floor(fit.gamma * 1e6).toLong == 194514L, fit)
    // the fitted constants differ from the shipped hand-rounded
    // defaults in the 4th decimal; the elected widths agree at 921k
    // (280) and differ by ONE candidate at 3.69M (541 vs 540 — the
    // shipped constants' raw solution is 539.97, a hair under the
    // boundary the fit's lands a hair over; recall-immaterial: the
    // out-of-sample run measured 0.509 against the 0.500 target
    // there). q182 keeps the shipped defaults, so its gate rows are
    // untouched; deployments re-fit through the artifact.
    val shipped = Pq.RerankCalibration()
    assert(Pq.sizeRerankWidth(921600L, 500L, calib = fit) == 280L)
    assert(Pq.sizeRerankWidth(921600L, 500L, calib = shipped) == 280L)
    assert(Pq.sizeRerankWidth(3686400L, 500L, calib = fit) == 541L)
    assert(Pq.sizeRerankWidth(3686400L, 500L, calib = shipped) == 540L)
  }

  test("artifact round-trip is bit-exact; a re-fit moves the dial without a source edit") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_calib_spec"
    val published = Pq.publishRerankCalibration(spark, canonicalGrid, path)
    val read = Pq.readRerankCalibration(spark, path)
    assert(read == published, "parquet must round-trip the doubles bit-exactly")
    // a different deployment's grid (easier corpus: higher recalls)
    // fits different constants and elects a NARROWER width — the
    // re-fit loop works end to end with no source edit
    val easier = canonicalGrid.map { case (w, n, r) =>
      (w, n, math.min(1000L, r + 200L)) }
    val path2 = s"${sys.props("java.io.tmpdir")}/graft_calib_spec2"
    Pq.publishRerankCalibration(spark, easier, path2)
    val refit = Pq.readRerankCalibration(spark, path2)
    assert(refit != read)
    assert(Pq.sizeRerankWidth(921600L, 500L, calib = refit) <
      Pq.sizeRerankWidth(921600L, 500L, calib = read),
      "uniformly higher measured recall must shrink the sized width")
  }

  test("the fit rejects non-factorial grids with actionable messages") {
    intercept[IllegalArgumentException] {
      Pq.fitRerankCalibration(canonicalGrid.take(3))
    }
    intercept[IllegalArgumentException] { // 3 widths × sizes mix
      Pq.fitRerankCalibration(Seq((50L, 921600L, 255L),
        (100L, 921600L, 300L), (400L, 921600L, 563L),
        (50L, 3686400L, 184L)))
    }
    intercept[IllegalArgumentException] { // repeated point
      Pq.fitRerankCalibration(Seq((50L, 921600L, 255L),
        (50L, 921600L, 256L), (400L, 921600L, 563L),
        (400L, 3686400L, 455L)))
    }
    intercept[IllegalArgumentException] { // recall out of milli range
      Pq.fitRerankCalibration(canonicalGrid.map {
        case (w, n, _) => (w, n, 1001L) })
    }
  }
}
