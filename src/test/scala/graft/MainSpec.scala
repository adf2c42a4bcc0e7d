package graft

import scala.io.Source
import scala.util.Using

/** End-to-end runs of the reference-parity CLI pipeline on all three
  * shipped dataset tiers (`run-hadoop-{small,medium,large}.sh`, k=3).
  *
  * The reference published accuracy only implicitly for the small tier
  * (its checked-in predictions file → 0.85); medium/large accuracies
  * below were measured once with the byte-parity `legacyVote` pipeline
  * and recorded in BASELINE.md as this project's goldens.
  */
class MainSpec extends SparkSpec {

  private val data = "/root/reference/datasets"

  private def tier(name: String): (Long, Double) = {
    val out = java.nio.file.Files.createTempDirectory(s"preds_$name").toString + "/p"
    Main.run(spark, s"$data/$name-train.arff", s"$data/$name-test.arff",
      k = 3, outDir = out, legacyVote = true)
  }

  test("small tier: accuracy 0.85 and byte-identical predictions (golden)") {
    val out = java.nio.file.Files.createTempDirectory("preds_small").toString + "/p"
    val (_, acc) = Main.run(spark, s"$data/small-train.arff",
      s"$data/small-test.arff", 3, out)
    assert(acc === 0.85)
    val part = new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).get
    val got = Using.resource(Source.fromFile(part))(_.mkString)
    val golden = Using.resource(
      Source.fromFile("/root/reference/predictions/part-r-00000"))(_.mkString)
    assert(got === golden)
  }

  test("medium tier: accuracy 96/370 (recorded golden, BASELINE.md)") {
    val (_, acc) = tier("medium")
    assert(acc === 96.0 / 370.0)
  }

  test("large tier: accuracy 1709/1718 (recorded golden, BASELINE.md)") {
    val (_, acc) = tier("large")
    assert(acc === 1709.0 / 1718.0)
  }
}
