package graft.operators

import graft.SparkSpec
import graft.sources.Arff

import scala.io.Source
import scala.util.Using

/** End-to-end parity with the reference's checked-in golden run:
  * small-train + small-test, k=3 → predictions/part-r-00000
  * (run-hadoop-small.sh; BASELINE.md: accuracy 0.85 = 68/80,
  * prediction distribution {0: 76, 7: 4}).
  *
  * `legacyVote = true` reproduces the reference's off-by-one vote
  * (Hadoop.java:250-268); the default correct plurality vote must score
  * at least as well (the -1 defaults disappear).
  */
class KnnGoldenSpec extends SparkSpec {

  private lazy val train = Arff.readLabeled(spark, "/root/reference/datasets/small-train.arff")
  private lazy val testDf = Arff.readLabeled(spark, "/root/reference/datasets/small-test.arff")

  private def predict(legacy: Boolean): Map[Long, Long] =
    Knn.classify(train, testDf, k = 3,
        trainId = "id", testId = "id",
        trainVec = "features", testVec = "features",
        labelCol = "label", legacyVote = legacy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val golden: Map[Long, Long] =
    Using.resource(Source.fromFile("/root/reference/predictions/part-r-00000")) {
      _.getLines().map { l =>
        val Array(i, p) = l.split("\t"); i.toLong -> p.toLong
      }.toMap
    }

  private lazy val truth: Map[Long, Long] =
    testDf.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("legacyVote reproduces the golden predictions byte-for-byte") {
    val got = predict(legacy = true)
    assert(got.size === 80)
    val diffs = golden.collect { case (i, p) if got(i) != p => (i, p, got(i)) }
    assert(diffs.isEmpty, s"mismatches (id, golden, got): $diffs")
  }

  test("golden accuracy is 68/80 = 0.85 (BASELINE.md)") {
    val correct = golden.count { case (i, p) => truth(i) == p }
    assert(correct === 68)
  }

  test("writePredictions emits the golden file byte-for-byte (full reference pipeline)") {
    val out = java.nio.file.Files.createTempDirectory("preds").toString + "/preds"
    val preds = Knn.classify(train, testDf, k = 3,
      trainId = "id", testId = "id",
      trainVec = "features", testVec = "features",
      labelCol = "label", legacyVote = true)
    Knn.writePredictions(preds, out)
    val part = new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).get
    val got = Using.resource(Source.fromFile(part))(_.mkString)
    val golden = Using.resource(
      Source.fromFile("/root/reference/predictions/part-r-00000"))(_.mkString)
    assert(got === golden)
  }

  test("correct plurality vote scores at least the legacy 0.85") {
    val got = predict(legacy = false)
    val correct = got.count { case (i, p) => truth(i) == p }
    assert(correct >= 68, s"correct-vote accuracy $correct/80 below golden 68/80")
    assert(got.valuesIterator.forall(_ >= 0), "correct vote never emits -1")
  }
}
