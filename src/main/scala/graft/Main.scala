package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Knn
import graft.sources.Arff

/** Reference-invocation CLI parity. The reference engine runs as
  * `hadoop jar … Hadoop <train.arff> <test.arff> <k> <outDir>`
  * (`/root/reference/src/main/java/Hadoop.java:277-281`, tiers in
  * `run-hadoop-{small,medium,large}.sh`) and prints exactly
  * `It took <ms> ms and results have an accuracy of <acc>`
  * (`Hadoop.java:344`). This main takes the same four arguments,
  * writes the same tab-separated single-part prediction file, and
  * prints the same summary line — the drop-in entry point for a user
  * porting off the reference.
  *
  * Vote semantics: `GRAFT_LEGACY_VOTE=0` switches to the correct
  * plurality vote; the default reproduces the reference's off-by-one
  * vote (`Hadoop.java:250-268`) so the small tier's golden prediction
  * file comes out byte-for-byte identical (KnnGoldenSpec).
  */
object Main {

  /** The pipeline behind [[main]], reusable on an existing session
    * (specs use the shared test session; `main` builds and stops its
    * own). Returns (elapsedMs, accuracy); predictions land in `outDir`
    * as `part-*.csv` (tab-separated `id\tprediction`, ascending id).
    */
  def run(
      spark: SparkSession,
      trainPath: String,
      testPath: String,
      k: Int,
      outDir: String,
      legacyVote: Boolean = true): (Long, Double) = {
    val train = Arff.readLabeled(spark, trainPath)
    val test = Arff.readLabeled(spark, testPath)
    // time the job like the reference does (Hadoop.java:310-316): the
    // classify+write, not the driver-side header parsing
    val t0 = System.nanoTime()
    val preds = Knn.classify(train, test, k,
      trainId = "id", testId = "id",
      trainVec = "features", testVec = "features",
      labelCol = "label", legacyVote = legacyVote)
    Knn.writePredictions(preds, outDir)
    val ms = (System.nanoTime() - t0) / 1000000L
    // accuracy from the WRITTEN file, like the reference
    // (Hadoop.java:319-343) — `preds` is a lazy plan, and scoring it
    // directly would re-run the whole classify a second time
    val written = spark.read
      .option("sep", "\t")
      .schema("test_id LONG, prediction LONG")
      .csv(outDir)
    val Array(correct, total) =
      Knn.accuracy(written, test, "id", "label").collect()
        .map(r => Array(r.getLong(0), r.getLong(1))).head
    (ms, correct.toDouble / total)
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println("Usage: graft.Main datasets/train.arff datasets/test.arff k output")
      sys.exit(2)
    }
    val k = args(2).toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val legacy = !sys.env.get("GRAFT_LEGACY_VOTE").contains("0")
    val spark = GraftSession.local(cpus, "graft-knn")
    val (ms, acc) = run(spark, args(0), args(1), k, args(3), legacy)
    // exact reference format, Hadoop.java:344
    println(s"It took $ms ms and results have an accuracy of $acc")
    spark.stop()
  }
}
