package graft

/** BPE trainer round-count scaling harness (judge round-11 item 5):
  * measures `Bpe.train` wall-clock at increasing round counts over
  * SPARK_GRAFT_SF_DIR's documents table, printing one JSON line
  * `{"metric":"bpe_rounds","points":{"3":s,...},"sf":…}`.
  *
  * What it isolates: each merge round pays (a) one vocab-bounded
  * pair-stats agg + 1-row collect (the winner must parametrize the
  * next round's expression) and (b) one per-row array fold +
  * localCheckpoint over the word table. The corpus is scanned exactly
  * once (wordTable); rounds never touch it again — so the per-round
  * cost is flat in CORPUS size and the question is purely how the
  * driver round-trip + checkpoint overhead accumulates with rounds.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.BpeBench [rounds…]"`
  * (default points: 3 10 25 50).
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val points = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(3, 10, 25, 50)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-bpe-bench")
    val docs = Tables.load(spark, sfDir, "documents")
    val times = points.map { r =>
      val words = operators.Bpe.wordTable(docs, "text")
      val t0 = System.nanoTime()
      val (merges, _) = operators.Bpe.train(words, rounds = r)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (r, dt, merges.size)
    }
    val pts = times.map { case (r, dt, m) => s""""$r":${f"$dt%.3f"}""" }
      .mkString("{", ",", "}")
    val merged = times.map { case (r, _, m) => s""""$r":$m""" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"bpe_rounds","unit":"sec","points":$pts,"merges":$merged,"sf":"$sfDir"}""")
  }
}
