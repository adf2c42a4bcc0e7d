package graft

/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints the
  * query's formatted plan after an AQE-finalizing execution — the tool
  * behind the repo's "explain, then iterate" discipline (scan pushdown,
  * join strategy, partial aggregation, exchange keys are all judged on
  * the EXECUTED plan, not the initial one).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus, "graft-explain")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query $name; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    // collect() drives THIS DataFrame's QueryExecution so the adaptive
    // plan mutates to its final form (a noop write would finalize a
    // separate execution and leave this one isFinalPlan=false)
    df.collect()
    println(s"=== $name @ $sfDir (executed) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
