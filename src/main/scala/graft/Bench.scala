package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line
  * `{"metric":"total","value":…,"queries":{…},"failed":[…],"sf":…}`.
  *
  * Env knobs:
  *  - SPARK_GRAFT_CPUS: local worker threads (default: all cores).
  *  - SPARK_GRAFT_ONLY=q17,q18_minhash_lsh: time a subset; entries match
  *    a full query name or a `_`-delimited prefix ("q17" → "q17_…").
  *  - SPARK_GRAFT_WARMUP=1: run the selected set once untimed first
  *    (JIT/codegen warm-up; default off so recorded numbers are honest
  *    cold runs).
  *
  * A failed query is reported with a *negative* elapsed time in
  * `queries` and its name in `failed`, and is excluded from `value` —
  * a crash can't masquerade as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = GraftSession.local(cpus, "graft-bench")
    def selected(name: String): Boolean =
      only.forall(_.exists(p => name == p || name.startsWith(p + "_")))
    val picked = SparkEntry.queries.filter { case (n, _) => selected(n) }
      .toSeq.sortBy(_._1)

    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      // noop sink: forces full materialization of every output column
      // (a bare count() would let Catalyst prune the projections away
      // and under-measure scan/transform queries)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }

    if (sys.env.get("SPARK_GRAFT_WARMUP").exists(_ == "1")) {
      picked.foreach { case (name, fn) => runOnce(name, fn); spark.catalog.clearCache() }
    }

    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = runOnce(name, fn)
      val dt = (System.nanoTime() - t0) / 1e9
      // drop per-query state (broadcasts, cached relations) so later
      // queries aren't timed under earlier queries' memory pressure
      spark.catalog.clearCache()
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -v) }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
