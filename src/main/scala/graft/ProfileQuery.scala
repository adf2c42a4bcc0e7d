package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query profiling harness for the optimization rounds (guide §1):
  * separates CONSTRUCTION time (query-fn call — artifact ensures,
  * driver-side Lloyd collects, candidate collects) from EXECUTION time
  * (the noop-sink write of the returned frame), logs every Spark job
  * with its wall time and description, and dumps `explain("formatted")`
  * to `plans/<tag>/<query>_<tag>.txt`.
  *
  * Usage: `sbt "runMain graft.ProfileQuery q162 q163"` with the usual
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env; SPARK_GRAFT_PLAN_TAG
  * names the plans subdir/suffix (default "profile", not committed).
  * Each query runs `SPARK_GRAFT_REPEAT` passes (default 2) so pass 2+
  * shows the warm-artifact cost the bench's per-query min reflects.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.trim.toInt)
      .filter(_ >= 1).getOrElse(2)
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "profile")
    val spark = GraftSession.local(cpus, "graft-profile")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    @volatile var jobLog = List.empty[(Int, String, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (desc, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          val dt = (System.nanoTime() - t0) / 1e9
          jobLog ::= ((je.jobId, desc, dt))
          System.err.println(f"[prof-job] id=${je.jobId}%3d ${dt}%7.3fs $desc")
        }
      }
      // per-stage: where inside a job the wall goes — scheduler-side
      // duration vs summed executor task run time vs task count
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        System.err.println(
          f"[prof-stage] stage=${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=$wall%6.3fs runSum=${si.taskMetrics.executorRunTime / 1e3}%6.3fs " +
            f"cpuSum=${si.taskMetrics.executorCpuTime / 1e9}%6.3fs " +
            f"deserSum=${si.taskMetrics.executorDeserializeTime / 1e3}%6.3fs ${si.name.take(60)}")
      }
    })

    val picked = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(p => n == p || n.startsWith(p + "_"))
    }
    // Fixed-floor decomposition (round-21): per pass, how much of the
    // wall went to whole-stage-codegen JANINO COMPILES (cache misses in
    // CodeGenerator.cache — count and mean ms from the codahale
    // histogram) vs Spark JOBS (sum of job walls; overlapping jobs
    // under-attribute, fine for tail queries which run 1-3 sequential
    // jobs) vs the analyzer/optimizer/planner phases of the BUILD-side
    // QueryExecution (tracker phases; the exec-side write plans its own
    // QueryExecution whose phases land in the unattributed remainder).
    import org.apache.spark.metrics.source.CodegenMetrics
    def compiles(): (Long, Double) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getMean)
    }
    picked.foreach { case (name, fn) =>
      (1 to repeat).foreach { pass =>
        val (c0, _) = compiles()
        val jobs0 = jobLog.map(_._3).sum
        spark.sparkContext.setJobDescription(s"$name pass$pass build")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"$name pass$pass exec")
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        spark.catalog.clearCache()
        val (c1, cMean) = compiles()
        val jobs1 = jobLog.map(_._3).sum
        val phases = df.queryExecution.tracker.phases
          .map { case (p, s) => f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.3fs" }
          .mkString(" ")
        System.err.println(
          f"[prof] $name pass$pass build=${(t1 - t0) / 1e9}%.3fs " +
            f"exec=${(t2 - t1) / 1e9}%.3fs total=${(t2 - t0) / 1e9}%.3fs " +
            f"codegenCompiles=${c1 - c0} (mean ${cMean}%.0fms) " +
            f"jobSum=${jobs1 - jobs0}%.3fs buildPhases: $phases")
        if (pass == repeat) {
          val dir = java.nio.file.Paths.get(s"plans/$tag")
          java.nio.file.Files.createDirectories(dir)
          val out = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"${name}_$tag.txt"),
            out.getBytes("UTF-8"))
        }
      }
    }
    spark.stop()
  }
}
