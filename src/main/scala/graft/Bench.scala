package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line
  * `{"metric":"total","value":…,"queries":{…},"failed":[…],"runs":N,"sf":…}`.
  *
  * Output discipline: the round driver keeps only the last ~2 KB of
  * combined output, so the stdout line uses COMPACT keys (`"q43"`, the
  * `_`-stripped prefix) and 3-decimal seconds, and is printed LAST
  * (after `spark.stop()`, so no log line can land behind it). The
  * full-precision record with full query names goes to
  * SPARK_GRAFT_BENCH_OUT (default `./BENCH_LOCAL.json`).
  *
  * Noise discipline: the host is shared (the round driver runs its own
  * jobs), and multi-minute load bursts hit random spans of the query
  * list — the same query swings 3 s ↔ 34 s between runs with zero JVM
  * resource pressure (instrumented: code cache, metaspace, heap, GC all
  * flat). So the bench executes `SPARK_GRAFT_REPEAT` (default 2) FULL
  * passes over the query list and reports each query's minimum — a
  * burst during pass 1 hits different queries than a burst during
  * pass 2, so the per-query min approximates the quiet-host cost. The
  * first pass still pays plan + codegen compile, so pass-interleaving
  * (not per-query back-to-back repeats) also keeps a burst from
  * covering both attempts of one query.
  *
  * Env knobs:
  *  - SPARK_GRAFT_CPUS: local worker threads (default: all cores).
  *  - SPARK_GRAFT_ONLY=q17,q18_minhash_lsh: subset; full names or
  *    `_`-delimited prefixes ("q17" → "q17_…").
  *  - SPARK_GRAFT_REPEAT: passes over the list (default 2; 1 = single
  *    cold pass).
  *  - SPARK_GRAFT_OUTLIER_SEC (default 3.0) / SPARK_GRAFT_EXTRA
  *    (default 2): queries whose per-pass min is still above the
  *    threshold get up to EXTRA more attempts (min kept) — a
  *    multi-minute burst can cover both interleaved passes of one
  *    query; the bounded re-measure rejects it.
  *  - SPARK_GRAFT_PREV (default: newest BENCH_r*.json under the cwd):
  *    previous round's bench record. Queries are ALSO re-measured when
  *    their min exceeds SPARK_GRAFT_REL (default 2.5) × the previous
  *    round's recorded time — the sub-threshold blind spot: a burst
  *    covering both passes of a sub-3 s query (observed: 0.3 s → 2.3 s)
  *    never crossed the absolute trigger. A genuinely-regressed query
  *    keeps its honest min (re-running can never lower a true cost
  *    below its quiet-host time). SPARK_GRAFT_PREV=none disables.
  *  - SPARK_GRAFT_WARMUP=1: one extra untimed pass first.
  *  - SPARK_GRAFT_DEBUG=1: per-query JVM resource line on stderr.
  *
  * A query that fails in any TIMED pass is reported with a *negative*
  * time in `queries`, named in `failed`, and excluded from `value` — a
  * crash (or a flake) can't masquerade as a fast success. A failure in
  * an outlier-re-measure EXTRA attempt does NOT flip a query that
  * passed both timed passes (the verdict stands on the real passes);
  * such queries are named in `extra_failed` for visibility. Note the
  * extra attempts run on a warmer JVM than pass-interleaved
  * measurements — re-measured minima are a quiet-host estimate, not
  * strictly comparable to single-pass minima.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.trim.toInt)
      .filter(_ >= 1).getOrElse(2)
    val debug = sys.env.get("SPARK_GRAFT_DEBUG").exists(_ == "1")
    val spark = GraftSession.local(cpus, "graft-bench")
    def selected(name: String): Boolean =
      only.forall(_.exists(p => name == p || name.startsWith(p + "_")))
    val picked = SparkEntry.queries.filter { case (n, _) => selected(n) }
      .toSeq.sortBy(_._1)

    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      // noop sink: forces full materialization of every output column
      // (a bare count() would let Catalyst prune the projections away
      // and under-measure scan/transform queries)
      try {
        // label the query's jobs (guide §1.5) so a UI/event-log reader
        // can attribute every job of a multi-job query to its gate
        spark.sparkContext.setJobDescription(name)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      finally spark.sparkContext.setJobDescription(null)

    def jvmStats(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      def mb(n: Long): Long = n >> 20
      val cc = pools.filter(_.getName.startsWith("CodeHeap"))
        .map(p => s"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=${mb(p.getUsage.getUsed)}/${mb(p.getUsage.getMax)}M")
      val meta = pools.find(_.getName == "Metaspace")
        .map(p => s"meta=${mb(p.getUsage.getUsed)}M")
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(g => s"${g.getName.replace(' ', '_')}=${g.getCollectionCount}/${g.getCollectionTime}ms")
      (cc ++ meta ++ Seq(s"heap=${mb(heap.getUsed)}/${mb(heap.getMax)}M") ++ gc).mkString(" ")
    }

    if (sys.env.get("SPARK_GRAFT_WARMUP").exists(_ == "1")) {
      picked.foreach { case (name, fn) => runOnce(name, fn); spark.catalog.clearCache() }
    }

    // pass-major order: pass 1 over every query, then pass 2, …
    val passes: Seq[Map[String, (Double, Boolean)]] = (1 to repeat).map { p =>
      picked.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = runOnce(name, fn)
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query state (broadcasts, cached relations) so later
        // queries aren't timed under earlier queries' memory pressure
        spark.catalog.clearCache()
        if (debug) System.err.println(f"[bench-debug] pass$p $name $dt%.1fs ${jvmStats()}")
        name -> (dt, ok)
      }.toMap
    }
    // Outlier re-measure: pass-interleaving defends against SHORT load
    // bursts, but a multi-minute burst can cover every attempt of one
    // query (observed: q34 recorded 102 s over two passes; quiet-host
    // 5.7 s). Two triggers, both bounded to SPARK_GRAFT_EXTRA attempts
    // (min kept — re-running can never increase a min, so a genuinely
    // slow query keeps its honest time):
    //  - absolute: min still above SPARK_GRAFT_OUTLIER_SEC;
    //  - relative: min above REL × the previous round's recorded time —
    //    catches the sub-threshold blind spot (a burst inflating a
    //    0.3 s query to 2.3 s never crosses the 3 s absolute bar).
    val outlierSec = sys.env.get("SPARK_GRAFT_OUTLIER_SEC").map(_.trim.toDouble)
      .getOrElse(3.0)
    val extraMax = sys.env.get("SPARK_GRAFT_EXTRA").map(_.trim.toInt).getOrElse(2)
    val relFactor = sys.env.get("SPARK_GRAFT_REL").map(_.trim.toDouble).getOrElse(2.5)
    val prev: Map[String, Double] = prevBenchTimes()
    def suspect(name: String, dt: Double): Boolean =
      dt > outlierSec ||
        // records before r7 key by full name, later ones by qNN prefix
        prev.get(name).orElse(prev.get(name.takeWhile(_ != '_')))
          .exists(p => p > 0.0 && dt > relFactor * p)
    val extraFailed = scala.collection.mutable.ListBuffer[String]()
    val results = picked.map { case (name, fn) =>
      val rs = passes.map(_(name))
      val ok = rs.forall(_._2)
      var dt = rs.map(_._1).min
      var extra = 0
      var extraOk = true
      while (ok && extraOk && suspect(name, dt) && extra < extraMax) {
        val t0 = System.nanoTime()
        extraOk = runOnce(name, fn)
        val again = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (debug) System.err.println(f"[bench-debug] extra$extra $name $again%.1fs ok=$extraOk")
        // a flake in an EXTRA attempt must not flip a query that passed
        // both real passes; its time also must not count
        if (extraOk) dt = math.min(dt, again)
        else extraFailed += name
        extra += 1
      }
      (name, dt, ok)
    }
    // Two records (the driver captures only the LAST ~2000 chars of
    // combined output — rounds 1–6 came back `parsed: null` because
    // the full-precision line outgrew that window, and the round-7
    // compact per-query line bought only until ~150 queries before it
    // ALSO outgrew it — rounds 11–12 regressed to `parsed: null`):
    //  - FULL precision + full names → a file (SPARK_GRAFT_BENCH_OUT,
    //    default ./BENCH_LOCAL.json, COMMITTED to the repo each round)
    //    for the per-query record, and echoed to stdout for log greps;
    //  - a SHORT summary line (totals, failure lists, counts — no
    //    per-query map, ~250 bytes at ANY query count) printed LAST,
    //    after spark.stop(), so the tail window always holds one
    //    complete parseable line no matter how the suite grows.
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def shortName(n: String): String = n.takeWhile(_ != '_')
    val total = results.filter(_._3).map(_._2).sum
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val extraF = extraFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullQs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -v) }
      .mkString("{", ",", "}")
    // cross-run artifact reuse (GRAFT_ARTIFACTS_TRUST) — named so a
    // warm-path bench record can state what was NOT rebuilt this JVM
    val reusedJ = graft.sources.Artifacts.reusedThisRun
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Host-calibration fields (round-19 verdict #5: two rounds in a
    // row a cross-host total read as a regression until someone
    // exhumed git history to normalize): the record carries its OWN
    // normalization anchors — q167's time (the suite's calibrator: an
    // untouched artifact-probe gate that moved < 4% across three
    // rounds of code change) and the MEDIAN per-query ratio against
    // the previous round's record (the statistic the round-18/19
    // adjudications used; median, not mean, so a genuinely-changed
    // query can't masquerade as host drift). Read ratio ≈ 1 with a
    // different total as "different host"; ratio itself moving says
    // the TREE changed speed. Null-safe: no previous record → null.
    val calibrator = results.find(_._1 == "q167_ivfpq_rerank")
      .filter(_._3).map(_._2)
    val ratios = results.filter(_._3).flatMap { case (name, dt, _) =>
      prev.get(name).orElse(prev.get(name.takeWhile(_ != '_')))
        .filter(_ > 0.0).map(p => dt / p)
    }.sorted
    val medianRatio =
      if (ratios.isEmpty) None
      else Some(ratios(ratios.size / 2))
    def optJ(v: Option[Double]): String =
      v.map(d => f"$d%.4f").getOrElse("null")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"failed":$failed,"extra_failed":$extraF,"runs":$repeat,"sf":"$sfDir","artifacts_reused":$reusedJ,"calibrator_q167":${optJ(calibrator)},"median_ratio_vs_prev":${optJ(medianRatio)}}"""
    // a SUBSET run (SPARK_GRAFT_ONLY) must never clobber the committed
    // full-suite record (round-17 advice: a 4-query A/B replaced the
    // tracked 199-query baseline) — focused runs get their own file
    // unless the caller explicitly pointed SPARK_GRAFT_BENCH_OUT
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "BENCH_SUBSET_LOCAL.json" else "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(benchOut),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $benchOut: ${e.getMessage}") }
    val compactFailed = results.filterNot(_._3)
      .map(r => "\"" + shortName(r._1) + "\"").mkString("[", ",", "]")
    val compactExtraF = extraFailed.map(n => "\"" + shortName(n) + "\"")
      .mkString("[", ",", "]")
    // bounded per-query signal for the summary line: the 20 slowest
    // (the ones a reader acts on), ~300 bytes at any suite size
    val top20 = results.filter(_._3).sortBy(-_._2).take(20)
      .map { case (k, v, _) => "\"" + shortName(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    spark.stop()
    println(fullLine)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$top20,"failed":$compactFailed,"extra_failed":$compactExtraF,"runs":$repeat,"sf":"$sfDir","detail":"$benchOut"}""")
    System.out.flush()
  }

  /** Per-query times from the previous round's bench record, the anchor
    * for the relative outlier trigger. SPARK_GRAFT_PREV names the file
    * ("none" disables); default = newest BENCH_r*.json in the cwd. The
    * record may embed the bench line inside an escaped "tail" string, so
    * this scans unescaped text for `"qNN_name":seconds` pairs rather
    * than parsing JSON; negative (failed) entries are dropped.
    */
  private def prevBenchTimes(): Map[String, Double] = {
    val path = sys.env.get("SPARK_GRAFT_PREV") match {
      case Some("none") => None
      case Some(p)      => Some(java.nio.file.Paths.get(p))
      case None =>
        val dir = java.nio.file.Paths.get(".")
        val rx = """BENCH_r(\d+)\.json""".r
        Option(dir.toFile.listFiles()).toSeq.flatten
          .flatMap(f => rx.findFirstMatchIn(f.getName).map(m => (m.group(1).toInt, f)))
          .sortBy(-_._1).headOption.map(_._2.toPath)
    }
    path.filter(java.nio.file.Files.exists(_)).map { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .replace("\\\"", "\"")
      val pair = """"(q\d+[A-Za-z0-9_]*)":(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r
      pair.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 > 0.0)
        .toMap
    }.getOrElse(Map.empty)
  }
}
