package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audit: the properties that keep these queries viable at
  * 100 TB must hold in the *executed plan*, not just in intent —
  * pushdown reaching the scan, pruned read schemas, broadcast only
  * where a side is genuinely small, shuffle-hash where explode defeats
  * size estimates.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed to the parquet scan") {
    val plan = planOf(Queries.filterPushdown(spark, sf))
    assert(plan.contains("PushedFilters:"), plan.take(600))
    assert("""PushedFilters: \[[^\]]*EqualTo\(o_orderstatus,F\)""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("q01: read schema is pruned to the projected columns") {
    val plan = planOf(Queries.scanProject(spark, sf))
    val read = """ReadSchema: struct<([^>]*)>""".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined, plan.take(600))
    val cols = read.get.split(",").map(_.split(":")(0)).toSet
    assert(cols === Set("l_orderkey", "l_linenumber", "l_quantity"), cols)
  }

  test("q04: small-dim join plans as a broadcast join") {
    val plan = planOf(Queries.joinBroadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q07 KNN: cross product is a broadcast nested loop; top-k is a partial+final agg") {
    val plan = planOf(Queries.knnPredict(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // the bounded top-k Aggregator must run as ObjectHashAggregate with a
    // partial pass before the exchange (map-side top-k, SURVEY §4)
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert("""ObjectHashAggregate.*partial_topkaggregator""".r.findFirstIn(plan).isDefined
      || plan.contains("partial_topkaggregator"), plan)
  }

  test("q17: exploded self-join is a shuffle join, never a broadcast") {
    val plan = planOf(Queries.jaccardPairs(spark, sf))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1200))
  }

  test("q18: no corpus-derived relation is broadcast (candidates join by shuffle)") {
    val plan = planOf(Queries.minhashLsh(spark, sf))
    // every relation in this query grows with the corpus — candidate
    // pairs included — so nothing may plan as a broadcast
    assert(!plan.contains("BroadcastExchange"), plan.take(1500))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
  }

  test("q18: staged shingle sets are computed once and reused across branches") {
    val df = Queries.minhashLsh(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the id-keyed exchange over the shingle projection feeds the band
    // self-join and both verify-join sides; all but the first consumer
    // must be exchange reuses, or the corpus is being re-shingled
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || plan.contains("table cache"), plan.take(2000))
  }

  test("q116: per-side shingle sets are staged once (banding + verify reuse the exchange)") {
    val df = Queries.incrementalNearDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // each side's id-keyed shingle exchange feeds both the band-key
    // derivation and the verify join; the second consumer must be an
    // exchange/stage reuse or the per-doc tokenization runs twice per side
    val reuses = "ReusedExchange|ReusedQueryStage|table cache".r
      .findAllIn(plan).length
    assert(reuses >= 2, s"expected >=2 exchange reuses (one per side), got $reuses:\n${plan.take(2500)}")
  }

  test("q121: bucket-width cap adds no broadcast (wide-bucket anti probe is shuffle-hash)") {
    val plan = planOf(Queries.cappedLsh(spark, sf))
    // the wide-bucket relation is corpus-derived (millions of hot
    // buckets at scale) — its left-anti probe must shuffle, and the
    // capped keyed relation must still hash-join, never broadcast
    assert(!plan.contains("BroadcastExchange"), plan.take(1500))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
  }

  test("q33: LSH cosine discovery never broadcasts a corpus-derived relation") {
    val plan = planOf(Queries.cosineLsh(spark, sf))
    assert(!plan.contains("BroadcastExchange"), plan.take(1500))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
  }

  test("q21/q22: top-k aggregation runs as ObjectHashAggregate with a partial pass") {
    for (q <- Seq(Queries.annExact _, Queries.annLsh _)) {
      val plan = planOf(q(spark, sf))
      assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
      assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1500))
    }
  }

  test("q62 quantized ANN: scale broadcast, corpus never shuffled before the top-k agg") {
    val plan = planOf(Queries.quantAnn(spark, sf))
    // the 1-row global-scale agg and the query slice are the only
    // broadcasts; the item corpus must stream through quantization into
    // the KNN nested loop with NO exchange before the partial top-k agg
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1500))
    // AQE's toString repeats the tree under "== Initial Plan ==";
    // count exchanges in the final tree only
    val finalTree = plan.split("== Initial Plan ==")(0)
    val corpusShuffles = "Exchange hashpartitioning".r.findAllIn(finalTree).size
    assert(corpusShuffles <= 1, s"expected only the top-k agg exchange:\n${finalTree.take(2000)}")
  }

  test("q64 chunk dedup: partial min agg, no Window, per-doc join never broadcasts") {
    val plan = planOf(Queries.chunkDedupSummary(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // survivor election is a map-side partial min over chunk content
    assert(finalTree.contains("partial_min"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    // both join inputs are corpus-cardinality: a broadcast here is the
    // q18-class scale bug
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
  }

  test("q65 z-order keys: top-100 plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Queries.zOrderKeys(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
  }

  test("q70 pipeline: packing window partitions by source; no nested-loop anywhere") {
    val plan = planOf(Queries.pipelineE2E(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the composed pipeline must not plan any all-pairs shape — every
    // stage is scan-predicate / agg / semi-join / window
    assert(!finalTree.contains("BroadcastNestedLoopJoin"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
    // dedup election partial-aggs map-side; the packing running sum
    // partitions by the shard key, never a single-partition window
    assert(finalTree.contains("partial_min"), finalTree.take(1500))
    assert(finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("SinglePartition"),
      "packing window collapsed to one partition:\n" + finalTree.take(1500))
  }

  test("q66/q68: mixing and binning are single partial-agged scans — no join, no Window") {
    for (q <- Seq(Queries.sourceMix _, Queries.priceHistogram _)) {
      val plan = planOf(q(spark, sf))
      val finalTree = plan.split("== Initial Plan ==")(0)
      assert(finalTree.contains("partial_"), finalTree.take(1200))
      assert(!finalTree.contains("Join"), finalTree.take(1200))
      assert(!finalTree.contains("Window"), finalTree.take(1200))
    }
  }

  test("q71 sliding window: partitions by the user key, never a single-partition sort") {
    val plan = planOf(Queries.slidingUserWindow(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("Window"), finalTree.take(1200))
    assert("hashpartitioning\\(user_id".r.findFirstIn(finalTree).isDefined,
      finalTree.take(1200))
    assert(!finalTree.contains("SinglePartition"), finalTree.take(1200))
  }

  test("q73 EXISTS subqueries decorrelate to semi/anti joins (no per-row subquery)") {
    val plan = planOf(Queries.sqlExists(spark, sf))
    assert(plan.contains("LeftSemi"), plan.take(1500))
    assert(plan.contains("LeftAnti"), plan.take(1500))
  }

  test("q79 retrieval: token-keyed shuffle joins, bounded-heap top-k, no Window") {
    val plan = planOf(Queries.retrieval(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // both join inputs grow with the corpus — candidate generation and
    // df attachment must be shuffle joins, never a corpus broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_topkaggregator"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q77/q78: signature joins stay shuffle-hash; pooling partial-aggs without joins") {
    val est = planOf(Queries.minhashEstimate(spark, sf))
    assert(est.split("== Initial Plan ==")(0).contains("ShuffledHashJoin"),
      est.take(1200))
    val pool = planOf(Queries.meanPoolEmbeddings(spark, sf))
    val finalTree = pool.split("== Initial Plan ==")(0)
    assert(finalTree.contains("partial_"), finalTree.take(1200))
    assert(!finalTree.contains("Join") && !finalTree.contains("Window"),
      finalTree.take(1200))
  }

  test("q82 series similarity: prefix rank partitions by the key, never a single-partition sort") {
    val plan = planOf(Queries.seriesSimilarity(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("Window"), finalTree.take(1200))
    assert("hashpartitioning\\(user_id".r.findFirstIn(finalTree).isDefined,
      finalTree.take(1200))
    assert(!finalTree.contains("SinglePartition"), finalTree.take(1200))
  }

  test("q98 series LSH: candidate join keys on (tbl, sig) cells, never on seg alone") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val sketch = graft.operators.TimeSeries.paaSketch(
      Tables.load(spark, sf, "events"), "user_id", "ts", "event_id",
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value") * 100).cast("long"),
      take = 16, segments = 4)
    val df = graft.operators.TimeSeries
      .similarSeriesLsh(sketch, "user_id", k = 3, segments = 4)
    df.collect()
    val root = df.queryExecution.executedPlan
    val finalPlan = root.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(root)
    // q82's named scale-killer was a join keyed on the `segments`-value
    // seg column — keys² rows per seg at scale. The LSH path must never
    // exchange on seg alone; candidate generation keys on (tbl, sig).
    val segOnly = finalPlan.collect {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }.collect {
      case h: HashPartitioning
          if h.expressions.nonEmpty &&
            h.expressions.forall(_.references.toSeq.map(_.name).forall(_ == "seg")) => h
    }
    assert(segOnly.isEmpty, s"exchange keyed only by seg: $segOnly")
    val planStr = finalPlan.toString
    assert(!planStr.contains("CartesianProduct"), planStr.take(1500))
    assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr.take(1500))
    assert(planStr.toLowerCase.contains("partial_topkaggregator"), planStr.take(1500))
  }

  test("q39 IVF: no exchange keyed by the centroid id; probed side is broadcast") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = Queries.annIvf(spark, sf)
    df.collect()
    val root = df.queryExecution.executedPlan
    val finalPlan = root.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(root)
    // partitioning the corpus by c_id caps parallelism at `centroids`
    // tasks — the named 100 TB scale-killer from the round-2 verdict.
    // Every hash exchange here must key on something else (q_id for the
    // top-k agg); the candidate join must broadcast the probed side.
    val cIdExchanges = finalPlan.collect {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }.collect {
      case h: HashPartitioning
          if h.expressions.forall(_.references.toSeq.map(_.name).forall(_ == "c_id")) => h
    }
    assert(cIdExchanges.isEmpty, s"exchange keyed only by c_id: $cIdExchanges")
    val planStr = finalPlan.toString
    assert(planStr.contains("BroadcastHashJoin"), planStr.take(1500))
    // assignment is a projection: exactly one corpus-sized exchange
    // (the top-k partial agg), so no groupBy-based argmin survives
    assert(!planStr.contains("min_by"), planStr.take(1500))
  }

  test("q03: aggregation has a map-side partial pass") {
    val plan = planOf(Queries.aggSum(spark, sf))
    assert("""hashaggregate.*partial""".r.findFirstIn(plan.toLowerCase).isDefined
      || plan.toLowerCase.contains("partial_sum"), plan.take(1200))
  }

  test("q36/q47: top-k over a global order plans as TakeOrderedAndProject, not a full sort") {
    // explode → count → top-100: the limit must fuse into a bounded
    // per-partition top-k + merge (TakeOrderedAndProject); a global
    // Sort before the limit would materialize the whole vocabulary
    for (q <- Seq(Queries.wordCount _, Queries.topBigrams _)) {
      val plan = planOf(q(spark, sf))
      assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
    }
  }

  test("q45: exact percentile aggregates with a partial (map-side) pass") {
    val plan = planOf(Queries.percentiles(spark, sf))
    assert(plan.toLowerCase.contains("partial_percentile"), plan.take(1200))
  }

  test("q50: stratified sample has no Window — bounded-heap partial agg only") {
    val plan = planOf(Queries.stratifiedSampleQ(spark, sf))
    // a row_number window over few labels collapses to ~|labels| sort
    // tasks at scale; the bounded TopK aggregator must plan instead,
    // with a partial pass before the exchange
    assert(!plan.contains("Window"), plan.take(1200))
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1200))
  }

  test("q52 TF-IDF: no Window; per-doc top-k is a partial-agged bounded heap") {
    val plan = planOf(Queries.tfidfTopTerms(spark, sf))
    // the per-doc top-k must run through the TermTopK aggregator with a
    // map-side partial pass, never a per-doc row_number Window sort
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_termtopkaggregator"), plan.take(1500))
    // vocabulary is corpus-derived: the tf⋈df term join must be a
    // shuffle join, never a broadcast of the df relation
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
    // and the df branch must reuse tf's (doc_id, term) exchange — the
    // corpus is scanned+exploded ONCE (the tf>=1 filter in Tfidf is the
    // load-bearing trick; if it stops working this breaks loudly)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      plan.take(2500))
  }

  test("q53: both sketches aggregate with a map-side partial pass") {
    val plan = planOf(Queries.approxSketchCheck(spark, sf)).toLowerCase
    assert(plan.contains("partial_approx_count_distinct")
      || plan.contains("partial_hyperloglog"), plan.take(1500))
    assert(plan.contains("partial_approx_percentile")
      || plan.contains("partial_percentile_approx"), plan.take(1500))
  }

  test("q54 blocked KNN: every block's cross product is a broadcast nested loop") {
    val plan = planOf(Queries.knnPredictBlocked(spark, sf))
    // 4 hash-disjoint query slices, each broadcast independently — the
    // item table itself must never be the broadcast side
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1500))
  }

  test("q55 repetition: bigram stats partial-aggregate; no Window") {
    val plan = planOf(Queries.repetitionSignals(spark, sf))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_count")
      || plan.toLowerCase.contains("partial_max"), plan.take(1500))
  }

  test("q56 decontam: the EVAL side broadcasts, the corpus side streams") {
    // the deliberate asymmetry: an eval set is small by construction, so
    // it replicates (like the KNN query side); the training corpus must
    // be the streamed probe side, never collected or broadcast
    val plan = planOf(Queries.decontamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("q57 salted agg: two phases — (key, salt) pre-aggregation then key merge") {
    val plan = planOf(Queries.saltedAgg(spark, sf))
    assert("""hashpartitioning\(l_returnflag[^)]*_salt""".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    assert(plan.toLowerCase.contains("partial_count"), plan.take(2000))
  }

  test("q86 gap fill: fact side partial-aggs before a broadcast fill join") {
    val plan = planOf(Queries.gapFillMonthly(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the only fact-scale exchange is the (nation, month) aggregation's,
    // with a map-side partial pass before it
    assert(finalTree.toLowerCase.contains("partial_count"), finalTree.take(1500))
    // the densification join probes a relation bounded by the grid
    // (≤ nations × months regardless of fact rows) — broadcast is the
    // correct plan at any scale, a sort-merge here would be a regression
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
  }

  test("q87 funnel: one conditional partial-agged scan — no join, no Window") {
    val plan = planOf(Queries.funnelConversion(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.toLowerCase.contains("partial_min"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q88 unpivot: melt plans as a map-side Expand; partial aggs absorb the 4× rows") {
    val plan = planOf(Queries.unpivotMeasures(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("Expand"), finalTree.take(1200))
    assert(finalTree.toLowerCase.contains("partial_count"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q89 co-occurrence: self-join stays shuffle-hash, nothing corpus-derived broadcast") {
    val plan = planOf(Queries.typeCooccurrence(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
  }

  test("q90 IQR outliers: fences partial-agg then broadcast; no Window") {
    val plan = planOf(Queries.iqrOutliers(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.toLowerCase.contains("partial_percentile"), finalTree.take(1500))
    // the fence relation is bounded by the group count — broadcast is
    // the correct plan at any fact scale
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q91 latest-record compaction: one partial-agged argmax — no Window, no join") {
    val plan = planOf(Queries.latestEvents(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.toLowerCase.contains("partial_max"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
  }

  test("q92 cohort retention: user-keyed shuffle join, nothing corpus-derived broadcast") {
    val plan = planOf(Queries.cohortRetention(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the cohort relation is one row per user — corpus-derived, so it
    // must join by shuffle on the user key, never broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q93 association rules: only item-domain-bounded relations broadcast") {
    val plan = planOf(Queries.associationRules(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the user-keyed pair join stays shuffle-hash (q89's audit); the
    // per-item totals and 1-row user count broadcast — their size is
    // bounded by the item domain, not the corpus
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(2000))
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(2000))
  }

  test("q94 revenue share: no unpartitioned window — 1-row total broadcast instead") {
    val plan = planOf(Queries.revenueShare(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // sum() OVER () would collapse the relation to one task; the grand
    // total must be a broadcast 1-row branch
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(finalTree.contains("BroadcastNestedLoopJoin"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_sum"), finalTree.take(1500))
  }

  test("q95 daily delta: lag as a broadcast shifted-key join, no Window sort") {
    val plan = planOf(Queries.dailyDelta(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    // the per-period relation is period-domain-bounded — broadcast is
    // correct at any fact scale
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_sum"), finalTree.take(1500))
  }

  test("q96 rolling actives: no Window — offset explode + partial-agged distinct count") {
    val plan = planOf(Queries.rollingActives(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    // only the 7-row offset dim and the 1-row max-day broadcast; the
    // activity relation itself must never be a broadcast side
    assert(finalTree.contains("BroadcastNestedLoopJoin"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_count"), finalTree.take(1500))
  }

  test("q97 transitions: ordering window partitions by the user key; matrix partial-aggs") {
    val plan = planOf(Queries.eventTransitions(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("Window"), finalTree.take(1500))
    assert("hashpartitioning\\(user_id".r.findFirstIn(finalTree).isDefined,
      finalTree.take(1500))
    assert(!finalTree.contains("SinglePartition"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_count"), finalTree.take(1500))
  }

  test("q100 dup excision: fingerprint joins shuffle (corpus-derived sides), " +
    "ownership partial-aggs, no all-pairs, no Window") {
    val plan = planOf(Queries.dupExcision(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // ownership election is a map-side partial min on the fingerprint key
    assert(finalTree.contains("partial_min"), finalTree.take(1500))
    // owner + cut-start relations are corpus-derived: a broadcast here
    // is the q18-class scale bug (test-scale stats would allow it)
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastNestedLoopJoin"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
    // the splice is a per-row fold, never a Window sort
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q101 rebalance: ratio table broadcasts; admission is a filter, " +
    "corpus never shuffled on a corpus key") {
    val plan = planOf(Queries.langRebalance(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the |langs|-row ratio relation rides a broadcast join — the corpus
    // side is admission-filtered in place, never exchanged pre-filter
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
  }

  test("q102 vocab: top-V election is TakeOrderedAndProject; vocab probe broadcasts") {
    val plan = planOf(Queries.vocabCoverage(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("TakeOrderedAndProject"), finalTree.take(1500))
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_count"), finalTree.take(1500))
  }

  test("q103 SCD2: both windows partition by the high-cardinality user key") {
    val plan = planOf(Queries.scdIntervals(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("Window"), finalTree.take(1500))
    assert("hashpartitioning\\(user_id".r.findFirstIn(finalTree).isDefined,
      finalTree.take(1500))
    assert(!finalTree.contains("SinglePartition"), finalTree.take(1500))
  }

  test("q104 quality budget: threshold broadcasts; no corpus sort anywhere") {
    val plan = planOf(Queries.qualityBudget(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    // the whole point vs sort-and-take-prefix: selection must not plan a
    // per-lang (low-cardinality) or global sort over the corpus
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
    assert(!finalTree.contains("TakeOrderedAndProject"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q105 rarity: vocab probe joins shuffle-hash; no corpus sort or window") {
    val plan = planOf(Queries.tokenRarity(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the corpus-derived vocab relation must ride a shuffle-hash join
    // (never broadcast, never sort-merge — the q79 discipline); the only
    // broadcast is the 1-row doc count over the vocab relation
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
  }

  test("q108 diversity: two-level agg — no count-distinct Expand, no Window, no join") {
    val plan = planOf(Queries.sourceDiversity(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the distinct-trigram count is a second groupBy over the
    // (source, trigram) partial agg, NEVER a count(DISTINCT) Expand
    assert(!finalTree.contains("Expand"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("Join"), finalTree.take(1500))
  }

  test("q109 divergence: vocab probe is shuffle-hash; no corpus sort or window") {
    val plan = planOf(Queries.sourceDivergence(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // (source,token)↔token probe between vocab-bounded relations rides
    // a shuffle-hash join; the only broadcasts are the per-source
    // totals (handful of rows) and the 1-row grand total
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
  }

  test("q111 calibration: boundary + threshold aggs broadcast; one corpus scan, no Window") {
    val plan = planOf(Queries.calibrationBuckets(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the 9-value decile bounds and per-lang thresholds are tiny
    // aggregates — broadcast is the right plan at any corpus scale;
    // the binning must stay a map-side projection (no Window, no sort,
    // no corpus-sized shuffle beyond the final histogram agg)
    assert(finalTree.contains("BroadcastNestedLoopJoin")
      || finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
  }

  test("q112 snapshot drift: elections partial-agg; full-outer join; corpus never broadcast") {
    val plan = planOf(Queries.snapshotDrift(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // each snapshot's survivor election must partial-agg (map-side
    // min_by before the text-key exchange), and the drift join is
    // between two corpus-derived text-unique relations — never
    // broadcast at any scale
    assert(finalTree.toLowerCase.contains("partial_min_by"), finalTree.take(1500))
    assert(finalTree.contains("FullOuter"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q113 capped retrieval: phrase joins shuffle-hash; cap prunes pre-join; heap top-k; no Window") {
    val plan = planOf(Queries.retrievalCapped(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // every relation here grows with the corpus (postings, capped
    // phrase weights, query phrases) — nothing may broadcast; the
    // top-3 must ride the bounded-heap aggregator, not a Window sort
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(finalTree.contains("ObjectHashAggregate"), finalTree.take(1500))
  }

  test("q115 lead survivors: priority broadcast; one partial-agged argmax; no Window, no join-back") {
    val plan = planOf(Queries.leadSurvivors(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the source-priority relation is domain-bounded — broadcast is
    // right at any corpus scale; the election must partial-agg map-side
    // (max_by carries the payload) with no Window and no second join
    assert(finalTree.contains("BroadcastHashJoin"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("partial_max_by"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1500))
  }

  test("q116 incremental near-dedup: cross-side banded join shuffle-hash; nothing broadcast; left-anti survival") {
    val plan = planOf(Queries.incrementalNearDedup(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // batch AND corpus are corpus-scale: the banded candidate join and
    // the set-verify joins must all ride shuffle-hash, and the
    // survival step must be a left-anti — no broadcast anywhere
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(finalTree.toLowerCase.contains("leftanti"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
  }

  test("q49: survivor resolution drops losers via an anti join") {
    // the pair/cluster lineage is cut by the per-iteration
    // localCheckpoint (its join shape is audited at q17), so the final
    // plan is exactly: corpus LEFT ANTI loser-ids — no other shape
    val plan = planOf(Queries.neardupSurvivors(spark, sf))
    assert(plan.toLowerCase.contains("leftanti"), plan.take(1500))
  }

  test("q44: sampled gate — query sample broadcasts, corpus streams into a partial top-k") {
    val plan = planOf(Queries.annRecall(spark, sf))
    // the 64-row hash-ordered sample must reach the exact KNN as a
    // broadcast (TakeOrderedAndProject, never a global sort of the
    // query split), and the corpus side must flow into the bounded-heap
    // partial aggregation without a corpus-wide shuffle-before-agg
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1500))
  }

  test("q124 bigram LM: model join shuffle-hash (never broadcast); counts partial-agg; no Window") {
    val plan = planOf(Queries.bigramLmScore(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the realized-bigram model is corpus-derived (tens of GB at a BPE
    // vocab) — the scoring join must ride shuffle-hash, not a broadcast
    // whose size estimate only holds at test scale; the 1-row V scalar
    // is the only legitimate broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(finalTree.contains("partial_count") || finalTree.contains("partial_sum"),
      finalTree.take(1500))
  }

  test("q125 hard negatives: anchors broadcast, corpus streams, argmax partial-aggs") {
    val plan = planOf(Queries.hardNegatives(spark, sf))
    // bounded anchor set × streaming corpus (q21 discipline); the
    // per-anchor winner is a partial-aggable struct-min, no Window
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.contains("partial_min"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("q126 label purity: bounded-heap top-k partial agg; label probe joins the broadcast top list") {
    val plan = planOf(Queries.labelPurity(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(1500))
    // the anchor×5 top list is the bounded side — the corpus label
    // relation must probe IT as a broadcast hash join, never shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("q127 semdedup: assignment is a pure projection; cluster self-join and verdicts shuffle-hash") {
    val plan = planOf(Queries.semanticDedup(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // Lloyd assignment rides codebook literals — the corpus must reach
    // the cluster-keyed self-join without any join for assignment, and
    // every corpus-derived relation (pairs, dropped ids) stays
    // shuffle-hash — nothing broadcast, nothing cartesian
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q128 dup-ngrams: df agg partial-aggs; gram join-back shuffle-hash; no Window") {
    val plan = planOf(Queries.dupNgramFraction(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the gram relation is corpus-derived — join-back must be
    // shuffle-hash, never a test-scale-only broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q129 BPE merge round: wordcount partial-aggs; top-20 is TakeOrderedAndProject") {
    val plan = planOf(Queries.bpeMergeRound(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("q132 NB classifier: model join shuffle-hash; scalars broadcast; no Window") {
    val plan = planOf(Queries.nbQualityClassifier(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the weight relation is vocab-bounded but corpus-DERIVED — it must
    // join shuffle-hash (q124's LM rule); only the 1-row totals / prior
    // / absence-sum scalars may broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q133 quality survivors: packed-struct argmax partial-aggs; no per-cluster Window") {
    val plan = planOf(Queries.qualitySurvivors(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the election must be the partial-aggable min-struct, not a
    // row_number Window over cluster partitions
    assert(finalTree.contains("partial_min") || finalTree.contains("partial_count"),
      finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
  }

  test("q134 shard layout: the only Window is PARTITIONED on shard (sharded sorts, no global sort)") {
    val df = Queries.shardLayout(spark, sf)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LogicalWindow => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "shard layout must never plan a partition-less (global) Window")
    val plan = planOf(df)
    assert(!plan.contains("Sort [") || !plan.contains("global=true"),
      "no global sort allowed in the layout plan")
  }

  test("q135 CDC chunks: per-row chunking, occurrence join-back shuffle-hash, no Window") {
    val plan = planOf(Queries.cdcChunkDedup(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    // the occurrence-count relation is corpus-derived — never broadcast
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q137 BPE encode: segment relation joins shuffle-hash; corpus never char-exploded") {
    val plan = planOf(Queries.bpeEncode(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
  }

  test("q138-q140 planners: corpus never shuffled except keyed aggs/joins; no Window") {
    for ((name, df) <- Seq(
        "q138" -> Queries.bpeFertility(spark, sf),
        "q139" -> Queries.effectiveTokens(spark, sf),
        "q140" -> Queries.epochPlan(spark, sf))) {
      val plan = planOf(df)
      val finalTree = plan.split("== Initial Plan ==")(0)
      assert(!finalTree.contains("Window"), s"$name: ${finalTree.take(800)}")
      assert(!finalTree.contains("CartesianProduct"), s"$name")
    }
    // q140's budget arithmetic invariants at spec scale: allocation
    // never exceeds the 2x budget, per-lang never exceeds the 3-epoch
    // cap, and the capped flag matches the cap exactly
    val rows = Queries.epochPlan(spark, sf).collect()
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= 2 * totalTokens, s"alloc $alloc > budget ${2 * totalTokens}")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= 3 * r.getAs[Long]("n_tokens"))
      assert((r.getAs[Long]("capped") == 1L) ===
        (r.getAs[Long]("repeat_ppm") >= 3000000L))
    }
  }

  test("q141 calibration: percentile bounds broadcast; binning map-side; no Window") {
    val plan = planOf(Queries.scoreCalibration(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Window"), finalTree.take(1200))
    // round 20: q141 reads the per-run nb_scores ARTIFACT (q132's
    // scored relation, the q152 discipline) instead of re-running the
    // train+score chain — the plan is one artifact scan with the
    // 9-boundary percentile aggregate broadcast back onto it; q132's
    // model ShuffledHashJoin lives in the artifact BUILD, audited by
    // its own test above
    assert(finalTree.contains("graft_nb_scores"), finalTree.take(1200))
    assert(finalTree.contains("BroadcastNestedLoopJoin") ||
      finalTree.contains("BroadcastExchange"), finalTree.take(1200))
    assert(!finalTree.contains("SortMergeJoin"), finalTree.take(1200))
  }

  test("q142 cluster split: pure projection over the clustering; no extra shuffle") {
    val plan = planOf(Queries.clusterSplit(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q143 winnow pairs: fingerprint self-join shuffles, never broadcasts") {
    val plan = planOf(Queries.winnowPairs(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1200))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q144 blocklist: map-only — no exchange of any kind") {
    val plan = planOf(Queries.blocklistFilter(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Exchange"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
  }

  test("q145 taxonomy: pair cross-tab joins by shuffle, no broadcast, no Window") {
    val plan = planOf(Queries.dupTaxonomy(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q146 persisted IVF: probe join DYNAMICALLY PRUNES the cell-partitioned index scan") {
    val plan = planOf(Queries.annIvfPersisted(spark, sf))
    // the artifact's whole point at 100 TB: the assigned-relation scan
    // must carry a dynamicpruning partition filter fed by the probed
    // cells, so a probe touches only its cells' files
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q147 gopher rules: map-only — no exchange, no join, no Window") {
    val plan = planOf(Queries.gopherRules(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Exchange"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q148 winnow decontam: cross-side fp join shuffles, never broadcasts") {
    val plan = planOf(Queries.winnowDecontam(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1200))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q150 funnel: keyed elections shuffle-hash, 6-row agg, no Window, no cartesian") {
    val plan = planOf(Queries.curationFunnel(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    // funnel monotonicity at spec scale: each stage's count <= previous
    val counts = Queries.curationFunnel(spark, sf)
      .orderBy("stage").collect().map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      counts.mkString(","))
  }

  test("q152/q155 artifact reads: a parquet scan, not a recompute") {
    // the whole point of the persisted artifacts — the consumer plan
    // must be a file scan (plus the probe join for q155), with zero
    // trace of the build lineage (no shingle explode, no iterative CC)
    val p152 = planOf(Queries.neardupClustersPersisted(spark, sf))
    assert(p152.contains("parquet"), p152.take(800))
    assert(!p152.contains("Join"), p152.take(800))
    assert(!p152.contains("Generate"), p152.take(800))
    val p155 = planOf(Queries.winnowDecontamPersisted(spark, sf))
    val f155 = p155.split("== Initial Plan ==")(0)
    assert(f155.contains("parquet"), f155.take(800))
    assert(f155.contains("ShuffledHashJoin"), f155.take(800))
    assert(!f155.contains("BroadcastExchange"), f155.take(800))
    assert(!f155.contains("Window"), f155.take(800))
  }

  test("q153 capped semdedup: cap is a left-anti exclusion; corpus-derived sides never broadcast") {
    val plan = planOf(Queries.cappedSemDedup(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.toLowerCase.contains("leftanti"), finalTree.take(1500))
    assert(finalTree.contains("ShuffledHashJoin"), finalTree.take(1500))
    assert(!finalTree.contains("BroadcastExchange"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("CartesianProduct"), finalTree.take(1500))
  }

  test("q154 width audit: one partial-agged groupBy, no join") {
    val plan = planOf(Queries.semDedupWidthAudit(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(finalTree.contains("partial_count"), finalTree.take(1200))
    assert(!finalTree.contains("Join"), finalTree.take(1200))
    assert(!finalTree.contains("Window"), finalTree.take(1200))
  }

  test("q156/q157: capped clustering rides keyed joins; no Window, no cartesian") {
    for ((name, df) <- Seq(
        "q156" -> Queries.cappedNeardupClusters(spark, sf),
        "q157" -> Queries.clusteringAgreement(spark, sf))) {
      val plan = planOf(df)
      val finalTree = plan.split("== Initial Plan ==")(0)
      assert(!finalTree.contains("Window"), s"$name: ${finalTree.take(800)}")
      assert(!finalTree.contains("CartesianProduct"), s"$name")
    }
    // the agreement join itself (exact artifact × capped clustering,
    // both corpus-derived) must be shuffle-hash, never broadcast
    val p157 = planOf(Queries.clusteringAgreement(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(p157.contains("ShuffledHashJoin"), p157.take(1200))
    // round 15: the dual-distinct Expand is retired — the two
    // distinct-cluster counts ride the tagged union + chained keyed
    // aggs, and the union's branches share the rollup exchange
    assert(!p157.contains("Expand"), p157.take(1500))
  }

  test("q178 resolution verdict: dispatch reads the 1-row stamp; the census itself stays partial-agg, no Expand/Window/Join") {
    // the DISPATCH plan (round-16): a bare scan of the publish-time
    // stamp — no aggregation runs at dispatch time at all (the
    // verdict can only change when a publish swaps the tree)
    val plan = planOf(Queries.annBitBudgetAudit(spark, sf))
    val finalTree = plan.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("HashAggregate"), finalTree.take(1500))
    assert(!finalTree.contains("Expand"), finalTree.take(1500))
    assert(!finalTree.contains("Window"), finalTree.take(1500))
    assert(!finalTree.contains("Join"), finalTree.take(1500))
    // the CENSUS (now run once, at publish) keeps its chained keyed
    // partial-agg shape — no countDistinct Expand, no Window, no join
    import spark.implicits._
    val codes = Seq((0L, 1L, 2L), (0L, 1L, 2L), (1L, 3L, 4L))
      .toDF("c_id", "code0", "code1")
    val census = planOf(
      graft.operators.Pq.resolutionAuditOf(codes, m = 2,
        minCell = 16L, loadFactor = 4L))
    assert(census.contains("partial_count") ||
      census.contains("partial_sum"), census.take(1500))
    assert(!census.contains("Expand"), census.take(1500))
    assert(!census.contains("Window"), census.take(1500))
    assert(!census.contains("Join"), census.take(1500))
  }

  test("q160/q161: capped provenance matrix and saturation audit ride keyed aggs; no Window") {
    val p160 = planOf(Queries.sourceCopyMatrix(spark, sf))
      .split("== Initial Plan ==")(0)
    // the id→source probes are corpus-derived — shuffle-hash, never broadcast
    assert(p160.contains("ShuffledHashJoin"), p160.take(1200))
    assert(!p160.contains("BroadcastExchange"), p160.take(1200))
    assert(!p160.contains("Window"), p160.take(1200))
    val p161 = planOf(Queries.shingleSaturation(spark, sf))
      .split("== Initial Plan ==")(0)
    // one df count + a 1-row rollup; the only broadcast is the 1-row n_docs
    assert(p161.contains("partial_count") || p161.contains("partial_sum"),
      p161.take(1200))
    assert(!p161.contains("Window"), p161.take(1200))
    assert(!p161.contains("SortMergeJoin"), p161.take(1200))
  }

  test("q162-q164 PQ: encode is a pure projection; ADC is broadcast-query + partial top-k") {
    // encode: codebooks are driver literals, so the encoding plan is a
    // single projection over the scan — no join, no exchange at all
    val p162 = planOf(Queries.pqEncode(spark, sf))
    assert(!p162.contains("Join"), p162.take(1000))
    assert(!p162.contains("Exchange"), p162.take(1000))
    // ADC: q21's shape — bounded queries broadcast, coded corpus
    // streams into the bounded-heap partial aggregation
    val p163 = planOf(Queries.pqAdcTopK(spark, sf))
    assert(p163.contains("BroadcastNestedLoopJoin"), p163.take(1200))
    assert(p163.toLowerCase.contains("partial_topkaggregator"), p163.take(1200))
    // re-rank (round-17): the corpus side is the id-keyed VECTOR
    // STORE (bucketed table scan) met by BROADCAST candidates — the
    // corpus-wide shuffle_hash exchange of rounds ≤ 16 is gone
    // (VectorStoreSpec pins the exchange-free store subtree; this
    // census pins that the gate's plan took the new shape)
    val p164 = planOf(Queries.pqRerank(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(p164.contains("BroadcastHashJoin"), p164.take(1200))
    assert(!p164.contains("ShuffledHashJoin"), p164.take(1200))
    assert(p164.contains("graft_vecstore_"),
      "the re-rank corpus side must be the vector store scan: " + p164.take(1200))
    assert(!p164.contains("Window"), p164.take(1200))
    // persisted index: the corpus side is the parquet CODES scan (no
    // full-vector scan, no re-encode lineage), same search shape
    val p165 = planOf(Queries.pqAdcPersisted(spark, sf))
    assert(p165.contains("BroadcastNestedLoopJoin"), p165.take(1200))
    assert(p165.toLowerCase.contains("partial_topkaggregator"), p165.take(1200))
    assert("ReadSchema:[^\\n]*code0".r.findFirstIn(p165).isDefined,
      "the ADC probe must scan the persisted codes relation")
  }

  test("global-window census: q74 is the ONLY query planning a partition-less Window") {
    // A Window with an empty partitionSpec is a single-task sort of
    // the whole input — q74's global ntile carries it deliberately
    // (documented reporting-only; q83 is the distributed decile path).
    // This census walks the OPTIMIZED logical plan of every registered
    // query so a future query cannot silently introduce a second
    // global window; a legitimate newcomer must be added to the
    // allowlist here WITH the same reporting-only scoping note.
    //
    // Log-multiplicity note (round-21, closes the round-20 verdict's
    // item 5): a full Verify run logs FOUR "WindowExec: No Partition
    // Defined" warnings — all four are q74's. Measured: Verify with
    // SPARK_GRAFT_ONLY=q74 logs exactly 4; a single noop execution
    // logs 6. The warning lives in WindowExecBase's
    // requiredChildDistribution, which the planner (EnsureRequirements
    // and each AQE re-plan round) consults several times per
    // execution — the count tracks planner inspections of q74's one
    // deliberate global window, not additional offending queries.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val offenders = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, mk) =>
      val plan = mk(spark, sf).queryExecution.optimizedPlan
      val global = plan.collectWithSubqueries {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty) Some(name) else None
    }
    assert(offenders === Seq("q74_ntile"),
      s"unexpected global-window queries: ${offenders.mkString(", ")}")
  }
}
