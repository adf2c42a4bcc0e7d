package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Knn, Packing, SimilaritySearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY §2
  * (reference-parity surface) or the LLM-pipeline extension set, expressed
  * over the driver's parquet testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the hash-match gate.
  *
  * FP-portability rule for oracle-checked outputs: integers, or doubles
  * produced by per-row deterministic arithmetic — never order-dependent
  * FP aggregation (sums of non-integral doubles are emitted as per-row
  * rounded integer cents instead).
  */
object SparkEntry {

  /** Flagship: end-to-end KNN classification (the reference's one query,
    * Hadoop.java) over the sf0.001 embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnPredict(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}

/** The declared query set. Kept separate from the [[SparkEntry]] contract
  * object so it can grow without touching the driver-facing surface.
  */
object Queries
    extends queries.ReferenceSurfaceQueries
    with queries.DedupCurationQueries
    with queries.EventAnalyticsQueries
    with queries.ModelCurationQueries
    with queries.OracleSqlA
    with queries.OracleSqlB
    with queries.OracleSqlC
    with queries.OracleSqlD {

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (scanProject _),
    "q02_filter_pushdown" -> (filterPushdown _),
    "q03_agg_sum" -> (aggSum _),
    "q04_join_broadcast" -> (joinBroadcast _),
    "q05_join_agg" -> (joinAgg _),
    "q06_window_topn" -> (windowTopN _),
    "q07_knn_predict" -> (knnPredict _),
    "q08_knn_accuracy" -> (knnAccuracy _),
    "q12_token_stats" -> (tokenStats _),
    "q13_text_quality" -> (textQuality _),
    "q14_lang_id" -> (langIdQuery _),
    "q15_fingerprint" -> (fingerprintQuery _),
    "q16_dedup_exact" -> (dedupExact _),
    "q17_jaccard_pairs" -> (jaccardPairs _),
    "q18_minhash_lsh" -> (minhashLsh _),
    "q19_simhash_pairs" -> (simhashPairs _),
    "q20_cosine_pairs" -> (cosinePairs _),
    "q21_ann_exact" -> (annExact _),
    "q22_ann_lsh" -> (annLsh _),
    "q23_sort_limit" -> (sortLimit _),
    "q24_set_ops" -> (setOps _),
    "q25_semi_anti" -> (semiAnti _),
    "q26_rollup" -> (rollupAgg _),
    "q27_events_windowed" -> (eventsWindowed _),
    "q28_sql_join_agg" -> (sqlJoinAgg _),
    "q29_sql_vector_topk" -> (sqlVectorTopK _),
    "q30_asof_join" -> (asofClickError _),
    "q31_sessionize" -> (sessionize _),
    "q32_distinct_agg" -> (distinctAgg _),
    "q33_cosine_lsh" -> (cosineLsh _),
    "q34_jaccard_capped" -> (jaccardCapped _),
    "q35_pivot" -> (pivotAgg _),
    "q36_wordcount" -> (wordCount _),
    "q37_det_split" -> (deterministicSplit _),
    "q38_normalize" -> (normalizeDocs _),
    "q39_ann_ivf" -> (annIvf _),
    "q40_cube" -> (cubeAgg _),
    "q41_collect" -> (collectAgg _),
    "q42_range_join" -> (rangeClickErrors _),
    "q43_neardup_clusters" -> (neardupClusters _),
    "q44_ann_recall" -> (annRecall _),
    "q45_percentiles" -> (percentiles _),
    "q46_running_totals" -> (runningTotals _),
    "q47_top_bigrams" -> (topBigrams _),
    "q48_quality_filter" -> (qualityFilter _),
    "q49_neardup_survivors" -> (neardupSurvivors _),
    "q50_stratified_sample" -> (stratifiedSampleQ _),
    "q51_grouping_sets" -> (groupingSetsAgg _),
    "q52_tfidf" -> (tfidfTopTerms _),
    "q53_sketch_check" -> (approxSketchCheck _),
    "q54_knn_blocked" -> (knnPredictBlocked _),
    "q55_repetition" -> (repetitionSignals _),
    "q56_decontam" -> (decontamination _),
    "q57_salted_agg" -> (saltedAgg _),
    "q58_bloom_decontam" -> (decontaminationBloom _),
    "q59_pack_sequences" -> (packSequences _),
    "q60_json_extract" -> (jsonProps _),
    "q61_chunking" -> (chunkDocuments _),
    "q62_quant_ann" -> (quantAnn _),
    "q63_quant_recall" -> (quantRecall _),
    "q64_chunk_dedup" -> (chunkDedupSummary _),
    "q65_zorder" -> (zOrderKeys _),
    "q66_source_mix" -> (sourceMix _),
    "q67_redact" -> (redactEvents _),
    "q68_histogram" -> (priceHistogram _),
    "q69_freq_items" -> (freqItems _),
    "q70_pipeline" -> (pipelineE2E _),
    "q71_sliding_window" -> (slidingUserWindow _),
    "q72_profile" -> (profileEvents _),
    "q73_sql_exists" -> (sqlExists _),
    "q74_ntile" -> (balanceDeciles _),
    "q75_monthly" -> (monthlyRevenue _),
    "q76_ship_lag" -> (shipLag _),
    "q77_minhash_est" -> (minhashEstimate _),
    "q78_mean_pool" -> (meanPoolEmbeddings _),
    "q79_retrieval" -> (retrieval _),
    "q80_substring_dups" -> (substringDups _),
    "q81_corr_sums" -> (corrSums _),
    "q82_series_sim" -> (seriesSimilarity _),
    "q83_value_deciles" -> (valueDeciles _),
    "q84_bag_set_ops" -> (bagSetOps _),
    "q85_incr_dedup" -> (incrementalDedup _),
    "q86_gap_fill" -> (gapFillMonthly _),
    "q87_funnel" -> (funnelConversion _),
    "q88_unpivot" -> (unpivotMeasures _),
    "q89_cooccur" -> (typeCooccurrence _),
    "q90_iqr_outliers" -> (iqrOutliers _),
    "q91_latest_record" -> (latestEvents _),
    "q92_cohort_retention" -> (cohortRetention _),
    "q93_assoc_rules" -> (associationRules _),
    "q94_revenue_share" -> (revenueShare _),
    "q95_daily_delta" -> (dailyDelta _),
    "q96_rolling_actives" -> (rollingActives _),
    "q97_transitions" -> (eventTransitions _),
    "q98_series_lsh_recall" -> (seriesLshRecall _),
    "q99_iqr_approx_check" -> (iqrApproxCheck _),
    "q100_dup_excision" -> (dupExcision _),
    "q101_lang_rebalance" -> (langRebalance _),
    "q102_vocab_coverage" -> (vocabCoverage _),
    "q103_scd_intervals" -> (scdIntervals _),
    "q104_quality_budget" -> (qualityBudget _),
    "q105_token_rarity" -> (tokenRarity _),
    "q106_vocab_drift" -> (vocabDrift _),
    "q107_split_leakage" -> (splitLeakage _),
    "q108_source_diversity" -> (sourceDiversity _),
    "q109_source_divergence" -> (sourceDivergence _),
    "q110_simhash64_pairs" -> (simhash64Pairs _),
    "q111_calibration_buckets" -> (calibrationBuckets _),
    "q112_snapshot_drift" -> (snapshotDrift _),
    "q113_retrieval_capped" -> (retrievalCapped _),
    "q114_weighted_admission" -> (weightedAdmission _),
    "q115_lead_survivors" -> (leadSurvivors _),
    "q116_incr_near_dedup" -> (incrementalNearDedup _),
    "q117_packing_efficiency" -> (packingEfficiency _),
    "q118_cluster_sizes" -> (clusterSizeHistogram _),
    "q119_eval_contamination" -> (evalContamination _),
    "q120_temperature_sampling" -> (temperatureSampling _),
    "q121_capped_lsh" -> (cappedLsh _),
    "q122_lsh_bucket_audit" -> (lshBucketAudit _),
    "q123_capped_simhash" -> (cappedSimhash _),
    "q124_bigram_lm" -> (bigramLmScore _),
    "q125_hard_negatives" -> (hardNegatives _),
    "q126_label_purity" -> (labelPurity _),
    "q127_semdedup" -> (semanticDedup _),
    "q128_dup_ngrams" -> (dupNgramFraction _),
    "q129_bpe_merges" -> (bpeMergeRound _),
    "q130_cms_check" -> (cmsHeavyHitters _),
    "q131_soft_dedup" -> (softDedupWeights _),
    "q132_nb_classifier" -> (nbQualityClassifier _),
    "q133_quality_survivors" -> (qualitySurvivors _),
    "q134_shard_layout" -> (shardLayout _),
    "q135_cdc_chunks" -> (cdcChunkDedup _),
    "q136_bpe_train" -> (bpeTrain3 _),
    "q137_bpe_encode" -> (bpeEncode _),
    "q138_bpe_fertility" -> (bpeFertility _),
    "q139_effective_tokens" -> (effectiveTokens _),
    "q140_epoch_plan" -> (epochPlan _),
    "q141_score_calibration" -> (scoreCalibration _),
    "q142_cluster_split" -> (clusterSplit _),
    "q143_winnow_pairs" -> (winnowPairs _),
    "q144_blocklist" -> (blocklistFilter _),
    "q145_dup_taxonomy" -> (dupTaxonomy _),
    "q146_ivf_persisted" -> (annIvfPersisted _),
    "q147_gopher_rules" -> (gopherRules _),
    "q148_winnow_decontam" -> (winnowDecontam _),
    "q149_bpe_drift" -> (bpeDrift _),
    "q150_curation_funnel" -> (curationFunnel _),
    "q151_funnel_by_source" -> (curationFunnelBySource _),
    "q152_cluster_index" -> (neardupClustersPersisted _),
    "q153_capped_semdedup" -> (cappedSemDedup _),
    "q154_semdedup_widths" -> (semDedupWidthAudit _),
    "q155_winnow_index" -> (winnowDecontamPersisted _),
    "q156_capped_clusters" -> (cappedNeardupClusters _),
    "q157_clustering_agreement" -> (clusteringAgreement _),
    "q158_uncertainty_sample" -> (uncertaintySample _),
    "q159_dim_stats" -> (embeddingDimStats _),
    "q160_source_copy_matrix" -> (sourceCopyMatrix _),
    "q161_shingle_saturation" -> (shingleSaturation _),
    "q162_pq_encode" -> (pqEncode _),
    "q163_pq_adc" -> (pqAdcTopK _),
    "q164_pq_rerank" -> (pqRerank _),
    "q165_pq_persisted" -> (pqAdcPersisted _),
    "q166_incr_cluster_merge" -> (incrClusterMerge _),
    "q167_ivfpq_rerank" -> (ivfPqRerank _),
    "q168_incr_cluster_deployed" -> (incrClusterMergeDeployed _),
    "q169_clustering_policy" -> (clusteringPolicy _),
    "q170_ivfpq_incr" -> (ivfPqIncrRerank _),
    "q171_pq_drift" -> (pqDriftAudit _),
    "q172_ivfpq_occupancy" -> (ivfPqOccupancy _),
    "q173_ivfpq_rebalance" -> (ivfPqRebalanced _),
    "q174_ann_maint_policy" -> (annMaintenancePolicy _),
    "q175_ann_maint_residual" -> (annMaintPolicyResidual _),
    "q176_ivfpq_budget" -> (ivfPqBudgetRerank _),
    "q177_ivfpq_adaptive" -> (ivfPqAdaptiveRerank _),
    "q178_ann_bit_budget" -> (annBitBudgetAudit _),
    "q179_ann_exact_fallback" -> (ivfPqExactFallback _),
    "q180_ann_maint_ladder" -> (annMaintLadder _),
    "q181_ann_search_dispatch" ->
      ((s: SparkSession, d: String) => ivfPqSearchDispatch(s, d)),
    "q182_ann_dispatch_sized" ->
      ((s: SparkSession, d: String) => ivfPqSearchDispatchSized(s, d)),
    "q183_ivfpq_compacted" -> (ivfPqCompacted _),
    "q184_ivfpq_file_audit" -> (ivfPqFileAudit _),
    "q185_rerank_calibration" -> (rerankCalibrationFit _),
    "q186_compaction_cadence" -> (ivfPqCompactionCadence _),
    "q187_vecstore_incr" -> (ivfPqIncrStoreRerank _),
    "q188_vecstore_audit" -> (vecStoreAudit _),
    "q189_vecstore_cadence" -> (vecStoreCadence _),
    "q190_store_sizing" -> (storeSizing _),
    "q191_vecstore_pruned" -> (vecStorePrunedRerank _))

  /** DuckDB-dialect oracle SQL, one per query, same column names/types. */
  val oracles: Map[String, String] = {
    val base = oracleSqlA ++ oracleSqlB ++ oracleSqlC ++ oracleSqlD
    // Persisted-artifact queries share their inline twin's oracle
    // VERBATIM (the q54/q58 shared-oracle discipline), so any artifact
    // round-trip drift is a hash flip against the same ground truth:
    // q146 = q39's search from the parquet IVF index, q152 = q43's
    // clustering from the parquet cluster index, q155 = q148's
    // decontamination from the parquet winnow index.
    base + ("q146_ivf_persisted" -> base("q39_ann_ivf")) +
      ("q152_cluster_index" -> base("q43_neardup_clusters")) +
      ("q155_winnow_index" -> base("q148_winnow_decontam")) +
      ("q165_pq_persisted" -> base("q163_pq_adc")) +
      // q166's incremental merge must equal a FULL rebuild — the
      // bit-equality contract of clustering maintenance — and q168
      // (the artifact-fed deployment merge) inherits the same
      // contract against the same ground truth
      ("q166_incr_cluster_merge" -> base("q43_neardup_clusters")) +
      ("q168_incr_cluster_deployed" -> base("q43_neardup_clusters")) +
      // q183: compaction changes file boundaries, never rows — the
      // compacted tree's search replays under q170's oracle VERBATIM
      ("q183_ivfpq_compacted" -> base("q170_ivfpq_incr")) +
      // q187: store maintenance changes no ROWS either — the
      // incrementally-appended vector store re-ranking q170's
      // candidates replays under q170's oracle verbatim (a stale
      // store would DROP the appended items and hash-mismatch)
      ("q187_vecstore_incr" -> base("q170_ivfpq_incr")) +
      // q191: the PRUNED store plan over q170's query SUBSET
      // (% 100 = 0 ⊂ % 10 = 0; per query the probe + re-rank depend
      // only on the query vector and the index, so the subset's rows
      // are the filtered superset's) — the deployment-default isin
      // pushdown replays under q170's ground truth
      ("q191_vecstore_pruned" ->
        s"""SELECT query_id, rank, neighbor_id, dist_micro
            FROM (${base("q170_ivfpq_incr")}) AS q170
            WHERE query_id % 100 = 0""")
    // q184_ivfpq_file_audit and q186_compaction_cadence have NO
    // oracle by construction: file layout (and its growth history)
    // is write-history, not corpus — nothing SQL-derivable to replay
    // (driver records the rows-only check; IvfPqSpec gates the
    // decision branches, q183 gates the dispatched-to operator).
    // q188_vecstore_audit and q189_vecstore_cadence are the same
    // contract for the vector store (VectorStoreSpec pins the
    // branches; the ensure/rebuild path is oracle-exercised by every
    // store gate).
  }
}
