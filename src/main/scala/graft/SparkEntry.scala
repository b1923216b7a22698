package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  */
object SparkEntry {
  import graft.operators._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Windows.q12DailyRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_agg" -> (Relational.q01ScanAgg _),
    "q02_filter_project" -> (Relational.q02FilterProject _),
    "q03_join_broadcast" -> (Relational.q03JoinBroadcast _),
    "q04_multijoin" -> (Relational.q04MultiJoin _),
    "q05_case_tiers" -> (Relational.q05CaseTiers _),
    "q06_weekly_summary" -> (Relational.q06WeeklySummary _),
    "q07_semantic_view" -> (Relational.q07SemanticView _),
    "q08_window_lag_lead" -> (Windows.q08WindowLagLead _),
    "q09_window_rolling" -> (Windows.q09WindowRolling _),
    "q10_rownum_dedup" -> (Windows.q10RownumDedup _),
    "q11_forward_fill" -> (Windows.q11ForwardFill _),
    "q12_daily_rollup" -> (Windows.q12DailyRollup _),
    "q13_training_load" -> (Analytics.q13TrainingLoad _),
    "q14_anomaly_zscore" -> (Analytics.q14AnomalyZscore _),
    "q15_spearman_lag" -> (Analytics.q15SpearmanLag _),
    "q16_quality_asserts" -> (Analytics.q16QualityAsserts _),
    "q17_json_normalize" -> (Analytics.q17JsonNormalize _),
    "q18_struct_json" -> (Analytics.q18StructJson _),
    "q19_tumbling_window" -> (Analytics.q19TumblingWindow _),
    "q20_dedup_exact" -> (Dedup.q20DedupExact _),
    "q21_dedup_minhash" -> (Dedup.q21DedupMinhash _),
    "q22_dedup_simhash" -> (Dedup.q22DedupSimhash _),
    "q23_ngram_jaccard" -> (Dedup.q23NgramJaccard _),
    "q24_dedup_embedding" -> (Ann.q24DedupEmbedding _),
    "q25_ann_bruteforce" -> (Ann.q25AnnBruteforce _),
    "q26_ann_lsh" -> (Ann.q26AnnLsh _),
    "q27_text_stats" -> (TextOps.q27TextStats _),
    "q28_lang_id" -> (TextOps.q28LangId _),
    "q29_fingerprint" -> (TextOps.q29Fingerprint _),
    "q30_multimodal" -> (Multimodal.q30Multimodal _),
    "q31_linear_impact" -> (Analytics.q31LinearImpact _),
    "q32_percentiles" -> (Analytics.q32Percentiles _),
    "q33_histogram" -> (Analytics.q33Histogram _),
    "q34_rollup_totals" -> (Relational.q34Rollup _),
    "q35_dedup_incremental" -> (Dedup.q35DedupIncremental _),
    "q36_cube_totals" -> (Relational.q36Cube _),
    "q37_ranking_suite" -> (Relational.q37Ranking _),
    "q38_what_if" -> (Predictive.q38WhatIf _),
    "q39_next_day_prediction" -> (Predictive.q39NextDayPrediction _),
    "q40_cohort_optimization" -> (Predictive.q40CohortOptimization _),
    "q41_trend_analyzer" -> (Predictive.q41TrendAnalyzer _),
    "q42_predict_score" -> (Predictive.q42PredictScore _),
    "q43_percentiles_approx" -> (Analytics.q43PercentilesApprox _),
    "q44_multiday_plan" -> (Predictive.q44MultidayPlan _),
    "q45_feature_selection" -> (Predictive.q45FeatureSelection _),
    "q46_dedup_clusters" -> (Clusters.q46DedupClusters _),
    "q47_split_assign" -> (Sampling.q47SplitAssign _),
    "q48_stratified_sample" -> ((s, d) => Sampling.q48StratifiedSample(s, d)),
    "q49_source_mixing" -> (Sampling.q49SourceMixing _),
    "q50_pack_sequences" -> ((s, d) => Sampling.q50PackSequences(s, d)),
    "q51_decontaminate" -> (Curation.q51Decontaminate _),
    "q52_pii_redact" -> (Curation.q52PiiRedact _),
    "q53_curated_corpus" -> (Curation.q53CuratedCorpus _),
    "q54_recovery_windows" -> (Predictive.q54RecoveryWindows _),
    "q55_column_profile" -> (Profile.q55ColumnProfile _),
    "q56_sessionize_batch" -> (Temporal.q56SessionizeBatch _),
    "q57_asof_join" -> (Temporal.q57AsofJoin _),
    "q58_pivot" -> (Reshape.q58Pivot _),
    "q59_date_spine" -> (Reshape.q59DateSpine _),
    "q60_scd2" -> (Scd.q60Scd2 _),
    "q61_range_frames" -> (Temporal.q61RangeFrames _),
    "q62_fuzzy_match" -> (Dedup.q62FuzzyMatch _),
    "q63_tfidf_terms" -> ((s, d) => TextRank.q63TfidfTerms(s, d)),
    "q64_funnel" -> (TextRank.q64Funnel _),
    "q65_snapshot_diff" -> (CorpusOps.q65SnapshotDiff _),
    "q66_repetition" -> (CorpusOps.q66Repetition _),
    "q67_vocab" -> ((s, d) => CorpusOps.q67Vocab(s, d)),
    "q68_centroids" -> (CorpusOps.q68Centroids _),
    "q69_filter_attrition" -> (CorpusOps.q69FilterAttrition _),
    "q70_drift_chi2" -> (Profile.q70DriftChi2 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_agg" -> Relational.q01Sql,
    "q02_filter_project" -> Relational.q02Sql,
    "q03_join_broadcast" -> Relational.q03Sql,
    "q04_multijoin" -> Relational.q04Sql,
    "q05_case_tiers" -> Relational.q05Sql,
    "q06_weekly_summary" -> Relational.q06Sql,
    "q07_semantic_view" -> Relational.q07Sql,
    "q08_window_lag_lead" -> Windows.q08Sql,
    "q09_window_rolling" -> Windows.q09Sql,
    "q10_rownum_dedup" -> Windows.q10Sql,
    "q11_forward_fill" -> Windows.q11Sql,
    "q12_daily_rollup" -> Windows.q12Sql,
    "q13_training_load" -> Analytics.q13Sql,
    "q14_anomaly_zscore" -> Analytics.q14Sql,
    "q15_spearman_lag" -> Analytics.q15Sql,
    "q16_quality_asserts" -> Analytics.q16Sql,
    "q17_json_normalize" -> Analytics.q17Sql,
    "q18_struct_json" -> Analytics.q18Sql,
    "q19_tumbling_window" -> Analytics.q19Sql,
    "q20_dedup_exact" -> Dedup.q20Sql,
    "q21_dedup_minhash" -> Dedup.q21Sql,
    "q22_dedup_simhash" -> Dedup.q22Sql,
    "q23_ngram_jaccard" -> Dedup.q23Sql,
    "q24_dedup_embedding" -> Ann.q24Sql,
    "q25_ann_bruteforce" -> Ann.q25Sql,
    "q26_ann_lsh" -> Ann.q26Sql,
    "q27_text_stats" -> TextOps.q27Sql,
    "q28_lang_id" -> TextOps.q28Sql,
    "q29_fingerprint" -> TextOps.q29Sql,
    "q30_multimodal" -> Multimodal.q30Sql,
    "q31_linear_impact" -> Analytics.q31Sql,
    "q32_percentiles" -> Analytics.q32Sql,
    "q33_histogram" -> Analytics.q33Sql,
    "q34_rollup_totals" -> Relational.q34Sql,
    "q35_dedup_incremental" -> Dedup.q35Sql,
    "q36_cube_totals" -> Relational.q36Sql,
    "q37_ranking_suite" -> Relational.q37Sql,
    "q38_what_if" -> Predictive.q38Sql,
    "q39_next_day_prediction" -> Predictive.q39Sql,
    "q40_cohort_optimization" -> Predictive.q40Sql,
    "q41_trend_analyzer" -> Predictive.q41Sql,
    "q42_predict_score" -> Predictive.q42Sql,
    "q44_multiday_plan" -> Predictive.q44Sql,
    "q45_feature_selection" -> Predictive.q45Sql,
    "q46_dedup_clusters" -> Clusters.q46Sql,
    "q47_split_assign" -> Sampling.q47Sql,
    "q48_stratified_sample" -> Sampling.q48Sql,
    "q49_source_mixing" -> Sampling.q49Sql,
    "q50_pack_sequences" -> Sampling.q50Sql,
    "q51_decontaminate" -> Curation.q51Sql,
    "q52_pii_redact" -> Curation.q52Sql,
    "q53_curated_corpus" -> Curation.q53Sql,
    "q54_recovery_windows" -> Predictive.q54Sql,
    "q55_column_profile" -> Profile.q55Sql,
    "q56_sessionize_batch" -> Temporal.q56Sql,
    "q57_asof_join" -> Temporal.q57Sql,
    "q58_pivot" -> Reshape.q58Sql,
    "q59_date_spine" -> Reshape.q59Sql,
    "q60_scd2" -> Scd.q60Sql,
    "q61_range_frames" -> Temporal.q61Sql,
    "q62_fuzzy_match" -> Dedup.q62Sql,
    "q63_tfidf_terms" -> TextRank.q63Sql,
    "q64_funnel" -> TextRank.q64Sql,
    "q65_snapshot_diff" -> CorpusOps.q65Sql,
    "q66_repetition" -> CorpusOps.q66Sql,
    "q67_vocab" -> CorpusOps.q67Sql,
    "q68_centroids" -> CorpusOps.q68Sql,
    "q69_filter_attrition" -> CorpusOps.q69Sql,
    "q70_drift_chi2" -> Profile.q70Sql,
    // q21/q22/q23/q46 gained full oracles in round 4: their base hash is
    // md5-derived (engine-portable) so DuckDB replays the whole LSH
    // pipeline, incl. the hot-bucket guard (windows) and the component
    // closure (recursive CTE). q24/q26 followed in the same round: sign
    // fingerprints are exact integer dots over quantized components
    // (floor(x·1e7)) with a ±1 md5-parity plane matrix, and verification
    // cosines are decimal folds — every step engine-portable.
    // Still rows-only by design:
    // q43: approx-percentile sketch — engine-specific results by design;
    // ApproxPercentileSpec asserts the rank-error bound vs exact q32.
  )
}
