package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CleanPipeline, CurationOps, Multimodal, Skew, StatsOps, TextOps, TimeJoins, TrainingOps, VectorOps}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Every implemented operator has a `queries` entry; SQL-expressible ones
  * also have an `oracleSql` entry the driver checks against DuckDB on the
  * same parquet tables. Column names match between the two by construction
  * (SURVEY §4 determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_groupby"     -> (Relational.q01 _),
    "q02_filter_daterange" -> (Relational.q02 _),
    "q03_json_extract"    -> (Relational.q03 _),
    "q04_join_dims"       -> (Relational.q04 _),
    "q05_type_infer"      -> (Relational.q05 _),
    "q06_pivot_per_type"  -> (Relational.q06 _),
    "q07_window_running"  -> (Relational.q07 _),
    "q08_topk_per_group"  -> (Relational.q08 _),
    "q09_anti_semi_join"  -> (Relational.q09 _),
    "q10_sessionize"      -> (Relational.q10 _),
    "q11_time_bucket_agg" -> (Relational.q11 _),
    "q12_multi_join_fact" -> (Relational.q12 _),
    "q13_global_topn"     -> (Relational.q13 _),
    "q14_rollup"          -> (Relational.q14 _),
    "q15_scalar_subquery" -> (Relational.q15 _),
    "q16_set_ops"         -> (Relational.q16 _),
    "q17_salted_agg"      -> (Skew.q17 _),
    "q18_cube"            -> (Relational.q18 _),
    "q19_scalar_funcs"    -> (Relational.q19 _),
    "q20_dedup_exact"     -> (TextOps.dedupExact _),
    "q21_token_count"     -> (TextOps.tokenCount _),
    "q22_quality_score"   -> (TextOps.qualityScore _),
    "q23_langid"          -> (TextOps.langId _),
    "q24_fingerprint"     -> (TextOps.fingerprint _),
    "q25_minhash_lsh"     -> (TextOps.minhashLsh _),
    "q26_simhash"         -> (TextOps.simhashPairs _),
    "q27_ngram_jaccard"   -> ((s: SparkSession, d: String) => TextOps.ngramJaccard(s, d)),
    "q28_cosine_topk"     -> (VectorOps.cosineTopK _),
    "q29_ann_lsh"         -> ((s: SparkSession, d: String) => VectorOps.annLsh(s, d)),
    "q30_embed_neardup"   -> (VectorOps.embedNearDup _),
    "q32_ann_ivf"         -> (VectorOps.annIvf _),
    "q33_clean_pipeline"  -> (CleanPipeline.q33 _),
    "q31_multimodal_pipe" -> (Multimodal.pipeline _),
    "q34_top_terms"       -> (TextOps.topTerms _),
    "q35_funnel"          -> (Relational.q35 _),
    "q36_embed_quantize"  -> (VectorOps.quantize _),
    "q37_asof_join"       -> (TimeJoins.asofJoin _),
    "q38_range_join"      -> (TimeJoins.rangeJoin _),
    "q39_decontaminate"   -> (TrainingOps.decontaminate _),
    "q40_split_hash"      -> (TrainingOps.splitHash _),
    "q41_repetition_quality" -> (TrainingOps.repetitionQuality _),
    "q42_kmv_distinct"    -> (TrainingOps.kmvDistinct _),
    "q43_percentiles"     -> (TrainingOps.percentiles _),
    "q44_countmin_topterms" -> (TrainingOps.countMinTopTerms _),
    "q45_stratified_sample" -> (TrainingOps.stratifiedSample _),
    "q46_ann_pq"          -> (VectorOps.annPq _),
    "q47_dup_clusters"    -> (CurationOps.dupClusters _),
    "q48_pii_scrub"       -> (CurationOps.scrubPii _),
    "q49_bm25"            -> (CurationOps.bm25 _),
    "q50_pack_sequences"  -> (CurationOps.packSequences _),
    "q51_gram_coverage"   -> (CurationOps.gramCoverage _),
    "q52_incremental_dedup" -> (CurationOps.incrementalDedup _),
    "q53_mix_weights"     -> (CurationOps.mixWeights _),
    "q54_source_overlap"  -> (CurationOps.sourceOverlap _),
    "q55_hybrid_rrf"      -> (CurationOps.hybridRrf _),
    "q56_cluster_best"    -> (CurationOps.clusterBest _),
    "q57_dsir_weights"    -> (CurationOps.dsirWeights _),
    "q58_token_entropy"   -> (TrainingOps.tokenEntropy _),
    "q59_pmi_collocations" -> (TextOps.pmiCollocations _),
    "q60_winnow_fingerprints" -> (TextOps.winnowFingerprints _),
    "q61_topk_agg"        -> (Relational.q61 _),
    "q62_bloom_gate"      -> (TrainingOps.bloomGate _),
    "q63_hll_distinct"    -> (TrainingOps.hllDistinct _),
    "q64_shared_runs"     -> (TextOps.sharedRuns _),
    "q65_semdedup"        -> (VectorOps.semDedup _),
    "q66_nb_classify"     -> (CurationOps.nbClassify _),
    "q67_weighted_sample" -> (TrainingOps.weightedSample _),
    "q68_lm_score"        -> (CurationOps.lmScore _),
    "q69_approx_percentiles" -> (TrainingOps.approxPercentiles _),
    "q70_temperature_mix" -> (CurationOps.temperatureMix _),
    "q71_source_drift"    -> (StatsOps.sourceDrift _),
    "q72_centroid_sim"    -> (VectorOps.centroidSim _),
    "q73_tfidf_terms"     -> (StatsOps.tfidfTerms _),
    "q74_threshold_sweep" -> (StatsOps.thresholdSweep _),
    "q75_random_projection" -> (VectorOps.randomProjection _),
    "q76_dataset_card"    -> (StatsOps.datasetCard _),
    "q77_zipf_slope"      -> (StatsOps.zipfSlope _),
    "q78_fuzzy_clusters"  -> (CurationOps.fuzzyClusters _),
    "q79_quantile_normalize" -> (StatsOps.quantileNormalize _),
    "q80_doc_chunks"      -> (CurationOps.docChunks _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_groupby"     -> Relational.q01Sql,
    "q02_filter_daterange" -> Relational.q02Sql,
    "q03_json_extract"    -> Relational.q03Sql,
    "q04_join_dims"       -> Relational.q04Sql,
    "q05_type_infer"      -> Relational.q05Sql,
    "q06_pivot_per_type"  -> Relational.q06Sql,
    "q07_window_running"  -> Relational.q07Sql,
    "q08_topk_per_group"  -> Relational.q08Sql,
    "q09_anti_semi_join"  -> Relational.q09Sql,
    "q10_sessionize"      -> Relational.q10Sql,
    "q11_time_bucket_agg" -> Relational.q11Sql,
    "q12_multi_join_fact" -> Relational.q12Sql,
    "q13_global_topn"     -> Relational.q13Sql,
    "q14_rollup"          -> Relational.q14Sql,
    "q15_scalar_subquery" -> Relational.q15Sql,
    "q16_set_ops"         -> Relational.q16Sql,
    "q17_salted_agg"      -> Skew.q17Sql,
    "q18_cube"            -> Relational.q18Sql,
    "q19_scalar_funcs"    -> Relational.q19Sql,
    "q20_dedup_exact"     -> TextOps.dedupExactSql,
    "q21_token_count"     -> TextOps.tokenCountSql,
    "q22_quality_score"   -> TextOps.qualityScoreSql,
    "q23_langid"          -> TextOps.langIdSql,
    "q24_fingerprint"     -> TextOps.fingerprintSql,
    "q25_minhash_lsh"     -> TextOps.minhashLshSql,
    "q26_simhash"         -> TextOps.simhashSql,
    "q27_ngram_jaccard"   -> TextOps.ngramJaccardSql,
    "q28_cosine_topk"     -> VectorOps.cosineTopKSql,
    "q29_ann_lsh"         -> VectorOps.annLshSql,
    "q30_embed_neardup"   -> VectorOps.embedNearDupSql,
    "q31_multimodal_pipe" -> Multimodal.pipelineSql,
    "q33_clean_pipeline"  -> CleanPipeline.cleanSql,
    "q34_top_terms"       -> TextOps.topTermsSql,
    "q35_funnel"          -> Relational.q35Sql,
    "q36_embed_quantize"  -> VectorOps.quantizeSql,
    "q37_asof_join"       -> TimeJoins.asofJoinSql,
    "q38_range_join"      -> TimeJoins.rangeJoinSql,
    "q39_decontaminate"   -> TrainingOps.decontaminateSql,
    "q40_split_hash"      -> TrainingOps.splitHashSql,
    "q41_repetition_quality" -> TrainingOps.repetitionQualitySql,
    "q42_kmv_distinct"    -> TrainingOps.kmvDistinctSql,
    "q43_percentiles"     -> TrainingOps.percentilesSql,
    "q44_countmin_topterms" -> TrainingOps.countMinTopTermsSql,
    "q45_stratified_sample" -> TrainingOps.stratifiedSampleSql,
    "q47_dup_clusters"    -> CurationOps.dupClustersSql,
    "q48_pii_scrub"       -> CurationOps.scrubPiiSql,
    "q49_bm25"            -> CurationOps.bm25Sql,
    "q50_pack_sequences"  -> CurationOps.packSequencesSql,
    "q51_gram_coverage"   -> CurationOps.gramCoverageSql,
    "q52_incremental_dedup" -> CurationOps.incrementalDedupSql,
    "q53_mix_weights"     -> CurationOps.mixWeightsSql,
    "q54_source_overlap"  -> CurationOps.sourceOverlapSql,
    "q55_hybrid_rrf"      -> CurationOps.hybridRrfSql,
    "q56_cluster_best"    -> CurationOps.clusterBestSql,
    "q57_dsir_weights"    -> CurationOps.dsirWeightsSql,
    "q58_token_entropy"   -> TrainingOps.tokenEntropySql,
    "q59_pmi_collocations" -> TextOps.pmiCollocationsSql,
    "q60_winnow_fingerprints" -> TextOps.winnowFingerprintsSql,
    "q32_ann_ivf"         -> VectorOps.annIvfSql,
    "q46_ann_pq"          -> VectorOps.annPqSql,
    "q61_topk_agg"        -> Relational.q61Sql,
    "q62_bloom_gate"      -> TrainingOps.bloomGateSql,
    "q63_hll_distinct"    -> TrainingOps.hllDistinctSql,
    "q64_shared_runs"     -> TextOps.sharedRunsSql,
    "q65_semdedup"        -> VectorOps.semDedupSql,
    "q66_nb_classify"     -> CurationOps.nbClassifySql,
    "q67_weighted_sample" -> TrainingOps.weightedSampleSql,
    "q68_lm_score"        -> CurationOps.lmScoreSql,
    "q69_approx_percentiles" -> TrainingOps.approxPercentilesSql,
    "q70_temperature_mix" -> CurationOps.temperatureMixSql,
    "q71_source_drift"    -> StatsOps.sourceDriftSql,
    "q72_centroid_sim"    -> VectorOps.centroidSimSql,
    "q73_tfidf_terms"     -> StatsOps.tfidfTermsSql,
    "q74_threshold_sweep" -> StatsOps.thresholdSweepSql,
    "q75_random_projection" -> VectorOps.randomProjectionSql,
    "q76_dataset_card"    -> StatsOps.datasetCardSql,
    "q77_zipf_slope"      -> StatsOps.zipfSlopeSql,
    "q78_fuzzy_clusters"  -> CurationOps.fuzzyClustersSql,
    "q79_quantile_normalize" -> StatsOps.quantileNormalizeSql,
    "q80_doc_chunks"      -> CurationOps.docChunksSql
    // q25/q26/q29/q30 are oracled EXACTLY: Spark's xxhash64 is emulated in
    // DuckDB HUGEINT arithmetic (DuckHash), so signatures/bands/buckets/
    // probes/pairs are engine-identical, not probabilistically equivalent
    // (q30's < 1 LSH recall doesn't matter — the oracle re-derives the SAME
    // candidate generation, not an exact all-pairs equivalent).
    // q27/q33 are oracled via exact all-pairs Jaccard at the 0.9 cut
    // (recall ≈ 0.9998/pair). q32/q46's driver-side k-means trainers are
    // deterministic (systematic sample, fixed iterations, first-wins
    // argmax, ordered accumulation), so even the Lloyd iterations are
    // emulated in DuckDB — unrolled CTE chains with every float op a left
    // fold in the Scala evaluation order.
  )
}
