package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.r4GroupAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_clean_standardize" -> (ReferenceQueries.r1CleanStandardize _),
    "r2_dq_profile"        -> (ReferenceQueries.r2DqProfile _),
    "r3_dedup_keep_first"  -> (ReferenceQueries.r3DedupKeepFirst _),
    "r4_group_avg"         -> (ReferenceQueries.r4GroupAvg _),
    "r5_latest_per_key"    -> (ReferenceQueries.r5LatestPerKey _),
    "r6_topk"              -> (ReferenceQueries.r6TopK _),
    "r7_epoch_roundtrip"   -> (ReferenceQueries.r7EpochRoundtrip _),
    "x1_join_broadcast"    -> (ExtendedQueries.x1JoinBroadcast _),
    "x2_join_shuffle_agg"  -> (ExtendedQueries.x2JoinShuffleAgg _),
    "x3_join_anti"         -> (ExtendedQueries.x3JoinAnti _),
    "x4_rollup"            -> (ExtendedQueries.x4Rollup _),
    "x5_window_running"    -> (ExtendedQueries.x5WindowRunning _),
    "x6_sessionize"        -> (ExtendedQueries.x6Sessionize _),
    "x7_set_ops"           -> (ExtendedQueries.x7SetOps _),
    "x8_json_extract"      -> (ExtendedQueries.x8JsonExtract _),
    "x8b_variant_extract"  -> (ExtendedQueries.x8bVariantExtract _),
    "x9_text_tokens"       -> (ExtendedQueries.x9TextTokens _),
    "x10_exact_dedup_hash" -> (ExtendedQueries.x10ExactDedupHash _),
    "x11_cosine_topk"      -> (ExtendedQueries.x11CosineTopk _),
    "x12_distinct"         -> (ExtendedQueries.x12Distinct _),
    "x12b_distinct_approx" -> (ExtendedQueries.x12bDistinctApprox _),
    "x13_minhash_neardup"  -> (LlmQueries.x13MinhashNearDedup _),
    "x13b_minhash_native"  -> (LlmQueries.x13bMinhashNative _),
    "x14_text_stats"       -> (LlmQueries.x14TextStats _),
    "x15_language_id"      -> (LlmQueries.x15LanguageId _),
    "x16_quality_score"    -> (LlmQueries.x16QualityScore _),
    "x17_fingerprint"      -> (LlmQueries.x17Fingerprint _),
    "x18_token_count"      -> (LlmQueries.x18TokenCount _),
    "x19_simhash"          -> (LlmQueries.x19Simhash _),
    "x20_jaccard_pairs"    -> (LlmQueries.x20JaccardPairs _),
    "x21_ann_bucketed"     -> (LlmQueries.x21AnnBucketed _),
    "x22_asof_join"        -> (ExtendedQueries.x22AsofJoin _),
    "x23_cube"             -> (ExtendedQueries.x23Cube _),
    "x24_pivot"            -> (ExtendedQueries.x24Pivot _),
    "x25_percentiles"      -> (ExtendedQueries.x25Percentiles _),
    "x25b_percentiles_approx" -> (ExtendedQueries.x25bPercentilesApprox _),
    "x26_window_ranks"     -> (ExtendedQueries.x26WindowRanks _),
    "x27_part_supplier"    -> (ExtendedQueries.x27PartSupplier _),
    "x28_cosine_neardup"   -> (LlmQueries.x28CosineNeardup _),
    "x28b_cosine_wide"     -> (LlmQueries.x28bCosineNeardupWide _),
    "x29_range_join"       -> (ExtendedQueries.x29RangeJoin _),
    "x30_hash_sample"      -> (LlmQueries.x30HashSample _),
    "x31_bigram_stats"     -> (LlmQueries.x31BigramStats _),
    "x32_ivf_ann"          -> (LlmQueries.x32IvfAnn _),
    "x33_salted_agg"       -> (ExtendedQueries.x33SaltedAgg _),
    "x34_prep_pipeline"    -> (LlmQueries.x34PrepPipeline _),
    "x35_simhash_pairs"    -> (LlmQueries.x35SimhashPairs _),
    "x35b_simhash_wide"    -> (LlmQueries.x35bSimhashPairsWide _),
    "x36_intersect"        -> (ExtendedQueries.x36Intersect _),
    "x37_semi_join"        -> (ExtendedQueries.x37SemiJoin _),
    "x38_grouping_sets"    -> (ExtendedQueries.x38GroupingSets _),
    "x39_full_outer"       -> (ExtendedQueries.x39FullOuter _),
    "x40_jsonl_roundtrip"  -> (ExtendedQueries.x40JsonlRoundtrip _),
    "x41_repetition"       -> (LlmQueries.x41RepetitionSignals _),
    "x42_stratified_sample" -> (LlmQueries.x42StratifiedSample _),
    "x43_contamination"    -> (LlmQueries.x43Contamination _),
    "x44_moving_avg"       -> (ExtendedQueries.x44MovingAvg _),
    "x45_gap_fill"         -> (ExtendedQueries.x45GapFill _),
    "x46_prep_v2"          -> (LlmQueries.x46PrepPipelineV2 _),
    "x47_dedup_components" -> (LlmQueries.x47DedupComponents _),
    "x48_incremental_dedup" -> (LlmQueries.x48IncrementalDedup _),
    "x49_pq_ann"           -> (LlmQueries.x49PqAnn _),
    "x50_tfidf_terms"      -> (LlmQueries.x50TfidfTerms _),
    "x51_adaptive_gate"    -> (LlmQueries.x51AdaptiveQualityGate _),
    "x52_kmeans_step"      -> (LlmQueries.x52KmeansStep _),
    "x53_chunk_dedup"      -> (LlmQueries.x53ChunkDedup _),
    "x54_domain_rebalance" -> (LlmQueries.x54DomainRebalance _),
    "x55_lexical_diversity" -> (LlmQueries.x55LexicalDiversity _),
    "x56_knn_classify"     -> (LlmQueries.x56KnnClassify _),
    "x56b_knn_ann"         -> (LlmQueries.x56bKnnAnn _),
    "x57_containment"      -> (LlmQueries.x57Containment _),
    "x58_orc_roundtrip"    -> (ExtendedQueries.x58OrcRoundtrip _),
    "x59_semdedup"         -> (LlmQueries.x59SemDedup _),
    "x59b_semdedup_wide"   -> (LlmQueries.x59bSemDedupWide _),
    "x60_sequence_pack"    -> (LlmQueries.x60SequencePack _),
    "x61_merge_upsert"     -> (ExtendedQueries.x61MergeUpsert _),
    "x62_minhash_estimate" -> (LlmQueries.x62MinhashEstimate _),
    "x63_rarity_score"     -> (LlmQueries.x63RarityScore _),
    "x64_pii_scrub"        -> (LlmQueries.x64PiiScrub _),
    "x65_vocab_coverage"   -> (LlmQueries.x65VocabCoverage _),
    "x66_best_of_dupes"    -> (LlmQueries.x66BestOfDupes _),
    "x67_source_overlap"   -> (LlmQueries.x67SourceOverlap _),
    "x68_dup_rate_source"  -> (LlmQueries.x68DupRateBySource _),
    "x69_prep_v3"          -> (LlmQueries.x69PrepPipelineV3 _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.rGroup ++ Oracles.xGroup ++ Oracles.lGroup
}
