package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2's inventory
  * (engine ops E1-E9 via the MR queries; [EXT] relational / LLM-pipeline
  * ops via graft.operators). Each key present in `oracleSql` is
  * hash-compared against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference apps through the faithful MR engine (A1/A2 on E1-E9)
    "mr_wordcount"      -> (MrQueries.mrWordCount _),
    "mr_inverted_index" -> (MrQueries.mrInvertedIndex _),
    "mr_sorted_concat"  -> (MrQueries.mrSortedConcat _),
    // -- idiomatic DataFrame twins
    "wc_native"             -> (MrQueries.wcNative _),
    "inverted_index_native" -> (MrQueries.invertedIndexNative _),
    // -- relational [EXT]
    "q1_pricing_summary"  -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier"   -> (Relational.q5LocalSupplier _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q18_large_orders"    -> (Relational.q18LargeOrders _),
    "q21_waiting_orders"  -> (Relational.q21WaitingOrders _),
    "join_broadcast_part" -> (Relational.joinBroadcastPart _),
    "join_semi"           -> (Relational.joinSemi _),
    "join_anti"           -> (Relational.joinAnti _),
    "join_full_outer"     -> (Relational.joinFullOuter _),
    "join_theta"          -> (Relational.joinTheta _),
    "join_salted"         -> (Skew.joinSalted _),
    "window_topk"         -> (Relational.windowTopkPerCustomer _),
    "window_analytics"    -> (Relational.windowAnalytics _),
    "agg_rollup"          -> (Relational.aggRollup _),
    "agg_histogram"       -> (Relational.aggHistogram _),
    "agg_correlation"     -> (Relational.aggCorrelation _),
    "agg_cube"            -> (Relational.aggCube _),
    "agg_distinct"        -> (Relational.aggDistinct _),
    "topk_orders"         -> (Relational.topkOrders _),
    "set_ops"             -> (Relational.setOps _),
    "scalar_functions"    -> (Relational.scalarFunctions _),
    "json_extract"        -> (Relational.jsonExtract _),
    // -- event-time windowing [EXT]
    "events_hourly"     -> (Events.eventsHourly _),
    "events_sliding"    -> (Events.eventsSliding _),
    "events_sessionize" -> (Events.eventsSessionize _),
    "events_funnel"     -> (Events.eventsFunnel _),
    "events_cohorts"    -> (Events.eventsCohorts _),
    "events_outliers"   -> (Events.eventsOutliers _),
    "events_gapfill"    -> (Events.eventsGapfill _),
    "window_distribution" -> (Relational.windowDistribution _),
    // -- dedup [EXT]
    "dedup_exact"         -> (Dedup.dedupExact _),
    "dedup_minhash_lsh"   -> (Dedup.dedupMinhashLsh _),
    "minhash_signatures"  -> (Dedup.minhashSignatures _),
    "dedup_simhash"       -> (Dedup.dedupSimhash _),
    "dedup_simhash_pairs" -> (Dedup.dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard _),
    "dedup_components"    -> (Dedup.dedupComponents _),
    "dedup_apply"         -> (Dedup.dedupApply _),
    "dedup_edit_distance" -> (Dedup.dedupEditDistance _),
    "embed_quantize"      -> (Similarity.embedQuantize _),
    // -- text analysis [EXT]
    "text_tokens"      -> (TextAnalysis.textTokens _),
    "text_quality"     -> (TextAnalysis.textQuality _),
    "text_langid"      -> (TextAnalysis.textLangid _),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "text_pii_redact"  -> (TextAnalysis.textPiiRedact _),
    "text_repetition"  -> (TextAnalysis.textRepetition _),
    "text_ngram_vocab" -> (TextAnalysis.textNgramVocab _),
    "text_boilerplate" -> (TextAnalysis.textBoilerplate _),
    "text_unigram_lm"  -> (TextAnalysis.textUnigramLm _),
    // -- deterministic sampling / dataset splitting [EXT]
    "sample_split"      -> (Sampling.sampleSplit _),
    "sample_stratified" -> (Sampling.sampleStratified _),
    "split_contamination" -> (Sampling.splitContamination _),
    "split_ngram_decontam" -> (Sampling.splitNgramDecontam _),
    "corpus_prep"         -> (Pipeline.corpusPrep _),
    // -- similarity search [EXT]
    "ann_bruteforce_topk" -> (Similarity.annBruteforceTopk _),
    "ann_ivf_topk"        -> (Similarity.annIvfTopk _),
    "ann_kmeans_topk"     -> (Similarity.annKmeansTopk _),
    "ann_lsh_buckets"     -> (Similarity.annLshBuckets _),
    "dedup_embedding"     -> (Similarity.dedupEmbedding _),
    // -- multimodal binary columns [EXT]
    "media_features" -> (Multimodal.mediaFeatures _),
    "media_frames"   -> (Multimodal.mediaFrames _),
    "media_resize"   -> (Multimodal.mediaResize _),
    // -- extended joins (as-of, range) [EXT]
    "join_asof_clicks" -> (JoinsExt.joinAsofClicks _),
    "join_asof_native" -> (JoinsExt.joinAsofNative _),
    "join_range_price" -> (JoinsExt.joinRangePrice _),
    // -- grouping sets, tf-idf, sketches [EXT]
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "agg_percentiles"   -> (Relational.aggPercentiles _),
    "agg_pivot"           -> (Relational.aggPivot _),
    "agg_approx"          -> (Relational.aggApprox _),
    "agg_argmax"          -> (Relational.aggArgmax _),
    "window_range_frame"  -> (Relational.windowRangeFrame _),
    "map_functions"       -> (Relational.mapFunctions _),
    "subquery_correlated" -> (Relational.subqueryCorrelated _),
    "text_tfidf"        -> (TextAnalysis.textTfidf _),
    "kmv_distinct"      -> (Sketches.kmvDistinct _),
    "hll_distinct"      -> (Sketches.hllDistinct _),
    "data_profile"      -> (Profiling.dataProfile _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "mr_wordcount"          -> MrQueries.mrWordCountSql,
    "mr_inverted_index"     -> MrQueries.mrInvertedIndexSql,
    "mr_sorted_concat"      -> MrQueries.mrSortedConcatSql,
    "wc_native"             -> MrQueries.wcNativeSql,
    "inverted_index_native" -> MrQueries.invertedIndexNativeSql,
    "q1_pricing_summary"    -> Relational.q1Sql,
    "q3_shipping_priority"  -> Relational.q3Sql,
    "q5_local_supplier"     -> Relational.q5Sql,
    "q6_forecast_revenue"   -> Relational.q6Sql,
    "q18_large_orders"      -> Relational.q18Sql,
    "q21_waiting_orders"    -> Relational.q21Sql,
    "join_broadcast_part"   -> Relational.joinBroadcastPartSql,
    "join_semi"             -> Relational.joinSemiSql,
    "join_anti"             -> Relational.joinAntiSql,
    "join_full_outer"       -> Relational.joinFullOuterSql,
    "join_theta"            -> Relational.joinThetaSql,
    "join_salted"           -> Skew.joinSaltedSql,
    "window_topk"           -> Relational.windowTopkSql,
    "window_analytics"      -> Relational.windowAnalyticsSql,
    "agg_rollup"            -> Relational.aggRollupSql,
    "agg_histogram"         -> Relational.aggHistogramSql,
    "agg_correlation"       -> Relational.aggCorrelationSql,
    "agg_cube"              -> Relational.aggCubeSql,
    "agg_distinct"          -> Relational.aggDistinctSql,
    "topk_orders"           -> Relational.topkOrdersSql,
    "set_ops"               -> Relational.setOpsSql,
    "scalar_functions"      -> Relational.scalarFunctionsSql,
    "json_extract"          -> Relational.jsonExtractSql,
    "events_hourly"         -> Events.eventsHourlySql,
    "events_sliding"        -> Events.eventsSlidingSql,
    "events_sessionize"     -> Events.eventsSessionizeSql,
    "events_funnel"         -> Events.eventsFunnelSql,
    "events_cohorts"        -> Events.eventsCohortsSql,
    "events_outliers"       -> Events.eventsOutliersSql,
    "events_gapfill"        -> Events.eventsGapfillSql,
    "window_distribution"   -> Relational.windowDistributionSql,
    "dedup_exact"           -> Dedup.dedupExactSql,
    "dedup_minhash_lsh"     -> Dedup.dedupMinhashLshSql,
    "minhash_signatures"    -> Dedup.minhashSignaturesSql,
    "dedup_simhash"         -> Dedup.dedupSimhashSql,
    "dedup_simhash_pairs"   -> Dedup.dedupSimhashPairsSql,
    "dedup_ngram_jaccard"   -> Dedup.dedupNgramJaccardSql,
    "dedup_components"      -> Dedup.dedupComponentsSql,
    "dedup_apply"           -> Dedup.dedupApplySql,
    "dedup_edit_distance"   -> Dedup.dedupEditDistanceSql,
    "embed_quantize"        -> Similarity.embedQuantizeSql,
    "text_tokens"           -> TextAnalysis.textTokensSql,
    "text_quality"          -> TextAnalysis.textQualitySql,
    "text_langid"           -> TextAnalysis.textLangidSql,
    "text_fingerprint"      -> TextAnalysis.textFingerprintSql,
    "text_pii_redact"       -> TextAnalysis.textPiiRedactSql,
    "text_repetition"       -> TextAnalysis.textRepetitionSql,
    "text_ngram_vocab"      -> TextAnalysis.textNgramVocabSql,
    "text_boilerplate"      -> TextAnalysis.textBoilerplateSql,
    "text_unigram_lm"       -> TextAnalysis.textUnigramLmSql,
    "sample_split"          -> Sampling.sampleSplitSql,
    "sample_stratified"     -> Sampling.sampleStratifiedSql,
    "split_contamination"   -> Sampling.splitContaminationSql,
    "split_ngram_decontam"  -> Sampling.splitNgramDecontamSql,
    "corpus_prep"           -> Pipeline.corpusPrepSql,
    "ann_bruteforce_topk"   -> Similarity.annBruteforceTopkSql,
    "ann_ivf_topk"          -> Similarity.annIvfTopkSql,
    "ann_kmeans_topk"       -> Similarity.annKmeansTopkSql,
    "ann_lsh_buckets"       -> Similarity.annLshBucketsSql,
    "dedup_embedding"       -> Similarity.dedupEmbeddingSql,
    "media_features"        -> Multimodal.mediaFeaturesSql,
    "media_frames"          -> Multimodal.mediaFramesSql,
    "media_resize"          -> Multimodal.mediaResizeSql,
    "join_asof_clicks"      -> JoinsExt.joinAsofClicksSql,
    "join_asof_native"      -> JoinsExt.joinAsofClicksSql, // same semantics, native exec
    "join_range_price"      -> JoinsExt.joinRangePriceSql,
    "agg_grouping_sets"     -> Relational.aggGroupingSetsSql,
    "agg_percentiles"       -> Relational.aggPercentilesSql,
    "agg_pivot"             -> Relational.aggPivotSql,
    "agg_approx"            -> Relational.aggApproxSql,
    "agg_argmax"            -> Relational.aggArgmaxSql,
    "window_range_frame"    -> Relational.windowRangeFrameSql,
    "map_functions"         -> Relational.mapFunctionsSql,
    "subquery_correlated"   -> Relational.subqueryCorrelatedSql,
    "text_tfidf"            -> TextAnalysis.textTfidfSql,
    "kmv_distinct"          -> Sketches.kmvDistinctSql,
    "hll_distinct"          -> Sketches.hllDistinctSql,
    "data_profile"          -> Profiling.dataProfileSql
  )
}
