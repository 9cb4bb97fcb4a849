package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 gets a `queries` entry; each
  * SQL-expressible one also gets an `oracleSql` entry (DuckDB, same
  * parquet tables, identical output column names).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Tpch.q1PricingSummary(s, d)),
    "q3_top_orders"      -> ((s, d) => Tpch.q3TopOrders(s, d)),
    "q5_region_revenue"  -> ((s, d) => Tpch.q5LocalSupplierVolume(s, d)),
    "hot_users_topn"     -> ((s, d) => EventAnalytics.hotUsersTopN(s, d)),
    "page_views"         -> ((s, d) => EventAnalytics.pageViews(s, d)),
    "unique_visitors"    -> ((s, d) => EventAnalytics.uniqueVisitors(s, d)),
    "unique_visitors_approx" -> ((s, d) => EventAnalytics.uniqueVisitorsApprox(s, d)),
    "channel_counts"     -> ((s, d) => EventAnalytics.channelCounts(s, d)),
    "total_counts"       -> ((s, d) => EventAnalytics.totalCounts(s, d)),
    "events_by_type_salted" -> ((s, d) => EventAnalytics.eventsByTypeSalted(s, d)),
    "clicks_by_province" -> ((s, d) => EventAnalytics.clicksByKBucket(s, d)),
    "blacklist"          -> ((s, d) => EventAnalytics.blacklist(s, d)),
    // stateful / CEP layer (SURVEY §2.7-2.8, state machines + window-fn forms)
    "login_fail"         -> ((s, d) => Stateful.loginFail(s, d)),
    "login_fail_cep"     -> ((s, d) => Stateful.loginFailCep(s, d)),
    "order_timeout"      -> ((s, d) => Stateful.orderTimeout(s, d)),
    "tx_match"           -> ((s, d) => Stateful.txMatch(s, d)),
    "tx_match_join"      -> ((s, d) => Stateful.txMatchJoin(s, d)),
    "attribution_asof"   -> ((s, d) => Stateful.attributionAsof(s, d)),
    "blacklist_stateful" -> ((s, d) => Stateful.blacklistStateful(s, d)),
    // simulated-arrival replay: the fixtures are time-sorted, so only a
    // deterministic arrival permutation exercises the late path (>0 rows)
    "late_events"        -> ((s, d) => Stateful.lateEvents(s, d, simulateArrival = true)),
    // LLM-data-pipeline text operators (builder brief; SURVEY §7 step 8)
    "dedup_exact"        -> ((s, d) => TextOps.dedupExact(s, d)),
    "text_stats"         -> ((s, d) => TextOps.textStats(s, d)),
    "lang_id"            -> ((s, d) => TextOps.langId(s, d)),
    "doc_fingerprint"    -> ((s, d) => TextOps.fingerprint(s, d)),
    "ngram_jaccard"      -> ((s, d) => TextOps.ngramJaccard(s, d)),
    "minhash_lsh"        -> ((s, d) => TextOps.minhashLsh(s, d)),
    "simhash"            -> ((s, d) => TextOps.simhash(s, d)),
    "simhash_pairs"      -> ((s, d) => TextOps.simhashPairs(s, d)),
    "neardup_clusters"   -> ((s, d) => TextOps.neardupClusters(s, d)),
    "repetition_stats"   -> ((s, d) => TextOps.repetitionStats(s, d)),
    "contamination"      -> ((s, d) => TextOps.contamination(s, d)),
    // embedding similarity search (brute-force baseline + IVF scale path)
    "ann_cosine_topk"    -> ((s, d) => Similarity.annCosineTopK(s, d)),
    "ann_ivf_topk"       -> ((s, d) => Similarity.annIvfTopK(s, d)),
    "ivf_train"          -> ((s, d) => Similarity.ivfTrain(s, d)),
    "semantic_mix"       -> ((s, d) => Similarity.semanticMix(s, d)),
    "pq_encode"          -> ((s, d) => Similarity.pqEncode(s, d)),
    "pq_adc_topk"        -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "ivf_pq_topk"        -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "embedding_neardup"  -> ((s, d) => Similarity.embeddingNearDup(s, d)),
    "embedding_lsh_neardup" -> ((s, d) => Similarity.embeddingLshNearDup(s, d)),
    // SQL-text surface + UDx aggregators + multimodal plumbing
    "hot_users_topn_sql" -> ((s, d) => SqlSurface.hotUsersTopNSql(s, d)),
    "uv_udaf"            -> ((s, d) => EventAnalytics.uniqueVisitorsUdaf(s, d)),
    "uv_bitmap"          -> ((s, d) => EventAnalytics.uniqueVisitorsBitmap(s, d)),
    "avg_value_udaf"     -> ((s, d) => EventAnalytics.avgValueUdaf(s, d)),
    "media_features"     -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "frame_sample"       -> ((s, d) => Multimodal.sampleFrames(s, d)),
    // training-data curation (quality filter / mixing / packing)
    "quality_filter"     -> ((s, d) => DataPipeline.qualityFilter(s, d)),
    "stratified_sample"  -> ((s, d) => DataPipeline.stratifiedSample(s, d, SampleMix)),
    "mixture_sample"     -> ((s, d) => DataPipeline.mixtureSample(s, d)),
    "pack_documents"     -> ((s, d) => DataPipeline.packDocuments(s, d)),
    // corpus curation: keywords, sub-doc dedup chunks, PII, JSON paths
    "tfidf_topk"         -> ((s, d) => Corpus.tfidfTopK(s, d)),
    "cdc_chunks"         -> ((s, d) => Corpus.cdcChunks(s, d)),
    "pii_scrub"          -> ((s, d) => Corpus.piiScrub(s, d)),
    "props_json_agg"     -> ((s, d) => EventAnalytics.propsJsonAgg(s, d)),
    "session_windows"    -> ((s, d) => EventAnalytics.sessionWindows(s, d)),
    "event_cube"         -> ((s, d) => EventAnalytics.eventCube(s, d)),
    "corpus_coverage"    -> ((s, d) => Corpus.corpusCoverage(s, d)),
    "ngram_novelty"      -> ((s, d) => Corpus.ngramNovelty(s, d)),
    "rolling_hour_stats" -> ((s, d) => EventAnalytics.rollingHourStats(s, d)),
    "click_no_purchase"  -> ((s, d) => EventAnalytics.clickNoPurchase(s, d)),
    // round 5: representative selection, edit-distance verify,
    // distributed exact quantiles, vocabulary head, pivot/rollup
    "cluster_reps"       -> ((s, d) => TextOps.clusterReps(s, d)),
    "dup_spans"          -> ((s, d) => TextOps.dupSpans(s, d)),
    "edit_distance_pairs" -> ((s, d) => TextOps.editDistancePairs(s, d)),
    "doc_quantiles"      -> ((s, d) => TextOps.docQuantiles(s, d)),
    "token_topk"         -> ((s, d) => TextOps.tokenTopK(s, d)),
    "event_pivot"        -> ((s, d) => EventAnalytics.eventPivot(s, d)),
    "event_rollup"       -> ((s, d) => EventAnalytics.eventRollup(s, d)),
    "funnel"             -> ((s, d) => EventAnalytics.funnel(s, d)),
    "latest_snapshot"    -> ((s, d) => EventAnalytics.latestSnapshot(s, d)),
    "token_freq_hist"    -> ((s, d) => Corpus.tokenFreqHist(s, d)),
    "pmi_bigrams"        -> ((s, d) => Corpus.pmiBigrams(s, d)),
    "curation_pipeline"  -> ((s, d) => DataPipeline.curationPipeline(s, d)),
    "source_mix_report"  -> ((s, d) => Corpus.sourceMixReport(s, d)),
    "dup_rate_by_source" -> ((s, d) => Corpus.dupRateBySource(s, d)),
    "source_overlap"     -> ((s, d) => Corpus.sourceOverlap(s, d)),
    "audio_windows"      -> ((s, d) => Multimodal.audioWindows(s, d)),
  )

  /** Mixing fractions for the registered stratified_sample query. */
  private val SampleMix = Map("en" -> 0.5, "de" -> 0.25)

  /** DuckDB-equivalent SQL per query key (same column names!). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Tpch.q1Sql,
    "q3_top_orders"      -> Tpch.q3Sql,
    "q5_region_revenue"  -> Tpch.q5Sql,
    "hot_users_topn"     -> EventAnalytics.hotUsersTopNSql(),
    "page_views"         -> EventAnalytics.pageViewsSql,
    "unique_visitors"    -> EventAnalytics.uniqueVisitorsSql,
    "channel_counts"     -> EventAnalytics.channelCountsSql,
    "total_counts"       -> EventAnalytics.totalCountsSql,
    "events_by_type_salted" -> EventAnalytics.eventsByTypeSaltedSql,
    "clicks_by_province" -> EventAnalytics.clicksByKBucketSql,
    "blacklist"          -> EventAnalytics.blacklistSql(),
    "login_fail"         -> Stateful.loginFailSql(),
    "login_fail_cep"     -> Stateful.loginFailCepSql(),
    "order_timeout"      -> Stateful.orderTimeoutSql(),
    "tx_match"           -> Stateful.txMatchSql(),
    "tx_match_join"      -> Stateful.txMatchJoinSql(),
    "attribution_asof"   -> Stateful.attributionAsofSql,
    "blacklist_stateful" -> Stateful.blacklistStatefulSql(),
    "late_events"        -> Stateful.lateEventsSql(simulateArrival = true),
    "dedup_exact"        -> TextOps.dedupExactSql,
    "text_stats"         -> TextOps.textStatsSql,
    "lang_id"            -> TextOps.langIdSql,
    "doc_fingerprint"    -> TextOps.fingerprintSql,
    "ngram_jaccard"      -> TextOps.ngramJaccardSql(),
    "minhash_lsh"        -> TextOps.minhashLshSql(),
    "simhash"            -> TextOps.simhashSql,
    "simhash_pairs"      -> TextOps.simhashPairsSql(),
    "neardup_clusters"   -> TextOps.neardupClustersSql(),
    "repetition_stats"   -> TextOps.repetitionStatsSql,
    "contamination"      -> TextOps.contaminationSql(),
    "ann_cosine_topk"    -> Similarity.annCosineTopKSql(),
    "ann_ivf_topk"       -> Similarity.annIvfTopKSql(),
    "ivf_train"          -> Similarity.ivfTrainSql(),
    "semantic_mix"       -> Similarity.semanticMixSql(),
    "pq_encode"          -> Similarity.pqEncodeSql(),
    "pq_adc_topk"        -> Similarity.pqAdcTopKSql(),
    "ivf_pq_topk"        -> Similarity.ivfPqTopKSql(),
    "embedding_neardup"  -> Similarity.embeddingNearDupSql(),
    "embedding_lsh_neardup" -> Similarity.embeddingLshNearDupSql(),
    "hot_users_topn_sql" -> EventAnalytics.hotUsersTopNSql(),
    "uv_udaf"            -> EventAnalytics.uniqueVisitorsSql,
    "uv_bitmap"          -> EventAnalytics.uniqueVisitorsSql,
    "avg_value_udaf"     -> EventAnalytics.avgValueUdafSql,
    "media_features"     -> Multimodal.mediaFeaturesSql,
    "frame_sample"       -> Multimodal.sampleFramesSql(),
    "quality_filter"     -> DataPipeline.qualityFilterSql(),
    "stratified_sample"  -> DataPipeline.stratifiedSampleSql(SampleMix),
    "mixture_sample"     -> DataPipeline.mixtureSampleSql(),
    "pack_documents"     -> DataPipeline.packDocumentsSql(),
    "tfidf_topk"         -> Corpus.tfidfTopKSql(),
    "cdc_chunks"         -> Corpus.cdcChunksSql(),
    "pii_scrub"          -> Corpus.piiScrubSql,
    "props_json_agg"     -> EventAnalytics.propsJsonAggSql,
    "session_windows"    -> EventAnalytics.sessionWindowsSql(),
    "event_cube"         -> EventAnalytics.eventCubeSql,
    "corpus_coverage"    -> Corpus.corpusCoverageSql(),
    "ngram_novelty"      -> Corpus.ngramNoveltySql(),
    "rolling_hour_stats" -> EventAnalytics.rollingHourStatsSql,
    "click_no_purchase"  -> EventAnalytics.clickNoPurchaseSql,
    "cluster_reps"       -> TextOps.clusterRepsSql(),
    "dup_spans"          -> TextOps.dupSpansSql(),
    "edit_distance_pairs" -> TextOps.editDistancePairsSql(),
    "doc_quantiles"      -> TextOps.docQuantilesSql(),
    "token_topk"         -> TextOps.tokenTopKSql(),
    "event_pivot"        -> EventAnalytics.eventPivotSql,
    "event_rollup"       -> EventAnalytics.eventRollupSql,
    "funnel"             -> EventAnalytics.funnelSql,
    "latest_snapshot"    -> EventAnalytics.latestSnapshotSql,
    "token_freq_hist"    -> Corpus.tokenFreqHistSql,
    "pmi_bigrams"        -> Corpus.pmiBigramsSql(),
    "curation_pipeline"  -> DataPipeline.curationPipelineSql(),
    "source_mix_report"  -> Corpus.sourceMixReportSql,
    "dup_rate_by_source" -> Corpus.dupRateBySourceSql,
    "source_overlap"     -> Corpus.sourceOverlapSql,
    "audio_windows"      -> Multimodal.audioWindowsSql(),
  )
}
