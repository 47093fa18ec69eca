package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.TextFunctions
import graft.mr.MapReduce
import graft.multimodal.Media
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 / the
  * north-star extension list; `oracleSql` holds the equivalent DuckDB SQL
  * for the driver's differential check. EVERY query is oracle-checked,
  * including the approximate ones: MinHash verifies candidates to exact
  * Jaccard (output == the exact join), SimHash's token hash is
  * md5_number_lower on both engines, and the hyperplane-ANN oracle embeds
  * the deterministic codebook as SQL literals (see `annOracle`).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.wc(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference parity (wc, ii + the generic MapReduce plugin surface) --
    "wc" -> ((s, d) => CoreQueries.wc(s, d)),
    "ii" -> ((s, d) => CoreQueries.ii(s, d)),
    "mr_wc" -> ((s, d) => MapReduce.runOnDocuments(s, d,
      (id, text) => TextFunctions.tokenizeScala(text).iterator
        .map(w => MapReduce.KeyValue(w, "1")),
      (_, vs) => vs.size.toString)),
    "mr_ii" -> ((s, d) => MapReduce.runOnDocuments(s, d,
      (id, text) => TextFunctions.tokenizeScala(text).iterator
        .map(w => MapReduce.KeyValue(w, id)),
      (_, vs) => vs.toSeq.distinct.sorted.mkString(","))),
    // -- text-interchange sources (JSONL/CSV round-trips vs the parquet oracle) --
    "jsonl_scan" -> ((s, d) => graft.sources.Formats.jsonlScan(s, d)),
    "csv_scan" -> ((s, d) => graft.sources.Formats.csvScan(s, d)),
    "orc_scan" -> ((s, d) => graft.sources.Formats.orcScan(s, d)),
    // -- relational breadth --
    "grep_filter" -> ((s, d) => CoreQueries.grepFilter(s, d)),
    "grep_indexed" -> ((s, d) => CoreQueries.grepIndexed(s, d)),
    "phrase_search" -> ((s, d) => CoreQueries.phraseSearch(s, d)),
    "boolean_search" -> ((s, d) => CoreQueries.booleanSearch(s, d)),
    "topk_words" -> ((s, d) => CoreQueries.topkWords(s, d)),
    "agg_pricing" -> ((s, d) => Relational.aggPricing(s, d)),
    "distinct_users" -> ((s, d) => Relational.distinctUsers(s, d)),
    "salted_distinct" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.operators.Skew.saltedCountDistinct(
          graft.sources.Tables.events(s, d), col("event_type"), col("user_id"))
        .orderBy("k")
    }),
    "distinct_sketch" -> ((s, d) => Relational.distinctSketch(s, d)),
    "sketch_rollup" -> ((s, d) => Relational.sketchRollup(s, d)),
    "skew_profile" -> ((s, d) => Relational.skewProfile(s, d)),
    "freq_sketch" -> ((s, d) => TextAnalysis.freqSketch(s, d)),
    "join_orders_customers" -> ((s, d) => Relational.joinOrdersCustomers(s, d)),
    "multi_join_agg" -> ((s, d) => Relational.multiJoinAgg(s, d)),
    "q5_region" -> ((s, d) => Relational.regionRevenue(s, d)),
    "brand_revenue" -> ((s, d) => Relational.brandRevenue(s, d)),
    "anti_join" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "semi_join" -> ((s, d) => Relational.customersWithLargeOrders(s, d)),
    "bloom_join" -> ((s, d) => Relational.bloomJoin(s, d)),
    "full_outer" -> ((s, d) => Relational.clicksVsPurchases(s, d)),
    "fuzzy_names" -> ((s, d) => Relational.fuzzyNames(s, d)),
    "sliding_window" -> ((s, d) => Relational.slidingWindow(s, d)),
    "window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    "tumbling_window" -> ((s, d) => Relational.tumblingWindow(s, d)),
    "sessionize" -> ((s, d) => Relational.sessionize(s, d)),
    "peak_concurrency" -> ((s, d) => Relational.peakConcurrency(s, d)),
    "interval_join" -> ((s, d) => Relational.intervalJoin(s, d)),
    "session_window_agg" -> ((s, d) => Relational.sessionWindowAgg(s, d)),
    "session_window_dynamic" -> ((s, d) => Relational.sessionWindowDynamic(s, d)),
    "json_extract" -> ((s, d) => Relational.jsonExtract(s, d)),
    "percentiles" -> ((s, d) => Relational.percentiles(s, d)),
    "pivot_events" -> ((s, d) => Relational.pivotEvents(s, d)),
    "except_vocab" -> ((s, d) => Relational.vocabExcept(s, d)),
    "intersect_vocab" -> ((s, d) => Relational.vocabIntersect(s, d)),
    "histogram" -> ((s, d) => Relational.valueHistogram(s, d)),
    "asof_join" -> ((s, d) => Relational.asofJoin(s, d)),
    "range_join" -> ((s, d) => Analytics.rangeJoinTiers(s, d)),
    "event_funnel" -> ((s, d) => Analytics.eventFunnel(s, d)),
    "ntile_spend" -> ((s, d) => Analytics.ntileSpend(s, d)),
    "user_paths" -> ((s, d) => Analytics.userPaths(s, d)),
    "top_supplier" -> ((s, d) => Analytics.topSupplierPerNation(s, d)),
    "order_gaps" -> ((s, d) => Analytics.orderGaps(s, d)),
    "quantile_sketch" -> ((s, d) => Analytics.quantileSketch(s, d)),
    "quantile_recall" -> ((s, d) => Analytics.quantileRecall(s, d)),
    "quantile_sketch_kll" -> ((s, d) => Analytics.quantileSketchKll(s, d)),
    "kll_rollup" -> ((s, d) => Analytics.kllRollup(s, d)),
    "stream_kll" -> ((s, d) => graft.streaming.EventStreams.streamKllQuery(s, d)),
    "winsorize_kll" -> ((s, d) => Analytics.winsorizeKll(s, d)),
    "kll_recall" -> ((s, d) => Analytics.kllRecall(s, d)),
    "winsorize_stats" -> ((s, d) => Analytics.winsorizeStats(s, d)),
    "quantile_rollup" -> ((s, d) => Analytics.quantileRollup(s, d)),
    "hll_rollup" -> ((s, d) => Analytics.hllRollup(s, d)),
    "stream_hll" -> ((s, d) => graft.streaming.EventStreams.streamHllQuery(s, d)),
    "cohort_retention" -> ((s, d) => Analytics.cohortRetention(s, d)),
    "outlier_events" -> ((s, d) => Analytics.outlierEvents(s, d)),
    "anomaly_hours" -> ((s, d) => Analytics.anomalyHours(s, d)),
    "ewma_hours" -> ((s, d) => Analytics.ewmaHours(s, d)),
    "stream_ewma_hours" -> ((s, d) =>
      graft.streaming.EventStreams.streamEwmaHoursQuery(s, d)),
    "cusum_shift" -> ((s, d) => Analytics.cusumShift(s, d)),
    "attribution_touch" -> ((s, d) => Analytics.attributionTouch(s, d)),
    "attribution_linear" -> ((s, d) => Analytics.attributionLinear(s, d)),
    "stream_cusum" -> ((s, d) =>
      graft.streaming.EventStreams.streamCusumQuery(s, d)),
    "basket_affinity" -> ((s, d) => Analytics.basketAffinity(s, d)),
    "revenue_rank_delta" -> ((s, d) => Analytics.revenueRankDelta(s, d)),
    "user_lifecycle" -> ((s, d) => Analytics.userLifecycle(s, d)),
    "gap_fill" -> ((s, d) => Analytics.gapFill(s, d)),
    "triangle_count" -> ((s, d) => Ranking.triangleCount(s, d)),
    "rolling_features" -> ((s, d) => Analytics.rollingFeatures(s, d)),
    "profile_table" -> ((s, d) => Analytics.profileTable(s, d)),
    "constraint_audit" -> ((s, d) => Analytics.constraintAudit(s, d)),
    "rollup_pricing" -> ((s, d) => Relational.rollupPricing(s, d)),
    "cube_pricing" -> ((s, d) => Relational.cubePricing(s, d)),
    "grouping_sets_pricing" -> ((s, d) => Relational.groupingSetsPricing(s, d)),
    "q3_shipping" -> ((s, d) => Relational.q3Shipping(s, d)),
    "waiting_suppliers" -> ((s, d) => Relational.waitingSuppliers(s, d)),
    "lapsed_big_accounts" -> ((s, d) => Relational.lapsedBigAccounts(s, d)),
    "big_spenders" -> ((s, d) => Relational.bigSpenders(s, d)),
    "q4_priority_exists" -> ((s, d) => Relational.q4PriorityExists(s, d)),
    "q6_forecast" -> ((s, d) => Relational.q6Forecast(s, d)),
    "q7_nation_volume" -> ((s, d) => Relational.q7NationVolume(s, d)),
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q10_returns" -> ((s, d) => Relational.q10Returns(s, d)),
    "q12_late_lines" -> ((s, d) => Relational.q12LateLines(s, d)),
    "q13_order_counts" -> ((s, d) => Relational.q13OrderCounts(s, d)),
    "q14_promo_share" -> ((s, d) => Relational.q14PromoShare(s, d)),
    "q15_top_revenue" -> ((s, d) => Relational.q15TopRevenue(s, d)),
    "q17_small_orders" -> ((s, d) => Relational.q17SmallOrders(s, d)),
    "q19_brackets" -> ((s, d) => Relational.q19Brackets(s, d)),
    "freq_rollup" -> ((s, d) => Relational.freqRollup(s, d)),
    "join_size_estimate" -> ((s, d) => Relational.joinSizeEstimate(s, d)),
    "plan_advisor" -> ((s, d) => Relational.planAdvisor(s, d)),
    "advised_join" -> ((s, d) => Relational.advisedJoin(s, d)),
    "advisor_cycle" -> ((s, d) => Relational.advisorCycle(s, d)),
    "join_order_advisor" -> ((s, d) => Relational.joinOrderAdvisor(s, d)),
    "join_order_dp" -> ((s, d) => Relational.joinOrderDp(s, d)),
    "chain_card_recall" -> ((s, d) => Relational.chainCardRecall(s, d)),
    "join_graph_dp" -> ((s, d) => Relational.joinGraphDp(s, d)),
    "graph_card_recall" -> ((s, d) => Relational.graphCardRecall(s, d)),
    "advisor_recall" -> ((s, d) => Relational.advisorRecall(s, d)),
    "join_skew_auto" -> ((s, d) => Relational.joinSkewAuto(s, d)),
    "join_skew_audit" -> ((s, d) => Relational.joinSkewAudit(s, d)),
    "agg_skew_auto" -> ((s, d) => Relational.aggSkewAuto(s, d)),
    "stream_skew_audit" -> ((s, d) =>
      graft.streaming.EventStreams.streamSkewAuditQuery(s, d)),
    "stream_plan_advisor" -> ((s, d) =>
      graft.streaming.EventStreams.streamPlanAdvisorQuery(s, d)),
    "stream_join_size" -> ((s, d) =>
      graft.streaming.EventStreams.streamJoinSizeQuery(s, d)),
    "join_size_cross" -> ((s, d) => Relational.joinSizeCross(s, d)),
    "unpivot_metrics" -> ((s, d) => Relational.unpivotMetrics(s, d)),
    // -- structured streaming (bounded replay through real streaming queries) --
    "stream_tumbling" -> ((s, d) => graft.streaming.EventStreams.streamTumblingQuery(s, d)),
    "stream_tumbling_append" -> ((s, d) => graft.streaming.EventStreams.streamTumblingAppendQuery(s, d)),
    "stream_late_audit" -> ((s, d) => graft.streaming.EventStreams.streamLateAuditQuery(s, d)),
    "stream_dedup_bounded" -> ((s, d) => graft.streaming.EventStreams.streamDedupBoundedQuery(s, d)),
    "stream_dedup" -> ((s, d) => graft.streaming.EventStreams.streamDedupQuery(s, d)),
    "stream_enrich" -> ((s, d) => graft.streaming.EventStreams.streamEnrichQuery(s, d)),
    "stream_sliding" -> ((s, d) => graft.streaming.EventStreams.streamSlidingQuery(s, d)),
    "stream_sliding_append" -> ((s, d) => graft.streaming.EventStreams.streamSlidingAppendQuery(s, d)),
    "stream_join" -> ((s, d) => graft.streaming.EventStreams.streamStreamJoinQuery(s, d)),
    "stream_join_left" -> ((s, d) => graft.streaming.EventStreams.streamStreamLeftJoinQuery(s, d)),
    "stream_join_full" -> ((s, d) => graft.streaming.EventStreams.streamStreamFullJoinQuery(s, d)),
    "stream_dedup_near" -> ((s, d) => graft.streaming.EventStreams.streamNearDupQuery(s, d)),
    "stream_sessions" -> ((s, d) => graft.streaming.EventStreams.streamSessionsQuery(s, d)),
    "stream_sessions_append" -> ((s, d) => graft.streaming.EventStreams.streamSessionsAppendQuery(s, d)),
    "stream_attribution" -> ((s, d) => graft.streaming.EventStreams.streamAttributionQuery(s, d)),
    "stream_session_dynamic" -> ((s, d) => graft.streaming.EventStreams.streamSessionDynamicQuery(s, d)),
    "stream_export" -> ((s, d) => graft.streaming.EventStreams.streamExportQuery(s, d)),
    "stream_ingest" -> ((s, d) => graft.streaming.EventStreams.streamIngestQuery(s, d)),
    "stream_distinct_sketch" -> ((s, d) => graft.streaming.EventStreams.streamDistinctSketchQuery(s, d)),
    "stream_anomaly_hours" -> ((s, d) => graft.streaming.EventStreams.streamAnomalyHoursQuery(s, d)),
    "stream_quantile_sketch" -> ((s, d) => graft.streaming.EventStreams.streamQuantileSketchQuery(s, d)),
    "stream_upsert" -> ((s, d) => graft.streaming.EventStreams.streamUpsertQuery(s, d)),
    "stream_scd2" -> ((s, d) => graft.streaming.EventStreams.streamScd2Query(s, d)),
    "stream_snapshot_diff" -> ((s, d) => graft.streaming.EventStreams.streamSnapshotDiffQuery(s, d)),
    "stream_decontaminate" -> ((s, d) => graft.streaming.EventStreams.streamDecontaminateQuery(s, d)),
    "stream_quality_filter" -> ((s, d) => graft.streaming.EventStreams.streamQualityFilterQuery(s, d)),
    "stream_source_mix" -> ((s, d) => graft.streaming.EventStreams.streamSourceMixQuery(s, d)),
    "stream_freq_sketch" -> ((s, d) => graft.streaming.EventStreams.streamFreqSketchQuery(s, d)),
    // -- text analysis (north star) --
    "text_stats" -> ((s, d) => TextAnalysis.textStats(s, d)),
    "readability" -> ((s, d) => TextAnalysis.readability(s, d)),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "quality_score" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "pareto_frontier" -> ((s, d) => TextAnalysis.paretoFrontier(s, d)),
    "perplexity_score" -> ((s, d) => TextAnalysis.perplexityScore(s, d)),
    "heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    "common_passages" -> ((s, d) => TextAnalysis.commonPassages(s, d)),
    "dedup_passages" -> ((s, d) => TextAnalysis.dedupPassages(s, d)),
    "excise_passages" -> ((s, d) => TextAnalysis.excisePassages(s, d)),
    "repetition_score" -> ((s, d) => TextAnalysis.repetitionScore(s, d)),
    "classify_docs" -> ((s, d) => TextAnalysis.classifyDocs(s, d)),
    "lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(s, d)),
    "fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "scrub_pii" -> ((s, d) => TextAnalysis.scrubPii(s, d)),
    "normalize_text" -> ((s, d) => TextAnalysis.normalizeText(s, d)),
    "stream_normalize" -> ((s, d) =>
      graft.streaming.EventStreams.streamNormalizeQuery(s, d)),
    "boilerplate_lines" -> ((s, d) => TextAnalysis.boilerplateLines(s, d)),
    "stream_boilerplate" -> ((s, d) =>
      graft.streaming.EventStreams.streamBoilerplateQuery(s, d)),
    "kanon_suppress" -> ((s, d) => TextAnalysis.kanonSuppress(s, d)),
    "noised_release" -> ((s, d) => TextAnalysis.noisedRelease(s, d)),
    "mixture_weights" -> ((s, d) => TextAnalysis.mixtureWeights(s, d)),
    "dsir_weights" -> ((s, d) => TextAnalysis.dsirWeights(s, d)),
    "dsir_sample" -> ((s, d) => TextAnalysis.dsirSample(s, d)),
    "stream_mixture_weights" -> ((s, d) =>
      graft.streaming.EventStreams.streamMixtureWeightsQuery(s, d)),
    "quota_sample" -> ((s, d) => TextAnalysis.quotaSample(s, d)),
    "token_length_histogram" -> ((s, d) => TextAnalysis.tokenLengthHistogram(s, d)),
    "stream_token_histogram" -> ((s, d) =>
      graft.streaming.EventStreams.streamTokenHistogramQuery(s, d)),
    "packing_report" -> ((s, d) => TextAnalysis.packingReport(s, d)),
    "quality_calibration" -> ((s, d) => TextAnalysis.qualityCalibration(s, d)),
    "ngram_novelty" -> ((s, d) => TextAnalysis.ngramNovelty(s, d)),
    "source_novelty" -> ((s, d) => TextAnalysis.sourceNovelty(s, d)),
    "sample_hash" -> ((s, d) => TextAnalysis.sampleHash(s, d)),
    "vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(s, d)),
    "source_divergence" -> ((s, d) => TextAnalysis.sourceDivergence(s, d)),
    "zipf_slope" -> ((s, d) => TextAnalysis.zipfSlope(s, d)),
    "metric_corr" -> ((s, d) => TextAnalysis.metricCorr(s, d)),
    "stream_metric_corr" -> ((s, d) => graft.streaming.EventStreams.streamMetricCorrQuery(s, d)),
    "doc_entropy" -> ((s, d) => TextAnalysis.docEntropy(s, d)),
    "stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "pps_sample" -> ((s, d) => TextAnalysis.ppsSample(s, d)),
    "stream_pps_sample" -> ((s, d) => graft.streaming.EventStreams.streamPpsSampleQuery(s, d)),
    "stream_dsir_weights" -> ((s, d) => graft.streaming.EventStreams.streamDsirWeightsQuery(s, d)),
    "chunk_fingerprint" -> ((s, d) => TextAnalysis.chunkFingerprint(s, d)),
    "winnow_fingerprints" -> ((s, d) => TextAnalysis.winnowFingerprints(s, d)),
    "winnow_matches" -> ((s, d) => TextAnalysis.winnowMatches(s, d)),
    "stream_winnow" -> ((s, d) => graft.streaming.EventStreams.streamWinnowQuery(s, d)),
    "winnow_matches_indexed" -> ((s, d) => TextAnalysis.winnowMatchesIndexed(s, d)),
    "winnow_recall" -> ((s, d) => TextAnalysis.winnowRecall(s, d)),
    "embed_documents" -> ((s, d) => TextAnalysis.embedDocumentsFlat(s, d)),
    "pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "pack_sequences_sharded" -> ((s, d) => TextAnalysis.packSequencesSharded(s, d)),
    "mixture_sample" -> ((s, d) => TextAnalysis.mixtureSample(s, d)),
    "quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "source_mix" -> ((s, d) => TextAnalysis.sourceMix(s, d)),
    "doc_chunks" -> ((s, d) => TextAnalysis.docChunks(s, d)),
    "bpe_train" -> ((s, d) => Bpe.bpeTrain(s, d)),
    "bpe_encode" -> ((s, d) => Bpe.bpeEncode(s, d)),
    "bpe_fertility" -> ((s, d) => Bpe.bpeFertility(s, d)),
    "bpe_coverage" -> ((s, d) => Bpe.bpeCoverage(s, d)),
    "tfidf_terms" -> ((s, d) => Ranking.tfidfTerms(s, d)),
    "link_rank" -> ((s, d) => Ranking.linkRank(s, d)),
    "link_communities" -> ((s, d) => Ranking.linkCommunities(s, d)),
    "community_rollup" -> ((s, d) => Ranking.communityRollup(s, d)),
    "cocitation" -> ((s, d) => Ranking.cocitation(s, d)),
    "hits_scores" -> ((s, d) => Ranking.hitsScores(s, d)),
    "kcore" -> ((s, d) => Ranking.kcore(s, d)),
    "triangle_participation" -> ((s, d) => Ranking.trianglesPerNode(s, d)),
    "seed_hops" -> ((s, d) => Ranking.seedHops(s, d)),
    "seed_costs" -> ((s, d) => Ranking.seedCosts(s, d)),
    "seed_rank" -> ((s, d) => Ranking.seedRank(s, d)),
    "link_cycles" -> ((s, d) => Ranking.linkCycles(s, d)),
    "bm25_search" -> ((s, d) => Ranking.bm25Search(s, d)),
    "hybrid_search" -> ((s, d) => Ranking.hybridSearch(s, d)),
    "dedup_url" -> ((s, d) => TextAnalysis.urlDedup(s, d)),
    // -- dedup (north star) --
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_nfc" -> ((s, d) => Dedup.dedupNfc(s, d)),
    "dedup_ngram" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dedup_auto" -> ((s, d) => Dedup.dedupAuto(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingDedupPairs(s, d)),
    "semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "semdedup_recall" -> ((s, d) => Similarity.semDedupRecall(s, d)),
    "index_auto" -> ((s, d) => Similarity.indexAuto(s, d)),
    "index_audit" -> ((s, d) => Similarity.indexAudit(s, d)),
    "stream_index_audit" -> ((s, d) =>
      graft.streaming.EventStreams.streamIndexAuditQuery(s, d)),
    "semdedup_probed" -> ((s, d) => Similarity.semDedupProbed(s, d)),
    "semdedup_text_recall" -> ((s, d) => Similarity.semDedupTextRecall(s, d)),
    "embed_clusters" -> ((s, d) => Similarity.embedClusters(s, d)),
    "cluster_sample" -> ((s, d) => Similarity.clusterSample(s, d)),
    "cluster_keywords" -> ((s, d) => Similarity.clusterKeywords(s, d)),
    "semdedup_text" -> ((s, d) => Similarity.semDedupText(s, d)),
    "similar_docs" -> ((s, d) => Similarity.similarDocs(s, d)),
    "text_recall" -> ((s, d) => Similarity.textRecall(s, d)),
    "hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "mrr_eval" -> ((s, d) => Similarity.mrrEval(s, d)),
    "stream_cluster_assign" -> ((s, d) =>
      graft.streaming.EventStreams.streamClusterAssignQuery(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_clusters_incremental" -> ((s, d) => IncrementalDedup.clustersIncremental(s, d)),
    "cluster_canonical" -> ((s, d) => Dedup.clusterCanonical(s, d)),
    "dedup_report" -> ((s, d) => Dedup.dedupReport(s, d)),
    "corpus_overlap" -> ((s, d) => Dedup.corpusOverlap(s, d)),
    "dedup_threshold_curve" -> ((s, d) => Dedup.dedupThresholdCurve(s, d)),
    "contamination_report" -> ((s, d) => Dedup.contaminationReport(s, d)),
    "takedown_propagate" -> ((s, d) => Dedup.takedownPropagate(s, d)),
    "stream_takedown" -> ((s, d) => graft.streaming.EventStreams.streamTakedownQuery(s, d)),
    "takedown_verify" -> ((s, d) => Dedup.takedownVerify(s, d)),
    "dedup_incremental" -> ((s, d) => IncrementalDedup.incrementalDedup(s, d)),
    "decontaminate" -> ((s, d) => Dedup.decontaminationPairs(s, d)),
    "decontaminate_indexed" -> ((s, d) => Dedup.decontaminationIndexed(s, d)),
    "decontaminate_auto" -> ((s, d) => Dedup.decontaminateAuto(s, d)),
    "corpus_export" -> ((s, d) => Pipeline.corpusExport(s, d)),
    "release_report" -> ((s, d) => Pipeline.releaseReport(s, d)),
    "export_shards" -> ((s, d) => Pipeline.exportShards(s, d)),
    "export_manifest" -> ((s, d) => Pipeline.exportManifest(s, d)),
    "export_pack" -> ((s, d) => Pipeline.exportPack(s, d)),
    "export_write" -> ((s, d) => Pipeline.exportWrite(s, d)),
    "export_sorted" -> ((s, d) => Pipeline.exportSorted(s, d)),
    "export_zorder" -> ((s, d) => Pipeline.exportZorder(s, d)),
    "zorder_skipping" -> ((s, d) => Pipeline.zorderSkipping(s, d)),
    "merge_upsert" -> ((s, d) => Pipeline.mergeUpsert(s, d)),
    "scd2_history" -> ((s, d) => Pipeline.scd2History(s, d)),
    "agg_incremental" -> ((s, d) => Pipeline.aggIncremental(s, d)),
    "snapshot_diff" -> ((s, d) => Pipeline.snapshotDiff(s, d)),
    "train_shuffle" -> ((s, d) => Pipeline.trainShuffle(s, d)),
    "leakage_safe_split" -> ((s, d) => Pipeline.leakageSafeSplit(s, d)),
    "epoch_plan" -> ((s, d) => Pipeline.epochPlan(s, d)),
    // -- similarity search (north star) --
    "similarity_knn" -> ((s, d) => Similarity.knnBrute(s, d)),
    "similarity_ivf" -> ((s, d) => Similarity.ivfSearch(s, d)),
    "similarity_ivf_indexed" -> ((s, d) => Similarity.ivfSearchIndexed(s, d)),
    "similarity_ann" -> ((s, d) => Similarity.annHyperplane(s, d)),
    "knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    "mutual_knn" -> ((s, d) => Similarity.mutualKnn(s, d)),
    "ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    "knn_classify" -> ((s, d) => Similarity.knnClassify(s, d)),
    "ivf_recall" -> ((s, d) => Similarity.ivfRecall(s, d)),
    "quantize_embeddings" -> ((s, d) => Similarity.quantizeEmbeddings(s, d)),
    "embedding_stats" -> ((s, d) => Similarity.embeddingStats(s, d)),
    "embedding_drift" -> ((s, d) => Similarity.embeddingDrift(s, d)),
    "pq_encode" -> ((s, d) => Similarity.pqEncode(s, d)),
    "pq_search" -> ((s, d) => Similarity.pqSearch(s, d)),
    "ivfpq_search" -> ((s, d) => Similarity.ivfpqSearch(s, d)),
    "pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    // -- multimodal plumbing (north star) --
    "media_meta" -> ((s, d) => Media.mediaMeta(s, d)),
    "media_filter" -> ((s, d) => Media.mediaFilter(s, d)),
    "stream_media_filter" -> ((s, d) =>
      graft.streaming.EventStreams.streamMediaFilterQuery(s, d)),
    "media_report" -> ((s, d) => Media.mediaReport(s, d)),
    "media_stats" -> ((s, d) => Media.mediaStats(s, d)),
    "media_resize" -> ((s, d) => Media.mediaResize(s, d)),
    "media_frames" -> ((s, d) => Media.mediaFrames(s, d)),
    "media_dedup" -> ((s, d) => Media.mediaDedup(s, d)),
    "media_near_dup" -> ((s, d) => Media.mediaNearDup(s, d)),
    "media_dup_padded" -> ((s, d) => Media.mediaDupPadded(s, d)),
    "media_dup_encoded" -> ((s, d) => Media.mediaDupEncoded(s, d)),
    "media_dup_encoded_packed" -> ((s, d) => Media.mediaDupEncodedPacked(s, d)),
    "media_near_dup_packed" -> ((s, d) => Media.mediaNearDupPacked(s, d)),
    "media_dup_padded_packed" -> ((s, d) => Media.mediaDupPaddedPacked(s, d)),
    "media_dup_indexed" -> ((s, d) => graft.multimodal.MediaIndex.mediaDupIndexed(s, d)),
    "media_export" -> ((s, d) => graft.multimodal.MediaIndex.mediaExport(s, d)),
    "media_release_report" -> ((s, d) => graft.multimodal.MediaIndex.mediaReleaseReport(s, d)),
    "media_takedown_verify" -> ((s, d) => graft.multimodal.MediaIndex.mediaTakedownVerify(s, d)),
    "media_split" -> ((s, d) => graft.multimodal.MediaIndex.mediaSplit(s, d)),
    "media_release_cycle" -> ((s, d) => graft.multimodal.MediaIndex.mediaReleaseCycle(s, d)),
    "stream_media_split" -> ((s, d) => graft.streaming.EventStreams.streamMediaSplitQuery(s, d)),
    "route_audit" -> ((s, d) => Dedup.routeAudit(s, d)),
    "media_dup_cycle" -> ((s, d) => graft.multimodal.MediaIndex.mediaDupCycle(s, d)),
    "media_near_dup_lsh" -> ((s, d) => graft.multimodal.MediaIndex.mediaNearDupLsh(s, d)),
    "media_lsh_recall" -> ((s, d) => graft.multimodal.MediaIndex.mediaLshRecall(s, d)),
    "stream_media_dedup" -> ((s, d) => graft.streaming.EventStreams.streamMediaDedupQuery(s, d)),
    "media_files_scan" -> ((s, d) => Media.mediaFilesScan(s, d)),
    "compaction_plan" -> ((s, d) => Media.compactionPlan(s, d)),
    "compaction_run" -> ((s, d) => Media.compactionRun(s, d)),
    "stream_media_ingest" -> ((s, d) => graft.streaming.EventStreams.streamMediaIngestQuery(s, d)),
    "stream_media_packed" -> ((s, d) => graft.streaming.EventStreams.streamMediaPackedQuery(s, d)),
    "stream_quota_ingest" -> ((s, d) => graft.streaming.EventStreams.streamQuotaIngestQuery(s, d)),
    "stream_kanon" -> ((s, d) => graft.streaming.EventStreams.streamKanonQuery(s, d)),
    "stream_noised_release" -> ((s, d) => graft.streaming.EventStreams.streamNoisedReleaseQuery(s, d)),
  )

  /** The KMV distinct-count oracle, shared by the batch and streaming
    * forms (the sketch's merge is order-independent, so one SQL truth
    * serves both execution modes). */
  private val kmvSketchSql: String =
    """WITH h AS (SELECT event_type, CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 9223372036854775808 AS BIGINT) AS hv FROM events
      |       WHERE user_id IS NOT NULL),
      |d AS (SELECT DISTINCT event_type, hv FROM h),
      |r AS (SELECT event_type, hv, row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS nd FROM d)
      |SELECT event_type, round(CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
      |    ELSE 63.0 * 9223372036854775808.0 / CAST(hv AS DOUBLE) END, 4) AS est_users
      |FROM r WHERE rn = CASE WHEN nd < 64 THEN 1 ELSE 64 END
      |ORDER BY event_type""".stripMargin

  /** The metric-correlation oracle, shared by the batch and streaming
    * forms (the per-source moment sums are commutative integers, so the
    * streaming complete-mode final table equals the batch aggregate and
    * one SQL truth serves both execution modes). */
  private val metricCorrSql: String =
    """WITH m AS (SELECT source, CAST(length(text) AS BIGINT) AS c,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS BIGINT) AS t,
      |    CAST(len(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> ''))) AS BIGINT) AS y
      |  FROM documents),
      |g AS (SELECT source, count(*) AS n, sum(c) AS sc, sum(t) AS st, sum(y) AS sy,
      |        sum(c*c) AS scc, sum(t*t) AS stt, sum(y*y) AS syy,
      |        sum(c*t) AS sct, sum(t*y) AS sty FROM m GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |  round(CASE WHEN CAST(n*scc - sc*sc AS DOUBLE) * CAST(n*stt - st*st AS DOUBLE) = 0 THEN 0.0
      |    ELSE CAST(n*sct - sc*st AS DOUBLE) / sqrt(CAST(n*scc - sc*sc AS DOUBLE) * CAST(n*stt - st*st AS DOUBLE)) END, 4) + 0.0 AS corr_chars_tokens,
      |  round(CASE WHEN CAST(n*stt - st*st AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE) = 0 THEN 0.0
      |    ELSE CAST(n*sty - st*sy AS DOUBLE) / sqrt(CAST(n*stt - st*st AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) END, 4) + 0.0 AS corr_tokens_types
      |FROM g ORDER BY source""".stripMargin

  /** The table-profile oracle: one UNION ALL branch per profiled column,
    * each pairing exact null/min/max aggregates with the KMV estimate
    * replay (the kmvSketchSql structure, ungrouped). */
  private val profileOracleSql: String = {
    val cols = Seq("event_id", "user_id", "event_type", "value_cents", "props")
    val branches = cols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls, k.est_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
         |FROM src, (
         |  SELECT round(CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
         |      ELSE 63.0 * 9223372036854775808.0 / CAST(hv AS DOUBLE) END, 4) AS est_distinct
         |  FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn, count(*) OVER () AS nd
         |        FROM (SELECT DISTINCT CAST(md5_number_lower(CAST($c AS VARCHAR)) % 9223372036854775808 AS BIGINT) AS hv
         |              FROM src WHERE $c IS NOT NULL) d) r
         |  WHERE rn = CASE WHEN nd < 64 THEN 1 ELSE 64 END) k
         |GROUP BY k.est_distinct""".stripMargin
    }
    "WITH src AS (SELECT event_id, user_id, event_type, " +
      "CAST(round(value * 100) AS BIGINT) AS value_cents, props FROM events)\n" +
      branches.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
  }

  /** The Count-Min sketch oracle, shared by the batch (weighted updates
    * over word counts) and streaming (weight-1 updates over raw tokens)
    * forms — counter addition is associative, so both build the identical
    * grid and one SQL truth serves both. The grid is replayed as a GROUP
    * BY over (row, salted-hash bucket); a word's estimate is the min of
    * its depth cells — same md5-mod-2⁶³-mod-width hash as `CmsKernel`. */
  private val cmsSketchSql: String =
    """WITH d AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |t AS (SELECT unnest(ws) AS word FROM d),
      |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_count FROM t GROUP BY word),
      |cells AS (SELECT i, CAST((md5_number_lower(CAST(i AS VARCHAR) || ':' || word) % 9223372036854775808) % 256 AS BIGINT) AS b,
      |                 CAST(sum(exact_count) AS BIGINT) AS cell
      |          FROM wc, range(4) r(i) GROUP BY 1, 2),
      |probes AS (SELECT word, exact_count FROM wc ORDER BY exact_count DESC, word LIMIT 20),
      |pb AS (SELECT p.word, p.exact_count, r.i,
      |              CAST((md5_number_lower(CAST(r.i AS VARCHAR) || ':' || p.word) % 9223372036854775808) % 256 AS BIGINT) AS b
      |       FROM probes p, range(4) r(i)),
      |est AS (SELECT pb.word, pb.exact_count, min(c.cell) AS est_count
      |        FROM pb JOIN cells c ON c.i = pb.i AND c.b = pb.b GROUP BY 1, 2)
      |SELECT word, exact_count, est_count FROM est ORDER BY exact_count DESC, word""".stripMargin

  /** ewma_hours' oracle — shared verbatim with `stream_ewma_hours`: the
    * streamed grid is an associative cents SUM, bit-identical to the batch
    * one, and the dyadic read-out is deterministic from the grid. */
  private val ewmaHoursSql: String =
    """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |hh AS (SELECT event_type, h, CAST(sum(cents) AS BIGINT) AS cents FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, h, unnest(range(20)) AS g FROM hh),
      |j AS (SELECT t.event_type, t.h, t.g, s.cents
      |  FROM t JOIN hh s ON s.event_type = t.event_type AND s.h = t.h - t.g)
      |SELECT event_type, h AS hour_bucket, count(*) AS n_hours,
      |  CAST(sum(cents * (CAST(1 AS BIGINT) << (19 - g))) AS BIGINT) AS ewma_num,
      |  CAST(sum(CAST(1 AS BIGINT) << (19 - g)) AS BIGINT) AS ewma_den,
      |  CAST(sum(cents * (CAST(1 AS BIGINT) << (19 - g))) // sum(CAST(1 AS BIGINT) << (19 - g)) AS BIGINT) AS ewma_cents
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val normalizeTextSql: String =
    """WITH d AS (SELECT doc_id,
      |    text || repeat(' cafe' || chr(769) || ' man' || chr(771) || 'ana',
      |                   CAST(doc_id % 3 AS INT)) AS t
      |  FROM documents),
      |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM d)
      |SELECT doc_id, CAST(nt <> t AS BIGINT) AS changed,
      |  CAST(length(t) AS BIGINT) AS chars_before,
      |  CAST(length(nt) AS BIGINT) AS chars_after,
      |  md5(nt) AS fp
      |FROM n ORDER BY doc_id""".stripMargin

  /** join_size_estimate's oracle — shared verbatim with
    * `stream_join_size` (signed-update addition is associative, so the
    * streamed cell grid equals the batch weighted grid bit-for-bit). */
  /** join_size_cross's oracle — both sketches replayed with the shared
    * (i:key) hash, the inner product per row, the lower median, and the
    * metadata-join exact truth. */
  private val joinSizeCrossSql: String = {
    val (d, w) = (Relational.JoinSizeDepth, Relational.JoinSizeCrossWidth)
    def grid(name: String, src: String) =
      s"""$name AS (SELECT i, h % $w AS b,
        |    CAST(sum((1 - 2 * CAST((h // 4294967296) % 2 AS BIGINT)) * w) AS BIGINT) AS cell
        |  FROM (SELECT w, r.i,
        |      md5_number_lower(CAST(r.i AS VARCHAR) || ':' || pk) % 9223372036854775808 AS h
        |    FROM $src, range($d) r(i)) GROUP BY 1, 2)""".stripMargin
    s"""WITH ea AS (SELECT CAST(user_id AS VARCHAR) AS pk, CAST(count(*) AS BIGINT) AS w
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |ob AS (SELECT CAST(o_custkey AS VARCHAR) AS pk, CAST(count(*) AS BIGINT) AS w
      |  FROM orders GROUP BY 1),
      |ex AS (SELECT CAST(sum(ea.w * ob.w) AS BIGINT) AS exact_pairs
      |  FROM ea JOIN ob ON ea.pk = ob.pk),
      |${grid("ha", "ea")},
      |${grid("hb", "ob")},
      |rs AS (SELECT ha.i, CAST(sum(ha.cell * hb.cell) AS BIGINT) AS row_est
      |  FROM ha JOIN hb ON ha.i = hb.i AND ha.b = hb.b GROUP BY 1),
      |es AS (SELECT row_est AS est_pairs FROM
      |  (SELECT row_est, row_number() OVER (ORDER BY row_est) AS rn FROM rs)
      |  WHERE rn = ${d / 2 + 1})
      |SELECT exact_pairs, est_pairs,
      |  CAST((est_pairs - exact_pairs) * 1000 // exact_pairs AS BIGINT) AS err_permille
      |FROM ex, es""".stripMargin
  }

  /** plan_advisor's oracle, GENERATED from the same candidate list the
    * engine prices ([[Relational.AdvisorJoins]] — one definition site):
    * per side a signed AMS grid (the joinSizeCross hash) + non-null row
    * count, per candidate the densified lower-median inner product, the
    * declared 64-bytes-per-row model against the DEFAULT broadcast
    * threshold (the engine reads the live session conf; Verify runs
    * defaults). */
  private def advisorSideId(t: String, k: String) = s"${t}_$k"

  /** Per-side CTEs (weight rows, signed AMS grid, non-null count) for the
    * given (table, key) sides — shared by the plan_advisor and
    * join_order_advisor oracle generators. */
  private def advisorSideCtes(sides: Seq[(String, String)]): Seq[String] = {
    val d = Relational.JoinSizeDepth
    val w = Relational.JoinSizeCrossWidth
    sides.map { case (t, k) =>
      val id = advisorSideId(t, k)
      s"""s_$id AS (SELECT CAST($k AS VARCHAR) AS pk, CAST(count(*) AS BIGINT) AS w FROM $t WHERE $k IS NOT NULL GROUP BY 1),
        |g_$id AS (SELECT i, h % $w AS b,
        |    CAST(sum((1 - 2 * CAST((h // 4294967296) % 2 AS BIGINT)) * w) AS BIGINT) AS cell
        |  FROM (SELECT w, r.i,
        |      md5_number_lower(CAST(r.i AS VARCHAR) || ':' || pk) % 9223372036854775808 AS h
        |    FROM s_$id, range($d) r(i)) GROUP BY 1, 2),
        |n_$id AS (SELECT CAST(COALESCE(sum(w), 0) AS BIGINT) AS n FROM s_$id)""".stripMargin
    }
  }

  /** Per-candidate CTEs (inner product + densified lower-median estimate
    * `m_<name>(est_pairs)`) — shared by the same two generators. */
  private def advisorCandCtes(
      cands: Seq[(String, String, String, String, String)]): Seq[String] = {
    val d = Relational.JoinSizeDepth
    cands.map { case (name, lt, lk, rt, rk) =>
      val (l, r) = (advisorSideId(lt, lk), advisorSideId(rt, rk))
      s"""e_$name AS (SELECT a.i, CAST(sum(a.cell * b.cell) AS BIGINT) AS row_est
        |  FROM g_$l a JOIN g_$r b ON a.i = b.i AND a.b = b.b GROUP BY 1),
        |m_$name AS (SELECT row_est AS est_pairs FROM (
        |    SELECT COALESCE(e.row_est, 0) AS row_est,
        |      row_number() OVER (ORDER BY COALESCE(e.row_est, 0)) AS rn
        |    FROM range($d) t(i) LEFT JOIN e_$name e ON e.i = t.i)
        |  WHERE rn = ${d / 2 + 1})""".stripMargin
    }
  }

  private val planAdvisorSql: String = {
    val rows = Relational.AdvisorJoins.map { case (name, lt, lk, rt, rk) =>
      val (l, r) = (advisorSideId(lt, lk), advisorSideId(rt, rk))
      s"""SELECT '$name' AS join_name, ln.n AS left_rows, rn.n AS right_rows,
        |  m.est_pairs,
        |  CASE WHEN least(ln.n, rn.n) * ${Relational.AdvisorRowBytes} <= 10485760
        |       THEN 'broadcast' ELSE 'shuffle' END AS strategy,
        |  CASE WHEN ln.n <= rn.n THEN 'left' ELSE 'right' END AS build_side
        |FROM n_$l ln, n_$r rn, m_$name m""".stripMargin
    }
    "WITH " + (advisorSideCtes(Relational.advisorSides) ++
      advisorCandCtes(Relational.AdvisorJoins)).mkString(",\n") + "\n" +
      rows.mkString("\nUNION ALL\n") + "\nORDER BY join_name"
  }

  /** join_order_advisor's oracle: the two intermediates' estimates from
    * the SAME sketch replay, the order decision, and the chain count from
    * a plain three-way SQL join (order-invariant by associativity — the
    * gate proves the decision changed the plan, never the answer). */
  private val joinOrderAdvisorSql: String = {
    val cands = Relational.AdvisorJoins.filter(j =>
      j._1 == "lineitem_orders_fk" || j._1 == "orders_customer_dim")
    val sides = cands.flatMap(j => Seq((j._2, j._3), (j._4, j._5))).distinct
    "WITH " + (advisorSideCtes(sides) ++ advisorCandCtes(cands)).mkString(",\n") + s"""
      |SELECT 'lineitem_orders_customer' AS chain,
      |  lo.est_pairs AS est_lo, oc.est_pairs AS est_oc,
      |  CASE WHEN lo.est_pairs <= oc.est_pairs THEN 'fact_first' ELSE 'dim_first' END AS join_order,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     JOIN customer c ON o.o_custkey = c.c_custkey) AS n_rows
      |FROM m_lineitem_orders_fk lo, m_orders_customer_dim oc""".stripMargin
  }

  /** join_order_dp's oracle: the three chain edges priced from the SAME
    * sketch replay, all four left-deep order costs composed exactly as
    * [[Relational.chainCard]] composes them (clamped HUGEINT left-fold —
    * generated from [[Relational.ChainOrders]], one definition site), the
    * (cost, name) argmin, and the chain count from a plain four-way SQL
    * join (order-invariant by associativity — the gate proves the DP
    * changed the plan, never the answer). */
  /** [[Relational.chainCard]]'s clamped HUGEINT left-fold as a SQL
    * expression over the one-row `v` CTE's scalars (elo/eoc/ecn edges,
    * dno/dnc interior divisors) — shared by the join_order_dp and
    * chain_card_recall oracle generators. */
  private def chainCardSqlExpr(i: Int, j: Int): String = {
    val estVar = Seq("elo", "eoc", "ecn")
    val divVar = Seq("dno", "dnc")
    var acc = s"CAST(${estVar(i - 1)} AS HUGEINT)"
    (i + 1 to j - 1).foreach { e =>
      acc = s"($acc * ${estVar(e - 1)} // ${divVar(e - 2)})"
    }
    acc
  }

  /** The sketch-pricing CTE prefix ending in the one-row `v` scalar CTE —
    * shared by the two chain oracles. */
  private def chainPricingCtes: String = {
    val cands = Relational.AdvisorJoins.filter(j =>
      Relational.ChainEdgeNames.contains(j._1))
    val sides = cands.flatMap(j => Seq((j._2, j._3), (j._4, j._5))).distinct
    val divSides = Relational.ChainDivisorSides.map { case (t, k) => s"n_${advisorSideId(t, k)}.n" }
    "WITH " + (advisorSideCtes(sides) ++ advisorCandCtes(cands)).mkString(",\n") + s""",
      |v AS (SELECT
      |  greatest(m_${Relational.ChainEdgeNames(0)}.est_pairs, 0) AS elo,
      |  greatest(m_${Relational.ChainEdgeNames(1)}.est_pairs, 0) AS eoc,
      |  greatest(m_${Relational.ChainEdgeNames(2)}.est_pairs, 0) AS ecn,
      |  greatest(${divSides(0)}, 1) AS dno,
      |  greatest(${divSides(1)}, 1) AS dnc,
      |  m_${Relational.ChainEdgeNames(0)}.est_pairs AS est_lo,
      |  m_${Relational.ChainEdgeNames(1)}.est_pairs AS est_oc,
      |  m_${Relational.ChainEdgeNames(2)}.est_pairs AS est_cn
      |  FROM m_${Relational.ChainEdgeNames(0)}, m_${Relational.ChainEdgeNames(1)},
      |       m_${Relational.ChainEdgeNames(2)},
      |       n_${advisorSideId("orders", "o_custkey")}, n_${advisorSideId("customer", "c_nationkey")})""".stripMargin
  }

  private val joinOrderDpSql: String = {
    def cardSql(i: Int, j: Int): String = chainCardSqlExpr(i, j)
    val costRows = Relational.ChainOrders.map { o =>
      val cost = o.intervals.map { case (i, j) => cardSql(i, j) }.mkString(" + ")
      s"SELECT '${o.name}' AS ord, $cost AS cost FROM v"
    }
    chainPricingCtes + s""",
      |costs AS (${costRows.mkString("\n  UNION ALL ")}),
      |w AS (SELECT ord, cost FROM costs ORDER BY cost, ord LIMIT 1)
      |SELECT 'lineitem_orders_customer_nation' AS chain,
      |  v.est_lo, v.est_oc, v.est_cn, w.ord AS join_order,
      |  CAST(w.cost AS BIGINT) AS cost_est,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     JOIN customer c ON o.o_custkey = c.c_custkey
      |     JOIN nation n ON c.c_nationkey = n.n_nationkey) AS n_rows
      |FROM v, w""".stripMargin
  }

  /** join_graph_dp's oracle: the five candidate edges priced from the
    * same sketch replay, EVERY left-deep order of the graph (generated
    * from [[Relational.graphOrders]] — the engine's own enumeration, one
    * definition site) costed with the same closed-form subset estimates
    * (∏est // ∏n^(deg−1), one HUGEINT division per subset), the
    * (cost, name) argmin, and the six-way join count from the raw
    * tables. */
  private val joinGraphDpSql: String = {
    import graft.operators.Relational
    val estVar = Map("customer_nation_dim" -> "ecn", "events_orders_mn" -> "eeo",
      "lineitem_orders_fk" -> "elo", "lineitem_part_dim" -> "elp",
      "orders_customer_dim" -> "eoc")
    val cntVar = Map("customer" -> "cnt_c", "events" -> "cnt_e",
      "lineitem" -> "cnt_l", "nation" -> "cnt_n", "orders" -> "cnt_o",
      "part" -> "cnt_p")
    def cardSql(subset: Set[String]): String = {
      val edges = Relational.GraphEdges.filter(e => subset(e._2) && subset(e._3))
      val num = edges.map(e => estVar(e._1))
      val den = subset.toSeq.sorted.flatMap { v =>
        val d = edges.count(e => e._2 == v || e._3 == v)
        Seq.fill(math.max(d - 1, 0))(cntVar(v))
      }
      val numExpr = (s"CAST(${num.head} AS HUGEINT)" +: num.tail).mkString(" * ")
      if (den.isEmpty) s"($numExpr)"
      else s"(($numExpr) // (${(s"CAST(${den.head} AS HUGEINT)" +: den.tail).mkString(" * ")}))"
    }
    val costRows = Relational.graphOrders.map { o =>
      val cost = (2 until o.size).map(k => cardSql(o.take(k).toSet)).mkString(" + ")
      s"SELECT '${o.mkString(">")}' AS ord, $cost AS cost FROM v"
    }
    val sides = Relational.AdvisorJoins.flatMap(j => Seq((j._2, j._3), (j._4, j._5))).distinct
    val estDefs = Relational.GraphEdges.map(e =>
      s"greatest(m_${e._1}.est_pairs, 0) AS ${estVar(e._1)}")
    val cntDefs = Relational.GraphVertexSides.toSeq.sortBy(_._1).map { case (v, (t, k)) =>
      s"greatest(n_${advisorSideId(t, k)}.n, 1) AS ${cntVar(v)}" }
    val fromTables = Relational.GraphEdges.map(e => s"m_${e._1}") ++
      Relational.GraphVertexSides.toSeq.sortBy(_._1)
        .map { case (_, (t, k)) => s"n_${advisorSideId(t, k)}" }.distinct
    "WITH " + (advisorSideCtes(sides) ++ advisorCandCtes(Relational.AdvisorJoins))
      .mkString(",\n") + s""",
      |v AS (SELECT ${(estDefs ++ cntDefs).mkString(",\n  ")}
      |  FROM ${fromTables.mkString(", ")}),
      |costs AS (${costRows.mkString("\n  UNION ALL ")}),
      |w AS (SELECT ord, cost FROM costs ORDER BY cost, ord LIMIT 1)
      |SELECT 'advisor_graph' AS graph, w.ord AS join_order,
      |  CAST(w.cost AS BIGINT) AS cost_est,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     JOIN customer c ON o.o_custkey = c.c_custkey
      |     JOIN nation n ON c.c_nationkey = n.n_nationkey
      |     JOIN part p ON l.l_partkey = p.p_partkey
      |     JOIN events e ON e.user_id = o.o_custkey) AS n_rows
      |FROM w""".stripMargin
  }

  /** graph_card_recall's oracle: the two M:N-containing subsets' exact
    * cardinalities as plain 3-way join counts, next to the SAME composed
    * estimates join_graph_dp costs with (∏est // n(orders), one HUGEINT
    * division — the graphCard arithmetic), signed permille error. */
  private val graphCardRecallSql: String = {
    val cands = Relational.AdvisorJoins.filter(j => Seq("events_orders_mn",
      "lineitem_orders_fk", "orders_customer_dim").contains(j._1))
    val sides = cands.flatMap(j => Seq((j._2, j._3), (j._4, j._5))).distinct
    "WITH " + (advisorSideCtes(sides) ++ advisorCandCtes(cands)).mkString(",\n") + s""",
      |v AS (SELECT greatest(m_events_orders_mn.est_pairs, 0) AS eeo,
      |  greatest(m_orders_customer_dim.est_pairs, 0) AS eoc,
      |  greatest(m_lineitem_orders_fk.est_pairs, 0) AS elo,
      |  greatest(n_${advisorSideId("orders", "o_orderkey")}.n, 1) AS cnt_o
      |  FROM m_events_orders_mn, m_orders_customer_dim, m_lineitem_orders_fk,
      |       n_${advisorSideId("orders", "o_orderkey")}),
      |xeoc AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM events e
      |  JOIN orders o ON e.user_id = o.o_custkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey),
      |xeol AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM events e
      |  JOIN orders o ON e.user_id = o.o_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
      |SELECT graph_subset, exact_pairs, est_pairs,
      |  CAST(CASE WHEN exact_pairs = 0 THEN est_pairs * 1000
      |       ELSE (est_pairs - exact_pairs) * 1000 // exact_pairs END AS BIGINT) AS err_permille
      |FROM (
      |  SELECT 'events_orders_customer' AS graph_subset, xeoc.exact_pairs,
      |    CAST((CAST(eeo AS HUGEINT) * eoc // cnt_o) AS BIGINT) AS est_pairs FROM xeoc, v
      |  UNION ALL
      |  SELECT 'events_orders_lineitem', xeol.exact_pairs,
      |    CAST((CAST(eeo AS HUGEINT) * elo // cnt_o) AS BIGINT) FROM xeol, v)
      |ORDER BY graph_subset""".stripMargin
  }

  /** chain_card_recall's oracle: the two interior 3-table intervals'
    * exact chain counts from the raw tables next to the SAME composed
    * estimates the DP costs with ([[chainCardSqlExpr]] — one definition
    * with join_order_dp's cost arithmetic), signed permille error. */
  private val chainCardRecallSql: String =
    chainPricingCtes + s""",
      |xloc AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey),
      |xocn AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey)
      |SELECT chain_interval, exact_pairs, est_pairs,
      |  CAST(CASE WHEN exact_pairs = 0 THEN est_pairs * 1000
      |       ELSE (est_pairs - exact_pairs) * 1000 // exact_pairs END AS BIGINT) AS err_permille
      |FROM (
      |  SELECT 'lineitem_orders_customer' AS chain_interval, xloc.exact_pairs,
      |    CAST(${chainCardSqlExpr(1, 3)} AS BIGINT) AS est_pairs FROM xloc, v
      |  UNION ALL
      |  SELECT 'orders_customer_nation', xocn.exact_pairs,
      |    CAST(${chainCardSqlExpr(2, 4)} AS BIGINT) FROM xocn, v)
      |ORDER BY chain_interval""".stripMargin

  /** advisor_recall's oracle: per candidate the exact join cardinality
    * from the raw tables (truth side), the sketch estimate from the same
    * replayed grids, and the signed permille error — DuckDB `//` and
    * Spark `div` both truncate toward zero, so the signed arithmetic
    * aligns. */
  private val advisorRecallSql: String = {
    val exactCtes = Relational.AdvisorJoins.map { case (name, lt, lk, rt, rk) =>
      s"x_$name AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM $lt l JOIN $rt r ON l.$lk = r.$rk)"
    }
    val rows = Relational.AdvisorJoins.map { case (name, _, _, _, _) =>
      s"""SELECT '$name' AS join_name, x.exact_pairs, m.est_pairs,
        |  CAST(CASE WHEN x.exact_pairs = 0 THEN m.est_pairs * 1000
        |       ELSE (m.est_pairs - x.exact_pairs) * 1000 // x.exact_pairs END AS BIGINT) AS err_permille
        |FROM x_$name x, m_$name m""".stripMargin
    }
    "WITH " + (advisorSideCtes(Relational.advisorSides) ++
      advisorCandCtes(Relational.AdvisorJoins) ++ exactCtes).mkString(",\n") + "\n" +
      rows.mkString("\nUNION ALL\n") + "\nORDER BY join_name"
  }

  /** join_skew_audit's oracle: the route decision replayed from per-key
    * counts — integer top-key share against the declared cut, HUGEINT
    * products for the same overflow alignment as the engine's BigInt. */
  private val joinSkewAuditSql: String =
    s"""WITH c AS (SELECT user_id, count(*) AS c FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |d AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |             CAST(COALESCE(max(c), 0) AS BIGINT) AS m FROM c)
      |SELECT n AS n_rows, k AS n_keys, m AS max_count,
      |  CAST(CASE WHEN n = 0 THEN 0 ELSE m::HUGEINT * 1000 // n END AS BIGINT) AS share_permille,
      |  CAST(${Relational.JoinSaltShareCutPermille} AS BIGINT) AS cut_permille,
      |  CASE WHEN m::HUGEINT * 1000 > ${Relational.JoinSaltShareCutPermille}::HUGEINT * n
      |       THEN 'salted' ELSE 'plain' END AS route
      |FROM d""".stripMargin

  /** stream_skew_audit's oracle: the CMS grid's cells replayed from the
    * raw events (the cmsSketchSql hash convention over user_id keys), the
    * per-row max / min-over-rows frequency bound, and the same integer
    * route arithmetic as the batch audit applied to the bound. */
  private def streamSkewAuditSql(depth: Int = 4, width: Int = 1024): String =
    s"""WITH u AS (SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS c
      |           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |cells AS (SELECT i, CAST((md5_number_lower(CAST(i AS VARCHAR) || ':' || k) % 9223372036854775808) % $width AS BIGINT) AS b,
      |                 CAST(sum(c) AS BIGINT) AS cell
      |          FROM u, range($depth) r(i) GROUP BY 1, 2),
      |rowmax AS (SELECT i, max(cell) AS m FROM cells GROUP BY 1),
      |d AS (SELECT CAST((SELECT COALESCE(sum(c), 0) FROM u) AS BIGINT) AS n,
      |             CAST((SELECT COALESCE(min(m), 0) FROM rowmax) AS BIGINT) AS bound)
      |SELECT n AS n_rows, bound AS est_max_count,
      |  CAST(CASE WHEN n = 0 THEN 0 ELSE bound::HUGEINT * 1000 // n END AS BIGINT) AS share_bound_permille,
      |  CAST(${Relational.JoinSaltShareCutPermille} AS BIGINT) AS cut_permille,
      |  CASE WHEN bound::HUGEINT * 1000 > ${Relational.JoinSaltShareCutPermille}::HUGEINT * n
      |       THEN 'salted' ELSE 'plain' END AS route
      |FROM d""".stripMargin

  /** agg_skew_auto's oracle: plain per-user distinct counts (the salted
    * two-phase form is provably identical — salt = hash(value) keeps every
    * duplicate value in one shard) plus the replayed route. */
  private val aggSkewAutoSql: String =
    s"""WITH c AS (SELECT user_id, count(*) AS c FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |d AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n,
      |             CAST(COALESCE(max(c), 0) AS BIGINT) AS m FROM c),
      |r AS (SELECT CASE WHEN m::HUGEINT * 1000 > ${Relational.JoinSaltShareCutPermille}::HUGEINT * n
      |             THEN 'salted' ELSE 'plain' END AS route FROM d)
      |SELECT e.user_id, CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_distinct, r.route
      |FROM events e, r WHERE e.user_id IS NOT NULL
      |GROUP BY e.user_id, r.route ORDER BY e.user_id""".stripMargin

  /** join_skew_auto's oracle: the joined per-type counts from the raw
    * tables (salt-invariant — a salted join is the plain join) plus the
    * replayed route. */
  private val joinSkewAutoSql: String =
    s"""WITH c AS (SELECT user_id, count(*) AS c FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |d AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n,
      |             CAST(COALESCE(max(c), 0) AS BIGINT) AS m FROM c),
      |r AS (SELECT CASE WHEN m::HUGEINT * 1000 > ${Relational.JoinSaltShareCutPermille}::HUGEINT * n
      |             THEN 'salted' ELSE 'plain' END AS route FROM d),
      |j AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM events e JOIN orders o ON e.user_id = o.o_custkey GROUP BY 1)
      |SELECT j.event_type, j.n_pairs, r.route FROM j, r ORDER BY j.event_type""".stripMargin

  /** advised_join's oracle, generated from the same candidate list: each
    * executed join's cardinality recomputed as a plain SQL join count over
    * the raw tables (the "unhinted result" — a join hint can change the
    * plan, never the answer, and this gate proves it), the advice columns
    * replayed from the non-null side counts with the declared 64-byte row
    * model against the default broadcast threshold (the plan_advisor
    * convention: the engine reads the live conf, Verify runs defaults). */
  private val advisedJoinSql: String = {
    def sideId(t: String, k: String) = s"${t}_$k"
    val sideCtes = Relational.advisorSides.map { case (t, k) =>
      s"n_${sideId(t, k)} AS (SELECT CAST(count(*) AS BIGINT) AS n FROM $t WHERE $k IS NOT NULL)"
    }
    val rows = Relational.AdvisorJoins.map { case (name, lt, lk, rt, rk) =>
      s"""SELECT '$name' AS join_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM $lt l JOIN $rt r ON l.$lk = r.$rk) AS n_pairs,
        |  CASE WHEN least(ln.n, rn.n) * ${Relational.AdvisorRowBytes} <= 10485760
        |       THEN 'broadcast' ELSE 'shuffle' END AS strategy,
        |  CASE WHEN ln.n <= rn.n THEN 'left' ELSE 'right' END AS build_side
        |FROM n_${sideId(lt, lk)} ln, n_${sideId(rt, rk)} rn""".stripMargin
    }
    "WITH " + sideCtes.mkString(",\n") + "\n" +
      rows.mkString("\nUNION ALL\n") + "\nORDER BY join_name"
  }

  /** pps_sample's oracle — shared verbatim with `stream_pps_sample`
    * (membership is a pure content function against the pinned W). */
  private val ppsSampleSql: String =
    """WITH w AS (SELECT sum(n_chars) AS w_total FROM documents),
      |u AS (SELECT doc_id, n_chars,
      |    CAST(concat('0x', substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 8)) AS BIGINT) AS u32
      |  FROM documents)
      |SELECT doc_id, n_chars, u32,
      |  CAST(least(1000, (64 * n_chars * 1000) // w_total) AS BIGINT) AS p_permille
      |FROM u, w WHERE u32 < (64 * n_chars * 4294967296) // w_total
      |ORDER BY doc_id""".stripMargin

  private val joinSizeSql: String =
    s"""WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS pk FROM lineitem),
        |c AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM k GROUP BY 1),
        |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs FROM c),
        |hx AS (SELECT c.c, r.i,
        |    md5_number_lower(CAST(r.i AS VARCHAR) || ':' || pk) % 9223372036854775808 AS h
        |  FROM c, range(${Relational.JoinSizeDepth}) r(i)),
        |cells AS (SELECT i, h % ${Relational.JoinSizeWidth} AS b,
        |    CAST(sum((1 - 2 * CAST((h // 4294967296) % 2 AS BIGINT)) * c) AS BIGINT) AS cell
        |  FROM hx GROUP BY 1, 2),
        |rs AS (SELECT i, CAST(sum(cell * cell) AS BIGINT) AS row_est FROM cells GROUP BY 1),
        |es AS (SELECT row_est AS est_pairs FROM
        |  (SELECT row_est, row_number() OVER (ORDER BY row_est) AS rn FROM rs)
        |  WHERE rn = ${Relational.JoinSizeDepth / 2 + 1})
        |SELECT exact_pairs, est_pairs,
        |  CAST((est_pairs - exact_pairs) * 1000 // exact_pairs AS BIGINT) AS err_permille
        |FROM ex, es""".stripMargin

  /** cusum_shift's oracle — shared verbatim with `stream_cusum` (the
    * streamed grid is the same associative cents sum). The closed form
    * S_t = P_t − min(0, min_{j≤t} P_j) replaces the sequential recurrence
    * with two running windows; target/allowance are floor divisions of
    * exact integer sums (Spark `div` and DuckDB `//` both truncate). */
  private val cusumSql: String =
    """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |hh AS (SELECT event_type, h, CAST(sum(cents) AS BIGINT) AS cents FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, h, cents,
      |    sum(cents) OVER (PARTITION BY event_type) // count(*) OVER (PARTITION BY event_type) AS mu,
      |    sum(cents) OVER (PARTITION BY event_type) // (4 * count(*) OVER (PARTITION BY event_type)) AS kap
      |  FROM hh),
      |p AS (SELECT *, sum(cents - mu - kap) OVER
      |    (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING) AS pt FROM t),
      |m AS (SELECT *, least(CAST(0 AS BIGINT), min(pt) OVER
      |    (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING)) AS mt FROM p)
      |SELECT event_type, h AS hour_bucket, cents,
      |  CAST(mu AS BIGINT) AS target_cents, CAST(kap AS BIGINT) AS allowance_cents,
      |  CAST(pt - mt AS BIGINT) AS cusum_cents,
      |  CAST(pt - mt > 8 * kap AS BIGINT) AS alarm
      |FROM m ORDER BY event_type, hour_bucket""".stripMargin

  /** boilerplate_lines' oracle — shared verbatim with `stream_boilerplate`:
    * the streamed line-frequency table is an associative SUM over per-doc
    * distinct lines (= the count(DISTINCT doc_id) here), and the cleaning
    * read-out is deterministic from that table plus the batch corpus. */
  private val boilerplateSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    'home about ' || source || ' products contact' || chr(10) ||
      |    text || chr(10) ||
      |    CASE WHEN doc_id % 5 = 0 THEN 'subscribe to the ' || source || ' newsletter' || chr(10) ELSE '' END ||
      |    'ref ' || CAST(doc_id AS VARCHAR) || ' ' || source || chr(10) ||
      |    'copyright ' || source || ' all rights reserved' AS synth
      |  FROM documents),
      |sp AS (SELECT doc_id, source, string_split(synth, chr(10)) AS ls FROM d),
      |l0 AS (SELECT doc_id, source,
      |    unnest(list_transform(range(len(ls)), i -> struct_pack(pos := i, line := ls[i+1]))) AS pl FROM sp),
      |l AS (SELECT doc_id, source, pl.pos AS pos, pl.line AS line FROM l0),
      |df AS (SELECT source, line, count(DISTINCT doc_id) AS df FROM l GROUP BY 1, 2),
      |sn AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |b AS (SELECT df.source, df.line FROM df JOIN sn ON df.source = sn.source WHERE df.df * 2 >= sn.n_docs),
      |j AS (SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS is_b
      |  FROM l LEFT JOIN b ON l.source = b.source AND l.line = b.line)
      |SELECT doc_id, count(*) AS n_lines,
      |  CAST(count(*) FILTER (WHERE is_b) AS BIGINT) AS n_boiler,
      |  md5(array_to_string(list(line ORDER BY pos) FILTER (WHERE NOT is_b), chr(10))) AS clean_fp
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** hll_rollup's oracle — shared verbatim with `stream_hll`. */
  private val hllRollupSql: String =
    """WITH e AS (SELECT event_type, CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 9223372036854775808 AS BIGINT) AS h
        |           FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h % 256 AS bucket, h // 256 AS w FROM e),
        |rho AS (SELECT event_type, bucket,
        |          max(CASE WHEN w = 0 THEN 56 ELSE 56 - length(bin(w)) END) AS mr
        |        FROM r GROUP BY 1, 2),
        |grid AS (SELECT event_type, b FROM (SELECT DISTINCT event_type FROM e) s CROSS JOIN range(256) t(b)),
        |reg AS (SELECT g.event_type AS scope, g.b, COALESCE(rho.mr, 0) AS m
        |        FROM grid g LEFT JOIN rho ON rho.event_type = g.event_type AND rho.bucket = g.b),
        |allreg AS (SELECT * FROM reg
        |           UNION ALL SELECT '__all__' AS scope, b, max(m) AS m FROM reg GROUP BY 2),
        |agg AS (SELECT scope, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero,
        |          sum(CAST(1 AS BIGINT) << CAST(54 - least(m, 54) AS INTEGER)) AS harm_s
        |        FROM allreg GROUP BY 1)
        |SELECT scope, CAST(n_zero AS BIGINT) AS n_zero, CAST(harm_s AS BIGINT) AS harm_s,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 18014398509481984.0 / CAST(harm_s AS DOUBLE) <= 640.0
        |                  AND n_zero > 0
        |             THEN 256.0 * ln(256.0 / CAST(n_zero AS DOUBLE))
        |             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 18014398509481984.0 / CAST(harm_s AS DOUBLE) END, 4) AS est_users
        |FROM agg ORDER BY scope""".stripMargin

  /** The zorder bucket-assignment CTE chain (through `bkt`) — shared by
    * `export_zorder`'s stats read-out and `zorder_skipping`'s pruning
    * replay, so the two can never drift. */
  private val zorderBktCte: String =
    """WITH e AS (SELECT event_id, CAST(user_id AS BIGINT) AS uid, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |tb AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx, count(*) AS n FROM e),
        |tf AS (SELECT e.event_id, e.ts_us, e.uid, (e.ts_us - tb.mn) * 1024 // (tb.mx - tb.mn + 1) AS tbin, tb.n FROM e, tb),
        |th AS (SELECT tbin, n, count(*) AS cnt FROM tf GROUP BY tbin, n),
        |tw AS (SELECT tbin, n, sum(cnt) OVER (ORDER BY tbin) AS cum FROM th),
        |ks AS (SELECT unnest(range(1, 16)) AS k),
        |tcuts AS (SELECT ks.k, min(tw.tbin) AS cut FROM tw JOIN ks ON tw.cum >= (ks.k * tw.n + 15) // 16 GROUP BY ks.k),
        |tcl AS (SELECT COALESCE(list(cut ORDER BY cut), []) AS cs FROM tcuts),
        |ub AS (SELECT min(uid) AS mn, max(uid) AS mx, count(*) AS n FROM e),
        |uf AS (SELECT e.event_id, (e.uid - ub.mn) * 1024 // (ub.mx - ub.mn + 1) AS ubin, ub.n FROM e, ub),
        |uh AS (SELECT ubin, n, count(*) AS cnt FROM uf GROUP BY ubin, n),
        |uw AS (SELECT ubin, n, sum(cnt) OVER (ORDER BY ubin) AS cum FROM uh),
        |ucuts AS (SELECT ks.k, min(uw.ubin) AS cut FROM uw JOIN ks ON uw.cum >= (ks.k * uw.n + 15) // 16 GROUP BY ks.k),
        |ucl AS (SELECT COALESCE(list(cut ORDER BY cut), []) AS cs FROM ucuts),
        |a AS (SELECT tf.ts_us, tf.uid,
        |        len(list_filter(tcl.cs, c -> tf.tbin >= c)) AS tc,
        |        len(list_filter(ucl.cs, c -> uf.ubin >= c)) AS uc
        |      FROM tf JOIN uf USING (event_id) CROSS JOIN tcl CROSS JOIN ucl),
        |bkt AS (SELECT ts_us, uid,
        |        ((tc // 8) & 1) * 8 + ((uc // 8) & 1) * 4 + ((tc // 4) & 1) * 2 + ((uc // 4) & 1) AS bucket FROM a)""".stripMargin

  /** The 48-term trailing-zero sum of the shared digest — the KLL
    * stratum, generated once for every KLL oracle (the engine computes
    * the identical Σⱼ [h mod 2ʲ = 0]). */
  private val kllTzSql: String =
    (1 to 48).map(j => s"(CASE WHEN h % ${1L << j} = 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** Shared KLL CTE chain over an already-shaped `(rkey, cents)` source:
    * stratify, histogram, densified level counts, level pick, survivor
    * index, quantile targets. Ends with `st(cents, tz)`, `lv(lvl)`,
    * `nn(n)`, `sk(cents, i)`, `mm(m)`, `tq(q, n, istar)` in scope. */
  private def kllCtes(srcSql: String, k: Int): String =
    s"""WITH src AS ($srcSql),
      |hsh AS (SELECT cents, md5_number_lower(rkey) % 9223372036854775808 AS h FROM src),
      |st AS (SELECT cents, $kllTzSql AS tz FROM hsh),
      |hist AS (SELECT tz, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY tz),
      |cnts AS (SELECT r.j, COALESCE(sum(CASE WHEN h.tz >= r.j THEN h.c END), 0) AS cnt
      |  FROM range(49) r(j) LEFT JOIN hist h ON h.tz >= r.j GROUP BY r.j),
      |lv AS (SELECT CAST(min(j) AS BIGINT) AS lvl FROM cnts WHERE cnt <= $k),
      |nn AS (SELECT CAST(cnt AS BIGINT) AS n FROM cnts WHERE j = 0),
      |sk AS (SELECT cents, row_number() OVER (ORDER BY cents) AS i FROM st, lv WHERE tz >= lvl),
      |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM sk),
      |tq AS (SELECT q, n, lvl, m,
      |    least(m, greatest(1, ((q * n + 99) // 100
      |      + (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) - 1)
      |      // (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)))) AS istar
      |  FROM (SELECT unnest([50, 90, 95, 99]) AS q) qv, nn, lv, mm)""".stripMargin

  /** The lineitem-price KLL chain (k = 1024), shared by
    * `quantile_sketch_kll` and `kll_recall`. Single-line source SQL: the
    * chain builder stripMargins the interpolated whole, so an inner
    * multi-line string would be mangled. */
  private val kllLineitemCtes: String = kllCtes(
    "SELECT CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || " +
      "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR) AS rkey, " +
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem",
    1024)

  /** The per-scope KLL chain over `events.value` up to the quantile
    * targets `tq(scope, q, lvl, m, istar)` — shared by `kll_rollup`
    * (with the `__all__` union and the standard quantiles) and
    * `winsorize_kll` (per-type only, q ∈ {1, 99}). */
  private def kllScopedCtes(qs: Seq[Int], withAll: Boolean): String = {
    val uSql =
      if (withAll)
        """u AS (SELECT scope, rkey, cents FROM ev
          |  UNION ALL SELECT '__all__', rkey, cents FROM ev),""".stripMargin
      else "u AS (SELECT scope, rkey, cents FROM ev),"
    s"""WITH ev AS (SELECT event_type AS scope, CAST(event_id AS VARCHAR) AS rkey,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |$uSql
      |hsh AS (SELECT scope, cents, md5_number_lower(rkey) % 9223372036854775808 AS h FROM u),
      |st AS (SELECT scope, cents, $kllTzSql AS tz FROM hsh),
      |hist AS (SELECT scope, tz, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY 1, 2),
      |cnts AS (SELECT s.scope, r.j,
      |    COALESCE(sum(CASE WHEN h.tz >= r.j THEN h.c END), 0) AS cnt
      |  FROM (SELECT DISTINCT scope FROM hist) s
      |  CROSS JOIN range(49) r(j)
      |  LEFT JOIN hist h ON h.scope = s.scope AND h.tz >= r.j
      |  GROUP BY 1, 2),
      |lv AS (SELECT scope, CAST(min(j) AS BIGINT) AS lvl FROM cnts WHERE cnt <= 1024 GROUP BY scope),
      |nn AS (SELECT scope, CAST(cnt AS BIGINT) AS n FROM cnts WHERE j = 0),
      |sk AS (SELECT st.scope, cents,
      |    row_number() OVER (PARTITION BY st.scope ORDER BY cents) AS i
      |  FROM st JOIN lv ON st.scope = lv.scope WHERE tz >= lvl),
      |mm AS (SELECT scope, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY scope),
      |tq AS (SELECT nn.scope, q, lvl, m,
      |    least(m, greatest(1, ((q * n + 99) // 100
      |      + (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) - 1)
      |      // (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)))) AS istar
      |  FROM nn JOIN lv USING (scope) JOIN mm USING (scope),
      |    (SELECT unnest([${qs.mkString(", ")}]) AS q) qv)""".stripMargin
  }

  /** kll_rollup's oracle: per-event-type cells plus `__all__` computed
    * DIRECTLY over the union rows — provably identical to the engine's
    * state-only merge (summed histograms pick the same level; nested
    * strata re-filter to the same survivor set). */
  private val kllRollupSql: String = kllScopedCtes(Seq(50, 90, 95, 99), withAll = true) + "\n" +
    """SELECT tq.scope, CAST(q AS BIGINT) AS q,
      |  CAST(cents AS DOUBLE) / 100 AS est_value, lvl, m AS n_kept
      |FROM tq JOIN sk ON sk.scope = tq.scope AND sk.i = tq.istar
      |ORDER BY tq.scope, q""".stripMargin

  private val knnBruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, emb AS probe_emb FROM e WHERE vec_id < 10),
      |s AS (SELECT probe_id, vec_id AS neighbor_id, list_cosine_similarity(probe_emb, emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, emb) DESC, vec_id) AS rn
      |  FROM p, e WHERE vec_id <> probe_id)
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= 5
      |ORDER BY probe_id, rnk""".stripMargin

  /** Exact squared-L2 top-k — the truth side of `pq_recall` (same
    * sequential squared-diff fold as the engine's `l2sq`). */
  private val l2BruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, emb AS probe_emb FROM e WHERE vec_id < 10),
      |s AS (SELECT probe_id, vec_id AS neighbor_id,
      |    list_reduce(list_transform(range(1, 65), q -> (probe_emb[CAST(q AS INT)] - emb[CAST(q AS INT)]) * (probe_emb[CAST(q AS INT)] - emb[CAST(q AS INT)])), (x, y) -> x + y) AS d2,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_reduce(list_transform(range(1, 65), q -> (probe_emb[CAST(q AS INT)] - emb[CAST(q AS INT)]) * (probe_emb[CAST(q AS INT)] - emb[CAST(q AS INT)])), (x, y) -> x + y) ASC, vec_id) AS rn
      |  FROM p, e WHERE vec_id <> probe_id)
      |SELECT probe_id, neighbor_id, round(d2, 9) AS d2, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= 5
      |ORDER BY probe_id, rnk""".stripMargin

  /** recall@k of `approxSql` against `truthSql` — both nested verbatim as
    * WITH-subqueries, so each recall oracle is literally the composition
    * of the two search oracles it measures. */
  /** similar_docs' full oracle: the text-embedding k-means chain + the
    * nprobe-cell IVF search (shared by `similar_docs` and `text_recall`). */
  private lazy val similarDocsSql: String =
    ivfCtesExpr("(SELECT nc FROM ncell)", 3, textEmbSourceSql) + s""",
      |pc AS (SELECT probe_id, probe_emb, cell FROM (
      |  SELECT e.vec_id AS probe_id, e.emb AS probe_emb, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM e, cents3 c WHERE e.vec_id < 10) WHERE rn <= 2),
      |s AS (SELECT probe_id, a.vec_id AS neighbor_id, list_cosine_similarity(probe_emb, a.emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, a.emb) DESC, a.vec_id) AS rn
      |  FROM cellv a JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id)
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= 5
      |ORDER BY probe_id, rnk""".stripMargin

  /** Exact cosine top-k over the HASHED document embeddings — text_recall's
    * truth side (knnBruteSql with the text-embedding source). */
  private lazy val textBruteSql: String =
    s"""WITH e AS ($textEmbSourceSql),
      |p AS (SELECT vec_id AS probe_id, emb AS probe_emb FROM e WHERE vec_id < 10),
      |s AS (SELECT probe_id, vec_id AS neighbor_id, list_cosine_similarity(probe_emb, emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, emb) DESC, vec_id) AS rn
      |  FROM p, e WHERE vec_id <> probe_id)
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= 5
      |ORDER BY probe_id, rnk""".stripMargin

  private def recallOracle(truthSql: String, approxSql: String): String =
    s"""WITH truth AS (SELECT probe_id, neighbor_id FROM ($truthSql) t),
       |approx AS (SELECT probe_id, neighbor_id FROM ($approxSql) a),
       |hit AS (SELECT truth.probe_id, count(*) AS n_hit
       |  FROM truth JOIN approx USING (probe_id, neighbor_id) GROUP BY 1),
       |tot AS (SELECT probe_id, count(*) AS n_true FROM truth GROUP BY 1)
       |SELECT tot.probe_id AS probe_id, round(COALESCE(n_hit, 0) / CAST(n_true AS DOUBLE), 4) AS recall
       |FROM tot LEFT JOIN hit ON tot.probe_id = hit.probe_id
       |ORDER BY tot.probe_id""".stripMargin

  /** similarity_ann's oracle is generated, not hand-written: the fixed
    * random-hyperplane codebook (Similarity.hyperplanes, seed 42) is
    * embedded as SQL double literals (shortest round-trip decimal, exact),
    * and DuckDB's `list_dot_product` folds left-to-right exactly like the
    * engine's projection, so sign buckets — and therefore the scanned
    * cells and the top-k — agree bit for bit. */
  private def annOracle: String = {
    val bucketExpr = operators.Similarity.hyperplanes()
      .map(p => s"(CASE WHEN list_dot_product(emb, [${p.mkString(",")}]) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (SELECT vec_id, emb, $bucketExpr AS bkt FROM e),
       |p AS (SELECT vec_id AS probe_id, emb AS probe_emb, bkt FROM b WHERE vec_id < 10),
       |s AS (SELECT probe_id, a.vec_id AS neighbor_id, list_cosine_similarity(probe_emb, a.emb) AS cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, a.emb) DESC, a.vec_id) AS rn
       |  FROM b a JOIN p ON a.bkt = p.bkt AND a.vec_id <> p.probe_id)
       |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= 5
       |ORDER BY probe_id, rnk""".stripMargin
  }

  /** The shared CTE chain of every IVF oracle: the SAME deterministic
    * k-means re-run in DuckDB — integer-exact dimension sums
    * (floor(x·2^20) longs — integer adds commute, so the mean is
    * partitioning-independent), means re-quantized to FLOAT, cosine ties
    * broken by centroid id. Iterations are unrolled into CTE blocks; both
    * engines converge to bit-identical codebooks, so even the TRAINED
    * approximate index is exactly checked. Ends with `cellv(vec_id, emb,
    * cell)` — the final assignment — and `cents$iters` in scope. */
  private def ivfCtes(numCentroids: Int, iters: Int): String =
    ivfCtesExpr(numCentroids.toString, iters)

  /** `ncExpr` is any SQL scalar expression for the centroid count — a
    * literal for fixed-size indexes, or a subquery against the corpus for
    * auto-sized ones ([[autoCellCte]]). Lloyd training runs over the
    * SAMPLE `et` (every stride-th vector, stride =
    * `Similarity.ivfSampleStride` re-derived in integer SQL); the final
    * assignment `asgF`/`cellv` covers the whole corpus — exactly the
    * engine's split. */
  /** Hashed-document-embedding source for text-side vector oracles
    * (`semdedup_text`, `similar_docs`): the graft_hash_embed chain in SQL,
    * yielding `(vec_id, emb DOUBLE[])` from `documents`. */
  private val textEmbSourceSql: String =
    """SELECT doc_id AS vec_id, CAST(list_transform(range(64), i -> coalesce(CAST(list_sum(
      |      list_transform(list_filter(hs, x -> x % 64 = i),
      |                     x -> CASE WHEN (x // 64) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT), 0)) AS DOUBLE[]) AS emb
      |  FROM (SELECT doc_id, list_transform(
      |      list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> ''),
      |      w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM documents)""".stripMargin

  /** `p` prefixes every CTE name (`e` → `${p}e`, …) so TWO independent
    * chains can coexist in one statement — the `index_auto` oracle needs
    * the base-split codebook AND the full-corpus rebuilt one side by
    * side. The default empty prefix keeps every existing oracle's text
    * identical; a prefixed chain drops its leading `WITH ` via
    * `stripPrefix` at the composition site. `ncExpr` must reference the
    * SAME chain's ncell (e.g. `(SELECT nc FROM ${p}ncell)`). */
  private def ivfCtesExpr(ncExpr: String, iters: Int,
                          sourceSql: String =
                            "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings",
                          p: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH ${p}e AS ($sourceSql),
      |${p}iv AS (SELECT vec_id, i, CAST(floor(emb[i+1] * 1048576.0) AS BIGINT) AS ivx FROM ${p}e, range(64) t(i)),
      |${p}ncell AS (${autoCellCte(p)}),
      |${p}strd AS (SELECT greatest(1, (SELECT count(*) FROM ${p}e) // (4 * $ncExpr)) AS s),
      |${p}et AS (SELECT vec_id, emb FROM ${p}e WHERE vec_id % (SELECT s FROM ${p}strd) = 0),
      |${p}cents0 AS (SELECT CAST(vec_id AS INTEGER) AS cent_id, emb AS cemb FROM ${p}et
      |  WHERE vec_id < $ncExpr * (SELECT s FROM ${p}strd)),
      |""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s"""${p}asg$t AS (SELECT vec_id, cell FROM (
        |  SELECT e.vec_id, c.cent_id AS cell,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
        |  FROM ${p}et e, ${p}cents${t - 1} c) WHERE rn = 1),
        |${p}dims$t AS (SELECT cell, i,
        |    CAST(CAST(CAST(sum(ivx) AS DOUBLE) / (1048576.0 * CAST(count(*) AS DOUBLE)) AS FLOAT) AS DOUBLE) AS cv
        |  FROM ${p}iv JOIN ${p}asg$t USING (vec_id) GROUP BY cell, i),
        |${p}reb$t AS (SELECT cell, list(cv ORDER BY i) AS cemb FROM ${p}dims$t GROUP BY cell),
        |${p}cents$t AS (SELECT c.cent_id, COALESCE(r.cemb, c.cemb) AS cemb
        |  FROM ${p}cents${t - 1} c LEFT JOIN ${p}reb$t r ON c.cent_id = r.cell),
        |""".stripMargin
    }
    sb ++= s"""${p}asgF AS (SELECT vec_id, cell FROM (
      |  SELECT e.vec_id, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM ${p}e e, ${p}cents$iters c) WHERE rn = 1),
      |${p}cellv AS (SELECT e.vec_id, e.emb, a.cell FROM ${p}e e JOIN ${p}asgF a USING (vec_id))""".stripMargin
    sb.result()
  }

  /** The 2-probe assignment + pair CTEs shared by `semdedup_probed` and
    * both recall instruments: rank-≤2 cells over the trained codebook
    * (rank 1 is bit-identical to `cellv`'s argmax), pairs sharing any
    * probe cell. Appends to an [[ivfCtesExpr]] chain (needs `e`,
    * `cents3` in scope). */
  private def semDedupProbe2Cte(threshold: Double): String = s""",
    |cellv2 AS (SELECT vec_id, emb, cell FROM (
    |  SELECT e.vec_id, e.emb, c.cent_id AS cell,
    |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
    |  FROM e, cents3 c) WHERE rn <= 2),
    |p2 AS (SELECT b.vec_id AS vec_id, a.vec_id AS keeper
    |  FROM cellv2 a JOIN cellv2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
    |  WHERE list_cosine_similarity(a.emb, b.emb) >= $threshold)""".stripMargin

  /** Everything after the IVF chain for a two-method semdedup recall
    * instrument at `threshold` — shared by the vector and text keys. */
  private def semDedupRecallTail(threshold: Double): String = s""",
    |p AS (SELECT b.vec_id AS vec_id, CAST(b.cell AS INTEGER) AS cell, a.vec_id AS keeper
    |  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id < b.vec_id
    |  WHERE list_cosine_similarity(a.emb, b.emb) >= $threshold),
    |det AS (SELECT CAST(count(*) AS BIGINT) AS n_detected
    |  FROM (SELECT vec_id, cell FROM p GROUP BY vec_id, cell))""".stripMargin +
    semDedupProbe2Cte(threshold) + s""",
    |det2 AS (SELECT CAST(count(*) AS BIGINT) AS n_detected
    |  FROM (SELECT vec_id FROM p2 GROUP BY vec_id)),
    |tr AS (SELECT CAST(count(DISTINCT b.vec_id) AS BIGINT) AS n_true
    |  FROM cellv a JOIN cellv b ON a.vec_id < b.vec_id
    |  WHERE list_cosine_similarity(a.emb, b.emb) >= $threshold),
    |rows2 AS (
    |  SELECT 'probe2' AS method, n_true, det2.n_detected,
    |    CASE WHEN n_true = 0 THEN CAST(1000 AS BIGINT)
    |         ELSE det2.n_detected * 1000 // n_true END AS recall_permille
    |  FROM tr, det2
    |  UNION ALL
    |  SELECT 'same_cell' AS method, n_true, det.n_detected,
    |    CASE WHEN n_true = 0 THEN CAST(1000 AS BIGINT)
    |         ELSE det.n_detected * 1000 // n_true END AS recall_permille
    |  FROM tr, det)
    |SELECT method, n_true, n_detected, recall_permille FROM rows2
    |ORDER BY method""".stripMargin

  private def ivfOracle(numProbes: Int = 10, k: Int = 5, numCentroids: Int = 16,
                        iters: Int = 3, nprobe: Int = 2): String =
    ivfCtes(numCentroids, iters) + s""",
      |pc AS (SELECT probe_id, probe_emb, cell FROM (
      |  SELECT e.vec_id AS probe_id, e.emb AS probe_emb, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM e, cents$iters c WHERE e.vec_id < $numProbes) WHERE rn <= $nprobe),
      |s AS (SELECT probe_id, a.vec_id AS neighbor_id, list_cosine_similarity(probe_emb, a.emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, a.emb) DESC, a.vec_id) AS rn
      |  FROM cellv a JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id)
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= $k
      |ORDER BY probe_id, rnk""".stripMargin

  /** index_auto's shared oracle head: the BASE-SPLIT chain (vec_id % 10 ≠
    * 0 — the engine's maintenance split) trained to `cents3`, the full
    * corpus assigned against that FROZEN codebook (`cellx` — exactly the
    * appended store: base rows keep their build cells, delta rows get
    * argmax cells), then the drift numbers and the integer route rule
    * `max_cell · cells > 4 · vecs` ([[graft.operators.Similarity
    * .IndexAutoSkewX]]). Ends with `dr(k, vecs, maxc)` and `rt(route)`. */
  private def indexAutoBaseCtes: String =
    ivfCtesExpr("(SELECT nc FROM ncell)", 3,
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id % 10 <> 0") + s""",
      |ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |asgX AS (SELECT vec_id, cell FROM (
      |  SELECT e.vec_id, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM ea e, cents3 c) WHERE rn = 1),
      |cellx AS (SELECT e.vec_id, e.emb, a.cell FROM ea e JOIN asgX a USING (vec_id)),
      |dr AS (SELECT (SELECT count(*) FROM cents3) AS k,
      |              (SELECT count(*) FROM ea) AS vecs,
      |              COALESCE((SELECT max(c) FROM (SELECT count(*) AS c FROM cellx GROUP BY cell)), 0) AS maxc),
      |rt AS (SELECT CASE WHEN maxc::HUGEINT * k > 4::HUGEINT * vecs THEN 'rebuild' ELSE 'append' END AS route FROM dr)""".stripMargin

  /** index_auto's oracle: BOTH maintenance branches replayed — the
    * appended store (base codebook, `cellx`) and the full-corpus rebuilt
    * one (the `f_`-prefixed chain) — each searched for the standard probe
    * set, the branch selected by the replayed route. One statement proves
    * drift arithmetic, route, and served neighbors end to end. */
  private def indexAutoSql: String = {
    val rebuilt = ivfCtesExpr("(SELECT nc FROM f_ncell)", 3,
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings",
      p = "f_").stripPrefix("WITH ")
    indexAutoBaseCtes + ",\n" + rebuilt + s""",
      |pca AS (SELECT probe_id, probe_emb, cell FROM (
      |  SELECT e.vec_id AS probe_id, e.emb AS probe_emb, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM ea e, cents3 c WHERE e.vec_id < 10) WHERE rn <= 2),
      |sa AS (SELECT probe_id, a.vec_id AS neighbor_id, list_cosine_similarity(probe_emb, a.emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, a.emb) DESC, a.vec_id) AS rn
      |  FROM cellx a JOIN pca ON a.cell = pca.cell AND a.vec_id <> pca.probe_id),
      |pcb AS (SELECT probe_id, probe_emb, cell FROM (
      |  SELECT e.vec_id AS probe_id, e.emb AS probe_emb, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM ea e, f_cents3 c WHERE e.vec_id < 10) WHERE rn <= 2),
      |sb AS (SELECT probe_id, a.vec_id AS neighbor_id, list_cosine_similarity(probe_emb, a.emb) AS cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, a.emb) DESC, a.vec_id) AS rn
      |  FROM f_cellv a JOIN pcb ON a.cell = pcb.cell AND a.vec_id <> pcb.probe_id)
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk, rt.route
      |FROM sa, rt WHERE rn <= 5 AND rt.route = 'append'
      |UNION ALL
      |SELECT probe_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk, rt.route
      |FROM sb, rt WHERE rn <= 5 AND rt.route = 'rebuild'
      |ORDER BY probe_id, rnk""".stripMargin
  }

  /** index_audit's oracle: the drift evidence row from the same replayed
    * chain — integer-rational skew permille, declared cut, verdict. */
  private def indexAuditSql: String = indexAutoBaseCtes + s"""
      |SELECT CAST(k AS BIGINT) AS trained_cells, CAST(vecs AS BIGINT) AS n_vecs,
      |  CAST(maxc AS BIGINT) AS max_cell,
      |  CAST(CASE WHEN vecs = 0 THEN 0 ELSE maxc::HUGEINT * k * 1000 // vecs END AS BIGINT) AS skew_permille,
      |  CAST(4000 AS BIGINT) AS cut_permille, rt.route
      |FROM dr, rt""".stripMargin

  /** The auto-sizing grid of [[graft.operators.Similarity.ivfCellGrid]]
    * re-stated in integer-exact SQL: smallest power of two `p` with
    * `p² ≥ count(*)` — bit shifts and integer compares only, so both
    * engines compute the identical count from the data with no float
    * `sqrt`/`log2` boundary to diverge on. COALESCE mirrors the engine's
    * 2^20-cell clamp: past p²=2^40 vectors no grid entry qualifies and
    * `min(p)` is NULL, which without the clamp would silently diverge
    * from ivfCellGrid's documented cap instead of matching it. */
  private def autoCellCte(p: String = ""): String =
    "SELECT CAST(COALESCE(min(p), 1 << 20) AS INTEGER) AS nc FROM " +
      "(SELECT CAST(1 AS BIGINT) << g AS p FROM range(21) t(g)) " +
      s"WHERE p * p >= (SELECT count(*) FROM ${p}e)"

  /** knn_join's oracle: the same CTE chain — with the centroid count
    * derived from the corpus exactly as the Spark side derives it
    * ([[autoCellCte]]) — then the within-cell self-join. The stored
    * assignment is bit-identical to the re-derived one, so the
    * persisted-index join AND the auto-sizing are exactly checked. */
  private def knnJoinOracle(k: Int = 3, iters: Int = 3): String =
    ivfCtesExpr("(SELECT nc FROM ncell)", iters) + s""",
      |s AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |    list_cosine_similarity(a.emb, b.emb) AS cos,
      |    row_number() OVER (PARTITION BY a.vec_id ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) AS rn
      |  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
      |SELECT vec_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= $k
      |ORDER BY vec_id, rnk""".stripMargin

  /** mutual_knn's oracle: [[knnJoinOracle]]'s CTE chain up to the directed
    * top-k list, then the SAME mutual equi-join on the reversed pair the
    * engine runs — so the IVF layout, the directed ranks AND the mutuality
    * filter are all hash-checked in one statement. */
  private def mutualKnnOracle(k: Int = 3, iters: Int = 3): String =
    ivfCtesExpr("(SELECT nc FROM ncell)", iters) + s""",
      |s AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |    list_cosine_similarity(a.emb, b.emb) AS cos,
      |    row_number() OVER (PARTITION BY a.vec_id ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) AS rn
      |  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
      |t AS (SELECT vec_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rnk FROM s WHERE rn <= $k)
      |SELECT f.vec_id AS a, f.neighbor_id AS b, f.cos,
      |  f.rnk AS rank_ab, r.rnk AS rank_ba
      |FROM t f JOIN t r ON f.vec_id = r.neighbor_id AND f.neighbor_id = r.vec_id
      |WHERE f.vec_id < f.neighbor_id
      |ORDER BY a, b""".stripMargin

  /** Product-quantization CTE chain — [[graft.operators.Similarity
    * .pqCodebooks]] replayed in SQL: the (vec_id, s) subvector split, the
    * stride-derived training sample, per-subspace first-k seeds, `iters`
    * Lloyd rounds with argmin-L2 assignment (`row_number` over distance
    * ASC, cent_id ASC) and integer-exact float-requantized means, ending
    * in `asgF(vec_id, s, cell, d)` over the whole corpus. The L2 is the
    * same squared-diff left fold as the engine's `l2sq` (list_reduce's
    * first-element init is exact because squares are never -0.0). */
  private def pqCtes(m: Int = 8, subDim: Int = 8, k: Int = 16,
                     iters: Int = 2, prefix: String = "",
                     withE: Boolean = true): String = {
    def l2(a: String, b: String): String =
      s"list_reduce(list_transform(range(1, ${subDim + 1}), " +
        s"q -> ($a[CAST(q AS INT)] - $b[CAST(q AS INT)]) * " +
        s"($a[CAST(q AS INT)] - $b[CAST(q AS INT)])), (x, y) -> x + y)"
    // every internal CTE name carries `prefix` so the chain composes with
    // ivfCtes (which owns the unprefixed e/iv/asg/cents names) in one WITH
    val (sv, strd, svt, iv, asgF) =
      (s"${prefix}sv", s"${prefix}strd", s"${prefix}svt", s"${prefix}iv",
       s"${prefix}asgF")
    def cents(t: Int) = s"${prefix}cents$t"
    def asg(t: Int) = s"${prefix}asg$t"
    val sb = new StringBuilder
    if (withE)
      sb ++= "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),\n"
    sb ++= s"""$sv AS (SELECT vec_id, s, emb[s*$subDim+1 : s*$subDim+$subDim] AS emb8 FROM e, range($m) t(s)),
      |$strd AS (SELECT greatest(1, (SELECT count(*) FROM e) // ${4 * k}) AS st),
      |$svt AS (SELECT vec_id, s, emb8 FROM $sv WHERE vec_id % (SELECT st FROM $strd) = 0),
      |$iv AS (SELECT vec_id, s, i, CAST(floor(emb8[i+1] * 1048576.0) AS BIGINT) AS ivx FROM $svt, range($subDim) u(i)),
      |${cents(0)} AS (SELECT s, CAST(vec_id AS INTEGER) AS cent_id, emb8 AS cemb FROM $svt
      |  WHERE vec_id < $k * (SELECT st FROM $strd)),
      |""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s"""${asg(t)} AS (SELECT vec_id, s, cell FROM (
        |  SELECT v.vec_id, v.s, c.cent_id AS cell,
        |    row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY ${l2("v.emb8", "c.cemb")} ASC, c.cent_id) AS rn
        |  FROM $svt v JOIN ${cents(t - 1)} c ON v.s = c.s) WHERE rn = 1),
        |${prefix}dims$t AS (SELECT a.s, a.cell, i.i,
        |    CAST(CAST(CAST(sum(i.ivx) AS DOUBLE) / (1048576.0 * CAST(count(*) AS DOUBLE)) AS FLOAT) AS DOUBLE) AS cv
        |  FROM $iv i JOIN ${asg(t)} a ON i.vec_id = a.vec_id AND i.s = a.s GROUP BY a.s, a.cell, i.i),
        |${prefix}reb$t AS (SELECT s, cell, list(cv ORDER BY i) AS cemb FROM ${prefix}dims$t GROUP BY s, cell),
        |${cents(t)} AS (SELECT c.s, c.cent_id, COALESCE(r.cemb, c.cemb) AS cemb
        |  FROM ${cents(t - 1)} c LEFT JOIN ${prefix}reb$t r ON c.s = r.s AND c.cent_id = r.cell),
        |""".stripMargin
    }
    sb ++= s"""$asgF AS (SELECT vec_id, s, cell, d FROM (
      |  SELECT v.vec_id, v.s, c.cent_id AS cell, ${l2("v.emb8", "c.cemb")} AS d,
      |    row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY ${l2("v.emb8", "c.cemb")} ASC, c.cent_id) AS rn
      |  FROM $sv v JOIN ${cents(iters)} c ON v.s = c.s) WHERE rn = 1)""".stripMargin
    sb.result()
  }

  private def pqEncodeOracle(m: Int = 8): String =
    pqCtes() + s"""
      |SELECT vec_id,
      |  array_to_string(list(CAST(cell AS VARCHAR) ORDER BY s), '-') AS codes,
      |  round(list_reduce(list(d ORDER BY s), (x, y) -> x + y), 9) AS recon_sse
      |FROM asgF GROUP BY vec_id ORDER BY vec_id""".stripMargin

  private def pqSearchOracle(numProbes: Int = 10, k: Int = 5): String =
    pqCtes() + s""",
      |dt AS (SELECT p.vec_id AS probe_id, p.s, c.cent_id AS code,
      |    list_reduce(list_transform(range(1, 9), q -> (p.emb8[CAST(q AS INT)] - c.cemb[CAST(q AS INT)]) * (p.emb8[CAST(q AS INT)] - c.cemb[CAST(q AS INT)])), (x, y) -> x + y) AS d
      |  FROM sv p JOIN cents2 c ON p.s = c.s WHERE p.vec_id < $numProbes),
      |sc AS (SELECT dt.probe_id, a.vec_id AS neighbor_id,
      |    list_reduce(list(dt.d ORDER BY dt.s), (x, y) -> x + y) AS adist
      |  FROM asgF a JOIN dt ON a.s = dt.s AND a.cell = dt.code
      |  WHERE a.vec_id <> dt.probe_id
      |  GROUP BY dt.probe_id, a.vec_id),
      |r AS (SELECT probe_id, neighbor_id, adist,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adist ASC, neighbor_id) AS rn FROM sc)
      |SELECT probe_id, neighbor_id, round(adist, 9) AS adist, CAST(rn AS BIGINT) AS rnk
      |FROM r WHERE rn <= $k ORDER BY probe_id, rnk""".stripMargin

  /** IVF-PQ: the coarse-quantizer chain (ivfCtes — unprefixed names) and
    * the PQ chain (pqCtes, prefix `p`, sharing `e`) composed in one WITH;
    * candidates = vectors in each probe's `nprobe` nearest cells, ranked
    * by the PQ codes' ADC distance. Exactly the engine's two persisted
    * indexes joined at query time. */
  private def ivfpqOracle(numProbes: Int = 10, k: Int = 5,
                          numCentroids: Int = 16, ivfIters: Int = 3,
                          nprobe: Int = 2): String =
    ivfCtes(numCentroids, ivfIters) + ",\n" +
      pqCtes(prefix = "p", withE = false) + s""",
      |pc AS (SELECT probe_id, cell FROM (
      |  SELECT e.vec_id AS probe_id, c.cent_id AS cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM e, cents$ivfIters c WHERE e.vec_id < $numProbes) WHERE rn <= $nprobe),
      |cand AS (SELECT pc.probe_id, v.vec_id FROM cellv v JOIN pc ON v.cell = pc.cell
      |  WHERE v.vec_id <> pc.probe_id),
      |dt AS (SELECT p.vec_id AS probe_id, p.s, c.cent_id AS code,
      |    list_reduce(list_transform(range(1, 9), q -> (p.emb8[CAST(q AS INT)] - c.cemb[CAST(q AS INT)]) * (p.emb8[CAST(q AS INT)] - c.cemb[CAST(q AS INT)])), (x, y) -> x + y) AS d
      |  FROM psv p JOIN pcents2 c ON p.s = c.s WHERE p.vec_id < $numProbes),
      |sc AS (SELECT ca.probe_id, a.vec_id AS neighbor_id,
      |    list_reduce(list(dt.d ORDER BY dt.s), (x, y) -> x + y) AS adist
      |  FROM pasgF a JOIN cand ca ON a.vec_id = ca.vec_id
      |  JOIN dt ON dt.probe_id = ca.probe_id AND dt.s = a.s AND dt.code = a.cell
      |  GROUP BY ca.probe_id, a.vec_id),
      |r AS (SELECT probe_id, neighbor_id, adist,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adist ASC, neighbor_id) AS rn FROM sc)
      |SELECT probe_id, neighbor_id, round(adist, 9) AS adist, CAST(rn AS BIGINT) AS rnk
      |FROM r WHERE rn <= $k ORDER BY probe_id, rnk""".stripMargin

  /** [[graft.operators.Ranking.linkRank]]'s fixed-point iteration as
    * chained CTEs: synthetic affine-map edges, `rank div outdeg`
    * contributions, `(15·base + 85·inflow) div 100` damping — integers
    * end to end. */
  private def linkRankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH nn AS (SELECT count(*) AS n FROM documents),
      |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
      |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
      |od AS (SELECT src, count(*) AS odeg FROM ed GROUP BY src),
      |b AS (SELECT 1099511627776 // n AS base FROM nn),
      |r0 AS (SELECT doc_id, (SELECT base FROM b) AS r FROM documents),
      |""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s"""c$t AS (SELECT ed.dst, CAST(sum(r.r // od.odeg) AS BIGINT) AS m
        |  FROM ed JOIN r${t - 1} r ON ed.src = r.doc_id JOIN od ON ed.src = od.src GROUP BY ed.dst),
        |r$t AS (SELECT d.doc_id, CAST((15 * (SELECT base FROM b) + 85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS r
        |  FROM documents d LEFT JOIN c$t c ON d.doc_id = c.dst),
        |""".stripMargin
    }
    sb ++= s"""ind AS (SELECT dst, count(*) AS n_in FROM ed GROUP BY dst)
      |SELECT r.doc_id, CAST(COALESCE(ind.n_in, 0) AS BIGINT) AS in_links, r.r AS rank_scaled
      |FROM r$iters r LEFT JOIN ind ON r.doc_id = ind.dst ORDER BY r.doc_id""".stripMargin
    sb.result()
  }

  /** [[graft.operators.Ranking.seedRankFrom]]'s personalized-restart
    * fixed-point replayed — linkRankOracle with the teleport mass
    * concentrated on the seed class (constants from Ranking, one
    * definition site). */
  private def seedRankOracle(iters: Int): String = {
    val mod = operators.Ranking.SeedHopsSeedMod
    val sb = new StringBuilder
    sb ++= s"""WITH nn AS (SELECT count(*) AS n FROM documents),
      |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
      |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
      |od AS (SELECT src, count(*) AS odeg FROM ed GROUP BY src),
      |ns AS (SELECT count(*) AS n_seeds FROM documents WHERE doc_id % $mod = 0),
      |b AS (SELECT 1099511627776 // n_seeds AS sm FROM ns),
      |rv AS (SELECT doc_id, CASE WHEN doc_id % $mod = 0 THEN (SELECT sm FROM b) ELSE 0 END AS rst FROM documents),
      |r0 AS (SELECT doc_id, rst AS r FROM rv),
      |""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s"""c$t AS (SELECT ed.dst, CAST(sum(r.r // od.odeg) AS BIGINT) AS m
        |  FROM ed JOIN r${t - 1} r ON ed.src = r.doc_id JOIN od ON ed.src = od.src GROUP BY ed.dst),
        |r$t AS (SELECT d.doc_id, CAST((15 * rv.rst + 85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS r
        |  FROM documents d JOIN rv ON d.doc_id = rv.doc_id LEFT JOIN c$t c ON d.doc_id = c.dst),
        |""".stripMargin
    }
    sb ++= s"""fin AS (SELECT doc_id, r FROM r$iters)
      |SELECT doc_id, CAST(CASE WHEN doc_id % $mod = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_seed,
      |  r AS ppr_scaled
      |FROM fin ORDER BY doc_id""".stripMargin
    sb.result()
  }

  /** [[graft.operators.Ranking.hitsScores]]'s fixed-round mutual recursion
    * as chained CTEs: authority = in-sum of hubs, hub = out-sum of the NEW
    * authorities — raw long sums (degree-bounded growth, no overflow, no
    * normalization needed at fixed depth). */
  private def hitsOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH nn AS (SELECT count(*) AS n FROM documents),
      |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
      |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
      |h0 AS (SELECT doc_id, CAST(1048576 AS BIGINT) AS h FROM documents),
      |""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s"""a$t AS (SELECT d.doc_id, CAST(COALESCE(x.m, 0) AS BIGINT) AS a FROM documents d
        |  LEFT JOIN (SELECT ed.dst, sum(h.h) AS m FROM ed JOIN h${t - 1} h ON ed.src = h.doc_id GROUP BY ed.dst) x ON d.doc_id = x.dst),
        |h$t AS (SELECT d.doc_id, CAST(COALESCE(y.m, 0) AS BIGINT) AS h FROM documents d
        |  LEFT JOIN (SELECT ed.src, sum(a.a) AS m FROM ed JOIN a$t a ON ed.dst = a.doc_id GROUP BY ed.src) y ON d.doc_id = y.src),
        |""".stripMargin
    }
    sb ++= s"""sel AS (SELECT 1)
      |SELECT a.doc_id, a.a AS authority, h.h AS hub
      |FROM a$iters a JOIN h$iters h ON a.doc_id = h.doc_id ORDER BY a.doc_id""".stripMargin
    sb.result()
  }

  /** The R-round parallel k-core peel unrolled as chained CTEs (the
    * [[hitsOracle]] discipline): per round, degree among survivors via a
    * double semi-join on the symmetrized edge set, simultaneous removal of
    * sub-k vertices. Alias names never shadow CTE names (DuckDB's binder
    * lateral-izes a CTE reference that collides with a table alias). */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    val plantedLines = (1 to 5).map(j =>
      s"  UNION ALL SELECT doc_id, (doc_id + ${10 * j}) % (SELECT n FROM nn) FROM documents WHERE doc_id % 10 = 7")
      .mkString("\n")
    sb ++= s"""WITH nn AS (SELECT count(*) AS n FROM documents),
      |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
      |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0
      |$plantedLines),
      |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
      |und AS MATERIALIZED (SELECT DISTINCT ka, kb FROM (SELECT src AS ka, dst AS kb FROM ed UNION ALL SELECT dst, src FROM ed) sym),
      |alive0 AS MATERIALIZED (SELECT doc_id AS v FROM documents),
      |""".stripMargin
    // MATERIALIZED: every aliveN is referenced 3× downstream; DuckDB
    // inlines plain CTEs, which re-evaluates the whole chain per
    // reference — 3^R-fold blowup. Materialization keeps the peel linear.
    for (r <- 1 to rounds) {
      sb ++= s"""deg$r AS MATERIALIZED (SELECT u.ka AS v, count(*) AS d FROM und u
        |  JOIN alive${r - 1} xx ON u.ka = xx.v JOIN alive${r - 1} yy ON u.kb = yy.v GROUP BY u.ka),
        |rem$r AS MATERIALIZED (SELECT av.v FROM alive${r - 1} av LEFT JOIN deg$r dg ON av.v = dg.v
        |  WHERE COALESCE(dg.d, 0) < $k),
        |alive$r AS MATERIALIZED (SELECT av.v FROM alive${r - 1} av LEFT JOIN rem$r rm ON av.v = rm.v
        |  WHERE rm.v IS NULL),
        |""".stripMargin
    }
    val rems = (1 to rounds)
      .map(r => s"SELECT v, $r AS r FROM rem$r")
      .mkString(" UNION ALL ")
    sb ++= s"""rr AS ($rems),
      |fd AS (SELECT u.ka AS v, count(*) AS d FROM und u
      |  JOIN alive$rounds xx ON u.ka = xx.v JOIN alive$rounds yy ON u.kb = yy.v GROUP BY u.ka)
      |SELECT dc.doc_id,
      |  CAST(CASE WHEN rr.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
      |  CAST(COALESCE(rr.r, 0) AS BIGINT) AS removed_round,
      |  CAST(COALESCE(fd.d, 0) AS BIGINT) AS core_deg
      |FROM documents dc LEFT JOIN rr ON dc.doc_id = rr.v LEFT JOIN fd ON dc.doc_id = fd.v
      |ORDER BY dc.doc_id""".stripMargin
    sb.result()
  }

  /** The exact word-trigram Jaccard ≥ 0.8 pair join — the oracle for
    * `dedup_ngram`, for `dedup_minhash` (LSH + exact verification provably
    * equals the exact join at the threshold, see the inline note), and the
    * edge list under `dedup_clusters`' connected components. */
  /** Shared by `snapshot_diff` (batch) and `stream_snapshot_diff` — the
    * streaming form's contract is row-for-row equality with the batch
    * diff, so both keys hash-compare against one truth. */
  private val snapshotDiffSql: String =
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |mx AS (SELECT max(doc_id) AS mxk FROM docs),
      |a AS (SELECT doc_id, md5(text) AS sig_a FROM docs),
      |b AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN CAST(doc_id % 7 AS INTEGER) = 3 THEN text || ' (rev2)' ELSE text END) AS sig_b
      |  FROM docs WHERE CAST(doc_id % 13 AS INTEGER) <> 5
      |  UNION ALL
      |  SELECT d.doc_id + mx.mxk, md5(d.text) FROM docs d, mx WHERE CAST(d.doc_id % 11 AS INTEGER) = 2),
      |j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |        CASE WHEN a.doc_id IS NULL THEN 'added'
      |             WHEN b.doc_id IS NULL THEN 'removed'
      |             WHEN sig_a <> sig_b THEN 'changed'
      |             ELSE 'unchanged' END AS status
      |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id, status FROM j WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin

  private val ngramPairsSql: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8""".stripMargin

  /** The exact cross-split (delta = doc_id % 10 = 0 vs corpus) trigram
    * Jaccard ≥ 0.8 join — the oracle for `dedup_incremental` AND its
    * streaming twin `stream_dedup_near`: both run LSH candidates + exact
    * verification against the persisted index, so both equal the exact
    * join (same lossless-at-threshold argument as `dedup_minhash`). */
  private val incrementalOracle: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Quality scoring (sans presentation sort) — standalone oracle for
    * `quality_score` and a stage of the composed `corpus_export`. */
  private val qualityScoreSql: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |e AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS nw,
      |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE) AS nstop,
      |  CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE) AS totlen FROM d)
      |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, round(totlen / nw, 4) AS avg_word_len,
      |  round(nstop / nw, 4) AS stopword_ratio,
      |  round(least(nw / 50.0, 1.0) * 0.5 + least(nstop / nw * 5.0, 1.0) * 0.3 +
      |        CASE WHEN totlen / nw BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END, 4) AS quality
      |FROM e WHERE nw > 0""".stripMargin

  /** On-disk asset catalog replay — shared by the batch `binaryFile` scan
    * (full staging root) and its streaming twin (the drop root); reads THE
    * SAME staged files via read_blob. */
  private def mediaFilesScanSql(root: String = graft.multimodal.Media.AssetFilesRoot): String =
    s"""WITH f AS (SELECT filename, size, hex(content) AS hx FROM read_blob('$root/asset_*'))
      |SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
      |  CAST(size AS BIGINT) AS n_bytes, md5(hx) AS content_md5,
      |  CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
      |       WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |       WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
      |       WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
      |       ELSE 'unknown' END AS container
      |FROM f ORDER BY file_name""".stripMargin

  /** compaction_plan oracle, parameterized on the SAME (root, targetBytes)
    * constants the operator uses — one definition site for both. */
  private def compactionPlanSql(
      root: String = graft.multimodal.Media.AssetFilesRoot,
      targetBytes: Long = graft.multimodal.Media.CompactionTargetBytes): String =
    s"""WITH f AS (SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name, CAST(size AS BIGINT) AS n_bytes
      |      FROM read_blob('$root/asset_*')),
      |c AS (SELECT file_name, n_bytes,
      |        sum(n_bytes) OVER (ORDER BY file_name ROWS UNBOUNDED PRECEDING) AS endoff FROM f),
      |g AS (SELECT CAST((endoff - n_bytes) // $targetBytes AS BIGINT) AS group_id, file_name, n_bytes FROM c)
      |SELECT group_id, count(*) AS n_files, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  min(file_name) AS first_file, max(file_name) AS last_file
      |FROM g GROUP BY group_id ORDER BY group_id""".stripMargin

  /** compaction_run's oracle: the grouping replayed over the ORIGINAL
    * staged files (the compactionPlanSql window), each group's byte
    * content digested as the name-ordered concatenation of hex payloads,
    * the COMPACTED objects read back from disk and digested the same way,
    * and the comparison — both engines read original AND compacted bytes
    * end to end, so the executed rewrite's content claim is what the
    * hash gates. */
  private def compactionRunSql(
      root: String = graft.multimodal.Media.AssetFilesRoot,
      outRoot: String = graft.multimodal.Media.CompactedFilesRoot,
      targetBytes: Long = graft.multimodal.Media.CompactionTargetBytes): String =
    s"""WITH f AS (SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
      |             CAST(size AS BIGINT) AS n_bytes, content
      |      FROM read_blob('$root/asset_*')),
      |c AS (SELECT file_name, n_bytes, content,
      |        sum(n_bytes) OVER (ORDER BY file_name ROWS UNBOUNDED PRECEDING) AS endoff FROM f),
      |g AS (SELECT CAST((endoff - n_bytes) // $targetBytes AS BIGINT) AS group_id,
      |             file_name, n_bytes, content FROM c),
      |o AS (SELECT group_id, count(*) AS n_files, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |        md5(string_agg(hex(content), '' ORDER BY file_name)) AS omd5
      |      FROM g GROUP BY group_id),
      |k AS (SELECT CAST(regexp_extract(regexp_extract(filename, '([^/]+)$$', 1), 'group_(\\d+)', 1) AS BIGINT) AS group_id,
      |        CAST(size AS BIGINT) AS compacted_bytes, md5(hex(content)) AS kmd5
      |      FROM read_blob('$outRoot/group_*'))
      |SELECT o.group_id, o.n_files, o.total_bytes,
      |  COALESCE(k.compacted_bytes, 0) AS compacted_bytes,
      |  COALESCE(o.omd5 = k.kmd5, false) AS content_match
      |FROM o LEFT JOIN k USING (group_id) ORDER BY o.group_id""".stripMargin

  /** Per-rule quality verdicts in integer arithmetic — shared by the batch
    * `quality_filter` and its stateless streaming twin. */
  private val qualityFilterSql: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |e AS (SELECT doc_id, len(ws) AS nw,
      |  len(list_filter(ws, w -> w IN ('the','a','of','to','and','in','is','it'))) AS nstop,
      |  COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS totlen,
      |  greatest(len(ws) - 2, 0) AS ngr,
      |  len(list_distinct(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END)) AS ndist FROM d)
      |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
      |  CAST(nw >= 10 AS INTEGER) AS pass_words,
      |  CAST(nw > 0 AND totlen >= nw * 3 AND totlen <= nw * 8 AS INTEGER) AS pass_word_len,
      |  CAST(nw > 0 AND nstop * 20 >= nw AS INTEGER) AS pass_stopwords,
      |  CAST(ngr = 0 OR ndist * 5 >= ngr AS INTEGER) AS pass_repetition,
      |  CAST(nw >= 10 AND totlen >= nw * 3 AND totlen <= nw * 8
      |       AND nstop * 20 >= nw AND (ngr = 0 OR ndist * 5 >= ngr) AS INTEGER) AS keep
      |FROM e ORDER BY doc_id""".stripMargin

  /** Per-source composition report — shared by the batch `source_mix` and
    * its complete-mode streaming twin. */
  private val sourceMixSql: String =
    """WITH d AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |e AS (SELECT source,
      |  CAST(COALESCE(list_sum(list_transform(ws, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks,
      |  CAST(len(ws) AS DOUBLE) AS nw,
      |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE) AS nstop,
      |  CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE) AS totlen FROM d),
      |q AS (SELECT source, toks, CASE WHEN nw > 0 THEN
      |  round(least(nw / 50.0, 1.0) * 0.5 + least(nstop / nw * 5.0, 1.0) * 0.3 +
      |        CASE WHEN totlen / nw BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END, 4) END AS quality FROM e),
      |s AS (SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens,
      |      round(avg(quality), 4) AS avg_quality FROM q GROUP BY source)
      |SELECT source, n_docs, total_tokens,
      |  round(CAST(total_tokens AS DOUBLE) / (SELECT sum(total_tokens) FROM s), 4) AS token_share,
      |  avg_quality
      |FROM s ORDER BY source""".stripMargin

  /** Takedown closure manifest — shared by the batch op and its
    * compliance-queue streaming twin. */
  private val takedownSql: String =
    s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, d.source, COALESCE(c.cluster, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        |hit AS (SELECT DISTINCT cluster_id FROM lbl WHERE source IN ('src3', 'src13'))
        |SELECT l.doc_id, l.cluster_id,
        |  CASE WHEN l.source IN ('src3', 'src13') THEN 'direct' ELSE 'cluster' END AS reason
        |FROM lbl l JOIN hit USING (cluster_id) ORDER BY l.doc_id""".stripMargin

  /** Takedown CLOSURE verification — the invariant as a query: near-dup
    * pairs crossing the removal boundary (correct answer: EMPTY; the
    * differential gate checks the emptiness, not just the shape). */
  private val takedownVerifySql: String =
    s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, d.source, COALESCE(c.cluster, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        |hit AS (SELECT DISTINCT cluster_id FROM lbl WHERE source IN ('src3', 'src13')),
        |man AS (SELECT l.doc_id FROM lbl l JOIN hit USING (cluster_id))
        |SELECT doc_a, doc_b FROM np
        |WHERE (doc_a IN (SELECT doc_id FROM man)) <> (doc_b IN (SELECT doc_id FROM man))
        |ORDER BY doc_a, doc_b""".stripMargin

  /** Eval-in-train containment (sans presentation sort) — standalone
    * oracle for `decontaminate` and a stage of `corpus_export`. */
  private val decontaminateSql: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (SELECT a.doc_id AS eval_id, b.doc_id AS train_id, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2)
      |SELECT eval_id, train_id, CAST(inter AS DOUBLE) / sa.n AS containment
      |FROM pairs JOIN sizes sa ON eval_id = sa.doc_id
      |WHERE CAST(inter AS DOUBLE) / sa.n >= 0.6""".stripMargin

  /** The export pipeline's CTE chain, ending in `exp(doc_id, quality)` —
    * shared by the corpus_export and export_shards oracles. */
  private def exportCtes: String =
    s"""WITH RECURSIVE np AS ($ngramPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
       |reach AS (SELECT a AS v, b AS r FROM edges
       |  UNION
       |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
       |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
       |lbl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster_id
       |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
       |q AS ($qualityScoreSql),
       |cont AS (SELECT DISTINCT train_id AS doc_id FROM ($decontaminateSql) dc),
       |exp AS (SELECT l.doc_id, q.quality
       |  FROM lbl l JOIN q ON l.doc_id = q.doc_id
       |  WHERE l.doc_id % 10 <> 0 AND l.cluster_id = l.doc_id AND q.quality >= 0.7
       |    AND l.doc_id NOT IN (SELECT doc_id FROM cont))""".stripMargin

  /** Hopping-window aggregate — the oracle for both the batch
    * (`sliding_window`) and streaming (`stream_sliding`) forms, which are
    * the same logical plan over different sources. */
  private val slidingSql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
      |x AS (SELECT epoch_us(tsu) // 900000000 * 900000000 AS grid, event_type, value FROM e),
      |w AS (SELECT make_timestamp(grid - i * 900000000) AS ws, event_type, value
      |      FROM x, range(4) t(i))
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM w GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin

  /** Full-corpus cluster labels -- shared by the batch CC op and the
    * incremental maintenance path (compressed merge = full re-run,
    * provably: base labels are component minima). */
  private lazy val dedupClustersSql: String =
    s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
        |SELECT doc_id, cluster_id, count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lbl ORDER BY doc_id""".stripMargin

  /** log2 length-histogram -- shared by the batch op and its complete-mode
    * streaming twin (same rows, same oracle). */
  private val tokenHistogramSql: String =
    """WITH d AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT CAST(COALESCE(list_sum(list_transform(ws, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks FROM d),
        |b AS (SELECT toks, CASE WHEN toks <= 0 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(length(bin(toks)) - 1 AS BIGINT) END AS bin FROM e),
        |g AS (SELECT bin, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens FROM b GROUP BY bin),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td, CAST(sum(n_tokens) AS BIGINT) AS tt FROM g)
        |SELECT bin, CASE WHEN bin < 0 THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) << bin END AS lo_tokens,
        |  n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 4) AS doc_share,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE), 4) AS token_share
        |FROM g, t ORDER BY bin""".stripMargin

  /** Temperature-mixture arithmetic -- shared by the batch op and its
    * complete-mode streaming twin (same rows, same oracle). */
  /** Shared CTE chain for both DSIR oracles (ONE definition site — the
    * encodedDupSql discipline): tokenize (the repo regex), unigrams +
    * space-joined adjacent bigrams, md5 % 2⁶³ % buckets feature hash,
    * per-(doc, bucket) counts, smoothed bucket profiles, bit-length
    * log-ratio delta and normalizer calibration, per-doc
    * `w_bits = Σ c·Δ + n_feats·cal`. Every constant interpolates from
    * the TextAnalysis definitions. */
  private val dsirWeightsCte: String = {
    import graft.operators.TextAnalysis.{DsirBuckets, DsirTargetSource}
    s"""WITH toks AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> '') AS ws FROM documents),
      |uni AS (SELECT doc_id, source, unnest(ws) AS g FROM toks),
      |big AS (SELECT doc_id, source, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS g
      |        FROM (SELECT doc_id, source, ws, unnest(range(1, len(ws))) AS i FROM toks)),
      |grams AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
      |f AS (SELECT doc_id, source,
      |        CAST(md5_number_lower(g) % 9223372036854775808 AS BIGINT) % $DsirBuckets AS b,
      |        count(*) AS c
      |      FROM grams GROUP BY 1, 2, 3),
      |prof AS (SELECT b, sum(c) AS cp,
      |           sum(CASE WHEN source = '$DsirTargetSource' THEN c ELSE 0 END) AS cq
      |         FROM f GROUP BY 1),
      |cal AS (SELECT length(bin(sum(cp) + $DsirBuckets)) - length(bin(sum(cq) + $DsirBuckets)) AS cal FROM prof),
      |d AS (SELECT b, length(bin(cq + 1)) - length(bin(cp + 1)) AS d FROM prof),
      |pd AS (SELECT f.doc_id, sum(f.c) AS n_feats, sum(f.c * d.d) AS wraw FROM f JOIN d USING (b) GROUP BY 1),
      |w AS (SELECT doc.doc_id, CAST(COALESCE(pd.n_feats, 0) AS BIGINT) AS n_feats,
      |        CAST(COALESCE(pd.wraw, 0) + COALESCE(pd.n_feats, 0) * cal.cal AS BIGINT) AS w_bits
      |      FROM documents doc LEFT JOIN pd ON pd.doc_id = doc.doc_id, cal)""".stripMargin
  }

  private val mixtureWeightsSql: String =
    """WITH d AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT source, CAST(COALESCE(list_sum(list_transform(ws, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks FROM d),
        |s AS (SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens FROM e GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight FROM s),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS sumw, CAST(sum(n_tokens) AS BIGINT) AS sumt FROM w)
        |SELECT source, n_docs, n_tokens, weight,
        |  round(CAST(weight AS DOUBLE) / CAST(sumw AS DOUBLE), 6) AS sample_share,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(sumt AS DOUBLE), 6) AS natural_share,
        |  round((CAST(weight AS DOUBLE) / CAST(sumw AS DOUBLE)) / (CAST(n_tokens AS DOUBLE) / CAST(sumt AS DOUBLE)), 4) AS boost,
        |  round(CAST(weight AS DOUBLE) / CAST(sumw AS DOUBLE) * 1000000.0 / CAST(n_tokens AS DOUBLE), 4) AS expected_epochs
        |FROM w, t ORDER BY source""".stripMargin

  /** Winnow selected-set summary -- shared by the batch op and its
    * stateless streaming twin (same rows, same oracle). */
  private val winnowStatsSql: String =
    """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |s AS (SELECT doc_id, ch, CASE WHEN len(ch) >= 4
        |      THEN list_distinct(list_transform(range(1, len(ch) - 2), i ->
        |        i + list_max(list_filter(range(0, 4), j -> ch[i+j] = list_min(ch[i:i+3])))))
        |      ELSE CAST([] AS BIGINT[]) END AS ps FROM c)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_fp,
        |  list_min(list_transform(ps, p -> ch[p])) AS fp_min,
        |  list_max(list_transform(ps, p -> ch[p])) AS fp_max,
        |  CAST(list_sum(list_transform(ps, p -> ch[p])) AS BIGINT) AS fp_sum,
        |  CAST(list_sum(ps) AS BIGINT) AS pos_sum
        |FROM s ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "wc" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word FROM documents)
        |SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    // jsonl_scan / csv_scan: the Spark side reads every document THROUGH a
    // staged JSONL / RFC-4180 CSV encoding; the oracle reads the parquet
    // directly — a hash match proves the text codec round-trips the whole
    // corpus byte-faithfully (md5 crosses the staged format).
    "jsonl_scan" ->
      "SELECT doc_id, lang, md5(text) AS text_md5 FROM documents ORDER BY doc_id",
    "csv_scan" ->
      "SELECT doc_id, source, n_chars, md5(text) AS text_md5 FROM documents ORDER BY doc_id",
    "orc_scan" ->
      "SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM documents ORDER BY doc_id",
    "ii" ->
      """WITH toks AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word FROM documents) WHERE word <> '')
        |SELECT word, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS docs
        |FROM toks GROUP BY word ORDER BY word""".stripMargin,
    "mr_wc" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word FROM documents)
        |SELECT word AS "key", CAST(count(*) AS VARCHAR) AS "value" FROM toks WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "mr_ii" ->
      """WITH toks AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word FROM documents) WHERE word <> '')
        |SELECT word AS "key", string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS "value"
        |FROM toks GROUP BY word ORDER BY word""".stripMargin,
    "grep_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE text LIKE '%spark%' AND text LIKE '%stream%' ORDER BY doc_id""".stripMargin,
    // grep_indexed: TOKEN search (posting-list intersection), not
    // substring match — 'spark' the word, not 'sparkly'.
    "grep_indexed" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM t WHERE list_contains(ws, 'spark') AND list_contains(ws, 'stream'))
        |ORDER BY doc_id""".stripMargin,
    // boolean_search: (spark OR vector) AND table AND join AND NOT slow,
    // token semantics — the oracle evaluates the boolean over each doc's
    // token set; the engine answers it from bucket-pruned posting lists.
    "boolean_search" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM t
        |                 WHERE (list_contains(ws, 'spark') OR list_contains(ws, 'vector'))
        |                   AND list_contains(ws, 'table') AND list_contains(ws, 'join')
        |                   AND NOT list_contains(ws, 'slow'))
        |ORDER BY doc_id""".stripMargin,
    // phrase_search: exact token-SEQUENCE match ("table hash" as adjacent
    // tokens) with per-doc occurrence counts — the oracle scans bigram
    // positions directly; the engine answers from the positional index
    // (aligned posting-list intersection). Position semantics: overlapping
    // occurrences each count.
    "phrase_search" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |o AS (SELECT doc_id, lang,
        |  len(list_filter(range(1, len(ws)), i -> ws[i] = 'table' AND ws[i+1] = 'hash')) AS n_occ FROM d)
        |SELECT doc_id, lang, CAST(n_occ AS BIGINT) AS n_occ FROM o WHERE n_occ > 0 ORDER BY doc_id""".stripMargin,
    "topk_words" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word FROM documents)
        |SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // salted_distinct: the two-stage salted exact-distinct must equal the
    // plain count(DISTINCT) — salting is a physical-plan choice (hot-key
    // spreading), not a semantic one, and the gate proves it.
    "salted_distinct" ->
      """SELECT event_type AS k, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY k""".stripMargin,
    // distinct_sketch: the KMV estimator replayed exactly — same 63-bit
    // md5 hash (md5_number_lower mod 2^63), same k-th-smallest selection,
    // same one-division estimate ((k−1)·2⁶³ is a 6-significant-bit double,
    // exact) — so the approximate count hash-matches bit for bit.
    // skew_profile: per-key-column distribution shape — one
    // aggregate branch per analyzed column, identical arithmetic.
    "skew_profile" ->
      """SELECT * FROM (
        |SELECT 'events.user_id' AS key_column, CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4) + 0.0 AS skew_ratio,
        |  round(CASE WHEN count(*) = 1 THEN 0.0
        |    ELSE (log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c)) / log2(CAST(count(*) AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |UNION ALL
        |SELECT 'events.event_type' AS key_column, CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4) + 0.0 AS skew_ratio,
        |  round(CASE WHEN count(*) = 1 THEN 0.0
        |    ELSE (log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c)) / log2(CAST(count(*) AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM (SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS c FROM events WHERE event_type IS NOT NULL GROUP BY 1)
        |UNION ALL
        |SELECT 'lineitem.l_orderkey' AS key_column, CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4) + 0.0 AS skew_ratio,
        |  round(CASE WHEN count(*) = 1 THEN 0.0
        |    ELSE (log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c)) / log2(CAST(count(*) AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM (SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS c FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1)
        |UNION ALL
        |SELECT 'lineitem.l_suppkey' AS key_column, CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4) + 0.0 AS skew_ratio,
        |  round(CASE WHEN count(*) = 1 THEN 0.0
        |    ELSE (log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c)) / log2(CAST(count(*) AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM (SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS c FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1)
        |UNION ALL
        |SELECT 'orders.o_custkey' AS key_column, CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4) + 0.0 AS skew_ratio,
        |  round(CASE WHEN count(*) = 1 THEN 0.0
        |    ELSE (log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c)) / log2(CAST(count(*) AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM (SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS c FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)
        |) ORDER BY key_column""".stripMargin,
    "distinct_sketch" -> kmvSketchSql,
    // sketch_rollup: both sketch levels replayed — per-type k-smallest
    // distinct hashes, then the k smallest of the union of THOSE rows
    // (never the raw hashes), same estimate CASE at each level.
    "sketch_rollup" ->
      """WITH h AS (SELECT event_type, CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 9223372036854775808 AS BIGINT) AS hv
        |       FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT DISTINCT event_type, hv FROM h),
        |r AS (SELECT event_type, hv, row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM d),
        |sk AS (SELECT event_type, hv, rn FROM r WHERE rn <= 64),
        |per AS (SELECT event_type AS scope, CAST(count(*) AS BIGINT) AS sketch_size,
        |        round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |          ELSE 63.0 * 9223372036854775808.0 / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END, 4) + 0.0 AS est_distinct
        |        FROM sk GROUP BY 1),
        |u AS (SELECT DISTINCT hv FROM sk),
        |ur AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM u),
        |usk AS (SELECT hv, rn FROM ur WHERE rn <= 64),
        |allr AS (SELECT '__all__' AS scope, CAST(count(*) AS BIGINT) AS sketch_size,
        |        round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |          ELSE 63.0 * 9223372036854775808.0 / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END, 4) + 0.0 AS est_distinct
        |        FROM usk)
        |SELECT * FROM per UNION ALL SELECT * FROM allr ORDER BY scope""".stripMargin,
    // stream_distinct_sketch: the SAME sketch maintained as streaming
    // state — the buffer merge is bit-deterministic under any micro-batch
    // split, so the complete-mode final equals the batch sketch exactly.
    "stream_distinct_sketch" -> kmvSketchSql,
    // stream_quantile_sketch: the batch quantile-sketch arithmetic over
    // the event value column — the streaming histogram is bit-identical
    // to the batch binning, so the oracle is the same equi-width SQL.
    "stream_quantile_sketch" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx, count(*) AS n FROM c),
        |h AS (SELECT (cents - mn) * 1024 // (mx - mn + 1) AS bin, count(*) AS cnt FROM c, b GROUP BY 1),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |qv AS (SELECT unnest([50, 90, 95, 99]) AS q),
        |t AS (SELECT q, min(bin) AS bin FROM qv, cum, b WHERE cum >= (q * n + 99) // 100 GROUP BY q)
        |SELECT q, CAST(mn + (2 * bin + 1) * (mx - mn + 1) // 2048 AS DOUBLE) / 100 AS est_value
        |FROM t, b ORDER BY q""".stripMargin,
    // freq_sketch: the Count-Min grid replayed exactly — salted md5 cell
    // hash, exact long counter sums, min-over-depth estimate; the
    // APPROXIMATE frequency sketch hash-matches bit for bit.
    "freq_sketch" -> cmsSketchSql,
    // stream_freq_sketch: the SAME grid built as streaming state from
    // raw weight-1 token updates — counter addition is associative, so
    // the complete-mode final equals the batch weighted build exactly.
    "stream_freq_sketch" -> cmsSketchSql,
    "join_orders_customers" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "multi_join_agg" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "fuzzy_names" ->
      """SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey AND length(a.c_name) = length(b.c_name)
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY cust_a, cust_b""".stripMargin,
    "anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    // bloom_join: the Bloom filter is exact-in-result (no false negatives;
    // false positives die in the join), so the oracle is the PLAIN join.
    "bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "full_outer" ->
      """WITH c AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, count(*) AS n_clicks
        |           FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, count(*) AS n_purchases
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT COALESCE(c.hour, p.hour) AS hour, COALESCE(n_clicks, 0) AS n_clicks,
        |  COALESCE(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.hour = p.hour ORDER BY hour""".stripMargin,
    "q5_region" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "sliding_window" -> slidingSql,
    "stream_sliding" -> slidingSql,
    // stream_sliding_append: the hop aggregate restricted to windows the
    // final watermark closed — trailing open windows absent by design.
    "stream_sliding_append" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |wmx AS (SELECT max(tsu) - INTERVAL 10 MINUTE AS wm FROM e),
        |x AS (SELECT epoch_us(tsu) // 900000000 * 900000000 AS grid, event_type, value FROM e),
        |w AS (SELECT make_timestamp(grid - i * 900000000) AS ws, event_type, value
        |      FROM x, range(4) t(i))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM w, wmx WHERE ws + INTERVAL 1 HOUR <= wm
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    "sessionize" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT user_id, CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x)
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin,
    // attribution_touch: sessionize's island chain verbatim, the touch
    // read back as the rn=1 row of each session (the engine's min_by over
    // a unique (ts, event_id) key is the same total order).
    "attribution_touch" ->
      """WITH x AS (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY tsu, event_id) AS rn FROM z),
        |s AS (SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS channel,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
        |    sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS purch_cents
        |  FROM r GROUP BY 1, 2)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converting,
        |  CAST(sum(n_purch) AS BIGINT) AS n_purchases,
        |  CAST(sum(purch_cents) AS BIGINT) AS attributed_cents
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // attribution_linear: the same island chain; per session the sorted
    // distinct channel list, the even integer split with the remainder on
    // the rn=1 touch — credit conservation is an identity on both engines.
    "attribution_linear" ->
      """WITH x AS (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY tsu, event_id) AS rn FROM z),
        |s AS (SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS touch,
        |    list_sort(list(DISTINCT event_type)) AS channels,
        |    sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS purch_cents
        |  FROM r GROUP BY 1, 2),
        |e AS (SELECT touch, purch_cents, len(channels) AS n_ch, unnest(channels) AS channel FROM s)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_sessions_present,
        |  CAST(sum(CASE WHEN purch_cents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converting_present,
        |  CAST(sum(purch_cents // n_ch + CASE WHEN channel = touch THEN purch_cents % n_ch ELSE 0 END) AS BIGINT) AS credit_cents
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // interval_join: the oracle is the NAIVE quadratic overlap self-join
    // over the island-detected sessions — the bucketed equi-join rewrite
    // must reproduce it exactly (pair attribution dedup included).
    "interval_join" ->
      """WITH x AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT user_id, event_id, tsu, CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |s AS (SELECT user_id, sid, min(epoch_us(tsu)) AS st, max(epoch_us(tsu)) AS en FROM z GROUP BY 1, 2),
        |p AS (SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_overlaps,
        |        CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT) AS total_overlap_us
        |      FROM s a JOIN s b ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
        |      GROUP BY 1, 2)
        |SELECT user_a, user_b, n_overlaps, total_overlap_us
        |FROM p ORDER BY total_overlap_us DESC, user_a, user_b LIMIT 50""".stripMargin,
    "json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    // session_window_agg: gap-merged islands per user. Boundary rule
    // measured from Spark's merge iterator: a next event STRICTLY past the
    // current session end starts a new session; exact touch MERGES (the
    // [ts, ts+gap] closed-at-touch convention — probed, not assumed; at
    // µs-grained fixtures the two conventions coincide, so this is pinned
    // by a micro spec, not the corpus hash). end = last event + gap.
    // event_id tiebreaks make the cumulative session id deterministic for
    // same-timestamp events (which Spark merges into one window regardless).
    "session_window_agg" ->
      """WITH x AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu, value,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT user_id, event_id, tsu, value,
        |  CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, tsu, value, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y)
        |SELECT user_id, epoch_us(min(tsu)) AS start_us, epoch_us(max(tsu)) + 1800000000 AS end_us,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM z GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // session_window_dynamic: per-row gaps — a new session starts when the
    // event time STRICTLY exceeds the RUNNING MAX of preceding events'
    // individual ends (exact touch merges — Spark's merge-iterator rule,
    // micro-spec-pinned); end = max(ts_j + gap_j). Gap table interpolates
    // from Relational.DynamicGapMinutes.
    "session_window_dynamic" ->
      s"""WITH x AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu, value,
        |  ${Relational.dynamicGapCaseSql} AS gap_us FROM events),
        |y AS (SELECT user_id, event_id, tsu, value, gap_us,
        |  max(epoch_us(tsu) + gap_us) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM x),
        |z AS (SELECT user_id, tsu, value, gap_us, epoch_us(tsu) AS eus,
        |  sum(CASE WHEN pmax IS NULL OR epoch_us(tsu) > pmax THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y)
        |SELECT user_id, min(eus) AS start_us, max(eus + gap_us) AS end_us,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM z GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // peak_concurrency: the same session islands, swept — boundaries
    // bucketed by hour, within-bucket running sums with pinned tie order
    // (us, delta asc, user_id: half-open ends before starts), carry-in =
    // exclusive prefix of per-bucket nets.
    "peak_concurrency" ->
      """WITH x AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT user_id, event_id, tsu,
        |  CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y),
        |sess AS (SELECT user_id, epoch_us(min(tsu)) AS s_us, epoch_us(max(tsu)) + 1800000000 AS e_us
        |  FROM z GROUP BY user_id, sid),
        |bd AS (SELECT s_us AS us, CAST(1 AS BIGINT) AS delta, user_id FROM sess
        |  UNION ALL SELECT e_us, CAST(-1 AS BIGINT), user_id FROM sess),
        |bb AS (SELECT us, delta, user_id, us // 3600000000 AS b FROM bd),
        |run AS (SELECT b, sum(delta) OVER (PARTITION BY b ORDER BY us, delta, user_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM bb),
        |pk AS (SELECT b, CAST(max(rs) AS BIGINT) AS local_peak FROM run GROUP BY b),
        |nets AS (SELECT b, CAST(sum(delta) AS BIGINT) AS net, count(*) AS n_changes FROM bb GROUP BY b),
        |cr AS (SELECT b, n_changes, COALESCE(CAST(sum(net) OVER (ORDER BY b
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS carry FROM nets)
        |SELECT CAST(pk.b * 3600000000 AS BIGINT) AS hour_us, n_changes, carry + local_peak AS peak
        |FROM pk JOIN cr ON pk.b = cr.b ORDER BY hour_us""".stripMargin,
    "brand_revenue" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "pivot_events" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "except_vocab" ->
      """WITH d AS (SELECT lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |g AS (SELECT lang, unnest(CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) ELSE CAST([] AS VARCHAR[]) END) AS phrase FROM d),
        |en AS (SELECT DISTINCT phrase FROM g WHERE lang = 'en'),
        |fr AS (SELECT DISTINCT phrase FROM g WHERE lang = 'fr')
        |SELECT phrase FROM en EXCEPT SELECT phrase FROM fr ORDER BY phrase""".stripMargin,
    "intersect_vocab" ->
      """WITH d AS (SELECT lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |g AS (SELECT lang, unnest(CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) ELSE CAST([] AS VARCHAR[]) END) AS phrase FROM d),
        |en AS (SELECT DISTINCT phrase FROM g WHERE lang = 'en'),
        |fr AS (SELECT DISTINCT phrase FROM g WHERE lang = 'fr')
        |SELECT phrase FROM en INTERSECT SELECT phrase FROM fr ORDER BY phrase""".stripMargin,
    "histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,
    "sample_hash" ->
      """WITH f AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents)
        |SELECT doc_id, fp FROM f WHERE substring(fp, 1, 1) <= '1' ORDER BY doc_id""".stripMargin,
    // vocab_growth: Heaps-law curve — a word's contribution is its FIRST
    // slice; cumulative sums window over the 10 slice rows.
    "vocab_growth" ->
      """WITH nn AS (SELECT (count(*) + 9) // 10 AS per FROM documents),
        |w AS (SELECT doc_id // (SELECT per FROM nn) AS slice,
        |        unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS word
        |      FROM documents),
        |db AS (SELECT doc_id // (SELECT per FROM nn) AS slice, count(*) AS n_docs FROM documents GROUP BY 1),
        |tb AS (SELECT slice, count(*) AS n_tokens FROM w GROUP BY slice),
        |fs AS (SELECT word, min(slice) AS slice FROM w GROUP BY word),
        |nt AS (SELECT slice, count(*) AS new_types FROM fs GROUP BY slice),
        |j AS (SELECT db.slice AS slice, n_docs, COALESCE(n_tokens, 0) AS n_tokens,
        |        COALESCE(new_types, 0) AS new_types
        |      FROM db LEFT JOIN tb ON db.slice = tb.slice LEFT JOIN nt ON db.slice = nt.slice),
        |c AS (SELECT slice,
        |        CAST(sum(n_docs) OVER (ORDER BY slice) AS BIGINT) AS cum_docs,
        |        CAST(sum(n_tokens) OVER (ORDER BY slice) AS BIGINT) AS cum_tokens,
        |        CAST(new_types AS BIGINT) AS new_types,
        |        CAST(sum(new_types) OVER (ORDER BY slice) AS BIGINT) AS cum_vocab
        |      FROM j)
        |SELECT slice, cum_docs, cum_tokens, new_types, cum_vocab,
        |  round(CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE), 6) + 0.0 AS type_token_ratio
        |FROM c ORDER BY slice""".stripMargin,
    // doc_entropy: H = log2(n) − (1/n)·Σ c·log2(c) per doc, evenness
    // H/log2(types) with the single-type guard — per-doc unordered folds
    // rounded at 4 dp.
    "doc_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS word FROM documents),
        |c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_types,
        |        sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clc FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  round(log2(CAST(n_tokens AS DOUBLE)) - clc / CAST(n_tokens AS DOUBLE), 4) + 0.0 AS entropy_bits,
        |  round(CASE WHEN n_types = 1 THEN 1.0
        |        ELSE (log2(CAST(n_tokens AS DOUBLE)) - clc / CAST(n_tokens AS DOUBLE)) / log2(CAST(n_types AS DOUBLE)) END, 4) + 0.0 AS evenness
        |FROM g ORDER BY doc_id""".stripMargin,
    // zipf_slope: OLS over (ln rank, ln freq) per source — exact integer
    // inputs to ln, unordered vocab-row sums rounded at 4 dp. Degenerate
    // branches guard on INTEGER facts (n ≤ 1; flat profile min f = max f)
    // on both sides — a float-residual-equals-zero guard would depend on
    // summation order, which differs between the engines.
    "zipf_slope" ->
      """WITH w AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS word FROM documents),
        |c AS (SELECT source, word, count(*) AS f FROM w GROUP BY 1, 2),
        |r AS (SELECT source, f, ln(CAST(row_number() OVER (PARTITION BY source ORDER BY f DESC, word) AS DOUBLE)) AS x,
        |        ln(CAST(f AS DOUBLE)) AS y FROM c),
        |g AS (SELECT source, count(*) AS n, min(f) AS fmn, max(f) AS fmx,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM r GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_types,
        |  round(CASE WHEN n <= 1 THEN 0.0 ELSE (n*sxy - sx*sy) / (n*sxx - sx*sx) END, 4) + 0.0 AS zipf_slope,
        |  round(CASE WHEN n <= 1 OR fmn = fmx THEN 0.0
        |        ELSE (n*sxy - sx*sy) * (n*sxy - sx*sy) / ((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 4) + 0.0 AS r_squared
        |FROM g ORDER BY source""".stripMargin,
    // metric_corr: Pearson from EXACT int64 moment sums (hugeint in
    // DuckDB, both exact) — one int→double rounding at the end, then the
    // identical IEEE divide/sqrt on both engines; product-of-variances
    // zero guard mirrors the Spark `when`. The streaming twin maintains
    // the same moment table as complete-mode state (commutative integer
    // sums) and shares this oracle verbatim.
    "metric_corr" -> metricCorrSql,
    "stream_metric_corr" -> metricCorrSql,
    // source_divergence: pairwise Jensen–Shannon over source unigram
    // distributions — shared-word join terms plus the probability-mass
    // complements for one-sided words (identical decomposition).
    "source_divergence" ->
      """WITH w AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS word FROM documents),
        |c AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY 1),
        |d AS (SELECT c.source AS source, word, CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS p FROM c JOIN t ON c.source = t.source),
        |j AS (SELECT a.source AS source_a, b.source AS source_b, a.p AS p, b.p AS q
        |      FROM d a JOIN d b ON a.word = b.word AND a.source < b.source),
        |g AS (SELECT source_a, source_b, count(*) AS n_shared_types,
        |        sum(log2(2.0 * p / (p + q)) * p) AS term_p,
        |        sum(log2(2.0 * q / (p + q)) * q) AS term_q,
        |        sum(p) AS mass_p, sum(q) AS mass_q
        |      FROM j GROUP BY 1, 2),
        |pr AS (SELECT x.source AS source_a, y.source AS source_b
        |       FROM t x JOIN t y ON x.source < y.source)
        |SELECT pr.source_a, pr.source_b, CAST(COALESCE(n_shared_types, 0) AS BIGINT) AS n_shared_types,
        |  round(0.5 * (COALESCE(term_p, 0.0) + COALESCE(term_q, 0.0)
        |    + (CAST(1 AS DOUBLE) - COALESCE(mass_p, 0.0))
        |    + (CAST(1 AS DOUBLE) - COALESCE(mass_q, 0.0))), 4) + 0.0 AS js_divergence
        |FROM pr LEFT JOIN g ON pr.source_a = g.source_a AND pr.source_b = g.source_b
        |ORDER BY pr.source_a, pr.source_b""".stripMargin,
    "stratified_sample" ->
      """WITH f AS (SELECT doc_id, lang, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents),
        |r AS (SELECT lang, doc_id, fp, row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) AS rk FROM f)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, fp FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    // pps_sample: the Poisson PPS draw replayed exactly — same digest,
    // same 32-bit parse, same all-BIGINT threshold arithmetic (the
    // divide-first form keeps every intermediate ≤ target·maxdoc·2^32, so
    // the compare is corpus-size-robust in both engines).
    "pps_sample" -> ppsSampleSql,
    // stream_pps_sample / stream_dsir_weights: stateless per-row twins —
    // membership/score is a pure function of content + the offline-pinned
    // model (W scalar; Δ array + cal), so the streamed rows equal the
    // batch rows and the oracles are shared verbatim.
    "stream_pps_sample" -> ppsSampleSql,
    "stream_dsir_weights" -> s"""$dsirWeightsCte
      |SELECT doc_id, n_feats, w_bits FROM w ORDER BY doc_id""".stripMargin,
    "percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // quantile_sketch: the binned-histogram sketch re-run in integer-exact
    // SQL — cents quantization, integer-division bin ids, integer quantile
    // targets, midpoint estimate. Every arithmetic step is integral, so
    // the approximate sketch hash-matches exactly (the dedup_minhash
    // philosophy applied to numeric sketching).
    "quantile_sketch" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx, count(*) AS n FROM c),
        |h AS (SELECT (cents - mn) * 1024 // (mx - mn + 1) AS bin, count(*) AS cnt FROM c, b GROUP BY 1),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |qv AS (SELECT unnest([50, 90, 95, 99]) AS q),
        |t AS (SELECT q, min(bin) AS bin FROM qv, cum, b WHERE cum >= (q * n + 99) // 100 GROUP BY q)
        |SELECT q, CAST(mn + (2 * bin + 1) * (mx - mn + 1) // 2048 AS DOUBLE) / 100 AS est_price
        |FROM t, b ORDER BY q""".stripMargin,
    // quantile_sketch_kll: the hash-stratified KLL-style sketch replayed
    // integer-exactly — shared digest, trailing-zero strata as a 48-term
    // modulo sum, level = min j with survivors <= k (missing j densified
    // to 0), survivor read-out at ceil(r / 2^lvl). Deterministic per-row
    // survival makes even the APPROXIMATE sketch hash-gated.
    "quantile_sketch_kll" -> (kllLineitemCtes + "\n" +
      """SELECT CAST(q AS BIGINT) AS q, CAST(cents AS DOUBLE) / 100 AS est_price,
        |  lvl, m AS n_kept
        |FROM tq JOIN sk ON sk.i = tq.istar
        |ORDER BY q""".stripMargin),
    // kll_recall: the sketch chain, then the TEXTBOOK exact rank interval
    // of each estimate (correlated counts — duplicates make rank an
    // interval), the distance-to-interval error, and the declared
    // range-free 8-sigma bound.
    "kll_recall" -> (kllLineitemCtes + ",\n" +
      s"""est AS (SELECT CAST(q AS BIGINT) AS q, cents AS est_cents, lvl, n, istar
        |  FROM tq JOIN sk ON sk.i = tq.istar),
        |rk AS (SELECT e.q, e.est_cents, e.lvl, e.n,
        |    (SELECT count(*) FROM st WHERE cents < e.est_cents) + 1 AS lo,
        |    (SELECT count(*) FROM st WHERE cents <= e.est_cents) AS hi
        |  FROM est e),
        |fin AS (SELECT q, (q * n + 99) // 100 AS r, est_cents,
        |    CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, lvl, n FROM rk)
        |SELECT q, r, est_cents, lo, hi,
        |  greatest(CAST(0 AS BIGINT), lo - r, r - hi) AS rank_err,
        |  8 * CAST(floor(sqrt(CAST(n AS DOUBLE) *
        |        CAST((CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) AS DOUBLE))) AS BIGINT)
        |    + (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) AS bound_rank,
        |  CAST(greatest(CAST(0 AS BIGINT), lo - r, r - hi) <=
        |    8 * CAST(floor(sqrt(CAST(n AS DOUBLE) *
        |          CAST((CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) AS DOUBLE))) AS BIGINT)
        |      + (CAST(1 AS BIGINT) << CAST(lvl AS INTEGER)) AS BIGINT) AS within_bound
        |FROM fin ORDER BY q""".stripMargin),
    // stream_kll: per-tz counts add associatively (phase-1 state ≡ the
    // batch histogram under any split) and survival is per-row content,
    // so the streamed sketch equals the batch chain over events exactly.
    "stream_kll" -> (kllCtes(
      "SELECT CAST(event_id AS VARCHAR) AS rkey, CAST(round(value * 100) AS BIGINT) AS cents FROM events",
      1024) + "\n" +
      """SELECT CAST(q AS BIGINT) AS q, CAST(cents AS DOUBLE) / 100 AS est_value,
        |  lvl, m AS n_kept
        |FROM tq JOIN sk ON sk.i = tq.istar
        |ORDER BY q""".stripMargin),
    // winsorize_kll: the per-type KLL chain at q ∈ {1, 99}, bounds as
    // survivor values, then the integer clamp aggregation — the
    // winsorize_stats shape with rank-bounded cuts.
    "winsorize_kll" -> (kllScopedCtes(Seq(1, 99), withAll = false) + """,
      |bd AS (SELECT tq.scope,
      |    max(CASE WHEN q = 1 THEN cents END) AS lo_cents,
      |    max(CASE WHEN q = 99 THEN cents END) AS hi_cents
      |  FROM tq JOIN sk ON sk.scope = tq.scope AND sk.i = tq.istar
      |  GROUP BY 1)
      |SELECT ev.scope AS event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
      |  min(lo_cents) AS lo_cents, min(hi_cents) AS hi_cents,
      |  CAST(sum(greatest(least(cents, hi_cents), lo_cents)) AS BIGINT) AS winsorized_cents
      |FROM ev JOIN bd ON ev.scope = bd.scope
      |GROUP BY 1 ORDER BY 1""".stripMargin),
    // kll_rollup: the per-event-type KLL cells plus the __all__ cell. The
    // oracle computes __all__ DIRECTLY over the union rows — provably (and
    // engine-spec-gated) identical to the engine's state-only merge:
    // summed stratum histograms give the same level, and nesting makes
    // re-filtered survivors the same row set.
    "kll_rollup" -> kllRollupSql,
    // quantile_recall: the oracle RUNS the textbook full-sort order
    // statistic (row_number over the global cents order) — the engine's
    // bin-pruned selection is differentially proven against it; the
    // sketch estimate replays the quantile_sketch arithmetic in cents.
    "quantile_recall" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx, count(*) AS n FROM c),
        |qv AS (SELECT unnest([50, 90, 95, 99]) AS q),
        |r AS (SELECT q, (q * n + 99) // 100 AS r FROM qv, b),
        |o AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM c),
        |ex AS (SELECT r.q, o.cents AS exact_cents FROM r JOIN o ON o.rk = r.r),
        |h AS (SELECT (cents - mn) * 1024 // (mx - mn + 1) AS bin, count(*) AS cnt FROM c, b GROUP BY 1),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |t AS (SELECT r.q, min(bin) AS bin FROM r, cum WHERE cum >= r.r GROUP BY 1),
        |es AS (SELECT t.q, CAST(mn + (2 * bin + 1) * (mx - mn + 1) // 2048 AS BIGINT) AS est_cents,
        |         CAST((mx - mn + 1) // 1024 + 1 AS BIGINT) AS bound_cents FROM t, b)
        |SELECT ex.q, ex.exact_cents, es.est_cents,
        |  CAST(es.est_cents - ex.exact_cents AS BIGINT) AS err_cents,
        |  es.bound_cents,
        |  CAST(abs(es.est_cents - ex.exact_cents) <= es.bound_cents AS BIGINT) AS within_bound
        |FROM ex JOIN es ON ex.q = es.q ORDER BY ex.q""".stripMargin,
    // winsorize_stats: per-type sparse histogram + cum, both band bounds
    // as min-bin midpoints, then the integer clamp aggregation. Same bin
    // arithmetic as quantile_sketch, per scope.
    "winsorize_stats" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM e),
        |bi AS (SELECT event_type, cents, (cents - mn) * 1024 // (mx - mn + 1) AS bin FROM e, b),
        |h AS (SELECT event_type, bin, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |w AS (SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum FROM h),
        |lo AS (SELECT event_type, CAST(mn + (2 * min(bin) + 1) * (mx - mn + 1) // 2048 AS BIGINT) AS lo_cents
        |  FROM w, b WHERE cum >= (1 * n + 99) // 100 GROUP BY event_type, mn, mx),
        |hi AS (SELECT event_type, CAST(mn + (2 * min(bin) + 1) * (mx - mn + 1) // 2048 AS BIGINT) AS hi_cents
        |  FROM w, b WHERE cum >= (99 * n + 99) // 100 GROUP BY event_type, mn, mx)
        |SELECT bi.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  min(lo_cents) AS lo_cents, min(hi_cents) AS hi_cents,
        |  CAST(sum(greatest(least(cents, hi_cents), lo_cents)) AS BIGINT) AS winsorized_cents
        |FROM bi JOIN lo ON bi.event_type = lo.event_type
        |        JOIN hi ON bi.event_type = hi.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // quantile_rollup: the mergeable histogram cube replayed relationally —
    // per-cell bin counts ARE the state, the __all__ level is the per-bin
    // SUM of the stored cell counts (exactly graft_hist_merge's
    // element-wise addition), and the read-out is the quantile_sketch
    // arithmetic per scope. All-integer, so merged ≡ direct is exact.
    "quantile_rollup" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM e),
        |bi AS (SELECT event_type, (cents - mn) * 1024 // (mx - mn + 1) AS bin FROM e, b),
        |pt AS (SELECT event_type AS scope, bin, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |al AS (SELECT '__all__' AS scope, bin, sum(cnt) AS cnt FROM pt GROUP BY 1, 2),
        |u AS (SELECT * FROM pt UNION ALL SELECT * FROM al),
        |nn AS (SELECT scope, sum(cnt) AS n FROM u GROUP BY 1),
        |c AS (SELECT scope, bin, sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum FROM u),
        |qv AS (SELECT unnest([50, 90, 95, 99]) AS q),
        |s AS (SELECT scope, q, min(bin) AS bin FROM c JOIN nn USING (scope), qv
        |      WHERE cum >= (q * n + 99) // 100 GROUP BY 1, 2)
        |SELECT scope, CAST(q AS INTEGER) AS q,
        |  CAST(mn + (2 * bin + 1) * (mx - mn + 1) // 2048 AS DOUBLE) / 100 AS est_value
        |FROM s, b ORDER BY scope, q""".stripMargin,
    // hll_rollup: the full register table replayed integer-exactly —
    // md5 % 2^63 hash, h % m bucket, bit-length rank (w = 0 → max rank),
    // empty registers materialized via the range(m) grid, __all__ =
    // element-wise MAX of the per-type registers; the estimate arithmetic
    // is the engine's hllEstimate token for token (left-associated, 2^54
    // exact double), linear-counting branch included.
    "hll_rollup" -> hllRollupSql,
    // stream_hll: the SAME read-out over the stream-maintained register
    // table — register max is associative, commutative and idempotent, so
    // the materialized states equal the batch ones and the oracle is
    // shared verbatim.
    "stream_hll" -> hllRollupSql,
    "profile_table" -> profileOracleSql,
    // constraint_audit: the validation suite replayed — same corrupted
    // shard injection, same one-pass aggregate facts, same anti-join
    // orphan count, verdict recomputed per constraint.
    "constraint_audit" ->
      """WITH corrupted AS (SELECT o_orderkey, -o_custkey - 1 AS o_custkey, 'X' AS o_orderstatus,
        |    -o_totalprice AS o_totalprice, NULL AS o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 1000 = 0),
        |i AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders
        |  UNION ALL SELECT * FROM corrupted),
        |a AS (SELECT count(*) AS n_rows, count(DISTINCT o_orderkey) AS uk,
        |    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS bad_status,
        |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS null_date
        |  FROM i),
        |o AS (SELECT count(*) AS orphans FROM i
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |u AS (SELECT 'complete_orderdate' AS check_name, null_date AS violations FROM a
        |  UNION ALL SELECT 'domain_orderstatus', bad_status FROM a
        |  UNION ALL SELECT 'range_totalprice_positive', bad_price FROM a
        |  UNION ALL SELECT 'ri_custkey_in_customer', orphans FROM o
        |  UNION ALL SELECT 'unique_orderkey', n_rows - uk FROM a)
        |SELECT check_name, CAST(violations AS BIGINT) AS violations,
        |  CAST(a.n_rows AS BIGINT) AS n_rows,
        |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM u, a ORDER BY check_name""".stripMargin,
    // rolling_features: trailing [t-3600s+1us, t] per-user frame — the
    // inclusive boundary stated identically on both sides; RANGE peers
    // (equal us) included by both engines.
    "rolling_features" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |f AS (SELECT event_type,
        |        count(*) OVER (PARTITION BY user_id ORDER BY us
        |          RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS trail_n,
        |        sum(cents) OVER (PARTITION BY user_id ORDER BY us
        |          RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS trail_cents
        |      FROM e)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN trail_n >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursty,
        |  CAST(max(trail_n) AS BIGINT) AS max_trail_n,
        |  CAST(sum(trail_cents) AS BIGINT) AS sum_trail_cents
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    // outlier_events: |v - mean| > 3sigma cleared of denominators —
    // user_lifecycle: integer-µs span arithmetic against the broadcast
    // corpus horizon; day counts are distinct integer day indexes.
    "user_lifecycle" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |h AS (SELECT max(us) AS max_us FROM e),
        |g AS (SELECT user_id, min(us) AS first_us, max(us) AS last_us, count(*) AS n_events,
        |        count(DISTINCT us // 86400000000) AS active_days
        |      FROM e GROUP BY 1)
        |SELECT user_id, first_us, last_us, n_events, CAST(active_days AS BIGINT) AS active_days,
        |  CASE WHEN first_us > max_us - 604800000000 THEN 'new'
        |       WHEN last_us < max_us - 604800000000 THEN 'churned'
        |       ELSE 'active' END AS status
        |FROM g, h ORDER BY user_id""".stripMargin,
    // revenue_rank_delta: rank-of-aggregate + lag-of-rank over the
    // nations×quarters matrix; cents-integer revenue, name tie-break.
    "revenue_rank_delta" ->
      """WITH r AS (SELECT n_name, CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT) AS qidx,
        |        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey
        |      GROUP BY 1, 2),
        |k AS (SELECT qidx, n_name, rev_cents,
        |        CAST(row_number() OVER (PARTITION BY qidx ORDER BY rev_cents DESC, n_name) AS BIGINT) AS rnk
        |      FROM r),
        |d AS (SELECT qidx, n_name, rev_cents, rnk,
        |        lag(rnk) OVER (PARTITION BY n_name ORDER BY qidx) AS prev_rnk
        |      FROM k)
        |SELECT qidx, n_name, rev_cents, rnk,
        |  CAST(COALESCE(prev_rnk - rnk, 0) AS BIGINT) AS rank_delta,
        |  CAST(CASE WHEN prev_rnk IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_first
        |FROM d ORDER BY qidx, rnk""".stripMargin,
    // basket_affinity: the Apriori 2-itemset pass — basket-bounded pair
    // join, support floor before the stats joins, lift ranked.
    "basket_affinity" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ic AS (SELECT l_partkey, count(*) AS cnt FROM b GROUP BY 1),
        |t AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        |p AS (SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b, count(*) AS support
        |      FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, support, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
        |  round(CAST(support AS DOUBLE) * n_orders / (CAST(ca.cnt AS DOUBLE) * cb.cnt), 4) + 0.0 AS lift
        |FROM p JOIN ic ca ON p.part_a = ca.l_partkey JOIN ic cb ON p.part_b = cb.l_partkey, t
        |ORDER BY lift DESC, part_a, part_b LIMIT 50""".stripMargin,
    // anomaly_hours: median/MAD robust z over hourly counts, cleared of
    // fractions — M2 = 2·median, D = |2c − M2|, T2 = 2·median(D), flag
    // iff 2·D > 3·T2; every comparison a long.
    "anomaly_hours" ->
      """WITH h AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_bucket, count(*) AS c FROM events GROUP BY 1),
        |m AS (SELECT CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT) AS m2 FROM h),
        |dv AS (SELECT hour_bucket, c, m2, abs(2 * c - m2) AS d FROM h, m),
        |t AS (SELECT CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT) AS t2 FROM dv)
        |SELECT hour_bucket, c AS n_events, m2 AS median_2x, d AS abs_dev_2x, t2 AS mad_2x
        |FROM dv, t WHERE 2 * d > 3 * t2 ORDER BY hour_bucket""".stripMargin,
    // ewma_hours: the dyadic EWMA replayed exactly — same hour buckets,
    // same cents quantization, weight 2^(19−g) per hour gap g, numerator/
    // denominator exact BIGINTs (DuckDB sums in HUGEINT, cast back), and
    // the same truncating integer division (all quantities non-negative,
    // so floor vs trunc never diverges).
    "ewma_hours" -> ewmaHoursSql,
    "cusum_shift" -> cusumSql,
    "stream_cusum" -> cusumSql,
    // stream_ewma_hours: the SAME read-out over the stream-maintained
    // hourly grid — cents sums are commutative, so the materialized grid
    // equals the batch one and the oracle is shared verbatim.
    "stream_ewma_hours" -> ewmaHoursSql,
    // stream_anomaly_hours: the SAME verdict over the stream-maintained
    // hour table — counts are commutative, so the materialized aggregate
    // equals the batch one and the oracle is shared verbatim.
    "stream_anomaly_hours" ->
      """WITH h AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_bucket, count(*) AS c FROM events GROUP BY 1),
        |m AS (SELECT CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT) AS m2 FROM h),
        |dv AS (SELECT hour_bucket, c, m2, abs(2 * c - m2) AS d FROM h, m),
        |t AS (SELECT CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT) AS t2 FROM dv)
        |SELECT hour_bucket, c AS n_events, m2 AS median_2x, d AS abs_dev_2x, t2 AS mad_2x
        |FROM dv, t WHERE 2 * d > 3 * t2 ORDER BY hour_bucket""".stripMargin,
    // (n*v - s)^2 > 9*(n*q - s^2) — exact integers both sides (DuckDB
    // computes in HUGEINT, the engine in decimal(38,0)).
    "outlier_events" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |st AS (SELECT event_type, count(*) AS n, sum(v) AS s, sum(v * v) AS q FROM c GROUP BY event_type)
        |SELECT c.event_type, count(*) AS n_outliers,
        |  CAST(sum(v) AS BIGINT) AS sum_outlier_cents,
        |  CAST(max(v) AS BIGINT) AS max_outlier_cents
        |FROM c JOIN st USING (event_type)
        |WHERE (n * v - s) * (n * v - s) > 9 * (n * q - s * s)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,
    // cohort_retention: quarter index = year*4 + quarter-1, integer
    // end-to-end; activity collapses to distinct (customer, quarter)
    // before any join, matching the engine's shrink-before-join shape.
    "cohort_retention" ->
      """WITH a AS (SELECT DISTINCT o_custkey,
        |             year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS qidx FROM orders),
        |c AS (SELECT o_custkey, min(qidx) AS cq FROM a GROUP BY o_custkey)
        |SELECT concat(cq // 4, '-Q', cq % 4 + 1) AS cohort, a.qidx - cq AS q_offset,
        |  count(*) AS n_active
        |FROM a JOIN c USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY cohort, q_offset""".stripMargin,
    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |c AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, tsu FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(c.tsu) AS click_us, epoch_us(p.tsu) AS purchase_us
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.tsu <= c.tsu
        |ORDER BY c.event_id""".stripMargin,
    "range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |  ('T1_budget', 0.0, 50000.0), ('T2_mid', 50000.0, 150000.0),
        |  ('T3_high', 150000.0, 300000.0), ('T4_premium', 300000.0, 450000.0),
        |  ('T5_whale', 450000.0, 1000000000.0))
        |SELECT tier, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |s1 AS (SELECT user_id, event_type, us,
        |  min(CASE WHEN event_type = 'view' THEN us END) OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END) OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) OVER (PARTITION BY user_id) AS t3 FROM s2),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM s3 GROUP BY user_id)
        |SELECT count(t1) AS n_view, count(t2) AS n_view_click, count(t3) AS n_view_click_purchase FROM u""".stripMargin,
    "ntile_spend" ->
      """WITH t AS (SELECT o_orderpriority, o_totalprice,
        |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS q FROM orders)
        |SELECT o_orderpriority, CAST(q AS BIGINT) AS quartile, count(*) AS n_orders,
        |  round(min(o_totalprice), 2) AS min_price, round(max(o_totalprice), 2) AS max_price,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM t GROUP BY o_orderpriority, q ORDER BY o_orderpriority, q""".stripMargin,
    "user_paths" ->
      """WITH e AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events)
        |SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS path, count(*) AS n_path_events
        |FROM e WHERE rn <= 10 GROUP BY user_id ORDER BY user_id""".stripMargin,
    // DuckDB's arg_max can't take a composite ordering value, so the oracle
    // expresses the same argmax (max balance, suppkey-descending tie-break)
    // as a window top-1.
    "top_supplier" ->
      """WITH s AS (SELECT n_name, s_name, s_acctbal,
        |  row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey DESC) AS rn,
        |  count(*) OVER (PARTITION BY n_name) AS n_suppliers,
        |  max(s_acctbal) OVER (PARTITION BY n_name) AS mx
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, s_name AS top_supplier, round(mx, 2) AS top_acctbal, n_suppliers
        |FROM s WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "order_gaps" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
        |  lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev FROM orders),
        |g AS (SELECT o_custkey, epoch_us(o_orderdate) - epoch_us(prev) AS gap_us FROM o)
        |SELECT o_custkey, count(gap_us) AS n_gaps,
        |  round(avg(gap_us) / 3600000000.0, 4) AS avg_gap_hours,
        |  round(CAST(max(gap_us) AS DOUBLE) / 3600000000.0, 4) AS max_gap_hours
        |FROM g GROUP BY o_custkey HAVING count(gap_us) > 0 ORDER BY o_custkey""".stripMargin,
    // link_rank: the synthetic edge derivation, out/in degrees, and three
    // fixed-point damping rounds replayed verbatim — every operation is
    // integer (% , //, exact long sums), so the iterative kernel
    // hash-matches with no float boundary.
    "link_rank" -> linkRankOracle(3),
    // seed_rank: the personalized restart vector propagated at the same
    // fixed depth — integers end to end, teleport mass on the seed class.
    "seed_rank" -> seedRankOracle(3),
    // hits_scores: the two-aggregate mutual recursion replayed at the
    // same fixed depth — integers end to end.
    "hits_scores" -> hitsOracle(2),
    "kcore" -> kcoreOracle(5, 6),
    // triangle_count: the oracle is the NAIVE id-canonical triple
    // self-join over the same dense-class edge set, so the Spark side's
    // degree-ordered-orientation rewrite is differentially proven to
    // count the same triangles.
    "triangle_participation" -> {
      val plantedLines = (1 to 5).map(j =>
        s"  UNION ALL SELECT doc_id, (doc_id + ${10 * j}) % (SELECT n FROM nn) FROM documents WHERE doc_id % 10 = 7")
        .mkString("\n")
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0
        |$plantedLines),
        |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM t WHERE src <> dst),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
        |v AS (SELECT unnest([x, y, z]) AS doc_id FROM tri)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // link_communities: connected components of the same-host link
    // subgraph, min-reachable-id labels via recursive CTE — the
    // dedup_clusters oracle pattern over the id-derived edge list.
    "link_communities" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |eu AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM t
        |  WHERE src <> dst AND src % 5 = dst % 5),
        |edges AS (SELECT a, b FROM eu UNION SELECT b, a FROM eu),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS community_id FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, COALESCE(c.community_id, d.doc_id) AS community_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
        |SELECT doc_id, community_id, count(*) OVER (PARTITION BY community_id) AS community_size
        |FROM lbl ORDER BY doc_id""".stripMargin,
    // seed_hops: min directed hop distance from the curated-seed class
    // (doc_id % SeedHopsSeedMod = 0) within the declared horizon, -1
    // beyond it. The oracle deliberately enumerates ALL bounded walks
    // through the recursive CTE (UNION dedups (v, hops) states) and takes
    // min(hops) — the textbook distance query — so the engine's frontier
    // rewrite (each vertex expanded at most once, anti-joined against the
    // settled set) is differentially proven distance-exact. Parameters
    // come from the Ranking constants (one definition site).
    "seed_hops" ->
      s"""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
        |walk AS (SELECT doc_id AS v, 0 AS hops FROM documents
        |    WHERE doc_id % ${Ranking.SeedHopsSeedMod} = 0
        |  UNION
        |  SELECT e.dst, walk.hops + 1 FROM walk JOIN ed e ON e.src = walk.v
        |  WHERE walk.hops < ${Ranking.SeedHopsMaxHops}),
        |d AS (SELECT v, min(hops) AS hops FROM walk GROUP BY v)
        |SELECT dc.doc_id, CAST(COALESCE(d.hops, -1) AS BIGINT) AS hops
        |FROM documents dc LEFT JOIN d ON d.v = dc.doc_id
        |ORDER BY dc.doc_id""".stripMargin,
    // seed_costs: min WEIGHTED cost from the seed class within the same
    // horizon — the oracle enumerates all bounded walks WITH their costs
    // (UNION dedups (v, cost, hops) states) and takes min(cost), so the
    // engine's improved-frontier Bellman-Ford is differentially proven
    // cost-exact. Weight arithmetic interpolates from the Ranking
    // constants (one definition site).
    "seed_costs" ->
      s"""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
        |ew AS (SELECT src, dst, (src + dst) % ${Ranking.SeedCostWeightMod} + 1 AS w FROM ed),
        |walk AS (SELECT doc_id AS v, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM documents
        |    WHERE doc_id % ${Ranking.SeedHopsSeedMod} = 0
        |  UNION
        |  SELECT e.dst, walk.cost + e.w, walk.hops + 1 FROM walk JOIN ew e ON e.src = walk.v
        |  WHERE walk.hops < ${Ranking.SeedHopsMaxHops}),
        |d AS (SELECT v, min(cost) AS cost FROM walk GROUP BY v)
        |SELECT dc.doc_id, CAST(COALESCE(d.cost, -1) AS BIGINT) AS cost
        |FROM documents dc LEFT JOIN d ON d.v = dc.doc_id
        |ORDER BY dc.doc_id""".stripMargin,
    // link_cycles: directed SCC over the citation-oriented graph (bulk
    // affine edges src > dst with the ring class held out + planted closed
    // citation rings on doc_id % 10 = 7, groups of SccRingSize). The
    // oracle takes min over the FULL recursive-CTE reachability closure —
    // the textbook form whose intermediate is |reach| pairs — and applies
    // the same F=B pair criterion, so the engine's round-bounded hash-min
    // propagation is differentially proven to compute the true extremal
    // labels (the seed_hops discipline). Ring arithmetic interpolates from
    // the Ranking constant (one definition site).
    "link_cycles" ->
      s"""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |qq AS (SELECT CASE WHEN n >= 8 THEN (n - 8) // 10 + 1 ELSE 0 END AS q FROM nn),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |bulk AS (SELECT DISTINCT src, dst FROM t
        |  WHERE src > dst AND src % 10 <> 7 AND dst % 10 <> 7),
        |rm AS (SELECT doc_id AS v, ((doc_id - 7) // 10) // ${Ranking.SccRingSize} AS g,
        |         ((doc_id - 7) // 10) % ${Ranking.SccRingSize} AS p
        |       FROM documents WHERE doc_id % 10 = 7),
        |ring AS (SELECT v AS src,
        |    (rm.g * ${Ranking.SccRingSize} + (rm.p + 1) % least(${Ranking.SccRingSize}, qq.q - rm.g * ${Ranking.SccRingSize})) * 10 + 7 AS dst
        |  FROM rm, qq),
        |edges AS MATERIALIZED (SELECT src, dst FROM bulk
        |  UNION SELECT src, dst FROM ring WHERE src <> dst),
        |reach AS (SELECT src, dst FROM edges
        |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |fmin AS (SELECT d.doc_id AS v, least(d.doc_id, COALESCE(min(r.src), d.doc_id)) AS f
        |         FROM documents d LEFT JOIN reach r ON r.dst = d.doc_id GROUP BY d.doc_id),
        |bmin AS (SELECT d.doc_id AS v, least(d.doc_id, COALESCE(min(r.dst), d.doc_id)) AS b
        |         FROM documents d LEFT JOIN reach r ON r.src = d.doc_id GROUP BY d.doc_id),
        |lab AS (SELECT fmin.v, CASE WHEN fmin.f = bmin.b THEN fmin.f ELSE fmin.v END AS scc_id
        |        FROM fmin JOIN bmin ON fmin.v = bmin.v)
        |SELECT v AS doc_id, scc_id, count(*) OVER (PARTITION BY scc_id) AS scc_size
        |FROM lab ORDER BY doc_id""".stripMargin,
    // cocitation: pairs of documents cited by the same citers — pair
    // generation from the citing side (out-degree-bounded), in-degrees
    // joined after the (a, b) collapse, deterministic top-50.
    "cocitation" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
        |ind AS (SELECT dst, count(*) AS ind FROM ed GROUP BY dst),
        |p AS (SELECT x.dst AS a, y.dst AS b, count(*) AS cocite
        |      FROM ed x JOIN ed y ON x.src = y.src AND x.dst < y.dst GROUP BY 1, 2)
        |SELECT a, b, cocite, ia.ind AS in_a, ib.ind AS in_b,
        |  round(CAST(cocite AS DOUBLE) / CAST(ia.ind + ib.ind - cocite AS DOUBLE), 4) + 0.0 AS jaccard
        |FROM p JOIN ind ia ON p.a = ia.dst JOIN ind ib ON p.b = ib.dst
        |ORDER BY cocite DESC, a, b LIMIT 50""".stripMargin,
    // community_rollup: the per-farm table — size, internal edges, link
    // density (1.0 = clique) and full-graph citation mass per multi-member
    // community; singletons excluded (the normal web).
    "community_rollup" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |t AS (SELECT doc_id AS src, (doc_id*7+3) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents
        |  UNION ALL SELECT doc_id, (doc_id*31+11) % (SELECT n FROM nn) FROM documents WHERE doc_id % 3 = 0),
        |ed AS (SELECT DISTINCT src, dst FROM t WHERE src <> dst),
        |eu AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed
        |  WHERE src % 5 = dst % 5),
        |edges AS (SELECT a, b FROM eu UNION SELECT b, a FROM eu),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS community_id FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, COALESCE(c.community_id, d.doc_id) AS community_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        |sz AS (SELECT community_id, count(*) AS n_members FROM lbl GROUP BY 1),
        |m AS (SELECT doc_id, l.community_id, n_members FROM lbl l JOIN sz USING (community_id)
        |      WHERE n_members >= 2),
        |ind AS (SELECT dst, count(*) AS in_links FROM ed GROUP BY dst),
        |mass AS (SELECT community_id, CAST(max(n_members) AS BIGINT) AS n_members,
        |    CAST(sum(COALESCE(i.in_links, 0)) AS BIGINT) AS total_in_links
        |  FROM m LEFT JOIN ind i ON m.doc_id = i.dst GROUP BY community_id),
        |ie AS (SELECT m.community_id, count(*) AS n_internal_edges
        |  FROM eu JOIN m ON eu.a = m.doc_id GROUP BY 1)
        |SELECT mass.community_id, mass.n_members,
        |  CAST(COALESCE(ie.n_internal_edges, 0) AS BIGINT) AS n_internal_edges,
        |  round(CAST(COALESCE(ie.n_internal_edges, 0) AS DOUBLE) /
        |        (mass.n_members * (mass.n_members - 1) / 2), 4) AS link_density,
        |  mass.total_in_links
        |FROM mass LEFT JOIN ie ON mass.community_id = ie.community_id
        |ORDER BY mass.community_id""".stripMargin,
    // triangle_count: same affine edge derivation, symmetrized; the
    // oracle replays the degree orientation and both joins.
    "triangle_count" ->
      """WITH d0 AS (SELECT doc_id FROM documents),
        |nn AS (SELECT count(*) AS n FROM d0),
        |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst FROM d0, nn
        |       UNION ALL SELECT doc_id, (doc_id * 13 + 5) % n FROM d0, nn
        |       UNION ALL SELECT doc_id, (doc_id * 31 + 11) % n FROM d0, nn WHERE doc_id % 3 = 0),
        |ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0 WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM (SELECT a AS v FROM ue UNION ALL SELECT b AS v FROM ue) z GROUP BY v),
        |o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b) THEN ue.a ELSE ue.b END AS u,
        |             CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b) THEN ue.b ELSE ue.a END AS w,
        |             CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b) THEN db.d ELSE da.d END AS dw
        |      FROM ue JOIN deg da ON ue.a = da.v JOIN deg db ON ue.b = db.v),
        |wj AS (SELECT x.w AS p, y.w AS q FROM o x JOIN o y
        |       ON x.u = y.u AND (x.dw < y.dw OR (x.dw = y.dw AND x.w < y.w))),
        |tri AS (SELECT count(*) AS n_triangles FROM wj
        |        WHERE EXISTS (SELECT 1 FROM o WHERE o.u = wj.p AND o.w = wj.q)),
        |em AS (SELECT count(*) AS n_edges FROM ue),
        |wm AS (SELECT CAST(sum(dd * (dd - 1) // 2) AS BIGINT) AS n_wedges
        |       FROM (SELECT count(*) AS dd FROM o GROUP BY u) z)
        |SELECT n_edges, n_wedges, n_triangles FROM em, wm, tri""".stripMargin,
    "tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tf.word AS word, tf,
        |    CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN df ON tf.word = df.word, n),
        |r AS (SELECT doc_id, word, tf, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rnk FROM sc)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, word, tf, round(tfidf, 6) AS tfidf
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "bm25_search" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
        |st AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |toks AS (SELECT doc_id, unnest(ws) AS word FROM d),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks WHERE word IN ('stream', 'join', 'window') GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |sc AS (SELECT tf.doc_id AS doc_id, tf.word AS word,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
        |  FROM tf JOIN df ON tf.word = df.word JOIN dl ON tf.doc_id = dl.doc_id, st),
        |p AS (SELECT doc_id,
        |    COALESCE(max(CASE WHEN word = 'stream' THEN contrib END), 0.0) AS c_stream,
        |    COALESCE(max(CASE WHEN word = 'join' THEN contrib END), 0.0) AS c_join,
        |    COALESCE(max(CASE WHEN word = 'window' THEN contrib END), 0.0) AS c_window
        |  FROM sc GROUP BY doc_id),
        |r AS (SELECT doc_id, c_stream + c_join + c_window AS score FROM p),
        |t AS (SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM r)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, round(score, 4) AS score
        |FROM t WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
    // hybrid_search: the bm25 CTE chain at top-20, the hashing-trick
    // pseudo-doc query embedding against the corpus embeddings at top-20,
    // fused by RRF (1/(60+rank), pure rank arithmetic — double-exact).
    "hybrid_search" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
        |st AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |toks AS (SELECT doc_id, unnest(ws) AS word FROM d),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks WHERE word IN ('stream', 'join', 'window') GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |sc AS (SELECT tf.doc_id AS doc_id, tf.word AS word,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
        |  FROM tf JOIN df ON tf.word = df.word JOIN dl ON tf.doc_id = dl.doc_id, st),
        |p AS (SELECT doc_id,
        |    COALESCE(max(CASE WHEN word = 'stream' THEN contrib END), 0.0) AS c_stream,
        |    COALESCE(max(CASE WHEN word = 'join' THEN contrib END), 0.0) AS c_join,
        |    COALESCE(max(CASE WHEN word = 'window' THEN contrib END), 0.0) AS c_window
        |  FROM sc GROUP BY doc_id),
        |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY c_stream + c_join + c_window DESC, doc_id) AS rnk_lex
        |  FROM p),
        |lex AS (SELECT doc_id, CAST(rnk_lex AS BIGINT) AS rnk_lex FROM lexr WHERE rnk_lex <= 20),
        |te AS (SELECT doc_id, CAST(list_transform(range(64), i -> coalesce(CAST(list_sum(
        |      list_transform(list_filter(hs, x -> x % 64 = i),
        |                     x -> CASE WHEN (x // 64) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT), 0)) AS DOUBLE[]) AS emb
        |  FROM (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d)),
        |q AS (SELECT CAST(list_transform(range(64), i -> coalesce(CAST(list_sum(
        |      list_transform(list_filter(qh, x -> x % 64 = i),
        |                     x -> CASE WHEN (x // 64) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT), 0)) AS DOUBLE[]) AS qemb
        |  FROM (SELECT list_transform(['stream', 'join', 'window'], w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS qh)),
        |semr AS (SELECT doc_id, row_number() OVER (ORDER BY list_cosine_similarity(emb, qemb) DESC, doc_id) AS rnk_sem
        |  FROM te, q),
        |sem AS (SELECT doc_id, CAST(rnk_sem AS BIGINT) AS rnk_sem FROM semr WHERE rnk_sem <= 20),
        |f AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, rnk_lex, rnk_sem,
        |    COALESCE(CAST(1 AS DOUBLE) / (60 + CAST(rnk_lex AS DOUBLE)), 0.0)
        |    + COALESCE(CAST(1 AS DOUBLE) / (60 + CAST(rnk_sem AS DOUBLE)), 0.0) AS rrf
        |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
        |t AS (SELECT doc_id, rrf, rnk_lex, rnk_sem, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk FROM f)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, round(rrf, 6) AS rrf, rnk_lex, rnk_sem
        |FROM t WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |  || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END)
        |  || 'Shard' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/Data/set' || CAST(doc_id % 20 AS VARCHAR)
        |  || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR)
        |           WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)
        |  || (CASE WHEN doc_id % 7 = 0 THEN '#Top' ELSE '' END) AS url FROM documents),
        |c AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
        |  || regexp_replace(regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), '^www\.', ''), ':443$', '')
        |  || regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |       regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1),
        |       'utm_[a-z]+=[^&#]*&?', '', 'g'), '[?&]$', ''), '/$', ''), '/\?', '?') AS canon_url FROM u)
        |SELECT canon_url, min(doc_id) AS keep_id, count(*) AS n_variants
        |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin,
    "stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tsu AS c_ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, tsu AS p_ts FROM e WHERE event_type = 'purchase')
        |SELECT click_id, purchase_id, c.user_id AS user_id,
        |  epoch_us(c_ts) AS click_us, epoch_us(p_ts) AS purchase_us
        |FROM c JOIN p ON c.user_id = p.user_id AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,
    // stream_join_left: matched pairs = the inner oracle; unmatched clicks
    // emit only if evicted — match horizon (c_ts + 30 min) below the final
    // global watermark (min of the two sides' max ts, − 10 min).
    "stream_join_left" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tsu AS c_ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, tsu AS p_ts FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT min(mx) - INTERVAL 10 MINUTE AS w
        |       FROM (SELECT event_type, max(tsu) AS mx FROM e
        |             WHERE event_type IN ('click', 'purchase') GROUP BY event_type) sidemax),
        |j AS (SELECT c.click_id, c.user_id, c.c_ts, p.purchase_id, p.p_ts
        |      FROM c JOIN p ON c.user_id = p.user_id AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTE),
        |u AS (SELECT c.click_id, c.user_id, c.c_ts
        |      FROM c LEFT JOIN (SELECT DISTINCT click_id AS jc FROM j) m ON c.click_id = m.jc
        |      CROSS JOIN wm
        |      WHERE m.jc IS NULL AND c.c_ts + INTERVAL 30 MINUTE < wm.w)
        |SELECT click_id, user_id, epoch_us(c_ts) AS click_us,
        |  COALESCE(purchase_id, -1) AS purchase_id, COALESCE(epoch_us(p_ts), -1) AS purchase_us
        |FROM (SELECT click_id, user_id, c_ts, purchase_id, p_ts FROM j
        |      UNION ALL SELECT click_id, user_id, c_ts, NULL, NULL FROM u)
        |ORDER BY click_id, purchase_id""".stripMargin,
    // stream_join_full: matched pairs = the inner oracle; unmatched clicks
    // evict at horizon c_ts + 30 min < wm (the left rule); unmatched
    // purchases evict at p_ts < wm (a future click has c_ts > wm and a
    // match needs c_ts <= p_ts). −1 sentinels on BOTH absent sides.
    "stream_join_full" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tsu AS c_ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, tsu AS p_ts FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT min(mx) - INTERVAL 10 MINUTE AS w
        |       FROM (SELECT event_type, max(tsu) AS mx FROM e
        |             WHERE event_type IN ('click', 'purchase') GROUP BY event_type) sidemax),
        |j AS (SELECT c.click_id, c.user_id, c.c_ts, p.purchase_id, p.p_ts
        |      FROM c JOIN p ON c.user_id = p.user_id AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTE),
        |uc AS (SELECT c.click_id, c.user_id, c.c_ts
        |       FROM c LEFT JOIN (SELECT DISTINCT click_id AS jc FROM j) m ON c.click_id = m.jc
        |       CROSS JOIN wm
        |       WHERE m.jc IS NULL AND c.c_ts + INTERVAL 30 MINUTE < wm.w),
        |up AS (SELECT p.purchase_id, p.user_id, p.p_ts
        |       FROM p LEFT JOIN (SELECT DISTINCT purchase_id AS jp FROM j) m ON p.purchase_id = m.jp
        |       CROSS JOIN wm
        |       WHERE m.jp IS NULL AND p.p_ts < wm.w)
        |SELECT COALESCE(click_id, -1) AS click_id, user_id,
        |  COALESCE(epoch_us(c_ts), -1) AS click_us,
        |  COALESCE(purchase_id, -1) AS purchase_id, COALESCE(epoch_us(p_ts), -1) AS purchase_us
        |FROM (SELECT click_id, user_id, c_ts, purchase_id, p_ts FROM j
        |      UNION ALL SELECT click_id, user_id, c_ts, NULL, NULL FROM uc
        |      UNION ALL SELECT NULL, user_id, NULL, purchase_id, p_ts FROM up)
        |ORDER BY click_id, purchase_id""".stripMargin,
    "cube_pricing" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS count_order
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "rollup_pricing" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    // grouping_sets_pricing: the asymmetric set list neither ROLLUP nor
    // CUBE produces; 'ALL' slot convention shared with the rollup twin.
    "grouping_sets_pricing" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    // q3_shipping: integer-exact revenue (cents × (100 − disc-cents) =
    // 10⁻⁴ dollars — both 2-decimal, per-row product exact, no double
    // rounding anywhere); top-10 tie-break pinned (revenue desc, date,
    // orderkey).
    "q3_shipping" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_e4 DESC, orderdate, l_orderkey LIMIT 10""".stripMargin,
    // lapsed_big_accounts: textbook Q22 shape — scalar-subquery threshold
    // over the positive-balance sub-population + NOT EXISTS on recent
    // orders. The float-average threshold is cross-multiplied into exact
    // integers (cents * n_pos > sum_cents) on BOTH engines, so no
    // within-ULP customer can flip between them.
    "lapsed_big_accounts" ->
      s"""WITH cc AS (SELECT c_custkey, c_mktsegment,
        |              CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |p AS (SELECT count(*) AS n_pos, sum(cents) AS sum_cents FROM cc WHERE cents > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
        |  CAST(sum(cents) AS BIGINT) AS total_acctbal_cents
        |FROM cc, p
        |WHERE cc.cents * p.n_pos > p.sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = cc.c_custkey
        |                    AND o.o_orderdate >= DATE '${Relational.LapsedCutoff}')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // waiting_suppliers: the oracle deliberately runs the TEXTBOOK Q21
    // correlated EXISTS / NOT-EXISTS form, so the Spark side's
    // fold-quantifiers-into-counts rewrite (one fact scan + a window over
    // the order×supplier grain) is differentially PROVEN equivalent to
    // the quantifier semantics. numwait counts late LINES (l1 ranges over
    // lines — the Q21 contract); lateness = shipped > 90 days after the
    // order date, exact timestamp+interval on both engines.
    "waiting_suppliers" ->
      s"""SELECT s_name, s_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders o
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL ${Relational.WaitingLateDays} DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL ${Relational.WaitingLateDays} DAY)
        |GROUP BY s_name, s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT ${Relational.WaitingTopK}""".stripMargin,
    // big_spenders: Q18 shape — per-order quantity sums HAVING-filtered,
    // rejoined to order/customer detail; integer units/cents, pinned
    // top-k tie-break. The oracle spells the same single-fact-scan
    // decomposition (qualifying CTE ⋈ orders ⋈ customer).
    "big_spenders" ->
      s"""WITH q AS (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |           FROM lineitem GROUP BY 1
        |           HAVING sum(CAST(round(l_quantity) AS BIGINT)) > ${Relational.BigSpendersQtyFloor})
        |SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents, sum_qty
        |FROM q JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY totalprice_cents DESC, orderdate, o_orderkey LIMIT ${Relational.BigSpendersTopK}""".stripMargin,
    // q4_priority_exists: the oracle RUNS the textbook Q4 correlated
    // EXISTS, so the semi-join's at-most-once contract is differentially
    // proven (an inner join would overcount multi-late-line orders).
    "q4_priority_exists" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '${Relational.Q4StartDate}'
        |  AND o_orderdate < DATE '${Relational.Q4EndDate}'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL ${Relational.WaitingLateDays} DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q6_forecast: the pushdown benchmark — three scan-side predicates,
    // no join; exact cents × discount-cents products.
    "q6_forecast" ->
      s"""SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '${Relational.Q6Year}-01-01'
        |  AND l_shipdate < DATE '${Relational.Q6Year + 1}-01-01'
        |  AND l_discount >= ${Relational.Q6DiscLo} AND l_discount <= ${Relational.Q6DiscHi}
        |  AND l_quantity < ${Relational.Q6QtyCap}""".stripMargin,
    // q10_returns: Q10 shape — the wide customer-detail group; exact e4
    // revenue; tie-break pinned (revenue desc, custkey).
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name AS nation,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_return_lines
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= DATE '${Relational.Q10StartDate}'
        |  AND o_orderdate < DATE '${Relational.Q10EndDate}'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT ${Relational.Q10TopK}""".stripMargin,
    // q13_order_counts: Q13 shape — LEFT JOIN so the zero-order bucket
    // exists; count(o_orderkey) skips the unmatched nulls on both engines.
    "q13_order_counts" ->
      s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '${Relational.Q13ExcludedPriority}'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // q15_top_revenue: Q15 shape — scalar-max equality over EXACT integer
    // revenue (a float equality would be ULP-dependent); ties kept.
    "q15_top_revenue" ->
      s"""WITH r AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '${Relational.Q15StartDate}'
        |    AND l_shipdate < DATE '${Relational.Q15EndDate}'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_e4
        |FROM supplier JOIN r ON s_suppkey = l_suppkey
        |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    // q7_nation_volume: Q7 shape — bi-directional nation-pair slice over
    // the full star; exact e4 revenue; ship-year from the same window.
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = '${Relational.Q7NationA}' AND n2.n_name = '${Relational.Q7NationB}')
        |    OR (n1.n_name = '${Relational.Q7NationB}' AND n2.n_name = '${Relational.Q7NationA}'))
        |  AND l_shipdate >= DATE '${Relational.Q7StartYear}-01-01'
        |  AND l_shipdate < DATE '${Relational.Q7EndYear + 1}-01-01'
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // q8_market_share: Q8 shape — exact e4 integer sums, ONE rounded
    // division per year at the output edge (no float accumulation).
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = '${Relational.Q8Nation}'
        |      THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) AS BIGINT) AS rev_nation_e4,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_total_e4,
        |  CASE WHEN sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) = 0 THEN 0.0 ELSE
        |  round(CAST(sum(CASE WHEN n2.n_name = '${Relational.Q8Nation}'
        |      THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE), 4) END + 0.0 AS mkt_share
        |FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey AND r_name = '${Relational.Q8Region}'
        |  AND s_nationkey = n2.n_nationkey AND p_type = '${Relational.Q8PartType}'
        |  AND o_orderdate >= DATE '${Relational.Q8StartYear}-01-01'
        |  AND o_orderdate < DATE '${Relational.Q8EndYear + 1}-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    // q12_late_lines: Q12 shape — the CASE tests the JOINED table's
    // priority attribute; lateness = the waiting_suppliers interval.
    "q12_late_lines" ->
      s"""SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN (${Relational.Q12HighPriorities.map(p => s"'$p'").mkString(", ")}) THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN (${Relational.Q12HighPriorities.map(p => s"'$p'").mkString(", ")}) THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '${Relational.Q12StartYear}-01-01'
        |  AND l_shipdate < DATE '${Relational.Q12EndYear + 1}-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL ${Relational.Q12LateDays} DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    // q14_promo_share: Q14 shape — scalar filtered-fraction KPI; exact
    // integer sums, one rounded division.
    "q14_promo_share" ->
      s"""WITH s AS (SELECT
        |    CAST(COALESCE(sum(CASE WHEN p_type = '${Relational.Q8PartType}'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END), 0) AS BIGINT) AS promo_rev_e4,
        |    CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) AS BIGINT) AS total_rev_e4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= DATE '${Relational.Q14MonthStart}'
        |    AND l_shipdate < DATE '${Relational.Q14MonthEnd}')
        |SELECT promo_rev_e4, total_rev_e4,
        |  CASE WHEN total_rev_e4 = 0 THEN 0.0
        |    ELSE round(100.0 * CAST(promo_rev_e4 AS DOUBLE) /
        |               CAST(total_rev_e4 AS DOUBLE), 4) END + 0.0 AS promo_pct
        |FROM s""".stripMargin,
    // q17_small_orders: the oracle deliberately RUNS the textbook Q17
    // correlated-subquery form, so the engine's window rewrite is
    // differentially proven equivalent (the waiting_suppliers
    // discipline). Threshold cross-multiplied into exact integers:
    // qty < sum/(5n)  ⇔  5·qty·n < sum.
    "q17_small_orders" ->
      s"""WITH pl AS (SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |            FROM lineitem JOIN part ON p_partkey = l_partkey
        |            WHERE p_brand = '${Relational.Q17Brand}')
        |SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
        |  CAST(COALESCE(sum(price_cents), 0) AS BIGINT) AS sum_price_cents
        |FROM pl l1
        |WHERE l1.qty * 5 * (SELECT count(*) FROM pl l2 WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT sum(l3.qty) FROM pl l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin,
    // q19_brackets: the oracle deliberately RUNS the textbook Q19 trap
    // form (the join equality repeated inside every disjunct), so the
    // engine's derived-implication rewrite (equi-join + pushed single-side
    // slices + post-join disjunct) is differentially proven equivalent.
    "q19_brackets" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) AS BIGINT) AS revenue_e4
        |FROM lineitem, part
        |WHERE ${Relational.Q19Brackets.map { case (b, sz, lo, hi) =>
            s"(p_partkey = l_partkey AND p_brand = '$b' AND p_size BETWEEN 1 AND $sz" +
              s" AND CAST(round(l_quantity) AS BIGINT) BETWEEN $lo AND $hi)"
          }.mkString("\n        |   OR ")}""".stripMargin,
    // freq_rollup: both CMS levels replayed — per-type salted-md5 cell
    // grids, then the merged grid as the elementwise SUM of the per-type
    // cells (counter addition is associative); probe estimates read
    // min-over-depth from the MERGED cells only.
    "freq_rollup" ->
      s"""WITH ev AS (SELECT event_type, CAST(user_id AS VARCHAR) AS uid FROM events WHERE user_id IS NOT NULL),
        |uc AS (SELECT uid, CAST(count(*) AS BIGINT) AS exact_count FROM ev GROUP BY uid),
        |tc AS (SELECT event_type, uid, count(*) AS c FROM ev GROUP BY 1, 2),
        |tcells AS (SELECT event_type, i,
        |    CAST((md5_number_lower(CAST(i AS VARCHAR) || ':' || uid) % 9223372036854775808) % ${Relational.FreqRollupWidth} AS BIGINT) AS b,
        |    CAST(sum(c) AS BIGINT) AS cell
        |  FROM tc, range(${Relational.FreqRollupDepth}) r(i) GROUP BY 1, 2, 3),
        |cells AS (SELECT i, b, CAST(sum(cell) AS BIGINT) AS cell FROM tcells GROUP BY 1, 2),
        |probes AS (SELECT uid, exact_count FROM uc ORDER BY exact_count DESC, uid LIMIT ${Relational.FreqRollupTopN}),
        |pb AS (SELECT p.uid, p.exact_count, r.i,
        |    CAST((md5_number_lower(CAST(r.i AS VARCHAR) || ':' || p.uid) % 9223372036854775808) % ${Relational.FreqRollupWidth} AS BIGINT) AS b
        |  FROM probes p, range(${Relational.FreqRollupDepth}) r(i)),
        |est AS (SELECT pb.uid, pb.exact_count, min(c.cell) AS est_count
        |  FROM pb JOIN cells c ON c.i = pb.i AND c.b = pb.b GROUP BY 1, 2)
        |SELECT uid, exact_count, CAST(est_count AS BIGINT) AS est_count
        |FROM est ORDER BY exact_count DESC, uid""".stripMargin,
    // join_size_estimate: the signed AMS sketch replayed as a GROUP BY —
    // one md5 draw per (row, key) gives bucket (low bits) and ±1 sign
    // (bit 32), F2 = Σc², estimate = exact lower median over depth rows of
    // Σ cell². Integer-exact end to end; `//` and Spark `div` both
    // truncate, so the signed err_permille agrees.
    "join_size_estimate" -> joinSizeSql,
    // plan_advisor: generated side-by-side from the same candidate list —
    // persisted-sketch inner products + row counts + the declared
    // bytes-per-row broadcast rule at the default session threshold.
    "plan_advisor" -> planAdvisorSql,
    // stream_plan_advisor: shares plan_advisor's oracle verbatim — signed
    // AMS addition is associative, so the stream-maintained side grids and
    // counts equal the batch store's bit for bit under any micro-batch
    // split, and the verdict read-out is the same code path.
    "stream_plan_advisor" -> planAdvisorSql,
    // advised_join: executed-join counts from plain SQL joins (the
    // unhinted answer) + the advice replay — proves the applied hints
    // changed plans, never results.
    "advised_join" -> advisedJoinSql,
    // advisor_cycle: base-build + delta-append must serve exactly the
    // whole-build verdicts — the oracle is plan_advisor's full replay
    // verbatim, so the store's mergeability is driver-hash-proven.
    "advisor_cycle" -> planAdvisorSql,
    // join_order_advisor: both intermediate estimates replayed from the
    // sketches, the order decision, the chain count from the raw tables.
    "join_order_advisor" -> joinOrderAdvisorSql,
    "join_order_dp" -> joinOrderDpSql,
    "chain_card_recall" -> chainCardRecallSql,
    "join_graph_dp" -> joinGraphDpSql,
    "graph_card_recall" -> graphCardRecallSql,
    "advisor_recall" -> advisorRecallSql,
    "join_skew_auto" -> joinSkewAutoSql,
    "join_skew_audit" -> joinSkewAuditSql,
    "agg_skew_auto" -> aggSkewAutoSql,
    "stream_skew_audit" -> streamSkewAuditSql(),
    "stream_join_size" -> joinSizeSql,
    "join_size_cross" -> joinSizeCrossSql,
    // unpivot_metrics: melt via UNION ALL (DuckDB's UNPIVOT normalizes
    // names differently; the union spells the measure labels explicitly,
    // matching Spark unpivot's column-name values). Cents BEFORE the melt.
    "unpivot_metrics" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice', CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, measure, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // gap_fill: dense (type × hour) spine via generate_series (inclusive
    // both ends, same as Spark `sequence`), zero-filled left join; hour
    // index is integer-µs floor division (the user_lifecycle discipline).
    "gap_fill" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT event_type, h, count(*) AS n, sum(cents) AS sc FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |t AS (SELECT DISTINCT event_type FROM e),
        |s AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM t, b)
        |SELECT s.event_type, s.h AS hour_idx,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
        |  CAST(COALESCE(c.sc, 0) AS BIGINT) AS sum_cents,
        |  CAST(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
        |FROM s LEFT JOIN c ON s.event_type = c.event_type AND s.h = c.h
        |ORDER BY 1, 2""".stripMargin,
    // lang_confusion: the lang_id chain joined to the labeled column,
    // cells + per-actual recall share over the ≤|langs|² matrix.
    "lang_confusion" ->
      """WITH li AS (WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |s AS (SELECT doc_id,
        |  CAST((length(t)-length(replace(t,'the','')))/3 + (length(t)-length(replace(t,'ing','')))/3
        |     + (length(t)-length(replace(t,'and','')))/3 + (length(t)-length(replace(t,' th','')))/3
        |     + (length(t)-length(replace(t,'ion','')))/3 AS BIGINT) AS s_en,
        |  CAST((length(t)-length(replace(t,' de','')))/3 + (length(t)-length(replace(t,'que','')))/3
        |     + (length(t)-length(replace(t,'los','')))/3 + (length(t)-length(replace(t,'ión','')))/3
        |     + (length(t)-length(replace(t,'ent','')))/3 AS BIGINT) AS s_es,
        |  CAST((length(t)-length(replace(t,'der','')))/3 + (length(t)-length(replace(t,'ein','')))/3
        |     + (length(t)-length(replace(t,'sch','')))/3 + (length(t)-length(replace(t,'ich','')))/3
        |     + (length(t)-length(replace(t,'den','')))/3 AS BIGINT) AS s_de,
        |  CAST((length(t)-length(replace(t,' de','')))/3 + (length(t)-length(replace(t,'les','')))/3
        |     + (length(t)-length(replace(t,'ent','')))/3 + (length(t)-length(replace(t,'une','')))/3
        |     + (length(t)-length(replace(t,'ais','')))/3 AS BIGINT) AS s_fr
        |  FROM t)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred
        |FROM s),
        |j AS (SELECT d.lang AS lang_actual, li.pred AS lang_pred FROM documents d JOIN li ON d.doc_id = li.doc_id),
        |c AS (SELECT lang_actual, lang_pred, count(*) AS n_docs FROM j GROUP BY 1, 2)
        |SELECT lang_actual, lang_pred, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang_actual), 4) + 0.0 AS recall_share
        |FROM c ORDER BY lang_actual, lang_pred""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |s AS (SELECT doc_id,
        |  CAST((length(t)-length(replace(t,'the','')))/3 + (length(t)-length(replace(t,'ing','')))/3
        |     + (length(t)-length(replace(t,'and','')))/3 + (length(t)-length(replace(t,' th','')))/3
        |     + (length(t)-length(replace(t,'ion','')))/3 AS BIGINT) AS s_en,
        |  CAST((length(t)-length(replace(t,' de','')))/3 + (length(t)-length(replace(t,'que','')))/3
        |     + (length(t)-length(replace(t,'los','')))/3 + (length(t)-length(replace(t,'ión','')))/3
        |     + (length(t)-length(replace(t,'ent','')))/3 AS BIGINT) AS s_es,
        |  CAST((length(t)-length(replace(t,'der','')))/3 + (length(t)-length(replace(t,'ein','')))/3
        |     + (length(t)-length(replace(t,'sch','')))/3 + (length(t)-length(replace(t,'ich','')))/3
        |     + (length(t)-length(replace(t,'den','')))/3 AS BIGINT) AS s_de,
        |  CAST((length(t)-length(replace(t,' de','')))/3 + (length(t)-length(replace(t,'les','')))/3
        |     + (length(t)-length(replace(t,'ent','')))/3 + (length(t)-length(replace(t,'une','')))/3
        |     + (length(t)-length(replace(t,'ais','')))/3 AS BIGINT) AS s_fr
        |  FROM t)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    // stream_tumbling_append: the same hourly aggregate, restricted to
    // windows the final watermark (max ts − 10 min) has CLOSED — Append
    // emits a window once, when window_end ≤ watermark.
    "stream_tumbling_append" ->
      """WITH w AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE AS wm FROM events),
        |a AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
        |        count(*) AS n_events, round(sum(value), 4) AS sum_value
        |      FROM events GROUP BY h, event_type)
        |SELECT strftime(h, '%Y-%m-%d %H:00:00') AS hour, event_type, n_events, sum_value
        |FROM a, w WHERE h + INTERVAL 1 HOUR <= wm ORDER BY hour, event_type""".stripMargin,
    // stream_late_audit: the three-batch late-drop semantics modeled as
    // sequential CTEs — Spark's late filter runs one batch behind
    // eviction, so batch 2's rows are filtered against the BATCH-0
    // watermark (propagated by the bridge batch); emitted windows are
    // those closed under the final watermark, whose max-tracking
    // includes the dropped rows.
    "stream_late_audit" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, event_id FROM events),
        |w0 AS (SELECT max(tsu) - INTERVAL 10 MINUTE AS wm FROM e WHERE event_id % 8 NOT IN (0, 4)),
        |w1 AS (SELECT max(tsu) - INTERVAL 10 MINUTE AS wm FROM e),
        |counted AS (SELECT date_trunc('hour', tsu) AS h, event_type FROM e
        |  WHERE event_id % 8 <> 0
        |     OR date_trunc('hour', tsu) + INTERVAL 1 HOUR > (SELECT wm FROM w0)),
        |a AS (SELECT h, event_type, count(*) AS n_events FROM counted GROUP BY 1, 2)
        |SELECT strftime(h, '%Y-%m-%d %H:00:00') AS hour, event_type, n_events
        |FROM a, w1 WHERE h + INTERVAL 1 HOUR <= w1.wm ORDER BY hour, event_type""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY fp""".stripMargin,
    // stream_dedup_bounded: the pinned dropDuplicatesWithinWatermark state
    // machine replayed in SQL — first-occurrence state (no extension);
    // the eviction watermark LAGS one batch (like the late filter), so
    // state alive in segment s is what survived the running max through
    // segment s-2; same-segment re-uploads always dedup.
    "stream_dedup_bounded" ->
      """WITH b AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |             doc_id % 1440 AS m0 FROM documents),
        |u AS (SELECT doc_id, fp, m0 AS m FROM b
        |      UNION ALL SELECT doc_id, fp, m0 + 20 FROM b WHERE doc_id % 7 = 3 AND doc_id % 2 = 1
        |      UNION ALL SELECT doc_id, fp, m0 + 600 FROM b WHERE doc_id % 7 = 3 AND doc_id % 2 = 0),
        |us AS (SELECT doc_id, fp, m, m // 300 AS seg FROM u),
        |sm AS (SELECT seg, max(m) AS mseg FROM us GROUP BY seg),
        |rm AS (SELECT seg, max(mseg) OVER (ORDER BY seg ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mrun FROM sm),
        |pv AS (SELECT seg, lag(mrun, 2) OVER (ORDER BY seg) AS mprev FROM rm),
        |g AS (SELECT fp, min(doc_id) AS doc_id, count(*) AS n_uploads, min(m) AS m1,
        |        min(m) // 300 AS seg1, max(m) // 300 AS seg2 FROM us GROUP BY fp)
        |SELECT doc_id, CAST(n_uploads AS BIGINT) AS n_uploads,
        |  CAST(CASE WHEN n_uploads = 1 THEN 1
        |       WHEN seg2 = seg1 THEN 1
        |       WHEN m1 + 100 <= (SELECT mprev FROM pv WHERE pv.seg = g.seg2) THEN 2
        |       ELSE 1 END AS BIGINT) AS n_emits
        |FROM g ORDER BY doc_id""".stripMargin,
    "stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // stream_export: distinct (fp, quality) of documents passing the
    // quality floor — equal fingerprints imply equal normalized text and
    // equal scores, so the emitted set is arrival-order independent.
    "stream_export" ->
      s"""WITH q AS ($qualityScoreSql),
         |f AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp FROM documents)
         |SELECT DISTINCT fp, quality FROM q JOIN f USING (doc_id)
         |WHERE quality >= 0.7 ORDER BY fp""".stripMargin,
    // stream_sessions: island detection per user. Boundary rule matches
    // Spark's merge iterator: strictly-past-end starts a new session,
    // exact touch merges (see session_window_agg).
    "stream_sessions" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev FROM events),
        |y AS (SELECT user_id, tsu,
        |  CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y)
        |SELECT user_id, epoch_us(min(tsu)) AS start_us, count(*) AS n_events
        |FROM z GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // stream_sessions_append: the same islands, restricted to sessions the
    // final watermark (max ts − 10 min delay) has CLOSED — Append mode
    // emits a session exactly when session_end (last event + gap) ≤
    // watermark; still-open sessions are absent by design.
    "stream_sessions_append" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev FROM events),
        |y AS (SELECT user_id, tsu,
        |  CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y),
        |s AS (SELECT user_id, epoch_us(min(tsu)) AS start_us,
        |        epoch_us(max(tsu)) + 1800000000 AS end_us, count(*) AS n_events
        |      FROM z GROUP BY user_id, sid),
        |w AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 600000000 AS wm FROM events)
        |SELECT user_id, start_us, n_events FROM s, w
        |WHERE end_us <= wm ORDER BY user_id, start_us""".stripMargin,
    // stream_attribution: the island chain + rn=1 touch (attribution_touch's
    // oracle) restricted to sessions CLOSED at the final watermark (the
    // stream_sessions_append eviction predicate), rolled up per channel.
    "stream_attribution" ->
      """WITH x AS (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS tsu,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR (epoch_us(tsu) - epoch_us(prev)) > 1800000000 THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY tsu, event_id) AS rn FROM z),
        |s AS (SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS channel,
        |    epoch_us(max(tsu)) + 1800000000 AS end_us,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
        |    sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS purch_cents
        |  FROM r GROUP BY 1, 2),
        |w AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 600000000 AS wm FROM events)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converting,
        |  CAST(sum(n_purch) AS BIGINT) AS n_purchases,
        |  CAST(sum(purch_cents) AS BIGINT) AS attributed_cents
        |FROM s, w WHERE end_us <= wm GROUP BY 1 ORDER BY 1""".stripMargin,
    // stream_session_dynamic: the dynamic islands, restricted to sessions
    // the final watermark (max ts − 10 min) has CLOSED — Append emits a
    // session exactly when its max event-end ≤ watermark.
    "stream_session_dynamic" ->
      s"""WITH x AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |  ${Relational.dynamicGapCaseSql} AS gap_us FROM events),
        |y AS (SELECT user_id, event_id, tsu, gap_us,
        |  max(epoch_us(tsu) + gap_us) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM x),
        |z AS (SELECT user_id, tsu, gap_us, epoch_us(tsu) AS eus,
        |  sum(CASE WHEN pmax IS NULL OR epoch_us(tsu) > pmax THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y),
        |s AS (SELECT user_id, min(eus) AS start_us, max(eus + gap_us) AS end_us,
        |        count(*) AS n_events
        |      FROM z GROUP BY user_id, sid),
        |w AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 600000000 AS wm FROM events)
        |SELECT user_id, start_us, end_us, n_events FROM s, w
        |WHERE end_us <= wm ORDER BY user_id, start_us""".stripMargin,
    "text_stats" ->
      """WITH d AS (SELECT lang, n_chars, len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS n_words FROM documents)
        |SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  round(avg(n_words), 4) AS avg_words, CAST(sum(n_words) AS BIGINT) AS total_words
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // readability: row-local integer counts + one fixed-order IEEE
    // expression per row — bit-identical doubles across engines.
    "readability" ->
      """WITH d AS (SELECT doc_id,
        |  greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'), x -> trim(x) <> '')), 1) AS n_sentences,
        |  len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS n_words,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_words AS BIGINT) AS n_words, CAST(n_syllables AS BIGINT) AS n_syllables,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 4) + 0.0 AS flesch
        |FROM d WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws,
        |  list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ts FROM documents)
        |SELECT doc_id, len(ws) AS ws_tokens,
        |  CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS bpe_tokens
        |FROM d ORDER BY doc_id""".stripMargin,
    "quality_score" -> s"$qualityScoreSql\nORDER BY doc_id",
    // pareto_frontier: the two-level skyline replayed — per-quality min
    // words, strictly-higher prefix min over the levels, dominance verdict.
    "pareto_frontier" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS nw,
        |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE) AS nstop,
        |  CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE) AS totlen FROM d),
        |base AS (SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
        |  round(least(nw / 50.0, 1.0) * 0.5 + least(nstop / nw * 5.0, 1.0) * 0.3 +
        |        CASE WHEN totlen / nw BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END, 4) AS quality
        |  FROM e WHERE nw > 0),
        |g AS (SELECT quality, min(n_words) AS min_w FROM base GROUP BY 1),
        |l AS (SELECT quality, min_w,
        |        min(min_w) OVER (ORDER BY quality DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi_min
        |      FROM g)
        |SELECT b.doc_id, b.n_words, b.quality
        |FROM base b JOIN l USING (quality)
        |WHERE b.n_words = l.min_w AND (l.hi_min IS NULL OR b.n_words < l.hi_min)
        |ORDER BY b.quality DESC, b.n_words, b.doc_id""".stripMargin,
    // quality_filter: every rule decided in INTEGER arithmetic
    // (cross-multiplied thresholds), so boundary docs can't split the
    // engines on float division; flags surface as 0/1 INTs.
    "quality_filter" -> qualityFilterSql,
    // stream_quality_filter: the rules are stateless per-row exprs, so the
    // streaming run is row-for-row the batch query — same oracle.
    "stream_quality_filter" -> qualityFilterSql,
    // source_mix: per-doc token/quality exprs shared verbatim with the
    // quality_score oracle; the share divides exact BIGINT token sums.
    "source_mix" -> sourceMixSql,
    // mixture_weights: α=0.5 temperature sampling — sqrt is IEEE-correctly
    // rounded in both engines, weights floored to integers so the
    // normalizing sums stay exact; every double is a fixed-order
    // expression over exact operands.
    "mixture_weights" -> mixtureWeightsSql,
    "dsir_weights" -> s"""$dsirWeightsCte
      |SELECT doc_id, n_feats, w_bits FROM w ORDER BY doc_id""".stripMargin,
    // dsir_sample: threshold from the descending cumulative histogram of
    // w_bits (largest T with |{w_bits >= T}| >= ceil(N/div)), boundary
    // ties included — the engine's declared selection rule verbatim.
    "dsir_sample" -> {
      val div = graft.operators.TextAnalysis.DsirShareDiv
      s"""$dsirWeightsCte,
      |hist AS (SELECT w_bits, count(*) AS m FROM w GROUP BY 1),
      |cumh AS (SELECT w_bits, sum(m) OVER (ORDER BY w_bits DESC) AS cum FROM hist),
      |nn AS (SELECT count(*) AS n FROM w),
      |thr AS (SELECT max(w_bits) AS t FROM cumh, nn WHERE cum >= (n + ${div - 1}) // $div)
      |SELECT w.doc_id, w.w_bits FROM w, thr WHERE w.w_bits >= thr.t ORDER BY doc_id""".stripMargin
    },
    "stream_mixture_weights" -> mixtureWeightsSql,
    // quota_sample: the α-budgets spent — integer-exact budget per source
    // (weight·20k // Σweight), docs in md5(doc_id) order per source,
    // running token sum gated by the budget.
    // token_length_histogram: ⌊log₂ tokens⌋ via binary-string length (the
    // perplexity_score integer-log trick), zero-token docs in bin -1.
    "token_length_histogram" -> tokenHistogramSql,
    "stream_token_histogram" -> tokenHistogramSql,
    "quota_sample" ->
      """WITH d AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT doc_id, source, CAST(COALESCE(list_sum(list_transform(ws, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks FROM d),
        |s AS (SELECT source, CAST(sum(toks) AS BIGINT) AS n_tokens FROM e GROUP BY source),
        |w AS (SELECT source, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight FROM s),
        |b AS (SELECT source, CAST(weight * 20000 // (SELECT sum(weight) FROM w) AS BIGINT) AS budget FROM w),
        |r AS (SELECT doc_id, source, toks AS n_tokens,
        |    CAST(sum(toks) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS cum_tokens
        |  FROM e WHERE toks > 0)
        |SELECT r.source, doc_id, n_tokens, cum_tokens, budget
        |FROM r JOIN b ON r.source = b.source WHERE cum_tokens <= budget
        |ORDER BY r.source, cum_tokens""".stripMargin,
    // stream_source_mix: commutative per-source sums in complete mode +
    // batch-side share arithmetic — equals the batch table, same oracle.
    "stream_source_mix" -> sourceMixSql,
    // doc_chunks: 1-based char grid replayed with the same substring
    // semantics (both engines clamp past end-of-string, char not byte).
    "doc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents WHERE length(text) >= 1),
        |c AS (SELECT doc_id, text, len, unnest(range(0, (len - 1) // 48 + 1)) AS idx FROM d)
        |SELECT doc_id, idx AS chunk_id, idx * 48 + 1 AS chunk_start,
        |  least(64, len - idx * 48) AS chunk_len,
        |  md5(substring(text, CAST(idx * 48 + 1 AS INTEGER), 64)) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // perplexity_score: corpus-trained bigram LM surprisal in WHOLE BITS —
    // per-token bits = length(bin(c(w1))) − length(bin(c(w1,w2))), the
    // integer ⌊log2⌋ both engines compute identically on binary-string
    // length, so the LM score hash-matches with no float dynamic range.
    // heavy_hitters: the Misra-Gries candidate phase is pure pruning — the
    // exact-recount phase defines the output, so the oracle is the direct
    // exact form. Integer threshold cnt*s > total (no division to diverge).
    "heavy_hitters" ->
      """WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS word FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word)
        |SELECT word, cnt FROM c
        |WHERE cnt * 200 > (SELECT count(*) FROM toks)
        |ORDER BY word""".stripMargin,
    // Lift = exp(PMI) as a single divide of exact integer products — no
    // transcendental to diverge; ORDER BY the rounded score + word tiebreak.
    "collocations" ->
      """WITH d AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |toks AS (SELECT unnest(ws) AS word FROM d),
        |uni AS (SELECT word, count(*) AS c_w FROM toks GROUP BY word),
        |tot AS (SELECT sum(c_w) AS n_tokens FROM uni),
        |bi AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg FROM d),
        |bc AS (SELECT bg, count(*) AS c_ab FROM bi GROUP BY bg HAVING count(*) >= 5),
        |bs AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2, c_ab FROM bc)
        |SELECT bs.w1, bs.w2, CAST(bs.c_ab AS BIGINT) AS c_ab,
        |  round(CAST(t.n_tokens AS DOUBLE) * bs.c_ab / (u1.c_w * u2.c_w), 4) AS lift
        |FROM bs JOIN uni u1 ON bs.w1 = u1.word JOIN uni u2 ON bs.w2 = u2.word CROSS JOIN tot t
        |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin,
    // SCALAR range()+unnest, not the range() table function: the table
    // form rejects lateral column arguments, while the scalar form maps
    // len(ws) < 2 to an empty list (zero pair rows) instead of erroring.
    "perplexity_score" ->
      """WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |pairs AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
        |          FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)),
        |big AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM big GROUP BY 1),
        |sc AS (SELECT doc_id, count(*) AS n_big,
        |         sum(length(bin(c1)) - length(bin(c2))) AS bits
        |       FROM pairs JOIN big USING (w1, w2) JOIN ctx USING (w1) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(n_big, 0) AS BIGINT) AS n_big,
        |  CAST(COALESCE(bits, 0) AS BIGINT) AS bits,
        |  round(CASE WHEN COALESCE(n_big, 0) = 0 THEN 0.0
        |        ELSE CAST(bits AS DOUBLE) / n_big END, 4) AS ppl_bits
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,
    // ngram_novelty: distinct trigrams per doc, df over docs, fraction
    // with df = 1 — integer counts + one rounded ratio.
    "ngram_novelty" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |df AS (SELECT g, count(DISTINCT doc_id) AS dfc FROM ex GROUP BY g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS novelty
        |FROM ex JOIN df USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // source_novelty: the novelty chain reduced per source — pooled
    // unique/total trigram mass, integer sums + one rounded ratio.
    "source_novelty" ->
      """WITH d AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, source, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
        |ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |df AS (SELECT g, count(DISTINCT doc_id) AS dfc FROM ex GROUP BY g),
        |pd AS (SELECT doc_id, source, count(*) AS ng,
        |    CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nu
        |  FROM ex JOIN df USING (g) GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs, CAST(sum(ng) AS BIGINT) AS total_grams,
        |  CAST(sum(nu) AS BIGINT) AS unique_grams,
        |  round(CAST(sum(nu) AS DOUBLE) / CAST(sum(ng) AS DOUBLE), 4) AS novelty_rate
        |FROM pd GROUP BY source ORDER BY source""".stripMargin,
    // quality_calibration: both metric chains joined on doc_id, FIXED
    // bins (0.1-wide quality, whole-bit surprisal capped at 15) — pure
    // scan arithmetic, no quantile rank.
    "quality_calibration" ->
      s"""WITH q0 AS ($qualityScoreSql),
        |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |prs AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
        |        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)),
        |big AS (SELECT w1, w2, count(*) AS c2 FROM prs GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM big GROUP BY 1),
        |sc AS (SELECT doc_id, count(*) AS n_big,
        |         sum(length(bin(c1)) - length(bin(c2))) AS bits
        |       FROM prs JOIN big USING (w1, w2) JOIN ctx USING (w1) GROUP BY doc_id),
        |pp AS (SELECT d.doc_id,
        |    round(CASE WHEN COALESCE(n_big, 0) = 0 THEN 0.0
        |          ELSE CAST(bits AS DOUBLE) / n_big END, 4) AS ppl_bits
        |  FROM documents d LEFT JOIN sc USING (doc_id)),
        |j AS (SELECT least(CAST(floor(q0.quality * 10) AS BIGINT), 9) AS q_bin,
        |    least(CAST(floor(pp.ppl_bits) AS BIGINT), 15) AS p_bin
        |  FROM q0 JOIN pp ON q0.doc_id = pp.doc_id)
        |SELECT q_bin, p_bin, count(*) AS n_docs
        |FROM j GROUP BY q_bin, p_bin ORDER BY q_bin, p_bin""".stripMargin,
    // pack_sequences: concatenate-and-chunk training layout — per-lang
    // prefix sums over the same BPE-ish token count as token_count; both
    // engines compute identical integer cumsums and floor-divisions.
    // packing_report: per-lang token totals, ceil-div sequences, tail
    // padding and utilization — integer arithmetic + one rounded ratio.
    "packing_report" ->
      """WITH d AS (SELECT lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ts FROM documents),
        |t AS (SELECT lang, CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks FROM d),
        |g AS (SELECT lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |  FROM t WHERE toks > 0 GROUP BY lang),
        |s AS (SELECT lang, n_docs, n_tokens,
        |    CAST((n_tokens + 2047) // 2048 AS BIGINT) AS n_seqs FROM g)
        |SELECT lang, n_docs, n_tokens, n_seqs,
        |  n_seqs * 2048 - n_tokens AS tail_padding,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(n_seqs * 2048 AS DOUBLE), 4) AS utilization
        |FROM s ORDER BY lang""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ts FROM documents),
        |t AS (SELECT doc_id, lang, CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS n_tokens FROM d),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
        |      FROM t WHERE n_tokens > 0)
        |SELECT lang, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
        |  CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
        |  CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
        |FROM c ORDER BY lang, doc_id""".stripMargin,
    // pack_sequences_sharded: the production-shard-count form — local
    // prefix sums per (lang, shard), shard bases from an exclusive running
    // sum of per-shard sequence counts; identical integer arithmetic on
    // both engines, window frames stated explicitly.
    "pack_sequences_sharded" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ts FROM documents),
        |t AS (SELECT doc_id, lang, CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS n_tokens FROM d),
        |c AS (SELECT lang, doc_id % 4 AS shard, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang, doc_id % 4 ORDER BY doc_id) AS BIGINT) AS cum
        |      FROM t WHERE n_tokens > 0),
        |l AS (SELECT lang, shard, doc_id, n_tokens,
        |        CAST((cum - n_tokens) // 2048 AS BIGINT) AS ls,
        |        CAST((cum - 1) // 2048 AS BIGINT) AS le
        |      FROM c),
        |b AS (SELECT lang, shard, CAST(COALESCE(sum(n_seq) OVER (PARTITION BY lang ORDER BY shard
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
        |      FROM (SELECT lang, shard, max(le) + 1 AS n_seq FROM l GROUP BY lang, shard) s)
        |SELECT l.lang, l.shard, doc_id, n_tokens,
        |  base + ls AS start_seq, base + le AS end_seq, le - ls + 1 AS n_seqs
        |FROM l JOIN b ON l.lang = b.lang AND l.shard = b.shard
        |ORDER BY l.lang, doc_id""".stripMargin,
    // mixture_sample: per-source weighted rates in content-hash order;
    // quota arithmetic is pure integers so both engines agree exactly.
    "mixture_sample" ->
      """WITH f AS (SELECT source, doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents),
        |w AS (SELECT source, doc_id, fp,
        |        COALESCE(TRY_CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER), 0) % 4 + 1 AS wt,
        |        row_number() OVER (PARTITION BY source ORDER BY fp, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY source) AS cnt
        |      FROM f)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, fp
        |FROM w WHERE rk <= (cnt * wt + 3) // 4 ORDER BY source, rk""".stripMargin,
    "repetition_score" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |g AS (SELECT doc_id, greatest(len(ws) - 2, 0) AS n_grams,
        |  len(list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END)) AS n_distinct FROM d)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CASE WHEN n_grams > 0 THEN round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) ELSE 0.0 END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "classify_docs" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(ws, w -> w IN ('stream','window','event'))) AS s_stream,
        |  len(list_filter(ws, w -> w IN ('table','row','column'))) AS s_table,
        |  len(list_filter(ws, w -> w IN ('join','merge','hash'))) AS s_join FROM d)
        |SELECT doc_id, s_stream, s_table, s_join,
        |  CASE WHEN s_stream >= s_table AND s_stream >= s_join THEN 'streaming'
        |       WHEN s_table >= s_join THEN 'tabular' ELSE 'relational' END AS pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // normalize_text: the same decomposed suffix built from chr() codepoints
    // (escape-auditable), normalized by DuckDB's own NFC — the native
    // graft_nfc expression must agree byte-for-byte (md5 of the full
    // normalized text). length() counts codepoints on both engines.
    // Shared verbatim with stream_normalize (stateless per-row pass).
    "normalize_text" -> normalizeTextSql,
    "stream_normalize" -> normalizeTextSql,
    "scrub_pii" ->
      """WITH t AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |  || CASE WHEN doc_id % 2 = 0 THEN ' admin@corp.io' ELSE '' END
        |  || ' via https://host.example/p/' || CAST(doc_id AS VARCHAR) || ' end' AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  md5(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g')) AS scrub_fp
        |FROM t ORDER BY doc_id""".stripMargin,
    // boilerplate_lines: the per-source boilerplate detector replayed —
    // same synthetic page frame, same line split, the ≥ half-coverage rule
    // as the integer compare df·2 ≥ n_docs, and the cleaned text rebuilt
    // in original line order before hashing (order-preserving list agg).
    "boilerplate_lines" -> boilerplateSql,
    // stream_boilerplate: the SAME cleaning read-out over the
    // stream-maintained line-frequency table — per-doc-distinct sums are
    // commutative, so the table equals the batch detector's and the
    // oracle is shared verbatim.
    "stream_boilerplate" -> boilerplateSql,
    // embed_documents: the hashing-trick embedding replayed in SQL — same
    // md5 token-hash chain as the chunk fingerprints; per dimension i, the
    // signed count of tokens hashing to it.
    "embed_documents" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d)
        |SELECT doc_id, array_to_string(list_transform(range(64), i -> CAST(coalesce(CAST(list_sum(
        |    list_transform(list_filter(hs, x -> x % 64 = i),
        |                   x -> CASE WHEN (x // 64) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT), 0) AS VARCHAR)), ',') AS emb
        |FROM h ORDER BY doc_id""".stripMargin,
    "chunk_fingerprint" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h)
        |SELECT doc_id, len(ch) AS n_chunks, list_min(ch) AS fp_min, list_max(ch) AS fp_max,
        |  CAST(list_sum(ch) AS BIGINT) AS fp_sum
        |FROM c ORDER BY doc_id""".stripMargin,
    // winnow_fingerprints: the chunk-hash chain winnowed — each 4-window's
    // min (RIGHTMOST on ties: i + max over tying offsets), positions
    // deduped; the selected fp at position p IS ch[p], so the summary
    // needs only the distinct position list.
    "winnow_fingerprints" -> winnowStatsSql,
    "stream_winnow" -> winnowStatsSql,
    // winnow_matches: the winnowed postings (distinct (doc, fp)), hot
    // hashes over 50 docs dropped, self-joined on the hash; containment =
    // shared / min(|A|, |B|) over the cold postings.
    "winnow_matches" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |s AS (SELECT doc_id, ch, CASE WHEN len(ch) >= 4
        |      THEN list_distinct(list_transform(range(1, len(ch) - 2), i ->
        |        i + list_max(list_filter(range(0, 4), j -> ch[i+j] = list_min(ch[i:i+3])))))
        |      ELSE CAST([] AS BIGINT[]) END AS ps FROM c),
        |e AS (SELECT DISTINCT doc_id, fp FROM
        |  (SELECT doc_id, unnest(list_transform(ps, p -> ch[p])) AS fp FROM s)),
        |cold AS (SELECT * FROM e WHERE fp NOT IN
        |  (SELECT fp FROM e GROUP BY fp HAVING count(*) > 50)),
        |pd AS (SELECT doc_id, count(*) AS n_fp FROM cold GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_a, doc_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) / least(pa.n_fp, pb.n_fp), 4) AS containment
        |FROM p JOIN pd pa ON doc_a = pa.doc_id JOIN pd pb ON doc_b = pb.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    // winnow_recall: truth = pairs sharing >=1 cold FULL-chain chunk hash;
    // approx = the winnowed match pass at minShared=1; one accounting row.
    "winnow_recall" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |ce AS (SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, unnest(ch) AS fp FROM c)),
        |chot AS (SELECT fp FROM ce GROUP BY fp HAVING count(*) > 50),
        |ccold AS (SELECT * FROM ce WHERE fp NOT IN (SELECT fp FROM chot)),
        |truth AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM ccold a JOIN ccold b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |s AS (SELECT doc_id, ch, CASE WHEN len(ch) >= 4
        |      THEN list_distinct(list_transform(range(1, len(ch) - 2), i ->
        |        i + list_max(list_filter(range(0, 4), j -> ch[i+j] = list_min(ch[i:i+3])))))
        |      ELSE CAST([] AS BIGINT[]) END AS ps FROM c),
        |e AS (SELECT DISTINCT doc_id, fp FROM
        |  (SELECT doc_id, unnest(list_transform(ps, p -> ch[p])) AS fp FROM s)),
        |wcold AS (SELECT * FROM e WHERE fp NOT IN
        |  (SELECT fp FROM e GROUP BY fp HAVING count(*) > 50)),
        |approx AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM wcold a JOIN wcold b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |det AS (SELECT count(*) AS n_detected FROM truth
        |  SEMI JOIN approx USING (doc_a, doc_b)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT n_truth, n_detected,
        |  round(CAST(n_detected AS DOUBLE) / CAST(n_truth AS DOUBLE), 4) AS recall
        |FROM tot, det""".stripMargin,
    // winnow_matches_indexed: the registry lookup — held-out docs (%10=0)
    // probe the train-shard postings; the boilerplate cap (df > 50) is
    // computed over the REGISTRY postings only; containment divides by
    // the probe's cold set.
    "winnow_matches_indexed" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |s AS (SELECT doc_id, ch, CASE WHEN len(ch) >= 4
        |      THEN list_distinct(list_transform(range(1, len(ch) - 2), i ->
        |        i + list_max(list_filter(range(0, 4), j -> ch[i+j] = list_min(ch[i:i+3])))))
        |      ELSE CAST([] AS BIGINT[]) END AS ps FROM c),
        |e AS (SELECT DISTINCT doc_id, fp FROM
        |  (SELECT doc_id, unnest(list_transform(ps, p -> ch[p])) AS fp FROM s)),
        |reg AS (SELECT doc_id, fp FROM e WHERE doc_id % 10 <> 0),
        |hot AS (SELECT fp FROM reg GROUP BY fp HAVING count(*) > 50),
        |regc AS (SELECT * FROM reg WHERE fp NOT IN (SELECT fp FROM hot)),
        |prob AS (SELECT doc_id AS probe_id, fp FROM e
        |  WHERE doc_id % 10 = 0 AND fp NOT IN (SELECT fp FROM hot)),
        |np AS (SELECT probe_id, count(*) AS n_probe_fp FROM prob GROUP BY 1),
        |p AS (SELECT probe_id, regc.doc_id AS match_id, count(*) AS n_shared
        |  FROM prob JOIN regc ON prob.fp = regc.fp GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.probe_id, match_id, n_shared,
        |  round(CAST(n_shared AS DOUBLE) / CAST(n_probe_fp AS DOUBLE), 4) AS containment
        |FROM p JOIN np ON p.probe_id = np.probe_id
        |ORDER BY p.probe_id, match_id""".stripMargin,
    // common_passages: the same chunk-hash chain as chunk_fingerprint,
    // exploded instead of summarized, grouped on the hash — passages
    // repeated across >=2 DISTINCT documents.
    "common_passages" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |e AS (SELECT doc_id, unnest(ch) AS chunk_fp FROM c)
        |SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_occurrences, min(doc_id) AS first_doc
        |FROM e GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_fp""".stripMargin,
    // dedup_passages: the chunk-hash chain with POSITIONS — duplicated
    // chunk starts explode to their window-token spans, the per-doc
    // DISTINCT covered-position count is exactly what an excision pass
    // would remove. range()'s start>end guard (empty ch → zero rows)
    // follows the scalar-unnest pattern.
    "dedup_passages" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |e AS (SELECT doc_id, unnest(range(1, len(ch) + 1)) AS pos, ch FROM c),
        |ch1 AS (SELECT doc_id, pos, ch[pos] AS chunk_fp FROM e),
        |dup AS (SELECT chunk_fp FROM ch1 GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT c1.doc_id, c1.pos + o.k AS p
        |        FROM ch1 c1 JOIN dup USING (chunk_fp), (SELECT unnest(range(0, 8)) AS k) o),
        |ct AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM d)
        |SELECT n.doc_id, n.n_tokens, COALESCE(ct.dup_tokens, 0) AS dup_tokens,
        |  round(CAST(COALESCE(ct.dup_tokens, 0) AS DOUBLE) / CAST(greatest(n.n_tokens, 1) AS DOUBLE), 4) AS dup_ratio
        |FROM n LEFT JOIN ct ON n.doc_id = ct.doc_id ORDER BY n.doc_id""".stripMargin,
    // excise_passages: dedup_passages' coverage chain, inverted — kept
    // positions anti-join the covered set, the clean document is the
    // position-ordered string_agg of surviving tokens.
    "excise_passages" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |h AS (SELECT doc_id, list_transform(ws, w -> CAST(md5_number_lower(w) % 4294967296 AS BIGINT)) AS hs FROM d),
        |c AS (SELECT doc_id, CASE WHEN len(hs) >= 8
        |      THEN list_transform(range(1, len(hs) - 6), i -> list_reduce(hs[i:i+7], (a, b) -> (a * 1000003 + b) % 4294967296))
        |      ELSE CAST([] AS BIGINT[]) END AS ch FROM h),
        |e AS (SELECT doc_id, unnest(range(1, len(ch) + 1)) AS pos, ch FROM c),
        |ch1 AS (SELECT doc_id, pos, ch[pos] AS chunk_fp FROM e),
        |dup AS (SELECT chunk_fp FROM ch1 GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT c1.doc_id, c1.pos + o.k AS p
        |        FROM ch1 c1 JOIN dup USING (chunk_fp), (SELECT unnest(range(0, 8)) AS k) o),
        |tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM d),
        |t1 AS (SELECT doc_id, pos, ws[pos] AS tok FROM tok),
        |kept AS (SELECT t1.doc_id, t1.pos, t1.tok FROM t1
        |         LEFT JOIN cov ON t1.doc_id = cov.doc_id AND t1.pos = cov.p
        |         WHERE cov.p IS NULL),
        |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
        |             string_agg(tok, ' ' ORDER BY pos) AS clean_text
        |      FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.kept_tokens, 0) AS kept_tokens,
        |  COALESCE(r.clean_text, '') AS clean_text
        |FROM d LEFT JOIN r ON d.doc_id = r.doc_id ORDER BY d.doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH f AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_dups, fp FROM f GROUP BY fp ORDER BY keep_id""".stripMargin,
    // dedup_nfc: the same planted universe (precomposed suffix on every
    // doc, decomposed twin for every fifth) built from chr() codepoints,
    // canonical digest via DuckDB's own nfc_normalize.
    "dedup_nfc" ->
      """WITH u AS (
        |  SELECT doc_id, text || ' caf' || chr(233) || ' ma' || chr(241) || 'ana' AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |         text || ' cafe' || chr(769) || ' man' || chr(771) || 'ana'
        |  FROM documents WHERE doc_id % 5 = 0),
        |n AS (SELECT doc_id, md5(nfc_normalize(t)) AS nfc_fp, md5(t) AS raw_fp FROM u),
        |g AS (SELECT nfc_fp, CAST(count(*) AS BIGINT) AS n_docs,
        |        min(doc_id) AS canonical_id, count(DISTINCT raw_fp) AS n_raw
        |      FROM n GROUP BY 1 HAVING count(*) > 1)
        |SELECT nfc_fp, n_docs, canonical_id, CAST(n_raw > 1 AS BIGINT) AS needed_nfc
        |FROM g ORDER BY canonical_id""".stripMargin,
    "dedup_ngram" -> s"$ngramPairsSql\nORDER BY doc_a, doc_b",
    // route_audit: the saturation measurement + verdict replayed —
    // floor((total−s0)·1000/total) < cut ⟺ (total−s0)·1000 < cut·total,
    // so the audit's permille compare is exactly the routers' product
    // form.
    "route_audit" ->
      s"""WITH vnn AS (SELECT (count(*) + 9) // 10 AS per FROM documents),
        |vw AS (SELECT doc_id // (SELECT per FROM vnn) AS slice,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '')) AS word
        |       FROM documents),
        |vfs AS (SELECT word, min(slice) AS slice FROM vw GROUP BY word),
        |vt AS (SELECT CAST(count(*) AS BIGINT) AS total_types,
        |         CAST(count(*) FILTER (WHERE slice = 0) AS BIGINT) AS slice0_types FROM vfs),
        |fr AS (SELECT total_types, slice0_types,
        |         CASE WHEN total_types = 0 THEN CAST(0 AS BIGINT)
        |              ELSE (total_types - slice0_types) * 1000 // total_types END AS late_permille
        |       FROM vt)
        |SELECT family, total_types, slice0_types, late_permille,
        |  CAST(${Dedup.DedupAutoLatePermille} AS BIGINT) AS cut_permille,
        |  CASE WHEN total_types > 0 AND late_permille < ${Dedup.DedupAutoLatePermille}
        |       THEN 'lsh' ELSE 'exact' END AS route
        |FROM (SELECT unnest(['decontaminate_auto', 'dedup_auto']) AS family), fr
        |ORDER BY family""".stripMargin,
    // dedup_auto: the routed pair set IS the exact pair set (the proven
    // route equivalence), plus the route verdict replayed from the
    // vocab-growth saturation rule — first-slice share of all word types
    // against the declared late-permille cut.
    "dedup_auto" ->
      s"""WITH vnn AS (SELECT (count(*) + 9) // 10 AS per FROM documents),
        |vw AS (SELECT doc_id // (SELECT per FROM vnn) AS slice,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '')) AS word
        |       FROM documents),
        |vfs AS (SELECT word, min(slice) AS slice FROM vw GROUP BY word),
        |vtot AS (SELECT CAST(count(*) AS BIGINT) AS total,
        |           CAST(count(*) FILTER (WHERE slice = 0) AS BIGINT) AS s0 FROM vfs),
        |rt AS (SELECT CASE WHEN total > 0 AND (total - s0) * 1000 < ${Dedup.DedupAutoLatePermille} * total
        |         THEN 'lsh' ELSE 'exact' END AS route FROM vtot),
        |np AS ($ngramPairsSql)
        |SELECT doc_a, doc_b, jaccard, route FROM np, rt
        |ORDER BY doc_a, doc_b""".stripMargin,
    // dedup_minhash: with b=32 bands × r=4 rows the LSH candidate set
    // provably contains every pair with J ≥ 0.8 except with prob ~5e-8 per
    // pair, and candidates are verified with exact Jaccard — so the output
    // equals the exact n-gram join's and shares its oracle (equality
    // asserted empirically at sf0.01/sf0.1 and in DedupSpec).
    "dedup_minhash" -> s"$ngramPairsSql\nORDER BY doc_a, doc_b",
    // dedup_clusters: transitive closure over the same pair graph via a
    // recursive CTE, cluster = min reachable doc_id (∪ self), singletons
    // filled from the documents table.
    "dedup_clusters" -> dedupClustersSql,
    // leakage_safe_split: the cluster chain + the export_manifest 60-bit
    // md5-prefix hash of the canonical id → 80/10/10, every member
    // inheriting its canonical's verdict.
    "leakage_safe_split" ->
      s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        |h AS (SELECT doc_id, cluster_id,
        |        CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS hv
        |      FROM lbl)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN hv <= 7 THEN 'train' WHEN hv = 8 THEN 'val' ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,
    // dedup_clusters_incremental: the compressed delta merge equals the
    // full recompute, so the full-corpus CC oracle gates it too.
    "dedup_clusters_incremental" -> dedupClustersSql,
    // dedup_report: the dedup_clusters closure aggregated twice — sizes
    // per cluster, then the size histogram; all-integer output.
    "dedup_report" ->
      s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |lbl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
        |  CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_dropped
        |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    // dedup_threshold_curve: the exact pair set generated once at the 0.7
    // floor, each pair counted toward every threshold it clears.
    "dedup_threshold_curve" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
        |  FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.7),
        |ct AS (SELECT doc_a, doc_b, jaccard,
        |    unnest([0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS threshold FROM jp)
        |SELECT threshold, count(*) AS n_pairs,
        |  CAST(count(DISTINCT doc_b) AS BIGINT) AS n_droppable
        |FROM ct WHERE jaccard >= threshold
        |GROUP BY threshold ORDER BY threshold""".stripMargin,
    // corpus_overlap: the exact near-dup pair set (the LSH generator is
    // provably equal to it at the threshold), symmetrized, labeled with
    // each endpoint's source, and aggregated to the |sources|² matrix.
    "corpus_overlap" ->
      s"""WITH np AS ($ngramPairsSql),
        |sym AS (SELECT doc_a AS doc, doc_b AS other FROM np
        |  UNION ALL SELECT doc_b, doc_a FROM np),
        |lab AS (SELECT s1.source AS source, s2.source AS other_source, sym.doc
        |  FROM sym JOIN documents s1 ON sym.doc = s1.doc_id
        |           JOIN documents s2 ON sym.other = s2.doc_id),
        |hits AS (SELECT source, other_source,
        |    CAST(count(DISTINCT doc) AS BIGINT) AS n_overlapping
        |  FROM lab GROUP BY 1, 2),
        |tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT h.source, h.other_source, h.n_overlapping, t.n_docs,
        |  round(CAST(h.n_overlapping AS DOUBLE) / t.n_docs, 4) AS overlap_rate
        |FROM hits h JOIN tot t ON h.source = t.source
        |ORDER BY h.source, h.other_source""".stripMargin,
    // kanon_suppress: cells below k vanish; every retained doc carries its
    // cell size so the k >= 5 invariant is row-checkable.
    "kanon_suppress" ->
      """WITH cells AS (SELECT lang, source, count(*) AS cell_size
        |  FROM documents GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT d.doc_id, d.lang, d.source, c.cell_size
        |FROM documents d JOIN cells c ON d.lang = c.lang AND d.source = c.source
        |ORDER BY doc_id""".stripMargin,
    // noised_release: seeded two-sided-geometric noise replayed bit-for-bit
    // — hash = the repo md5 convention, sign = low bit, magnitude =
    // trailing zeros of hv>>1 via bit_count((g & -g) - 1): pure integer
    // bit arithmetic, no float ln/exp whose libm rounding could diverge.
    "noised_release" ->
      s"""WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |h AS (SELECT lang, source, n,
        |        CAST(md5_number_lower(lang || ':' || source) % 9223372036854775808 AS BIGINT) AS hv
        |      FROM c),
        |g AS (SELECT lang, source, n,
        |        CASE WHEN (hv & 1) = 1 THEN 1 ELSE -1 END AS s,
        |        LEAST(bit_count(((hv >> 1) & -(hv >> 1)) - 1), ${TextAnalysis.NoisedReleaseCap}) AS mag
        |      FROM h)
        |SELECT lang, source,
        |  CAST(GREATEST(n + s * mag, 0) AS BIGINT) AS noisy_n,
        |  CASE WHEN GREATEST(n + s * mag, 0) >= ${TextAnalysis.NoisedReleaseK} THEN 1 ELSE 0 END AS released
        |FROM g ORDER BY lang, source""".stripMargin,
    // takedown_propagate: the dedup closure joined to the matched sources;
    // the manifest is every doc in a touched cluster, reason-tagged.
    "takedown_propagate" -> takedownSql,
    // stream_takedown: emitted manifest SET equals the batch closure —
    // stateless stream-static cluster resolution + manifest dedup.
    "stream_takedown" -> takedownSql,
    "takedown_verify" -> takedownVerifySql,
    // contamination_report: distinct contaminated eval ids from the exact
    // containment join (the indexed route's shared-oracle argument),
    // re-joined to the eval shard and rolled up per source.
    "contamination_report" ->
      s"""WITH cont AS (SELECT DISTINCT eval_id FROM ($decontaminateSql) dc),
        |ev AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0)
        |SELECT source, count(*) AS n_eval,
        |  CAST(count(c.eval_id) AS BIGINT) AS n_contaminated,
        |  round(CAST(count(c.eval_id) AS DOUBLE) / count(*), 4) AS contamination_rate
        |FROM ev LEFT JOIN cont c ON ev.doc_id = c.eval_id
        |GROUP BY source ORDER BY source""".stripMargin,
    // cluster_canonical: the same recursive-CTE closure as dedup_clusters,
    // joined to the quality oracle; survivor = row_number over
    // (quality DESC, doc_id) — the engine's max(struct(q, -doc_id)) argmax
    // stated as a window.
    "cluster_canonical" ->
      s"""WITH RECURSIVE np AS ($ngramPairsSql),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM np UNION SELECT doc_b, doc_a FROM np),
        |reach AS (SELECT a AS v, b AS r FROM edges
        |  UNION
        |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT v, least(v, min(r)) AS cluster FROM reach GROUP BY v),
        |q AS ($qualityScoreSql),
        |a AS (SELECT c.cluster AS cluster_id, c.v AS doc_id, COALESCE(q.quality, 0.0) AS qq
        |      FROM comp c LEFT JOIN q ON c.v = q.doc_id),
        |r AS (SELECT cluster_id, doc_id, qq,
        |      row_number() OVER (PARTITION BY cluster_id ORDER BY qq DESC, doc_id) AS rn FROM a),
        |s AS (SELECT cluster_id, count(*) AS cluster_size FROM a GROUP BY cluster_id)
        |SELECT s.cluster_id, s.cluster_size, r.doc_id AS keep_id, r.qq AS keep_quality,
        |  s.cluster_size - 1 AS n_dropped
        |FROM s JOIN r ON s.cluster_id = r.cluster_id AND r.rn = 1
        |ORDER BY s.cluster_id""".stripMargin,
    // dedup_incremental: delta shard (doc_id % 10 = 0) near-dup'd against
    // the persisted corpus index. LSH candidates + exact verification equal
    // the exact cross-split trigram-Jaccard join (same argument as
    // dedup_minhash), which is directly expressible in DuckDB.
    "dedup_incremental" -> incrementalOracle,
    // stream_ingest: the closed ingest loop's exact operational semantics
    // as sequential CTEs — batch 0 pairs vs corpus + intra-batch (larger
    // id flagged), clean batch-0 survivors extend the index, batch 1 pairs
    // vs corpus ∪ clean batch 0 + intra-batch. LSH candidates + exact
    // verification equal the exact Jaccard join at the threshold (the
    // standing dedup_minhash argument), so the loop is exactly checkable.
    "stream_ingest" ->
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |jp AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2),
        |jac AS (SELECT x, y, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j
        |  FROM jp JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
        |grp AS (SELECT doc_id, CASE WHEN doc_id % 10 <> 0 THEN -1 ELSE (doc_id // 10) % 2 END AS g FROM documents),
        |p0 AS (SELECT j.x AS doc_a, j.y AS doc_b, j.j FROM jac j
        |  JOIN grp ga ON j.x = ga.doc_id JOIN grp gb ON j.y = gb.doc_id
        |  WHERE ga.g = 0 AND (gb.g = -1 OR (gb.g = 0 AND j.x > j.y))),
        |c0 AS (SELECT doc_id FROM grp WHERE g = 0 AND doc_id NOT IN (SELECT doc_a FROM p0)),
        |p1 AS (SELECT j.x AS doc_a, j.y AS doc_b, j.j FROM jac j
        |  JOIN grp ga ON j.x = ga.doc_id JOIN grp gb ON j.y = gb.doc_id
        |  WHERE ga.g = 1 AND (gb.g = -1 OR gb.doc_id IN (SELECT doc_id FROM c0)
        |                      OR (gb.g = 1 AND j.x > j.y)))
        |SELECT doc_a, doc_b, j AS jaccard FROM (SELECT * FROM p0 UNION ALL SELECT * FROM p1) u
        |ORDER BY doc_a, doc_b""".stripMargin,
    // stream_dedup_near: the SAME incremental pipeline run as a streaming
    // query (stateless per-row signatures + stream-static index join +
    // dropDuplicates + array-intersect verification) — the emitted verified
    // pair set is order-independent, so the batch oracle is exact.
    "stream_dedup_near" -> incrementalOracle,
    // decontaminate: exact containment |A∩B|/|A| of eval-shard n-grams in
    // train docs; the prefix filter is lossless at the threshold, so the
    // direct exact join is the oracle.
    "decontaminate" -> s"$decontaminateSql\nORDER BY eval_id, train_id",
    // decontaminate_auto: the routed pair set is the exact containment
    // join's (the decontaminate_indexed shared-oracle contract), plus the
    // vocab-saturation route verdict — dedup_auto's rule verbatim.
    "decontaminate_auto" ->
      s"""WITH vnn AS (SELECT (count(*) + 9) // 10 AS per FROM documents),
        |vw AS (SELECT doc_id // (SELECT per FROM vnn) AS slice,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '')) AS word
        |       FROM documents),
        |vfs AS (SELECT word, min(slice) AS slice FROM vw GROUP BY word),
        |vtot AS (SELECT CAST(count(*) AS BIGINT) AS total,
        |           CAST(count(*) FILTER (WHERE slice = 0) AS BIGINT) AS s0 FROM vfs),
        |rt AS (SELECT CASE WHEN total > 0 AND (total - s0) * 1000 < ${Dedup.DedupAutoLatePermille} * total
        |         THEN 'lsh' ELSE 'exact' END AS route FROM vtot),
        |dp AS ($decontaminateSql)
        |SELECT eval_id, train_id, containment, route FROM dp, rt
        |ORDER BY eval_id, train_id""".stripMargin,
    // decontaminate_indexed: candidates from the persisted 64×2 containment
    // band index, containment verified on candidates only — equals the
    // exact containment join when every qualifying pair is banded into a
    // candidate. On this corpus the minimum qualifying-pair Jaccard is
    // 0.889 (sf0.1), where the wide banding's miss probability is
    // (1-0.889²)⁶⁴ ≈ 1e-42 — the dedup_minhash shared-oracle argument.
    "decontaminate_indexed" -> s"$decontaminateSql\nORDER BY eval_id, train_id",
    // stream_decontaminate: the same banded-candidate route as
    // decontaminate_indexed, fed by a stream — the emitted pair set is
    // order-independent, so the exact containment join stays the oracle.
    "stream_decontaminate" -> s"$decontaminateSql\nORDER BY eval_id, train_id",
    // corpus_export: the composed pipeline — each stage's standalone
    // oracle joined into one WITH chain (nested-WITH blocks for the
    // self-contained stages), so the composition is exactly checked too.
    "corpus_export" -> s"$exportCtes\nSELECT doc_id, quality FROM exp ORDER BY doc_id",
    // release_report: the export gauntlet as a sequential waterfall —
    // per-doc gate flags from the same CTEs, one conditional aggregate,
    // four stage rows.
    "release_report" ->
      s"""$exportCtes,
         |fl AS (SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 10 <> 0 THEN 1 ELSE 0 END AS t,
         |    CASE WHEN q.quality >= 0.7 THEN 1 ELSE 0 END AS pq,
         |    CASE WHEN l.cluster_id = l.doc_id THEN 1 ELSE 0 END AS cn,
         |    CASE WHEN d.doc_id IN (SELECT doc_id FROM cont) THEN 0 ELSE 1 END AS cl
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id JOIN lbl l ON d.doc_id = l.doc_id),
         |ag AS (SELECT count(*) AS n0, CAST(sum(t) AS BIGINT) AS n1,
         |    CAST(sum(t * pq) AS BIGINT) AS n2, CAST(sum(t * pq * cn) AS BIGINT) AS n3,
         |    CAST(sum(t * pq * cn * cl) AS BIGINT) AS n4 FROM fl)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_no, 'eval_holdout' AS stage, n0 AS n_in, n0 - n1 AS n_dropped, n1 AS n_out,
         |    CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n0 - n1 AS DOUBLE) / CAST(n0 AS DOUBLE), 4) END AS drop_rate FROM ag
         |  UNION ALL SELECT 2, 'quality_floor', n1, n1 - n2, n2,
         |    CASE WHEN n1 = 0 THEN 0.0 ELSE round(CAST(n1 - n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) END FROM ag
         |  UNION ALL SELECT 3, 'dedup_canonical', n2, n2 - n3, n3,
         |    CASE WHEN n2 = 0 THEN 0.0 ELSE round(CAST(n2 - n3 AS DOUBLE) / CAST(n2 AS DOUBLE), 4) END FROM ag
         |  UNION ALL SELECT 4, 'decontamination', n3, n3 - n4, n4,
         |    CASE WHEN n3 = 0 THEN 0.0 ELSE round(CAST(n3 - n4 AS DOUBLE) / CAST(n3 AS DOUBLE), 4) END FROM ag
         |) ORDER BY stage_no""".stripMargin,
    // export_pack: pack_sequences' prefix-sum layout recomputed over the
    // export survivors — position-sensitive, so the whole WITH chain
    // (dedup closure + quality + decontamination + packing) is one oracle.
    "export_pack" ->
      s"""$exportCtes,
         |d2 AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> '') AS ts FROM documents),
         |t2 AS (SELECT doc_id, lang, CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS n_tokens FROM d2),
         |c2 AS (SELECT t2.lang, t2.doc_id, t2.n_tokens,
         |        CAST(sum(t2.n_tokens) OVER (PARTITION BY t2.lang ORDER BY t2.doc_id) AS BIGINT) AS cum
         |      FROM t2 JOIN exp ON t2.doc_id = exp.doc_id WHERE t2.n_tokens > 0)
         |SELECT lang, doc_id, n_tokens,
         |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
         |  CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
         |  CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
         |FROM c2 ORDER BY lang, doc_id""".stripMargin,
    // export_shards: the export's data-loader handoff — deterministic
    // doc_id-mod sharding with per-shard doc/token/quality accounting.
    "export_shards" ->
      s"""$exportCtes,
         |tok AS (SELECT doc_id, CAST(COALESCE(list_sum(list_transform(
         |    list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> ''),
         |    w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS bpe_tokens FROM documents)
         |SELECT doc_id % 16 AS shard, count(*) AS n_docs,
         |  CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(quality), 4) AS avg_quality
         |FROM exp JOIN tok USING (doc_id) GROUP BY shard ORDER BY shard""".stripMargin,
    // export_manifest: the shard integrity stamp — bit_xor over a 60-bit
    // md5 digest of each doc_id (order-independent id-set signature with
    // O(1) aggregation state; both engines parse the same 15-hex-char
    // prefix to the same BIGINT).
    "export_manifest" ->
      s"""$exportCtes,
         |tok AS (SELECT doc_id, CAST(COALESCE(list_sum(list_transform(
         |    list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> ''),
         |    w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS bpe_tokens FROM documents)
         |SELECT doc_id % 16 AS shard, count(*) AS n_docs,
         |  CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens,
         |  bit_xor(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)) AS doc_signature
         |FROM exp JOIN tok USING (doc_id) GROUP BY shard ORDER BY shard""".stripMargin,
    // export_write: the SAME accounting recomputed from the WRITTEN shard
    // files (Pipeline.exportWrite round-trips through parquet on disk), so
    // a matching hash proves the files hold exactly the export.
    "export_write" ->
      s"""$exportCtes,
         |tok AS (SELECT doc_id, CAST(COALESCE(list_sum(list_transform(
         |    list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> w <> ''),
         |    w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS bpe_tokens FROM documents)
         |SELECT doc_id % 16 AS shard, count(*) AS n_docs,
         |  CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(quality), 4) AS avg_quality
         |FROM exp JOIN tok USING (doc_id) GROUP BY shard ORDER BY shard""".stripMargin,
    // export_sorted: the histogram-cut range bucketing replayed exactly —
    // 1024 equal-width integer bins over event micros, cumulative counts,
    // cut bins at ceil(k·n/8) ranks, bucket = cuts ≤ a row's bin. DuckDB
    // `//` = Spark `div` on BIGINT; the engine side reports FROM the
    // written files, so this checks the on-disk layout.
    "export_sorted" ->
      """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |b AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx, count(*) AS n FROM e),
        |f AS (SELECT e.event_id, e.ts_us, (e.ts_us - b.mn) * 1024 // (b.mx - b.mn + 1) AS bin, b.n FROM e, b),
        |h AS (SELECT bin, n, count(*) AS cnt FROM f GROUP BY bin, n),
        |w AS (SELECT bin, n, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |ks AS (SELECT unnest(range(1, 8)) AS k),
        |cuts AS (SELECT ks.k, min(w.bin) AS cut FROM w JOIN ks ON w.cum >= (ks.k * w.n + 7) // 8 GROUP BY ks.k),
        |cl AS (SELECT COALESCE(list(cut ORDER BY cut), []) AS cs FROM cuts),
        |a AS (SELECT f.ts_us, len(list_filter(cl.cs, c -> f.bin >= c)) AS bucket FROM f, cl)
        |SELECT bucket, count(*) AS n_events, min(ts_us) AS min_ts, max(ts_us) AS max_ts
        |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin,
    // merge_upsert: the same derived changelog and the same one-pass
    // full-outer merge semantics, replayed over the raw source (the
    // bucketed snapshot is a pure function of it).
    "merge_upsert" ->
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st, CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |mx AS (SELECT max(k) AS mxk FROM b),
        |chg AS (
        |  SELECT k, 'D' AS op, st, c FROM b WHERE k % 13 = 5
        |  UNION ALL SELECT k, 'U', st, c + 100 FROM b WHERE k % 13 <> 5 AND k % 7 = 3
        |  UNION ALL SELECT b.k + mx.mxk, 'I', st, c FROM b, mx WHERE b.k % 11 = 2),
        |m AS (SELECT COALESCE(g.st, s.st) AS st, COALESCE(g.c, s.c) AS c,
        |        CASE WHEN g.op IS NOT NULL THEN 1 ELSE 0 END AS from_chg, g.op AS op
        |      FROM b s FULL OUTER JOIN chg g ON s.k = g.k)
        |SELECT st AS o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(from_chg) AS BIGINT) AS n_from_changelog,
        |  CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM m WHERE op IS NULL OR op <> 'D'
        |GROUP BY st ORDER BY st""".stripMargin,
    // snapshot_diff: the same mod-class state-B derivation replayed over
    // documents; the diff itself is the digest-compare full-outer join.
    "snapshot_diff" -> snapshotDiffSql,
    // stream_snapshot_diff: identical contract — the streaming form's
    // added/changed/removed classification must land on the batch answer
    // row for row, so the oracle IS the batch oracle.
    "stream_snapshot_diff" -> snapshotDiffSql,
    // train_shuffle: both hash roles replay exactly — the Knuth shard mix
    // in BIGINT arithmetic, the md5 order key as a string; the per-shard
    // row_number is the same window on both engines.
    "train_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  CAST(((doc_id * 2654435761 + 17) % 4294967296) % 8 AS INTEGER) AS shard,
        |  md5('17:' || CAST(doc_id AS VARCHAR)) AS okey
        |  FROM documents)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM k ORDER BY shard, pos""".stripMargin,
    // epoch_plan: pack_sequences' CTE chain re-used to derive the sequence
    // universe (explode each doc's span, collapse), then the train_shuffle
    // hash roles dealt per (lang, seq) — identical integer mix and md5 on
    // both engines.
    "epoch_plan" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ts FROM documents),
        |t AS (SELECT doc_id, lang, CAST(COALESCE(list_sum(list_transform(ts, w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS n_tokens FROM d),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
        |      FROM t WHERE n_tokens > 0),
        |p AS (SELECT lang, CAST((cum - n_tokens) // 2048 AS BIGINT) AS ss,
        |             CAST((cum - 1) // 2048 AS BIGINT) AS es FROM c),
        |s AS (SELECT lang, CAST(unnest(range(ss, es + 1)) AS BIGINT) AS seq_id FROM p),
        |g AS (SELECT lang, seq_id, CAST(count(*) AS BIGINT) AS n_docs FROM s GROUP BY lang, seq_id),
        |k AS (SELECT lang, seq_id, n_docs,
        |        CAST((((seq_id * 131 + ascii(lang) * 7 + 17) * 2654435761) % 4294967296) % 8 AS INTEGER) AS shard,
        |        md5('17:' || lang || ':' || CAST(seq_id AS VARCHAR)) AS okey
        |      FROM g)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, lang, seq_id) AS BIGINT) AS pos,
        |  lang, seq_id, n_docs
        |FROM k ORDER BY shard, pos""".stripMargin,
    // stream_upsert: merge_upsert's semantics with batch-1 corrections —
    // even U keys end at +200 (last write wins), odd at +100.
    "stream_upsert" ->
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st, CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |mx AS (SELECT max(k) AS mxk FROM b),
        |chg AS (
        |  SELECT k, 'D' AS op, st, c FROM b WHERE k % 13 = 5
        |  UNION ALL SELECT k, 'U', st,
        |    c + CASE WHEN k % 2 = 0 THEN 200 ELSE 100 END
        |    FROM b WHERE k % 13 <> 5 AND k % 7 = 3
        |  UNION ALL SELECT b.k + mx.mxk, 'I', st, c FROM b, mx WHERE b.k % 11 = 2),
        |m AS (SELECT COALESCE(g.st, s.st) AS st, COALESCE(g.c, s.c) AS c,
        |        CASE WHEN g.op IS NOT NULL THEN 1 ELSE 0 END AS from_chg, g.op AS op
        |      FROM b s FULL OUTER JOIN chg g ON s.k = g.k)
        |SELECT st AS o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(from_chg) AS BIGINT) AS n_from_changelog,
        |  CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM m WHERE op IS NULL OR op <> 'D'
        |GROUP BY st ORDER BY st""".stripMargin,
    // stream_scd2: the batch SCD2 derivation restricted to CLOSED versions
    // (a stream never emits its open tail) — same collapse + lead chain.
    "stream_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |x AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |c AS (SELECT user_id, event_id, event_type, us FROM x WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT event_type, us AS f,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t FROM c)
        |SELECT event_type, count(*) AS n_versions, CAST(sum(t - f) AS BIGINT) AS dwell_us
        |FROM v WHERE t IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin,
    // scd2_history: same change-collapse then interval windows, µs-integer
    // dwell arithmetic; ties broken by event_id in BOTH window orders.
    "scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |x AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |c AS (SELECT user_id, event_id, event_type, us FROM x WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT event_type, us AS f,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t FROM c)
        |SELECT event_type, count(*) AS n_versions,
        |  CAST(sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
        |  CAST(sum(CASE WHEN t IS NULL THEN 0 ELSE t - f END) AS BIGINT) AS dwell_us
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    // agg_incremental: the oracle RECOMPUTES the view from the changelog-
    // applied fact rows — the incremental path must equal the recompute,
    // which is the IVM correctness contract. Same mod-class derivation as
    // merge_upsert; inserts offset custkey past max (new groups).
    "agg_incremental" ->
      """WITH b AS (SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |m AS (SELECT max(o_custkey) AS mxc FROM b),
        |f AS (SELECT o_custkey,
        |        cents + CASE WHEN o_orderkey % 7 = 3 THEN 100 ELSE 0 END AS cents
        |      FROM b WHERE o_orderkey % 13 <> 5
        |      UNION ALL
        |      SELECT o_custkey + mxc AS o_custkey, cents FROM b, m WHERE o_orderkey % 11 = 2)
        |SELECT o_custkey, count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM f GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // export_zorder: both dims' rank cuts replayed (the export_sorted
    // machinery twice), then the Morton bucket = the top 2 bits of each
    // dim's cell number interleaved — z div 16 with the low bits dropped.
    "export_zorder" -> (zorderBktCte + """
        |SELECT bucket, count(*) AS n_events, min(ts_us) AS min_ts, max(ts_us) AS max_ts,
        |  min(uid) AS min_user, max(uid) AS max_user
        |FROM bkt GROUP BY bucket ORDER BY bucket""".stripMargin),
    // zorder_skipping: bucket assignment replayed (the shared zorderBktCte),
    // per-bucket bboxes recomputed, the same six rectangle predicates
    // derived from global bounds, min/max pruning + true selectivity both
    // integer-exact. Unconstrained quarter ranges (tq/uq = -1) are guarded
    // before use in BOTH engines, so floor-vs-trunc division on the
    // negative index can never surface.
    "zorder_skipping" -> (zorderBktCte + """,
        |stats AS (SELECT bucket, min(ts_us) AS bmin_ts, max(ts_us) AS bmax_ts,
        |    min(uid) AS bmin_u, max(uid) AS bmax_u FROM bkt GROUP BY bucket),
        |gb AS (SELECT min(ts_us) AS tmn, max(ts_us) AS tmx, min(uid) AS umn, max(uid) AS umx FROM bkt),
        |pr AS (SELECT * FROM (VALUES ('t_q1', 0, -1), ('t_q3', 2, -1), ('u_q1', -1, 0),
        |    ('u_q3', -1, 2), ('tu_q11', 0, 0), ('tu_q33', 2, 2)) AS t(pred, tq, uq)),
        |wr AS (SELECT pred, tq, uq,
        |    tmn + (tmx - tmn + 1) * tq // 4 AS tlo, tmn + (tmx - tmn + 1) * (tq + 1) // 4 AS thi,
        |    umn + (umx - umn + 1) * uq // 4 AS ulo, umn + (umx - umn + 1) * (uq + 1) // 4 AS uhi
        |  FROM pr, gb),
        |sc AS (SELECT pred, count(*) AS n_buckets,
        |    CAST(sum(CASE WHEN (tq = -1 OR NOT (bmax_ts < tlo OR bmin_ts >= thi))
        |                   AND (uq = -1 OR NOT (bmax_u < ulo OR bmin_u >= uhi)) THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned
        |  FROM stats, wr GROUP BY pred),
        |mt AS (SELECT pred, count(*) AS rows_matched FROM bkt, wr
        |  WHERE (tq = -1 OR (ts_us >= tlo AND ts_us < thi))
        |    AND (uq = -1 OR (uid >= ulo AND uid < uhi)) GROUP BY pred)
        |SELECT sc.pred AS pred, sc.n_buckets, sc.buckets_scanned,
        |  CAST(COALESCE(mt.rows_matched, 0) AS BIGINT) AS rows_matched
        |FROM sc LEFT JOIN mt ON sc.pred = mt.pred ORDER BY sc.pred""".stripMargin),
    // dedup_simhash: token hash = md5_number_lower on both sides, so the
    // whole sketch (bit votes → 64-bit signature → hamming ≤ 3) is exactly
    // expressible in DuckDB. The banding in the Spark plan is pure candidate
    // pruning (pigeonhole: hamming ≤ 3 pairs always share a 16-bit band).
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS w FROM documents),
        |h AS (SELECT doc_id, md5_number_lower(w) AS h FROM toks),
        |bits AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h, range(64) t(i) GROUP BY doc_id, i),
        |sig AS (SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS UBIGINT) << i) ELSE 0 END) AS UBIGINT) AS sig
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // bpe_train: the whole training loop is deterministic (integer pair
    // counts, lexicographic tie-break, literal-replace merge whose
    // left-to-right non-overlap semantics agree across engines), so the
    // oracle re-runs it in unrolled CTEs — same technique as k-means.
    "bpe_train" -> graft.operators.Bpe.bpeOracle(),
    "bpe_encode" -> graft.operators.Bpe.bpeEncodeOracle(),
    // bpe_fertility: the unrolled merge chain + a (lang, word) count joined
    // on the word — all integer sums, two rounded divisions at the edge.
    "bpe_fertility" -> graft.operators.Bpe.bpeFertilityOracle(),
    // bpe_coverage: train-shard vocabulary applied to the held-out shard —
    // merge coverage + byte-fallback, fully replayed in SQL (train CTEs
    // shard-filtered, eval chain applies the same rules).
    "bpe_coverage" -> graft.operators.Bpe.bpeCoverageOracle(),
    "similarity_ann" -> annOracle,
    "similarity_ivf" -> ivfOracle(),
    // similarity_ivf_indexed: the stored codebook/assignment are the SAME
    // deterministic k-means (bit-identical centroids), so the persisted-
    // index search returns exactly ivfSearch's rows — one oracle for both.
    "similarity_ivf_indexed" -> ivfOracle(),
    "knn_join" -> knnJoinOracle(),
    "mutual_knn" -> mutualKnnOracle(),
    // semdedup: the same auto-sized k-means chain, then the survivor rule
    // — each dropped vector's dup_of is its smallest same-cell id above
    // the cosine threshold; training, sizing, and decision all replayed.
    // stream_cluster_assign: the batch nearest-centroid assignment over
    // the delta docs — argmax replayed as row_number over (cos DESC,
    // cent_id); arrival order can't show (argmax is commutative).
    "stream_cluster_assign" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3, textEmbSourceSql) + s""",
      |d AS (SELECT vec_id, emb FROM e WHERE vec_id % 10 = 0),
      |r AS (SELECT d.vec_id AS doc_id, c.cent_id, list_cosine_similarity(d.emb, c.cemb) AS cos,
      |    row_number() OVER (PARTITION BY d.vec_id ORDER BY list_cosine_similarity(d.emb, c.cemb) DESC, c.cent_id) AS rn
      |  FROM d, cents3 c)
      |SELECT doc_id, CAST(cent_id AS INTEGER) AS cell, round(cos, 6) AS cos
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    // similar_docs: the ivf-search oracle with the hashed-doc-embedding
    // source — probes rank the codebook, neighbors come from nprobe cells.
    "similar_docs" -> similarDocsSql,
    // text_recall: the recall instrument over the text bridge — exact
    // hashed-cosine brute force as truth, text IVF search as approx,
    // the metric composed from both full oracles.
    "text_recall" -> recallOracle(textBruteSql, similarDocsSql),
    // hard_negatives: the contrastive-mining chain replayed end-to-end —
    // hashed-BoW cosine top-20 candidates (textBruteSql's source), the
    // word-trigram set intersect, the integer rational near-dup cut
    // mrr_eval: the oracle RUNS the textbook windowed-rank form
    // (row_number over cos desc, first relevant = min rank), so the
    // engine's counting rewrite is differentially proven. Cos doubles
    // hash-match across engines (the similar_docs precedent); the
    // reciprocal is the exact integer 10^6 div rank.
    "mrr_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    CAST(label AS BIGINT) AS label FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, emb AS probe_emb, label AS probe_label
        |  FROM e WHERE vec_id < 100),
        |s AS (SELECT probe_id, probe_label, vec_id AS neighbor_id, label,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY list_cosine_similarity(probe_emb, emb) DESC, vec_id) AS rn
        |  FROM p, e WHERE vec_id <> probe_id)
        |SELECT probe_id, probe_label, CAST(min(rn) AS BIGINT) AS first_rank,
        |  CAST(1000000 // min(rn) AS BIGINT) AS rr_e6
        |FROM s WHERE label = probe_label GROUP BY 1, 2 ORDER BY probe_id""".stripMargin,
    // 3·inter < |A|+|B| (⇔ Jaccard < 1/2 — no float boundary), then the
    // re-rank. Raw cos doubles hash-match across engines (the
    // similar_docs precedent).
    "hard_negatives" ->
      (s"""WITH e AS ($textEmbSourceSql),
        |p AS (SELECT vec_id AS probe_id, emb AS probe_emb FROM e WHERE vec_id < 10),
        |s AS (SELECT probe_id, vec_id AS neighbor_id, list_cosine_similarity(probe_emb, emb) AS cos,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(probe_emb, emb) DESC, vec_id) AS rn
        |  FROM p, e WHERE vec_id <> probe_id),
        |c AS (SELECT probe_id, neighbor_id, cos FROM s WHERE rn <= 20),
        |""".stripMargin +
       """d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM d),
        |v AS (SELECT c.probe_id, c.neighbor_id, c.cos,
        |    CAST(len(list_intersect(sa.g, sb.g)) AS BIGINT) AS inter,
        |    CAST(len(sa.g) + len(sb.g) AS BIGINT) AS szsum
        |  FROM c JOIN sh sa ON c.probe_id = sa.doc_id JOIN sh sb ON c.neighbor_id = sb.doc_id),
        |f AS (SELECT probe_id, neighbor_id, cos, inter, szsum - inter AS uni,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM v WHERE 3 * inter < szsum)
        |SELECT probe_id, neighbor_id, cos, inter, uni, CAST(rn AS BIGINT) AS rnk
        |FROM f WHERE rn <= 5 ORDER BY probe_id, rnk""".stripMargin),
    // semdedup_text: the whole text→vector→cluster→dedup bridge replayed
    // in SQL — hashed doc embeddings as the k-means source, then the
    // same-cell min-id survivor rule at cosine >= 0.8.
    "semdedup_text" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3, textEmbSourceSql) + """,
      |p AS (SELECT b.vec_id AS vec_id, CAST(b.cell AS INTEGER) AS cell, a.vec_id AS keeper
      |  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.emb, b.emb) >= 0.8)
      |SELECT vec_id, cell, min(keeper) AS dup_of FROM p GROUP BY vec_id, cell
      |ORDER BY vec_id""".stripMargin),
    // cluster_sample: the k-means chain, then deterministic per-cell
    // quotas by digest order — WindowGroupLimit semantics replayed as
    // row_number <= m.
    // cluster_keywords: the text k-means chain (hashed embeddings), then
    // c-TF-IDF per cell — tf within cell, idf over cells-with-tokens,
    // ln on both engines, top-3 per cell with word tie-break.
    "cluster_keywords" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3, textEmbSourceSql) + """,
      |dd AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS word FROM documents),
      |ctf AS (SELECT CAST(c.cell AS INTEGER) AS cell, word, count(*) AS tf
      |  FROM dd JOIN cellv c ON dd.doc_id = c.vec_id GROUP BY 1, 2),
      |cdf AS (SELECT word, count(*) AS df FROM ctf GROUP BY word),
      |ncl AS (SELECT count(DISTINCT cell) AS ncells FROM ctf),
      |scw AS (SELECT cell, ctf.word AS word, tf,
      |    CAST(tf AS DOUBLE) * ln(CAST(ncells AS DOUBLE) / CAST(df AS DOUBLE)) AS score
      |  FROM ctf JOIN cdf ON ctf.word = cdf.word, ncl),
      |rw AS (SELECT cell, word, tf, score,
      |    row_number() OVER (PARTITION BY cell ORDER BY score DESC, word) AS rnk FROM scw)
      |SELECT cell, CAST(rnk AS BIGINT) AS rnk, word, tf, round(score, 6) AS score
      |FROM rw WHERE rnk <= 3 ORDER BY cell, rnk""".stripMargin),
    "cluster_sample" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3) + """,
      |r AS (SELECT CAST(cell AS INTEGER) AS cell, vec_id,
      |    row_number() OVER (PARTITION BY cell ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |  FROM cellv)
      |SELECT cell, CAST(rk AS BIGINT) AS rk, vec_id FROM r WHERE rk <= 5
      |ORDER BY cell, rk""".stripMargin),
    // embed_clusters: same auto-sized k-means chain, then per-cell
    // population + exemplar (max cosine to the trained centroid, ties to
    // the smallest vec_id — replayed as max(struct) semantics via
    // ORDER BY cos DESC, vec_id).
    "embed_clusters" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3) + """,
      |sc AS (SELECT CAST(a.cell AS INTEGER) AS cell, a.vec_id,
      |    list_cosine_similarity(a.emb, c.cemb) AS cos,
      |    row_number() OVER (PARTITION BY a.cell ORDER BY list_cosine_similarity(a.emb, c.cemb) DESC, a.vec_id) AS rn,
      |    count(*) OVER (PARTITION BY a.cell) AS n_vecs
      |  FROM cellv a JOIN cents3 c ON a.cell = c.cent_id)
      |SELECT cell, n_vecs, vec_id AS exemplar_id, round(cos, 6) AS exemplar_cos
      |FROM sc WHERE rn = 1 ORDER BY cell""".stripMargin),
    "semdedup" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3) + """,
      |p AS (SELECT b.vec_id AS vec_id, CAST(b.cell AS INTEGER) AS cell, a.vec_id AS keeper
      |  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3)
      |SELECT vec_id, cell, min(keeper) AS dup_of FROM p GROUP BY vec_id, cell
      |ORDER BY vec_id""".stripMargin),
    // semdedup_probed: the ≤2-nearest-cells assignment (rank ≤ 2 over the
    // trained codebook, rank 1 ≡ the stored cellv assignment), pairs
    // sharing ANY probe cell, min-id survivor per dropped vector.
    "semdedup_probed" -> (ivfCtesExpr("(SELECT nc FROM ncell)", 3) + semDedupProbe2Cte(0.3) + """
      |SELECT vec_id, min(keeper) AS dup_of FROM p2 GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin),
    // semdedup_recall: truth = the UNBLOCKED all-pairs drop set (distinct
    // larger-id vectors with any cosine-≥-τ smaller-id witness); detected
    // = the same-cell drop set and the 2-probe drop set, each from the
    // full replayed k-means chain; the integer permille and the
    // zero-truth guard replay exactly.
    "semdedup_recall" ->
      (ivfCtesExpr("(SELECT nc FROM ncell)", 3) + semDedupRecallTail(0.3)),
    // index_auto / index_audit: the auto-routed ANN maintenance cycle —
    // base-split codebook, frozen-codebook extended assignment, drift
    // arithmetic, the integer route rule, and (for index_auto) BOTH
    // branches' served neighbors selected by the replayed route.
    "index_auto" -> indexAutoSql,
    "index_audit" -> indexAuditSql,
    // stream_index_audit: shares index_audit's oracle verbatim — per-row
    // argmax assignment is a pure content function against the frozen
    // codebook and cell counts add associatively, so the stream-maintained
    // grid equals the batch extended assignment under any micro-batch split.
    "stream_index_audit" -> indexAuditSql,
    // semdedup_text_recall: the same instrument over the hashed-BoW text
    // bridge at semdedup_text's threshold.
    "semdedup_text_recall" ->
      (ivfCtesExpr("(SELECT nc FROM ncell)", 3, textEmbSourceSql) +
        semDedupRecallTail(0.8)),
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |  array_to_string(list_transform(embedding[1:8], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bkt
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_cosine_similarity(a.emb, b.emb) AS cos
        |FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin,
    "similarity_knn" -> knnBruteSql,
    // knn_classify: exact cosine top-5 from the labeled pool, majority
    // vote with (votes desc, label asc) tie-break — fully deterministic.
    "knn_classify" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, emb AS probe_emb, label AS true_label FROM e WHERE vec_id < 20),
        |s AS (SELECT probe_id, true_label, e.vec_id AS neighbor_id, e.label,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY list_cosine_similarity(probe_emb, emb) DESC, e.vec_id) AS rnk
        |  FROM p, e WHERE e.vec_id >= 20),
        |v AS (SELECT probe_id, true_label, label, count(*) AS votes FROM s WHERE rnk <= 5 GROUP BY probe_id, true_label, label),
        |w AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) AS vr FROM v)
        |SELECT probe_id, true_label, label AS pred_label, CAST(votes AS BIGINT) AS votes
        |FROM w WHERE vr = 1 ORDER BY probe_id""".stripMargin,
    // recall harness: approximate result ∩ exact truth per probe — the
    // truth/approx sides are each their full standalone oracle nested as a
    // WITH-subquery (the corpus_export composition technique), so the
    // METRIC is exactly checked on top of two exactly-checked searches.
    "ann_recall" -> recallOracle(knnBruteSql, annOracle),
    "ivf_recall" -> recallOracle(knnBruteSql, ivfOracle()),
    // pq_recall: ADC approximates L2, so the truth is the exact L2 top-k
    // (a cosine truth would conflate metric disagreement with
    // quantization loss); both searches and the metric are composed
    // oracles.
    "pq_recall" -> recallOracle(l2BruteSql, pqSearchOracle()),
    // quantize_embeddings: per-element double arithmetic + floor on both
    // sides (the cosine-parity discipline), SSE as the same left fold with
    // 0.0 init (list_reduce's first-element init equals it exactly:
    // 0.0 + e1 == e1 in IEEE), so the lossy codec hash-checks exactly.
    "quantize_embeddings" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |m AS (SELECT vec_id, x, list_max(list_transform(x, v -> abs(v))) AS maxabs FROM e),
        |q AS (SELECT vec_id, x, maxabs, maxabs / 127.0 AS scale,
        |  CASE WHEN maxabs = 0 THEN list_transform(x, v -> 0)
        |       ELSE list_transform(x, v -> CAST(floor(v * 127.0 / maxabs + 0.5) AS INTEGER)) END AS qs FROM m)
        |SELECT vec_id, list_min(qs) AS q_min, list_max(qs) AS q_max,
        |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
        |  round(list_reduce(
        |    list_transform(range(1, len(x) + 1),
        |      i -> (x[CAST(i AS INT)] - qs[CAST(i AS INT)] * scale) *
        |           (x[CAST(i AS INT)] - qs[CAST(i AS INT)] * scale)),
        |    (a, b) -> a + b), 9) AS recon_sse
        |FROM q ORDER BY vec_id""".stripMargin,
    // embedding_stats: parallel unnests zip (range list length == vector
    // length), float→double widening is exact so min/max are bit-equal;
    // only the mean is fold-order sensitive, hence the 4dp round.
    "embedding_stats" ->
      """WITH e AS (SELECT unnest(range(1, len(embedding) + 1)) AS dim,
        |                  unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
        |SELECT dim, count(*) AS n, round(avg(x), 4) AS mean,
        |  min(x) AS min_x, max(x) AS max_x
        |FROM e GROUP BY dim ORDER BY dim""".stripMargin,
    // embedding_drift: base vs delta per-dimension means, shift normalized
    // by the base range; the drift verdict compares the ROUNDED ratio so
    // both engines decide identically.
    "embedding_drift" ->
      """WITH e AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
        |                  unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
        |b AS (SELECT dim, count(*) AS n_base, avg(x) AS mb, min(x) AS min_base, max(x) AS max_base
        |  FROM e WHERE vec_id % 10 <> 0 GROUP BY dim),
        |d AS (SELECT dim, count(*) AS n_delta, avg(x) AS md
        |  FROM e WHERE vec_id % 10 = 0 GROUP BY dim),
        |j AS (SELECT b.dim AS dim, n_base, n_delta, mb, md,
        |    CASE WHEN max_base = min_base THEN CAST(0 AS DOUBLE)
        |         ELSE round((md - mb) / (max_base - min_base), 4) + 0.0 END AS rel_shift
        |  FROM b JOIN d ON b.dim = d.dim)
        |SELECT dim, n_base, n_delta, round(mb, 4) + 0.0 AS mean_base, round(md, 4) + 0.0 AS mean_delta,
        |  rel_shift, CAST(abs(rel_shift) > 0.05 AS INTEGER) AS drifted
        |FROM j ORDER BY dim""".stripMargin,
    // pq_encode / pq_search: the full PQ training replayed in SQL
    // (pqCtes) — codes, reconstruction SSE, and ADC ranking are all
    // exactly checked, lossy codec included (the quantize_embeddings
    // discipline applied to a TRAINED codec).
    "pq_encode" -> pqEncodeOracle(),
    "pq_search" -> pqSearchOracle(),
    // ivfpq_search: both trainings composed in one WITH — candidates from
    // the coarse cells, ranking from the codes' ADC distances.
    "ivfpq_search" -> ivfpqOracle(),
    // media_meta: the engine PARSES real container headers (PNG IHDR /
    // JPEG SOF / WAV fmt+data / AVI avih — Media.HeaderDecoder); the
    // oracle predicts what those headers declare from the generator's
    // deterministic encoding (dims from text length, n_bytes = data +
    // exact container overhead: PNG 57, JPEG 41, WAV 44, AVI 100 bytes).
    // A match proves decode(encode(len)) round-trips through real bytes.
    "media_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(doc_id % 2 AS INTEGER) AS par,
        |  strlen(text) AS len FROM documents)
        |SELECT media_id, kind,
        |  CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
        |             WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS INTEGER) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 13) % 656 END AS INTEGER) AS height,
        |  CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS INTEGER) AS n_frames
        |FROM m ORDER BY media_id""".stripMargin,
    // media_filter: the same generator-derived metadata, gated by integer
    // rules (resolution/aspect for visual kinds, sample floor for audio,
    // byte floor for all) — per-rule flags + conjunction.
    "media_filter" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(doc_id % 2 AS INTEGER) AS par,
        |  strlen(text) AS len FROM documents),
        |d AS (SELECT media_id, kind,
        |  CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
        |             WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS BIGINT) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 13) % 656 END AS BIGINT) AS height,
        |  CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS BIGINT) AS n_frames
        |FROM m),
        |f AS (SELECT media_id, kind,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN width >= 128 AND height >= 128 THEN 1 ELSE 0 END
        |       ELSE CASE WHEN n_frames >= 300 THEN 1 ELSE 0 END END AS pass_resolution,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN greatest(width, height) <= least(width, height) * 3 THEN 1 ELSE 0 END
        |       ELSE 1 END AS pass_aspect,
        |  CASE WHEN n_bytes >= 256 THEN 1 ELSE 0 END AS pass_size
        |FROM d)
        |SELECT media_id, kind, CAST(pass_resolution AS INTEGER) AS pass_resolution,
        |  CAST(pass_aspect AS INTEGER) AS pass_aspect, CAST(pass_size AS INTEGER) AS pass_size,
        |  CAST(pass_resolution * pass_aspect * pass_size AS INTEGER) AS keep
        |FROM f ORDER BY media_id""".stripMargin,
    "stream_media_filter" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(doc_id % 2 AS INTEGER) AS par,
        |  strlen(text) AS len FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT media_id, kind,
        |  CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
        |             WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS BIGINT) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 13) % 656 END AS BIGINT) AS height,
        |  CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS BIGINT) AS n_frames
        |FROM m),
        |f AS (SELECT media_id, kind,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN width >= 128 AND height >= 128 THEN 1 ELSE 0 END
        |       ELSE CASE WHEN n_frames >= 300 THEN 1 ELSE 0 END END AS pass_resolution,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN greatest(width, height) <= least(width, height) * 3 THEN 1 ELSE 0 END
        |       ELSE 1 END AS pass_aspect,
        |  CASE WHEN n_bytes >= 256 THEN 1 ELSE 0 END AS pass_size
        |FROM d)
        |SELECT media_id, kind, CAST(pass_resolution AS INTEGER) AS pass_resolution,
        |  CAST(pass_aspect AS INTEGER) AS pass_aspect, CAST(pass_size AS INTEGER) AS pass_size,
        |  CAST(pass_resolution * pass_aspect * pass_size AS INTEGER) AS keep
        |FROM f ORDER BY media_id""".stripMargin,
    // media_report: the gate chain rolled up per kind — per-rule cut
    // counts + keep rate, all integer sums and one rounded ratio.
    "media_report" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(doc_id % 2 AS INTEGER) AS par,
        |  strlen(text) AS len FROM documents),
        |d AS (SELECT media_id, kind,
        |  CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
        |             WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS BIGINT) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 13) % 656 END AS BIGINT) AS height,
        |  CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS BIGINT) AS n_frames
        |FROM m),
        |f AS (SELECT media_id, kind,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN width >= 128 AND height >= 128 THEN 1 ELSE 0 END
        |       ELSE CASE WHEN n_frames >= 300 THEN 1 ELSE 0 END END AS pr,
        |  CASE WHEN kind <> 'audio' THEN CASE WHEN greatest(width, height) <= least(width, height) * 3 THEN 1 ELSE 0 END
        |       ELSE 1 END AS pa,
        |  CASE WHEN n_bytes >= 256 THEN 1 ELSE 0 END AS ps
        |FROM d)
        |SELECT kind, count(*) AS n_assets,
        |  CAST(sum(pr * pa * ps) AS BIGINT) AS n_kept,
        |  CAST(sum(1 - pr) AS BIGINT) AS cut_resolution,
        |  CAST(sum(1 - pa) AS BIGINT) AS cut_aspect,
        |  CAST(sum(1 - ps) AS BIGINT) AS cut_size,
        |  round(CAST(sum(pr * pa * ps) AS DOUBLE) / count(*), 4) AS keep_rate
        |FROM f GROUP BY kind ORDER BY kind""".stripMargin,
    "media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, strlen(text) AS len FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 0),
        |d AS (SELECT media_id, CAST(64 + (len * 7) % 1216 AS BIGINT) AS width,
        |             CAST(64 + (len * 13) % 656 AS BIGINT) AS height FROM m)
        |SELECT media_id, width, height,
        |  (width * 224) // greatest(width, height) AS out_w,
        |  (height * 224) // greatest(width, height) AS out_h
        |FROM d ORDER BY media_id""".stripMargin,
    "media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, strlen(text) AS len FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2),
        |d AS (SELECT media_id, CAST(1 + len % 240 AS BIGINT) AS n_frames FROM m),
        |f AS (SELECT media_id, n_frames, unnest(CASE WHEN n_frames <= 4 THEN range(n_frames)
        |       ELSE list_transform(range(4), i -> i * (n_frames - 1) // 3) END) AS frame_idx FROM d)
        |SELECT media_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "media_stats" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(doc_id % 2 AS INTEGER) AS par,
        |  strlen(text) AS len FROM documents),
        |d AS (SELECT kind,
        |  CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
        |             WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS INTEGER) AS width,
        |  CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS INTEGER) AS n_frames FROM m)
        |SELECT kind, count(*) AS n_assets, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  max(width) AS max_width, max(n_frames) AS max_frames
        |FROM d GROUP BY kind ORDER BY kind""".stripMargin,
    // media_dedup: the engine digests real container bytes and groups by
    // md5; the oracle predicts the planted re-upload groups from
    // provenance (doc_id % 9 == 4 ⇒ one byte-identical copy, canonical =
    // the original id). A match proves encoder determinism AND that no
    // unplanned digest collision exists anywhere in the asset universe —
    // any extra or merged group on the Spark side breaks equality.
    // media_files_scan: the oracle reads THE SAME on-disk files the query
    // wrote (read_blob over the fixed staging root) — size, hex-md5 digest
    // and magic-byte container sniff replayed byte for byte.
    "media_files_scan" -> mediaFilesScanSql(),
    // compaction_plan: start-offset binning over the same staged files —
    // read_blob gives (name, size), the window arithmetic is identical.
    // Built from the operator's own constants (staging root, group size)
    // so a parameter change re-derives the oracle instead of silently
    // desynchronizing the gate.
    "compaction_plan" -> compactionPlanSql(),
    "compaction_run" -> compactionRunSql(),
    // stream_quota_ingest: budget consumed in arrival order == doc_id
    // order under bounded replay, so the per-source prefix sum is exact.
    "stream_quota_ingest" ->
      """WITH d AS (SELECT source, doc_id,
        |  CAST(COALESCE(list_sum(list_transform(
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> ''),
        |    w -> ceil(length(w) / 4.0))), 0) AS BIGINT) AS toks FROM documents),
        |c AS (SELECT source, doc_id, toks,
        |  CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM d)
        |SELECT source, doc_id, toks, cum_tokens,
        |  CASE WHEN cum_tokens <= 2000 THEN 1 ELSE 0 END AS accepted
        |FROM c ORDER BY source, doc_id""".stripMargin,
    // stream_kanon: the k-anonymity ingest gate sees cells fill in arrival
    // == doc_id order under bounded replay, so each doc's verdict is the
    // per-cell row_number test — the first k-1 docs of every cell are
    // suppressed (the honest at-ingest trade, modeled here, re-admitted by
    // the batch kanon_suppress pass at publish time).
    "stream_kanon" ->
      s"""WITH d AS (SELECT doc_id, lang, source,
        |  row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS cell_seen
        |  FROM documents)
        |SELECT doc_id, lang, source, CAST(cell_seen AS BIGINT) AS cell_seen,
        |  CASE WHEN cell_seen >= ${graft.streaming.EventStreams.KanonK} THEN 1 ELSE 0 END AS admitted
        |FROM d ORDER BY doc_id""".stripMargin,
    // stream_noised_release: per cell, the cumulative count released with
    // a FRESH seeded noise draw at each epoch the cell received docs —
    // epochs are the doc_id mod-class drop files of the bounded replay,
    // release ordinals number the cell's non-empty epochs consecutively,
    // and the noise replays bit-for-bit with the release ordinal rotated
    // into the hash input (the batch noised_release formula).
    "stream_noised_release" ->
      s"""WITH seg AS (SELECT lang, source,
        |    CAST(doc_id % ${graft.streaming.EventStreams.NoisedReleaseEpochs} AS BIGINT) AS ep
        |  FROM documents),
        |per AS (SELECT lang, source, ep, count(*) AS c FROM seg GROUP BY 1, 2, 3),
        |cum AS (SELECT lang, source, ep,
        |    CAST(sum(c) OVER w AS BIGINT) AS n,
        |    CAST(row_number() OVER w AS BIGINT) AS release_idx
        |  FROM per WINDOW w AS (PARTITION BY lang, source ORDER BY ep)),
        |h AS (SELECT lang, source, release_idx, n,
        |    CAST(md5_number_lower(lang || ':' || source || ':' || CAST(release_idx AS VARCHAR))
        |         % 9223372036854775808 AS BIGINT) AS hv
        |  FROM cum),
        |g AS (SELECT lang, source, release_idx, n,
        |    CASE WHEN (hv & 1) = 1 THEN 1 ELSE -1 END AS s,
        |    LEAST(bit_count(((hv >> 1) & -(hv >> 1)) - 1), ${TextAnalysis.NoisedReleaseCap}) AS mag
        |  FROM h)
        |SELECT lang, source, release_idx,
        |  CAST(GREATEST(n + s * mag, 0) AS BIGINT) AS noisy_n,
        |  CASE WHEN GREATEST(n + s * mag, 0) >= ${TextAnalysis.NoisedReleaseK} THEN 1 ELSE 0 END AS released
        |FROM g ORDER BY lang, source, release_idx""".stripMargin,
    // stream_media_ingest: the same stateless catalog over the DROP
    // staging root (delta shard only) — read_blob replays those files.
    "stream_media_ingest" -> mediaFilesScanSql(graft.multimodal.Media.DropFilesRoot),
    // stream_media_packed: the SAME delta shard as stream_media_ingest,
    // landed as parquet shards — the oracle read_parquets the staged
    // shards themselves, so the check covers the packed bytes on disk.
    "stream_media_packed" ->
      s"""WITH f AS (SELECT media_id, octet_length(payload) AS n_bytes, hex(payload) AS hx
        |           FROM read_parquet('${graft.multimodal.Media.PackedDropRoot}/*.parquet'))
        |SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes, md5(hx) AS content_md5,
        |  CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
        |       WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
        |       WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
        |       ELSE 'unknown' END AS container
        |FROM f ORDER BY media_id""".stripMargin,
    // media_near_dup: full replay of the perceptual metric over the SAME
    // staged bytes — read_blob the near-dup universe, rebuild each file's
    // 32-bin byte histogram by hex-digit extraction (integer counts), block
    // on (container, exact size), and apply the identical integer L1
    // threshold. Nothing is predicted from provenance: if Spark's feature,
    // blocking, or threshold drifted by one byte anywhere, the hash gate
    // reds.
    "media_near_dup" -> nearDupSql(blobFSql(graft.multimodal.Media.NearDupFilesRoot)),
    // media_near_dup_packed: the SAME chain over the parquet-packed
    // universe (one SQL definition site per chain, the encodedDupSql
    // discipline applied family-wide).
    "media_near_dup_packed" -> nearDupSql(parquetFSql(graft.multimodal.Media.PackedNearDupRoot)),
    // media_dup_padded: full metric replay over the padded universe —
    // prefix digest = md5 of the first 512 HEX chars (= 256 bytes, hashed
    // through the hex encoding so no blob slicing is needed), blocking on
    // (container, prefix digest), verify by integer permille-L1 <= 250.
    "media_dup_padded" -> paddedDupSql(blobFSql(graft.multimodal.Media.PaddedFilesRoot)),
    "media_dup_padded_packed" -> paddedDupSql(parquetFSql(graft.multimodal.Media.PackedPaddedRoot)),
    // media_dup_encoded: full metric replay over the re-encoded universe —
    // per-byte md5 hashes → Karp–Rabin 8-byte rolling k-grams →
    // rightmost-min winnow selection (the winnow_fingerprints chain, over
    // BYTES) → hot filter → ≥minShared-fp pair join → same container +
    // permille-L1 verify. Every constant (root, k, w, hot cap, min shared,
    // L1 ceiling) interpolates from the Media definitions; the packed
    // twin swaps only the source CTE (one definition site for the chain).
    "media_dup_encoded" -> encodedDupSql(
      s"""SELECT CAST(regexp_extract(filename, 'asset_(\\d+)\\.bin', 1) AS BIGINT) AS media_id,
        |             octet_length(content) AS n, hex(content) AS hx
        |      FROM read_blob('${graft.multimodal.Media.EncodedFilesRoot}/asset_*.bin')""".stripMargin),
    // media_dup_encoded_packed: the SAME chain over the parquet-packed
    // universe — the oracle reads the staged shards themselves.
    "media_dup_encoded_packed" -> encodedDupSql(
      s"""SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx
        |      FROM read_parquet('${graft.multimodal.Media.PackedEncodedRoot}/*.parquet')""".stripMargin),
    // media_dup_indexed: served from the PERSISTED feature store — the
    // oracle is deliberately the SAME full metric replay over the same
    // staged universe as media_dup_encoded_packed: the store is correct
    // exactly when reading it is indistinguishable from recomputing the
    // features from the bytes, which is what the hash gate proves.
    "media_dup_indexed" -> encodedDupSql(
      s"""SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx
        |      FROM read_parquet('${graft.multimodal.Media.PackedEncodedRoot}/*.parquet')""".stripMargin),
    // media_dup_cycle: build-from-corpus + append-the-drop must be
    // indistinguishable from building over everything — so the oracle is
    // again the full-universe byte replay; the driver hash proves the
    // append path end to end every round.
    "media_dup_cycle" -> encodedDupSql(
      s"""SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx
        |      FROM read_parquet('${graft.multimodal.Media.PackedEncodedRoot}/*.parquet')""".stripMargin),
    // media_near_dup_lsh: full replay of the quantized-projection LSH
    // chain over the same staged shards — byte histograms by hex
    // extraction, integer permille, ±1 signs from md5_number_lower parity
    // (the engine's md5Low64 & 1), width-8 quantized projections, and the
    // neighbor-probe predicate replayed as a per-band max-coordinate-diff
    // ≤ 1 join (structurally different from the engine's packed-key probe
    // join, so the no-carry packing trick is differentially proven).
    // Every constant interpolates from the MediaIndex definitions.
    "media_near_dup_lsh" -> (mediaLshCtes + s"""
        |SELECT d.ida AS canonical_id, d.idb AS dup_id, ca.container, CAST(d.l1p AS BIGINT) AS l1p
        |FROM d JOIN c ca ON ca.media_id = d.ida
        |WHERE d.l1p <= ${graft.multimodal.MediaIndex.MediaLshL1Max}
        |ORDER BY canonical_id, dup_id""".stripMargin),
    // media_lsh_recall: BOTH sides replayed from the staged bytes — truth
    // = exact all-pairs same-container permille-L1 ≤ 32 over the replayed
    // histograms, detected = the LSH chain above; per-class counts with
    // the integer permille and zero-truth guard. The planted row is the
    // catch-window theorem re-proven by the driver hash every round; the
    // loose row moves the measured 0.63 from SURVEY prose into the gate.
    "media_lsh_recall" -> {
      import graft.multimodal.MediaIndex._
      mediaLshCtes + s""",
        |tp AS (SELECT CASE WHEN sum(abs(pa.pm - pb.pm)) <= $MediaLshPlantedL1
        |              THEN 'planted' ELSE 'loose' END AS class
        |       FROM pd pa
        |       JOIN pd pb ON pb.bin = pa.bin AND pa.media_id < pb.media_id
        |       JOIN c ca ON ca.media_id = pa.media_id
        |       JOIN c cb ON cb.media_id = pb.media_id AND cb.container = ca.container
        |       GROUP BY pa.media_id, pb.media_id
        |       HAVING sum(abs(pa.pm - pb.pm)) <= $MediaLshL1Max),
        |tcls AS (SELECT class, CAST(count(*) AS BIGINT) AS n_true FROM tp GROUP BY class),
        |dcls AS (SELECT CASE WHEN l1p <= $MediaLshPlantedL1 THEN 'planted' ELSE 'loose' END AS class,
        |                CAST(count(*) AS BIGINT) AS n_detected
        |         FROM d WHERE l1p <= $MediaLshL1Max GROUP BY 1),
        |cls AS (SELECT unnest(['loose', 'planted']) AS class)
        |SELECT cls.class, COALESCE(tcls.n_true, 0) AS n_true,
        |  COALESCE(dcls.n_detected, 0) AS n_detected,
        |  CASE WHEN COALESCE(tcls.n_true, 0) = 0 THEN CAST(1000 AS BIGINT)
        |       ELSE COALESCE(dcls.n_detected, 0) * 1000 // tcls.n_true END AS recall_permille
        |FROM cls LEFT JOIN tcls ON tcls.class = cls.class
        |LEFT JOIN dcls ON dcls.class = cls.class
        |ORDER BY cls.class""".stripMargin
    },
    // stream_media_dedup: the cross-split byte replay — hot df over the
    // corpus side only, drop × corpus pair join (see crossEncodedDupSql).
    "stream_media_dedup" -> crossEncodedDupSql,
    // media_export / media_release_report: the composed release chain —
    // every gate replayed from the staged bytes (exact digests, all three
    // catcher chains, predicted gate metadata, one-hop takedown closure).
    "media_export" -> (mediaReleaseCtes + """
      |SELECT media_id, kind, n_bytes FROM fl
      |WHERE t = 1 AND e = 1 AND c = 1 AND r = 1
      |ORDER BY media_id""".stripMargin),
    // media_release_cycle: corpus-build + drop-append + pair/label
    // re-derivation must serve EXACTLY the whole-build export — the
    // oracle is media_export's full byte replay verbatim.
    "media_release_cycle" -> (mediaReleaseCtes + """
      |SELECT media_id, kind, n_bytes FROM fl
      |WHERE t = 1 AND e = 1 AND c = 1 AND r = 1
      |ORDER BY media_id""".stripMargin),
    // media_takedown_verify: violations = pairs crossing the removal
    // boundary after the recursive-CTE closure — empty is the theorem
    // component closure proves; the oracle computes it independently.
    "media_takedown_verify" -> (mediaReleaseCtes + """
      |SELECT p.ida AS canonical_id, p.idb AS dup_id
      |FROM apairs p
      |LEFT JOIN rem ra ON ra.media_id = p.ida
      |LEFT JOIN rem rb ON rb.media_id = p.idb
      |WHERE (ra.media_id IS NULL) <> (rb.media_id IS NULL)
      |ORDER BY canonical_id, dup_id""".stripMargin),
    // media_split: per-vertex component labels via a second recursive
    // closure over the same replayed pair graph (min reachable id ∪
    // self), then the 60-bit md5 80/10/10 hash of the label — the
    // leakage_safe_split oracle pattern over the media universe.
    "media_split" -> (mediaReleaseCtes + """,
      |reachL AS (SELECT a AS v, b AS r FROM sym
      |  UNION
      |  SELECT reachL.v, e.b FROM reachL JOIN sym e ON reachL.r = e.a),
      |compL AS (SELECT v, least(v, min(r)) AS cluster FROM reachL GROUP BY v),
      |lblL AS (SELECT f.media_id, COALESCE(c.cluster, f.media_id) AS cluster_id
      |         FROM f LEFT JOIN compL c ON f.media_id = c.v),
      |hs AS (SELECT media_id, cluster_id,
      |        CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS hv
      |       FROM lblL)
      |SELECT media_id, cluster_id,
      |  CASE WHEN hv <= 7 THEN 'train' WHEN hv = 8 THEN 'val' ELSE 'test' END AS split
      |FROM hs ORDER BY media_id""".stripMargin),
    // stream_media_split: the batch split chain restricted to the drop
    // (the packed drop = the corpus's media_id % 10 = 0 base assets) —
    // assignment is a pure function of the persisted labels, so the
    // streamed rows equal the batch rows.
    "stream_media_split" -> (mediaReleaseCtes + """,
      |reachL AS (SELECT a AS v, b AS r FROM sym
      |  UNION
      |  SELECT reachL.v, e.b FROM reachL JOIN sym e ON reachL.r = e.a),
      |compL AS (SELECT v, least(v, min(r)) AS cluster FROM reachL GROUP BY v),
      |lblL AS (SELECT f.media_id, COALESCE(c.cluster, f.media_id) AS cluster_id
      |         FROM f LEFT JOIN compL c ON f.media_id = c.v),
      |hs AS (SELECT media_id, cluster_id,
      |        CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS hv
      |       FROM lblL)
      |SELECT media_id, cluster_id,
      |  CASE WHEN hv <= 7 THEN 'train' WHEN hv = 8 THEN 'val' ELSE 'test' END AS split
      |FROM hs
      |WHERE media_id % 10 = 0 AND media_id <= (SELECT max(doc_id) FROM documents)
      |ORDER BY media_id""".stripMargin),
    "media_release_report" -> (mediaReleaseCtes + """,
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(t) AS BIGINT) AS n1,
      |         CAST(sum(t * e) AS BIGINT) AS n2, CAST(sum(t * e * c) AS BIGINT) AS n3,
      |         CAST(sum(t * e * c * r) AS BIGINT) AS n4 FROM fl)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage_no, 'quality_gate' AS stage, n0 AS n_in,
      |    n0 - n1 AS n_dropped, n1 AS n_out,
      |    CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n0 - n1 AS DOUBLE) / n0, 4) END AS drop_rate FROM ag
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'exact_dedup', n1, n1 - n2, n2,
      |    CASE WHEN n1 = 0 THEN 0.0 ELSE round(CAST(n1 - n2 AS DOUBLE) / n1, 4) END FROM ag
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'copy_catchers', n2, n2 - n3, n3,
      |    CASE WHEN n2 = 0 THEN 0.0 ELSE round(CAST(n2 - n3 AS DOUBLE) / n2, 4) END FROM ag
      |  UNION ALL
      |  SELECT CAST(4 AS BIGINT), 'takedown', n3, n3 - n4, n4,
      |    CASE WHEN n3 = 0 THEN 0.0 ELSE round(CAST(n3 - n4 AS DOUBLE) / n3, 4) END FROM ag
      |) ORDER BY stage_no""".stripMargin),
    "media_dedup" ->
      """WITH m AS (SELECT doc_id AS canonical_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM documents WHERE CAST(doc_id % 9 AS INTEGER) = 4)
        |SELECT canonical_id, kind, CAST(2 AS BIGINT) AS n_copies
        |FROM m ORDER BY canonical_id""".stripMargin,
  )

  /** The composed media-release oracle chain — the full byte replay of
    * every gate over the staged all-copy-class universe: exact digests
    * (`md5(hx)`), the winnow / padded-prefix / histogram-LSH pair chains
    * (same constants as their single-catcher oracles), the quality gate
    * over metadata PREDICTED per copy class from `documents` (the
    * media_filter oracle discipline — including the two AVI header
    * surgeries: a bit-3 flip at absolute byte 64 lands on dwWidth's low
    * byte, so a perturbed AVI decodes width XOR 8; a byte DROPPED at 64
    * shifts the avih tail, so an encoded AVI decodes garbage dims that
    * provably fail the resolution rule — the oracle asserts t = 0 there
    * directly), and the one-hop takedown closure. Ends with
    * `fl(media_id, kind, n_bytes, t, e, c, r)`. */
  private val mediaReleaseCtes: String = {
    import graft.multimodal.MediaIndex._
    import graft.multimodal.Media._
    s"""WITH RECURSIVE f AS (SELECT media_id, kind, octet_length(payload) AS n, hex(payload) AS hx
      |           FROM read_parquet('$PackedReleaseRoot/*.parquet')),
      |c AS (SELECT media_id, n, hx,
      |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
      |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
      |             ELSE 'unknown' END AS container
      |      FROM f),
      |u AS (SELECT media_id, n, hx, unnest(range(0, n)) AS i FROM c),
      |b AS (SELECT media_id, n, i,
      |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
      |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte,
      |        CAST(md5_number_lower(substr(hx, CAST(2*i+1 AS INTEGER), 2)) % 4294967296 AS BIGINT) AS hb
      |      FROM u),
      |hh AS (SELECT media_id, list(hb ORDER BY i) AS hs FROM b GROUP BY media_id),
      |ck AS (SELECT media_id, CASE WHEN len(hs) >= $EncodedWinnowK
      |        THEN list_transform(range(1, len(hs) - ${EncodedWinnowK - 2}), i ->
      |          list_reduce(hs[i:i+${EncodedWinnowK - 1}], (a, bb) -> (a * 1000003 + bb) % 4294967296))
      |        ELSE CAST([] AS BIGINT[]) END AS ch FROM hh),
      |sel AS (SELECT media_id, ch, CASE WHEN len(ch) >= $EncodedWinnowW
      |        THEN list_distinct(list_transform(range(1, len(ch) - ${EncodedWinnowW - 2}), i ->
      |          i + list_max(list_filter(range(0, $EncodedWinnowW), j ->
      |            ch[i+j] = list_min(ch[i:i+${EncodedWinnowW - 1}])))))
      |        ELSE CAST([] AS BIGINT[]) END AS ps FROM ck),
      |wfp AS (SELECT DISTINCT media_id, unnest(list_transform(ps, p -> ch[p])) AS fp FROM sel),
      |whot AS (SELECT fp FROM wfp GROUP BY fp HAVING count(*) <= $EncodedHotCap),
      |wcold AS (SELECT wfp.media_id, wfp.fp FROM wfp JOIN whot USING (fp)),
      |wcand AS (SELECT x.media_id AS ida, y.media_id AS idb
      |          FROM wcold x JOIN wcold y ON x.fp = y.fp AND x.media_id < y.media_id
      |          GROUP BY 1, 2 HAVING count(*) >= $EncodedMinShared),
      |hg AS (SELECT media_id, byte // 8 AS bin, (count(*) * 1000) // min(n) AS pm
      |       FROM b GROUP BY media_id, byte // 8),
      |pd AS (SELECT m.media_id, t.bin, COALESCE(hg.pm, 0) AS pm
      |       FROM (SELECT media_id FROM c) m CROSS JOIN range(32) t(bin)
      |       LEFT JOIN hg ON hg.media_id = m.media_id AND hg.bin = t.bin),
      |wd AS (SELECT wcand.ida, wcand.idb, sum(abs(pa.pm - pb.pm)) AS l1p
      |       FROM wcand JOIN pd pa ON pa.media_id = wcand.ida
      |       JOIN pd pb ON pb.media_id = wcand.idb AND pb.bin = pa.bin
      |       GROUP BY 1, 2),
      |wpairs AS (SELECT wd.ida, wd.idb FROM wd
      |           JOIN c ca ON ca.media_id = wd.ida JOIN c cb ON cb.media_id = wd.idb
      |           WHERE ca.container = cb.container AND wd.l1p <= $PermilleL1Max),
      |cp AS (SELECT media_id, container, md5(substr(hx, 1, 512)) AS pmd5 FROM c),
      |ppr AS (SELECT a.media_id AS ida, b2.media_id AS idb
      |        FROM cp a JOIN cp b2 ON a.container = b2.container
      |          AND a.pmd5 = b2.pmd5 AND a.media_id < b2.media_id),
      |ppd AS (SELECT ppr.ida, ppr.idb, sum(abs(pa.pm - pb.pm)) AS l1p
      |        FROM ppr JOIN pd pa ON pa.media_id = ppr.ida
      |        JOIN pd pb ON pb.media_id = ppr.idb AND pb.bin = pa.bin
      |        GROUP BY 1, 2),
      |ppairs AS (SELECT ida, idb FROM ppd WHERE l1p <= $PermilleL1Max),
      |r AS (SELECT j, bin,
      |        CASE WHEN md5_number_lower('$MediaLshSeed' || j || '_' || bin) % 2 = 0 THEN 1 ELSE -1 END AS rv
      |      FROM range($MediaLshBands * $MediaLshProj) tj(j) CROSS JOIN range(32) tb(bin)),
      |q AS (SELECT pd.media_id, r.j,
      |        (sum(r.rv * pd.pm) + $MediaLshOffset) // $MediaLshW AS qv
      |      FROM pd JOIN r ON r.bin = pd.bin GROUP BY 1, 2),
      |qd AS (SELECT a.media_id AS ida, b2.media_id AS idb,
      |         a.j // $MediaLshProj AS band, max(abs(a.qv - b2.qv)) AS md
      |       FROM q a JOIN q b2 ON a.j = b2.j AND a.media_id < b2.media_id
      |       GROUP BY 1, 2, 3),
      |lcand AS (SELECT DISTINCT qd.ida, qd.idb
      |          FROM qd JOIN c ca ON ca.media_id = qd.ida
      |          JOIN c cb ON cb.media_id = qd.idb
      |          WHERE qd.md <= 1 AND ca.container = cb.container),
      |ld AS (SELECT lcand.ida, lcand.idb, sum(abs(pa.pm - pb.pm)) AS l1p
      |       FROM lcand JOIN pd pa ON pa.media_id = lcand.ida
      |       JOIN pd pb ON pb.media_id = lcand.idb AND pb.bin = pa.bin
      |       GROUP BY 1, 2),
      |lpairs AS (SELECT ida, idb FROM ld WHERE l1p <= $MediaLshL1Max),
      |ex AS (SELECT media_id, md5(hx) AS sig FROM f),
      |keepx AS (SELECT sig, min(media_id) AS keep_id FROM ex GROUP BY sig),
      |epairs AS (SELECT keepx.keep_id AS ida, ex.media_id AS idb
      |           FROM ex JOIN keepx USING (sig) WHERE ex.media_id <> keepx.keep_id),
      |cpairs AS (SELECT ida, idb FROM wpairs UNION SELECT ida, idb FROM ppairs
      |           UNION SELECT ida, idb FROM lpairs),
      |apairs AS (SELECT ida, idb FROM cpairs UNION SELECT ida, idb FROM epairs),
      |mxo AS (SELECT max(doc_id) + 1 AS off FROM documents),
      |bm AS (SELECT doc_id, kind, len,
      |    CAST(len + CASE WHEN kind = 'image' THEN CASE WHEN par = 0 THEN 57 ELSE 41 END
      |               WHEN kind = 'audio' THEN 44 ELSE 100 END AS BIGINT) AS n0,
      |    CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 7) % 1216 END AS BIGINT) AS w0,
      |    CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (len * 13) % 656 END AS BIGINT) AS h0,
      |    CAST(CASE WHEN kind = 'image' THEN 1 WHEN kind = 'audio' THEN len ELSE 1 + len % 240 END AS BIGINT) AS f0
      |  FROM (SELECT doc_id,
      |          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |          CAST(doc_id % 2 AS INTEGER) AS par, strlen(text) AS len FROM documents)),
      |uni AS (
      |  SELECT doc_id AS media_id, kind, n0 AS nb, w0 AS w, h0 AS h, f0 AS fr, 0 AS broken FROM bm
      |  UNION ALL
      |  SELECT doc_id + off, kind, n0, w0, h0, f0, 0 FROM bm, mxo WHERE doc_id % 9 = 4
      |  UNION ALL
      |  SELECT doc_id + 2 * off, kind, n0,
      |    CASE WHEN kind = 'video' AND n0 >= 256 THEN xor(w0, 8) ELSE w0 END, h0, f0, 0
      |  FROM bm, mxo WHERE doc_id % 13 = 6
      |  UNION ALL
      |  SELECT doc_id + 3 * off, kind,
      |    CASE WHEN n0 >= 512 THEN n0 + 37 ELSE n0 END, w0, h0, f0, 0
      |  FROM bm, mxo WHERE doc_id % 13 = 8
      |  UNION ALL
      |  SELECT doc_id + 4 * off, kind,
      |    CASE WHEN n0 >= 512 THEN n0 - ((n0 - 65) // 101 + 1) ELSE n0 END, w0, h0, f0,
      |    CASE WHEN kind = 'video' AND n0 >= 512 THEN 1 ELSE 0 END
      |  FROM bm, mxo WHERE doc_id % 13 = 11),
      |gat AS (SELECT media_id, kind, nb AS n_bytes,
      |    CASE WHEN broken = 1 THEN 0 ELSE
      |      (CASE WHEN kind <> 'audio' THEN CASE WHEN w >= 128 AND h >= 128 THEN 1 ELSE 0 END
      |            ELSE CASE WHEN fr >= 300 THEN 1 ELSE 0 END END)
      |      * (CASE WHEN kind <> 'audio' THEN CASE WHEN greatest(w, h) <= least(w, h) * 3 THEN 1 ELSE 0 END
      |              ELSE 1 END)
      |      * (CASE WHEN nb >= 256 THEN 1 ELSE 0 END) END AS t
      |  FROM uni),
      |req AS (SELECT media_id FROM f WHERE media_id % $TakedownMod = $TakedownRes),
      |sym AS (SELECT ida AS a, idb AS b FROM apairs UNION SELECT idb, ida FROM apairs),
      |reach AS (SELECT media_id AS v FROM req
      |          UNION
      |          SELECT sym.b FROM reach JOIN sym ON sym.a = reach.v),
      |rem AS (SELECT v AS media_id FROM reach),
      |cdp AS (SELECT DISTINCT idb AS media_id FROM cpairs),
      |fl AS (SELECT g.media_id, g.kind, g.n_bytes, g.t,
      |        CASE WHEN ex.media_id = keepx.keep_id THEN 1 ELSE 0 END AS e,
      |        CASE WHEN cdp.media_id IS NULL THEN 1 ELSE 0 END AS c,
      |        CASE WHEN rem.media_id IS NULL THEN 1 ELSE 0 END AS r
      |       FROM gat g
      |       JOIN ex ON ex.media_id = g.media_id
      |       JOIN keepx ON keepx.sig = ex.sig
      |       LEFT JOIN cdp ON cdp.media_id = g.media_id
      |       LEFT JOIN rem ON rem.media_id = g.media_id)""".stripMargin
  }

  /** File-grain source CTE: read_blob over a staged asset root. */
  private def blobFSql(root: String): String =
    s"""SELECT CAST(regexp_extract(filename, 'asset_(\\d+)\\.bin', 1) AS BIGINT) AS media_id,
      |             octet_length(content) AS n, hex(content) AS hx
      |      FROM read_blob('$root/asset_*.bin')""".stripMargin

  /** Packed-grain source CTE: read_parquet over the staged shards. */
  private def parquetFSql(root: String): String =
    s"""SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx
      |      FROM read_parquet('$root/*.parquet')""".stripMargin

  /** The quantized-projection LSH oracle chain through the verified pair
    * CTE `d` — shared by `media_near_dup_lsh` (pair listing) and
    * `media_lsh_recall` (per-class accounting against the exact all-pairs
    * truth), one SQL definition site: byte histograms by hex extraction
    * (`pd`), ±1 signs from md5_number_lower parity, width-8 quantized
    * projections (`q`), the neighbor-probe predicate as a per-band
    * max-coordinate-diff ≤ 1 join (`cand` — structurally different from
    * the engine's packed-key probe join, so the no-carry packing trick is
    * differentially proven), and candidate L1 verification (`d`). */
  private def mediaLshCtes: String = {
    import graft.multimodal.MediaIndex._
    s"""WITH f AS (SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx
      |           FROM read_parquet('${graft.multimodal.Media.PackedEncodedRoot}/*.parquet')),
      |c AS (SELECT media_id, n, hx,
      |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
      |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
      |             ELSE 'unknown' END AS container
      |      FROM f),
      |u AS (SELECT media_id, hx, n, unnest(range(0, n)) AS i FROM c),
      |b AS (SELECT media_id, n,
      |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
      |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte
      |      FROM u),
      |h AS (SELECT media_id, byte // 8 AS bin, (count(*) * 1000) // min(n) AS pm
      |      FROM b GROUP BY media_id, byte // 8),
      |pd AS (SELECT m.media_id, t.bin, COALESCE(h.pm, 0) AS pm
      |       FROM (SELECT media_id FROM c) m CROSS JOIN range(32) t(bin)
      |       LEFT JOIN h ON h.media_id = m.media_id AND h.bin = t.bin),
      |r AS (SELECT j, bin,
      |        CASE WHEN md5_number_lower('$MediaLshSeed' || j || '_' || bin) % 2 = 0 THEN 1 ELSE -1 END AS rv
      |      FROM range($MediaLshBands * $MediaLshProj) tj(j) CROSS JOIN range(32) tb(bin)),
      |q AS (SELECT pd.media_id, r.j,
      |        (sum(r.rv * pd.pm) + $MediaLshOffset) // $MediaLshW AS qv
      |      FROM pd JOIN r ON r.bin = pd.bin GROUP BY 1, 2),
      |qd AS (SELECT a.media_id AS ida, b2.media_id AS idb,
      |         a.j // $MediaLshProj AS band, max(abs(a.qv - b2.qv)) AS md
      |       FROM q a JOIN q b2 ON a.j = b2.j AND a.media_id < b2.media_id
      |       GROUP BY 1, 2, 3),
      |cand AS (SELECT DISTINCT qd.ida, qd.idb
      |         FROM qd JOIN c ca ON ca.media_id = qd.ida
      |         JOIN c cb ON cb.media_id = qd.idb
      |         WHERE qd.md <= 1 AND ca.container = cb.container),
      |d AS (SELECT cand.ida, cand.idb, sum(abs(pa.pm - pb.pm)) AS l1p
      |      FROM cand JOIN pd pa ON pa.media_id = cand.ida
      |      JOIN pd pb ON pb.media_id = cand.idb AND pb.bin = pa.bin
      |      GROUP BY 1, 2)""".stripMargin
  }

  /** The `media_near_dup` oracle chain, parameterized on the source CTE
    * (one SQL definition site; the packed twin swaps only the source). */
  private def nearDupSql(fSql: String): String =
    s"""WITH f AS ($fSql),
      |c AS (SELECT media_id, n, hx,
        |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
        |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
        |             ELSE 'unknown' END AS container
        |      FROM f),
        |u AS (SELECT media_id, hx, unnest(range(0, n)) AS i FROM c),
        |b AS (SELECT media_id,
        |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
        |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte
        |      FROM u),
        |h AS (SELECT media_id, byte // 8 AS bin, count(*) AS cnt FROM b GROUP BY media_id, byte // 8),
        |p AS (SELECT a.media_id AS ida, b2.media_id AS idb, a.container, a.n
        |      FROM c a JOIN c b2 ON a.container = b2.container AND a.n = b2.n AND a.media_id < b2.media_id),
        |d AS (SELECT p.ida, p.idb, p.container, p.n,
        |        COALESCE(sum(abs(COALESCE(ha.cnt, 0) - COALESCE(hb.cnt, 0))), 0) AS l1
        |      FROM p CROSS JOIN range(32) t(bin)
        |      LEFT JOIN h ha ON ha.media_id = p.ida AND ha.bin = t.bin
        |      LEFT JOIN h hb ON hb.media_id = p.idb AND hb.bin = t.bin
        |      GROUP BY p.ida, p.idb, p.container, p.n)
        |SELECT ida AS canonical_id, idb AS dup_id, container, CAST(l1 AS BIGINT) AS l1
        |FROM d WHERE l1 * 64 <= n
        |ORDER BY canonical_id, dup_id""".stripMargin

  /** The `media_dup_padded` oracle chain, parameterized on the source CTE. */
  private def paddedDupSql(fSql: String): String =
    s"""WITH f AS ($fSql),
        |c AS (SELECT media_id, n, hx, md5(substr(hx, 1, 512)) AS pmd5,
        |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
        |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
        |             ELSE 'unknown' END AS container
        |      FROM f),
        |u AS (SELECT media_id, hx, unnest(range(0, n)) AS i FROM c),
        |b AS (SELECT media_id,
        |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
        |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte
        |      FROM u),
        |h AS (SELECT media_id, byte // 8 AS bin, count(*) AS cnt FROM b GROUP BY media_id, byte // 8),
        |p AS (SELECT h.media_id, h.bin, (h.cnt * 1000) // c.n AS pm FROM h JOIN c USING (media_id)),
        |pr AS (SELECT a.media_id AS ida, b2.media_id AS idb, a.container
        |       FROM c a JOIN c b2 ON a.container = b2.container
        |         AND a.pmd5 = b2.pmd5 AND a.media_id < b2.media_id),
        |d AS (SELECT pr.ida, pr.idb, pr.container,
        |        COALESCE(sum(abs(COALESCE(pa.pm, 0) - COALESCE(pb.pm, 0))), 0) AS l1p
        |      FROM pr CROSS JOIN range(32) t(bin)
        |      LEFT JOIN p pa ON pa.media_id = pr.ida AND pa.bin = t.bin
        |      LEFT JOIN p pb ON pb.media_id = pr.idb AND pb.bin = t.bin
        |      GROUP BY pr.ida, pr.idb, pr.container)
        |SELECT ida AS canonical_id, idb AS dup_id, container, CAST(l1p AS BIGINT) AS l1p
        |FROM d WHERE l1p <= ${graft.multimodal.Media.PermilleL1Max}
        |ORDER BY canonical_id, dup_id""".stripMargin

  /** The `stream_media_dedup` oracle: the [[encodedDupSql]] byte-winnow
    * chain over the UNION of both staged sides with a `side` tag — the
    * hot-fp document frequency counted over the CORPUS side only (the
    * declared streaming split: a stream cannot know global df) and the
    * pair join restricted to drop × corpus. Same constants, same staged
    * bytes, least/greatest id ordering on output. */
  private def crossEncodedDupSql: String =
    s"""WITH f AS (
      |  SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx, 'drop' AS side
      |  FROM read_parquet('${graft.multimodal.Media.PackedEncodedDropRoot}/*.parquet')
      |  UNION ALL
      |  SELECT media_id, octet_length(payload) AS n, hex(payload) AS hx, 'corp' AS side
      |  FROM read_parquet('${graft.multimodal.Media.PackedEncodedRoot}/*.parquet')
      |  WHERE media_id % 10 <> 0),
      |c AS (SELECT media_id, n, hx, side,
      |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
      |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
      |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
      |             ELSE 'unknown' END AS container
      |      FROM f),
      |u AS (SELECT media_id, n, hx, unnest(range(0, n)) AS i FROM c),
      |b AS (SELECT media_id, n, i,
      |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
      |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte,
      |        CAST(md5_number_lower(substr(hx, CAST(2*i+1 AS INTEGER), 2)) % 4294967296 AS BIGINT) AS hb
      |      FROM u),
      |hh AS (SELECT media_id, list(hb ORDER BY i) AS hs FROM b GROUP BY media_id),
      |ck AS (SELECT media_id, CASE WHEN len(hs) >= ${graft.multimodal.Media.EncodedWinnowK}
      |        THEN list_transform(range(1, len(hs) - ${graft.multimodal.Media.EncodedWinnowK - 2}), i ->
      |          list_reduce(hs[i:i+${graft.multimodal.Media.EncodedWinnowK - 1}], (a, bb) -> (a * 1000003 + bb) % 4294967296))
      |        ELSE CAST([] AS BIGINT[]) END AS ch FROM hh),
      |sel AS (SELECT media_id, ch, CASE WHEN len(ch) >= ${graft.multimodal.Media.EncodedWinnowW}
      |        THEN list_distinct(list_transform(range(1, len(ch) - ${graft.multimodal.Media.EncodedWinnowW - 2}), i ->
      |          i + list_max(list_filter(range(0, ${graft.multimodal.Media.EncodedWinnowW}), j ->
      |            ch[i+j] = list_min(ch[i:i+${graft.multimodal.Media.EncodedWinnowW - 1}])))))
      |        ELSE CAST([] AS BIGINT[]) END AS ps FROM ck),
      |fp AS (SELECT DISTINCT sel.media_id, unnest(list_transform(ps, p -> ch[p])) AS fp, c.side
      |       FROM sel JOIN c ON c.media_id = sel.media_id),
      |keep AS (SELECT fp FROM fp WHERE side = 'corp' GROUP BY fp
      |         HAVING count(*) <= ${graft.multimodal.Media.EncodedHotCap}),
      |cold AS (SELECT fp.media_id, fp.fp, fp.side FROM fp JOIN keep USING (fp)),
      |cand AS (SELECT x.media_id AS did, y.media_id AS sid, CAST(count(*) AS BIGINT) AS n_shared
      |         FROM cold x JOIN cold y ON x.fp = y.fp AND x.side = 'drop' AND y.side = 'corp'
      |         GROUP BY 1, 2 HAVING count(*) >= ${graft.multimodal.Media.EncodedMinShared}),
      |hg AS (SELECT media_id, byte // 8 AS bin, (count(*) * 1000) // min(n) AS pm
      |       FROM b GROUP BY media_id, byte // 8),
      |d AS (SELECT cand.did, cand.sid, cand.n_shared,
      |        COALESCE(sum(abs(COALESCE(pa.pm, 0) - COALESCE(pb.pm, 0))), 0) AS l1p
      |      FROM cand CROSS JOIN range(32) t(bin)
      |      LEFT JOIN hg pa ON pa.media_id = cand.did AND pa.bin = t.bin
      |      LEFT JOIN hg pb ON pb.media_id = cand.sid AND pb.bin = t.bin
      |      GROUP BY 1, 2, 3)
      |SELECT least(d.did, d.sid) AS canonical_id, greatest(d.did, d.sid) AS dup_id,
      |       ca.container, d.n_shared, CAST(d.l1p AS BIGINT) AS l1p
      |FROM d JOIN c ca ON ca.media_id = d.did JOIN c cb ON cb.media_id = d.sid
      |WHERE ca.container = cb.container AND d.l1p <= ${graft.multimodal.Media.PermilleL1Max}
      |ORDER BY canonical_id, dup_id""".stripMargin

  /** The `media_dup_encoded` oracle chain, parameterized on the source CTE
    * (file-grain `read_blob` vs packed `read_parquet`) — the
    * compactionPlanSql desync-proofing pattern: the byte-winnow replay has
    * exactly one SQL definition site. */
  private def encodedDupSql(fSql: String): String =
      s"""WITH f AS ($fSql),
        |c AS (SELECT media_id, n, hx,
        |        CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
        |             WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
        |             WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
        |             ELSE 'unknown' END AS container
        |      FROM f),
        |u AS (SELECT media_id, n, hx, unnest(range(0, n)) AS i FROM c),
        |b AS (SELECT media_id, n, i,
        |        (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
        |        + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1 AS byte,
        |        CAST(md5_number_lower(substr(hx, CAST(2*i+1 AS INTEGER), 2)) % 4294967296 AS BIGINT) AS hb
        |      FROM u),
        |hh AS (SELECT media_id, list(hb ORDER BY i) AS hs FROM b GROUP BY media_id),
        |ck AS (SELECT media_id, CASE WHEN len(hs) >= ${graft.multimodal.Media.EncodedWinnowK}
        |        THEN list_transform(range(1, len(hs) - ${graft.multimodal.Media.EncodedWinnowK - 2}), i ->
        |          list_reduce(hs[i:i+${graft.multimodal.Media.EncodedWinnowK - 1}], (a, bb) -> (a * 1000003 + bb) % 4294967296))
        |        ELSE CAST([] AS BIGINT[]) END AS ch FROM hh),
        |sel AS (SELECT media_id, ch, CASE WHEN len(ch) >= ${graft.multimodal.Media.EncodedWinnowW}
        |        THEN list_distinct(list_transform(range(1, len(ch) - ${graft.multimodal.Media.EncodedWinnowW - 2}), i ->
        |          i + list_max(list_filter(range(0, ${graft.multimodal.Media.EncodedWinnowW}), j ->
        |            ch[i+j] = list_min(ch[i:i+${graft.multimodal.Media.EncodedWinnowW - 1}])))))
        |        ELSE CAST([] AS BIGINT[]) END AS ps FROM ck),
        |fp AS (SELECT DISTINCT media_id, unnest(list_transform(ps, p -> ch[p])) AS fp FROM sel),
        |hot AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= ${graft.multimodal.Media.EncodedHotCap}),
        |cold AS (SELECT fp.media_id, fp.fp FROM fp JOIN hot USING (fp)),
        |cand AS (SELECT x.media_id AS ida, y.media_id AS idb, CAST(count(*) AS BIGINT) AS n_shared
        |         FROM cold x JOIN cold y ON x.fp = y.fp AND x.media_id < y.media_id
        |         GROUP BY 1, 2 HAVING count(*) >= ${graft.multimodal.Media.EncodedMinShared}),
        |hg AS (SELECT media_id, byte // 8 AS bin, (count(*) * 1000) // min(n) AS pm
        |       FROM b GROUP BY media_id, byte // 8),
        |d AS (SELECT cand.ida, cand.idb, cand.n_shared,
        |        COALESCE(sum(abs(COALESCE(pa.pm, 0) - COALESCE(pb.pm, 0))), 0) AS l1p
        |      FROM cand CROSS JOIN range(32) t(bin)
        |      LEFT JOIN hg pa ON pa.media_id = cand.ida AND pa.bin = t.bin
        |      LEFT JOIN hg pb ON pb.media_id = cand.idb AND pb.bin = t.bin
        |      GROUP BY 1, 2, 3)
        |SELECT d.ida AS canonical_id, d.idb AS dup_id, ca.container, d.n_shared,
        |       CAST(d.l1p AS BIGINT) AS l1p
        |FROM d JOIN c ca ON ca.media_id = d.ida JOIN c cb ON cb.media_id = d.idb
        |WHERE ca.container = cb.container AND d.l1p <= ${graft.multimodal.Media.PermilleL1Max}
        |ORDER BY canonical_id, dup_id""".stripMargin
}
