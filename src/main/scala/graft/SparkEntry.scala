package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the training-data
  * additions) is a named batch query here; each name with an `oracleSql`
  * entry is hash-checked against DuckDB on the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `/series` avg query (SURVEY §7 phase 0): one real aggregation
    * end-to-end over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    SeriesOps.seriesAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 A3 + §2.3 P5/P6 — read-API /series surface
    "series_avg" -> (SeriesOps.seriesAvg _),
    "series_sum" -> (SeriesOps.seriesSum _),
    "series_count" -> (SeriesOps.seriesCount _),
    "series_p95" -> (SeriesOps.seriesP95 _),
    "series_filtered" -> (SeriesOps.seriesFiltered _),
    "series_ewma" -> (SeriesOps.seriesEwma _),
    // T-series legs via ACTUAL writeStream drains under the hash gate
    "stream_ewma_drain" -> (graft.streaming.StreamDrain.streamEwmaDrain _),
    // the same order-DEPENDENT fold fed micro-batches whose files store
    // rows OUT of event-time order (in-batch shuffle staging): gates the
    // processors' within-trigger sort, previously spec-pinned only
    "stream_shuffled_ewma_drain" ->
      (graft.streaming.StreamDrain.streamShuffledEwmaDrain _),
    "stream_cusum_drain" -> (graft.streaming.StreamDrain.streamCusumDrain _),
    "mad_over_frame" -> (SeriesOps.madOverFrame _),
    "robust_stats" -> (SeriesOps.robustStats _),
    "trend_ols" -> (SeriesOps.trendOls _),
    "drift_tv" -> (SeriesOps.driftTv _),
    "l_diversity" -> (PrivacyOps.lDiversity _),
    "t_closeness" -> (PrivacyOps.tCloseness _),
    // §2.4 A1/A2, §2.5 W1, §2.6 O1 — windowed KPIs
    "kpi_tumbling" -> ((s, d) => KpiOps.kpiTumbling(s, d)),
    "kpi_sliding" -> (KpiOps.kpiSliding _),
    "kpi_sliding_paned" -> (KpiOps.kpiSlidingPaned _),
    // §2.5 W1 via an ACTUAL writeStream drain (T1/T2/K5 machinery under
    // the DuckDB hash gate, not just the batch twin)
    "stream_kpi_drain" -> (graft.streaming.StreamDrain.streamKpiDrain _),
    // T2 late-data DROP itself under the gate: planted provably-late
    // rows (absent from the oracle) must be watermark-dropped
    "stream_late_drop_drain" ->
      (graft.streaming.StreamDrain.streamLateDropDrain _),
    // T1's ADMISSIBLE side under the gate: rows arriving one micro-batch
    // late but within the 10 s watermark must merge into open panes
    "stream_ooo_kpi_drain" ->
      (graft.streaming.StreamDrain.streamOooKpiDrain _),
    "kpi_lookup" -> ((s, d) => KpiOps.kpiLookup(s, d)),
    "kpi_lookup_5m" -> (KpiOps.kpiLookup5m _),
    "kpi_udaf_p95" -> (KpiOps.kpiUdafP95 _),
    // §2.4 A6-A8, §2.7 T4-T9 — anomaly detection (batch analog)
    "anomaly_score" -> (AnomalyOps.anomalyScore _),
    "anomaly_score_window" -> (AnomalyOps.anomalyScoreWindow _),
    "anomaly_alerts" -> (AnomalyOps.anomalyAlerts _),
    // §2.7 T3-T9 via an ACTUAL flatMapGroupsWithState writeStream drain
    "stream_alerts_drain" -> (graft.streaming.StreamDrain.streamAlertsDrain _),
    // the ListState-buffered detector (third parity form) drained
    "stream_alerts_list_drain" ->
      (graft.streaming.StreamDrain.streamAlertsListDrain _),
    // the detector over the in-batch shuffle staging: one transposed
    // pair scores two events against wrong rings, so the unchanged
    // oracle gates the within-trigger sort for the flagship job
    "stream_shuffled_alerts_drain" ->
      (graft.streaming.StreamDrain.streamShuffledAlertsDrain _),
    "anomaly_regions" -> (AnomalyOps.anomalyRegions _),
    "alerts_filter" -> (AnomalyOps.alertsFilter _),
    "alerts_stats" -> (AnomalyOps.alertsStats _),
    "alert_cooldown" -> (AnomalyOps.alertCooldown _),
    // EXACT chained cooldown (gap since last FIRED, the true reference
    // semantics): batch aggregate()-fold form, plus the SAME gate through
    // actual writeStream drains — the fMGWS processor and the
    // transformWithState + event-time-timer form, each folding keyed
    // state across >=3 micro-batches against the shared fold oracle
    "alert_cooldown_chained" -> (AnomalyOps.alertCooldownChained _),
    "stream_cooldown_drain" ->
      (graft.streaming.StreamDrain.streamCooldownDrain _),
    "stream_cooldown_timer_drain" ->
      (graft.streaming.StreamDrain.streamCooldownTimerDrain _),
    // the full detector->cooldown->rule-routing topology in ONE drained
    // streaming execution (the reference's notification path)
    "stream_routed_drain" ->
      (graft.streaming.StreamDrain.streamRoutedDrain _),
    // the SAME topology fused into one keyed stage (detector + cooldown
    // in a single flatMapGroupsWithState over raw events) — the
    // low-latency single-query form, gated on the identical oracle
    "stream_fused_routed_drain" ->
      (graft.streaming.StreamDrain.streamFusedRoutedDrain _),
    "alert_routing" -> (AnomalyOps.alertRouting _),
    "detector_agreement" -> (AnomalyOps.detectorAgreement _),
    "order_backlog" -> (OlapOps.orderBacklog _),
    "events_last_hour" -> (AnomalyOps.eventsLastHour _),
    // §2.3 P1/P2, §2.8 F6/F7/F11 — parse/serialize
    "event_parse_json" -> (MiscOps.eventParseJson _),
    "event_nested_parse" -> (MiscOps.eventNestedParse _),
    // Spark 4 VARIANT: heterogeneous payloads through parse_json ->
    // variant_get, gated against a json-free source-formula oracle
    "event_variant" -> (MiscOps.eventVariant _),
    "event_json_envelope" -> (MiscOps.eventJsonEnvelope _),
    "events_dedup" -> (MiscOps.eventsDedup _),
    // K5 exactly-once dedup guard via an ACTUAL writeStream drain fed
    // real duplicates (dropDuplicatesWithinWatermark under the hash gate)
    "stream_dedup_drain" -> (graft.streaming.StreamDrain.streamDedupDrain _),
    // the streaming corpus-ingest dedup (first occurrence per content
    // hash across batches) vs the batch canonical-survivor oracle
    "stream_docdedup_drain" ->
      (graft.streaming.StreamDrain.streamDocDedupDrain _),
    // keyed transition pairing, MapState drift histogram, and the
    // incremental per-user view — each through an ACTUAL writeStream drain
    "stream_transitions_drain" ->
      (graft.streaming.StreamDrain.streamTransitionsDrain _),
    // the transition pairing over the in-batch shuffle staging: a
    // mis-ordered pair emits a WRONG (prev, next) edge, so this gates
    // the within-trigger sort for the record-shaped state family
    "stream_shuffled_transitions_drain" ->
      (graft.streaming.StreamDrain.streamShuffledTransitionsDrain _),
    "stream_drift_drain" -> (graft.streaming.StreamDrain.streamDriftDrain _),
    "stream_snapshot_drain" ->
      (graft.streaming.StreamDrain.streamSnapshotDrain _),
    // the same keyed state extended by admissible-late rows arriving a
    // micro-batch behind their event-time peers (OOO staging)
    "stream_ooo_snapshot_drain" ->
      (graft.streaming.StreamDrain.streamOooSnapshotDrain _),
    // checkpoint KILL-AND-RESUME: pass 1 drains half the chunks and
    // stops; pass 2 starts a NEW query on the SAME checkpoint over the
    // late-arriving rest — restored+extended state vs the full oracle
    "stream_restart_drain" ->
      (graft.streaming.StreamDrain.streamRestartDrain _),
    // DIRTY restart: the query is killed AFTER a batch's sink write but
    // BEFORE its checkpoint commit; the resumed query re-executes that
    // batch id and the idempotent per-batch-dir sink must REPLACE the
    // orphaned output — the exactly-once face clean stops never exercise
    "stream_dirty_restart_drain" ->
      (graft.streaming.StreamDrain.streamDirtyRestartDrain _),
    // the same dirty-restart window for the transformWithState family:
    // the crashed attempt already committed state version 2, so the
    // re-executed batch must ROLL the store BACK to version 1 and
    // refold — the RocksDB version-rollback face of re-execution
    "stream_dirty_restart_snapshot_drain" ->
      (graft.streaming.StreamDrain.streamDirtySnapshotDrain _),
    // the same crash window for the SESSION-WINDOW family: the
    // re-executed batch must re-MERGE the restored open session that
    // provably straddles the data-derived crash batch
    "stream_dirty_restart_session_drain" ->
      (graft.streaming.StreamDrain.streamDirtySessionDrain _),
    // and for the STREAM-STREAM JOIN family: the crashed attempt already
    // committed join-buffer version 2, so the re-run must roll BOTH
    // symmetric buffers back and re-derive its matches exactly once
    "stream_dirty_restart_join_drain" ->
      (graft.streaming.StreamDrain.streamDirtyJoinDrain _),
    // the same kill-and-resume for the WINDOWED-AGGREGATION state
    // family: panes persisted with partial sums across the stop must
    // restore (with the watermark) and finish exact
    "stream_restart_kpi_drain" ->
      (graft.streaming.StreamDrain.streamRestartKpiDrain _),
    // and for the SESSION-WINDOW family: a session provably straddling
    // a data-derived cut must merge its restored open state with
    // post-restart events
    "stream_restart_session_drain" ->
      (graft.streaming.StreamDrain.streamRestartSessionDrain _),
    // and for the STREAM-STREAM JOIN family: an unmatched click in
    // restored join state must match its post-restart purchase
    "stream_restart_join_drain" ->
      (graft.streaming.StreamDrain.streamRestartJoinDrain _),
    // batch->streaming state MIGRATION: seed from a first-half batch
    // snapshot, stream the delta, merged view vs full-aggregate oracle
    "stream_warmstart_drain" ->
      (graft.streaming.StreamDrain.streamWarmstartDrain _),
    // the windowed-funnel fold (uncapped O(1)-state streaming form)
    // through an ACTUAL writeStream drain vs the batch histogram oracle
    "stream_funnel_drain" ->
      (graft.streaming.StreamDrain.streamFunnelDrain _),
    // Spark 4 statestore reader: keyed state read DIRECTLY from the
    // drained checkpoint's RocksDB store, vs the from-scratch oracle
    "stream_state_reader" ->
      (graft.streaming.StreamDrain.streamStateReaderDrain _),
    // the per-day HLL sketch fold through an ACTUAL writeStream drain:
    // exact cumulative counts hash-gated, the estimate self-gated
    "stream_hll_drain" -> (graft.streaming.StreamDrain.streamHllDrain _),
    // the Misra-Gries heavy-hitter fold through an ACTUAL writeStream
    // drain: provably exact at k=64 > corpus vocab, hash-gated
    "stream_toptokens_drain" ->
      (graft.streaming.StreamDrain.streamTopTokensDrain _),
    // ONLINE near-dup ingest: the LSH bucket stage through keyed
    // streaming state, sharing the batch dedup_minhash_lsh oracle
    "stream_lshdedup_drain" ->
      (graft.streaming.StreamDrain.streamLshDedupDrain _),
    "distinct_users" -> (MiscOps.distinctUsers _),
    "approx_distinct_users" -> (MiscOps.approxDistinctUsers _),
    "approx_p95_gated" -> (MiscOps.approxP95Gated _),
    "hll_by_day" -> (MiscOps.hllByDay _),
    "kll_by_day" -> (MiscOps.kllByDay _),
    "theta_overlap" -> (MiscOps.thetaOverlap _),
    // temporal operators (additive: sessionization, as-of, range join)
    "sessionize" -> (TemporalOps.sessionize _),
    // gap sessionization via ACTUAL append-mode writeStream drains:
    // session_window state merges, and transformWithState + event-time
    // timers — both under the hash gate against the batch oracle
    "stream_session_drain" -> (graft.streaming.StreamDrain.streamSessionDrain _),
    "stream_session_timer_drain" ->
      (graft.streaming.StreamDrain.streamSessionTimerDrain _),
    // mid-stream statestore time travel: the session store AS OF batch
    // 1, open sessions gated against a time-sliced + watermark-evicted
    // batch oracle — the mid-incident state-debugging surface
    "stream_midstate_reader" ->
      (graft.streaming.StreamDrain.streamMidstateReader _),
    // the join twin: both symmetric buffers AS OF batch 2, gated
    // against the watermark+interval eviction horizon re-derived in SQL
    "stream_midstate_join_reader" ->
      (graft.streaming.StreamDrain.streamMidstateJoinReader _),
    // the admissible-late arrival class for the session family: a row
    // one batch behind its peers must merge BACKWARD into session state
    "stream_ooo_session_drain" ->
      (graft.streaming.StreamDrain.streamOooSessionDrain _),
    "concurrent_sessions" -> (TemporalOps.concurrentSessions _),
    "asof_join" -> (TemporalOps.asofJoin _),
    "range_join" -> (TemporalOps.rangeJoin _),
    "latest_events" -> (TemporalOps.latestEvents _),
    "scd2_intervals" -> (TemporalOps.scd2Intervals _),
    "cdc_merge" -> (TemporalOps.cdcMerge _),
    "incr_agg_merge" -> (TemporalOps.incrAggMerge _),
    "click_attribution" -> (TemporalOps.clickAttribution _),
    // stream-stream interval join via an ACTUAL writeStream drain
    "stream_attribution_drain" ->
      (graft.streaming.StreamDrain.streamAttributionDrain _),
    // training-data pipeline: dataset construction
    "stratified_sample" -> (PipelineOps.stratifiedSample _),
    "reservoir_sample" -> (PipelineOps.reservoirSample _),
    "quantile_normalize" -> (PipelineOps.quantileNormalize _),
    "vocab_topk" -> (PipelineOps.vocabTopK _),
    "zipf_fit" -> (PipelineOps.zipfFit _),
    "pack_sequences" -> (PipelineOps.packSequences _),
    "quality_filter" -> (PipelineOps.qualityFilter _),
    "profile_events" -> (PipelineOps.profileEvents _),
    "bpe_first_merges" -> (PipelineOps.bpeFirstMerges _),
    "bpe_encode" -> (PipelineOps.bpeEncode _),
    "contamination_check" -> (DedupOps.contaminationCheck _),
    // set operations over the event stream
    "users_click_and_purchase" -> (MiscOps.usersClickAndPurchase _),
    "users_view_not_purchase" -> (MiscOps.usersViewNotPurchase _),
    // OLAP / joins (additive; bench workload)
    "kpi_rollup" -> (OlapOps.kpiRollup _),
    "kpi_grouping_sets" -> (OlapOps.kpiGroupingSets _),
    "user_activity_pivot" -> (OlapOps.userActivityPivot _),
    "lineitem_measures" -> (OlapOps.lineitemMeasures _),
    "series_gapfill" -> (SeriesOps.seriesGapfill _),
    "orders_no_returns" -> (OlapOps.ordersNoReturns _),
    "big_spender_segments" -> (OlapOps.bigSpenderSegments _),
    "min_price_supplier" -> (OlapOps.minPriceSupplier _),
    "q1_pricing" -> (OlapOps.q1Pricing _),
    "q3_shipping" -> (OlapOps.q3Shipping _),
    "q5_local_supplier" -> (OlapOps.q5LocalSupplier _),
    "q7_nation_volume" -> (OlapOps.q7NationVolume _),
    "q10_returned_customers" -> (OlapOps.q10ReturnedCustomers _),
    "q18_large_orders" -> (OlapOps.q18LargeOrders _),
    "q2_min_cost_supplier" -> (OlapOps.q2MinCostSupplier _),
    "q4_priority_promise" -> (OlapOps.q4PriorityPromise _),
    "q21_wait_suppliers" -> (OlapOps.q21WaitSuppliers _),
    "q22_dormant_balance" -> (OlapOps.q22DormantBalance _),
    "incident_overlap" -> (AnomalyOps.incidentOverlap _),
    "autocorr_lags" -> (SeriesOps.autocorrLags _),
    "series_twa" -> (SeriesOps.seriesTwa _),
    "uptime_report" -> (SeriesOps.uptimeReport _),
    "series_ohlc" -> (SeriesOps.seriesOhlc _),
    "counter_delta" -> (SeriesOps.counterDelta _),
    "watermark_audit" -> (SeriesOps.watermarkAudit _),
    "pps_sample" -> (PipelineOps.ppsSample _),
    "gini_concentration" -> (OlapOps.giniConcentration _),
    "q16_part_suppliers" -> (OlapOps.q16PartSuppliers _),
    "trade_triangles" -> (OlapOps.tradeTriangles _),
    "trade_reach" -> (OlapOps.tradeReach _),
    "series_holt" -> (SeriesOps.seriesHolt _),
    "series_hw" -> (SeriesOps.seriesHw _),
    "sax_motifs" -> (SeriesOps.saxMotifs _),
    "theilsen_trend" -> (SeriesOps.theilsenTrend _),
    "dtw_profiles" -> (SeriesOps.dtwProfiles _),
    "type_corr_matrix" -> (SeriesOps.typeCorrMatrix _),
    "benford_deviation" -> (SeriesOps.benfordDeviation _),
    "iqr_fences" -> (SeriesOps.iqrFences _),
    "cusum_changepoints" -> (SeriesOps.cusumChangepoints _),
    "drift_ks" -> (SeriesOps.driftKs _),
    "mutual_info" -> (SeriesOps.mutualInfo _),
    "burstiness_fano" -> (SeriesOps.burstinessFano _),
    "slo_burn_rate" -> (KpiOps.sloBurnRate _),
    "ab_test_conversion" -> (FunnelOps.abTestConversion _),
    "seasonal_anomaly" -> (SeriesOps.seasonalAnomaly _),
    "hourly_entropy" -> (SeriesOps.hourlyEntropy _),
    "skyline_pareto" -> (OlapOps.skylinePareto _),
    "basket_pairs" -> (OlapOps.basketPairs _),
    "basket_rules" -> (OlapOps.basketRules _),
    "supplier_league" -> (OlapOps.supplierLeague _),
    "q14_promo_share" -> (OlapOps.q14PromoShare _),
    "q19_disjunctive_revenue" -> (OlapOps.q19DisjunctiveRevenue _),
    "q13_order_distribution" -> (OlapOps.q13OrderDistribution _),
    "q11_important_parts" -> (OlapOps.q11ImportantParts _),
    "q20_dominant_suppliers" -> (OlapOps.q20DominantSuppliers _),
    "q6_forecast_revenue" -> (OlapOps.q6ForecastRevenue _),
    "q8_market_share" -> (OlapOps.q8MarketShare _),
    "q9_product_profit" -> (OlapOps.q9ProductProfit _),
    "q12_delay_priority" -> (OlapOps.q12DelayPriority _),
    "q15_top_supplier" -> (OlapOps.q15TopSupplier _),
    "q17_small_quantity" -> (OlapOps.q17SmallQuantity _),
    "top_customers" -> (OlapOps.topCustomers _),
    "supplier_parts" -> (OlapOps.supplierParts _),
    // training-data pipeline: dedup family
    "dedup_exact" -> (DedupOps.dedupExact _),
    "minhash_signatures" -> (DedupOps.minhashSignatures _),
    "dedup_minhash_lsh" -> (DedupOps.dedupMinhashLsh _),
    "dedup_minhash_wideband" -> (DedupOps.dedupMinhashWideband _),
    "shingle_containment" -> (DedupOps.shingleContainment _),
    "dedup_ngram_jaccard" -> (DedupOps.dedupNgramJaccard _),
    "ssjoin_prefix" -> (DedupOps.ssjoinPrefix _),
    "simhash_signatures" -> (DedupOps.simhashSignatures _),
    "simhash_pairs" -> (DedupOps.simhashPairs _),
    "dedup_cascade" -> (DedupOps.dedupCascade _),
    // training-data pipeline: text analysis
    "text_tokens" -> (TextOps.textTokens _),
    "text_quality" -> (TextOps.textQuality _),
    // HTML boilerplate extraction over deterministic page fixtures —
    // the web-corpus ingest step; body_md5 pins the full extracted text
    "html_extract" -> (TextOps.htmlExtract _),
    "text_langid" -> (TextOps.textLangId _),
    "gopher_rules" -> (TextOps.gopherRules _),
    "tokenizer_fertility" -> (TextOps.tokenizerFertility _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_winnow" -> (TextOps.textWinnow _),
    // training-data pipeline: similarity search
    "ann_topk" -> (VectorOps.annTopK _),
    "ann_lsh_bucketed" -> (VectorOps.annLshBucketed _),
    "ann_lsh_wideband" -> (VectorOps.annLshWideband _),
    "ann_ivf" -> (VectorOps.annIvf _),
    "ann_ivf_probed" -> (VectorOps.annIvfProbed _),
    "embed_near_dup" -> (VectorOps.embedNearDup _),
    "semdedup" -> (VectorOps.semdedup _),
    "embed_quantize" -> (VectorOps.embedQuantize _),
    "embed_rp_sketch" -> (VectorOps.embedRpSketch _),
    "label_centroids" -> (VectorOps.labelCentroids _),
    "kmeans_centroids" -> (VectorOps.kmeansCentroids _),
    "pq_codebooks" -> (VectorOps.pqCodebooks _),
    "pq_encode" -> (VectorOps.pqEncode _),
    "pq_search" -> (VectorOps.pqSearch _),
    // corpus search / relevance scoring
    "tfidf_topterms" -> (SearchOps.tfidfTopterms _),
    "bm25_search" -> (SearchOps.bm25Search _),
    "doc_logprob" -> (SearchOps.docLogprob _),
    "perplexity_buckets" -> (SearchOps.perplexityBuckets _),
    "doc_logprob_bigram" -> (SearchOps.docLogprobBigram _),
    "chi2_label_terms" -> (SearchOps.chi2LabelTerms _),
    "langid_confusion" -> (TextOps.langidConfusion _),
    // event-sequence analytics
    "funnel_conversion" -> (FunnelOps.funnelConversion _),
    "cohort_retention" -> (FunnelOps.cohortRetention _),
    "event_transitions" -> (FunnelOps.eventTransitions _),
    "pagerank_types" -> (FunnelOps.pagerankTypes _),
    "window_funnel" -> (FunnelOps.windowFunnel _),
    // 12 h window: mixed-depth histogram, window-knob-proof gate row
    "window_funnel_tight" -> (FunnelOps.windowFunnelTight _),
    "funnel_latency" -> (FunnelOps.funnelLatency _),
    "top_paths" -> (FunnelOps.topPaths _),
    "dsir_weights" -> (SearchOps.dsirWeights _),
    "user_value_quartiles" -> (OlapOps.userValueQuartiles _),
    // pipeline-health audits
    "fk_integrity" -> (OlapOps.fkIntegrity _),
    "expect_suite" -> (OlapOps.expectSuite _),
    "key_skew_profile" -> (OlapOps.keySkewProfile _),
    "zorder_layout" -> (LayoutOps.zorderLayout _),
    "bloom_semi_join" -> (SkewOps.bloomSemiJoin _),
    "salted_join_agg" -> (SkewOps.saltedJoinAgg _),
    // cross-dimensional aggregation / profiling
    "kpi_cube" -> (OlapOps.kpiCube _),
    "doc_length_histogram" -> (PipelineOps.docLengthHistogram _),
    "dataset_split" -> (PipelineOps.datasetSplit _),
    "vocab_coverage" -> (PipelineOps.vocabCoverage _),
    "approx_top_tokens" -> (PipelineOps.approxTopTokens _),
    "dedup_rate_by_source" -> (DedupOps.dedupRateBySource _),
    "events_hourly_heatmap" -> (FunnelOps.eventsHourlyHeatmap _),
    // dedup clustering + repetition signals
    "dedup_clusters" -> (DedupOps.dedupClusters _),
    "text_repetition" -> (TextOps.textRepetition _),
    "dup_span_fraction" -> (DedupOps.dupSpanFraction _),
    "strip_dup_spans" -> (DedupOps.stripDupSpans _),
    "ngram_novelty" -> (DedupOps.ngramNovelty _),
    "dedup_verify_editdist" -> (DedupOps.dedupVerifyEditdist _),
    "lsh_recall" -> (DedupOps.lshRecall _),
    "recall_matrix" -> (CalibrationOps.recallMatrix _),
    "cluster_representatives" -> (DedupOps.clusterRepresentatives _),
    "golden_records" -> (DedupOps.goldenRecords _),
    "cascade_savings" -> (DedupOps.cascadeSavings _),
    "quality_by_verdict" -> (DedupOps.qualityByVerdict _),
    // training-data pipeline: chunking + source mixing
    "chunk_documents" -> (PipelineOps.chunkDocuments _),
    "source_mix_weights" -> (PipelineOps.sourceMixWeights _),
    "temperature_resample" -> (PipelineOps.temperatureResample _),
    "curation_manifest" -> (PipelineOps.curationManifest _),
    "resampled_mix" -> (PipelineOps.resampledMix _),
    // training-data pipeline: privacy pass
    "pii_scrub" -> (PrivacyOps.piiScrub _),
    "k_anonymity" -> (PrivacyOps.kAnonymity _),
    "dp_counts" -> (PrivacyOps.dpCounts _),
    "compaction_plan" -> (LayoutOps.compactionPlan _),
    // training-data pipeline: multimodal plumbing (stub decode)
    "media_meta" -> (MultimodalOps.mediaMeta _),
    "media_header_meta" -> (MultimodalOps.mediaHeaderMeta _),
    "frame_sample" -> (MultimodalOps.frameSample _),
    "image_resize" -> (MultimodalOps.imageResize _),
    "audio_features" -> (MultimodalOps.audioFeatures _),
    "scene_cuts" -> (MultimodalOps.sceneCuts _),
    "image_ahash" -> (MultimodalOps.imageAhash _),
    "image_dup_pairs" -> (MultimodalOps.imageDupPairs _),
    // the banded aHash search with PLANTED exact clones — positive rows
    // guaranteed, so the gate checks found pairs, not just emptiness
    "image_dup_pairs_planted" -> (MultimodalOps.imageDupPairsPlanted _)
  )

  /** The writeStream VERIFICATION drains: each run stages chunk files,
    * executes a multi-micro-batch checkpointed query, and reads a store
    * back — wall-clock that scales with drain COUNT and verification
    * depth, not engine speed. Bench splits their total (`drain_total`)
    * out of `batch_extended_total` using THIS explicit registry, not a
    * name-prefix scrape; GateInvariantSpec pins the registry equal to
    * the `stream_`-prefixed query names, so a misnamed or unregistered
    * drain fails the build instead of silently skewing round-over-round
    * engine comparisons.
    */
  val drainQueries: Set[String] = Set(
    "stream_ewma_drain", "stream_shuffled_ewma_drain", "stream_cusum_drain",
    "stream_kpi_drain", "stream_late_drop_drain", "stream_ooo_kpi_drain",
    "stream_alerts_drain", "stream_alerts_list_drain",
    "stream_shuffled_alerts_drain",
    "stream_cooldown_drain", "stream_cooldown_timer_drain",
    "stream_routed_drain", "stream_fused_routed_drain",
    "stream_dedup_drain", "stream_docdedup_drain",
    "stream_transitions_drain", "stream_shuffled_transitions_drain",
    "stream_drift_drain", "stream_snapshot_drain",
    "stream_ooo_snapshot_drain", "stream_restart_drain",
    "stream_dirty_restart_drain", "stream_dirty_restart_snapshot_drain",
    "stream_dirty_restart_session_drain", "stream_dirty_restart_join_drain",
    "stream_restart_kpi_drain",
    "stream_restart_session_drain", "stream_restart_join_drain",
    "stream_warmstart_drain", "stream_funnel_drain", "stream_state_reader",
    "stream_hll_drain", "stream_toptokens_drain", "stream_lshdedup_drain",
    "stream_session_drain", "stream_session_timer_drain",
    "stream_midstate_reader", "stream_midstate_join_reader",
    "stream_ooo_session_drain", "stream_attribution_drain")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query has one — including
    * `approx_distinct_users`, whose engine-specific HLL estimate is
    * self-gated (`within_tolerance`) so the oracle checks the exact
    * count plus the gate verdict rather than the sketch itself.
    */
  def oracleSql: Map[String, String] =
    (SeriesOps.oracles ++ KpiOps.oracles ++ AnomalyOps.oracles ++
      MiscOps.oracles ++ OlapOps.oracles ++ DedupOps.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ MultimodalOps.oracles ++
      TemporalOps.oracles ++ PipelineOps.oracles ++ SearchOps.oracles ++
      FunnelOps.oracles ++ CalibrationOps.oracles ++ LayoutOps.oracles ++
      SkewOps.oracles ++ PrivacyOps.oracles)
      .map { case (k, v) => k -> graft.functions.Rounding.fixSql(v) }
}
