package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, CorpusPrep, Dedup, EventsOps, Relational, Reshape, Sampling, Scalars, SetOps, Similarity, Sketches, SkewJoin, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 appears here as a named query
  * over the test lakehouse, with an ANSI-SQL oracle (DuckDB dialect) that
  * must hash-match. Money/measure aggregates are quantized to integer cents
  * (see [[graft.operators.Determinism]]) so floating-point summation order
  * cannot cause cross-engine drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_scan_filter_project" -> (Relational.scanFilterProject _),
    "q03_topk_orders" -> (Relational.topkOrders _),
    "q04_region_revenue" -> (Relational.regionRevenue _),
    "q05_latest_order_join" -> (Relational.latestOrderPerCustomer _),
    "q06_latest_order_window" -> (Relational.latestOrderPerCustomerWindow _),
    "q07_unpivot_lineitem" -> (Relational.unpivotLineitem _),
    "q08_distinct_years" -> (Relational.distinctOrderYears _),
    "q09_grouped_max" -> (Relational.groupedMax _),
    "q10_lag_monotonic" -> (Relational.lagMonotonicViolations _),
    "q11_semi_join" -> (Relational.customersWithOrders _),
    "q12_anti_join" -> (Relational.customersWithoutOrders _),
    "q13_pivot_returnflag" -> (Reshape.pivotByReturnFlag _),
    "q14_filtered_totals" -> (Scalars.filteredTotals _),
    "q15_sum_case_priority" -> (Scalars.sumCaseByPriority _),
    "q16_horizontal_sum" -> (Scalars.horizontalSumCheck _),
    "q17_value_remap" -> (Scalars.valueRemap _),
    "q18_regexp_extract" -> (Scalars.regexpExtractSource _),
    "q19_rlike_filter" -> (Scalars.rlikeFilter _),
    "q20_json_extract" -> (EventsOps.jsonExtractAgg _),
    "q21_events_hourly" -> (EventsOps.hourlyAgg _),
    "q22_tumbling_window" -> (EventsOps.tumblingWindowAgg _),
    "q23_set_except" -> (SetOps.openNotFinishedCustomers _),
    "q24_set_intersect" -> (SetOps.openAndFinishedCustomers _),
    "q25_union_nations" -> (SetOps.activeNationKeys _),
    "q26_distinct_partsupp" -> (SetOps.distinctPartSupp _),
    "q27_forward_fill" -> (EventsOps.forwardFill _),
    "q28_running_sum" -> (EventsOps.runningSum _),
    "q29_bulk_cast" -> (Scalars.bulkCast _),
    "q30_row_counts" -> (Scalars.rowCounts _),
    "q31_text_stats" -> (TextOps.textStats _),
    "q32_token_frequency" -> (TextOps.tokenFrequency _),
    "q33_langid_confusion" -> (TextOps.langIdConfusion _),
    "q34_quality_buckets" -> (TextOps.qualityBuckets _),
    "q35_fingerprint_clusters" -> (TextOps.fingerprintClusters _),
    "q36_dedup_keep_first" -> (TextOps.dedupKeepFirst _),
    "q37_ngram_jaccard" -> (Dedup.ngramJaccardPairs _),
    "q38_minhash_signatures" -> (Dedup.minhashSignatures _),
    "q39_lsh_candidates" -> (Dedup.lshCandidatePairs _),
    "q40_simhash" -> (Dedup.simhash _),
    "q41_knn_bruteforce" -> (Similarity.bruteForceKnn _),
    "q42_knn_ivf" -> (Similarity.ivfKnn _),
    "q43_norm_stats" -> (Similarity.normStatsByLabel _),
    "q50_bpe_tokens" -> (TextOps.bpeTokenCounts _),
    "q51_embed_neardup" -> (Dedup.embeddingNearDupExact _),
    "q52_embed_neardup_bucketed" -> (Dedup.embeddingNearDupBucketed _),
    "q53_shipping_priority" -> (Relational.shippingPriority _),
    "q54_forecast_revenue" -> (Relational.forecastRevenue _),
    // exact COUNT(DISTINCT) per column hash-matches the oracle; the HLL
    // estimate rides along as a deterministic within-3·rsd boolean (the
    // sketch-only production form is Profiler.cardinalityProfile)
    "q55_cardinality_profile" -> ((s, d) =>
      graft.operators.Profiler.cardinalityProfileChecked(s, d, "orders")),
    // exact half of the skew profile; the GK quantile sketch is
    // oracle-graded in q80
    "q56_key_skew_profile" -> ((s, d) =>
      graft.operators.Profiler.keySkewProfile(
        graft.sources.Tables.lineitem(s, d), "l_orderkey")),
    "q80_key_skew_quantiles" -> ((s, d) =>
      graft.operators.Profiler.keySkewQuantilesChecked(
        graft.sources.Tables.lineitem(s, d), "l_orderkey")),
    "q60_curation_summary" -> (graft.operators.CurationPipeline.curationSummary _),
    "q57_frame_sample" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d))
    }),
    "q58_json_struct" -> (EventsOps.jsonStructParse _),
    "q59_rolling_hour_sum" -> (EventsOps.rollingHourSum _),
    "q48_hash_sample" -> (Sampling.documentSample _),
    "q49_split_distribution" -> (Sampling.splitDistribution _),
    "q45_asof_join" -> (AsOf.purchaseAsofSignup _),
    "q46_sessionize" -> (AsOf.sessionizeEvents _),
    "q47_rollup" -> (Relational.regionNationRollup _),
    "q44_media_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.multimodal.Multimodal.mediaFromDocuments(s, d).select(
        col("media_id"),
        length(col("content")).cast("long").as("size_bytes"),
        md5(col("content")).as("content_md5"),
        col("meta.mime").as("mime"),
        col("meta.duration_ms").as("duration_ms"))
    }),
    "q61_incremental_dedup" -> (TextOps.incrementalDedup _),
    "q62_containment_pairs" -> (Dedup.containmentPairs _),
    "q63_winnow_profile" -> (TextOps.winnowProfile _),
    "q64_winnow_overlap" -> (TextOps.winnowOverlapPairs _),
    "q65_stratified_mix" -> (Sampling.stratifiedMix _),
    "q66_repetition_profile" -> (CorpusPrep.repetitionProfile _),
    "q67_tfidf_top_terms" -> ((s, d) => CorpusPrep.tfidfTopTerms(s, d)),
    "q68_sequence_packing" -> (CorpusPrep.sequencePacking _),
    "q69_exact_median" -> (Relational.exactMedianByPriority _),
    "q70_dedup_components" -> (Dedup.dedupComponents _),
    "q71_exact_deciles" -> (Relational.exactDecilesByPriority _),
    "q72_doc_chunks" -> (CorpusPrep.docChunks _),
    "q73_minhash_accuracy" -> (Dedup.minhashAccuracy _),
    "q74_bloom_dedup" -> (Sketches.bloomPrefilterDedup _),
    "q75_heavy_hitters" -> (Sketches.heavyHittersChecked _),
    "q76_kmeans_refine" -> (Similarity.kmeansRefine _),
    "q77_quantile_audit" -> (Sketches.quantileSketchChecked _),
    "q78_contamination" -> (TextOps.contaminationCheck _),
    "q79_mix_weights" -> (Sampling.mixWeights _),
    "q81_pq_codes" -> (Similarity.pqCodes _),
    "q82_dup_span_profile" -> (Dedup.dupSpanProfile _),
    "q83_ivfpq_search" -> (Similarity.ivfPqSearch _),
    "q84_decontaminate" -> (TextOps.decontaminateTrain _),
    "q85_token_rarity" -> (TextOps.tokenRarityScore _),
    "q86_shard_balance" -> (Sampling.shardBalance _),
    "q87_dup_span_scrub" -> (Dedup.dupSpanScrub _),
    "q88_pq_lsh_pairs" -> (Similarity.pqLshPairs _),
    "q89_incremental_lsh" -> (Dedup.incrementalLshPairs _),
    "q90_ann_recall" -> (Similarity.annRecallAudit _),
    "q91_dedup_survivors" -> (Dedup.dedupSurvivors _),
    "q92_source_divergence" -> (TextOps.sourceDivergence _),
    "q93_semantic_agreement" -> (Similarity.lexicalSemanticAgreement _),
    "q94_token_budget" -> (Sampling.tokenBudgetSelect _),
    "q95_curation_delta" -> (Dedup.curationDelta _),
    "q96_lsh_recall" -> (Dedup.lshRecallAudit _),
    "q97_funnel_stages" -> (EventsOps.funnelStages _),
    "q98_retention_cohorts" -> (EventsOps.retentionCohorts _),
    "q99_ivf_derived_index" -> (Similarity.ivfDerivedHistogram _),
    "q100_gopher_gates" -> (CorpusPrep.gopherGates _),
    "q101_cube_pricing" -> (Relational.cubePricing _),
    "q102_ntile_quartiles" -> (Relational.ntileBalanceQuartiles _),
    "q103_session_conversion" -> (AsOf.sessionConversion _),
    "q104_cross_source_dups" -> (Dedup.crossSourceDupMatrix _),
    "q105_simhash_pairs" -> (Dedup.simhashPairs _),
    "q106_ivf_derived_search" -> (Similarity.ivfKnnAuto _),
    "q107_pq_derived_codes" -> (Similarity.pqDerivedCodeHistogram _),
    "q108_ivfpq_derived_search" -> (Similarity.ivfPqSearchAuto _),
    "q109_kmeans_train" -> (Similarity.kmeansTrain _),
    "q110_open_sessions" -> (AsOf.openSessionsAtPurchase _),
    "q111_salted_segment" -> (SkewJoin.saltedSegmentRevenue _),
    "q112_scd_intervals" -> (EventsOps.scdIntervals _),
    "q113_grouping_sets" -> (Relational.groupingSetsPricing _),
    "q114_multiset_ops" -> (SetOps.multisetOrderCustkeys _),
    "q115_session_paths" -> (AsOf.sessionPaths _),
    "q116_revenue_share" -> (Relational.regionRevenueShare _),
    "q117_session_overlap" -> (AsOf.sessionOverlapMatrix _),
    "q118_hard_negatives" -> (Similarity.hardNegativeMining _),
    "q119_epoch_mix_plan" -> (Sampling.epochMixPlan _),
    "q120_ivf_hard_negatives" -> (Similarity.ivfHardNegativeMining _),
    "q121_mining_agreement" -> (Similarity.miningAgreementAudit _),
    "q122_rank_family" -> (Relational.rankFamilyBalance _),
    "q123_topk_aggregate" -> (Similarity.bruteForceKnnAgg _),
    "q124_positional_window" -> (Relational.positionalWindowExtrema _),
    "q125_capped_overlap" -> (AsOf.sessionOverlapMatrixCapped _),
    "q126_media_decode" -> ((s, d) => graft.multimodal.Multimodal.decodeMedia(
      graft.multimodal.Multimodal.mediaBytesFromDocuments(s, d))),
    "q127_stream_scd_parity" -> (graft.streaming.EventsStream.scdClosedDrain _),
    "q128_kmeans_hash_seeded" -> (Similarity.kmeansTrainSeeded _),
    "q129_stream_funnel_parity" -> (graft.streaming.EventsStream.funnelDrain _),
    "q130_trigram_quality" -> (TextOps.charTrigramQuality _),
    "q131_priority_sample" -> ((s, d) => Sampling.prioritySample(s, d)),
    "q132_ivf_incremental_ingest" -> (Similarity.ivfIncrementalIngest _),
    "q133_stream_attribution" -> ((s, d) =>
      graft.streaming.EventsStream.attributionDrain(s, d)
        .select("user_id", "view_id", "click_id", "gap_us")),
    "q134_media_byte_hist" -> (graft.multimodal.Multimodal.mediaByteHistogram _),
    "q135_kmv_distinct" -> (Sketches.kmvDistinctChecked _),
    "q136_split_leakage" -> (Dedup.splitLeakageMatrix _),
    "q137_stream_dedup_replay" -> (graft.streaming.EventsStream.dedupReplayDrain _),
    "q138_semantic_leakage" -> (Dedup.semanticSplitLeakageMatrix _),
    "q139_kmv_derived" -> (Sketches.kmvDistinctDerived _),
    "q140_curation_endgame" ->
      (graft.operators.CurationPipeline.endgameReport _),
    "q141_denylist_scrub" -> (TextOps.denylistScrub _),
    "q142_kmv_shard_merge" -> (Sketches.kmvShardMerge _),
    "q143_value_drift_ks" -> (EventsOps.valueDriftKs _),
    "q144_pii_scrub" -> (TextOps.piiRedactionReport _),
    "q145_edit_verify" -> (Dedup.lshEditVerify _),
    "q146_value_outliers" -> (EventsOps.valueOutliersMad _),
    "q147_stream_sessions" -> (graft.streaming.EventsStream.sessionizeDrain _),
    "q148_zorder_layout" -> (graft.lake.ZOrder.layoutAudit _),
    "q149_referential_audit" ->
      (graft.quality.DataQuality.referentialAudit _),
    "q150_skipindex_audit" -> (graft.lake.ZOrder.skipIndexAudit _),
    "q151_export_manifest" ->
      (graft.operators.TrainingExport.exportManifest _),
    "q152_stream_left_attrib" ->
      (graft.streaming.EventsStream.attributionOuterDrain _),
    "q153_jsonl_roundtrip" -> (graft.sources.JsonLake.roundtripAudit _),
    "q154_trade_pagerank" -> (graft.operators.GraphOps.tradePagerank _),
    "q155_stratified_alloc" -> (Sampling.stratifiedAlloc _),
    "q156_compaction_plan" -> (graft.lake.Compaction.planRowsAudit _),
    "q157_lexical_topk" -> (graft.operators.Retrieval.lexicalTopK _),
    "q158_rrf_fusion" -> (graft.operators.Retrieval.rrfFusion _),
    "q159_event_pattern" -> (EventsOps.cleanConversions _),
    "q160_decayed_activity" -> (EventsOps.decayedActivity _),
    "q161_table_diff" -> (graft.lake.TableDiff.diffAudit _),
    "q162_incremental_agg" -> (graft.operators.Incremental.aggMaintenance _),
    "q163_stream_neardup" ->
      (graft.streaming.DocStream.nearDupScreenDrain _),
    "q164_transition_rarity" -> (EventsOps.transitionRarity _),
    "q165_interleave_order" ->
      (graft.operators.TrainingExport.interleaveOrder _),
    "q166_collocations" -> (CorpusPrep.collocations _),
    "q167_stream_full_attrib" ->
      (graft.streaming.EventsStream.attributionFullDrain _),
    "q168_incremental_ref_audit" ->
      (graft.quality.DataQuality.incrementalReferentialAudit _),
    // k-anonymity / l-diversity release audit at generalization
    // levels 0 and 1 (structured-privacy family)
    "q169_k_anonymity" -> (graft.quality.PrivacyAudit.kAnonymityAudit _),
    // conditional char-bigram LM surprisal (CCNet perplexity-filter
    // posture; q130 is the marginal-frequency twin)
    "q170_char_lm_score" -> (TextOps.charBigramNll _),
    // per-source exact-quantile quality floor (per-domain adaptive cut)
    "q171_adaptive_floor" -> (graft.operators.CorpusPrep.adaptiveQualityFloor _),
    // SemDeDup: IVF-cluster-scoped cosine dedup ledger with keep-first
    // survivors (embedding twin of the q39→q91 lexical path)
    "q172_semantic_dedup" -> (Dedup.semanticDedupLedger _),
    // JL ±1 sign projection 64→16 with exact-integer checksums
    "q173_jl_projection" -> (Similarity.jlProjectionChecksums _),
    // exact greedy BPE merge training over the vocab-bounded word
    // relation (q166's collocations are the counting half)
    "q174_bpe_merges" -> (graft.operators.CorpusPrep.bpeTrainMerges _),
    // one-pass upper-triangular Gram/mean/count accumulators — the
    // PCA/whitening prep statistic, dimension-bounded output
    "q175_embed_covariance" -> (Similarity.embeddingCovarianceSums _),
    // degree-oriented triangle counting + local clustering
    // coefficients on the heavy-tail co-supply graph (the motif third
    // of the graph family: components q70, PageRank q154)
    "q176_supplier_triangles" -> (graft.operators.GraphOps.supplierTriangles _),
    // BPE encode: per-doc token counts after q174's merges — the
    // apply half of tokenizer training, a vocab join not a doc scan
    "q177_bpe_encode" -> (graft.operators.CorpusPrep.bpeEncodeCounts _),
    // k-core peel trajectory on the shared co-supply graph (the
    // subgraph-mining fourth of the graph family)
    "q178_kcore_peel" -> (graft.operators.GraphOps.kCoreTrajectory _),
    // CUSUM changepoint trajectory over daily revenue (Page's
    // statistic in scaled exact integers; WHEN did the level shift)
    "q179_revenue_cusum" -> (graft.operators.StatsAudit.revenueCusum _),
    // Benford first-digit conformance on amounts (fabrication screen)
    "q180_benford_audit" -> (graft.operators.StatsAudit.benfordAudit _),
    // 1-NN label-agreement confusion matrix within IVF buckets (the
    // k-NN embedding-quality probe)
    "q181_knn_label_eval" -> (Similarity.knnLabelEval _),
    // same probe on the derived-√N index width (the production pairing)
    "q182_knn_label_derived" -> (Similarity.knnLabelEvalDerived _),
    // frequent part pairs by basket support (per-basket-bounded pair
    // explosion, the market-basket half of co-occurrence mining)
    "q183_frequent_pairs" -> (graft.operators.Association.frequentPairs _),
    // association rules from the frequent pairs: confidence + lift in
    // exact ppm, item-support join deliberately shuffled (part-dim
    // sized), only the 1-row basket total broadcasts
    "q184_association_rules" -> (graft.operators.Association.associationRules _),
    // per-nation OLS revenue trend via exact-integer normal equations
    // (slope/intercept/r2 ppm on the dimension-bounded monthly relation)
    "q185_revenue_trend" -> (graft.operators.StatsAudit.revenueTrend _),
    // temperature-scaled source mixing at the engine-exact tau=1/2
    // (integer sqrt): natural vs temperature shares + per-lang boost
    "q186_temperature_mix" -> (Sampling.temperatureMix _),
    // cross-source quantile normalization: within-source percentile of
    // the quality score, ranks from the value-bounded score histogram
    // (never a corpus sort), rolled up per (source, decile)
    "q187_quantile_normalize" -> (graft.operators.TextOps.quantileNormalize _),
    // per-language tokenizer fertility + compression of the q174 BPE
    // (which languages the tokenizer underserves; q177's eval rollup)
    "q188_bpe_fertility" -> (graft.operators.CorpusPrep.bpeFertility _),
    // synchronous mode-LPA communities on the shared co-supply graph
    // (the community fifth of the graph family); per-round trajectory
    // with a bit_xor membership witness
    "q189_label_propagation" -> (graft.operators.GraphOps.labelPropagation _),
    // point-in-time enrichment: facts pick up the SCD state valid at
    // their timestamp via union + forward-fill (shared-key PIT needs
    // no join), rolled up per (state, fact type)
    "q190_pit_enrichment" -> (graft.operators.EventsOps.pitEnrichment _),
    // (year x priority) contingency drift: obs/exp cell shares + phi^2
    // cell contributions in exact ppm (the independence audit)
    "q191_priority_drift" -> (graft.operators.StatsAudit.priorityDriftCells _),
    // fulfillment-latency deciles by priority via the value histogram
    // (the discrete-measure quantile form; q71 is the sort form)
    "q192_fulfillment_deciles" -> (Relational.fulfillmentDeciles _),
    // TPC-H Q17 pattern: revenue in below-20%-of-part-average lots,
    // the correlated scalar subquery decorrelated to a keyed self-join
    // with the fractional average compared in exact integers
    "q193_below_avg_parts" -> (Relational.belowAvgParts _),
    // Newman modularity of the q189 labeling, decomposed per community
    // in exact ppm — the is-the-structure-real score
    "q194_community_modularity" -> (graft.operators.GraphOps.communityModularity _),
    // streaming twin of q190: per-user carried state enriches each
    // fact as it arrives (flatMapGroupsWithState), drained and rolled
    // up to the identical panel — same oracle as the batch form
    "q195_stream_pit_parity" -> (graft.streaming.EventsStream.pitDrain _),
    // seed-independence audit of per-epoch hash sampling: overlap of
    // two salted epoch subsets vs the product expectation, one pass
    "q196_epoch_overlap" -> (Sampling.epochOverlap _),
    // theta-sketch intersections per source pair with exact audit —
    // the KMV family's intersection completion
    "q197_kmv_intersections" -> (graft.operators.Sketches.kmvIntersections _),
    // media near-dup pairs by nibble-histogram L1 within capped
    // (mime, size-bucket) buckets — the multimodal dedup operator
    "q198_media_neardup" -> (graft.multimodal.Multimodal.mediaNearDupPairs _),
    // lakehouse CDC MERGE: base + update/delete batch via one keyed
    // window, delete-wins precedence, self-certified vs the anti-join
    // construction (audit panel with xor checksums)
    "q199_cdc_merge" -> (graft.operators.Incremental.cdcMerge _),
    // control-chart band breach: trailing-window z^2 in exact ppm
    // (squares compared, no float sigma), windows on the day relation
    "q200_band_breach" -> (graft.operators.StatsAudit.bandBreach _),
    // CUPED variance-reduced experiment readout: pre-period covariate
    // adjustment with exact-integer theta/rho^2 (the q185 algebra)
    "q201_cuped_adjust" -> (graft.operators.StatsAudit.cupedAdjust _),
    // pooled two-proportion z^2 significance panel in exact ppm
    "q202_ab_proportion" -> (graft.operators.StatsAudit.abProportionTest _),
    // deterministic Poisson-bootstrap of the mean daily revenue:
    // hash-derived Poisson(1) weights, 32 resamples on the day relation
    "q203_bootstrap_means" -> (graft.operators.StatsAudit.bootstrapMeans _),
    // mass-weighted corpus deciles on the value-bounded histogram
    // (where does the BYTE mass live, not the document count)
    "q204_mass_deciles" -> (graft.operators.TextOps.massWeightedDeciles _),
    // per-nation top-3 customers via the native bounded-heap aggregate
    // (graft_topk) — per-group top-k without a window sort
    "q205_top_customers" -> ((s: SparkSession, d: String) =>
      Relational.topCustomersPerNation(s, d)),
    // canonical LISTAGG: deterministic sorted manifest per order
    "q206_order_manifest" -> (Relational.orderPartManifest _),
    // multi-source BFS hop trajectory over the shared co-supply graph
    // — the traversal sixth of the graph family; per-round frontier
    // size, cumulative reach, and a bit_xor membership witness
    "q207_bfs_reach" -> (graft.operators.GraphOps.bfsReach _),
    // cross-document boilerplate density: share of each doc's distinct
    // 3-token shingles recurring in >= BoilerMinDf docs, exact ppm —
    // rides the shared hashed-shingle relation, two keyed shuffles
    "q208_boilerplate_density" -> (graft.operators.TextOps.boilerplateDensity _),
    // DP release of per-(source, lang) counts: geometric mechanism
    // (ratio 1/2, eps = ln 2) with deterministic hash-derived noise —
    // trailing-zero geometric + hash sign bit, exact on both engines
    "q209_dp_noisy_counts" -> (graft.quality.PrivacyAudit.dpNoisyCounts _),
    // exact rolling 7-day actives per day: (user, day) grid expanded
    // by a constant <=7x sequence explode, never a corpus window —
    // sliding distinct counts don't decompose, so this is its own op
    "q210_rolling_actives" -> (graft.operators.EventsOps.rollingActives _),
    // calendar gaps-and-islands: maximal consecutive-day streaks via
    // the day - row_number constant-key trick, histogram output
    "q211_day_streaks" -> (graft.operators.EventsOps.dayStreaks _),
    // mergeSchema reconciliation over two staged snapshot versions
    // (add/drop column pair): per-version presence + value checksums
    "q212_schema_evolution" -> (graft.lake.SchemaEvolution.mergedReadAudit _),
    // deequ-shaped declarative contract suite: one agg pass per table,
    // constraints fan out as explode of structs off the 1-row aggregate
    "q213_contract_audit" -> (graft.quality.Contracts.contractAudit _),
    // sketch-cube rolling actives: per-day KMV min-k sketches merged
    // per trailing window (exact merge algebra), estimate audited
    // against the q210 exact panel at the 3-sigma bound
    "q214_kmv_rolling" -> (graft.operators.Sketches.kmvRollingActives _),
    // weekday-seasonal residual outliers: daily revenue vs its OWN
    // weekday's exact doubled median, MAD-scaled flag — the seasonal
    // completion of the anomaly family (q179 shifts, q200 excursions)
    "q215_seasonal_residuals" -> (graft.operators.StatsAudit.seasonalResiduals _),
    // executed compaction under the gate: stage 16 shards/year, rewrite
    // every partition to the row-law width through the atomic swap,
    // grade the real listing + footer rows + content checksum
    "q216_compaction_exec" -> (graft.lake.Compaction.execRowsAudit _),
    // weekly top-k parts with week-over-week rank memory (bounded-heap
    // aggregate per week, calendar-bounded drift join)
    "q217_topk_drift" -> ((s: SparkSession, d: String) =>
      Relational.weeklyTopkDrift(s, d)),
    // CSV round-trip fidelity with injected separator/quote/newline
    // hazards — the q153 gate shape across the RFC 4180 boundary
    "q218_csv_roundtrip" -> (graft.sources.CsvLake.roundtripAudit _),
    // sweep-line concurrency timeline: 2 boundary deltas per session,
    // prefix sum on the hour relation — the whole curve in one pass
    // where q110 answers per-point stabbing queries
    "q219_concurrency_curve" -> (graft.operators.AsOf.concurrencyCurve _),
    // Zipf rank-frequency fit on floor-log2 coordinates (bin() on both
    // engines) through the q185 exact normal equations
    "q220_zipf_fit" -> (TextOps.zipfFit _),
    // per-source dataset card: volume, language spread, length shape,
    // exact-dup rate — the release panel every public corpus ships
    "q221_dataset_card" -> (graft.operators.CorpusPrep.datasetCard _),
    // B-cubed precision/recall of the LSH dedup clustering against the
    // exact-fingerprint truth — the trust-the-clusters gate; all cell
    // algebra on label-sized relations, no pairwise expansion
    "q222_cluster_eval" -> (Dedup.clusterEval _),
    // TextRank keywords: the damped walk (q154's exact-integer engine)
    // over the vocabulary-bounded word co-occurrence graph (q166's
    // adjacency law) — text × graph composition
    "q223_textrank_keywords" -> (CorpusPrep.textrankKeywords _),
    // common-neighbor/Jaccard link prediction on the co-supply graph:
    // capped wedge generation (the band-cap posture), one anti-join,
    // node-sized degree broadcasts — the prediction fifth of the graph
    // family
    "q224_link_prediction" -> (graft.operators.GraphOps.linkPrediction _),
    // MAP/MRR/P@5/hit-rate in exact ppm over the production IVF top-5
    // with label relevance — the one-row ranking scorecard beside the
    // q90 recall audit
    "q225_retrieval_metrics" -> (Similarity.retrievalLabelMetrics _),
    // per-IVF-bucket coherence outliers: bottom 5% by centroid cosine
    // — the embedding-space twin of the q146 MAD screen
    "q226_centroid_outliers" -> (Similarity.centroidOutliers _),
    // the IVF tuning curve: recall@5 vs brute truth and candidates
    // scanned at nprobe ∈ {1,2,4,8} — one scored relation, four
    // filters, never four searches
    "q227_ivf_probe_sweep" -> (Similarity.ivfProbeSweep _),
    // the LSH operating-point curve: precision/recall/F1 per band
    // threshold vs the exact-Jaccard truth — the dedup twin of q227
    "q228_lsh_band_sweep" -> (Dedup.lshBandSweep _),
    // reliability panel: 1-NN label accuracy per cosine bin — the
    // calibration check before any fixed similarity threshold is
    // trusted
    "q229_knn_calibration" -> (Similarity.knnCalibration _),
    // self-join-size (F2) from an explicit 4×1024 CMS vs the exact
    // pair mass — the planner statistic behind every pair explosion,
    // cell-replayable in SQL unlike the opaque q75 sketch
    "q230_cms_selfjoin_size" -> (Sketches.cmsSelfJoinSize _),
    // per-source novelty of the incoming crawl batch vs the standing
    // corpus (distinct-shingle anti-join) — the keep-crawling signal
    "q231_crawl_novelty" -> (Dedup.crawlNovelty _),
    // the q227 tuning curve on a FIXED 64-query budget — the
    // serving-shaped, linear-in-corpus form for live corpora
    "q232_ivf_sweep_budget" -> (Similarity.ivfProbeSweepBudget _),
    // Kaplan–Meier lifetime survival with right-censoring at the
    // horizon — the churn curve q98's retention matrix biases; the KM
    // product is a per-step-floored fold both engines replay
    "q233_kaplan_meier" -> (EventsOps.kaplanMeier _),
    // version-driven selective backfill, EXECUTED: stale partitions
    // rebuilt in capped waves through the atomic swap, ledger graded
    // against the source-predicted panel
    "q234_backfill_exec" -> (graft.lake.Backfill.backfillExec _),
    // |A ⋈ B| from two explicit CMS rows (sketch inner product) vs the
    // exact keyed join size — the second planner statistic
    "q235_cms_join_size" -> (Sketches.cmsJoinSize _),
    // range selectivity from a 64-bucket equi-width histogram, graded
    // against the partial-bucket error theorem — the third
    "q236_histogram_selectivity" -> (Sketches.histogramSelectivity _),
    // Mann–Whitney U with exact tie handling on the value histogram;
    // rank-biserial effect size in ppm — the nonparametric member of
    // the test family (q143 KS, q202 z²)
    "q237_mann_whitney" -> (graft.operators.StatsAudit.mannWhitneyU _),
    // out-of-orderness profile: lateness quantiles in arrival order —
    // the panel that picks every streaming query's watermark delay
    "q238_watermark_tuning" -> (EventsOps.watermarkTuning _),
    // A/A null calibration: 20 salted no-treatment splits through the
    // q202 z² — the platform-validation gate for the experiment stack
    "q239_aa_calibration" -> (graft.operators.StatsAudit.aaCalibration _),
    // the salt planner: top-10 join keys with exact shares, heavy
    // flags, and the salt factors q111's salted join would consume
    "q240_salt_planner" -> (SkewJoin.saltPlanner _),
    // per-class precision/recall/F1 over the q33 confusion — accuracy
    // hides a never-predicted class; this doesn't
    "q241_langid_prf" -> (TextOps.langIdPrf _),
    // Cohen's kappa over the same confusion — the chance-corrected
    // agreement a dominant class cannot inflate
    "q242_langid_kappa" -> (TextOps.langIdKappa _),
    // the decontamination-aggressiveness curve: q84's plan swept over
    // token n-gram sizes {2,3,5} — what each choice of n costs in
    // flagged train mass
    "q243_decontam_sweep" -> (TextOps.decontamSweep _),
    // executed index commit: train + atomically commit the full IVF/PQ
    // artifact (bucket-partitioned members/codes, model, version
    // sidecar), then audit the COMMITTED tables — the q216/q234
    // executed-lake posture applied to the ANN index
    "q244_ann_index_commit" -> (graft.operators.AnnIndex.commitAudit _),
    // the q106 IVF search served FROM the committed artifact —
    // hash-equal to the live q106 with ZERO corpus re-assignment in
    // the serving plan (AnnIndexSpec locks it)
    "q245_ann_ivf_serve" -> (graft.operators.AnnIndex.ivfServe _),
    // the q108 ADC search served FROM the committed 8-byte code rows
    "q246_ann_ivfpq_serve" -> (graft.operators.AnnIndex.ivfPqServe _),
    // committed-vs-arrivals staleness panel: the artifact's member
    // counts + sidecar version against the fresh-crawl split assigned
    // with the COMMITTED centroids — the q132 handoff
    "q247_ann_index_staleness" -> (graft.operators.AnnIndex.stalenessReport _),
    // the incremental ingest EXECUTED: base-split build, arrivals
    // assigned+coded with the committed model (map-only over the
    // delta), per-bucket upsert commit — only touched buckets rewrite
    "q248_ann_index_ingest" -> (graft.operators.AnnIndex.incrementalIngestCommit _),
    // the staleness-TRIGGERED refresh policy EXECUTED: one lifecycle
    // root walks noop → touched-bucket ingest → full rebuild, decided
    // by threshold against the same growth ppm, each row carrying the
    // post-action committed witnesses (the q247→q248 operational gap)
    "q249_ann_index_refresh" -> (graft.operators.AnnIndex.refreshPolicy _),
    // write amplification under K successive delta waves: per wave,
    // arrivals, touched buckets, member rows physically rewritten by
    // the wholesale bucket swap, amplification ppm, committed total
    "q250_ann_index_write_amp" -> (graft.operators.AnnIndex.fragmentationAudit _),
    // the STREAMING twin of q248: arrivals drain as a parquet file
    // stream, one touched-bucket ingest per micro-batch (foreachBatch,
    // AvailableNow, 1 file/trigger), final artifact hash-equal to the
    // batch ingest — shares q248's oracle verbatim
    "q251_ann_index_ingest_stream" -> (graft.operators.AnnIndex.streamingIngestCommit _),
    // hierarchical (coarse→fine) assignment histogram — the engineered
    // answer to the N^1.5 flat-assignment law the 1000× rehearsal
    // measured: ncoarse ∝ N^(1/4) coarse cells route each row to a
    // ~N^(1/4)-wide fine sublist, O(N^(5/4)) total instead of N^(3/2)
    "q252_ann_hier_assign" -> (Similarity.hierAssignedHistogram _),
    // the recall-cost audit of q252: per fine bucket, hier vs exact
    // flat assignment membership + agreement in exact ppm
    "q253_ann_hier_agreement" -> (Similarity.hierFlatAgreement _),
    // the SEARCH face of the hier cost law: coarse-cell routing on both
    // corpus and query side (O(N^(1/4)·dims) per row), exact cosine
    // re-rank within cprobe probed cells — q106's candidate volume,
    // none of its N^(3/2) assignment term
    "q254_ann_hier_search" -> (Similarity.hierIvfSearch _),
    // brute-truth recall panel: hier-routed vs flat derived search,
    // per query in exact counts + ppm (the q90 audit-only cost class)
    "q255_ann_hier_recall" -> (Similarity.hierRecallAudit _),
    // the hier-routed artifact BUILD executed + audited: the q244
    // commit machinery with the two-level router inside — the build is
    // where the 18× third-decade win lives (8.9 vs 161.9 s at 1000×)
    "q256_ann_hier_index_commit" -> (graft.operators.AnnIndex.hierCommitAudit _),
    // the q254 search served FROM the committed hier artifact —
    // hash-equal to live q254 (the q245≡q106 posture), zero corpus
    // assignment in the serving plan
    "q257_ann_hier_serve" -> (graft.operators.AnnIndex.hierServe _),
    // bucket-mass skew, flat vs hier layout: the graded record of the
    // round's serve finding (hot-bucket concentration under two-level
    // routing) — the number a Lloyd-rebalance must move
    "q258_ann_layout_skew" -> (Similarity.layoutSkewAudit _),
    // ONE within-cell Lloyd step over the hier layout — the rebalance
    // q258 demands, executed: exact integer-mean centroids, rows
    // re-routed, post-step mass distribution + movement in exact ppm
    "q259_ann_hier_rebalance" -> (Similarity.hierLloydRebalance _),
    // the rebalanced artifact COMMITTED: q256's machinery over q259's
    // routing — members keyed by the re-routed buckets, model carrying
    // the updated centroids with their unchanged cells
    "q260_ann_hier_rebalanced_commit" ->
      (graft.operators.AnnIndex.hierRebalancedCommitAudit _),
    // the hier search served FROM the rebalanced artifact — the serve
    // gap's closing measurement (probed buckets now near-uniform)
    "q261_ann_hier_rebalanced_serve" ->
      (graft.operators.AnnIndex.hierRebalancedServe _),
    // the PRODUCTION composition committed: N^(5/4) two-level build +
    // Lloyd-rebalanced layout + 8-byte PQ code rows, one artifact —
    // commit audit reads back members AND codes witnesses + all knobs
    "q262_ann_hierpq_index_commit" ->
      (graft.operators.AnnIndex.hierPqCommitAudit _),
    // the two-level ADC search served FROM that artifact: candidates
    // are committed 8-byte code rows, probes ride the committed model,
    // zero corpus assignment — hash-equal to the live twin (spec-locked)
    "q263_ann_hierpq_adc_serve" ->
      (graft.operators.AnnIndex.hierRebalancedPqServe _),
    // the three-way recall panel (flat / seed-hier / REBALANCED) vs
    // brute truth — the q259 serve win's missing recall number (the
    // q90/q255 audit-only cost class)
    "q264_ann_recall_threeway" -> (Similarity.hierRecallAudit3 _),
    // hier-routed twin of q226: same bottom-5%-per-bucket screen, the
    // N^(5/4) assignment law — flat q226 demoted to audit-only at scale
    "q265_ann_outliers_hier" -> (Similarity.centroidOutliersHier _),
    // hier-routed twin of q229: same reliability binning over the
    // two-level-routed 1-NN relation — flat q229 demoted likewise
    "q266_ann_calibration_hier" -> (Similarity.knnCalibrationHier _),
    // the refresh policy taught the hier lifecycle: noop / ingest /
    // REBALANCE / rebuild arms executed on one hier root, decided off
    // growth ppm + the committed layout's measured bucket-mass skew
    "q267_ann_hier_refresh" -> (graft.operators.AnnIndex.hierRefreshPolicy _),
    // the q250 write-amp MITIGATION engineered: append-mode delta
    // ingest (one file per touched bucket per wave, rows written ∝
    // arrivals) + threshold compaction, both sides graded per wave
    "q268_ann_index_append_ingest" ->
      (graft.operators.AnnIndex.deltaIngestAudit _),
    // the PRODUCTION-layout lifecycle completed: base-split hier-PQ
    // build, arrivals routed with the COMMITTED two-level model and
    // coded with the COMMITTED positional codebook in one map-only
    // delta pass, members AND codes upserted per touched bucket —
    // no N^(5/4)+N^1.5 rebuild at the 5-minute tick
    "q269_ann_hierpq_ingest" ->
      (graft.operators.AnnIndex.hierPqIncrementalIngest _),
    // q268's append + threshold-compaction law extended to the CODES
    // table: both tables write ∝ arrivals per wave, compaction and
    // file bounds measured per table, code mass proves correct coding
    "q270_ann_index_append_codes" ->
      (graft.operators.AnnIndex.deltaIngestCodesAudit _),
    // the STREAMING twin of the append lifecycle: three wave-files
    // drained AvailableNow at maxFilesPerTrigger=1, one appendWave per
    // micro-batch through the lease — appendPartitions' at-least-once
    // anti-join idempotence under the hash gate, not just spec'd
    "q271_ann_index_append_stream" ->
      (graft.operators.AnnIndex.streamingAppendIngest _),
    // the PQ-coding N^1.5 residual priced: q107's coding pass at the
    // CAPPED codebook width — linear decade law, constant LUT, the
    // build-cost twin of the k ∝ √N production coding
    "q272_ann_pq_codes_capped" ->
      (Similarity.pqCappedCodeHistogram _),
    // ...and its recall PRICE measured, not guessed: brute truth vs
    // derived-k ADC vs capped-k ADC, same probes, only k differs
    "q273_ann_adc_recall_capped" ->
      (Similarity.adcCappedRecallAudit _),
    // the SPARSE-tick twin of q269: ≥0.999 split, the 5-minute-cadence
    // delta shape — touched buckets ≪ nlist, tick IO collapsing toward
    // the map-only delta cost (the touched-bucket law under the gate)
    "q274_ann_hierpq_sparse_tick" ->
      (graft.operators.AnnIndex.hierPqSparseTickIngest _),
    // the PRODUCTION layout at the CAPPED width: same rebalanced
    // routing as q262, codebook k = clamp(√(N/4), 8, 64) — coding goes
    // linear, the serve LUT constant (no QueryLutSliceBytes slicing)
    "q275_ann_hierpq_capped_commit" ->
      (graft.operators.AnnIndex.hierPqCappedCommitAudit _),
    // ...and its two-level ADC serve off the capped artifact — the
    // q263 probe discipline, constant 8·k·8-byte LUT at every scale
    "q276_ann_hierpq_capped_serve" ->
      (graft.operators.AnnIndex.hierCappedPqServe _),
    // the cap CHOSEN, not assumed: recall@5 vs brute truth at fixed
    // widths k ∈ {16,32,64,128} — the knee goes on record (q227's
    // commissioning posture; brute-truth audit class)
    "q277_ann_pq_width_sweep" ->
      (Similarity.pqWidthRecallSweep _),
    // the priced width DECISION folded into the lifecycle: q267's
    // four-arm policy over the code-carrying hier-PQ root — members
    // AND codes advance per arm, rebalance re-keys without recoding,
    // and the REBUILD arm builds at the capped width (linear coding)
    "q278_ann_hierpq_refresh_capped" ->
      (graft.operators.AnnIndex.hierPqRefreshPolicy _),
  )

  /** Bench family of every registered query (one coarse label per
    * query), so the bench sidecar can attribute round-over-round
    * movement to a FAMILY subtotal instead of per-query archaeology —
    * at 247 queries one JSON total hides where the time goes. Families
    * mirror the operator modules; RelationalSpec asserts the map covers
    * the registry exactly (an unregistered number maps to
    * "unclassified" and fails the spec, never a runtime throw).
    */
  lazy val queryFamilies: Map[String, String] = {
    def fam(f: String)(ns: Int*): Seq[(Int, String)] = ns.map(_ -> f)
    val byNum: Map[Int, String] = (
      fam("relational")(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
        16, 17, 18, 19, 20, 23, 24, 25, 26, 27, 28, 29, 30, 45, 46, 47, 53,
        58, 59, 69, 71, 97, 98, 101, 102, 103, 110, 111, 112, 113, 114, 115,
        116, 117, 122, 123, 124, 159, 160, 162, 164, 183, 184, 190, 192,
        193, 204, 205, 206, 210, 211) ++
      fam("dedup")(35, 36, 37, 38, 39, 40, 51, 52, 60, 61, 62, 63, 64, 70,
        73, 74, 82, 87, 89, 91, 93, 94, 95, 96, 104, 105, 125, 136, 138,
        140, 141, 144, 145, 172, 208, 222, 228, 231) ++
      fam("ann")(41, 42, 43, 76, 81, 83, 88, 90, 99, 106, 107, 108, 109,
        118, 120, 121, 128, 132, 157, 158, 173, 175, 181, 182, 225, 226,
        227, 229, 232, 244, 245, 246, 247, 248, 249, 250, 251, 252, 253,
        254, 255, 256, 257, 258, 259, 260, 261, 262, 263, 264, 265, 266,
        267, 268, 269, 270, 271, 272, 273, 274, 275, 276, 277, 278) ++
      fam("graph")(154, 176, 178, 189, 194, 207, 223, 224) ++
      fam("text")(31, 32, 33, 34, 50, 66, 67, 72, 78, 84, 85, 92, 100, 130,
        166, 170, 171, 174, 177, 188, 220, 241, 242, 243) ++
      fam("sampling")(48, 49, 65, 68, 79, 86, 119, 131, 151, 155, 165, 186,
        187, 196, 221) ++
      fam("sketch")(55, 56, 75, 77, 80, 135, 139, 142, 197, 214, 230, 235,
        236, 240) ++
      fam("stats")(54, 143, 146, 169, 179, 180, 185, 191, 200, 201, 202,
        203, 209, 215, 217, 233, 237, 239) ++
      fam("streaming")(21, 22, 127, 129, 133, 137, 147, 152, 163, 167, 195,
        238) ++
      fam("lake")(148, 149, 150, 153, 156, 161, 168, 199, 212, 213, 216,
        218, 219, 234) ++
      fam("multimodal")(44, 57, 126, 134, 198)
    ).toMap
    queries.keySet.iterator.map { name =>
      val n = name.drop(1).takeWhile(_.isDigit).toInt
      name -> byNum.getOrElse(n, "unclassified")
    }.toMap
  }

  // Shared SQL fragments for the oracle (DuckDB), delegating to
  // Determinism so the Spark and oracle formulas cannot diverge.
  private def cents(e: String): String = graft.operators.Determinism.centsSql(e)

  // DuckDB SUM(BIGINT) widens to HUGEINT; cast back so the result schema
  // matches Spark's LongType sums exactly.
  private def sumc(e: String): String = s"CAST(SUM(${cents(e)}) AS BIGINT)"

  /** Structurally-real media blob assembly (PNG/JPEG/WAV from the
    * documents corpus) shared by the q126 decode and q134 byte-histogram
    * oracles — must stay byte-identical to
    * [[graft.multimodal.Multimodal.mediaBytesFromDocuments]].
    */
  private val mediaBlobCtes: String =
    """g AS (
      |  SELECT doc_id, doc_id % 3 AS m,
      |    doc_id % 640 + 64 AS w, doc_id % 480 + 48 AS h,
      |    8000 + (doc_id % 8) * 4000 AS rate,
      |    encode(text) AS p, octet_length(encode(text)) AS n
      |  FROM documents),
      |blob AS (
      |  SELECT doc_id, m,
      |    CASE WHEN m = 0 THEN
      |      unhex('89504E470D0A1A0A') || unhex('0000000D') || unhex('49484452') ||
      |      unhex(lpad(hex(w), 8, '0')) || unhex(lpad(hex(h), 8, '0')) ||
      |      unhex('0806000000') || unhex('D0D0D0D0') ||
      |      unhex(lpad(hex(n), 8, '0')) || unhex('49444154') || p || unhex('D0D0D0D0') ||
      |      unhex('00000000') || unhex('49454E44') || unhex('D0D0D0D0')
      |    WHEN m = 1 THEN
      |      unhex('FFD8') || unhex('FFE000104A46494600010100000100010000') ||
      |      unhex('FFC0001108') || unhex(lpad(hex(h), 4, '0')) ||
      |      unhex(lpad(hex(w), 4, '0')) || unhex('03012200021101031101') || p
      |    ELSE
      |      unhex('52494646') ||
      |      unhex(concat(substr(lpad(hex(36 + n), 8, '0'), 7, 2), substr(lpad(hex(36 + n), 8, '0'), 5, 2),
      |        substr(lpad(hex(36 + n), 8, '0'), 3, 2), substr(lpad(hex(36 + n), 8, '0'), 1, 2))) ||
      |      unhex('57415645') || unhex('666D7420') || unhex('10000000') ||
      |      unhex('0100') || unhex('0100') ||
      |      unhex(concat(substr(lpad(hex(rate), 8, '0'), 7, 2), substr(lpad(hex(rate), 8, '0'), 5, 2),
      |        substr(lpad(hex(rate), 8, '0'), 3, 2), substr(lpad(hex(rate), 8, '0'), 1, 2))) ||
      |      unhex(concat(substr(lpad(hex(rate * 2), 8, '0'), 7, 2), substr(lpad(hex(rate * 2), 8, '0'), 5, 2),
      |        substr(lpad(hex(rate * 2), 8, '0'), 3, 2), substr(lpad(hex(rate * 2), 8, '0'), 1, 2))) ||
      |      unhex('0200') || unhex('1000') || unhex('64617461') ||
      |      unhex(concat(substr(lpad(hex(n), 8, '0'), 7, 2), substr(lpad(hex(n), 8, '0'), 5, 2),
      |        substr(lpad(hex(n), 8, '0'), 3, 2), substr(lpad(hex(n), 8, '0'), 1, 2))) || p
      |    END AS c
      |  FROM g)""".stripMargin

  // --- north-star oracle fragments (documents / embeddings) ---
  private val toks = """regexp_split_to_array(trim(text), '\s+')"""

  /** Lexical inverted-index CTEs shared by q157 and q158's sparse side:
    * hashed distinct shingles per doc (the q37-family relation), idf
    * with relative-df admission, posting join, ranked results in
    * `lex(q_id, doc_id, score, rank)`. Mirrors
    * [[graft.operators.Retrieval.lexicalTopKFor]] exactly.
    */
  private lazy val lexCtes = {
    import graft.operators.Retrieval.LexDfFloor
    s"""$shingleCte,
       |lsh AS (SELECT doc_id, $shashSql AS shash FROM sh),
       |lterm AS (SELECT shash, (n * 1000000) // df AS idf
       |  FROM (SELECT shash, COUNT(*) AS df FROM lsh GROUP BY 1) d,
       |       (SELECT COUNT(*) AS n FROM documents) nn
       |  WHERE df <= greatest($LexDfFloor, n // 100)),
       |lpost AS (SELECT lsh.doc_id, lsh.shash, lterm.idf
       |  FROM lsh JOIN lterm USING (shash)),
       |lsc AS (SELECT lq.q_id, lpost.doc_id, SUM(lpost.idf) AS score
       |  FROM (SELECT doc_id AS q_id, shash FROM lpost
       |        WHERE doc_id % 100 = 0) lq
       |  JOIN lpost USING (shash)
       |  WHERE lpost.doc_id <> lq.q_id GROUP BY 1, 2),
       |lex AS (SELECT q_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id ASC) AS rank FROM lsc)""".stripMargin
  }
  // distinct 3-token shingles, 1-based indexing — mirrors Dedup.shingles
  private val shingleList =
    s"list_distinct(list_transform(generate_series(1, len(toks) - 2), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
  private val shingleCte =
    s"""tok AS (SELECT doc_id, source, $toks AS toks FROM documents),
       |da AS (SELECT doc_id, source, $shingleList AS sh_arr
       |       FROM tok WHERE len(toks) >= 3),
       |sh AS (SELECT doc_id, source, CAST(len(sh_arr) AS BIGINT) AS n_sh,
       |       unnest(sh_arr) AS sh FROM da)""".stripMargin
  // 32-bit affine permutation of one shared 48-bit md5 hash — mirrors
  // Dedup.MinhashA/MinhashB/baseHash/mh
  private def mhSql(i: Int): String = {
    import graft.operators.Dedup.{MinhashA, MinhashB}
    s"(${MinhashA(i)} * h + ${MinhashB(i)}) % 4294967296"
  }
  private val baseHashSql =
    "CAST(concat('0x', substr(md5(sh), 1, 12)) AS BIGINT)"
  // 60-bit shingle hash used as the Jaccard pair-join key — mirrors Dedup.shash
  private val shashSql =
    "CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)"

  // winnowed fingerprints: k=5 char-gram polynomial hash (base 257,
  // mod 2^31-1; powers 257^4..257^0 inlined — sums stay < 2^54, exact),
  // min per w=4 window, distinct — mirrors functions.WinnowedFingerprints
  // over TextOps.winnowFps's normalization
  private val winnowCte =
    raw"""norm AS (SELECT doc_id, source,
         |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
         |    FROM documents),
         |g AS (SELECT doc_id, source,
         |    list_transform(generate_series(1, length(t) - 4),
         |      i -> (ascii(substr(t, i, 1)) * 4362470401
         |          + ascii(substr(t, i+1, 1)) * 16974593
         |          + ascii(substr(t, i+2, 1)) * 66049
         |          + ascii(substr(t, i+3, 1)) * 257
         |          + ascii(substr(t, i+4, 1))) % 2147483647) AS hs
         |    FROM norm),
         |f AS (SELECT doc_id, source,
         |    list_distinct(list_transform(generate_series(1, len(hs) - 3),
         |      i -> least(hs[i], hs[i+1], hs[i+2], hs[i+3]))) AS fps
         |    FROM g)""".stripMargin
  // quantized dot product of two float lists — mirrors Similarity.dotQ
  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> " +
      s"CAST(floor($a[i]::DOUBLE * $b[i]::DOUBLE * 1000000000000.0) AS BIGINT))) AS BIGINT)"
  // IVF assignment: centroids = first IvfNlist vectors, every vector lands
  // in its max-quantized-dot centroid's bucket — mirrors
  // Similarity.ivfAssignments (same tie-break: dot DESC, c_id ASC)
  private val ivfCte =
    s"""e AS (SELECT vec_id, embedding,
       |  ${dotSql("embedding", "embedding")} AS n_emb FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
       |          WHERE vec_id < ${graft.operators.Similarity.IvfNlist}),
       |asg AS (
       |  SELECT vec_id, c_id AS bucket FROM (
       |    SELECT e.vec_id, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
       |    FROM e, cents c) t
       |  WHERE rk = 1)""".stripMargin
  // capped IVF-bucketed cosine near-dup pairs (q52's generator), with
  // the threshold applied — ONE definition of "embedding near-dup
  // pair", shared by q52 and the q138 leakage matrix so the two oracles
  // cannot drift on the cap, the quantized dot, or the threshold
  private val cosPairsCtes =
    s"""$ivfCte,
       |ea AS (
       |  SELECT e.vec_id, e.embedding, e.n_emb, asg.bucket,
       |    ROW_NUMBER() OVER (PARTITION BY asg.bucket ORDER BY e.vec_id) AS rn
       |  FROM e JOIN asg ON e.vec_id = asg.vec_id),
       |capped AS (SELECT * FROM ea WHERE rn <= ${graft.operators.Dedup.EmbBucketCap}),
       |cos_pairs AS (
       |  SELECT id_a, id_b, cos_ppm FROM (
       |    SELECT p.id_a, p.id_b,
       |      CAST(floor(CAST(p.dq AS DOUBLE) * 1000000.0 /
       |        (sqrt(CAST(p.n_a AS DOUBLE)) * sqrt(CAST(p.n_b AS DOUBLE)))) AS BIGINT) AS cos_ppm
       |    FROM (
       |      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${dotSql("a.embedding", "b.embedding")} AS dq,
       |        a.n_emb AS n_a, b.n_emb AS n_b
       |      FROM capped a JOIN capped b
       |        ON a.bucket = b.bucket AND a.vec_id < b.vec_id) p) q
       |  WHERE cos_ppm >= ${graft.operators.Dedup.EmbNearDupPpm})""".stripMargin
  // The heavy-tail co-supply edge relation (per-order capped supplier
  // pairs, p95 weight cut from the value histogram) — ONE definition
  // shared by the q176 triangle and q178 k-core oracles, mirroring
  // GraphOps.coSupplyEdges
  private lazy val coSupplyCtes: String = {
    val cap = graft.operators.GraphOps.OrderSuppCap
    s"""po AS (SELECT l_orderkey,
       |    list_slice(list_sort(list(DISTINCT l_suppkey)), 1, $cap) AS ss
       |  FROM lineitem GROUP BY 1),
       |ed0 AS (SELECT unnest(flatten(list_transform(generate_series(1, len(ss) - 1), i ->
       |    list_transform(generate_series(i + 1, len(ss)), j ->
       |      struct_pack(a := ss[i], b := ss[j]))))) AS e FROM po WHERE len(ss) >= 2),
       |wtd AS MATERIALIZED (SELECT e.a AS a, e.b AS b, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM ed0 GROUP BY 1, 2),
       |hist AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM wtd GROUP BY 1),
       |thr AS (SELECT MIN(w) AS thr_w FROM (
       |    SELECT w, SUM(cnt) OVER (ORDER BY w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      (SELECT SUM(cnt) FROM hist) AS n_pairs FROM hist) t
       |  WHERE cum * 20 >= n_pairs * 19),
       |edges AS MATERIALIZED (SELECT a, b FROM wtd, thr WHERE w > thr_w)""".stripMargin
  }

  // The order→part basket relation and its frequent a<b pairs — ONE
  // definition shared by the q183 pair and q184 rule oracles,
  // mirroring Association.baskets/frequentPairsFor
  private lazy val basketCtes: String = {
    val cap = graft.operators.Association.BasketItemCap
    val minS = graft.operators.Association.MinSupport
    s"""bk AS MATERIALIZED (SELECT l_orderkey,
       |    list_slice(list_sort(list(DISTINCT l_partkey)), 1, $cap) AS ps
       |  FROM lineitem GROUP BY 1),
       |pr AS (SELECT e.a AS p_a, e.b AS p_b, CAST(COUNT(*) AS BIGINT) AS support
       |  FROM (SELECT unnest(flatten(list_transform(generate_series(1, len(ps) - 1), i ->
       |      list_transform(generate_series(i + 1, len(ps)), j ->
       |        struct_pack(a := ps[i], b := ps[j]))))) AS e
       |    FROM bk WHERE len(ps) >= 2) t GROUP BY 1, 2),
       |fp AS MATERIALIZED (SELECT * FROM pr WHERE support >= $minS)""".stripMargin
  }

  // The PIT enrichment panel (state valid at each fact's timestamp,
  // rolled up per (state, fact type)) — ONE definition shared by the
  // batch (q190) and streaming-drain (q195) forms
  private lazy val pitPanelOracle: String = {
    val states = graft.operators.EventsOps.PitStateTypes
      .map(s => s"'$s'").mkString(", ")
    s"""WITH e AS (SELECT event_id, user_id, event_type, value,
       |    epoch_us(ts) AS ts_us FROM events),
       |s AS (SELECT *, CASE WHEN event_type IN ($states)
       |        THEN event_type END AS state_evt FROM e),
       |f AS (SELECT *, last_value(state_evt IGNORE NULLS) OVER (
       |        PARTITION BY user_id ORDER BY ts_us, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
       |      FROM s)
       |SELECT state, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(${cents("value")}) AS BIGINT) AS value_c
       |FROM f WHERE event_type IN ('view', 'click')
       |GROUP BY 1, 2""".stripMargin
  }

  // Per-user pre/post sums + hash variant — ONE definition shared by
  // the q201 CUPED and q202 proportion oracles, mirroring
  // StatsAudit.abUsers (day-of-month < AbSplitDay is the pre period)
  private lazy val abUsersCte: String = {
    val split = graft.operators.StatsAudit.AbSplitDay
    s"""au AS MATERIALIZED (SELECT user_id,
       |    CAST(SUM(pre * v_c) AS BIGINT) AS x_c,
       |    CAST(SUM((1 - pre) * v_c) AS BIGINT) AS y_c,
       |    CAST(MAX((1 - pre) * is_purchase *
       |      CASE WHEN v_c > ${graft.operators.StatsAudit.ConvertCentsMin}
       |        THEN 1 ELSE 0 END) AS BIGINT) AS converted,
       |    CASE WHEN CAST(concat('0x', substr(md5(
       |        concat(CAST(user_id AS VARCHAR), '#ab')), 1, 8)) AS BIGINT)
       |      % 1000000 < 500000 THEN 'A' ELSE 'B' END AS variant
       |  FROM (SELECT user_id,
       |      CASE WHEN day(ts) < $split THEN 1 ELSE 0 END AS pre,
       |      ${cents("value")} AS v_c,
       |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
       |    FROM events) t
       |  GROUP BY 1)""".stripMargin
  }

  // The fixed-round synchronous-LPA label chain over a preceding
  // `edges` CTE (adjacency, identity seed, one argmax block per round)
  // — ONE definition shared by the q189 trajectory and q194 modularity
  // oracles, mirroring GraphOps.lpaRound (count DESC, label ASC)
  private def lpaChainCtes(rounds: Int): String = {
    def lpaCtes(r: Int): String =
      s"""cnt_$r AS (SELECT t.s, l.label, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM adj t JOIN lbl_${r - 1} l ON t.nb = l.s GROUP BY 1, 2),
         |lbl_$r AS MATERIALIZED (SELECT s, label FROM (
         |    SELECT s, label, ROW_NUMBER() OVER (PARTITION BY s
         |      ORDER BY n DESC, label ASC) AS rk FROM cnt_$r) t
         |  WHERE rk = 1)""".stripMargin
    s"""adj AS MATERIALIZED (SELECT a AS s, b AS nb FROM edges
       |  UNION ALL SELECT b AS s, a AS nb FROM edges),
       |lbl_0 AS MATERIALIZED (SELECT s, s AS label FROM
       |  (SELECT a AS s FROM edges UNION SELECT b AS s FROM edges) t),
       |${(1 to rounds).map(lpaCtes).mkString(",\n")}""".stripMargin
  }

  // The capped-bucket 1-NN relation `p` over a bucketed `e`/`asg`
  // prefix — ONE definition shared by the q181/q182 confusion matrices
  // and the q229/q266 calibration panels so the probe semantics cannot
  // drift; parameterized by the embedding relation (must carry n_emb)
  // and the assignment relation (must carry bucket) so the flat and
  // hier-routed forms replay the SAME pair algebra
  private lazy val knnNn1Ctes: String = knnNn1CtesOver("e", "asg")

  private def knnNn1CtesOver(eRel: String, asgRel: String): String =
    s"""lb AS (SELECT vec_id, label FROM embeddings),
       |ea AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, e.n_emb, asg.bucket, lb.label,
       |    ROW_NUMBER() OVER (PARTITION BY asg.bucket ORDER BY e.vec_id) AS rn
       |  FROM $eRel e JOIN $asgRel asg ON e.vec_id = asg.vec_id
       |  JOIN lb ON e.vec_id = lb.vec_id),
       |capped AS MATERIALIZED (SELECT * FROM ea
       |  WHERE rn <= ${graft.operators.Dedup.EmbBucketCap}),
       |p AS (SELECT x.vec_id, x.label AS label_true, y.label AS label_pred,
       |    CAST(floor(CAST(${dotSql("x.embedding", "y.embedding")} AS DOUBLE)
       |      * 1000000.0 / (sqrt(CAST(x.n_emb AS DOUBLE))
       |      * sqrt(CAST(y.n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm,
       |    ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
       |      CAST(floor(CAST(${dotSql("x.embedding", "y.embedding")} AS DOUBLE)
       |        * 1000000.0 / (sqrt(CAST(x.n_emb AS DOUBLE))
       |        * sqrt(CAST(y.n_emb AS DOUBLE)))) AS BIGINT) DESC,
       |      y.vec_id ASC) AS rk
       |  FROM capped x JOIN capped y
       |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)""".stripMargin

  private lazy val knnConfusionTail: String =
    s"""$knnNn1Ctes
       |SELECT CAST(label_true AS BIGINT) AS label_true,
       |  CAST(label_pred AS BIGINT) AS label_pred,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM p WHERE rk = 1 GROUP BY 1, 2""".stripMargin

  // The derived-width (nlist = max(16, √N)) e/cents/asg prefix —
  // shared by the q182 confusion and q229 calibration oracles
  private lazy val derivedAsgPrefix: String =
    s"""e AS (SELECT vec_id, embedding,
       |  ${dotSql("embedding", "embedding")} AS n_emb FROM embeddings),
       |nl AS (SELECT GREATEST(${graft.operators.Similarity.IvfNlist},
       |         CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM e),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
       |          FROM e, nl WHERE vec_id < nl.nlist),
       |asg AS (
       |  SELECT vec_id, c_id AS bucket FROM (
       |    SELECT e.vec_id, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
       |    FROM e, cents c) t
       |  WHERE rk = 1)""".stripMargin

  private val bpeStepRange = 1 to graft.operators.CorpusPrep.BpeSteps

  // The greedy-BPE CTE chain (w0/e0/r_0 + one window-algebra block per
  // merge round) — ONE definition shared by the q174 (train) and q177
  // (encode) oracles so the merge semantics cannot drift between them
  private def bpeStepCtes(k: Int): String =
    s"""n_$k AS (SELECT word, w_cnt, pos, sym,
       |    LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r_${k - 1}),
       |top_$k AS (SELECT sym AS a, nxt AS b, CAST(SUM(w_cnt) AS BIGINT) AS cnt
       |    FROM n_$k WHERE nxt IS NOT NULL GROUP BY 1, 2
       |    ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
       |m_$k AS (SELECT n.*, t.a, t.b, t.cnt,
       |    CASE WHEN n.sym = t.a AND n.nxt = t.b THEN 1 ELSE 0 END AS marked
       |  FROM n_$k n, top_$k t),
       |g_$k AS (SELECT *, pos - SUM(marked) OVER (PARTITION BY word ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m_$k),
       |a_$k AS (SELECT *, CASE WHEN marked = 1 AND (pos - MIN(pos) OVER
       |    (PARTITION BY word, grp, marked)) % 2 = 0 THEN 1 ELSE 0 END AS active
       |  FROM g_$k),
       |p_$k AS (SELECT *, COALESCE(LAG(active) OVER (PARTITION BY word ORDER BY pos), 0)
       |    AS prev_active FROM a_$k),
       |r_$k AS (SELECT word, w_cnt,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
       |    CASE WHEN active = 1 THEN sym || nxt ELSE sym END AS sym
       |  FROM p_$k WHERE prev_active = 0)""".stripMargin

  private lazy val bpeCtes: String =
    s"""w0 AS (SELECT word, COUNT(*) AS w_cnt FROM
       |    (SELECT unnest($toks) AS word FROM documents) u
       |  WHERE word <> '' GROUP BY 1),
       |e0 AS (SELECT word, w_cnt, unnest(list_transform(
       |    generate_series(1, length(word)),
       |    i -> struct_pack(pos := i, sym := substr(word, i, 1)))) AS e FROM w0),
       |r_0 AS (SELECT word, w_cnt, CAST(e.pos AS BIGINT) AS pos, e.sym AS sym
       |  FROM e0),
       |${bpeStepRange.map(bpeStepCtes).mkString(",\n")}""".stripMargin

  // train/val/test assignment of an id column by md5 bucket — the ONE
  // replay of Sampling.split's rule, shared by the q136/q138 leakage
  // oracles (thresholds derived from the same constants as the Scala
  // side's defaults)
  private def splitRelSql(table: String, idCol: String): String = {
    import graft.operators.Sampling
    val t1 = (Sampling.DefaultTrainRate * Sampling.Buckets).toLong
    val t2 = ((Sampling.DefaultTrainRate + Sampling.DefaultValRate) * Sampling.Buckets).toLong
    s"""SELECT $idCol,
       |    CASE WHEN hb < $t1 THEN 'train' WHEN hb < $t2 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT $idCol,
       |      CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT)
       |        % ${Sampling.Buckets} AS hb FROM $table) t""".stripMargin
  }
  // KMV distinct replay at sketch size k, graded at boundPpm — shared
  // by the pinned-k oracle (q135) and its derived-k twin (q139) so the
  // estimator algebra cannot diverge between the two
  private def kmvSql(k: Int, boundPpm: Long): String =
    s"""WITH $shingleCte,
       |h AS (SELECT DISTINCT
       |    CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS hv FROM sh),
       |mink AS (SELECT hv FROM h ORDER BY hv ASC LIMIT $k),
       |s AS (SELECT MAX(hv) AS h_k, COUNT(*) AS n_kept FROM mink),
       |ex AS (SELECT COUNT(DISTINCT sh) AS exact_ndv FROM sh),
       |est AS (SELECT CAST($k AS BIGINT) AS k,
       |    CAST(n_kept AS BIGINT) AS n_kept, h_k,
       |    CAST(CASE WHEN n_kept < $k THEN n_kept
       |      ELSE (n_kept - 1) * 4294967296 // greatest(h_k, 1) END AS BIGINT) AS est_ndv,
       |    CAST(exact_ndv AS BIGINT) AS exact_ndv
       |  FROM s, ex)
       |SELECT k, n_kept, h_k, est_ndv, exact_ndv,
       |  CAST(abs(est_ndv - exact_ndv) * 1000000 // exact_ndv AS BIGINT) AS err_ppm,
       |  (abs(est_ndv - exact_ndv) * 1000000 // exact_ndv) <= $boundPpm AS kmv_ok
       |FROM est""".stripMargin

  // minhash → bands → capped buckets → candidate pairs — the full q39
  // pipeline as CTEs, shared by q39 itself and q70's component closure.
  // The tail (everything after the shared shingle CTE) is separate so
  // q96 can compose it with q37's chain under ONE shingle scan.
  private val lshPairsTail =
    s"""hh AS (SELECT doc_id, $baseHashSql AS h FROM sh),
       |sig AS (SELECT doc_id,
       |${(0 until 8).map(i => s"  MIN(${mhSql(i)}) AS mh$i").mkString(",\n")}
       |  FROM hh GROUP BY doc_id),
       |bands AS (
       |${(0 until 4).map(b =>
          s"  SELECT doc_id, $b AS band, mh${2 * b} AS k1, mh${2 * b + 1} AS k2 FROM sig")
          .mkString("\n  UNION ALL\n")}),
       |rk AS (SELECT doc_id, band, k1, k2,
       |  ROW_NUMBER() OVER (PARTITION BY band, k1, k2 ORDER BY doc_id) AS rn
       |  FROM bands),
       |capped AS (SELECT doc_id, band, k1, k2 FROM rk
       |           WHERE rn <= ${graft.operators.Dedup.BandCap}),
       |lsh_pairs AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, COUNT(*) AS n_bands
       |  FROM capped l JOIN capped r ON l.band = r.band AND l.k1 = r.k1
       |    AND l.k2 = r.k2 AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  private val lshPairsCtes = s"""$shingleCte,\n$lshPairsTail"""

  // The q33 lang-ID confusion relation `cm(lang, pred_lang, n)` — ONE
  // definition shared by q33 itself and the q241/q242 metric oracles
  private lazy val langidCmCte: String =
    s"""scored AS (
       |  SELECT lang, $langScores
       |  FROM (SELECT lang, $toks AS toks FROM documents) d),
       |pred AS (
       |  SELECT lang, CASE
       |    WHEN greatest(score_en, score_es, score_de, score_zh) = 0 THEN 'und'
       |    WHEN score_en = greatest(score_en, score_es, score_de, score_zh) THEN 'en'
       |    WHEN score_es = greatest(score_en, score_es, score_de, score_zh) THEN 'es'
       |    WHEN score_de = greatest(score_en, score_es, score_de, score_zh) THEN 'de'
       |    ELSE 'zh' END AS pred_lang
       |  FROM scored),
       |cm AS (SELECT lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2)""".stripMargin
  private val langScores =
    """len(list_filter(toks, t -> t IN ('the','a','of','and'))) AS score_en,
      |    len(list_filter(toks, t -> t IN ('el','la','de','y'))) AS score_es,
      |    len(list_filter(toks, t -> t IN ('der','die','und','das'))) AS score_de,
      |    len(list_filter(toks, t -> t IN ('shi','le','bu','ma'))) AS score_zh""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumc("l_quantity")} AS sum_qty_c,
         |  ${sumc("l_extendedprice")} AS sum_base_c,
         |  ${sumc("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_c,
         |  ${sumc("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge_c,
         |  COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, ${cents("l_extendedprice")} AS price_c
         |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q03_topk_orders" ->
      s"""SELECT o_orderkey, ${cents("o_totalprice")} AS price_c
         |FROM orders ORDER BY price_c DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_region_revenue" ->
      s"""SELECT r_name, ${sumc("o_totalprice")} AS revenue_c, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,
    "q05_latest_order_join" ->
      s"""SELECT o.o_custkey, o.o_orderkey,
         |  CAST(epoch(o.o_orderdate) AS BIGINT) AS od_epoch,
         |  ${cents("o.o_totalprice")} AS price_c
         |FROM orders o
         |JOIN (SELECT o_custkey, MAX(o_orderdate) AS o_orderdate
         |      FROM orders GROUP BY o_custkey) m
         |  ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.o_orderdate""".stripMargin,
    "q06_latest_order_window" ->
      s"""SELECT o_custkey, o_orderkey, od_epoch, price_c FROM (
         |  SELECT o_custkey, o_orderkey,
         |    CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch,
         |    ${cents("o_totalprice")} AS price_c,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |  FROM orders) t
         |WHERE rn = 1""".stripMargin,
    "q07_unpivot_lineitem" ->
      s"""SELECT l_orderkey, l_linenumber, category, amount_c FROM (
         |  SELECT l_orderkey, l_linenumber, 'quantity' AS category, ${cents("l_quantity")} AS amount_c FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'extendedprice', ${cents("l_extendedprice")} FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'discount', ${cents("l_discount")} FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'tax', ${cents("l_tax")} FROM lineitem) u
         |WHERE amount_c IS NOT NULL AND amount_c <> 0""".stripMargin,
    "q08_distinct_years" ->
      """SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS order_year
        |FROM orders ORDER BY order_year DESC""".stripMargin,
    "q09_grouped_max" ->
      s"""SELECT event_type, MAX(${cents("value")}) AS max_value_c, COUNT(*) AS n
         |FROM events GROUP BY event_type""".stripMargin,
    "q10_lag_monotonic" ->
      s"""SELECT user_id, event_id, value_c, prev_c FROM (
         |  SELECT user_id, event_id, ${cents("value")} AS value_c,
         |    LAG(${cents("value")}) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_c
         |  FROM events) t
         |WHERE prev_c IS NOT NULL AND value_c > prev_c""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q13_pivot_returnflag" ->
      s"""SELECT l_linestatus,
         |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_a_c,
         |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_n_c,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_r_c
         |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q14_filtered_totals" ->
      s"""SELECT
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS finished_total_c,
         |  ${sumc("o_totalprice")} AS grand_total_c,
         |  COUNT(*) AS n_orders
         |FROM orders""".stripMargin,
    "q15_sum_case_priority" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS finished_c,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS open_c,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS pending_c,
         |  COUNT(*) AS n
         |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q16_horizontal_sum" ->
      s"""SELECT out_of_tolerance, COUNT(*) AS n,
         |  CAST(SUM(computed_c) AS BIGINT) AS sum_computed_c
         |FROM (
         |  SELECT
         |    ${cents("COALESCE(l_quantity, 0.0)")} + ${cents("COALESCE(l_discount, 0.0)")}
         |      + ${cents("COALESCE(l_tax, 0.0)")} AS computed_c,
         |    ${cents("l_extendedprice")} AS declared_c
         |  FROM lineitem) t,
         |  LATERAL (SELECT abs(declared_c - computed_c) * 100 > declared_c AS out_of_tolerance) x
         |GROUP BY out_of_tolerance""".stripMargin,
    "q17_value_remap" ->
      """SELECT CASE event_type
        |    WHEN 'purchase' THEN 'revenue'
        |    WHEN 'signup' THEN 'growth'
        |    WHEN 'error' THEN 'incident'
        |    ELSE event_type END AS event_class,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q18_regexp_extract" ->
      """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS source_num,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q19_rlike_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE regexp_matches(text, 'spark (group|query)')""".stripMargin,
    "q20_json_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_mod,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1""".stripMargin,
    "q21_events_hourly" ->
      s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch, event_type,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q22_tumbling_window" ->
      s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch, event_type,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q23_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q24_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q25_union_nations" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin,
    "q26_distinct_partsupp" ->
      "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    "q27_forward_fill" ->
      s"""SELECT user_id, event_id,
         |  last_value(CASE WHEN event_type = 'click' THEN NULL
         |                  ELSE ${cents("value")} END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c
         |FROM events""".stripMargin,
    "q28_running_sum" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(${cents("value")})
         |    OVER (PARTITION BY user_id ORDER BY event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
         |FROM events""".stripMargin,
    "q29_bulk_cast" ->
      s"""SELECT CAST(c_custkey AS VARCHAR) AS custkey_str,
         |  upper(c_mktsegment) AS segment_uc,
         |  CAST(c_nationkey AS BIGINT) AS nationkey_l,
         |  ${cents("c_acctbal")} AS acctbal_c
         |FROM customer""".stripMargin,
    "q30_row_counts" ->
      """SELECT 'region' AS tbl, COUNT(*) AS n_rows FROM region
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'events', COUNT(*) FROM events
        |UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings""".stripMargin,
    "q31_text_stats" ->
      s"""SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
         |FROM documents""".stripMargin,
    "q32_token_frequency" ->
      s"""SELECT token, COUNT(*) AS n
         |FROM (SELECT unnest($toks) AS token FROM documents) t
         |GROUP BY token HAVING COUNT(*) >= 5""".stripMargin,
    "q33_langid_confusion" ->
      s"""WITH $langidCmCte
         |SELECT lang, pred_lang, n FROM cm""".stripMargin,
    "q34_quality_buckets" ->
      s"""WITH d AS (
         |  SELECT doc_id, len($toks) AS n_tokens,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS char_total,
         |    len(list_filter($toks,
         |      t -> t IN ('the','a','of','and','is','to','in'))) AS n_stop
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, n_tokens, CASE
         |    WHEN n_tokens < 10 THEN 'too_short'
         |    WHEN n_stop * 1000000 // n_tokens > 400000 THEN 'boilerplate'
         |    WHEN char_total * 1000000 // n_tokens > 9000000 THEN 'garbled'
         |    ELSE 'ok' END AS bucket
         |  FROM d WHERE n_tokens > 0)
         |SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  MIN(doc_id) AS min_doc
         |FROM b GROUP BY bucket""".stripMargin,
    "q35_fingerprint_clusters" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |  COUNT(*) AS n_dups, MIN(doc_id) AS min_doc
        |FROM documents GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,
    "q36_dedup_keep_first" ->
      """SELECT MIN(doc_id) AS doc_id FROM documents
        |GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))""".stripMargin,
    // shingles with document frequency > DfCap are dropped (Dedup's
    // quadratic-blowup guard) — mirrored here as the HAVING upper bound
    "q37_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, source, n_sh, $shashSql AS shash FROM sh),
         |keep AS (SELECT source, shash FROM hs GROUP BY 1, 2
         |         HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.Dedup.DfCap}),
         |hs2 AS (SELECT hs.* FROM hs JOIN keep USING (source, shash)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM hs2 a JOIN hs2 b ON a.source = b.source AND a.shash = b.shash
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b,
         |  CAST(inter * 1000000 // (n_a + n_b - inter) AS BIGINT) AS jaccard_ppm
         |FROM pairs
         |WHERE inter * 1000000 // (n_a + n_b - inter) >= 300000""".stripMargin,
    // NOT EXISTS, not NOT IN: under three-valued logic a single NULL fp
    // in the corpus subquery would empty a NOT IN result, while the
    // engine's left_anti join keeps NULL-keyed batch rows
    "q61_incremental_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT MIN(doc_id) AS doc_id FROM fp
        |WHERE NOT EXISTS (SELECT 1 FROM fp c
        |  WHERE c.doc_id % 5 <> 0 AND c.fp = fp.fp)
        |GROUP BY fp""".stripMargin,
    // same pair CTE as q37, asymmetric containment projection
    "q62_containment_pairs" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, source, n_sh, $shashSql AS shash FROM sh),
         |keep AS (SELECT source, shash FROM hs GROUP BY 1, 2
         |         HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.Dedup.DfCap}),
         |hs2 AS (SELECT hs.* FROM hs JOIN keep USING (source, shash)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM hs2 a JOIN hs2 b ON a.source = b.source AND a.shash = b.shash
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b,
         |  CAST(inter * 1000000 // n_a AS BIGINT) AS cont_a_ppm,
         |  CAST(inter * 1000000 // n_b AS BIGINT) AS cont_b_ppm
         |FROM pairs
         |WHERE greatest(inter * 1000000 // n_a, inter * 1000000 // n_b) >= 500000""".stripMargin,
    // winnowing (SIGMOD'03): polynomial rolling hash over normalized
    // char 5-grams mod 2^31-1 (exact integer math both engines), min per
    // 4-window, distinct — mirrors functions.WinnowedFingerprints
    "q63_winnow_profile" ->
      s"""WITH $winnowCte
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
         |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
         |FROM f WHERE len(fps) > 0""".stripMargin,
    "q64_winnow_overlap" ->
      s"""WITH $winnowCte,
         |e AS (SELECT doc_id, source, CAST(len(fps) AS BIGINT) AS n_fp,
         |      unnest(fps) AS fp FROM f),
         |keep AS (SELECT source, fp FROM e GROUP BY 1, 2
         |         HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.Dedup.DfCap}),
         |e2 AS (SELECT e.* FROM e JOIN keep USING (source, fp)),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.n_fp AS n_a, b.n_fp AS n_b, COUNT(*) AS shared
         |  FROM e2 a JOIN e2 b ON a.source = b.source AND a.fp = b.fp
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b,
         |  CAST(shared * 1000000 // least(n_a, n_b) AS BIGINT) AS score_ppm
         |FROM p
         |WHERE shared * 1000000 // least(n_a, n_b) >= ${graft.operators.TextOps.WinnowScorePpm}""".stripMargin,
    "q38_minhash_signatures" ->
      s"""WITH $shingleCte,
         |hh AS (SELECT doc_id, $baseHashSql AS h FROM sh)
         |SELECT doc_id,
         |${(0 until 8).map(i => s"  MIN(${mhSql(i)}) AS mh$i").mkString(",\n")}
         |FROM hh GROUP BY doc_id""".stripMargin,
    "q39_lsh_candidates" ->
      s"""WITH $lshPairsCtes
         |SELECT doc_a, doc_b, n_bands FROM lsh_pairs""".stripMargin,
    "q70_dedup_components" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
         |          UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(doc, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc)
         |SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |FROM reach GROUP BY doc""".stripMargin,
    "q40_simhash" ->
      s"""WITH tv AS (
         |  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS tv
         |  FROM (SELECT doc_id, unnest($toks) AS tok FROM documents) t),
         |v AS (SELECT doc_id,
         |${(0 until 32).map(b => s"  SUM(2 * ((tv >> $b) & 1) - 1) AS s$b").mkString(",\n")}
         |  FROM tv GROUP BY doc_id)
         |SELECT doc_id, CAST(${(0 until 32).map(b =>
            s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |FROM v""".stripMargin,
    "q41_knn_bruteforce" -> q41Sql,
    // the aggregate formulation is result-identical by contract: the
    // oracle IS q41's (same scoring, same total order, same k)
    "q123_topk_aggregate" -> q41Sql,
    "q42_knn_ivf" ->
      s"""WITH $ivfCte,
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n_emb AS n_q
         |      FROM e WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, q_emb, n_q, c_id AS bucket FROM (
         |    SELECT q.q_id, q.q_emb, q.n_q, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM q, cents c) t
         |  WHERE rk <= ${graft.operators.Similarity.IvfNprobe}),
         |cand AS (
         |  SELECT p.q_id, e.vec_id, p.n_q, e.n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN probes p ON asg.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |c AS (
         |  SELECT q_id, vec_id,
         |    CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm
         |  FROM cand)
         |SELECT q_id, neighbor_id, cos_ppm, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |  FROM c) t
         |WHERE rank <= 5""".stripMargin,
    // buckets bounded to EmbBucketCap smallest vec_ids — mirrors the
    // deterministic truncation in Dedup.embeddingNearDupBucketedFor
    "q52_embed_neardup_bucketed" ->
      s"""WITH $cosPairsCtes
         |SELECT id_a, id_b, cos_ppm FROM cos_pairs""".stripMargin,
    // exact COUNT(DISTINCT) per column is the hash target; the hll_ok_*
    // booleans are TRUE on the oracle side — if Spark's HLL estimate ever
    // drifts past 3·rsd of exact, the hash mismatches and the round fails
    "q55_cardinality_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_orderkey) AS ndv_o_orderkey, TRUE AS hll_ok_o_orderkey,
        |  COUNT(DISTINCT o_custkey) AS ndv_o_custkey, TRUE AS hll_ok_o_custkey,
        |  COUNT(DISTINCT o_orderstatus) AS ndv_o_orderstatus, TRUE AS hll_ok_o_orderstatus,
        |  COUNT(DISTINCT o_totalprice) AS ndv_o_totalprice, TRUE AS hll_ok_o_totalprice,
        |  COUNT(DISTINCT o_orderdate) AS ndv_o_orderdate, TRUE AS hll_ok_o_orderdate,
        |  COUNT(DISTINCT o_orderpriority) AS ndv_o_orderpriority, TRUE AS hll_ok_o_orderpriority
        |FROM orders""".stripMargin,
    // exact half of the skew profile (count + max of per-key counts);
    // the GK quantile half is audited in q80
    "q56_key_skew_profile" ->
      """SELECT COUNT(*) AS n_keys, MAX(n) AS max_n
        |FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey) t""".stripMargin,
    // exact value-at-rank p50/p99 of the per-key-count distribution is
    // the hash target (q77's audit shape); gk_ok checks percentile_approx
    // against its rank-error contract and is TRUE here
    "q80_key_skew_quantiles" ->
      """WITH c AS (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn,
        |      COUNT(*) OVER () AS cnt FROM c)
        |SELECT CAST(SUM(CASE WHEN rn = (cnt + 1) // 2 THEN n ELSE 0 END) AS BIGINT) AS p50_n,
        |  CAST(SUM(CASE WHEN rn = (99 * cnt + 99) // 100 THEN n ELSE 0 END) AS BIGINT) AS p99_n,
        |  TRUE AS gk_ok
        |FROM r""".stripMargin,
    "q43_norm_stats" ->
      s"""SELECT label, COUNT(*) AS n,
         |  CAST(SUM(nq) AS BIGINT) AS sum_norm_q,
         |  MIN(nq) AS min_norm_q, MAX(nq) AS max_norm_q
         |FROM (SELECT label, ${dotSql("embedding", "embedding")} AS nq
         |      FROM embeddings) t
         |GROUP BY label""".stripMargin,
    "q50_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(len($toks) AS BIGINT) AS n_ws_tokens
         |FROM documents""".stripMargin,
    "q51_embed_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nq
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${dotSql("a.embedding", "b.embedding")} AS dq,
         |    a.nq AS n_a, b.nq AS n_b
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  CAST(floor(CAST(dq AS DOUBLE) * 1000000.0 /
         |    (sqrt(CAST(n_a AS DOUBLE)) * sqrt(CAST(n_b AS DOUBLE)))) AS BIGINT) AS cos_ppm
         |FROM p
         |WHERE CAST(floor(CAST(dq AS DOUBLE) * 1000000.0 /
         |    (sqrt(CAST(n_a AS DOUBLE)) * sqrt(CAST(n_b AS DOUBLE)))) AS BIGINT) >= 400000""".stripMargin,
    "q53_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch,
         |  ${sumc("l_extendedprice * (1.0 - l_discount)")} AS revenue_c
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY 1, 2
         |ORDER BY revenue_c DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q54_forecast_revenue" ->
      s"""SELECT ${sumc("l_extendedprice * l_discount")} AS revenue_c,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
         |  AND l_shipdate < TIMESTAMP '1995-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q60_curation_summary" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS char_total,
         |    CAST(len(list_filter($toks,
         |      t -> t IN ('the','a','of','and','is','to','in'))) AS BIGINT) AS n_stop
         |  FROM documents),
         |keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM d
         |         WHERE n_tokens > 0 GROUP BY fp),
         |gated AS (
         |  SELECT d.* FROM d JOIN keep USING (fp, doc_id)
         |  WHERE d.n_tokens >= 10
         |    AND d.n_stop * 1000000 // d.n_tokens <= 400000
         |    AND d.char_total * 1000000 // d.n_tokens <= 9000000),
         |sp AS (
         |  SELECT lang, n_tokens,
         |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |              % 1000000 < 800000 THEN 'train'
         |         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |              % 1000000 < 900000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM gated)
         |SELECT split, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM sp GROUP BY 1, 2""".stripMargin,
    "q57_frame_sample" ->
      """SELECT doc_id AS media_id, n_chars * 40 AS duration_ms,
        |  unnest(generate_series(0, n_chars * 40 - 1, 1000)) AS frame_ms
        |FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0""".stripMargin,
    "q58_json_struct" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) >= 50 AS k_high,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1""".stripMargin,
    "q59_rolling_hour_sum" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(${cents("value")}) OVER (
         |    PARTITION BY user_id ORDER BY epoch_ns(ts)
         |    RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS hour_sum_c
         |FROM events""".stripMargin,
    "q48_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 1000000 < 100000""".stripMargin,
    "q65_stratified_mix" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 1000000 AS bucket
        |  FROM documents),
        |k AS (SELECT lang, COUNT(*) AS n_kept FROM b
        |      WHERE bucket < CASE WHEN lang = 'en' THEN 250000 ELSE 1000000 END
        |      GROUP BY 1),
        |t AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1)
        |SELECT t.lang, t.n_total, COALESCE(k.n_kept, 0) AS n_kept
        |FROM t LEFT JOIN k USING (lang)""".stripMargin,
    "q49_split_distribution" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 1000000 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 800000 THEN 'train'
        |            WHEN bucket < 900000 THEN 'val'
        |            ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q45_asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_ns(ts) AS ts_ns, 1 AS side, event_id,
        |    CAST(NULL AS BIGINT) AS rv
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_ns(ts), 0, NULL, event_id
        |  FROM events WHERE event_type = 'signup'),
        |w AS (
        |  SELECT user_id, event_id, side,
        |    last_value(rv IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_ns ASC, side ASC, rv ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_event
        |  FROM tagged)
        |SELECT user_id, event_id, asof_signup_event FROM w WHERE side = 1""".stripMargin,
    "q46_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |b AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, CAST(SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |      FROM b)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
         |  ${sumc("value")} AS value_c
         |FROM s GROUP BY 1, 2""".stripMargin,
    "q47_rollup" ->
      s"""SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
         |  ${sumc("o_totalprice")} AS revenue_c, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q44_media_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
        |  md5(text) AS content_md5,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(n_chars * 40 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,
    "q66_repetition_profile" ->
      s"""WITH f AS (
         |  SELECT doc_id, $toks AS toks FROM documents
         |  WHERE len($toks) >= 2),
         |t0 AS (
         |  SELECT doc_id, 't' AS kind, unnest(toks) AS vs FROM f
         |  UNION ALL
         |  SELECT doc_id, 'b' AS kind,
         |    unnest(list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i + 1])) AS vs
         |  FROM f),
         |t AS (SELECT doc_id, kind,
         |        CAST(concat('0x', substr(md5(vs), 1, 15)) AS BIGINT) AS v
         |      FROM t0),
         |c AS (SELECT doc_id, kind, v, COUNT(*) AS cnt FROM t GROUP BY 1, 2, 3),
         |a AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN kind = 't' THEN cnt END) AS BIGINT) AS n_tokens,
         |    CAST(MAX(CASE WHEN kind = 't' THEN cnt END) AS BIGINT) AS top_tok,
         |    CAST(SUM(CASE WHEN kind = 't' THEN 1 END) AS BIGINT) AS n_distinct,
         |    CAST(SUM(CASE WHEN kind = 'b' THEN cnt END) AS BIGINT) AS n_bigrams,
         |    CAST(MAX(CASE WHEN kind = 'b' THEN cnt END) AS BIGINT) AS top_bigram
         |  FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  top_tok * 1000000 // n_tokens AS top_tok_ppm,
         |  top_bigram * 1000000 // n_bigrams AS top_bigram_ppm,
         |  n_distinct * 1000000 // n_tokens AS distinct_ppm
         |FROM a""".stripMargin,
    "q67_tfidf_top_terms" ->
      s"""WITH tf AS (
         |  SELECT doc_id, token, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest($toks) AS token FROM documents) x
         |  GROUP BY 1, 2),
         |d AS (SELECT *, COUNT(*) OVER (PARTITION BY token) AS df FROM tf),
         |r AS (SELECT doc_id, token,
         |        CAST(tf * 1000000 // df AS BIGINT) AS score_ppm,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY tf * 1000000 // df DESC, token ASC) AS rank
         |      FROM d)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, score_ppm
         |FROM r WHERE rank <= 3""".stripMargin,
    "q68_sequence_packing" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
         |        PARTITION BY source ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |        0) AS cum_before
         |      FROM d)
         |SELECT doc_id, source, n_tokens,
         |  cum_before // 512 AS start_seq,
         |  (cum_before + n_tokens - 1) // 512 AS end_seq,
         |  cum_before % 512 AS start_offset
         |FROM c""".stripMargin,
    "q69_exact_median" ->
      s"""WITH p AS (
         |  SELECT o_orderpriority, ${cents("o_totalprice")} AS price_c
         |  FROM orders),
         |w AS (SELECT o_orderpriority, price_c,
         |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
         |          ORDER BY price_c) AS rn,
         |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
         |      FROM p)
         |SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN rn = (cnt + 1) // 2 THEN price_c ELSE 0 END) +
         |       SUM(CASE WHEN rn = (cnt + 2) // 2 THEN price_c ELSE 0 END)
         |    AS BIGINT) AS median_x2_c
         |FROM w GROUP BY 1""".stripMargin,
    "q71_exact_deciles" ->
      s"""WITH p AS (
         |  SELECT o_orderpriority, ${cents("o_totalprice")} AS price_c
         |  FROM orders),
         |r AS (SELECT o_orderpriority, price_c,
         |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
         |          ORDER BY price_c) AS rn
         |      FROM p),
         |c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM p GROUP BY 1),
         |pos AS (SELECT o_orderpriority, d AS decile,
         |          (cnt - 1) * d // 10 + 1 AS pos
         |        FROM c, (SELECT unnest(range(1, 10)) AS d) ds)
         |SELECT r.o_orderpriority, CAST(decile AS BIGINT) AS decile,
         |  price_c AS value_c
         |FROM r JOIN pos ON r.o_orderpriority = pos.o_orderpriority
         |  AND r.rn = pos.pos""".stripMargin,
    "q72_doc_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toks AS toks, len($toks) AS n FROM documents),
         |x AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(0, (n - 1) // ${graft.operators.CorpusPrep.ChunkStride} + 1),
         |    j -> struct_pack(chunk_id := CAST(j AS BIGINT),
         |      c := toks[j * ${graft.operators.CorpusPrep.ChunkStride} + 1 :
         |             j * ${graft.operators.CorpusPrep.ChunkStride} +
         |             ${graft.operators.CorpusPrep.ChunkSize}]))) AS e
         |  FROM d WHERE n >= 1)
         |SELECT doc_id, e.chunk_id AS chunk_id,
         |  CAST(len(e.c) AS BIGINT) AS n_ctoks,
         |  md5(array_to_string(e.c, ' ')) AS chunk_md5
         |FROM x""".stripMargin,
    "q73_minhash_accuracy" ->
      s"""WITH $lshPairsCtes,
         |est AS (
         |  SELECT p.doc_a, p.doc_b,
         |    CAST((${(0 until 8).map(i =>
            s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")})
         |      * 125000 AS BIGINT) AS est_ppm
         |  FROM lsh_pairs p
         |  JOIN sig sa ON sa.doc_id = p.doc_a
         |  JOIN sig sb ON sb.doc_id = p.doc_b),
         |shj AS (SELECT doc_id, sh_arr,
         |          CAST(len(sh_arr) AS BIGINT) AS n_sh FROM da)
         |SELECT est.doc_a, est.doc_b, est_ppm,
         |  CAST(len(list_intersect(a.sh_arr, b.sh_arr)) * 1000000 //
         |    (a.n_sh + b.n_sh - len(list_intersect(a.sh_arr, b.sh_arr)))
         |    AS BIGINT) AS exact_ppm
         |FROM est
         |JOIN shj a ON a.doc_id = est.doc_a
         |JOIN shj b ON b.doc_id = est.doc_b""".stripMargin,
    // bit-identical to the plain anti-join — the Bloom filter only
    // routes rows, so the oracle is q61's shape on the % 3 corpus
    "q74_bloom_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT MIN(doc_id) AS doc_id FROM fp
        |WHERE NOT EXISTS (SELECT 1 FROM fp c
        |  WHERE c.doc_id % 3 <> 0 AND c.fp = fp.fp)
        |GROUP BY fp""".stripMargin,
    // exact top-k is the hash target; cms_ok is TRUE here — if Spark's
    // count-min estimate ever leaves [exact, exact + eps*N], the boolean
    // flips and the row hash-mismatches
    "q75_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($toks) AS token FROM documents),
         |tf AS (SELECT token, COUNT(*) AS n FROM t GROUP BY 1),
         |r AS (SELECT token, CAST(n AS BIGINT) AS n,
         |      CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank
         |      FROM tf)
         |SELECT token, n, rank, TRUE AS cms_ok FROM r
         |WHERE rank <= ${graft.operators.Sketches.HeavyHittersK}""".stripMargin,
    // one Lloyd step: elements quantized to integer micros before any
    // aggregation (order-free sums); mean is exact integer floor
    // division (// truncates toward zero, adjusted for negative
    // non-exact quotients — same expression as the Spark side, valid
    // past 2^53). pos is 1-based here, 0-based in Spark — it only
    // serves as each engine's internal join key, never output
    "q76_kmeans_refine" ->
      s"""WITH $ivfCte,
         |el AS (
         |  SELECT bucket, u.pos AS pos, u.vq AS vq FROM (
         |    SELECT asg.bucket AS bucket,
         |      unnest(list_transform(generate_series(1, len(e.embedding)),
         |        i -> {'pos': i,
         |              'vq': CAST(floor(e.embedding[i]::DOUBLE * 1000000.0) AS BIGINT)})) AS u
         |    FROM e JOIN asg USING (vec_id)) q),
         |dims AS (
         |  SELECT bucket, pos,
         |    CAST(SUM(vq) // COUNT(*) - (CASE WHEN SUM(vq) % COUNT(*) <> 0
         |      AND SUM(vq) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS mean_q,
         |    COUNT(*) AS n
         |  FROM el GROUP BY 1, 2),
         |cd AS (
         |  SELECT bucket, u.pos AS pos, u.cq AS cq FROM (
         |    SELECT c_id AS bucket,
         |      unnest(list_transform(generate_series(1, len(c_emb)),
         |        i -> {'pos': i,
         |              'cq': CAST(floor(c_emb[i]::DOUBLE * 1000000.0) AS BIGINT)})) AS u
         |    FROM cents) q)
         |SELECT d.bucket AS bucket, CAST(MAX(d.n) AS BIGINT) AS n_vecs,
         |  CAST(SUM(d.mean_q * d.mean_q) AS BIGINT) AS norm_new_q,
         |  CASE WHEN SUM(d.mean_q * d.mean_q) = 0 OR SUM(c.cq * c.cq) = 0 THEN NULL
         |  ELSE CAST(floor(CAST(SUM(d.mean_q * c.cq) AS DOUBLE) * 1000000.0 /
         |    (sqrt(CAST(SUM(d.mean_q * d.mean_q) AS DOUBLE)) *
         |     sqrt(CAST(SUM(c.cq * c.cq) AS DOUBLE)))) AS BIGINT) END AS shift_cos_ppm
         |FROM dims d JOIN cd c USING (bucket, pos)
         |GROUP BY d.bucket""".stripMargin,
    // exact median is the hash target (q69's formula); gk_ok audits
    // percentile_approx's rank-error contract and is TRUE here
    "q77_quantile_audit" ->
      s"""WITH p AS (
         |  SELECT o_orderpriority, ${cents("o_totalprice")} AS price_c
         |  FROM orders),
         |w AS (SELECT o_orderpriority, price_c,
         |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
         |          ORDER BY price_c) AS rn,
         |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
         |      FROM p)
         |SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN rn = (cnt + 1) // 2 THEN price_c ELSE 0 END) +
         |       SUM(CASE WHEN rn = (cnt + 2) // 2 THEN price_c ELSE 0 END)
         |    AS BIGINT) AS median_x2_c,
         |  TRUE AS gk_ok
         |FROM w GROUP BY 1""".stripMargin,
    // same md5 split buckets as q48/q49, same winnow fingerprints as
    // q63/q64: eval docs sharing >= ContamPpm of their fingerprints
    // with the train split
    "q78_contamination" ->
      s"""WITH $winnowCte,
         |b AS (SELECT doc_id,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS bucket, fps
         |  FROM f WHERE len(fps) > 0),
         |train AS (SELECT DISTINCT unnest(fps) AS fp FROM b WHERE bucket < 800000),
         |te AS (SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
         |       unnest(fps) AS fp FROM b WHERE bucket >= 900000),
         |j AS (SELECT te.doc_id, te.n_fp, COUNT(*) AS n_shared
         |      FROM te JOIN train USING (fp) GROUP BY 1, 2)
         |SELECT doc_id, n_fp, CAST(n_shared AS BIGINT) AS n_shared,
         |  n_shared * 1000000 // n_fp AS contam_ppm
         |FROM j
         |WHERE n_shared * 1000000 // n_fp >= ${graft.operators.TextOps.ContamPpm}""".stripMargin,
    // integer-ppm mixing plan: weights cap at 1e6 (down-sample only)
    "q79_mix_weights" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_extract_all(text,
        |      ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |pl AS (SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS tok_total FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS grand_total,
        |      COUNT(*) AS n_langs FROM pl),
        |w AS (SELECT lang, n_docs, tok_total,
        |    tok_total * 1000000 // grand_total AS share_ppm,
        |    least(CAST(1000000 AS BIGINT), (1000000 // n_langs) * 1000000 //
        |      greatest(tok_total * 1000000 // grand_total, 1)) AS weight_ppm
        |  FROM pl, t)
        |SELECT lang, n_docs, tok_total, share_ppm, weight_ppm,
        |  tok_total * weight_ppm // 1000000 AS kept_tokens
        |FROM w""".stripMargin,
    // PQ codes: per-element integer-micro quantization, exact long
    // squared distances, argmin tie-break lowest centroid id — mirrors
    // functions.QuantizedL2 + Similarity.pqCodes bit for bit
    "q81_pq_codes" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      val codeCols = (0 until PqSubspaces).map(m =>
        s"  CAST(SUM(CASE WHEN m = $m THEN c_id ELSE 0 END) AS BIGINT) AS code_$m")
        .mkString(",\n")
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q WHERE vec_id < $PqK),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |r AS (SELECT vec_id, m, c_id, dist,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d)
         |SELECT vec_id,
         |$codeCols,
         |  CAST(SUM(dist) AS BIGINT) AS recon_err_q
         |FROM r WHERE rn = 1
         |GROUP BY vec_id""".stripMargin
    },
    // duplicated-span profile: per-shash row count IS the document
    // frequency (shingles are distinct per doc)
    "q82_dup_span_profile" ->
      s"""WITH $shingleCte,
         |h AS (SELECT doc_id, n_sh, $shashSql AS shash FROM sh),
         |d AS (SELECT doc_id, n_sh,
         |      COUNT(*) OVER (PARTITION BY shash) AS df FROM h),
         |p AS (SELECT doc_id, CAST(MAX(n_sh) AS BIGINT) AS n_sh,
         |      CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |      FROM d GROUP BY 1)
         |SELECT doc_id, n_sh, n_dup, n_dup * 1000000 // n_sh AS dup_ppm
         |FROM p WHERE n_dup > 0""".stripMargin,
    // IVF-PQ ADC search: `d` (every vector's exact quantized subspace
    // distance to every codebook entry) doubles as the corpus code
    // argmin AND the query lookup table — mirrors Similarity.ivfPqSearch
    "q83_ivfpq_search" -> {
      import graft.operators.Similarity.{IvfNprobe, PqK, PqSubDim, PqSubspaces}
      s"""WITH $ivfCte,
         |q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q WHERE vec_id < $PqK),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, c_id AS code FROM (
         |    SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT q_id, c_id AS bucket FROM (
         |    SELECT e.vec_id AS q_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c WHERE e.vec_id % 100 = 0) t
         |  WHERE rk <= $IvfNprobe),
         |adc AS (
         |  SELECT p.q_id, a.vec_id, CAST(SUM(l.dist) AS BIGINT) AS adc_q
         |  FROM probes p
         |  JOIN asg a ON a.bucket = p.bucket
         |  JOIN code co ON co.vec_id = a.vec_id
         |  JOIN d l ON l.vec_id = p.q_id AND l.m = co.m AND l.c_id = co.code
         |  WHERE a.vec_id <> p.q_id
         |  GROUP BY 1, 2)
         |SELECT q_id, neighbor_id, adc_q, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, adc_q,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adc_q ASC, vec_id ASC) AS INT) AS rank
         |  FROM adc) t
         |WHERE rank <= 5""".stripMargin
    },
    // decontamination keep-list: train docs whose token-shingle overlap
    // with the eval split stays under the q78 threshold; shingle-less
    // docs re-enter via the join back to tr
    "q84_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
         |sa AS (SELECT doc_id,
         |    CASE WHEN len(toks) >= 3 THEN $shingleList ELSE [] END AS sh_arr
         |  FROM tok),
         |b AS (SELECT doc_id,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS bucket, sh_arr
         |  FROM sa),
         |ev AS (SELECT DISTINCT CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS shash
         |       FROM (SELECT unnest(sh_arr) AS sh FROM b WHERE bucket >= 900000) x),
         |tr AS (SELECT doc_id, CAST(len(sh_arr) AS BIGINT) AS n_sh, sh_arr
         |       FROM b WHERE bucket < 800000),
         |trf AS (SELECT doc_id, n_sh,
         |        CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS shash
         |        FROM (SELECT doc_id, n_sh, unnest(sh_arr) AS sh FROM tr) y),
         |hits AS (SELECT t.doc_id, t.n_sh, COUNT(ev.shash) AS n_eval_hits
         |         FROM trf t LEFT JOIN ev ON t.shash = ev.shash GROUP BY 1, 2),
         |res AS (SELECT tr.doc_id, tr.n_sh,
         |          CAST(COALESCE(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits
         |        FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id)
         |SELECT doc_id, n_sh, n_eval_hits,
         |  CASE WHEN n_sh = 0 THEN 0 ELSE n_eval_hits * 1000000 // n_sh END AS contam_ppm
         |FROM res
         |WHERE (CASE WHEN n_sh = 0 THEN 0 ELSE n_eval_hits * 1000000 // n_sh END)
         |  < ${graft.operators.TextOps.ContamPpm}""".stripMargin,
    // integer surprisal: idf_x = grand DIV count(token), no log/floats
    "q85_token_rarity" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS grand FROM t),
         |d AS (SELECT doc_id,
         |      grand // COUNT(*) OVER (PARTITION BY token) AS idf_x
         |    FROM t, g)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM(idf_x) AS BIGINT) AS sum_idf,
         |  CAST(MAX(idf_x) AS BIGINT) AS max_idf,
         |  CAST(SUM(idf_x) // COUNT(*) AS BIGINT) AS rarity_score
         |FROM d GROUP BY 1""".stripMargin,
    // same md5 buckets as q48/q49; load_ppm: 1e6 = perfectly even shard
    "q86_shard_balance" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 % ${graft.operators.Sampling.Shards} AS shard,
         |    CAST(len($toks) AS BIGINT) AS n_tok
         |  FROM documents),
         |s AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |      CAST(SUM(n_tok) AS BIGINT) AS tok_total,
         |      MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |    FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM s)
         |SELECT shard, n_docs, tok_total, min_doc, max_doc,
         |  n_docs * ${graft.operators.Sampling.Shards} * 1000000 // total_docs AS load_ppm
         |FROM s, t""".stripMargin,
    // positional spans: duplicated iff ≥2 distinct docs share the shash
    // (min ≠ max over the partition); covered = distinct token positions
    "q87_dup_span_scrub" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
         |p AS (SELECT doc_id, n_tok, u.pos AS pos, u.sh AS sh FROM (
         |    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         |      unnest(list_transform(generate_series(1, len(toks) - 2),
         |        i -> {'pos': i,
         |              'sh': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]})) AS u
         |    FROM tk WHERE len(toks) >= 3) q),
         |h AS (SELECT doc_id, n_tok, pos,
         |      CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS shash FROM p),
         |dd AS (SELECT doc_id, n_tok, pos,
         |      MIN(doc_id) OVER (PARTITION BY shash)
         |        <> MAX(doc_id) OVER (PARTITION BY shash) AS dup
         |    FROM h),
         |cov AS (SELECT DISTINCT doc_id, n_tok, pos + off AS tp
         |        FROM dd, (SELECT unnest([0, 1, 2]) AS off) o
         |        WHERE dup),
         |a AS (SELECT doc_id, MAX(n_tok) AS n_tok,
         |      CAST(COUNT(*) AS BIGINT) AS n_covered
         |    FROM cov GROUP BY 1)
         |SELECT doc_id, n_tok, n_covered, n_tok - n_covered AS n_clean,
         |  n_covered * 1000000 // n_tok AS scrub_ppm
         |FROM a""".stripMargin,
    // LSH over PQ codes: band b = codes (2b, 2b+1); same capped
    // bucket-pair emission as q39 — mirrors Similarity.pqLshPairs
    "q88_pq_lsh_pairs" -> {
      import graft.operators.Similarity.{PqBands, PqK, PqSubDim, PqSubspaces}
      val codePivot = (0 until PqSubspaces).map(m =>
        s"  CAST(SUM(CASE WHEN m = $m THEN code ELSE 0 END) AS BIGINT) AS c_$m")
        .mkString(",\n")
      val bandUnion = (0 until PqBands).map(b =>
        s"  SELECT vec_id, $b AS band, c_${2 * b} AS k1, c_${2 * b + 1} AS k2 FROM w")
        .mkString("\n  UNION ALL\n")
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q WHERE vec_id < $PqK),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, c_id AS code FROM (
         |    SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |w AS (SELECT vec_id,
         |$codePivot
         |  FROM code GROUP BY vec_id),
         |bands AS (
         |$bandUnion),
         |rk AS (SELECT vec_id, band, k1, k2,
         |  ROW_NUMBER() OVER (PARTITION BY band, k1, k2 ORDER BY vec_id) AS rn
         |  FROM bands),
         |capped AS (SELECT vec_id, band, k1, k2 FROM rk
         |           WHERE rn <= ${graft.operators.Dedup.BandCap})
         |SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_bands
         |FROM capped l JOIN capped r ON l.band = r.band AND l.k1 = r.k1
         |  AND l.k2 = r.k2 AND l.vec_id < r.vec_id
         |GROUP BY 1, 2""".stripMargin
    },
    // cross-split LSH: corpus (<0.8) × batch (≥0.9) pairs only, per-side
    // band caps — mirrors Dedup.incrementalLshPairs
    "q89_incremental_lsh" -> q89Sql,
    // the drained streaming screen computes the same relation
    "q163_stream_neardup" -> q89Sql,
    // brute-force / IVF / IVF-PQ top-5 re-derived as CTEs (same
    // formulas as q41/q42/q83; z-prefixed names avoid collisions),
    // joined into per-query hit counts — mirrors Similarity.annRecallAudit
    "q90_ann_recall" -> {
      import graft.operators.Similarity.{IvfNprobe, PqK, PqSubDim, PqSubspaces}
      val cosRank =
        """ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
          |        CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
          |          (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) DESC,
          |        vec_id ASC) AS rank""".stripMargin
      s"""WITH $ivfCte,
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n_emb AS n_q
         |      FROM e WHERE vec_id % 100 = 0),
         |bfc AS (
         |  SELECT q_id, e.vec_id, n_q, n_emb, ${dotSql("q_emb", "embedding")} AS dot_q
         |  FROM e, q WHERE e.vec_id <> q.q_id),
         |bf AS (
         |  SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM bfc) t
         |  WHERE rank <= 5),
         |probes AS (
         |  SELECT q_id, q_emb, n_q, c_id AS bucket FROM (
         |    SELECT q.q_id, q.q_emb, q.n_q, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM q, cents c) t
         |  WHERE rk <= $IvfNprobe),
         |ivc AS (
         |  SELECT p.q_id, e.vec_id, p.n_q, e.n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN probes p ON asg.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |iv AS (
         |  SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM ivc) t
         |  WHERE rank <= 5),
         |zq AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |zc AS (SELECT vec_id AS c_id, qe AS cq FROM zq WHERE vec_id < $PqK),
         |zd AS (SELECT zq.vec_id, zc.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((zq.qe[p.pos] - zc.cq[p.pos]) * (zq.qe[p.pos] - zc.cq[p.pos])) AS dist
         |    FROM zq, zc,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |zcode AS (SELECT vec_id, m, c_id AS code FROM (
         |    SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM zd) t
         |  WHERE rn = 1),
         |adc AS (
         |  SELECT p.q_id, a.vec_id, CAST(SUM(l.dist) AS BIGINT) AS adc_q
         |  FROM probes p
         |  JOIN asg a ON a.bucket = p.bucket
         |  JOIN zcode co ON co.vec_id = a.vec_id
         |  JOIN zd l ON l.vec_id = p.q_id AND l.m = co.m AND l.c_id = co.code
         |  WHERE a.vec_id <> p.q_id
         |  GROUP BY 1, 2),
         |pq AS (
         |  SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY adc_q ASC, vec_id ASC) AS rank
         |    FROM adc) t
         |  WHERE rank <= 5)
         |SELECT bf.q_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ivf_hit,
         |  CAST(SUM(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pq_hit,
         |  CAST(SUM(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS ivf_recall_ppm,
         |  CAST(SUM(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS pq_recall_ppm
         |FROM bf
         |LEFT JOIN iv ON bf.q_id = iv.q_id AND bf.neighbor_id = iv.neighbor_id
         |LEFT JOIN pq ON bf.q_id = pq.q_id AND bf.neighbor_id = pq.neighbor_id
         |GROUP BY 1""".stripMargin
    },
    // q70's recursive component closure, reduced to one survivor per
    // cluster (longest member, ties to smallest id) plus dropped mass
    "q91_dedup_survivors" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
         |          UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(doc, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc),
         |comp AS (SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |         FROM reach GROUP BY doc),
         |m AS (
         |  SELECT comp.component, comp.doc_id, d.n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY comp.component
         |      ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rk
         |  FROM comp JOIN documents d ON comp.doc_id = d.doc_id)
         |SELECT component,
         |  CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS survivor_id,
         |  CAST(MAX(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS survivor_chars,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS dropped_chars
         |FROM m GROUP BY component""".stripMargin,
    // total-variation distance per source vs the corpus distribution:
    // Σ_present |p_s − p_g| plus the global share of tokens the source
    // never emits (Σ_all p_g − Σ_present p_g)
    "q92_source_divergence" ->
      s"""WITH st AS (
         |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_st
         |  FROM (SELECT source, unnest($toks) AS token FROM documents) t
         |  GROUP BY 1, 2),
         |stot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s
         |         FROM st GROUP BY 1),
         |g AS (SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t
         |      FROM st GROUP BY 1),
         |grand AS (SELECT CAST(SUM(c_t) AS BIGINT) AS grand FROM g),
         |gp AS (SELECT token, c_t * 1000000 // grand AS p_g FROM g, grand),
         |gtot AS (SELECT CAST(SUM(p_g) AS BIGINT) AS g_ppm_total FROM gp),
         |j AS (
         |  SELECT st.source, st.c_st * 1000000 // stot.t_s AS p_s,
         |    gp.p_g, stot.t_s
         |  FROM st JOIN stot USING (source) JOIN gp USING (token))
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(MAX(t_s) AS BIGINT) AS tok_total,
         |  CAST(SUM(ABS(p_s - p_g)) + (SELECT g_ppm_total FROM gtot)
         |    - SUM(p_g) AS BIGINT) AS tv_ppm
         |FROM j GROUP BY 1""".stripMargin,
    // every LSH candidate pair scored with the exact quantized cosine
    // of the two embeddings; agree = cos above the confirmation bar
    "q93_semantic_agreement" -> {
      // zero-norm guard mirrors the Spark side (NULL, never Infinity)
      val cosExpr =
        s"""CASE WHEN a.n = 0 OR b.n = 0 THEN CAST(NULL AS BIGINT)
           |    ELSE CAST(floor(CAST(${dotSql("a.embedding", "b.embedding")} AS DOUBLE)
           |      * 1000000.0 / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))))
           |      AS BIGINT) END""".stripMargin
      s"""WITH $lshPairsCtes,
         |e AS (SELECT vec_id, embedding,
         |  ${dotSql("embedding", "embedding")} AS n FROM embeddings)
         |SELECT p.doc_a, p.doc_b,
         |  $cosExpr AS cos_ppm,
         |  ($cosExpr >= ${graft.operators.Similarity.SemAgreePpm}) AS semantic_agree
         |FROM lsh_pairs p
         |JOIN e a ON p.doc_a = a.vec_id
         |JOIN e b ON p.doc_b = b.vec_id""".stripMargin
    },
    // q85's rarity scores folded into buckets, swept best-first against
    // a relative token budget; kept = whole buckets that fit
    "q94_token_budget" -> {
      import graft.operators.Sampling.{BudgetBucketWidth, BudgetPpm}
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS grand FROM t),
         |d AS (SELECT doc_id,
         |      grand // COUNT(*) OVER (PARTITION BY token) AS idf_x
         |    FROM t, g),
         |scored AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |    CAST(SUM(idf_x) // COUNT(*) AS BIGINT) // $BudgetBucketWidth
         |      AS score_bucket
         |  FROM d GROUP BY 1),
         |b AS (
         |  SELECT score_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS tok_total
         |  FROM scored GROUP BY 1),
         |grand_tok AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS grand FROM scored)
         |SELECT score_bucket, n_docs, tok_total,
         |  CAST(SUM(tok_total) OVER (ORDER BY score_bucket DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
         |  (SUM(tok_total) OVER (ORDER BY score_bucket DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
         |    <= $BudgetPpm * (SELECT grand FROM grand_tok)) AS kept
         |FROM b""".stripMargin
    },
    // q91's removed set + q87's covered-token profile (z-prefixed
    // clones), rolled into the 3-status before/after delta
    "q95_curation_delta" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
         |          UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(doc, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc),
         |comp AS (SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |         FROM reach GROUP BY doc),
         |mm AS (
         |  SELECT comp.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY comp.component
         |      ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rk
         |  FROM comp JOIN documents d ON comp.doc_id = d.doc_id),
         |removed AS (SELECT doc_id FROM mm WHERE rk > 1),
         |ztk AS (SELECT doc_id, $toks AS toks FROM documents),
         |zp AS (SELECT doc_id, u.pos AS pos, u.sh AS sh FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(toks) - 2),
         |        i -> {'pos': i,
         |              'sh': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]})) AS u
         |    FROM ztk WHERE len(toks) >= 3) q),
         |zh AS (SELECT doc_id, pos,
         |      CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS shash FROM zp),
         |zdd AS (SELECT doc_id, pos,
         |      MIN(doc_id) OVER (PARTITION BY shash)
         |        <> MAX(doc_id) OVER (PARTITION BY shash) AS dup
         |    FROM zh),
         |zcov AS (SELECT DISTINCT doc_id, pos + off AS tp
         |         FROM zdd, (SELECT unnest([0, 1, 2]) AS off) o
         |         WHERE dup),
         |za AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered
         |       FROM zcov GROUP BY 1),
         |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM ztk)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_before,
         |  CAST(SUM(tok_after) AS BIGINT) AS tok_after
         |FROM (
         |  SELECT b.doc_id, b.n_tok,
         |    CASE WHEN r.doc_id IS NOT NULL THEN 'removed_dup'
         |         WHEN COALESCE(za.n_covered, 0) > 0 THEN 'kept_trimmed'
         |         ELSE 'kept_clean' END AS status,
         |    CASE WHEN r.doc_id IS NOT NULL THEN 0
         |         ELSE b.n_tok - COALESCE(za.n_covered, 0) END AS tok_after
         |  FROM base b
         |  LEFT JOIN removed r ON b.doc_id = r.doc_id
         |  LEFT JOIN za ON b.doc_id = za.doc_id) t
         |GROUP BY 1""".stripMargin,
    // q37's exact-Jaccard truth and q39's LSH candidates under ONE
    // shingle CTE, rolled into per-similarity-band recall
    "q96_lsh_recall" ->
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, source, n_sh, $shashSql AS shash FROM sh),
         |keep AS (SELECT source, shash FROM hs GROUP BY 1, 2
         |         HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.Dedup.DfCap}),
         |hs2 AS (SELECT hs.* FROM hs JOIN keep USING (source, shash)),
         |jpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM hs2 a JOIN hs2 b ON a.source = b.source AND a.shash = b.shash
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |truth AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter * 1000000 // (n_a + n_b - inter) AS BIGINT) AS jaccard_ppm
         |  FROM jpairs
         |  WHERE inter * 1000000 // (n_a + n_b - inter) >= 300000),
         |$lshPairsTail
         |SELECT t.jaccard_ppm // 100000 AS band,
         |  CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS recall_ppm
         |FROM truth t
         |LEFT JOIN lsh_pairs c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
         |GROUP BY 1""".stripMargin,
    // iterated first-touch minima: first view, first click after it,
    // first purchase after that — each within the 24 h conversion window
    "q97_funnel_stages" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |t1 AS (SELECT user_id, MIN(ts_ns) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts_ns) AS t2
        |       FROM ev e JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts_ns > t1.t1
        |         AND e.ts_ns <= t1.t1 + ${graft.operators.EventsOps.FunnelWindowNs} GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts_ns) AS t3
        |       FROM ev e JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_ns > t2.t2
        |         AND e.ts_ns <= t2.t2 + ${graft.operators.EventsOps.FunnelWindowNs} GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u),
        |s AS (
        |  SELECT u.user_id,
        |    CASE WHEN t3.t3 IS NOT NULL THEN 3
        |         WHEN t2.t2 IS NOT NULL THEN 2
        |         WHEN t1.t1 IS NOT NULL THEN 1
        |         ELSE 0 END AS stage
        |  FROM u
        |  LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id
        |  LEFT JOIN t3 ON u.user_id = t3.user_id)
        |SELECT CAST(stage AS BIGINT) AS stage,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) * 1000000 // (SELECT n_total FROM tot) AS BIGINT) AS share_ppm
        |FROM s GROUP BY 1""".stripMargin,
    // (user, epoch-day) grid distinct-reduced first, then the classic
    // retention triangle: cohort = first-seen day
    "q98_retention_cohorts" ->
      """WITH grid AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS d FROM events),
        |cohort AS (SELECT user_id, MIN(d) AS cohort_day FROM grid GROUP BY 1),
        |sizes AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        |          FROM cohort GROUP BY 1),
        |j AS (
        |  SELECT c.cohort_day, g.d - c.cohort_day AS day_offset,
        |    CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM grid g JOIN cohort c ON g.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT j.cohort_day, j.day_offset, j.n_active,
        |  CAST(j.n_active * 1000000 // s.n_cohort AS BIGINT) AS retention_ppm
        |FROM j JOIN sizes s ON j.cohort_day = s.cohort_day""".stripMargin,
    // the derived-width index: nlist = max(16, round(√N)) recomputed in
    // SQL — same seed set, dot formula, and tie-break as the pinned ivfCte
    "q99_ivf_derived_index" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist
         |       FROM e),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_assigned,
         |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
         |FROM asg GROUP BY 1""".stripMargin,
    // five exact-integer quality gates (q34's length/stopword metrics +
    // q66's repetition chain), rolled up per (lang, gates passed)
    "q100_gopher_gates" -> {
      val stopList = graft.operators.CorpusPrep.GateStopWords
        .map(w => s"'$w'").mkString(",")
      s"""WITH f AS (SELECT doc_id, lang, text, $toks AS toks FROM documents
         |           WHERE len($toks) >= 2),
         |b AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok,
         |    length(regexp_replace(text, '\\s', '', 'g')) * 1000000
         |      // len(toks) AS mlen_ppm,
         |    len(list_filter(toks, t -> t IN ($stopList))) * 1000000
         |      // len(toks) AS stop_ppm
         |  FROM f),
         |t0 AS (SELECT doc_id, unnest(toks) AS vs FROM f),
         |t AS (SELECT doc_id,
         |        CAST(concat('0x', substr(md5(vs), 1, 15)) AS BIGINT) AS v
         |      FROM t0),
         |c AS (SELECT doc_id, v, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
         |a AS (SELECT doc_id,
         |    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |    CAST(MAX(cnt) AS BIGINT) AS top_tok,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct
         |  FROM c GROUP BY 1),
         |j AS (
         |  SELECT b.lang, b.n_tok,
         |    CAST(CASE WHEN b.n_tok BETWEEN 30 AND 100000 THEN 1 ELSE 0 END
         |       + CASE WHEN b.mlen_ppm BETWEEN 3000000 AND 5000000 THEN 1 ELSE 0 END
         |       + CASE WHEN b.stop_ppm BETWEEN 50000 AND 400000 THEN 1 ELSE 0 END
         |       + CASE WHEN a.top_tok * 1000000 // a.n_tokens <= 120000 THEN 1 ELSE 0 END
         |       + CASE WHEN a.n_distinct * 1000000 // a.n_tokens >= 450000 THEN 1 ELSE 0 END
         |      AS BIGINT) AS n_passed
         |  FROM b JOIN a ON b.doc_id = a.doc_id)
         |SELECT lang, n_passed, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_total
         |FROM j GROUP BY 1, 2""".stripMargin
    },
    "q101_cube_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  ${sumc("l_extendedprice")} AS revenue_c, COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q102_ntile_quartiles" ->
      s"""WITH q AS (
         |  SELECT c_nationkey, ${cents("c_acctbal")} AS bal_c,
         |    CAST(NTILE(4) OVER (PARTITION BY c_nationkey
         |      ORDER BY ${cents("c_acctbal")} DESC, c_custkey ASC) AS BIGINT)
         |      AS quartile
         |  FROM customer)
         |SELECT c_nationkey, quartile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         |  CAST(MAX(bal_c) AS BIGINT) AS max_bal_c,
         |  CAST(MIN(bal_c) AS BIGINT) AS min_bal_c
         |FROM q GROUP BY 1, 2""".stripMargin,
    // q46's gap sessionization rolled to sessions, then per start day:
    // share of sessions containing a purchase
    "q103_session_conversion" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |l AS (SELECT *, lag(ts_ns) OVER
        |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
        |b AS (SELECT *, CASE WHEN prev_ns IS NULL
        |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, CAST(SUM(brk) OVER (
        |        PARTITION BY user_id ORDER BY ts_ns, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |      FROM b),
        |sess AS (
        |  SELECT user_id, session_id,
        |    MIN(ts_ns // 86400000000000) AS start_day,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |  FROM s GROUP BY 1, 2)
        |SELECT start_day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(converted) AS BIGINT) AS n_converting,
        |  CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm
        |FROM sess GROUP BY 1""".stripMargin,
    // q39's candidate pairs labeled with each side's source, rolled to
    // the normalized (least, greatest) provenance matrix
    "q104_cross_source_dups" ->
      s"""WITH $lshPairsCtes,
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT LEAST(a.source, b.source) AS source_a,
         |  GREATEST(a.source, b.source) AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
         |FROM lsh_pairs p
         |JOIN s a ON p.doc_a = a.doc_id
         |JOIN s b ON p.doc_b = b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    // q40's simhash as a CTE, byte-banded capped candidate pairs
    // (bandPairs discipline), exact 32-bit hamming filter
    "q105_simhash_pairs" -> {
      val bandUnion = (0 until 4).map(b =>
        s"  SELECT doc_id, $b AS band, (simhash >> ${8 * b}) & 255 AS k1 FROM sig")
        .mkString("\n  UNION ALL\n")
      s"""WITH tv AS (
         |  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS tv
         |  FROM (SELECT doc_id, unnest($toks) AS tok FROM documents) t),
         |v AS (SELECT doc_id,
         |${(0 until 32).map(b => s"  SUM(2 * ((tv >> $b) & 1) - 1) AS s$b").mkString(",\n")}
         |  FROM tv GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST(${(0 until 32).map(b =>
            s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |  FROM v),
         |bands AS (
         |$bandUnion),
         |rk AS (SELECT doc_id, band, k1,
         |  ROW_NUMBER() OVER (PARTITION BY band, k1 ORDER BY doc_id) AS rn
         |  FROM bands),
         |capped AS (SELECT doc_id, band, k1 FROM rk
         |           WHERE rn <= ${graft.operators.Dedup.BandCap}),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM capped l JOIN capped r
         |    ON l.band = r.band AND l.k1 = r.k1 AND l.doc_id < r.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM cand c
         |JOIN sig a ON c.doc_a = a.doc_id
         |JOIN sig b ON c.doc_b = b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash))
         |  <= ${graft.operators.Dedup.SimhashHammingMax}""".stripMargin
    },
    // the derived-width SEARCH: nlist = max(16, round(√N)) and
    // nprobe = max(4, round(√nlist)) recomputed in SQL — the q42
    // pipeline with both production knobs under the gate
    "q106_ivf_derived_search" -> q106Sql,
    // the derived-width PQ codebook: k = max(16, round(√(N/4)))
    // recomputed in SQL, then the q81 argmin per (vector, subspace),
    // rolled up per (subspace, code)
    "q107_pq_derived_codes" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |kk AS (SELECT GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |       FROM q),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q, kk WHERE vec_id < kk.k),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |r AS (SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d)
         |SELECT m AS subspace, c_id AS code, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |FROM r WHERE rn = 1
         |GROUP BY 1, 2""".stripMargin
    },
    // the COMPLETE derived IVF-PQ search: the q83 ADC pipeline with
    // nlist/nprobe/k all recomputed in SQL from the corpus size
    "q108_ivfpq_derived_search" -> q108Sql,
    // two Lloyd rounds replayed in SQL: exact-integer argmin assignment
    // (dist ASC, c_id ASC ties), integer-mean update, final model report
    "q109_kmeans_train" -> kmeansTrainSql(
      s"""c0 AS (SELECT vec_id AS c_id, qe AS cq FROM q
         |       WHERE vec_id < ${graft.operators.Similarity.IvfNlist}),""".stripMargin),
    // same trajectory replay, hash-sampled round-0 seeds (q48's md5
    // bucket rule ranks the corpus; first nlist win) — immune to a
    // prefix-skewed id layout
    "q128_kmeans_hash_seeded" -> kmeansTrainSql(
      s"""c0 AS (SELECT vec_id AS c_id, qe AS cq FROM (
         |    SELECT vec_id, qe, ROW_NUMBER() OVER (ORDER BY
         |        CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
         |          AS BIGINT) % 1000000, vec_id) AS rk
         |    FROM q) t
         |  WHERE rk <= ${graft.operators.Similarity.IvfNlist}),""".stripMargin),
    "q110_open_sessions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |b AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM b),
         |iv AS (SELECT user_id, session_id, MIN(ts_ns) AS s_start,
         |         MAX(ts_ns) AS s_end FROM s GROUP BY 1, 2),
         |p AS (SELECT event_id, ts_ns FROM e WHERE event_type = 'purchase')
         |SELECT p.event_id, COUNT(*) AS open_sessions
         |FROM p JOIN iv ON p.ts_ns BETWEEN iv.s_start AND iv.s_end
         |GROUP BY 1""".stripMargin,
    "q111_salted_segment" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_events, ${sumc("value")} AS value_c
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1""".stripMargin,
    "q112_scd_intervals" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |l AS (SELECT *, lag(event_type) OVER
         |        (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e),
         |b AS (SELECT *, CASE WHEN prev_type IS NULL
         |        OR prev_type <> event_type THEN 1 ELSE 0 END AS chg FROM l),
         |v AS (SELECT *, CAST(SUM(chg) OVER (
         |        PARTITION BY user_id ORDER BY ts_us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
         |      FROM b),
         |r AS (SELECT user_id, version, MAX(event_type) AS state,
         |        MIN(ts_us) AS valid_from, COUNT(*) AS n_events
         |      FROM v GROUP BY 1, 2)
         |SELECT user_id, version, state, valid_from, n_events,
         |  COALESCE(nxt - 1, 9223372036854775807) AS valid_to,
         |  CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM (SELECT *, lead(valid_from) OVER (
         |        PARTITION BY user_id ORDER BY valid_from) AS nxt FROM r)""".stripMargin,
    "q113_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  ${sumc("l_extendedprice")} AS revenue_c, COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,
    "q114_multiset_ops" ->
      s"""SELECT o_custkey, 'except_all' AS op FROM (
         |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         |  EXCEPT ALL
         |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         |UNION ALL
         |SELECT o_custkey, 'intersect_all' AS op FROM (
         |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         |  INTERSECT ALL
         |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "q115_session_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |b AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM b),
         |rn AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY user_id, session_id
         |        ORDER BY ts_ns, event_id) AS rn FROM s),
         |p AS (SELECT user_id, session_id,
         |    COALESCE(MAX(CASE WHEN rn = 1 THEN event_type END), '-') AS e1,
         |    COALESCE(MAX(CASE WHEN rn = 2 THEN event_type END), '-') AS e2,
         |    COALESCE(MAX(CASE WHEN rn = 3 THEN event_type END), '-') AS e3
         |  FROM rn WHERE rn <= 3 GROUP BY 1, 2)
         |SELECT e1, e2, e3, COUNT(*) AS n_sessions FROM p GROUP BY 1, 2, 3""".stripMargin,
    "q116_revenue_share" ->
      s"""WITH a AS (
         |  SELECT r_name, n_name, ${sumc("o_totalprice")} AS revenue_c
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY 1, 2)
         |SELECT r_name, n_name, revenue_c,
         |  CAST(CAST(revenue_c AS HUGEINT) * 1000000
         |    // CAST(SUM(revenue_c) OVER (PARTITION BY r_name) AS HUGEINT) AS BIGINT)
         |    AS share_ppm
         |FROM a""".stripMargin,
    "q117_session_overlap" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |b AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM b),
         |iv AS (SELECT user_id, session_id, MIN(ts_ns) AS sa, MAX(ts_ns) AS ea
         |       FROM s GROUP BY 1, 2)
         |SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_overlaps
         |FROM iv a JOIN iv b
         |  ON a.user_id < b.user_id AND a.sa <= b.ea AND b.sa <= a.ea
         |GROUP BY 1, 2""".stripMargin,
    "q118_hard_negatives" -> q118Sql,
    "q119_epoch_mix_plan" ->
      s"""WITH d AS (SELECT lang,
         |    CAST(len(regexp_extract_all(text,
         |      ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |pl AS (SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tok) AS BIGINT) AS tok_total FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS grand_total,
         |      COUNT(*) AS n_langs FROM pl),
         |a AS (SELECT lang, n_docs, tok_total,
         |    grand_total * ${graft.operators.Sampling.MixBudgetX} // n_langs AS target_tok
         |  FROM pl, t),
         |e AS (SELECT *,
         |    least(CAST(${graft.operators.Sampling.MaxEpochsPpm} AS BIGINT),
         |      CAST(CAST(target_tok AS HUGEINT) * 1000000 // tok_total AS BIGINT))
         |      AS epochs_ppm
         |  FROM a)
         |SELECT lang, n_docs, tok_total, target_tok, epochs_ppm,
         |  CAST(CAST(tok_total AS HUGEINT) * epochs_ppm // 1000000 AS BIGINT)
         |    AS served_tok,
         |  target_tok
         |    - CAST(CAST(tok_total AS HUGEINT) * epochs_ppm // 1000000 AS BIGINT)
         |    AS unmet_tok
         |FROM e""".stripMargin,
    "q120_ivf_hard_negatives" -> q120Sql,
    "q121_mining_agreement" ->
      s"""WITH bf AS (SELECT q_id, pos_id AS bf_pos, neg_id AS bf_neg
         |  FROM ($q118Sql) bfq),
         |iv AS (SELECT q_id, pos_id AS ivf_pos, neg_id AS ivf_neg
         |  FROM ($q120Sql) ivq)
         |SELECT COUNT(*) AS n_queries,
         |  CAST(SUM(CASE WHEN bf_pos IS NOT DISTINCT FROM ivf_pos
         |    THEN 1 ELSE 0 END) AS BIGINT) AS pos_agree,
         |  CAST(SUM(CASE WHEN bf_neg IS NOT DISTINCT FROM ivf_neg
         |    THEN 1 ELSE 0 END) AS BIGINT) AS neg_agree,
         |  CAST(SUM(CASE WHEN ivf_neg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS neg_found
         |FROM bf JOIN iv USING (q_id)""".stripMargin,
    "q122_rank_family" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
         |    ${cents("c_acctbal")} // 10000 AS bal_c FROM customer),
         |r AS (SELECT *,
         |    CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY bal_c DESC)
         |      AS BIGINT) AS rnk,
         |    CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY bal_c DESC)
         |      AS BIGINT) AS drnk,
         |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n_part,
         |    COUNT(*) OVER (PARTITION BY c_nationkey, bal_c) AS n_peers
         |  FROM c)
         |SELECT c_custkey, c_nationkey, bal_c, rnk, drnk,
         |  (rnk - 1) * 1000000 // greatest(n_part - 1, 1) AS prank_ppm,
         |  (rnk - 1 + n_peers) * 1000000 // n_part AS cume_ppm
         |FROM r""".stripMargin,
    "q124_positional_window" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
         |    ${cents("c_acctbal")} AS bal_c FROM customer),
         |w AS (SELECT c_nationkey,
         |    FIRST_VALUE(bal_c) OVER win AS top_bal,
         |    NTH_VALUE(bal_c, 2) OVER win AS second_bal,
         |    LAST_VALUE(bal_c) OVER win AS bottom_bal
         |  FROM c
         |  WINDOW win AS (PARTITION BY c_nationkey
         |    ORDER BY bal_c DESC, c_custkey ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT c_nationkey, MAX(top_bal) AS top_bal,
         |  MAX(second_bal) AS second_bal, MAX(bottom_bal) AS bottom_bal,
         |  COUNT(*) AS n_customers
         |FROM w GROUP BY 1""".stripMargin,
    // q117 through the per-bin cap: intervals explode over hour bins,
    // each bin keeps the OverlapBinCap smallest (user, session) rows
    // (row_number — the same deterministic-smallest-ids rule as every
    // banded dedup bucket), pairs anchor to the intersection's first
    // bin exactly as q117. // on non-negative ns == DIV.
    "q125_capped_overlap" -> {
      val b = 3600000000000L
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |br AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM br),
         |iv AS (SELECT user_id, session_id, MIN(ts_ns) AS sa, MAX(ts_ns) AS ea
         |       FROM s GROUP BY 1, 2),
         |bins AS (SELECT user_id, session_id, sa, ea,
         |    unnest(generate_series(sa // $b, ea // $b)) AS bin FROM iv),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bin
         |    ORDER BY user_id, session_id) AS rn FROM bins),
         |c AS (SELECT * FROM ranked
         |      WHERE rn <= ${graft.operators.RangeJoin.OverlapBinCap})
         |SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_overlaps
         |FROM c a JOIN c b ON a.bin = b.bin
         |  AND a.user_id < b.user_id
         |  AND a.sa <= b.ea AND b.sa <= a.ea
         |  AND a.bin = greatest(a.sa, b.sa) // $b
         |GROUP BY 1, 2""".stripMargin
    },
    // Dual-parse contract: DuckDB rebuilds the BYTE-IDENTICAL media blob
    // (same hex/lpad/unhex algebra as the Spark generator), then parses
    // the header fields back out of its own bytes — PNG IHDR at fixed
    // chunk offsets, JPEG SOF0 after the fixed-length APP0, WAV fmt/data
    // little-endian (byte-swapped hex slices). A one-byte layout drift
    // on either engine breaks size_bytes; a field-encoding drift breaks
    // width/height/rate.
    "q126_media_decode" -> {
      // this DuckDB build has no BLOB slicing — hex the blob once (hx)
      // and slice the hex string: byte offset o (1-based) = hx chars
      // (o-1)*2+1 .. +len*2
      def beN(off: Int, len: Int) =
        s"CAST(concat('0x', substr(hx, ${(off - 1) * 2 + 1}, ${len * 2})) AS BIGINT)"
      def leN(off: Int, len: Int) =
        (0 until len).map(i => s"substr(hx, ${(off + len - 2 - i) * 2 + 1}, 2)")
          .mkString("CAST(concat('0x', ", ", ", ") AS BIGINT)")
      s"""WITH $mediaBlobCtes,
         |hb AS (SELECT doc_id, m, c, hex(c) AS hx FROM blob)
         |SELECT doc_id AS media_id,
         |  CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
         |  CASE WHEN m = 0 THEN ${beN(17, 4)}
         |       WHEN m = 1 THEN ${beN(28, 2)} END AS width,
         |  CASE WHEN m = 0 THEN ${beN(21, 4)}
         |       WHEN m = 1 THEN ${beN(26, 2)} END AS height,
         |  CASE WHEN m = 2 THEN ${leN(25, 4)} END AS sample_rate,
         |  CASE WHEN m = 2 THEN ${leN(41, 4)} * 1000 // (${leN(25, 4)} * 2) END
         |    AS duration_ms,
         |  CAST(octet_length(c) AS BIGINT) AS size_bytes
         |FROM hb""".stripMargin
    },
    // the batch SCD2 history (q112's CTEs) restricted to CLOSED
    // intervals — exactly the rows the streaming state machine emits on
    // a drained source; valid_to = next version's start − 1
    "q127_stream_scd_parity" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |l AS (SELECT *, lag(event_type) OVER
         |        (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e),
         |b AS (SELECT *, CASE WHEN prev_type IS NULL
         |        OR prev_type <> event_type THEN 1 ELSE 0 END AS chg FROM l),
         |v AS (SELECT *, CAST(SUM(chg) OVER (
         |        PARTITION BY user_id ORDER BY ts_us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
         |      FROM b),
         |r AS (SELECT user_id, version, MAX(event_type) AS state,
         |        MIN(ts_us) AS valid_from, COUNT(*) AS n_events
         |      FROM v GROUP BY 1, 2)
         |SELECT user_id, version, state, valid_from, nxt - 1 AS valid_to,
         |  n_events
         |FROM (SELECT *, lead(valid_from) OVER (
         |        PARTITION BY user_id ORDER BY valid_from) AS nxt FROM r)
         |WHERE nxt IS NOT NULL""".stripMargin,
    // q97's per-user stage CTE, ungrouped — exactly the one snapshot
    // per user the drained streaming funnel machine emits
    "q129_stream_funnel_parity" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |t1 AS (SELECT user_id, MIN(ts_ns) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts_ns) AS t2
        |       FROM ev e JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts_ns > t1.t1
        |         AND e.ts_ns <= t1.t1 + ${graft.operators.EventsOps.FunnelWindowNs} GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts_ns) AS t3
        |       FROM ev e JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_ns > t2.t2
        |         AND e.ts_ns <= t2.t2 + ${graft.operators.EventsOps.FunnelWindowNs} GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
        |       WHEN t2.t2 IS NOT NULL THEN 2
        |       WHEN t1.t1 IS NOT NULL THEN 1
        |       ELSE 0 END AS BIGINT) AS stage
        |FROM u
        |LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id""".stripMargin,
    // unsmoothed char-trigram frequency model over the md5 train split,
    // per-doc mean frequency in exact HUGEINT-widened ppm; unseen
    // trigrams contribute 0 via the left join
    "q130_trigram_quality" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 3),
        |tri AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, length(text) - 2), i -> substr(text, i, 3))) AS tg
        |  FROM d),
        |train AS (SELECT tg, COUNT(*) AS n_tg FROM tri
        |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 1000000 < 800000
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tg) AS BIGINT) AS n_total FROM train),
        |p AS (SELECT t.doc_id,
        |    CAST(CAST(COALESCE(m.n_tg, 0) AS HUGEINT) * 1000000
        |      // (SELECT n_total FROM tot) AS BIGINT) AS ppm
        |  FROM tri t LEFT JOIN train m USING (tg))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
        |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS avg_freq_ppm
        |FROM p GROUP BY 1""".stripMargin,
    // priority sampling: k smallest hash*1e6/weight quotients, doc_id
    // tie-break; same md5-prefix hash as every split/sample query
    "q131_priority_sample" ->
      """SELECT doc_id, n_chars,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    * 1000000 // n_chars AS priority
        |FROM documents WHERE n_chars > 0
        |ORDER BY priority ASC, doc_id ASC LIMIT 100""".stripMargin,
    // both md5 splits assigned to the pinned centroid model (argmax
    // dot, dot DESC / c_id ASC ties — the ivfCte rule); per bucket:
    // members, arrivals, growth ppm, mean arrival dot (truncating
    // division with the negative adjustment = exact floor)
    "q132_ivf_incremental_ingest" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |b AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
         |          WHERE vec_id < ${graft.operators.Similarity.IvfNlist}),
         |a AS (SELECT vec_id, c_id AS bucket, d AS dot_q FROM (
         |    SELECT e.vec_id, c.c_id, ${dotSql("c.c_emb", "e.embedding")} AS d,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |j AS (SELECT a.bucket, b.hb, a.dot_q FROM a JOIN b USING (vec_id)
         |      WHERE b.hb < 800000 OR b.hb >= 900000)
         |SELECT bucket,
         |  CAST(SUM(CASE WHEN hb < 800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
         |  CAST(SUM(CASE WHEN hb >= 900000 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |  CASE WHEN SUM(CASE WHEN hb < 800000 THEN 1 ELSE 0 END) = 0 THEN NULL
         |    ELSE CAST(SUM(CASE WHEN hb >= 900000 THEN 1 ELSE 0 END) * 1000000
         |      // SUM(CASE WHEN hb < 800000 THEN 1 ELSE 0 END) AS BIGINT) END AS growth_ppm,
         |  CASE WHEN SUM(CASE WHEN hb >= 900000 THEN 1 ELSE 0 END) = 0 THEN NULL
         |    ELSE CAST(
         |      SUM(CASE WHEN hb >= 900000 THEN dot_q END)
         |        // SUM(CASE WHEN hb >= 900000 THEN 1 ELSE 0 END)
         |      - (CASE WHEN SUM(CASE WHEN hb >= 900000 THEN dot_q END)
         |          % SUM(CASE WHEN hb >= 900000 THEN 1 ELSE 0 END) <> 0
         |        AND SUM(CASE WHEN hb >= 900000 THEN dot_q END) < 0
         |        THEN 1 ELSE 0 END) AS BIGINT) END AS mean_dot_new_q
         |FROM j GROUP BY 1""".stripMargin,
    // batch replay of the stream-stream attribution join: compare AND
    // report in µs (the q112 lesson — raw ns never crosses engines)
    "q133_stream_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, event_id AS view_id, ts_us AS v_us
        |      FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
        |      FROM e WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id, c_us - v_us AS gap_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c_us > v_us AND c_us <= v_us + 3600000000""".stripMargin,
    // the content-feature pass replayed from the hexed blob: per-byte
    // high nibble = one hex char, counted into 16 bins, exact integer
    // ppm of the payload length (same floor division as the Scala side)
    "q134_media_byte_hist" -> {
      val bins = (0 until 16).map { i =>
        val c = f"$i%X"
        s"""CAST(SUM(CASE WHEN substr(hx, (i-1)*2+1, 1) = '$c' THEN 1 ELSE 0 END)
           |    * 1000000 // MAX(n) AS BIGINT) AS h${f"$i%02d"}""".stripMargin
      }.mkString(",\n")
      s"""WITH $mediaBlobCtes,
         |hb AS (SELECT doc_id, hex(c) AS hx, octet_length(c) AS n FROM blob),
         |nib AS (SELECT doc_id, n, hx, unnest(generate_series(1, n)) AS i FROM hb)
         |SELECT doc_id AS media_id, CAST(MAX(n) AS BIGINT) AS size_bytes,
         |$bins
         |FROM nib GROUP BY doc_id""".stripMargin
    },
    // KMV distinct sketch replay: same md5-prefix hash as every
    // split/sample query, k smallest distinct values, (k-1)*2^32/h_k;
    // undersized sketch (n_kept < k) IS the exact distinct-hash set
    "q135_kmv_distinct" ->
      kmvSql(graft.operators.Sketches.KmvK, 100000L),
    // derived-k twin: k = ⌈1/ε²⌉+2 from the target error, bound ≈ 3.2σ
    "q139_kmv_derived" ->
      kmvSql(
        graft.operators.Sketches.kmvKFor(graft.operators.Sketches.KmvTargetRelErr),
        graft.operators.Sketches.kmvBoundPpm(graft.operators.Sketches.KmvTargetRelErr)),
    // the composed endgame: q95's removed set + scrub profile, then
    // q94's bucket sweep re-run over the SURVIVORS' scrubbed mass —
    // four statuses, exact token mass before/after the full chain
    "q140_curation_endgame" -> {
      import graft.operators.Sampling.{BudgetBucketWidth, BudgetPpm}
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
         |          UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(doc, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc),
         |comp AS (SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |         FROM reach GROUP BY doc),
         |mm AS (
         |  SELECT comp.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY comp.component
         |      ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rk
         |  FROM comp JOIN documents d ON comp.doc_id = d.doc_id),
         |removed AS (SELECT doc_id FROM mm WHERE rk > 1),
         |ztk AS (SELECT doc_id, $toks AS toks FROM documents),
         |zp AS (SELECT doc_id, u.pos AS pos, u.sh AS sh FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(generate_series(1, len(toks) - 2),
         |        i -> {'pos': i,
         |              'sh': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]})) AS u
         |    FROM ztk WHERE len(toks) >= 3) q),
         |zh AS (SELECT doc_id, pos,
         |      CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS shash FROM zp),
         |zdd AS (SELECT doc_id, pos,
         |      MIN(doc_id) OVER (PARTITION BY shash)
         |        <> MAX(doc_id) OVER (PARTITION BY shash) AS dup
         |    FROM zh),
         |zcov AS (SELECT DISTINCT doc_id, pos + off AS tp
         |         FROM zdd, (SELECT unnest([0, 1, 2]) AS off) o
         |         WHERE dup),
         |za AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered
         |       FROM zcov GROUP BY 1),
         |t AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS grand FROM t),
         |d AS (SELECT doc_id,
         |      grand // COUNT(*) OVER (PARTITION BY token) AS idf_x
         |    FROM t, g),
         |scored AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |    CAST(SUM(idf_x) // COUNT(*) AS BIGINT) // $BudgetBucketWidth
         |      AS score_bucket
         |  FROM d GROUP BY 1),
         |base AS (
         |  SELECT s.doc_id, s.n_tok, s.score_bucket,
         |    (r.doc_id IS NOT NULL) AS removed,
         |    COALESCE(za.n_covered, 0) AS n_covered,
         |    s.n_tok - COALESCE(za.n_covered, 0) AS n_scrubbed
         |  FROM scored s
         |  LEFT JOIN removed r ON s.doc_id = r.doc_id
         |  LEFT JOIN za ON s.doc_id = za.doc_id),
         |b AS (SELECT score_bucket, CAST(SUM(n_scrubbed) AS BIGINT) AS tok_total
         |      FROM base WHERE NOT removed GROUP BY 1),
         |gt AS (SELECT CAST(SUM(n_scrubbed) AS BIGINT) AS grand
         |       FROM base WHERE NOT removed),
         |keptb AS (SELECT score_bucket,
         |    (SUM(tok_total) OVER (ORDER BY score_bucket DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
         |      <= $BudgetPpm * (SELECT grand FROM gt)) AS kept
         |  FROM b)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_before,
         |  CAST(SUM(tok_after) AS BIGINT) AS tok_after
         |FROM (
         |  SELECT base.doc_id, base.n_tok,
         |    CASE WHEN base.removed THEN 'removed_dup'
         |         WHEN NOT COALESCE(k.kept, FALSE) THEN 'removed_budget'
         |         WHEN base.n_covered > 0 THEN 'kept_trimmed'
         |         ELSE 'kept_clean' END AS status,
         |    CASE WHEN base.removed OR NOT COALESCE(k.kept, FALSE) THEN 0
         |         ELSE base.n_scrubbed END AS tok_after
         |  FROM base LEFT JOIN keptb k ON base.score_bucket = k.score_bucket) led
         |GROUP BY 1""".stripMargin
    },
    // denylist membership folded into one scan; verdict boundary in
    // exact integer ppm
    "q141_denylist_scrub" -> {
      val dl = graft.operators.TextOps.Denylist
        .map(t => s"'$t'").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, source, $toks AS toks FROM documents),
         |d AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(toks, t -> t IN ($dl))) AS BIGINT) AS n_flagged
         |  FROM tk WHERE len(toks) > 0)
         |SELECT source,
         |  CASE WHEN n_flagged * 1000000 // n_tok > ${graft.operators.TextOps.DenyBlockPpm}
         |         THEN 'block'
         |       WHEN n_flagged > 0 THEN 'scrub' ELSE 'clean' END AS verdict,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_total,
         |  CAST(SUM(n_flagged) AS BIGINT) AS flagged_total
         |FROM d GROUP BY 1, 2""".stripMargin
    },
    // per-source min-k sketches re-min-k'd vs the direct global sketch:
    // hash-equal rows prove the merge algebra exactly
    "q142_kmv_shard_merge" -> {
      val k = graft.operators.Sketches.kmvKFor(
        graft.operators.Sketches.KmvTargetRelErr)
      s"""WITH $shingleCte,
         |h AS (SELECT DISTINCT source,
         |    CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS hv FROM sh),
         |ps AS (SELECT DISTINCT hv FROM (
         |    SELECT hv, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv ASC) AS rn
         |    FROM h) t
         |  WHERE rn <= $k),
         |mk AS (SELECT hv FROM ps ORDER BY hv ASC LIMIT $k),
         |gd AS (SELECT DISTINCT hv FROM h),
         |gk AS (SELECT hv FROM gd ORDER BY hv ASC LIMIT $k),
         |u AS (
         |  SELECT 'merged' AS side, MAX(hv) AS h_k, COUNT(*) AS n_kept FROM mk
         |  UNION ALL
         |  SELECT 'global' AS side, MAX(hv) AS h_k, COUNT(*) AS n_kept FROM gk)
         |SELECT side, CAST($k AS BIGINT) AS k, CAST(n_kept AS BIGINT) AS n_kept,
         |  h_k,
         |  CAST(CASE WHEN n_kept < $k THEN n_kept
         |    ELSE (n_kept - 1) * 4294967296 // greatest(h_k, 1) END AS BIGINT) AS est_ndv
         |FROM u""".stripMargin
    },
    // exact two-sample KS in integer ppm over per-(type, cents) counts;
    // HUGEINT widening mirrors the Spark side's DECIMAL(38,0)
    "q143_value_drift_ks" ->
      s"""WITH e AS (SELECT event_type, (event_id % 2 = 0) AS in_a,
         |    ${cents("value")} AS v_c FROM events),
         |c AS (SELECT event_type, v_c,
         |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         |  FROM e GROUP BY 1, 2),
         |w AS (SELECT event_type,
         |    SUM(c_a) OVER (PARTITION BY event_type ORDER BY v_c
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         |    SUM(c_b) OVER (PARTITION BY event_type ORDER BY v_c
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         |    SUM(c_a) OVER (PARTITION BY event_type) AS n_a,
         |    SUM(c_b) OVER (PARTITION BY event_type) AS n_b
         |  FROM c)
         |SELECT event_type, n_a, n_b, ks_ppm,
         |  CAST(ks_ppm AS HUGEINT) * ks_ppm * n_a * n_b >
         |    CAST(${graft.operators.EventsOps.DriftKsCritSq1e12} AS HUGEINT) * (n_a + n_b)
         |    AS drifted
         |FROM (
         |  SELECT event_type, CAST(MAX(n_a) AS BIGINT) AS n_a,
         |    CAST(MAX(n_b) AS BIGINT) AS n_b,
         |    CAST(MAX(abs(CAST(cum_a AS HUGEINT) * 1000000 // n_a
         |      - CAST(cum_b AS HUGEINT) * 1000000 // n_b)) AS BIGINT) AS ks_ppm
         |  FROM w GROUP BY 1) t""".stripMargin,
    // LSH near-dup pairs labeled by the q49 hash split on both ends,
    // rolled up to the orientation-free (split, split) matrix — the
    // off-diagonal cells are evaluation leakage
    "q136_split_leakage" ->
      s"""WITH $lshPairsCtes,
         |sp AS (${splitRelSql("documents", "doc_id")})
         |SELECT least(a.split, b.split) AS split_lo,
         |  greatest(a.split, b.split) AS split_hi,
         |  COUNT(*) AS n_pairs,
         |  least(a.split, b.split) <> greatest(a.split, b.split) AS is_leak
         |FROM lsh_pairs p
         |JOIN sp a ON p.doc_a = a.doc_id
         |JOIN sp b ON p.doc_b = b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    // exactly-once under replay: the doubled stream deduped by event_id
    // must reduce to the single-copy aggregate — which is just the
    // batch aggregate of the events table
    "q137_stream_dedup_replay" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1""".stripMargin,
    // q52's capped bucketed cosine pairs, both ends labeled by the hash
    // split on vec_id, rolled up to the same matrix as q136
    "q138_semantic_leakage" ->
      s"""WITH $cosPairsCtes,
         |sp AS (${splitRelSql("embeddings", "vec_id")})
         |SELECT least(a.split, b.split) AS split_lo,
         |  greatest(a.split, b.split) AS split_hi,
         |  COUNT(*) AS n_pairs,
         |  least(a.split, b.split) <> greatest(a.split, b.split) AS is_leak
         |FROM cos_pairs p
         |JOIN sp a ON p.id_a = a.vec_id
         |JOIN sp b ON p.id_b = b.vec_id
         |GROUP BY 1, 2""".stripMargin,
    // deterministic contact-card derivation + redaction replayed in
    // RE2; the scrubbed TEXT is under the gate via the md5-prefix sum
    "q144_pii_scrub" -> {
      import graft.operators.TextOps.{PiiEmailRe, PiiPhoneRe, PiiIpv4Re}
      s"""WITH contacts AS (
         |  SELECT c_mktsegment,
         |    concat(c_name, ' (', c_mktsegment, ') contact cust',
         |      CAST(c_custkey AS VARCHAR), '@example.com or +1-555-',
         |      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
         |      ' last seen 10.', CAST(c_custkey % 256 AS VARCHAR),
         |      '.', CAST((c_custkey * 7) % 256 AS VARCHAR),
         |      '.', CAST((c_custkey * 13) % 256 AS VARCHAR)) AS text
         |  FROM customer),
         |s AS (
         |  SELECT c_mktsegment, text,
         |    CAST(len(regexp_extract_all(text, '$PiiEmailRe')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(text, '$PiiPhoneRe')) AS BIGINT) AS n_phones,
         |    CAST(len(regexp_extract_all(text, '$PiiIpv4Re')) AS BIGINT) AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      text, '$PiiEmailRe', '<EMAIL>', 'g'),
         |      '$PiiPhoneRe', '<PHONE>', 'g'),
         |      '$PiiIpv4Re', '<IP>', 'g') AS scrubbed
         |  FROM contacts)
         |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_emails) AS BIGINT) AS emails,
         |  CAST(SUM(n_phones) AS BIGINT) AS phones,
         |  CAST(SUM(n_ips) AS BIGINT) AS ips,
         |  CAST(SUM(length(text)) AS BIGINT) AS chars_before,
         |  CAST(SUM(length(scrubbed)) AS BIGINT) AS chars_after,
         |  CAST(SUM(CAST(concat('0x', substr(md5(scrubbed), 1, 12)) AS BIGINT))
         |    AS BIGINT) AS fp_sum
         |FROM s GROUP BY 1""".stripMargin
    },
    // q39's capped candidates re-checked by exact bounded Levenshtein
    // over the shared normalized-prefix relation
    "q145_edit_verify" -> {
      import graft.operators.Dedup.{EditVerifyPrefix, EditDupPpm}
      s"""WITH $lshPairsCtes,
         |norm AS (SELECT doc_id,
         |    substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
         |      1, $EditVerifyPrefix) AS t
         |  FROM documents)
         |SELECT p.doc_a, p.doc_b, CAST(p.n_bands AS BIGINT) AS n_bands,
         |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev,
         |  CAST((greatest(length(a.t), length(b.t), 1) - levenshtein(a.t, b.t))
         |    * 1000000 // greatest(length(a.t), length(b.t), 1) AS BIGINT) AS sim_ppm,
         |  (greatest(length(a.t), length(b.t), 1) - levenshtein(a.t, b.t))
         |    * 1000000 // greatest(length(a.t), length(b.t), 1) >= $EditDupPpm
         |    AS is_dup
         |FROM lsh_pairs p
         |JOIN norm a ON p.doc_a = a.doc_id
         |JOIN norm b ON p.doc_b = b.doc_id""".stripMargin
    },
    // doubled median/MAD order statistics over the per-(type, cents)
    // count relation — every boundary an integer comparison
    "q146_value_outliers" -> {
      val madK = graft.operators.EventsOps.MadK
      s"""WITH c AS (SELECT event_type, ${cents("value")} AS v_c,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
         |m1 AS (SELECT event_type, v_c,
         |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM c),
         |med AS (SELECT event_type,
         |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN v_c END)
         |      + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v_c END) AS med2_c,
         |    CAST(MAX(n) AS BIGINT) AS n
         |  FROM m1 GROUP BY 1),
         |d AS (SELECT c.event_type, abs(c.v_c * 2 - med.med2_c) AS dev2,
         |    CAST(SUM(c.cnt) AS BIGINT) AS cnt
         |  FROM c JOIN med ON c.event_type = med.event_type GROUP BY 1, 2),
         |m2 AS (SELECT event_type, dev2,
         |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev2
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM d),
         |mad AS (SELECT event_type,
         |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev2 END)
         |      + MIN(CASE WHEN cum >= (n + 2) // 2 THEN dev2 END) AS mad2_c
         |  FROM m2 GROUP BY 1)
         |SELECT d.event_type, MAX(med.n) AS n,
         |  CAST(MAX(med.med2_c) AS BIGINT) AS med2_c,
         |  CAST(MAX(mad.mad2_c) AS BIGINT) AS mad2_c,
         |  CAST(SUM(CASE WHEN d.dev2 * 2 > $madK * mad.mad2_c
         |    THEN d.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
         |  CAST(SUM(CASE WHEN d.dev2 * 2 > $madK * mad.mad2_c
         |    THEN d.cnt ELSE 0 END) * 1000000 // MAX(med.n) AS BIGINT)
         |    AS outlier_ppm
         |FROM d
         |JOIN mad ON d.event_type = mad.event_type
         |JOIN med ON d.event_type = med.event_type
         |GROUP BY 1""".stripMargin
    },
    // batch gaps-and-islands replay of streaming session_window: merge
    // while the next event lands within the gap INCLUSIVE (break only
    // at diff > gap — boundary pinned by SessionDrainSpec), close when
    // the end-of-input watermark reaches the window end (<=) — both
    // boundaries in exact epoch micros
    "q147_stream_sessions" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
         |    ${cents("value")} AS v_c FROM events),
         |l AS (SELECT *, lag(tus) OVER
         |    (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
         |b AS (SELECT *, CASE WHEN prev IS NULL
         |    OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |    PARTITION BY user_id ORDER BY tus, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b),
         |g AS (SELECT user_id, MIN(tus) AS session_start_us,
         |    MAX(tus) + 1800000000 AS session_end_us,
         |    CAST(COUNT(*) AS BIGINT) AS n_events,
         |    CAST(SUM(v_c) AS BIGINT) AS value_c
         |  FROM s GROUP BY user_id, sid),
         |m AS (SELECT MAX(epoch_us(ts)) // 1000 * 1000 AS max_us
         |      FROM events)
         |SELECT user_id, session_start_us, session_end_us, n_events, value_c
         |FROM g, m WHERE session_end_us <= max_us""".stripMargin,
    // identical integer grid/interleave arithmetic replayed in SQL; the
    // z-term constants come from ONE Scala definition (ZOrder.zValueSql)
    "q148_zorder_layout" -> {
      import graft.lake.ZOrder
      val gmax = (1L << ZOrder.ZBits) - 1
      val top = ZOrder.ZBits - 2 * ZOrder.ChunkBitsPerDim
      val ztop = 2 * ZOrder.ZBits - 2 * ZOrder.ChunkBitsPerDim
      val np = ZOrder.AuditProbes
      s"""WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck,
         |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS d FROM orders),
         |b AS (SELECT MIN(ok) AS oklo, MAX(ok) AS okhi, MIN(ck) AS cklo,
         |    MAX(ck) AS ckhi, MIN(d) AS dlo, MAX(d) AS dhi FROM o),
         |g AS (SELECT ck, d,
         |    (ok - oklo) * $gmax // (okhi - oklo + 1) AS nok,
         |    (ck - cklo) * $gmax // (ckhi - cklo + 1) AS nx,
         |    (d - dlo) * $gmax // (dhi - dlo + 1) AS ny
         |  FROM o, b),
         |zv AS (SELECT ck, d, nok, nx, ny,
         |    ${ZOrder.zValueSql("nx", "ny")} AS z FROM g),
         |ch AS (SELECT layout, chunk, MIN(ck) AS ckmin, MAX(ck) AS ckmax,
         |    MIN(d) AS dmin, MAX(d) AS dmax FROM (
         |    SELECT 'natural' AS layout, nok >> $top AS chunk, ck, d FROM zv
         |    UNION ALL SELECT 'bykey', nx >> $top, ck, d FROM zv
         |    UNION ALL SELECT 'zorder', z >> $ztop, ck, d FROM zv) u
         |  GROUP BY 1, 2),
         |p AS (SELECT
         |    cklo + (i * (ckhi - cklo + 1)) // $np AS p_cklo,
         |    cklo + ((i + 1) * (ckhi - cklo + 1)) // $np - 1 AS p_ckhi,
         |    dlo + (i * 97) % greatest(dhi - dlo - 29, 1) AS p_dlo,
         |    dlo + (i * 97) % greatest(dhi - dlo - 29, 1) + 29 AS p_dhi
         |  FROM (SELECT unnest(generate_series(0, ${np - 1})) AS i) s, b)
         |SELECT layout, CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN ckmin <= p_ckhi AND ckmax >= p_cklo
         |    AND dmin <= p_dhi AND dmax >= p_dlo THEN 1 ELSE 0 END)
         |    AS BIGINT) AS scanned,
         |  CAST(SUM(CASE WHEN ckmin <= p_ckhi AND ckmax >= p_cklo
         |    AND dmin <= p_dhi AND dmax >= p_dlo THEN 1 ELSE 0 END)
         |    * 1000000 // (COUNT(DISTINCT chunk) * $np) AS BIGINT) AS scan_ppm
         |FROM ch, p GROUP BY 1""".stripMargin
    },
    // both FK directions per edge over the child's key-count relation;
    // the stale-dim cut replays DataQuality.referentialAudit's 90% rule
    "q149_referential_audit" -> {
      def edgeSql(edge: String, childTable: String, key: String,
          parentRel: String, pkey: String): String =
        s"""SELECT '$edge' AS edge, a.n_rows, a.n_keys, a.orphan_rows,
           |  a.orphan_keys,
           |  CAST(a.orphan_rows * 1000000 // a.n_rows AS BIGINT) AS orphan_ppm,
           |  u.unref_parent
           |FROM (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_keys,
           |    CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN cnt END), 0)
           |      AS BIGINT) AS orphan_rows,
           |    CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS orphan_keys
           |  FROM (SELECT $key AS k, COUNT(*) AS cnt FROM $childTable
           |        WHERE $key IS NOT NULL GROUP BY 1) kc
           |  LEFT JOIN (SELECT DISTINCT $pkey AS pk FROM $parentRel p0) p
           |    ON k = pk) a,
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS unref_parent
           |   FROM (SELECT DISTINCT $pkey AS pk FROM $parentRel p1) p
           |   WHERE NOT EXISTS (
           |     SELECT 1 FROM (SELECT DISTINCT $key AS k FROM $childTable
           |                    WHERE $key IS NOT NULL) kk
           |     WHERE kk.k = p.pk)) u""".stripMargin
      val stale = "(SELECT * FROM customer WHERE c_custkey <= " +
        "(SELECT MAX(c_custkey) * 9 // 10 FROM customer))"
      Seq(
        edgeSql("orders->customer_stale", "orders", "o_custkey",
          stale, "c_custkey"),
        edgeSql("events->customer_stale", "events", "user_id",
          stale, "c_custkey"),
        edgeSql("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edgeSql("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edgeSql("nation->region", "nation", "n_regionkey",
          "region", "r_regionkey")).mkString("\nUNION ALL\n")
    },
    // minmax vs exact-membership (dictionary) pruning for point probes
    // on the unclustered key — same grid chunking as q148's natural
    // layout, probes by the same 977-stride rule
    "q150_skipindex_audit" -> {
      import graft.lake.ZOrder
      val gmax = (1L << ZOrder.ZBits) - 1
      val top = ZOrder.ZBits - 2 * ZOrder.ChunkBitsPerDim
      val np = ZOrder.PointProbes
      s"""WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck FROM orders),
         |b AS (SELECT MIN(ok) AS oklo, MAX(ok) AS okhi,
         |    MIN(ck) AS cklo, MAX(ck) AS ckhi FROM o),
         |g AS (SELECT ck,
         |    ((ok - oklo) * $gmax // (okhi - oklo + 1)) >> $top AS chunk
         |  FROM o, b),
         |st AS (SELECT chunk, MIN(ck) AS ckmin, MAX(ck) AS ckmax,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows FROM g GROUP BY 1),
         |mem AS (SELECT DISTINCT chunk, ck FROM g),
         |p AS (SELECT i AS probe, cklo + (i * 977) % (ckhi - cklo + 1) AS pck
         |  FROM (SELECT unnest(generate_series(0, ${np - 1})) AS i) s, b),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS all_chunks,
         |    CAST(SUM(n_rows) AS BIGINT) AS all_rows FROM st),
         |mm AS (SELECT 'minmax' AS method,
         |    CAST(COUNT(*) AS BIGINT) AS scanned_chunks,
         |    CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS scanned_rows
         |  FROM st, p WHERE ckmin <= pck AND pck <= ckmax),
         |dc AS (SELECT 'dictionary' AS method,
         |    CAST(COUNT(*) AS BIGINT) AS scanned_chunks,
         |    CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS scanned_rows
         |  FROM (SELECT DISTINCT probe, chunk FROM mem JOIN p ON ck = pck) h
         |  JOIN st USING (chunk)),
         |u AS (SELECT * FROM mm UNION ALL SELECT * FROM dc)
         |SELECT method, scanned_chunks, scanned_rows,
         |  CAST(scanned_chunks * 1000000 // (all_chunks * $np) AS BIGINT)
         |    AS chunk_ppm,
         |  CAST(scanned_rows * 1000000 // (all_rows * $np) AS BIGINT)
         |    AS row_ppm
         |FROM u, tot""".stripMargin
    },
    // survivors → closed-form packing → hash sharding, replayed end to
    // end; the shard rule mirrors Sampling.hashBucket on 'source:seq'
    "q151_export_manifest" -> {
      val b = graft.operators.CorpusPrep.PackBudget
      val sh = graft.operators.Sampling.Shards
      val bk = graft.operators.Sampling.Buckets
      s"""WITH f AS (SELECT doc_id, source,
         |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |k AS (SELECT fp, MIN(doc_id) AS doc_id FROM f GROUP BY 1),
         |s AS (SELECT f.source, CAST(SUM(f.n_tokens) AS BIGINT) AS total
         |  FROM f JOIN k ON f.fp = k.fp AND f.doc_id = k.doc_id
         |  GROUP BY 1 HAVING SUM(f.n_tokens) > 0),
         |q AS (SELECT source, total, (total + $b - 1) // $b AS n_seqs FROM s),
         |e AS (SELECT source, total, n_seqs,
         |    unnest(generate_series(0, n_seqs - 1)) AS seq FROM q),
         |t AS (SELECT source, seq,
         |    CASE WHEN seq < n_seqs - 1 THEN $b
         |         ELSE total - (n_seqs - 1) * $b END AS n_tok,
         |    CAST(concat('0x', substr(md5(source || ':' ||
         |      CAST(seq AS VARCHAR)), 1, 8)) AS BIGINT) % $bk % $sh AS shard
         |  FROM e),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_seqs FROM t)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_seqs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_tok) * 1000000 // (COUNT(*) * $b) AS BIGINT) AS fill_ppm,
         |  CAST(COUNT(*) * $sh * 1000000 // MAX(total_seqs) AS BIGINT)
         |    AS load_ppm
         |FROM t, tot GROUP BY 1""".stripMargin
    },
    // q133's batch interval join, plus the null rows the OUTER drain
    // may emit: exactly the unmatched views whose full join window the
    // end-of-input watermark has passed. The watermark is the MIN over
    // BOTH sides' watermark nodes (each side's max event time,
    // ms-floored — Spark tracks event-time stats in milliseconds), so a
    // click side that ends early holds every later view window open
    "q152_stream_left_attrib" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, event_id AS view_id, ts_us AS v_us
        |      FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
        |      FROM e WHERE event_type = 'click'),
        |m AS (SELECT v.user_id, v.view_id, c.click_id, c_us - v_us AS gap_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |    AND c_us > v_us AND c_us <= v_us + 3600000000),
        |mx AS (SELECT least((SELECT MAX(v_us) FROM v),
        |    (SELECT MAX(c_us) FROM c)) // 1000 * 1000 AS wm_us)
        |SELECT user_id, view_id, click_id, gap_us, TRUE AS matched FROM m
        |UNION ALL
        |SELECT v.user_id, v.view_id, -1 AS click_id, -1 AS gap_us,
        |  FALSE AS matched
        |FROM v, mx
        |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
        |  AND v_us + 3600000000 < wm_us""".stripMargin,
    // round-trip identity: Spark aggregates the JSONL READ-BACK, the
    // oracle the parquet table the export started from — equality IS
    // the fidelity claim
    "q153_jsonl_roundtrip" ->
      """SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(SUM(length(text)) AS BIGINT) AS len_sum,
        |  CAST(BIT_XOR(CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT))
        |    AS BIGINT) AS text_fp_xor
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // integer fixed-point damped PageRank, the iteration unrolled as
    // chained CTEs — exact arithmetic contract in GraphOps.pagerank
    "q154_trade_pagerank" -> {
      import graft.operators.GraphOps.{PrDampPct, PrIters, PrScale}
      val iters = (1 to PrIters).map { i =>
        s"""r$i AS (SELECT e2.dst AS node,
           |    t.tele + ($PrDampPct * SUM((r.rank_q * e2.w) // e2.out_w)) // 100
           |      AS rank_q
           |  FROM e2 JOIN r${i - 1} r ON e2.src = r.node, t
           |  GROUP BY e2.dst, t.tele)""".stripMargin
      }.mkString(",\n")
      s"""WITH pr AS (SELECT l_suppkey AS s, o_custkey AS c, COUNT(*) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |ed AS (SELECT s * 2 AS src, c * 2 + 1 AS dst, w FROM pr
         |  UNION ALL SELECT c * 2 + 1, s * 2, w FROM pr),
         |outw AS (SELECT src, SUM(w) AS out_w FROM ed GROUP BY 1),
         |e2 AS (SELECT ed.src, ed.dst, ed.w, outw.out_w
         |       FROM ed JOIN outw USING (src)),
         |t AS (SELECT ($PrScale // COUNT(*)) AS base,
         |    (15 * ($PrScale // COUNT(*))) // 100 AS tele FROM outw),
         |r0 AS (SELECT src AS node, t.base AS rank_q FROM outw, t),
         |$iters
         |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
         |    AS node_type,
         |  node // 2 AS node_key, CAST(rank_q AS BIGINT) AS rank_q
         |FROM r$PrIters""".stripMargin
    },
    // largest-remainder quota allocation + rank-by-stable-hash
    // selection; same md5-prefix order as the Spark side
    "q155_stratified_alloc" -> {
      import graft.operators.Sampling.AllocPct
      s"""WITH d AS (SELECT doc_id, lang, source FROM documents),
         |s AS (SELECT lang, source, COUNT(*) AS n_docs FROM d GROUP BY 1, 2),
         |tot AS (SELECT SUM(n_docs) AS n_total,
         |    (SUM(n_docs) * $AllocPct) // 100 AS k FROM s),
         |fa AS (SELECT lang, source, n_docs,
         |    (t.k * n_docs) // t.n_total AS floor_a,
         |    (t.k * n_docs) % t.n_total AS rem, t.k AS k FROM s, tot t),
         |al AS (SELECT lang, source, n_docs,
         |    floor_a + CASE WHEN ROW_NUMBER() OVER
         |        (ORDER BY rem DESC, lang, source)
         |      <= k - SUM(floor_a) OVER () THEN 1 ELSE 0 END AS alloc
         |  FROM fa),
         |rk AS (SELECT doc_id, lang, source,
         |    ROW_NUMBER() OVER (PARTITION BY lang, source
         |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
         |        1, 12)) AS BIGINT), doc_id) AS rn
         |  FROM d),
         |sel AS (SELECT rk.lang, rk.source, COUNT(*) AS n_sel,
         |    SUM(doc_id) AS sel_id_sum
         |  FROM rk JOIN al ON rk.lang = al.lang AND rk.source = al.source
         |    AND rk.rn <= al.alloc
         |  GROUP BY 1, 2)
         |SELECT al.lang, al.source, CAST(al.n_docs AS BIGINT) AS n_docs,
         |  CAST(al.alloc AS BIGINT) AS alloc,
         |  CAST(COALESCE(sel.n_sel, 0) AS BIGINT) AS n_sel,
         |  CAST(COALESCE(sel.sel_id_sum, 0) AS BIGINT) AS sel_id_sum
         |FROM al LEFT JOIN sel
         |  ON al.lang = sel.lang AND al.source = sel.source""".stripMargin
    },
    // the oracle PREDICTS the fragmented table's listing (files =
    // distinct portable-hash shards, rows per year) and replays the
    // shared ceil-div planning law
    "q156_compaction_plan" -> {
      import graft.lake.Compaction.{RowsPerFileTarget, SmallFileShards}
      val target =
        s"greatest(1, (COUNT(*) + $RowsPerFileTarget - 1) // $RowsPerFileTarget)"
      s"""WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         |    CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
         |      AS BIGINT) % $SmallFileShards AS shard
         |  FROM orders)
         |SELECT y AS year, CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_files,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST($target AS BIGINT) AS target_files,
         |  COUNT(DISTINCT shard) > $target AS worth_compacting
         |FROM o GROUP BY 1""".stripMargin
    },
    // inverted-index tf·idf with 1%-df term admission; same bounded
    // top-k total order as graft_topk (score DESC, id ASC)
    "q157_lexical_topk" -> {
      import graft.operators.Retrieval.LexK
      s"""WITH $lexCtes
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
         |  CAST(score AS BIGINT) AS score
         |FROM lex WHERE rank <= $LexK""".stripMargin
    },
    // reciprocal-rank fusion of the lexical (q157) and dense
    // (derived-knob IVF, q106's production path) top-k lists —
    // 10⁶ // (60 + rank) per list, −1 sentinels
    "q158_rrf_fusion" -> {
      import graft.operators.Retrieval.{LexK, RrfK0}
      s"""WITH $ivfDerivedCtes,
         |$lexCtes,
         |sem AS (SELECT q_id, vec_id AS doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS rank FROM c),
         |l5 AS (SELECT q_id, doc_id, rank FROM lex WHERE rank <= $LexK),
         |s5 AS (SELECT q_id, doc_id, rank FROM sem WHERE rank <= $LexK),
         |u AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
         |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
         |    CAST(COALESCE(l.rank, -1) AS BIGINT) AS lex_rank,
         |    CAST(COALESCE(s.rank, -1) AS BIGINT) AS sem_rank,
         |    CAST(COALESCE(1000000 // ($RrfK0 + l.rank), 0)
         |      + COALESCE(1000000 // ($RrfK0 + s.rank), 0) AS BIGINT) AS rrf_ppm
         |  FROM l5 l FULL OUTER JOIN s5 s
         |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
         |SELECT q_id, doc_id, lex_rank, sem_rank, rrf_ppm, fused_rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY rrf_ppm DESC, doc_id ASC) AS BIGINT) AS fused_rank
         |  FROM u) t
         |WHERE fused_rank <= $LexK""".stripMargin
    },
    // sequence pattern with negation: first purchase / first error in
    // the strictly-after hour frame, clean iff no error precedes the
    // purchase — same µs range-frame semantics as the Spark windows
    "q159_event_pattern" -> {
      import graft.operators.EventsOps.PatternWindowUs
      val frame = s"PARTITION BY user_id ORDER BY ts_us " +
        s"RANGE BETWEEN 1 FOLLOWING AND $PatternWindowUs FOLLOWING"
      s"""WITH ev AS (SELECT event_id, user_id, event_type,
         |    epoch_us(ts) AS ts_us FROM events),
         |m AS (SELECT user_id, event_id, event_type, ts_us,
         |    MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
         |      OVER ($frame) AS p_ts,
         |    MIN(CASE WHEN event_type = 'error' THEN ts_us END)
         |      OVER ($frame) AS e_ts
         |  FROM ev)
         |SELECT user_id, event_id, ts_us,
         |  COALESCE(p_ts, -1) AS p_ts_us, COALESCE(e_ts, -1) AS e_ts_us,
         |  (p_ts IS NOT NULL AND (e_ts IS NULL OR e_ts > p_ts))
         |    AS converted_clean
         |FROM m WHERE event_type = 'view'""".stripMargin
    },
    // integer shift-decay: halve per DecayHalfLifeDays of age from the
    // corpus max timestamp
    "q160_decayed_activity" -> {
      import graft.operators.EventsOps.DecayHalfLifeDays
      val stepUs = 86400000000L * DecayHalfLifeDays
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
         |    ${cents("value")} AS value_c FROM events),
         |r AS (SELECT MAX(ts_us) AS ref_us FROM ev)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(value_c) AS BIGINT) AS raw_c,
         |  CAST(SUM(value_c >> CAST(least((ref_us - ts_us) // $stepUs, 62)
         |    AS INT)) AS BIGINT) AS decayed_c
         |FROM ev, r GROUP BY 1""".stripMargin
    },
    // keyed diff of two derived versions — the add/delete/change rules
    // and the per-row fingerprint replayed verbatim
    "q161_table_diff" -> {
      import graft.lake.TableDiff.{AddMod, ChangeMod, DeleteMod}
      def fpSql(alias: String) =
        s"CAST(concat('0x', substr(md5(concat_ws('|', o_orderstatus, " +
          s"CAST(price_c AS VARCHAR))), 1, 12)) AS BIGINT) AS $alias"
      s"""WITH base AS (SELECT o_orderkey AS k, o_orderstatus,
         |    ${cents("o_totalprice")} AS price_c FROM orders),
         |v1 AS (SELECT k, ${fpSql("fp_old")} FROM base WHERE k % $AddMod <> 1),
         |v2b AS (SELECT k, o_orderstatus,
         |    CASE WHEN k % $ChangeMod = 0 THEN price_c + price_c // 10
         |      ELSE price_c END AS price_c
         |  FROM base WHERE k % $DeleteMod <> 0),
         |v2 AS (SELECT k, ${fpSql("fp_new")} FROM v2b),
         |j AS (SELECT COALESCE(v1.k, v2.k) AS k, fp_old, fp_new
         |      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
         |SELECT CASE WHEN fp_old IS NULL THEN 'added'
         |    WHEN fp_new IS NULL THEN 'removed'
         |    WHEN fp_old = fp_new THEN 'unchanged'
         |    ELSE 'changed' END AS class,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(k) AS BIGINT) AS key_sum,
         |  CAST(bit_xor(COALESCE(fp_new, fp_old)) AS BIGINT) AS fp_xor
         |FROM j GROUP BY 1""".stripMargin
    },
    // base + late-arriving delta partials merged by the state algebra
    // (split orthogonal to the cube key so every key is two-sided),
    // certified per key against the direct recompute
    "q162_incremental_agg" -> {
      import graft.operators.Incremental.DeltaMod
      val part = "SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "CAST(SUM(v) AS BIGINT) AS sum_c, MIN(v) AS min_c, MAX(v) AS max_c"
      s"""WITH ev AS (SELECT event_type, event_id,
         |    epoch_us(ts) * 1000 // 86400000000000 AS day,
         |    ${cents("value")} AS v FROM events),
         |base AS ($part FROM ev WHERE event_id % $DeltaMod <> 0
         |         GROUP BY 1, 2),
         |delta AS ($part FROM ev WHERE event_id % $DeltaMod = 0
         |          GROUP BY 1, 2),
         |m AS (SELECT COALESCE(b.event_type, d.event_type) AS event_type,
         |    COALESCE(b.day, d.day) AS day,
         |    COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0) AS cnt,
         |    COALESCE(b.sum_c, 0) + COALESCE(d.sum_c, 0) AS sum_c,
         |    CASE WHEN b.min_c IS NULL THEN d.min_c
         |      WHEN d.min_c IS NULL THEN b.min_c
         |      ELSE LEAST(b.min_c, d.min_c) END AS min_c,
         |    CASE WHEN b.max_c IS NULL THEN d.max_c
         |      WHEN d.max_c IS NULL THEN b.max_c
         |      ELSE GREATEST(b.max_c, d.max_c) END AS max_c
         |  FROM base b FULL OUTER JOIN delta d
         |    ON b.event_type = d.event_type AND b.day = d.day),
         |mm AS (SELECT *, sum_c // cnt AS avg_c FROM m),
         |f AS (SELECT *, sum_c // cnt AS avg_c
         |      FROM ($part FROM ev GROUP BY 1, 2) t)
         |SELECT mm.event_type, mm.day, mm.cnt, mm.sum_c, mm.min_c,
         |  mm.max_c, CAST(mm.avg_c AS BIGINT) AS avg_c,
         |  (mm.cnt = f.cnt AND mm.sum_c = f.sum_c AND mm.min_c = f.min_c
         |    AND mm.max_c = f.max_c AND mm.avg_c = f.avg_c) AS matches_full
         |FROM mm JOIN f
         |  ON mm.event_type = f.event_type AND mm.day = f.day""".stripMargin
    },
    // first-order transition model in integer ppm; per-user rarity sum
    // over the same lag relation
    "q164_transition_rarity" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |tr AS (SELECT user_id,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM ev),
        |t2 AS (SELECT * FROM tr WHERE from_type IS NOT NULL),
        |model AS (SELECT from_type, to_type,
        |    COUNT(*) * 1000000 // (SELECT COUNT(*) FROM t2) AS p_ppm
        |  FROM t2 GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
        |  CAST(SUM(1000000 - p_ppm) AS BIGINT) AS rarity_sum,
        |  CAST(SUM(1000000 - p_ppm) // COUNT(*) AS BIGINT) AS avg_rarity_ppm
        |FROM t2 JOIN model USING (from_type, to_type)
        |GROUP BY 1""".stripMargin,
    // round-robin interleave: rank-by-hash within source, fixed
    // alphabetical source slots
    "q165_interleave_order" ->
      """WITH s AS (SELECT source,
        |    ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
        |    COUNT(*) OVER () AS n_sources
        |  FROM (SELECT DISTINCT source FROM documents) d),
        |r AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
        |        1, 12)) AS BIGINT), doc_id) - 1 AS rank_in_source
        |  FROM documents)
        |SELECT r.doc_id, r.source,
        |  CAST(r.rank_in_source AS BIGINT) AS rank_in_source,
        |  CAST(r.rank_in_source * s.n_sources + s.src_idx AS BIGINT)
        |    AS global_pos
        |FROM r JOIN s USING (source)""".stripMargin,
    // adjacent-bigram lift in the exact two-step floor-div contract
    "q166_collocations" -> {
      import graft.operators.CorpusPrep.CollocMinSupport
      s"""WITH tk AS (SELECT $toks AS toks FROM documents),
         |uni AS (SELECT tok, COUNT(*) AS n
         |  FROM (SELECT unnest(toks) AS tok FROM tk) u GROUP BY 1),
         |tot AS (SELECT SUM(n) AS t_tokens FROM uni),
         |bi AS (SELECT x.p.a AS tok_a, x.p.b AS tok_b, COUNT(*) AS n_ab
         |  FROM (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |      i -> {'a': toks[i], 'b': toks[i + 1]})) AS p
         |    FROM tk WHERE len(toks) >= 2) x
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $CollocMinSupport)
         |SELECT bi.tok_a, bi.tok_b, CAST(bi.n_ab AS BIGINT) AS n_ab,
         |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
         |  CAST((bi.n_ab * 1000000 // a.n) * t.t_tokens // b.n AS BIGINT)
         |    AS lift_ppm
         |FROM bi
         |JOIN uni a ON bi.tok_a = a.tok
         |JOIN uni b ON bi.tok_b = b.tok, tot t""".stripMargin
    },
    // q152's pinned rules (min-watermark, ms floor, strict view
    // closure) plus the full join's click side: a matching view must be
    // STRICTLY earlier, so a click closes non-strictly at the watermark
    // (SessionDrainSpec's q167 fixtures discriminate <= from <)
    "q167_stream_full_attrib" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, event_id AS view_id, ts_us AS v_us
        |      FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
        |      FROM e WHERE event_type = 'click'),
        |m AS (SELECT v.user_id, v.view_id, c.click_id, c_us - v_us AS gap_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |    AND c_us > v_us AND c_us <= v_us + 3600000000),
        |mx AS (SELECT least((SELECT MAX(v_us) FROM v),
        |    (SELECT MAX(c_us) FROM c)) // 1000 * 1000 AS wm_us)
        |SELECT user_id, view_id, click_id, gap_us, TRUE AS matched FROM m
        |UNION ALL
        |SELECT v.user_id, v.view_id, -1 AS click_id, -1 AS gap_us,
        |  FALSE AS matched
        |FROM v, mx
        |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
        |  AND v_us + 3600000000 < wm_us
        |UNION ALL
        |SELECT c.user_id, -1 AS view_id, c.click_id, -1 AS gap_us,
        |  FALSE AS matched
        |FROM c, mx
        |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
        |  AND c_us <= wm_us""".stripMargin,
    // q162's IVM posture folded into q149: per-edge key counts from the
    // base/delta split merged by summing per key, audited from the
    // merged state, certified against the full recompute in-query
    "q168_incremental_ref_audit" -> {
      import graft.operators.Incremental.DeltaMod
      def kcSub(childTable: String, key: String, extra: String): String =
        s"""(SELECT $key AS k, COUNT(*) AS cnt FROM $childTable
           | WHERE $key IS NOT NULL$extra GROUP BY 1)""".stripMargin
      def incEdgeSql(edge: String, childTable: String, splitCol: String,
          key: String, parentRel: String, pkey: String): String = {
        val kb = kcSub(childTable, key, s" AND $splitCol % $DeltaMod <> 0")
        val kd = kcSub(childTable, key, s" AND $splitCol % $DeltaMod = 0")
        val km =
          s"""(SELECT COALESCE(b.k, d.k) AS k,
             |   COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0) AS cnt
             | FROM $kb b FULL OUTER JOIN $kd d ON b.k = d.k)""".stripMargin
        val kf = kcSub(childTable, key, "")
        def auditSub(kc: String): String =
          s"""(SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |   CAST(COUNT(*) AS BIGINT) AS n_keys,
             |   CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN cnt END), 0)
             |     AS BIGINT) AS orphan_rows,
             |   CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |     AS orphan_keys
             | FROM $kc kc
             | LEFT JOIN (SELECT DISTINCT $pkey AS pk FROM $parentRel p0) p
             |   ON k = pk)""".stripMargin
        def unrefSub(kc: String): String =
          s"""(SELECT CAST(COUNT(*) AS BIGINT) AS unref_parent
             | FROM (SELECT DISTINCT $pkey AS pk FROM $parentRel p1) p
             | WHERE NOT EXISTS (SELECT 1 FROM $kc kk WHERE kk.k = p.pk))""".stripMargin
        s"""SELECT '$edge' AS edge, a.n_rows, a.n_keys, a.orphan_rows,
           |  a.orphan_keys,
           |  CAST(a.orphan_rows * 1000000 // a.n_rows AS BIGINT) AS orphan_ppm,
           |  u.unref_parent,
           |  (a.n_rows = fa.n_rows AND a.n_keys = fa.n_keys
           |   AND a.orphan_rows = fa.orphan_rows
           |   AND a.orphan_keys = fa.orphan_keys
           |   AND u.unref_parent = fu.unref_parent) AS matches_full
           |FROM ${auditSub(km)} a, ${unrefSub(km)} u,
           |  ${auditSub(kf)} fa, ${unrefSub(kf)} fu""".stripMargin
      }
      val stale = "(SELECT * FROM customer WHERE c_custkey <= " +
        "(SELECT MAX(c_custkey) * 9 // 10 FROM customer))"
      Seq(
        incEdgeSql("orders->customer_stale", "orders", "o_orderkey",
          "o_custkey", stale, "c_custkey"),
        incEdgeSql("lineitem->orders", "lineitem", "l_partkey",
          "l_orderkey", "orders", "o_orderkey")).mkString("\nUNION ALL\n")
    },
    // k-anonymity / l-diversity audit: QI groups at generalization
    // levels 0 (nation, segment) and 1 (segment → '*'); sensitive =
    // $1000 balance bands, offset non-negative so // is exact floor
    "q169_k_anonymity" -> {
      import graft.quality.PrivacyAudit.{BandCents, BandOffsetCents, KAnon, LDiv}
      s"""WITH base AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |    c_mktsegment AS segment,
         |    (${cents("c_acctbal")} + $BandOffsetCents) // $BandCents AS bal_band
         |  FROM customer),
         |u AS (
         |  SELECT CAST(0 AS BIGINT) AS level, nation, segment,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct
         |  FROM base GROUP BY 2, 3
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT) AS level, nation, '*' AS segment,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct
         |  FROM base GROUP BY 2)
         |SELECT level, nation, segment, n_rows, l_distinct,
         |  n_rows >= $KAnon AS k_ok, l_distinct >= $LDiv AS l_ok
         |FROM u""".stripMargin
    },
    // conditional char-bigram LM: p(c2|c1) in floor-div ppm over the
    // 80% hash-split train corpus; per-doc mean transition surprisal.
    // Context totals derive from the train bigram relation itself.
    "q170_char_lm_score" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 2),
        |bg0 AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, length(text) - 1), i -> substr(text, i, 2))) AS bg
        |  FROM d),
        |train AS (SELECT bg, COUNT(*) AS n_bg FROM bg0
        |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 1000000 < 800000
        |  GROUP BY 1),
        |pre AS (SELECT substr(bg, 1, 1) AS pre, CAST(SUM(n_bg) AS BIGINT) AS n_pre
        |  FROM train GROUP BY 1),
        |p AS (SELECT b.doc_id,
        |    CASE WHEN COALESCE(pr.n_pre, 0) > 0
        |      THEN CAST(CAST(COALESCE(m.n_bg, 0) AS HUGEINT) * 1000000
        |        // pr.n_pre AS BIGINT)
        |      ELSE 0 END AS cond_ppm
        |  FROM bg0 b
        |  LEFT JOIN train m USING (bg)
        |  LEFT JOIN pre pr ON substr(b.bg, 1, 1) = pr.pre)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg,
        |  CAST(SUM(1000000 - cond_ppm) // COUNT(*) AS BIGINT) AS avg_surprisal_ppm
        |FROM p GROUP BY 1""".stripMargin,
    // per-source adaptive quality floor: exact 25th-percentile stopword
    // ratio under the deterministic (score, doc_id) order, value-rule
    // keeps (score >= floor)
    "q171_adaptive_floor" -> {
      val stopList = graft.operators.CorpusPrep.GateStopWords
        .map(w => s"'$w'").mkString(",")
      s"""WITH s AS (SELECT doc_id, source,
         |    CAST(len($toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter($toks, t -> t IN ($stopList))) AS BIGINT) AS n_stop
         |  FROM documents WHERE trim(text) <> '' AND len($toks) >= 1),
         |sc AS (SELECT doc_id, source, n_tok,
         |    n_stop * 1000000 // n_tok AS score_ppm FROM s),
         |r AS (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY score_ppm, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n_src FROM sc),
         |thr AS (SELECT source, score_ppm AS thr_ppm FROM r
         |        WHERE rn = 1 + (n_src - 1) // 4)
         |SELECT sc.source, CAST(COUNT(*) AS BIGINT) AS n_docs, thr.thr_ppm,
         |  CAST(SUM(CASE WHEN score_ppm >= thr_ppm THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN score_ppm >= thr_ppm THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tok_kept,
         |  CAST(SUM(n_tok) AS BIGINT) AS tok_total
         |FROM sc JOIN thr ON sc.source = thr.source
         |GROUP BY 1, 3""".stripMargin
    },
    // SemDeDup ledger: dropped = distinct id_b of the shared capped
    // cos_pairs relation (q52's generator — one definition, three
    // consumers); kept_id_sum checksums WHICH vectors survived
    "q172_semantic_dedup" ->
      s"""WITH $cosPairsCtes,
         |drop0 AS (SELECT DISTINCT id_b AS vec_id FROM cos_pairs),
         |led AS (SELECT a.vec_id, a.bucket,
         |    CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
         |  FROM asg a LEFT JOIN drop0 d USING (vec_id))
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(is_dup) AS BIGINT) AS n_dropped,
         |  CAST(SUM(1 - is_dup) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN is_dup = 0 THEN vec_id ELSE 0 END) AS BIGINT)
         |    AS kept_id_sum
         |FROM led GROUP BY 1""".stripMargin,
    // JL ±1 sign projection 64→16: sign(j,i) = parity of the first 32
    // md5 bits of "j_i"; exact long math over per-element ⌊x·1e6⌋
    "q173_jl_projection" -> {
      import graft.operators.Similarity.{JlInDim, JlOutDim}
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS xq
         |  FROM embeddings),
         |p AS (SELECT vec_id, j,
         |    CAST(list_sum(list_transform(generate_series(1, $JlInDim), i ->
         |      xq[i] * (CASE WHEN CAST(concat('0x', substr(md5(
         |          concat(CAST(j AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 8))
         |          AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END))) AS BIGINT) AS y
         |  FROM e, generate_series(0, ${JlOutDim - 1}) AS g(j))
         |SELECT vec_id, CAST(SUM(y) AS BIGINT) AS y_sum,
         |  bit_xor(y) AS y_xor,
         |  CAST(SUM(y * y) AS BIGINT) AS y_sq_sum
         |FROM p GROUP BY 1""".stripMargin
    },
    // exact greedy BPE: each round re-derives pair counts with LEAD,
    // takes the (cnt DESC, pair ASC) top pair, resolves greedy-leftmost
    // overlaps via the run-alternation rule (marked runs alternate
    // active from the run start), fuses, and renumbers — the same
    // three-window algebra as CorpusPrep.bpeMergeStep, unrolled per
    // round
    "q174_bpe_merges" -> {
      def statSelect(k: Int): String =
        s"""SELECT CAST($k AS BIGINT) AS step, a AS sym_a, b AS sym_b,
           |  cnt AS pair_cnt,
           |  (SELECT CAST(SUM(w_cnt) AS BIGINT) FROM r_$k) AS n_symbols_after
           |FROM top_$k""".stripMargin
      s"""WITH $bpeCtes
         |${bpeStepRange.map(statSelect).mkString("\nUNION ALL\n")}""".stripMargin
    },
    // Gram accumulator rows (i ≤ j) + per-dim sums (j = 0) + count
    // (0, 0); ⌊x·10³⌋ quantization, HUGEINT-widened sums
    "q175_embed_covariance" -> {
      val d = graft.operators.Similarity.JlInDim
      s"""WITH e AS (SELECT list_transform(embedding, x ->
         |    CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS xq
         |  FROM embeddings),
         |pr AS (SELECT unnest(flatten(list_transform(generate_series(1, $d), i ->
         |    list_transform(generate_series(i, $d), j ->
         |      struct_pack(i := i, j := j, p := xq[i] * xq[j]))))) AS e2 FROM e),
         |pairs AS (SELECT CAST(e2.i AS BIGINT) AS i, CAST(e2.j AS BIGINT) AS j,
         |    CAST(SUM(CAST(e2.p AS HUGEINT)) AS BIGINT) AS s FROM pr GROUP BY 1, 2),
         |sr AS (SELECT unnest(list_transform(generate_series(1, $d), i ->
         |    struct_pack(i := i, x := xq[i]))) AS e1 FROM e),
         |sums AS (SELECT CAST(e1.i AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
         |    CAST(SUM(CAST(e1.x AS HUGEINT)) AS BIGINT) AS s FROM sr GROUP BY 1, 2),
         |cnt AS (SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
         |    CAST(COUNT(*) AS BIGINT) AS s FROM e)
         |SELECT * FROM pairs UNION ALL SELECT * FROM sums
         |UNION ALL SELECT * FROM cnt""".stripMargin
    },
    // degree-oriented triangle algebra: p95 weight cut from the value
    // histogram, (deg·1e9 + id) total-order orientation, out-neighbor
    // wedges closed by one oriented-edge join; ppm local clustering
    "q176_supplier_triangles" -> {
      s"""WITH $coSupplyCtes,
         |deg AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS s FROM edges UNION ALL SELECT b AS s FROM edges) t
         |  GROUP BY 1),
         |ork AS MATERIALIZED (SELECT
         |    CASE WHEN da.deg * 1000000000 + a < db.deg * 1000000000 + b
         |      THEN a ELSE b END AS u,
         |    CASE WHEN da.deg * 1000000000 + a < db.deg * 1000000000 + b
         |      THEN b ELSE a END AS v,
         |    CASE WHEN da.deg * 1000000000 + a < db.deg * 1000000000 + b
         |      THEN db.deg * 1000000000 + b ELSE da.deg * 1000000000 + a END AS vkey
         |  FROM edges JOIN deg da ON a = da.s JOIN deg db ON b = db.s),
         |wedges AS MATERIALIZED (SELECT p1.u AS u, p1.v AS v, p2.v AS w FROM ork p1
         |  JOIN ork p2 ON p1.u = p2.u AND p1.vkey < p2.vkey),
         |tris AS MATERIALIZED (SELECT wd.u, wd.v, wd.w FROM wedges wd
         |  JOIN ork o ON wd.v = o.u AND wd.w = o.v),
         |pn AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
         |    SELECT u AS s FROM tris UNION ALL SELECT v AS s FROM tris
         |    UNION ALL SELECT w AS s FROM tris) t GROUP BY 1)
         |SELECT d.s AS suppkey, d.deg, COALESCE(pn.n_tri, 0) AS n_tri,
         |  CASE WHEN d.deg >= 2
         |    THEN COALESCE(pn.n_tri, 0) * 2000000 // (d.deg * (d.deg - 1))
         |    ELSE 0 END AS clust_ppm
         |FROM deg d LEFT JOIN pn ON d.s = pn.s""".stripMargin
    },
    // encode = per-word BPE lengths from the shared merge chain's
    // final relation, joined onto the exploded corpus words
    "q177_bpe_encode" ->
      s"""WITH $bpeCtes,
         |wl AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe
         |  FROM r_${graft.operators.CorpusPrep.BpeSteps} GROUP BY 1),
         |dw AS (SELECT doc_id, unnest($toks) AS word FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
         |FROM dw JOIN wl USING (word) WHERE word <> ''
         |GROUP BY 1""".stripMargin,
    // fixed-round peel over the shared co-supply edges: degree cut at
    // K, survivors filter both endpoints, one trajectory row per round
    "q178_kcore_peel" -> {
      import graft.operators.GraphOps.{KCoreK, KCoreRounds}
      // MATERIALIZED: DuckDB inlines plain CTEs per REFERENCE, and each
      // round references its predecessor three times — unmaterialized,
      // the chain expands 3^rounds copies of the base scan (measured:
      // "Too many open files" at six rounds)
      def peelCtes(r: Int): String =
        s"""deg_$r AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM (
           |    SELECT a AS s FROM e_${r - 1} UNION ALL SELECT b AS s FROM e_${r - 1}) t
           |  GROUP BY 1),
           |keep_$r AS MATERIALIZED (SELECT s FROM deg_$r WHERE deg >= $KCoreK),
           |e_$r AS MATERIALIZED (SELECT a, b FROM e_${r - 1}
           |  WHERE a IN (SELECT s FROM keep_$r) AND b IN (SELECT s FROM keep_$r))"""
          .stripMargin
      def statSelect(r: Int): String =
        s"""SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM keep_$r) AS n_nodes,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e_$r) AS n_edges""".stripMargin
      val rs = 1 to KCoreRounds
      s"""WITH $coSupplyCtes,
         |e_0 AS MATERIALIZED (SELECT a, b FROM edges),
         |${rs.map(peelCtes).mkString(",\n")}
         |${rs.map(statSelect).mkString("\nUNION ALL\n")}""".stripMargin
    },
    // scaled-integer CUSUM: C_t = n·S_t − t·S_n over the day-bounded
    // daily relation, DIV n back to cents, peak flag on max |C_t|
    "q179_revenue_cusum" ->
      s"""WITH daily AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
         |    ${sumc("o_totalprice")} AS x_c
         |  FROM orders GROUP BY 1),
         |c AS (SELECT day, x_c,
         |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         |    SUM(x_c) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n_days,
         |    SUM(x_c) OVER () AS total
         |  FROM daily),
         |s AS (SELECT t, day, x_c,
         |    CAST((CAST(n_days AS HUGEINT) * prefix - CAST(t AS HUGEINT) * total)
         |      // n_days AS BIGINT) AS cusum_c
         |  FROM c)
         |SELECT t, day, x_c, cusum_c,
         |  abs(cusum_c) = MAX(abs(cusum_c)) OVER () AS is_peak
         |FROM s""".stripMargin,
    // Benford screen: observed first-digit ppm of positive cents vs
    // the shared floor(log10(1+1/d)·1e6) expectation literals
    "q180_benford_audit" -> {
      val expRows = graft.operators.StatsAudit.BenfordPpm
        .map { case (d, p) => s"($d, ${p})" }.mkString(", ")
      s"""WITH exp9(digit, exp_ppm) AS (VALUES $expRows),
         |obs AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT ${cents("l_extendedprice")} AS c FROM lineitem) t
         |  WHERE c > 0 GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM obs)
         |SELECT o.digit, o.n,
         |  CAST(CAST(o.n AS HUGEINT) * 1000000 // n_total AS BIGINT) AS obs_ppm,
         |  CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(CAST(o.n AS HUGEINT) * 1000000 // n_total AS BIGINT)
         |    - CAST(e.exp_ppm AS BIGINT) AS dev_ppm
         |FROM obs o JOIN exp9 e ON o.digit = e.digit, tot""".stripMargin
    },
    // 1-NN within the capped IVF buckets: argmax quantized cosine
    // (smaller-id ties) predicts the label; label×label rollup
    "q181_knn_label_eval" -> s"WITH $ivfCte,\n$knnConfusionTail",
    // same confusion algebra on the DERIVED √N width (the q99/q106
    // index scheme: nlist = GREATEST(16, ROUND(SQRT(N))))
    "q182_knn_label_derived" ->
      s"""WITH $derivedAsgPrefix,
         |$knnConfusionTail""".stripMargin,
    // frequent part pairs over the shared basket CTEs
    "q183_frequent_pairs" ->
      s"""WITH $basketCtes
         |SELECT p_a, p_b, support FROM fp""".stripMargin,
    // both rule directions joined to item supports; conf/lift exact
    // ppm with HUGEINT widening mirroring the DECIMAL(38) Spark side
    "q184_association_rules" ->
      s"""WITH $basketCtes,
         |item AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS s_item
         |  FROM (SELECT unnest(ps) AS p FROM bk) t GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM bk),
         |rules AS (
         |  SELECT p_a AS antecedent, p_b AS consequent, support FROM fp
         |  UNION ALL
         |  SELECT p_b AS antecedent, p_a AS consequent, support FROM fp)
         |SELECT r.antecedent, r.consequent, r.support,
         |  ia.s_item AS s_ant, ic.s_item AS s_cons,
         |  r.support * 1000000 // ia.s_item AS conf_ppm,
         |  CAST(CAST(r.support AS HUGEINT) * n.n_baskets * 1000000
         |    // (CAST(ia.s_item AS HUGEINT) * ic.s_item) AS BIGINT) AS lift_ppm
         |FROM rules r
         |JOIN item ia ON r.antecedent = ia.p
         |JOIN item ic ON r.consequent = ic.p, n""".stripMargin,
    // exact-integer normal equations on the (nation × month) relation;
    // r2 reordered as ((num*1e6 DIV den_x)*num) DIV den_y to bound the
    // intermediates by Cauchy-Schwarz (mirrors the Spark side exactly)
    "q185_revenue_trend" ->
      s"""WITH monthly AS (
         |  SELECT c.c_nationkey,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
         |    CAST(SUM(${cents("o_totalprice")}) AS BIGINT) // 100 AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |s AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_months,
         |    CAST(SUM(m) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(m * m) AS BIGINT) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy,
         |    SUM(CAST(m AS HUGEINT) * y) AS sxy
         |  FROM monthly GROUP BY 1),
         |d AS (SELECT *,
         |    CAST(n_months AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    CAST(n_months AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
         |    CAST(n_months AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
         |  FROM s)
         |SELECT n.n_name, d.n_months, d.sy AS total_dollars,
         |  CASE WHEN den_x = 0 THEN NULL
         |    ELSE CAST(num * 1000000 // den_x AS BIGINT) END AS slope_ppm,
         |  CASE WHEN den_x = 0 THEN NULL
         |    ELSE CAST((CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy)
         |      * 1000000 // den_x AS BIGINT) END AS intercept_ppm,
         |  CASE WHEN den_x = 0 OR den_y = 0 THEN NULL
         |    ELSE CAST(((num * 1000000 // den_x) * num) // den_y AS BIGINT)
         |    END AS r2_ppm
         |FROM d JOIN nation n ON d.c_nationkey = n.n_nationkey""".stripMargin,
    // tau=1/2 temperature shares via floor(sqrt) — IEEE-exact in both
    // engines; same token regex as the q79 oracle
    "q186_temperature_mix" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_extract_all(text,
        |      ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |pl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tok_total,
        |    CAST(floor(sqrt(CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE))) AS BIGINT)
        |      AS sqrt_tok
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS grand_total,
        |      CAST(SUM(sqrt_tok) AS BIGINT) AS sqrt_total FROM pl)
        |SELECT lang, n_docs, tok_total,
        |  tok_total * 1000000 // grand_total AS nat_share_ppm,
        |  sqrt_tok * 1000000 // sqrt_total AS temp_share_ppm,
        |  (sqrt_tok * 1000000 // sqrt_total) * 1000000
        |    // greatest(tok_total * 1000000 // grand_total, 1) AS boost_ppm
        |FROM pl, t""".stripMargin,
    // min-rank percentile from the per-source score histogram, decile
    // rollup — mirrors the histogram-window Spark plan exactly
    "q187_quantile_normalize" ->
      """WITH h AS (SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, n_chars, cnt,
        |    COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |    SUM(cnt) OVER (PARTITION BY source) AS n_src
        |  FROM h),
        |n AS (SELECT source, n_chars, cnt,
        |    least((below * 1000000 // greatest(n_src - 1, 1)) // 100000, 9)
        |      AS decile
        |  FROM r)
        |SELECT source, CAST(decile AS BIGINT) AS decile,
        |  CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_score,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_score
        |FROM n GROUP BY 1, 2""".stripMargin,
    // per-language fertility/compression over the shared BPE chain —
    // the q177 word-length join rolled up by lang with HUGEINT ratios
    "q188_bpe_fertility" ->
      s"""WITH $bpeCtes,
         |wl AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe
         |  FROM r_${graft.operators.CorpusPrep.BpeSteps} GROUP BY 1),
         |dw AS (SELECT lang, unnest($toks) AS word FROM documents),
         |agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
         |    CAST(SUM(len(word)) AS BIGINT) AS n_chars
         |  FROM dw JOIN wl USING (word) WHERE word <> ''
         |  GROUP BY 1)
         |SELECT lang, n_words, n_bpe_tokens, n_chars,
         |  CAST(CAST(n_bpe_tokens AS HUGEINT) * 1000000 // n_words AS BIGINT)
         |    AS fertility_ppm,
         |  CAST(CAST(n_chars AS HUGEINT) * 1000000 // n_bpe_tokens AS BIGINT)
         |    AS compression_ppm
         |FROM agg""".stripMargin,
    // fixed-round synchronous LPA over the shared co-supply edges:
    // per-node argmax neighbor label (count DESC, label ASC — the
    // max(struct(n, -label)) Spark aggregation), MATERIALIZED per
    // round (the q178 3-references rule); bit_xor membership witness
    "q189_label_propagation" -> {
      import graft.operators.GraphOps.LpaRounds
      def statSelect(r: Int): String =
        s"""SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM lbl_$r) AS n_labels,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lbl_$r x JOIN lbl_${r - 1} y
           |     ON x.s = y.s WHERE x.label <> y.label) AS n_moved,
           |  (SELECT CAST(bit_xor(s * 1000000000 + label) AS BIGINT)
           |     FROM lbl_$r) AS checksum""".stripMargin
      s"""WITH $coSupplyCtes,
         |${lpaChainCtes(LpaRounds)}
         |${(1 to LpaRounds).map(statSelect).mkString("\nUNION ALL\n")}""".stripMargin
    },
    // forward-filled state over the (ts, event_id)-ordered per-user
    // stream; facts (view/click) roll up under the state valid at
    // their timestamp — the window-form PIT join
    "q190_pit_enrichment" -> pitPanelOracle,
    // the streaming twin must land on the IDENTICAL panel — one oracle
    // definition for both forms, so they cannot drift
    "q195_stream_pit_parity" -> pitPanelOracle,
    // contingency cells with ppm shares and phi^2 contributions —
    // HUGEINT mirrors of the DECIMAL(38) Spark exprs
    "q191_priority_drift" ->
      """WITH cells AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT yr, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
        |c AS (SELECT priority, CAST(SUM(o) AS BIGINT) AS col_tot
        |  FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM cells),
        |j AS (SELECT cells.yr, cells.priority, cells.o, r.row_tot, c.col_tot,
        |    CAST(CAST(cells.o AS HUGEINT) * 1000000 // n_tot AS BIGINT) AS obs_ppm,
        |    CAST(CAST(r.row_tot AS HUGEINT) * c.col_tot * 1000000
        |      // (CAST(t.n_tot AS HUGEINT) * t.n_tot) AS BIGINT) AS exp_ppm
        |  FROM cells JOIN r USING (yr) JOIN c USING (priority), t)
        |SELECT yr, priority, o, row_tot, col_tot, obs_ppm, exp_ppm,
        |  (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
        |    // greatest(exp_ppm, 1) AS phi2_cell_ppm
        |FROM j""".stripMargin,
    // histogram-form deciles: cumulative counts over the day-bounded
    // (priority x days) relation; decile k = min days with cum >= pos
    "q192_fulfillment_deciles" ->
      """WITH po AS (SELECT l_orderkey,
        |    MAX(CAST(epoch(l_shipdate) AS BIGINT) // 86400) AS ship_day
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT o.o_orderpriority AS priority,
        |    po.ship_day - CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS days
        |  FROM orders o JOIN po ON o.o_orderkey = po.l_orderkey),
        |h AS (SELECT priority, days, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM d GROUP BY 1, 2),
        |cw AS MATERIALIZED (SELECT *,
        |    SUM(cnt) OVER (PARTITION BY priority ORDER BY days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY priority) AS n FROM h),
        |pn AS (SELECT DISTINCT priority, n FROM cw),
        |pos AS (SELECT priority, CAST(k.k AS BIGINT) AS decile,
        |    (n - 1) * k.k // 10 + 1 AS pos
        |  FROM pn, range(1, 10) k(k))
        |SELECT cw.priority, pos.decile, CAST(MIN(cw.days) AS BIGINT) AS days
        |FROM cw JOIN pos ON cw.priority = pos.priority AND cw.cum >= pos.pos
        |GROUP BY 1, 2""".stripMargin,
    // decorrelated Q17: qty·5·n < sum in cents — the exact-integer
    // form of qty < 0.2·avg
    "q193_below_avg_parts" ->
      s"""WITH li AS (SELECT l_partkey, ${cents("l_quantity")} AS qty_c,
         |    ${cents("l_extendedprice")} AS price_c FROM lineitem),
         |st AS (SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
         |    CAST(COUNT(*) AS BIGINT) AS n_li FROM li GROUP BY 1)
         |SELECT CAST(SUM(price_c) AS BIGINT) AS below_revenue_c,
         |  CAST(COUNT(*) AS BIGINT) AS n_small_lots,
         |  CAST(COUNT(DISTINCT li.l_partkey) AS BIGINT) AS n_parts
         |FROM li JOIN st ON li.l_partkey = st.l_partkey
         |WHERE li.qty_c * 5 * st.n_li < st.sum_qty_c""".stripMargin,
    // modularity panel over the shared LPA chain's final labels:
    // e_in/d_tot per label + the exact-ppm Q cell
    "q194_community_modularity" -> {
      import graft.operators.GraphOps.LpaRounds
      s"""WITH $coSupplyCtes,
         |${lpaChainCtes(LpaRounds)},
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
         |ein AS (SELECT la.label AS label, CAST(COUNT(*) AS BIGINT) AS e_in
         |  FROM edges e JOIN lbl_$LpaRounds la ON e.a = la.s
         |  JOIN lbl_$LpaRounds lb ON e.b = lb.s
         |  WHERE la.label = lb.label GROUP BY 1),
         |dt AS (SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS d_tot,
         |    CAST(COUNT(*) AS BIGINT) AS n_nodes
         |  FROM (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |      SELECT a AS s FROM edges UNION ALL SELECT b AS s FROM edges) t
         |    GROUP BY 1) d
         |  JOIN lbl_$LpaRounds l ON d.s = l.s GROUP BY 1)
         |SELECT dt.label, dt.n_nodes, COALESCE(ein.e_in, 0) AS e_in, dt.d_tot,
         |  CAST(CAST(COALESCE(ein.e_in, 0) AS HUGEINT) * 1000000 // m.m AS BIGINT)
         |    - CAST(CAST(dt.d_tot AS HUGEINT) * dt.d_tot * 1000000
         |        // (CAST(m.m AS HUGEINT) * m.m * 4) AS BIGINT) AS q_cell_ppm
         |FROM dt LEFT JOIN ein USING (label), m""".stripMargin
    },
    // two salted md5-bucket membership bits aggregated in one pass;
    // HUGEINT mirrors of the DECIMAL(38) ppm algebra
    "q196_epoch_overlap" -> {
      val rate = graft.operators.Sampling.EpochRatePpm
      val buckets = graft.operators.Sampling.Buckets
      def member(salt: String) =
        s"""CASE WHEN CAST(concat('0x', substr(md5(
           |      concat(CAST(doc_id AS VARCHAR), '$salt')), 1, 8)) AS BIGINT)
           |    % $buckets < $rate THEN 1 ELSE 0 END""".stripMargin
      s"""WITH b AS (SELECT ${member("#e1")} AS m1, ${member("#e2")} AS m2
         |  FROM documents),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(m1) AS BIGINT) AS n1, CAST(SUM(m2) AS BIGINT) AS n2,
         |    CAST(SUM(m1 * m2) AS BIGINT) AS n12 FROM b)
         |SELECT n, n1, n2, n12,
         |  CAST(CAST(n12 AS HUGEINT) * 1000000 // n AS BIGINT) AS obs_ppm,
         |  CAST((CAST(n1 AS HUGEINT) * 1000000 // n) *
         |    (CAST(n2 AS HUGEINT) * 1000000 // n) // 1000000 AS BIGINT) AS exp_ppm,
         |  CAST(CAST(n12 AS HUGEINT) * 1000000 // n AS BIGINT)
         |    - CAST((CAST(n1 AS HUGEINT) * 1000000 // n) *
         |        (CAST(n2 AS HUGEINT) * 1000000 // n) // 1000000 AS BIGINT)
         |    AS dev_ppm
         |FROM a""".stripMargin
    },
    // per-pair union top-k + matched-fraction estimate; exact pair
    // intersections via the bounded source-set explosion
    "q197_kmv_intersections" -> {
      val k = graft.operators.Sketches.kmvKFor(
        graft.operators.Sketches.KmvTargetRelErr)
      s"""WITH $shingleCte,
         |h AS (SELECT DISTINCT source,
         |    CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS hv FROM sh),
         |ex AS (SELECT e.a AS src_a, e.b AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS exact_inter
         |  FROM (SELECT unnest(flatten(list_transform(
         |        generate_series(1, len(ss) - 1), i ->
         |      list_transform(generate_series(i + 1, len(ss)), j ->
         |        struct_pack(a := ss[i], b := ss[j]))))) AS e
         |    FROM (SELECT hv, list_sort(list(DISTINCT source)) AS ss
         |          FROM h GROUP BY 1) t
         |    WHERE len(ss) >= 2) p
         |  GROUP BY 1, 2),
         |kept AS MATERIALIZED (SELECT source, hv FROM (
         |    SELECT source, hv, ROW_NUMBER() OVER (
         |      PARTITION BY source ORDER BY hv ASC) AS rn FROM h) t
         |  WHERE rn <= $k),
         |srcs AS (SELECT DISTINCT source FROM h),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b
         |  FROM srcs a, srcs b WHERE a.source < b.source),
         |u AS (SELECT src_a, src_b, hv, CAST(COUNT(*) AS BIGINT) AS n_side
         |  FROM (
         |    SELECT pr.src_a, pr.src_b, kept.hv
         |      FROM kept JOIN pr ON kept.source = pr.src_a
         |    UNION ALL
         |    SELECT pr.src_a, pr.src_b, kept.hv
         |      FROM kept JOIN pr ON kept.source = pr.src_b) t
         |  GROUP BY 1, 2, 3),
         |sk AS (SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
         |      ORDER BY hv ASC) AS rn FROM u) t
         |  WHERE rn <= $k),
         |agg AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    MAX(hv) AS h_k,
         |    CAST(SUM(CASE WHEN n_side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM sk GROUP BY 1, 2)
         |SELECT agg.src_a, agg.src_b, CAST($k AS BIGINT) AS k,
         |  agg.n_kept, agg.h_k, agg.c,
         |  CAST(CASE WHEN agg.n_kept < $k THEN agg.c
         |    ELSE CAST(agg.c AS HUGEINT) * ${k - 1} * 4294967296
         |      // (CAST($k AS HUGEINT) * greatest(agg.h_k, 1)) END AS BIGINT)
         |    AS est_inter,
         |  COALESCE(ex.exact_inter, 0) AS exact_inter,
         |  abs(CAST(CASE WHEN agg.n_kept < $k THEN agg.c
         |      ELSE CAST(agg.c AS HUGEINT) * ${k - 1} * 4294967296
         |        // (CAST($k AS HUGEINT) * greatest(agg.h_k, 1)) END AS BIGINT)
         |    - COALESCE(ex.exact_inter, 0)) * 1000000
         |    // greatest(COALESCE(ex.exact_inter, 0), 1) AS err_ppm
         |FROM agg LEFT JOIN ex USING (src_a, src_b)""".stripMargin
    },
    // q134's histogram rebuild + capped (mclass, size-bucket) pair
    // join with a 16-term L1 — mirrors the zip_with/aggregate exactly
    "q198_media_neardup" -> {
      val thr = graft.multimodal.Multimodal.MediaDupL1Ppm
      val cap = graft.multimodal.Multimodal.MediaBucketCap
      val bins = (0 until 16).map { i =>
        val c = f"$i%X"
        s"""CAST(SUM(CASE WHEN substr(hx, (i-1)*2+1, 1) = '$c' THEN 1 ELSE 0 END)
           |    * 1000000 // MAX(n) AS BIGINT) AS h${f"$i%02d"}""".stripMargin
      }.mkString(",\n")
      val l1 = (0 until 16)
        .map(i => f"abs(x.h$i%02d - y.h$i%02d)").mkString(" + ")
      s"""WITH $mediaBlobCtes,
         |hb AS (SELECT doc_id, m, hex(c) AS hx, octet_length(c) AS n FROM blob),
         |nib AS (SELECT doc_id, m, n, hx,
         |  unnest(generate_series(1, n)) AS i FROM hb),
         |feat AS (SELECT doc_id, CAST(MAX(m) AS BIGINT) AS mclass,
         |  CAST(MAX(n) AS BIGINT) // 64 AS sb,
         |$bins
         |FROM nib GROUP BY doc_id),
         |capped AS MATERIALIZED (SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY mclass, sb
         |      ORDER BY doc_id ASC) AS rn FROM feat) t
         |  WHERE rn <= $cap)
         |SELECT x.doc_id AS media_a, y.doc_id AS media_b, x.mclass,
         |  CAST($l1 AS BIGINT) AS l1_ppm
         |FROM capped x JOIN capped y
         |  ON x.mclass = y.mclass AND x.sb = y.sb AND x.doc_id < y.doc_id
         |WHERE $l1 <= $thr""".stripMargin
    },
    // base∪changes keyed window (version DESC, delete DESC), survivor
    // tombstones erase keys; panel certified vs the anti-join build
    "q199_cdc_merge" -> {
      import graft.operators.Incremental.{CdcUpdateMod, CdcDeleteMod}
      s"""WITH base AS (SELECT o_orderkey AS k, ${cents("o_totalprice")} AS v_c,
         |    1 AS version, 0 AS is_delete FROM orders),
         |changes AS (SELECT o_orderkey AS k,
         |    ${cents("o_totalprice * 1.1")} AS v_c, 2 AS version,
         |    CASE WHEN o_orderkey % $CdcDeleteMod = 0 THEN 1 ELSE 0 END AS is_delete
         |  FROM orders
         |  WHERE o_orderkey % $CdcUpdateMod = 0 OR o_orderkey % $CdcDeleteMod = 0),
         |u AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
         |merged AS (SELECT k, v_c FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k
         |      ORDER BY version DESC, is_delete DESC) AS rn FROM u) t
         |  WHERE rn = 1 AND is_delete = 0),
         |direct AS (
         |  SELECT k, v_c FROM base
         |  WHERE k NOT IN (SELECT k FROM changes)
         |  UNION ALL
         |  SELECT k, v_c FROM changes WHERE is_delete = 0),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_merged,
         |    CAST(bit_xor(k * 1000000000 + v_c) AS BIGINT) AS xsum_merged
         |  FROM merged),
         |d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_direct,
         |    CAST(bit_xor(k * 1000000000 + v_c) AS BIGINT) AS xsum_direct
         |  FROM direct),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         |    CAST(SUM(CASE WHEN version = 2 AND is_delete = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_updates,
         |    CAST(SUM(CASE WHEN is_delete = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_deletes
         |  FROM u)
         |SELECT a.n_base, a.n_updates, a.n_deletes, m.n_merged, m.xsum_merged,
         |  (m.n_merged = d.n_direct AND m.xsum_merged = d.xsum_direct)
         |    AS matches_direct
         |FROM a, m, d""".stripMargin
    },
    // trailing 7-row window on the daily relation; squares compared so
    // sigma never materializes; HUGEINT mirrors the DECIMAL widening
    "q200_band_breach" -> {
      import graft.operators.StatsAudit.{BandWindowDays, BandK}
      s"""WITH daily AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
         |    ${sumc("o_totalprice")} AS x_c
         |  FROM orders GROUP BY 1),
         |r AS (SELECT day, x_c,
         |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         |    CAST(COUNT(*) OVER w AS BIGINT) AS n_w,
         |    SUM(x_c) OVER w AS s_w,
         |    SUM(CAST(x_c AS HUGEINT) * x_c) OVER w AS q_w
         |  FROM daily
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN ${BandWindowDays - 1} PRECEDING AND CURRENT ROW)),
         |z AS (SELECT t, day, x_c,
         |    CAST(x_c AS HUGEINT) * n_w - s_w AS num,
         |    CAST(n_w AS HUGEINT) * q_w - CAST(s_w AS HUGEINT) * s_w AS den
         |  FROM r)
         |SELECT t, day, x_c,
         |  CASE WHEN den = 0 THEN NULL
         |    ELSE CAST(num * num * 1000000 // den AS BIGINT) END AS z2_ppm,
         |  CASE WHEN den = 0 THEN false
         |    ELSE CAST(num * num * 1000000 // den AS BIGINT)
         |      > ${BandK * BandK * 1000000L} END AS breach
         |FROM z""".stripMargin
    },
    // pooled theta/rho^2 via the q185 normal-equation algebra; per-
    // variant raw and adjusted means as exact nested divisions
    "q201_cuped_adjust" ->
      s"""WITH $abUsersCte,
         |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         |    CAST(SUM(x_c) AS BIGINT) AS sx, CAST(SUM(y_c) AS BIGINT) AS sy,
         |    SUM(CAST(x_c AS HUGEINT) * x_c) AS sxx,
         |    SUM(CAST(x_c AS HUGEINT) * y_c) AS sxy,
         |    SUM(CAST(y_c AS HUGEINT) * y_c) AS syy
         |  FROM au),
         |d AS (SELECT *,
         |    CAST(n_all AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    CAST(n_all AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
         |    CAST(n_all AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
         |  FROM p),
         |t AS (SELECT n_all, sx,
         |    CASE WHEN den_x = 0 THEN 0
         |      ELSE CAST(num * 1000000 // den_x AS BIGINT) END AS theta_ppm,
         |    CASE WHEN den_x = 0 OR den_y = 0 THEN 0
         |      ELSE CAST(((num * 1000000 // den_x) * num) // den_y AS BIGINT)
         |      END AS rho2_ppm
         |  FROM d),
         |v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(x_c) AS BIGINT) AS sx_v, CAST(SUM(y_c) AS BIGINT) AS sy_v
         |  FROM au GROUP BY 1)
         |SELECT v.variant, v.n_users,
         |  CAST(CAST(sy_v AS HUGEINT) * 1000000 // n_users AS BIGINT) AS y_mean_ppm,
         |  CAST(CAST(sy_v AS HUGEINT) * 1000000 // n_users AS BIGINT) -
         |    theta_ppm * (CAST(CAST(sx_v AS HUGEINT) * 1000000 // n_users AS BIGINT) -
         |    CAST(CAST(sx AS HUGEINT) * 1000000 // n_all AS BIGINT)) // 1000000
         |    AS adj_mean_ppm,
         |  t.theta_ppm, t.rho2_ppm
         |FROM v, t""".stripMargin,
    // pooled two-proportion z^2 identity in exact ppm
    "q202_ab_proportion" -> {
      val crit = graft.operators.StatsAudit.Chi2Crit05Ppm
      s"""WITH $abUsersCte,
         |bv AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_v,
         |    CAST(SUM(converted) AS BIGINT) AS c_v FROM au GROUP BY 1),
         |j AS (SELECT
         |    (SELECT n_v FROM bv WHERE variant = 'A') AS n1,
         |    (SELECT c_v FROM bv WHERE variant = 'A') AS c1,
         |    (SELECT n_v FROM bv WHERE variant = 'B') AS n2,
         |    (SELECT c_v FROM bv WHERE variant = 'B') AS c2),
         |z AS (SELECT *, n1 + n2 AS n, c1 + c2 AS c,
         |    CASE WHEN c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN NULL ELSE CAST(
         |      (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
         |      (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
         |      (n1 + n2) * 1000000 // (CAST(n1 AS HUGEINT) * n2 *
         |        (c1 + c2) * (n1 + n2 - c1 - c2)) AS BIGINT) END AS z2_ppm
         |  FROM j)
         |SELECT n1, c1, n2, c2,
         |  c1 * 1000000 // n1 AS p1_ppm, c2 * 1000000 // n2 AS p2_ppm,
         |  z2_ppm,
         |  CASE WHEN z2_ppm IS NULL THEN false
         |    ELSE z2_ppm > $crit END AS significant
         |FROM z""".stripMargin
    },
    // hash-derived Poisson(1) weights against the shared CDF ppm
    // thresholds; 32 resample means over the day relation
    "q203_bootstrap_means" -> {
      val wCase = graft.operators.StatsAudit.PoissonCdfPpm.zipWithIndex.reverse
        .foldLeft("9") { case (acc, (thr, k)) =>
          s"CASE WHEN u < $thr THEN $k ELSE $acc END"
        }
      s"""WITH daily AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
         |    ${sumc("o_totalprice")} AS x_c
         |  FROM orders GROUP BY 1),
         |e AS (SELECT day, x_c, CAST(t.b AS BIGINT) AS b
         |  FROM daily, range(0, ${graft.operators.StatsAudit.BootstrapB}) t(b)),
         |h AS (SELECT day, x_c, b,
         |    CAST(concat('0x', substr(md5(concat(CAST(day AS VARCHAR), '#bs',
         |      CAST(b AS VARCHAR))), 1, 8)) AS BIGINT) % 1000000 AS u
         |  FROM e),
         |w AS (SELECT day, x_c, b, CAST(($wCase) AS BIGINT) AS w FROM h)
         |SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
         |  CASE WHEN SUM(w) = 0 THEN NULL
         |    ELSE CAST(CAST(SUM(w * x_c) AS HUGEINT) // SUM(w) AS BIGINT)
         |    END AS mean_c
         |FROM w GROUP BY 1""".stripMargin
    },
    // weighted rank on the (n_chars -> count) histogram; pos rule on
    // the mass total, HUGEINT widened
    "q204_mass_deciles" ->
      """WITH h AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1),
        |c AS (SELECT n_chars, CAST(n_chars AS HUGEINT) * cnt AS w FROM h),
        |r AS (SELECT n_chars,
        |    SUM(w) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |    SUM(w) OVER () AS tot_w
        |  FROM c),
        |pos AS (SELECT CAST(t.k AS BIGINT) AS decile,
        |    (MAX(tot_w) OVER () - 1) * t.k // 10 + 1 AS pos, tot_w
        |  FROM (SELECT DISTINCT tot_w FROM r) x, range(1, 10) t(k))
        |SELECT pos.decile, CAST(MIN(r.n_chars) AS BIGINT) AS n_chars,
        |  CAST(MAX(pos.tot_w) AS BIGINT) AS total_mass
        |FROM r JOIN pos ON r.cum_w >= pos.pos
        |GROUP BY 1""".stripMargin,
    // window replay of the bounded-heap contract: rev DESC, custkey ASC
    "q205_top_customers" ->
      s"""WITH pc AS (SELECT o.o_custkey, c.c_nationkey,
         |    ${sumc("o.o_totalprice")} AS rev_c
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2)
         |SELECT c_nationkey, CAST(rn AS BIGINT) AS rank,
         |  o_custkey AS custkey, rev_c
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
         |    ORDER BY rev_c DESC, o_custkey ASC) AS rn FROM pc) t
         |WHERE rn <= 3""".stripMargin,
    // numeric sort BEFORE stringify — both engines agree on "9,10"
    "q206_order_manifest" ->
      """SELECT l_orderkey,
        |  CAST(len(list_sort(list(DISTINCT l_partkey))) AS BIGINT) AS n_parts,
        |  array_to_string(list_transform(list_sort(list(DISTINCT l_partkey)),
        |    x -> CAST(x AS VARCHAR)), ',') AS manifest
        |FROM lineitem GROUP BY 1""".stripMargin,
    // fixed-hop BFS unrolled as chained CTEs over the shared co-supply
    // graph; frontier = new distinct neighbors minus the reached set
    "q207_bfs_reach" -> {
      import graft.operators.GraphOps.{BfsHops, BfsSeeds}
      def hopCtes(h: Int): String =
        s"""f_$h AS MATERIALIZED (SELECT DISTINCT adj.nb AS s
           |  FROM adj JOIN f_${h - 1} f ON adj.s = f.s
           |  WHERE adj.nb NOT IN (SELECT s FROM r_${h - 1})),
           |r_$h AS MATERIALIZED (SELECT s FROM r_${h - 1}
           |  UNION SELECT s FROM f_$h)""".stripMargin
      def statSelect(h: Int): String =
        s"""SELECT CAST($h AS BIGINT) AS round,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f_$h) AS n_frontier,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM r_$h) AS n_reached,
           |  (SELECT CAST(BIT_XOR(s) AS BIGINT) FROM f_$h) AS frontier_xor"""
          .stripMargin
      val hs = 1 to BfsHops
      s"""WITH $coSupplyCtes,
         |adj AS MATERIALIZED (SELECT a AS s, b AS nb FROM edges
         |  UNION ALL SELECT b AS s, a AS nb FROM edges),
         |f_0 AS MATERIALIZED (SELECT DISTINCT s FROM adj ORDER BY s LIMIT $BfsSeeds),
         |r_0 AS MATERIALIZED (SELECT s FROM f_0),
         |${hs.map(hopCtes).mkString(",\n")}
         |${(0 +: hs).map(statSelect).mkString("\nUNION ALL\n")}""".stripMargin
    },
    // df on the SAME 60-bit shingle hash the Spark side keys on; ppm
    // floor-div over the per-doc distinct-shingle count
    "q208_boilerplate_density" -> {
      val minDf = graft.operators.TextOps.BoilerMinDf
      s"""WITH $shingleCte,
         |hsh AS (SELECT doc_id, n_sh, $shashSql AS shash FROM sh),
         |dfreq AS MATERIALIZED (SELECT shash, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM hsh GROUP BY 1)
         |SELECT doc_id, n_sh,
         |  CAST(SUM(CASE WHEN df >= $minDf THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boiler,
         |  CAST(SUM(CASE WHEN df >= $minDf THEN 1 ELSE 0 END) * 1000000
         |    // n_sh AS BIGINT) AS boiler_ppm
         |FROM hsh JOIN dfreq USING (shash)
         |GROUP BY 1, 2""".stripMargin
    },
    // same md5-derived trailing-zero geometric draw; DuckDB spells
    // bitwise xor as xor() (its ^ is POWER)
    "q209_dp_noisy_counts" -> {
      import graft.quality.PrivacyAudit.{DpNoiseBits, DpSalt}
      val m = 1L << DpNoiseBits
      s"""WITH g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_true
         |  FROM documents GROUP BY 1, 2),
         |h AS (SELECT source, lang, n_true,
         |  CAST(concat('0x', substr(md5('$DpSalt:' || source || ':' || lang),
         |    1, 12)) AS BIGINT) AS fp FROM g),
         |t AS (SELECT source, lang, n_true,
         |  CASE WHEN fp % $m = 0 THEN $DpNoiseBits
         |    ELSE CAST(bit_count(xor(fp % $m, fp % $m - 1)) AS BIGINT) - 1
         |    END AS tz,
         |  (fp // $m) % 2 AS sgn FROM h),
         |n AS (SELECT source, lang, n_true,
         |  CASE WHEN sgn = 1 THEN tz ELSE -tz END AS noise FROM t)
         |SELECT source, lang, n_true, noise,
         |  CAST(GREATEST(0, n_true + noise) AS BIGINT) AS noisy_n
         |FROM n""".stripMargin
    },
    // the same constant-bounded window expansion of the (user, day)
    // grid, replayed with a range() lateral
    "q210_rolling_actives" -> {
      val w = graft.operators.EventsOps.ActiveWindowDays
      s"""WITH grid AS (SELECT DISTINCT user_id,
         |    epoch_ns(ts) // 86400000000000 AS day FROM events),
         |mx AS (SELECT MAX(day) AS max_day FROM grid),
         |ex AS (SELECT DISTINCT user_id, day + k AS day
         |  FROM grid, range(0, $w) t(k), mx WHERE day + k <= max_day),
         |w7 AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active_7d
         |  FROM ex GROUP BY 1),
         |d1 AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active_1d
         |  FROM grid GROUP BY 1)
         |SELECT w7.day, w7.n_active_7d,
         |  CAST(COALESCE(d1.n_active_1d, 0) AS BIGINT) AS n_active_1d
         |FROM w7 LEFT JOIN d1 USING (day)""".stripMargin
    },
    // same island key (day - row_number) over the deduped grid
    "q211_day_streaks" ->
      """WITH grid AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day FROM events),
        |s AS (SELECT user_id, day - ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY day) AS isl FROM grid),
        |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_len
        |  FROM s GROUP BY user_id, isl)
        |SELECT streak_len, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM st GROUP BY 1""".stripMargin,
    // the oracle PREDICTS the merged read from the source table: v1 =
    // even keys (priority, no year), v2 = odd keys (year, no priority)
    "q212_schema_evolution" ->
      s"""WITH o AS (SELECT o_orderkey AS id,
         |    ${cents("o_totalprice")} AS price_c,
         |    CAST(year(o_orderdate) AS BIGINT) AS y FROM orders)
         |SELECT CAST(1 AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_price,
         |  CAST(COUNT(*) AS BIGINT) AS n_priority,
         |  CAST(0 AS BIGINT) AS n_year,
         |  CAST(SUM(price_c) AS BIGINT) AS price_sum_c,
         |  CAST(0 AS BIGINT) AS year_sum
         |FROM o WHERE id % 2 = 0
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
         |  CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(COUNT(*) AS BIGINT), CAST(SUM(price_c) AS BIGINT),
         |  CAST(SUM(y) AS BIGINT)
         |FROM o WHERE id % 2 = 1""".stripMargin,
    // each constraint measured in the same one-pass aggregate shape
    "q213_contract_audit" ->
      """WITH o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ok_unique,
        |    CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ok_complete,
        |    CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_pattern,
        |    CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_domain
        |  FROM orders),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_qty,
        |    CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_disc,
        |    CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_flag,
        |    CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ok_ship
        |  FROM lineitem)
        |SELECT 'c1_orderkey_unique' AS constraint_id, 'orders' AS tbl,
        |  'o_orderkey' AS col_name, 'unique' AS kind, n AS n_rows,
        |  ok_unique AS n_ok, CAST(ok_unique * 1000000 // n AS BIGINT) AS ok_ppm,
        |  ok_unique = n AS pass FROM o
        |UNION ALL SELECT 'c2_custkey_complete', 'orders', 'o_custkey',
        |  'complete', n, ok_complete,
        |  CAST(ok_complete * 1000000 // n AS BIGINT), ok_complete = n FROM o
        |UNION ALL SELECT 'c3_priority_pattern', 'orders', 'o_orderpriority',
        |  'pattern', n, ok_pattern,
        |  CAST(ok_pattern * 1000000 // n AS BIGINT), ok_pattern = n FROM o
        |UNION ALL SELECT 'c4_status_domain', 'orders', 'o_orderstatus',
        |  'domain', n, ok_domain,
        |  CAST(ok_domain * 1000000 // n AS BIGINT), ok_domain = n FROM o
        |UNION ALL SELECT 'c5_quantity_range', 'lineitem', 'l_quantity',
        |  'range', n, ok_qty,
        |  CAST(ok_qty * 1000000 // n AS BIGINT), ok_qty = n FROM l
        |UNION ALL SELECT 'c6_discount_range', 'lineitem', 'l_discount',
        |  'range', n, ok_disc,
        |  CAST(ok_disc * 1000000 // n AS BIGINT), ok_disc = n FROM l
        |UNION ALL SELECT 'c7_returnflag_domain', 'lineitem', 'l_returnflag',
        |  'domain', n, ok_flag,
        |  CAST(ok_flag * 1000000 // n AS BIGINT), ok_flag = n FROM l
        |UNION ALL SELECT 'c8_shipdate_complete', 'lineitem', 'l_shipdate',
        |  'complete', n, ok_ship,
        |  CAST(ok_ship * 1000000 // n AS BIGINT), ok_ship = n FROM l"""
        .stripMargin,
    // per-day min-k sketches, window merge by re-taking min-k of the
    // union, estimate vs the exact q210 panel at the 3-sigma bound
    "q214_kmv_rolling" -> {
      import graft.operators.EventsOps.ActiveWindowDays
      import graft.operators.Sketches.{KmvRollBoundPpm, KmvRollK}
      s"""WITH grid AS (SELECT DISTINCT user_id,
         |    epoch_ns(ts) // 86400000000000 AS day FROM events),
         |mx AS (SELECT MAX(day) AS max_day FROM grid),
         |hv AS (SELECT DISTINCT day,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) AS hv FROM grid),
         |ds AS (SELECT day, hv FROM (SELECT day, hv,
         |    ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv ASC) AS rn
         |  FROM hv) t WHERE rn <= $KmvRollK),
         |wx AS (SELECT DISTINCT day + kk AS day, hv
         |  FROM ds, range(0, $ActiveWindowDays) t(kk), mx
         |  WHERE day + kk <= max_day),
         |ws AS (SELECT day, hv, ROW_NUMBER() OVER (
         |    PARTITION BY day ORDER BY hv ASC) AS rn FROM wx),
         |sk AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    CAST(MAX(hv) AS BIGINT) AS h_k
         |  FROM ws WHERE rn <= $KmvRollK GROUP BY 1),
         |e1 AS (SELECT DISTINCT user_id, day + kk AS day
         |  FROM grid, range(0, $ActiveWindowDays) t(kk), mx
         |  WHERE day + kk <= max_day),
         |ex AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_exact_7d
         |  FROM e1 GROUP BY 1),
         |est AS (SELECT sk.day, ex.n_exact_7d, sk.n_kept, sk.h_k,
         |    CAST(CASE WHEN sk.n_kept < $KmvRollK THEN sk.n_kept
         |      ELSE (sk.n_kept - 1) * 4294967296 // greatest(sk.h_k, 1)
         |      END AS BIGINT) AS est_7d
         |  FROM sk JOIN ex ON sk.day = ex.day)
         |SELECT day, n_exact_7d, n_kept, h_k, est_7d,
         |  CAST(abs(est_7d - n_exact_7d) * 1000000 // n_exact_7d AS BIGINT)
         |    AS err_ppm,
         |  (abs(est_7d - n_exact_7d) * 1000000 // n_exact_7d)
         |    <= $KmvRollBoundPpm AS kmv_ok
         |FROM est""".stripMargin
    },
    // per-dow doubled median + doubled MAD replayed with the same
    // row_number positions; flag law 2*dev2 > K*mad4
    "q215_seasonal_residuals" -> {
      val k = graft.operators.StatsAudit.SeasonalMadK
      s"""WITH daily AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400
         |      AS day, ${sumc("o_totalprice")} AS x_c
         |  FROM orders GROUP BY 1),
         |d AS (SELECT day, x_c, (day + 3) % 7 AS dow FROM daily),
         |m1 AS (SELECT day, x_c, dow,
         |    ROW_NUMBER() OVER (PARTITION BY dow ORDER BY x_c, day) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS n FROM d),
         |med AS (SELECT dow,
         |    CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN x_c END) +
         |      MIN(CASE WHEN rn = (n + 2) // 2 THEN x_c END) AS BIGINT)
         |      AS med2_c
         |  FROM m1 GROUP BY 1),
         |dev AS (SELECT d.day, d.x_c, d.dow, med.med2_c,
         |    abs(d.x_c * 2 - med.med2_c) AS dev2_c
         |  FROM d JOIN med USING (dow)),
         |m2 AS (SELECT dow, dev2_c,
         |    ROW_NUMBER() OVER (PARTITION BY dow ORDER BY dev2_c, day) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS n FROM dev),
         |mad AS (SELECT dow,
         |    CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN dev2_c END) +
         |      MIN(CASE WHEN rn = (n + 2) // 2 THEN dev2_c END) AS BIGINT)
         |      AS mad4_c
         |  FROM m2 GROUP BY 1)
         |SELECT dev.day, dev.dow, dev.x_c, dev.med2_c,
         |  CAST(dev.x_c * 2 - dev.med2_c AS BIGINT) AS resid2_c,
         |  dev.dev2_c * 2 > $k * mad.mad4_c AS is_outlier
         |FROM dev JOIN mad USING (dow)""".stripMargin
    },
    // the oracle predicts the POST-compaction filesystem: shard rule
    // for files_before, ceil-div law for target AND files_after, and
    // the content checksum the rewrite must preserve
    "q216_compaction_exec" -> {
      import graft.lake.Compaction.{RowsPerFileTarget, SmallFileShards}
      val target =
        s"greatest(1, (COUNT(*) + $RowsPerFileTarget - 1) // $RowsPerFileTarget)"
      s"""WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         |    o_orderkey,
         |    CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
         |      AS BIGINT) % $SmallFileShards AS shard
         |  FROM orders)
         |SELECT year,
         |  CAST(COUNT(DISTINCT shard) AS BIGINT) AS files_before,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST($target AS BIGINT) AS target_files,
         |  CAST($target AS BIGINT) AS files_after,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows_after,
         |  CAST(BIT_XOR(o_orderkey) AS BIGINT) AS id_xor
         |FROM o GROUP BY 1""".stripMargin
    },
    // window replay of the bounded-heap law (qty DESC, partkey ASC),
    // then the same calendar-shift self-join with -1 sentinels
    "q217_topk_drift" -> {
      val k = graft.operators.Relational.TrendK
      s"""WITH pw AS (SELECT CAST(epoch(l_shipdate) AS BIGINT) // 604800
         |      AS week, l_partkey,
         |    ${sumc("l_quantity")} AS qty_c
         |  FROM lineitem GROUP BY 1, 2),
         |tp AS (SELECT week, CAST(rn AS BIGINT) AS rank,
         |    l_partkey AS partkey, qty_c
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY week
         |      ORDER BY qty_c DESC, l_partkey ASC) AS rn FROM pw) t
         |  WHERE rn <= $k)
         |SELECT tp.week, tp.rank, tp.partkey, tp.qty_c,
         |  CAST(COALESCE(pv.rank, -1) AS BIGINT) AS prev_rank,
         |  CAST(CASE WHEN pv.rank IS NULL THEN 0
         |    ELSE pv.rank - tp.rank END AS BIGINT) AS delta
         |FROM tp LEFT JOIN tp pv
         |  ON pv.week + 1 = tp.week AND pv.partkey = tp.partkey"""
        .stripMargin
    },
    // the oracle aggregates the parquet table it never exported, with
    // the same hazard suffix injected (chr() spells quote + newline)
    "q218_csv_roundtrip" ->
      """WITH h AS (SELECT doc_id, source, lang,
        |    text || ' x,' || chr(34) || 'y' || chr(10) || 'z' AS text
        |  FROM documents)
        |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(length(text)) AS BIGINT) AS len_sum,
        |  CAST(BIT_XOR(CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT))
        |    AS BIGINT) AS text_fp_xor
        |FROM h GROUP BY 1, 2""".stripMargin,
    // the q110 session chain, then boundary deltas + one ordered
    // prefix sum over the hour relation
    "q219_concurrency_curve" -> {
      val hourNs = graft.operators.AsOf.CurveHourNs
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
         |l AS (SELECT *, lag(ts_ns) OVER
         |        (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev_ns FROM e),
         |b AS (SELECT *, CASE WHEN prev_ns IS NULL
         |        OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT *, SUM(brk) OVER (
         |        PARTITION BY user_id ORDER BY ts_ns, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM b),
         |iv AS (SELECT user_id, session_id, MIN(ts_ns) AS s_start,
         |         MAX(ts_ns) AS s_end FROM s GROUP BY 1, 2),
         |d AS (SELECT s_start // $hourNs AS hour, 1 AS d FROM iv
         |      UNION ALL SELECT s_end // $hourNs + 1, -1 FROM iv),
         |g AS (SELECT hour, CAST(SUM(d) AS BIGINT) AS delta FROM d GROUP BY 1)
         |SELECT hour, delta,
         |  CAST(SUM(delta) OVER (ORDER BY hour
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS open_sessions
         |FROM g""".stripMargin
    },
    // floor-log2 via length(bin(n)) - 1 on both engines; q185 algebra
    "q220_zipf_fit" ->
      s"""WITH f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT unnest($toks) AS token FROM documents) t
         |  WHERE token <> '' GROUP BY 1),
         |r AS (SELECT length(bin(CAST(ROW_NUMBER() OVER (
         |      ORDER BY n DESC, token ASC) AS BIGINT))) - 1 AS x,
         |    length(bin(n)) - 1 AS y FROM f),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pts,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM r),
         |k AS (SELECT *,
         |    CAST(n_pts AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    CAST(n_pts AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
         |    CAST(n_pts AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
         |  FROM s)
         |SELECT n_pts,
         |  CASE WHEN den_x = 0 THEN NULL
         |    ELSE CAST(num * 1000000 // den_x AS BIGINT) END AS slope_ppm,
         |  CASE WHEN den_x = 0 THEN NULL
         |    ELSE CAST((CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy)
         |      * 1000000 // den_x AS BIGINT) END AS intercept_ppm,
         |  CASE WHEN den_x = 0 OR den_y = 0 THEN NULL
         |    ELSE CAST(((num * 1000000 // den_x) * num) // den_y AS BIGINT)
         |    END AS r2_ppm
         |FROM k""".stripMargin,
    // per-source panel; dup mass via the q35 fingerprint law within
    // the source block
    "q221_dataset_card" -> {
      val short = graft.operators.CorpusPrep.CardShortChars
      s"""WITH base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
         |    CAST(SUM(CASE WHEN n_chars < $short THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_short
         |  FROM documents GROUP BY 1),
         |fp AS (SELECT source,
         |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2),
         |dups AS (SELECT source,
         |    CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
         |      AS n_dup_docs
         |  FROM fp GROUP BY 1)
         |SELECT base.source, n_docs, n_langs, chars_sum,
         |  CAST(chars_sum // n_docs AS BIGINT) AS mean_chars,
         |  CAST(n_short * 1000000 // n_docs AS BIGINT) AS short_ppm,
         |  n_dup_docs,
         |  CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm
         |FROM base JOIN dups USING (source)""".stripMargin
    },
    // recursive component closure over the LSH pairs (the q140 CTE),
    // fingerprint truth, then the per-cell B-cubed algebra
    "q222_cluster_eval" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
         |          UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(doc, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc),
         |comp AS (SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |         FROM reach GROUP BY doc),
         |lab AS (SELECT d.doc_id,
         |    md5(lower(regexp_replace(trim(d.text), '\\s+', ' ', 'g'))) AS fp,
         |    COALESCE(comp.component, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp USING (doc_id)),
         |cs AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_c
         |  FROM lab GROUP BY 1),
         |tsz AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_t
         |  FROM lab GROUP BY 1),
         |cells AS (SELECT cluster, fp, CAST(COUNT(*) AS BIGINT) AS n_ct
         |  FROM lab GROUP BY 1, 2),
         |m AS (SELECT CAST(SUM(n_ct) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_ct * (n_ct * 1000000 // n_c)) AS BIGINT) AS p_mass,
         |    CAST(SUM(n_ct * (n_ct * 1000000 // n_t)) AS BIGINT) AS r_mass
         |  FROM cells JOIN cs USING (cluster) JOIN tsz USING (fp))
         |SELECT n_docs, CAST(p_mass // n_docs AS BIGINT) AS b3_precision_ppm,
         |  CAST(r_mass // n_docs AS BIGINT) AS b3_recall_ppm,
         |  CAST(CASE WHEN p_mass + r_mass = 0 THEN 0 ELSE
         |    2 * (p_mass // n_docs) * (r_mass // n_docs) //
         |    (p_mass // n_docs + r_mass // n_docs) END AS BIGINT) AS b3_f1_ppm
         |FROM m""".stripMargin,
    // the q154 iteration CTEs replayed over the word co-occurrence
    // graph; node ids are the q155 48-bit md5-prefix ordering hash
    "q223_textrank_keywords" -> {
      import graft.operators.GraphOps.{PrDampPct, PrIters, PrScale}
      import graft.operators.CorpusPrep.{TextrankMinW, TextrankTopK}
      def fp(c: String) =
        s"CAST(concat('0x', substr(md5($c), 1, 12)) AS BIGINT)"
      val iters = (1 to PrIters).map { i =>
        s"""r$i AS (SELECT e2.dst AS node,
           |    t.tele + ($PrDampPct * SUM((r.rank_q * e2.w) // e2.out_w)) // 100
           |      AS rank_q
           |  FROM e2 JOIN r${i - 1} r ON e2.src = r.node, t
           |  GROUP BY e2.dst, t.tele)""".stripMargin
      }.mkString(",\n")
      s"""WITH tk AS (SELECT regexp_split_to_array(trim(lower(text)), '\\s+')
         |    AS toks FROM documents),
         |bp AS (SELECT x.p.a AS a, x.p.b AS b
         |  FROM (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |      i -> {'a': toks[i], 'b': toks[i + 1]})) AS p
         |    FROM tk WHERE len(toks) >= 2) x
         |  WHERE x.p.a <> x.p.b),
         |aj AS (SELECT least(a, b) AS u, greatest(a, b) AS v, COUNT(*) AS w
         |  FROM bp GROUP BY 1, 2 HAVING COUNT(*) >= $TextrankMinW),
         |ed AS (SELECT ${fp("u")} AS src, ${fp("v")} AS dst, w FROM aj
         |  UNION ALL SELECT ${fp("v")}, ${fp("u")}, w FROM aj),
         |outw AS (SELECT src, SUM(w) AS out_w FROM ed GROUP BY 1),
         |e2 AS (SELECT ed.src, ed.dst, ed.w, outw.out_w
         |       FROM ed JOIN outw USING (src)),
         |t AS (SELECT ($PrScale // COUNT(*)) AS base,
         |    (15 * ($PrScale // COUNT(*))) // 100 AS tele FROM outw),
         |r0 AS (SELECT src AS node, t.base AS rank_q FROM outw, t),
         |$iters,
         |vm AS (SELECT u AS tok, ${fp("u")} AS node FROM aj
         |  UNION SELECT v, ${fp("v")} FROM aj)
         |SELECT tok, rank_q, kw_rank FROM (
         |  SELECT vm.tok, CAST(r.rank_q AS BIGINT) AS rank_q,
         |    CAST(ROW_NUMBER() OVER (ORDER BY r.rank_q DESC, vm.tok ASC)
         |      AS INT) AS kw_rank
         |  FROM r$PrIters r JOIN vm USING (node)) s
         |WHERE kw_rank <= $TextrankTopK""".stripMargin
    },
    // capped wedges per middle node (smallest-id neighbors), common
    // counts, anti-join against the edge set, exact-degree Jaccard
    "q224_link_prediction" -> {
      import graft.operators.GraphOps.{LpMinCommon, LpNeighborCap}
      s"""WITH $coSupplyCtes,
         |sym AS (SELECT a AS m, b AS n FROM edges
         |  UNION ALL SELECT b, a FROM edges),
         |deg AS (SELECT m AS s, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM sym GROUP BY 1),
         |cap AS (SELECT m, n FROM (
         |    SELECT m, n, ROW_NUMBER() OVER (PARTITION BY m ORDER BY n) AS rn
         |    FROM sym) t
         |  WHERE rn <= $LpNeighborCap),
         |cn AS (SELECT l.n AS a, r.n AS b, CAST(COUNT(*) AS BIGINT)
         |    AS n_common
         |  FROM cap l JOIN cap r ON l.m = r.m AND l.n < r.n
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $LpMinCommon),
         |ne AS (SELECT cn.* FROM cn
         |  WHERE NOT EXISTS (SELECT 1 FROM edges e
         |    WHERE e.a = cn.a AND e.b = cn.b))
         |SELECT ne.a, ne.b, ne.n_common, da.deg AS deg_a, db.deg AS deg_b,
         |  ne.n_common * 1000000 // (da.deg + db.deg - ne.n_common)
         |    AS jaccard_ppm
         |FROM ne JOIN deg da ON ne.a = da.s JOIN deg db ON ne.b = db.s""".stripMargin
    },
    // the q106 search CTEs, then the exact-ppm AP/RR/P@5 algebra over
    // the 5-row-per-query top-k relation with label relevance
    "q225_retrieval_metrics" ->
      s"""WITH $ivfDerivedCtes,
         |topk AS (SELECT q_id, vec_id AS neighbor_id, cos_ppm, rank FROM (
         |    SELECT q_id, vec_id, cos_ppm,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cos_ppm DESC, vec_id ASC) AS rank
         |    FROM c) t
         |  WHERE rank <= 5),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
         |        FROM embeddings),
         |lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
         |       FROM lab GROUP BY 1),
         |rws AS (SELECT t.q_id, t.rank, ql.label AS q_label,
         |    CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
         |  FROM topk t JOIN lab ql ON t.q_id = ql.vec_id
         |  JOIN lab nl ON t.neighbor_id = nl.vec_id),
         |h AS (SELECT *, SUM(rel) OVER (PARTITION BY q_id ORDER BY rank)
         |    AS hits_at FROM rws),
         |pq AS (SELECT q_id, q_label,
         |    CAST(SUM(CASE WHEN rel = 1 THEN hits_at * 1000000 // rank
         |      ELSE 0 END) AS BIGINT) AS sum_prec_ppm,
         |    CAST(SUM(rel) AS BIGINT) AS n_hits,
         |    MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel
         |  FROM h GROUP BY 1, 2),
         |m AS (SELECT pq.*,
         |    GREATEST(1, LEAST(lc.n_label - 1, 5)) AS denom
         |  FROM pq JOIN lc ON pq.q_label = lc.label)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(SUM(sum_prec_ppm // denom) // COUNT(*) AS BIGINT) AS map_ppm,
         |  CAST(SUM(CASE WHEN first_rel IS NULL THEN 0
         |    ELSE 1000000 // first_rel END) // COUNT(*) AS BIGINT) AS mrr_ppm,
         |  CAST(SUM(n_hits * 1000000 // 5) // COUNT(*) AS BIGINT) AS p5_ppm,
         |  CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS hit_ppm
         |FROM m""".stripMargin,
    // the derived-width assignment CTEs, centroid cosine per member,
    // then the bottom-5% rank cut per bucket
    "q226_centroid_outliers" -> {
      import graft.operators.Similarity.OutlierDenom
      s"""WITH $ivfDerivedCtes,
         |sc AS (SELECT a.vec_id, a.bucket,
         |    CAST(floor(CAST(${dotSql("e.embedding", "c.c_emb")} AS DOUBLE)
         |      * 1000000.0 / (sqrt(CAST(e.n_emb AS DOUBLE)) *
         |      sqrt(CAST(${dotSql("c.c_emb", "c.c_emb")} AS DOUBLE))))
         |      AS BIGINT) AS cos_ppm
         |  FROM asg a JOIN e ON a.vec_id = e.vec_id
         |  JOIN cents c ON a.bucket = c.c_id),
         |rk AS (SELECT bucket, vec_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket
         |      ORDER BY cos_ppm ASC, vec_id ASC) AS INT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_bucket
         |  FROM sc)
         |SELECT bucket, vec_id, cos_ppm, rn, n_bucket FROM rk
         |WHERE rn * $OutlierDenom <= n_bucket""".stripMargin
    },
    // the derived-width CTEs with probe RANK retained to the max sweep
    // value, brute top-5 truth, then per-sweep-value filter + top-5 —
    // on the FIXED 256-query commissioning budget (linear-in-corpus
    // truth; the unbounded %100 form is ivfProbeSweepFull, audit-only)
    "q227_ivf_probe_sweep" -> probeSweepSql(
      s"vec_id < ${graft.operators.Similarity.SweepCommissionBudget}"),
    // the serving-shaped twin: fixed 64-query budget, linear-in-corpus
    "q232_ivf_sweep_budget" -> probeSweepSql(
      s"vec_id < ${graft.operators.Similarity.SweepQueryBudget}"),
  ) ++ oracleSqlMore

  /** The q227/q232 sweep oracle, parameterized by the query-subset
    * predicate (the only difference between the commissioning and
    * serving-shaped forms).
    */
  private def probeSweepSql(qPred: String): String = {
      val maxP = graft.operators.Similarity.SweepNprobes.max
      val vals = graft.operators.Similarity.SweepNprobes
        .map(v => s"($v)").mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding,
         |  ${dotSql("embedding", "embedding")} AS n_emb FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT))
         |       AS nlist FROM e),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n_emb AS n_q
         |      FROM e WHERE $qPred),
         |pr AS (
         |  SELECT q_id, q_emb, n_q, c_id AS bucket, rk AS probe_rank FROM (
         |    SELECT q.q_id, q.q_emb, q.n_q, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM q, cents c) t
         |  WHERE rk <= $maxP),
         |sc AS MATERIALIZED (
         |  SELECT p.q_id, e.vec_id, p.probe_rank,
         |    CAST(floor(CAST(${dotSql("p.q_emb", "e.embedding")} AS DOUBLE)
         |      * 1000000.0 / (sqrt(CAST(p.n_q AS DOUBLE)) *
         |      sqrt(CAST(e.n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN pr p ON asg.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |bf AS (
         |  SELECT q_id, e.vec_id, CAST(floor(
         |      CAST(${dotSql("q.q_emb", "e.embedding")} AS DOUBLE) * 1000000.0
         |      / (sqrt(CAST(q.n_q AS DOUBLE)) * sqrt(CAST(e.n_emb AS DOUBLE))))
         |      AS BIGINT) AS cos_ppm
         |  FROM e, q WHERE e.vec_id <> q.q_id),
         |b5 AS (SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS rk FROM bf) t
         |  WHERE rk <= 5),
         |v(nprobe) AS (VALUES $vals),
         |t5 AS (SELECT nprobe, q_id, vec_id FROM (
         |    SELECT v.nprobe, sc.q_id, sc.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY v.nprobe, sc.q_id
         |        ORDER BY sc.cos_ppm DESC, sc.vec_id ASC) AS rk
         |    FROM sc JOIN v ON sc.probe_rank <= v.nprobe) t
         |  WHERE rk <= 5),
         |hits AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM t5 JOIN b5 USING (q_id, vec_id) GROUP BY 1),
         |cand AS (SELECT v.nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand
         |  FROM sc JOIN v ON sc.probe_rank <= v.nprobe GROUP BY 1),
         |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q)
         |SELECT CAST(v.nprobe AS INT) AS nprobe, nq.n_queries,
         |  COALESCE(hits.n_hits, 0) AS n_hits,
         |  COALESCE(hits.n_hits, 0) * 1000000 // (5 * nq.n_queries)
         |    AS recall_ppm,
         |  COALESCE(cand.n_cand, 0) // nq.n_queries AS mean_cand
         |FROM v LEFT JOIN hits ON v.nprobe = hits.nprobe
         |LEFT JOIN cand ON v.nprobe = cand.nprobe, nq""".stripMargin
  }

  /** [[oracleSqlMore]] minus the alias entries that reuse another
    * query's SQL verbatim (q251 ≡ q248: the streaming twin's parity IS
    * the claim, so the oracle must be the shared string, not a copy
    * that could drift).
    */
  private lazy val oracleSqlMoreBase: Map[String, String] = Map(
    // q96's truth chain at the sweep threshold + the q39 candidate
    // pipeline, swept over every feasible band threshold
    "q228_lsh_band_sweep" -> {
      import graft.operators.Dedup.{DfCap, MinhashK, SweepTruthJPpm}
      val vals = (1 to MinhashK / 2).map(t => s"($t)").mkString(", ")
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, source, n_sh, $shashSql AS shash FROM sh),
         |keep AS (SELECT source, shash FROM hs GROUP BY 1, 2
         |         HAVING COUNT(*) BETWEEN 2 AND $DfCap),
         |hs2 AS (SELECT hs.* FROM hs JOIN keep USING (source, shash)),
         |jpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM hs2 a JOIN hs2 b ON a.source = b.source AND a.shash = b.shash
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |truth AS MATERIALIZED (SELECT doc_a, doc_b FROM jpairs
         |  WHERE inter * 1000000 // (n_a + n_b - inter) >= $SweepTruthJPpm),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         |$lshPairsTail,
         |v(t) AS (VALUES $vals),
         |cnt AS (SELECT v.t, CAST(COUNT(*) AS BIGINT) AS n_pred,
         |    CAST(SUM(CASE WHEN tr.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp
         |  FROM lsh_pairs c JOIN v ON c.n_bands >= v.t
         |  LEFT JOIN truth tr ON c.doc_a = tr.doc_a AND c.doc_b = tr.doc_b
         |  GROUP BY 1),
         |mets AS (SELECT v.t AS band_threshold,
         |    COALESCE(cnt.n_pred, 0) AS n_pred, COALESCE(cnt.tp, 0) AS tp,
         |    nt.n_truth,
         |    CASE WHEN COALESCE(cnt.n_pred, 0) = 0 THEN 0
         |      ELSE COALESCE(cnt.tp, 0) * 1000000 // cnt.n_pred END
         |      AS precision_ppm,
         |    CASE WHEN nt.n_truth = 0 THEN 0
         |      ELSE COALESCE(cnt.tp, 0) * 1000000 // nt.n_truth END
         |      AS recall_ppm
         |  FROM v LEFT JOIN cnt ON v.t = cnt.t, nt)
         |SELECT CAST(band_threshold AS INT) AS band_threshold, n_pred, tp,
         |  n_truth, precision_ppm, recall_ppm,
         |  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |    ELSE 2 * precision_ppm * recall_ppm //
         |      (precision_ppm + recall_ppm) END AS f1_ppm
         |FROM mets""".stripMargin
    },
    // the derived-width 1-NN relation binned by shifted cosine — the
    // reliability panel in exact ppm
    "q229_knn_calibration" -> {
      import graft.operators.Similarity.CalibBinPpm
      s"""WITH $derivedAsgPrefix,
         |$knnNn1Ctes,
         |nn AS (SELECT * FROM p WHERE rk = 1),
         |b AS (SELECT (cos_ppm + 1000000) // $CalibBinPpm AS bin,
         |    CASE WHEN label_true = label_pred THEN 1 ELSE 0 END AS correct,
         |    cos_ppm FROM nn)
         |SELECT CAST(bin * $CalibBinPpm - 1000000 AS BIGINT) AS bin_lo_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(correct) AS BIGINT) AS n_correct,
         |  CAST(SUM(correct) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm,
         |  CAST(SUM(cos_ppm) // COUNT(*) AS BIGINT) AS mean_cos_ppm
         |FROM b GROUP BY bin""".stripMargin
    },
    // every CMS cell replayed (md5-prefix row hashes), min row-F2 vs
    // the exact keyed pair mass, Markov bound in HUGEINT
    "q230_cms_selfjoin_size" -> {
      import graft.operators.Sketches.{CmsF2Depth, CmsF2Width}
      s"""WITH k AS (SELECT l_partkey AS k FROM lineitem),
         |ex AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact,
         |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys
         |  FROM (SELECT k, COUNT(*) AS cnt FROM k GROUP BY 1) t),
         |cells AS (SELECT ri, CAST(concat('0x', substr(md5(
         |      concat(CAST(ri AS VARCHAR), ':', CAST(k AS VARCHAR))), 1, 12))
         |      AS BIGINT) % $CmsF2Width AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS cell
         |  FROM k, unnest(generate_series(0, ${CmsF2Depth - 1})) u(ri)
         |  GROUP BY 1, 2),
         |est AS (SELECT CAST(MIN(row_est) AS BIGINT) AS f2_est FROM (
         |    SELECT ri, SUM(cell * cell) AS row_est FROM cells GROUP BY 1) t)
         |SELECT n_rows, n_keys, f2_exact, f2_est,
         |  CAST(CAST(f2_est - f2_exact AS HUGEINT) * 1000000 // f2_exact
         |    AS BIGINT) AS err_ppm,
         |  CAST(3 * (CAST(n_rows AS HUGEINT) * n_rows - f2_exact) * 1000000
         |    // ($CmsF2Width * CAST(f2_exact AS HUGEINT)) AS BIGINT)
         |    AS bound_ppm,
         |  f2_est >= f2_exact AND
         |    CAST(CAST(f2_est - f2_exact AS HUGEINT) * 1000000 // f2_exact
         |      AS BIGINT) <=
         |    CAST(3 * (CAST(n_rows AS HUGEINT) * n_rows - f2_exact) * 1000000
         |      // ($CmsF2Width * CAST(f2_exact AS HUGEINT)) AS BIGINT)
         |    AS f2_ok
         |FROM ex, est""".stripMargin
    },
    // the q89 split over the shared shingle relation: distinct batch
    // shingles anti-joined against the same source's corpus set
    "q231_crawl_novelty" -> {
      val bucket =
        "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000"
      s"""WITH $shingleCte,
         |hb AS (SELECT doc_id, source, $bucket AS b, $shashSql AS shash
         |       FROM sh),
         |corpus AS (SELECT DISTINCT source, shash FROM hb WHERE b < 800000),
         |batch AS (SELECT DISTINCT source, shash FROM hb WHERE b >= 900000),
         |bs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_batch_shingles
         |       FROM batch GROUP BY 1),
         |cs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_corpus_shingles
         |       FROM corpus GROUP BY 1),
         |bd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_batch_docs
         |       FROM documents WHERE $bucket >= 900000 GROUP BY 1),
         |nv AS (SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_novel
         |  FROM batch b WHERE NOT EXISTS (SELECT 1 FROM corpus c
         |    WHERE c.source = b.source AND c.shash = b.shash)
         |  GROUP BY 1)
         |SELECT bs.source, bd.n_batch_docs, bs.n_batch_shingles,
         |  COALESCE(cs.n_corpus_shingles, 0) AS n_corpus_shingles,
         |  COALESCE(nv.n_novel, 0) AS n_novel,
         |  COALESCE(nv.n_novel, 0) * 1000000 // bs.n_batch_shingles
         |    AS novelty_ppm
         |FROM bs JOIN bd USING (source)
         |LEFT JOIN cs ON bs.source = cs.source
         |LEFT JOIN nv ON bs.source = nv.source""".stripMargin
    },
    // lifetimes from one user aggregation; the KM fold replayed as a
    // recursive CTE with the same per-step floor
    "q233_kaplan_meier" ->
      """WITH RECURSIVE e AS (SELECT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day FROM events),
        |lv AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld
        |       FROM e GROUP BY 1),
        |m AS (SELECT MAX(ld) AS m FROM lv),
        |du AS (SELECT ld - fd AS t,
        |    CASE WHEN ld < (SELECT m FROM m) THEN 1 ELSE 0 END AS death
        |  FROM lv),
        |dc AS (SELECT t, CAST(SUM(death) AS BIGINT) AS d,
        |    CAST(SUM(1 - death) AS BIGINT) AS c,
        |    CAST(COUNT(*) AS BIGINT) AS n_at
        |  FROM du GROUP BY 1),
        |cur AS (SELECT t, CAST(SUM(n_at) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk, d, c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY t ASC) AS BIGINT) AS i
        |  FROM dc),
        |km AS (
        |  SELECT i, t, n_risk, d, c,
        |    (1000000 * (n_risk - d)) // n_risk AS s
        |  FROM cur WHERE i = 1
        |  UNION ALL
        |  SELECT o.i, o.t, o.n_risk, o.d, o.c,
        |    (km.s * (o.n_risk - o.d)) // o.n_risk
        |  FROM cur o JOIN km ON o.i = km.i + 1)
        |SELECT t, n_risk, d, c, d * 1000000 // n_risk AS hazard_ppm,
        |  s AS survival_ppm FROM km""".stripMargin,
    // the whole post-backfill ledger predicted from the source table:
    // parity rule for version_before, rank rule for waves, corrected
    // sums everywhere
    "q234_backfill_exec" -> {
      import graft.lake.Backfill.{PipelineVersion, WaveCap}
      s"""WITH src AS (SELECT year(o_orderdate) AS y,
         |    ${cents("o_totalprice")} AS price_c FROM orders),
         |yr AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(price_c) AS BIGINT) AS total_c FROM src GROUP BY 1),
         |st AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rnk
         |       FROM yr WHERE y % 2 = 0)
         |SELECT CAST(yr.y AS BIGINT) AS year,
         |  CAST(CASE WHEN yr.y % 2 = 0 THEN 1 ELSE $PipelineVersion END
         |    AS BIGINT) AS version_before,
         |  CAST($PipelineVersion AS BIGINT) AS version_after,
         |  CAST(COALESCE((st.rnk - 1) // $WaveCap + 1, 0) AS BIGINT) AS wave,
         |  yr.n_rows, yr.total_c
         |FROM yr LEFT JOIN st ON yr.y = st.y""".stripMargin
    },
    // two sketch sides, the inner-product estimate, the exact keyed
    // join size, the Markov bound in HUGEINT
    "q235_cms_join_size" -> {
      import graft.operators.Sketches.{CmsF2Depth, CmsF2Width,
        JoinSizeYearA, JoinSizeYearB}
      def cellSql(src: String, name: String) =
        s"""(SELECT ri, CAST(concat('0x', substr(md5(
           |      concat(CAST(ri AS VARCHAR), ':', CAST(k AS VARCHAR))), 1, 12))
           |      AS BIGINT) % $CmsF2Width AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS $name
           |  FROM $src, unnest(generate_series(0, ${CmsF2Depth - 1})) u(ri)
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH a AS (SELECT l_suppkey AS k FROM lineitem
         |           WHERE year(l_shipdate) = $JoinSizeYearA),
         |b AS (SELECT l_suppkey AS k FROM lineitem
         |      WHERE year(l_shipdate) = $JoinSizeYearB),
         |ca AS (SELECT k, COUNT(*) AS cnt FROM a GROUP BY 1),
         |cb AS (SELECT k, COUNT(*) AS cnt FROM b GROUP BY 1),
         |ex AS (SELECT CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS join_exact
         |       FROM ca JOIN cb USING (k)),
         |sa AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_a,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys_a FROM ca),
         |sb AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys_b FROM cb),
         |cea AS ${cellSql("a", "cell_a")},
         |ceb AS ${cellSql("b", "cell_b")},
         |est AS (SELECT CAST(MIN(row_est) AS BIGINT) AS join_est FROM (
         |    SELECT ri, SUM(cell_a * cell_b) AS row_est
         |    FROM cea JOIN ceb USING (ri, bucket) GROUP BY 1) t)
         |SELECT n_a, n_b, n_keys_a, n_keys_b, join_exact, join_est,
         |  CAST(CAST(join_est - join_exact AS HUGEINT) * 1000000
         |    // join_exact AS BIGINT) AS err_ppm,
         |  CAST(3 * (CAST(n_a AS HUGEINT) * n_b - join_exact) * 1000000
         |    // ($CmsF2Width * CAST(join_exact AS HUGEINT)) AS BIGINT)
         |    AS bound_ppm,
         |  join_est >= join_exact AND
         |    CAST(CAST(join_est - join_exact AS HUGEINT) * 1000000
         |      // join_exact AS BIGINT) <=
         |    CAST(3 * (CAST(n_a AS HUGEINT) * n_b - join_exact) * 1000000
         |      // ($CmsF2Width * CAST(join_exact AS HUGEINT)) AS BIGINT)
         |    AS join_ok
         |FROM sa, sb, ex, est""".stripMargin
    },
    // the histogram, the uniform interpolation, the exact count, the
    // partial-bucket error theorem
    "q236_histogram_selectivity" -> {
      import graft.operators.Sketches.HistBuckets
      s"""WITH v AS (SELECT ${cents("o_totalprice")} AS v FROM orders),
         |sp AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    (MAX(v) - MIN(v)) // $HistBuckets + 1 AS width,
         |    MIN(v) + (MAX(v) - MIN(v)) * 3 // 10 AS lo,
         |    MIN(v) + (MAX(v) - MIN(v)) * 6 // 10 AS hi
         |  FROM v),
         |h AS (SELECT (v - sp.vmin) // sp.width AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM v, sp GROUP BY 1),
         |es AS (SELECT
         |    CAST(SUM(cnt * greatest(0, least(sp.hi, sp.vmin + bucket *
         |      sp.width + sp.width - 1) - greatest(sp.lo, sp.vmin + bucket *
         |      sp.width) + 1) // sp.width) AS BIGINT) AS est,
         |    CAST(SUM(CASE WHEN bucket = (sp.lo - sp.vmin) // sp.width
         |        OR bucket = (sp.hi - sp.vmin) // sp.width
         |      THEN cnt ELSE 0 END) AS BIGINT) AS partial_mass
         |  FROM h, sp),
         |exq AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM v, sp
         |        WHERE v.v >= sp.lo AND v.v <= sp.hi)
         |SELECT sp.n_rows, sp.lo, sp.hi, es.est, exq.exact,
         |  exq.exact * 1000000 // sp.n_rows AS sel_exact_ppm,
         |  es.est * 1000000 // sp.n_rows AS sel_est_ppm,
         |  es.partial_mass,
         |  abs(es.est - exq.exact) <= es.partial_mass AS hist_ok
         |FROM sp, es, exq""".stripMargin
    },
    // doubled-rank algebra on the value histogram; ties exact; HUGEINT
    // where products exceed a long
    "q237_mann_whitney" -> {
      import graft.operators.StatsAudit.{MwYearA, MwYearB}
      s"""WITH v AS (SELECT year(o_orderdate) AS yr,
         |    ${cents("o_totalprice")} AS v FROM orders
         |  WHERE year(o_orderdate) IN ($MwYearA, $MwYearB)),
         |h AS (SELECT v,
         |    CAST(SUM(CASE WHEN yr = $MwYearA THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt_a,
         |    CAST(SUM(CASE WHEN yr = $MwYearB THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt_b
         |  FROM v GROUP BY 1),
         |r AS (SELECT *, cnt_a + cnt_b AS t,
         |    SUM(cnt_a + cnt_b) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |agg AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
         |    CAST(SUM(cnt_b) AS BIGINT) AS n_b,
         |    -- HUGEINT-widened product: the Spark side carries this sum in
         |    -- DECIMAL(38,0); near ~2e9 sampled rows an unwidened BIGINT
         |    -- product would overflow here where Spark still returns a value
         |    CAST(SUM(CAST(cnt_a AS HUGEINT) * (2 * (cum - t) + t + 1))
         |      AS BIGINT) AS r2_a,
         |    CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie_mass
         |  FROM r)
         |SELECT n_a, n_b, r2_a - n_a * (n_a + 1) AS u2_a, n_a * n_b AS mu2,
         |  tie_mass,
         |  CAST(CAST(r2_a - n_a * (n_a + 1) AS HUGEINT) * 1000000
         |    // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) - 1000000
         |    AS rank_biserial_ppm
         |FROM agg""".stripMargin
    },
    // user-keyed arrival-order running max, then the q71 rank rule on
    // the lateness histogram
    "q238_watermark_tuning" -> {
      val qs = graft.operators.EventsOps.WatermarkQuantiles.mkString(", ")
      s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns
         |           FROM events),
         |l AS (SELECT (MAX(ts_ns) OVER (PARTITION BY user_id
         |      ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ts_ns)
         |      // 1000000 AS late_ms
         |  FROM e),
         |h AS (SELECT late_ms, CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM l GROUP BY 1),
         |c AS (SELECT *, SUM(cnt) OVER (ORDER BY late_ms
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(cnt) OVER () AS tot,
         |    SUM(CASE WHEN late_ms > 0 THEN cnt ELSE 0 END) OVER () AS n_late
         |  FROM h),
         |p AS (SELECT DISTINCT tot, n_late, u.quantile,
         |    (tot - 1) * u.quantile // 100 + 1 AS pos
         |  FROM c, unnest([$qs]) u(quantile))
         |SELECT CAST(p.quantile AS BIGINT) AS quantile,
         |  CAST(MIN(c.late_ms) AS BIGINT) AS late_ms,
         |  CAST(MAX(c.tot) AS BIGINT) AS n_events,
         |  CAST(MAX(c.n_late) AS BIGINT) AS n_ooo,
         |  CAST(MAX(c.n_late) * 1000000 // MAX(c.tot) AS BIGINT) AS ooo_ppm
         |FROM c JOIN p ON c.cum >= p.pos
         |GROUP BY p.quantile""".stripMargin
    },
    // the shared per-user converted relation, K salted re-splits, the
    // q202 z² per split
    "q239_aa_calibration" -> {
      import graft.operators.StatsAudit.{AaSplits, Chi2Crit05Ppm}
      s"""WITH $abUsersCte,
         |s AS (SELECT au.user_id, au.converted, CAST(t.s AS BIGINT)
         |      AS split_id,
         |    CAST(concat('0x', substr(md5(concat(CAST(au.user_id AS VARCHAR),
         |      '#aa', CAST(t.s AS VARCHAR))), 1, 8)) AS BIGINT)
         |      % 1000000 < 500000 AS is_a
         |  FROM au, range(0, $AaSplits) t(s)),
         |g AS (SELECT split_id,
         |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN is_a THEN converted ELSE 0 END) AS BIGINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE converted END) AS BIGINT)
         |      AS c2
         |  FROM s GROUP BY 1),
         |z AS (SELECT *,
         |    CASE WHEN c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN NULL ELSE CAST(
         |      (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
         |      (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
         |      (n1 + n2) * 1000000 // (CAST(n1 AS HUGEINT) * n2 *
         |        (c1 + c2) * (n1 + n2 - c1 - c2)) AS BIGINT) END AS z2_ppm
         |  FROM g)
         |SELECT split_id, n1, c1, n2, c2, z2_ppm,
         |  CASE WHEN z2_ppm IS NULL THEN false
         |    ELSE z2_ppm > $Chi2Crit05Ppm END AS rejected
         |FROM z""".stripMargin
    },
    // keyed counts, 1-row total, bounded top-k, threshold/ceil algebra
    "q240_salt_planner" -> {
      import graft.operators.SkewJoin.{SaltPanelK, SaltShareThresholdPpm,
        SaltTargetSharePpm}
      s"""WITH c AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM c),
         |top AS (SELECT k, cnt FROM c ORDER BY cnt DESC, k ASC
         |        LIMIT $SaltPanelK)
         |SELECT k, cnt, t.n_total,
         |  cnt * 1000000 // t.n_total AS share_ppm,
         |  cnt * 1000000 // t.n_total > $SaltShareThresholdPpm AS is_heavy,
         |  CASE WHEN cnt * 1000000 // t.n_total > $SaltShareThresholdPpm
         |    THEN (cnt * 1000000 // t.n_total + $SaltTargetSharePpm - 1)
         |      // $SaltTargetSharePpm
         |    ELSE 1 END AS salt_factor
         |FROM top, t""".stripMargin
    },
    // marginals + diagonal of the shared confusion CTE; the q222 F1
    // ppm rule
    "q241_langid_prf" ->
      s"""WITH $langidCmCte,
         |rm AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true
         |       FROM cm GROUP BY 1),
         |pm AS (SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT) AS n_pred
         |       FROM cm GROUP BY 1),
         |tp AS (SELECT lang, CAST(n AS BIGINT) AS tp FROM cm
         |       WHERE lang = pred_lang),
         |m AS (SELECT rm.lang, rm.n_true, COALESCE(pm.n_pred, 0) AS n_pred,
         |    COALESCE(tp.tp, 0) AS tp,
         |    CASE WHEN COALESCE(pm.n_pred, 0) = 0 THEN 0
         |      ELSE COALESCE(tp.tp, 0) * 1000000 // pm.n_pred END
         |      AS precision_ppm,
         |    COALESCE(tp.tp, 0) * 1000000 // rm.n_true AS recall_ppm
         |  FROM rm LEFT JOIN pm ON rm.lang = pm.lang
         |  LEFT JOIN tp ON rm.lang = tp.lang)
         |SELECT lang, n_true, n_pred, tp, precision_ppm, recall_ppm,
         |  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |    ELSE 2 * precision_ppm * recall_ppm //
         |      (precision_ppm + recall_ppm) END AS f1_ppm
         |FROM m""".stripMargin,
    // diagonal share vs the marginal-product chance agreement; n²
    // widened to HUGEINT
    "q242_langid_kappa" ->
      s"""WITH $langidCmCte,
         |rm AS (SELECT lang AS label, CAST(SUM(n) AS BIGINT) AS n_row
         |       FROM cm GROUP BY 1),
         |pm AS (SELECT pred_lang AS label, CAST(SUM(n) AS BIGINT) AS n_col
         |       FROM cm GROUP BY 1),
         |pe AS (SELECT CAST(SUM(CAST(n_row AS HUGEINT) * n_col) AS HUGEINT)
         |       AS pe_num FROM rm JOIN pm USING (label)),
         |ag AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
         |      AS BIGINT) AS agree
         |  FROM cm),
         |k AS (SELECT n_docs, agree,
         |    agree * 1000000 // n_docs AS po_ppm,
         |    CAST(pe_num * 1000000 //
         |      (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_ppm
         |  FROM ag, pe)
         |SELECT n_docs, agree, po_ppm, pe_ppm,
         |  CASE WHEN pe_ppm = 1000000 THEN NULL
         |    ELSE (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) END
         |    AS kappa_ppm
         |FROM k""".stripMargin,
    // the q84 plan replayed per sweep point, UNION ALL of the three
    // summaries
    "q243_decontam_sweep" -> {
      import graft.operators.TextOps.{ContamPpm, DecontamSweepNs}
      val bucket =
        "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000"
      def chain(n: Int) =
        s"""ev_$n AS (SELECT DISTINCT CAST(concat('0x', substr(md5(g), 1, 15))
           |      AS BIGINT) AS ghash
           |  FROM (SELECT unnest(CASE WHEN len($toks) >= $n THEN
           |      list_transform(generate_series(1, len($toks) - ${n - 1}),
           |        i -> array_to_string(($toks)[i:i+${n - 1}], ' '))
           |    ELSE [] END) AS g
           |    FROM documents WHERE $bucket >= 900000) u),
           |tg_$n AS (SELECT doc_id, n_chars,
           |    CAST(len(gs) AS BIGINT) AS n_g,
           |    unnest(CASE WHEN len(gs) = 0 THEN [NULL] ELSE gs END) AS g
           |  FROM (SELECT doc_id, n_chars,
           |      CASE WHEN len($toks) >= $n THEN list_distinct(
           |        list_transform(generate_series(1, len($toks) - ${n - 1}),
           |          i -> array_to_string(($toks)[i:i+${n - 1}], ' ')))
           |      ELSE CAST([] AS VARCHAR[]) END AS gs
           |    FROM documents WHERE $bucket < 800000) d),
           |pd_$n AS (SELECT doc_id, n_chars, n_g,
           |    CAST(SUM(CASE WHEN e.ghash IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_hits
           |  FROM (SELECT doc_id, n_chars, n_g,
           |      CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS ghash
           |    FROM tg_$n) t
           |  LEFT JOIN ev_$n e USING (ghash)
           |  GROUP BY 1, 2, 3),
           |sm_$n AS (SELECT $n AS gram_n,
           |    CAST(COUNT(*) AS BIGINT) AS n_train,
           |    CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           |    CAST(SUM(flagged * n_chars) AS BIGINT) AS flagged_chars,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ev_$n) AS n_eval_grams
           |  FROM (SELECT n_chars, CASE WHEN n_g = 0 THEN 0
           |      WHEN n_hits * 1000000 // n_g >= $ContamPpm THEN 1
           |      ELSE 0 END AS flagged
           |    FROM pd_$n) f)""".stripMargin
      s"""WITH ${DecontamSweepNs.map(chain).mkString(",\n")}
         |${DecontamSweepNs.map(n =>
            s"""SELECT gram_n, n_train, n_flagged,
               |  n_flagged * 1000000 // n_train AS flagged_ppm,
               |  flagged_chars, n_eval_grams FROM sm_$n""".stripMargin)
          .mkString("\nUNION ALL\n")}""".stripMargin
    },
    // the committed-artifact audit replayed from the raw corpus: the
    // derived-knob assignment (q106's asg), the PQ argmin codes
    // (q107/q108's code CTE) rolled to per-vector mass, per-bucket
    // membership count + bit_xor witness — a torn commit, a dropped
    // bucket, or a knob drift breaks the hash
    "q244_ann_index_commit" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(${graft.operators.Similarity.IvfNlist},
         |    CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM e),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |kk AS (SELECT GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |       FROM q),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q, kk WHERE vec_id < kk.k),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, c_id AS code FROM (
         |    SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |cm AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
         |       FROM code GROUP BY 1)
         |SELECT asg.bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(asg.vec_id) AS vec_xor,
         |  CAST(COUNT(*) AS BIGINT) AS n_codes,
         |  CAST(SUM(cm.mass) AS BIGINT) AS code_mass,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nl) AS nlist,
         |  (SELECT nprobe FROM np) AS nprobe,
         |  (SELECT k FROM kk) AS k
         |FROM asg JOIN cm USING (vec_id)
         |GROUP BY 1""".stripMargin
    },
    // served-from-artifact searches are hash-equal to the live q106/q108
    // by construction — same oracle algebra
    "q245_ann_ivf_serve" -> q106Sql,
    "q246_ann_ivfpq_serve" -> q108Sql,
    // the staleness panel: full-corpus committed membership vs the
    // ≥ 0.9 fresh-crawl split assigned to the same derived-width
    // centroids (q132's growth/mean-dot algebra, artifact-side counts)
    "q247_ann_index_staleness" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(${graft.operators.Similarity.IvfNlist},
         |    CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM e),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |b AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |a AS (SELECT vec_id, c_id AS bucket, d AS dot_q FROM (
         |    SELECT e.vec_id, c.c_id, ${dotSql("c.c_emb", "e.embedding")} AS d,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |idx AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_index
         |        FROM a GROUP BY 1),
         |arr AS (SELECT a.bucket, CAST(COUNT(*) AS BIGINT) AS n_new,
         |    CAST(SUM(a.dot_q) AS BIGINT) AS sum_new
         |  FROM a JOIN b USING (vec_id) WHERE b.hb >= 900000 GROUP BY 1)
         |SELECT idx.bucket, idx.n_index,
         |  COALESCE(arr.n_new, 0) AS n_new,
         |  COALESCE(arr.n_new, 0) * 1000000 // idx.n_index AS growth_ppm,
         |  CASE WHEN arr.n_new IS NULL THEN NULL
         |    ELSE CAST(arr.sum_new // arr.n_new
         |      - (CASE WHEN arr.sum_new % arr.n_new <> 0 AND arr.sum_new < 0
         |        THEN 1 ELSE 0 END) AS BIGINT) END AS mean_dot_new_q,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version
         |FROM idx LEFT JOIN arr ON idx.bucket = arr.bucket""".stripMargin,
    // the incremental-commit audit replayed from the raw corpus: the
    // BASE split derives the knobs and seeds the model (lowest base
    // ids, not vec_id < width — base ids are not dense), and the full
    // corpus assigned/coded under that base model IS base-build ∪
    // delta-ingest — a dropped delta, a clobbered untouched bucket, a
    // wrong-model arrival coding, or a knob drift breaks the hash
    "q248_ann_index_ingest" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 900000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist,
         |    GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |  FROM base),
         |cents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, cents c) t
         |  WHERE rk = 1),
         |qq AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |cb AS (SELECT cpos, cq FROM (
         |    SELECT list_transform(embedding,
         |        x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS cq,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cpos FROM base) t, nb
         |  WHERE cpos < nb.k),
         |-- codes are POSITIONAL (0..k−1, codebook rows in c_id order):
         |-- that is what indexes the ADC LUT; the base split's seed ids
         |-- are not dense, so position ≠ original id here
         |d AS (SELECT q.vec_id, c.cpos, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM qq q, cb c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, cpos AS code FROM (
         |    SELECT vec_id, m, cpos,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cpos) AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |cm AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
         |       FROM code GROUP BY 1)
         |SELECT asg.bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(asg.vec_id) AS vec_xor,
         |  CAST(COUNT(*) AS BIGINT) AS n_codes,
         |  CAST(SUM(cm.mass) AS BIGINT) AS code_mass,
         |  CAST(SUM(CASE WHEN hbt.hb >= 900000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_arrived,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nb) AS nlist,
         |  (SELECT k FROM nb) AS k
         |FROM asg JOIN hbt USING (vec_id) JOIN cm USING (vec_id)
         |GROUP BY 1""".stripMargin
    },
    // the refresh-policy panel replayed from counts + two models: the
    // BASE-seeded assignment (q248's algebra) carries the noop/ingest
    // arms, the FULL-corpus model (q244's) the rebuild arm; decisions
    // are the same CASE over the same growth ratio the engine computes
    "q249_ann_index_refresh" -> {
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 900000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist,
         |    GREATEST(${graft.operators.Similarity.PqK},
         |      CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |  FROM base),
         |nf AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist,
         |    GREATEST(${graft.operators.Similarity.PqK},
         |      CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |  FROM emb),
         |g AS (SELECT CAST((SELECT COUNT(*) FROM hbt WHERE hb >= 900000)
         |    * 1000000 // (SELECT COUNT(*) FROM base) AS BIGINT) AS growth_ppm),
         |bcents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |fcents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |           FROM emb, nf WHERE vec_id < nf.nlist),
         |basg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, bcents c) t
         |  WHERE rk = 1),
         |fasg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, fcents c) t
         |  WHERE rk = 1),
         |wfresh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(basg.vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT basg.bucket) AS BIGINT) AS n_buckets
         |  FROM basg JOIN hbt USING (vec_id) WHERE hbt.hb < 900000),
         |wstale AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets FROM basg),
         |wdrift AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets FROM fasg),
         |sc AS (SELECT * FROM (VALUES
         |    ('fresh', CAST(200000 AS BIGINT), CAST(500000 AS BIGINT)),
         |    ('stale', CAST(50000 AS BIGINT), CAST(500000 AS BIGINT)),
         |    ('drift', CAST(10000 AS BIGINT), CAST(50000 AS BIGINT)))
         |  AS t(scenario, low_ppm, high_ppm))
         |SELECT sc.scenario,
         |  CASE WHEN g.growth_ppm < sc.low_ppm THEN 'noop'
         |    WHEN g.growth_ppm < sc.high_ppm THEN 'ingest'
         |    ELSE 'rebuild' END AS decision,
         |  g.growth_ppm, sc.low_ppm, sc.high_ppm,
         |  w.n_members, w.vec_xor, w.n_buckets,
         |  w.n_members AS n_codes,
         |  CASE WHEN sc.scenario = 'drift' AND g.growth_ppm >= sc.high_ppm
         |    THEN (SELECT nlist FROM nf) ELSE (SELECT nlist FROM nb) END AS nlist,
         |  CASE WHEN sc.scenario = 'drift' AND g.growth_ppm >= sc.high_ppm
         |    THEN (SELECT k FROM nf) ELSE (SELECT k FROM nb) END AS k
         |FROM sc, g,
         |  LATERAL (SELECT w1.* FROM wfresh w1 WHERE sc.scenario = 'fresh'
         |    UNION ALL SELECT w2.* FROM wstale w2 WHERE sc.scenario = 'stale'
         |    UNION ALL SELECT w3.* FROM wdrift w3 WHERE sc.scenario = 'drift') w
         |""".stripMargin
    },
    // write-amplification waves replayed from the base(<0.7)-seeded
    // assignment: per wave, arrivals in [lo, hi), distinct touched
    // buckets, pre-wave occupancy of those buckets (hb < lo), and the
    // committed running total — pure relational algebra on the asg
    "q250_ann_index_write_amp" -> {
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 700000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM base),
         |bcents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, bcents c) t
         |  WHERE rk = 1),
         |j AS (SELECT asg.vec_id, asg.bucket, hbt.hb
         |      FROM asg JOIN hbt USING (vec_id)),
         |wv AS (SELECT * FROM (VALUES
         |    (CAST(1 AS BIGINT), CAST(700000 AS BIGINT), CAST(800000 AS BIGINT)),
         |    (CAST(2 AS BIGINT), CAST(800000 AS BIGINT), CAST(900000 AS BIGINT)),
         |    (CAST(3 AS BIGINT), CAST(900000 AS BIGINT), CAST(1000000 AS BIGINT)))
         |  AS t(w, lo, hi)),
         |aw AS (SELECT wv.w, j.vec_id, j.bucket
         |       FROM wv JOIN j ON j.hb >= wv.lo AND j.hb < wv.hi),
         |arrc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_arrivals
         |         FROM aw GROUP BY 1),
         |tb AS (SELECT DISTINCT w, bucket FROM aw),
         |tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_touched
         |       FROM tb GROUP BY 1),
         |ex AS (SELECT tb.w, CAST(COUNT(*) AS BIGINT) AS n_exist
         |  FROM tb JOIN wv USING (w) JOIN j
         |    ON j.bucket = tb.bucket AND j.hb < wv.lo
         |  GROUP BY tb.w),
         |tot AS (SELECT wv.w, CAST(COUNT(*) AS BIGINT) AS n_total
         |        FROM wv JOIN j ON j.hb < wv.hi GROUP BY 1)
         |SELECT wv.w AS wave,
         |  COALESCE(arrc.n_arrivals, 0) AS n_arrivals,
         |  COALESCE(tc.n_touched, 0) AS n_touched,
         |  COALESCE(ex.n_exist, 0) + COALESCE(arrc.n_arrivals, 0)
         |    AS rows_rewritten,
         |  CASE WHEN COALESCE(arrc.n_arrivals, 0) = 0 THEN 0
         |    ELSE (COALESCE(ex.n_exist, 0) + arrc.n_arrivals) * 1000000
         |      // arrc.n_arrivals END AS write_amp_ppm,
         |  tot.n_total
         |FROM wv
         |LEFT JOIN arrc USING (w)
         |LEFT JOIN tc USING (w)
         |LEFT JOIN ex USING (w)
         |JOIN tot USING (w)""".stripMargin
    },
    // hierarchical (coarse→fine) assignment replayed exactly: fine
    // centroids route to coarse cells, rows route to coarse cells,
    // then argmax over ONLY the row's cell's fine sublist (ties →
    // lowest id at both levels; empty cell → bucket −1)
    "q252_ann_hier_assign" ->
      s"""$hierAssignCtes
         |SELECT cell, bucket, CAST(COUNT(*) AS BIGINT) AS n_assigned,
         |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
         |FROM hier GROUP BY 1, 2""".stripMargin,
    // q252's routing vs the exact flat argmax, per fine bucket, with
    // agreement in exact ppm over the hier members
    "q253_ann_hier_agreement" ->
      s"""$hierAssignCtes,
         |flat AS (SELECT vec_id, f_id AS bucket FROM (
         |    SELECT e.vec_id, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("e.embedding", "f.f_emb")} DESC,
         |          f.f_id ASC) AS rk
         |    FROM e, fine f) t WHERE rk = 1),
         |j AS (SELECT h.vec_id, h.bucket AS b_h, fl.bucket AS b_f
         |      FROM hier h JOIN flat fl USING (vec_id)),
         |ha AS (SELECT b_h AS bucket, CAST(COUNT(*) AS BIGINT) AS n_hier,
         |    CAST(SUM(CASE WHEN b_h = b_f THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_agree
         |  FROM j GROUP BY 1),
         |fa AS (SELECT b_f AS bucket, CAST(COUNT(*) AS BIGINT) AS n_flat
         |       FROM j GROUP BY 1)
         |SELECT COALESCE(ha.bucket, fa.bucket) AS bucket,
         |  COALESCE(ha.n_hier, 0) AS n_hier,
         |  COALESCE(fa.n_flat, 0) AS n_flat,
         |  COALESCE(ha.n_agree, 0) AS n_agree,
         |  CAST(CASE WHEN COALESCE(ha.n_hier, 0) > 0
         |    THEN ha.n_agree * 1000000 // ha.n_hier ELSE 0 END AS BIGINT)
         |    AS agree_ppm
         |FROM ha FULL OUTER JOIN fa ON ha.bucket = fa.bucket""".stripMargin,
    // the committed hier artifact's per-bucket membership witnesses +
    // frozen two-level knobs, recomputed from the raw corpus
    "q256_ann_hier_index_commit" ->
      s"""$hierAssignCtes
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(vec_id) AS vec_xor,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nl) AS nlist,
         |  (SELECT ncoarse FROM nc) AS ncoarse,
         |  (SELECT GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT))
         |   FROM nc) AS cprobe,
         |  (SELECT GREATEST(1,
         |     GREATEST(${graft.operators.Similarity.IvfNprobe},
         |       CAST(ROUND(SQRT(nlist)) AS BIGINT))
         |     // GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT)))
         |   FROM nl, nc) AS percell
         |FROM hier GROUP BY 1""".stripMargin,
    // flat-vs-hier bucket-mass skew: both assignments replayed, the
    // distribution panel per layout
    "q258_ann_layout_skew" ->
      s"""$hierAssignCtes,
         |fasg AS (SELECT vec_id, f_id AS bucket FROM (
         |    SELECT e.vec_id, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("f.f_emb", "e.embedding")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM e, fine f) t WHERE rk = 1),
         |lay AS (
         |  SELECT 'flat' AS layout, bucket FROM fasg
         |  UNION ALL
         |  SELECT 'hier' AS layout, bucket FROM hier),
         |mass AS (SELECT layout, bucket, CAST(COUNT(*) AS BIGINT) AS mass
         |         FROM lay GROUP BY 1, 2)
         |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(mass) AS BIGINT) AS n_rows,
         |  MIN(mass) AS min_mass, MAX(mass) AS max_mass,
         |  CAST(SUM(mass) // COUNT(*) AS BIGINT) AS mean_mass,
         |  CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT) AS max_share_ppm
         |FROM mass GROUP BY 1""".stripMargin,
    // one within-cell Lloyd step replayed exactly: integer-mean
    // centroids (floor-div, negative-corrected), float reconversion,
    // two-level re-routing against the updated matrix, skew + movement
    "q259_ann_hier_rebalance" ->
      s"""$hierAssignCtes,
         |$hierRebalanceCtes,
         |mass AS (SELECT bucket_new, CAST(COUNT(*) AS BIGINT) AS mass
         |         FROM re GROUP BY 1),
         |mv AS (SELECT CAST(SUM(CASE WHEN bucket_old <> bucket_new THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_moved FROM re)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(mass) AS BIGINT) AS n_rows,
         |  MIN(mass) AS min_mass, MAX(mass) AS max_mass,
         |  CAST(SUM(mass) // COUNT(*) AS BIGINT) AS mean_mass,
         |  CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT) AS max_share_ppm,
         |  (SELECT n_moved FROM mv) AS n_moved,
         |  CAST((SELECT n_moved FROM mv) * 1000000 // SUM(mass) AS BIGINT)
         |    AS moved_ppm
         |FROM mass""".stripMargin,
    // the rebalanced artifact's committed membership witnesses + knobs:
    // the q256 panel over q259's routing, replayed from the raw corpus
    "q260_ann_hier_rebalanced_commit" ->
      s"""$hierAssignCtes,
         |$hierRebalanceCtes
         |SELECT bucket_new AS bucket, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(vec_id) AS vec_xor,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nl) AS nlist,
         |  (SELECT ncoarse FROM nc) AS ncoarse,
         |  (SELECT GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT))
         |   FROM nc) AS cprobe,
         |  (SELECT GREATEST(1,
         |     GREATEST(${graft.operators.Similarity.IvfNprobe},
         |       CAST(ROUND(SQRT(nlist)) AS BIGINT))
         |     // GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT)))
         |   FROM nl, nc) AS percell
         |FROM re GROUP BY 1""".stripMargin,
    // the hier search against the REBALANCED model: same two-level
    // probe discipline, fine selection over the updated centroids,
    // candidates = rows in the re-routed buckets
    "q261_ann_hier_rebalanced_serve" ->
      s"""$hierAssignCtes,
         |$hierRebalanceCtes,
         |$hierSearchCtes,
         |fsel2 AS (SELECT q_id, q_emb, n_q, f_id AS bucket FROM (
         |    SELECT p.q_id, p.q_emb, p.n_q, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.q_id, p.cell
         |        ORDER BY ${dotSql("f.f_emb", "p.q_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM qpr p JOIN fnew f ON f.cell = p.cell) t
         |  WHERE rk <= (SELECT percell FROM nh)),
         |hcand2 AS (
         |  SELECT p.q_id, r.vec_id, p.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM re r JOIN e ON e.vec_id = r.vec_id
         |  JOIN fsel2 p ON r.bucket_new = p.bucket
         |  WHERE r.vec_id <> p.q_id),
         |hres2 AS (SELECT q_id, vec_id,
         |    CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE))))
         |      AS BIGINT) AS cos_ppm
         |  FROM hcand2)
         |SELECT q_id, neighbor_id, cos_ppm, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |  FROM hres2) t
         |WHERE rank <= 5""".stripMargin,
    // hier-routed search: queries rank the coarse cells, probe the top
    // cprobe, exact cosine re-rank within the probed cells' rows
    "q254_ann_hier_search" ->
      s"""$hierAssignCtes,
         |$hierSearchCtes
         |SELECT q_id, neighbor_id, cos_ppm, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |  FROM hres) t
         |WHERE rank <= 5""".stripMargin,
    // brute top-5 truth vs the hier-routed and flat derived searches
    "q255_ann_hier_recall" -> {
      val cosRank =
        """ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
          |        CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
          |          (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) DESC,
          |        vec_id ASC) AS rank""".stripMargin
      s"""$hierAssignCtes,
         |$hierSearchCtes,
         |hv AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |    FROM hres) t
         |  WHERE rank <= 5),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |fasg AS (SELECT vec_id, f_id AS bucket FROM (
         |    SELECT e.vec_id, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("f.f_emb", "e.embedding")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM e, fine f) t WHERE rk = 1),
         |fpr AS (SELECT q_id, q_emb, n_q, f_id AS bucket FROM (
         |    SELECT qq.q_id, qq.q_emb, qq.n_q, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY qq.q_id
         |        ORDER BY ${dotSql("f.f_emb", "qq.q_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM qq, fine f) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |fcand AS (
         |  SELECT p.q_id, e.vec_id, p.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM e JOIN fasg a ON e.vec_id = a.vec_id
         |  JOIN fpr p ON a.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |fv AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM fcand) t
         |  WHERE rank <= 5),
         |bfc AS (
         |  SELECT qq.q_id, e.vec_id, qq.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("qq.q_emb", "e.embedding")} AS dot_q
         |  FROM e, qq WHERE e.vec_id <> qq.q_id),
         |bf AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM bfc) t
         |  WHERE rank <= 5)
         |SELECT bf.q_id, CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN hv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_hier_hit,
         |  CAST(SUM(CASE WHEN fv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_flat_hit,
         |  CAST(SUM(CASE WHEN hv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS hier_recall_ppm,
         |  CAST(SUM(CASE WHEN fv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS flat_recall_ppm
         |FROM bf
         |LEFT JOIN hv ON bf.q_id = hv.q_id AND bf.neighbor_id = hv.neighbor_id
         |LEFT JOIN fv ON bf.q_id = fv.q_id AND bf.neighbor_id = fv.neighbor_id
         |GROUP BY 1""".stripMargin
    },
    // the PQ'd rebalanced commit replayed: the Lloyd-step routing
    // (hierRebalanceCtes) carries the member witnesses, the full-corpus
    // √(N/4) codebook argmins the code witnesses, all knobs re-derived
    "q262_ann_hierpq_index_commit" -> hierPqCommitOracleSql(pqCodeCtes),
    // q275: the IDENTICAL commit replay at the capped width — only the
    // kk derivation differs, so routing/commit drift is impossible
    "q275_ann_hierpq_capped_commit" ->
      hierPqCommitOracleSql(pqCappedCodeCtes),
    // the two-level ADC serve replayed: rebalanced fine selection
    // (fsel2, the q261 probe discipline over fnew), candidates = the
    // re-routed membership's code rows, ADC = 8 LUT sums per candidate
    "q263_ann_hierpq_adc_serve" -> hierPqServeOracleSql(pqCodeCtes),
    // q276: the IDENTICAL serve replay at the capped width — the
    // constant-LUT production serve under the same hash discipline
    "q276_ann_hierpq_capped_serve" ->
      hierPqServeOracleSql(pqCappedCodeCtes),
    // brute top-5 truth vs flat derived, seed-hier, and REBALANCED
    // layouts — q255's panel widened to the third column
    "q264_ann_recall_threeway" -> {
      val cosRank =
        """ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
          |        CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
          |          (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) DESC,
          |        vec_id ASC) AS rank""".stripMargin
      s"""$hierAssignCtes,
         |$hierRebalanceCtes,
         |$hierSearchCtes,
         |hv AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |    FROM hres) t
         |  WHERE rank <= 5),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |fasg AS (SELECT vec_id, f_id AS bucket FROM (
         |    SELECT e.vec_id, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("f.f_emb", "e.embedding")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM e, fine f) t WHERE rk = 1),
         |fpr AS (SELECT q_id, q_emb, n_q, f_id AS bucket FROM (
         |    SELECT qq.q_id, qq.q_emb, qq.n_q, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY qq.q_id
         |        ORDER BY ${dotSql("f.f_emb", "qq.q_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM qq, fine f) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |fcand AS (
         |  SELECT p.q_id, e.vec_id, p.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM e JOIN fasg a ON e.vec_id = a.vec_id
         |  JOIN fpr p ON a.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |fv AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM fcand) t
         |  WHERE rank <= 5),
         |fsel2 AS (SELECT q_id, q_emb, n_q, f_id AS bucket FROM (
         |    SELECT p.q_id, p.q_emb, p.n_q, f.f_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.q_id, p.cell
         |        ORDER BY ${dotSql("f.f_emb", "p.q_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM qpr p JOIN fnew f ON f.cell = p.cell) t
         |  WHERE rk <= (SELECT percell FROM nh)),
         |hcand2 AS (
         |  SELECT p.q_id, r.vec_id, p.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM re r JOIN e ON e.vec_id = r.vec_id
         |  JOIN fsel2 p ON r.bucket_new = p.bucket
         |  WHERE r.vec_id <> p.q_id),
         |rv AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM hcand2) t
         |  WHERE rank <= 5),
         |bfc AS (
         |  SELECT qq.q_id, e.vec_id, qq.n_q,
         |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
         |    ${dotSql("qq.q_emb", "e.embedding")} AS dot_q
         |  FROM e, qq WHERE e.vec_id <> qq.q_id),
         |bf AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q_id, vec_id,
         |      $cosRank
         |    FROM bfc) t
         |  WHERE rank <= 5)
         |SELECT bf.q_id, CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN fv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_flat_hit,
         |  CAST(SUM(CASE WHEN hv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_hier_hit,
         |  CAST(SUM(CASE WHEN rv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_rebal_hit,
         |  CAST(SUM(CASE WHEN fv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS flat_recall_ppm,
         |  CAST(SUM(CASE WHEN hv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS hier_recall_ppm,
         |  CAST(SUM(CASE WHEN rv.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS rebal_recall_ppm
         |FROM bf
         |LEFT JOIN fv ON bf.q_id = fv.q_id AND bf.neighbor_id = fv.neighbor_id
         |LEFT JOIN hv ON bf.q_id = hv.q_id AND bf.neighbor_id = hv.neighbor_id
         |LEFT JOIN rv ON bf.q_id = rv.q_id AND bf.neighbor_id = rv.neighbor_id
         |GROUP BY 1""".stripMargin
    },
    // the q226 outlier screen over the TWO-LEVEL routing — same
    // bottom-5% window algebra, hier membership; bucket −1 (empty
    // cell) drops via the centroid join exactly as the engine's
    "q265_ann_outliers_hier" -> {
      import graft.operators.Similarity.OutlierDenom
      s"""$hierAssignCtes,
         |sc AS (SELECT h.vec_id, h.bucket,
         |    CAST(floor(CAST(${dotSql("e.embedding", "f.f_emb")} AS DOUBLE)
         |      * 1000000.0 /
         |      (sqrt(CAST(${dotSql("e.embedding", "e.embedding")} AS DOUBLE)) *
         |      sqrt(CAST(${dotSql("f.f_emb", "f.f_emb")} AS DOUBLE))))
         |      AS BIGINT) AS cos_ppm
         |  FROM hier h JOIN e ON h.vec_id = e.vec_id
         |  JOIN fine f ON h.bucket = f.f_id),
         |rk AS (SELECT bucket, vec_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket
         |      ORDER BY cos_ppm ASC, vec_id ASC) AS INT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_bucket
         |  FROM sc)
         |SELECT bucket, vec_id, cos_ppm, rn, n_bucket FROM rk
         |WHERE rn * $OutlierDenom <= n_bucket""".stripMargin
    },
    // the q229 reliability panel over the TWO-LEVEL-routed 1-NN
    // relation — the SAME shared pair CTEs, assignment swapped to hier
    "q266_ann_calibration_hier" -> {
      import graft.operators.Similarity.CalibBinPpm
      s"""$hierAssignCtes,
         |en AS (SELECT vec_id, embedding,
         |  ${dotSql("embedding", "embedding")} AS n_emb FROM e),
         |${knnNn1CtesOver("en", "hier")},
         |nn AS (SELECT * FROM p WHERE rk = 1),
         |b AS (SELECT (cos_ppm + 1000000) // $CalibBinPpm AS bin,
         |    CASE WHEN label_true = label_pred THEN 1 ELSE 0 END AS correct,
         |    cos_ppm FROM nn)
         |SELECT CAST(bin * $CalibBinPpm - 1000000 AS BIGINT) AS bin_lo_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(correct) AS BIGINT) AS n_correct,
         |  CAST(SUM(correct) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm,
         |  CAST(SUM(cos_ppm) // COUNT(*) AS BIGINT) AS mean_cos_ppm
         |FROM b GROUP BY bin""".stripMargin
    },
    // the hier refresh policy replayed: base-seeded two-level routing
    // carries the noop witness (base rows) and ingest witness (full
    // corpus), its Lloyd step the rebalance witness, the full-corpus
    // seed routing (hierAssignCtes' hier) the rebuild witness; skews
    // and decisions are the same algebra the engine executes
    "q267_ann_hier_refresh" ->
      s"""$hierAssignCtes,
         |$hierRebalanceCtes,
         |$hierBaseCtes,
         |hb_base AS (SELECT h.vec_id, h.bucket FROM hierb h
         |            JOIN hbt USING (vec_id) WHERE hbt.hb < 900000),
         |sumsb AS (SELECT h.bucket, pp.pos,
         |    CAST(SUM(qv.qe[pp.pos]) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM hierb h JOIN qv USING (vec_id), pp
         |  WHERE h.bucket >= 0 GROUP BY 1, 2),
         |mqb AS (SELECT bucket, pos,
         |    CAST((s // n) - (CASE WHEN s % n <> 0 AND s < 0 THEN 1 ELSE 0
         |      END) AS BIGINT) AS mean_q FROM sumsb),
         |newcb AS (SELECT bucket AS f_id,
         |    list(CAST(mean_q / 1000000.0 AS FLOAT) ORDER BY pos) AS new_emb
         |  FROM mqb GROUP BY 1),
         |fnewb AS (SELECT fc.f_id, fc.cell,
         |    COALESCE(n.new_emb, fc.f_emb) AS f_emb
         |  FROM fcellb fc LEFT JOIN newcb n ON n.f_id = fc.f_id),
         |reb AS (SELECT vec_id, COALESCE(bucket, -1) AS bucket_new FROM (
         |    SELECT r.vec_id, f.f_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
         |        ORDER BY ${dotSql("r.embedding", "f.f_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM rcellb r LEFT JOIN fnewb f ON f.cell = r.cell) t
         |  WHERE rk = 1),
         |wnoop AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets FROM hb_base),
         |wingest AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets FROM hierb),
         |wrebal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket_new) AS BIGINT) AS n_buckets FROM reb),
         |wrebuild AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets FROM hier),
         |skb AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket, COUNT(*) AS mass FROM hb_base
         |                  GROUP BY 1) t),
         |skf AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket, COUNT(*) AS mass FROM hierb
         |                  GROUP BY 1) t),
         |skr AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket_new, COUNT(*) AS mass FROM reb
         |                  GROUP BY 1) t),
         |g AS (SELECT CAST((SELECT COUNT(*) FROM hbt WHERE hb >= 900000)
         |    * 1000000 // (SELECT COUNT(*) FROM bse) AS BIGINT) AS growth_ppm),
         |sc4 AS (SELECT * FROM (VALUES
         |    ('fresh', CAST(200000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)),
         |    ('stale', CAST(50000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)),
         |    ('hot', CAST(50000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(0 AS BIGINT)),
         |    ('drift', CAST(10000 AS BIGINT), CAST(50000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)))
         |  AS t(scenario, low_ppm, high_ppm, skew_cap_ppm)),
         |pre AS (SELECT sc4.scenario,
         |    CASE sc4.scenario WHEN 'fresh' THEN (SELECT skew FROM skb)
         |      WHEN 'stale' THEN (SELECT skew FROM skb)
         |      WHEN 'hot' THEN (SELECT skew FROM skf)
         |      ELSE (SELECT skew FROM skr) END AS skew_pre
         |  FROM sc4)
         |SELECT sc4.scenario,
         |  CASE WHEN g.growth_ppm < sc4.low_ppm THEN 'noop'
         |    WHEN g.growth_ppm >= sc4.high_ppm THEN 'rebuild'
         |    WHEN pre.skew_pre > sc4.skew_cap_ppm THEN 'rebalance'
         |    ELSE 'ingest' END AS decision,
         |  g.growth_ppm, sc4.low_ppm, sc4.high_ppm, sc4.skew_cap_ppm,
         |  pre.skew_pre AS skew_pre_ppm,
         |  w.n_members, w.vec_xor, w.n_buckets,
         |  CASE WHEN sc4.scenario = 'drift' THEN (SELECT nlist FROM nl)
         |    ELSE (SELECT nlist FROM nlb) END AS nlist,
         |  CASE WHEN sc4.scenario = 'drift' THEN (SELECT ncoarse FROM nc)
         |    ELSE (SELECT ncoarse FROM ncb) END AS ncoarse
         |FROM sc4 JOIN pre USING (scenario), g,
         |  LATERAL (SELECT w1.* FROM wnoop w1 WHERE sc4.scenario = 'fresh'
         |    UNION ALL SELECT w2.* FROM wingest w2 WHERE sc4.scenario = 'stale'
         |    UNION ALL SELECT w3.* FROM wrebal w3 WHERE sc4.scenario = 'hot'
         |    UNION ALL SELECT w4.* FROM wrebuild w4 WHERE sc4.scenario = 'drift')
         |    w""".stripMargin,
    // append-mode ingest replayed: arrivals/touched per wave off the
    // base(<0.7)-seeded assignment (the q250 algebra), rows appended =
    // arrivals (waves are disjoint), file counts from the structural
    // one-file-per-touch law (base contributes 1, each touching wave
    // 1), compaction when the count exceeds the bound (with 3 waves and
    // bound 3, reachable only at wave 3: base + 3 touches = 4 — no
    // earlier compaction can fire, so the cumulative formula is exact)
    "q268_ann_index_append_ingest" -> {
      val maxFiles = graft.operators.AnnIndex.CompactFilesMax
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 700000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM base),
         |bcents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, bcents c) t
         |  WHERE rk = 1),
         |j AS (SELECT asg.vec_id, asg.bucket, hbt.hb
         |      FROM asg JOIN hbt USING (vec_id)),
         |wv AS (SELECT * FROM (VALUES
         |    (CAST(1 AS BIGINT), CAST(700000 AS BIGINT), CAST(800000 AS BIGINT)),
         |    (CAST(2 AS BIGINT), CAST(800000 AS BIGINT), CAST(900000 AS BIGINT)),
         |    (CAST(3 AS BIGINT), CAST(900000 AS BIGINT), CAST(1000000 AS BIGINT)))
         |  AS t(w, lo, hi)),
         |aw AS (SELECT wv.w, j.vec_id, j.bucket
         |       FROM wv JOIN j ON j.hb >= wv.lo AND j.hb < wv.hi),
         |arrc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_arrivals
         |         FROM aw GROUP BY 1),
         |tb AS (SELECT DISTINCT w, bucket FROM aw),
         |tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_touched
         |       FROM tb GROUP BY 1),
         |basep AS (SELECT DISTINCT bucket FROM j WHERE hb < 700000),
         |cum AS (SELECT w1.w, t.bucket,
         |    CAST(COUNT(DISTINCT t.w) AS BIGINT) AS touches
         |  FROM wv w1 JOIN tb t ON t.w <= w1.w GROUP BY 1, 2),
         |f AS (SELECT cum.w, cum.bucket, cum.touches +
         |    (CASE WHEN bp.bucket IS NOT NULL THEN 1 ELSE 0 END) AS files
         |  FROM cum LEFT JOIN basep bp ON bp.bucket = cum.bucket),
         |comp AS (SELECT w, bucket FROM f WHERE files > $maxFiles),
         |compc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_compact
         |          FROM comp GROUP BY 1),
         |comprows AS (SELECT c.w, CAST(COUNT(*) AS BIGINT) AS rows_compacted
         |  FROM comp c JOIN wv ON wv.w = c.w
         |  JOIN j ON j.bucket = c.bucket AND j.hb < wv.hi
         |  GROUP BY 1),
         |mf AS (SELECT w, CAST(MAX(CASE WHEN files > $maxFiles THEN 1
         |    ELSE files END) AS BIGINT) AS mx FROM f GROUP BY 1),
         |tot AS (SELECT wv.w, CAST(COUNT(*) AS BIGINT) AS n_total
         |        FROM wv JOIN j ON j.hb < wv.hi GROUP BY 1)
         |SELECT wv.w AS wave,
         |  COALESCE(arrc.n_arrivals, 0) AS n_arrivals,
         |  COALESCE(tc.n_touched, 0) AS n_touched,
         |  COALESCE(arrc.n_arrivals, 0) AS rows_appended,
         |  COALESCE(compc.n_compact, 0) AS n_compact_buckets,
         |  COALESCE(comprows.rows_compacted, 0) AS rows_compacted,
         |  CASE WHEN COALESCE(arrc.n_arrivals, 0) = 0 THEN 0
         |    ELSE (arrc.n_arrivals + COALESCE(comprows.rows_compacted, 0))
         |      * 1000000 // arrc.n_arrivals END AS write_amp_ppm,
         |  GREATEST(COALESCE(mf.mx, 1), 1) AS max_files_bucket,
         |  tot.n_total
         |FROM wv
         |LEFT JOIN arrc USING (w)
         |LEFT JOIN tc USING (w)
         |LEFT JOIN compc USING (w)
         |LEFT JOIN comprows USING (w)
         |LEFT JOIN mf USING (w)
         |JOIN tot USING (w)""".stripMargin
    },
    // the hier-PQ incremental commit replayed from the raw corpus: the
    // base(<0.9) split derives the two-level + PQ knobs and seeds both
    // models positionally (q248's non-dense-id discipline), the full
    // corpus routed under the base model IS base-build ∪ delta-ingest
    // (q267's hierb chain), and the positional code argmin under the
    // base codebook IS base-coding ∪ delta-coding — a dropped delta, a
    // clobbered untouched bucket, a wrong-model routing, a
    // wrong-codebook coding, or a knob drift breaks the hash
    "q269_ann_hierpq_ingest" -> hierPqIngestOracleSql(900000L),
    // q274: the IDENTICAL replay at the ≥0.999 sparse split — the
    // 5-minute-cadence delta shape (touched buckets ≪ nlist); only
    // the split constant differs, so the two chains cannot drift
    "q274_ann_hierpq_sparse_tick" -> hierPqIngestOracleSql(999000L)) ++
    oracleSqlAppendTail

  /** The q269/q274 oracle chain at a parameterized split: full-corpus
    * routing under the base model (base-build ∪ delta-ingest ≡ that)
    * plus the positional code argmin under the base codebook.
    */
  private def hierPqIngestOracleSql(splitPpm: Long): String = {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |${hierBaseCtesAt(splitPpm)},
         |kb AS (SELECT GREATEST($PqK,
         |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k FROM bse),
         |cpb AS (SELECT GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT))
         |        AS cprobe FROM ncb),
         |phb AS (SELECT GREATEST(1,
         |    GREATEST(${graft.operators.Similarity.IvfNprobe},
         |      CAST(ROUND(SQRT(nlist)) AS BIGINT)) // cprobe) AS percell
         |  FROM nlb, cpb),
         |qvq AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM e),
         |-- codes are POSITIONAL (0..k−1, codebook rows in base-id
         |-- order): base ids are not dense, so position ≠ original id
         |cbb AS (SELECT cpos, cq FROM (
         |    SELECT q.qe AS cq,
         |      ROW_NUMBER() OVER (ORDER BY q.vec_id) - 1 AS cpos
         |    FROM qvq q JOIN bse USING (vec_id)) t, kb
         |  WHERE cpos < kb.k),
         |db AS (SELECT q.vec_id, c.cpos,
         |      CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos]))
         |        AS dist
         |    FROM qvq q, cbb c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim}))
         |       AS pos) p
         |    GROUP BY 1, 2, 3),
         |codeb AS (SELECT vec_id, m, cpos AS code FROM (
         |    SELECT vec_id, m, cpos,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cpos)
         |        AS rn
         |    FROM db) t
         |  WHERE rn = 1),
         |cmb AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
         |        FROM codeb GROUP BY 1)
         |SELECT h.bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(h.vec_id) AS vec_xor,
         |  CAST(COUNT(*) AS BIGINT) AS n_codes,
         |  CAST(SUM(cmb.mass) AS BIGINT) AS code_mass,
         |  CAST(SUM(CASE WHEN hbt.hb >= $splitPpm THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_arrived,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nlb) AS nlist,
         |  (SELECT ncoarse FROM ncb) AS ncoarse,
         |  (SELECT cprobe FROM cpb) AS cprobe,
         |  (SELECT percell FROM phb) AS percell,
         |  (SELECT k FROM kb) AS k
         |FROM hierb h JOIN hbt USING (vec_id) JOIN cmb USING (vec_id)
         |GROUP BY 1""".stripMargin
  }

  private lazy val oracleSqlAppendTail: Map[String, String] = Map(
    // q268's replay extended to the codes table: code appends/compaction
    // follow the members' law exactly (the tables advance together), and
    // the per-wave cumulative code mass is the positional argmin under
    // the base(<0.7) codebook over every committed row — a wave that
    // skips codes, double-appends, or codes with the wrong codebook
    // breaks the hash
    "q270_ann_index_append_codes" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      val maxFiles = graft.operators.AnnIndex.CompactFilesMax
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 700000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist,
         |    GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |  FROM base),
         |bcents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, bcents c) t
         |  WHERE rk = 1),
         |j AS (SELECT asg.vec_id, asg.bucket, hbt.hb
         |      FROM asg JOIN hbt USING (vec_id)),
         |qq AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |cb AS (SELECT cpos, cq FROM (
         |    SELECT q.qe AS cq,
         |      ROW_NUMBER() OVER (ORDER BY q.vec_id) - 1 AS cpos
         |    FROM qq q JOIN base USING (vec_id)) t, nb
         |  WHERE cpos < nb.k),
         |d AS (SELECT q.vec_id, c.cpos,
         |      CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos]))
         |        AS dist
         |    FROM qq q, cb c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim}))
         |       AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, cpos AS code FROM (
         |    SELECT vec_id, m, cpos,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cpos)
         |        AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |cm AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
         |       FROM code GROUP BY 1),
         |wv AS (SELECT * FROM (VALUES
         |    (CAST(1 AS BIGINT), CAST(700000 AS BIGINT), CAST(800000 AS BIGINT)),
         |    (CAST(2 AS BIGINT), CAST(800000 AS BIGINT), CAST(900000 AS BIGINT)),
         |    (CAST(3 AS BIGINT), CAST(900000 AS BIGINT), CAST(1000000 AS BIGINT)))
         |  AS t(w, lo, hi)),
         |aw AS (SELECT wv.w, j.vec_id, j.bucket
         |       FROM wv JOIN j ON j.hb >= wv.lo AND j.hb < wv.hi),
         |arrc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_arrivals
         |         FROM aw GROUP BY 1),
         |tb AS (SELECT DISTINCT w, bucket FROM aw),
         |tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_touched
         |       FROM tb GROUP BY 1),
         |basep AS (SELECT DISTINCT bucket FROM j WHERE hb < 700000),
         |cum AS (SELECT w1.w, t.bucket,
         |    CAST(COUNT(DISTINCT t.w) AS BIGINT) AS touches
         |  FROM wv w1 JOIN tb t ON t.w <= w1.w GROUP BY 1, 2),
         |f AS (SELECT cum.w, cum.bucket, cum.touches +
         |    (CASE WHEN bp.bucket IS NOT NULL THEN 1 ELSE 0 END) AS files
         |  FROM cum LEFT JOIN basep bp ON bp.bucket = cum.bucket),
         |comp AS (SELECT w, bucket FROM f WHERE files > $maxFiles),
         |compc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_compact
         |          FROM comp GROUP BY 1),
         |comprows AS (SELECT c.w, CAST(COUNT(*) AS BIGINT) AS rows_compacted
         |  FROM comp c JOIN wv ON wv.w = c.w
         |  JOIN j ON j.bucket = c.bucket AND j.hb < wv.hi
         |  GROUP BY 1),
         |mf AS (SELECT w, CAST(MAX(CASE WHEN files > $maxFiles THEN 1
         |    ELSE files END) AS BIGINT) AS mx FROM f GROUP BY 1),
         |cmw AS (SELECT wv.w, CAST(SUM(cm.mass) AS BIGINT) AS code_mass_total
         |  FROM wv JOIN hbt ON hbt.hb < wv.hi JOIN cm USING (vec_id)
         |  GROUP BY 1),
         |tot AS (SELECT wv.w, CAST(COUNT(*) AS BIGINT) AS n_total
         |        FROM wv JOIN j ON j.hb < wv.hi GROUP BY 1)
         |SELECT wv.w AS wave,
         |  COALESCE(arrc.n_arrivals, 0) AS n_arrivals,
         |  COALESCE(tc.n_touched, 0) AS n_touched,
         |  COALESCE(arrc.n_arrivals, 0) AS rows_appended,
         |  COALESCE(arrc.n_arrivals, 0) AS code_rows_appended,
         |  COALESCE(compc.n_compact, 0) AS n_compact_buckets,
         |  COALESCE(comprows.rows_compacted, 0) AS rows_compacted,
         |  COALESCE(comprows.rows_compacted, 0) AS code_rows_compacted,
         |  CASE WHEN COALESCE(arrc.n_arrivals, 0) = 0 THEN 0
         |    ELSE (arrc.n_arrivals + COALESCE(comprows.rows_compacted, 0))
         |      * 1000000 // arrc.n_arrivals END AS write_amp_ppm,
         |  CASE WHEN COALESCE(arrc.n_arrivals, 0) = 0 THEN 0
         |    ELSE (arrc.n_arrivals + COALESCE(comprows.rows_compacted, 0))
         |      * 1000000 // arrc.n_arrivals END AS code_write_amp_ppm,
         |  GREATEST(COALESCE(mf.mx, 1), 1) AS max_files_bucket,
         |  GREATEST(COALESCE(mf.mx, 1), 1) AS max_code_files_bucket,
         |  cmw.code_mass_total,
         |  tot.n_total
         |FROM wv
         |LEFT JOIN arrc USING (w)
         |LEFT JOIN tc USING (w)
         |LEFT JOIN compc USING (w)
         |LEFT JOIN comprows USING (w)
         |LEFT JOIN mf USING (w)
         |JOIN cmw USING (w)
         |JOIN tot USING (w)""".stripMargin
    },
    // the streaming append twin's FINAL committed state replayed per
    // bucket: membership/codes/mass off the base(<0.7)-seeded
    // assignment + positional coding, and BOTH tables' file counts off
    // the structural law — base contributes one file, each touching
    // wave one more, a bucket reaching CompactFilesMax+1 at its last
    // touch compacts back to one (order-free because compaction is
    // first reachable at the final touching batch)
    "q271_ann_index_append_stream" -> {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      val maxFiles = graft.operators.AnnIndex.CompactFilesMax
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |hbt AS (SELECT vec_id,
         |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS hb FROM embeddings),
         |base AS (SELECT emb.vec_id, emb.embedding
         |         FROM emb JOIN hbt USING (vec_id) WHERE hbt.hb < 700000),
         |nb AS (SELECT
         |    GREATEST(${graft.operators.Similarity.IvfNlist},
         |      CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist,
         |    GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |  FROM base),
         |bcents AS (SELECT c_id, c_emb FROM (
         |    SELECT vec_id AS c_id, embedding AS c_emb,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM base) t, nb
         |  WHERE rn <= nb.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC)
         |        AS rk
         |    FROM emb e, bcents c) t
         |  WHERE rk = 1),
         |j AS (SELECT asg.vec_id, asg.bucket, hbt.hb
         |      FROM asg JOIN hbt USING (vec_id)),
         |qq AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |cb AS (SELECT cpos, cq FROM (
         |    SELECT q.qe AS cq,
         |      ROW_NUMBER() OVER (ORDER BY q.vec_id) - 1 AS cpos
         |    FROM qq q JOIN base USING (vec_id)) t, nb
         |  WHERE cpos < nb.k),
         |d AS (SELECT q.vec_id, c.cpos,
         |      CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos]))
         |        AS dist
         |    FROM qq q, cb c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim}))
         |       AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, cpos AS code FROM (
         |    SELECT vec_id, m, cpos,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cpos)
         |        AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |cm AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
         |       FROM code GROUP BY 1),
         |wv AS (SELECT * FROM (VALUES
         |    (CAST(1 AS BIGINT), CAST(700000 AS BIGINT), CAST(800000 AS BIGINT)),
         |    (CAST(2 AS BIGINT), CAST(800000 AS BIGINT), CAST(900000 AS BIGINT)),
         |    (CAST(3 AS BIGINT), CAST(900000 AS BIGINT), CAST(1000000 AS BIGINT)))
         |  AS t(w, lo, hi)),
         |tpb AS (SELECT bucket, CAST(COUNT(DISTINCT wv.w) AS BIGINT) AS touches
         |  FROM j JOIN wv ON j.hb >= wv.lo AND j.hb < wv.hi GROUP BY 1),
         |basep AS (SELECT DISTINCT bucket FROM j WHERE hb < 700000),
         |fl AS (SELECT b.bucket,
         |    (CASE WHEN bp.bucket IS NOT NULL THEN 1 ELSE 0 END) +
         |      COALESCE(t.touches, 0) AS raw
         |  FROM (SELECT DISTINCT bucket FROM j) b
         |  LEFT JOIN basep bp ON bp.bucket = b.bucket
         |  LEFT JOIN tpb t ON t.bucket = b.bucket),
         |files AS (SELECT bucket,
         |    CAST(CASE WHEN raw > $maxFiles THEN 1 ELSE raw END AS BIGINT)
         |      AS nf
         |  FROM fl)
         |SELECT j.bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  bit_xor(j.vec_id) AS vec_xor,
         |  CAST(COUNT(*) AS BIGINT) AS n_codes,
         |  CAST(SUM(cm.mass) AS BIGINT) AS code_mass,
         |  CAST(SUM(CASE WHEN j.hb >= 700000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_arrived,
         |  MAX(files.nf) AS files_members,
         |  MAX(files.nf) AS files_codes,
         |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
         |    AS index_version,
         |  (SELECT nlist FROM nb) AS nlist,
         |  (SELECT k FROM nb) AS k
         |FROM j JOIN cm USING (vec_id) JOIN files ON files.bucket = j.bucket
         |GROUP BY 1""".stripMargin
    },
    // q107's coding replay at the CAPPED codebook width — the cap
    // derivation (LEAST of the √(N/4) law and PqKCap) is itself under
    // the gate via the frozen k column
    "q272_ann_pq_codes_capped" -> {
      import graft.operators.Similarity.{PqKCap, PqKCapFloor, PqSubDim, PqSubspaces}
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |kk AS (SELECT LEAST(GREATEST($PqKCapFloor,
         |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)), $PqKCap) AS k
         |  FROM q),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q, kk WHERE vec_id < kk.k),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |r AS (SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d)
         |SELECT m AS subspace, c_id AS code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  (SELECT k FROM kk) AS k
         |FROM r WHERE rn = 1
         |GROUP BY 1, 2""".stripMargin
    },
    // brute truth vs derived-k ADC vs capped-k ADC, replayed end to end
    // at BOTH codebook widths (shared corpus/probe CTEs, two code
    // chains) — the recall price of the cap is the graded number
    "q273_ann_adc_recall_capped" -> {
      import graft.operators.Similarity.{PqK, PqKCap, PqKCapFloor}
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist
         |       FROM e),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |qq AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |    ${dotSql("embedding", "embedding")} AS n_q
         |  FROM e WHERE vec_id % 100 = 0),
         |bf AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        CAST(floor(CAST(${dotSql("q.q_emb", "e.embedding")} AS DOUBLE)
         |          * 1000000.0 / (sqrt(CAST(q.n_q AS DOUBLE)) *
         |          sqrt(CAST(${dotSql("e.embedding", "e.embedding")} AS DOUBLE))))
         |          AS BIGINT) DESC,
         |        e.vec_id ASC) AS rank
         |    FROM e, qq q WHERE e.vec_id <> q.q_id) t
         |  WHERE rank <= 5),
         |probes AS (
         |  SELECT q_id, c_id AS bucket FROM (
         |    SELECT q.q_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM qq q, cents c) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |${adcTopCtes("f",
             s"""kkf AS (SELECT GREATEST($PqK,
                |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k FROM q)""".stripMargin)},
         |${adcTopCtes("c",
             s"""kkc AS (SELECT LEAST(GREATEST($PqKCapFloor,
                |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)), $PqKCap) AS k
                |  FROM q)""".stripMargin)}
         |SELECT bf.q_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN tf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_fullk_hit,
         |  CAST(SUM(CASE WHEN tc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_capk_hit,
         |  CAST(SUM(CASE WHEN tf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS fullk_recall_ppm,
         |  CAST(SUM(CASE WHEN tc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS capk_recall_ppm
         |FROM bf
         |LEFT JOIN topf tf ON tf.q_id = bf.q_id
         |  AND tf.neighbor_id = bf.neighbor_id
         |LEFT JOIN topc tc ON tc.q_id = bf.q_id
         |  AND tc.neighbor_id = bf.neighbor_id
         |GROUP BY 1""".stripMargin
    },
    // q277: the q273 chain swept over FIXED widths — same prefix
    // (brute truth, probes, assignment), one adcTopCtes chain per k,
    // one aggregate row per k; the recall knee is the measurement
    // PqKCap is pinned to
    "q277_ann_pq_width_sweep" -> {
      val chains = graft.operators.Similarity.SweepPqKs.map(k =>
        adcTopCtes(s"w$k",
          s"kkw$k AS (SELECT CAST($k AS BIGINT) AS k)")).mkString(",\n")
      val points = graft.operators.Similarity.SweepPqKs.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  CAST(COUNT(*) AS BIGINT) AS n_true,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) AS n_hits,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0
           |    END) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
           |FROM bf LEFT JOIN topw$k t ON t.q_id = bf.q_id
           |  AND t.neighbor_id = bf.neighbor_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist
         |       FROM e),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |qq AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |    ${dotSql("embedding", "embedding")} AS n_q
         |  FROM e WHERE vec_id % 100 = 0),
         |bf AS (SELECT q_id, vec_id AS neighbor_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        CAST(floor(CAST(${dotSql("q.q_emb", "e.embedding")} AS DOUBLE)
         |          * 1000000.0 / (sqrt(CAST(q.n_q AS DOUBLE)) *
         |          sqrt(CAST(${dotSql("e.embedding", "e.embedding")} AS DOUBLE))))
         |          AS BIGINT) DESC,
         |        e.vec_id ASC) AS rank
         |    FROM e, qq q WHERE e.vec_id <> q.q_id) t
         |  WHERE rank <= 5),
         |probes AS (
         |  SELECT q_id, c_id AS bucket FROM (
         |    SELECT q.q_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM qq q, cents c) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |$chains
         |$points""".stripMargin
    },
    // q278: q267's four-arm replay over the CODE-CARRYING lifecycle —
    // both capped codebooks (base-split positional and full-corpus
    // positional) replayed beside the routing witnesses, masses per
    // arm (rebalance re-keys, never recodes: mass must equal the
    // ingest state's), the drift arm's width = the full-corpus cap
    "q278_ann_hierpq_refresh_capped" -> {
      import graft.operators.Similarity.{PqKCap, PqKCapFloor, PqSubDim, PqSubspaces}
      def codeChain(sfx: String, kName: String, seedRel: String): String =
        s"""cb$sfx AS (SELECT cpos, cq FROM (
           |    SELECT q.qe AS cq,
           |      ROW_NUMBER() OVER (ORDER BY q.vec_id) - 1 AS cpos
           |    FROM qv q JOIN $seedRel USING (vec_id)) t, $kName
           |  WHERE cpos < $kName.k),
           |d$sfx AS (SELECT q.vec_id, c.cpos,
           |      CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
           |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos]))
           |        AS dist
           |    FROM qv q, cb$sfx c,
           |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim}))
           |       AS pos) p
           |    GROUP BY 1, 2, 3),
           |cm$sfx AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass FROM (
           |    SELECT vec_id, m, cpos AS code FROM (
           |      SELECT vec_id, m, cpos,
           |        ROW_NUMBER() OVER (PARTITION BY vec_id, m
           |          ORDER BY dist, cpos) AS rn
           |      FROM d$sfx) t
           |    WHERE rn = 1) u GROUP BY 1)""".stripMargin
      val kbCte =
        s"""kbc AS (SELECT LEAST(GREATEST($PqKCapFloor,
           |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)), $PqKCap) AS k
           |  FROM bse)""".stripMargin
      val kfCte =
        s"""kfc AS (SELECT LEAST(GREATEST($PqKCapFloor,
           |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)), $PqKCap) AS k
           |  FROM e)""".stripMargin
      s"""$hierAssignCtes,
         |$hierRebalanceCtes,
         |$hierBaseCtes,
         |$kbCte,
         |$kfCte,
         |${codeChain("b2", "kbc", "bse")},
         |${codeChain("f2", "kfc", "e")},
         |hb_base AS (SELECT h.vec_id, h.bucket FROM hierb h
         |            JOIN hbt USING (vec_id) WHERE hbt.hb < 900000),
         |sumsb AS (SELECT h.bucket, pp.pos,
         |    CAST(SUM(qv.qe[pp.pos]) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM hierb h JOIN qv USING (vec_id), pp
         |  WHERE h.bucket >= 0 GROUP BY 1, 2),
         |mqb AS (SELECT bucket, pos,
         |    CAST((s // n) - (CASE WHEN s % n <> 0 AND s < 0 THEN 1 ELSE 0
         |      END) AS BIGINT) AS mean_q FROM sumsb),
         |newcb AS (SELECT bucket AS f_id,
         |    list(CAST(mean_q / 1000000.0 AS FLOAT) ORDER BY pos) AS new_emb
         |  FROM mqb GROUP BY 1),
         |fnewb AS (SELECT fc.f_id, fc.cell,
         |    COALESCE(n.new_emb, fc.f_emb) AS f_emb
         |  FROM fcellb fc LEFT JOIN newcb n ON n.f_id = fc.f_id),
         |reb AS (SELECT vec_id, COALESCE(bucket, -1) AS bucket_new FROM (
         |    SELECT r.vec_id, f.f_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
         |        ORDER BY ${dotSql("r.embedding", "f.f_emb")} DESC, f.f_id ASC)
         |        AS rk
         |    FROM rcellb r LEFT JOIN fnewb f ON r.cell = f.cell) t
         |  WHERE rk = 1),
         |mb2 AS (SELECT CAST(SUM(c.mass) AS BIGINT) AS mass
         |        FROM cmb2 c JOIN bse USING (vec_id)),
         |mf2 AS (SELECT CAST(SUM(mass) AS BIGINT) AS mass FROM cmb2),
         |mr2 AS (SELECT CAST(SUM(mass) AS BIGINT) AS mass FROM cmf2),
         |wnoop AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM bse) AS n_codes,
         |    (SELECT mass FROM mb2) AS code_mass FROM hb_base),
         |wingest AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_codes,
         |    (SELECT mass FROM mf2) AS code_mass FROM hierb),
         |wrebal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket_new) AS BIGINT) AS n_buckets,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_codes,
         |    (SELECT mass FROM mf2) AS code_mass FROM reb),
         |wrebuild AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
         |    bit_xor(vec_id) AS vec_xor,
         |    CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_codes,
         |    (SELECT mass FROM mr2) AS code_mass FROM hier),
         |skb AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket, COUNT(*) AS mass FROM hb_base
         |                  GROUP BY 1) t),
         |skf AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket, COUNT(*) AS mass FROM hierb
         |                  GROUP BY 1) t),
         |skr AS (SELECT CAST(MAX(mass) * 1000000 // SUM(mass) AS BIGINT)
         |    AS skew FROM (SELECT bucket_new, COUNT(*) AS mass FROM reb
         |                  GROUP BY 1) t),
         |g AS (SELECT CAST((SELECT COUNT(*) FROM hbt WHERE hb >= 900000)
         |    * 1000000 // (SELECT COUNT(*) FROM bse) AS BIGINT) AS growth_ppm),
         |sc4 AS (SELECT * FROM (VALUES
         |    ('fresh', CAST(200000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)),
         |    ('stale', CAST(50000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)),
         |    ('hot', CAST(50000 AS BIGINT), CAST(500000 AS BIGINT),
         |     CAST(0 AS BIGINT)),
         |    ('drift', CAST(10000 AS BIGINT), CAST(50000 AS BIGINT),
         |     CAST(2000000 AS BIGINT)))
         |  AS t(scenario, low_ppm, high_ppm, skew_cap_ppm)),
         |pre AS (SELECT sc4.scenario,
         |    CASE sc4.scenario WHEN 'fresh' THEN (SELECT skew FROM skb)
         |      WHEN 'stale' THEN (SELECT skew FROM skb)
         |      WHEN 'hot' THEN (SELECT skew FROM skf)
         |      ELSE (SELECT skew FROM skr) END AS skew_pre
         |  FROM sc4)
         |SELECT sc4.scenario,
         |  CASE WHEN g.growth_ppm < sc4.low_ppm THEN 'noop'
         |    WHEN g.growth_ppm >= sc4.high_ppm THEN 'rebuild'
         |    WHEN pre.skew_pre > sc4.skew_cap_ppm THEN 'rebalance'
         |    ELSE 'ingest' END AS decision,
         |  g.growth_ppm, sc4.low_ppm, sc4.high_ppm, sc4.skew_cap_ppm,
         |  pre.skew_pre AS skew_pre_ppm,
         |  w.n_members, w.vec_xor, w.n_buckets, w.n_codes, w.code_mass,
         |  CASE WHEN sc4.scenario = 'drift' THEN (SELECT k FROM kfc)
         |    ELSE (SELECT k FROM kbc) END AS k
         |FROM sc4 JOIN pre USING (scenario), g,
         |  LATERAL (SELECT w1.* FROM wnoop w1 WHERE sc4.scenario = 'fresh'
         |    UNION ALL SELECT w2.* FROM wingest w2 WHERE sc4.scenario = 'stale'
         |    UNION ALL SELECT w3.* FROM wrebal w3 WHERE sc4.scenario = 'hot'
         |    UNION ALL SELECT w4.* FROM wrebuild w4 WHERE sc4.scenario = 'drift')
         |    w""".stripMargin
    },
  )

  /** Shared hier-SEARCH CTE chain (appended after [[hierAssignCtes]]):
    * cprobe derivation, the every-100th query set with exact norms,
    * query→cell probe ranking, probed candidates and their exact
    * cosines — `hres(q_id, vec_id, cos_ppm)`. Used by q254 and q255 so
    * the search replay cannot drift between the result and its audit.
    */
  /** Shared one-Lloyd-step rebalance CTE chain (appended after
    * [[hierAssignCtes]]): micro-quantized per-bucket integer means
    * (floor-div, negative-corrected), float-reconverted centroids
    * `fnew(f_id, cell, f_emb)` (empty buckets keep their seed), and the
    * re-routed corpus `re(vec_id, bucket_old, bucket_new)`. Used by the
    * q259 panel, the q260 committed audit and the q261 rebalanced
    * serve so the replayed routing cannot drift between them.
    */
  /** Shared PQ-code CTE chain for the hier-PQ artifact oracles
    * (appended after [[hierRebalanceCtes]], whose `qv` micro-quantized
    * vectors it reuses): full-corpus √(N/4) codebook width `kk`,
    * codebook rows `cbq`, per-(vector, codebook entry, subspace)
    * quantized L2 `dq` (doubles as the ADC LUT — `dq` at vec_id =
    * q_id), positional argmin codes `codeq`, and per-vector code mass
    * `cmq`. The q244/q108 algebra verbatim, shared so q262's commit
    * witnesses and q263's ADC ranking cannot drift.
    */
  private lazy val pqCodeCtes: String = {
    import graft.operators.Similarity.PqK
    pqCodeCtesWith(
      s"""kk AS (SELECT GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |       FROM e)""".stripMargin)
  }

  /** [[pqCodeCtes]] at the CAPPED width (q272's clamp) — q275/q276
    * replay the production chain with only the `kk` derivation swapped,
    * so the two widths cannot drift anywhere else in the algebra.
    */
  private lazy val pqCappedCodeCtes: String = {
    import graft.operators.Similarity.{PqKCap, PqKCapFloor}
    pqCodeCtesWith(
      s"""kk AS (SELECT LEAST(GREATEST($PqKCapFloor,
         |    CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)), $PqKCap) AS k
         |  FROM e)""".stripMargin)
  }

  /** The q262/q275 commit-audit replay, parameterized by the code CTE
    * chain (derived or capped width — nothing else may differ).
    */
  private def hierPqCommitOracleSql(codeCtes: String): String =
    s"""$hierAssignCtes,
       |$hierRebalanceCtes,
       |$codeCtes
       |SELECT r.bucket_new AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_members,
       |  bit_xor(r.vec_id) AS vec_xor,
       |  CAST(COUNT(*) AS BIGINT) AS n_codes,
       |  CAST(SUM(cmq.mass) AS BIGINT) AS code_mass,
       |  CAST(${graft.operators.AnnIndex.IndexVersion} AS BIGINT)
       |    AS index_version,
       |  (SELECT nlist FROM nl) AS nlist,
       |  (SELECT ncoarse FROM nc) AS ncoarse,
       |  (SELECT GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT))
       |   FROM nc) AS cprobe,
       |  (SELECT GREATEST(1,
       |     GREATEST(${graft.operators.Similarity.IvfNprobe},
       |       CAST(ROUND(SQRT(nlist)) AS BIGINT))
       |     // GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT)))
       |   FROM nl, nc) AS percell,
       |  (SELECT k FROM kk) AS k
       |FROM re r JOIN cmq ON cmq.vec_id = r.vec_id
       |GROUP BY 1""".stripMargin

  /** The q263/q276 two-level ADC serve replay, parameterized the same
    * way: rebalanced fine selection, candidates = re-routed code rows,
    * ADC = 8 LUT sums per candidate.
    */
  private def hierPqServeOracleSql(codeCtes: String): String =
    s"""$hierAssignCtes,
       |$hierRebalanceCtes,
       |$hierSearchCtes,
       |$codeCtes,
       |fsel2 AS (SELECT q_id, f_id AS bucket FROM (
       |    SELECT p.q_id, f.f_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.q_id, p.cell
       |        ORDER BY ${dotSql("f.f_emb", "p.q_emb")} DESC, f.f_id ASC)
       |        AS rk
       |    FROM qpr p JOIN fnew f ON f.cell = p.cell) t
       |  WHERE rk <= (SELECT percell FROM nh)),
       |adcq AS (
       |  SELECT p.q_id, r.vec_id, CAST(SUM(l.dist) AS BIGINT) AS adc_q
       |  FROM fsel2 p
       |  JOIN re r ON r.bucket_new = p.bucket
       |  JOIN codeq co ON co.vec_id = r.vec_id
       |  JOIN dq l ON l.vec_id = p.q_id AND l.m = co.m AND l.c_id = co.code
       |  WHERE r.vec_id <> p.q_id
       |  GROUP BY 1, 2)
       |SELECT q_id, neighbor_id, adc_q, rank FROM (
       |  SELECT q_id, vec_id AS neighbor_id, adc_q,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY adc_q ASC, vec_id ASC) AS INT) AS rank
       |  FROM adcq) t
       |WHERE rank <= 5""".stripMargin

  private def pqCodeCtesWith(kkCte: String): String = {
    import graft.operators.Similarity.{PqSubDim, PqSubspaces}
    s"""$kkCte,
       |cbq AS (SELECT vec_id AS c_id, qe AS cq FROM qv, kk WHERE vec_id < kk.k),
       |dq AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
       |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
       |    FROM qv q, cbq c,
       |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
       |    GROUP BY 1, 2, 3),
       |codeq AS (SELECT vec_id, m, c_id AS code FROM (
       |    SELECT vec_id, m, c_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
       |    FROM dq) t
       |  WHERE rn = 1),
       |cmq AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS mass
       |       FROM codeq GROUP BY 1)""".stripMargin
  }

  private lazy val hierRebalanceCtes: String = {
    import graft.operators.Similarity.JlInDim
    s"""qv AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
       |  FROM e),
       |pp AS (SELECT unnest(generate_series(1, $JlInDim)) AS pos),
       |sums AS (SELECT h.bucket, pp.pos,
       |    CAST(SUM(qv.qe[pp.pos]) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM hier h JOIN qv USING (vec_id), pp
       |  WHERE h.bucket >= 0
       |  GROUP BY 1, 2),
       |mq AS (SELECT bucket, pos,
       |    CAST((s // n) - (CASE WHEN s % n <> 0 AND s < 0 THEN 1 ELSE 0
       |      END) AS BIGINT) AS mean_q
       |  FROM sums),
       |newc AS (SELECT bucket AS f_id,
       |    list(CAST(mean_q / 1000000.0 AS FLOAT) ORDER BY pos) AS new_emb
       |  FROM mq GROUP BY 1),
       |fnew AS (SELECT fc.f_id, fc.cell,
       |    COALESCE(n.new_emb, fc.f_emb) AS f_emb
       |  FROM fcell fc LEFT JOIN newc n ON n.f_id = fc.f_id),
       |re AS (SELECT vec_id, bucket_old,
       |    COALESCE(bucket, -1) AS bucket_new FROM (
       |    SELECT r.vec_id, h.bucket AS bucket_old, f.f_id AS bucket,
       |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
       |        ORDER BY ${dotSql("r.embedding", "f.f_emb")} DESC, f.f_id ASC)
       |        AS rk
       |    FROM rcell r JOIN hier h USING (vec_id)
       |    LEFT JOIN fnew f ON f.cell = r.cell) t
       |  WHERE rk = 1)""".stripMargin
  }

  private lazy val hierSearchCtes: String =
    s"""cp AS (SELECT GREATEST(2, CAST(ROUND(SQRT(ncoarse)) AS BIGINT))
       |       AS cprobe FROM nc),
       |nh AS (SELECT GREATEST(1,
       |    GREATEST(${graft.operators.Similarity.IvfNprobe},
       |      CAST(ROUND(SQRT(nlist)) AS BIGINT)) // cprobe) AS percell
       |  FROM nl, cp),
       |qq AS (SELECT vec_id AS q_id, embedding AS q_emb,
       |    ${dotSql("embedding", "embedding")} AS n_q
       |  FROM e WHERE vec_id % 100 = 0),
       |qpr AS (SELECT q_id, q_emb, n_q, g_id AS cell FROM (
       |    SELECT qq.q_id, qq.q_emb, qq.n_q, g.g_id,
       |      ROW_NUMBER() OVER (PARTITION BY qq.q_id
       |        ORDER BY ${dotSql("g.g_emb", "qq.q_emb")} DESC, g.g_id ASC)
       |        AS rk
       |    FROM qq, coarse g) t
       |  WHERE rk <= (SELECT cprobe FROM cp)),
       |fsel AS (SELECT q_id, q_emb, n_q, f_id AS bucket FROM (
       |    SELECT p.q_id, p.q_emb, p.n_q, f.f_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.q_id, p.cell
       |        ORDER BY ${dotSql("f.f_emb", "p.q_emb")} DESC, f.f_id ASC)
       |        AS rk
       |    FROM qpr p JOIN fcell f ON f.cell = p.cell) t
       |  WHERE rk <= (SELECT percell FROM nh)),
       |hcand AS (
       |  SELECT p.q_id, h.vec_id, p.n_q,
       |    ${dotSql("e.embedding", "e.embedding")} AS n_emb,
       |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
       |  FROM hier h JOIN e ON e.vec_id = h.vec_id
       |  JOIN fsel p ON h.bucket = p.bucket
       |  WHERE h.vec_id <> p.q_id),
       |hres AS (SELECT q_id, vec_id,
       |    CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
       |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE))))
       |      AS BIGINT) AS cos_ppm
       |  FROM hcand)""".stripMargin

  /** Shared CTE chain replaying the two-level router ([[graft.functions
    * .QuantizedHierArgmaxDot]]'s exact arithmetic) — used by the q252
    * histogram and the q253 agreement panel so the routing replay
    * cannot drift between them. Defines `e`, `fine(f_id, f_emb)`,
    * `coarse(g_id, g_emb)`, `fcell` (fine→cell), `rcell` (row→cell)
    * and `hier(vec_id, cell, bucket)`.
    */
  private lazy val hierAssignCtes: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |nl AS (SELECT GREATEST(${graft.operators.Similarity.IvfNlist},
       |    CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM e),
       |nc AS (SELECT GREATEST(4, CAST(ROUND(SQRT(nlist)) AS BIGINT))
       |       AS ncoarse FROM nl),
       |fine AS (SELECT vec_id AS f_id, embedding AS f_emb
       |         FROM e, nl WHERE vec_id < nl.nlist),
       |coarse AS (SELECT vec_id AS g_id, embedding AS g_emb
       |           FROM e, nc WHERE vec_id < nc.ncoarse),
       |fcell AS (SELECT f_id, f_emb, g_id AS cell FROM (
       |    SELECT f.f_id, f.f_emb, g.g_id,
       |      ROW_NUMBER() OVER (PARTITION BY f.f_id
       |        ORDER BY ${dotSql("f.f_emb", "g.g_emb")} DESC, g.g_id ASC)
       |        AS rk
       |    FROM fine f, coarse g) t WHERE rk = 1),
       |rcell AS (SELECT vec_id, embedding, g_id AS cell FROM (
       |    SELECT e.vec_id, e.embedding, g.g_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("e.embedding", "g.g_emb")} DESC, g.g_id ASC)
       |        AS rk
       |    FROM e, coarse g) t WHERE rk = 1),
       |hier AS (SELECT vec_id, cell, COALESCE(bucket, -1) AS bucket FROM (
       |    SELECT r.vec_id, r.cell, f.f_id AS bucket,
       |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
       |        ORDER BY ${dotSql("r.embedding", "f.f_emb")} DESC, f.f_id ASC)
       |        AS rk
       |    FROM rcell r LEFT JOIN fcell f ON r.cell = f.cell) t
       |  WHERE rk = 1)""".stripMargin

  /** Shared BASE-split two-level chain (appended after any prefix that
    * defines `e(vec_id, embedding)`): the <0.9-md5 base split derives
    * the knobs (`nlb`/`ncb`) and seeds the model from its LOWEST ids
    * (`fineb` — base ids are not dense, so seeding is positional), and
    * `hierb` routes the FULL corpus through that base model —
    * base-build ∪ delta-ingest ≡ this. Used by q267's noop/ingest arms
    * AND q269 so the base-model replay cannot drift between the policy
    * and the code-carrying ingest.
    */
  private lazy val hierBaseCtes: String = hierBaseCtesAt(900000L)

  /** [[hierBaseCtes]] at a parameterized base/arrival split — q274
    * replays the identical chain at the ≥0.999 sparse split.
    */
  private def hierBaseCtesAt(splitPpm: Long): String =
    s"""hbt AS (SELECT vec_id,
       |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % 1000000 AS hb FROM embeddings),
       |bse AS (SELECT e.vec_id, e.embedding FROM e JOIN hbt USING (vec_id)
       |        WHERE hbt.hb < $splitPpm),
       |nlb AS (SELECT GREATEST(${graft.operators.Similarity.IvfNlist},
       |    CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist FROM bse),
       |ncb AS (SELECT GREATEST(4, CAST(ROUND(SQRT(nlist)) AS BIGINT))
       |        AS ncoarse FROM nlb),
       |fineb AS (SELECT f_id, f_emb, rn FROM (
       |    SELECT vec_id AS f_id, embedding AS f_emb,
       |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM bse) t, nlb
       |  WHERE rn <= nlb.nlist),
       |coarseb AS (SELECT f_id AS g_id, f_emb AS g_emb FROM fineb, ncb
       |            WHERE rn <= ncb.ncoarse),
       |fcellb AS (SELECT f_id, f_emb, g_id AS cell FROM (
       |    SELECT f.f_id, f.f_emb, g.g_id,
       |      ROW_NUMBER() OVER (PARTITION BY f.f_id
       |        ORDER BY ${dotSql("f.f_emb", "g.g_emb")} DESC, g.g_id ASC)
       |        AS rk
       |    FROM fineb f, coarseb g) t WHERE rk = 1),
       |rcellb AS (SELECT vec_id, embedding, g_id AS cell FROM (
       |    SELECT e.vec_id, e.embedding, g.g_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("e.embedding", "g.g_emb")} DESC, g.g_id ASC)
       |        AS rk
       |    FROM e, coarseb g) t WHERE rk = 1),
       |hierb AS (SELECT vec_id, cell, COALESCE(bucket, -1) AS bucket FROM (
       |    SELECT r.vec_id, r.cell, f.f_id AS bucket,
       |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
       |        ORDER BY ${dotSql("r.embedding", "f.f_emb")} DESC, f.f_id ASC)
       |        AS rk
       |    FROM rcellb r LEFT JOIN fcellb f ON r.cell = f.cell) t
       |  WHERE rk = 1)""".stripMargin

  /** One ADC code-and-rank chain (the q108 algebra) at a parameterized
    * codebook width, CTE names suffixed so two widths coexist in one
    * query — q273 grades the derived-k and capped-k searches against
    * the same brute truth. Expects shared CTEs `q` (micro-quantized
    * corpus), `probes(q_id, bucket)` and `asg(vec_id, bucket)`; `kCte`
    * must define `kk<sfx>(k)`. Produces `top<sfx>(q_id, neighbor_id)`.
    */
  private def adcTopCtes(sfx: String, kCte: String): String = {
    import graft.operators.Similarity.{PqSubDim, PqSubspaces}
    s"""$kCte,
       |c$sfx AS (SELECT vec_id AS c_id, qe AS cq FROM q, kk$sfx
       |          WHERE vec_id < kk$sfx.k),
       |d$sfx AS (SELECT q.vec_id, c.c_id,
       |      CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
       |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos]))
       |        AS dist
       |    FROM q, c$sfx c,
       |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim}))
       |       AS pos) p
       |    GROUP BY 1, 2, 3),
       |code$sfx AS (SELECT vec_id, m, c_id AS code FROM (
       |    SELECT vec_id, m, c_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id)
       |        AS rn
       |    FROM d$sfx) t
       |  WHERE rn = 1),
       |adc$sfx AS (
       |  SELECT p.q_id, a.vec_id, CAST(SUM(l.dist) AS BIGINT) AS adc_q
       |  FROM probes p
       |  JOIN asg a ON a.bucket = p.bucket
       |  JOIN code$sfx co ON co.vec_id = a.vec_id
       |  JOIN d$sfx l ON l.vec_id = p.q_id AND l.m = co.m AND l.c_id = co.code
       |  WHERE a.vec_id <> p.q_id
       |  GROUP BY 1, 2),
       |top$sfx AS (SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_q ASC,
       |        vec_id ASC) AS rank
       |    FROM adc$sfx) t
       |  WHERE rank <= 5)""".stripMargin
  }

  private lazy val oracleSqlMore: Map[String, String] =
    oracleSqlMoreBase +
      ("q251_ann_index_ingest_stream" ->
        oracleSqlMoreBase("q248_ann_index_ingest")) +
      // served-from-artifact ≡ live search, the q245≡q106 posture: the
      // serve SHARES the live query's SQL verbatim so the parity claim
      // cannot drift
      ("q257_ann_hier_serve" ->
        oracleSqlMoreBase("q254_ann_hier_search"))

  /** Two exact-integer Lloyd rounds replayed in SQL, parameterized by
    * the round-0 seed CTE (must define `c0(c_id, cq)` over `q`): shared
    * by q109 (first-nlist-ids seeding) and q128 (hash-sampled seeding)
    * so the trajectory replay cannot drift between the two.
    */
  private def kmeansTrainSql(c0Cte: String): String = {
    def distSql(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    def meanSql =
      s"""CAST(SUM(q.qe[p.pos]) // COUNT(*) - (CASE WHEN SUM(q.qe[p.pos]) % COUNT(*) <> 0
         |        AND SUM(q.qe[p.pos]) < 0 THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
       |    FROM embeddings),
       |$c0Cte
       |a1 AS (SELECT vec_id, c_id AS bucket FROM (
       |    SELECT q.vec_id, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${distSql("q.qe", "c.cq")}, c.c_id) AS rn
       |    FROM q, c0 c) t
       |  WHERE rn = 1),
       |m1e AS (SELECT a1.bucket, p.pos, $meanSql AS m
       |    FROM a1 JOIN q USING (vec_id),
       |      (SELECT unnest(generate_series(1, 64)) AS pos) p
       |    GROUP BY 1, 2),
       |m1 AS (SELECT bucket AS c_id, list(m ORDER BY pos) AS cq
       |       FROM m1e GROUP BY 1),
       |a2 AS (SELECT vec_id, c_id AS bucket FROM (
       |    SELECT q.vec_id, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${distSql("q.qe", "c.cq")}, c.c_id) AS rn
       |    FROM q, m1 c) t
       |  WHERE rn = 1),
       |m2e AS (SELECT a2.bucket, p.pos,
       |      CAST(COUNT(*) AS BIGINT) AS n, $meanSql AS m
       |    FROM a2 JOIN q USING (vec_id),
       |      (SELECT unnest(generate_series(1, 64)) AS pos) p
       |    GROUP BY 1, 2)
       |SELECT m2e.bucket,
       |  CAST(MAX(m2e.n) AS BIGINT) AS n_vecs,
       |  CAST(SUM(m2e.m * m2e.m) AS BIGINT) AS norm_q,
       |  CAST(SUM((m2e.m - m1e.m) * (m2e.m - m1e.m)) AS BIGINT) AS shift_q
       |FROM m2e JOIN m1e ON m2e.bucket = m1e.bucket AND m2e.pos = m1e.pos
       |GROUP BY 1""".stripMargin
  }

  private lazy val q120Sql =
      s"""WITH $ivfCte,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |q AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb,
         |        l.label AS q_label, e.n_emb AS n_q
         |      FROM e JOIN lab l ON l.vec_id = e.vec_id
         |      WHERE e.vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, q_emb, q_label, n_q, c_id AS bucket FROM (
         |    SELECT q.q_id, q.q_emb, q.q_label, q.n_q, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM q, cents c) t
         |  WHERE rk <= ${graft.operators.Similarity.IvfNprobe}),
         |cand AS (
         |  SELECT p.q_id, e.vec_id,
         |    CAST(floor(CAST(${dotSql("p.q_emb", "e.embedding")} AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(p.n_q AS DOUBLE)) * sqrt(CAST(e.n_emb AS DOUBLE)))) AS BIGINT)
         |      AS cos_ppm,
         |    CASE WHEN l.label = p.q_label THEN 1 ELSE 0 END AS same
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN lab l ON l.vec_id = e.vec_id
         |  JOIN probes p ON asg.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, same
         |        ORDER BY cos_ppm DESC, vec_id ASC) AS rn FROM cand)
         |SELECT q_id,
         |  MAX(CASE WHEN same = 1 THEN vec_id END) AS pos_id,
         |  MAX(CASE WHEN same = 1 THEN cos_ppm END) AS pos_cos_ppm,
         |  MAX(CASE WHEN same = 0 THEN vec_id END) AS neg_id,
         |  MAX(CASE WHEN same = 0 THEN cos_ppm END) AS neg_cos_ppm,
         |  MAX(CASE WHEN same = 1 THEN cos_ppm END)
         |    - MAX(CASE WHEN same = 0 THEN cos_ppm END) AS margin_ppm
         |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin

  /** The exact-cosine scoring CTEs (`e`, `q`, `s`, `c`) shared by q41,
    * q123 (same SQL) and q158's dense side.
    */
  private lazy val knnCtes =
      s"""e AS (
         |  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n_emb
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n_emb AS n_q
         |      FROM e WHERE vec_id % 100 = 0),
         |s AS (
         |  SELECT q_id, e.vec_id, n_q, n_emb,
         |    ${dotSql("q_emb", "embedding")} AS dot_q
         |  FROM e, q WHERE e.vec_id <> q.q_id),
         |c AS (
         |  SELECT q_id, vec_id,
         |    CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm
         |  FROM s)""".stripMargin

  /** q89's banded-and-capped incremental pair relation — shared with
    * q163, whose drained stream must compute the identical relation.
    */
  private lazy val q89Sql: String = {
      val bucket =
        "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000"
      s"""WITH $shingleCte,
         |hh AS (SELECT doc_id, $baseHashSql AS h FROM sh
         |       WHERE $bucket < 800000 OR $bucket >= 900000),
         |sig AS (SELECT doc_id,
         |${(0 until 8).map(i => s"  MIN(${mhSql(i)}) AS mh$i").mkString(",\n")}
         |  FROM hh GROUP BY doc_id),
         |sided AS (SELECT sig.*,
         |    CASE WHEN $bucket < 800000 THEN 0 ELSE 1 END AS side
         |  FROM sig),
         |bands AS (
         |${(0 until 4).map(b =>
            s"  SELECT doc_id, side, $b AS band, mh${2 * b} AS k1, mh${2 * b + 1} AS k2 FROM sided")
            .mkString("\n  UNION ALL\n")}),
         |rk AS (SELECT doc_id, side, band, k1, k2,
         |  ROW_NUMBER() OVER (PARTITION BY band, k1, k2, side ORDER BY doc_id) AS rn
         |  FROM bands),
         |capped AS (SELECT doc_id, side, band, k1, k2 FROM rk
         |           WHERE rn <= ${graft.operators.Dedup.BandCap})
         |SELECT l.doc_id AS corpus_doc, r.doc_id AS batch_doc,
         |  CAST(COUNT(*) AS BIGINT) AS n_bands
         |FROM capped l JOIN capped r ON l.band = r.band AND l.k1 = r.k1
         |  AND l.k2 = r.k2 AND l.side = 0 AND r.side = 1
         |GROUP BY 1, 2""".stripMargin
      }

  private lazy val q41Sql =
      s"""WITH $knnCtes
         |SELECT q_id, neighbor_id, cos_ppm, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |  FROM c) t
         |WHERE rank <= 5""".stripMargin

  /** Derived-knob IVF search CTEs (widths recomputed in SQL, candidates
    * from the probed buckets, scored rows in `c`) — shared by q106 and
    * q158's dense side.
    */
  private lazy val ivfDerivedCtes =
      s"""e AS (SELECT vec_id, embedding,
         |  ${dotSql("embedding", "embedding")} AS n_emb FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist
         |       FROM e),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n_emb AS n_q
         |      FROM e WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, q_emb, n_q, c_id AS bucket FROM (
         |    SELECT q.q_id, q.q_emb, q.n_q, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS rk
         |    FROM q, cents c) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |cand AS (
         |  SELECT p.q_id, e.vec_id, p.n_q, e.n_emb,
         |    ${dotSql("p.q_emb", "e.embedding")} AS dot_q
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN probes p ON asg.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |c AS (
         |  SELECT q_id, vec_id,
         |    CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm
         |  FROM cand)""".stripMargin

  private lazy val q106Sql =
      s"""WITH $ivfDerivedCtes
         |SELECT q_id, neighbor_id, cos_ppm, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, cos_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos_ppm DESC, vec_id ASC) AS INT) AS rank
         |  FROM c) t
         |WHERE rank <= 5""".stripMargin

  private lazy val q108Sql = {
      import graft.operators.Similarity.{PqK, PqSubDim, PqSubspaces}
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |nl AS (SELECT GREATEST(16, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS nlist
         |       FROM e),
         |np AS (SELECT GREATEST(${graft.operators.Similarity.IvfNprobe},
         |    CAST(ROUND(SQRT(nlist)) AS BIGINT)) AS nprobe FROM nl),
         |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
         |          FROM e, nl WHERE vec_id < nl.nlist),
         |asg AS (
         |  SELECT vec_id, c_id AS bucket FROM (
         |    SELECT e.vec_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c) t
         |  WHERE rk = 1),
         |q AS (SELECT vec_id, list_transform(embedding,
         |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qe
         |    FROM embeddings),
         |kk AS (SELECT GREATEST($PqK, CAST(ROUND(SQRT(COUNT(*) / 4.0)) AS BIGINT)) AS k
         |       FROM q),
         |c AS (SELECT vec_id AS c_id, qe AS cq FROM q, kk WHERE vec_id < kk.k),
         |d AS (SELECT q.vec_id, c.c_id, CAST((p.pos - 1) // $PqSubDim AS BIGINT) AS m,
         |      SUM((q.qe[p.pos] - c.cq[p.pos]) * (q.qe[p.pos] - c.cq[p.pos])) AS dist
         |    FROM q, c,
         |      (SELECT unnest(generate_series(1, ${PqSubspaces * PqSubDim})) AS pos) p
         |    GROUP BY 1, 2, 3),
         |code AS (SELECT vec_id, m, c_id AS code FROM (
         |    SELECT vec_id, m, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c_id) AS rn
         |    FROM d) t
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT q_id, c_id AS bucket FROM (
         |    SELECT e.vec_id AS q_id, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dotSql("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rk
         |    FROM e, cents c WHERE e.vec_id % 100 = 0) t
         |  WHERE rk <= (SELECT nprobe FROM np)),
         |adc AS (
         |  SELECT p.q_id, a.vec_id, CAST(SUM(l.dist) AS BIGINT) AS adc_q
         |  FROM probes p
         |  JOIN asg a ON a.bucket = p.bucket
         |  JOIN code co ON co.vec_id = a.vec_id
         |  JOIN d l ON l.vec_id = p.q_id AND l.m = co.m AND l.c_id = co.code
         |  WHERE a.vec_id <> p.q_id
         |  GROUP BY 1, 2)
         |SELECT q_id, neighbor_id, adc_q, rank FROM (
         |  SELECT q_id, vec_id AS neighbor_id, adc_q,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adc_q ASC, vec_id ASC) AS INT) AS rank
         |  FROM adc) t
         |WHERE rank <= 5""".stripMargin
  }

  private lazy val q118Sql =
      s"""WITH e AS (
         |  SELECT vec_id, embedding, label,
         |    ${dotSql("embedding", "embedding")} AS n_emb
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label,
         |        n_emb AS n_q
         |      FROM e WHERE vec_id % 100 = 0),
         |s AS (
         |  SELECT q_id, e.vec_id,
         |    CAST(floor(CAST(${dotSql("q_emb", "embedding")} AS DOUBLE) * 1000000.0 /
         |      (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT) AS cos_ppm,
         |    CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS same
         |  FROM e, q WHERE e.vec_id <> q.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, same
         |        ORDER BY cos_ppm DESC, vec_id ASC) AS rn FROM s)
         |SELECT q_id,
         |  MAX(CASE WHEN same = 1 THEN vec_id END) AS pos_id,
         |  MAX(CASE WHEN same = 1 THEN cos_ppm END) AS pos_cos_ppm,
         |  MAX(CASE WHEN same = 0 THEN vec_id END) AS neg_id,
         |  MAX(CASE WHEN same = 0 THEN cos_ppm END) AS neg_cos_ppm,
         |  MAX(CASE WHEN same = 1 THEN cos_ppm END)
         |    - MAX(CASE WHEN same = 0 THEN cos_ppm END) AS margin_ppm
         |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin
}
