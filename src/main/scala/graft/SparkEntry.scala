package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY §2 (or an
  * additive LLM-pipeline operator); [[oracleSql]] carries the equivalent
  * DuckDB SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Guardian core operator surface (SURVEY §2)
    "g_ingest_project" -> (GuardianQueries.ingestProject _),
    "g_window_hour" -> (GuardianQueries.windowHour _),
    "g_window_period_from_first" -> (GuardianQueries.windowPeriodFromFirst _),
    "g_window_boundaries" -> (GuardianQueries.windowBoundaries _),
    "g_restore_filter" -> (GuardianQueries.restoreFilter _),
    "g_topic_rename" -> (GuardianQueries.topicRename _),
    "g_key_prefilter" -> (GuardianQueries.keyPrefilter _),
    "g_compact_latest" -> (GuardianQueries.compactLatest _),
    "g_offset_commit" -> (GuardianQueries.offsetCommit _),
    "g_slice_stats" -> (GuardianQueries.sliceStats _),
    "g_replay_filter" -> (GuardianQueries.replayFilter _),
    "g_backup_roundtrip" -> (GuardianQueries.backupRoundtrip _),
    "g_backup_roundtrip_gz" -> (GuardianQueries.backupRoundtripGzip _),
    // Analytics surface
    "q1_pricing" -> (AnalyticsQueries.q1Pricing _),
    "q3_revenue" -> (AnalyticsQueries.q3Revenue _),
    "q5_nation_revenue" -> (AnalyticsQueries.q5NationRevenue _),
    "q_top_orders_per_customer" -> (AnalyticsQueries.topOrdersPerCustomer _),
    "q_topk_partial" -> (AnalyticsQueries.topOrdersViaAggregate _),
    "e_sessionize" -> (AnalyticsQueries.sessionize _),
    "e_session_window" -> (AnalyticsQueries.sessionWindows _),
    "d_dup_clusters_lp" -> (TextQueries.dupClustersLabelProp _),
    "e_event_stats" -> (AnalyticsQueries.eventStats _),
    "e_event_rollup" -> (AnalyticsQueries.eventRollup _),
    "e_value_quantiles" -> (AnalyticsQueries.valueQuantiles _),
    "e_users_except" -> (AnalyticsQueries.activeUsersExcept _),
    "e_users_intersect" -> (AnalyticsQueries.activeUsersIntersect _),
    "q_order_ranks" -> (AnalyticsQueries.orderRanks _),
    "q_full_outer" -> (AnalyticsQueries.fullOuterReconcile _),
    "q_first_order" -> (AnalyticsQueries.firstOrderPerCustomer _),
    "e_moving_stats" -> (AnalyticsQueries.movingStats _),
    "e_moving_median" -> (AnalyticsQueries.movingMedian _),
    "e_event_cube" -> (AnalyticsQueries.eventCube _),
    "e_event_stats_salted" -> (AnalyticsQueries.eventStatsSalted _),
    "e_value_histogram" -> (AnalyticsQueries.valueHistogram _),
    "e_json_props" -> (AnalyticsQueries.jsonProps _),
    "e_grouping_sets" -> (AnalyticsQueries.eventGroupingSets _),
    "q_semi_anti" -> (AnalyticsQueries.semiAntiCustomers _),
    "q6_forecast" -> (AnalyticsQueries.q6Forecast _),
    "q4_order_priority" -> (AnalyticsQueries.q4OrderPriority _),
    "q17_small_qty" -> (AnalyticsQueries.q17SmallQty _),
    "q_revenue_share" -> (AnalyticsQueries.nationRevenueShare _),
    "q18_large_orders" -> (AnalyticsQueries.q18LargeOrders _),
    "e_funnel" -> (AnalyticsQueries.funnel _),
    "e_retention" -> (AnalyticsQueries.retentionCohorts _),
    "e_type_pivot" -> (AnalyticsQueries.eventTypePivot _),
    "q_price_deciles" -> (AnalyticsQueries.priceDeciles _),
    "e_event_gaps" -> (AnalyticsQueries.eventGaps _),
    "e_approx_distinct" -> (AnalyticsQueries.approxDistinctGate _),
    "e_anomaly_zscore" -> (AnalyticsQueries.anomalyZscore _),
    "e_cusum_changepoint" -> (AnalyticsQueries.cusumChangepoint _),
    "e_burst_detect" -> (AnalyticsQueries.burstDetect _),
    "e_ohlc" -> (AnalyticsQueries.ohlcBars _),
    "e_twap" -> (AnalyticsQueries.timeWeightedAvg _),
    "e_interval_union" -> (AnalyticsQueries.intervalUnion _),
    "e_seasonal_baseline" -> (AnalyticsQueries.seasonalBaseline _),
    "e_resample_ffill" -> (AnalyticsQueries.resampleForwardFill _),
    "e_approx_quantiles" -> (AnalyticsQueries.approxQuantilesGate _),
    "q_asof_order" -> (AnalyticsQueries.asofJoin _),
    "q_asof_forward" -> (AnalyticsQueries.asofJoinForward _),
    "q_asof_nearest" -> (AnalyticsQueries.asofJoinNearest _),
    "q_asof_bucketed" -> (AnalyticsQueries.asofJoinBucketed _),
    "q_asof_salted" -> (AnalyticsQueries.asofJoinSalted _),
    "q_asof_global" -> (AnalyticsQueries.asofJoinGlobal _),
    "q_range_join" -> (AnalyticsQueries.rangeJoinOrderEvents _),
    "q_interval_overlap" -> (AnalyticsQueries.intervalOverlapJoin _),
    "q19_disjunct" -> (AnalyticsQueries.q19Disjunct _),
    "q14_promo" -> (AnalyticsQueries.q14PromoShare _),
    "q10_returns" -> (AnalyticsQueries.q10ReturnedItems _),
    "q7_bilateral" -> (AnalyticsQueries.q7BilateralVolume _),
    "q2_min_cost" -> (AnalyticsQueries.q2MinCost _),
    "q8_market_share" -> (AnalyticsQueries.q8MarketShare _),
    "q9_profit" -> (AnalyticsQueries.q9Profit _),
    "q11_value_stock" -> (AnalyticsQueries.q11ValueStock _),
    "q12_ship_delay" -> (AnalyticsQueries.q12ShipDelay _),
    "q13_order_dist" -> (AnalyticsQueries.q13OrderDist _),
    "q15_top_supplier" -> (AnalyticsQueries.q15TopSupplier _),
    "q16_supplier_cnt" -> (AnalyticsQueries.q16SupplierCnt _),
    "q20_qty_concentration" -> (AnalyticsQueries.q20QtyConcentration _),
    "q21_late_supplier" -> (AnalyticsQueries.q21LateSupplier _),
    "q22_dormant" -> (AnalyticsQueries.q22Dormant _),
    // LLM-pipeline: dedup + text analysis over `documents`
    "d_dedup_exact" -> (TextQueries.dedupExact _),
    "d_dedup_keep" -> (TextQueries.dedupKeep _),
    "d_ngram_jaccard" -> (TextQueries.ngramJaccard _),
    "d_minhash_lsh" -> (TextQueries.minhashLsh _),
    "d_jaccard_prefix" -> (TextQueries.jaccardPrefixFiltered _),
    "d_dup_clusters" -> (TextQueries.dupClusters _),
    "d_simhash" -> (TextQueries.simhash _),
    "d_simhash_wide" -> (TextQueries.simhashWide _),
    "t_top_terms" -> (TextQueries.topTerms _),
    "t_vocab_growth" -> (TextQueries.vocabGrowth _),
    "d_dup_by_source" -> (TextQueries.dupStatsBySource _),
    "t_tokens" -> (TextQueries.tokenCounts _),
    "t_quality" -> (TextQueries.qualityScore _),
    "t_langid" -> (TextQueries.langId _),
    "t_fingerprint" -> (TextQueries.fingerprints _),
    "t_tfidf" -> (TextQueries.tfidfTopTerms _),
    "t_char_entropy" -> (TextQueries.charEntropy _),
    "t_rolling_fp" -> (TextQueries.rollingFingerprints _),
    "t_repetition" -> (TextQueries.repetitionRatio _),
    "t_corpus_stats" -> (TextQueries.corpusStats _),
    "d_decontam" -> (TextQueries.decontaminate _),
    "d_decontam_bloom" -> (TextQueries.decontaminateBloom _),
    "d_df_prune" -> (TextQueries.dfPrune _),
    "t_redact" -> (TextQueries.redact _),
    "p_pack_sequences" -> (TextQueries.packSequences _),
    "p_mix_order" -> (TextQueries.mixOrder _),
    "d_edit_dist" -> (TextQueries.editDistancePairs _),
    "p_sample_stratified" -> (TextQueries.stratifiedSample _),
    "p_quota_sample" -> (TextQueries.quotaSample _),
    "p_split_assign" -> (TextQueries.splitAssign _),
    "d_dedup_best" -> (TextQueries.dedupBest _),
    "d_overlap_matrix" -> (TextQueries.overlapMatrix _),
    "t_ngram_lm" -> (TextQueries.ngramLm _),
    "d_containment" -> (TextQueries.containment _),
    "d_dedup_incremental" -> (TextQueries.dedupIncremental _),
    "p_filter_report" -> (TextQueries.filterReport _),
    "d_hybrid_verify" -> (TextQueries.hybridVerify _),
    "t_lm_probe" -> (TextQueries.lmProbe _),
    "p_clean_corpus" -> (TextQueries.cleanCorpus _),
    "d_chunk_dedup" -> (TextQueries.chunkDedup _),
    "d_chunk_incremental" -> (TextQueries.chunkIncremental _),
    "p_adaptive_len" -> (TextQueries.adaptiveLenFilter _),
    "t_hapax" -> (TextQueries.hapaxProfile _),
    "d_threshold_calib" -> (TextQueries.thresholdCalibration _),
    "t_bpe_pairs" -> (TextQueries.bpePairs _),
    "t_winnow" -> (TextQueries.winnowFingerprints _),
    "t_novelty" -> (TextQueries.novelty _),
    "t_boilerplate" -> (TextQueries.boilerplate _),
    "p_dsir_sample" -> (TextQueries.dsirSample _),
    "m_media_meta" -> (TextQueries.mediaMeta _),
    "m_media_features" -> (TextQueries.mediaFeatures _),
    "m_frame_sample" -> (TextQueries.mediaFrameSample _),
    // LLM-pipeline: embedding similarity over `embeddings`
    "d_embed_neardup" -> (SimilarityQueries.embedNearDup _),
    "d_semdedup" -> (SimilarityQueries.semDedup _),
    "s_ann_topk" -> (SimilarityQueries.annTopK _),
    "s_ann_ivf" -> (SimilarityQueries.annIvf _),
    "s_ivf_trained" -> (SimilarityQueries.ivfTrained _),
    "s_cosine_expr" -> (SimilarityQueries.cosineExprPairs _),
    "s_ann_lsh" -> (SimilarityQueries.annLsh _),
    "s_ann_pq" -> (SimilarityQueries.annPq _),
    "s_ann_ivfpq" -> (SimilarityQueries.annIvfPq _),
    "s_knn_classify" -> (SimilarityQueries.knnClassify _),
    "s_recall_eval" -> (SimilarityQueries.recallEval _),
    "p_epoch_plan" -> (TextQueries.epochPlan _),
    "d_semdedup_incr" -> (SimilarityQueries.semDedupIncremental _),
    "m_media_dedup" -> (TextQueries.mediaDedup _),
    "d_winnow_overlap" -> (TextQueries.winnowOverlap _),
    "d_winnow_topk" -> (TextQueries.winnowTopOverlaps _),
    "d_winnow_capped" -> (TextQueries.winnowOverlapCapped _),
    "m_phash_neardup" -> (TextQueries.phashNearDup _),
    "m_phash_wide" -> (TextQueries.phashWide _),
    "t_kl_drift" -> (TextQueries.klDrift _),
    "t_quality_lr" -> (TextQueries.qualityLr _),
    "t_bm25" -> (TextQueries.bm25 _),
    "s_pca_project" -> (SimilarityQueries.pcaProject _),
    "t_top2gram" -> (TextQueries.topBigramFraction _),
    "t_dupgram_cover" -> (TextQueries.dupGramCoverage _),
    "p_curation_funnel" -> (TextQueries.curationFunnel _),
    "s_embed_drift" -> (SimilarityQueries.labelDrift _),
    "p_cluster_sample" -> (SimilarityQueries.clusterSample _),
    "s_hard_negatives" -> (SimilarityQueries.hardNegatives _),
    "d_split_leak" -> (TextQueries.splitLeak _),
    "p_token_budget" -> (TextQueries.tokenBudgetSelect _),
    "e_decay_sum" -> (AnalyticsQueries.decayedValueSums _),
    "t_ppl_bucket" -> (TextQueries.pplBuckets _),
    "p_doremi_weights" -> (TextQueries.doremiWeights _),
    "d_substring_scrub" -> (TextQueries.substringScrub _),
    "d_dedup_norm" -> (TextQueries.dedupNorm _),
    "p_sample_weighted" -> (TextQueries.sampleWeighted _),
    "t_diversity" -> (TextQueries.diversity _),
    "t_lang_confusion" -> (TextQueries.langConfusion _),
    "t_bpe_encode" -> (TextQueries.bpeEncodeGate _),
    "s_embed_outliers" -> (SimilarityQueries.embedOutliers _),
    "d_scrub_incremental" -> (TextQueries.scrubIncremental _),
    "t_heavy_hitters" -> (TextQueries.heavyHitters _),
    "t_zipf_fit" -> (TextQueries.zipfFit _),
    "t_readability" -> (TextQueries.readabilityProfile _),
    "d_bbit_minhash" -> (TextQueries.bbitMinhash _),
    "s_mips_topk" -> (SimilarityQueries.mipsTopK _),
    "p_anneal_plan" -> (TextQueries.annealPlan _),
    "m_media_sniff" -> (TextQueries.mediaSniff _),
    "p_temperature_mix" -> (TextQueries.temperatureMix _),
    "t_word_entropy" -> (TextQueries.wordEntropy _),
    "d_decontam_semantic" -> (SimilarityQueries.semanticDecontam _),
    "s_cluster_purity" -> (SimilarityQueries.clusterPurity _),
    "s_ivf_probe" -> (SimilarityQueries.annIvfProbe _),
    "m_shard_pack" -> (TextQueries.shardPack _),
    "m_shard_manifest" -> (TextQueries.shardManifest _),
    "s_dim_stats" -> (SimilarityQueries.dimStats _),
    "s_cell_reps" -> (SimilarityQueries.cellReps _),
    "t_source_overlap" -> (TextQueries.sourceOverlap _),
    "s_matryoshka" -> (SimilarityQueries.matryoshkaEval _),
    "d_bucket_stats" -> (TextQueries.bucketStats _),
    "s_binary_quant" -> (SimilarityQueries.binaryQuantEval _),
    "m_frame_dedup" -> (TextQueries.mediaFrameDedup _),
    "p_data_card" -> (TextQueries.dataCard _),
    "s_ivf_curve" -> (SimilarityQueries.ivfRecallCurve _),
    "e_resample_interp" -> (AnalyticsQueries.resampleInterpolate _),
    "s_pq_distortion" -> (SimilarityQueries.pqDistortion _),
    "d_dup_spectrum" -> (TextQueries.dupSpectrum _),
    "e_trend_types" -> (AnalyticsQueries.trendTypes _),
    "e_type_transitions" -> (AnalyticsQueries.typeTransitions _),
    "s_hybrid_rrf" -> (SimilarityQueries.hybridRrf _),
    "s_ann_filtered" -> (SimilarityQueries.annFiltered _),
    "q_zorder_cells" -> (AnalyticsQueries.zorderCells _),
    "q_join_preflight" -> (AnalyticsQueries.joinPreflightGate _),
    "q_zorder_prune" -> (AnalyticsQueries.zorderPrune _),
    "e_rolling_distinct" -> (SketchQueries.rollingDistinct _),
    "t_overlap_sketch" -> (SketchQueries.sourceOverlapSketch _),
    "t_overlap_theta" -> (SketchQueries.sourceOverlapTheta _),
    "e_kll_quantiles" -> (SketchQueries.kllQuantilesGate _)
  )

  /** Morton-interleave bit algebra as SQL: bit `k` of rank column
    * `cols(i)` lands at z-bit `k * n + i`. The oracle replays the
    * operator's contract ([[graft.operators.ZOrder.interleave]]) term
    * by term — plain BIGINT shifts/masks DuckDB evaluates natively.
    */
  private def zInterleaveSql(cols: Seq[String], bits: Int): String =
    (for {
      (c, i) <- cols.zipWithIndex
      k <- 0 until bits
    } yield s"((($c >> $k) & 1) << ${k * cols.size + i})").mkString(" | ")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val rcte = GuardianQueries.recordsCte
    Map(
      "g_ingest_project" ->
        s"""$rcte SELECT * FROM records ORDER BY "partition", "offset"""",
      "g_window_hour" ->
        s"""$rcte
           |SELECT ("timestamp" // 3600000) * 3600000 AS slice_ms,
           |       count(*) AS n_records, min("timestamp") AS min_ts, max("timestamp") AS max_ts
           |FROM records GROUP BY 1 ORDER BY 1""".stripMargin,
      "g_window_period_from_first" ->
        s"""$rcte, anch AS (SELECT min("timestamp") AS a FROM records)
           |SELECT ("timestamp" - a) // 21600000 AS period,
           |       count(*) AS n_records, min("timestamp") AS min_ts, max("timestamp") AS max_ts
           |FROM records, anch GROUP BY 1 ORDER BY 1""".stripMargin,
      "g_window_boundaries" ->
        s"""$rcte, sliced AS (
           |  SELECT "partition", "offset", ("timestamp" // 3600000) * 3600000 AS slice_ms,
           |         lag(("timestamp" // 3600000) * 3600000) OVER (PARTITION BY "partition" ORDER BY "offset") AS prev_slice_ms
           |  FROM records)
           |SELECT * FROM sliced WHERE prev_slice_ms IS NULL OR slice_ms > prev_slice_ms
           |ORDER BY "partition", "offset"""".stripMargin,
      "g_restore_filter" ->
        s"""$rcte SELECT * FROM records
           |WHERE topic IN ('events') AND "timestamp" >= 1706140800000
           |ORDER BY "partition", "offset"""".stripMargin,
      "g_topic_rename" ->
        s"""$rcte
           |SELECT CASE WHEN topic = 'events' THEN 'events-restored' ELSE topic END AS topic,
           |       count(*) AS n_records
           |FROM records GROUP BY 1 ORDER BY 1""".stripMargin,
      "g_key_prefilter" ->
        s"""$rcte, keys AS (
           |  SELECT DISTINCT ("timestamp" // 3600000) * 3600000 AS key_ms FROM records),
           |idx AS (SELECT key_ms, CAST(row_number() OVER (ORDER BY key_ms) AS INT) AS rn FROM keys),
           |cut AS (SELECT coalesce(greatest(min(rn) - 1, 1), (SELECT max(rn) FROM idx)) AS keep_from
           |        FROM idx WHERE key_ms >= 1706140800000)
           |SELECT key_ms, rn FROM idx, cut WHERE rn >= keep_from ORDER BY key_ms""".stripMargin,
      "g_compact_latest" ->
        s"""$rcte
           |SELECT topic, "partition",
           |       max("offset") AS "offset",
           |       key,
           |       arg_max(value, "offset") AS value,
           |       arg_max("timestamp", "offset") AS "timestamp",
           |       arg_max(timestamp_type, "offset") AS timestamp_type
           |FROM records GROUP BY topic, "partition", key
           |ORDER BY topic, "partition", key""".stripMargin,
      "g_offset_commit" ->
        s"""$rcte
           |SELECT topic, "partition", max("offset") AS committed_offset, count(*) AS n_records
           |FROM records GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "g_slice_stats" ->
        s"""$rcte
           |SELECT ("timestamp" // 86400000) * 86400000 AS slice_ms,
           |       count(*) AS n_records,
           |       CAST(sum(octet_length(from_base64(value))) AS BIGINT) AS payload_bytes,
           |       CAST(count(DISTINCT "partition") AS BIGINT) AS n_partitions,
           |       min("offset") AS min_offset,
           |       max("offset") AS max_offset
           |FROM records GROUP BY 1 ORDER BY 1""".stripMargin,
      "g_replay_filter" ->
        s"""$rcte, committed AS (
           |  SELECT "partition",
           |         CAST(floor((min("offset") + max("offset")) / 2) AS BIGINT) AS committed
           |  FROM records GROUP BY 1)
           |SELECT r."partition", min(c.committed) AS committed,
           |       count(*) AS n_replayed,
           |       min(r."offset") AS first_replayed,
           |       max(r."offset") AS last_replayed
           |FROM records r JOIN committed c ON r."partition" = c."partition"
           |WHERE r."offset" > c.committed
           |GROUP BY 1 ORDER BY 1""".stripMargin,
      "g_backup_roundtrip" ->
        s"""$rcte SELECT * FROM records ORDER BY "partition", "offset"""",
      "g_backup_roundtrip_gz" ->
        s"""$rcte SELECT * FROM records ORDER BY "partition", "offset"""",
      "q1_pricing" ->
        """SELECT l_returnflag, l_linestatus,
          |       count(*) AS count_order,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge
          |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "q3_revenue" ->
        """SELECT l_orderkey,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       min(epoch_ms(o_orderdate)) AS order_date_ms
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
      "q5_nation_revenue" ->
        """SELECT r_name, n_name,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "q_top_orders_per_customer" ->
        """SELECT o_custkey, rnk, o_orderkey, total_price FROM (
          |  SELECT o_custkey, o_orderkey,
          |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
          |  FROM orders)
          |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
      // Same contract as the window form — the aggregate execution is the
      // point; output equality is the proof.
      "q_topk_partial" ->
        """SELECT o_custkey, rnk, o_orderkey, total_price FROM (
          |  SELECT o_custkey, o_orderkey,
          |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
          |  FROM orders)
          |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
      "e_sessionize" ->
        """WITH ev AS (
          |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
          |flagged AS (
          |  SELECT user_id, event_id, ts_ms,
          |         CASE WHEN lag(ts_ms) OVER w IS NULL
          |                   OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
          |sessions AS (
          |  SELECT user_id, ts_ms,
          |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM flagged),
          |per_session AS (
          |  SELECT user_id, session_id, count(*) AS n_events, max(ts_ms) - min(ts_ms) AS duration_ms
          |  FROM sessions GROUP BY 1, 2)
          |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
          |       CAST(sum(n_events) AS BIGINT) AS n_events,
          |       max(duration_ms) AS max_session_ms
          |FROM per_session GROUP BY 1 ORDER BY 1""".stripMargin,
      // session_window is [start, last+gap): an event exactly gap after
      // its predecessor starts a NEW session, hence >= in the oracle's
      // boundary condition (the lag/sum sessionize oracle uses > with
      // its own gap semantics — both are gated, each to its contract).
      "e_session_window" ->
        """WITH ev AS (
          |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
          |flagged AS (
          |  SELECT user_id, ts_ms,
          |         CASE WHEN lag(ts_ms) OVER w IS NULL
          |                   OR ts_ms - lag(ts_ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS ns
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
          |sess AS (
          |  SELECT user_id, ts_ms,
          |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM flagged)
          |SELECT user_id, min(ts_ms) AS start_ms,
          |       max(ts_ms) + 1800000 AS end_ms,
          |       count(*) AS n_events
          |FROM sess GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin,
      "e_event_stats" ->
        """SELECT event_type,
          |       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "e_value_quantiles" ->
        """SELECT event_type, count(*) AS n,
          |       round(quantile_cont(value, 0.5), 6) AS p50,
          |       round(quantile_cont(value, 0.9), 6) AS p90,
          |       round(quantile_cont(value, 0.99), 6) AS p99
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_users_except" ->
        """SELECT DISTINCT user_id FROM events
          |WHERE (epoch_ms(ts) // 86400000) * 86400000 = 1704067200000
          |EXCEPT
          |SELECT DISTINCT user_id FROM events
          |WHERE (epoch_ms(ts) // 86400000) * 86400000 = 1704153600000
          |ORDER BY user_id""".stripMargin,
      "e_users_intersect" ->
        """SELECT DISTINCT user_id FROM events
          |WHERE (epoch_ms(ts) // 86400000) * 86400000 = 1704067200000
          |INTERSECT
          |SELECT DISTINCT user_id FROM events
          |WHERE (epoch_ms(ts) // 86400000) * 86400000 = 1704153600000
          |ORDER BY user_id""".stripMargin,
      "q_order_ranks" ->
        """SELECT o_custkey, rn, o_orderkey, rnk, drnk, prnk FROM (
          |  SELECT o_custkey, o_orderkey,
          |         CAST(row_number() OVER w AS INT) AS rn,
          |         CAST(rank() OVER w AS INT) AS rnk,
          |         CAST(dense_rank() OVER w AS INT) AS drnk,
          |         round(percent_rank() OVER w, 6) AS prnk
          |  FROM orders
          |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
          |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
      "q_first_order" ->
        """SELECT o_custkey,
          |       arg_min(o_orderkey, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS first_orderkey,
          |       min(epoch_ms(o_orderdate)) AS first_odate_ms,
          |       count(*) AS n_orders
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_full_outer" ->
        """WITH co AS (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1),
          |ue AS (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1)
          |SELECT count(*) FILTER (WHERE n_orders IS NOT NULL AND n_events IS NOT NULL) AS n_both,
          |       count(*) FILTER (WHERE n_events IS NULL) AS n_orders_only,
          |       count(*) FILTER (WHERE n_orders IS NULL) AS n_events_only
          |FROM co FULL OUTER JOIN ue USING (k)""".stripMargin,
      "q_semi_anti" ->
        """SELECT
          |  (SELECT count(*) FROM customer c
          |   WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
          |  (SELECT count(*) FROM customer c
          |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders""".stripMargin,
      "e_moving_stats" ->
        """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
          |       count(*) OVER w AS n_5m,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 6) AS sum_5m
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
          |             RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, ts_ms, event_id""".stripMargin,
      "e_moving_median" ->
        """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
          |       round(quantile_cont(value, 0.5) OVER w, 6) AS med_5m
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
          |             RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, ts_ms, event_id""".stripMargin,
      "e_event_rollup" ->
        """SELECT event_type,
          |       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY ROLLUP (1, 2)
          |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
      // Salted two-phase execution of the same aggregate spec — exact
      // DECIMAL partials merge losslessly, so the oracle is the plain
      // single-phase SQL.
      "e_event_stats_salted" ->
        """SELECT event_type,
          |       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "e_json_props" ->
        """SELECT event_type,
          |       count(CAST(props->>'k' AS INT)) AS n_k,
          |       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
          |       min(CAST(props->>'k' AS INT)) AS min_k,
          |       max(CAST(props->>'k' AS INT)) AS max_k
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      // GROUPING() bitmasks use the Postgres convention in both engines:
      // leftmost argument = most significant bit.
      "e_grouping_sets" ->
        """WITH ev AS (
          |  SELECT event_type, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, value
          |  FROM events)
          |SELECT CAST(GROUPING(event_type, day_ms) AS INT) AS gid,
          |       event_type, day_ms,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM ev GROUP BY GROUPING SETS ((event_type), (day_ms))
          |ORDER BY 1, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
      "e_event_cube" ->
        """SELECT event_type,
          |       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY CUBE (1, 2)
          |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
      "e_value_histogram" ->
        """WITH r AS (SELECT min(value) AS lo, (max(value) - min(value)) / 20.0 AS width FROM events),
          |b AS (SELECT CAST(least(floor((value - lo) / width), 19.0) AS INT) AS bucket
          |      FROM events, r)
          |SELECT bucket, round(lo + bucket * width, 6) AS lo_edge, count(*) AS n
          |FROM b, r GROUP BY 1, 2 ORDER BY 1""".stripMargin,
      // Range-join spec: events within [odate, odate + 36h) of the same
      // customer, zero-count orders kept. The oracle states the range
      // predicate directly; Spark executes the bucketed form.
      "q_range_join" ->
        """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS odate_ms FROM orders)
          |SELECT o.o_orderkey, o.o_custkey, o.odate_ms,
          |       count(e.user_id) AS n_events
          |FROM ord o LEFT JOIN ev e
          |  ON e.user_id = o.o_custkey
          | AND e.ts_ms >= o.odate_ms AND e.ts_ms < o.odate_ms + 129600000
          |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
      // Interval OVERLAP join: the oracle states the naive inequality
      // join over the session intervals (sessionize's lag/sum contract)
      // and the 60-minute error windows (deliberately longer than the
      // 30-minute session gap, so windows cross session boundaries);
      // Spark executes the day-bucketed exactly-once form (pair counted
      // in its overlap-start bucket).
      "q_interval_overlap" ->
        """WITH ev AS (
          |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
          |flagged AS (
          |  SELECT user_id, event_id, ts_ms,
          |         CASE WHEN lag(ts_ms) OVER w IS NULL
          |                   OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
          |numbered AS (
          |  SELECT user_id, ts_ms,
          |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM flagged),
          |sess AS (
          |  SELECT user_id, session_id, min(ts_ms) AS s_start, max(ts_ms) + 1 AS s_end
          |  FROM numbered GROUP BY 1, 2),
          |wins AS (
          |  SELECT user_id AS w_user, ts_ms AS w_start, ts_ms + 3600000 AS w_end
          |  FROM ev WHERE event_type = 'error'),
          |cnt AS (
          |  SELECT s.user_id, s.session_id, count(*) AS n_overlaps
          |  FROM sess s JOIN wins w
          |    ON s.user_id = w.w_user AND s.s_start < w.w_end AND w.w_start < s.s_end
          |  GROUP BY 1, 2)
          |SELECT s.user_id, CAST(s.session_id AS BIGINT) AS session_id,
          |       s.s_start, s.s_end,
          |       CAST(coalesce(c.n_overlaps, 0) AS BIGINT) AS n_overlaps
          |FROM sess s LEFT JOIN cnt c USING (user_id, session_id)
          |ORDER BY 1, 2""".stripMargin,
      // As-of semantics spec: latest order (by date, then orderkey) at or
      // before each event's time for the same key; expressed here as a
      // backward range join + arg_max, vs Spark's union+window algorithm.
      "q_asof_order" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (
          |  SELECT o_custkey, o_orderkey,
          |         epoch_ms(o_orderdate) AS odate_ms,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
          |  FROM orders),
          |ranked AS (
          |  SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.total,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY o.odate_ms DESC, o.o_orderkey DESC) AS rn
          |  FROM ev e LEFT JOIN ord o
          |    ON o.o_custkey = e.user_id AND o.odate_ms <= e.ts_ms)
          |SELECT event_id, user_id, ts_ms,
          |       o_orderkey AS asof_orderkey, total AS asof_total
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      // Bucket-aligned layout changes the PLAN (zero exchanges), never
      // the ANSWER: the bucketed gate re-uses the q_asof_order spec.
      "q_asof_bucketed" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (
          |  SELECT o_custkey, o_orderkey,
          |         epoch_ms(o_orderdate) AS odate_ms,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
          |  FROM orders),
          |ranked AS (
          |  SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.total,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY o.odate_ms DESC, o.o_orderkey DESC) AS rn
          |  FROM ev e LEFT JOIN ord o
          |    ON o.o_custkey = e.user_id AND o.odate_ms <= e.ts_ms)
          |SELECT event_id, user_id, ts_ms,
          |       o_orderkey AS asof_orderkey, total AS asof_total
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      // Salt-split skew posture changes the PLAN (both merge exchanges
      // hash (key, salt)), never the ANSWER: the salted gate re-uses
      // the q_asof_order spec, same as the bucketed gate.
      "q_asof_salted" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (
          |  SELECT o_custkey, o_orderkey,
          |         epoch_ms(o_orderdate) AS odate_ms,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
          |  FROM orders),
          |ranked AS (
          |  SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.total,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY o.odate_ms DESC, o.o_orderkey DESC) AS rn
          |  FROM ev e LEFT JOIN ord o
          |    ON o.o_custkey = e.user_id AND o.odate_ms <= e.ts_ms)
          |SELECT event_id, user_id, ts_ms,
          |       o_orderkey AS asof_orderkey, total AS asof_total
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      // Keyless (global) as-of spec: latest daily order census at or
      // before each event's time, 30-day tolerance, no join key — the
      // bounded backward range join + arg_max over the single global
      // timeline (day_ms is unique after the census GROUP BY).
      "q_asof_global" ->
        """WITH ev AS (
          |  SELECT event_id, epoch_ms(ts) AS ts_ms FROM events),
          |daily AS (
          |  SELECT epoch_ms(o_orderdate) AS day_ms, count(*) AS n_orders
          |  FROM orders GROUP BY 1),
          |ranked AS (
          |  SELECT e.event_id, e.ts_ms, d.day_ms, d.n_orders,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY d.day_ms DESC) AS rn
          |  FROM ev e LEFT JOIN daily d
          |    ON d.day_ms <= e.ts_ms AND e.ts_ms - d.day_ms <= 2592000000)
          |SELECT event_id, ts_ms, day_ms, n_orders
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      // Forward as-of spec: FIRST order (by date, then orderkey) at or
      // after each event's time — the mirror range join + arg_min.
      "q_asof_forward" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (
          |  SELECT o_custkey, o_orderkey,
          |         epoch_ms(o_orderdate) AS odate_ms,
          |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
          |  FROM orders),
          |ranked AS (
          |  SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.total,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY o.odate_ms ASC, o.o_orderkey ASC) AS rn
          |  FROM ev e LEFT JOIN ord o
          |    ON o.o_custkey = e.user_id AND o.odate_ms >= e.ts_ms)
          |SELECT event_id, user_id, ts_ms,
          |       o_orderkey AS next_orderkey, total AS next_total
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      // Nearest as-of spec: the order closest in time on either side
      // within a 7-day tolerance; equal distance prefers at-or-before,
      // within-arm time ties follow each arm's convention (backward:
      // highest orderkey, forward: lowest) — the ORDER BY states the
      // native operator's full tie ladder declaratively.
      "q_asof_nearest" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
          |ord AS (
          |  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms
          |  FROM orders),
          |ranked AS (
          |  SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.odate_ms,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY abs(o.odate_ms - e.ts_ms) ASC,
          |             CASE WHEN o.odate_ms <= e.ts_ms THEN 0 ELSE 1 END ASC,
          |             CASE WHEN o.odate_ms <= e.ts_ms
          |                  THEN -o.o_orderkey ELSE o.o_orderkey END ASC) AS rn
          |  FROM ev e LEFT JOIN ord o
          |    ON o.o_custkey = e.user_id
          |   AND abs(o.odate_ms - e.ts_ms) <= 604800000)
          |SELECT event_id, user_id, ts_ms,
          |       o_orderkey AS near_orderkey,
          |       odate_ms - ts_ms AS near_delta_ms
          |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,
      "q6_forecast" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE epoch_ms(l_shipdate) >= 820454400000 AND epoch_ms(l_shipdate) < 852076800000
          |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
      "q4_order_priority" ->
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE epoch_ms(o_orderdate) >= 820454400000 AND epoch_ms(o_orderdate) < 828316800000
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "q19_disjunct" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
      "q14_promo" ->
        """SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
          |                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) END) AS DOUBLE) * 100 /
          |             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 6) AS promo_pct,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE epoch_ms(l_shipdate) >= 820454400000 AND epoch_ms(l_shipdate) < 823132800000""".stripMargin,
      "q7_bilateral" ->
        """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
          |       year(l_shipdate) AS ship_year,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ns ON s_nationkey = ns.n_nationkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation nc ON c_nationkey = nc.n_nationkey
          |WHERE ns.n_name IN ('NATION_1', 'NATION_2')
          |  AND nc.n_name IN ('NATION_1', 'NATION_2')
          |  AND ns.n_name <> nc.n_name
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
      "q2_min_cost" ->
        """WITH offer AS (
          |  SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer_price
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
          |  GROUP BY 1, 2),
          |best AS (
          |  SELECT l_partkey, min(offer_price) AS best_price FROM offer GROUP BY 1)
          |SELECT s_acctbal, s_name, n_name, offer.l_partkey AS p_partkey,
          |       CAST(best_price AS DOUBLE) AS best_price
          |FROM offer
          |JOIN best ON offer.l_partkey = best.l_partkey AND offer_price = best_price
          |JOIN supplier ON offer.l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'EUROPE'
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          |LIMIT 100""".stripMargin,
      "q8_market_share" ->
        """WITH flow AS (
          |  SELECT year(o_orderdate) AS o_year,
          |         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume,
          |         ns.n_name AS supp_nation
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ns ON s_nationkey = ns.n_nationkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation nc ON c_nationkey = nc.n_nationkey
          |  JOIN region ON nc.n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          |    AND epoch_ms(o_orderdate) >= 820454400000 AND epoch_ms(o_orderdate) < 883612800000)
          |SELECT o_year,
          |       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE) /
          |             CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
          |       CAST(sum(volume) AS DOUBLE) AS total_volume, count(*) AS n_items
          |FROM flow GROUP BY 1 ORDER BY 1""".stripMargin,
      // No partsupp in the harness schema: cost is a deterministic
      // retail-price fraction; quantity casts to DECIMAL(9,0) so every
      // decimal product stays well inside 38 digits in both engines.
      "q9_profit" ->
        """SELECT n_name AS nation, year(l_shipdate) AS o_year,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
          |              - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(9,0)) * CAST(0.5 AS DECIMAL(4,2))) AS DOUBLE) AS profit,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%widget%'
          |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
      // Scale-invariant Q11 threshold cross-multiplied into DECIMAL:
      // share > 3x the average part's share <=> val * nparts > 3 * total.
      "q11_value_stock" ->
        """WITH nat AS (
          |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_7'),
          |v AS (
          |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
          |  FROM lineitem JOIN nat ON l_suppkey = s_suppkey GROUP BY 1),
          |t AS (SELECT sum(val) AS total, count(*) AS nparts FROM v)
          |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS value
          |FROM v, t
          |WHERE val * nparts > 3 * total
          |ORDER BY value DESC, p_partkey""".stripMargin,
      "q12_ship_delay" ->
        """SELECT l_linestatus,
          |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
          |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count,
          |       count(*) AS n_late
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE epoch_ms(l_shipdate) >= 820454400000 AND epoch_ms(l_shipdate) < 852076800000
          |  AND epoch_ms(l_shipdate) - epoch_ms(o_orderdate) > 5184000000
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "q13_order_dist" ->
        """WITH per_cust AS (
          |  SELECT c_custkey, count(o_orderkey) AS c_count
          |  FROM customer LEFT JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          |  GROUP BY 1)
          |SELECT c_count, count(*) AS custdist
          |FROM per_cust GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
      "q15_top_supplier" ->
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_dec
          |  FROM lineitem
          |  WHERE epoch_ms(l_shipdate) >= 820454400000 AND epoch_ms(l_shipdate) < 828316800000
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_rev
          |FROM supplier JOIN rev ON s_suppkey = l_suppkey
          |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
          |ORDER BY s_suppkey""".stripMargin,
      "q16_supplier_cnt" ->
        """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM part JOIN lineitem ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2, 3
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
      // >50% threshold cross-multiplied (qty * 2 > total) — exact
      // DECIMAL compare, no division.
      "q20_qty_concentration" ->
        """WITH shipped AS (
          |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sup_qty
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_type = 'PROMO'
          |    AND epoch_ms(l_shipdate) >= 820454400000 AND epoch_ms(l_shipdate) < 852076800000
          |  GROUP BY 1, 2),
          |tot AS (
          |  SELECT l_partkey, sum(sup_qty) AS total_qty FROM shipped GROUP BY 1)
          |SELECT DISTINCT s_suppkey, s_name, n_name
          |FROM shipped
          |JOIN tot ON shipped.l_partkey = tot.l_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE sup_qty * 2 > total_qty
          |ORDER BY s_suppkey""".stripMargin,
      "q21_late_supplier" ->
        """WITH li AS (
          |  SELECT l_orderkey, l_suppkey, l_shipdate
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_orderstatus = 'F'),
          |per_order AS (
          |  SELECT l_orderkey, max(l_shipdate) AS max_ship,
          |         count(DISTINCT l_suppkey) AS n_supp
          |  FROM li GROUP BY 1),
          |at_max AS (
          |  SELECT li.l_orderkey, min(l_suppkey) AS late_supp,
          |         count(DISTINCT l_suppkey) AS n_at_max
          |  FROM li JOIN per_order ON li.l_orderkey = per_order.l_orderkey AND l_shipdate = max_ship
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, count(*) AS numwait
          |FROM at_max
          |JOIN per_order ON at_max.l_orderkey = per_order.l_orderkey
          |JOIN supplier ON late_supp = s_suppkey
          |WHERE n_supp >= 2 AND n_at_max = 1
          |GROUP BY 1, 2
          |ORDER BY numwait DESC, s_suppkey
          |LIMIT 20""".stripMargin,
      // Positive-average threshold cross-multiplied (bal * n > sum) —
      // exact DECIMAL compare, no division.
      "q22_dormant" ->
        """WITH pool AS (
          |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
          |  FROM customer
          |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')),
          |thresh AS (
          |  SELECT sum(bal) AS sum_pos, count(*) AS n_pos FROM pool WHERE bal > 0)
          |SELECT c_mktsegment, count(*) AS numcust, CAST(sum(bal) AS DOUBLE) AS totacctbal
          |FROM pool, thresh
          |WHERE bal * n_pos > sum_pos
          |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |                  AND epoch_ms(o_orderdate) >= 915148800000)
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "q10_returns" ->
        """WITH rev AS (
          |  SELECT o_custkey,
          |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          |         count(*) AS n_items
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE l_returnflag = 'R'
          |    AND epoch_ms(o_orderdate) >= 820454400000 AND epoch_ms(o_orderdate) < 828316800000
          |  GROUP BY 1)
          |SELECT c_custkey, c_name, n_name, revenue, n_items
          |FROM rev JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
      // Threshold cross-multiplied into exact DECIMAL space: qty < 0.2*avg
      // <=> qty * n * 5 < sum_qty — no division before the final output.
      "q17_small_qty" ->
        """WITH pp AS (
          |  SELECT l_partkey,
          |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
          |         count(*) AS n_li
          |  FROM lineitem GROUP BY 1)
          |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
          |       count(*) AS n_small
          |FROM lineitem JOIN pp USING (l_partkey)
          |WHERE CAST(l_quantity AS DECIMAL(18,2)) * n_li * 5 < sum_qty""".stripMargin,
      "q_revenue_share" ->
        """WITH pn AS (
          |  SELECT n_name,
          |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_dec
          |  FROM lineitem
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  GROUP BY 1)
          |SELECT n_name,
          |       CAST(rev_dec AS DOUBLE) AS revenue,
          |       round(CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS share
          |FROM pn ORDER BY n_name""".stripMargin,
      "q18_large_orders" ->
        """WITH big AS (
          |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
          |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
          |SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS odate_ms,
          |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
          |       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
          |FROM orders JOIN big ON o_orderkey = l_orderkey
          |ORDER BY sum_qty DESC, o_orderkey LIMIT 20""".stripMargin,
      "e_funnel" ->
        """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
          |w1 AS (SELECT user_id, ts_ms, event_type,
          |         min(CASE WHEN event_type = 'signup' THEN ts_ms END)
          |           OVER (PARTITION BY user_id) AS t1 FROM ev),
          |w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts_ms >= t1 THEN ts_ms END)
          |         OVER (PARTITION BY user_id) AS t2 FROM w1),
          |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_ms >= t2 THEN ts_ms END)
          |         OVER (PARTITION BY user_id) AS t3 FROM w2),
          |u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3 FROM w3 GROUP BY 1)
          |SELECT count(*) AS n_users,
          |       count(t1) AS n_signup,
          |       count(t2) AS n_signup_view,
          |       count(t3) AS n_full_funnel,
          |       CAST(sum(t3 - t1) AS BIGINT) AS sum_conv_ms
          |FROM u""".stripMargin,
      "e_retention" ->
        """WITH ev AS (
          |  SELECT user_id, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms FROM events),
          |c AS (
          |  SELECT user_id, day_ms,
          |         min(day_ms) OVER (PARTITION BY user_id) AS cohort_day
          |  FROM ev)
          |SELECT cohort_day, (day_ms - cohort_day) // 86400000 AS day_offset,
          |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // e_approx_distinct / e_approx_quantiles: sketch values are
      // engine-specific, so the gated columns are the group keys, the
      // EXACT counts, and integer accuracy verdicts the Spark side
      // computes from its own sketch — the oracle pins the verdicts as
      // literal 1s (the sketch must sit inside its accuracy envelope
      // for the hash to match). Raw estimates stay spec-gated in
      // LlmOpsSpec.
      "e_approx_distinct" ->
        """SELECT event_type,
          |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
          |       CAST(1 AS BIGINT) AS within_5pct
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      // e_rolling_distinct: same verdict-gate shape — the oracle
      // replays the EXACT trailing-7-day distinct (windows anchored on
      // days present in the data) and pins the sketch-vs-exact verdict
      // as a literal 1; the per-day-HLL-union estimate itself is
      // engine-specific and stays spec-gated in SketchSpec.
      "e_rolling_distinct" ->
        """WITH du AS (
          |  SELECT DISTINCT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          |         user_id
          |  FROM events),
          |days AS (SELECT DISTINCT day_ms FROM du)
          |SELECT d.day_ms,
          |       CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_exact,
          |       CAST(1 AS BIGINT) AS within_5pct
          |FROM days d
          |JOIN du u ON u.day_ms BETWEEN d.day_ms - 6 * 86400000 AND d.day_ms
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // e_kll_quantiles: same rank-verdict shape, but the estimates come
      // from per-(type, day) KLL sketches folded through kll_merge_agg —
      // the mergeable-artifact path is what the gate exercises.
      "e_kll_quantiles" ->
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |       CAST(1 AS BIGINT) AS p50_ok,
          |       CAST(1 AS BIGINT) AS p90_ok,
          |       CAST(1 AS BIGINT) AS p99_ok
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_approx_quantiles" ->
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |       CAST(1 AS BIGINT) AS p50_ok,
          |       CAST(1 AS BIGINT) AS p90_ok,
          |       CAST(1 AS BIGINT) AS p99_ok
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_price_deciles" ->
        """WITH qs AS (
          |  SELECT quantile_cont(o_totalprice,
          |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
          |  FROM orders),
          |b AS (
          |  SELECT o_totalprice,
          |         CAST((CASE WHEN o_totalprice > q[1] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[2] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[3] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[4] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[5] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[6] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[7] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[8] THEN 1 ELSE 0 END) +
          |              (CASE WHEN o_totalprice > q[9] THEN 1 ELSE 0 END) AS INT) AS decile
          |  FROM orders, qs)
          |SELECT decile, count(*) AS n,
          |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS lo,
          |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS hi,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_resample_ffill" ->
        """WITH ev AS (
          |  SELECT user_id, epoch_ms(ts) // 3600000 AS h, value FROM events),
          |hourly AS (
          |  SELECT user_id, h, count(*) AS n_events,
          |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s
          |  FROM ev GROUP BY 1, 2),
          |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
          |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds),
          |j AS (
          |  SELECT g.user_id, g.h, coalesce(a.n_events, 0) AS n_events, a.s
          |  FROM grid g LEFT JOIN hourly a USING (user_id, h))
          |SELECT user_id, h * 3600000 AS hour_ms, n_events,
          |       round(coalesce(last_value(s IGNORE NULLS) OVER
          |         (PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING), 0), 6) AS filled_sum
          |FROM j ORDER BY user_id, hour_ms""".stripMargin,
      // CUSUM closed form S_t = P_t - min(0, running-min P): integer
      // algebra on the m-scaled centered series (y = m*x - S, no
      // per-row division), one long->double division at the end —
      // bit-replayable; intermediate HUGEINT sums never reach the
      // select list
      "e_cusum_changepoint" ->
        """WITH hourly AS (
          |  SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |t AS (
          |  SELECT event_type, h, x,
          |         count(*) OVER (PARTITION BY event_type) AS m,
          |         sum(x) OVER (PARTITION BY event_type) AS s
          |  FROM hourly),
          |p AS (
          |  SELECT event_type, h, m,
          |         sum(m * x - s) OVER (PARTITION BY event_type ORDER BY h
          |           ROWS UNBOUNDED PRECEDING) AS p
          |  FROM t),
          |c AS (
          |  SELECT event_type, h, m,
          |         p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY h
          |           ROWS UNBOUNDED PRECEDING)) AS cusum
          |  FROM p),
          |r AS (
          |  SELECT event_type, h, m, cusum,
          |         row_number() OVER (PARTITION BY event_type
          |           ORDER BY cusum DESC, h) AS rn
          |  FROM c)
          |SELECT event_type, CAST(m AS BIGINT) AS n_hours,
          |       h * 3600000 AS peak_hour_ms,
          |       CAST(cusum AS DOUBLE) / CAST(m AS DOUBLE) AS peak_excess
          |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
      // RANGE frame keyed on the millisecond VALUE: simultaneous events
      // share a frame, so the count is tie-order-free; integers only
      // OHLC spec: open/close are arg-extrema over the same packed
      // collision-free order key the Spark side ranks min_by/max_by on.
      "e_ohlc" ->
        """WITH e AS (
          |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value FROM events)
          |SELECT user_id, ts_ms // 3600000 AS hour,
          |       arg_min(value, ts_ms * 1000000 + event_id) AS open,
          |       max(value) AS high, min(value) AS low,
          |       arg_max(value, ts_ms * 1000000 + event_id) AS close,
          |       count(*) AS n_events,
          |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM e GROUP BY 1, 2 ORDER BY user_id, hour""".stripMargin,
      // TWAP spec: each value weighted by its holding time (until the
      // user's next event); last event weightless. Weighted sum exact
      // in DECIMAL x BIGINT; the one division happens on settled
      // doubles, 6-dp rounded (the library-wide policy).
      "e_twap" ->
        """WITH e AS (
          |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value FROM events),
          |g AS (
          |  SELECT user_id, value,
          |         lead(ts_ms) OVER (PARTITION BY user_id
          |           ORDER BY ts_ms, event_id) - ts_ms AS dt
          |  FROM e)
          |SELECT user_id, count(*) AS n_segments,
          |       CAST(sum(dt) AS BIGINT) AS span_ms,
          |       CAST(round(CAST(round(
          |         CAST(sum(CAST(value AS DECIMAL(18,4)) * dt) AS DOUBLE)
          |             / nullif(CAST(sum(dt) AS DOUBLE), 0), 12)
          |         AS DECIMAL(38,12)), 6) AS DOUBLE) AS twap
          |FROM g WHERE dt IS NOT NULL
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // Interval-union spec: variable-length intervals (floor(value *
      // 1e4) ms), islands split where a start clears the RUNNING MAX of
      // prior ends, coverage summed per island then per user.
      // Seasonal-exceedance spec: the 2x hour-of-day baseline test as
      // an integer cross-multiplication (u*n > 2*s) on the 1e-4 grid —
      // no division, no float threshold, replays in any engine.
      "e_seasonal_baseline" ->
        """WITH e AS (
          |  SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hod,
          |         CAST(floor(value * 10000) AS BIGINT) AS u
          |  FROM events),
          |b AS (
          |  SELECT event_type, hod, CAST(sum(u) AS BIGINT) AS s,
          |         count(*) AS n
          |  FROM e GROUP BY 1, 2),
          |b2 AS (
          |  SELECT *, count(*) OVER (PARTITION BY event_type) AS n_hods
          |  FROM b)
          |SELECT e.event_type, count(*) AS n_events,
          |       CAST(max(b2.n_hods) AS BIGINT) AS n_hods,
          |       CAST(sum(CASE WHEN e.u * b2.n > 2 * b2.s
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_excess
          |FROM e JOIN b2 USING (event_type, hod)
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_interval_union" ->
        """WITH e AS (
          |  SELECT user_id, epoch_ms(ts) AS start_ms, event_id,
          |         epoch_ms(ts) + CAST(floor(value * 10000) AS BIGINT) AS end_ms
          |  FROM events),
          |m AS (
          |  SELECT user_id, start_ms, event_id, end_ms,
          |         max(end_ms) OVER (PARTITION BY user_id
          |           ORDER BY start_ms, event_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |           AS prev_max_end
          |  FROM e),
          |f AS (
          |  SELECT user_id, start_ms, event_id, end_ms,
          |         CASE WHEN prev_max_end IS NULL OR start_ms > prev_max_end
          |              THEN 1 ELSE 0 END AS new_island
          |  FROM m),
          |i AS (
          |  SELECT user_id, start_ms, end_ms,
          |         sum(new_island) OVER (PARTITION BY user_id
          |           ORDER BY start_ms, event_id ROWS UNBOUNDED PRECEDING)
          |           AS island
          |  FROM f),
          |isl AS (
          |  SELECT user_id, island, min(start_ms) AS i_start,
          |         max(end_ms) AS i_end
          |  FROM i GROUP BY 1, 2)
          |SELECT user_id, count(*) AS n_islands,
          |       CAST(sum(i_end - i_start) AS BIGINT) AS covered_ms,
          |       max(i_end - i_start) AS longest_ms
          |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_burst_detect" ->
        """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
          |b AS (
          |  SELECT user_id, ms,
          |         count(*) OVER (PARTITION BY user_id ORDER BY ms
          |           RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS burst,
          |         count(*) OVER (PARTITION BY user_id) AS n_events
          |  FROM ev),
          |r AS (
          |  SELECT user_id, ms, burst, n_events,
          |         row_number() OVER (PARTITION BY user_id
          |           ORDER BY burst DESC, ms) AS rn
          |  FROM b)
          |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
          |       CAST(burst AS BIGINT) AS peak_24h, ms AS peak_ms
          |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
      "e_anomaly_zscore" ->
        """WITH s AS (
          |  SELECT event_type, count(*) AS n,
          |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
          |         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
          |  FROM events GROUP BY 1),
          |st AS (
          |  SELECT event_type, s/n AS mean, sqrt((ss - s*s/n)/n) AS std FROM s)
          |SELECT e.event_type, count(*) AS n_anomalies,
          |       round(min(value), 6) AS min_val,
          |       round(max(value), 6) AS max_val
          |FROM events e JOIN st USING (event_type)
          |WHERE abs(value - mean) > 3 * std
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_event_gaps" ->
        """WITH ev AS (
          |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
          |g AS (
          |  SELECT user_id,
          |         ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS gap
          |  FROM ev)
          |SELECT user_id, count(*) AS n_gaps,
          |       min(gap) AS min_gap_ms, max(gap) AS max_gap_ms,
          |       CAST(sum(gap) AS BIGINT) AS sum_gap_ms
          |FROM g WHERE gap IS NOT NULL
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "e_type_pivot" ->
        """SELECT user_id,
          |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
          |       count(*) FILTER (WHERE event_type = 'error') AS n_error,
          |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
          |       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
          |       count(*) FILTER (WHERE event_type = 'view') AS n_view
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      "t_vocab_growth" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |t AS (
          |  SELECT doc_id // 10 AS bucket, w[i] || ' ' || w[i+1] AS term
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS u(i)),
          |f AS (SELECT term, min(bucket) AS first_bucket FROM t GROUP BY 1),
          |g AS (SELECT first_bucket, count(*) AS n_new_terms FROM f GROUP BY 1)
          |SELECT first_bucket, n_new_terms,
          |       CAST(sum(n_new_terms) OVER (ORDER BY first_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
          |FROM g ORDER BY 1""".stripMargin,
      "d_dup_by_source" ->
        """SELECT source, count(*) AS n_docs,
          |       count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_distinct,
          |       count(*) - count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_dups
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_dedup_exact" ->
        """SELECT count(*) AS n_docs,
          |       count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_distinct,
          |       count(*) - count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_dups
          |FROM documents""".stripMargin,
      "d_dedup_keep" ->
        """SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
          |       min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
      "t_top_terms" ->
        """WITH t AS (
          |  SELECT DISTINCT doc_id, tok AS term
          |  FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(tok))
          |SELECT term, count(*) AS df FROM t GROUP BY 1
          |ORDER BY df DESC, term LIMIT 50""".stripMargin,
      // Connected components over the >= 0.8 exact-Jaccard dup pairs:
      // transitive closure by recursive label flow along (bidirected)
      // edges; min reachable id per node == component min.
      // d_dup_clusters_lp executes distributed min-label propagation;
      // its contract is the same connected components, same oracle.
      "d_dup_clusters_lp" ->
        """WITH RECURSIVE toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |edges AS (SELECT id1 AS a, id2 AS b FROM dup UNION ALL SELECT id2, id1 FROM dup),
          |reach(node, lbl) AS (
          |  SELECT a, a FROM edges
          |  UNION
          |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node)
          |SELECT node AS doc_id, min(lbl) AS cluster_id
          |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_dup_clusters" ->
        """WITH RECURSIVE toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |edges AS (SELECT id1 AS a, id2 AS b FROM dup UNION ALL SELECT id2, id1 FROM dup),
          |reach(node, lbl) AS (
          |  SELECT a, a FROM edges
          |  UNION
          |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node)
          |SELECT node AS doc_id, min(lbl) AS cluster_id
          |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_ngram_jaccard" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
          |SELECT id1, id2,
          |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
          |ORDER BY id1, id2""".stripMargin,
      // d_jaccard_prefix executes the prefix-filtered AllPairs strategy;
      // its CONTRACT is the exact >= 0.8 join, so the oracle is the same
      // exact SQL — the gate re-proves the filter lossless every run.
      "d_jaccard_prefix" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
          |SELECT id1, id2,
          |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
          |ORDER BY id1, id2""".stripMargin,
      // b-bit MinHash calibration: md5-32-bit hash fold (the proven
      // cross-engine form), exact integer minima, dyadic estimator
      // division; j_exact is the sibling query's raw single division
      "d_bbit_minhash" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |pj AS (
          |  SELECT id1, id2,
          |         CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS j_exact
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1
          |            JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |gh AS (
          |  SELECT doc_id,
          |         list_reduce(list_transform(range(1, 9),
          |           k -> CAST(strpos('0123456789abcdef', substr(h, k, 1)) - 1
          |             AS BIGINT)), (x, y) -> x * 16 + y) AS a,
          |         list_reduce(list_transform(range(9, 17),
          |           k -> CAST(strpos('0123456789abcdef', substr(h, k, 1)) - 1
          |             AS BIGINT)), (x, y) -> x * 16 + y) AS b
          |  FROM (SELECT doc_id, md5(g) AS h FROM grams)),
          |hb AS (
          |  SELECT doc_id, i, min((a + i * b) % 4294967296) AS mh
          |  FROM gh, UNNEST(range(0, 64)) AS t(i)
          |  GROUP BY 1, 2),
          |bits AS (SELECT doc_id, i, mh % 2 AS bit FROM hb)
          |SELECT p.id1, p.id2,
          |       CAST(sum(CASE WHEN b1.bit = b2.bit THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_agree,
          |       CAST(2 * sum(CASE WHEN b1.bit = b2.bit THEN 1 ELSE 0 END) - 64
          |         AS DOUBLE) / 64 AS j_est,
          |       p.j_exact
          |FROM pj p JOIN bits b1 ON b1.doc_id = p.id1
          |          JOIN bits b2 ON b2.doc_id = p.id2 AND b2.i = b1.i
          |GROUP BY p.id1, p.id2, p.j_exact
          |ORDER BY p.id1, p.id2""".stripMargin,
      // Readability: integer terminator/word/char sums, two single
      // long->double divisions — no rounding grid needed
      "t_readability" ->
        """WITH d AS (
          |  SELECT source,
          |         len(list_filter(string_split(trim(text), ' '),
          |           x -> len(x) > 0)) AS w,
          |         length(text) - length(translate(text, '.!?', '')) AS st,
          |         length(translate(text, ' ', '')) AS ch
          |  FROM documents)
          |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(w) AS BIGINT) AS n_words,
          |       CAST(sum(st) AS BIGINT) AS n_sentences,
          |       CAST(sum(w) AS DOUBLE) / CAST(greatest(sum(st), 1) AS DOUBLE)
          |         AS words_per_sentence,
          |       CAST(sum(ch) AS DOUBLE) / CAST(greatest(sum(w), 1) AS DOUBLE)
          |         AS chars_per_word
          |FROM d GROUP BY source ORDER BY source""".stripMargin,
      "d_minhash_lsh" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
          |SELECT id1, id2,
          |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
          |ORDER BY id1, id2""".stripMargin,
      // Full SimHash replay: md5-derived int64 token hash (identical in
      // both engines), per-bit +/-1 counts, sign-rule signature (assembled
      // in HUGEINT - BIGINT shifts overflow-check), 8x8-bit band join,
      // hamming via bit_count(xor). >> is arithmetic in both engines; the
      // & masks make that irrelevant.
      "d_simhash" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
          |u AS (
          |  SELECT doc_id,
          |         list_reduce(
          |           list_transform(range(1, 17),
          |             i -> (strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1)::HUGEINT),
          |           (a, b) -> a * 16 + b) AS uh
          |  FROM toks),
          |hv AS (
          |  SELECT doc_id,
          |         CAST(uh - (CASE WHEN uh >= 9223372036854775808::HUGEINT
          |                         THEN 18446744073709551616::HUGEINT
          |                         ELSE 0::HUGEINT END) AS BIGINT) AS h
          |  FROM u),
          |bits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
          |  FROM hv, UNNEST(range(0, 64)) AS t(b) GROUP BY 1, 2),
          |sig AS (
          |  SELECT doc_id,
          |         CAST(sum(CASE WHEN cnt > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |              - (CASE WHEN sum(CASE WHEN cnt > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |                           >= 9223372036854775808::HUGEINT
          |                      THEN 18446744073709551616::HUGEINT
          |                      ELSE 0::HUGEINT END) AS BIGINT) AS sim
          |  FROM bits GROUP BY 1),
          |banded AS (
          |  SELECT doc_id, sim, k AS band, (sim >> (k * 8)) & 255 AS bh
          |  FROM sig, UNNEST(range(0, 8)) AS t(k)),
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
          |         CAST(bit_count(xor(x.sim, y.sim)) AS INT) AS hamming
          |  FROM banded x JOIN banded y
          |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
          |SELECT id1, id2, hamming FROM cand WHERE hamming <= 6 ORDER BY id1, id2""".stripMargin,
      // Wide (128-bit) SimHash: md5's FULL digest per token as two
      // signed int64 halves, 8x16-bit bands (k<4 slice the low half,
      // k>=4 the high), two-half hamming, threshold <= 7. Same
      // HUGEINT->BIGINT signed-cast and shift-mask tricks as d_simhash.
      "d_simhash_wide" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
          |u AS (
          |  SELECT doc_id,
          |         list_reduce(
          |           list_transform(range(1, 17),
          |             i -> (strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1)::HUGEINT),
          |           (a, b) -> a * 16 + b) AS uhi,
          |         list_reduce(
          |           list_transform(range(17, 33),
          |             i -> (strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1)::HUGEINT),
          |           (a, b) -> a * 16 + b) AS ulo
          |  FROM toks),
          |hv AS (
          |  SELECT doc_id,
          |         CAST(uhi - (CASE WHEN uhi >= 9223372036854775808::HUGEINT
          |                          THEN 18446744073709551616::HUGEINT
          |                          ELSE 0::HUGEINT END) AS BIGINT) AS hhi,
          |         CAST(ulo - (CASE WHEN ulo >= 9223372036854775808::HUGEINT
          |                          THEN 18446744073709551616::HUGEINT
          |                          ELSE 0::HUGEINT END) AS BIGINT) AS hlo
          |  FROM u),
          |bits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (hlo >> b) & 1 = 1 THEN 1 ELSE -1 END) AS clo,
          |         sum(CASE WHEN (hhi >> b) & 1 = 1 THEN 1 ELSE -1 END) AS chi
          |  FROM hv, UNNEST(range(0, 64)) AS t(b) GROUP BY 1, 2),
          |sig AS (
          |  SELECT doc_id,
          |         CAST(sum(CASE WHEN clo > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |              - (CASE WHEN sum(CASE WHEN clo > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |                           >= 9223372036854775808::HUGEINT
          |                      THEN 18446744073709551616::HUGEINT
          |                      ELSE 0::HUGEINT END) AS BIGINT) AS slo,
          |         CAST(sum(CASE WHEN chi > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |              - (CASE WHEN sum(CASE WHEN chi > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
          |                           >= 9223372036854775808::HUGEINT
          |                      THEN 18446744073709551616::HUGEINT
          |                      ELSE 0::HUGEINT END) AS BIGINT) AS shi
          |  FROM bits GROUP BY 1),
          |banded AS (
          |  SELECT doc_id, shi, slo, k AS band,
          |         CASE WHEN k < 4 THEN (slo >> (k * 16)) & 65535
          |              ELSE (shi >> ((k - 4) * 16)) & 65535 END AS bh
          |  FROM sig, UNNEST(range(0, 8)) AS t(k)),
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
          |         CAST(bit_count(xor(x.shi, y.shi))
          |              + bit_count(xor(x.slo, y.slo)) AS INT) AS hamming
          |  FROM banded x JOIN banded y
          |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
          |SELECT id1, id2, hamming FROM cand WHERE hamming <= 7 ORDER BY id1, id2""".stripMargin,
      "t_tokens" ->
        """SELECT doc_id,
          |       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_ws_tokens,
          |       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,
      "d_chunk_dedup" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
          |chunks AS (
          |  SELECT doc_id, i AS chunk_idx,
          |         md5(array_to_string(ts[(i*32+1):(i*32+32)], ' ')) AS fp
          |  FROM toks,
          |       LATERAL unnest(generate_series(0, CAST(ceil(len(ts)/32.0) AS BIGINT) - 1)) AS g(i)),
          |first AS (
          |  SELECT fp, min(doc_id * 1000000 + chunk_idx) AS first_key
          |  FROM chunks GROUP BY 1),
          |flagged AS (
          |  SELECT c.doc_id,
          |         CASE WHEN c.doc_id * 1000000 + c.chunk_idx = f.first_key
          |              THEN 1 ELSE 0 END AS kept
          |  FROM chunks c JOIN first f USING (fp))
          |SELECT doc_id, count(*) AS n_chunks,
          |       CAST(sum(kept) AS BIGINT) AS n_kept,
          |       CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
          |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_chunk_incremental" ->
        """WITH toks AS (
          |  SELECT doc_id, source, string_split(trim(text), ' ') AS ts FROM documents),
          |chunks AS (
          |  SELECT doc_id, source,
          |         md5(array_to_string(ts[(i*32+1):(i*32+32)], ' ')) AS fp
          |  FROM toks,
          |       LATERAL unnest(generate_series(0, CAST(ceil(len(ts)/32.0) AS BIGINT) - 1)) AS g(i)),
          |corpus AS (SELECT DISTINCT fp FROM chunks WHERE source <> 'src12')
          |SELECT c.doc_id, count(*) AS n_chunks,
          |       CAST(sum(CASE WHEN corpus.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
          |FROM chunks c LEFT JOIN corpus ON c.fp = corpus.fp
          |WHERE c.source = 'src12'
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "p_adaptive_len" ->
        """WITH b AS (
          |  SELECT source, quantile_cont(n_chars, 0.10) AS p10,
          |         quantile_cont(n_chars, 0.90) AS p90
          |  FROM documents GROUP BY 1)
          |SELECT doc_id, d.source, n_chars
          |FROM documents d JOIN b ON d.source = b.source
          |WHERE n_chars >= p10 AND n_chars <= p90
          |ORDER BY doc_id""".stripMargin,
      "t_hapax" ->
        """WITH tf AS (
          |  SELECT source, u.w AS w, count(*) AS tf
          |  FROM documents, unnest(string_split(trim(text), ' ')) AS u(w)
          |  GROUP BY 1, 2)
          |SELECT source, count(*) AS vocab,
          |       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          |       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hapax_ratio
          |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,
      "t_bpe_pairs" ->
        """WITH wc AS (
          |  SELECT u.w AS w, count(*) AS c
          |  FROM documents, unnest(string_split(trim(text), ' ')) AS u(w)
          |  GROUP BY 1),
          |pairs AS (
          |  SELECT substr(w, i, 2) AS pair, c
          |  FROM wc, UNNEST(generate_series(1, length(w) - 1)) AS t(i)
          |  WHERE length(w) >= 2)
          |SELECT pair, CAST(sum(c) AS BIGINT) AS freq
          |FROM pairs GROUP BY 1
          |ORDER BY freq DESC, pair LIMIT 50""".stripMargin,
      "t_winnow" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
          |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
          |wins AS (
          |  SELECT doc_id, pos AS j,
          |         min(h) OVER win AS minh,
          |         count(*) OVER win AS cnt
          |  FROM grams
          |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
          |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
          |selw AS (
          |  SELECT s.doc_id, s.j, s.minh AS h, min(g.pos) AS pos
          |  FROM wins s JOIN grams g
          |    ON g.doc_id = s.doc_id AND g.pos BETWEEN s.j AND s.j + 3 AND g.h = s.minh
          |  WHERE s.cnt = 4
          |  GROUP BY 1, 2, 3),
          |sel AS (SELECT DISTINCT doc_id, pos, h FROM selw),
          |n AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1)
          |SELECT n.doc_id, n.n_grams,
          |       count(*) AS n_fps,
          |       md5(string_agg(sel.h, '' ORDER BY sel.pos)) AS digest
          |FROM n JOIN sel USING (doc_id)
          |WHERE n.n_grams >= 4
          |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
      "d_winnow_overlap" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
          |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
          |wins AS (
          |  SELECT doc_id, pos AS j,
          |         min(h) OVER win AS minh,
          |         count(*) OVER win AS cnt
          |  FROM grams
          |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
          |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
          |sel AS (SELECT DISTINCT doc_id, minh AS h FROM wins WHERE cnt = 4)
          |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
          |FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Stop-fingerprint variant: fingerprints shared by > 4 docs are
      // dropped before the pair census (the MOSS df-cap shape).
      "d_winnow_capped" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
          |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
          |wins AS (
          |  SELECT doc_id, pos AS j,
          |         min(h) OVER win AS minh,
          |         count(*) OVER win AS cnt
          |  FROM grams
          |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
          |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
          |sel AS (SELECT DISTINCT doc_id, minh AS h FROM wins WHERE cnt = 4),
          |live AS (SELECT h FROM sel GROUP BY h HAVING count(*) BETWEEN 2 AND 4)
          |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
          |FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
          |JOIN live l ON l.h = a.h
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Bounded winnow consumer: per-doc top-3 partners by shared
      // fingerprints, tie on lower partner id — the exact comparator
      // TopKAggregator uses, so the rank cut is engine-deterministic.
      "d_winnow_topk" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT doc_id, i AS pos, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
          |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
          |wins AS (
          |  SELECT doc_id, pos AS j,
          |         min(h) OVER win AS minh,
          |         count(*) OVER win AS cnt
          |  FROM grams
          |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
          |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
          |sel AS (SELECT DISTINCT doc_id, minh AS h FROM wins WHERE cnt = 4),
          |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
          |          FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
          |          GROUP BY 1, 2),
          |sym AS (SELECT id1 AS doc_id, id2 AS partner_id, n_shared FROM pairs
          |        UNION ALL
          |        SELECT id2 AS doc_id, id1 AS partner_id, n_shared FROM pairs),
          |ranked AS (SELECT doc_id, partner_id, n_shared,
          |                  row_number() OVER (PARTITION BY doc_id
          |                    ORDER BY n_shared DESC, partner_id) AS rnk
          |           FROM sym)
          |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, partner_id,
          |       CAST(n_shared AS BIGINT) AS n_shared
          |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
      "t_quality" ->
        """WITH q AS (
          |  SELECT doc_id, n_chars,
          |         string_split(trim(text), ' ') AS w,
          |         CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha
          |  FROM documents)
          |SELECT doc_id,
          |       CAST(len(w) AS BIGINT) AS n_tokens,
          |       CAST(n_chars AS DOUBLE) / len(w) AS avg_token_len,
          |       CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
          |       CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / len(w) AS stopword_ratio
          |FROM q ORDER BY doc_id""".stripMargin,
      "t_langid" ->
        """WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
          |s AS (
          |  SELECT doc_id, lang,
          |         CAST(len(list_filter(w, x -> x IN ('the','and','of','is'))) AS BIGINT) AS c_en,
          |         CAST(len(list_filter(w, x -> x IN ('der','und','die','ist'))) AS BIGINT) AS c_de,
          |         CAST(len(list_filter(w, x -> x IN ('le','et','les','est'))) AS BIGINT) AS c_fr,
          |         CAST(len(list_filter(w, x -> x IN ('el','y','los','es'))) AS BIGINT) AS c_es
          |  FROM t)
          |SELECT doc_id, lang, c_en, c_de, c_fr, c_es,
          |       CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
          |            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
          |            WHEN c_fr >= c_es THEN 'fr'
          |            ELSE 'es' END AS pred_lang
          |FROM s ORDER BY doc_id""".stripMargin,
      // Byte-based to match RollingHash (UTF-8 bytes, B=257, P=2^61-1):
      // DuckDB blobs aren't indexable, so bytes come from hex() pairs.
      "t_rolling_fp" ->
        """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
          |SELECT doc_id,
          |       CAST(list_reduce(
          |         list_prepend(0::HUGEINT,
          |           list_transform(range(1, length(hx) // 2 + 1),
          |             i -> (16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
          |                   + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1))::HUGEINT)),
          |         (a, b) -> (a * 257 + b) % 2305843009213693951::HUGEINT) AS BIGINT) AS fp
          |FROM h ORDER BY doc_id""".stripMargin,
      "t_repetition" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |d AS (SELECT doc_id, count(*) AS n_distinct_3g FROM grams GROUP BY 1),
          |n AS (SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
          |      FROM documents)
          |SELECT n.doc_id, n.n_tokens, d.n_distinct_3g,
          |       round(1 - CAST(d.n_distinct_3g AS DOUBLE) / (n.n_tokens - 2), 6) AS rep_ratio
          |FROM n JOIN d USING (doc_id) WHERE n.n_tokens >= 3 ORDER BY doc_id""".stripMargin,
      "t_corpus_stats" ->
        """SELECT source,
          |       count(*) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
          |       round(avg(n_chars), 6) AS avg_chars,
          |       min(n_chars) AS min_chars,
          |       max(n_chars) AS max_chars,
          |       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
          |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_decontam" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
          |SELECT c.doc_id, count(*) AS n_shared
          |FROM grams c JOIN bench USING (g)
          |WHERE c.source <> 'src0'
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // d_decontam_bloom executes the bloom-prefiltered strategy but its
      // CONTRACT is exact decontamination (the exact join removes bloom
      // false positives), so the oracle is the same exact SQL.
      "d_decontam_bloom" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
          |SELECT c.doc_id, count(*) AS n_shared
          |FROM grams c JOIN bench USING (g)
          |WHERE c.source <> 'src0'
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "d_df_prune" ->
        """WITH nn AS (SELECT count(*) AS n FROM documents),
          |t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |terms AS (SELECT DISTINCT doc_id, tok FROM t, UNNEST(w) AS u(tok)),
          |dfreq AS (SELECT tok, count(*) AS df FROM terms GROUP BY 1),
          |freq AS (SELECT tok FROM dfreq, nn WHERE df > 0.5 * n),
          |pos AS (SELECT doc_id, i, w[i] AS tok
          |        FROM t, UNNEST(generate_series(1, len(w))) AS g(i)),
          |kept AS (SELECT doc_id, i, tok FROM pos
          |         WHERE tok NOT IN (SELECT tok FROM freq)),
          |agg AS (SELECT doc_id, count(*) AS n_kept,
          |               string_agg(tok, ' ' ORDER BY i) AS pruned
          |        FROM kept GROUP BY 1)
          |SELECT d.doc_id,
          |       coalesce(a.n_kept, 0) AS n_kept,
          |       md5(coalesce(a.pruned, '')) AS pruned_md5
          |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t_redact" ->
        """SELECT doc_id,
          |       CAST(len(regexp_extract_all(text, '\b(customer|key|value)\b')) AS BIGINT) AS n_masked,
          |       CAST(length(regexp_replace(text, '\b(customer|key|value)\b', '<MASK>', 'g')) AS BIGINT) AS n_chars_redacted,
          |       md5(regexp_replace(text, '\b(customer|key|value)\b', '<MASK>', 'g')) AS redacted_md5
          |FROM documents ORDER BY doc_id""".stripMargin,
      "p_pack_sequences" ->
        """WITH n AS (
          |  SELECT doc_id, source,
          |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, source, n_tokens,
          |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |                                  ROWS UNBOUNDED PRECEDING) - n_tokens
          |            AS BIGINT) AS start_tok
          |  FROM n)
          |SELECT doc_id, source, n_tokens,
          |       start_tok // 2048 AS pack_id,
          |       start_tok % 2048 AS pack_off
          |FROM c ORDER BY doc_id""".stripMargin,
      "p_mix_order" ->
        """WITH r AS (
          |  SELECT doc_id, source,
          |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn,
          |         CASE WHEN source IN ('src0','src1','src2','src3') THEN 3 ELSE 1 END AS weight
          |  FROM documents)
          |SELECT doc_id, source, rn, CAST(weight AS BIGINT) AS weight,
          |       ((rn - 1) * 3) // weight AS mix_key
          |FROM r ORDER BY mix_key, source, doc_id""".stripMargin,
      "d_edit_dist" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8)
          |SELECT id1, id2,
          |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
          |       round(1 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
          |             greatest(length(a.text), length(b.text)), 6) AS sim
          |FROM dup JOIN documents a ON a.doc_id = id1 JOIN documents b ON b.doc_id = id2
          |ORDER BY id1, id2""".stripMargin,
      "p_sample_stratified" ->
        """WITH b AS (
          |  SELECT doc_id, source,
          |         list_reduce(list_transform(range(1, 9),
          |           i -> (strpos('0123456789abcdef',
          |                        substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT),
          |           (a, b) -> a * 16 + b) % 100 AS bucket
          |  FROM documents)
          |SELECT doc_id, source, bucket FROM b
          |WHERE bucket < CASE WHEN source IN ('src0','src1','src2','src3') THEN 50 ELSE 10 END
          |ORDER BY doc_id""".stripMargin,
      "p_epoch_plan" ->
        """WITH tok AS (
          |  SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
          |  FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
          |               CAST(count(*) AS BIGINT) AS n_sources FROM tok)
          |SELECT source, n_tokens,
          |       round(n_tokens / total, 6) AS share,
          |       total // n_sources AS target_tokens,
          |       round(total / n_sources / n_tokens, 6) AS epochs
          |FROM tok, tot ORDER BY source""".stripMargin,
      "p_quota_sample" ->
        """WITH h AS (
          |  SELECT source, doc_id,
          |         list_reduce(list_transform(range(1, 9),
          |           i -> (strpos('0123456789abcdef',
          |                        substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT),
          |           (a, b) -> a * 16 + b) AS h32
          |  FROM documents),
          |r AS (
          |  SELECT source, doc_id,
          |         row_number() OVER (PARTITION BY source ORDER BY h32 DESC, doc_id) AS rnk
          |  FROM h)
          |SELECT source, rnk, doc_id FROM r WHERE rnk <= 20
          |ORDER BY source, rnk""".stripMargin,
      "p_split_assign" ->
        """WITH b AS (
          |  SELECT doc_id, source,
          |         list_reduce(list_transform(range(1, 9),
          |           i -> (strpos('0123456789abcdef',
          |                        substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT),
          |           (a, b) -> a * 16 + b) % 100 AS bucket
          |  FROM documents)
          |SELECT doc_id, source,
          |       CASE WHEN bucket < 80 THEN 'train'
          |            WHEN bucket < 90 THEN 'val'
          |            ELSE 'test' END AS split
          |FROM b ORDER BY doc_id""".stripMargin,
      // same recursive-CTE components as d_dup_clusters, then the
      // highest-alpha member (ties -> lowest id) represents each cluster
      "d_dedup_best" ->
        """WITH RECURSIVE toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |edges AS (SELECT id1 AS a, id2 AS b FROM dup UNION ALL SELECT id2, id1 FROM dup),
          |reach(node, lbl) AS (
          |  SELECT a, a FROM edges
          |  UNION
          |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
          |clus AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
          |q AS (SELECT doc_id,
          |             CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / n_chars AS alpha_ratio
          |      FROM documents),
          |r AS (SELECT c.cluster_id, c.doc_id, q.alpha_ratio,
          |             row_number() OVER (PARTITION BY c.cluster_id
          |                                ORDER BY q.alpha_ratio DESC, c.doc_id) AS rn,
          |             count(*) OVER (PARTITION BY c.cluster_id) AS n_members
          |      FROM clus c JOIN q USING (doc_id))
          |SELECT cluster_id, doc_id AS keep_id,
          |       CAST(n_members AS BIGINT) AS n_members,
          |       round(alpha_ratio, 6) AS best_alpha
          |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
      // exact >= 0.8 pairs folded to an upper-triangular source matrix
      "d_overlap_matrix" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8)
          |SELECT least(d1.source, d2.source) AS src_a,
          |       greatest(d1.source, d2.source) AS src_b,
          |       count(*) AS n_pairs
          |FROM dup JOIN documents d1 ON d1.doc_id = id1
          |         JOIN documents d2 ON d2.doc_id = id2
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "d_containment" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
          |SELECT id1, id2,
          |       CAST(inter AS DOUBLE) / least(s1.n, s2.n) AS containment
          |FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |WHERE CAST(inter AS DOUBLE) / least(s1.n, s2.n) >= 0.9
          |ORDER BY id1, id2""".stripMargin,
      // exact >= 0.8 pairs restricted to new-batch x existing-corpus;
      // no id ordering — every corpus match of a new doc reports
      "d_dedup_incremental" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS inter
          |  FROM grams n JOIN grams o ON n.g = o.g
          |  WHERE n.source = 'src12' AND o.source <> 'src12'
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)
          |SELECT new_id, old_id,
          |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |FROM pair JOIN sizes s1 ON s1.doc_id = new_id
          |          JOIN sizes s2 ON s2.doc_id = old_id
          |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
          |ORDER BY new_id, old_id""".stripMargin,
      // add-one-smoothed bigram log-probabilities; history counts come
      // from the bigram table so both engines share one definition
      "t_ngram_lm" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |b AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
          |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
          |v AS (SELECT count(DISTINCT tok) AS vsize
          |      FROM (SELECT UNNEST(w) AS tok FROM toks)),
          |s AS (SELECT doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.vsize)) AS logp
          |      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
          |SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 6) AS avg_logp
          |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
      // exact >= 0.8 lexical pairs, each also scored by embedding cosine
      "d_hybrid_verify" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2, CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
          |SELECT id1, id2, jaccard,
          |       round(list_dot_product(a.v, b.v) /
          |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
          |FROM dup JOIN e a ON a.vec_id = id1 JOIN e b ON b.vec_id = id2
          |ORDER BY id1, id2""".stripMargin,
      "d_threshold_calib" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |dup AS (
          |  SELECT id1, id2, CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |hv AS (
          |  SELECT id1, id2, jaccard,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
          |  FROM dup JOIN e a ON a.vec_id = id1 JOIN e b ON b.vec_id = id2)
          |SELECT CAST(floor(cos_sim * 5) AS BIGINT) AS cos_band, count(*) AS n_pairs,
          |       round(avg(jaccard), 6) AS avg_jaccard, round(avg(cos_sim), 6) AS avg_cos
          |FROM hv GROUP BY 1 ORDER BY 1""".stripMargin,
      // corpus-trained counts score the src12 batch; unseen bigrams hit
      // the add-one floor via left joins
      "t_lm_probe" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |b AS (
          |  SELECT doc_id, source, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
          |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b WHERE source <> 'src12' GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM b WHERE source <> 'src12' GROUP BY 1),
          |v AS (SELECT count(DISTINCT tok) AS vsize
          |      FROM (SELECT UNNEST(w) AS tok FROM toks WHERE source <> 'src12')),
          |s AS (SELECT b.doc_id,
          |             ln((coalesce(c2.c2, 0) + 1.0) / (coalesce(c1.c1, 0) + v.vsize)) AS logp
          |      FROM b LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v
          |      WHERE b.source = 'src12')
          |SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 6) AS avg_logp
          |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
      // first-corpus-occurrence novelty over distinct word-3-grams
      "t_novelty" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |fst AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY 1)
          |SELECT doc_id, count(*) AS n_grams,
          |       round(avg(CASE WHEN doc_id = first_doc THEN 1.0 ELSE 0.0 END), 6) AS novel_frac
          |FROM grams JOIN fst USING (g)
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // fraction of a doc's distinct 3-grams shared with >= 2 other docs
      "t_boilerplate" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY 1)
          |SELECT doc_id, count(*) AS n_grams,
          |       round(avg(CASE WHEN df >= 3 THEN 1.0 ELSE 0.0 END), 6) AS boiler_frac
          |FROM grams JOIN dfreq USING (g)
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // DSIR importance weight: target LM (src1) minus raw LM (all), both
      // add-one smoothed from ONE conditional-count pass per key;
      // target-unseen bigrams count 0 and hit the add-one floor directly
      "p_dsir_sample" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |b AS (
          |  SELECT doc_id, source, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
          |c2 AS (SELECT w1, w2, count(*) AS rc2,
          |              count(CASE WHEN source = 'src1' THEN 1 END) AS tc2
          |       FROM b GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS rc1,
          |              count(CASE WHEN source = 'src1' THEN 1 END) AS tc1
          |       FROM b GROUP BY 1),
          |v AS (SELECT count(DISTINCT tok) AS rvsize,
          |             count(DISTINCT CASE WHEN source = 'src1' THEN tok END) AS tvsize
          |      FROM (SELECT source, UNNEST(w) AS tok FROM toks)),
          |s AS (SELECT b.doc_id,
          |             ln((tc2 + 1.0) / (tc1 + v.tvsize))
          |           - ln((rc2 + 1.0) / (rc1 + v.rvsize)) AS lr
          |      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
          |SELECT doc_id, count(*) AS n_bigrams, round(avg(lr), 6) AS dsir_weight,
          |       CAST(round(avg(lr), 6) > 0.0 AS INT) AS selected
          |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
      // first-failing-rule attribution, same rule order as the engine
      "p_filter_report" ->
        """WITH q AS (
          |  SELECT doc_id, n_chars, text,
          |         string_split(trim(text), ' ') AS w,
          |         CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / n_chars AS alpha
          |  FROM documents),
          |m AS (
          |  SELECT doc_id, len(w) AS n_tok, alpha,
          |         1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)-1),
          |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE)
          |             / (len(w) - 2) AS rep,
          |         CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
          |             / len(w) AS stopr
          |  FROM q),
          |r AS (
          |  SELECT CASE WHEN n_tok < 15 THEN 'too_short'
          |              WHEN alpha < 0.81 THEN 'low_alpha'
          |              WHEN rep > 0.2 THEN 'high_repetition'
          |              WHEN stopr < 0.02 THEN 'low_stopword'
          |              ELSE 'pass' END AS rule
          |  FROM m)
          |SELECT rule, count(*) AS n_docs FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
      "p_clean_corpus" ->
        """WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |nd AS (SELECT doc_id, count(*) AS n_distinct_3g FROM grams GROUP BY 1),
          |base AS (
          |  SELECT t.doc_id, t.source,
          |         CAST(len(t.w) AS BIGINT) AS n_tokens,
          |         round(1 - CAST(nd.n_distinct_3g AS DOUBLE) / (len(t.w) - 2), 6) AS rep_ratio
          |  FROM toks t JOIN nd USING (doc_id)
          |  WHERE t.source <> 'src0' AND len(t.w) >= 20),
          |keepers AS (
          |  SELECT min(doc_id) AS doc_id
          |  FROM documents GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
          |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
          |contaminated AS (
          |  SELECT DISTINCT c.doc_id FROM grams c JOIN bench USING (g) WHERE c.source <> 'src0')
          |SELECT b.doc_id, b.source, b.n_tokens, b.rep_ratio
          |FROM base b
          |WHERE b.rep_ratio <= 0.5
          |  AND b.doc_id IN (SELECT doc_id FROM keepers)
          |  AND b.doc_id NOT IN (SELECT doc_id FROM contaminated)
          |ORDER BY b.doc_id""".stripMargin,
      "t_tfidf" ->
        """WITH nn AS (SELECT count(*) AS n FROM documents),
          |tf AS (
          |  SELECT doc_id, tok AS term, count(*) AS tc
          |  FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(tok)
          |  GROUP BY 1, 2),
          |dl AS (SELECT doc_id, sum(tc) AS doc_len FROM tf GROUP BY 1),
          |dfreq AS (SELECT term, count(*) AS df
          |          FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY 1),
          |scored AS (
          |  SELECT tf.doc_id, tf.term,
          |         round((tc::DOUBLE / doc_len) * ln(n::DOUBLE / df), 6) AS tfidf
          |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term), nn),
          |ranked AS (
          |  SELECT doc_id, term, tfidf,
          |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
          |  FROM scored)
          |SELECT doc_id, rnk, term, tfidf FROM ranked WHERE rnk <= 5
          |ORDER BY doc_id, rnk""".stripMargin,
      "t_char_entropy" ->
        """WITH chars AS (
          |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
          |freq AS (
          |  SELECT doc_id, ch, count(*)::DOUBLE AS c FROM chars
          |  WHERE ch <> '' GROUP BY 1, 2),
          |tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1)
          |SELECT f.doc_id, round(-sum((c / n) * log2(c / n)), 6) AS char_entropy
          |FROM freq f JOIN tot USING (doc_id)
          |GROUP BY f.doc_id ORDER BY doc_id""".stripMargin,
      "t_fingerprint" ->
        """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
          |FROM documents ORDER BY doc_id""".stripMargin,
      "m_media_meta" ->
        """SELECT doc_id,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |       sha256(text) AS sha,
          |       CAST(16 * (1 + n_chars % 64) AS INT) AS fake_width,
          |       CAST(16 * (1 + n_chars % 36) AS INT) AS fake_height
          |FROM documents ORDER BY doc_id""".stripMargin,
      // Byte-level twin of MediaPipeline.decodeAndFeaturize's
      // deterministic fake decode: payload = UTF-8 bytes (via hex pairs,
      // DuckDB blobs aren't indexable), channel sums by byte position
      // mod 3, means over third = max(n/3, 1).
      "m_media_features" ->
        """WITH h AS (
          |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, i,
          |         16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
          |           + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS byte
          |  FROM h, UNNEST(range(1, n + 1)) AS t(i)),
          |agg AS (
          |  SELECT doc_id,
          |         sum(CASE WHEN (i-1) % 3 = 0 THEN byte ELSE 0 END) AS s0,
          |         sum(CASE WHEN (i-1) % 3 = 1 THEN byte ELSE 0 END) AS s1,
          |         sum(CASE WHEN (i-1) % 3 = 2 THEN byte ELSE 0 END) AS s2
          |  FROM b GROUP BY 1)
          |SELECT h.doc_id,
          |       CAST(h.n AS BIGINT) AS n_bytes,
          |       'fake' AS format,
          |       CAST(16 * (1 + h.n % 64) AS INT) AS width,
          |       CAST(16 * (1 + h.n % 36) AS INT) AS height,
          |       round(CAST(coalesce(a.s0, 0) AS DOUBLE) / greatest(h.n // 3, 1), 6) AS mean_r,
          |       round(CAST(coalesce(a.s1, 0) AS DOUBLE) / greatest(h.n // 3, 1), 6) AS mean_g,
          |       round(CAST(coalesce(a.s2, 0) AS DOUBLE) / greatest(h.n // 3, 1), 6) AS mean_b
          |FROM h LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
      // Byte-level twin of MediaPipeline.sampleFrames' stubbed frame
      // cutter: 64-byte frames, every 4th sampled, byte-mean per frame.
      "m_frame_sample" ->
        """WITH h AS (
          |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          |  FROM documents),
          |fr AS (
          |  SELECT doc_id, CAST(f AS INT) AS frame_idx, f*64 AS start, least(f*64+64, n) AS e
          |  FROM h, UNNEST(range(0, (n + 63) // 64)) AS t(f)
          |  WHERE f % 4 = 0),
          |b AS (
          |  SELECT fr.doc_id, frame_idx, start, e,
          |         16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1))-1)
          |           + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1))-1) AS byte
          |  FROM fr JOIN h USING (doc_id), UNNEST(range(start, e)) AS u(i))
          |SELECT doc_id, frame_idx, start AS "offset", e - start AS n_sampled,
          |       round(sum(byte)::DOUBLE / (e - start), 6) AS mean_byte
          |FROM b GROUP BY doc_id, frame_idx, start, e ORDER BY doc_id, frame_idx""".stripMargin,
      "d_embed_neardup" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |pairs AS (
          |  SELECT a.vec_id AS id1, b.vec_id AS id2,
          |         list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
          |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
          |SELECT id1, id2, round(c, 6) AS cos_sim FROM pairs WHERE c >= 0.45 ORDER BY id1, id2""".stripMargin,
      // SemDeDup replay: the s_ivf_trained training CTE verbatim
      // (quantized vectors -> 2 Lloyd rounds -> final assignment), then
      // within-cell pairs on the EXACT integer dot products and the
      // min-id keeper per dropped vector.
      "d_semdedup" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |kk AS (SELECT greatest(16, CAST(ceil(count(*) / 1024.0) AS BIGINT)) AS k FROM e),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < (SELECT k FROM kk)),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |nn AS (SELECT vec_id, sqrt(list_dot_product(q, q)) AS nrm FROM e),
          |p AS (
          |  SELECT xa.vec_id AS id1, xb.vec_id AS id2, xb.cell AS cell,
          |         list_dot_product(ea.q, eb.q) / (na.nrm * nb.nrm) AS c
          |  FROM a3 xa JOIN a3 xb ON xa.cell = xb.cell AND xa.vec_id < xb.vec_id
          |  JOIN e ea ON ea.vec_id = xa.vec_id JOIN e eb ON eb.vec_id = xb.vec_id
          |  JOIN nn na ON na.vec_id = xa.vec_id JOIN nn nb ON nb.vec_id = xb.vec_id)
          |SELECT id2 AS vec_id, cell, min(id1) AS kept_by, round(arg_min(c, id1), 6) AS cos_sim
          |FROM p WHERE c > 0.4 GROUP BY 1, 2 ORDER BY 1""".stripMargin,
      // Incremental SemDeDup: cells train on the corpus side only
      // (vec_id % 7 <> 0), both sides assign against the trained
      // centroids, pairs are new-vs-corpus within a cell.
      "d_semdedup_incr" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |corp AS (SELECT * FROM e WHERE vec_id % 7 <> 0),
          |kk AS (SELECT greatest(16, CAST(ceil(count(*) / 1024.0) AS BIGINT)) AS k FROM corp),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM corp WHERE vec_id < (SELECT k FROM kk)),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT corp.vec_id, corp.q, p.cell,
          |         row_number() OVER (PARTITION BY corp.vec_id ORDER BY
          |           list_dot_product(corp.q, p.c) / (sqrt(list_dot_product(corp.q, corp.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM corp, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT corp.vec_id, corp.q, p.cell,
          |         row_number() OVER (PARTITION BY corp.vec_id ORDER BY
          |           list_dot_product(corp.q, p.c) / (sqrt(list_dot_product(corp.q, corp.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM corp, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |nn AS (SELECT vec_id, sqrt(list_dot_product(q, q)) AS nrm FROM e),
          |p AS (
          |  SELECT xa.vec_id, xb.vec_id AS old_id, xa.cell AS cell,
          |         list_dot_product(ea.q, eb.q) / (na.nrm * nb.nrm) AS c
          |  FROM a3 xa JOIN a3 xb ON xa.cell = xb.cell
          |  AND xa.vec_id % 7 = 0 AND xb.vec_id % 7 <> 0
          |  JOIN e ea ON ea.vec_id = xa.vec_id JOIN e eb ON eb.vec_id = xb.vec_id
          |  JOIN nn na ON na.vec_id = xa.vec_id JOIN nn nb ON nb.vec_id = xb.vec_id)
          |SELECT vec_id, cell, min(old_id) AS kept_by, round(arg_min(c, old_id), 6) AS cos_sim
          |FROM p WHERE c > 0.4 GROUP BY 1, 2 ORDER BY 1""".stripMargin,
      "m_media_dedup" ->
        """SELECT count(*) AS n_payloads,
          |       CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_bytes,
          |       CAST(count(*) - count(DISTINCT sha256(text)) AS BIGINT) AS n_byte_dups,
          |       CAST(count(DISTINCT sha256(text))
          |            - count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS BIGINT)
          |         AS n_only_normalized_dups
          |FROM documents""".stripMargin,
      // 32-bit aHash over the payload byte stream; bit decided by integer
      // cross-multiplication so both engines agree exactly; candidates =
      // band-equality pairs, hamming verified and re-derived per pair.
      // Bytes come from hex(encode(text)) — the ACTUAL UTF-8 octets, the
      // same stream Spark fingerprints — so non-ASCII text agrees too.
      "m_phash_neardup" ->
        """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          |           FROM documents WHERE octet_length(encode(text)) >= 32),
          |b AS (SELECT doc_id, n, i,
          |             16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1))-1)
          |               + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1))-1) AS byte
          |      FROM d, UNNEST(range(0, n)) AS t(i)),
          |tot AS (SELECT doc_id, sum(byte) AS tot FROM b GROUP BY 1),
          |seg AS (SELECT doc_id, (i * 32) // n AS s, sum(byte) AS segsum,
          |               count(*) AS seglen, any_value(n) AS n
          |        FROM b GROUP BY 1, 2),
          |bits AS (SELECT seg.doc_id, s,
          |                CASE WHEN segsum * seg.n >= tot.tot * seglen THEN 1 ELSE 0 END AS bit
          |         FROM seg JOIN tot ON seg.doc_id = tot.doc_id),
          |bands AS (SELECT doc_id, s // 8 AS band_idx, CAST(sum(bit << CAST(s % 8 AS INT)) AS INT) AS band_val
          |          FROM bits GROUP BY 1, 2),
          |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          |         FROM bands a JOIN bands b
          |           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          |          AND a.doc_id < b.doc_id),
          |ham AS (SELECT c.id1, c.id2,
          |               CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS INT) AS hamming
          |        FROM cand c
          |        JOIN bands x ON x.doc_id = c.id1
          |        JOIN bands y ON y.doc_id = c.id2 AND y.band_idx = x.band_idx
          |        GROUP BY 1, 2)
          |SELECT id1, id2, hamming FROM ham WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin,
      // Wide-band scale path: SAME integer-mean kernel at 64 segments,
      // 4x16-bit bands (65,536 values vs the narrow form's 256 — the
      // quadratic in-bucket term drops ~256x). Full kernel replay, byte
      // stream from hex(encode(text)) as in the narrow twin.
      "m_phash_wide" ->
        """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          |           FROM documents WHERE octet_length(encode(text)) >= 64),
          |b AS (SELECT doc_id, n, i,
          |             16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1))-1)
          |               + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1))-1) AS byte
          |      FROM d, UNNEST(range(0, n)) AS t(i)),
          |tot AS (SELECT doc_id, sum(byte) AS tot FROM b GROUP BY 1),
          |seg AS (SELECT doc_id, (i * 64) // n AS s, sum(byte) AS segsum,
          |               count(*) AS seglen, any_value(n) AS n
          |        FROM b GROUP BY 1, 2),
          |bits AS (SELECT seg.doc_id, s,
          |                CASE WHEN segsum * seg.n >= tot.tot * seglen THEN 1 ELSE 0 END AS bit
          |         FROM seg JOIN tot ON seg.doc_id = tot.doc_id),
          |bands AS (SELECT doc_id, s // 16 AS band_idx,
          |                 CAST(sum(bit << CAST(s % 16 AS INT)) AS INT) AS band_val
          |          FROM bits GROUP BY 1, 2),
          |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          |         FROM bands a JOIN bands b
          |           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          |          AND a.doc_id < b.doc_id),
          |ham AS (SELECT c.id1, c.id2,
          |               CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS INT) AS hamming
          |        FROM cand c
          |        JOIN bands x ON x.doc_id = c.id1
          |        JOIN bands y ON y.doc_id = c.id2 AND y.band_idx = x.band_idx
          |        GROUP BY 1, 2)
          |SELECT id1, id2, hamming FROM ham WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin,
      // contributions rounded then summed as DECIMAL: order-independent,
      // and the 1e-12 per-row round absorbs cross-engine ln() ulp drift
      // far below the 1e-6 output round.
      "t_kl_drift" ->
        """WITH t AS (SELECT source, tok AS term
          |           FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(tok)),
          |st AS (SELECT source, term, count(*) AS c FROM t GROUP BY 1, 2),
          |stot AS (SELECT source, sum(c) AS stot FROM st GROUP BY 1),
          |ct AS (SELECT term, sum(c) AS ct FROM st GROUP BY 1),
          |g AS (SELECT sum(c) AS gt FROM st),
          |x AS (SELECT source,
          |             CAST(round((c::DOUBLE / stot) *
          |                        ln((c::DOUBLE / stot) / (ct::DOUBLE / gt)), 12)
          |                  AS DECIMAL(38, 12)) AS contrib,
          |             stot
          |      FROM st JOIN stot USING (source) JOIN ct USING (term), g)
          |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
          |       CAST(max(stot) AS BIGINT) AS n_tokens,
          |       round(CAST(sum(contrib) AS DOUBLE), 6) AS kl_divergence
          |FROM x GROUP BY source ORDER BY source""".stripMargin,
      // BM25 with Lucene idf smoothing; contributions rounded then
      // DECIMAL-summed so the top-20 cut is engine-exact.
      "t_bm25" ->
        """WITH toks AS (SELECT doc_id, tok AS term
          |             FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(tok)),
          |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
          |       WHERE term IN ('spark', 'hash', 'merge') GROUP BY 1, 2),
          |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
          |x AS (SELECT tf.doc_id,
          |             CAST(round(
          |               ln(((n_docs - df)::DOUBLE + 0.5::DOUBLE) / (df::DOUBLE + 0.5::DOUBLE) + 1.0::DOUBLE) *
          |               ((tf::DOUBLE * 2.2::DOUBLE) /
          |                (tf::DOUBLE + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl::DOUBLE / avgdl))), 12)
          |               AS DECIMAL(38, 12)) AS contrib
          |      FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term), stats)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
          |       round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
          |FROM x GROUP BY doc_id
          |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
      // kept thresholds the ROUNDED score so the 0.5 cutoff cannot flip
      // on cross-engine exp() ulp differences.
      "t_quality_lr" ->
        """WITH q AS (
          |  SELECT doc_id, n_chars, string_split(trim(text), ' ') AS w,
          |         CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha
          |  FROM documents),
          |f AS (
          |  SELECT doc_id,
          |         CAST(len(w) AS BIGINT) AS n_tokens,
          |         CAST(n_chars AS DOUBLE) / len(w) AS avg_token_len,
          |         CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
          |         CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
          |           / len(w) AS stopword_ratio
          |  FROM q),
          |s AS (
          |  SELECT doc_id,
          |         -2.0::DOUBLE + 6.0::DOUBLE * stopword_ratio + 2.5::DOUBLE * alpha_ratio
          |           - 0.3::DOUBLE * avg_token_len + 0.25::DOUBLE * ln(n_tokens) AS z
          |  FROM f)
          |SELECT doc_id,
          |       round(1.0::DOUBLE / (1.0::DOUBLE + exp(-z)), 6) AS lr_score,
          |       CASE WHEN round(1.0::DOUBLE / (1.0::DOUBLE + exp(-z)), 6) >= 0.5 THEN 1 ELSE 0 END AS kept
          |FROM s ORDER BY doc_id""".stripMargin,
      "s_cosine_expr" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50)
          |SELECT a.vec_id AS id1, b.vec_id AS id2,
          |       round(list_dot_product(a.v, b.v) /
          |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
          |FROM e a JOIN e b ON a.vec_id < b.vec_id
          |ORDER BY id1, id2""".stripMargin,
      // MIPS: ranking key is the exact integer dot of the 2^20
      // quantization (integer-valued doubles <= 2^46 — exact); the
      // reported ip is one dyadic division by 2^40
      "s_mips_topk" ->
        """WITH e AS (
          |  SELECT vec_id,
          |         list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |qh AS (SELECT vec_id AS query_id, q FROM e WHERE vec_id < 10),
          |sims AS (
          |  SELECT qh.query_id, e.vec_id AS neighbor_id,
          |         list_dot_product(qh.q, e.q) AS qdot
          |  FROM qh JOIN e ON qh.query_id <> e.vec_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, qdot,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY qdot DESC, neighbor_id) AS INT) AS rnk
          |  FROM sims)
          |SELECT query_id, rnk, neighbor_id, qdot / 1099511627776.0 AS ip
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      "s_ann_topk" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT * FROM e WHERE vec_id < 10),
          |sims AS (
          |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          |         list_dot_product(q.v, e.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS c
          |  FROM q JOIN e ON q.vec_id <> e.vec_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, c,
          |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INT) AS rnk
          |  FROM sims)
          |SELECT query_id, rnk, neighbor_id, round(c, 6) AS cos_sim
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // Exact Lloyd replay: fixed-point quantization makes per-cell means
      // integer-exact (sums of integer-valued doubles stay below 2^53),
      // so two training rounds + final assignment replay bit-for-bit.
      // PCA power iteration replay: quantized grid, exact integer-double
      // means, per-iteration DECIMAL reductions of 6-rounded terms, and
      // an exact 2^-40 rescale between iterations; one in-row normalize
      // at projection time (see pcaProject scaladoc for the magnitude
      // proof).
      "s_pca_project" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |mm AS (SELECT i, sum(q[i]) / count(*) AS m
          |       FROM e, UNNEST(range(1, 65)) AS t(i) GROUP BY i),
          |ml AS (SELECT list(m ORDER BY i) AS ml FROM mm),
          |c AS (SELECT vec_id, list_transform(range(1, 65), i -> q[i] - ml.ml[i]) AS c
          |      FROM e, ml),
          |o AS (SELECT list_transform(range(1, 65), i -> 1.0::DOUBLE) AS v),
          |y1 AS (SELECT vec_id, c.c AS c, list_dot_product(c.c, o.v) AS y FROM c, o),
          |w1 AS (SELECT i, sum(CAST(round(y * c[i], 6) AS DECIMAL(38, 6))) AS w
          |       FROM y1, UNNEST(range(1, 65)) AS t(i) GROUP BY i),
          |v1 AS (SELECT list(CAST(w AS DOUBLE) / 1099511627776.0 ORDER BY i) AS v FROM w1),
          |y2 AS (SELECT vec_id, c.c AS c, list_dot_product(c.c, v1.v) AS y FROM c, v1),
          |w2 AS (SELECT i, sum(CAST(round(y * c[i], 6) AS DECIMAL(38, 6))) AS w
          |       FROM y2, UNNEST(range(1, 65)) AS t(i) GROUP BY i),
          |v2 AS (SELECT list(CAST(w AS DOUBLE) / 1099511627776.0 ORDER BY i) AS v FROM w2)
          |SELECT vec_id,
          |       round(list_dot_product(c.c, v2.v) / sqrt(list_dot_product(v2.v, v2.v)) / 1048576.0, 6) AS pc1
          |FROM c, v2 ORDER BY vec_id""".stripMargin,
      "s_ivf_trained" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |m AS (SELECT cell, count(*) AS n_members FROM a3 GROUP BY 1)
          |SELECT m.cell, m.n_members,
          |       round(sqrt(list_dot_product(c2.c, c2.c)) / 1048576.0, 6) AS centroid_norm,
          |       round(c2.c[1] / 1048576.0, 6) AS c_dim0
          |FROM m JOIN c2 USING (cell) ORDER BY cell""".stripMargin,
      // PQ/ADC replay: per-subspace codebooks trained with one exact
      // integer-mean Lloyd update from vec_id<4 seeds, codes = argmin-L2
      // (same dot-product expansion both engines), ADC score pivoted and
      // summed in subspace order
      "s_ann_pq" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |sub AS (SELECT vec_id, s, list_slice(q, 16*s + 1, 16*s + 16) AS v
          |        FROM e, UNNEST(range(0, 4)) AS t(s)),
          |c0 AS (SELECT s, vec_id AS cell, v AS c FROM sub WHERE vec_id < 4),
          |a1 AS (SELECT vec_id, s, v, cell FROM (
          |  SELECT sub.vec_id, sub.s, sub.v, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN c0 p USING (s)) WHERE rn = 1),
          |u1 AS (SELECT s, cell, i, sum(v[i]) AS sm, count(*) AS n
          |       FROM a1, UNNEST(range(1, 17)) AS t(i) GROUP BY 1, 2, 3),
          |c1 AS (SELECT s, cell, list(sm / n ORDER BY i) AS c FROM u1 GROUP BY 1, 2),
          |codes AS (SELECT vec_id, s, cell FROM (
          |  SELECT sub.vec_id, sub.s, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN c1 p USING (s)) WHERE rn = 1),
          |q AS (SELECT vec_id AS query_id, s, v AS qv FROM sub WHERE vec_id < 10),
          |part AS (
          |  SELECT q.query_id, codes.vec_id AS neighbor_id, q.s,
          |         list_dot_product(q.qv, c1.c) AS d
          |  FROM q JOIN codes ON codes.s = q.s AND codes.vec_id <> q.query_id
          |         JOIN c1 ON c1.s = q.s AND c1.cell = codes.cell),
          |sc AS (
          |  SELECT query_id, neighbor_id,
          |         max(CASE WHEN s = 0 THEN d END) + max(CASE WHEN s = 1 THEN d END)
          |       + max(CASE WHEN s = 2 THEN d END) + max(CASE WHEN s = 3 THEN d END) AS score
          |  FROM part GROUP BY 1, 2)
          |SELECT query_id, rnk, neighbor_id,
          |       round(score / (1048576.0 * 1048576.0), 6) AS adc_score
          |FROM (SELECT query_id, neighbor_id, score,
          |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rnk
          |      FROM sc)
          |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // IVF×PQ replay: the s_ivf_trained coarse-quantizer chain (2 exact
      // integer Lloyd rounds, final assignment a3, query probes = top-4
      // cells by cosine) glued to the s_ann_pq codebook/codes/ADC chain,
      // with the candidate set restricted to probed cells before scoring.
      "s_ann_ivfpq" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |probes AS (SELECT query_id, cell FROM (
          |  SELECT e.vec_id AS query_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS pr
          |  FROM e, c2 p WHERE e.vec_id < 10) WHERE pr <= 4),
          |sub AS (SELECT vec_id, s, list_slice(q, 16*s + 1, 16*s + 16) AS v
          |        FROM e, UNNEST(range(0, 4)) AS t(s)),
          |p0 AS (SELECT s, vec_id AS cell, v AS c FROM sub WHERE vec_id < 4),
          |b1 AS (SELECT vec_id, s, v, cell FROM (
          |  SELECT sub.vec_id, sub.s, sub.v, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN p0 p USING (s)) WHERE rn = 1),
          |v1 AS (SELECT s, cell, i, sum(v[i]) AS sm, count(*) AS n
          |       FROM b1, UNNEST(range(1, 17)) AS t(i) GROUP BY 1, 2, 3),
          |p1 AS (SELECT s, cell, list(sm / n ORDER BY i) AS c FROM v1 GROUP BY 1, 2),
          |codes AS (SELECT vec_id, s, cell FROM (
          |  SELECT sub.vec_id, sub.s, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN p1 p USING (s)) WHERE rn = 1),
          |qs AS (SELECT vec_id AS query_id, s, v AS qv FROM sub WHERE vec_id < 10),
          |part AS (
          |  SELECT qs.query_id, codes.vec_id AS neighbor_id, qs.s,
          |         list_dot_product(qs.qv, p1.c) AS d
          |  FROM qs JOIN codes ON codes.s = qs.s AND codes.vec_id <> qs.query_id
          |         JOIN p1 ON p1.s = qs.s AND p1.cell = codes.cell
          |         JOIN a3 ON a3.vec_id = codes.vec_id
          |         JOIN probes pr ON pr.query_id = qs.query_id AND pr.cell = a3.cell),
          |sc AS (
          |  SELECT query_id, neighbor_id,
          |         max(CASE WHEN s = 0 THEN d END) + max(CASE WHEN s = 1 THEN d END)
          |       + max(CASE WHEN s = 2 THEN d END) + max(CASE WHEN s = 3 THEN d END) AS score
          |  FROM part GROUP BY 1, 2)
          |SELECT query_id, rnk, neighbor_id,
          |       round(score / (1048576.0 * 1048576.0), 6) AS adc_score
          |FROM (SELECT query_id, neighbor_id, score,
          |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rnk
          |      FROM sc)
          |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      "s_ann_ivf" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |seeds AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 16),
          |assign AS (
          |  SELECT vec_id, v, cell FROM (
          |    SELECT e.vec_id, e.v, seeds.cell,
          |           CAST(row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |             list_dot_product(e.v, sv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(sv, sv))) DESC, cell) AS INT) AS rn
          |    FROM e, seeds) WHERE rn = 1),
          |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
          |probes AS (
          |  SELECT query_id, cell FROM (
          |    SELECT query_id, cell, CAST(row_number() OVER (PARTITION BY query_id ORDER BY
          |             list_dot_product(qv, sv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(sv, sv))) DESC, cell) AS INT) AS pr
          |    FROM q, seeds) WHERE pr <= 4),
          |ranked AS (
          |  SELECT q.query_id, a.vec_id AS neighbor_id,
          |         list_dot_product(qv, a.v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(a.v, a.v))) AS c,
          |         CAST(row_number() OVER (PARTITION BY q.query_id ORDER BY
          |           list_dot_product(qv, a.v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(a.v, a.v))) DESC, a.vec_id) AS INT) AS rnk
          |  FROM q JOIN probes p ON p.query_id = q.query_id
          |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> q.query_id)
          |SELECT query_id, rnk, neighbor_id, round(c, 6) AS cos_sim
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // Recall@5 of the ivf / pq / ivfpq index variants against exact
      // brute force: each variant's oracle CTE chain glued in, then
      // three top-k-scale compares unioned with a method tag.
      "s_recall_eval" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT * FROM e WHERE vec_id < 10),
          |exact_sims AS (
          |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          |         list_dot_product(q.v, e.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS c
          |  FROM q JOIN e ON q.vec_id <> e.vec_id),
          |exact5 AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
          |    FROM exact_sims) WHERE rnk <= 5),
          |seeds AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 16),
          |assign AS (
          |  SELECT vec_id, v, cell FROM (
          |    SELECT e.vec_id, e.v, seeds.cell,
          |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |             list_dot_product(e.v, sv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(sv, sv))) DESC, cell) AS rn
          |    FROM e, seeds) WHERE rn = 1),
          |qq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
          |probes AS (
          |  SELECT query_id, cell FROM (
          |    SELECT query_id, cell, row_number() OVER (PARTITION BY query_id ORDER BY
          |             list_dot_product(qv, sv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(sv, sv))) DESC, cell) AS pr
          |    FROM qq, seeds) WHERE pr <= 4),
          |ivf5 AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT qq.query_id, a.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY qq.query_id ORDER BY
          |             list_dot_product(qv, a.v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(a.v, a.v))) DESC, a.vec_id) AS rnk
          |    FROM qq JOIN probes p ON p.query_id = qq.query_id
          |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> qq.query_id)
          |  WHERE rnk <= 5),
          |eq AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS qv
          |       FROM embeddings),
          |sub AS (SELECT vec_id, s, list_slice(qv, 16*s + 1, 16*s + 16) AS v
          |        FROM eq, UNNEST(range(0, 4)) AS t(s)),
          |p0 AS (SELECT s, vec_id AS cell, v AS c FROM sub WHERE vec_id < 4),
          |b1 AS (SELECT vec_id, s, v, cell FROM (
          |  SELECT sub.vec_id, sub.s, sub.v, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN p0 p USING (s)) WHERE rn = 1),
          |v1 AS (SELECT s, cell, i, sum(v[i]) AS sm, count(*) AS n
          |       FROM b1, UNNEST(range(1, 17)) AS t(i) GROUP BY 1, 2, 3),
          |p1 AS (SELECT s, cell, list(sm / n ORDER BY i) AS c FROM v1 GROUP BY 1, 2),
          |codes AS (SELECT vec_id, s, cell FROM (
          |  SELECT sub.vec_id, sub.s, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN p1 p USING (s)) WHERE rn = 1),
          |qsub AS (SELECT vec_id AS query_id, s, v AS qv FROM sub WHERE vec_id < 10),
          |partp AS (
          |  SELECT qsub.query_id, codes.vec_id AS neighbor_id, qsub.s,
          |         list_dot_product(qsub.qv, p1.c) AS d
          |  FROM qsub JOIN codes ON codes.s = qsub.s AND codes.vec_id <> qsub.query_id
          |         JOIN p1 ON p1.s = qsub.s AND p1.cell = codes.cell),
          |scp AS (
          |  SELECT query_id, neighbor_id,
          |         max(CASE WHEN s = 0 THEN d END) + max(CASE WHEN s = 1 THEN d END)
          |       + max(CASE WHEN s = 2 THEN d END) + max(CASE WHEN s = 3 THEN d END) AS score
          |  FROM partp GROUP BY 1, 2),
          |pq5 AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
          |    FROM scp) WHERE rnk <= 5),
          |qc0 AS (SELECT vec_id AS cell, qv AS c FROM eq WHERE vec_id < 16),
          |qa1 AS (SELECT vec_id, qv, cell FROM (
          |  SELECT eq.vec_id, eq.qv, p.cell,
          |         row_number() OVER (PARTITION BY eq.vec_id ORDER BY
          |           list_dot_product(eq.qv, p.c) / (sqrt(list_dot_product(eq.qv, eq.qv)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM eq, qc0 p) WHERE rn = 1),
          |qu1 AS (SELECT cell, i, sum(qv[i]) AS s, count(*) AS n
          |       FROM qa1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |qc1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM qu1 GROUP BY 1),
          |qa2 AS (SELECT vec_id, qv, cell FROM (
          |  SELECT eq.vec_id, eq.qv, p.cell,
          |         row_number() OVER (PARTITION BY eq.vec_id ORDER BY
          |           list_dot_product(eq.qv, p.c) / (sqrt(list_dot_product(eq.qv, eq.qv)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM eq, qc1 p) WHERE rn = 1),
          |qu2 AS (SELECT cell, i, sum(qv[i]) AS s, count(*) AS n
          |       FROM qa2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |qc2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM qu2 GROUP BY 1),
          |qa3 AS (SELECT vec_id, cell FROM (
          |  SELECT eq.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY eq.vec_id ORDER BY
          |           list_dot_product(eq.qv, p.c) / (sqrt(list_dot_product(eq.qv, eq.qv)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM eq, qc2 p) WHERE rn = 1),
          |iprobes AS (SELECT query_id, cell FROM (
          |  SELECT eq.vec_id AS query_id, p.cell,
          |         row_number() OVER (PARTITION BY eq.vec_id ORDER BY
          |           list_dot_product(eq.qv, p.c) / (sqrt(list_dot_product(eq.qv, eq.qv)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS pr
          |  FROM eq, qc2 p WHERE eq.vec_id < 10) WHERE pr <= 4),
          |parti AS (
          |  SELECT partp.* FROM partp
          |  JOIN qa3 ON qa3.vec_id = partp.neighbor_id
          |  JOIN iprobes pr ON pr.query_id = partp.query_id AND pr.cell = qa3.cell),
          |sci AS (
          |  SELECT query_id, neighbor_id,
          |         max(CASE WHEN s = 0 THEN d END) + max(CASE WHEN s = 1 THEN d END)
          |       + max(CASE WHEN s = 2 THEN d END) + max(CASE WHEN s = 3 THEN d END) AS score
          |  FROM parti GROUP BY 1, 2),
          |ivfpq5 AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
          |    FROM sci) WHERE rnk <= 5)
          |SELECT query_id, method, n_hits, recall_at_5 FROM (
          |  SELECT x.query_id, 'ivf' AS method,
          |         CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
          |         round(count(i.neighbor_id) / count(*), 6) AS recall_at_5
          |  FROM exact5 x LEFT JOIN ivf5 i
          |    ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
          |  GROUP BY 1
          |  UNION ALL
          |  SELECT x.query_id, 'pq' AS method,
          |         CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
          |         round(count(i.neighbor_id) / count(*), 6) AS recall_at_5
          |  FROM exact5 x LEFT JOIN pq5 i
          |    ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
          |  GROUP BY 1
          |  UNION ALL
          |  SELECT x.query_id, 'ivfpq' AS method,
          |         CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
          |         round(count(i.neighbor_id) / count(*), 6) AS recall_at_5
          |  FROM exact5 x LEFT JOIN ivfpq5 i
          |    ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
          |  GROUP BY 1)
          |ORDER BY query_id, method""".stripMargin,
      // Full hyperplane-LSH replay: ±1 planes from md5(j_d) first-hex-
      // digit parity, signature bits from the SEQUENTIAL ±v[d] fold
      // (list_prepend 0.0 = the Spark loop's s=0.0 start; ×±1 is exact
      // so only addition order matters), 4x4-bit bands, candidates =
      // vectors sharing a band bucket with a query, exact-cosine rerank.
      "s_ann_lsh" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |r AS (
          |  SELECT j, list_transform(range(0, 64),
          |           d -> CASE WHEN (strpos('0123456789abcdef',
          |                             substr(md5(j::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) % 2 = 1
          |                     THEN 1.0 ELSE -1.0 END) AS plane
          |  FROM range(0, 16) AS t(j)),
          |sigbits AS (
          |  SELECT e.vec_id, r.j,
          |         CASE WHEN list_reduce(
          |                list_prepend(0.0, list_transform(range(1, 65), d -> e.v[d] * r.plane[d])),
          |                (a, b) -> a + b) >= 0
          |              THEN 1 ELSE 0 END AS bit
          |  FROM e, r),
          |sig AS (SELECT vec_id, CAST(sum(bit * (1 << j)) AS BIGINT) AS s FROM sigbits GROUP BY 1),
          |banded AS (SELECT vec_id, k, (s >> (k * 4)) & 15 AS bh FROM sig, range(0, 4) AS t(k)),
          |cand AS (
          |  SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id AS neighbor_id
          |  FROM banded qb JOIN banded vb ON qb.k = vb.k AND qb.bh = vb.bh
          |  WHERE qb.vec_id < 10 AND vb.vec_id <> qb.vec_id),
          |scored AS (
          |  SELECT c.query_id, c.neighbor_id,
          |         list_dot_product(a.v, b.v) /
          |           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
          |  FROM cand c JOIN e a ON a.vec_id = c.query_id JOIN e b ON b.vec_id = c.neighbor_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, c,
          |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INT) AS rnk
          |  FROM scored)
          |SELECT query_id, rnk, neighbor_id, round(c, 6) AS cos_sim
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      "s_knn_classify" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT * FROM e WHERE vec_id < 10),
          |sims AS (
          |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          |         list_dot_product(q.v, e.v) /
          |           (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS c
          |  FROM q JOIN e ON q.vec_id <> e.vec_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id,
          |         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
          |  FROM sims),
          |votes AS (
          |  SELECT r.query_id, l.label, count(*) AS n_votes
          |  FROM ranked r JOIN embeddings l ON l.vec_id = r.neighbor_id
          |  WHERE r.rnk <= 5 GROUP BY 1, 2),
          |best AS (
          |  SELECT query_id, label, n_votes,
          |         row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, label) AS pr
          |  FROM votes)
          |SELECT query_id, label AS pred_label, n_votes
          |FROM best WHERE pr = 1 ORDER BY query_id""".stripMargin,
      // Gopher top-bigram mass: tie-break = max count then max bigram
      // (Spark max over a (ct, bg) struct == ORDER BY ct DESC, bg DESC).
      "t_top2gram" ->
        """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
          |f AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts FROM t WHERE len(ts) >= 2),
          |bg AS (SELECT doc_id, n_tokens, ts[CAST(i AS INT)] || ' ' || ts[CAST(i+1 AS INT)] AS bg
          |       FROM f, UNNEST(range(1, len(ts))) AS u(i)),
          |c AS (SELECT doc_id, n_tokens, bg, count(*) AS ct FROM bg GROUP BY 1, 2, 3),
          |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ct DESC, bg DESC) AS rn FROM c)
          |SELECT doc_id, n_tokens, bg AS top_bigram, ct AS top_ct,
          |       round(ct * 2.0 / n_tokens, 6) AS top_frac
          |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
      // Duplicate-5-gram coverage: gram start positions are 1-based here
      // and 0-based in Spark — coverage counts are shift-invariant.
      "t_dupgram_cover" ->
        """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
          |f AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts FROM t WHERE len(ts) >= 5),
          |g AS (SELECT doc_id, n_tokens, i AS p,
          |             array_to_string(list_slice(ts, CAST(i AS INT), CAST(i+4 AS INT)), ' ') AS g
          |      FROM f, UNNEST(range(1, len(ts) - 3)) AS u(i)),
          |c AS (SELECT *, count(*) OVER (PARTITION BY doc_id, g) AS ct FROM g),
          |cov AS (SELECT doc_id, n_tokens,
          |               CAST(count(DISTINCT CASE WHEN ct >= 2 THEN p + j END) AS BIGINT) AS n_covered
          |        FROM c, UNNEST(range(0, 5)) AS u2(j) GROUP BY 1, 2)
          |SELECT doc_id, n_tokens, n_covered, round(n_covered / n_tokens, 6) AS dup_frac
          |FROM cov ORDER BY doc_id""".stripMargin,
      // Curation funnel: stages replay langId's marker argmax, the
      // stopword density, and dedupKeep's min-id survivor rule.
      "p_curation_funnel" ->
        """WITH t AS (SELECT doc_id, source, lang, text, string_split(trim(text), ' ') AS ts FROM documents),
          |s AS (SELECT doc_id, source, lang,
          |             CAST(len(ts) AS BIGINT) AS n,
          |             len(list_filter(ts, x -> x IN ('the','a','of','and','to','in','is','it'))) AS sw,
          |             len(list_filter(ts, x -> x IN ('the','and','of','is'))) AS c_en,
          |             len(list_filter(ts, x -> x IN ('der','und','die','ist'))) AS c_de,
          |             len(list_filter(ts, x -> x IN ('le','et','les','est'))) AS c_fr,
          |             len(list_filter(ts, x -> x IN ('el','y','los','es'))) AS c_es,
          |             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
          |      FROM t),
          |k AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep FROM s),
          |p AS (SELECT *,
          |        CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
          |             WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
          |             WHEN c_fr >= c_es THEN 'fr' ELSE 'es' END AS pred,
          |        n >= 30 AS s1 FROM k),
          |f AS (SELECT *, s1 AND pred = lang AS s2,
          |             s1 AND pred = lang AND sw * 1.0 / n >= 0.08 AS s3,
          |             s1 AND pred = lang AND sw * 1.0 / n >= 0.08 AND keep = doc_id AS s4
          |      FROM p)
          |SELECT source, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS after_length,
          |       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS after_lang,
          |       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS after_quality,
          |       CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS after_dedup
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
      // Embedding drift: centroids from exact fixed-point integer sums
      // (order-independent), cosine in ascending-dim order on both sides.
      "s_embed_drift" ->
        """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
          |                  list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS q
          |           FROM embeddings),
          |u AS (SELECT label, i, sum(q[i]) AS s, count(*) AS n
          |      FROM e, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |lc AS (SELECT label, list(s * 1.0 / n ORDER BY i) AS c, any_value(n) AS n FROM u GROUP BY 1),
          |g AS (SELECT i, sum(s) AS ts FROM u GROUP BY 1),
          |tot AS (SELECT sum(nn) AS tn FROM (SELECT label, any_value(n) AS nn FROM u GROUP BY 1) q2),
          |cc AS (SELECT list(g.ts * 1.0 / tot.tn ORDER BY g.i) AS c FROM g, tot GROUP BY tot.tn)
          |SELECT lc.label, lc.n AS n_vectors,
          |       round(list_dot_product(lc.c, cc.c) /
          |             (sqrt(list_dot_product(lc.c, lc.c)) * sqrt(list_dot_product(cc.c, cc.c))), 6) AS centroid_cos
          |FROM lc, cc ORDER BY label""".stripMargin,
      // Cluster-balanced sampling: replays the SemDeDup quantizer
      // training (same CTE chain as d_semdedup), then per-cell
      // proportional quotas with a deterministic md5 rank.
      "p_cluster_sample" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |kk AS (SELECT greatest(16, CAST(ceil(count(*) / 1024.0) AS BIGINT)) AS k FROM e),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < (SELECT k FROM kk)),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |r AS (SELECT vec_id, cell,
          |             count(*) OVER (PARTITION BY cell) AS n_cell,
          |             CAST(row_number() OVER (PARTITION BY cell
          |               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rnk
          |      FROM a3),
          |tot AS (SELECT count(*) AS nn FROM e)
          |SELECT vec_id, cell, n_cell, rnk FROM r, tot
          |WHERE rnk <= ceil(100 * n_cell * 1.0 / nn)
          |ORDER BY cell, rnk""".stripMargin,
      // Hard negatives: annTopK's scoring algebra plus the wrong-label
      // restriction inside the candidate join (which also removes the
      // query row itself: a row shares its own label).
      "s_hard_negatives" ->
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT * FROM e WHERE vec_id < 10),
          |sims AS (
          |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
          |         list_dot_product(q.v, e.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS c
          |  FROM q JOIN e ON e.label <> q.label),
          |ranked AS (
          |  SELECT query_id, neighbor_id, neighbor_label, c,
          |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INT) AS rnk
          |  FROM sims)
          |SELECT query_id, rnk, neighbor_id, neighbor_label, round(c, 6) AS cos_sim
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // d_minhash_lsh's exact-Jaccard pair contract, annotated with the
      // p_split_assign bucket of each id and restricted to pairs that
      // straddle a split boundary.
      "d_split_leak" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |pair AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
          |nd AS (
          |  SELECT id1, id2,
          |         CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
          |  FROM pair JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8),
          |sp AS (
          |  SELECT doc_id,
          |         CASE WHEN bucket < 80 THEN 'train'
          |              WHEN bucket < 90 THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM (
          |    SELECT doc_id,
          |           list_reduce(list_transform(range(1, 9),
          |             i -> (strpos('0123456789abcdef',
          |                          substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT),
          |             (a, b) -> a * 16 + b) % 100 AS bucket
          |    FROM documents))
          |SELECT id1, s1.split AS split1, id2, s2.split AS split2, jaccard
          |FROM nd JOIN sp s1 ON s1.doc_id = id1 JOIN sp s2 ON s2.doc_id = id2
          |WHERE s1.split <> s2.split
          |ORDER BY id1, id2""".stripMargin,
      // The single-window reference form of the two-pass bucket-offset
      // selection: one global cumulative sum over (quality desc, doc_id).
      "p_token_budget" ->
        """WITH s AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
          |         round(CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / n_chars, 6) AS q
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, q, n_tokens,
          |         CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          |  FROM s)
          |SELECT doc_id, q, n_tokens, cum_tokens FROM c
          |WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin,
      // Half-life-quantized decay: weights are exact powers of two, so
      // value * weight is exact in DECIMAL and the sum order-free.
      "e_decay_sum" ->
        """WITH anch AS (SELECT max(epoch_ms(ts)) AS tmax FROM events)
          |SELECT event_type,
          |       count(*) AS n_events,
          |       CAST(round(sum(CAST(value AS DECIMAL(18,4)) *
          |                CAST(power(0.5, least((tmax - epoch_ms(ts)) // 604800000, 10)) AS DECIMAL(14,10))), 6) AS DOUBLE) AS decayed_sum,
          |       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 6) AS DOUBLE) AS raw_sum
          |FROM events, anch GROUP BY 1 ORDER BY 1""".stripMargin,
      // ntile(10) over the bigram-LM score (the Spark side assembles the
      // same global rank from the bounded score histogram)
      "t_ppl_bucket" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |b AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
          |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
          |v AS (SELECT count(DISTINCT tok) AS vsize
          |      FROM (SELECT UNNEST(w) AS tok FROM toks)),
          |s AS (SELECT doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.vsize)) AS logp
          |      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
          |sc AS (SELECT doc_id, round(avg(logp), 6) AS avg_logp FROM s GROUP BY 1),
          |t AS (SELECT doc_id, avg_logp,
          |             CAST(ntile(10) OVER (ORDER BY avg_logp, doc_id) AS INT) AS decile
          |      FROM sc)
          |SELECT decile, count(*) AS n_docs,
          |       min(avg_logp) AS min_logp, max(avg_logp) AS max_logp,
          |       round(CAST(sum(CAST(avg_logp AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_logp
          |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
      // per-source LM-score means -> excess vs corpus mean -> normalized
      // weights; excess terms round to 12 dp and sum in DECIMAL so the
      // normalizer is order-free
      "p_doremi_weights" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |b AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
          |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
          |v AS (SELECT count(DISTINCT tok) AS vsize
          |      FROM (SELECT UNNEST(w) AS tok FROM toks)),
          |s AS (SELECT doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.vsize)) AS logp
          |      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
          |sc AS (SELECT doc_id, round(avg(logp), 6) AS avg_logp FROM s GROUP BY 1),
          |per AS (SELECT d.source, count(*) AS n_docs,
          |               sum(CAST(avg_logp AS DECIMAL(18,6))) AS sm
          |        FROM sc JOIN documents d USING (doc_id) GROUP BY 1),
          |tot AS (SELECT CAST(sum(sm) AS DOUBLE) / sum(n_docs) AS cmean FROM per),
          |x AS (SELECT source, n_docs, CAST(sm AS DOUBLE) / n_docs AS smean,
          |             CAST(round(greatest(cmean - CAST(sm AS DOUBLE) / n_docs, 0.000001), 12)
          |                  AS DECIMAL(38,12)) AS exr
          |      FROM per, tot),
          |tx AS (SELECT sum(exr) AS tx FROM x)
          |SELECT source, n_docs, round(smean, 6) AS mean_logp,
          |       round(CAST(exr AS DOUBLE) / CAST(tx.tx AS DOUBLE), 6) AS weight
          |FROM x, tx ORDER BY source""".stripMargin,
      // Duplicate-substring scrub: gram starts are 1-based here, 0-based
      // in Spark — the rebuilt text is position-shift-invariant.
      "d_substring_scrub" ->
        """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
          |g AS (SELECT doc_id, i - 1 AS p,
          |             array_to_string(list_slice(ts, CAST(i AS INT), CAST(i+4 AS INT)), ' ') AS g
          |      FROM t, UNNEST(range(1, len(ts) - 3)) AS u(i)),
          |d AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
          |cov AS (SELECT DISTINCT doc_id, p + j AS pos
          |        FROM g JOIN d USING (g), UNNEST(range(0, 5)) AS u2(j)),
          |tok AS (SELECT doc_id, i - 1 AS pos, ts[CAST(i AS INT)] AS tok
          |        FROM t, UNNEST(range(1, len(ts) + 1)) AS u(i)),
          |s AS (SELECT tok.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS scrubbed
          |      FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
          |      WHERE cov.doc_id IS NULL GROUP BY tok.doc_id),
          |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id)
          |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
          |       COALESCE(c.n_removed, 0) AS n_removed,
          |       COALESCE(s.scrubbed, '') AS scrubbed
          |FROM t LEFT JOIN c USING (doc_id) LEFT JOIN s USING (doc_id)
          |ORDER BY doc_id""".stripMargin,
      "d_dedup_norm" ->
        """WITH n AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(regexp_replace(
          |    lower(text), '[0-9]', '0', 'g'), '[^a-z0 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          |  FROM documents)
          |SELECT md5(norm) AS norm_fp, min(doc_id) AS keep_id,
          |       CAST(count(*) AS BIGINT) AS n_copies
          |FROM n GROUP BY norm ORDER BY keep_id""".stripMargin,
      // Priority sampling: priority = n_chars / (h32+1) is one IEEE
      // division — identical in any engine, so the draw replays exactly.
      "p_sample_weighted" ->
        """WITH h AS (
          |  SELECT doc_id, source, n_chars,
          |         CAST(n_chars AS DOUBLE) /
          |         (list_reduce(list_transform(range(1, 9),
          |            i -> (strpos('0123456789abcdef',
          |                         substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT),
          |            (a, b) -> a * 16 + b) + 1) AS priority
          |  FROM documents),
          |r AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rnk FROM h)
          |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, source, n_chars,
          |       round(priority, 6) AS priority
          |FROM r WHERE rnk <= 25 ORDER BY rnk""".stripMargin,
      "t_diversity" ->
        """WITH t AS (SELECT source, string_split(trim(text), ' ') AS ts FROM documents),
          |f AS (SELECT source, ts FROM t WHERE len(ts) >= 3),
          |g AS (SELECT source,
          |             array_to_string(list_slice(ts, CAST(i AS INT), CAST(i+2 AS INT)), ' ') AS g
          |      FROM f, UNNEST(range(1, len(ts) - 1)) AS u(i))
          |SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
          |       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
          |       round(count(DISTINCT g) * 1.0 / count(*), 6) AS distinct_ratio
          |FROM g GROUP BY source ORDER BY source""".stripMargin,
      // t_bpe_encode: the BPE merge list is an iterative data-dependent
      // argmax no single SQL query expresses, so the gated columns are
      // the deterministic per-doc word count plus the tokens-per-word /
      // tokens-per-char bounds verdict pinned as a literal 1; the token
      // counts themselves stay spec-gated (ScrubSamplingSpec).
      "t_bpe_encode" ->
        """WITH w AS (
          |  SELECT doc_id,
          |         list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
          |  FROM documents)
          |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
          |       CAST(1 AS BIGINT) AS bounds_ok
          |FROM w WHERE len(ws) > 0 ORDER BY doc_id""".stripMargin,
      // Lang-ID confusion matrix: replays langId's marker argmax
      "t_lang_confusion" ->
        """WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS ts FROM documents),
          |s AS (SELECT lang,
          |             len(list_filter(ts, x -> x IN ('the','and','of','is'))) AS c_en,
          |             len(list_filter(ts, x -> x IN ('der','und','die','ist'))) AS c_de,
          |             len(list_filter(ts, x -> x IN ('le','et','les','est'))) AS c_fr,
          |             len(list_filter(ts, x -> x IN ('el','y','los','es'))) AS c_es
          |      FROM t),
          |p AS (SELECT lang,
          |        CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
          |             WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
          |             WHEN c_fr >= c_es THEN 'fr' ELSE 'es' END AS pred_lang
          |      FROM s),
          |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
          |      FROM p GROUP BY 1, 2)
          |SELECT lang, pred_lang, n_docs,
          |       round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang), 6) AS share
          |FROM c ORDER BY lang, pred_lang""".stripMargin,
      // Embedding outliers: exact integer centroid arithmetic on the
      // 2^20 grid; ranking on the shared IEEE double image of dd.
      "s_embed_outliers" ->
        """WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label, i - 1 AS i,
          |                  CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576.0)
          |                       AS BIGINT) AS qv
          |           FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
          |s AS (SELECT label, i, sum(qv) AS sv, count(*) AS n FROM q GROUP BY 1, 2),
          |d AS (SELECT q.vec_id, q.label,
          |             sum(CAST(q.qv * s.n - s.sv AS DECIMAL(38,0)) *
          |                 CAST(q.qv * s.n - s.sv AS DECIMAL(38,0))) AS dd,
          |             max(s.n) AS n
          |      FROM q JOIN s USING (label, i) GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (
          |        PARTITION BY label ORDER BY CAST(dd AS DOUBLE) DESC, vec_id) AS rnk
          |      FROM d)
          |SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id,
          |       round(sqrt(CAST(dd AS DOUBLE)) / (n * 1048576.0), 6) AS dist
          |FROM r WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin,
      // Incremental scrub: src12 is the batch, the rest the indexed
      // corpus; a batch gram is cut when batch + corpus multiplicity >= 2.
      "d_scrub_incremental" ->
        """WITH b AS (SELECT doc_id, string_split(trim(text), ' ') AS ts
          |           FROM documents WHERE source = 'src12'),
          |co AS (SELECT string_split(trim(text), ' ') AS ts
          |       FROM documents WHERE source <> 'src12'),
          |cg AS (SELECT array_to_string(list_slice(ts, CAST(i AS INT), CAST(i+4 AS INT)), ' ') AS g
          |       FROM co, UNNEST(range(1, len(ts) - 3)) AS u(i)),
          |ci AS (SELECT g, count(*) AS ct FROM cg GROUP BY g),
          |bg AS (SELECT doc_id, i - 1 AS p,
          |             array_to_string(list_slice(ts, CAST(i AS INT), CAST(i+4 AS INT)), ' ') AS g
          |       FROM b, UNNEST(range(1, len(ts) - 3)) AS u(i)),
          |bc AS (SELECT g, count(*) AS bct FROM bg GROUP BY g),
          |dup AS (SELECT bc.g FROM bc LEFT JOIN ci USING (g)
          |        WHERE bc.bct + COALESCE(ci.ct, 0) >= 2),
          |cov AS (SELECT DISTINCT doc_id, p + j AS pos
          |        FROM bg JOIN dup USING (g), UNNEST(range(0, 5)) AS u2(j)),
          |tok AS (SELECT doc_id, i - 1 AS pos, ts[CAST(i AS INT)] AS tok
          |        FROM b, UNNEST(range(1, len(ts) + 1)) AS u(i)),
          |s AS (SELECT tok.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS scrubbed
          |      FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
          |      WHERE cov.doc_id IS NULL GROUP BY tok.doc_id),
          |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id)
          |SELECT b.doc_id, CAST(len(b.ts) AS BIGINT) AS n_tokens,
          |       COALESCE(c.n_removed, 0) AS n_removed,
          |       COALESCE(s.scrubbed, '') AS scrubbed
          |FROM b LEFT JOIN c USING (doc_id) LEFT JOIN s USING (doc_id)
          |ORDER BY doc_id""".stripMargin,
      // Heavy hitters: the Misra-Gries guarantee makes the two-pass
      // output EXACTLY the terms with frequency > n/(k+1), k = 32 —
      // integer threshold compare, so no engine-specific division.
      "t_heavy_hitters" ->
        """WITH t AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
          |tt AS (SELECT w FROM t WHERE len(w) > 0),
          |n AS (SELECT count(*) AS n FROM tt),
          |c AS (SELECT w AS term, CAST(count(*) AS BIGINT) AS ct FROM tt GROUP BY w)
          |SELECT term, ct FROM c, n WHERE ct * 33 > n
          |ORDER BY ct DESC, term""".stripMargin,
      // Zipf fit: OLS over the top-50 terms per source on the
      // round-12-then-DECIMAL grid (order-independent sums).
      "t_zipf_fit" ->
        """WITH t AS (SELECT source, unnest(string_split(trim(text), ' ')) AS term FROM documents),
          |tt AS (SELECT source, term FROM t WHERE len(term) > 0),
          |c AS (SELECT source, term, count(*) AS ct FROM tt GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (
          |        PARTITION BY source ORDER BY ct DESC, term) AS rnk FROM c),
          |f AS (SELECT source, ln(rnk) AS x, ln(ct) AS y FROM r WHERE rnk <= 50),
          |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
          |        CAST(sum(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          |        CAST(sum(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          |        CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
          |        CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
          |      FROM f GROUP BY 1)
          |SELECT source, n_terms,
          |       round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS slope,
          |       round((sy * sxx - sx * sxy) / (n_terms * sxx - sx * sx), 6) AS intercept
          |FROM s ORDER BY source""".stripMargin,
      // Annealing plan: phase-1 natural token share, phase-2 share
      // scaled by mean stopword-density quality; the same
      // round-then-DECIMAL grids as the Spark side.
      "p_anneal_plan" ->
        """WITH t AS (SELECT source, string_split(trim(text), ' ') AS ts FROM documents),
          |d AS (SELECT source, CAST(len(ts) AS BIGINT) AS t,
          |        CAST(round(len(list_filter(ts,
          |               x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
          |             / len(ts), 12) AS DECIMAL(38,12)) AS q
          |      FROM t),
          |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |             CAST(sum(t) AS BIGINT) AS n_tokens, sum(q) AS qsum
          |      FROM d GROUP BY 1),
          |m AS (SELECT source, n_docs, n_tokens,
          |             round(CAST(qsum AS DOUBLE) / n_docs, 6) AS q_mean FROM s),
          |x AS (SELECT *, CAST(round(n_tokens * q_mean, 6) AS DECIMAL(38,6)) AS scaled FROM m)
          |SELECT source, n_docs, n_tokens, q_mean,
          |       round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS w_phase1,
          |       round(CAST(scaled AS DOUBLE) /
          |             CAST(sum(scaled) OVER () AS DOUBLE), 6) AS w_phase2
          |FROM x ORDER BY source""".stripMargin,
      // Magic-byte sniff census: the same prefix compares in the same
      // priority order, expressed over hex(payload) (DuckDB has no
      // BLOB substring).
      "m_media_sniff" ->
        """WITH m AS (SELECT hex(encode(text)) AS hx,
          |                  CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |           FROM documents),
          |s AS (SELECT 'text/plain' AS mime,
          |        CASE WHEN substring(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
          |             WHEN substring(hx, 1, 8) = '89504E47' THEN 'png'
          |             WHEN substring(hx, 1, 8) = '47494638' THEN 'gif'
          |             WHEN substring(hx, 1, 8) = '504B0304' THEN 'zip'
          |             WHEN substring(hx, 1, 8) = '25504446' THEN 'pdf'
          |             WHEN substring(hx, 1, 8) = '52494646' THEN 'riff'
          |             ELSE 'unknown' END AS sniffed,
          |        nb FROM m)
          |SELECT mime, sniffed, CAST(count(*) AS BIGINT) AS n_items,
          |       CAST(sum(nb) AS BIGINT) AS total_bytes
          |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Temperature-scaled mixing: α ∈ {1/2, 1/4} as one/two
      // correctly-rounded sqrt ops; α-terms cross the normalizing sums
      // on the round-12 DECIMAL grid.
      "p_temperature_mix" ->
        """WITH t AS (SELECT source, len(string_split(trim(text), ' ')) AS t FROM documents),
          |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |             CAST(sum(t) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
          |x AS (SELECT *,
          |        CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 12) AS DECIMAL(38,12)) AS s2,
          |        CAST(round(sqrt(sqrt(CAST(n_tokens AS DOUBLE))), 12) AS DECIMAL(38,12)) AS s4
          |      FROM s)
          |SELECT source, n_docs, n_tokens,
          |       round(CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS w_natural,
          |       round(CAST(s2 AS DOUBLE) / CAST(sum(s2) OVER () AS DOUBLE), 6) AS w_alpha_half,
          |       round(CAST(s4 AS DOUBLE) / CAST(sum(s4) OVER () AS DOUBLE), 6) AS w_alpha_quarter
          |FROM x ORDER BY source""".stripMargin,
      // Per-source unigram entropy: identical p, identical ln, terms on
      // the 12-dp DECIMAL grid so summation order cannot matter.
      "t_word_entropy" ->
        """WITH w AS (SELECT source, unnest(string_split(trim(text), ' ')) AS w FROM documents),
          |f AS (SELECT source, w FROM w WHERE len(w) > 0),
          |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
          |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
          |             CAST(count(*) AS BIGINT) AS vocab,
          |             sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 12)
          |                      AS DECIMAL(38,12))) AS s
          |      FROM c GROUP BY 1)
          |SELECT source, n_tokens, vocab,
          |       round(ln(CAST(n_tokens AS DOUBLE)) -
          |             CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS entropy_nats
          |FROM t ORDER BY source""".stripMargin,
      // Semantic decontamination: same widened doubles, same fold order
      // (list_dot_product = the Scala loop), same 0.4 threshold on the
      // identical cosine double.
      "d_decontam_semantic" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |b AS (SELECT vec_id AS bench_id, v FROM e
          |      WHERE vec_id < 10 AND sqrt(list_dot_product(v, v)) > 0),
          |c AS (SELECT vec_id, v FROM e
          |      WHERE vec_id >= 10 AND sqrt(list_dot_product(v, v)) > 0),
          |s AS (SELECT c.vec_id, b.bench_id,
          |        list_dot_product(c.v, b.v) /
          |        (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))) AS cs
          |      FROM c, b)
          |SELECT vec_id, bench_id, round(cs, 6) AS cos_sim
          |FROM s WHERE cs >= 0.4 ORDER BY vec_id, bench_id""".stripMargin,
      // Cluster purity: the ivf_trained integer-Lloyd replay through
      // assignment, then label-scale counting.
      // zero-norm prefilter pins the drop convention: Spark-side
      // assignment sends zero-norm vectors to the -1 sentinel and drops
      // them (and in training they contribute to no real cell), so the
      // oracle excludes them from seeds/means/assignment alike
      "s_cluster_purity" ->
        """WITH e AS (
          |  SELECT vec_id, q FROM (
          |    SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |    FROM embeddings)
          |  WHERE sqrt(list_dot_product(q, q)) > 0),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |j AS (SELECT a3.cell, CAST(emb.label AS BIGINT) AS label
          |      FROM a3 JOIN embeddings emb USING (vec_id)),
          |cnt AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
          |tot AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n_members FROM cnt GROUP BY 1),
          |maj AS (SELECT cell, label AS majority_label, c FROM (
          |  SELECT cell, label, c, row_number() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
          |  FROM cnt) WHERE rn = 1)
          |SELECT t.cell, t.n_members, m.majority_label,
          |       round(CAST(m.c AS DOUBLE) / CAST(t.n_members AS DOUBLE), 6) AS purity
          |FROM tot t JOIN maj m USING (cell) ORDER BY t.cell""".stripMargin,
      // Durable-probe semantics: trained cells (same Lloyd replay),
      // per-query top-4 cells on raw-query x trained-centroid cosine,
      // then raw-cosine scoring of the probed cells' members.
      "s_ivf_probe" ->
        """WITH er AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |qv AS (SELECT vec_id, v FROM er
          |       WHERE vec_id < 10 AND sqrt(list_dot_product(v, v)) > 0),
          |pc AS (SELECT vec_id AS query_id, cell FROM (
          |  SELECT qv.vec_id, c2.cell,
          |         row_number() OVER (PARTITION BY qv.vec_id ORDER BY
          |           list_dot_product(qv.v, c2.c) / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(c2.c, c2.c))) DESC, c2.cell) AS rn
          |  FROM qv, c2) WHERE rn <= 4),
          |cand AS (SELECT pc.query_id, a3.vec_id AS neighbor_id
          |         FROM pc JOIN a3 ON a3.cell = pc.cell
          |         WHERE a3.vec_id <> pc.query_id),
          |sims AS (SELECT cd.query_id, cd.neighbor_id,
          |           list_dot_product(qq.v, ee.v) /
          |           (sqrt(list_dot_product(qq.v, qq.v)) * sqrt(list_dot_product(ee.v, ee.v))) AS c
          |         FROM cand cd
          |         JOIN er qq ON qq.vec_id = cd.query_id
          |         JOIN er ee ON ee.vec_id = cd.neighbor_id),
          |ranked AS (SELECT query_id, neighbor_id, c,
          |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INT) AS rnk
          |           FROM sims)
          |SELECT query_id, rnk, neighbor_id, round(c, 6) AS cos_sim
          |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // Byte-budget shard packing: exclusive byte prefix in doc_id
      // order (the oracle's window IS the semantics the distributed
      // two-phase prefix sum must reproduce), integer cut at 64 KiB.
      "m_shard_pack" ->
        """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |           FROM documents),
          |p AS (SELECT doc_id, nb,
          |        CAST(coalesce(sum(nb) OVER (ORDER BY doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
          |      FROM m)
          |SELECT doc_id, nb, pre // 65536 AS shard_id, pre % 65536 AS shard_off
          |FROM p ORDER BY doc_id""".stripMargin,
      "m_shard_manifest" ->
        """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |           FROM documents),
          |p AS (SELECT doc_id, nb,
          |        CAST(coalesce(sum(nb) OVER (ORDER BY doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
          |      FROM m),
          |s AS (SELECT doc_id, nb, pre // 65536 AS shard_id FROM p)
          |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_items,
          |       CAST(sum(nb) AS BIGINT) AS n_bytes,
          |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
      // Per-dimension moments on the 2^20 grid: DECIMAL-exact first and
      // second moments, identical IEEE op sequence for the final stats.
      "s_dim_stats" ->
        """WITH q AS (SELECT i AS dim, floor(embedding[i]::DOUBLE * 1048576.0) AS qd
          |           FROM embeddings, UNNEST(range(1, 65)) t(i)),
          |a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
          |        sum(CAST(qd AS DECIMAL(38,0))) AS s,
          |        sum(CAST(qd * qd AS DECIMAL(38,0))) AS ss,
          |        min(qd) AS mn, max(qd) AS mx
          |      FROM q GROUP BY 1)
          |SELECT CAST(dim AS BIGINT) AS dim,
          |       round(CAST(s AS DOUBLE) / n / 1048576.0, 6) AS mean_val,
          |       round((CAST(ss AS DOUBLE) / n -
          |              (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) /
          |             1099511627776.0, 6) AS var_val,
          |       round(mn / 1048576.0, 6) AS min_val,
          |       round(mx / 1048576.0, 6) AS max_val
          |FROM a ORDER BY dim""".stripMargin,
      // Cell representatives: the ivf_trained integer-Lloyd replay,
      // with the winning cosine carried through assignment so the
      // per-cell argmax member replays exactly.
      "s_cell_reps" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell, cs FROM (
          |  SELECT e.vec_id, p.cell,
          |         list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) AS cs,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |tot AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM a3 GROUP BY 1),
          |rep AS (SELECT cell, vec_id AS rep_id, cs FROM (
          |  SELECT cell, vec_id, cs, row_number() OVER (PARTITION BY cell ORDER BY cs DESC, vec_id) AS rn
          |  FROM a3) WHERE rn = 1)
          |SELECT t.cell, r.rep_id, t.n_members, round(r.cs, 6) AS rep_cos
          |FROM tot t JOIN rep r USING (cell) ORDER BY t.cell""".stripMargin,
      // Inter-source Jaccard over distinct 3-gram sets: integer
      // intersection/union counts, one final division.
      "t_source_overlap" ->
        """WITH toks AS (SELECT source, string_split(trim(text), ' ') AS w FROM documents),
          |g AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |      FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
          |iv AS (SELECT a.source AS src_a, b.source AS src_b,
          |              CAST(count(*) AS BIGINT) AS n_shared
          |       FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
          |       GROUP BY 1, 2)
          |SELECT src_a, src_b, n_shared, pa.n AS n_grams_a, pb.n AS n_grams_b,
          |       round(CAST(n_shared AS DOUBLE) /
          |             CAST(pa.n + pb.n - n_shared AS DOUBLE), 6) AS jaccard
          |FROM iv JOIN ps pa ON pa.source = iv.src_a
          |        JOIN ps pb ON pb.source = iv.src_b
          |ORDER BY src_a, src_b""".stripMargin,
      // t_overlap_sketch: the exact pair/count replay of
      // t_source_overlap (same gram definition, same omit-zero-shared
      // contract) with the HLL inclusion–exclusion verdict pinned as a
      // literal 1 — a red row means the sketch intersection left its
      // 5%-of-union envelope, not hash noise. Raw IE accuracy on
      // planted-overlap fixtures is asserted in SketchSpec.
      // t_overlap_theta: the same shape over word 4-GRAMS with theta
      // sketches (direct Intersection, not inclusion–exclusion); its
      // own exact 4-gram replay, verdict pinned as literal 1.
      "t_overlap_theta" ->
        """WITH toks AS (SELECT source, string_split(trim(text), ' ') AS w FROM documents),
          |g AS (SELECT DISTINCT source,
          |             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS g
          |      FROM toks, UNNEST(generate_series(1, len(w)-3)) AS t(i)),
          |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
          |iv AS (SELECT a.source AS src_a, b.source AS src_b,
          |              CAST(count(*) AS BIGINT) AS n_shared
          |       FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
          |       GROUP BY 1, 2)
          |SELECT src_a, src_b, n_shared, pa.n AS n_grams_a, pb.n AS n_grams_b,
          |       CAST(1 AS BIGINT) AS within_env
          |FROM iv JOIN ps pa ON pa.source = iv.src_a
          |        JOIN ps pb ON pb.source = iv.src_b
          |ORDER BY src_a, src_b""".stripMargin,
      "t_overlap_sketch" ->
        """WITH toks AS (SELECT source, string_split(trim(text), ' ') AS w FROM documents),
          |g AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |      FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
          |iv AS (SELECT a.source AS src_a, b.source AS src_b,
          |              CAST(count(*) AS BIGINT) AS n_shared
          |       FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
          |       GROUP BY 1, 2)
          |SELECT src_a, src_b, n_shared, pa.n AS n_grams_a, pb.n AS n_grams_b,
          |       CAST(1 AS BIGINT) AS within_env
          |FROM iv JOIN ps pa ON pa.source = iv.src_a
          |        JOIN ps pb ON pb.source = iv.src_b
          |ORDER BY src_a, src_b""".stripMargin,
      // Matryoshka truncation eval: prefix cosines via list_slice (the
      // same sequential fold as the Scala prefix kernel), integer
      // top-10 overlap counts vs the 64-dim baseline.
      "s_matryoshka" ->
        """WITH er AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |d AS (SELECT * FROM (VALUES (16), (32), (64)) t(dims)),
          |qv AS (SELECT d.dims, vec_id AS query_id, list_slice(v, 1, d.dims) AS q
          |       FROM er, d WHERE vec_id < 10),
          |cv AS (SELECT d.dims, vec_id AS neighbor_id, list_slice(v, 1, d.dims) AS c
          |       FROM er, d WHERE vec_id >= 10),
          |s AS (SELECT q.dims, q.query_id, c.neighbor_id,
          |        list_dot_product(q.q, c.c) /
          |        (sqrt(list_dot_product(q.q, q.q)) * sqrt(list_dot_product(c.c, c.c))) AS cs
          |      FROM qv q JOIN cv c ON q.dims = c.dims
          |      WHERE sqrt(list_dot_product(q.q, q.q)) > 0
          |        AND sqrt(list_dot_product(c.c, c.c)) > 0),
          |top AS (SELECT dims, query_id, neighbor_id FROM (
          |  SELECT dims, query_id, neighbor_id,
          |         row_number() OVER (PARTITION BY dims, query_id
          |                            ORDER BY cs DESC, neighbor_id) AS rn
          |  FROM s) WHERE rn <= 10),
          |base AS (SELECT query_id, neighbor_id FROM top WHERE dims = 64)
          |SELECT t.query_id, CAST(t.dims AS BIGINT) AS dims,
          |       CAST(count(b.neighbor_id) AS BIGINT) AS n_overlap
          |FROM top t LEFT JOIN base b
          |  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
          |WHERE t.dims <> 64
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // LSH bucket-size skew: md5-fold band hashes (the proven
      // cross-engine 32-bit hash), min-per-(doc, band) signatures,
      // bucket counts, band-grain stats — all integers.
      "d_bucket_stats" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |          FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |bd AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
          |h AS (SELECT doc_id, band,
          |        list_reduce(list_transform(range(1, 9),
          |          i -> (strpos('0123456789abcdef',
          |                       substr(md5(CAST(band AS VARCHAR) || ':' || g), i, 1)) - 1)::BIGINT),
          |          (a, b) -> a * 16 + b) AS h
          |      FROM grams, bd),
          |sigs AS (SELECT doc_id, band, min(h) AS sig FROM h GROUP BY 1, 2),
          |bk AS (SELECT band, sig, CAST(count(*) AS BIGINT) AS sz FROM sigs GROUP BY 1, 2)
          |SELECT CAST(band AS BIGINT) AS band,
          |       CAST(sum(sz) AS BIGINT) AS n_docs,
          |       CAST(count(*) AS BIGINT) AS n_buckets,
          |       CAST(max(sz) AS BIGINT) AS max_bucket,
          |       CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_collide_buckets,
          |       CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT) AS n_collide_docs
          |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin,
      // Binary-quantization recall: sign-bit Hamming via the 0/1
      // dot-product identity |a-b|^2 = a·a + b·b - 2a·b (exact integer
      // doubles), both top-10 rankings from one doubly-ranked relation.
      "s_binary_quant" ->
        """WITH er AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |nz AS (SELECT vec_id, v,
          |         list_transform(v, x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END) AS s
          |       FROM er WHERE sqrt(list_dot_product(v, v)) > 0),
          |q AS (SELECT vec_id AS query_id, v, s FROM nz WHERE vec_id < 10),
          |c AS (SELECT vec_id AS neighbor_id, v, s FROM nz WHERE vec_id >= 10),
          |sc AS (SELECT q.query_id, c.neighbor_id,
          |         list_dot_product(q.v, c.v) /
          |         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cs,
          |         CAST(list_dot_product(q.s, q.s) + list_dot_product(c.s, c.s)
          |              - 2 * list_dot_product(q.s, c.s) AS BIGINT) AS ham
          |       FROM q, c),
          |r AS (SELECT query_id, neighbor_id, ham,
          |        row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn_c,
          |        row_number() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) AS rn_h
          |      FROM sc)
          |SELECT query_id,
          |       CAST(sum(CASE WHEN rn_c <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
          |       CAST(min(CASE WHEN rn_h = 1 THEN ham END) AS BIGINT) AS ham_at_1
          |FROM r WHERE rn_h <= 10 GROUP BY 1 ORDER BY 1""".stripMargin,
      // Frame-granularity dedup census: the 128-hex-char (64-byte)
      // aligned windows ARE the fingerprints — exact content dedup.
      "m_frame_dedup" ->
        """WITH m AS (SELECT hex(encode(text)) AS hx FROM documents),
          |fr AS (SELECT substr(hx, CAST(f*128+1 AS INT), 128) AS fp
          |       FROM m, UNNEST(range(0, (len(hx) + 127) // 128)) AS t(f)
          |       WHERE len(hx) > 0),
          |c AS (SELECT fp, CAST(count(*) AS BIGINT) AS ct FROM fr GROUP BY 1)
          |SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS n_frames,
          |       CAST(count(*) AS BIGINT) AS n_distinct,
          |       CAST(coalesce(sum(ct) - count(*), 0) AS BIGINT) AS n_dup_frames,
          |       CAST(coalesce(max(ct), 0) AS BIGINT) AS max_multiplicity
          |FROM c""".stripMargin,
      // Data card: exact-long counts, single IEEE divisions, identical
      // fingerprint normalization and token rule as the dedup/mixing
      // oracles.
      "p_data_card" ->
        """WITH t AS (SELECT source, lang,
          |        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
          |        len(string_split(trim(text), ' ')) AS nt
          |      FROM documents),
          |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |         CAST(sum(nt) AS BIGINT) AS n_tokens,
          |         CAST(count(DISTINCT fp) AS BIGINT) AS nd,
          |         CAST(sum(CASE WHEN nt < 15 THEN 1 ELSE 0 END) AS BIGINT) AS ns
          |       FROM t GROUP BY 1),
          |lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS lc
          |       FROM t GROUP BY 1, 2),
          |top AS (SELECT source, lang AS top_lang, lc FROM (
          |  SELECT source, lang, lc,
          |         row_number() OVER (PARTITION BY source ORDER BY lc DESC, lang) AS rn
          |  FROM lc) WHERE rn = 1)
          |SELECT b.source, b.n_docs, b.n_tokens,
          |       round(1.0 - CAST(b.nd AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6) AS dup_rate,
          |       round(CAST(b.ns AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6) AS short_rate,
          |       t2.top_lang,
          |       round(CAST(t2.lc AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6) AS top_lang_share
          |FROM base b JOIN top t2 USING (source) ORDER BY b.source""".stripMargin,
      // IVF probe-width curve: the s_ivf_probe integer-Lloyd replay
      // with ALL cells ranked per query, candidates exploded by probe
      // width, integer top-5 overlap vs the all-cells baseline.
      "s_ivf_curve" ->
        """WITH er AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, q AS c FROM e WHERE vec_id < 16),
          |a1 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c0 p) WHERE rn = 1),
          |u1 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u1 GROUP BY 1),
          |a2 AS (SELECT vec_id, q, cell FROM (
          |  SELECT e.vec_id, e.q, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c1 p) WHERE rn = 1),
          |u2 AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS n
          |       FROM a2, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2),
          |c2 AS (SELECT cell, list(s / n ORDER BY i) AS c FROM u2 GROUP BY 1),
          |a3 AS (SELECT vec_id, cell FROM (
          |  SELECT e.vec_id, p.cell,
          |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |           list_dot_product(e.q, p.c) / (sqrt(list_dot_product(e.q, e.q)) * sqrt(list_dot_product(p.c, p.c))) DESC, p.cell) AS rn
          |  FROM e, c2 p) WHERE rn = 1),
          |qv AS (SELECT vec_id, v FROM er
          |       WHERE vec_id < 10 AND sqrt(list_dot_product(v, v)) > 0),
          |cr AS (SELECT qv.vec_id AS query_id, c2.cell,
          |         CAST(row_number() OVER (PARTITION BY qv.vec_id ORDER BY
          |           list_dot_product(qv.v, c2.c) / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(c2.c, c2.c))) DESC, c2.cell) AS INT) AS cellrank
          |       FROM qv, c2),
          |cand AS (SELECT cr.query_id, a3.vec_id AS neighbor_id, cr.cellrank
          |         FROM cr JOIN a3 ON a3.cell = cr.cell
          |         WHERE a3.vec_id <> cr.query_id),
          |sims AS (SELECT cd.query_id, cd.neighbor_id, cd.cellrank,
          |           list_dot_product(qq.v, ee.v) /
          |           (sqrt(list_dot_product(qq.v, qq.v)) * sqrt(list_dot_product(ee.v, ee.v))) AS cs
          |         FROM cand cd
          |         JOIN er qq ON qq.vec_id = cd.query_id
          |         JOIN er ee ON ee.vec_id = cd.neighbor_id),
          |np AS (SELECT * FROM (VALUES (1), (2), (4), (8), (16)) t(np)),
          |top AS (SELECT np, query_id, neighbor_id FROM (
          |  SELECT np.np, s.query_id, s.neighbor_id,
          |         row_number() OVER (PARTITION BY np.np, s.query_id
          |                            ORDER BY s.cs DESC, s.neighbor_id) AS rn
          |  FROM sims s JOIN np ON s.cellrank <= np.np) WHERE rn <= 5),
          |base AS (SELECT query_id, neighbor_id FROM top WHERE np = 16)
          |SELECT t.query_id, CAST(t.np AS BIGINT) AS nprobe,
          |       CAST(count(b.neighbor_id) AS BIGINT) AS n_overlap
          |FROM top t LEFT JOIN base b
          |  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
          |WHERE t.np <> 16
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Linear interpolation: same exact-DECIMAL anchors as ffill, one
      // integer-difference division per gap, fixed lerp op sequence.
      "e_resample_interp" ->
        """WITH ev AS (
          |  SELECT user_id, epoch_ms(ts) // 3600000 AS h, value FROM events),
          |hourly AS (
          |  SELECT user_id, h, count(*) AS n_events,
          |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s
          |  FROM ev GROUP BY 1, 2),
          |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
          |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds),
          |j AS (
          |  SELECT g.user_id, g.h, coalesce(a.n_events, 0) AS n_events, a.s
          |  FROM grid g LEFT JOIN hourly a USING (user_id, h)),
          |x AS (SELECT *,
          |  last_value(s IGNORE NULLS) OVER
          |    (PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS sp,
          |  last_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS) OVER
          |    (PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS hp,
          |  first_value(s IGNORE NULLS) OVER
          |    (PARTITION BY user_id ORDER BY h
          |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sn,
          |  first_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS) OVER
          |    (PARTITION BY user_id ORDER BY h
          |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hn
          |  FROM j)
          |SELECT user_id, h * 3600000 AS hour_ms, n_events,
          |       CAST(s IS NOT NULL AS BIGINT) AS observed,
          |       CAST(round(CAST(round(CASE WHEN s IS NOT NULL THEN s
          |             ELSE sp + (sn - sp) *
          |                  (CAST(h - hp AS DOUBLE) / CAST(hn - hp AS DOUBLE)) END,
          |             12) AS DECIMAL(38,12)), 6) AS DOUBLE) AS interp_sum
          |FROM x ORDER BY user_id, hour_ms""".stripMargin,
      // PQ distortion: the s_ann_pq codebook/codes replay, then the
      // same v·v − 2·v·c + c·c error per row on the 12-dp grid.
      "s_pq_distortion" ->
        """WITH e AS (
          |  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS q
          |  FROM embeddings),
          |sub AS (SELECT vec_id, s, list_slice(q, 16*s + 1, 16*s + 16) AS v
          |        FROM e, UNNEST(range(0, 4)) AS t(s)),
          |c0 AS (SELECT s, vec_id AS cell, v AS c FROM sub WHERE vec_id < 4),
          |a1 AS (SELECT vec_id, s, v, cell FROM (
          |  SELECT sub.vec_id, sub.s, sub.v, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN c0 p USING (s)) WHERE rn = 1),
          |u1 AS (SELECT s, cell, i, sum(v[i]) AS sm, count(*) AS n
          |       FROM a1, UNNEST(range(1, 17)) AS t(i) GROUP BY 1, 2, 3),
          |c1 AS (SELECT s, cell, list(sm / n ORDER BY i) AS c FROM u1 GROUP BY 1, 2),
          |codes AS (SELECT vec_id, s, cell FROM (
          |  SELECT sub.vec_id, sub.s, p.cell,
          |         row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
          |           list_dot_product(sub.v, sub.v) - 2 * list_dot_product(sub.v, p.c) + list_dot_product(p.c, p.c), p.cell) AS rn
          |  FROM sub JOIN c1 p USING (s)) WHERE rn = 1),
          |err AS (SELECT codes.s, codes.cell,
          |          CAST(round((list_dot_product(sub.v, sub.v)
          |                      - 2 * list_dot_product(sub.v, c1.c)
          |                      + list_dot_product(c1.c, c1.c))
          |                     / (1048576.0 * 1048576.0), 12) AS DECIMAL(38,12)) AS e
          |        FROM codes
          |        JOIN sub ON sub.vec_id = codes.vec_id AND sub.s = codes.s
          |        JOIN c1 ON c1.s = codes.s AND c1.cell = codes.cell)
          |SELECT CAST(s AS BIGINT) AS subspace, cell AS code,
          |       CAST(count(*) AS BIGINT) AS n_vectors,
          |       round(CAST(sum(e) AS DOUBLE) / count(*), 6) AS mse
          |FROM err GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Duplication spectrum: gram multiplicity histogram, all integers.
      "d_dup_spectrum" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |          FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |c AS (SELECT g, CAST(count(*) AS BIGINT) AS ct FROM grams GROUP BY 1)
          |SELECT CASE WHEN ct >= 11 THEN 11 ELSE ct END AS multiplicity,
          |       CAST(count(*) AS BIGINT) AS n_grams,
          |       CAST(sum(ct) AS BIGINT) AS n_occurrences
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
      // Trend census: integer midpoint compare against broadcast bounds.
      "e_trend_types" ->
        """WITH ev AS (SELECT event_type, epoch_ms(ts) AS ms FROM events),
          |b AS (SELECT min(ms) AS lo, max(ms) AS hi FROM ev)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(CASE WHEN ms * 2 > lo + hi THEN 0 ELSE 1 END) AS BIGINT) AS n_early,
          |       CAST(sum(CASE WHEN ms * 2 > lo + hi THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
          |       round(CAST(sum(CASE WHEN ms * 2 > lo + hi THEN 1 ELSE 0 END) AS DOUBLE) /
          |             CAST(count(*) AS DOUBLE), 6) AS late_share
          |FROM ev, b GROUP BY 1 ORDER BY 1""".stripMargin,
      // Markov transition matrix: lead() over the identical
      // (user, ms, event_id) order, integer counts, one division.
      "e_type_transitions" ->
        """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          |            FROM events),
          |p AS (SELECT event_type AS from_type,
          |        lead(event_type, 1) OVER (PARTITION BY user_id
          |                                  ORDER BY ms, event_id) AS to_type
          |      FROM ev),
          |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |       round(CAST(n AS DOUBLE) /
          |             CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
          |FROM c ORDER BY from_type, to_type""".stripMargin,
      // RRF hybrid retrieval: integer ranks off the established
      // Jaccard/cosine orders, one IEEE division per present term,
      // fixed two-term sum.
      "s_hybrid_rrf" ->
        """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
          |grams AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |          FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
          |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY 1),
          |qg AS (SELECT doc_id AS query_id, g FROM grams WHERE doc_id < 10),
          |cg AS (SELECT doc_id, g FROM grams WHERE doc_id >= 10),
          |li AS (SELECT qg.query_id, cg.doc_id, CAST(count(*) AS BIGINT) AS inter
          |       FROM qg JOIN cg USING (g) GROUP BY 1, 2),
          |ls AS (SELECT li.query_id, li.doc_id,
          |         CAST(li.inter AS DOUBLE) /
          |         CAST(sq.n + sd.n - li.inter AS DOUBLE) AS s
          |       FROM li JOIN sizes sq ON sq.doc_id = li.query_id
          |               JOIN sizes sd ON sd.doc_id = li.doc_id),
          |lr AS (SELECT query_id, doc_id, rl FROM (
          |  SELECT query_id, doc_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |                                 ORDER BY s DESC, doc_id) AS INT) AS rl
          |  FROM ls) WHERE rl <= 50),
          |er AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |qv AS (SELECT vec_id AS query_id, v FROM er
          |       WHERE vec_id < 10 AND sqrt(list_dot_product(v, v)) > 0),
          |cv AS (SELECT vec_id AS doc_id, v FROM er
          |       WHERE vec_id >= 10 AND sqrt(list_dot_product(v, v)) > 0),
          |vs AS (SELECT q.query_id, c.doc_id,
          |         list_dot_product(q.v, c.v) /
          |         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS s
          |       FROM qv q, cv c),
          |vr AS (SELECT query_id, doc_id, rv FROM (
          |  SELECT query_id, doc_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |                                 ORDER BY s DESC, doc_id) AS INT) AS rv
          |  FROM vs) WHERE rv <= 50),
          |fused AS (
          |  SELECT coalesce(lr.query_id, vr.query_id) AS query_id,
          |         coalesce(lr.doc_id, vr.doc_id) AS doc_id,
          |         coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rl), 0)
          |       + coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rv), 0) AS rrf
          |  FROM lr FULL OUTER JOIN vr
          |    ON vr.query_id = lr.query_id AND vr.doc_id = lr.doc_id)
          |SELECT query_id, rnk, doc_id, round(rrf, 6) AS rrf_score
          |FROM (SELECT query_id, doc_id, rrf,
          |             CAST(row_number() OVER (PARTITION BY query_id
          |                                     ORDER BY rrf DESC, doc_id) AS INT) AS rnk
          |      FROM fused)
          |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // Filtered vector search: the label predicate restricts
      // candidates BEFORE the established cosine ranking.
      "s_ann_filtered" ->
        """WITH er AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          |                   CAST(label AS BIGINT) AS label
          |            FROM embeddings),
          |q AS (SELECT vec_id AS query_id, v, label FROM er
          |      WHERE vec_id < 10 AND sqrt(list_dot_product(v, v)) > 0),
          |c AS (SELECT vec_id AS neighbor_id, v, label FROM er
          |      WHERE vec_id >= 10 AND sqrt(list_dot_product(v, v)) > 0),
          |s AS (SELECT q.query_id, c.neighbor_id, c.label,
          |        list_dot_product(q.v, c.v) /
          |        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cs
          |      FROM q JOIN c ON c.label = q.label)
          |SELECT query_id, rnk, neighbor_id, label, round(cs, 6) AS cos_sim
          |FROM (SELECT query_id, neighbor_id, label, cs,
          |             CAST(row_number() OVER (PARTITION BY query_id
          |                                     ORDER BY cs DESC, neighbor_id) AS INT) AS rnk
          |      FROM s)
          |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
      // Z-order census: the oracle replays the operator's whole bit
      // algebra — linear 8-bit rank (same double-division shape, same
      // least/floor/CAST order) and the Morton interleave term list —
      // then checks the per-cell census at the 4+4-bit prefix level.
      "q_join_preflight" ->
        s"""SELECT
           |  (SELECT count(*) FROM lineitem) AS left_rows,
           |  (SELECT count(*) FROM part WHERE p_partkey % 2 = 0) AS right_rows,
           |  (SELECT count(DISTINCT l_partkey) FROM lineitem) AS left_est_keys,
           |  (SELECT count(DISTINCT p_partkey) FROM part WHERE p_partkey % 2 = 0) AS right_est_keys,
           |  (SELECT count(DISTINCT l_partkey) FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_partkey % 2 = 0) AS est_matched_keys,
           |  (SELECT count(*) FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_partkey % 2 = 0) AS est_output_rows,
           |  'broadcast-right' AS recommendation""".stripMargin,
      "q_zorder_cells" ->
        s"""WITH st AS (
           |  SELECT CAST(min(l_partkey) AS DOUBLE) AS plo, CAST(max(l_partkey) AS DOUBLE) AS phi,
           |         CAST(min(l_suppkey) AS DOUBLE) AS slo, CAST(max(l_suppkey) AS DOUBLE) AS shi
           |  FROM lineitem),
           |r AS (
           |  SELECT l_partkey, l_suppkey, l_extendedprice,
           |    CASE WHEN phi <= plo THEN 0 ELSE CAST(least(floor((CAST(l_partkey AS DOUBLE) - plo) / (phi - plo) * 256.0), 255.0) AS BIGINT) END AS ra,
           |    CASE WHEN shi <= slo THEN 0 ELSE CAST(least(floor((CAST(l_suppkey AS DOUBLE) - slo) / (shi - slo) * 256.0), 255.0) AS BIGINT) END AS rb
           |  FROM lineitem, st)
           |SELECT (${zInterleaveSql(Seq("ra", "rb"), 8)}) >> 8 AS cell,
           |       count(*) AS n,
           |       min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
           |       min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
      // Z-order prune losslessness: the oracle states ONLY the exact
      // box predicate (no cell filter) — a hash match proves the
      // Spark side's coarse cell prune dropped no qualifying row.
      "q_zorder_prune" ->
        s"""WITH st AS (
           |  SELECT CAST(min(l_partkey) AS DOUBLE) AS plo, CAST(max(l_partkey) AS DOUBLE) AS phi,
           |         CAST(min(l_suppkey) AS DOUBLE) AS slo, CAST(max(l_suppkey) AS DOUBLE) AS shi
           |  FROM lineitem),
           |r AS (
           |  SELECT l_partkey, l_suppkey, l_extendedprice,
           |    CASE WHEN phi <= plo THEN 0 ELSE CAST(least(floor((CAST(l_partkey AS DOUBLE) - plo) / (phi - plo) * 256.0), 255.0) AS BIGINT) END AS ra,
           |    CASE WHEN shi <= slo THEN 0 ELSE CAST(least(floor((CAST(l_suppkey AS DOUBLE) - slo) / (shi - slo) * 256.0), 255.0) AS BIGINT) END AS rb,
           |    CAST(l_partkey AS DOUBLE) AS pv, CAST(l_suppkey AS DOUBLE) AS sv,
           |    plo + (phi - plo) * 0.25 AS bplo, plo + (phi - plo) * 0.5 AS bphi,
           |    slo + (shi - slo) * 0.25 AS bslo, slo + (shi - slo) * 0.5 AS bshi
           |  FROM lineitem, st)
           |SELECT (${zInterleaveSql(Seq("ra", "rb"), 8)}) >> 8 AS cell,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM r
           |WHERE pv >= bplo AND pv < bphi AND sv >= bslo AND sv < bshi
           |GROUP BY 1 ORDER BY 1""".stripMargin
    )
  }
}
