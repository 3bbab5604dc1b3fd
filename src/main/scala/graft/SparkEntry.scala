package graft

import graft.queries.{AggQueries, EventQueries, PipelineQueries, SegmentQueries, TpchQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A Druid-dialect timeseries JSON compiled to a DataFrame plan. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.timeseries(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G. TPC-H-style analytics
    "q1_pricing" -> (TpchQueries.q1Pricing _),
    "q3_shipping" -> (TpchQueries.q3Shipping _),
    "q5_local_supplier" -> (TpchQueries.q5LocalSupplier _),
    "q6_forecast" -> (TpchQueries.q6Forecast _),
    "q4_priority" -> (TpchQueries.q4Priority _),
    "q10_top_customers" -> (TpchQueries.q10TopCustomers _),
    "q19_discounted" -> (TpchQueries.q19Discounted _),
    // B. Druid query model (JSON dialect → DataFrame)
    "q_timeseries" -> (EventQueries.timeseries _),
    "q_timeseries_15m" -> (EventQueries.timeseries15m _),
    "q_topn" -> (EventQueries.topN _),
    "q_topn_daily" -> (EventQueries.topNDaily _),
    "q_sessionize" -> (EventQueries.sessionize _),
    "q_groupby" -> (EventQueries.groupBy _),
    "q_scan_filtered" -> (EventQueries.scanFiltered _),
    "q_search" -> (EventQueries.search _),
    "q_time_boundary" -> (EventQueries.timeBoundary _),
    "q_segment_metadata" -> (EventQueries.segmentMetadata _),
    // A. Segment store: rollup ingest + timeline-resolved scan + re-agg
    "q_segment_scan" -> (SegmentQueries.segmentScan _),
    "q_rollup_reagg" -> (SegmentQueries.rollupReagg _),
    "q_segment_compact" -> (SegmentQueries.segmentCompact _),
    "q_segment_vacuum" -> (SegmentQueries.segmentVacuum _),
    "q_ingestion_spec" -> (SegmentQueries.ingestionSpecScan _),
    "q_druid_segment" -> (SegmentQueries.druidSegmentRead _),
    "q_druid_deepstore" -> (SegmentQueries.druidDeepStore _),
    // I. Streaming (AvailableNow micro-batches → segment store)
    "q_stream_rollup" -> (SegmentQueries.streamRollup _),
    "q_stream_dedup" -> (PipelineQueries.streamDedup _),
    // H. LLM-pipeline operators
    "q_dedup_exact" -> (PipelineQueries.dedupExact _),
    "q_dedup_minhash" -> (PipelineQueries.dedupMinhash _),
    "q_dedup_cross" -> (PipelineQueries.dedupCross _),
    "q_dedup_simhash" -> (PipelineQueries.dedupSimhash _),
    "q_ngram_jaccard" -> (PipelineQueries.ngramJaccard _),
    "q_dedup_embed" -> (PipelineQueries.dedupEmbed _),
    "q_semdedup" -> (PipelineQueries.semdedup _),
    "q_ann_brute" -> (PipelineQueries.annBrute _),
    "q_ann_ivf" -> (PipelineQueries.annIvf _),
    "q_ann_ivf_indexed" -> (PipelineQueries.annIvfIndexed _),
    "q_lang_id" -> (PipelineQueries.langIdQ _),
    "q_text_quality" -> (PipelineQueries.textQuality _),
    "q_repetition" -> (PipelineQueries.repetition _),
    "q_quality_filter" -> (PipelineQueries.qualityFilter _),
    "q_token_count" -> (PipelineQueries.tokenCount _),
    "q_doc_fingerprint" -> (PipelineQueries.docFingerprint _),
    "q_redact" -> (PipelineQueries.redactQ _),
    "q_contamination" -> (PipelineQueries.contaminationQ _),
    "q_multimodal" -> (PipelineQueries.multimodal _),
    // D. remaining aggregator coverage
    "q_agg_firstlast" -> (AggQueries.aggFirstLast _),
    "q_theta" -> (AggQueries.aggTheta _),
    "q_theta_setops" -> (AggQueries.aggThetaSetops _),
    "q_hll" -> (AggQueries.aggHll _),
    "q_hll_exact" -> (AggQueries.hllExact _),
    "q_filtered_agg" -> (AggQueries.filteredAgg _),
    "q_multivalue" -> (AggQueries.multiValue _),
    "q_quantiles" -> (AggQueries.aggQuantiles _),
    "q_quantiles_sketch" -> (AggQueries.aggQuantilesSketch _),
    "q_quantiles_kll_exact" -> (AggQueries.kllExact _),
    "q_subtotals" -> (AggQueries.subtotals _),
    "q_extraction" -> (EventQueries.extraction _),
    "q_lookup" -> (EventQueries.lookup _),
    "q_virtual" -> (EventQueries.virtual _),
    "q_scan_paged" -> (EventQueries.scanPaged _),
    "q_json_extract" -> (EventQueries.jsonExtract _),
    "q_dedup_clusters" -> (PipelineQueries.dedupClusters _),
    "q_sample_split" -> (PipelineQueries.sampleSplit _),
    "q_asof_join" -> (PipelineQueries.asofQ _),
    "q_salted_join" -> (PipelineQueries.saltedJoinQ _),
    "q_vocab" -> (PipelineQueries.vocabQ _),
    "q_doc_chunks" -> (PipelineQueries.docChunks _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> TpchQueries.q1PricingSql,
    "q3_shipping" -> TpchQueries.q3ShippingSql,
    "q5_local_supplier" -> TpchQueries.q5LocalSupplierSql,
    "q6_forecast" -> TpchQueries.q6ForecastSql,
    "q4_priority" -> TpchQueries.q4PrioritySql,
    "q10_top_customers" -> TpchQueries.q10TopCustomersSql,
    "q19_discounted" -> TpchQueries.q19DiscountedSql,
    "q_timeseries" -> EventQueries.timeseriesSql,
    "q_timeseries_15m" -> EventQueries.timeseries15mSql,
    "q_topn" -> EventQueries.topNSql,
    "q_topn_daily" -> EventQueries.topNDailySql,
    "q_sessionize" -> EventQueries.sessionizeSql,
    "q_groupby" -> EventQueries.groupBySql,
    "q_scan_filtered" -> EventQueries.scanSql,
    "q_search" -> EventQueries.searchSql,
    "q_time_boundary" -> EventQueries.timeBoundarySql,
    "q_segment_metadata" -> EventQueries.segmentMetadataSql,
    "q_segment_scan" -> SegmentQueries.segmentScanSql,
    "q_rollup_reagg" -> SegmentQueries.rollupReaggSql,
    "q_segment_compact" -> SegmentQueries.segmentCompactSql,
    "q_segment_vacuum" -> SegmentQueries.segmentVacuumSql,
    "q_ingestion_spec" -> SegmentQueries.ingestionSpecScanSql,
    "q_druid_deepstore" -> SegmentQueries.druidDeepStoreSql,
    "q_stream_rollup" -> SegmentQueries.streamRollupSql,
    "q_stream_dedup" -> PipelineQueries.streamDedupSql,
    "q_dedup_exact" -> PipelineQueries.dedupExactSql,
    "q_dedup_minhash" -> PipelineQueries.dedupMinhashSql,
    "q_dedup_cross" -> PipelineQueries.dedupCrossSql,
    "q_ngram_jaccard" -> PipelineQueries.ngramJaccardSql,
    "q_ann_brute" -> PipelineQueries.annBruteSql,
    "q_ann_ivf" -> PipelineQueries.annIvfSql,
    "q_ann_ivf_indexed" -> PipelineQueries.annIvfIndexedSql,
    "q_lang_id" -> PipelineQueries.langIdSql,
    "q_text_quality" -> PipelineQueries.textQualitySql,
    "q_repetition" -> PipelineQueries.repetitionSql,
    "q_quality_filter" -> PipelineQueries.qualityFilterSql,
    "q_token_count" -> PipelineQueries.tokenCountSql,
    "q_redact" -> PipelineQueries.redactSql,
    "q_multimodal" -> PipelineQueries.multimodalSql,
    "q_agg_firstlast" -> AggQueries.aggFirstLastSql,
    "q_theta" -> AggQueries.aggThetaSql,
    "q_theta_setops" -> AggQueries.aggThetaSetopsSql,
    "q_hll_exact" -> AggQueries.hllExactSql,
    "q_quantiles_kll_exact" -> AggQueries.kllExactSql,
    "q_filtered_agg" -> AggQueries.filteredAggSql,
    "q_multivalue" -> AggQueries.multiValueSql,
    "q_subtotals" -> AggQueries.subtotalsSql,
    "q_quantiles" -> AggQueries.aggQuantilesSql,
    "q_extraction" -> EventQueries.extractionSql,
    "q_lookup" -> EventQueries.lookupSql,
    "q_virtual" -> EventQueries.virtualSql,
    "q_scan_paged" -> EventQueries.scanPagedSql,
    "q_json_extract" -> EventQueries.jsonExtractSql,
    "q_dedup_clusters" -> PipelineQueries.dedupClustersSql,
    "q_sample_split" -> PipelineQueries.sampleSplitSql,
    "q_asof_join" -> PipelineQueries.asofSql,
    "q_salted_join" -> PipelineQueries.saltedJoinSql,
    "q_vocab" -> PipelineQueries.vocabSql,
    "q_doc_chunks" -> PipelineQueries.docChunksSql,
    "q_dedup_simhash" -> PipelineQueries.dedupSimhashSql,
    "q_dedup_embed" -> PipelineQueries.dedupEmbedSql,
    "q_semdedup" -> PipelineQueries.semdedupSql,
    "q_doc_fingerprint" -> PipelineQueries.docFingerprintSql,
    "q_contamination" -> PipelineQueries.contaminationSql,
    "q_druid_segment" -> SegmentQueries.druidSegmentReadSql,
    // q_hll, q_quantiles_sketch: rows-only — the outputs are estimates
    // of the engine's own HLL/KLL sketches; no SQL engine computes the
    // same estimator, so there is no honest SQL mirror. Estimate
    // accuracy and merge laws are spec-tested (AggregatorsSpec).
  )
}
