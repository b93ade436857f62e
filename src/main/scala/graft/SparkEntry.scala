package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql` (same
  * column names, same ORDER BY, decimal-cast aggregates — see
  * CoreQueries for the numeric policy).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing" -> CoreQueries.aggPricing,
    "q_probe_counts" -> CoreQueries.probeCounts,
    "q_checksum_lineitem" -> CoreQueries.checksumLineitem,
    "q_salted_join" -> CoreQueries.saltedJoin,
    "q_file_route" -> IngestQueries.fileRoute,
    "q_ddl_schema" -> IngestQueries.ddlSchema,
    "q_table_filter" -> IngestQueries.tableFilter,
    "q_shard_merge" -> IngestQueries.shardMerge,
    "q_column_permutation" -> IngestQueries.columnPermutation,
    "q_type_cast" -> IngestQueries.typeCast,
    "q_strict_cast" -> IngestQueries.strictCast,
    "q_rowid_assign" -> IngestQueries.rowidAssign,
    "q_auto_random" -> IngestQueries.autoRandom,
    "q_csv_roundtrip" -> IngestQueries.csvRoundtrip,
    "q_csv_multisep" -> IngestQueries.csvMultisep,
    "q_csv_header" -> IngestQueries.csvHeader,
    "q_dump_roundtrip" -> IngestQueries.dumpRoundtrip,
    "q_sorted_write" -> IngestQueries.sortedWrite,
    "q_checksum_roundtrip" -> IngestQueries.checksumRoundtrip,
    "q_dedup_policy" -> IngestQueries.dedupPolicy,
    "q_dedup_error" -> IngestQueries.dedupError,
    "q_dedup_conflicts" -> IngestQueries.dedupConflicts,
    "q_analyze" -> IngestQueries.analyzeStats,
    "q_compact" -> IngestQueries.compactOutput,
    "q_text_stats" -> TextQueries.textStats,
    "q_token_hist" -> TextQueries.tokenHist,
    "q_pack_sequences" -> TextQueries.packSequences,
    "q_gopher_rules" -> TextQueries.gopherRules,
    "q_doc_repetition" -> TextQueries.docRepetition,
    "q_jsonl_roundtrip" -> TextQueries.jsonlRoundtrip,
    "q_corpus_report" -> TextQueries.corpusReport,
    "q_quality_score" -> TextQueries.qualityScore,
    "q_langid" -> TextQueries.langid,
    "q_fingerprint" -> TextQueries.fingerprint,
    "q_redact" -> TextQueries.redact,
    "q_dedup_exact" -> DedupQueries.dedupExact,
    "q_dedup_ngram" -> DedupQueries.dedupNgram,
    "q_dedup_minhash" -> DedupQueries.dedupMinhash,
    "q_dedup_simhash" -> DedupQueries.dedupSimhash,
    "q_dedup_simhash_pairs" -> DedupQueries.dedupSimhashPairs,
    "q_dedup_clusters" -> DedupQueries.dedupClusters,
    "q_dedup_incremental" -> DedupQueries.dedupIncremental,
    "q_decontaminate" -> DedupQueries.decontaminate,
    "q_sample_strata" -> TextQueries.sampleStrata,
    "q_vocab_topk" -> TextQueries.vocabTopk,
    "q_best_per_lang" -> TextQueries.bestPerLang,
    "q_ann_bruteforce" -> SimilarityQueries.annBruteForce,
    "q_ann_lsh" -> SimilarityQueries.annLsh,
    "q_ann_ivf" -> SimilarityQueries.annIvf,
    "q_ann_lsh_bucketed" -> SimilarityQueries.annLshBucketed,
    "q_embed_dedup" -> SimilarityQueries.embedDedup,
    // rows-only check: float centroid means aren't bit-reproducible in
    // SQL, so no oracle entry (driver records the weaker gate)
    "q_kmeans_cells" -> ((s: SparkSession, dir: String) => KMeans.kmeansCells(s, dir)),
    "q_media_meta" -> Multimodal.mediaMeta,
    "q_media_frames" -> Multimodal.mediaFrames,
    "q_window_hourly" -> EventQueries.windowHourly,
    "q_sessionize" -> EventQueries.sessionize,
    "q_gencol" -> PipelineQueries.gencol,
    "q_gencol_funcs" -> PipelineQueries.gencolFuncs,
    "q_ingest_e2e" -> PipelineQueries.ingestE2e,
    "q_auto_inc_e2e" -> PipelineQueries.autoIncE2e,
    "q_csv_gz" -> PipelineQueries.csvGz,
    "q_partitioned_e2e" -> PipelineQueries.partitionedE2e,
    "q_error_summary" -> PipelineQueries.errorSummary,
    "q_view" -> PipelineQueries.viewRestore,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" -> CoreQueries.aggPricingSql,
    "q_probe_counts" -> CoreQueries.probeCountsSql,
    "q_checksum_lineitem" -> CoreQueries.checksumLineitemSql,
    "q_salted_join" -> CoreQueries.saltedJoinSql,
    "q_file_route" -> IngestQueries.fileRouteSql,
    "q_ddl_schema" -> IngestQueries.ddlSchemaSql,
    "q_table_filter" -> IngestQueries.tableFilterSql,
    "q_shard_merge" -> IngestQueries.shardMergeSql,
    "q_column_permutation" -> IngestQueries.columnPermutationSql,
    "q_type_cast" -> IngestQueries.typeCastSql,
    "q_strict_cast" -> IngestQueries.strictCastSql,
    "q_rowid_assign" -> IngestQueries.rowidAssignSql,
    "q_auto_random" -> IngestQueries.autoRandomSql,
    "q_csv_roundtrip" -> IngestQueries.csvRoundtripSql,
    "q_csv_multisep" -> IngestQueries.csvMultisepSql,
    "q_csv_header" -> IngestQueries.csvHeaderSql,
    "q_dump_roundtrip" -> IngestQueries.dumpRoundtripSql,
    "q_sorted_write" -> IngestQueries.sortedWriteSql,
    "q_checksum_roundtrip" -> IngestQueries.checksumRoundtripSql,
    "q_dedup_policy" -> IngestQueries.dedupPolicySql,
    "q_dedup_error" -> IngestQueries.dedupErrorSql,
    "q_dedup_conflicts" -> IngestQueries.dedupConflictsSql,
    "q_analyze" -> IngestQueries.analyzeStatsSql,
    "q_compact" -> IngestQueries.compactOutputSql,
    "q_text_stats" -> TextQueries.textStatsSql,
    "q_token_hist" -> TextQueries.tokenHistSql,
    "q_pack_sequences" -> TextQueries.packSequencesSql,
    "q_gopher_rules" -> TextQueries.gopherRulesSql,
    "q_doc_repetition" -> TextQueries.docRepetitionSql,
    "q_jsonl_roundtrip" -> TextQueries.jsonlRoundtripSql,
    "q_corpus_report" -> TextQueries.corpusReportSql,
    "q_quality_score" -> TextQueries.qualityScoreSql,
    "q_langid" -> TextQueries.langidSql,
    "q_fingerprint" -> TextQueries.fingerprintSql,
    "q_redact" -> TextQueries.redactSql,
    "q_dedup_exact" -> DedupQueries.dedupExactSql,
    "q_dedup_ngram" -> DedupQueries.dedupNgramSql,
    "q_dedup_minhash" -> DedupQueries.dedupMinhashSql,
    "q_dedup_simhash" -> DedupQueries.dedupSimhashSql,
    "q_dedup_simhash_pairs" -> DedupQueries.dedupSimhashPairsSql,
    "q_dedup_clusters" -> DedupQueries.dedupClustersSql,
    "q_dedup_incremental" -> DedupQueries.dedupIncrementalSql,
    "q_decontaminate" -> DedupQueries.decontaminateSql,
    "q_sample_strata" -> TextQueries.sampleStrataSql,
    "q_vocab_topk" -> TextQueries.vocabTopkSql,
    "q_best_per_lang" -> TextQueries.bestPerLangSql,
    "q_ann_bruteforce" -> SimilarityQueries.annBruteForceSql,
    "q_ann_lsh" -> SimilarityQueries.annLshSql,
    "q_ann_ivf" -> SimilarityQueries.annIvfSql,
    "q_ann_lsh_bucketed" -> SimilarityQueries.annLshBucketedSql,
    "q_embed_dedup" -> SimilarityQueries.embedDedupSql,
    "q_media_meta" -> Multimodal.mediaMetaSql,
    "q_media_frames" -> Multimodal.mediaFramesSql,
    "q_window_hourly" -> EventQueries.windowHourlySql,
    "q_sessionize" -> EventQueries.sessionizeSql,
    "q_gencol" -> PipelineQueries.gencolSql,
    "q_gencol_funcs" -> PipelineQueries.gencolFuncsSql,
    "q_ingest_e2e" -> PipelineQueries.ingestE2eSql,
    "q_auto_inc_e2e" -> PipelineQueries.autoIncE2eSql,
    "q_csv_gz" -> PipelineQueries.csvGzSql,
    "q_partitioned_e2e" -> PipelineQueries.partitionedE2eSql,
    "q_error_summary" -> PipelineQueries.errorSummarySql,
    "q_view" -> PipelineQueries.viewRestoreSql,
  )
}
