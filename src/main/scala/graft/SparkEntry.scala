package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Every queries entry has a DuckDB oracle twin.
  */
object SparkEntry {

  /** Flagship on sf0.001: the reference's full incremental ETL shape
    * (crawl snapshot → manifest delta → chunk → chunk ids).
    */
  def entry(spark: SparkSession): DataFrame =
    Etl.incrementalChunks(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. reference ETL surface
    "q_crawl_bfs" -> (Crawl.crawlBfs _),
    "q_crawl_limited" -> (Crawl.crawlLimitedQuery _),
    "q_discover" -> (Etl.discover _),
    "q_manifest_delta" -> (Etl.manifestDelta _),
    "q_content_hash" -> (Etl.contentHash _),
    "q_chunk" -> (Etl.chunk _),
    "q_chunk_ids" -> (Etl.chunkIds _),
    "q_upsert_state" -> (Etl.upsertState _),
    "q_safe_name" -> (Etl.safeName _),
    "q_display_name" -> (Etl.displayName _),
    "q_page_title" -> (Etl.pageTitle _),
    "q_normalize_id" -> (Etl.normalizeId _),
    "q_media_meta" -> (Etl.mediaMeta _),
    // B. analytics core
    "q1_agg" -> (Analytics.q1Agg _),
    "q3_topn" -> (Analytics.q3TopN _),
    "q5_region" -> (Analytics.q5Region _),
    "q_rollup" -> (Analytics.rollupSummary _),
    "q_exists" -> (Analytics.existsAnti _),
    "q_window_topk" -> (Analytics.windowTopK _),
    "q_events_hourly" -> (Analytics.eventsHourly _),
    "q_sessionize" -> (Analytics.sessionize _),
    // C. LLM-training-data operators
    "q_dedup_exact" -> (Dedup.exact _),
    "q_dedup_minhash" -> (Dedup.minhash _),
    "q_dedup_simhash" -> (Dedup.simhash _),
    "q_dedup_ngram" -> (Dedup.ngramJaccard _),
    "q_dedup_keep" -> (Dedup.keep _),
    "q_substr_dedup" -> (Substr.substrDedup _),
    "q_dedup_embed" -> (Ann.embedDedup _),
    "q_dedup_embed_mp" -> (Ann.embedDedupMp _),
    "q_ann_adaptive" -> (Ann.ivfAdaptive _),
    "q_ann_brute" -> (Ann.bruteForce _),
    "q_ann_ivf" -> (Ann.ivf _),
    "q_ann_rerank" -> (Ann.annRerank _),
    "q_ivf_stats" -> (Ann.ivfStats _),
    "q_bm25" -> (Relevance.bm25 _),
    "q_fertility" -> (TextAnalysis.fertility _),
    "q_url_canon" -> (Urls.urlCanon _),
    "q_quantiles" -> (Analytics.quantiles _),
    "q_histogram" -> (Corpus.histogram _),
    "q_split" -> (Corpus.split _),
    "q_domain_mix" -> (Corpus.domainMix _),
    "q_domain_cap" -> (Corpus.domainCap _),
    "q_contamination" -> (Corpus.contamination _),
    "q_pack" -> (Corpus.pack _),
    "q_lang_id" -> (TextAnalysis.langId _),
    "q_quality" -> (TextAnalysis.quality _),
    "q_repetition" -> (TextAnalysis.repetition _),
    "q_filter" -> (TextAnalysis.filterMask _),
    "q_filter_domain" -> (TextAnalysis.filterDomain _),
    "q_quality_sketch" -> (QualitySketch.qualitySketch _),
    "q_tokens" -> (TextAnalysis.tokens _),
    "q_fingerprint" -> (TextAnalysis.fingerprint _),
    "q_vocab" -> (Corpus.vocab _),
    "q_quality_domain" -> (TextAnalysis.qualityDomain _),
    "q_mix_sample" -> (Corpus.mixSample _),
    "q_dsir" -> (Corpus.dsir _),
    "q_boilerplate" -> (Scrub.boilerplate _),
    "q_para_dedup" -> (Scrub.paraDedup _),
    "q_pii_scrub" -> (Scrub.piiScrub _),
    "q_vec_quant" -> (Quantize.vecQuant _),
  )

  /** DuckDB-runnable oracle SQL per queries key (same tables, same
    * column aliases — the driver compare sorts columns by name).
    */
  def oracleSql: Map[String, String] = Map(
    "q_crawl_bfs" -> Crawl.crawlBfsSql,
    "q_crawl_limited" -> Crawl.crawlLimitedSql,
    "q_discover" -> Etl.discoverSql,
    "q_manifest_delta" -> Etl.manifestDeltaSql,
    "q_content_hash" -> Etl.contentHashSql,
    "q_chunk" -> Etl.chunkSql,
    "q_chunk_ids" -> Etl.chunkIdsSql,
    "q_upsert_state" -> Etl.upsertStateSql,
    "q_safe_name" -> Etl.safeNameSql,
    "q_display_name" -> Etl.displayNameSql,
    "q_page_title" -> Etl.pageTitleSql,
    "q_normalize_id" -> Etl.normalizeIdSql,
    "q_media_meta" -> Etl.mediaMetaSql,
    "q1_agg" -> Analytics.q1AggSql,
    "q3_topn" -> Analytics.q3TopNSql,
    "q5_region" -> Analytics.q5RegionSql,
    "q_rollup" -> Analytics.rollupSummarySql,
    "q_exists" -> Analytics.existsAntiSql,
    "q_window_topk" -> Analytics.windowTopKSql,
    "q_events_hourly" -> Analytics.eventsHourlySql,
    "q_sessionize" -> Analytics.sessionizeSql,
    "q_dedup_exact" -> Dedup.exactSql,
    "q_dedup_minhash" -> Dedup.minhashSql,
    "q_dedup_simhash" -> Dedup.simhashSql,
    "q_dedup_ngram" -> Dedup.ngramJaccardSql,
    "q_dedup_keep" -> Dedup.keepSql,
    "q_substr_dedup" -> Substr.substrDedupSql,
    "q_dedup_embed" -> Ann.embedDedupSql,
    "q_dedup_embed_mp" -> Ann.embedDedupMpSql,
    "q_ann_adaptive" -> Ann.ivfAdaptiveSql,
    "q_ann_brute" -> Ann.bruteForceSql,
    "q_ann_ivf" -> Ann.ivfSql,
    "q_ann_rerank" -> Ann.annRerankSql,
    "q_ivf_stats" -> Ann.ivfStatsSql,
    "q_bm25" -> Relevance.bm25Sql,
    "q_fertility" -> TextAnalysis.fertilitySql,
    "q_url_canon" -> Urls.urlCanonSql,
    "q_quantiles" -> Analytics.quantilesSql,
    "q_histogram" -> Corpus.histogramSql,
    "q_split" -> Corpus.splitSql,
    "q_domain_mix" -> Corpus.domainMixSql,
    "q_domain_cap" -> Corpus.domainCapSql,
    "q_contamination" -> Corpus.contaminationSql,
    "q_pack" -> Corpus.packSql,
    "q_lang_id" -> TextAnalysis.langIdSql,
    "q_quality" -> TextAnalysis.qualitySql,
    "q_repetition" -> TextAnalysis.repetitionSql,
    "q_filter" -> TextAnalysis.filterMaskSql,
    "q_filter_domain" -> TextAnalysis.filterDomainSql,
    "q_quality_sketch" -> QualitySketch.qualitySketchSql,
    "q_tokens" -> TextAnalysis.tokensSql,
    "q_fingerprint" -> TextAnalysis.fingerprintSql,
    "q_vocab" -> Corpus.vocabSql,
    "q_quality_domain" -> TextAnalysis.qualityDomainSql,
    "q_mix_sample" -> Corpus.mixSampleSql,
    "q_dsir" -> Corpus.dsirSql,
    "q_boilerplate" -> Scrub.boilerplateSql,
    "q_para_dedup" -> Scrub.paraDedupSql,
    "q_pii_scrub" -> Scrub.piiScrubSql,
    "q_vec_quant" -> Quantize.vecQuantSql,
  )
}
