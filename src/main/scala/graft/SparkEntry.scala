package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.Envelope
import graft.sources.{ArrowIpc, Avro, Cbor, Compress, Csv, Docx, Epub, JsonLines, Mime, Pdf, Rtf, Tar, TfExample, TfRecord, Warc, Wiki, Zip, Zstd}
import graft.operators.{Bibtex, Classifier, Crawl, Dedup, Feeds, HtmlTables, Lake, Latex, Markdown, Mojibake, Multimodal, Pipeline, Relational, Retrieval, Scale, Similarity, Sitemap, SqlSurface, Subtitles, Text, Wds}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 has a `queries` entry; those with
  * deterministic SQL-expressible semantics also carry a DuckDB oracle in
  * `oracleSql` (same column names, same arithmetic — money/measure sums go
  * through DECIMAL so partial-agg order can't change results).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q11JoinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_project" -> (Relational.q01Project _),
    "q02_json" -> (Relational.q02JsonExtract _),
    "q03_filter" -> (Relational.q03Filter _),
    "q04_age_sec" -> (Relational.q04AgeSec _),
    "q05_global_agg" -> (Relational.q05GlobalAgg _),
    "q06_keyed_agg" -> (Relational.q06KeyedAgg _),
    "q07_topk" -> (Relational.q07TopK _),
    "q08_mask_email" -> (Relational.q08MaskEmail _),
    "q09_dedup_first" -> (Relational.q09DedupFirst _),
    "q10_join_dims" -> (Relational.q10JoinDims _),
    "q11_join_revenue" -> (Relational.q11JoinRevenue _),
    "q12_anti_join" -> (Relational.q12AntiJoin _),
    "q13_window_rownum" -> (Relational.q13WindowRowNum _),
    "q14_tumbling_window" -> (Relational.q14TumblingWindow _),
    "q15_setops" -> (Relational.q15SetOps _),
    "q16_rollup" -> (Relational.q16Rollup _),
    "q17_text_stats" -> (Text.q17TextStats _),
    "q18_date_trunc" -> (Relational.q18DateTrunc _),
    "q19_cosine_topk" -> (Similarity.q19CosineTopK _),
    "q20_distinct_agg" -> (Text.q20DistinctAgg _),
    "q21_exact_dedup" -> (Dedup.q21ExactDedup _),
    "q22_minhash_bands" -> (Dedup.q22MinHashBands _),
    "q23_simhash" -> (Dedup.q23SimHash _),
    "q24_jaccard_pairs" -> (Dedup.q24JaccardPairs _),
    "q25_embed_top_pairs" -> (Similarity.q25TopPairs _),
    "q26_ann_lsh" -> (Similarity.q26AnnLsh _),
    "q27_lang_id" -> (Text.q27LangId _),
    "q28_quality" -> (Text.q28Quality _),
    "q29_token_count" -> (Text.q29TokenCount _),
    "q30_fingerprint" -> (Text.q30Fingerprint _),
    "q31_approx_distinct" -> (Dedup.q31ApproxDistinct _),
    "q32_envelope" -> (Envelope.q32Envelope _),
    "q33_binary_meta" -> (Multimodal.q33BinaryMeta _),
    "q34_sql_views" -> (SqlSurface.q34SqlViews _),
    "q35_lsh_pairs" -> (Dedup.q35LshPairs _),
    "q36_ann_ivf" -> (Similarity.q36AnnIvf _),
    "q37_dedup_clusters" -> (Dedup.q37DedupClusters _),
    "q38_session_window" -> (Relational.q38SessionWindow _),
    "q39_png_meta" -> (Multimodal.q39PngMeta _),
    "q40_embed_neardup" -> (Dedup.q40EmbedNearDup _),
    "q41_tfidf_top_terms" -> (Text.q41TfIdfTopTerms _),
    "q42_quota_sample" -> (Text.q42QuotaSample _),
    "q43_pack_bins" -> (Text.q43PackBins _),
    "q44_embed_neardup_full" -> (Dedup.q44EmbedNearDupFull _),
    "q45_decontaminate" -> (Text.q45Decontaminate _),
    "q46_pii_scrub" -> (Text.q46PiiScrub _),
    "q47_rep_ngrams" -> (Text.q47RepNgrams _),
    "q48_token_percentiles" -> (Text.q48TokenPercentiles _),
    "q49_asof_last_view" -> (Relational.q49AsOfLastView _),
    "q50_pack_assemble" -> (Text.q50PackAssemble _),
    "q51_corpus_pipeline" -> (Pipeline.q51CorpusPipeline _),
    "q52_join_revenue_bucketed" -> (Scale.q52JoinRevenueBucketed _),
    "q53_ann_quantized" -> (Similarity.q53AnnQuantized _),
    "q54_split" -> (Text.q54Split _),
    "q55_skewed_hot_key" -> (Scale.q55SkewedHotKey _),
    "q56_av_meta" -> (Multimodal.q56AvMeta _),
    "q57_frame_sample" -> (Multimodal.q57FrameSample _),
    "q58_media_manifest" -> (Multimodal.q58MediaManifest _),
    "q59_bmp_pixels" -> (Multimodal.q59BmpPixels _),
    "q60_y4m_frames" -> (Multimodal.q60Y4mFrames _),
    "q61_bmp_resample" -> (Multimodal.q61BmpResample _),
    "q62_wav_pcm" -> (Multimodal.q62WavPcm _),
    "q63_bloom_decontaminate" -> (Text.q63BloomDecontaminate _),
    "q64_unigram_surprisal" -> (Text.q64UnigramSurprisal _),
    "q65_rule_filter" -> (Text.q65RuleFilter _),
    // q66 is spec-gated (CorpusOpsSpec properties + kernel parity): the
    // deflate length is JVM-zlib-deterministic, not a cross-engine
    // constant — no DuckDB oracle by design
    "q66_compress_ratio" -> (Text.q66CompressRatio _),
    "q67_line_dedup" -> (Text.q67LineDedup _),
    "q68_url_blocklist" -> (Text.q68UrlBlocklist _),
    "q69_interval_join" -> (Relational.q69IntervalJoin _),
    "q70_substring_dedup" -> (Dedup.q70SubstringDedup _),
    "q71_web_preclean" -> (Text.q71WebPreclean _),
    "q72_top_boilerplate" -> (Text.q72TopBoilerplate _),
    "q73_ann_pq" -> (Similarity.q73AnnPq _),
    "q74_incremental_dedup" -> (Dedup.q74IncrementalDedup _),
    "q75_mixture_weights" -> (Text.q75MixtureWeights _),
    "q76_jsonl_ingest" -> (JsonLines.q76JsonlIngest _),
    "q77_repetition_chars" -> (Text.q77RepetitionChars _),
    "q78_split_matrix" -> (Text.q78SplitMatrix _),
    "q79_semdedup" -> (Dedup.q79SemDedup _),
    "q80_shard_assign" -> (Scale.q80ShardAssign _),
    "q81_bigram_surprisal" -> (Text.q81BigramSurprisal _),
    "q82_warc_ingest" -> (Warc.q82WarcIngest _),
    "q83_bm25_topk" -> (Retrieval.q83Bm25TopK _),
    "q84_mixture_sample" -> (Text.q84MixtureSample _),
    "q85_bpe_train" -> ((s: SparkSession, d: String) => operators.Bpe.q85BpeTrain(s, d)),
    "q86_bpe_tokens" -> ((s: SparkSession, d: String) => operators.Bpe.q86BpeTokens(s, d)),
    "q87_chunk_docs" -> (Text.q87ChunkDocs _),
    "q88_adaptive_quality" -> (Text.q88AdaptiveQuality _),
    "q89_shard_append" -> (Scale.q89ShardAppend _),
    "q90_mp4_frames" -> (Multimodal.q90Mp4Frames _),
    "q91_url_canonicalize" -> (Text.q91UrlCanonicalize _),
    "q92_pii_checksum" -> (Text.q92PiiChecksum _),
    "q93_html_extract" -> (Crawl.q93HtmlExtract _),
    "q94_link_frontier" -> (Crawl.q94LinkFrontier _),
    "q95_gzip_members" -> (Crawl.q95GzipMembers _),
    "q96_link_rank" -> (Crawl.q96LinkRank _),
    "q97_crawl_intake" -> (Crawl.q97CrawlIntake _),
    "q98_robots_gate" -> (Crawl.q98RobotsGate _),
    "q99_http_envelope" -> (Crawl.q99HttpEnvelope _),
    "q100_semantic_decon" -> (Similarity.q100SemanticDecon _),
    "q101_image_dedup" -> (Multimodal.q101ImageDedup _),
    "q102_image_neardup" -> (Multimodal.q102ImageNearDup _),
    "q103_sitemap_ingest" -> (Crawl.q103SitemapIngest _),
    "q104_column_profile" -> (Relational.q104ColumnProfile _),
    "q105_crawl_diff" -> (Crawl.q105CrawlDiff _),
    "q106_content_blocks" -> (Crawl.q106ContentBlocks _),
    "q107_fetch_schedule" -> (Crawl.q107FetchSchedule _),
    "q108_warc_roundtrip" -> (Warc.q108WarcRoundtrip _),
    "q109_unicode_normalize" -> (Text.q109UnicodeNormalize _),
    "q110_line_langid" -> (Text.q110LineLangId _),
    "q111_regional_revenue" -> (Relational.q111RegionalRevenue _),
    "q112_robots_parse" -> (Crawl.q112RobotsParse _),
    "q113_recrawl_policy" -> (Crawl.q113RecrawlPolicy _),
    "q114_charset_decode" -> (Crawl.q114CharsetDecode _),
    "q115_chunked_decode" -> (Crawl.q115ChunkedDecode _),
    "q116_fullstack_intake" -> (Crawl.q116FullStackIntake _),
    "q117_charset_sniff" -> (Crawl.q117CharsetSniff _),
    "q118_jpeg_pixels" -> (Multimodal.q118JpegPixels _),
    "q119_funnel" -> (Relational.q119Funnel _),
    "q120_cohorts" -> (Relational.q120Cohorts _),
    "q121_png_pixels" -> (Multimodal.q121PngPixels _),
    "q122_quality_classifier" -> (Classifier.q122QualityClassifier _),
    "q123_byte_bpe" -> ((s: SparkSession, d: String) => operators.Bpe.q123ByteBpe(s, d)),
    "q124_gif_pixels" -> (Multimodal.q124GifPixels _),
    "q125_pdf_extract" -> (Pdf.q125PdfExtract _),
    "q126_utf16_intake" -> (Crawl.q126Utf16Intake _),
    "q127_image_intake" -> (Multimodal.q127ImageIntake _),
    "q128_html_unescape" -> (Text.q128HtmlUnescape _),
    "q129_tiff_meta" -> (Multimodal.q129TiffMeta _),
    "q130_mp3_meta" -> (Multimodal.q130Mp3Meta _),
    "q131_exif_intake" -> (Multimodal.q131ExifIntake _),
    "q132_zip_extract" -> (Zip.q132ZipExtract _),
    "q133_docx_extract" -> (Docx.q133DocxExtract _),
    "q134_csv_ingest" -> (Csv.q134CsvIngest _),
    "q135_webp_pixels" -> (Multimodal.q135WebpPixels _),
    "q136_tar_extract" -> (Tar.q136TarExtract _),
    "q137_mime_extract" -> (Mime.q137MimeExtract _),
    "q138_subtitle_extract" -> (Subtitles.q138SubtitleExtract _),
    "q139_flac_meta" -> (Multimodal.q139FlacMeta _),
    "q140_markdown_extract" -> (Markdown.q140MarkdownExtract _),
    "q141_feed_ingest" -> (Feeds.q141FeedIngest _),
    "q142_epub_extract" -> (Epub.q142EpubExtract _),
    "q143_mojibake_repair" -> (Mojibake.q143MojibakeRepair _),
    "q144_latex_extract" -> (Latex.q144LatexExtract _),
    "q145_bibtex_parse" -> (Bibtex.q145BibtexParse _),
    "q146_sitemap_parse" -> (Sitemap.q146SitemapParse _),
    "q147_html_tables" -> (HtmlTables.q147HtmlTables _),
    "q148_para_dedup" -> (Dedup.q148ParaDedup _),
    "q149_ogg_meta" -> (Multimodal.q149OggMeta _),
    "q150_trigram_backoff" -> (Text.q150TrigramBackoff _),
    "q151_anchor_text" -> (Crawl.q151AnchorText _),
    "q152_avi_meta" -> (Multimodal.q152AviMeta _),
    "q153_json_shape" -> (Relational.q153JsonShape _),
    "q154_page_verdict" -> (Crawl.q154PageVerdict _),
    "q155_rtf_extract" -> (Rtf.q155RtfExtract _),
    "q156_postings_build" -> (Retrieval.q156PostingsBuild _),
    "q157_sentence_split" -> (Text.q157SentenceSplit _),
    "q158_id3_tags" -> (Multimodal.q158Id3Tags _),
    "q159_svg_meta" -> (Multimodal.q159SvgMeta _),
    "q160_tfrecord_ingest" -> (TfRecord.q160TfrecordIngest _),
    "q161_tfexample_decode" -> (TfExample.q161TfExampleDecode _),
    "q162_ebml_meta" -> (Multimodal.q162EbmlMeta _),
    "q163_wds_samples" -> (Wds.q163WdsSamples _),
    "q164_avro_ingest" -> (Avro.q164AvroIngest _),
    "q165_zstd_triage" -> (Zstd.q165ZstdTriage _),
    "q166_parquet_footer" -> (Lake.q166ParquetFooter _),
    "q167_idn_hosts" -> (Crawl.q167IdnHosts _),
    "q168_datauri_harvest" -> (Multimodal.q168DataUriHarvest _),
    "q169_script_mix" -> (Text.q169ScriptMix _),
    "q170_fuzzy_title_dedup" -> (Dedup.q170FuzzyTitleDedup _),
    "q171_g711_audio" -> (Multimodal.q171G711Audio _),
    "q172_pnm_pixels" -> (Multimodal.q172PnmPixels _),
    "q173_deltalog_replay" -> (Lake.q173DeltaLogReplay _),
    "q174_media_shards" -> (Wds.q174MediaShards _),
    "q175_cbor_decode" -> (Cbor.q175CborDecode _),
    "q176_ico_meta" -> (Multimodal.q176IcoMeta _),
    "q177_readability" -> (Text.q177Readability _),
    "q178_host_graph" -> (Crawl.q178HostGraph _),
    "q179_cache_freshness" -> (Crawl.q179CacheFreshness _),
    "q180_sketch_distinct" -> (Dedup.q180SketchDistinct _),
    "q181_exists_wait" -> (Relational.q181ExistsWait _),
    "q182_card_scan" -> (Text.q182CardScan _),
    "q183_mad_outliers" -> (Relational.q183MadOutliers _),
    "q184_compress_router" -> (Compress.q184CompressRouter _),
    "q185_arrow_ipc" -> (ArrowIpc.q185ArrowIpcTriage _),
    "q186_orc_footer" -> (Lake.q186OrcFooter _),
    "q187_lake_census" -> (Lake.q187LakeCensus _),
    "q188_zstd_decode" -> (Zstd.q188ZstdDecode _),
    "q189_zstd_intake" -> (Crawl.q189ZstdIntake _),
    "q190_lz4_decode" -> (Compress.q190Lz4Decode _),
    "q191_bzip2_decode" -> (Compress.q191Bzip2Decode _),
    "q192_xz_decode" -> (Compress.q192XzDecode _),
    "q193_universal_decode" -> (Compress.q193UniversalDecode _),
    "q194_wiki_dump" -> (Wiki.q194WikiDump _),
    "q195_tarball_intake" -> (Tar.q195TarballIntake _),
    "q196_vp8_pixels" -> (Multimodal.q196Vp8Pixels _),
    "q197_tiff_pixels" -> (Multimodal.q197TiffPixels _),
  )

  /** DuckDB-dialect oracles. Omitted on purpose (weaker rows-only check):
    * q26_ann_lsh (approximate by construction — recall >= 0.8 gated in
    * AnnRecallSpec against the brute-force top-k),
    * q31_approx_distinct (HLL estimate — 5% tolerance vs q20 exact in
    * ApproxDistinctSpec),
    * q180_sketch_distinct (Datasketches HLL — estimates are
    * sketch-deterministic, not cross-engine constants; 5% gates + the
    * union≡direct merge property in SketchMergeSpec),
    * q53_ann_quantized (int8-quantized ANN — recall gated in AnnRecallSpec
    * against both the brute-force and the exact-rerank top-k),
    * q73_ann_pq (PQ-ADC ANN — recall gated in AnnRecallSpec; resident
    * ratio measured in AnnScaleSpec),
    * q79_semdedup (Lloyd means are floating-point averages, the q36
    * caveat — representative rule, group containment and pruning gated
    * in SemDedupSpec).
    * (q85/q86 were on this list through round 10; the fixed merge count
    * lets the training loop unroll into chained CTEs — see [[bpeCtes]] —
    * so both now carry full DuckDB oracles on top of BpeSpec's gates.)
    */
  def oracleSql: Map[String, String] = Map(
    "q01_project" ->
      "SELECT event_id, event_type, value FROM events",
    "q02_json" ->
      "SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",
    "q03_filter" ->
      "SELECT event_id, value FROM events WHERE event_type = 'purchase' AND value > 100",
    "q04_age_sec" ->
      ("SELECT event_id, CASE WHEN ts IS NOT NULL THEN " +
        "date_diff('second', ts, TIMESTAMP '2024-02-01 00:00:00') END AS age_sec FROM events"),
    "q05_global_agg" ->
      ("SELECT round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)/count(*), 6) AS avg_value, " +
        "min(value) AS min_value, max(value) AS max_value, count(*) AS cnt FROM events " +
        "WHERE ts >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 31 DAY " +
        "AND ts <= TIMESTAMP '2024-02-01 00:00:00'"),
    "q06_keyed_agg" ->
      ("SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type"),
    "q07_topk" ->
      ("SELECT event_id, event_type, date_trunc('second', ts) AS ts FROM events " +
        "ORDER BY date_trunc('second', ts) DESC, event_id DESC LIMIT 20"),
    "q08_mask_email" ->
      ("WITH e AS (SELECT c_custkey, lower(replace(c_name, ' ', '.')) || '@example.com' AS email " +
        "FROM customer) SELECT c_custkey, CASE WHEN email IS NULL THEN NULL " +
        "WHEN strpos(email, '@') = 0 THEN '***' " +
        "ELSE substr(email, 1, 1) || '***' || substr(email, strpos(email, '@')) END AS masked FROM e"),
    "q09_dedup_first" ->
      "SELECT user_id, event_type, min(event_id) AS event_id FROM events GROUP BY user_id, event_type",
    "q10_join_dims" ->
      ("SELECT r_name, n_name, count(*) AS customers FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name"),
    "q11_join_revenue" ->
      ("SELECT o_orderpriority, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"),
    "q12_anti_join" ->
      ("SELECT c_custkey FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    "q13_window_rownum" ->
      ("SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) " +
        "WHERE rn = 1"),
    "q14_tumbling_window" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type, " +
        "count(*) AS cnt FROM events GROUP BY 1, 2"),
    "q15_setops" ->
      ("WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'), " +
        "er AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error') " +
        "SELECT 'except' AS op, user_id FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM er) " +
        "UNION ALL SELECT 'union' AS op, user_id FROM (SELECT user_id FROM p UNION SELECT user_id FROM er)"),
    "q16_rollup" ->
      ("SELECT r_name, n_name, count(*) AS cnt FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP(r_name, n_name)"),
    "q17_text_stats" ->
      ("SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "max(length(text)) AS max_len FROM documents GROUP BY lang"),
    "q18_date_trunc" ->
      ("SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, count(*) AS cnt " +
        "FROM events GROUP BY 1"),
    "q19_cosine_topk" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0) " +
        "SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS sim FROM e, q " +
        "ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10"),
    "q20_distinct_agg" ->
      "SELECT count(*) AS total, count(DISTINCT text) AS distinct_texts FROM documents",
    "q21_exact_dedup" ->
      ("SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_count " +
        "FROM documents GROUP BY md5(text)"),
    "q22_minhash_bands" -> Oracles.minHashBands,
    "q23_simhash" -> Oracles.simHash,
    "q24_jaccard_pairs" -> Oracles.jaccardPairs,
    "q25_embed_top_pairs" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200) " +
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS sim " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "ORDER BY list_cosine_similarity(a.v, b.v) DESC, vec_a ASC, vec_b ASC LIMIT 20"),
    "q27_lang_id" -> Oracles.langId,
    "q28_quality" -> Oracles.quality,
    "q29_token_count" ->
      ("SELECT doc_id, len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), " +
        "x -> x <> '')) AS n_ws_tokens, " +
        "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens " +
        "FROM documents"),
    "q30_fingerprint" ->
      "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM documents",
    "q32_envelope" ->
      ("SELECT 'W' || c_custkey AS id, " +
        "CASE WHEN c_custkey % 2 = 0 THEN '10.1/' || c_custkey END AS doi, " +
        "c_name AS title, CAST(1990 + c_nationkey AS INTEGER) AS publication_year, " +
        "c_mktsegment AS host_venue, c_name AS primary_author, " +
        "lower(c_name) || '@ex.com' AS email, " +
        "TIMESTAMP '2024-02-01 00:00:00' AS event_ts, " +
        "TIMESTAMP '2024-02-01 00:00:00' AS ingest_ts, " +
        "'openalex' AS source, 'L' || c_custkey AS load_id FROM customer"),
    "q33_binary_meta" ->
      ("SELECT doc_id, md5(text) AS fp, octet_length(encode(text)) AS n_bytes, " +
        "CASE WHEN substr(text, 1, 1) = '{' THEN 'json' " +
        "WHEN substr(text, 1, 1) = '<' THEN 'markup' ELSE 'raw' END AS container " +
        "FROM documents"),
    "q34_sql_views" ->
      ("SELECT event_type, count(*) AS cnt, " +
        "round(avg(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k, " +
        "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value " +
        "FROM events WHERE ts <= TIMESTAMP '2024-02-01 00:00:00' GROUP BY event_type"),
    "q35_lsh_pairs" -> Oracles.lshPairs,
    "q37_dedup_clusters" -> Oracles.dedupClusters,
    "q40_embed_neardup" -> Oracles.embedNearDup,
    "q38_session_window" ->
      ("WITH o AS (SELECT user_id, ts, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o) " +
        "SELECT user_id, CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start, " +
        "count(*) AS cnt FROM s GROUP BY user_id, sid"),
    // q39: Spark synthesizes byte-exact PNG/JPEG headers from doc_id and
    // parses them back; the oracle recomputes the expected struct from the
    // same residue arithmetic — independent of the byte path, so an
    // offset/endianness bug on the Spark side cannot cancel out.
    "q39_png_meta" ->
      ("SELECT doc_id, " +
        "CASE WHEN doc_id % 7 IN (0, 1, 2) THEN NULL " +
        "ELSE CAST(doc_id % 1920 + 1 AS INTEGER) END AS width, " +
        "CASE WHEN doc_id % 7 IN (0, 1, 2) THEN NULL " +
        "ELSE CAST(doc_id % 1080 + 1 AS INTEGER) END AS height, " +
        "CASE WHEN doc_id % 7 IN (0, 3) THEN 'jpeg' WHEN doc_id % 7 = 1 THEN 'unknown' " +
        "WHEN doc_id % 7 = 4 THEN 'gif' WHEN doc_id % 7 = 5 THEN 'webp' " +
        "ELSE 'png' END AS format FROM documents"),
    "q41_tfidf_top_terms" -> Oracles.tfIdfTopTerms,
    "q42_quota_sample" ->
      ("SELECT doc_id, lang FROM documents WHERE " +
        "CASE WHEN lang = 'en' " +
        "THEN substr(md5('q42|' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000' " +
        "ELSE substr(md5('q42|' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' END"),
    "q43_pack_bins" ->
      ("WITH t AS (SELECT doc_id, source, CAST(len(list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) AS BIGINT) " +
        "AS n_tokens FROM documents), " +
        "o AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS off FROM t) " +
        // off is a windowed sum(BIGINT) → DuckDB HUGEINT; cast back so the
        // driver's Arrow materialization doesn't render it as float64.
        "SELECT doc_id, source, n_tokens, CAST(off % 512 AS BIGINT) AS bin_offset, " +
        "CAST(floor(off / 512) AS BIGINT) AS bin FROM o"),
    "q44_embed_neardup_full" -> Oracles.embedNearDupFull,
    "q45_decontaminate" -> Oracles.decontaminate,
    "q46_pii_scrub" -> Oracles.piiScrub,
    "q47_rep_ngrams" -> Oracles.repNgrams,
    "q48_token_percentiles" -> Oracles.tokenPercentiles,
    "q49_asof_last_view" -> Oracles.asOfLastView,
    "q50_pack_assemble" -> Oracles.packAssemble,
    "q51_corpus_pipeline" -> Oracles.corpusPipeline,
    "q54_split" ->
      ("SELECT doc_id, source, CASE " +
        "WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train' " +
        "WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val' " +
        "ELSE 'test' END AS split FROM documents"),
    // the bucketed twin computes EXACTLY q11's result — same oracle; only
    // the physical layout (and therefore the plan's exchange count) differs
    "q52_join_revenue_bucketed" ->
      ("SELECT o_orderpriority, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"),
    // the salted two-phase plan computes EXACTLY the plain GROUP BY — the
    // skew handling is physical (partial agg keyed by (hot_key, _salt)),
    // so the oracle is the one-phase formulation
    "q55_skewed_hot_key" ->
      ("SELECT CASE WHEN event_id % 2 = 0 THEN 'hot' " +
        "ELSE 'k' || CAST(event_id % 97 AS VARCHAR) END AS hot_key, " +
        "count(*) AS cnt, " +
        "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total " +
        "FROM events GROUP BY 1"),
    // q56: Spark synthesizes byte-exact WAV/MP4 headers from doc_id and
    // parses them back (the MP4 box walk behind a variable-size free box);
    // the oracle recomputes every field from the same residue arithmetic —
    // independent of the byte path, so an offset/endianness slip cannot
    // cancel out (the q39 pattern).
    "q56_av_meta" ->
      ("SELECT doc_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'wav' WHEN doc_id % 3 = 1 THEN 'mp4' " +
        "ELSE 'unknown' END AS format, " +
        "CASE WHEN doc_id % 3 = 0 THEN CAST(8000 + (doc_id % 8) * 4000 AS INTEGER) END AS sample_rate, " +
        "CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 2 + 1 AS INTEGER) END AS channels, " +
        "CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 2 + 1) * 8 AS INTEGER) END AS bits, " +
        "CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 1920 + 1 AS INTEGER) END AS width, " +
        "CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 1080 + 1 AS INTEGER) END AS height " +
        "FROM documents"),
    // q57: evenly-strided bounded frame sampling (stride = ceil(n/8));
    // the deterministic frame fingerprint stands in for the stubbed pixel
    // decode, which is exactly what makes the sampling oracle-checkable
    "q57_frame_sample" ->
      ("SELECT doc_id, CAST(doc_id % 240 + 1 AS INTEGER) AS n_frames, " +
        "CAST(f AS INTEGER) AS frame_idx, " +
        "CAST(floor(f * 1000 / 30) AS BIGINT) AS ts_ms, " +
        "md5(CAST(doc_id AS VARCHAR) || '|' || CAST(f AS VARCHAR)) AS frame_fp " +
        "FROM documents, UNNEST(range(0, doc_id % 240 + 1, " +
        "CAST(ceil((doc_id % 240 + 1) / 8.0) AS BIGINT))) AS t(f)"),
    // q58: the composed manifest over a five-container synthesized corpus;
    // every column recomputed from the residue arithmetic (dims, WAV
    // parameters, the resizeDims plan mirrored as round-half-up over the
    // same double expression, per-pixel BMP luma, the q57 stride plan)
    "q58_media_manifest" ->
      ("WITH base AS (SELECT doc_id, doc_id % 6 AS cls, " +
        "CAST(doc_id % 1920 + 1 AS INTEGER) AS iw, " +
        "CAST(doc_id % 1080 + 1 AS INTEGER) AS ih, " +
        "CAST(doc_id % 7 + 1 AS INTEGER) AS bw, " +
        "CAST(doc_id % 5 + 1 AS INTEGER) AS bh, " +
        "CAST((doc_id % 4 + 1) * 2 AS INTEGER) AS yw, " +
        "CAST((doc_id % 3 + 1) * 2 AS INTEGER) AS yh, " +
        "CAST(doc_id % 12 + 1 AS INTEGER) AS yn, " +
        "CAST(doc_id % 240 + 1 AS INTEGER) AS nf FROM documents), " +
        "lum AS (SELECT b.doc_id, " +
        "sum((299 * ((b.doc_id*2 + x + r*11) % 256) + " +
        "587 * ((b.doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((b.doc_id + x*7 + r*13) % 256)) // 1000) AS s, " +
        "min((299 * ((b.doc_id*2 + x + r*11) % 256) + " +
        "587 * ((b.doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((b.doc_id + x*7 + r*13) % 256)) // 1000) AS mn, " +
        "max((299 * ((b.doc_id*2 + x + r*11) % 256) + " +
        "587 * ((b.doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((b.doc_id + x*7 + r*13) % 256)) // 1000) AS mx, " +
        "count(*) AS n FROM base b, " +
        "UNNEST(range(0, CAST(b.bw AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(b.bh AS BIGINT))) AS tr(r) " +
        "WHERE b.cls = 4 GROUP BY b.doc_id), " +
        // PCM sample replay (q62's encodings) for the wav class
        "pcm AS (SELECT b.doc_id, sum(CASE WHEN b.doc_id % 4 = 0 THEN " +
        "CASE WHEN (b.doc_id*5 + i*13) % 65536 < 32768 " +
        "THEN (b.doc_id*5 + i*13) % 65536 ELSE 65536 - (b.doc_id*5 + i*13) % 65536 END " +
        "ELSE abs((b.doc_id*7 + i*11) % 256 - 128) END) AS sa, " +
        "max(CASE WHEN b.doc_id % 4 = 0 THEN " +
        "CASE WHEN (b.doc_id*5 + i*13) % 65536 < 32768 " +
        "THEN (b.doc_id*5 + i*13) % 65536 ELSE 65536 - (b.doc_id*5 + i*13) % 65536 END " +
        "ELSE abs((b.doc_id*7 + i*11) % 256 - 128) END) AS pk " +
        "FROM base b, UNNEST(range(0, CAST(b.doc_id % 50 + 1 AS BIGINT))) AS ti(i) " +
        "WHERE b.cls = 2 GROUP BY b.doc_id) " +
        "SELECT b.doc_id AS media_id, " +
        "CASE b.cls WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' " +
        "WHEN 3 THEN 'mp4' WHEN 4 THEN 'bmp' ELSE 'y4m' END AS media_type, " +
        "CASE WHEN b.cls IN (0,1,3) THEN b.iw WHEN b.cls = 4 THEN b.bw " +
        "WHEN b.cls = 5 THEN b.yw END AS width, " +
        "CASE WHEN b.cls IN (0,1,3) THEN b.ih WHEN b.cls = 4 THEN b.bh " +
        "WHEN b.cls = 5 THEN b.yh END AS height, " +
        "CASE WHEN b.cls = 2 THEN 8000 END AS sample_rate, " +
        "CASE WHEN b.cls = 2 THEN 1 END AS channels, " +
        "CASE WHEN b.cls = 2 THEN CASE WHEN b.doc_id % 4 = 0 THEN 16 ELSE 8 END END AS bits, " +
        "CASE WHEN b.cls IN (0,1,3) THEN CASE WHEN greatest(b.iw, b.ih) <= 256 THEN b.iw " +
        "ELSE CAST(round(b.iw * (256.0 / greatest(b.iw, b.ih))) AS INTEGER) END " +
        "WHEN b.cls = 4 THEN b.bw WHEN b.cls = 5 THEN b.yw END AS target_width, " +
        "CASE WHEN b.cls IN (0,1,3) THEN CASE WHEN greatest(b.iw, b.ih) <= 256 THEN b.ih " +
        "ELSE CAST(round(b.ih * (256.0 / greatest(b.iw, b.ih))) AS INTEGER) END " +
        "WHEN b.cls = 4 THEN b.bh WHEN b.cls = 5 THEN b.yh END AS target_height, " +
        "CASE WHEN b.cls = 4 THEN CAST(l.mn AS INTEGER) END AS min_luma, " +
        "CASE WHEN b.cls = 4 THEN CAST(l.mx AS INTEGER) END AS max_luma, " +
        "CASE WHEN b.cls = 4 THEN CAST(l.s * 100 // l.n AS BIGINT) END AS mean_luma_x100, " +
        "CASE WHEN b.cls = 2 THEN CAST(p.pk AS INTEGER) END AS peak_abs, " +
        "CASE WHEN b.cls = 2 THEN CAST(p.sa AS BIGINT) END AS sum_abs, " +
        "CASE WHEN b.cls = 3 THEN array_to_string(range(0, CAST(b.nf AS BIGINT), " +
        "CAST(ceil(b.nf / 8.0) AS BIGINT)), ',') " +
        // the y4m plan strides over the frame count PARSED from the bytes
        "WHEN b.cls = 5 THEN array_to_string(range(0, CAST(b.yn AS BIGINT), " +
        "CAST(ceil(b.yn / 8.0) AS BIGINT)), ',') END AS frame_plan " +
        "FROM base b LEFT JOIN lum l ON b.doc_id = l.doc_id " +
        "LEFT JOIN pcm p ON b.doc_id = p.doc_id"),
    // q59: REAL pixel decode — luma statistics recomputed pixel-by-pixel
    // from the synthesis residue maps (Rec.601 integer luma, floor
    // division), so a padding/stride/channel-order/truncation slip on the
    // Spark kernel side cannot cancel out
    "q59_bmp_pixels" ->
      ("WITH lum AS (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 7 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 5 + 1 AS BIGINT))) AS tr(r)), " +
        "agg AS (SELECT doc_id, sum(luma) AS s, min(luma) AS mn, " +
        "max(luma) AS mx, count(*) AS n FROM lum GROUP BY doc_id) " +
        "SELECT d.doc_id, " +
        "CASE WHEN d.doc_id % 4 IN (0,1,2) THEN 'bmp' ELSE 'unknown' END AS format, " +
        "CASE WHEN d.doc_id % 4 IN (0,1,2) THEN CAST(d.doc_id % 7 + 1 AS INTEGER) END AS width, " +
        "CASE WHEN d.doc_id % 4 IN (0,1,2) THEN CAST(d.doc_id % 5 + 1 AS INTEGER) END AS height, " +
        "CASE WHEN d.doc_id % 4 IN (0,1) THEN CAST(a.mn AS INTEGER) END AS min_luma, " +
        "CASE WHEN d.doc_id % 4 IN (0,1) THEN CAST(a.mx AS INTEGER) END AS max_luma, " +
        "CASE WHEN d.doc_id % 4 IN (0,1) THEN CAST(a.s * 100 // a.n AS BIGINT) END AS mean_luma_x100 " +
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"),
    // q60: per-frame VIDEO pixel decode — every sampled frame's luma
    // statistics recomputed pixel-by-pixel from the Y4M synthesis residues
    // (text-class docs emit no frame rows; a video sampler emits nothing
    // for non-video bytes)
    "q60_y4m_frames" ->
      ("WITH v AS (SELECT doc_id, " +
        "CAST((doc_id % 4 + 1) * 2 AS INTEGER) AS w, " +
        "CAST((doc_id % 3 + 1) * 2 AS INTEGER) AS h, " +
        "CAST(doc_id % 12 + 1 AS INTEGER) AS n " +
        "FROM documents WHERE doc_id % 3 IN (0, 1)), " +
        "f AS (SELECT v.*, CAST(k AS INTEGER) AS frame_idx FROM v, " +
        "UNNEST(range(0, CAST(n AS BIGINT), CAST(ceil(n / 4.0) AS BIGINT))) AS tk(k)), " +
        "px AS (SELECT f.doc_id, f.frame_idx, f.w, f.h, f.n, " +
        "(f.doc_id + i * 3 + f.frame_idx * 7) % 256 AS y FROM f, " +
        "UNNEST(range(0, CAST(f.w * f.h AS BIGINT))) AS ti(i)), " +
        "agg AS (SELECT doc_id, frame_idx, any_value(w) AS w, any_value(h) AS h, " +
        "any_value(n) AS n, sum(y) AS s, min(y) AS mn, max(y) AS mx, count(*) AS c " +
        "FROM px GROUP BY 1, 2) " +
        "SELECT doc_id, w AS width, h AS height, n AS n_frames, frame_idx, " +
        "CAST(mn AS INTEGER) AS min_luma, CAST(mx AS INTEGER) AS max_luma, " +
        "CAST(s * 100 // c AS BIGINT) AS mean_luma_x100 FROM agg"),
    // q61: the EXECUTED resize — target dims via the resizeDims rounding,
    // then every output pixel replayed through the floor source-mapping
    // (sx = x'*w//tw; top-down class reads file row sy, bottom-up h-1-sy)
    "q61_bmp_resample" ->
      ("WITH b AS (SELECT doc_id, doc_id % 4 AS cls, " +
        "CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 7 + 1 AS INTEGER) " +
        "ELSE CAST(doc_id % 12 + 9 AS INTEGER) END AS w, " +
        "CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 5 + 1 AS INTEGER) " +
        "ELSE CAST(doc_id % 10 + 9 AS INTEGER) END AS h " +
        "FROM documents WHERE doc_id % 4 IN (0, 1, 2)), " +
        "d AS (SELECT *, " +
        "CASE WHEN greatest(w, h) <= 8 THEN w " +
        "ELSE CAST(round(w * (8.0 / greatest(w, h))) AS INTEGER) END AS tw, " +
        "CASE WHEN greatest(w, h) <= 8 THEN h " +
        "ELSE CAST(round(h * (8.0 / greatest(w, h))) AS INTEGER) END AS th FROM b), " +
        "px AS (SELECT d.doc_id, x * d.w // d.tw AS sx, " +
        "CASE WHEN d.cls = 2 THEN y * d.h // d.th " +
        "ELSE d.h - 1 - (y * d.h // d.th) END AS r FROM d, " +
        "UNNEST(range(0, CAST(d.tw AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(d.th AS BIGINT))) AS ty(y)), " +
        "lum AS (SELECT doc_id, " +
        "sum((299 * ((doc_id*2 + sx + r*11) % 256) + " +
        "587 * ((doc_id*3 + sx*5 + r) % 256) + " +
        "114 * ((doc_id + sx*7 + r*13) % 256)) // 1000) AS s, " +
        "min((299 * ((doc_id*2 + sx + r*11) % 256) + " +
        "587 * ((doc_id*3 + sx*5 + r) % 256) + " +
        "114 * ((doc_id + sx*7 + r*13) % 256)) // 1000) AS mn, " +
        "max((299 * ((doc_id*2 + sx + r*11) % 256) + " +
        "587 * ((doc_id*3 + sx*5 + r) % 256) + " +
        "114 * ((doc_id + sx*7 + r*13) % 256)) // 1000) AS mx, " +
        "count(*) AS c FROM px GROUP BY doc_id) " +
        "SELECT doc.doc_id, " +
        "CASE WHEN doc.doc_id % 4 IN (0,1,2) THEN 'bmp' ELSE 'unknown' END AS format, " +
        "d.tw AS width, d.th AS height, " +
        "CAST(l.mn AS INTEGER) AS min_luma, CAST(l.mx AS INTEGER) AS max_luma, " +
        "CAST(l.s * 100 // l.c AS BIGINT) AS mean_luma_x100 " +
        "FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id " +
        "LEFT JOIN lum l ON doc.doc_id = l.doc_id"),
    // q62: REAL audio decode — every PCM sample's magnitude replayed from
    // the residue encodings (16-bit: unsigned encoding u decodes to
    // |s| = u when u < 32768 else 65536-u, incl. the -32768 edge; 8-bit:
    // |u - 128|); truncated data keeps fmt metadata with NULL stats
    "q62_wav_pcm" ->
      ("WITH s AS (SELECT doc_id, doc_id % 4 AS cls, " +
        "CAST(doc_id % 50 + 1 AS INTEGER) AS n FROM documents), " +
        "samp AS (SELECT s.doc_id, CASE WHEN s.cls = 0 THEN " +
        "CASE WHEN (s.doc_id*5 + i*13) % 65536 < 32768 " +
        "THEN (s.doc_id*5 + i*13) % 65536 " +
        "ELSE 65536 - (s.doc_id*5 + i*13) % 65536 END " +
        "ELSE abs((s.doc_id*7 + i*11) % 256 - 128) END AS a " +
        "FROM s, UNNEST(range(0, CAST(s.n AS BIGINT))) AS ti(i) " +
        "WHERE s.cls IN (0, 1)), " +
        "agg AS (SELECT doc_id, sum(a) AS sa, max(a) AS pk " +
        "FROM samp GROUP BY doc_id) " +
        "SELECT s.doc_id, " +
        "CASE WHEN s.cls IN (0,1,2) THEN 'wav' ELSE 'unknown' END AS format, " +
        "CASE WHEN s.cls IN (0,1,2) THEN 8000 END AS sample_rate, " +
        "CASE WHEN s.cls IN (0,1,2) THEN 1 END AS channels, " +
        "CASE WHEN s.cls = 0 THEN 16 WHEN s.cls IN (1,2) THEN 8 END AS bits, " +
        "CASE WHEN s.cls IN (0,1) THEN CAST(a.pk AS INTEGER) END AS peak_abs, " +
        "CASE WHEN s.cls IN (0,1) THEN CAST(a.sa AS BIGINT) END AS sum_abs " +
        "FROM s LEFT JOIN agg a USING (doc_id)"),
    // q63 computes EXACTLY q45's result — the bloom sketch is a prefilter
    // whose false positives the exact confirm join kills, so the two
    // queries share one oracle; only the physical plan (broadcast vs
    // sketch-probe + shuffled confirm) differs
    "q63_bloom_decontaminate" -> Oracles.decontaminate,
    // q64: the oracle replays the unigram model end-to-end — same
    // tokenizer CTE as q45's, per-token surprisal rounded to 6 dp and
    // summed through DECIMAL so both engines fold the identical exact
    // values in any order
    "q64_unigram_surprisal" ->
      ("WITH toks AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) AS tok " +
        "FROM documents), " +
        "vocab AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok), " +
        "n AS (SELECT sum(tf) AS n_total FROM vocab), " +
        "sc AS (SELECT t.doc_id, CAST(round(-ln(CAST(v.tf AS DOUBLE) / " +
        "n.n_total), 6) AS DECIMAL(18,6)) AS s " +
        "FROM toks t JOIN vocab v USING (tok), n), " +
        "agg AS (SELECT doc_id, count(*) AS n_tokens, sum(s) AS sum_s " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "CASE WHEN a.n_tokens > 0 THEN " +
        "CAST((2 * CAST(a.sum_s * 1000000 AS BIGINT) + a.n_tokens) " +
        "// (2 * a.n_tokens) AS DOUBLE) / 1e6 END AS mean_surprisal " +
        "FROM documents d LEFT JOIN agg a USING (doc_id)"),
    // q65: every rule replayed — thresholds compare the ROUNDED ratios in
    // both engines so the keep decision cannot drift on a boundary
    "q65_rule_filter" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "m AS (SELECT doc_id, " +
        "CAST(coalesce(len(ws), 0) AS BIGINT) AS n_words, " +
        "CASE WHEN len(ws) > 0 THEN round(CAST(len(array_to_string(ws, '')) " +
        "AS DOUBLE) / len(ws), 6) END AS mean_word_len, " +
        "CASE WHEN len(ws) > 0 THEN round(CAST(len(list_filter(ws, " +
        "w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(ws), 6) END " +
        "AS alpha_frac, " +
        "CAST(coalesce(len(list_filter(ws, w -> w IN ('the','be','to','of'," +
        "'and','a','in','that','have','i'))), 0) AS BIGINT) AS stop_hits " +
        "FROM t), " +
        "r AS (SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits, " +
        "CAST(n_words >= 40 AND n_words <= 100000 AS INTEGER) AS r_len, " +
        "CAST(coalesce(mean_word_len >= 3.0 AND mean_word_len <= 4.6, " +
        "false) AS INTEGER) AS r_wlen, " +
        "CAST(coalesce(alpha_frac >= 0.8, false) AS INTEGER) AS r_alpha, " +
        "CAST(stop_hits >= 2 AS INTEGER) AS r_stop FROM m) " +
        "SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits, " +
        "r_len, r_wlen, r_alpha, r_stop, " +
        "CAST(r_len = 1 AND r_wlen = 1 AND r_alpha = 1 AND r_stop = 1 " +
        "AS INTEGER) AS keep FROM r"),
    // q67: the oracle re-synthesizes the identical multi-line rendering
    // (header/8-word body wrap/footer), replays the df >= 3 rule on raw
    // line text, and reassembles with an ORDER BY pos string_agg —
    // string_agg's NULL-skipping matches the kept-filter, and an
    // all-removed doc yields NULL in both engines
    "q67_line_dedup" ->
      ("WITH ws AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "ln AS (SELECT doc_id, list_concat(list_concat(" +
        "['boilerplate header variant ' || CAST(doc_id % 7 AS VARCHAR)], " +
        "list_transform(range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' '))), " +
        "['all rights reserved variant ' || CAST(doc_id % 5 AS VARCHAR)]) " +
        "AS lines FROM ws), " +
        "l AS (SELECT doc_id, generate_subscripts(lines, 1) AS pos, " +
        "unnest(lines) AS line FROM ln), " +
        "d AS (SELECT line FROM l GROUP BY line " +
        "HAVING count(DISTINCT doc_id) >= 3), " +
        "k AS (SELECT l.doc_id, l.pos, l.line, d.line IS NULL AS kept " +
        "FROM l LEFT JOIN d USING (line)) " +
        "SELECT doc_id, count(*) AS n_lines, " +
        "CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_removed, " +
        "round(CAST(sum(CASE WHEN NOT kept THEN len(line) ELSE 0 END) " +
        "AS DOUBLE) / sum(len(line)), 6) AS removed_char_frac, " +
        "string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY pos) " +
        "AS cleaned_text FROM k GROUP BY doc_id"),
    // q68: the oracle re-synthesizes the URL, re-parses the host with the
    // same regex, and replays the public-suffix rule with 1-based list
    // arithmetic; the blocklist is inlined as an IN list (the Spark side's
    // broadcast join, flattened)
    "q68_url_blocklist" ->
      ("WITH u AS (SELECT doc_id, 'https://' || " +
        "(['example.com','docs.example.com','spam-mill.biz'," +
        "'cdn.spam-mill.biz','news.site.co.uk','tracker.adnet.io'," +
        "'blog.example.com','shop.example.org','adnet.io','papers.ac.uk'])" +
        "[CAST(doc_id % 10 AS INTEGER) + 1] || " +
        "CASE WHEN doc_id % 3 = 0 THEN ':8443' ELSE '' END || " +
        "'/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents), " +
        "h AS (SELECT doc_id, url, " +
        "regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host FROM u), " +
        "r AS (SELECT doc_id, url, host, string_split(host, '.') AS ls " +
        "FROM h), " +
        "g AS (SELECT doc_id, url, host, " +
        "CASE WHEN ls[len(ls)-1] || '.' || ls[len(ls)] IN ('co.uk','ac.uk') " +
        "THEN ls[len(ls)-2] || '.' || ls[len(ls)-1] || '.' || ls[len(ls)] " +
        "ELSE ls[len(ls)-1] || '.' || ls[len(ls)] END AS registered_domain " +
        "FROM r) " +
        "SELECT doc_id, url, host, registered_domain, " +
        "CASE WHEN registered_domain IN " +
        "('spam-mill.biz','adnet.io','site.co.uk') THEN 1 ELSE 0 END " +
        "AS blocked FROM g"),
    // q69: the interval join replayed as a plain inequality join; the
    // corpus has no sub-microsecond residues, so the µs-truncated Spark
    // timestamps and DuckDB's compare identically on the boundary
    "q69_interval_join" ->
      ("SELECT p.event_id AS purchase_id, v.event_id AS view_id, " +
        "p.user_id AS user_id, " +
        "date_trunc('second', p.ts) AS purchase_ts, " +
        "date_trunc('second', v.ts) AS view_ts " +
        "FROM events p JOIN events v ON v.user_id = p.user_id " +
        "AND v.ts >= p.ts - INTERVAL 60 MINUTE AND v.ts < p.ts " +
        "WHERE p.event_type = 'purchase' AND v.event_type = 'view'"),
    // q70: the oracle replays the whole excision relationally — dup
    // 8-gram spans via IN, coverage via NOT EXISTS, reassembly via an
    // ORDER BY string_agg; NULL cleaned_text for a fully-excised doc in
    // both engines
    "q70_substring_dedup" ->
      ("WITH ws AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "inst AS (SELECT doc_id, ws, " +
        "unnest(range(greatest(len(ws) - 7, 0))) AS start FROM ws), " +
        "sh AS (SELECT doc_id, start, " +
        "array_to_string(list_slice(ws, start + 1, start + 8), ' ') AS sh " +
        "FROM inst), " +
        "dup AS (SELECT doc_id, start FROM sh WHERE sh IN " +
        "(SELECT sh FROM sh GROUP BY sh HAVING count(*) >= 2)), " +
        "tok AS (SELECT doc_id, ws, unnest(range(len(ws))) AS p FROM ws), " +
        "keep AS (SELECT t.doc_id, t.p, t.ws[t.p + 1] AS w FROM tok t " +
        "WHERE NOT EXISTS (SELECT 1 FROM dup d WHERE d.doc_id = t.doc_id " +
        "AND d.start <= t.p AND t.p <= d.start + 7)), " +
        "ka AS (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(w, ' ' ORDER BY p) AS cleaned_text FROM keep " +
        "GROUP BY doc_id) " +
        "SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens, " +
        "CAST(len(w.ws) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed, " +
        "CASE WHEN len(w.ws) > 0 THEN round(CAST(len(w.ws) - " +
        "coalesce(k.n_kept, 0) AS DOUBLE) / len(w.ws), 6) END " +
        "AS removed_frac, k.cleaned_text " +
        "FROM ws w LEFT JOIN ka k USING (doc_id)"),
    // q71: the q68 -> q67 -> q65 CTE fragments chained in intake order —
    // blocklist filter first, line-df scoped to the SURVIVOR frame, rule
    // bits re-judged on the cleaned text (NULL-text degenerates fold to
    // n_words 0 / keep 0 in both engines)
    "q71_web_preclean" ->
      ("WITH u AS (SELECT doc_id, text, 'https://' || " +
        "(['example.com','docs.example.com','spam-mill.biz'," +
        "'cdn.spam-mill.biz','news.site.co.uk','tracker.adnet.io'," +
        "'blog.example.com','shop.example.org','adnet.io','papers.ac.uk'])" +
        "[CAST(doc_id % 10 AS INTEGER) + 1] || " +
        "CASE WHEN doc_id % 3 = 0 THEN ':8443' ELSE '' END || " +
        "'/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents), " +
        "h AS (SELECT doc_id, text, " +
        "regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host FROM u), " +
        "r0 AS (SELECT doc_id, text, string_split(host, '.') AS ls FROM h), " +
        "g AS (SELECT doc_id, text, " +
        "CASE WHEN ls[len(ls)-1] || '.' || ls[len(ls)] IN ('co.uk','ac.uk') " +
        "THEN ls[len(ls)-2] || '.' || ls[len(ls)-1] || '.' || ls[len(ls)] " +
        "ELSE ls[len(ls)-1] || '.' || ls[len(ls)] END AS registered_domain " +
        "FROM r0), " +
        "s AS (SELECT * FROM g WHERE registered_domain NOT IN " +
        "('spam-mill.biz','adnet.io','site.co.uk')), " +
        "ws0 AS (SELECT doc_id, registered_domain, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM s), " +
        "ln AS (SELECT doc_id, registered_domain, list_concat(list_concat(" +
        "['boilerplate header variant ' || CAST(doc_id % 7 AS VARCHAR)], " +
        "list_transform(range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' '))), " +
        "['all rights reserved variant ' || CAST(doc_id % 5 AS VARCHAR)]) " +
        "AS lines FROM ws0), " +
        "l AS (SELECT doc_id, registered_domain, " +
        "generate_subscripts(lines, 1) AS pos, unnest(lines) AS line " +
        "FROM ln), " +
        "d AS (SELECT line FROM l GROUP BY line " +
        "HAVING count(DISTINCT doc_id) >= 3), " +
        "k AS (SELECT l.doc_id, l.registered_domain, l.pos, l.line, " +
        "d.line IS NULL AS kept FROM l LEFT JOIN d USING (line)), " +
        "agg AS (SELECT doc_id, registered_domain, count(*) AS n_lines, " +
        "CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_removed, " +
        "round(CAST(sum(CASE WHEN NOT kept THEN len(line) ELSE 0 END) " +
        "AS DOUBLE) / sum(len(line)), 6) AS removed_char_frac, " +
        "string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY pos) " +
        "AS cleaned_text FROM k GROUP BY doc_id, registered_domain), " +
        "t AS (SELECT agg.*, list_filter(string_split_regex(" +
        "lower(cleaned_text), '[^a-z0-9]+'), w -> w <> '') AS cws FROM agg), " +
        "m AS (SELECT doc_id, registered_domain, n_lines, n_removed, " +
        "removed_char_frac, cleaned_text, " +
        "CAST(coalesce(len(cws), 0) AS BIGINT) AS n_words, " +
        "CASE WHEN len(cws) > 0 THEN round(CAST(len(array_to_string(cws, " +
        "'')) AS DOUBLE) / len(cws), 6) END AS mean_word_len, " +
        "CASE WHEN len(cws) > 0 THEN round(CAST(len(list_filter(cws, " +
        "w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(cws), 6) END " +
        "AS alpha_frac, " +
        "CAST(coalesce(len(list_filter(cws, w -> w IN ('the','be','to'," +
        "'of','and','a','in','that','have','i'))), 0) AS BIGINT) " +
        "AS stop_hits FROM t), " +
        "rr AS (SELECT m.*, " +
        "CAST(n_words >= 40 AND n_words <= 100000 AS INTEGER) AS r_len, " +
        "CAST(coalesce(mean_word_len >= 3.0 AND mean_word_len <= 4.6, " +
        "false) AS INTEGER) AS r_wlen, " +
        "CAST(coalesce(alpha_frac >= 0.8, false) AS INTEGER) AS r_alpha, " +
        "CAST(stop_hits >= 2 AS INTEGER) AS r_stop FROM m) " +
        "SELECT doc_id, registered_domain, n_lines, n_removed, " +
        "removed_char_frac, cleaned_text, n_words, mean_word_len, " +
        "alpha_frac, stop_hits, r_len, r_wlen, r_alpha, r_stop, " +
        "CAST(r_len = 1 AND r_wlen = 1 AND r_alpha = 1 AND r_stop = 1 " +
        "AS INTEGER) AS keep FROM rr"),
    // q72: q67's line CTEs, df >= 3, total (df DESC, line ASC) order,
    // LIMIT 20
    "q72_top_boilerplate" ->
      ("WITH ws AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "ln AS (SELECT doc_id, list_concat(list_concat(" +
        "['boilerplate header variant ' || CAST(doc_id % 7 AS VARCHAR)], " +
        "list_transform(range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' '))), " +
        "['all rights reserved variant ' || CAST(doc_id % 5 AS VARCHAR)]) " +
        "AS lines FROM ws), " +
        "l AS (SELECT doc_id, unnest(lines) AS line FROM ln) " +
        "SELECT line, count(DISTINCT doc_id) AS line_df FROM l " +
        "GROUP BY line HAVING count(DISTINCT doc_id) >= 3 " +
        "ORDER BY line_df DESC, line ASC LIMIT 20"),
    // q74: delta-vs-history dedup; band scheme from the shared q22/q35
    // CTE builders, instantiated per frame
    "q74_incremental_dedup" -> Oracles.incrementalDedup,
    // q75: √share temperature weights; denominator summed through rounded
    // DECIMAL(20,12) so the fold is order-independent (q64's discipline)
    "q75_mixture_weights" ->
      ("WITH t AS (SELECT source, CAST(sum(len(list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> ''))) " +
        "AS BIGINT) AS n_tokens FROM documents GROUP BY source), " +
        "s AS (SELECT source, n_tokens, CAST(n_tokens AS DOUBLE) / " +
        "CAST(sum(n_tokens) OVER () AS DOUBLE) AS share FROM t), " +
        "n AS (SELECT source, n_tokens, share, sqrt(share) / " +
        "CAST(sum(CAST(round(sqrt(share), 12) AS DECIMAL(20,12))) OVER () " +
        "AS DOUBLE) AS wraw FROM s) " +
        "SELECT source, n_tokens, round(share, 6) AS share, " +
        "round(wraw, 6) AS weight, " +
        "CAST(floor(wraw * 1000000) AS BIGINT) AS planned_tokens FROM n"),
    // q76: the JSONL twin must round-trip to exactly the parquet manifest;
    // the NULL-source row is the corrupt-line quarantine group (2 injected)
    "q76_jsonl_ingest" ->
      ("SELECT source, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(count(doc_id) AS BIGINT) AS n_docs, " +
        "CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(length(text)) AS BIGINT) AS chars " +
        "FROM documents GROUP BY source " +
        "UNION ALL SELECT CAST(NULL AS VARCHAR), 2::BIGINT, 0::BIGINT, " +
        "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"),
    // q134: the CSV twin must round-trip to exactly the parquet
    // manifest — the decorated column re-derives the embedded
    // comma/newline/quote drill, so a quote-doubling or multiline slip
    // in either the serializer or the parser fails the hash; the
    // NULL-source row is the corrupt-line quarantine group (2 injected)
    "q134_csv_ingest" ->
      ("SELECT source, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(count(doc_id) AS BIGINT) AS n_docs, " +
        "CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(length(text || ',' || chr(10) || '\"' || lang || '\"')) " +
        "AS BIGINT) AS chars " +
        "FROM documents GROUP BY source " +
        "UNION ALL SELECT CAST(NULL AS VARCHAR), 2::BIGINT, 0::BIGINT, " +
        "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"),
    // q77: Gopher char-level repetition — top-2-gram occurrence coverage
    // over the single-spaced text; dup-5-gram span coverage (q70's rule,
    // within-doc); short docs report NULL
    "q77_repetition_chars" ->
      ("WITH wr AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "ws AS (SELECT doc_id, CASE WHEN doc_id % 10 = 3 AND len(ws) >= 5 " +
        "THEN list_concat(list_concat(ws, ws[1:5]), ws[1:5]) ELSE ws END AS ws " +
        "FROM wr), " +
        "g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i+1])) AS g FROM ws WHERE len(ws) >= 2), " +
        "c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g), " +
        "t2 AS (SELECT doc_id, g, cnt, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY cnt DESC, g ASC) AS rn FROM c2), " +
        "top AS (SELECT doc_id, g AS top2_gram, cnt FROM t2 WHERE rn = 1), " +
        "i5 AS (SELECT doc_id, ws, unnest(range(greatest(len(ws) - 4, 0))) " +
        "AS start FROM ws WHERE len(ws) >= 5), " +
        "s5 AS (SELECT doc_id, start, " +
        "array_to_string(list_slice(ws, start + 1, start + 5), ' ') AS g5 " +
        "FROM i5), " +
        "dupv AS (SELECT doc_id, g5 FROM s5 GROUP BY doc_id, g5 " +
        "HAVING count(*) >= 2), " +
        "dup AS (SELECT s.doc_id, s.start FROM s5 s " +
        "JOIN dupv d ON s.doc_id = d.doc_id AND s.g5 = d.g5), " +
        "tok AS (SELECT doc_id, ws, unnest(range(len(ws))) AS p FROM ws), " +
        "cov AS (SELECT t.doc_id, CAST(sum(len(t.ws[t.p + 1])) AS BIGINT) " +
        "AS cchars FROM tok t WHERE EXISTS (SELECT 1 FROM dup d " +
        "WHERE d.doc_id = t.doc_id AND d.start <= t.p AND t.p <= d.start + 4) " +
        "GROUP BY t.doc_id) " +
        "SELECT w.doc_id, t.top2_gram, " +
        "CASE WHEN len(w.ws) >= 2 THEN round(CAST(t.cnt * len(t.top2_gram) " +
        "AS DOUBLE) / len(array_to_string(w.ws, ' ')), 6) END AS top2_frac, " +
        "CASE WHEN len(w.ws) >= 5 THEN round(CAST(coalesce(c.cchars, 0) " +
        "AS DOUBLE) / (len(array_to_string(w.ws, ' ')) - (len(w.ws) - 1)), 6) " +
        "END AS dup5_frac " +
        "FROM ws w LEFT JOIN top t USING (doc_id) LEFT JOIN cov c USING (doc_id)"),
    // q78: conditional aggregation is the engine-portable spelling of the
    // explicit-values pivot; split derivation mirrors q54's thresholds
    "q78_split_matrix" ->
      ("WITH d AS (SELECT source, CAST(len(list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) " +
        "AS BIGINT) AS nt, " +
        "CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) " +
        "< 'cccccccc' THEN 'train' " +
        "WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) " +
        "< 'e6666666' THEN 'val' ELSE 'test' END AS split FROM documents) " +
        "SELECT source, " +
        "CAST(sum(CASE WHEN split = 'train' THEN nt END) AS BIGINT) AS train, " +
        "CAST(sum(CASE WHEN split = 'val' THEN nt END) AS BIGINT) AS val, " +
        "CAST(sum(CASE WHEN split = 'test' THEN nt END) AS BIGINT) AS test " +
        "FROM d GROUP BY source"),
    // q80: the oracle IS the one-task global row_number the two-phase
    // operator avoids — the bucket-rank + offset algebra must reproduce
    // the single total order bit-for-bit
    "q80_shard_assign" ->
      ("WITH h AS (SELECT doc_id, md5('q80|' || CAST(doc_id AS VARCHAR)) " +
        "AS hk FROM documents), " +
        "r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY hk, doc_id) " +
        "- 1 AS BIGINT) AS g FROM h) " +
        "SELECT doc_id, g AS shuffle_pos, g // 128 AS shard, " +
        "g % 128 AS shard_pos FROM r"),
    // q81: the oracle replays the interpolated bigram model end-to-end —
    // bigrams via index arithmetic over the shared tokenizer CTE, context
    // counts as the conditional denominator, weights as the same 0.7/0.3
    // literals, per-token 6-dp DECIMAL rounding before the doc sum
    "q81_bigram_surprisal" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "toks AS (SELECT doc_id, unnest(ws) AS tok FROM t), " +
        "uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok), " +
        "n AS (SELECT sum(cu) AS n_total FROM uni), " +
        "bg AS (SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur FROM " +
        "(SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i " +
        "FROM t WHERE len(ws) >= 2)), " +
        "bc AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY prev, cur), " +
        "cx AS (SELECT prev, count(*) AS cp FROM bg GROUP BY prev), " +
        "sc AS (SELECT g.doc_id, CAST(round(-ln(" +
        "0.7 * CAST(bc.cb AS DOUBLE) / cx.cp + " +
        "0.3 * CAST(u.cu AS DOUBLE) / n.n_total), 6) AS DECIMAL(18,6)) AS s " +
        "FROM bg g JOIN bc ON bc.prev = g.prev AND bc.cur = g.cur " +
        "JOIN cx ON cx.prev = g.prev JOIN uni u ON u.tok = g.cur, n), " +
        "agg AS (SELECT doc_id, count(*) AS n_scored, sum(s) AS sum_s " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT t.doc_id, CAST(coalesce(len(t.ws), 0) AS BIGINT) AS n_tokens, " +
        "CAST(coalesce(a.n_scored, 0) AS BIGINT) AS n_scored, " +
        // exact-half discipline: the mean is half-up integer arithmetic
        // on micro-units — round(double/n, 6) disagrees across engines
        // when sum_micros/n is a true .5 (doc 484 at sf0.01)
        "CASE WHEN a.n_scored > 0 THEN " +
        "CAST((2 * CAST(a.sum_s * 1000000 AS BIGINT) + a.n_scored) " +
        "// (2 * a.n_scored) AS DOUBLE) / 1e6 END AS mean_surprisal " +
        "FROM t LEFT JOIN agg a USING (doc_id)"),
    // q82: the oracle recomputes every record field from the synthesis
    // RESIDUES — never by parsing the stream — so a kernel walk slip
    // (split-on-separator, case-sensitive names, separator off-by-one)
    // cannot cancel out; the corruption cases map to the residue classes
    "q82_warc_ingest" ->
      ("WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS nr, doc_id % 10 AS r " +
        "FROM documents), " +
        "v AS (SELECT doc_id, nr, r, " +
        "CASE WHEN r = 9 THEN NULL WHEN r = 4 THEN 0 " +
        "WHEN r = 7 THEN nr - 1 ELSE nr END AS nv, " +
        "CASE WHEN r = 9 THEN NULL WHEN r IN (4, 7) THEN 1 ELSE 0 END AS tr " +
        "FROM d), " +
        "rec AS (SELECT doc_id, nv, tr, " +
        "unnest(generate_series(0, nv - 1)) AS j FROM v WHERE nv > 0), " +
        "pay AS (SELECT doc_id, nv, tr, j, " +
        "'A' || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) || " +
        "chr(13) || chr(10) || chr(13) || chr(10) || " +
        "repeat('x', CAST((doc_id * 7 + j * 3) % 40 + 1 AS INT)) AS p " +
        "FROM rec) " +
        "SELECT doc_id, CAST(nv AS BIGINT) AS n_records, " +
        "CAST(tr AS INT) AS truncated, CAST(j AS INT) AS rec_idx, " +
        "CASE WHEN j % 2 = 0 THEN 'response' ELSE 'request' END AS rec_type, " +
        "'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/' || " +
        "CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR) AS uri, " +
        "CAST(len(p) AS BIGINT) AS content_length, md5(p) AS payload_md5 " +
        "FROM pay " +
        "UNION ALL " +
        "SELECT doc_id, CAST(nv AS BIGINT), CAST(tr AS INT), NULL, NULL, " +
        "NULL, NULL, NULL FROM v WHERE nv IS NULL OR nv = 0"),
    // q83: the oracle replays BM25 end-to-end — same tokenizer, same
    // DOUBLE-literal constants (a bare 1.2 would be a DECIMAL literal),
    // same expression order, per-term 6-dp DECIMAL rounding before the
    // per-doc sum, ranking on the exact decimal with doc_id tiebreak
    "q83_bm25_topk" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "dl AS (SELECT doc_id, CAST(coalesce(len(ws), 0) AS BIGINT) AS dl " +
        "FROM t), " +
        "g AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl), " +
        "q(query_id, qtext) AS (VALUES (1, 'merge join'), " +
        "(2, 'slow table scan'), (3, 'fast value'), (4, 'line column'), " +
        "(5, 'zzzunseen merge')), " +
        "qt AS (SELECT query_id, unnest(string_split(qtext, ' ')) AS term " +
        "FROM q), " +
        "toks AS (SELECT doc_id, unnest(ws) AS term FROM t), " +
        "m AS (SELECT doc_id, term FROM toks WHERE term IN " +
        "(SELECT DISTINCT term FROM qt)), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM m " +
        "GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "sc AS (SELECT qt.query_id, tf.doc_id, CAST(round(" +
        "ln((CAST(g.n_docs AS DOUBLE) - df.df + 0.5) / " +
        "(CAST(df.df AS DOUBLE) + 0.5) + 1.0) * " +
        "(CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)) / " +
        "(CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * " +
        "(1.0 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * " +
        "CAST(dl.dl AS DOUBLE) * g.n_docs / g.total_dl)), 6) " +
        "AS DECIMAL(18,6)) AS s " +
        "FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id " +
        "JOIN qt ON qt.term = tf.term, g), " +
        "agg AS (SELECT query_id, doc_id, sum(s) AS sd FROM sc " +
        "GROUP BY query_id, doc_id), " +
        "r AS (SELECT query_id, doc_id, sd, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY sd DESC, doc_id) AS rank FROM agg) " +
        "SELECT query_id, CAST(rank AS INT) AS rank, doc_id, " +
        "CAST(sd AS DOUBLE) AS score FROM r WHERE rank <= 10"),
    // q84: the oracle replays q75's policy CTE verbatim, then the
    // per-source hash-priority draw — all-integer fit test, so the keep
    // verdict is exact on any engine
    "q84_mixture_sample" ->
      ("WITH t0 AS (SELECT doc_id, source, CAST(coalesce(len(list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')), 0) " +
        "AS BIGINT) AS nt FROM documents), " +
        "t AS (SELECT source, sum(nt) AS n_tokens FROM t0 GROUP BY source), " +
        "s AS (SELECT source, CAST(n_tokens AS DOUBLE) / " +
        "CAST(sum(n_tokens) OVER () AS DOUBLE) AS share FROM t), " +
        "n AS (SELECT source, sqrt(share) / " +
        "CAST(sum(CAST(round(sqrt(share), 12) AS DECIMAL(20,12))) OVER () " +
        "AS DOUBLE) AS wraw FROM s), " +
        "pl AS (SELECT source, CAST(floor(wraw * 1000000) AS BIGINT) " +
        "AS planned FROM n), " +
        "o AS (SELECT doc_id, source, nt, coalesce(sum(nt) OVER (" +
        "PARTITION BY source ORDER BY md5('q84|' || CAST(doc_id AS VARCHAR)), " +
        "doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off " +
        "FROM t0) " +
        "SELECT o.doc_id, o.source, o.nt AS n_tokens, " +
        "CAST(o.off AS BIGINT) AS sample_off, " +
        "CASE WHEN o.off + o.nt <= pl.planned THEN 1 ELSE 0 END AS keep " +
        "FROM o JOIN pl USING (source)"),
    // q87: the window layout is integer arithmetic (stride 48, max 64),
    // so the oracle replays it exactly — chunk membership via 1-based
    // inclusive list slicing, text via the same single-space join
    "q87_chunk_docs" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "c AS (SELECT doc_id, ws, len(ws) AS n, CASE WHEN len(ws) > 0 THEN " +
        "1 + (greatest(len(ws) - 64, 0) + 47) // 48 END AS nc FROM t), " +
        "e AS (SELECT doc_id, ws, n, " +
        "unnest(generate_series(0, CAST(nc - 1 AS INT))) AS j " +
        "FROM c WHERE nc >= 1) " +
        "SELECT doc_id, CAST(j AS INT) AS chunk_idx, " +
        "CAST(least(64, n - j * 48) AS BIGINT) AS n_chunk_tokens, " +
        "array_to_string(ws[j * 48 + 1 : least(j * 48 + 64, n)], ' ') " +
        "AS chunk_text FROM e " +
        "UNION ALL SELECT doc_id, NULL, NULL, NULL FROM c WHERE nc IS NULL"),
    // q88: rank-selected per-source p25 floor (percentile_disc by
    // integer rank — interpolated quantiles differ across engines);
    // NULL-scored docs are excluded from the ranked frame (engines
    // disagree on NULL sort position) and report NULL keep
    "q88_adaptive_quality" ->
      ("WITH b AS (SELECT doc_id, source, CASE WHEN text IS NOT NULL THEN " +
        "round(least(1.0, " +
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), " +
        "x -> x <> '')) / 50.0) * 0.5 + least(1.0, " +
        "(CAST(length(replace(text, ' ', '')) AS DOUBLE) / " +
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), " +
        "x -> x <> ''))) / 5.0) * 0.5, 6) END AS quality FROM documents), " +
        "nn AS (SELECT source, quality, row_number() OVER (" +
        "PARTITION BY source ORDER BY quality, doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY source) AS n FROM b " +
        "WHERE quality IS NOT NULL), " +
        "thr AS (SELECT source, quality AS q_floor FROM nn " +
        "WHERE rn = (n + 3) // 4) " +
        "SELECT b.doc_id, b.source, b.quality, t.q_floor, " +
        "CASE WHEN b.quality IS NOT NULL THEN " +
        "CAST(b.quality >= t.q_floor AS INT) END AS keep " +
        "FROM b LEFT JOIN thr t USING (source)"),
    // q89: incoming docs rank among themselves (the one-task global
    // row_number spelling as truth, q80's oracle discipline), offset by
    // the history cardinality — history positions are untouched by
    // construction
    "q89_shard_append" ->
      ("WITH h AS (SELECT count(*) AS hn FROM documents " +
        "WHERE doc_id % 5 < 4), " +
        "i AS (SELECT doc_id, md5('q80|' || CAST(doc_id AS VARCHAR)) AS hk " +
        "FROM documents WHERE doc_id % 5 = 4), " +
        "r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY hk, doc_id) " +
        "- 1 AS BIGINT) AS g FROM i) " +
        "SELECT doc_id, g + hn AS shuffle_pos, (g + hn) // 128 AS shard, " +
        "(g + hn) % 128 AS shard_pos FROM r, h"),
    // q90: MP4 sample-table frame decode — every sampled frame's luma
    // statistics recomputed pixel-by-pixel from the raw-gray synthesis
    // residues (truncated/text classes emit no rows: the meta gate
    // refuses a sample table addressing bytes the stream never carried)
    "q90_mp4_frames" ->
      ("WITH v AS (SELECT doc_id, " +
        "CAST(doc_id % 5 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, " +
        "CAST(doc_id % 12 + 1 AS INTEGER) AS n " +
        "FROM documents WHERE doc_id % 4 IN (0, 1)), " +
        "f AS (SELECT v.*, CAST(k AS INTEGER) AS frame_idx FROM v, " +
        "UNNEST(range(0, CAST(n AS BIGINT), CAST(ceil(n / 4.0) AS BIGINT))) AS tk(k)), " +
        "px AS (SELECT f.doc_id, f.frame_idx, f.w, f.h, f.n, " +
        "(f.doc_id * 2 + i * 5 + f.frame_idx * 7) % 256 AS y FROM f, " +
        "UNNEST(range(0, CAST(f.w * f.h AS BIGINT))) AS ti(i)), " +
        "agg AS (SELECT doc_id, frame_idx, any_value(w) AS w, any_value(h) AS h, " +
        "any_value(n) AS n, sum(y) AS s, min(y) AS mn, max(y) AS mx, count(*) AS c " +
        "FROM px GROUP BY 1, 2) " +
        "SELECT doc_id, w AS width, h AS height, n AS n_frames, frame_idx, " +
        "CAST(mn AS INTEGER) AS min_luma, CAST(mx AS INTEGER) AS max_luma, " +
        "CAST(s * 100 // c AS BIGINT) AS mean_luma_x100 FROM agg"),
    // q91: the oracle replays the messy-URL synthesis AND the
    // canonicalization spec independently (regexp split into parts,
    // lowercase scheme/host, default-port strip, trailing-slash strip,
    // tracking-param filter preserving order, fragment drop), then the
    // same lowest-id-wins dedup — a slip in any rule breaks the
    // canonical key and the group structure with it
    "q91_url_canonicalize" ->
      ("WITH u AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' || " +
        "(CASE doc_id % 3 WHEN 0 THEN 'site' || (doc_id % 40) || '.example.com' " +
        "WHEN 1 THEN 'SITE' || (doc_id % 40) || '.EXAMPLE.COM' " +
        "ELSE 'Site' || (doc_id % 40) || '.Example.Com' END) || " +
        "(CASE doc_id % 4 WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END) || " +
        "'/a/' || (doc_id % 20) || " +
        "(CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) || " +
        "(CASE doc_id % 6 WHEN 1 THEN '?utm_source=feed' " +
        "WHEN 2 THEN '?id=' || (doc_id % 10) " +
        "WHEN 3 THEN '?id=' || (doc_id % 10) || '&utm_campaign=x' " +
        "WHEN 4 THEN '?utm_medium=e&id=' || (doc_id % 10) " +
        "WHEN 5 THEN '?ref=rss' ELSE '' END) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url " +
        "FROM documents), " +
        "uu AS (SELECT doc_id, url, url AS _u FROM u), " +
        canonicalCtes("uu") + " " +
        "SELECT doc_id, url, canonical_url, " +
        "CAST(doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS INTEGER) AS keep, " +
        "CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canonical_url) THEN NULL " +
        "ELSE min(doc_id) OVER (PARTITION BY canonical_url) END AS dup_of FROM c"),
    // q92: the oracle replays synthesis (fixture PANs + twins, grouped
    // spelling via RE2-safe regexp_replace), the candidate scan, the FULL
    // Luhn fold per candidate, the octet range check, and the
    // distinct-literal replacement folds — a slip in scan boundaries,
    // checksum parity, or replacement order cannot cancel out
    "q92_pii_checksum" ->
      ("WITH pans AS (SELECT " +
        s"[${Text.ValidPans.map(p => s"'$p'").mkString(", ")}] AS v, " +
        s"[${Text.InvalidPans.map(p => s"'$p'").mkString(", ")}] AS b), " +
        "t AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 4 = 0 THEN v[CAST(doc_id % 10 AS INTEGER) + 1] " +
        "WHEN doc_id % 4 = 1 THEN rtrim(regexp_replace(v[CAST(doc_id % 10 AS INTEGER) + 1], " +
        "'(\\d{4})', '\\1-', 'g'), '-') " +
        "ELSE b[CAST(doc_id % 10 AS INTEGER) + 1] END AS tok, text " +
        "FROM documents, pans), " +
        "r AS (SELECT doc_id, text || " +
        "(CASE WHEN doc_id % 4 = 3 THEN '' ELSE ' pay ' || tok || " +
        "(CASE WHEN doc_id % 7 = 0 THEN ' again ' || tok ELSE '' END) END) || " +
        "(CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256) || '.' || " +
        "(doc_id % 200) || '.' || (doc_id % 250) " +
        "WHEN doc_id % 5 = 1 THEN ' from 10.999.' || (doc_id % 100) || '.7' " +
        "ELSE '' END) || " +
        "(CASE WHEN doc_id % 6 = 0 THEN ' order 12345678901234567890123' " +
        "ELSE '' END) AS raw FROM t), " +
        "c AS (SELECT doc_id, raw, " +
        "list_filter(regexp_extract_all(raw, '\\b\\d(?:[ -]?\\d){12,18}\\b'), " +
        "cd -> length(replace(replace(cd, '-', ''), ' ', '')) BETWEEN 13 AND 19 " +
        "AND list_sum(list_transform(range(1, length(replace(replace(cd, '-', ''), ' ', '')) + 1), " +
        "i -> CASE WHEN i % 2 = 0 THEN " +
        "CASE WHEN 2 * CAST(substring(reverse(replace(replace(cd, '-', ''), ' ', '')), CAST(i AS INTEGER), 1) AS INTEGER) > 9 " +
        "THEN 2 * CAST(substring(reverse(replace(replace(cd, '-', ''), ' ', '')), CAST(i AS INTEGER), 1) AS INTEGER) - 9 " +
        "ELSE 2 * CAST(substring(reverse(replace(replace(cd, '-', ''), ' ', '')), CAST(i AS INTEGER), 1) AS INTEGER) END " +
        "ELSE CAST(substring(reverse(replace(replace(cd, '-', ''), ' ', '')), CAST(i AS INTEGER), 1) AS INTEGER) END)) % 10 = 0) " +
        "AS cards FROM r), " +
        "s1 AS (SELECT doc_id, len(cards) AS n_cards, " +
        "list_reduce(list_prepend(raw, list_distinct(cards)), " +
        "(acc, x) -> replace(acc, x, '<CARD>')) AS t1 FROM c), " +
        "c2 AS (SELECT doc_id, n_cards, t1, " +
        "list_filter(regexp_extract_all(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'), " +
        "p -> len(list_filter(string_split(p, '.'), o -> CAST(o AS INTEGER) > 255)) = 0) " +
        "AS ips FROM s1) " +
        "SELECT doc_id, CAST(n_cards AS BIGINT) AS n_cards, " +
        "CAST(len(ips) AS BIGINT) AS n_ips, " +
        "list_reduce(list_prepend(t1, list_distinct(ips)), " +
        "(acc, x) -> replace(acc, x, '<IP>')) AS scrubbed FROM c2"),
    // q93: the oracle replays HTML synthesis (residue cases incl. the
    // body <script> string-literal tag trap, the quoted-'>' attribute,
    // the &amp;lt; double-decode trap, the headless %9=5 page) AND the
    // full extraction pipeline with the SAME RE2-safe regexes — script
    // strip before tag strip, quote-aware tag pattern, entity decode
    // AFTER tag strip with &amp; last — so an ordering slip on the Spark
    // side cannot cancel
    "q93_html_extract" ->
      ("WITH " + htmlCtes + " " +
        "SELECT doc_id, CASE WHEN t <> '' THEN t END AS title, " +
        "CAST(wf AS INTEGER) AS well_formed, " +
        "CASE WHEN wf THEN CAST((length(body_raw) - " +
        "length(replace(body_raw, '<a href=\"', ''))) // 9 AS BIGINT) END AS n_links, " +
        "CASE WHEN wf THEN tc END AS text_clean, " +
        "CASE WHEN wf THEN CAST(length(tc) AS BIGINT) END AS n_chars_clean FROM d"),
    // q94: the oracle replays anchor synthesis, href extraction (zipped
    // unnest/generate_subscripts for positions), the skip classes, RFC
    // 3986 resolution, the SHARED canonicalization CTE (canonicalCtes —
    // the same text q91 splices), the seen-set left join, and the
    // first-discoverer window — independently of every Spark operator
    "q94_link_frontier" ->
      ("WITH " + frontierCtes + " " +
        "SELECT doc_id, link_idx, href, resolved_url, canonical_url, " +
        "skip_reason, already_fetched, keep FROM fq"),
    // q95: compressed bytes are JVM-zlib-specific, so the oracle checks
    // round-trip CONTENT (md5/byte-length of what the decoder recovered
    // vs the text's own bytes) and the residue-determined verdicts: the
    // two corruption classes MUST decode NULL, the FNAME header field
    // must read on every class. A decoder that faked payloads, leaked
    // half-inflated output, or required body validity for header fields
    // fails the hash.
    "q95_gzip_members" ->
      ("SELECT doc_id, " +
        "CASE WHEN doc_id % 10 IN (6, 8) THEN 0 ELSE 1 END AS valid, " +
        "CASE WHEN doc_id % 2 = 1 THEN 'doc' || doc_id || '.txt' END AS fname, " +
        "CASE WHEN doc_id % 10 IN (6, 8) THEN NULL " +
        "ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS raw_len, " +
        "CASE WHEN doc_id % 10 IN (6, 8) THEN NULL ELSE md5(text) END AS raw_md5 " +
        "FROM documents"),
    // q96: all-integer pico-unit PageRank unrolls into 5 CTE rounds over
    // the SAME link-graph CTEs q94 splices — the oracle replays graph
    // discovery AND every damped floor-division update independently
    "q96_link_rank" -> linkRankSql,
    // q97: the oracle re-synthesizes the page (the SAME htmlCtes q93
    // splices), replays the extraction, derives the transport verdicts
    // from the residue, and — the composition's teeth — equates
    // payload_md5 to the md5 of the INDEPENDENTLY built page text: the
    // Spark side must carry the exact bytes through gzip decode and the
    // Content-Length slice to match
    "q97_crawl_intake" ->
      ("WITH " + htmlCtes + " " +
        "SELECT doc_id, " +
        "CASE WHEN doc_id % 13 = 9 THEN 0 ELSE 1 END AS fetch_ok, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE " +
        "'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || " +
        "'/page' || doc_id || '.html' END AS uri, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE md5(html) END AS payload_md5, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL " +
        "WHEN t <> '' THEN t END AS title, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE CAST(wf AS INTEGER) END AS well_formed, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE " +
        "CAST((length(body_raw) - length(replace(body_raw, '<a href=\"', ''))) // 9 AS BIGINT) END AS n_links, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE tc END AS text_clean, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE CAST(length(tc) AS BIGINT) END AS n_chars_clean " +
        "FROM d"),
    // q98: the oracle rebuilds the rule table from the same residues,
    // replays group selection (a graftbot group is taken WHOLE, never
    // merged with *), the longest-match winner via an integer
    // 2*len+is_allow key (arg_max), the allow-on-no-match default, and
    // the *-group crawl delay — over the kept frontier from the SHARED
    // frontierCtes
    "q98_robots_gate" ->
      ("WITH " + frontierCtes + ", " + robotsCtes + " " +
        "SELECT canonical_url, host, path, " +
        allowedSql + " AS allowed, " +
        "matched_rule, rule_type, " +
        crawlDelaySql + " AS crawl_delay " +
        "FROM ag"),
    // q107: the oracle replays the WHOLE back half independently — the
    // kept frontier with discoverer positions (frontierCtes), the robots
    // judgment (robotsCtes), the unrolled integer PageRank (linkRankCtes)
    // — then ranks hosts (rank desc, name tiebreak), sequences each
    // host's allowed URLs by discovery position, and multiplies out the
    // integer fetch slots. A scheduler that dropped blocked URLs, let
    // slots count blocked rows, paced by the wrong host's delay, or
    // drifted the host ordering fails the hash.
    "q107_fetch_schedule" ->
      ("WITH " + frontierCtes + ", " + linkRankCtes + ", " + robotsCtes + ", " +
        "pr AS (SELECT host AS rank_host, CAST(r AS BIGINT) AS rank_p5, " +
        "CAST(row_number() OVER (ORDER BY r DESC, host) AS INTEGER) AS host_priority FROM r5), " +
        "g AS (SELECT canonical_url, host, disc_pos, " +
        allowedSql + " AS allowed, " + crawlDelaySql + " AS crawl_delay FROM ag), " +
        "sq AS (SELECT g.*, pr.rank_p5, pr.host_priority, " +
        "CAST(row_number() OVER (PARTITION BY g.host, g.allowed ORDER BY g.disc_pos) - 1 AS INTEGER) AS seq0 " +
        "FROM g LEFT JOIN pr ON g.host = pr.rank_host) " +
        "SELECT canonical_url, host, CAST(disc_pos AS BIGINT) AS disc_pos, " +
        "rank_p5, host_priority, " +
        "CAST(allowed AS INTEGER) AS allowed, crawl_delay, " +
        "CASE WHEN allowed = 1 THEN seq0 END AS fetch_seq, " +
        "CASE WHEN allowed = 1 THEN CAST(coalesce(crawl_delay, 1) AS INTEGER) END AS delay_sec, " +
        "CASE WHEN allowed = 1 THEN CAST(seq0 * coalesce(crawl_delay, 1) AS BIGINT) END AS sched_sec " +
        "FROM sq"),
    // q108: the oracle derives every record field DIRECTLY from residues
    // (q82's stance — it never touches bytes), while the Spark side
    // round-trips for real: write 8-record .warc.gz segments, decode the
    // members, walk the records, slice the payloads. The md5 equates the
    // SLICED bytes to the text's own bytes, so any drift in the
    // serialize→deflate→concat→inflate→walk chain fails the hash; the
    // revisit class must come back with ZERO payload bytes (md5 of the
    // empty string).
    "q108_warc_roundtrip" ->
      ("SELECT CAST(doc_id // 8 AS BIGINT) AS seg_id, " +
        "CAST(count(*) OVER (PARTITION BY doc_id // 8) AS INTEGER) AS n_records, " +
        "CAST(row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id) - 1 AS INTEGER) AS rec_idx, " +
        "CASE WHEN doc_id % 3 = 1 THEN 'revisit' ELSE 'response' END AS rec_type, " +
        "'http://w.example/d/' || doc_id AS uri, " +
        "CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE octet_length(encode(coalesce(text, ''))) END AS BIGINT) AS content_length, " +
        "CASE WHEN doc_id % 3 = 1 THEN md5('') ELSE md5(coalesce(text, '')) END AS payload_md5 " +
        "FROM documents"),
    // q109: the oracle replays synthesis (every planted char an explicit
    // chr() code point), the SAME literal replace chain, and DuckDB's own
    // nfc_normalize — utf8proc vs the JDK Normalizer, two independent
    // Unicode implementations that must agree byte-for-byte
    "q109_unicode_normalize" ->
      ("WITH r AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 5 = 1 THEN ' cafe' || chr(769) ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 2 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm' ELSE '' END || " +
        "CASE WHEN doc_id % 3 = 0 THEN ' zero' || chr(8203) || 'width' || chr(65279) ELSE '' END || " +
        "CASE WHEN doc_id % 7 = 4 THEN ' soft' || chr(173) || 'hyphen' || chr(8204) || chr(8205) ELSE '' END || " +
        "CASE WHEN doc_id % 11 = 6 THEN ' e' || chr(8203) || chr(769) || 'nd' ELSE '' END AS raw " +
        "FROM documents), " +
        "s AS (SELECT doc_id, raw, " +
        "replace(replace(replace(replace(replace(raw, chr(8203), ''), chr(8204), ''), " +
        "chr(8205), ''), chr(65279), ''), chr(173), '') AS st FROM r), " +
        "n AS (SELECT doc_id, raw, st, nfc_normalize(st) AS tn FROM s) " +
        "SELECT doc_id, tn AS text_norm, " +
        "CAST(tn <> raw AS INTEGER) AS changed, " +
        "CAST(length(raw) AS BIGINT) AS n_chars_raw, " +
        "CAST(length(tn) AS BIGINT) AS n_chars_norm, " +
        "CAST(length(raw) - length(st) AS BIGINT) AS n_invisible " +
        "FROM n"),
    // q110: the oracle replays line synthesis, q27's marker scoring per
    // line (same occ/score builders — the two oracles share one
    // spelling), and the dominant aggregate through the integer
    // cnt*8+rank key, so a drifted tie order or a dominant computed
    // over the wrong grain cannot cancel
    "q110_line_langid" -> Oracles.lineLangId,
    // q111: the Q5 shape replayed whole — same exact-decimal fold as q11
    "q111_regional_revenue" ->
      ("SELECT n_name, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name"),
    // q112: the oracle replays file synthesis (concat_ws skips the
    // absent conditional lines on BOTH engines), comment strip, the
    // directive regex, the lag+running-sum group detection, and the
    // UA-join — so a grouping slip (a second stacked User-agent line
    // opening a fresh group, a rule before any group surviving) or a
    // parse slip (trailing comment kept, no-space colon missed, empty
    // Disallow emitted) cannot cancel
    "q112_robots_parse" ->
      ("WITH hs AS (SELECT CAST(range AS INTEGER) AS h FROM range(0, 40)), " +
        "f AS (SELECT h, 'site' || h || '.example.com' AS host, concat_ws(chr(10), " +
        "'# robots.txt for site' || h, " +
        "CASE WHEN h % 2 = 1 THEN 'user-agent: *' ELSE 'User-Agent: *' END, " +
        "CASE WHEN h % 3 = 0 THEN 'Disallow: /r/' END, " +
        "CASE WHEN h % 4 = 1 THEN 'Allow: /r/' || (h % 10) END, " +
        "CASE WHEN h % 5 = 2 THEN 'disallow:/a/' END, " +
        "CASE WHEN h % 5 = 2 THEN 'Allow:   /a/' || (h % 20) || '/sub/' END, " +
        "CASE WHEN h % 2 = 0 THEN 'Disallow: /y/ # legacy area' END, " +
        "CASE WHEN h % 2 = 0 THEN 'Crawl-delay: ' || (h % 5 + 1) END, " +
        "CASE WHEN h % 6 = 0 THEN 'Host: ignored.example' END, " +
        "CASE WHEN h % 9 = 5 THEN 'Disallow:' END, " +
        "'', " +
        "CASE WHEN h % 7 = 3 THEN 'User-agent: graftbot' || chr(10) || 'Disallow: /' || chr(10) END, " +
        "CASE WHEN h % 8 = 7 THEN 'User-agent: extrabot' || chr(10) || 'User-agent: otherbot' || chr(10) || 'Disallow: /z/' || chr(10) END, " +
        "CASE WHEN h % 4 = 2 THEN 'Sitemap: https://site' || h || '.example.com/sitemap.xml' END) AS raw FROM hs), " +
        "lx AS (SELECT host, unnest(string_split(raw, chr(10))) AS l0, " +
        "generate_subscripts(string_split(raw, chr(10)), 1) - 1 AS line_idx FROM f), " +
        "p AS (SELECT host, line_idx, trim(regexp_replace(l0, '#.*', '')) AS l FROM lx), " +
        "d AS (SELECT host, line_idx, " +
        "lower(regexp_extract(l, '^([A-Za-z-]+)\\s*:', 1)) AS directive, " +
        "regexp_replace(regexp_extract(l, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1), '\\s+$', '') AS value FROM p), " +
        "g AS (SELECT *, CASE WHEN directive = 'user-agent' THEN 1 ELSE 0 END AS is_ua FROM d), " +
        "g2 AS (SELECT *, CASE WHEN is_ua = 1 AND " +
        "coalesce(lag(is_ua) OVER (PARTITION BY host ORDER BY line_idx), 0) = 0 " +
        "THEN 1 ELSE 0 END AS new_grp FROM g), " +
        "g3 AS (SELECT *, sum(new_grp) OVER (PARTITION BY host ORDER BY line_idx " +
        "ROWS UNBOUNDED PRECEDING) AS group_id FROM g2), " +
        "u AS (SELECT DISTINCT host AS uh, group_id AS ug, lower(value) AS ua " +
        "FROM g3 WHERE is_ua = 1 AND value <> ''), " +
        "r AS (SELECT host, group_id, " +
        "CASE WHEN directive = 'crawl-delay' THEN 'crawl_delay' ELSE directive END AS rtype, value " +
        "FROM g3 WHERE directive IN ('allow', 'disallow', 'crawl-delay') AND value <> '') " +
        "SELECT r.host, u.ua, r.rtype, r.value, " +
        "CASE WHEN r.rtype = 'crawl_delay' THEN try_cast(r.value AS INTEGER) END AS delay_sec " +
        "FROM r JOIN u ON r.host = u.uh AND r.group_id = u.ug " +
        "UNION ALL " +
        "SELECT host, NULL, 'sitemap', value, NULL FROM g3 " +
        "WHERE directive = 'sitemap' AND value <> ''"),
    // q113: pure residue-derived integer policy — the oracle spells the
    // AIMD halving/doubling, the NULL-safe lastmod compare, the half-
    // interval priority boost and the gone-leaves-schedule rule directly
    "q113_recrawl_policy" ->
      ("WITH s AS (SELECT doc_id, " +
        "CAST(doc_id % 28 + 1 AS INTEGER) AS crawl_age_d, " +
        "CAST(doc_id % 12 + 1 AS INTEGER) AS last_interval_d, " +
        "doc_id % 7 = 1 AS changed_last, " +
        "doc_id % 7 = 4 AS gone, " +
        "CASE WHEN doc_id % 4 <> 3 THEN CAST((doc_id * 3) % 45 AS INTEGER) END AS lastmod_age_d, " +
        "CAST(doc_id % 10 AS INTEGER) AS priority_x10 " +
        "FROM documents), " +
        "n AS (SELECT *, CAST(CASE WHEN changed_last THEN " +
        "greatest(1, last_interval_d // 2) " +
        "ELSE least(60, last_interval_d * 2) END AS INTEGER) AS next_interval_d FROM s), " +
        "r AS (SELECT *, " +
        "coalesce(lastmod_age_d < crawl_age_d, FALSE) AS rm, " +
        "crawl_age_d >= next_interval_d AS rd, " +
        "priority_x10 >= 8 AND crawl_age_d >= greatest(1, next_interval_d // 2) AS rb " +
        "FROM n) " +
        "SELECT doc_id, " +
        "'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || " +
        "'/page' || doc_id || '.html' AS url, " +
        "crawl_age_d, last_interval_d, " +
        "CAST(changed_last AS INTEGER) AS changed_last, " +
        "CAST(gone AS INTEGER) AS gone, lastmod_age_d, priority_x10, " +
        "next_interval_d, " +
        "CASE WHEN NOT gone THEN CAST(rm AS INTEGER) END AS r_modified, " +
        "CASE WHEN NOT gone THEN CAST(rd AS INTEGER) END AS r_due, " +
        "CASE WHEN NOT gone THEN CAST(rb AS INTEGER) END AS r_boost, " +
        "CASE WHEN NOT gone THEN CAST(rm OR rd OR rb AS INTEGER) END AS fetch " +
        "FROM r"),
    // q114: the oracle derives the expected text and counts DIRECTLY
    // from residues — it never decodes a byte (q82's stance) — so the
    // Spark side must walk real UTF-16/Latin-1 payloads to the same
    // md5: a decoder that trusted the lying header over the BOM, kept
    // the BOM character, or fed Latin-1 bytes to a UTF-8 reader fails
    "q114_charset_decode" ->
      ("WITH e AS (SELECT doc_id, coalesce(text, '') AS text, " +
        "coalesce(text, '') || ' caf' || chr(233) || ' ' || chr(252) AS latin, " +
        "coalesce(text, '') || ' ' || chr(8211) || ' d' || chr(233) || 'j' || chr(224) || ' vu' AS wide " +
        "FROM documents), " +
        "x AS (SELECT doc_id, " +
        "CASE doc_id % 5 WHEN 0 THEN 'utf-8-bom' WHEN 1 THEN 'iso-8859-1' " +
        "WHEN 2 THEN 'utf-16le' WHEN 3 THEN 'utf-16be' ELSE 'utf-8' END AS detected, " +
        "CASE doc_id % 5 WHEN 0 THEN wide WHEN 1 THEN latin " +
        "WHEN 2 THEN wide WHEN 3 THEN wide ELSE text END AS expect " +
        "FROM e) " +
        "SELECT doc_id, detected, expect AS text_out, " +
        "CAST(length(expect) AS BIGINT) AS n_chars, " +
        "md5(expect) AS text_md5 FROM x"),
    // q117: the oracle derives detection verdicts AND expected decodes
    // directly from residues via chr() codepoints — it never touches a
    // byte (q82's stance) — so the Spark side must walk real
    // windows-1252 / Shift_JIS / mis-declared payload bytes to the same
    // md5: a sniffer that trusted the utf-8 lie, mistook 1252
    // punctuation for SJIS pairs, or decoded with the wrong table fails
    "q117_charset_sniff" ->
      ("WITH s0 AS (SELECT doc_id, " +
        "regexp_replace(coalesce(text, ''), '^\\x{FEFF}', '') AS text " +
        "FROM documents), " +
        "s AS (SELECT doc_id, text, " +
        "regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS at " +
        "FROM s0), " +
        "x AS (SELECT doc_id, text, at, " +
        "' d' || chr(233) || 'j' || chr(224) || ' vu ' || chr(233) AS u8s, " +
        "' ' || chr(8212) || ' ' || chr(8220) || 'quoted' || chr(8221) || " +
        "' don' || chr(8217) || 't' AS ws, " +
        "' ' || chr(12459) || chr(12479) || chr(12459) || chr(12490) || ' ' || " +
        "chr(26085) || chr(26412) || chr(35486) AS js FROM s), " +
        "y AS (SELECT doc_id, " +
        "CASE doc_id % 7 WHEN 1 THEN 'windows-1252' WHEN 2 THEN 'shift_jis' " +
        "WHEN 3 THEN 'windows-1252' WHEN 4 THEN 'utf-8-bom' " +
        "WHEN 5 THEN 'shift_jis' ELSE 'utf-8' END AS detected, " +
        "CASE doc_id % 7 WHEN 4 THEN 'bom' WHEN 5 THEN 'declared' " +
        "ELSE 'sniffed' END AS method, " +
        "CASE doc_id % 7 WHEN 0 THEN text || u8s WHEN 1 THEN at || ws " +
        "WHEN 2 THEN at || js WHEN 3 THEN at || ws WHEN 4 THEN text || u8s " +
        "WHEN 5 THEN at || js ELSE text END AS expect FROM x) " +
        "SELECT doc_id, detected, method, expect AS text_out, " +
        "CAST(length(expect) AS BIGINT) AS n_chars, " +
        "md5(expect) AS text_md5 FROM y"),
    // q129: the oracle replays the dimension residues and the meta
    // split (magic survives truncation, the IFD value parse refuses) —
    // it never builds a TIFF byte, so an endianness, field-offset, or
    // entry-scan slip cannot cancel
    "q129_tiff_meta" ->
      ("SELECT doc_id, " +
        "CAST(doc_id % 5 <> 4 AS INTEGER) AS is_tiff, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE (doc_id % 7 + 1) * 3 END AS INTEGER) AS width, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE (doc_id % 6 + 1) * 4 END AS INTEGER) AS height " +
        "FROM documents"),
    // q130: the oracle replays the bitrate/sample-rate tables, the CBR
    // arithmetic, and the Xing/VBRI frame-count durations from
    // residues (it never builds a frame byte), so a table row,
    // synchsafe-size, tag-exclusion, or VBR-offset slip cannot cancel
    "q130_mp3_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 7 AS m, " +
        "CASE WHEN doc_id % 7 = 2 THEN 14 WHEN doc_id % 7 = 3 THEN 0 " +
        "ELSE CAST(doc_id % 14 + 1 AS INTEGER) END AS br, " +
        "CASE WHEN doc_id % 7 = 2 THEN 0 " +
        "ELSE CAST(doc_id % 3 AS INTEGER) END AS sri, " +
        "CASE WHEN doc_id % 7 = 2 THEN 2000 " +
        "ELSE CAST(doc_id % 300 + 500 AS BIGINT) END AS junk, " +
        "CASE WHEN doc_id % 7 = 5 THEN doc_id % 900 + 600 " +
        "WHEN doc_id % 7 = 6 THEN doc_id % 700 + 400 END AS frames " +
        "FROM documents), " +
        "k AS (SELECT doc_id, m, junk, frames, " +
        "CASE br WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56 " +
        "WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112 " +
        "WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224 " +
        "WHEN 13 THEN 256 WHEN 14 THEN 320 ELSE 0 END AS kbps, " +
        "CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr " +
        "FROM p) " +
        "SELECT doc_id, " +
        "CAST(m NOT IN (3, 4) AS INTEGER) AS ok, " +
        "CAST(CASE WHEN m IN (3, 4) THEN NULL ELSE kbps END AS INTEGER) " +
        "AS bitrate_kbps, " +
        "CAST(CASE WHEN m IN (3, 4) THEN NULL ELSE sr END AS INTEGER) " +
        "AS sample_rate, " +
        "CAST(CASE WHEN m IN (3, 4) THEN NULL WHEN m IN (5, 6) THEN 1 " +
        "ELSE 0 END AS INTEGER) AS vbr_header, " +
        "CAST(CASE WHEN m IN (3, 4) THEN NULL " +
        "WHEN m IN (5, 6) THEN least(frames * 1152 * 1000 // sr, 1048575) " +
        "ELSE least(((junk + 4) * 8) // kbps, 1048575) END AS BIGINT) " +
        "AS duration_ms FROM k"),
    // q131: the oracle replays the UPRIGHT picture's aHash straight from
    // the residue formula (cell (gx,gy) samples upright block
    // (gx*bwu)//8, (gy*bhu)//8 — it never sees the stored, rotated
    // raster), so the Spark side must parse the tag from APP1 bytes and
    // invert the display transform over real decoded pixels to match;
    // the %9==6 camera / %9==7 baked pair share a sid, so a
    // normalization slip splits their hashes and fails BOTH rows
    "q131_exif_intake" ->
      ("WITH g AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 9 = 7 THEN doc_id - 1 ELSE doc_id END AS sid " +
        "FROM documents), " +
        "p AS (SELECT doc_id, sid, sid % 3 + 2 AS bwu, sid % 2 + 6 AS bhu, " +
        "CASE WHEN doc_id % 9 = 6 THEN doc_id % 7 + 2 " +
        "WHEN doc_id % 9 = 7 THEN CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END " +
        "ELSE doc_id % 8 + 1 END AS orient FROM g), " +
        "cell AS (SELECT doc_id, gy, gx, " +
        "((sid * 31 + (((gy * bhu) // 8) * bwu + (gx * bwu) // 8) * 17) % 251) " +
        "- 125 + 128 AS l " +
        "FROM p, UNNEST(range(0, 8)) AS ty(gy), UNNEST(range(0, 8)) AS tx(gx) " +
        "WHERE doc_id % 9 <> 3), " +
        AhashPackCtes + " " +
        "SELECT p.doc_id, " +
        "CASE WHEN p.doc_id % 9 = 6 THEN 'camera' " +
        "WHEN p.doc_id % 9 = 7 THEN 'baked' " +
        "WHEN p.doc_id % 9 = 3 THEN 'truncated' ELSE 'plain' END AS cls, " +
        "CAST(orient AS INTEGER) AS orientation, " +
        "CAST(8 * bwu AS INTEGER) AS width, " +
        "CAST(8 * bhu AS INTEGER) AS height, " +
        "hh.ahash AS nhash " +
        "FROM p LEFT JOIN hh ON p.doc_id = hh.doc_id"),
    // q132: compressed bytes are zlib-specific (q95's stance), so the
    // oracle checks recovered CONTENT — every member's md5 and the
    // central directory's size accounting re-derived from the corpus
    // text alone. The bad-CRC class proves verification is PER MEMBER
    // (one NULL among siblings), the truncation class that the whole
    // walk refuses without an EOCD
    "q132_zip_extract" ->
      ("WITH m AS (SELECT doc_id, text, " +
        "octet_length(encode(text)) AS o, " +
        "'doc ' || doc_id || ' has ' || octet_length(encode(text)) || " +
        "' chars' AS meta FROM documents) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 8 NOT IN (6, 7) AS INTEGER) AS valid, " +
        "CAST(CASE WHEN doc_id % 8 IN (6, 7) THEN NULL ELSE 3 END " +
        "AS INTEGER) AS n_members, " +
        "CASE WHEN doc_id % 8 IN (6, 7) THEN NULL " +
        "ELSE 'doc' || doc_id || '_0.txt' END AS fname0, " +
        "CASE WHEN doc_id % 8 IN (6, 7) THEN NULL ELSE md5(text) END " +
        "AS md5_stored, " +
        "CASE WHEN doc_id % 8 IN (3, 6, 7) THEN NULL " +
        "ELSE md5(text || chr(10) || text) END AS md5_pair, " +
        "CASE WHEN doc_id % 8 IN (6, 7) THEN NULL ELSE md5(meta) END " +
        "AS md5_meta, " +
        "CAST(CASE WHEN doc_id % 8 IN (6, 7) THEN NULL " +
        "ELSE 3 * o + 1 + length(meta) END AS BIGINT) AS n_bytes " +
        "FROM m"),
    // q136: q132's content stance on the other container — member md5s,
    // the PREFIX-JOINED long path, and the size accounting replay from
    // corpus text alone; the bad-checksum class proves verification is
    // per member AND that the accounting excludes the refusal
    "q136_tar_extract" ->
      ("WITH m AS (SELECT doc_id, text, " +
        "octet_length(encode(text)) AS o, " +
        "'doc ' || doc_id || ' has ' || octet_length(encode(text)) || " +
        "' bytes' AS meta FROM documents) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 NOT IN (3, 4) AS INTEGER) AS valid, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE 3 END " +
        "AS INTEGER) AS n_members, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE " +
        "'very/long/packaged/dataset/path/segment/that/overflows/the/" +
        "hundred/byte/name/field/for/doc' || doc_id || '/meta.txt' END " +
        "AS long_name, " +
        "CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL ELSE md5(text) END " +
        "AS md5_text, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE md5(meta) END " +
        "AS md5_meta, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 = 2 THEN length(meta) " +
        "ELSE o + length(meta) END AS BIGINT) AS n_bytes " +
        "FROM m"),
    // q137: the decode stack (QP/base64/2047/multipart) must round the
    // corpus text through untouched — the oracle replays subjects,
    // decoded-body/attachment md5s, and byte accounting from the text
    // alone (q95's stance); classes 4/5 are the whole-refusal rows
    "q137_mime_extract" ->
      ("WITH m AS (SELECT doc_id, text, " +
        "octet_length(encode(text)) AS o, " +
        "'doc ' || doc_id || ' has ' || octet_length(encode(text)) || " +
        "' chars' AS meta FROM documents) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 6 NOT IN (4, 5) AS INTEGER) AS ok, " +
        "CAST(CASE WHEN doc_id % 6 IN (4, 5) THEN NULL " +
        "WHEN doc_id % 6 IN (1, 3) THEN 2 ELSE 1 END AS INTEGER) AS n_parts, " +
        "CASE WHEN doc_id % 6 IN (4, 5) THEN NULL " +
        "WHEN doc_id % 6 = 1 THEN 'doc ' || doc_id || ' ' || chr(8212) || ' digest' " +
        "WHEN doc_id % 6 = 3 THEN 'doc ' || doc_id || ' folded digest' " +
        "ELSE 'doc ' || doc_id || ' digest' END AS subject, " +
        "CASE WHEN doc_id % 6 IN (4, 5) THEN NULL ELSE md5(text) END AS body_md5, " +
        "CASE WHEN doc_id % 6 IN (1, 3) THEN md5(meta) ELSE NULL END AS att_md5, " +
        "CAST(CASE WHEN doc_id % 6 IN (4, 5) THEN NULL ELSE o END AS BIGINT) " +
        "AS n_body_bytes FROM m"),
    // q138: cue grouping, duration arithmetic, the last cue's ABSOLUTE
    // end (place-value pin: a swapped H/M/S field survives a duration
    // sum but not this), and the joined text all replay from corpus
    // words alone; class 2 drops exactly the corrupted cue #2
    "q138_subtitle_extract" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "c AS (SELECT doc_id, ws, " +
        "CAST(ceil(len(ws) / 6.0) AS INTEGER) AS nc, " +
        "(doc_id % 7) * 111 + CASE WHEN doc_id % 5 = 1 THEN 0 " +
        "ELSE (doc_id % 2) * 3725999 END AS base FROM w), " +
        "g AS (SELECT doc_id, nc, base, " +
        "CASE WHEN doc_id % 5 = 1 THEN list_transform(range(nc), i -> " +
        "CASE WHEN len(list_slice(ws, i*6 + 1, i*6 + 6)) > 3 THEN " +
        "array_to_string(list_slice(ws, i*6 + 1, i*6 + 3), ' ') || chr(10) || " +
        "array_to_string(list_slice(ws, i*6 + 4, i*6 + 6), ' ') " +
        "ELSE array_to_string(list_slice(ws, i*6 + 1, i*6 + 6), ' ') END) " +
        "ELSE list_transform(range(nc), i -> " +
        "array_to_string(list_slice(ws, i*6 + 1, i*6 + 6), ' ')) END AS cues " +
        "FROM c), " +
        "k AS (SELECT doc_id, nc, " +
        "CASE WHEN doc_id % 5 = 2 THEN " +
        "list_concat(list_slice(cues, 1, 1), list_slice(cues, 3, nc)) " +
        "ELSE cues END AS kept, " +
        "CASE WHEN doc_id % 5 = 2 AND nc = 2 THEN base + 2000 " +
        "ELSE base + (nc - 1) * 2500 + 2000 END AS last_end FROM g) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 NOT IN (3, 4) AS INTEGER) AS ok, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 = 1 THEN 'vtt' ELSE 'srt' END AS format, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE len(kept) END " +
        "AS INTEGER) AS n_cues, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE 2000 * len(kept) END AS BIGINT) AS total_ms, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE last_end END " +
        "AS BIGINT) AS last_end_ms, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE md5(array_to_string(kept, chr(10))) END AS text_md5, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE length(array_to_string(kept, chr(10))) END AS BIGINT) " +
        "AS n_chars FROM k"),
    // q139: every STREAMINFO field (20/3/5/36-bit unpack), the Vorbis
    // TITLE behind the endianness flip, and the Long duration division
    // replay from the byte count alone; class 3 is the q39 meta split
    // (magic survives, fields refuse), class 2 the 36-bit wide shape
    "q139_flac_meta" ->
      ("WITH m AS (SELECT doc_id, octet_length(encode(text)) AS o " +
        "FROM documents), " +
        "f AS (SELECT doc_id, o, " +
        "CASE WHEN doc_id % 5 = 2 THEN 96000 " +
        "WHEN doc_id % 3 = 0 THEN 44100 WHEN doc_id % 3 = 1 THEN 48000 " +
        "ELSE 32000 END AS rate, " +
        "CASE WHEN doc_id % 5 = 2 THEN 8589934592 + o " +
        "ELSE o * 1000 + doc_id % 997 END AS total FROM m) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 <> 4 AS INTEGER) AS is_flac, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 IN (1, 2) THEN 3 ELSE 1 END AS INTEGER) AS n_blocks, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE rate END " +
        "AS INTEGER) AS sample_rate, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 = 2 THEN 8 ELSE doc_id % 2 + 1 END AS INTEGER) " +
        "AS channels, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 = 2 THEN 24 ELSE 16 END AS INTEGER) AS bits, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE total END " +
        "AS BIGINT) AS total_samples, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE total * 1000 // rate END AS BIGINT) AS duration_ms, " +
        "CASE WHEN doc_id % 5 IN (1, 2) THEN 'doc ' || doc_id || ' title' " +
        "ELSE NULL END AS title FROM f"),
    // q140: the expected PROSE re-synthesizes from corpus words alone
    // (heading text, the decorated paragraph stripped, list items,
    // quote, tail) — never from a markdown byte, so a stripping slip
    // cannot cancel; classes 0 and 1 must produce IDENTICAL prose
    // under different markup, and the fence content never appears
    "q140_markdown_extract" ->
      ("WITH w AS (SELECT doc_id, text, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "x AS (SELECT doc_id, text, ws, len(ws) AS n FROM w), " +
        "p AS (SELECT doc_id, text, " +
        "array_to_string(list_slice(ws, 1, 3), ' ') AS hd, " +
        "ws[4] || ' ' || ws[5] || ' ' || ws[6] || ' ' || ws[7] || ' ' || " +
        "ws[8] AS para, " +
        "ws[9] AS i1, ws[10] AS i2, ws[1] AS i3, " +
        "ws[2] || ' ' || ws[3] AS qt, " +
        "CASE WHEN n > 10 THEN chr(10) || " +
        "array_to_string(list_slice(ws, 11, n), ' ') ELSE '' END AS tail, " +
        "CASE WHEN doc_id % 5 = 2 THEN chr(10) || '#' || ws[1] || 'tag' " +
        "ELSE '' END AS trap FROM x), " +
        "t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN text ELSE " +
        "hd || trap || chr(10) || para || chr(10) || i1 || chr(10) || i2 || " +
        "chr(10) || i3 || chr(10) || qt || tail END AS plain FROM p) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_headings, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_code_blocks, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "WHEN doc_id % 3 = 0 THEN 'python' WHEN doc_id % 3 = 1 THEN 'scala' " +
        "ELSE 'sql' END AS lang, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_links, " +
        "md5(plain) AS text_md5, " +
        "CAST(length(plain) AS BIGINT) AS n_chars FROM t"),
    // q141: counts, the attribute-vs-text link, the epoch arithmetic
    // behind BOTH date grammars, and the decoded titles (entity and
    // CDATA first-item variants) replay from corpus words alone
    "q141_feed_ingest" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "c AS (SELECT doc_id, ws, " +
        "CAST(ceil(len(ws) / 8.0) AS INTEGER) AS nc FROM w), " +
        "g AS (SELECT doc_id, nc, list_transform(range(nc), i -> " +
        "array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) AS ts " +
        "FROM c), " +
        "a AS (SELECT doc_id, nc, " +
        "CASE WHEN doc_id % 5 = 1 THEN " +
        "list_concat([ts[1] || ' & more'], list_slice(ts, 2, nc)) " +
        "WHEN doc_id % 5 = 2 THEN " +
        "list_concat([ts[1] || ' <b> & raw'], list_slice(ts, 2, nc)) " +
        "ELSE ts END AS ts FROM g) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 NOT IN (3, 4) AS INTEGER) AS ok, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "WHEN doc_id % 5 = 1 THEN 'atom' ELSE 'rss' END AS format, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE nc END " +
        "AS INTEGER) AS n_items, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL ELSE ts[1] END " +
        "AS first_title, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE 'https://feed.example/doc' || doc_id || '/item0' END " +
        "AS first_link, " +
        "CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE 1704067200 + doc_id * 37 + (nc - 1) * 60 END AS BIGINT) " +
        "AS latest_epoch, " +
        "CASE WHEN doc_id % 5 IN (3, 4) THEN NULL " +
        "ELSE md5(array_to_string(ts, chr(10))) END AS titles_md5 FROM a"),
    // q142: the spine-ordered text re-synthesizes from corpus words
    // alone (two chapters, 8-word paragraphs, the chapter-A entity
    // suffix) — a zip-order or manifest-order reader produces a
    // different book and cannot hash-match
    "q142_epub_extract" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "x AS (SELECT doc_id, ws, len(ws) AS n, " +
        "CAST(ceil(len(ws) / 2.0) AS INTEGER) AS half FROM w), " +
        "a AS (SELECT doc_id, list_slice(ws, 1, half) AS wa, " +
        "list_slice(ws, half + 1, n) AS wb FROM x), " +
        "g AS (SELECT doc_id, " +
        "CAST(ceil(len(wa) / 8.0) AS INTEGER) AS na, " +
        "CAST(ceil(len(wb) / 8.0) AS INTEGER) AS nb, " +
        "list_transform(range(CAST(ceil(len(wa) / 8.0) AS INTEGER)), i -> " +
        "array_to_string(list_slice(wa, i*8 + 1, i*8 + 8), ' ')) AS pa, " +
        "list_transform(range(CAST(ceil(len(wb) / 8.0) AS INTEGER)), i -> " +
        "array_to_string(list_slice(wb, i*8 + 1, i*8 + 8), ' ')) AS pb " +
        "FROM a), " +
        "t AS (SELECT doc_id, na, nb, list_concat(list_concat(" +
        "[pa[1] || ' & co'], list_slice(pa, 2, na)), pb) AS paras FROM g) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 NOT IN (2, 3, 4) AS INTEGER) AS ok, " +
        "CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL " +
        "ELSE 'doc ' || doc_id || ' & friends' END AS title, " +
        "CAST(CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL ELSE 2 END " +
        "AS INTEGER) AS n_chapters, " +
        "CAST(CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL ELSE na + nb END " +
        "AS INTEGER) AS n_paragraphs, " +
        "CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL " +
        "ELSE md5(array_to_string(paras, chr(10))) END AS text_md5, " +
        "CAST(CASE WHEN doc_id % 5 IN (2, 3, 4) THEN NULL " +
        "ELSE length(array_to_string(paras, chr(10))) END AS BIGINT) " +
        "AS n_chars FROM t"),
    // q143: every expected REPAIRED string spells from chr() codepoints
    // alone (the true suffixes, never a mojibake byte) — so the repair
    // loop's gates and round counts are both pinned; classes 1 and 4
    // prove real non-ASCII and the lone-Â trap survive untouched
    "q143_mojibake_repair" ->
      ("WITH r AS (SELECT doc_id, CASE doc_id % 5 " +
        "WHEN 1 THEN text || ' caf' || chr(233) || ' ' || chr(8212) || ' ok' " +
        "WHEN 2 THEN text || ' caf' || chr(233) || ' ' || chr(8212) || " +
        "' na' || chr(239) || 've' " +
        "WHEN 3 THEN text || ' caf' || chr(233) || ' na' || chr(239) || 've' " +
        "WHEN 4 THEN text || ' ' || chr(194) || ' tricky' " +
        "ELSE text END AS fixed FROM documents) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 IN (2, 3) AS INTEGER) AS mojibake, " +
        "CAST(CASE doc_id % 5 WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 0 END " +
        "AS INTEGER) AS n_rounds, " +
        "md5(fixed) AS text_md5, " +
        "CAST(length(fixed) AS BIGINT) AS n_chars FROM r"),
    // q144: the expected prose re-synthesizes from corpus words alone
    // (section heading, the 100%-escape paragraph invariant across the
    // class-0/1 markup swap, subsection word, two items, the accented
    // caf<e9> + tail) — never from a TeX byte, so a comment,
    // math-exclusion, escape, or cite-vanish slip cannot cancel
    "q144_latex_extract" ->
      ("WITH w AS (SELECT doc_id, text, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, text, ws, len(ws) AS n, " +
        "ws[3] || ' ' || ws[4] AS sec, " +
        "ws[5] || ' ' || ws[6] || ' 100% ' || ws[7] AS para, " +
        "ws[8] AS sub, ws[9] AS i1, ws[10] AS i2, " +
        "'caf' || chr(233) || " +
        "CASE WHEN len(ws) > 10 THEN ' ' || " +
        "array_to_string(list_slice(ws, 11, len(ws)), ' ') ELSE '' END " +
        "AS fin FROM w), " +
        "t AS (SELECT doc_id, ws, CASE WHEN doc_id % 5 = 4 THEN text ELSE " +
        "sec || chr(10) || para || chr(10) || sub || chr(10) || i1 || " +
        "chr(10) || i2 || chr(10) || fin END AS plain FROM p) " +
        "SELECT doc_id, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "ELSE ws[1] || ' ' || ws[2] END AS title, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 2 END AS INTEGER) " +
        "AS n_sections, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 " +
        "WHEN doc_id % 5 = 3 THEN 2 ELSE 1 END AS INTEGER) AS n_math, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_cites, " +
        "md5(plain) AS text_md5, " +
        "CAST(length(plain) AS BIGINT) AS n_chars FROM t"),
    // q145: every expected value re-synthesizes from corpus words
    // alone — entry/author/year counts per class, the first key from
    // doc_id, and the titles (the class-2 arm spells the protective
    // nested-brace strip as a decoded constant) — so a macro-expand,
    // case-fold, comment-count, or author-split slip cannot cancel
    "q145_bibtex_parse" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "t AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 5 = 4 THEN NULL " +
        "WHEN doc_id % 5 = 2 THEN ws[5] || ' Spark ' || ws[7] || chr(10) " +
        "|| 'on ' || ws[1] || ' and ' || ws[2] " +
        "WHEN doc_id % 5 = 3 THEN ws[5] || ' ' || ws[6] || ' ' || ws[7] " +
        "|| chr(10) || ws[8] || ' ' || ws[9] " +
        "ELSE ws[5] || ' ' || ws[6] || ' ' || ws[7] || chr(10) " +
        "|| 'on ' || ws[1] || ' and ' || ws[2] END AS titles FROM w) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 2 END AS INTEGER) " +
        "AS n_entries, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_articles, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "ELSE 'doc' || doc_id || 'a' END AS first_key, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN 0 " +
        "WHEN doc_id % 5 = 3 THEN 2 ELSE 4 END AS INTEGER) AS n_authors, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "WHEN doc_id % 5 = 3 THEN 2024 ELSE 2021 END AS INTEGER) " +
        "AS year_max, " +
        "md5(titles) AS titles_md5 FROM t"),
    // q146: the oracle replays the epoch arithmetic behind BOTH W3C
    // datetime grammars (date-only = midnight UTC, full ISO = +6h30m)
    // from doc_id alone — so a date-parse, entity-decode, loc-skip,
    // or truncation-refusal slip cannot cancel
    "q146_sitemap_parse" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "'https://s' || (doc_id % 7) || '.example' AS host, " +
        "CAST(2 + doc_id % 3 AS INTEGER) AS n0 FROM documents), " +
        "e AS (SELECT doc_id, m, host, n0, " +
        "list_aggregate(list_transform(range(n0), i -> " +
        "CAST(epoch(make_date(2024, 3, CAST(1 + (doc_id + i) % 28 AS INTEGER))) " +
        "AS BIGINT) + CASE WHEN i % 2 = 1 THEN 23400 ELSE 0 END), 'max') " +
        "AS lat0, " +
        "greatest(CAST(epoch(make_date(2024, 3, " +
        "CAST(1 + doc_id % 28 AS INTEGER))) AS BIGINT), " +
        "CAST(epoch(make_date(2024, 3, " +
        "CAST(1 + (doc_id + 5) % 28 AS INTEGER))) AS BIGINT)) AS lat2, " +
        "greatest(CAST(epoch(make_date(2024, 3, " +
        "CAST(1 + doc_id % 28 AS INTEGER))) AS BIGINT), " +
        "CAST(epoch(make_date(2024, 3, " +
        "CAST(1 + (doc_id + 1) % 28 AS INTEGER))) AS BIGINT)) + 23400 " +
        "AS lat1 FROM p) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2) AS INTEGER) AS ok, " +
        "CASE WHEN m = 1 THEN 'index' WHEN m IN (0, 2) THEN 'urlset' " +
        "ELSE NULL END AS kind, " +
        "CAST(CASE WHEN m = 0 THEN n0 WHEN m = 1 THEN 2 WHEN m = 2 THEN 3 " +
        "ELSE NULL END AS INTEGER) AS n_urls, " +
        "CAST(CASE WHEN m = 0 THEN n0 WHEN m = 1 THEN 2 WHEN m = 2 THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_lastmod, " +
        "CASE WHEN m = 0 THEN lat0 WHEN m = 1 THEN lat1 " +
        "WHEN m = 2 THEN lat2 ELSE NULL END AS latest_epoch, " +
        "CASE WHEN m = 0 THEN host || '/p0' " +
        "WHEN m = 1 THEN host || '/sitemap0.xml' " +
        "WHEN m = 2 THEN host || '/a?x=1&y=2' ELSE NULL END AS first_loc " +
        "FROM e"),
    // q147: every expected cell re-synthesizes from corpus words alone
    // (the class-2 arm spells the entity decode and colspan width as
    // decoded constants) — so an implicit-close, attribute-quote,
    // entity, or width-accounting slip cannot cancel
    "q147_html_tables" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "c AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 7 = 6 THEN NULL " +
        "WHEN doc_id % 7 = 2 THEN ws[1] || ' & ' || ws[2] || chr(10) || " +
        "ws[3] || chr(9) || ws[4] " +
        "WHEN doc_id % 7 = 4 THEN ws[1] || chr(9) || ws[2] || chr(10) || " +
        "ws[1] || chr(9) || ws[3] || chr(10) || ws[4] || chr(9) || ws[5] " +
        "WHEN doc_id % 7 = 5 THEN ws[1] || chr(9) || 'before after' || " +
        "chr(10) || ws[3] || chr(9) || ws[4] " +
        "ELSE ws[1] || chr(9) || ws[2] || chr(10) || ws[3] || chr(9) || " +
        "ws[4] || chr(10) || ws[5] || chr(9) || ws[6] END AS cells FROM w) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN 0 WHEN doc_id % 7 IN (3, 5) " +
        "THEN 2 ELSE 1 END AS INTEGER) AS n_tables, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN 0 WHEN doc_id % 7 = 3 THEN 4 " +
        "WHEN doc_id % 7 = 2 THEN 2 WHEN doc_id % 7 = 5 THEN 3 " +
        "ELSE 3 END AS INTEGER) AS n_rows, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN NULL WHEN doc_id % 7 = 2 THEN 2 " +
        "WHEN doc_id % 7 = 5 THEN 2 ELSE 3 END AS INTEGER) AS first_rows, " +
        "CAST(CASE WHEN doc_id % 7 = 6 THEN NULL WHEN doc_id % 7 = 4 THEN 3 " +
        "ELSE 2 END AS INTEGER) AS first_cols, " +
        "md5(cells) AS cells_md5 FROM c"),
    // q148: the oracle replays first-occurrence-wins through a window
    // (PARTITION BY para ORDER BY doc_id, idx) — a DIFFERENT plan
    // shape than the engine's skew-safe min-struct aggregate, so the
    // two must agree on every doc's counts and kept-text digest
    "q148_para_dedup" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "ch AS (SELECT doc_id, list_transform(" +
        "range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) " +
        "AS chunks FROM w), " +
        "pa AS (SELECT doc_id, list_concat(list_concat(list_concat(" +
        "CASE WHEN doc_id % 7 IN (0, 3) THEN " +
        "['all rights reserved contact the publisher for permissions'] " +
        "ELSE []::VARCHAR[] END, " +
        "CASE WHEN doc_id % 7 IN (1, 3) THEN " +
        "['distributed under a creative commons attribution license'] " +
        "ELSE []::VARCHAR[] END), chunks), " +
        "CASE WHEN doc_id % 7 = 4 THEN [chunks[1]] ELSE []::VARCHAR[] END) " +
        "AS paras FROM ch), " +
        "x AS (SELECT doc_id, u['i'] AS idx, u['p'] AS para FROM " +
        "(SELECT doc_id, unnest(list_transform(range(len(paras)), " +
        "i -> {'i': i, 'p': paras[i+1]})) AS u FROM pa)), " +
        "r AS (SELECT doc_id, idx, para, row_number() OVER " +
        "(PARTITION BY para ORDER BY doc_id, idx) AS rn FROM x) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras, " +
        "CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
        "md5(coalesce(string_agg(para, chr(10) ORDER BY idx) " +
        "FILTER (WHERE rn = 1), '')) AS kept_md5 " +
        "FROM r GROUP BY doc_id"),
    // q149: every field replays from doc_id arithmetic alone — the
    // 2^32-crossing granule, the lacing-terminated packet counts, and
    // the codec-clock duration split (Vorbis own rate, Opus 48 kHz)
    // pin the u64 read, the 255-terminator rule, and the clock choice
    "q149_ogg_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 AS m, " +
        "CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 22050 " +
        "WHEN 2 THEN 44100 ELSE 48000 END AS rate, " +
        "CAST(1 + doc_id % 2 AS INTEGER) AS ch, " +
        "4294967296 + (doc_id % 1000) * 960 AS g FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3, 4) AS INTEGER) AS is_ogg, " +
        "CASE WHEN m IN (0, 2, 4) THEN 'vorbis' WHEN m = 1 THEN 'opus' " +
        "ELSE NULL END AS codec, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 2 WHEN m = 4 THEN 3 " +
        "ELSE NULL END AS INTEGER) AS n_pages, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 2 WHEN m IN (2, 4) THEN 3 " +
        "ELSE NULL END AS INTEGER) AS n_packets, " +
        "CAST(CASE WHEN m IN (0, 1, 2, 4) THEN ch ELSE NULL END AS INTEGER) " +
        "AS channels, " +
        "CAST(CASE WHEN m IN (0, 1, 2, 4) THEN rate ELSE NULL END AS INTEGER) " +
        "AS sample_rate, " +
        "CAST(CASE WHEN m IN (0, 1, 2, 4) THEN g ELSE NULL END AS BIGINT) " +
        "AS granule, " +
        "CAST(CASE WHEN m IN (0, 2, 4) THEN g * 1000 // rate " +
        "WHEN m = 1 THEN g * 1000 // 48000 ELSE NULL END AS BIGINT) " +
        "AS duration_ms FROM p"),
    // q150: the oracle rebuilds the stupid-backoff ladder end to end —
    // train-half model tables, LEFT-join path choice, per-path counts,
    // and q81's exact-half micro-unit mean — so a split, context-count,
    // alpha, or backoff-order slip cannot cancel
    "q150_trigram_backoff" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
        "FROM documents), " +
        "tr AS (SELECT * FROM t WHERE doc_id % 2 = 0), " +
        "uni AS (SELECT tok AS w3, count(*) AS cu FROM " +
        "(SELECT unnest(ws) AS tok FROM tr) GROUP BY tok), " +
        "n AS (SELECT sum(cu) AS n_total FROM uni), " +
        "bg AS (SELECT ws[i] AS w2, ws[i + 1] AS w3 FROM " +
        "(SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i " +
        "FROM tr WHERE len(ws) >= 2)), " +
        "bi AS (SELECT w2, w3, count(*) AS c2 FROM bg GROUP BY w2, w3), " +
        "k2 AS (SELECT w2, count(*) AS k2 FROM bg GROUP BY w2), " +
        "tg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 FROM " +
        "(SELECT ws, unnest(generate_series(1, len(ws) - 2)) AS i " +
        "FROM tr WHERE len(ws) >= 3)), " +
        "tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg " +
        "GROUP BY w1, w2, w3), " +
        "k3 AS (SELECT w1, w2, count(*) AS k3 FROM tg GROUP BY w1, w2), " +
        "st AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 " +
        "FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) " +
        "AS i FROM t WHERE len(ws) >= 3)), " +
        "sc AS (SELECT s.doc_id, " +
        "CASE WHEN tri.c3 IS NOT NULL THEN 'tri' " +
        "WHEN bi.c2 IS NOT NULL THEN 'bi' " +
        "WHEN uni.cu IS NOT NULL THEN 'uni' ELSE 'oov' END AS path, " +
        "CAST(round(-ln(CASE " +
        "WHEN tri.c3 IS NOT NULL THEN CAST(tri.c3 AS DOUBLE) / k3.k3 " +
        "WHEN bi.c2 IS NOT NULL THEN 0.4 * CAST(bi.c2 AS DOUBLE) / k2.k2 " +
        "WHEN uni.cu IS NOT NULL THEN 0.16 * CAST(uni.cu AS DOUBLE) / " +
        "n.n_total END), 6) AS DECIMAL(18,6)) AS s " +
        "FROM st s " +
        "LEFT JOIN tri ON tri.w1 = s.w1 AND tri.w2 = s.w2 AND tri.w3 = s.w3 " +
        "LEFT JOIN k3 ON k3.w1 = s.w1 AND k3.w2 = s.w2 " +
        "LEFT JOIN bi ON bi.w2 = s.w2 AND bi.w3 = s.w3 " +
        "LEFT JOIN k2 ON k2.w2 = s.w2 " +
        "LEFT JOIN uni ON uni.w3 = s.w3, n), " +
        "agg AS (SELECT doc_id, " +
        "sum(CASE WHEN path = 'tri' THEN 1 ELSE 0 END) AS n_tri, " +
        "sum(CASE WHEN path = 'bi' THEN 1 ELSE 0 END) AS n_bi, " +
        "sum(CASE WHEN path = 'uni' THEN 1 ELSE 0 END) AS n_uni, " +
        "sum(CASE WHEN path = 'oov' THEN 1 ELSE 0 END) AS n_oov, " +
        "count(*) FILTER (WHERE path <> 'oov') AS n_scored, " +
        "sum(s) FILTER (WHERE path <> 'oov') AS sum_s " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT t.doc_id, " +
        "CAST(coalesce(len(t.ws), 0) AS BIGINT) AS n_tokens, " +
        "CAST(coalesce(a.n_scored, 0) AS BIGINT) AS n_scored, " +
        "CAST(coalesce(a.n_tri, 0) AS BIGINT) AS n_tri, " +
        "CAST(coalesce(a.n_bi, 0) AS BIGINT) AS n_bi, " +
        "CAST(coalesce(a.n_uni, 0) AS BIGINT) AS n_uni, " +
        "CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov, " +
        "CASE WHEN a.n_scored > 0 THEN " +
        "CAST((2 * CAST(a.sum_s * 1000000 AS BIGINT) + a.n_scored) " +
        "// (2 * a.n_scored) AS DOUBLE) / 1e6 END AS mean_surprisal " +
        "FROM t LEFT JOIN agg a USING (doc_id)"),
    // q151: the oracle aggregates through a DIFFERENT plan shape (a
    // window row_number over the per-target anchor counts) than the
    // engine's skew-safe min-struct — counts, distincts, majority
    // anchor, and the count-then-lexicographic tie-break must agree
    "q151_anchor_text" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "pr AS (SELECT 'https://hub.example.com/home' AS url, " +
        "ws[1] AS anchor FROM w " +
        "UNION ALL SELECT 'https://site' || ((doc_id + 1) % 40) || " +
        "'.example.com/x/' || (doc_id % 6), ws[2] || ' ' || ws[3] FROM w " +
        "UNION ALL SELECT 'https://site' || (doc_id % 40) || " +
        "'.example.com/r/' || (doc_id % 10), ws[4] FROM w), " +
        "pc AS (SELECT url, anchor, count(*) AS cnt FROM pr " +
        "GROUP BY url, anchor), " +
        "r AS (SELECT url, anchor, cnt, " +
        "row_number() OVER (PARTITION BY url ORDER BY cnt DESC, anchor) " +
        "AS rn, sum(cnt) OVER (PARTITION BY url) AS n_links, " +
        "count(*) OVER (PARTITION BY url) AS n_anchors FROM pc) " +
        "SELECT url, CAST(n_links AS BIGINT) AS n_links, " +
        "CAST(n_anchors AS BIGINT) AS n_anchors, " +
        "anchor AS top_anchor, CAST(cnt AS BIGINT) AS top_count " +
        "FROM r WHERE rn = 1"),
    // q152: every field replays from doc_id arithmetic alone — the
    // u32-crossing duration product, the per-class stream counts, and
    // the truncation/not-RIFF refusals pin the tree walk's outputs
    "q152_avi_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "CAST(160 + (doc_id % 4) * 80 AS INTEGER) AS w, " +
        "CAST(120 + (doc_id % 3) * 60 AS INTEGER) AS h, " +
        "CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 40000 END AS uspf, " +
        "200000 + doc_id % 1000 AS frames FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_avi, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN w ELSE NULL END AS INTEGER) " +
        "AS width, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN h ELSE NULL END AS INTEGER) " +
        "AS height, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 1 ELSE NULL END AS INTEGER) " +
        "AS n_vids, " +
        "CAST(CASE WHEN m = 1 THEN 1 WHEN m IN (0, 2) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS n_auds, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN frames ELSE NULL END AS BIGINT) " +
        "AS total_frames, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN frames * uspf // 1000 " +
        "ELSE NULL END AS BIGINT) AS duration_ms FROM p"),
    // q153: the oracle HAND-SPELLS all ten paths' type histograms from
    // residue-class counts alone (never parsing a JSON byte), majority
    // ties included — so a parser, path-spelling, set-dedup, or
    // tie-break slip cannot cancel
    "q153_json_shape" ->
      ("WITH c AS (SELECT " +
        "sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS c0, " +
        "sum(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END) AS c1, " +
        "sum(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END) AS c2, " +
        "sum(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS c3, " +
        "sum(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END) AS c4 " +
        "FROM documents) " +
        "SELECT path, CAST(n_obs AS BIGINT) AS n_obs, " +
        "CAST(n_string AS BIGINT) AS n_string, " +
        "CAST(n_number AS BIGINT) AS n_number, " +
        "CAST(n_array AS BIGINT) AS n_array, " +
        "CAST(n_object AS BIGINT) AS n_object, " +
        "CAST(n_bool AS BIGINT) AS n_bool, " +
        "CAST(n_null AS BIGINT) AS n_null, major_type FROM (" +
        "SELECT '$' AS path, c0+c1+c2+c3 AS n_obs, 0 AS n_string, " +
        "0 AS n_number, 0 AS n_array, c0+c1+c2+c3 AS n_object, " +
        "0 AS n_bool, 0 AS n_null, 'object' AS major_type FROM c " +
        "UNION ALL SELECT '$.id', c0+c1+c2+c3, 0, c0+c1+c2+c3, 0, 0, 0, 0, " +
        "'number' FROM c " +
        "UNION ALL SELECT '$.title', c0+c1+c2+c3, c0+c1+c2, 0, 0, 0, 0, c3, " +
        "CASE WHEN c0+c1+c2 > c3 THEN 'string' ELSE 'null' END FROM c " +
        "UNION ALL SELECT '$.tags', c0+c1+c2+c3, c2, 0, c0+c1+c3, 0, 0, 0, " +
        "CASE WHEN c0+c1+c3 >= c2 THEN 'array' ELSE 'string' END FROM c " +
        "UNION ALL SELECT '$.tags[]', c0+c1+c3, c0+c1+c3, 0, 0, 0, 0, 0, " +
        "'string' FROM c " +
        "UNION ALL SELECT '$.meta', c0+c1+c2+c3, 0, 0, 0, c0+c1+c2+c3, 0, 0, " +
        "'object' FROM c " +
        "UNION ALL SELECT '$.meta.lang', c0+c1+c2+c3, c0+c1+c2+c3, 0, 0, 0, " +
        "0, 0, 'string' FROM c " +
        "UNION ALL SELECT '$.meta.score', c0+c1+c2+c3, c1, c0+c2+c3, 0, 0, " +
        "0, 0, CASE WHEN c0+c2+c3 >= c1 THEN 'number' ELSE 'string' END " +
        "FROM c " +
        "UNION ALL SELECT '$.extra', c2, 0, 0, 0, 0, c2, 0, 'boolean' FROM c " +
        "UNION ALL SELECT '$invalid', c4, 0, 0, 0, 0, 0, 0, 'invalid' FROM c)"),
    // q154: every verdict replays from doc_id arithmetic alone — the
    // comment immunity, case/order/quote invariance, both resolution
    // arms, and the self-vs-query distinction pin the tag walk
    "q154_page_verdict" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "'https://site' || (doc_id % 40) || '.example.com' AS host, " +
        "'https://site' || (doc_id % 40) || '.example.com/p' || " +
        "(doc_id % 20) || '.html' AS self FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN m = 1 THEN 1 ELSE 0 END AS INTEGER) AS noindex, " +
        "CAST(CASE WHEN m = 2 THEN 1 ELSE 0 END AS INTEGER) AS nofollow, " +
        "CASE WHEN m = 0 THEN self " +
        "WHEN m = 2 THEN host || '/canon/' || (doc_id % 10) " +
        "WHEN m = 4 THEN self || '?ref=a&b' ELSE NULL END AS canonical_url, " +
        "CAST(CASE WHEN m = 0 THEN 1 WHEN m IN (2, 4) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS is_self FROM p"),
    // q155: the expected prose re-synthesizes from corpus words and
    // chr() codepoints alone — identical across the four markup
    // classes (the invariance drill), so a delimiter-space, hex-case,
    // fallback-consumption, or destination-leak slip cannot cancel
    "q155_rtf_extract" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN NULL ELSE " +
        "ws[1] || ' ' || ws[2] || ' ' || ws[3] || ' ' || ws[4] || chr(10) " +
        "|| 'caf' || chr(233) || ' na' || chr(239) || 've' || " +
        "CASE WHEN len(ws) > 4 THEN ' ' || " +
        "array_to_string(list_slice(ws, 5, len(ws)), ' ') ELSE '' END " +
        "END AS plain FROM w) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 <> 4 AS INTEGER) AS ok, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 2 END AS INTEGER) " +
        "AS n_pars, " +
        "md5(plain) AS text_md5, " +
        "CAST(length(plain) AS BIGINT) AS n_chars FROM t"),
    // q156: the oracle rolls the postings up through window functions
    // (a different plan shape than the engine's min-struct + sorted
    // collect) — df/cf, the tf-then-doc_id tie-break, and the
    // doc-ordered digest must all agree
    "q156_postings_build" ->
      ("WITH t AS (SELECT doc_id, unnest(list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '')) AS term FROM documents), " +
        "tf AS (SELECT term, doc_id, count(*) AS tf FROM t " +
        "GROUP BY term, doc_id), " +
        "pm AS (SELECT term, count(*) AS df, sum(tf) AS cf, " +
        "md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)) " +
        "AS postings_md5 FROM tf GROUP BY term), " +
        "tp AS (SELECT term, doc_id, tf, row_number() OVER " +
        "(PARTITION BY term ORDER BY tf DESC, doc_id) AS rn FROM tf) " +
        "SELECT p.term, CAST(p.df AS BIGINT) AS df, " +
        "CAST(p.cf AS BIGINT) AS cf, t.doc_id AS top_doc, " +
        "CAST(t.tf AS BIGINT) AS top_tf, p.postings_md5 " +
        "FROM pm p JOIN tp t ON t.term = p.term AND t.rn = 1"),
    // q157: every expected SENTENCE spells from corpus words alone —
    // the abbreviation block, decimal immunity, run-collapse, quote
    // attachment, and the stated etc.-join are each pinned by an arm
    "q157_sentence_split" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "x AS (SELECT doc_id, ws, len(ws) AS n, doc_id % 5 AS m FROM w), " +
        "t AS (SELECT doc_id, n, m, CASE m " +
        "WHEN 1 THEN ws[1] || ' ' || ws[2] || ' ' || ws[3] || '?!' || " +
        "chr(10) || ws[4] || ' ' || ws[5] || '...' || chr(10) || " +
        "ws[6] || ' ' || ws[7] || '.' || chr(10) || " +
        "array_to_string(list_slice(ws, 8, n), ' ') || '.' " +
        "WHEN 2 THEN ws[1] || ' ' || ws[2] || ' etc. ' || ws[3] || ' ' || " +
        "ws[4] || ' ' || ws[5] || '.' || chr(10) || " +
        "array_to_string(list_slice(ws, 6, n), ' ') || '!' " +
        "WHEN 3 THEN ws[1] || ' ' || ws[2] || '.' || chr(10) || " +
        "array_to_string(list_slice(ws, 3, n), ' ') " +
        "WHEN 4 THEN text " +
        "ELSE ws[1] || ' ' || ws[2] || ' ' || ws[3] || '.' || chr(10) || " +
        "'Dr. ' || ws[4] || ' got 3.14 of ' || ws[5] || '.' || chr(10) || " +
        "ws[6] || ' e.g. ' || ws[7] || '!' || chr(10) || " +
        "'\"' || ws[8] || ' ' || ws[9] || '?\"' || chr(10) || " +
        "array_to_string(list_slice(ws, 10, n), ' ') END AS sents " +
        "FROM x JOIN documents USING (doc_id)) " +
        "SELECT doc_id, " +
        "CAST(CASE m WHEN 0 THEN 5 WHEN 1 THEN 4 WHEN 2 THEN 2 " +
        "WHEN 3 THEN 2 ELSE 1 END AS INTEGER) AS n_sentences, " +
        "CAST(CASE m WHEN 0 THEN n + 5 WHEN 1 THEN n WHEN 2 THEN n + 1 " +
        "WHEN 3 THEN n ELSE n END AS INTEGER) AS n_tokens, " +
        "CAST(CASE m WHEN 0 THEN greatest(6, n - 9) " +
        "WHEN 1 THEN greatest(3, n - 7) WHEN 2 THEN greatest(6, n - 5) " +
        "WHEN 3 THEN greatest(2, n - 2) ELSE n END AS INTEGER) AS longest, " +
        "md5(sents) AS sent_md5 FROM t"),
    // q158: every field replays from corpus words + doc_id alone — the
    // tag size from ENCODING arithmetic (latin1 chars, UTF-8's 2-byte
    // é, UTF-16's BOM + doubling), frame counts incl. the PRIV decoy,
    // padding inside the size, and the truncation/not-ID3 refusals
    "q158_id3_tags" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "'caf' || chr(233) || ' ' || ws[1] || ' ' || ws[2] AS title, " +
        "ws[3] || ' ' || ws[4] AS artist, " +
        "60000 + (doc_id % 300) * 1000 AS len_ms, " +
        "4 + 1 + length(ws[1]) + 1 + length(ws[2]) AS tc, " +
        "length(ws[3]) + 1 + length(ws[4]) AS ac FROM w), " +
        "q AS (SELECT doc_id, m, title, artist, len_ms, tc, ac, " +
        "length(CAST(len_ms AS VARCHAR)) AS lc, " +
        "title || ' ' || repeat('x', 80) AS padded FROM p) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_id3, " +
        "CAST(CASE WHEN m = 1 THEN 4 WHEN m IN (0, 2) THEN 3 " +
        "ELSE NULL END AS INTEGER) AS version, " +
        "CAST(CASE " +
        "WHEN m = 0 THEN (11 + tc) + (11 + ac) + (11 + lc) " +
        "WHEN m = 1 THEN (10 + 1 + 2 + 2 * (tc + 81)) + (11 + ac) + (11 + lc) " +
        "WHEN m = 2 THEN (10 + 1 + tc + 1) + 30 + (11 + ac) + (11 + lc) + 64 " +
        "ELSE NULL END AS INTEGER) AS tag_size, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 3 WHEN m = 2 THEN 4 " +
        "ELSE NULL END AS INTEGER) AS n_frames, " +
        "CASE WHEN m IN (0, 2) THEN title WHEN m = 1 THEN padded " +
        "ELSE NULL END AS title, " +
        "CASE WHEN m IN (0, 1, 2) THEN artist ELSE NULL END AS artist, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN len_ms ELSE NULL END AS BIGINT) " +
        "AS len_ms, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 1 ELSE NULL END AS INTEGER) " +
        "AS audio_follows FROM q"),
    // q159: every field replays from doc_id arithmetic — attribute
    // precedence over the decoy viewBox, the px strip, the fallback
    // arm, comment-immune shape counts, and the script flag
    "q159_svg_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "CAST(100 + (doc_id % 10) * 10 AS INTEGER) AS w, " +
        "CAST(50 + (doc_id % 5) * 20 AS INTEGER) AS h FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_svg, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN w ELSE NULL END AS INTEGER) " +
        "AS width, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN h ELSE NULL END AS INTEGER) " +
        "AS height, " +
        "CAST(CASE WHEN m = 0 THEN 3 WHEN m = 1 THEN 2 WHEN m = 2 THEN 4 " +
        "ELSE NULL END AS INTEGER) AS n_shapes, " +
        "CAST(CASE WHEN m = 2 THEN 1 WHEN m IN (0, 1) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS has_script FROM p"),
    // q160: counts, byte accounting, and payload md5s replay from
    // corpus words + doc_id alone — the oracle never frames a byte,
    // so a CRC-mask, endianness, or refusal-split slip in the walk
    // cannot cancel (the empty record's md5 IS md5(''))
    "q160_tfrecord_ingest" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || ws[2] || '#' || CAST(doc_id % 97 AS VARCHAR) AS p0, " +
        "ws[2] || ' ' || ws[3] || '#' || CAST(doc_id % 97 + 1 AS VARCHAR) AS p1, " +
        "ws[3] || ' ' || ws[4] || '#' || CAST(doc_id % 97 + 2 AS VARCHAR) AS p2, " +
        "repeat(ws[1] || ' ', 60) AS pb FROM w) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS valid, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 3 WHEN m = 3 THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_records, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 3 WHEN m IN (2, 3) THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_valid, " +
        "CAST(CASE " +
        "WHEN m = 0 THEN length(p0) + length(p1) + length(p2) " +
        "WHEN m = 1 THEN length(pb) + length(p2) " +
        "WHEN m = 2 THEN length(p0) + length(p2) " +
        "WHEN m = 3 THEN length(p0) + length(p1) " +
        "ELSE NULL END AS BIGINT) AS total_bytes, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 0 WHEN m = 3 THEN 1 " +
        "ELSE NULL END AS INTEGER) AS truncated, " +
        "CASE WHEN m IN (0, 2, 3) THEN md5(p0) WHEN m = 1 THEN md5('') " +
        "ELSE NULL END AS first_md5 FROM p"),
    // q161: every field replays from corpus words + doc_id arithmetic
    // — the oracle never spells a wire byte, so a varint, packed-vs-
    // unpacked, sign-extension, or last-wins slip cannot cancel
    "q161_tfexample_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || ws[2] AS t01, " +
        "ws[2] || ' ' || ws[3] || ' ' || ws[4] AS t123 FROM w) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2) AS INTEGER) AS ok, " +
        "CAST(CASE WHEN m IN (0, 2) THEN 3 WHEN m = 1 THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_features, " +
        "CAST(CASE WHEN m IN (0, 1) THEN length(t01) WHEN m = 2 THEN " +
        "length(t123) ELSE NULL END AS INTEGER) AS text_chars, " +
        "CASE WHEN m IN (0, 1) THEN md5(t01) WHEN m = 2 THEN md5(t123) " +
        "ELSE NULL END AS text_md5, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 3 ELSE NULL END AS INTEGER) " +
        "AS n_ints, " +
        "CAST(CASE WHEN m IN (0, 2) THEN (doc_id % 128) + " +
        "(300 + doc_id % 1000) + 7 " +
        "WHEN m = 1 THEN (doc_id % 128) - (doc_id % 50 + 1) + 16500 " +
        "ELSE NULL END AS BIGINT) AS sum_ints, " +
        "CAST(CASE WHEN m = 0 THEN (doc_id % 8) * 250000 + 1500000 " +
        "WHEN m = 2 THEN (doc_id % 4) * 250000 " +
        "ELSE NULL END AS BIGINT) AS score_micros FROM p"),
    // q162: every field replays from doc_id arithmetic alone — the
    // oracle never spells an EBML byte, so a vint-length, marker-bit,
    // unknown-size, scale-default, or float-width slip cannot cancel
    "q162_ebml_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "CAST(320 + (doc_id % 4) * 160 AS INTEGER) AS w, " +
        "CAST(240 + (doc_id % 3) * 120 AS INTEGER) AS h FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_ebml, " +
        "CASE WHEN m IN (0, 2) THEN 'webm' WHEN m = 1 THEN 'matroska' " +
        "ELSE NULL END AS doctype, " +
        "CASE WHEN m IN (0, 1, 2) THEN w ELSE NULL END AS width, " +
        "CASE WHEN m IN (0, 1, 2) THEN h ELSE NULL END AS height, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 1 ELSE NULL END AS INTEGER) " +
        "AS n_video, " +
        "CAST(CASE WHEN m = 1 THEN 1 WHEN m IN (0, 2) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS n_audio, " +
        "CAST(CASE WHEN m = 0 THEN 10000 + doc_id % 5000 " +
        "WHEN m = 1 THEN 3000 + doc_id % 1000 " +
        "WHEN m = 2 THEN 7777 + doc_id % 777 " +
        "ELSE NULL END AS BIGINT) AS duration_ms FROM p"),
    // q163: both sample rows replay from corpus words + doc_id
    // arithmetic alone — the oracle never touches a tar byte, so a
    // key/ext split, interleave, or content-vs-name completeness slip
    // cannot cancel
    "q163_wds_samples" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 4 AS m, " +
        "array_to_string(list_slice(ws, 1, 3), ' ') AS t0, " +
        "array_to_string(list_slice(ws, 4, 6), ' ') AS t1 FROM w) " +
        "SELECT doc_id, 'd' || doc_id || '_0' AS sample_key, " +
        "CAST(3 AS INTEGER) AS n_parts, " +
        "CASE WHEN m = 2 THEN 'cls,seg.png,txt' ELSE 'cls,json,txt' END " +
        "AS exts, " +
        "CAST(CASE WHEN m = 3 THEN 0 ELSE 1 END AS INTEGER) AS complete, " +
        "md5(t0) AS txt_md5, CAST(length(t0) AS BIGINT) AS txt_bytes " +
        "FROM p " +
        "UNION ALL " +
        "SELECT doc_id, 'd' || doc_id || '_1' AS sample_key, " +
        "CAST(CASE WHEN m = 1 THEN 1 ELSE 2 END AS INTEGER) AS n_parts, " +
        "CASE WHEN m = 1 THEN 'txt' ELSE 'cls,txt' END AS exts, " +
        "CAST(CASE WHEN m = 1 THEN 0 ELSE 1 END AS INTEGER) AS complete, " +
        "md5(t1) AS txt_md5, CAST(length(t1) AS BIGINT) AS txt_bytes " +
        "FROM p"),
    // q164: counts, sums, and the first text's md5 replay from corpus
    // words + doc_id alone — the oracle never frames a byte, so a
    // zigzag, metadata-form, sync-verification, or refusal-split slip
    // in the walk cannot cancel; sum_delta is negative BY CONSTRUCTION
    // (a plain-varint reader decodes it astronomically wrong)
    "q164_avro_ingest" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || ws[2] || '#' || CAST(doc_id % 97 AS VARCHAR) AS p0 " +
        "FROM w) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_avro, " +
        "CASE WHEN m IN (0, 2) THEN 'null' WHEN m IN (1, 3) THEN 'deflate' " +
        "ELSE NULL END AS codec, " +
        "CAST(CASE WHEN m = 1 THEN 2 WHEN m IN (0, 2, 3) THEN 1 " +
        "ELSE NULL END AS INTEGER) AS n_blocks, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 3 WHEN m IN (2, 3) THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_records, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 0 WHEN m IN (2, 3) THEN 1 " +
        "ELSE NULL END AS INTEGER) AS truncated, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 30 * doc_id + 3 " +
        "WHEN m IN (2, 3) THEN 20 * doc_id + 1 " +
        "ELSE NULL END AS BIGINT) AS sum_ids, " +
        "CAST(CASE WHEN m IN (0, 1) THEN -(3 * (doc_id % 97) + 3) " +
        "WHEN m IN (2, 3) THEN -(2 * (doc_id % 97) + 1) " +
        "ELSE NULL END AS BIGINT) AS sum_delta, " +
        "CASE WHEN m IN (0, 1, 2, 3) THEN md5(p0) ELSE NULL END " +
        "AS first_md5 FROM p"),
    // q165: every triage field replays from corpus words + doc_id
    // alone — the oracle never frames a byte, so an FCS-offset,
    // single-segment, RLE-advance, or skippable-walk slip cannot
    // cancel (m=1's id%5 is 1 by construction, so its RLE run is a
    // fixed 41 and the declared content is 341 + doc_id % 7)
    "q165_zstd_triage" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "least(length(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR)), 200) AS lp FROM w) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_zstd, " +
        "CAST(CASE WHEN m = 2 THEN 2 WHEN m IN (0, 1) THEN 1 " +
        "WHEN m = 3 THEN 0 ELSE NULL END AS INTEGER) AS n_frames, " +
        "CAST(CASE WHEN m = 1 THEN 1 WHEN m IN (0, 2, 3) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS n_skippable, " +
        "CAST(CASE WHEN m = 0 THEN lp WHEN m = 1 THEN 341 + doc_id % 7 " +
        "WHEN m = 2 THEN 2 * lp WHEN m = 3 THEN 0 " +
        "ELSE NULL END AS BIGINT) AS content_size, " +
        "CAST(CASE WHEN m = 0 THEN 1 WHEN m IN (1, 2, 3) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS has_checksum, " +
        "CAST(CASE WHEN m = 1 THEN 10 + doc_id % 8 " +
        "ELSE NULL END AS INTEGER) AS window_log, " +
        "CAST(CASE WHEN m = 1 THEN 1000 + doc_id % 1000 " +
        "ELSE NULL END AS BIGINT) AS dict_id, " +
        "CAST(CASE WHEN m = 3 THEN 1 WHEN m IN (0, 1, 2) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS truncated FROM p"),
    // q166: the STRONGEST oracle shape available — DuckDB counts the
    // actual rows by scanning the same parquet files the engine's
    // footer walk introspects without a scan, so a thrift-delta,
    // zigzag, or schema-root slip cannot agree with an independent
    // engine's full read; column counts replay the corpus schema
    // contract (FIXTURES.md §B: events 6, documents 5, embeddings 3)
    "q166_parquet_footer" ->
      ("SELECT 'events' AS tbl, CAST(1 AS INTEGER) AS is_parquet, " +
        "CAST(count(*) AS BIGINT) AS num_rows, " +
        "CAST(6 AS INTEGER) AS n_columns, " +
        "CAST(1 AS INTEGER) AS verified FROM events " +
        "UNION ALL SELECT 'documents', 1, count(*), 5, 1 FROM documents " +
        "UNION ALL SELECT 'embeddings', 1, count(*), 3, 1 FROM embeddings"),
    // q167: every expected decode replays from chr() code points
    // alone (the ACE constants are registry-produced real-world
    // spellings — no encoder exists in the repo, so the decode cannot
    // be self-consistent-but-wrong); the hostile overflow label must
    // refuse the WHOLE host
    "q167_idn_hosts" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m FROM documents), " +
        "h AS (SELECT doc_id, m, CASE " +
        "WHEN m = 1 THEN 'xn--mnchen-3ya.site' || " +
        "CAST(doc_id % 50 AS VARCHAR) || '.de' " +
        "WHEN m = 2 THEN 'docs' || CAST(doc_id % 30 AS VARCHAR) || " +
        "'.xn--fiqs8s' " +
        "WHEN m = 3 THEN 'xn--p1ai.xn--bcher-kva.org' " +
        "WHEN m = 4 THEN 'xn--zzz999999999a.spam' || " +
        "CAST(doc_id % 9 AS VARCHAR) || '.com' " +
        "ELSE 'www.example' || CAST(doc_id % 100 AS VARCHAR) || '.com' " +
        "END AS host FROM p) " +
        "SELECT doc_id, host, " +
        "CAST(CASE WHEN m = 3 THEN 2 WHEN m IN (1, 2, 4) THEN 1 " +
        "ELSE 0 END AS INTEGER) AS n_idn_labels, " +
        "CASE " +
        "WHEN m = 0 THEN host " +
        "WHEN m = 1 THEN 'm' || chr(252) || 'nchen.site' || " +
        "CAST(doc_id % 50 AS VARCHAR) || '.de' " +
        "WHEN m = 2 THEN 'docs' || CAST(doc_id % 30 AS VARCHAR) || '.' || " +
        "chr(20013) || chr(22269) " +
        "WHEN m = 3 THEN chr(1088) || chr(1092) || '.b' || chr(252) || " +
        "'cher.org' " +
        "ELSE NULL END AS uni_host, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS idn_ok FROM h"),
    // q168: q127's oracle union one layer deeper — every luma number
    // replays from the residue channel maps (never a byte), so the
    // whole page→comment-strip→extract→base64→magic-route→decode
    // chain must land on independently derived stats; class 2's
    // declared image/png over GIF bytes pins mime-vs-magic precedence
    "q168_datauri_harvest" ->
      ("WITH ja AS (SELECT doc_id, " +
        "CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS w, " +
        "CAST((doc_id % 2 + 1) * 8 AS INTEGER) AS h, " +
        "list_aggregate(pix, 'min') AS mn, list_aggregate(pix, 'max') AS mx, " +
        "64 * list_aggregate(pix, 'sum') AS s FROM (SELECT doc_id, " +
        "list_transform(range(0, CAST((doc_id % 3 + 1) * (doc_id % 2 + 1) AS BIGINT)), " +
        "k -> ((doc_id*31 + k*17) % 251) - 125 + 128) AS pix " +
        "FROM documents WHERE doc_id % 4 = 0)), " +
        "pa AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, " +
        "min(luma) AS mn, max(luma) AS mx, sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 4 = 1) GROUP BY doc_id), " +
        "ga AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, " +
        "min(luma) AS mn, max(luma) AS mx, sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + ((doc_id + x*3 + r*5) % 32)) % 256) + " +
        "587 * ((doc_id*3 + ((doc_id + x*3 + r*5) % 32)*5) % 256) + " +
        "114 * ((doc_id + ((doc_id + x*3 + r*5) % 32)*7) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 4 = 2) GROUP BY doc_id) " +
        "SELECT d.doc_id, " +
        "CAST(CASE WHEN d.doc_id % 4 = 3 THEN 0 ELSE 1 END AS INTEGER) " +
        "AS n_data_uris, " +
        "CASE d.doc_id % 4 WHEN 0 THEN 'image/jpeg' WHEN 3 THEN NULL " +
        "ELSE 'image/png' END AS declared_mime, " +
        "CASE d.doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' " +
        "WHEN 2 THEN 'gif' ELSE NULL END AS format, " +
        "CAST(coalesce(ja.w, pa.w, ga.w) AS INTEGER) AS width, " +
        "CAST(coalesce(ja.h, pa.h, ga.h) AS INTEGER) AS height, " +
        "CAST(coalesce(ja.mn, pa.mn, ga.mn) AS INTEGER) AS min_luma, " +
        "CAST(coalesce(ja.mx, pa.mx, ga.mx) AS INTEGER) AS max_luma, " +
        "CAST(coalesce(ja.s, pa.s, ga.s) AS BIGINT) AS sum_luma " +
        "FROM documents d LEFT JOIN ja ON d.doc_id = ja.doc_id " +
        "LEFT JOIN pa ON d.doc_id = pa.doc_id " +
        "LEFT JOIN ga ON d.doc_id = ga.doc_id"),
    // q169: every count replays from the base's [A-Za-z] tally (the
    // corpus is pure ASCII, verified) plus the planted chr()
    // arithmetic — the oracle never buckets a code point, so a range,
    // word-split, or tie-preference slip in the kernel cannot cancel
    "q169_script_mix" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 AS m, " +
        "length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g')) " +
        "AS b FROM documents), " +
        "c AS (SELECT doc_id, m, " +
        "CAST(b + CASE WHEN m = 5 THEN 4 ELSE 0 END AS BIGINT) AS lat, " +
        "CAST(CASE WHEN m = 1 THEN 6 WHEN m = 5 THEN 2 ELSE 0 END " +
        "AS BIGINT) AS cyr, " +
        "CAST(CASE WHEN m = 2 THEN 5 ELSE 0 END AS BIGINT) AS grk, " +
        "CAST(CASE WHEN m = 3 THEN 5 ELSE 0 END AS BIGINT) AS cjk, " +
        "CAST(CASE WHEN m = 4 THEN 5 ELSE 0 END AS BIGINT) AS ara " +
        "FROM p) " +
        "SELECT doc_id, lat AS n_latin, cyr AS n_cyrillic, grk AS n_greek, " +
        "cjk AS n_cjk, ara AS n_arabic, " +
        "CAST((CASE WHEN lat > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN m IN (1, 2, 3, 4, 5) THEN 1 ELSE 0 END) AS INTEGER) " +
        "AS n_scripts, " +
        "CASE WHEN lat = 0 AND m = 0 THEN NULL " +
        "WHEN lat >= greatest(cyr, grk, cjk, ara) THEN 'latin' " +
        "WHEN cyr >= greatest(grk, cjk, ara) THEN 'cyrillic' " +
        "WHEN grk >= greatest(cjk, ara) THEN 'greek' " +
        "WHEN cjk >= ara THEN 'cjk' ELSE 'arabic' END AS dominant_script, " +
        "CAST(CASE WHEN m = 5 THEN 1 ELSE 0 END AS INTEGER) " +
        "AS n_mixed_words FROM c"),
    // q170: the oracle IS the brute force the engine avoids — an
    // O(n²) levenshtein cross join over the same synthesized titles —
    // so the FastSS banding's claimed exactness for distance <= 1 is
    // value-checked pair-by-pair against a structurally different
    // formulation (a missed band or a phantom candidate cannot cancel)
    "q170_fuzzy_title_dedup" ->
      ("WITH t AS (SELECT doc_id, CASE doc_id % 3 " +
        "WHEN 1 THEN substr(b, 1, length(b) - 1) || 'z' " +
        "WHEN 2 THEN b || 'q' ELSE b END AS title " +
        "FROM (SELECT doc_id, 'doc ' || " +
        "substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 8) AS b " +
        "FROM documents WHERE doc_id < 2000)) " +
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "AND levenshtein(a.title, b.title) <= 1"),
    // q171: the oracle replays the G.711 expansion ALGEBRA itself —
    // complement, XOR 0x55, segment shifts, the A-law segment-0 rule —
    // in independent SQL integer arithmetic over the synthesized byte
    // ramp, so a companding slip in the kernel cannot cancel
    "q171_g711_audio" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "40 + doc_id % 17 AS nb FROM documents), " +
        "q AS (SELECT doc_id, m, CASE WHEN m = 2 THEN nb + 1 - (nb % 2) " +
        "ELSE nb - (nb % 2) END AS n FROM p), " +
        "v AS (SELECT doc_id, m, n, (doc_id * 7 + k * 13) % 256 AS b " +
        "FROM q, UNNEST(range(0, n)) AS t(k) WHERE m IN (0, 1, 2)), " +
        "e AS (SELECT doc_id, m, n, CASE WHEN m = 0 THEN " +
        "((((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8))) - 132 " +
        "ELSE (CASE WHEN ((xor(b, 85) // 16) % 8) = 0 " +
        "THEN (xor(b, 85) % 16) * 16 + 8 " +
        "WHEN ((xor(b, 85) // 16) % 8) = 1 " +
        "THEN (xor(b, 85) % 16) * 16 + 264 " +
        "ELSE ((xor(b, 85) % 16) * 16 + 264) * " +
        "(1 << (((xor(b, 85) // 16) % 8) - 1)) END) END AS mag FROM v), " +
        "s AS (SELECT doc_id, any_value(m) AS m, any_value(n) AS n, " +
        "sum(mag) AS sm, max(mag) AS pk FROM e GROUP BY doc_id) " +
        "SELECT p.doc_id, " +
        "CASE WHEN p.m = 0 THEN 'ulaw' WHEN p.m IN (1, 2) THEN 'alaw' " +
        "ELSE NULL END AS codec, " +
        "CAST(s.n AS BIGINT) AS n_samples, " +
        "CAST(s.sm AS BIGINT) AS sum_abs, " +
        "CAST(s.pk AS INTEGER) AS peak_abs, " +
        "CAST((s.sm * 100) // s.n AS BIGINT) AS mean_x100 " +
        "FROM p LEFT JOIN s ON p.doc_id = s.doc_id"),
    // q172: every stat replays pixel-by-pixel from the residue channel
    // maps (q59's algebra for the RGB class) — the oracle never reads
    // a header token or a raster byte, so a comment-skip, ragged-line,
    // one-whitespace, or big-endian-16-bit slip cannot cancel; the
    // ASCII class must land on the binary class's numbers exactly
    "q172_pnm_pixels" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 AS m, " +
        "doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h FROM documents), " +
        "g AS (SELECT doc_id, min(l) AS mn, max(l) AS mx, sum(l) AS sm " +
        "FROM (SELECT doc_id, (doc_id*2 + x + r*11) % 256 AS l " +
        "FROM p, UNNEST(range(0, w)) AS tx(x), " +
        "UNNEST(range(0, h)) AS tr(r) WHERE m IN (0, 2)) GROUP BY doc_id), " +
        "g16 AS (SELECT doc_id, min(l) AS mn, max(l) AS mx, sum(l) AS sm " +
        "FROM (SELECT doc_id, (doc_id*2 + x + r*11) % 1001 AS l " +
        "FROM p, UNNEST(range(0, w)) AS tx(x), " +
        "UNNEST(range(0, h)) AS tr(r) WHERE m = 3) GROUP BY doc_id), " +
        "c AS (SELECT doc_id, min(l) AS mn, max(l) AS mx, sum(l) AS sm " +
        "FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS l " +
        "FROM p, UNNEST(range(0, w)) AS tx(x), " +
        "UNNEST(range(0, h)) AS tr(r) WHERE m = 1) GROUP BY doc_id) " +
        "SELECT p.doc_id, " +
        "CASE p.m WHEN 0 THEN 'P5' WHEN 1 THEN 'P6' WHEN 2 THEN 'P2' " +
        "WHEN 3 THEN 'P5' WHEN 4 THEN 'P5' ELSE NULL END AS format, " +
        "CAST(CASE WHEN p.m <= 4 THEN p.w ELSE NULL END AS INTEGER) " +
        "AS width, " +
        "CAST(CASE WHEN p.m <= 4 THEN p.h ELSE NULL END AS INTEGER) " +
        "AS height, " +
        "CAST(CASE WHEN p.m = 3 THEN 1000 WHEN p.m <= 4 THEN 255 " +
        "ELSE NULL END AS INTEGER) AS maxval, " +
        "CAST(coalesce(g.mn, g16.mn, c.mn) AS INTEGER) AS min_luma, " +
        "CAST(coalesce(g.mx, g16.mx, c.mx) AS INTEGER) AS max_luma, " +
        "CAST(coalesce(g.sm, g16.sm, c.sm) AS BIGINT) AS sum_luma " +
        "FROM p LEFT JOIN g ON p.doc_id = g.doc_id AND p.m <> 4 " +
        "LEFT JOIN g16 ON p.doc_id = g16.doc_id " +
        "LEFT JOIN c ON p.doc_id = c.doc_id"),
    // q173: every snapshot fact replays from doc_id arithmetic alone —
    // the oracle never parses a JSON action, so a last-writer-wins,
    // re-add-after-remove, latest-metaData, or quarantine slip in the
    // replay cannot cancel
    "q173_deltalog_replay" ->
      ("WITH p AS (SELECT doc_id, doc_id % 3 AS m3, doc_id % 5 AS m5, " +
        "doc_id % 7 AS m7, (doc_id % 97 + 1) * 1000 AS base " +
        "FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN m3 = 0 THEN 3 ELSE 2 END AS INTEGER) AS n_versions, " +
        "CAST(CASE WHEN m3 = 0 THEN 4 ELSE 3 END AS INTEGER) AS n_live, " +
        "CAST(1 AS INTEGER) AS n_tombstones, " +
        "CAST(CASE WHEN m3 = 0 THEN 4 * base + 10 ELSE 3 * base + 5 END " +
        "AS BIGINT) AS total_bytes, " +
        "'meta-' || CAST(CASE WHEN m5 = 2 THEN doc_id % 50 + 100 " +
        "ELSE doc_id % 50 END AS VARCHAR) AS latest_meta_id, " +
        "CAST(CASE WHEN m7 = 5 THEN 1 ELSE 0 END AS INTEGER) " +
        "AS n_bad_lines FROM p"),
    // q174: q168's oracle union at the shard layer — caption md5s from
    // corpus words, pixel stats from the three decoder families'
    // residue formulas — so the tar→assemble→route→decode chain must
    // land on numbers derived without touching a byte; the caption-only
    // n-sample must assemble separately with no decode columns
    "q174_media_shards" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 4 AS m, " +
        "array_to_string(list_slice(ws, 1, 4), ' ') AS c0, " +
        "array_to_string(list_slice(ws, 5, 7), ' ') AS c1 FROM w), " +
        "ja AS (SELECT doc_id, " +
        "CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS w, " +
        "CAST((doc_id % 2 + 1) * 8 AS INTEGER) AS h, " +
        "64 * list_aggregate(pix, 'sum') AS s FROM (SELECT doc_id, " +
        "list_transform(range(0, CAST((doc_id % 3 + 1) * (doc_id % 2 + 1) AS BIGINT)), " +
        "k -> ((doc_id*31 + k*17) % 251) - 125 + 128) AS pix " +
        "FROM documents WHERE doc_id % 4 = 0)), " +
        "pa AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, sum(luma) AS s " +
        "FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 4 = 1) GROUP BY doc_id), " +
        "ga AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, sum(luma) AS s " +
        "FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + ((doc_id + x*3 + r*5) % 32)) % 256) + " +
        "587 * ((doc_id*3 + ((doc_id + x*3 + r*5) % 32)*5) % 256) + " +
        "114 * ((doc_id + ((doc_id + x*3 + r*5) % 32)*7) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 4 = 2) GROUP BY doc_id) " +
        "SELECT p.doc_id, 'm' || p.doc_id AS sample_key, " +
        "CAST(CASE WHEN p.m = 3 THEN 1 ELSE 2 END AS INTEGER) AS n_parts, " +
        "CASE p.m WHEN 0 THEN 'jpg,txt' WHEN 1 THEN 'png,txt' " +
        "WHEN 2 THEN 'gif,txt' ELSE 'txt' END AS exts, " +
        "CAST(CASE WHEN p.m = 3 THEN 0 ELSE 1 END AS INTEGER) AS has_image, " +
        "md5(p.c0) AS caption_md5, " +
        "CASE p.m WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif' " +
        "ELSE NULL END AS format, " +
        "CAST(coalesce(ja.w, pa.w, ga.w) AS INTEGER) AS width, " +
        "CAST(coalesce(ja.h, pa.h, ga.h) AS INTEGER) AS height, " +
        "CAST(coalesce(ja.s, pa.s, ga.s) AS BIGINT) AS sum_luma " +
        "FROM p LEFT JOIN ja ON p.doc_id = ja.doc_id " +
        "LEFT JOIN pa ON p.doc_id = pa.doc_id " +
        "LEFT JOIN ga ON p.doc_id = ga.doc_id " +
        "UNION ALL " +
        "SELECT doc_id, 'n' || doc_id, CAST(1 AS INTEGER), 'txt', " +
        "CAST(0 AS INTEGER), md5(c1), NULL, NULL, NULL, NULL FROM p"),
    // q175: every field replays from corpus words + doc_id arithmetic —
    // the oracle never frames a CBOR byte, so a head-width, zigzag-less
    // negint, indefinite-chunk, tag-transparency, or last-wins slip
    // cannot cancel; the duplicate-key decoy losing is part of the hash
    "q175_cbor_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || ws[2] || '#' || CAST(doc_id % 97 AS VARCHAR) AS p0 " +
        "FROM w) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2) AS INTEGER) AS ok, " +
        "CAST(CASE WHEN m = 2 THEN doc_id + 8589934592 " +
        "WHEN m IN (0, 1) THEN doc_id * 1000 + 7 " +
        "ELSE NULL END AS BIGINT) AS id_val, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN -(doc_id % 97) - 5 " +
        "ELSE NULL END AS BIGINT) AS delta_val, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 3 ELSE NULL END AS INTEGER) " +
        "AS n_tags, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN " +
        "doc_id % 5 + doc_id % 7 + doc_id % 11 ELSE NULL END AS BIGINT) " +
        "AS sum_tags, " +
        "CASE WHEN m IN (0, 1, 2) THEN md5(p0) ELSE NULL END AS text_md5 " +
        "FROM p"),
    // q176: every field replays from doc_id arithmetic alone — the
    // 0-means-256 rule, the doubled-DIB-height cross-check, the
    // past-EOF liar costing exactly one valid entry, and the
    // cut-directory refusal are all in the hash
    "q176_ico_meta" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_ico, " +
        "CAST(CASE WHEN m = 0 THEN 2 WHEN m = 1 THEN 1 WHEN m = 2 THEN 3 " +
        "WHEN m = 3 THEN 2 ELSE NULL END AS INTEGER) AS n_images, " +
        "CAST(CASE WHEN m = 0 THEN 2 WHEN m = 1 THEN 1 WHEN m = 2 THEN 2 " +
        "ELSE NULL END AS INTEGER) AS n_valid, " +
        "CAST(CASE WHEN m = 0 THEN 32 WHEN m = 1 THEN 256 " +
        "WHEN m = 2 THEN 48 ELSE NULL END AS INTEGER) AS max_width, " +
        "CAST(CASE WHEN m = 0 THEN 32 WHEN m = 1 THEN 32 WHEN m = 2 THEN 24 " +
        "ELSE NULL END AS INTEGER) AS max_bpp, " +
        "CAST(CASE WHEN m = 0 THEN 0 WHEN m IN (1, 2) THEN 1 " +
        "ELSE NULL END AS INTEGER) AS has_png FROM p"),
    // q177: the oracle recounts sentences, words, vowel-run syllables
    // and distinct tokens with its own regex engine and replays the
    // integer x100 grade formula — a counting or floor-division slip
    // cannot cancel
    "q177_readability" ->
      ("WITH w AS (SELECT doc_id, text, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "c AS (SELECT doc_id, " +
        "greatest(len(regexp_extract_all(coalesce(text, ''), " +
        "'[.!?]+')), 1) AS s, " +
        "len(ws) AS wn, " +
        "len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) + " +
        "len(list_filter(ws, x -> NOT regexp_matches(x, '[aeiouy]'))) AS sy, " +
        "len(list_distinct(ws)) AS nd FROM w) " +
        "SELECT doc_id, CAST(s AS BIGINT) AS n_sentences, " +
        "CAST(wn AS BIGINT) AS n_words, CAST(sy AS BIGINT) AS n_syllables, " +
        "CAST(CASE WHEN wn > 0 THEN 39 * wn // s + 1180 * sy // wn - 1559 " +
        "ELSE NULL END AS BIGINT) AS fk_grade_x100, " +
        "CAST(CASE WHEN wn > 0 THEN nd * 100 // wn ELSE NULL END AS BIGINT) " +
        "AS ttr_x100 FROM c"),
    // q178: the oracle replays the whole graph through DuckDB joins
    // over the SAME link-CTE prefix q96 splices — edges (with the hub
    // residue every site links), mutual pairs, and the
    // orientation-FREE ordered (a < b < c) triangle join: the count
    // is orientation-invariant, so a slip in the engine's
    // degree-ordered bookkeeping cannot cancel
    "q178_host_graph" ->
      ("WITH " + linkCtes + ", " +
        "e0 AS (SELECT DISTINCT 'site' || (doc_id % 40) || " +
        "'.example.com' AS src, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS dst " +
        "FROM c WHERE canonical_url IS NOT NULL " +
        "UNION SELECT DISTINCT 'site' || (doc_id % 40) || " +
        "'.example.com' AS src, 'site3hub.example.com' AS dst " +
        "FROM documents), " +
        "e2 AS (SELECT * FROM e0 WHERE src <> dst), " +
        "v AS (SELECT src AS h FROM e2 UNION SELECT dst FROM e2), " +
        "u AS (SELECT DISTINCT least(src, dst) AS a, " +
        "greatest(src, dst) AS b FROM e2), " +
        "m AS (SELECT count(*) AS nm FROM e2 x JOIN e2 y " +
        "ON x.src = y.dst AND x.dst = y.src WHERE x.src < x.dst), " +
        "t AS (SELECT count(*) AS nt FROM u p JOIN u q ON p.b = q.a " +
        "JOIN u r ON r.a = p.a AND r.b = q.b) " +
        "SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_hosts, " +
        "CAST((SELECT count(*) FROM e2) AS BIGINT) AS n_edges, " +
        "CAST(m.nm AS BIGINT) AS n_mutual, " +
        "CAST(t.nt AS BIGINT) AS n_triangles, " +
        "CAST(200 * m.nm // (SELECT count(*) FROM e2) AS BIGINT) " +
        "AS reciprocity_x100 FROM m, t"),
    // q179: every verdict replays from doc_id arithmetic alone — the
    // s-maxage-over-max-age precedence, the invalid-value fall-through,
    // the no-store/no-cache split, the IMF-fixdate round trip and the
    // /10 heuristic are all in the hash
    "q179_cache_freshness" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 AS m, " +
        "1700000000 + (doc_id % 1000) * 37 AS d FROM documents) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN m = 3 THEN 0 ELSE 1 END AS INTEGER) AS cacheable, " +
        "CAST(CASE WHEN m = 5 THEN 1 ELSE 0 END AS INTEGER) AS must_reval, " +
        "CASE m WHEN 0 THEN 'max-age' WHEN 1 THEN 's-maxage' " +
        "WHEN 2 THEN 'expires' WHEN 3 THEN 'no-store' " +
        "WHEN 4 THEN 'heuristic' ELSE 'expires' END AS method, " +
        "CAST(CASE m WHEN 0 THEN 60 + doc_id % 600 " +
        "WHEN 1 THEN 120 + doc_id % 300 " +
        "WHEN 2 THEN 3600 + doc_id % 1800 " +
        "WHEN 3 THEN 0 " +
        "WHEN 4 THEN 8640 * (1 + doc_id % 10) " +
        "ELSE 600 + doc_id % 60 END AS BIGINT) AS lifetime_s, " +
        "CAST(CASE WHEN m = 3 THEN NULL ELSE d + (CASE m " +
        "WHEN 0 THEN 60 + doc_id % 600 WHEN 1 THEN 120 + doc_id % 300 " +
        "WHEN 2 THEN 3600 + doc_id % 1800 " +
        "WHEN 4 THEN 8640 * (1 + doc_id % 10) " +
        "ELSE 600 + doc_id % 60 END) END AS BIGINT) AS expiry_epoch FROM p"),
    // q181: the oracle is the TEXTBOOK correlated spelling — EXISTS /
    // NOT EXISTS subqueries DuckDB decorrelates its own way — against
    // the engine's semi/anti join plan, so a quantifier-polarity,
    // inequality, or correlation slip cannot cancel
    "q181_exists_wait" ->
      ("SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait " +
        "FROM supplier s, lineitem l1, orders o " +
        "WHERE s.s_suppkey = l1.l_suppkey " +
        "AND o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F' " +
        "AND l1.l_returnflag = 'R' " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') " +
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20"),
    // q182: the oracle rebuilds the planted digits, closes the Luhn
    // check itself in SQL arithmetic, and reassembles the redacted
    // text per class — a doubling-parity, boundary-guard, separator,
    // or evidence-preservation slip cannot cancel
    "q182_card_scan" ->
      ("WITH b AS (SELECT doc_id, doc_id % 5 AS m, " +
        "regexp_replace(coalesce(text, ''), '[0-9]', '', 'g') AS base " +
        "FROM documents), " +
        "k AS (SELECT doc_id, m, base, " +
        "array_to_string(list_transform(range(0, 15), " +
        "i -> CAST((doc_id*7 + i*3) % 10 AS VARCHAR)), '') AS pre, " +
        "list_aggregate(list_transform(range(0, 15), i -> CASE " +
        "WHEN i % 2 = 0 THEN CASE WHEN 2*((doc_id*7 + i*3) % 10) > 9 " +
        "THEN 2*((doc_id*7 + i*3) % 10) - 9 " +
        "ELSE 2*((doc_id*7 + i*3) % 10) END " +
        "ELSE (doc_id*7 + i*3) % 10 END), 'sum') AS s15 FROM b), " +
        "c AS (SELECT doc_id, m, base, pre, " +
        "(10 - s15 % 10) % 10 AS chk FROM k), " +
        "t AS (SELECT doc_id, m, base, pre || chk AS card, " +
        "pre || ((chk + 1) % 10) AS bad FROM c) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN m IN (1, 2, 3) THEN 1 ELSE 0 END AS INTEGER) " +
        "AS n_candidates, " +
        "CAST(CASE WHEN m IN (1, 3) THEN 1 ELSE 0 END AS INTEGER) " +
        "AS n_valid_cards, " +
        "md5(CASE " +
        "WHEN m IN (1, 3) THEN base || ' card [CARD] end' " +
        "WHEN m = 2 THEN base || ' card ' || bad || ' end' " +
        "WHEN m = 4 THEN base || ' num ' || card || '123 end' " +
        "ELSE base END) AS redacted_md5 FROM t"),
    // q184: the router's manifest replays per class from corpus words
    // + doc_id arithmetic — gzip's md5 proves the one DECODED path,
    // the zstd/xz numbers come from their residue formulas, and a
    // routing slip lands on another family's columns (q127's stance)
    "q184_compress_router" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || ws[2] || '#' || CAST(doc_id % 97 AS VARCHAR) AS p0 " +
        "FROM w) " +
        "SELECT doc_id, " +
        "CASE m WHEN 0 THEN 'gzip' WHEN 1 THEN 'zstd' WHEN 2 THEN 'xz' " +
        "WHEN 3 THEN 'bzip2' ELSE NULL END AS format, " +
        "CAST(CASE WHEN m = 0 THEN 1 WHEN m = 1 THEN 1 " +
        "WHEN m = 2 THEN (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END) " +
        "ELSE NULL END AS INTEGER) AS n_units, " +
        "CAST(CASE WHEN m = 1 THEN least(length(p0), 200) " +
        "WHEN m = 2 THEN (CASE WHEN doc_id % 2 = 0 THEN 40 + doc_id % 60 " +
        "ELSE 3000 + 3 * (doc_id % 500) + 3 END) " +
        "ELSE NULL END AS BIGINT) AS declared_size, " +
        "CASE WHEN m IN (0, 3) THEN 'crc32' WHEN m = 1 THEN 'xxh64' " +
        "WHEN m = 2 THEN (CASE WHEN doc_id % 2 = 0 THEN 'crc32' " +
        "ELSE 'crc64' END) ELSE NULL END AS check_kind, " +
        "CASE WHEN m = 0 THEN md5(p0) " +
        "WHEN m IN (1, 3) THEN md5(left(p0, 200)) ELSE NULL END " +
        "AS content_md5, " +
        "CAST(CASE WHEN m = 3 THEN 9 ELSE NULL END AS INTEGER) " +
        "AS bz_level FROM p"),
    // q183: the oracle replays the SAME rank-selection spelling
    // (row_number at position (n+1)//2 with the event-id tiebreak)
    // through DuckDB windows — never an interpolated quantile — so a
    // selection, tie, floor-fold, or fence slip cannot cancel
    "q183_mad_outliers" ->
      ("WITH v AS (SELECT event_type, event_id, " +
        "CAST(floor(value * 100) AS BIGINT) AS vi FROM events " +
        "WHERE value IS NOT NULL), " +
        "r AS (SELECT event_type, event_id, vi, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY vi, event_id) " +
        "AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM v), " +
        "m AS (SELECT event_type, " +
        "max(CASE WHEN rn = (n + 1) // 2 THEN vi END) AS med FROM r " +
        "GROUP BY event_type), " +
        "d AS (SELECT r.event_type, r.event_id, r.vi, r.n, m.med, " +
        "abs(r.vi - m.med) AS dd FROM r JOIN m " +
        "ON r.event_type = m.event_type), " +
        "r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
        "ORDER BY dd, event_id) AS rd FROM d), " +
        "md AS (SELECT event_type, " +
        "max(CASE WHEN rd = (n + 1) // 2 THEN dd END) AS mad FROM r2 " +
        "GROUP BY event_type) " +
        "SELECT r2.event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(max(r2.med) AS BIGINT) AS median_x100, " +
        "CAST(max(md.mad) AS BIGINT) AS mad_x100, " +
        "CAST(sum(CASE WHEN r2.dd > 3 * md.mad THEN 1 ELSE 0 END) " +
        "AS INTEGER) AS n_outliers " +
        "FROM r2 JOIN md ON r2.event_type = md.event_type " +
        "GROUP BY r2.event_type"),
    // q185: every count replays from doc_id arithmetic alone — the
    // vtable-absence defaults, the union dispatch (dictionary frames
    // past WITHOUT counting), the i64 row sums, and the truncation
    // split are all in the hash
    "q185_arrow_ipc" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "10 + doc_id % 90 AS r0, 10 + (doc_id + 1) % 90 AS r1, " +
        "64 + (doc_id % 32) * 8 AS bl FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_arrow, " +
        "CAST(CASE WHEN m = 1 THEN 5 WHEN m IN (0, 3) THEN 3 " +
        "WHEN m = 2 THEN 0 ELSE NULL END AS INTEGER) AS n_fields, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 2 WHEN m IN (2, 3) THEN 1 " +
        "ELSE NULL END AS INTEGER) AS n_batches, " +
        "CAST(CASE WHEN m IN (0, 1) THEN r0 + r1 WHEN m IN (2, 3) THEN r0 " +
        "ELSE NULL END AS BIGINT) AS total_rows, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 2 * bl WHEN m IN (2, 3) THEN bl " +
        "ELSE NULL END AS BIGINT) AS body_bytes, " +
        "CAST(CASE WHEN m = 3 THEN 1 WHEN m IN (0, 1, 2) THEN 0 " +
        "ELSE NULL END AS INTEGER) AS truncated FROM p"),
    // q186: every field replays from doc_id arithmetic alone — the
    // two-byte magic tag, the packed≡unpacked subtype count, the
    // stripe-sum cross-check catching the mode-1 lying footer, the
    // scope refusal on zlib, and the past-EOF postscript are all in
    // the hash
    "q186_orc_footer" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "100 + doc_id % 900 AS r0, 100 + (doc_id + 1) % 900 AS r1, " +
        "100 + (doc_id + 2) % 900 AS r2, " +
        "CAST(doc_id % 6 + 2 AS INTEGER) AS nc FROM documents) " +
        "SELECT doc_id, " +
        "CAST(m IN (0, 1, 2, 3) AS INTEGER) AS is_orc, " +
        "CASE WHEN m IN (0, 1) THEN 'none' WHEN m = 2 THEN 'zlib' " +
        "ELSE NULL END AS compression, " +
        "CAST(CASE WHEN m = 0 THEN 2 WHEN m = 1 THEN 3 " +
        "ELSE NULL END AS INTEGER) AS n_stripes, " +
        "CAST(CASE WHEN m IN (0, 1) THEN nc ELSE NULL END AS INTEGER) " +
        "AS n_columns, " +
        "CAST(CASE WHEN m = 0 THEN r0 + r1 " +
        "WHEN m = 1 THEN r0 + r1 + r2 + 7 " +
        "ELSE NULL END AS BIGINT) AS num_rows, " +
        "CAST(CASE WHEN m = 0 THEN 1 WHEN m = 1 THEN 0 " +
        "ELSE NULL END AS INTEGER) AS verified FROM p"),
    // q187: four wire grammars, one oracle union — every census
    // column replays from doc_id arithmetic per class, so a routing
    // slip between Parquet/ORC/Avro/Arrow lands on another grammar's
    // numbers and cannot cancel
    "q187_lake_census" ->
      ("WITH p AS (SELECT doc_id, doc_id % 5 AS m FROM documents) " +
        "SELECT doc_id, " +
        "CASE m WHEN 0 THEN 'parquet' WHEN 1 THEN 'orc' WHEN 2 THEN 'avro' " +
        "WHEN 3 THEN 'arrow' ELSE NULL END AS format, " +
        "CAST(CASE m WHEN 0 THEN 500 + doc_id % 500 " +
        "WHEN 1 THEN 200 + doc_id % 900 + (doc_id + 1) % 900 " +
        "WHEN 2 THEN 3 " +
        "WHEN 3 THEN 20 + doc_id % 90 + (doc_id + 1) % 90 " +
        "ELSE NULL END AS BIGINT) AS num_rows, " +
        "CAST(CASE m WHEN 0 THEN doc_id % 7 + 2 " +
        "WHEN 1 THEN doc_id % 6 + 2 WHEN 2 THEN 4 WHEN 3 THEN 3 " +
        "ELSE NULL END AS INTEGER) AS n_columns, " +
        "CAST(CASE WHEN m IN (0, 1) THEN 1 ELSE NULL END AS INTEGER) " +
        "AS verified FROM p"),
    // q133: the oracle re-synthesizes the expected text from corpus
    // words alone (8-word paragraphs, the entity drill and field-code
    // paragraph as decoded constants, the br class's split paragraph 0)
    // — it never builds an XML byte, so a run-join, whitespace,
    // entity, or field-exclusion slip in the extractor cannot cancel;
    // the paragraph count replays the pagination arithmetic against
    // the independent meta walk
    "q133_docx_extract" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "ln AS (SELECT doc_id, ws, list_transform(" +
        "range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) AS paras " +
        "FROM w), " +
        "br AS (SELECT doc_id, CASE WHEN doc_id % 5 = 3 AND len(ws) > 3 THEN " +
        "list_concat([array_to_string(list_slice(ws, 1, 3), ' ') || chr(10) " +
        "|| ' ' || array_to_string(list_slice(ws, 4, 8), ' ')], " +
        "list_slice(paras, 2, len(paras))) ELSE paras END AS paras FROM ln), " +
        "ex AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 5 = 1 THEN list_concat(paras, ['AT&T says 1 < 2 && x > y']) " +
        "WHEN doc_id % 5 = 2 THEN list_concat(paras, ['page field here']) " +
        "ELSE paras END AS paras FROM br), " +
        "x AS (SELECT doc_id, array_to_string(paras, chr(10)) AS t, " +
        "len(paras) AS np FROM ex) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 5 <> 4 AS INTEGER) AS ok, " +
        "CAST(CASE WHEN doc_id % 5 = 4 THEN NULL ELSE np END AS INTEGER) " +
        "AS n_paragraphs, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "ELSE CAST(length(t) AS BIGINT) END AS n_chars, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL ELSE md5(t) END AS text_md5 " +
        "FROM x"),
    // q127: the composed image intake — the oracle unions the four
    // families' residue formulas (q118 flat blocks, q121/q135 channel
    // maps — WebP's literal class shares PNG's map, so the `pa` arm
    // covers classes 1 AND 3 while format still splits them — q124
    // palette algebra, q196's VP8 half-split, q197's TIFF gray map)
    // by class, so a ROUTING slip (the wrong decoder fed the right
    // bytes) lands on another family's numbers and cannot cancel
    "q127_image_intake" ->
      ("WITH ja AS (SELECT doc_id, " +
        "CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS w, " +
        "CAST((doc_id % 2 + 1) * 8 AS INTEGER) AS h, " +
        "list_aggregate(pix, 'min') AS mn, list_aggregate(pix, 'max') AS mx, " +
        "64 * list_aggregate(pix, 'sum') AS s FROM (SELECT doc_id, " +
        "list_transform(range(0, CAST((doc_id % 3 + 1) * (doc_id % 2 + 1) AS BIGINT)), " +
        "k -> ((doc_id*31 + k*17) % 251) - 125 + 128) AS pix " +
        "FROM documents WHERE doc_id % 7 = 0)), " +
        "pa AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, " +
        "min(luma) AS mn, max(luma) AS mx, sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 7 IN (1, 3)) GROUP BY doc_id), " +
        "ga AS (SELECT doc_id, CAST(doc_id % 6 + 1 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 1 AS INTEGER) AS h, " +
        "min(luma) AS mn, max(luma) AS mx, sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + ((doc_id + x*3 + r*5) % 32)) % 256) + " +
        "587 * ((doc_id*3 + ((doc_id + x*3 + r*5) % 32)*5) % 256) + " +
        "114 * ((doc_id + ((doc_id + x*3 + r*5) % 32)*7) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 7 = 2) GROUP BY doc_id), " +
        "va AS (SELECT doc_id, 16 AS w, 16 AS h, " +
        "least(128 + s0 + s1, 128 + s0 - s1) AS mn, " +
        "greatest(128 + s0 + s1, 128 + s0 - s1) AS mx, " +
        "32768 + 256*s0 AS s FROM (" +
        "SELECT doc_id, CASE doc_id % 4 WHEN 0 THEN -2 WHEN 1 THEN -1 " +
        "WHEN 2 THEN 1 ELSE 2 END AS s0, " +
        "CASE (doc_id // 4) % 4 WHEN 0 THEN -2 WHEN 1 THEN -1 " +
        "WHEN 2 THEN 1 ELSE 2 END AS s1 FROM documents " +
        "WHERE doc_id % 7 = 5)), " +
        "ta AS (SELECT doc_id, CAST(doc_id % 6 + 2 AS INTEGER) AS w, " +
        "CAST(doc_id % 4 + 2 AS INTEGER) AS h, " +
        "min(luma) AS mn, max(luma) AS mx, sum(luma) AS s FROM (SELECT doc_id, " +
        "(doc_id*3 + x*5 + r) % 256 AS luma FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 2 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 2 AS BIGINT))) AS tr(r) " +
        "WHERE doc_id % 7 = 6) GROUP BY doc_id) " +
        "SELECT d.doc_id, " +
        "CASE d.doc_id % 7 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' " +
        "WHEN 2 THEN 'gif' WHEN 3 THEN 'webp' WHEN 5 THEN 'webp' " +
        "WHEN 6 THEN 'tiff' ELSE 'unknown' END AS format, " +
        "CAST(coalesce(ja.w, pa.w, ga.w, va.w, ta.w) AS INTEGER) AS width, " +
        "CAST(coalesce(ja.h, pa.h, ga.h, va.h, ta.h) AS INTEGER) AS height, " +
        "CAST(coalesce(ja.mn, pa.mn, ga.mn, va.mn, ta.mn) " +
        "AS INTEGER) AS min_luma, " +
        "CAST(coalesce(ja.mx, pa.mx, ga.mx, va.mx, ta.mx) " +
        "AS INTEGER) AS max_luma, " +
        "CAST(coalesce(ja.s, pa.s, ga.s, va.s, ta.s) " +
        "AS BIGINT) AS sum_luma " +
        "FROM documents d LEFT JOIN ja ON d.doc_id = ja.doc_id " +
        "LEFT JOIN pa ON d.doc_id = pa.doc_id " +
        "LEFT JOIN ga ON d.doc_id = ga.doc_id " +
        "LEFT JOIN va ON d.doc_id = va.doc_id " +
        "LEFT JOIN ta ON d.doc_id = ta.doc_id"),
    // q135: the oracle recomputes min/max/sum luma from the residue
    // channel maps per class (LZ77 rows replay row 0, the cache class a
    // single color, the palette class its modular index walk) — it
    // never packs a VP8L bit — so a prefix-code, LZ77, cache, or
    // transform slip in the kernel cannot cancel; the lossy and
    // truncated classes must refuse stats while their dims survive
    "q135_webp_pixels" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h, " +
        "doc_id % 7 AS cls, 17 + doc_id % 8 AS ps FROM documents), " +
        "px AS (SELECT doc_id, " +
        "CASE WHEN cls = 2 THEN i % w WHEN cls = 3 THEN 0 " +
        "WHEN cls = 4 THEN ((i % w) + (i // w) * 3) % ps ELSE i % w END AS x, " +
        "CASE WHEN cls IN (2, 3, 4) THEN 0 ELSE i // w END AS r " +
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls <= 4), " +
        "l AS (SELECT doc_id, " +
        "(299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 AS lum FROM px), " +
        "s AS (SELECT doc_id, min(lum) AS mn, max(lum) AS mx, " +
        "sum(lum) AS sm FROM l GROUP BY doc_id) " +
        "SELECT p.doc_id, 'webp' AS format, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(s.mn AS INTEGER) AS min_luma, " +
        "CAST(s.mx AS INTEGER) AS max_luma, " +
        "CAST(s.sm AS BIGINT) AS sum_luma, " +
        "CAST((s.sm * 100) // (w * h) AS BIGINT) AS mean_luma_x100 " +
        "FROM p LEFT JOIN s ON p.doc_id = s.doc_id"),
    // q128: the oracle rebuilds the expected decode from the cleansed
    // base + the gauntlet's chr() codepoints (it never runs a decoder),
    // so a table, numeric-radix, one-level, or pass-through slip cannot
    // cancel
    "q128_html_unescape" ->
      ("WITH b AS (SELECT doc_id, " +
        "regexp_replace(coalesce(text, ''), '[&;#]', '', 'g') AS base " +
        "FROM documents), " +
        "y AS (SELECT doc_id, base || CASE doc_id % 5 " +
        "WHEN 0 THEN ' & x <b> ' || chr(34) || 'q' || chr(34) || ' ' || " +
        "chr(8212) || ' ' || chr(233) || ' ' || chr(8364) " +
        "WHEN 1 THEN ' AB ' || chr(8212) || ' ' || chr(8364) || ' end' " +
        "WHEN 2 THEN ' &unknown; &amp x &#xG1; &#; &#x110000; &#xD800; tail' " +
        "WHEN 3 THEN ' &amp; &#65; z' " +
        "ELSE '' END AS expect FROM b) " +
        "SELECT doc_id, expect AS text_out, " +
        "CAST(length(expect) AS BIGINT) AS n_chars, " +
        "md5(expect) AS text_md5 FROM y"),
    // q118: the oracle recomputes min/max/sum luma from the per-block DC
    // residue formula alone — it never parses a byte of JPEG — so the
    // Spark side must carry exact values through Huffman + DC
    // differentials + restart resets + dequant + IDCT to match; the
    // truncated class must refuse stats while its header dims survive
    "q118_jpeg_pixels" ->
      ("WITH p AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 9 = 3 THEN 3 ELSE CAST(doc_id % 3 + 1 AS BIGINT) END AS bw, " +
        "CASE WHEN doc_id % 9 = 3 THEN 2 ELSE CAST(doc_id % 2 + 1 AS BIGINT) END AS bh, " +
        "CASE WHEN doc_id % 9 IN (5, 6, 8) THEN 2 ELSE 1 END AS h0, " +
        "CASE WHEN doc_id % 9 IN (5, 8) THEN 2 ELSE 1 END AS v0 " +
        "FROM documents), " +
        "x AS (SELECT doc_id, bw, bh, h0, v0, " +
        "list_transform(range(0, bw*bh*h0*v0), k -> ((doc_id*31 + k*17) % 251) - 125 + 128) AS pix " +
        "FROM p) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 9 <> 4 AS INTEGER) AS is_jpeg, " +
        "CAST(CASE WHEN doc_id % 9 = 4 THEN NULL ELSE bw*8*h0 END AS INTEGER) AS width, " +
        "CAST(CASE WHEN doc_id % 9 = 4 THEN NULL ELSE bh*8*v0 END AS INTEGER) AS height, " +
        "CAST(CASE WHEN doc_id % 9 IN (3,4) THEN NULL " +
        "ELSE list_aggregate(pix, 'min') END AS INTEGER) AS min_luma, " +
        "CAST(CASE WHEN doc_id % 9 IN (3,4) THEN NULL " +
        "ELSE list_aggregate(pix, 'max') END AS INTEGER) AS max_luma, " +
        "CAST(CASE WHEN doc_id % 9 IN (3,4) THEN NULL " +
        "ELSE 64 * list_aggregate(pix, 'sum') END AS BIGINT) AS sum_luma, " +
        "CAST(CASE WHEN doc_id % 9 IN (3,4) THEN NULL " +
        "ELSE (64 * list_aggregate(pix, 'sum') * 100) // (bw * bh * h0 * v0 * 64) " +
        "END AS BIGINT) AS mean_luma_x100 FROM x"),
    // q121: PNG pixel decode — luma statistics recomputed pixel-by-pixel
    // from the q59 residue channel maps (the oracle never inflates a
    // byte), so a CRC, filter-inversion, stride, channel-order, or
    // truncation slip on the Spark kernel side cannot cancel out; the
    // grayscale class folds the G map directly (equal-channel Rec.601
    // luma is the sample itself)
    "q121_png_pixels" ->
      ("WITH px AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 10 IN (0, 7, 9) THEN (doc_id*3 + x*5 + r) % 256 " +
        "WHEN doc_id % 10 = 5 THEN " +
        "(299 * ((doc_id*2 + ((doc_id + x*3 + r*5) % 32)) % 256) + " +
        "587 * ((doc_id*3 + ((doc_id + x*3 + r*5) % 32)*5) % 256) + " +
        "114 * ((doc_id + ((doc_id + x*3 + r*5) % 32)*7) % 256)) // 1000 " +
        "ELSE (299 * ((doc_id*2 + x + r*11) % 256) + " +
        "587 * ((doc_id*3 + x*5 + r) % 256) + " +
        "114 * ((doc_id + x*7 + r*13) % 256)) // 1000 END AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r)), " +
        "agg AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s, count(*) AS n FROM px GROUP BY doc_id) " +
        "SELECT d.doc_id, " +
        "CASE WHEN d.doc_id % 10 = 4 THEN 'unknown' ELSE 'png' END AS format, " +
        "CASE WHEN d.doc_id % 10 = 4 THEN NULL " +
        "ELSE CAST(d.doc_id % 6 + 1 AS INTEGER) END AS width, " +
        "CASE WHEN d.doc_id % 10 = 4 THEN NULL " +
        "ELSE CAST(d.doc_id % 4 + 1 AS INTEGER) END AS height, " +
        "CASE WHEN d.doc_id % 10 IN (3,4) THEN NULL " +
        "ELSE CAST(a.mn AS INTEGER) END AS min_luma, " +
        "CASE WHEN d.doc_id % 10 IN (3,4) THEN NULL " +
        "ELSE CAST(a.mx AS INTEGER) END AS max_luma, " +
        "CASE WHEN d.doc_id % 10 IN (3,4) THEN NULL " +
        "ELSE CAST(a.s AS BIGINT) END AS sum_luma, " +
        "CASE WHEN d.doc_id % 10 IN (3,4) THEN NULL " +
        "ELSE CAST(a.s * 100 // a.n AS BIGINT) END AS mean_luma_x100 " +
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"),
    // q122: the oracle replays the ENTIRE train+score pipeline from the
    // corpus alone — the q65 rule gate for labels, the md5 hashing trick,
    // per-bucket class counts, Laplace log-odds weights rounded to exact
    // decimal micro-units, and the per-doc integer sum — so a hashing,
    // smoothing, rounding, or bigram-boundary slip cannot cancel
    "q122_quality_classifier" -> Oracles.qualityClassifier,
    // q123: the byte-level q86 — the oracle unrolls the same ten training
    // rounds over hex-byte symbols and derives per-doc counts from the
    // trained vocabulary (it never runs the encode kernel), so a
    // pre-tokenizer, byte-alphabet, or merge-order slip cannot cancel
    "q123_byte_bpe" -> byteBpeSql,
    // q124: GIF pixels — the oracle recomputes stats from the shared
    // palette residue formula (q121's PLTE algebra; it never parses a
    // byte, never runs LZW), so a color-table, LZW, width-promotion, or
    // sub-block slip cannot cancel; the interlaced class must match the
    // plain formula (position-free fold), the truncated class must
    // refuse stats while LSD dims survive
    "q124_gif_pixels" ->
      ("WITH px AS (SELECT doc_id, " +
        "(299 * ((doc_id*2 + ((doc_id + x*3 + r*5) % 32)) % 256) + " +
        "587 * ((doc_id*3 + ((doc_id + x*3 + r*5) % 32)*5) % 256) + " +
        "114 * ((doc_id + ((doc_id + x*3 + r*5) % 32)*7) % 256)) // 1000 AS luma " +
        "FROM documents, " +
        "UNNEST(range(0, CAST(doc_id % 6 + 1 AS BIGINT))) AS tx(x), " +
        "UNNEST(range(0, CAST(doc_id % 4 + 1 AS BIGINT))) AS tr(r)), " +
        "agg AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s, count(*) AS n FROM px GROUP BY doc_id) " +
        "SELECT d.doc_id, " +
        "CASE WHEN d.doc_id % 5 = 3 THEN 'unknown' ELSE 'gif' END AS format, " +
        "CASE WHEN d.doc_id % 5 = 3 THEN NULL " +
        "ELSE CAST(d.doc_id % 6 + 1 AS INTEGER) END AS width, " +
        "CASE WHEN d.doc_id % 5 = 3 THEN NULL " +
        "ELSE CAST(d.doc_id % 4 + 1 AS INTEGER) END AS height, " +
        "CASE WHEN d.doc_id % 5 IN (2,3) THEN NULL " +
        "ELSE CAST(a.mn AS INTEGER) END AS min_luma, " +
        "CASE WHEN d.doc_id % 5 IN (2,3) THEN NULL " +
        "ELSE CAST(a.mx AS INTEGER) END AS max_luma, " +
        "CASE WHEN d.doc_id % 5 IN (2,3) THEN NULL " +
        "ELSE CAST(a.s AS BIGINT) END AS sum_luma, " +
        "CASE WHEN d.doc_id % 5 IN (2,3) THEN NULL " +
        "ELSE CAST(a.s * 100 // a.n AS BIGINT) END AS mean_luma_x100 " +
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"),
    // q125: the oracle re-synthesizes the expected TEXT from the corpus
    // words alone (8-word lines, the class-3 escape line and the
    // class-6 composite-font line in chr() codepoints — it never
    // builds a PDF byte), so an object-graph, Length, inflate,
    // operator, string-unescaping, or CMAP slip in the extractor
    // cannot cancel; the page count replays the 5-line pagination
    // arithmetic against the verified /Kids arity
    "q125_pdf_extract" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "ln AS (SELECT doc_id, list_transform(" +
        "range(CAST(ceil(len(ws) / 8.0) AS INTEGER)), " +
        "i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) AS lines " +
        "FROM w), " +
        "l2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3 THEN " +
        "list_concat(lines, ['esc (par) en' || chr(92) || 'd ' || chr(13) || ' tail']) " +
        "WHEN doc_id % 7 = 6 THEN " +
        "list_concat(lines, [chr(161) || chr(119970) || chr(119971) || chr(119972)]) " +
        "ELSE lines END AS lines FROM ln), " +
        "x AS (SELECT doc_id, array_to_string(lines, chr(10)) AS t, " +
        "len(lines) AS nl FROM l2) " +
        "SELECT doc_id, " +
        "CAST(doc_id % 7 NOT IN (4, 5) AS INTEGER) AS ok, " +
        "CASE WHEN doc_id % 7 IN (4, 5) THEN NULL " +
        "ELSE CAST(greatest(1, CAST(ceil(nl / 5.0) AS INTEGER)) AS INTEGER) " +
        "END AS n_pages, " +
        "CASE WHEN doc_id % 7 IN (4, 5) THEN NULL " +
        "ELSE CAST(length(t) AS BIGINT) END AS n_chars, " +
        "CASE WHEN doc_id % 7 IN (4, 5) THEN NULL ELSE md5(t) END AS text_md5 " +
        "FROM x"),
    // q126: the oracle derives detection verdicts AND expected decodes
    // from the text alone (q117's stance — it never builds a UTF-16
    // byte), so a zero-pattern, BOM-precedence, endianness, or strict-
    // decode slip on the Spark side cannot cancel
    "q126_utf16_intake" ->
      ("WITH s0 AS (SELECT doc_id, " +
        "regexp_replace(coalesce(text, ''), '^\\x{FEFF}', '') AS txt " +
        "FROM documents), " +
        "s AS (SELECT doc_id, txt, " +
        "regexp_replace(txt, '[^\\x20-\\x7E]', '', 'g') || ' utf sixteen marker' AS at " +
        "FROM s0), " +
        "y AS (SELECT doc_id, " +
        "CASE doc_id % 5 WHEN 0 THEN 'utf-16le' WHEN 1 THEN 'utf-16be' " +
        "WHEN 2 THEN 'utf-16le-bom' WHEN 3 THEN 'utf-8' " +
        "ELSE 'utf-16le' END AS detected, " +
        "CASE WHEN doc_id % 5 = 2 THEN 'bom' ELSE 'sniffed' END AS method, " +
        "CASE WHEN doc_id % 5 = 4 THEN NULL " +
        "WHEN doc_id % 5 IN (0, 1) THEN at ELSE txt END AS expect FROM s) " +
        "SELECT doc_id, detected, method, expect AS text_out, " +
        "CAST(length(expect) AS BIGINT) AS n_chars, " +
        "md5(expect) AS text_md5 FROM y"),
    // q119: the oracle spells the funnel as explicit per-step joins
    // (min view; min click strictly after it; min purchase strictly
    // after that) — a structurally different formulation from the Spark
    // side's chained running windows, so a frame, qualification, or
    // ordering slip in the window spelling cannot cancel
    "q119_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, ts FROM events " +
        "WHERE event_type IN ('view', 'click', 'purchase')), " +
        "v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN v USING (user_id) " +
        "WHERE event_type = 'click' AND ts > t1 GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN c USING (user_id) " +
        "WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1), " +
        "u AS (SELECT DISTINCT user_id FROM e) " +
        "SELECT u.user_id, " +
        "CAST(date_trunc('second', t1) AS TIMESTAMP) AS first_view, " +
        "CAST(date_trunc('second', t2) AS TIMESTAMP) AS first_click, " +
        "CAST(date_trunc('second', t3) AS TIMESTAMP) AS first_purchase, " +
        "CAST((t1 IS NOT NULL)::INTEGER + (t2 IS NOT NULL)::INTEGER + " +
        "(t3 IS NOT NULL)::INTEGER AS INTEGER) AS reached " +
        "FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) " +
        "LEFT JOIN p USING (user_id)"),
    // q120: weekly cohort retention anchored at the corpus epoch; the
    // oracle goes through an explicit DISTINCT (user, week) table where
    // the Spark side collect_sets per user — different dedup mechanics,
    // same matrix
    "q120_cohorts" ->
      ("WITH e AS (SELECT user_id, " +
        "CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS INTEGER) AS wk " +
        "FROM events), " +
        "uw AS (SELECT DISTINCT user_id, wk FROM e), " +
        "ch AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1), " +
        "cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size " +
        "FROM ch GROUP BY 1), " +
        "act AS (SELECT ch.cohort_week, uw.wk - ch.cohort_week AS week_offset, " +
        "CAST(count(*) AS BIGINT) AS n_active " +
        "FROM uw JOIN ch USING (user_id) GROUP BY 1, 2) " +
        "SELECT CAST(cohort_week AS INTEGER) AS cohort_week, " +
        "CAST(week_offset AS INTEGER) AS week_offset, n_active, cohort_size, " +
        "CAST(n_active * 100 // cohort_size AS BIGINT) AS retention_x100 " +
        "FROM act JOIN cs USING (cohort_week)"),
    // q115: the oracle checks round-trip CONTENT from the residues —
    // the two corruption classes must refuse with NULL, everything else
    // must de-chunk back to the exact text bytes
    "q115_chunked_decode" ->
      ("SELECT doc_id, " +
        "CASE WHEN doc_id % 10 IN (7, 9) THEN 0 ELSE 1 END AS ok, " +
        "CASE WHEN doc_id % 10 IN (7, 9) THEN NULL " +
        "ELSE CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) END AS body_len, " +
        "CASE WHEN doc_id % 10 IN (7, 9) THEN NULL ELSE md5(coalesce(text, '')) END AS body_md5 " +
        "FROM documents"),
    // q116: the oracle re-synthesizes the page (the SAME htmlCtes q93/q97
    // splice), derives every transport verdict from residues, and — the
    // composition's teeth — equates payload_md5 to md5 of the
    // independently built page: the Spark side must carry exact bytes
    // through gzip + WARC + the byte-level envelope split + de-chunking
    // + UTF-16/Latin-1 decoding to match
    "q116_fullstack_intake" -> fullStackOracle,
    // q189: the SAME six-layer contract as q116 — the zstd rung must
    // be a drop-in for the gzip rung, so the oracle IS q116's oracle
    "q189_zstd_intake" -> fullStackOracle,
    // q197: the oracle replays min/max/sum luma from the family
    // channel maps per class (the gray map for the uncompressed, BE,
    // polarity, LZW, PackBits, TILED, and 16-bit classes; the RGB fold
    // for the two predictor classes; the NESTED gray-into-RGB fold for
    // the palette class) — it never touches a TIFF byte, so a
    // strip-offset, LZW-width, predictor, polarity, ColorMap, or
    // sample-endian slip cannot cancel
    "q197_tiff_pixels" ->
      ("WITH p AS (SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h, " +
        "(doc_id % 2 + 1) * 16 + 5 AS w7, " +
        "doc_id % 15 AS cls FROM documents), " +
        "g AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "(doc_id*3 + (i % w)*5 + (i // w)) % 256 AS luma " +
        // class 9 stores gray<<8 | blue as a 16-bit BE sample; the
        // high-byte fold lands back on the gray map
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls IN (0, 1, 2, 5, 9)) " +
        "GROUP BY doc_id), " +
        "c AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + (i % w) + (i // w)*11) % 256) + " +
        "587 * ((doc_id*3 + (i % w)*5 + (i // w)) % 256) + " +
        "114 * ((doc_id + (i % w)*7 + (i // w)*13) % 256)) // 1000 AS luma " +
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls IN (3, 6)) " +
        "GROUP BY doc_id), " +
        "g7 AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "(doc_id*3 + (i % w7)*5 + (i // w7)) % 256 AS luma " +
        "FROM p, UNNEST(range(0, w7 * 18)) AS t(i) WHERE cls = 7) " +
        "GROUP BY doc_id), " +
        // palette: the pixel is a gray-map INDEX, the ColorMap's high
        // bytes are the RGB maps at (index, row 0) — a nested fold
        // bilevel (uncompressed + G4) and 4-bit classes fold the
        // gray map through threshold / nibble scaling
        "bl AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "CASE WHEN (doc_id*3 + (i % w)*5 + (i // w)) % 256 >= 128 " +
        "THEN 0 ELSE 255 END AS luma " +
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls IN (10, 11, 13, 14)) " +
        "GROUP BY doc_id), " +
        "n4 AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "(((doc_id*3 + (i % w)*5 + (i // w)) % 256) // 16) * 17 AS luma " +
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls = 12) " +
        "GROUP BY doc_id), " +
        "pal AS (SELECT doc_id, min(luma) AS mn, max(luma) AS mx, " +
        "sum(luma) AS s FROM (SELECT doc_id, " +
        "(299 * ((doc_id*2 + g) % 256) + 587 * ((doc_id*3 + g*5) % 256) + " +
        "114 * ((doc_id + g*7) % 256)) // 1000 AS luma " +
        "FROM (SELECT doc_id, (doc_id*3 + (i % w)*5 + (i // w)) % 256 AS g " +
        "FROM p, UNNEST(range(0, w * h)) AS t(i) WHERE cls = 8)) " +
        "GROUP BY doc_id) " +
        "SELECT p.doc_id, CAST(1 AS INTEGER) AS is_tiff, " +
        "CAST(CASE WHEN cls = 7 THEN w7 ELSE w END AS INTEGER) AS width, " +
        "CAST(CASE WHEN cls = 7 THEN 18 ELSE h END AS INTEGER) AS height, " +
        "CAST(coalesce(g.mn, c.mn, g7.mn, pal.mn, bl.mn, n4.mn) " +
        "AS INTEGER) AS min_luma, " +
        "CAST(coalesce(g.mx, c.mx, g7.mx, pal.mx, bl.mx, n4.mx) " +
        "AS INTEGER) AS max_luma, " +
        "CAST(coalesce(g.s, c.s, g7.s, pal.s, bl.s, n4.s) " +
        "AS BIGINT) AS sum_luma " +
        "FROM p LEFT JOIN g ON p.doc_id = g.doc_id " +
        "LEFT JOIN c ON p.doc_id = c.doc_id " +
        "LEFT JOIN g7 ON p.doc_id = g7.doc_id " +
        "LEFT JOIN pal ON p.doc_id = pal.doc_id " +
        "LEFT JOIN bl ON p.doc_id = bl.doc_id " +
        "LEFT JOIN n4 ON p.doc_id = n4.doc_id"),
    // q196: the oracle replays each class's luma algebra (cumulative
    // DC-pred chain, corner average, WHT half-split, V/H mode chains) from doc_id
    // alone — it never touches a VP8 bit — so a boolean-decoder,
    // context-bookkeeping, WHT, or prediction slip cannot cancel; the
    // truncated and RFC-default-probs classes must keep dims while
    // refusing stats
    "q196_vp8_pixels" ->
      ("WITH ks AS (SELECT doc_id, " +
        "CASE WHEN (doc_id*7) % 8 < 4 THEN (doc_id*7) % 8 - 4 " +
        "ELSE (doc_id*7) % 8 - 3 END AS k0, " +
        "CASE WHEN (doc_id*7 + 13) % 8 < 4 THEN (doc_id*7 + 13) % 8 - 4 " +
        "ELSE (doc_id*7 + 13) % 8 - 3 END AS k1, " +
        "CASE WHEN (doc_id*7 + 26) % 8 < 4 THEN (doc_id*7 + 26) % 8 - 4 " +
        "ELSE (doc_id*7 + 26) % 8 - 3 END AS k2, " +
        "CASE WHEN (doc_id*7 + 39) % 8 < 4 THEN (doc_id*7 + 39) % 8 - 4 " +
        "ELSE (doc_id*7 + 39) % 8 - 3 END AS k3, " +
        "CASE doc_id % 4 WHEN 0 THEN -2 WHEN 1 THEN -1 WHEN 2 THEN 1 " +
        "ELSE 2 END AS s0, " +
        "CASE (doc_id // 4) % 4 WHEN 0 THEN -2 WHEN 1 THEN -1 " +
        "WHEN 2 THEN 1 ELSE 2 END AS s1 FROM documents), " +
        // class 7 is class 0's DC chain coded over the RFC default
        // tables — same luma algebra, different bitstream machinery
        "c0 AS (SELECT doc_id, 128 + k0 AS l0, 128 + k0 + k1 AS l1, " +
        "128 + k0 + k1 + k2 AS l2, 128 + k0 + k1 + k2 + k3 AS l3 " +
        "FROM ks WHERE doc_id % 13 IN (0, 7)), " +
        "c1 AS (SELECT doc_id, l00, l01, l10, " +
        "(l01 + l10 + 1) // 2 + k3 AS l11 FROM (SELECT doc_id, k3, " +
        "128 + k0 AS l00, 128 + k0 + k1 AS l01, 128 + k0 + k2 AS l10 " +
        "FROM ks WHERE doc_id % 13 = 1)), " +
        "c2 AS (SELECT doc_id, 128 + s0 + s1 AS lft, 128 + s0 - s1 AS rgt " +
        "FROM ks WHERE doc_id % 13 = 2), " +
        // classes 9 (quant-index-4 + two partitions) and 10 (loop-
        // filtered step) land on the SAME two-MB chain algebra as the
        // V/H classes: offsets k through different decode machinery
        "vh AS (SELECT doc_id, 128 + k0 AS l0, 128 + k0 + k1 AS l1 " +
        "FROM ks WHERE doc_id % 13 IN (5, 6, 9, 10, 11)), " +
        // class 12: the skipped MB chains to MB0's value — uniform l0
        "sk AS (SELECT doc_id, 128 + k0 AS l0 " +
        "FROM ks WHERE doc_id % 13 = 12), " +
        // class 8: the B_TM corner rule (left + above - corner) chains
        // the four visible sub-blocks of the 8x8 B_PRED macroblock
        "b8 AS (SELECT doc_id, 129 + k0 AS l00, 129 + k0 + k1 AS l10, " +
        "129 + k0 + k2 AS l01, 129 + k0 + k1 + k2 + k3 AS l11 " +
        "FROM ks WHERE doc_id % 13 = 8) " +
        "SELECT d.doc_id, 'webp' AS format, " +
        "CAST(CASE d.doc_id % 13 WHEN 0 THEN 64 WHEN 1 THEN 32 " +
        "WHEN 2 THEN 16 WHEN 3 THEN 64 WHEN 5 THEN 16 WHEN 6 THEN 32 " +
        "WHEN 7 THEN 64 WHEN 8 THEN 8 WHEN 9 THEN 16 WHEN 10 THEN 32 " +
        "WHEN 11 THEN 32 WHEN 12 THEN 32 " +
        "ELSE 16 END AS INTEGER) AS width, " +
        "CAST(CASE d.doc_id % 13 WHEN 0 THEN 16 WHEN 1 THEN 32 " +
        "WHEN 5 THEN 32 WHEN 8 THEN 8 WHEN 9 THEN 32 " +
        "ELSE 16 END AS INTEGER) AS height, " +
        "CAST(coalesce(least(c0.l0, c0.l1, c0.l2, c0.l3), " +
        "least(c1.l00, c1.l01, c1.l10, c1.l11), " +
        "least(c2.lft, c2.rgt), least(vh.l0, vh.l1), " +
        "least(b8.l00, b8.l10, b8.l01, b8.l11), sk.l0) AS INTEGER) " +
        "AS min_luma, " +
        "CAST(coalesce(greatest(c0.l0, c0.l1, c0.l2, c0.l3), " +
        "greatest(c1.l00, c1.l01, c1.l10, c1.l11), " +
        "greatest(c2.lft, c2.rgt), greatest(vh.l0, vh.l1), " +
        "greatest(b8.l00, b8.l10, b8.l01, b8.l11), sk.l0) AS INTEGER) " +
        "AS max_luma, " +
        "CAST(coalesce(256*(c0.l0 + c0.l1 + c0.l2 + c0.l3), " +
        "256*(c1.l00 + c1.l01 + c1.l10 + c1.l11), " +
        "128*(c2.lft + c2.rgt), 256*(vh.l0 + vh.l1), " +
        "16*(b8.l00 + b8.l10 + b8.l01 + b8.l11), 512*sk.l0) AS BIGINT) " +
        "AS sum_luma " +
        "FROM documents d LEFT JOIN c0 ON d.doc_id = c0.doc_id " +
        "LEFT JOIN c1 ON d.doc_id = c1.doc_id " +
        "LEFT JOIN c2 ON d.doc_id = c2.doc_id " +
        "LEFT JOIN vh ON d.doc_id = vh.doc_id " +
        "LEFT JOIN b8 ON d.doc_id = b8.doc_id " +
        "LEFT JOIN sk ON d.doc_id = sk.doc_id"),
    // q195: one formula against three decode stacks + the
    // passthrough — the inner tar is identical across wrappers, so a
    // wrapper-routing or decode slip breaks exactly its class
    "q195_tarball_intake" ->
      ("WITH m AS (SELECT doc_id, text, " +
        "octet_length(encode(text)) AS o, " +
        "'doc ' || doc_id || ' has ' || octet_length(encode(text)) || " +
        "' bytes' AS meta FROM documents) " +
        "SELECT doc_id, " +
        "CASE doc_id % 5 WHEN 0 THEN 'gzip' WHEN 1 THEN 'bzip2' " +
        "WHEN 2 THEN 'xz' WHEN 3 THEN 'none' END AS wrapper, " +
        "CAST(doc_id % 5 <> 4 AS INTEGER) AS is_tar, " +
        "CAST(CASE WHEN doc_id % 5 <> 4 THEN 3 END AS INTEGER) " +
        "AS n_members, " +
        "CASE WHEN doc_id % 5 <> 4 THEN md5(text) END AS text_md5, " +
        "CAST(CASE WHEN doc_id % 5 <> 4 THEN o + length(meta) END " +
        "AS BIGINT) AS n_bytes FROM m"),
    // q194: the oracle re-synthesizes the CLEANED text from corpus
    // words alone (never XML, never wikitext) — a bzip2, page-walk,
    // unescape-order, ns-filter, template/ref/link/quote/heading, or
    // whitespace slip cannot agree; class 1 must hash equal to class
    // 0 (the invariance drill, baked into one formula)
    "q194_wiki_dump" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "ws[1] || ' ' || CAST(doc_id % 89 AS VARCHAR) AS title, " +
        "ws[1] || ' is a ' || ws[2] || '. See ' || ws[4] || ' and ' || " +
        "ws[5] || '.' || chr(10) || 'History' || chr(10) || " +
        "ws[6] || ' began ' || ws[7] || '#' || " +
        "CAST(doc_id % 50 AS VARCHAR) || '.' AS cleaned FROM w) " +
        "SELECT doc_id, " +
        "CAST(m <> 4 AS INTEGER) AS is_dump, " +
        "CAST(CASE WHEN m = 3 THEN 1 WHEN m <> 4 THEN 2 END AS INTEGER) " +
        "AS n_pages, " +
        "CAST(CASE WHEN m IN (0, 1, 2) THEN 1 WHEN m = 3 THEN 0 " +
        "END AS INTEGER) AS has_article, " +
        "CAST(CASE WHEN m = 2 THEN 1 WHEN m <> 4 THEN 0 END AS INTEGER) " +
        "AS is_redirect, " +
        "CASE WHEN m IN (0, 1, 2) THEN title END AS title, " +
        "CAST(CASE WHEN m IN (0, 1) THEN length(cleaned) END AS BIGINT) " +
        "AS n_chars, " +
        "CASE WHEN m IN (0, 1) THEN md5(cleaned) END AS clean_md5 FROM p"),
    // q193: ONE md5 formula against five decode stacks — the content
    // is the same family spelling in every class, so any
    // wrapper-specific decode slip breaks exactly its residue class
    "q193_universal_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 7 AS m, " +
        "CASE WHEN doc_id % 7 = 6 " +
        "THEN 'shared dictionary stock phrase: ' ELSE '' END || " +
        "left(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR), 200) AS b FROM w) " +
        "SELECT doc_id, " +
        "CASE m WHEN 0 THEN 'gzip' WHEN 1 THEN 'zstd' WHEN 2 THEN 'lz4' " +
        "WHEN 3 THEN 'bzip2' WHEN 4 THEN 'xz' WHEN 6 THEN 'zstd-dict' " +
        "ELSE 'none' END AS format, " +
        "CAST(1 AS INTEGER) AS decoded, " +
        "CAST(length(b) AS BIGINT) AS content_len, " +
        "md5(b) AS content_md5 FROM p"),
    // q192: every content string replays from words + doc_id
    // arithmetic, md5 closed in SQL — a chunk-framing, check, index,
    // or footer slip cannot agree
    "q192_xz_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, ws[2] AS w1, " +
        "left(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR), 200) AS b FROM w), " +
        "c AS (SELECT doc_id, m, w1, CASE m " +
        "WHEN 0 THEN b " +
        "WHEN 1 THEN b " +
        "WHEN 2 THEN b || '+' || w1 " +
        "WHEN 3 THEN b || array_to_string(list_transform(range(70000), " +
        "k -> chr(97 + CAST((doc_id + k*11) % 26 AS INTEGER))), '') " +
        "END AS content FROM p) " +
        "SELECT doc_id, " +
        "CAST(m <> 4 AS INTEGER) AS is_xz, " +
        "CASE m WHEN 0 THEN 'crc32' WHEN 1 THEN 'crc64' " +
        "WHEN 2 THEN 'sha256' WHEN 3 THEN 'crc32' END AS check_kind, " +
        "CAST(CASE WHEN m = 2 THEN 2 WHEN m <> 4 THEN 1 END AS INTEGER) " +
        "AS n_blocks, " +
        "CAST(CASE WHEN m <> 4 THEN 0 END AS INTEGER) AS truncated, " +
        "CAST(CASE WHEN m <> 4 THEN 1 END AS INTEGER) AS check_ok, " +
        "CAST(length(content) AS BIGINT) AS content_len, " +
        "md5(content) AS content_md5 FROM c"),
    // q191: every content string replays from words + doc_id
    // arithmetic, md5 closed in SQL — a bit-order, CRC, symbol-map,
    // selector, RLE2, BWT, or RLE1 slip cannot agree
    "q191_bzip2_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 5 AS m, " +
        "left(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR), 200) AS b FROM w), " +
        "c AS (SELECT doc_id, m, CASE m " +
        "WHEN 0 THEN b " +
        "WHEN 1 THEN b || repeat('q', 40) || b " +
        "WHEN 2 THEN b || ';' || b || ';' || b " +
        "WHEN 3 THEN b || '|' || b || '|' || b || '|' || b " +
        "END AS content FROM p) " +
        "SELECT doc_id, " +
        "CAST(m <> 4 AS INTEGER) AS is_bzip2, " +
        "CAST(CASE WHEN m = 3 THEN 1 WHEN m <> 4 THEN 9 END AS INTEGER) " +
        "AS level, " +
        "CAST(CASE WHEN m = 2 THEN 2 WHEN m <> 4 THEN 1 END AS INTEGER) " +
        "AS n_blocks, " +
        "CAST(CASE WHEN m <> 4 THEN 0 END AS INTEGER) AS truncated, " +
        "CAST(CASE WHEN m <> 4 THEN 1 END AS INTEGER) AS crc_ok, " +
        "CAST(length(content) AS BIGINT) AS content_len, " +
        "md5(content) AS content_md5 FROM c"),
    // q190: every content string replays from words + doc_id
    // arithmetic, md5 closed in SQL — a token, length-extension,
    // offset, stored-bit, or frame-concat slip cannot agree
    "q190_lz4_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 6 AS m, ws[2] AS w1, " +
        "left(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR), 200) AS b FROM w), " +
        "c AS (SELECT doc_id, m, CASE m " +
        "WHEN 0 THEN b " +
        "WHEN 1 THEN b || '|' || b || repeat('y', 10) " +
        "WHEN 2 THEN b || '/' || b " +
        "WHEN 3 THEN b || '+' || w1 " +
        "WHEN 4 THEN b || array_to_string(list_transform(range(300), " +
        "k -> chr(97 + CAST((doc_id + k*7) % 26 AS INTEGER))), '') " +
        "END AS content FROM p) " +
        "SELECT doc_id, " +
        "CAST(m <> 5 AS INTEGER) AS is_lz4, " +
        "CAST(CASE WHEN m = 3 THEN 2 WHEN m <> 5 THEN 1 END AS INTEGER) " +
        "AS n_frames, " +
        "CAST(CASE WHEN m IN (2, 3) THEN 2 WHEN m <> 5 THEN 1 " +
        "END AS INTEGER) AS n_blocks, " +
        "CAST(CASE WHEN m <> 5 THEN 0 END AS INTEGER) AS truncated, " +
        "CAST(CASE WHEN m <> 5 THEN 1 END AS INTEGER) AS checksum_ok, " +
        "CAST(length(content) AS BIGINT) AS content_len, " +
        "md5(content) AS content_md5 FROM c"),
    // q188: every content string replays from words + doc_id
    // arithmetic, md5 closed in SQL — a literals, sequence-execution,
    // repeat-offset, treeless, or RLE slip cannot agree
    "q188_zstd_decode" ->
      ("WITH w AS (SELECT doc_id, list_filter(" +
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'), " +
        "x -> x <> '') AS ws FROM documents), " +
        "p AS (SELECT doc_id, doc_id % 7 AS m, " +
        "left(ws[1] || ' ' || ws[2] || '#' || " +
        "CAST(doc_id % 97 AS VARCHAR), 200) AS b FROM w), " +
        "c AS (SELECT doc_id, m, CASE m " +
        "WHEN 0 THEN b " +
        "WHEN 1 THEN b || '|' || b " +
        "WHEN 2 THEN b || '/' || b || '/' || b || '/' || b " +
        "WHEN 3 THEN b || ';' || b || ';' || b || 'xxxxxxxx' " +
        "WHEN 4 THEN b || repeat('z', CAST(30 + doc_id % 8 AS INTEGER)) || '!end' " +
        "WHEN 5 THEN b || reverse(b) END AS content FROM p) " +
        "SELECT doc_id, " +
        "CAST(m <> 6 AS INTEGER) AS is_zstd, " +
        "CAST(CASE WHEN m <> 6 THEN 1 END AS INTEGER) AS n_frames, " +
        "CAST(CASE WHEN m <> 6 THEN 0 END AS INTEGER) AS truncated, " +
        "CAST(CASE WHEN m <> 6 THEN 1 END AS INTEGER) AS checksum_ok, " +
        "CAST(length(content) AS BIGINT) AS content_len, " +
        "md5(content) AS content_md5 FROM c"),
    // q99: the oracle derives every field DIRECTLY from the residues —
    // never by parsing (q82's stance) — so a parser slip (splitting on
    // the body's embedded separator, case-sensitive header match,
    // keeping the charset parameter, lowercasing Location) cannot cancel
    "q99_http_envelope" ->
      ("WITH k AS (SELECT chr(13) || chr(10) AS crlf), " +
        "b AS (SELECT doc_id, text, " +
        "text || crlf || crlf || 'tail' || (doc_id % 5) AS body200, " +
        "'not here' || crlf || crlf || 'x' AS body404 " +
        "FROM documents, k) " +
        "SELECT doc_id, " +
        "CASE WHEN doc_id % 10 = 7 THEN 0 ELSE 1 END AS has_envelope, " +
        "CAST(CASE WHEN doc_id % 10 = 7 THEN NULL WHEN doc_id % 10 = 3 THEN 301 " +
        "WHEN doc_id % 10 = 4 THEN 404 ELSE 200 END AS INTEGER) AS status, " +
        "CASE WHEN doc_id % 10 = 7 THEN NULL WHEN doc_id % 10 = 4 THEN 'text/plain' " +
        "ELSE 'text/html' END AS content_type, " +
        "CASE WHEN doc_id % 10 = 3 THEN 'https://site' || ((doc_id + 1) % 40) || " +
        "'.example.com/Moved/' || (doc_id % 9) END AS location, " +
        "CASE WHEN doc_id % 10 = 7 THEN NULL WHEN doc_id % 10 = 3 THEN md5('<html>redirect</html>') " +
        "WHEN doc_id % 10 = 4 THEN md5(body404) ELSE md5(body200) END AS body_md5, " +
        "CASE WHEN doc_id % 10 = 7 THEN NULL WHEN doc_id % 10 = 3 THEN CAST(octet_length(encode('<html>redirect</html>')) AS BIGINT) " +
        "WHEN doc_id % 10 = 4 THEN CAST(octet_length(encode(body404)) AS BIGINT) " +
        "ELSE CAST(octet_length(encode(body200)) AS BIGINT) END AS body_len " +
        "FROM b"),
    // q100: the oracle replays the full brute-force meet (every train ×
    // holdout cosine at 6 dp — q19/q25's proven list_cosine_similarity
    // parity), the rounded-threshold compare, and the lowest-id tie rule
    // as a max-then-min join, so the struct-max spelling cannot drift
    "q100_semantic_decon" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "t AS (SELECT * FROM e WHERE vec_id % 10 <> 7), " +
        "h AS (SELECT vec_id AS h_id, v AS hv FROM e WHERE vec_id % 10 = 7), " +
        "p AS (SELECT t.vec_id, h.h_id, " +
        "round(list_cosine_similarity(t.v, h.hv), 6) AS s FROM t CROSS JOIN h), " +
        "m AS (SELECT vec_id, max(s) AS max_sim FROM p GROUP BY vec_id), " +
        "r AS (SELECT p.vec_id, m.max_sim, min(p.h_id) AS src_holdout " +
        "FROM p JOIN m ON p.vec_id = m.vec_id AND p.s = m.max_sim " +
        "GROUP BY p.vec_id, m.max_sim) " +
        "SELECT vec_id, max_sim, src_holdout, " +
        "CAST(max_sim >= 0.34 AS INTEGER) AS contaminated FROM r"),
    // q101: the oracle recomputes the 64-bit average-hash CELL BY CELL
    // from the image-space residue maps (floor grid mapping, Rec.601
    // integer luma, floor mean, strict-above bits, LSB-first packing
    // rebuilt through HUGEINT row-byte arithmetic with the two's-
    // complement fold), so a grid, orientation, mean, or bit-order slip
    // in the kernel cannot cancel; grouping replays the window
    "q101_image_dedup" ->
      ("WITH " + ahashCellCtes("CASE WHEN doc_id % 6 = 5 THEN doc_id - 1 ELSE doc_id END", "0") +
        ", " + AhashPackCtes + ", " +
        "fl AS (SELECT d.doc_id, " +
        "CASE WHEN d.doc_id % 11 = 3 THEN 'truncated' " +
        "WHEN d.doc_id % 2 = 0 THEN 'bmp24' ELSE 'bmp32' END AS container, " +
        "hh.ahash FROM documents d LEFT JOIN hh ON d.doc_id = hh.doc_id) " +
        "SELECT doc_id, container, ahash, " +
        "CASE WHEN ahash IS NOT NULL THEN min(doc_id) OVER (PARTITION BY ahash) END AS rep, " +
        "CASE WHEN ahash IS NOT NULL THEN " +
        "CAST(min(doc_id) OVER (PARTITION BY ahash) < doc_id AS INTEGER) END AS is_dup " +
        "FROM fl"),
    // q102: same hash replay with the clipped green shift in the cell
    // luma; bands extracted from the UNSIGNED hv (floor-div + mod — a
    // signed shift would sign-extend bit 63 into band 3), pair meet and
    // the exact Hamming (bit_count of xor) replayed independently
    "q102_image_neardup" ->
      ("WITH " + ahashCellCtes(
        "CASE WHEN doc_id % 7 IN (3, 5) THEN doc_id - 1 ELSE doc_id END",
        "CASE WHEN doc_id % 7 = 3 THEN 40 ELSE 0 END") +
        ", " + AhashPackCtes + ", " +
        "bands AS (SELECT doc_id, ahash, band, " +
        "CAST((hv // CAST(p AS HUGEINT)) % 65536 AS BIGINT) AS bval " +
        "FROM hh, (VALUES (0, 1), (1, 65536), (2, 4294967296), " +
        "(3, 281474976710656)) AS bp(band, p)), " +
        "pr AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval " +
        "AND a.doc_id < b.doc_id) " +
        "SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 10"),
    // q103: the oracle replays sitemap synthesis (CDATA wrap, newline
    // padding, escaped ampersand, missing lastmod, truncated %9==6
    // class) and the extraction — first-match regexps, \s-trim, CDATA
    // strip by CASE arithmetic, single &amp; decode, the shared
    // canonicalization — with newlines as chr(10) (a DuckDB '\n'
    // literal is backslash-n, not a newline)
    "q103_sitemap_ingest" ->
      ("WITH sy AS (SELECT doc_id, " +
        "'<?xml version=\"1.0\" encoding=\"UTF-8\"?>' || chr(10) || " +
        "'<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">' || chr(10) || " +
        "array_to_string(list_transform(range(0, CAST(doc_id % 4 + 1 AS BIGINT)), j -> " +
        "'<url><loc>' || " +
        "(CASE WHEN doc_id % 5 = 2 AND j = 0 THEN '<![CDATA[' || " +
        "'https://site' || (doc_id % 40) || '.example.com/s/' || doc_id || '/' || j || " +
        "(CASE WHEN doc_id % 7 = 3 AND j = 1 THEN '?a=1&amp;b=2' ELSE '' END) || ']]>' " +
        "WHEN doc_id % 2 = 1 THEN chr(10) || '   ' || " +
        "'https://site' || (doc_id % 40) || '.example.com/s/' || doc_id || '/' || j || " +
        "(CASE WHEN doc_id % 7 = 3 AND j = 1 THEN '?a=1&amp;b=2' ELSE '' END) || ' ' || chr(10) || ' ' " +
        "ELSE 'https://site' || (doc_id % 40) || '.example.com/s/' || doc_id || '/' || j || " +
        "(CASE WHEN doc_id % 7 = 3 AND j = 1 THEN '?a=1&amp;b=2' ELSE '' END) END) || " +
        "'</loc>' || " +
        "(CASE WHEN (doc_id + j) % 4 = 0 THEN '' ELSE " +
        "'<lastmod>2024-0' || ((doc_id + j) % 9 + 1) || '-1' || (j % 3) || '</lastmod>' END) || " +
        "'<priority>0.' || ((doc_id + j) % 10) || '</priority></url>'), chr(10)) || " +
        "(CASE WHEN doc_id % 9 = 6 THEN '' ELSE chr(10) || '</urlset>' END) AS xml " +
        "FROM documents), " +
        "ex AS (SELECT doc_id, CAST(strpos(xml, '</urlset>') > 0 AS INTEGER) AS sitemap_ok, " +
        "CASE WHEN strpos(xml, '</urlset>') > 0 THEN " +
        "regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) END AS es FROM sy), " +
        "un AS (SELECT doc_id, sitemap_ok, " +
        "unnest(es) AS entry, generate_subscripts(es, 1) - 1 AS entry_idx FROM ex " +
        "WHERE es IS NOT NULL " +
        "UNION ALL SELECT doc_id, sitemap_ok, NULL, NULL FROM ex WHERE es IS NULL), " +
        "lr AS (SELECT doc_id, sitemap_ok, entry_idx, entry, " +
        "regexp_replace(regexp_replace(" +
        "regexp_extract(entry, '(?s)<loc>(.*?)</loc>', 1), '^\\s+', ''), '\\s+$', '') AS locraw " +
        "FROM un), " +
        "lc AS (SELECT doc_id, sitemap_ok, entry_idx, entry, " +
        "replace(regexp_replace(regexp_replace(" +
        "CASE WHEN starts_with(locraw, '<![CDATA[') AND ends_with(locraw, ']]>') " +
        "THEN substring(locraw, 10, length(locraw) - 12) ELSE locraw END, " +
        "'^\\s+', ''), '\\s+$', ''), '&amp;', '&') AS loc FROM lr), " +
        "px AS (SELECT doc_id, sitemap_ok, entry_idx, entry, loc, loc AS _u FROM lc), " +
        canonicalCtes("px") + " " +
        "SELECT doc_id, sitemap_ok, CAST(entry_idx AS INTEGER) AS entry_idx, " +
        "CASE WHEN entry IS NOT NULL THEN loc END AS loc, " +
        "CASE WHEN entry IS NOT NULL THEN canonical_url END AS canonical_url, " +
        "CASE WHEN entry IS NOT NULL AND " +
        "regexp_extract(entry, '<lastmod>([^<]*)</lastmod>', 1) <> '' THEN " +
        "regexp_extract(entry, '<lastmod>([^<]*)</lastmod>', 1) END AS lastmod, " +
        "CASE WHEN entry IS NOT NULL THEN " +
        "CAST(regexp_extract(regexp_extract(entry, '<priority>([^<]*)</priority>', 1), " +
        "'^0\\.([0-9])$', 1) AS INTEGER) END AS priority_x10 " +
        "FROM c"),
    // q104: each column's profile replayed as its own aggregate — the
    // oracle does NOT mirror the one-pass stack shape, so a wrong
    // Expand/unpivot wiring (a metric landing under the wrong column
    // label) cannot cancel
    "q104_column_profile" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
          s"CAST(count(*) - count($c) AS BIGINT) AS n_null, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v " +
          "FROM documents").mkString(" UNION ALL "),
    // q105: verdicts derived DIRECTLY from residues — the oracle never
    // joins, so a wrong join type (inner dropping 'gone', left dropping
    // 'new') or a digest of the wrong snapshot cannot cancel
    "q105_crawl_diff" ->
      ("WITH base AS (SELECT doc_id, " +
        "'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || " +
        "'/page' || doc_id || '.html' AS url, text FROM documents) " +
        "SELECT url, " +
        "CASE WHEN doc_id % 7 = 4 THEN 'gone' WHEN doc_id % 7 = 1 THEN 'changed' " +
        "ELSE 'unchanged' END AS verdict, " +
        "md5(text) AS old_md5, " +
        "CASE WHEN doc_id % 7 = 4 THEN NULL WHEN doc_id % 7 = 1 THEN " +
        "md5(text || ' updated section ' || (doc_id % 5)) ELSE md5(text) END AS new_md5, " +
        "CAST(doc_id % 7 NOT IN (1, 4) AS INTEGER) AS revisit FROM base " +
        "UNION ALL " +
        "SELECT url || 'x', 'new', NULL, md5('fresh ' || text), 0 FROM base " +
        "WHERE doc_id % 7 = 2"),
    // q106: the oracle replays the block split over the SAME script-
    // stripped body (htmlCtes' y.nos — splitting before the script
    // strip would hit the </p> inside the script literal), the per-block
    // clean, link-char sums, and the integer density compare
    "q106_content_blocks" ->
      ("WITH " + htmlCtes + ", " +
        "bl AS (SELECT doc_id, " +
        "unnest(string_split_regex(nos, '</p>|</nav>|</footer>|</h1>')) AS frag, " +
        "generate_subscripts(string_split_regex(nos, '</p>|</nav>|</footer>|</h1>'), 1) - 1 AS block_idx " +
        "FROM y WHERE wf), " +
        "cl AS (SELECT doc_id, block_idx, frag, " +
        "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
        "regexp_replace(frag, '<(?:[^>\"'']|\"[^\"]*\"|''[^'']*'')*>', ' ', 'g'), " +
        "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
        "'&#39;', ''''), '&amp;', '&'), '\\s+', ' ', 'g')) AS block_text FROM bl), " +
        "lk AS (SELECT doc_id, block_idx, block_text, " +
        "CAST(coalesce(list_sum(list_transform(" +
        "regexp_extract_all(frag, '<a [^>]*>(.*?)</a>', 1), x -> length(x))), 0) AS BIGINT) " +
        "AS n_link_chars FROM cl) " +
        "SELECT doc_id, CAST(block_idx AS INTEGER) AS block_idx, block_text, " +
        "CAST(length(block_text) AS BIGINT) AS n_chars, n_link_chars, " +
        "CAST(length(block_text) >= 25 AND 3 * n_link_chars <= length(block_text) AS INTEGER) AS keep " +
        "FROM lk WHERE block_text <> ''"),
    // q85/q86: the merge count is a FIXED small constant, so the
    // "iterative" training loop unrolls into 10 chained CTE rounds — no
    // recursion needed. Each round replays the trainer exactly: adjacency
    // pair counts weighted by word frequency, argmax with the (cnt DESC,
    // l, r) tie-break, then the leftmost-greedy fold as a list_reduce over
    // singleton lists (acc's tail merges with the incoming symbol iff the
    // pair matches; a fresh merge never re-merges, the kernel's rule).
    "q85_bpe_train" -> bpeTrainSql,
    // q86 rides the same unrolled training: after round 10 every trained
    // word's symbol count IS its BPE token count (the encode kernel
    // replays merges in rank order, reaching the training-end state), so
    // per-doc totals are a vocabulary join, never a per-doc re-encode
    "q86_bpe_tokens" -> (bpeCtes +
      s", vocab AS (SELECT word, CAST(len(syms) AS BIGINT) AS n FROM wf$BpeMerges), " +
      s"dw AS (SELECT doc_id, unnest(${bpeTok("text")}) AS word FROM documents), " +
      "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(n) AS BIGINT) AS n_bpe FROM dw JOIN vocab USING (word) GROUP BY doc_id) " +
      "SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words, " +
      "CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(a.n_bpe, 0) END AS n_bpe_tokens " +
      "FROM documents d LEFT JOIN agg a USING (doc_id)"),
  )

  /** aHash replay, part 1 (q101/q102): the `cell` CTE — 8×8 grid lumas
    * recomputed from the image-space residue channel maps. `sidCase`
    * picks the source-image id; `nudgeCase` is q102's clipped green
    * shift (0 for q101).
    */
  private def ahashCellCtes(sidCase: String, nudgeCase: String): String =
    "g AS (SELECT doc_id, " + sidCase + " AS sid, " + nudgeCase + " AS nd " +
      "FROM documents), " +
      "dims AS (SELECT doc_id, sid, nd, sid % 13 + 4 AS w, sid % 11 + 4 AS h FROM g), " +
      "cell AS (SELECT doc_id, gy, gx, " +
      "(299 * ((sid * 2 + (gx * w // 8) + (gy * h // 8) * 11) % 256) + " +
      "587 * least((sid * 3 + (gx * w // 8) * 5 + (gy * h // 8)) % 256 + nd, 255) + " +
      "114 * ((sid + (gx * w // 8) * 7 + (gy * h // 8) * 13) % 256)) // 1000 AS l " +
      "FROM dims, UNNEST(range(0, 8)) AS ty(gy), UNNEST(range(0, 8)) AS tx(gx) " +
      "WHERE doc_id % 11 <> 3)"

  /** aHash replay, part 2: floor mean, strict-above bits, LSB-first
    * packing via HUGEINT row-byte arithmetic; `hh` carries the signed
    * 64-bit `ahash` AND the unsigned `hv` (q102's band extraction reads
    * the unsigned form — a signed right shift would sign-extend).
    */
  private val AhashPackCtes: String =
    "m AS (SELECT doc_id, sum(l) // 64 AS mean FROM cell GROUP BY doc_id), " +
      "rowb AS (SELECT c.doc_id, c.gy, " +
      "sum(CASE WHEN c.l > m.mean THEN CAST(1 AS BIGINT) << c.gx ELSE 0 END) AS rb " +
      "FROM cell c JOIN m ON c.doc_id = m.doc_id GROUP BY c.doc_id, c.gy), " +
      "hug AS (SELECT doc_id, sum(CAST(rb AS HUGEINT) * CAST(mult AS HUGEINT)) AS hv " +
      "FROM rowb JOIN (VALUES (0, 1), (1, 256), (2, 65536), (3, 16777216), " +
      "(4, 4294967296), (5, 1099511627776), (6, 281474976710656), " +
      "(7, 72057594037927936)) AS mt(gy2, mult) ON rowb.gy = mt.gy2 " +
      "GROUP BY doc_id), " +
      "hh AS (SELECT doc_id, hv, " +
      "CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT) " +
      "THEN hv - CAST('18446744073709551616' AS HUGEINT) ELSE hv END AS BIGINT) AS ahash " +
      "FROM hug)"

  /** DuckDB replay of q93's page synthesis + extraction pipeline —
    * spliced by q93 AND q97 (whose WARC payload IS the q93 page), so the
    * standalone extraction and the composed intake cannot drift.
    * Downstream reads `d` (doc_id, html, body_raw, wf, t, tc).
    */
  /** q116 and q189 share one oracle: the six-layer intake
    * contract is identical whichever compression rung wraps the
    * WARC member. */
  private lazy val fullStackOracle: String =
    "WITH " + htmlCtes + " " +
        "SELECT doc_id, " +
        "CASE WHEN doc_id % 13 = 9 THEN 0 ELSE 1 END AS fetch_ok, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE " +
        "'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || " +
        "'/page' || doc_id || '.html' END AS uri, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE 200 END AS status, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE CAST(doc_id % 5 <> 4 AS INTEGER) END AS te_chunked, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL " +
        "WHEN doc_id % 3 = 0 THEN 'utf-16le' " +
        "WHEN doc_id % 3 = 1 THEN 'iso-8859-1' ELSE 'utf-8' END AS charset, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE md5(html) END AS payload_md5, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL " +
        "WHEN t <> '' THEN t END AS title, " +
        "CASE WHEN doc_id % 13 = 9 THEN NULL ELSE CAST(wf AS INTEGER) END AS well_formed, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE " +
        "CAST((length(body_raw) - length(replace(body_raw, '<a href=\"', ''))) // 9 AS BIGINT) END AS n_links, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE tc END AS text_clean, " +
        "CASE WHEN doc_id % 13 = 9 OR NOT wf THEN NULL ELSE CAST(length(tc) AS BIGINT) END AS n_chars_clean " +
        "FROM d"

  private lazy val htmlCtes: String =
    "wz AS (SELECT doc_id, text, " +
      "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS w " +
      "FROM documents), " +
      "h AS (SELECT doc_id, " +
      "'<html><head><title>Doc ' || doc_id || ': ' || coalesce(w[1], 'alpha') || " +
      "' &amp;lt;tag</title>' || " +
      "(CASE WHEN doc_id % 4 = 0 THEN '<style>.m{color:#000;}</style>' ELSE '' END) || " +
      "'</head>' || " +
      "'<body><nav><a href=\"/home\">Home</a> <a href=\"/tag/' || (doc_id % 8) || " +
      "'\">T</a></nav>' || " +
      "'<h1>' || coalesce(w[1], 'alpha') || ' &amp; ' || coalesce(w[2], 'beta') || '</h1>' || " +
      "'<p>' || text || '</p>' || " +
      "(CASE WHEN doc_id % 3 <> 2 THEN " +
      "'<script type=\"text/javascript\">var s=\"</div> <p>no</p>\";</script>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 5 = 1 THEN '<p data-note=\"a>b\">edge &lt;kept&gt;</p>' ELSE '' END) || " +
      "'<p>AT&amp;T 1 &lt; 2' || " +
      "(CASE WHEN doc_id % 7 = 2 THEN '&nbsp;end &#39;q&#39; &quot;qq&quot;' ELSE '' END) || " +
      "'</p>' || '<footer>(c) site' || (doc_id % 40) || '</footer>' || " +
      "(CASE WHEN doc_id % 9 = 5 THEN '' ELSE '</body></html>' END) AS html FROM wz), " +
      "x AS (SELECT doc_id, html, " +
      "regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1) AS title_raw, " +
      "regexp_extract(html, '(?s)<body[^>]*>(.*?)</body>', 1) AS body_raw FROM h), " +
      "y AS (SELECT doc_id, html, title_raw, body_raw, body_raw <> '' AS wf, " +
      "regexp_replace(regexp_replace(body_raw, " +
      "'(?s)<script\\b[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?s)<style\\b[^>]*>.*?</style>', ' ', 'g') AS nos FROM x), " +
      "z AS (SELECT doc_id, html, title_raw, body_raw, wf, " +
      "regexp_replace(nos, '<(?:[^>\"'']|\"[^\"]*\"|''[^'']*'')*>', ' ', 'g') AS notags FROM y), " +
      "d AS (SELECT doc_id, html, body_raw, wf, " +
      "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
      "title_raw, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', ''''), '&amp;', '&'), '\\s+', ' ', 'g')) AS t, " +
      "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
      "notags, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', ''''), '&amp;', '&'), '\\s+', ' ', 'g')) AS tc FROM z)"

  /** DuckDB replay of [[graft.operators.Crawl.resolvedLinks]] — anchor
    * synthesis, href extraction with positions, skip classes, RFC 3986
    * resolution, the shared canonicalization — spliced by BOTH q94 and
    * q96 so the two oracles' view of the link graph cannot drift.
    * Downstream reads `c` (doc_id, link_idx, href, skip_reason, _u,
    * canonical_url).
    */
  private lazy val linkCtes: String =
    "hh AS (SELECT doc_id, " +
      "'<a href=\"/r/' || (doc_id % 10) || '\">t</a>' || " +
      "'<a href=\"sub/p' || (doc_id % 5) || '.html\">t</a>' || " +
      "'<a href=\"https://site' || ((doc_id + 3) % 40) || '.example.com/x/' || (doc_id % 6) || '\">t</a>' || " +
      "(CASE WHEN doc_id % 4 = 1 THEN '<a href=\"HTTPS://SITE' || ((doc_id + 5) % 40) || " +
      "'.EXAMPLE.COM:443/y/' || (doc_id % 4) || '?utm_source=x&id=' || (doc_id % 3) || '\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 3 = 0 THEN '<a href=\"//cdn' || (doc_id % 8) || '.example.net/lib\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 8 = 6 THEN '<a href=\"https://site' || (doc_id % 40) || '.example.com/a/' || " +
      "(doc_id % 20) || '/page' || doc_id || '.html\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 9 = 2 THEN '<a href=\"https://site' || ((doc_id - 1) % 40) || '.example.com/a/' || " +
      "((doc_id - 1) % 20) || '/page' || (doc_id - 1) || '.html\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 5 = 2 THEN '<a href=\"#sec' || (doc_id % 3) || '\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 6 = 3 THEN '<a href=\"mailto:u' || (doc_id % 7) || '@e.com\">t</a>' ELSE '' END) || " +
      "(CASE WHEN doc_id % 7 = 4 THEN '<a href=\"javascript:void(0)\">t</a>' ELSE '' END) AS html " +
      "FROM documents), " +
      "lx AS (SELECT doc_id, " +
      "unnest(regexp_extract_all(html, '<a href=\"([^\"]*)\"', 1)) AS href, " +
      "generate_subscripts(regexp_extract_all(html, '<a href=\"([^\"]*)\"', 1), 1) - 1 AS link_idx " +
      "FROM hh), " +
      "rs AS (SELECT doc_id, link_idx, href, " +
      "CASE WHEN starts_with(href, '#') THEN 'fragment' " +
      "WHEN starts_with(href, 'mailto:') THEN 'mailto' " +
      "WHEN starts_with(href, 'javascript:') THEN 'javascript' END AS skip_reason, " +
      "CASE WHEN starts_with(href, '#') OR starts_with(href, 'mailto:') " +
      "OR starts_with(href, 'javascript:') THEN NULL " +
      "WHEN regexp_matches(href, '^[A-Za-z]+://') THEN href " +
      "WHEN starts_with(href, '//') THEN 'https:' || href " +
      "WHEN starts_with(href, '/') THEN 'https://site' || (doc_id % 40) || '.example.com' || href " +
      "ELSE 'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || '/' || href END AS _u " +
      "FROM lx), " +
      canonicalCtes("rs")

  /** q94's frontier judgment as a CTE chain ending in `fq` — spliced by
    * q94 and q98 (which gates the kept frontier), so the two oracles'
    * view of "what was discovered" cannot drift.
    */
  private lazy val frontierCtes: String =
    linkCtes + ", " +
      "sn AS (SELECT 'https://site' || (doc_id % 40) || '.example.com/a/' || (doc_id % 20) || " +
      "'/page' || doc_id || '.html' AS seen_url FROM documents), " +
      "j AS (SELECT c.*, CASE WHEN sn.seen_url IS NOT NULL THEN 1 ELSE 0 END AS _fetched " +
      "FROM c LEFT JOIN sn ON c.canonical_url = sn.seen_url), " +
      "fq AS (SELECT doc_id, CAST(link_idx AS INTEGER) AS link_idx, href, " +
      "_u AS resolved_url, canonical_url, skip_reason, " +
      "CASE WHEN skip_reason IS NULL THEN _fetched END AS already_fetched, " +
      "CASE WHEN skip_reason IS NULL THEN " +
      "CAST(_fetched = 0 AND (doc_id * 16 + link_idx) = " +
      "min(doc_id * 16 + link_idx) OVER (PARTITION BY canonical_url) AS INTEGER) END AS keep " +
      "FROM j)"

  /** q96's unrolled power iteration (the q85 discipline): each round k
    * computes per-target contribution sums keyed by source host, the
    * dangling mass, and the damped integer update — all floor division,
    * so five chained rounds are bit-identical to the Spark loop.
    */
  /** The rank CTE chain alone (graph discovery over `c` + unrolled
    * rounds, ending in `r5`) — spliced by q96's full query and q107's
    * host-priority dim, so the scheduler's view of rank cannot drift
    * from the rank query itself.
    */
  private lazy val linkRankCtes: String = {
    val graph =
      "e AS (SELECT DISTINCT 'site' || (doc_id % 40) || '.example.com' AS src, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS dst " +
        "FROM c WHERE canonical_url IS NOT NULL), " +
        "vtx AS (SELECT src AS host FROM e UNION SELECT dst FROM e), " +
        "dg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM e GROUP BY src), " +
        "vd AS (SELECT vtx.host, coalesce(dg.odeg, 0) AS out_deg FROM vtx " +
        "LEFT JOIN dg ON vtx.host = dg.src), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vd), " +
        "r0 AS (SELECT host, out_deg, (1000000000000 // nn.n) AS r FROM vd CROSS JOIN nn)"
    val rounds = (1 to 5).map { k =>
      val prev = s"r${k - 1}"
      s"s$k AS (SELECT e.dst, sum(p.r // p.out_deg) AS sc FROM e " +
        s"JOIN $prev p ON e.src = p.host GROUP BY e.dst), " +
        s"d$k AS (SELECT coalesce(sum(r), 0) AS d FROM $prev WHERE out_deg = 0), " +
        s"r$k AS (SELECT vd.host, vd.out_deg, (150000000000 // nn.n) + " +
        s"(17 * (coalesce(s$k.sc, 0) + (d$k.d // nn.n))) // 20 AS r " +
        s"FROM vd CROSS JOIN nn CROSS JOIN d$k LEFT JOIN s$k ON vd.host = s$k.dst)"
    }.mkString(", ")
    graph + ", " + rounds
  }

  private lazy val linkRankSql: String =
    "WITH " + linkCtes + ", " + linkRankCtes + " " +
      "SELECT host, out_deg, CAST(r AS BIGINT) AS rank_p5 FROM r5"

  /** q98's rule table + RFC 9309 judgment as a CTE chain over the kept
    * frontier (`fq` from [[frontierCtes]]), ending in `ag` — spliced by
    * q98 and q107, so the gate and the scheduler judge identically. `fr`
    * carries the discoverer position (`min` is the value itself: keep=1
    * rows are unique per URL) so the scheduler can sequence without
    * re-deriving it.
    */
  private lazy val robotsCtes: String =
    "fr AS (SELECT canonical_url, min(doc_id * 16 + link_idx) AS disc_pos " +
      "FROM fq WHERE keep = 1 GROUP BY canonical_url), " +
      "fu AS (SELECT canonical_url, disc_pos, " +
      "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS host, " +
      "regexp_extract(canonical_url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path FROM fr), " +
      "hs AS (SELECT CAST(range AS INTEGER) AS h FROM range(0, 40)), " +
      "rl AS (" +
      "SELECT 'site' || h || '.example.com' AS rhost, '*' AS ua, 'disallow' AS rtype, '/r/' AS prefix FROM hs WHERE h % 3 = 0 " +
      "UNION ALL SELECT 'site' || h || '.example.com', '*', 'allow', '/r/' || (h % 10) FROM hs WHERE h % 4 = 1 " +
      "UNION ALL SELECT 'site' || h || '.example.com', '*', 'disallow', '/a/' FROM hs WHERE h % 5 = 2 " +
      "UNION ALL SELECT 'site' || h || '.example.com', '*', 'allow', '/a/' || (h % 20) || '/sub/' FROM hs WHERE h % 5 = 2 " +
      "UNION ALL SELECT 'site' || h || '.example.com', '*', 'disallow', '/y/' FROM hs WHERE h % 2 = 0 " +
      "UNION ALL SELECT 'site' || h || '.example.com', 'graftbot', 'disallow', '/' FROM hs WHERE h % 7 = 3), " +
      "gb AS (SELECT DISTINCT rhost FROM rl WHERE ua = 'graftbot'), " +
      "sel AS (SELECT fu.*, CASE WHEN gb.rhost IS NOT NULL THEN 'graftbot' ELSE '*' END AS ua_sel " +
      "FROM fu LEFT JOIN gb ON fu.host = gb.rhost), " +
      "mt AS (SELECT sel.canonical_url, sel.host, sel.path, sel.ua_sel, sel.disc_pos, rl.rtype, rl.prefix " +
      "FROM sel LEFT JOIN rl ON rl.rhost = sel.host AND rl.ua = sel.ua_sel " +
      "AND starts_with(sel.path, rl.prefix)), " +
      "ag AS (SELECT canonical_url, host, path, ua_sel, disc_pos, " +
      "arg_max(rtype, 2 * length(prefix) + CASE WHEN rtype = 'allow' THEN 1 ELSE 0 END) AS rule_type, " +
      "arg_max(prefix, 2 * length(prefix) + CASE WHEN rtype = 'allow' THEN 1 ELSE 0 END) AS matched_rule " +
      "FROM mt GROUP BY canonical_url, host, path, ua_sel, disc_pos)"

  /** The gate verdict spellings shared by the q98 and q107 oracles. */
  private val allowedSql: String =
    "CASE WHEN rule_type IS NULL OR rule_type = 'allow' THEN 1 ELSE 0 END"
  private val crawlDelaySql: String =
    "CASE WHEN ua_sel = '*' AND try_cast(regexp_extract(host, '^site([0-9]+)\\.', 1) AS INTEGER) % 2 = 0 " +
      "THEN CAST(try_cast(regexp_extract(host, '^site([0-9]+)\\.', 1) AS INTEGER) % 5 + 1 AS INTEGER) END"

  /** DuckDB spelling of `Text.canonicalUrl` over column `_u` of CTE
    * `from`, emitted as the p/k/c chain with `*` passthrough — q91 and
    * q94 splice the SAME text, so the two oracles' canonicalization
    * cannot drift from each other (they both still replay the Spark side
    * independently). Downstream reads `canonical_url` from `c`.
    */
  private def canonicalCtes(from: String): String =
    "p AS (SELECT *, " +
      "lower(regexp_extract(_u, '^([A-Za-z]+)://', 1)) AS _scheme, " +
      "lower(regexp_extract(regexp_extract(_u, '^[A-Za-z]+://([^/?#]+)', 1), '^([^:]+)', 1)) AS _host, " +
      "regexp_extract(regexp_extract(_u, '^[A-Za-z]+://([^/?#]+)', 1), ':([0-9]+)$', 1) AS _port, " +
      "regexp_replace(regexp_extract(_u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '') AS _path, " +
      "regexp_extract(_u, '\\?([^#]*)', 1) AS _query FROM " + from + "), " +
      // array_to_string of an EMPTY list is NULL in DuckDB — coalesce,
      // or every tracking-only query nulls the whole canonical concat
      "k AS (SELECT *, coalesce(array_to_string(list_filter(string_split(_query, '&'), " +
      "x -> x <> '' AND NOT starts_with(x, 'utm_') AND NOT starts_with(x, 'fbclid=')), '&'), '') AS _qc FROM p), " +
      "c AS (SELECT *, _scheme || '://' || _host || " +
      "(CASE WHEN _port = '' OR (_scheme = 'https' AND _port = '443') " +
      "OR (_scheme = 'http' AND _port = '80') THEN '' ELSE ':' || _port END) || " +
      "_path || (CASE WHEN _qc = '' THEN '' ELSE '?' || _qc END) AS canonical_url FROM k)"

  /** The tokenizer every text oracle shares, over column `c`. */
  private def bpeTok(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), w -> w <> '')"

  private val BpeMerges = 10

  /** The unrolled merge rounds over a prepared `wf0 ($key, freq, syms)`
    * frame: `wf0` through `wf{merges}`, each round's winning pair in
    * `t{k}` — shared by the character-level (q85/q86) and byte-level
    * (q123) oracles, in lockstep with the Spark side's shared
    * `Bpe.mergeLoop`.
    */
  private def bpeRounds(key: String, merges: Int): String =
    (1 to merges).map { k =>
      val prev = s"wf${k - 1}"
      s"p$k AS (SELECT syms[i] AS l, syms[i+1] AS r, freq FROM " +
        s"(SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM $prev WHERE len(syms) >= 2)), " +
        s"t$k AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM p$k " +
        "GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 1), " +
        s"wf$k AS (SELECT $key, freq, CASE WHEN len(syms) < 2 THEN syms " +
        "ELSE list_reduce(list_transform(syms, s -> [s]), (acc, x) -> " +
        "CASE WHEN acc[-1] = t.l AND x[1] = t.r " +
        "THEN acc[1:len(acc)-1] || [t.l || t.r] ELSE acc || x END) END AS syms " +
        s"FROM $prev, t$k AS t)"
    }.mkString(", ")

  /** The unrolled training rounds: `wf0` (word, freq, chars) through
    * `wf10`, with each round's winning pair in `t{k}`.
    */
  private lazy val bpeCtes: String = {
    val base = s"WITH toks AS (SELECT unnest(${bpeTok("text")}) AS word FROM documents), " +
      "wf0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq, " +
      "list_transform(range(1, len(word)+1), i -> word[i]) AS syms FROM toks GROUP BY word)"
    s"$base, ${bpeRounds("word", BpeMerges)}"
  }

  /** The byte-level twin: pre-tokens via the shared regex (case kept,
    * whitespace runs included), symbols as uppercase 2-hex-char byte
    * strings — `hex(encode(tok))` chunked in 2s, exactly the Spark
    * trainer's representation.
    */
  private lazy val byteBpeCtes: String = {
    val re = graft.functions.ByteBpeEval.PreTok
    val base = s"WITH toks AS (SELECT unnest(regexp_extract_all(text, '$re')) AS tok FROM documents), " +
      "wf0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq, " +
      "list_transform(range(1, octet_length(encode(tok)) + 1), " +
      "i -> substr(hex(encode(tok)), 2*i - 1, 2)) AS syms FROM toks GROUP BY tok)"
    s"$base, ${bpeRounds("tok", BpeMerges)}"
  }

  /** Q123 oracle — the byte-level unrolled train+encode: after round 10
    * every trained pre-token's symbol count IS its byte-BPE token count,
    * so per-doc totals are a vocabulary join (the q86 stance), and
    * n_bytes comes from the raw UTF-8 encoding.
    */
  private lazy val byteBpeSql: String = byteBpeCtes +
    s", vocab AS (SELECT tok, CAST(len(syms) AS BIGINT) AS n FROM wf$BpeMerges), " +
    s"dw AS (SELECT doc_id, unnest(regexp_extract_all(text, " +
    s"'${graft.functions.ByteBpeEval.PreTok}')) AS tok FROM documents), " +
    "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pretoks, " +
    "CAST(sum(n) AS BIGINT) AS n_bpe FROM dw JOIN vocab USING (tok) GROUP BY doc_id) " +
    "SELECT d.doc_id, CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes, " +
    "coalesce(a.n_pretoks, 0) AS n_pretoks, " +
    "coalesce(a.n_bpe, 0) AS n_bpe_tokens " +
    "FROM documents d LEFT JOIN agg a USING (doc_id)"

  private lazy val bpeTrainSql: String = bpeCtes + " " +
    (1 to BpeMerges).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS round, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM t$k"""
    }.mkString(" UNION ALL ")
}
