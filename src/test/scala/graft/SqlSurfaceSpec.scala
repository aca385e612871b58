package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Pipeline, Text}

/** The SQL surface over the LLM-pipeline operators: Bootstrap.initCorpusOps
  * registers the dedup / decontamination / corpus-manifest plans as temp
  * views; these pin that a SQL-only user gets row-identical results to the
  * DataFrame path, and that the views compose in plain SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("corpus-ops views hash-match their DataFrame twins") {
    Bootstrap.initCorpusOps(spark, TestSpark.Sf0001)
    val twins = Seq(
      "vw_exact_dedup" -> Dedup.q21ExactDedup(spark, TestSpark.Sf0001),
      "vw_dedup_clusters" -> Dedup.q37DedupClusters(spark, TestSpark.Sf0001),
      "vw_decontaminate" -> Text.q45Decontaminate(spark, TestSpark.Sf0001),
      "vw_corpus_manifest" -> Pipeline.q51CorpusPipeline(spark, TestSpark.Sf0001),
      "vw_media_manifest" ->
        Multimodal.q58MediaManifest(spark, TestSpark.Sf0001),
      "vw_doc_quality" -> Text.docQuality(spark, TestSpark.Sf0001),
      "vw_web_preclean" -> Text.q71WebPreclean(spark, TestSpark.Sf0001),
      "vw_incremental_dedup" -> Dedup.q74IncrementalDedup(spark, TestSpark.Sf0001),
      "vw_semdedup" -> Dedup.q79SemDedup(spark, TestSpark.Sf0001),
      "vw_shard_manifest" ->
        graft.operators.Scale.q80ShardAssign(spark, TestSpark.Sf0001),
      "vw_bm25" ->
        graft.operators.Retrieval.q83Bm25TopK(spark, TestSpark.Sf0001),
      "vw_frontier" ->
        graft.operators.Crawl.q94LinkFrontier(spark, TestSpark.Sf0001),
      "vw_link_rank" ->
        graft.operators.Crawl.q96LinkRank(spark, TestSpark.Sf0001),
      "vw_crawl_intake" ->
        graft.operators.Crawl.q97CrawlIntake(spark, TestSpark.Sf0001),
      "vw_robots_gate" ->
        graft.operators.Crawl.q98RobotsGate(spark, TestSpark.Sf0001),
      "vw_fetch_schedule" ->
        graft.operators.Crawl.q107FetchSchedule(spark, TestSpark.Sf0001),
      "vw_semantic_decon" ->
        graft.operators.Similarity.q100SemanticDecon(spark, TestSpark.Sf0001),
      "vw_image_dedup" ->
        graft.operators.Multimodal.q101ImageDedup(spark, TestSpark.Sf0001),
      "vw_line_langid" -> Text.q110LineLangId(spark, TestSpark.Sf0001),
      "vw_recrawl_queue" ->
        graft.operators.Crawl.q113RecrawlPolicy(spark, TestSpark.Sf0001),
      "vw_wire_intake" ->
        graft.operators.Crawl.q116FullStackIntake(spark, TestSpark.Sf0001),
      "vw_funnel" ->
        graft.operators.Relational.q119Funnel(spark, TestSpark.Sf0001),
      "vw_cohorts" ->
        graft.operators.Relational.q120Cohorts(spark, TestSpark.Sf0001),
      "vw_charset_sniff" ->
        graft.operators.Crawl.q117CharsetSniff(spark, TestSpark.Sf0001),
      "vw_jpeg_stats" ->
        graft.operators.Multimodal.q118JpegPixels(spark, TestSpark.Sf0001),
      "vw_png_stats" ->
        graft.operators.Multimodal.q121PngPixels(spark, TestSpark.Sf0001),
      "vw_quality_model" ->
        graft.operators.Classifier.q122QualityClassifier(spark, TestSpark.Sf0001),
      "vw_gif_stats" ->
        graft.operators.Multimodal.q124GifPixels(spark, TestSpark.Sf0001),
      "vw_pdf_text" ->
        graft.sources.Pdf.q125PdfExtract(spark, TestSpark.Sf0001),
      "vw_utf16_intake" ->
        graft.operators.Crawl.q126Utf16Intake(spark, TestSpark.Sf0001),
      "vw_image_intake" ->
        graft.operators.Multimodal.q127ImageIntake(spark, TestSpark.Sf0001),
      "vw_tiff_meta" ->
        graft.operators.Multimodal.q129TiffMeta(spark, TestSpark.Sf0001),
      "vw_mp3_meta" ->
        graft.operators.Multimodal.q130Mp3Meta(spark, TestSpark.Sf0001),
      "vw_byte_bpe" ->
        graft.operators.Bpe.q123ByteBpe(spark, TestSpark.Sf0001),
      "vw_html_clean" -> Text.q128HtmlUnescape(spark, TestSpark.Sf0001),
      "vw_exif_intake" ->
        graft.operators.Multimodal.q131ExifIntake(spark, TestSpark.Sf0001),
      "vw_zip_extract" ->
        graft.sources.Zip.q132ZipExtract(spark, TestSpark.Sf0001),
      "vw_docx_text" ->
        graft.sources.Docx.q133DocxExtract(spark, TestSpark.Sf0001),
      "vw_csv_ingest" ->
        graft.sources.Csv.q134CsvIngest(spark, TestSpark.Sf0001),
      "vw_webp_stats" ->
        graft.operators.Multimodal.q135WebpPixels(spark, TestSpark.Sf0001),
      "vw_tar_extract" ->
        graft.sources.Tar.q136TarExtract(spark, TestSpark.Sf0001),
      "vw_mime_extract" ->
        graft.sources.Mime.q137MimeExtract(spark, TestSpark.Sf0001),
      "vw_subtitles" ->
        graft.operators.Subtitles.q138SubtitleExtract(spark, TestSpark.Sf0001),
      "vw_flac_meta" ->
        graft.operators.Multimodal.q139FlacMeta(spark, TestSpark.Sf0001),
      "vw_markdown" ->
        graft.operators.Markdown.q140MarkdownExtract(spark, TestSpark.Sf0001),
      "vw_feeds" ->
        graft.operators.Feeds.q141FeedIngest(spark, TestSpark.Sf0001),
      "vw_epub_text" ->
        graft.sources.Epub.q142EpubExtract(spark, TestSpark.Sf0001),
      "vw_mojibake" ->
        graft.operators.Mojibake.q143MojibakeRepair(spark, TestSpark.Sf0001),
      "vw_latex_text" ->
        graft.operators.Latex.q144LatexExtract(spark, TestSpark.Sf0001),
      "vw_bibtex" ->
        graft.operators.Bibtex.q145BibtexParse(spark, TestSpark.Sf0001),
      "vw_sitemaps" ->
        graft.operators.Sitemap.q146SitemapParse(spark, TestSpark.Sf0001),
      "vw_html_tables" ->
        graft.operators.HtmlTables.q147HtmlTables(spark, TestSpark.Sf0001),
      "vw_para_dedup" ->
        graft.operators.Dedup.q148ParaDedup(spark, TestSpark.Sf0001),
      "vw_ogg_meta" ->
        graft.operators.Multimodal.q149OggMeta(spark, TestSpark.Sf0001),
      "vw_lm_surprisal" ->
        graft.operators.Text.q150TrigramBackoff(spark, TestSpark.Sf0001),
      "vw_anchor_text" ->
        graft.operators.Crawl.q151AnchorText(spark, TestSpark.Sf0001),
      "vw_avi_meta" ->
        graft.operators.Multimodal.q152AviMeta(spark, TestSpark.Sf0001),
      "vw_json_shape" ->
        graft.operators.Relational.q153JsonShape(spark, TestSpark.Sf0001),
      "vw_page_verdict" ->
        graft.operators.Crawl.q154PageVerdict(spark, TestSpark.Sf0001),
      "vw_rtf_text" ->
        graft.sources.Rtf.q155RtfExtract(spark, TestSpark.Sf0001),
      "vw_postings" ->
        graft.operators.Retrieval.q156PostingsBuild(spark, TestSpark.Sf0001),
      "vw_sentences" ->
        graft.operators.Text.q157SentenceSplit(spark, TestSpark.Sf0001),
      "vw_id3_tags" ->
        graft.operators.Multimodal.q158Id3Tags(spark, TestSpark.Sf0001),
      "vw_svg_meta" ->
        graft.operators.Multimodal.q159SvgMeta(spark, TestSpark.Sf0001),
      "vw_tfrecord" ->
        graft.sources.TfRecord.q160TfrecordIngest(spark, TestSpark.Sf0001),
      "vw_tfexample" ->
        graft.sources.TfExample.q161TfExampleDecode(spark, TestSpark.Sf0001),
      "vw_ebml_meta" ->
        graft.operators.Multimodal.q162EbmlMeta(spark, TestSpark.Sf0001),
      "vw_wds_samples" ->
        graft.operators.Wds.q163WdsSamples(spark, TestSpark.Sf0001),
      "vw_avro_ingest" ->
        graft.sources.Avro.q164AvroIngest(spark, TestSpark.Sf0001),
      "vw_zstd_triage" ->
        graft.sources.Zstd.q165ZstdTriage(spark, TestSpark.Sf0001),
      "vw_parquet_footer" ->
        graft.operators.Lake.q166ParquetFooter(spark, TestSpark.Sf0001),
      "vw_idn_hosts" ->
        graft.operators.Crawl.q167IdnHosts(spark, TestSpark.Sf0001),
      "vw_datauri_images" ->
        graft.operators.Multimodal.q168DataUriHarvest(spark, TestSpark.Sf0001),
      "vw_script_mix" ->
        graft.operators.Text.q169ScriptMix(spark, TestSpark.Sf0001),
      "vw_fuzzy_titles" ->
        graft.operators.Dedup.q170FuzzyTitleDedup(spark, TestSpark.Sf0001),
      "vw_g711_audio" ->
        graft.operators.Multimodal.q171G711Audio(spark, TestSpark.Sf0001),
      "vw_pnm_stats" ->
        graft.operators.Multimodal.q172PnmPixels(spark, TestSpark.Sf0001),
      "vw_deltalog" ->
        graft.operators.Lake.q173DeltaLogReplay(spark, TestSpark.Sf0001),
      "vw_media_shards" ->
        graft.operators.Wds.q174MediaShards(spark, TestSpark.Sf0001),
      "vw_cbor_sidecars" ->
        graft.sources.Cbor.q175CborDecode(spark, TestSpark.Sf0001),
      "vw_ico_meta" ->
        graft.operators.Multimodal.q176IcoMeta(spark, TestSpark.Sf0001),
      "vw_readability" ->
        graft.operators.Text.q177Readability(spark, TestSpark.Sf0001),
      "vw_host_graph" ->
        graft.operators.Crawl.q178HostGraph(spark, TestSpark.Sf0001),
      "vw_cache_freshness" ->
        graft.operators.Crawl.q179CacheFreshness(spark, TestSpark.Sf0001),
      "vw_sketch_distinct" ->
        graft.operators.Dedup.q180SketchDistinct(spark, TestSpark.Sf0001),
      "vw_exists_wait" ->
        graft.operators.Relational.q181ExistsWait(spark, TestSpark.Sf0001),
      "vw_card_scan" ->
        graft.operators.Text.q182CardScan(spark, TestSpark.Sf0001),
      "vw_mad_outliers" ->
        graft.operators.Relational.q183MadOutliers(spark, TestSpark.Sf0001),
      "vw_compress_census" ->
        graft.sources.Compress.q184CompressRouter(spark, TestSpark.Sf0001),
      "vw_arrow_ipc" ->
        graft.sources.ArrowIpc.q185ArrowIpcTriage(spark, TestSpark.Sf0001),
      "vw_orc_footer" ->
        graft.operators.Lake.q186OrcFooter(spark, TestSpark.Sf0001),
      "vw_lake_census" ->
        graft.operators.Lake.q187LakeCensus(spark, TestSpark.Sf0001),
      "vw_zstd_decode" ->
        graft.sources.Zstd.q188ZstdDecode(spark, TestSpark.Sf0001),
      "vw_zstd_intake" ->
        graft.operators.Crawl.q189ZstdIntake(spark, TestSpark.Sf0001),
      "vw_lz4_decode" ->
        graft.sources.Compress.q190Lz4Decode(spark, TestSpark.Sf0001),
      "vw_bzip2_decode" ->
        graft.sources.Compress.q191Bzip2Decode(spark, TestSpark.Sf0001),
      "vw_xz_decode" ->
        graft.sources.Compress.q192XzDecode(spark, TestSpark.Sf0001),
      "vw_universal_decode" ->
        graft.sources.Compress.q193UniversalDecode(spark, TestSpark.Sf0001),
      "vw_wiki_dump" ->
        graft.sources.Wiki.q194WikiDump(spark, TestSpark.Sf0001),
      "vw_tarball_intake" ->
        graft.sources.Tar.q195TarballIntake(spark, TestSpark.Sf0001))
    twins.foreach { case (view, df) =>
      val sql = canon(spark.sql(s"SELECT * FROM $view"))
      val api = canon(df)
      assert(sql.nonEmpty, s"$view returned no rows")
      assert(sql === api, s"$view drifted from its DataFrame twin")
    }
  }

  test("vw_doc_quality columns are row-identical to their contract queries") {
    Bootstrap.initCorpusOps(spark, TestSpark.Sf0001)
    // the composed manifest must not re-derive ANY signal differently
    // from the standalone query that oracle-checks it
    val pairs = Seq(
      ("SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits, " +
        "r_len, r_wlen, r_alpha, r_stop, keep FROM vw_doc_quality")
        -> Text.q65RuleFilter(spark, TestSpark.Sf0001),
      "SELECT doc_id, quality FROM vw_doc_quality"
        -> Text.q28Quality(spark, TestSpark.Sf0001)
          .select("doc_id", "quality"),
      "SELECT doc_id, ratio FROM vw_doc_quality"
        -> Text.q66CompressRatio(spark, TestSpark.Sf0001)
          .select("doc_id", "ratio"),
      "SELECT doc_id, mean_surprisal FROM vw_doc_quality"
        -> Text.q64UnigramSurprisal(spark, TestSpark.Sf0001)
          .select("doc_id", "mean_surprisal"))
    pairs.foreach { case (sql, twin) =>
      assert(canon(spark.sql(sql)) === canon(twin), s"drift in: $sql")
    }
  }

  test("a SQL-only dedup+decontamination workflow composes over the views") {
    Bootstrap.initCorpusOps(spark, TestSpark.Sf0001)
    // the deduplicated, decontaminated corpus in ONE SQL statement — the
    // workflow the views exist for
    val survivors = spark.sql(
      """SELECT d.doc_id FROM documents d
        |LEFT JOIN vw_dedup_clusters c ON d.doc_id = c.doc_id
        |JOIN vw_decontaminate x ON d.doc_id = x.doc_id
        |WHERE (c.cluster IS NULL OR c.cluster = d.doc_id)
        |  AND x.contaminated = 0""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty)
    // consistency with the operators the views wrap: no survivor is
    // contaminated, and no two survivors share a near-dup cluster
    val contaminated = Text.q45Decontaminate(spark, TestSpark.Sf0001)
      .filter(org.apache.spark.sql.functions.col("contaminated") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(contaminated).isEmpty)
    val clusters = Dedup.q37DedupClusters(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivorClusters = survivors.toSeq.flatMap(clusters.get)
    assert(survivorClusters.distinct.length === survivorClusters.length,
      "two survivors share a near-dup cluster")
  }
}
