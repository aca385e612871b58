package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Masking

/** Session bootstrap: the engine's SQL surface (reference sql/apply.py's
  * ordered DDL + sql/04_views_curated.sql views + sql/05_masking_policy.sql
  * role gating, re-expressed as temp views over the lake).
  *
  * Role model (G1/G2): the session conf `spark.graft.role` decides what
  * the curated views expose — privileged roles (Masking.PrivilegedRoles)
  * see clear emails, everyone else sees the masked projection. Masking is
  * applied at view-expansion time, exactly where the reference's warehouse
  * applies its masking policy, so an analyst session can never read the
  * clear column through the curated surface.
  */
object Bootstrap {
  val LandingView = "raw_works_landing"
  val RoleConf = "spark.graft.role"
  val AnchorConf = "spark.graft.anchor"

  /** Pre-warm the custom-kernel family for single-query sessions: one
    * 1-row local select touching every codegen'd kernel once. The cost a
    * cold session pays on its first kernel query is dominated by SHARED
    * infrastructure — janino + the codegen framework JIT-compiling, the
    * kernel eval classes loading — not by any kernel's own generated
    * code (tools/WarmupProbe: the first probe pays ~hundreds of ms, the
    * rest single-digit, and the expensive one travels with POSITION when
    * the order is reversed). Running this at bootstrap moves that cost
    * out of the first user query; the full bench sweep never needed it
    * (its first queries amortize the same warmup), which is exactly why
    * solo-measured kernel queries looked 2× their in-sweep cost in
    * BENCH_NOTES.
    */
  def warmKernels(spark: SparkSession): Unit = {
    warmFrame(spark).collect()
    ()
  }

  /** The 1-row warm plan itself — separate so BootstrapSpec can pin that
    * EVERY codegen'd kernel family appears in it (a new kernel that is
    * not added here silently re-opens the cold-first-query cost).
    */
  private[graft] def warmFrame(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{array, lit}
    import graft.functions.{AudioOps, CompressOps, ImageOps, TextOps, VectorOps, VideoOps, WarcOps}
    val bytes = lit("graft kernel warmup".getBytes("UTF-8"))
    val vec = array((0 until 8).map(i => lit(i * 0.25f)): _*)
    spark.range(1).select(
      ImageOps.jpegDims(bytes), ImageOps.mp4Dims(bytes),
      ImageOps.bmpLuma(bytes), ImageOps.bmpResize(bytes, lit(8)),
      AudioOps.wavFmt(bytes), AudioOps.wavPcmStats(bytes),
      VideoOps.y4mMeta(bytes), VideoOps.y4mFrameLuma(bytes, lit(0)),
      VideoOps.mp4SampleInfo(bytes), VideoOps.mp4FrameLuma(bytes, lit(0)),
      WarcOps.warcMeta(bytes), WarcOps.warcOffsets(bytes),
      WarcOps.warcHeader(bytes, lit(0L), 1), WarcOps.warcPayload(bytes, lit(0L)),
      VectorOps.lshBits(vec, 8), VectorOps.dot(vec, vec),
      VectorOps.dotI8(VectorOps.quantizeI8(vec), VectorOps.quantizeI8(vec)),
      VectorOps.pqAdc(vec, lit(0L), 2, 4),
      graft.functions.BpeOps.bpeTokens(lit("a b"), Seq("a", "b")),
      CompressOps.deflateLen(lit("a")),
      TextOps.contentFingerprint(lit("a")),
      TextOps.nfc(lit("a")),
      graft.functions.HttpOps.dechunk(bytes),
      graft.functions.CharsetOps.sniff(bytes),
      graft.functions.CharsetOps.decodeAs(bytes, lit("utf-8")),
      graft.functions.JpegPixelOps.jpegLuma(bytes),
      graft.functions.JpegPixelOps.jpegSynth(lit(1L), lit(0x101L)),
      graft.functions.WebpPixelOps.webpLuma(bytes),
      graft.functions.Vp8Ops.vp8Synth(lit(1L), lit(0L)),
      graft.functions.TiffPixelOps.tiffLuma(bytes),
      graft.functions.TiffPixelOps.tiffPixelSynth(lit(1L), lit(0x202L)),
      graft.functions.ZstdBlockOps.zstdDecodeDict(bytes, bytes)
    )
  }

  /** Comma-separated lake paths holding RAW data. Sessions with
    * plans.GraftExtensions installed deny direct scans of these paths to
    * non-privileged roles (plans.RbacCheckRule) — the curated views are
    * the only analyst-reachable window onto them.
    */
  val RawPathsConf = "spark.graft.raw.paths"

  /** Filesystem-qualify a lake path (scheme + authority + normalized) so
    * privilege checks compare canonical spellings on both sides — a
    * relative or `file:`-prefixed spelling of the same directory must not
    * slip past a string comparison (plans.RbacCheckRule.underRaw).
    */
  private[graft] def qualifyRawPath(spark: SparkSession, path: String): String =
    qualify(spark.sessionState.newHadoopConf(), path)

  /** THE canonical path spelling, shared by record time (above) and check
    * time (plans.RbacCheckRule) — a normalization tweak applied to one
    * side but not the other would silently desynchronize the two and
    * re-open the alternate-spelling bypass.
    */
  private[graft] def qualify(hc: org.apache.hadoop.conf.Configuration, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(hc).makeQualified(p).toString.stripSuffix("/")
  }

  private def recordRawPath(spark: SparkSession, path: String): Unit = {
    val q = qualifyRawPath(spark, path)
    val prev = spark.conf.get(RawPathsConf, "")
      .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    spark.conf.set(RawPathsConf, (prev :+ q).distinct.mkString(","))
  }

  def role(spark: SparkSession): String =
    spark.conf.get(RoleConf, "R_ANALYST")

  /** G3 compute-isolation analog: the reference gives each role its own
    * warehouse (ingestion/transform/analyst); on a shared Spark cluster the
    * equivalent isolation knob is a fair-scheduler pool per role — jobs
    * submitted after this call are scheduled under `pool`'s weight/minShare.
    */
  def usePool(spark: SparkSession, pool: String): Unit =
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)

  /** Register the parquet corpus tables (idempotent). */
  def initCorpus(spark: SparkSession, dir: String): Unit =
    Tables.registerAll(spark, dir)

  /** SQL-surface exposure of the LLM-pipeline operator families: a
    * SQL-only user reaches the exact dedup / decontamination / composed
    * corpus-pipeline plans as temp views, composable with plain SQL over
    * the corpus tables (e.g. `SELECT d.* FROM documents d JOIN
    * vw_dedup_clusters c ON d.doc_id = c.doc_id WHERE c.cluster =
    * d.doc_id` IS the deduplicated corpus). Registration is plan-based —
    * the view stores the ALREADY-BUILT DataFrame plan, so q37's iterative
    * contraction runs once here (its result is checkpoint-backed) rather
    * than re-entering the driver loop per SQL read, and the SQL surface
    * can never drift from the DataFrame path it wraps (SqlSurfaceSpec
    * pins the hash match).
    */
  def initCorpusOps(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    operators.Dedup.q21ExactDedup(spark, dir)
      .createOrReplaceTempView("vw_exact_dedup")
    operators.Dedup.q37DedupClusters(spark, dir)
      .createOrReplaceTempView("vw_dedup_clusters")
    operators.Text.q45Decontaminate(spark, dir)
      .createOrReplaceTempView("vw_decontaminate")
    // registered through the HANDLE variant, not corpusPipelineOn: the
    // view must answer SQL reads for the whole session, so its survivor
    // checkpoint is exempt from the retire-on-reinvoke lifecycle that a
    // later direct q51 build would otherwise trigger (the handle is
    // deliberately dropped — the block lives as long as the view can be
    // queried)
    operators.Pipeline.corpusPipelineHandled(
        Tables.load(spark, dir, "documents"),
        scrub = operators.Pipeline.q51Scrub)._1
      .createOrReplaceTempView("vw_corpus_manifest")
    // the multimodal sibling: the composed media manifest (q58's sniff →
    // decode → resize → frame-plan chain) as a SQL-joinable view — a pure
    // narrow plan, so registration stores no state at all
    operators.Multimodal.q58MediaManifest(spark, dir)
      .createOrReplaceTempView("vw_media_manifest")
    // the quality stack in one view: rule bits (q65) + heuristic score
    // (q28) + compression ratio (q66) in a single narrow pass, LM
    // surprisal (q64) joined on — `WHERE keep = 1 AND quality >= x AND
    // mean_surprisal <= z` is the whole corpus-filter decision in SQL
    operators.Text.docQuality(spark, dir)
      .createOrReplaceTempView("vw_doc_quality")
    // the web-intake front half (q71): domain-gated, line-deduped,
    // rule-graded survivors — `WHERE keep = 1` is the SQL-only "give me
    // the clean web corpus" read
    operators.Text.q71WebPreclean(spark, dir)
      .createOrReplaceTempView("vw_web_preclean")
    // the corpus-refresh verdict (q74): `WHERE keep = 1` is the SQL-only
    // "which of the incoming batch may land" read, with the evidence
    // columns for the audit trail
    operators.Dedup.q74IncrementalDedup(spark, dir)
      .createOrReplaceTempView("vw_incremental_dedup")
    // the semantic-dedup verdict (q79): like vw_dedup_clusters, the
    // components (and the Lloyd round behind them) run once at
    // registration — checkpoint-backed — not per SQL read
    operators.Dedup.q79SemDedup(spark, dir)
      .createOrReplaceTempView("vw_semdedup")
    // the last-mile shard layout (q80): `WHERE shard = k ORDER BY
    // shard_pos` is the SQL-only "stream me training shard k in order"
    // read — a pure two-phase-rank plan, no state at registration
    operators.Scale.q80ShardAssign(spark, dir)
      .createOrReplaceTempView("vw_shard_manifest")
    // lexical retrieval (q83): the serving-side probe as a view —
    // `WHERE query_id = q` is the SQL-only "top documents for this
    // query" read, with the scored evidence column
    operators.Retrieval.q83Bm25TopK(spark, dir)
      .createOrReplaceTempView("vw_bm25")
    // the crawl loop's three reads (q94/q96/q97): the discovered frontier
    // (`WHERE keep = 1` is the SQL-only "what do we fetch next"), the
    // host-rank prior a mixture policy joins on, and the intake manifest
    // with its two-level fetch_ok/well_formed verdicts
    operators.Crawl.q94LinkFrontier(spark, dir)
      .createOrReplaceTempView("vw_frontier")
    // host ranks run their five integer power-iteration rounds ONCE at
    // registration (checkpoint-backed), like the contraction-based views
    operators.Crawl.q96LinkRank(spark, dir)
      .createOrReplaceTempView("vw_link_rank")
    operators.Crawl.q97CrawlIntake(spark, dir)
      .createOrReplaceTempView("vw_crawl_intake")
    // the robots verdict: `WHERE allowed = 1` is the SQL-only "what may
    // we actually fetch" read over the frontier, with rule evidence
    operators.Crawl.q98RobotsGate(spark, dir)
      .createOrReplaceTempView("vw_robots_gate")
    // the politeness schedule (q107): `WHERE allowed = 1 ORDER BY
    // host_priority, sched_sec` is the SQL-only "drain the fetch queue"
    // read — rank-priority hosts, integer slots honoring crawl_delay
    operators.Crawl.q107FetchSchedule(spark, dir)
      .createOrReplaceTempView("vw_fetch_schedule")
    // semantic decontamination verdicts (q100) and the perceptual image
    // groups (q101) — `WHERE contaminated = 0` / `WHERE is_dup = 0` are
    // the SQL-only clean-training-set reads for their modalities
    operators.Similarity.q100SemanticDecon(spark, dir)
      .createOrReplaceTempView("vw_semantic_decon")
    operators.Multimodal.q101ImageDedup(spark, dir)
      .createOrReplaceTempView("vw_image_dedup")
    // the r12 family's SQL twins: per-line language spans (q110) — a
    // `WHERE line_lang <> doc_lang` read is the SQL-only "find embedded
    // foreign passages" filter; the adaptive recrawl queue (q113) —
    // `WHERE fetch = 1` is the SQL-only "what do we revisit this cycle"
    // read with the AIMD evidence bits; and the full wire-intake
    // manifest (q116) — the six-layer decode as a plain SELECT
    operators.Text.q110LineLangId(spark, dir)
      .createOrReplaceTempView("vw_line_langid")
    operators.Crawl.q113RecrawlPolicy(spark, dir)
      .createOrReplaceTempView("vw_recrawl_queue")
    operators.Crawl.q116FullStackIntake(spark, dir)
      .createOrReplaceTempView("vw_wire_intake")
    // the r13 family's SQL twins — the two dashboard reads the reference's
    // own home-page pattern (app/home.py:143-146) would run over the
    // event stream: the per-user funnel (`WHERE reached = 3` is the
    // SQL-only converted-users read; aggregating reached gives the
    // step-dropoff report) and the weekly cohort retention matrix
    // (`WHERE week_offset = k ORDER BY cohort_week` is the diagonal a
    // growth dashboard plots)
    operators.Relational.q119Funnel(spark, dir)
      .createOrReplaceTempView("vw_funnel")
    operators.Relational.q120Cohorts(spark, dir)
      .createOrReplaceTempView("vw_cohorts")
    // the charset-intake manifest (q117): `WHERE method <> 'declared'`
    // is the SQL-only "which pages lied about their encoding" audit
    operators.Crawl.q117CharsetSniff(spark, dir)
      .createOrReplaceTempView("vw_charset_sniff")
    // the JPEG pixel-stat manifest (q118): `WHERE is_jpeg = 1 AND
    // min_luma IS NULL` is the SQL-only corrupt-image quarantine read
    operators.Multimodal.q118JpegPixels(spark, dir)
      .createOrReplaceTempView("vw_jpeg_stats")
    // the PNG pixel-stat manifest (q121): same quarantine read for the
    // lossless class (`WHERE format = 'png' AND min_luma IS NULL`)
    operators.Multimodal.q121PngPixels(spark, dir)
      .createOrReplaceTempView("vw_png_stats")
    // the GIF pixel-stat manifest (q124): the third lossless quarantine
    // read (`WHERE format = 'gif' AND min_luma IS NULL`)
    operators.Multimodal.q124GifPixels(spark, dir)
      .createOrReplaceTempView("vw_gif_stats")
    // the TIFF / MP3 metadata manifests (q129/q130): the scanned-doc and
    // audio triage reads (`WHERE is_tiff = 1 AND width IS NULL` /
    // `WHERE ok = 0` are the respective quarantines)
    operators.Multimodal.q129TiffMeta(spark, dir)
      .createOrReplaceTempView("vw_tiff_meta")
    operators.Multimodal.q130Mp3Meta(spark, dir)
      .createOrReplaceTempView("vw_mp3_meta")
    // the composed image-intake manifest (q127): mixed formats routed
    // by magic bytes — `WHERE format <> 'unknown' AND min_luma IS NULL`
    // is the cross-format corrupt-image quarantine in one view
    operators.Multimodal.q127ImageIntake(spark, dir)
      .createOrReplaceTempView("vw_image_intake")
    // the UTF-16 intake manifest (q126): `WHERE method = 'sniffed' AND
    // detected LIKE 'utf-16%'` is the SQL-only "BOM-less Windows
    // exports" read; `text_out IS NULL` the corrupt-encoding quarantine
    operators.Crawl.q126Utf16Intake(spark, dir)
      .createOrReplaceTempView("vw_utf16_intake")
    // the PDF intake manifest (q125): `WHERE ok = 0` is the SQL-only
    // broken-document quarantine; `ok = 1 AND n_chars > 0` the
    // extracted-text corpus read
    sources.Pdf.q125PdfExtract(spark, dir)
      .createOrReplaceTempView("vw_pdf_text")
    // the model-based quality manifest (q122): training runs once at
    // registration (the vw_link_rank discipline — the collected weight
    // table is a plan constant); `WHERE predicted = 1 AND keep = 0`
    // is the SQL-only "what the rules killed but the model would save"
    // audit, the operational reason to run both gates
    operators.Classifier.q122QualityClassifier(spark, dir)
      .createOrReplaceTempView("vw_quality_model")
    // the byte-BPE manifest (q123): `sum(n_chars) / sum(n_tokens)` over
    // it is the SQL-only chars-per-token compression read a tokenizer
    // rollout decision needs
    operators.Bpe.q123ByteBpe(spark, dir)
      .createOrReplaceTempView("vw_byte_bpe")
    // the entity-decode manifest (q128): `WHERE n_entities > 0` is the
    // SQL-only "which documents still carried escaped markup" audit
    operators.Text.q128HtmlUnescape(spark, dir)
      .createOrReplaceTempView("vw_html_clean")
    // the EXIF intake manifest (q131): `GROUP BY nhash HAVING count(*)
    // > 1` is the SQL-only rotated-duplicate read; `nhash IS NULL` the
    // undecodable quarantine
    operators.Multimodal.q131ExifIntake(spark, dir)
      .createOrReplaceTempView("vw_exif_intake")
    // the archive intake manifest (q132): `WHERE valid = 0` is the
    // broken-drop quarantine, `md5_pair IS NULL AND valid = 1` the
    // per-member corruption audit
    sources.Zip.q132ZipExtract(spark, dir)
      .createOrReplaceTempView("vw_zip_extract")
    // the office-document manifest (q133): `WHERE ok = 0` is the
    // broken-package quarantine, `ok = 1 AND n_chars > 0` the
    // extracted-text corpus read
    sources.Docx.q133DocxExtract(spark, dir)
      .createOrReplaceTempView("vw_docx_text")
    // the CSV ingest manifest (q134): `WHERE source IS NULL` is the
    // corrupt-line quarantine row a flood alarm reads
    sources.Csv.q134CsvIngest(spark, dir)
      .createOrReplaceTempView("vw_csv_ingest")
    // the WebP pixel-stat manifest (q135): the fourth lossless
    // quarantine read (`WHERE format = 'webp' AND min_luma IS NULL`)
    operators.Multimodal.q135WebpPixels(spark, dir)
      .createOrReplaceTempView("vw_webp_stats")
    // the tarball intake manifest (q136): `WHERE valid = 0` is the
    // broken-drop quarantine, `md5_text IS NULL AND valid = 1` the
    // per-member checksum audit
    sources.Tar.q136TarExtract(spark, dir)
      .createOrReplaceTempView("vw_tar_extract")
    // the mailing-list intake manifest (q137): `WHERE ok = 0` is the
    // truncated-message quarantine, `ok = 1 AND body_md5 IS NULL` the
    // per-part decode-failure audit
    sources.Mime.q137MimeExtract(spark, dir)
      .createOrReplaceTempView("vw_mime_extract")
    // the subtitle intake manifest (q138): `sum(total_ms)` over it is
    // the SQL-only captioned-hours read a video-text pairing budget
    // needs; `WHERE ok = 0` the not-a-subtitle quarantine
    operators.Subtitles.q138SubtitleExtract(spark, dir)
      .createOrReplaceTempView("vw_subtitles")
    // the FLAC metadata manifest (q139): `WHERE is_flac = 1 AND
    // sample_rate IS NULL` is the truncated-master quarantine,
    // `sum(duration_ms)` the lossless-audio-hours read
    operators.Multimodal.q139FlacMeta(spark, dir)
      .createOrReplaceTempView("vw_flac_meta")
    // the markdown intake manifest (q140): `GROUP BY lang` over it is
    // the SQL-only code-mixture budget read; `WHERE n_code_blocks = 0`
    // the pure-prose corpus slice
    operators.Markdown.q140MarkdownExtract(spark, dir)
      .createOrReplaceTempView("vw_markdown")
    // the feed intake manifest (q141): `max(latest_epoch)` per source
    // is the SQL-only recrawl-scheduling read (q113's loop over the
    // open web); `WHERE ok = 0` the truncated-feed quarantine
    operators.Feeds.q141FeedIngest(spark, dir)
      .createOrReplaceTempView("vw_feeds")
    // the book intake manifest (q142): `WHERE ok = 0` is the
    // broken-package quarantine, `ok = 1 AND n_chars > 0` the
    // book-corpus read completing the PDF/DOCX document family
    sources.Epub.q142EpubExtract(spark, dir)
      .createOrReplaceTempView("vw_epub_text")
    // the mojibake manifest (q143): `WHERE mojibake = 1` is the
    // SQL-only "which sources ship pre-corrupted text" audit that
    // feeds upstream fixes
    operators.Mojibake.q143MojibakeRepair(spark, dir)
      .createOrReplaceTempView("vw_mojibake")
    // the LaTeX source manifest (q144): `sum(n_math)` over it is the
    // SQL-only math-density read a STEM-mixture budget needs;
    // `WHERE title IS NULL` the no-preamble quarantine
    operators.Latex.q144LatexExtract(spark, dir)
      .createOrReplaceTempView("vw_latex_text")
    // the citation-metadata manifest (q145): `max(year_max)` per
    // source is the SQL-only corpus-freshness read; `WHERE n_entries
    // = 0` the not-a-bibliography quarantine
    operators.Bibtex.q145BibtexParse(spark, dir)
      .createOrReplaceTempView("vw_bibtex")
    // the sitemap manifest (q146): `max(latest_epoch)` per host is
    // the SQL-only recrawl-priority read feeding q107's scheduler;
    // `WHERE ok = 0` the truncated-download quarantine
    operators.Sitemap.q146SitemapParse(spark, dir)
      .createOrReplaceTempView("vw_sitemaps")
    // the table-extraction manifest (q147): `sum(n_rows)` is the
    // SQL-only structured-data yield read; `WHERE n_tables = 0` the
    // prose-only slice q93 already owns
    operators.HtmlTables.q147HtmlTables(spark, dir)
      .createOrReplaceTempView("vw_html_tables")
    // the paragraph-dedup manifest (q148): `sum(n_dup) / sum(n_paras)`
    // is the SQL-only boilerplate-fraction read; `WHERE n_dup =
    // n_paras` the all-boilerplate page quarantine
    operators.Dedup.q148ParaDedup(spark, dir)
      .createOrReplaceTempView("vw_para_dedup")
    // the OGG metadata manifest (q149): `sum(duration_ms)` per codec
    // is the SQL-only speech-hours read; `WHERE is_ogg = 1 AND codec
    // IS NULL` the truncated-download quarantine
    operators.Multimodal.q149OggMeta(spark, dir)
      .createOrReplaceTempView("vw_ogg_meta")
    // the perplexity manifest (q150): `WHERE mean_surprisal > k` is
    // the SQL-only CCNet-style high-perplexity drop; `sum(n_bi +
    // n_uni) / sum(n_scored)` the backoff-rate model-health read
    operators.Text.q150TrigramBackoff(spark, dir)
      .createOrReplaceTempView("vw_lm_surprisal")
    // the anchor-text manifest (q151): `ORDER BY n_links DESC` is the
    // SQL-only hub read; `WHERE n_anchors = 1` the single-spelling
    // targets whose anchor IS the page's name
    operators.Crawl.q151AnchorText(spark, dir)
      .createOrReplaceTempView("vw_anchor_text")
    // the AVI metadata manifest (q152): `sum(duration_ms)` is the
    // SQL-only footage-hours read; `WHERE is_avi = 1 AND width IS
    // NULL` the truncated-download quarantine
    operators.Multimodal.q152AviMeta(spark, dir)
      .createOrReplaceTempView("vw_avi_meta")
    // the schema-drift manifest (q153): `WHERE n_obs > n_string AND
    // n_string > 0 AND major_type = 'string'`-style reads are the
    // SQL-only drift alarms; the `$invalid` row the quarantine count
    operators.Relational.q153JsonShape(spark, dir)
      .createOrReplaceTempView("vw_json_shape")
    // the page-verdict manifest (q154): `WHERE noindex = 1` is the
    // SQL-only corpus-exit read; `GROUP BY canonical_url HAVING
    // count(*) > 1` the declared-duplicate clusters q101 cannot see
    operators.Crawl.q154PageVerdict(spark, dir)
      .createOrReplaceTempView("vw_page_verdict")
    // the RTF manifest (q155): `WHERE ok = 0` is the not-RTF
    // quarantine, `ok = 1 AND n_chars > 0` the legacy-office corpus
    // read completing the document family
    sources.Rtf.q155RtfExtract(spark, dir)
      .createOrReplaceTempView("vw_rtf_text")
    // the postings manifest (q156): `ORDER BY df DESC` is the SQL-only
    // stopword-candidate read; `WHERE df = 1` the hapax tail a
    // vocabulary-pruning pass drops
    operators.Retrieval.q156PostingsBuild(spark, dir)
      .createOrReplaceTempView("vw_postings")
    // the sentence manifest (q157): `avg(n_tokens / n_sentences)` is
    // the SQL-only sentence-length read a fluency filter thresholds;
    // `WHERE longest > k` the run-on quarantine
    operators.Text.q157SentenceSplit(spark, dir)
      .createOrReplaceTempView("vw_sentences")
    // the ID3 manifest (q158): `sum(len_ms)` is the SQL-only declared-
    // duration read to reconcile against q130's frame math; `WHERE
    // is_id3 = 1 AND version IS NULL` the truncated-tag quarantine
    operators.Multimodal.q158Id3Tags(spark, dir)
      .createOrReplaceTempView("vw_id3_tags")
    // the SVG manifest (q159): `WHERE has_script = 1` is the SQL-only
    // sanitization drop; `WHERE is_svg = 1 AND width IS NULL` the
    // truncated-download quarantine
    operators.Multimodal.q159SvgMeta(spark, dir)
      .createOrReplaceTempView("vw_svg_meta")
    // the TFRecord manifest (q160): `WHERE n_valid < n_records OR
    // truncated = 1` is the SQL-only corrupt-shard alarm before a
    // training run; `sum(total_bytes)` the served-payload accounting
    sources.TfRecord.q160TfrecordIngest(spark, dir)
      .createOrReplaceTempView("vw_tfrecord")
    // the tf.Example manifest (q161): `WHERE ok = 0` is the corrupt-
    // example quarantine; `sum(sum_ints)` the token accounting a
    // loader reconciles against the shard manifest
    sources.TfExample.q161TfExampleDecode(spark, dir)
      .createOrReplaceTempView("vw_tfexample")
    // the WebM/Matroska manifest (q162): `sum(duration_ms)` joins
    // q152's footage-hours read across containers; `WHERE is_ebml = 1
    // AND width IS NULL` the truncated-download quarantine
    operators.Multimodal.q162EbmlMeta(spark, dir)
      .createOrReplaceTempView("vw_ebml_meta")
    // the WebDataset manifest (q163): `WHERE complete = 0` is the
    // SQL-only loader-drop audit before a training run; `GROUP BY
    // exts` the sample-shape census across shards
    operators.Wds.q163WdsSamples(spark, dir)
      .createOrReplaceTempView("vw_wds_samples")
    // the Avro manifest (q164): `WHERE truncated = 1` is the SQL-only
    // spliced/cut container quarantine; `sum(n_records)` the row
    // accounting a hand-off reconciles against the producer's count
    sources.Avro.q164AvroIngest(spark, dir)
      .createOrReplaceTempView("vw_avro_ingest")
    // the zstd triage (q165): `sum(content_size)` sizes the decode
    // job BEFORE paying it; `WHERE truncated = 1` the cut-download
    // quarantine; `GROUP BY window_log` the decoder memory budget
    sources.Zstd.q165ZstdTriage(spark, dir)
      .createOrReplaceTempView("vw_zstd_triage")
    // the lake self-audit (q166): `WHERE verified = 0` is the SQL-only
    // lying-footer alarm; num_rows joins against ingest manifests
    operators.Lake.q166ParquetFooter(spark, dir)
      .createOrReplaceTempView("vw_parquet_footer")
    // the IDN frontier read (q167): `WHERE idn_ok = 0` is the hostile-
    // label quarantine; `GROUP BY uni_host` merges ACE/Unicode aliases
    operators.Crawl.q167IdnHosts(spark, dir)
      .createOrReplaceTempView("vw_idn_hosts")
    // the inline-image manifest (q168): `WHERE format <> NULL-safe
    // declared` reads mime-vs-magic lies; `sum(n_data_uris)` the
    // inline-payload census
    operators.Multimodal.q168DataUriHarvest(spark, dir)
      .createOrReplaceTempView("vw_datauri_images")
    // the script-mix read (q169): `WHERE n_mixed_words > 0` is the
    // SQL-only homoglyph/spoof drop; `GROUP BY dominant_script` the
    // script-mixture budget
    operators.Text.q169ScriptMix(spark, dir)
      .createOrReplaceTempView("vw_script_mix")
    // the fuzzy-field pairs (q170): `WHERE dist = 1` is the typo-dup
    // review queue exact hashing cannot see
    operators.Dedup.q170FuzzyTitleDedup(spark, dir)
      .createOrReplaceTempView("vw_fuzzy_titles")
    // the telephony-audio manifest (q171): `sum(n_samples) / 8000` is
    // the speech-hours read; `WHERE codec IS NULL` the non-G.711
    // quarantine
    operators.Multimodal.q171G711Audio(spark, dir)
      .createOrReplaceTempView("vw_g711_audio")
    // the PNM manifest (q172): the uncompressed-image quarantine
    // (`WHERE format IS NOT NULL AND sum_luma IS NULL` = truncated)
    operators.Multimodal.q172PnmPixels(spark, dir)
      .createOrReplaceTempView("vw_pnm_stats")
    // the table-snapshot audit (q173): `WHERE n_bad_lines > 0` is the
    // corrupt-log alarm; `sum(total_bytes)` the live-data accounting a
    // capacity plan reads
    operators.Lake.q173DeltaLogReplay(spark, dir)
      .createOrReplaceTempView("vw_deltalog")
    // the multimodal-shard manifest (q174): `WHERE has_image = 0` is
    // the loader-skip audit; `sum(sum_luma)` reconciles pixel payloads
    // across the shard fleet
    operators.Wds.q174MediaShards(spark, dir)
      .createOrReplaceTempView("vw_media_shards")
    // the CBOR sidecar read (q175): `WHERE ok = 0` the corrupt-sidecar
    // quarantine; `sum(sum_tags)` the label accounting
    sources.Cbor.q175CborDecode(spark, dir)
      .createOrReplaceTempView("vw_cbor_sidecars")
    // the favicon census (q176): `WHERE has_png = 1` the modern-icon
    // split; `WHERE is_ico = 1 AND n_valid IS NULL` the cut-download
    // quarantine
    operators.Multimodal.q176IcoMeta(spark, dir)
      .createOrReplaceTempView("vw_ico_meta")
    // the readability read (q177): `WHERE fk_grade_x100 > k` the
    // expert-text mixture split; `avg(ttr_x100)` the diversity read
    operators.Text.q177Readability(spark, dir)
      .createOrReplaceTempView("vw_readability")
    // the graph-structure read (q178): reciprocity separates organic
    // linking from link-exchange rings
    operators.Crawl.q178HostGraph(spark, dir)
      .createOrReplaceTempView("vw_host_graph")
    // the freshness plan (q179): `min(expiry_epoch)` is the next-due
    // wakeup; `WHERE cacheable = 0` the always-refetch set
    operators.Crawl.q179CacheFreshness(spark, dir)
      .createOrReplaceTempView("vw_cache_freshness")
    // the federated distinct read (q180): the `*ALL*` row is the
    // merge-not-rescan rollup a shard fleet publishes
    operators.Dedup.q180SketchDistinct(spark, dir)
      .createOrReplaceTempView("vw_sketch_distinct")
    // the quantified-subquery read (q181): the TPC-H Q21 waiting-
    // supplier shape on the SQL surface
    operators.Relational.q181ExistsWait(spark, dir)
      .createOrReplaceTempView("vw_exists_wait")
    // the card-leak audit (q182): `WHERE n_valid_cards > 0` is the
    // real-leakage set; `n_candidates > n_valid_cards` the
    // order-id-lookalike evidence
    operators.Text.q182CardScan(spark, dir)
      .createOrReplaceTempView("vw_card_scan")
    // the robust anomaly read (q183): `WHERE n_outliers > 0` flags
    // value streams a mean/stddev fence would have normalized away
    operators.Relational.q183MadOutliers(spark, dir)
      .createOrReplaceTempView("vw_mad_outliers")
    // the compression census (q184): `GROUP BY format` sizes the
    // decode fleet; `sum(declared_size)` the decompression budget
    sources.Compress.q184CompressRouter(spark, dir)
      .createOrReplaceTempView("vw_compress_census")
    // the Arrow hand-off audit (q185): `sum(total_rows)` reconciled
    // against the producer's manifest; `WHERE truncated = 1` the
    // cut-stream quarantine
    sources.ArrowIpc.q185ArrowIpcTriage(spark, dir)
      .createOrReplaceTempView("vw_arrow_ipc")
    // the ORC audit (q186): `WHERE verified = 0` the lying-footer
    // alarm completing the four-format lake introspection family
    operators.Lake.q186OrcFooter(spark, dir)
      .createOrReplaceTempView("vw_orc_footer")
    // the lake drop census (q187): `GROUP BY format` routes the
    // ingest fleet; `WHERE verified = 0` the cross-format footer alarm
    operators.Lake.q187LakeCensus(spark, dir)
      .createOrReplaceTempView("vw_lake_census")
    // the zstd content read (q188): `WHERE checksum_ok = 0` the
    // corruption quarantine; `sum(content_len)` the decoded budget
    sources.Zstd.q188ZstdDecode(spark, dir)
      .createOrReplaceTempView("vw_zstd_decode")
    // the .warc.zst intake (q189): the q116 capstone on Common
    // Crawl's primary distribution format — same columns, same SLOs
    operators.Crawl.q189ZstdIntake(spark, dir)
      .createOrReplaceTempView("vw_zstd_intake")
    // the lz4 content read (q190): `WHERE checksum_ok = 0` the
    // corruption quarantine over the feature-store drop
    sources.Compress.q190Lz4Decode(spark, dir)
      .createOrReplaceTempView("vw_lz4_decode")
    // the bzip2 content read (q191): `WHERE crc_ok = 0` the
    // corruption quarantine over the wiki-dump drop
    sources.Compress.q191Bzip2Decode(spark, dir)
      .createOrReplaceTempView("vw_bzip2_decode")
    // the xz content read (q192): `GROUP BY check_kind` the
    // integrity census; `WHERE check_ok = 0` the quarantine
    sources.Compress.q192XzDecode(spark, dir)
      .createOrReplaceTempView("vw_xz_decode")
    // the universal decode (q193): `GROUP BY format` the drop census
    // with content proved whichever wrapper arrived
    sources.Compress.q193UniversalDecode(spark, dir)
      .createOrReplaceTempView("vw_universal_decode")
    // the wiki-dump intake (q194): `WHERE has_article = 1 AND
    // is_redirect = 0` is the corpus feed; n_chars the prose yield
    sources.Wiki.q194WikiDump(spark, dir)
      .createOrReplaceTempView("vw_wiki_dump")
    // the tarball intake (q195): `GROUP BY wrapper` the source-dump
    // census; `sum(n_bytes)` the unpacked payload budget
    sources.Tar.q195TarballIntake(spark, dir)
      .createOrReplaceTempView("vw_tarball_intake")
    // the lossy-VP8 pixel read (q196): `WHERE min_luma IS NULL AND
    // format = 'webp'` is the out-of-profile quarantine (truncated or
    // RFC-default-probs frames) beside q135's lossless stats
    operators.Multimodal.q196Vp8Pixels(spark, dir)
      .createOrReplaceTempView("vw_vp8_stats")
    // the TIFF pixel read (q197): `WHERE min_luma IS NULL AND
    // is_tiff = 1` is the truncated/out-of-profile scan quarantine
    operators.Multimodal.q197TiffPixels(spark, dir)
      .createOrReplaceTempView("vw_tiff_stats")
  }

  /** Register the landing table + curated views over it — the TRANSFORM
    * entry point (reference: R_TRANSFORM owns RAW reads and creates the
    * curated views, sql/02_rbac_policies.sql). Run it under a privileged
    * role; the raw path is recorded last so a governed session can flip to
    * R_ANALYST afterwards and lose direct raw access while the curated
    * views keep working.
    */
  def initLanding(spark: SparkSession, landingDir: String): Unit = {
    spark.read.parquet(landingDir).createOrReplaceTempView(LandingView)
    createCuratedViews(spark)
    recordRawPath(spark, landingDir)
  }

  /** Analyst entry point (G2): registers ONLY the curated views — no
    * `raw_works_landing`, no corpus temp views. The views read the landing
    * parquet by path inside their own definitions (definer's rights), so
    * an analyst session has no raw relation to name, and with
    * plans.GraftExtensions installed the raw path itself is unreadable
    * outside the curated views. Masking is decided with the ANALYST role
    * regardless of what the session conf says at call time.
    */
  def initAnalyst(spark: SparkSession, landingDir: String): Unit = {
    val prevRole = spark.conf.getOption(RoleConf)
    val prevRaw = spark.conf.getOption(RawPathsConf)
    spark.conf.set(RoleConf, "R_ANALYST")
    // view creation analyzes the body before any View wrapper exists, so
    // the raw-path check must be suspended for the definition step
    // (definer writes the view; the check governs readers) — restored and
    // extended in the finally, keeping re-bootstraps idempotent.
    spark.conf.unset(RawPathsConf)
    try createCuratedViews(spark, s"parquet.`$landingDir`")
    finally {
      prevRole match {
        case Some(r) => spark.conf.set(RoleConf, r)
        case None => spark.conf.unset(RoleConf)
      }
      prevRaw.foreach(spark.conf.set(RawPathsConf, _))
      recordRawPath(spark, landingDir)
    }
  }

  /** The P9 mask as SQL, over an arbitrary email expression. This is one
    * of three implementations of the policy (Column: Masking.maskEmail;
    * Catalyst: plans/MaskingRule.maskExpr) — Spark 4's Column API exposes
    * no expression printer to derive one from another, so parity is pinned
    * instead by the shared A5 fixture vectors asserted in FunctionsSpec,
    * LandingSpec and MaskingRuleSpec; a policy change that misses a copy
    * fails those suites.
    */
  private def maskSql(e: String): String =
    s"CASE WHEN $e IS NULL THEN NULL " +
      s"WHEN instr($e, '@') = 0 THEN '***' " +
      s"ELSE concat(substr($e, 1, 1), '***', substr($e, instr($e, '@'))) END"

  /** vw_works + vw_latency, mirroring sql/04_views_curated.sql:6-60.
    *
    * - typed schema-on-read over the schema-agnostic landing JSON
    *   (safe casts: NULL on malformed, never error)
    * - cross-delivery `_LOAD_ID` dedup (first landing wins)
    * - landed_ts COALESCE chain (delivery metadata → producer ingest_ts →
    *   now), latency as NULL-safe seconds diff
    * - email column role-gated at definition time
    *
    * Views are registered PLAN-BASED (`spark.sql(body)
    * .createOrReplaceTempView`) rather than via CREATE TEMP VIEW text on
    * purpose: a text view re-analyzes its body on every read, and that
    * nested analysis presents the raw scan to checkAnalysis with no `View`
    * wrapper yet — plans.RbacCheckRule could not tell it from a direct
    * analyst read. A plan-based view analyzes its body exactly once, here,
    * under the definer's role, and every later read resolves to the stored
    * plan wrapped in the unforgeable `View` node the check rule trusts.
    */
  def createCuratedViews(spark: SparkSession, from: String = LandingView): Unit = {
    // Register the view AND record its stored body plan as TRUSTED
    // (plans.RbacTrust): the check rule exempts a `View` node only when its
    // child matches a plan registered here, so a name spoof re-creating
    // `vw_works` over the raw path carries a different child and falls
    // through to the raw-scan denial.
    def createTrustedView(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.createOrReplaceTempView(name)
      graft.plans.RbacTrust.register(spark, df.queryExecution.analyzed)
    }
    val emailRaw = "get_json_object(record, '$.email')"
    val emailExpr =
      if (Masking.PrivilegedRoles(role(spark))) emailRaw else maskSql(emailRaw)
    val landedTs =
      "coalesce(record_metadata.IngestionTime, " +
        "try_cast(get_json_object(record, '$.ingest_ts') AS TIMESTAMP), " +
        "current_timestamp())"
    val eventTs = "try_cast(get_json_object(record, '$.event_ts') AS TIMESTAMP)"
    createTrustedView("vw_works", spark.sql(
      s"""WITH dedup AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY _load_id ORDER BY record_metadata.IngestionTime) AS _rn
         |  FROM $from
         |)
         |SELECT
         |  get_json_object(record, '$$.id') AS work_id,
         |  get_json_object(record, '$$.doi') AS doi,
         |  get_json_object(record, '$$.title') AS title,
         |  try_cast(get_json_object(record, '$$.publication_year') AS INT) AS publication_year,
         |  get_json_object(record, '$$.host_venue') AS venue,
         |  get_json_object(record, '$$.primary_author') AS primary_author,
         |  $emailExpr AS email,
         |  $eventTs AS event_ts,
         |  try_cast(get_json_object(record, '$$.ingest_ts') AS TIMESTAMP) AS ingest_ts,
         |  get_json_object(record, '$$.source') AS source,
         |  _load_id AS load_id,
         |  $landedTs AS landed_ts,
         |  CASE WHEN $eventTs IS NOT NULL
         |       THEN unix_timestamp($landedTs) - unix_timestamp($eventTs)
         |  END AS latency_seconds
         |FROM dedup WHERE _rn = 1""".stripMargin))


    // Spark-4-native twin of vw_works: the landing JSON parses ONCE into a
    // VariantType value and every typed column is a variant_get over it —
    // one parse per row instead of one get_json_object re-parse per column,
    // which is the plan you want when the curated layer projects many
    // columns at 100 TB. try_* keeps the never-fail contract.
    val emailV = "try_variant_get(var, '$.email', 'string')"
    val emailVExpr =
      if (Masking.PrivilegedRoles(role(spark))) emailV else maskSql(emailV)
    val eventTsV = "try_cast(try_variant_get(var, '$.event_ts', 'string') AS TIMESTAMP)"
    val landedTsV =
      "coalesce(record_metadata.IngestionTime, " +
        "try_cast(try_variant_get(var, '$.ingest_ts', 'string') AS TIMESTAMP), " +
        "current_timestamp())"
    createTrustedView("vw_works_v", spark.sql(
      s"""WITH dedup AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY _load_id ORDER BY record_metadata.IngestionTime) AS _rn
         |  FROM $from
         |),
         |v AS (
         |  SELECT try_parse_json(record) AS var, record_metadata, _load_id
         |  FROM dedup WHERE _rn = 1
         |)
         |SELECT
         |  try_variant_get(var, '$$.id', 'string') AS work_id,
         |  try_variant_get(var, '$$.doi', 'string') AS doi,
         |  try_variant_get(var, '$$.title', 'string') AS title,
         |  try_variant_get(var, '$$.publication_year', 'int') AS publication_year,
         |  try_variant_get(var, '$$.host_venue', 'string') AS venue,
         |  try_variant_get(var, '$$.primary_author', 'string') AS primary_author,
         |  $emailVExpr AS email,
         |  $eventTsV AS event_ts,
         |  try_cast(try_variant_get(var, '$$.ingest_ts', 'string') AS TIMESTAMP) AS ingest_ts,
         |  try_variant_get(var, '$$.source', 'string') AS source,
         |  _load_id AS load_id,
         |  $landedTsV AS landed_ts,
         |  CASE WHEN $eventTsV IS NOT NULL
         |       THEN unix_timestamp($landedTsV) - unix_timestamp($eventTsV)
         |  END AS latency_seconds
         |FROM v""".stripMargin))


    // the rule-gated twin: defined CLEAR so graft.plans.MaskingRule can
    // decide masked-vs-clear per read from the session role. Secure
    // fallback: if the extension is NOT installed in this session, define
    // it with the same role-gated expression as vw_works — a session
    // without the rule must never expose the clear column to analysts.
    val ruleInstalled = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[graft.plans.MaskingRule])
    val gatedEmail = if (ruleInstalled) emailRaw else emailExpr
    createTrustedView("vw_works_gated", spark.sql(
      s"""SELECT get_json_object(record, '$$.id') AS work_id,
         |  get_json_object(record, '$$.title') AS title,
         |  $gatedEmail AS email,
         |  _load_id AS load_id
         |FROM $from""".stripMargin))


    // KPI over the trailing 5 minutes; the anchor is injectable
    // (spark.graft.anchor) for deterministic runs, wall-clock otherwise.
    // Validated as a timestamp BEFORE splicing into view SQL — a malformed
    // (or hostile) conf value must fail fast, not parse-error every view
    // reader or inject SQL into the view body.
    val anchor = spark.conf.getOption(AnchorConf)
      .map { a =>
        try java.sql.Timestamp.valueOf(a)
        catch {
          case _: IllegalArgumentException => throw new IllegalArgumentException(
            s"$AnchorConf must be 'yyyy-MM-dd HH:mm:ss[.f...]', got '$a'")
        }
        s"TIMESTAMP '$a'"
      }.getOrElse("current_timestamp()")
    createTrustedView("vw_latency", spark.sql(
      s"""SELECT
         |  round(avg(latency_seconds), 3) AS avg_sec_5m,
         |  min(latency_seconds) AS min_sec_5m,
         |  max(latency_seconds) AS max_sec_5m,
         |  approx_percentile(latency_seconds, 0.5) AS p50_sec_5m,
         |  approx_percentile(latency_seconds, 0.95) AS p95_sec_5m,
         |  count(*) AS samples_5m,
         |  $anchor - INTERVAL 5 MINUTES AS window_start,
         |  $anchor AS window_end
         |FROM vw_works
         |WHERE event_ts IS NOT NULL
         |  AND landed_ts >= $anchor - INTERVAL 5 MINUTES""".stripMargin))

  }
}

/** Ordered multi-statement SQL script runner (reference sql/apply.py:42-172):
  * files sorted by name (NN_ prefix convention), statements split on ';',
  * dry-run lists instead of executing.
  */
object SqlScriptRunner {
  /** Split on ';' EXCEPT inside single-quoted SQL string literals
    * (with '' escaping) — a literal like 'a;b' must not break a statement
    * in two and leave the session half-applied.
    */
  def splitStatements(script: String): Seq[String] = {
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inString = false
    var i = 0
    while (i < script.length) {
      val c = script(i)
      if (c == '\'') { inString = !inString; cur += c }
      else if (c == ';' && !inString) { stmts += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    stmts += cur.toString
    stmts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Returns the statements executed (or that would be, under dryRun). */
  def run(spark: SparkSession, scriptsByName: Seq[(String, String)],
          dryRun: Boolean = false): Seq[String] = {
    val stmts = scriptsByName.sortBy(_._1).flatMap(f => splitStatements(f._2))
    if (!dryRun) stmts.foreach(spark.sql(_))
    stmts
  }
}
