package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The landing plane: NDJSON envelope lines → a schema-agnostic lake table
  * `(record string, record_metadata struct<IngestionTime: timestamp>)`
  * partitioned by `landed_date`, mirroring the reference's
  * Firehose→warehouse delivery (infra/main.tf:159-186,
  * sql/03_tables_raw.sql:5-8):
  *
  *  - each micro-batch commit ≈ one Firehose delivery (ST1)
  *  - `record_metadata.IngestionTime` = commit time (ST2's landed_ts)
  *  - within-delivery `_LOAD_ID` dedup (ST5 at-least-once; the curated
  *    view dedups across deliveries, see Bootstrap)
  *  - unparseable lines go to a dated DLQ path instead of failing the
  *    batch (S5; reference errors/yyyy/MM/dd S3 prefix, main.tf:178-186)
  *
  * At 100 TB the date partitioning makes the curated layer's time filters
  * physical partition pruning, and appends never rewrite history.
  */
object Landing {

  /** Minimal wire validation schema — only `_LOAD_ID` is *required* on a
    * line for it to land; everything else stays schema-agnostic (the raw
    * JSON string is what's stored, typed-ness comes from curated views).
    */
  private val wireSchema = new StructType().add("_LOAD_ID", "string")

  /** Parse + validate raw lines: (record, p) where p is NULL for non-JSON. */
  private def parseWire(lines: DataFrame): DataFrame =
    lines.select(col("value").as("record"),
      from_json(col("value"), wireSchema).as("p"))

  /** Content-dedup key for a wire record: the q30 fingerprint
    * (TextOps.contentFingerprint — whitespace-normalized md5) of the
    * record with its `_LOAD_ID` member stripped first. `_LOAD_ID` is
    * TRANSPORT metadata: a producer that re-sends the same document under
    * a fresh load id (a replayed backfill, a re-crawl) is exactly the
    * duplicate this key catches, which the id key by definition cannot.
    *
    * The strip is POSITION-INDEPENDENT: a mid/last member loses its
    * LEADING comma (first alternative), a first member its trailing one
    * AND the whitespace after it (second alternative) — a
    * trailing-comma-only strip left `{"a":1,}` vs `{"a":1}` depending on
    * where the producer serialized the id, so the same content re-sent
    * with the key in a different position escaped dedup. The trailing
    * `\s*` matters for PRETTY-PRINTED producers: without it a first-member
    * strip of `{ "_LOAD_ID": "x", "a": 1}` left `{ "a": 1}` while the
    * mid-member spelling left `{"a": 1}` — a single interior space that
    * survives contentFingerprint's run-collapsing normalization. A literal `"_LOAD_ID"` INSIDE a JSON string value
    * cannot false-match: an unescaped quote cannot occur inside a valid
    * string, and the escaped form `\"_LOAD_ID\"` fails both alternatives
    * (the backslash sits where the comma / `{` lookbehind must match).
    */
  private[streaming] val loadIdStrip: String = {
    val v = """("[^"]*"|[^,}\s]+)"""
    raw""",\s*"_LOAD_ID"\s*:\s*$v|(?<=\{)\s*"_LOAD_ID"\s*:\s*$v\s*,?\s*"""
  }

  private def contentKey(record: Column): Column =
    graft.functions.TextOps.contentFingerprint(
      regexp_replace(record, loadIdStrip, ""))

  /** Opt-in ingest-time corpus stages — the narrow per-row members of the
    * q51 pipeline, applied as the data LANDS instead of by re-reading the
    * lake (at 100 TB/day the difference is a second full pass):
    *
    *  - `qualityFloor`: drop text-bearing records scoring below the q28
    *    quality floor (records WITHOUT the text field are transport /
    *    control data the gate has no opinion on — they land unchanged;
    *    degenerate text whose score is NULL — empty or whitespace-only —
    *    is always gated, matching the q51 pipeline's quality stage)
    *  - `scrubPii`: q46's RE2-safe email/phone redaction over the whole
    *    wire record — PII is PII in any field
    *  - `splitSalt`: stamp a deterministic 80/10/10 train/val/test `split`
    *    column (q54's thresholds), keyed by the load-id-stripped CONTENT
    *    fingerprint so a re-send under a fresh `_LOAD_ID` keeps its
    *    assignment
    *
    *  - `mediaPath`: decode media metadata AT LANDING from a base64
    *    payload field (the wire shape binary rides JSON envelopes in):
    *    stamps a typed `media_meta` struct — content fingerprint, byte
    *    length, the strict container sniff across the full decode family
    *    (PNG/JPEG/GIF/WebP via the marker walks, BMP, WAV/MP4 via the
    *    chunk/box walks), dims and PCM parameters, plus the REAL decoded
    *    facts for the uncompressed classes (BMP pixel-luma min/max/mean,
    *    PCM sample-magnitude peak/sum) — so the curated layer
    *    routes on typed columns without ever re-reading payload bytes
    *    from the lake (at 100 TB/day the difference is a second full
    *    pass over the heaviest bytes in the system). Records without the
    *    field (or with undecodable base64) carry a NULL struct.
    *
    *  - `domainBlocklist`: (url JSON path, blocked registered domains) —
    *    q68's UT1-style gate at the EDGE: a record from a blocklisted
    *    registered domain is rejected before any other stage spends
    *    compute on it (q71's filter-first discipline); the derivation is
    *    q68's own `registeredDomainOf`, so landing and curation can never
    *    judge one host differently
    *
    *  - `dedupHistory`: q74's incremental-dedup verdict AT LANDING — the
    *    crawl delta is judged against a history snapshot (a static
    *    `(doc_id, text)` frame of the curated lake) AS IT LANDS, instead
    *    of by a later batch pass over the lake: each text-bearing record
    *    is stamped with a `dup_verdict` struct (`exact_dup`, `near_dup`,
    *    `keep`, `exact_src`, `near_src` — q74's exact columns, derived by
    *    the SAME `Dedup.incrementalDedupOn` so landing and the batch
    *    refresh can never disagree on what counts as a duplicate). The
    *    verdict is a STAMP, not a filter — the lake keeps the delivery
    *    intact and the curated layer routes on `dup_verdict.keep`.
    *    Text-less records carry a NULL struct (the transport/control
    *    rule). Judged LAST, over the SCRUBBED text, because the history
    *    snapshot is the landed lake — which stores scrubbed bytes.
    *
    *  - `frontierSeen`: (url JSON path, seen-set snapshot) — q94's
    *    frontier judgment AT LANDING: each url-bearing record stamped
    *    with a `frontier_verdict` struct (canonical_url +
    *    already_fetched vs the snapshot), canonicalized through the
    *    SAME `Text.canonicalUrl` q91/q94 use. A delta-sized
    *    stream-static meet like the history verdict; a stamp, not a
    *    filter.
    *
    * Stage order is fixed: dedup → domain gate → quality gate → scrub →
    * split → media → history verdict (the
    * split key is the SCRUBBED record — what the lake actually stores —
    * so the assignment can be re-derived from the landed bytes; the
    * media decode runs after, though scrubbing cannot touch a payload:
    * the base64 alphabet contains neither '@' nor '-', so the q46
    * email/phone patterns cannot match inside an encoded field). All
    * stages except the history verdict are pure narrow maps/filters — no
    * shuffle on the landing path; the verdict is the ONE exception by
    * nature: a delta-sized stream-static meet (micro-batch incoming side
    * against the static history), q74's plan shape paid per delivery,
    * with the expensive gates (domain, quality) already applied before
    * any row reaches it. Batch and streaming entry points share this one
    * application point so they cannot drift.
    */
  case class IngestStages(
      textPath: String = "$.text",
      qualityFloor: Option[Double] = None,
      scrubPii: Boolean = false,
      splitSalt: Option[String] = None,
      mediaPath: Option[String] = None,
      domainBlocklist: Option[(String, Seq[String])] = None,
      dedupHistory: Option[DataFrame] = None,
      frontierSeen: Option[(String, DataFrame)] = None)

  private def applyStages(validated: DataFrame, st: IngestStages): DataFrame = {
    import graft.operators.Text
    var df = validated
    // the domain gate runs FIRST (q71's filter-first discipline): a
    // record from a blocklisted registered domain never pays quality
    // scoring, scrubbing or media decode. Records WITHOUT the url field
    // are transport/control data the gate has no opinion on (the
    // qualityFloor rule). The list rides the closure as an isin literal —
    // a real UT1-scale list (a few million domains) swaps in q68's
    // broadcast-join form, or q63's bloom shape beyond that; the
    // registered-domain derivation is SHARED with q68 (registeredDomainOf)
    // so landing and curation judge a host identically.
    st.domainBlocklist.foreach { case (path, blocked) =>
      val url = get_json_object(col("record"), path)
      val registered = Text.registeredDomainOf(Text.hostOf(url))
      df = df.filter(url.isNull || !registered.isin(blocked: _*))
    }
    st.qualityFloor.foreach { floor =>
      val text = get_json_object(col("record"), st.textPath)
      // the score coalesces to 0.0: degenerate text (empty / whitespace-only
      // makes the avg-token-length division NULL) is ALWAYS gated, the same
      // outcome the q51 pipeline's quality stage gives it (a NULL score
      // fails its `quality >= floor` filter) — only truly text-LESS records
      // are transport/control data the gate has no opinion on
      df = df.filter(
        text.isNull || coalesce(Text.qualityScore(text), lit(0.0)) >= floor)
    }
    if (st.scrubPii)
      df = df.withColumn("record", Text.scrubPii(col("record")))
    st.splitSalt.foreach { salt =>
      val h = substring(md5(concat(lit(salt), contentKey(col("record")))), 1, 8)
      df = df.withColumn("split",
        when(h < "cccccccc", "train")
          .when(h < "e6666666", "val")
          .otherwise("test"))
    }
    st.mediaPath.foreach { path =>
      import graft.operators.Multimodal
      import graft.functions.{AudioOps, ImageOps}
      // the same pre-projection discipline as the q39/q56/q58 queries:
      // each packed decode walk runs once per row, then the struct builder
      // splits attribute references for free
      df = df
        .withColumn("_mb", unbase64(get_json_object(col("record"), path)))
        .withColumn("_jd", ImageOps.jpegDims(col("_mb")))
        .withColumn("_md", ImageOps.mp4Dims(col("_mb")))
        .withColumn("_wd", AudioOps.wavFmt(col("_mb")))
        .withColumn("_ym", graft.functions.VideoOps.y4mMeta(col("_mb")))
        .withColumn("_img", Multimodal.decodeImageMetaFrom(col("_mb"), col("_jd")))
        .withColumn("_av", Multimodal.decodeAvMetaFrom(col("_mb"), col("_md"), col("_wd")))
        .withColumn("_bmp", Multimodal.decodeBmpMeta(col("_mb")))
        .withColumn("_bl", ImageOps.bmpLuma(col("_mb")))
        .withColumn("_ps", AudioOps.wavPcmStats(col("_mb")))
        .withColumn("media_meta", when(col("_mb").isNotNull, struct(
          md5(col("_mb")).as("fp"),
          octet_length(col("_mb")).as("n_bytes"),
          when(col("_img.format") =!= "unknown", col("_img.format"))
            .when(col("_bmp.format") =!= "unknown", col("_bmp.format"))
            .when(col("_ym").isNotNull, "y4m")
            .when(col("_av.format") =!= "unknown", col("_av.format"))
            .otherwise("unknown").as("format"),
          coalesce(col("_img.width"), col("_bmp.width"),
            shiftrightunsigned(col("_ym"), 40).cast("int"),
            col("_av.width")).as("width"),
          coalesce(col("_img.height"), col("_bmp.height"),
            shiftright(col("_ym"), 20).bitwiseAND(lit(0xFFFFF)).cast("int"),
            col("_av.height")).as("height"),
          col("_av.sample_rate").as("sample_rate"),
          col("_av.channels").as("channels"),
          col("_av.bits").as("bits"),
          // REAL decoded facts, not just headers: pixel luma for the
          // uncompressed image class, sample magnitudes for PCM audio —
          // the q59/q62 folds applied AT landing so the curated layer
          // filters on brightness/silence without re-reading payloads
          col("_bl").bitwiseAND(lit(0xFF)).cast("int").as("min_luma"),
          shiftright(col("_bl"), 8).bitwiseAND(lit(0xFF)).cast("int")
            .as("max_luma"),
          floor(shiftrightunsigned(col("_bl"), 16) * 100 /
            (col("_bmp.width").cast("long") * col("_bmp.height")))
            .as("mean_luma_x100"),
          col("_ps").bitwiseAND(lit(0x1FFFF)).cast("int").as("peak_abs"),
          shiftrightunsigned(col("_ps"), 17).as("sum_abs"),
          // frame count PARSED from the bytes (y4m only: mp4 frame counts
          // are caller sidecar metadata the wire record does not carry)
          col("_ym").bitwiseAND(lit(0xFFFFF)).cast("int").as("n_frames"))))
        .drop("_mb", "_jd", "_md", "_wd", "_ym", "_img", "_av", "_bmp",
          "_bl", "_ps")
    }
    st.dedupHistory.foreach { history =>
      import graft.operators.Dedup
      // the incoming side keys on `_load_id` (unique within the delivery
      // after the within-delivery dedup above) so the verdict joins back
      // without inventing a second identity; the SCRUBBED text is judged
      // because that is what the history lake stores
      val text = get_json_object(col("record"), st.textPath)
      val incoming = df.filter(text.isNotNull)
        .select(col("_load_id").as("doc_id"), text.as("text"))
      val verdict = Dedup.incrementalDedupOn(incoming, history)
        .select(col("doc_id").as("_load_id"),
          struct(col("exact_dup"), col("near_dup"), col("keep"),
            col("exact_src"), col("near_src")).as("dup_verdict"))
      df = df.join(verdict, Seq("_load_id"), "left")
    }
    // the frontier verdict AT LANDING (q94's judgment as the crawl
    // lands): records carrying the url field are canonicalized through
    // the SAME Text.canonicalUrl q91/q94 use — landing and curation
    // cannot disagree on which URLs are the same resource — and judged
    // against a seen-set snapshot (one `seen_url` column of canonical
    // URLs, the frame a crawler's frontier store materializes). A stamp,
    // not a filter: the scheduler routes on
    // `frontier_verdict.already_fetched`. Like the history verdict, a
    // delta-sized stream-static left meet; url-less records carry a NULL
    // struct (the transport/control rule).
    st.frontierSeen.foreach { case (path, seen) =>
      import graft.operators.Text
      val url = get_json_object(col("record"), path)
      val withCanon = df.withColumn("_canon",
        when(url.isNotNull, Text.canonicalUrl(url)))
      val seenK = seen.select(col("seen_url").as("_seen_url")).distinct()
      df = withCanon
        .join(seenK, withCanon("_canon") === seenK("_seen_url"), "left")
        .withColumn("frontier_verdict", when(col("_canon").isNotNull,
          struct(col("_canon").as("canonical_url"),
            col("_seen_url").isNotNull.cast("int").as("already_fetched"))))
        .drop("_canon", "_seen_url")
    }
    df
  }

  /** The landing-row shape, shared by every entry point so the batch and
    * streaming paths cannot drift: record + metadata struct + load id +
    * whichever opt-in stage columns are present (`split`, `media_meta`) +
    * date partition, all stamped from one `ts` expression.
    */
  private def landingProjection(validated: DataFrame, ts: Column): DataFrame = {
    val extra = Seq("split", "media_meta", "dup_verdict", "frontier_verdict")
      .filter(validated.columns.contains).map(col)
    validated.select(
      Seq(col("record"),
        struct(ts.as("IngestionTime")).as("record_metadata"),
        col("_load_id")) ++ extra :+
        to_date(ts).as("landed_date"): _*)
  }

  /** Land one batch of raw NDJSON lines (column `value`).
    * `ingestionTime` is injectable for reproducible tests; when omitted it
    * is snapshotted ONCE per call (not `current_timestamp()` per action),
    * so the DLQ write and the landing write of one delivery agree on the
    * date even across a midnight boundary.
    */
  def landBatch(
      lines: DataFrame,
      landingDir: String,
      dlqDir: Option[String] = None,
      ingestionTime: Column = null,
      fingerprintDedup: Boolean = false,
      stages: Option[IngestStages] = None): Unit = {
    val ts = Option(ingestionTime)
      .getOrElse(lit(new java.sql.Timestamp(System.currentTimeMillis())))
    // parsed feeds two writes (DLQ + landing) — cache so the batch source
    // is scanned and JSON-validated once, not once per sink
    val parsed = parseWire(lines).persist()
    try {
      // a line is DLQ-bound if it isn't JSON at all or carries no load id —
      // without one, at-least-once redelivery could never be deduped
      val bad = parsed.filter(col("p").isNull || col("p._LOAD_ID").isNull)
      dlqDir.foreach { d =>
        bad.select(
          col("record"),
          lit("unparseable or missing _LOAD_ID").as("error"),
          to_date(ts).as("error_date"))
          .write.mode("append").partitionBy("error_date").parquet(d)
      }
      val valid = parsed
        .filter(col("p").isNotNull && col("p._LOAD_ID").isNotNull)
        .withColumn("_load_id", col("p._LOAD_ID"))
      // within-delivery dedup: retries inside one put cannot double-land;
      // with fingerprintDedup the key is CONTENT (load-id-stripped q30
      // fingerprint), so a same-document re-send under a fresh id
      // collapses too
      val validated =
        if (fingerprintDedup)
          valid.withColumn("_fp", contentKey(col("record")))
            .dropDuplicates("_fp").drop("_fp")
        else valid.dropDuplicates("_load_id")
      val staged = stages.fold(validated)(applyStages(validated, _))
      landingProjection(staged, ts)
        .write.mode("append").partitionBy("landed_date").parquet(landingDir)
    } finally parsed.unpersist()
  }

  /** Stateful exactly-once landing: streaming `dropDuplicates` on
    * `_LOAD_ID` keeps dedup state ACROSS micro-batches, so an at-least-once
    * redelivery in a later delivery never lands twice — upgrade over the
    * within-delivery dedup in `landBatch` (whose cross-delivery guard is
    * the curated view). The file sink + checkpoint makes the whole path
    * end-to-end exactly-once. `current_timestamp()` in a streaming query
    * evaluates per micro-batch, so a long-running query stamps each
    * delivery's own time.
    *
    * OPT-IN: this variant keeps `_LOAD_ID` state FOREVER — dedup state
    * grows with total ids ever landed, which only works for finite replays
    * (tests, bounded backfills). The production path is
    * `landStreamBounded`, whose state is evicted after the replay window,
    * matching the reference's bounded 300 s retry guarantee.
    *
    * Limitation vs `landStream`: unparseable / `_LOAD_ID`-less lines are
    * DROPPED here — a single streaming query cannot fork a second DLQ sink
    * (that needs `foreachBatch`). When bad records must be preserved for
    * replay, use `landStream` with a dlqDir; observe the drop rate via
    * `IngestCounters` input-rows vs landed counts.
    */
  def landStreamDeduped(
      spark: SparkSession,
      inputDir: String,
      landingDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val validated = parseWire(
      spark.readStream.format("text").load(inputDir))
      .filter(col("p").isNotNull && col("p._LOAD_ID").isNotNull)
      .withColumn("_load_id", col("p._LOAD_ID"))
      .dropDuplicates("_load_id") // stateful: survives across micro-batches
    landingProjection(validated, current_timestamp())
      .writeStream
      .format("parquet")
      .option("path", landingDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("landed_date")
      .trigger(trigger)
      .start()
  }

  /** Bounded-state stateful landing — the production composition of the
    * other two entry points: cross-batch `_LOAD_ID` dedup whose state is
    * EVICTED after `replayWindow`, *and* DLQ preservation of bad lines.
    *
    *  - Every line gets a dedup key: its `_LOAD_ID`, or for unparseable /
    *    id-less lines a synthetic `__dlq__:sha256(record)` key so they pass
    *    through the dedup operator and still reach the DLQ fork (identical
    *    bad lines inside one replay window collapse to one DLQ row —
    *    content-identical garbage carries no extra replay information).
    *  - The watermark column is the ARRIVAL time (`current_timestamp()`,
    *    evaluated per micro-batch). That makes the bound a wall-clock
    *    replay window — exactly the reference's semantics, where Firehose
    *    retries a failed delivery for `snowflake_retry_seconds = 300`
    *    (infra/variables.tf:77-81): a redelivery always arrives within a
    *    bounded wall-clock interval of the first attempt, so event-time
    *    lateness is irrelevant and no record can ever be "too late".
    *  - `dropDuplicatesWithinWatermark` guarantees: a redelivery arriving
    *    within `replayWindow` of the first arrival never double-lands;
    *    after the window the state is gone and the path degrades to
    *    at-least-once — which the curated view's `row_number` dedup
    *    (Bootstrap) still absorbs downstream. State size is bounded by
    *    (arrival rate × window), independent of total history — the
    *    property that makes this runnable forever at 100 TB/day.
    *  - Survivors land through the same `landBatch` as every other path
    *    (one code path: DLQ fork + within-delivery dedup + projection).
    */
  def landStreamBounded(
      spark: SparkSession,
      inputDir: String,
      landingDir: String,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      replayWindow: String = "300 seconds",
      trigger: Trigger = Trigger.AvailableNow(),
      fingerprintDedup: Boolean = false,
      stages: Option[IngestStages] = None): StreamingQuery = {
    // opt-in content dedup (fingerprintDedup): valid lines key on the
    // load-id-stripped q30 content fingerprint instead of `_LOAD_ID`, so a
    // re-send of the same document under a FRESH id is still one landing
    // within the replay window. Bad lines keep their synthetic content key
    // either way. Same bounded-state guarantees; the batch twin is
    // landBatch(fingerprintDedup = true), threaded through below so the
    // within-delivery rule agrees with the cross-delivery one.
    val validKey =
      if (fingerprintDedup) concat(lit("fp:"), contentKey(col("record")))
      else col("p._LOAD_ID")
    val deduped = parseWire(spark.readStream.format("text").load(inputDir))
      .withColumn("_dedup_key",
        when(col("p").isNotNull && col("p._LOAD_ID").isNotNull, validKey)
          .otherwise(
            concat(lit("__dlq__:"), sha2(col("record").cast("binary"), 256))))
      .withColumn("_arrival_ts", current_timestamp())
      .withWatermark("_arrival_ts", replayWindow)
      .dropDuplicatesWithinWatermark("_dedup_key")
    deduped
      .select(col("record").as("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landBatch(batch, landingDir, dlqDir,
          fingerprintDedup = fingerprintDedup, stages = stages)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Structured Streaming ingestion: watch `inputDir` for NDJSON files and
    * land each micro-batch through the same `landBatch` the batch path
    * uses — batch ≡ stream by construction (one code path).
    */
  def landStream(
      spark: SparkSession,
      inputDir: String,
      landingDir: String,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      stages: Option[IngestStages] = None): StreamingQuery =
    spark.readStream
      .format("text")
      .load(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landBatch(batch, landingDir, dlqDir, stages = stages)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
