package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Producer
import graft.operators.Relational
import graft.streaming.{IngestCounters, Landing}

/** Streaming semantics: the tumbling-window aggregate produces identical
  * results in batch and streaming execution (ST1-ST3), and the
  * observability counters see every row (A3/ST6).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** File-source streaming twin of `Tables.load("events")`: file-source
    * streaming needs an explicit schema, and the corpus generator has
    * stored `ts` two ways across driver versions (int64 nanos under the
    * nanosAsLong conf vs plain TIMESTAMP micros). Infer the raw encoding
    * from the batch reader's schema and normalize exactly like the batch
    * loader, so the batch≡stream parity tests hold on either corpus.
    */
  private def eventsStream(streamDir: String) = {
    val raw = spark.read.parquet(s"$streamDir/events.parquet").schema
    val s = spark.readStream.schema(raw).parquet(streamDir)
    raw("ts").dataType match {
      case LongType => s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => s.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  test("fetch pacer: one streaming batch == q107's allowed schedule") {
    // the flatMapGroupsWithState pacer must reproduce q107's slot
    // assignment exactly when the whole frontier arrives as one delta —
    // the custom-state operator and the batch window are two spellings
    // of the same contract
    import graft.streaming.FetchPacer
    import graft.streaming.FetchPacer.FetchReq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q107 = graft.operators.Crawl.q107FetchSchedule(spark, TestSpark.Sf0001)
      .where(col("allowed") === 1).localCheckpoint()
    val reqs = q107
      .select(col("host"), col("canonical_url"), col("disc_pos"),
        col("delay_sec")).as[FetchReq].collect().toSeq
    val mem = MemoryStream[FetchReq]
    mem.addData(reqs)
    val q = FetchPacer.assignSlots(mem.toDS()).writeStream
      .format("memory").queryName("pacer_one").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("pacer_one")
      .select("host", "canonical_url", "fetch_seq", "sched_sec")
      .as[(String, String, Int, Long)].collect().toSet
    val batch = q107
      .select(col("host"), col("canonical_url"), col("fetch_seq"),
        col("sched_sec"))
      .as[(String, String, Int, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("fetch pacer state continues slot numbering across micro-batches") {
    // the reason this is custom state and not a window: a later frontier
    // delta's URLs must take the slots AFTER everything the host already
    // scheduled, at the same pacing — per-key state carries the counter
    import graft.streaming.FetchPacer
    import graft.streaming.FetchPacer.FetchReq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FetchReq]
    val q = FetchPacer.assignSlots(mem.toDS()).writeStream
      .format("memory").queryName("pacer_two").outputMode("append").start()
    mem.addData(FetchReq("h.example", "u0", 10L, 3),
      FetchReq("h.example", "u1", 5L, 3))
    q.processAllAvailable()
    mem.addData(FetchReq("h.example", "u2", 1L, 3),
      FetchReq("g.example", "v0", 7L, 1))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("pacer_two")
      .as[(String, String, Int, Int, Long)].collect()
      .map(r => r._2 -> (r._3, r._5)).toMap
    // batch 1: within-delta discovery order (u1 before u0)
    assert(rows("u1") === ((0, 0L)))
    assert(rows("u0") === ((1, 3L)))
    // batch 2: u2's LOWER disc_pos does not reopen taken slots — the
    // delta continues where the host's numbering stopped (the stated
    // streaming trade: order is per-delta, continuation is global)
    assert(rows("u2") === ((2, 6L)))
    // a brand-new host starts at slot 0
    assert(rows("v0") === ((0, 0L)))
  }

  // the expiring pacer's engine behavior rules the obvious test shape
  // out: with ProcessingTimeTimeout armed, the micro-batch engine keeps
  // firing empty timeout-check batches, so (a) a mid-test sleep longer
  // than the ttl expires EVERY idle host, not just the one under test,
  // and (b) processAllAvailable can livelock against the back-to-back
  // empty batches (noNewData flips back before the waiter observes it).
  // So: two queries — continuation under a ttl the test never crosses,
  // expiry under one it always does — and row-count polling, never
  // processAllAvailable.
  private def awaitRows(table: String, n: Long): Unit = {
    val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
    while (spark.table(table).count() < n) {
      assert(System.nanoTime < deadline, s"timed out waiting for $n rows in $table")
      Thread.sleep(200)
    }
  }

  test("fetch pacer aging: a host refreshed within the ttl keeps its continuation") {
    import graft.streaming.FetchPacer
    import graft.streaming.FetchPacer.FetchReq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FetchReq]
    val q = FetchPacer.assignSlotsExpiring(mem.toDS(), "60 seconds")
      .writeStream
      .format("memory").queryName("pacer_ttl_live").outputMode("append").start()
    mem.addData(FetchReq("live.example", "b0", 5L, 2),
      FetchReq("live.example", "b1", 1L, 2))
    awaitRows("pacer_ttl_live", 2)
    mem.addData(FetchReq("live.example", "b2", 9L, 2))
    awaitRows("pacer_ttl_live", 3)
    q.stop()
    val rows = spark.table("pacer_ttl_live")
      .as[(String, String, Int, Int, Long)].collect()
      .map(r => r._2 -> (r._3, r._5)).toMap
    // identical continuation semantics to the NoTimeout pacer while the
    // host stays inside its ttl window
    assert(rows("b1") === ((0, 0L)))
    assert(rows("b0") === ((1, 2L)))
    assert(rows("b2") === ((2, 4L)))
  }

  test("fetch pacer aging: an expired host restarts numbering at slot 0") {
    import graft.streaming.FetchPacer
    import graft.streaming.FetchPacer.FetchReq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FetchReq]
    val q = FetchPacer.assignSlotsExpiring(mem.toDS(), "500 milliseconds")
      .writeStream
      .format("memory").queryName("pacer_ttl_old").outputMode("append").start()
    mem.addData(FetchReq("old.example", "a0", 1L, 2),
      FetchReq("old.example", "a1", 2L, 2))
    awaitRows("pacer_ttl_old", 2)
    // idle past the ttl: the engine's timeout-check batches fire the
    // expiry path (state removed, NOTHING emitted for the expiry itself)
    Thread.sleep(2500)
    mem.addData(FetchReq("old.example", "a2", 3L, 2))
    awaitRows("pacer_ttl_old", 3)
    q.stop()
    val rows = spark.table("pacer_ttl_old")
      .as[(String, String, Int, Int, Long)].collect()
      .map(r => r._2 -> (r._3, r._5)).toMap
    assert(rows.keySet === Set("a0", "a1", "a2"))
    assert(rows("a0") === ((0, 0L)))
    assert(rows("a1") === ((1, 2L)))
    // the aged host starts clean — slot 0, not slot 2
    assert(rows("a2") === ((0, 0L)))
  }

  test("tumbling 1h window: streaming over the same events == batch q14") {
    // file source wants a directory, not a single file
    val streamDir = Files.createTempDirectory("graft_win").toString
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = eventsStream(streamDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
    val q = stream.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("win_stream")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Relational.q14TumblingWindow(spark, TestSpark.Sf0001)
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("session windows: streaming over the same events == batch q38") {
    // same complete-mode AvailableNow shape as the tumbling parity test:
    // session windows additionally exercise streaming state MERGING
    // (adjacent sessions fusing when a bridging event arrives), which
    // tumbling windows never do
    val streamDir = Files.createTempDirectory("graft_sess").toString
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = eventsStream(streamDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("cnt"))
    val q = stream.writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("sess_stream")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val batch = Relational.q38SessionWindow(spark, TestSpark.Sf0001)
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("interval join: watermarked stream-stream == batch q69") {
    // the SAME join expression (Relational.intervalJoin) runs as a
    // watermarked stream-stream join — the watermark bounds the join
    // state exactly the way the 60-minute range bounds the batch merge
    val streamDir = Files.createTempDirectory("graft_ij").toString
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    def side(t: String) = eventsStream(streamDir)
      .filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "2 hours")
    val joined = Relational.intervalJoin(side("view"), side("purchase"))
    val q = joined.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("ij_stream")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    val batch = Relational.q69IntervalJoin(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops events later than the allowed lateness (ST4)") {
    // Append mode is where the drop guarantee holds (update mode only
    // evicts state — a too-late row can re-emit a fresh count). Each file
    // is its own AvailableNow RUN over a shared checkpoint, so the
    // watermark persists between runs (deterministic batch order + real
    // checkpoint recovery; in-flight file ordering by mod time is not):
    //   run1: events at 11:00, 12:00   → checkpointed watermark = 11:50
    //   run2: 11:55 (within lateness) + 10:00 (too late → filtered)
    //   run3: 13:30 pushes the watermark past the open windows → emit
    val base = Files.createTempDirectory("graft_wm").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    def line(id: Int, ts: String) = s"""{"event_id":$id,"ts":"$ts"}"""
    def runOnce(name: String, ls: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$in/$name"), ls.mkString("\n").getBytes)
      val agg = spark.readStream
        .schema(StructType(Seq(StructField("event_id", LongType), StructField("ts", StringType))))
        .json(in)
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast("string").as("h"), col("cnt"))
      val q = agg.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce("b1.ndjson", Seq(line(1, "2024-01-01 11:00:00"), line(2, "2024-01-01 12:00:00")))
    runOnce("b2.ndjson", Seq(line(3, "2024-01-01 11:55:00"), line(4, "2024-01-01 10:00:00")))
    runOnce("b3.ndjson", Seq(line(5, "2024-01-01 13:30:00")))
    val byWindow = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 11:00 window closed with events 1 + 3 (late-but-in-lateness counted)
    assert(byWindow.get("2024-01-01 11:00:00").contains(2L))
    assert(byWindow.get("2024-01-01 12:00:00").contains(1L))
    // the too-late 10:00 event was dropped: its window never emitted
    assert(!byWindow.contains("2024-01-01 10:00:00"))
    // 13:00 window still open at termination — append emitted nothing for it
    assert(!byWindow.contains("2024-01-01 13:00:00"))
  }

  test("stateful landing dedups a redelivery arriving in a LATER micro-batch (ST5)") {
    val base = Files.createTempDirectory("graft_stateful").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$in/d1.ndjson"),
      Seq("""{"_LOAD_ID":"A","n":1}""", """{"_LOAD_ID":"B","n":2}""").mkString("\n").getBytes)
    Thread.sleep(1100)
    // second delivery redelivers A (lost ack) plus a new record
    Files.write(java.nio.file.Paths.get(s"$in/d2.ndjson"),
      Seq("""{"_LOAD_ID":"A","n":1}""", """{"_LOAD_ID":"C","n":3}""").mkString("\n").getBytes)

    val q = spark.readStream.format("text")
      .option("maxFilesPerTrigger", 1) // force separate micro-batches
      .load(in)
      .select(col("value").as("record"),
        from_json(col("value"), new org.apache.spark.sql.types.StructType()
          .add("_LOAD_ID", "string")).as("p"))
      .filter(col("p._LOAD_ID").isNotNull)
      .withColumn("_load_id", col("p._LOAD_ID"))
      .dropDuplicates("_load_id")
      .select("record", "_load_id")
      .writeStream.format("parquet")
      .option("path", s"$base/landing")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.read.parquet(s"$base/landing")
      .select("_load_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq === Seq("A", "B", "C")) // A landed exactly once

    // and the library entry point does the same end-to-end
    val base2 = Files.createTempDirectory("graft_stateful2").toString
    val in2 = s"$base2/in"; new java.io.File(in2).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$in2/d.ndjson"),
      Seq("""{"_LOAD_ID":"X"}""", """{"_LOAD_ID":"X"}""", """{"_LOAD_ID":"Y"}""")
        .mkString("\n").getBytes)
    val q2 = Landing.landStreamDeduped(spark, in2, s"$base2/landing", s"$base2/ckpt")
    q2.awaitTermination(60000)
    val landed2 = spark.read.parquet(s"$base2/landing")
    assert(landed2.count() === 2)
    assert(landed2.columns.toSet ===
      Set("record", "record_metadata", "_load_id", "landed_date"))
  }

  test("bounded landing: DLQ preserved, redelivery deduped, state evicted after window") {
    // landStreamBounded with a 2s replay window, three AvailableNow runs
    // over one checkpoint (wall-clock arrival-time watermark):
    //   run1: A, B, dup-A, malformed, id-less  → lands {A,B}; DLQ ×2
    //   run2 (after 5s): redeliver A, new C    → A deduped (state not yet
    //         evicted: the watermark lags one batch, still at t1-2s), so
    //         only C lands; afterwards the watermark passes A's expiry
    //   run3 (after 5s): redeliver A and C     → A RE-LANDS (state evicted
    //         — the bound is real), C still deduped (inside its window)
    val base = Files.createTempDirectory("graft_bounded").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    def runOnce(name: String, ls: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$in/$name"), ls.mkString("\n").getBytes)
      val q = Landing.landStreamBounded(spark, in, s"$base/landing", s"$base/ckpt",
        dlqDir = Some(s"$base/dlq"), replayWindow = "2 seconds")
      q.awaitTermination(60000)
    }
    runOnce("d1.ndjson", Seq(
      """{"_LOAD_ID":"A","n":1}""", """{"_LOAD_ID":"B","n":2}""",
      """{"_LOAD_ID":"A","n":1}""", // within-delivery duplicate
      "not json at all", """{"no_id":1}"""))
    val landed1 = spark.read.parquet(s"$base/landing")
      .select("_load_id").collect().map(_.getString(0)).sorted.toSeq
    assert(landed1 === Seq("A", "B"))
    // both bad lines reached the DLQ despite passing through the dedup op
    val dlq = spark.read.parquet(s"$base/dlq")
    assert(dlq.count() === 2)
    assert(dlq.columns.toSet === Set("record", "error", "error_date"))

    Thread.sleep(5000)
    runOnce("d2.ndjson", Seq(
      """{"_LOAD_ID":"A","n":1}""", // redelivery inside the window → dropped
      """{"_LOAD_ID":"C","n":3}"""))
    val landed2 = spark.read.parquet(s"$base/landing")
      .select("_load_id").collect().map(_.getString(0)).sorted.toSeq
    assert(landed2 === Seq("A", "B", "C"))

    Thread.sleep(5000)
    runOnce("d3.ndjson", Seq(
      """{"_LOAD_ID":"A","n":1}""", // state evicted → lands again
      """{"_LOAD_ID":"C","n":3}""")) // still inside C's window → dropped
    val landed3 = spark.read.parquet(s"$base/landing")
      .select("_load_id").collect().map(_.getString(0)).sorted.toSeq
    assert(landed3 === Seq("A", "A", "B", "C"))
  }

  test("content-fingerprint landing dedups a re-send under a NEW load id; batch == stream") {
    // the id key cannot catch this by definition: same document, fresh
    // _LOAD_ID (a replayed backfill / re-crawl), whitespace jitter
    val l1 = """{"_LOAD_ID":"L1","title":"Same   Paper","n":1}"""
    val l2 = """{"_LOAD_ID":"L2","title":"same paper","n":1}"""
    val l3 = """{"_LOAD_ID":"L3","title":"other","n":2}"""

    // batch twin: one delivery carrying all three lines
    val baseB = Files.createTempDirectory("graft_fp_batch").toString
    Landing.landBatch(Seq(l1, l2, l3).toDF("value"), s"$baseB/landing",
      fingerprintDedup = true)
    val batchLanded = spark.read.parquet(s"$baseB/landing")
    assert(batchLanded.count() === 2)

    // stream: the re-send arrives in a LATER delivery over one checkpoint
    val base = Files.createTempDirectory("graft_fp_stream").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    def runOnce(name: String, ls: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$in/$name"), ls.mkString("\n").getBytes)
      val q = Landing.landStreamBounded(spark, in, s"$base/landing",
        s"$base/ckpt", fingerprintDedup = true)
      q.awaitTermination(60000)
    }
    runOnce("d1.ndjson", Seq(l1, l3))
    runOnce("d2.ndjson", Seq(l2)) // same content as l1 → state drops it
    val streamLanded = spark.read.parquet(s"$base/landing")
    // first arrival wins: the stream landed exactly {l1, l3}
    assert(streamLanded.select("record").collect().map(_.getString(0)).toSet
      === Set(l1, l3))

    // batch ≡ stream: identical landed CONTENT, checked through an
    // independent JVM recompute of the load-id-stripped fingerprint
    def fpJvm(rec: String): String = {
      val stripped = rec.replaceAll(
        ",\\s*\"_LOAD_ID\"\\s*:\\s*(\"[^\"]*\"|[^,}\\s]+)" +
          "|(?<=\\{)\\s*\"_LOAD_ID\"\\s*:\\s*(\"[^\"]*\"|[^,}\\s]+)\\s*,?", "")
      val norm = stripped.toLowerCase.replaceAll("\\s+", " ").trim
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    val bFps = batchLanded.select("record").collect()
      .map(r => fpJvm(r.getString(0))).sorted.toSeq
    val sFps = streamLanded.select("record").collect()
      .map(r => fpJvm(r.getString(0))).sorted.toSeq
    assert(bFps === sFps)
    assert(bFps.distinct.length === 2, "a content duplicate survived")
  }

  test("ingest-time corpus stages gate, scrub and split identically in batch and stream") {
    // the narrow members of the corpus pipeline (q28 quality gate, q46 PII
    // scrub, q54 split) applied as the data LANDS — one application point
    // inside landBatch, shared by the streaming foreachBatch, so the two
    // paths cannot drift
    val goodText = Seq.fill(8)("alpha beta gamma delta epsilon").mkString(" ")
    val lGood = s"""{"_LOAD_ID":"g1","text":"$goodText"}"""
    val lBad = """{"_LOAD_ID":"b1","text":"tiny"}"""
    val lPii =
      s"""{"_LOAD_ID":"p1","text":"$goodText contact bob@mail.example.com tel +1-555-1234"}"""
    val lCtrl = """{"_LOAD_ID":"c1","kind":"control"}"""
    // a media-bearing record: base64 GIF89a payload (7x9 logical screen)
    // rides the envelope; its metadata must be decoded AT landing
    val gifB64 = java.util.Base64.getEncoder.encodeToString(
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte](7, 0, 9, 0, 0xF7.toByte, 0, 0, 0))
    val lMedia =
      s"""{"_LOAD_ID":"m1","text":"$goodText","payload_b64":"$gifB64"}"""
    // an audio-bearing record: 8-bit mono PCM WAV, samples 138/118/108
    // centered at 128 → magnitudes 10/10/20 → sum 40, peak 20 — the q62
    // fold must run AT landing, not just the fmt header walk
    val wavBytes = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
      def w32(v: Long): Unit =
        (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
      out.write("RIFF".getBytes); w32(36L + 4); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16)
      w16(1); w16(1); w32(8000); w32(8000); w16(1); w16(8)
      out.write("data".getBytes); w32(3)
      Seq(138, 118, 108).foreach(out.write); out.write(0) // WORD pad
      out.toByteArray
    }
    val wavB64 = java.util.Base64.getEncoder.encodeToString(wavBytes)
    val lAudio =
      s"""{"_LOAD_ID":"a1","text":"$goodText","payload_b64":"$wavB64"}"""
    // a video-bearing record: 2x2 mono Y4M with 3 frames — the frame
    // count must be PARSED from the stream at landing
    val y4mBytes = ("YUV4MPEG2 W2 H2 F30:1 Ip A1:1 Cmono\n" +
      Seq.fill(3)("FRAME\n" + "0123").mkString)
      .getBytes("ISO-8859-1")
    val y4mB64 = java.util.Base64.getEncoder.encodeToString(y4mBytes)
    val lVideo =
      s"""{"_LOAD_ID":"v1","text":"$goodText","payload_b64":"$y4mB64"}"""
    // url-bearing records: a blocklisted REGISTERED domain (judged from
    // its subdomain host) is rejected at the door; a clean host — with a
    // port, to exercise the extraction — lands
    val lBlocked =
      s"""{"_LOAD_ID":"u1","text":"$goodText","url":"https://cdn.spam-mill.biz/x/1"}"""
    val lOkUrl =
      s"""{"_LOAD_ID":"u2","text":"$goodText","url":"https://news.site.example.com:8443/y"}"""
    val stages = Some(Landing.IngestStages(
      qualityFloor = Some(0.5), scrubPii = true, splitSalt = Some("split|"),
      mediaPath = Some("$.payload_b64"),
      domainBlocklist = Some(("$.url", Seq("spam-mill.biz", "adnet.io")))))

    val baseB = Files.createTempDirectory("graft_stage_b").toString
    Landing.landBatch(
      Seq(lGood, lBad, lPii, lCtrl, lMedia, lAudio, lVideo, lBlocked, lOkUrl)
        .toDF("value"),
      s"$baseB/landing", stages = stages)
    val b = spark.read.parquet(s"$baseB/landing")
    val bRows = b.select("record", "split").collect()
      .map(r => r.getString(0) -> r.getString(1))
    // gate: the low-quality doc is dropped; the text-LESS control line
    // (transport data the gate has no opinion on) lands unchanged
    assert(bRows.length === 7)
    // domain gate: the blocklisted-domain record never landed, the clean
    // url (and every url-LESS record) did
    assert(!bRows.exists(_._1.contains("\"u1\"")), "blocklisted domain landed")
    assert(bRows.exists(_._1.contains("\"u2\"")), "clean-domain record was gated")
    // media: the payload-bearing row decoded its GIF at landing; every
    // payload-less row carries a NULL struct
    val metaOf = b.select(col("record"), col("media_meta")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    val mRow = metaOf.keys.find(_.contains("\"m1\"")).get
    val meta = metaOf(mRow).asInstanceOf[org.apache.spark.sql.Row]
    assert(meta.getAs[String]("format") === "gif")
    assert(meta.getAs[Int]("width") === 7 && meta.getAs[Int]("height") === 9)
    assert(meta.getAs[Long]("n_bytes") === 14L)
    assert(meta.isNullAt(meta.fieldIndex("sample_rate")))
    assert(meta.isNullAt(meta.fieldIndex("peak_abs")),
      "a GIF payload grew PCM stats")
    // the audio row carries fmt parameters AND the decoded sample fold
    val aRow = metaOf.keys.find(_.contains("\"a1\"")).get
    val aMeta = metaOf(aRow).asInstanceOf[org.apache.spark.sql.Row]
    assert(aMeta.getAs[String]("format") === "wav")
    assert(aMeta.getAs[Int]("sample_rate") === 8000)
    assert(aMeta.getAs[Int]("bits") === 8)
    assert(aMeta.getAs[Int]("peak_abs") === 20)
    assert(aMeta.getAs[Long]("sum_abs") === 40L)
    assert(aMeta.isNullAt(aMeta.fieldIndex("min_luma")),
      "a WAV payload grew pixel stats")
    assert(aMeta.isNullAt(aMeta.fieldIndex("n_frames")),
      "a WAV payload grew a frame count")
    // the video row parsed its dims AND frame count from the stream
    val vRow = metaOf.keys.find(_.contains("\"v1\"")).get
    val vMeta = metaOf(vRow).asInstanceOf[org.apache.spark.sql.Row]
    assert(vMeta.getAs[String]("format") === "y4m")
    assert(vMeta.getAs[Int]("width") === 2 && vMeta.getAs[Int]("height") === 2)
    assert(vMeta.getAs[Int]("n_frames") === 3)
    assert(metaOf.filterKeys(k => k != mRow && k != aRow && k != vRow).values
      .forall(_ == null),
      "payload-less record grew a media_meta struct")
    assert(!bRows.exists(_._1.contains("\"b1\"")), "low-quality doc landed")
    assert(bRows.exists(_._1 === lCtrl), "text-less control line was gated")
    // scrub: PII never reaches the lake
    val scrubbed = bRows.map(_._1).find(_.contains("\"p1\"")).get
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("bob@mail.example.com")
      && !scrubbed.contains("+1-555-1234"))
    // split: every landed row carries a deterministic assignment
    assert(bRows.forall(r => Set("train", "val", "test")(r._2)))

    // stream: same lines across TWO deliveries over one checkpoint
    val base = Files.createTempDirectory("graft_stage_s").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    def runOnce(name: String, ls: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$in/$name"), ls.mkString("\n").getBytes)
      val q = Landing.landStreamBounded(spark, in, s"$base/landing",
        s"$base/ckpt", stages = stages)
      q.awaitTermination(60000)
    }
    runOnce("d1.ndjson", Seq(lGood, lBad, lBlocked))
    runOnce("d2.ndjson", Seq(lPii, lCtrl, lMedia, lAudio, lVideo, lOkUrl))
    val s = spark.read.parquet(s"$base/landing")
    val sRows = s.select("record", "split").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(sRows.toSet === bRows.toSet,
      "batch and stream landed different (record, split) sets")
    // media parity: the streamed delivery decoded the SAME struct
    val sMeta = s.select(col("record"), col("media_meta").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bMeta = b.select(col("record"), col("media_meta").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sMeta === bMeta, "batch and stream decoded different media_meta")
  }

  test("content fingerprint is independent of where _LOAD_ID sits in the record") {
    // the same document re-serialized with the transport key first, mid,
    // or LAST must collapse to one landing — a trailing-comma-only strip
    // left '{"a":1,}' for the last-member spelling and the re-send escaped
    // dedup. A literal "_LOAD_ID" inside a string VALUE is content, not
    // transport, and must NOT be stripped.
    val first = """{"_LOAD_ID":"p1","a":1,"b":"x"}"""
    val mid = """{"a":1,"_LOAD_ID":"p2","b":"x"}"""
    val last = """{"a":1,"b":"x","_LOAD_ID":"p3"}"""
    val decoy1 = """{"a":1,"b":"see \"_LOAD_ID\": 9,","_LOAD_ID":"p4"}"""
    val decoy2 = """{"a":1,"b":"see \"_LOAD_ID\": 8,","_LOAD_ID":"p5"}"""
    val base = Files.createTempDirectory("graft_fp_pos").toString
    Landing.landBatch(Seq(first, mid, last, decoy1, decoy2).toDF("value"),
      s"$base/landing", fingerprintDedup = true)
    val landed = spark.read.parquet(s"$base/landing")
      .select("record").collect().map(_.getString(0)).toSet
    // one survivor for the three position spellings, and BOTH decoys: their
    // string values differ, so stripping must not have touched them
    assert(landed.size === 3, s"expected 3 landed records, got $landed")
    assert(landed.count(Set(first, mid, last)) === 1)
    assert(landed.contains(decoy1) && landed.contains(decoy2))
  }

  test("IngestCounters sees every landed row and batch") {
    val counters = new IngestCounters
    spark.streams.addListener(counters)
    try {
      val base = Files.createTempDirectory("graft_counters").toString
      val in = s"$base/in"; new java.io.File(in).mkdirs()
      Files.write(java.nio.file.Paths.get(s"$in/a.ndjson"),
        Seq("""{"_LOAD_ID":"a"}""", """{"_LOAD_ID":"b"}""", """{"_LOAD_ID":"c"}""")
          .mkString("\n").getBytes)
      val q = Landing.landStream(spark, in, s"$base/landing", s"$base/ckpt")
      q.awaitTermination(60000)
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (counters.rows.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(counters.rows.get() === 3)
      assert(counters.batches.get() >= 1)
    } finally spark.streams.removeListener(counters)
  }

  test("Producer: chunking with 500 cap, remainder flush, dry-run skips sink") {
    var sinkCalls = 0
    val totals = Producer.run(spark, Iterator.tabulate(1205)(i => s"""{"id":"W$i"}"""),
      batchSize = 600, sink = df => { sinkCalls += 1; df.count(): Unit })
    assert(totals === Producer.Totals(1205, 0, 3)) // 500+500+205: cap beats batchSize
    assert(sinkCalls === 3)

    var drySinkCalls = 0
    val dry = Producer.run(spark, Iterator.tabulate(7)(i => s"""{"id":"W$i"}"""),
      batchSize = 3, sink = _ => drySinkCalls += 1, dryRun = true)
    assert(dry === Producer.Totals(7, 0, 3)) // 3+3+1 remainder
    assert(drySinkCalls === 0)
  }

  test("Producer: transient sink failure is retried with backoff, zero failed") {
    // Sink fails twice then succeeds (reference firehose_client.py:11-15
    // retries x5): the chunk must land with NO failed records, and the two
    // backoff sleeps (1s then 2s) must be taken between attempts.
    var call = 0
    var slept = List.empty[Long]
    val totals = Producer.run(spark, Iterator.tabulate(4)(i => s"""{"id":"W$i"}"""),
      batchSize = 4,
      sink = _ => { call += 1; if (call <= 2) throw new RuntimeException("boom") },
      sleeper = ms => slept :+= ms)
    assert(totals === Producer.Totals(4, 0, 1))
    assert(call === 3)
    assert(slept === List(1000L, 2000L))
  }

  test("Producer: a permanently failing sink exhausts 5 attempts then moves on") {
    var call = 0
    var slept = List.empty[Long]
    val totals = Producer.run(spark, Iterator.tabulate(6)(i => s"""{"id":"W$i"}"""),
      batchSize = 2,
      sink = df => {
        call += 1
        // chunk 2 (records W2,W3) always fails; others succeed first try
        if (df.as[String](org.apache.spark.sql.Encoders.STRING)
              .head().contains("\"W2\"")) throw new RuntimeException("boom")
      },
      sleeper = ms => slept :+= ms)
    assert(totals === Producer.Totals(4, 2, 3))
    // 1 (chunk1) + 5 exhausted attempts (chunk2) + 1 (chunk3)
    assert(call === 7)
    // four backoffs between the five chunk-2 attempts, none after the last
    assert(slept === List(1000L, 2000L, 4000L, 8000L))
  }

  test("Producer: backoff is exponential from 1s, capped at 20s") {
    assert((1 to 6).map(Producer.backoffMillis) ===
      Seq(1000L, 2000L, 4000L, 8000L, 16000L, 20000L))
  }

  test("incremental dedup at landing: stream stamps q74's verdict, batch ≡ stream") {
    // a history snapshot of the curated lake — three landed documents
    val histText =
      "the quick brown fox jumps over the lazy dog near the river bank today"
    val otherText =
      "completely different content about distributed query engines and shuffles"
    val history = Seq(
      (1L, histText),
      (2L, otherText),
      (3L, "a third historical document with its own words entirely")
    ).toDF("doc_id", "text")
    // the delivery: an exact re-crawl of doc 1 under a fresh id, a novel
    // document, and a text-less control line the stage has no opinion on
    val lRecrawl = s"""{"_LOAD_ID":"r1","text":"$histText"}"""
    val novelText = "nothing in the lake resembles this brand new crawl result"
    val lNovel = s"""{"_LOAD_ID":"n1","text":"$novelText"}"""
    val lCtrl = """{"_LOAD_ID":"c1","kind":"control"}"""
    val stages = Some(Landing.IngestStages(dedupHistory = Some(history)))

    val baseB = Files.createTempDirectory("graft_dedup_b").toString
    Landing.landBatch(Seq(lRecrawl, lNovel, lCtrl).toDF("value"),
      s"$baseB/landing", stages = stages)
    val b = spark.read.parquet(s"$baseB/landing")
    val bv = b.select(col("record"), col("dup_verdict")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[org.apache.spark.sql.Row])).toMap
    assert(bv.size === 3)
    val recrawl = bv.keys.find(_.contains("\"r1\"")).map(bv).get.get
    // an exact re-crawl is both an exact and (identical bands) a near dup,
    // sourced to history doc 1
    assert(recrawl.getAs[Int]("exact_dup") === 1)
    assert(recrawl.getAs[Int]("near_dup") === 1)
    assert(recrawl.getAs[Int]("keep") === 0)
    assert(recrawl.getAs[Long]("exact_src") === 1L)
    assert(recrawl.getAs[Long]("near_src") === 1L)
    val novel = bv.keys.find(_.contains("\"n1\"")).map(bv).get.get
    assert(novel.getAs[Int]("exact_dup") === 0 &&
      novel.getAs[Int]("near_dup") === 0 && novel.getAs[Int]("keep") === 1)
    assert(bv.keys.find(_.contains("\"c1\"")).map(bv).get === None,
      "text-less control line grew a dup verdict")
    // the stamped verdicts ARE q74's: the same frames through
    // incrementalDedupOn directly must produce the same classification
    val direct = graft.operators.Dedup.incrementalDedupOn(
      Seq(("r1", histText), ("n1", novelText)).toDF("doc_id", "text"), history)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(direct("r1") === ((1, 1, 0)) && direct("n1") === ((0, 0, 1)))

    // stream: the same delivery through landStreamBounded's foreachBatch
    val base = Files.createTempDirectory("graft_dedup_s").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$in/d1.ndjson"),
      Seq(lRecrawl, lNovel, lCtrl).mkString("\n").getBytes)
    val q = Landing.landStreamBounded(spark, in, s"$base/landing",
      s"$base/ckpt", stages = stages)
    q.awaitTermination(60000)
    val s = spark.read.parquet(s"$base/landing")
    val sv = s.select(col("record"), col("dup_verdict").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bvs = b.select(col("record"), col("dup_verdict").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sv === bvs, "batch and stream stamped different dup verdicts")
  }

  test("frontier at landing: canonical seen-set verdict, batch ≡ stream") {
    // the seen-set snapshot a crawler's frontier store materializes —
    // CANONICAL urls (what q91/q94 publish)
    val seen = Seq("https://site1.example.com/a/1", "https://other.example.net/x")
      .toDF("seen_url")
    // a re-discovery under a MESSY spelling (case + default port +
    // trailing slash + tracking param) — only canonicalization at the
    // landing edge can recognize it as already fetched
    val lDup =
      """{"_LOAD_ID":"d1","url":"HTTPS://Site1.Example.Com:443/a/1/?utm_source=f"}"""
    val lNew = """{"_LOAD_ID":"n1","url":"https://site2.example.com/b/9"}"""
    val lCtrl = """{"_LOAD_ID":"c1","kind":"control"}"""
    val stages = Some(Landing.IngestStages(frontierSeen = Some(("$.url", seen))))

    val baseB = Files.createTempDirectory("graft_frontier_b").toString
    Landing.landBatch(Seq(lDup, lNew, lCtrl).toDF("value"),
      s"$baseB/landing", stages = stages)
    val b = spark.read.parquet(s"$baseB/landing")
    val bv = b.select(col("record"), col("frontier_verdict")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[org.apache.spark.sql.Row])).toMap
    val dup = bv.keys.find(_.contains("\"d1\"")).map(bv).get.get
    assert(dup.getAs[String]("canonical_url") === "https://site1.example.com/a/1")
    assert(dup.getAs[Int]("already_fetched") === 1)
    val novel = bv.keys.find(_.contains("\"n1\"")).map(bv).get.get
    assert(novel.getAs[Int]("already_fetched") === 0)
    assert(bv.keys.find(_.contains("\"c1\"")).map(bv).get === None,
      "url-less control line grew a frontier verdict")

    // the same delivery through the streaming path stamps identically
    val base = Files.createTempDirectory("graft_frontier_s").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$in/d1.ndjson"),
      Seq(lDup, lNew, lCtrl).mkString("\n").getBytes)
    val q = Landing.landStreamBounded(spark, in, s"$base/landing",
      s"$base/ckpt", stages = stages)
    q.awaitTermination(60000)
    val sv = spark.read.parquet(s"$base/landing")
      .select(col("record"), col("frontier_verdict").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bvs = b.select(col("record"), col("frontier_verdict").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sv === bvs, "batch and stream stamped different frontier verdicts")
  }
}
