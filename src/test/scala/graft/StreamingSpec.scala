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

  test("tumbling 1h window: streaming over the same events == batch q14") {
    // file-source streaming needs an explicit schema; with nanosAsLong the
    // raw parquet column is int64 nanos, converted exactly like Tables.load
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file source wants a directory, not a single file
    val streamDir = Files.createTempDirectory("graft_win").toString
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = spark.readStream.schema(rawSchema)
      .parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  test("Producer: a throwing sink fails that chunk only and keeps totals") {
    var call = 0
    val totals = Producer.run(spark, Iterator.tabulate(6)(i => s"""{"id":"W$i"}"""),
      batchSize = 2,
      sink = df => { call += 1; if (call == 2) throw new RuntimeException("boom"); df.count(): Unit })
    assert(totals === Producer.Totals(4, 2, 3))
  }
}
