package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-shot decomposition of the bench's streaming-SLO number (r18
  * verdict task #10: "pin environment vs per-batch work"): run the exact
  * producer → landStream path the bench times, with a progress listener
  * splitting the landed latency into
  *
  *   - stream STARTUP: start() returning → first batch's triggerExecution
  *     begins (source discovery, offset log, first plan);
  *   - per-BATCH work: triggerExecution/addBatch durations per batch,
  *     with row counts.
  *
  * The SLO is `landed_ts − event_ts`; with Trigger.AvailableNow() over a
  * pre-written 500-event drop the whole corpus lands in ~1 batch, so
  * p50 == p95 and the number is dominated by whatever this tool shows as
  * startup + the single batch — not by per-event throughput.
  *
  * Usage: runMain graft.tools.SloProbe
  */
object SloProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("slo_probe").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    var put = 0
    val tProduce0 = System.nanoTime()
    graft.ingest.Producer.run(spark,
      Iterator.tabulate(500)(i => s"""{"id":"W$i","title":"T$i"}"""),
      batchSize = 100,
      sink = df => {
        put += 1
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$in/put$put.ndjson"),
          df.as[String].collect().mkString("\n").getBytes("UTF-8"))
      })
    val produceMs = (System.nanoTime() - tProduce0) / 1e6

    val batches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)] // (batchId, rows, triggerMs, addBatchMs)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        batches += ((p.batchId, p.numInputRows,
          Option(d.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
          Option(d.get("addBatch")).map(_.toLong).getOrElse(-1L)))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val tStart0 = System.nanoTime()
    val q = graft.streaming.Landing.landStream(
      spark, in, s"$base/landing", s"$base/ckpt")
    val startRetMs = (System.nanoTime() - tStart0) / 1e6
    q.awaitTermination(120000)
    val totalMs = (System.nanoTime() - tStart0) / 1e6

    graft.Bootstrap.initLanding(spark, s"$base/landing")
    val ms = spark.sql(
      """SELECT approx_percentile(lat_ms, 0.5), approx_percentile(lat_ms, 0.95)
        |FROM (SELECT unix_millis(landed_ts) - unix_millis(event_ts) AS lat_ms
        |      FROM vw_works WHERE event_ts IS NOT NULL)""".stripMargin).head()

    System.err.println(f"[slo] produce 500 events: $produceMs%.0f ms")
    System.err.println(f"[slo] start() returned after $startRetMs%.0f ms; " +
      f"start->terminated $totalMs%.0f ms")
    batches.foreach { case (id, rows, trig, add) =>
      System.err.println(s"[slo] batch $id: $rows rows, " +
        s"triggerExecution ${trig} ms (addBatch ${add} ms)")
    }
    val batchMs = batches.map(_._3).filter(_ >= 0).sum
    System.err.println(f"[slo] decomposition: startup+discovery " +
      f"${totalMs - batchMs}%.0f ms, batch work $batchMs ms " +
      f"over ${batches.size} batch(es)")
    System.err.println(s"[slo] landed p50_ms=${ms.get(0)} p95_ms=${ms.get(1)}")
    spark.stop()
  }
}
