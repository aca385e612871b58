package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ingestion driver loop (reference ingestion/producer.py:75-116):
  * pull records from a cursor source, parse→flatten→enrich→serialize in
  * chunks, hand each chunk to a sink, keep running totals.
  *
  *  - `batchSize` forms micro-batches; the hard `MaxPut` cap mirrors the
  *    reference's 500-record PutRecordBatch limit (producer.py:66-69)
  *  - a failing sink call is retried up to `MaxAttempts` total tries with
  *    exponential backoff (the reference's boto client retries ×5 in
  *    "standard" mode, firehose_client.py:11-15); only after the last
  *    attempt is the whole chunk counted failed, and the loop continues
  *    (at-least-once; the DLQ story lives in the sink)
  *  - `dryRun` counts without invoking the sink
  *    (tests/unit/test_producer_unit.py:41-63)
  *
  * Scale note: this loop is the FIDELITY path — it mirrors the reference's
  * single-threaded producer, routing records through the driver one chunk
  * at a time, and is right for tests and low-volume live pulls. The SCALE
  * path is `sources.CursorPagedSource` + `streaming.Landing.landStream`,
  * where fetching is offset-tracked, delivery is checkpointed, and the
  * landing write is distributed.
  */
object Producer {
  val MaxPut = 500

  /** Total tries per chunk, matching the reference's retries=5. */
  val MaxAttempts = 5

  /** Backoff before retry `attempt` (1-based count of failures so far):
    * 1s, 2s, 4s, 8s — exponential from 1s, capped at 20s like boto's
    * standard retry mode.
    */
  def backoffMillis(attempt: Int): Long =
    math.min(1000L << (attempt - 1), 20000L)

  final case class Totals(sent: Long, failed: Long, batches: Long)

  /** Config-driven entry point: batch size and source tag come from the
    * validated settings object.
    */
  def run(spark: SparkSession, records: Iterator[String], cfg: IngestConfig,
          sink: DataFrame => Unit): Totals =
    run(spark, records, cfg.batchSize, sink, cfg.source)

  def run(
      spark: SparkSession,
      records: Iterator[String],
      batchSize: Int,
      sink: DataFrame => Unit,
      source: String = "openalex",
      dryRun: Boolean = false,
      sleeper: Long => Unit = ms => Thread.sleep(ms)): Totals = {
    import spark.implicits._
    var t = Totals(0, 0, 0)
    records.grouped(math.min(batchSize, MaxPut)).foreach { chunk =>
      t = t.copy(batches = t.batches + 1)
      if (dryRun) t = t.copy(sent = t.sent + chunk.size)
      else {
        var delivered = false
        try {
          val wired = Envelope.wire(Envelope.toEnvelope(
            Envelope.parseWorks(chunk.toDF("value"), "value"),
            source, current_timestamp(), current_timestamp()))
          var attempt = 0
          while (!delivered && attempt < MaxAttempts) {
            attempt += 1
            try {
              sink(wired)
              delivered = true
            } catch {
              case _: Throwable if attempt < MaxAttempts =>
                sleeper(backoffMillis(attempt))
              case _: Throwable => // final attempt: fall through to failed
            }
          }
        } catch {
          case _: Throwable => // plan construction failed: chunk unfixable
        }
        t =
          if (delivered) t.copy(sent = t.sent + chunk.size)
          else t.copy(failed = t.failed + chunk.size)
      }
    }
    t
  }
}
