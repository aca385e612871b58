package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ingestion driver loop (reference ingestion/producer.py:75-116):
  * pull records from a cursor source, parse→flatten→enrich→serialize in
  * chunks, hand each chunk to a sink, keep running totals.
  *
  *  - `batchSize` forms micro-batches; the hard `MaxPut` cap mirrors the
  *    reference's 500-record PutRecordBatch limit (producer.py:66-69)
  *  - a failing sink call counts the whole chunk failed and continues
  *    (at-least-once; the DLQ/retry story lives in the sink)
  *  - `dryRun` counts without invoking the sink
  *    (tests/unit/test_producer_unit.py:41-63)
  */
object Producer {
  val MaxPut = 500

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
      dryRun: Boolean = false): Totals = {
    import spark.implicits._
    var t = Totals(0, 0, 0)
    records.grouped(math.min(batchSize, MaxPut)).foreach { chunk =>
      t = t.copy(batches = t.batches + 1)
      if (dryRun) t = t.copy(sent = t.sent + chunk.size)
      else
        try {
          val wired = Envelope.wire(Envelope.toEnvelope(
            Envelope.parseWorks(chunk.toDF("value"), "value"),
            source, current_timestamp(), current_timestamp()))
          sink(wired)
          t = t.copy(sent = t.sent + chunk.size)
        } catch {
          case _: Throwable => t = t.copy(failed = t.failed + chunk.size)
        }
    }
    t
  }
}
