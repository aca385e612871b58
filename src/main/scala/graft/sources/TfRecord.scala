package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TfRecordOps

/** Q160: TFRecord shard ingest — the training-loader container the
  * corpus build EMITS (q80 assigns shard positions; the bytes a
  * tf.data pipeline then streams are this framing), and the first
  * source in the family with NO magic bytes: detection IS the first
  * record's masked-CRC32C length check. The refusal split falls out
  * of the framing — a failed length CRC leaves nothing trustworthy
  * to advance by (whole refusal / `truncated`), a failed data CRC
  * refuses only that record while the verified length walks on to
  * its siblings ([[graft.functions.TfRecordEval]]).
  *
  * Residue classes (%5): 0 → three word-payload records; 1 → an
  * EMPTY record (legal — the data CRC of the empty span; its md5 is
  * the first served payload) + a >255-byte record (the u64le
  * length's second byte is significant — a big-endian reader walks
  * out of bounds) + a word record; 2 → record 1's DATA crc corrupted
  * (framed and counted, not served, bytes excluded from accounting);
  * 3 → cut 6 bytes short (the last record refuses, earlier ones
  * serve, `truncated = 1`); 4 → plain text (the first length CRC
  * fails: `valid = 0`, every field NULL). Oracle replays counts,
  * byte accounting, and payload md5s from corpus words + doc_id
  * alone — never from a framed byte. One narrow map, zero exchanges.
  */
object TfRecord {

  def q160TfrecordIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = TfRecordOps.tfrSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        TfRecordOps.tfrValid(col("_p")).as("valid"),
        TfRecordOps.tfrRecords(col("_p")).as("n_records"),
        TfRecordOps.tfrValidRecords(col("_p")).as("n_valid"),
        TfRecordOps.tfrTotalBytes(col("_p")).as("total_bytes"),
        TfRecordOps.tfrTruncated(col("_p")).as("truncated"),
        md5(TfRecordOps.tfrFirst(col("_p"))).as("first_md5"))
  }
}
