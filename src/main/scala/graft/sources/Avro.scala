package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.AvroOps

/** Q164: Avro Object Container File ingest — the OTHER lake
  * interchange format beside Parquet (Kafka pipelines and warehouse
  * exports hand corpora over as `.avro`), and the row-oriented rung
  * of the source family: zigzag-varint framing end to end, a
  * metadata map with TWO legal spellings (positive count, or the
  * negative-count sized form real writers emit for skippability),
  * raw-deflate block codec, per-block sync-marker verification
  * against the header's marker, and schema-VERIFIED record decode of
  * the stated corpus shape `{id: long, delta: long, text: string,
  * tag: [null, string]}` ([[graft.functions.AvroEval]]).
  *
  * Residue classes (%5): 0 → null codec, one 3-record block,
  * positive-count metadata; 1 → deflate codec, TWO blocks, the
  * negative-count SIZED metadata form with an extra ignored key;
  * 2 → block 2's sync marker corrupted (block 1 serves,
  * `truncated = 1` — a spliced stream's tail is untrustworthy);
  * 3 → deflate, cut 6 bytes into block 2's trailing sync (block 1
  * serves, truncated); 4 → plain text (not Avro). The `delta` field
  * is negative BY CONSTRUCTION — a plain-varint (non-zigzag) reader
  * decodes it astronomically wrong and the sum catches it. Oracle
  * replays counts, sums, and the first text's md5 from corpus words
  * + doc_id alone. One narrow map, zero exchanges.
  */
object Avro {

  def q164AvroIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = AvroOps.avroSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, AvroOps.avroMeta(col("_p")).as("_m"),
        AvroOps.avroSumIds(col("_p")).as("sum_ids"),
        AvroOps.avroSumDelta(col("_p")).as("sum_delta"),
        md5(AvroOps.avroFirst(col("_p"))).as("first_md5"))
      .select(id,
        when(col("_m") === -1L, 0).otherwise(1).as("is_avro"),
        when(col("_m") === -1L, lit(null).cast("string"))
          .when(shiftright(col("_m"), 32).bitwiseAND(lit(0xFL)) === 1, "null")
          .when(shiftright(col("_m"), 32).bitwiseAND(lit(0xFL)) === 2, "deflate")
          .otherwise("other").as("codec"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 24).bitwiseAND(lit(0xFFL)))
          .cast("int").as("n_blocks"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 12).bitwiseAND(lit(0xFFFL)) - 1)
          .cast("int").as("n_records"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 36).bitwiseAND(lit(0xFL)))
          .cast("int").as("truncated"),
        col("sum_ids"), col("sum_delta"), col("first_md5"))
  }
}
