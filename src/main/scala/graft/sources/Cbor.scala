package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CborOps

/** Q175: CBOR decode (RFC 8949) — the binary interchange format
  * metadata sidecars and API dumps arrive in, the schemaless sibling
  * of q161's protobuf: typed heads with 1/2/4/8-byte BIG-endian
  * arguments, negative integers as `-1 - n`, INDEFINITE-length
  * strings/arrays/maps terminated by the `0xFF` break (streaming
  * encoders chunk text — a definite-only reader dies), transparent
  * tag wrappers, last-wins duplicate map keys, and whole-item
  * refusal on truncation or trailing bytes (CBOR has no resync
  * point) — all in [[graft.functions.CborEval]]'s stated-shape walk
  * (`id`/`delta`/`text`/`tags`; unknown keys of any type skip by
  * the grammar).
  *
  * Residue classes (%5): 0 → definite map + an unknown simple;
  * 1 → the INDEFINITE drill (indefinite map, two-chunk text,
  * indefinite tags array, a nested-map unknown); 2 → duplicate
  * `text` key (the decoy must LOSE), an 8-byte id argument
  * (> 2^33), tag 0 wrapping the real text; 3 → cut 4 bytes short
  * (refuses whole); 4 → plain text (ASCII lead byte is never a map
  * head). Oracle replays every field from corpus words + doc_id
  * arithmetic. One narrow map, zero exchanges.
  */
object Cbor {

  def q175CborDecode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = CborOps.cborSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        CborOps.cborId(col("_p")).as("id_val"),
        CborOps.cborDelta(col("_p")).as("delta_val"),
        CborOps.cborTags(col("_p")).as("_t"),
        md5(CborOps.cborText(col("_p"))).as("text_md5"))
      .select(id,
        col("id_val").isNotNull.cast("int").as("ok"),
        col("id_val"), col("delta_val"),
        (shiftright(col("_t"), 48) - 1).cast("int").as("n_tags"),
        (col("_t").bitwiseAND(lit((1L << 48) - 1)) - 1).as("sum_tags"),
        col("text_md5"))
  }
}
