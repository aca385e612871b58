package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{ZstdBlockOps, ZstdOps}

/** Q165: zstd frame triage — the compression layer Common Crawl
  * moved to (`.warc.zst` replaced `.warc.gz` as the primary crawl
  * distribution): before paying decompression, an intake pipeline
  * reads each container's FRAME grammar — frame count, skippable
  * (seek-table) frames, declared content size, window budget,
  * dictionary id, checksum presence, tail integrity — so it can
  * route, size, and schedule the real decode
  * ([[graft.functions.ZstdEval]]; block-content decode is out of
  * stated scope, the q130 header-math stance).
  *
  * Residue classes (%5): 0 → one single-segment frame (no window
  * descriptor — reading one anyway shifts every later field), 1-byte
  * FCS, checksum; 1 → a SKIPPABLE frame then a windowed frame with
  * the 2-byte FCS (+256 offset drill: content > 256 by
  * construction), a 2-byte dictionary id and an RLE block whose
  * stream content is ONE byte (a walker advancing by the declared
  * size overruns); 2 → two frames, the second with a 4-byte FCS;
  * 3 → class 0 cut 5 bytes short (zero frames serve,
  * `truncated = 1`); 4 → plain text (not zstd). Oracle replays
  * every field from corpus words + doc_id alone. One narrow map,
  * zero exchanges.
  */
object Zstd {

  def q165ZstdTriage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = ZstdOps.zstdSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, ZstdOps.zstdMeta(col("_p")).as("_m"),
        ZstdOps.zstdContentSize(col("_p")).as("content_size"),
        ZstdOps.zstdDictId(col("_p")).as("dict_id"))
      .select(id,
        when(col("_m") === -1L, 0).otherwise(1).as("is_zstd"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)))
          .cast("int").as("n_frames"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 24).bitwiseAND(lit(0xFFL)))
          .cast("int").as("n_skippable"),
        col("content_size"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 40).bitwiseAND(lit(0xFL)))
          .cast("int").as("has_checksum"),
        when(col("_m") === -1L, lit(null))
          .when(shiftright(col("_m"), 16).bitwiseAND(lit(0xFFL)) === 0,
            lit(null))
          .otherwise(shiftright(col("_m"), 16).bitwiseAND(lit(0xFFL)) - 1)
          .cast("int").as("window_log"),
        col("dict_id"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 44).bitwiseAND(lit(0xFL)))
          .cast("int").as("truncated"))
  }

  /** Q188: zstd BLOCK decode — the rung q165 stopped at, now walked to
    * the bottom: FSE table descriptions, Huffman literals (direct and
    * FSE-compressed weights, 1- and 4-stream), sequences over the
    * predefined tables, the three-slot repeat-offset history, overlap
    * match copies, Treeless cross-block table reuse, and a VERIFIED
    * XXH64 content checksum ([[graft.functions.ZstdBlockEval]] —
    * interop-proven both directions against zstd CLI v1.5.7 in
    * ZstdDecodeSpec). Content round-trips to md5 (q95's stance).
    *
    * Residue classes (%7): 0 → one Huffman-literal block; 1 →
    * sequences with a real match (content doubles); 2 → 4-stream
    * literals (content quadruples); 3 → repeat-offset drill (rep1
    * reuse + an offset-1 overlap run); 4 → mixed raw/RLE/compressed
    * blocks; 5 → a TREELESS second block reusing block 1's table
    * (content + its reverse); 6 → plain text (not zstd). Oracle
    * replays every content string from words + doc_id arithmetic and
    * closes md5 itself. One narrow map, zero exchanges.
    */
  def q188ZstdDecode(spark: SparkSession, dir: String): DataFrame =
    q188ZstdDecodeOn(Tables.loadSpread(spark, dir, "documents"))

  /** [[q188ZstdDecode]] over an explicit corpus (the ScaleSpec decade hook). */
  def q188ZstdDecodeOn(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val mode = when(id % 7 === 1, 1L).when(id % 7 === 2, 2L)
      .when(id % 7 === 3, 3L).when(id % 7 === 4, 4L)
      .when(id % 7 === 5, 5L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = ZstdBlockOps.zstdDeepSynth(col("text"), params)
    val payload = when(id % 7 === 6, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, ZstdBlockOps.zstdDecodeMeta(col("_p")).as("_m"),
        ZstdBlockOps.zstdDecode(col("_p")).as("_c"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_zstd"),
        shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)).cast("int")
          .as("n_frames"),
        shiftright(col("_m"), 44).bitwiseAND(lit(0xFL)).cast("int")
          .as("truncated"),
        (shiftright(col("_m"), 40).bitwiseAND(lit(0xFL)) - 1).cast("int")
          .as("checksum_ok"),
        length(col("_c")).cast("bigint").as("content_len"),
        md5(col("_c")).as("content_md5"))
  }
}
