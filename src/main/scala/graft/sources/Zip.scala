package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ZipOps

/** Q132: ZIP archive ingest — the corpus-drop container rung of the
  * source family (q76 JSONL, q82 WARC, q125 PDF): bulk document
  * collections arrive zipped, and the reader must be driven by the
  * CENTRAL directory because local headers lie by construction here
  * (flag bit 3 with zeroed sizes/CRC, plus a local-only padding extra
  * field that shifts the data start — see [[graft.functions.ZipEval]]).
  *
  * Each payload packs the document's own bytes three ways — STORED,
  * DEFLATED (the text twice around a newline), and a deflated ASCII
  * accounting line — so the oracle replays every member's md5 from the
  * corpus text alone (q95's round-trip stance: compressed bytes are
  * zlib-specific, recovered CONTENT is not). Residue classes (%8):
  * 2 → EOCD comment appended (the backward locator scan is exercised);
  * 3 → member 1's central CRC corrupted (that member must refuse NULL
  * while its siblings read — per-member verification, not per-archive);
  * 6 → tail truncated (EOCD gone: the whole archive refuses);
  * 7 → not an archive. One narrow map, zero exchanges — pinned.
  */
object Zip {

  def q132ZipExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 8 === 2, 1L).when(id % 8 === 3, 2L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = ZipOps.zipSynth(col("text"), params)
    val payload = when(id % 8 === 7, col("text").cast("binary"))
      .when(id % 8 === 6, expr("substring(_w, 1, length(_w) - 30)"))
      .otherwise(col("_w"))
    docs.select(id, col("text"), whole.as("_w"))
      .select(id, payload.as("_p"))
      .select(id,
        ZipOps.zipCount(col("_p")).as("_n"),
        ZipOps.zipMemberName(col("_p"), lit(0)).as("fname0"),
        ZipOps.zipMember(col("_p"), lit(0)).as("_m0"),
        ZipOps.zipMember(col("_p"), lit(1)).as("_m1"),
        ZipOps.zipMember(col("_p"), lit(2)).as("_m2"),
        ZipOps.zipTotalBytes(col("_p")).as("n_bytes"))
      .select(id,
        col("_n").isNotNull.cast("int").as("valid"),
        col("_n").as("n_members"),
        col("fname0"),
        md5(col("_m0")).as("md5_stored"),
        md5(col("_m1")).as("md5_pair"),
        md5(col("_m2")).as("md5_meta"),
        col("n_bytes"))
  }
}
