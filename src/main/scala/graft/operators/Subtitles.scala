package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SubtitleOps

/** Q138: subtitle extraction (SRT/WebVTT) — the video-speech TEXT side
  * of a multimodal training pair. Each payload is a synthesized cue
  * file carrying the document's words at 6 words/cue, 2.5 s cadence,
  * 2 s cue duration; the manifest reports format, valid-cue count,
  * duration accounting, the last cue's ABSOLUTE end (pins the
  * H/M/S/ms place-value arithmetic), and the joined cue text.
  *
  * Residue classes (%5): 0 → SRT with an hour-crossing base offset on
  * odd ids; 1 → WebVTT with BOM/CRLF/NOTE/cue-ids/settings and
  * two-line cue text; 2 → SRT with cue #2's timing corrupted (that
  * cue refuses, siblings parse — per-cue stance); 3 → timing lines
  * without any header or counter (structural refusal); 4 → not a
  * subtitle file. Oracle replays cue grouping, duration and
  * place-value arithmetic, and the joined text from corpus words
  * alone. One narrow map, zero exchanges.
  */
object Subtitles {

  def q138SubtitleExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = SubtitleOps.subSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        SubtitleOps.subFormat(col("_p")).as("format"),
        SubtitleOps.subCueCount(col("_p")).as("n_cues"),
        SubtitleOps.subTotalMs(col("_p")).as("total_ms"),
        SubtitleOps.subLastEndMs(col("_p")).as("last_end_ms"),
        SubtitleOps.subText(col("_p")).as("_t"))
      .select(id,
        col("format").isNotNull.cast("int").as("ok"),
        col("format"),
        col("n_cues"),
        col("total_ms"),
        col("last_end_ms"),
        md5(col("_t")).as("text_md5"),
        length(col("_t")).cast("long").as("n_chars"))
  }
}
