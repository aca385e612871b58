package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.RtfOps

/** Q155: RTF text extraction — the legacy office rung completing the
  * document family (q125 PDF, q133 DOCX, q142 EPUB, q144 LaTeX):
  * control-word delimiter-space consumption, cp1252 hex escapes,
  * `\uN?` fallback consumption, and wholesale destination-group
  * drops ([[graft.functions.RtfEval]]).
  *
  * Residue classes (%5): classes 0-3 spell the SAME prose through
  * different markup — `{\b}` group / `{\i}` + `\tab` + an inline
  * `\fs24` / UPPERCASE hex + a negative-parameter word / starred +
  * info destination decoys whose text must never leak — the
  * markup-invariance drill across four spellings; 4 → plain text
  * (not RTF, refuses). Oracle re-synthesizes the prose from corpus
  * words and chr() codepoints alone. One narrow map, zero exchanges.
  */
object Rtf {

  def q155RtfExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = RtfOps.rtfSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        RtfOps.rtfPars(col("_p")).as("n_pars"),
        RtfOps.rtfText(col("_p")).as("_t"))
      .select(id,
        col("_t").isNotNull.cast("int").as("ok"),
        col("n_pars"),
        md5(col("_t")).as("text_md5"),
        // char count, not bytes: the accented line makes them differ
        length(col("_t").cast("string")).cast("long").as("n_chars"))
  }
}
