package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MarkdownOps

/** Q140: markdown structure extraction — README/docs corpora from code
  * hosting, where the training-text read must EXCLUDE fenced code
  * from prose (it is counted separately for the code-mixture budget)
  * while stripping headings, emphasis, links, lists, and quotes down
  * to their text ([[graft.functions.MarkdownEval]]).
  *
  * Residue classes (%5): 0 → backtick fence + plain decorations;
  * 1 → SAME prose under different markup (image line, bold-inside-
  * link) — the markup-invariance drill: its plain text must equal
  * class 0's shape; 2 → closing-sequence heading, a `#hashtag` prose
  * trap, tilde fence; 3 → fence never closed (runs to EOF, content
  * still excluded, block still counted); 4 → plain text, no markup.
  * Oracle re-synthesizes expected prose from corpus words alone.
  * One narrow map, zero exchanges.
  */
object Markdown {

  def q140MarkdownExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = MarkdownOps.mdSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        MarkdownOps.mdHeadings(col("_p")).as("n_headings"),
        MarkdownOps.mdCodeBlocks(col("_p")).as("n_code_blocks"),
        MarkdownOps.mdLang(col("_p")).as("lang"),
        MarkdownOps.mdLinks(col("_p")).as("n_links"),
        MarkdownOps.mdText(col("_p")).as("_t"))
      .select(id,
        col("n_headings"),
        col("n_code_blocks"),
        col("lang"),
        col("n_links"),
        md5(col("_t")).as("text_md5"),
        length(col("_t")).cast("long").as("n_chars"))
  }
}
