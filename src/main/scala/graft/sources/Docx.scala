package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DocxOps
import graft.functions.TextOps.words

/** Q133: DOCX text extraction — the office-document rung completing
  * the format family q125's PDF started (q132 opens the container;
  * this one reads the document inside it). Each payload is a real ZIP
  * package whose `word/document.xml` carries the document's own words
  * as OOXML paragraphs — runs split mid-paragraph with significant
  * whitespace behind `xml:space="preserve"`, `w:rPr`/`w:proofErr`
  * noise between runs, and per-class drills: an XML-entity paragraph
  * (%5==1), a field-code `w:instrText` decoy that must contribute
  * nothing (%5==2), an in-paragraph `<w:br/>` (%5==3), and a truncated
  * package that must refuse whole (%5==4). The oracle re-synthesizes
  * the expected text from corpus words alone — it never builds an XML
  * byte. One narrow map, zero exchanges — pinned.
  */
object Docx {

  def q133DocxExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 4, lit(0L)).otherwise(id % 5)
    val whole = DocxOps.docxSynth(words(coalesce(col("text"), lit(""))), mode)
    val payload = when(id % 5 === 4,
      expr("substring(_w, 1, length(_w) - 30)")).otherwise(col("_w"))
    docs.select(id, col("text"), whole.as("_w"))
      .select(id, payload.as("_p"))
      .withColumn("_t", DocxOps.docxText(col("_p")))
      .withColumn("_np", DocxOps.docxParas(col("_p")))
      .select(id,
        col("_t").isNotNull.cast("int").as("ok"),
        col("_np").as("n_paragraphs"),
        length(col("_t")).cast("long").as("n_chars"),
        md5(col("_t").cast("binary")).as("text_md5"))
  }
}
