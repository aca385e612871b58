package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PdfOps, PdfSynthEval}
import graft.functions.TextOps.words

/** Q125: PDF TEXT extraction — the document-format intake rung (q82
  * WARC, q115 chunked, q116 full-stack are the TRANSPORT rungs; this is
  * the payload format a paper/report corpus actually arrives in —
  * scholar-stream itself ingests arXiv metadata only, reference
  * ingestion/openalex_client.py, and extracting the papers' text is the
  * north-star a training corpus needs).
  *
  * Payloads are synthesized PDFs (`graft_pdf_synth`) whose page text is
  * the document's OWN words wrapped 8 per line, 5 lines per page, and
  * `graft_pdf_text` walks them back through the REAL pipeline — object
  * scan, document graph (/Pages → /Kids order → /Contents references),
  * /Length verification, FlateDecode inflate, BT/ET text operators,
  * literal/hex string unescaping — to the exact text the oracle
  * re-synthesizes from the corpus words alone (it never builds a PDF
  * byte). `graft_pdf_pages` reads the verified /Kids arity in an
  * INDEPENDENT meta walk (the q59/q118 meta-vs-payload discipline).
  *
  * Residue classes (%7): 0 → literal strings + Td lines, FlateDecode;
  * 1 → HEX strings with `'` (newline+show) lines; 2 → TJ arrays (each
  * line split mid-string around a kern number — a decoder inferring
  * spaces from kerning fails the md5), RAW stream; 3 → literals plus
  * the escape-drill line (parens, backslash, raw CR); 4 → file cut 20
  * bytes short (no %%EOF — both walks refuse); 5 → not a PDF; 6 → a
  * /Type0 COMPOSITE font — 2-byte show codes through a
  * Flate-compressed /ToUnicode CMap (bfchar + a bfrange spanning a
  * surrogate pair), the spelling real scholarly PDFs ship — the
  * reference's own domain ([[graft.functions.PdfEval]]).
  * One narrow map, each kernel once per row, zero exchanges — pinned.
  */
object Pdf {

  def q125PdfExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 7 === 1, 1).when(id % 7 === 2, 2)
      .when(id % 7 === 3, 3).when(id % 7 === 6, 4).otherwise(0)
    val whole = PdfOps.pdfSynth(words(coalesce(col("text"), lit(""))), mode)
    val payload = when(id % 7 === 5, col("text").cast("binary"))
      .when(id % 7 === 4, expr("substring(_w, 1, length(_w) - 20)"))
      .otherwise(col("_w"))
    docs.select(id, col("text"), whole.as("_w"))
      .select(id, payload.as("_p"))
      .withColumn("_t", PdfOps.pdfText(col("_p")))
      .withColumn("_pg", PdfOps.pdfPages(col("_p")))
      .select(id,
        col("_t").isNotNull.cast("int").as("ok"),
        col("_pg").as("n_pages"),
        length(col("_t")).cast("long").as("n_chars"),
        md5(col("_t").cast("binary")).as("text_md5"))
  }

  /** The escape-drill line, exposed so the spec can assert against the
    * exact constant the oracle spells in chr() codepoints.
    */
  val EscLine: String = PdfSynthEval.EscLine
}
