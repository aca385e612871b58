package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.EpubOps

/** Q142: EPUB text extraction — the third document-format rung
  * (PDF q125, DOCX q133): public-domain book corpora ship as EPUB,
  * and reading order is an OCF/OPF GRAPH walk — container.xml names
  * the OPF, the SPINE orders chapter idrefs through the manifest's
  * id→href map, hrefs resolve against the OPF's directory — never a
  * zip-order scrape (the archive deliberately stores chapters in the
  * OPPOSITE order and scrambles the manifest).
  *
  * Residue classes (%5): 0 → stored members; 1 → deflated members
  * behind q132's lying local headers; 2 → wrong `mimetype` content
  * (a renamed zip is not an EPUB — refuses); 3 → the spine
  * references an id the manifest lacks (broken package — refuses);
  * 4 → not a zip. Oracle re-synthesizes title, chapter/paragraph
  * accounting, and the spine-ordered text from corpus words alone.
  * One narrow map, zero exchanges.
  */
object Epub {

  def q142EpubExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = EpubOps.epubSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        EpubOps.epubTitle(col("_p")).as("title"),
        EpubOps.epubChapters(col("_p")).as("n_chapters"),
        EpubOps.epubParagraphs(col("_p")).as("n_paragraphs"),
        EpubOps.epubText(col("_p")).as("_t"))
      .select(id,
        col("n_chapters").isNotNull.cast("int").as("ok"),
        col("title"),
        col("n_chapters"),
        col("n_paragraphs"),
        md5(col("_t")).as("text_md5"),
        length(col("_t")).cast("long").as("n_chars"))
  }
}
