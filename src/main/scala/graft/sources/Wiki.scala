package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Bzip2Ops, WikiOps}

/** Q194: MediaWiki dump intake — THE canonical public-corpus source
  * (Wikipedia ships `pages-articles.xml.bz2`), read the way a
  * training pipeline actually consumes it and composing the
  * compression family end to end: the payload decodes through q191's
  * bzip2 stack (BWT/MTF/Huffman, CRCs verified), the XML page walk
  * extracts (title, ns, redirect, text) with one-level XML unescape,
  * the NAMESPACE filter keeps ns-0 articles only (talk pages are
  * process chatter, the highest-leverage quality gate on a raw
  * dump), redirects carry no text, and the WIKITEXT cleaner
  * ([[graft.functions.WikiDumpEval.clean]]) drops nested templates
  * and refs, resolves piped/bare/external links to their labels,
  * strips quote runs and heading fences, and collapses whitespace.
  *
  * Residue classes (%5): 0 → an article + a talk-page decoy that
  * must NOT leak; 1 → the SAME article wearing an infobox template
  * (nested braces) and an inline `&lt;ref&gt;` (the XML unescape
  * must run before the cleaner) — its CLEANED text must equal class
  * 0's exactly, the invariance drill; 2 → a #REDIRECT page (title
  * serves, text refuses); 3 → a talk-only dump (no article at all);
  * 4 → plain text (not a dump). Oracle re-synthesizes the cleaned
  * text from corpus words alone — it never sees XML or wikitext.
  * One narrow map, zero exchanges.
  */
object Wiki {

  def q194WikiDump(spark: SparkSession, dir: String): DataFrame =
    q194WikiDumpOn(Tables.loadSpread(spark, dir, "documents"))

  /** [[q194WikiDump]] over an explicit corpus (the ScaleSpec decade hook). */
  def q194WikiDumpOn(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = WikiOps.wikiSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .withColumn("_xml", Bzip2Ops.bzip2Decode(col("_p")))
      .select(id, WikiOps.wikiMeta(col("_xml")).as("_m"),
        WikiOps.wikiTitle(col("_xml")).as("title"),
        WikiOps.wikiText(col("_xml")).as("_t"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_dump"),
        shiftright(col("_m"), 32).bitwiseAND(lit(0xFFFFL)).cast("int")
          .as("n_pages"),
        shiftright(col("_m"), 17).bitwiseAND(lit(1L)).cast("int")
          .as("has_article"),
        shiftright(col("_m"), 16).bitwiseAND(lit(1L)).cast("int")
          .as("is_redirect"),
        col("title"),
        length(col("_t")).cast("bigint").as("n_chars"),
        md5(encode(col("_t"), "UTF-8")).as("clean_md5"))
  }
}
