package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.FeedOps

/** Q141: RSS/Atom feed ingest — the crawl-discovery channel beside
  * sitemaps (q103): blogs and release pages announce new URLs through
  * feeds, and the manifest a recrawl scheduler needs is items + links
  * + the LATEST timestamp per feed ([[graft.functions.FeedEval]]:
  * attribute-vs-text links, the rel="self" decoy, RFC 822 vs ISO 8601
  * date normalization through real civil-date arithmetic, CDATA and
  * entity titles).
  *
  * Residue classes (%5): 0 → RSS 2.0 with RFC 822 dates; 1 → Atom
  * with ISO dates, href links behind a rel="self" decoy, an
  * entity-escaped first title; 2 → RSS with CDATA titles (the first
  * spelling raw markup verbatim); 3 → cut before `</rss>` (truncated
  * download, refuses whole); 4 → not a feed. Oracle replays counts,
  * links, epoch arithmetic, and decoded titles from corpus words
  * alone. One narrow map, zero exchanges.
  */
object Feeds {

  def q141FeedIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = FeedOps.feedSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        FeedOps.feedFormat(col("_p")).as("format"),
        FeedOps.feedItems(col("_p")).as("n_items"),
        FeedOps.feedFirstTitle(col("_p")).as("first_title"),
        FeedOps.feedFirstLink(col("_p")).as("first_link"),
        FeedOps.feedLatestEpoch(col("_p")).as("latest_epoch"),
        FeedOps.feedTitles(col("_p")).as("_t"))
      .select(id,
        col("format").isNotNull.cast("int").as("ok"),
        col("format"),
        col("n_items"),
        col("first_title"),
        col("first_link"),
        col("latest_epoch"),
        md5(col("_t")).as("titles_md5"))
  }
}
