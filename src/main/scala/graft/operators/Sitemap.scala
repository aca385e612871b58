package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SitemapOps

/** Q146: XML sitemap parsing — the crawl-seeding inventory robots.txt
  * points at, completing the discovery family (q98 gates, q141 reads
  * feeds, q94/q107 run the frontier). Loc-less blocks are skipped,
  * locs trim + entity-decode, lastmod speaks BOTH W3C datetime
  * grammars (date-only = midnight UTC), a root that never closes
  * refuses whole ([[graft.functions.SitemapEval]]).
  *
  * Residue classes (%5): 0 → urlset with 2 + id%3 urls (date-only /
  * full-ISO lastmod alternating); 1 → sitemapindex with two children;
  * 2 → the trap set (entity-escaped loc, whitespace-padded loc,
  * loc-less url that must not count, one lastmod-less url);
  * 3 → class 0 cut 20 bytes short (unclosed root, refuses whole);
  * 4 → plain text (not XML, refuses). Oracle replays the epoch
  * arithmetic behind both date grammars from doc_id alone.
  * One narrow map, zero exchanges.
  */
object Sitemap {

  def q146SitemapParse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = SitemapOps.smSynth(params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        SitemapOps.smKind(col("_p")).as("kind"),
        SitemapOps.smUrls(col("_p")).as("n_urls"),
        SitemapOps.smLastmods(col("_p")).as("n_lastmod"),
        SitemapOps.smLatest(col("_p")).as("latest_epoch"),
        SitemapOps.smFirstLoc(col("_p")).as("first_loc"))
      .select(id,
        col("kind").isNotNull.cast("int").as("ok"),
        col("kind"), col("n_urls"), col("n_lastmod"),
        col("latest_epoch"), col("first_loc"))
  }
}
