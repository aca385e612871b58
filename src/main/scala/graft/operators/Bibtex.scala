package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BibtexOps

/** Q145: BibTeX parsing — the citation-metadata record in the format
  * authors exchange (the reference's whole domain is paper metadata:
  * reference ingestion/openalex_client.py ships title/author/year
  * rows from OpenAlex; `.bib` is the same record's wire format).
  * Case-insensitive grammar, `@string`/`#` concatenation, protective
  * nested braces, the author-list ` and ` split
  * ([[graft.functions.BibtexEval]]).
  *
  * Residue classes (%5): 0 → two plain entries, braced and quoted
  * values mixed; 1 → the SAME records via `@string` macro + `#`
  * concat + case-variant types/fields + trailing comma — the
  * grammar-invariance drill: all six outputs must equal class 0's;
  * 2 → protective nested-brace title + an `@comment` that must not
  * count; 3 → bare-number year, missing author, trailing comma;
  * 4 → plain text (zero entries, NULL key/year/titles). Oracle
  * re-synthesizes every expected value from corpus words alone.
  * One narrow map, zero exchanges.
  */
object Bibtex {

  def q145BibtexParse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = BibtexOps.bibSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        BibtexOps.bibEntries(col("_p")).as("n_entries"),
        BibtexOps.bibArticles(col("_p")).as("n_articles"),
        BibtexOps.bibFirstKey(col("_p")).as("first_key"),
        BibtexOps.bibAuthors(col("_p")).as("n_authors"),
        BibtexOps.bibYearMax(col("_p")).as("year_max"),
        md5(BibtexOps.bibTitles(col("_p")).cast("binary")).as("titles_md5"))
  }
}
