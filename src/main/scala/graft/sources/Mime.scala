package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MimeOps

/** Q137: MIME / email ingest — the mailing-list corpus source (list
  * archives and support dumps arrive as EML; the reference ingests a
  * JSON feed only, reference ingestion/openalex_client.py, so this is
  * a north-star extension of the source family q76/q82/q125/q136).
  * Each payload is a synthesized RFC 5322 message carrying the
  * document's own bytes; the manifest reports structure (part count),
  * the RFC 2047-decoded subject, and content digests.
  *
  * Residue classes (%6): 0 → single-part 7bit; 1 → multipart/mixed
  * with a quoted-printable text part + base64 attachment and a
  * B-encoded UTF-8 subject; 2 → base64 single part, subject split as
  * two ADJACENT Q-encoded words across a folded header; 3 → folded
  * plain subject, quoted space-bearing boundary, transport padding,
  * lowercase QP hex; 4 → close delimiter missing (truncated download,
  * whole refusal); 5 → not a message. The oracle replays subjects,
  * decoded-body and attachment md5s, and byte accounting from corpus
  * text alone. One narrow map, zero exchanges.
  */
object Mime {

  def q137MimeExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = (id % 6).cast("long")
    val params = id + mode * lit(1L << 40)
    val whole = MimeOps.mimeSynth(col("text"), params)
    val payload = when(id % 6 === 5, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        MimeOps.mimeParts(col("_p")).as("_n"),
        MimeOps.mimeSubject(col("_p")).as("subject"),
        MimeOps.mimeBody(col("_p")).as("_b"),
        MimeOps.mimeAttachment(col("_p")).as("_a"))
      .select(id,
        col("_n").isNotNull.cast("int").as("ok"),
        col("_n").as("n_parts"),
        col("subject"),
        md5(col("_b")).as("body_md5"),
        md5(col("_a")).as("att_md5"),
        length(col("_b")).cast("long").as("n_body_bytes"))
  }
}
