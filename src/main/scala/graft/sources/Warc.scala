package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.WarcOps

/** Q82: WARC record ingest — the crawl-native container read
  * (ISO 28500; Common Crawl's interchange format, the batch input
  * RefinedWeb/FineWeb-style corpus builds start from), completing the
  * source family beside q76's JSONL: JSONL is how CURATED corpora move,
  * WARC is how CRAWLS arrive.
  *
  * Each `documents` row synthesizes a multi-record WARC stream from
  * doc_id residues (the q56/q60 technique), and the codegen'd
  * Content-Length walk ([[graft.functions.WarcMeta]] family) parses it
  * back; the oracle recomputes every field DIRECTLY from the residues —
  * never by parsing — so a walk slip (fixed offsets, split-on-separator,
  * case-sensitive header match, off-by-one at the record separator)
  * cannot cancel out. The synthesis plants the traps a real crawl
  * delivers:
  *
  *  - every payload EMBEDS `\r\n\r\n` — a split-based parse reads
  *    garbage lengths; only the Content-Length walk survives;
  *  - odd doc_ids serialize headers lowercase, reordered, with an
  *    ignored extra header (names are case-insensitive per spec);
  *  - `doc_id % 10 == 4`: record 0 carries no Content-Length — the walk
  *    cannot cross an unlengthed record, so the stream reports 0 records
  *    + truncated (the documented stop-don't-guess stance);
  *  - `doc_id % 10 == 7`: the final record separator is cut — the tail
  *    record drops, prior records still serve, truncated = 1;
  *  - `doc_id % 10 == 9`: not WARC at all (plain text) — NULL verdict,
  *    distinguishable from "WARC with zero valid records".
  *
  * Scale shape: one narrow map over the input — every kernel column is
  * pre-projected and the bounded explode (≤ 3 records here; a real
  * segment's record count is bounded by segment size) is the only
  * fan-out; zero exchanges, fuses into the scan at 100 TB. Payload
  * fingerprint/length come from the SLICED bytes (`md5(payload)`), so
  * the verdict row proves the slice, not just the headers.
  */
object Warc {

  private def payloadOf(d: Column, j: Column): Column =
    concat(lit("A"), d.cast("string"), lit("-"), j.cast("string"),
      lit("\r\n\r\n"),
      repeat(lit("x"), ((d * 7 + j * 3) % 40 + 1).cast("int")))

  private def uriOf(d: Column, j: Column): Column =
    concat(lit("http://site"), (d % 50).cast("string"), lit(".example/p/"),
      d.cast("string"), lit("/"), j.cast("string"))

  /** One serialized record; `lenMissing` renames Content-Length so the
    * record cannot be walked.
    */
  private def recordOf(d: Column, j: Column, lenMissing: Column): Column = {
    val crlf = "\r\n"
    val pay = payloadOf(d, j)
    val clen = length(pay).cast("string")
    val rtype = when(j % 2 === 0, "response").otherwise("request")
    val rid = concat(lit("<urn:uuid:"), (d * 13 + j).cast("string"), lit(">"))
    val uri = uriOf(d, j)
    val lenName =
      when(lenMissing, lit("Content-Missing: ")).otherwise(lit("Content-Length: "))
    val evenHdr = concat(lit("WARC/1.0" + crlf),
      lit("WARC-Type: "), rtype, lit(crlf),
      lit("WARC-Record-ID: "), rid, lit(crlf),
      lit("WARC-Target-URI: "), uri, lit(crlf),
      lenName, clen, lit(crlf + crlf))
    val oddHdr = concat(lit("WARC/1.0" + crlf),
      lit("content-length: "), clen, lit(crlf),
      lit("warc-type: "), rtype, lit(crlf),
      lit("X-Extra: v"), lit(crlf),
      lit("warc-target-uri: "), uri, lit(crlf),
      lit("warc-record-id: "), rid, lit(crlf + crlf))
    concat(when(d % 2 === 0, evenHdr).otherwise(oddHdr), pay, lit(crlf + crlf))
  }

  /** The stream for one doc: `nr` records back-to-back, with the
    * per-residue corruption cases applied.
    */
  private[sources] def synthStream(d: Column, nr: Column): Column = {
    val whole = array_join(
      transform(sequence(lit(0), (nr - 1).cast("int")),
        j => recordOf(d, j, d % 10 === 4 && j === 0)), "")
    val cut = substring(whole, lit(1), length(whole) - 3)
    when(d % 10 === 7, cut).otherwise(whole)
  }

  def q82WarcIngest(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    // the oracle hard-codes a NULL verdict for every r=9 doc, so the
    // "not WARC at all" stream must be GUARANTEED non-magic: a generated
    // text that happened to start with the 5-byte `WARC/` magic would
    // parse here and diverge — the '!' sentinel closes that hole without
    // trusting a generator invariant
    val stream = when(d % 10 === 9, concat(lit("!"), col("text")).cast("binary"))
      .otherwise(synthStream(d, d % 3 + 1).cast("binary"))
    Tables.load(spark, dir, "documents")
      .select(d, stream.as("_p"))
      // ONE walk per stream: the offsets table carries every record's
      // byte offset PLUS the packed verdict as its trailer element, and
      // each exploded row's accessors parse only their own record — an
      // index-based seek would re-walk the prefix per row (O(records²)
      // on a real crawl segment), and a separate meta call would walk
      // the stream a second time for the verdict alone
      .withColumn("_offs", WarcOps.warcOffsets(col("_p")))
      .withColumn("_v", element_at(col("_offs"), -1))
      .select(d, col("_p"),
        shiftrightunsigned(col("_v"), 1).cast("long").as("n_records"),
        col("_v").bitwiseAND(lit(1)).cast("int").as("truncated"),
        posexplode_outer(expr("slice(_offs, 1, size(_offs) - 1)"))
          .as(Seq("rec_idx", "_off")))
      .withColumn("_pay", WarcOps.warcPayload(col("_p"), col("_off")))
      .select(d, col("n_records"), col("truncated"),
        col("rec_idx").cast("int").as("rec_idx"),
        WarcOps.warcHeader(col("_p"), col("_off"), 0).as("rec_type"),
        WarcOps.warcHeader(col("_p"), col("_off"), 1).as("uri"),
        length(col("_pay")).cast("long").as("content_length"),
        md5(col("_pay")).as("payload_md5"))
  }

  // ───────────────────────────── write side ─────────────────────────────

  /** One serialized WARC/1.0 record as BINARY — the WRITE side of the
    * q82 walk (a corpus refresh that computes q105's diff needs to emit
    * records, not only read them). Layout is exactly what the walk
    * consumes: version line, `WARC-Type` / `WARC-Target-URI` headers,
    * `Content-Length` counting payload BYTES, the CRLF blank line, the
    * body, and the 4-byte record separator that BELONGS to the record.
    *
    * `rtype = "revisit"` emits the digest-only profile q105's `revisit`
    * bit marks (ISO 28500's revisit record: a recrawler stores the
    * evidence, not another copy): zero body bytes, `Content-Length: 0`,
    * and the content digest carried in `WARC-Payload-Digest`.
    */
  def warcRecordBytes(uri: Column, rtype: Column, payload: Column,
                      digest: Column): Column = {
    val crlf = "\r\n"
    val body = when(rtype === "revisit", lit("").cast("binary"))
      .otherwise(payload.cast("binary"))
    // WARC/1.0 makes WARC-Record-ID and WARC-Date MANDATORY — external
    // validators (warcio strict, CDX indexers) reject records without
    // them even though the in-repo walk ignores extras. Both are
    // DETERMINISTIC here (id from the record's identity, a fixed date)
    // so written archives are reproducible; a deployment swaps uuid()
    // and current_timestamp at the call site.
    val recId = concat(lit("<urn:graft:"),
      md5(concat_ws("|", uri, rtype, coalesce(digest, lit("")))), lit(">"))
    val head = concat(
      lit("WARC/1.0" + crlf),
      lit("WARC-Type: "), rtype, lit(crlf),
      lit("WARC-Target-URI: "), uri, lit(crlf),
      lit("WARC-Date: 2024-01-01T00:00:00Z" + crlf),
      lit("WARC-Record-ID: "), recId, lit(crlf),
      when(rtype === "revisit",
        concat(lit("WARC-Payload-Digest: md5:"), digest, lit(crlf)))
        .otherwise(lit("")),
      lit("Content-Length: "), length(body).cast("string"),
      lit(crlf + crlf))
    concat(head.cast("binary"), body, lit(crlf + crlf).cast("binary"))
  }

  /** Records → one `.warc.gz` SEGMENT per group: each record serialized
    * by [[warcRecordBytes]] and wrapped as its OWN gzip member (q95's
    * codec — member-per-record is the Common Crawl layout, and what
    * keeps a segment record-seekable), members concatenated in `pos`
    * order by a capacity-bounded fold (q50's collect discipline — the
    * group is one segment, bounded by segment size policy, never the
    * corpus). Input frame: `(seg_id, pos, uri, rtype, payload, digest)`.
    *
    * No DuckDB oracle, by design: the READER is the oracle — WarcSpec
    * pins that `gunzipConcat` + the q82 offsets walk recover every
    * record byte-exactly (uri, type, payload md5, revisit emptiness)
    * from the written segment.
    *
    * Scale shape: one narrow serialize+deflate map, then ONE exchange
    * keyed by seg_id for the ordered fold — exactly q50's pack-assembly
    * shape with gzip members instead of text chunks.
    */
  def warcGzSegments(records: DataFrame): DataFrame = {
    import graft.functions.GzipOps
    val rec = warcRecordBytes(col("uri"), col("rtype"),
      col("payload"), col("digest"))
    val member = GzipOps.gzip(rec,
      concat(lit("r"), col("pos").cast("string"), lit(".warc")))
    // a NULL member (NULL uri/payload reaching the serializer) must not
    // silently NULL the whole segment's concat fold — the segment would
    // vanish from any read-back with no error. Bad records are COUNTED
    // (`n_bad`, report-WHY) and excluded from the fold; collect_list
    // skips the NULL elements the `when` produces.
    records
      .select(col("seg_id"), col("pos"), member.as("_m"))
      .groupBy("seg_id")
      .agg(
        aggregate(
          transform(array_sort(collect_list(
            when(col("_m").isNotNull, struct(col("pos"), col("_m"))))),
            x => x.getField("_m")),
          lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x)).as("segment"),
        count(col("_m")).cast("int").as("n_records"),
        count(when(col("_m").isNull, lit(1))).cast("int").as("n_bad"))
  }

  /** Q108: WARC WRITE round-trip as an ORACLE-BACKED contract — the one
    * place a self-consistent-but-wrong writer/reader pair would slip
    * past a spec that uses one to check the other: the query WRITES
    * every document into 8-record `.warc.gz` segments ([[warcGzSegments]]
    * — revisit profile for the `%3==1` class, q105's digest-only
    * stance) and READS them back through the q95 codec + q82 walk,
    * publishing what came OUT; DuckDB derives the same rows DIRECTLY
    * from residues (never from bytes). Any drift anywhere in the
    * serialize → deflate → member-concat → inflate → Content-Length
    * walk → payload-slice chain shows up as a md5/length mismatch —
    * in particular a writer whose Content-Length counted characters,
    * or a revisit record that leaked body bytes.
    *
    * Scale shape: one narrow serialize+deflate map, ONE exchange keyed
    * by seg_id for the ordered member fold (bounded by the 8-record
    * segment policy — a real segment bounds by bytes the same way),
    * then a narrow walk-back with each kernel once per row.
    */
  def q108WarcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GzipOps
    val id = col("doc_id")
    // coalesce: a NULL text must serialize as an EMPTY response, not
    // become a NULL record the segment fold then reports as bad — the
    // oracle spells the same coalesce
    val txt = coalesce(col("text"), lit(""))
    val records = Tables.load(spark, dir, "documents").select(
      expr("doc_id div 8").as("seg_id"),
      id.as("pos"),
      concat(lit("http://w.example/d/"), id.cast("string")).as("uri"),
      when(id % 3 === 1, "revisit").otherwise("response").as("rtype"),
      txt.cast("binary").as("payload"),
      md5(txt.cast("binary")).as("digest"))
    warcGzSegments(records)
      .withColumn("_bytes", GzipOps.gunzipConcat(col("segment")))
      .withColumn("_offs", WarcOps.warcOffsets(col("_bytes")))
      .select(col("seg_id"), col("n_records"),
        posexplode(expr("slice(_offs, 1, size(_offs) - 1)"))
          .as(Seq("rec_idx", "_off")), col("_bytes"))
      .withColumn("_pay", WarcOps.warcPayload(col("_bytes"), col("_off")))
      .select(col("seg_id"), col("n_records"),
        col("rec_idx").cast("int").as("rec_idx"),
        WarcOps.warcHeader(col("_bytes"), col("_off"), 0).as("rec_type"),
        WarcOps.warcHeader(col("_bytes"), col("_off"), 1).as("uri"),
        length(col("_pay")).cast("bigint").as("content_length"),
        md5(col("_pay")).as("payload_md5"))
  }
}
