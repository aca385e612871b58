package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SyntheticEmail

/** The canonical flattened+enriched record every downstream layer consumes
  * (reference ingestion/schema.py:32-72, producer.py:87-99) and its
  * compact-JSON wire format (producer.py:132-134, firehose_client.py:22-25).
  *
  * All of it is column expressions — the enrichment runs at full scan
  * throughput inside whole-stage codegen, no per-record driver work.
  */
object Envelope {

  /** Parse raw JSON work records (one JSON doc per row in `jsonCol`) into
    * the typed work shape. Unknown fields are dropped by the closed schema;
    * malformed JSON yields a NULL struct (PERMISSIVE), never an error.
    *
    * Note the consequence downstream: a garbage input line becomes an
    * all-null work and flows on as an envelope with only synthetic fields
    * (matching the reference's never-fail contract). A deployment that
    * wants to reject such records filters `id IS NULL` between parse and
    * wire — the landing DLQ only catches wire-level corruption.
    */
  def parseWorks(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), OpenAlexWork.schema).as("w"))
      .select(col("w.*"))

  /** Flatten + enrich a parsed work into the envelope:
    *  - first-author extraction `authorships[0].author.display_name`
    *    (get() is OOB-null-safe under ANSI, unlike element_at)
    *  - `host_venue.display_name` hoist
    *  - synthetic-email fallback when `email` is absent (sha1-determinstic,
    *    reference ingestion/utils.py:8-11)
    *  - injectable event/ingest timestamps and load id so batch runs are
    *    reproducible (SURVEY.md §4.4); production callers pass
    *    `current_timestamp()` / `uuid()`.
    */
  def toEnvelope(
      works: DataFrame,
      source: String,
      eventTs: Column,
      ingestTs: Column,
      loadId: Column = expr("uuid()")): DataFrame = {
    val primaryAuthor =
      get(col("authorships"), lit(0)).getField("author").getField("display_name")
    works.select(
      col("id"),
      col("doi"),
      col("title"),
      col("publication_year"),
      col("host_venue.display_name").as("host_venue"),
      primaryAuthor.as("primary_author"),
      coalesce(col("email"), SyntheticEmail.syntheticEmail(primaryAuthor)).as("email"),
      eventTs.as("event_ts"),
      ingestTs.as("ingest_ts"),
      lit(source).as("source"),
      loadId.as("_LOAD_ID"))
  }

  /** Wire timestamp format pinned by the reference fixtures
    * (FIXTURES.md A2: `2024-01-01T12:00:00Z`).
    */
  val WireTsFormat = "yyyy-MM-dd'T'HH:mm:ssXXX"

  /** Envelope row → one compact NDJSON value. Spark's `to_json` drops NULL
    * fields (== pydantic `exclude_none=True`) and emits compact separators;
    * `_LOAD_ID` is just the column name (the alias on the wire).
    */
  def wire(envelope: DataFrame): DataFrame =
    envelope.select(
      to_json(struct(envelope.columns.map(col): _*),
        Map("timestampFormat" -> WireTsFormat)).as("value"))

  /** Q32: the ingestion pipeline as a deterministic contract query.
    * Synthesizes one raw work JSON per customer row (nested venue object,
    * authorship array, doi present only on even keys → exercises the
    * closed-schema parse, P12 serialization, nested/array path flattening
    * and null omission), then runs the real parse→flatten→enrich pipeline.
    * Emails are explicit here so the DuckDB oracle can reproduce them (the
    * sha1 synthetic fallback has no DuckDB analog; it is pinned against
    * hashlib vectors in FunctionsSpec/IngestSpec instead).
    */
  def q32Envelope(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val anchor = to_timestamp(lit(graft.Tables.Anchor))
    val raw = graft.Tables.load(spark, dir, "customer").select(
      col("c_custkey"),
      to_json(struct(
        concat(lit("W"), col("c_custkey")).as("id"),
        when(col("c_custkey") % 2 === 0,
          concat(lit("10.1/"), col("c_custkey"))).as("doi"),
        col("c_name").as("title"),
        (lit(1990) + col("c_nationkey")).as("publication_year"),
        struct(col("c_mktsegment").as("display_name")).as("host_venue"),
        array(struct(
          struct(col("c_name").as("display_name")).as("author"))).as("authorships"),
        concat(lower(col("c_name")), lit("@ex.com")).as("email"))).as("value"))
    val parsed = raw.select(col("c_custkey"),
      from_json(col("value"), OpenAlexWork.schema).as("w"))
      .select(col("c_custkey"), col("w.*"))
    toEnvelope(parsed, "openalex", anchor, anchor,
      loadId = concat(lit("L"), col("c_custkey")))
      .withColumnRenamed("_LOAD_ID", "load_id")
  }
}
