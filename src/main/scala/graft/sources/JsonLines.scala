package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** JSONL (newline-delimited JSON) corpus ingest — the interchange format
  * LLM training corpora actually arrive in (one JSON document per line).
  * The reference ingests JSON over REST one envelope at a time
  * (`/root/reference/ingestion/openalex_client.py`); this is the
  * batch-lake sibling: the same records as files of JSON lines.
  *
  * The two disciplines that matter at 100 TB, both exercised here:
  *
  *   - EXPLICIT schema. `spark.read.json` without one runs a full
  *     inference pass over every byte before the real read — at lake
  *     scale that silently doubles the job. The reader below never
  *     infers.
  *   - Corrupt lines are DATA, not failures. A malformed line lands in
  *     `_corrupt_record` with every schema field NULL (PERMISSIVE mode) —
  *     the batch-layer twin of the streaming DLQ (S5/`Landing.errors`):
  *     one bad line in a billion must quarantine, not kill the job or
  *     silently vanish. q76 carries the quarantined group (NULL source)
  *     through its report so the contract PROVES the corrupt path.
  *
  * JSONL is line-splittable, so a single large file still parallelizes
  * across executors (unlike whole-file JSON arrays); JSON-string escaping
  * keeps embedded newlines inside one physical line.
  */
object JsonLines {

  /** `documents`' schema, stated explicitly — no inference pass. */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val readSchema = docSchema.add(StructField("_corrupt_record", StringType))

  /** Deterministic per-corpus twin directory under the warehouse (the
    * bucket-twin naming convention: last path segment + full-dir hash so
    * two corpora can never collide on a name).
    */
  private def jsonlTwin(spark: SparkSession, dir: String): java.io.File = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    val wh = new java.io.File(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath)
    new java.io.File(wh, "jsonl2_" +
      (dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("d") +
        "_" + dirHash).replaceAll("[^A-Za-z0-9_]", "_"))
  }

  /** Materialize the JSONL twin of `documents` once (pay-once, the
    * ensureBucketed lifecycle): every document serialized by the engine's
    * own JSON writer, plus two deliberately malformed lines (a truncated
    * record and a non-JSON line) so the corrupt-quarantine path has real
    * positives. A half-written twin (no _SUCCESS) is rebuilt.
    */
  def ensureJsonl(spark: SparkSession, dir: String): String = synchronized {
    val twin = jsonlTwin(spark, dir)
    if (!new java.io.File(twin, "_SUCCESS").exists()) {
      import spark.implicits._
      // both lines break BEFORE any field completes: a partially-valid
      // record would parse field-by-field under partial-results mode,
      // and whether a half-parsed doc_id survives then depends on which
      // columns a consumer prunes — the quarantine must not
      val corrupt = spark.createDataset(Seq(
        """{"doc_id": broken""",
        "this line was never JSON"))
      Tables.load(spark, dir, "documents").toJSON
        .union(corrupt)
        .write.mode("overwrite").text(twin.getAbsolutePath)
    }
    twin.getAbsolutePath
  }

  /** Q76: the JSONL ingest contract — schema-stated read of the twin,
    * per-source manifest (line/doc counts, id and char sums) with the
    * corrupt quarantine group riding along as the NULL-source row
    * (n_lines 2, n_docs 0): the report a lake ingest job publishes so a
    * silent parse regression (or a corrupt-line flood) is visible in ONE
    * row. Values must round-trip exactly — the oracle computes the same
    * manifest from the PARQUET side, so any serializer/parser drift
    * (escaping, unicode, big integers) fails the hash.
    */
  def q76JsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureJsonl(spark, dir)
    spark.read.schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .groupBy("source")
      .agg(count(lit(1)).as("n_lines"),
        count(col("doc_id")).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(length(col("text"))).cast("long").as("chars"))
  }
}
