package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CSV corpus ingest (q134) — q76's JSONL discipline applied to the
  * other interchange format data drops actually arrive in, with the
  * quoting rules RFC 4180 makes non-negotiable:
  *
  *   - fields containing the separator, the quote, or a line break are
  *     quoted; an embedded quote DOUBLES (`""`), never backslash-
  *     escapes — Spark's CSV default escape is `\`, so both the writer
  *     and the reader here pin `escape = "` to get standard doubling
  *     (a reader left on the default mis-parses every doubled quote);
  *   - every serialized row is FORCED through the hard paths: the text
  *     column is decorated with an embedded comma, an embedded newline,
  *     and embedded quotes, so none of the quoting machinery can
  *     silently go unexercised;
  *   - embedded newlines make records span physical lines, so the read
  *     runs `multiLine` — the stated scale trade: multiLine parallelizes
  *     per FILE, not per line, which is why the twin is written as many
  *     part files (shard count, not line-splitting, carries the
  *     parallelism at 100 TB);
  *   - EXPLICIT schema, no inference pass (q76's rule);
  *   - corrupt lines are DATA: they quarantine into the NULL-source
  *     manifest row under PERMISSIVE mode, never kill the job. The two
  *     injected lines are single-token and non-numeric so every schema
  *     field is NULL under any partial-parse behavior.
  *
  * Reference scope: scholar-stream's feed is JSON over REST
  * (reference ingestion/openalex_client.py); CSV drops are the
  * flat-file sibling every lake ingests.
  */
object Csv {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dec", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val readSchema = docSchema.add(StructField("_corrupt_record", StringType))

  private val csvOpts = Map(
    "escape" -> "\"", // RFC 4180 quote doubling, not backslash escapes
    "quote" -> "\"")

  /** The decorated text every row serializes: embedded comma, newline,
    * and quotes force the quoting machinery on every record. The oracle
    * replays the same construction from the parquet side.
    */
  private def decorated = concat(col("text"), lit(",\n\""), col("lang"), lit("\""))

  private def csvTwin(spark: SparkSession, dir: String): java.io.File = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    val wh = new java.io.File(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath)
    new java.io.File(wh, "csv1_" +
      (dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("d") +
        "_" + dirHash).replaceAll("[^A-Za-z0-9_]", "_"))
  }

  /** Materialize the CSV twin once (the ensureJsonl lifecycle): every
    * document serialized by the ENGINE's own CSV serializer (`to_csv`
    * under the pinned RFC options), plus two corrupt lines for the
    * quarantine path. A half-written twin (no _SUCCESS) is rebuilt.
    */
  def ensureCsv(spark: SparkSession, dir: String): String = synchronized {
    val twin = csvTwin(spark, dir)
    if (!new java.io.File(twin, "_SUCCESS").exists()) {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      val corrupt = spark.createDataset(Seq(
        "this line was never csv",
        "### neither was this one"))
      Tables.load(spark, dir, "documents")
        .select(to_csv(struct(col("doc_id"), decorated.as("dec"),
          col("lang"), col("source"), col("n_chars")),
          csvOpts.asJava).as("line"))
        .union(corrupt.toDF("line"))
        .write.mode("overwrite").text(twin.getAbsolutePath)
    }
    twin.getAbsolutePath
  }

  /** Q134: the CSV ingest contract — schema-stated multiLine read of
    * the twin under the pinned RFC 4180 options, per-source manifest
    * with the corrupt quarantine group as the NULL-source row (q76's
    * shape exactly). The oracle computes the same manifest from the
    * PARQUET side, so any serializer/parser drift — quote doubling,
    * embedded separators, newline handling, unicode — fails the hash.
    */
  def q134CsvIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureCsv(spark, dir)
    spark.read.schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("quote", "\"")
      .csv(path)
      .groupBy("source")
      .agg(count(lit(1)).as("n_lines"),
        count(col("doc_id")).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(length(col("dec"))).cast("long").as("chars"))
  }
}
