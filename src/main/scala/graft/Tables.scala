package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * One parquet file per table; vectorized scan, column pruning and filter
  * pushdown come from Spark's built-in parquet source — every query should
  * show `PushedFilters`/pruned `ReadSchema` in `.explain("formatted")`.
  *
  * At 100 TB these would be partitioned/bucketed lake tables; the loaders
  * keep the access path behind one function so the physical layout can
  * change without touching operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The corpus generator has stored events.ts two ways across driver
      // versions: INT64 TIMESTAMP(NANOS) — which Spark 4 rejects outright
      // (PARQUET_TYPE_ILLEGAL) unless read as raw nanos via the legacy
      // conf — and plain TIMESTAMP(MICROS) without a timezone, which reads
      // as TIMESTAMP_NTZ. Normalize BOTH to a session-tz TimestampType
      // column here so every consumer (and the DuckDB oracle, which reads
      // the same naive values) sees identical semantics regardless of
      // which generator produced the files. Runtime-settable SQLConf, so
      // the fix lives in the loader regardless of who built the session.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-int64 corpus
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // micros corpus: NTZ → session-tz timestamp (UTC session)
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  private val RegisteredDirKey = "spark.graft.tables.registeredDir"

  /** Register every corpus table as a temp view.
    *
    * Idempotent AND cheap: a second call for the same dir is a no-op (no
    * parquet footer re-reads — queries that call this defensively, q16/q34,
    * were paying a footer read per invocation). Switching dirs re-registers.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val already = spark.conf.getOption(RegisteredDirKey).contains(dir) &&
      names.forall(spark.catalog.tableExists)
    if (!already) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(RegisteredDirKey, dir)
    }
  }

  /** Deterministic "now" for contract queries — replaces CURRENT_TIMESTAMP
    * per SURVEY.md §4.4 (reference uses wall-clock at
    * sql/04_views_curated.sql:23,54-60; we inject the anchor instead).
    */
  val Anchor = "2024-02-01 00:00:00"
}
