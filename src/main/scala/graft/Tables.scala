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
      // The corpus stores events.ts as INT64 TIMESTAMP(NANOS) parquet, which
      // Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw int64
      // nanos via the legacy conf and convert to a µs timestamp here so every
      // consumer sees a plain TimestampType column. Runtime-settable SQLConf,
      // so the fix lives in the loader regardless of who built the session.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
