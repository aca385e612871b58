package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Deterministic "now" for contract queries — replaces CURRENT_TIMESTAMP
    * per SURVEY.md §4.4 (reference uses wall-clock at
    * sql/04_views_curated.sql:23,54-60; we inject the anchor instead).
    */
  val Anchor = "2024-02-01 00:00:00"
}
