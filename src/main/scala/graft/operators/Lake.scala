package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ParquetFooterOps

/** Lake self-introspection — reading the lake's OWN format metadata
  * without scanning data (the observability rung beside q104's
  * column profiling, which pays a full scan).
  */
object Lake {

  /** Q166: Parquet footer introspection — the row/column/row-group
    * accounting a lake audit reads BEFORE trusting a new drop, parsed
    * from the footer's Thrift compact protocol by the engine's own
    * walk ([[graft.functions.ParquetFooterEval]]), never by a scan:
    * `num_rows` from `FileMetaData`, column count from the schema
    * ROOT's `num_children` (counting flattened schema entries would
    * report nested groups as phantom columns), and `verified` — the
    * footer's row count cross-checked against the SUM of the row
    * groups' own counts (q59's meta/payload discipline; a footer
    * whose two counts disagree is flagged, never trusted).
    *
    * The oracle is the STRONGEST kind available: DuckDB counts the
    * actual rows by scanning the same files, so the engine's
    * footer walk must agree with an independent engine's full read.
    * Column counts replay the corpus schema contract (FIXTURES.md §B).
    *
    * At test scale each file rides one `binaryFile` row; a 100 TB
    * deployment feeds the kernel tail RANGES (the walk touches only
    * bytes from `EOF - 8 - footer_len`). Three one-row file reads,
    * one narrow map, a union — zero exchanges.
    */
  def q166ParquetFooter(spark: SparkSession, dir: String): DataFrame = {
    val tables = Seq("events", "documents", "embeddings")
    val files = tables.map { t =>
      spark.read.format("binaryFile").load(s"$dir/$t.parquet")
        .select(lit(t).as("tbl"), col("content"))
    }.reduce(_ unionAll _)
    files
      .select(col("tbl"),
        ParquetFooterOps.parquetMeta(col("content")).as("_m"),
        ParquetFooterOps.parquetNumRows(col("content")).as("num_rows"))
      .select(col("tbl"),
        when(col("_m") === -1L, 0).otherwise(1).as("is_parquet"),
        col("num_rows"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 24).bitwiseAND(lit(0xFFFFL)))
          .cast("int").as("n_columns"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 1).bitwiseAND(lit(1L)))
          .cast("int").as("verified"))
  }
}
