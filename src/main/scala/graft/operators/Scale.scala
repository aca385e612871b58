package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Layout and skew techniques for the 100 TB regime. These are the knobs a
  * deployment turns when a shuffle key stops being uniform or a join is hot
  * enough to pre-pay its co-location.
  */
object Scale {

  /** Two-phase salted sum+count: spread a skewed grouping key over `salt`
    * sub-keys for the partial aggregate, then combine the partials in a
    * (now uniform) final aggregate. Exact, because sum-of-sums and
    * sum-of-counts are the same algebra the partial computed.
    *
    * Use when one key holds a disproportionate share of rows — the classic
    * hot-key failure where a single reducer runs for hours while the rest
    * of the cluster idles. The salt column derives from physical position
    * (partition id + row id), so a hot key's rows really do spread across
    * `salt` partial groups regardless of their values.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], measure: String,
                     salt: Int = 16): DataFrame =
    df.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_c"), sum(col(measure)).as("_s"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_c").as("cnt"), sum("_s").as("total"))

  /** Bucketed layout: pre-shuffle a table ONCE by its join key so every
    * later equi-join on that key reads co-located buckets and skips the
    * exchange entirely — the pay-once-join-forever trade a 100 TB fact
    * table wants. (bucketBy requires a catalog table, hence saveAsTable.)
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
}
