package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The engine's SQL entry point exercised as a contract query — view
  * bootstrap (G4) + schema-on-read typed view (P4/P5 analog of VW_WORKS,
  * reference sql/04_views_curated.sql:28-42) + a dashboard-shaped
  * aggregate, all through `spark.sql`. Catalyst inlines the view, prunes
  * the JSON path extraction to the selected columns and pushes the time
  * filter to the parquet scan — same physical plan a DataFrame user gets.
  */
object SqlSurface {

  def q34SqlViews(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW vw_events AS
        |SELECT event_id, event_type, user_id, value, ts,
        |  try_cast(get_json_object(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin)
    spark.sql(
      """SELECT event_type, count(*) AS cnt,
        |  round(avg(k), 6) AS avg_k,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM vw_events
        |WHERE ts <= TIMESTAMP '2024-02-01 00:00:00'
        |GROUP BY event_type""".stripMargin)
  }
}
