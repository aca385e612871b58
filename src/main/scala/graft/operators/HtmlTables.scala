package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HtmlTableOps

/** Q147: HTML table extraction — the structured-data read of the
  * page-intake family (q93 strips prose; tables carry the web's
  * relational payload). Optional-close-tag grammar, quote-aware
  * attributes, colspan-aware widths, entity-decoded cells
  * ([[graft.functions.HtmlTableEval]]).
  *
  * Residue classes (%7): 0 → one fully-closed 3x2 table; 1 → the
  * SAME logical table with uppercase tags, omitted `</tr>`/`</td>`,
  * and a `>` inside a quoted attribute — the omissibility drill: all
  * five outputs must equal class 0's; 2 → a `colspan="2"` header
  * spelling `&amp;` plus an inline `<b>` cell; 3 → class 0 plus a
  * second 1x2 table; 4 → the ROWSPAN drill — a cell spanning two rows
  * carries its text down and the grid is 3 wide where no single row
  * spells 3 cells; 5 → a NESTED table inside a cell (the outer keeps
  * only its own prose, the inner counts separately); 6 → plain text
  * (zero tables, NULL firsts). Oracle re-synthesizes every expected
  * cell — including the carried-down and nested-excluded ones — from
  * corpus words alone. One narrow map, zero exchanges.
  */
object HtmlTables {

  def q147HtmlTables(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 7 === 1, 1L).when(id % 7 === 2, 2L)
      .when(id % 7 === 3, 3L).when(id % 7 === 4, 4L)
      .when(id % 7 === 5, 5L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = HtmlTableOps.htSynth(col("text"), params)
    val payload = when(id % 7 === 6, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        HtmlTableOps.htTables(col("_p")).as("n_tables"),
        HtmlTableOps.htRows(col("_p")).as("n_rows"),
        HtmlTableOps.htFirstRows(col("_p")).as("first_rows"),
        HtmlTableOps.htFirstCols(col("_p")).as("first_cols"),
        md5(HtmlTableOps.htFirstCells(col("_p")).cast("binary"))
          .as("cells_md5"))
  }
}
