package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.LatexOps

/** Q144: LaTeX source-text extraction — the scholarly corpus's native
  * format (arXiv ships author `.tex`; q125 reads the rendered PDF,
  * this reads the source). Math and verbatim are EXCLUDED from prose
  * and counted, reference machinery vanishes, the `\title` argument
  * is captured as its own manifest column
  * ([[graft.functions.LatexEval]]).
  *
  * Residue classes (%5): 0 → plain article; 1 → SAME prose under
  * different markup (starred section, `\textit`/`\textbf` swap,
  * whole-line + trailing comments, an optioned `\cite[p.~7]`) — the
  * markup-invariance drill: its text must equal class 0's shape;
  * 2 → a `verbatim` block whose `$`/`%`/macro bytes must confuse
  * nothing; 3 → an `equation` environment on top of the inline math
  * (n_math = 2); 4 → plain text, no markup (title NULL, counts 0).
  * Oracle re-synthesizes expected prose from corpus words alone.
  * One narrow map, zero exchanges.
  */
object Latex {

  def q144LatexExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = LatexOps.texSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        LatexOps.texTitle(col("_p")).as("title"),
        LatexOps.texSections(col("_p")).as("n_sections"),
        LatexOps.texMath(col("_p")).as("n_math"),
        LatexOps.texCites(col("_p")).as("n_cites"),
        LatexOps.texText(col("_p")).as("_t"))
      .select(id,
        col("title"),
        col("n_sections"),
        col("n_math"),
        col("n_cites"),
        md5(col("_t")).as("text_md5"),
        // char count, not bytes: the accented café makes them differ
        length(col("_t").cast("string")).cast("long").as("n_chars"))
  }
}
