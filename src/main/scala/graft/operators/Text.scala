package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting).
  * Everything is per-row narrow work (no shuffle) except the final
  * aggregates, so these scale linearly with input splits.
  */
object Text {

  /** Q17: per-language corpus stats. */
  def q17TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        sum("n_chars").as("total_chars"),
        max(length(col("text"))).as("max_len"))

  /** Q20: exact distinct (the count-level dedup check). */
  def q20DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("total"),
        countDistinct(col("text")).as("distinct_texts"))

  /** Q27: marker-word language ID. A real deployment swaps the marker
    * table; the contract pins the scoring+argmax semantics (deterministic
    * tie-break by score order en>de>es>fr>zh).
    */
  def q27LangId(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    def score(markers: Seq[String]) =
      markers.map(m => occurrences(padded, " " + m + " ")).reduce(_ + _)
    val sEn = score(Seq("the", "a", "of"))
    val sDe = score(Seq("der", "und", "die"))
    val sEs = score(Seq("el", "la", "los"))
    val sFr = score(Seq("le", "les", "des"))
    val sZh = score(Seq("的", "是"))
    val best = greatest(sEn, sDe, sEs, sFr, sZh)
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      when(sEn === best, "en").when(sDe === best, "de")
        .when(sEs === best, "es").when(sFr === best, "fr")
        .otherwise("zh").as("detected"))
  }

  /** Q28: quality scoring from length/token statistics
    * (training-data filtering primitive).
    */
  def q28Quality(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(words(col("text")))
    val charsNoSpace = length(replace(col("text"), lit(" "), lit("")))
    val avgTokLen = charsNoSpace.cast("double") / nTokens
    val score =
      least(lit(1.0), nTokens.cast("double") / 50.0) * 0.5 +
        least(lit(1.0), avgTokLen / 5.0) * 0.5
    Tables.load(spark, dir, "documents").select(
      col("doc_id"), nTokens.as("n_tokens"),
      round(avgTokLen, 6).as("avg_token_len"),
      round(score, 6).as("quality"))
  }

  /** Q29: whitespace + BPE-ish regex token counts. */
  def q29TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(words(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_bpe_tokens"))

  /** Q30: whitespace-normalized md5 document fingerprint — the exact-dup
    * key for content-defined dedup at scale.
    */
  def q30Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
}
