package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Text

/** Q45 — train/benchmark 8-gram decontamination. Value parity vs DuckDB is
  * the oracle gate's job; these pin the contract a green hash can't state:
  * which docs are in scope, what counts as one overlap, and that the
  * holdout side of the join stays broadcast-sized in the plan.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Fixture with every edge the operator has to get right. Holdout is
    * source src18/src19 (the operator's split); 8 words of 'common ngram
    * overlap detection test phrase number N' are shared verbatim.
    */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q45fixture").toString
    val shared = "one two three four five six seven eight"
    Seq(
      // train doc containing the holdout 8-gram twice -> counted ONCE
      (0L, s"intro $shared middle $shared outro tail pad pad2", "en", "src01", 99L),
      // train doc with no overlap
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota", "en", "src02", 50L),
      // train doc shorter than 8 words -> zero shingles, still in output
      (2L, "too short for any shingle", "en", "src03", 25L),
      // the holdout doc itself -> excluded from the output
      (3L, s"benchmark prompt $shared answer key", "en", "src18", 60L),
      // second holdout doc sharing a DIFFERENT 8-gram with train doc 4
      (4L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", "en", "src19", 55L),
      (5L, "prefix nine ten eleven twelve thirteen fourteen fifteen sixteen suffix", "en", "src04", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("overlaps are counted per distinct shingle; short and clean docs report 0") {
    val got = Text.q45Decontaminate(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Set(
      (0L, 1L, 1), // shared 8-gram appears twice in the doc, counted once
      (1L, 0L, 0),
      (2L, 0L, 0), // < 8 words: no shingles, but the doc is still reported
      (5L, 1L, 1)) // overlap with the second holdout source
    assert(got === expected) // holdout docs 3 and 4 must NOT appear
  }

  test("a 9-word run shared with holdout yields two overlapping 8-grams") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q45gram").toString
    val run9 = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    Seq(
      (0L, s"pad $run9 pad", "en", "src01", 40L),
      (1L, run9, "en", "src18", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val row = Text.q45Decontaminate(spark, dir).collect()
    assert(row.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ===
      Set((0L, 2L, 1)))
  }

  test("tokenization is case/punctuation-insensitive, matching the corpus ops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q45tok").toString
    Seq(
      (0L, "One, TWO; three-four FIVE six? seven! eight.", "en", "src01", 45L),
      (1L, "one two three four five six seven eight", "en", "src18", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val row = Text.q45Decontaminate(spark, dir).collect()
    assert(row.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ===
      Set((0L, 1L, 1)))
  }

  test("the holdout shingle set joins broadcast") {
    // the whole 100 TB story: holdout is benchmark-sized, so the overlap
    // join must not shuffle the train shingle table against it
    val p = Text.q45Decontaminate(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"holdout join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q100 semantic decon discriminates, and the banded swap is contained") {
    import org.apache.spark.sql.functions._
    val exact = graft.operators.Similarity
      .q100SemanticDecon(spark, TestSpark.Sf0001).collect()
    assert(exact.nonEmpty)
    val flagged = exact.filter(_.getAs[Int]("contaminated") == 1)
    assert(flagged.nonEmpty, "threshold flags nothing — not a gate")
    assert(flagged.length < exact.length, "threshold flags everything")
    // flag agrees with the rounded-compare rule row by row
    exact.foreach { r =>
      assert((r.getAs[Double]("max_sim") >= 0.34) ===
        (r.getAs[Int]("contaminated") == 1), r.toString)
    }

    // the holdout-too-big swap: banded candidates, exact rerank. Every
    // banded flag must be an exact flag (a missed pair only LOWERS the
    // banded max), and recall over the exact-flagged set stays usable
    import graft.functions.VectorOps._
    val e = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val train = e.filter(col("vec_id") % 10 =!= 7)
    val hold = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("h_id"), col("v").as("hv"))
    val banded = graft.operators.Similarity
      .semanticDeconBandedOn(train, hold).collect()
    assert(banded.length === exact.length, "banded path lost train rows")
    val exactFlag = exact.filter(_.getAs[Int]("contaminated") == 1)
      .map(_.getLong(0)).toSet
    val bandedFlag = banded.filter(_.getAs[Int]("contaminated") == 1)
      .map(_.getLong(0)).toSet
    assert(bandedFlag.subsetOf(exactFlag),
      s"banded flagged non-contaminated ids: ${bandedFlag -- exactFlag}")
    // at the q44 dense-threshold parameters (2 bits x 24 bands,
    // P(miss) ~ 1.4e-5 per pair at cos 0.34) the banded meet should find
    // essentially every flagged pair
    val recall = if (exactFlag.isEmpty) 1.0
      else bandedFlag.size.toDouble / exactFlag.size
    assert(recall >= 0.9, s"banded recall $recall too low at q44 params")
    // a banded max can never exceed the exact max for the same vector
    val exactSim = exact.map(r => r.getLong(0) -> r.getAs[Double]("max_sim")).toMap
    banded.foreach { r =>
      Option(r.getAs[java.lang.Double]("max_sim")).foreach { ms =>
        assert(ms <= exactSim(r.getLong(0)) + 1e-9, r.toString)
      }
    }
  }
}
