package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.VectorOps

/** Q44 — the UNBOUNDED embedding near-dup path (LSH candidates → exact
  * threshold re-rank → connected components). The DuckDB oracle proves
  * value parity; these pin the two properties the oracle can't see:
  *
  *  1. the exactness contract (candidate generation recalls EVERY
  *     brute-force threshold pair at the default parameters — the "IFF"
  *     in the operator's Scaladoc, checked as set containment, not a
  *     recall ratio), and
  *  2. the plan shape (no O(n²) pair join anywhere — the entire reason
  *     q44 exists next to the id-bounded q40).
  */
class EmbedNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vectors(dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("v"))

  /** Exact thresholded pairs via a brute-force id-ordered join — the
    * independent reference path (same shape as q40's bounded join).
    */
  private def brutePairs(dir: String, threshold: Double): Set[(Long, Long)] = {
    val e = vectors(dir).withColumn("nrm", VectorOps.norm(col("v")))
    val a = e.select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .filter(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exactness contract: candidates contain every brute-force pair >= 0.34") {
    // q44's defaults (2 bits x 24 bands, bucketCap 4096) must recall the
    // FULL exact pair set on the gated corpus — containment, not recall%:
    // one missed edge can merge or split a component and flip the oracle
    val expected = brutePairs(TestSpark.Sf0001, 0.34)
    assert(expected.nonEmpty, "fixture corpus has no threshold pairs — test is vacuous")
    val cand = Similarity.annCandidatePairs(vectors(TestSpark.Sf0001),
        nbits = 2, bands = 24, bucketCap = 4096)
      .filter(col("vec_id") < col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = expected -- cand
    assert(missed.isEmpty,
      s"LSH candidates missed ${missed.size}/${expected.size} exact pairs: " +
        missed.take(5).mkString(", "))
  }

  test("q44 clusters equal the brute-force clusters (full table, no id bound)") {
    import spark.implicits._
    val exact = Dedup.connectedComponents(
        brutePairs(TestSpark.Sf0001, 0.34).toSeq.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.q44EmbedNearDupFull(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
  }

  test("q44's plan has no quadratic pair join") {
    // the candidate self-join is keyed on (band, bucket); a refactor that
    // degrades it to a non-equi or nested-loop join re-introduces the
    // O(n²) enumeration the operator exists to avoid. Checked on the
    // pre-contraction pair pipeline (connectedComponents plans its loop
    // rounds lazily at execution, so the contract query's own plan only
    // shows round zero — the pair feed IS the scale-sensitive part).
    val pairs = Similarity.annCandidatePairs(vectors(TestSpark.Sf0001),
      nbits = 2, bands = 24, bucketCap = 4096)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "candidate join went cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate join went nested-loop")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no hash-equi join in candidate plan:\n$p")
  }
}
