package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Connected-components semantics on constructed graphs (the corpus pair
  * graph is whatever LSH finds; these pin the algorithm itself).
  */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles and singleton pairs resolve to min-id components") {
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    val labels = cc((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L))
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("q40 embedding near-dup clusters: labels are canonical member minima") {
    val rows = Dedup.q40EmbedNearDup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // deterministic corpus → deterministic structure (cross-checked in
    // DuckDB: 358 paired vectors in 39 components at threshold 0.34)
    assert(rows.length === 358)
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.size === 39)
    // every label is the component's minimum member id
    byCluster.foreach { case (label, members) =>
      assert(members.map(_._1).min === label)
    }
  }

  test("a long path needs multiple propagation rounds and still converges") {
    // path 0-1-2-...-12: diameter forces several iterations
    val edges = (0L until 12L).map(i => (i, i + 1))
    val labels = cc(edges: _*)
    assert(labels.values.toSet === Set(0L))
    assert(labels.size === 13)
  }

  test("canonical-keeper property: exactly one member per cluster keeps itself") {
    val labels = cc((5L, 6L), (6L, 7L), (30L, 31L))
    val keepers = labels.filter { case (d, c) => d == c }.keySet
    assert(keepers === Set(5L, 30L))
  }
}
