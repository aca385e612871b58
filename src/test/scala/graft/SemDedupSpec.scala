package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.functions.VectorOps._

/** SemDeDup's contract (q79 is spec-gated, not oracled — the Lloyd mean
  * is a floating-point average, the q36 caveat): the keep rule, the
  * within-cell containment property, and real pruning on the fixture.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vectors = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))

  test("every vector reports once; exactly one keep per semantic group") {
    val out = Dedup.q79SemDedup(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length === vectors.count())
    assert(out.map(_._1).distinct.length === out.length)
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._4 == 1) === 1, s"group $c keep count")
      // the survivor is the centroid-FARTHEST member (lowest similarity),
      // ties to the lowest id — the paper's keep-the-outlier rule
      val kept = members.find(_._4 == 1).get
      val best = members.minBy(m => (m._3, m._1))
      assert(kept._1 === best._1, s"group $c kept ${kept._1}, outlier ${best._1}")
    }
    // the fixture actually prunes: multi-member groups exist, and most
    // vectors are semantically unique (near-random corpus)
    val multi = byCluster.values.count(_.length > 1)
    assert(multi > 0, "no semantic group has more than one member")
    assert(out.count(_._4 == 1) > out.length / 2)
  }

  test("within-cell containment: every same-cell pair >= eps shares a group") {
    val eps = 0.34
    val home = Similarity.homeCells(vectors, nCells = 8, cellCap = 4096,
      kmeansRounds = 1)
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val groups = Dedup.q79SemDedup(spark, TestSpark.Sf0001)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force threshold pairs (the q40 primitive)
    val e = vectors
    val pairs = e.select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(broadcast(e.select(col("vec_id").as("b"), col("v").as("vb"))))
      .filter(col("a") < col("b"))
      .filter(cosine(col("va"), col("vb")) >= eps)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no threshold pairs at all")
    val sameCell = pairs.filter { case (x, y) => home(x) == home(y) }
    assert(sameCell.nonEmpty,
      "no threshold pair shares a cell — containment check is vacuous")
    sameCell.foreach { case (x, y) =>
      assert(groups(x) === groups(y), s"same-cell pair ($x, $y) split groups")
    }
  }
}
