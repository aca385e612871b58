package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Volume proof for star-contraction connected components: the round
  * count must stay logarithmic and the wall time near-linear when the
  * edge list grows 10×, on a graph that mixes the two adversarial
  * shapes — deep chains (diameter stress) and a high-degree hub (skew
  * stress). Label propagation would need ~diameter rounds here; the
  * contraction's maxIter bound doubles as the round-count assertion.
  */
class ComponentScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic mixed-shape graph over `n` vertices, built
    * distributed (no driver-side edge list):
    *  - 100 parallel chains of n/100 vertices each (vertex v links to
    *    v+100 — long paths, ids interleaved so chain order is not id
    *    order),
    *  - n/200 vertices at stride 199 also link to vertex 0 (hub).
    *    199 ≡ 99 (mod 100) is coprime to 100, so the stitches cycle
    *    through every chain residue, fusing all chains into ONE
    *    component around a skewed-degree hub.
    */
  private def synth(n: Int): DataFrame = {
    val chains = spark.range(n - 100)
      .select(col("id").as("doc_a"), (col("id") + 100).as("doc_b"))
    val hub = spark.range(n / 200)
      .select((col("id") * 199).as("doc_a"), lit(0L).as("doc_b"))
    chains.union(hub)
  }

  test("one skewed component: 10x edges, logarithmic rounds, ~linear time", Slow) {
    // the round-count bound pins the DISTRIBUTED contraction loop — force
    // it (r18: graphs under spark.graft.cc.localEdgeMax otherwise finish
    // by in-driver union-find and never run a round)
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    def run(n: Int): Double = {
      val t0 = System.nanoTime()
      // maxIter = 18 IS the round-count assertion: contraction needs
      // ~log2(n) + small-constant rounds (n = 200k → ~18); propagation
      // would need ~n/100 ≈ diameter rounds and fail the require
      val labels = Dedup.connectedComponents(synth(n), maxIter = 18)
      val byLabel = labels.groupBy("cluster").count().collect()
      assert(byLabel.length === 1, s"expected one component, got ${byLabel.length}")
      assert(byLabel.head.getLong(0) === 0L)
      assert(byLabel.head.getLong(1) === n.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    val tSmall = run(20000)
    val tBig = run(200000)
    spark.conf.unset("spark.graft.cc.localEdgeMax")
    // rounds grow by ~log2(10) ≈ 3 and per-round work by ≤ 10×; allow
    // generous headroom for fixed per-job overhead and machine noise,
    // while still refusing anything superlinear-squared
    assert(tBig / tSmall < 12.0,
      f"10x edges cost ${tBig / tSmall}%.1fx wall time ($tSmall%.1fs -> $tBig%.1fs)")
  }
}
