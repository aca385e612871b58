package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Text}

/** q31 has no SQL oracle (HLL++ estimate); its contract is agreement with
  * the exact distinct count (q20) within HLL++'s default error bound.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact distinct (q20)") {
    val exact = Text.q20DistinctAgg(spark, TestSpark.Sf0001)
      .selectExpr("distinct_texts").head().getLong(0)
    val approx = Dedup.q31ApproxDistinct(spark, TestSpark.Sf0001)
      .head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05,
      s"approx=$approx exact=$exact relative error $relErr > 5%")
  }
}
