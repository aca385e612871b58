package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** q12's corpus pass is vacuous at sf0.01 (no customer lacks orders), so
  * the anti-join semantics are pinned here on constructed data where the
  * result set is non-empty.
  */
class AntiJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("left-anti join returns exactly the customers with no orders") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_anti").toString
    Seq(
      (1L, "C1", 0, 0.0, "SEG"),
      (2L, "C2", 0, 0.0, "SEG"),
      (3L, "C3", 0, 0.0, "SEG"),
      (4L, "C4", 0, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((10L, 2L), (11L, 2L), (12L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")

    val out = Relational.q12AntiJoin(spark, dir)
      .as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 3L))
  }
}
