package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

/** Parity gate for the codegen'd DotProduct kernel: every edge case must
  * produce EXACTLY what the interpreted zip_with/aggregate formulation
  * (`dotHof`, the pre-round-4 implementation) produces, on both the
  * codegen and interpreted (eval) paths.
  */
class VectorKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Local relations get their projections constant-folded by
    * `ConvertToLocalRelation` at optimize time — which would evaluate the
    * kernel INTERPRETED and never exercise doGenCode. Exclude the rule so
    * the fixture rows flow through a real codegen'd stage.
    */
  private def withCodegenExercised[A](f: => A): A = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try f finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def cases = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "label STRING, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    val rows = Seq(
      Row("plain", Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      Row("negatives", Seq(-1.5, 0.0, 2.5), Seq(3.0, -4.0, 0.5)),
      Row("empty_both", Seq.empty[Double], Seq.empty[Double]),
      Row("len_mismatch", Seq(1.0, 2.0), Seq(1.0)),
      Row("null_left", null, Seq(1.0)),
      Row("null_right", Seq(1.0), null),
      Row("null_element", Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)),
      Row("null_elem_right", Seq(1.0, 2.0), Seq(null, 2.0)),
      Row("single", Seq(7.0), Seq(-0.25)),
    )
    spark.createDataFrame(rows.asJava, schema)
  }

  test("DotProduct matches the zip_with/aggregate formulation on all edge cases") {
    val out = withCodegenExercised { cases
      .withColumn("fast", VectorOps.dot(col("a"), col("b")))
      .withColumn("hof", VectorOps.dotHof(col("a"), col("b")))
      .select("label", "fast", "hof")
      .collect() }
    out.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"${r.getString(0)}: fast=${r.get(1)} hof=${r.get(2)}")
    }
    // spot-check an absolute value so both sides can't be wrong together
    val plain = out.find(_.getString(0) == "plain").get
    assert(plain.getDouble(1) == 32.0)
  }

  test("parity holds on the interpreted path too (codegen disabled)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out = cases
        .withColumn("fast", VectorOps.dot(col("a"), col("b")))
        .withColumn("hof", VectorOps.dotHof(col("a"), col("b")))
        .collect()
      out.foreach(r => assert(r.get(3) == r.get(4), s"${r.getString(0)}"))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("norm is sqrt(dot(a,a)) including the empty-array zero") {
    val out = cases.filter(col("label").isin("plain", "empty_both"))
      .withColumn("n", VectorOps.norm(col("a")))
      .select("label", "n").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(math.abs(out("plain").asInstanceOf[Double] - math.sqrt(14.0)) < 1e-12)
    assert(out("empty_both").asInstanceOf[Double] == 0.0)
  }

  test("the kernel stays inside whole-stage codegen (plan audit)") {
    withCodegenExercised {
      val df = cases.withColumn("d", VectorOps.dot(col("a"), col("b")))
      import org.apache.spark.sql.execution.WholeStageCodegenExec
      val hasCodegenStage = df.queryExecution.executedPlan.exists {
        case _: WholeStageCodegenExec => true
        case _ => false
      }
      assert(hasCodegenStage, df.queryExecution.executedPlan.toString)
      df.collect() // force actual code generation + execution of the stage
    }
  }
}
