package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

/** Parity gate for the codegen'd LshBits kernel: the signature must be
  * BIT-FOR-BIT what the interpreted transform/aggregate/zip_with
  * formulation (`lshBitsHof`, the implementation bandAssignments shipped
  * through round 6) produces — that identity is what lets every
  * empirically-pinned recall (AnnRecallSpec, EmbedNearDupSpec) transfer
  * to the kernel without re-measurement.
  */
class LshKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withCodegenExercised[A](f: => A): A = {
    // see VectorKernelSpec: keep ConvertToLocalRelation from folding the
    // fixture before doGenCode runs
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try f finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def cases = {
    import scala.jdk.CollectionConverters._
    val rng = new scala.util.Random(7)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "label STRING, v ARRAY<DOUBLE>")
    val rows = Seq(
      Row("null_vector", null),
      Row("empty", Seq.empty[Double]),
      Row("null_element", Seq(1.0, null, 3.0)),
      Row("single", Seq(-2.5)),
      Row("zeros", Seq.fill(8)(0.0)),
      // non-finite coverage (ADVICE r6): a NaN element makes every plane's
      // sum NaN — the kernel's !(s < 0) must take the same '1' branch as
      // the HOF's Spark SQL `proj >= 0` (NaN is greatest). Infinities sum
      // to ±Inf per plane (ordinary comparisons), and the mixed row can hit
      // Inf + -Inf = NaN on some planes — identical double arithmetic on
      // both sides either way.
      Row("nan_element", Seq(1.0, Double.NaN, 3.0)),
      Row("pos_inf", Seq(Double.PositiveInfinity, 1.0, -2.0)),
      Row("inf_nan_mix", Seq(Double.PositiveInfinity, Double.NegativeInfinity)),
    ) ++ (0 until 20).map(k =>
      Row(s"rand$k", Seq.fill(64)(rng.nextGaussian())))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("LshBits matches the HOF formulation bit-for-bit (48 planes)") {
    val out = withCodegenExercised { cases
      .withColumn("fast", VectorOps.lshBits(col("v"), 48))
      .withColumn("hof", concat_ws("", VectorOps.lshBitsHof(col("v"), 48)))
      // HOF on a NULL vector: transform(NULL) is NULL -> concat_ws("")
      // renders the empty string; align the kernel's NULL for compare
      .withColumn("hof", when(col("v").isNull, lit(null)).otherwise(col("hof")))
      .select("label", "fast", "hof")
      .collect() }
    out.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"${r.getString(0)}: fast=${r.get(1)} hof=${r.get(2)}")
    }
    // structural spot checks so both sides can't drift together
    val byLabel = out.map(r => r.getString(0) -> r.get(1)).toMap
    assert(byLabel("null_vector") == null)
    assert(byLabel("empty") == "0" * 48, "empty vector must poison to all-zero")
    assert(byLabel("null_element") == "0" * 48, "null element must poison to all-zero")
    assert(byLabel("zeros") == "1" * 48, "zero sums take the >= 0 branch")
    assert(byLabel("nan_element") == "1" * 48,
      "NaN sums must take the '1' branch (Spark NaN-is-greatest semantics)")
    val r0 = byLabel("rand0").asInstanceOf[String]
    assert(r0.length == 48 && r0.forall(c => c == '0' || c == '1'))
    assert(r0.contains('0') && r0.contains('1'),
      "a random 64-dim vector yielding constant bits means the hash chain broke")
  }

  test("parity holds on the interpreted eval path too") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out = cases
        .withColumn("fast", VectorOps.lshBits(col("v"), 16))
        .withColumn("hof", concat_ws("", VectorOps.lshBitsHof(col("v"), 16)))
        .withColumn("hof", when(col("v").isNull, lit(null)).otherwise(col("hof")))
        .collect()
      out.foreach(r => assert(r.get(2) == r.get(3), s"${r.getString(0)}"))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("the kernel carries the band assignment inside whole-stage codegen") {
    val vecs = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("v"))
    val p = graft.operators.Similarity.bandAssignments(vecs, "v", 3, 8, 4096)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_lsh_bits"), s"band assignment lost the kernel:\n$p")
  }
}
