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

  test("DotProductI8: codegen == interpreted == JVM loop, same NULL contract") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "label STRING, a ARRAY<TINYINT>, b ARRAY<TINYINT>")
    // element type is Any so a NULL element can ride in the fixture
    val fixture = Seq(
      Row("plain", Seq[Any](1.toByte, 2.toByte, 3.toByte), Seq[Any](4.toByte, 5.toByte, 6.toByte)),
      Row("extremes", Seq[Any](127.toByte, (-128).toByte, 127.toByte),
        Seq[Any]((-128).toByte, (-128).toByte, 127.toByte)),
      Row("empty_both", Seq.empty[Any], Seq.empty[Any]),
      Row("len_mismatch", Seq[Any](1.toByte, 2.toByte), Seq[Any](1.toByte)),
      Row("null_left", null, Seq[Any](1.toByte)),
      Row("null_element", Seq[Any](1.toByte, null), Seq[Any](1.toByte, 2.toByte)))
    val df = spark.createDataFrame(fixture.asJava, schema)
    def expected(a: scala.collection.Seq[Any], b: scala.collection.Seq[Any]): Any =
      if (a == null || b == null || a.length != b.length ||
        a.contains(null) || b.contains(null)) null
      else a.zip(b).map { case (x, y) =>
        x.asInstanceOf[Byte].toLong * y.asInstanceOf[Byte].toLong }.sum
    def run(): Unit = {
      val out = df.withColumn("d", VectorOps.dotI8(col("a"), col("b")))
        .collect()
      out.foreach { r =>
        val want = expected(
          Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Any]]).orNull,
          Option(r.get(2)).map(_.asInstanceOf[scala.collection.Seq[Any]]).orNull)
        assert(r.get(3) == want, s"${r.getString(0)}: got ${r.get(3)}, want $want")
      }
    }
    withCodegenExercised(run())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("PqAdc: codegen == interpreted == the HOF unpack, addressed-slot NULL contract") {
    import scala.jdk.CollectionConverters._
    val (m, ks) = (4, 4)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "label STRING, lut ARRAY<DOUBLE>, packed BIGINT")
    val full: Seq[Any] = (0 until m * ks).map(i => 0.5 * i)
    // codes (1, 2, 3, 0) -> packed = 1 + 2*4 + 3*16 = 57; addressed
    // positions {1, 6, 11, 12}
    val fixture = Seq(
      Row("plain", full, 57L),
      Row("zero_codes", full, 0L),
      Row("max_codes", full, (math.pow(ks, m) - 1).toLong),
      Row("null_lut", null, 57L),
      Row("null_slot_unaddressed", full.updated(5, null), 57L),
      Row("null_slot_addressed", full.updated(6, null), 57L))
    val df = spark.createDataFrame(fixture.asJava, schema)
    def run(): Unit = {
      val out = df
        .withColumn("fast", VectorOps.pqAdc(col("lut"), col("packed"), m, ks))
        .withColumn("hof", VectorOps.pqAdcHof(col("lut"), col("packed"), m, ks))
        .collect()
      out.foreach(r => assert(r.get(3) == r.get(4),
        s"${r.getString(0)}: fast=${r.get(3)} hof=${r.get(4)}"))
      // absolute spot-checks so both sides can't be wrong together
      val byLabel = out.map(r => r.getString(0) -> r.get(3)).toMap
      assert(byLabel("plain") == 0.5 * (1 + 6 + 11 + 12))
      assert(byLabel("zero_codes") == 0.5 * (0 + 4 + 8 + 12))
      assert(byLabel("max_codes") == 0.5 * (3 + 7 + 11 + 15))
      assert(byLabel("null_lut") == null)
      assert(byLabel("null_slot_unaddressed") == 0.5 * (1 + 6 + 11 + 12))
      assert(byLabel("null_slot_addressed") == null)
    }
    withCodegenExercised(run())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // kernel-only (the HOF's ANSI element_at would throw instead): a code
    // addressing past a short LUT degrades to NULL, never an error
    val short = spark.createDataFrame(
      Seq(Row("short_lut", (0 until 8).map(i => 0.5 * i): Seq[Any], 57L)).asJava, schema)
    val got = withCodegenExercised {
      short.withColumn("fast", VectorOps.pqAdc(col("lut"), col("packed"), m, ks))
        .collect()(0).get(3) }
    assert(got == null)
  }

  test("quantizeI8 maps the max-|x| lane to ±127 and cancels scale in cosine") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("v ARRAY<DOUBLE>")
    val df = spark.createDataFrame(Seq(
      Row(Seq(0.5, -1.0, 0.25)),  // max |x| = 1.0 → (64, -127, 32)
      Row(Seq(0.0, 0.0)),         // zero vector → zeros
      Row(Seq(2000.0, -4000.0))   // scale >> 1 → (64, -127)
    ).asJava, schema)
    val got = df.select(VectorOps.quantizeI8(col("v")).as("q")).collect()
      .map(_.getSeq[Byte](0).toSeq)
    assert(got(0) === Seq[Byte](64, -127, 32))
    assert(got(1) === Seq[Byte](0, 0))
    assert(got(2) === Seq[Byte](64, -127))
    // self-cosine of any non-zero quantized vector is exactly 1
    val selfCos = df.limit(1)
      .select(VectorOps.quantizeI8(col("v")).as("q"))
      .select((VectorOps.dotI8(col("q"), col("q")).cast("double") /
        (sqrt(VectorOps.dotI8(col("q"), col("q")).cast("double")) *
          sqrt(VectorOps.dotI8(col("q"), col("q")).cast("double")))).as("c"))
      .head().getDouble(0)
    assert(math.abs(selfCos - 1.0) < 1e-12)
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
