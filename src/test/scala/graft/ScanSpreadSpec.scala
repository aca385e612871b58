package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.loadSpread]] — the scan-parallelism floor for kernel-pipeline
  * consumers (r18): fires only when the file's estimated split count
  * cannot fill defaultParallelism AND the file clears the size floor;
  * partitions by a DETACHED key (xxhash64 of the primary key) so no
  * downstream exchange (or its self-join reuse) is deleted; row set is
  * unchanged; `spark.graft.scan.spread=off` disables it.
  */
class ScanSpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("below the size floor the spread is a no-op (sf0.001 documents)") {
    val p = plan(Tables.loadSpread(spark, TestSpark.Sf0001, "documents"))
    assert(!p.contains("Exchange"), s"spread fired under the floor:\n$p")
  }

  test("forced spread adds exactly one detached-key exchange and keeps rows") {
    spark.conf.set("spark.graft.scan.spreadMinBytes", "1")
    try {
      val df = Tables.loadSpread(spark, TestSpark.Sf0001, "documents")
      val p = plan(df)
      assert("Exchange hashpartitioning\\(xxhash64".r.findAllIn(p).length === 1,
        s"expected exactly one xxhash64 spread exchange:\n$p")
      assert(df.rdd.getNumPartitions ===
        spark.sparkContext.defaultParallelism)
      val plain = Tables.load(spark, TestSpark.Sf0001, "documents")
      assert(df.count() === plain.count())
      // row SET unchanged (ids are unique, so id-set equality + count is
      // full-row-set equality for this immutable table)
      assert(df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      // kill switch
      spark.conf.set("spark.graft.scan.spread", "off")
      try {
        val off = plan(Tables.loadSpread(spark, TestSpark.Sf0001, "documents"))
        assert(!off.contains("Exchange"), "spread=off did not disable")
      } finally spark.conf.unset("spark.graft.scan.spread")
    } finally spark.conf.unset("spark.graft.scan.spreadMinBytes")
  }

  test("pushed filters still reach the parquet scan through the spread") {
    spark.conf.set("spark.graft.scan.spreadMinBytes", "1")
    try {
      val df = Tables.loadSpread(spark, TestSpark.Sf0001, "documents")
        .where(org.apache.spark.sql.functions.col("doc_id") < 50)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(formatted.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]"),
        s"filter did not push through the spread exchange:\n$formatted")
    } finally spark.conf.unset("spark.graft.scan.spreadMinBytes")
  }
}
