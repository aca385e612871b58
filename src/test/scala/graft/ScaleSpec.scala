package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** The 100 TB techniques behave as advertised: salted aggregation is exact
  * under skew, and bucketed tables join without an exchange.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted aggregation is exact on a pathologically skewed key") {
    import spark.implicits._
    // 90% of rows on one key — the hot-key shape
    val skewed = spark.range(100000)
      .select(
        when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
        (col("id") % 100).cast("double").as("m"))
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("m").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedSumCount(skewed, Seq("k"), "m", salt = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
    // and the hot key is genuinely spread in phase 1: >1 partial group
    val partials = skewed.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(partials > 1, s"hot key not spread: $partials partial group(s)")
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = TestSpark.Sf0001
    Scale.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    Scale.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
      "b_orders", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // same join over the raw (unbucketed) parquet DOES shuffle
      val raw = Tables.load(spark, dir, "lineitem").select("l_orderkey")
        .join(Tables.load(spark, dir, "orders").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
      // and the numbers agree
      assert(joined.count() ===
        Tables.load(spark, dir, "lineitem")
          .join(Tables.load(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
