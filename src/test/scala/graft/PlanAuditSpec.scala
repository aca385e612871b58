package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Similarity}

/** Physical-plan regressions locked in CI: filters reach the parquet scan,
  * projections prune the read schema, small dims broadcast, top-k plans as
  * TakeOrderedAndProject. A future edit that silently loses one of these
  * turns a map-side operator into a full-table cost at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q03 filter is pushed to the parquet scan") {
    val p = plan(Relational.q03Filter(spark, TestSpark.Sf0001))
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"))
  }

  test("q01 projection prunes the read schema to the 3 selected columns") {
    val p = plan(Relational.q01Project(spark, TestSpark.Sf0001))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id"))
    assert(readSchema.contains("event_type"))
    assert(readSchema.contains("value"))
    assert(!readSchema.contains("props"), s"props not pruned: $readSchema")
    assert(!readSchema.contains("user_id"), s"user_id not pruned: $readSchema")
  }

  test("q10 dims broadcast; q07 top-k avoids a global sort") {
    assert(plan(Relational.q10JoinDims(spark, TestSpark.Sf0001))
      .contains("BroadcastHashJoin"))
    assert(plan(Relational.q07TopK(spark, TestSpark.Sf0001))
      .contains("TakeOrderedAndProject"))
  }

  test("q26 vector lookups broadcast and top-k is group-limited below the shuffle") {
    val p = plan(Similarity.annCosine(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("q39 runs the JPEG marker walk exactly once per row") {
    // the packed-dims pre-projection must survive optimization: if
    // CollapseProject ever inlines it, the scan expression reappears once
    // per referencing output column
    val p = plan(graft.operators.Multimodal.q39PngMeta(spark, TestSpark.Sf0001))
    val occurrences = "graft_jpeg_dims".r.findAllIn(p).length
    assert(occurrences === 1, s"expected 1 graft_jpeg_dims in the plan, found $occurrences")
  }

  test("q42 reads only doc_id and lang; q41 pushes the doc_id bound to one scan") {
    val p42 = plan(graft.operators.Text.q42QuotaSample(spark, TestSpark.Sf0001))
    val rs = p42.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("lang"))
    assert(!rs.contains("text"), s"q42 reads text for a hash-of-id filter: $rs")
    val p41 = plan(graft.operators.Text.q41TfIdfTopTerms(spark, TestSpark.Sf0001))
    assert(p41.contains("LessThan(doc_id,100)"),
      "q41's tf-side doc_id bound must reach the parquet scan")
  }

  test("the codegen'd graft_dot kernel carries the vector queries") {
    // a refactor that silently falls back to the interpreted HOF twin
    // re-opens the r2/r3 ~100x ANN regression (BENCH_NOTES.md) — pin the
    // kernel's presence in every vector query's physical plan
    for ((name, df) <- Seq(
      "q19" -> Similarity.q19CosineTopK(spark, TestSpark.Sf0001),
      "q25" -> Similarity.q25TopPairs(spark, TestSpark.Sf0001),
      "q26" -> Similarity.annCosine(spark, TestSpark.Sf0001),
      "q36" -> Similarity.ivfCosine(spark, TestSpark.Sf0001))) {
      assert(plan(df).contains("graft_dot"), s"$name lost the codegen'd kernel")
    }
  }
}
