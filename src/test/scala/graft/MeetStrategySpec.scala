package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Text, VocabMeet}

/** The documented broadcast→bloom/shuffle swaps are tested CODE PATHS,
  * not prose: each strategy pair must produce IDENTICAL rows (the bloom
  * path's exact confirm kills its false positives; a bloom has no false
  * negatives, so the bypass never loses a member), and each path must
  * plan as advertised — broadcast keeps the corpus unshuffled, bloom
  * probes the sketch below a SHUFFLED exact confirm (q63's shape).
  */
class MeetStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q67 line dedup: bloom path is row-identical to broadcast") {
    val lined = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), graft.functions.TextOps.words(col("text")).as("_ws"))
      .select(col("doc_id"),
        Text.synthLinesFromWs(col("doc_id"), col("_ws")).as("lines"))
    val bc = Text.lineDedupOn(lined, meet = VocabMeet.Broadcast)
    val bl = Text.lineDedupOn(lined, meet = VocabMeet.Bloom)
    assert(rows(bl) === rows(bc))
    // and the bloom path planned as q63's shape: sketch probe below a
    // shuffled exact confirm, never a broadcast of the dup vocabulary
    val p = plan(bl)
    assert(p.contains("might_contain"), s"bloom probe missing:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"exact confirm not shuffled:\n$p")
  }

  test("q68 blocklist: bloom path is row-identical to broadcast") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val bc = Text.urlBlocklistOn(spark, docs, meet = VocabMeet.Broadcast)
      .select("doc_id", "url", "host", "registered_domain", "blocked")
    val bl = Text.urlBlocklistOn(spark, docs, meet = VocabMeet.Bloom)
      .select("doc_id", "url", "host", "registered_domain", "blocked")
    assert(rows(bl) === rows(bc))
    val p = plan(bl)
    assert(p.contains("might_contain"), s"bloom probe missing:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"exact confirm not shuffled:\n$p")
    // the broadcast path's zero-shuffle pin lives in PlanAuditSpec; here
    // pin only that IT still broadcasts (the strategies must not collapse)
    assert(plan(bc).contains("BroadcastHashJoin"))
  }

  test("q81 bigram surprisal: shuffled model joins are row-identical to broadcast") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val bc = Text.bigramSurprisalOn(docs, meet = VocabMeet.Broadcast)
    val sh = Text.bigramSurprisalOn(docs, meet = VocabMeet.Shuffle)
    assert(rows(sh) === rows(bc))
    // the shuffled path must not silently re-broadcast the MODEL joins
    // (the whole point is the model outgrew the driver) — all three stay
    // shuffled; the final doc-keyed stitch may do what AQE likes
    val p = plan(sh)
    val shuffledJoins = "ShuffledHashJoin".r.findAllIn(p).length +
      "SortMergeJoin".r.findAllIn(p).length
    assert(shuffledJoins >= 3,
      s"expected 3 shuffled model joins, found $shuffledJoins:\n$p")
  }

  test("a value-carrying meet rejects the bloom strategy at plan time") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    assertThrows[IllegalArgumentException] {
      Text.bigramSurprisalOn(docs, meet = VocabMeet.Bloom)
    }
  }

  test("empty rule table: bloom path degenerates to no members, exactly") {
    import spark.implicits._
    val stream = spark.range(100).select(col("id"),
      concat(lit("k"), col("id") % 7).as("key"))
    val empty = Seq.empty[String].toDF("key").withColumn("_hit", lit(1))
    val out = VocabMeet.membership(stream, empty, "key", "_hit", VocabMeet.Bloom)
    assert(out.filter(col("_hit").isNotNull).count() === 0)
    assert(out.count() === 100)
  }
}
