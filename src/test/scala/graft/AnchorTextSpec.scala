package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Crawl

/** Q151's majority-anchor contract on a HAND-BUILT micro-corpus:
  * known in-degrees, a forced count tie broken lexicographically,
  * and the hub aggregation.
  */
class AnchorTextSpec extends AnyFunSuite {

  private def run() = {
    val spark = TestSpark.spark
    import spark.implicits._
    // ids chosen so all three docs share the /x/ target of doc 39:
    // (39+1)%40 = 0 -> https://site0.example.com/x/...; simpler: read
    // the hub, which EVERY page links with its first word
    val docs = Seq(
      (0L, "spark fast query engine extra"),
      (2L, "spark slow filter scan extra"),
      (4L, "table big merge sort extra"),
      (6L, "query big merge sort extra")).toDF("doc_id", "text")
    Crawl.anchorTextOn(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
  }

  test("hub counts every page; majority anchor wins") {
    val hub = run()("https://hub.example.com/home")
    // anchors: spark, spark, table, query -> 4 links, 3 spellings
    assert(hub._1 === 4L && hub._2 === 3L)
    assert(hub._3 === "spark" && hub._4 === 2L)
  }

  test("a count tie breaks to the lexicographically smallest anchor") {
    // docs 4 and 6 share (id%40, id%10) classes? no — their /r/
    // targets differ (r/4 vs r/6). The hub tie case: remove spark docs
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "zeta a b c d"),
      (2L, "alpha a b c d")).toDF("doc_id", "text")
    val hub = Crawl.anchorTextOn(docs).collect()
      .filter(_.getString(0) == "https://hub.example.com/home").head
    assert(hub.getLong(1) === 2L && hub.getLong(2) === 2L)
    assert(hub.getString(3) === "alpha", "tie at 1-1 -> smallest text")
    assert(hub.getLong(4) === 1L)
  }

  test("per-target in-degree and two-word anchors land") {
    val m = run()
    // doc 0: /x/ target of site1, anchor "fast query"
    val x0 = m("https://site1.example.com/x/0")
    assert(x0 === ((1L, 1L, "fast query", 1L)))
    // doc 4: /r/ target site4/r/4, anchor = 4th word "sort"
    val r4 = m("https://site4.example.com/r/4")
    assert(r4 === ((1L, 1L, "sort", 1L)))
  }
}
