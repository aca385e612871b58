package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{FetchResult, Got, Page, RetryAfter}
import graft.sources.{CursorOffset, CursorPagedSource}

/** The DSv2 streaming source: cursor-as-offset semantics, A6 pagination
  * vectors through a real streaming query, per-trigger page limits, and
  * offset JSON round-trip (what the checkpoint log persists).
  */
class CursorPagedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("A6 vectors through a streaming query: 429 retried, pages in order") {
    val calls = new AtomicInteger(0)
    CursorPagedSource.register("a6", c => (calls.incrementAndGet(), c) match {
      case (1, "*") => RetryAfter(0)
      case (_, "*") => Got(Page(Seq("""{"n":1}""", """{"n":2}"""), Some("abc")))
      case (_, "abc") => Got(Page(Seq("""{"n":3}"""), None))
      case (_, other) => fail(s"unexpected cursor $other")
    })
    val q = spark.readStream
      .format("graft.sources.CursorPagedSource")
      .option("fetcher", "a6")
      .option("maxPagesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cursor_src")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cursor_src").collect().map(_.getString(0))
      assert(rows.toSeq === Seq("""{"n":1}""", """{"n":2}""", """{"n":3}"""))
      // 1 retry + 2 successful pages
      assert(calls.get() === 3)
    } finally q.stop()
  }

  test("maxPagesPerTrigger bounds each micro-batch (backpressure)") {
    CursorPagedSource.register("paged", c =>
      if (c.length < 5) Got(Page(Seq(c), Some(c + "+"))) else Got(Page(Seq(c), None)))
    val q = spark.readStream
      .format("graft.sources.CursorPagedSource")
      .option("fetcher", "paged")
      .option("maxPagesPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("cursor_paged")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cursor_paged").collect().map(_.getString(0))
      assert(rows.toSeq === Seq("*", "*+", "*++", "*+++", "*++++"))
      // 5 pages at ≤2/trigger ⇒ at least 3 micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the whole feed in trigger-sized batches") {
    CursorPagedSource.register("avnow", c =>
      if (c.length < 7) Got(Page(Seq(c), Some(c + "+"))) else Got(Page(Seq(c), None)))
    val q = spark.readStream
      .format("graft.sources.CursorPagedSource")
      .option("fetcher", "avnow")
      .option("maxPagesPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("cursor_avnow")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val rows = spark.table("cursor_avnow").collect().map(_.getString(0))
      // 7 pages ("*" through "*++++++") — ALL ingested, not just one trigger's worth
      assert(rows.toSeq === (0 to 6).map(i => "*" + "+" * i))
    } finally q.stop()
  }

  test("restart resumes at the checkpointed cursor, no re-pull, no duplicates") {
    val base = java.nio.file.Files.createTempDirectory("graft_resume").toString
    def fourPages(allowed: Set[String]): String => FetchResult = c => {
      assert(allowed(c), s"refetched already-committed cursor '$c' after restart")
      c match {
        case "*" => Got(Page(Seq("r0"), Some("c1")))
        case "c1" => Got(Page(Seq("r1"), Some("c2")))
        case "c2" => Got(Page(Seq("r2"), Some("c3")))
        case "c3" => Got(Page(Seq("r3"), None))
      }
    }
    def run(name: String, maxPages: Int): Seq[String] = {
      val q = spark.readStream
        .format("graft.sources.CursorPagedSource")
        .option("fetcher", "resume")
        .option("maxPagesPerTrigger", "1")
        .option("maxPages", maxPages.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try { q.processAllAvailable() } finally q.stop()
      spark.read.parquet(s"$base/out").collect().map(_.getString(0)).toSeq.sorted
    }
    // run 1: bounded to 2 pages, commits offset (pages=2, cursor=c2)
    CursorPagedSource.register("resume", fourPages(Set("*", "c1", "c2")))
    assert(run("r1", 2) === Seq("r0", "r1"))
    // run 2: NEW stream instance, same checkpoint; the fetcher now refuses
    // the committed-range cursors — resumption must start at c2
    CursorPagedSource.register("resume", fourPages(Set("c2", "c3")))
    assert(run("r2", 4) === Seq("r0", "r1", "r2", "r3"))
  }

  test("offset JSON round-trips, including cursors needing escapes") {
    for (o <- Seq(
        CursorOffset(0, Some("*")),
        CursorOffset(42, None),
        CursorOffset(7, Some("""cu"rs\or""")))) {
      assert(CursorOffset.fromJson(o.json()) === o)
    }
  }
}
