package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CursorSource, FetchResult, Got, Page, RetryAfter}

/** FIXTURES.md A6 (reference tests/unit/test_openalex_client.py:37-58):
  * 429 (Retry-After 0) → page [1,2] cursor "abc" → page [3] cursor null
  * must yield [1,2,3] in order, retrying the SAME cursor after the 429.
  */
class CursorSourceSpec extends AnyFunSuite {

  test("429 retries same cursor; pagination follows next_cursor to exhaustion") {
    var calls = Vector.empty[String]
    var slept = Vector.empty[Int]
    val responses = Iterator[FetchResult](
      RetryAfter(0),
      Got(Page(Seq("1", "2"), Some("abc"))),
      Got(Page(Seq("3"), None)))
    val src = new CursorSource(
      fetch = c => { calls :+= c; responses.next() },
      sleeper = s => slept :+= s)
    assert(src.records.toList === List("1", "2", "3"))
    assert(calls === Vector("*", "*", "abc")) // 429 did not advance the cursor
    assert(slept === Vector(0)) // honored Retry-After
  }

  test("maxPages stops iteration even with a live cursor") {
    val src = new CursorSource(
      fetch = c => Got(Page(Seq(c), Some(c + "+"))),
      maxPages = Some(3))
    assert(src.records.toList === List("*", "*+", "*++"))
  }
}
