package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CacheEval

/** The RFC 9111 freshness walk on hand-spelled header blocks: the
  * precedence ladder, invalid-value fall-through, the
  * no-store/no-cache split, and name case/lookalike discipline.
  */
class CacheSpec extends AnyFunSuite {

  private val D = "Date: Mon, 15 Jan 2024 10:00:00 GMT\r\n"

  test("s-maxage outranks max-age for a shared cache") {
    val c = CacheEval.parse(D + "Cache-Control: max-age=100, s-maxage=50\r\n")
    assert(c.method === 1 && c.lifetime === 50L)
  }

  test("invalid delta-seconds falls through, never zeroes") {
    val c = CacheEval.parse(D +
      "Cache-Control: max-age=abc\r\n" +
      "Expires: Mon, 15 Jan 2024 11:00:00 GMT\r\n")
    assert(c.method === 3 && c.lifetime === 3600L)
  }

  test("no-store forbids caching; no-cache only forces revalidation") {
    val ns = CacheEval.parse(D + "Cache-Control: no-store, max-age=99\r\n")
    assert(ns.cacheable === 0)
    val nc = CacheEval.parse(D + "Cache-Control: no-cache, max-age=99\r\n")
    assert(nc.cacheable === 1 && nc.mustReval === 1 && nc.lifetime === 99L)
  }

  test("heuristic: a tenth of the Date - Last-Modified span") {
    val c = CacheEval.parse(D +
      "Last-Modified: Sun, 14 Jan 2024 10:00:00 GMT\r\n")
    assert(c.method === 4 && c.lifetime === 8640L)
  }

  test("an Expires BEFORE Date clamps to zero, never negative") {
    val c = CacheEval.parse(D +
      "Expires: Mon, 15 Jan 2024 09:00:00 GMT\r\n")
    assert(c.method === 3 && c.lifetime === 0L)
  }

  test("header names case-fold; lookalikes never match") {
    val c = CacheEval.parse("dAtE: Mon, 15 Jan 2024 10:00:00 GMT\r\n" +
      "X-Max-Age: 999\r\nX-Cache-Control: max-age=7\r\n" +
      "cache-control: max-age=11\r\n")
    assert(c.method === 2 && c.lifetime === 11L)
  }

  test("delta-seconds longer than Long saturates; Unicode digits are " +
    "invalid, never a crash") {
    // 20 nines overflows Long.parseLong — must saturate, not throw
    val c = CacheEval.parse(D +
      "Cache-Control: max-age=99999999999999999999\r\n")
    assert(c.method === 2 && c.lifetime === (1L << 40) - 1)
    // Arabic-Indic digits pass isDigit but are NOT RFC 9111
    // delta-seconds: invalid value, falls through to Expires
    val u = CacheEval.parse(D +
      "Cache-Control: max-age=٥٥\r\n" +
      "Expires: Mon, 15 Jan 2024 11:00:00 GMT\r\n")
    assert(u.method === 3 && u.lifetime === 3600L)
  }

  test("no Date refuses; nothing at all is method none") {
    assert(CacheEval.parse("Cache-Control: max-age=5\r\n") === null)
    val c = CacheEval.parse(D + "Content-Type: text/html\r\n")
    assert(c.method === 5 && c.lifetime === 0L)
  }

  test("synthesized classes round-trip") {
    def m(mode: Long) = CacheEval.parse(CacheEval.synth(42L + (mode << 40)))
    assert(m(0).method === 2 && m(0).lifetime === (60 + 42 % 600).toLong)
    assert(m(1).method === 1 && m(1).lifetime === (120 + 42 % 300).toLong)
    assert(m(2).method === 3 && m(2).lifetime === (3600 + 42 % 1800).toLong)
    assert(m(3).cacheable === 0)
    assert(m(4).method === 4 && m(4).lifetime === 8640L * (1 + 42 % 10))
    assert(m(5).method === 3 && m(5).mustReval === 1)
    // odd id: lowercase header spellings must parse identically
    val lo = CacheEval.parse(CacheEval.synth(43L))
    assert(lo.method === 2 && lo.lifetime === (60 + 43 % 600).toLong)
  }
}
