package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SitemapEval

/** The sitemap walk, pinned against HAND-SPELLED XML the synthesizer
  * never produces: both W3C datetime grammars on known epochs,
  * loc-less blocks, entity decode, offset arithmetic, and the
  * truncated-root refusal.
  */
class SitemapSpec extends AnyFunSuite {

  private def parse(s: String) = SitemapEval.parse(s.getBytes("UTF-8"))

  test("hand urlset: both date grammars normalize to known epochs") {
    val sm = parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.example/one</loc>
        |    <lastmod>2024-01-01</lastmod>
        |  </url>
        |  <url>
        |    <loc>https://ex.example/two</loc>
        |    <lastmod>2024-01-01T00:00:10+01:00</lastmod>
        |  </url>
        |</urlset>
        |""".stripMargin)
    assert(sm.kind === "urlset")
    assert(sm.urls === 2 && sm.lastmods === 2)
    // 2024-01-01 = 1704067200; +01:00 offset SUBTRACTS an hour
    assert(sm.latest === 1704067200L)
    assert(sm.firstLoc === "https://ex.example/one")
  }

  test("loc-less url is skipped; malformed lastmod drops, loc survives") {
    val sm = parse(
      "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
        "<url><loc>https://a.example/x</loc>" +
        "<lastmod>yesterday-ish</lastmod></url></urlset>")
    assert(sm.urls === 1 && sm.lastmods === 0)
    assert(sm.latest === -1L)
    assert(sm.firstLoc === "https://a.example/x")
  }

  test("entities decode and padding trims in loc") {
    val sm = parse(
      "<urlset><url><loc>  https://a.example/q?a=1&amp;b=&#50;  </loc>" +
        "</url></urlset>")
    assert(sm.firstLoc === "https://a.example/q?a=1&b=2")
  }

  test("sitemapindex reports kind index over sitemap blocks") {
    val sm = parse(
      "<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>" +
        "<lastmod>2024-01-02T00:00:00Z</lastmod></sitemap>" +
        "<sitemap><loc>https://a.example/s2.xml</loc></sitemap>" +
        "</sitemapindex>")
    assert(sm.kind === "index")
    assert(sm.urls === 2 && sm.lastmods === 1)
    assert(sm.latest === 1704153600L)
  }

  test("unclosed root refuses whole; non-XML refuses") {
    assert(parse("<urlset><url><loc>https://a.example</loc></url>") === null)
    assert(parse("the fast key order sort table") === null)
  }

  test("synth classes land on their contract shapes") {
    val s0 = SitemapEval.parse(SitemapEval.synth(21L))
    assert(s0.kind === "urlset")
    assert(s0.urls === 2 + 21 % 3 && s0.lastmods === s0.urls)
    assert(s0.firstLoc === "https://s0.example/p0")
    val s1 = SitemapEval.parse(SitemapEval.synth(21L | (1L << 40)))
    assert(s1.kind === "index" && s1.urls === 2)
    val s2 = SitemapEval.parse(SitemapEval.synth(21L | (2L << 40)))
    assert(s2.urls === 3, "the loc-less url must not count")
    assert(s2.lastmods === 2)
    assert(s2.firstLoc === "https://s0.example/a?x=1&y=2")
    assert(SitemapEval.parse(SitemapEval.synth(21L | (3L << 40))) === null,
      "truncated root refuses whole")
  }
}
