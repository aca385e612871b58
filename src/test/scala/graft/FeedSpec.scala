package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FeedEval

/** The feed walk, pinned against CPython-derived date vectors (its
  * `email.utils`/`datetime` parsers computed every expected epoch, so
  * the civil-date algebra cannot share an off-by-one with the
  * synthesizer) and hand-spelled real-world feeds: rel="self" decoys,
  * CDATA with raw markup, leap days, negative/positive offsets.
  */
class FeedSpec extends AnyFunSuite {

  test("RFC 822 vectors match CPython email.utils") {
    assert(FeedEval.parseRfc822("Mon, 01 Jan 2024 00:02:05 +0000") === 1704067325L)
    assert(FeedEval.parseRfc822("2 Mar 2025 23:59:59 -0330") === 1740972599L,
      "day-of-week is optional; the negative offset must ADD")
    assert(FeedEval.parseRfc822("Fri, 29 Feb 2008 12:00:00 GMT") === 1204286400L,
      "leap day through the civil algebra")
    assert(FeedEval.parseRfc822("Tue, 15 Aug 2026 17:05:00 +0530") === 1786793700L)
    assert(FeedEval.parseRfc822("Mon, 01 Jan 2024") === Long.MinValue)
    assert(FeedEval.parseRfc822("Mon, 01 Zzz 2024 00:00:00 +0000") === Long.MinValue)
  }

  test("ISO 8601 vectors match CPython datetime") {
    assert(FeedEval.parseIso8601("2024-01-01T00:02:05Z") === 1704067325L)
    assert(FeedEval.parseIso8601("2008-02-29T12:00:00+05:30") === 1204266600L)
    assert(FeedEval.parseIso8601("1999-12-31T23:59:59-01:00") === 946688399L)
    assert(FeedEval.parseIso8601("2024-13-01T00:00:00Z") === Long.MinValue)
  }

  test("format round trip: toRfc822/toIso8601 re-parse to the input") {
    for (e <- Seq(0L, 1204286400L, 1704067325L, 1786793700L)) {
      assert(FeedEval.parseRfc822(FeedEval.toRfc822(e)) === e)
      assert(FeedEval.parseIso8601(FeedEval.toIso8601(e)) === e)
    }
    assert(FeedEval.toRfc822(1204286400L) === "Fri, 29 Feb 2008 12:00:00 +0000",
      "day-of-week spelled correctly on a leap day")
  }

  test("hand atom: href attribute wins over text, self decoy loses") {
    val atom =
      """<?xml version="1.0"?>
        |<feed xmlns="http://www.w3.org/2005/Atom">
        |<title>blog</title>
        |<entry>
        |<title>post &amp; notes</title>
        |<link rel="self" href="https://example.com/feed.xml"/>
        |<link rel="alternate" href="https://example.com/post-1"/>
        |<updated>2024-01-01T00:02:05Z</updated>
        |</entry>
        |<entry><title>older</title>
        |<link href="https://example.com/post-0"/>
        |<updated>2023-06-15T08:00:00+02:00</updated>
        |</entry>
        |</feed>""".stripMargin.getBytes("UTF-8")
    val f = FeedEval.parse(atom)
    assert(f != null && f.format === "atom" && f.items.length === 2)
    assert(f.items(0).title === "post & notes")
    assert(f.items(0).link === "https://example.com/post-1",
      "the rel=self decoy must lose")
    assert(f.items(1).link === "https://example.com/post-0",
      "an unqualified link qualifies")
    assert(FeedEval.latestEpoch(atom) === 1704067325L)
  }

  test("hand rss: element-text links, CDATA verbatim, channel never leaks") {
    val rss =
      """<rss version="2.0"><channel>
        |<title>channel title</title>
        |<link>https://example.com/</link>
        |<item><title><![CDATA[markup <em>kept</em> & raw]]></title>
        |<link>https://example.com/a</link>
        |<pubDate>Fri, 29 Feb 2008 12:00:00 GMT</pubDate></item>
        |<item><title>plain &#x26; numeric</title>
        |<link>https://example.com/b</link></item>
        |</channel></rss>""".stripMargin.getBytes("UTF-8")
    val f = FeedEval.parse(rss)
    assert(f != null && f.format === "rss" && f.items.length === 2)
    assert(f.items(0).title === "markup <em>kept</em> & raw")
    assert(f.items(0).link === "https://example.com/a")
    assert(f.items(1).title === "plain & numeric")
    assert(FeedEval.latestEpoch(rss) === 1204286400L,
      "a dateless item must not contribute")
  }

  test("whole refusals: unclosed root, unclosed item, not a feed") {
    val noClose = "<rss version=\"2.0\"><channel><item><title>x</title></item></channel>"
    assert(FeedEval.parse(noClose.getBytes("UTF-8")) === null)
    val openItem = "<rss><channel><item><title>x</title></channel></rss>"
    assert(FeedEval.parse(openItem.getBytes("UTF-8")) === null)
    assert(FeedEval.parse("the fast key order sort merge".getBytes) === null)
  }

  test("synth round-trips every mode") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8") // 12 words -> 2 items
    val id = 6L
    val f0 = FeedEval.parse(FeedEval.synth(text, id))
    assert(f0.format === "rss" && f0.items.length === 2)
    assert(f0.items(0).title === "alpha bravo charlie delta echo foxtrot golf hotel")
    assert(f0.items(0).link === s"https://feed.example/doc$id/item0")
    assert(f0.items(1).epoch === 1704067200L + id * 37 + 60)
    val f1 = FeedEval.parse(FeedEval.synth(text, id | (1L << 40)))
    assert(f1.format === "atom" && f1.items.length === 2)
    assert(f1.items(0).title.endsWith(" & more"))
    assert(f1.items(0).link === s"https://feed.example/doc$id/item0")
    val f2 = FeedEval.parse(FeedEval.synth(text, id | (2L << 40)))
    assert(f2.items(0).title.endsWith(" <b> & raw"))
    assert(FeedEval.parse(FeedEval.synth(text, id | (3L << 40))) === null)
  }
}
