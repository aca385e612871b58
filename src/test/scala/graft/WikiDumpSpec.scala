package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bzip2Eval, WikiDumpEval}

/** The MediaWiki intake drilled on hand-spelled dumps the synthesizer
  * never produces: cleaner rule interplay (templates nested and
  * UNBALANCED, refs self-closed and spanning lines, piped links inside
  * bold runs), the XML-unescape-before-clean ordering, the ns filter,
  * and the page-walk's truncation tolerance.
  */
class WikiDumpSpec extends AnyFunSuite {

  private def clean(s: String) = WikiDumpEval.clean(s)

  test("cleaner: links, quotes, headings, whitespace") {
    assert(clean("'''Bold''' and ''italic'' text.") === "Bold and italic text.")
    assert(clean("See [[target|label]] and [[bare]].") === "See label and bare.")
    assert(clean("[https://example.org/x the label] stays") ===
      "the label stays")
    assert(clean("== Heading ==\nbody") === "Heading\nbody")
    assert(clean("=== Deep ===\n\n\n  spaced   out  ") === "Deep\nspaced out")
  }

  test("cleaner: templates drop whole, nested and unbalanced") {
    assert(clean("a {{cite|x={{inner|y}}}} b") === "a b")
    // unbalanced open drops to the end (evidence of a cut dump)
    assert(clean("keep {{never closes\nmore template text") === "keep")
  }

  test("cleaner: refs drop in both spellings, across lines") {
    assert(clean("fact<ref>long\nmultiline cite</ref> stands") ===
      "fact stands")
    assert(clean("fact<ref name=\"x\" /> stands") === "fact stands")
  }

  test("page walk: ns filter, redirect, talk decoy, truncation") {
    def dump(inner: String) =
      ("<mediawiki>" + inner + "</mediawiki>").getBytes("UTF-8")
    def page(t: String, ns: Int, body: String, redirect: Boolean = false) =
      s"<page><title>$t</title><ns>$ns</ns>" +
        (if (redirect) "<redirect title=\"X\" />" else "") +
        s"<revision><text>$body</text></revision></page>"
    // the talk page comes FIRST: the article read must skip it
    val b = dump(page("Talk:A", 1, "chatter") + page("A", 0, "prose here"))
    assert(WikiDumpEval.title(b) === "A")
    assert(WikiDumpEval.text(b) === "prose here")
    val meta = WikiDumpEval.meta(b)
    assert(((meta >> 32) & 0xFFFF) === 2L) // both pages counted
    // redirect: title serves, text refuses
    val r = dump(page("R", 0, "#REDIRECT [[A]]", redirect = true))
    assert(WikiDumpEval.title(r) === "R")
    assert(WikiDumpEval.text(r) === null)
    // truncation mid-page keeps the earlier page
    val cut = dump(page("A", 0, "kept text") +
      "<page><title>B</title><ns>0</ns><revision><text>lost")
    assert(WikiDumpEval.text(cut) === "kept text")
    assert(((WikiDumpEval.meta(cut) >> 32) & 0xFFFF) === 1L)
    // not a dump
    assert(WikiDumpEval.meta("plain text".getBytes("UTF-8")) === -1L)
  }

  test("XML unescape runs BEFORE the cleaner (the &lt;ref&gt; drill)") {
    val b = ("<mediawiki><page><title>A</title><ns>0</ns><revision>" +
      "<text>fact&lt;ref&gt;cite&lt;/ref&gt; stands &amp; holds</text>" +
      "</revision></page></mediawiki>").getBytes("UTF-8")
    assert(WikiDumpEval.text(b) === "fact stands & holds")
  }

  test("cleaner robustness: hostile nesting, quote floods, garbage") {
    // deep template nesting, quote floods, and half-open structures
    // must come back as a value, never a throw or a hang
    val hostiles = Seq(
      "{{" * 500 + "x" + "}}" * 500,
      "'" * 2000,
      "[[" * 300 + "]]" * 300,
      "<ref>" * 100,
      "=" * 400 + "\n" + "=" * 400,
      "[[a|b|c]] [[|]] [[]]",
      "")
    hostiles.foreach { h =>
      val r = WikiDumpEval.clean(h)
      assert(r != null, s"clean returned null for ${h.take(20)}")
    }
    // random garbage through the full page walk
    val rnd = new java.util.Random(0x81717L)
    (0 until 200).foreach { k =>
      val b = new Array[Byte](k % 200 + 1)
      rnd.nextBytes(b)
      val withMagic = "<mediawiki>".getBytes("UTF-8") ++ b
      try { WikiDumpEval.meta(withMagic); WikiDumpEval.text(withMagic) }
      catch { case e: Throwable => fail(s"threw on fuzz $k: $e") }
    }
  }

  test("synth classes: template/ref invariance, redirect, talk-only, " +
    "bzip2 wire round trip") {
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .getBytes("UTF-8")
    def viaWire(mode: Int): Array[Byte] = {
      val wire = WikiDumpEval.synth(text, 21L + (mode.toLong << 40))
      val xml = Bzip2Eval.decodeContent(wire)
      assert(xml != null, s"mode $mode failed the bzip2 leg")
      xml
    }
    val t0 = WikiDumpEval.text(viaWire(0))
    val t1 = WikiDumpEval.text(viaWire(1))
    assert(t0 != null && t0.contains("History"))
    assert(t0 === t1, "the infobox+ref dressing must clean away exactly")
    assert(t0 === "alpha is a beta. See delta and epsilon.\nHistory\n" +
      "zeta began eta#21.")
    val x2 = viaWire(2)
    assert(WikiDumpEval.text(x2) === null) // redirect
    assert(((WikiDumpEval.meta(x2) >> 16) & 1L) === 1L)
    val x3 = viaWire(3)
    assert(WikiDumpEval.title(x3) === null) // talk-only: no article
    assert(((WikiDumpEval.meta(x3) >> 17) & 1L) === 0L)
  }
}
