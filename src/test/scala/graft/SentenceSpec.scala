package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SentenceEval

/** The segmenter, pinned against HAND-SPELLED passages the
  * synthesizer never produces: every trap in isolation plus the
  * stated abbreviation-at-end limitation.
  */
class SentenceSpec extends AnyFunSuite {

  private def split(s: String): Seq[String] =
    SentenceEval.split(s.getBytes("UTF-8")).toSeq

  test("hand passage: abbreviations, decimals, quotes, runs") {
    val s = split(
      "Dr. Smith measured 3.14 units. \"Was it enough?\" " +
        "Nobody knew... The lab closed?! Work continued")
    assert(s === Seq(
      "Dr. Smith measured 3.14 units.",
      "\"Was it enough?\"",
      "Nobody knew...",
      "The lab closed?!",
      "Work continued"))
  }

  test("decimals never bound; version strings survive") {
    assert(split("pi is 3.14159 and e is 2.71 here.") ===
      Seq("pi is 3.14159 and e is 2.71 here."))
    assert(split("use v2.4.1 today. then upgrade.") ===
      Seq("use v2.4.1 today.", "then upgrade."))
  }

  test("abbreviations block mid-sentence; e.g and i.e included") {
    assert(split("see Mr. Jones e.g. the report i.e. page two. done.") ===
      Seq("see Mr. Jones e.g. the report i.e. page two.", "done."))
  }

  test("the stated limitation: an abbreviation at a TRUE end joins") {
    assert(split("lists end with etc. The next one starts.") ===
      Seq("lists end with etc. The next one starts."),
      "abbreviation-list segmenters share this mis-join; it is pinned scope")
  }

  test("closing quotes and brackets attach to their sentence") {
    assert(split("he said \"stop.\" then left.") ===
      Seq("he said \"stop.\"", "then left."))
    assert(split("(as shown.) next point.") ===
      Seq("(as shown.)", "next point."))
  }

  test("terminator runs bound once; empty input yields nothing") {
    assert(split("what?!?! really... yes.") ===
      Seq("what?!?!", "really...", "yes."))
    assert(split("").isEmpty)
    assert(split("   ").isEmpty)
  }

  test("synth classes land on their contract shapes") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    val s0 = SentenceEval.split(SentenceEval.synth(text, 21L)).toSeq
    assert(s0 === Seq(
      "alpha bravo charlie.",
      "Dr. delta got 3.14 of echo.",
      "foxtrot e.g. golf!",
      "\"hotel india?\"",
      "juliet kilo lima"))
    val s1 = SentenceEval.split(SentenceEval.synth(text, 21L | (1L << 40))).toSeq
    assert(s1.length === 4 && s1.head === "alpha bravo charlie?!")
    val s2 = SentenceEval.split(SentenceEval.synth(text, 21L | (2L << 40))).toSeq
    assert(s2.length === 2, "the etc. join is the class's whole point")
    assert(s2.head === "alpha bravo etc. charlie delta echo.")
    val s3 = SentenceEval.split(SentenceEval.synth(text, 21L | (3L << 40))).toSeq
    assert(s3 === Seq("alpha bravo.",
      "charlie delta echo foxtrot golf hotel india juliet kilo lima"))
  }
}
