package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SubtitleEval

/** The SRT/WebVTT cue walk, pinned against HAND-SPELLED files the
  * synthesizer never produces: real-world spellings (hour-bearing VTT
  * timestamps, multi-line cues, NOTE/STYLE blocks, settings), the
  * per-cue vs whole refusal split, and the strict
  * separator-per-format stance.
  */
class SubtitleSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("hand SRT: hour place values, multi-line cue, absolute end") {
    val srt =
      "1\n01:02:03,456 --> 01:02:05,000\nfirst line\nsecond line\n\n" +
        "2\n01:02:06,000 --> 01:02:07,250\nlast cue\n"
    val p = SubtitleEval.parse(b(srt))
    assert(p != null && p.format === "srt")
    assert(p.cues.length === 2)
    assert(p.cues(0).startMs === ((1 * 60 + 2) * 60 + 3) * 1000 + 456)
    assert(p.cues(0).text === "first line\nsecond line")
    assert(SubtitleEval.totalMs(b(srt)) === 1544L + 1250L)
    assert(SubtitleEval.lastEndMs(b(srt)) ===
      ((1 * 60 + 2) * 60 + 7) * 1000 + 250)
    assert(new String(SubtitleEval.text(b(srt)), "UTF-8") ===
      "first line\nsecond line\nlast cue")
  }

  test("hand VTT: hour-bearing AND short timestamps, id, NOTE, STYLE") {
    val vtt =
      "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
        "STYLE\n::cue { color: red }\n\n" +
        "intro\n00:05.000 --> 00:07.000 align:start\nshort stamp cue\n\n" +
        "01:00:00.000 --> 01:00:02.500\nhour stamp cue\n"
    val p = SubtitleEval.parse(b(vtt))
    assert(p != null && p.format === "vtt")
    assert(p.cues.length === 2)
    assert(p.cues(0).startMs === 5000L)
    assert(p.cues(0).text === "short stamp cue", "id/settings must not leak")
    assert(p.cues(1).startMs === 3600000L)
    assert(SubtitleEval.totalMs(b(vtt)) === 2000L + 2500L)
  }

  test("per-cue refusal: bad timing, bad counter, end <= start") {
    val srt =
      "1\n00:00:01,000 --> 00:00:02,000\ngood one\n\n" +
        "2\n00:00:0x,000 --> 00:00:04,000\nbad stamp\n\n" +
        "x3\n00:00:05,000 --> 00:00:06,000\nbad counter\n\n" +
        "4\n00:00:08,000 --> 00:00:08,000\nzero length\n\n" +
        "5\n00:00:09,000 --> 00:00:09,500\ngood two\n"
    assert(SubtitleEval.cueCount(b(srt)) === 2)
    assert(new String(SubtitleEval.text(b(srt)), "UTF-8") === "good one\ngood two")
  }

  test("separator strictness: dots in SRT refuse the cue, commas in VTT too") {
    val srtDots = "1\n00:00:01.000 --> 00:00:02.000\ntext\n"
    assert(SubtitleEval.parse(b(srtDots)) === null, "zero valid cues refuses")
    val vttCommas = "WEBVTT\n\n00:00:01,000 --> 00:00:02,000\ntext\n"
    assert(SubtitleEval.parse(b(vttCommas)) === null)
  }

  test("whole refusals: headerless timing lines, raw text, empty") {
    assert(SubtitleEval.parse(b(
      "00:00:01,000 --> 00:00:02,000\norphan cue\n")) === null)
    assert(SubtitleEval.parse(b("the fast key order sort merge")) === null)
    assert(SubtitleEval.parse(b("WEBVTT\n\nNOTE only comments here\n")) === null,
      "zero cues refuses")
    assert(SubtitleEval.parse(Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 0, 1)) === null,
      "non-UTF-8 refuses")
  }

  test("synth round-trips every mode against an independent replay") {
    val words = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november").split(" ")
    val text = words.mkString(" ").getBytes("UTF-8")
    // mode 0: SRT, odd id -> hour base
    val id = 9L
    val base = (id % 2) * 3725999L + (id % 7) * 111
    val p0 = SubtitleEval.parse(SubtitleEval.synth(text, id))
    assert(p0.format === "srt" && p0.cues.length === 3) // 14 words -> 3 cues
    assert(p0.cues(0).startMs === base)
    assert(p0.cues(2).endMs === base + 2 * 2500 + 2000)
    assert(p0.cues(0).text === "alpha bravo charlie delta echo foxtrot")
    assert(p0.cues(2).text === "mike november")
    // mode 1: VTT with BOM/CRLF/NOTE; two-line cues, short cue single-line
    val p1 = SubtitleEval.parse(SubtitleEval.synth(text, id | (1L << 40)))
    assert(p1.format === "vtt" && p1.cues.length === 3)
    assert(p1.cues(0).text === "alpha bravo charlie\ndelta echo foxtrot")
    assert(p1.cues(2).text === "mike november", "a <=3-word cue stays one line")
    assert(p1.cues(0).startMs === (id % 7) * 111)
    // mode 2: cue #2 corrupted -> dropped, siblings survive
    val p2 = SubtitleEval.parse(SubtitleEval.synth(text, id | (2L << 40)))
    assert(p2.format === "srt" && p2.cues.length === 2)
    assert(p2.cues(0).text === "alpha bravo charlie delta echo foxtrot")
    assert(p2.cues(1).text === "mike november")
    assert(SubtitleEval.lastEndMs(SubtitleEval.synth(text, id | (2L << 40))) ===
      base + 2 * 2500 + 2000)
    // mode 3: counter-less timing lines refuse whole
    assert(SubtitleEval.parse(SubtitleEval.synth(text, id | (3L << 40))) === null)
  }
}
