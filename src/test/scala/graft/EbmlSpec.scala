package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EbmlEval

/** The EBML walk, pinned against HAND-SPELLED elements the
  * synthesizer never produces: multi-byte vints, the unknown-size
  * Segment, non-minimal sizes, float-vs-double Duration with a
  * non-default TimestampScale, the Cluster decoy, and refusals.
  */
class EbmlSpec extends AnyFunSuite {

  private def id(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private def vint1(v: Int): Array[Byte] = Array((0x80 | v).toByte)

  private def vint2(v: Int): Array[Byte] =
    Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)

  private def el(idB: Array[Byte], body: Array[Byte]): Array[Byte] =
    idB ++ vint1(body.length) ++ body

  private val Ebml = id(0x1A, 0x45, 0xDF, 0xA3)
  private val DocType = id(0x42, 0x82)
  private val Segment = id(0x18, 0x53, 0x80, 0x67)
  private val Info = id(0x15, 0x49, 0xA9, 0x66)
  private val Scale = id(0x2A, 0xD7, 0xB1)
  private val Duration = id(0x44, 0x89)
  private val Tracks = id(0x16, 0x54, 0xAE, 0x6B)
  private val TrackEntry = id(0xAE)
  private val TrackType = id(0x83)
  private val Video = id(0xE0)
  private val PixW = id(0xB0)
  private val PixH = id(0xBA)
  private val Cluster = id(0x1F, 0x43, 0xB6, 0xF6)

  private def u(v: Long): Array[Byte] = {
    var n = 1
    while ((v >> (8 * n)) != 0) n += 1
    (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xFF).toByte).toArray
  }

  private def header(dt: String): Array[Byte] =
    el(Ebml, el(DocType, dt.getBytes("US-ASCII")))

  private def videoTrack(w: Long, h: Long): Array[Byte] =
    el(TrackEntry, el(TrackType, u(1)) ++
      el(Video, el(PixW, u(w)) ++ el(PixH, u(h))))

  test("hand container: doctype, dims, tracks, double duration") {
    val dur = java.lang.Double.doubleToLongBits(1234.0)
    val info = el(Info, el(Scale, u(1000000L)) ++
      el(Duration, (0 until 8).map(k => ((dur >> (8 * (7 - k))) & 0xFF).toByte).toArray))
    val seg = el(Segment, info ++ el(Tracks,
      videoTrack(1920, 1080) ++ el(TrackEntry, el(TrackType, u(2)))))
    val m = EbmlEval.parse(header("webm") ++ seg)
    assert(m.doctype === 1)
    assert(m.width === 1920 && m.height === 1080)
    assert(m.nVideo === 1 && m.nAudio === 1)
    assert(m.durationMs === 1234L)
  }

  test("unknown-size segment descends to EOF; elsewhere it refuses") {
    val info = el(Info, el(Scale, u(1000000L)))
    val body = info ++ el(Tracks, videoTrack(640, 360))
    val unknownSeg = Segment ++ Array(0x01.toByte) ++
      Array.fill(7)(0xFF.toByte) ++ body
    val m = EbmlEval.parse(header("matroska") ++ unknownSeg)
    assert(m != null && m.width === 640 && m.doctype === 2,
      "a live-stream segment (size unknown) must be walked, not skipped")
    // unknown size on a non-Segment element: nothing downstream is sound
    val badInfo = Info ++ Array(0x01.toByte) ++ Array.fill(7)(0xFF.toByte)
    assert(EbmlEval.parse(header("webm") ++ el(Segment, badInfo)) === null)
  }

  test("non-minimal 2-byte size vint walks correctly") {
    val w = el(Video, el(PixW, u(320)) ++ el(PixH, u(240)))
    // TrackEntry body spelled with a WIDE size: 0x40 <len> not 0x80|len
    val body = el(TrackType, u(1)) ++ w
    val wideEntry = TrackEntry ++ vint2(body.length) ++ body
    val seg = el(Segment, el(Tracks, wideEntry))
    val m = EbmlEval.parse(header("webm") ++ seg)
    assert(m.width === 320 && m.nVideo === 1)
  }

  test("float(4) duration at a halved scale lands on ticks/2 ms") {
    val bits = java.lang.Float.floatToIntBits(5000f)
    val info = el(Info, el(Scale, u(500000L)) ++
      el(Duration, (0 until 4).map(k => ((bits >> (8 * (3 - k))) & 0xFF).toByte).toArray))
    val m = EbmlEval.parse(header("webm") ++ el(Segment, info))
    assert(m.durationMs === 2500L)
  }

  test("duration defaults: no TimestampScale means 1e6 ns ticks") {
    val bits = java.lang.Double.doubleToLongBits(777.0)
    val info = el(Info,
      el(Duration, (0 until 8).map(k => ((bits >> (8 * (7 - k))) & 0xFF).toByte).toArray))
    val m = EbmlEval.parse(header("webm") ++ el(Segment, info))
    assert(m.durationMs === 777L)
    // and no Duration at all reports -1 (the operator's NULL)
    val m2 = EbmlEval.parse(header("webm") ++ el(Segment, el(Info, Array[Byte]())))
    assert(m2.durationMs === -1L)
  }

  test("the cluster decoy: a TrackEntry spelled in frame bytes is never read") {
    val decoy = el(TrackEntry, el(TrackType, u(1)) ++
      el(Video, el(PixW, u(7777)) ++ el(PixH, u(7777))))
    val seg = el(Segment, el(Tracks, videoTrack(320, 240)) ++
      el(Cluster, decoy))
    val m = EbmlEval.parse(header("webm") ++ seg)
    assert(m.width === 320 && m.nVideo === 1,
      "the walk must not descend into Cluster payload")
  }

  test("refusals: truncation, odd duration width, not EBML") {
    val seg = el(Segment, el(Tracks, videoTrack(320, 240)))
    val whole = header("webm") ++ seg
    assert(EbmlEval.parse(whole.dropRight(5)) === null)
    // a 6-byte Duration is neither float nor double
    val badDur = el(Info, el(Duration, new Array[Byte](6)))
    assert(EbmlEval.parse(header("webm") ++ el(Segment, badDur)) === null)
    assert(EbmlEval.parse("plain text here".getBytes("UTF-8")) === null)
    assert(EbmlEval.parse(null) === null)
  }

  test("synth classes land on their contract shapes") {
    val m0 = EbmlEval.parse(EbmlEval.synth(21L))
    assert(m0.doctype === 1)
    assert(m0.width === 320 + (21 % 4) * 160)
    assert(m0.height === 240 + (21 % 3) * 120)
    assert(m0.nVideo === 1 && m0.nAudio === 0)
    assert(m0.durationMs === 10000L + 21 % 5000)
    val m1 = EbmlEval.parse(EbmlEval.synth(22L + (1L << 40)))
    assert(m1.doctype === 2 && m1.nAudio === 1)
    assert(m1.durationMs === 3000L + 22 % 1000)
    val m2 = EbmlEval.parse(EbmlEval.synth(23L + (2L << 40)))
    assert(m2.doctype === 1 && m2.durationMs === 7777L + 23 % 777)
    assert(EbmlEval.parse(EbmlEval.synth(24L + (3L << 40))) === null)
    assert(EbmlEval.isEbml(EbmlEval.synth(24L + (3L << 40))),
      "truncation keeps the magic: is_ebml stays 1, fields refuse")
  }
}
