package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TfRecordEval

/** The TFRecord walk, pinned against frames built with an INDEPENDENT
  * table-driven CRC32C (the reflected 0x82F63B78 polynomial, pinned
  * below against the standard "123456789" check value 0xE3069283) —
  * the kernel reads `java.util.zip.CRC32C`, so a shared CRC
  * misunderstanding cannot cancel. Drills the refusal split the
  * framing dictates: length-CRC failure = whole (first record: not a
  * TFRecord; mid-stream: truncated), data-CRC failure = that record
  * only, and the genuinely little-endian length.
  */
class TfRecordSpec extends AnyFunSuite {

  // independent CRC32C: table-driven, reflected poly 0x82F63B78
  private lazy val table: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c; n += 1
    }
    t
  }

  private def crc32cRef(b: Array[Byte]): Int = {
    var c = 0xFFFFFFFF
    var i = 0
    while (i < b.length) {
      c = table((c ^ b(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  private def mask(c: Int): Int = ((c >>> 15) | (c << 17)) + 0xa282ead8

  private def u64le(v: Long): Array[Byte] =
    (0 until 8).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  private def u32le(v: Int): Array[Byte] =
    (0 until 4).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  /** Frame one record with the independent CRC implementation. */
  private def rec(payload: Array[Byte],
                  lenBytes: Array[Byte] = null): Array[Byte] = {
    val lb = if (lenBytes != null) lenBytes else u64le(payload.length.toLong)
    lb ++ u32le(mask(crc32cRef(lb))) ++
      payload ++ u32le(mask(crc32cRef(payload)))
  }

  test("CRC32C check value: the independent table impl is the real one") {
    assert(crc32cRef("123456789".getBytes("US-ASCII")) === 0xE3069283)
  }

  test("independently-framed records parse: counts, bytes, first payload") {
    val p0 = "hello tfrecord".getBytes("UTF-8")
    val p1 = "second example".getBytes("UTF-8")
    val s = rec(p0) ++ rec(p1)
    val r = TfRecordEval.parse(s)
    assert(r.valid === 1)
    assert(r.nRecords === 2)
    assert(r.nValid === 2)
    assert(r.totalBytes === (p0.length + p1.length).toLong)
    assert(r.truncated === 0)
    assert(java.util.Arrays.equals(r.first, p0))
  }

  test("the length is little-endian: a big-endian spelling walks out") {
    // length 1 written BIG-endian: the CRC is over raw bytes so it
    // passes, but the LE read is 1<<56 -> past EOF -> truncated
    val be = u64le(1L).reverse
    val s = rec(Array[Byte]('x'), lenBytes = be) ++ rec("ok".getBytes)
    val r = TfRecordEval.parse(s)
    assert(r.valid === 1)
    assert(r.truncated === 1)
    assert(r.nRecords === 0, "nothing served past a lying length")
  }

  test("refusal split: length crc whole, data crc per record") {
    val p0 = "alpha".getBytes("UTF-8")
    val p1 = "beta".getBytes("UTF-8")
    val p2 = "gamma".getBytes("UTF-8")
    // first record's length crc corrupt: not a TFRecord at all
    val first = rec(p0) ++ rec(p1)
    first(8) = (first(8) ^ 1).toByte
    assert(TfRecordEval.parse(first).valid === 0)
    // mid-stream length crc corrupt: earlier records serve, truncated
    val mid = rec(p0) ++ rec(p1) ++ rec(p2)
    val off1 = p0.length + 16
    mid(off1 + 8) = (mid(off1 + 8) ^ 1).toByte
    val rm = TfRecordEval.parse(mid)
    assert(rm.valid === 1)
    assert(rm.nRecords === 1)
    assert(rm.truncated === 1)
    assert(java.util.Arrays.equals(rm.first, p0))
    // data crc corrupt: THAT record refuses, siblings read
    val data = rec(p0) ++ rec(p1) ++ rec(p2)
    data(off1 + 12) = (data(off1 + 12) ^ 1).toByte // a payload byte
    val rd = TfRecordEval.parse(data)
    assert(rd.nRecords === 3)
    assert(rd.nValid === 2)
    assert(rd.totalBytes === (p0.length + p2.length).toLong)
    assert(rd.truncated === 0)
    // first record's DATA crc corrupt: the first served payload is #2
    val d0 = rec(p0) ++ rec(p1)
    d0(12) = (d0(12) ^ 1).toByte
    assert(java.util.Arrays.equals(TfRecordEval.parse(d0).first, p1))
  }

  test("truncation honesty at every boundary") {
    val p0 = "alpha".getBytes("UTF-8")
    val p1 = "beta omega".getBytes("UTF-8")
    val s = rec(p0) ++ rec(p1)
    val r0len = p0.length + 16
    // cut mid second length word: a partial tail, first record serves
    val a = TfRecordEval.parse(s.take(r0len + 5))
    assert(a.nRecords === 1 && a.truncated === 1)
    // cut mid second data: length verified, record unfinished
    val b = TfRecordEval.parse(s.take(r0len + 12 + 3))
    assert(b.nRecords === 1 && b.truncated === 1)
    // cut mid second data CRC
    val c = TfRecordEval.parse(s.take(s.length - 2))
    assert(c.nRecords === 1 && c.truncated === 1)
    // clean end: no truncation
    assert(TfRecordEval.parse(s).truncated === 0)
  }

  test("zero-byte records are legal; garbage and null refuse") {
    val s = rec(Array.emptyByteArray) ++ rec("x".getBytes)
    val r = TfRecordEval.parse(s)
    assert(r.nRecords === 2 && r.nValid === 2)
    assert(r.first.length === 0, "the empty payload IS the first")
    assert(r.totalBytes === 1L)
    assert(TfRecordEval.parse("just words, not frames".getBytes).valid === 0)
    assert(TfRecordEval.parse(Array.emptyByteArray).valid === 0)
    assert(TfRecordEval.parse(null).valid === 0)
  }

  test("synth modes parse to the oracle's numbers") {
    val text = "one two three four five six".getBytes("UTF-8")
    def pay(k: Int, id: Long): Array[Byte] = {
      val ws = Array("one", "two", "three", "four", "five", "six")
      (ws(k) + " " + ws(k + 1) + "#" + (id % 97 + k)).getBytes("UTF-8")
    }
    val m0 = TfRecordEval.parse(TfRecordEval.synth(text, 42L))
    assert(m0.nRecords === 3 && m0.nValid === 3 && m0.truncated === 0)
    assert(m0.totalBytes ===
      (pay(0, 42).length + pay(1, 42).length + pay(2, 42).length).toLong)
    assert(java.util.Arrays.equals(m0.first, pay(0, 42)))
    val m1 = TfRecordEval.parse(TfRecordEval.synth(text, 42L | (1L << 40)))
    assert(m1.nRecords === 3 && m1.nValid === 3)
    assert(m1.first.length === 0, "the legal empty record leads")
    assert(m1.totalBytes === ("one " * 60).length.toLong + pay(2, 42).length)
    val m2 = TfRecordEval.parse(TfRecordEval.synth(text, 42L | (2L << 40)))
    assert(m2.nRecords === 3 && m2.nValid === 2 && m2.truncated === 0)
    assert(m2.totalBytes === (pay(0, 42).length + pay(2, 42).length).toLong)
    val m3 = TfRecordEval.parse(TfRecordEval.synth(text, 42L | (3L << 40)))
    assert(m3.nRecords === 2 && m3.nValid === 2 && m3.truncated === 1)
  }
}
