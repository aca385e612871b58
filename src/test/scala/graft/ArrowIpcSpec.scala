package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrowIpcEval

/** The Arrow IPC flatbuffers walk: vtable absence defaults, union
  * dispatch, framing advance over uncounted message types, and the
  * truncation split — drilled through the synthesizer plus
  * hand-adjusted buffers.
  */
class ArrowIpcSpec extends AnyFunSuite {

  test("synthesized classes round-trip") {
    val x0 = ArrowIpcEval.parse(ArrowIpcEval.synth(42L))
    assert(x0 != null && x0.nFields === 3 && x0.nBatches === 2)
    assert(x0.totalRows === (10 + 42 % 90) + (10 + 43 % 90).toLong)
    assert(x0.bodyBytes === 2L * (64 + (42 % 32) * 8))
    assert(x0.truncated === 0)
    // dictionary messages frame past without counting
    val x1 = ArrowIpcEval.parse(ArrowIpcEval.synth(42L + (1L << 40)))
    assert(x1.nFields === 5 && x1.nBatches === 2 &&
      x1.totalRows === x0.totalRows)
    // absent fields vector + absent version -> defaults, not offset-0
    val x2 = ArrowIpcEval.parse(ArrowIpcEval.synth(42L + (2L << 40)))
    assert(x2.nFields === 0 && x2.nBatches === 1)
    // truncation: schema + first batch serve
    val x3 = ArrowIpcEval.parse(ArrowIpcEval.synth(42L + (3L << 40)))
    assert(x3.truncated === 1 && x3.nBatches === 1 &&
      x3.totalRows === (10 + 42 % 90).toLong)
  }

  test("a stream that does not open with a Schema refuses") {
    // strip the schema message: the first message becomes a batch
    val whole = ArrowIpcEval.synth(7L)
    // schema message length = 8 + metaLen (read it from the framing)
    val metaLen = (whole(4) & 0xFF) | ((whole(5) & 0xFF) << 8)
    val cut = java.util.Arrays.copyOfRange(whole, 8 + metaLen, whole.length)
    assert(ArrowIpcEval.parse(cut) === null)
  }

  test("plain text and a bare continuation refuse") {
    assert(ArrowIpcEval.parse("not an arrow stream".getBytes) === null)
    assert(ArrowIpcEval.parse(Array[Byte](-1, -1, -1, -1)) === null)
  }

  test("missing EOS on an otherwise-complete stream flags truncated") {
    val whole = ArrowIpcEval.synth(9L)
    val noEos = java.util.Arrays.copyOfRange(whole, 0, whole.length - 8)
    val r = ArrowIpcEval.parse(noEos)
    assert(r != null && r.truncated === 1 && r.nBatches === 2)
  }

  test("a malformed flatbuffer root offset refuses, never crashes") {
    // framing is valid (continuation + metaLen 16) but the root
    // offset claims 0xFFFFFF00 — the derived table position is
    // negative and every read from it must land on the refusal path
    val b = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      var k = 0
      while (k < 4) { b.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    u32(0xFFFFFFFFL); u32(16L)
    u32(0xFFFFFF00L) // root offset: wraps negative via toInt
    u32(0L); u32(0L); u32(0L)
    assert(ArrowIpcEval.parse(b.toByteArray) === null)
  }

  test("a corrupt message AFTER a good schema flags truncated, " +
    "never crashes") {
    val whole = ArrowIpcEval.synth(9L)
    // find the second message start: schema fb is message 1; corrupt
    // every byte of the stream tail past the first 24 bytes to 0xEE
    // so the next header's flatbuffer walk derives garbage positions
    val bad = whole.clone()
    // keep the first message intact: locate its end via a re-frame
    val metaLen = (whole(4) & 0xFF) | ((whole(5) & 0xFF) << 8) |
      ((whole(6) & 0xFF) << 16) | ((whole(7) & 0xFF) << 24)
    val msg2 = 8 + metaLen // schema has no body
    var k = msg2 + 8 // leave message 2's framing, wreck its flatbuffer
    while (k < bad.length) { bad(k) = 0xEE.toByte; k += 1 }
    val r = ArrowIpcEval.parse(bad)
    assert(r == null || r.truncated === 1) // refusal or truncation — no throw
  }
}
