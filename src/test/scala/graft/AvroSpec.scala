package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AvroEval

/** The Avro container walk, pinned against HAND-SPELLED wire vectors
  * the synthesizer never produces (the FLAC/WebP no-independent-writer
  * stance — no Avro library ships in this environment, so every byte
  * below is spelled from the Avro 1.11 spec by hand): zigzag edges,
  * the negative-count SIZED metadata form, unknown-codec refusal that
  * keeps framing counts, sync-mismatch truncation, and the
  * schema-verification gate.
  */
class AvroSpec extends AnyFunSuite {

  // ---- hand zigzag: spell the varint bytes explicitly ----------------

  private def zig(v: Long): Array[Byte] = {
    var u = (v << 1) ^ (v >> 63)
    val o = new java.io.ByteArrayOutputStream()
    while ((u & ~0x7FL) != 0L) { o.write(((u & 0x7F) | 0x80).toInt); u >>>= 7 }
    o.write(u.toInt)
    o.toByteArray
  }

  test("zigzag spelling sanity: the hand encoder matches the spec table") {
    // Avro spec's own examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert(zig(0L).toSeq === Seq[Byte](0x00))
    assert(zig(-1L).toSeq === Seq[Byte](0x01))
    assert(zig(1L).toSeq === Seq[Byte](0x02))
    assert(zig(-2L).toSeq === Seq[Byte](0x03))
    assert(zig(64L).toSeq === Seq[Byte](0x80.toByte, 0x01))
  }

  private def str(s: String): Array[Byte] =
    zig(s.length.toLong) ++ s.getBytes("UTF-8")

  private val sync: Array[Byte] = (0 until 16).map(_.toByte).toArray

  /** Hand container: magic, positive-count meta, sync, blocks. */
  private def handContainer(schema: String, codec: String,
                            blocks: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    val entries = Seq("avro.schema" -> schema) ++
      (if (codec != null) Seq("avro.codec" -> codec) else Nil)
    o.write(zig(entries.size.toLong), 0, zig(entries.size.toLong).length)
    entries.foreach { case (k, v) =>
      o.write(str(k), 0, str(k).length); o.write(str(v), 0, str(v).length)
    }
    o.write(zig(0L), 0, 1)
    o.write(sync, 0, 16)
    blocks.foreach { case (n, body) =>
      o.write(zig(n.toLong), 0, zig(n.toLong).length)
      o.write(zig(body.length.toLong), 0, zig(body.length.toLong).length)
      o.write(body, 0, body.length)
      o.write(sync, 0, 16)
    }
    o.toByteArray
  }

  private def rec(id: Long, delta: Long, text: String,
                  tag: String): Array[Byte] =
    zig(id) ++ zig(delta) ++ str(text) ++
      (if (tag == null) zig(0L) else zig(1L) ++ str(tag))

  test("hand container: codec absent means null, negative delta decodes") {
    val body = rec(7L, -130L, "hello avro", "t") ++
      rec(8L, -1L, "second", null)
    val b = handContainer(AvroEval.SchemaJson, null, Seq((2, body)))
    val r = AvroEval.parse(b)
    assert(r.isAvro === 1)
    assert(r.codec === 1) // absent -> null codec
    assert(r.nBlocks === 1)
    assert(r.nRecords === 2)
    assert(r.nTagged === 1)
    assert(r.truncated === 0)
    assert(r.sumIds === 15L)
    assert(r.sumDelta === -131L) // -130 is a 2-byte zigzag, not 10-byte
    assert(new String(r.first, "UTF-8") === "hello avro")
  }

  test("negative-count SIZED metadata form parses (the skippable spelling)") {
    // hand-spell: count -2, then byte size, then 2 items
    val items = str("avro.schema") ++ str(AvroEval.SchemaJson) ++
      str("avro.codec") ++ str("null")
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    o.write(zig(-2L), 0, zig(-2L).length)
    o.write(zig(items.length.toLong), 0, zig(items.length.toLong).length)
    o.write(items, 0, items.length)
    o.write(zig(0L), 0, 1)
    o.write(sync, 0, 16)
    val body = rec(1L, -1L, "x", null)
    o.write(zig(1L), 0, 1)
    o.write(zig(body.length.toLong), 0, zig(body.length.toLong).length)
    o.write(body, 0, body.length)
    o.write(sync, 0, 16)
    val r = AvroEval.parse(o.toByteArray)
    assert(r.isAvro === 1 && r.nRecords === 1 && r.sumIds === 1L)
  }

  test("unknown codec keeps framing counts, refuses record facts") {
    val body = rec(1L, -1L, "x", null)
    val b = handContainer(AvroEval.SchemaJson, "snappy", Seq((1, body)))
    val r = AvroEval.parse(b)
    assert(r.isAvro === 1)
    assert(r.codec === 3)
    assert(r.nBlocks === 1 && r.nRecords === 1) // framing still counts
    assert(r.sumIds === Long.MinValue && r.first === null) // facts refuse
  }

  test("a container declaring another schema refuses the decode") {
    val other = """{"type":"record","name":"x","fields":[""" +
      """{"name":"a","type":"long"}]}"""
    val body = rec(1L, -1L, "x", null)
    val b = handContainer(other, "null", Seq((1, body)))
    val r = AvroEval.parse(b)
    assert(r.isAvro === 1 && r.nRecords === 1)
    assert(r.sumIds === Long.MinValue && r.nTagged === -1)
  }

  test("sync mismatch truncates: blocks before it serve whole") {
    val b1 = rec(1L, -1L, "one", null)
    val b2 = rec(2L, -2L, "two", null)
    val whole = handContainer(AvroEval.SchemaJson, "null",
      Seq((1, b1), (1, b2)))
    // corrupt the LAST sync's first byte
    whole(whole.length - 16) = (whole(whole.length - 16) ^ 1).toByte
    val r = AvroEval.parse(whole)
    assert(r.truncated === 1)
    assert(r.nBlocks === 1 && r.nRecords === 1 && r.sumIds === 1L)
    assert(new String(r.first, "UTF-8") === "one")
  }

  test("a block that breaks mid-record contributes NOTHING") {
    // block declares 2 records but carries garbage after record 1:
    // union index 7 is illegal, so record 2 refuses and the whole
    // block must not pollute the sums
    val bad = rec(1L, -1L, "one", null) ++ zig(9L) ++ zig(9L) ++
      str("x") ++ zig(7L)
    val good = rec(5L, -5L, "five", null)
    val b = handContainer(AvroEval.SchemaJson, "null",
      Seq((1, good), (2, bad)))
    val r = AvroEval.parse(b)
    assert(r.truncated === 1)
    assert(r.nRecords === 1 && r.sumIds === 5L && r.sumDelta === -5L)
  }

  test("a record whose bytes underrun the block refuses the block") {
    // one record declared, but the block carries trailing garbage —
    // off != body.length is a framing lie
    val body = rec(1L, -1L, "x", null) ++ Array[Byte](0x00)
    val b = handContainer(AvroEval.SchemaJson, "null", Seq((1, body)))
    val r = AvroEval.parse(b)
    assert(r.truncated === 1 && r.nRecords === 0)
  }

  test("plain text is not Avro; a short buffer is not Avro") {
    assert(AvroEval.parse("not an avro file at all".getBytes("UTF-8"))
      .isAvro === 0)
    assert(AvroEval.parse(Array[Byte]('O', 'b', 'j', 1)).isAvro === 0)
  }

  test("synthesized classes round-trip through the walk") {
    val text = ("alpha beta gamma delta epsilon zeta").getBytes("UTF-8")
    // mode 0: null codec, 1 block, 3 records
    val r0 = AvroEval.parse(AvroEval.synth(text, 42L))
    assert(r0.codec === 1 && r0.nBlocks === 1 && r0.nRecords === 3 &&
      r0.truncated === 0)
    assert(r0.sumIds === 30L * 42 + 3)
    assert(r0.sumDelta === -(3L * 42 + 3)) // 42 % 97 == 42
    assert(r0.nTagged === 2)
    assert(new String(r0.first, "UTF-8") === "alpha beta#42")
    // mode 1: deflate, 2 blocks, sized metadata
    val r1 = AvroEval.parse(AvroEval.synth(text, 42L + (1L << 40)))
    assert(r1.codec === 2 && r1.nBlocks === 2 && r1.nRecords === 3 &&
      r1.truncated === 0 && r1.sumIds === r0.sumIds)
    // mode 2: corrupt sync on block 2
    val r2 = AvroEval.parse(AvroEval.synth(text, 42L + (2L << 40)))
    assert(r2.truncated === 1 && r2.nBlocks === 1 && r2.nRecords === 2 &&
      r2.sumIds === 20L * 42 + 1)
    // mode 3: deflate cut 6 bytes short
    val r3 = AvroEval.parse(AvroEval.synth(text, 42L + (3L << 40)))
    assert(r3.truncated === 1 && r3.nBlocks === 1 && r3.nRecords === 2 &&
      r3.codec === 2 && r3.sumDelta === -(2L * 42 + 1))
  }

  test("a near-Int.MaxValue claimed length refuses, never crashes " +
    "(Int-overflow bounds bypass)") {
    // metadata map: count 1, then a key whose claimed length is
    // 2_147_483_000 — kStart + kLen wraps negative in Int math and
    // would have sailed past the bounds check into new String(...)
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    o.write(zig(1L), 0, zig(1L).length) // one map entry
    val huge = zig(2147483000L)
    o.write(huge, 0, huge.length) // key length claim
    o.write("avro".getBytes("US-ASCII"), 0, 4) // a few real bytes
    val pad = new Array[Byte](64) // keep length >= 20
    o.write(pad, 0, pad.length)
    val r = AvroEval.parse(o.toByteArray)
    assert(r.isAvro === 0) // the documented refusal, not a throw
  }
}
