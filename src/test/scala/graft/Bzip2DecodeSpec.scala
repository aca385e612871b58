package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bzip2Eval

/** The bzip2 decode drilled the ZstdDecodeSpec way: the kernel's own
  * compressor round-trips every synthesis class, INTEROP fixtures from
  * the reference `bzip2` CLI (v1.0.x) decode bit-exactly — including a
  * TWO-BLOCK level-1 stream whose combined-CRC fold has teeth — and
  * the reverse direction was verified at development time (the CLI
  * decodes every synthesis class). Refusal and CRC discipline drilled
  * by corruption, plus a per-byte fuzz pass.
  */
class Bzip2DecodeSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("synthesized classes round-trip byte-exactly, CRCs verified") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    def dec(mode: Int) = {
      val r = Bzip2Eval.decode(Bzip2Eval.synth(text, 42L + (mode.toLong << 40)))
      assert(r != null && r.truncated === 0 && r.crcOk === 1, s"mode $mode")
      r
    }
    val base = "alpha beta#42"
    assert(new String(dec(0).content, utf8) === base)
    assert(new String(dec(1).content, utf8) === base + "q" * 40 + base)
    val r2 = dec(2)
    assert(r2.nBlocks === 2, "the block cap must split the stream")
    assert(new String(r2.content, utf8) === base + ";" + base + ";" + base)
    val r3 = dec(3)
    assert(r3.level === 1)
    assert(new String(r3.content, utf8) ===
      Seq(base, base, base, base).mkString("|"))
  }

  test("round trip holds across ids, words, and modes") {
    for (t <- Seq("one", "zz xx yy ww vv", "data pipeline corpus shard",
      "aaaa bbbb aaaa bbbb"); id <- Seq(0L, 13L, 777L); mode <- 0 to 3) {
      val r = Bzip2Eval.decode(Bzip2Eval.synth(t.getBytes(utf8),
        id + (mode.toLong << 40)))
      assert(r != null && r.truncated === 0 && r.crcOk === 1,
        s"id=$id mode=$mode '$t'")
    }
  }

  test("interop: bzip2 CLI level 9 (pangram + an RLE1-triggering run)") {
    val fix = b64(
      "QlpoOTFBWSZTWdjlCRsAACjRgAAEQAE////wIABIiHqJ6nqMEGjJ6Qin6k8UeoZD" +
      "ahiaAFm1I8WV4091fsZwruyPl7Au4OL6pZcCwqMaaZwZVIFtlBHsZvnZDuGkyzdV" +
      "Er/AGyDDTqE/xdyRThQkNjlCRsA=")
    val r = Bzip2Eval.decode(fix)
    assert(r != null && r.nBlocks === 1 && r.truncated === 0)
    assert(r.level === 9 && r.crcOk === 1)
    assert(md5(r.content) === "493cb5e29941a316742dd23c57b3c01e")
    assert(new String(r.content, utf8).startsWith("the quick brown fox"))
    assert(new String(r.content, utf8).contains("aaaaaaaaaaaaaaaa"))
  }

  test("interop: a TWO-BLOCK level-1 CLI stream (104 KiB) — the " +
    "combined-CRC fold crosses a block boundary") {
    val fix = b64(
      "QlpoMTFBWSZTWci9b+YAgb5ZgAAQQAB/4A4v0oBgDF8AAAAAAAAAAAAAAAAKAAaB" +
      "kyCgAGgZMgoABoGTIKAAaBkyCgAGgZMgKVUpv9NUqf/qqVGagek9P4T8TE8mp9T+" +
      "E1Npqampqampqam01NTU1NTU1NpqampqampqbTU1NTU1NTU2m01NTU1NTU1Npqam" +
      "pqampqbTU1NTU1NTU2mpqampqamptNTU+ampqamp5NTU1Npqampqampqampqampq" +
      "ampqampqampqampqampqampqampqampqampqampqampqampqampqampqampqampq" +
      "ampqampqampqampqampqam01NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1" +
      "NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTU1NTaa" +
      "mpqampqampqampqampqampqampqampqampqampqampqampqampqampqampqampqa" +
      "mpqampqampqampqampqampqampqampqampqamptNTU1NTU1NTU1NTU1NTU1NTU1N" +
      "TU1NTU1NTU1NTabTU1NTU1NTU2mpqampqamptNTU1NT/EkH+ah8kg+SgvkkHygL5" +
      "JB8oC+SQfKAvhIPkUPhIPhUP5hEr/P9QiV/Cfun4nxP2n4n7T90/af8J/lP5T6nJ" +
      "yfpOTk5OTk5OTU5OTk/E5OTk5OTk8nJycnJicnJycnJicnJyfU+p9p9Tk1PqfE+p" +
      "+JycnU5OTk+05OT9JycnJycnJyanJycn4nJycnJycnk5OTk5MTk5OTk5MTk5OT6n" +
      "1Pqfacmp9p8T6n4nJycnU5OT6nJyfpOTk5OTk5OTacnJyficnJycnJyeTk5OTkxO" +
      "Tk5OTkxOTk5PqfU+p9Tk1PqfKfU/E5OTk5OpyfU5OT9JycnJycnJyanJycn4nJyc" +
      "nJycnqcnJycmJycnJycmJycnJ9T6n1Pqcmp9T4n2n4nJycnJydT6nJyfpOTk5OTk" +
      "5OTU5OTk/E5OTk5OTk8nJycnJicnJycnJlOTk5PqfU+p9Tk1PqfE+p+U5OTk5OTk" +
      "+pycn6Tk5OTk5OTk1OTk5PxOTk5OTk5PJycnJyYnJycnJyYnJycn2n1PqfU5NT6n" +
      "xPqfidTk5OTk5PqcnJ+k5OTk5OTk5NTk5OT8Tk5OTk5OTycnJycmJycnJycmJycn" +
      "J9T7T6n1P5BDyftP2n7T+E8nk8nk8nk8nk8nk8nk8nqeTyeTyeTyeTyeTyeTyeTy" +
      "eTyeTyeTyeTyekg8nxPJ5PJ5PJ6nk8nk8nk8nk8nk8nk8nk8nk8nqeTyeTyeTyeT" +
      "yeTyeTyeTyeTyeTKUo+J5PJ+J5PJ5PJ5PJ5PJ5PJ5PU8nk8nk8nk8nk8nk8nk8nk" +
      "8nqeTyeTyeTyeTyeTyfqEoxMTE/ExMTExMTExMTExMTExMTKYmJiYmJiYmJiYmJl" +
      "MTExMT5CUZTExMTExMTExMTExMTExMTExMTExMTExMpiYmJiYmJiYmJiUoxMTExM" +
      "TKYmJiYmJiYmJiYmJiYmJiYmJiYmJiYmJlMTExMTAqmJiYmJiYmJiYmJlMTExMTE" +
      "xMTExMTExMTExMTExMTExMTEymJiYmJlMTExMTExMTExMTKYmJiYmJiYmJiYmJiY" +
      "mJiYmJiYmJiYmJiYmJiYmUxMTExMTExMTExMpiYmJiYmJiYmJiYmJiYmfE+JiYmJ" +
      "iYmJiYmUxMTExMTExMTExMTExMTExMTExMTExMTE/xCJX+oRK2ESv6REr9QiV/7C" +
      "JX9wiV/SIlf+QiV/8n35UEr+4RK/ERK/1CJX/8Ilf3CJWwiV/cIlfIRK/2YoKyTK" +
      "ayDsnMsgAcFrMAACCAAP/AHF+lAIAF4OYGcOBSZp+U1VGj1AAVSP/yaqpoAABWqn" +
      "+9qqkGgAAJqlR6p+qBk0DJ6naa7ur1VtYIpZZYgplZlZgilllVW21tttbbbW220o" +
      "UysyswRW1kmZYgplZlZgillliCXLKrmVmCKWWWIKZWZWZJpZlllta1rXPfPnvet6" +
      "1ret66ivhYKwTIrKGCsEyKwTBWUsFZS7ZznOMYx95znOMYwd3q7nr4XS+F74qxaB" +
      "VYVKbOiRlhaxeR0ELV2AsqaxIXy+X0QgQAvYG4Ggl8hE1GPCLbKBVbAIGw48nJ1q" +
      "WQIEJF0ANqsQqrZjkiTh0hZAgGyzYSLVXupG7eDpiyl0QAsAmwnOd5znGK8pdVXc" +
      "GzgNtgNkyvOc6cVcqZwbOA22A2Oc506c7FFDOQy4O3ZwYz2czMzlVWtUKmtLbnOZ" +
      "nKlJrigppczmZyqUpNKCmZnM3d0lKTSgqqaSlJpVUFNJSk3m7pKhujdDqFV4Cq8g" +
      "qu8KrkFV+BVcBVd4VX2FV+wquAquUKrwFV/BVcBVe4VXAVWEp2wqv8XckU4UJCWH" +
      "jmUA")
    val r = Bzip2Eval.decode(fix)
    assert(r != null && r.nBlocks === 2 && r.truncated === 0)
    assert(r.level === 1 && r.crcOk === 1)
    assert(r.content.length === 107239)
    assert(md5(r.content) === "374c0727442ede56031af48762f7314c")
  }

  test("corruption: a payload flip fails the block CRC; a truncation " +
    "keeps earlier blocks") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    val good = Bzip2Eval.synth(text, 7L)
    // flip a bit deep in the block body: either the stream refuses
    // (Huffman derails) or the CRC catches it — silence is the only
    // wrong answer
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x10).toByte
    val rb = Bzip2Eval.decode(bad)
    assert(rb == null || rb.crcOk === 0 || rb.truncated === 1)
    // two-block stream cut mid-second-block: block 1 serves
    val two = Bzip2Eval.synth(text, 9L + (2L << 40))
    val whole = Bzip2Eval.decode(two)
    assert(whole.nBlocks === 2)
    val cut = java.util.Arrays.copyOfRange(two, 0, two.length - 6)
    val rc = Bzip2Eval.decode(cut)
    assert(rc != null && rc.truncated === 1 && rc.nBlocks >= 1)
  }

  test("refusals: the randomized bit, bad level, plain text") {
    val good = Bzip2Eval.synth("alpha beta".getBytes(utf8), 7L)
    // set the deprecated randomized bit (bit 80+32 = the 113th bit:
    // header 32 + magic 48 + crc 32 = bit offset 112)
    val rand = good.clone()
    rand(14) = (rand(14) | 0x80).toByte // bit 112 = byte 14 bit 7
    val rr = Bzip2Eval.decode(rand)
    assert(rr == null || rr.truncated === 1)
    assert(Bzip2Eval.decode("BZh0junkjunkjunk".getBytes(utf8)) === null)
    assert(Bzip2Eval.decode("plain text, not an archive".getBytes(utf8)) === null)
    assert(Bzip2Eval.decode(null) === null)
  }

  test("fuzz: flips and garbage refuse or flag, never throw") {
    val frame = Bzip2Eval.synth("alpha beta gamma".getBytes(utf8), 5L)
    (0 until frame.length).foreach { i =>
      val bad = frame.clone()
      bad(i) = (bad(i) ^ 0xFF).toByte
      try Bzip2Eval.decode(bad)
      catch { case e: Throwable => fail(s"threw at flipped byte $i: $e") }
    }
    val rnd = new java.util.Random(0xB21B2)
    (0 until 300).foreach { k =>
      val b = new Array[Byte](k % 150 + 1)
      rnd.nextBytes(b)
      val withMagic = "BZh7".getBytes(utf8) ++ b
      try { Bzip2Eval.decode(withMagic); Bzip2Eval.decode(b) }
      catch { case e: Throwable => fail(s"threw on fuzz $k: $e") }
    }
  }

  test("interop: concatenated CLI streams (pbzip2/multistream shape) " +
    "decode end to end, not first-stream-only") {
    // bzip2 1.0.8: two separately-compressed files, `cat`-joined — the
    // Wikipedia multistream dump layout. Both streams' content must come
    // back, each stream's combined CRC verified independently.
    val fix = b64(
      "QlpoOTFBWSZTWfUl6DkAAKEZgEAAABAv796AMAEGANVP9J6NEhBoFA00MjJiBSpT" +
      "J6CNE0add1zx7Pmfh1SXMW5DZi2Luno1KcXYqRopdyGFiBdoKMpcRh2ZxMbMLKjb" +
      "MCnu4d6WdMb5114yxlvpo32xv82LjIZlhXdWqfFdI7Bgsl7lpwXbmsq75V7LBdKv" +
      "SvRXpX55l+19TdXGFc14V3VxWyuh9LqWg2V9LunIbYl5VwOeRqrxK5xkvG6vSta0" +
      "yr8L+HZP8XckU4UJD1Jeg5BCWmg5MUFZJlNZe5AYegABcxmAQAAAEC/v3oAwAQMA" +
      "1PQNT1U00ZAUDTQyMmIJqpTFPEZT1MnpffldcX3R6+dXlbiG3MswmMkS7cqzSDGM" +
      "0Lcg4FBEKQ6cuSSUqeY4G52jOFF4NuYzeXGQxEY1Cd6pVxMLF2QNLgDVa0DoB6mY" +
      "9ppyjKm3hMk6TP1ynBW1NadUxTSlurHSn6rcvhXY1TbCuSs/KsU2K52piO09FlGt" +
      "O6aDzTXBd03jePmdXFMYppT8TqmRXGie0/48D6LuSKcKEg9yAw9A")
    val r = Bzip2Eval.decode(fix)
    assert(r != null && r.truncated === 0 && r.crcOk === 1)
    assert(r.nBlocks === 2) // one block per stream at these sizes
    assert(r.content.length === 839 + 888)
    val txt = new String(r.content, utf8)
    assert(txt.startsWith("first stream: "))
    assert(txt.contains("second stream: "))
    assert(md5(r.content) === "0b44ec8cddf87166c5c04ec9937a1a1c")
  }

  test("trailing garbage after the footer flags truncated; zero padding " +
    "does not") {
    val one = Bzip2Eval.synth("alpha beta".getBytes(utf8), 7L)
    val garbage = one ++ "not a stream".getBytes(utf8)
    val rg = Bzip2Eval.decode(garbage)
    assert(rg != null && rg.truncated === 1) // partial no longer silent
    val padded = one ++ Array[Byte](0, 0, 0)
    val rp = Bzip2Eval.decode(padded)
    assert(rp != null && rp.truncated === 0 && rp.crcOk === 1)
  }

  test("compress: a period-2 repetitive 100 KB block (survives RLE1) " +
    "finishes fast — the BWT is prefix-doubling, not rotation-compare") {
    val n = 100000
    val worst = new Array[Byte](n)
    var i = 0
    while (i < n) { worst(i) = (if ((i & 1) == 0) 'a' else 'b').toByte; i += 1 }
    val t0 = System.nanoTime()
    val packed = Bzip2Eval.compress(worst, 9)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 20.0, f"period-2 worst case took $secs%.1f s")
    val r = Bzip2Eval.decode(packed)
    assert(r != null && r.truncated === 0 && r.crcOk === 1)
    assert(java.util.Arrays.equals(r.content, worst))
  }
}
