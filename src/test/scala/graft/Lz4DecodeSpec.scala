package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Lz4Eval

/** The LZ4 frame decode drilled the ZstdDecodeSpec way: XXH32 hand
  * vectors, encoder/decoder round trips across every synthesis class,
  * and INTEROP fixtures produced by the reference `lz4` CLI (v1.9.4) —
  * including a block-LINKED multi-block frame whose matches reach
  * across block boundaries, and flag layouts (block checksums, content
  * size) the synthesizer varies. The reverse direction was verified at
  * development time: the CLI decodes every synthesis class bit-exactly.
  */
class Lz4DecodeSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("xxh32 matches the canonical vectors") {
    assert(Lz4Eval.xxh32(Array.emptyByteArray, 0, 0) === 0x02CC5D05)
  }

  test("synthesized classes round-trip byte-exactly") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    def dec(mode: Int) = {
      val r = Lz4Eval.decode(Lz4Eval.synth(text, 42L + (mode.toLong << 40)))
      assert(r != null && r.truncated === 0, s"mode $mode")
      assert(r.checksumOk === 1, s"mode $mode checksums")
      r
    }
    val base = "alpha beta#42"
    assert(new String(dec(0).content, utf8) === base)
    val r1 = dec(1)
    assert(new String(r1.content, utf8) === base + "|" + base + "y" * 10)
    assert(r1.checksums === 2) // block + content
    val r2 = dec(2)
    assert(new String(r2.content, utf8) === base + "/" + base)
    assert(r2.nBlocks === 2 && r2.declared === r2.content.length.toLong)
    val r3 = dec(3)
    assert(r3.nFrames === 2)
    assert(new String(r3.content, utf8) === base + "+beta")
    val r4 = dec(4)
    assert(r4.content.length === base.length + 300)
  }

  test("round trip holds across ids, words, and modes") {
    for (t <- Seq("one", "zz xx yy ww vv", "data pipeline corpus");
         id <- Seq(0L, 13L, 777L); mode <- 0 to 4) {
      val r = Lz4Eval.decode(Lz4Eval.synth(t.getBytes(utf8),
        id + (mode.toLong << 40)))
      assert(r != null && r.truncated === 0 && r.checksumOk === 1,
        s"id=$id mode=$mode '$t'")
    }
  }

  test("interop: lz4 CLI level 9 (independent blocks, content checksum)") {
    val fix = b64(
      "BCJNGGRAp1sAAADwEHRoZSBxdWljayBicm93biBmb3gganVtcHMgb3ZlciAfAK9s" +
      "YXp5IGRvZy4gLQAa8BlwYWNrIG15IGJveCB3aXRoIGZpdmUgZG96ZW4gbGlxdW9y" +
      "IGp1Z3MuAAAAADbdC8Q=")
    val r = Lz4Eval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(new String(r.content, utf8) ===
      "the quick brown fox jumps over the lazy dog. the quick brown " +
        "fox jumps over the lazy dog. pack my box with five dozen " +
        "liquor jugs.")
    assert(r.checksums === 1 && r.checksumOk === 1)
  }

  test("interop: CLI with block checksums AND declared content size") {
    val fix = b64(
      "BCJNGHxAggAAAAAAAAArWwAAAPAQdGhlIHF1aWNrIGJyb3duIGZveCBqdW1wcyBv" +
      "dmVyIB8Ar2xhenkgZG9nLiAtABrwGXBhY2sgbXkgYm94IHdpdGggZml2ZSBkb3pl" +
      "biBsaXF1b3IganVncy61opPzAAAAADbdC8Q=")
    val r = Lz4Eval.decode(fix)
    assert(r != null && r.truncated === 0)
    assert(r.declared === 130L && r.content.length === 130)
    assert(r.checksums >= 2 && r.checksumOk === 1) // blocks + content
  }

  test("interop: a 203 KiB block-LINKED multi-block CLI frame (matches " +
    "reach across block boundaries)") {
    val fix = b64(
      "BCJNGExA0isDAAAAAAArahMAAPAKcmVjIDAgYWxwaGEgYmV0YSBnYW1tYSAwChkA" +
      "HjEZABExGQAeMhkAETIZAB4zGQARMxkAHjQZABE0GQAeNRkAETUZAB42GQARNhkA" +
      "HjcZABE3GQAeOBkAETgZAB45GQASOeEALjAg4gAD/AAfMRYBBh8yFwEFLzEzGAEF" +
      "LzE0GQEFLzE1GgEFLzE2GwEFLzE3HAEFLzE4HQEFLzE5HgEFLzIwHwEFLzIxHwEG" +
      "LzIyHwEFLzIzNgIGHzQfAQUvMjUfAQUvMjYfAQUvMjcfAQUvMjgfAQUvMjkfAQUv" +
      "MzAfAQUvMzEfAQUvMzIfAQYvMzMfAQUvMzQfAQUvMzVWAwYfNh8BBS8zNx8BBS8z" +
      "OB8BBS8zOR8BBS80MB8BBS80MR8BBS80Mh8BBS80Mx8BBi80NB8BBS80NR8BBS80" +
      "Nh8BBS80N3YEBh84HwEFLzQ5HwEFLzUwHwEFLzUxHwEFLzUyHwEFLzUzHwEFLzU0" +
      "HwEGLzU1HwEFLzU2HwEFLzU3HwEFLzU4HwEFLzU5HwEFLzYwlwUGHzEfAQUvNjIf" +
      "AQUvNjMfAQUvNjQfAQUvNjUfAQYvNjYfAQUvNjcfAQUvNjgfAQUvNjkfAQUvNzAf" +
      "AQUvNzEfAQUvNzK3BgYfMx8BBS83NB8BBS83NR8BBS83Nh8BBi83Nx8BBS83OB8B" +
      "BS83OR8BBS84MB8BBS84MR8BBS84Mh8BBS84Mx8BBS84NNcHBh81HwEFLzg2HwEF" +
      "Lzg3HwEGLzg4HwEFHzDYBwYPuAYGD5gFBg94BAYPdwQGD1cDBg83AgYPFwEGDxYB" +
      "BR857ggHDwQKBx8xFgEGDwYKBg4ICQXuCA8ICgYOCAkF7ggPCgoGDggJBe4IDwwK" +
      "Bg4ICQXuCA8NCgcPCQkBDwgJBx4xCAkKNgIPDQoGDggJBe4IDw0KBg4ICQXuCA8N" +
      "CgYfMg0KBg4ICQXuCA8NCgcPCQkBDggJC+4IDw0KBg4ICQVWAw8NCgYOCAkF7ggP" +
      "DQoGDggJBe4IDw0KBg4ICQXuCA8NCgcPCQkBDwgJBx4xCAkK7ggPDQoGDggJBXYE" +
      "Dw0KBh80DQoGDggJBe4IDw0KBg4ICQXuCA8NCgcPCQkBDggJC+4IDw0KBg4ICQXu" +
      "CA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQXuCA8NCgcPCQkBDwgJBx4xCAkK" +
      "7ggPDQoGHzYNCgYOCAkF7ggPDQoGDggJBbcGDw0KBg4ICQXuCA8NCgcPCQkBDggJ" +
      "C+4IDw0KBg4ICQXuCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQXuCA8NCgcP" +
      "CQkBDwgJBx4xCAkJ2AcPuAYGD5gFBg94BAYPdwQGD1cDBg83AgYPFwEGDxYBBh85" +
      "7ggGDwQKBx8xFgEGDwYKBg4ICQXuCA8ICgYOCAkF7ggPCgoGDggJBe4IDwwKBg4I" +
      "CQbuCA8NCgYPERICDggJCu4IDw0KBg4ICQXuCA8NCgYOCAkF7ggPDQoGDggJBfsS" +
      "Dw0KBg4ICQbuCA8NCgYPERICDggJCu4IDw0KBg4ICQVWAw8NCgYOCAkF7ggPDQoG" +
      "DggJBe4IDw0KBg4ICQbuCA8NCgYPERICDggJCu4IDw0KBg4ICQXuCA8NCgYOCAkF" +
      "+xIPDQoGDggJBe4IDw0KBg4ICQbuCA8NCgYPERICDggJCu4IDw0KBg4ICQXuCA8N" +
      "CgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQbuCA8NCgYPERICDggJCu4IDw0KBg4I" +
      "CQX7Eg8NCgYOCAkF7ggPDQoGDggJBbcGDw0KBg4ICQbuCA8NCgYPERICDggJCu4I" +
      "Dw0KBg4ICQXuCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQbuCA8NCgYPERIC" +
      "DggJCR8BD/oSBg/5EgYP+BIGD/cSBg/2EgYP9RIGD/QSBg/zEggOFgEOCAkK7ggP" +
      "BAoHHzEWAQYPBgoGDggJBe4IDwgKBg4ICQXuCA8KCgYOCAkF7ggPDAoHDwkJAQ4I" +
      "CQvuCA8SFAcfMu4IBg8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQX7Eg8NCgcP" +
      "CQkBDggJC+4IDyAeBw8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQX7Eg8NCgYO" +
      "CAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF7ggPDQoGDggJBXYEDw0KBg4ICQXu" +
      "CA8NCgYOCAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF7ggPDQoGDggJBYQODw0K" +
      "Bg4ICQWXBQ8NCgYOCAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF7ggPDQoGDggJ" +
      "Be4IDw0KBg4ICQXuCA8NCgYOCAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF+xIP" +
      "DQoGDggJBe4IDw0KBg4ICQXuCA8NCgYOCAkG1wcPDQoGDxESAg4ICQrpGw8NCgYP" +
      "+hIGD/kSBg/4EgYP9xIGD/YSBg/1EgYPAR0IDxcBBg8WAQUfOe4IBg8ECgcfMRYB" +
      "Bg8GCgYOCAkF7ggPCAoGDggJBe4IDwoKBg4ICQbuCA8MCgYPERICDggJCu4IDxIU" +
      "Bx8y7ggGDw0KBg4ICQXuCA8NCgYOCAkF7ggPDQoGDggJBvsSDw0KBg8REgIOCAkK" +
      "7ggPIB4HHzPuCAYPDQoGDggJBVYDDw0KBg4ICQXuCA8NCgYOCAkG7ggPDQoGDxES" +
      "Ag4ICQruCA8uKAcPDQoGDggJBe4IDw0KBQ8ICQIfNwgJBh44CAkK7ggPDQoHDwkJ" +
      "AQ4ICQvuCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQWEDg8NCgYOCAkFlwUP" +
      "DQoHDwkJAQ4ICQvuCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQXuCA8NCgYO" +
      "CAkF7ggPDQoHDwkJAQ4ICQvuCA8NCgYOCAkF7ggPDQoGDggJBfsSDw0KBg4ICQXu" +
      "CA8NCgYOCAkF7ggPDQoHDwkJAQ4ICQvuCA8NCgYOCAkF6RsPDQoGD/oSBg/5EgYP" +
      "+BIGD/cSBg/2EgYPDycIDzcCBg8XAQYPFgEFHznuCAYPBAoHHzEWAQYPBgoGDggJ" +
      "Be4IDwgKBg4ICQXuCA8KCgcPCQkBDggJC/sSDw0KBg4ICQXuCA8SFAcfMu4IBg8N" +
      "CgYOCAkF7ggPDQoGDggJBe4IDw0KBw8JCQEOCAkL7ggPDQoGDggJBe4IDyAeBx8z" +
      "7ggGDw0KBg4ICQVWAw8NCgYOCAkF7ggPDQoHDwkJAQ4ICQvuCA8NCgYOCAkF7ggP" +
      "LigHHzTuCAYPDQoGDggJBe4IDw0KBg4ICQX7Eg8NCgcPCQkBDggJC+4IDw0KBg4I" +
      "CQXuCA88MgcPDQoGDggJBe4IDw0KBg4ICQWEDg8NCgYOCAkGlwUPDQoGDxESAg4I" +
      "CQruCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQXuCA8NCgYOCAkG7ggPDQoG" +
      "DxESAg4ICQruCA8NCgYOCAkF7ggPDQoGDggJBfsSDw0KBg4ICQXuCA8NCgYOCAkG" +
      "7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF6RsPDQoGD/oSBg/5EgYP+BIGD/cSBg8d" +
      "MQgPVwMGDzcCBg8XAQYPFgEFHznuCAYPBAoHHzEWAQYPBgoGDggJBe4IDwgKBg4I" +
      "CQbuCA8KCgYPERICDggJCvsSDw0KBg4ICQXuCA8SFAcPDQoGDggJBTYCDw0KBg4I" +
      "CQXuCA8NCgYPCQkCHzAREgcOCAkK7ggPDQoGDggJBe4IDyAeBx8z7ggGDw0KBg4I" +
      "CQVWAw8NCgYOCAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF7ggPLigHHzTuCAYP" +
      "DQoGDggJBe4IDw0KBg4ICQb7Eg8NCgYPERICDggJCu4IDw0KBg4ICQXuCA88Mgcf" +
      "Ne4IBg8NCgYOCAkF7ggPDQoGDggJBu4IDw0KBg8REgIOCAkK7ggPDQoGDggJBe4I" +
      "D0o8Bw8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBw8JCQEOCAkLtwYPDQoGDggJBe4I" +
      "Dw0KBg4ICQXuCA8NCgYOCAkF+xIPDQoGDggJBe4IDw0KBw8JCQEOCAkL7ggPDQoG" +
      "DggJBe4IDw0KBg4ICQXpGw8NCgYP+hIGD/kSBg/4EgYPKzsID3cEBg9XAwYPNwIG" +
      "DxcBBg8WAQUfOe4IBg8ECgcfMRYBBg8GCgYOCAkF7ggPCAoHDwkJAQ4ICQvuCA8L" +
      "CgYOCAkF+xIPDQoGDggJBe4IDxIUBx8y7ggGDw0KBg4ICQXuCA8NCgcPCQkBDggJ" +
      "C+4IDw0KBg4ICQXuCA8NCgYOCAkF7ggPIB4HHzPuCAYPDQoGDggJBVYDDw0KBw8J" +
      "CQEOCAkL+xIPDQoGDggJBe4IDw0KBg4ICQXuCA8uKAcfNO4IBg8NCgYOCAkF7ggP" +
      "DQoHDwkJAQ4ICQvuCA8NCgYOCAkF7ggPDQoGDggJBe4IDzwyBx817ggGDw0KBg4I" +
      "CQXuCA8NCgcPCQkBDggJC5cFDw0KBg4ICQXuCA8NCgYOCAkF7ggPSjwHHzbuCAYP" +
      "DQoGDggJBfsSDw0KBw8JCQEOCAkL7ggPDQoGDggJBe4IDw0KBg4ICQXuCA9YRgcP" +
      "DQoGDggJBfsSDw0KBg4ICQbuCA8NCgYPERICDggJCu4IDw0KBg4ICQXuCA8NCgYO" +
      "CAkF6RsPDQoGD/oSBg/5EgYPOUUID3gEBg93BAYPVwMGDzcCBQ/zEgcPFgEFHznu" +
      "CAYPBAoHHzEWAQYPBgoGDggJBu4IDwgKBg8REgIOCAkK7ggPCwoGDggJBfsSDw0K" +
      "Bg4ICQXuCA8SFAcfMu4IBg8NCgYOCAkG7ggPDQoGDxESAg4ICQruCA8NCgYOCAkF" +
      "7ggPDQoGDggJBe4IDyAeBx8z7ggGDw0KBg4ICQZWAw8NCgYPERICDggJCvsSDw0K" +
      "Bg4ICQXuCA8NCgYOCAkF7ggPLigHHzTuCAYPDQoGDggJBu4IDw0KBg8REgIOCAkK" +
      "7ggPDQoGDggJBe4IDw0KBg4ICQXuCA88MgcfNe4IBg8NCgYOCAkG7ggPDQoGDxES" +
      "Ag4ICQqXBQ8NCgYOCAkF7ggPDQoGDggJBe4ID0o8Bx827ggGDw0KBg4ICQb7Eg8N" +
      "CgYPERICDggJCu4IDw0KBg4ICQXuCA8NCgYOCAkF7ggPWEYHHzfuCAYPDQoGDggJ" +
      "Bu4IDw0KBg8REgIOCAkK7ggPDQoGDggJBdcHDw0KBg4ICQXuCA9mUAcPDQoGD/oS" +
      "Bg9HTwgPmAUGD3gEBg93BAYPVwMGDzcCBg8XAQYPFgEFHznuCAYPBAoHHzEWAQYP" +
      "BgoHDwkJAQ4ICQvuCA8JCgYOCAkF7ggPCwoGDggJBfsSDw0KBg4ICQXuCA8SFAcf" +
      "Mu4IBg8NCgcPCQkBDggJC+4IDw0KBg4ICQXuCA8NCgYOCAkF7ggPDQoGDggJBe4I" +
      "DyAeBx8z7ggGDw0KBw8JCQEOCAkL7ggPDQoGDggJBfsSDw0KBg4ICQXuCA8NCgYO" +
      "CAkF7ggPLigHHzTuCAYPDQoHDwkJAQ4ICQt2BA8NCgYOCAkF7ggPDQoGDggJBe4I" +
      "Dw0KBg4ICQXuCA88MgcfNe4IBg8NCgcPCQkBDggJC4QODw0KBg4ICQWXBQ8NCgYO" +
      "CAkF7ggPDQoGDggJBe4ID0o8Bw8NCgYOSFEG7ggPDQoGDxESAg4ICQruCA8NCgYO" +
      "CAkFtwYPDQoGDggJBe4IDw0KBQ8ICQIeOAgJCu4IDw0KBw8JCQEOCAkL7ggPDQoG" +
      "DggJBe4IDw0KBg4ICQXXBw8NCgYOCAkF7ggPZlAHDw0KBg9VWQgPuAYGD5gFBg94" +
      "BAYPdwQGD1cDBg83AgYPFwEGDxYBBR857ggGDwQKBx8xFgEHDwYKBg8REgIOCAkK" +
      "7ggPCQoGDggJBe4IDwsKBg4ICQX7Eg8NCgYOCAkF7ggPEhQHHzLuCAcPDQoGDxES" +
      "Ag4ICQruCA8NCgYOCAkF7ggPDQoGDggJBe4IDw0KBg4ICQXuCA8gHgcfM+4IBw8N" +
      "CgYPERICDggJCu4IDw0KBg4ICQX7Eg8NCgYOCAkF7ggPDQoGDggJBe4IDy4oBx80" +
      "7ggHDw0KBg8REgIOCAkKdgQPDQoGDggJBe4IDw0KBg4ICQXuCA8NCgYOCAkF7ggP" +
      "PDIHHzXuCAcPDQoGDxESAg4ICQqEDg8NCgYOCAkFlwUPDQoGDggJBe4IDw0KBg4I" +
      "CQXuCA9KPAcfNu4IBw8NCgYPERICDggJCu4IDw0KBg4ICQXuCA8NCgYOCAkF7ggP" +
      "DQoGDggJBe4ID1hGBx837ggHDw0KBg8REgIOCAkK7ggPDQoGDggJBe4IDw0KBg4I" +
      "CQXXBw8NCgYOCAkF7ggPZlAHDw0KBg9ZY///////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "//////////////////////////////////////////////////8pUG1tYSAzCgEA" +
      "AA9ZY///////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "///////////////////////////oUHBoYSBiCgEAAA9ZY///////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////" +
      "///oUHJlYyAzNQAAAA9ZY///////////////////////////////////////////" +
      "///////////////lUG1tYSAyAAAAAPAMV78=")
    val r = Lz4Eval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(r.nBlocks >= 3, s"expected multi-block, got ${r.nBlocks}")
    assert(r.content.length === 207826)
    assert(md5(r.content) === "a7caecc9ed9fdd5cd599efd7ee619cc9")
    assert(r.checksumOk === 1)
  }

  test("refusals: bad HC, flipped checksum, truncation, offset 0, legacy") {
    val good = Lz4Eval.synth("alpha beta".getBytes(utf8), 7L)
    // header-checksum byte corrupted: the frame refuses whole
    val badHc = good.clone()
    badHc(6) = (badHc(6) ^ 0x55).toByte // HC for the minimal descriptor
    val rh = Lz4Eval.decode(badHc)
    assert(rh == null || rh.nFrames === 0)
    // flipped content checksum: content serves, checksumOk = 0
    val badCk = good.clone()
    badCk(badCk.length - 1) = (badCk(badCk.length - 1) ^ 1).toByte
    val rc = Lz4Eval.decode(badCk)
    assert(rc != null && rc.checksumOk === 0)
    // truncation mid-block refuses the frame
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 9)
    val rt = Lz4Eval.decode(cut)
    assert(rt == null || (rt.truncated === 1 && rt.nFrames === 0))
    // the LEGACY frame magic is out of stated scope
    assert(Lz4Eval.decode(Array[Byte](0x02, 0x21, 0x4C, 0x18, 0, 0, 0)) === null)
    assert(Lz4Eval.decode("plain text here".getBytes(utf8)) === null)
  }

  test("fuzz: flips and garbage refuse, never throw") {
    val frame = Lz4Eval.synth("alpha beta gamma".getBytes(utf8),
      5L + (1L << 40))
    (0 until frame.length).foreach { i =>
      val bad = frame.clone()
      bad(i) = (bad(i) ^ 0xFF).toByte
      try Lz4Eval.decode(bad)
      catch { case e: Throwable => fail(s"threw at flipped byte $i: $e") }
    }
    val rnd = new java.util.Random(0xF00D)
    (0 until 300).foreach { k =>
      val b = new Array[Byte](k % 120 + 1)
      rnd.nextBytes(b)
      val withMagic = Array[Byte](0x04, 0x22, 0x4D, 0x18) ++ b
      try { Lz4Eval.decode(withMagic); Lz4Eval.decode(b) }
      catch { case e: Throwable => fail(s"threw on fuzz $k: $e") }
    }
  }
}
