package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.XzContentEval

/** The xz/LZMA2 content decode drilled the family way: the writer's
  * streams round-trip (and the xz CLI decodes them — dev-verified),
  * while the LZMA-PROPER path — range coder, matched literals, rep
  * distances, pos-slot/align trees — is pinned by fixtures the
  * reference `xz` CLI (5.x) compressed: real LZMA at levels 1 and 9,
  * all three check kinds verified (CRC32, the ECMA-182 CRC64, SHA-256),
  * and a THREE-BLOCK stream whose index cross-check has teeth.
  */
class XzContentSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("crc64 matches the ECMA-182 check vector") {
    // the canonical vector: CRC64-XZ of "123456789"
    assert(XzContentEval.crc64("123456789".getBytes(utf8), 0, 9) ===
      0x995DC9BBDF1939FAL)
  }

  test("synthesized classes round-trip with all check kinds verified") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    def dec(mode: Int) = {
      val r = XzContentEval.decode(
        XzContentEval.synth(text, 42L + (mode.toLong << 40)))
      assert(r != null && r.truncated === 0 && r.checkOk === 1, s"mode $mode")
      r
    }
    val base = "alpha beta#42"
    val r0 = dec(0)
    assert(new String(r0.content, utf8) === base && r0.checkKind === 1)
    val r1 = dec(1)
    assert(r1.checkKind === 4) // CRC64
    val r2 = dec(2)
    assert(r2.nBlocks === 2 && r2.checkKind === 10) // SHA-256, 2 records
    assert(new String(r2.content, utf8) === base + "+beta")
    val r3 = dec(3)
    assert(r3.content.length === base.length + 70000) // chunk boundary
  }

  test("interop: xz CLI -9 (real LZMA, CRC64 verified)") {
    val fix = b64(
      "/Td6WFoAAATm1rRGBMBjeiEBHAAAAAAAAAAAAHUVabPgAHkAW10AOhoIznbH5enW" +
      "BzTD0Q6/zlXhqr3g5I+YAd2N5QdUnmUlXyc6an6000kDicKPurf1seXIkU2fEWjn" +
      "VHBa5sXXgrsvZdOp5Ove0OURA68LjgjdAAZKdhDs+8xCAAAAclamnGiZfqMAAX96" +
      "MEjxOB+2830BAAAAAARZWg==")
    val r = XzContentEval.decode(fix)
    assert(r != null && r.nBlocks === 1 && r.truncated === 0)
    assert(r.checkKind === 4 && r.checkOk === 1)
    assert(md5(r.content) === "582f8d85402a44b74842a23c8aae969f")
    assert(new String(r.content, utf8).startsWith("the quick brown fox"))
  }

  test("interop: xz CLI with SHA-256 check") {
    val fix = b64(
      "/Td6WFoAAArh+wyhBMBjeiEBFgAAAAAAAAAAALyFS6TgAHkAW10AOhoIznbH5enW" +
      "BzTD0Q6/zlXhqr3g5I+YAd2N5QdUnmUlXyc6an6000kDicKPurf1seXIkU2fEWjn" +
      "VHBa5sXXgrsvZdOp5Ove0OURA68LjgjdAAZKdhDs+8xCAAAAedeSaW7iZg8ReBsu" +
      "Om0idXCWfKHS27rLkhEVBt8SjZMAAZcBegAAAG6b1Pq26d8cAgAAAAAKWVo=")
    val r = XzContentEval.decode(fix)
    assert(r != null && r.checkKind === 10 && r.checkOk === 1)
    assert(md5(r.content) === "582f8d85402a44b74842a23c8aae969f")
  }

  test("interop: a THREE-BLOCK 104 KiB CLI stream — the index " +
    "cross-check walks all three records") {
    val fix = b64(
      "/Td6WFoAAATm1rRGA8CsBMC4AiEBFgAAVNooO+CcPwIkXQA2GkofCKAmA1nTuAp5" +
      "tvptQ4PFOCoozX38V3z4JchOcEkqs+WN7NwTiNAUMH8aFPUgMILr43bpilN97LAg" +
      "l4Ef9xXdTretZpYLRULzpvO79Zjj9ufkhPZSVy/F6w10w/gvvVUzpfWEmdvbcocp" +
      "9ivGFFQPGHplTicQKlr76VQDPuKgFTmmFbXWiQ2z/hlz41dGbVYEnLaecPTPwTor" +
      "XfZ69KgVheAPNr+B2YoXzah0XPB1aiFnnfiJUJzbr5ruRCu77oYHJChQkwDBc0W9" +
      "0beTN9VKRc7tW5NHKutNBtSQByswQlVhUKvFYIev1bHPtzkkCGu0Dl0mkn248Gni" +
      "EXZO6KgAbv0vVrci9t4qt+UQyMciGvMJrfygRVWp6eOJJ7PR/BjmUKHxxfWa2dwz" +
      "POZipry1/llNKMQ0m0aS1cKqEo2zDvunWiqkXsrI76EBYJuaB/iHXFibm40HVsA3" +
      "mQbcP7pPllHuO4gL1mweWiGELN9Bigk3r4yjE1p1rrRp2OSzEIL5EIwqSktl4Beh" +
      "prXhgb/v8kRxyqMTuDP8u8P1WnU0l50sfCNOcUPkss9VAzYfRU5PVKGkrw0/sIN9" +
      "/ZvWpU5MhORKSL2UYx4S/wVcLvwuh2wEIJvZPTXbnxkY73grQMS3/U/BhuJ5+1Vx" +
      "pO+XCijBqesinTwq+GQRwqh3cQYrzmkUyWd+HY9qONaXfP88RbtUdlm1jSDmSJgi" +
      "mL+ITdw4AAAdMYynCWrXwgPA4APAuAIhARYAALNQz9vgnD8B2F0AEA4AJ2jHw4kA" +
      "cyPirEOmlV5Gf8+3TiBMZVldxaXsS/y8Ac1fuFNrOOHn3M+CdzuNX8Z3krvyFHGc" +
      "rroN9/I9ri73OerzGfX6l1crac+na+Ulb+bOv81ZUWqb8V1Hy/RMuDvEHIZyiruY" +
      "SuVP83GdRoa8+8JMGdrZEyZPY/uuh+xwSe8EbpfCYANwL6TBbN3+3acMvL2P4nPQ" +
      "18uJWHl+EiII8WF5Y6CPNL0WQE1lpiNCy4tgoKFRiwLYvGI9q1KVbnJEZWUIcuIt" +
      "dxvgd9Vgx3o/7cfE5dTUHPravD7tN5eUS1QmXiN0joSNJFackf2G221W1O15XTKL" +
      "sye79OwXixtgNoaI49bdN2xGW/4VBUj2jov29OmJFPqxC9qLz8FLe0UPk/u5ziri" +
      "XCvDENUMDlXd92NHdfdp/OQR62e4/B9phq5Ng/9YnVRkYtcPOwzYNE9bxtcOleFT" +
      "4DAapi5vV8UfH+Z2khNndrTwuTv4wDjXZHO2mND7evoTqqnXVBx7/jrilO0b3hUE" +
      "2nts7UpY+mmt4hKWg7i3wIATKK3aCSTk9WbrfZHlYCa+BC3F1JT18K3PziSc2PCg" +
      "KBnATibA0HyOSvCSdNRqcfUbEaZYQ2ooVEnR9AW/gABcBR9J0kwuuAPApQTn1AEh" +
      "ARYAAO7ODP7gamYCHV0ANxlAAhESt6fz9PQk/rYIylgPCkOUln3+0dT6vhEIDO0I" +
      "SS+VrKGgvC5ml5+K7566LPVEudJ6RdAWCWycNom2e6uOoLENh+uA1kH6AEW/9tuS" +
      "v6PIzX/vdKbqW0cs4PwQZWEp3mx/rQFUGyELd8iDRSOl+l9XAcivW/l39KgVQpcX" +
      "s/z/bqhSFWseFPP1sYcVTk48HYVg1CaYVw9hrT+WbZbBbu1kYkSY1COnS6gM3p5/" +
      "w1RpVomOp2aTsUvTU0QVErELYOMG7Sj1spx0DPEgrytPCuV7Ao20GfbJI3eG5e//" +
      "yPYqsbIr//RUcrxNWoANfou3Mh7VutfPYL9oUjlt+7CoHhCof2LIctuI0VNwxD14" +
      "PrXABSxdEilI+uAbCz3dLfz4lB7I1DrXqSQYh60WoeZ72y+eQegrWfjxH5++xdMF" +
      "hDp2IJ6sbZW4re7QX2Fwj83qQsuDoKCzkUphov3ou7FdZd1z85YHgq5ymi5wDc4o" +
      "uekU268twQ51yvUBgoLJmRyH8y66/0EdM+TyHQ3uE+hGuqV7Qf87g3cusVkaN8sx" +
      "0zuiOqoGAuk4oxyybeue4i4/wiOoETKsSJK4LjFIuM0hmZo6ZzRCuANQendTFHzT" +
      "kLnfhWrb8EidjEqm24ps59YN0eVRWcKUCbMy+qt+WHmyFfV+6gzNenAt/uykTMod" +
      "mkntqAb/6snwghzV4bQxrScFLzmtuhGsvPIAAAAAAAAv9NLFL4s0uQADxATAuAL4" +
      "A8C4Ar0E59QBAAAA1NzITQn0YuYFAAAAAARZWg==")
    val r = XzContentEval.decode(fix)
    assert(r != null && r.nBlocks === 3 && r.truncated === 0)
    assert(r.checkOk === 1)
    assert(r.content.length === 107239)
    assert(md5(r.content) === "374c0727442ede56031af48762f7314c")
  }

  test("corruption: a flipped content byte fails the check; header-CRC " +
    "damage refuses the block") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    val good = XzContentEval.synth(text, 7L)
    // flip a byte inside the uncompressed chunk payload: the CRC32
    // check must catch it (the chunk layer itself has no checksum)
    val bad = good.clone()
    bad(12 + 12 + 3 + 4) = (bad(12 + 12 + 3 + 4) ^ 0x20).toByte
    val rb = XzContentEval.decode(bad)
    assert(rb == null || rb.checkOk === 0 || rb.truncated === 1)
    // damage the block-header CRC: nothing decoded, refuse
    val hdrBad = good.clone()
    hdrBad(12 + 8) = (hdrBad(12 + 8) ^ 0xFF).toByte
    val rh = XzContentEval.decode(hdrBad)
    assert(rh == null || rh.truncated === 1)
  }

  test("a lying index refuses (the seek map must match the decode)") {
    val good = XzContentEval.synth("alpha beta".getBytes(utf8), 7L)
    // find the index (after the last block): flip a VLI in it — the
    // index CRC is checked by q184's triage, but THIS kernel
    // cross-checks the values against what actually decoded, so break
    // both coherently is impossible without re-decoding; a simple bit
    // flip lands on truncated
    val bad = good.clone()
    bad(bad.length - 14) = (bad(bad.length - 14) ^ 0x01).toByte
    val r = XzContentEval.decode(bad)
    assert(r == null || r.truncated === 1)
  }

  test("refusals: plain text, spliced flags, short buffer") {
    assert(XzContentEval.decode("plain words only".getBytes(utf8)) === null)
    assert(XzContentEval.decode(Array[Byte](0xFD.toByte, '7', 'z')) === null)
    val good = XzContentEval.synth("alpha beta".getBytes(utf8), 7L)
    val badFlagCrc = good.clone()
    badFlagCrc(9) = (badFlagCrc(9) ^ 1).toByte // stream-flag CRC
    assert(XzContentEval.decode(badFlagCrc) === null)
  }

  test("fuzz: flips and garbage refuse or flag, never throw") {
    val frame = XzContentEval.synth("alpha beta gamma".getBytes(utf8), 5L)
    (0 until frame.length).foreach { i =>
      val bad = frame.clone()
      bad(i) = (bad(i) ^ 0xFF).toByte
      try XzContentEval.decode(bad)
      catch { case e: Throwable => fail(s"threw at flipped byte $i: $e") }
    }
    // and over a REAL LZMA fixture: the range decoder must never throw
    val lzma = b64(
      "/Td6WFoAAATm1rRGBMBjeiEBHAAAAAAAAAAAAHUVabPgAHkAW10AOhoIznbH5enW" +
      "BzTD0Q6/zlXhqr3g5I+YAd2N5QdUnmUlXyc6an6000kDicKPurf1seXIkU2fEWjn" +
      "VHBa5sXXgrsvZdOp5Ove0OURA68LjgjdAAZKdhDs+8xCAAAAclamnGiZfqMAAX96" +
      "MEjxOB+2830BAAAAAARZWg==")
    val rnd = new java.util.Random(0x172AL)
    (0 until 400).foreach { k =>
      val bad = lzma.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      try XzContentEval.decode(bad)
      catch { case e: Throwable => fail(s"threw on lzma fuzz $k: $e") }
    }
  }
}
