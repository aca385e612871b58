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

  test("interop: FIVE-block xz CLI stream (block size 4001, not 4-aligned) " +
    "decodes whole — pos/lp contexts reset per dictionary reset") {
    // xz 5.8.2: `xz --block-size=4001 -6` over 16,972 bytes -> 5 blocks of
    // 4001/4001/4001/4001/968 decoded bytes. 4001 & pbMask != 0, so blocks
    // 2..5 desync if posState uses the absolute output position instead of
    // the position since the block's dictionary reset (xz -T multithreaded
    // output has the same shape).
    val fix = b64(
      "/Td6WFoAAATm1rRGA8DlBKEfIQEWAAAAg1NWUuAPoAJdXQAzHIoiiL3XqANmxAIe" +
      "oR1BpSyFhX+QS/zGckyqsWGM0u95uL4ESVj5GDJOJD9Z/KptGpHDcWhY5OzJvMmd" +
      "/UihkILYssLdMY7aWuOSTeIMO9QGdPcIP1ixNQBgFSuC1gVvOFv0/xvBJUJrd/Be" +
      "wG5m3fm3lhSFwV1hwCmQly+RphFSQLNQpJi4xnK0fwFg/zvTrw+h+kETrV1ILF7i" +
      "TQ8yv2LRf8db0j/x39vCNxukBrDbenAlLprnbKQRfCSKnV2l1vVrJDPQ5+jisShP" +
      "3TqOAguRxhuZxltFTENq1VGc2iHJ8l06iAc+FeoLrj7+L0fc2qaZKuCFQ0UEVn+B" +
      "llngFVoCH17gdu1aIi1yBLw9hU5aO5SjjCSCqfTxu4WNulws6bTTe4MVg7xCHXoB" +
      "cNQ3EOUblQ4OgLfXXJcxK3NglQG/73zwahkSSnZCW3wamptYZr56tG9hU0pnlc0b" +
      "dc68k1Xg99PpLguQFDQeTr2kvs1xzqQiiaNk38O5zgk7OxUcS/OD/qYG0YDtAJtb" +
      "E9ML/kARlrsdp3JX315s1nz3cu64+0QIYnb97JLLbcU/ZMOr/T4BV3wyILePo5H8" +
      "/aUGWS6jWXMk5XXxLFZYHa0/YWWNCnV8mSt+Zrcmwu2bMSi9OuaW+Qlke0ClI8K1" +
      "U+z6Juhxc+Q7iIJMkkrVRYZ8jsLLbLXdJQbA40DauVPKNYzBeyrtpgQ4VC05oPmT" +
      "BAxj5I0uGfArnzWozyXu97zvFpUfu/bS3x8jWKueiATj40BauSZmUPV2MDE7tNqD" +
      "71g6K/LoMEAkj8247eMUOwAAAAAVW+r+VL3ARgPA8gShHyEBFgAAABLJJJfgD6AC" +
      "al0AMJzJLxGVsDqiDVKFW5dbOyGDJYLVsnIcgc+dciM9pV1STu9ZI4+i1Bb2UqJG" +
      "3x9Fy1FjBGm5sCPwk/y62FA+BzxiXwHjc7nK79Z/wav+iFIBT0BP/mHFxn019DJ3" +
      "QckINqO/cbEA0diD+Bm8oqUxB3pUv8KwtjdZNuY4lc9ltieqVnwc7D8wFo6X9gmT" +
      "/Saoysz8xXiEGjbFCAHmyATGHB4yR+da6PzRSh7eTCRexKmfrw2AoB17Z2Ze37Sb" +
      "XnEWwbYsFSvmqMu7Pf2RejLbOGSktm8f/7XPDvNhAxdFBxjQWd1siYEsw+mwRQWa" +
      "dB9cqoWdAsM7dW1VYqhN+v4blq4OSW0YaJuEa2bRnAAKT0myJUe7dC7iQesbvLpO" +
      "XYeeubV8bCSNyzQnP3UYYAjpCCils1aIXtIB/pPZgdBNh9kiNDYYwhrOygjQtO4p" +
      "/+3ybJeljxANV78lT8hA08HUy/CLqRKdWqNZFvsVCFc3FLZf/L32l+NmmNhaWAGF" +
      "LOKjwlap0V5kdD8tyohfdsTD/zwPp3MQpNalrbYlz4KJTmjT3Wlyt7eawpMlbyX+" +
      "T/SWN9AcA8E2m3WO1oEUMKcrmCeokmwIIVSl1B092cqqBzuDU18NuWzEGB8cEkXr" +
      "XDxv1RQMmveULyGZxQUyiEYI19O2ZydIePy5FJIQfyiM+AS8zVClv3OqbQ34y3Ao" +
      "Z/j/pjuYDnBa2lHXbRfjl50gGKfuV6FF5p5kQy1+neRH1g5ijpUXsT50CZwJSvEH" +
      "/QqvHpHCc1scfcPm3YbliU+Elf8zykSPGzxvEI7zzqyYou3Qxo2/cCsH/WyWAAAA" +
      "FeIzuxiDZaADwOwEoR8hARYAAABJeEOu4A+gAmRdADaaSh9MwcteZKJHG9cLbrx6" +
      "C0ITko35pMKxe1vtCQnm+DQtNy67TTvyZPR/xuofm86s4HXBbqq3BqoMpxa8AbKI" +
      "yzhx4s8+NJ0Tpp2FqwtBto+rMJQ6R7f8IiC4ucaLxdX3BdAV2P28ZEnlXo3A5DuO" +
      "+v/vGR03mmdLT/XoPLMS2FC5aPVNCGbsrr7X0oLX/XhX9scHTq2oi3ONg+fEhDEf" +
      "DHxzjD3eYnK1gjg4L7uef+qH4tSfKkc/S3eAcYxysOFIkPVtWyLyQJs6UUIDJZ+K" +
      "uRTeTiYW35pMdvtftd5ID5n4m2o14xuEIRbwOXGaPPYZ372ZkPKM4Q9IkTge+vsR" +
      "ammEycV+N83Znkpbz1v3AuZAKkr6eCeDirAy+2Mh8yEvMZ3Nf2tEzHUtx4LOKrzu" +
      "FMuXj+uurv2GRji3HRdCIm8elq1ubHlAGnrI+W5JEYB/d9NswZIkNGcK/YyPiw8d" +
      "1JoswqW8KPOzYS+CmWsVi3afPTzS37bGfVVhp0hogeVPzf+0V4C6lOhkadZ8vJcz" +
      "SfTz7SH6DXoEAQAarfkXzsp2Up2+4g06L8VPrKPFqhlg2B+/RgyREK+ivrM9JCEd" +
      "t0VGaOn8AlGjEq/CN1ftYXOHsGdhMBR0fAiq3EiLF+k9MDwRsJ9UgLMgJcbegtXn" +
      "Y8pBOV426/KP9rhNJfn6qKKz9JVwX1wwuXvEO8LhygLnBjZMDnRVj1gLKGn6z1aA" +
      "ijFMMm6F5aVj2ODJ7TXQuJ1qAVIpOPlTxXYBuDDOAQXwN6zPH/IlH2rGNn+qgfIi" +
      "TSWAbMbL1r1mHorXETBUwdR4vgADHy2iBQvhQQPA6gShHyEBFgAAAA4IXaPgD6AC" +
      "Yl0AMpuABXJLatbflAwJk3wmrHpEPetrpdUuQEIz5LdMFAQ6eVM7udE9ejsXpYms" +
      "4Tp7H+3D9hYxHFImaeTeOJSulr6Tm1kemGXcS5Vozdld+sHsQpWI3Gxha3oB0JXe" +
      "pJiD+IHMmwsBmrtPjIgJrtBxst0M5sctDJfiwLiqd7A0Y0S1/3VvLHdw5ZAJQ9Fk" +
      "xqpu2gsQvASLXr5RvtEVZkNG6hbIsQkxSXLCSRNz911K7Ijqb1v20dYRoL5GGtZ0" +
      "heiGSx+SqdqIGmG6pNE8Nfe+iibHbbppZPibCMsnAvpxlVX5xODw2riuLGVp2vH5" +
      "QUx34PRUxI904Q0VdyjQC0IEYbuA89ohQ/jb48gt6H6k6TviY8RSPUBgIuvkJ5C0" +
      "hnE6CS71C6rftJ/zk1qWv+4B4Bnaucn+yHYn8hmwgTEMCaB2Qa4OdNMAyqvhFm5y" +
      "Y9EDPiBfnXiRnf7FX5cVhLpIA7uwOb4EjVKVNAsoLhDWVNy64ss8obGoX7f6GdHt" +
      "OZY55UYdUioxsgfO71re1rnh4Z4hbIseM+roW79ntP5xvlMMuF3EFENfuBkVJ7qP" +
      "NEL2upxhsd979iwR2e1b5HgIIzeWFXK+Bu6k5nVoL7mxyCrvcrLYtTD5wZ6r0Cgw" +
      "xvglmDh5QSO/AhYChUXgQ/R+Pjiep3RoZQY2SWbkfxUCuY0rksjPIz1al3EgyWex" +
      "WQKKsOC+L55PlrG6nqtMMD70j/geR8VcszkitfCnO0IX29nLBJsojU0MtjLgAhHG" +
      "kSg1tL6u+aYuff6f5qq5023nc1rdpHN93ZolfBbWoF7jiFeOQgAAADfceUfRjqpZ" +
      "A8DqAcgHIQEWAAAAeCRfcuADxwDiXQA7mwAF0d75dmrqSzpHmeuYEgRO/uJSAxbd" +
      "PwYvmW3ZO/7c8xonfmpg9XFK3jSsqeLnmLPMBbcjjvrujS59f+qEvCfO0W7Qnkn7" +
      "JEQ3Zg5O8KfotVIiahS8PiCH3Xl/fvmtQ+mTvzosQxdnsabMumNmzpei4c17va+n" +
      "+LOL9rvVYOA/E7L7Pyf0ZUAOQbSofbYuX9wXfYn35AB0p86/kXzJyB3MVUApBnWL" +
      "WRQp3CiEDyPS/GOrPjEHLZ8azxk8bNKI0cqIhZ5X8OWObgCb4s9LcZo2Z0c8FdaD" +
      "INrv95eJj1YAAAAA0NUKdTibsugABf0EoR+KBaEfhAWhH4IFoR+CAsgHAAByRhQc" +
      "p4b2YAYAAAAABFla")
    val r = XzContentEval.decode(fix)
    assert(r != null, "multi-block CLI stream refused")
    assert(r.nBlocks === 5)
    assert(r.truncated === 0 && r.checkOk === 1)
    assert(r.content.length === 16972)
    assert(md5(r.content) === "50a649a761b828aefe11ad0fd06f790f")
  }

  test("hostile: CRC-valid block header whose size-VLI runs into the CRC " +
    "bytes refuses instead of reading past the buffer") {
    // brute-forced so the header CRC itself carries the VLI continuation
    // bits: the 9-byte VLI terminates at b.length-1, leaving the filter-id
    // read out of bounds in an unbounded walk
    val fix = b64("/Td6WFoAAAFpIt42AkCAhf////+0pgHa")
    val r = XzContentEval.decode(fix) // must not throw
    assert(r == null || r.truncated === 1)
  }

  test("interop: concatenated CLI streams (xz -6 then -9, cat-joined) " +
    "decode end to end, not first-stream-only") {
    val fix = b64(
      "/Td6WFoAAATm1rRGBMDcAccGIQEWAAAAAAAAAB5fVC7gA0YA1F0AMxpKrAxywc4x" +
      "d1BZm/IoG9kCJu9btxXzhm9dNBB0ea/18o7dLenhrClm5v1B+8Miq0g7yK1fVcuT" +
      "IdLrUYaaoH5Xs2pN3z10fgnRRmzp3Bfl/tdaz2dypfVCLywBe0GfDwzvrJQhdsT1" +
      "KsD1taDTN7UsClHRGFF7BwqXaF0KSL+adqqq+PkBmFdA5KHtP52zrYnOJG9/+w8O" +
      "0njoFUxQar5jUyGECq0NtEUmfDd96fIwTJXtt2sQgohdH0rmyfvUpaXovUU+empn" +
      "TjizIXBu3/edUGUAxundHm4HeIQAAfgBxwYAABTM4+ixxGf7AgAAAAAEWVr9N3pY" +
      "WgAABObWtEYEwOkB+AYhARwAAAAAAAAAesBc9uADdwDhXQA5mUiRsWmWB+4QHE81" +
      "EFnkMzsJobE/BFKry1doDXY5UK8uOzgMxHiGFygHjc9moAOFypC7CEjk464FOzDT" +
      "Ng7DHd34gjdRMI/TKJIVgpLTPaNDnRkD1J7o4fzT4KcRfW6omzfxYOwzmYRGBtKv" +
      "DDotMCOz6kRbPnL9IRPg7aobus0+JkeGYf2kEDuZjCmjqOrLmear5K6WZ0pYa5YO" +
      "NujfeL6+fZCcmqbLwGu0svRpXg8GUUsqPQeAQ0p1oW2d+s4wy56ILDUGbqCWANET" +
      "FjnoTDyRZm6qIVA6EFo7UF4ygmoAAAAAq6wc/evAVx8AAYUC+AYAACxAt7CxxGf7" +
      "AgAAAAAEWVo=")
    val r = XzContentEval.decode(fix)
    assert(r != null && r.truncated === 0 && r.checkOk === 1)
    assert(r.nBlocks === 2)
    assert(r.content.length === 839 + 888)
    val txt = new String(r.content, utf8)
    assert(txt.startsWith("first stream: ") && txt.contains("second stream: "))
    assert(md5(r.content) === "0b44ec8cddf87166c5c04ec9937a1a1c")
    // trailing garbage after the last footer flags truncated, keeps content
    val garbage = fix ++ "tail bytes".getBytes(utf8)
    val rg = XzContentEval.decode(garbage)
    assert(rg != null && rg.truncated === 1 && rg.content.length === 839 + 888)
    // 4-byte-aligned zero stream padding between and after streams is
    // clean; misaligned padding flags
    val padded = fix ++ Array[Byte](0, 0, 0, 0)
    val rp = XzContentEval.decode(padded)
    assert(rp != null && rp.truncated === 0 && rp.nBlocks === 2)
    // find the first stream's end (the second stream's magic) and pad
    // BETWEEN the streams
    val secondAt = (6 until fix.length).find(i => fix(i) == 0xFD.toByte &&
      fix(i + 1) == '7' && fix(i + 2) == 'z').get
    val between = fix.take(secondAt) ++ Array[Byte](0, 0, 0, 0) ++
      fix.drop(secondAt)
    val rb = XzContentEval.decode(between)
    assert(rb != null && rb.truncated === 0 && rb.nBlocks === 2,
      "inter-stream padding must be transparent")
    val misaligned = fix.take(secondAt) ++ Array[Byte](0, 0, 0) ++
      fix.drop(secondAt)
    val rm = XzContentEval.decode(misaligned)
    assert(rm != null && rm.truncated === 1,
      "misaligned padding must flag, not pass")
  }
}
