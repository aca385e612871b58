package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZstdBlockEval

/** The RFC 8878 block decode drilled three ways: hand math (XXH64
  * vectors, FSE spread spot-checks via the synthesizer), the
  * encoder/decoder round trip across every synthesis class, and —
  * the strongest — INTEROP fixtures produced by the reference `zstd`
  * CLI (v1.5.x) at several levels, embedded as base64: frames whose
  * Huffman weights are FSE-compressed, whose sequences use
  * FSE_Compressed table modes, and whose checksums are real XXH64
  * values the kernel must reproduce bit-for-bit to report
  * `checksumOk`. A shared-bug between this repo's encoder and decoder
  * cannot survive those fixtures. The reverse direction was verified
  * at development time: zstd CLI v1.5.7 decodes every synthesis class
  * below bit-exactly (including the treeless twin and the
  * repeat-offset drill) — that check caught a real conformance bug
  * (single-segment frames whose blocks exceeded the implied window).
  */
class ZstdDecodeSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  // ---- XXH64 hand vectors (the canonical published test values)

  test("xxh64 matches the canonical vectors") {
    assert(ZstdBlockEval.xxh64(Array.emptyByteArray, 0, 0) ===
      0xEF46DB3751D8E999L)
    val abc = "abc".getBytes(utf8)
    assert(ZstdBlockEval.xxh64(abc, 0, 3) === 0x44BC2CF5AD770999L)
  }

  // ---- encoder -> decoder round trips, every synthesis class

  test("synthesized classes round-trip byte-exactly") {
    val text = "alpha beta gamma delta".getBytes(utf8)
    def content(mode: Int): String = {
      val frame = ZstdBlockEval.synth(text, 42L + (mode.toLong << 40))
      val r = ZstdBlockEval.decode(frame)
      assert(r != null, s"mode $mode refused")
      assert(r.truncated === 0, s"mode $mode truncated")
      assert(r.checksums === 1 && r.checksumOk === 1,
        s"mode $mode checksum: ${r.checksumOk}")
      new String(r.content, utf8)
    }
    val base = "alpha beta#42"
    assert(content(0) === base)
    assert(content(1) === base + "|" + base)
    assert(content(2) === base + "/" + base + "/" + base + "/" + base)
    assert(content(3) === base + ";" + base + ";" + base + "xxxxxxxx")
    assert(content(4) === base + "z" * (30 + 42 % 8) + "!end")
    assert(content(5) === base + base.reverse)
  }

  test("round trip holds across many ids and word shapes") {
    val texts = Seq("the quick brown fox", "aa bb cc dd ee ff gg",
      "zzz yyy xxx www", "one", "data pipeline corpus shard token")
    for (t <- texts; id <- Seq(0L, 7L, 123L, 9999L); mode <- 0 to 5) {
      val frame = ZstdBlockEval.synth(t.getBytes(utf8),
        id + (mode.toLong << 40))
      val r = ZstdBlockEval.decode(frame)
      assert(r != null && r.truncated === 0 && r.checksumOk === 1,
        s"id=$id mode=$mode text='$t'")
    }
  }

  // ---- interop: frames the reference zstd CLI produced

  private val Pangrams = "the quick brown fox jumps over the lazy dog. " +
    "the quick brown fox jumps over the lazy dog. pack my box with five " +
    "dozen liquor jugs. pack my box with five dozen liquor jugs. how " +
    "vexingly quick daft zebras jump! how vexingly quick daft zebras jump!"

  test("interop: zstd CLI level 3 (huffman literals + sequences)") {
    val fix = b64("KLUv/ST1XQMAskYVFpClOiRJEvIv9/e/ZqfZMjPTO9BjpzkApmvsfD" +
      "NaZDqK477DRuy44KtdwelqZ5fvY3PUGD72uBwuECUCp8vl1PRF7WtfnxGDCx7bXMFe" +
      "4wJhV3xRCwYAkL7Q2fULk6XDlPmgAsBoZxmXb8iH")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(new String(r.content, utf8) === Pangrams)
    // the CLI wrote a real XXH64 checksum; the kernel must agree
    assert(r.checksums === 1 && r.checksumOk === 1)
  }

  test("interop: zstd CLI level 19 (denser sequences, same content)") {
    val fix = b64("KLUv/ST1NQMAkgYUEZA9BlD6Q+kPpc///3z02JkcB1TMYfbrEUU39F" +
      "Q29xgmiuz6hFaq9mc2LDdXnaeq8DMc1+6MiPiAYLneon2aC0+js+sZnj8M5zgjysqb" +
      "VAMGAJES3DDhFyZLhynzCZWhxaqcl2/Ihw==")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(new String(r.content, utf8) === Pangrams)
    assert(r.checksumOk === 1)
  }

  test("interop: tiny input (raw-literal block)") {
    val fix = b64("KLUv/SQDGQAAYWJjmQl3rQ==")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && new String(r.content, utf8) === "abc")
    assert(r.checksumOk === 1)
  }

  test("interop: 5 KiB zipf text at level 12 (FSE-compressed tables)") {
    // 5293 bytes of weighted word salad; verifying by md5 + length so
    // the fixture stays reviewable
    val fix = b64("KLUv/WStE30XAEKFEBWwJW3AnkYIE7HdDkswbTuTpJKgKAjCXa7/9R" +
      "u0DFZKmJPCjl95AENMHcY8m8sfxhQ4kMcUpORwKmLH2agEuVKPK4FYqIFPkuyMASEI" +
      "AYVh0FJKPRJwIhTCQEKEggkQJYSRgGpmZlLQrAHbXEgl67lEGkiNKG0yLsMVSL56dV" +
      "/ZTaJ//yUmFidTzLuCElgYn/y0wCG8dcRQitwe9b5JCR6w93kSXZJ66JZok4g0OAHI" +
      "suMwJYzfVjtRFZr9z9OyYr+pwoA0VBB82W1Du57tzriTOIIH1YFqysjjfU92UHIfDO" +
      "FC2B3f/qJDPv6ogzrdjUhKjb3wB7e1+ofiw3rooJGFMX0xJQrjUEvyadkWbtSAz/0Z" +
      "4ptYbLSMX0JfPsEIjoPHIMvmm4FVY5fFJu/tpafkGNQTRjaiLOcPbc5Nv2mpW1PwcT" +
      "yDS7h60mt5YKfNsgWMI4xts6EYpXzcFU763RM9seyt26w5F2AEEblKPff4NXowpBBX" +
      "CJyszixVNDFMqDpe2BAipou3LbJmX+IXYSCxi3tUfgOdCw6TYzgcFvElTIDJ7FIO+T" +
      "OlpeTGux6fNIWHgJJsa0KnhHkskJt6c0vKYyg5TWZkU4DaKshUw/iBRM+rY7WRHnV8" +
      "rJ147p46hShRTDPZ8Wfk3JZfeQmfbt5AfEWIGOmpMyXCfKC+RfHe3jnMJPjt49IPhX" +
      "pl/ahHWXMyv82dUvDFscGG4xDSgQCY8lp8M61pACBMDTM/ZBRvrwnBsEBapiNkAMc2" +
      "N+MlMOqF+qhGwtjqPjO7OPkhGiSXZk4MSBsoYwjQwiFcXD7PNtB3st2WkWiQufjDUY" +
      "RTUz1boz42f6X8PjakEVtfYx4rjV5I7gBwUFbzejLIO8vxbK8aiSHhzrnUSA847FJQ" +
      "9G+ZbFDjKG0SxqONtGEgJdySVkSnkkizAMKd1QEEia6LtOCZM33KU70Fg2yKCBYhQX" +
      "z5JKxkkkz+so7TQ6Om1zgoW5peJwJo9X/dqgLNTQ/g")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(r.content.length === 5293)
    assert(md5(r.content) === "bfcee6cf69e99f36bfbbe6f8b02ac406")
    assert(r.checksumOk === 1)
  }

  test("interop: two concatenated CLI frames decode in order") {
    val fix = b64("KLUv/ST1XQMAskYVFpClOiRJEvIv9/e/ZqfZMjPTO9BjpzkApmvsfD" +
      "NaZDqK477DRuy44KtdwelqZ5fvY3PUGD72uBwuECUCp8vl1PRF7WtfnxGDCx7bXMFe" +
      "4wJhV3xRCwYAkL7Q2fULk6XDlPmgAsBoZxmXb8iHKLUv/SQDGQAAYWJjmQl3rQ==")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && r.nFrames === 2 && r.truncated === 0)
    assert(new String(r.content, utf8) === Pangrams + "abc")
  }

  test("interop: a 414 KiB four-block CLI frame (treeless + repeat " +
    "table modes across block boundaries)") {
    // 424145 bytes decompressed forces 4 blocks (max 128 KiB each):
    // the real encoder reuses Huffman tables (Treeless literals) and
    // FSE tables (Repeat mode) across them — the cross-block state
    // paths no single-block fixture can reach
    val fix = b64(
      "KLUv/aTReAYAjDwAylg8ChhwS1I4mIOWgBhLp/9/E5uSkuRuqvv/CiK0AJMAlgAN" +
      "xhQSEUPMPTMzM////79t27bdtm3bkiRJktu2bZskSZIkIiIiIhMPR4MxhUTEEHc5" +
      "SQwdzkYjEzPM/Pd7ftfl8eHj267pWRaHB09ft2VXVRodOjzNkhxFYXDg7PM6btNk" +
      "sWGjy6qoSRKFBo1cLBXKRCISMsjEw9FgTBERMfPbLblJIhEAhkKCAwQIDwoIDRAk" +
      "DCggJEiAUKCA0CAhQAHBwAIECIUBCBIOECgMhQEMFAhIYBC2bbdt27YkSZLktm3b" +
      "JkmSJImIiIjIxMPRYEwhETHE3DMzM/P////btm3bbdu2LUmSJLlt27ZJkiRJIiIi" +
      "IjLxcDQYU0hEDDH3zMzM/P///7Zt23bbtm1LkiRJbtu2bZIkSZKIiIiITDwcDcYU" +
      "EhFDzD0zMzP///+/bdu23bZt25IkSZLbtm2bJEmSJCIiIiITD0eSJEkSERERkYmH" +
      "o8GYQiJiiLlnZmbm////t23bttu2bVuSJEly27ZtkyRJkkRERERk4uFoMKaQiBhi" +
      "7pmZmfn///9t27bttm3bliRJkty2bdskSZIkEREREZl4OBqMKSQihph7ZmZm/v//" +
      "f9u2bbtt27YlSZIkt23bNkmSJElEREREJh6OBmMKiYgh5p6ZmZn////ftgNzz8zM" +
      "zP///2/btm23bdu2JEmS5LZt2yZJkiSJiIiIyMTD0WBMIRExxNwzMzPz////27Zt" +
      "223bti1JkiS5bdu2SZIkSSIiIiIy8XA0GFNIRAwx98zMzPz///+2bdt227ZtS5Ik" +
      "SW7btm2SJEmSiIiIiEw8HA3GFBIRQ8w9MzMz////v23btt22bduSJEmS27ZtmwKF" +
      "BKhDge33/w0DHIwQJFwhvwYTMAIDAgKB/98BQSBnv/8GBhYnaLHUIiPyyMyTjO2S" +
      "oWwy0SfzPsoYSOz/Pf/HRP7f/v9BgJ5//n1BYO9+//4Uhz//fH4eyGPBjjU3Fmcs" +
      "eLG8YvHECoxYj8OSGxavmeEyL5PRHuNSjBrGNpiaNn5pCrvIaGdkCCAZOJSMeZMh" +
      "+2TKKNP/fTdA2P/+PZ8D3D//vscAfN59/4IEf+++/7EM3z36sdyxfmOJGYsvFkOx" +
      "fBKLPogVOKxvWGrNpCxjk4zomIli3jDKwYA87y9r/SLzfGSiJ5nZJbNsMqZPhj7K" +
      "2Bhi///7echw//37Pga4f/59HwF8fPv+BQn+/m3/4+WxNo4VN9ZnLHmxaMXixHIY" +
      "sRiH1Q3rXjOPZZTJ+D1GWowZRjeYlWb8IpS7yNgfmQNIRhlKhjAmg30ynlHGt993" +
      "MMl9/3/zBMF9/3Z/DmC/ff8+QrB7dv8WBbz//Fi/Y/HGyoz1L5asWJzEog9i+Q6L" +
      "NqxaMybLyCQzOuZHMTKMczBgiv3lL3yRYT4y9STzdskomwzpk6GPMvYD5O3ff/eB" +
      "4b3/t38M0L99vz8CuNm3/xYivH+ff3sey+JYHo1FM1ZerK9YcmIRRizOYfmGRdfM" +
      "YhmPZLTHGC1Gh5kNRqURv5DILjLwRwYxyfChZAhjMsY4GWaUae/+z2Ewt/+/7xGC" +
      "237P/zGg37t3f4jAt8+/LwjY/36s7Vi9sW7G0ovFVixOLP8gFtthNYZ1rJmXZTTJ" +
      "OB2jKMYaRhxMiOb8sp9fZJSPzHuSkV0ynE0G+mTso8zvBjD7/7/vA5PZ/8//OMDv" +
      "m99/iMDnz78tFOi/77/7sT6OxaKxGsY6L5ZWLJ5YgBHLclh0w+o1Y1hGIpmZY16L" +
      "0cP4A0xNEb8sxV1k6I9MmGR+LhnNmAxjnAwElOH//tsGJzn/v3+eIJx3376fAe6f" +
      "v75HBD7fvn+BgN/9WO5YvrHYjNWLdSuWnlj8EYs7LBfDIm9mZBmfZKRjbBQjwwwH" +
      "E6Ixv3DOR2SQjwz2JEO7ZMgm4/TJ0EcZ+wYnuX+//54knP/ftp8B7p/v30cAbt++" +
      "36KAv+3f/2Ntx2o01gtjaSwWrVicWIYRi+SwumGda+axjCIZN8dIirHDaAPMril+" +
      "UcpdZOyPzDHJaC4Z5k0GjJNxAsqA3+e/bzKJ+7/99gihfb9374zAv3u/P0Iwu3f/" +
      "FgV8fqzfsXhjZcb6F0tWLJ5Y/BHLc1gUhlVvxnQZnWRGx3wUI4ZxDgZGMb+kB4/I" +
      "8GRk2pPM7ZJRNhmiTwYfZfz/zWG+3/7f5BD3f//sA0L7ft/+GYB/931/DOA23/aP" +
      "5R3LbiwKxkos1kGx9MQijFiUw/INi66ZwTIeyWiOMVKMDDMdYDrP+IVEdpGBPzKA" +
      "SYZzyYA3GdsnQwPKFMS3f75diuD//fstj/B7/nsHk9i9+32PENz+ffOPAfdjbcfq" +
      "jXUzlrxYtGJxYvmPWJzDasO63szrMtpkvI5RFGMMIw4mRM/ZL99gZBhbjHjMTOZZ" +
      "RjTjnlGisbcY55rtGl8wNXU0Sfxj/tTRlOEN0dlnW44XRmcaZ5L/mJ5VnEl0Q9r2" +
      "/JTxhalJxVPjHzANp2gwz7CagbHMJhmXYwTFWMPIBjM+UA2UjhqojqaB0rk0UF00" +
      "EGPQ9cYvxl5GvYx7Gb82fjX6Mu5l7PsC6wjQ2RVMAAAIZAEA/P85EAJMAAAIYQEA" +
      "/P85EAJFAAAIZQEAzfgOhLAYCrk=")
    val r = ZstdBlockEval.decode(fix)
    assert(r != null && r.nFrames === 1 && r.truncated === 0)
    assert(r.content.length === 424145)
    assert(md5(r.content) === "c48971b9d95cb05607c749389e443cdf")
    assert(r.checksumOk === 1)
  }

  test("interop: a DICTIONARY-keyed CLI frame refuses content (the " +
    "dictionary is not in the stream)") {
    // zstd --train over a sample set, then -D: dictId != 0 — decoding
    // without the dictionary would be garbage, so the kernel refuses
    val fix = b64("KLUv/SfFgG5jL2UAAAAEfAACbEyTCEZlAbeTzNQ=")
    val r = ZstdBlockEval.decode(fix)
    assert(r == null || r.nFrames === 0) // never decoded content
    // the q165 triage still reads its dict id — routing survives
    import graft.functions.ZstdEval
    val t = ZstdEval.parse(fix)
    assert(t != null && t.dictId > 0L)
  }

  // ---- refusal discipline

  test("a flipped checksum byte reports checksumOk = 0, content intact") {
    val frame = ZstdBlockEval.synth("alpha beta".getBytes(utf8), 7L)
    val bad = frame.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x5A).toByte
    val r = ZstdBlockEval.decode(bad)
    assert(r != null && r.checksumOk === 0)
    assert(new String(r.content, utf8) === "alpha beta#7")
  }

  test("a corrupt SECOND frame keeps the first (stop-don't-guess)") {
    val f1 = ZstdBlockEval.synth("alpha beta".getBytes(utf8), 7L)
    val f2 = ZstdBlockEval.synth("gamma delta".getBytes(utf8),
      9L + (1L << 40))
    val two = f1 ++ f2
    // wreck frame 2's block body
    val bad = two.clone()
    var k = f1.length + 10
    while (k < bad.length - 4) { bad(k) = 0x5C.toByte; k += 1 }
    val r = ZstdBlockEval.decode(bad)
    assert(r != null && r.truncated === 1 && r.nFrames === 1)
    assert(new String(r.content, utf8) === "alpha beta#7")
  }

  test("truncation mid-frame refuses that frame") {
    val frame = ZstdBlockEval.synth("alpha beta".getBytes(utf8), 7L)
    val cut = java.util.Arrays.copyOfRange(frame, 0, frame.length - 9)
    val r = ZstdBlockEval.decode(cut)
    assert(r == null || (r.truncated === 1 && r.nFrames === 0))
  }

  test("plain text and short buffers refuse") {
    assert(ZstdBlockEval.decode("not zstd at all".getBytes(utf8)) === null)
    assert(ZstdBlockEval.decode(Array[Byte](0x28, -75)) === null)
  }

  test("a skippable frame is framed past, never decoded") {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array[Byte](0x52, 0x2A, 0x4D, 0x18), 0, 4) // 0x184D2A52 LE
    val skip = "seek table bytes".getBytes(utf8)
    o.write(skip.length); o.write(0); o.write(0); o.write(0)
    o.write(skip, 0, skip.length)
    val frame = ZstdBlockEval.synth("alpha beta".getBytes(utf8), 7L)
    o.write(frame, 0, frame.length)
    val r = ZstdBlockEval.decode(o.toByteArray)
    assert(r != null && r.nSkippable === 1 && r.nFrames === 1)
    assert(new String(r.content, utf8) === "alpha beta#7")
  }

  // ------------------------------------------------- dictionary plane

  test("interop: a zstd --train dictionary + a CLI -D frame decode " +
    "end to end (tables, window prefix, and repcodes all from the dict)") {
    val dict = b64(
      "N6Qw7KdbGgskEBBb0gEAgAcAAAAAjONbyk229Ns1TFKpAG8lQvYmW24HACgCQwAA" +
      "GBwePjAklTwBAARgAAEGAFaMPDK2XqNTZByGFDKGAAAAAAAIAAAAAAAEAADUfDAI" +
      "AAAAAAAAAAAAAAAAAAABAAAABAAAAAgAAABlc3BvbnNlIGxhdGVuY3kgcmVzcG9u" +
      "c2Ugc3BhcmsgbGF0ZW5jeSBkZWNvZGUgc3BhcmsgcmVzcG9uc2UgZmV0Y2hsb2cg" +
      "ZW50cnkgMDogZmV0Y2ggcmVzcG9uc2UgcmVxdWVzdCBkZWNvZGUgdG9rZW4gc2hh" +
      "cmQgc2hhcmQgbGF0ZW5jeSBkZWNvZGUgcmVzcG9uc2UgZmV0Y2ggZGVjb2RlIGZy" +
      "b250aWVyIHJlc3BvbnNlIGRlZHVwIGdyYWZ0IHJlcXVlc3QgcmVxdWVzdCByZXNw" +
      "b25zZSBzaGFyZCBzaGFyZCBmcm9udGllciBkZWR1cCByZXF1ZXN0IGZyb250aWVy" +
      "IHNoYXJkIGRlY29kZSBmZXRjaCBkZWNvZGUgZnJvbnRpZXIgZ3JhZnQgc2hhcmQg" +
      "c3BhcmsgZGVkdXAgdG9rZW4gcmVxdWVzdCBsYXRlbmN5IGRlY29kZSBncmFmdCBj" +
      "b3JwdXNsb2cgZW50cnkgOTogZGVkdXAgc2hhcmQgZGVkdXAgZGVkdXAgcmVxdWVz" +
      "dCBkZWR1cCByZXNwb25zZSBncmFmdCBmZXRjaCBkZWR1cCBkZWR1cCBmcm9udGll" +
      "ciBjb3JwdXMgdG9rZW4gc2hhcmQgZmV0Y2ggZGVjb2RlIGNvcnB1cyBzaGFyZCB0" +
      "b2tlbiBncmFmdCBsYXRlbmN5IGZldGNoIGZldGNoIHRva2VuIHNwYXJrIGNvcnB1" +
      "cyByZXNwb25zZSByZXF1ZXN0IHNwYXJrIGRlZHVwIGRlZHVwIHJlc3BvbnNlIHJl" +
      "c3BvbnNlIGZyb250aWVyIHNoYXJkIGZyb250aWVyIHRva2VuIGxhdGVuY3kgY29y" +
      "cHVzbG9nIGVudHJ5IDQ6IGRlY29kZSByZXNwb25zZSBmZXRjaCBmcm9udGllciB0" +
      "b2tlbiBmZXRjaCBjb3JwdXMgcmVzcG9uc2UgdG9rZW4gZ3JhZnQgbGF0ZW5jeSBz" +
      "cGFyayByZXF1ZXN0IGRlY29kZSBkZWNvZGUgdG9rZW4gZnJvbnRpZXIgbGF0ZW5j" +
      "eSBmcm9udGllciByZXNwb25zZSBmZXRjaCB0b2tlbiBmZXRjaCBmcm9udGllciBk" +
      "ZWR1cCBzaGFyZCBsYXRlbmN5IGNvcnB1cyBsYXRlbmN5IGZyb250aWVyIGZyb250" +
      "aWVyIHJlcXVlc3QgZGVkdXAgY29ycHVzIHNwYXJrIHJlcXVlc3QgcmVzcG9uc2Ug" +
      "Y29ycHVzIHRva2VuIHNoYXJkbG9nIGVudHJ5IDIyOiBsYXRlbmN5IHNwYXJrIHNo" +
      "YXJkIGNvcnB1cyB0b2tlbiBjb3JwdXMgdG9rZW4gZGVkdXAgZGVjb2RlY2ggbGF0" +
      "ZW5jeSByZXF1ZXN0IHNoYXJkIGRlY29kZSBzcGFyayBzcGFyayBmcm9udGllciBm" +
      "cm9udGllciBkZWR1cCBsYXRlbmN5IGNvcnB1c2xvZyBlbnRyeSAzMDogZ3JhZnQg" +
      "Y29ycHVzIGZyb250aWVyIHRva2VuIHJlcXVlc3QgdG9rZW4gZGVjb2RlIHRva2Vu" +
      "IGRlZHVwIGRlZHVwIGZldGNoIHNwYXJrIGxhdGVuY3kgc3BhcmsgZnJvbnRpZXIg" +
      "c3BhcmsgY29ycHVzIGNvcnB1cyBmcm9udGllciBmcm9udGllciBncmFmdCBzcGFy" +
      "ayBjb3JwdXMgc2hhcmQgZGVjb2RlIHNoYXJkIGRlZHVwIGdyYWZ0IHNoYXJkIGdy" +
      "YWZ0IHJlcXVlc3QgY29ycHVzIGRlY29kZSBzcGFyayBkZWNvZGUgZ3JhZnQgZ3Jh" +
      "ZnQgZmV0Y2ggZmV0Y2ggbGF0ZW5jeWxvZyBlbnRyeSAyMzogZnJvbnRpZXIgY29y" +
      "cHVzIGdyYWZ0IGRlY29kZSBmcm9udGllciBjb3JwdXMgY29ycHVzIGRlY29kZSBz" +
      "cGFyayB0b2tlbiB0b2tlbiB0b2tlbiBzaGFyZCByZXNwb25zZSBkZWNvZGUgc2hh" +
      "cmQgY29ycHVzIHJlc3BvbnNlIGRlY29kZSBmcm9udGllciBkZWNvZGUgbGF0ZW5j" +
      "eSBzaGFyZCBzaGFyZCBkZWNvZGUgc3BhcmsgdG9rZW4gZGVjb2RlIGRlZHVwIGZy" +
      "b250aWVyIGRlZHVwIHRva2VuIHJlc3BvbnNlIHNoYXJkIHRva2VuIHNoYXJkIGNv" +
      "cnB1cyBsYXRlbmN5IHRva2VuIHJlcXVlc3Rsb2cgZW50cnkgNzM6IHJlc3BvbnNl" +
      "IGZyb250aWVyIHJlcXVlc3QgcmVzcG9uc2Ugc3BhcmsgcmVxdWVzdCB0b2tlbiBn" +
      "cmFmdCBsYXRlbmN5IGxhdGVuY3kgZmV0Y2ggZGVjb2RlIGZldGNoIGdyYWZ0IGNv" +
      "cnB1cyBncmFmdCBzcGFyayBncmFmdCBncmFmdCByZXNwb25zZSBmZXRjaCBmZXRj" +
      "aCBmcm9udGllciBsYXRlbmN5IGZldGNoIGNvcnB1cyByZXNwb25zZSBsYXRlbmN5" +
      "IGZyb250aWVyIGdyYWZ0IGZyb250aWVyIGxhdGVuY3k=")
    val frame = b64(
      "KLUv/WenWxoLuAA9AgA4OTpzaGFyZB38I30URKujjbA5HhZuoiGCQFIKLje091o2" +
      "mCImwevWhilFsmpCEW70frgtIPBJZKrhG+mFK3Ms1KCHacIBBBNS14o=")
    // without the sidecar the frame must refuse, not guess
    val bare = ZstdBlockEval.decode(frame)
    assert(bare == null || (bare.truncated === 1 && bare.nFrames === 0))
    val noDict = ZstdBlockEval.decodeWithDict(frame, null)
    assert(noDict.truncated === 1 && noDict.nFrames === 0)
    val r = ZstdBlockEval.decodeWithDict(frame, dict)
    assert(r != null, "dict-keyed CLI frame refused with its dictionary")
    assert(r.truncated === 0 && r.checksumOk != 0)
    assert(r.content.length === 440)
    assert(md5(r.content) === "5318055d31531e1cb93af29f9932ebd8")
    // the WRONG dictionary (id mismatch) refuses
    val wrongId = dict.clone()
    wrongId(4) = (wrongId(4) ^ 0x5A).toByte
    val rw = ZstdBlockEval.decodeWithDict(frame, wrongId)
    assert(rw == null || rw.truncated === 1)
    // a corrupted entropy section refuses the dictionary whole
    val cut = java.util.Arrays.copyOf(dict, 40)
    val rc = ZstdBlockEval.decodeWithDict(frame, cut)
    assert(rc == null || rc.truncated === 1)
  }

  test("profile dictionary: the synthesized dict-keyed frame round-trips " +
    "(repeat-mode tables, litLen-0 rep2 into the dict content)") {
    val text = "gamma delta epsilon zeta".getBytes(utf8)
    val frame = ZstdBlockEval.dictFrame(text, 31L)
    // refusal preserved when the dictionary is absent
    val bare = ZstdBlockEval.decode(frame)
    assert(bare == null || bare.truncated === 1)
    val r = ZstdBlockEval.decodeWithDict(frame, ZstdBlockEval.profileDict)
    assert(r != null && r.truncated === 0 && r.checksumOk === 1)
    assert(new String(r.content, utf8) ===
      ZstdBlockEval.DictPhrase + "gamma delta#31")
    // plain frames still decode when a dictionary is offered
    val plain = ZstdBlockEval.synth(text, 31L)
    val rp = ZstdBlockEval.decodeWithDict(plain, ZstdBlockEval.profileDict)
    assert(rp != null && rp.truncated === 0)
    assert(new String(rp.content, utf8) === "gamma delta#31")
  }

  test("dictionary fuzz: flips over dict and frame refuse or flag, " +
    "never throw") {
    val text = "iota kappa lambda mu".getBytes(utf8)
    val frame = ZstdBlockEval.dictFrame(text, 7L)
    val dict = ZstdBlockEval.profileDict
    val rnd = new java.util.Random(0xD1C7L)
    (0 until 300).foreach { k =>
      val bad = frame.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      try ZstdBlockEval.decodeWithDict(bad, dict)
      catch { case e: Throwable => fail(s"frame fuzz $k threw: $e") }
    }
    (0 until 300).foreach { k =>
      val bad = dict.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      try ZstdBlockEval.decodeWithDict(frame, bad)
      catch { case e: Throwable => fail(s"dict fuzz $k threw: $e") }
    }
  }
}
