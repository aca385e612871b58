package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MimeEval

/** The MIME stack, pinned against messages a DIFFERENT writer produced:
  * the multipart fixture below was emitted by CPython's `email`
  * package (its own boundary spelling, header order, base64 wrapping,
  * LF line endings — an independent tolerance drill), and the QP
  * vector by CPython's `quopri` encoder, so the decode stack cannot
  * share an escaping misunderstanding with [[MimeEval.synth]]. Hand
  * drills cover the four RFC traps: unfold-keeps-WSP, adjacent
  * encoded-word joining, the CRLF-belongs-to-the-delimiter rule, and
  * per-part vs whole refusal.
  */
class MimeSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  // CPython email package, multipart/mixed: base64 text part (cpython
  // picks base64 for utf-8 bodies) + octet-stream attachment, B-encoded
  // subject with an em-dash, LF line endings throughout
  private lazy val cpython: Array[Byte] = java.util.Base64.getDecoder.decode(
    "Q29udGVudC1UeXBlOiBtdWx0aXBhcnQvbWl4ZWQ7IGJvdW5kYXJ5PSI9PT1ncmFmdHNwZWM0" +
    "Mj09IgpNSU1FLVZlcnNpb246IDEuMApGcm9tOiB3cml0ZXJAZXhhbXBsZS5jb20KVG86IHJl" +
    "YWRlckBleGFtcGxlLmNvbQpTdWJqZWN0OiA9P3V0Zi04P0I/Wm5KdmJTRGlnSlJqY0hsMGFH" +
    "OXU/PQoKLS09PT1ncmFmdHNwZWM0Mj09CkNvbnRlbnQtVHlwZTogdGV4dC9wbGFpbjsgY2hh" +
    "cnNldD0idXRmLTgiCk1JTUUtVmVyc2lvbjogMS4wCkNvbnRlbnQtVHJhbnNmZXItRW5jb2Rp" +
    "bmc6IGJhc2U2NAoKYUdWc2JHOGdabkp2YlNCMGFHVWdZM0I1ZEdodmJpQjNjbWwwWlhJZ1BT" +
    "QmxjWFZoYkhNZ0ppQnRiM0psQ25ObFkyOXVaQ0JzYVc1bApJSGRwZEdnZ2RISmhhV3hwYm1j" +
    "Z2MzQmhZMlZ6SUNBZ0NtVnVaQT09CgotLT09PWdyYWZ0c3BlYzQyPT0KQ29udGVudC1UeXBl" +
    "OiBhcHBsaWNhdGlvbi9vY3RldC1zdHJlYW0KTUlNRS1WZXJzaW9uOiAxLjAKQ29udGVudC1U" +
    "cmFuc2Zlci1FbmNvZGluZzogYmFzZTY0CgpBQUZpYVc1aGNua2dZbXh2WXYvKwoKLS09PT1n" +
    "cmFmdHNwZWM0Mj09LS0K")

  test("CPython-written multipart parses: parts, subject, body, attachment") {
    val m = MimeEval.parse(cpython)
    assert(m != null)
    assert(m.nParts === 2)
    assert(m.subject === "from —cpython")
    assert(m.bodyText ===
      "hello from the cpython writer = equals & more\n" +
      "second line with trailing spaces   \nend")
    assert(md5(m.attachment) === "ae27a1b2ba8e213224c6711f82c1e799")
  }

  test("CPython quopri vector round-trips: =XX, =3D, =20, literal tab") {
    val enc = java.util.Base64.getDecoder.decode(
      "Y2FmPUMzPUE5ID0zRCBsYXR0ZSwgMTAwJSBwdXJlCXRhYgpsaW5lIHR3byBlbmRzIHdpdGgg" +
      "c3BhY2U9MjAKZmluYWw9M0Rkb25l")
    assert(md5(MimeEval.qpDecode(enc)) === "8b4c28f68a17e517712098113231ae8b")
  }

  test("QP decode: soft breaks both endings, lowercase hex, padding, lone =") {
    assert(new String(MimeEval.qpDecode(ascii("ab=\r\ncd")), "UTF-8") === "abcd")
    assert(new String(MimeEval.qpDecode(ascii("ab=\ncd")), "UTF-8") === "abcd")
    assert(new String(MimeEval.qpDecode(ascii("=3d=3D")), "UTF-8") === "==")
    // transport padding: trailing SP/HT before the break is deleted
    assert(new String(MimeEval.qpDecode(ascii("word  \t\r\nnext")), "UTF-8") ===
      "word\r\nnext")
    // a lone or malformed escape stays literal evidence
    assert(new String(MimeEval.qpDecode(ascii("x=zq=")), "UTF-8") === "x=zq=")
  }

  test("RFC 2047: adjacent encoded-words join, verbatim stances hold") {
    // WSP between two encoded-words is deleted (6.2)
    assert(MimeEval.decodeSubject(
      "=?utf-8?Q?doc_7?=  =?utf-8?Q?_digest?=") === "doc 7 digest")
    // ordinary text between tokens is kept
    assert(MimeEval.decodeSubject(
      "=?utf-8?Q?a?= and =?utf-8?Q?b?=") === "a and b")
    // unknown charset: the whole token stays verbatim
    assert(MimeEval.decodeSubject("=?koi8-r?Q?abc?=") === "=?koi8-r?Q?abc?=")
    // malformed Q payload: verbatim, never a replacement char
    assert(MimeEval.decodeSubject("=?utf-8?Q?bad=G1?=") === "=?utf-8?Q?bad=G1?=")
    // B-encoded UTF-8
    assert(MimeEval.decodeSubject("=?utf-8?B?aGk=?=") === "hi")
  }

  test("header folding unfolds by deleting the line break only") {
    val msg = ascii(
      "Subject: doc 5\r\n folded digest\r\nMIME-Version: 1.0\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: 7bit\r\n\r\nbody here")
    val m = MimeEval.parse(msg)
    assert(m != null)
    assert(m.subject === "doc 5 folded digest")
    assert(m.bodyText === "body here")
  }

  test("multipart: CRLF before a delimiter belongs to the delimiter") {
    val msg = ascii(
      "MIME-Version: 1.0\r\n" +
        "Content-Type: multipart/mixed; boundary=bb\r\n\r\n" +
        "preamble ignored\r\n" +
        "--bb\r\nContent-Type: text/plain\r\n\r\nexact\r\n" +
        "--bb--\r\nepilogue ignored\r\n")
    val m = MimeEval.parse(msg)
    assert(m != null && m.nParts === 1)
    assert(m.bodyText === "exact", "the part must NOT keep the CRLF")
  }

  test("a body line that merely STARTS with the delimiter is content") {
    val msg = ascii(
      "MIME-Version: 1.0\r\n" +
        "Content-Type: multipart/mixed; boundary=b\r\n\r\n" +
        "--b\r\nContent-Type: text/plain\r\n\r\nline\r\n--bx is content\r\n" +
        "--b--\r\n")
    val m = MimeEval.parse(msg)
    assert(m != null && m.nParts === 1)
    assert(m.bodyText === "line\n--bx is content")
  }

  test("whole refusals: missing close delimiter, no MIME-Version, raw text") {
    val noClose = ascii(
      "MIME-Version: 1.0\r\n" +
        "Content-Type: multipart/mixed; boundary=bb\r\n\r\n" +
        "--bb\r\nContent-Type: text/plain\r\n\r\ntruncated download")
    assert(MimeEval.parse(noClose) === null)
    val noMime = ascii("From: a@b.c\r\n\r\nplain old text")
    assert(MimeEval.parse(noMime) === null)
    assert(MimeEval.parse(ascii("the fast key order sort")) === null)
  }

  test("per-part refusals: bad base64, unknown CTE, nested multipart") {
    def onePart(headers: String, content: String): Array[Byte] = ascii(
      "MIME-Version: 1.0\r\n" +
        "Content-Type: multipart/mixed; boundary=bb\r\n\r\n" +
        s"--bb\r\n$headers\r\n\r\n$content\r\n--bb--\r\n")
    val bad64 = MimeEval.parse(onePart(
      "Content-Type: text/plain\r\nContent-Transfer-Encoding: base64", "a!b"))
    assert(bad64 != null && bad64.nParts === 1 && bad64.bodyText === null,
      "invalid base64 refuses the PART, not the message")
    val badCte = MimeEval.parse(onePart(
      "Content-Type: text/plain\r\nContent-Transfer-Encoding: uuencode", "x"))
    assert(badCte != null && badCte.bodyText === null)
    val nested = MimeEval.parse(onePart(
      "Content-Type: multipart/alternative; boundary=in", "--in\r\n--in--"))
    assert(nested != null && nested.nParts === 1 &&
      nested.bodyText === null && nested.attachment === null,
      "a nested multipart part counts but its content refuses (stated scope)")
  }

  test("strict text stance: invalid UTF-8 in a text part refuses the part") {
    val raw = ascii(
      "MIME-Version: 1.0\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: 7bit\r\n\r\n") ++ Array(0xC3.toByte) // lone lead byte
    val m = MimeEval.parse(raw)
    assert(m != null && m.nParts === 1 && m.bodyText === null)
  }

  test("synth round-trips every mode") {
    val text = "the quick corpus line with = signs and words".getBytes("UTF-8")
    val meta = s"doc 9 has ${text.length} chars".getBytes("UTF-8")
    for (mode <- 0 to 3) {
      val m = MimeEval.parse(MimeEval.synth(text, 9L | (mode.toLong << 40)))
      assert(m != null, s"mode $mode")
      assert(m.bodyText === new String(text, "UTF-8"), s"mode $mode body")
      val expParts = if (mode == 1 || mode == 3) 2 else 1
      assert(m.nParts === expParts, s"mode $mode parts")
      if (expParts == 2) assert(md5(m.attachment) === md5(meta), s"mode $mode att")
      val expSubj = mode match {
        case 0 => "doc 9 digest"
        case 1 => "doc 9 — digest"
        case 2 => "doc 9 digest"
        case 3 => "doc 9 folded digest"
      }
      assert(m.subject === expSubj, s"mode $mode subject")
    }
    assert(MimeEval.parse(MimeEval.synth(text, 9L | (4L << 40))) === null,
      "the close-delimiter-less mode must refuse whole")
  }
}
