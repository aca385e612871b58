package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PunycodeEval

/** The punycode decode, pinned two independent ways: (1) against
  * real-world REGISTRY-produced ACE spellings (münchen / bücher /
  * 中国 / рф — the repo ships NO encoder, so the decoder cannot be
  * self-consistent-but-wrong); (2) against an INDEPENDENT RFC 3492
  * §6.3 encoder implemented here in the spec, round-tripping
  * adversarial code-point mixes the constants never cover.
  */
class PunycodeSpec extends AnyFunSuite {

  // ---- the real-world constants ---------------------------------------

  test("registry spellings decode to their known Unicode forms") {
    assert(PunycodeEval.decodeLabel("mnchen-3ya") === "münchen")
    assert(PunycodeEval.decodeLabel("bcher-kva") === "bücher")
    assert(PunycodeEval.decodeLabel("fiqs8s") === "中国") // 中国
    assert(PunycodeEval.decodeLabel("p1ai") === "рф") // рф
  }

  test("host-level decode: pass-through, multi-label, whole-host refusal") {
    assert(PunycodeEval.host("www.example.com") === "www.example.com")
    assert(PunycodeEval.host("xn--p1ai.xn--bcher-kva.org") ===
      "рф.bücher.org")
    // one bad label refuses the WHOLE host
    assert(PunycodeEval.host("good.xn--zzz999999999a.com") === null)
  }

  test("digits are case-insensitive (RFC 3492 §5)") {
    // fully-encoded label: every char is a digit, so case cannot leak
    assert(PunycodeEval.decodeLabel("FIQS8S") === "中国")
    // host() case-folds ACE labels whole (IDNA's lowercase canon)
    assert(PunycodeEval.host("XN--MNCHEN-3YA") === "münchen")
  }

  test("refusals: overflow, truncated integer, bad digit, empty") {
    assert(PunycodeEval.decodeLabel("zzz999999999a") === null) // overflow
    assert(PunycodeEval.decodeLabel("abc-") === null) // nothing encoded
    assert(PunycodeEval.decodeLabel("abc-Ã©") === null) // non-digit tail
    assert(PunycodeEval.decodeLabel("") === null)
    assert(PunycodeEval.host("xn--.com") === null)
  }

  // ---- independent encoder (RFC 3492 §6.3), spec-local ----------------

  private def adapt(deltaIn: Int, numPoints: Int, first: Boolean): Int = {
    var delta = if (first) deltaIn / 700 else deltaIn / 2
    delta += delta / numPoints
    var k = 0
    while (delta > 455) { delta /= 35; k += 36 }
    k + (36 * delta) / (delta + 38)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def encode(input: String): String = {
    val cps = input.codePoints().toArray
    val sb = new StringBuilder
    cps.foreach(c => if (c < 0x80) sb.append(c.toChar))
    val basic = sb.length
    var handled = basic
    if (basic > 0) sb.append('-')
    var n = 128
    var delta = 0
    var bias = 72
    while (handled < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m - n) * (handled + 1)
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        if (c == n) {
          var q = delta
          var k = 36
          var done = false
          while (!done) {
            val t = if (k <= bias) 1 else if (k >= bias + 26) 26 else k - bias
            if (q < t) done = true
            else {
              sb.append(digitChar(t + (q - t) % (36 - t)))
              q = (q - t) / (36 - t)
              k += 36
            }
          }
          sb.append(digitChar(q))
          bias = adapt(delta, handled + 1, handled == basic)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    sb.toString
  }

  test("independent encoder sanity: reproduces the registry spellings") {
    assert(encode("münchen") === "mnchen-3ya")
    assert(encode("bücher") === "bcher-kva")
    assert(encode("中国") === "fiqs8s")
    assert(encode("рф") === "p1ai")
  }

  test("round-trip: decoder inverts the independent encoder") {
    val samples = Seq(
      "café", // one insertion mid-word
      "ééé", // repeated non-ASCII, no basic part
      "aאbבc", // Hebrew interleaved with ASCII
      "日本語-jp", // CJK + literal hyphen in the basic part
      "x́́", // combining marks (repeat insert at same point)
      "😀ok", // non-BMP (emoji) — supplementary plane
      "münchen-west", // hyphen inside a mixed label
      "русский" // full Cyrillic word
    )
    samples.foreach { s =>
      val enc = encode(s)
      assert(PunycodeEval.decodeLabel(enc) === s, s"round-trip of '$s' ($enc)")
    }
  }
}
