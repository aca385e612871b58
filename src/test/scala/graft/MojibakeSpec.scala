package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MojibakeEval

/** The repair loop, pinned against CPython-corrupted vectors (its
  * cp1252/utf-8 codecs built the mojibake, so the inverse pipeline
  * cannot share a table slip with [[MojibakeEval.corrupt]]) and the
  * gate drills that keep real non-ASCII text untouched.
  */
class MojibakeSpec extends AnyFunSuite {

  private def utf8(b64: String): String =
    new String(java.util.Base64.getDecoder.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8)

  test("CPython-corrupted German/French repairs in one round") {
    val corrupted = utf8("V2Vpw4PFuCDDouKCrOKAnSBGw4PCpGhyZSDDgsKrcXVvdGVkw4LCuw==")
    val (fixed, rounds) = MojibakeEval.repair(corrupted)
    assert(fixed === "Weiß — Fähre «quoted»")
    assert(rounds === 1)
  }

  test("CPython triple corruption repairs at the round cap") {
    val corrupted = utf8("IGNhZsODxpLDhuKAmcOD4oCaw4LCqSA=")
    val (fixed, rounds) = MojibakeEval.repair(corrupted)
    assert(fixed === " café ")
    assert(rounds === 3)
  }

  test("gates: real non-ASCII text survives untouched") {
    for (s <- Seq("café au lait", "Weiß und grün", "日本語のテキスト",
      "emoji 🎉 stays", "lone Â tricky", "plain ascii")) {
      val (fixed, rounds) = MojibakeEval.repair(s)
      assert(fixed === s, s"'$s' must not be 'repaired'")
      assert(rounds === 0)
    }
  }

  test("the stated residual: text ABOUT mojibake repairs (heuristic scope)") {
    // a page that intentionally spells Ã© gets folded — inherent to
    // every encode-roundtrip fixer (ftfy included); stated, not hidden
    val (fixed, rounds) = MojibakeEval.repair("mojibake looks like Ã©")
    assert(fixed === "mojibake looks like é" && rounds === 1)
  }

  test("synth modes round-trip against the oracle's chr() spellings") {
    val base = graft.functions.MojibakeEval // brevity
    import org.apache.spark.unsafe.types.UTF8String
    def syn(text: String, mode: Int): String =
      base.synth(UTF8String.fromString(text), mode).toString
    val t = "the corpus line"
    assert(base.repair(syn(t, 0)) === ((t, 0)))
    assert(base.repair(syn(t, 1)) === ((t + " café — ok", 0)))
    assert(base.repair(syn(t, 2)) === ((t + " café — naïve", 1)))
    assert(base.repair(syn(t, 3)) === ((t + " café naïve", 2)))
    assert(base.repair(syn(t, 4)) === ((t + " Â tricky", 0)))
  }
}
