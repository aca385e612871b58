package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ScriptMixEval

/** The script-mix walk, drilled on hand cases: bucket boundaries,
  * the homoglyph word, kana/han folding, separators, and non-BMP
  * surrogate-pair stepping.
  */
class ScriptMixSpec extends AnyFunSuite {

  test("bucket boundaries are the explicit ranges, not JDK tables") {
    assert(ScriptMixEval.script('z') === 0)
    assert(ScriptMixEval.script(0xC0) === 0) // À — Latin-1 letter
    assert(ScriptMixEval.script(0x24F) === 0) // Latin Extended-B end
    assert(ScriptMixEval.script(0x250) === -1) // IPA: out of scope
    assert(ScriptMixEval.script(0x400) === 1)
    assert(ScriptMixEval.script(0x4FF) === 1)
    assert(ScriptMixEval.script(0x500) === -1) // Cyrillic Supplement: out
    assert(ScriptMixEval.script(0x370) === 2)
    assert(ScriptMixEval.script(0x4E00) === 3)
    assert(ScriptMixEval.script(0x30FF) === 3) // katakana folds into CJK
    assert(ScriptMixEval.script(0x600) === 4)
    assert(ScriptMixEval.script('7') === -1)
    assert(ScriptMixEval.script(' ') === -1)
  }

  test("the homoglyph word is exactly one mixed word") {
    val m = ScriptMixEval.parse("hello pаypаl world")
    assert(m.latin === 14L) // hello(5) + pypl(4) + world(5)
    assert(m.cyrillic === 2L)
    assert(m.mixedWords === 1)
    assert(m.nScripts === 2)
  }

  test("single-script foreign words do not count as mixed") {
    val m = ScriptMixEval.parse("hello привет")
    assert(m.latin === 5L && m.cyrillic === 6L && m.mixedWords === 0)
    assert(m.nScripts === 2)
  }

  test("digits split words: abc123а is NOT mixed") {
    // the digit separates the Latin run from the Cyrillic letter
    val m = ScriptMixEval.parse("abc123а")
    assert(m.mixedWords === 0 && m.latin === 3L && m.cyrillic === 1L)
  }

  test("a mixed word at end-of-string is still counted") {
    val m = ScriptMixEval.parse("ok aа")
    assert(m.mixedWords === 1)
  }

  test("han + kana fold into one CJK bucket") {
    val m = ScriptMixEval.parse("中国語のは")
    assert(m.cjk === 5L && m.nScripts === 1)
  }

  test("non-BMP code points step as surrogate pairs, not halves") {
    // U+1F600 (emoji) is out of scope; a halved surrogate must not
    // land in any bucket or corrupt the walk
    val m = ScriptMixEval.parse("a😀b")
    assert(m.latin === 2L && m.nScripts === 1 && m.mixedWords === 0)
  }

  test("empty and null") {
    val m = ScriptMixEval.parse("")
    assert(m.nScripts === 0 && m.mixedWords === 0)
    assert(ScriptMixEval.parse(null) === null)
  }
}
