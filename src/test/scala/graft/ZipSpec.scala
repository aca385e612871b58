package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZipEval

/** The ZIP central-directory walk, pinned against archives a DIFFERENT
  * writer produced: the fixture bytes below were emitted by CPython's
  * `zipfile` module (honest local headers, its own extra-field and
  * version conventions), so the walk cannot share an encoding
  * misunderstanding with [[ZipEval.synth]] — whose archives, by
  * construction, carry LYING local headers the fixtures do not.
  */
class ZipSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // CPython zipfile: 'hello.txt' STORED ("hello zip walk") +
  // 'body.txt' DEFLATED ("the central directory is the only truth " x3)
  private val cpython = unhex(
    "504B0304140000000000000021005F7AE0ED0E0000000E00000009000000" +
    "68656C6C6F2E74787468656C6C6F207A69702077616C6B504B0304140000" +
    "00080000002100382C4CB12C0000007800000008000000626F64792E7478" +
    "742BC94855484ECD2B294ACC5148C92C4A4D2EC92FAA54C82C5628014AE4" +
    "E7E5542A941495966480B9D4540700504B01021403140000000000000021" +
    "005F7AE0ED0E0000000E0000000900000000000000000000008001000000" +
    "0068656C6C6F2E747874504B0102140314000000080000002100382C4CB1" +
    "2C00000078000000080000000000000000000000800135000000626F6479" +
    "2E747874504B050600000000020002006D000000870000000000")

  // CPython zipfile with an archive comment: the EOCD is NOT the last
  // 22 bytes — the locator must scan backward past the comment
  private val commented = unhex(
    "504B03041400000008000000210015D7CFC0130000001100000005000000" +
    "612E7478744BCECFCD4DCD2B494D51482C4ACEC82C4B0500504B01021403" +
    "1400000008000000210015D7CFC013000000110000000500000000000000" +
    "00000000800100000000612E747874504B05060000000001000100330000" +
    "00360000001500747261696C696E6720636F6D6D656E742068657265")

  test("CPython-written archives walk: names, methods, contents, CRC") {
    assert(ZipEval.memberCount(cpython) === 2)
    assert(ZipEval.memberName(cpython, 0) === "hello.txt")
    assert(ZipEval.memberName(cpython, 1) === "body.txt")
    assert(new String(ZipEval.member(cpython, 0), "UTF-8") ===
      "hello zip walk")
    assert(new String(ZipEval.member(cpython, 1), "UTF-8") ===
      "the central directory is the only truth " * 3)
    assert(ZipEval.totalBytes(cpython) === 14L + 120L)
    assert(ZipEval.member(cpython, 2) === null) // out of range
  }

  test("EOCD locator scans backward past a trailing comment") {
    assert(ZipEval.memberCount(commented) === 1)
    assert(new String(ZipEval.member(commented, 0), "UTF-8") ===
      "commented archive")
  }

  test("truncation refuses: a cut EOCD or a cut member is never guessed") {
    // EOCD destroyed
    assert(ZipEval.memberCount(cpython.dropRight(5)) === -1)
    // whole tail gone including part of the central directory
    assert(ZipEval.memberCount(cpython.dropRight(60)) === -1)
    // not an archive at all
    assert(ZipEval.memberCount("PK but not really".getBytes("UTF-8")) === -1)
    assert(ZipEval.memberCount(null) === -1)
  }

  test("corruption refuses per member, verification is real") {
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = cpython.clone(); f(c); c
    }
    // flip one byte inside member 1's deflate stream: CRC must catch it
    val bitflip = mut(b => b(120) = (b(120) ^ 0x40).toByte)
    assert(ZipEval.member(bitflip, 1) === null)
    assert(ZipEval.member(bitflip, 0) !== null) // sibling still reads
    // corrupt member 0's central CRC field (central dir starts at 0x87;
    // entry 0's crc32 is at +16)
    val badCrc = mut(b => b(0x87 + 16) = (b(0x87 + 16) ^ 0xFF).toByte)
    assert(ZipEval.member(badCrc, 0) === null)
    assert(ZipEval.member(badCrc, 1) !== null)
    // ZIP64 escape marker in the EOCD count: out of scope, refuse
    val eocd = cpython.length - 22
    val z64 = mut { b =>
      b(eocd + 8) = 0xFF.toByte; b(eocd + 9) = 0xFF.toByte
      b(eocd + 10) = 0xFF.toByte; b(eocd + 11) = 0xFF.toByte
    }
    assert(ZipEval.memberCount(z64) === -1)
  }

  test("synth archives carry the lying-local-header trap and still read") {
    val text = "a corpus document body with words".getBytes("UTF-8")
    val z = ZipEval.synth(text, 42L)
    assert(ZipEval.memberCount(z) === 3)
    assert(ZipEval.memberName(z, 0) === "doc42_0.txt")
    assert(java.util.Arrays.equals(ZipEval.member(z, 0), text))
    assert(new String(ZipEval.member(z, 1), "UTF-8") ===
      "a corpus document body with words\na corpus document body with words")
    assert(new String(ZipEval.member(z, 2), "UTF-8") ===
      s"doc 42 has ${text.length} chars")
    // the local headers really lie: local crc/sizes are zero while the
    // central ones are not (offset 0 is member 0's local header)
    assert((z(14) | z(15) | z(16) | z(17)) === 0, "local CRC must be zero")
    // java.util.zip.ZipInputStream is a LOCAL-header-driven reader: the
    // stored member's local header declares size 0, so a local-trusting
    // reader recovers ZERO bytes of a non-empty member — the trap is
    // real for real readers
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(z))
    val e = zin.getNextEntry
    assert(e.getName === "doc42_0.txt")
    assert(e.getSize === 0L, "the local lie a trusting reader swallows")
    assert(zin.read() === -1, "zero content recovered from the lie")
    // comment mode: EOCD locator must skip the tail comment
    val zc = ZipEval.synth(text, 7L | (1L << 40))
    assert(ZipEval.memberCount(zc) === 3)
    // bad-CRC mode: member 1 refuses, siblings read
    val zx = ZipEval.synth(text, 7L | (2L << 40))
    assert(ZipEval.member(zx, 1) === null)
    assert(ZipEval.member(zx, 0) !== null)
    assert(ZipEval.member(zx, 2) !== null)
  }
}
