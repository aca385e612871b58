package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TarEval

/** The ustar walk, pinned against an archive a DIFFERENT writer
  * produced: the fixture below was emitted by CPython's `tarfile`
  * module (its own checksum spelling, record-size padding, directory
  * conventions), so the walk cannot share a header misunderstanding
  * with [[TarEval.synth]]. Refusal paths drill checksum, truncation,
  * and octal malformation.
  */
class TarSpec extends AnyFunSuite {

  // CPython tarfile, USTAR format: docs/readme.txt (26 B), docs/sub/
  // (directory), docs/sub/b.txt (23 B), padded to the 10240-byte record
  private lazy val cpython: Array[Byte] = {
    val b64 =
        "ZG9jcy9yZWFkbWUudHh0AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAADAwMDA2NDQA" +
        "MDAwMDAwMAAwMDAwMDAwADAwMDAwMDAwMDMyADAwMDAwMDAwMDAwADAxMDY2NgAgMAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAB1c3RhcgAwMAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAB3cml0dGVuIGJ5IGNweXRob24gdGFyZmlsZQAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAGRv" +
        "Y3Mvc3ViLwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAwMDAwNjQ0ADAw" +
        "MDAwMDAAMDAwMDAwMAAwMDAwMDAwMDAwMAAwMDAwMDAwMDAwMAAwMDc0NjMAIDUAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAdXN0YXIAMDAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAZG9jcy9zdWIvYi50eHQAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAADAwMDA2NDQAMDAwMDAwMAAwMDAwMDAwADAwMDAwMDAwMDI3ADAw" +
        "MDAwMDAwMDAwADAxMDQ0NwAgMAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAB1c3RhcgAwMAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABzZWNv" +
        "bmQgbWVtYmVyIGJvZHkgaGVyZQ=="
    val members = java.util.Base64.getDecoder.decode(b64)
    // re-pad to the original 10240-byte record (tail is all zeros)
    java.util.Arrays.copyOf(members, 10240)
  }

  test("CPython-written tar walks: names, dir entry, contents, sizes") {
    assert(TarEval.memberCount(cpython) === 3)
    assert(TarEval.memberName(cpython, 0) === "docs/readme.txt")
    assert(TarEval.memberName(cpython, 1) === "docs/sub/")
    assert(TarEval.memberName(cpython, 2) === "docs/sub/b.txt")
    assert(new String(TarEval.member(cpython, 0), "UTF-8") ===
      "written by cpython tarfile")
    assert(TarEval.member(cpython, 1) === null, "directories carry no content")
    assert(new String(TarEval.member(cpython, 2), "UTF-8") ===
      "second member body here")
    assert(TarEval.totalBytes(cpython) === 26L + 23L)
  }

  test("refusals: bad checksum per member, truncation whole, garbage") {
    // corrupt member 0's header payload (uid field): checksum mismatch
    val bad = cpython.clone()
    bad(108) = '7'.toByte
    assert(TarEval.member(bad, 0) === null)
    assert(TarEval.member(bad, 2) !== null, "siblings still read")
    assert(TarEval.totalBytes(bad) === 23L, "accounting excludes the refusal")
    // truncation mid-member data refuses whole
    assert(TarEval.memberCount(cpython.take(600)) === -1)
    // a partial tail block (cut mid-header) refuses whole
    assert(TarEval.memberCount(cpython.take(1024 + 100)) === -1)
    // malformed octal size (header re-summed so ONLY the size is bad)
    val badSize = cpython.clone()
    badSize(124) = '9'.toByte
    fixChecksum(badSize, 0)
    assert(TarEval.memberCount(badSize) === -1,
      "an unparseable size leaves nothing to advance by")
    // not a tar / null
    assert(TarEval.memberCount("just words, not blocks".getBytes("UTF-8")) === -1)
    assert(TarEval.memberCount(null) === -1)
  }

  private def fixChecksum(b: Array[Byte], off: Int): Unit = {
    java.util.Arrays.fill(b, off + 148, off + 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += b(off + i) & 0xFF; i += 1 }
    val s = "%06o".format(sum)
    var j = 0
    while (j < 6) { b(off + 148 + j) = s.charAt(j).toByte; j += 1 }
    b(off + 154) = 0
    b(off + 155) = ' '.toByte
  }

  test("synth round-trips: prefix-joined long path, modes, trailer rules") {
    val text = "tarball body words".getBytes("UTF-8")
    val t = TarEval.synth(text, 42L)
    assert(TarEval.memberCount(t) === 3)
    assert(TarEval.memberName(t, 0) === "data/")
    assert(TarEval.memberName(t, 1) === "data/doc42.txt")
    assert(TarEval.memberName(t, 2).startsWith("very/long/"))
    assert(TarEval.memberName(t, 2).endsWith("/doc42/meta.txt"))
    assert(java.util.Arrays.equals(TarEval.member(t, 1), text))
    assert(new String(TarEval.member(t, 2), "UTF-8") ===
      s"doc 42 has ${text.length} bytes")
    assert(TarEval.member(t, 0) === null, "directory entry")
    // old-GNU magic parses identically
    val g = TarEval.synth(text, 42L | (2L << 40))
    assert(TarEval.memberCount(g) === 3)
    assert(java.util.Arrays.equals(TarEval.member(g, 1), text))
    // bad-checksum mode: member 1 refuses, siblings read
    val x = TarEval.synth(text, 42L | (1L << 40))
    assert(TarEval.member(x, 1) === null)
    assert(TarEval.member(x, 2) !== null)
    assert(TarEval.memberCount(x) === 3)
    // a trailer-less but block-exact archive is tolerated
    val noTrailer = t.dropRight(1024)
    assert(TarEval.memberCount(noTrailer) === 3)
    // empty text still round-trips (zero-size member)
    val empty = TarEval.synth(Array.emptyByteArray, 7L)
    assert(TarEval.member(empty, 1).length === 0)
  }
}
