package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EpubEval

/** The OCF/OPF graph walk, pinned against an EPUB a DIFFERENT writer
  * packaged: CPython's `zipfile` wrote the container (its own local
  * headers, deflate choices, directory layout), with chapter TWO
  * stored before ONE and the manifest scrambled — only the spine
  * knows the right order. Hand drills cover the mimetype gate,
  * dangling graph edges, and non-paragraph markup.
  */
class EpubSpec extends AnyFunSuite {

  private lazy val cpython: Array[Byte] = java.util.Base64.getDecoder.decode(
    "UEsDBBQAAAAAAPCLD11vYassFAAAABQAAAAIAAAAbWltZXR5cGVhcHBsaWNhdGlvbi9lcHVi" +
    "K3ppcFBLAwQUAAAACADwiw9du2j9nm8AAACVAAAAFgAAAE1FVEEtSU5GL2NvbnRhaW5lci54" +
    "bWxNjUESwiAMRa/CZOu06B7oWSKGypSSDMSO3l5c1d1fvP+eW957MQe1nrl6uM1XWIKLXBVz" +
    "pRZcY9aUC/VzmvQqZRLUp4cfSVWtbOvMksDs9Mg46UfIA4qUHFGH2jLdpY9T3HCly4iCDc7+" +
    "2e0Z/QJQSwMEFAAAAAgA8IsPXYStjedwAAAAlgAAABEAAABjb250ZW50L3R3by54aHRtbCWN" +
    "SwoDIRBEryJzgGmGrAydvoujTQz4Qxs0t4/GXfFeUYVeYlAjhtRehxcpT4De+9kfZ65vuLTW" +
    "MFbnIPRsHKF8JDANhB0QNr6z+xIWamxzcsp6U4SryoVTQyhLmcmRI9mQG084o/Jc+a9hD8D6" +
    "oh9QSwMEFAAAAAgA8IsPXQmeWFrMAAAAbwEAAA8AAABjb250ZW50L3BrZy5vcGaVkDFSAzEM" +
    "Ra/iUUEDrLLt4nWuQEet2MquB9vrsQUJt48TMKSl00hf739J788xqE8u1W9phnHYwd7oTPad" +
    "FjY6spAjIdVUqU7OzrCK5Akxf5QwbGVBZ5EDR05ScRxGBKOdncRLYPNGRT1QzC/qlcnyk6JD" +
    "8W5hp/FXo7GbNDtK/shVjPbCUXk3g5w2UGvh460czqvEACqy8/QsX5lnoJyDtyTtALyNH1tY" +
    "wDvGlrgzWvkvBv5Fqtkn/qY2VAN3YPe6615TX7d/drA/9AJQSwMEFAAAAAgA8IsPXTzR8dR/" +
    "AAAAoQAAABEAAABjb250ZW50L29uZS54aHRtbCXN0QrCMAwF0F8JE3xcUEGYxvzLXKMdbG1p" +
    "M9v9vSt9C/deTsjqukBZF5denVUND8Scc59vvY9fvAzDgKVuOiYro2HSWRfhnbAdhC1+e7Mz" +
    "mfnHSeM26RYFnFcI0SchrAUF/swxKUx2DCoRVIrC+VSu9yeIO7xDDYfYLKxv+Q9QSwECFAMU" +
    "AAAAAADwiw9db2GrLBQAAAAUAAAACAAAAAAAAAAAAAAAgAEAAAAAbWltZXR5cGVQSwECFAMU" +
    "AAAACADwiw9du2j9nm8AAACVAAAAFgAAAAAAAAAAAAAAgAE6AAAATUVUQS1JTkYvY29udGFp" +
    "bmVyLnhtbFBLAQIUAxQAAAAIAPCLD12ErY3ncAAAAJYAAAARAAAAAAAAAAAAAACAAd0AAABj" +
    "b250ZW50L3R3by54aHRtbFBLAQIUAxQAAAAIAPCLD10JnlhazAAAAG8BAAAPAAAAAAAAAAAA" +
    "AACAAXwBAABjb250ZW50L3BrZy5vcGZQSwECFAMUAAAACADwiw9dPNHx1H8AAAChAAAAEQAA" +
    "AAAAAAAAAAAAgAF1AgAAY29udGVudC9vbmUueGh0bWxQSwUGAAAAAAUABQA1AQAAIwMAAAAA")

  test("CPython-packaged EPUB reads in SPINE order, not zip order") {
    val b = EpubEval.parse(cpython)
    assert(b != null)
    assert(b.title === "War & Peace, abridged")
    assert(b.chapters === 2)
    assert(b.paragraphs === 3, "the <div> is structure, not a paragraph")
    assert(b.text ===
      "first chapter text & entity\nsecond chapter opens\nand closes here",
      "zip order (two before one) must NOT leak into the book")
  }

  test("the mimetype gate: wrong content or wrong first member refuses") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    assert(EpubEval.parse(EpubEval.synth(text, 5L | (2L << 40))) === null,
      "a renamed zip is not an EPUB")
    // a plain q132-style zip: member 0 is not `mimetype`
    assert(EpubEval.parse(graft.functions.ZipEval.synth(text, 5L)) === null)
  }

  test("a dangling spine idref refuses whole") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet").getBytes("UTF-8")
    assert(EpubEval.parse(EpubEval.synth(text, 5L | (3L << 40))) === null)
  }

  test("synth round-trips: stored and deflated-lying-locals agree") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo")
      .getBytes("UTF-8") // 18 words: chA = 9 (2 paras), chB = 9 (2 paras)
    val b0 = EpubEval.parse(EpubEval.synth(text, 5L))
    val b1 = EpubEval.parse(EpubEval.synth(text, 5L | (1L << 40)))
    assert(b0 != null && b1 != null)
    assert(b0.text === b1.text, "compression must not change the book")
    assert(b0.title === "doc 5 & friends")
    assert(b0.chapters === 2 && b0.paragraphs === 4)
    assert(b0.text ===
      "alpha bravo charlie delta echo foxtrot golf hotel & co\nindia\n" +
        "juliet kilo lima mike november oscar papa quebec\nromeo",
      "spine order A-then-B despite the archive storing B first")
  }
}
