package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz-lite robustness for the round-14 byte-walk kernels: crawl
  * payloads are adversarial by default, and a decoder that THROWS on
  * garbage kills the whole task where a NULL refusal drops one row.
  * Deterministic seeded random buffers (plus magic-byte-prefixed ones,
  * so the walks get past their signatures into the structural parses)
  * must all come back as a value or a refusal — never an exception.
  */
class KernelRobustnessSpec extends AnyFunSuite {

  private def buffers(prefix: Array[Byte]): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(0xC0FFEE)
    (0 until 400).map { i =>
      val b = new Array[Byte](i % 97 + 1)
      rnd.nextBytes(b)
      prefix ++ b
    } ++ Seq(Array.emptyByteArray, prefix, null)
  }

  private def drive(name: String, prefix: Array[Byte])(f: Array[Byte] => Any): Unit =
    buffers(prefix).zipWithIndex.foreach { case (b, i) =>
      try f(b)
      catch {
        case e: Throwable =>
          fail(s"$name threw on fuzz buffer $i (${Option(b).map(_.length)}): $e")
      }
    }

  test("image/audio/document byte walks refuse garbage, never throw") {
    import graft.functions._
    drive("jpegLuma", Array(0xFF, 0xD8, 0xFF).map(_.toByte))(JpegPixelEval.lumaStats)
    drive("pngLuma", Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))(PngPixelEval.lumaStats)
    drive("gifLuma", "GIF89a".getBytes("US-ASCII"))(GifPixelEval.lumaStats)
    drive("tiffDims", Array[Byte]('I', 'I', 42, 0))(TiffEval.dims)
    drive("mp3Meta", Array(0xFF, 0xFB).map(_.toByte))(Mp3Eval.meta)
    drive("pdfText", "%PDF-1.4\n".getBytes("US-ASCII"))(PdfEval.extract)
    drive("pdfPages", "%PDF-1.4\n".getBytes("US-ASCII"))(PdfEval.pageCount)
    drive("sniff", Array.emptyByteArray)(CharsetEval.sniff)
  }

  test("zstd block decode refuses garbage, never throws") {
    import graft.functions.ZstdBlockEval
    val magic = Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte)
    drive("zstdDecode", magic)(ZstdBlockEval.decode)
    drive("zstdDecodeStrict", magic)(ZstdBlockEval.decodeContentStrict)
    drive("zstdMeta", magic)(ZstdBlockEval.decodeMetaPacked)
    // mutational pass: flip every byte of a VALID frame one at a time —
    // the decoder must land on a value or a refusal at each position
    val frame = ZstdBlockEval.synth(
      "alpha beta gamma delta".getBytes("UTF-8"), 9L + (3L << 40))
    (0 until frame.length).foreach { i =>
      val bad = frame.clone()
      bad(i) = (bad(i) ^ 0xFF).toByte
      try ZstdBlockEval.decode(bad)
      catch {
        case e: Throwable => fail(s"zstd decode threw at flipped byte $i: $e")
      }
    }
    // and with random 16-byte splices anywhere in the frame
    val rnd = new java.util.Random(0xBADC0DE)
    (0 until 200).foreach { k =>
      val bad = frame.clone()
      val at = rnd.nextInt(math.max(1, frame.length - 16))
      val splice = new Array[Byte](16)
      rnd.nextBytes(splice)
      System.arraycopy(splice, 0, bad, at, math.min(16, bad.length - at))
      try ZstdBlockEval.decode(bad)
      catch {
        case e: Throwable => fail(s"zstd decode threw on splice $k: $e")
      }
    }
  }

  test("string kernels survive degenerate and hostile text") {
    import graft.functions.HtmlEntityEval
    import org.apache.spark.unsafe.types.UTF8String
    val hostiles = Seq("", "&", "&&&&", "&#", "&#x", "&" * 500,
      "&#99999999999999999999;", "&#x7FFFFFFF;", "a&b;c", "&;",
      " &amp; ", "&amp" + ";" * 50)
    hostiles.foreach { s =>
      val r = HtmlEntityEval.decode(UTF8String.fromString(s))
      assert(r != null, s"decode returned null for ${s.take(20)}")
    }
    // the huge-but-bounded numeric must pass through, not overflow
    assert(HtmlEntityEval.decode(
      UTF8String.fromString("&#99999999;")).toString === "&#99999999;")
  }
}
