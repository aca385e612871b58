package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TiffPixelEval

/** The TIFF pixel plane drilled the family way: the LZW variant is
  * pinned by a paper-derived code vector AND against an independent
  * in-container reference — the JDK's own javax.imageio TIFF plugin —
  * in BOTH directions (it writes, we read; we write, it reads). Both
  * byte orders must agree pixel for pixel, the photometric inversion
  * and Predictor 2 have dedicated drills, and flips/cuts refuse
  * without throwing.
  */
class TiffPixelSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  test("LZW hand vector: ABABABA spells Clear,65,66,258,260,EOI at 9 bits") {
    // paper walk — encode: A|B miss->65, B|A miss->66, AB hit then
    // ABA miss->258, AB,ABA hit to the end->260; decode meets the
    // KwKwK case at 260 (code == next). 54 bits, zero-padded to 7 bytes.
    val codes = Seq(256, 65, 66, 258, 260, 257)
    val bits = codes.flatMap(c => (8 to 0 by -1).map(k => (c >> k) & 1))
    val padded = bits ++ Seq.fill((8 - bits.length % 8) % 8)(0)
    val vector = padded.grouped(8)
      .map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    val data = "ABABABA".getBytes("US-ASCII")
    assert(TiffPixelEval.lzwEncode(data).toList === vector.toList)
    assert(TiffPixelEval.lzwDecode(vector, 0, vector.length, 7).toList ===
      data.toList)
  }

  test("LZW early change: the 0..255 ramp flips widths ONE code early " +
    "in the decoder's counting — byte-identical to the reference writer") {
    // derivation: the decoder completes a table entry only after seeing
    // the NEXT code, so its add count lags the encoder's by one. Its
    // width bumps when its next-free entry hits 2^9 - 1 = 511 — after
    // reading code 254 of the ramp — so codes 0..253 travel at 9 bits
    // and 254, 255, EOI at 10; the encoder mirrors that at ITS count
    // of 2^9. This vector is byte-identical to the strip the imageio
    // TIFF writer produces for the same row (generated offline; the
    // live cross-check below re-proves it in-process).
    val vector = b64(
      "gAAAICAYEAoGA4IBIKBYMBoOB4QCISCYUCoWC4YDIaDYcDoeD4gEIiEYkEomE4oF" +
      "IqFYsFouF4wGIyGY0Go2G44HI6HY8Ho+H5AIJCIZEIpGI5IJJKJZMJpOJ5QKJSKZ" +
      "UKpWK5YLJaLZcLpeL5gMJiMZkMpmM5oNJqNZsNpuN5wOJyOZ0Op2O54PJ6PZ8Pp+" +
      "P6AQKCQaEQqGQ6IRKKRaMRqOR6QSKSSaUSqWS6YTKaTacTqeT6gUKiUakUqmU6oV" +
      "KqVasVquV6wWKyWa0Wq2W64XK6Xa8Xq+X7AYLCYbEYrGY7IZLKZbMZrOZ7QaLSab" +
      "UarWa7YbLabbcbreb7gcLicbkcrmc7odLqdbsdrud7weLyeb0er2e74fL6fb8fp/" +
      "H+gI")
    val ramp = Array.tabulate(256)(_.toByte)
    assert(TiffPixelEval.lzwEncode(ramp).toList === vector.toList)
    assert(TiffPixelEval.lzwDecode(vector, 0, vector.length, 256).toList ===
      ramp.toList)
  }

  test("interop: an imageio-written LZW tiff (BE, gray ramp) decodes whole") {
    val file = b64(
      "TU0AKgAAAAgADAEAAAMAAAABAQAAAAEBAAMAAAABAAEAAAECAAMAAAABAAgAAAED" +
      "AAMAAAABAAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW" +
      "AAMAAAABAAEAAAEXAAQAAAABAAABIwEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo" +
      "AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAGAAAAgIBgQCgYDggEgoFgw" +
      "Gg4HhAIhIJhQKhYLhgMhoNhwOh4PiAQiIRiQSiYTigUioViwWi4XjAYjIZjQajYb" +
      "jgcjodjwej4fkAgkIhkQikYjkgkkolkwmk4nlAolIplQqlYrlgslotlwul4vmAwm" +
      "IxmQymYzmg0mo1mw2m43nA4nI5nQ6nY7ng8no9nw+n4/oBAoJBoRCoZDohEopFox" +
      "Go5HpBIpJJpRKpZLphMppNpxOp5PqBQqJRqRSqZTqhUqpVqxWq5XrBYrJZrRarZb" +
      "rhcrpdrxer5fsBgsJhsRisZjshksplsxms5ntBotJptRqtZrthstpttxut5vuBwu" +
      "JxuRyuZzuh0up1ux2u53vB4vJ5vR6vZ7vh8vp9vx+n8f6Ag=")
    val r = TiffPixelEval.decodeLuma(file)
    assert(r != null, "reference-written LZW tiff refused")
    assert(r._1 === 256 && r._2 === 1)
    assert(r._3.toList === (0 until 256).toList)
  }

  test("interop LIVE: imageio-written LZW tiffs (gray + RGB) decode to " +
    "the reference pixels; imageio reads OUR tiffs back") {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    import java.awt.image.BufferedImage
    def write(img: BufferedImage): Array[Byte] = {
      val w = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("LZW")
      val bo = new java.io.ByteArrayOutputStream()
      val os = ImageIO.createImageOutputStream(bo)
      w.setOutput(os)
      w.write(null, new IIOImage(img, null, null), p)
      os.close(); w.dispose()
      bo.toByteArray
    }
    val rnd = new java.util.Random(0x11FFL)
    val gray = new BufferedImage(37, 19, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 19).foreach(y => (0 until 37).foreach(x =>
      gray.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
    val g = TiffPixelEval.decodeLuma(write(gray))
    assert(g != null && g._1 === 37 && g._2 === 19)
    (0 until 19).foreach(y => (0 until 37).foreach(x =>
      assert(g._3(y * 37 + x) === gray.getRaster.getSample(x, y, 0))))
    val rgb = new BufferedImage(23, 11, BufferedImage.TYPE_3BYTE_BGR)
    (0 until 11).foreach(y => (0 until 23).foreach(x =>
      rgb.setRGB(x, y, rnd.nextInt(1 << 24))))
    val c = TiffPixelEval.decodeLuma(write(rgb))
    assert(c != null && c._1 === 23 && c._2 === 11)
    (0 until 11).foreach { y =>
      (0 until 23).foreach { x =>
        val v = rgb.getRGB(x, y)
        val want = (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) +
          114 * (v & 0xFF)) / 1000
        assert(c._3(y * 23 + x) === want, s"rgb ($x,$y)")
      }
    }
    // reverse direction: imageio reads OUR LZW/PackBits/Deflate tiffs
    Seq(0, 1, 2, 3, 5, 6).foreach { cls =>
      val mine = TiffPixelEval.synth(13L, 8L | (6L << 8) | (cls.toLong << 16))
      val img = ImageIO.read(new java.io.ByteArrayInputStream(mine))
      assert(img != null, s"imageio refused our class-$cls tiff")
      assert(img.getWidth === 8 && img.getHeight === 6)
      val ours = TiffPixelEval.decodeLuma(mine)
      val bands = img.getRaster.getNumBands
      (0 until 6).foreach { y =>
        (0 until 8).foreach { x =>
          // raster samples, not getRGB: Java's gray ColorSpace would
          // gamma-map gray samples into sRGB and break the comparison
          val luma =
            if (bands == 1) {
              // (for the WhiteIsZero class imageio applies the
              // inversion too, so samples compare directly)
              img.getRaster.getSample(x, y, 0)
            } else {
              (299 * img.getRaster.getSample(x, y, 0) +
                587 * img.getRaster.getSample(x, y, 1) +
                114 * img.getRaster.getSample(x, y, 2)) / 1000
            }
          assert(ours._3(y * 8 + x) === luma,
            s"class $cls ($x,$y): imageio disagrees")
        }
      }
    }
  }

  test("LZW round trip crosses every width (9 through 12) and a Clear") {
    val rnd = new java.util.Random(0x71FFL)
    val data = new Array[Byte](30000)
    rnd.nextBytes(data) // incompressible: the table fills past 2046
    val enc = TiffPixelEval.lzwEncode(data)
    val dec = TiffPixelEval.lzwDecode(enc, 0, enc.length, data.length)
    assert(dec != null && java.util.Arrays.equals(dec, data))
  }

  test("both byte orders decode to the SAME pixels (classes 0 vs 1 " +
    "modulo the WhiteIsZero inversion)") {
    val shape = 9L | (5L << 8)
    val le = TiffPixelEval.decodeLuma(TiffPixelEval.synth(3L, shape))
    val be = TiffPixelEval.decodeLuma(TiffPixelEval.synth(3L, shape | (1L << 16)))
    assert(le != null && be != null)
    assert(le._1 === 9 && le._2 === 5)
    // class 1 stores 255-v under WhiteIsZero; the decoder inverts back
    assert(le._3.toList === be._3.toList)
  }

  test("LZW class and predictor class reproduce the channel-map pixels") {
    def chR(seed: Long, x: Int, r: Int) =
      (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    def chB(seed: Long, x: Int, r: Int) =
      (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt
    val shape = 7L | (4L << 8)
    val gray = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(11L, shape | (2L << 16)))
    assert(gray != null)
    (0 until 4).foreach { r =>
      (0 until 7).foreach { x =>
        assert(gray._3(r * 7 + x) === chG(11L, x, r), s"gray ($x,$r)")
      }
    }
    val rgb = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(11L, shape | (3L << 16)))
    assert(rgb != null)
    (0 until 4).foreach { r =>
      (0 until 7).foreach { x =>
        val want = (299 * chR(11L, x, r) + 587 * chG(11L, x, r) +
          114 * chB(11L, x, r)) / 1000
        assert(rgb._3(r * 7 + x) === want, s"rgb ($x,$r)")
      }
    }
  }

  test("multi-strip assembly: rows-per-strip 2 tiles the plane in order") {
    val shape = 5L | (7L << 8) // 4 strips: 2+2+2+1 rows
    val r = TiffPixelEval.decodeLuma(TiffPixelEval.synth(23L, shape))
    assert(r != null && r._2 === 7)
    def chG(seed: Long, x: Int, row: Int) =
      (((seed * 3 + x * 5 + row) % 256 + 256) % 256).toInt
    (0 until 7).foreach { row =>
      (0 until 5).foreach { x =>
        assert(r._3(row * 5 + x) === chG(23L, x, row), s"($x,$row)")
      }
    }
  }

  test("PALETTE and 16-BIT classes reproduce the channel maps and " +
    "cross-validate against imageio both directions") {
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    def chR(seed: Long, x: Int, r: Int) =
      (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    def chB(seed: Long, x: Int, r: Int) =
      (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt
    // class 8: palette index = gray map; luma = Rec.601 of the RGB
    // maps sampled at (index, 0) — the nested fold the oracle replays
    val pal = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(11L, 7L | (5L << 8) | (8L << 16)))
    assert(pal != null && pal._1 === 7 && pal._2 === 5)
    (0 until 5).foreach(r => (0 until 7).foreach { x =>
      val g = chG(11L, x, r)
      val want = (299 * chR(11L, g, 0) + 587 * chG(11L, g, 0) +
        114 * chB(11L, g, 0)) / 1000
      assert(pal._3(r * 7 + x) === want, s"palette ($x,$r)")
    })
    // class 9: 16-bit BE sample = gray<<8 | blue; high-byte fold
    val deep = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(12L, 6L | (4L << 8) | (9L << 16)))
    assert(deep != null && deep._1 === 6 && deep._2 === 4)
    (0 until 4).foreach(r => (0 until 6).foreach(x =>
      assert(deep._3(r * 6 + x) === chG(12L, x, r), s"16-bit ($x,$r)")))

    // reverse: imageio reads OUR palette file (through the ColorMap)
    // and OUR 16-bit file (raw raster samples) pixel-for-pixel
    val mine8 = TiffPixelEval.synth(11L, 7L | (5L << 8) | (8L << 16))
    val img8 = ImageIO.read(new java.io.ByteArrayInputStream(mine8))
    assert(img8 != null, "imageio refused our palette tiff")
    assert(img8.getColorModel.isInstanceOf[java.awt.image.IndexColorModel])
    (0 until 5).foreach(r => (0 until 7).foreach { x =>
      val v = img8.getRGB(x, r) // IndexColorModel maps, no gamma
      val luma = (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) +
        114 * (v & 0xFF)) / 1000
      assert(pal._3(r * 7 + x) === luma, s"palette reverse ($x,$r)")
    })
    val mine9 = TiffPixelEval.synth(12L, 6L | (4L << 8) | (9L << 16))
    val img9 = ImageIO.read(new java.io.ByteArrayInputStream(mine9))
    assert(img9 != null, "imageio refused our 16-bit tiff")
    (0 until 4).foreach(r => (0 until 6).foreach { x =>
      val v = img9.getRaster.getSample(x, r, 0) // 16-bit sample
      assert(deep._3(r * 6 + x) === (v >> 8), s"16-bit reverse ($x,$r)")
    })

    // forward: imageio WRITES palette and 16-bit tiffs, we decode them
    val icm = {
      val rr = new Array[Byte](256); val gg = new Array[Byte](256)
      val bb = new Array[Byte](256)
      val rnd = new java.util.Random(0xA11L)
      (0 until 256).foreach { i =>
        rr(i) = rnd.nextInt(256).toByte; gg(i) = rnd.nextInt(256).toByte
        bb(i) = rnd.nextInt(256).toByte
      }
      new java.awt.image.IndexColorModel(8, 256, rr, gg, bb)
    }
    val src = new BufferedImage(13, 9, BufferedImage.TYPE_BYTE_INDEXED, icm)
    val rnd = new java.util.Random(0xA12L)
    (0 until 9).foreach(y => (0 until 13).foreach(x =>
      src.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
    val bo = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(src, "tiff", bo), "no imageio tiff writer")
    val oursP = TiffPixelEval.decodeLuma(bo.toByteArray)
    assert(oursP != null, "our kernel refused an imageio palette tiff")
    (0 until 9).foreach(y => (0 until 13).foreach { x =>
      val v = src.getRGB(x, y)
      val want = (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) +
        114 * (v & 0xFF)) / 1000
      assert(oursP._3(y * 13 + x) === want, s"imageio palette ($x,$y)")
    })
    val deep16 = new BufferedImage(11, 7, BufferedImage.TYPE_USHORT_GRAY)
    (0 until 7).foreach(y => (0 until 11).foreach(x =>
      deep16.getRaster.setSample(x, y, 0, rnd.nextInt(65536))))
    val bo2 = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(deep16, "tiff", bo2), "no imageio tiff writer")
    val ours16 = TiffPixelEval.decodeLuma(bo2.toByteArray)
    assert(ours16 != null, "our kernel refused an imageio 16-bit tiff")
    (0 until 7).foreach(y => (0 until 11).foreach { x =>
      val v = deep16.getRaster.getSample(x, y, 0)
      assert(ours16._3(y * 11 + x) === (v >> 8), s"imageio 16-bit ($x,$y)")
    })
  }

  test("BILEVEL, CCITT G4, and 4-BIT classes reproduce the channel " +
    "maps and G4 cross-validates against imageio both directions") {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    import java.awt.image.BufferedImage
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    // classes 10 (uncompressed) and 11 (G4) share the bilevel plane:
    // ink (luma 0) where the gray map reads >= 128, WhiteIsZero
    Seq(10L, 11L, 13L, 14L).foreach { cls =>
      val dec = TiffPixelEval.decodeLuma(
        TiffPixelEval.synth(19L, 21L | (7L << 8) | (cls << 16)))
      assert(dec != null, s"class $cls refused")
      assert(dec._1 === 21 && dec._2 === 7)
      (0 until 7).foreach(r => (0 until 21).foreach { x =>
        val want = if (chG(19L, x, r) >= 128) 0 else 255
        assert(dec._3(r * 21 + x) === want, s"cls $cls ($x,$r)")
      })
    }
    // class 12: 4-bit nibbles, value = gray >> 4, luma x17
    val n4 = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(23L, 9L | (5L << 8) | (12L << 16)))
    assert(n4 != null && n4._1 === 9 && n4._2 === 5)
    (0 until 5).foreach(r => (0 until 9).foreach { x =>
      assert(n4._3(r * 9 + x) === (chG(23L, x, r) >> 4) * 17,
        s"4-bit ($x,$r)")
    })

    // reverse: imageio reads OUR G4 file pixel-for-pixel
    val mine = TiffPixelEval.synth(19L, 21L | (7L << 8) | (11L << 16))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(mine))
    assert(img != null, "imageio refused our G4 tiff")
    assert(img.getWidth === 21 && img.getHeight === 7)
    val ours = TiffPixelEval.decodeLuma(mine)
    (0 until 7).foreach(r => (0 until 21).foreach { x =>
      // TYPE_BYTE_BINARY raster: sample 1 = black after imageio's
      // WhiteIsZero handling? compare through getRGB luminance
      val v = img.getRGB(x, r) & 0xFF
      assert(ours._3(r * 21 + x) === v, s"g4 reverse ($x,$r)")
    })

    // forward: imageio WRITES a CCITT T.6 tiff, we decode it
    val rnd = new java.util.Random(0xCC17L)
    val src = new BufferedImage(43, 17, BufferedImage.TYPE_BYTE_BINARY)
    (0 until 17).foreach(y => (0 until 43).foreach(x =>
      src.getRaster.setSample(x, y, 0, rnd.nextInt(2))))
    val wtr = ImageIO.getImageWritersByFormatName("tiff").next()
    val prm = wtr.getDefaultWriteParam
    prm.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionType("CCITT T.6")
    val bo = new java.io.ByteArrayOutputStream()
    val os = ImageIO.createImageOutputStream(bo)
    wtr.setOutput(os)
    wtr.write(null, new IIOImage(src, null, null), prm)
    os.close(); wtr.dispose()
    val oursF = TiffPixelEval.decodeLuma(bo.toByteArray)
    assert(oursF != null, "our kernel refused an imageio T.6 tiff")
    assert(oursF._1 === 43 && oursF._2 === 17)
    (0 until 17).foreach(y => (0 until 43).foreach { x =>
      val v = src.getRGB(x, y) & 0xFF // 0 or 255
      assert(oursF._3(y * 43 + x) === v, s"imageio g4 ($x,$y)")
    })
  }

  test("fax edge shapes vs imageio (T.6, T.4-2D, RLE): all-black, " +
    "all-white, alternating columns, diagonal stripes, byte-boundary " +
    "widths") {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    import java.awt.image.BufferedImage
    // shapes chosen to stress the T.6 mode selection: pure vertical
    // runs, pass modes on disappearing runs, single-pixel horizontal
    // runs, and widths that straddle row byte padding (1, 3, 129)
    val shapes = Seq((64, 3), (8, 8), (1, 5), (3, 1), (129, 2))
    shapes.foreach { case (w, h) =>
      (0 until 4).foreach { pat =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
        (0 until h).foreach(y => (0 until w).foreach { x =>
          val v = pat match {
            case 0 => 1 // all black
            case 1 => 0 // all white
            case 2 => x & 1 // alternating columns: 1-px runs all row
            case _ => if ((x + y) % 3 == 0) 1 else 0 // moving stripes
          }
          img.getRaster.setSample(x, y, 0, v)
        })
        // forward: imageio writes each fax codec, we decode — the
        // T.4 spelling imageio emits is 2D-with-tag-bits (T4Options=1)
        Seq("CCITT T.6", "CCITT T.4", "CCITT RLE").foreach { codec =>
          val wr = ImageIO.getImageWritersByFormatName("tiff").next()
          val p = wr.getDefaultWriteParam
          p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionType(codec)
          val bo = new java.io.ByteArrayOutputStream()
          val os = ImageIO.createImageOutputStream(bo)
          wr.setOutput(os)
          val wrote =
            try { wr.write(null, new IIOImage(img, null, null), p); true }
            catch {
              // the JDK's OWN TIFFRLECompressor under-allocates its
              // byte buffer on some degenerate rows and throws AIOOBE
              // — an imageio bug, not a file we could ever receive;
              // skip just that (codec, shape) cell
              case _: ArrayIndexOutOfBoundsException => false
            }
          os.close(); wr.dispose()
          if (wrote) {
            val ours = TiffPixelEval.decodeLuma(bo.toByteArray)
            assert(ours != null, s"$codec ${w}x$h pat$pat refused")
            assert(ours._1 === w && ours._2 === h)
            (0 until h).foreach(y => (0 until w).foreach { x =>
              assert(ours._3(y * w + x) === (img.getRGB(x, y) & 0xFF),
                s"$codec ${w}x$h pat$pat ($x,$y)")
            })
          }
        }
        // and the mirror: our encoders' bytes, their decoder (G4,
        // byte-aligned MH, and pure-1D Group 3)
        val rowBytes = (w + 7) / 8
        val px = new Array[Byte](rowBytes * h)
        (0 until h).foreach(y => (0 until w).foreach { x =>
          if ((img.getRaster.getSample(x, y, 0) & 1) == 1)
            px(y * rowBytes + (x >> 3)) =
              (px(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
        })
        Seq(4, 2, 3).foreach { comp =>
          val mine = TiffPixelEval.writeTiff(le = true, w, h, 1, 0, comp,
            1, rps = h, px, bps = 1)
          val their =
            try ImageIO.read(new java.io.ByteArrayInputStream(mine))
            catch {
              // the JDK's fax READER has its own width-1 bug (AIOOBE
              // on 1-wide rows opening with a zero white run, comps
              // 2/3); our decoder must still round-trip those files
              case _: javax.imageio.IIOException if w == 1 => null
            }
          if (their != null) {
            (0 until h).foreach(y => (0 until w).foreach { x =>
              val want =
                if ((img.getRaster.getSample(x, y, 0) & 1) == 1) 0 else 255
              assert((their.getRGB(x, y) & 0xFF) === want,
                s"reverse comp-$comp ${w}x$h pat$pat ($x,$y)")
            })
          } else {
            val ours = TiffPixelEval.decodeLuma(mine)
            assert(ours != null, s"own comp-$comp ${w}x$h pat$pat refused")
            (0 until h).foreach(y => (0 until w).foreach { x =>
              val want =
                if ((img.getRaster.getSample(x, y, 0) & 1) == 1) 0 else 255
              assert(ours._3(y * w + x) === want,
                s"own comp-$comp ${w}x$h pat$pat ($x,$y)")
            })
          }
        }
      }
    }
  }

  test("truncation and scope refusals: stats refuse, never throw") {
    val cut = TiffPixelEval.synth(9L, 6L | (4L << 8) | (4L << 16))
    assert(TiffPixelEval.lumaStats(cut) === java.lang.Long.MIN_VALUE)
    assert(TiffPixelEval.lumaStats("not a tiff".getBytes("US-ASCII")) ===
      java.lang.Long.MIN_VALUE)
    assert(TiffPixelEval.lumaStats(null) === java.lang.Long.MIN_VALUE)
  }

  test("truncation class keeps a whole IFD: dims would parse, strips refuse") {
    // r17 advisory: the strips-last layout cut the IFD tail, so for
    // single-strip shapes the class doc's "dims parse" was false. The
    // IFD-first layout pins it: the magic AND the full entry table
    // survive the cut — only strip bytes are gone.
    val cut = TiffPixelEval.synth(9L, 6L | (1L << 8) | (4L << 16)) // h=1: worst case
    assert(cut(0) == 'I' && cut(1) == 'I')
    // IFD at offset 8 parses whole: entry count + entries + next ptr
    val n = (cut(8) & 0xFF) | ((cut(9) & 0xFF) << 8)
    assert(n > 0 && 10 + n * 12 + 4 <= cut.length)
    // width/height entries present with the synthesized values
    def entry(tag: Int): Option[Int] = (0 until n).collectFirst {
      case e if ((cut(10 + e * 12) & 0xFF) | ((cut(11 + e * 12) & 0xFF) << 8)) == tag =>
        (cut(10 + e * 12 + 8) & 0xFF) | ((cut(10 + e * 12 + 9) & 0xFF) << 8)
    }
    assert(entry(256).contains(6))
    assert(entry(257).contains(1))
    assert(TiffPixelEval.lumaStats(cut) === java.lang.Long.MIN_VALUE)
  }

  test("hostile IFD offsets near Int.MaxValue refuse, never throw") {
    // r17 advisory (medium): `off + n` in int overflowed, passing the
    // bounds check and throwing from the read. Craft exactly that: a
    // SHORT array of 65536 entries parked at 0x7FFE0000.
    def tiff(valueOff: Long, count: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def p16(v: Int) = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
      def p32(v: Long) = { p16((v & 0xFFFF).toInt); p16(((v >> 16) & 0xFFFF).toInt) }
      o.write('I'); o.write('I'); o.write(42); o.write(0)
      p32(8) // IFD here
      p16(1) // one entry
      p16(273); p16(3); p32(count); p32(valueOff)
      p32(0)
      o.toByteArray
    }
    assert(TiffPixelEval.lumaStats(tiff(0x7FFE0000L, 65536L)) ===
      java.lang.Long.MIN_VALUE)
    assert(TiffPixelEval.lumaStats(tiff(0xFFFFFFF0L, 4L)) ===
      java.lang.Long.MIN_VALUE)
    assert(TiffPixelEval.lumaStats(tiff(Int.MaxValue.toLong - 1, 65536L)) ===
      java.lang.Long.MIN_VALUE)
  }

  test("fuzz: flips and cuts over all classes refuse or decode, " +
    "never throw") {
    val rnd = new java.util.Random(0x7177L)
    (0 until 15).foreach { cls =>
      val whole = TiffPixelEval.synth(5L, 6L | (5L << 8) | (cls.toLong << 16))
      (0 until 200).foreach { k =>
        val bad = whole.clone()
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
        try TiffPixelEval.lumaStats(bad)
        catch { case e: Throwable => fail(s"cls $cls flip $k threw: $e") }
      }
      (1 until whole.length by 5).foreach { cut =>
        try TiffPixelEval.lumaStats(java.util.Arrays.copyOf(whole, cut))
        catch { case e: Throwable => fail(s"cls $cls cut $cut threw: $e") }
      }
    }
  }

  test("PackBits and Deflate classes reproduce the channel-map pixels " +
    "and imageio cross-reads them") {
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    val pb = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(17L, 6L | (5L << 8) | (5L << 16)))
    assert(pb != null && pb._1 === 6 && pb._2 === 5)
    (0 until 5).foreach(r => (0 until 6).foreach(x =>
      assert(pb._3(r * 6 + x) === chG(17L, x, r), s"packbits ($x,$r)")))
    val df = TiffPixelEval.decodeLuma(
      TiffPixelEval.synth(17L, 6L | (5L << 8) | (6L << 16)))
    assert(df != null && df._1 === 6 && df._2 === 5)
    // deflate class is RGB + predictor: spot the full fold via stats
    assert(TiffPixelEval.lumaStats(
      TiffPixelEval.synth(17L, 6L | (5L << 8) | (6L << 16))) !==
      java.lang.Long.MIN_VALUE)
    // hand vector: PackBits of a repeat-then-literal row, from the spec
    // text: 5 x 'a' -> (-4, 'a'); "xyz" -> (2, 'x','y','z')
    val enc = TiffPixelEval.packbitsEncode("aaaaaxyz".getBytes("US-ASCII"))
    assert(enc.toList === List[Byte](-4, 'a', 2, 'x', 'y', 'z'))
    assert(TiffPixelEval.packbitsDecode(enc, 0, enc.length, 8).toList ===
      "aaaaaxyz".getBytes("US-ASCII").toList)
    // -128 noop bytes are skipped
    val withNoop = Array[Byte](-128, 0, 'q', -128)
    assert(TiffPixelEval.packbitsDecode(withNoop, 0, 4, 1).toList ===
      List[Byte]('q'))
  }

  test("TILED layout: 16x16 tiles over non-multiple dims crop right, " +
    "multi-tile placement matches the channel map, imageio both ways") {
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    // our tiled synth (class 7): 37x18 = 3x2 tiles with edge padding
    Seq(0L, 1L).foreach { seed =>
      val file = TiffPixelEval.synth(seed, 7L << 16)
      val r = TiffPixelEval.decodeLuma(file)
      val w = ((seed % 2) + 1).toInt * 16 + 5
      assert(r != null && r._1 === w && r._2 === 18, s"seed $seed dims")
      (0 until 18).foreach { row =>
        (0 until w).foreach { x =>
          assert(r._3(row * w + x) === chG(seed, x, row),
            s"seed $seed ($x,$row)")
        }
      }
      // imageio reads our tiled LZW file back pixel-for-pixel
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(file))
      assert(img != null, "imageio refused our tiled tiff")
      assert(img.getWidth === w && img.getHeight === 18)
      (0 until 18).foreach { row =>
        (0 until w).foreach { x =>
          assert(img.getRaster.getSample(x, row, 0) === chG(seed, x, row),
            s"imageio seed $seed ($x,$row)")
        }
      }
    }
    // and the reverse: an imageio-written TILED LZW tiff decodes whole
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    import java.awt.image.BufferedImage
    val rnd = new java.util.Random(0x7117L)
    val src = new BufferedImage(41, 35, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 35).foreach(y => (0 until 41).foreach(x =>
      src.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
    val wtr = ImageIO.getImageWritersByFormatName("tiff").next()
    val prm = wtr.getDefaultWriteParam
    prm.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionType("LZW")
    prm.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
    prm.setTiling(16, 16, 0, 0)
    val bo = new java.io.ByteArrayOutputStream()
    val os = ImageIO.createImageOutputStream(bo)
    wtr.setOutput(os)
    wtr.write(null, new IIOImage(src, null, null), prm)
    os.close(); wtr.dispose()
    val got = TiffPixelEval.decodeLuma(bo.toByteArray)
    assert(got != null, "imageio tiled tiff refused")
    assert(got._1 === 41 && got._2 === 35)
    (0 until 35).foreach(y => (0 until 41).foreach(x =>
      assert(got._3(y * 41 + x) === src.getRaster.getSample(x, y, 0),
        s"tiled interop ($x,$y)")))
  }
}
