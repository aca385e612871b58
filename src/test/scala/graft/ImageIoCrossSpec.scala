package graft

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** INDEPENDENT cross-validation of the still-image pixel family
  * against the JDK's own javax.imageio codecs (PNG/GIF/BMP/JPEG
  * readers and writers ship in every JDK — found in r17 while pinning
  * the TIFF kernel). Until now the family's external evidence was
  * hand vectors; this spec makes a SECOND implementation agree:
  *
  *  - forward: imageio WRITES a file, our kernel and imageio's own
  *    reader must fold to the same luma stats (exact for the lossless
  *    trio; tolerance ±2/px for JPEG, where IDCT rounding legitimately
  *    differs between conformant decoders);
  *  - reverse: imageio READS our synthesized files and must see the
  *    same pixels our decoder reports.
  */
class ImageIoCrossSpec extends AnyFunSuite {

  private def statsOfRaster(img: BufferedImage): (Int, Int, Long) = {
    var mn = 255; var mx = 0; var s = 0L
    val bands = img.getRaster.getNumBands
    // single-band INDEXED rasters hold palette indices, not luma — go
    // through getRGB there (IndexColorModel maps directly, no gamma);
    // single-band GRAY rasters must NOT (getRGB gamma-maps gray->sRGB)
    val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    (0 until img.getHeight).foreach { y =>
      (0 until img.getWidth).foreach { x =>
        val l =
          if (bands == 1 && indexed) {
            val v = img.getRGB(x, y)
            (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) +
              114 * (v & 0xFF)) / 1000
          }
          else if (bands == 1) img.getRaster.getSample(x, y, 0)
          else (299 * img.getRaster.getSample(x, y, 0) +
            587 * img.getRaster.getSample(x, y, 1) +
            114 * img.getRaster.getSample(x, y, 2)) / 1000
        if (l < mn) mn = l
        if (l > mx) mx = l
        s += l
      }
    }
    (mn, mx, s)
  }

  private def unpack(packed: Long): (Int, Int, Long) =
    ((packed & 0xFF).toInt, ((packed >> 8) & 0xFF).toInt, packed >>> 16)

  private def writeAs(fmt: String, img: BufferedImage): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bo), s"imageio has no $fmt writer")
    bo.toByteArray
  }

  private def rgbImage(w: Int, h: Int, seed: Long): BufferedImage = {
    val rnd = new java.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, rnd.nextInt(1 << 24))))
    img
  }

  test("PNG: imageio-written truecolor decodes to identical stats") {
    val img = rgbImage(41, 23, 0x9E9L)
    val ref = statsOfRaster(img)
    val packed = graft.functions.PngPixelEval.lumaStats(writeAs("png", img))
    assert(packed !== java.lang.Long.MIN_VALUE, "imageio PNG refused")
    assert(unpack(packed) === ref)
  }

  test("PNG: imageio-written grayscale decodes to identical stats") {
    val rnd = new java.util.Random(0x9E10L)
    val img = new BufferedImage(29, 31, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 31).foreach(y => (0 until 29).foreach(x =>
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
    val ref = statsOfRaster(img)
    val packed = graft.functions.PngPixelEval.lumaStats(writeAs("png", img))
    assert(packed !== java.lang.Long.MIN_VALUE)
    assert(unpack(packed) === ref)
  }

  test("GIF: imageio-written palette image decodes to identical stats") {
    // an indexed image keeps the writer from quantizing: pixels survive
    val img0 = rgbImage(33, 17, 0x61FL)
    val img = new BufferedImage(33, 17, BufferedImage.TYPE_BYTE_INDEXED)
    val g = img.createGraphics()
    g.drawImage(img0, 0, 0, null)
    g.dispose()
    val ref = statsOfRaster(
      ImageIO.read(new java.io.ByteArrayInputStream(writeAs("gif", img))))
    val packed = graft.functions.GifPixelEval.lumaStats(writeAs("gif", img))
    assert(packed !== java.lang.Long.MIN_VALUE, "imageio GIF refused")
    assert(unpack(packed) === ref)
  }

  test("BMP: imageio-written 24-bit decodes to identical stats") {
    val img = rgbImage(27, 13, 0xB4BL)
    val ref = statsOfRaster(img)
    val file = writeAs("bmp", img)
    val expr = graft.functions.BmpLuma(
      org.apache.spark.sql.catalyst.expressions.Literal(file,
        org.apache.spark.sql.types.BinaryType))
    val packed = expr.eval(null).asInstanceOf[java.lang.Long]
    assert(packed != null, "imageio BMP refused")
    assert(unpack(packed) === ref)
  }

  test("JPEG: imageio-written grayscale agrees within IDCT rounding") {
    // smooth content (not noise): conformant decoders' IDCTs agree to
    // within a count or two per pixel; structural bugs miss by miles
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 32).foreach(y => (0 until 48).foreach(x =>
      img.getRaster.setSample(x, y, 0, (128 + 90 *
        math.sin(x * 0.3) * math.cos(y * 0.2)).toInt.max(0).min(255))))
    val file = writeAs("jpg", img)
    val theirs = statsOfRaster(
      ImageIO.read(new java.io.ByteArrayInputStream(file)))
    val packed = graft.functions.JpegPixelEval.lumaStats(file)
    assert(packed !== java.lang.Long.MIN_VALUE, "imageio JPEG refused")
    val ours = unpack(packed)
    assert(math.abs(ours._1 - theirs._1) <= 2, s"min ${ours._1} vs ${theirs._1}")
    assert(math.abs(ours._2 - theirs._2) <= 2, s"max ${ours._2} vs ${theirs._2}")
    assert(math.abs(ours._3 - theirs._3) <= 2L * 48 * 32,
      s"sum ${ours._3} vs ${theirs._3}")
  }

  test("reverse: imageio reads OUR png/gif synth files pixel-for-pixel") {
    // png class 1 (truecolor five-filter walk), gif class 0 — the q127
    // residue classes; imageio's readers must see the channel maps
    def chR(seed: Long, x: Int, r: Int) =
      (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
    def chG(seed: Long, x: Int, r: Int) =
      (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
    def chB(seed: Long, x: Int, r: Int) =
      (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt
    val png = graft.functions.PngPixelEval.synth(7L, 5, 4, 1)
    val pimg = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(pimg != null, "imageio refused our png")
    assert(pimg.getWidth === 5 && pimg.getHeight === 4)
    (0 until 4).foreach { r =>
      (0 until 5).foreach { x =>
        val v = pimg.getRGB(x, r)
        assert(((v >> 16) & 0xFF) === chR(7L, x, r), s"png R ($x,$r)")
        assert(((v >> 8) & 0xFF) === chG(7L, x, r), s"png G ($x,$r)")
        assert((v & 0xFF) === chB(7L, x, r), s"png B ($x,$r)")
      }
    }
    val gif = graft.functions.GifPixelEval.synth(7L, 5, 4, 0)
    val gimg = ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(gimg != null, "imageio refused our gif")
    assert(gimg.getWidth === 5 && gimg.getHeight === 4)
    // gif palette entries ride the q124 algebra: check against OUR
    // decoder's stats instead of re-deriving the palette here
    val ours = unpack(graft.functions.GifPixelEval.lumaStats(gif))
    val theirs = statsOfRaster(gimg)
    val viaRgb = {
      var mn = 255; var mx = 0; var s = 0L
      (0 until 4).foreach(r => (0 until 5).foreach { x =>
        val v = gimg.getRGB(x, r)
        val l = (299 * ((v >> 16) & 0xFF) + 587 * ((v >> 8) & 0xFF) +
          114 * (v & 0xFF)) / 1000
        if (l < mn) mn = l
        if (l > mx) mx = l
        s += l
      })
      (mn, mx, s)
    }
    assert(ours === viaRgb, s"gif: imageio $viaRgb vs ours $ours ($theirs)")
  }
}
