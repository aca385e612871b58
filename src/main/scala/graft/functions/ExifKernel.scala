package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** EXIF orientation intake (q131) — the metadata rung the perceptual
  * dedup family (q101/q102) was silently missing: a camera stores its
  * sensor raster SIDEWAYS and records tag 274 ("rotate to display"),
  * while a re-encode BAKES the rotation into pixels and drops the tag.
  * Both files display the same picture, but a stored-pixel hash puts
  * them in different groups — the highest-volume real-photo near-dup
  * gap. This kernel reads the tag with a TIFF IFD entry scan (the
  * [[TiffEval]] walk re-rooted at the JPEG APP1 payload — same 12-byte
  * entries, same both-byte-order discipline, same inline SHORT trap)
  * and computes an orientation-NORMALIZED average hash: the aHash of
  * the image AS DISPLAYED, so camera file and baked re-encode collide.
  *
  * Scope and refusal posture: orientation is ancillary metadata — a
  * malformed or absent EXIF block (bad magic, truncated IFD, wrong
  * type/count, value outside 1..8, an APP1 that is XMP rather than
  * Exif) reports 0 and the image is treated as already upright; the
  * PIXEL side keeps the q59 stop-don't-guess rule (undecodable stream
  * refuses NULL). Reference scope: scholar-stream treats media as
  * opaque blobs (infra/glue only, reference app/streamlit_app.py
  * renders nothing) — this is a north-star extension of the multimodal
  * family (q39/q118/q121/q127).
  */
object ExifEval {

  private final val NoHash = java.lang.Long.MIN_VALUE

  /** EXIF orientation (tag 274) from the first APP1 segment that parses
    * as Exif, or 0 when absent or malformed. Walks marker segments from
    * SOI up to the first scan — APP1 must precede entropy data.
    */
  def orientation(b: Array[Byte]): Int = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return 0
    var i = 2
    val len = b.length
    while (i + 3 < len) {
      if ((b(i) & 0xFF) != 0xFF) return 0
      while (i + 1 < len && (b(i + 1) & 0xFF) == 0xFF) i += 1
      if (i + 1 >= len) return 0
      val m = b(i + 1) & 0xFF
      if (m == 0xD9 || m == 0xDA) return 0 // reached the scan: no EXIF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
      else {
        if (i + 3 >= len) return 0
        val segLen = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (segLen < 2 || i + 2 + segLen > len) return 0
        if (m == 0xE1) {
          val o = parseExifApp1(b, i + 4, i + 2 + segLen)
          if (o > 0) return o
          // a non-Exif APP1 (XMP lives there too) or a malformed one:
          // keep walking — a later APP1 may carry the real block
        }
        i += 2 + segLen
      }
    }
    0
  }

  /** One APP1 payload `[from, end)`: `Exif\0\0` + TIFF header + IFD 0
    * entry scan for tag 274 (SHORT, count 1, value 1..8) under either
    * byte order. 0 on any malformation — all offsets are relative to
    * the TIFF base and every read is bounds-checked against the
    * segment's own extent (an offset may not borrow later bytes).
    */
  private def parseExifApp1(b: Array[Byte], from: Int, end: Int): Int = {
    if (from + 6 > end) return 0
    if (b(from) != 'E' || b(from + 1) != 'x' || b(from + 2) != 'i' ||
      b(from + 3) != 'f' || b(from + 4) != 0 || b(from + 5) != 0) return 0
    val t = from + 6 // TIFF base: all TIFF offsets are relative to here
    if (t + 8 > end) return 0
    val le = (b(t) & 0xFF) == 'I' && (b(t + 1) & 0xFF) == 'I'
    val be = (b(t) & 0xFF) == 'M' && (b(t + 1) & 0xFF) == 'M'
    if (!le && !be) return 0
    def u16(off: Int): Int =
      if (off < 0 || off + 1 >= end) -1
      else if (le) (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
      else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    def u32(off: Int): Long =
      if (off < 0 || off + 3 >= end) -1L
      else if (le) (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
      else ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    if (u16(t + 2) != 42) return 0
    val ifd = u32(t + 4)
    if (ifd < 8 || ifd > end - t) return 0
    val p0 = t + ifd.toInt
    val n = u16(p0)
    if (n <= 0) return 0
    // the whole DECLARED entry table must fit the segment — a count
    // that overruns is a malformed IFD even when the orientation entry
    // itself lands early (the TiffEval full-scan discipline)
    if (p0 + 2 + n * 12 > end) return 0
    var i = 0
    while (i < n) {
      val e = p0 + 2 + i * 12
      if (e + 11 >= end) return 0 // unreachable after the extent check
      if (u16(e) == 274) {
        // Orientation must be SHORT count 1 with an inline value (the
        // 2 value bytes sit at the FRONT of the 4-byte field in both
        // orders — the TiffEval endianness trap)
        if (u16(e + 2) != 3 || u32(e + 4) != 1L) return 0
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) v else 0
      }
      i += 1
    }
    0
  }

  /** Stored-image coordinates of upright (display) pixel `(ux, uy)`
    * under EXIF orientation `o` — the tag's display formulas inverted:
    * orientation N says "apply this transform to show the file", so
    * the upright sample at (ux, uy) reads stored pixel (sx, sy).
    * `ws`/`hs` are STORED dims; for o >= 5 upright dims are swapped.
    * Packed `sx.toLong << 32 | sy` to keep the hot loop allocation-free.
    */
  private def storedCoord(o: Int, ux: Int, uy: Int, ws: Int, hs: Int): Long = {
    val sx = o match {
      case 2 | 3 => ws - 1 - ux
      case 5 | 6 => uy
      case 7 | 8 => ws - 1 - uy
      case _ => ux // 1, 4
    }
    val sy = o match {
      case 3 | 4 => hs - 1 - uy
      case 6 | 7 => hs - 1 - ux
      case 5 | 8 => ux
      case _ => uy // 1, 2
    }
    (sx.toLong << 32) | sy.toLong
  }

  /** Orientation-NORMALIZED 64-bit average hash: decode the luma plane,
    * sample the 8×8 grid at the UPRIGHT image's cell corners
    * (`gx·W/8, gy·H/8` — [[BmpAHash]]'s grid contract), mapping each
    * sample through the orientation transform into stored coordinates;
    * floor mean, strict-above bits, LSB-first row packing. A sideways
    * camera file (tag 5..8) and its baked upright re-encode hash the
    * same display image, so they collide exactly. [[NoHash]] when the
    * stream refuses to decode.
    */
  def normAHash(b: Array[Byte]): Long = {
    val plane = JpegPixelEval.lumaPlane(b)
    if (plane == null) return NoHash
    val o0 = orientation(b)
    val o = if (o0 == 0) 1 else o0 // absent metadata = already upright
    val ws = plane.w
    val hs = plane.h
    val uw = if (o >= 5) hs else ws
    val uh = if (o >= 5) ws else hs
    val cells = new Array[Int](64)
    var sum = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val packed = storedCoord(o, gx * uw / 8, gy * uh / 8, ws, hs)
        val l = plane.px((packed & 0xFFFFFFFFL).toInt * ws +
          (packed >>> 32).toInt)
        cells(gy * 8 + gx) = l
        sum += l
        gx += 1
      }
      gy += 1
    }
    val mean = sum / 64
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (cells(k) > mean) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Synthesize a q131 intake payload: an upright `bwU`×`bhU` flat-block
    * picture (luma = [[JpegPixelEval.blockDc]]`(seed) + 128`) STORED
    * under EXIF orientation `o` — the stored block grid is the inverse
    * display transform, so every payload of a seed displays the SAME
    * upright picture regardless of `o`. Params pack
    * `bwU | bhU<<8 | o<<16 | le<<24 | trunc<<25`: `o` 0 stores upright
    * with NO APP1 (the baked-re-encode class), `le` picks the TIFF byte
    * order, `trunc` drops the tail so the pixel decode refuses while
    * the APP1 and SOF headers (written first) still parse — the q39
    * meta/pixel split.
    */
  def synth(seed: Long, params: Long): Array[Byte] = {
    val bwU = (params & 0xFF).toInt
    val bhU = ((params >> 8) & 0xFF).toInt
    val o = ((params >> 16) & 0xFF).toInt
    val le = ((params >> 24) & 1L) == 1L
    val trunc = if (((params >> 25) & 1L) == 1L) 4 else 0
    require(bwU >= 1 && bhU >= 1 && o <= 8, s"bad shape $bwU x $bhU o=$o")
    val bwS = if (o >= 5) bhU else bwU
    val bhS = if (o >= 5) bwU else bhU
    val dcs = new Array[Int](bwS * bhS)
    val oo = if (o == 0) 1 else o
    var uy = 0
    while (uy < bhU) {
      var ux = 0
      while (ux < bwU) {
        // blocks are 8-aligned squares, so the pixel-space display
        // formulas hold verbatim at block granularity
        val packed = storedCoord(oo, ux, uy, bwS, bhS)
        val sx = (packed >>> 32).toInt
        val sy = (packed & 0xFFFFFFFFL).toInt
        dcs(sy * bwS + sx) = JpegPixelEval.blockDc(seed, uy * bwU + ux)
        ux += 1
      }
      uy += 1
    }
    val app1 = if (o == 0) null else buildApp1(o, le)
    JpegPixelEval.synthBaselineGray(dcs, bwS, bhS, app1, trunc)
  }

  /** A minimal conforming Exif APP1: `Exif\0\0`, TIFF header in the
    * chosen byte order, one IFD-0 entry (tag 274, SHORT, count 1, value
    * inline at the front of the field), no next IFD.
    */
  private def buildApp1(o: Int, le: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def w32(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
      else { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
    u8(0xFF); u8(0xE1)
    val tiffLen = 8 + 2 + 12 + 4
    val segLen = 2 + 6 + tiffLen
    u8(segLen >> 8); u8(segLen & 0xFF)
    "Exif".foreach(c => u8(c))
    u8(0); u8(0)
    if (le) { u8('I'); u8('I') } else { u8('M'); u8('M') }
    w16(42)
    w32(8) // IFD 0 right after the header
    w16(1) // one entry
    w16(274); w16(3); w32(1)
    w16(o); w16(0) // inline SHORT: 2 value bytes then 2 padding
    w32(0) // no next IFD
    out.toByteArray
  }
}

/** `binary -> int`: EXIF orientation tag via [[ExifEval.orientation]] —
  * 0 when absent or malformed (metadata is ancillary; only a null/
  * non-JPEG input is NULL via the null-safe wrapper).
  */
case class ExifOrient(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_orient"

  override protected def nullSafeEval(input: Any): Any =
    ExifEval.orientation(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      bytes => s"graft.functions.ExifEval.orientation($bytes)")

  override protected def withNewChildInternal(newChild: Expression): ExifOrient =
    copy(child = newChild)
}

/** `binary -> long`: orientation-normalized aHash via
  * [[ExifEval.normAHash]]; NULL when the pixel stream refuses.
  */
case class ExifNormAHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_ahash"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ExifEval.normAHash(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("nhash")
      s"""
         |long $res = graft.functions.ExifEval.normAHash($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ExifNormAHash =
    copy(child = newChild)
}

/** `(long seed, long params) -> binary`: q131's synthesis expression —
  * see [[ExifEval.synth]] for the param packing.
  */
case class ExifSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_synth"

  override protected def nullSafeEval(seed: Any, params: Any): Any =
    ExifEval.synth(seed.asInstanceOf[Long], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.ExifEval.synth($s, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ExifSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the EXIF orientation kernels. */
object ExifOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def exifOrient(bin: Column): Column =
    ColumnBridge.column(ExifOrient(ColumnBridge.expression(bin.cast("binary"))))

  def exifNormAHash(bin: Column): Column =
    ColumnBridge.column(ExifNormAHash(ColumnBridge.expression(bin.cast("binary"))))

  def exifSynth(seed: Column, params: Column): Column =
    ColumnBridge.column(ExifSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(params.cast("long"))))
}
