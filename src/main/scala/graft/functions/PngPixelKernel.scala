package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PNG PIXEL decode — the lossless-codec rung q39 left as an honest cap
  * (it reads IHDR dims only; real crawls ship full rasters). A pure-JVM
  * RFC 2083 decoder: signature + CRC-verified chunk walk (IHDR / IDAT
  * run / IEND), zlib inflate of the concatenated IDAT stream
  * (incremental — two scanline buffers, never the whole raster), the
  * five row filters (None/Sub/Up/Average/Paeth) inverted per scanline,
  * folded to the same packed Rec.601 luma stats contract as
  * [[BmpLuma]]: `min | max<<8 | sum<<16`.
  *
  * Scope is stated, not guessed: 8- and 16-BIT depths, ALL FIVE color
  * types — 0 (grayscale, luma = the sample), 2 (truecolor),
  * 3 (palette — PLTE-indexed, 8-bit only per spec; luma from the
  * mapped RGB; filters apply to the raw index bytes per RFC 2083
  * §6.2), 4 (gray+alpha) and 6 (truecolor+alpha, alpha
  * luma-irrelevant in both) — plain or Adam7 INTERLACED (the seven
  * passes are defiltered as independent sub-images — fresh zero row
  * per pass, pass-local stride — and since every pixel appears in
  * exactly one pass, the luma fold is position-free). 16-bit samples
  * are big-endian and fold their HIGH byte (the 16→8 rescale every
  * thumbnailer applies), and they WIDEN the filter unit — the
  * Sub/Paeth byte offsets move by channels × 2, the classic 16-bit
  * shear bug. Sub-byte depths (1/2/4) and nonzero compression/filter
  * methods return NULL — stop-don't-guess, the q82/q95 stance. Any structural lie also refuses: bad chunk CRC, a
  * filter byte past 4, IDAT inflating to anything but exactly the
  * pass-geometry byte count, a non-consecutive IDAT run, truncated
  * chunks, a missing IEND, a missing/odd-length/oversized PLTE for
  * type 3, or a palette index past the table. Dims past 1<<20 per edge
  * refuse as a resource guard (a header is attacker-controlled; the
  * scanline buffer must stay bounded).
  *
  * Reference behavior: scholar-stream treats media as opaque blobs
  * (infra/glue only); this kernel is a north-star extension of the
  * multimodal family (q39/q56-q62/q118).
  */
object PngPixelEval {

  private final val NoStats = java.lang.Long.MIN_VALUE
  // per-edge cap: the scanline buffers are 2·(1 + w·bpp) bytes and the
  // header is attacker-controlled — 2^20 holds them to ~8 MB worst case
  // (rows stream, so HEIGHT needs no tighter bound than the edge cap)
  private final val MaxEdge = 1 << 20
  // total-pixel cap: a zlib-bomb IDAT (~1032:1) could otherwise drive a
  // ~2^40-pixel decode — an unbounded CPU sink whose luma sum would
  // overflow the `sum << 16` packing (sum must stay < 2^47). 2^28 px
  // keeps sum ≤ 255·2^28 < 2^36 with a ~4000:1 safety margin and is
  // still far above any real raster this corpus carries.
  private final val MaxPixels = 1L << 28

  // one Inflater + CRC32 per executor thread (the GzipEval discipline):
  // native zlib stream allocation per row would dominate the decode
  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater(false) // zlib-wrapped, per PNG spec
  }
  private val crc32 = new ThreadLocal[java.util.zip.CRC32] {
    override def initialValue(): java.util.zip.CRC32 = new java.util.zip.CRC32
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private val Sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Packed Rec.601 luma stats of a PNG, or the NULL-marker on refusal. */
  def lumaStats(b: Array[Byte]): Long = {
    if (b == null || b.length < 8) return NoStats
    var i = 0
    while (i < 8) { if ((b(i) & 0xFF) != Sig(i)) return NoStats; i += 1 }
    val crc = crc32.get()

    // chunk walk: IHDR first (spec), one consecutive IDAT run, IEND last
    var pos = 8
    var width = 0
    var height = 0
    var colorType = -1
    var depth = 8
    var interlaced = false
    var sawIhdr = false
    var idatDone = false
    var sawIend = false
    var palette: Array[Byte] = null
    var palN = 0
    // IDAT data segments, concatenated lazily into the inflate loop
    val idatOff = new java.util.ArrayList[Int]()
    val idatLen = new java.util.ArrayList[Int]()
    while (!sawIend) {
      if (pos + 8 > b.length) return NoStats
      val dlen = be32(b, pos)
      if (dlen < 0 || dlen > Int.MaxValue - 12 || pos + 12 + dlen > b.length)
        return NoStats
      val dl = dlen.toInt
      val t0 = b(pos + 4) & 0xFF; val t1 = b(pos + 5) & 0xFF
      val t2 = b(pos + 6) & 0xFF; val t3 = b(pos + 7) & 0xFF
      crc.reset()
      crc.update(b, pos + 4, 4 + dl)
      if (crc.getValue != be32(b, pos + 8 + dl)) return NoStats
      val isIhdr = t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R'
      val isIdat = t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T'
      val isIend = t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D'
      val isPlte = t0 == 'P' && t1 == 'L' && t2 == 'T' && t3 == 'E'
      if (!sawIhdr) {
        if (!isIhdr) return NoStats // IHDR must be the first chunk
        if (dl != 13) return NoStats
        val p = pos + 8
        val w = be32(b, p)
        val h = be32(b, p + 4)
        if (w < 1 || h < 1 || w > MaxEdge || h > MaxEdge) return NoStats
        if (w * h > MaxPixels) return NoStats
        width = w.toInt
        height = h.toInt
        depth = b(p + 8) & 0xFF
        if (depth != 8 && depth != 16) return NoStats // 1/2/4: sub-byte, stated out
        colorType = b(p + 9) & 0xFF
        if (colorType != 0 && colorType != 2 && colorType != 3 &&
          colorType != 4 && colorType != 6) return NoStats
        if (colorType == 3 && depth == 16) return NoStats // illegal per spec
        if ((b(p + 10) & 0xFF) != 0) return NoStats // compression method
        if ((b(p + 11) & 0xFF) != 0) return NoStats // filter method
        val il = b(p + 12) & 0xFF
        if (il > 1) return NoStats // 0 = none, 1 = Adam7
        interlaced = il == 1
        sawIhdr = true
      } else if (isIdat) {
        if (idatDone) return NoStats // IDAT run must be consecutive
        idatOff.add(pos + 8)
        idatLen.add(dl)
      } else if (isPlte) {
        // PLTE must precede IDAT, hold 1..256 whole RGB triples, and
        // appear once (RFC 2083 §4.1.2)
        if (palette != null || !idatOff.isEmpty) return NoStats
        if (dl == 0 || dl % 3 != 0 || dl > 768) return NoStats
        palette = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + dl)
        palN = dl / 3
      } else if (isIhdr) {
        return NoStats
      } else {
        if (!idatOff.isEmpty) idatDone = true
        if (isIend) { if (dl != 0) return NoStats; sawIend = true }
      }
      pos += 12 + dl
    }
    if (idatOff.isEmpty) return NoStats
    if (colorType == 3 && palette == null) return NoStats

    // filter unit = channels x bytes-per-sample (RFC 2083 §6.2: the
    // "bpp" the Sub/Paeth offsets use is in BYTES, so 16-bit samples
    // widen it — an 8-bit-minded offset shears every filtered row)
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case _ => 4
    }
    val step = depth / 8 // bytes per sample; 16-bit folds its HIGH byte
    val bpp = channels * step
    // pass geometry: one full-frame pass, or the seven Adam7 sub-images
    // (x0, y0, xStep, yStep per RFC 2083 §2.6) — empty passes emit no
    // scanlines at all
    val passDims: Array[(Int, Int)] =
      if (!interlaced) Array((width, height))
      else {
        val spec = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
          (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        spec.map { case (x0, y0, xs, ys) =>
          (math.max(0, (width - x0 + xs - 1) / xs),
            math.max(0, (height - y0 + ys - 1) / ys))
        }.filter { case (w, h) => w > 0 && h > 0 }
      }
    val inf = infl.get()
    inf.reset()
    var seg = 0
    inf.setInput(b, idatOff.get(0), idatLen.get(0))

    val maxStride = width * bpp
    val cur = new Array[Byte](1 + maxStride)
    val prev = new Array[Byte](1 + maxStride)
    var minL = 255
    var maxL = 0
    var sum = 0L
    try {
      var pi = 0
      while (pi < passDims.length) {
        val stride = passDims(pi)._1 * bpp
        val rows = passDims(pi)._2
        java.util.Arrays.fill(prev, 0.toByte) // row -1 of THIS pass is zero
        var row = 0
        while (row < rows) {
          // fill one scanline (filter byte + stride) from the inflater,
          // feeding IDAT segments as it drains them
          var got = 0
          while (got < 1 + stride) {
            val n = inf.inflate(cur, got, 1 + stride - got)
            if (n == 0) {
              if (inf.finished()) return NoStats // short raster
              if (inf.needsInput()) {
                seg += 1
                if (seg >= idatOff.size()) return NoStats // truncated stream
                inf.setInput(b, idatOff.get(seg), idatLen.get(seg))
              } else if (inf.needsDictionary()) {
                return NoStats
              }
            } else got += n
          }
          // invert the row filter in place (RFC 2083 §6)
          val ft = cur(0) & 0xFF
          if (ft > 4) return NoStats
          var x = 1
          while (x <= stride) {
            val left = if (x > bpp) cur(x - bpp) & 0xFF else 0
            val above = prev(x) & 0xFF
            val ul = if (x > bpp) prev(x - bpp) & 0xFF else 0
            val add = ft match {
              case 0 => 0
              case 1 => left
              case 2 => above
              case 3 => (left + above) >> 1
              case _ => // Paeth predictor
                val p = left + above - ul
                val pa = math.abs(p - left)
                val pb = math.abs(p - above)
                val pc = math.abs(p - ul)
                if (pa <= pb && pa <= pc) left else if (pb <= pc) above else ul
            }
            cur(x) = ((cur(x) & 0xFF) + add).toByte
            x += 1
          }
          // fold Rec.601 luma (position-free: each pixel decodes exactly
          // once across passes)
          var px = 1
          while (px <= stride) {
            // per-channel sample = the HIGH byte at 16-bit (big-endian
            // per spec — the 16->8 fold every thumbnailer applies)
            val luma = colorType match {
              case 0 | 4 => cur(px) & 0xFF // gray; alpha luma-irrelevant
              case 3 =>
                val idx = cur(px) & 0xFF
                if (idx >= palN) return NoStats // index past the palette
                (299 * (palette(idx * 3) & 0xFF) +
                  587 * (palette(idx * 3 + 1) & 0xFF) +
                  114 * (palette(idx * 3 + 2) & 0xFF)) / 1000
              case _ =>
                (299 * (cur(px) & 0xFF) + 587 * (cur(px + step) & 0xFF) +
                  114 * (cur(px + 2 * step) & 0xFF)) / 1000
            }
            sum += luma
            if (luma < minL) minL = luma
            if (luma > maxL) maxL = luma
            px += bpp
          }
          System.arraycopy(cur, 0, prev, 0, 1 + stride)
          row += 1
        }
        pi += 1
      }
      // the stream must end EXACTLY at the raster: any trailing inflated
      // byte is a structural lie — but the zlib trailer itself may span
      // later IDAT chunks, so keep feeding until finished
      val drain = new Array[Byte](1)
      var done = inf.finished()
      while (!done) {
        val n = inf.inflate(drain, 0, 1)
        if (n != 0) return NoStats // raster longer than h*(1+stride)
        if (inf.finished()) done = true
        else if (inf.needsInput()) {
          seg += 1
          if (seg >= idatOff.size()) return NoStats // trailer cut off
          inf.setInput(b, idatOff.get(seg), idatLen.get(seg))
        } else if (inf.needsDictionary()) return NoStats
      }
    } catch {
      case _: java.util.zip.DataFormatException => return NoStats
    }
    minL.toLong | (maxL.toLong << 8) | (sum << 16)
  }

  // ───────────────────────────── synthesis ─────────────────────────────

  // the q59 residue channel maps, byte-for-byte (shared oracle algebra:
  // a channel-order slip cannot cancel between the BMP and PNG families)
  private def chR(seed: Long, x: Int, r: Int): Int =
    (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
  private def chG(seed: Long, x: Int, r: Int): Int =
    (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
  private def chB(seed: Long, x: Int, r: Int): Int =
    (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt

  private val defl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false) // zlib-wrapped, per PNG spec
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String,
                    data: Array[Byte]): Unit = {
    def b32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    b32(data.length)
    val t = tag.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val c = new java.util.zip.CRC32
    c.update(t); c.update(data)
    b32(c.getValue)
  }

  /** Palette size for the synthesis palette class. */
  final val PalN = 32

  private val Adam7 = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
    (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Synthesize a PNG whose pixels come from the q59 residue maps and
    * whose k-th emitted scanline uses filter type `(seed + k) % 5` —
    * every decode path (Sub/Up/Average/Paeth byte algebra included) is
    * exercised on every multi-row image. `mode`: 0 grayscale (sample =
    * G map), 1 truecolor, 2 truecolor+alpha (alpha = `(x + r) % 256`,
    * luma-irrelevant — a stride slip shifts the fold onto alpha bytes
    * and fails), 3 palette ([[PalN]] PLTE entries from the channel maps
    * over the entry index; pixel = index `(seed + 3x + 5r) % PalN`),
    * 4 truecolor ADAM7-INTERLACED (same absolute-coordinate pixels as
    * mode 1 — identical stats — serialized in the seven-pass geometry,
    * each pass filtered as its own sub-image), 5 GRAY+ALPHA (gray = G
    * map — stats identical to mode 0; alpha luma-irrelevant),
    * 6 SIXTEEN-BIT truecolor (high bytes = the mode-1 channel maps,
    * low bytes a nonzero residue pattern — stats must equal mode 1's
    * exactly, so a low-byte or filter-offset slip fails), 7 sixteen-bit
    * gray+alpha (stats = mode 0's).
    */
  def synth(seed: Long, w: Int, h: Int, mode: Int): Array[Byte] = {
    val bpp = mode match {
      case 0 | 3 => 1; case 1 | 4 => 3; case 2 => 4; case 5 => 2
      case 6 => 6; case _ => 4
    }
    def lo(x: Int, r: Int, k: Int): Byte =
      (((seed + x * 7 + r * 3 + k * 29) % 256 + 256) % 256).toByte
    def writePix(x: Int, r: Int, out: Array[Byte], o: Int): Unit = mode match {
      case 0 => out(o) = chG(seed, x, r).toByte
      case 3 => out(o) = (((seed + x * 3 + r * 5) % PalN + PalN) % PalN).toByte
      case 5 =>
        out(o) = chG(seed, x, r).toByte
        out(o + 1) = ((x + r) % 256).toByte
      case 6 =>
        out(o) = chR(seed, x, r).toByte; out(o + 1) = lo(x, r, 0)
        out(o + 2) = chG(seed, x, r).toByte; out(o + 3) = lo(x, r, 1)
        out(o + 4) = chB(seed, x, r).toByte; out(o + 5) = lo(x, r, 2)
      case 7 =>
        out(o) = chG(seed, x, r).toByte; out(o + 1) = lo(x, r, 0)
        out(o + 2) = ((x + r) % 256).toByte; out(o + 3) = lo(x, r, 1)
      case _ =>
        out(o) = chR(seed, x, r).toByte
        out(o + 1) = chG(seed, x, r).toByte
        out(o + 2) = chB(seed, x, r).toByte
        if (mode == 2) out(o + 3) = ((x + r) % 256).toByte
    }
    val passes: Array[(Int, Int, Int, Int)] =
      if (mode == 4) Adam7 else Array((0, 0, 1, 1))
    val raw = new java.io.ByteArrayOutputStream(h * (1 + w * bpp) + 64)
    var k = 0 // global emitted-scanline counter (drives the filter walk)
    passes.foreach { case (x0, y0, xs, ys) =>
      val wp = math.max(0, (w - x0 + xs - 1) / xs)
      val hp = math.max(0, (h - y0 + ys - 1) / ys)
      if (wp > 0 && hp > 0) {
        val stride = wp * bpp
        val prev = new Array[Byte](stride) // pass row -1 is all zero
        val curr = new Array[Byte](stride)
        val filt = new Array[Byte](stride)
        var r = 0
        while (r < hp) {
          var xi = 0
          while (xi < wp) {
            writePix(x0 + xi * xs, y0 + r * ys, curr, xi * bpp)
            xi += 1
          }
          val ft = (((seed + k) % 5 + 5) % 5).toInt
          raw.write(ft)
          var i = 0
          while (i < stride) {
            val left = if (i >= bpp) curr(i - bpp) & 0xFF else 0
            val above = prev(i) & 0xFF
            val ul = if (i >= bpp) prev(i - bpp) & 0xFF else 0
            val sub = ft match {
              case 0 => 0
              case 1 => left
              case 2 => above
              case 3 => (left + above) >> 1
              case _ =>
                val p = left + above - ul
                val pa = math.abs(p - left)
                val pb = math.abs(p - above)
                val pc = math.abs(p - ul)
                if (pa <= pb && pa <= pc) left else if (pb <= pc) above else ul
            }
            filt(i) = ((curr(i) & 0xFF) - sub).toByte
            i += 1
          }
          raw.write(filt, 0, stride)
          System.arraycopy(curr, 0, prev, 0, stride)
          r += 1
          k += 1
        }
      }
    }
    val rawArr = raw.toByteArray
    val d = defl.get()
    d.reset()
    d.setInput(rawArr)
    d.finish()
    val zout = new java.io.ByteArrayOutputStream(rawArr.length / 2 + 16)
    val buf = new Array[Byte](4096)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    val out = new java.io.ByteArrayOutputStream(zout.size() + 64)
    Sig.foreach(out.write)
    val ihdr = new Array[Byte](13)
    def w32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xFF).toByte; ihdr(off + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >> 8) & 0xFF).toByte; ihdr(off + 3) = (v & 0xFF).toByte
    }
    w32(0, w); w32(4, h)
    ihdr(8) = (if (mode == 6 || mode == 7) 16 else 8).toByte
    ihdr(9) = (mode match {
      case 0 => 0; case 1 | 4 | 6 => 2; case 3 => 3; case 5 | 7 => 4
      case _ => 6
    }).toByte
    ihdr(12) = (if (mode == 4) 1 else 0).toByte // interlace method
    chunk(out, "IHDR", ihdr)
    if (mode == 3) {
      val plte = new Array[Byte](PalN * 3)
      var j = 0
      while (j < PalN) {
        plte(j * 3) = chR(seed, j, 0).toByte
        plte(j * 3 + 1) = chG(seed, j, 0).toByte
        plte(j * 3 + 2) = chB(seed, j, 0).toByte
        j += 1
      }
      chunk(out, "PLTE", plte)
    }
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

/** `binary -> long`: packed PNG Rec.601 luma stats
  * (`min | max<<8 | sum<<16`) via [[PngPixelEval.lumaStats]]; NULL on
  * anything outside the stated scope or structurally broken.
  */
case class PngLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PngPixelEval.lumaStats(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pluma")
      s"""
         |long $res = graft.functions.PngPixelEval.lumaStats($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngLuma =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q121's synthesis expression —
  * `shape` packs `w | h<<8 | mode<<16` (mode 0 gray, 1 RGB, 2 RGBA,
  * 3 palette, 4 Adam7-interlaced RGB) so the synthesis stays a
  * two-child codegen'd expression.
  */
case class PngSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    PngPixelEval.synth(seed.asInstanceOf[Long], (sh & 0xFF).toInt,
      ((sh >> 8) & 0xFF).toInt, ((sh >> 16) & 7).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sh) =>
      s"graft.functions.PngPixelEval.synth($s, (int)($sh & 0xFF), " +
        s"(int)(($sh >> 8) & 0xFF), (int)(($sh >> 16) & 7))")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PngSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the PNG pixel kernels. */
object PngPixelOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def pngLuma(bin: Column): Column =
    ColumnBridge.column(PngLuma(ColumnBridge.expression(bin.cast("binary"))))

  def pngSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(PngSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
