package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** TIFF PIXEL decode (q197) — the scanned-documents format q129 could
  * only read dims from, and the last common still-image container with
  * no pixel plane (BMP q59, JPEG q118, PNG q121, GIF q124, WebP
  * q135/q196). Implemented from the TIFF 6.0 spec:
  *
  *  - the IFD entry walk under EITHER byte order (II little / MM big),
  *    with inline-vs-offset values (a SHORT's two value bytes sit at
  *    the FRONT of the 4-byte field in both orders — q129's trap, now
  *    drilled at the pixel plane too);
  *  - STRIP layout: StripOffsets/StripByteCounts as inline scalars or
  *    offset arrays of SHORT or LONG, RowsPerStrip defaulting to
  *    "all rows", every strip bounds-checked before a byte is read;
  *  - baseline uncompressed (Compression=1) strips;
  *  - TIFF-variant LZW (Compression=5): MSB-first code packing
  *    (opposite of GIF's LSB-first — THE classic porting bug), 9-bit
  *    initial width, Clear=256/EOI=257, and the spec's EARLY-CHANGE
  *    width bump at table size 2^n - 1 (one code earlier than GIF;
  *    a GIF-style decoder desyncs exactly at code 511);
  *  - horizontal-differencing Predictor 2 (tag 317), applied per row
  *    per sample after decompression;
  *  - 8-bit grayscale in both photometric polarities (0 = WhiteIsZero
  *    inverts, 1 = BlackIsZero) and 8-bit RGB, folded to the shared
  *    packed-luma contract (Rec.601 integer weights).
  *
  *  - PackBits (Compression=32773) strips — the classic Mac/TIFF RLE;
  *  - Deflate strips (Compression=8 and the old Adobe 32946 code),
  *    zlib-wrapped, through a thread-local JDK Inflater (the
  *    GzipKernel discipline).
  *
  *  - TILED layout (§15, tags 322-325): full padded tiles raster-
  *    ordered across then down, predictor per tile row, edge crop;
  *
  *  - PALETTE color (photometric 3, r18): 8-bit indices through the
  *    ColorMap's 16-bit components (high byte = the 8-bit component),
  *    out-of-map indices refuse;
  *  - 16-BIT grayscale (r18): samples follow the FILE byte order
  *    (the deep-sample endian drill), luma is the high byte — both
  *    cross-validated against javax.imageio (ImageIoCrossSpec);
  *  - BILEVEL and 4-BIT grayscale (r18): MSB-first packed rows,
  *    byte-padded per row, values scaled to full range (×255 / ×17),
  *    BitsPerSample DEFAULTING TO 1 per the spec when absent;
  *  - CCITT GROUP 4 / T.6 (compression 4, r18): the full 2D coding
  *    procedure with T.4 run tables in [[CcittEval]], per-strip
  *    reference-line restarts — cross-validated against imageio's
  *    own "CCITT T.6" codec in BOTH directions.
  *
  * Stated scope, refusing rather than guessing: 16-bit RGB/palette,
  * Group 3 / JPEG-in-TIFF compressions, Predictor 2
  * on sub-byte or 16-bit samples (it differences VALUES, not bytes),
  * sub-byte tiles, and planar
  * configuration 2 all return the NULL marker; dims still
  * parse through q129's meta walk (the q39 split). A strip/tile table
  * addressing bytes the buffer never carried refuses whole. Resource
  * guard: 1 Mi pixels.
  *
  * The paired synthesizer writes real TIFFs both-endian with a real
  * early-change LZW compressor; TiffPixelSpec pins a hand-computed
  * LZW code stream (paper arithmetic), the early-change boundary, the
  * predictor, both endians, and flip/truncation fuzz.
  */
object TiffPixelEval {

  private final val NoStats = java.lang.Long.MIN_VALUE
  private final val MaxPixels = 1 << 20

  // ------------------------------------------------------------ reader

  private final class Rd(b: Array[Byte], val le: Boolean) {
    // compare in LONG: `off + n` overflows Int when a crafted IFD value
    // offset sits near Int.MaxValue (e.g. 0x7FFE0000 + a 65536-entry
    // SHORT array = 131072 bytes), which would pass an int check and
    // then throw from copyOfRange — the kernel's contract over hostile
    // bytes is refuse, never throw (r17 advisory, fixed r18)
    def ok(off: Int, n: Int): Boolean =
      off >= 0 && n >= 0 && off.toLong + n <= b.length
    def u16(off: Int): Int =
      if (le) (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
      else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    def u32(off: Int): Long =
      if (le) (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
      else ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  }

  /** One parsed IFD entry's value list (SHORT/LONG only — the types
    * the strip tags use), or null when malformed/out of scope. */
  private def values(b: Array[Byte], r: Rd, entryOff: Int): Array[Long] = {
    val typ = r.u16(entryOff + 2)
    val count = r.u32(entryOff + 4)
    if (count <= 0 || count > 65536) return null
    val n = count.toInt
    val width = typ match {
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case _ => return null
    }
    val total = width * n
    val base =
      if (total <= 4) entryOff + 8 // inline, at the FRONT of the field
      else {
        val off = r.u32(entryOff + 8)
        if (off < 0 || off > Int.MaxValue) return null
        off.toInt
      }
    if (!r.ok(base, total)) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (width == 2) r.u16(base + 2 * i).toLong
      else r.u32(base + 4 * i)
      i += 1
    }
    out
  }

  // -------------------------------------------------------- LZW decode

  /** TIFF-variant LZW: MSB-first packing, early-change width bump.
    * Decodes exactly `want` bytes into a fresh array, or null. */
  private[graft] def lzwDecode(b: Array[Byte], off: Int, len: Int,
                               want: Int): Array[Byte] = {
    if (want < 0 || want > (MaxPixels << 2)) return null
    val out = new Array[Byte](want)
    var outLen = 0
    val Clear = 256
    val Eoi = 257
    // table: prefix chain (prev code, appended byte)
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = 258
    var bits = 9
    var bitPos = 0
    val totalBits = len * 8
    var prev = -1
    def read(): Int = {
      if (bitPos + bits > totalBits) return -1
      var v = 0
      var k = 0
      while (k < bits) {
        val i = bitPos + k
        v = (v << 1) | ((b(off + (i >> 3)) >> (7 - (i & 7))) & 1)
        k += 1
      }
      bitPos += bits
      v
    }
    def emit(code: Int): Int = { // bytes written, -1 on refusal
      // walk the chain backward into a scratch, then reverse-copy
      var n = 0
      var c = code
      while (c >= 258) {
        if (c >= next) return -1
        n += 1
        c = prefix(c)
        if (n > want + 1) return -1 // cycle guard
      }
      n += 1 // the root literal
      if (outLen + n > want) return -1
      var w = outLen + n - 1
      c = code
      while (c >= 258) { out(w) = append(c); w -= 1; c = prefix(c) }
      out(w) = c.toByte
      outLen += n
      n
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return null // ran out before EOI
      else if (code == Eoi) done = true
      else if (code == Clear) {
        next = 258; bits = 9; prev = -1
      } else if (prev == -1) {
        if (code >= 258) return null // first code after clear: literal
        if (emit(code) < 0) return null
        prev = code
      } else {
        if (code > next) return null
        if (code == next) {
          // the KwKwK case: new entry = prev + firstByte(prev)
          if (next >= 4096) return null
          prefix(next) = prev; append(next) = firstByteOf(prev)
          next += 1
          if (emit(code) < 0) return null
        } else {
          if (emit(code) < 0) return null
          if (next >= 4096) return null
          prefix(next) = prev; append(next) = firstByteOf(code)
          next += 1
        }
        prev = code
        // EARLY CHANGE: width bumps when the NEXT code would not fit
        // one code early (table size 2^n - 1), capped at 12 bits
        if (next == (1 << bits) - 1 && bits < 12) bits += 1
      }
    }
    if (outLen != want) return null // strip must fill exactly
    out
  }

  /** TIFF-variant LZW encoder (the synthesis side): hash-chained
    * string table, Clear up front, EOI at the end, early change. */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    var bits = 9
    def put(code: Int): Unit = {
      acc = (acc << bits) | code
      nAcc += bits
      while (nAcc >= 8) {
        o.write(((acc >> (nAcc - 8)) & 0xFF).toInt)
        nAcc -= 8
      }
    }
    // table as a map from (prevCode << 8 | byte) to code
    val table = new java.util.HashMap[Integer, Integer]()
    var next = 258
    put(256) // Clear
    var prev = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xFF
      if (prev == -1) prev = c
      else {
        val key = (prev << 8) | c
        val hit = table.get(key)
        if (hit != null) prev = hit
        else {
          put(prev)
          if (next < 4096) {
            table.put(key, next)
            next += 1
          }
          // width lockstep: the DECODER's add count lags the encoder's
          // by one (it completes an entry only after seeing the next
          // code), so the encoder bumps at 2^n where the decoder bumps
          // at its own 2^n - 1 — verified byte-for-byte against the
          // JDK ImageIO TIFF writer's LZW strips (TiffPixelSpec)
          if (next == (1 << bits) && bits < 12) bits += 1
          if (next >= 4095) {
            // clear before the decoder's lagging count could overflow
            put(256)
            table.clear()
            next = 258
            bits = 9
          }
          prev = c
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    put(257) // EOI
    if (nAcc > 0) o.write(((acc << (8 - nAcc)) & 0xFF).toInt)
    o.toByteArray
  }

  // ------------------------------------------------- PackBits / Deflate

  /** PackBits decode (TIFF 6.0 §9): n in 0..127 copies n+1 literals,
    * n in -1..-127 repeats the next byte 1-n times, -128 is a noop.
    * Must fill exactly `want` bytes. */
  private[graft] def packbitsDecode(b: Array[Byte], off: Int, len: Int,
                                    want: Int): Array[Byte] = {
    if (want < 0 || want > (MaxPixels << 2)) return null
    val out = new Array[Byte](want)
    var o = 0
    var p = off
    val end = off + len
    while (o < want) {
      if (p >= end) return null
      val n = b(p)
      p += 1
      if (n >= 0) {
        val cnt = n + 1
        if (p + cnt > end || o + cnt > want) return null
        System.arraycopy(b, p, out, o, cnt)
        p += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (p >= end || o + cnt > want) return null
        java.util.Arrays.fill(out, o, o + cnt, b(p))
        p += 1; o += cnt
      } // -128: noop
    }
    out
  }

  /** PackBits encode (the synthesis side): literal runs broken at
    * repeats of 3+, repeat runs capped at 128. */
  private[graft] def packbitsEncode(data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 3) {
        o.write(1 - run); o.write(data(i))
        i += run
      } else {
        // literal run up to the next 3+ repeat (or 128 bytes)
        var j = i
        var lit = 0
        var stop = false
        while (!stop && j < data.length && lit < 128) {
          var r = 1
          while (j + r < data.length && r < 3 && data(j + r) == data(j)) r += 1
          if (r >= 3) stop = true
          else { j += 1; lit += 1 }
        }
        o.write(lit - 1)
        o.write(data, i, lit)
        i += lit
      }
    }
    o.toByteArray
  }

  // one Inflater/Deflater per executor thread (the GzipKernel
  // discipline): native handles are expensive, rows are many
  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater() // zlib-wrapped, per the TIFF spec
  }
  private val defl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater()
  }

  private def inflateStrip(b: Array[Byte], off: Int, len: Int,
                           want: Int): Array[Byte] = {
    if (want < 0 || want > (MaxPixels << 2)) return null
    val inf = infl.get()
    inf.reset()
    inf.setInput(b, off, len)
    val out = new Array[Byte](want)
    try {
      var o = 0
      while (o < want && !inf.finished()) {
        val n = inf.inflate(out, o, want - o)
        if (n == 0 && !inf.finished()) return null // truncated/needs-dict
        o += n
      }
      if (o != want) return null
      out
    } catch { case _: java.util.zip.DataFormatException => null }
  }

  private[graft] def deflateStrip(data: Array[Byte]): Array[Byte] = {
    val d = defl.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val o = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) {
      val n = d.deflate(buf)
      o.write(buf, 0, n)
    }
    o.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode to an 8-bit luma plane: (width, height, luma) or null. */
  private[graft] def decodeLuma(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
      else return null
    val r = new Rd(b, le)
    val ifd = r.u32(4)
    if (ifd < 0 || ifd > Int.MaxValue - 2) return null
    val i0 = ifd.toInt
    if (!r.ok(i0, 2)) return null
    val nEntries = r.u16(i0)
    if (nEntries <= 0 || nEntries > 512) return null
    if (!r.ok(i0 + 2, nEntries * 12)) return null
    var width = -1L; var height = -1L
    var compression = 1L
    // BitsPerSample DEFAULTS TO 1 per TIFF 6.0 (imageio's T.6 writer
    // omits the tag for bilevel and relies on it — found r18)
    var photometric = -1L; var spp = 1L; var bps = 1L
    var rowsPerStrip = 0xFFFFFFFFL; var predictor = 1L; var planar = 1L
    var offs: Array[Long] = null
    var counts: Array[Long] = null
    var tileW = -1L; var tileH = -1L
    var tOffs: Array[Long] = null
    var tCounts: Array[Long] = null
    var cmap: Array[Long] = null
    var t4Options = 0L; var t6Options = 0L
    var e = 0
    while (e < nEntries) {
      val eo = i0 + 2 + e * 12
      val tag = r.u16(eo)
      tag match {
        case 256 => val v = values(b, r, eo); if (v == null) return null
          width = v(0)
        case 257 => val v = values(b, r, eo); if (v == null) return null
          height = v(0)
        case 258 => val v = values(b, r, eo); if (v == null) return null
          // all samples the same width; 8- and 16-bit are in scope
          if (v.exists(_ != v(0))) return null
          bps = v(0)
        case 259 => val v = values(b, r, eo); if (v == null) return null
          compression = v(0)
        case 262 => val v = values(b, r, eo); if (v == null) return null
          photometric = v(0)
        case 273 => offs = values(b, r, eo); if (offs == null) return null
        case 277 => val v = values(b, r, eo); if (v == null) return null
          spp = v(0)
        case 278 => val v = values(b, r, eo); if (v == null) return null
          rowsPerStrip = v(0)
        case 279 => counts = values(b, r, eo); if (counts == null) return null
        case 284 => val v = values(b, r, eo); if (v == null) return null
          planar = v(0)
        case 317 => val v = values(b, r, eo); if (v == null) return null
          predictor = v(0)
        case 292 => val v = values(b, r, eo); if (v == null) return null
          t4Options = v(0)
        case 293 => val v = values(b, r, eo); if (v == null) return null
          t6Options = v(0)
        case 320 => cmap = values(b, r, eo); if (cmap == null) return null
        case 322 => val v = values(b, r, eo); if (v == null) return null
          tileW = v(0)
        case 323 => val v = values(b, r, eo); if (v == null) return null
          tileH = v(0)
        case 324 => tOffs = values(b, r, eo); if (tOffs == null) return null
        case 325 => tCounts = values(b, r, eo); if (tCounts == null) return null
        case _ => () // unknown tags skip (they may be any type)
      }
      e += 1
    }
    val tiled = tOffs != null || tCounts != null || tileW > 0 || tileH > 0
    if (width <= 0 || height <= 0 || width * height > MaxPixels) return null
    if (compression != 1L && compression != 2L && compression != 3L &&
      compression != 4L && compression != 5L &&
      compression != 8L &&
      compression != 32773L && compression != 32946L) return null
    // fax option gates: T4Options may set 2D (bit 0) and fill (bit 2,
    // folded into the EOL zero-skip); uncompressed mode (bit 1) and
    // any T6Options bit refuse
    if (compression == 3L && (t4Options & ~5L) != 0L) return null
    if (compression == 4L && t6Options != 0L) return null
    if (planar != 1L) return null
    if (predictor != 1L && predictor != 2L) return null
    if (bps != 1L && bps != 4L && bps != 8L && bps != 16L) return null
    val nc = spp.toInt
    if (photometric == 0L || photometric == 1L) { if (nc != 1) return null }
    else if (photometric == 2L) { if (nc != 3) return null }
    else if (photometric == 3L) {
      // palette color: 8-bit indices into a 3×2^bps SHORT ColorMap
      if (nc != 1 || bps != 8L || cmap == null) return null
      if (cmap.length % 3 != 0 || cmap.length < 3) return null
    } else return null // CMYK/YCbCr: out of scope
    // 16-bit scope: grayscale, no predictor (differencing runs on
    // 16-bit VALUES per spec — the byte-wise pass below would corrupt)
    if (bps == 16L && (nc != 1 || photometric == 3L || predictor == 2L))
      return null
    // sub-byte scope (r18): bilevel and 4-bit grayscale, strip layout,
    // no predictor; CCITT G4 (compression 4) demands bilevel
    if (bps < 8L && (nc != 1 || photometric > 1L || predictor == 2L ||
      tiled)) return null
    if (compression >= 2L && compression <= 4L && bps != 1L) return null
    val bppx = nc * (bps.toInt / 8) // bytes per pixel (0 for sub-byte)
    val w = width.toInt; val h = height.toInt
    if (tiled)
      return decodeTiled(b, r, w, h, nc, bppx, photometric.toInt,
        compression.toInt, predictor.toInt, tileW, tileH, tOffs, tCounts,
        bps.toInt, cmap)
    if (offs == null || counts == null || offs.length != counts.length)
      return null
    if (rowsPerStrip <= 0) return null
    val rps = math.min(rowsPerStrip, height).toInt
    val nStrips = (h + rps - 1) / rps
    if (offs.length != nStrips) return null
    val rowBytes = (w * nc * bps.toInt + 7) / 8 // rows are byte-padded
    val pixels = new Array[Byte](rowBytes * h)
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - s * rps)
      val wantBytes = rows * rowBytes
      val so = offs(s); val sc = counts(s)
      if (so < 0 || sc < 0 || so > Int.MaxValue || sc > Int.MaxValue ||
        !r.ok(so.toInt, sc.toInt)) return null
      val strip: Array[Byte] =
        if (compression == 1L) {
          if (sc.toInt != wantBytes) return null
          java.util.Arrays.copyOfRange(b, so.toInt, so.toInt + sc.toInt)
        } else if (compression == 4L) {
          val d = CcittEval.g4Decode(b, so.toInt, sc.toInt, w, rows,
            rowBytes)
          if (d == null) return null
          d
        } else if (compression == 2L) {
          val d = CcittEval.mhDecode(b, so.toInt, sc.toInt, w, rows,
            rowBytes)
          if (d == null) return null
          d
        } else if (compression == 3L) {
          val d = CcittEval.t4Decode(b, so.toInt, sc.toInt, w, rows,
            rowBytes, (t4Options & 1L) != 0L)
          if (d == null) return null
          d
        } else if (compression == 5L) {
          val d = lzwDecode(b, so.toInt, sc.toInt, wantBytes)
          if (d == null) return null
          d
        } else if (compression == 32773L) {
          val d = packbitsDecode(b, so.toInt, sc.toInt, wantBytes)
          if (d == null) return null
          d
        } else { // 8 / 32946: zlib-wrapped deflate
          val d = inflateStrip(b, so.toInt, sc.toInt, wantBytes)
          if (d == null) return null
          d
        }
      if (predictor == 2L) {
        // horizontal differencing: accumulate left-to-right per sample
        var row = 0
        while (row < rows) {
          val base = row * rowBytes
          var x = nc
          while (x < rowBytes) {
            strip(base + x) = (strip(base + x) + strip(base + x - nc)).toByte
            x += 1
          }
          row += 1
        }
      }
      System.arraycopy(strip, 0, pixels, s * rps * rowBytes, wantBytes)
      s += 1
    }
    finishLuma(w, h, nc, photometric.toInt, pixels, bps.toInt, le, cmap)
  }

  /** One compressed region (strip or tile) to exactly `want` bytes. */
  private def decodeRegion(b: Array[Byte], r: Rd, compression: Int,
                           so: Long, sc: Long, want: Int): Array[Byte] = {
    if (so < 0 || sc < 0 || so > Int.MaxValue || sc > Int.MaxValue ||
      !r.ok(so.toInt, sc.toInt)) return null
    compression match {
      case 1 =>
        if (sc.toInt != want) null
        else java.util.Arrays.copyOfRange(b, so.toInt, so.toInt + sc.toInt)
      case 5 => lzwDecode(b, so.toInt, sc.toInt, want)
      case 32773 => packbitsDecode(b, so.toInt, sc.toInt, want)
      case _ => inflateStrip(b, so.toInt, sc.toInt, want)
    }
  }

  /** TILED layout (TIFF 6.0 §15, tags 322-325): tiles are FULL
    * tileW×tileH regions even at the right/bottom edges (padded on the
    * wire), raster-ordered across then down; the predictor runs per
    * tile row; placement crops the padding. */
  private def decodeTiled(b: Array[Byte], r: Rd, w: Int, h: Int, nc: Int,
                          bppx: Int,
                          photometric: Int, compression: Int, predictor: Int,
                          tileW: Long, tileH: Long, tOffs: Array[Long],
                          tCounts: Array[Long], bps: Int,
                          cmap: Array[Long]): (Int, Int, Array[Int]) = {
    if (tileW <= 0 || tileH <= 0 || tileW % 16 != 0 || tileH % 16 != 0 ||
      tileW > 65536 || tileH > 65536) return null
    if (tOffs == null || tCounts == null || tOffs.length != tCounts.length)
      return null
    val tw = tileW.toInt; val th = tileH.toInt
    val across = (w + tw - 1) / tw
    val down = (h + th - 1) / th
    if (tOffs.length != across * down) return null
    val tileRowBytes = tw * bppx
    if (tileRowBytes.toLong * th > (MaxPixels.toLong << 2)) return null
    val rowBytes = w * bppx
    val pixels = new Array[Byte](rowBytes * h)
    var t = 0
    while (t < tOffs.length) {
      val tile = decodeRegion(b, r, compression, tOffs(t), tCounts(t),
        tileRowBytes * th)
      if (tile == null) return null
      if (predictor == 2) {
        var row = 0
        while (row < th) {
          val base = row * tileRowBytes
          var x = nc
          while (x < tileRowBytes) {
            tile(base + x) = (tile(base + x) + tile(base + x - nc)).toByte
            x += 1
          }
          row += 1
        }
      }
      val ty = (t / across) * th
      val tx = (t % across) * tw
      val copyRows = math.min(th, h - ty)
      val copyBytes = math.min(tileRowBytes, (w - tx) * bppx)
      var row = 0
      while (row < copyRows) {
        System.arraycopy(tile, row * tileRowBytes,
          pixels, (ty + row) * rowBytes + tx * bppx, copyBytes)
        row += 1
      }
      t += 1
    }
    finishLuma(w, h, nc, photometric, pixels, bps, r.le, cmap)
  }

  /** Fold the assembled sample plane to luma (shared strip/tile tail):
    * 8-bit gray in either polarity, 8-bit RGB (Rec.601 integer fold),
    * palette indices through the 16-bit-component ColorMap (high byte
    * is the 8-bit component, then the same Rec.601 fold), and 16-bit
    * gray — samples follow the FILE byte order, luma is the high byte. */
  private def finishLuma(w: Int, h: Int, nc: Int, photometric: Int,
                         pixels: Array[Byte], bps: Int, le: Boolean,
                         cmap: Array[Long]): (Int, Int, Array[Int]) = {
    val luma = new Array[Int](w * h)
    val cmapN = if (cmap == null) 0 else cmap.length / 3
    if (bps < 8) {
      // bilevel / 4-bit gray: MSB-first packed, rows byte-padded;
      // values scale to full range (1-bit ×255, 4-bit ×17)
      val rowBytes = (w * bps + 7) / 8
      val scale = if (bps == 1) 255 else 17
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bitPos = x * bps
          val by = pixels(y * rowBytes + (bitPos >> 3)) & 0xFF
          val v =
            if (bps == 1) (by >> (7 - (bitPos & 7))) & 1
            else (by >> (4 - (bitPos & 7))) & 0xF
          val v8 = v * scale
          luma(y * w + x) = if (photometric == 0) 255 - v8 else v8
          x += 1
        }
        y += 1
      }
      return (w, h, luma)
    }
    var i = 0
    while (i < w * h) {
      luma(i) =
        if (photometric == 3) {
          val idx = pixels(i) & 0xFF
          if (idx >= cmapN) return null // index past the ColorMap: refuse
          (299 * (cmap(idx).toInt >> 8) +
            587 * (cmap(cmapN + idx).toInt >> 8) +
            114 * (cmap(2 * cmapN + idx).toInt >> 8)) / 1000
        } else if (bps == 16) {
          val p = i * 2
          val v =
            if (le) (pixels(p) & 0xFF) | ((pixels(p + 1) & 0xFF) << 8)
            else ((pixels(p) & 0xFF) << 8) | (pixels(p + 1) & 0xFF)
          // (65535 - v) >> 8 == 255 - (v >> 8), so the WhiteIsZero
          // inversion commutes with the high-byte fold
          if (photometric == 0) 255 - (v >> 8) else v >> 8
        } else if (nc == 1) {
          val v = pixels(i) & 0xFF
          if (photometric == 0) 255 - v else v
        } else {
          val p = i * 3
          (299 * (pixels(p) & 0xFF) + 587 * (pixels(p + 1) & 0xFF) +
            114 * (pixels(p + 2) & 0xFF)) / 1000
        }
      i += 1
    }
    (w, h, luma)
  }

  /** Packed luma stats (min | max<<8 | sum<<16), or the NULL marker. */
  def lumaStats(b: Array[Byte]): Long = {
    val r = decodeLuma(b)
    if (r == null) return NoStats
    val px = r._3
    var minL = 255; var maxL = 0; var sum = 0L
    var i = 0
    while (i < px.length) {
      val l = px(i)
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      sum += l
      i += 1
    }
    minL.toLong | (maxL.toLong << 8) | (sum << 16)
  }

  // -------------------------------------------------------- synthesis

  // the shared q59/q121/q135 residue channel maps — the oracle algebra
  // the whole pixel family replays
  private def chR(seed: Long, x: Int, r: Int): Int =
    (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
  private def chG(seed: Long, x: Int, r: Int): Int =
    (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
  private def chB(seed: Long, x: Int, r: Int): Int =
    (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt

  /** Write a TIFF: header, pixel strips, then one IFD (offsets
    * forward-computed). `le` picks the byte order. `ifdFirst` flips the
    * layout (header, IFD, then strips) so the truncation class can cut
    * strip bytes while the IFD — and therefore the dims — stays whole
    * (the q39 split the class doc promises; r17 advisory, fixed r18). */
  private[graft] def writeTiff(le: Boolean, w: Int, h: Int, nc: Int,
                               photometric: Int, compression: Int,
                               predictor: Int, rps: Int,
                               pixels: Array[Byte],
                               tile16: Boolean = false,
                               ifdFirst: Boolean = false,
                               bps: Int = 8,
                               cmap: Array[Long] = null): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit =
      if (le) { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
      else { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }
    def p32(v: Long): Unit =
      if (le) { o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
        o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
      } else { o.write(((v >> 24) & 0xFF).toInt)
        o.write(((v >> 16) & 0xFF).toInt)
        o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt) }
    if (le) { o.write('I'); o.write('I'); o.write(42); o.write(0) }
    else { o.write('M'); o.write('M'); o.write(0); o.write(42) }
    // regions (strips, or full padded 16x16 tiles) first, IFD after
    val bppx = nc * (bps / 8) // whole bytes; sub-byte uses rowBytes
    val rowBytes = (w * nc * bps + 7) / 8
    val nStrips = (h + rps - 1) / rps
    def pack(raw: Array[Byte], rows: Int, rb: Int): Array[Byte] = {
      if (predictor == 2) {
        var row = 0
        while (row < rows) {
          val base = row * rb
          var x = rb - 1
          while (x >= nc) {
            raw(base + x) = (raw(base + x) - raw(base + x - nc)).toByte
            x -= 1
          }
          row += 1
        }
      }
      compression match {
        case 2 => CcittEval.mhEncode(raw, w, rows, rb)
        case 3 => CcittEval.t4Encode(raw, w, rows, rb)
        case 4 => CcittEval.g4Encode(raw, w, rows, rb)
        case 5 => lzwEncode(raw)
        case 32773 => packbitsEncode(raw)
        case 8 => deflateStrip(raw)
        case _ => raw
      }
    }
    val across = (w + 15) / 16
    val down = (h + 15) / 16
    val strips =
      if (tile16) (0 until across * down).map { t =>
        val tx = (t % across) * 16
        val ty = (t / across) * 16
        val raw = new Array[Byte](16 * 16 * bppx) // zero-padded at edges
        var row = 0
        while (row < math.min(16, h - ty)) {
          val n = math.min(16, w - tx) * bppx
          System.arraycopy(pixels, (ty + row) * rowBytes + tx * bppx,
            raw, row * 16 * bppx, n)
          row += 1
        }
        pack(raw, 16, 16 * bppx)
      }
      else (0 until nStrips).map { s =>
        val rows = math.min(rps, h - s * rps)
        val raw = java.util.Arrays.copyOfRange(pixels,
          s * rps * rowBytes, s * rps * rowBytes + rows * rowBytes)
        pack(raw, rows, rowBytes)
      }
    // entry list: tags ascending; arrays past 4 bytes park after the IFD
    case class Entry(tag: Int, typ: Int, count: Int, inline: Long,
                     arr: Array[Long] = null)
    def mkEntries(stripOffs: Seq[Long]): Seq[Entry] = {
      val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
      entries += Entry(256, 3, 1, w)
      entries += Entry(257, 3, 1, h)
      if (nc == 1) entries += Entry(258, 3, 1, bps)
      else entries += Entry(258, 3, 3, 0,
        Array(bps.toLong, bps.toLong, bps.toLong))
      entries += Entry(259, 3, 1, compression)
      entries += Entry(262, 3, 1, photometric)
      if (cmap != null) entries += Entry(320, 3, cmap.length, 0, cmap)
      if (tile16) {
        entries += Entry(322, 3, 1, 16)
        entries += Entry(323, 3, 1, 16)
        if (strips.length == 1) entries += Entry(324, 4, 1, stripOffs(0))
        else entries += Entry(324, 4, strips.length, 0, stripOffs.init.toArray)
        if (strips.length == 1) entries += Entry(325, 4, 1, strips(0).length)
        else entries += Entry(325, 4, strips.length, 0,
          strips.map(_.length.toLong).toArray)
        entries += Entry(277, 3, 1, nc)
      } else {
        if (nStrips == 1) entries += Entry(273, 4, 1, stripOffs(0))
        else entries += Entry(273, 4, nStrips, 0,
          stripOffs.init.toArray)
        entries += Entry(277, 3, 1, nc)
        entries += Entry(278, 3, 1, rps)
        if (nStrips == 1) entries += Entry(279, 4, 1, strips(0).length)
        else entries += Entry(279, 4, nStrips, 0,
          strips.map(_.length.toLong).toArray)
      }
      if (predictor == 2) entries += Entry(317, 3, 1, 2)
      entries.sortBy(_.tag).toSeq
    }
    def widthOf(typ: Int): Int = if (typ == 3) 2 else 4
    // entry COUNT and parked-array SIZE never depend on the offset
    // values, so a probe build with dummy offsets sizes the IFD
    val probe = mkEntries(strips.map(_ => 0L))
    val n = probe.length
    val parkedBytes =
      probe.collect { case en if en.arr != null &&
        widthOf(en.typ) * en.count > 4 => widthOf(en.typ) * en.count }.sum
    val ifdSize = 2 + n * 12 + 4 + parkedBytes
    val stripsTotal = strips.map(_.length.toLong).sum
    val (ifdOff, dataStart) =
      if (ifdFirst) (8L, 8L + ifdSize)
      else {
        val e = 8L + stripsTotal
        (e + (e & 1), 8L) // word-align the IFD after the strips
      }
    val stripOffs = strips.scanLeft(dataStart)(_ + _.length)
    val sorted = mkEntries(stripOffs)
    // header IFD pointer
    p32(ifdOff)
    if (!ifdFirst) {
      strips.foreach(s => o.write(s, 0, s.length))
      if (((8L + stripsTotal) & 1) == 1) o.write(0)
    }
    var tail = ifdOff + 2 + n * 12 + 4 // array park position
    p16(n)
    val parked = scala.collection.mutable.ArrayBuffer.empty[(Long, Entry)]
    sorted.foreach { en =>
      p16(en.tag); p16(en.typ); p32(en.count)
      val width = widthOf(en.typ)
      if (en.arr == null) {
        // inline scalar: SHORTs occupy the FRONT two bytes of the field
        if (en.typ == 3) { p16(en.inline.toInt); p16(0) }
        else p32(en.inline)
      } else if (width * en.count <= 4) {
        en.arr.foreach(v => p16(v.toInt))
        var pad = 4 - width * en.count
        while (pad > 0) { o.write(0); pad -= 1 }
      } else {
        parked += ((tail, en))
        p32(tail)
        tail += width * en.count
      }
    }
    p32(0) // next-IFD pointer: none
    parked.foreach { case (_, en) =>
      en.arr.foreach(v => if (en.typ == 3) p16(v.toInt) else p32(v))
    }
    if (ifdFirst) strips.foreach(s => o.write(s, 0, s.length))
    o.toByteArray
  }

  /** Synthesize a q197 residue class (%15) on the shared channel maps:
    * 0 → LE gray uncompressed, MULTI-strip (rows-per-strip 2);
    * 1 → BE gray uncompressed, WhiteIsZero (the polarity inversion);
    * 2 → LE gray LZW;
    * 3 → BE RGB LZW + horizontal-differencing Predictor 2;
    * 5 → LE gray PACKBITS, multi-strip;
    * 6 → LE RGB DEFLATE + Predictor 2;
    * 7 → LE gray LZW TILED (16×16 tiles over a multi-tile frame whose
    *     dims are NOT tile multiples — edge padding crops);
    * 8 → LE PALETTE (photometric 3) PackBits multi-strip: 8-bit
    *     indices through a 256-entry 16-bit-component ColorMap whose
    *     high bytes ride the family RGB channel maps (r18);
    * 9 → BE 16-BIT gray LZW multi-strip: the high byte is the gray
    *     map, the low byte the blue map — samples follow the FILE
    *     byte order, the classic deep-sample endian drill (r18);
    * 10 → LE 1-BIT uncompressed multi-strip, WhiteIsZero (the fax
    *     polarity): ink where the gray map reads ≥ 128 (r18);
    * 11 → the same bilevel plane under CCITT GROUP 4 (compression 4)
    *     with rows-per-strip 2 — every strip restarts the T.6
    *     reference line (r18, imageio-cross-validated);
    * 12 → LE 4-BIT gray LZW multi-strip: nibbles MSB-first, value =
    *     gray map >> 4, luma ×17 (r18);
    * 13 → the bilevel plane under CCITT RLE (compression 2): Modified
    *     Huffman 1D rows, each BYTE-ALIGNED (r18);
    * 14 → the same under GROUP 3 (compression 3) in the pure-1D
    *     spelling: an EOL before every row, T4Options omitted (r18);
    * 4 → class 0 truncated mid-strip (dims parse, stats refuse).
    * `shape` packs `w | h<<8 | cls<<16`; class 7 sizes itself. */
  def synth(seed: Long, shape: Long): Array[Byte] = {
    val w = math.max(1, (shape & 0xFF).toInt)
    val h = math.max(1, ((shape >> 8) & 0xFF).toInt)
    val cls = ((shape >> 16) & 0xFF).toInt
    def gray(): Array[Byte] = {
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < w * h) {
        px(i) = chG(seed, i % w, i / w).toByte; i += 1
      }
      px
    }
    def rgb(): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val x = i % w; val r = i / w
        px(3 * i) = chR(seed, x, r).toByte
        px(3 * i + 1) = chG(seed, x, r).toByte
        px(3 * i + 2) = chB(seed, x, r).toByte
        i += 1
      }
      px
    }
    def bilevel(): Array[Byte] = {
      val rowBytes = (w + 7) / 8
      val px = new Array[Byte](rowBytes * h)
      var rr = 0
      while (rr < h) {
        var x = 0
        while (x < w) {
          if (chG(seed, x, rr) >= 128) // ink
            px(rr * rowBytes + (x >> 3)) =
              (px(rr * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
          x += 1
        }
        rr += 1
      }
      px
    }
    cls % 15 match {
      case 0 => writeTiff(le = true, w, h, 1, 1, 1, 1, rps = 2, gray())
      case 5 => writeTiff(le = true, w, h, 1, 1, 32773, 1, rps = 2, gray())
      case 8 =>
        // palette: indices are the gray map; the ColorMap's high bytes
        // are the family RGB maps sampled at (index, row 0), so luma is
        // the Rec.601 fold of a nested channel-map application
        // components as c*257 (= c<<8 | c): exact under BOTH our
        // high-byte fold and imageio's rounding 16->8 mapping
        val cm = new Array[Long](768)
        var ci = 0
        while (ci < 256) {
          cm(ci) = chR(seed, ci, 0).toLong * 257
          cm(256 + ci) = chG(seed, ci, 0).toLong * 257
          cm(512 + ci) = chB(seed, ci, 0).toLong * 257
          ci += 1
        }
        writeTiff(le = true, w, h, 1, 3, 32773, 1, rps = 2, gray(),
          cmap = cm)
      case 9 =>
        // 16-bit gray, BIG-endian file: sample = gray<<8 | blue, so a
        // decoder that reads samples LE (or folds the wrong byte)
        // reproduces the blue map instead and misses the oracle
        val px = new Array[Byte](w * h * 2)
        var i = 0
        while (i < w * h) {
          px(2 * i) = chG(seed, i % w, i / w).toByte
          px(2 * i + 1) = chB(seed, i % w, i / w).toByte
          i += 1
        }
        writeTiff(le = false, w, h, 1, 1, 5, 1, rps = 2, px, bps = 16)
      case 6 => writeTiff(le = true, w, h, 3, 2, 8, 2, rps = h, rgb())
      case 7 =>
        // multi-tile with crop: 21 or 37 px across, 18 down
        val tw7 = ((seed % 2) + 1).toInt * 16 + 5
        val th7 = 18
        val px = new Array[Byte](tw7 * th7)
        var i = 0
        while (i < px.length) {
          px(i) = chG(seed, i % tw7, i / tw7).toByte; i += 1
        }
        writeTiff(le = true, tw7, th7, 1, 1, 5, 1, rps = th7, px,
          tile16 = true)
      case 1 =>
        // WhiteIsZero: stored = 255 - luma, the decoder inverts back
        val px = gray()
        var i = 0
        while (i < px.length) { px(i) = (255 - (px(i) & 0xFF)).toByte; i += 1 }
        writeTiff(le = false, w, h, 1, 0, 1, 1, rps = h, px)
      case 2 => writeTiff(le = true, w, h, 1, 1, 5, 1, rps = h, gray())
      case 3 => writeTiff(le = false, w, h, 3, 2, 5, 2, rps = h, rgb())
      case 10 =>
        writeTiff(le = true, w, h, 1, 0, 1, 1, rps = 2, bilevel(), bps = 1)
      case 11 =>
        writeTiff(le = true, w, h, 1, 0, 4, 1, rps = 2, bilevel(), bps = 1)
      case 13 =>
        writeTiff(le = true, w, h, 1, 0, 2, 1, rps = 2, bilevel(), bps = 1)
      case 14 =>
        writeTiff(le = true, w, h, 1, 0, 3, 1, rps = 2, bilevel(), bps = 1)
      case 12 =>
        val rowBytes = (w * 4 + 7) / 8
        val px = new Array[Byte](rowBytes * h)
        var i = 0
        while (i < w * h) {
          val x = i % w; val rr = i / w
          val v = chG(seed, x, rr) >> 4
          val pos = x * 4
          px(rr * rowBytes + (pos >> 3)) =
            (px(rr * rowBytes + (pos >> 3)) |
              (v << (4 - (pos & 7)))).toByte
          i += 1
        }
        writeTiff(le = true, w, h, 1, 1, 5, 1, rps = 2, px, bps = 4)
      case _ =>
        // IFD-first layout: the strips are the file TAIL, so the cut
        // removes pixel bytes while the whole IFD — dims included —
        // stays parseable (the class doc's "dims parse, stats refuse";
        // the strips-last spelling cut the IFD instead, r17 advisory)
        val whole = writeTiff(le = true, w, h, 1, 1, 1, 1, rps = 2, gray(),
          ifdFirst = true)
        val stripsStart = whole.length - w * h // uncompressed gray strips
        java.util.Arrays.copyOf(whole,
          stripsStart + math.max(0, w * h - w - 6))
    }
  }
}

/** `binary -> long`: packed TIFF luma stats via
  * [[TiffPixelEval.lumaStats]]; NULL outside the stated scope. */
case class TiffLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TiffPixelEval.lumaStats(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tluma")
      s"""
         |long $res = graft.functions.TiffPixelEval.lumaStats($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TiffLuma =
    copy(child = newChild)
}

/** `(seed, shape) -> binary`: a synthesized TIFF per the q197 residue
  * classes; `shape` packs `w | h<<8 | cls<<16`. */
case class TiffPixelSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_pixel_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any =
    TiffPixelEval.synth(seed.asInstanceOf[Long], shape.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.TiffPixelEval.synth($s, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TiffPixelSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the TIFF pixel kernels. */
object TiffPixelOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def tiffLuma(bin: Column): Column =
    ColumnBridge.column(TiffLuma(ColumnBridge.expression(bin.cast("binary"))))

  def tiffPixelSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(TiffPixelSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
