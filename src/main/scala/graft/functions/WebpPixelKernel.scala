package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** WebP VP8L (lossless) pixel decode (q135) — the fourth web image
  * format of the pixel family (BMP q59, JPEG q118, PNG q121, GIF q124):
  * packed Rec.601 luma stats (`min | max<<8 | sum<<16`) from a real
  * VP8L walk — RIFF chunk scan, the 5-bit-packed header, DEFLATE-style
  * canonical prefix codes in BOTH spellings (simple 1-2-symbol form and
  * the code-length-coded form with its 19-symbol bootstrap code, RLE
  * 16/17/18, and the kCodeLengthCodeOrder permutation), LZ77 backward
  * references with the (2 + (code&1)) << extra_bits prefix-value
  * coding, the color cache (multiplicative hash 0x1e35a7bd), and two
  * inverse transforms: SUBTRACT_GREEN and COLOR_INDEXING (delta-coded
  * palette decoded as a nested entropy image).
  *
  * Stated scope — each refusal is NULL, never a guess:
  *  - lossy VP8 ("VP8 " chunk) is a different codec: refuses;
  *  - PREDICTOR and COLOR transforms refuse;
  *  - palettes of 16 or fewer colors trigger pixel BUNDLING (several
  *    indices packed per green byte): refuses;
  *  - meta prefix codes (spatial code switching) refuse;
  *  - the 120-entry 2D distance-neighbor map refuses: the map is a
  *    pure encoder-side optimization (every distance has a plain
  *    linear spelling), no independent WebP codec exists in this
  *    environment to pin the table byte-for-byte, and a misremembered
  *    entry would corrupt decodes SILENTLY because the synthesizer
  *    would share it — refusing is the only spelling of the map that
  *    cannot be wrong. Linear distance codes (value > 120) decode.
  *
  * Reference scope: scholar-stream treats media as opaque blobs
  * (infra/glue only) — north-star extension of the multimodal family.
  */
object WebpPixelEval {

  private final val NoStats = java.lang.Long.MIN_VALUE
  private final val MaxPixels = 1L << 22

  // reading order of the code-length code's own lengths (the DEFLATE
  // idea with VP8L's own permutation)
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ─────────────────────────── bit reader ───────────────────────────

  /** LSB-first bit reader over `[start, end)`; prefix-code bits walk
    * most-significant-first within a code (the DEFLATE convention).
    */
  private final class BR(b: Array[Byte], start: Int, end: Int) {
    private var bitPos = start.toLong * 8
    private val bitEnd = end.toLong * 8

    def bit(): Int = {
      if (bitPos >= bitEnd) return -1
      val v = (b((bitPos >> 3).toInt) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      v
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v |= x << i
        i += 1
      }
      v
    }
  }

  // ─────────────────────────── prefix codes ───────────────────────────

  /** A canonical prefix code: `single` >= 0 is the zero-bit one-symbol
    * code; otherwise `map` keys `(len << 16) | code` to the symbol.
    */
  private final class PCode(val map: java.util.HashMap[Integer, Integer],
                            val single: Int)

  /** Canonical codes from a length array (DEFLATE construction), with a
    * completeness check — an over- or under-subscribed code is
    * malformed. Null on refusal.
    */
  private def canonical(lengths: Array[Int]): PCode = {
    var kraft = 0L
    var nUsed = 0
    var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) return null
      if (l > 0) { kraft += 1L << (15 - l); nUsed += 1; lastSym = i }
      i += 1
    }
    if (nUsed == 0) return null
    if (nUsed == 1) return new PCode(null, lastSym) // zero-bit code
    if (kraft != (1L << 15)) return null // must be complete
    val blCount = new Array[Int](16)
    i = 0
    while (i < lengths.length) { blCount(lengths(i)) += 1; i += 1 }
    blCount(0) = 0
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val m = new java.util.HashMap[Integer, Integer]()
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        m.put((len << 16) | nextCode(len), i)
        nextCode(len) += 1
      }
      i += 1
    }
    new PCode(m, -1)
  }

  /** One symbol off the stream, or -1. */
  private def readSym(br: BR, pc: PCode): Int = {
    if (pc.single >= 0) return pc.single
    var code = 0
    var len = 0
    while (len < 15) {
      val b = br.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      len += 1
      val s = pc.map.get((len << 16) | code)
      if (s != null) return s.intValue()
    }
    -1
  }

  /** One prefix code off the stream: simple or code-length-coded form.
    * Null on refusal.
    */
  private def readPrefixCode(br: BR, alphabetSize: Int): PCode = {
    val simple = br.bits(1)
    if (simple < 0) return null
    if (simple == 1) {
      val numM1 = br.bits(1)
      if (numM1 < 0) return null
      val first8 = br.bits(1)
      if (first8 < 0) return null
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (s0 < 0 || s0 >= alphabetSize) return null
      if (numM1 == 0) return new PCode(null, s0)
      val s1 = br.bits(8)
      if (s1 < 0 || s1 >= alphabetSize || s1 == s0) return null
      // two 1-bit codes, assigned in WRITE order: s0 -> 0, s1 -> 1
      val m = new java.util.HashMap[Integer, Integer]()
      m.put((1 << 16) | 0, s0)
      m.put((1 << 16) | 1, s1)
      return new PCode(m, -1)
    }
    // full form: bootstrap the 19-symbol code-length code
    val numCl = br.bits(4)
    if (numCl < 0) return null
    val clLens = new Array[Int](19)
    var i = 0
    while (i < 4 + numCl) {
      if (i >= ClOrder.length) return null
      val v = br.bits(3)
      if (v < 0) return null
      clLens(ClOrder(i)) = v
      i += 1
    }
    val clCode = canonical(clLens)
    if (clCode == null) return null
    // optional symbol budget: beyond it every length is zero
    val useMax = br.bits(1)
    if (useMax < 0) return null
    var maxSymbol = alphabetSize
    if (useMax == 1) {
      val nb = br.bits(3)
      if (nb < 0) return null
      val ms = br.bits(2 + 2 * nb)
      if (ms < 0) return null
      maxSymbol = 2 + ms
      if (maxSymbol > alphabetSize) return null
    }
    val lengths = new Array[Int](alphabetSize)
    var sym = 0
    var prevLen = 8 // RLE 16 repeats the previous NON-ZERO length; 8 seeds
    while (sym < alphabetSize && maxSymbol > 0) {
      maxSymbol -= 1
      val s = readSym(br, clCode)
      if (s < 0) return null
      if (s < 16) {
        lengths(sym) = s
        if (s != 0) prevLen = s
        sym += 1
      } else {
        val (rep, repLen) = s match {
          case 16 =>
            val e = br.bits(2); if (e < 0) return null
            (3 + e, prevLen)
          case 17 =>
            val e = br.bits(3); if (e < 0) return null
            (3 + e, 0)
          case 18 =>
            val e = br.bits(7); if (e < 0) return null
            (11 + e, 0)
          case _ => return null
        }
        if (sym + rep > alphabetSize) return null
        var k = 0
        while (k < rep) { lengths(sym) = repLen; sym += 1; k += 1 }
      }
    }
    canonical(lengths)
  }

  // ─────────────────────────── LZ77 values ───────────────────────────

  /** Prefix-value coding shared by lengths and distances: codes 0..3
    * are the literals 1..4; higher codes carry `(code-2)>>1` extra
    * bits at offset `(2 + (code&1)) << extra_bits`. Lengths draw from
    * 24 codes, distances from 40. -1 on refusal.
    */
  private def lz77Value(code: Int, maxCodes: Int, br: BR): Int = {
    if (code < 0 || code >= maxCodes) return -1
    if (code < 4) return code + 1
    val eb = (code - 2) >> 1
    val offset = (2 + (code & 1)) << eb
    val x = br.bits(eb)
    if (x < 0) return -1
    offset + x + 1
  }

  // ─────────────────────────── image decode ───────────────────────────

  /** One entropy-coded image: cache info, (spatial only) the meta
    * prefix bit, the five prefix codes, then `w*h` pixels of literals /
    * backward references / cache hits. Null on refusal.
    */
  private def decodeEntropyImage(br: BR, w: Int, h: Int,
                                 spatial: Boolean): Array[Int] = {
    var cacheBits = 0
    val hasCache = br.bits(1)
    if (hasCache < 0) return null
    if (hasCache == 1) {
      cacheBits = br.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    if (spatial) {
      val meta = br.bits(1)
      if (meta != 0) return null // meta prefix codes: out of scope
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val green = readPrefixCode(br, 256 + 24 + cacheSize)
    if (green == null) return null
    val red = readPrefixCode(br, 256)
    if (red == null) return null
    val blue = readPrefixCode(br, 256)
    if (blue == null) return null
    val alpha = readPrefixCode(br, 256)
    if (alpha == null) return null
    val dist = readPrefixCode(br, 40)
    if (dist == null) return null
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val out = new Array[Int](w * h)
    var pos = 0
    while (pos < out.length) {
      val s = readSym(br, green)
      if (s < 0) return null
      if (s < 256) {
        val r = readSym(br, red)
        val b2 = readSym(br, blue)
        val a = readSym(br, alpha)
        if (r < 0 || b2 < 0 || a < 0) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | b2
        out(pos) = argb
        if (cache != null)
          cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
        pos += 1
      } else if (s < 280) {
        val len = lz77Value(s - 256, 24, br)
        if (len < 0) return null
        val ds = readSym(br, dist)
        if (ds < 0 || ds >= 40) return null
        val dv = lz77Value(ds, 40, br)
        if (dv < 0) return null
        if (dv <= 120) return null // 2D neighbor map: out of scope
        val d = dv - 120
        if (d > pos || pos + len > out.length) return null
        var k = 0
        while (k < len) {
          val argb = out(pos - d)
          out(pos) = argb
          if (cache != null)
            cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
          pos += 1
          k += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) return null
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  /** Packed luma stats, or the NULL marker. */
  def lumaStats(b: Array[Byte]): Long = {
    if (b == null || b.length < 20) return NoStats
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return NoStats
    var off = 12
    while (off + 8 <= b.length) {
      val size = (b(off + 4) & 0xFFL) | ((b(off + 5) & 0xFFL) << 8) |
        ((b(off + 6) & 0xFFL) << 16) | ((b(off + 7) & 0xFFL) << 24)
      val isVp8l = b(off) == 'V' && b(off + 1) == 'P' &&
        b(off + 2) == '8' && b(off + 3) == 'L'
      val isVp8 = b(off) == 'V' && b(off + 1) == 'P' &&
        b(off + 2) == '8' && b(off + 3) == ' '
      if (isVp8) {
        // lossy VP8: [[Vp8Eval]]'s DC-only key-frame profile decodes
        // in-profile frames; everything else still refuses there
        val end = math.min(off + 8 + size, b.length.toLong).toInt
        return Vp8Eval.lumaStats(b, off + 8, end)
      }
      if (isVp8l) {
        // a truncated file clamps the extent; the bit reader then
        // refuses instead of reading past EOF
        val end = math.min(off + 8 + size, b.length.toLong).toInt
        return decodeVp8l(b, off + 8, end)
      }
      if (size < 0 || size > Int.MaxValue - 16) return NoStats
      off += 8 + size.toInt + (size & 1).toInt // chunks pad to even
    }
    NoStats
  }

  private def decodeVp8l(b: Array[Byte], start: Int, end: Int): Long = {
    if (end - start < 5 || (b(start) & 0xFF) != 0x2F) return NoStats
    val br = new BR(b, start + 1, end)
    val wM1 = br.bits(14)
    val hM1 = br.bits(14)
    if (wM1 < 0 || hM1 < 0) return NoStats
    val w = wM1 + 1
    val h = hM1 + 1
    if (br.bits(1) < 0) return NoStats // alpha hint
    if (br.bits(3) != 0) return NoStats // version must be 0
    if (w.toLong * h > MaxPixels) return NoStats
    // transforms, in read order; inverses apply in REVERSE order
    var subtractGreen = false
    var palette: Array[Int] = null
    var paletteFirst = false // read order of the two supported kinds
    var more = br.bits(1)
    while (more == 1) {
      br.bits(2) match {
        case 2 =>
          if (subtractGreen) return NoStats // each transform at most once
          subtractGreen = true
        case 3 =>
          if (palette != null) return NoStats
          val psM1 = br.bits(8)
          if (psM1 < 0) return NoStats
          val psize = psM1 + 1
          if (psize <= 16) return NoStats // pixel bundling: out of scope
          val deltas = decodeEntropyImage(br, psize, 1, spatial = false)
          if (deltas == null) return NoStats
          // entries are componentwise deltas against the previous one
          palette = new Array[Int](psize)
          var acc = 0
          var j = 0
          while (j < psize) {
            val d = deltas(j)
            acc = (((acc >>> 24) + (d >>> 24)) & 0xFF) << 24 |
              ((((acc >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF) << 16 |
              ((((acc >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8 |
              (((acc & 0xFF) + (d & 0xFF)) & 0xFF)
            palette(j) = acc
            j += 1
          }
          paletteFirst = !subtractGreen
        case _ => return NoStats // predictor / color transform: scope
      }
      more = br.bits(1)
    }
    if (more < 0) return NoStats
    val px = decodeEntropyImage(br, w, h, spatial = true)
    if (px == null) return NoStats
    // inverse transforms, reverse read order
    def applyPalette(): Boolean = {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >> 8) & 0xFF
        if (idx >= palette.length) return false
        px(i) = palette(idx)
        i += 1
      }
      true
    }
    def applySubtractGreen(): Unit = {
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >> 8) & 0xFF
        val r = (((p >> 16) & 0xFF) + g) & 0xFF
        val bl = ((p & 0xFF) + g) & 0xFF
        px(i) = (p & 0xFF00FF00) | (r << 16) | bl
        i += 1
      }
    }
    if (palette != null && subtractGreen) {
      // reverse of read order
      if (paletteFirst) { applySubtractGreen(); if (!applyPalette()) return NoStats }
      else { if (!applyPalette()) return NoStats; applySubtractGreen() }
    } else if (palette != null) {
      if (!applyPalette()) return NoStats
    } else if (subtractGreen) {
      applySubtractGreen()
    }
    var minL = 255
    var maxL = 0
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val l = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
        114 * (p & 0xFF)) / 1000
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      sum += l
      i += 1
    }
    minL.toLong | (maxL.toLong << 8) | (sum << 16)
  }

  // ─────────────────────────── synthesis ───────────────────────────

  // the q59 residue channel maps, byte-for-byte (shared oracle algebra
  // across the BMP/PNG/GIF/WebP pixel families)
  private def chR(seed: Long, x: Int, r: Int): Int =
    (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
  private def chG(seed: Long, x: Int, r: Int): Int =
    (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
  private def chB(seed: Long, x: Int, r: Int): Int =
    (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt

  /** LSB-first bit writer; prefix codes go most-significant-first. */
  private final class BW {
    private val out = new java.io.ByteArrayOutputStream(128)
    private var cur = 0
    private var nBits = 0

    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }

    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBits((code >> i) & 1, 1); i -= 1 }
    }

    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Encoder-side code: symbol -> (code, len), plus the wire spelling. */
  private final class ECode(val codes: java.util.HashMap[Integer, (Int, Int)]) {
    def put(bw: BW, sym: Int): Unit = {
      val c = codes.get(sym)
      if (c ne null) { if (c._2 > 0) bw.putCode(c._1, c._2) }
      else throw new IllegalStateException(s"unregistered symbol $sym")
    }
  }

  /** Write a prefix code for `used` symbols and return the encoder map.
    * 1-2 symbols all <= 255 take the simple form; otherwise the set
    * pads with filler symbols to the next power of two so every used
    * symbol gets the same length L and the code is complete.
    */
  private def writeCode(bw: BW, used0: Seq[Int], alphabetSize: Int): ECode = {
    val used = used0.distinct.sorted
    val m = new java.util.HashMap[Integer, (Int, Int)]()
    if (used.length == 1 && used.head <= 255) {
      bw.putBits(1, 1) // simple
      bw.putBits(0, 1) // one symbol
      bw.putBits(1, 1) // 8-bit spelling
      bw.putBits(used.head, 8)
      m.put(used.head, (0, 0)) // zero-bit code
      return new ECode(m)
    }
    if (used.length == 2 && used(1) <= 255) {
      bw.putBits(1, 1)
      bw.putBits(1, 1) // two symbols
      bw.putBits(1, 1)
      bw.putBits(used.head, 8)
      bw.putBits(used(1), 8)
      m.put(used.head, (0, 1))
      m.put(used(1), (1, 1))
      return new ECode(m)
    }
    // full form: pad to 2^L with the smallest unused symbols
    var l = 1
    while ((1 << l) < used.length) l += 1
    val all = scala.collection.mutable.TreeSet[Int](used: _*)
    var filler = 0
    while (all.size < (1 << l)) {
      if (!all.contains(filler)) all += filler
      filler += 1
    }
    require(all.max < alphabetSize, "filler walked past the alphabet")
    bw.putBits(0, 1) // not simple
    // CL code over {0 -> len 1, L -> len 1}; order positions: 0 sits at
    // index 2 of ClOrder, small lengths follow at 3..7, 6+ at 9..
    val posL = ClOrder.indexOf(l)
    val numCl = math.max(ClOrder.indexOf(0), posL) + 1
    bw.putBits(numCl - 4, 4)
    var i = 0
    while (i < numCl) {
      val s = ClOrder(i)
      bw.putBits(if (s == 0 || s == l) 1 else 0, 3)
      i += 1
    }
    bw.putBits(0, 1) // no max_symbol budget
    // per-symbol lengths through the 1-bit CL code: 0 -> code 0, L -> 1
    var sym = 0
    while (sym < alphabetSize) {
      bw.putBits(if (all.contains(sym)) 1 else 0, 1)
      // (code 0 for CL symbol 0 is the single 0 bit; code 1 is a 1 bit —
      // canonical over two length-1 symbols in symbol order)
      sym += 1
    }
    // canonical codes: all length L, assigned in symbol order
    val sorted = all.toArray
    i = 0
    while (i < sorted.length) {
      m.put(sorted(i), (i, l))
      i += 1
    }
    new ECode(m)
  }

  /** Encode one LZ77 prefix-value (length or linear distance). */
  private def lz77Code(v: Int): (Int, Int, Int) = { // (code, extra, ebits)
    require(v >= 1)
    if (v <= 4) return (v - 1, 0, 0)
    var code = 4
    while (code < 24) {
      val eb = (code - 2) >> 1
      val offset = (2 + (code & 1)) << eb
      if (v > offset && v <= offset + (1 << eb)) return (code, v - offset - 1, eb)
      code += 1
    }
    throw new IllegalStateException(s"value $v out of range")
  }

  /** Synthesize a q135 payload. `params` packs `w | h<<8 | cls<<16`:
    * cls 0 literal pixels under full code-length-coded prefix codes;
    * 1 the same behind SUBTRACT_GREEN; 2 row 0 literal + one LZ77
    * reference copying every later row (overlapping copy, linear
    * distance w); 3 a single-color image through the color cache
    * (one literal, then cache hits); 4 COLOR_INDEXING with a 17+
    * color delta-coded palette; 5 a lossy VP8 shell (sync code +
    * 14-bit dims) whose stats must refuse while its dims still parse.
    */
  def synth(seed: Long, params: Long): Array[Byte] = {
    val w = (params & 0xFF).toInt
    val h = ((params >> 8) & 0xFF).toInt
    val cls = ((params >> 16) & 0xFF).toInt
    require(w >= 1 && h >= 1, "bad shape")
    if (cls == 5) return synthLossy(w, h)
    val bw = new BW
    bw.putBits(w - 1, 14)
    bw.putBits(h - 1, 14)
    bw.putBits(0, 1) // alpha hint
    bw.putBits(0, 3) // version
    cls match {
      case 0 | 1 =>
        val sg = cls == 1
        if (sg) { bw.putBits(1, 1); bw.putBits(2, 2) } // SUBTRACT_GREEN
        bw.putBits(0, 1) // end of transforms
        // stored channels (post-transform on the encoder side)
        def stored(x: Int, r: Int): (Int, Int, Int) = {
          val (cr, cg, cb) = (chR(seed, x, r), chG(seed, x, r), chB(seed, x, r))
          if (sg) (((cr - cg) + 256) & 0xFF, cg, ((cb - cg) + 256) & 0xFF)
          else (cr, cg, cb)
        }
        val pix = for (r <- 0 until h; x <- 0 until w) yield stored(x, r)
        bw.putBits(0, 1) // no color cache
        bw.putBits(0, 1) // no meta prefix
        val gC = writeCode(bw, pix.map(_._2), 280)
        val rC = writeCode(bw, pix.map(_._1), 256)
        val bC = writeCode(bw, pix.map(_._3), 256)
        val aC = writeCode(bw, Seq(255), 256)
        val dC = writeCode(bw, Seq(0), 40)
        pix.foreach { case (r, g, b2) =>
          gC.put(bw, g); rC.put(bw, r); bC.put(bw, b2); aC.put(bw, 255)
        }
        require(dC ne null)
      case 2 =>
        require(h >= 2, "the copy class needs a second row")
        bw.putBits(0, 1) // no transforms
        val row0 = (0 until w).map(x =>
          (chR(seed, x, 0), chG(seed, x, 0), chB(seed, x, 0)))
        val copyLen = (h - 1) * w
        require(copyLen <= 4096, "one length token tops out at 4096")
        val (lenCode, lenExtra, lenEb) = lz77Code(copyLen)
        val (distCode, distExtra, distEb) = lz77Code(w + 120) // linear w
        bw.putBits(0, 1) // no cache
        bw.putBits(0, 1) // no meta
        val gC = writeCode(bw, row0.map(_._2) :+ (256 + lenCode), 280)
        val rC = writeCode(bw, row0.map(_._1), 256)
        val bC = writeCode(bw, row0.map(_._3), 256)
        val aC = writeCode(bw, Seq(255), 256)
        val dC = writeCode(bw, Seq(distCode), 40)
        row0.foreach { case (r, g, b2) =>
          gC.put(bw, g); rC.put(bw, r); bC.put(bw, b2); aC.put(bw, 255)
        }
        gC.put(bw, 256 + lenCode)
        bw.putBits(lenExtra, lenEb)
        dC.put(bw, distCode)
        bw.putBits(distExtra, distEb)
      case 3 =>
        require(w * h >= 2, "the cache class needs a second pixel")
        bw.putBits(0, 1) // no transforms
        val (r0, g0, b0) = (chR(seed, 0, 0), chG(seed, 0, 0), chB(seed, 0, 0))
        val argb = (255 << 24) | (r0 << 16) | (g0 << 8) | b0
        val cacheBits = 4
        val idx = (0x1e35a7bd * argb) >>> (32 - cacheBits)
        bw.putBits(1, 1) // cache present
        bw.putBits(cacheBits, 4)
        bw.putBits(0, 1) // no meta
        val gC = writeCode(bw, Seq(g0, 280 + idx), 280 + (1 << cacheBits))
        val rC = writeCode(bw, Seq(r0), 256)
        val bC = writeCode(bw, Seq(b0), 256)
        val aC = writeCode(bw, Seq(255), 256)
        writeCode(bw, Seq(0), 40) // distance: never used
        gC.put(bw, g0); rC.put(bw, r0); bC.put(bw, b0); aC.put(bw, 255)
        var k = 1
        while (k < w * h) { gC.put(bw, 280 + idx); k += 1 }
      case 4 =>
        val psize = 17 + (seed % 8).toInt // 17..24: no pixel bundling
        bw.putBits(1, 1) // transform present
        bw.putBits(3, 2) // COLOR_INDEXING
        bw.putBits(psize - 1, 8)
        // delta-coded palette as its own entropy image (psize x 1)
        val pal = (0 until psize).map(j =>
          (255, chR(seed, j, 0), chG(seed, j, 0), chB(seed, j, 0)))
        val deltas = pal.zipWithIndex.map { case ((a, r, g, b2), j) =>
          if (j == 0) (a, r, g, b2)
          else {
            val (pa, pr, pg, pb) = pal(j - 1)
            ((a - pa) & 0xFF, (r - pr) & 0xFF, (g - pg) & 0xFF, (b2 - pb) & 0xFF)
          }
        }
        bw.putBits(0, 1) // palette image: no cache
        val pgC = writeCode(bw, deltas.map(_._3), 280)
        val prC = writeCode(bw, deltas.map(_._2), 256)
        val pbC = writeCode(bw, deltas.map(_._4), 256)
        val paC = writeCode(bw, deltas.map(_._1), 256)
        writeCode(bw, Seq(0), 40)
        deltas.foreach { case (a, r, g, b2) =>
          pgC.put(bw, g); prC.put(bw, r); pbC.put(bw, b2); paC.put(bw, a)
        }
        bw.putBits(0, 1) // end of transforms
        // index image: the palette index rides the GREEN channel
        val idxs = for (r <- 0 until h; x <- 0 until w)
          yield (x + r * 3) % psize
        bw.putBits(0, 1) // no cache
        bw.putBits(0, 1) // no meta
        val gC = writeCode(bw, idxs, 280)
        val rC = writeCode(bw, Seq(0), 256)
        val bC = writeCode(bw, Seq(0), 256)
        val aC = writeCode(bw, Seq(255), 256)
        writeCode(bw, Seq(0), 40)
        idxs.foreach { i =>
          gC.put(bw, i); rC.put(bw, 0); bC.put(bw, 0); aC.put(bw, 255)
        }
      case _ => throw new IllegalArgumentException(s"class $cls")
    }
    val body = bw.toBytes
    wrapRiff("VP8L", Array(0x2F.toByte) ++ body)
  }

  /** A lossy-VP8 shell: frame tag, the 9D 01 2A sync code, 14-bit LE
    * dims — enough for the q39 meta walk; the pixel decode must refuse.
    */
  private def synthLossy(w: Int, h: Int): Array[Byte] = {
    val p = new java.io.ByteArrayOutputStream(16)
    p.write(0x00); p.write(0x00); p.write(0x00) // frame tag (keyframe)
    p.write(0x9D); p.write(0x01); p.write(0x2A) // sync code
    p.write(w & 0xFF); p.write((w >> 8) & 0x3F)
    p.write(h & 0xFF); p.write((h >> 8) & 0x3F)
    p.write(0x00); p.write(0x00) // token filler
    wrapRiff("VP8 ", p.toByteArray)
  }

  /** RIFF/WEBP wrap for a lossy "VP8 " frame ([[Vp8Eval.synth]]). */
  private[functions] def wrapLossyRiff(payload: Array[Byte]): Array[Byte] =
    wrapRiff("VP8 ", payload)

  private def wrapRiff(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 24)
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val padded = payload.length + (payload.length & 1)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(4L + 8 + padded)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    fourcc.foreach(c => out.write(c))
    w32(payload.length.toLong)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}

/** `binary -> long`: packed VP8L Rec.601 luma stats via
  * [[WebpPixelEval.lumaStats]]; NULL outside the stated scope.
  */
case class WebpLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_webp_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = WebpPixelEval.lumaStats(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("wluma")
      s"""
         |long $res = graft.functions.WebpPixelEval.lumaStats($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WebpLuma =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q135's synthesis expression —
  * `shape` packs `w | h<<8 | cls<<16` (see [[WebpPixelEval.synth]]).
  */
case class WebpSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_webp_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any =
    WebpPixelEval.synth(seed.asInstanceOf[Long], shape.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.WebpPixelEval.synth($s, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WebpSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the VP8L pixel kernels. */
object WebpPixelOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def webpLuma(bin: Column): Column =
    ColumnBridge.column(WebpLuma(ColumnBridge.expression(bin.cast("binary"))))

  def webpSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(WebpSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
