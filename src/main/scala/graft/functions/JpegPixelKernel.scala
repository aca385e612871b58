package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Baseline-JPEG PIXEL decode — the compressed-codec rung q57/q59 left
  * as an honest cap (their pixel contracts run on uncompressed BMP/Y4M;
  * real crawls ship JPEG). A pure-JVM ITU T.81 baseline decoder:
  * marker-segment walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman decode
  * of the entropy-coded scan (byte-unstuffing FF00, restart markers
  * resetting DC predictors AND bit alignment), DC-differential +
  * run-length AC coefficient decode per block, dequantization, double
  * IDCT, level shift, clamp — folded to the same packed luma stats
  * contract as [[BmpLuma]]: `min | max<<8 | sum<<16` over the LUMA
  * component trimmed to the frame's declared width × height.
  *
  * Scope is stated, not guessed: baseline sequential (SOF0) AND
  * progressive (SOF2, Huffman — T.81 Annex G: multi-scan spectral
  * selection + successive approximation, accumulated in a full-image
  * luma coefficient grid and IDCT'd once at EOI; chroma-only scans are
  * structurally skipped to the next marker), 8-bit precision, with luma
  * sampling factors H,V ∈ {1,2} and 1×1 chroma — that covers grayscale,
  * 4:4:4, 4:2:2 (2×1), 4:4:0 (1×2), and 4:2:0 (2×2, the dominant
  * web-JPEG layout): the Y stats fold component 0's H·V blocks per MCU
  * at their true pixel origins; chroma blocks are entropy-decoded (or
  * marker-skipped, progressive) to keep the stream aligned and then
  * dropped. Subsampled LUMA (a chroma factor exceeding luma's),
  * single-component frames declaring factors > 1×1 (T.81 §A.2 makes
  * such scans non-interleaved, a different MCU geometry), lossless/
  * extended frames, arithmetic coding, and 16-bit quant tables return
  * NULL — stop-don't-guess, the q82/q95 stance. Any structural lie
  * (truncated entropy data, a Huffman code past the table, coefficient
  * index past the band, scans out of successive-approximation order,
  * missing tables) also refuses with NULL, and the progressive grid is
  * capped at 4 Mpx as a resource guard.
  */
object JpegPixelEval {

  /** Canonical Huffman table in T.81 DECODE form. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with FF00 unstuffing; a bare FF marker
    * (incl. RSTn) stops the segment — the caller decides what it means.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    var bitBuf = 0
    var bitCnt = 0
    var hitMarker = false

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed data byte
          else { hitMarker = true; pos -= 1; return -1 }
          v = 0xFF
        }
        bitBuf = v
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    /** Drop to the next byte boundary (before a restart marker). */
    def align(): Unit = bitCnt = 0
  }

  private def decodeHuff(r: BitReader, h: Huff): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val bit = r.nextBit()
      if (bit < 0) return Int.MinValue
      code = (code << 1) | bit
      if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
        return h.huffVal(h.valPtr(l) + code - h.minCode(l))
      l += 1
    }
    Int.MinValue
  }

  /** Read `s` amplitude bits and EXTEND per T.81 F.12. */
  private def receiveExtend(r: BitReader, s: Int): Int = {
    var v = 0
    var i = 0
    while (i < s) {
      val bit = r.nextBit()
      if (bit < 0) return Int.MinValue
      v = (v << 1) | bit
      i += 1
    }
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
  }

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val InvSqrt2 = 1.0 / math.sqrt(2.0)
  // cos((2x+1)·u·π/16) lookup
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** 8×8 IDCT + level shift + clamp into `out` (row-major 0..255). */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          val cy = Cos(y * 8 + v) * (if (v == 0) InvSqrt2 else 1.0)
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0)
              s += c * Cos(x * 8 + u) * (if (u == 0) InvSqrt2 else 1.0) * cy
            u += 1
          }
          v += 1
        }
        val p = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private final val NoStats = java.lang.Long.MIN_VALUE

  /** Packed luma stats of a baseline JPEG, or NULL-marker on refusal. */
  /** Decoded luma plane (row-major `width`×`height` samples) captured
    * alongside a stats decode — the EXIF normalization path needs the
    * actual pixels to re-sample through an orientation transform.
    */
  final class LumaPlane {
    var w: Int = 0
    var h: Int = 0
    var px: Array[Int] = null
  }

  def lumaStats(b: Array[Byte]): Long = decode(b, null)

  /** Full decode that also RETAINS the luma plane, or null on refusal.
    * The plane materializes (4 B/px), so this path shares the
    * progressive grid's resource guard even for baseline streams,
    * where stats alone would stream MCU by MCU: images past
    * [[MaxProgressivePixels]] refuse rather than allocate.
    */
  def lumaPlane(b: Array[Byte]): LumaPlane = {
    val box = new LumaPlane
    if (decode(b, box) == NoStats) null else box
  }

  private def decode(b: Array[Byte], box: LumaPlane): Long = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return NoStats
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var width = 0
    var height = 0
    var nComp = 0
    var lumaH = 1
    var lumaV = 1
    var progressive = false
    val compId = new Array[Int](4)
    val compQ = new Array[Int](4)
    val compDc = new Array[Int](4)
    val compAc = new Array[Int](4)
    var restartInterval = 0
    var i = 2
    val len = b.length
    while (i + 3 < len) {
      if ((b(i) & 0xFF) != 0xFF) return NoStats
      while (i + 1 < len && (b(i + 1) & 0xFF) == 0xFF) i += 1
      if (i + 1 >= len) return NoStats
      val m = b(i + 1) & 0xFF
      if (m == 0xD9) return NoStats // EOI before any scan
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
      else {
        if (i + 3 >= len) return NoStats
        val segLen = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (segLen < 2 || i + 2 + segLen > len) return NoStats
        val p0 = i + 4
        m match {
          case 0xDB => // DQT: one or more tables
            var p = p0
            val end = i + 2 + segLen
            while (p < end) {
              val pq = (b(p) & 0xF0) >> 4
              val tq = b(p) & 0x0F
              if (pq != 0 || tq > 3 || p + 65 > end) return NoStats
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(ZigZag(k)) = b(p + 1 + k) & 0xFF; k += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = p0
            val end = i + 2 + segLen
            while (p < end) {
              val tc = (b(p) & 0xF0) >> 4
              val th = b(p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > end) return NoStats
              val bits = new Array[Int](16)
              var total = 0
              var k = 0
              while (k < 16) { bits(k) = b(p + 1 + k) & 0xFF; total += bits(k); k += 1 }
              if (p + 17 + total > end || total > 256) return NoStats
              val vals = new Array[Int](total)
              k = 0
              while (k < total) { vals(k) = b(p + 17 + k) & 0xFF; k += 1 }
              val h = new Huff(bits, vals)
              if (tc == 0) dcTab(th) = h else acTab(th) = h
              p += 17 + total
            }
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            progressive = m == 0xC2
            if (segLen < 8) return NoStats
            if ((b(p0) & 0xFF) != 8) return NoStats // precision
            height = ((b(p0 + 1) & 0xFF) << 8) | (b(p0 + 2) & 0xFF)
            width = ((b(p0 + 3) & 0xFF) << 8) | (b(p0 + 4) & 0xFF)
            nComp = b(p0 + 5) & 0xFF
            if (width == 0 || height == 0 || nComp < 1 || nComp > 4 ||
              segLen < 8 + 3 * nComp) return NoStats
            var c = 0
            while (c < nComp) {
              compId(c) = b(p0 + 6 + 3 * c) & 0xFF
              val sampling = b(p0 + 7 + 3 * c) & 0xFF
              if (c == 0) {
                // luma may subsample chroma (2x2/2x1/1x2); a
                // single-component frame with factors > 1x1 would make
                // the scan NON-interleaved (T.81 A.2) — refuse
                lumaH = (sampling & 0xF0) >> 4
                lumaV = sampling & 0x0F
                if (lumaH < 1 || lumaH > 2 || lumaV < 1 || lumaV > 2)
                  return NoStats
              } else if (sampling != 0x11) {
                return NoStats // chroma must be 1x1 (luma >= chroma rate)
              }
              compQ(c) = b(p0 + 8 + 3 * c) & 0x0F
              c += 1
            }
            if (nComp == 1 && (lumaH != 1 || lumaV != 1)) return NoStats
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return NoStats // extended/lossless/arithmetic: out of scope
          case 0xDD => // DRI
            if (segLen != 4) return NoStats
            restartInterval = ((b(p0) & 0xFF) << 8) | (b(p0 + 1) & 0xFF)
          case 0xDA => // SOS
            if (nComp == 0 || width == 0) return NoStats
            if (progressive)
              // the progressive driver owns the rest of the stream
              // (scans + inter-scan DHT/DQT/DRI) through to EOI
              return decodeProgressive(b, i, width, height, nComp,
                lumaH, lumaV, quant, dcTab, acTab, compId, compQ,
                restartInterval, box)
            val ns = b(p0) & 0xFF
            if (ns != nComp || segLen != 6 + 2 * ns) return NoStats
            // a baseline sequential scan must cover the spectral range
            // whole and unshifted: Ss=0, Se=63, Ah=Al=0 — anything else is
            // a progressive scan smuggled under SOF0, refuse
            if ((b(p0 + 1 + 2 * ns) & 0xFF) != 0 ||
              (b(p0 + 2 + 2 * ns) & 0xFF) != 63 ||
              (b(p0 + 3 + 2 * ns) & 0xFF) != 0) return NoStats
            var c = 0
            while (c < ns) {
              // the scan's component selector (Cs) must name the frame's
              // c-th component — the decoder assigns quant/Huffman tables
              // positionally, so a conforming-but-reordered scan would
              // otherwise decode with swapped assignments instead of
              // refusing (ADVICE r13)
              if ((b(p0 + 1 + 2 * c) & 0xFF) != compId(c)) return NoStats
              compDc(c) = (b(p0 + 2 + 2 * c) & 0xF0) >> 4
              compAc(c) = b(p0 + 2 + 2 * c) & 0x0F
              if (dcTab(compDc(c)) == null || acTab(compAc(c)) == null ||
                quant(compQ(c)) == null) return NoStats
              c += 1
            }
            return decodeScan(b, i + 2 + segLen, width, height, nComp,
              compQ.map(quant), compDc.map(dcTab), compAc.map(acTab),
              restartInterval, lumaH, lumaV, box)
          case _ => () // APPn / COM / other: skip
        }
        i += 2 + segLen
      }
    }
    NoStats
  }

  /** Entropy-decode every MCU, fold luma stats trimmed to width×height.
    * `lumaH`/`lumaV` are component 0's sampling factors (chroma is
    * 1×1-gated upstream), so an MCU is `8·lumaH × 8·lumaV` pixels and
    * carries `lumaH·lumaV` luma blocks (raster order within the MCU,
    * T.81 A.2.3) followed by one block per chroma component.
    */
  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
                         nComp: Int, q: Array[Array[Int]], dc: Array[Huff],
                         ac: Array[Huff], restartInterval: Int,
                         lumaH: Int, lumaV: Int, box: LumaPlane): Long = {
    val mcuW = 8 * lumaH
    val mcuH = 8 * lumaV
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    if (box != null) {
      if (width.toLong * height > MaxProgressivePixels) return NoStats
      box.w = width
      box.h = height
      box.px = new Array[Int](width * height)
    }
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var minL = 255
    var maxL = 0
    var sum = 0L
    var r = new BitReader(b, start)
    var mcu = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn on a byte boundary; predictors reset
        r.align()
        if (r.pos + 1 >= b.length || (b(r.pos) & 0xFF) != 0xFF) return NoStats
        val m = b(r.pos + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7) return NoStats
        if (m != 0xD0 + ((mcu / restartInterval - 1) % 8)) return NoStats
        r = new BitReader(b, r.pos + 2)
        java.util.Arrays.fill(pred, 0)
      }
      var c = 0
      while (c < nComp) {
        val blocks = if (c == 0) lumaH * lumaV else 1
        var blk = 0
        while (blk < blocks) {
          java.util.Arrays.fill(coef, 0)
          // DC
          val s = decodeHuff(r, dc(c))
          if (s == Int.MinValue || s > 11) return NoStats
          val diff = if (s == 0) 0 else {
            val d = receiveExtend(r, s)
            if (d == Int.MinValue) return NoStats
            d
          }
          pred(c) += diff
          coef(0) = pred(c) * q(c)(0)
          // AC run-length
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = decodeHuff(r, ac(c))
            if (rs == Int.MinValue) return NoStats
            val run = (rs >> 4) & 0x0F
            val size = rs & 0x0F
            if (size == 0) {
              if (run == 15) {
                // ZRL skips 16 zero coefficients; a conforming encoder only
                // emits it ahead of a further nonzero coefficient (trailing
                // zeros are EOB's job), so a ZRL that advances past index 63
                // is as malformed as an oversized run — refuse, matching the
                // `k += run` strictness below (ADVICE r13).
                k += 16
                if (k > 63) return NoStats
              } else eob = true
            } else {
              k += run
              if (k > 63) return NoStats
              val v = receiveExtend(r, size)
              if (v == Int.MinValue) return NoStats
              coef(ZigZag(k)) = v * q(c)(ZigZag(k))
              k += 1
            }
          }
          if (c == 0) { // luma only, at its true origin within the MCU
            idct(coef, px)
            val bx = (mcu % mcusX) * mcuW + (blk % lumaH) * 8
            val by = (mcu / mcusX) * mcuH + (blk / lumaH) * 8
            var y = 0
            while (y < 8 && by + y < height) {
              var x = 0
              while (x < 8 && bx + x < width) {
                val v = px(y * 8 + x)
                if (v < minL) minL = v
                if (v > maxL) maxL = v
                sum += v
                if (box != null) box.px((by + y) * width + (bx + x)) = v
                x += 1
              }
              y += 1
            }
          }
          blk += 1
        }
        c += 1
      }
      mcu += 1
    }
    minL.toLong | (maxL.toLong << 8) | (sum << 16)
  }

  /** First index ≥ `from` of a REAL marker (FF followed by neither a
    * stuffed 00 nor a restart D0–D7), or -1 — how the progressive driver
    * skips a non-luma scan's entropy data and finds a decoded scan's end.
    */
  private def findNextMarker(b: Array[Byte], from: Int): Int = {
    var j = math.max(from, 0)
    while (j + 1 < b.length) {
      if ((b(j) & 0xFF) == 0xFF) {
        val m = b(j + 1) & 0xFF
        if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) j += 2
        else if (m == 0xFF) j += 1
        else return j
      } else j += 1
    }
    -1
  }

  /** Resource guard for the progressive coefficient grid (~4 B/pixel —
    * a header is attacker-controlled; 4 Mpx caps the grid at 16 MB).
    */
  private final val MaxProgressivePixels = 1L << 22

  /** PROGRESSIVE (SOF2) decode — T.81 Annex G, Huffman mode: the driver
    * owns the stream from the first SOS to EOI, accumulating LUMA
    * coefficients across scans in a full-image grid (chroma-only scans
    * are structurally skipped to the next marker — their bits cannot
    * affect luma), then dequantizes + IDCTs every block once at EOI.
    *
    * Scan algebra enforced, not assumed: DC scans are Ss=Se=0 (the only
    * interleavable kind; components must follow frame order), AC scans
    * are single-component 1 ≤ Ss ≤ Se ≤ 63; successive approximation
    * is tracked PER COEFFICIENT — a first scan requires a virgin band
    * and Ah=0, a refinement requires Ah equal to the band's current
    * level and Al = Ah-1 (T.81 G.1.1.1.2) — so scans out of order,
    * overlapping bands at mismatched precision, or an AC scan before
    * the component's DC all refuse instead of decoding garbage.
    */
  private def decodeProgressive(b: Array[Byte], sosPos: Int, width: Int,
                                height: Int, nComp: Int, lumaH: Int,
                                lumaV: Int, quant: Array[Array[Int]],
                                dcTab: Array[Huff], acTab: Array[Huff],
                                compId: Array[Int], compQ: Array[Int],
                                restartInterval0: Int,
                                box: LumaPlane): Long = {
    if (width.toLong * height > MaxProgressivePixels) return NoStats
    if (box != null) {
      box.w = width
      box.h = height
      box.px = new Array[Int](width * height)
    }
    val mcusX = (width + 8 * lumaH - 1) / (8 * lumaH)
    val mcusY = (height + 8 * lumaV - 1) / (8 * lumaV)
    val bwFull = mcusX * lumaH
    val bhFull = mcusY * lumaV
    val bwImg = (width + 7) / 8
    val bhImg = (height + 7) / 8
    val grid = new Array[Int](bwFull * bhFull * 64)
    // successive-approximation ledger: level(k) = the next refinement's
    // expected Ah for luma coefficient k (MinValue = no first scan yet)
    val level = Array.fill(64)(Int.MinValue)
    var restartInterval = restartInterval0
    var pos = sosPos
    val len = b.length
    var sawLumaDc = false

    while (true) {
      if (pos + 1 >= len || (b(pos) & 0xFF) != 0xFF) return NoStats
      val m = b(pos + 1) & 0xFF
      if (m == 0xD9) {
        // EOI: dequantize + IDCT + fold
        if (!sawLumaDc) return NoStats
        val q = quant(compQ(0))
        if (q == null) return NoStats
        val coef = new Array[Int](64)
        val px = new Array[Int](64)
        var minL = 255
        var maxL = 0
        var sum = 0L
        var by = 0
        while (by < bhImg) {
          var bx = 0
          while (bx < bwImg) {
            val base = (by * bwFull + bx) * 64
            var k = 0
            while (k < 64) { coef(k) = grid(base + k) * q(k); k += 1 }
            idct(coef, px)
            var y = 0
            while (y < 8 && by * 8 + y < height) {
              var x = 0
              while (x < 8 && bx * 8 + x < width) {
                val v = px(y * 8 + x)
                if (v < minL) minL = v
                if (v > maxL) maxL = v
                sum += v
                if (box != null)
                  box.px((by * 8 + y) * width + (bx * 8 + x)) = v
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        return minL.toLong | (maxL.toLong << 8) | (sum << 16)
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) return NoStats // stray
      if (pos + 3 >= len) return NoStats
      val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      if (segLen < 2 || pos + 2 + segLen > len) return NoStats
      val p0 = pos + 4
      m match {
        case 0xC4 => // inter-scan DHT
          var p = p0
          val end = pos + 2 + segLen
          while (p < end) {
            val tc = (b(p) & 0xF0) >> 4
            val th = b(p) & 0x0F
            if (tc > 1 || th > 3 || p + 17 > end) return NoStats
            val bits = new Array[Int](16)
            var total = 0
            var k = 0
            while (k < 16) { bits(k) = b(p + 1 + k) & 0xFF; total += bits(k); k += 1 }
            if (p + 17 + total > end || total > 256) return NoStats
            val vals = new Array[Int](total)
            k = 0
            while (k < total) { vals(k) = b(p + 17 + k) & 0xFF; k += 1 }
            val h = new Huff(bits, vals)
            if (tc == 0) dcTab(th) = h else acTab(th) = h
            p += 17 + total
          }
          pos += 2 + segLen
        case 0xDB => // inter-scan DQT
          var p = p0
          val end = pos + 2 + segLen
          while (p < end) {
            val pq = (b(p) & 0xF0) >> 4
            val tq = b(p) & 0x0F
            if (pq != 0 || tq > 3 || p + 65 > end) return NoStats
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = b(p + 1 + k) & 0xFF; k += 1 }
            quant(tq) = t
            p += 65
          }
          pos += 2 + segLen
        case 0xDD =>
          if (segLen != 4) return NoStats
          restartInterval = ((b(p0) & 0xFF) << 8) | (b(p0 + 1) & 0xFF)
          pos += 2 + segLen
        case 0xDA =>
          val ns = b(p0) & 0xFF
          if (ns < 1 || ns > nComp || segLen != 6 + 2 * ns) return NoStats
          val scanComp = new Array[Int](ns) // frame indices
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var prevIdx = -1
          var c = 0
          while (c < ns) {
            val cs = b(p0 + 1 + 2 * c) & 0xFF
            var fi = -1
            var j = 0
            while (j < nComp) { if (compId(j) == cs) fi = j; j += 1 }
            // components must follow frame order (T.81 B.2.3)
            if (fi < 0 || fi <= prevIdx) return NoStats
            prevIdx = fi
            scanComp(c) = fi
            scanDc(c) = (b(p0 + 2 + 2 * c) & 0xF0) >> 4
            scanAc(c) = b(p0 + 2 + 2 * c) & 0x0F
            c += 1
          }
          val ss = b(p0 + 1 + 2 * ns) & 0xFF
          val se = b(p0 + 2 + 2 * ns) & 0xFF
          val ah = (b(p0 + 3 + 2 * ns) & 0xF0) >> 4
          val al = b(p0 + 3 + 2 * ns) & 0x0F
          if (ah > 13 || al > 13) return NoStats
          val dataStart = pos + 2 + segLen
          val hasLuma = scanComp.contains(0)
          val isDc = ss == 0
          if (isDc) { if (se != 0) return NoStats }
          else if (ns != 1 || ss < 1 || se > 63 || ss > se) return NoStats
          if (ah != 0 && al != ah - 1) return NoStats
          if (!hasLuma) {
            // chroma-only scan: its bits cannot touch the luma grid —
            // skip structurally to the next marker
            val nxt = findNextMarker(b, dataStart)
            if (nxt < 0) return NoStats
            pos = nxt
          } else {
            // successive-approximation ledger checks for the luma band
            var k = if (isDc) 0 else ss
            val kEnd = if (isDc) 0 else se
            while (k <= kEnd) {
              if (ah == 0) { if (level(k) != Int.MinValue) return NoStats }
              else if (level(k) != ah) return NoStats
              level(k) = al
              k += 1
            }
            if (!isDc && level(0) == Int.MinValue)
              return NoStats // AC before the component's DC (G.1.1.1.1)
            if (isDc) sawLumaDc = true
            val endPos =
              if (isDc)
                decodeDcScan(b, dataStart, grid, bwFull, bwImg, bhImg,
                  mcusX, mcusY, lumaH, lumaV, nComp, scanComp, scanDc,
                  dcTab, ns, ah, al, restartInterval)
              else
                decodeAcScan(b, dataStart, grid, bwFull, bwImg, bhImg,
                  acTab(scanAc(0)), ss, se, ah, al, restartInterval)
            if (endPos < 0) return NoStats
            val nxt = findNextMarker(b, endPos)
            if (nxt < 0) return NoStats
            pos = nxt
          }
        case 0xC0 | 0xC2 => return NoStats // a second frame
        case _ => pos += 2 + segLen // APPn / COM
      }
    }
    NoStats
  }

  /** Progressive DC scan (first or refinement), interleaved or single-
    * component; returns the byte position after the entropy data, or -1.
    */
  private def decodeDcScan(b: Array[Byte], start: Int, grid: Array[Int],
                           bwFull: Int, bwImg: Int, bhImg: Int,
                           mcusX: Int, mcusY: Int, lumaH: Int, lumaV: Int,
                           nComp: Int, scanComp: Array[Int],
                           scanDc: Array[Int], dcTab: Array[Huff],
                           ns: Int, ah: Int, al: Int,
                           restartInterval: Int): Int = {
    val pred = new Array[Int](nComp)
    var r = new BitReader(b, start)
    val interleaved = ns > 1
    // MCU geometry: interleaved scans walk the padded MCU grid with each
    // component's full block factor; a single-component scan walks that
    // component's OWN raster (T.81 A.2.2)
    val nUnits =
      if (interleaved) mcusX * mcusY
      else if (scanComp(0) == 0) bwImg * bhImg
      else mcusX * mcusY // 1x1 chroma: its raster = the MCU grid
    var unit = 0
    while (unit < nUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.align()
        if (r.pos + 1 >= b.length || (b(r.pos) & 0xFF) != 0xFF) return -1
        val m = b(r.pos + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7) return -1
        if (m != 0xD0 + ((unit / restartInterval - 1) % 8)) return -1
        r = new BitReader(b, r.pos + 2)
        java.util.Arrays.fill(pred, 0)
      }
      var c = 0
      while (c < ns) {
        val fi = scanComp(c)
        val isLuma = fi == 0
        val blocks =
          if (interleaved && isLuma) lumaH * lumaV else 1
        var blk = 0
        while (blk < blocks) {
          var gIdx = -1
          if (isLuma) {
            val (bx, by) =
              if (interleaved)
                ((unit % mcusX) * lumaH + blk % lumaH,
                  (unit / mcusX) * lumaV + blk / lumaH)
              else (unit % bwImg, unit / bwImg)
            gIdx = (by * bwFull + bx) * 64
          }
          if (ah == 0) { // DC first: diff at Al precision
            val tab = dcTab(scanDc(c))
            if (tab == null) return -1
            val s = decodeHuff(r, tab)
            if (s == Int.MinValue || s > 11) return -1
            val diff = if (s == 0) 0 else {
              val d = receiveExtend(r, s)
              if (d == Int.MinValue) return -1
              d
            }
            pred(fi) += diff
            if (gIdx >= 0) grid(gIdx) = pred(fi) << al
          } else { // DC refinement: one bit per block
            val bit = r.nextBit()
            if (bit < 0) return -1
            if (bit == 1 && gIdx >= 0) grid(gIdx) |= 1 << al
          }
          blk += 1
        }
        c += 1
      }
      unit += 1
    }
    r.pos
  }

  /** Progressive AC scan (first or refinement) over the single LUMA
    * component's raster; returns the end position or -1. T.81 G.1.2.2
    * (first: EOBRUN runs of end-of-band blocks) and G.1.2.3 (refinement:
    * correction bits woven through the zero-history run walk).
    */
  private def decodeAcScan(b: Array[Byte], start: Int, grid: Array[Int],
                           bwFull: Int, bwImg: Int, bhImg: Int,
                           ac: Huff, ss: Int, se: Int, ah: Int, al: Int,
                           restartInterval: Int): Int = {
    if (ac == null) return -1
    var r = new BitReader(b, start)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = r.nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    // refine one nonzero coefficient with its correction bit
    def correct(idx: Int): Boolean = {
      val bit = r.nextBit()
      if (bit < 0) return false
      if (bit == 1 && (grid(idx) & p1) == 0) {
        if (grid(idx) >= 0) grid(idx) += p1 else grid(idx) += m1
      }
      true
    }
    val nBlocks = bwImg * bhImg
    var blk = 0
    while (blk < nBlocks) {
      if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
        r.align()
        if (r.pos + 1 >= b.length || (b(r.pos) & 0xFF) != 0xFF) return -1
        val m = b(r.pos + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7) return -1
        if (m != 0xD0 + ((blk / restartInterval - 1) % 8)) return -1
        r = new BitReader(b, r.pos + 2)
        eobrun = 0
      }
      val base = ((blk / bwImg) * bwFull + blk % bwImg) * 64
      if (ah == 0) { // ───────── first scan
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var stop = false
          while (k <= se && !stop) {
            val rs = decodeHuff(r, ac)
            if (rs == Int.MinValue) return -1
            val run = (rs >> 4) & 0x0F
            val size = rs & 0x0F
            if (size == 0) {
              if (run == 15) {
                // ZRL promises a further nonzero coefficient inside the
                // band — overrunning it is malformed (the r13 stance)
                k += 16
                if (k > se) return -1
              } else {
                eobrun = (1 << run) - 1
                if (run > 0) {
                  val extra = readBits(run)
                  if (extra == Int.MinValue) return -1
                  eobrun += extra
                }
                stop = true
              }
            } else {
              k += run
              if (k > se) return -1
              val v = receiveExtend(r, size)
              if (v == Int.MinValue) return -1
              grid(base + ZigZag(k)) = v << al
              k += 1
            }
          }
        }
      } else { // ───────── refinement scan (G.1.2.3)
        var k = ss
        if (eobrun == 0) {
          var inBand = true
          while (k <= se && inBand) {
            val rs = decodeHuff(r, ac)
            if (rs == Int.MinValue) return -1
            var run = (rs >> 4) & 0x0F
            val size = rs & 0x0F
            var newVal = 0
            if (size == 0) {
              if (run < 15) {
                // EOB run begins — the TOTAL (2^r + extra) INCLUDES the
                // current block, whose remaining nonzeros still take
                // their correction bits in the eobrun block below
                // (G.1.2.3, the libjpeg convention)
                eobrun = 1 << run
                if (run > 0) {
                  val extra = readBits(run)
                  if (extra == Int.MinValue) return -1
                  eobrun += extra
                }
                inBand = false
              }
              // run == 15 (ZRL): skip 16 zero-HISTORY coefficients below
            } else {
              if (size != 1) return -1 // refinement codes ±1 only
              val bit = r.nextBit()
              if (bit < 0) return -1
              newVal = if (bit == 1) p1 else m1
            }
            if (inBand) {
              // advance over `run` zero-history positions (refining
              // nonzero coefficients along the way), then land on one
              // more zero-history position: the new ±1 goes there — or,
              // for ZRL, it is the promised 16th zero. Running out of
              // band before landing is malformed (the r13 stance).
              var placed = false
              var zrlLeft = run
              var advancing = true
              while (advancing) {
                if (k > se) {
                  if (!placed) return -1
                  advancing = false
                } else {
                  val idx = base + ZigZag(k)
                  if (grid(idx) != 0) {
                    if (!correct(idx)) return -1
                    k += 1
                  } else if (zrlLeft > 0) {
                    zrlLeft -= 1
                    k += 1
                  } else {
                    if (newVal != 0) grid(idx) = newVal
                    placed = true
                    k += 1
                    advancing = false
                  }
                }
              }
            }
          }
        }
        if (eobrun > 0) {
          // end-of-band: every remaining nonzero coefficient still
          // receives its correction bit
          while (k <= se) {
            val idx = base + ZigZag(k)
            if (grid(idx) != 0 && !correct(idx)) return -1
            k += 1
          }
          eobrun -= 1
        }
      }
      blk += 1
    }
    r.pos
  }

  // ───────────────────────────── synthesis ─────────────────────────────

  /** Annex K luminance DC Huffman spec (BITS then HUFFVAL). */
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // minimal legal AC table: the single 1-bit code '0' = EOB
  private val MinAcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val MinAcVals = Array(0)
  // progressive AC table: EOB/EOBRUN codes 0x00..0xE0 (r<<4), all 4-bit
  private val ProgAcBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ProgAcVals = (0 to 14).map(_ << 4).toArray

  /** Canonical codes (code, length) for a BITS/HUFFVAL spec. */
  private def canonical(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var j = 0
      while (j < bits(l - 1)) {
        out += vals(k) -> ((code, l))
        code += 1
        k += 1
        j += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0
          n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 convention). */
    def flush(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) }
  }

  /** The q118 per-block luma DC residue map — the formula the DuckDB
    * oracle replays: dc ∈ [-125, 125], so the flat decoded block is
    * exactly dc + 128 with the all-8 quant table (F00 = dc·8, IDCT/8).
    */
  def blockDc(seed: Long, k: Int): Int =
    (((seed * 31 + k * 17) % 251 + 251) % 251).toInt - 125

  private def chromaDc(seed: Long, k: Int, c: Int): Int =
    (((seed * (7 + 4 * c) + k * 13) % 101 + 101) % 101).toInt - 50

  /** Synthesize a DC-only baseline JPEG: `bw`×`bh` MCUs of flat 8×8
    * luma tiles from [[blockDc]] (block k = MCU-major, raster within
    * the MCU — but the stats contract only needs the SET of k values,
    * `0 until bw·bh·H·V`), restart markers every `dri` MCUs when
    * `dri` > 0. `mode` picks the layout: 0 grayscale, 1 4:4:4 color,
    * 2 4:2:0 (luma 2×2), 3 4:2:2 (luma 2×1) — chroma blocks carry
    * their own DC walk and are stats-irrelevant. All tables are
    * written INTO the stream (Annex K DC spec, a minimal 1-code AC
    * table, quant all-8s) — the decoder trusts only the file.
    */
  def synth(seed: Long, bw: Int, bh: Int, dri: Int, mode: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    val h0 = if (mode == 2 || mode == 3) 2 else 1
    val v0 = if (mode == 2) 2 else 1
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 65); u8(0x00) // DQT table 0, Pq=0
    (0 until 64).foreach(_ => u8(8))
    val nComp = if (mode == 0) 1 else 3
    marker(0xC0); u16(8 + 3 * nComp); u8(8) // SOF0, 8-bit
    u16(bh * 8 * v0); u16(bw * 8 * h0); u8(nComp)
    (0 until nComp).foreach { c =>
      u8(c + 1); u8(if (c == 0) (h0 << 4) | v0 else 0x11); u8(0)
    }
    marker(0xC4) // DHT: DC table 0 + AC table 0
    u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + MinAcVals.length))
    u8(0x00); StdDcBits.foreach(u8); StdDcVals.foreach(u8)
    u8(0x10); MinAcBits.foreach(u8); MinAcVals.foreach(u8)
    if (dri > 0) { marker(0xDD); u16(4); u16(dri) }
    marker(0xDA); u16(6 + 2 * nComp); u8(nComp)
    (0 until nComp).foreach { c => u8(c + 1); u8(0x00) }
    u8(0); u8(63); u8(0)
    val dcCodes = canonical(StdDcBits, StdDcVals)
    val eob = canonical(MinAcBits, MinAcVals)(0)
    var bwr = new BitWriter(out)
    val pred = new Array[Int](nComp)
    val lumaPerMcu = h0 * v0
    var mcu = 0
    val nMcu = bw * bh
    while (mcu < nMcu) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        bwr.flush()
        marker(0xD0 + ((mcu / dri - 1) % 8))
        bwr = new BitWriter(out)
        java.util.Arrays.fill(pred, 0)
      }
      def putDc(c: Int, dc: Int): Unit = {
        val diff = dc - pred(c)
        pred(c) = dc
        val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, clen) = dcCodes(s)
        bwr.put(code, clen)
        if (s > 0) bwr.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        bwr.put(eob._1, eob._2)
      }
      var blk = 0
      while (blk < lumaPerMcu) {
        putDc(0, blockDc(seed, mcu * lumaPerMcu + blk))
        blk += 1
      }
      var c = 1
      while (c < nComp) {
        putDc(c, chromaDc(seed, mcu, c))
        c += 1
      }
      mcu += 1
    }
    bwr.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Grayscale baseline DC-only JPEG with EXPLICIT per-block DCs (raster
    * order over a `bw`×`bh` block grid), an optional raw APP1 segment
    * spliced right after SOI, and `truncate` tail bytes dropped
    * (0 = intact). Same tables and bit packing as [[synth]] — only the
    * DC source differs, so the [[ExifEval]] family can permute block
    * grids and attach EXIF metadata without duplicating the encoder.
    */
  private[functions] def synthBaselineGray(dcs: Array[Int], bw: Int, bh: Int,
                                           app1: Array[Byte],
                                           truncate: Int): Array[Byte] = {
    require(dcs.length == bw * bh, "one DC per block")
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    if (app1 != null) out.write(app1, 0, app1.length)
    marker(0xDB); u16(2 + 65); u8(0x00)
    (0 until 64).foreach(_ => u8(8))
    marker(0xC0); u16(8 + 3); u8(8)
    u16(bh * 8); u16(bw * 8); u8(1)
    u8(1); u8(0x11); u8(0)
    marker(0xC4)
    u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + MinAcVals.length))
    u8(0x00); StdDcBits.foreach(u8); StdDcVals.foreach(u8)
    u8(0x10); MinAcBits.foreach(u8); MinAcVals.foreach(u8)
    marker(0xDA); u16(8); u8(1); u8(1); u8(0x00)
    u8(0); u8(63); u8(0)
    val dcCodes = canonical(StdDcBits, StdDcVals)
    val eob = canonical(MinAcBits, MinAcVals)(0)
    val bwr = new BitWriter(out)
    var pred = 0
    var k = 0
    while (k < dcs.length) {
      val diff = dcs(k) - pred
      pred = dcs(k)
      val s =
        if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, clen) = dcCodes(s)
      bwr.put(code, clen)
      if (s > 0) bwr.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      bwr.put(eob._1, eob._2)
      k += 1
    }
    bwr.flush()
    marker(0xD9)
    val full = out.toByteArray
    if (truncate <= 0) full
    else java.util.Arrays.copyOf(full, math.max(0, full.length - truncate))
  }

  /** Synthesize a PROGRESSIVE (SOF2) DC-only JPEG from the same residue
    * maps: `bw`×`bh` MCUs, grayscale or 4:2:0 color. Four/six scans
    * exercise the Annex G machinery end to end — DC first at Al=1
    * (point-transformed diffs), DC refinement (Ah=1, the low bit), a
    * luma AC first scan at Al=1 whose whole raster is ONE EOBRUN token,
    * a luma AC refinement (Ah=1) that re-ends every band, and (color)
    * per-chroma AC scans the decoder must structurally SKIP. The decoded
    * image equals the baseline synthesis of the same seed/shape: flat
    * blocks of dc+128, so the oracle formula is shared.
    */
  def synthProg(seed: Long, bw: Int, bh: Int, color420: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    val h0 = if (color420) 2 else 1
    val v0 = h0
    val nComp = if (color420) 3 else 1
    marker(0xD8)
    marker(0xDB); u16(2 + 65); u8(0x00)
    (0 until 64).foreach(_ => u8(8))
    marker(0xC2); u16(8 + 3 * nComp); u8(8) // SOF2
    u16(bh * 8 * v0); u16(bw * 8 * h0); u8(nComp)
    (0 until nComp).foreach { c =>
      u8(c + 1); u8(if (c == 0) (h0 << 4) | v0 else 0x11); u8(0)
    }
    marker(0xC4) // DC table 0 + the progressive AC table 0
    u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + ProgAcVals.length))
    u8(0x00); StdDcBits.foreach(u8); StdDcVals.foreach(u8)
    u8(0x10); ProgAcBits.foreach(u8); ProgAcVals.foreach(u8)
    val dcCodes = canonical(StdDcBits, StdDcVals)
    val acCodes = canonical(ProgAcBits, ProgAcVals)
    val lumaPerMcu = h0 * v0
    val nMcu = bw * bh
    def dcOf(c: Int, unitBlk: Int): Int =
      if (c == 0) blockDc(seed, unitBlk) else chromaDc(seed, unitBlk, c)

    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xDA); u16(6 + 2 * comps.length); u8(comps.length)
      comps.foreach { c => u8(c + 1); u8(0x00) } // Td=Ta=0
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    // scan 1: DC first, interleaved, Al=1 (point-transformed diffs)
    sos(0 until nComp, 0, 0, 0, 1)
    var bwr = new BitWriter(out)
    val pred = new Array[Int](nComp)
    var mcu = 0
    while (mcu < nMcu) {
      var c = 0
      while (c < nComp) {
        val blocks = if (c == 0) lumaPerMcu else 1
        var blk = 0
        while (blk < blocks) {
          val v1 = dcOf(c, if (c == 0) mcu * lumaPerMcu + blk else mcu) >> 1
          val diff = v1 - pred(c)
          pred(c) = v1
          val s = if (diff == 0) 0
            else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          val (code, clen) = dcCodes(s)
          bwr.put(code, clen)
          if (s > 0) bwr.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
          blk += 1
        }
        c += 1
      }
      mcu += 1
    }
    bwr.flush()
    // scan 2: DC refinement (Ah=1, Al=0): the low bit of every block
    sos(0 until nComp, 0, 0, 1, 0)
    bwr = new BitWriter(out)
    mcu = 0
    while (mcu < nMcu) {
      var c = 0
      while (c < nComp) {
        val blocks = if (c == 0) lumaPerMcu else 1
        var blk = 0
        while (blk < blocks) {
          val dc = dcOf(c, if (c == 0) mcu * lumaPerMcu + blk else mcu)
          bwr.put(dc & 1, 1)
          blk += 1
        }
        c += 1
      }
      mcu += 1
    }
    bwr.flush()
    // EOBRUN tokens ending `n` all-zero bands (value run-1 encoded as
    // r + extra bits per G.1.2.2). T.81 caps one EOBRUN at 2^15-1
    // blocks (EOB14), so rasters past 32767 luma blocks — reachable at
    // bw=bh=255 with 2x2 sampling — emit a chain of maximal tokens;
    // the decoder consumes each when its pending run drains to zero.
    def eobrunAll(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        val take = math.min(n, 32767)
        val v = take - 1
        val r = if (v == 0) 0 else 31 - Integer.numberOfLeadingZeros(v + 1)
        val (code, clen) = acCodes(r << 4)
        bwr.put(code, clen)
        if (r > 0) bwr.put(v + 1 - (1 << r), r)
        n -= take
      }
    }
    // scans 3-4: luma AC first (Al=1) then refinement (Ah=1 -> Al=0),
    // each one EOBRUN over the whole luma raster
    val lumaBlocks = nMcu * lumaPerMcu
    sos(Seq(0), 1, 63, 0, 1)
    bwr = new BitWriter(out); eobrunAll(lumaBlocks); bwr.flush()
    sos(Seq(0), 1, 63, 1, 0)
    bwr = new BitWriter(out); eobrunAll(lumaBlocks); bwr.flush()
    // color: per-chroma AC scans the luma decoder must marker-skip
    if (color420) {
      var c = 1
      while (c < nComp) {
        sos(Seq(c), 1, 63, 0, 0)
        bwr = new BitWriter(out); eobrunAll(nMcu); bwr.flush()
        c += 1
      }
    }
    marker(0xD9)
    out.toByteArray
  }

  /** Shape-word dispatcher for [[JpegSynth]]: modes 0–3 are the baseline
    * layouts (`dri` honored), 4 = progressive grayscale, 5 = progressive
    * 4:2:0 (progressive synthesis carries no restart markers).
    */
  def synthAny(seed: Long, bw: Int, bh: Int, dri: Int, mode: Int): Array[Byte] =
    mode match {
      case 4 => synthProg(seed, bw, bh, color420 = false)
      case 5 => synthProg(seed, bw, bh, color420 = true)
      case m => synth(seed, bw, bh, dri, m)
    }
}

/** `binary -> long`: packed baseline-JPEG luma stats
  * (`min | max<<8 | sum<<16`) via [[JpegPixelEval.lumaStats]]; NULL on
  * anything outside the stated baseline scope or structurally broken.
  */
case class JpegLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = JpegPixelEval.lumaStats(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("jluma")
      s"""
         |long $res = graft.functions.JpegPixelEval.lumaStats($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegLuma =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q118's synthesis expression —
  * `shape` packs `bw | bh<<8 | dri<<16 | mode<<24` (mode 0 grayscale,
  * 1 4:4:4, 2 4:2:0, 3 4:2:2, 4 progressive grayscale, 5 progressive
  * 4:2:0 — mode 1 coincides with the historical `color` bit) so the
  * synthesis stays a two-child codegen'd expression.
  */
case class JpegSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    JpegPixelEval.synthAny(seed.asInstanceOf[Long], (sh & 0xFF).toInt,
      ((sh >> 8) & 0xFF).toInt, ((sh >> 16) & 0xFF).toInt, ((sh >> 24) & 7).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sh) =>
      s"graft.functions.JpegPixelEval.synthAny($s, (int)($sh & 0xFF), " +
        s"(int)(($sh >> 8) & 0xFF), (int)(($sh >> 16) & 0xFF), (int)(($sh >> 24) & 7))")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JpegSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the baseline-JPEG pixel kernels. */
object JpegPixelOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def jpegLuma(bin: Column): Column =
    ColumnBridge.column(JpegLuma(ColumnBridge.expression(bin.cast("binary"))))

  def jpegSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(JpegSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
