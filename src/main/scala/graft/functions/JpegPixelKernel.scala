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
  * Scope is stated, not guessed: baseline sequential (SOF0), 8-bit
  * precision, with luma sampling factors H,V ∈ {1,2} and 1×1 chroma —
  * that covers grayscale, 4:4:4, 4:2:2 (2×1), 4:4:0 (1×2), and 4:2:0
  * (2×2, the dominant web-JPEG layout): the Y stats fold component 0's
  * H·V blocks per MCU at their true pixel origins; chroma blocks are
  * entropy-decoded to keep the stream aligned and then dropped.
  * Subsampled LUMA (a chroma factor exceeding luma's), single-component
  * frames declaring factors > 1×1 (T.81 §A.2 makes such scans
  * non-interleaved, a different MCU geometry), progressive (SOF2),
  * arithmetic coding, and 16-bit quant tables return NULL —
  * stop-don't-guess, the q82/q95 stance. Any structural lie (truncated
  * entropy data, a Huffman code past the table, coefficient index past
  * 63, missing tables) also refuses with NULL.
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
  def lumaStats(b: Array[Byte]): Long = {
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
          case 0xC0 => // SOF0 baseline
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
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return NoStats // extended/progressive/arithmetic: out of scope
          case 0xDD => // DRI
            if (segLen != 4) return NoStats
            restartInterval = ((b(p0) & 0xFF) << 8) | (b(p0 + 1) & 0xFF)
          case 0xDA => // SOS: decode the scan and finish
            if (nComp == 0 || width == 0) return NoStats
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
              restartInterval, lumaH, lumaV)
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
                         lumaH: Int, lumaV: Int): Long = {
    val mcuW = 8 * lumaH
    val mcuH = 8 * lumaV
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
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

  // ───────────────────────────── synthesis ─────────────────────────────

  /** Annex K luminance DC Huffman spec (BITS then HUFFVAL). */
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // minimal legal AC table: the single 1-bit code '0' = EOB
  private val MinAcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val MinAcVals = Array(0)

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
  * 1 4:4:4, 2 4:2:0, 3 4:2:2 — mode 1 coincides with the historical
  * `color` bit) so the synthesis stays a two-child codegen'd expression.
  */
case class JpegSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    JpegPixelEval.synth(seed.asInstanceOf[Long], (sh & 0xFF).toInt,
      ((sh >> 8) & 0xFF).toInt, ((sh >> 16) & 0xFF).toInt, ((sh >> 24) & 3).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sh) =>
      s"graft.functions.JpegPixelEval.synth($s, (int)($sh & 0xFF), " +
        s"(int)(($sh >> 8) & 0xFF), (int)(($sh >> 16) & 0xFF), (int)(($sh >> 24) & 3))")

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
