package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Lossy-VP8 key-frame LUMA decode (q196) — the
  * dominant WebP variant on the real web, and until now the one image
  * family whose pixel plane was a documented refusal (q135's class 5).
  * Built the JpegPixelKernel way: scope stated, stop-don't-guess.
  *
  * What IS implemented, bit-exactly per RFC 6386:
  *  - the §7.3 BOOLEAN ARITHMETIC DECODER (range/value/split renorm) —
  *    the heart of VP8; hand vectors in Vp8Spec pin it;
  *  - the uncompressed chunk (frame tag, 9D 01 2A sync, 14-bit dims);
  *  - the first-partition header walk: color space, segmentation,
  *    loop-filter fields, partition count, quant indices, the
  *    4×8×3×11 token-probability UPDATE walk, mb_no_coeff_skip;
  *  - key-frame intra mode trees (kf_ymode_prob {145,156,163,128},
  *    kf_uv_mode_prob {142,114,183});
  *  - token decode: the 12-token coefficient tree, coefficient bands,
  *    zigzag, zero-run / EOB-after-zero rule, cat1–cat6 extra bits,
  *    per-block above+left nonzero contexts;
  *  - the FULL 4×4 inverse WHT (Y2 → the 16 per-block Y DCs), the
  *    FULL 4×4 inverse DCT (§14.3: the 35468/20091 fixed-point
  *    multipliers, columns unshifted, rows `(v+4)>>3`) for luma AC,
  *    with the `(dc+4)>>3` fast path on AC-free blocks;
  *  - all four 16×16 intra modes — DC / V / H / TM — chained through
  *    reconstructed neighbors with the §12.2 edge rules (missing
  *    above row reads 127, missing left column 129);
  *  - B_PRED macroblocks (r18): per-sub-block modes read through the
  *    §11.4 kf_bmode context chain, all TEN §12.3 sub-block
  *    predictors, sequential reconstruct-then-predict within the MB,
  *    own-DC residuals (no Y2, contexts untouched per §13.3);
  *  - the RFC §13.4/§13.5 probability machinery (r18, gate retired):
  *    update flags coded with coeff_update_probs; clear flags keep
  *    the default_coeff_probs — the path every organic encoder's
  *    frame takes. See [[Vp8Tables]] for the transcription-fidelity
  *    statement: oracle classes are immune (the paired encoder shares
  *    the tables, and the oracle replays pixel algebra from doc_id),
  *    while organic-file fidelity awaits an offline fixture.
  *
  *  - r18 widenings toward organic streams: ANY quant index with the
  *    five sign-magnitude deltas (§14.1 dc/ac lookup tables in
  *    [[Vp8Tables]]), 1/2/4/8 TOKEN PARTITIONS (3-byte-LE size table,
  *    MB row r reads partition r mod n, nonzero contexts stay
  *    frame-global), and the §15 LOOP FILTER (normal and simple
  *    types, MB + sub-block edges, hev logic, sharpness limits) run
  *    over the finished luma plane — VP8 intra prediction reads
  *    unfiltered neighbors, so filtering is a post-pass.
  *
  * The PROFILE (everything else refuses, never guesses): key frames
  * only, version 0, segmentation and loop-filter deltas off.
  *
  * The paired synthesizer is a real encoder (RFC §7.2 bool encoder
  * with carry propagation, tree writes, token emission through the
  * same context machinery), so every decode stage faces bytes
  * produced by the genuine algorithm; Vp8Spec round-trips thousands
  * of random bool/prob pairs and pins decoded pixel grids by hand.
  * Resource guard: 1 Mi pixels.
  */
object Vp8Eval {

  private final val NoStats = java.lang.Long.MIN_VALUE
  private final val MaxPixels = 1 << 20

  // ---------------------------------------------------- RFC constants

  // modes (leaf ids)
  private final val ModeDc = 0

  // kf_ymode_tree / kf_ymode_prob (RFC 6386 §11.2): B_PRED leads
  private val KfYTree = Array(-5, 2, 4, 6, -1, -2, -3, -4) // leaves -(mode+1); B_PRED=4
  private val KfYProb = Array(145, 156, 163, 128)
  private val UvTree = Array(-1, 2, -2, 4, -3, -4)
  private val KfUvProb = Array(142, 114, 183)

  // bmode_tree (RFC §11.4); sub-mode order DC,TM,VE,HE,LD,RD,VR,VL,HD,HU
  private val BModeTree = Array(
    -1, 2, -2, 4, -3, 6, 8, 12, -4, 10, -6, -7, -5, 14, -8, 16, -9, -10)
  // mb_segment_tree (RFC §10): two levels over the 3 transmitted probs
  private val SegTree = Array(2, 4, -1, -2, -3, -4)
  // a 16x16-coded neighbor contributes a fixed sub-mode to the
  // kf_bmode context (RFC §11.4): DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
  private val ImpliedSub = Array(0, 2, 3, 1)

  // coefficient token tree (RFC §13.2); leaves -(token+1); tokens:
  // 0..4 literal values, 5..10 cat1..cat6, 11 EOB
  private final val TokEob = 11
  private val CoefTree = Array(
    -12, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5,
    14, 16, -6, -7, 18, 20, -8, -9, -10, -11)
  // cat extra-bit probabilities + bases (RFC §13.2 Pcat tables,
  // enc/dec-shared)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)

  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // the explicit-profile working probs the synthesizer transmits
  // in-stream (classes 0-6) — varied by (plane, band, ctx, position) so
  // a context-bookkeeping slip on either side desyncs the round trip
  // instead of cancelling; the update FLAGS themselves are always coded
  // with the RFC §13.4 coeff_update_probs (r18: the gate retirement)
  private def workProb(p: Int, b: Int, c: Int, l: Int): Int =
    (p * 31 + b * 13 + c * 41 + l * 11) % 200 + 28

  // ------------------------------------------------- boolean decoder

  /** RFC 6386 §7.3, verbatim semantics. Reads past `end` return zero
    * bytes and count as overread — the caller refuses on any. */
  private final class BoolDec(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var value = 0L
    private var range = 255L
    private var bitCount = 0
    var overread = 0
    private def nextByte(): Long =
      if (pos < end) { val v = (b(pos) & 0xFF).toLong; pos += 1; v }
      else { overread += 1; 0L }
    value = (nextByte() << 8) | nextByte()

    def bool(prob: Int): Int = {
      val split = 1L + (((range - 1L) * prob) >> 8)
      val big = split << 8
      var ret = 0
      if (value >= big) { ret = 1; range -= split; value -= big }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    def tree(t: Array[Int], probs: Array[Int], from: Int): Int = {
      var i = from
      while (true) {
        val nxt = t(i + bool(probs(i >> 1)))
        if (nxt <= 0) return -nxt - 1
        i = nxt
      }
      -1 // unreachable
    }
  }

  // ------------------------------------------------- boolean encoder

  /** RFC 6386 §7.2 bool encoder (bottom/range, carry walking back
    * through emitted bytes); correctness is proven by round trip
    * through the normative decoder above (Vp8Spec fuzz). */
  private final class BoolEnc {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255L
    private var bottom = 0L
    private var bitCount = 24

    private def carry(): Unit = {
      var x = out.length - 1
      while (x >= 0 && out(x) == 0xFF.toByte) { out(x) = 0; x -= 1 }
      if (x >= 0) out(x) = (out(x) + 1).toByte
      // x < 0 is unreachable: the interval cannot cross a boundary
      // before any byte has been emitted
    }

    def bool(prob: Int, v: Int): Unit = {
      val split = 1L + (((range - 1L) * prob) >> 8)
      if (v != 0) { bottom += split; range -= split } else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xFF).toByte
          bottom &= 0xFFFFFF
          bitCount = 8
        }
      }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    def tree(t: Array[Int], probs: Array[Int], leaf: Int, from: Int): Unit = {
      // DFS for the path (trees are tiny), then emit it
      def path(i: Int): List[Int] = {
        var res: List[Int] = null
        var bit = 0
        while (bit < 2 && res == null) {
          val nxt = t(i + bit)
          if (nxt <= 0) { if (-nxt - 1 == leaf) res = List(bit) }
          else { val sub = path(nxt); if (sub != null) res = bit :: sub }
          bit += 1
        }
        res
      }
      var i = from
      var p = path(from)
      while (p != null && p.nonEmpty) {
        bool(probs(i >> 1), p.head)
        val nxt = t(i + p.head)
        p = p.tail
        i = nxt
      }
    }

    def flush(): Array[Byte] = {
      var i = 0
      while (i < 32) {
        if ((bottom & 0x80000000L) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xFF).toByte
          bottom &= 0xFFFFFF
          bitCount = 8
        }
        i += 1
      }
      out.toArray
    }
  }

  /** Spec hook: encode bools with per-bit probs (§7.2), decode back
    * (§7.3) — the encoder's correctness proof is this round trip
    * through the normative decoder. */
  private[graft] def boolRoundTrip(probs: Array[Int],
                                   bits: Array[Int]): Array[Int] = {
    val e = new BoolEnc
    var i = 0
    while (i < bits.length) { e.bool(probs(i), bits(i)); i += 1 }
    val buf = e.flush()
    val d = new BoolDec(buf, 0, buf.length)
    Array.tabulate(bits.length)(j => d.bool(probs(j)))
  }

  /** Spec hook: decode `n` bools at a fixed prob from raw bytes (the
    * hand-vector pin for the normative decoder). */
  private[graft] def boolDecode(bytes: Array[Byte], prob: Int,
                                n: Int): Array[Int] = {
    val d = new BoolDec(bytes, 0, bytes.length)
    Array.tabulate(n)(_ => d.bool(prob))
  }

  // ------------------------------------------------------ inverse WHT

  /** vp8_short_inv_walsh4x4: Y2 (dequantized) → the 16 Y-block DCs. */
  private def iwht(in: Array[Int], outv: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i); val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i); val d1 = in(i) - in(12 + i)
      tmp(i) = a1 + b1; tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1; tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3); val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2); val d1 = tmp(o) - tmp(o + 3)
      outv(o) = (a1 + b1 + 3) >> 3; outv(o + 1) = (c1 + d1 + 3) >> 3
      outv(o + 2) = (a1 - b1 + 3) >> 3; outv(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** vp8_short_idct4x4llm (RFC 6386 §14.3): columns without shift,
    * rows with `(v + 4) >> 3`; the two fixed multipliers are
    * sinpi8sqrt2 = 35468 and cospi8sqrt2minus1 = 20091, both >> 16. */
  private def idct4x4(in: Array[Int], outv: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      var t1 = (in(4 + i) * 35468) >> 16
      var t2 = in(12 + i) + ((in(12 + i) * 20091) >> 16)
      val c1 = t1 - t2
      t1 = in(4 + i) + ((in(4 + i) * 20091) >> 16)
      t2 = (in(12 + i) * 35468) >> 16
      val d1 = t1 + t2
      tmp(i) = a1 + d1; tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1; tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      var t1 = (tmp(o + 1) * 35468) >> 16
      var t2 = tmp(o + 3) + ((tmp(o + 3) * 20091) >> 16)
      val c1 = t1 - t2
      t1 = tmp(o + 1) + ((tmp(o + 1) * 20091) >> 16)
      t2 = (tmp(o + 3) * 35468) >> 16
      val d1 = t1 + t2
      outv(o) = (a1 + d1 + 4) >> 3; outv(o + 3) = (a1 - d1 + 4) >> 3
      outv(o + 1) = (b1 + c1 + 4) >> 3; outv(o + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  // ------------------------------------------------------ token walk

  /** Decode one 4×4 coefficient block into `coefs` (natural order,
    * pre-dequant). Returns the nonzero flag, or -1 on refusal. */
  private def decodeBlock(bd: BoolDec, work: Array[Array[Array[Array[Int]]]],
                          plane: Int, ctx0: Int, firstIdx: Int,
                          coefs: Array[Int]): Int = {
    var i = firstIdx
    var ctx = ctx0
    var prevZero = false
    var nz = 0
    while (i < 16) {
      val probs = work(plane)(CoeffBands(i))(ctx)
      val tok = bd.tree(CoefTree, probs, if (prevZero) 2 else 0)
      if (tok == TokEob) return nz
      if (tok == 0) { prevZero = true; ctx = 0; i += 1 }
      else {
        var v = 0
        if (tok <= 4) v = tok
        else {
          val cat = tok - 5
          val cp = CatProbs(cat)
          var ext = 0
          var k = 0
          while (k < cp.length) { ext = (ext << 1) | bd.bool(cp(k)); k += 1 }
          v = CatBase(cat) + ext
        }
        val neg = bd.bool(128) == 1
        coefs(Zigzag(i)) = if (neg) -v else v
        prevZero = false
        ctx = if (v > 1) 2 else 1
        nz = 1
        i += 1
      }
    }
    nz
  }

  /** Encoder mirror of [[decodeBlock]]: same contexts, same trees. */
  private def encodeBlock(be: BoolEnc, work: Array[Array[Array[Array[Int]]]],
                          plane: Int, ctx0: Int, firstIdx: Int,
                          coefs: Array[Int]): Int = {
    var last = firstIdx - 1 // last zigzag index holding a nonzero
    var i = firstIdx
    while (i < 16) { if (coefs(Zigzag(i)) != 0) last = i; i += 1 }
    var ctx = ctx0
    var prevZero = false
    var nz = 0
    i = firstIdx
    while (i <= last) {
      val v = coefs(Zigzag(i))
      val a = math.abs(v)
      val probs = work(plane)(CoeffBands(i))(ctx)
      val from = if (prevZero) 2 else 0
      if (a == 0) { be.tree(CoefTree, probs, 0, from); prevZero = true; ctx = 0 }
      else {
        val tok =
          if (a <= 4) a
          else if (a <= 6) 5 else if (a <= 10) 6 else if (a <= 18) 7
          else if (a <= 34) 8 else if (a <= 66) 9 else 10
        be.tree(CoefTree, probs, tok, from)
        if (tok >= 5) {
          val cat = tok - 5
          val cp = CatProbs(cat)
          val ext = a - CatBase(cat)
          var k = 0
          while (k < cp.length) {
            be.bool(cp(k), (ext >> (cp.length - 1 - k)) & 1); k += 1
          }
        }
        be.bool(128, if (v < 0) 1 else 0)
        prevZero = false
        ctx = if (a > 1) 2 else 1
        nz = 1
      }
      i += 1
    }
    if (last < 15) { // end of block
      val probs = work(plane)(CoeffBands(last + 1))(ctx)
      be.tree(CoefTree, probs, TokEob, if (prevZero) 2 else 0)
    }
    nz
  }

  /** RFC §13.4: walk all 1056 token probabilities; each update flag is
    * coded with coeff_update_probs, a set flag is followed by the 8-bit
    * replacement, a clear flag keeps the §13.5 default. The r17 honesty
    * gate (which refused any clear flag) is retired per VERDICT r17
    * task #1 — see the provenance note on [[Vp8Tables]]. */
  private def buildWork(fromStream: BoolDec): Array[Array[Array[Array[Int]]]] = {
    val w = Array.ofDim[Int](4, 8, 3, 11)
    var p = 0
    while (p < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var l = 0
          while (l < 11) {
            w(p)(b)(c)(l) =
              if (fromStream.bool(Vp8Tables.CoeffUpdateProbs(p)(b)(c)(l)) == 1)
                fromStream.literal(8)
              else Vp8Tables.DefaultCoeffProbs(p)(b)(c)(l)
            l += 1
          }
          c += 1
        }
        b += 1
      }
      p += 1
    }
    w
  }

  private def profileWork(): Array[Array[Array[Array[Int]]]] = {
    val w = Array.ofDim[Int](4, 8, 3, 11)
    var p = 0
    while (p < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var l = 0
          while (l < 11) { w(p)(b)(c)(l) = workProb(p, b, c, l); l += 1 }
          c += 1
        }
        b += 1
      }
      p += 1
    }
    w
  }

  // ------------------------------------------------------ loop filter

  /** RFC 6386 §15 in-loop deblocking over the LUMA plane (chroma is
    * not reconstructed here). VP8 intra prediction reads UNFILTERED
    * neighbors, so this runs after the whole plane is reconstructed,
    * in macroblock raster order: left MB edge, inner vertical edges,
    * top MB edge, inner horizontal edges — later edges read
    * earlier-filtered pixels. Inner edges are filtered only for MBs
    * carrying coefficients or coded B_PRED (`mbInner`); MB edges are
    * always filtered. All arithmetic is the spec's signed-8-bit
    * pipeline on (pixel − 128) with saturating clamps; Vp8Spec pins
    * each primitive with paper vectors and the q196 filter class pins
    * the exact filtered step profile. */
  private def loopFilterLuma(plane: Array[Int], wp: Int, mbW: Int,
                             mbH: Int, mbLevels: Array[Int],
                             sharpness: Int,
                             simple: Boolean,
                             mbInner: Array[Boolean]): Unit = {
    // limits derive from the PROCESSED MB's level (per-MB since
    // segmentation / lf deltas; an MB at level 0 filters none of its
    // edges) — recomputed per MB below
    var interior = 1
    var mbLimit = 0
    var subLimit = 0
    var hevT = 0
    def setLimits(level: Int): Unit = {
      interior = level
      if (sharpness > 0) {
        interior = level >> (if (sharpness > 4) 2 else 1)
        if (interior > 9 - sharpness) interior = 9 - sharpness
      }
      if (interior < 1) interior = 1
      mbLimit = (level + 2) * 2 + interior
      subLimit = level * 2 + interior
      hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
    }

    @inline def cs(v: Int): Int =
      if (v < -128) -128 else if (v > 127) 127 else v
    @inline def cu(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    // one 8-pixel segment across an edge: pixels at i-4d .. i+3d
    // (d = 1 for a vertical edge, wp for a horizontal one)
    def filterSeg(i: Int, d: Int, mbEdge: Boolean): Unit = {
      val p3 = plane(i - 4 * d); val p2 = plane(i - 3 * d)
      val p1 = plane(i - 2 * d); val p0 = plane(i - d)
      val q0 = plane(i); val q1 = plane(i + d)
      val q2 = plane(i + 2 * d); val q3 = plane(i + 3 * d)
      val edgeLimit = if (mbEdge) mbLimit else subLimit
      if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 > edgeLimit) return
      val sp1 = p1 - 128; val sp0 = p0 - 128
      val sq0 = q0 - 128; val sq1 = q1 - 128
      // §15.2 common adjustment: p0/q0 via the 4/3-rounded taps
      def commonAdjust(useOuter: Boolean): Int = {
        val a = cs((if (useOuter) cs(sp1 - sq1) else 0) + 3 * (sq0 - sp0))
        val f1 = cs(a + 4) >> 3
        val f2 = cs(a + 3) >> 3
        plane(i) = cu(sq0 - f1 + 128)
        plane(i - d) = cu(sp0 + f2 + 128)
        f1
      }
      if (simple) { commonAdjust(true); return }
      if (math.abs(p3 - p2) > interior || math.abs(p2 - p1) > interior ||
        math.abs(p1 - p0) > interior || math.abs(q1 - q0) > interior ||
        math.abs(q2 - q1) > interior || math.abs(q3 - q2) > interior) return
      val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
      if (mbEdge && !hev) {
        // §15.3 macroblock-edge filter: the 27/18/9 tap triple moves
        // three pixels each side, symmetrically (sum-preserving)
        val sp2 = p2 - 128; val sq2 = q2 - 128
        val w = cs(cs(sp1 - sq1) + 3 * (sq0 - sp0))
        val a0 = cs((27 * w + 63) >> 7)
        plane(i) = cu(sq0 - a0 + 128)
        plane(i - d) = cu(sp0 + a0 + 128)
        val a1 = cs((18 * w + 63) >> 7)
        plane(i + d) = cu(sq1 - a1 + 128)
        plane(i - 2 * d) = cu(sp1 + a1 + 128)
        val a2 = cs((9 * w + 63) >> 7)
        plane(i + 2 * d) = cu(sq2 - a2 + 128)
        plane(i - 3 * d) = cu(sp2 + a2 + 128)
      } else {
        // sub-block edges (and MB edges under high edge variance):
        // outer taps only when hev; p1/q1 nudged by (F1+1)>>1 when not
        val f1 = commonAdjust(hev)
        if (!hev) {
          val a3 = (f1 + 1) >> 1
          plane(i + d) = cu(sq1 - a3 + 128)
          plane(i - 2 * d) = cu(sp1 + a3 + 128)
        }
      }
    }

    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        val x0 = mx * 16; val y0 = my * 16
        val level = mbLevels(my * mbW + mx)
        if (level == 0) { mx += 1 }
        else {
        setLimits(level)
        val inner = mbInner(my * mbW + mx)
        if (mx > 0) {
          var y = 0
          while (y < 16) {
            filterSeg((y0 + y) * wp + x0, 1, mbEdge = true); y += 1
          }
        }
        if (inner) {
          var dx = 4
          while (dx <= 12) {
            var y = 0
            while (y < 16) {
              filterSeg((y0 + y) * wp + x0 + dx, 1, mbEdge = false); y += 1
            }
            dx += 4
          }
        }
        if (my > 0) {
          var x = 0
          while (x < 16) {
            filterSeg(y0 * wp + x0 + x, wp, mbEdge = true); x += 1
          }
        }
        if (inner) {
          var dy = 4
          while (dy <= 12) {
            var x = 0
            while (x < 16) {
              filterSeg((y0 + dy) * wp + x0 + x, wp, mbEdge = false); x += 1
            }
            dy += 4
          }
        }
        mx += 1
        }
      }
      my += 1
    }
  }

  /** 16×16-mode macroblock reconstruction (RFC §12.2 edge rules:
    * missing above row 127, missing left column 129, corner follows
    * the above rule first): predict, then add the per-4×4 residuals
    * (Y2-supplied DCs in `wht`, AC dequant at `qYAc`, DC fast path on
    * AC-free blocks). Shared by the token path and the r18 skip path
    * (where `wht` and `yBlocks` arrive zeroed). */
  private def reconstruct16(plane: Array[Int], wp: Int, x0: Int, y0: Int,
                            my: Int, mx: Int, mode: Int,
                            wht: Array[Int], yBlocks: Array[Array[Int]],
                            qYAc: Int): Unit = {
    // ---- 16x16 intra prediction from reconstructed neighbors.
    // Edge rules (RFC §12.2): a missing above row reads 127, a
    // missing left column 129; the above-left corner follows the
    // above row when that row is missing, else the left rule.
    
    val above16 = new Array[Int](16)
    val left16 = new Array[Int](16)
    var j = 0
    while (j < 16) {
      above16(j) = if (my > 0) plane((y0 - 1) * wp + x0 + j) else 127
      left16(j) = if (mx > 0) plane((y0 + j) * wp + x0 - 1) else 129
      j += 1
    }
    val aboveLeft =
      if (my == 0) 127
      else if (mx == 0) 129
      else plane((y0 - 1) * wp + x0 - 1)
    val pred = new Array[Int](256)
    mode match {
      case 0 => // DC: availability-dependent average
        var dc = 128
        if (my > 0 && mx > 0) {
          var su = 0; j = 0
          while (j < 16) { su += above16(j) + left16(j); j += 1 }
          dc = (su + 16) >> 5
        } else if (mx > 0) {
          var su = 0; j = 0
          while (j < 16) { su += left16(j); j += 1 }
          dc = (su + 8) >> 4
        } else if (my > 0) {
          var su = 0; j = 0
          while (j < 16) { su += above16(j); j += 1 }
          dc = (su + 8) >> 4
        }
        java.util.Arrays.fill(pred, dc)
      case 1 => // V: copy the above row down
        var r = 0
        while (r < 16) {
          System.arraycopy(above16, 0, pred, r * 16, 16); r += 1
        }
      case 2 => // H: copy the left column across
        var r = 0
        while (r < 16) {
          java.util.Arrays.fill(pred, r * 16, r * 16 + 16, left16(r))
          r += 1
        }
      case _ => // TM: clamp(left + above - aboveLeft)
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            val v = left16(r) + above16(c) - aboveLeft
            pred(r * 16 + c) =
              if (v < 0) 0 else if (v > 255) 255 else v
            c += 1
          }
          r += 1
        }
    }
    // ---- residual add per 4x4 block (DC fast path when AC-free)
    val residual = new Array[Int](16)
    var sb = 0
    while (sb < 16) {
      val blk = yBlocks(sb)
      var anyAc = false
      var i2 = 1
      while (i2 < 16) { if (blk(i2) != 0) anyAc = true; i2 += 1 }
      val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
      if (!anyAc) {
        val resid = (wht(sb) + 4) >> 3
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val pi = (by + r) * 16 + bx + c
            val v0 = pred(pi) + resid
            plane((y0 + by + r) * wp + x0 + bx + c) =
              if (v0 < 0) 0 else if (v0 > 255) 255 else v0
            c += 1
          }
          r += 1
        }
      } else {
        i2 = 1
        while (i2 < 16) { blk(i2) *= qYAc; i2 += 1 }
        blk(0) = wht(sb)
        idct4x4(blk, residual)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val pi = (by + r) * 16 + bx + c
            val v0 = pred(pi) + residual(r * 4 + c)
            plane((y0 + by + r) * wp + x0 + bx + c) =
              if (v0 < 0) 0 else if (v0 > 255) 255 else v0
            c += 1
          }
          r += 1
        }
      }
      sb += 1
    }
  }

  /** RFC §12.2-12.3 sub-block intra reconstruction for a B_PRED
    * macroblock: predict each 4×4 sub-block from ALREADY-reconstructed
    * neighbors in raster order within the MB, add its residual (own
    * DC — plane-3 tokens), write back so later sub-blocks see the
    * result. Edge rules: a missing above row reads 127, a missing left
    * column 129, the above-left corner follows the above rule first.
    * The above-right four pixels come from the row directly above for
    * interior columns (their up-right sub-block is already
    * reconstructed); for the RIGHTMOST column they come from the row
    * above the MACROBLOCK — the next MB is not yet decoded, the
    * normative VP8 substitution — replicating that row's last pixel
    * past the frame edge. */
  private def reconstructBPred(plane: Array[Int], wp: Int, x0: Int,
                               y0: Int, sub: Array[Int],
                               yBlocks: Array[Array[Int]],
                               qYDc: Int, qYAc: Int): Unit = {
    @inline def avg2(x: Int, y: Int) = (x + y + 1) >> 1
    @inline def avg3(x: Int, y: Int, z: Int) = (x + 2 * y + z + 2) >> 2
    val a = new Array[Int](8)
    val l = new Array[Int](4)
    val pred = new Array[Int](16)
    val residual = new Array[Int](16)
    var sb = 0
    while (sb < 16) {
      val ci = sb & 3; val ri = sb >> 2
      val px = x0 + ci * 4; val py = y0 + ri * 4
      var k = 0
      while (k < 4) {
        a(k) = if (py > 0) plane((py - 1) * wp + px + k) else 127
        l(k) = if (px > 0) plane((py + k) * wp + px - 1) else 129
        k += 1
      }
      while (k < 8) { // above-right (see the method doc)
        a(k) =
          if (py == 0) 127
          else if (ci == 3) {
            if (y0 > 0) {
              val xx = x0 + 16 + (k - 4)
              if (xx < wp) plane((y0 - 1) * wp + xx)
              else plane((y0 - 1) * wp + wp - 1)
            } else 127
          } else plane((py - 1) * wp + px + k)
        k += 1
      }
      val p0 =
        if (py == 0) 127
        else if (px == 0) 129
        else plane((py - 1) * wp + px - 1)
      sub(sb) match {
        case 0 => // B_DC: average of the four above + four left
          var s = 4
          k = 0
          while (k < 4) { s += a(k) + l(k); k += 1 }
          java.util.Arrays.fill(pred, s >> 3)
        case 1 => // B_TM: clamp(left + above - corner) per pixel
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val v = l(r) + a(c) - p0
              pred(r * 4 + c) = if (v < 0) 0 else if (v > 255) 255 else v
              c += 1
            }
            r += 1
          }
        case 2 => // B_VE: 3-tap-filtered above row, constant down columns
          val row = Array(avg3(p0, a(0), a(1)), avg3(a(0), a(1), a(2)),
            avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
          var r = 0
          while (r < 4) { System.arraycopy(row, 0, pred, r * 4, 4); r += 1 }
        case 3 => // B_HE: 3-tap-filtered left column, constant across
          val colv = Array(avg3(p0, l(0), l(1)), avg3(l(0), l(1), l(2)),
            avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
          var r = 0
          while (r < 4) {
            java.util.Arrays.fill(pred, r * 4, r * 4 + 4, colv(r)); r += 1
          }
        case 4 => // B_LD: down-left diagonal over above + above-right
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val i2 = r + c
              pred(r * 4 + c) =
                if (i2 < 6) avg3(a(i2), a(i2 + 1), a(i2 + 2))
                else avg3(a(6), a(7), a(7))
              c += 1
            }
            r += 1
          }
        case 5 => // B_RD: down-right over the L3..L0,P,A0..A3 edge
          val e9 = Array(l(3), l(2), l(1), l(0), p0, a(0), a(1), a(2), a(3))
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val i2 = c - r + 3
              pred(r * 4 + c) = avg3(e9(i2), e9(i2 + 1), e9(i2 + 2))
              c += 1
            }
            r += 1
          }
        case 6 => // B_VR: vertical-right
          val r0 = Array(avg2(p0, a(0)), avg2(a(0), a(1)),
            avg2(a(1), a(2)), avg2(a(2), a(3)))
          val r1 = Array(avg3(l(0), p0, a(0)), avg3(p0, a(0), a(1)),
            avg3(a(0), a(1), a(2)), avg3(a(1), a(2), a(3)))
          val grid = Array(
            r0(0), r0(1), r0(2), r0(3),
            r1(0), r1(1), r1(2), r1(3),
            avg3(l(1), l(0), p0), r0(0), r0(1), r0(2),
            avg3(l(2), l(1), l(0)), r1(0), r1(1), r1(2))
          System.arraycopy(grid, 0, pred, 0, 16)
        case 7 => // B_VL: vertical-left
          val r0 = Array(avg2(a(0), a(1)), avg2(a(1), a(2)),
            avg2(a(2), a(3)), avg2(a(3), a(4)))
          val r1 = Array(avg3(a(0), a(1), a(2)), avg3(a(1), a(2), a(3)),
            avg3(a(2), a(3), a(4)), avg3(a(3), a(4), a(5)))
          val grid = Array(
            r0(0), r0(1), r0(2), r0(3),
            r1(0), r1(1), r1(2), r1(3),
            r0(1), r0(2), r0(3), avg3(a(4), a(5), a(6)),
            r1(1), r1(2), r1(3), avg3(a(5), a(6), a(7)))
          System.arraycopy(grid, 0, pred, 0, 16)
        case 8 => // B_HD: horizontal-down
          val g00 = avg2(l(0), p0); val g01 = avg3(l(0), p0, a(0))
          val g10 = avg2(l(1), l(0)); val g11 = avg3(l(1), l(0), p0)
          val g20 = avg2(l(2), l(1)); val g21 = avg3(l(2), l(1), l(0))
          val grid = Array(
            g00, g01, avg3(p0, a(0), a(1)), avg3(a(0), a(1), a(2)),
            g10, g11, g00, g01,
            g20, g21, g10, g11,
            avg2(l(3), l(2)), avg3(l(3), l(2), l(1)), g20, g21)
          System.arraycopy(grid, 0, pred, 0, 16)
        case _ => // B_HU: horizontal-up
          val g02 = avg2(l(1), l(2)); val g03 = avg3(l(1), l(2), l(3))
          val g12 = avg2(l(2), l(3)); val g13 = avg3(l(2), l(3), l(3))
          val grid = Array(
            avg2(l(0), l(1)), avg3(l(0), l(1), l(2)), g02, g03,
            g02, g03, g12, g13,
            g12, g13, l(3), l(3),
            l(3), l(3), l(3), l(3))
          System.arraycopy(grid, 0, pred, 0, 16)
      }
      // residual add: own DC at qYDc, ACs at qYAc, DC-only fast path
      val blk = yBlocks(sb)
      var anyAc = false
      var i2 = 1
      while (i2 < 16) { if (blk(i2) != 0) anyAc = true; i2 += 1 }
      if (!anyAc) {
        val resid = (blk(0) * qYDc + 4) >> 3
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val v0 = pred(r * 4 + c) + resid
            plane((py + r) * wp + px + c) =
              if (v0 < 0) 0 else if (v0 > 255) 255 else v0
            c += 1
          }
          r += 1
        }
      } else {
        blk(0) *= qYDc
        i2 = 1
        while (i2 < 16) { blk(i2) *= qYAc; i2 += 1 }
        idct4x4(blk, residual)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val v0 = pred(r * 4 + c) + residual(r * 4 + c)
            plane((py + r) * wp + px + c) =
              if (v0 < 0) 0 else if (v0 > 255) 255 else v0
            c += 1
          }
          r += 1
        }
      }
      sb += 1
    }
  }

  // ----------------------------------------------------------- decode

  /** Decode the luma plane of a "VP8 " chunk payload at [off, end).
    * Returns (width, height, luma) or null on any out-of-profile
    * construct. */
  private[graft] def decodeLuma(b: Array[Byte], off: Int,
                                end: Int): (Int, Int, Array[Int]) = {
    if (b == null || end - off < 10 || end > b.length) return null
    val tag = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16)
    if ((tag & 1) != 0) return null // inter frame: out of scope
    if (((tag >> 1) & 7) != 0) return null // version 0 only
    if (((tag >> 4) & 1) != 1) return null // not shown: out of scope
    val firstPartSize = tag >>> 5
    if (b(off + 3) != 0x9D.toByte || b(off + 4) != 0x01 ||
      b(off + 5) != 0x2A.toByte) return null
    val w = ((b(off + 6) & 0xFF) | ((b(off + 7) & 0xFF) << 8)) & 0x3FFF
    val h = ((b(off + 8) & 0xFF) | ((b(off + 9) & 0xFF) << 8)) & 0x3FFF
    if (w == 0 || h == 0 || w.toLong * h > MaxPixels) return null
    val p1 = off + 10
    if (firstPartSize <= 0 || p1 + firstPartSize > end) return null

    val bd = new BoolDec(b, p1, p1 + firstPartSize)
    if (bd.literal(1) != 0) return null // color space must be 0
    bd.literal(1) // clamping type: either is fine (we clamp)
    // SEGMENTATION (r18): per-MB segment ids select per-segment quant
    // and filter levels — libwebp's default output uses 4 segments
    // with quantizer deltas, so organic frames need this path
    val segEnabled = bd.literal(1) == 1
    var segUpdateMap = false
    var segAbs = false
    val segTreeProbs = Array(255, 255, 255)
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    if (segEnabled) {
      segUpdateMap = bd.literal(1) == 1
      val updateData = bd.literal(1) == 1
      if (updateData) {
        segAbs = bd.literal(1) == 1
        var i = 0
        while (i < 8) { // 4 quantizer (7-bit) then 4 lf (6-bit) deltas
          if (bd.literal(1) == 1) {
            val m = bd.literal(if (i < 4) 7 else 6)
            val v = if (bd.literal(1) == 1) -m else m
            if (i < 4) segQ(i) = v else segLf(i - 4) = v
          }
          i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.literal(1) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    val filterSimple = bd.literal(1) == 1 // filter type (1 = simple)
    val filterLevel = bd.literal(6) // r18: the §15 loop filter runs
    val sharpness = bd.literal(3)
    // loop-filter adjustments (r18): reference deltas (intra = index
    // 0 on key frames) and mode deltas (B_PRED = index 0) shift the
    // per-MB filter level; un-updated deltas are zero for a
    // single-frame decode
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.literal(1) == 1) {
      lfDeltaEnabled = true
      if (bd.literal(1) == 1) { // update flag
        var i = 0
        while (i < 8) {
          if (bd.literal(1) == 1) {
            val m = bd.literal(6)
            val v = if (bd.literal(1) == 1) -m else m
            if (i < 4) refLfDelta(i) = v else modeLfDelta(i - 4) = v
          }
          i += 1
        }
      }
    }
    // token partitions (r18): 1/2/4/8; sizes ride a 3-byte-LE table
    // between the first partition and the token data
    val nParts = 1 << bd.literal(2)
    // quant header (r18): any base index; the five deltas are
    // sign-magnitude 4-bit offsets clamped into the table
    val yAcQi = bd.literal(7)
    def qDelta(): Int =
      if (bd.literal(1) == 1) {
        val mag = bd.literal(4)
        if (bd.literal(1) == 1) -mag else mag
      } else 0
    val yDcDelta = qDelta()
    val y2DcDelta = qDelta()
    val y2AcDelta = qDelta()
    qDelta() // uvdc: chroma is parse-only, dequant unused
    qDelta() // uvac
    def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v
    // per-SEGMENT dequant sets (segment 0 == the frame values when
    // segmentation is off or the feature data carries zeros)
    val segQYDc = new Array[Int](4)
    val segQYAc = new Array[Int](4)
    val segQY2Dc = new Array[Int](4)
    val segQY2Ac = new Array[Int](4)
    var sgi = 0
    while (sgi < 4) {
      val base =
        if (!segEnabled) yAcQi
        else if (segAbs) segQ(sgi)
        else yAcQi + segQ(sgi)
      val q = clampQ(base)
      segQYDc(sgi) = Vp8Tables.DcQLookup(clampQ(q + yDcDelta))
      segQYAc(sgi) = Vp8Tables.AcQLookup(q)
      segQY2Dc(sgi) = Vp8Tables.DcQLookup(clampQ(q + y2DcDelta)) * 2
      segQY2Ac(sgi) = {
        val v = Vp8Tables.AcQLookup(clampQ(q + y2AcDelta)) * 155 / 100
        if (v < 8) 8 else v
      }
      sgi += 1
    }
    bd.literal(1) // refresh_entropy_probs
    val work = buildWork(bd)
    // mb_no_coeff_skip (r18): when enabled, each MB carries a skip
    // flag coded with prob_skip_false; a skipped MB has NO tokens in
    // the stream and resets its nonzero contexts (§13.3)
    val skipEnabled = bd.literal(1) == 1
    val probSkipFalse = if (skipEnabled) bd.literal(8) else 0

    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val ymodes = new Array[Int](mbW * mbH)
    val bmodes = new Array[Array[Int]](mbW * mbH) // non-null for B_PRED
    val segIds = new Array[Int](mbW * mbH) // 0 when the map is absent
    val skips = new Array[Boolean](mbW * mbH)
    // kf_bmode contexts chain across MBs: the above row's bottom
    // sub-modes per MB column, the left MB's right column per row
    val aboveSub = Array.ofDim[Int](mbW, 4) // B_DC outside the frame
    var mi = 0
    var myM = 0
    while (myM < mbH) {
      val leftSub = new Array[Int](4)
      var mxM = 0
      while (mxM < mbW) {
        if (segUpdateMap) // segment id precedes the mode (RFC §10)
          segIds(mi) = bd.tree(SegTree, segTreeProbs, 0)
        if (skipEnabled) skips(mi) = bd.bool(probSkipFalse) == 1
        val ym = bd.tree(KfYTree, KfYProb, 0)
        ymodes(mi) = ym
        if (ym == 4) { // B_PRED: 16 sub-modes, each contexted above/left
          val sub = new Array[Int](16)
          var sb = 0
          while (sb < 16) {
            val ci = sb & 3; val ri = sb >> 2
            val a = if (ri == 0) aboveSub(mxM)(ci) else sub(sb - 4)
            val l = if (ci == 0) leftSub(ri) else sub(sb - 1)
            sub(sb) = bd.tree(BModeTree, Vp8Tables.KfBModeProb(a)(l), 0)
            sb += 1
          }
          bmodes(mi) = sub
          var k = 0
          while (k < 4) {
            aboveSub(mxM)(k) = sub(12 + k)
            leftSub(k) = sub(k * 4 + 3)
            k += 1
          }
        } else {
          val implied = ImpliedSub(ym)
          java.util.Arrays.fill(aboveSub(mxM), implied)
          java.util.Arrays.fill(leftSub, implied)
        }
        bd.tree(UvTree, KfUvProb, 0) // chroma mode: parse-only (luma stats)
        mi += 1
        mxM += 1
      }
      myM += 1
    }
    if (bd.overread > 0) return null

    // token partitions: MB row r reads partition r % nParts; the size
    // table ((nParts-1) 3-byte-LE entries) sits after the first
    // partition, the partitions follow back-to-back
    val tableOff = p1 + firstPartSize
    val tableLen = (nParts - 1) * 3
    if (tableOff + tableLen > end) return null
    val tds = new Array[BoolDec](nParts)
    var pOff = tableOff + tableLen
    var pi = 0
    while (pi < nParts) {
      val pLen =
        if (pi < nParts - 1) {
          (b(tableOff + pi * 3) & 0xFF) |
            ((b(tableOff + pi * 3 + 1) & 0xFF) << 8) |
            ((b(tableOff + pi * 3 + 2) & 0xFF) << 16)
        } else end - pOff
      if (pLen < 0 || pOff + pLen > end) return null
      tds(pi) = new BoolDec(b, pOff, pOff + pLen)
      pOff += pLen
      pi += 1
    }
    val wp = mbW * 16
    val plane = new Array[Int](wp * mbH * 16)
    val aboveY2 = new Array[Int](mbW)
    val aboveY = Array.ofDim[Int](mbW, 4)
    val aboveU = Array.ofDim[Int](mbW, 2)
    val aboveV = Array.ofDim[Int](mbW, 2)
    val leftY = new Array[Int](4)
    val leftU = new Array[Int](2)
    val leftV = new Array[Int](2)
    val coefs = new Array[Int](16)
    val wht = new Array[Int](16)
    // per-MB flag for the loop filter's inner-edge rule: inner edges
    // are filtered only when the MB carries coefficients or is B_PRED
    val mbInner = new Array[Boolean](mbW * mbH)
    var my = 0
    while (my < mbH) {
      val td = tds(my % nParts)
      var leftY2 = 0
      java.util.Arrays.fill(leftY, 0)
      java.util.Arrays.fill(leftU, 0)
      java.util.Arrays.fill(leftV, 0)
      var mx = 0
      while (mx < mbW) {
        val isB = bmodes(my * mbW + mx) != null
        val skip = skips(my * mbW + mx)
        val seg = segIds(my * mbW + mx)
        val qYDc = segQYDc(seg); val qYAc = segQYAc(seg)
        val qY2Dc = segQY2Dc(seg); val qY2Ac = segQY2Ac(seg)
        var anyCoeff = false
        // a SKIPPED MB reads no tokens: residuals are zero and the
        // nonzero contexts reset (Y2 only when the MB has one)
        if (skip) {
          var i = 0
          while (i < 4) { aboveY(mx)(i) = 0; leftY(i) = 0; i += 1 }
          i = 0
          while (i < 2) {
            aboveU(mx)(i) = 0; leftU(i) = 0
            aboveV(mx)(i) = 0; leftV(i) = 0
            i += 1
          }
          if (!isB) { aboveY2(mx) = 0; leftY2 = 0 }
          java.util.Arrays.fill(wht, 0)
          val yBlocks = Array.ofDim[Int](16, 16)
          mbInner(my * mbW + mx) = isB
          val x0 = mx * 16; val y0 = my * 16
          if (isB) {
            reconstructBPred(plane, wp, x0, y0,
              bmodes(my * mbW + mx), yBlocks, qYDc, qYAc)
          } else {
            reconstruct16(plane, wp, x0, y0, my, mx,
              ymodes(my * mbW + mx), wht, yBlocks, qYAc)
          }
          mx += 1
        } else {
        // Y2 — B_PRED macroblocks have none, and their above/left Y2
        // nonzero contexts are left UNTOUCHED (RFC §13.3: only
        // macroblocks with a Y2 block update them)
        if (!isB) {
          java.util.Arrays.fill(coefs, 0)
          val nz2 = decodeBlock(td, work, 1, aboveY2(mx) + leftY2, 0, coefs)
          if (nz2 < 0) return null
          aboveY2(mx) = nz2; leftY2 = nz2
          if (nz2 != 0) anyCoeff = true
          var i = 0
          while (i < 16) {
            coefs(i) *= (if (i == 0) qY2Dc else qY2Ac); i += 1
          }
          iwht(coefs, wht)
        }
        // 16 Y blocks: 16x16 modes take the DC through Y2 (plane 0,
        // coefficients from 1); B_PRED blocks carry their own DC
        // (plane 3, coefficients from 0)
        val yBlocks = Array.ofDim[Int](16, 16)
        var sb = 0
        while (sb < 16) {
          val colI = sb & 3; val rowI = sb >> 2
          val ynz = decodeBlock(td, work, if (isB) 3 else 0,
            aboveY(mx)(colI) + leftY(rowI), if (isB) 0 else 1, yBlocks(sb))
          if (ynz < 0) return null
          aboveY(mx)(colI) = ynz; leftY(rowI) = ynz
          if (ynz != 0) anyCoeff = true
          sb += 1
        }
        // chroma: parsed for bitstream sync, not reconstructed
        val scratch = new Array[Int](16)
        sb = 0
        while (sb < 8) {
          val (above, left) = if (sb < 4) (aboveU, leftU) else (aboveV, leftV)
          val ci = sb & 3
          val colI = ci & 1; val rowI = ci >> 1
          java.util.Arrays.fill(scratch, 0)
          val cnz = decodeBlock(td, work, 2,
            above(mx)(colI) + left(rowI), 0, scratch)
          if (cnz < 0) return null
          above(mx)(colI) = cnz; left(rowI) = cnz
          if (cnz != 0) anyCoeff = true
          sb += 1
        }
        mbInner(my * mbW + mx) = anyCoeff || isB
        val x0 = mx * 16; val y0 = my * 16
        if (isB) {
          reconstructBPred(plane, wp, x0, y0,
            bmodes(my * mbW + mx), yBlocks, qYDc, qYAc)
        } else {
          reconstruct16(plane, wp, x0, y0, my, mx,
            ymodes(my * mbW + mx), wht, yBlocks, qYAc)
        }
        mx += 1
        } // end non-skip branch
      }
      my += 1
    }
    pi = 0
    while (pi < nParts) { if (tds(pi).overread > 0) return null; pi += 1 }
    // §15 loop filter (r18): VP8 intra prediction reads UNFILTERED
    // neighbors, so the filter runs over the completed luma plane.
    // Per-MB level = segment level, adjusted by the intra reference
    // delta and (for B_PRED) the mode delta, clamped to 0..63.
    val mbLevels = new Array[Int](mbW * mbH)
    var lfi = 0
    var anyLf = false
    while (lfi < mbW * mbH) {
      var lf =
        if (!segEnabled) filterLevel
        else if (segAbs) segLf(segIds(lfi))
        else filterLevel + segLf(segIds(lfi))
      if (lfDeltaEnabled) {
        lf += refLfDelta(0) // key frame: always the INTRA reference
        if (bmodes(lfi) != null) lf += modeLfDelta(0) // B_PRED delta
      }
      if (lf < 0) lf = 0
      if (lf > 63) lf = 63
      mbLevels(lfi) = lf
      if (lf > 0) anyLf = true
      lfi += 1
    }
    if (anyLf)
      loopFilterLuma(plane, wp, mbW, mbH, mbLevels, sharpness,
        filterSimple, mbInner)
    // crop to the declared dims
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { luma(y * w + x) = plane(y * wp + x); x += 1 }
      y += 1
    }
    (w, h, luma)
  }

  /** Packed luma stats (min | max<<8 | sum<<16 — the shared contract)
    * for a "VP8 " chunk payload, or the NULL marker. */
  def lumaStats(b: Array[Byte], off: Int, end: Int): Long = {
    val r = decodeLuma(b, off, end)
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

  /** Per-MB luma-offset residue map (shared with the q196 oracle):
    * k ∈ [-4..-1] ∪ [1..4], never 0. */
  private def kOf(seed: Long, j: Int): Int = {
    val m = (((seed * 7 + j * 13) % 8) + 8) % 8
    if (m < 4) (m - 4).toInt else (m - 3).toInt
  }

  /** Encode one key frame: `y2dc`/`y2ac1` hold each MB's Y2 tokens
    * (position 0 and 1); `ymodes` optionally picks per-MB 16x16 modes
    * (0 DC / 1 V / 2 H / 3 TM, default DC); `yAc` optionally supplies
    * per-block quantized Y coefficients (natural order) keyed by
    * (mbRow, mbCol, subBlock) — positions 1..15 for 16x16 MBs,
    * 0..15 for B_PRED MBs (they carry their own DC). `useDefaults`
    * emits every update flag CLEAR so the decoder reads the RFC §13.5
    * default tables — the path every organic encoder's frame takes.
    * `bmodes` (indexed [mbRow*mbW+mbCol], null entries = not B_PRED)
    * switches an MB to B_PRED with the given 16 sub-modes, coded
    * through the kf_bmode context chain like the decoder reads them. */
  private[graft] def encodeFrame(w: Int, h: Int, y2dc: Array[Array[Int]],
                                 y2ac1: Array[Array[Int]],
                                 ymodes: Array[Array[Int]] = null,
                                 yAc: (Int, Int, Int) => Array[Int] = null,
                                 useDefaults: Boolean = false,
                                 bmodes: Array[Array[Int]] = null,
                                 qi: Int = 0,
                                 nParts: Int = 1,
                                 filterLevel: Int = 0,
                                 sharpness: Int = 0,
                                 filterSimple: Boolean = false,
                                 segQiAbs: Array[Int] = null,
                                 segMap: Array[Int] = null,
                                 lfDeltaOn: Boolean = false,
                                 lfDeltaIntra: Int = 0,
                                 skipMap: Array[Int] = null): Array[Byte] = {
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val work =
      if (useDefaults) Vp8Tables.DefaultCoeffProbs else profileWork()
    // the first partition depends ONLY on (mb count, mode plan, table
    // mode): for a query synthesizing 60k frames of a handful of
    // shapes, the ~1.2 KB probability walk re-encoded per row dominated
    // q196's cost — memo it per thread by shape+modes
    val modeKey =
      (if (useDefaults) "D|" else "E|") +
        s"q$qi,p$nParts,f$filterLevel,s$sharpness,t$filterSimple," +
        s"g${if (segQiAbs == null) "-" else segQiAbs.mkString(",")}:" +
        s"${if (segMap == null) "-" else segMap.mkString(",")}," +
        s"d$lfDeltaOn:$lfDeltaIntra," +
        s"k${if (skipMap == null) "-" else skipMap.mkString(",")}|" +
        (if (ymodes == null) "dc"
        else ymodes.map(_.mkString(",")).mkString(";")) +
        (if (bmodes == null) ""
        else "|B" + bmodes.map(b => if (b == null) "." else b.mkString(","))
          .mkString(";"))
    val p1Key = (mbW, mbH, modeKey)
    val memo = part1Memo.get()
    val cached = memo.get(p1Key)
    if (cached != null) return assemble(w, h, cached, encodePart2(
      mbW, mbH, work, y2dc, y2ac1, yAc, bmodes, nParts, skipMap), nParts)
    val e1 = new BoolEnc
    e1.literal(0, 1) // color space
    e1.literal(0, 1) // clamping
    if (segQiAbs == null) e1.literal(0, 1) // segmentation off
    else {
      // segmentation on, map updated, ABSOLUTE per-segment quant;
      // flat 128 tree probs keep the map cheap and unbiased
      e1.literal(1, 1) // enabled
      e1.literal(1, 1) // update map
      e1.literal(1, 1) // update feature data
      e1.literal(1, 1) // absolute mode
      var i = 0
      while (i < 4) { // quantizer values
        if (i < segQiAbs.length) {
          e1.literal(1, 1); e1.literal(segQiAbs(i), 7); e1.literal(0, 1)
        } else e1.literal(0, 1)
        i += 1
      }
      i = 0
      while (i < 4) { e1.literal(0, 1); i += 1 } // lf values absent (0)
      i = 0
      while (i < 3) { e1.literal(1, 1); e1.literal(128, 8); i += 1 }
    }
    e1.literal(if (filterSimple) 1 else 0, 1) // filter type
    e1.literal(filterLevel, 6)
    e1.literal(sharpness, 3)
    if (!lfDeltaOn) e1.literal(0, 1) // lf deltas off
    else {
      e1.literal(1, 1) // enabled
      e1.literal(1, 1) // update
      // ref delta 0 (INTRA) carries the value; the other 7 are absent
      e1.literal(1, 1)
      e1.literal(math.abs(lfDeltaIntra), 6)
      e1.literal(if (lfDeltaIntra < 0) 1 else 0, 1)
      var i = 0
      while (i < 7) { e1.literal(0, 1); i += 1 }
    }
    e1.literal(Integer.numberOfTrailingZeros(nParts), 2) // partitions
    e1.literal(qi, 7) // y_ac_qi
    var k = 0
    while (k < 5) { e1.literal(0, 1); k += 1 } // no quant deltas
    e1.literal(1, 1) // refresh entropy probs
    var p = 0
    while (p < 4) {
      var bn = 0
      while (bn < 8) {
        var c = 0
        while (c < 3) {
          var l = 0
          while (l < 11) {
            // the FLAG is always coded with the RFC update prob; the
            // explicit profile then transmits its working prob
            if (useDefaults)
              e1.bool(Vp8Tables.CoeffUpdateProbs(p)(bn)(c)(l), 0)
            else {
              e1.bool(Vp8Tables.CoeffUpdateProbs(p)(bn)(c)(l), 1)
              e1.literal(workProb(p, bn, c, l), 8)
            }
            l += 1
          }
          c += 1
        }
        bn += 1
      }
      p += 1
    }
    if (skipMap == null) e1.literal(0, 1) // mb_no_coeff_skip off
    else { e1.literal(1, 1); e1.literal(128, 8) } // prob_skip_false
    // mode emission mirrors the decoder's kf_bmode context chain
    val aboveSub = Array.ofDim[Int](mbW, 4)
    var mi = 0
    var myM = 0
    while (myM < mbH) {
      val leftSub = new Array[Int](4)
      var mxM = 0
      while (mxM < mbW) {
        if (segMap != null)
          e1.tree(SegTree, Array(128, 128, 128), segMap(mi), 0)
        if (skipMap != null) e1.bool(128, skipMap(mi))
        val sub = if (bmodes == null) null else bmodes(mi)
        if (sub != null) {
          e1.tree(KfYTree, KfYProb, 4, 0) // B_PRED
          var sb = 0
          while (sb < 16) {
            val ci = sb & 3; val ri = sb >> 2
            val a = if (ri == 0) aboveSub(mxM)(ci) else sub(sb - 4)
            val l = if (ci == 0) leftSub(ri) else sub(sb - 1)
            e1.tree(BModeTree, Vp8Tables.KfBModeProb(a)(l), sub(sb), 0)
            sb += 1
          }
          var k2 = 0
          while (k2 < 4) {
            aboveSub(mxM)(k2) = sub(12 + k2)
            leftSub(k2) = sub(k2 * 4 + 3)
            k2 += 1
          }
        } else {
          val ym = if (ymodes == null) ModeDc else ymodes(myM)(mxM)
          e1.tree(KfYTree, KfYProb, ym, 0)
          val implied = ImpliedSub(ym)
          java.util.Arrays.fill(aboveSub(mxM), implied)
          java.util.Arrays.fill(leftSub, implied)
        }
        e1.tree(UvTree, KfUvProb, ModeDc, 0)
        mi += 1
        mxM += 1
      }
      myM += 1
    }
    val part1 = e1.flush()
    memo.put(p1Key, part1)
    assemble(w, h, part1, encodePart2(mbW, mbH, work, y2dc, y2ac1, yAc,
      bmodes, nParts, skipMap), nParts)
  }

  private val part1Memo =
    new ThreadLocal[java.util.HashMap[(Int, Int, String), Array[Byte]]] {
      override def initialValue() =
        new java.util.HashMap[(Int, Int, String), Array[Byte]]()
    }

  private def encodePart2(mbW: Int, mbH: Int,
                          work: Array[Array[Array[Array[Int]]]],
                          y2dc: Array[Array[Int]], y2ac1: Array[Array[Int]],
                          yAc: (Int, Int, Int) => Array[Int],
                          bmodes: Array[Array[Int]] = null,
                          nParts: Int = 1,
                          skipMap: Array[Int] = null): Array[Array[Byte]] = {
    // one token encoder per partition; MB row r writes partition
    // r % nParts (the bitstream is split, the nonzero CONTEXTS are
    // frame-global — shared arrays below, both sides)
    val encs = Array.fill(nParts)(new BoolEnc)
    val aboveY2 = new Array[Int](mbW)
    val aboveY = Array.ofDim[Int](mbW, 4)
    val aboveU = Array.ofDim[Int](mbW, 2)
    val aboveV = Array.ofDim[Int](mbW, 2)
    val coefs = new Array[Int](16)
    var my = 0
    while (my < mbH) {
      val e2 = encs(my % nParts)
      var leftY2 = 0
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var mx = 0
      while (mx < mbW) {
        val isB = bmodes != null && bmodes(my * mbW + mx) != null
        if (skipMap != null && skipMap(my * mbW + mx) == 1) {
          // skipped MB: no tokens on the wire; contexts reset exactly
          // as the decoder resets them
          var i = 0
          while (i < 4) { aboveY(mx)(i) = 0; leftY(i) = 0; i += 1 }
          i = 0
          while (i < 2) {
            aboveU(mx)(i) = 0; leftU(i) = 0
            aboveV(mx)(i) = 0; leftV(i) = 0
            i += 1
          }
          if (!isB) { aboveY2(mx) = 0; leftY2 = 0 }
          mx += 1
        } else {
        if (!isB) { // B_PRED MBs have no Y2 and leave its contexts alone
          java.util.Arrays.fill(coefs, 0)
          coefs(0) = y2dc(my)(mx)
          coefs(1) = y2ac1(my)(mx)
          val nz2 = encodeBlock(e2, work, 1, aboveY2(mx) + leftY2, 0, coefs)
          aboveY2(mx) = nz2; leftY2 = nz2
        }
        var sb = 0
        while (sb < 16) { // Y blocks: coefficients when supplied, else EOB
          val colI = sb & 3; val rowI = sb >> 2
          java.util.Arrays.fill(coefs, 0)
          if (yAc != null) {
            val ac = yAc(my, mx, sb)
            if (ac != null) {
              var i2 = if (isB) 0 else 1 // B_PRED carries its own DC
              while (i2 < 16) { coefs(i2) = ac(i2); i2 += 1 }
            }
          }
          val ynz = encodeBlock(e2, work, if (isB) 3 else 0,
            aboveY(mx)(colI) + leftY(rowI), if (isB) 0 else 1, coefs)
          aboveY(mx)(colI) = ynz; leftY(rowI) = ynz
          sb += 1
        }
        java.util.Arrays.fill(coefs, 0)
        sb = 0
        while (sb < 8) { // chroma: all-zero blocks
          val (above, left) = if (sb < 4) (aboveU, leftU) else (aboveV, leftV)
          val ci = sb & 3
          val colI = ci & 1; val rowI = ci >> 1
          encodeBlock(e2, work, 2, above(mx)(colI) + left(rowI), 0, coefs)
          above(mx)(colI) = 0; left(rowI) = 0
          sb += 1
        }
        mx += 1
        } // end non-skip branch
      }
      my += 1
    }
    encs.map(_.flush())
  }

  private def assemble(w: Int, h: Int, part1: Array[Byte],
                       parts: Array[Array[Byte]],
                       nParts: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      part1.length + parts.map(_.length).sum + 16 + nParts * 3)
    val tag = (part1.length << 5) | (1 << 4) | 0 // keyframe, ver 0, shown
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
    out.write((tag >> 16) & 0xFF)
    out.write(0x9D); out.write(0x01); out.write(0x2A)
    out.write(w & 0xFF); out.write((w >> 8) & 0x3F)
    out.write(h & 0xFF); out.write((h >> 8) & 0x3F)
    out.write(part1, 0, part1.length)
    // all but the last partition announce their size (3-byte LE)
    var i = 0
    while (i < nParts - 1) {
      val n = parts(i).length
      out.write(n & 0xFF); out.write((n >> 8) & 0xFF)
      out.write((n >> 16) & 0xFF)
      i += 1
    }
    parts.foreach(pt => out.write(pt, 0, pt.length))
    WebpPixelEval.wrapLossyRiff(out.toByteArray)
  }

  /** Synthesize a q196 residue class (%9):
    * 0 → a 64×16 four-MB strip, per-MB DC offsets chained through
    *     left-only DC_PRED (cumulative luma);
    * 1 → a 32×32 2×2 grid drilling the corner `(a+b+1)>>1` average;
    * 2 → one MB with a position-1 Y2 coefficient: the full inverse
    *     WHT splits the MB into left/right luma halves;
    * 5 → a 16×32 V-chain: the lower MB V_PREDs the upper's bottom row
    *     (the r17 mode widening, oracle-backed);
    * 6 → a 32×16 H-chain: the right MB H_PREDs the left's right column;
    * 7 → class 0's DC chain coded over the RFC-DEFAULT tables (all
    *     update flags clear — the path organic frames take; r18);
    * 8 → an 8×8 B_PRED MB, all sub-modes B_TM, DC residuals in the
    *     four visible sub-blocks: the TM corner rule chains them
    *     cumulatively (l11 = 129 + k0 + k1 + k2 + k3; r18);
    * 9 → a 16×32 vertical DC chain at QUANT INDEX 4 over TWO token
    *     partitions (row 0 → partition 0, row 1 → partition 1): the
    *     §14.1 dequant lookup and the partition-table walk both sit
    *     on the oracle path (tokens 4k dequantize through
    *     dc_qlookup[4]*2 = 16 back to per-MB offsets k; r18);
    * 10 → a 32×16 left-chained DC step under LOOP FILTER level 10
    *     (normal type): the §15 MB-edge filter smooths the step —
    *     sum-preserving and min/max-conservative by construction, so
    *     the oracle algebra is unchanged while Vp8Spec pins the exact
    *     filtered column profile (r18);
    * 11 → a 32×16 SEGMENTATION drill: per-MB segment ids map the two
    *     MBs to ABSOLUTE quant indices {4, 0}, so each MB's tokens
    *     (4k0 / 8k1) dequantize back to offsets k only through its
    *     own segment's §14.1 lookup — a decoder that drops the
    *     segment map or its quant misses the oracle (r18);
    * 12 → a 32×16 mb_no_coeff_skip drill: MB0 carries tokens, MB1 is
    *     SKIPPED (no tokens on the wire, contexts reset) and DC-chains
    *     to MB0's value — a decoder that reads tokens for the skipped
    *     MB desyncs the partition (r18);
    * 3 → class 0 truncated after the dims (meta parses, stats refuse);
    * 4 → a first partition truncated inside the probability walk
    *     (formerly the honesty-gate drill; the walk overreads and
    *     refuses, dims still parse).
    */
  def synth(seed: Long, cls: Long): Array[Byte] = (cls % 13).toInt match {
    case 0 =>
      val ks = Array(Array.tabulate(4)(j => 8 * kOf(seed, j)))
      encodeFrame(64, 16, ks, Array(Array(0, 0, 0, 0)))
    case 7 =>
      val ks = Array(Array.tabulate(4)(j => 8 * kOf(seed, j)))
      encodeFrame(64, 16, ks, Array(Array(0, 0, 0, 0)), useDefaults = true)
    case 8 =>
      // visible sub-blocks of the 8×8 crop are 0,1 (top) and 4,5
      // (second row); DC coefficient 2k dequantizes to 8k and the
      // DC-only path lands (8k+4)>>3 = k on the pixels
      val dcOf = Map(0 -> kOf(seed, 0), 1 -> kOf(seed, 1),
        4 -> kOf(seed, 2), 5 -> kOf(seed, 3))
      encodeFrame(8, 8, Array(Array(0)), Array(Array(0)),
        bmodes = Array(Array.fill(16)(1)), // all B_TM
        yAc = (_, _, sb) => dcOf.get(sb) match {
          case Some(k) =>
            val c = new Array[Int](16); c(0) = 2 * k; c
          case None => null
        })
    case 1 =>
      val ks = Array.tabulate(2, 2)((r, c) => 8 * kOf(seed, r * 2 + c))
      encodeFrame(32, 32, ks, Array(Array(0, 0), Array(0, 0)))
    case 2 =>
      val s0 = sOf(seed); val s1 = sOf(seed / 4)
      encodeFrame(16, 16, Array(Array(8 * s0)), Array(Array(8 * s1)))
    case 5 =>
      encodeFrame(16, 32,
        Array(Array(8 * kOf(seed, 0)), Array(8 * kOf(seed, 1))),
        Array(Array(0), Array(0)), ymodes = Array(Array(0), Array(1)))
    case 9 =>
      // tokens 4k at qi=4: qY2Dc = dc_qlookup[4]*2 = 16 -> iwht 8k ->
      // per-MB offset k, the same c0/vh luma algebra — a decoder that
      // ignores the quant index (or misreads the partition table)
      // lands on (k+1)/2-style offsets and misses the oracle
      encodeFrame(16, 32,
        Array(Array(4 * kOf(seed, 0)), Array(4 * kOf(seed, 1))),
        Array(Array(0), Array(0)), qi = 4, nParts = 2)
    case 10 =>
      encodeFrame(32, 16,
        Array(Array(8 * kOf(seed, 0), 8 * kOf(seed, 1))),
        Array(Array(0, 0)), filterLevel = 10)
    case 11 =>
      encodeFrame(32, 16,
        Array(Array(4 * kOf(seed, 0), 8 * kOf(seed, 1))),
        Array(Array(0, 0)), segQiAbs = Array(4, 0), segMap = Array(0, 1))
    case 12 =>
      encodeFrame(32, 16,
        Array(Array(8 * kOf(seed, 0), 0)),
        Array(Array(0, 0)), skipMap = Array(0, 1))
    case 6 =>
      encodeFrame(32, 16,
        Array(Array(8 * kOf(seed, 0), 8 * kOf(seed, 1))),
        Array(Array(0, 0)), ymodes = Array(Array(0, 2)))
    case 3 =>
      val whole = synth(seed, 0)
      java.util.Arrays.copyOf(whole, math.min(34, whole.length))
    case _ =>
      // a first partition that ENDS inside the probability walk: the
      // decoder's 1056-flag read overruns the partition bound and the
      // overread check refuses while the dims still parse. (Until r18
      // this class doubled as the honesty-gate drill; the gate is
      // retired, the truncation refusal remains.)
      val e = new BoolEnc
      e.literal(0, 1); e.literal(0, 1); e.literal(0, 1); e.literal(0, 1)
      e.literal(0, 6); e.literal(0, 3); e.literal(0, 1); e.literal(0, 2)
      e.literal(0, 7)
      var k = 0
      while (k < 5) { e.literal(0, 1); k += 1 }
      e.literal(1, 1)
      e.bool(Vp8Tables.CoeffUpdateProbs(0)(0)(0)(0), 0) // then: nothing
      val part1 = e.flush()
      val out = new java.io.ByteArrayOutputStream(part1.length + 16)
      val tag = (part1.length << 5) | (1 << 4)
      out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
      out.write((tag >> 16) & 0xFF)
      out.write(0x9D); out.write(0x01); out.write(0x2A)
      out.write(16); out.write(0); out.write(16); out.write(0)
      out.write(part1, 0, part1.length)
      WebpPixelEval.wrapLossyRiff(out.toByteArray)
  }

  /** Class-2 half-split residue map (shared with the q196 oracle):
    * s ∈ {-2, -1, 1, 2}. */
  private def sOf(seed: Long): Int = (((seed % 4) + 4) % 4).toInt match {
    case 0 => -2; case 1 => -1; case 2 => 1; case _ => 2
  }
}

/** `(seed, cls) -> binary`: a synthesized lossy-VP8 WebP file per the
  * q196 residue classes (see [[Vp8Eval.synth]]). */
case class Vp8Synth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vp8_synth"

  override protected def nullSafeEval(seed: Any, cls: Any): Any =
    Vp8Eval.synth(seed.asInstanceOf[Long], cls.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c) => s"graft.functions.Vp8Eval.synth($s, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Vp8Synth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the lossy-VP8 kernels. */
object Vp8Ops {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def vp8Synth(seed: Column, cls: Column): Column =
    ColumnBridge.column(Vp8Synth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(cls.cast("long"))))
}
