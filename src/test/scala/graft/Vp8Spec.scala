package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Vp8Eval, WebpPixelEval}

/** The lossy-VP8 profile (DC + luma AC + all four 16x16 modes + the
  * r18 RFC default tables and B_PRED 4x4 intra), drilled the family
  * way. The RFC 6386 §7.3 boolean decoder is the NORMATIVE side: hand
  * vectors pin it against arithmetic done on paper; the §7.2 encoder
  * is then proven by round trip through it. No reference VP8 decoder
  * exists in this container, so the transcribed §13.4/§13.5/§11.4
  * tables carry a fidelity caveat ([[graft.functions.Vp8Tables]]) —
  * every pixel assertion here is table-independent algebra (the same
  * the q196 oracle replays), so a table-INDEXING or context slip
  * still fails these tests even though a table-VALUE slip cannot.
  */
class Vp8Spec extends AnyFunSuite {

  private val NoStats = java.lang.Long.MIN_VALUE

  // replicate the kernel's residue maps (shared with the q196 oracle)
  private def kOf(seed: Long, j: Int): Int = {
    val m = (((seed * 7 + j * 13) % 8) + 8) % 8
    if (m < 4) (m - 4).toInt else (m - 3).toInt
  }
  private def sOf(seed: Long): Int = (((seed % 4) + 4) % 4).toInt match {
    case 0 => -2; case 1 => -1; case 2 => 1; case _ => 2
  }

  private def lumaOfFrame(file: Array[Byte]): (Int, Int, Array[Int]) =
    lumaOf(file)

  private def lumaOf(file: Array[Byte]): (Int, Int, Array[Int]) = {
    // walk the RIFF to the VP8 chunk the way lumaStats does
    assert(new String(file, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(file, 8, 4, "US-ASCII") === "WEBP")
    assert(new String(file, 12, 4, "US-ASCII") === "VP8 ")
    val size = (file(16) & 0xFF) | ((file(17) & 0xFF) << 8) |
      ((file(18) & 0xFF) << 16) | ((file(19) & 0xFF) << 24)
    Vp8Eval.decodeLuma(file, 20, math.min(20 + size, file.length))
  }

  test("bool decoder hand vector: 0x80 0x00 at prob 128 is 1 then 0s") {
    // paper walk: range 255, value 0x8000; split = 1+((254*128)>>8) =
    // 128, SPLIT = 0x8000 -> bit 1, value 0, range 127 -> renorm;
    // every following split exceeds value 0 -> bits 0
    val bits = Vp8Eval.boolDecode(Array(0x80.toByte, 0x00), 128, 8)
    assert(bits.toList === List(1, 0, 0, 0, 0, 0, 0, 0))
  }

  test("bool decoder hand vector: 0xFF bytes at prob 1 are all 1") {
    // split = 1 + ((range-1)*1 >> 8) = 1, SPLIT = 256; value stays
    // far above -> every bit decodes 1 without renormalizing
    val bits = Vp8Eval.boolDecode(
      Array.fill(4)(0xFF.toByte), 1, 8)
    assert(bits.toList === List(1, 1, 1, 1, 1, 1, 1, 1))
  }

  test("bool decoder hand vector: zeros at prob 255 are all 0") {
    // split = 1 + ((range-1)*255 >> 8) ~= range, value 0 < SPLIT
    val bits = Vp8Eval.boolDecode(Array.fill(4)(0x00.toByte), 255, 8)
    assert(bits.toList === List(0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("encoder round trip: thousands of random bool/prob pairs") {
    val rnd = new java.util.Random(0xB001L)
    (0 until 20).foreach { trial =>
      val n = 50 + rnd.nextInt(4000)
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val bits = Array.fill(n)(rnd.nextInt(2))
      val back = Vp8Eval.boolRoundTrip(probs, bits)
      assert(back.toList === bits.toList, s"trial $trial n=$n")
    }
    // the carry path: long runs of likely-1 bits at high prob force
    // 0xFF output bytes whose increment must walk backward
    val probs = Array.fill(3000)(254)
    val bits = Array.fill(3000)(1)
    assert(Vp8Eval.boolRoundTrip(probs, bits).toList === bits.toList)
  }

  test("class 0 strip: four MBs chain cumulative luma through DC_PRED") {
    val seed = 11L
    val file = Vp8Eval.synth(seed, 0)
    val (w, h, px) = lumaOf(file)
    assert(w === 64 && h === 16)
    // the exact per-MB grid: L0 = 128+k0, Lj = L(j-1)+kj (left-only
    // DC prediction is the left column's average = the MB's constant)
    var expect = 128
    (0 until 4).foreach { j =>
      expect += kOf(seed, j)
      (0 until 16).foreach { y =>
        (0 until 16).foreach { x =>
          assert(px(y * 64 + j * 16 + x) === expect, s"mb $j px ($x,$y)")
        }
      }
    }
  }

  test("class 1 grid: the corner MB averages above and left neighbors") {
    val seed = 7L
    val file = Vp8Eval.synth(seed, 1)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 32)
    val l00 = 128 + kOf(seed, 0)
    val l01 = l00 + kOf(seed, 1)
    val l10 = l00 + kOf(seed, 2)
    val l11 = ((l01 + l10 + 1) >> 1) + kOf(seed, 3)
    assert(px(0) === l00)
    assert(px(16) === l01)
    assert(px(16 * 32) === l10)
    assert(px(16 * 32 + 16) === l11)
    // constant within each MB
    assert(px(5 * 32 + 5) === l00 && px(20 * 32 + 20) === l11)
  }

  test("class 2: a position-1 Y2 coefficient splits the MB through the " +
    "full inverse WHT (and exercises cat2/cat3 tokens)") {
    (0L until 16L).foreach { seed =>
      val file = Vp8Eval.synth(seed, 2)
      val (w, h, px) = lumaOf(file)
      assert(w === 16 && h === 16)
      val s0 = sOf(seed); val s1 = sOf(seed / 4)
      val left = 128 + s0 + s1
      val right = 128 + s0 - s1
      (0 until 16).foreach { y =>
        (0 until 8).foreach { x =>
          assert(px(y * 16 + x) === left, s"seed $seed L ($x,$y)")
          assert(px(y * 16 + 8 + x) === right, s"seed $seed R ($x,$y)")
        }
      }
    }
  }

  test("packed stats match the decoded plane") {
    val file = Vp8Eval.synth(3L, 0)
    val stats = WebpPixelEval.lumaStats(file)
    assert(stats !== NoStats)
    val (w, h, px) = lumaOf(file)
    assert((stats & 0xFF) === px.min)
    assert(((stats >> 8) & 0xFF) === px.max)
    assert((stats >>> 16) === px.map(_.toLong).sum)
    assert(w * h === px.length)
  }

  test("truncated class: dims survive in the shell, stats refuse") {
    val cut = Vp8Eval.synth(5L, 3)
    assert(WebpPixelEval.lumaStats(cut) === NoStats)
    // the q39 meta split: the 14-bit dims are still in the bytes
    val wdim = ((cut(26) & 0xFF) | ((cut(27) & 0xFF) << 8)) & 0x3FFF
    assert(wdim === 64)
  }

  test("a first partition truncated inside the probability walk " +
    "refuses cleanly (formerly the honesty-gate drill)") {
    val foreign = Vp8Eval.synth(9L, 4)
    assert(WebpPixelEval.lumaStats(foreign) === NoStats)
    // dims still parse (refusal is the overread check, not a crash)
    val wdim = ((foreign(26) & 0xFF) | ((foreign(27) & 0xFF) << 8)) & 0x3FFF
    assert(wdim === 16)
  }

  test("class 7: the DC chain coded over the RFC-DEFAULT tables (all " +
    "update flags clear) decodes to the same grid as class 0") {
    val seed = 23L
    val file = Vp8Eval.synth(seed, 7)
    val (w, h, px) = lumaOf(file)
    assert(w === 64 && h === 16)
    var expect = 128
    (0 until 4).foreach { j =>
      expect += kOf(seed, j)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        assert(px(y * 64 + j * 16 + x) === expect, s"mb $j px ($x,$y)")))
    }
    // the default-table stream is genuinely different machinery: it
    // must be SHORTER than the explicit-profile stream (no 1056
    // transmitted bytes) yet decode identically
    assert(file.length < Vp8Eval.synth(seed, 0).length - 800)
  }

  test("class 8: B_PRED all-TM chains the four visible sub-blocks " +
    "through the corner rule") {
    val seed = 31L
    val file = Vp8Eval.synth(seed, 8)
    val (w, h, px) = lumaOf(file)
    assert(w === 8 && h === 8)
    val l00 = 129 + kOf(seed, 0)
    val l10 = l00 + kOf(seed, 1)
    val l01 = l00 + kOf(seed, 2)
    val l11 = 129 + kOf(seed, 0) + kOf(seed, 1) + kOf(seed, 2) + kOf(seed, 3)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val want =
          if (y < 4) { if (x < 4) l00 else l10 }
          else { if (x < 4) l01 else l11 }
        assert(px(y * 8 + x) === want, s"bpred ($x,$y)")
      }
    }
  }

  test("B_PRED hand grids: all ten sub-block predictors at the edge " +
    "constants (A=127, L=129, P=127)") {
    // one 16x16 B_PRED MB, uniform sub-mode, zero residual; the
    // TOP-LEFT sub-block sees only the §12.2 edge constants, so its
    // 4x4 grid is paper arithmetic per predictor
    def grid(mode: Int): Array[Array[Int]] = {
      val file = Vp8Eval.encodeFrame(16, 16, Array(Array(0)),
        Array(Array(0)), bmodes = Array(Array.fill(16)(mode)))
      val (w, h, px) = lumaOf(file)
      assert(w === 16 && h === 16, s"mode $mode dims")
      Array.tabulate(4, 4)((r, c) => px(r * 16 + c))
    }
    def const(v: Int) = Array.fill(4, 4)(v)
    assert(grid(0).map(_.toSeq).toSeq === const(128).map(_.toSeq).toSeq, "B_DC")
    assert(grid(1).map(_.toSeq).toSeq === const(129).map(_.toSeq).toSeq, "B_TM")
    assert(grid(2).map(_.toSeq).toSeq === const(127).map(_.toSeq).toSeq, "B_VE")
    assert(grid(3).map(_.toSeq).toSeq === const(129).map(_.toSeq).toSeq, "B_HE")
    assert(grid(4).map(_.toSeq).toSeq === const(127).map(_.toSeq).toSeq, "B_LD")
    // B_RD: 128 on the diagonal (avg3(L0,P,A0)), 127 above, 129 below
    assert(grid(5).map(_.toSeq).toSeq === Array.tabulate(4, 4)((r, c) =>
      if (c > r) 127 else if (c == r) 128 else 129)
      .map(_.toSeq).toSeq, "B_RD")
    assert(grid(6).map(_.toSeq).toSeq === Array(
      Seq(127, 127, 127, 127), Seq(128, 127, 127, 127),
      Seq(129, 127, 127, 127), Seq(129, 128, 127, 127)).map(_.toSeq).toSeq,
      "B_VR")
    assert(grid(7).map(_.toSeq).toSeq === const(127).map(_.toSeq).toSeq, "B_VL")
    assert(grid(8).map(_.toSeq).toSeq === Array(
      Seq(128, 128, 127, 127), Seq(129, 129, 128, 128),
      Seq(129, 129, 129, 129), Seq(129, 129, 129, 129)).map(_.toSeq).toSeq,
      "B_HD")
    assert(grid(9).map(_.toSeq).toSeq === const(129).map(_.toSeq).toSeq, "B_HU")
  }

  test("class 9: quant index 4 over two token partitions lands the " +
    "same per-MB offsets through the dequant lookup") {
    val seed = 17L
    val file = Vp8Eval.synth(seed, 9)
    val (w, h, px) = lumaOf(file)
    assert(w === 16 && h === 32)
    // tokens 4k at qY2Dc = dc_qlookup[4]*2 = 16: iwht 8k, offset k —
    // a decoder ignoring the quant index or the partition table
    // cannot land these values
    val l0 = 128 + kOf(seed, 0)
    val l1 = l0 + kOf(seed, 1)
    (0 until 32).foreach(y => (0 until 16).foreach { x =>
      val want = if (y < 16) l0 else l1
      assert(px(y * 16 + x) === want, s"qi4 ($x,$y)")
    })
    // the partition table is real: 3-byte size entry between the
    // first partition and the token data — cutting the SECOND token
    // partition must refuse, not desync
    val cut = java.util.Arrays.copyOf(file, file.length - 2)
    assert(WebpPixelEval.lumaStats(cut) === NoStats)
  }

  test("class 10: the loop filter smooths the MB-edge step exactly " +
    "(27/18/9 taps) and preserves min/max/sum") {
    // seed 6: k0 = -2, k1 = 4 -> l0 = 126, l1 = 130, step s = 4;
    // w = 2s = 8, taps u = (27*8+63)>>7 = 2, v = (18*8+63)>>7 = 1,
    // z = (9*8+63)>>7 = 1 — paper arithmetic
    val file = Vp8Eval.synth(6L, 10)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 16)
    val want = Array.tabulate(32) {
      case x if x <= 12 => 126
      case 13 => 127 // p2 + z
      case 14 => 127 // p1 + v
      case 15 => 128 // p0 + u
      case 16 => 128 // q0 - u
      case 17 => 129 // q1 - v
      case 18 => 129 // q2 - z
      case _ => 130
    }
    (0 until 16).foreach(y => (0 until 32).foreach(x =>
      assert(px(y * 32 + x) === want(x), s"filtered ($x,$y)")))
    // the invariants the oracle leans on, verified on the decoded plane
    assert(px.min === 126 && px.max === 130)
    assert(px.sum === 16 * (13 * 126 + 127 + 127 + 128 + 128 + 129 +
      129 + 13 * 130))
    assert(px.sum === 256 * (126 + 130)) // sum-preserving filter
  }

  test("simple-type loop filter: only p0/q0 move, by the 4/3-rounded " +
    "common adjustment") {
    // same step frame, simple filter: a = c(p1-q1 + 3(q0-p0)) = 2s = 8,
    // F1 = (8+4)>>3 = 1 off q0, F2 = (8+3)>>3 = 1 onto p0
    val file = Vp8Eval.encodeFrame(32, 16,
      Array(Array(8 * kOf(6L, 0), 8 * kOf(6L, 1))), Array(Array(0, 0)),
      filterLevel = 10, filterSimple = true)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 16)
    (0 until 16).foreach { y =>
      (0 until 32).foreach { x =>
        val want =
          if (x <= 14) 126 else if (x == 15) 127
          else if (x == 16) 129 else 130
        assert(px(y * 32 + x) === want, s"simple ($x,$y)")
      }
    }
  }

  test("loop filter no-ops: a uniform plane is untouched and a " +
    "too-large step fails the edge mask") {
    // uniform frame at level 10 (MB1 DC-chains to MB0's value):
    // every difference is 0, no pixel moves
    val flat = Vp8Eval.encodeFrame(32, 16,
      Array(Array(16, 0)), Array(Array(0, 0)), filterLevel = 10)
    val (_, _, pf) = lumaOf(flat)
    assert(pf.forall(_ === 130)) // 128 + token 16 -> offset 2
    // step 16 (token 128 -> offset 16) at level 10: the mask needs
    // 2|s| + |s|/2 <= 33 and 40 fails — the step survives unfiltered
    val steep = Vp8Eval.encodeFrame(32, 16,
      Array(Array(0, 128)), Array(Array(0, 0)), filterLevel = 10)
    val (_, _, ps) = lumaOf(steep)
    (0 until 16).foreach(y => (0 until 32).foreach { x =>
      val want = if (x < 16) 128 else 144
      assert(ps(y * 32 + x) === want, s"steep ($x,$y)")
    })
  }

  test("class 11: per-MB segmentation routes each MB through its own " +
    "segment's quant lookup") {
    val seed = 29L
    val file = Vp8Eval.synth(seed, 11)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 16)
    // MB0 (segment 0, ABSOLUTE qi 4): tokens 4k0 -> offset k0 only
    // through dc_qlookup[4]*2 = 16; MB1 (segment 1, qi 0): tokens
    // 8k1 -> offset k1 through dc_qlookup[0]*2 = 8. A decoder that
    // ignores the segment map dequantizes one MB with the wrong table.
    val l0 = 128 + kOf(seed, 0)
    val l1 = l0 + kOf(seed, 1)
    (0 until 16).foreach(y => (0 until 32).foreach { x =>
      val want = if (x < 16) l0 else l1
      assert(px(y * 32 + x) === want, s"seg ($x,$y)")
    })
  }

  test("class 12: a skipped MB reads no tokens and DC-chains to its " +
    "neighbor's value") {
    val seed = 37L
    val file = Vp8Eval.synth(seed, 12)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 16)
    // MB1 is skipped: residual zero, DC prediction from MB0's right
    // column — the whole frame sits at l0; a decoder that reads
    // tokens for the skipped MB desyncs the (empty remainder of the)
    // partition instead
    val l0 = 128 + kOf(seed, 0)
    (0 until 16).foreach(y => (0 until 32).foreach(x =>
      assert(px(y * 32 + x) === l0, s"skip ($x,$y)")))
  }

  test("loop-filter deltas: the intra reference delta shifts the " +
    "effective level (to zero here), leaving the step unfiltered") {
    // the class-10 step frame filters at level 10 (previous test);
    // the SAME frame with lf deltas enabled and ref_delta[INTRA] =
    // -10 has effective level 0 — the step must survive clean
    val file = Vp8Eval.encodeFrame(32, 16,
      Array(Array(8 * kOf(6L, 0), 8 * kOf(6L, 1))), Array(Array(0, 0)),
      filterLevel = 10, lfDeltaOn = true, lfDeltaIntra = -10)
    val (w, h, px) = lumaOf(file)
    assert(w === 32 && h === 16)
    (0 until 16).foreach(y => (0 until 32).foreach { x =>
      val want = if (x < 16) 126 else 130 // seed 6: k0=-2, k1=4
      assert(px(y * 32 + x) === want, s"lfdelta ($x,$y)")
    })
  }

  test("composition: a B_PRED frame over the DEFAULT tables decodes " +
    "to the same pixels as over the explicit profile") {
    val bm = Array(Array.fill(16)(1)) // all B_TM
    val exp = Vp8Eval.encodeFrame(16, 16, Array(Array(0)), Array(Array(0)),
      bmodes = bm)
    val dft = Vp8Eval.encodeFrame(16, 16, Array(Array(0)), Array(Array(0)),
      bmodes = bm, useDefaults = true)
    val (we, he, pe) = lumaOf(exp)
    val (wd, hd, pd) = lumaOf(dft)
    assert(we === wd && he === hd)
    assert(pe.toSeq === pd.toSeq) // the tables change bits, not pixels
  }

  test("the q135 lossy shell (header-only frame) still refuses") {
    // first_part_size 0 in the shell's zero frame tag
    val docsShellTag = Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      16, 0, 16, 0, 0, 0)
    assert(Vp8Eval.decodeLuma(docsShellTag, 0, docsShellTag.length) === null)
  }

  test("fuzz: bit flips over a real frame refuse or decode, never throw") {
    // explicit, default-table, B_PRED, partitions+qi, filter,
    // segments, skip
    Seq(1L, 7L, 8L, 9L, 10L, 11L, 12L).foreach { cls =>
      val file = Vp8Eval.synth(13L, cls)
      val rnd = new java.util.Random(0x196L + cls)
      (0 until 600).foreach { k =>
        val bad = file.clone()
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
        try WebpPixelEval.lumaStats(bad)
        catch { case e: Throwable => fail(s"cls $cls threw on fuzz $k: $e") }
      }
      (0 until file.length by 7).foreach { cut =>
        val bad = java.util.Arrays.copyOf(file, cut)
        try WebpPixelEval.lumaStats(bad)
        catch { case e: Throwable => fail(s"cls $cls threw on cut $cut: $e") }
      }
    }
  }

  test("V/H/TM modes: edge constants 127/129 and neighbor chaining, " +
    "exact pixel grids") {
    // single MB, V_PRED, zero residual: no above row -> all 127
    val v0 = Vp8Eval.encodeFrame(16, 16, Array(Array(0)), Array(Array(0)),
      ymodes = Array(Array(1)))
    val (_, _, vpx) = lumaOfFrame(v0)
    assert(vpx.forall(_ === 127), "V_PRED edge must read 127")
    // single MB, H_PRED: no left column -> all 129
    val h0 = Vp8Eval.encodeFrame(16, 16, Array(Array(0)), Array(Array(0)),
      ymodes = Array(Array(2)))
    assert(lumaOfFrame(h0)._3.forall(_ === 129), "H_PRED edge must read 129")
    // single MB, TM: clamp(129 + 127 - 127) = 129 everywhere
    val t0 = Vp8Eval.encodeFrame(16, 16, Array(Array(0)), Array(Array(0)),
      ymodes = Array(Array(3)))
    assert(lumaOfFrame(t0)._3.forall(_ === 129), "TM edge algebra")
    // 16x32 (two MB rows): MB0 flat DC 128+3, MB1 V_PRED copies MB0's
    // bottom row -> the whole second MB equals 131
    val v1 = Vp8Eval.encodeFrame(16, 32,
      Array(Array(24), Array(0)), Array(Array(0), Array(0)),
      ymodes = Array(Array(0), Array(1)))
    val (_, _, px1) = lumaOfFrame(v1)
    assert(px1.take(256).forall(_ === 131))
    assert(px1.drop(256).forall(_ === 131), "V must chain the real row")
    // 32x16 (two MB cols): MB1 H_PRED copies MB0's right column
    val h1 = Vp8Eval.encodeFrame(32, 16,
      Array(Array(24, 0)), Array(Array(0, 0)),
      ymodes = Array(Array(0, 2)))
    val (_, _, px2) = lumaOfFrame(h1)
    (0 until 16).foreach { r =>
      (16 until 32).foreach { c =>
        assert(px2(r * 32 + c) === 131, s"H chain ($c,$r)")
      }
    }
  }

  test("luma AC: the full 4x4 inverse DCT reconstructs against an " +
    "RFC-transcribed reference, round-tripping through the tokens") {
    // the reference IDCT, transcribed independently from RFC 6386
    // section 14.3 prose for this spec (35468/20091 fixed-point,
    // columns unshifted, rows (v+4)>>3)
    def refIdct(in: Array[Int]): Array[Int] = {
      val t = new Array[Int](16)
      for (i <- 0 until 4) {
        val a1 = in(i) + in(8 + i); val b1 = in(i) - in(8 + i)
        val c1 = ((in(4 + i) * 35468) >> 16) -
          (in(12 + i) + ((in(12 + i) * 20091) >> 16))
        val d1 = (in(4 + i) + ((in(4 + i) * 20091) >> 16)) +
          ((in(12 + i) * 35468) >> 16)
        t(i) = a1 + d1; t(12 + i) = a1 - d1
        t(4 + i) = b1 + c1; t(8 + i) = b1 - c1
      }
      val o = new Array[Int](16)
      for (i <- 0 until 4) {
        val r = i * 4
        val a1 = t(r) + t(r + 2); val b1 = t(r) - t(r + 2)
        val c1 = ((t(r + 1) * 35468) >> 16) -
          (t(r + 3) + ((t(r + 3) * 20091) >> 16))
        val d1 = (t(r + 1) + ((t(r + 1) * 20091) >> 16)) +
          ((t(r + 3) * 35468) >> 16)
        o(r) = (a1 + d1 + 4) >> 3; o(r + 3) = (a1 - d1 + 4) >> 3
        o(r + 1) = (b1 + c1 + 4) >> 3; o(r + 2) = (b1 - c1 + 4) >> 3
      }
      o
    }
    val rnd = new java.util.Random(0xACAC1L)
    (0 until 12).foreach { trial =>
      // one MB, DC mode (flat 128 pred), random small ACs in every block
      val acs = Array.fill(16)(Array.fill(16)(0))
      acs.foreach { blk =>
        (1 until 16).foreach { i =>
          if (rnd.nextInt(3) == 0) blk(i) = rnd.nextInt(9) - 4
        }
      }
      val frame = Vp8Eval.encodeFrame(16, 16, Array(Array(0)),
        Array(Array(0)), yAc = (_, _, sb) => acs(sb))
      val (w, h, px) = lumaOfFrame(frame)
      assert(w === 16 && h === 16)
      (0 until 16).foreach { sb =>
        val deq = new Array[Int](16)
        (1 until 16).foreach(i => deq(i) = acs(sb)(i) * 4) // QYAc
        val resid = refIdct(deq)
        val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
        (0 until 4).foreach { r =>
          (0 until 4).foreach { c =>
            val want = math.max(0, math.min(255, 128 + resid(r * 4 + c)))
            assert(px((by + r) * 16 + bx + c) === want,
              s"trial $trial block $sb ($c,$r)")
          }
        }
      }
    }
  }

  test("AC + modes + Y2 compose: a many-MB frame with every mode and " +
    "random tokens decodes deterministically and inside bounds") {
    val rnd = new java.util.Random(0xC0DAL)
    val mbW = 4; val mbH = 3
    val modes = Array.fill(mbH, mbW)(rnd.nextInt(4))
    val dcs = Array.fill(mbH, mbW)(8 * (rnd.nextInt(9) - 4))
    val ac1 = Array.fill(mbH, mbW)(8 * (rnd.nextInt(3) - 1))
    val acs = Array.fill(mbH * mbW * 16)(Array.fill(16)(0))
    acs.foreach { blk =>
      (1 until 16).foreach(i => if (rnd.nextInt(4) == 0) blk(i) = rnd.nextInt(7) - 3)
    }
    val frame = Vp8Eval.encodeFrame(mbW * 16, mbH * 16, dcs, ac1,
      ymodes = modes,
      yAc = (my, mx, sb) => acs((my * mbW + mx) * 16 + sb))
    val a = lumaOfFrame(frame)
    val b = lumaOfFrame(frame)
    assert(a._3.toList === b._3.toList, "decode must be deterministic")
    assert(a._3.forall(v => v >= 0 && v <= 255))
    assert(a._1 === 64 && a._2 === 48)
    // and the file-level stats surface serves it
    assert(WebpPixelEval.lumaStats(frame) !== java.lang.Long.MIN_VALUE)
  }
}
