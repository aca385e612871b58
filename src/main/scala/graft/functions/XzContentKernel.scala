package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** xz CONTENT decode (q192) — the block-content rung q184's xz triage
  * stopped at ([[XzEval]] reads the footer/index without touching a
  * block; this decodes the blocks): scientific datasets, kernel
  * sources, and long-tail dumps ship `.xz`, and the stack under the
  * container is LZMA — the one mainstream codec that is PURE
  * ALGORITHM (adaptive binary range coding over derived contexts, no
  * constant tables), so it can be built from the public spec and
  * pinned against the reference CLI:
  *
  *  - the RANGE DECODER: 32-bit range/code pair, 11-bit adaptive
  *    probabilities (shift-5 adaptation), top-byte renormalization,
  *    the mandatory leading zero byte;
  *  - LZMA proper: the 12-state machine; literal contexts from `lc`
  *    high bits of the previous byte and `lp` position bits, with the
  *    MATCHED-literal path shadowing the byte at rep0 after a match;
  *    match/rep splits (isMatch/isRep/isRepG0..G2/isRep0Long), the
  *    choice/low/mid/high length coder, 6-bit pos-slot trees per
  *    length class, reverse bit-trees for specialized positions and
  *    the 4-bit ALIGN field, direct bits between; the four-slot rep
  *    distance history; the 0xFFFFFFFF end marker;
  *  - LZMA2: the chunk layer — control byte 0 ends, 0x01/0x02 are
  *    UNCOMPRESSED chunks (with/without dict reset), `>= 0x80` are
  *    LZMA chunks whose reset bits (state / state+props / +dict) and
  *    16-bit-be sizes frame the stream; a first chunk without a props
  *    reset is malformed;
  *  - the xz BLOCK layer: header-size/flags/filter-chain parse
  *    (exactly ONE filter, LZMA2 id 0x21, its dict-size property),
  *    header CRC32 VERIFIED, block padding, and the declared CHECK of
  *    the uncompressed content verified for real — CRC32
  *    (java.util.zip), CRC64 (ECMA-182, table built algorithmically),
  *    or SHA-256 (MessageDigest);
  *  - the stream header's flag CRC32, and the index/footer grammar
  *    cross-checked against what was ACTUALLY decoded (record count,
  *    unpadded and uncompressed sizes) — the index is the seek map, a
  *    lying one breaks random access and refuses.
  *
  * The paired synthesizer writes REAL xz streams (uncompressed LZMA2
  * chunks — a valid spelling every decoder accepts; dev-verified: the
  * xz CLI decodes every synthesis class), while the LZMA-proper path
  * is pinned by CLI-compressed fixtures in XzContentSpec. Stance:
  * q82's stop-don't-guess; 1 MiB guard.
  */
object XzContentEval {

  private val MaxOut = 1 << 20

  final case class Dec(content: Array[Byte], nBlocks: Int, checkKind: Int,
                       truncated: Int, checkOk: Int)

  // --------------------------------------------------------------- CRC64

  private val Crc64Tab: Array[Long] = {
    val poly = 0xC96C5795D7870F42L // ECMA-182, reflected
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0L) (c >>> 1) ^ poly else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def crc64(b: Array[Byte], off: Int, len: Int): Long = {
    var c = ~0L
    var i = off
    val end = off + len
    while (i < end) {
      c = (c >>> 8) ^ Crc64Tab(((c ^ b(i)) & 0xFF).toInt)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  // ------------------------------------------------------- LZMA decoder

  /** LZMA state shared across the chunks of one LZMA2 run. */
  private final class Lzma(var lc: Int, var lp: Int, var pb: Int) {
    var state = 0
    var rep0 = 0; var rep1 = 0; var rep2 = 0; var rep3 = 0
    // probability arrays (11-bit, init 1024)
    var isMatch: Array[Short] = _
    var isRep: Array[Short] = _
    var isRepG0: Array[Short] = _
    var isRepG1: Array[Short] = _
    var isRepG2: Array[Short] = _
    var isRep0Long: Array[Short] = _
    var posSlot: Array[Array[Short]] = _
    var specPos: Array[Short] = _
    var align: Array[Short] = _
    var lenChoice: Array[Short] = _
    var lenLow: Array[Array[Short]] = _
    var lenMid: Array[Array[Short]] = _
    var lenHigh: Array[Short] = _
    var repChoice: Array[Short] = _
    var repLow: Array[Array[Short]] = _
    var repMid: Array[Array[Short]] = _
    var repHigh: Array[Short] = _
    var lit: Array[Short] = _
    resetState()

    def resetState(): Unit = {
      state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
      def a(n: Int) = Array.fill[Short](n)(1024)
      isMatch = a(12 << 4); isRep = a(12); isRepG0 = a(12)
      isRepG1 = a(12); isRepG2 = a(12); isRep0Long = a(12 << 4)
      posSlot = Array.fill(4)(a(1 << 6))
      specPos = a(115); align = a(16)
      lenChoice = a(2); lenLow = Array.fill(16)(a(8))
      lenMid = Array.fill(16)(a(8)); lenHigh = a(256)
      repChoice = a(2); repLow = Array.fill(16)(a(8))
      repMid = Array.fill(16)(a(8)); repHigh = a(256)
      lit = a(0x300 << (lc + lp))
    }
  }

  /** Range decoder over one LZMA2 chunk's compressed bytes. */
  private final class Rc(b: Array[Byte], var pos: Int, val end: Int) {
    var range: Int = -1 // 0xFFFFFFFF
    var code: Int = 0
    var bad = false
    // init: one zero byte then 4 code bytes, big-endian
    if (pos >= end || b(pos) != 0) bad = true
    else {
      pos += 1
      var k = 0
      while (k < 4) {
        code = (code << 8) | (if (pos < end) b(pos) & 0xFF else { bad = true; 0 })
        pos += 1
        k += 1
      }
    }

    private def normalize(): Unit = {
      if ((range & 0xFF000000) == 0) {
        range <<= 8
        code = (code << 8) | (if (pos < end) b(pos) & 0xFF else { bad = true; 0 })
        pos += 1
      }
    }

    def bit(probs: Array[Short], i: Int): Int = {
      val p = probs(i) & 0xFFFF
      val bound = (range >>> 11) * p
      // unsigned compare of code < bound
      val r =
        if ((code ^ Int.MinValue) < (bound ^ Int.MinValue)) {
          range = bound
          probs(i) = (p + ((2048 - p) >>> 5)).toShort
          0
        } else {
          code -= bound
          range -= bound
          probs(i) = (p - (p >>> 5)).toShort
          1
        }
      normalize()
      r
    }

    def tree(probs: Array[Short], nBits: Int): Int = {
      var m = 1
      var k = 0
      while (k < nBits) { m = (m << 1) | bit(probs, m); k += 1 }
      m - (1 << nBits)
    }

    def reverseTree(probs: Array[Short], off: Int, nBits: Int): Int = {
      var m = 1
      var sym = 0
      var k = 0
      while (k < nBits) {
        val bi = bit(probs, off + m)
        m = (m << 1) | bi
        sym |= bi << k
        k += 1
      }
      sym
    }

    def directBits(n: Int): Int = {
      var res = 0
      var k = 0
      while (k < n) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31) // 0 if code >= 0 (bit 1), -1 if borrowed
        code += range & t
        res = (res << 1) + (t + 1)
        normalize()
        k += 1
      }
      res
    }

    /** The decoder must end with code == 0 on a clean end marker; for
      * size-bounded chunks the position check suffices. */
    def finishedExactly: Boolean = pos == end && !bad
  }

  private def lenDecode(rc: Rc, choice: Array[Short], low: Array[Array[Short]],
                        mid: Array[Array[Short]], high: Array[Short],
                        posState: Int): Int =
    if (rc.bit(choice, 0) == 0) rc.tree(low(posState), 3)
    else if (rc.bit(choice, 1) == 0) 8 + rc.tree(mid(posState), 3)
    else 16 + rc.tree(high, 8)

  /** Decode one LZMA chunk into `out` (size-bounded, no end marker).
    * `dictStart` bounds match distances (LZMA2 dict resets). */
  private def lzmaChunk(rc: Rc, lz: Lzma, out: OutBuf, dictStart: Int,
                        unpacked: Int): Boolean = {
    val target = out.len + unpacked
    val pbMask = (1 << lz.pb) - 1
    val lpMask = (1 << lz.lp) - 1
    while (out.len < target) {
      if (rc.bad) return false
      // pos/lp contexts count from the last dictionary reset, not from the
      // start of the shared output buffer: multi-block files (xz -T) resync
      // per block (liblzma uses dict.pos, which resets with the dictionary)
      val posState = (out.len - dictStart) & pbMask
      if (rc.bit(lz.isMatch, (lz.state << 4) + posState) == 0) {
        // literal
        val prev = if (out.len > dictStart) out.buf(out.len - 1) & 0xFF else 0
        val litState =
          (((out.len - dictStart) & lpMask) << lz.lc) + (prev >> (8 - lz.lc))
        val base = 0x300 * litState
        var symbol = 1
        if (lz.state >= 7) {
          // matched literal: shadow the byte at rep0 (a hostile rep0 —
          // negative after Int overflow, or forward — must refuse)
          val mPos = out.len - lz.rep0 - 1
          if (lz.rep0 < 0 || mPos < dictStart || mPos >= out.len) return false
          var matchByte = out.buf(mPos) & 0xFF
          var break = false
          while (!break && symbol < 0x100) {
            matchByte <<= 1
            val matchBit = (matchByte >> 8) & 1
            matchByte &= 0xFF
            val bi = rc.bit(lz.lit, base + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | bi
            if (matchBit != bi) break = true
          }
        }
        while (symbol < 0x100) symbol = (symbol << 1) | rc.bit(lz.lit, base + symbol)
        if (!out.ensure(1)) return false
        out.buf(out.len) = (symbol & 0xFF).toByte
        out.len += 1
        lz.state = if (lz.state < 4) 0 else if (lz.state < 10) lz.state - 3
          else lz.state - 6
      } else {
        var len = 0
        if (rc.bit(lz.isRep, lz.state) == 0) {
          // new match
          lz.rep3 = lz.rep2; lz.rep2 = lz.rep1; lz.rep1 = lz.rep0
          len = lenDecode(rc, lz.lenChoice, lz.lenLow, lz.lenMid, lz.lenHigh,
            posState)
          val lenState = math.min(len, 3)
          val slot = rc.tree(lz.posSlot(lenState), 6)
          if (slot < 4) lz.rep0 = slot
          else {
            val direct = (slot >> 1) - 1
            var dist = (2 | (slot & 1)) << direct
            if (slot < 14)
              dist += rc.reverseTree(lz.specPos, dist - slot - 1, direct)
            else {
              dist += rc.directBits(direct - 4) << 4
              dist += rc.reverseTree(lz.align, 0, 4)
            }
            if (dist == -1) return false // 0xFFFFFFFF end marker: not in
            lz.rep0 = dist // size-bounded LZMA2 chunks
          }
          lz.state = if (lz.state < 7) 7 else 10
        } else {
          // rep match
          if (rc.bit(lz.isRepG0, lz.state) == 0) {
            if (rc.bit(lz.isRep0Long, (lz.state << 4) + posState) == 0) {
              // short rep: one byte from rep0
              val src = out.len - lz.rep0 - 1
              if (lz.rep0 < 0 || src < dictStart || src >= out.len ||
                !out.ensure(1)) return false
              out.buf(out.len) = out.buf(src)
              out.len += 1
              lz.state = if (lz.state < 7) 9 else 11
              // continue the main loop
              len = -1
            }
          } else {
            var dist = 0
            if (rc.bit(lz.isRepG1, lz.state) == 0) dist = lz.rep1
            else {
              if (rc.bit(lz.isRepG2, lz.state) == 0) dist = lz.rep2
              else { dist = lz.rep3; lz.rep3 = lz.rep2 }
              lz.rep2 = lz.rep1
            }
            lz.rep1 = lz.rep0
            lz.rep0 = dist
          }
          if (len == 0) {
            len = lenDecode(rc, lz.repChoice, lz.repLow, lz.repMid,
              lz.repHigh, posState)
            lz.state = if (lz.state < 7) 8 else 11
          }
        }
        if (len >= 0) {
          val realLen = len + 2
          val src0 = out.len - lz.rep0 - 1
          if (lz.rep0 < 0 || src0 < dictStart || src0 >= out.len) return false
          if (!out.ensure(realLen)) return false
          var src = src0
          var k = 0
          while (k < realLen) {
            out.buf(out.len) = out.buf(src)
            out.len += 1; src += 1; k += 1
          }
        }
      }
    }
    out.len == target
  }

  private final class OutBuf {
    var buf = new Array[Byte](1024)
    var len = 0
    def ensure(n: Int): Boolean = {
      if (len + n > MaxOut) return false
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
      true
    }
  }

  /** Decode an LZMA2 chunk stream (one xz block's compressed data)
    * into `out`; returns bytes consumed or -1. */
  private def lzma2(b: Array[Byte], start: Int, limit: Int,
                    out: OutBuf): Int = {
    var i = start
    var lz: Lzma = null
    var dictStart = out.len
    var sawProps = false
    while (i < limit) {
      val ctrl = b(i) & 0xFF
      i += 1
      if (ctrl == 0) return i - start // end of LZMA2 stream
      else if (ctrl <= 2) {
        // uncompressed chunk; 1 = dict reset
        if (i + 2 > limit) return -1
        val size = (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)) + 1
        i += 2
        if (i + size > limit || !out.ensure(size)) return -1
        if (ctrl == 1) dictStart = out.len
        System.arraycopy(b, i, out.buf, out.len, size)
        out.len += size
        i += size
        if (lz != null) lz.resetState() // uncompressed chunk resets state
      } else if (ctrl >= 0x80) {
        if (i + 4 > limit) return -1
        val unpacked = (((ctrl & 0x1F) << 16) |
          ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)) + 1
        val packed = (((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)) + 1
        i += 4
        val reset = (ctrl >> 5) & 3
        if (reset >= 2) {
          if (i >= limit) return -1
          val props = b(i) & 0xFF
          i += 1
          if (props > 224) return -1
          val lc = props % 9
          val rest = props / 9
          val lp = rest % 5
          val pb = rest / 5
          if (pb > 4 || lc + lp > 4) return -1
          lz = new Lzma(lc, lp, pb)
          sawProps = true
        } else {
          if (!sawProps || lz == null) return -1 // first chunk needs props
          if (reset == 1) lz.resetState()
        }
        if (reset == 3) dictStart = out.len
        if (i + packed > limit) return -1
        val rc = new Rc(b, i, i + packed)
        if (rc.bad) return -1
        if (!lzmaChunk(rc, lz, out, dictStart, unpacked)) return -1
        if (!rc.finishedExactly) return -1
        i += packed
      } else return -1 // reserved control values
    }
    -1 // ran out without the end-of-stream control
  }

  // ------------------------------------------------------- stream walk

  /** Decode an xz buffer, following CONCATENATED streams (`cat`-joined
    * CLI outputs and the 4-byte-aligned zero stream padding the spec
    * allows between them) instead of presenting the first stream as the
    * complete content. checkKind reports the first stream's check; a
    * malformed follow-on stream or misaligned padding flags truncated,
    * keeping the content decoded so far. */
  def decode(b: Array[Byte]): Dec = {
    val first = decodeFrom(b, 0)
    if (first == null) return null
    var dec = first._1
    var end = first._2
    while (dec.truncated == 0 && end > 0 && end < b.length) {
      var p = end
      while (p < b.length && b(p) == 0) p += 1
      if ((p - end) % 4 != 0) { dec = dec.copy(truncated = 1); end = -1 }
      else if (p >= b.length) end = -1 // clean zero padding to EOF
      else {
        val nxt = decodeFrom(b, p)
        if (nxt == null ||
            dec.content.length + nxt._1.content.length > MaxOut) {
          dec = dec.copy(truncated = 1); end = -1
        } else {
          val d2 = nxt._1
          dec = Dec(dec.content ++ d2.content, dec.nBlocks + d2.nBlocks,
            dec.checkKind, d2.truncated, math.min(dec.checkOk, d2.checkOk))
          end = nxt._2
        }
      }
    }
    dec
  }

  /** One stream starting at `from`; returns null on refusal, else the
    * stream's Dec plus the position just past its footer (-1 when the
    * stream is flagged truncated — no safe resume point exists). */
  private def decodeFrom(b: Array[Byte], from: Int): (Dec, Int) = {
    if (b == null || from + 32 > b.length) return null
    val magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)
    var k = 0
    while (k < 6) { if (b(from + k) != magic(k)) return null; k += 1 }
    if (b(from + 6) != 0) return null
    val check = b(from + 7) & 0xFF
    if (check != 0x00 && check != 0x01 && check != 0x04 && check != 0x0A)
      return null
    // stream-header flag CRC32 (little-endian)
    if (crc32(b, from + 6, 2) != u32le(b, from + 8)) return null
    val checkSize = check match {
      case 0 => 0; case 1 => 4; case 4 => 8; case _ => 32
    }
    val out = new OutBuf
    var i = from + 12
    var nBlocks = 0
    var truncated = 0
    var checkOk = 1
    var endPos = -1
    val unpaddedSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val uncompSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var indexSeen = false
    while (!indexSeen && truncated == 0) {
      if (i >= b.length) { truncated = 1 }
      else if (b(i) == 0) indexSeen = true // index indicator
      else {
        // ---- block header
        val hdrStart = i
        val hdrSize = ((b(i) & 0xFF) + 1) * 4
        if (i + hdrSize > b.length) { truncated = 1 }
        else {
          if (crc32(b, hdrStart, hdrSize - 4) != u32le(b, hdrStart + hdrSize - 4))
            return if (nBlocks == 0) null else {
              truncated = 1
              (Dec(java.util.Arrays.copyOf(out.buf, out.len), nBlocks, check,
                truncated, checkOk), -1)
            }
          val flags = b(i + 1) & 0xFF
          if ((flags & 0x3C) != 0) { truncated = 1 } // reserved bits
          else if ((flags & 3) != 0) { truncated = 1 } // exactly one filter
          else {
            var p = i + 2
            // optional declared sizes (VLIs) — parsed, cross-checked
            // against the decode below via the index anyway
            var declComp = -1L
            var declUncomp = -1L
            if ((flags & 0x40) != 0) {
              val v = new VliReader(b, p)
              declComp = v.read()
              if (v.bad) truncated = 1 else p = v.pos
            }
            if (truncated == 0 && (flags & 0x80) != 0) {
              val v = new VliReader(b, p)
              declUncomp = v.read()
              if (v.bad) truncated = 1 else p = v.pos
            }
            // filter: id varint 0x21, props size varint 1, dict byte.
            // The VLIs above may legally run to the CRC boundary, so bound
            // p before the three fixed reads (a CRC-valid hostile header
            // must refuse, not throw).
            if (truncated == 1 || p + 3 > hdrStart + hdrSize - 4 ||
              (b(p) & 0xFF) != 0x21 || (b(p + 1) & 0xFF) != 1) truncated = 1
            else {
              val dictByte = b(p + 2) & 0xFF
              if (dictByte > 40) truncated = 1
              else {
                p += 3
                // header padding to hdrSize - 4 must be zeros
                var ok = true
                while (p < hdrStart + hdrSize - 4) {
                  if (b(p) != 0) ok = false
                  p += 1
                }
                if (!ok) truncated = 1
                else {
                  // ---- compressed data (LZMA2 chunks)
                  val dataStart = hdrStart + hdrSize
                  val beforeLen = out.len
                  val consumed = lzma2(b, dataStart, b.length - checkSize, out)
                  if (consumed < 0) truncated = 1
                  else {
                    val blockContentLen = out.len - beforeLen
                    // declared header sizes must measure true
                    if (declComp >= 0L && declComp != consumed.toLong)
                      truncated = 1
                    if (declUncomp >= 0L &&
                      declUncomp != blockContentLen.toLong) truncated = 1
                    // block padding to a 4-byte boundary
                    var q = dataStart + consumed
                    val unpadded = hdrSize.toLong + consumed + checkSize
                    while ((q - hdrStart) % 4 != 0 && truncated == 0) {
                      if (q >= b.length || b(q) != 0) truncated = 1
                      q += 1
                    }
                    if (truncated == 0) {
                      // ---- the declared check, verified for real
                      if (q + checkSize > b.length) truncated = 1
                      else {
                        check match {
                          case 1 =>
                            if (crc32(out.buf, beforeLen, blockContentLen) !=
                              u32le(b, q)) checkOk = 0
                          case 4 =>
                            var want = 0L
                            var z = 7
                            while (z >= 0) {
                              want = (want << 8) | (b(q + z) & 0xFFL); z -= 1
                            }
                            if (crc64(out.buf, beforeLen, blockContentLen) !=
                              want) checkOk = 0
                          case 10 =>
                            val md = java.security.MessageDigest
                              .getInstance("SHA-256")
                            md.update(out.buf, beforeLen, blockContentLen)
                            val got = md.digest()
                            var z = 0
                            var same = true
                            while (z < 32) {
                              if (got(z) != b(q + z)) same = false; z += 1
                            }
                            if (!same) checkOk = 0
                          case _ => ()
                        }
                        nBlocks += 1
                        unpaddedSizes += unpadded
                        uncompSizes += blockContentLen.toLong
                        i = q + checkSize
                      }
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
    if (nBlocks == 0) return null
    if (truncated == 0) {
      // ---- index cross-check: the seek map must match what decoded
      val indexStart = i
      val vli = new VliReader(b, i + 1)
      val cnt = vli.read()
      if (cnt != nBlocks.toLong) truncated = 1
      else {
        var r = 0
        while (r < nBlocks && truncated == 0) {
          val up = vli.read()
          val uc = vli.read()
          if (up != unpaddedSizes(r) || uc != uncompSizes(r)) truncated = 1
          r += 1
        }
      }
      if (vli.bad) truncated = 1
      if (truncated == 0) {
        // index padding + CRC32, then the FOOTER (its own CRC over
        // backward-size + flags, the flags splice check, YZ)
        var p = vli.pos
        while (truncated == 0 && (p - indexStart) % 4 != 0) {
          if (p >= b.length || b(p) != 0) truncated = 1
          p += 1
        }
        if (truncated == 0 &&
          (p + 4 > b.length ||
            crc32(b, indexStart, p - indexStart) != u32le(b, p)))
          truncated = 1
        if (truncated == 0) {
          val f = p + 4
          if (f + 12 > b.length) truncated = 1
          else {
            val backward = (p + 4 - indexStart) / 4 - 1
            if (crc32(b, f + 4, 6) != u32le(b, f)) truncated = 1
            else if (u32le(b, f + 4) != backward.toLong) truncated = 1
            else if (b(f + 8) != 0 || (b(f + 9) & 0xFF) != check)
              truncated = 1 // spliced stream flags
            else if (b(f + 10) != 'Y' || b(f + 11) != 'Z') truncated = 1
            else endPos = f + 12 // fully verified: safe resume point
          }
        }
      }
    }
    (Dec(java.util.Arrays.copyOf(out.buf, out.len), nBlocks, check,
      truncated, checkOk), endPos)
  }

  private final class VliReader(b: Array[Byte], var pos: Int) {
    var bad = false
    def read(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 62) {
        if (pos >= b.length) { bad = true; return -1L }
        val c = b(pos) & 0xFF
        pos += 1
        v |= (c & 0x7FL) << shift
        if ((c & 0x80) == 0) return v
        shift += 7
      }
      bad = true; -1L
    }
  }

  def decodeContent(b: Array[Byte]): Array[Byte] = {
    val r = decode(b)
    if (r == null) null else r.content
  }

  /** Packed verdicts: 1<<48 | truncated<<44 | checkOk<<40 |
    * checkKind<<32 | nBlocks<<24 | min(len, 2^24-1); -1 if not xz. */
  def decodeMetaPacked(b: Array[Byte]): Long = {
    val r = decode(b)
    if (r == null) return -1L
    (1L << 48) | (r.truncated.toLong << 44) | (r.checkOk.toLong << 40) |
      (r.checkKind.toLong << 32) |
      (math.min(r.nBlocks, 0xFF).toLong << 24) |
      math.min(r.content.length, (1 << 24) - 1).toLong
  }

  // ------------------------------------------------------------ encoder
  // Real xz writer: uncompressed LZMA2 chunks (a valid spelling every
  // decoder accepts), one or more blocks, genuine CRCs throughout.

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def putVli(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  /** One xz stream of `blocks` contents with the given check kind
    * (1 = CRC32, 4 = CRC64, 10 = SHA-256). */
  def write(blocks: Array[Array[Byte]], check: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0), 0, 6)
    val flags = Array[Byte](0, check.toByte)
    o.write(flags, 0, 2)
    val fc = new java.util.zip.CRC32
    fc.update(flags)
    putU32le(o, fc.getValue)
    val checkSize = check match {
      case 0 => 0; case 1 => 4; case 4 => 8; case _ => 32
    }
    val unpaddedSizes = new Array[Long](blocks.length)
    val uncompSizes = new Array[Long](blocks.length)
    var bi = 0
    while (bi < blocks.length) {
      val content = blocks(bi)
      // block header: size byte, flags 0, filter 0x21/1/dict, pad, CRC
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0) // patched below
      hdr.write(0) // flags: one filter, no size fields
      hdr.write(0x21); hdr.write(1); hdr.write(16) // LZMA2, dict 1 MiB
      while ((hdr.size() + 4) % 4 != 0) hdr.write(0)
      val hb = hdr.toByteArray
      hb(0) = (((hb.length + 4) / 4) - 1).toByte
      val hc = new java.util.zip.CRC32
      hc.update(hb)
      o.write(hb, 0, hb.length)
      putU32le(o, hc.getValue)
      // LZMA2 uncompressed chunks (<= 65536 each), first resets dict
      val data = new java.io.ByteArrayOutputStream()
      var off = 0
      var first = true
      if (content.length == 0) {
        // zero-length content still needs the end marker only
      }
      while (off < content.length) {
        val take = math.min(65536, content.length - off)
        data.write(if (first) 1 else 2)
        data.write(((take - 1) >> 8) & 0xFF)
        data.write((take - 1) & 0xFF)
        data.write(content, off, take)
        off += take
        first = false
      }
      data.write(0) // end of LZMA2
      val db = data.toByteArray
      o.write(db, 0, db.length)
      var pad = 0
      while ((hb.length + 4 + db.length + pad) % 4 != 0) { o.write(0); pad += 1 }
      check match {
        case 1 =>
          val c = new java.util.zip.CRC32
          c.update(content)
          putU32le(o, c.getValue)
        case 4 =>
          val v = crc64(content, 0, content.length)
          var z = 0
          while (z < 8) { o.write(((v >> (8 * z)) & 0xFF).toInt); z += 1 }
        case 10 =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          o.write(md.digest(content), 0, 32)
        case _ => ()
      }
      unpaddedSizes(bi) = (hb.length + 4).toLong + db.length + checkSize
      uncompSizes(bi) = content.length.toLong
      bi += 1
    }
    // index
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(0)
    putVli(idx, blocks.length.toLong)
    bi = 0
    while (bi < blocks.length) {
      putVli(idx, unpaddedSizes(bi))
      putVli(idx, uncompSizes(bi))
      bi += 1
    }
    while (idx.size() % 4 != 0) idx.write(0)
    val ib = idx.toByteArray
    o.write(ib, 0, ib.length)
    val ic = new java.util.zip.CRC32
    ic.update(ib)
    putU32le(o, ic.getValue)
    // footer: CRC32(backward+flags), backward size, flags, YZ
    val backward = (ib.length + 4) / 4 - 1
    val tail = new java.io.ByteArrayOutputStream()
    putU32le(tail, backward.toLong)
    tail.write(flags, 0, 2)
    val tb = tail.toByteArray
    val tc = new java.util.zip.CRC32
    tc.update(tb)
    putU32le(o, tc.getValue)
    o.write(tb, 0, tb.length)
    o.write('Y'); o.write('Z')
    o.toByteArray
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q192 member. `params` packs `doc_id | mode<<40`;
    * base = the family spelling. 0 -> one block, CRC32; 1 -> one
    * block, CRC64 (the table the format is known for); 2 -> TWO
    * blocks, SHA-256 (content concatenates; the index carries two
    * records); 3 -> content crossing one LZMA2 chunk boundary
    * (> 64 KiB of residue bytes), CRC32. */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val w0 = if (ws.length > 0) ws(0) else "alpha"
    val w1 = if (ws.length > 1) ws(1) else "beta"
    val baseFull = (w0 + " " + w1 + "#" + (id % 97)).getBytes(utf8)
    val base = if (baseFull.length <= 200) baseFull
    else java.util.Arrays.copyOfRange(baseFull, 0, 200)
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      parts.foreach(p => o.write(p, 0, p.length))
      o.toByteArray
    }
    mode match {
      case 1 => write(Array(base), 4)
      case 2 =>
        val tail = ("+" + w1).getBytes(utf8)
        write(Array(base, tail), 10)
      case 3 =>
        val big = new Array[Byte](70000)
        var k = 0
        while (k < big.length) {
          big(k) = ('a' + ((id + k * 11) % 26)).toInt.toByte
          k += 1
        }
        write(Array(cat(base, big)), 1)
      case _ => write(Array(base), 1)
    }
  }
}

/** `binary -> binary`: decoded xz content; NULL when not xz. */
case class XzDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_decode"

  override protected def nullSafeEval(input: Any): Any =
    XzContentEval.decodeContent(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("xd")
      s"""
         |byte[] $res = graft.functions.XzContentEval.decodeContent($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XzDecode =
    copy(child = newChild)
}

/** `binary -> long`: packed xz decode verdicts; NULL when not xz. */
case class XzDecodeMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_decode_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = XzContentEval.decodeMetaPacked(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("xm")
      s"""
         |long $res = graft.functions.XzContentEval.decodeMetaPacked($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): XzDecodeMeta =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q192's synthesis (a real xz writer). */
case class XzContentSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_content_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    XzContentEval.synth(text.asInstanceOf[Array[Byte]],
      params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.XzContentEval.synth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XzContentSynth =
    copy(left = newLeft, right = newRight)
}

/** `binary -> binary`: wrap content as one CRC32-checked xz stream
  * (uncompressed LZMA2 chunks — valid for every decoder). */
case class XzCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_compress"

  override protected def nullSafeEval(input: Any): Any =
    XzContentEval.write(Array(input.asInstanceOf[Array[Byte]]), 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val res = ctx.freshName("xw")
      s"""
         |byte[] $res = graft.functions.XzContentEval.write(
         |  new byte[][] { $b }, 1);
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XzCompress =
    copy(child = newChild)
}

/** Column surface for the xz content kernels. */
object XzContentOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def xzDecode(b: Column): Column = ColumnBridge.column(XzDecode(bin(b)))
  def xzCompress(b: Column): Column = ColumnBridge.column(XzCompress(bin(b)))
  def xzDecodeMeta(b: Column): Column =
    ColumnBridge.column(XzDecodeMeta(bin(b)))

  def xzContentSynth(text: Column, params: Column): Column =
    ColumnBridge.column(XzContentSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
