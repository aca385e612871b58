package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Zstandard BLOCK decode (RFC 8878) — the rung q165's frame triage
  * stopped at, and the one that makes `.warc.zst` (Common Crawl's
  * primary distribution for years) readable end to end instead of
  * merely routable. Everything below is implemented from the RFC,
  * no codec library:
  *
  *  - backward bitstreams (§3.1.1.4): a little-endian bit sea whose
  *    final byte carries a 1-sentinel; fields read highest-index
  *    first, in exactly the reverse of write order;
  *  - FSE (§4.1): accuracy-logged normalized counts read from the
  *    variable-bit table description (threshold coding, `prob == -1`
  *    less-than-one states, zero-repeat flags), the canonical spread
  *    (`step = 5/8·size + 3`), and state machines whose
  *    `(baseline, nbBits)` come from the per-symbol occurrence rank;
  *  - Huffman (§4.2): weights either direct 4-bit or themselves
  *    FSE-compressed with two interleaved states; the implicit last
  *    weight completing a power of two; canonical table fill in
  *    ascending-weight order; 1-stream and 4-stream literals (jump
  *    table, split sizes `(regen+3)/4 ×3` + remainder);
  *  - sequences (§3.1.1.3.2): predefined / RLE / FSE-compressed /
  *    repeat table modes for LL/OF/ML, the three-state interleaved
  *    decode (init LL→OF→ML; bits OF→ML→LL; update LL→ML→OF, never
  *    after the last sequence), code→value baselines and extra bits,
  *    and the three-slot repeat-offset history with the
  *    `litLength == 0` shift and the `rep1 - 1` corner;
  *  - execution: literal copy + match copy where `offset < length`
  *    OVERLAPS (byte-at-a-time, the format's own RLE idiom), history
  *    spanning blocks within a frame, Huffman tables persisting to
  *    `Treeless` blocks, FSE tables persisting to `Repeat` mode;
  *  - XXH64 (§3.1.1): the content checksum verified for real — low
  *    32 bits of the canonical xxHash64 of the decoded frame.
  *
  * Stance: q82's stop-don't-guess — frames decode whole or not at
  * all; a malformed byte keeps every earlier frame and flags
  * `truncated`; dictionary-keyed frames (`dictId != 0`) decode only
  * against a SIDECAR dictionary whose id matches ([[decodeWithDict]]
  * — entropy tables, window prefix, and repcodes all load from it,
  * pinned against a `zstd --train` CLI dictionary in ZstdDecodeSpec)
  * and refuse otherwise (the dictionary is not in the stream); a
  * failed checksum refuses the frame it guards. Resource guard: 1 MiB decoded per
  * buffer (`MaxOut`), matching the corpus-member scale the other
  * container kernels cap at.
  *
  * Reference behavior re-created (not ported): the reference's own
  * pipelines hand corpora over compressed (its Snowflake stages load
  * gzip JSONL, `ingestion/loaders.py`); this extends the same intake
  * stance to the format today's crawl corpora actually ship.
  */
object ZstdBlockEval {

  private val MaxOut = 1 << 20

  final case class Dec(content: Array[Byte], nFrames: Int, nSkippable: Int,
                       truncated: Int, checksums: Int, checksumOk: Int)

  // ------------------------------------------------------------ XXH64

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Canonical xxHash64, seed 0 — the frame-checksum hash. */
  def xxh64(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    var h: Long = 0L
    def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    def round(acc: Long, in: Long): Long = rotl(acc + in * P2, 31) * P1
    if (len >= 32) {
      var v1 = P1 + P2
      var v2 = P2
      var v3 = 0L
      var v4 = -P1
      while (i + 32 <= end) {
        v1 = round(v1, le64(b, i)); i += 8
        v2 = round(v2, le64(b, i)); i += 8
        v3 = round(v3, le64(b, i)); i += 8
        v4 = round(v4, le64(b, i)); i += 8
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      def merge(acc: Long, v: Long): Long = (acc ^ round(0L, v)) * P1 + P4
      h = merge(h, v1); h = merge(h, v2); h = merge(h, v3); h = merge(h, v4)
    } else h = P5
    h += len.toLong
    while (i + 8 <= end) {
      h = rotl(h ^ round(0L, le64(b, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h = rotl(h ^ (le32(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((b(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ------------------------------------------------- backward bitstream

  /** The stream is a little-endian bit sea over [start, end); the last
    * byte's highest set bit is the padding sentinel. Fields read
    * highest-index-first. `pos` may go NEGATIVE for the FSE-weights
    * final-flush semantics (reads zero-fill below 0); callers that
    * forbid it check `pos` themselves. */
  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    var bad: Boolean = end <= start
    var pos: Int = {
      if (bad) 0
      else {
        val last = b(end - 1) & 0xFF
        if (last == 0) { bad = true; 0 } // no sentinel: corrupt
        else {
          var top = 7
          while ((last & (1 << top)) == 0) top -= 1
          (end - 1 - start) * 8 + top
        }
      }
    }

    private def bitAt(i: Int): Int =
      if (i < 0) 0
      else (b(start + (i >> 3)) >> (i & 7)) & 1

    /** Read `n` bits below `pos` (MSB at pos-1), moving pos down.
      * Zero-fills below index 0 (the FSE final-flush rule); `pos`
      * goes negative to signal exhaustion. */
    def read(n: Int): Int = {
      if (n == 0) return 0
      pos -= n
      if (pos < -64) { bad = true; return 0 }
      var v = 0
      var k = n - 1
      var i = pos + n - 1
      while (k >= 0) {
        v |= bitAt(i) << k
        k -= 1; i -= 1
      }
      v
    }

    /** Peek `n` bits below pos without consuming (zero-filled). */
    def peek(n: Int): Int = {
      var v = 0
      var k = n - 1
      var i = pos - 1
      while (k >= 0) {
        v |= bitAt(i) << k
        k -= 1; i -= 1
      }
      v
    }

    def skip(n: Int): Unit = { pos -= n; if (pos < -64) bad = true }
  }

  // ------------------------------------------------------------- FSE

  private final class FseTable(val accLog: Int, val size: Int) {
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val baseline = new Array[Int](size)
  }

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Build the decode table from normalized counts (RFC §4.1.1):
    * `-1` probs take cells from the top; the rest spread with
    * `step = size/2 + size/8 + 3`; `(baseline, nbBits)` from the
    * per-symbol occurrence rank. Returns null on invalid counts. */
  private def buildFse(norm: Array[Int], accLog: Int): FseTable = {
    val size = 1 << accLog
    val t = new FseTable(accLog, size)
    var highThreshold = size - 1
    val spread = new Array[Int](size)
    var s = 0
    // less-than-one symbols occupy the top cells, 1 each
    while (s < norm.length) {
      if (norm(s) == -1) {
        if (highThreshold < 0) return null
        spread(highThreshold) = s
        highThreshold -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var position = 0
    s = 0
    while (s < norm.length) {
      var k = 0
      while (k < norm(s)) {
        spread(position) = s
        do { position = (position + step) & mask } while (position > highThreshold)
        k += 1
      }
      s += 1
    }
    if (position != 0) return null // counts did not fill the table
    // state transitions: occurrence rank x in [count, 2*count)
    val nextRank = new Array[Int](norm.length)
    s = 0
    while (s < norm.length) {
      nextRank(s) = if (norm(s) == -1) 1 else norm(s)
      s += 1
    }
    var i = 0
    while (i < size) {
      val sym = spread(i)
      val x = nextRank(sym)
      nextRank(sym) += 1
      val nb = accLog - highBit(x)
      t.symbol(i) = sym
      t.nbBits(i) = nb
      t.baseline(i) = (x << nb) - size
      i += 1
    }
    t
  }

  /** A one-symbol table: every state emits `sym`, zero transition
    * bits (the RLE table mode). */
  private def rleFse(sym: Int): FseTable = {
    val t = new FseTable(0, 1)
    t.symbol(0) = sym; t.nbBits(0) = 0; t.baseline(0) = 0
    t
  }

  /** FSE table description (forward bitstream, threshold-coded
    * counts, zero-repeat flags). Returns (table, bytesRead) or null. */
  private def readFseDesc(b: Array[Byte], off: Int, limit: Int,
                          maxSym: Int, maxAccLog: Int): (FseTable, Int) = {
    if (off >= limit) return null
    // forward little-endian bit reader
    var bitPos = 0
    def readBits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val i = bitPos + k
        val byteI = off + (i >> 3)
        if (byteI >= limit) return -1
        v |= ((b(byteI) >> (i & 7)) & 1) << k
        k += 1
      }
      bitPos += n
      v
    }
    def peekBits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val i = bitPos + k
        val byteI = off + (i >> 3)
        if (byteI < limit) v |= ((b(byteI) >> (i & 7)) & 1) << k
        k += 1
      }
      v
    }
    val al = readBits(4)
    if (al < 0) return null
    val accLog = al + 5
    if (accLog > maxAccLog) return null
    val size = 1 << accLog
    val norm = new Array[Int](maxSym + 1)
    var remaining = size + 1
    var threshold = size
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSym) {
      if (previous0) {
        // runs of zero-prob symbols: 2-bit repeat flags, 3 = continue
        var rep = readBits(2)
        if (rep < 0) return null
        while (rep == 3) {
          charnum += 3
          if (charnum > maxSym) return null
          rep = readBits(2)
          if (rep < 0) return null
        }
        charnum += rep
        if (charnum > maxSym) return null
        previous0 = false
      } else {
        // threshold coding: values below `max` (masked to threshold-1)
        // use one bit less; the rest use full width with the high
        // half folded down by `max`
        val max = (2 * threshold - 1) - remaining
        val nb = highBit(threshold) + 1
        val short = peekBits(nb - 1)
        var count =
          if ((short & (threshold - 1)) < max) {
            bitPos += nb - 1
            short & (threshold - 1)
          } else {
            val wide = peekBits(nb)
            bitPos += nb
            val v = wide & (2 * threshold - 1)
            if (v >= threshold) v - max else v
          }
        count -= 1 // shift: 0 means "less than 1" (prob -1)
        if (count < -1 || count > remaining) return null
        if (count == -1) {
          remaining -= 1
          norm(charnum) = -1
        } else {
          remaining -= count
          norm(charnum) = count
          if (count == 0) previous0 = true
        }
        charnum += 1
        while (remaining > 1 && remaining < threshold) threshold >>= 1
      }
    }
    if (remaining != 1) return null
    val table = buildFse(java.util.Arrays.copyOf(norm, charnum), accLog)
    if (table == null) return null
    val bytesRead = (bitPos + 7) >> 3
    if (off + bytesRead > limit) return null
    (table, bytesRead)
  }

  /** FSE_writeNCount mirror of [[readFseDesc]] — the synthesis side of
    * dictionary entropy sections. `norm` may hold -1 (less-than-one). */
  private def writeFseDesc(norm: Array[Int], accLog: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    def put(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nBits
      nBits += n
      while (nBits >= 8) { o.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
    }
    put(accLog - 5, 4)
    var remaining = (1 << accLog) + 1
    var threshold = 1 << accLog
    var charnum = 0
    while (remaining > 1 && charnum < norm.length) {
      val count = norm(charnum)
      charnum += 1
      val value = count + 1 // 0 spells "less than one"
      val max = (2 * threshold - 1) - remaining
      val nb = highBit(threshold) + 1
      if (value < max) put(value, nb - 1)
      else put(if (value >= threshold) value + max else value, nb)
      if (count == -1) remaining -= 1 else remaining -= count
      if (count == 0) {
        // zero-run flags for the following zero-prob symbols
        var run = 0
        while (charnum + run < norm.length && norm(charnum + run) == 0 &&
          remaining > 1) run += 1
        charnum += run
        while (run >= 3) { put(3, 2); run -= 3 }
        put(run, 2)
      }
      while (remaining > 1 && remaining < threshold) threshold >>= 1
    }
    if (nBits > 0) { o.write((acc & 0xFF).toInt) }
    if (remaining != 1) return null // distribution must sum exactly
    o.toByteArray
  }

  // ---------------------------------------------------------- Huffman

  private final class HufTable(val tableLog: Int) {
    val size: Int = 1 << tableLog
    val symbol = new Array[Int](size)
    val length = new Array[Int](size)
  }

  /** Canonical table from weights (RFC §4.2.1): total must reach a
    * power of two via the implicit LAST weight; cells filled in
    * ascending-weight order, ties by symbol. Returns null if the
    * weights are inconsistent. */
  private def buildHuf(weights: Array[Int]): HufTable = {
    var total = 0L
    var maxW = 0
    var s = 0
    while (s < weights.length) {
      val w = weights(s)
      if (w < 0 || w > 11) return null
      if (w > 0) { total += 1L << (w - 1); if (w > maxW) maxW = w }
      s += 1
    }
    if (total == 0) return null
    // the smallest power of two STRICTLY greater than the explicit
    // total — the implicit last weight must be >= 1
    val tableLog = highBit(total.toInt) + 1
    if (tableLog > 11) return null
    val size = 1L << tableLog
    val rest = size - total
    // the implicit last weight must complete the power of two exactly
    if (rest <= 0 || Integer.bitCount(rest.toInt) != 1) return null
    val lastW = highBit(rest.toInt) + 1
    val all = java.util.Arrays.copyOf(weights, weights.length + 1)
    all(weights.length) = lastW
    val t = new HufTable(tableLog)
    var pos = 0
    var w = 1
    while (w <= tableLog) {
      var sym = 0
      while (sym < all.length) {
        if (all(sym) == w) {
          val span = 1 << (w - 1)
          var k = 0
          while (k < span) {
            if (pos >= t.size) return null
            t.symbol(pos) = sym
            t.length(pos) = tableLog + 1 - w
            pos += 1; k += 1
          }
        }
        sym += 1
      }
      w += 1
    }
    if (pos != t.size) return null
    t
  }

  /** Huffman table description: direct 4-bit weights, or an
    * FSE-compressed weight stream with two interleaved states.
    * Returns (table, bytesRead) or null. */
  private def readHufDesc(b: Array[Byte], off: Int, limit: Int): (HufTable, Int) = {
    if (off >= limit) return null
    val head = b(off) & 0xFF
    if (head >= 128) {
      val n = head - 127
      val bytes = (n + 1) / 2
      if (off + 1 + bytes > limit) return null
      val w = new Array[Int](n)
      var k = 0
      while (k < n) {
        val byteV = b(off + 1 + (k >> 1)) & 0xFF
        w(k) = if ((k & 1) == 0) byteV >> 4 else byteV & 0xF
        k += 1
      }
      val t = buildHuf(w)
      if (t == null) null else (t, 1 + bytes)
    } else {
      // FSE-compressed weights: head = compressed byte count
      if (off + 1 + head > limit) return null
      val desc = readFseDesc(b, off + 1, off + 1 + head, maxSym = 255,
        maxAccLog = 6)
      if (desc == null) return null
      val (ft, descBytes) = desc
      val br = new BitReader(b, off + 1 + descBytes, off + 1 + head)
      if (br.bad) return null
      var s1 = br.read(ft.accLog)
      var s2 = br.read(ft.accLog)
      if (br.pos < 0 || br.bad) return null
      val out = new Array[Int](256)
      var n = 0
      var done = false
      while (!done && n < 255) {
        out(n) = ft.symbol(s1); n += 1
        if (br.pos < ft.nbBits(s1)) { // s1's update drains the stream
          if (n < 255) { out(n) = ft.symbol(s2); n += 1 }
          done = true
        } else {
          s1 = ft.baseline(s1) + br.read(ft.nbBits(s1))
          if (n < 255) { out(n) = ft.symbol(s2); n += 1 }
          if (br.pos < ft.nbBits(s2)) {
            if (n < 255) { out(n) = ft.symbol(s1); n += 1 }
            done = true
          } else s2 = ft.baseline(s2) + br.read(ft.nbBits(s2))
        }
      }
      if (!done) return null // 255 weights without a stream end: corrupt
      val t = buildHuf(java.util.Arrays.copyOf(out, n))
      if (t == null) null else (t, 1 + head)
    }
  }

  /** Decode `count` literals from one backward Huffman stream. */
  private def hufStream(b: Array[Byte], start: Int, end: Int, t: HufTable,
                        out: Array[Byte], outOff: Int, count: Int): Boolean = {
    val br = new BitReader(b, start, end)
    if (br.bad) return false
    var k = 0
    while (k < count) {
      val idx = br.peek(t.tableLog)
      out(outOff + k) = t.symbol(idx).toByte
      br.skip(t.length(idx))
      if (br.pos < 0) return false
      k += 1
    }
    br.pos == 0 // the stream must be consumed exactly
  }

  // ------------------------------------------------- sequence tables

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlPre: FseTable = buildFse(LlDefault, 6)
  private lazy val MlPre: FseTable = buildFse(MlDefault, 6)
  private lazy val OfPre: FseTable = buildFse(OfDefault, 5)

  /** LL code -> (baseline, extra bits). Codes 0-15 are direct. */
  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  /** ML code -> (baseline, extra bits). Codes 0-31 are value+3. */
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ----------------------------------------------------- frame state

  /** Per-frame mutable decode context: a flat output buffer (the
    * frame's own window — match copies read back into it, overlap
    * included), the persisted Huffman table (Treeless), the persisted
    * FSE tables (Repeat mode), and the repeat-offset history. */
  private final class FrameCtx {
    var buf = new Array[Byte](1024)
    var len = 0
    var huf: HufTable = null
    var llT: FseTable = null
    var mlT: FseTable = null
    var ofT: FseTable = null
    var rep1 = 1L
    var rep2 = 4L
    var rep3 = 8L

    /** Grow for `n` more bytes; false when past the bomb guard. */
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

  /** Decode one block's content into ctx.out. Returns false on any
    * malformation (the frame refuses whole). */
  private def decodeBlock(b: Array[Byte], start: Int, limit: Int,
                          ctx: FrameCtx): Boolean = {
    // ---- literals section
    if (start >= limit) return false
    val h0 = b(start) & 0xFF
    val litType = h0 & 3
    var litStart = 0
    var regen = 0
    var compSize = 0
    var fourStreams = false
    var p = start
    if (litType == 0 || litType == 1) {
      val sizeFormat = (h0 >> 2) & 3
      sizeFormat match {
        case 0 | 2 =>
          regen = h0 >> 3; p += 1
        case 1 =>
          if (p + 2 > limit) return false
          regen = (h0 >> 4) | ((b(p + 1) & 0xFF) << 4); p += 2
        case _ =>
          if (p + 3 > limit) return false
          regen = (h0 >> 4) | ((b(p + 1) & 0xFF) << 4) |
            ((b(p + 2) & 0xFF) << 12)
          p += 3
      }
      litStart = p
    } else {
      val sizeFormat = (h0 >> 2) & 3
      sizeFormat match {
        case 0 | 1 =>
          if (p + 3 > limit) return false
          fourStreams = sizeFormat == 1
          val v = h0 >> 4 | ((b(p + 1) & 0xFF) << 4) |
            ((b(p + 2) & 0xFF) << 12)
          regen = v & 0x3FF
          compSize = v >> 10
          p += 3
        case 2 =>
          if (p + 4 > limit) return false
          fourStreams = true
          val v = (h0 >> 4).toLong | ((b(p + 1) & 0xFFL) << 4) |
            ((b(p + 2) & 0xFFL) << 12) | ((b(p + 3) & 0xFFL) << 20)
          regen = (v & 0x3FFF).toInt
          compSize = (v >> 14).toInt
          p += 4
        case _ =>
          if (p + 5 > limit) return false
          fourStreams = true
          val v = (h0 >> 4).toLong | ((b(p + 1) & 0xFFL) << 4) |
            ((b(p + 2) & 0xFFL) << 12) | ((b(p + 3) & 0xFFL) << 20) |
            ((b(p + 4) & 0xFFL) << 28)
          regen = (v & 0x3FFFF).toInt
          compSize = (v >> 18).toInt
          p += 5
      }
      litStart = p
    }
    if (regen < 0 || regen > MaxOut) return false
    val literals = new Array[Byte](regen)
    litType match {
      case 0 => // raw
        if (p + regen > limit) return false
        System.arraycopy(b, p, literals, 0, regen)
        p += regen
      case 1 => // RLE: one byte
        if (p + 1 > limit) return false
        java.util.Arrays.fill(literals, b(p))
        p += 1
      case _ => // compressed (2) / treeless (3)
        val litEnd = litStart + compSize
        if (litEnd > limit) return false
        var q = litStart
        val table: HufTable =
          if (litType == 2) {
            val d = readHufDesc(b, q, litEnd)
            if (d == null) return false
            q += d._2
            ctx.huf = d._1
            d._1
          } else {
            if (ctx.huf == null) return false // treeless without a table
            ctx.huf
          }
        if (fourStreams) {
          if (q + 6 > litEnd) return false
          val s1 = (b(q) & 0xFF) | ((b(q + 1) & 0xFF) << 8)
          val s2 = (b(q + 2) & 0xFF) | ((b(q + 3) & 0xFF) << 8)
          val s3 = (b(q + 4) & 0xFF) | ((b(q + 5) & 0xFF) << 8)
          q += 6
          val part = (regen + 3) / 4
          val last = regen - 3 * part
          if (last < 0) return false
          val e1 = q + s1
          val e2 = e1 + s2
          val e3 = e2 + s3
          if (e3 > litEnd) return false
          if (!hufStream(b, q, e1, table, literals, 0, part)) return false
          if (!hufStream(b, e1, e2, table, literals, part, part)) return false
          if (!hufStream(b, e2, e3, table, literals, 2 * part, part)) return false
          if (!hufStream(b, e3, litEnd, table, literals, 3 * part, last)) return false
        } else {
          if (!hufStream(b, q, litEnd, table, literals, 0, regen)) return false
        }
        p = litEnd
    }

    // ---- sequences section
    if (p >= limit) return false
    val s0 = b(p) & 0xFF
    var nbSeq = 0
    if (s0 == 0) { nbSeq = 0; p += 1 }
    else if (s0 < 128) { nbSeq = s0; p += 1 }
    else if (s0 < 255) {
      if (p + 2 > limit) return false
      nbSeq = ((s0 - 128) << 8) + (b(p + 1) & 0xFF); p += 2
    } else {
      if (p + 3 > limit) return false
      nbSeq = (b(p + 1) & 0xFF) + ((b(p + 2) & 0xFF) << 8) + 0x7F00; p += 3
    }
    if (nbSeq == 0) {
      if (p != limit) return false // nothing may trail the block
      if (!ctx.ensure(regen)) return false
      System.arraycopy(literals, 0, ctx.buf, ctx.len, regen)
      ctx.len += regen
      return true
    }
    if (p >= limit) return false
    val modes = b(p) & 0xFF
    if ((modes & 3) != 0) return false // reserved bits must be zero
    p += 1
    def loadTable(mode: Int, pre: FseTable, prev: FseTable, maxSym: Int,
                  maxLog: Int): FseTable = mode match {
      case 0 => pre
      case 1 => // RLE: one byte names the only symbol
        if (p >= limit) null
        else {
          val sym = b(p) & 0xFF
          p += 1
          if (sym > maxSym) null else rleFse(sym)
        }
      case 2 =>
        val d = readFseDesc(b, p, limit, maxSym, maxLog)
        if (d == null) null
        else { p += d._2; d._1 }
      case _ => prev // repeat
    }
    val llMode = (modes >> 6) & 3
    val ofMode = (modes >> 4) & 3
    val mlMode = (modes >> 2) & 3
    val llT = loadTable(llMode, LlPre, ctx.llT, 35, 9)
    if (llT == null) return false
    val ofT = loadTable(ofMode, OfPre, ctx.ofT, 31, 8)
    if (ofT == null) return false
    val mlT = loadTable(mlMode, MlPre, ctx.mlT, 52, 9)
    if (mlT == null) return false
    ctx.llT = llT; ctx.ofT = ofT; ctx.mlT = mlT

    val br = new BitReader(b, p, limit)
    if (br.bad) return false
    var llS = br.read(llT.accLog)
    var ofS = br.read(ofT.accLog)
    var mlS = br.read(mlT.accLog)
    if (br.pos < 0 || br.bad) return false

    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val llCode = llT.symbol(llS)
      val ofCode = ofT.symbol(ofS)
      val mlCode = mlT.symbol(mlS)
      if (llCode > 35 || mlCode > 52 || ofCode > 31) return false
      // extra bits: OF, then ML, then LL (spec order)
      val ofExtra = br.read(ofCode)
      val mlExtra = br.read(MlBits(mlCode))
      val llExtra = br.read(LlBits(llCode))
      if (br.pos < 0 || br.bad) return false
      val litLen = LlBase(llCode) + llExtra
      val matchLen = MlBase(mlCode) + mlExtra
      val offVal = (1L << ofCode) + ofExtra
      // repeat-offset resolution
      var offset = 0L
      if (offVal > 3) {
        offset = offVal - 3
        ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
      } else {
        var idx = offVal.toInt
        if (litLen == 0) idx += 1
        idx match {
          case 1 => offset = ctx.rep1
          case 2 =>
            offset = ctx.rep2
            ctx.rep2 = ctx.rep1; ctx.rep1 = offset
          case 3 =>
            offset = ctx.rep3
            ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
          case _ => // idx 4: litLen == 0 && offVal == 3 -> rep1 - 1
            offset = ctx.rep1 - 1
            if (offset <= 0) return false
            ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
        }
      }
      // copy literals
      if (litPos + litLen > regen) return false
      if (matchLen < 0 || !ctx.ensure(litLen + matchLen)) return false
      System.arraycopy(literals, litPos, ctx.buf, ctx.len, litLen)
      ctx.len += litLen
      litPos += litLen
      // match copy from the frame's own window; byte-at-a-time so the
      // offset < length OVERLAP case reads what it just wrote (the
      // format's RLE idiom)
      if (offset > ctx.len) return false
      var src = ctx.len - offset.toInt
      var k = 0
      while (k < matchLen) {
        ctx.buf(ctx.len) = ctx.buf(src)
        ctx.len += 1; src += 1; k += 1
      }
      // state updates (never after the last sequence): LL, ML, OF
      if (seq < nbSeq - 1) {
        llS = llT.baseline(llS) + br.read(llT.nbBits(llS))
        mlS = mlT.baseline(mlS) + br.read(mlT.nbBits(mlS))
        ofS = ofT.baseline(ofS) + br.read(ofT.nbBits(ofS))
        if (br.pos < 0 || br.bad) return false
      }
      seq += 1
    }
    if (br.pos != 0) return false // the stream must be consumed exactly
    // trailing literals after the last sequence
    val rest = regen - litPos
    if (rest < 0 || !ctx.ensure(rest)) return false
    System.arraycopy(literals, litPos, ctx.buf, ctx.len, rest)
    ctx.len += rest
    true
  }

  /** Decode every frame in the buffer. Earlier frames serve when a
    * later one is malformed (`truncated = 1`); null only when the
    * buffer is not zstd at all. */
  def decode(b: Array[Byte]): Dec = decode(b, null: DictCtx)

  /** [[decode]] with a sidecar dictionary (the blocklist-dim pattern:
    * one broadcast byte blob serves every row). Frames with dictId 0
    * decode as always; dictionary-keyed frames decode against the
    * sidecar when its id matches and refuse otherwise. Null/unparseable
    * dictionary bytes degrade to the no-dictionary behavior. */
  def decodeWithDict(b: Array[Byte], dictBytes: Array[Byte]): Dec =
    decode(b, dictCtxOf(dictBytes))

  /** Dictionary parse memo: the sidecar arrives as the SAME array
    * reference on every row of a partition (a broadcast literal), so
    * cache by identity — parsing costs ~µs but runs per row otherwise. */
  private val lastDict =
    new ThreadLocal[(Array[Byte], DictCtx)]
  private def dictCtxOf(dictBytes: Array[Byte]): DictCtx = {
    if (dictBytes == null) return null
    val memo = lastDict.get()
    if (memo != null && (memo._1 eq dictBytes)) return memo._2
    val ctx = parseDict(dictBytes)
    lastDict.set((dictBytes, ctx))
    ctx
  }

  private def decode(b: Array[Byte], dict: DictCtx): Dec = {
    if (b == null || b.length < 4) return null
    var i = 0
    var frames = 0
    var skippable = 0
    var truncated = 0
    var checksums = 0
    var checksumOk = 1
    val all = new java.io.ByteArrayOutputStream()
    var sawAny = false
    var stop = false
    while (!stop) {
      if (i == b.length) stop = true
      else if (i + 4 > b.length) {
        if (!sawAny) return null
        truncated = 1; stop = true
      } else {
        val magic = le32(b, i)
        if (magic == 0xFD2FB528L) {
          sawAny = true
          val r = decodeFrame(b, i, dict)
          if (r == null) { truncated = 1; stop = true }
          else {
            val (content, next, hasCk, ckOk) = r
            if (all.size() + content.length > MaxOut) { truncated = 1; stop = true }
            else {
              frames += 1
              all.write(content, 0, content.length)
              if (hasCk) {
                checksums += 1
                if (!ckOk) checksumOk = 0
              }
              i = next
            }
          }
        } else if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
          sawAny = true
          if (i + 8 > b.length) { truncated = 1; stop = true }
          else {
            val size = le32(b, i + 4)
            if (i + 8 + size > b.length) { truncated = 1; stop = true }
            else { skippable += 1; i += 8 + size.toInt }
          }
        } else {
          if (!sawAny) return null
          truncated = 1; stop = true
        }
      }
    }
    if (!sawAny) return null
    Dec(all.toByteArray, frames, skippable, truncated, checksums,
      if (checksums == 0) -1 else checksumOk)
  }


  /** Decoded content or null — the codegen-friendly surface. */
  def decodeContent(b: Array[Byte]): Array[Byte] = {
    val r = decode(b)
    if (r == null) null else r.content
  }

  /** Packed decode verdicts: 1<<48 | truncated<<44 | (checksumOk+1)<<40 |
    * nFrames<<32 | nSkippable<<24 | min(len, 2^24-1); -1 when not zstd. */
  def decodeMetaPacked(b: Array[Byte]): Long = {
    val r = decode(b)
    if (r == null) return -1L
    (1L << 48) | (r.truncated.toLong << 44) |
      ((r.checksumOk + 1).toLong << 40) |
      (math.min(r.nFrames, 0xFF).toLong << 32) |
      (math.min(r.nSkippable, 0xFF).toLong << 24) |
      math.min(r.content.length, (1 << 24) - 1).toLong
  }

  /** Intake-grade decode: null unless every frame decoded whole
    * (no truncation, at least one regular frame, no failed checksum)
    * — the q97 transport-failure stance for `.warc.zst` members. */
  def decodeContentStrict(b: Array[Byte]): Array[Byte] = {
    val r = decode(b)
    if (r == null || r.truncated != 0 || r.nFrames < 1 || r.checksumOk == 0)
      null
    else r.content
  }

  // ------------------------------------------------- dictionary plane

  /** A parsed zstd dictionary (RFC 8878 §5): entropy tables in load
    * order (Huffman, OF, ML, LL), the three initial repeat offsets,
    * and the content that prefixes the match window. */
  private final class DictCtx(val id: Long, val huf: HufTable,
                              val ofT: FseTable, val mlT: FseTable,
                              val llT: FseTable, val rep1: Long,
                              val rep2: Long, val rep3: Long,
                              val content: Array[Byte])

  /** Parse a structured dictionary (magic 0xEC30A437). Null on any
    * malformation — a frame keyed to an unparseable dictionary refuses
    * rather than guessing. Load order matches libzstd's
    * ZSTD_loadDEntropy: Huffman, Offsets, MatchLengths,
    * LiteralsLengths, then 3 LE u32 repcodes, then content. */
  private def parseDict(d: Array[Byte]): DictCtx = {
    if (d == null || d.length < 8 || le32(d, 0) != 0xEC30A437L) return null
    val id = le32(d, 4)
    if (id == 0L) return null // id 0 cannot be referenced by a frame
    var off = 8
    val h = readHufDesc(d, off, d.length)
    if (h == null) return null
    off += h._2
    val of = readFseDesc(d, off, d.length, maxSym = 31, maxAccLog = 8)
    if (of == null) return null
    off += of._2
    val ml = readFseDesc(d, off, d.length, maxSym = 52, maxAccLog = 9)
    if (ml == null) return null
    off += ml._2
    val ll = readFseDesc(d, off, d.length, maxSym = 35, maxAccLog = 9)
    if (ll == null) return null
    off += ll._2
    if (off + 12 > d.length) return null
    val r1 = le32(d, off); val r2 = le32(d, off + 4); val r3 = le32(d, off + 8)
    off += 12
    val content = java.util.Arrays.copyOfRange(d, off, d.length)
    // repcodes must land inside the dictionary content (spec invariant)
    if (r1 <= 0 || r2 <= 0 || r3 <= 0 || r1 > content.length ||
      r2 > content.length || r3 > content.length) return null
    new DictCtx(id, h._1, of._1, ml._1, ll._1, r1, r2, r3, content)
  }

  /** One regular frame from `i` (magic verified). Returns
    * (content, nextOffset, hasChecksum, checksumOk) or null. A
    * dictionary-keyed frame (dictId != 0) decodes only when `dict`
    * carries that id: the dict content prefixes the match window, its
    * entropy tables seed the Repeat modes, and its repcodes seed the
    * offset history. */
  private def decodeFrame(b: Array[Byte], i: Int,
                          dict: DictCtx): (Array[Byte], Int, Boolean, Boolean) = {
    if (i + 5 > b.length) return null
    val fhd = b(i + 4) & 0xFF
    if ((fhd & 0x08) != 0) return null // reserved bit
    val single = (fhd >> 5) & 1
    val fcsFlag = fhd >>> 6
    val dictFlag = fhd & 3
    val hasCk = (fhd & 0x04) != 0
    var off = i + 5
    if (single == 0) {
      if (off + 1 > b.length) return null
      off += 1 // window descriptor: decode does not pre-allocate by it
    }
    val dictBytes = dictFlag match {
      case 1 => 1; case 2 => 2; case 3 => 4; case _ => 0
    }
    var dictId = 0L
    if (dictBytes > 0) {
      if (off + dictBytes > b.length) return null
      var k = dictBytes - 1
      while (k >= 0) { dictId = (dictId << 8) | (b(off + k) & 0xFFL); k -= 1 }
      off += dictBytes
    }
    // dictionary-keyed without the sidecar (or with the wrong one):
    // refuse — never guess against an absent dictionary
    if (dictId != 0L && (dict == null || dict.id != dictId)) return null
    val fcsBytes = fcsFlag match {
      case 1 => 2; case 2 => 4; case 3 => 8
      case _ => if (single == 1) 1 else 0
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      if (off + fcsBytes > b.length) return null
      var v = 0L
      var k = fcsBytes - 1
      while (k >= 0) { v = (v << 8) | (b(off + k) & 0xFFL); k -= 1 }
      fcs = if (fcsBytes == 2) v + 256L else v
      off += fcsBytes
    }
    val ctx = new FrameCtx
    var dictStart = 0
    if (dictId != 0L) {
      // seed window, entropy tables, and repeat offsets from the dict
      if (!ctx.ensure(dict.content.length)) return null
      System.arraycopy(dict.content, 0, ctx.buf, 0, dict.content.length)
      ctx.len = dict.content.length
      dictStart = dict.content.length
      ctx.huf = dict.huf
      ctx.ofT = dict.ofT; ctx.mlT = dict.mlT; ctx.llT = dict.llT
      ctx.rep1 = dict.rep1; ctx.rep2 = dict.rep2; ctx.rep3 = dict.rep3
    }
    var last = false
    while (!last) {
      if (off + 3 > b.length) return null
      val hdr = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16)
      last = (hdr & 1) == 1
      val btype = (hdr >> 1) & 3
      val bsize = hdr >>> 3
      off += 3
      btype match {
        case 0 => // raw
          if (off + bsize > b.length) return null
          if (!ctx.ensure(bsize)) return null
          System.arraycopy(b, off, ctx.buf, ctx.len, bsize)
          ctx.len += bsize
          off += bsize
        case 1 => // RLE: one stream byte, bsize repeats
          if (off + 1 > b.length) return null
          if (!ctx.ensure(bsize)) return null
          java.util.Arrays.fill(ctx.buf, ctx.len, ctx.len + bsize, b(off))
          ctx.len += bsize
          off += 1
        case 2 => // compressed
          if (off + bsize > b.length) return null
          if (!decodeBlock(b, off, off + bsize, ctx)) return null
          off += bsize
        case _ => return null // reserved
      }
    }
    val content = java.util.Arrays.copyOfRange(ctx.buf, dictStart, ctx.len)
    if (fcs >= 0L && content.length.toLong != fcs) return null
    var ckOk = true
    if (hasCk) {
      if (off + 4 > b.length) return null
      val want = le32(b, off)
      val got = xxh64(content, 0, content.length) & 0xFFFFFFFFL
      ckOk = want == got
      off += 4
    }
    (content, off, hasCk, ckOk)
  }

  // ===================================================== encoder (synthesis)
  // A real compressor for the synthesis side: Huffman literals with
  // direct weights, sequences over the PREDEFINED FSE tables (encoding
  // = the decode table walked in reverse via a per-symbol state
  // lookup), backward bitstreams with the sentinel bit, and a genuine
  // XXH64 checksum — so the decode paths above are exercised by frames
  // another decoder would also accept.

  /** Little-endian bit appender; `finish` adds the sentinel 1-bit and
    * pads to a byte — the backward reader's entry point. */
  private final class BitWriter {
    private var acc = 0L
    private var n = 0
    private val o = new java.io.ByteArrayOutputStream()
    def put(v: Long, bits: Int): Unit = {
      acc |= (v & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) {
        o.write((acc & 0xFF).toInt)
        acc >>>= 8; n -= 8
      }
    }
    def finish(): Array[Byte] = {
      put(1L, 1) // sentinel
      if (n > 0) { o.write((acc & 0xFF).toInt); acc = 0; n = 0 }
      o.toByteArray
    }
  }

  /** enc(sym)(nextState) = the decode-table cell that emits `sym` and
    * whose (baseline, nbBits) window covers `nextState`. */
  private def encLookup(t: FseTable, nSym: Int): Array[Array[Int]] = {
    val enc = Array.fill(nSym)(null: Array[Int])
    var i = 0
    while (i < t.size) {
      val s = t.symbol(i)
      if (enc(s) == null) enc(s) = new Array[Int](t.size)
      var next = t.baseline(i)
      val end = t.baseline(i) + (1 << t.nbBits(i))
      while (next < end) { enc(s)(next) = i; next += 1 }
      i += 1
    }
    enc
  }

  private def firstState(t: FseTable, sym: Int): Int = {
    var i = 0
    while (i < t.size) { if (t.symbol(i) == sym) return i; i += 1 }
    -1
  }

  /** litLen -> LL code (inverse of LlBase/LlBits). */
  private def llCodeOf(v: Int): Int = {
    if (v <= 15) return v
    var c = 35
    while (LlBase(c) > v) c -= 1
    c
  }

  private def mlCodeOf(v: Int): Int = {
    if (v <= 34) return v - 3
    var c = 52
    while (MlBase(c) > v) c -= 1
    c
  }

  /** One planned sequence: `lit` literals then `matchLen` bytes copied
    * from `offVal` (the WIRE offset value: real offset + 3, or 1-3
    * for repeat slots). */
  final case class Seq3(litLen: Int, matchLen: Int, offVal: Long)

  /** Huffman plan over the literal bytes: weights (explicit, implicit
    * last) valid by construction — every present symbol weight 1,
    * `delta` of them raised to 2 so the implicit top symbol completes
    * the power of two. Null when fewer than 2 distinct bytes. */
  private def planHuf(lits: Array[Byte]): (Array[Int], HufTable) = {
    val freq = new Array[Int](256)
    var i = 0
    while (i < lits.length) { freq(lits(i) & 0xFF) += 1; i += 1 }
    var maxSym = 255
    while (maxSym >= 0 && freq(maxSym) == 0) maxSym -= 1
    // the direct 4-bit representation's header is `127 + n` in ONE
    // byte, so at most 128 explicit weights: chunks whose alphabet
    // reaches past symbol 128 (UTF-16 bodies, binary payloads) fall
    // back to a raw block rather than emit a corrupt header
    if (maxSym < 1 || maxSym > 128) return null
    var present = 0
    i = 0
    while (i < maxSym) { if (freq(i) > 0) present += 1; i += 1 }
    if (present == 0) return null // single distinct byte: not Huffman-able
    val s = present
    var t = highBit(s) + (if (Integer.bitCount(s) == 1) 1 else 2)
    if (t > 11) return null
    var delta = (1 << (t - 1)) - s
    val weights = new Array[Int](maxSym) // explicit: symbols 0..maxSym-1
    i = 0
    while (i < maxSym) {
      if (freq(i) > 0) {
        weights(i) = if (delta > 0) { delta -= 1; 2 } else 1
      }
      i += 1
    }
    if (delta != 0) return null
    val table = buildHuf(weights) // implicit maxSym completes 2^t
    if (table == null) null else (weights, table)
  }

  /** Encode `count` literals (from `off`) as ONE backward Huffman
    * stream: codes appended in reverse literal order so the backward
    * reader decodes forward. */
  private def hufEncodeStream(lits: Array[Byte], off: Int, count: Int,
                              t: HufTable): Array[Byte] = {
    // per-symbol (code, len) from the canonical table
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    var i = 0
    while (i < t.size) {
      val s = t.symbol(i)
      if (len(s) == 0) { // first cell of the symbol's aligned span
        len(s) = t.length(i)
        code(s) = i >> (t.tableLog - t.length(i))
      }
      i += 1
    }
    val w = new BitWriter
    var k = count - 1
    while (k >= 0) {
      val s = lits(off + k) & 0xFF
      w.put(code(s).toLong, len(s))
      k -= 1
    }
    w.finish()
  }

  /** Compressed block bytes: Huffman literals (1- or 4-stream, direct
    * weights) + sequences over the predefined tables. `lits` is the
    * block's literal bytes; `seqs` may be empty (nbSeq = 0). Returns
    * null when the literals cannot Huffman-encode (caller falls back
    * to a raw-literal spelling). */
  def compressedBlock(lits: Array[Byte], seqs: Array[Seq3],
                      fourStream: Boolean,
                      repeatModes: Boolean = false): Array[Byte] = {
    val plan = planHuf(lits)
    if (plan == null) return null
    val (weights, table) = plan
    val o = new java.io.ByteArrayOutputStream()
    // ---- Huffman description: direct 4-bit weights
    val hd = new java.io.ByteArrayOutputStream()
    hd.write(127 + weights.length)
    var i = 0
    while (i < weights.length) {
      val hi = weights(i)
      val lo = if (i + 1 < weights.length) weights(i + 1) else 0
      hd.write((hi << 4) | lo)
      i += 2
    }
    val desc = hd.toByteArray
    // ---- streams
    val body = new java.io.ByteArrayOutputStream()
    body.write(desc, 0, desc.length)
    if (fourStream) {
      val part = (lits.length + 3) / 4
      val last = lits.length - 3 * part
      if (last < 0) return null
      val s1 = hufEncodeStream(lits, 0, part, table)
      val s2 = hufEncodeStream(lits, part, part, table)
      val s3 = hufEncodeStream(lits, 2 * part, part, table)
      val s4 = hufEncodeStream(lits, 3 * part, last, table)
      if (s1.length > 0xFFFF || s2.length > 0xFFFF || s3.length > 0xFFFF)
        return null
      body.write(s1.length & 0xFF); body.write(s1.length >> 8)
      body.write(s2.length & 0xFF); body.write(s2.length >> 8)
      body.write(s3.length & 0xFF); body.write(s3.length >> 8)
      body.write(s1, 0, s1.length); body.write(s2, 0, s2.length)
      body.write(s3, 0, s3.length); body.write(s4, 0, s4.length)
    } else {
      val s = hufEncodeStream(lits, 0, lits.length, table)
      body.write(s, 0, s.length)
    }
    val comp = body.toByteArray
    // ---- literals section header (type 2, compressed)
    if (fourStream) {
      if (lits.length >= (1 << 14) || comp.length >= (1 << 14)) return null
      val v = 2L | (2L << 2) | (lits.length.toLong << 4) |
        (comp.length.toLong << 18)
      var k = 0
      while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    } else {
      if (lits.length >= (1 << 10) || comp.length >= (1 << 10)) return null
      val v = 2 | (0 << 2) | (lits.length << 4) | (comp.length << 14)
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF); o.write((v >> 16) & 0xFF)
    }
    o.write(comp, 0, comp.length)
    // ---- sequences
    if (seqs.isEmpty) { o.write(0); return o.toByteArray }
    if (seqs.length >= 128) return null
    o.write(seqs.length)
    // modes: Repeat (3) spells "use the tables already in context" —
    // with a dictionary whose tables equal the predefined
    // distributions, the wire says Repeat while the encoder below
    // still plans against the predefined tables
    o.write(if (repeatModes) 0xFC else 0)
    val llEnc = encLookup(LlPre, 36)
    val mlEnc = encLookup(MlPre, 53)
    val ofEnc = encLookup(OfPre, 29)
    val n = seqs.length
    val llC = seqs.map(s => llCodeOf(s.litLen))
    val mlC = seqs.map(s => mlCodeOf(s.matchLen))
    val ofC = seqs.map(s => highBit(s.offVal.toInt))
    if (ofC.exists(_ > 28)) return null // predefined OF table tops at 28
    val w = new BitWriter
    var llS = firstState(LlPre, llC(n - 1))
    var mlS = firstState(MlPre, mlC(n - 1))
    var ofS = firstState(OfPre, ofC(n - 1))
    if (llS < 0 || mlS < 0 || ofS < 0) return null
    // last sequence's extra bits first (reverse of read order of,ml,ll)
    def putExtras(s: Seq3, llCode: Int, mlCode: Int, ofCode: Int): Unit = {
      w.put(s.litLen.toLong - LlBase(llCode), LlBits(llCode))
      w.put(s.matchLen.toLong - MlBase(mlCode), MlBits(mlCode))
      w.put(s.offVal - (1L << ofCode), ofCode)
    }
    putExtras(seqs(n - 1), llC(n - 1), mlC(n - 1), ofC(n - 1))
    var i2 = n - 2
    while (i2 >= 0) {
      // update bits between seq i2 and i2+1: reverse of read ll,ml,of
      val ofPrev = ofEnc(ofC(i2))(ofS)
      w.put((ofS - OfPre.baseline(ofPrev)).toLong, OfPre.nbBits(ofPrev))
      ofS = ofPrev
      val mlPrev = mlEnc(mlC(i2))(mlS)
      w.put((mlS - MlPre.baseline(mlPrev)).toLong, MlPre.nbBits(mlPrev))
      mlS = mlPrev
      val llPrev = llEnc(llC(i2))(llS)
      w.put((llS - LlPre.baseline(llPrev)).toLong, LlPre.nbBits(llPrev))
      llS = llPrev
      putExtras(seqs(i2), llC(i2), mlC(i2), ofC(i2))
      i2 -= 1
    }
    // init states last (reverse of read ll, of, ml)
    w.put(mlS.toLong, MlPre.accLog)
    w.put(ofS.toLong, OfPre.accLog)
    w.put(llS.toLong, LlPre.accLog)
    val bits = w.finish()
    o.write(bits, 0, bits.length)
    o.toByteArray
  }

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def blockHeader(o: java.io.ByteArrayOutputStream, last: Boolean,
                          btype: Int, size: Int): Unit = {
    val hdr = (if (last) 1 else 0) | (btype << 1) | (size << 3)
    o.write(hdr & 0xFF); o.write((hdr >> 8) & 0xFF); o.write((hdr >> 16) & 0xFF)
  }

  /** One frame whose blocks are supplied pre-encoded as
    * (btype, blockBytes, declaredSize) triples; windowed header with
    * a 4-byte FCS and a REAL XXH64 checksum over `content`.
    *
    * Why windowed, not single-segment: `Block_Maximum_Size =
    * min(Window_Size, 128 KiB)` (RFC §3.1.1.2.3), and a single-segment
    * frame's window IS its content size — a 23-byte content with a
    * 60-byte compressed block (possible at tiny sizes: the Huffman
    * description outweighs the text) violates it. libzstd's one-shot
    * API shrugs; the reference CLI's streaming decoder REFUSES
    * ("Src size is incorrect", found by feeding this synthesizer to
    * zstd v1.5.7). The window descriptor is sized to cover both the
    * content and the largest block on the wire. */
  def frameOf(content: Array[Byte],
              blocks: Array[(Int, Array[Byte], Int)],
              dictId: Long = 0L): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putU32le(o, 0xFD2FB528L)
    // windowed, checksum, 4-byte FCS; dictFlag 3 = 4-byte dictionary id
    o.write(0x04 | (2 << 6) | (if (dictId != 0L) 3 else 0))
    var need = math.max(content.length, 1 << 10)
    var i0 = 0
    while (i0 < blocks.length) {
      if (blocks(i0)._2.length > need) need = blocks(i0)._2.length
      i0 += 1
    }
    var wlog = 10
    while ((1 << wlog) < need) wlog += 1
    o.write((wlog - 10) << 3) // exponent in the high 5 bits, mantissa 0
    if (dictId != 0L) putU32le(o, dictId)
    putU32le(o, content.length.toLong)
    var i = 0
    while (i < blocks.length) {
      val (btype, bytes, declared) = blocks(i)
      blockHeader(o, last = i == blocks.length - 1, btype,
        if (btype == 1) declared else bytes.length)
      o.write(bytes, 0, bytes.length)
      i += 1
    }
    putU32le(o, xxh64(content, 0, content.length) & 0xFFFFFFFFL)
    o.toByteArray
  }

  /** Two-block frame whose SECOND block carries TREELESS literals —
    * it reuses block 1's Huffman table, the cross-block state the
    * format allows (and real encoders emit). Content = a ++ bLits.
    * Null when `a` cannot Huffman-encode. */
  def treelessFrame(a: Array[Byte], bLits: Array[Byte]): Array[Byte] = {
    val plan = planHuf(a)
    if (plan == null) return null
    val b1 = compressedBlock(a, Array.empty[Seq3], fourStream = false)
    if (b1 == null) return null
    val table = plan._2
    val s = hufEncodeStream(bLits, 0, bLits.length, table)
    if (bLits.length >= (1 << 10) || s.length >= (1 << 10)) return null
    val o2 = new java.io.ByteArrayOutputStream()
    val v = 3 | (bLits.length << 4) | (s.length << 14) // type 3, 1 stream
    o2.write(v & 0xFF); o2.write((v >> 8) & 0xFF); o2.write((v >> 16) & 0xFF)
    o2.write(s, 0, s.length)
    o2.write(0) // nbSeq = 0
    val b2 = o2.toByteArray
    val content = new Array[Byte](a.length + bLits.length)
    System.arraycopy(a, 0, content, 0, a.length)
    System.arraycopy(bLits, 0, content, a.length, bLits.length)
    frameOf(content, Array((2, b1, b1.length), (2, b2, b2.length)))
  }

  /** General-purpose compressor for arbitrary binary content (the
    * `.warc.zst` wrap): 800-byte chunks, each a Huffman
    * literals-only compressed block, falling back to a raw block when
    * the chunk is too uniform or incompressible — always a valid,
    * checksummed, windowed frame (CLI-verified conformance). */
  def compress(content: Array[Byte]): Array[Byte] = {
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Byte], Int)]
    if (content.length == 0) blocks += ((0, content, 0))
    var off = 0
    while (off < content.length) {
      val n = math.min(800, content.length - off)
      val chunk = java.util.Arrays.copyOfRange(content, off, off + n)
      val cb = compressedBlock(chunk, Array.empty[Seq3], fourStream = false)
      if (cb != null && cb.length < n) blocks += ((2, cb, cb.length))
      else blocks += ((0, chunk, n))
      off += n
    }
    frameOf(content, blocks.toArray)
  }

  // ------------------------------------------------ dictionary synthesis

  /** The q193 sidecar phrase: the dictionary content every dict-keyed
    * frame copies into its output (the oracle replays it as a string
    * constant). */
  val DictPhrase = "shared dictionary stock phrase: "

  /** "grft" — the profile dictionary's id. */
  val ProfileDictId = 0x67726674L

  /** The profile dictionary: REAL entropy sections (direct Huffman
    * weights over the phrase's alphabet; the predefined LL/ML/OF
    * distributions spelled as FSE descriptions through
    * [[writeFseDesc]]), repcode2 aimed at the whole phrase so
    * [[dictFrame]]'s litLen-0 rep copy lands on it, content = the
    * phrase. One broadcast blob serves every row (the blocklist-dim
    * pattern). */
  lazy val profileDict: Array[Byte] = {
    val content = DictPhrase.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    buildDict(ProfileDictId, content, 1L, content.length.toLong, 4L)
  }

  /** Assemble a structured dictionary (RFC 8878 §5 layout, libzstd's
    * load order): magic, id, Huffman + OF/ML/LL descriptions, the
    * three repcodes, content. */
  def buildDict(id: Long, content: Array[Byte], rep1: Long, rep2: Long,
                rep3: Long): Array[Byte] = {
    val plan = planHuf(content)
    if (plan == null) return null
    val weights = plan._1
    val o = new java.io.ByteArrayOutputStream()
    putU32le(o, 0xEC30A437L)
    putU32le(o, id)
    o.write(127 + weights.length)
    var i = 0
    while (i < weights.length) {
      val hi = weights(i)
      val lo = if (i + 1 < weights.length) weights(i + 1) else 0
      o.write((hi << 4) | lo)
      i += 2
    }
    val ofD = writeFseDesc(OfDefault, 5)
    val mlD = writeFseDesc(MlDefault, 6)
    val llD = writeFseDesc(LlDefault, 6)
    if (ofD == null || mlD == null || llD == null) return null
    o.write(ofD, 0, ofD.length)
    o.write(mlD, 0, mlD.length)
    o.write(llD, 0, llD.length)
    putU32le(o, rep1); putU32le(o, rep2); putU32le(o, rep3)
    o.write(content, 0, content.length)
    o.toByteArray
  }

  /** A dictionary-keyed frame (q193's sidecar class): one compressed
    * block in REPEAT entropy mode (the tables come from the
    * dictionary), whose single sequence has litLen 0 and wire offset
    * value 1 — the litLen-0 shift corner lands it on the
    * dictionary-seeded rep2, copying the whole phrase from the
    * dictionary content into the output — followed by the corpus
    * spelling as trailing literals. Content = DictPhrase + base. */
  def dictFrame(text: Array[Byte], id: Long): Array[Byte] = {
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val w0 = if (ws.length > 0) ws(0) else "alpha"
    val w1 = if (ws.length > 1) ws(1) else "beta"
    val baseFull = (w0 + " " + w1 + "#" + (((id % 97) + 97) % 97)).getBytes(utf8)
    val base = if (baseFull.length <= 200) baseFull
    else java.util.Arrays.copyOfRange(baseFull, 0, 200)
    val phrase = DictPhrase.getBytes(utf8)
    val blk = compressedBlock(base, Array(Seq3(0, phrase.length, 1L)),
      fourStream = false, repeatModes = true)
    if (blk == null) return base // un-Huffman-able corner: degrade raw
    val content = new Array[Byte](phrase.length + base.length)
    System.arraycopy(phrase, 0, content, 0, phrase.length)
    System.arraycopy(base, 0, content, phrase.length, base.length)
    frameOf(content, Array((2, blk, blk.length)), ProfileDictId)
  }

  /** Decoded content against a sidecar dictionary, or null — the
    * codegen surface for [[ZstdDecodeDict]]. */
  def decodeDictContent(b: Array[Byte], dict: Array[Byte]): Array[Byte] = {
    val r = decodeWithDict(b, dict)
    if (r == null) null else r.content
  }

  // ------------------------------------------------------ q188 synthesis

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q188 member. `params` packs `doc_id | mode<<40`;
    * base = `w0 + " " + w1 + "#" + (id % 97)` (q95's spelling). Modes:
    * 0 -> one compressed literals-only block (Huffman 1-stream),
    *      content = base;
    * 1 -> sequences over the predefined tables: literals `base + "|"`,
    *      then a match copying base from offset len+1 —
    *      content = base|base;
    * 2 -> 4-stream Huffman literals, no sequences —
    *      content = base/base/base/base;
    * 3 -> repeat-offset drill: base;base;base + "x"*8 — seq2 reuses
    *      seq1's offset via wire value 1 (rep1), seq3 copies with
    *      offset 1 < length (the overlap idiom);
    * 4 -> mixed blocks: raw(base) + RLE('z' × 30+id%8) + a compressed
    *      literals-only tail — content = base + z-run + "!end".
    * Every frame carries a real XXH64 checksum. Falls back to a raw
    * block when a class's literals are too uniform to Huffman-encode.
    */
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
    def rawBlock(c: Array[Byte]): (Int, Array[Byte], Int) = (0, c, c.length)
    def compOrRaw(lits: Array[Byte], seqs: Array[Seq3], four: Boolean,
                  content: Array[Byte]): (Int, Array[Byte], Int) = {
      val cb = compressedBlock(lits, seqs, four)
      if (cb == null) rawBlock(content) else (2, cb, cb.length)
    }
    mode match {
      case 1 =>
        val sep = "|".getBytes(utf8)
        val lits = cat(base, sep)
        val content = cat(base, sep, base)
        val seqs = Array(Seq3(lits.length, base.length, lits.length + 3L))
        frameOf(content, Array(compOrRaw(lits, seqs, four = false, content)))
      case 2 =>
        val sep = "/".getBytes(utf8)
        val content = cat(base, sep, base, sep, base, sep, base)
        frameOf(content,
          Array(compOrRaw(content, Array.empty[Seq3], four = true, content)))
      case 3 =>
        val sep = ";".getBytes(utf8)
        val xs = "xxxxxxxx".getBytes(utf8)
        val lit1 = cat(base, sep)
        val content = cat(base, sep, base, sep, base, xs)
        val off = lit1.length.toLong
        val seqs = Array(
          Seq3(lit1.length, base.length, off + 3L), // real offset len+1
          Seq3(sep.length, base.length, 1L), // rep1: the SAME offset
          Seq3(1, 7, 4L)) // offset 1 (1+3), length 7: overlap copy of 'x'
        val lits = cat(lit1, sep, "x".getBytes(utf8))
        frameOf(content, Array(compOrRaw(lits, seqs, four = false, content)))
      case 5 =>
        val rev = base.reverse
        val f = treelessFrame(base, rev)
        if (f != null) f
        else frameOf(cat(base, rev), Array(rawBlock(cat(base, rev))))
      case 4 =>
        val zRun = 30 + (id % 8).toInt
        val zs = new Array[Byte](zRun)
        java.util.Arrays.fill(zs, 'z'.toByte)
        val tail = "!end".getBytes(utf8)
        val content = cat(base, zs, tail)
        val rle: (Int, Array[Byte], Int) = (1, Array('z'.toByte), zRun)
        frameOf(content, Array(rawBlock(base), rle,
          compOrRaw(tail, Array.empty[Seq3], four = false, tail)))
      case _ =>
        frameOf(base,
          Array(compOrRaw(base, Array.empty[Seq3], four = false, base)))
    }
  }
}

/** `binary -> binary`: the decoded content of every regular frame,
  * concatenated; NULL when the buffer is not zstd or nothing decodes. */
case class ZstdDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_decode"

  override protected def nullSafeEval(input: Any): Any =
    ZstdBlockEval.decodeContent(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zd")
      s"""
         |byte[] $res = graft.functions.ZstdBlockEval.decodeContent($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZstdDecode =
    copy(child = newChild)
}

/** `binary -> long`: packed decode verdicts — 1<<48 | truncated<<44 |
  * (checksumOk+1)<<40 | nFrames<<32 | nSkippable<<24 | min(len, 2^24-1);
  * NULL when not zstd. checksumOk: -1 none present, 0 failed, 1 all ok. */
case class ZstdDecodeMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_decode_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ZstdBlockEval.decodeMetaPacked(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zm")
      s"""
         |long $res = graft.functions.ZstdBlockEval.decodeMetaPacked($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZstdDecodeMeta =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q188's synthesis — real compressed
  * blocks (Huffman literals, predefined-FSE sequences, XXH64). */
case class ZstdDeepSynth(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_deep_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    ZstdBlockEval.synth(text.asInstanceOf[Array[Byte]],
      params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.ZstdBlockEval.synth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZstdDeepSynth =
    copy(left = newLeft, right = newRight)
}

/** `binary -> binary`: intake-grade decode — NULL unless every frame
  * decoded whole with passing checksums (q97's transport stance). */
case class ZstdDecodeStrict(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_decode_strict"

  override protected def nullSafeEval(input: Any): Any =
    ZstdBlockEval.decodeContentStrict(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zs")
      s"""
         |byte[] $res = graft.functions.ZstdBlockEval.decodeContentStrict($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZstdDecodeStrict =
    copy(child = newChild)
}

/** `binary -> binary`: the general-purpose compressor (chunked
  * Huffman-literal blocks, raw fallback, windowed + checksummed). */
case class ZstdCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_compress"

  override protected def nullSafeEval(input: Any): Any =
    ZstdBlockEval.compress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ZstdBlockEval.compress($b)")

  override protected def withNewChildInternal(
      newChild: Expression): ZstdCompress =
    copy(child = newChild)
}

/** `(binary, binary) -> binary`: decode against a SIDECAR DICTIONARY
  * (right side — a broadcast blob, the blocklist-dim pattern):
  * dictionary-keyed frames decode when the ids match and refuse
  * otherwise; plain frames decode as always; NULL when not zstd. */
case class ZstdDecodeDict(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_decode_dict"

  override protected def nullSafeEval(b: Any, d: Any): Any =
    ZstdBlockEval.decodeDictContent(b.asInstanceOf[Array[Byte]],
      d.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, d) => {
      val res = ctx.freshName("zdd")
      s"""
         |byte[] $res = graft.functions.ZstdBlockEval.decodeDictContent($b, $d);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZstdDecodeDict =
    copy(left = newLeft, right = newRight)
}

/** `(text, id) -> binary`: a dictionary-keyed frame against the
  * profile dictionary ([[ZstdBlockEval.dictFrame]]). */
case class ZstdDictFrame(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_dict_frame"

  override protected def nullSafeEval(t: Any, id: Any): Any =
    ZstdBlockEval.dictFrame(t.asInstanceOf[Array[Byte]],
      id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, i) => s"graft.functions.ZstdBlockEval.dictFrame($t, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZstdDictFrame =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the zstd block-decode kernels. */
object ZstdBlockOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def zstdDecode(b: Column): Column = ColumnBridge.column(ZstdDecode(bin(b)))
  def zstdDecodeDict(b: Column, dict: Column): Column =
    ColumnBridge.column(ZstdDecodeDict(bin(b), bin(dict)))
  def zstdDictFrame(text: Column, id: Column): Column =
    ColumnBridge.column(ZstdDictFrame(bin(text),
      ColumnBridge.expression(id.cast("long"))))
  def zstdDecodeMeta(b: Column): Column =
    ColumnBridge.column(ZstdDecodeMeta(bin(b)))
  def zstdDecodeStrict(b: Column): Column =
    ColumnBridge.column(ZstdDecodeStrict(bin(b)))
  def zstdCompress(b: Column): Column =
    ColumnBridge.column(ZstdCompress(bin(b)))

  def zstdDeepSynth(text: Column, params: Column): Column =
    ColumnBridge.column(ZstdDeepSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
