package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** LZ4 FRAME decode (q190) — the low-latency member of the
  * compression family (q95 gzip, q188 zstd): feature stores, Kafka
  * topics, and fast shuffles hand corpora over as `.lz4`, and the
  * frame spec (v1.6.x, public) has its own traps:
  *
  *  - the frame descriptor's flags gate FOUR optional fields (content
  *    size, dict id, per-block checksums, content checksum) — a
  *    reader that assumes any fixed layout shears on the first flag
  *    combination it didn't expect; the HC byte is the SECOND byte of
  *    XXH32 over the descriptor and is VERIFIED (a corrupted header
  *    must not parameterize a decode);
  *  - each block's u32le size carries the UNCOMPRESSED-block bit in
  *    its high bit — uncompressed blocks copy verbatim; size 0 is the
  *    EndMark;
  *  - the block grammar is token-coded: high nibble = literal run
  *    length, low nibble = match length − 4, both extending by
  *    255-valued bytes; the 2-byte little-endian offset may reach
  *    into PREVIOUS blocks (block-linked mode) and may OVERLAP the
  *    output being written (offset < length — the RLE idiom, copied
  *    byte-at-a-time); offset 0 is malformed; the final sequence ends
  *    at the block boundary after its literals (no offset);
  *  - XXH32 (not 64 — the 32-bit variant with its own primes) seals
  *    blocks and content; both are VERIFIED when present;
  *  - skippable frames (`0x184D2A5x`) frame past by their u32le size;
  *    the LEGACY frame magic (0x184C2102) refuses — stated scope.
  *
  * Stance: q82's stop-don't-guess — a malformed byte keeps every
  * earlier frame and flags `truncated`; a failed checksum (header,
  * block, or content) refuses the frame it guards. Resource guard:
  * 1 MiB decoded per buffer. Interop: ZstdDecodeSpec's sibling drill
  * in Lz4DecodeSpec embeds frames the reference `lz4` CLI produced,
  * and the CLI decodes every synthesis class (dev-verified).
  */
object Lz4Eval {

  private val MaxOut = 1 << 20

  final case class Dec(content: Array[Byte], nFrames: Int, nSkippable: Int,
                       nBlocks: Int, truncated: Int, checksums: Int,
                       checksumOk: Int, declared: Long)

  // ------------------------------------------------------------ XXH32

  private val P1 = 0x9E3779B1
  private val P2 = 0x85EBCA77
  private val P3 = 0xC2B2AE3D
  private val P4 = 0x27D4EB2F
  private val P5 = 0x165667B1

  private def le32i(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Canonical xxHash32, seed 0 — the frame's checksum hash. */
  def xxh32(b: Array[Byte], off: Int, len: Int): Int = {
    var i = off
    val end = off + len
    def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    var h = 0
    if (len >= 16) {
      var v1 = P1 + P2
      var v2 = P2
      var v3 = 0
      var v4 = -P1
      while (i + 16 <= end) {
        v1 = rotl(v1 + le32i(b, i) * P2, 13) * P1; i += 4
        v2 = rotl(v2 + le32i(b, i) * P2, 13) * P1; i += 4
        v3 = rotl(v3 + le32i(b, i) * P2, 13) * P1; i += 4
        v4 = rotl(v4 + le32i(b, i) * P2, 13) * P1; i += 4
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
    } else h = P5
    h += len
    while (i + 4 <= end) {
      h = rotl(h + le32i(b, i) * P3, 17) * P4
      i += 4
    }
    while (i < end) {
      h = rotl(h + (b(i) & 0xFF) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  private def le32(b: Array[Byte], o: Int): Long = le32i(b, o) & 0xFFFFFFFFL

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  // ------------------------------------------------------------ decode

  /** Grow-tracked output buffer shared across a frame's blocks (the
    * block-linked window reaches back across them). */
  private final class Out {
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

  /** Decode one lz4 block's token grammar into `out`. `frameStart` is
    * the output offset where THIS FRAME began — matches may reach
    * previous blocks of the frame but never a previous frame. */
  private def decodeBlock(b: Array[Byte], start: Int, limit: Int,
                          out: Out, frameStart: Int): Boolean = {
    var i = start
    while (i < limit) {
      val token = b(i) & 0xFF
      i += 1
      // literal run
      var litLen = token >> 4
      if (litLen == 15) {
        var more = 255
        while (more == 255) {
          if (i >= limit) return false
          more = b(i) & 0xFF
          i += 1
          litLen += more
          if (litLen > MaxOut) return false
        }
      }
      if (i + litLen > limit) return false
      if (!out.ensure(litLen)) return false
      System.arraycopy(b, i, out.buf, out.len, litLen)
      out.len += litLen
      i += litLen
      if (i == limit) return true // final sequence: literals only
      // match
      if (i + 2 > limit) return false
      val offset = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      i += 2
      if (offset == 0 || out.len - offset < frameStart) return false
      var matchLen = (token & 0xF) + 4
      if ((token & 0xF) == 15) {
        var more = 255
        while (more == 255) {
          if (i >= limit) return false
          more = b(i) & 0xFF
          i += 1
          matchLen += more
          if (matchLen > MaxOut) return false
        }
      }
      if (!out.ensure(matchLen)) return false
      var src = out.len - offset
      var k = 0
      while (k < matchLen) { // byte-at-a-time: overlap reads fresh bytes
        out.buf(out.len) = out.buf(src)
        out.len += 1; src += 1; k += 1
      }
    }
    true
  }

  /** Decode every frame. Earlier frames serve when a later one is
    * malformed (`truncated = 1`); null when not lz4 at all. */
  def decode(b: Array[Byte]): Dec = {
    if (b == null || b.length < 7) return null
    val out = new Out
    var i = 0
    var frames = 0
    var skippable = 0
    var blocks = 0
    var truncated = 0
    var checksums = 0
    var checksumOk = 1
    var declared = -1L
    var sawAny = false
    var stop = false
    while (!stop) {
      if (i == b.length) stop = true
      else if (i + 4 > b.length) {
        if (!sawAny) return null
        truncated = 1; stop = true
      } else {
        val magic = le32(b, i)
        if (magic == 0x184D2204L) {
          sawAny = true
          val r = decodeFrame(b, i, out)
          if (r == null) { truncated = 1; stop = true }
          else {
            frames += 1
            blocks += r._2
            if (r._3 > 0) { checksums += r._3; if (!r._4) checksumOk = 0 }
            if (r._5 >= 0L && declared < 0L) declared = r._5
            i = r._1
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
          if (!sawAny) return null // legacy frames included: stated refusal
          truncated = 1; stop = true
        }
      }
    }
    if (!sawAny) return null
    Dec(java.util.Arrays.copyOf(out.buf, out.len), frames, skippable,
      blocks, truncated, checksums, if (checksums == 0) -1 else checksumOk,
      declared)
  }

  /** One frame from `i` (magic verified). Returns (nextOffset,
    * nBlocks, nChecksums, checksumsOk, declaredSize) or null. */
  private def decodeFrame(b: Array[Byte], at: Int,
                          out: Out): (Int, Int, Int, Boolean, Long) = {
    var i = at + 4
    if (i + 2 > b.length) return null
    val flg = b(i) & 0xFF
    if ((flg >> 6) != 1) return null // version must be 01
    if ((flg & 0x02) != 0) return null // reserved bit
    val blockChecksum = (flg & 0x10) != 0
    val hasSize = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    val hasDict = (flg & 0x01) != 0
    val descStart = i
    i += 2 // FLG + BD
    val bd = b(descStart + 1) & 0xFF
    if ((bd & 0x8F) != 0) return null // BD reserved bits
    val bmax = (bd >> 4) & 7
    if (bmax < 4) return null // 4..7 are the legal block-max codes
    var declared = -1L
    if (hasSize) {
      if (i + 8 > b.length) return null
      declared = le64(b, i)
      i += 8
    }
    if (hasDict) {
      if (i + 4 > b.length) return null
      i += 4 // dict id: stated scope accepts only id 0 semantics below
      // an external dictionary cannot be resolved — refuse the frame
      return null
    }
    if (i + 1 > b.length) return null
    // HC: second byte of xxh32 over the descriptor (FLG..dictId)
    val hc = b(i) & 0xFF
    val want = (xxh32(b, descStart, i - descStart) >> 8) & 0xFF
    if (hc != want) return null
    i += 1
    val frameStart = out.len
    var nBlocks = 0
    var nCk = 0
    var ckOk = true
    var done = false
    while (!done) {
      if (i + 4 > b.length) return null
      val bsWord = le32(b, i)
      i += 4
      if (bsWord == 0L) done = true // EndMark
      else {
        val stored = (bsWord & 0x80000000L) != 0L
        val bsize = (bsWord & 0x7FFFFFFFL).toInt
        if (bsize <= 0 || i + bsize > b.length) return null
        if (stored) {
          if (!out.ensure(bsize)) return null
          System.arraycopy(b, i, out.buf, out.len, bsize)
          out.len += bsize
        } else {
          if (!decodeBlock(b, i, i + bsize, out, frameStart)) return null
        }
        if (blockChecksum) {
          if (i + bsize + 4 > b.length) return null
          nCk += 1
          if (le32(b, i + bsize) != (xxh32(b, i, bsize) & 0xFFFFFFFFL))
            ckOk = false
          i += 4
        }
        i += bsize
        nBlocks += 1
      }
    }
    val contentLen = out.len - frameStart
    if (declared >= 0L && contentLen.toLong != declared) return null
    if (contentChecksum) {
      if (i + 4 > b.length) return null
      nCk += 1
      if (le32(b, i) !=
        (xxh32(out.buf, frameStart, contentLen) & 0xFFFFFFFFL)) ckOk = false
      i += 4
    }
    (i, nBlocks, nCk, ckOk, declared)
  }

  def decodeContent(b: Array[Byte]): Array[Byte] = {
    val r = decode(b)
    if (r == null) null else r.content
  }

  /** Packed verdicts: 1<<48 | truncated<<44 | (checksumOk+1)<<40 |
    * nFrames<<32 | nBlocks<<24 | min(len, 2^24-1); -1 when not lz4. */
  def decodeMetaPacked(b: Array[Byte]): Long = {
    val r = decode(b)
    if (r == null) return -1L
    (1L << 48) | (r.truncated.toLong << 44) |
      ((r.checksumOk + 1).toLong << 40) |
      (math.min(r.nFrames, 0xFF).toLong << 32) |
      (math.min(r.nBlocks, 0xFF).toLong << 24) |
      math.min(r.content.length, (1 << 24) - 1).toLong
  }

  // ------------------------------------------------------------ encoder

  private final class BW {
    val o = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = o.write(v & 0xFF)
    def u32(v: Long): Unit = {
      var k = 0
      while (k < 4) { u8(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    def bytes(a: Array[Byte]): Unit = o.write(a, 0, a.length)
  }

  /** One planned sequence of the block grammar (final sequence:
    * matchLen < 0 means literals-only ending the block). */
  final case class LSeq(lits: Array[Byte], offset: Int, matchLen: Int)

  private def encodeBlock(seqs: Array[LSeq]): Array[Byte] = {
    val w = new BW
    seqs.foreach { s =>
      val ll = s.lits.length
      val ml = if (s.matchLen < 0) 0 else s.matchLen - 4
      val token = (math.min(ll, 15) << 4) |
        (if (s.matchLen < 0) 0 else math.min(ml, 15))
      w.u8(token)
      if (ll >= 15) {
        var rest = ll - 15
        while (rest >= 255) { w.u8(255); rest -= 255 }
        w.u8(rest)
      }
      w.bytes(s.lits)
      if (s.matchLen >= 0) {
        w.u8(s.offset & 0xFF); w.u8((s.offset >> 8) & 0xFF)
        if (ml >= 15) {
          var rest = ml - 15
          while (rest >= 255) { w.u8(255); rest -= 255 }
          w.u8(rest)
        }
      }
    }
    w.o.toByteArray
  }

  /** One frame with the given blocks, each (isStored, blockBytes);
    * flags choose block checksums, a declared content size, and the
    * content checksum. The HC byte is computed for real. */
  def frameOf(content: Array[Byte], blocks: Array[(Boolean, Array[Byte])],
              blockCk: Boolean, declareSize: Boolean,
              contentCk: Boolean): Array[Byte] = {
    val w = new BW
    w.u32(0x184D2204L)
    val desc = new BW
    val flg = 0x40 | (if (blockCk) 0x10 else 0) |
      (if (declareSize) 0x08 else 0) | (if (contentCk) 0x04 else 0)
    desc.u8(flg)
    desc.u8(4 << 4) // BD: 64 KB block max
    if (declareSize) {
      var k = 0
      while (k < 8) {
        desc.u8(((content.length.toLong >> (8 * k)) & 0xFF).toInt); k += 1
      }
    }
    val db = desc.o.toByteArray
    w.bytes(db)
    w.u8((xxh32(db, 0, db.length) >> 8) & 0xFF)
    blocks.foreach { case (stored, body) =>
      w.u32(body.length.toLong | (if (stored) 0x80000000L else 0L))
      w.bytes(body)
      if (blockCk) w.u32(xxh32(body, 0, body.length) & 0xFFFFFFFFL)
    }
    w.u32(0L) // EndMark
    if (contentCk) w.u32(xxh32(content, 0, content.length) & 0xFFFFFFFFL)
    w.o.toByteArray
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q190 member. `params` packs `doc_id | mode<<40`;
    * base = `w0 + " " + w1 + "#" + (id % 97)` (the family spelling).
    * 0 -> one compressed literals-only block, content checksum;
    * 1 -> a real match (content = base|base) + an offset-1 overlap
    *      run of 9 'y's, block + content checksums;
    * 2 -> an UNCOMPRESSED (stored-bit) block beside a compressed one,
    *      declared content size — content = base + "/" + base;
    * 3 -> two frames back to back (content concatenates);
    * 4 -> a long literal run (> 270 bytes: two length-extension
    *      bytes) — content = base + 300 residue bytes.
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
    mode match {
      case 1 =>
        val sep = "|".getBytes(utf8)
        val ys = new Array[Byte](10)
        java.util.Arrays.fill(ys, 'y'.toByte)
        val want = cat(base, sep, base, ys)
        // seq1: literals base+"|", match back len(base)+1 copying base;
        // seq2: literal "y", offset-1 OVERLAP match of 4 more 'y's;
        // final sequence: the last 5 'y's as literals (the spec's
        // end-of-block rule: a block ends after literals, no offset)
        val endLits = new Array[Byte](5)
        java.util.Arrays.fill(endLits, 'y'.toByte)
        val block = encodeBlock(Array(
          LSeq(cat(base, sep), base.length + 1, base.length),
          LSeq("y".getBytes(utf8), 1, 4),
          LSeq(endLits, 0, -1)))
        frameOf(want, Array((false, block)), blockCk = true,
          declareSize = false, contentCk = true)
      case 2 =>
        val sep = "/".getBytes(utf8)
        val content = cat(base, sep, base)
        val stored = cat(base, sep)
        val comp = encodeBlock(Array(LSeq(base, 0, -1)))
        frameOf(content, Array((true, stored), (false, comp)),
          blockCk = false, declareSize = true, contentCk = true)
      case 3 =>
        val f1 = frameOf(base, Array((false, encodeBlock(
          Array(LSeq(base, 0, -1))))), blockCk = false,
          declareSize = true, contentCk = true)
        val tail = ("+" + w1).getBytes(utf8)
        val f2 = frameOf(tail, Array((false, encodeBlock(
          Array(LSeq(tail, 0, -1))))), blockCk = false,
          declareSize = false, contentCk = true)
        cat(f1, f2)
      case 4 =>
        val extra = new Array[Byte](300)
        var k = 0
        while (k < 300) { extra(k) = ('a' + ((id + k * 7) % 26)).toInt.toByte; k += 1 }
        val content = cat(base, extra)
        frameOf(content, Array((false, encodeBlock(
          Array(LSeq(content, 0, -1))))), blockCk = false,
          declareSize = false, contentCk = true)
      case _ =>
        frameOf(base, Array((false, encodeBlock(
          Array(LSeq(base, 0, -1))))), blockCk = false,
          declareSize = false, contentCk = true)
    }
  }
}

/** `binary -> binary`: decoded lz4 content; NULL when not lz4. */
case class Lz4Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lz4_decode"

  override protected def nullSafeEval(input: Any): Any =
    Lz4Eval.decodeContent(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("l4")
      s"""
         |byte[] $res = graft.functions.Lz4Eval.decodeContent($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Lz4Decode =
    copy(child = newChild)
}

/** `binary -> long`: packed lz4 decode verdicts; NULL when not lz4. */
case class Lz4DecodeMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lz4_decode_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Lz4Eval.decodeMetaPacked(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("lm")
      s"""
         |long $res = graft.functions.Lz4Eval.decodeMetaPacked($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Lz4DecodeMeta =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q190's synthesis. */
case class Lz4Synth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lz4_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    Lz4Eval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.Lz4Eval.synth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lz4Synth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the lz4 kernels. */
object Lz4Ops {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def lz4Decode(b: Column): Column = ColumnBridge.column(Lz4Decode(bin(b)))
  def lz4DecodeMeta(b: Column): Column =
    ColumnBridge.column(Lz4DecodeMeta(bin(b)))

  def lz4Synth(text: Column, params: Column): Column =
    ColumnBridge.column(Lz4Synth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
