package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** GIF PIXEL decode — the third lossless rung after BMP (q59) and PNG
  * (q121): a pure-JVM GIF87a/89a decoder — logical screen descriptor,
  * global/local color table, extension-block walk, and a REAL variable-
  * width LZW decode (clear/EOI codes, dictionary growth with code-width
  * promotion at 2^w, the KwKwK self-reference case, 12-bit ceiling with
  * deferred clear) — folded to the shared packed Rec.601 luma contract:
  * `min | max<<8 | sum<<16` over the FIRST image frame (palette-mapped;
  * GIF interlace only permutes row order, and the fold is position-free,
  * so both layouts decode identically).
  *
  * Scope is stated, not guessed: the first image descriptor's frame
  * (animated GIFs score their first frame — the thumbnail semantics a
  * corpus pipeline wants); transparency is luma-irrelevant (the indexed
  * entry folds like any other — the q121 RGBA stance). Structural lies
  * refuse with NULL: a frame with neither local nor global color table,
  * an LZW code beyond the dictionary (except the legal KwKwK = next
  * slot), an index past the palette, pixel count different from
  * width·height, truncated sub-blocks, a missing EOI, or dims past
  * 1<<12 per edge (resource guard — the index buffer is bounded).
  *
  * Reference behavior: scholar-stream treats media as opaque blobs; this
  * is a north-star extension of the multimodal family (q39 reads GIF
  * dims only).
  */
object GifPixelEval {

  private final val NoStats = java.lang.Long.MIN_VALUE
  private final val MaxEdge = 1 << 12

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Packed Rec.601 luma stats of a GIF's first frame, or the
    * NULL-marker on refusal.
    */
  def lumaStats(b: Array[Byte]): Long = {
    if (b == null || b.length < 13) return NoStats
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return NoStats
    // logical screen descriptor
    val packed = b(10) & 0xFF
    var pos = 13
    var gct: Array[Byte] = null
    var gctN = 0
    if ((packed & 0x80) != 0) {
      gctN = 1 << ((packed & 0x07) + 1)
      if (pos + gctN * 3 > b.length) return NoStats
      gct = java.util.Arrays.copyOfRange(b, pos, pos + gctN * 3)
      pos += gctN * 3
    }
    // block walk to the first image descriptor
    while (true) {
      if (pos >= b.length) return NoStats
      (b(pos) & 0xFF) match {
        case 0x3B => return NoStats // trailer before any image
        case 0x21 => // extension: label + sub-blocks until terminator
          pos += 2
          var done = false
          while (!done) {
            if (pos >= b.length) return NoStats
            val n = b(pos) & 0xFF
            pos += 1
            if (n == 0) done = true
            else {
              if (pos + n > b.length) return NoStats
              pos += n
            }
          }
        case 0x2C =>
          if (pos + 10 > b.length) return NoStats
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val ipk = b(pos + 9) & 0xFF
          pos += 10
          if (w < 1 || h < 1 || w > MaxEdge || h > MaxEdge) return NoStats
          var pal = gct
          var palN = gctN
          if ((ipk & 0x80) != 0) { // local color table overrides
            palN = 1 << ((ipk & 0x07) + 1)
            if (pos + palN * 3 > b.length) return NoStats
            pal = java.util.Arrays.copyOfRange(b, pos, pos + palN * 3)
            pos += palN * 3
          }
          if (pal == null) return NoStats // no color table anywhere
          return decodeFrame(b, pos, w, h, pal, palN)
        case _ => return NoStats // unknown block introducer
      }
    }
    NoStats
  }

  /** LZW-decode the image data at `pos`, fold palette luma. */
  private def decodeFrame(b: Array[Byte], start: Int, w: Int, h: Int,
                          pal: Array[Byte], palN: Int): Long = {
    var pos = start
    if (pos >= b.length) return NoStats
    val minCode = b(pos) & 0xFF
    pos += 1
    if (minCode < 2 || minCode > 11) return NoStats
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as prefix/suffix tables (4096 ceiling)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    var prev = -1
    val total = w.toLong * h
    var emitted = 0L
    var minL = 255
    var maxL = 0
    var sum = 0L
    val stack = new Array[Int](4096)
    var sawEoi = false
    // bit reader over the sub-block chain (LSB-first packing)
    var acc = 0
    var nbits = 0
    var blockLeft = 0
    def lumaOf(idx: Int): Int =
      (299 * (pal(idx * 3) & 0xFF) + 587 * (pal(idx * 3 + 1) & 0xFF) +
        114 * (pal(idx * 3 + 2) & 0xFF)) / 1000
    def fold(idx: Int): Boolean = {
      if (idx >= palN) return false
      val l = lumaOf(idx)
      sum += l
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      emitted += 1
      true
    }
    def rootOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    def emitChain(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= clear) { // walk suffixes down to the root
        if (sp >= stack.length) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (!fold(c)) return false
      while (sp > 0) { sp -= 1; if (!fold(stack(sp))) return false }
      true
    }
    while (!sawEoi) {
      // read one code of `width` bits
      while (nbits < width) {
        if (blockLeft == 0) {
          if (pos >= b.length) return NoStats
          blockLeft = b(pos) & 0xFF
          pos += 1
          if (blockLeft == 0) return NoStats // terminator before EOI
        }
        if (pos >= b.length) return NoStats
        acc |= (b(pos) & 0xFF) << nbits
        nbits += 8
        pos += 1
        blockLeft -= 1
      }
      val code = acc & ((1 << width) - 1)
      acc >>>= width
      nbits -= width
      if (code == clear) {
        dictSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        sawEoi = true
      } else if (prev == -1) {
        // first code after clear must be a literal root
        if (code >= clear) return NoStats
        if (!fold(code)) return NoStats
        prev = code
      } else {
        if (code > dictSize || code == clear || code == eoi) return NoStats
        if (code == dictSize) {
          // KwKwK: the not-yet-defined next entry = prev + first(prev)
          if (dictSize >= 4096) return NoStats
          prefix(dictSize) = prev
          suffix(dictSize) = rootOf(prev)
          dictSize += 1
          if (!emitChain(code)) return NoStats
        } else {
          if (!emitChain(code)) return NoStats
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = rootOf(code)
            dictSize += 1
          }
        }
        prev = code
      }
      if (!sawEoi && code != clear && dictSize == (1 << width) && width < 12)
        width += 1
      if (emitted > total) return NoStats // more pixels than the frame
    }
    if (emitted != total) return NoStats // short frame
    // the data stream must close with its block terminator. Residual
    // FULL bytes between EOI and the terminator are tolerated ON
    // PURPOSE (stated leniency, not an oversight): GIF89a only defines
    // the sub-block framing, several historical encoders pad the final
    // block, and the pixels those bytes could have carried are already
    // bounded by the emitted == total check above — a padded stream
    // cannot smuggle extra pixels, only dead bits
    if (blockLeft > 0) { pos += blockLeft }
    if (pos >= b.length || (b(pos) & 0xFF) != 0) return NoStats
    minL.toLong | (maxL.toLong << 8) | (sum << 16)
  }

  // ───────────────────────────── synthesis ─────────────────────────────

  /** Palette size for the synthesis classes — shared with q121's PLTE
    * class so the oracle algebra is one formula.
    */
  final val PalN = 32

  private def palR(seed: Long, j: Int): Int =
    (((seed * 2 + j) % 256 + 256) % 256).toInt
  private def palG(seed: Long, j: Int): Int =
    (((seed * 3 + j * 5) % 256 + 256) % 256).toInt
  private def palB(seed: Long, j: Int): Int =
    (((seed + j * 7) % 256 + 256) % 256).toInt

  /** Synthesize a GIF whose 32-entry global table and pixel indices come
    * from the q121 palette residue maps (`idx = (seed + 3x + 5r) % 32`).
    * `variant`: 0 → GIF89a plain; 1 → GIF89a with a graphic-control
    * extension AND the interlace flag set (the decoder's fold is
    * position-free, so stats must equal variant 0's); 2 → GIF87a plain.
    * The LZW stream is literal-only (legal: every code a root) with
    * exact decoder-mirrored width promotion — the hand fixtures in
    * GifPixelSpec cover real dictionary-built streams.
    */
  def synth(seed: Long, w: Int, h: Int, variant: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + w * h)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write((if (variant == 2) "GIF87a" else "GIF89a")
      .getBytes("US-ASCII"), 0, 6)
    u16(w); u16(h)
    u8(0x80 | 0x04) // GCT present, size bits 100 -> 2^5 = 32 entries
    u8(0); u8(0) // background, aspect
    var j = 0
    while (j < PalN) {
      u8(palR(seed, j)); u8(palG(seed, j)); u8(palB(seed, j)); j += 1
    }
    if (variant == 1) { // graphic control extension
      u8(0x21); u8(0xF9); u8(4); u8(0); u16(0); u8(0); u8(0)
    }
    u8(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    u8(if (variant == 1) 0x40 else 0x00) // interlace flag only
    val minCode = 5 // 32 roots
    u8(minCode)
    // literal-only LZW with decoder-mirrored width promotion
    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream(w * h)
    var acc = 0L
    var nbits = 0
    var width = minCode + 1
    var dictSize = eoi + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        data.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    put(clear)
    var first = true
    var r = 0
    while (r < h) {
      var x = 0
      while (x < w) {
        put((((seed + x * 3 + r * 5) % PalN + PalN) % PalN).toInt)
        if (!first) {
          // the decoder defines one dictionary entry per code after the
          // first — mirror its growth so the widths stay in lockstep
          if (dictSize < 4096) dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        first = false
        x += 1
      }
      r += 1
    }
    put(eoi)
    if (nbits > 0) data.write((acc & 0xFF).toInt)
    // chop into sub-blocks of <= 255
    val dd = data.toByteArray
    var off = 0
    while (off < dd.length) {
      val n = math.min(255, dd.length - off)
      u8(n)
      out.write(dd, off, n)
      off += n
    }
    u8(0) // block terminator
    u8(0x3B) // trailer
    out.toByteArray
  }
}

/** `binary -> long`: packed GIF first-frame Rec.601 luma stats via
  * [[GifPixelEval.lumaStats]]; NULL on refusal.
  */
case class GifLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = GifPixelEval.lumaStats(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gluma")
      s"""
         |long $res = graft.functions.GifPixelEval.lumaStats($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifLuma =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q124's synthesis — `shape` packs
  * `w | h<<8 | variant<<16`.
  */
case class GifSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    GifPixelEval.synth(seed.asInstanceOf[Long], (sh & 0xFF).toInt,
      ((sh >> 8) & 0xFF).toInt, ((sh >> 16) & 3).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sh) =>
      s"graft.functions.GifPixelEval.synth($s, (int)($sh & 0xFF), " +
        s"(int)(($sh >> 8) & 0xFF), (int)(($sh >> 16) & 3))")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): GifSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the GIF pixel kernels. */
object GifPixelOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def gifLuma(bin: Column): Column =
    ColumnBridge.column(GifLuma(ColumnBridge.expression(bin.cast("binary"))))

  def gifSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(GifSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
