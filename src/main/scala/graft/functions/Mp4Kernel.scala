package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd MP4 (ISO BMFF) track-dimension scan over a `binary` column.
  *
  * Like JPEG's SOF segment ([[JpegDims]]), MP4 video dimensions live at a
  * VARIABLE offset: the `tkhd` track-header box sits inside
  * `moov` → `trak`, and anything (`ftyp`, `free`, `mdat`, …) of any size
  * can precede `moov`. Fixed-offset `substring` builtins cannot reach it,
  * so this is the same preference-order (b) custom Catalyst expression: a
  * primitive byte walk inside whole-stage codegen, zero per-row
  * allocation.
  *
  * Box walk per ISO/IEC 14496-12 §4.2: each box is `size(u32be)
  * type(4cc)` with `size == 0` meaning to-end-of-file and `size == 1`
  * meaning a 64-bit `largesize` follows the type. Pure container boxes on
  * the path (`moov`, `trak`) are DESCENDED into (the walk continues at
  * their first child — their end coincides with the next sibling, so one
  * flat loop suffices); every other box is skipped whole, which is what
  * keeps look-alike bytes inside `mdat` from being misread as boxes.
  * `tkhd` is a FullBox: after version/flags, the 16.16 fixed-point width
  * and height sit at payload offset 76 (version 0, 32-bit times) or 88
  * (version 1, 64-bit times); the integer part is the high 16 bits. An
  * audio track carries width 0 — the walk continues to the next `trak`
  * and returns the FIRST track with a nonzero width.
  *
  * Returns `(width << 32) | height` packed in one LONG (same contract as
  * [[JpegDims]]); NULL when no video `tkhd` is found before the walk ends
  * or the structure is malformed (a size that runs past the payload,
  * a truncated header). Container sniffing (`ftyp`) is the CALLER's
  * fixed-offset check — the walk itself only needs well-formed boxes.
  */
case class Mp4Dims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val bb = input.asInstanceOf[Array[Byte]]
    val len = bb.length
    def be32(o: Int): Long =
      (((bb(o) & 0xFF) << 24) | ((bb(o + 1) & 0xFF) << 16) |
        ((bb(o + 2) & 0xFF) << 8) | (bb(o + 3) & 0xFF)) & 0xFFFFFFFFL
    var i = 0
    while (i + 8 <= len) {
      val size = be32(i)
      val typ = be32(i + 4)
      var hdr = 8
      var end = 0L
      if (size == 0L) end = len.toLong
      else if (size == 1L) {
        if (i + 16 > len) return null
        val big = (be32(i + 8) << 32) | be32(i + 12)
        if (big < 16L || i + big > len) return null
        end = i + big; hdr = 16
      } else {
        if (size < 8L) return null
        end = i + size
        if (end > len) return null
      }
      if (typ == 0x6D6F6F76L || typ == 0x7472616BL) { // moov / trak: descend
        i += hdr
      } else {
        if (typ == 0x746B6864L && i + hdr < len) { // tkhd
          val v = bb(i + hdr) & 0xFF
          val woff = i + hdr + (if (v == 1) 88 else 76)
          if (woff + 8 <= end && woff + 8 <= len) {
            val w = ((bb(woff) & 0xFF) << 8) | (bb(woff + 1) & 0xFF)
            val h = ((bb(woff + 4) & 0xFF) << 8) | (bb(woff + 5) & 0xFF)
            if (w != 0) return (w.toLong << 32) | h.toLong
          }
        }
        i = end.toInt
      }
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val bb = ctx.freshName("bb")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val size = ctx.freshName("size")
      val typ = ctx.freshName("typ")
      val hdr = ctx.freshName("hdr")
      val end = ctx.freshName("end")
      val big = ctx.freshName("big")
      val v = ctx.freshName("v")
      val woff = ctx.freshName("woff")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val scan = ctx.freshName("mp4scan")
      // be32 as an inline expression (mirrors nullSafeEval's reader)
      def be32(o: String) =
        s"(((($bb[$o] & 0xFF) << 24) | (($bb[($o) + 1] & 0xFF) << 16) | " +
          s"(($bb[($o) + 2] & 0xFF) << 8) | ($bb[($o) + 3] & 0xFF)) & 0xFFFFFFFFL)"
      s"""
         |${ev.isNull} = true;
         |$scan: {
         |  final byte[] $bb = $bytes;
         |  final int $len = $bb.length;
         |  int $i = 0;
         |  while ($i + 8 <= $len) {
         |    long $size = ${be32(i)};
         |    final long $typ = ${be32(s"$i + 4")};
         |    int $hdr = 8;
         |    long $end;
         |    if ($size == 0L) { $end = (long) $len; }
         |    else if ($size == 1L) {
         |      if ($i + 16 > $len) break $scan;
         |      final long $big = (${be32(s"$i + 8")} << 32) | ${be32(s"$i + 12")};
         |      if ($big < 16L || $i + $big > $len) break $scan;
         |      $end = $i + $big; $hdr = 16;
         |    } else {
         |      if ($size < 8L) break $scan;
         |      $end = $i + $size;
         |      if ($end > $len) break $scan;
         |    }
         |    if ($typ == 0x6D6F6F76L || $typ == 0x7472616BL) {
         |      $i += $hdr;
         |    } else {
         |      if ($typ == 0x746B6864L && $i + $hdr < $len) {
         |        final int $v = $bb[$i + $hdr] & 0xFF;
         |        final int $woff = $i + $hdr + (($v == 1) ? 88 : 76);
         |        if ($woff + 8 <= $end && $woff + 8 <= $len) {
         |          final int $w = (($bb[$woff] & 0xFF) << 8) | ($bb[$woff + 1] & 0xFF);
         |          final int $h = (($bb[$woff + 4] & 0xFF) << 8) | ($bb[$woff + 5] & 0xFF);
         |          if ($w != 0) {
         |            ${ev.value} = (((long) $w) << 32) | (long) $h;
         |            ${ev.isNull} = false;
         |            break $scan;
         |          }
         |        }
         |      }
         |      $i = (int) $end;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Dims =
    copy(child = newChild)
}

/** Sample-table walk for REAL frame decode inside the MP4 container — the
  * discipline that retired q57's md5 stand-in for Y4M (q60), applied to
  * ISO BMFF itself: an uncompressed-video trak addresses its frames
  * through `stbl`'s four tables, and resolving them is pure byte
  * arithmetic, no codec anywhere.
  *
  * Supported trak class — deliberately narrow so nothing ever parses as
  * garbage: the FIRST trak whose `stsd` entry is format `'raw '` with
  * depth 8 (uncompressed 8-bit grayscale, one byte per pixel, so sample
  * bytes ARE luma). Each sample must be exactly `width*height` bytes —
  * a mismatch refuses the whole trak rather than folding stray bytes.
  *
  * Resolution per ISO/IEC 14496-12 §8.7: `stsz` gives per-sample sizes
  * (fixed or table), `stsc` maps samples to chunks in first-chunk runs,
  * `stco`/`co64` gives each chunk's FILE offset; sample k's bytes start
  * at its chunk's offset plus the sizes of the samples before it in that
  * chunk. Offsets address the whole file, so `moov`-before-`mdat` and
  * `mdat`-before-`moov` layouts both work — and a TRUNCATED file (the
  * half-written 100 TB ingest case) surfaces as NULL because some
  * sample's resolved range runs past the payload, exactly the check a
  * fixed "frames start after the header" shortcut cannot make.
  */
private[functions] object Mp4Walk {
  // info array layout (all Long): w, h, count, fixedSize (0 = table),
  // stszTableOff, stscOff, stscCnt, stcoOff, stcoCnt, co64Flag
  final val W = 0; final val H = 1; final val N = 2; final val FIX = 3
  final val SZOFF = 4; final val SCOFF = 5; final val SCCNT = 6
  final val COOFF = 7; final val COCNT = 8; final val CO64 = 9

  private def be32(bb: Array[Byte], o: Int): Long =
    (((bb(o) & 0xFF) << 24) | ((bb(o + 1) & 0xFF) << 16) |
      ((bb(o + 2) & 0xFF) << 8) | (bb(o + 3) & 0xFF)) & 0xFFFFFFFFL
  private def be16(bb: Array[Byte], o: Int): Int =
    ((bb(o) & 0xFF) << 8) | (bb(o + 1) & 0xFF)

  /** Box walk to the first supported video trak's complete sample table.
    * Containers (`moov`/`trak`/`mdia`/`minf`/`stbl`) are descended, a new
    * `trak` RESETS the collected state (an audio trak's tables must never
    * pair with a video trak's `stsd`), everything else is skipped whole —
    * the same flat loop as [[Mp4Dims]]. Null when no trak completes.
    */
  def stblInfo(bb: Array[Byte]): Array[Long] = {
    val len = bb.length
    var i = 0
    var sW = -1L; var sH = -1L
    var fixed = -1L; var count = -1L; var szOff = -1L
    var scOff = -1L; var scCnt = -1L
    var coOff = -1L; var coCnt = -1L; var co64 = 0L
    while (i + 8 <= len) {
      val size = be32(bb, i)
      val typ = be32(bb, i + 4)
      var hdr = 8
      var end = 0L
      if (size == 0L) end = len.toLong
      else if (size == 1L) {
        if (i + 16 > len) return null
        val big = (be32(bb, i + 8) << 32) | be32(bb, i + 12)
        if (big < 16L || i + big > len) return null
        end = i + big; hdr = 16
      } else {
        if (size < 8L) return null
        end = i + size
        if (end > len) return null
      }
      if (typ == 0x6D6F6F76L || typ == 0x7472616BL || typ == 0x6D646961L ||
          typ == 0x6D696E66L || typ == 0x7374626CL) { // moov/trak/mdia/minf/stbl
        if (typ == 0x7472616BL) { // new trak: reset collection
          sW = -1; sH = -1; fixed = -1; count = -1; szOff = -1
          scOff = -1; scCnt = -1; coOff = -1; coCnt = -1; co64 = 0
        }
        i += hdr
      } else {
        val p = i + hdr
        if (typ == 0x73747364L) { // stsd: first entry must be 'raw ' depth 8
          if (p + 8 <= end && be32(bb, p + 4) >= 1L && p + 8 + 86 <= end &&
              be32(bb, p + 8) >= 86L && be32(bb, p + 12) == 0x72617720L &&
              be16(bb, p + 8 + 82) == 8) {
            sW = be16(bb, p + 8 + 32); sH = be16(bb, p + 8 + 34)
          }
        } else if (typ == 0x7374737AL) { // stsz
          if (p + 12 <= end) {
            fixed = be32(bb, p + 4); count = be32(bb, p + 8); szOff = p + 12
            if (fixed == 0L && p + 12 + 4 * count > end) { count = -1 }
          }
        } else if (typ == 0x73747363L) { // stsc
          if (p + 8 <= end) {
            scCnt = be32(bb, p + 4); scOff = p + 8
            if (scCnt < 1L || p + 8 + 12 * scCnt > end) scOff = -1
          }
        } else if (typ == 0x7374636FL || typ == 0x636F3634L) { // stco / co64
          if (p + 8 <= end) {
            co64 = if (typ == 0x636F3634L) 1L else 0L
            coCnt = be32(bb, p + 4); coOff = p + 8
            if (coCnt < 1L || p + 8 + (if (co64 == 1L) 8 else 4) * coCnt > end)
              coOff = -1
          }
        }
        if (sW > 0 && sH > 0 && count >= 0 && szOff >= 0 && scOff >= 0 &&
            coOff >= 0) {
          // lane guards, [[Y4mMeta]]'s discipline: refuse, never wrap
          if (sW >= (1L << 20) || sH >= (1L << 20) || count >= (1L << 20) ||
              scCnt >= (1L << 16)) return null
          return Array(sW, sH, count, fixed, szOff, scOff, scCnt,
            coOff, coCnt, co64)
        }
        i = end.toInt
      }
    }
    null
  }

  private def chunkOffset(bb: Array[Byte], info: Array[Long], c: Long): Long =
    if (info(CO64) == 1L)
      (be32(bb, (info(COOFF) + 8 * c).toInt) << 32) |
        be32(bb, (info(COOFF) + 8 * c + 4).toInt)
    else be32(bb, (info(COOFF) + 4 * c).toInt)

  private def sizeOf(bb: Array[Byte], info: Array[Long], k: Long): Long =
    if (info(FIX) > 0L) info(FIX) else be32(bb, (info(SZOFF) + 4 * k).toInt)

  /** Resolve sample `idx` → `(fileOffset, size)`; null on any
    * inconsistency (non-monotonic `stsc` runs, a chunk index past `stco`,
    * a range past the payload).
    */
  def sampleRange(bb: Array[Byte], info: Array[Long], idx: Long): Array[Long] = {
    if (idx < 0 || idx >= info(N)) return null
    val scOff = info(SCOFF); val scCnt = info(SCCNT)
    var cum = 0L; var e = 0L
    var chunk = -1L; var firstInChunk = -1L
    while (e < scCnt && chunk < 0) {
      val fc = be32(bb, (scOff + 12 * e).toInt)
      val spc = be32(bb, (scOff + 12 * e + 4).toInt)
      if (fc < 1L || spc < 1L) return null
      val last = e + 1 == scCnt
      val nextFc = if (last) 0L else be32(bb, (scOff + 12 * (e + 1)).toInt)
      if (!last && nextFc <= fc) return null
      val run = if (last) Long.MaxValue else (nextFc - fc) * spc
      if (last || idx < cum + run) {
        val cir = (idx - cum) / spc
        chunk = fc - 1 + cir
        firstInChunk = cum + cir * spc
      } else cum += run
      e += 1
    }
    if (chunk < 0 || chunk >= info(COCNT)) return null
    var off = chunkOffset(bb, info, chunk)
    var k = firstInChunk
    while (k < idx) { off += sizeOf(bb, info, k); k += 1 }
    val size = sizeOf(bb, info, idx)
    if (off < 0 || size < 0 || off + size > bb.length) return null
    Array(off, size)
  }

  /** ONE linear pass over the chunk runs validating every sample: in
    * bounds AND exactly `w*h` bytes (the raw-gray contract). The
    * per-sample [[sampleRange]] would be O(n²) on a table-mode trak —
    * a hostile payload must not buy quadratic work from the meta gate.
    */
  def validateAll(bb: Array[Byte], info: Array[Long]): Boolean = {
    val n = info(N); val frame = info(W) * info(H)
    val scOff = info(SCOFF); val scCnt = info(SCCNT)
    var g = 0L // global sample index
    var e = 0L
    while (e < scCnt && g < n) {
      val fc = be32(bb, (scOff + 12 * e).toInt)
      val spc = be32(bb, (scOff + 12 * e + 4).toInt)
      if (fc < 1L || spc < 1L) return false
      val last = e + 1 == scCnt
      val nextFc = if (last) Long.MaxValue else be32(bb, (scOff + 12 * (e + 1)).toInt)
      if (!last && nextFc <= fc) return false
      var c = fc - 1
      while ((last || c < nextFc - 1) && g < n) {
        if (c >= info(COCNT)) return false
        var off = chunkOffset(bb, info, c)
        var s = 0L
        while (s < spc && g < n) {
          val size = sizeOf(bb, info, g)
          if (size != frame || off + size > bb.length || off < 0) return false
          off += size; g += 1; s += 1
        }
        c += 1
      }
      e += 1
    }
    g == n
  }
}

/** The shared evaluation bodies, called from BOTH the interpreted eval and
  * the generated code — one implementation, zero parity surface (the
  * [[Y4mEval]] technique).
  */
object Mp4Eval {
  /** `(width << 40) | (height << 20) | nSamples`, or null when the payload
    * has no supported trak or ANY declared sample fails the bounds /
    * frame-size validation — the meta is the GATE: a payload it accepts
    * decodes every frame for real.
    */
  def sampleInfo(bb: Array[Byte]): java.lang.Long = {
    val info = Mp4Walk.stblInfo(bb)
    if (info == null) return null
    if (!Mp4Walk.validateAll(bb, info)) return null
    java.lang.Long.valueOf(
      (info(Mp4Walk.W) << 40) | (info(Mp4Walk.H) << 20) | info(Mp4Walk.N))
  }

  /** REAL pixel statistics of sample `idx` —
    * `(sumLuma << 16) | (maxLuma << 8) | minLuma`, [[Y4mFrameLuma]]'s
    * packed contract for the MP4 container.
    */
  def frameLuma(bb: Array[Byte], idx: Int): java.lang.Long = {
    if (idx < 0) return null
    val info = Mp4Walk.stblInfo(bb)
    if (info == null) return null
    val r = Mp4Walk.sampleRange(bb, info, idx.toLong)
    if (r == null || r(1) != info(Mp4Walk.W) * info(Mp4Walk.H)) return null
    var i = r(0).toInt
    val end = (r(0) + r(1)).toInt
    var sum = 0L
    var min = 255
    var max = 0
    while (i < end) {
      val y = bb(i) & 0xFF
      sum += y
      if (y < min) min = y
      if (y > max) max = y
      i += 1
    }
    java.lang.Long.valueOf((sum << 16) | (max.toLong << 8) | min.toLong)
  }
}

/** `binary -> long`: MP4 uncompressed-video sample-table metadata packed
  * as `(width << 40) | (height << 20) | nSamples` — [[Y4mMeta]]'s packed
  * contract resolved through `stsd`/`stsz`/`stsc`/`stco` instead of a
  * frame-header walk. NULL when no supported trak exists or any declared
  * sample fails validation (truncated file, wrong per-sample size).
  */
case class Mp4SampleInfo(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_sample_info"

  override protected def nullSafeEval(input: Any): Any =
    Mp4Eval.sampleInfo(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val boxed = ctx.freshName("mp4Info")
      s"""
         |Object $boxed = graft.functions.Mp4Eval.sampleInfo($bytes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4SampleInfo =
    copy(child = newChild)
}

/** `(binary, int) -> long`: REAL pixel statistics of MP4 sample `idx` —
  * `(sumLuma << 16) | (maxLuma << 8) | minLuma` over the raw-gray frame
  * bytes addressed by the sample table. NULL when the payload is not a
  * supported MP4 or the sample is absent/ill-sized/truncated.
  */
case class Mp4FrameLuma(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_frame_luma"

  override protected def nullSafeEval(bin: Any, idx: Any): Any =
    Mp4Eval.frameLuma(bin.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val boxed = ctx.freshName("mp4Luma")
      s"""
         |Object $boxed = graft.functions.Mp4Eval.frameLuma($bytes, $idx);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Mp4FrameLuma =
    copy(left = newLeft, right = newRight)
}
