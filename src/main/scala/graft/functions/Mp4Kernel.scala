package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
