package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd JPEG dimension scan over a `binary` column.
  *
  * Unlike PNG (whose IHDR chunk the spec pins to a fixed offset), JPEG
  * frame dimensions live in a SOF segment at a VARIABLE offset: the
  * decoder must walk the marker-segment chain (FF <marker> <len16 payload>)
  * from SOI until it meets a start-of-frame marker. That walk cannot be
  * expressed with fixed-offset `substring` builtins, so it is a custom
  * Catalyst expression with `doGenCode` — a primitive byte loop inside
  * whole-stage codegen, zero per-row allocation (same preference-order
  * rationale as [[DotProduct]]).
  *
  * Returns `(width << 32) | height` packed in one LONG (a struct result
  * would force generic codegen), NULL when the payload is not a JPEG or
  * no SOF segment is found before SOS/EOI/corruption. The packed value is
  * split back into int columns by the caller with codegen'd bit ops.
  *
  * Marker walk per ITU T.81 §B: fill bytes (repeated FF) are skipped;
  * standalone markers (TEM 0x01, RST0-7 0xD0-D7) carry no length; SOF is
  * any 0xC0-0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC; its payload is
  * precision(1) height(2) width(2), big-endian. Reaching SOS (0xDA, start
  * of entropy-coded data) or EOI (0xD9) without a SOF means no parseable
  * dimensions.
  */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val bb = input.asInstanceOf[Array[Byte]]
    val len = bb.length
    if (len < 4 || (bb(0) & 0xFF) != 0xFF || (bb(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 1 < len) {
      if ((bb(i) & 0xFF) != 0xFF) return null
      while (i + 1 < len && (bb(i + 1) & 0xFF) == 0xFF) i += 1
      if (i + 1 >= len) return null
      val m = bb(i + 1) & 0xFF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
      else if (m == 0xD9 || m == 0xDA) return null
      else {
        if (i + 3 >= len) return null
        val segLen = ((bb(i + 2) & 0xFF) << 8) | (bb(i + 3) & 0xFF)
        if (segLen < 2) return null
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (i + 8 >= len || segLen < 7) return null
          val h = ((bb(i + 5) & 0xFF) << 8) | (bb(i + 6) & 0xFF)
          val w = ((bb(i + 7) & 0xFF) << 8) | (bb(i + 8) & 0xFF)
          return (w.toLong << 32) | h.toLong
        }
        i += 2 + segLen
      }
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val bb = ctx.freshName("bb")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val segLen = ctx.freshName("segLen")
      val h = ctx.freshName("h")
      val w = ctx.freshName("w")
      val scan = ctx.freshName("jpegscan")
      s"""
         |${ev.isNull} = true;
         |$scan: {
         |  final byte[] $bb = $bytes;
         |  final int $len = $bb.length;
         |  if ($len < 4 || ($bb[0] & 0xFF) != 0xFF || ($bb[1] & 0xFF) != 0xD8) break $scan;
         |  int $i = 2;
         |  while ($i + 1 < $len) {
         |    if (($bb[$i] & 0xFF) != 0xFF) break $scan;
         |    while ($i + 1 < $len && ($bb[$i + 1] & 0xFF) == 0xFF) $i++;
         |    if ($i + 1 >= $len) break $scan;
         |    final int $m = $bb[$i + 1] & 0xFF;
         |    if ($m == 0x01 || ($m >= 0xD0 && $m <= 0xD7)) { $i += 2; continue; }
         |    if ($m == 0xD9 || $m == 0xDA) break $scan;
         |    if ($i + 3 >= $len) break $scan;
         |    final int $segLen = (($bb[$i + 2] & 0xFF) << 8) | ($bb[$i + 3] & 0xFF);
         |    if ($segLen < 2) break $scan;
         |    if ($m >= 0xC0 && $m <= 0xCF && $m != 0xC4 && $m != 0xC8 && $m != 0xCC) {
         |      if ($i + 8 >= $len || $segLen < 7) break $scan;
         |      final int $h = (($bb[$i + 5] & 0xFF) << 8) | ($bb[$i + 6] & 0xFF);
         |      final int $w = (($bb[$i + 7] & 0xFF) << 8) | ($bb[$i + 8] & 0xFF);
         |      ${ev.value} = (((long) $w) << 32) | (long) $h;
         |      ${ev.isNull} = false;
         |      break $scan;
         |    }
         |    $i += 2 + $segLen;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}
