package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** TIFF header metadata — the scanned-documents format the image-meta
  * family (q39: PNG/JPEG/GIF/WebP dims) was missing: dimensions live in
  * IFD tag entries at VARIABLE positions under EITHER byte order, so
  * the walk is a real parse — `II*\0` / `MM\0*` magic, the u32 offset
  * to IFD 0, a 12-byte-entry scan for ImageWidth (256) and ImageLength
  * (257) with inline SHORT/LONG values (a SHORT's 2 value bytes sit at
  * the FRONT of the 4-byte field in both orders — the classic
  * endianness trap this kernel exists to get right).
  *
  * Stop-don't-guess: a bad magic refuses outright; a well-formed header
  * whose IFD is truncated, out of bounds, missing either dimension tag,
  * or carrying a non-SHORT/LONG or multi-count dimension keeps NULL
  * dims (the q39 meta split: format recognition survives what value
  * parsing refuses). Packed `width<<32 | height` like `graft_jpeg_dims`.
  */
object TiffEval {

  private final val NoDims = java.lang.Long.MIN_VALUE

  /** Packed dims of IFD 0, or the NULL-marker. */
  def dims(b: Array[Byte]): Long = {
    if (b == null || b.length < 8) return NoDims
    val le = (b(0) & 0xFF) == 'I' && (b(1) & 0xFF) == 'I'
    val be = (b(0) & 0xFF) == 'M' && (b(1) & 0xFF) == 'M'
    if (!le && !be) return NoDims
    def u16(off: Int): Int =
      if (off + 1 >= b.length) -1
      else if (le) (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
      else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    def u32(off: Int): Long =
      if (off + 3 >= b.length) -1L
      else if (le) (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
      else ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    if (u16(2) != 42) return NoDims
    val ifd = u32(4)
    if (ifd < 8 || ifd > Int.MaxValue - 2) return NoDims
    val p0 = ifd.toInt
    val n = u16(p0)
    if (n <= 0) return NoDims
    var width = -1L
    var height = -1L
    var i = 0
    while (i < n) {
      val e = p0 + 2 + i * 12
      if (e + 11 >= b.length) return NoDims // truncated entry table
      val tag = u16(e)
      if (tag == 256 || tag == 257) {
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        if (cnt != 1L) return NoDims
        // inline value: SHORT reads the FIRST two bytes of the value
        // field, LONG all four — in the file's own byte order
        val v = typ match {
          case 3 => u16(e + 8).toLong
          case 4 => u32(e + 8)
          case _ => return NoDims
        }
        if (v <= 0) return NoDims
        if (tag == 256) width = v else height = v
      }
      i += 1
    }
    if (width < 0 || height < 0) return NoDims
    (width << 32) | height
  }

  /** TIFF magic recognition alone (the q39 format split). */
  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && {
      val le = (b(0) & 0xFF) == 'I' && (b(1) & 0xFF) == 'I' &&
        (b(2) & 0xFF) == 42 && (b(3) & 0xFF) == 0
      val be = (b(0) & 0xFF) == 'M' && (b(1) & 0xFF) == 'M' &&
        (b(2) & 0xFF) == 0 && (b(3) & 0xFF) == 42
      le || be
    }

  // ───────────────────────────── synthesis ─────────────────────────────

  /** Synthesize a minimal TIFF: header in the chosen order, an IFD with
    * decoy tags around the dimension entries (NewSubfileType before,
    * Compression + SamplesPerPixel after — a positional reader fails),
    * width as `shortW ? SHORT : LONG`, height always LONG.
    */
  def synth(w: Int, h: Int, littleEndian: Boolean, shortW: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(128)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit =
      if (littleEndian) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit =
      if (littleEndian) { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
      else { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    if (littleEndian) { u8('I'); u8('I') } else { u8('M'); u8('M') }
    u16(42)
    u32(8L) // IFD immediately after the header
    val entries = 5
    u16(entries)
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      u16(tag); u16(typ); u32(1L)
      if (typ == 3) { u16(value.toInt); u16(0) } // SHORT pads the field
      else u32(value)
    }
    entry(254, 4, 0L) // NewSubfileType decoy
    entry(256, if (shortW) 3 else 4, w.toLong)
    entry(257, 4, h.toLong)
    entry(259, 3, 1L) // Compression = none
    entry(277, 3, 1L) // SamplesPerPixel
    u32(0L) // next-IFD terminator
    out.toByteArray
  }
}

/** `binary -> long`: packed TIFF dims (`width<<32 | height`) via
  * [[TiffEval.dims]]; NULL on refusal.
  */
case class TiffDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TiffEval.dims(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tdims")
      s"""
         |long $res = graft.functions.TiffEval.dims($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TiffDims =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q129's synthesis — `shape`
  * packs `w | h<<16 | le<<32 | shortW<<33`.
  */
case class TiffSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    TiffEval.synth((sh & 0xFFFF).toInt, ((sh >> 16) & 0xFFFF).toInt,
      ((sh >> 32) & 1) == 1, ((sh >> 33) & 1) == 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (_, sh) =>
      s"graft.functions.TiffEval.synth((int)($sh & 0xFFFF), " +
        s"(int)(($sh >> 16) & 0xFFFF), (($sh >> 32) & 1) == 1, " +
        s"(($sh >> 33) & 1) == 1)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TiffSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the TIFF kernels. */
object TiffOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def tiffDims(bin: Column): Column =
    ColumnBridge.column(TiffDims(ColumnBridge.expression(bin.cast("binary"))))

  def tiffSynth(seed: Column, shape: Column): Column =
    ColumnBridge.column(TiffSynth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
