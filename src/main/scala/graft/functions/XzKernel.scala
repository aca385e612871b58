package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** XZ stream triage (q184 — the `.xz` member of the compression
  * router): the .xz container's OWN metadata plane, read without
  * decoding a block — exactly how `xz --list` answers instantly on a
  * multi-gigabyte archive. The triage is a real parse of the format's
  * v1.2.x framing:
  *
  *  - stream HEADER: 6-byte magic `FD 37 7A 58 5A 00`, 2 stream-flag
  *    bytes (first MUST be zero; second is the check type — none /
  *    CRC32 / CRC64 / SHA-256), CRC32 of the flags;
  *  - stream FOOTER (parsed from EOF — the random-access path):
  *    CRC32, `backward_size` (stored as `realSize/4 − 1`), the SAME
  *    2 stream-flag bytes AGAIN, and the `YZ` magic — a footer whose
  *    flags disagree with the header's marks a SPLICED stream and
  *    refuses (the cross-check the format carries for exactly this);
  *  - the INDEX located by backward_size: `0x00` indicator, a VLI
  *    record count, per-block (unpadded, uncompressed) VLI pairs —
  *    variable-length integers with 7-bit continuation bytes — zero
  *    padding to a 4-byte boundary, and a CRC32 over
  *    indicator..padding that the kernel VERIFIES;
  *  - block content is never touched (stated scope — the q130/q165
  *    header-math stance).
  */
object XzEval {

  final case class Xz(check: Int, nBlocks: Int, uncompressed: Long)

  private val Magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)

  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL

  /** VLI at off: (value, nextOff) or null. */
  private def vli(b: Array[Byte], off: Int, end: Int): Array[Long] = {
    var i = off
    var shift = 0
    var acc = 0L
    while (i < end && shift <= 62) {
      val v = b(i) & 0xFF
      acc |= (v & 0x7FL) << shift
      i += 1
      if ((v & 0x80) == 0) return Array(acc, i.toLong)
      shift += 7
    }
    null
  }

  def parse(b: Array[Byte]): Xz = {
    if (b == null || b.length < 32) return null
    var k = 0
    while (k < 6) { if (b(k) != Magic(k)) return null; k += 1 }
    if (b(6) != 0) return null // first flag byte must be zero
    val check = b(7) & 0xFF
    if (check != 0x00 && check != 0x01 && check != 0x04 && check != 0x0A)
      return null
    val n = b.length
    // footer from EOF
    if (b(n - 2) != 'Y' || b(n - 1) != 'Z') return null
    if (b(n - 4) != 0 || (b(n - 3) & 0xFF) != check)
      return null // spliced stream: footer flags disagree
    val backward = (u32le(b, n - 8) + 1L) * 4L
    val idxStart = n - 12 - backward
    if (idxStart < 12 || idxStart + backward > n - 12 + 1) return null
    var i = idxStart.toInt
    if (b(i) != 0) return null // index indicator
    i += 1
    val cnt = vli(b, i, n)
    if (cnt == null || cnt(0) < 0L || cnt(0) > 1000000L) return null
    i = cnt(1).toInt
    var blocks = 0L
    var total = 0L
    var r = 0L
    while (r < cnt(0)) {
      val up = vli(b, i, n)
      if (up == null) return null
      val uc = vli(b, up(1).toInt, n)
      if (uc == null) return null
      i = uc(1).toInt
      total += uc(0)
      blocks += 1
      r += 1
    }
    // zero padding to a 4-byte boundary (relative to the index start)
    while (((i - idxStart) & 3) != 0) {
      if (i >= n || b(i) != 0) return null
      i += 1
    }
    // the abut check runs BEFORE the CRC read: a crafted
    // backward_size/record-count combination can park `i` within 3
    // bytes of EOF, and reading the u32 first would throw instead of
    // refusing
    if (i + 4 != n - 12) return null // index must abut the footer
    // index CRC32 over indicator..padding, stored LE
    val crc = new java.util.zip.CRC32()
    crc.update(b, idxStart.toInt, i - idxStart.toInt)
    if ((crc.getValue & 0xFFFFFFFFL) != u32le(b, i)) return null
    Xz(check, blocks.toInt, total)
  }

  /** check(8) << 48 | nBlocks(16) << 32 | uncompressed(32); -1 refusal. */
  def meta(b: Array[Byte]): Long = {
    val x = parse(b)
    if (x == null) return -1L
    (x.check.toLong << 48) | (math.min(x.nBlocks, 0xFFFF).toLong << 32) |
      math.min(x.uncompressed, 0xFFFFFFFFL)
  }

  // -------------------------------------------------------------- synth

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def putVli(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  /** Synthesize a q184 xz stream. `params` packs `doc_id | mode<<40`:
    * 0 -> one block, CRC32 check; 1 -> three blocks, CRC64 check,
    * multi-byte VLI sizes; 2 -> footer stream flags corrupted (the
    * spliced-stream refusal); 3 -> `YZ` cut off (truncated). Block
    * content is filler — the triage never reads it.
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val check = if (mode == 1) 0x04 else 0x01
    val o = new java.io.ByteArrayOutputStream()
    o.write(Magic, 0, 6)
    o.write(0); o.write(check)
    val hdrCrc = new java.util.zip.CRC32()
    hdrCrc.update(Array[Byte](0, check.toByte))
    putU32le(o, hdrCrc.getValue)
    // fake block region (never parsed)
    val blockBytes = (16 + id % 32).toInt
    var k = 0
    while (k < blockBytes) { o.write(((id + k * 7) % 251).toInt); k += 1 }
    // index
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(0)
    val nBlocks = if (mode == 1) 3 else 1
    putVli(idx, nBlocks.toLong)
    var bi = 0
    while (bi < nBlocks) {
      putVli(idx, (24 + (id + bi) % 16))
      // uncompressed: multi-byte VLI in mode 1 (values > 127)
      putVli(idx, if (mode == 1) 1000 + (id % 500) + bi else 40 + id % 60)
      bi += 1
    }
    while ((idx.size() & 3) != 0) idx.write(0)
    val ib = idx.toByteArray
    o.write(ib, 0, ib.length)
    val icrc = new java.util.zip.CRC32()
    icrc.update(ib)
    putU32le(o, icrc.getValue)
    // footer
    val backwardStored = (ib.length + 4) / 4 - 1
    val fbody = new java.io.ByteArrayOutputStream()
    putU32le(fbody, backwardStored.toLong)
    fbody.write(0)
    fbody.write(if (mode == 2) check ^ 0x05 else check)
    val fb = fbody.toByteArray
    val fcrc = new java.util.zip.CRC32()
    fcrc.update(fb)
    putU32le(o, fcrc.getValue)
    o.write(fb, 0, fb.length)
    o.write('Y'); o.write('Z')
    val all = o.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 2)
    else all
  }
}

/** `binary -> long`: packed xz triage; NULL on refusal. */
case class XzMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = XzEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("xm")
      s"""
         |long $res = graft.functions.XzEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XzMeta =
    copy(child = newChild)
}

/** `long -> binary`: q184's xz synthesis. */
case class XzSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xz_synth"

  override protected def nullSafeEval(params: Any): Any =
    XzEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.XzEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): XzSynth =
    copy(child = newChild)
}

/** Column surface for the xz kernels. */
object XzOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def xzMeta(b: Column): Column = ColumnBridge.column(XzMeta(bin(b)))

  def xzSynth(params: Column): Column =
    ColumnBridge.column(XzSynth(ColumnBridge.expression(params.cast("long"))))
}
