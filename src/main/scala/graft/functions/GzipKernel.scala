package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 1952 gzip member codec — the framing Common Crawl actually ships
  * (`.warc.gz` is one gzip MEMBER per WARC record): 10-byte fixed header,
  * the optional FEXTRA/FNAME/FCOMMENT/FHCRC fields, a raw-deflate body,
  * and the CRC32+ISIZE trailer. The q66 deflate kernel compresses for a
  * RATIO; this pair compresses/decompresses for CONTENT, completing the
  * compressed-at-rest source story beside q82's record walk.
  *
  * Decode stance is q82's stop-don't-guess: a short header, reserved FLG
  * bits, a truncated body, deflate corruption, trailing garbage inside
  * the member, or a CRC32/ISIZE mismatch each yield NULL — never a
  * half-inflated guess. The encoder pins MTIME=0/XFL=0/OS=255 so output
  * is deterministic for a given JVM's zlib (the q66 caveat: byte-level
  * output is never hash-compared across engines; round-trip CONTENT is).
  *
  * One native Deflater/Inflater + CRC32 + drain buffer per executor
  * thread, reset between rows (the DeflateEval discipline — allocation
  * per row would dominate at corpus scale; the leak bound is the thread
  * count).
  */
object GzipEval {
  private val defl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater(true)
  }
  private val crc32 = new ThreadLocal[java.util.zip.CRC32] {
    override def initialValue(): java.util.zip.CRC32 = new java.util.zip.CRC32
  }
  private val drain = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  private def writeLe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  /** One deterministic gzip member: MTIME=0, XFL=0, OS=255 (unknown);
    * `name` non-empty adds a NUL-terminated FNAME (Latin-1 per spec —
    * callers pass ASCII). Embedded NUL bytes are STRIPPED before the
    * field is written: FNAME is NUL-terminated on the wire, so a verbatim
    * NUL would end the name early and feed the remaining name bytes to
    * the inflater — an undecodable member from a "successful" encode.
    */
  def gzip(payload: Array[Byte], name: Array[Byte]): Array[Byte] = {
    val cleanName: Array[Byte] =
      if (name == null) null else name.filter(_ != 0)
    val withName = cleanName != null && cleanName.length > 0
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    out.write(0x1f); out.write(0x8b); out.write(8)
    out.write(if (withName) 0x08 else 0x00)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME = 0
    out.write(0); out.write(255)
    if (withName) { out.write(cleanName, 0, cleanName.length); out.write(0) }
    val d = defl.get(); d.reset(); d.setInput(payload); d.finish()
    val buf = drain.get()
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    val c = crc32.get(); c.reset(); c.update(payload)
    writeLe32(out, c.getValue)
    writeLe32(out, payload.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Header walk shared by [[gunzip]], [[gzipName]] and [[gunzipConcat]]:
    * returns the body's ABSOLUTE offset for the member starting at
    * `start`, or -1 for anything that is not a well-formed member header
    * (short, bad magic, CM != 8, reserved FLG bits). Offset-based so the
    * multi-member walk never copies the remaining stream per member (a
    * real `.warc.gz` segment holds tens of thousands of members — a
    * copy-per-member walk is quadratic in segment size).
    */
  private def bodyStart(b: Array[Byte], start: Int): Int = {
    if (b == null || b.length - start < 18) return -1
    if (b(start) != 0x1f.toByte || b(start + 1) != 0x8b.toByte ||
      b(start + 2) != 8.toByte) return -1
    val flg = b(start + 3) & 0xff
    if ((flg & 0xe0) != 0) return -1 // reserved bits MUST be zero
    var pos = start + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (pos + 2 > b.length) return -1
      val xlen = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
      pos += 2 + xlen
      if (pos > b.length) return -1
    }
    if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
      while (pos < b.length && b(pos) != 0) pos += 1
      if (pos >= b.length) return -1
      pos += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (pos < b.length && b(pos) != 0) pos += 1
      if (pos >= b.length) return -1
      pos += 1
    }
    if ((flg & 0x02) != 0) pos += 2 // FHCRC
    if (pos + 8 > b.length) return -1 // room for at least the trailer
    pos
  }

  /** The member's FNAME, or null when absent or the header is invalid —
    * readable WITHOUT touching the body, exactly how real tooling lists
    * an archive (and how the q95 contract proves header fields survive
    * body corruption).
    */
  def gzipName(b: Array[Byte]): Array[Byte] = {
    val start = bodyStart(b, 0)
    if (start < 0) return null
    if ((b(3) & 0x08) == 0) return null
    var pos = 10
    if ((b(3) & 0x04) != 0)
      pos += 2 + ((b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8))
    var end = pos
    while (b(end) != 0) end += 1 // bounded: bodyStart already walked it
    java.util.Arrays.copyOfRange(b, pos, end)
  }

  /** Decompressed payload, or null on ANY defect: header, truncated or
    * corrupt deflate stream, garbage between deflate end and trailer,
    * CRC32 mismatch, ISIZE mismatch.
    */
  def gunzip(b: Array[Byte]): Array[Byte] = {
    val start = bodyStart(b, 0)
    if (start < 0) return null
    val bodyLen = b.length - 8 - start
    if (bodyLen < 0) return null
    val inf = infl.get(); inf.reset()
    inf.setInput(b, start, bodyLen)
    val out = new java.io.ByteArrayOutputStream(bodyLen * 3 + 32)
    val buf = drain.get()
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished()) return null // truncated mid-stream
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    // the deflate stream must consume the body EXACTLY: leftover input
    // means garbage was spliced inside the member (q95's %10==6 class)
    if (inf.getRemaining != 0) return null
    val payload = out.toByteArray
    val c = crc32.get(); c.reset(); c.update(payload)
    val t = b.length - 8
    def le32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (c.getValue != le32(t)) return null
    if ((payload.length.toLong & 0xffffffffL) != le32(t + 4)) return null
    payload
  }

  /** Concatenated-member decode — the ACTUAL `.warc.gz` layout (one gzip
    * member per WARC record, members back to back; RFC 1952 §2.2 requires
    * multi-member support): every member's payload, concatenated, or
    * null if ANY member is defective (the q82 stop-don't-guess stance —
    * a reader that silently drops the damaged tail hides data loss).
    * Member boundaries come from the inflater's consumed-byte count, the
    * only place they are knowable.
    */
  def gunzipConcat(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length == 0) return null
    val out = new java.io.ByteArrayOutputStream(b.length * 3 + 32)
    var start = 0
    while (start < b.length) {
      val bodyAt = bodyStart(b, start) // absolute; no per-member copy
      if (bodyAt < 0) return null
      val inf = infl.get(); inf.reset()
      inf.setInput(b, bodyAt, b.length - bodyAt)
      val buf = drain.get()
      val payload = new java.io.ByteArrayOutputStream(1024)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) payload.write(buf, 0, n)
          else if (!inf.finished()) return null
        }
      } catch { case _: java.util.zip.DataFormatException => return null }
      val trailerAt = b.length - inf.getRemaining
      if (trailerAt + 8 > b.length) return null
      val pb = payload.toByteArray
      val c = crc32.get(); c.reset(); c.update(pb)
      def le32m(off: Int): Long =
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      if (c.getValue != le32m(trailerAt)) return null
      if ((pb.length.toLong & 0xffffffffL) != le32m(trailerAt + 4)) return null
      out.write(pb, 0, pb.length)
      start = trailerAt + 8
    }
    out.toByteArray
  }
}

/** `(binary, string) -> binary`: deterministic gzip member; an empty name
  * means "no FNAME field".
  */
case class GzipMember(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip"

  override protected def nullSafeEval(bin: Any, name: Any): Any =
    GzipEval.gzip(bin.asInstanceOf[Array[Byte]],
      name.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, name) =>
      s"${ev.value} = graft.functions.GzipEval.gzip($bytes, $name.getBytes());")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): GzipMember =
    copy(left = newLeft, right = newRight)
}

/** `binary -> binary`: strict gzip member decode (null on any defect). */
case class GunzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip"

  override protected def nullSafeEval(bin: Any): Any =
    GzipEval.gunzip(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gunzipped")
      s"""
         |byte[] $res = graft.functions.GzipEval.gunzip($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

/** `binary -> binary`: concatenated multi-member decode — the `.warc.gz`
  * layout ([[GzipEval.gunzipConcat]]); null if any member is defective.
  */
case class GunzipConcatBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip_concat"

  override protected def nullSafeEval(bin: Any): Any =
    GzipEval.gunzipConcat(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gunzipAll")
      s"""
         |byte[] $res = graft.functions.GzipEval.gunzipConcat($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GunzipConcatBytes =
    copy(child = newChild)
}

/** `binary -> string`: the member's FNAME without decompressing. */
case class GzipFileName(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip_name"

  override protected def nullSafeEval(bin: Any): Any = {
    val n = GzipEval.gzipName(bin.asInstanceOf[Array[Byte]])
    if (n == null) null else UTF8String.fromBytes(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gzName")
      s"""
         |byte[] $res = graft.functions.GzipEval.gzipName($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GzipFileName =
    copy(child = newChild)
}
