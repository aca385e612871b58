package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ZIP central-directory walk (q132) — the corpus-drop container: bulk
  * document collections arrive as archives, and a correct reader is
  * driven by the CENTRAL directory, never the local headers. The ZIP
  * format's defining trap is that local headers may lie — streaming
  * writers set general-purpose flag bit 3 and leave local sizes/CRC
  * zero — so sizes, method, CRC, and the member list all come from the
  * central records the end-of-central-directory (EOCD) locator points
  * at; the local header is consulted ONLY for its own name/extra
  * lengths to find where the member's data starts (APPNOTE 4.3.7: the
  * local extra field may legally differ in length from the central
  * one). This walk is q82's trust-the-manifest discipline (WARC's
  * Content-Length over any delimiter scan) applied to ZIP.
  *
  * Stop-don't-guess: no EOCD within the trailing 64 KiB + 22 bytes →
  * not an archive; any ZIP64 marker, a count/size/offset that walks
  * out of bounds, a wrong central or local signature, a method other
  * than stored/deflate, a stored member whose sizes disagree, a
  * deflate stream that fails or inflates to the wrong length, or a
  * CRC32 mismatch → that read refuses NULL instead of returning bytes
  * it cannot vouch for. Inflation uses one raw `Inflater` per executor
  * thread (the GzipEval discipline) with output bounded by the
  * central directory's own declared size.
  *
  * Reference scope: scholar-stream ingests a JSON API feed
  * (reference ingestion/openalex_client.py) — archives are a
  * north-star extension of the source family (q76/q82/q125).
  */
object ZipEval {

  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater(true) // raw deflate, per APPNOTE 4.4.5
  }
  private val defl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val crc32 = new ThreadLocal[java.util.zip.CRC32] {
    override def initialValue(): java.util.zip.CRC32 = new java.util.zip.CRC32
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private final val EocdSig = 0x06054b50L
  private final val CenSig = 0x02014b50L
  private final val LocSig = 0x04034b50L

  /** Offset of the EOCD record, or -1. The record is 22 bytes plus a
    * comment of up to 65535 bytes, so the scan walks BACKWARD from the
    * tail — an EOCD signature embedded in member data earlier in the
    * file must not win over the real trailing record.
    */
  private def findEocd(b: Array[Byte]): Int = {
    if (b == null || b.length < 22) return -1
    val stop = math.max(0, b.length - 22 - 65535)
    var i = b.length - 22
    while (i >= stop) {
      if (u32(b, i) == EocdSig) {
        // the declared comment must end exactly at EOF — a garbage tail
        // after a stale EOCD is a truncated/overwritten archive
        if (i + 22 + u16(b, i + 20) == b.length) return i
      }
      i -= 1
    }
    -1
  }

  /** Parsed central-directory geometry: entry offsets resolved and
    * bounds-checked. Null on refusal.
    */
  private def centralEntries(b: Array[Byte]): Array[Int] = {
    val e = findEocd(b)
    if (e < 0) return null
    // single-disk classic archive only; 0xFFFF / 0xFFFFFFFF are the
    // ZIP64 escape markers — out of scope, refuse rather than misread
    if (u16(b, e + 4) != 0 || u16(b, e + 6) != 0) return null
    val n = u16(b, e + 8)
    if (n != u16(b, e + 10) || n == 0xFFFF) return null
    val cdSize = u32(b, e + 12)
    val cdOff = u32(b, e + 16)
    if (cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL) return null
    if (cdOff + cdSize != e) return null // directory must abut the EOCD
    val out = new Array[Int](n)
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (p + 46 > e || u32(b, p) != CenSig) return null
      out(i) = p
      val nl = u16(b, p + 28)
      val xl = u16(b, p + 30)
      val cl = u16(b, p + 32)
      p += 46 + nl + xl + cl
      i += 1
    }
    if (p != e) return null // entries must tile the declared extent
    out
  }

  /** Member count from a verified central-directory walk, or -1. */
  def memberCount(b: Array[Byte]): Int = {
    val es = centralEntries(b)
    if (es == null) -1 else es.length
  }

  /** Member file name by central-directory index, or null. */
  def memberName(b: Array[Byte], idx: Int): String = {
    val es = centralEntries(b)
    if (es == null || idx < 0 || idx >= es.length) return null
    val p = es(idx)
    val nl = u16(b, p + 28)
    if (p + 46 + nl > b.length) return null
    new String(b, p + 46, nl, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Index of the member with this exact name, or -1 — containers like
    * DOCX address their parts BY NAME, never by position.
    */
  def memberIndex(b: Array[Byte], name: String): Int = {
    val es = centralEntries(b)
    if (es == null) return -1
    val want = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < es.length) {
      val p = es(i)
      val nl = u16(b, p + 28)
      if (nl == want.length) {
        var k = 0
        var eq = true
        while (k < nl && eq) { eq = b(p + 46 + k) == want(k); k += 1 }
        if (eq) return i
      }
      i += 1
    }
    -1
  }

  /** Member CONTENT by central-directory index, or null on any refusal.
    * Sizes, method, and CRC come from the central record; the local
    * header contributes only its own name/extra lengths (which may
    * legally differ from the central ones) to locate the data.
    */
  def member(b: Array[Byte], idx: Int): Array[Byte] = {
    val es = centralEntries(b)
    if (es == null || idx < 0 || idx >= es.length) return null
    val p = es(idx)
    val method = u16(b, p + 10)
    val crc = u32(b, p + 16)
    val csize = u32(b, p + 20)
    val usize = u32(b, p + 24)
    val lho = u32(b, p + 42)
    if (usize > (1L << 28)) return null // resource guard: 256 MiB/member
    if (lho + 30 > b.length || u32(b, lho.toInt) != LocSig) return null
    val lp = lho.toInt
    val dataOff = lp + 30 + u16(b, lp + 26) + u16(b, lp + 28)
    if (dataOff + csize > b.length) return null
    val raw = method match {
      case 0 => // stored: the two sizes must agree
        if (csize != usize) return null
        java.util.Arrays.copyOfRange(b, dataOff, dataOff + csize.toInt)
      case 8 =>
        val inf = infl.get()
        inf.reset()
        inf.setInput(b, dataOff, csize.toInt)
        val out = new Array[Byte](usize.toInt)
        try {
          var got = 0
          while (got < out.length && !inf.finished()) {
            val k = inf.inflate(out, got, out.length - got)
            if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
              return null
            got += k
          }
          // the stream must end exactly at the declared size: more
          // pending output means the directory lied
          if (got != out.length) return null
          if (!inf.finished()) {
            val probe = new Array[Byte](1)
            if (inf.inflate(probe) != 0) return null
          }
          out
        } catch {
          case _: java.util.zip.DataFormatException => return null
        }
      case _ => return null // no other methods in scope
    }
    val c = crc32.get()
    c.reset()
    c.update(raw)
    if (c.getValue != crc) return null
    raw
  }

  /** Sum of the central directory's declared UNCOMPRESSED sizes, or -1
    * — the archive-level payload accounting read that never touches
    * member data.
    */
  def totalBytes(b: Array[Byte]): Long = {
    val es = centralEntries(b)
    if (es == null) return -1L
    var sum = 0L
    var i = 0
    while (i < es.length) {
      sum += u32(b, es(i) + 24)
      i += 1
    }
    sum
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q132 archive from a document's own bytes: member 0 is
    * the text STORED, member 1 the text twice around a newline
    * DEFLATED, member 2 an ASCII accounting line DEFLATED. Every local
    * header declares flag bit 3 with zeroed sizes/CRC and carries a
    * PADDING extra field the central record does not — the
    * lying-local-header trap by construction: a reader that trusts
    * local metadata (or computes data offsets from central lengths)
    * has nothing correct to read. `params` packs
    * `doc_id | mode<<40`: mode 1 appends an EOCD comment (the backward
    * scan must still find the record), mode 2 corrupts member 1's
    * CENTRAL CRC (that member must refuse while its siblings read).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val pair = new Array[Byte](text.length * 2 + 1)
    System.arraycopy(text, 0, pair, 0, text.length)
    pair(text.length) = '\n'
    System.arraycopy(text, 0, pair, text.length + 1, text.length)
    val meta = s"doc $id has ${text.length} chars"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val members = Array(
      (s"doc${id}_0.txt", text, 0),
      (s"doc${id}_1.txt", pair, 8),
      (s"doc${id}_2.txt", meta, 8))
    val comment =
      if (mode == 1)
        s"archive comment $id".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      else Array.emptyByteArray
    buildArchive(members, lyingLocals = true, comment,
      badCrcIdx = if (mode == 2) 1 else -1)
  }

  /** Serialize a classic single-disk archive. `lyingLocals` writes the
    * q132 trap headers (zeroed local sizes/CRC, flag bit 3 on deflated
    * members, a local-only padding extra); honest locals mirror the
    * central values the way desktop writers do. `badCrcIdx` corrupts
    * that member's CENTRAL CRC.
    */
  private[graft] def buildArchive(members: Array[(String, Array[Byte], Int)],
                                      lyingLocals: Boolean,
                                      comment: Array[Byte],
                                      badCrcIdx: Int): Array[Byte] = {
    val n = members.length
    val out = new java.io.ByteArrayOutputStream(256 +
      members.map(_._2.length).sum)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val crcs = new Array[Long](n)
    val comps = new Array[Array[Byte]](n)
    val offs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val (name, raw, method) = members(i)
      val c = crc32.get()
      c.reset(); c.update(raw)
      crcs(i) = c.getValue
      comps(i) = if (method == 0) raw else deflateRaw(raw)
      offs(i) = out.size()
      val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      w32(LocSig)
      w16(20) // version needed
      // lying locals: deflated members declare flag bit 3 ("sizes follow
      // later" — they never do); the stored member lies PLAINLY with
      // flag 0 and zeroed sizes, since APPNOTE forbids bit 3 on stored
      // entries and local-trusting readers reject that combination
      w16(if (lyingLocals && method == 8) 0x0008 else 0)
      w16(method)
      w16(0); w16(0) // time/date
      if (lyingLocals) { w32(0); w32(0); w32(0) } // zeroed crc/csize/usize
      else { w32(crcs(i)); w32(comps(i).length.toLong); w32(raw.length.toLong) }
      w16(nb.length)
      w16(if (lyingLocals) 8 else 0)
      out.write(nb, 0, nb.length)
      if (lyingLocals) {
        // padding extra field (id 0xCAFE): present ONLY here, so a data
        // offset computed from central lengths lands 12 bytes short
        w16(0xCAFE); w16(4); w32(0)
      }
      out.write(comps(i), 0, comps(i).length)
      i += 1
    }
    val cdOff = out.size()
    i = 0
    while (i < n) {
      val (name, raw, method) = members(i)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      w32(CenSig)
      w16(20); w16(20)
      w16(if (lyingLocals && method == 8) 0x0008 else 0)
      w16(method)
      w16(0); w16(0)
      w32(if (i == badCrcIdx) crcs(i) ^ 0xDEADBEEFL else crcs(i))
      w32(comps(i).length.toLong)
      w32(raw.length.toLong)
      w16(nb.length); w16(0); w16(0)
      w16(0); w16(0) // disk, internal attrs
      w32(0) // external attrs
      w32(offs(i).toLong)
      out.write(nb, 0, nb.length)
      i += 1
    }
    val cdSize = out.size() - cdOff
    w32(EocdSig)
    w16(0); w16(0)
    w16(n); w16(n)
    w32(cdSize.toLong); w32(cdOff.toLong)
    w16(comment.length)
    out.write(comment, 0, comment.length)
    out.toByteArray
  }

  private def deflateRaw(raw: Array[Byte]): Array[Byte] = {
    val d = defl.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val k = d.deflate(buf)
      out.write(buf, 0, k)
    }
    out.toByteArray
  }
}

/** `binary -> int`: verified central-directory member count, NULL on
  * refusal.
  */
case class ZipCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_count"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ZipEval.memberCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zn")
      s"""
         |int $res = graft.functions.ZipEval.memberCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZipCount =
    copy(child = newChild)
}

/** `binary -> long`: central-directory uncompressed-size sum, NULL on
  * refusal.
  */
case class ZipTotalBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_bytes"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ZipEval.totalBytes(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zb")
      s"""
         |long $res = graft.functions.ZipEval.totalBytes($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZipTotalBytes =
    copy(child = newChild)
}

/** `(binary, int) -> binary`: member content by central index, NULL on
  * any verification failure (signature, bounds, method, size, CRC).
  */
case class ZipMember(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_member"

  override protected def nullSafeEval(bytes: Any, idx: Any): Any =
    ZipEval.member(bytes.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val res = ctx.freshName("zm")
      s"""
         |byte[] $res = graft.functions.ZipEval.member($bytes, $idx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZipMember =
    copy(left = newLeft, right = newRight)
}

/** `(binary, int) -> string`: member name by central index. */
case class ZipMemberName(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_name"

  override protected def nullSafeEval(bytes: Any, idx: Any): Any = {
    val r = ZipEval.memberName(bytes.asInstanceOf[Array[Byte]],
      idx.asInstanceOf[Int])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val res = ctx.freshName("zname")
      s"""
         |String $res = graft.functions.ZipEval.memberName($bytes, $idx);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZipMemberName =
    copy(left = newLeft, right = newRight)
}

/** `(binary text, long params) -> binary`: q132's synthesis expression —
  * see [[ZipEval.synth]] for the member layout and param packing.
  */
case class ZipSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    ZipEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.ZipEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZipSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the ZIP kernels. */
object ZipOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def zipCount(bin: Column): Column =
    ColumnBridge.column(ZipCount(ColumnBridge.expression(bin.cast("binary"))))

  def zipTotalBytes(bin: Column): Column =
    ColumnBridge.column(ZipTotalBytes(ColumnBridge.expression(bin.cast("binary"))))

  def zipMember(bin: Column, idx: Column): Column =
    ColumnBridge.column(ZipMember(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(idx.cast("int"))))

  def zipMemberName(bin: Column, idx: Column): Column =
    ColumnBridge.column(ZipMemberName(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(idx.cast("int"))))

  def zipSynth(text: Column, params: Column): Column =
    ColumnBridge.column(ZipSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
