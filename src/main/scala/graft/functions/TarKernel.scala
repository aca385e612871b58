package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TAR (ustar) archive walk (q136) — the OTHER corpus-drop container
  * (q132 covers ZIP): research datasets ship as tarballs, and a correct
  * reader is a strict 512-byte-block walk where every header must EARN
  * trust before its size field is allowed to advance the cursor:
  *
  *  - the checksum field validates first (simple sum of the header with
  *    the chksum bytes read as spaces, stored in octal) — sizes from an
  *    unverified header would let one flipped byte teleport the walk
  *    into file data that happens to look like headers;
  *  - sizes/mtimes are OCTAL with terminator/padding tolerance (POSIX
  *    allows trailing NUL or space; leading spaces occur in the wild);
  *  - names join `prefix[155] + '/' + name[100]` when the ustar prefix
  *    field is set — the long-path spelling readers that only look at
  *    `name` silently truncate;
  *  - both magics parse: POSIX `ustar\0` + "00" and the old-GNU
  *    `ustar  \0` spelling;
  *  - data advances by size rounded UP to the 512 boundary; directories
  *    (typeflag '5') carry no data but still count as members;
  *  - end-of-archive is two zero blocks; a walk that runs past EOF
  *    mid-member (truncated download) refuses WHOLE — partial archives
  *    are quarantine rows, never partial corpora. A missing trailer
  *    after complete members is tolerated (tar appenders truncate it).
  *
  * Per-member refusal: a bad checksum refuses THAT member's content
  * while siblings read (the q132 per-member CRC stance) — but the walk
  * itself still needs the size to skip it, so a checksum failure whose
  * size field does not parse refuses the whole archive (nothing
  * trustworthy remains to advance by). Typeflags other than '0'/NUL
  * (regular) and '5' (directory) are skipped structurally: their data
  * advances the cursor, their content is not extracted (links, PAX
  * headers — out of stated scope).
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — tarballs are a north-star extension
  * of the source family (q76/q82/q125/q132).
  */
object TarEval {

  private final val Block = 512

  /** Parsed member offsets: (headerOff, dataOff, size, typeflag,
    * checksumOk). Null when the archive refuses.
    */
  private def walk(b: Array[Byte]): Array[(Int, Int, Long, Char, Boolean)] = {
    if (b == null || b.length < Block) return null
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Char, Boolean)]()
    var off = 0
    while (off + Block <= b.length) {
      if (isZeroBlock(b, off)) {
        // end-of-archive trailer: members seen are the archive
        return out.toArray
      }
      if (!magicOk(b, off)) return null
      val size = octal(b, off + 124, 12)
      // an unparseable size refuses WHOLE even when only this member's
      // checksum failed — nothing trustworthy remains to advance by
      if (size < 0 || size > (1L << 28)) return null // resource guard
      val csOk = checksumOk(b, off)
      val typeflag = {
        val t = b(off + 156) & 0xFF
        if (t == 0) '0' else t.toChar
      }
      val dataOff = off + Block
      val advance = ((size + Block - 1) / Block * Block).toInt
      if (dataOff + advance > b.length) return null // truncated mid-member
      out += ((off, dataOff, size, typeflag, csOk))
      off = dataOff + advance
    }
    // ran off the end without a trailer: tolerated ONLY when the walk
    // consumed the bytes exactly (appenders drop trailers) — a partial
    // tail block is a truncated download, refuse
    if (out.isEmpty || off != b.length) null else out.toArray
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < Block) {
      if (b(off + i) != 0) return false
      i += 1
    }
    true
  }

  private def magicOk(b: Array[Byte], off: Int): Boolean = {
    val m = off + 257
    if (m + 7 >= b.length) return false
    val posix = b(m) == 'u' && b(m + 1) == 's' && b(m + 2) == 't' &&
      b(m + 3) == 'a' && b(m + 4) == 'r' && b(m + 5) == 0 &&
      b(m + 6) == '0' && b(m + 7) == '0'
    val oldGnu = b(m) == 'u' && b(m + 1) == 's' && b(m + 2) == 't' &&
      b(m + 3) == 'a' && b(m + 4) == 'r' && b(m + 5) == ' ' &&
      b(m + 6) == ' ' && b(m + 7) == 0
    posix || oldGnu
  }

  /** Octal field: leading spaces skip, digits accumulate, a NUL or
    * space terminates; -1 on malformation (no digits, bad char).
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < end) {
      val c = b(i) & 0xFF
      if (c == 0 || c == ' ') {
        return if (digits > 0) v else -1
      }
      if (c < '0' || c > '7') return -1
      v = v * 8 + (c - '0')
      digits += 1
      i += 1
    }
    if (digits > 0) v else -1
  }

  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    val stored = octal(b, off + 148, 8)
    if (stored < 0) return false
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xFF)
      i += 1
    }
    sum == stored
  }

  private def nameOf(b: Array[Byte], off: Int): String = {
    def cstr(o: Int, len: Int): String = {
      var n = 0
      while (n < len && b(o + n) != 0) n += 1
      new String(b, o, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    val name = cstr(off, 100)
    val prefix = cstr(off + 345, 155)
    if (prefix.isEmpty) name else prefix + "/" + name
  }

  /** Verified member count (directories included), or -1. */
  def memberCount(b: Array[Byte]): Int = {
    val es = walk(b)
    if (es == null) -1 else es.length
  }

  /** Member full name (prefix-joined) by walk index, or null. */
  def memberName(b: Array[Byte], idx: Int): String = {
    val es = walk(b)
    if (es == null || idx < 0 || idx >= es.length) return null
    nameOf(b, es(idx)._1)
  }

  /** Member content by walk index: null for out-of-range, non-regular
    * members (directories carry none), or a checksum-failed header —
    * the q132 per-member stance.
    */
  def member(b: Array[Byte], idx: Int): Array[Byte] = {
    val es = walk(b)
    if (es == null || idx < 0 || idx >= es.length) return null
    val (_, dataOff, size, typeflag, csOk) = es(idx)
    if (!csOk || typeflag != '0') return null
    java.util.Arrays.copyOfRange(b, dataOff, dataOff + size.toInt)
  }

  /** Sum of REGULAR members' declared sizes over the verified walk,
    * or -1.
    */
  def totalBytes(b: Array[Byte]): Long = {
    val es = walk(b)
    if (es == null) return -1L
    var s = 0L
    var i = 0
    while (i < es.length) {
      if (es(i)._4 == '0' && es(i)._5) s += es(i)._3
      i += 1
    }
    s
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q136 tarball from a document's bytes: a `data/`
    * directory entry, `data/doc<id>.txt` with the text, and a
    * LONG-PATH member whose name rides the ustar prefix field (a
    * name-only reader truncates it) carrying an ASCII accounting line.
    * `params` packs `doc_id | mode<<40`: mode 1 corrupts member 1's
    * checksum byte (that member refuses, siblings read); mode 2 writes
    * the old-GNU magic on every header.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val meta = s"doc $id has ${text.length} bytes"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val longDir = ("very/long/packaged/dataset/path/segment/that/over" +
      "flows/the/hundred/byte/name/field/for/doc" + id)
    val out = new java.io.ByteArrayOutputStream(4 * Block + text.length)
    writeHeader(out, "data/", "", 0, '5', mode == 2)
    val m1At = out.size()
    writeHeader(out, s"data/doc$id.txt", "", text.length, '0', mode == 2)
    out.write(text, 0, text.length)
    pad(out, text.length)
    writeHeader(out, "meta.txt", longDir, meta.length, '0', mode == 2)
    out.write(meta, 0, meta.length)
    pad(out, meta.length)
    out.write(new Array[Byte](2 * Block), 0, 2 * Block) // trailer
    val bytes = out.toByteArray
    if (mode == 1) {
      // flip one stored-checksum digit of member 1 (the file header):
      // the sum no longer matches, the member must refuse
      bytes(m1At + 148) = (bytes(m1At + 148) ^ 0x01).toByte
    }
    bytes
  }

  private[functions] def pad(out: java.io.ByteArrayOutputStream, n: Int): Unit = {
    val rem = n % Block
    if (rem != 0) out.write(new Array[Byte](Block - rem), 0, Block - rem)
  }

  private[functions] def writeHeader(out: java.io.ByteArrayOutputStream,
                                     name: String, prefix: String, size: Int,
                                     typeflag: Char, oldGnu: Boolean): Unit = {
    val h = new Array[Byte](Block)
    def put(s: String, off: Int, len: Int): Unit = {
      val bs = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      require(bs.length <= len, s"field overflow: $s")
      System.arraycopy(bs, 0, h, off, bs.length)
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      // len-1 digits, NUL terminator — the POSIX spelling
      put(("%0" + (len - 1) + "o").format(v), off, len - 1)
    put(name, 0, 100)
    putOctal(420, 100, 8) // mode 0644
    putOctal(0, 108, 8) // uid
    putOctal(0, 116, 8) // gid
    putOctal(size.toLong, 124, 12)
    putOctal(0, 136, 12) // mtime
    h(156) = typeflag.toByte
    if (oldGnu) { put("ustar ", 257, 6); h(263) = ' '.toByte }
    else { put("ustar", 257, 6); h(263) = '0'; h(264) = '0' }
    put("root", 265, 32)
    put("root", 297, 32)
    if (prefix.nonEmpty) put(prefix, 345, 155)
    // checksum: spaces while summing, then octal + NUL + space
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xFF; i += 1 }
    put("%06o".format(sum), 148, 7)
    h(154) = 0
    h(155) = ' '.toByte
    out.write(h, 0, Block)
  }
}

/** `binary -> int`: verified tar member count, NULL on refusal. */
case class TarCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_count"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TarEval.memberCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tn")
      s"""
         |int $res = graft.functions.TarEval.memberCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TarCount =
    copy(child = newChild)
}

/** `binary -> long`: regular-member size sum, NULL on refusal. */
case class TarTotalBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_bytes"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TarEval.totalBytes(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tb")
      s"""
         |long $res = graft.functions.TarEval.totalBytes($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TarTotalBytes =
    copy(child = newChild)
}

/** `(binary, int) -> binary`: member content by walk index. */
case class TarMember(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_member"

  override protected def nullSafeEval(bytes: Any, idx: Any): Any =
    TarEval.member(bytes.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val res = ctx.freshName("tm")
      s"""
         |byte[] $res = graft.functions.TarEval.member($bytes, $idx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TarMember =
    copy(left = newLeft, right = newRight)
}

/** `(binary, int) -> string`: prefix-joined member name. */
case class TarMemberName(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_name"

  override protected def nullSafeEval(bytes: Any, idx: Any): Any = {
    val r = TarEval.memberName(bytes.asInstanceOf[Array[Byte]],
      idx.asInstanceOf[Int])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val res = ctx.freshName("tname")
      s"""
         |String $res = graft.functions.TarEval.memberName($bytes, $idx);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TarMemberName =
    copy(left = newLeft, right = newRight)
}

/** `(binary text, long params) -> binary`: q136's synthesis. */
case class TarSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    TarEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.TarEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TarSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the tar kernels. */
object TarOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def tarCount(bin: Column): Column =
    ColumnBridge.column(TarCount(ColumnBridge.expression(bin.cast("binary"))))

  def tarTotalBytes(bin: Column): Column =
    ColumnBridge.column(TarTotalBytes(ColumnBridge.expression(bin.cast("binary"))))

  def tarMember(bin: Column, idx: Column): Column =
    ColumnBridge.column(TarMember(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(idx.cast("int"))))

  def tarMemberName(bin: Column, idx: Column): Column =
    ColumnBridge.column(TarMemberName(
      ColumnBridge.expression(bin.cast("binary")),
      ColumnBridge.expression(idx.cast("int"))))

  def tarSynth(text: Column, params: Column): Column =
    ColumnBridge.column(TarSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
