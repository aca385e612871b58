package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MIME / RFC 5322 email extraction (q137) — the mailing-list corpus
  * source (list archives, Usenet dumps, support tickets ship as EML/
  * mbox members; the reference ingests a JSON feed only — reference
  * ingestion/openalex_client.py — so this is a north-star extension of
  * the source family q76/q82/q125/q132/q136). A correct reader is four
  * RFC machines, each with a trap a shortcut reader falls into:
  *
  *  - RFC 5322 headers: folded (continuation) lines UNFOLD by deleting
  *    the CRLF only — the continuation's leading whitespace is part of
  *    the value (a trim-per-line reader glues "doc 5" + "folded" into
  *    "doc 5folded"); a non-continuation line without a colon refuses.
  *  - RFC 2047 encoded-words in Subject: `=?charset?Q|B?payload?=`,
  *    Q's underscore IS space, and whitespace between two ADJACENT
  *    encoded-words is deleted (§6.2 — a concatenating reader doubles
  *    the space); unknown charsets and malformed payloads stay
  *    VERBATIM (q128's evidence-preserving stance, never U+FFFD).
  *  - RFC 2046 multipart: the body is split by `--boundary` DELIMITER
  *    LINES (the CRLF before a delimiter belongs to the delimiter, not
  *    the part — an off-by-one here corrupts every md5); preamble and
  *    epilogue are ignored; transport padding after a delimiter is
  *    tolerated; a missing CLOSE delimiter (`--boundary--`) refuses
  *    WHOLE — that is a truncated download, never a shorter corpus.
  *  - RFC 2045 transfer decodes: quoted-printable (soft breaks `=CRLF`,
  *    lowercase hex tolerated, trailing transport padding before a
  *    line break deleted, a lone `=` stays literal) and base64
  *    (whitespace-tolerant, alphabet-strict — an invalid byte refuses
  *    that PART while siblings read, the q132 per-member stance).
  *
  * Stated scope: one multipart level (a nested multipart part counts
  * but its content refuses), text charsets utf-8/us-ascii with the
  * strict REPORT stance (CharsetKernel's discipline — malformed bytes
  * refuse, never replace), first text/(*) part is THE body, first
  * non-text part THE attachment. Decoded body text is CRLF→LF
  * normalized (corpus text is LF-side).
  */
object MimeEval {

  final case class Msg(nParts: Int, subject: String, bodyText: String,
                       attachment: Array[Byte])

  // ------------------------------------------------------------ headers

  /** Header block split: returns (bodyStart, logical header lines) or
    * null on malformation (continuation first, missing colon).
    */
  private def headerLines(b: Array[Byte]): (Int, Array[(String, String)]) = {
    // find the blank separator line: CRLF CRLF or LF LF (earliest)
    var i = 0
    var headEnd = -1
    var bodyAt = -1
    while (i < b.length && bodyAt < 0) {
      if (b(i) == '\n') {
        if (i + 1 < b.length && b(i + 1) == '\n') {
          headEnd = i; bodyAt = i + 2
        } else if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n') {
          headEnd = i; bodyAt = i + 3
        }
      }
      i += 1
    }
    if (bodyAt < 0) return null
    var he = headEnd
    if (he > 0 && b(he - 1) == '\r') he -= 1 // the CR of the final CRLF
    val head = new String(b, 0, he, java.nio.charset.StandardCharsets.ISO_8859_1)
    val phys = head.split("\r?\n", -1)
    val logical = scala.collection.mutable.ArrayBuffer[String]()
    var k = 0
    while (k < phys.length) {
      val ln = phys(k)
      if (ln.nonEmpty && (ln.charAt(0) == ' ' || ln.charAt(0) == '\t')) {
        if (logical.isEmpty) return null // continuation before any header
        // UNFOLD: the CRLF is deleted, the leading WSP stays
        logical(logical.length - 1) = logical.last + ln
      } else logical += ln
      k += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (ln <- logical; if ln.nonEmpty) {
      val c = ln.indexOf(':')
      if (c < 1) return null
      out += ((ln.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT),
        ln.substring(c + 1).trim))
    }
    if (out.isEmpty) null else (bodyAt, out.toArray)
  }

  private def header(hs: Array[(String, String)], name: String): String = {
    var i = 0
    while (i < hs.length) {
      if (hs(i)._1 == name) return hs(i)._2
      i += 1
    }
    null
  }

  /** Content-Type parse: (lowercased type/subtype, params). Quoted
    * parameter values unescape backslashes; attributes lowercase.
    */
  private def contentType(v: String): (String, Map[String, String]) = {
    if (v == null) return ("text/plain", Map("charset" -> "us-ascii"))
    // split on ';' outside quoted strings
    val segs = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '"' && (i == 0 || v.charAt(i - 1) != '\\')) { inQ = !inQ; cur += c }
      else if (c == ';' && !inQ) { segs += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    segs += cur.toString
    val mt = segs.head.trim.toLowerCase(java.util.Locale.ROOT)
    val params = scala.collection.mutable.Map[String, String]()
    for (s <- segs.tail) {
      val e = s.indexOf('=')
      if (e > 0) {
        val a = s.substring(0, e).trim.toLowerCase(java.util.Locale.ROOT)
        var raw = s.substring(e + 1).trim
        if (raw.length >= 2 && raw.charAt(0) == '"' && raw.endsWith("\"")) {
          raw = raw.substring(1, raw.length - 1).replace("\\\"", "\"")
            .replace("\\\\", "\\")
        }
        params(a) = raw
      }
    }
    (mt, params.toMap)
  }

  // ------------------------------------------------------- RFC 2047

  private val EncodedWord =
    java.util.regex.Pattern.compile("=\\?([^?\\s]+)\\?([QqBb])\\?([^?\\s]*)\\?=")

  /** One encoded-word decode, or null → keep verbatim. */
  private def decodeWord(cs: String, enc: String, payload: String): String = {
    val bytes: Array[Byte] =
      if (enc.equalsIgnoreCase("Q")) {
        val out = new java.io.ByteArrayOutputStream(payload.length)
        var i = 0
        while (i < payload.length) {
          val c = payload.charAt(i)
          if (c == '_') { out.write(0x20); i += 1 }
          else if (c == '=') {
            if (i + 2 >= payload.length) return null
            val h = hex(payload.charAt(i + 1))
            val l = hex(payload.charAt(i + 2))
            if (h < 0 || l < 0) return null
            out.write((h << 4) | l); i += 3
          } else { out.write(c.toInt & 0xFF); i += 1 }
        }
        out.toByteArray
      } else {
        try java.util.Base64.getDecoder.decode(payload)
        catch { case _: IllegalArgumentException => return null }
      }
    val c = cs.toLowerCase(java.util.Locale.ROOT)
    if (c != "utf-8" && c != "us-ascii" && c != "ascii") return null
    strictUtf8(bytes)
  }

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** Subject decode: encoded-words expand; WSP between two adjacent
    * encoded-words is deleted (RFC 2047 §6.2); anything malformed or
    * unknown-charset stays verbatim.
    */
  def decodeSubject(v: String): String = {
    if (v == null) return null
    val m = EncodedWord.matcher(v)
    val out = new StringBuilder
    var last = 0
    var prevWasWord = false
    while (m.find()) {
      val between = v.substring(last, m.start())
      val dec = decodeWord(m.group(1), m.group(2), m.group(3))
      if (dec == null) {
        // verbatim: the separator text and the raw token both stay
        out.append(between).append(v.substring(m.start(), m.end()))
        prevWasWord = false
      } else {
        if (!(prevWasWord && between.nonEmpty && between.forall(ch => ch == ' ' || ch == '\t')))
          out.append(between)
        out.append(dec)
        prevWasWord = true
      }
      last = m.end()
    }
    out.append(v.substring(last))
    out.toString
  }

  // --------------------------------------------------- transfer decodes

  /** RFC 2045 quoted-printable decode. Trailing SP/HT before a line
    * break is transport padding (deleted); `=CRLF`/`=LF` is a soft
    * break; `=XX` accepts lowercase hex; a lone or malformed `=` stays
    * literal (evidence preserved).
    */
  def qpDecode(b: Array[Byte]): Array[Byte] = {
    // pass 1: delete trailing WSP before each line break
    val trimmed = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var lineStart = 0
    def flushLine(endExcl: Int, brk: Array[Byte]): Unit = {
      var e = endExcl
      while (e > lineStart && (b(e - 1) == ' ' || b(e - 1) == '\t')) e -= 1
      trimmed.write(b, lineStart, e - lineStart)
      trimmed.write(brk, 0, brk.length)
    }
    while (i < b.length) {
      if (b(i) == '\r' && i + 1 < b.length && b(i + 1) == '\n') {
        flushLine(i, Array('\r'.toByte, '\n'.toByte)); i += 2; lineStart = i
      } else if (b(i) == '\n') {
        flushLine(i, Array('\n'.toByte)); i += 1; lineStart = i
      } else i += 1
    }
    if (lineStart < b.length) flushLine(b.length, Array.emptyByteArray)
    val t = trimmed.toByteArray
    // pass 2: soft breaks and hex escapes
    val out = new java.io.ByteArrayOutputStream(t.length)
    i = 0
    while (i < t.length) {
      val c = t(i)
      if (c == '=') {
        if (i + 2 < t.length && t(i + 1) == '\r' && t(i + 2) == '\n') i += 3
        else if (i + 1 < t.length && t(i + 1) == '\n') i += 2
        else if (i + 2 < t.length) {
          val h = hex((t(i + 1) & 0xFF).toChar)
          val l = hex((t(i + 2) & 0xFF).toChar)
          if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
          else { out.write('='); i += 1 }
        } else { out.write('='); i += 1 }
      } else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  /** Whitespace-tolerant, alphabet-strict base64; null on refusal. */
  def b64Decode(b: Array[Byte]): Array[Byte] = {
    val compact = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c != '\r' && c != '\n' && c != ' ' && c != '\t') {
        val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '='
        if (!ok) return null
        compact.write(c)
      }
      i += 1
    }
    try java.util.Base64.getDecoder.decode(compact.toByteArray)
    catch { case _: IllegalArgumentException => null }
  }

  /** Strict UTF-8 text (REPORT stance), or null. */
  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  private def decodeContent(cte: String, body: Array[Byte]): Array[Byte] = {
    val e = if (cte == null) "7bit" else cte.trim.toLowerCase(java.util.Locale.ROOT)
    e match {
      case "7bit" | "8bit" | "binary" => body
      case "quoted-printable" => qpDecode(body)
      case "base64" => b64Decode(body)
      case _ => null
    }
  }

  private def textOf(decoded: Array[Byte], charset: String): String = {
    if (decoded == null) return null
    val c = if (charset == null) "us-ascii"
    else charset.toLowerCase(java.util.Locale.ROOT)
    if (c != "utf-8" && c != "us-ascii" && c != "ascii") return null
    val s = strictUtf8(decoded)
    if (s == null) null else s.replace("\r\n", "\n")
  }

  // ----------------------------------------------------- multipart walk

  /** Part slices between delimiter lines; null when the close
    * delimiter never arrives (truncated download — refuse whole).
    */
  private def splitParts(body: Array[Byte], boundary: String): Array[Array[Byte]] = {
    val delim = ("--" + boundary).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var partStart = -1
    var closed = false
    var i = 0
    while (i <= body.length && !closed) {
      val atLineStart = i == 0 || (i > 0 && body(i - 1) == '\n')
      if (atLineStart && i + delim.length <= body.length &&
        java.util.Arrays.equals(java.util.Arrays.copyOfRange(body, i, i + delim.length), delim)) {
        var j = i + delim.length
        val isClose = j + 2 <= body.length && body(j) == '-' && body(j + 1) == '-'
        if (isClose) j += 2
        // transport padding
        while (j < body.length && (body(j) == ' ' || body(j) == '\t')) j += 1
        val lineEnd =
          if (j >= body.length) j
          else if (body(j) == '\n') j + 1
          else if (body(j) == '\r' && j + 1 < body.length && body(j + 1) == '\n') j + 2
          else -1
        if (lineEnd >= 0) {
          // a real delimiter line: close the running part (the line
          // break BEFORE the delimiter belongs to the delimiter)
          if (partStart >= 0) {
            var e = i
            if (e > partStart && body(e - 1) == '\n') {
              e -= 1
              if (e > partStart && body(e - 1) == '\r') e -= 1
            }
            out += java.util.Arrays.copyOfRange(body, partStart, e)
          }
          if (isClose) closed = true else partStart = lineEnd
          i = lineEnd
        } else i += 1
      } else i += 1
    }
    if (!closed || out.isEmpty) null else out.toArray
  }

  // ------------------------------------------------------------- parse

  def parse(b: Array[Byte]): Msg = {
    if (b == null || b.length < 8) return null
    val hl = headerLines(b)
    if (hl == null) return null
    val (bodyAt, hs) = hl
    if (header(hs, "mime-version") == null) return null // not MIME
    val subject = decodeSubject(header(hs, "subject"))
    val (mt, params) = contentType(header(hs, "content-type"))
    val body = java.util.Arrays.copyOfRange(b, bodyAt, b.length)
    if (mt.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", null)
      if (boundary == null || boundary.isEmpty) return null
      val parts = splitParts(body, boundary)
      if (parts == null) return null
      var bodyText: String = null
      var att: Array[Byte] = null
      for (p <- parts) {
        val phl = headerLines(p)
        // a header-less part refuses its content, not the message
        if (phl != null) {
          val (pAt, phs) = phl
          val (pmt, pparams) = contentType(header(phs, "content-type"))
          val raw = java.util.Arrays.copyOfRange(p, pAt, p.length)
          if (pmt.startsWith("text/") && bodyText == null) {
            bodyText = textOf(decodeContent(header(phs, "content-transfer-encoding"), raw),
              pparams.getOrElse("charset", "us-ascii"))
          } else if (!pmt.startsWith("text/") && !pmt.startsWith("multipart/") && att == null) {
            att = decodeContent(header(phs, "content-transfer-encoding"), raw)
          }
        }
      }
      Msg(parts.length, subject, bodyText, att)
    } else if (mt.startsWith("text/")) {
      val bodyText = textOf(decodeContent(header(hs, "content-transfer-encoding"), body),
        params.getOrElse("charset", "us-ascii"))
      Msg(1, subject, bodyText, null)
    } else {
      Msg(1, subject, null,
        decodeContent(header(hs, "content-transfer-encoding"), body))
    }
  }

  def parts(b: Array[Byte]): Int = {
    val m = parse(b)
    if (m == null) -1 else m.nParts
  }

  def subjectOf(b: Array[Byte]): String = {
    val m = parse(b)
    if (m == null) null else m.subject
  }

  /** Decoded, CRLF→LF-normalized body text as UTF-8 bytes, or null. */
  def bodyOf(b: Array[Byte]): Array[Byte] = {
    val m = parse(b)
    if (m == null || m.bodyText == null) null
    else m.bodyText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def attachmentOf(b: Array[Byte]): Array[Byte] = {
    val m = parse(b)
    if (m == null) null else m.attachment
  }

  // -------------------------------------------------------------- synth

  private val Crlf = "\r\n"

  private def qpEncode(text: Array[Byte], lowercaseHex: Boolean): String = {
    val sb = new StringBuilder
    var lineLen = 0
    var i = 0
    while (i < text.length) {
      val c = text(i) & 0xFF
      val tok =
        if (c == '=' || c < 32 || c > 126)
          if (lowercaseHex) f"=${c}%02x" else f"=${c}%02X"
        else c.toChar.toString
      if (lineLen + tok.length > 73) { sb.append("=").append(Crlf); lineLen = 0 }
      sb.append(tok); lineLen += tok.length
      i += 1
    }
    sb.toString
  }

  private def b64Wrap(data: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(76, Crlf.getBytes).encodeToString(data)

  /** Synthesize a q137 message from a document's bytes.
    * `params` packs `doc_id | mode<<40`:
    *  0 → single-part text/plain 7bit;
    *  1 → multipart/mixed: QP text part + base64 attachment, RFC 2047
    *      B-encoded UTF-8 subject (an em-dash — a non-ASCII survivor);
    *  2 → single-part base64 text, subject as TWO adjacent Q-encoded
    *      words split across a folded header line (the §6.2 join);
    *  3 → multipart with a FOLDED plain subject, a quoted boundary
    *      containing spaces, transport padding after one delimiter,
    *      and lowercase QP hex;
    *  4 → multipart whose close delimiter is missing (refuse whole).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val meta = s"doc $id has ${text.length} chars"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val sb = new StringBuilder
    sb.append("From: corpus-bot@example.com").append(Crlf)
    sb.append("To: archive@example.com").append(Crlf)
    sb.append("Date: Mon, 01 Jan 2024 00:00:00 +0000").append(Crlf)
    mode match {
      case 0 =>
        sb.append(s"Subject: doc $id digest").append(Crlf)
        sb.append("MIME-Version: 1.0").append(Crlf)
        sb.append("Content-Type: text/plain; charset=utf-8").append(Crlf)
        sb.append("Content-Transfer-Encoding: 7bit").append(Crlf)
        sb.append(Crlf)
        sb.append(new String(text, java.nio.charset.StandardCharsets.ISO_8859_1)
          .replace("\n", Crlf))
      case 2 =>
        // two adjacent encoded-words; the fold's continuation space and
        // the inter-word space must BOTH vanish (unfold keeps the WSP,
        // §6.2 deletes it between encoded-words)
        sb.append(s"Subject: =?utf-8?Q?doc_$id?=").append(Crlf)
          .append(" =?utf-8?Q?_digest?=").append(Crlf)
        sb.append("MIME-Version: 1.0").append(Crlf)
        sb.append("Content-Type: text/plain; charset=utf-8").append(Crlf)
        sb.append("Content-Transfer-Encoding: base64").append(Crlf)
        sb.append(Crlf)
        sb.append(b64Wrap(text))
      case m =>
        val boundary =
          if (m == 3) s"b $id x" // spaces force the quoted spelling
          else s"=_graft_$id" // leading =_ drills decode-before-split
        if (m == 1) {
          val subj = s"doc $id — digest" // em-dash: non-ASCII survivor
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          sb.append("Subject: =?utf-8?B?")
            .append(java.util.Base64.getEncoder.encodeToString(subj))
            .append("?=").append(Crlf)
        } else {
          sb.append(s"Subject: doc $id").append(Crlf)
            .append(" folded digest").append(Crlf)
        }
        sb.append("MIME-Version: 1.0").append(Crlf)
        sb.append("Content-Type: multipart/mixed; boundary=\"")
          .append(boundary).append("\"").append(Crlf)
        sb.append(Crlf)
        sb.append("This preamble must be ignored by MIME readers.").append(Crlf)
        sb.append("--").append(boundary)
        if (m == 3) sb.append("  ") // transport padding
        sb.append(Crlf)
        sb.append("Content-Type: text/plain; charset=utf-8").append(Crlf)
        sb.append("Content-Transfer-Encoding: quoted-printable").append(Crlf)
        sb.append(Crlf)
        sb.append(qpEncode(text, lowercaseHex = m == 3)).append(Crlf)
        sb.append("--").append(boundary).append(Crlf)
        sb.append("Content-Type: application/octet-stream").append(Crlf)
        sb.append("Content-Transfer-Encoding: base64").append(Crlf)
        sb.append(Crlf)
        sb.append(b64Wrap(meta)).append(Crlf)
        if (m != 4) {
          sb.append("--").append(boundary).append("--").append(Crlf)
          sb.append("An epilogue readers must also ignore.").append(Crlf)
        }
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}

/** `binary -> int`: MIME part count, NULL on refusal. */
case class MimeParts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mime_parts"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MimeEval.parts(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mp")
      s"""
         |int $res = graft.functions.MimeEval.parts($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MimeParts =
    copy(child = newChild)
}

/** `binary -> string`: RFC 2047-decoded Subject, NULL on refusal. */
case class MimeSubject(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mime_subject"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MimeEval.subjectOf(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ms")
      s"""
         |String $res = graft.functions.MimeEval.subjectOf($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MimeSubject =
    copy(child = newChild)
}

/** `binary -> binary`: decoded LF-normalized body text bytes. */
case class MimeBody(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mime_body"

  override protected def nullSafeEval(input: Any): Any =
    MimeEval.bodyOf(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mb")
      s"""
         |byte[] $res = graft.functions.MimeEval.bodyOf($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MimeBody =
    copy(child = newChild)
}

/** `binary -> binary`: first non-text part's decoded content. */
case class MimeAttachment(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mime_attachment"

  override protected def nullSafeEval(input: Any): Any =
    MimeEval.attachmentOf(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ma")
      s"""
         |byte[] $res = graft.functions.MimeEval.attachmentOf($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MimeAttachment =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q137's synthesis. */
case class MimeSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mime_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    MimeEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.MimeEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MimeSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the MIME kernels. */
object MimeOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def mimeParts(bin: Column): Column =
    ColumnBridge.column(MimeParts(ColumnBridge.expression(bin.cast("binary"))))

  def mimeSubject(bin: Column): Column =
    ColumnBridge.column(MimeSubject(ColumnBridge.expression(bin.cast("binary"))))

  def mimeBody(bin: Column): Column =
    ColumnBridge.column(MimeBody(ColumnBridge.expression(bin.cast("binary"))))

  def mimeAttachment(bin: Column): Column =
    ColumnBridge.column(MimeAttachment(ColumnBridge.expression(bin.cast("binary"))))

  def mimeSynth(text: Column, params: Column): Column =
    ColumnBridge.column(MimeSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
