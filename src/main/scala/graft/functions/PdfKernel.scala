package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PDF TEXT extraction — the document-format rung of the intake family
  * (q82 WARC, q115 chunked, q116 full-stack): real corpora are full of
  * PDFs, and a pipeline that cannot read them drops the highest-quality
  * slice of the crawl. A pure-JVM extractor:
  *
  *  - object walk: `N G obj … endobj` bodies collected by scanning the
  *    raw bytes (the classic repair-parser strategy — xref offsets in
  *    crawled PDFs are wrong often enough that every real extractor
  *    falls back to a scan; the trailer is still REQUIRED to exist);
  *  - document graph, not stream guessing: the `/Type /Pages` node's
  *    `/Kids` array gives page ORDER, each `/Type /Page`'s `/Contents`
  *    reference names its content stream — a random stream object with
  *    text-looking bytes is never read;
  *  - streams: `/Length` must equal the measured `stream…endstream`
  *    span (a lying Length refuses), `/FlateDecode` inflates through
  *    the shared zlib discipline, no filter passes through, any other
  *    filter refuses (stop-don't-guess);
  *  - content text: `BT…ET` blocks, literal strings (escapes `\( \) \\
  *    \n \r \t \b \f \ddd` and backslash-newline continuation), hex
  *    strings, and the show operators `Tj`, `'` (newline + show), and
  *    `TJ` (array show — kern numbers ignored, never inferred as
  *    spaces: stated); `Td`/`TD`/`T*`/`'` start a new output line.
  *  - fonts: `Tf` tracks the current font by resource name. Simple
  *    fonts decode Latin-1; a `/Type0` COMPOSITE font's strings are
  *    2-byte codes mapped through its `/ToUnicode` CMap (bfchar +
  *    bfrange, single-destination ranges incrementing the final
  *    UTF-16 code unit — surrogate-pair destinations included). A
  *    composite font WITHOUT a ToUnicode refuses: Latin-1-ing its
  *    bytes would be garbage, not text (stop-don't-guess).
  *
  * Structural lies refuse with NULL: missing `%PDF-` header or
  * `%%EOF`, a missing `/Pages` node or referenced object, `/Kids`
  * disagreeing with `/Count`, a `/Length` that lies, an inflate
  * failure, or an unterminated string/array/BT block.
  *
  * Reference behavior: scholar-stream ingests arXiv METADATA only
  * (openalex_client.py fetches abstracts); extracting the papers' own text
  * is the north-star extension a training corpus needs.
  */
object PdfEval {

  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater(false)
  }

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val n = b.length - pat.length
    while (i <= n) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** One indirect object: its dictionary/body text (Latin-1) and, when
    * present, the raw stream bytes.
    */
  private final case class Obj(body: String, stream: Array[Byte])

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12

  /** Extracted text of a PDF, or null on refusal. */
  def extract(b: Array[Byte]): String = {
    if (b == null || b.length < 16) return null
    if (indexOf(b, ascii("%PDF-"), 0) != 0) return null
    if (indexOf(b, ascii("%%EOF"), 0) < 0) return null

    // ── object walk ──
    val objs = scala.collection.mutable.Map.empty[Int, Obj]
    var pos = 0
    val objPat = ascii(" obj")
    while (pos >= 0 && pos < b.length) {
      val at = indexOf(b, objPat, pos)
      if (at < 0) pos = -1
      else {
        // parse "N G obj" backwards from ` obj`
        var q = at - 1
        while (q >= 0 && (b(q) & 0xFF) >= '0' && (b(q) & 0xFF) <= '9') q -= 1
        var r = q
        while (r >= 0 && isWs(b(r))) r -= 1
        var s = r
        while (s >= 0 && (b(s) & 0xFF) >= '0' && (b(s) & 0xFF) <= '9') s -= 1
        if (q == at - 1 || r == q || s == r) { pos = at + 4 }
        else {
          val num = new String(b, s + 1, r - s, "ISO-8859-1").toInt
          val bodyStart = at + 4
          // the stream extent must be located BEFORE searching for
          // `endobj`: compressed stream bytes are free to contain the
          // keyword, and /Length is what delimits them
          val endCand = indexOf(b, ascii("endobj"), bodyStart)
          val sk = indexOf(b, ascii("stream"), bodyStart)
          if (sk >= 0 && (endCand < 0 || sk < endCand)) {
            val body = new String(b, bodyStart, sk - bodyStart, "ISO-8859-1")
            val len = dictInt(body, "/Length")
            if (len < 0) return null
            var ds = sk + 6
            if (ds < b.length && b(ds) == '\r') ds += 1
            if (ds < b.length && b(ds) == '\n') ds += 1
            if (ds + len > b.length) return null
            val es = indexOf(b, ascii("endstream"), ds + len)
            // the declared Length must MEASURE true: nothing but EOL
            // padding between data end and `endstream`
            if (es < 0) return null
            var gap = ds + len
            while (gap < es) {
              if (!isWs(b(gap))) return null
              gap += 1
            }
            val end = indexOf(b, ascii("endobj"), es)
            if (end < 0) return null
            objs(num) = Obj(body,
              java.util.Arrays.copyOfRange(b, ds, ds + len))
            pos = end + 6
          } else if (endCand >= 0) {
            objs(num) = Obj(
              new String(b, bodyStart, endCand - bodyStart, "ISO-8859-1"), null)
            pos = endCand + 6
          } else return null // object never closes
        }
      }
    }
    if (objs.isEmpty) return null

    // ── document graph ──
    val pagesNode = objs.values.find(o =>
      o.stream == null && o.body.contains("/Type") &&
        o.body.contains("/Pages") && o.body.contains("/Kids"))
      .getOrElse(return null)
    val kids = refArray(pagesNode.body, "/Kids").getOrElse(return null)
    val count = dictInt(pagesNode.body, "/Count")
    if (count != kids.length) return null // Kids/Count disagree
    // ── font resolution: a /Type0 composite font's text is 2-byte
    // codes through its /ToUnicode CMap; a composite WITHOUT one is
    // unextractable and refuses (Latin-1-ing its bytes would be
    // garbage, not text — stop-don't-guess). CMaps cache per ref.
    val cmapCache = scala.collection.mutable.Map.empty[Int, java.util.HashMap[Integer, String]]
    def fontMap(ref: Int): Either[Unit, java.util.HashMap[Integer, String]] = {
      val font = objs.getOrElse(ref, return Left(()))
      val composite = font.body.contains("/Type0")
      dictRef(font.body, "/ToUnicode") match {
        case None => if (composite) Left(()) else Right(null)
        case Some(cm) =>
          cmapCache.get(cm) match {
            case Some(m) => Right(m)
            case None =>
              val cobj = objs.getOrElse(cm, return Left(()))
              if (cobj.stream == null) return Left(())
              val data =
                if (cobj.body.contains("/Filter")) {
                  if (!cobj.body.contains("/FlateDecode")) return Left(())
                  val out = inflate(cobj.stream)
                  if (out == null) return Left(())
                  out
                } else cobj.stream
              val m = parseCMap(new String(data, "ISO-8859-1"))
              if (m == null) Left(())
              else { cmapCache(cm) = m; Right(m) }
          }
      }
    }
    val FontRef = "/([A-Za-z0-9]+)\\s+(\\d+)\\s+\\d+\\s+R".r
    val sb = new java.lang.StringBuilder()
    var first = true
    kids.foreach { pref =>
      val page = objs.getOrElse(pref, return null)
      if (!page.body.contains("/Page")) return null
      // page font dict: /Resources << /Font << /F1 9 0 R ... >> >>
      val fonts = scala.collection.mutable.Map.empty[String, java.util.HashMap[Integer, String]]
      val fi = page.body.indexOf("/Font")
      if (fi >= 0) {
        val open = page.body.indexOf("<<", fi)
        val close = if (open < 0) -1 else page.body.indexOf(">>", open)
        if (open < 0 || close < 0) return null
        FontRef.findAllMatchIn(page.body.substring(open, close)).foreach { mm =>
          fontMap(mm.group(2).toInt) match {
            case Left(_) => return null
            case Right(m) => fonts(mm.group(1)) = m
          }
        }
      }
      val cref = dictRef(page.body, "/Contents").getOrElse(return null)
      val cobj = objs.getOrElse(cref, return null)
      if (cobj.stream == null) return null
      val data =
        if (cobj.body.contains("/Filter")) {
          if (!cobj.body.contains("/FlateDecode")) return null
          val out = inflate(cobj.stream)
          if (out == null) return null
          out
        } else cobj.stream
      val txt = contentText(data, fonts)
      if (txt == null) return null
      if (txt.nonEmpty) {
        if (!first) sb.append('\n')
        sb.append(txt)
        first = false
      }
    }
    sb.toString
  }

  /** Map a composite show string (chars are raw bytes) through a
    * ToUnicode CMap: 2-byte big-endian codes, every code mapped or
    * the string refuses (an odd byte count refuses too). */
  private def mapComposite(raw: String,
                           m: java.util.HashMap[Integer, String]): String = {
    if ((raw.length & 1) != 0) return null
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < raw.length) {
      val code = (raw.charAt(i) << 8) | raw.charAt(i + 1)
      val dst = m.get(code)
      if (dst == null) return null
      sb.append(dst)
      i += 2
    }
    sb.toString
  }

  /** ToUnicode CMap parse (PDF 32000 §9.10.3): `bfchar` pairs and
    * `bfrange` triples over 2-byte source codes; destinations are
    * UTF-16BE hex (surrogate pairs welcome); a range with a single
    * destination increments the FINAL UTF-16 code unit (and refuses
    * if the span would overflow it); the array form lists one
    * destination per code. Returns null on malformation. */
  private def parseCMap(t: String): java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String]()

    // hex token at or after `i`: skips whitespace, expects <...>,
    // returns (bytes-as-chars string, nextIndex) or null
    def hexTok(from: Int): (String, Int) = {
      var i = from
      while (i < t.length && t.charAt(i).isWhitespace) i += 1
      if (i >= t.length || t.charAt(i) != '<') return null
      i += 1
      val sb = new java.lang.StringBuilder()
      var hi = -1
      while (i < t.length) {
        val c = t.charAt(i)
        if (c == '>') {
          if (hi >= 0) return null // odd digit count: malformed
          return (sb.toString, i + 1)
        }
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { sb.append((hi * 16 + d).toChar); hi = -1 }
        } else if (!c.isWhitespace) return null
        i += 1
      }
      null
    }
    def codeOf(s: String): Int =
      if (s.length != 2) -1 else (s.charAt(0) << 8) | s.charAt(1)
    // dst hex bytes -> UTF-16 string (pairs of bytes are code units)
    def utf16Of(s: String): String = {
      if ((s.length & 1) != 0 || s.isEmpty) return null
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < s.length) {
        sb.append((((s.charAt(i) << 8) | s.charAt(i + 1))).toChar)
        i += 2
      }
      sb.toString
    }

    var cursor = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val bc = t.indexOf("beginbfchar", cursor)
      val br = t.indexOf("beginbfrange", cursor)
      if (bc < 0 && br < 0) return m
      if (bc >= 0 && (br < 0 || bc < br)) {
        val end = t.indexOf("endbfchar", bc)
        if (end < 0) return null
        var i = bc + "beginbfchar".length
        while (i < end) {
          // next token is either a src hex or only whitespace remains
          var j = i
          while (j < end && t.charAt(j).isWhitespace) j += 1
          if (j >= end) i = end
          else {
            val src = hexTok(j)
            if (src == null) return null
            val dst = hexTok(src._2)
            if (dst == null || dst._2 > end) return null
            val code = codeOf(src._1)
            val u = utf16Of(dst._1)
            if (code < 0 || u == null) return null
            m.put(code, u)
            i = dst._2
          }
        }
        cursor = end + "endbfchar".length
      } else {
        val end = t.indexOf("endbfrange", br)
        if (end < 0) return null
        var i = br + "beginbfrange".length
        while (i < end) {
          var j = i
          while (j < end && t.charAt(j).isWhitespace) j += 1
          if (j >= end) i = end
          else {
            val lo = hexTok(j)
            if (lo == null) return null
            val hi = hexTok(lo._2)
            if (hi == null) return null
            val loC = codeOf(lo._1)
            val hiC = codeOf(hi._1)
            if (loC < 0 || hiC < 0 || hiC < loC) return null
            // destination: single hex (incrementing) or [ array ]
            var k = hi._2
            while (k < end && t.charAt(k).isWhitespace) k += 1
            if (k < end && t.charAt(k) == '[') {
              var p = k + 1
              var c = loC
              while (c <= hiC) {
                val d = hexTok(p)
                if (d == null || d._2 > end) return null
                val u = utf16Of(d._1)
                if (u == null) return null
                m.put(c, u)
                p = d._2
                c += 1
              }
              while (p < end && t.charAt(p).isWhitespace) p += 1
              if (p >= end || t.charAt(p) != ']') return null
              i = p + 1
            } else {
              val d = hexTok(k)
              if (d == null || d._2 > end) return null
              val base = utf16Of(d._1)
              if (base == null) return null
              val lastUnit = base.charAt(base.length - 1).toInt
              if (lastUnit + (hiC - loC) > 0xFFFF) return null // unit overflow
              var c = loC
              while (c <= hiC) {
                val u = base.substring(0, base.length - 1) +
                  (lastUnit + (c - loC)).toChar
                m.put(c, u)
                c += 1
              }
              i = d._2
            }
            if (m.size > 65536) return null // codespace bound
          }
        }
        cursor = end + "endbfrange".length
      }
    }
    null // runaway section count: malformed
  }

  /** Page count — an INDEPENDENT meta walk (the q59/q118 meta-vs-pixels
    * discipline): header, trailer, the /Pages node's /Kids arity checked
    * against /Count. It does not read content streams, so a document
    * whose structure is sound but whose text refuses still reports its
    * page count. Returns -1 on refusal.
    */
  def pageCount(b: Array[Byte]): Int = {
    if (b == null || b.length < 16) return -1
    if (indexOf(b, ascii("%PDF-"), 0) != 0) return -1
    if (indexOf(b, ascii("%%EOF"), 0) < 0) return -1
    val s = new String(b, "ISO-8859-1")
    var ki = s.indexOf("/Kids")
    while (ki >= 0) {
      // the /Kids that belongs to a /Type /Pages dict: look back to the
      // nearest `obj` and require /Pages in between
      val ob = s.lastIndexOf(" obj", ki)
      if (ob >= 0 && s.substring(ob, ki).contains("/Pages")) {
        // confine /Kids and /Count to this object's own extent — an
        // unbounded suffix search would borrow a LATER object's /Count
        // when the Pages dict lacks one, making the cross-check pass or
        // fail on unrelated bytes (extract() already scopes lookups to
        // the object body).
        val oe = s.indexOf("endobj", ki)
        val body = if (oe >= 0) s.substring(ki, oe) else s.substring(ki)
        val arr = refArray(body, "/Kids").getOrElse(return -1)
        val cnt = dictInt(body, "/Count")
        if (cnt != arr.length) return -1
        return arr.length
      }
      ki = s.indexOf("/Kids", ki + 5)
    }
    -1
  }

  private def inflate(z: Array[Byte]): Array[Byte] = {
    val inf = infl.get()
    inf.reset()
    inf.setInput(z)
    val out = new java.io.ByteArrayOutputStream(z.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return null
        } else out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }
  }

  /** First integer after `key` in a dict string, or -1. */
  private def dictInt(dict: String, key: String): Int = {
    val i = dict.indexOf(key)
    if (i < 0) return -1
    var p = i + key.length
    while (p < dict.length && dict.charAt(p).isWhitespace) p += 1
    val s = p
    while (p < dict.length && dict.charAt(p).isDigit) p += 1
    if (p == s) -1 else dict.substring(s, p).toInt
  }

  /** `key N 0 R` reference, or None. */
  private def dictRef(dict: String, key: String): Option[Int] = {
    val i = dict.indexOf(key)
    if (i < 0) return None
    val m = java.util.regex.Pattern.compile("\\s*(\\d+)\\s+\\d+\\s+R")
      .matcher(dict)
    if (m.find(i + key.length) && m.start == i + key.length)
      Some(m.group(1).toInt)
    else None
  }

  /** `key [N 0 R N 0 R …]` reference array, or None. */
  private def refArray(dict: String, key: String): Option[Array[Int]] = {
    val i = dict.indexOf(key)
    if (i < 0) return None
    val open = dict.indexOf('[', i)
    if (open < 0) return None
    val close = dict.indexOf(']', open)
    if (close < 0) return None
    val inner = dict.substring(open + 1, close)
    val m = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R").matcher(inner)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var last = 0
    while (m.find()) {
      // nothing but whitespace may sit between references
      if (inner.substring(last, m.start).exists(!_.isWhitespace)) return None
      out += m.group(1).toInt
      last = m.end
    }
    if (inner.substring(last).exists(!_.isWhitespace)) return None
    Some(out.toArray)
  }

  /** Text of one content stream: BT…ET blocks, show operators, line
    * moves, with FONT tracking — `Tf` selects the current font by its
    * resource name; a font with a ToUnicode CMap routes every shown
    * string through [[mapComposite]] (2-byte codes), everything else
    * decodes Latin-1 as before. Returns null on an unterminated
    * string/BT or an unmappable/odd composite string.
    */
  private def contentText(data: Array[Byte],
                          fonts: scala.collection.Map[String, java.util.HashMap[Integer, String]]): String = {
    val s = new String(data, "ISO-8859-1")
    val out = new java.lang.StringBuilder()
    val line = new java.lang.StringBuilder()
    var lineOpen = false
    def flushLine(): Unit = {
      if (lineOpen) {
        if (out.length() > 0) out.append('\n')
        out.append(line)
        line.setLength(0)
        lineOpen = false
      }
    }
    var i = 0
    var inText = false
    // the last parsed string operand, waiting for its operator
    var pending: String = null
    var pendingArr: String = null
    var pendingName: String = null
    var curMap: java.util.HashMap[Integer, String] = null
    def shown(raw: String): String =
      if (curMap == null) raw else mapComposite(raw, curMap)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, ni) = literal(s, i)
        if (ni < 0) return null
        pending = str
        i = ni
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) != '<') {
        val (str, ni) = hexStr(s, i)
        if (ni < 0) return null
        pending = str
        i = ni
      } else if (c == '[') {
        val (str, ni) = arrayStr(s, i)
        if (ni < 0) return null
        pendingArr = str
        i = ni
      } else if (c == '/') {
        var j = i + 1
        while (j < s.length && !s.charAt(j).isWhitespace &&
          s.charAt(j) != '(' && s.charAt(j) != '[' && s.charAt(j) != '<' &&
          s.charAt(j) != '/' && s.charAt(j) != ']' && s.charAt(j) != '>') j += 1
        pendingName = s.substring(i + 1, j)
        i = j
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        // operator token
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace &&
          s.charAt(j) != '(' && s.charAt(j) != '[' && s.charAt(j) != '<' &&
          s.charAt(j) != '/' && s.charAt(j) != ']') j += 1
        val op = s.substring(i, j)
        op match {
          case "BT" =>
            if (inText) return null
            inText = true
          case "ET" =>
            if (!inText) return null
            flushLine()
            inText = false
          case "Tf" =>
            // /Name size Tf — unknown names keep the simple decode
            if (pendingName != null)
              curMap = fonts.getOrElse(pendingName, null)
            pendingName = null
          case "Td" | "TD" | "T*" if inText =>
            flushLine()
            lineOpen = true
          case "Tj" if inText =>
            if (pending == null) return null
            val mapped = shown(pending)
            if (mapped == null) return null
            if (!lineOpen) lineOpen = true
            line.append(mapped)
          case "'" if inText =>
            if (pending == null) return null
            val mapped = shown(pending)
            if (mapped == null) return null
            flushLine()
            lineOpen = true
            line.append(mapped)
          case "TJ" if inText =>
            if (pendingArr == null) return null
            val mapped = shown(pendingArr)
            if (mapped == null) return null
            if (!lineOpen) lineOpen = true
            line.append(mapped)
          case _ => () // every other operator is skipped
        }
        pending = null
        pendingArr = null
        i = j
      } else i += 1
    }
    if (inText) return null // BT never closed
    flushLine()
    out.toString
  }

  /** Parse a literal string at `(`; returns (value, index after). */
  private def literal(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var depth = 1
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length) return (null, -1)
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2
            if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var n = 0
            i += 1
            while (n < 3 && i < s.length && s.charAt(i) >= '0' &&
              s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); n += 1; i += 1 }
            sb.append((v & 0xFF).toChar)
          case _ => sb.append(e); i += 2 // unknown escape: the char itself
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return (sb.toString, i + 1)
        sb.append(c); i += 1
      } else { sb.append(c); i += 1 }
    }
    (null, -1) // unterminated
  }

  /** Parse a hex string at `<`; returns (value, index after). */
  private def hexStr(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var i = start + 1
    var hi = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '>') {
        if (hi >= 0) sb.append((hi * 16).toChar) // odd digit: low = 0
        return (sb.toString, i + 1)
      }
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { sb.append((hi * 16 + d).toChar); hi = -1 }
      } else if (!c.isWhitespace) return (null, -1)
      i += 1
    }
    (null, -1)
  }

  /** Parse a TJ array at `[`: concatenated strings, kern numbers
    * ignored; returns (value, index after).
    */
  private def arrayStr(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ']') return (sb.toString, i + 1)
      else if (c == '(') {
        val (str, ni) = literal(s, i)
        if (ni < 0) return (null, -1)
        sb.append(str)
        i = ni
      } else if (c == '<') {
        val (str, ni) = hexStr(s, i)
        if (ni < 0) return (null, -1)
        sb.append(str)
        i = ni
      } else i += 1 // kern numbers / whitespace
    }
    (null, -1)
  }
}

object PdfSynthEval {

  /** The q125 escape-drill line (class 3): parens, a backslash, and a
    * raw CR — every literal-string escape path in one line, spelled
    * identically in the DuckDB oracle via chr() codepoints.
    */
  final val EscLine = "esc (par) en\\d \r tail"

  /** The q125 composite-font drill line (class 6): a bfchar glyph
    * (U+00A1) followed by a bfrange SPANNING A SURROGATE PAIR
    * (U+1D4A2..U+1D4A4 — the low surrogate increments). Spelled in
    * the oracle via chr(161)‖chr(119970)‖chr(119971)‖chr(119972).
    */
  final val CompositeLine =
    "\u00A1\uD835\uDCA2\uD835\uDCA3\uD835\uDCA4"

  private val defl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false) // zlib — PDF FlateDecode
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = defl.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  private def escLit(s: String): String = {
    val sb = new java.lang.StringBuilder()
    s.foreach {
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case '\r' => sb.append("\\r")
      case '\n' => sb.append("\\n")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def hexOf(s: String): String =
    s.getBytes("ISO-8859-1").map(b => f"${b & 0xFF}%02X").mkString

  /** Composite code assignment for mode 4: printable ASCII rides a
    * bfrange off U+0020 (code 0x0200 + offset); the [[CompositeLine]]
    * glyphs take low codes — 0x0001 via bfchar, 0x0002-0x0004 via the
    * surrogate-spanning bfrange. Returns -1 for unmappable chars
    * (never produced by the corpus words). */
  private def compCodeOf(cp: Int): Int = cp match {
    case 0xA1 => 0x0001
    case c if c >= 0x1D4A2 && c <= 0x1D4A4 => 0x0002 + (c - 0x1D4A2)
    case c if c >= 0x20 && c <= 0x7A => 0x0200 + (c - 0x20)
    case _ => -1
  }

  private def compHexOf(s: String): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val code = compCodeOf(cp)
      if (code >= 0) sb.append(f"$code%04X")
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The mode-4 ToUnicode CMap body (see [[compCodeOf]]). */
  private val CMapBody: String =
    "/CIDInit /ProcSet findresource begin\n" +
      "begincmap\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "1 beginbfchar\n<0001> <00A1>\nendbfchar\n" +
      "2 beginbfrange\n" +
      "<0200> <025A> <0020>\n" +
      "<0002> <0004> <D835DCA2>\n" +
      "endbfrange\nendcmap\nend\n"

  /** Synthesize a PDF whose page text is `words` wrapped 8 per line,
    * 5 lines per page. `mode` picks the spelling the decoder must
    * invert: 0 → literal strings, one `Td … Tj` per line, FlateDecode;
    * 1 → HEX strings, lines after the first shown with `'`
    * (newline+show), FlateDecode; 2 → `TJ` arrays with each line split
    * mid-string around a kern number, `T*` line moves, RAW stream
    * (no /Filter); 3 → literals + [[EscLine]] appended as a final line
    * (the escape drill), FlateDecode; 4 → a /Type0 COMPOSITE font:
    * 2-byte hex show strings through a Flate-compressed /ToUnicode
    * CMap (bfchar + two bfranges, one spanning a surrogate pair), with
    * [[CompositeLine]] appended as a final line.
    */
  def synth(words: Array[String], mode: Int): Array[Byte] = {
    var lines = words.grouped(8).map(_.mkString(" ")).toArray
    if (mode == 3) lines = lines :+ EscLine
    if (mode == 4) lines = lines :+ CompositeLine
    val pages = if (lines.isEmpty) Array(Array.empty[String])
      else lines.grouped(5).toArray
    val n = pages.length
    def content(page: Array[String]): Array[Byte] = {
      val sb = new java.lang.StringBuilder("BT /F1 12 Tf ")
      mode match {
        case 1 =>
          page.zipWithIndex.foreach { case (l, i) =>
            if (i == 0) sb.append("72 710 Td <").append(hexOf(l)).append("> Tj ")
            else sb.append('<').append(hexOf(l)).append("> ' ")
          }
        case 2 =>
          page.zipWithIndex.foreach { case (l, i) =>
            if (i == 0) sb.append("72 710 Td ")
            else sb.append("T* ")
            val (a, b) = l.splitAt(l.length / 2)
            sb.append("[(").append(escLit(a)).append(") -28 (")
              .append(escLit(b)).append(")] TJ ")
          }
        case 4 =>
          page.foreach { l =>
            sb.append("0 -14 Td <").append(compHexOf(l)).append("> Tj ")
          }
        case _ =>
          page.foreach { l =>
            sb.append("0 -14 Td (").append(escLit(l)).append(") Tj ")
          }
      }
      sb.append("ET")
      sb.toString.getBytes("ISO-8859-1")
    }
    val out = new java.io.ByteArrayOutputStream(512)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    (0 until n).foreach { i =>
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/Contents ${3 + n + i} 0 R /Resources << /Font << /F1 " +
        s"${3 + 2 * n} 0 R >> >> /MediaBox [0 0 612 792] >> endobj\n")
    }
    (0 until n).foreach { i =>
      val raw = content(pages(i))
      val data = if (mode == 2) raw else deflate(raw)
      val filter = if (mode == 2) "" else " /Filter /FlateDecode"
      w(s"${3 + n + i} 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data, 0, data.length)
      w("\nendstream endobj\n")
    }
    if (mode == 4) {
      w(s"${3 + 2 * n} 0 obj << /Type /Font /Subtype /Type0 " +
        s"/BaseFont /Graft /Encoding /Identity-H " +
        s"/ToUnicode ${4 + 2 * n} 0 R >> endobj\n")
      val cm = deflate(CMapBody.getBytes("ISO-8859-1"))
      w(s"${4 + 2 * n} 0 obj << /Length ${cm.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(cm, 0, cm.length)
      w("\nendstream endobj\n")
      w(s"trailer << /Size ${5 + 2 * n} /Root 1 0 R >>\nstartxref\n0\n%%EOF")
    } else {
      w(s"${3 + 2 * n} 0 obj << /Type /Font /Subtype /Type1 " +
        "/BaseFont /Helvetica >> endobj\n")
      w(s"trailer << /Size ${4 + 2 * n} /Root 1 0 R >>\nstartxref\n0\n%%EOF")
    }
    out.toByteArray
  }
}

/** `(array<string> words, long mode) -> binary`: q125's synthesis
  * expression ([[PdfSynthEval.synth]]).
  */
case class PdfSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_synth"

  override protected def nullSafeEval(ws: Any, mode: Any): Any = {
    val arr = ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val words = new Array[String](arr.numElements())
    var i = 0
    while (i < words.length) {
      words(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    PdfSynthEval.synth(words, mode.asInstanceOf[Long].toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, mode) => {
      val words = ctx.freshName("pdfWords")
      val idx = ctx.freshName("i")
      s"""
         |String[] $words = new String[$ws.numElements()];
         |for (int $idx = 0; $idx < $words.length; $idx++) {
         |  $words[$idx] = $ws.isNullAt($idx) ? "" :
         |    $ws.getUTF8String($idx).toString();
         |}
         |${ev.value} = graft.functions.PdfSynthEval.synth($words, (int) $mode);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PdfSynth =
    copy(left = newLeft, right = newRight)
}

/** `binary -> string`: extracted PDF text via [[PdfEval.extract]];
  * NULL on refusal.
  */
case class PdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_text"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PdfEval.extract(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pdftxt")
      s"""
         |String $res = graft.functions.PdfEval.extract($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PdfText =
    copy(child = newChild)
}

/** `binary -> int`: verified page count via [[PdfEval.pageCount]];
  * NULL on refusal — the independent meta walk.
  */
case class PdfPages(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_pages"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PdfEval.pageCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pdfpg")
      s"""
         |int $res = graft.functions.PdfEval.pageCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PdfPages =
    copy(child = newChild)
}

/** Column surface for the PDF kernels. */
object PdfOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def pdfText(bin: Column): Column =
    ColumnBridge.column(PdfText(ColumnBridge.expression(bin.cast("binary"))))

  def pdfPages(bin: Column): Column =
    ColumnBridge.column(PdfPages(ColumnBridge.expression(bin.cast("binary"))))

  def pdfSynth(words: Column, mode: Column): Column =
    ColumnBridge.column(PdfSynth(
      ColumnBridge.expression(words),
      ColumnBridge.expression(mode.cast("long"))))
}
