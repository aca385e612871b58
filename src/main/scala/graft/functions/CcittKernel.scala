package graft.functions

/** CCITT bilevel codecs for the TIFF fax compressions (q197's
  * scanned-document classes): Group 4 / T.6 (compression 4), Group 3
  * / T.4 in both 1D and 2D-with-tag-bit spellings (compression 3 —
  * imageio's writer emits T4Options=1, i.e. MR 2D), and Modified
  * Huffman with byte-aligned rows (compression 2, "CCITT RLE").
  * Implemented from the T.4/T.6 tables and coding procedures:
  *
  *  - the T.4 WHITE and BLACK run-length codes (terminating 0..63 +
  *    makeup 64..1728) and the shared extended makeups 1792..2560,
  *    MSB-first;
  *  - the T.6 2D modes: vertical V0/VR1-3/VL1-3, horizontal
  *    (mode code + two T.4 runs), and pass, against the reference
  *    line's changing elements b1/b2 (imaginary all-white line above
  *    the first row, per strip);
  *  - rows are continuous in the bit stream (no byte alignment);
  *    output rows are MSB-first packed, 1 = black (the TIFF
  *    WhiteIsZero convention).
  *
  * UNLIKE the VP8 probability tables, every constant here is
  * cross-validated IN-CONTAINER: the JDK's imageio TIFF plugin writes
  * and reads CCITT T.6, and TiffPixelSpec round-trips both directions
  * against it — a transcription slip fails a real second
  * implementation, not just our own mirror. The paired encoder emits
  * the standard pass/vertical/horizontal selection and EOFB.
  */
object CcittEval {

  // T.4 code tables as parallel arrays (run, bit length, code value).
  // Terminating codes first, then makeups; the decoder folds them into
  // one prefix map per color, the encoder indexes them directly.
  private val WhiteCodes: Array[(Int, Int, Int)] = Array(
    (0, 8, Integer.parseInt("00110101", 2)),
    (1, 6, Integer.parseInt("000111", 2)),
    (2, 4, Integer.parseInt("0111", 2)),
    (3, 4, Integer.parseInt("1000", 2)),
    (4, 4, Integer.parseInt("1011", 2)),
    (5, 4, Integer.parseInt("1100", 2)),
    (6, 4, Integer.parseInt("1110", 2)),
    (7, 4, Integer.parseInt("1111", 2)),
    (8, 5, Integer.parseInt("10011", 2)),
    (9, 5, Integer.parseInt("10100", 2)),
    (10, 5, Integer.parseInt("00111", 2)),
    (11, 5, Integer.parseInt("01000", 2)),
    (12, 6, Integer.parseInt("001000", 2)),
    (13, 6, Integer.parseInt("000011", 2)),
    (14, 6, Integer.parseInt("110100", 2)),
    (15, 6, Integer.parseInt("110101", 2)),
    (16, 6, Integer.parseInt("101010", 2)),
    (17, 6, Integer.parseInt("101011", 2)),
    (18, 7, Integer.parseInt("0100111", 2)),
    (19, 7, Integer.parseInt("0001100", 2)),
    (20, 7, Integer.parseInt("0001000", 2)),
    (21, 7, Integer.parseInt("0010111", 2)),
    (22, 7, Integer.parseInt("0000011", 2)),
    (23, 7, Integer.parseInt("0000100", 2)),
    (24, 7, Integer.parseInt("0101000", 2)),
    (25, 7, Integer.parseInt("0101011", 2)),
    (26, 7, Integer.parseInt("0010011", 2)),
    (27, 7, Integer.parseInt("0100100", 2)),
    (28, 7, Integer.parseInt("0011000", 2)),
    (29, 8, Integer.parseInt("00000010", 2)),
    (30, 8, Integer.parseInt("00000011", 2)),
    (31, 8, Integer.parseInt("00011010", 2)),
    (32, 8, Integer.parseInt("00011011", 2)),
    (33, 8, Integer.parseInt("00010010", 2)),
    (34, 8, Integer.parseInt("00010011", 2)),
    (35, 8, Integer.parseInt("00010100", 2)),
    (36, 8, Integer.parseInt("00010101", 2)),
    (37, 8, Integer.parseInt("00010110", 2)),
    (38, 8, Integer.parseInt("00010111", 2)),
    (39, 8, Integer.parseInt("00101000", 2)),
    (40, 8, Integer.parseInt("00101001", 2)),
    (41, 8, Integer.parseInt("00101010", 2)),
    (42, 8, Integer.parseInt("00101011", 2)),
    (43, 8, Integer.parseInt("00101100", 2)),
    (44, 8, Integer.parseInt("00101101", 2)),
    (45, 8, Integer.parseInt("00000100", 2)),
    (46, 8, Integer.parseInt("00000101", 2)),
    (47, 8, Integer.parseInt("00001010", 2)),
    (48, 8, Integer.parseInt("00001011", 2)),
    (49, 8, Integer.parseInt("01010010", 2)),
    (50, 8, Integer.parseInt("01010011", 2)),
    (51, 8, Integer.parseInt("01010100", 2)),
    (52, 8, Integer.parseInt("01010101", 2)),
    (53, 8, Integer.parseInt("00100100", 2)),
    (54, 8, Integer.parseInt("00100101", 2)),
    (55, 8, Integer.parseInt("01011000", 2)),
    (56, 8, Integer.parseInt("01011001", 2)),
    (57, 8, Integer.parseInt("01011010", 2)),
    (58, 8, Integer.parseInt("01011011", 2)),
    (59, 8, Integer.parseInt("01001010", 2)),
    (60, 8, Integer.parseInt("01001011", 2)),
    (61, 8, Integer.parseInt("00110010", 2)),
    (62, 8, Integer.parseInt("00110011", 2)),
    (63, 8, Integer.parseInt("00110100", 2)),
    // white makeups
    (64, 5, Integer.parseInt("11011", 2)),
    (128, 5, Integer.parseInt("10010", 2)),
    (192, 6, Integer.parseInt("010111", 2)),
    (256, 7, Integer.parseInt("0110111", 2)),
    (320, 8, Integer.parseInt("00110110", 2)),
    (384, 8, Integer.parseInt("00110111", 2)),
    (448, 8, Integer.parseInt("01100100", 2)),
    (512, 8, Integer.parseInt("01100101", 2)),
    (576, 8, Integer.parseInt("01101000", 2)),
    (640, 8, Integer.parseInt("01100111", 2)),
    (704, 9, Integer.parseInt("011001100", 2)),
    (768, 9, Integer.parseInt("011001101", 2)),
    (832, 9, Integer.parseInt("011010010", 2)),
    (896, 9, Integer.parseInt("011010011", 2)),
    (960, 9, Integer.parseInt("011010100", 2)),
    (1024, 9, Integer.parseInt("011010101", 2)),
    (1088, 9, Integer.parseInt("011010110", 2)),
    (1152, 9, Integer.parseInt("011010111", 2)),
    (1216, 9, Integer.parseInt("011011000", 2)),
    (1280, 9, Integer.parseInt("011011001", 2)),
    (1344, 9, Integer.parseInt("011011010", 2)),
    (1408, 9, Integer.parseInt("011011011", 2)),
    (1472, 9, Integer.parseInt("010011000", 2)),
    (1536, 9, Integer.parseInt("010011001", 2)),
    (1600, 9, Integer.parseInt("010011010", 2)),
    (1664, 6, Integer.parseInt("011000", 2)),
    (1728, 9, Integer.parseInt("010011011", 2)))

  private val BlackCodes: Array[(Int, Int, Int)] = Array(
    (0, 10, Integer.parseInt("0000110111", 2)),
    (1, 3, Integer.parseInt("010", 2)),
    (2, 2, Integer.parseInt("11", 2)),
    (3, 2, Integer.parseInt("10", 2)),
    (4, 3, Integer.parseInt("011", 2)),
    (5, 4, Integer.parseInt("0011", 2)),
    (6, 4, Integer.parseInt("0010", 2)),
    (7, 5, Integer.parseInt("00011", 2)),
    (8, 6, Integer.parseInt("000101", 2)),
    (9, 6, Integer.parseInt("000100", 2)),
    (10, 7, Integer.parseInt("0000100", 2)),
    (11, 7, Integer.parseInt("0000101", 2)),
    (12, 7, Integer.parseInt("0000111", 2)),
    (13, 8, Integer.parseInt("00000100", 2)),
    (14, 8, Integer.parseInt("00000111", 2)),
    (15, 9, Integer.parseInt("000011000", 2)),
    (16, 10, Integer.parseInt("0000010111", 2)),
    (17, 10, Integer.parseInt("0000011000", 2)),
    (18, 10, Integer.parseInt("0000001000", 2)),
    (19, 11, Integer.parseInt("00001100111", 2)),
    (20, 11, Integer.parseInt("00001101000", 2)),
    (21, 11, Integer.parseInt("00001101100", 2)),
    (22, 11, Integer.parseInt("00000110111", 2)),
    (23, 11, Integer.parseInt("00000101000", 2)),
    (24, 11, Integer.parseInt("00000010111", 2)),
    (25, 11, Integer.parseInt("00000011000", 2)),
    (26, 12, Integer.parseInt("000011001010", 2)),
    (27, 12, Integer.parseInt("000011001011", 2)),
    (28, 12, Integer.parseInt("000011001100", 2)),
    (29, 12, Integer.parseInt("000011001101", 2)),
    (30, 12, Integer.parseInt("000001101000", 2)),
    (31, 12, Integer.parseInt("000001101001", 2)),
    (32, 12, Integer.parseInt("000001101010", 2)),
    (33, 12, Integer.parseInt("000001101011", 2)),
    (34, 12, Integer.parseInt("000011010010", 2)),
    (35, 12, Integer.parseInt("000011010011", 2)),
    (36, 12, Integer.parseInt("000011010100", 2)),
    (37, 12, Integer.parseInt("000011010101", 2)),
    (38, 12, Integer.parseInt("000011010110", 2)),
    (39, 12, Integer.parseInt("000011010111", 2)),
    (40, 12, Integer.parseInt("000001101100", 2)),
    (41, 12, Integer.parseInt("000001101101", 2)),
    (42, 12, Integer.parseInt("000011011010", 2)),
    (43, 12, Integer.parseInt("000011011011", 2)),
    (44, 12, Integer.parseInt("000001010100", 2)),
    (45, 12, Integer.parseInt("000001010101", 2)),
    (46, 12, Integer.parseInt("000001010110", 2)),
    (47, 12, Integer.parseInt("000001010111", 2)),
    (48, 12, Integer.parseInt("000001100100", 2)),
    (49, 12, Integer.parseInt("000001100101", 2)),
    (50, 12, Integer.parseInt("000001010010", 2)),
    (51, 12, Integer.parseInt("000001010011", 2)),
    (52, 12, Integer.parseInt("000000100100", 2)),
    (53, 12, Integer.parseInt("000000110111", 2)),
    (54, 12, Integer.parseInt("000000111000", 2)),
    (55, 12, Integer.parseInt("000000100111", 2)),
    (56, 12, Integer.parseInt("000000101000", 2)),
    (57, 12, Integer.parseInt("000001011000", 2)),
    (58, 12, Integer.parseInt("000001011001", 2)),
    (59, 12, Integer.parseInt("000000101011", 2)),
    (60, 12, Integer.parseInt("000000101100", 2)),
    (61, 12, Integer.parseInt("000001011010", 2)),
    (62, 12, Integer.parseInt("000001100110", 2)),
    (63, 12, Integer.parseInt("000001100111", 2)),
    // black makeups
    (64, 10, Integer.parseInt("0000001111", 2)),
    (128, 12, Integer.parseInt("000011001000", 2)),
    (192, 12, Integer.parseInt("000011001001", 2)),
    (256, 12, Integer.parseInt("000001011011", 2)),
    (320, 12, Integer.parseInt("000000110011", 2)),
    (384, 12, Integer.parseInt("000000110100", 2)),
    (448, 12, Integer.parseInt("000000110101", 2)),
    (512, 13, Integer.parseInt("0000001101100", 2)),
    (576, 13, Integer.parseInt("0000001101101", 2)),
    (640, 13, Integer.parseInt("0000001001010", 2)),
    (704, 13, Integer.parseInt("0000001001011", 2)),
    (768, 13, Integer.parseInt("0000001001100", 2)),
    (832, 13, Integer.parseInt("0000001001101", 2)),
    (896, 13, Integer.parseInt("0000001110010", 2)),
    (960, 13, Integer.parseInt("0000001110011", 2)),
    (1024, 13, Integer.parseInt("0000001110100", 2)),
    (1088, 13, Integer.parseInt("0000001110101", 2)),
    (1152, 13, Integer.parseInt("0000001110110", 2)),
    (1216, 13, Integer.parseInt("0000001110111", 2)),
    (1280, 13, Integer.parseInt("0000001010010", 2)),
    (1344, 13, Integer.parseInt("0000001010011", 2)),
    (1408, 13, Integer.parseInt("0000001010100", 2)),
    (1472, 13, Integer.parseInt("0000001010101", 2)),
    (1536, 13, Integer.parseInt("0000001011010", 2)),
    (1600, 13, Integer.parseInt("0000001011011", 2)),
    (1664, 13, Integer.parseInt("0000001100100", 2)),
    (1728, 13, Integer.parseInt("0000001100101", 2)))

  // extended makeups 1792..2560 (shared by both colors)
  private val ExtCodes: Array[(Int, Int, Int)] = Array(
    (1792, 11, Integer.parseInt("00000001000", 2)),
    (1856, 11, Integer.parseInt("00000001100", 2)),
    (1920, 11, Integer.parseInt("00000001101", 2)),
    (1984, 12, Integer.parseInt("000000010010", 2)),
    (2048, 12, Integer.parseInt("000000010011", 2)),
    (2112, 12, Integer.parseInt("000000010100", 2)),
    (2176, 12, Integer.parseInt("000000010101", 2)),
    (2240, 12, Integer.parseInt("000000010110", 2)),
    (2304, 12, Integer.parseInt("000000010111", 2)),
    (2368, 12, Integer.parseInt("000000011100", 2)),
    (2432, 12, Integer.parseInt("000000011101", 2)),
    (2496, 12, Integer.parseInt("000000011110", 2)),
    (2560, 12, Integer.parseInt("000000011111", 2)))

  // prefix maps: key = (bitLen << 16) | code
  private def mkMap(cs: Array[(Int, Int, Int)]*): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    cs.foreach(_.foreach { case (run, len, code) =>
      m.put((len << 16) | code, run)
    })
    m
  }
  private val WhiteMap = mkMap(WhiteCodes, ExtCodes)
  private val BlackMap = mkMap(BlackCodes, ExtCodes)

  private final class BitRd(b: Array[Byte], off: Int, len: Int) {
    private var pos = 0
    private val total = len * 8
    def bit(): Int = {
      if (pos >= total) { pos += 1; return -1 }
      val v = (b(off + (pos >> 3)) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  /** One T.4 run length (makeups accumulate until a terminating code);
    * -1 on malformed/truncated bits. */
  private def readRun(rd: BitRd, black: Boolean): Int = {
    val map = if (black) BlackMap else WhiteMap
    var run = 0
    var done = false
    while (!done) {
      var code = 0
      var len = 0
      var hit: Integer = null
      while (hit == null && len < 14) {
        val bt = rd.bit()
        if (bt < 0) return -1
        code = (code << 1) | bt
        len += 1
        hit = map.get((len << 16) | code)
      }
      if (hit == null) return -1
      run += hit
      if (hit < 64) done = true // terminating code ends the run
    }
    run
  }

  /** One 2D-coded row (shared by T.6 and T.4-2D): fills `cur` with
    * transition positions against the reference line; returns the
    * transition count, or -1 on refusal. */
  private def row2D(rd: BitRd, w: Int, ref: Array[Int], refLen: Int,
                    cur: Array[Int]): Int = {
    var curLen = 0
    var a0 = -1
    var color = 0 // 0 = white
    while (a0 < w) {
      // locate b1/b2 on the reference line
      var i = 0
      while (i < refLen && ref(i) <= (if (a0 < 0) -1 else a0)) i += 1
      // need a transition TO the opposite of `color`: white->black
      // transitions sit at even indices
      if ((i & 1) != color) i += 1
      val b1 = if (i < refLen) ref(i) else w
      val b2 = if (i + 1 < refLen) ref(i + 1) else w
      // mode code
      var mode = -99 // vertical offset, or HOR/PASS markers
      val bt0 = rd.bit()
      if (bt0 < 0) return -1
      if (bt0 == 1) mode = 0 // V0
      else {
        val bt1 = rd.bit(); val bt2 = rd.bit()
        if (bt1 < 0 || bt2 < 0) return -1
        if (bt1 == 1) mode = if (bt2 == 1) 1 else -1 // VR1 / VL1
        else if (bt2 == 1) mode = 100 // 001: horizontal
        else {
          val bt3 = rd.bit()
          if (bt3 < 0) return -1
          if (bt3 == 1) mode = 200 // 0001: pass
          else {
            val bt4 = rd.bit(); val bt5 = rd.bit()
            if (bt4 < 0 || bt5 < 0) return -1
            if (bt4 == 1) mode = if (bt5 == 1) 2 else -2 // VR2 / VL2
            else if (bt5 == 1) {
              val bt6 = rd.bit()
              if (bt6 < 0) return -1
              mode = if (bt6 == 1) 3 else -3 // VR3 / VL3
            } else return -1 // EOL/EOFB inside the image: refuse
          }
        }
      }
      if (mode == 200) { // pass: color runs through b2
        a0 = b2
      } else if (mode == 100) { // horizontal: two explicit runs
        val a0s = if (a0 < 0) 0 else a0
        val r1 = readRun(rd, color == 1)
        if (r1 < 0) return -1
        val r2 = readRun(rd, color == 0)
        if (r2 < 0) return -1
        val a1 = a0s + r1
        val a2 = a1 + r2
        if (a2 > w || curLen + 2 > cur.length) return -1
        cur(curLen) = a1; cur(curLen + 1) = a2
        curLen += 2
        a0 = a2
      } else { // vertical
        val a1 = b1 + mode
        if (a1 < 0 || a1 > w || curLen >= cur.length) return -1
        cur(curLen) = a1
        curLen += 1
        a0 = a1
        color ^= 1
      }
    }
    curLen
  }

  /** One 1D (Modified Huffman) row: alternating white-first runs that
    * must sum exactly to `w`; fills `cur`, returns the transition
    * count or -1. Zero-length runs are legal (a row starting black
    * opens with a white run of 0). */
  private def row1D(rd: BitRd, w: Int, cur: Array[Int]): Int = {
    var curLen = 0
    var x = 0
    var color = 0
    while (x < w) {
      val run = readRun(rd, color == 1)
      if (run < 0) return -1
      x += run
      if (x > w || curLen >= cur.length) return -1
      cur(curLen) = x
      curLen += 1
      color ^= 1
    }
    curLen
  }

  /** transitions -> packed row bits (1 = black: odd-index segments). */
  private def writeRow(out: Array[Byte], base: Int, cur: Array[Int],
                       curLen: Int, w: Int): Unit = {
    var seg = 0
    while (seg < curLen) {
      if ((seg & 1) == 0) { // black starts at even transition index
        val from = cur(seg)
        val until = if (seg + 1 < curLen) cur(seg + 1) else w
        var x = from
        while (x < until) {
          out(base + (x >> 3)) =
            (out(base + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
          x += 1
        }
      }
      seg += 1
    }
  }

  /** Decode a T.6 strip of `rows` rows of width `w` into MSB-first
    * packed rows (1 = black) of `rowBytes` each; null on refusal. */
  private[graft] def g4Decode(b: Array[Byte], off: Int, len: Int,
                              w: Int, rows: Int,
                              rowBytes: Int): Array[Byte] = {
    if (w <= 0 || rows <= 0 || off < 0 || len < 0 ||
      off.toLong + len > b.length) return null
    val out = new Array[Byte](rows * rowBytes)
    val rd = new BitRd(b, off, len)
    var ref = Array(w, w) // imaginary all-white reference line
    var refLen = 0
    val cur = new Array[Int](w + 2)
    var row = 0
    while (row < rows) {
      val curLen = row2D(rd, w, ref, refLen, cur)
      if (curLen < 0) return null
      writeRow(out, row * rowBytes, cur, curLen, w)
      ref = java.util.Arrays.copyOf(cur, curLen + 2)
      ref(curLen) = w; ref(curLen + 1) = w
      refLen = curLen
      row += 1
    }
    out
  }

  /** Decode a compression-2 ("CCITT RLE" / Modified Huffman) strip:
    * 1D rows, each starting on a BYTE boundary. */
  private[graft] def mhDecode(b: Array[Byte], off: Int, len: Int,
                              w: Int, rows: Int,
                              rowBytes: Int): Array[Byte] = {
    if (w <= 0 || rows <= 0 || off < 0 || len < 0 ||
      off.toLong + len > b.length) return null
    val out = new Array[Byte](rows * rowBytes)
    val rd = new BitRd(b, off, len)
    val cur = new Array[Int](w + 2)
    var row = 0
    while (row < rows) {
      val curLen = row1D(rd, w, cur)
      if (curLen < 0) return null
      writeRow(out, row * rowBytes, cur, curLen, w)
      rd.align()
      row += 1
    }
    out
  }

  /** Decode a compression-3 (Group 3 / T.4) strip: an EOL before each
    * row (fill zeros tolerated), and — when `twoD` (T4Options bit 0,
    * what imageio writes) — a tag bit after each EOL choosing 1D or
    * 2D coding for that row, 2D rows running the T.6 mode machinery
    * against the previous row. */
  private[graft] def t4Decode(b: Array[Byte], off: Int, len: Int,
                              w: Int, rows: Int, rowBytes: Int,
                              twoD: Boolean): Array[Byte] = {
    if (w <= 0 || rows <= 0 || off < 0 || len < 0 ||
      off.toLong + len > b.length) return null
    val out = new Array[Byte](rows * rowBytes)
    val rd = new BitRd(b, off, len)
    var ref = Array(w, w)
    var refLen = 0
    val cur = new Array[Int](w + 2)
    var row = 0
    while (row < rows) {
      // EOL: >= 11 zeros then a 1 (leading fill zeros fold in)
      var zeros = 0
      var bt = rd.bit()
      while (bt == 0) { zeros += 1; bt = rd.bit() }
      if (bt < 0 || zeros < 11) return null
      val use1D =
        if (!twoD) true
        else {
          val tag = rd.bit()
          if (tag < 0) return null
          tag == 1
        }
      val curLen =
        if (use1D) row1D(rd, w, cur)
        else row2D(rd, w, ref, refLen, cur)
      if (curLen < 0) return null
      writeRow(out, row * rowBytes, cur, curLen, w)
      ref = java.util.Arrays.copyOf(cur, curLen + 2)
      ref(curLen) = w; ref(curLen + 1) = w
      refLen = curLen
      row += 1
    }
    out
  }

  // -------------------------------------------------------- encoder

  private final class BitWr {
    private val o = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) { o.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def alignPad(): Unit =
      if (n > 0) { o.write(acc << (8 - n)); acc = 0; n = 0 }
    def finish(): Array[Byte] = {
      alignPad()
      o.toByteArray
    }
  }

  private def writeRun(wr: BitWr, black: Boolean, run0: Int): Unit = {
    val codes = if (black) BlackCodes else WhiteCodes
    var run = run0
    while (run > 2623) { // chains of max extended makeups
      val (r, l, c) = ExtCodes.last
      wr.put(c, l); run -= r
    }
    if (run >= 64) {
      val m = (run / 64) * 64
      val hit =
        if (m > 1728) ExtCodes.find(_._1 == m).get
        else codes.find(t => t._1 == m && t._1 >= 64).get
      wr.put(hit._3, hit._2)
      run -= m
    }
    val t = codes(run) // terminating codes are table-indexed by run
    wr.put(t._3, t._2)
  }

  /** Encode packed bilevel rows (MSB-first, 1 = black) as one T.6
    * strip with a trailing EOFB. */
  private[graft] def g4Encode(rowsData: Array[Byte], w: Int, rows: Int,
                              rowBytes: Int): Array[Byte] = {
    val wr = new BitWr
    def bitAt(row: Int, x: Int): Int =
      (rowsData(row * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
    def transitions(row: Int): Array[Int] = {
      val t = scala.collection.mutable.ArrayBuffer.empty[Int]
      var prev = 0
      var x = 0
      while (x < w) {
        val v = bitAt(row, x)
        if (v != prev) { t += x; prev = v }
        x += 1
      }
      t.toArray
    }
    var ref = new Array[Int](0)
    var row = 0
    while (row < rows) {
      val cur = transitions(row)
      var a0 = -1
      var color = 0
      while (a0 < w) {
        var ci = 0
        while (ci < cur.length && cur(ci) <= (if (a0 < 0) -1 else a0)) ci += 1
        if ((ci & 1) != color) ci += 1 // a1 flips `color`
        val a1 = if (ci < cur.length) cur(ci) else w
        val a2 = if (ci + 1 < cur.length) cur(ci + 1) else w
        var ri = 0
        while (ri < ref.length && ref(ri) <= (if (a0 < 0) -1 else a0)) ri += 1
        if ((ri & 1) != color) ri += 1
        val b1 = if (ri < ref.length) ref(ri) else w
        val b2 = if (ri + 1 < ref.length) ref(ri + 1) else w
        if (b2 < a1) { // pass
          wr.put(Integer.parseInt("0001", 2), 4)
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) { // vertical
          (a1 - b1) match {
            case 0 => wr.put(1, 1)
            case 1 => wr.put(Integer.parseInt("011", 2), 3)
            case -1 => wr.put(Integer.parseInt("010", 2), 3)
            case 2 => wr.put(Integer.parseInt("000011", 2), 6)
            case -2 => wr.put(Integer.parseInt("000010", 2), 6)
            case 3 => wr.put(Integer.parseInt("0000011", 2), 7)
            case _ => wr.put(Integer.parseInt("0000010", 2), 7)
          }
          a0 = a1
          color ^= 1
        } else { // horizontal
          wr.put(Integer.parseInt("001", 2), 3)
          val a0s = if (a0 < 0) 0 else a0
          writeRun(wr, color == 1, a1 - a0s)
          writeRun(wr, color == 0, a2 - a1)
          a0 = a2
        }
      }
      ref = cur
      row += 1
    }
    // EOFB: two EOLs
    wr.put(1, 12); wr.put(1, 12)
    wr.finish()
  }

  private def runsOfRow(rowsData: Array[Byte], w: Int, rowBytes: Int,
                        row: Int): Array[Int] = {
    // white-first run lengths summing to w (leading 0 when row starts
    // black)
    def bitAt(x: Int): Int =
      (rowsData(row * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
    val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var color = 0
    var x = 0
    while (x < w) {
      var n = 0
      while (x < w && bitAt(x) == color) { n += 1; x += 1 }
      runs += n
      color ^= 1
    }
    if (runs.isEmpty) runs += w // all-white degenerate
    runs.toArray
  }

  /** Encode compression-2 (Modified Huffman) rows: white-first runs,
    * each row padded to a BYTE boundary. */
  private[graft] def mhEncode(rowsData: Array[Byte], w: Int, rows: Int,
                              rowBytes: Int): Array[Byte] = {
    val wr = new BitWr
    var row = 0
    while (row < rows) {
      var color = 0
      runsOfRow(rowsData, w, rowBytes, row).foreach { run =>
        writeRun(wr, color == 1, run)
        color ^= 1
      }
      wr.alignPad()
      row += 1
    }
    wr.finish()
  }

  /** Encode compression-3 (Group 3) rows in the PURE-1D spelling
    * (T4Options = 0: an EOL before each row, no tag bits). */
  private[graft] def t4Encode(rowsData: Array[Byte], w: Int, rows: Int,
                              rowBytes: Int): Array[Byte] = {
    val wr = new BitWr
    var row = 0
    while (row < rows) {
      wr.put(1, 12) // EOL
      var color = 0
      runsOfRow(rowsData, w, rowBytes, row).foreach { run =>
        writeRun(wr, color == 1, run)
        color ^= 1
      }
      row += 1
    }
    wr.finish()
  }
}
