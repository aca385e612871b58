package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{WarcEval, WarcHeader, WarcMeta, WarcOffsets, WarcOps, WarcPayload}

/** The WARC walk's contract against HAND-BUILT byte streams (never its own
  * synthesis): Content-Length-driven record advance, case-insensitive
  * header names, strict CRLF, the 4-byte separator belonging to the
  * record, the one-walk offsets table, and honest NULL/truncated verdicts
  * on every malformed shape.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rec(headers: Seq[String], payload: String): String =
    "WARC/1.0\r\n" + headers.map(_ + "\r\n").mkString + "\r\n" +
      payload + "\r\n\r\n"

  private def offs(bb: Array[Byte]): Array[Long] =
    Option(WarcEval.offsets(bb)).map(_.toLongArray()).orNull

  // payload EMBEDS the record separator — the case split-based parsing
  // cannot survive
  private val p0 = "first\r\n\r\nbody"
  private val p1 = "x" * 7
  private val rec0 =
    rec(Seq("WARC-Type: response", "WARC-Target-URI: http://a/1",
      "WARC-Record-ID: <urn:uuid:1>", s"Content-Length: ${p0.length}"), p0)
  private val twoRec = rec0 +
    rec(Seq("content-length: 7", "warc-type: request", "X-Extra: v",
      "warc-target-uri: http://a/2"), p1)

  test("Content-Length walk crosses embedded separators; names case-fold") {
    val bb = twoRec.getBytes("US-ASCII")
    assert(WarcEval.meta(bb) === ((2L << 1) | 0L))
    // the offsets table is the one-walk iteration surface: record starts
    // at exactly the serialized boundaries, with the packed verdict as
    // the trailer element (so verdict + iteration cost ONE walk)
    assert(offs(bb).toSeq === Seq(0L, rec0.length.toLong, (2L << 1) | 0L))
    val o1 = rec0.length
    assert(WarcEval.header(bb, 0, 0).toString === "response")
    assert(WarcEval.header(bb, 0, 1).toString === "http://a/1")
    assert(WarcEval.header(bb, 0, 2).toString === "<urn:uuid:1>")
    assert(new String(WarcEval.payload(bb, 0), "US-ASCII") === p0)
    assert(WarcEval.header(bb, o1, 0).toString === "request")
    assert(WarcEval.header(bb, o1, 2) === null) // absent optional header
    assert(new String(WarcEval.payload(bb, o1), "US-ASCII") === p1)
    // an offset pointing anywhere but a record start parses nothing
    assert(WarcEval.header(bb, 3, 0) === null)
    assert(WarcEval.payload(bb, bb.length - 1) === null)
  }

  test("malformed shapes: honest truncated verdicts, never short records") {
    // no Content-Length on record 0: the walk cannot cross it — 0 records
    val noLen = rec(Seq("WARC-Type: response"), p0).getBytes("US-ASCII")
    assert(WarcEval.meta(noLen) === 1L)
    assert(offs(noLen).toSeq === Seq(1L)) // trailer only: 0 records, truncated
    // final separator cut: the tail record drops, the first still serves
    val cut = twoRec.substring(0, twoRec.length - 3).getBytes("US-ASCII")
    assert(WarcEval.meta(cut) === ((1L << 1) | 1L))
    assert(offs(cut).toSeq === Seq(0L, (1L << 1) | 1L))
    assert(new String(WarcEval.payload(cut, 0), "US-ASCII") === p0)
    // a Content-Length pointing past the buffer must not slice garbage
    val lie = rec(Seq("Content-Length: 99999"), p0).getBytes("US-ASCII")
    assert(WarcEval.meta(lie) === 1L)
    // bare-LF line endings violate the spec's CRLF mandate
    val lf = ("WARC/1.0\nContent-Length: 3\n\nabc\n\n").getBytes("US-ASCII")
    assert(WarcEval.meta(lf) === 1L)
    // trailing LWS after the length value is real-crawl padding, not a
    // malformed record — 'Content-Length: 13 \t' must still walk (and a
    // later record after the padded one must still serve)
    val padded = (rec(Seq(s"Content-Length: ${p0.length} \t",
      "WARC-Type: response"), p0) +
      rec(Seq("Content-Length: 7"), p1)).getBytes("US-ASCII")
    assert(WarcEval.meta(padded) === ((2L << 1) | 0L))
    assert(new String(WarcEval.payload(padded, 0), "US-ASCII") === p0)
    // interior whitespace is still a genuinely bad value
    val interior = rec(Seq("Content-Length: 1 3"), p0).getBytes("US-ASCII")
    assert(WarcEval.meta(interior) === 1L)
    // not WARC at all: NULL, distinguishable from zero-valid-records
    assert(WarcEval.meta("hello world".getBytes("US-ASCII")) === null)
    assert(offs("hello world".getBytes("US-ASCII")) === null)
    assert(WarcEval.meta(Array.emptyByteArray) === null)
  }

  test("interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.{Literal => L}
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    val vectors = Seq(twoRec.getBytes("US-ASCII"),
      twoRec.substring(0, twoRec.length - 3).getBytes("US-ASCII"),
      rec(Seq("WARC-Type: x"), p0).getBytes("US-ASCII"),
      "junk".getBytes("US-ASCII"))
    vectors.foreach { bytes =>
      val mi = WarcMeta(L(bytes, BinaryType)).eval(null)
      val mc = spark.range(1)
        .select(WarcOps.warcMeta(lit(bytes)).as("m")).head().get(0)
      assert(mi === mc, "meta parity")
      val oi = Option(WarcOffsets(L(bytes, BinaryType)).eval(null))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq)
      val oc = Option(spark.range(1)
        .select(WarcOps.warcOffsets(lit(bytes)).as("o")).head().get(0))
        .map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq)
      assert(oi === oc, "offsets parity")
      // probe record offsets only (drop the verdict trailer), plus a
      // mid-record bogus offset
      val probes = oi.map(_.dropRight(1)).getOrElse(Seq.empty) ++ Seq(3L)
      probes.foreach { off =>
        Seq(0, 1, 2).foreach { code =>
          val hi = WarcHeader(L(bytes, BinaryType), L(off.toInt, IntegerType),
            code).eval(null)
          val hc = spark.range(1)
            .select(WarcOps.warcHeader(lit(bytes), lit(off), code).as("h"))
            .head().get(0)
          assert(Option(hi).map(_.toString) === Option(hc), s"header $off/$code")
        }
        val pi = WarcPayload(L(bytes, BinaryType), L(off.toInt, IntegerType))
          .eval(null)
        val pc = spark.range(1)
          .select(WarcOps.warcPayload(lit(bytes), lit(off)).as("p"))
          .head().get(0)
        assert(Option(pi).map(_.asInstanceOf[Array[Byte]].toSeq) ===
          Option(pc).map(_.asInstanceOf[Array[Byte]].toSeq),
          s"payload $off")
      }
    }
  }

  test("q82 explodes only bounded record fan-out with zero exchanges") {
    val df = graft.sources.Warc.q82WarcIngest(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("- Exchange "), s"q82 shuffles a narrow ingest:\n$p")
    // every stream contributes at least one row (report-WHY: malformed
    // and non-WARC streams stay visible), and fan-out is bounded by the
    // synthesis's 3-record cap
    val n = Tables.load(spark, TestSpark.Sf0001, "documents").count()
    assert(df.count() >= n)
    assert(df.count() <= n * 3)
  }

  test("warc.gz writer round-trips byte-exactly through the reader walk") {
    // the write side's oracle IS the read side: segments assembled by
    // warcGzSegments must come back record-by-record through
    // gunzipConcat + the q82 offsets walk — uri, type, payload bytes,
    // and the revisit profile's zero-body contract all byte-exact.
    // One payload embeds the record separator (the q82 trap: a
    // split-based reader, or a writer whose Content-Length counted
    // characters, dies here); one record is a q105-style revisit.
    import graft.functions.GzipOps
    import spark.implicits._
    val recs = Seq(
      (0L, 0, "http://a.example/0", "response", "hello\r\n\r\nbody"),
      (0L, 1, "http://a.example/1", "revisit", "prior content"),
      (0L, 2, "http://a.example/2", "response", "plain text"),
      (1L, 0, "http://b.example/0", "response", "solo record"))
      .toDF("seg_id", "pos", "uri", "rtype", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("digest", md5(col("text").cast("binary")))
    val segs = graft.sources.Warc.warcGzSegments(recs)
    assert(segs.count() === 2)
    // the first member's FNAME reads off the segment head without any
    // decompression — the archive-listing property q95 pins
    assert(segs.filter(col("seg_id") === 0)
      .select(GzipOps.gzipName(col("segment"))).head().getString(0) === "r0.warc")
    val back = segs
      .withColumn("_bytes", GzipOps.gunzipConcat(col("segment")))
      .withColumn("_offs", WarcOps.warcOffsets(col("_bytes")))
      .withColumn("_v", element_at(col("_offs"), -1))
      .select(col("seg_id"), col("n_records"),
        shiftrightunsigned(col("_v"), 1).cast("int").as("n_walked"),
        col("_v").bitwiseAND(lit(1)).cast("int").as("truncated"),
        posexplode(expr("slice(_offs, 1, size(_offs) - 1)"))
          .as(Seq("rec_idx", "_off")), col("_bytes"))
      .select(col("seg_id"), col("n_records"), col("n_walked"),
        col("truncated"), col("rec_idx"),
        WarcOps.warcHeader(col("_bytes"), col("_off"), 0).as("rec_type"),
        WarcOps.warcHeader(col("_bytes"), col("_off"), 1).as("uri"),
        WarcOps.warcPayload(col("_bytes"), col("_off")).as("pay"))
    val rows = back.collect()
    assert(rows.length === 4, "every written record must walk back out")
    assert(rows.forall(r => r.getAs[Int]("truncated") === 0))
    assert(rows.forall(r =>
      r.getAs[Int]("n_walked") === r.getAs[Int]("n_records")))
    val byUri = rows.map(r => r.getAs[String]("uri") -> r).toMap
    val orig = recs.select("uri", "rtype", "text").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byUri.keySet === orig.keySet)
    for ((uri, (rtype, text)) <- orig) {
      val r = byUri(uri)
      assert(r.getAs[String]("rec_type") === rtype, uri)
      val pay = r.getAs[Array[Byte]]("pay")
      if (rtype === "revisit")
        assert(pay.length === 0, s"revisit carried a body: $uri")
      else
        assert(new String(pay, "UTF-8") === text, s"payload drifted: $uri")
    }
  }

  test("warc.gz writer surfaces bad records instead of nulling the segment") {
    // a NULL uri/payload reaching the serializer must not silently NULL
    // the whole segment's fold (the segment would vanish from read-back
    // with no error): the bad row counts in n_bad and the good rows
    // still write and walk back
    import graft.functions.GzipOps
    import spark.implicits._
    val recs = Seq(
      (0L, 0, Option("http://a.example/ok"), "response", Option("good")),
      (0L, 1, Option.empty[String], "response", Option("orphan")),
      (0L, 2, Option("http://a.example/ok2"), "response", Option("fine")))
      .toDF("seg_id", "pos", "uri", "rtype", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("digest", md5(col("text").cast("binary")))
    val seg = graft.sources.Warc.warcGzSegments(recs).head()
    assert(seg.getAs[Int]("n_records") === 2)
    assert(seg.getAs[Int]("n_bad") === 1)
    val bytes = recs.sparkSession.range(1).select(
      GzipOps.gunzipConcat(lit(seg.getAs[Array[Byte]]("segment")))).head()
      .getAs[Array[Byte]](0)
    assert(bytes != null, "good records must still decode")
    val offs = graft.functions.WarcEval.offsets(bytes).toLongArray()
    assert(offs.last === 4L, "2 records, untruncated") // (2 << 1) | 0
  }
}
