package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GzipEval, GzipOps}

/** RFC 1952 member codec (q95's kernels). The oracle already pins the
  * round-trip contract end-to-end; these tests pin what a round trip
  * through our own encoder/decoder pair CANNOT prove — that the decoder
  * opens members produced by an INDEPENDENT compressor (Python's gzip
  * module, fixture bytes hardcoded), walks every optional header field,
  * and refuses each corruption class individually.
  */
class GzipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** `gzip.compress(b'hello graft engine', mtime=0)` — CPython zlib. */
  private val PyFixture = unhex(
    "1f8b0800000000000203cb48cdc9c957482f4a4c2b5148cd4bcfcc4b0500fc3440b512000000")

  /** Hand-assembled member with FEXTRA + FNAME('x.bin') + FCOMMENT +
    * FHCRC around a CPython-deflated body of b'multi header fields'.
    */
  private val MultiField = unhex(
    "1f8b081e0000000000ff040041424344782e62696e006120636f6d6d656e7400c848cb2d" +
      "cd29c954c8484d4c492d5248cb4ccd492906003e0af3ea13000000")

  test("decodes an independent compressor's output (CPython fixture)") {
    assert(new String(GzipEval.gunzip(PyFixture), "UTF-8") ===
      "hello graft engine")
    // python set no FNAME
    assert(GzipEval.gzipName(PyFixture) === null)
  }

  test("walks FEXTRA/FNAME/FCOMMENT/FHCRC to the body and the name") {
    assert(new String(GzipEval.gunzip(MultiField), "UTF-8") ===
      "multi header fields")
    assert(new String(GzipEval.gzipName(MultiField), "UTF-8") === "x.bin")
  }

  test("refuses each corruption class with null, never a partial payload") {
    val good = GzipEval.gzip("the quick brown fox".getBytes("UTF-8"),
      "f.txt".getBytes("UTF-8"))
    assert(GzipEval.gunzip(good) != null)
    def flip(pos: Int): Array[Byte] = {
      val b = good.clone(); b(pos) = (b(pos) ^ 0x5a).toByte; b
    }
    // deflate-body corruption: CRC or stream failure either way -> null
    assert(GzipEval.gunzip(flip(good.length - 12)) === null)
    // trailer CRC32 byte
    assert(GzipEval.gunzip(flip(good.length - 8)) === null)
    // trailer ISIZE byte
    assert(GzipEval.gunzip(flip(good.length - 4)) === null)
    // truncated tail / truncated header
    assert(GzipEval.gunzip(good.dropRight(6)) === null)
    assert(GzipEval.gunzip(good.take(5)) === null)
    // trailing garbage spliced inside the member
    assert(GzipEval.gunzip(good ++ Array[Byte](1, 2, 3)) === null)
    // reserved FLG bits
    val rb = good.clone(); rb(3) = (rb(3) | 0x40).toByte
    assert(GzipEval.gunzip(rb) === null)
    // not gzip at all
    assert(GzipEval.gunzip("plain text".getBytes("UTF-8")) === null)
    // header fields survive body corruption (how tooling lists a damaged
    // archive) — the name still reads off the CRC-flipped member
    assert(new String(GzipEval.gzipName(flip(good.length - 8)), "UTF-8") === "f.txt")
  }

  /** Two back-to-back CPython members — the actual `.warc.gz` layout. */
  private val TwoMembers = unhex(
    "1f8b08000000000002030b770c7256284a4dce2f4a51c8cf4b55000013c416a210000000" +
      "1f8b08000000000002034bcc4b51284a4dce2f4a512829cf0700c192873a0e000000")

  test("multi-member decode concatenates payloads; any bad member refuses all") {
    assert(new String(GzipEval.gunzipConcat(TwoMembers), "UTF-8") ===
      "WARC record one and record two")
    // single members decode through the same path
    assert(new String(GzipEval.gunzipConcat(PyFixture), "UTF-8") ===
      "hello graft engine")
    // the strict single-member decoder refuses the concatenation (its
    // contract is ONE member, trailing bytes are garbage)
    assert(GzipEval.gunzip(TwoMembers) === null)
    // a damaged SECOND member kills the whole stream — silent tail drop
    // would hide data loss
    val broken = TwoMembers.clone()
    broken(broken.length - 12) = (broken(broken.length - 12) ^ 0x5a).toByte
    assert(GzipEval.gunzipConcat(broken) === null)
    assert(GzipEval.gunzipConcat(TwoMembers.dropRight(5)) === null)
    // column path parity
    val viaCol = spark.range(1)
      .select(GzipOps.gunzipConcat(lit(TwoMembers)).as("d"))
      .head().getAs[Array[Byte]](0)
    assert(new String(viaCol, "UTF-8") === "WARC record one and record two")
  }

  test("interpreted eval agrees with the codegen'd column path") {
    val good = GzipEval.gzip("parity check payload".getBytes("UTF-8"),
      "p.bin".getBytes("UTF-8"))
    val vectors = Seq(good, good.dropRight(3), PyFixture, MultiField,
      "junk".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val di = Option(GzipEval.gunzip(bytes)).map(_.toSeq)
      val dc = Option(spark.range(1)
        .select(GzipOps.gunzip(lit(bytes)).as("d")).head().get(0))
        .map(_.asInstanceOf[Array[Byte]].toSeq)
      assert(di === dc, "gunzip parity")
      val ni = Option(GzipEval.gzipName(bytes)).map(new String(_, "UTF-8"))
      val nc = Option(spark.range(1)
        .select(GzipOps.gzipName(lit(bytes)).as("n")).head().getString(0))
      assert(ni === nc, "name parity")
    }
    // encode parity: column-path bytes == direct-eval bytes
    val enc = spark.range(1)
      .select(GzipOps.gzip(lit("abc".getBytes("UTF-8")), lit("n")).as("g"))
      .head().getAs[Array[Byte]](0)
    assert(enc.toSeq === GzipEval.gzip("abc".getBytes("UTF-8"),
      "n".getBytes("UTF-8")).toSeq)
  }

  test("round-trip property: arbitrary binary payloads survive encode/decode") {
    // seeded pseudo-random payloads incl. empty, tiny, all-zero (highly
    // compressible), and incompressible byte noise
    val rnd = new scala.util.Random(42)
    val payloads = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      new Array[Byte](4096), // zeros: deflate far below input size
      Array.fill(1)(rnd.nextInt().toByte),
      Array.fill(257)(rnd.nextInt().toByte),
      Array.fill(70000)(rnd.nextInt().toByte)) // spans >1 drain buffer
    payloads.foreach { p =>
      val gz = GzipEval.gzip(p, "r.bin".getBytes("UTF-8"))
      assert(GzipEval.gunzip(gz).toSeq === p.toSeq, s"len ${p.length}")
      assert(GzipEval.gunzipConcat(gz).toSeq === p.toSeq, s"concat len ${p.length}")
    }
    // two members concatenated round-trip through the multi-member path
    val two = GzipEval.gzip(payloads(4), null) ++ GzipEval.gzip(payloads(3), null)
    assert(GzipEval.gunzipConcat(two).toSeq ===
      (payloads(4) ++ payloads(3)).toSeq)
  }

  test("q95: corruption classes decode NULL; names read on every class") {
    val df = graft.operators.Crawl.q95GzipMembers(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bad = id % 10 == 6 || id % 10 == 8
      assert(r.getAs[Int]("valid") === (if (bad) 0 else 1), s"doc $id")
      val fname = Option(r.getAs[String]("fname"))
      assert(fname === (if (id % 2 == 1) Some(s"doc$id.txt") else None), s"doc $id")
    }
  }
}
