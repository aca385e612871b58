package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ParquetFooterEval

/** The Parquet footer walk, pinned two independent ways: (1) against
  * the REAL driver-written corpus files, where the kernel's
  * footer-declared row count must equal Spark's own parquet reader
  * counting the rows (two independent implementations of the format
  * agreeing); (2) against HAND-SPELLED Thrift compact-protocol
  * vectors the real writer never produces — field-id delta escapes,
  * the long-form list header, boolean-in-type values, and
  * unknown-field skipping at every nesting level.
  */
class ParquetFooterSpec extends AnyFunSuite {

  // ------------------------------------------- real corpus round-trip

  test("footer num_rows equals Spark's own count on the real corpus") {
    val spark = TestSpark.spark
    Seq("documents", "embeddings", "events").foreach { t =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${TestSpark.Sf0001}/$t.parquet"))
      val m = ParquetFooterEval.parse(bytes)
      assert(m != null, s"$t footer refused")
      val counted = Tables.load(spark, TestSpark.Sf0001, t).count()
      assert(m.numRows === counted, s"$t footer vs scan")
      assert(m.numRows === m.sumGroupRows, s"$t group-sum cross-check")
      assert(m.nGroups >= 1)
    }
  }

  test("root num_children is the column count on the real corpus") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/documents.parquet"))
    assert(ParquetFooterEval.parse(bytes).nColumns === 5) // FIXTURES.md §B
    val eb = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/embeddings.parquet"))
    // vec_id, embedding (one TOP-LEVEL column though its schema
    // subtree nests list/element groups), label
    assert(ParquetFooterEval.parse(eb).nColumns === 3)
  }

  // ------------------------------------------------ hand-spelled wire

  private def varint(v: Long): Array[Byte] = {
    var u = v
    val o = new java.io.ByteArrayOutputStream()
    while ((u & ~0x7FL) != 0L) { o.write(((u & 0x7F) | 0x80).toInt); u >>>= 7 }
    o.write(u.toInt)
    o.toByteArray
  }

  private def zig(v: Long): Array[Byte] = varint((v << 1) ^ (v >> 63))

  private def str(s: String): Array[Byte] =
    varint(s.length.toLong) ++ s.getBytes("UTF-8")

  private def u32le(v: Int): Array[Byte] =
    (0 until 4).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  private def file(footer: Array[Byte]): Array[Byte] =
    "PAR1".getBytes("US-ASCII") ++ footer ++
      u32le(footer.length) ++ "PAR1".getBytes("US-ASCII")

  /** A minimal FileMetaData: version 1, schema [root(2 children),
    * a, b], num_rows, one row group carrying the same count. */
  private def handFooter(numRows: Long, groupRows: Long): Array[Byte] = {
    val root = Array[Byte](0x48) ++ str("root") ++
      Array[Byte](0x15) ++ zig(2L) ++ Array[Byte](0x00)
    val colA = Array[Byte](0x48) ++ str("a") ++ Array[Byte](0x00)
    val colB = Array[Byte](0x48) ++ str("b") ++ Array[Byte](0x00)
    val group = Array[Byte](0x36) ++ zig(groupRows) ++ Array[Byte](0x00)
    Array[Byte](0x15) ++ zig(1L) ++ // 1: version i32
      Array[Byte](0x19, 0x3C) ++ root ++ colA ++ colB ++ // 2: schema list
      Array[Byte](0x16) ++ zig(numRows) ++ // 3: num_rows i64
      Array[Byte](0x19, 0x1C) ++ group ++ // 4: row_groups list
      Array[Byte](0x28) ++ str("graft-test") ++ // 6: created_by
      Array[Byte](0x00)
  }

  test("hand footer: counts, columns, and the group cross-check") {
    val m = ParquetFooterEval.parse(file(handFooter(7L, 7L)))
    assert(m != null)
    assert(m.numRows === 7L && m.nColumns === 2 && m.nGroups === 1)
    assert(m.sumGroupRows === 7L)
    assert((ParquetFooterEval.meta(file(handFooter(7L, 7L))) & 2L) === 2L)
  }

  test("a footer whose group sum disagrees is flagged, not trusted") {
    val packed = ParquetFooterEval.meta(file(handFooter(7L, 6L)))
    assert(packed !== -1L)
    assert((packed & 2L) === 0L) // verified = 0
  }

  test("field-id DELTA escape: id delivered as zigzag when delta is 0") {
    // spell num_rows (field 3, i64) with header 0x06 (delta 0) + id
    val root = Array[Byte](0x48) ++ str("r") ++
      Array[Byte](0x15) ++ zig(0L) ++ Array[Byte](0x00)
    // header 0x29 would be delta 2; instead open with the escape form:
    val f2 = Array[Byte](0x09) ++ zig(2L) ++ Array[Byte](0x1C) ++ root ++
      Array[Byte](0x06) ++ zig(3L) ++ zig(9L) ++
      Array[Byte](0x00)
    val m = ParquetFooterEval.parse(file(f2))
    assert(m != null && m.numRows === 9L && m.nColumns === 0)
  }

  test("unknown fields skip by type at every level") {
    // splice unknown fields into FileMetaData: a bool-true (field 7),
    // a double (8), a map (9), a nested struct (10), and a LONG list
    // (11) whose size needs the varint escape
    val root = Array[Byte](0x48) ++ str("r") ++
      Array[Byte](0x15) ++ zig(1L) ++ Array[Byte](0x00)
    val col = Array[Byte](0x48) ++ str("c") ++ Array[Byte](0x00)
    val longList = Array[Byte](0xF6.toByte) ++ varint(16L) ++
      (0 until 16).flatMap(k => zig(k.toLong)).toArray
    val mapField = varint(2L) ++ Array[Byte](0x58) ++ // 2 entries, k:i32 v:str
      zig(1L) ++ str("x") ++ zig(2L) ++ str("y")
    val nested = Array[Byte](0x15) ++ zig(5L) ++ Array[Byte](0x00)
    val footer =
      Array[Byte](0x15) ++ zig(1L) ++
        Array[Byte](0x19, 0x2C) ++ root ++ col ++
        Array[Byte](0x16) ++ zig(3L) ++
        Array[Byte](0x19, 0x0C) ++ // empty row_groups list
        Array[Byte](0x31) ++ // field 7: bool TRUE in the type nibble
        Array[Byte](0x17) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++ // f8 dbl
        Array[Byte](0x1B) ++ mapField ++ // field 9: map
        Array[Byte](0x1C) ++ nested ++ // field 10: struct
        Array[Byte](0x19) ++ longList ++ // field 11: long list of i64
        Array[Byte](0x00)
    val m = ParquetFooterEval.parse(file(footer))
    assert(m != null && m.numRows === 3L && m.nColumns === 1 &&
      m.nGroups === 0)
  }

  test("synthFile round-trips: rows split over two verified groups") {
    val m = ParquetFooterEval.parse(ParquetFooterEval.synthFile(777L, 5))
    assert(m != null && m.numRows === 777L && m.nColumns === 5)
    assert(m.nGroups === 2 && m.sumGroupRows === 777L)
  }

  test("refusals: wrong magic, lying footer length, not parquet") {
    assert(ParquetFooterEval.parse("not parquet".getBytes) === null)
    val good = file(handFooter(1L, 1L))
    val lying = good.clone()
    // footer length field claims more than the file holds
    lying(lying.length - 8) = 0x7F.toByte
    lying(lying.length - 7) = 0x7F.toByte
    assert(ParquetFooterEval.parse(lying) === null)
    val noTail = good.dropRight(1)
    assert(ParquetFooterEval.parse(noTail) === null)
  }
}
