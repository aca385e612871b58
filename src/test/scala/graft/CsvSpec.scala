package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CSV ingest contract (q134): the reader is pinned against a
  * HAND-SPELLED RFC 4180 file — doubled quotes, embedded separators and
  * newlines, a quoted field spanning physical lines — so the pinned
  * `escape = "` configuration is held to the standard, not to whatever
  * the engine's serializer happens to emit. The manifest path is
  * covered end-to-end by the q134 oracle.
  */
class CsvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("body", StringType),
    StructField("tag", StringType),
    StructField("_corrupt_record", StringType)))

  private def readCsv(content: String) = {
    val f = java.nio.file.Files.createTempDirectory("graft_csv")
    java.nio.file.Files.write(f.resolve("part-0.csv"),
      content.getBytes("UTF-8"))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("quote", "\"")
      .csv(f.toString)
  }

  test("RFC 4180 hand fixture: doubled quotes, embedded commas, newlines") {
    val csv =
      "1,\"she said \"\"hi\"\" twice\",plain\n" +
        "2,\"a, b, and c\",commas\n" +
        "3,\"line one\nline two\",multiline\n" +
        "4,unquoted,bare\n"
    val rows = readCsv(csv).orderBy("id").collect()
    assert(rows.length === 4)
    assert(rows(0).getString(1) === "she said \"hi\" twice")
    assert(rows(1).getString(1) === "a, b, and c")
    assert(rows(2).getString(1) === "line one\nline two")
    assert(rows(3).getString(1) === "unquoted")
    assert(rows.forall(_.isNullAt(3)), "no corrupt records expected")
  }

  test("corrupt lines quarantine with every schema field NULL") {
    val csv = "1,\"ok body\",fine\nthis line was never csv\n"
    val df = readCsv(csv)
    val bad = df.where(col("id").isNull).collect()
    assert(bad.length === 1)
    assert(bad(0).isNullAt(1) && bad(0).isNullAt(2),
      "quarantined row must not leak partial fields into the manifest keys")
    assert(df.where(col("id").isNotNull).count() === 1)
  }

  test("q134 manifest carries the NULL-source quarantine row") {
    val df = graft.sources.Csv.q134CsvIngest(spark, TestSpark.Sf0001)
    val nullRow = df.where(col("source").isNull).collect()
    assert(nullRow.length === 1)
    assert(nullRow(0).getAs[Long]("n_lines") === 2L)
    assert(nullRow(0).getAs[Long]("n_docs") === 0L)
    // every real source group parsed its decorated text back exactly
    val real = df.where(col("source").isNotNull)
    assert(real.where(col("chars").isNull).count() === 0)
  }
}
