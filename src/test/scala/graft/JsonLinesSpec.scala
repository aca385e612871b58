package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonLines

/** The JSONL ingest contract beyond q76's count/sum oracle: the corrupt
  * quarantine carries the RAW line (the DLQ replay requirement — a
  * quarantined record must be re-processable after a parser fix), and
  * parsed rows round-trip values exactly.
  */
class JsonLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corrupt lines quarantine with their raw bytes; parsed rows round-trip") {
    val path = JsonLines.ensureJsonl(spark, TestSpark.Sf0001)
    val parsed = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
          "n_chars BIGINT, _corrupt_record STRING"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    val quarantined = parsed.filter(col("doc_id").isNull)
      .select("_corrupt_record").collect().map(_.getString(0)).sorted
    assert(quarantined.toSeq === Seq(
      "this line was never JSON",
      """{"doc_id": broken""").sorted)
    // a parsed row carries exactly the parquet values (serializer and
    // parser agree on escaping/unicode for the corpus's own text)
    val viaJson = parsed.filter(col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val viaParquet = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(viaJson.exceptAll(viaParquet).isEmpty &&
      viaParquet.exceptAll(viaJson).isEmpty, "JSONL round-trip drifted")
  }

  test("a half-written twin (no _SUCCESS) is rebuilt, a finished one is reused") {
    val path = JsonLines.ensureJsonl(spark, TestSpark.Sf0001)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stampBefore = success.lastModified()
    // finished twin: reused, not rewritten
    JsonLines.ensureJsonl(spark, TestSpark.Sf0001)
    assert(success.lastModified() === stampBefore)
    // sabotage the completion marker: the next ensure must rebuild
    assert(success.delete())
    JsonLines.ensureJsonl(spark, TestSpark.Sf0001)
    assert(success.exists(), "twin not rebuilt after losing _SUCCESS")
  }
}
