package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column primitives: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted by
  * column expressions — the shape a 100 TB training-data pipeline needs
  * (content-addressed dedup, size stats, container sniffing, batched
  * feature extraction) without ever shuffling the payload bytes more than
  * once.
  *
  * The corpus has no binary table, so the binary column is derived from
  * `documents.text` (utf-8 bytes) — the operators themselves are
  * payload-agnostic.
  */
object Multimodal {

  /** Q33: exact binary metadata — content fingerprint (the dedup key),
    * byte length, and leading-byte container sniff. All codegen'd
    * expressions over the binary column; at scale this is a pure map stage.
    */
  def q33BinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("fp"),
      octet_length(col("text")).as("n_bytes"),
      when(substring(col("text"), 1, 1) === "{", "json")
        .when(substring(col("text"), 1, 1) === "<", "markup")
        .otherwise("raw").as("container"))
  }

  /** STUB — deterministic fake decode. A real deployment replaces this
    * with an image/audio codec behind the same column contract
    * (`binary -> struct<width,height,format>`); the codec libraries are
    * not present in this environment, so dimensions are derived from a
    * crc32 of the payload to keep every downstream stage (schema,
    * partitioning, batching) real and testable.
    */
  def decodeImageMetaStub(bin: Column): Column = struct(
    (pmod(crc32(bin), lit(1920)) + 1).cast("int").as("width"),
    (pmod(crc32(reverse(bin)), lit(1080)) + 1).cast("int").as("height"),
    when(pmod(crc32(bin), lit(2)) === 0, "png").otherwise("jpeg").as("format"))

  /** Feature-extraction plumbing: repartition so each task sees a bounded
    * batch of payloads (decode memory is payload-count-bound, not
    * row-size-bound), decode, and keep payload + metadata columns
    * separate so later stages can prune the heavy bytes column away.
    */
  def withDecodedMeta(df: DataFrame, binCol: String, partitions: Int): DataFrame =
    df.repartition(partitions)
      .withColumn("media_meta", decodeImageMetaStub(col(binCol)))
}
