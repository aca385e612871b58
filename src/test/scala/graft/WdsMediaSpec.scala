package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q174's shard intake: per-sample pixel stats must equal decoding
  * the SAME synthesized image directly (the tar+assembly layers add
  * nothing and lose nothing), and the caption-only sample assembles
  * separately with no decode columns.
  */
class WdsMediaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("shard-decoded stats equal direct decode of the same image") {
    import graft.functions.{GifPixelOps, JpegPixelOps, PngPixelOps}
    val df = graft.operators.Wds.q174MediaShards(spark, TestSpark.Sf0001)
      .filter(col("sample_key").startsWith("m") && col("has_image") === 1)
      .select(col("doc_id"), col("format"), col("sum_luma"))
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val id = col("doc_id")
    val direct = docs
      .filter(id % 4 < 3)
      .select(id,
        when(id % 4 === 0, shiftrightunsigned(JpegPixelOps.jpegLuma(
          JpegPixelOps.jpegSynth(id, (id % 3 + 1) + (id % 2 + 1) * 256)), 16))
          .when(id % 4 === 1, shiftrightunsigned(PngPixelOps.pngLuma(
            PngPixelOps.pngSynth(id,
              (id % 6 + 1) + (id % 4 + 1) * 256 + lit(1L << 16))), 16))
          .otherwise(shiftrightunsigned(GifPixelOps.gifLuma(
            GifPixelOps.gifSynth(id, (id % 6 + 1) + (id % 4 + 1) * 256)), 16))
          .as("direct_sum"))
    val joined = df.join(direct, "doc_id")
      .filter(col("sum_luma") =!= col("direct_sum"))
    assert(joined.count() === 0L)
  }

  test("the caption-only sample has no decode columns") {
    val n = graft.operators.Wds.q174MediaShards(spark, TestSpark.Sf0001)
      .filter(col("sample_key").startsWith("n"))
      .filter(col("has_image") =!= 0 || col("format").isNotNull ||
        col("sum_luma").isNotNull)
      .count()
    assert(n === 0L)
  }
}
