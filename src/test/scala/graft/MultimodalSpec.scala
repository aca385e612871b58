package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The multimodal plumbing contract: deterministic stub decode, bounded
  * dimensions, schema shape, and payload-column prunability.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decode stub is deterministic with bounded dims and closed format set") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val a = Multimodal.withDecodedMeta(docs, "payload", 4)
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.format")
    val rows = a.collect()
    assert(rows.length === 500)
    assert(rows.forall { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      w >= 1 && w <= 1920 && h >= 1 && h <= 1080 &&
        Set("png", "jpeg")(r.getString(3))
    })
    // deterministic across invocations
    val b = Multimodal.withDecodedMeta(docs, "payload", 4)
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.format")
    assert(a.collect().toSet === b.collect().toSet)
  }

  test("metadata survives payload pruning (heavy column dropped downstream)") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val pruned = Multimodal.withDecodedMeta(docs, "payload", 4)
      .drop("payload")
      .groupBy(col("media_meta.format").as("format"))
      .count()
    val byFormat = pruned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFormat.keySet.subsetOf(Set("png", "jpeg")))
    assert(byFormat.values.sum === 500L)
  }
}
