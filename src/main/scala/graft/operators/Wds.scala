package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TarOps, WdsOps}

/** Q163: WebDataset sample assembly — the multimodal training-shard
  * read (tar members named `<key>.<ext>`; all members sharing a key
  * form ONE training sample). The shard walk is q136's verified
  * [[graft.functions.TarEval]]; this operator is the DISTRIBUTED
  * step a loader audit needs: explode members, split key/extension
  * at the FIRST dot of the basename (`d7_0.seg.png` is sample
  * `d7_0`, ext `seg.png`), and assemble per-sample manifests with
  * ONE keyed aggregate — interleaved member order (mode 2) lands in
  * the same group by construction, which is exactly why assembly is
  * a group-by and not a streaming window.
  *
  * Completeness is CONTENT-based: a checksum-corrupt `.cls` (mode 3)
  * keeps its name — the part counts — but its refused content marks
  * the sample incomplete, same as a part that was never written
  * (mode 1). At 100 TB the aggregate shuffles only (shard, key)
  * manifest rows — member payloads reduce map-side to md5/length.
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — shard assembly is a north-star
  * extension of the layout family (q80/q89/q136/q160).
  */
object Wds {

  def q163WdsSamples(spark: SparkSession, dir: String): DataFrame =
    wdsSamplesOn(Tables.load(spark, dir, "documents"))

  /** The q163 computation over any (doc_id, text) frame (ScaleSpec
    * runs the decade over synthetic corpora). */
  def wdsSamplesOn(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val mode = when(id % 4 === 1, 1L).when(id % 4 === 2, 2L)
      .when(id % 4 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val shard = docs.select(id, WdsOps.wdsSynth(col("text"), params).as("_t"))
    val members = shard
      .select(id, col("_t"), TarOps.tarCount(col("_t")).as("_n"))
      .select(id, col("_t"),
        explode(sequence(lit(0), col("_n") - 1)).as("_i"))
      .select(id,
        TarOps.tarMemberName(col("_t"), col("_i")).as("name"),
        TarOps.tarMember(col("_t"), col("_i")).as("content"))
      .select(id,
        substring_index(col("name"), ".", 1).as("sample_key"),
        expr("substring(name, length(substring_index(name, '.', 1)) + 2)")
          .as("ext"),
        col("content"))
    members.groupBy(id, col("sample_key"))
      .agg(
        count(lit(1)).cast("int").as("n_parts"),
        array_join(sort_array(collect_list(col("ext"))), ",").as("exts"),
        (max(when(col("ext") === "txt" && col("content").isNotNull, 1)
          .otherwise(0)) *
          max(when(col("ext") === "cls" && col("content").isNotNull, 1)
            .otherwise(0))).cast("int").as("complete"),
        max(when(col("ext") === "txt", md5(col("content")))).as("txt_md5"),
        max(when(col("ext") === "txt", length(col("content"))))
          .cast("bigint").as("txt_bytes"))
  }

  /** Q174: multimodal shard intake — the CAPSTONE of the training-data
    * read path (q163 assembles samples by NAME; a loader audit also
    * has to trust what is INSIDE them): a WebDataset shard whose image
    * members are REAL encoded images (the q118/q121/q124 synthesizers
    * with q127's residue parameters) beside their captions, walked by
    * q136's verified tar, assembled by q163's keyed aggregate
    * (interleaved members land in the same group by construction),
    * and each sample's image member decoded through q127's magic-byte
    * routing — caption facts and PIXEL statistics in one manifest.
    * The oracle unions the three decoder families' residue formulas
    * with the caption md5s from corpus words: the whole
    * tar→assemble→route→Huffman/inflate/LZW chain must land on
    * numbers derived without touching a byte.
    *
    * Residue classes (%4): 0 → `.jpg` baseline-gray JPEG; 1 → `.png`
    * five-filter RGB; 2 → `.gif` GIF89a; 3 → NO image member (the
    * incomplete sample a loader skips: `has_image = 0`, decode
    * columns NULL). Every shard also carries a caption-only `n<id>`
    * sample that must assemble separately. ONE keyed exchange (the
    * assembly aggregate — payloads reduce to md5/length/the single
    * image blob map-side), decode narrow after it.
    */
  def q174MediaShards(spark: SparkSession, dir: String): DataFrame =
    mediaShardsOn(Tables.load(spark, dir, "documents"))

  /** The q174 computation over any (doc_id, text) frame. */
  def mediaShardsOn(docs: DataFrame): DataFrame = {
    import graft.functions.{GifPixelOps, JpegPixelOps, PngPixelOps, TarOps, WdsOps}
    val id = col("doc_id")
    val mode = when(id % 4 === 1, 1L).when(id % 4 === 2, 2L)
      .when(id % 4 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val shard = docs.select(id, WdsOps.wdsMediaSynth(col("text"), params).as("_t"))
    val members = shard
      .select(id, col("_t"), TarOps.tarCount(col("_t")).as("_n"))
      .select(id, col("_t"),
        explode(sequence(lit(0), col("_n") - 1)).as("_i"))
      .select(id,
        TarOps.tarMemberName(col("_t"), col("_i")).as("name"),
        TarOps.tarMember(col("_t"), col("_i")).as("content"))
      .select(id,
        substring_index(col("name"), ".", 1).as("sample_key"),
        expr("substring(name, length(substring_index(name, '.', 1)) + 2)")
          .as("ext"),
        col("content"))
    val samples = members.groupBy(id, col("sample_key"))
      .agg(count(lit(1)).cast("int").as("n_parts"),
        array_join(sort_array(collect_list(col("ext"))), ",").as("exts"),
        max(when(col("ext") === "txt", md5(col("content"))))
          .as("caption_md5"),
        max_by(col("content"),
          when(col("ext") =!= "txt", lit(1)).otherwise(lit(0))).as("_img"),
        max(when(col("ext") =!= "txt", 1).otherwise(0)).cast("int")
          .as("has_image"))
      // a txt-only group's max_by still surfaces a caption blob —
      // the image column is only the non-txt member
      .withColumn("_img", when(col("has_image") === 1, col("_img")))
    val staged = samples
      .withColumn("_jd", graft.functions.ImageOps.jpegDims(col("_img")))
      .withColumn("_m",
        graft.operators.Multimodal.decodeImageMetaFrom(col("_img"), col("_jd")))
      .withColumn("_l",
        when(col("_m.format") === "jpeg", JpegPixelOps.jpegLuma(col("_img")))
          .when(col("_m.format") === "png", PngPixelOps.pngLuma(col("_img")))
          .when(col("_m.format") === "gif", GifPixelOps.gifLuma(col("_img"))))
    staged.select(id, col("sample_key"), col("n_parts"), col("exts"),
      col("has_image"), col("caption_md5"),
      when(col("has_image") === 1, col("_m.format")).as("format"),
      col("_m.width").as("width"),
      col("_m.height").as("height"),
      shiftrightunsigned(col("_l"), 16).as("sum_luma"))
  }
}
