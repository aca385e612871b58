package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TfExampleOps

/** Q161: tf.Example feature extraction — the protobuf record inside
  * q160's frames, completing the TFRecord pair the way q82→q93 layers
  * WARC→HTML: the wire-grammar walk ([[graft.functions.TfExampleEval]])
  * reads the `text` bytes feature, the `tokens` int64 list (packed OR
  * unpacked — both legal spellings; a negative value is a 10-byte
  * varint), and the `score` float list folded to exact micro-units
  * (quarter values by construction), skipping unknown fields at every
  * level by wire type and keeping the LAST duplicate map key.
  *
  * Residue classes (%5): 0 → packed int64s crossing 127/16383 +
  * packed floats; 1 → UNPACKED int64s with a negative value +
  * unknown Example-level and map-entry-level fields (skipped, never
  * counted); 2 → duplicate `text` key (LAST wins) + unpacked floats;
  * 3 → cut 3 bytes short (protobuf has no resync — refuses whole);
  * 4 → plain text (no features field parses: `ok = 0`). Oracle
  * replays every field from corpus words + doc_id arithmetic alone.
  * One narrow map, zero exchanges.
  */
object TfExample {

  def q161TfExampleDecode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = TfExampleOps.tfxSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        TfExampleOps.tfxOk(col("_p")).as("ok"),
        TfExampleOps.tfxFeatures(col("_p")).as("n_features"),
        length(TfExampleOps.tfxText(col("_p"))).as("text_chars"),
        md5(TfExampleOps.tfxText(col("_p"))).as("text_md5"),
        TfExampleOps.tfxIntCount(col("_p")).as("n_ints"),
        TfExampleOps.tfxIntSum(col("_p")).as("sum_ints"),
        TfExampleOps.tfxScoreMicros(col("_p")).as("score_micros"))
  }
}
