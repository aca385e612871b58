package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ArrowIpcOps

/** Q185: Arrow IPC stream triage — the ML ecosystem's interchange
  * format (what pyarrow streams between feature pipelines and
  * training hosts), and the engine's THIRD wire grammar after
  * protobuf (q161) and Thrift compact (q166): each message head is a
  * FLATBUFFER, so the walk parses real vtables — signed back-offsets
  * to vtables, 0-slot-means-absent field presence (reading "offset
  * 0" instead of applying the default is the classic flatbuffers
  * bug), the Message union dispatch (Schema / DictionaryBatch /
  * RecordBatch), Schema's fields-vector length as the column count,
  * RecordBatch's i64 row count, and the continuation/EOS framing
  * with 8-aligned bodies ([[graft.functions.ArrowIpcEval]]).
  *
  * Residue classes (%5): 0 → schema(3 cols) + two batches + EOS;
  * 1 → schema(5) + batch + a DICTIONARY message that frames past
  * WITHOUT counting + batch; 2 → schema whose fields vector and
  * version are ABSENT (the vtable-0 default drill) + one batch;
  * 3 → cut mid-second-batch (schema + first batch serve,
  * `truncated = 1`); 4 → plain text. Oracle replays every count
  * from doc_id arithmetic. One narrow map, zero exchanges.
  */
object ArrowIpc {

  def q185ArrowIpcTriage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = ArrowIpcOps.arrowSynth(params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, ArrowIpcOps.arrowMeta(col("_p")).as("_m"),
        ArrowIpcOps.arrowBody(col("_p")).as("body_bytes"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_arrow"),
        shiftright(col("_m"), 44).bitwiseAND(lit(0x3FFL)).cast("int")
          .as("n_fields"),
        shiftright(col("_m"), 34).bitwiseAND(lit(0x3FFL)).cast("int")
          .as("n_batches"),
        col("_m").bitwiseAND(lit(0xFFFFFFFFL)).as("total_rows"),
        col("body_bytes"),
        shiftright(col("_m"), 33).bitwiseAND(lit(1L)).cast("int")
          .as("truncated"))
  }
}
