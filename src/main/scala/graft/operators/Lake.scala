package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ParquetFooterOps

/** Lake self-introspection — reading the lake's OWN format metadata
  * without scanning data (the observability rung beside q104's
  * column profiling, which pays a full scan).
  */
object Lake {

  /** Q166: Parquet footer introspection — the row/column/row-group
    * accounting a lake audit reads BEFORE trusting a new drop, parsed
    * from the footer's Thrift compact protocol by the engine's own
    * walk ([[graft.functions.ParquetFooterEval]]), never by a scan:
    * `num_rows` from `FileMetaData`, column count from the schema
    * ROOT's `num_children` (counting flattened schema entries would
    * report nested groups as phantom columns), and `verified` — the
    * footer's row count cross-checked against the SUM of the row
    * groups' own counts (q59's meta/payload discipline; a footer
    * whose two counts disagree is flagged, never trusted).
    *
    * The oracle is the STRONGEST kind available: DuckDB counts the
    * actual rows by scanning the same files, so the engine's
    * footer walk must agree with an independent engine's full read.
    * Column counts replay the corpus schema contract (FIXTURES.md §B).
    *
    * At test scale each file rides one `binaryFile` row; a 100 TB
    * deployment feeds the kernel tail RANGES (the walk touches only
    * bytes from `EOF - 8 - footer_len`). Three one-row file reads,
    * one narrow map, a union — zero exchanges.
    */
  def q166ParquetFooter(spark: SparkSession, dir: String): DataFrame = {
    val tables = Seq("events", "documents", "embeddings")
    val files = tables.map { t =>
      spark.read.format("binaryFile").load(s"$dir/$t.parquet")
        .select(lit(t).as("tbl"), col("content"))
    }.reduce(_ unionAll _)
    files
      .select(col("tbl"),
        ParquetFooterOps.parquetMeta(col("content")).as("_m"),
        ParquetFooterOps.parquetNumRows(col("content")).as("num_rows"))
      .select(col("tbl"),
        when(col("_m") === -1L, 0).otherwise(1).as("is_parquet"),
        col("num_rows"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 24).bitwiseAND(lit(0xFFFFL)))
          .cast("int").as("n_columns"),
        when(col("_m") === -1L, lit(null))
          .otherwise(shiftright(col("_m"), 1).bitwiseAND(lit(1L)))
          .cast("int").as("verified"))
  }

  /** Q186: ORC footer introspection — the fourth and last of the big
    * lake formats' metadata planes (Parquet q166, Avro q164, Arrow
    * IPC q185): the tail read backward — the last byte sizes the
    * never-compressed PostScript protobuf (whose `magic` field id is
    * 8000, a TWO-byte tag), which names the compression kind and
    * locates the Footer protobuf carrying stripes, the schema type
    * tree (the ROOT type's subtypes — packed or unpacked — count the
    * columns), and the row count CROSS-CHECKED against the stripes'
    * own sum ([[graft.functions.OrcEval]]; q166's `verified`
    * discipline — a lying footer is flagged, never trusted).
    *
    * Residue classes (%5): 0 → NONE compression, 2 stripes, unpacked
    * subtypes, verified; 1 → 3 stripes, PACKED subtypes, and a footer
    * row count that DISAGREES with the stripe sum (`verified = 0`);
    * 2 → ZLIB compression (kind reported, row facts refuse — stated
    * scope); 3 → postscript length past EOF (magic survives, fields
    * refuse); 4 → plain text. Oracle replays every field from doc_id
    * arithmetic. One narrow map, zero exchanges.
    */
  def q186OrcFooter(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.OrcOps
    val docs = graft.Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = OrcOps.orcSynth(params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, OrcOps.orcMeta(col("_p")).as("_m"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_orc"),
        when(col("_m").isNull, lit(null).cast("string"))
          .when(shiftright(col("_m"), 48).bitwiseAND(lit(0xFL)) === 0, "none")
          .when(shiftright(col("_m"), 48).bitwiseAND(lit(0xFL)) === 1, "zlib")
          .when(shiftright(col("_m"), 48).bitwiseAND(lit(0xFL)) === 5, "zstd")
          .when(shiftright(col("_m"), 48).bitwiseAND(lit(0xFL)) === 15,
            lit(null).cast("string"))
          .otherwise("other").as("compression"),
        (shiftright(col("_m"), 36).bitwiseAND(lit(0x3FFL)) - 1)
          .cast("int").as("_ns"),
        (shiftright(col("_m"), 26).bitwiseAND(lit(0x3FFL)) - 1)
          .cast("int").as("_nc"),
        (col("_m").bitwiseAND(lit((1L << 26) - 1)) - 1).as("_nr"),
        shiftright(col("_m"), 46).bitwiseAND(lit(1L)).cast("int").as("_v"))
      .select(id, col("is_orc"), col("compression"),
        when(col("_ns") >= 0, col("_ns")).as("n_stripes"),
        when(col("_nc") >= 0, col("_nc")).as("n_columns"),
        when(col("_nr") >= 0, col("_nr")).as("num_rows"),
        when(col("_nr") >= 0, col("_v")).as("verified"))
  }

  /** Q187: the LAKE DROP CENSUS — the capstone of the lake
    * introspection family (q127/q184's magic-byte routing applied to
    * the big four lake formats): one binary column of mixed
    * Parquet / ORC / Avro / Arrow payloads, each routed to ITS
    * format's pinned walk — FOUR wire grammars in one manifest
    * (Thrift compact, protobuf, zigzag-Avro, flatbuffers) — and the
    * columns normalized to the audit's common vocabulary: row count,
    * column/field count, and the `verified` cross-check where the
    * format carries one (Parquet's and ORC's group/stripe sums). A
    * routing slip lands on another grammar's residue numbers and
    * cannot cancel (the oracle-union stance).
    *
    * Residue classes (%5): 0 → a metadata-only Parquet file
    * (`PAR1`-framed thrift footer, rows split over two row groups so
    * `verified` has teeth); 1 → ORC (q186's class 0); 2 → Avro
    * (q164's class 0 — 3 records, the stated 4-field schema);
    * 3 → Arrow IPC (q185's class 0 — schema + two batches);
    * 4 → plain text. One narrow map, zero exchanges.
    */
  def q187LakeCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ArrowIpcOps, AvroOps, OrcOps, ParquetFooterOps}
    val docs = graft.Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val payload = when(id % 5 === 0,
        ParquetFooterOps.parquetSynth(lit(500L) + id % 500, id % 7 + 2))
      .when(id % 5 === 1, OrcOps.orcSynth(id))
      .when(id % 5 === 2, AvroOps.avroSynth(col("text"), id))
      .when(id % 5 === 3, ArrowIpcOps.arrowSynth(id))
      .otherwise(col("text").cast("binary"))
    val staged = docs.select(id, payload.as("_p"))
      .withColumn("_fmt",
        when(hex(substring(col("_p"), 1, 4)) === "50415231", "parquet")
          .when(hex(substring(col("_p"), 1, 4)) === "4F626A01", "avro")
          .when(hex(substring(col("_p"), 1, 3)) === "4F5243", "orc")
          .when(hex(substring(col("_p"), 1, 4)) === "FFFFFFFF", "arrow"))
      .withColumn("_pm", when(col("_fmt") === "parquet",
        graft.functions.ParquetFooterOps.parquetMeta(col("_p"))))
      .withColumn("_pr", when(col("_fmt") === "parquet",
        graft.functions.ParquetFooterOps.parquetNumRows(col("_p"))))
      .withColumn("_om", when(col("_fmt") === "orc", OrcOps.orcMeta(col("_p"))))
      .withColumn("_am", when(col("_fmt") === "avro",
        AvroOps.avroMeta(col("_p"))))
      .withColumn("_im", when(col("_fmt") === "arrow",
        ArrowIpcOps.arrowMeta(col("_p"))))
    staged.select(id, col("_fmt").as("format"),
      when(col("_fmt") === "parquet", col("_pr"))
        .when(col("_fmt") === "orc",
          col("_om").bitwiseAND(lit((1L << 26) - 1)) - 1)
        .when(col("_fmt") === "avro",
          shiftright(col("_am"), 12).bitwiseAND(lit(0xFFFL)) - 1)
        .when(col("_fmt") === "arrow",
          col("_im").bitwiseAND(lit(0xFFFFFFFFL)))
        .as("num_rows"),
      when(col("_fmt") === "parquet",
        shiftright(col("_pm"), 24).bitwiseAND(lit(0xFFFFL)))
        .when(col("_fmt") === "orc",
          shiftright(col("_om"), 26).bitwiseAND(lit(0x3FFL)) - 1)
        .when(col("_fmt") === "avro", lit(4L)) // the stated schema
        .when(col("_fmt") === "arrow",
          shiftright(col("_im"), 44).bitwiseAND(lit(0x3FFL)))
        .cast("int").as("n_columns"),
      when(col("_fmt") === "parquet",
        shiftright(col("_pm"), 1).bitwiseAND(lit(1L)))
        .when(col("_fmt") === "orc",
          shiftright(col("_om"), 46).bitwiseAND(lit(1L)))
        .cast("int").as("verified"))
  }

  /** Q173: transaction-log snapshot reconstruction — the Delta-protocol
    * read every lakehouse client performs before touching a byte of
    * data (the `_delta_log` JSON actions ARE the table; a reader that
    * replays them wrong reads deleted files or misses live ones):
    * per-version JSON action lines (`add` / `remove` / `metaData` /
    * `protocol` / `commitInfo`) replay with LAST-WRITER-WINS per file
    * path — a file is LIVE iff its latest action is an `add`, and the
    * drill is a path REMOVED in one version and RE-ADDED in a later
    * one (a set-subtract reader tombstones it forever); `metaData`
    * takes the latest version's id; a malformed line quarantines
    * (counted, never poisons the snapshot — the q76 corrupt-as-data
    * stance); non-action lines (protocol/commitInfo) are structural.
    *
    * Residue classes: every log has v0 (3 adds + metaData) and v1
    * (1 remove + 1 add); `%3 == 0` adds v2 which REMOVES f0 and
    * RE-ADDS the f1 that v1 removed (+ a fresh f4); `%5 == 2` writes
    * a REPLACEMENT metaData in v1 (latest wins); `%7 == 5` splices a
    * malformed line into v1. Oracle replays file indices, sizes, and
    * ids from doc_id arithmetic alone — it never parses JSON.
    *
    * Shape at scale: actions shuffle ONCE keyed by (doc=table, path)
    * — exactly how a distributed log replay shards — the per-path
    * winner is a `max_by` over (version, line) order, and the
    * table-level rollup + line-level audit ride doc-keyed aggregates
    * (<= 4 exchanges pinned, no NLJ).
    */
  def q173DeltaLogReplay(spark: SparkSession, dir: String): DataFrame =
    // loadSpread so the one remaining parse pass (see the q173.lines
    // checkpoint below) runs cluster-wide — the spread exchange sits
    // BELOW the synthesis + JSON walk, inside the checkpoint build
    deltaLogReplayOn(graft.Tables.loadSpread(spark, dir, "documents"))

  /** The q173 computation over any (doc_id, text) frame. */
  def deltaLogReplayOn(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val base = (id % 97 + 1) * 1000
    def f(i: Int) =
      concat(lit("part-" + i + "-"), id.cast("string"), lit(".parquet"))
    def addLine(v: Int, i: Int) = concat(
      lit(v + "|{\"add\":{\"path\":\""), f(i),
      lit("\",\"size\":"), (base + i).cast("string"),
      lit(",\"dataChange\":true}}\n"))
    def rmLine(v: Int, i: Int) = concat(
      lit(v + "|{\"remove\":{\"path\":\""), f(i),
      lit("\",\"deletionTimestamp\":42,\"dataChange\":true}}\n"))
    val blob = concat(
      lit("0|{\"protocol\":{\"minReaderVersion\":1}}\n"),
      concat(lit("0|{\"metaData\":{\"id\":\"meta-"),
        (id % 50).cast("string"), lit("\"}}\n")),
      addLine(0, 0), addLine(0, 1), addLine(0, 2),
      lit("1|{\"commitInfo\":{\"operation\":\"WRITE\"}}\n"),
      rmLine(1, 1), addLine(1, 3),
      when(id % 5 === 2, concat(lit("1|{\"metaData\":{\"id\":\"meta-"),
        (id % 50 + 100).cast("string"), lit("\"}}\n"))).otherwise(""),
      when(id % 7 === 5, lit("1|{corrupt json line\n")).otherwise(""),
      when(id % 3 === 0, concat(rmLine(2, 0), addLine(2, 1), addLine(2, 4)))
        .otherwise(""))

    // parse ONCE (r19, the tokenize-once discipline): the audit rollup
    // and the per-path winner branch both consumed this frame as
    // duplicated subtrees — the blob synthesis + line explode + five
    // get_json_object walks ran twice, single-task each (profiled as two
    // back-to-back ~0.7 s one-task map jobs at sf0.1). The checkpoint
    // build runs the parse exactly once, spread cluster-wide — exactly
    // why r18's plain scan spread REGRESSED here and was reverted (each
    // branch re-executed the spread exchange).
    val lines = Materialize.once("q173.lines",
      docs.select(id, posexplode(split(blob, "\n")).as(Seq("idx", "l")))
        .filter(length(col("l")) > 0)
        .select(id, col("idx"),
          substring_index(col("l"), "|", 1).cast("int").as("version"),
          expr("substring(l, instr(l, '|') + 1, 1000000)").as("json"))
        .withColumn("bad", get_json_object(col("json"), "$").isNull.cast("int"))
        .withColumn("add_path", get_json_object(col("json"), "$.add.path"))
        .withColumn("add_size",
          get_json_object(col("json"), "$.add.size").cast("long"))
        .withColumn("rm_path", get_json_object(col("json"), "$.remove.path"))
        .withColumn("meta_id", get_json_object(col("json"), "$.metaData.id"))
        // json carried no further: the two consumers read only the
        // parsed columns, so the checkpoint stores 5 narrow columns,
        // never the raw line text
        .drop("l", "json"))

    // per-table audit: versions, corrupt lines, latest metaData
    val audit = lines.groupBy(col("doc_id"))
      .agg(countDistinct(col("version")).as("n_versions"),
        sum(col("bad")).cast("int").as("n_bad_lines"),
        max_by(col("meta_id"), when(col("meta_id").isNotNull,
          struct(col("version"), col("idx")))).as("latest_meta_id"))

    // per-path winner: last writer (version, line) wins
    val actions = lines
      .filter(col("add_path").isNotNull || col("rm_path").isNotNull)
      .select(col("doc_id"),
        coalesce(col("add_path"), col("rm_path")).as("path"),
        col("version"), col("idx"),
        col("add_path").isNotNull.as("is_add"), col("add_size"))
    val winners = actions.groupBy(col("doc_id"), col("path"))
      .agg(max_by(struct(col("is_add"), col("add_size")),
        struct(col("version"), col("idx"))).as("w"))
    val snapshot = winners.groupBy(col("doc_id"))
      .agg(sum(col("w.is_add").cast("int")).cast("int").as("n_live"),
        sum(when(!col("w.is_add"), 1).otherwise(0)).cast("int")
          .as("n_tombstones"),
        sum(when(col("w.is_add"), col("w.add_size"))).as("total_bytes"))

    snapshot.join(audit, "doc_id")
      .select(col("doc_id"), col("n_versions").cast("int").as("n_versions"),
        col("n_live"), col("n_tombstones"), col("total_bytes"),
        col("latest_meta_id"), col("n_bad_lines"))
  }
}
