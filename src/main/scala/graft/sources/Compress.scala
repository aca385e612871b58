package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GzipOps, XzOps, ZstdBlockOps, ZstdOps}

/** Q184: compression-layer ROUTER — q127's magic-byte discipline at
  * the compression layer (a corpus drop arrives as whatever the
  * producer had: `.gz`, `.zst`, `.xz`, `.bz2` — one binary column,
  * one manifest): route by magic to each format's pinned machinery —
  * gzip DECODES through q95's strict codec, zstd DECODES through
  * q188's RFC 8878 block decoder, bzip2 DECODES through q191's full
  * stage stack (content md5 proves all three) beside their triage
  * planes, and xz reports the footer/index triage
  * ([[graft.functions.XzEval]] — backward-size-located index, VLI
  * record pairs, the footer-flags splice cross-check, index CRC32
  * verified). The manifest
  * columns are format-appropriate: a routing slip lands on another
  * family's residue numbers and cannot cancel (q127's oracle-union
  * stance).
  *
  * Residue classes (%5): 0 → gzip member (decoded, md5-proved);
  * 1 → zstd single frame (decoded + declared size + xxh64 flag);
  * 2 → xz with `doc_id % 2` choosing one-block/CRC32 or
  * three-block/CRC64 with multi-byte VLIs; 3 → a REAL bzip2 stream
  * (decoded, md5-proved); 4 → plain text. One narrow map, zero
  * exchanges.
  */
object Compress {

  def q184CompressRouter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val ws = filter(split(lower(coalesce(col("text"), lit(""))),
      "[^a-z0-9]+"), w => length(w) > 0)
    val p0 = concat(element_at(ws, 1), lit(" "), element_at(ws, 2),
      lit("#"), (id % 97).cast("string"))
    val payload = when(id % 5 === 0,
        GzipOps.gzip(encode(p0, "UTF-8"), lit("")))
      .when(id % 5 === 1, ZstdOps.zstdSynth(col("text"), id))
      .when(id % 5 === 2, XzOps.xzSynth(id + (id % 2) * lit(1L << 40)))
      .when(id % 5 === 3,
        graft.functions.Bzip2Ops.bzip2Synth(col("text"), id))
      .otherwise(col("text").cast("binary"))

    val staged = docs.select(id, payload.as("_p"))
      .withColumn("_fmt",
        when(hex(substring(col("_p"), 1, 2)) === "1F8B", "gzip")
          .when(hex(substring(col("_p"), 1, 4)) === "28B52FFD", "zstd")
          .when(hex(substring(col("_p"), 1, 6)) === "FD377A585A00", "xz")
          .when(substring(col("_p"), 1, 3) === lit("BZh".getBytes("US-ASCII"))
            && hex(substring(col("_p"), 5, 6)) === "314159265359", "bzip2"))
      // lazy per-format machinery: each row runs only its own walk
      .withColumn("_gz", when(col("_fmt") === "gzip",
        GzipOps.gunzip(col("_p"))))
      .withColumn("_zm", when(col("_fmt") === "zstd",
        ZstdOps.zstdMeta(col("_p"))))
      .withColumn("_zc", when(col("_fmt") === "zstd",
        ZstdOps.zstdContentSize(col("_p"))))
      .withColumn("_xm", when(col("_fmt") === "xz", XzOps.xzMeta(col("_p"))))
      .withColumn("_zd", when(col("_fmt") === "zstd",
        ZstdBlockOps.zstdDecode(col("_p"))))
      .withColumn("_bz", when(col("_fmt") === "bzip2",
        graft.functions.Bzip2Ops.bzip2Decode(col("_p"))))
    staged.select(id, col("_fmt").as("format"),
      when(col("_fmt") === "gzip", 1)
        .when(col("_fmt") === "zstd",
          shiftright(col("_zm"), 32).bitwiseAND(lit(0xFFL)).cast("int"))
        .when(col("_fmt") === "xz",
          shiftright(col("_xm"), 32).bitwiseAND(lit(0xFFFFL)).cast("int"))
        .as("n_units"),
      when(col("_fmt") === "zstd", col("_zc"))
        .when(col("_fmt") === "xz",
          col("_xm").bitwiseAND(lit(0xFFFFFFFFL)))
        .as("declared_size"),
      when(col("_fmt") === "gzip", "crc32")
        .when(col("_fmt") === "zstd",
          when(shiftright(col("_zm"), 40).bitwiseAND(lit(0xFL)) === 1,
            "xxh64").otherwise("none"))
        .when(col("_fmt") === "xz",
          when(shiftright(col("_xm"), 48) === 1, "crc32")
            .when(shiftright(col("_xm"), 48) === 4, "crc64")
            .when(shiftright(col("_xm"), 48) === 10, "sha256")
            .otherwise("none"))
        .when(col("_fmt") === "bzip2", "crc32")
        .as("check_kind"),
      when(col("_fmt") === "gzip", md5(col("_gz")))
        .when(col("_fmt") === "zstd", md5(col("_zd")))
        .when(col("_fmt") === "bzip2", md5(col("_bz"))).as("content_md5"),
      when(col("_fmt") === "bzip2",
        substring(col("_p"), 4, 1).cast("string").cast("int"))
        .as("bz_level"))
  }

  /** Q191: bzip2 BLOCK decode — the archive format the big public
    * text corpora actually ship in (Wikipedia dumps are `.xml.bz2`):
    * the full stage stack — MSB-first bit stream, VERIFIED bzip2
    * CRC32 (unreflected — java's CRC32 cannot check it), symbol map,
    * 2..6 Huffman groups switching every 50 symbols through MTF'd
    * selectors, RUNA/RUNB bijective-base-2 zero runs, the inverse
    * Burrows-Wheeler transform, RLE1, and the rotate-xor combined CRC
    * ([[graft.functions.Bzip2Eval]] — whose synthesizer is a REAL
    * compressor, interop-proven both directions against bzip2 CLI in
    * Bzip2DecodeSpec). Content round-trips to md5 (q95's stance).
    *
    * Residue classes (%5): 0 → one block, level 9; 1 → an
    * RLE1-triggering 40-byte run inside the content; 2 → TWO blocks
    * (the combined-CRC fold crosses a boundary); 3 → repetitive
    * content at level 1; 4 → plain text (not bzip2). One narrow map,
    * zero exchanges.
    */
  def q191Bzip2Decode(spark: SparkSession, dir: String): DataFrame =
    q191Bzip2DecodeOn(Tables.load(spark, dir, "documents"))

  /** [[q191Bzip2Decode]] over an explicit corpus (the ScaleSpec decade hook). */
  def q191Bzip2DecodeOn(docs: DataFrame): DataFrame = {
    import graft.functions.Bzip2Ops
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = Bzip2Ops.bzip2Synth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, Bzip2Ops.bzip2DecodeMeta(col("_p")).as("_m"),
        Bzip2Ops.bzip2Decode(col("_p")).as("_c"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_bzip2"),
        shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)).cast("int")
          .as("level"),
        shiftright(col("_m"), 24).bitwiseAND(lit(0xFFL)).cast("int")
          .as("n_blocks"),
        shiftright(col("_m"), 44).bitwiseAND(lit(0xFL)).cast("int")
          .as("truncated"),
        shiftright(col("_m"), 40).bitwiseAND(lit(0xFL)).cast("int")
          .as("crc_ok"),
        length(col("_c")).cast("bigint").as("content_len"),
        md5(col("_c")).as("content_md5"))
  }

  /** Q193: the UNIVERSAL content decode — the capstone the family
    * has been building toward: one binary column of corpus drops in
    * WHATEVER wrapper the producer had (gzip / zstd / lz4 / bzip2 /
    * xz / none), routed by magic bytes (q127's discipline) and
    * DECODED to the same md5-proved content columns whichever format
    * arrives — q95's strict gzip, q188's RFC 8878 zstd, q190's lz4,
    * q191's bzip2, q192's xz/LZMA2. The point of the family: a
    * training pipeline never turns a drop away for its wrapper, and
    * one manifest says what every member holds. A routing slip lands
    * on another decoder's refusal and cannot cancel.
    *
    * Residue classes (%7): 0 → gzip; 1 → zstd (a REAL compressed
    * frame — q188's synthesis, Huffman literals); 2 → lz4; 3 → bzip2;
    * 4 → xz; 6 → DICTIONARY-keyed zstd decoded against a broadcast
    * sidecar dictionary (trained-dict lakes: Common Crawl CDX and
    * production feature stores ship these — the frame copies the
    * dictionary phrase through dict-seeded repcodes and loads its
    * entropy tables in Repeat mode; without the sidecar it refuses);
    * 5 → plain (passes through as `none`). The content is the SAME
    * family spelling in every class (the dict class prefixes the
    * phrase), so the oracle is one md5 formula against six decode
    * stacks. One narrow map, zero exchanges.
    */
  def q193UniversalDecode(spark: SparkSession, dir: String): DataFrame =
    q193UniversalDecodeOn(Tables.loadSpread(spark, dir, "documents"))

  /** [[q193UniversalDecode]] over an explicit corpus (the ScaleSpec decade hook). */
  def q193UniversalDecodeOn(docs: DataFrame): DataFrame = {
    import graft.functions.{Bzip2Ops, Lz4Ops, XzContentOps}
    val id = col("doc_id")
    val ws = filter(split(lower(coalesce(col("text"), lit(""))),
      "[^a-z0-9]+"), w => length(w) > 0)
    val p0 = substring(concat(element_at(ws, 1), lit(" "),
      element_at(ws, 2), lit("#"), (id % 97).cast("string")), 1, 200)
    val raw = encode(p0, "UTF-8")
    val payload = when(id % 7 === 0, GzipOps.gzip(raw, lit("")))
      .when(id % 7 === 1, ZstdBlockOps.zstdDeepSynth(col("text"), id))
      .when(id % 7 === 2, Lz4Ops.lz4Synth(col("text"), id))
      .when(id % 7 === 3, Bzip2Ops.bzip2Synth(col("text"), id))
      .when(id % 7 === 4, XzContentOps.xzContentSynth(col("text"), id))
      .when(id % 7 === 6, ZstdBlockOps.zstdDictFrame(col("text"), id))
      .otherwise(raw)
    // the sidecar dictionary: ONE broadcast blob serves every row (the
    // blocklist-dim pattern); a dict-keyed frame is told apart from a
    // plain one by the frame header's dictionary-id flag bits, the way
    // a real reader routes before picking a decode context
    val sidecar = lit(graft.functions.ZstdBlockEval.profileDict)
    val isZstd = hex(substring(col("_p"), 1, 4)) === "28B52FFD"
    val dictFlag = conv(hex(substring(col("_p"), 5, 1)), 16, 10)
      .cast("int").bitwiseAND(lit(3))
    val staged = docs.select(id, payload.as("_p"))
      .withColumn("_fmt",
        when(hex(substring(col("_p"), 1, 2)) === "1F8B", "gzip")
          .when(isZstd && dictFlag =!= 0, "zstd-dict")
          .when(isZstd, "zstd")
          .when(hex(substring(col("_p"), 1, 4)) === "04224D18", "lz4")
          .when(substring(col("_p"), 1, 3) === lit("BZh".getBytes("US-ASCII"))
            && hex(substring(col("_p"), 5, 6)) === "314159265359", "bzip2")
          .when(hex(substring(col("_p"), 1, 6)) === "FD377A585A00", "xz")
          .otherwise("none"))
      .withColumn("_c",
        when(col("_fmt") === "gzip", GzipOps.gunzip(col("_p")))
          .when(col("_fmt") === "zstd-dict",
            ZstdBlockOps.zstdDecodeDict(col("_p"), sidecar))
          .when(col("_fmt") === "zstd", ZstdBlockOps.zstdDecode(col("_p")))
          .when(col("_fmt") === "lz4", Lz4Ops.lz4Decode(col("_p")))
          .when(col("_fmt") === "bzip2", Bzip2Ops.bzip2Decode(col("_p")))
          .when(col("_fmt") === "xz", XzContentOps.xzDecode(col("_p")))
          .otherwise(col("_p")))
    staged.select(id, col("_fmt").as("format"),
      col("_c").isNotNull.cast("int").as("decoded"),
      length(col("_c")).cast("bigint").as("content_len"),
      md5(col("_c")).as("content_md5"))
  }

  /** Q190: LZ4 frame decode — the LOW-LATENCY member of the
    * compression family (q95 gzip, q188 zstd; feature stores and
    * Kafka topics hand corpora over as `.lz4`): the frame
    * descriptor's flag-gated optional fields behind a VERIFIED header
    * checksum (the second XXH32 byte), stored-bit blocks, the
    * token-coded block grammar with 255-extension lengths and
    * overlap-capable offsets that reach across blocks (block-linked
    * mode), XXH32 block and content checksums verified for real
    * ([[graft.functions.Lz4Eval]] — interop-proven both directions
    * against lz4 CLI v1.9.4 in Lz4DecodeSpec). Content round-trips
    * to md5 (q95's stance).
    *
    * Residue classes (%6): 0 → one literals-only block; 1 → a real
    * match + an offset-1 overlap run, block AND content checksums;
    * 2 → a STORED (uncompressed-bit) block beside a compressed one,
    * declared content size; 3 → two frames back to back; 4 → a
    * literal run past 270 bytes (two length-extension bytes);
    * 5 → plain text (not lz4). One narrow map, zero exchanges.
    */
  /** Q192: xz CONTENT decode — the block-content rung the q184 triage
    * stopped at: LZMA2 chunks over the real LZMA range decoder
    * (adaptive binary probabilities, matched literals, rep-distance
    * history, pos-slot/align trees — the one mainstream codec that is
    * PURE algorithm, so it pins against the reference CLI without
    * constant tables), xz block headers with verified CRC32s, the
    * declared CHECK verified for real (CRC32 / ECMA-182 CRC64 /
    * SHA-256), and the INDEX cross-checked record-by-record against
    * what actually decoded ([[graft.functions.XzContentEval]] —
    * interop-proven both directions against xz CLI 5.x in
    * XzContentSpec). Content round-trips to md5 (q95's stance).
    *
    * Residue classes (%5): 0 → one block, CRC32; 1 → CRC64; 2 → TWO
    * blocks under SHA-256 (the index carries two records); 3 →
    * content crossing an LZMA2 chunk boundary (70 KB of residue
    * bytes); 4 → plain text (not xz). One narrow map, zero exchanges.
    */
  def q192XzDecode(spark: SparkSession, dir: String): DataFrame =
    q192XzDecodeOn(Tables.loadSpread(spark, dir, "documents"))

  /** [[q192XzDecode]] over an explicit corpus (the ScaleSpec decade hook). */
  def q192XzDecodeOn(docs: DataFrame): DataFrame = {
    import graft.functions.XzContentOps
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = XzContentOps.xzContentSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, XzContentOps.xzDecodeMeta(col("_p")).as("_m"),
        XzContentOps.xzDecode(col("_p")).as("_c"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_xz"),
        when(shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)) === 1, "crc32")
          .when(shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)) === 4, "crc64")
          .when(shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)) === 10,
            "sha256")
          .when(col("_m").isNotNull, "none").as("check_kind"),
        shiftright(col("_m"), 24).bitwiseAND(lit(0xFFL)).cast("int")
          .as("n_blocks"),
        shiftright(col("_m"), 44).bitwiseAND(lit(0xFL)).cast("int")
          .as("truncated"),
        shiftright(col("_m"), 40).bitwiseAND(lit(0xFL)).cast("int")
          .as("check_ok"),
        length(col("_c")).cast("bigint").as("content_len"),
        md5(col("_c")).as("content_md5"))
  }

  def q190Lz4Decode(spark: SparkSession, dir: String): DataFrame =
    q190Lz4DecodeOn(Tables.load(spark, dir, "documents"))

  /** [[q190Lz4Decode]] over an explicit corpus (the ScaleSpec decade hook). */
  def q190Lz4DecodeOn(docs: DataFrame): DataFrame = {
    import graft.functions.Lz4Ops
    val id = col("doc_id")
    val mode = when(id % 6 === 1, 1L).when(id % 6 === 2, 2L)
      .when(id % 6 === 3, 3L).when(id % 6 === 4, 4L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = Lz4Ops.lz4Synth(col("text"), params)
    val payload = when(id % 6 === 5, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id, Lz4Ops.lz4DecodeMeta(col("_p")).as("_m"),
        Lz4Ops.lz4Decode(col("_p")).as("_c"))
      .select(id,
        col("_m").isNotNull.cast("int").as("is_lz4"),
        shiftright(col("_m"), 32).bitwiseAND(lit(0xFFL)).cast("int")
          .as("n_frames"),
        shiftright(col("_m"), 24).bitwiseAND(lit(0xFFL)).cast("int")
          .as("n_blocks"),
        shiftright(col("_m"), 44).bitwiseAND(lit(0xFL)).cast("int")
          .as("truncated"),
        (shiftright(col("_m"), 40).bitwiseAND(lit(0xFL)) - 1).cast("int")
          .as("checksum_ok"),
        length(col("_c")).cast("bigint").as("content_len"),
        md5(col("_c")).as("content_md5"))
  }
}
