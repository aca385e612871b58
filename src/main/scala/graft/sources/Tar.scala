package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TarOps

/** Q136: TAR (ustar) archive ingest — the second corpus-drop container
  * (q132 covers ZIP): each payload is a tarball of the document's own
  * bytes — a directory entry (counts as a member, carries no content),
  * the text file, and a LONG-PATH member whose directory rides the
  * ustar `prefix` field so a name-only reader reports the wrong path.
  * Every header's checksum must validate before its size advances the
  * walk; refusal is per member for a bad checksum (siblings still
  * read) and whole-archive for truncation.
  *
  * Residue classes (%5): 0 → POSIX ustar; 1 → old-GNU magic
  * (`ustar  \0`), same content; 2 → member 1's checksum corrupted
  * (its md5 refuses NULL, the meta member and the count survive, and
  * the size accounting excludes it); 3 → tail truncated mid-trailer
  * (whole archive refuses); 4 → not a tar. The oracle replays member
  * md5s, the prefix-joined long path, and the size accounting from
  * corpus text alone (q95's stance). One narrow map, zero exchanges.
  */
object Tar {

  def q136TarExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 2L).when(id % 5 === 2, 1L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = TarOps.tarSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary"))
      .when(id % 5 === 3, expr("substring(_w, 1, length(_w) - 600)"))
      .otherwise(col("_w"))
    docs.select(id, col("text"), whole.as("_w"))
      .select(id, payload.as("_p"))
      .select(id,
        TarOps.tarCount(col("_p")).as("_n"),
        TarOps.tarMemberName(col("_p"), lit(2)).as("long_name"),
        TarOps.tarMember(col("_p"), lit(1)).as("_m1"),
        TarOps.tarMember(col("_p"), lit(2)).as("_m2"),
        TarOps.tarTotalBytes(col("_p")).as("n_bytes"))
      .select(id,
        col("_n").isNotNull.cast("int").as("valid"),
        col("_n").as("n_members"),
        col("long_name"),
        md5(col("_m1")).as("md5_text"),
        md5(col("_m2")).as("md5_meta"),
        col("n_bytes"))
  }

  /** Q195: TARBALL intake — the shape source-code corpora actually
    * arrive in (kernel trees ship `.tar.xz`, classic releases
    * `.tar.gz`/`.tar.bz2` — the code-LLM feed): one binary column of
    * tarballs in whatever wrapper the producer used, routed by magic
    * (q193's discipline), content-decoded through the verified stacks
    * (q95 gzip / q191 bzip2 / q192 xz), and walked by q136's
    * checksum-verified tar reader — wrapper, member count, the doc
    * member's md5, and the payload accounting in one manifest.
    *
    * Residue classes (%5): 0 → `.tar.gz`; 1 → `.tar.bz2`; 2 →
    * `.tar.xz`; 3 → a bare `.tar` (wrapper `none`); 4 → plain text
    * (not a tarball at all). The inner tar is identical across
    * classes, so the oracle is one formula against three decode
    * stacks plus the passthrough. One narrow map, zero exchanges.
    */
  def q195TarballIntake(spark: SparkSession, dir: String): DataFrame =
    q195TarballIntakeOn(Tables.loadSpread(spark, dir, "documents"))

  /** [[q195TarballIntake]] over an explicit corpus (the ScaleSpec decade hook). */
  def q195TarballIntakeOn(docs: DataFrame): DataFrame = {
    import graft.functions.{Bzip2Ops, GzipOps, XzContentOps}
    val id = col("doc_id")
    val tar = TarOps.tarSynth(col("text"), id)
    val payload = when(id % 5 === 0, GzipOps.gzip(tar, lit("")))
      .when(id % 5 === 1, Bzip2Ops.bzip2Compress(tar))
      .when(id % 5 === 2, XzContentOps.xzCompress(tar))
      .when(id % 5 === 3, tar)
      .otherwise(col("text").cast("binary"))
    val staged = docs.select(id, payload.as("_p"))
      .withColumn("_w",
        when(hex(substring(col("_p"), 1, 2)) === "1F8B", "gzip")
          .when(substring(col("_p"), 1, 3) ===
            lit("BZh".getBytes("US-ASCII")), "bzip2")
          .when(hex(substring(col("_p"), 1, 6)) === "FD377A585A00", "xz")
          .when(hex(substring(col("_p"), 258, 5)) === "7573746172",
            "none")) // "ustar" at offset 257
      .withColumn("_t",
        when(col("_w") === "gzip", GzipOps.gunzip(col("_p")))
          .when(col("_w") === "bzip2", Bzip2Ops.bzip2Decode(col("_p")))
          .when(col("_w") === "xz", XzContentOps.xzDecode(col("_p")))
          .when(col("_w") === "none", col("_p")))
    staged.select(id,
      col("_w").as("wrapper"),
      TarOps.tarCount(col("_t")).isNotNull.cast("int").as("is_tar"),
      TarOps.tarCount(col("_t")).as("n_members"),
      md5(TarOps.tarMember(col("_t"), lit(1))).as("text_md5"),
      TarOps.tarTotalBytes(col("_t")).as("n_bytes"))
  }
}
