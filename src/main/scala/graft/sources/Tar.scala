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
}
