package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MojibakeOps

/** Q143: mojibake detection and repair — the ftfy-class cleaning pass
  * for text corrupted UPSTREAM (UTF-8 misread as cp1252: `é` → `Ã©`,
  * composing to `ÃƒÂ©` through a twice-faulty pipeline). The inverse
  * pipeline runs only while every gate holds — cp1252-encodable,
  * strict-UTF-8-decodable, string-changing — so real accented text
  * and the lone-`Â` trap survive untouched
  * ([[graft.functions.MojibakeEval]]).
  *
  * Residue classes (%5): 0 → plain ASCII; 1 → REAL non-ASCII that
  * must not be "repaired"; 2 → single mojibake (1 round); 3 → double
  * mojibake (2 rounds); 4 → the lone-`Â` regex-fixer trap. Oracle
  * spells every expected repaired string from chr() codepoints alone.
  * One narrow map, zero exchanges.
  */
object Mojibake {

  def q143MojibakeRepair(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val payload = MojibakeOps.mojibakeSynth(col("text"), (id % 5).cast("int"))
    docs.select(id, payload.as("_p"))
      .select(id,
        MojibakeOps.mojibakeRounds(col("_p")).as("n_rounds"),
        MojibakeOps.mojibakeFix(col("_p")).as("_f"))
      .select(id,
        (col("n_rounds") > 0).cast("int").as("mojibake"),
        col("n_rounds"),
        md5(col("_f").cast("binary")).as("text_md5"),
        length(col("_f")).cast("long").as("n_chars"))
  }
}
