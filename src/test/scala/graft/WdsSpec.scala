package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TarEval, WdsEval}
import graft.operators.Wds

/** Q163's sample-assembly contract: the first-dot key/ext split, the
  * interleave drill, name-vs-content completeness, and a full
  * driver-side replay of the engine's manifest on sf0.001.
  */
class WdsSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def words(s: String): Array[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("synth shards walk as verified tars with the contract member sets") {
    val text = "alpha beta gamma delta epsilon zeta eta".getBytes("UTF-8")
    val s0 = WdsEval.synth(text, 8L) // mode 0 (8 % 4 handled by caller;
    // params carry mode explicitly — 0 here)
    assert(TarEval.memberCount(s0) === 5)
    val names = (0 until 5).map(i => TarEval.memberName(s0, i))
    assert(names === Seq("d8_0.txt", "d8_0.cls", "d8_0.json",
      "d8_1.txt", "d8_1.cls"))
    assert(new String(TarEval.member(s0, 0), "UTF-8") === "alpha beta gamma")
    assert(new String(TarEval.member(s0, 3), "UTF-8") === "delta epsilon zeta")
    assert(new String(TarEval.member(s0, 1), "UTF-8") === "8")
  }

  test("mode 3 flips one checksum: the name survives, the content refuses") {
    val text = "one two three four five six".getBytes("UTF-8")
    val s3 = WdsEval.synth(text, 9L + (3L << 40))
    assert(TarEval.memberCount(s3) === 5, "siblings still walk")
    assert(TarEval.memberName(s3, 1) === "d9_0.cls")
    assert(TarEval.member(s3, 1) === null, "corrupt member refuses content")
    assert(TarEval.member(s3, 0) != null, "clean siblings read")
  }

  test("engine manifest agrees with a driver-side replay on sf0.001") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))

    val expected = docs.flatMap { case (id, text) =>
      val m = id % 4
      val ws = words(text)
      val t0 = ws.slice(0, 3).mkString(" ")
      val t1 = ws.slice(3, 6).mkString(" ")
      val s0exts = if (m == 2) "cls,seg.png,txt" else "cls,json,txt"
      val s1 = (id, s"d${id}_1", if (m == 1) 1 else 2,
        if (m == 1) "txt" else "cls,txt", if (m == 1) 0 else 1,
        md5hex(t1.getBytes("UTF-8")), t1.length.toLong)
      val s0 = (id, s"d${id}_0", 3, s0exts, if (m == 3) 0 else 1,
        md5hex(t0.getBytes("UTF-8")), t0.length.toLong)
      Seq(s0, s1)
    }.toSet

    val got = Wds.q163WdsSamples(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getInt(4), r.getString(5), r.getLong(6))).toSet
    assert(got === expected)
  }

  test("the interleaved mode-2 shard assembles exactly like a contiguous one") {
    val text = "red green blue cyan magenta yellow".getBytes("UTF-8")
    val s2 = WdsEval.synth(text, 2L + (2L << 40))
    // members interleave samples on purpose; the multi-dot name splits
    // at the FIRST dot of the basename
    val names = (0 until TarEval.memberCount(s2))
      .map(i => TarEval.memberName(s2, i))
    assert(names.contains("d2_0.seg.png"))
    assert(names.indexOf("d2_1.txt") < names.indexOf("d2_0.seg.png"),
      "the synth must interleave samples for the drill to mean anything")
  }
}
