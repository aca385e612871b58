package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Q148's first-occurrence-wins contract, checked against a FULL
  * driver-side reimplementation (a third plan shape beside the
  * engine's min-struct aggregate and the oracle's window): every
  * doc's n_paras, n_dup, and kept-text digest must agree row for row,
  * and the boilerplate/within-doc drills must land where designed.
  */
class ParaDedupSpec extends AnyFunSuite {

  private val B1 = "all rights reserved contact the publisher for permissions"
  private val B2 = "distributed under a creative commons attribution license"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def parasOf(id: Long, text: String): Seq[String] = {
    val ws = Option(text).getOrElse("").toLowerCase
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val chunks = ws.grouped(8).map(_.mkString(" ")).toSeq
    val pre =
      (if (id % 7 == 0 || id % 7 == 3) Seq(B1) else Nil) ++
        (if (id % 7 == 1 || id % 7 == 3) Seq(B2) else Nil)
    val post = if (id % 7 == 4) Seq(chunks.head) else Nil
    pre ++ chunks ++ post
  }

  test("engine agrees with a driver-side replay on every doc") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)

    // first-occurrence-wins replay in plain Scala
    val seen = scala.collection.mutable.HashSet[String]()
    val expected = docs.map { case (id, text) =>
      val ps = parasOf(id, text)
      val kept = scala.collection.mutable.ArrayBuffer[String]()
      var dup = 0
      ps.foreach { p =>
        if (seen.add(p)) kept += p else dup += 1
      }
      id -> ((ps.size.toLong, dup.toLong, md5hex(kept.mkString("\n"))))
    }.toMap

    val got = Dedup.q148ParaDedup(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) =>
      assert(v === expected(id), s"doc $id diverged")
    }
  }

  test("the drills land: boilerplate kept once, within-doc dup loses") {
    val spark = TestSpark.spark
    val rows = Dedup.q148ParaDedup(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every %7==4 doc repeats its own first chunk: at least one dup
    rows.filter(_._1 % 7 == 4).foreach { case (id, _, dup) =>
      assert(dup >= 1, s"doc $id must lose its repeated first chunk")
    }
    // boilerplate: every carrier except the first loses that paragraph
    val b1Carriers = rows.filter(r => r._1 % 7 == 0 || r._1 % 7 == 3)
    val first = b1Carriers.map(_._1).min
    b1Carriers.filter(_._1 != first).foreach { case (id, _, dup) =>
      assert(dup >= 1, s"doc $id carries the rights notice and must dedup it")
    }
  }
}
