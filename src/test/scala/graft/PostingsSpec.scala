package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** Q156's postings contract on the sf0.001 corpus, checked against a
  * FULL driver-side replay (a third plan shape beside the engine's
  * min-struct aggregate and the oracle's windows): every term's
  * df/cf, tie-broken top document, and doc-ordered digest.
  */
class PostingsSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("engine agrees with a driver-side replay on every term") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val tf = scala.collection.mutable.HashMap[(String, Long), Long]()
    docs.foreach { case (id, text) =>
      Option(text).getOrElse("").toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)
        .foreach(w => tf((w, id)) = tf.getOrElse((w, id), 0L) + 1L)
    }
    val expected = tf.toSeq.groupBy(_._1._1).map { case (term, rows) =>
      val ps = rows.map { case ((_, id), c) => (id, c) }.sortBy(_._1)
      val top = ps.minBy { case (id, c) => (-c, id) }
      term -> ((ps.size.toLong, ps.map(_._2).sum, top._1, top._2,
        md5hex(ps.map { case (id, c) => s"$id:$c" }.mkString(","))))
    }

    val got = Retrieval.q156PostingsBuild(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap

    assert(got.keySet === expected.keySet)
    got.foreach { case (term, v) =>
      assert(v === expected(term), s"term '$term' diverged")
    }
  }

  test("a common word's df spans most of the corpus; hapaxes exist") {
    val spark = TestSpark.spark
    val rows = Retrieval.q156PostingsBuild(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet").count()
    assert(rows.values.max <= n)
    assert(rows.values.max > n / 2, "the vocabulary's head is corpus-wide")
  }
}
