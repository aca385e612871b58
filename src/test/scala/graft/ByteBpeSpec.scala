package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.functions.ByteBpeEval

/** Byte-level BPE (q123): training must replay the classic algorithm
  * over the BYTE alphabet (hex-pair symbols), the pre-tokenizer must
  * split the GPT-2-ish classes, and encoding must have the byte-fallback
  * property — any string, any script, representable with zero OOV.
  */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)

  test("textbook fixture trains byte merges in hex-symbol space") {
    import spark.implicits._
    // pre-tokens of "aaab aaab cab": ["aaab", " aaab", " cab"]
    // (a=61 b=62 c=63 space=20). Pair counts: (61,61)=4, (61,62)=3,
    // (20,61)=2, (20,63)=1, (63,61)=1 -> round 1 merges (61,61),
    // round 2 (61,62) at 3 (beats (20,61)=2 after greedy re-count)
    val docs = Seq((1L, "aaab aaab cab")).toDF("doc_id", "text")
    val got = table(Bpe.byteBpeTrainOn(docs, 2))
    assert(got === Seq(
      (1, "61", "61", "6161", 4L),
      (2, "61", "62", "6162", 3L)))
  }

  test("pre-tokenizer splits the stated classes and keeps case") {
    val m = java.util.regex.Pattern.compile(ByteBpeEval.PreTok)
      .matcher("Hello, World!  42x\n\tfin")
    val toks = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toList
    assert(toks === List("Hello", ",", " World", "!", "  ", "42", "x",
      "\n\t", "fin"))
    // every byte of the input is covered — nothing falls between tokens
    assert(toks.mkString === "Hello, World!  42x\n\tfin")
  }

  test("q123 counts equal an independent imperative replay on a planted frame") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaab aaab cab"),
      (2L, "héllo wörld"),
      (3L, "日本語"),
      (4L, "CASE case"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // train exactly as the operator does, then score with the kernel
    val flat = Bpe.byteBpeTrainOn(docs, 10).collect()
      .sortBy(_.getInt(0)).flatMap(r => Seq(r.getString(1), r.getString(2)))
    val got = docs.select(col("doc_id"),
      graft.functions.BpeOps.byteBpeStats(col("text"), flat.toSeq).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap

    // independent replay: regex pre-tokenize, UTF-8 bytes, rank-order
    // leftmost-greedy merges — plain Scala, no kernel code
    def replay(text: String): (Long, Long) = {
      val m = java.util.regex.Pattern.compile(ByteBpeEval.PreTok).matcher(text)
      var nt = 0L; var total = 0L
      while (m.find()) {
        nt += 1
        var syms = m.group().getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").toList
        var mi = 0
        while (mi + 1 < flat.length && syms.length > 1) {
          val (l, r) = (flat(mi), flat(mi + 1))
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: t if a == l && b == r => out += (a + b); rest = t
            case a :: t => out += a; rest = t
            case Nil => ()
          }
          syms = out.toList
          mi += 2
        }
        total += syms.length
      }
      (nt, total)
    }
    for (id <- 1L to 4L) {
      val text = docs.where(col("doc_id") === id).head().getString(1)
      val (nt, tot) = replay(text)
      assert(got(id) === Seq(nt, tot), s"doc $id")
      // byte-fallback bound: never more symbols than bytes, never zero
      assert(tot >= 1 && tot <= text.getBytes("UTF-8").length)
    }
    assert(got(5L) === null) // null text -> null kernel, coalesced by q123
  }

  test("case is preserved: upper and lower bytes merge independently") {
    import spark.implicits._
    // 'aa' dominates; 'AA' (4141) must not ride the (61,61) merge
    val docs = Seq((1L, "aaaa aaaa AAAA")).toDF("doc_id", "text")
    val flat = Bpe.byteBpeTrainOn(docs, 1).collect()
      .sortBy(_.getInt(0)).flatMap(r => Seq(r.getString(1), r.getString(2)))
    assert(flat.toSeq === Seq("61", "61"))
    val got = docs.select(
      graft.functions.BpeOps.byteBpeStats(col("text"), flat.toSeq).as("s"))
      .head().getSeq[Long](0)
    // pre-tokens: "aaaa", " aaaa", " AAAA" -> after (61,61):
    // [aa,aa] + [20,aa,aa] + [20,41,41,41,41] = 2 + 3 + 5 = 10
    assert(got === Seq(3L, 10L))
  }
}
