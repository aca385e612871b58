package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** The q122 model-based quality classifier, gated on PLANTED classes:
  * the oracle proves the arithmetic (train+score replay in DuckDB); this
  * spec proves the model DISCRIMINATES — including where the rule gate
  * that labeled it cannot. Training is in-corpus (the q85 discipline),
  * so every fixture class participates in the counts it is scored by.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // natural-language-ish vocabulary: stopword-rich, mean word length
  // inside the q65 [3, 4.6] band, fully alphabetic
  private val goodWords = Seq("the", "be", "to", "of", "and", "that",
    "have", "time", "people", "work", "year", "day", "thing", "life",
    "world", "hand", "part", "place", "week", "case")
  // gibberish: long alnum blobs — fails r_wlen and r_stop
  private val badWords = Seq("zxqv9k2m8w4h3", "qqqwwweee4442",
    "mnbvcxz987123", "a1b2c3d4e5f6g", "zzzyyyxxx0001", "kkjjhhgg55443")

  private def sentence(ws: Seq[String], n: Int, rot: Int): String =
    (0 until n).map(i => ws((i * 7 + rot) % ws.size)).mkString(" ")

  private lazy val frame = {
    // 60 good (keep=1: 45 fluent words), 60 bad (keep=0: 50-blob docs),
    // 20 short-fluent (keep=0 ONLY because r_len fails at 20 words),
    // 20 long-gibberish (keep=0 for every content reason)
    val good = (0 until 60).map(i => (i.toLong, sentence(goodWords, 45, i)))
    val bad = (60 until 120).map(i => (i.toLong, sentence(badWords, 50, i)))
    val shortFluent =
      (120 until 140).map(i => (i.toLong, sentence(goodWords, 20, i)))
    val longGibberish =
      (140 until 160).map(i => (i.toLong, sentence(badWords, 80, i)))
    (good ++ bad ++ shortFluent ++ longGibberish)
      .toDF("doc_id", "text")
  }

  private lazy val scored = Classifier.classifierOn(frame).collect()
    .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(3), r.getInt(4))))
    .toMap

  test("labels land as planted: good keeps, everything else drops") {
    assert((0L until 60L).forall(scored(_)._1 === 1))
    assert((60L until 160L).forall(scored(_)._1 === 0))
  }

  test("predictions agree with the rule gate on the unambiguous classes") {
    val agree = (0L until 120L).count(id => scored(id)._3 === scored(id)._1)
    assert(agree >= 114, s"agreement $agree/120 < 95%")
  }

  test("the model sees through the rule gate's length blindness") {
    // short-fluent docs are keep=0 ONLY by r_len; their n-grams live in
    // kept documents, so the learned scorer must rank every one of them
    // above every long-gibberish doc — the discrimination a rule gate
    // cannot express, and the reason to train a model at all
    val fluent = (120L until 140L).map(scored(_)._2)
    val gibberish = (140L until 160L).map(scored(_)._2)
    assert(fluent.min > gibberish.max,
      s"fluent min ${fluent.min} !> gibberish max ${gibberish.max}")
  }

  test("feature count is exactly unigrams + bigrams") {
    // doc 0 has 45 words -> 45 + 44 = 89 instances
    val r = Classifier.classifierOn(frame)
      .where(col("doc_id") === 0).select("n_feats").head()
    assert(r.getLong(0) === 89L)
  }

  test("scoring stage is a narrow map: constant-table kernel, no join") {
    val df = Classifier.classifierOn(frame)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"scoring stage joined:\n$p")
    assert(p.contains("graft_nb_score"), s"kernel missing from plan:\n$p")
  }
}
