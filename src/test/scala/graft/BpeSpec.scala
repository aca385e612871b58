package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE training semantics: the merge table must equal the classic
  * algorithm's output — pinned against a hand-derivable textbook fixture,
  * an independent imperative replay on the real corpus, and the
  * leftmost-greedy application rule.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)

  test("textbook fixture trains the classic merge sequence") {
    import spark.implicits._
    // Sennrich's running example (marker-free formulation):
    // low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = table(Bpe.bpeTrainOn(docs, 5))
    // hand-derived: es/st tie at 9 -> (e,s) lexicographically; then est 9;
    // lo/ow tie at 7 -> (l,o); low 7; then the 6-tie resolves to (e,w)
    val expected = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L))
    assert(got === expected)
  }

  test("merge application is leftmost-greedy and exhaustion stops early") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = table(Bpe.bpeTrainOn(docs, 5))
    // round 1: 3 adjacent (a,a) pairs, greedy application yields [aa, aa]
    // (never [aa, a, a]); round 2 merges the remaining pair; then no
    // pairs remain and the loop stops before the requested 5 merges
    assert(got === Seq((1, "a", "a", "aa", 3L), (2, "aa", "aa", "aaaa", 1L)))
  }

  test("local merge rounds equal the distributed loop on fixture and corpus") {
    // r18: vocabularies within spark.graft.bpe.localVocabMax train
    // in-driver; the merge table must be identical to the distributed
    // loop's (same counts, same UTF-8 tie order, same greedy fold)
    import spark.implicits._
    def distributed[T](body: => T): T = {
      spark.conf.set("spark.graft.bpe.localVocabMax", "0")
      try body finally spark.conf.unset("spark.graft.bpe.localVocabMax")
    }
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    assert(table(Bpe.bpeTrainOn(docs, 5)) ===
      distributed(table(Bpe.bpeTrainOn(docs, 5))))
    assert(table(Bpe.q85BpeTrain(spark, TestSpark.Sf0001)) ===
      distributed(table(Bpe.q85BpeTrain(spark, TestSpark.Sf0001))))
    // byte-level rung too (hex-pair alphabet)
    assert(table(Bpe.byteBpeTrainOn(docs, 6)) ===
      distributed(table(Bpe.byteBpeTrainOn(docs, 6))))
  }

  test("operator matches an independent imperative replay on the corpus") {
    import spark.implicits._
    val freqs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextOps.words(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val got = table(Bpe.q85BpeTrain(spark, TestSpark.Sf0001))
    assert(got.length === 10)
    assert(got === replay(freqs, 10))
  }

  test("encode kernel reproduces the training-end vocabulary word-by-word") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val flat = Bpe.trainedMerges(docs, 10)
    // training-end state via the independent replay
    val freqs = docs
      .select(explode(graft.functions.TextOps.words(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val endState = finalVocab(freqs, replay(freqs, 10).map(m => (m._2, m._3)))
    // every distinct corpus word must encode to its trained symbol count
    val wordsDf = freqs.keys.toSeq.sorted.toDF("text")
    val got = wordsDf.select(col("text"),
      graft.functions.BpeOps.bpeTokens(col("text"), flat).as("n"))
      .as[(String, Long)].collect().toMap
    freqs.keys.foreach { w =>
      assert(got(w) === endState(w.map(_.toString).toVector).toLong,
        s"word '$w' encoded to ${got(w)}")
    }
    // and the q86 contract query agrees with a direct per-doc recount
    val q86 = Bpe.q86BpeTokens(spark, TestSpark.Sf0001)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    val direct = docs.select(
      graft.functions.BpeOps.bpeTokens(col("text"), flat).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(q86 === direct && q86 > 0)
  }

  test("encode kernel: unseen words, rank order, degenerate inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // textbook merges: es, est, lo, low, ew (from the fixture corpus) —
    // "lowest" was never trained, yet encodes [low, est] by rank order
    val merges = Seq("e", "s", "es", "t", "l", "o", "lo", "w", "e", "w")
    def enc(t: String): Long = spark.range(1)
      .select(graft.functions.BpeOps.bpeTokens(lit(t), merges).as("n"))
      .head.getLong(0)
    assert(enc("lowest") === 2L)      // l o w e s t -> lo w est -> low est
    assert(enc("zzqx") === 4L)        // nothing applies: one symbol per char
    assert(enc("LOWEST lowest") === 4L) // engine lowercase + tokenizer split
    assert(enc("") === 0L)
    assert(enc("?!.") === 0L)         // delimiter-only text has no words
    val n = spark.range(1)
      .select(graft.functions.BpeOps.bpeTokens(
        lit(null).cast("string"), merges).as("n")).head
    assert(n.isNullAt(0))
    // an odd-length flattened table is a dropped merge half — it must
    // fail loudly at plan time, never silently mis-encode
    assertThrows[IllegalArgumentException] {
      graft.functions.BpeOps.bpeTokens(lit("x"), Seq("e", "s", "es"))
    }
  }

  /** The vocabulary state after applying `merges` in order — symbol count
    * per word, via the same index-walk greedy rule as [[replay]].
    */
  private def finalVocab(freqs: Map[String, Long],
                         merges: Seq[(String, String)]): Map[Vector[String], Int] = {
    var vocab = freqs.keys.map(w => w.map(_.toString).toVector).toSet
    val out = scala.collection.mutable.Map[Vector[String], Int]()
    vocab.foreach { syms0 =>
      var syms = syms0
      merges.foreach { case (l, r) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            buf += (l + r); i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.result()
      }
      out(syms0) = syms.length
    }
    out.toMap
  }

  /** Plain single-machine BPE, written independently of the operator
    * (index-walk greedy merge instead of the fold, mutable counting).
    */
  private def replay(freqs: Map[String, Long],
                     k: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      freqs.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (syms, ws) => syms -> ws.values.sum }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    var go = true
    while (round <= k && go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((round, l, r, l + r, c))
        vocab = vocab.toSeq.map { case (syms, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              buf += (l + r); i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), f)
        }.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sum }
        round += 1
      }
    }
    out.result()
  }
}
