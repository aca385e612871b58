package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Text

/** Q150's stupid-backoff ladder on a HAND-COMPUTED micro-corpus:
  * every path (tri / bi / uni / oov) forced at least once, every
  * surprisal derived by hand from the train-half counts, the
  * half-up micro-unit mean replayed digit for digit.
  *
  * Train half (even ids): doc 0 "a b c a b c", doc 2 "b d".
  *   uni: a=2 b=3 c=2 d=1, N=8
  *   bi:  ab=2 bc=2 ca=1 bd=1; contexts a=2 b=3 c=1
  *   tri: abc=2 bca=1 cab=1; contexts (a,b)=2 (b,c)=1 (c,a)=1
  */
class TrigramBackoffSpec extends AnyFunSuite {

  private def run() = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c a b c"),
      (1L, "a b c a d c"),
      (2L, "b d"),
      (3L, "z z q"),
      (5L, "c b d")).toDF("doc_id", "text")
    Text.trigramBackoffOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("train doc scores all-trigram at zero surprisal") {
    val r = run()(0L)
    // abc (2/2), bca (1/1), cab (1/1), abc (2/2): all p = 1
    assert(r.getLong(2) === 4L && r.getLong(3) === 4L) // n_scored, n_tri
    assert(r.getDouble(7) === 0.0)
  }

  test("held-out doc mixes tri and uni paths with hand surprisals") {
    val r = run()(1L)
    assert(r.getLong(1) === 6L) // n_tokens
    assert(r.getLong(3) === 2L, "abc and bca hit the trigram path")
    assert(r.getLong(4) === 0L)
    assert(r.getLong(5) === 2L, "(c,a,d) and (a,d,c) fall through to uni")
    // s(d) = -ln(0.16 * 1/8) = 3.912023; s(c) = -ln(0.16 * 2/8) = 3.218876
    // mean = floor((2*7130899 + 4) / 8) / 1e6
    assert(r.getDouble(7) === 1.782725)
  }

  test("the bigram rung scores at alpha * c2/k2") {
    val r = run()(5L)
    // (c,b,d): no trigram; bi (b,d)=1 over context b=3: -ln(0.4/3)
    assert(r.getLong(4) === 1L && r.getLong(2) === 1L)
    assert(r.getDouble(7) === 2.014903)
  }

  test("oov counts, never guesses; short docs score nothing") {
    val r = run()
    val oov = r(3L)
    assert(oov.getLong(6) === 1L && oov.getLong(2) === 0L)
    assert(oov.isNullAt(7), "no scored tokens -> no mean")
    val short = r(2L)
    assert(short.getLong(1) === 2L && short.getLong(2) === 0L)
    assert(short.isNullAt(7))
  }
}
