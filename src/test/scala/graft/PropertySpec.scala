package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Masking, SyntheticEmail}
import graft.sources.CursorOffset

/** Property-based invariants for the expression library and the streaming
  * offset codec (things a fixture table can't exhaust). Plain ScalaCheck
  * generators sampled under fixed seeds — the scalatest bridge artifact
  * isn't available offline, and fixed seeds make failures reproducible.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def evalMask(inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("email").select(Masking.maskEmail(col("email"))).as[String].collect().toSeq
  }

  test("maskEmail never leaks the local part beyond its first character") {
    val emailGen = for {
      local <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
      domain <- Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString + ".com")
    } yield s"$local@$domain"
    val inputs = samples(emailGen, 60)
    assert(inputs.size >= 50)
    inputs.zip(evalMask(inputs)).foreach { case (in, out) =>
      val local = in.takeWhile(_ != '@')
      assert(out === local.head + "***@" + in.dropWhile(_ != '@').tail)
      assert(!out.contains(local), s"local part leaked: $in -> $out")
    }
  }

  test("maskEmail collapses any @-free string to the constant marker") {
    val inputs = samples(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString), 60)
    assert(evalMask(inputs).forall(_ === "***"))
  }

  test("syntheticEmail shape holds for arbitrary printable names") {
    import spark.implicits._
    val names = samples(Gen.asciiPrintableStr.suchThat(_.nonEmpty), 60)
    val out = names.toDF("name")
      .select(SyntheticEmail.syntheticEmail(col("name"))).as[String].collect()
    assert(out.length === names.length)
    assert(out.forall(_.matches("user_[0-9a-f]{10}@example\\.com")))
  }

  test("CursorOffset json round-trips for arbitrary cursors") {
    val gen = for {
      pages <- Gen.chooseNum(0L, Long.MaxValue)
      cursor <- Gen.option(Gen.asciiPrintableStr)
    } yield CursorOffset(pages, cursor)
    samples(gen, 200).foreach { o =>
      assert(CursorOffset.fromJson(o.json()) === o)
    }
  }

  test("canonicalUrl is idempotent over arbitrary messy URLs") {
    // the frontier invariant: a canonical key re-canonicalizes to itself,
    // or the seen-set could disagree with its own entries
    import spark.implicits._
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "Https")
      host <- Gen.oneOf("A.Example.COM", "site7.example.com", "X.co.uk")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/a/b/", "/x//", "/p%20q")
      query <- Gen.oneOf("", "?utm_source=a", "?id=1&utm_x=2", "?b=2&a=1", "?fbclid=z")
      frag <- Gen.oneOf("", "#f", "#/deep")
    } yield s"$scheme://$host$port$path$query$frag"
    val urls = samples(gen, 300).distinct
    val once = urls.toDF("u")
      .select(graft.operators.Text.canonicalUrl(col("u")).as("c"))
      .as[String].collect()
    val twice = once.toSeq.toDF("u")
      .select(graft.operators.Text.canonicalUrl(col("u")).as("c"))
      .as[String].collect()
    assert(once.toSeq === twice.toSeq, "canonicalization is not idempotent")
  }
}
