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

  test("graft_nfc is idempotent and length-stable-or-shrinking") {
    // NFC is a canonical form: normalizing twice must be a no-op, and
    // composition can only ever SHORTEN a string (code points merge,
    // never split, under canonical composition of these generators)
    import graft.functions.UnicodeEval
    import org.apache.spark.unsafe.types.UTF8String
    val piece = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(8)),
      Gen.oneOf("e\u0301", "A\u030A", "o\u0308", "\u00E9", "n\u0303",
        "\u0301", "\uFEFF", "x\u200By"))
    val gen = Gen.listOfN(6, piece).map(_.mkString)
    samples(gen, 200).foreach { s =>
      val once = UnicodeEval.nfc(UTF8String.fromString(s)).toString
      val twice = UnicodeEval.nfc(UTF8String.fromString(once)).toString
      assert(once === twice, s"nfc not idempotent on ${s.map(_.toInt)}")
      assert(once.codePointCount(0, once.length) <=
        s.codePointCount(0, s.length), s"nfc grew ${s.map(_.toInt)}")
    }
  }

  test("warc record serialization round-trips arbitrary payload bytes") {
    // the writer's Content-Length must count BYTES and survive payloads
    // that embed the record separator, high bytes, and emptiness — the
    // walk must give back the exact payload for every generated case
    import graft.functions.WarcEval
    val payloadGen = Gen.oneOf(
      Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray),
      Gen.const("body\r\n\r\ntrap".getBytes("UTF-8")),
      Gen.const(Array.emptyByteArray),
      Gen.const("\r\n\r\n\r\n\r\n".getBytes("UTF-8")))
    samples(payloadGen, 120).foreach { pay =>
      val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://p.example/x\r\n" +
        s"Content-Length: ${pay.length}\r\n\r\n").getBytes("UTF-8")
      val rec = head ++ pay ++ "\r\n\r\n".getBytes("UTF-8")
      val offs = WarcEval.offsets(rec)
      assert(offs != null, "walk refused a well-formed record")
      val arr = offs.toLongArray()
      assert(arr.last === 2L, s"verdict ${arr.last}: 1 record, untruncated")
      val back = WarcEval.payload(rec, arr(0).toInt)
      assert(back != null && java.util.Arrays.equals(back, pay),
        s"payload drifted at length ${pay.length}")
    }
  }

  test("gzip FNAME survives arbitrary names with NULs stripped") {
    // the encoder strips embedded NULs (a verbatim NUL ends the
    // NUL-terminated field early and corrupts the member); for every
    // generated name the member must list the stripped name AND decode
    import graft.functions.GzipEval
    val nameGen = Gen.listOf(Gen.frequency(
      (9, Gen.choose(1, 127)), (2, Gen.const(0))))
      .map(_.map(_.toChar).mkString)
    val pay = "payload".getBytes("UTF-8")
    samples(nameGen, 120).foreach { name =>
      val member = GzipEval.gzip(pay, name.getBytes("ISO-8859-1"))
      val expect = name.filter(_ != '\u0000')
      val listed = Option(GzipEval.gzipName(member))
        .map(b => new String(b, "ISO-8859-1")).getOrElse("")
      assert(listed === expect, s"FNAME drifted for ${name.map(_.toInt)}")
      val back = GzipEval.gunzip(member)
      assert(back != null && java.util.Arrays.equals(back, pay),
        s"member undecodable for name ${name.map(_.toInt)}")
    }
  }
}
