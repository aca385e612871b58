package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Masking, SyntheticEmail}
import graft.functions.TextOps.occurrences

/** Expression-level vectors from FIXTURES.md A4/A5 (reference
  * sql/05_masking_policy.sql:10-16 and ingestion/utils.py:8-11,
  * tests/unit/test_utils.py:4-14).
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("maskEmail matches the reference policy vectors (A5)") {
    val out = Seq(
      Some("alice@ex.com"), Some("no-at-sign"), None, Some("@lead.com"))
      .toDF("email")
      .select(Masking.maskEmail(col("email")).as("masked"))
      .as[Option[String]].collect()
    assert(out(0).contains("a***@ex.com"))
    assert(out(1).contains("***"))
    assert(out(2).isEmpty) // NULL -> NULL
    // '@' at position 1: first char is '@' itself, suffix from '@'
    assert(out(3).contains("@***@lead.com"))
  }

  test("privileged roles set matches the reference policy") {
    assert(Masking.PrivilegedRoles ===
      Set("ACCOUNTADMIN", "R_TRANSFORM", "R_INGEST"))
  }

  test("syntheticEmail matches Python hashlib.sha1 vectors (A4)") {
    val out = Seq(Some("Alice Smith"), None, Some("Bob")).toDF("name")
      .select(SyntheticEmail.syntheticEmail(col("name")).as("e"))
      .as[String].collect()
    // hashlib.sha1(b"Alice Smith").hexdigest()[:10] == "99b060e16d"
    assert(out(0) === "user_99b060e16d@example.com")
    // None -> sha1(b"unknown")[:10] == "50d8b4a941"
    assert(out(1) === "user_50d8b4a941@example.com")
    assert(out(2) === "user_da6645f6e2@example.com")
  }

  test("syntheticEmail is deterministic and honors domain override") {
    val df = Seq("Alice Smith").toDF("name")
    val a = df.select(SyntheticEmail.syntheticEmail(col("name"), "corp.io")).as[String].head()
    val b = df.select(SyntheticEmail.syntheticEmail(col("name"), "corp.io")).as[String].head()
    assert(a === b)
    assert(a === "user_99b060e16d@corp.io")
  }

  test("occurrences counts non-overlapping literal matches") {
    val n = Seq(" the cat the hat the ").toDF("s")
      .select(occurrences(col("s"), " the ").as("n"))
      .as[Double].head()
    // positions 0, 8, 16 — each " the " has its own flanking spaces
    assert(n === 3.0)
    val n2 = Seq(" the the x ").toDF("s")
      .select(occurrences(col("s"), " the ").as("n"))
      .as[Double].head()
    // overlapping case: the shared middle space is consumed by the first
    // match, so " the the " counts once — same as the oracle formula
    assert(n2 === 1.0)
  }

  test("Bootstrap.warmKernels touches every codegen'd kernel family") {
    // the warm plan is how a single-query session avoids the cold
    // first-call cost (WarmupProbe: ~2.7-3.3 s shared infra on the first
    // kernel query, ~1 s extra for the fingerprint pipeline, both near
    // steady-state after warming) — a kernel missing here silently
    // re-opens that cost, so pin the coverage by prettyName
    // treeString with an explicit field budget: the default 25-field
    // print elides the tail of the projection ("... N more fields") and
    // would hide exactly the newest kernels this pin exists to catch
    val plan = graft.Bootstrap.warmFrame(spark).queryExecution
      .analyzed.treeString(verbose = false, addSuffix = false,
        maxFields = 200, printOperatorId = false)
    val kernels = Seq(
      "graft_jpeg_dims", "graft_mp4_dims", "graft_bmp_luma",
      "graft_bmp_resize", "graft_wav_fmt", "graft_wav_pcm_stats",
      "graft_y4m_meta", "graft_y4m_frame_luma", "graft_mp4_sample_info",
      "graft_mp4_frame_luma", "graft_warc_meta", "graft_warc_offsets",
      "graft_warc_header_1", "graft_warc_payload",
      "graft_lsh_bits", "graft_dot", "graft_dot_i8", "graft_pq_adc",
      "graft_bpe_tokens", "graft_deflate_len", "graft_nfc",
      "graft_dechunk", "graft_sniff_charset", "graft_decode_charset",
      "graft_jpeg_luma", "graft_jpeg_synth", "graft_webp_luma",
      "graft_vp8_synth", "graft_tiff_luma", "graft_tiff_pixel_synth",
      "graft_zstd_decode_dict")
    kernels.foreach(k =>
      assert(plan.contains(k), s"warm plan does not touch $k"))
    // and it runs: one local 1-row collect, no exceptions
    graft.Bootstrap.warmKernels(spark)
  }

  test("graft_nfc composes canonically and is identity-fast on NFC input") {
    import graft.functions.UnicodeEval
    import org.apache.spark.unsafe.types.UTF8String
    // decomposed sequences compose (e+U+0301 -> U+00E9, A+U+030A -> U+00C5)
    val dec = UTF8String.fromString("cafe\u0301 A\u030A")
    assert(UnicodeEval.nfc(dec).toString === "caf\u00E9 \u00C5")
    // already-NFC input returns the SAME instance -- the quick-check fast
    // path allocates nothing (ASCII is the overwhelming corpus case)
    val ascii = UTF8String.fromString("plain ascii")
    assert(UnicodeEval.nfc(ascii) eq ascii)
    val comp = UTF8String.fromString("caf\u00E9")
    assert(UnicodeEval.nfc(comp) eq comp)
    assert(UnicodeEval.nfc(null) == null)
    // through the column surface (codegen path shares the eval body)
    val out = Seq("e\u0301").toDF("s")
      .select(graft.functions.TextOps.nfc(col("s"))).as[String].head()
    assert(out === "\u00E9")
  }

  test("html entity decode: core table, numerics, one level, pass-through") {
    import graft.functions.HtmlEntityEval.decode
    import org.apache.spark.unsafe.types.UTF8String
    def d(s: String): String = decode(UTF8String.fromString(s)).toString
    assert(d("a &amp; b") === "a & b")
    assert(d("&lt;p&gt;&quot;x&quot;&apos;") === "<p>\"x\"'")
    assert(d("&#65;&#x42;&#x1F600;") === "AB\uD83D\uDE00") // astral plane
    assert(d("&mdash;&eacute;&euro;&nbsp;") === "\u2014\u00E9\u20AC\u00A0")
    // ONE level: the decoded '&' never rescans
    assert(d("&amp;amp;") === "&amp;")
    assert(d("&amp;#65;") === "&#65;")
    // verbatim pass-through: unknown name, no semicolon, bad digits,
    // empty numeric, beyond-Unicode, surrogate, distant semicolon
    for (s <- Seq("&unknown;", "&amp x", "&#xG1;", "&#;", "&#x110000;",
      "&#xD800;", "fish & chips; more"))
      assert(d(s) === s, s)
    // fast path: no '&' returns the same instance
    val plain = UTF8String.fromString("no entities")
    assert(decode(plain) eq plain)
  }
}
