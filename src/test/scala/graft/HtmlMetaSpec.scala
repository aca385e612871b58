package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlMetaEval

/** The page-verdict walk, pinned against HAND-SPELLED heads the
  * synthesizer never produces: token lists, the `none` macro,
  * first-wins ties, comment immunity, quote-protected `>`, and
  * every resolution arm.
  */
class HtmlMetaSpec extends AnyFunSuite {

  private val O = "https://ex.example.com"

  private def parse(s: String) = HtmlMetaEval.parse(s.getBytes("UTF-8"), O)

  test("token list parses with free case and whitespace") {
    val v = parse("""<meta name="ROBOTS" content=" NoIndex ,NOFOLLOW ">""")
    assert(v.noindex === 1 && v.nofollow === 1)
  }

  test("the none macro means noindex,nofollow; unknown tokens ignored") {
    assert(parse("""<meta name="robots" content="none">""") ===
      HtmlMetaEval.Verdict(1, 1, null))
    assert(parse("""<meta name="robots" content="noarchive, nosnippet">""") ===
      HtmlMetaEval.Verdict(0, 0, null))
  }

  test("first robots meta wins; later declarations bind nothing") {
    val v = parse(
      """<meta name="robots" content="index"><meta name="robots" content="noindex">""")
    assert(v.noindex === 0)
  }

  test("first canonical wins; comments strip before anything binds") {
    val v = parse(
      "<!-- <link rel=\"canonical\" href=\"https://evil.example/x\"> -->\n" +
        "<link rel=\"canonical\" href=\"https://real.example/y\">\n" +
        "<link rel=\"canonical\" href=\"https://late.example/z\">")
    assert(v.canonical === "https://real.example/y")
  }

  test("resolution ladder: absolute, protocol-relative, root-relative, bare") {
    assert(parse("""<link rel="canonical" href="http://a.example/p">""")
      .canonical === "http://a.example/p")
    assert(parse("""<link rel="canonical" href="//cdn.example/p">""")
      .canonical === "https://cdn.example/p")
    assert(parse("""<link rel="canonical" href="/p.html">""")
      .canonical === s"$O/p.html")
    assert(parse("""<link rel="canonical" href="p.html">""")
      .canonical === s"$O/p.html")
  }

  test("either quote, free attribute order, entity decode, > in values") {
    val v = parse(
      "<link title=\"a>b\" href='/q?x=1&amp;y=2' rel='CANONICAL'>")
    assert(v.canonical === s"$O/q?x=1&y=2")
  }

  test("a meta without name, or a link without rel, binds nothing") {
    assert(parse("""<meta content="noindex"><link href="/x">""") ===
      HtmlMetaEval.Verdict(0, 0, null))
  }

  test("synth classes land on their contract verdicts") {
    def v(id: Long, m: Long) =
      HtmlMetaEval.parse(HtmlMetaEval.synth(id | (m << 40)),
        s"https://site${id % 40}.example.com")
    assert(v(21, 0) === HtmlMetaEval.Verdict(0, 0,
      "https://site21.example.com/p1.html"))
    assert(v(21, 1) === HtmlMetaEval.Verdict(1, 0, null))
    assert(v(21, 2) === HtmlMetaEval.Verdict(0, 1,
      "https://site21.example.com/canon/1"))
    assert(v(21, 3) === HtmlMetaEval.Verdict(0, 0, null))
    assert(v(21, 4) === HtmlMetaEval.Verdict(0, 0,
      "https://site21.example.com/p1.html?ref=a&b"),
      "the commented noindex must bind nothing")
  }
}
