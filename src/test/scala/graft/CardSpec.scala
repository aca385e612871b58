package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CardEval

/** The Luhn card scan, anchored on the INDUSTRY test number (Visa's
  * published 4111111111111111 — an external constant no shared
  * misunderstanding can produce) plus boundary-guard and
  * evidence-preservation drills.
  */
class CardSpec extends AnyFunSuite {

  test("the industry test number validates; off-by-one fails") {
    assert(CardEval.luhnValid("4111111111111111"))
    assert(!CardEval.luhnValid("4111111111111112"))
    // the other canonical test PANs
    assert(CardEval.luhnValid("5500005555555559")) // published MC test
    assert(!CardEval.luhnValid("1234567812345678"))
  }

  test("digit boundaries: a 16-digit window in a longer run is no card") {
    assert(CardEval.counts("pay 4111111111111111 now") === (1L << 8 | 1L))
    assert(CardEval.counts("id 41111111111111112345 x") === 0L)
    assert(CardEval.counts("x94111111111111111 y") === 0L)
  }

  test("separators: dashed and spaced layouts validate the same digits") {
    assert(CardEval.counts("4111-1111-1111-1111") === (1L << 8 | 1L))
    assert(CardEval.counts("4111 1111 1111 1111") === (1L << 8 | 1L))
    // mixed separators are still one candidate
    assert(CardEval.counts("4111-1111 1111-1111") === (1L << 8 | 1L))
  }

  test("redaction: valid cards go, invalid candidates stay as evidence") {
    assert(CardEval.redact("a 4111111111111111 b") === "a [CARD] b")
    assert(CardEval.redact("a 4111-1111-1111-1111 b") === "a [CARD] b")
    val invalid = "a 4111111111111112 b"
    assert(CardEval.redact(invalid) === invalid)
    assert(CardEval.redact("no digits here") === "no digits here")
  }

  test("two cards in one text both redact") {
    val s = "x 4111111111111111 y 5500005555555559 z"
    assert(CardEval.redact(s) === "x [CARD] y [CARD] z")
    assert(CardEval.counts(s) === (2L << 8 | 2L))
  }
}
