package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.IngestConfig

/** Config validation vectors (reference tests/unit/test_config.py:5-14:
  * missing required env raises; defaults apply otherwise).
  */
class IngestConfigSpec extends AnyFunSuite {
  private val good = Map("GRAFT_SOURCE" -> "openalex", "GRAFT_MAILTO" -> "ops@example.com")

  test("defaults apply when only required keys are set") {
    val c = IngestConfig.fromEnv(good)
    assert(c === IngestConfig("openalex", "ops@example.com", 50, 50, 2, None))
  }

  test("missing required env raises naming the key") {
    val e = intercept[IllegalArgumentException](IngestConfig.fromEnv(good - "GRAFT_MAILTO"))
    assert(e.getMessage.contains("GRAFT_MAILTO"))
  }

  test("unparseable numeric env raises naming the key and value") {
    val e = intercept[IllegalArgumentException](
      IngestConfig.fromEnv(good + ("GRAFT_BATCH_SIZE" -> "lots")))
    assert(e.getMessage.contains("GRAFT_BATCH_SIZE") && e.getMessage.contains("lots"))
  }

  test("out-of-range knobs fail construction") {
    intercept[IllegalArgumentException](
      IngestConfig.fromEnv(good + ("GRAFT_BATCH_SIZE" -> "501"))) // over the put cap
    intercept[IllegalArgumentException](
      IngestConfig.fromEnv(good + ("GRAFT_MAILTO" -> "not-an-email")))
  }

  test("maxPages parses optionally") {
    assert(IngestConfig.fromEnv(good + ("GRAFT_MAX_PAGES" -> "7")).maxPages === Some(7))
  }

  test("config drives the producer loop and the cursor source") {
    val spark = TestSpark.spark
    val cfg = IngestConfig.fromEnv(good +
      ("GRAFT_BATCH_SIZE" -> "3", "GRAFT_MAX_PAGES" -> "2", "GRAFT_SLEEP_SECONDS" -> "0"))
    val src = graft.ingest.CursorSource.fromConfig(
      c => graft.ingest.Got(graft.ingest.Page(Seq(s"""{"id":"$c"}"""), Some(c + "+"))), cfg)
    var sunk = 0
    val totals = graft.ingest.Producer.run(spark, src.records, cfg,
      sink = df => { sunk += 1; df.count(): Unit })
    assert(totals === graft.ingest.Producer.Totals(2, 0, 1)) // maxPages capped at 2
    assert(sunk === 1)
  }
}
