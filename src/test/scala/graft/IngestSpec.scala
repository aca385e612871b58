package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Envelope

/** Envelope pipeline vectors from FIXTURES.md A1/A2 (reference
  * tests/conftest.py:14-23, tests/unit/test_schema.py,
  * tests/unit/test_firehose_client.py:36-39).
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixedTs = to_timestamp(lit("2024-01-01 12:00:00"))

  private val rawA1 =
    """{"id":"W123","doi":"10.1234/abc","title":"A Study on Streams",
      |"publication_year":2024,"host_venue":{"display_name":"VenueX"},
      |"authorships":[{"author":{"display_name":"Alice Smith"}}],
      |"extra_field":"ignored"}""".stripMargin.replace("\n", "")

  private def envelope(json: String) =
    Envelope.toEnvelope(
      Envelope.parseWorks(Seq(json).toDF("value"), "value"),
      source = "openalex", eventTs = fixedTs, ingestTs = fixedTs,
      loadId = lit("L1"))

  test("A1 raw work parses: unknown fields dropped, missing fields NULL") {
    val w = Envelope.parseWorks(Seq(rawA1).toDF("value"), "value").head()
    assert(w.getAs[String]("id") === "W123")
    assert(w.getAs[Int]("publication_year") === 2024)
    assert(!w.schema.fieldNames.contains("extra_field"))
    val sparse = Envelope.parseWorks(Seq("""{"id":"W9"}""").toDF("value"), "value").head()
    assert(sparse.getAs[String]("doi") === null)
  }

  test("A2 wire record: exact compact JSON with _LOAD_ID, synthetic email") {
    val wire = Envelope.wire(envelope(rawA1)).as[String].head()
    assert(wire ===
      """{"id":"W123","doi":"10.1234/abc","title":"A Study on Streams",""" +
        """"publication_year":2024,"host_venue":"VenueX",""" +
        """"primary_author":"Alice Smith",""" +
        """"email":"user_99b060e16d@example.com",""" +
        """"event_ts":"2024-01-01T12:00:00Z","ingest_ts":"2024-01-01T12:00:00Z",""" +
        """"source":"openalex","_LOAD_ID":"L1"}""")
  }

  test("A2 null omission: absent fields are dropped from the wire, not null'd") {
    val wire = Envelope.wire(envelope("""{"id":"W9"}""")).as[String].head()
    assert(!wire.contains("\"doi\""))
    assert(!wire.contains("null"))
    // no author -> synthetic email from "unknown" (sha1 fixture)
    assert(wire.contains("\"email\":\"user_50d8b4a941@example.com\""))
  }

  test("explicit email wins over the synthetic fallback") {
    val raw = """{"id":"W1","email":"x@ex.com"}"""
    val e = envelope(raw).select("email").as[String].head()
    assert(e === "x@ex.com")
  }
}
