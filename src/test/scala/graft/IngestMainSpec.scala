package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{IngestConfig, IngestMain}

/** The composition root: flag parsing, env/flag layering, and the stubbed
  * no-network pipeline end-to-end (dry-run counts; real run lands parquet).
  */
class IngestMainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val envCfg = IngestConfig(source = "openalex", mailto = "ops@example.com")

  test("flag parsing: full set, legacy run alias, loud unknown flag") {
    val o = IngestMain.parse(Seq("run", "--per-page", "7", "--max-pages", "3",
      "--batch-size", "10", "--batch-sleep", "0", "--dry-run",
      "--stub-pages", "3", "--landing-dir", "/tmp/x", "--dlq-dir", "/tmp/d",
      "--updated-since", "2024-01-01", "--base-url", "http://example.test"))
    assert(o.perPage === Some(7) && o.maxPages === Some(3) && o.dryRun)
    assert(o.stubPages === Some(3) && o.updatedSince === Some("2024-01-01"))
    val e = intercept[IllegalArgumentException](IngestMain.parse(Seq("--bogus")))
    assert(e.getMessage.contains("--bogus"))
    val e2 = intercept[IllegalArgumentException](
      IngestMain.parse(Seq("--per-page", "lots")))
    assert(e2.getMessage.contains("--per-page"))
  }

  test("flags override env settings and re-validate") {
    val cfg = IngestMain.effectiveConfig(envCfg,
      IngestMain.parse(Seq("--per-page", "7", "--batch-sleep", "0")))
    assert(cfg.perPage === 7 && cfg.sleepSeconds === 0)
    assert(cfg.batchSize === envCfg.batchSize) // untouched knobs survive
    // the copy re-runs the case-class invariants
    intercept[IllegalArgumentException](
      IngestMain.effectiveConfig(envCfg, IngestMain.parse(Seq("--batch-size", "9999"))))
  }

  test("dry-run pulls every stubbed page, counts, and writes nothing") {
    val o = IngestMain.parse(Seq("--dry-run", "--stub-pages", "3",
      "--per-page", "5", "--batch-sleep", "0"))
    val t = IngestMain.run(spark, IngestMain.effectiveConfig(envCfg, o), o)
    assert(t.sent === 15 && t.failed === 0)
  }

  test("stubbed run lands parquet envelopes end-to-end with no network") {
    val base = java.nio.file.Files.createTempDirectory("ingest_main").toString
    val o = IngestMain.parse(Seq("--stub-pages", "4", "--per-page", "5",
      "--batch-size", "8", "--batch-sleep", "0",
      "--landing-dir", s"$base/landing", "--dlq-dir", s"$base/dlq"))
    val t = IngestMain.run(spark, IngestMain.effectiveConfig(envCfg, o), o)
    assert(t.sent === 20 && t.failed === 0 && t.batches === 3) // ceil(20/8)
    val landed = spark.read.parquet(s"$base/landing")
    assert(landed.count() === 20)
    // every record got a distinct load id and the landing metadata shape
    assert(landed.select("_load_id").distinct().count() === 20)
    assert(landed.columns.toSet ===
      Set("record", "record_metadata", "_load_id", "landed_date"))
    // the wire record round-trips the stubbed titles
    import org.apache.spark.sql.functions._
    assert(landed.filter(col("record").contains("Stub work")).count() === 20)
  }

  test("max-pages caps the pull before the stub is exhausted") {
    val o = IngestMain.parse(Seq("--dry-run", "--stub-pages", "10",
      "--per-page", "5", "--max-pages", "2", "--batch-sleep", "0"))
    val t = IngestMain.run(spark, IngestMain.effectiveConfig(envCfg, o), o)
    assert(t.sent === 10)
  }
}
