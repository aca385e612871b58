package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Envelope
import graft.streaming.Landing

/** End-to-end landing plane: NDJSON lines → partitioned parquet with
  * record/record_metadata, `_LOAD_ID` dedup, DLQ routing, batch ≡ stream,
  * and the curated views + role-gated masking + KPI on top
  * (reference infra/main.tf:146-200, sql/03_tables_raw.sql,
  * sql/04_views_curated.sql, sql/05_masking_policy.sql).
  */
class LandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixedIngest = to_timestamp(lit("2024-01-01 12:00:30"))

  /** Three wire lines via the real envelope pipeline (one explicit email,
    * one synthetic), plus a deliberate duplicate load id and one garbage
    * line.
    */
  private def fixtureLines: Seq[String] = {
    val raws = Seq(
      ("""{"id":"W1","title":"T1","email":"alice@ex.com"}""", "L1"),
      ("""{"id":"W2","title":"T2","authorships":[{"author":{"display_name":"Bob"}}]}""", "L2"))
    val wires = raws.map { case (json, lid) =>
      Envelope.wire(Envelope.toEnvelope(
        Envelope.parseWorks(Seq(json).toDF("value"), "value"),
        "openalex", to_timestamp(lit("2024-01-01 12:00:00")),
        to_timestamp(lit("2024-01-01 12:00:10")), lit(lid)))
        .as[String].head()
    }
    wires ++ Seq(wires.head, "this is not json")
  }

  test("landBatch: dedups _LOAD_ID, routes garbage to DLQ, partitions by date") {
    val base = Files.createTempDirectory("graft_landing").toString
    val (landDir, dlqDir) = (s"$base/landing", s"$base/dlq")
    Landing.landBatch(fixtureLines.toDF("value"), landDir, Some(dlqDir), fixedIngest)

    val landed = spark.read.parquet(landDir)
    assert(landed.count() === 2) // duplicate L1 collapsed
    assert(landed.columns.toSet ===
      Set("record", "record_metadata", "_load_id", "landed_date"))
    assert(landed.select("_load_id").as[String].collect().sorted === Array("L1", "L2"))
    // metadata timestamp present and typed
    val it = landed.select(col("record_metadata.IngestionTime").cast("string"))
      .as[String].head()
    assert(it === "2024-01-01 12:00:30")
    // physical date partition exists on disk (partition pruning is real)
    assert(new java.io.File(landDir).list().exists(_.startsWith("landed_date=2024-01-01")))

    val dlq = spark.read.parquet(dlqDir)
    assert(dlq.count() === 1)
    assert(dlq.select("record").as[String].head() === "this is not json")
  }

  test("stream landing through foreachBatch lands the same records as batch") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$in/batch1.ndjson"),
      fixtureLines.mkString("\n").getBytes("UTF-8"))
    val q = Landing.landStream(spark, in, s"$base/landing", s"$base/ckpt", Some(s"$base/dlq"))
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$base/landing")
      .select("record", "_load_id")

    val batchBase = Files.createTempDirectory("graft_batch").toString
    Landing.landBatch(fixtureLines.toDF("value"), s"$batchBase/landing", None, fixedIngest)
    val batched = spark.read.parquet(s"$batchBase/landing")
      .select("record", "_load_id")

    assert(streamed.collect().toSet === batched.collect().toSet)
  }

  test("curated views: analyst sees masked email, privileged role sees clear; KPI") {
    val base = Files.createTempDirectory("graft_views").toString
    Landing.landBatch(fixtureLines.toDF("value"), s"$base/landing", None, fixedIngest)

    // analyst (default role)
    spark.conf.unset(Bootstrap.RoleConf)
    spark.conf.set(Bootstrap.AnchorConf, "2024-01-01 12:05:00")
    Bootstrap.initLanding(spark, s"$base/landing")
    val analyst = spark.sql(
      "SELECT work_id, email, latency_seconds FROM vw_works ORDER BY work_id")
      .collect()
    assert(analyst.length === 2)
    assert(analyst(0).getAs[String]("email") === "a***@ex.com")
    // synthetic email masked too: first char + *** + @domain
    assert(analyst(1).getAs[String]("email") === "u***@example.com")
    // latency = landed(12:00:30) - event(12:00:00)
    assert(analyst.forall(_.getAs[Long]("latency_seconds") === 30L))

    val kpi = spark.sql("SELECT * FROM vw_latency").head()
    assert(kpi.getAs[Long]("samples_5m") === 2L)
    assert(kpi.getAs[Double]("avg_sec_5m") === 30.0)

    // privileged role: same query, clear emails
    spark.conf.set(Bootstrap.RoleConf, "R_TRANSFORM")
    Bootstrap.createCuratedViews(spark)
    val priv = spark.sql("SELECT email FROM vw_works ORDER BY work_id")
      .as[String].collect()
    assert(priv(0) === "alice@ex.com")
    assert(priv(1) === "user_da6645f6e2@example.com") // sha1("Bob") synthetic
    spark.conf.unset(Bootstrap.RoleConf)
    spark.conf.unset(Bootstrap.AnchorConf)
  }

  test("variant-based curated view agrees column-for-column with the JSON-path view") {
    val base = Files.createTempDirectory("graft_variant").toString
    Landing.landBatch(fixtureLines.toDF("value"), s"$base/landing", None, fixedIngest)
    spark.conf.set(Bootstrap.AnchorConf, "2024-01-01 12:05:00")
    Bootstrap.initLanding(spark, s"$base/landing")
    val cols = "work_id, doi, title, publication_year, venue, primary_author, " +
      "email, event_ts, ingest_ts, source, load_id, latency_seconds"
    val jsonPath = spark.sql(s"SELECT $cols FROM vw_works").collect().toSet
    val variant = spark.sql(s"SELECT $cols FROM vw_works_v").collect().toSet
    assert(variant === jsonPath)
    assert(jsonPath.nonEmpty)
    spark.conf.unset(Bootstrap.AnchorConf)
  }

  test("cross-delivery redelivery dedups in the curated view (ST5)") {
    // the same wire line landed by two separate deliveries (e.g. a retry
    // after an ack was lost) → two physical rows, one logical record
    val base = Files.createTempDirectory("graft_redeliver").toString
    val one = fixtureLines.head
    Landing.landBatch(Seq(one).toDF("value"), s"$base/landing", None,
      to_timestamp(lit("2024-01-01 12:00:30")))
    Landing.landBatch(Seq(one).toDF("value"), s"$base/landing", None,
      to_timestamp(lit("2024-01-01 12:01:30")))
    assert(spark.read.parquet(s"$base/landing").count() === 2) // at-least-once at rest
    spark.conf.set(Bootstrap.AnchorConf, "2024-01-01 12:05:00")
    Bootstrap.initLanding(spark, s"$base/landing")
    val rows = spark.sql("SELECT load_id, landed_ts FROM vw_works").collect()
    assert(rows.length === 1) // first landing wins
    assert(rows.head.getTimestamp(1).toString.startsWith("2024-01-01 12:00:30"))
    spark.conf.unset(Bootstrap.AnchorConf)
  }

  test("SqlScriptRunner applies statements in file-name order; dry-run executes nothing") {
    val scripts = Seq(
      "02_second.sql" -> "CREATE OR REPLACE TEMP VIEW ssr_b AS SELECT * FROM ssr_a",
      "01_first.sql" -> "CREATE OR REPLACE TEMP VIEW ssr_a AS SELECT 1 AS x; ")
    val dry = SqlScriptRunner.run(spark, scripts, dryRun = true)
    assert(dry.head.contains("ssr_a")) // ordered by name despite input order
    assert(!spark.catalog.tableExists("ssr_a"))
    SqlScriptRunner.run(spark, scripts)
    assert(spark.sql("SELECT x FROM ssr_b").as[Int].head() === 1)
  }
}
