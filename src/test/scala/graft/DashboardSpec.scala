package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Envelope
import graft.streaming.Landing

/** The reference's two dashboard queries, verbatim modulo dialect (no
  * warehouse.schema qualifier) — reference app/home.py:142-145 and
  * home.py:201-208. A user of the reference's dashboard can point it at
  * this engine's views without rewriting a column name.
  */
class DashboardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("both dashboard queries run verbatim against the curated views") {
    val base = Files.createTempDirectory("graft_dash").toString
    val lines = (1 to 5).map { i =>
      Envelope.wire(Envelope.toEnvelope(
        Envelope.parseWorks(
          Seq(s"""{"id":"W$i","title":"T$i","authorships":[{"author":{"display_name":"A$i"}}]}""")
            .toDF("value"), "value"),
        "openalex", to_timestamp(lit("2024-01-01 12:00:00")),
        to_timestamp(lit("2024-01-01 12:00:10")), lit(s"L$i"))).as[String].head()
    }
    Landing.landBatch(lines.toDF("value"), s"$base/landing", None,
      to_timestamp(lit(s"2024-01-01 12:00:30")))
    spark.conf.set(Bootstrap.AnchorConf, "2024-01-01 12:05:00")
    Bootstrap.initLanding(spark, s"$base/landing")

    // home.py:142-145, verbatim minus {db}.{sch}.
    val kpi = spark.sql(
      "SELECT AVG_SEC_5M, MIN_SEC_5M, MAX_SEC_5M, SAMPLES_5M, WINDOW_START, WINDOW_END " +
        "FROM VW_LATENCY").head()
    assert(kpi.getAs[Long]("SAMPLES_5M") === 5L)
    assert(kpi.getAs[Double]("AVG_SEC_5M") === 30.0)

    // home.py:201-208, verbatim minus {db}.{sch}. with limit=50
    val rows = spark.sql(
      "SELECT WORK_ID, TITLE, PRIMARY_AUTHOR, PUBLICATION_YEAR, EMAIL, " +
        "EVENT_TS, LANDED_TS, LATENCY_SECONDS " +
        "FROM VW_WORKS ORDER BY LANDED_TS DESC LIMIT 50").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[String]("WORK_ID")).sorted === (1 to 5).map(i => s"W$i"))
    assert(rows.forall(_.getAs[Long]("LATENCY_SECONDS") === 30L))
    spark.conf.unset(Bootstrap.AnchorConf)
  }
}
