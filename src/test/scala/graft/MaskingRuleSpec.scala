package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Envelope
import graft.streaming.Landing

/** The Catalyst masking rule: ONE clear view definition, per-session role
  * decides masked vs clear at read time — flipping the conf between
  * queries changes the result without recreating any view.
  */
class MaskingRuleSpec extends AnyFunSuite {

  test("rule masks email for analysts and passes it clear for privileged roles") {
    // session with the extension installed (TestSpark's session has none,
    // so build a separate one on the same SparkContext)
    val base = TestSpark.spark // ensure context exists first
    import base.implicits._
    val dir = Files.createTempDirectory("graft_rule").toString
    val lines = Envelope.wire(Envelope.toEnvelope(
      Envelope.parseWorks(Seq(
        """{"id":"W1","email":"alice@ex.com"}""",
        """{"id":"W2","email":"no-at-sign"}""").toDF("value"), "value"),
      "openalex", to_timestamp(lit("2024-01-01 12:00:00")),
      to_timestamp(lit("2024-01-01 12:00:00")), md5(col("id"))))
      .as[String].collect()
    Landing.landBatch(lines.toSeq.toDF("value"), s"$dir/landing", None,
      to_timestamp(lit("2024-01-01 12:00:30")))

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a static conf read from the SparkContext at
    // first-session creation — a later session must install programmatically
    val gated = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Bootstrap.initLanding(gated, s"$dir/landing")

      def emails(): Seq[String] =
        gated.sql("SELECT email FROM vw_works_gated ORDER BY work_id")
          .collect().map(_.getString(0)).toSeq

      // analyst by default: masked at read time
      gated.conf.unset(Bootstrap.RoleConf)
      assert(emails() === Seq("a***@ex.com", "***"))

      // flip role, SAME view: clear
      gated.conf.set(Bootstrap.RoleConf, "ACCOUNTADMIN")
      assert(emails() === Seq("alice@ex.com", "no-at-sign"))

      // flip back: masked again — no view recreation in between
      gated.conf.set(Bootstrap.RoleConf, "R_ANALYST")
      assert(emails() === Seq("a***@ex.com", "***"))

      // self-join of the gated view: both sides masked, no double-mask
      gated.conf.unset(Bootstrap.RoleConf)
      val joined = gated.sql(
        """SELECT a.email AS ea, b.email AS eb
          |FROM vw_works_gated a JOIN vw_works_gated b ON a.work_id = b.work_id
          |WHERE a.work_id = 'W1'""".stripMargin).head()
      assert(joined.getString(0) === "a***@ex.com")
      assert(joined.getString(1) === "a***@ex.com")

      // un-gated relations are untouched by the rule — probe as a
      // privileged role (the RBAC check rule denies analysts any direct
      // raw read; that behavior is pinned in RbacSpec)
      gated.conf.set(Bootstrap.RoleConf, "R_TRANSFORM")
      gated.read.parquet(s"$dir/landing").createOrReplaceTempView("raw_probe")
      val raw = gated.sql(
        "SELECT get_json_object(record, '$.email') FROM raw_probe " +
          "WHERE get_json_object(record, '$.id') = 'W1'").head().getString(0)
      assert(raw === "alice@ex.com")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
