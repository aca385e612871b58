package graft

import java.nio.file.Files
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Envelope
import graft.streaming.Landing

/** G2 RBAC namespacing (reference sql/02_rbac_policies.sql:3-34): the
  * analyst role reads curated views ONLY — the raw landing relation and the
  * clear parquet path underneath it are unreachable, while R_TRANSFORM
  * keeps full raw access in the same session.
  */
class RbacSpec extends AnyFunSuite {

  private def landedFixture(): String = {
    val base = TestSpark.spark
    import base.implicits._
    val dir = Files.createTempDirectory("graft_rbac").toString
    val lines = Envelope.wire(Envelope.toEnvelope(
      Envelope.parseWorks(Seq(
        """{"id":"W1","email":"alice@ex.com"}""",
        """{"id":"W2","email":"bob@ex.com"}""").toDF("value"), "value"),
      "openalex", to_timestamp(lit("2024-01-01 12:00:00")),
      to_timestamp(lit("2024-01-01 12:00:00")), md5(col("id"))))
      .as[String].collect()
    Landing.landBatch(lines.toSeq.toDF("value"), s"$dir/landing", None,
      to_timestamp(lit("2024-01-01 12:00:30")))
    dir
  }

  private def governedSession(): SparkSession = {
    TestSpark.spark // ensure a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def restoreDefault(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
  }

  test("governed session: transform reads raw, analyst cannot — curated views keep working") {
    val dir = landedFixture()
    val s = governedSession()
    try {
      // bootstrap as the transform role (the reference's view owner)
      s.conf.set(Bootstrap.RoleConf, "R_TRANSFORM")
      Bootstrap.initLanding(s, s"$dir/landing")

      // transform: raw landing view and raw path both readable
      assert(s.sql(s"SELECT count(*) FROM ${Bootstrap.LandingView}").head().getLong(0) === 2L)
      assert(s.read.parquet(s"$dir/landing").count() === 2L)

      // flip the SAME session to analyst
      s.conf.set(Bootstrap.RoleConf, "R_ANALYST")

      // curated surface still works (definer's rights through the View)
      assert(s.sql("SELECT count(*) FROM vw_works").head().getLong(0) === 2L)
      assert(s.sql("SELECT samples_5m FROM vw_latency").collect().length === 1)

      // the landing temp view resolves to the raw scan -> denied
      val e1 = intercept[SparkException] {
        s.sql(s"SELECT * FROM ${Bootstrap.LandingView}").collect()
      }
      assert(e1.getMessage.contains("GRAFT_RBAC"))

      // direct path reads: DataFrame API and SQL file relation
      val e2 = intercept[SparkException] { s.read.parquet(s"$dir/landing").collect() }
      assert(e2.getMessage.contains("GRAFT_RBAC"))
      val e3 = intercept[SparkException] {
        s.sql(s"SELECT * FROM parquet.`$dir/landing`").collect()
      }
      assert(e3.getMessage.contains("GRAFT_RBAC"))

      // aliasing a raw scan as a curated view name must NOT bypass the
      // check — only a real View node (unforgeable via DataFrame API) does.
      // The spoof is denied at .alias analysis already; proving the raw
      // path never resolves for an analyst is the point.
      val e4 = intercept[SparkException] {
        s.read.parquet(s"$dir/landing").alias("vw_works").collect()
      }
      assert(e4.getMessage.contains("GRAFT_RBAC"))
    } finally restoreDefault()
  }

  test("trust is plan identity: a spoofed vw_works over the raw path is denied") {
    val dir = landedFixture()
    val s = governedSession()
    try {
      s.conf.set(Bootstrap.RoleConf, "R_TRANSFORM")
      Bootstrap.initLanding(s, s"$dir/landing")
      val sch = s.read.parquet(s"$dir/landing").schema // while privileged
      s.conf.set(Bootstrap.RoleConf, "R_ANALYST")

      // SQL spoof: CREATE VIEW over the raw path is denied at DEFINITION
      // time (the rule walks CreateViewCommand's stored body plan)
      val e1 = intercept[SparkException] {
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW vw_works AS " +
          s"SELECT * FROM parquet.`$dir/landing`")
      }
      assert(e1.getMessage.contains("GRAFT_RBAC"))

      // alternate SPELLINGS of the raw path: scheme-qualified and
      // non-normalized — both must qualify to the same URI and be denied
      val e2 = intercept[SparkException] {
        s.read.parquet(s"file://$dir/landing").collect()
      }
      assert(e2.getMessage.contains("GRAFT_RBAC"))
      val e3 = intercept[SparkException] {
        s.read.parquet(s"$dir/./landing").collect()
      }
      assert(e3.getMessage.contains("GRAFT_RBAC"))

      // a STREAMING read of the raw path is denied too (StreamingRelation)
      val e4 = intercept[SparkException] {
        s.readStream.schema(sch).parquet(s"$dir/landing")
      }
      assert(e4.getMessage.contains("GRAFT_RBAC"))

      // GLOB spellings: the v1 streaming relation carries the pattern
      // verbatim (never expanded), so the rule must expand it itself —
      // a one-character wildcard must not read what the exact path cannot
      val e5 = intercept[SparkException] {
        s.readStream.schema(sch).parquet(s"$dir/land*")
      }
      assert(e5.getMessage.contains("GRAFT_RBAC"))
      val e6 = intercept[SparkException] {
        s.read.parquet(s"$dir/land*").collect()
      }
      assert(e6.getMessage.contains("GRAFT_RBAC"))

      // option-key CASING: DataSource keeps the user's original key
      // spelling, so the check must probe options case-insensitively —
      // `.option("PATH", ...)` must be denied exactly like `.load(path)`
      val e7 = intercept[SparkException] {
        s.readStream.schema(sch).format("parquet")
          .option("PATH", s"$dir/landing").load()
      }
      assert(e7.getMessage.contains("GRAFT_RBAC"))

      // FAIL CLOSED: a user path whose glob expansion ERRORS (malformed
      // pattern; DataStreamReader pre-checks reject it before analysis,
      // so the guard is probed directly) must answer "raw" — the v1
      // streaming source re-globs per micro-batch at runtime, so an
      // allow-on-error would read raw data once the pattern "recovers"
      val rule = new graft.plans.RbacCheckRule(s)
      assert(rule.underRawUserPath(s.sessionState.newHadoopConf(),
        s"$dir/landing/{bad", Seq.empty))

      // FAIL CLOSED on EMPTY glob expansion: a pattern whose literal
      // spelling does NOT prefix-match raw and that matches nothing at
      // analysis time (`/lake/land{ing,x}/nope-*`) would pass both the
      // expansion walk and the literal fallback — but FileStreamSource
      // re-globs per micro-batch, so the stream reaches raw files that
      // appear later (same allow-now/glob-later TOCTOU). Any glob that
      // expands to nothing is denied for governed sessions.
      val hc = s.sessionState.newHadoopConf()
      val rawQ = Seq(graft.Bootstrap.qualify(hc, s"$dir/landing"))
      assert(rule.underRawUserPath(hc, s"$dir/land{ing,x}/nope-*", rawQ))
      // ...while a LITERAL not-yet-existing path stays judged by prefix:
      // it can only ever name itself, so no TOCTOU exists
      assert(!rule.underRawUserPath(hc, s"$dir/elsewhere/later.parquet", rawQ))
      assert(rule.underRawUserPath(hc, s"$dir/landing/later.parquet", rawQ))

      // the genuine curated views keep working throughout
      assert(s.sql("SELECT count(*) FROM vw_works").head().getLong(0) === 2L)
    } finally restoreDefault()
  }

  test("conf governance: analyst may not SET/RESET spark.graft.* via SQL") {
    val dir = landedFixture()
    val s = governedSession()
    try {
      s.conf.set(Bootstrap.RoleConf, "R_TRANSFORM")
      Bootstrap.initLanding(s, s"$dir/landing")

      // privileged: the SQL surface works
      s.sql(s"SET ${Bootstrap.AnchorConf}=2024-01-01 12:00:00")
      s.sql(s"RESET ${Bootstrap.AnchorConf}")

      s.conf.set(Bootstrap.RoleConf, "R_ANALYST")

      // role escalation via SQL SET is denied
      val e1 = intercept[SparkException] {
        s.sql(s"SET ${Bootstrap.RoleConf}=R_TRANSFORM")
      }
      assert(e1.getMessage.contains("may not SET"))

      // clearing the recorded raw paths is denied: targeted and bare RESET
      val e2 = intercept[SparkException] {
        s.sql(s"RESET ${Bootstrap.RawPathsConf}")
      }
      assert(e2.getMessage.contains("may not RESET"))
      val e3 = intercept[SparkException] { s.sql("RESET") }
      assert(e3.getMessage.contains("may not RESET"))

      // non-governed confs stay SET-able for everyone
      s.sql("SET spark.sql.ansi.enabled=false")

      // and the denials really did not take effect
      assert(s.conf.get(Bootstrap.RoleConf) === "R_ANALYST")
      assert(s.conf.get(Bootstrap.RawPathsConf).nonEmpty)
      assert(s.sql("SELECT count(*) FROM vw_works").head().getLong(0) === 2L)
    } finally restoreDefault()
  }

  test("analyst entry point registers curated views only; raw relation unnameable") {
    val dir = landedFixture()
    val s = governedSession()
    try {
      // no role set: the default IS analyst
      Bootstrap.initAnalyst(s, s"$dir/landing")

      // curated views exist and the email column is masked by definition
      val emails = s.sql("SELECT email FROM vw_works ORDER BY work_id")
        .collect().map(_.getString(0)).toSeq
      assert(emails === Seq("a***@ex.com", "b***@ex.com"))
      assert(s.sql("SELECT samples_5m FROM vw_latency").collect().length === 1)

      // there is no raw relation to name at all
      val e1 = intercept[Exception] {
        s.sql(s"SELECT * FROM ${Bootstrap.LandingView}").collect()
      }
      assert(e1.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        e1.getMessage.contains("cannot be found"))

      // and the path underneath the views is denied
      val e2 = intercept[SparkException] { s.read.parquet(s"$dir/landing").collect() }
      assert(e2.getMessage.contains("GRAFT_RBAC"))

      // re-bootstrap is idempotent (definition step suspends the check)
      Bootstrap.initAnalyst(s, s"$dir/landing")
      assert(s.sql("SELECT count(*) FROM vw_works").head().getLong(0) === 2L)
    } finally restoreDefault()
  }
}
