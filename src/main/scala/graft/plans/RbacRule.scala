package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, View}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.functions.Masking

/** G2 RBAC namespacing as a Catalyst check rule — the analog of the
  * reference's grant graph (sql/02_rbac_policies.sql:3-34), where R_ANALYST
  * is granted SELECT on the curated views only and cannot touch the RAW
  * schema at all, while R_TRANSFORM/R_INGEST/ACCOUNTADMIN read RAW freely.
  *
  * Mechanics: `Bootstrap.initLanding`/`initAnalyst` record the landing
  * directory under `spark.graft.raw.paths`. After analysis of every query,
  * this rule walks the plan; a file scan rooted under a raw path is denied
  * for non-privileged sessions UNLESS it is reached through one of the
  * curated `View`s — Spark's `View` node cannot be constructed through the
  * public DataFrame API (an `.alias("vw_works")` spoof only makes a
  * `SubqueryAlias`), so the exemption is definer's-rights: the view text
  * written at bootstrap is the only analyst path to the raw bytes, exactly
  * like the reference's view grants.
  *
  * Scope note: this governs the SQL surface of one session, like the
  * reference's warehouse does; it is not an OS-level sandbox (a user with
  * JVM access can always open files). The reference has the same shape —
  * RBAC stops at the warehouse boundary.
  */
class RbacCheckRule(session: SparkSession) extends (LogicalPlan => Unit) {

  private def rawPaths: Seq[String] =
    session.conf.get(graft.Bootstrap.RawPathsConf, "")
      .split(",").iterator.map(_.trim.stripSuffix("/")).filter(_.nonEmpty).toSeq

  private def scansRaw(lr: LogicalRelation, raw: Seq[String]): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists { p =>
          val path = p.toUri.getPath
          raw.exists(r => path == r || path.startsWith(r + "/"))
        }
      case _ => false
    }

  override def apply(plan: LogicalPlan): Unit = {
    val role = session.conf.get(graft.Bootstrap.RoleConf, "R_ANALYST")
    if (!Masking.PrivilegedRoles(role)) {
      val raw = rawPaths
      if (raw.nonEmpty) {
        def walk(p: LogicalPlan): Unit = p match {
          case v: View
              if RbacCheckRule.CuratedViews(v.desc.identifier.table.toLowerCase) =>
            () // definer's rights: the curated view text may read RAW
          case lr: LogicalRelation if scansRaw(lr, raw) =>
            throw new SparkException(
              s"[GRAFT_RBAC] role $role is not allowed to read the raw " +
                s"landing data directly; query the curated views " +
                s"(${RbacCheckRule.CuratedViews.toSeq.sorted.mkString(", ")}) instead")
          case other =>
            other.subqueries.foreach(walk)
            other.children.foreach(walk)
        }
        walk(plan)
      }
    }
  }
}

object RbacCheckRule {
  /** The views R_ANALYST is "granted" (reference sql/02_rbac_policies.sql
    * grants SELECT on CURATED to R_ANALYST; these are the curated surface).
    */
  val CuratedViews: Set[String] =
    Set("vw_works", "vw_works_v", "vw_works_gated", "vw_latency")
}
