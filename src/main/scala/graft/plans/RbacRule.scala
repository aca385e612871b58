package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, View}
import org.apache.spark.sql.execution.command.{AlterViewAsCommand, CreateViewCommand, ResetCommand, SetCommand}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
import graft.functions.Masking

/** G2 RBAC namespacing as a Catalyst check rule — the analog of the
  * reference's grant graph (sql/02_rbac_policies.sql:3-34), where R_ANALYST
  * is granted SELECT on the curated views only and cannot touch the RAW
  * schema at all, while R_TRANSFORM/R_INGEST/ACCOUNTADMIN read RAW freely.
  *
  * Mechanics: `Bootstrap.initLanding`/`initAnalyst` record the landing
  * directory (filesystem-qualified) under `spark.graft.raw.paths`. After
  * analysis of every query this rule walks the plan; a file scan rooted
  * under a raw path — batch v1, batch DSv2 (`FileTable`), or streaming —
  * is denied for non-privileged sessions UNLESS it is reached through a
  * TRUSTED curated `View`.
  *
  * Trust is PLAN IDENTITY, not view name: bootstrap registers the
  * canonicalized plan of each curated view body in [[RbacTrust]] (JVM
  * session state — unreachable from SQL), and a `View` node is exempt only
  * when its child matches the registered plan. A spoof that re-creates
  * `vw_works` over the raw path produces a `View` with a different child
  * and falls through to the scan denial. Definition-time escapes are
  * closed too: `CREATE/ALTER VIEW` commands are `AnalysisOnlyCommand`s
  * whose children are cleared before check rules run, so the rule walks
  * their STORED body plan explicitly — an analyst cannot even define a
  * view over the raw path, let alone read through it.
  *
  * The role/paths confs are themselves governed at the SQL surface:
  * `SET`/`RESET` on `spark.graft.*` is denied for non-privileged sessions
  * (a bare `RESET` would clear the recorded raw paths, so it is denied
  * too). JVM-level `conf.set` remains cooperative — the same boundary as
  * the reference, whose RBAC stops at the warehouse: a user with cluster
  * submit rights was never inside the threat model.
  */
class RbacCheckRule(session: SparkSession) extends (LogicalPlan => Unit) {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path

  private def rawPaths: Seq[String] =
    session.conf.get(graft.Bootstrap.RawPathsConf, "")
      .split(",").iterator.map(_.trim.stripSuffix("/")).filter(_.nonEmpty).toSeq

  /** Compare filesystem-qualified URIs on both sides: recorded paths are
    * qualified at record time, and scan roots are re-qualified here with
    * the SAME helper (Bootstrap.qualify), so a scheme-qualified
    * (`file:///...`) or relative spelling of the same directory cannot
    * slip past a string comparison. The Hadoop conf is built lazily at
    * most once per rule invocation (apply) — newHadoopConf copies the
    * whole SQL conf, far too heavy for once-per-scan-path in the
    * analysis hot path.
    */
  private def underRaw(hc: Configuration, pathStr: String, raw: Seq[String]): Boolean = {
    val q = graft.Bootstrap.qualify(hc, pathStr) // record-time spelling, shared
    raw.exists(r => q == r || q.startsWith(r + "/"))
  }

  /** USER-SUPPLIED source paths (the v1 streaming relation holds them
    * verbatim) may contain globs the relation has not expanded yet — a
    * `land*` spelling of the landing dir would sail past the qualified
    * prefix comparison. Expand first; a pattern matching nothing falls
    * back to its literal spelling. (Batch relations need none of this:
    * their HadoopFsRelation/FileTable rootPaths are already expanded.)
    *
    * FAIL CLOSED: if expansion itself errors (malformed pattern,
    * transient filesystem failure), the path is treated as raw and the
    * read denied — FileStreamSource re-globs per micro-batch at runtime,
    * so an "allow now, glob later" answer would let the stream reach raw
    * data as soon as the filesystem recovers. The same TOCTOU applies to
    * a pattern that matches NOTHING at analysis time: its literal
    * spelling need not prefix-match raw (`/lake/{landing,x}/part-*`, or a
    * glob over a raw subpath created later), yet the source re-globs per
    * micro-batch and can reach raw files that appear afterwards — so an
    * empty expansion of a GLOB pattern is denied outright for governed
    * sessions. A literal (glob-free) path that simply doesn't exist yet
    * keeps the qualified prefix comparison: it can never expand to
    * anything but itself.
    */
  private[graft] def underRawUserPath(hc: Configuration, pathStr: String,
                                      raw: Seq[String]): Boolean = {
    val p = new Path(pathStr)
    val matched =
      try Option(p.getFileSystem(hc).globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      catch { case _: Exception => return true }
    if (matched.isEmpty) {
      val isGlob = pathStr.exists(c => "*?{}[]".indexOf(c.toInt) >= 0)
      isGlob || underRaw(hc, pathStr, raw)
    } else matched.exists(st => underRaw(hc, st.getPath.toString, raw))
  }

  private def scansRaw(hc: Configuration, lr: LogicalRelation, raw: Seq[String]): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(p => underRaw(hc, p.toString, raw))
      case _ => false
    }

  private def scansRawV2(hc: Configuration, ft: FileTable, raw: Seq[String]): Boolean =
    ft.fileIndex.rootPaths.exists(p => underRaw(hc, p.toString, raw))

  private def deny(role: String): Nothing =
    throw new SparkException(
      s"[GRAFT_RBAC] role $role is not allowed to read the raw " +
        s"landing data directly; query the curated views " +
        s"(${RbacCheckRule.CuratedViews.toSeq.sorted.mkString(", ")}) instead")

  override def apply(plan: LogicalPlan): Unit = {
    val role = session.conf.get(graft.Bootstrap.RoleConf, "R_ANALYST")
    if (!Masking.PrivilegedRoles(role)) {
      // conf governance first: it must hold even before any raw path is
      // recorded, or an analyst could pre-escalate the role (masking
      // bypass) or clear the paths list the scan check relies on
      plan.foreach {
        case SetCommand(Some((k, _)))
            if k.toLowerCase.startsWith("spark.graft.") =>
          throw new SparkException(
            s"[GRAFT_RBAC] role $role may not SET governed conf $k")
        case ResetCommand(key) if key.forall(_.toLowerCase.startsWith("spark.graft.")) =>
          // RESET spark.graft.x, and bare RESET (which would clear ALL
          // confs including the recorded raw paths)
          throw new SparkException(
            s"[GRAFT_RBAC] role $role may not RESET governed confs" +
              key.map(k => s" ($k)").getOrElse(""))
        case _ => ()
      }
      val raw = rawPaths
      if (raw.nonEmpty) {
        // lazy: newHadoopConf copies the whole SQL conf — only plans that
        // actually reach a file-path comparison should pay it, not every
        // SELECT 1 or trusted-view read a governed session analyzes
        lazy val hc = session.sessionState.newHadoopConf()
        def walk(p: LogicalPlan): Unit = p match {
          case v: View if RbacTrust.isTrusted(session, v.child) =>
            () // definer's rights: the registered curated plan may read RAW
          case lr: LogicalRelation if scansRaw(hc, lr, raw) => deny(role)
          case sr: StreamingRelation
              // options must be probed case-INsensitively: ResolveDataSource
              // hands DataSource the user's original key casing, so a
              // `.option("PATH", raw)` spelling would otherwise slip past a
              // case-sensitive get
              if (sr.dataSource.paths ++
                org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(
                  sr.dataSource.options).get("path"))
                .exists(underRawUserPath(hc, _, raw)) => deny(role)
          case s2: StreamingRelationV2 =>
            s2.table match {
              case ft: FileTable if scansRawV2(hc, ft, raw) => deny(role)
              case _ => s2.children.foreach(walk)
            }
          case d2: DataSourceV2Relation =>
            d2.table match {
              case ft: FileTable if scansRawV2(hc, ft, raw) => deny(role)
              case _ => d2.children.foreach(walk)
            }
          // AnalysisOnlyCommands hide their analyzed children from check
          // rules (markAsAnalyzed) — walk the stored body explicitly so a
          // view DEFINITION over the raw path is denied, not just its reads
          case c: CreateViewCommand => walk(c.plan)
          case a: AlterViewAsCommand => walk(a.query)
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
    * Used for the denial message; the actual exemption is plan identity
    * via [[RbacTrust]].
    */
  val CuratedViews: Set[String] =
    Set("vw_works", "vw_works_v", "vw_works_gated", "vw_latency")
}

/** JVM-side registry of TRUSTED curated-view plans, keyed weakly by
  * session. Registered by `Bootstrap.createCuratedViews` with the plan the
  * temp-view catalog actually stored; compared canonicalized, so exprId
  * renumbering (e.g. `DeduplicateRelations` on a self-join of a curated
  * view) cannot break the match. Living outside the conf map makes it
  * unreachable — and unforgeable — from the SQL surface.
  */
object RbacTrust {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  import org.apache.spark.sql.catalyst.plans.logical.LeafNode

  private val trusted =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayList[LogicalPlan]]()

  /** Session-free stand-in for a file relation inside a stored trust plan.
    * WeakHashMap values must never strongly reach their own keys (the
    * javadoc contract — such entries become immortal and every churned
    * session leaks), but `HadoopFsRelation` and `FileTable` both hold a
    * session reference. Stored AND probed plans therefore carry this
    * token of the relation's identity (root paths + schema + format)
    * instead of the relation itself; both sides are stripped identically,
    * so plan-identity comparison is unaffected.
    */
  private case class FileRelationToken(paths: Seq[String], schemaDdl: String,
      format: String) extends LeafNode {
    override def output: Seq[Attribute] = Nil
  }

  private def strip(canonical: LogicalPlan): LogicalPlan = canonical.transformUp {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        FileRelationToken(fs.location.rootPaths.map(_.toString),
          lr.schema.catalogString, fs.fileFormat.getClass.getName)
      case _ => lr
    }
    case d2: DataSourceV2Relation => d2.table match {
      case ft: FileTable =>
        FileRelationToken(ft.fileIndex.rootPaths.map(_.toString),
          d2.schema.catalogString, ft.formatName)
      case _ => d2
    }
  }

  /** checkAnalysis CTE-INLINES the plan before running extended check
    * rules, so the `View` child the rule compares is not the stored
    * `WithCTE` shape — register the inlined canonical forms (both
    * dangling-relation modes, the flag differs across Spark minors)
    * alongside the raw one.
    */
  private def forms(analyzed: LogicalPlan): Seq[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.optimizer.InlineCTE
    Seq(
      analyzed,
      InlineCTE(alwaysInline = true, keepDanglingRelations = false)(analyzed),
      InlineCTE(alwaysInline = true, keepDanglingRelations = true)(analyzed)
    ).map(p => strip(p.canonicalized)).distinct
  }

  def register(session: SparkSession, analyzed: LogicalPlan): Unit =
    synchronized {
      val l = trusted.computeIfAbsent(session, _ => new java.util.ArrayList)
      forms(analyzed).foreach(c => if (!l.contains(c)) l.add(c))
    }

  def isTrusted(session: SparkSession, child: LogicalPlan): Boolean =
    synchronized {
      val l = trusted.get(session)
      l != null && l.contains(strip(child.canonicalized))
    }

  /** Drop a session's registrations (re-bootstrap hygiene in tests). */
  def clear(session: SparkSession): Unit = synchronized { trusted.remove(session) }
}
