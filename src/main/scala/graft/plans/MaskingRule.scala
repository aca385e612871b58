package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{MetadataBuilder, StringType}
import graft.functions.Masking

/** Dynamic column masking as a Catalyst resolution rule — the faithful
  * analog of the reference's masking policy (sql/05_masking_policy.sql:
  * 10-19), which rewrites reads during view expansion inside the
  * warehouse: ONE view definition, and the session's role decides at
  * read time whether `email` comes back clear or masked. No view
  * re-creation, no way for an analyst session to reach the clear column
  * through the gated relation.
  *
  * Mechanics: during analysis, any `SubqueryAlias` whose name is in
  * `MaskingRule.GatedViews` gets its `email` output wrapped in the P9
  * mask expression unless `spark.graft.role` is privileged. An alias
  * metadata marker makes the rewrite idempotent across analyzer fixpoint
  * iterations and safe under self-joins (each occurrence is rewritten
  * exactly once).
  */
class MaskingRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def privileged: Boolean =
    Masking.PrivilegedRoles(session.conf.get(graft.Bootstrap.RoleConf, "R_ANALYST"))

  private val markedMeta =
    new MetadataBuilder().putBoolean(MaskingRule.MaskedKey, true).build()

  /** P9 semantics in raw Catalyst: NULL→NULL, no '@'→'***',
    * else first char + "***" + from-'@'.
    */
  private def maskExpr(e: Expression): Expression = {
    val at = StringLocate(Literal("@"), e, Literal(1))
    CaseWhen(
      Seq(
        (IsNull(e), Literal(null, StringType)),
        (EqualTo(at, Literal(0)), Literal("***"))),
      Some(Concat(Seq(
        Substring(e, Literal(1), Literal(1)),
        Literal("***"),
        Substring(e, at, Literal(Int.MaxValue))))))
  }

  private def alreadyMasked(p: LogicalPlan): Boolean = p match {
    case Project(list, _) => list.exists {
      case a: Alias => a.name == "email" && a.metadata.contains(MaskingRule.MaskedKey)
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (privileged) plan
    else plan.resolveOperatorsUp {
      case SubqueryAlias(id, child)
          if MaskingRule.GatedViews(id.name) && child.resolved && !alreadyMasked(child) =>
        val projected = child.output.map {
          case a if a.name == "email" =>
            // keep the attribute's exprId: upstream operators already
            // reference it, a fresh id would orphan them mid-analysis
            Alias(maskExpr(a), "email")(exprId = a.exprId,
              explicitMetadata = Some(markedMeta))
          case a => a
        }
        SubqueryAlias(id, Project(projected, child))
    }
}

object MaskingRule {
  val MaskedKey = "graft.masked"

  /** Relations the policy is attached to (the reference attaches per
    * column via ALTER VIEW ... SET MASKING POLICY; here the attachment
    * registry is this set).
    */
  val GatedViews: Set[String] = Set("vw_works_gated")
}

/** Session extension entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Installs the governance plane: read-time column masking (G1) and the
  * raw-namespace RBAC check (G2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => new MaskingRule(session))
    ext.injectCheckRule(session => new RbacCheckRule(session))
  }
}
