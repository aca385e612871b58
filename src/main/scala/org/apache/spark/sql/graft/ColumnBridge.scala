package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 moved the converters (`classic.ExpressionUtils`) behind
  * `private[sql]`, so third-party expression libraries host this two-line
  * bridge inside the `org.apache.spark.sql` namespace — the established
  * pattern for Spark-native extension libraries. Nothing else in graft
  * lives outside the `graft` package, and nothing here touches behavior:
  * these are pure wrappers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
