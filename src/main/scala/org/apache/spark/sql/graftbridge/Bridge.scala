package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the helpers `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-file shim
  * lives inside the `org.apache.spark.sql` namespace — the standard pattern
  * for Spark extension libraries that ship custom expressions. No Spark
  * internals are modified; this only re-exports the two conversions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
