package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved `Column` to a backend-agnostic ColumnNode representation;
  * the converters (`classic.ExpressionUtils`) are `private[sql]`. Custom
  * Catalyst expressions still need them, so this object lives under
  * `org.apache.spark.sql` to satisfy the package-private access — the
  * standard pattern for out-of-tree Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
