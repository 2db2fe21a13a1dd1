package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` helpers that changed shape in Spark 4.x:
  * Column no longer wraps a Catalyst Expression directly, so extension
  * libraries convert through `classic.ExpressionUtils`. Lives under the
  * `org.apache.spark.sql` package solely for access; no Spark internals are
  * modified. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
