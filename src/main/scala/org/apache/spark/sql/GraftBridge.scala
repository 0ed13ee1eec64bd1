package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals the public API doesn't expose:
  * Column ⇄ Expression conversion for wiring custom Catalyst expressions
  * (graft.functions.*) into ordinary Column pipelines. Lives in the
  * org.apache.spark.sql package solely for access; no Spark code is modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
