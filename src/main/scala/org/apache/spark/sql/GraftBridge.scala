package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ catalyst Expression conversion
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils` is
  * the supported internal path). Lives in the spark.sql package purely
  * for access; no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
