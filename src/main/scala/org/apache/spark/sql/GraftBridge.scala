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

  /** The ANSI double→int conversion `cast(double as int)` performs
    * (Spark 4 default): truncate in-range values, throw the exact
    * SparkArithmeticException on NaN/±Inf/overflow. Exposed so a
    * codegen'd kernel replacing a `cast`-bearing HOF lambda keeps the
    * replaced form's semantics bit-for-bit, exceptions included.
    */
  def ansiDoubleToInt(d: Double): Int =
    org.apache.spark.sql.types.DoubleExactNumeric.toInt(d)
}
