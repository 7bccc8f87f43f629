package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sequential left-fold dot product of two double-array columns —
  * value-identical to
  * `aggregate(zip_with(x, y, (p, q) -> p * q), 0D, (acc, v) -> acc + v)`
  * (same element order, same IEEE accumulation order, same null
  * semantics: null result when either array is null, when the lengths
  * differ — zip_with pads the shorter side with null, and one null
  * product nulls the whole fold — or when any element is null), but
  * compiled to a primitive loop instead of ~2·dim interpreted lambda
  * invocations with boxed doubles per call (higher-order functions are
  * CodegenFallback: every zip_with materializes an intermediate array
  * and every lambda step re-binds variables reflectively).
  *
  * This is the innermost kernel of the entire ANN/PQ family — cell
  * assignment evaluates it nCells times per row, PQ encode m·nCents
  * times, ADC/brute-force once per candidate pair — so the interpreted
  * overhead multiplies by corpus × fan-out (guide §4: prefer
  * codegen-friendly expressions in the hot path). Being a plain
  * BinaryExpression it is also foldable over literal centroid arrays,
  * so |c|² terms constant-fold at plan time where the HOF form
  * re-evaluated them per row.
  *
  * NaN ordering caveat: none — the fold produces the same NaN the HOF
  * form produces for the same inputs (IEEE ops in the same order).
  */
object DotFold {
  /** Null-aware core; boxed return so codegen can test for null. */
  def dotOrNull(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** LONG variant — value-identical to the int8-code fold
    * `aggregate(zip_with(x, y, (p, q) -> p * q), 0L, (acc, v) -> acc + v)`
    * over array<long> inputs (products bounded at 127² by the callers,
    * so overflow semantics never engage).
    */
  def dotLongOrNull(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold expects two array<double> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFold.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
        java.lang.Double $tmp = graft.etl.expressions.DotFold.dotOrNull($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFold =
    copy(left = l, right = r)
}

case class DotFoldLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold_long expects two array<bigint> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFold.dotLongOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
        java.lang.Long $tmp = graft.etl.expressions.DotFold.dotLongOrNull($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.longValue(); }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFoldLong =
    copy(left = l, right = r)
}
