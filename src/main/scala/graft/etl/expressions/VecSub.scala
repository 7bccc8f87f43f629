package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise difference of two double-array columns — value-identical
  * to `zip_with(x, y, (a, b) -> a - b)` (null result when either array
  * is null; result length = max of the two lengths with the shorter
  * side null-padded, so out-of-range and null elements yield null
  * elements; same IEEE subtraction per element), but compiled to one
  * primitive loop instead of an interpreted lambda invocation per
  * element with boxed doubles (higher-order functions are
  * CodegenFallback).
  *
  * This is the residual-encode step of the IVF-PQ family
  * (resid = vec − centroid), evaluated once per corpus row at index
  * build/maintenance time and once per query row at search time — a
  * full interpreted pass per row at any corpus size (guide §4: prefer
  * codegen in the per-row hot path).
  */
object VecSub {
  /** Null-aware core mirroring zip_with's padding semantics. */
  def subOrNull(x: ArrayData, y: ArrayData): ArrayData = {
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < nx && i < ny && !x.isNullAt(i) && !y.isNullAt(i))
        out(i) = x.getDouble(i) - y.getDouble(i)
      // else: stays null — zip_with pads the shorter side with null and
      // (null - v) / (v - null) / (null - null) are all null
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub expects two array<double> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecSub.subOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.etl.expressions.VecSub.subOrNull($a, $b);"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(left = l, right = r)
}
