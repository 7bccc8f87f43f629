package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd kernels for the symmetric int8 quantization path
  * (guide §4) — the per-row encode of the quantized-ANN family
  * (q81 storage shrink, q94/q97 int8 IVF, q146/q154 index stats).
  * Both are value-identical to the HOF forms they replace and pinned
  * so in Wave30Spec; the encode runs once per corpus row at any
  * corpus size, so the interpreted-lambda overhead scales linearly
  * with data.
  */
object Int8Kernels {
  /** Value-identical to
    * `aggregate(v, 0D, (a, x) -> greatest(a, abs(x)))`:
    * null array → null; null elements are SKIPPED (greatest ignores
    * null arguments — the acc rides through); NaN propagates as the
    * greatest double (Spark's ordering == Math.max's NaN handling);
    * abs never yields -0.0, so ±0.0 ordering never engages.
    */
  def maxAbsOrNull(x: ArrayData): java.lang.Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) acc = math.max(acc, math.abs(x.getDouble(i)))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Spark's Round(d, 0) semantics on DoubleType: NaN/Inf pass
    * through, else BigDecimal(toString-shortest-repr) HALF_UP.
    */
  private def roundHalfUp(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Value-identical to
    * `transform(v, x -> when(scale > 0, cast(round(x * 127D / scale, 0) as int)).otherwise(0))`:
    * null array → null; scale null/≤0 → every element 0 (the
    * `when` predicate is false/null, so the otherwise branch fires
    * even for null elements); scale > 0 — where NaN counts as
    * GREATER than 0, Spark's comparison semantics, so a NaN scale
    * takes this branch and the cast throws — → null elements stay
    * null,
    * else round-half-up then the ANSI double→int cast (Spark 4
    * default: truncate in range, throw the SparkArithmeticException
    * on NaN/±Inf — unreachable for finite vectors since
    * |x|·127/max|x| ≤ 127, but the throw is preserved exactly).
    */
  def quantizeOrNull(x: ArrayData, scale: Double): ArrayData = {
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    // Spark comparison semantics: NaN > 0 is TRUE (NaN is the
    // greatest double), unlike Java IEEE — a NaN scale must take the
    // quantize branch so the ANSI cast throws exactly like the
    // replaced `when(scale > 0, ...)` form
    if (scale > 0 || java.lang.Double.isNaN(scale)) {
      while (i < n) {
        if (!x.isNullAt(i))
          out(i) = java.lang.Integer.valueOf(
            org.apache.spark.sql.GraftBridge.ansiDoubleToInt(
              roundHalfUp(x.getDouble(i) * 127.0 / scale)))
        i += 1
      }
    } else {
      while (i < n) { out(i) = java.lang.Integer.valueOf(0); i += 1 }
    }
    new GenericArrayData(out)
  }
}

case class MaxAbsFold(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_abs_fold expects array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "max_abs_fold"
  override protected def nullSafeEval(a: Any): Any =
    Int8Kernels.maxAbsOrNull(a.asInstanceOf[ArrayData]).doubleValue()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.etl.expressions.Int8Kernels.maxAbsOrNull($a).doubleValue();"
    })
  override protected def withNewChildInternal(c: Expression): MaxAbsFold =
    copy(child = c)
}

case class QuantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 expects (array<double>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  // transform's null contract: null ARRAY → null result; a null scale
  // only nulls the per-element `when` predicate (elements become 0),
  // so nullability follows the array side alone — but BinaryExpression
  // null-safety shortcuts BOTH sides, so a null scale must be handled
  // in eval/codegen, not by the default null-intolerant path.
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "quantize_int8"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else {
      val sc = right.eval(input)
      // null scale == non-positive scale: the when() predicate is
      // null, the otherwise(0) branch fires for every element
      val scale = if (sc == null) 0.0 else sc.asInstanceOf[Double]
      Int8Kernels.quantizeOrNull(arr.asInstanceOf[ArrayData], scale)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val scale = ctx.freshName("scale")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${rightGen.code}
          double $scale = ${rightGen.isNull} ? 0.0 : ${rightGen.value};
          ${ev.value} = graft.etl.expressions.Int8Kernels.quantizeOrNull(
            ${leftGen.value}, $scale);
        }
      """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizeInt8 =
    copy(left = l, right = r)
}
