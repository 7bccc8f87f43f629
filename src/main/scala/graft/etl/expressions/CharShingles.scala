package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles of a string, first-occurrence order —
  * bit-identical to `array_distinct(transform(sequence(1, max(n-k+1,1)),
  * i -> substr(s, i, k)))` but built in a single pass with one output
  * allocation. The composed-builtins form allocates the position array,
  * one lambda frame per position, and the OpenHashSet of array_distinct
  * per row; at millions of documents that garbage dominated the MinHash
  * stage (measured ~2× on the dedup bench queries).
  */
object CharShingles {
  // NOT named `eval`: the companion case class inherits
  // Expression.eval(InternalRow), and a same-named member suppresses
  // the Scala static forwarder — Janino then fails to resolve the
  // static call, silently disabling whole-stage codegen for every
  // plan containing char_shingles (observed as a bench-wide
  // interpreted-mode fallback).
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    val last = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(last * 2, 2048))
    var i = 1
    while (i <= last) {
      seen.add(s.substringSQL(i, k))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"
  override protected def nullSafeEval(v: Any): Any =
    CharShingles.shingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.etl.expressions.CharShingles.shingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}
