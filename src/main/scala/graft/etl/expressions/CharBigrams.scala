package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character bigrams of the lowercased text, in one pass per row.
  *
  * Value-identical to the composed form
  * `transform(sequence(1, length(lower(t)) - 1), i => lower(t).substr(i, 2))`
  * (guarded empty below 2 chars) — but single-pass: the composed chain
  * is quadratic per row because every `substr(i, 2)` re-seeks the
  * string from byte 0 to resolve the code-point offset, and the
  * higher-order `transform` is interpreted per element. Positions are
  * CODE POINTS, matching `substr`'s semantics (a surrogate pair is one
  * character), so the walk tracks UTF-16 offsets per code point
  * explicitly. Feeds the char-bigram LM scorer (q87), where the explode
  * of this array is the per-row work that pipelines into the scan.
  */
object CharBigrams {
  def compute(s: UTF8String): ArrayData = {
    val t = s.toLowerCase.toString
    val len = t.length
    // UTF-16 offset of each code point (n+1 entries, last = len)
    var n = 0
    val offs = new Array[Int](len + 1)
    var i = 0
    while (i < len) {
      offs(n) = i
      i += Character.charCount(t.codePointAt(i))
      n += 1
    }
    offs(n) = len
    if (n < 2) return new GenericArrayData(new Array[AnyRef](0))
    val arr = new Array[AnyRef](n - 1)
    var g = 0
    while (g < n - 1) {
      arr(g) = UTF8String.fromString(t.substring(offs(g), offs(g + 2)))
      g += 1
    }
    new GenericArrayData(arr)
  }
}

case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_bigrams"
  override protected def nullSafeEval(v: Any): Any =
    CharBigrams.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.etl.expressions.CharBigrams.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}
