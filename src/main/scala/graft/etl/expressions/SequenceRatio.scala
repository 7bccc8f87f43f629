package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff–Obershelp similarity, matching Python's
  * `difflib.SequenceMatcher(None, a, b).ratio()` for short strings
  * (reference: `concerts_etl/core/matching.py:29-30`, `_sim`, used by the
  * similarity join at `matching.py:46-99` with threshold 0.90).
  *
  * ratio = 2*M / (|a|+|b|) where M is the total size of matching blocks
  * found by recursively taking the longest matching substring and
  * recursing on both sides. difflib's autojunk heuristic (popular
  * elements in sequences >= 200 chars) is intentionally NOT implemented:
  * event names are short, and autojunk would make the metric
  * data-dependent in a way unsuited to a distributed engine.
  *
  * Spark's closest builtin is `levenshtein`; this expression exists so
  * the engine reproduces the reference's actual metric. Codegen'd via a
  * static helper.
  */
object SequenceRatio {
  def ratio(ua: UTF8String, ub: UTF8String): Double = {
    // DP runs over CODE POINTS, not UTF-16 code units: Python sequences
    // are code-point indexed, so difflib's ratio() for non-BMP input
    // (emoji, '𝄞') diverges from a char-based DP, and Spark's Length()
    // (= UTF8String.numChars = code points) would not be a sound bound
    // for a UTF-16-based metric.
    val a = ua.toString.codePoints.toArray
    val b = ub.toString.codePoints.toArray
    val la = a.length
    val lb = b.length
    if (la + lb == 0) return 1.0
    var matches = 0
    // Explicit work stack of (alo, ahi, blo, bhi) quadruples.
    var stack: List[(Int, Int, Int, Int)] = List((0, la, 0, lb))
    // b2j: positions of each char in b (recomputed per region via scan —
    // strings here are short event names, so O(n*m) DP is fine).
    while (stack.nonEmpty) {
      val (alo, ahi, blo, bhi) = stack.head
      stack = stack.tail
      if (alo < ahi && blo < bhi) {
        // longest matching block via the classic j2len DP (difflib's
        // find_longest_match, junk-free): first-longest wins, i.e.
        // earliest in a, then earliest in b.
        var besti = alo
        var bestj = blo
        var bestSize = 0
        var j2len = new Array[Int](bhi - blo + 1)
        var i = alo
        while (i < ahi) {
          val newj2len = new Array[Int](bhi - blo + 1)
          val ca = a(i)
          var j = blo
          while (j < bhi) {
            if (b(j) == ca) {
              val k = (if (j - 1 >= blo) j2len(j - 1 - blo) else 0) + 1
              newj2len(j - blo) = k
              if (k > bestSize) {
                besti = i - k + 1
                bestj = j - k + 1
                bestSize = k
              }
            }
            j += 1
          }
          j2len = newj2len
          i += 1
        }
        if (bestSize > 0) {
          matches += bestSize
          stack = (alo, besti, blo, bestj) ::
            (besti + bestSize, ahi, bestj + bestSize, bhi) :: stack
        }
      }
    }
    2.0 * matches / (la + lb)
  }
}

case class SequenceRatio(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "seq_ratio"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SequenceRatio.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.etl.expressions.SequenceRatio.ratio($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SequenceRatio =
    copy(left = l, right = r)
}
