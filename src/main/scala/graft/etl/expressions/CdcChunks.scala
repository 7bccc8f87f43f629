package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split text at positions where the
  * polynomial hash of the trailing `w`-character window satisfies
  * `h % mask == 0` — the rsync/LBFS boundary rule. Because a boundary
  * depends only on the local window (not on byte offsets), an insertion
  * near the start of a document shifts at most one chunk instead of
  * re-slicing everything downstream — the property that makes CDC the
  * dedup-friendly complement to fixed sliding windows (q82).
  *
  * The window hash is the PLAIN polynomial sum
  * `h(i) = sum_{k=0..w-1} cp(i-w+1+k) * 31^(w-1-k)` over code points —
  * deliberately not a rolling mod-2^64 update: the cross-engine oracle
  * must reproduce it, and DuckDB BIGINT errors on overflow instead of
  * wrapping, so the definition keeps every intermediate below int64
  * range (cp < 0x110000, 31^7 ~ 2.8e10, w*product ~ 2.4e17). With
  * w = 8 the per-row cost is O(8n) — still one pass, no allocation per
  * position. Positions are CODE POINTS (substr semantics), same walk
  * as [[CharBigrams]]. Min/max chunk clamps (the production refinement)
  * are stateful/sequential and deliberately out of this declarative
  * form. Empty input yields an empty array; a doc with no boundary is
  * one whole-text chunk.
  */
object CdcChunks {
  def compute(s: UTF8String, w: Int, mask: Int): ArrayData = {
    val t = s.toString
    val len = t.length
    if (len == 0) return new GenericArrayData(new Array[AnyRef](0))
    // code points + the UTF-16 offset where each begins (offs(n) = len)
    var n = 0
    val cps = new Array[Int](len)
    val offs = new Array[Int](len + 1)
    var i = 0
    while (i < len) {
      offs(n) = i
      val cp = t.codePointAt(i)
      cps(n) = cp
      i += Character.charCount(cp)
      n += 1
    }
    offs(n) = len
    val pows = new Array[Long](w)
    pows(w - 1) = 1L
    var p = w - 2
    while (p >= 0) { pows(p) = pows(p + 1) * 31L; p -= 1 }
    val chunks = new java.util.ArrayList[AnyRef]()
    var start = 0 // code-point index of current chunk start
    var cpi = w - 1 // window END index (0-based); window = [cpi-w+1, cpi]
    while (cpi < n) {
      var h = 0L
      var k = 0
      while (k < w) { h += cps(cpi - w + 1 + k) * pows(k); k += 1 }
      if (h % mask == 0) {
        chunks.add(UTF8String.fromString(t.substring(offs(start), offs(cpi + 1))))
        start = cpi + 1
      }
      cpi += 1
    }
    if (start < n)
      chunks.add(UTF8String.fromString(t.substring(offs(start), len)))
    new GenericArrayData(chunks.toArray)
  }
}

case class CdcChunks(child: Expression, w: Int, mask: Int)
    extends UnaryExpression {
  // w <= 9 keeps every intermediate below int64 (cp < 0x110000,
  // 31^8 ~ 8.5e11, w * cp * 31^(w-1) ~ 8e18 > Long.MaxValue at w = 10):
  // beyond that the window hash would wrap negative and silently diverge
  // from the DuckDB-reproducible definition the docstring promises
  require(w > 0 && w <= 9, s"window must be in [1, 9], got $w")
  require(mask > 0, "mask must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(v: Any): Any =
    CdcChunks.compute(v.asInstanceOf[UTF8String], w, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.etl.expressions.CdcChunks.compute($c, $w, $mask)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
