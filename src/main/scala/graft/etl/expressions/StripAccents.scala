package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent stripping: NFKD-normalize then drop combining marks.
  *
  * Semantics from `concerts_etl/core/consolidate_events.py:18-19` (and the
  * duplicates at `adapters/shotgun.py:29-31`, `core/matching.py:14`):
  * `unicodedata.normalize("NFKD", s)` followed by removal of combining
  * characters (`unicodedata.combining(c) != 0`). The JDK exposes no
  * canonical-combining-class API, so the closest category match is
  * `\p{Mn}\p{Me}` (non-spacing + enclosing marks): SPACING marks (Mc)
  * are kept, because they carry ccc=0 and Python keeps them —
  * stripping `\p{M}` wholesale deleted Indic vowel signs (e.g.
  * U+0940 in Devanagari "की") that the reference preserves. Remaining
  * divergence: the rare ccc=0 Mn characters, which Python keeps and
  * this strips — none occur in the reference's Latin-script domain.
  *
  * Spark has no builtin for this; implemented as a codegen'd unary
  * expression (stays inside WholeStageCodegen — no UDF serialization).
  */
object StripAccents {
  private val marks = java.util.regex.Pattern.compile("[\\p{Mn}\\p{Me}]+")
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure-ASCII strings are NFKD fixpoints with no marks.
    var i = 0
    var ascii = true
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else {
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKD)
      UTF8String.fromString(marks.matcher(norm).replaceAll(""))
    }
  }
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(v: Any): Any =
    StripAccents.strip(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.etl.expressions.StripAccents.strip($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
