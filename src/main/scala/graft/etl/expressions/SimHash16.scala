package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a document in one pass: lowercase, whitespace
  * tokens, one md5 per token, bit j set when the majority of tokens
  * have an odd hex nibble j (the ±1 vote of classic SimHash).
  *
  * Bit-identical to the composed form
  * `simhashFromDigests(transform(wsTokens(lower(text)), md5))` but with
  * no digest-string materialization and no 16-term filter/substring
  * expression tree. A round-1 attempt at widening the per-token
  * expression tree made Janino compile time explode (26 s vs 9 s cold);
  * this keeps codegen to a single static call, which is the pattern that
  * worked for MinhashBands/NGramJaccard.
  *
  * Whitespace here is Java-regex `\s` (ASCII), exactly what
  * `split(text, "\\s+")` uses — NOT `Character.isWhitespace`, which
  * would also split on Unicode spaces and diverge from the oracle.
  */
object SimHash16 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  def compute(s: UTF8String): Long = {
    val t = s.toLowerCase.toString
    val len = t.length
    val md = digests.get()
    val scratch = new Array[Byte](16)
    val odd = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (!isSep(t.charAt(i))) {
        var j = i + 1
        while (j < len && !isSep(t.charAt(j))) j += 1
        md.reset()
        md.update(t.substring(i, j)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest(scratch, 0, 16)
        var b = 0
        while (b < 16) {
          val nibble =
            if (b % 2 == 0) (scratch(b / 2) >> 4) & 0xf else scratch(b / 2) & 0xf
          odd(b) += (nibble & 1)
          b += 1
        }
        nTok += 1
        i = j
      } else i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (2 * odd(b) > nTok) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"
  override protected def nullSafeEval(v: Any): Any =
    SimHash16.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.etl.expressions.SimHash16.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
