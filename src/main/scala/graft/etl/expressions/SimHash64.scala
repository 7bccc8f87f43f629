package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one pass — the production-width
  * fingerprint for hamming-banded near-dup search ([[SimHash16]] is
  * the 16-bit variant whose nibble bands are too coarse past demo
  * scale; 4x16-bit bands over this fingerprint give 65536 buckets per
  * band, so bucket sizes stay small at corpus scale).
  *
  * Bit j (0..63) votes on bit (j mod 4) of hex nibble (j div 4) of
  * md5(token) — i.e. all four bits of the first 16 nibbles — with the
  * classic majority rule. Tokenization matches [[SimHash16]]: Java
  * `\s+` on the lowercased text, one md5 per token, single static
  * call in codegen (a wide per-token expression tree made Janino
  * compile time explode in round 1; this keeps the proven shape).
  */
object SimHash64 {
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
    val votes = new Array[Int](64)
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
        while (b < 64) {
          val nib = b / 4
          val nibble =
            if (nib % 2 == 0) (scratch(nib / 2) >> 4) & 0xf else scratch(nib / 2) & 0xf
          votes(b) += (nibble >> (b % 4)) & 1
          b += 1
        }
        nTok += 1
        i = j
      } else i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * votes(b) > nTok) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.etl.expressions.SimHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
