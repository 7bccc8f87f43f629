package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct md5-prefix hashes of a document's normalized word n-grams,
  * in one pass per row.
  *
  * Bit-identical to the composed pipeline
  * `array_distinct(transform(wordNGrams(normWords(text), n),
  * g => substring(md5(g), 1, p)))` — lowercase, tokenize on
  * `[^a-z0-9]+` runs, slide an n-token window joined by single spaces,
  * md5 each gram, keep the first `p` hex chars, dedupe preserving first
  * occurrence — but without the interpreted higher-order-function chain
  * (lambdas have no codegen and allocate per position: measured ~7 s
  * for the composed form at sf0.1 vs ~1.5 s here). Feeds the
  * decontamination (q59) and duplicated-text (q62) operators, where the
  * hash, not the gram text, is the join/shuffle key at 100 TB.
  *
  * Scale note: normalization mirrors the reference's accent-blind
  * matching posture (`consolidate_events.py:18-26` normalizes before
  * comparing); non-ASCII chars lower to non-ASCII and act as
  * separators, exactly like the regex form.
  */
object WordGramHashes {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  def compute(s: UTF8String, n: Int, prefixChars: Int): ArrayData = {
    val t = s.toLowerCase.toString
    val len = t.length
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      if (isWordChar(t.charAt(i))) {
        var j = i + 1
        while (j < len && isWordChar(t.charAt(j))) j += 1
        tokens.add(t.substring(i, j))
        i = j
      } else i += 1
    }
    val m = tokens.size - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val md = digests.get()
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens.get(g + k))
        k += 1
      }
      md.reset()
      val dg = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hexed = new Array[Char](prefixChars)
      var b = 0
      while (b < prefixChars) {
        val byte = dg(b / 2)
        hexed(b) = if (b % 2 == 0) HEX((byte >> 4) & 0xf) else HEX(byte & 0xf)
        b += 1
      }
      seen.add(new String(hexed))
      g += 1
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      arr(idx) = UTF8String.fromString(it.next())
      idx += 1
    }
    new GenericArrayData(arr)
  }
}

case class WordGramHashes(child: Expression, n: Int, prefixChars: Int)
    extends UnaryExpression {
  require(n > 0, "gram size must be positive")
  require(prefixChars > 0 && prefixChars <= 32, "md5 hex prefix is 1..32 chars")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_gram_hashes"
  override protected def nullSafeEval(v: Any): Any =
    WordGramHashes.compute(v.asInstanceOf[UTF8String], n, prefixChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.etl.expressions.WordGramHashes.compute($c, $n, $prefixChars)")
  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}
