package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 16-band MinHash signature of a string.
  *
  * Element `j` (0-based) is the minimum `md5(shingle)` hex digest over
  * the k-shingles whose digest starts with hex nibble `j`, or NULL when
  * no shingle lands in that band — bit-identical to the composed
  * pipeline `explode(char_shingles(s,k)) → md5 → groupBy(doc, nibble)
  * → min → pivot`, but computed per row with ZERO shuffles and no
  * 300×-per-document explode blowup (measured: the explode+groupBy+
  * pivot chain added ~2.7 s at sf0.1/32 threads and its shuffle volume
  * scales with total shingle count, i.e. with corpus bytes, at 100 TB).
  *
  * Duplicate shingles need no dedup: a band minimum is unaffected by
  * multiplicity. md5-as-minhash keeps the construction deterministic
  * and portable to any SQL engine for oracle checks (reference scale
  * posture: SURVEY.md §7.4 "similarity at scale").
  */
object MinhashBands {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic byte compare == hex-string compare. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(s: UTF8String, k: Int): ArrayData = {
    // Byte-offset walk instead of substringSQL per position: one char →
    // byte-offset table, then each shingle is an (offset, len) window
    // into the backing bytes — no UTF8String/byte[] allocation per
    // position, one reusable digest scratch (allocation only when a
    // band minimum is adopted). ~10M shingle digests per 5k docs at
    // sf0.1 made this the dedup family's hot inner loop.
    val bytes = s.getBytes
    val n = s.numChars()
    val offs = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(n) = bytes.length
    val last = math.max(n - k + 1, 1)
    val mins = new Array[Array[Byte]](16)
    val md = digests.get()
    val scratch = new Array[Byte](16)
    var i = 0
    while (i < last) {
      val from = offs(i)
      val until = offs(math.min(i + k, n))
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(scratch, 0, 16)
      val band = (scratch(0) >> 4) & 0xf
      if (mins(band) == null || less(scratch, mins(band)))
        mins(band) = java.util.Arrays.copyOf(scratch, 16)
      i += 1
    }
    val out = new Array[AnyRef](16)
    var j = 0
    while (j < 16) {
      if (mins(j) != null) out(j) = hex(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MinhashBands(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"
  override protected def nullSafeEval(v: Any): Any =
    MinhashBands.compute(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.etl.expressions.MinhashBands.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}
