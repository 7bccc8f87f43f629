package graft.etl.expressions

import java.time.LocalDateTime
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampNTZType}
import org.apache.spark.unsafe.types.UTF8String

/** French-locale datetime parsing → naive-local timestamp (TimestampNTZ).
  *
  * Semantics from `concerts_etl/adapters/shotgun.py:56-84` (`_parse_fr_datetime`)
  * and the inline variants at `shotgun.py:311-373`:
  *  - ISO fast path: strings starting `yyyy-MM-ddT...` parse directly;
  *  - otherwise a French natural-language date: optional weekday, day
  *    number, French month name (full or dotted abbreviation), year,
  *    optional time as `HH:mm` or `HHhmm` / `HHh`.
  * The reference returns a NAIVE Europe/Paris datetime; we mirror that
  * with TimestampNTZType. Year-less phrases (reference: dateparser
  * "PREFER_DATES_FROM future") are out of scope for the deterministic
  * engine and yield NULL.
  *
  * Spark's `to_timestamp` cannot parse abbreviated French month names
  * (locale-fixed patterns), hence a custom expression. Codegen'd via a
  * static helper so it stays inside WholeStageCodegen.
  */
object ParseFrDatetime {
  private val months: Map[String, Int] = Map(
    "janvier" -> 1, "janv" -> 1, "jan" -> 1,
    "fevrier" -> 2, "fevr" -> 2, "fev" -> 2,
    "mars" -> 3, "mar" -> 3,
    "avril" -> 4, "avr" -> 4,
    "mai" -> 5,
    "juin" -> 6,
    "juillet" -> 7, "juil" -> 7, "juille" -> 7,
    "aout" -> 8, "aou" -> 8,
    "septembre" -> 9, "sept" -> 9, "sep" -> 9,
    "octobre" -> 10, "oct" -> 10,
    "novembre" -> 11, "nov" -> 11,
    "decembre" -> 12, "dec" -> 12)

  // 'T' or space separator: the reference falls through to
  // dateparser.parse, which accepts "YYYY-MM-DD HH:MM" — requiring 'T'
  // silently nulled (and FL1 then dropped) every space-separated feed
  private val iso = Pattern.compile("^\\d{4}-\\d{2}-\\d{2}[T ]\\d.*")
  // "ven. 10 oct. 2025 19:30" / "10 octobre 2025" / "10 oct 2025 à 19h30"
  private val fr = Pattern.compile(
    "(?iu)^\\s*(?:[\\p{L}]+\\.?\\s+)?(\\d{1,2})(?:er)?\\s+([\\p{L}]+)\\.?\\s+(\\d{4})" +
      "(?:\\s+(?:a|à)\\s+)?(?:\\s*,?\\s*(\\d{1,2})\\s*[:hH]\\s*(\\d{0,2}))?\\s*$")

  private def accentFold(s: String): String =
    StripAccents.strip(UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))).toString

  /** Returns epoch micros of the naive local datetime, or null. */
  def parse(u: UTF8String): java.lang.Long = {
    if (u == null) return null
    val s = u.toString.trim
    if (s.isEmpty) return null
    if (iso.matcher(s).matches()) {
      try {
        // drop any trailing zone ('Z', '+HH:MM', '-HH:MM') and keep the
        // wall time, like Python's fromisoformat + naive use. A '-'
        // only counts as an offset sign after the 'T' — the date part's
        // hyphens must survive (the time part cannot contain '-').
        val noZ = s.replace("Z", "")
          .replaceFirst("^(\\d{4}-\\d{2}-\\d{2}) ", "$1T")
        val t = noZ.indexOf('T')
        val plus = noZ.indexOf('+', t)
        val minus = noZ.indexOf('-', t + 1)
        val cut = (plus, minus) match {
          case (-1, -1) => noZ.length
          case (-1, m) => m
          case (p, -1) => p
          case (p, m) => math.min(p, m)
        }
        val ldt = LocalDateTime.parse(noZ.substring(0, cut))
        return micros(ldt)
      } catch { case _: Exception => return null }
    }
    // plain ISO date "2025-10-10"
    if (s.matches("^\\d{4}-\\d{2}-\\d{2}$")) {
      try return micros(java.time.LocalDate.parse(s).atStartOfDay())
      catch { case _: Exception => return null }
    }
    val m = fr.matcher(s)
    if (!m.matches()) return null
    val day = m.group(1).toInt
    val monName = accentFold(m.group(2))
    val mon = months.get(monName).orElse(months.get(monName.take(4))).getOrElse(-1)
    if (mon < 0) return null
    val year = m.group(3).toInt
    val hour = Option(m.group(4)).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
    val minute = Option(m.group(5)).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
    try micros(LocalDateTime.of(year, mon, day, hour, minute))
    catch { case _: Exception => null }
  }

  private def micros(ldt: LocalDateTime): java.lang.Long =
    java.lang.Long.valueOf(
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
}

case class ParseFrDatetime(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TimestampNTZType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_fr_datetime"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else ParseFrDatetime.parse(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("parsed")
      s"""
      java.lang.Long $boxed = graft.etl.expressions.ParseFrDatetime.parse($c);
      if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
      """
    })
  override protected def withNewChildInternal(newChild: Expression): ParseFrDatetime =
    copy(child = newChild)
}
