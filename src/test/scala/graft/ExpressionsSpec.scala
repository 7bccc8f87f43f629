package graft

import org.apache.spark.sql.functions._

import graft.etl.{Functions => F}

/** Custom Catalyst expressions: edge cases + parity with the Python
  * implementations (values computed with unicodedata/difflib directly).
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("strip_accents: NFKD + combining-mark removal") {
    assert(one(F.stripAccents(lit("Électro Fête"))) == "Electro Fete")
    assert(one(F.stripAccents(lit("àéîõü ç ñ"))) == "aeiou c n")
    assert(one(F.stripAccents(lit("plain ASCII 123"))) == "plain ASCII 123")
    assert(one(F.stripAccents(lit(""))) == "")
    assert(one(F.stripAccents(lit(null))) == null)
    // NFKD compatibility forms: ligature + fullwidth
    assert(one(F.stripAccents(lit("ﬁn №"))) == "fin No")
  }

  test("seq_ratio matches difflib.SequenceMatcher.ratio") {
    assert(one(F.seqRatio(lit("Électro Fête @ Le Trianon"),
      lit("Electro Fete @ Le Trianon"))) == 0.92)
    assert(one(F.seqRatio(lit("abc"), lit("abc"))) == 1.0)
    assert(one(F.seqRatio(lit(""), lit(""))) == 1.0)
    assert(one(F.seqRatio(lit("abc"), lit(""))) == 0.0)
    assert(one(F.seqRatio(lit("abcd"), lit("bcde"))) == 0.75)
    // difflib: SequenceMatcher(None,'dj snake','dj snoke').ratio() == 0.875
    assert(one(F.seqRatio(lit("dj snake"), lit("dj snoke"))) == 0.875)
    assert(one(F.seqRatio(lit("abc"), lit(null))) == null)
  }

  test("seq_ratio counts code points, not UTF-16 units (non-BMP parity)") {
    // Python sequences are code-point indexed; each '𝄞' is 2 UTF-16
    // units. Values from difflib.SequenceMatcher(None, a, b).ratio().
    assert(one(F.seqRatio(lit("𝄞𝄞𝄞𝄞𝄞a"), lit("𝄞𝄞𝄞𝄞𝄞b"))) == 0.8333333333333334)
    assert(one(F.seqRatio(lit("𝄞𝄞𝄞x"), lit("𝄞𝄞𝄞"))) == 0.8571428571428571)
    assert(one(F.seqRatio(lit("a🎸b🎸c"), lit("a🎸c"))) == 0.75)
  }

  test("custom expressions compile under codegen — no interpreter fallback") {
    // Janino resolution failures (e.g. a companion-object helper named
    // `eval` shadowed by Expression.eval, as CharShingles once had)
    // silently fall back to interpreted mode AND disable whole-stage
    // codegen for the surrounding plan — force codegen so they throw.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(("Électro Fête", "Electro x Fete", "10 oct. 2025 19:30"))
        .toDF("a", "b", "c")
        .select(
          F.stripAccents(col("a")).as("s"),
          F.seqRatio(col("a"), col("b")).as("r"),
          F.parseFrDatetime(col("c")).as("d"),
          graft.ext.Dedup.charShingles(col("b"), 3).as("g"),
          graft.ext.TextAnalysis.wordGramHashes(col("b"), 2).as("w"))
        .collect()
      assert(out.length == 1 && out(0).getSeq[String](3).nonEmpty
        && out(0).getSeq[String](4).nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("parse_fr_datetime: ISO fast path + French phrases") {
    def p(s: String): String = {
      val v = one(date_format(F.parseFrDatetime(lit(s)), "yyyy-MM-dd HH:mm"))
      if (v == null) null else v.toString
    }
    assert(p("2025-11-29T19:00") == "2025-11-29 19:00")
    assert(p("2025-11-29T19:00:30") == "2025-11-29 19:00")
    assert(p("2025-11-29T19:00:30Z") == "2025-11-29 19:00")
    // offsets of either sign are stripped, keeping the wall time —
    // a negative offset must not be mistaken for a date hyphen
    assert(p("2025-10-10T19:30:00+02:00") == "2025-10-10 19:30")
    assert(p("2025-10-10T19:30:00-05:00") == "2025-10-10 19:30")
    assert(p("2025-10-10") == "2025-10-10 00:00")
    assert(p("ven. 10 oct. 2025 19:30") == "2025-10-10 19:30")
    assert(p("10 octobre 2025") == "2025-10-10 00:00")
    assert(p("1er janvier 2026") == "2026-01-01 00:00")
    assert(p("samedi 29 novembre 2025 à 20h30") == "2025-11-29 20:30")
    assert(p("15 août 2025 21h") == "2025-08-15 21:00")
    assert(p("5 déc. 2025 19:05") == "2025-12-05 19:05")
    assert(p("garbage text") == null)
    assert(p("32 oct. 2025") == null)   // invalid day
    assert(p("10 notamonth 2025") == null)
  }
}
