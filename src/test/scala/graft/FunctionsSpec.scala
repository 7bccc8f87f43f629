package graft

import org.apache.spark.sql.functions._

import graft.etl.{Functions => F}

/** Scalar-function vectors lifted from reference behavior
  * (FIXTURES.md §B.2; semantics cited per function in Functions.scala).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("CentsMean ignores NULLs exactly like avg()") {
    val centsMean = udaf(graft.etl.Aggregators.CentsMean)
    val df = Seq(Some(100.0), None, Some(50.0), None)
      .toDF("v")
    val r = df.agg(centsMean(col("v")).as("cm"), avg(col("v")).as("a"))
      .collect()(0)
    assert(r.getDouble(0) == 75.0, "NULL must not deflate the mean")
    assert(r.getDouble(0) == r.getDouble(1))
    // all-NULL group: NULL out, matching avg() and the DuckDB oracle
    val empty = Seq[Option[Double]](None, None).toDF("v")
      .agg(centsMean(col("v"))).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("parse_money: French formats (shotgun.py:33-39)") {
    assert(one(F.parseMoney(lit("1 234,56 €"))) == 1234.56)
    assert(one(F.parseMoney(lit("12.345"))) == 12345.0)
    assert(one(F.parseMoney(lit("-42,5"))) == -42.5)
    assert(one(F.parseMoney(lit("no digits"))) == null)
  }

  test("parse_int_first (shotgun.py:41-45)") {
    assert(one(F.parseIntFirst(lit("1 234 billets"))) == 1L)   // nbsp → space splits digits
    assert(one(F.parseIntFirst(lit("1234 billets"))) == 1234L)
    assert(one(F.parseIntFirst(lit("xyz"))) == null)
  }

  test("slug + stable id match reference sha1 (shotgun.py:47-54)") {
    assert(one(F.slug(lit("Électro Fête @ Le Trianon"))) == "electro-fete-le-trianon")
    // expected values computed with the reference Python implementation
    assert(one(F.stableEventId(lit("Électro Fête @ Le Trianon"), lit("2025-10-10")))
      == "electro-fete-le-trianon-a716972b")
    assert(one(F.stableEventId(lit(""), lit("2025-10-10"))).toString.startsWith("event-"))
  }

  test("norm_name drops live/concert/tour (matching.py:11-17)") {
    assert(one(F.normName(lit("DJ Snake Live"))) == "dj snake")
    assert(one(F.normName(lit("Grand Concert de Noël"))) == "grand de noel")
    assert(one(F.normName(lit(null))) == "")
  }

  test("artist tokens: separators + 26 stopwords (consolidate_events.py:40-59)") {
    def toks(s: String): Set[String] =
      one(F.artistTokensOne(lit(s))).asInstanceOf[scala.collection.Seq[String]].toSeq.toSet
    assert(toks("A feat B") == Set.empty) // single letters dropped (len<=2)
    assert(toks("Alpha feat Beta") == Set("alpha", "beta"))
    assert(toks("Alpha x Beta") == Set("alpha", "beta"))
    assert(toks("Alpha & Beta + Gamma / Delta") == Set("alpha", "beta", "gamma", "delta"))
    assert(toks("Électro Fête @ Le Trianon") == Set("electro", "fete", "trianon"))
    assert(toks("the and with chez aux") == Set.empty)
  }

  test("round5 + canonical key (matching.py:19-27)") {
    assert(one(F.canonicalKey(lit("DJ Snake Live"),
      lit("2025-10-10 19:33:21").cast("timestamp"))) == "dj snake|2025-10-10T19:30")
    assert(one(F.canonicalKey(lit("Xx"), lit(null).cast("timestamp"))) == "xx|na")
    assert(one(F.canonicalKey(lit(null), lit(null).cast("timestamp"))) == "|na")
  }

  test("status derivation (shotgun.py:434-436)") {
    assert(one(F.statusOf(lit("Complet — sold out"))) == "sold out")
    assert(one(F.statusOf(lit("en vente"))) == "on sale")
    assert(one(F.statusOf(lit(null))) == "on sale")
  }

  test("digit coercion (dice.py:126-132)") {
    assert(one(F.digitCoerce(lit("0123"))) == 123L)
    assert(one(F.digitCoerce(lit("12a"))) == null)
  }

  test("artist/venue guess (shotgun.py:86-111)") {
    assert(one(F.guessArtist(lit("Artist @ Venue"), lit(null))) == "Artist")
    assert(one(F.guessVenue(lit("Artist @ Venue"), lit(null))) == "Venue")
    assert(one(F.guessArtist(lit("Artist — Venue"), lit("Hint"))) == "Hint")
    assert(one(F.guessArtist(lit("Solo  Show"), lit(null))) == "Solo Show")
    assert(one(F.guessVenue(lit("Solo Show"), lit(null))) == null)
  }

  test("iso render (dice.py:65-66)") {
    assert(one(F.isoZ(lit("2025-10-10 19:30:00").cast("timestamp")))
      == "2025-10-10T19:30:00Z")
  }
}
