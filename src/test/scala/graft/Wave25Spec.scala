package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-25 queries: the streaming decon
  * monitor's row-identity with the q207 batch card, and the
  * water-fill allocator's budget conservation / cap / saturation
  * invariants.
  */
class Wave25Spec extends SparkSpec {

  test("q227 streaming decon monitor is row-identical to the q207 card") {
    val stream = SparkEntry.queries("q227_stream_decon")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val batch = SparkEntry.queries("q207_contamination_velocity")(
        spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    assert(stream.length == batch.length && stream.nonEmpty)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"stream row $s != batch row $b")
    }
  }

  test("q228 water-fill: budget conserved, caps exact, the fixture " +
      "saturates with a positive residual") {
    val rows = SparkEntry.queries("q228_budget_waterfill")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7)))
    assert(rows.length == 5)
    val tot = rows.map(_._2).sum.toDouble
    val budget = 4.5 * tot
    // conservation: final allocations + the reported residual re-sum
    // to the 4x budget (within rounding of the per-lang 2-decimals)
    val residual = rows.head._8
    assert(rows.forall(_._8 == residual), "residual differs across rows")
    assert(math.abs(rows.map(_._5).sum + residual - budget) < 0.5,
      "water-fill does not conserve the budget")
    rows.foreach { case (lang, nt, _, naive, fin, epochs, capped, _) =>
      if (capped > 0) {
        // a capped language sits EXACTLY at the 4-epoch wall
        assert(math.abs(fin - 4.0 * nt) < 0.01, s"$lang: cap not exact")
        assert(math.abs(epochs - 4.0) < 1e-4)
      } else {
        assert(epochs <= 4.0 + 1e-6, s"$lang: uncapped but over the wall")
      }
      assert(fin <= math.max(naive, 4.0 * nt) + 0.01,
        s"$lang: allocation grew past both naive and cap")
    }
    // the 4x fixture saturates: round 1 and round 2 both cap someone,
    // and the corpus cannot absorb the whole budget
    assert(rows.exists(_._7 == 1L) && rows.exists(_._7 == 2L),
      "both water-fill rounds should engage at the 4x budget")
    assert(residual > 0.0, "expected a positive unallocated residual")
  }
}
