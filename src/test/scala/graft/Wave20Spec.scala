package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-20 queries (q214–q217) beyond the
  * DuckDB gate: the streaming mixture's row-for-row identity with the
  * batch chain (the gate both share is one oracle; this makes the
  * stream ≡ batch invariant fail loudly in CI too), the curriculum
  * packing's reconciliation against the q209 schedule, the IVF
  * operating point's monotone frontier and its all-cells brute-force
  * endpoint, and the repack-churn card's conservation identities.
  */
class Wave20Spec extends SparkSpec {

  test("q214 streaming mixture is row-identical to the q212 batch chain") {
    slowGate()
    val stream = SparkEntry.queries("q214_stream_mixture")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val batch = SparkEntry.queries("q212_doremi_chained")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(stream.length == batch.length && stream.length == 20)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"stream row $s != batch row $b")
    }
  }

  test("q215 curriculum packing reconciles with the q209 schedule and " +
      "its own waste identities") {
    val pack = SparkEntry.queries("q215_curriculum_packing")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val sched = SparkEntry.queries("q209_curriculum_phases")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pack.keySet == Set(1L, 2L, 3L) && sched.keySet == pack.keySet)
    pack.foreach { case (ph, (nDocs, nSeqs, kept, pad, trunc)) =>
      // same docs, same token mass as the schedule row (kept + truncated
      // = the phase's ws tokens; no doc lost between the two views)
      assert(nDocs == sched(ph)._1, s"phase $ph doc count != schedule")
      assert(kept + trunc == sched(ph)._2, s"phase $ph token mass != schedule")
      assert(pad == nSeqs * 512 - kept, s"phase $ph pad identity broken")
      // enough sequences to hold the kept mass, never absurdly many
      assert(nSeqs >= (kept + 511) / 512 && nSeqs <= nDocs)
    }
  }

  test("q216 IVF operating point: monotone frontier, brute-force " +
      "endpoint at 16 probes, unique argmin pick") {
    val rows = SparkEntry.queries("q216_ivf_operating_point")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2, "candidate count not increasing with probes")
      assert(b._3 > a._3, "scan fraction not increasing with probes")
      assert(b._4 >= a._4, "recall decreased with more probes")
    }
    // probing all 16 cells IS the brute-force scan: every usable pair
    // is a candidate and the top-3 equals the exact truth
    assert(rows.last._3 == 1.0, "16-probe scan fraction != 1")
    assert(rows.last._4 == 1.0, "16-probe recall != 1")
    // exactly one pick, and it is the total_cost argmin (probe-count
    // tie-break)
    assert(rows.map(_._6).sum == 1L)
    val best = rows.minBy(r => (1.0 - r._4 + r._3, r._1))
    assert(best._6 == 1L, "picked row is not the cost argmin")
    rows.foreach { case (_, _, sf, rc, tc, _) =>
      assert(tc == BigDecimal(1.0 - rc + sf)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q217 repack churn: conservation against the two packings and " +
      "the churn arithmetic") {
    val rows = SparkEntry.queries("q217_repack_churn")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (src, base, stable, movedSeq, delta, churn) =>
      assert(stable + movedSeq <= base,
        s"$src: stable + moved exceeds base docs")
      assert(churn == rd(1.0 - stable.toDouble / base),
        s"$src: churn arithmetic broken")
      assert(delta >= 0)
    }
    // the base-side totals are the base slice's tokenized doc count
    val docs = graft.util.Tables.documents(spark, sf0001)
    def tokCount(deltaSide: Boolean) = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2") === deltaSide)
      .filter(size(graft.ext.TextAnalysis.normWords(col("text"))) > 0)
      .count()
    assert(rows.map(_._2).sum == tokCount(deltaSide = false),
      "base doc totals diverge from the corpus slice")
    assert(rows.map(_._5).sum == tokCount(deltaSide = true),
      "delta doc totals diverge from the corpus slice")
    // the card must show real churn on this fixture (the FFD
    // instability it exists to expose), and real stability too
    assert(rows.exists(_._6 > 0.0) && rows.map(_._3).sum > 0)
    assert(rows.map(_._3).sum < rows.map(_._2).sum,
      "every doc moved — suspicious")
  }
}
