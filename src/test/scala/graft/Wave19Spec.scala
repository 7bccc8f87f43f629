package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-19 queries (q208–q213) beyond the
  * DuckDB gate: the shard manifest's conservation against the q195
  * packing it deals out, the curriculum schedule's token conservation
  * and monotone quality, the repeat-value curve's monotonicity (more
  * budget never buys fewer effective tokens, never at better
  * efficiency), the quota sample's exact take rule, the chained
  * DoReMi boost-ordering identity (the chain's cumulative multiplier
  * is exp of the summed excess, so boost ordering must equal total-
  * excess ordering), and the staleness card's recall arithmetic.
  */
class Wave19Spec extends SparkSpec {

  test("q208 shard manifest: conserves the q195 packing, pad identity, " +
      "load ratios average 1") {
    val rows = SparkEntry.queries("q208_shard_manifest")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { case (sh, nSeqs, nDocs, kept, pad, ratio) =>
      assert(sh >= 0 && sh < 8, s"shard_id $sh out of range")
      assert(pad == nSeqs * 512 - kept, s"pad identity broken on shard $sh")
      assert(nDocs >= nSeqs, s"shard $sh has fewer docs than sequences")
      assert(ratio > 0.0)
    }
    // conservation: the shards re-sum to the q195 manifest exactly
    val packed = SparkEntry.queries("q195_pack_ffd")(spark, sf0001)
      .agg(sum(col("n_kept")), count(lit(1))).collect().head
    assert(rows.map(_._4).sum == packed.getLong(0),
      "shard kept tokens != packed kept tokens")
    assert(rows.map(_._3).sum == packed.getLong(1),
      "shard doc count != packed doc count")
    // the load ratios are deviations from the 8-way-even ideal: they
    // re-average to 1 over the nominal 8 shards by construction
    assert(math.abs(rows.map(_._6).sum - 8.0) < 1e-4,
      "load ratios do not sum to the nominal shard count")
  }

  test("q209 curriculum: three phases, token conservation, monotone " +
      "quality, cumulative share closes at 1") {
    val rows = SparkEntry.queries("q209_curriculum_phases")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val corpus = graft.util.Tables.documents(spark, sf0001)
      .agg(sum(size(graft.ext.TextAnalysis.wsTokens(col("text")))
        .cast("long")), count(lit(1))).collect().head
    assert(rows.map(_._2).sum == corpus.getLong(1),
      "phases do not partition the corpus docs")
    // terciles of a 500-doc corpus: phase sizes within 1 of each other
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "tercile phases are not near-equal in docs")
    // mean quality strictly increases along the schedule (the whole
    // point of a curriculum)
    assert(rows(0)._4 < rows(1)._4 && rows(1)._4 < rows(2)._4,
      "phase mean quality is not increasing")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4,
      "token shares are not a distribution")
    assert(rows.last._6 == 1.0, "cumulative share does not close at 1")
    // cumulative share is the running sum of the shares
    assert(math.abs(rows(1)._6 - (rows(0)._5 + rows(1)._5)) < 2e-6)
  }

  test("q210 repeat-value curve: effective tokens monotone up, " +
      "efficiency monotone down, decay engages only past 1 epoch") {
    val rows = SparkEntry.queries("q210_repeat_value_curve")(spark, sf0001)
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.5, 1.0, 2.0, 4.0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2, "budgets not increasing")
      assert(b._3 >= a._3, "more budget bought fewer effective tokens")
      assert(b._4 <= a._4, "more budget at BETTER efficiency")
      assert(b._5 >= a._5 && b._6 >= a._6,
        "repeat/over-4 counts not monotone in budget")
    }
    rows.foreach { case (m, budget, eff, effic, nRep, nOver) =>
      assert(eff <= budget + 0.01, s"effective tokens exceed the budget at $m")
      // no language repeating => every token is first-epoch => exactly 1
      if (nRep == 0L) assert(effic == 1.0,
        s"no repeats at $m but efficiency != 1")
      assert(nOver <= nRep, "over-4 languages must also be repeats")
    }
  }

  test("q211 quota sample: exact take rule, binding and non-binding " +
      "regimes both present, fingerprints well-formed") {
    val rows = SparkEntry.queries("q211_quota_sample")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getString(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, src, elig, taken, cov, toks, fp) =>
      assert(taken == math.min(8L, elig), s"take rule broken at ($lang, $src)")
      assert(math.abs(cov - BigDecimal(taken.toDouble / elig)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
      assert(toks >= 0)
      assert(fp != null && fp.length == 16 && fp.forall(c =>
        "0123456789abcdef".contains(c)), s"bad fingerprint at ($lang, $src)")
    }
    assert(rows.exists(_._3 > 8), "quota never binds on this fixture")
    assert(rows.exists(r => r._3 <= 8 && r._4 == r._3),
      "no non-binding cell on this fixture")
    assert(rows.map(_._3).sum == 500L, "cells do not partition the corpus")
  }

  test("q212 chained DoReMi: every weight column is a distribution and " +
      "boost ordering equals total-excess ordering") {
    val rows = SparkEntry.queries("q212_doremi_chained")(spark, sf0001)
      .collect()
      .map { r =>
        def d(i: Int): Option[Double] =
          if (r.isNullAt(i)) None else Some(r.getDouble(i))
        (r.getString(0), r.getLong(1), d(2), d(3), d(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8),
          r.getDouble(9))
      }
    assert(rows.length == 20)
    Seq(rows.map(_._6), rows.map(_._7), rows.map(_._8), rows.map(_._9))
      .zipWithIndex.foreach { case (ws, k) =>
        assert(math.abs(ws.sum - 1.0) < 1e-4, s"w$k is not a distribution")
        assert(ws.forall(_ > 0.0), s"w$k has a non-positive weight")
      }
    // w3 = w0 * exp(e0+e1+e2) / (Z1 Z2 Z3): the normalizers are shared
    // across sources, so boost ordering must match total-excess
    // ordering exactly
    val x0 = rows.flatMap(_._3).max
    val x1 = rows.flatMap(_._4).max
    val x2 = rows.flatMap(_._5).max
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byExcess = rows.map { r =>
      val e = r._3.map(m => rd(x0 - m)).getOrElse(0.0) +
        r._4.map(m => rd(x1 - m)).getOrElse(0.0) +
        r._5.map(m => rd(x2 - m)).getOrElse(0.0)
      (r._1, e, r._10)
    }
    byExcess.combinations(2).foreach { case Array((sa, ea, ba), (sb, eb, bb)) =>
      if (ea > eb + 1e-9) assert(ba >= bb,
        s"$sa has more total excess than $sb but a smaller boost")
    }
  }

  test("q213 staleness: recall arithmetic, truth size 3, maintenance " +
      "never loses and strictly gains somewhere") {
    val rows = SparkEntry.queries("q213_index_staleness")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (q, sh, mh, sr, mr, g) =>
      assert(sh >= 0 && sh <= 3 && mh >= 0 && mh <= 3)
      assert(g == mh - sh, s"gain identity broken at query $q")
      assert(sr == rd(sh.toDouble / 3.0) && mr == rd(mh.toDouble / 3.0),
        s"recall arithmetic broken at query $q")
    }
    // the TRUE invariant is aggregate: maintenance strictly recovers
    // hits overall. Per-query dominance is NOT a theorem — a delta
    // vector can crowd a base truth hit out of the probed top-3, so a
    // fixture/embedding change could legitimately produce an isolated
    // negative gain (ADVICE r15). Tolerate isolated losses; a losing
    // MAJORITY would still mean the maintenance path is broken.
    assert(rows.map(_._6).sum > 0, "maintenance bought nothing")
    val lost = rows.count(_._6 < 0)
    assert(lost * 2 < rows.length,
      s"$lost of ${rows.length} queries LOST recall under maintenance")
  }
}
