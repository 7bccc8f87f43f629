package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-18 queries (q202–q207) beyond the
  * DuckDB gate: the operating-point card's theory legs (data-
  * independent constants of the S-curve, so pinned to exact values),
  * the source-overlap matrix's recount identity, the effective-epoch
  * card's conservation/decay invariants, the DoReMi step's
  * stochastic-vector and monotonicity properties, the duplication
  * profile's mass pins, and the contamination-velocity roll-up
  * (whose batch totals must re-aggregate to q59's doc totals).
  */
class Wave18Spec extends SparkSpec {

  test("q202 operating point: exact theory constants, argmin unique, " +
      "measured legs equal the q201 sweep") {
    val rows = SparkEntry.queries("q202_lsh_operating_point")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    // the theory areas depend only on (b, r) and the 200-point grid —
    // data-independent constants, pinned exactly
    assert(rows(1L)._1 == 0.441194 && rows(1L)._2 == 0.0)
    assert(rows(2L)._1 == 0.207880 && rows(2L)._2 == 0.007418)
    assert(rows(4L)._1 == 0.023733 && rows(4L)._2 == 0.141531)
    rows.values.foreach { case (fp, fn, te, _, _) =>
      assert(math.abs(te - BigDecimal(fp + fn)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0,
        "total_err is not the rounded sum of its parts")
    }
    // equal-weight FP/FN at tau = 0.5 picks the high-precision end;
    // exactly one row is chosen
    assert(rows.values.map(_._4).sum == 1L)
    assert(rows(4L)._4 == 1L, "equal-weight argmin should pick r=4")
    // the measured pair counts are the q201 sweep's, verbatim
    val sweep = SparkEntry.queries("q201_lsh_band_sweep")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.map { case (r, v) => r -> v._5 } == sweep,
      "operating-point measured legs diverged from the sweep")
  }

  test("q203 source overlap: ordered pairs and the near-dup recount " +
      "identity") {
    val rows = SparkEntry.queries("q203_source_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nd, ex) =>
      assert(a <= b, s"pair ($a, $b) not ordered")
      assert(nd >= 0 && ex >= 0)
      assert(nd > 0 || ex > 0, s"vacuous row ($a, $b)")
    }
    // recount: the matrix's near-dup total must equal the production
    // candidate-pair count (q45's rule) — every pair lands in exactly
    // one (least, greatest) cell
    val prod = graft.ext.Dedup.minhashCandidates(
      graft.ext.Dedup.bandedSignatures(
        graft.util.Tables.documents(spark, sf0001), "text", "doc_id"))
      .filter(col("n_bands") >= 2).count()
    assert(rows.map(_._3).sum == prod, "matrix total != candidate count")
  }

  test("q204 effective epochs: weights sum to 1, decay engages exactly " +
      "when the language repeats") {
    val rows = SparkEntry.queries("q204_effective_epochs")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getLong(7))).toMap
    assert(rows.keySet == Set("de", "en", "es", "fr", "zh"))
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-5,
      "temperature weights are not a distribution")
    // the budget is one corpus: allocations re-sum to the token total
    val tot = rows.values.map(_._1).sum.toDouble
    assert(math.abs(rows.values.map(_._3).sum - tot) < 0.1,
      "allocations do not conserve the budget")
    rows.foreach { case (lang, (nt, _, alloc, e, eff, effic, rep)) =>
      assert(math.abs(e * nt - alloc) < 0.05 * nt.max(1L),
        s"$lang: epochs inconsistent with allocation")
      assert(eff <= alloc + 0.01, s"$lang: effective tokens exceed budget")
      assert((rep == 1L) == (e > 1.0), s"$lang: repeat flag wrong")
      if (rep == 0L)
        assert(effic == 1.0, s"$lang: unrepeated data discounted")
      else assert(effic < 1.0, s"$lang: repeated data not discounted")
    }
    // the fixture's head language stays under one epoch, the boosted
    // tail crosses it — both decay branches exercised
    assert(rows("en")._7 == 0L && rows("de")._7 == 1L)
  }

  test("q205 DoReMi step: stochastic weight vector, EG monotone in " +
      "excess loss") {
    val rows = SparkEntry.queries("q205_doremi_step")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 20)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4,
      "updated weights are not a distribution")
    assert(rows.map(_._3).min == 0.0, "the argmax-quality source must " +
      "have zero excess loss")
    // equal priors at this fixture, so EG is strictly monotone:
    // more excess loss => strictly more weight; the best source is
    // down-weighted by normalization
    val byExcess = rows.sortBy(_._3)
    assert(byExcess.map(_._5).sameElements(byExcess.map(_._5).sorted),
      "EG update not monotone in excess loss")
    assert(byExcess.head._6 < 1.0, "best source not down-weighted")
    assert(byExcess.last._6 > 1.0, "worst source not up-weighted")
  }

  test("q206 duplication profile: conservation and the fixture's " +
      "duplicated mass") {
    val rows = SparkEntry.queries("q206_duplication_profile")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 500)
    rows.foreach { case (id, ns, nd, frac) =>
      assert(nd >= 0 && nd <= ns, s"doc $id: dup spans exceed spans")
      assert(frac == BigDecimal(nd.toDouble / ns)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id: dup_frac inconsistent")
    }
    // the fixture's planted cross-doc duplication (boilerplate + near-
    // dup families): 97 affected docs, 370 of 3708 spans duplicated
    assert(rows.count(_._3 > 0) == 97)
    assert(rows.map(_._3).sum == 370L && rows.map(_._2).sum == 3708L)
  }

  test("q207 contamination velocity: batch totals re-aggregate to " +
      "q59's doc-level report") {
    val rows = SparkEntry.queries("q207_contamination_velocity")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    rows.foreach { case (b, nd, nf, rate, _) =>
      assert(nf <= nd, s"batch $b: more flags than docs")
      assert(rate == BigDecimal(nf.toDouble / nd)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"batch $b: flag_rate inconsistent")
    }
    val q59 = SparkEntry.queries("q59_decontaminate")(spark, sf0001)
      .collect().map(r => r.getLong(1))
    assert(rows.map(_._3).count(_ > 0) >= 1, "no batch carries the leak")
    assert(rows.map(_._5).sum == q59.sum, "gram totals diverge from q59")
    assert(rows.map(_._3).sum == q59.length.toLong,
      "flagged-doc total diverges from q59's row count")
    // n_docs counts ALL train docs (short gram-less docs included)
    assert(rows.map(_._2).sum >= q59.length.toLong)
  }
}
