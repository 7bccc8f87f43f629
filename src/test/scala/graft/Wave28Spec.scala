package graft

/** Value-level pins for the round-17 work: the closed-form
  * interleaveRank that replaced the q230/q233 total-order windows
  * (VERDICT r16 #1) must reproduce the window rank row-for-row, on
  * BOTH the fresh-release block (spans from 0) and the appended block
  * (spans offset past the released per-source counts).
  */
class Wave28Spec extends SparkSpec {

  test("q230: closed-form global_pos ≡ the (src_pos, source) window " +
      "rank row-for-row") {
    val rows = SparkEntry.queries("q230_training_order")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(rows.nonEmpty)
    // the window definition, replayed exactly: row_number() over
    // ORDER BY (src_pos, source) — the arithmetic must equal it
    val expected = rows.sortBy(r => (r._4, r._2)).zipWithIndex
      .map { case (r, i) => (r._2, r._3) -> i.toLong }.toMap
    rows.foreach { r =>
      assert(r._1 == expected((r._2, r._3)),
        s"${r._2}/${r._3}: arithmetic rank ${r._1} != window rank " +
          s"${expected((r._2, r._3))}")
    }
  }

  test("q233: closed-form ranks ≡ window ranks row-for-row in BOTH " +
      "blocks (offset spans included)") {
    val rows = SparkEntry.queries("q233_order_append")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(5),
        r.getString(9)))
    val rel = rows.filter(_._5 == "released")
    val app = rows.filter(_._5 == "appended")
    assert(rel.nonEmpty && app.nonEmpty)
    def windowRank(rs: Array[(Long, String, Long, Long, String)],
        offset: Long) =
      rs.sortBy(r => (r._4, r._2)).zipWithIndex
        .map { case (r, i) => (r._2, r._3) -> (offset + i) }.toMap
    val expRel = windowRank(rel, 0L)
    rel.foreach(r => assert(r._1 == expRel((r._2, r._3)),
      s"released ${r._2}/${r._3}: arithmetic != window"))
    // the appended block's spans start at the released per-source
    // counts (lo > 0) — the offset branch of the closed form
    val expApp = windowRank(app, rel.length.toLong)
    app.foreach(r => assert(r._1 == expApp((r._2, r._3)),
      s"appended ${r._2}/${r._3}: arithmetic != window"))
  }

  test("q236 mixture order: phase blocks contiguous, weighted " +
      "interleave ≡ exact-fraction sort, prefix shares track the " +
      "committed weights, epochs full+fractional with distinct draws") {
    val rows = SparkEntry.queries("q236_mixture_order")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(7)))
    assert(rows.nonEmpty)
    // dense global rank; phases are contiguous ascending blocks
    assert(rows.sortBy(_._1).map(_._1).toSeq ==
      rows.indices.map(_.toLong))
    val phaseOf = rows.sortBy(_._1).map(_._2)
    assert(phaseOf.sameElements(phaseOf.sorted),
      "a phase interleaves into another phase's block")
    rows.groupBy(_._2).foreach { case (phase, ph) =>
      val n = ph.groupBy(_._3).map { case (s, rs) => s -> rs.length.toLong }
      // WEIGHTED interleave ≡ sort by exact fraction ((src_pos+1)/n_s,
      // source), compared via integer cross-multiplication — the
      // closed form must reproduce it row-for-row
      val sorted = ph.sortWith { (a, b) =>
        val l = (a._6 + 1) * n(b._3); val r = (b._6 + 1) * n(a._3)
        if (l != r) l < r else a._3 < b._3
      }
      val base = ph.map(_._1).min
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r._1 == base + i,
          s"phase $phase ${r._3}/${r._4}/ep${r._5}: closed form != sort")
      }
      // any prefix's per-source share tracks the committed share
      // within |sources| items (prototype-measured bound ~2.3)
      val m = n.size.toLong
      val np = ph.length.toLong
      val cnt = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      sorted.zipWithIndex.foreach { case (r, i) =>
        cnt(r._3) += 1
        val len = i + 1L
        n.foreach { case (s, ns) =>
          assert(math.abs(cnt(s) - len.toDouble * ns / np) <= m.toDouble,
            s"phase $phase prefix $len: $s share off by more than $m")
        }
      }
      // epochs: every full epoch replays ALL the (phase, source)
      // sequences; the final (fractional) epoch takes a strict subset
      // in its OWN draw order; draws are distinct across epochs
      ph.groupBy(_._3).foreach { case (src, rs) =>
        val seqsAll = rs.map(_._4).toSet
        val byEp = rs.groupBy(_._5)
        val maxEp = byEp.keys.max
        byEp.foreach { case (e, es) =>
          if (e < maxEp)
            assert(es.map(_._4).toSet == seqsAll,
              s"phase $phase $src epoch $e: a full pass misses sequences")
        }
        rs.groupBy(_._4).foreach { case (_, dup) =>
          assert(dup.map(_._7).distinct.length == dup.length,
            s"phase $phase $src: repeated sequence reuses a draw")
        }
      }
    }
  }

  test("q237 residual OPQ: the residual-variance balanced layout " +
      "beats identity at the residual rung on recall AND encode MSE") {
    val rows = SparkEntry.queries("q237_residual_opq")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("balanced", "identity"))
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (l, nt, nf, rec, mse) =>
      assert(nt == 150, s"$l: truth side should be 50 queries x top-3")
      assert(nf >= 0 && nf <= nt)
      assert(rec == rd(nf.toDouble / nt), s"$l: recall arithmetic broken")
      assert(mse > 0, s"$l: residual encode MSE must be positive")
    }
    val byL = rows.map(r => r._1 -> r).toMap
    // the q184 theorem carried to the residual rung: on the
    // anisotropic fixture the variance-balanced layout spreads the
    // hot residual dims across subspaces — strictly better encode
    // MSE, and measurably better ADC recall (0.39 vs 0.11 here)
    assert(byL("balanced")._5 < byL("identity")._5,
      "balanced layout should cut the residual encode MSE")
    assert(byL("balanced")._4 > byL("identity")._4,
      "balanced layout should raise ADC recall on the aniso fixture")
  }
}
