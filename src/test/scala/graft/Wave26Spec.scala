package graft

/** Value-level pins for the wave-26 queries: the IVF-PQ residual
  * recall card, the training-order manifest's round-robin + resume
  * contract, and the chained-release water-fill's monotonicity.
  */
class Wave26Spec extends SparkSpec {

  test("q229 IVF-PQ: shared routing, recall arithmetic, residual " +
      "encoding beats flat on the trained cells (fixture pin)") {
    slowGate()
    val rows = SparkEntry.queries("q229_ivfpq_residual")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("flat_pq", "ivfpq_residual"))
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (v, nt, nf, rec, _) =>
      assert(nt == 150, s"$v: truth side should be 50 queries x top-3")
      assert(nf >= 0 && nf <= nt)
      assert(rec == rd(nf.toDouble / nt), s"$v: recall arithmetic broken")
    }
    // both variants route on the SAME trained cells -> same candidates
    assert(rows.map(_._5).distinct.length == 1 && rows.head._5 > 0,
      "variants should share one candidate budget")
    // the Jégou argument, measured: residual encoding under trained
    // coarse cells beats raw-vector encoding (fixture-pinned — with
    // UNTRAINED cells the residual leg loses, which is the point)
    val byV = rows.map(r => r._1 -> r._4).toMap
    assert(byV("ivfpq_residual") >= byV("flat_pq"),
      "residual encoding should not lose to flat on trained cells")
  }

  test("q230 training order: a dense global rank, per-source round-" +
      "robin, shard offsets consistent, and cursor-resume equivalence") {
    val rows = SparkEntry.queries("q230_training_order")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // dense 0..n-1 global rank in output order
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // round-robin: global order is lexicographic (src_pos, source) —
    // every source's k-th sequence precedes any source's (k+1)-th
    val keys = rows.map(r => (r._6, r._2))
    assert(keys.sameElements(keys.sortBy(identity)),
      "global order is not the (src_pos, source) round-robin")
    // src_pos dense per source
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._6).sorted.sameElements(rs.indices.map(_.toLong)),
        s"$src: src_pos not dense")
    }
    // shard_offset is the global order restricted to the shard
    rows.groupBy(_._4).foreach { case (sh, rs) =>
      val inOrder = rs.sortBy(_._1).map(_._5)
      assert(inOrder.sameElements(rs.indices.map(_.toLong)),
        s"shard $sh: offsets are not the order restricted to the shard")
    }
    // RESUME equivalence: the suffix recomputed from a cursor's
    // (src_pos, source) key — no global state — equals the tail of
    // the full order (the contract that makes a (shard, offset)
    // checkpoint sufficient to restart a loader)
    val cur = rows(rows.length / 3)
    val resumed = rows.filter(r =>
      r._6 > cur._6 || (r._6 == cur._6 && r._2 > cur._2)).sortBy(_._1)
    val suffix = rows.filter(_._1 > cur._1).sortBy(_._1)
    assert(resumed.toSeq == suffix.toSeq,
      "cursor-key resume does not reproduce the order suffix")
  }

  test("q231 chained water-fill: caps exact, epochs bounded, and no " +
      "language's allocation drops as the corpus grows") {
    val rows = SparkEntry.queries("q231_release_waterfill")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7),
        r.getDouble(8)))
    val v1 = rows.filter(_._1 == "v1"); val v2 = rows.filter(_._1 == "v2")
    assert(v1.nonEmpty && v1.map(_._2).toSet == v2.map(_._2).toSet)
    rows.foreach { case (rel, lang, nt, fin, epochs, capped, _, _) =>
      if (capped == 1L) {
        assert(math.abs(fin - 4.0 * nt) < 0.01, s"$rel/$lang: cap not exact")
      }
      assert(epochs <= 4.0 + 1e-6, s"$rel/$lang: over the 4-epoch wall")
    }
    // the corpus only grows v1 -> v2
    val n1 = v1.map(r => r._2 -> r._3).toMap
    v2.foreach { case (_, lang, nt, _, _, _, _, _) =>
      assert(nt >= n1(lang), s"$lang: corpus shrank across releases")
    }
    // monotonicity: growth never shrinks an allocation, and v2 rows
    // carry v1's allocation as prev (the chain is honest)
    val f1 = v1.map(r => r._2 -> r._4).toMap
    v2.foreach { case (_, lang, _, fin, _, _, prev, growth) =>
      assert(prev == f1(lang), s"$lang: prev_alloc is not v1's final")
      assert(growth >= -0.01 && math.abs(fin - prev - growth) < 0.01,
        s"$lang: allocation dropped or growth arithmetic broken")
    }
  }
}
