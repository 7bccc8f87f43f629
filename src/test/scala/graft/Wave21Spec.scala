package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-21 queries (q218–q220) beyond the
  * DuckDB gate: incremental packing's zero-churn/disjoint-range/
  * conservation identities and its measured pad price vs the global
  * re-fold, the tombstone card's decrement arithmetic against the
  * q86 drop list, and the fertility trigger's engaged/quiet regimes.
  */
class Wave21Spec extends SparkSpec {

  test("q218 incremental packing: immutable base, disjoint seq ranges, " +
      "token conservation, and the pad price vs the global fold") {
    val rows = SparkEntry.queries("q218_incremental_packing")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    val (base, delta) = rows.partition(_._8 == "base")
    assert(base.nonEmpty && delta.nonEmpty)
    // disjoint ranges: every delta sequence id sits past the base
    // maximum of its source (the released packing is immutable)
    val baseMax = base.groupBy(_._2).map { case (src, rs) =>
      src -> rs.map(_._4).max }
    delta.groupBy(_._2).foreach { case (src, rs) =>
      baseMax.get(src).foreach { bm =>
        assert(rs.map(_._4).min > bm,
          s"$src: delta sequences overlap the released base range")
      }
    }
    // zero churn by construction: the base slice IS q195 run on the
    // base corpus (same fold, same rows)
    val q217 = SparkEntry.queries("q217_repack_churn")(spark, sf0001)
      .agg(sum(col("n_base_docs"))).collect().head.getLong(0)
    assert(base.length.toLong == q217, "base row count != base corpus")
    // conservation: kept + truncated re-sums to the global q195 fold
    // (truncation is per-doc min(n, 512), packing-independent)
    val global = SparkEntry.queries("q195_pack_ffd")(spark, sf0001)
      .agg(sum(col("n_kept")), count(lit(1))).collect().head
    assert(rows.map(_._6).sum == global.getLong(0),
      "incremental kept tokens != global kept tokens")
    assert(rows.length.toLong == global.getLong(1))
    // the price of immutability: at least as many sequences as the
    // global re-fold (open bins sacrificed at the release cut)
    def nSeqs(rs: Array[(Long, String, Long, Long, Long, Long, Long,
        String)]) = rs.map(r => (r._2, r._4)).distinct.length
    val globalSeqs = SparkEntry.queries("q195_pack_ffd")(spark, sf0001)
      .select(col("source"), col("seq_id")).distinct().count()
    assert(nSeqs(rows) >= globalSeqs.toInt,
      "incremental packing used fewer sequences than the global fold")
  }

  test("q219 tombstones: decrement arithmetic, totals match the q86 " +
      "drop list, engaged and quiet cells both present") {
    val rows = SparkEntry.queries("q219_index_tombstones")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == 16, "cell card must cover the 16 IVF cells")
    rows.foreach { case (cell, base, dropped, kept, frac) =>
      assert(kept == base - dropped, s"cell $cell: decrement broken")
      assert(dropped <= base)
      assert(frac == BigDecimal(dropped.toDouble / base)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val drops = SparkEntry.queries("q86_semantic_dedup")(spark, sf0001)
      .select(col("dropped_id")).distinct().count()
    assert(rows.map(_._3).sum == drops,
      "tombstone totals diverge from the q86 drop list")
    assert(rows.exists(_._3 > 0) && rows.exists(_._3 == 0),
      "expected both engaged and quiet cells on this fixture")
  }

  test("q220 fertility trigger: ratio arithmetic, flags engage on this " +
      "fixture, null-evidence sources read 0 not NULL") {
    val rows = SparkEntry.queries("q220_fertility_trigger")(spark, sf0001)
      .collect()
      .map { r =>
        def d(i: Int): Option[Double] =
          if (r.isNullAt(i)) None else Some(r.getDouble(i))
        (r.getString(0), d(1), d(2), d(3), r.getLong(4))
      }
    assert(rows.length == 20)
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (src, bf, df, ratio, flag) =>
      (bf, df, ratio) match {
        case (Some(b), Some(dl), Some(rt)) =>
          assert(rt == rd(dl / b), s"$src: ratio arithmetic broken")
          assert(flag == (if (math.abs(rt - 1.0) > 0.02) 1L else 0L))
        case _ =>
          assert(flag == 0L, s"$src: null-evidence source must not flag")
      }
    }
    assert(rows.exists(_._5 == 1L), "trigger never engages on fixture")
    assert(rows.exists(r => r._5 == 0L && r._4.isDefined),
      "trigger always engages on fixture — threshold vacuous")
  }
}
