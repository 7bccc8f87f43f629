package graft

/** Value-level pins for the wave-27 queries: the streaming IVF-PQ
  * index maintenance and the released-order append contract.
  */
class Wave27Spec extends SparkSpec {

  private def md5first(v: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    f"${md(0) & 0xff}%02x".substring(0, 1)
  }

  test("q232 maintained IVF-PQ index: full coverage, one row per " +
      "vector, the md5 src split, and 8-subspace codes in range") {
    val rows = SparkEntry.queries("q232_stream_pq_index")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.nonEmpty)
    val ids = rows.map(_._2)
    assert(ids.distinct.length == ids.length, "a vector indexed twice")
    rows.foreach { case (cell, id, code, src) =>
      assert(cell >= 0 && cell < 16)
      val parts = code.split(",")
      assert(parts.length == 8, s"$id: expected 8 subspace codes")
      assert(parts.forall(p => p.toInt >= 0 && p.toInt < 16),
        s"$id: code position out of the 16-centroid range")
      val expected =
        if (Set("0", "1", "2")(md5first(id))) "delta" else "base"
      assert(src == expected, s"$id: src tag does not match the md5 rule")
    }
    assert(rows.exists(_._4 == "base") && rows.exists(_._4 == "delta"))
  }

  test("q233 order append: released positions immutable and dense, " +
      "appended rows strictly after the released cursor") {
    val rows = SparkEntry.queries("q233_order_append")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(8), r.getString(9)))
    val rel = rows.filter(_._8 == "released")
    val app = rows.filter(_._8 == "appended")
    assert(rel.nonEmpty && app.nonEmpty)
    val n1 = rel.length.toLong
    // the released block IS the prefix; appended rows only after it
    assert(rel.map(_._1).sorted.sameElements(0L until n1),
      "released global positions are not the dense prefix")
    assert(app.map(_._1).sorted.sameElements(n1 until n1 + app.length),
      "appended global positions are not the dense tail")
    // IMMUTABILITY: the released rows' ranks equal the q230 rule
    // applied to the released manifest alone — recomputed here from
    // the card's own released rows (draw-sorted per source, then the
    // (src_pos, source) round-robin), so a re-release provably moved
    // nothing a loader already consumed
    val expSrcPos = rel.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (r._7, r._3)).zipWithIndex
        .map { case (r, i) => (r._2, r._3) -> i.toLong }.toSeq
    }.toMap
    rel.foreach { r =>
      assert(r._6 == expSrcPos((r._2, r._3)),
        s"${r._2}/${r._3}: released src_pos moved")
    }
    val expGlobal = rel.sortBy(r => (r._6, r._2)).zipWithIndex
      .map { case (r, i) => (r._2, r._3) -> i.toLong }.toMap
    rel.foreach { r =>
      assert(r._1 == expGlobal((r._2, r._3)),
        s"${r._2}/${r._3}: released global_pos moved")
    }
    // per-source and per-shard positions stay dense across the append
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._6).sorted.sameElements(rs.indices.map(_.toLong)),
        s"$src: src_pos not dense after append")
    }
    rows.groupBy(_._4).foreach { case (sh, rs) =>
      assert(rs.map(_._5).sorted.sameElements(rs.indices.map(_.toLong)),
        s"shard $sh: shard_offset not dense after append")
    }
    // appended sequences continue their source numbering past the
    // released per-source counts
    val relSrcCnt = rel.groupBy(_._2).map { case (k, v) => k -> v.length }
    app.foreach { r =>
      assert(r._6 >= relSrcCnt.getOrElse(r._2, 0).toLong,
        s"${r._2}: an appended sequence took a released src_pos")
    }
  }

  test("q234 PQ staleness: the crowd-out theorem, the gain identity, " +
      "and maintenance recovers delta truth somewhere (fixture pin)") {
    slowGate()
    val rows = SparkEntry.queries("q234_pq_staleness")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(8)))
    assert(rows.length == 50)
    rows.foreach { case (q, ntd, sh, mh, mdh, co, g) =>
      assert(ntd >= 0 && ntd <= 3 && sh >= 0 && sh <= 3 && mh >= 0 && mh <= 3)
      assert(mdh <= ntd, s"$q: more delta hits than delta truth slots")
      // THEOREM: a superset of candidates can only push a base-truth
      // hit down, so the maintained index's base hits never exceed
      // the stale index's
      assert(mh - mdh <= sh, s"$q: maintained base hits exceed stale")
      assert(co == sh - (mh - mdh) && co >= 0,
        s"$q: crowd-out arithmetic broken")
      assert(g == mh - sh, s"$q: gain identity broken")
    }
    // the recovery phenomenon engages on this fixture (stale recovery
    // is 0 BY CONSTRUCTION — its rows contain no delta ids)
    assert(rows.map(_._5).sum > 0, "maintenance recovered no delta truth")
  }

  test("q235 IVF-PQ operating point: nested candidate sets, and the " +
      "nProbe=4 row is value-identical to q229's residual leg") {
    slowGate()
    val rows = SparkEntry.queries("q235_ivfpq_operating_point")(
        spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (p, nc, nt, nf, rec) =>
      assert(nt == 150 && nf >= 0 && nf <= nt && nc > 0)
      assert(rec == rd(nf.toDouble / nt), s"p=$p: recall arithmetic broken")
    }
    // candidate sets are nested by construction (crank <= p), so the
    // scanned mass can only grow with the probe budget
    rows.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b > a, "candidate mass did not grow with the probe budget")
    }
    // CROSS-CARD consistency: same frozen artifacts, same routing —
    // the sweep's nProbe=4 row must reproduce q229's residual leg
    // exactly (recall AND candidate count)
    val q229 = SparkEntry.queries("q229_ivfpq_residual")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    val resLeg = q229.find(_._1 == "ivfpq_residual").get
    val p4 = rows.find(_._1 == 4L).get
    assert(p4._4 == resLeg._2 && p4._5 == resLeg._3 && p4._2 == resLeg._4,
      "the sweep's nProbe=4 row diverged from q229's residual leg")
  }
}
