package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-22 queries (q221–q223): the packing
  * chain's conservation / range-monotonicity / chaining-price
  * identities, the frozen-vs-refit curriculum's partition identities,
  * and the shard-maintenance card's append-only accounting.
  */
class Wave22Spec extends SparkSpec {

  test("q221 packing chain: conservation, chained ranges strictly " +
      "advance, chaining never beats the one-shot delta fold") {
    val rows = SparkEntry.queries("q221_packing_chain")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(3),
        r.getLong(5), r.getString(7)))
    val byOrigin = rows.groupBy(_._6)
    assert(byOrigin.keySet == Set("base", "ingest1", "ingest2"))
    // conservation vs the global fold (truncation is packing-free)
    val global = SparkEntry.queries("q195_pack_ffd")(spark, sf0001)
      .agg(sum(col("n_kept")), count(lit(1))).collect().head
    assert(rows.map(_._5).sum == global.getLong(0))
    assert(rows.length.toLong == global.getLong(1))
    // per source, each ingest's sequences sit strictly past everything
    // released before it
    def maxSeq(origin: String) = byOrigin(origin).groupBy(_._2)
      .map { case (s, rs) => s -> rs.map(_._4).max }
    def minSeq(origin: String) = byOrigin(origin).groupBy(_._2)
      .map { case (s, rs) => s -> rs.map(_._4).min }
    val bMax = maxSeq("base"); val i1Max = maxSeq("ingest1")
    minSeq("ingest1").foreach { case (s, m) =>
      bMax.get(s).foreach(b => assert(m > b, s"$s: ingest1 not past base"))
    }
    minSeq("ingest2").foreach { case (s, m) =>
      val prior = math.max(bMax.getOrElse(s, -1L), i1Max.getOrElse(s, -1L))
      assert(m > prior, s"$s: ingest2 not past the ingest1 release")
    }
    // the chaining price: two immutability cuts can only add open
    // bins vs the one-shot q218 delta fold
    def nSeqs(rs: Iterable[(Long, String, Long, Long, Long, String)]) =
      rs.map(r => (r._2, r._4)).toSeq.distinct.length
    val oneShot = SparkEntry.queries("q218_incremental_packing")(
        spark, sf0001)
      .select(col("source"), col("seq_id")).distinct().count()
    assert(nSeqs(rows) >= oneShot.toInt,
      "chained packing used fewer sequences than the one-shot ingest")
  }

  test("q222 frozen curriculum: both assignments partition their " +
      "slices, movers bounded and consistent") {
    val rows = SparkEntry.queries("q222_frozen_curriculum")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val docs = graft.util.Tables.documents(spark, sf0001)
      .withColumn("dl", substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2"))
    val nDelta = docs.filter(col("dl")).count()
    val nBase = docs.filter(!col("dl")).count()
    assert(rows.map(_._2).sum == nBase, "frozen cuts do not partition base")
    assert(rows.map(_._3).sum == nDelta,
      "frozen cuts do not partition the delta")
    assert(rows.map(_._4).sum == nDelta,
      "refit cuts do not partition the delta")
    rows.foreach { case (ph, _, frozen, _, moved) =>
      assert(moved <= frozen, s"phase $ph: more movers than members")
    }
    // base-trained terciles split the BASE near-evenly
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
  }

  test("q223 shard maintenance: append-only accounting conserves the " +
      "incremental manifest") {
    val rows = SparkEntry.queries("q223_shard_maintenance")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 8)
    def rd(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (sh, _, _, kr, kn, nf) =>
      assert(sh >= 0 && sh < 8)
      assert(nf == rd(kn.toDouble / (kr + kn)), s"shard $sh: frac broken")
    }
    // released + new re-sum to the q218 manifest exactly
    val inc = SparkEntry.queries("q218_incremental_packing")(spark, sf0001)
    val kept = inc.agg(sum(col("n_kept"))).collect().head.getLong(0)
    assert(rows.map(r => r._4 + r._5).sum == kept,
      "shard card does not conserve the incremental manifest tokens")
    val relSeqs = inc.filter(col("origin") === "base")
      .select(col("source"), col("seq_id")).distinct().count()
    val newSeqs = inc.filter(col("origin") === "delta")
      .select(col("source"), col("seq_id")).distinct().count()
    assert(rows.map(_._2).sum == relSeqs && rows.map(_._3).sum == newSeqs,
      "shard sequence counts diverge from the manifest")
  }
}
