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
}
