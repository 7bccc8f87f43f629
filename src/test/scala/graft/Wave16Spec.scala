package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-16 queries (q193–q194) beyond the
  * DuckDB gate: the frozen-model ingest discipline (delta-side-only
  * rows, the frozen cut separating classes exactly) and the purity
  * report's consistency with the q192 packing manifest.
  */
class Wave16Spec extends SparkSpec {

  private def isDelta(id: Long): Boolean = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    "012".contains(f"${h(0) & 0xff}%02x".charAt(0))
  }

  test("q193 frozen-model ingest: delta-only rows, cut separates exactly") {
    val rows = SparkEntry.queries("q193_dsir_ingest")(spark, sf0001).collect()
    assert(rows.nonEmpty, "no delta docs scored")
    val docs = graft.util.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(isDelta(id), s"doc $id is not delta-side")
      assert(docs(id) != "src0", s"target-domain doc $id scored")
    }
    val (sel, unsel) = rows.partition(_.getInt(3) == 1)
    if (sel.nonEmpty && unsel.nonEmpty) {
      assert(sel.map(_.getDouble(2)).min > unsel.map(_.getDouble(2)).max,
        "frozen cut does not separate selected from unselected")
    }
    // the frozen threshold was derived from the BASE population, so
    // the delta's selected share should differ from an in-sample p80
    // only through drift — but it must not be vacuous either way
    assert(sel.nonEmpty || unsel.nonEmpty)
  }

  test("q194 purity report agrees with the q192 manifest, row for row") {
    val purity = SparkEntry.queries("q194_pack_purity")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    val manifest = SparkEntry.queries("q192_concat_chunk")(spark, sf0001)
      .collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(purity.nonEmpty && manifest.nonEmpty)
    manifest.groupBy(_._1).foreach { case (src, ds) =>
      val (nSeqs, nPure, nMixed, nSpan) = purity(src)
      val covered = ds.flatMap { case (_, sf, sl) => sf to sl }
      val byCount = covered.groupBy(identity).view.mapValues(_.size)
      assert(nSeqs == byCount.size, s"$src n_seqs")
      // contiguity: the layout leaves no empty sequences
      assert(byCount.keys.max == nSeqs - 1 && byCount.keys.min == 0,
        s"$src sequence ids not contiguous")
      assert(nMixed == byCount.count(_._2 >= 2), s"$src n_mixed")
      assert(nPure == byCount.count(_._2 == 1), s"$src n_pure")
      assert(nPure + nMixed == nSeqs, s"$src pure+mixed != total")
      assert(nSpan == ds.count { case (_, sf, sl) => sl > sf },
        s"$src n_spanning_docs")
    }
  }
}
