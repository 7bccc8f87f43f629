package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the wave-11 queries (q162–q165) beyond the
  * DuckDB gate: each test asserts a property the oracle comparison
  * alone can't localize (drop-precedence totality, split-vs-rollup
  * consistency, probability mass, versioning invariants).
  */
class Wave11Spec extends SparkSpec {

  test("q162 release ledger: total, precedence, and kept-set consistency") {
    val out = SparkEntry.queries("q162_curated_corpus")(spark, sf0001)
    val rows = out.collect()
    val nDocs = graft.util.Tables.documents(spark, sf0001).count()
    // one ledger row per document, never more (the left joins must not
    // fan out even when a doc is in several drop sets)
    assert(rows.length.toLong == nDocs, s"${rows.length} rows vs $nDocs docs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "duplicate doc_id in the ledger")
    val reasons = rows.map(_.getString(4)).toSet
    val allowed = Set("heldout", "quality", "decontaminated", "minhash",
      "simhash", "span", "semantic", "containment", "kept")
    assert(reasons.subsetOf(allowed), s"unknown drop_reason: ${reasons -- allowed}")
    // kept flag is exactly the 'kept' reason
    assert(rows.forall(r => (r.getLong(5) == 1L) == (r.getString(4) == "kept")))
    // heldout = the md5-head-'0' split, verbatim
    val heldout = rows.filter(_.getString(4) == "heldout").map(_.getLong(0)).toSet
    val expectHeld = graft.util.Tables.documents(spark, sf0001)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heldout == expectHeld, "heldout split mismatch")
    // a curation at sf0.001 must actually keep something and drop
    // something, or the composition test is vacuous
    assert(rows.exists(_.getString(4) == "kept"), "nothing kept")
    assert(rows.exists(_.getString(4) != "kept"), "nothing dropped")
  }

  test("q163 per-lang quantiles roll up to q153's per-source doc counts") {
    val split = SparkEntry.queries("q163_lang_quantiles")(spark, sf0001)
    val bySrc = split.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = SparkEntry.queries("q153_corpus_quantiles")(spark, sf0001)
      .select(col("source"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == full, "per-lang doc counts do not roll up to per-source")
    // quantiles monotone within every (source, lang) group
    split.collect().foreach { r =>
      val (p25, p50, p75, p95) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95,
        s"${r.getString(0)}/${r.getString(1)} quantiles not monotone")
    }
  }

  test("q164 per-lang fertility: mass sums to 1 and rolls up to q157") {
    val split = SparkEntry.queries("q164_lang_fertility")(spark, sf0001).collect()
    val mass = split.map(_.getDouble(6)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"token_share mass $mass != 1")
    val bySrc = split.groupBy(_.getString(0)).view.mapValues(rs =>
      (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum,
        rs.map(_.getLong(4)).sum)).toMap
    val full = SparkEntry.queries("q157_source_fertility")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(bySrc == full, "per-lang totals do not roll up to q157's rows")
  }

  test("q165 versioning: append-only and delta-sized growth per band") {
    val rows = SparkEntry.queries("q165_artifact_versioning")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v1r, v2r, added, removed) =
        (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6))
      assert(removed == 0L, s"band ${r.getLong(0)}: v1 rows lost in v2")
      assert(v2r == v1r + added,
        s"band ${r.getLong(0)}: v2 != v1 + added ($v2r != $v1r + $added)")
    }
    // the delta slice is non-empty at sf0.001, so v2 must actually grow
    assert(rows.map(_.getLong(5)).sum > 0, "no added rows — vacuous version diff")
  }

  test("q166 token temperature: mass conservation and head suppression") {
    val rows = SparkEntry.queries("q166_token_temperature")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getLong(2)).sum.toDouble
    // the per-lang targets must sum to the half-size token budget
    val targetSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(targetSum - totTokens / 2.0) < 1.0,
      s"targets $targetSum != half budget ${totTokens / 2.0}")
    rows.foreach { r =>
      assert(r.getDouble(4) <= 1.0 && r.getDouble(4) >= 0.0, "frac out of range")
      assert(r.getLong(7) <= r.getLong(2),
        s"${r.getString(0)}: kept_tokens exceed lang tokens")
    }
    // temperature < 1 suppresses the head: the token-richest lang gets
    // a strictly smaller sampling fraction than the token-poorest
    val byTk = rows.sortBy(_.getLong(2))
    assert(byTk.last.getDouble(4) < byTk.head.getDouble(4),
      "head lang not suppressed relative to tail")
  }

  test("q167 ledger diff: totality, stability, and md5-split geometry") {
    val rows = SparkEntry.queries("q167_ledger_diff")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val baseDocs = graft.util.Tables.documents(spark, sf0001)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2") === false).count()
    // every base doc appears exactly once in the matrix
    assert(rows.map(_._3).sum == baseDocs, "matrix does not cover the base slice")
    // v1 geometry: base slice holds no md5-head-0 docs, so the v1
    // ledger can contain neither heldout nor decontaminated rows
    assert(!rows.exists(r => r._1 == "heldout" || r._1 == "decontaminated"),
      "v1 ledger has held-set reasons — base slice should have none")
    assert(!rows.exists(_._2 == "heldout"),
      "a base doc cannot become heldout in v2")
    // quality is a per-doc-stable rule: it must sit on the diagonal
    assert(rows.filter(_._1 == "quality").forall(_._2 == "quality"),
      "quality verdict moved — rule must be per-doc stable")
  }

  test("q169 funnel: shares sum to 1 per source and cells roll up to q162") {
    val rows = SparkEntry.queries("q169_curation_funnel")(spark, sf0001)
      .collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val mass = rs.map(_.getDouble(4)).sum
      assert(math.abs(mass - 1.0) < 1e-3, s"$src doc_share mass $mass != 1")
    }
    val funnelTotal = rows.map(_.getLong(2)).sum
    val ledgerTotal = SparkEntry.queries("q162_curated_corpus")(spark, sf0001)
      .count()
    assert(funnelTotal == ledgerTotal, "funnel cells do not cover the ledger")
  }

  test("q170 drop-set diff: detectors are monotone across releases") {
    val rows = SparkEntry.queries("q170_dropset_diff")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("minhash", "simhash", "span", "semantic"))
    rows.foreach { r =>
      assert(r.getLong(4) == 0L, s"${r.getString(0)}: drop set shrank — " +
        "detector rules must be monotone in the data")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3),
        s"${r.getString(0)}: v2 != v1 + added")
    }
  }

  test("q168 incremental ledger == q162 full-rebuild ledger, row for row") {
    slowGate()
    // the DuckDB gate proves it against the oracle; this pins the two
    // Spark paths directly against each other at spec speed — the
    // maintenance-equals-rebuild claim with no oracle in the loop
    val inc = SparkEntry.queries("q168_ledger_incremental")(spark, sf0001)
      .collect().map(_.toSeq)
    val full = SparkEntry.queries("q162_curated_corpus")(spark, sf0001)
      .collect().map(_.toSeq)
    assert(inc.length == full.length,
      s"row counts differ: ${inc.length} vs ${full.length}")
    inc.zip(full).foreach { case (a, b) =>
      assert(a == b, s"ledger rows differ: $a vs $b")
    }
  }
}
