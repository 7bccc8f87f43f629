package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Value-level pins for the wave-10 queries (q151–q157) beyond the
  * QueriesSpec smoke run and the DuckDB gate: each test asserts a
  * property the oracle comparison alone can't localize (formula
  * identities, probability-mass invariants, directed-containment
  * semantics).
  */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  test("q153 distributed quantiles == Spark's exact percentile aggregate") {
    // the distributed value-count + window form must reproduce the
    // textbook exact interpolated quantile (Spark's `percentile` agg
    // computes it by sorting the group in memory — fine as a test
    // oracle, unusable at scale, which is why the query exists)
    val out = SparkEntry.queries("q153_corpus_quantiles")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val exact = graft.util.Tables.documents(spark, sf0001)
      .groupBy(col("source"))
      .agg(expr("percentile(n_chars, array(0.25D, 0.50D, 0.75D, 0.95D))")
        .as("ps"))
      .collect().map { r =>
        val ps = r.getSeq[Double](1)
        r.getString(0) -> (ps(0), ps(1), ps(2), ps(3))
      }.toMap
    assert(out.keySet == exact.keySet)
    for ((src, (p25, p50, p75, p95)) <- out) {
      val (e25, e50, e75, e95) = exact(src)
      assert(math.abs(p25 - e25) < 1e-6, s"$src p25: $p25 vs $e25")
      assert(math.abs(p50 - e50) < 1e-6, s"$src p50: $p50 vs $e50")
      assert(math.abs(p75 - e75) < 1e-6, s"$src p75: $p75 vs $e75")
      assert(math.abs(p95 - e95) < 1e-6, s"$src p95: $p95 vs $e95")
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"$src not monotone")
    }
  }

  test("q152 temperature weights: mass sums to 1, alpha<1 flattens the mix") {
    val rows = SparkEntry.queries("q152_temperature_mix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def mass(f: ((String, Long, Double, Double, Double, Double)) => Double) =
      rows.map(f).sum
    assert(math.abs(mass(_._3) - 1.0) < 1e-4, "shares don't sum to 1")
    assert(math.abs(mass(_._4) - 1.0) < 1e-4, "alpha=0.3 weights don't sum to 1")
    assert(math.abs(mass(_._5) - 1.0) < 1e-4, "alpha=0.7 weights don't sum to 1")
    // flattening: boost = w/share is strictly DECREASING in share for
    // alpha < 1 (the crossover sits at the power-mean point, not at
    // the uniform share), and since both w and share sum to 1 the
    // largest source must be suppressed and the smallest amplified
    val bySize = rows.sortBy(_._2)
    for (Array(lo, hi) <- bySize.sliding(2).map(_.toArray)
         if lo._2 < hi._2)
      assert(lo._6 > hi._6, s"boost not decreasing: ${lo._1} vs ${hi._1}")
    assert(bySize.last._6 <= 1.0 + 1e-9, "largest source not suppressed")
    assert(bySize.head._6 >= 1.0 - 1e-9, "smallest source not amplified")
    // and alpha=0.3 flattens harder than alpha=0.7: strictly closer to
    // uniform mass for the extremes
    val u = 1.0 / rows.length
    assert(math.abs(bySize.last._4 - u) <= math.abs(bySize.last._5 - u) + 1e-9,
      "alpha=0.3 should flatten the head at least as much as alpha=0.7")
  }

  test("q151 calibration: bins partition the corpus, rates are probabilities") {
    val rows = SparkEntry.queries("q151_classifier_calibration")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val nDocs = graft.util.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum == nDocs, "bins don't partition the corpus")
    for ((bin, _, mean, rate, gap) <- rows) {
      assert(bin >= 0 && bin <= 9)
      // the mean predicted score must lie in its own decile (bin 9 is
      // right-closed)
      assert(mean >= bin / 10.0 - 1e-9 &&
        (bin == 9 || mean < (bin + 1) / 10.0 + 1e-9),
        s"bin $bin mean $mean outside decile")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(gap - math.abs(mean - rate)) < 1e-6)
    }
  }

  test("q156 containment: directed semantics on a planted quote-inclusion pair") {
    // short text fully contained in a long one: containment of the
    // short side is 1.0 while Jaccard stays at |A|/|B| — exactly the
    // case the Jaccard-family detectors are blind to
    val shortT = "the quick brown fox jumps over the lazy dog"
    val longT = shortT + " while the indifferent cat watches from a warm windowsill nearby"
    val df = Seq(shortT, longT).toDF("text")
      .select(array_distinct(Dedup.charShingles(col("text"), 8)).as("g"))
    val Array(ga, gb) = df.collect()
      .map(_.getSeq[String](0).toSet)
    val inter = (ga & gb).size.toDouble
    assert(inter / ga.size == 1.0, "short side containment must be 1")
    assert(inter / gb.size < 0.75, "long side containment must be partial")
    assert(inter / (ga.size + gb.size - inter) < 0.75, "jaccard must be < 1")
    // and the gated query's own output respects the directed algebra
    val rows = SparkEntry.queries("q156_containment_dedup")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty, "no containment pairs at sf0.001")
    for (r <- rows) {
      val (j, ca, cb) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(j <= ca + 1e-9 && j <= cb + 1e-9,
        "jaccard cannot exceed either containment")
      assert(math.max(ca, cb) >= 0.5 - 1e-9, "kept pair below threshold")
    }
  }

  test("q154 drift: defined exactly where both sides populate a cell") {
    val rows = SparkEntry.queries("q154_centroid_drift")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    for (r <- rows) {
      val (nb, nd) = (r.getLong(1), r.getLong(2))
      assert(nb + nd > 0, "empty cell emitted")
      if (nb > 0 && nd > 0) {
        val drift = r.getDouble(3)
        // cosine distance of same-sign-ish code means stays in [0, 2]
        assert(drift >= -1e-9 && drift <= 2.0 + 1e-9, s"drift $drift out of range")
        assert(!r.isNullAt(3))
      } else assert(r.isNullAt(3), "drift defined with a missing side")
    }
  }

  test("q155 release diff: delta column is exact for the count metrics") {
    val m = SparkEntry.queries("q155_release_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val docs = graft.util.Tables.documents(spark, sf0001)
    val nAll = docs.count().toDouble
    val nBase = docs.filter(
      !substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2")).count().toDouble
    val (bDocs, nDocs, dDocs) = m("n_docs")
    assert(bDocs == nBase && nDocs == nAll)
    assert(math.abs(dDocs - (nAll - nBase)) < 1e-6)
    // the new release ingests MORE docs and words, never fewer
    assert(m("n_words")._3 > 0 && m("n_bpe_tokens")._3 > 0)
    for ((metric, (b, n, d)) <- m)
      assert(math.abs(d - (n - b)) < 2e-6, s"$metric delta inconsistent")
  }

  test("q157 fertility: token shares partition the corpus total") {
    val rows = SparkEntry.queries("q157_source_fertility")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4,
      "token shares don't sum to 1")
    val enc = rows.map(_._4).sum
    // per-word BPE length is at least 1 token and at most the word
    // itself unmergeable: fertility must be >= 1 everywhere
    for ((src, _, nw, nt, fert, _) <- rows) {
      assert(fert >= 1.0, s"$src fertility $fert < 1")
      assert(math.abs(fert - nt.toDouble / nw) < 1e-6)
    }
    // and the global fertility (q150's published row) is the
    // token-weighted view of these per-source rows
    val nW = rows.map(_._3).sum
    assert(enc > nW, "BPE tokens should exceed whitespace words")
  }

  test("q161 applied temperature sampling: plan consistent, draw tracks the plan") {
    val rows = SparkEntry.queries("q161_temperature_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    val totalDocs = rows.map(_._2).sum
    // targets sum to the half-size corpus (w weights sum to 1)
    assert(math.abs(rows.map(_._3).sum - totalDocs / 2.0) < 1e-3)
    for ((lang, n, want, frac, epochs, kept) <- rows) {
      assert(frac > 0.0 && frac <= 1.0)
      assert(epochs >= 1L)
      if (want <= n) assert(epochs == 1L, s"$lang epochs on a downsample")
      // the deterministic uniform draw keeps ~frac of the lang; at
      // 71-193 docs/lang a +-0.15 band is comfortably outside noise
      assert(math.abs(kept.toDouble / n - frac) < 0.15,
        s"$lang kept ${kept.toDouble / n} vs frac $frac")
    }
    // temperature: the head language is downsampled strictly harder
    // than every tail language
    val byN = rows.sortBy(_._2)
    assert(byN.last._4 < byN.head._4,
      "head lang should get a smaller sample_frac than the tail")
  }

  test("q158 incremental containment: pairs are strictly cross-side") {
    def isDelta(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "012".contains(f"${hex(0) & 0xff}%02x".charAt(0))
    }
    val rows = SparkEntry.queries("q158_incremental_containment")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty, "no cross-side containment pairs at sf0.001")
    for (r <- rows) {
      assert(isDelta(r.getLong(0)), s"delta_id ${r.getLong(0)} is not delta-side")
      assert(!isDelta(r.getLong(1)), s"base_id ${r.getLong(1)} is not base-side")
      val (j, cd, cb) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(j <= cd + 1e-9 && j <= cb + 1e-9)
      assert(math.max(cd, cb) >= 0.5 - 1e-9)
    }
  }

  test("q160 streaming containment == q158 batch incremental, row for row") {
    slowGate()
    // the shared DuckDB oracle already pins both; this is the direct
    // in-engine statement of the same claim (q149/q148's pattern)
    val stream = SparkEntry.queries("q160_stream_containment")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q158_incremental_containment")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"stream-only: ${stream.diff(batch)}; batch-only: ${batch.diff(stream)}")
    assert(stream.nonEmpty)
  }

  test("q159 trim: the [p05, p95] cut keeps the expected central mass") {
    val rows = SparkEntry.queries("q159_length_trim")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    for ((src, nDocs, nKept, frac, lo, hi) <- rows) {
      assert(lo <= hi, s"$src cuts inverted")
      assert(nKept <= nDocs)
      // an exact [p05, p95] interval holds ~90% of the mass; at 25
      // docs/source the discrete cut rounds down to 21/25 = 0.84
      // (measured 0.84–0.88 at sf0.001, 0.896–0.904 at sf0.1)
      assert(frac >= 0.80 && frac < 1.0, s"$src keeps $frac")
      assert(math.abs(frac - nKept.toDouble / nDocs) < 1e-6)
    }
  }
}
