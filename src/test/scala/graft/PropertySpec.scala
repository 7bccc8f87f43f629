package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.etl.{Functions => F}
import graft.ext.Dedup

/** Property tests (SURVEY.md §5): invariants of the scalar layer and
  * the consolidation join, driven through the real Spark runtime in
  * batched samples (one collect per property, not per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val texts: Gen[String] = Gen.oneOf(
    Gen.alphaStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(
      "é", "à", "ü", "œ", "@", "-", "–", "&", "+", "/", " ", "  ", "feat", "live",
      "x", "DJ", "concert", "1 234,56 €", "COMPLET"))).map(_.mkString(" ")))

  private def sample(n: Int): Seq[String] =
    Gen.listOfN(n, texts).sample.getOrElse(Seq.fill(n)("fallback"))

  test("saltedJoin == plain join on random skewed frames, any threshold") {
    val gen = for {
      nLeft <- Gen.choose(0, 300)
      nRight <- Gen.choose(0, 30)
      hotFrac <- Gen.choose(0, 9)
      thr <- Gen.oneOf(1L, 5L, 50L, 1000000L)
    } yield (nLeft, nRight, hotFrac, thr)
    // getOrElse fallback: a failed Gen.sample must still yield a case,
    // or the loop could silently check nothing
    (1 to 5).map(i => gen.sample.getOrElse((100 * i, 10, 5, 50L)))
      .foreach { case (nl, nr, hf, thr) =>
      val left = (1 to nl)
        .map(i => (if (i % 10 <= hf) 7L else (i % 23).toLong, i))
        .toDF("k", "v")
      val right = (0 until nr).map(i => (i.toLong, s"r$i")).toDF("k", "name")
      val plain = left.join(right, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sorted.toSeq
      val salted = graft.util.Skew
        .saltedJoin(left, right, Seq("k"), salts = 4, hotThreshold = thr)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sorted.toSeq
      assert(salted == plain, s"nl=$nl nr=$nr hf=$hf thr=$thr")
    }
  }

  test("normBasic is idempotent and produces trimmed lowercase") {
    val in = sample(300)
    val out = in.toDF("s")
      .select(F.normBasic(col("s")).as("once"))
      .withColumn("twice", F.normBasic(col("once")))
      .collect()
    out.foreach { r =>
      val (once, twice) = (r.getString(0), r.getString(1))
      assert(once == twice, s"not idempotent: '$once' vs '$twice'")
      assert(once == once.toLowerCase)
      assert(once == once.trim)
      assert(!once.contains("  "))
    }
  }

  test("normName is idempotent") {
    val out = sample(300).toDF("s")
      .select(F.normName(col("s")).as("once"))
      .withColumn("twice", F.normName(col("once")))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("artist tokens: all >2 chars, lowercase, no stopwords, distinct") {
    val stop = Set("the", "and", "feat", "ft", "with", "x", "le", "la", "les",
      "l", "de", "du", "des", "et", "au", "aux", "chez", "a", "an", "on", "in")
    val out = sample(300).toDF("s")
      .select(F.artistTokensOne(col("s")).as("t")).collect()
    out.foreach { r =>
      val toks = r.getAs[scala.collection.Seq[String]]("t")
      assert(toks.distinct.size == toks.size)
      toks.foreach { t =>
        assert(t.length > 2)
        assert(t == t.toLowerCase)
        assert(!stop.contains(t))
      }
    }
  }

  test("seq_ratio is symmetric-in-value, bounded, reflexive") {
    val pairs = sample(150).zip(sample(150))
    val out = pairs.toDF("a", "b").select(
      F.seqRatio(col("a"), col("b")).as("ab"),
      F.seqRatio(col("a"), col("a")).as("aa")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) == 1.0)
    }
  }

  test("charShingles: every shingle is an in-order substring, length <= k") {
    val out = sample(200).filter(_.nonEmpty).toDF("s")
      .select(col("s"), Dedup.charShingles(col("s"), 4).as("sh")).collect()
    out.foreach { r =>
      val s = r.getString(0)
      r.getAs[scala.collection.Seq[String]]("sh").foreach { g =>
        assert(g.length <= 4 && g.nonEmpty)
        assert(s.contains(g))
      }
    }
  }

  test("consolidation: each provider id appears at most once; counts conserved") {
    import java.time.LocalDateTime
    val base = LocalDateTime.of(2030, 1, 1, 12, 0)
    val names = Gen.listOfN(40,
      Gen.oneOf("Alpha Beta", "Gamma Delta", "Alpha Solo", "Epsilon",
        "Beta Gamma", "Zeta Live", "Unique Words Here")).sample.get
    def frame(prefix: String, ns: Seq[String]) =
      ns.zipWithIndex.map { case (n, i) =>
        graft.etl.NormalizedEvent(provider = prefix, event_id_provider = s"$prefix$i",
          event_name = n, event_datetime_local = Some(base.plusDays(i % 5)))
      }.zipWithIndex.map { case (e, i) => (e, i.toLong) }
        .toDF("e", "ord").select(col("e.*"), col("ord"))
    val sg = frame("sg", names)
    val dc = frame("dc", names.reverse)
    val out = graft.etl.Consolidate
      .consolidate(sg, dc, "2029-01-01", col("ord"), col("ord")).collect()
    val sgIds = out.flatMap(r => Option(r.getAs[String]("shotgun_event_id")))
    val dcIds = out.flatMap(r => Option(r.getAs[String]("dice_event_id")))
    assert(sgIds.distinct.length == sgIds.length, "an SG id was matched twice")
    assert(dcIds.distinct.length == dcIds.length, "a DICE id was matched twice")
    // conservation: every dated input id appears exactly once in output
    assert(sgIds.length == names.length)
    assert(dcIds.length == names.length)
  }

  test("connectedComponents matches local union-find on random graphs") {
    slowGate()
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 10 + rnd.nextInt(30)
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // local union-find ground truth
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // min node id per component (find() roots are not minima in
        // general union-find, but unions always point max -> min root,
        // so the root IS the component minimum here)
        val expected = nodes.map(v => v -> find(v)).toMap
        val got = graft.ext.Dedup.connectedComponents(
            edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial: $got vs $expected")
      }
    }
  }

  // Unicode-heavy generator: ASCII words mixed with accents, 3-byte CJK,
  // and 4-byte astral code points — exercises the byte-offset walks in
  // WordGramHashes / MinhashBands across every UTF-8 width.
  private val uniTexts: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(
      "é", "Œ", "ß", "日本", "語", "🎸", "𝄞", "K", "...", "--", " ", "x9",
      "The QUICK", "fox", "🎸🎸🎸"))).map(_.mkString(" "))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("WordGramHashes property: equals a pure-Scala reference on unicode input") {
    // reference mirrors the composed pipeline semantics exactly:
    // Spark lower() == UTF8String.toLowerCase, then [^a-z0-9]+ splits
    def ref(text: String, n: Int, p: Int): Seq[String] = {
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val toks = lowered.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(g => md5hex(g.mkString(" ")).take(p)).toSeq.distinct
    }
    val in = Gen.listOfN(200, uniTexts).sample.getOrElse(Seq.fill(200)("a b c"))
    for (t <- in; n <- Seq(1, 2, 8)) {
      val got = graft.etl.expressions.WordGramHashes
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), n, 16)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == ref(t, n, 16), s"text='$t' n=$n")
    }
  }

  test("SimHash64 property: equals a pure-Scala reference on unicode input") {
    slowGate()
    // independent reference: bit j votes on bit (j%4) of md5 hex
    // nibble (j/4), majority rule, \s+ tokens of the lowercased text
    def ref(text: String): Long = {
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val toks = lowered.split("\\s+").filter(_.nonEmpty)
      var out = 0L
      for (j <- 0 until 64) {
        val votes = toks.count { t =>
          val nibble = Integer.parseInt(md5hex(t).charAt(j / 4).toString, 16)
          ((nibble >> (j % 4)) & 1) == 1
        }
        if (2 * votes > toks.length) out |= (1L << j)
      }
      out
    }
    val in = Gen.listOfN(150, uniTexts).sample.getOrElse(Seq.fill(150)("a b c"))
    for (t <- in) {
      val got = graft.etl.expressions.SimHash64
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(got == ref(t), s"text='$t'")
    }
  }

  test("fused expressions == composed forms through the codegen runtime (batched)") {
    slowGate()
    // one DataFrame job over 300 generated strings — exercises doGenCode,
    // not just the static compute() the other property tests call
    val in = Gen.listOfN(300, uniTexts).sample.getOrElse(Seq.fill(300)("a b c"))
    val df = in.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    import graft.ext.{TextAnalysis => TA}
    val rows = df.select(col("id"),
        TA.wordGramHashes(col("text"), 3).as("fused_g"),
        array_distinct(transform(
          TA.wordNGrams(TA.normWords(col("text")), 3),
          g => substring(md5(g), 1, 16))).as("composed_g"),
        Dedup.simhash16(col("text")).as("fused_s"),
        Dedup.simhash(TA.wsTokens(lower(col("text")))).as("composed_s"),
        Dedup.simhash64(col("text")).as("fused_s64"),
        TA.cdcChunks(col("text")).as("fused_c"),
        TA.charBigrams(col("text")).as("fused_b"),
        when(length(lower(col("text"))) >= 2,
          transform(sequence(lit(1), length(lower(col("text"))) - 1),
            i => lower(col("text")).substr(i, lit(2))))
          .otherwise(array().cast("array<string>")).as("composed_b"))
      .collect()
    rows.foreach { r =>
      val t = in(r.getLong(0).toInt) // row order after collect is not input order
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"grams diverge at id=${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"simhash diverges at id=${r.getLong(0)}")
      // SimHash64 has no composed twin (64 HOF terms would be absurd);
      // pin its doGenCode output to the static compute() instead
      assert(r.getLong(5) == graft.etl.expressions.SimHash64
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t)),
        s"simhash64 codegen diverges at id=${r.getLong(0)}")
      // CdcChunks and SimHash64 have no composed twins; pin their
      // doGenCode output to the static compute() instead. Compare the
      // chunk SEQUENCES element-wise — a concatenated compare is
      // vacuous for boundary placement (every partition of the text
      // concatenates back to the same string)
      assert(r.getSeq[String](6) == graft.etl.expressions.CdcChunks
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 8, 64)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq,
        s"cdc chunks codegen diverges at id=${r.getLong(0)}")
      assert(r.getSeq[String](7) == r.getSeq[String](8),
        s"char bigrams diverge at id=${r.getLong(0)}")
    }
  }

  test("semanticDedup property: equals a brute-force within-cell reference") {
    // deterministic pseudo-random 8-dim vectors (md5-derived, like the
    // engine's own plane/centroid constants)
    def hv(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 16777216.0 - 0.5
    }
    val dim = 8; val nCells = 4; val tau = 0.15
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(dim)(j => hv(s"v-$i-$j").toFloat)))
    val df = vecs.toDF("vec_id", "embedding")

    // reference: argmax-cell assignment (rounded dot, cell-asc ties),
    // all within-cell lower-id pairs with raw sim >= tau, best witness
    // by (rounded sim desc, kept asc)
    val cents = (0 until nCells).map(cl =>
      Array.tabulate(dim)(j => graft.ext.Similarity.centroidVal(cl, j)))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val assigned = vecs.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val cell = cents.zipWithIndex
        .maxBy { case (c, ci) =>
          (BigDecimal(dot(vd, c)).setScale(6, BigDecimal.RoundingMode.HALF_UP), -ci) }._2
      (id, vd, cell)
    }
    val expected = assigned.groupBy(_._3).values.flatMap { cell =>
      val pairs = for {
        a <- cell; b <- cell if a._1 < b._1
        sim = dot(a._2, b._2) / (math.sqrt(dot(a._2, a._2)) * math.sqrt(dot(b._2, b._2)))
        if sim >= tau
      } yield (b._1, a._1, sim) // (dropped, kept, sim)
      pairs.groupBy(_._1).map { case (_, ps) =>
        ps.maxBy(p =>
          (BigDecimal(p._3).setScale(6, BigDecimal.RoundingMode.HALF_UP), -p._2))
      }
    }.map(p => (p._1, p._2)).toSet

    val got = graft.ext.Similarity
      .semanticDedup(df, "vec_id", "embedding", tau = tau, nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.nonEmpty) // tau chosen so the reference finds pairs
  }

  test("CdcChunks property: lossless reconstruction and insertion-stable boundaries") {
    import org.apache.spark.unsafe.types.UTF8String
    def chunks(t: String): Seq[String] = {
      val a = graft.etl.expressions.CdcChunks
        .compute(UTF8String.fromString(t), 8, 64)
      (0 until a.numElements()).map(i =>
        a.getUTF8String(i).toString)
    }
    val in = Gen.listOfN(80, uniTexts).sample.getOrElse(Seq.fill(80)("a b c"))
    for (t <- in) {
      val cs = chunks(t)
      // lossless: chunks concatenate back to the input
      assert(cs.mkString == t, s"reconstruction failed for '$t'")
      assert(cs.forall(_.nonEmpty))
      // insertion stability: a boundary depends only on its trailing
      // 8-char window, so every cut strictly inside the shared suffix
      // survives a head insertion — the chunk streams re-align and all
      // chunks after the first shared cut are identical
      val shifted = chunks("xy" + t)
      val common = cs.reverse.zip(shifted.reverse).takeWhile { case (a, b) => a == b }
      if (cs.length > 3) // enough cuts to have one clear of the head window
        assert(common.nonEmpty || cs.length <= 1,
          s"no shared suffix chunks for '$t': $cs vs $shifted")
    }
    // empty input: no chunks
    assert(chunks("").isEmpty)
  }

  test("MinhashBands property: equals a pure-Scala reference on unicode input") {
    def ref(text: String, k: Int): Seq[Option[String]] = {
      // code-point shingles, like substringSQL
      val cps = {
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          buf += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        buf.toSeq
      }
      val last = math.max(cps.length - k + 1, 1)
      val digests = (0 until last).map(i =>
        md5hex(cps.slice(i, i + k).mkString))
      (0 until 16).map { band =>
        val h = "0123456789abcdef" (band)
        digests.filter(_.charAt(0) == h) match {
          case Seq() => None
          case ds => Some(ds.min)
        }
      }
    }
    val in = Gen.listOfN(120, uniTexts).sample.getOrElse(Seq.fill(120)("a b c"))
    for (t <- in if t.nonEmpty; k <- Seq(3, 8)) {
      val got = graft.etl.expressions.MinhashBands
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), k)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(v => Option(v).map(_.toString)).toSeq
      assert(got == ref(t, k), s"text='$t' k=$k")
    }
  }
}
