package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: the sf-scale ladder for the dedup/ANN safety caps
  * (VERDICT r7 #7). For each fixture scale factor it measures the
  * bucket/cell distributions every capped candidate generator shuffles
  * on, and how close the hottest key comes to its cap:
  *
  *   - MinHash r=2 band buckets (`Dedup.bandedSignatures` →
  *     (band, minhash) key; cap 10000 in `minhashCandidates`)
  *   - SimHash64 16-bit band buckets (q85's pigeonhole key; same cap)
  *   - IVF cells (`Similarity` assignment; cap 10000 in
  *     `semanticDedup`/ANN search)
  *   - span-hash keys (q92's 16-hex md5 prefix; windowed first-owner
  *     spills, no cap — recorded for the distribution evidence)
  *
  * Output: one markdown row per (sf, family) with key count, max/p99
  * bucket size, and the over-cap count (must be 0 at fixture scale).
  * The committed results live in SCALE_LADDER.md.
  */
object ScaleLadder {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Dedup, Similarity, TextAnalysis => TA}
    import graft.util.Tables

    println("| sf | family | keys | max bucket | p99 bucket | over-cap (10000) |")
    println("|---|---|---|---|---|---|")
    sfs.foreach { d =>
      val sf = new java.io.File(d).getName
      val docs = Tables.documents(spark, d)

      /** `sizes` = (k, n) per distinct key; stats are a single bounded
        * driver-side aggregate over the distinct-key distribution.
        */
      def report(family: String, sizes: DataFrame): Unit = {
        val row = sizes.agg(count(lit(1)).as("keys"),
          max(col("n")).as("mx"),
          expr("percentile_approx(n, 0.99)").as("p99"),
          sum(when(col("n") > 10000, 1).otherwise(0)).as("over")).head()
        println(s"| $sf | $family | ${row.getLong(0)} | ${row.get(1)} | " +
          s"${row.get(2)} | ${row.getLong(3)} |")
      }
      def keyedSizes(keyed: DataFrame): DataFrame =
        keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))

      report("minhash-band", keyedSizes(
        Dedup.bandedSignatures(docs, "text", "doc_id", k = 8)
          .select(concat_ws("|", col("band"), col("minhash")).as("k"))))
      report("simhash64-band", keyedSizes(
        docs.select(Dedup.simhash64(col("text")).as("sh"))
          .select(posexplode(array((0 until 4).map(b =>
            shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*))
            .as(Seq("band", "nib")))
          .select(concat_ws("|", col("band"), col("nib")).as("k"))))
      report("ivf-cell",
        Similarity.hotCells(Tables.embeddings(spark, d), "vec_id", "embedding",
            nCells = 16, cellCap = 0)
          .select(col("cell").cast("string").as("k"), col("cell_size").as("n")))
      report("span-key", keyedSizes(
        docs.select(col("doc_id"), TA.wsTokens(lower(col("text"))).as("toks"))
          .withColumn("n_spans", ceil(size(col("toks")) / lit(8.0)).cast("long"))
          .filter(col("n_spans") >= 1)
          .select(posexplode(transform(sequence(lit(0L), col("n_spans") - 1),
            i => array_join(slice(col("toks"), (i * 8 + 1).cast("int"), lit(8)), " ")))
            .as(Seq("i", "span")))
          .select(substring(md5(col("span")), 1, 16).as("k"))))
    }
    spark.stop()
  }
}
