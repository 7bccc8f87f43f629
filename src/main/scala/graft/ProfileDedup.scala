package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.util.Tables

/** Dev harness: stage-by-stage timing of the minhash dedup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm cache

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE ${(System.nanoTime() - t0) / 1e9}%6.2f s  $name")
    }
    t("scan+shingle only") {
      docs.select(Dedup.charShingles(col("text"), 8).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    t("explode+md5") {
      docs.select(col("doc_id"), explode(Dedup.charShingles(col("text"), 8)).as("s"))
        .withColumn("d", md5(col("s")))
        .write.format("noop").mode("overwrite").save()
    }
    t("minhashSignatures (groupBy doc,band)") {
      Dedup.minhashSignatures(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()
    }
    t("bandedSignatures (pivot+posexplode)") {
      Dedup.bandedSignatures(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()
    }
    t("q22 full (candidates)") {
      Dedup.minhashCandidates(Dedup.bandedSignatures(docs, "text", "doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    t("q22 full AGAIN (warm)") {
      Dedup.minhashCandidates(Dedup.bandedSignatures(docs, "text", "doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    // ---- q24 breakdown ----
    val cand = Dedup.minhashCandidates(
        Dedup.bandedSignatures(docs, "text", "doc_id"))
      .select(col("a_id"), col("b_id"))
    val pre = docs.select(col("doc_id"),
      Dedup.charShingles(substring(col("text"), 1, 120), 3).as("grams"))
    t("q24 grams join only (no jaccard)") {
      cand
        .join(pre.select(col("doc_id").as("a_id"), col("grams").as("a_grams")), Seq("a_id"))
        .join(pre.select(col("doc_id").as("b_id"), col("grams").as("b_grams")), Seq("b_id"))
        .write.format("noop").mode("overwrite").save()
    }
    t("q24 full (registry)") {
      SparkEntry.queries("q24_ngram_dedup")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    println("CAND_ROWS=" + cand.count())

    // ---- isolate the rescoring stage: materialize pairs+prefixes ----
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof").toString
    cand
      .join(docs.select(col("doc_id").as("a_id"),
        substring(col("text"), 1, 120).as("a_pre")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"),
        substring(col("text"), 1, 120).as("b_pre")), Seq("b_id"))
      .write.mode("overwrite").parquet(tmp)
    val pairs = spark.read.parquet(tmp)
    pairs.write.format("noop").mode("overwrite").save() // warm
    t("rescore: single-pass NGramJaccard expr (filter+round)") {
      pairs.withColumn("jac", Dedup.ngramJaccard(col("a_pre"), col("b_pre"), 3))
        .filter(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac"))
        .write.format("noop").mode("overwrite").save()
    }
    t("rescore: composed array_intersect (filter+round)") {
      val ag = Dedup.charShingles(col("a_pre"), 3)
      val bg = Dedup.charShingles(col("b_pre"), 3)
      val inter = size(array_intersect(ag, bg))
      val jac = inter.cast("double") /
        (size(ag) + size(bg) - inter).cast("double")
      pairs.withColumn("jac", jac)
        .filter(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac"))
        .write.format("noop").mode("overwrite").save()
    }
    t("rescore: NGramJaccard expr, no filter (single eval)") {
      pairs.select(col("a_id"), col("b_id"),
          Dedup.ngramJaccard(col("a_pre"), col("b_pre"), 3).as("jac"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
