package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: sweep every registered query's physical plan for
  * scale anti-patterns (cartesian products, unkeyed nested-loop joins).
  * Intentional exceptions are listed with their justification.
  */
object PlanAudit {
  // queries where a BroadcastNestedLoopJoin is the DESIGNED plan:
  // a bounded broadcast side makes the nested loop a streaming scan
  private val allowedBnlj = Map(
    "q25_knn_cosine" -> "query side is a bounded broadcast (brute-force baseline)",
    "q35_merge_similarity" -> "dateless branch: rare rows × broadcast, by construction tiny",
    "q20_interval_join" -> "dateless branch of mergeSimilarity (same as q35)",
    "q44_ivf_ann" -> "16-row broadcast centroid frame; corpus×16 is the IVF assignment fan-out",
    "q48_tfidf" -> "one-row broadcast of the corpus-size scalar (N for idf)",
    "q66_gap_fill" -> "one-row broadcast of the (min,max) date span for the spine",
    "q74_kmeans_iter" -> "16-row broadcast centroid frame (same fan-out as q44)",
    "q76_ann_recall" -> "brute-force exact side of the recall eval (bounded query set, q25's design)",
    "q86_semantic_dedup" -> "16-row broadcast centroid frame (IVF cell assignment, q44's fan-out)",
    "q87_bigram_lm" -> "one-row broadcast of the vocab-size scalar (add-one smoothing, q48's pattern)",
    "q89_semantic_clusters" -> "q86's bounded centroid-assignment BNLJ feeding the CC pairs",
    "q94_quantized_ann" -> "16-row broadcast centroid frame over int8 codes (q44's fan-out)",
    "q97_quantized_recall" -> "brute-force exact side (q25) + q94's bounded centroid assignment",
    "q99_ccnet_buckets" -> "one-row broadcast of the vocab-size scalar inside bigramLmScore (q87's pattern)",
    "q104_hard_negatives" -> "16-row broadcast centroid frame (IVF cell assignment, q44's fan-out)",
    "q105_label_balance" -> "one-row broadcast of the max label count (epoch computation)")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        if (cart) { bad += 1; println(s"AUDIT $name: CARTESIAN") }
        else if (bnlj && !allowedBnlj.contains(name)) {
          bad += 1; println(s"AUDIT $name: UNEXPECTED-BNLJ")
        } else if (bnlj) println(s"AUDIT $name: bnlj-allowed (${allowedBnlj(name)})")
        else println(s"AUDIT $name: ok")
      } catch { case e: Throwable =>
        bad += 1; println(s"AUDIT $name: ERROR ${e.getMessage.take(100)}")
      }
    }
    println(s"AUDIT_BAD=$bad")
    spark.stop()
  }
}
