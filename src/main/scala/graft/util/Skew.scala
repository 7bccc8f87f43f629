package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4: "salting for skew").
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in the bench
  * session). Salting is the explicit fallback for keys so hot that even
  * split shuffle blocks overwhelm a task — e.g. a single ultra-frequent
  * artist token in the consolidation join at 100 TB.
  */
object Skew {

  /** Salted inner equi-join: the (large, skewed) left side scatters
    * each row into one of `salts` sub-keys; the (smaller) right side is
    * replicated `salts` times. Row-level results are identical to the
    * plain join — only the shuffle distribution changes (hot key load
    * drops by ~`salts`×).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Salted aggregation: two-phase group-by for hot grouping keys —
    * partial aggregate on (key, salt), then final aggregate on key.
    * Expressed for the count/sum family where two-phase composition is
    * exact. (Spark's own partial aggregation covers most cases; this is
    * for layering ABOVE repartitioning when a single group's partials
    * still skew one reducer.)
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    val cols = keys.map(col)
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(cols :+ col("__salt"): _*).agg(count(lit(1)).as("__partial"))
      .groupBy(cols: _*).agg(sum(col("__partial")).as("n"))
  }
}
