package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * `rightTs <= leftTs` for the same key (the standard
  * dimension-snapshot / point-in-time join of event pipelines).
  *
  * Composition, not a custom physical operator (preference order (a) of
  * the build mandate): keyed equi-join on the partition key with the
  * temporal predicate as residual, then a per-left-row argmax window.
  * For keys with deep histories, pre-banding on coarse time buckets
  * (as in Consolidate.mergeSimilarity) bounds the candidate set; at
  * the test data's fan-in the plain keyed join is optimal.
  */
object AsOf {

  /** @param left (keyCol, leftTs, ...) probe side
    * @param right (keyCol, rightTs, ...) history side
    * @param tieBreak column of `right` ordered DESC after recency to
    *                 make equal-timestamp picks deterministic
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val l = left.withColumn("__lid", monotonically_increasing_id())
    // rename the right key: with both sides derived from one source
    // (self-join), dropping `right(keyCol)` can resolve to the LEFT
    // attribute after Spark's self-join dedup re-aliasing
    val r = right.withColumnRenamed(keyCol, "__rkey")
    val joined = l.join(r, l(keyCol) === col("__rkey") &&
      col(rightTs) <= l(leftTs), "left")
      .drop("__rkey")
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col(rightTs).desc_nulls_last, col(tieBreak).desc_nulls_last)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__lid")
  }
}
