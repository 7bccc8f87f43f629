package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch). The streaming twin lives in
  * `graft.streaming` via flatMapGroupsWithState.
  *
  * Scale shape: one shuffle on the user key; both windows share the
  * (user_id, ts) sort so Spark plans a single Exchange + Sort.
  */
object Sessions {

  /** Assigns a per-user session index: a new session starts when the
    * gap since the previous event exceeds `gapSec`. The gap is
    * computed in INTEGER microseconds: the former double cast
    * (`ts.cast("double")`) misclassified gaps exactly equal to the
    * threshold for some absolute epochs (t2/1e6 - t1/1e6 can exceed
    * 1800.0 by ~1e-8 when the true difference is exactly 1800 s), so
    * the boundary was epoch-dependent and not engine-portable.
    */
  def sessionize(events: DataFrame, gapSec: Double = 1800.0): DataFrame = {
    val gapMicros = math.round(gapSec * 1e6)
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byTime))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > gapMicros, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(run).cast("long"))
  }

  /** Per-session rollup with deterministic string-rendered bounds. */
  def sessionStats(events: DataFrame, gapSec: Double = 1800.0): DataFrame =
    sessionize(events, gapSec)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
}
