package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-streaming surface (SURVEY.md §2.10).
  *
  * The reference's incrementality is cron re-run + append-only sink
  * (`daily.yml:4-6`, `storage/google_sheets.py:21`); its 90-day
  * lookback re-scan is a poor-man's watermark. Re-expressed natively:
  * daily tumbling-window aggregation with a real watermark, and
  * stateful sessionization via flatMapGroupsWithState. Sink modes K1/K2
  * map to foreachBatch overwrite/append.
  */
object Streaming {

  /** Daily snapshot aggregation: tumbling 1-day windows on event time
    * with late-data tolerance — the streaming twin of q11_events_daily.
    */
  def dailyAggregation(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("day_window"), col("event_type"))
      // decimal inside, double at the surface — same discipline as the
      // batch twin q11: a raw double sum depends on accumulation order
      // across partitions/microbatches and diverges from the oracle
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("day_window.start").as("day_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Read the events table as a file stream (schema pinned; one file
    * per microbatch gives deterministic tests).
    */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      // oldest-first is the default, but the ordered-ingest harness
      // (writeOrderedBatches -> q214/q225 order-dependent chains)
      // DEPENDS on it — pin it so a default change can't reorder
      .option("latestFirst", "false")
      .parquet(dir)

  case class SessionInput(user_id: Long, event_id: Long, tsMicros: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, n_events: Int, startMicros: Long, endMicros: Long)

  /** Stateful gap sessionization (§2.10 extension): emits a session when
    * its gap times out. Batch twin: graft.ext.Sessions.
    *
    * A user's trailing (idle) session is flushed via
    * ProcessingTimeTimeout: after `gapSec` of wall-clock with no new
    * events for the key, the buffered session is emitted and the state
    * cleared — without this, open sessions would sit in the state store
    * forever waiting for a later event that may never come. (Event-time
    * timeout would need a watermarked timestamp column; the processing
    * -time gap mirrors the reference's cron cadence, where "idle" is
    * measured in wall-clock runs.)
    */
  def sessionizeStream(ds: Dataset[SessionInput], gapSec: Long)(
      implicit enc1: org.apache.spark.sql.Encoder[SessionOut],
      enc2: org.apache.spark.sql.Encoder[SessionState]): Dataset[SessionOut] = {
    val gapMicros = gapSec * 1000000L
    ds.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Idle gap elapsed with no new events: flush the open session.
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.n, st.start, st.last))
          } else {
            // Within a microbatch, events arrive unordered — sort by ts.
            val sorted = rows.toSeq.sortBy(r => (r.tsMicros, r.event_id))
            var out = List.empty[SessionOut]
            var st = state.getOption.orNull
            sorted.foreach { r =>
              if (st == null) st = SessionState(r.tsMicros, r.tsMicros, 1)
              else if (r.tsMicros - st.last > gapMicros) {
                out = SessionOut(user, st.n, st.start, st.last) :: out
                st = SessionState(r.tsMicros, r.tsMicros, 1)
              } else {
                // A LATE event from a prior microbatch can precede the
                // buffered session (batch-local sorting cannot see it):
                // clamp the bounds instead of moving `last` backwards,
                // which emitted end < start and split the session on
                // the next in-order event.
                st = SessionState(math.min(st.start, r.tsMicros),
                  math.max(st.last, r.tsMicros), st.n + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutDuration(gapSec * 1000L)
            }
            out.reverse.iterator
          }
      }
  }

  /** Streaming exact dedup — the incremental twin of the batch
    * content-hash dedup (q21): drops rows whose md5(content) was seen
    * within the watermark horizon. `dropDuplicatesWithinWatermark`
    * expires state with the watermark, so the dedup map is bounded by
    * the late-data window instead of growing with the corpus — the
    * property that keeps continuous 100 TB-scale ingestion feasible.
    */
  def dedupStream(df: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 day"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .withColumn("content_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join — the streaming twin of the q20 batch
    * interval join (purchases within `tolMin` after a same-user signup).
    *
    * Both sides are watermarked: the time-bounded join condition plus
    * the watermarks lets the state store evict a buffered row once no
    * future match can exist for it (signups after `tolMin` + watermark,
    * purchases after the watermark alone) — the property that keeps an
    * unbounded stream-stream join's state finite at production scale.
    * Inner join, so no emit-on-timeout subtleties.
    */
  def intervalJoinStream(signups: DataFrame, purchases: DataFrame,
      tolMin: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val a = signups
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = purchases
      .select(col("user_id").as("b_user"), col("event_id").as("purchase_id"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $tolMin MINUTES"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  /** K1/K2 as streaming sinks: per-microbatch overwrite (snapshot) or
    * append (historization) via foreachBatch.
    *
    * foreachBatch is AT-LEAST-ONCE: a retried microbatch re-runs the
    * writer after a crash between the parquet commit and the
    * checkpoint commit. Append mode therefore writes each batch into
    * its own `batch_id=<id>` directory with overwrite — the replay
    * rewrites the same directory instead of duplicating rows, and
    * readers prune on the partition column like any historized table.
    */
  def snapshotSink(df: DataFrame, path: String, checkpoint: String,
      append: Boolean): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(if (append) OutputMode.Append else OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatch(batch, id, path, append)
      }

  /** The foreachBatch body, separated so its idempotency is testable
    * without simulating a mid-commit crash.
    */
  private[graft] def writeBatch(batch: Dataset[org.apache.spark.sql.Row],
      id: Long, path: String, append: Boolean): Unit =
    if (append)
      batch.write.mode("overwrite").parquet(s"$path/batch_id=$id")
    else
      batch.write.mode("overwrite").parquet(path)
}
