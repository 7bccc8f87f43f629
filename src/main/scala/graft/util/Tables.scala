package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` so the same code runs at any scale
  * factor; at cluster scale these would be external-catalog tables,
  * here they are bare parquet directories. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning + predicate pushdown (verified via .explain PushedFilters).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` is written with `timestamp[ns]` physical type,
    * which Spark's schema INFERENCE rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless the session-global legacy conf
    * `spark.sql.legacy.parquet.nanosAsLong` is flipped. Supplying the
    * read schema explicitly sidesteps inference: the INT64 nanos column
    * arrives as a raw long with NO session state touched, so an
    * embedding caller's other parquet reads are unaffected (the earlier
    * conf-setting loader leaked long-typed nanos reads session-wide).
    * The column set below is pinned by TESTDATA.md; a drifted file
    * surfaces as all-null columns, caught by every events-table oracle.
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      // integer `div`, not `/`: double division loses precision at
      // 1.7e18 ns and shifts timestamps by hundreds of nanoseconds
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
