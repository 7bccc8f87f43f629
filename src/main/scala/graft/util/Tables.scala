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

  /** `events.parquet` is written with `timestamp[ns]` physical type.
    * Spark's vectorized reader handles INT64(TIMESTAMP(NANOS)) only via
    * the legacy nanosAsLong conf on some versions; normalize here so
    * every query sees a plain TimestampType `ts` column (session TZ is
    * pinned UTC, matching DuckDB's naive reading of the same file).
    *
    * CAVEAT: the conf is SESSION-WIDE and is deliberately not restored
    * — the scan consults it lazily at execution time, so a
    * set-then-restore around the (lazy) read would flip it back before
    * the query ever runs. After the first events() call, other parquet
    * reads in the session will also read nanos columns as raw longs
    * instead of erroring; no other nanos table exists in this harness,
    * but a caller embedding the library should scope sessions
    * accordingly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Spark rejects INT64(TIMESTAMP(NANOS)) outright without this legacy
    // conf (PARQUET_TYPE_ILLEGAL); with it, ts arrives as LongType nanos.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: double division loses precision at
        // 1.7e18 ns and shifts timestamps by hundreds of nanoseconds
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
