package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY.md §4 / builder mandate:
  * "repartition()/bucketing for co-located joins").
  *
  * Writing both sides of a recurring join bucketed by the join key lets
  * Spark plan a shuffle-free sort-merge join: each bucket pair joins
  * locally. At 100 TB this converts the dominant per-run shuffle of a
  * fact-fact join into a one-time layout cost at ingest
  * (BucketingSpec asserts the Exchange disappears).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
