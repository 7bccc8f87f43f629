package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.Functions

/** Scratch probe main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. events.parquet (timestamp[ns]) readable?
    try {
      val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e) }

    // 2. custom expressions
    val df = Seq(
      ("Électro Fête @ Le Trianon", "ven. 10 oct. 2025 19:30"),
      ("DJ Snake Live", "2025-11-29T19:00"),
      ("plain", "10 octobre 2025")).toDF("name", "dt")
    df.select(
      Functions.stripAccents(col("name")).as("stripped"),
      Functions.normName(col("name")).as("norm"),
      Functions.slug(col("name")).as("slug"),
      Functions.artistTokens(col("name")).as("toks"),
      Functions.parseFrDatetime(col("dt")).as("parsed"),
      Functions.seqRatio(col("name"), lit("Electro Fete @ Le Trianon")).as("ratio"),
      Functions.parseMoney(lit("1 234,56 €")).as("money"),
      Functions.stableEventId(col("name"), lit("2025-10-10")).as("sid"),
      Functions.round5(lit("2025-10-10 19:33:21").cast("timestamp")).as("r5"),
      Functions.canonicalKey(col("name"), lit("2025-10-10 19:33:21").cast("timestamp")).as("ck")
    ).show(truncate = false)
    spark.stop()
  }
}
