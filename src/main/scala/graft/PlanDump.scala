package graft
import org.apache.spark.sql.SparkSession
/** Dev harness: dump the flagship plan for shuffle-shape review. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args.headOption.getOrElse("q19_consolidate"))(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange".r.findAllIn(p).length)
    println("SCANS=" + "FileScan".r.findAllIn(p).length)
    println("CACHEREADS=" + "InMemoryTableScan".r.findAllIn(p).length)
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("FileScan") || l.contains("Join") || l.contains("Window") || l.contains("InMemoryTableScan")).mkString("\n"))
    spark.stop()
  }
}
