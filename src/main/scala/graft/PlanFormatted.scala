package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: `.explain("formatted")` of registry queries to files —
  * the round-18 plan-evidence dumper (plans/r18/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanFormatted <outDir> <suffix> <query> [query ...]
  * Runs at sf0.001 (eager-at-build training collects stay trivial, the
  * PlanAudit discipline); bench-mirroring confs so join strategies match.
  */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val short = name.takeWhile(_ != '_')
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${short}_$suffix.txt"), txt)
        println(s"PLAN $name -> $outDir/${short}_$suffix.txt " +
          s"(exchanges=${"Exchange".r.findAllIn(txt).length})")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"PLAN $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
