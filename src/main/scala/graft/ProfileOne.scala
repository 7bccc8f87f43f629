package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev harness: per-JOB timing of a single registry query under the
  * bench protocol (warm session, cold cache, noop sink). Multi-job
  * queries (eager training collects, persists, streaming loops) hide
  * where their seconds go behind one wall-clock number — this prints
  * every Spark job the query ran with its duration and description,
  * plus stage-level shuffle totals, so the expensive leg is visible
  * without the UI (which the bench keeps disabled).
  *
  * Usage: runMain graft.ProfileOne <query> [sfDir] [cpus]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      // mirror Bench: JIT-aligned codegen size cap (round 18)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm run (JIT/codegen/footers), then cold-cache like Bench
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    System.gc()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var inputBytes = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          val dt = (je.time - t0) / 1e3
          lines.add(f"JOB ${je.jobId}%4d ${dt}%7.2f s  $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          inputBytes += m.inputMetrics.bytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    lines.asScala.foreach(println)
    println(f"PROFILE $total%.2f s  $name  jobs=${lines.size}  " +
      f"input=${inputBytes / 1e6}%.1f MB  shufR=${shuffleRead / 1e6}%.1f MB  " +
      f"shufW=${shuffleWrite / 1e6}%.1f MB")
    spark.stop()
  }
}
