package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative algorithms (the connected-components
  * label loop), with the same deploy-time-switch discipline as
  * [[Persist]].
  *
  * Default is `localCheckpoint()`: executor-local blocks, no cluster
  * store needed — right for single-JVM bench/verify. Its blocks die
  * with an executor, though, and an iterative loop cannot recompute
  * them (the lineage was truncated away) — on a large or preemptible
  * fleet that kills the job mid-loop. Submitting with
  * `--conf spark.graft.checkpointDir=<reliable path>` switches every
  * truncation point to a RELIABLE `checkpoint()` whose blocks live in
  * the shared store and survive executor loss.
  *
  * OPERATIONAL NOTE: Spark does not delete reliable checkpoint files
  * at job end (and `spark.cleaner.referenceTracking.cleanCheckpoints`
  * only collects them on RDD GC). Point the dir at a TTL'd/lifecycle
  * -managed path (the standard object-store pattern) or enable that
  * cleaner conf — otherwise each CC run leaves O(rounds) label-frame
  * copies behind and the shared store fills over weeks of runs.
  */
object Checkpoints {
  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
