package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Runtime-selectable persistence for large intermediate frames (the
  * exploded gram projections and candidate-pair frames in the dedup
  * family).
  *
  * At bench scale MEMORY_AND_DISK (the default) is right: the frames
  * fit, and the persist saves 2-3 replays of the scan+gram stage. At
  * corpus scale (100 TB) the exploded gram frame is ~10x the corpus and
  * will NOT fit a memory-backed level — submit with
  * `--conf spark.graft.intermediatePersistLevel=DISK_ONLY` (sequential
  * shuffle-grade spill, still cheaper than the extra corpus scans) or
  * `=NONE` to drop caching entirely and recompute, when cluster disk is
  * the scarcer resource. This turns the documented policy into a
  * deploy-time switch instead of a code edit.
  */
object Persist {
  val ConfKey = "spark.graft.intermediatePersistLevel"

  /** Persist `ds` at the configured level; `NONE` skips the persist
    * (recompute policy) rather than caching with a no-op level.
    */
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val name = ds.sparkSession.conf.get(ConfKey, "MEMORY_AND_DISK")
    if (name.equalsIgnoreCase("NONE")) ds
    else ds.persist(StorageLevel.fromString(
      name.toUpperCase(java.util.Locale.ROOT)))
  }
}
