package graft.etl

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation extension point (SURVEY.md §2.11): the engine's
  * formalization of "custom aggregate" as `Aggregator[IN, BUF, OUT]`,
  * registered via `functions.udaf` for Column use.
  */
object Aggregators {

  /** Exact mean over long-cent money values: sums in integer cents
    * (associative, overflow-safe to ~9e16 cents) so partial aggregation
    * order can never perturb the result — the typed twin of the
    * decimal-in/double-out convention used across the query layer.
    */
  object CentsMean extends Aggregator[Double, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Double): (Long, Long) =
      (b._1 + math.round(a * 100), b._2 + 1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) Double.NaN else r._1.toDouble / 100.0 / r._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
