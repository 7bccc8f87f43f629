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
    *
    * The input is `Option[Double]`, NOT a primitive: with a primitive
    * encoder a SQL NULL decodes to 0.0 and gets COUNTED, deflating the
    * mean — this is a money mean for nullable money columns, so NULLs
    * must be ignored exactly like `avg()` ignores them.
    */
  object CentsMean extends Aggregator[Option[Double], (Long, Long), java.lang.Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Option[Double]): (Long, Long) =
      a match {
        case Some(v) => (b._1 + math.round(v * 100), b._2 + 1)
        case None => b
      }
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    // boxed Double so an all-NULL group yields SQL NULL — exactly what
    // avg() and the DuckDB oracle produce (NaN would hash-diverge)
    override def finish(r: (Long, Long)): java.lang.Double =
      if (r._2 == 0) null else java.lang.Double.valueOf(r._1.toDouble / 100.0 / r._2)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
}
