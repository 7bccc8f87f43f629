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

  /** Misra–Gries heavy-hitter SKETCH over a stream of keys: at most
    * `k` counters, mergeable (Agarwal et al., "Mergeable Summaries",
    * PODS 2012), with the deterministic guarantee
    * `true_count(x) − N/(k+1) ≤ estimate(x) ≤ true_count(x)` — so
    * every key whose true share exceeds 1/(k+1) of the N-element
    * stream is GUARANTEED to survive in the merged sketch, no matter
    * how partitions are merged. The candidate set it emits is
    * merge-order-DEPENDENT in its extras but merge-order-INDEPENDENT
    * in that superset guarantee; consumers therefore always re-score
    * candidates exactly (second pass) before reporting, which makes
    * the final heavy-hitter set fully deterministic. This is the
    * 100 TB shape of hot-key detection: the sketch is one map-side-
    * combinable aggregate (k-bounded state per partition, k-bounded
    * merge traffic), and the exact pass touches only ≤ k keys.
    *
    * reduce: hit → increment; miss with room → insert at 1; miss when
    * full → decrement ALL counters by 1 and drop zeros (the classic
    * MG step — amortized O(1): each decrement cancels an earlier
    * increment). merge: sum counters, then subtract the (k+1)-th
    * largest count from all and drop non-positives (the proof-
    * preserving mergeable-summaries trim).
    */
  case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1)
        case None if b.size < k => b.updated(tok, 1L)
        case None =>
          b.collect { case (t, c) if c > 1 => t -> (c - 1) }
      }
    override def merge(x: Map[String, Long],
        y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest count (0-based index k of the desc sort);
        // subtracting it drops AT LEAST size-k entries, keeping ≤ k
        val kth = sum.valuesIterator.toArray.sortBy(-_).apply(k)
        sum.collect { case (t, c) if c > kth => t -> (c - kth) }
      }
    }
    // the counter map itself: consumers keep the keys as candidates
    // (q186) or persist the (key, estimate) rows as a sketch artifact
    // another sketch can merge with (q190's per-batch versions)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }
}
