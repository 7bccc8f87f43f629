package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Bloom-filter sketch surface for membership prefilters.
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its own runtime row-level join filtering but does not register them
  * as public functions; this exposes them as library columns (same
  * codegen'd evaluation path the optimizer's injected filters use).
  *
  * The intended pattern is PREFILTER + EXACT CONFIRM: a fixed-size
  * sketch of the lookup side broadcast to the scan drops ~all
  * non-members; a semi-join on the survivors removes the sketch's
  * false positives, so results stay exact while the broadcast payload
  * is bits-sized rather than set-sized (see q84).
  */
object Bloom {

  /** Aggregate: build a Bloom sketch (binary) over `c` (hashed with
    * xxhash64 — the expression accepts long input). `numBits` fixes
    * the sketch size regardless of the set's cardinality.
    */
  def sketchAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[sketchAgg]] sketch: false negatives
    * never, false positives at the configured rate.
    */
  def mightContain(sketch: Column, c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(sketch),
      GraftBridge.expression(xxhash64(c))))
}
