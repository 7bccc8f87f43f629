package graft

import org.apache.spark.sql.functions._

import graft.etl.{Functions => F}
import graft.etl.expressions.Registry

class OptimizerSpec extends SparkSpec {

  // parquet-backed input: LocalRelation inputs get folded away by
  // ConvertToLocalRelation before the prefilter is observable
  private def parts = graft.util.Tables.part(spark, sf0001)
    .select(col("p_partkey"), col("p_name"))

  test("similarity prefilter rule injects a length bound and preserves results") {
    val probe = concat(substring(col("p_name"), 1, 12), lit(" xx"))
    val pred = F.seqRatio(col("p_name"), probe) >= 0.8
    val before = parts.filter(pred).collect().map(_.getLong(0)).toSet

    Registry.register(spark) // installs SimilarityPrefilter
    val after = parts.filter(pred)
    val optimized = after.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least("), optimized)
    assert(after.collect().map(_.getLong(0)).toSet == before)
    assert(before.nonEmpty)
  }

  test("rule is idempotent across repeated optimization") {
    Registry.register(spark)
    val df = parts.filter(F.seqRatio(col("p_name"), lit("green")) >= 0.5)
    val plan = df.queryExecution.optimizedPlan.toString
    // the bound must appear exactly once, not re-wrapped per fixpoint pass
    assert(plan.split("least\\(").length - 1 == 1, plan)
    assert(df.count() >= 0)
  }
}
