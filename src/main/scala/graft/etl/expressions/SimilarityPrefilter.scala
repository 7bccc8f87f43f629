package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: similarity-join prefilter (SURVEY.md §4 item 3).
  *
  * Ratcliff–Obershelp ratio = 2M/(|a|+|b|) with M <= min(|a|,|b|), so
  * `seq_ratio(a,b) >= τ` implies `2*min(|a|,|b|) >= τ*(|a|+|b|)`.
  * The rule conjoins that length bound in front of the predicate: the
  * cheap check short-circuits the O(|a|·|b|) dynamic program for the
  * (overwhelmingly common at scale) pairs whose lengths already rule
  * them out — the classic cheap-necessary-condition prefilter of
  * similarity joins, here as a `Rule[LogicalPlan]` so EVERY query using
  * seq_ratio benefits without rewriting.
  *
  * Sound: the added conjunct is implied by the original predicate, so
  * the filter result is unchanged (verified in OptimizerSpec).
  */
object SimilarityPrefilter extends Rule[LogicalPlan] {
  private val applied = TreeNodeTag[Boolean]("graft.simPrefilterApplied")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case geq @ GreaterThanOrEqual(sr: SequenceRatio, Literal(tau: Double, DoubleType))
        if sr.getTagValue(applied).isEmpty =>
      sr.setTagValue(applied, true)
      And(lengthBound(sr.left, sr.right, tau), geq)
    case geq @ GreaterThan(sr: SequenceRatio, Literal(tau: Double, DoubleType))
        if sr.getTagValue(applied).isEmpty =>
      sr.setTagValue(applied, true)
      And(lengthBound(sr.left, sr.right, tau), geq)
  }

  private def lengthBound(a: Expression, b: Expression, tau: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    GreaterThanOrEqual(
      Multiply(Literal(2.0), Least(Seq(la, lb))),
      Multiply(Literal(tau), Add(la, lb)))
  }
}
