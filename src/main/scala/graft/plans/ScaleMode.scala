package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst extension surface (the preference-order (c) route from the
  * build guide): a `Rule[LogicalPlan]` injected via
  * `SparkSessionExtensions`, demonstrating how the engine extends the
  * optimizer where operator SEMANTICS shouldn't change but the physical
  * algorithm must for 100 TB.
  *
  * The rule: under `spark.graft.scaleMode=true`, exact-but-unbounded
  * aggregates are rewritten to their bounded-memory mergeable sketch
  * twins with NO query change — the knob is a conf, the rewrite is a
  * plan transform:
  *  - `percentile` (buffers every value per group) →
  *    `approx_percentile` with a 10k-bucket KLL-style sketch;
  *    semantics agree to ~1/accuracy quantile error. Exact quartile
  *    plans like [[graft.operators.Analytics.a4DistributionSummary]]
  *    become sketch plans untouched at the query site.
  *  - single-column `count(DISTINCT x)` (a per-group hash set, the
  *    classic lake-scale OOM) → HyperLogLog++ at [[ScaleModeRewrite.DistinctSD]]
  *    relative error — the swap [[graft.operators.Curation.dqDrift]]'s
  *    distinct-users leg and every exact-distinct rollup lean on.
  *    Multi-column distincts keep their exact form (HLL++ is unary).
  *
  * Deployment: `--conf spark.sql.extensions=graft.plans.ScaleModeExtensions`
  * at session build, or `spark.experimental.extraOptimizations ++=
  * Seq(ScaleModeRewrite)` on a live session (the spec uses the latter —
  * extensions cannot be added to an already-built session).
  */
class ScaleModeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => ScaleModeRewrite)
}

object ScaleModeRewrite extends Rule[LogicalPlan] {

  /** Sketch accuracy: quantile error ≤ 1/accuracy relative rank. */
  val Accuracy = 10000

  /** HLL++ relative standard deviation for the distinct-count swap
    * (~1% — the accuracy/space point `approx_count_distinct` users
    * pick when the count feeds a ppm-level alarm, not a ledger).
    */
  val DistinctSD = 0.01

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.scaleMode", "false").toBoolean) plan
    else plan.transformAllExpressions {
      // COUNT(DISTINCT x): the unbounded per-group hash set becomes a
      // fixed-register HLL++ sketch; LongType either way, null-skipping
      // either way, so the analyzed schema and null semantics survive
      case agg @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
        agg.copy(
          aggregateFunction = HyperLogLogPlusPlus(c.children.head, DistinctSD),
          isDistinct = false)
      case agg @ AggregateExpression(p: Percentile, _, _, _, _)
          // frequency-weighted and descending percentiles have no
          // approx twin — leave those exact
          if p.frequencyExpression == Literal(1L) && !p.reverse =>
        // Percentile is always DoubleType, ApproximatePercentile returns
        // its child's type: cast non-double children so the rewrite
        // never changes the analyzed result type (a percentile over an
        // int column would otherwise yield a plan whose expression type
        // contradicts the schema)
        val child =
          if (p.child.dataType == DoubleType) p.child
          else Cast(p.child, DoubleType)
        agg.copy(aggregateFunction = new ApproximatePercentile(
          child, p.percentageExpression, Literal(Accuracy)))
    }
}
