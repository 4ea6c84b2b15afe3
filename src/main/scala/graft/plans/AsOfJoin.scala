package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF join as a first-class operator — the preference-order (c)
  * route from the build guide taken ALL the way: a custom logical node
  * ([[AsOfJoinPlan]]), a planner [[SparkStrategy]] ([[AsOfJoinStrategy]])
  * and a physical [[AsOfJoinExec]], injectable via
  * `SparkSessionExtensions` ([[AsOfJoinExtensions]]) or
  * `spark.experimental.extraStrategies` (what [[AsOfJoin.asof]] does).
  *
  * Semantics: for every left row, attach the right row of the same key
  * whose (time, tiebreak…) is the LARGEST with `right.time ≤
  * left.time`, or nulls when no such row exists (left-outer ASOF — the
  * point-in-time lookup financial ticks, CDC snapshots and
  * feature-store reads all need). The tiebreak columns make the match
  * DETERMINISTIC when several right rows share the boundary timestamp
  * — semantics a window `last(…)` formulation (the (a)-route twin,
  * [[graft.streaming.EventStreams.asofJoin]]) can express but a plain
  * range join cannot without a post-rank.
  *
  * Physical algorithm: both sides hash-cluster on the key
  * (`requiredChildDistribution` — EnsureRequirements co-partitions
  * them, exactly as it would a SortMergeJoin) and sort per partition on
  * (key, time[, tiebreaks]) (`requiredChildOrdering` — SortExec is
  * spill-safe). The exec then streams BOTH sorted iterators in one
  * merge pass per partition, carrying a single "latest right row so
  * far" cell: O(|L|+|R|) time, O(1) state beyond the sort buffers, no
  * right-side buffering of equal-key runs (the buffered-group hazard a
  * naive SMJ-based as-of inherits when one key has millions of right
  * rows).
  *
  * Scale: two corpus-wide parallel shuffles + per-partition sorts —
  * the same exchange bill as any co-partitioned join — and the merge
  * itself never materializes a pair list, so a hot key costs its sort,
  * not its cross product. Time/tiebreak columns must be LongType
  * (micros — the discipline every temporal query in this engine
  * already follows); keys must be non-null.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreaks: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] onto [[AsOfJoinExec]]; a no-op for every
  * other node, so it composes with the built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** `SparkSessionExtensions` deployment route:
  * `--conf spark.sql.extensions=graft.plans.AsOfJoinExtensions`.
  */
class AsOfJoinExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreaks: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be LongType (unix micros)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-cluster both sides on their keys; EnsureRequirements inserts
    * co-partitioned exchanges exactly as for an equi-join.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Per-partition sort on (key, time[, tiebreaks]) — what makes the
    * single merge pass sufficient.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreaks)).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  /** The merge emits exactly one row per left row, in left order — the
    * (key, time) sort survives, so a downstream window or merge join on
    * the same keys skips its sort.
    */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeBound = BindReferences.bindReference(leftTime, lOut)
      val rTimeBound = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // bind against the right side RE-MARKED nullable: BoundReference
      // takes its null-check from the INPUT attribute, and a
      // non-nullable right child (e.g. a local relation of longs)
      // would otherwise read 0 where the null-extension wrote null
      val resultProj =
        UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // lookahead right row + its key, both copied out of the sorter's
        // reused buffers; `latest` is the single as-of state cell
        private var head: InternalRow = _
        private var headKey: InternalRow = _
        private var latest: InternalRow = _
        private var latestKey: InternalRow = _
        advance()
        private def advance(): Unit =
          if (rIter.hasNext) {
            head = rIter.next().copy()
            headKey = rKeyProj(head).copy()
          } else head = null

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeBound.eval(l).asInstanceOf[Long]
          var cmp = if (head == null) 1 else keyOrd.compare(headKey, lKey)
          while (head != null && (cmp < 0 ||
              (cmp == 0 && rTimeBound.eval(head).asInstanceOf[Long] <= lTime))) {
            latest = head
            latestKey = headKey
            advance()
            cmp = if (head == null) 1 else keyOrd.compare(headKey, lKey)
          }
          outRows += 1
          if (latest != null && keyOrd.compare(latestKey, lKey) == 0) {
            matched += 1
            resultProj(joined(l, latest))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame-level ASOF: left-outer point-in-time join of `left` to
    * the latest `right` row per key with `rightTime ≤ leftTime`,
    * deterministic under `tieBreaks`. Registers [[AsOfJoinStrategy]] on
    * the session's experimental strategies on first use (idempotent).
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTieBreaks: Seq[Column] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(GraftColumnBridge.expression),
      rightKeys.map(GraftColumnBridge.expression),
      GraftColumnBridge.expression(leftTime),
      GraftColumnBridge.expression(rightTime),
      rightTieBreaks.map(GraftColumnBridge.expression)))
  }
}
