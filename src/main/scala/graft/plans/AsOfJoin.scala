package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
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
/** Match direction (round-11, the pandas `merge_asof` surface):
  * BACKWARD = latest right with rt ≤ lt (the classic as-of);
  * FORWARD = earliest right with rt ≥ lt (next-event attach);
  * NEAREST = whichever of the two is closer in time, ties going
  * backward. All three run in the SAME single merge pass — the
  * backward candidate is the carry cell, the forward candidate is the
  * lookahead head, so direction costs zero extra state or passes.
  */
object AsOfDirection {
  val Backward = 0
  val Forward = 1
  val Nearest = 2
  def parse(s: String): Int = s match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }
}

case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreaks: Seq[Expression],
    direction: Int = AsOfDirection.Backward,
    toleranceMicros: Long = -1L) extends BinaryNode {
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
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r), dir, tol) :: Nil
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
    right: SparkPlan,
    direction: Int = AsOfDirection.Backward,
    toleranceMicros: Long = -1L) extends BinaryExecNode with CodegenSupport {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be LongType (unix micros)")
  require(direction >= AsOfDirection.Backward && direction <= AsOfDirection.Nearest,
    s"unknown as-of direction code $direction")

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
          // FORWARD leaves rt == lt in the lookahead (its match is the
          // FIRST right row with rt ≥ lt in (rt, tiebreak) order);
          // backward/nearest consume it into the carry (LAST wins —
          // the tiebreak). Either way the pass stays single and O(1).
          while (head != null && (cmp < 0 || (cmp == 0 && {
              val rt = rTimeBound.eval(head).asInstanceOf[Long]
              if (direction == AsOfDirection.Forward) rt < lTime else rt <= lTime
            }))) {
            latest = head
            latestKey = headKey
            advance()
            cmp = if (head == null) 1 else keyOrd.compare(headKey, lKey)
          }
          // backward candidate: the carry cell, if key-matched and in
          // tolerance; forward candidate: the lookahead, same checks
          def backwardRow: InternalRow =
            if (latest != null && keyOrd.compare(latestKey, lKey) == 0) {
              val d = lTime - rTimeBound.eval(latest).asInstanceOf[Long]
              if (toleranceMicros < 0 || d <= toleranceMicros) latest else null
            } else null
          def forwardRow: InternalRow =
            if (head != null && cmp == 0) {
              val d = rTimeBound.eval(head).asInstanceOf[Long] - lTime
              if (toleranceMicros < 0 || d <= toleranceMicros) head else null
            } else null
          val m = direction match {
            case AsOfDirection.Backward => backwardRow
            case AsOfDirection.Forward  => forwardRow
            case _ =>
              val b = backwardRow
              val f = forwardRow
              if (b == null) f
              else if (f == null) b
              else {
                val db = lTime - rTimeBound.eval(b).asInstanceOf[Long]
                val df = rTimeBound.eval(f).asInstanceOf[Long] - lTime
                if (df < db) f else b // tie → backward (pandas semantics)
              }
          }
          outRows += 1
          if (m != null) {
            matched += 1
            resultProj(joined(l, m))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ---- whole-stage codegen (round-11) ----
  //
  // The merge becomes the PRODUCE side of the stage, exactly the
  // SortMergeJoinExec pattern: both sorted children arrive as the
  // stage's two input iterators (WholeStageCodegenExec supports
  // precisely two), the carry/lookahead state machine lives in
  // generated class fields, and every downstream projection/aggregate
  // fuses into the same loop — the 5 consumer queries stop paying the
  // interpreted-iterator boundary per row.
  //
  // Scope: single LongType key (what every consumer uses — a
  // multi-key or non-long caller falls back to the interpreted
  // doExecute automatically via supportCodegen). Null semantics
  // replicate the interpreted path bit-for-bit: keys order nulls
  // FIRST and null==null matches (RowOrdering), null times coerce to
  // 0 (Scala's null.asInstanceOf[Long]).

  override def supportCodegen: Boolean =
    leftKeys.size == 1 && rightKeys.size == 1 &&
      leftKeys.head.dataType == LongType && rightKeys.head.dataType == LongType

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the left iterator's reused UnsafeRow buffer
  // (and the copied right carry) — a buffering parent must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val head = ctx.addMutableState("InternalRow", "asofHead")
    val headKey = ctx.addMutableState("long", "asofHeadKey")
    val headKeyNull = ctx.addMutableState("boolean", "asofHeadKeyNull")
    val headRt = ctx.addMutableState("long", "asofHeadRt")
    val latest = ctx.addMutableState("InternalRow", "asofLatest")
    val latestKey = ctx.addMutableState("long", "asofLatestKey")
    val latestKeyNull = ctx.addMutableState("boolean", "asofLatestKeyNull")
    val latestRt = ctx.addMutableState("long", "asofLatestRt")
    val init = ctx.addMutableState("boolean", "asofInit")

    // right key/time evaluated once per advance, cached in the fields
    val rRow = ctx.freshName("asofRRow")
    ctx.INPUT_ROW = rRow
    ctx.currentVars = null
    val rKeyEv = BindReferences.bindReference(rightKeys.head, right.output).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceFn = ctx.addNewFunction("asofAdvance",
      s"""
         |private void asofAdvance() {
         |  if ($rightInput.hasNext()) {
         |    InternalRow $rRow = ((InternalRow) $rightInput.next()).copy();
         |    ${rKeyEv.code}
         |    ${rtEv.code}
         |    $head = $rRow;
         |    $headKeyNull = ${rKeyEv.isNull};
         |    $headKey = $headKeyNull ? 0L : ${rKeyEv.value};
         |    $headRt = ${rtEv.isNull} ? 0L : ${rtEv.value};
         |  } else {
         |    $head = null;
         |  }
         |}
       """.stripMargin)

    val lRow = ctx.freshName("asofLRow")
    ctx.INPUT_ROW = lRow
    ctx.currentVars = null
    val lKeyEv = BindReferences.bindReference(leftKeys.head, left.output).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matched = ctx.freshName("asofMatched")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val c =
        code"""
boolean $isNull = $matched == null || $matched.isNullAt($i);
$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} :
  (${CodeGenerator.getValue(matched, a.dataType, i.toString)});"""
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    val numOutput = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    val lKeyNull = ctx.freshName("asofLKeyNull")
    val lKeyV = ctx.freshName("asofLKey")
    val lTimeV = ctx.freshName("asofLTime")
    // FORWARD leaves boundary-equal rows in the lookahead (first-wins)
    val advCond =
      if (direction == AsOfDirection.Forward) s"$headRt < $lTimeV"
      else s"$headRt <= $lTimeV"
    val headLt =
      s"(($headKeyNull && !$lKeyNull) || (!$headKeyNull && !$lKeyNull && $headKey < $lKeyV))"
    val headEq =
      s"(($headKeyNull && $lKeyNull) || (!$headKeyNull && !$lKeyNull && $headKey == $lKeyV))"
    val latestEq =
      s"(($latestKeyNull && $lKeyNull) || (!$latestKeyNull && !$lKeyNull && $latestKey == $lKeyV))"
    val tolBw =
      if (toleranceMicros < 0) "true"
      else s"($lTimeV - $latestRt) <= ${toleranceMicros}L"
    val tolFw =
      if (toleranceMicros < 0) "true"
      else s"($headRt - $lTimeV) <= ${toleranceMicros}L"
    val bwOk = s"($latest != null && $latestEq && $tolBw)"
    val fwOk = s"($head != null && $headEq && $tolFw)"
    val select = direction match {
      case AsOfDirection.Backward => s"if ($bwOk) $matched = $latest;"
      case AsOfDirection.Forward  => s"if ($fwOk) $matched = $head;"
      case _ =>
        s"""
           |boolean asofBw = $bwOk;
           |boolean asofFw = $fwOk;
           |if (asofBw && asofFw) {
           |  $matched = (($headRt - $lTimeV) < ($lTimeV - $latestRt)) ? $head : $latest;
           |} else if (asofBw) {
           |  $matched = $latest;
           |} else if (asofFw) {
           |  $matched = $head;
           |}
         """.stripMargin
    }

    s"""
       |if (!$init) {
       |  $init = true;
       |  $advanceFn();
       |}
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRow = (InternalRow) $leftInput.next();
       |  ${lKeyEv.code}
       |  ${ltEv.code}
       |  boolean $lKeyNull = ${lKeyEv.isNull};
       |  long $lKeyV = $lKeyNull ? 0L : ${lKeyEv.value};
       |  long $lTimeV = ${ltEv.isNull} ? 0L : ${ltEv.value};
       |  while ($head != null && ($headLt || ($headEq && $advCond))) {
       |    $latest = $head;
       |    $latestKey = $headKey;
       |    $latestKeyNull = $headKeyNull;
       |    $latestRt = $headRt;
       |    $advanceFn();
       |  }
       |  InternalRow $matched = null;
       |  $select
       |  $numOutput.add(1);
       |  if ($matched != null) $numMatched.add(1);
       |  ${evaluateVariables(leftVars ++ rightVars)}
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

object AsOfJoin {
  /** DataFrame-level ASOF: left-outer point-in-time join of `left` to
    * the latest `right` row per key with `rightTime ≤ leftTime`,
    * deterministic under `tieBreaks`. Registers [[AsOfJoinStrategy]] on
    * the session's experimental strategies on first use (idempotent).
    */
  /** Time-type discipline at the API edge: the exec merges on LongType
    * unix MICROS (integer compares — no engine-parity float/timezone
    * hazards). TimestampType callers are adapted here via
    * `unix_micros(...)`; any other type gets a clear error naming the
    * discipline instead of the exec's bare require.
    */
  private def toMicros(df: DataFrame, time: Column, side: String): Expression = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val e = GraftColumnBridge.expression(time)
    df.select(time).schema.head.dataType match {
      case LongType      => e
      // the Catalyst node directly, NOT functions.unix_micros: the sql
      // function builds an UnresolvedFunction column node that the
      // analyzer does not resolve inside a custom LogicalPlan
      case TimestampType =>
        org.apache.spark.sql.catalyst.expressions.UnixMicros(e)
      case other => throw new IllegalArgumentException(
        s"asof $side time column must be LongType unix micros or " +
          s"TimestampType (auto-converted via unix_micros), got " +
          s"${other.simpleString}: cast TIMESTAMP_NTZ/DATE/string inputs " +
          "to timestamp or integer micros at the call site")
    }
  }

  /** @param direction  "backward" (default), "forward", or "nearest"
    * @param toleranceMicros  max |left.time − right.time| for a match;
    *                         negative = unbounded (default)
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTieBreaks: Seq[Column] = Nil,
      direction: String = "backward",
      toleranceMicros: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(GraftColumnBridge.expression),
      rightKeys.map(GraftColumnBridge.expression),
      toMicros(left, leftTime, "left"),
      toMicros(right, rightTime, "right"),
      rightTieBreaks.map(GraftColumnBridge.expression),
      AsOfDirection.parse(direction),
      toleranceMicros))
  }
}
