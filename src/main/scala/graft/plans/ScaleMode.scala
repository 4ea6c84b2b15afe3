package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Ascending, Attribute, Cast, Coalesce, CumeDist, CurrentRow, Divide, EqualTo, Expression, GreaterThan, If, IntegralDivide, LessThanOrEqual, Literal, Multiply, NamedExpression, NTile, PercentRank, RangeFrame, Rank, Remainder, RowFrame, RowNumber, SortOrder, SparkPartitionID, SpecifiedWindowFrame, Subtract, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Complete, Count, HyperLogLogPlusPlus, Max, Percentile, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, HintInfo, Join, JoinHint, LogicalPlan, Project, RepartitionByExpression, Window, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst extension surface (the preference-order (c) route from the
  * build guide): a `Rule[LogicalPlan]` injected via
  * `SparkSessionExtensions`, demonstrating how the engine extends the
  * optimizer where operator SEMANTICS shouldn't change but the physical
  * algorithm must for 100 TB.
  *
  * The rule: under `spark.graft.scaleMode=true`, exact-but-unbounded
  * constructs are rewritten to bounded/distributed twins with NO query
  * change — the knob is a conf, the rewrite is a plan transform:
  *  - `percentile` (buffers every value per group) →
  *    `approx_percentile` with a 10k-bucket KLL-style sketch;
  *    semantics agree to ~1/accuracy quantile error. Exact quartile
  *    plans like [[graft.operators.Analytics.a4DistributionSummary]]
  *    become sketch plans untouched at the query site.
  *  - single-column `count(DISTINCT x)` (a per-group hash set, the
  *    classic lake-scale OOM) → HyperLogLog++ at [[ScaleModeRewrite.DistinctSD]]
  *    relative error — the swap [[graft.operators.Curation.dqDrift]]'s
  *    distinct-users leg and every exact-distinct rollup lean on.
  *    Multi-column distincts keep their exact form (HLL++ is unary),
  *    and an Aggregate carrying MORE THAN ONE distinct group is left
  *    fully exact: `RewriteDistinctAggregates` expands those before
  *    `experimental.extraOptimizations` run but after injected
  *    optimizer rules do, so an unguarded swap would behave
  *    differently between the two documented deployment routes
  *    (HLL++ under `injectOptimizerRule`, exact under the extension
  *    list). The guard makes both routes identical by construction.
  *  - a GLOBAL rank-family window (`row_number()`/`rank()`/
  *    `percent_rank()`/`cume_dist()`/`ntile(b)` OVER (ORDER BY …) with no
  *    PARTITION BY — the single-partition corpus sort that
  *    [[graft.operators.Ranks]] exists to avoid) → the distributed
  *    range-partition construction: range-shuffle on the order keys,
  *    capture the partition id, rank locally per partition, and add
  *    the exclusive running count of preceding partitions (a window
  *    over the #partitions-row count aggregate — constant-size). The
  *    ratio forms divide the same integers the native functions
  *    divide ((rank−1)/(N−1), peer-cum/N), so the doubles are
  *    bit-identical. Same results, no single-partition shuffle of the
  *    ranked frame. The construction's offset join re-reads the
  *    ranged exchange, so it is only applied when
  *    `spark.sql.exchange.reuse` is on (its default) — with reuse
  *    disabled the two exchange instances could sample different
  *    range boundaries and silently mis-rank, so the rule leaves the
  *    original (correct, merely unscaled) window in place.
  *
  * Deployment: `--conf spark.sql.extensions=graft.plans.ScaleModeExtensions`
  * at session build, or `spark.experimental.extraOptimizations ++=
  * Seq(ScaleModeRewrite)` on a live session (extensions cannot be
  * added to an already-built session). The multi-distinct guard above
  * keeps the two routes result-identical; the spec drives both.
  */
class ScaleModeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => ScaleModeRewrite)
}

object ScaleModeRewrite extends Rule[LogicalPlan] {

  /** Apply the rewrite EAGERLY to one DataFrame's analyzed plan, conf
    * scoped to the call — the w12_rank_distributed pattern extracted:
    * a query opts its own global window into the distributed
    * construction without flipping session-wide optimizer state that
    * would leak into every other query in a sweep. Fails loudly if the
    * rewrite declined (a silently-kept global window would pass tests
    * and fall over at scale).
    */
  def rewriteEager(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.graft.scaleMode")
    spark.conf.set("spark.graft.scaleMode", "true")
    val rewritten =
      try apply(df.queryExecution.analyzed)
      finally prev match {
        case Some(v) => spark.conf.set("spark.graft.scaleMode", v)
        case None => spark.conf.unset("spark.graft.scaleMode")
      }
    require(rewritten.toString.contains("__graft_pid"),
      "ScaleModeRewrite must fire on the global rank window (exchange reuse off?)")
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, rewritten)
  }

  /** Sketch accuracy: quantile error ≤ 1/accuracy relative rank. */
  val Accuracy = 10000

  /** HLL++ relative standard deviation for the distinct-count swap
    * (~1% — the accuracy/space point `approx_count_distinct` users
    * pick when the count feeds a ppm-level alarm, not a ledger).
    */
  val DistinctSD = 0.01

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.scaleMode", "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate => rewriteAggregate(agg)
      // The rank construction's correctness REQUIRES the ranged
      // exchange to be physically shared between the local-rank side
      // and the offset side (range boundary sampling is seeded per
      // shuffle instance) — ReuseExchange is what guarantees that, so
      // with it disabled the rewrite must not fire.
      case w: Window if isGlobalRankWindow(w) && conf.exchangeReuseEnabled =>
        rewriteGlobalRank(w)
    }

  /** Distinct "groups" exactly as `RewriteDistinctAggregates` sees them:
    * distinct aggregates partitioned by their (canonicalized, non-
    * foldable) argument set. >1 group triggers the Expand-based rewrite
    * whose position relative to this rule differs between deployment
    * routes — so those Aggregates are left exact.
    */
  private def rewriteAggregate(agg: Aggregate): Aggregate = {
    val distinctGroups = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression if ae.isDistinct =>
        ae.aggregateFunction.children.filterNot(_.foldable).map(_.canonicalized).toSet
    }).distinct.size
    agg.transformExpressions {
      // COUNT(DISTINCT x): the unbounded per-group hash set becomes a
      // fixed-register HLL++ sketch; LongType either way, null-skipping
      // either way, so the analyzed schema and null semantics survive
      case ae @ AggregateExpression(c: Count, _, true, _, _)
          if c.children.size == 1 && distinctGroups <= 1 =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(c.children.head, DistinctSD),
          isDistinct = false)
      case ae @ AggregateExpression(p: Percentile, _, _, _, _)
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
        ae.copy(aggregateFunction = new ApproximatePercentile(
          child, p.percentageExpression, Literal(Accuracy)))
    }
  }

  private def isGlobalRankWindow(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.deterministic) &&
      w.windowExpressions.nonEmpty &&
      w.windowExpressions.forall {
        case Alias(WindowExpression(
          _: RowNumber | _: Rank | _: PercentRank | _: CumeDist, _), _) => true
        case Alias(WindowExpression(nt: NTile, _), _) => nt.buckets.foldable
        case _ => false
      }

  /** The distributed twin of `row_number()/rank()/percent_rank()/
    * cume_dist() OVER (ORDER BY k)`:
    *
    * {{{
    *   ranged  = RepartitionByExpression(orderSpec, child)   // range shuffle
    *   pids    = Project(child.* , pid = spark_partition_id())
    *   local   = Window(rn = row_number() OVER (PARTITION BY pid ORDER BY k)
    *                    [, rank/peer-count per requested function], pids)
    *   counts  = Aggregate(pid, max(rn) AS cnt, local)       // from the
    *                                     // window OUTPUT — a linear chain
    *   offsets = Window(sum(cnt) OVER (PARTITION BY 0 ORDER BY pid
    *                                   ROWS UNBOUNDED PRECEDING TO -1),
    *                    sum(cnt) OVER (… UNBOUNDED BOTH) AS total, counts)
    *   result  = Project(child.*, offset + local AS <original attr>
    *                     [ratio forms divide by total/total−1],
    *                     local JOIN broadcast(offsets) ON pid)
    * }}}
    *
    * Correctness leans on two range-partitioner properties: partition
    * ids are ordered by key range, and EQUAL keys land in one partition
    * (so `rank`'s peer groups never straddle a boundary). Per-partition
    * counts are derived as `max(row_number)` FROM THE LOCAL WINDOW'S
    * OUTPUT, not from a second aggregate over the exchange, so the
    * ranged exchange has exactly one direct consumer and the only
    * shared subtree is the post-window frame — `ReuseExchange` then
    * collapses the offset side's copy onto the one physical shuffle
    * (boundary sampling is per shuffle instance, which is why
    * [[apply]] refuses to rewrite when reuse is disabled).
    * `EnsureRequirements` re-clusters the window side by pid — a
    * second DISTRIBUTED shuffle; the construction trades the
    * single-partition global sort for two corpus-wide parallel
    * shuffles plus one #partitions-row window.
    *
    * The ratio functions reproduce the native integer→double
    * divisions exactly: `percent_rank = (rank−1)/(N−1)` (0 when N=1)
    * and `cume_dist = peer-cum/N`, with `N = sum(cnt)` over the full
    * #partitions frame and peer-cum a RANGE-framed count per pid (peers
    * never straddle partitions), so the doubles are bit-identical to
    * the single-partition plan's. `ntile(b)` derives from the same
    * payload with pure integer arithmetic (bit-exact, no doubles):
    * with n = total, size1 = n div b + 1, padded = (n mod b)·size1,
    * Spark assigns row rn the bucket `(rn−1) div size1 + 1` when
    * rn ≤ padded, else `(n mod b) + (rn−1−padded) div (n div b) + 1`
    * — the first n mod b buckets carry the extra row, exactly the
    * native incremental assignment in closed form.
    */
  private def rewriteGlobalRank(w: Window): LogicalPlan = {
    val child = w.child
    val ranged = RepartitionByExpression(w.orderSpec, child, None)
    val pidAlias = Alias(Cast(SparkPartitionID(), LongType), "__graft_pid")()
    val pids = Project(child.output :+ pidAlias, ranged)
    val pid = pidAlias.toAttribute

    val localFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val localSpec = WindowSpecDefinition(Seq(pid), w.orderSpec, localFrame)
    // peer-inclusive frame for cume_dist's numerator: RANGE …
    // CURRENT ROW counts every peer of the current order key
    val peerFrame = SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)
    val peerSpec = WindowSpecDefinition(Seq(pid), w.orderSpec, peerFrame)

    // always emitted: the per-pid row_number whose per-pid max IS the
    // partition row count (tie-order-independent)
    val rnAlias = Alias(WindowExpression(RowNumber(), localSpec), "__graft_rn")()
    // per requested function, its local per-pid ingredient (None =
    // rides on rnAlias)
    val localAliases: Seq[Option[Alias]] = w.windowExpressions.map {
      case Alias(WindowExpression(_: RowNumber | _: NTile, _), _) => None
      case Alias(WindowExpression(f: Rank, _), name) =>
        Some(Alias(WindowExpression(f, localSpec), s"__graft_local_$name")())
      case Alias(WindowExpression(pr: PercentRank, _), name) =>
        Some(Alias(WindowExpression(Rank(pr.children), localSpec),
          s"__graft_local_$name")())
      case Alias(WindowExpression(_: CumeDist, _), name) =>
        Some(Alias(WindowExpression(
          AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
          peerSpec), s"__graft_local_$name")())
      case other =>
        throw new IllegalStateException(s"unexpected window expression: $other")
    }
    val local = Window(rnAlias +: localAliases.flatten,
      Seq(pid), w.orderSpec, pids)

    val cntAlias = Alias(
      Cast(AggregateExpression(Max(rnAlias.toAttribute), Complete,
        isDistinct = false), LongType),
      "__graft_cnt")()
    val counts = Aggregate(Seq(pid), Seq(pid, cntAlias), local)
    val orderByPid = Seq(SortOrder(pid, Ascending))
    val offsetFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))
    val totalFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val offsetAlias = Alias(
      WindowExpression(
        AggregateExpression(Sum(cntAlias.toAttribute), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(Literal(0)), orderByPid, offsetFrame)),
      "__graft_offset")()
    val totalAlias = Alias(
      WindowExpression(
        AggregateExpression(Sum(cntAlias.toAttribute), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(Literal(0)), orderByPid, totalFrame)),
      "__graft_total")()
    // rename the aggregate's pid attribute on the build side so the join
    // condition references two distinct exprIds
    val pidRight = Alias(pid, "__graft_pid_r")()
    val offsets = Project(
      Seq(pidRight, offsetAlias.toAttribute, totalAlias.toAttribute),
      Window(Seq(offsetAlias, totalAlias), Seq(Literal(0)), orderByPid, counts))

    val joined = Join(local, offsets, Inner,
      Some(EqualTo(pid, pidRight.toAttribute)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    val offset0 = Coalesce(Seq(offsetAlias.toAttribute, Literal(0L)))
    val total = totalAlias.toAttribute
    // original window-output attributes keep their exprIds: downstream
    // operators reference them
    val rankCols: Seq[NamedExpression] =
      w.windowExpressions.zip(localAliases).map { case (orig, localOpt) =>
        val localAttr = localOpt.getOrElse(rnAlias).toAttribute
        val globalLong = Add(offset0, Cast(localAttr, LongType))
        val global: Expression = orig match {
          case Alias(WindowExpression(_: RowNumber | _: Rank, _), _) =>
            Cast(globalLong, IntegerType)
          case Alias(WindowExpression(_: PercentRank, _), _) =>
            If(GreaterThan(total, Literal(1L)),
              Divide(
                Cast(Subtract(globalLong, Literal(1L)), DoubleType),
                Cast(Subtract(total, Literal(1L)), DoubleType)),
              Literal(0.0))
          case Alias(WindowExpression(_: CumeDist, _), _) =>
            Divide(Cast(globalLong, DoubleType), Cast(total, DoubleType))
          case Alias(WindowExpression(nt: NTile, _), _) =>
            // closed form of the native incremental assignment — all
            // integer ops, so bit-exact (see the scaladoc derivation)
            val b = Cast(nt.buckets, LongType)
            val bucketSize = IntegralDivide(total, b)
            val rem = Remainder(total, b)
            val size1 = Add(bucketSize, Literal(1L))
            val padded = Multiply(rem, size1)
            val rnm1 = Subtract(globalLong, Literal(1L))
            Cast(
              If(LessThanOrEqual(globalLong, padded),
                Add(IntegralDivide(rnm1, size1), Literal(1L)),
                Add(Add(rem, IntegralDivide(Subtract(rnm1, padded), bucketSize)),
                  Literal(1L))),
              IntegerType)
          case other =>
            throw new IllegalStateException(s"unexpected window expression: $other")
        }
        Alias(global, orig.name)(exprId = orig.exprId)
      }
    Project(child.output ++ rankCols, joined)
  }
}
