package graft

import graft.operators.Analytics
import graft.plans.ScaleModeRewrite
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, HyperLogLogPlusPlus, Percentile}
import org.scalatest.funsuite.AnyFunSuite

class PlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collectPlans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectPlans(a.executedPlan)
    // materialized AQE stages are leaves wrapping their subtree
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: collectPlans(q.plan)
    case other => other +: other.children.flatMap(collectPlans)
  }

  test("perplexity filter has no single-partition corpus-cardinality window") {
    // the round-7 verdict's last scale-killer: the p90 surprise cut used
    // a global row_number over the per-doc frame. The two-phase
    // Ranks.valueAtRank construction may keep exactly ONE unpartitioned
    // window — the offset scan over the ~O(score range / bucket width)
    // BUCKET-count aggregate, never a per-doc frame
    val plan = graft.operators.TextOps
      .perplexityFilter(spark, sf).queryExecution.executedPlan
    val windows = collectPlans(plan).filter(_.nodeName.contains("Window"))
    assert(windows.nonEmpty, "the rank construction must window somewhere")
    windows.filter(_.outputPartitioning.numPartitions == 1).foreach { w =>
      val firstAgg = collectPlans(w).drop(1)
        .find(_.nodeName.contains("HashAggregate"))
      assert(firstAgg.exists(_.toString.contains("bucket")),
        s"single-partition window must run over the bucket aggregate, not docs:\n$w")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // At 100 TB the win of a selective dim filter is realized on the
    // FACT side by Spark's InjectRuntimeFilter: a bloom filter built
    // from the filtered dim keys is pushed into the fact scan, dropping
    // non-joining rows before the shuffle. The size thresholds that
    // gate it are lake-scale; lower them to prove the mechanism engages
    // on our join shape (shuffle join + selective creation side).
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter") ||
        optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter in:\n$optimized")
      // and it must not change the answer
      val expected = lineitem.join(
        spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.collect()(0).getLong(0) === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("scale-mode rule rewrites exact percentile to the bounded-memory sketch") {
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      val scaled = Analytics.a4DistributionSummary(spark, sf)
      val exprs = scaled.queryExecution.optimizedPlan.flatMap(_.expressions)
      assert(exprs.exists(_.exists(_.isInstanceOf[ApproximatePercentile])),
        "scaleMode=true must rewrite percentile → approx_percentile")
      assert(!exprs.exists(_.exists(_.isInstanceOf[Percentile])),
        "no exact percentile may survive the rewrite")
      val approx = scaled.collect()

      spark.conf.set("spark.graft.scaleMode", "false")
      val exact = Analytics.a4DistributionSummary(spark, sf)
      assert(exact.queryExecution.optimizedPlan.flatMap(_.expressions)
        .exists(_.exists(_.isInstanceOf[Percentile])),
        "flag off must leave the exact percentile untouched")
      // approx_percentile is nearest-rank (an actual data value) while
      // exact percentile interpolates: quartiles agree to within the
      // local inter-value gap; min/max are exact either way
      val exactRows = exact.collect()
      assert(approx.map(_.getString(0)).toSeq === exactRows.map(_.getString(0)).toSeq)
      for ((a, e) <- approx.zip(exactRows); i <- 1 to 3)
        assert(math.abs(a.getDouble(i) - e.getDouble(i)) < 1.0,
          s"quartile $i drifted: ${a.getDouble(i)} vs ${e.getDouble(i)}")
      for ((a, e) <- approx.zip(exactRows); i <- 4 to 5)
        assert(a.getDouble(i) === e.getDouble(i), "min/max must be exact")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("scale-mode rule swaps single-column count distinct for HLL++ within 1% error") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      val scaled = graft.operators.Curation.dqDrift(spark, sf)
      val exprs = scaled.queryExecution.optimizedPlan.flatMap(_.expressions)
      assert(exprs.exists(_.exists(_.isInstanceOf[HyperLogLogPlusPlus])),
        "scaleMode=true must rewrite count(distinct user_id) → HLL++")
      val approx = scaled.collect()
      spark.conf.set("spark.graft.scaleMode", "false")
      val exact = graft.operators.Curation.dqDrift(spark, sf).collect()
      assert(!graft.operators.Curation.dqDrift(spark, sf)
        .queryExecution.optimizedPlan.flatMap(_.expressions)
        .exists(_.exists(_.isInstanceOf[HyperLogLogPlusPlus])),
        "flag off must leave the exact distinct untouched")
      // day keys, volumes, means and flags are sketch-independent;
      // only n_users may deviate, and at most by ~3 sigma of the 1% SD
      assert(approx.map(_.getString(0)).toSeq === exact.map(_.getString(0)).toSeq)
      for ((a, e) <- approx.zip(exact)) {
        assert(a.getLong(1) === e.getLong(1), "per-day volume must stay exact")
        assert(a.getLong(3) === e.getLong(3), "integer mean must stay exact")
        assert(a.getBoolean(5) === e.getBoolean(5), "drift flag must stay exact")
        val (au, eu) = (a.getLong(2).toDouble, e.getLong(2).toDouble)
        assert(math.abs(au - eu) <= math.max(3.0, 0.03 * eu),
          s"HLL++ user count drifted beyond 3%: $au vs $eu")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("scale-mode routes agree: multi-distinct aggregates stay exact under both") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    def twoDistinct(s: SparkSession) = s.read.parquet(s"$sf/documents.parquet")
      .groupBy("source")
      .agg(countDistinct("lang").as("langs"), countDistinct("doc_id").as("docs"))
      .orderBy("source")
    def oneDistinct(s: SparkSession) = s.read.parquet(s"$sf/documents.parquet")
      .agg(countDistinct("doc_id").as("docs"))
    val exact2 = twoDistinct(spark).collect().toSeq
    // route A: extraOptimizations — runs AFTER RewriteDistinctAggregates
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      assert(twoDistinct(spark).collect().toSeq === exact2,
        "route A: >1 distinct group must stay exact")
      assert(oneDistinct(spark).queryExecution.optimizedPlan
        .flatMap(_.expressions)
        .exists(_.exists(_.isInstanceOf[HyperLogLogPlusPlus])),
        "route A: single distinct group must still take the HLL++ swap")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
    // route B: ScaleModeExtensions (injectOptimizerRule — runs BEFORE
    // RewriteDistinctAggregates; without the >1-distinct-group guard
    // this route would swap what route A leaves exact)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.plans.ScaleModeExtensions)
      .getOrCreate()
    try {
      s2.conf.set("spark.graft.scaleMode", "true")
      assert(twoDistinct(s2).collect().toSeq === exact2,
        "route B: >1 distinct group must stay exact")
      assert(oneDistinct(s2).queryExecution.optimizedPlan
        .flatMap(_.expressions)
        .exists(_.exists(_.isInstanceOf[HyperLogLogPlusPlus])),
        "route B: single distinct group must still take the HLL++ swap")
      // the global-rank rewrite must behave identically under the
      // injected-rule route (it fires mid-optimization there)
      // def, not val: a Dataset caches its QueryExecution, so each
      // conf flip needs a freshly planned frame
      def rankedB = s2.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n_chars"), col("doc_id"))))
      assert(rankedB.queryExecution.optimizedPlan.toString.contains("__graft_pid"),
        "route B: global rank window must take the range-partitioned construction")
      s2.conf.set("spark.graft.scaleMode", "false")
      val exactRanks = rankedB.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
      s2.conf.set("spark.graft.scaleMode", "true")
      assert(rankedB.collect().map(r => (r.getLong(0), r.getInt(2))).toSet === exactRanks,
        "route B: distributed ranks must equal the global window's")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("scale-mode rewrites a global rank window to the range-partitioned construction") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    // row_number under a TOTAL order, rank under a tying order — both
    // shapes the rewrite must reproduce exactly
    def rowNumbered = docs.withColumn("rk",
      row_number().over(Window.orderBy(col("n_chars"), col("doc_id"))))
    def ranked = docs.withColumn("rk",
      rank().over(Window.orderBy(col("n_chars"))))
    val exactRn = rowNumbered.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val exactRk = ranked.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      for ((q, exact, label) <- Seq(
          (rowNumbered, exactRn, "row_number"), (ranked, exactRk, "rank"))) {
        val optimized = q.queryExecution.optimizedPlan
        val globalWindows = optimized.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        assert(globalWindows.isEmpty,
          s"$label: no unpartitioned window may survive scaleMode:\n$optimized")
        assert(optimized.toString.contains("__graft_pid"),
          s"$label: expected the range-partitioned construction:\n$optimized")
        val got = q.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
        assert(got === exact, s"$label: distributed ranks must be identical")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("scale-mode rewrites global percent_rank and cume_dist bit-identically") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // a tying order (n_chars repeats) exercises the peer semantics both
    // ratio functions lean on: percent_rank's (rank-1)/(N-1) and
    // cume_dist's peer-inclusive numerator
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def pctRanked = docs.withColumn("pr",
      percent_rank().over(Window.orderBy(col("n_chars"))))
    def cumeDisted = docs.withColumn("cd",
      cume_dist().over(Window.orderBy(col("n_chars"))))
    // native single-partition results first — the doubles must match
    // BIT-identically because the rewrite divides the same integers
    val exactPr = pctRanked.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val exactCd = cumeDisted.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      for ((q, exact, label) <- Seq(
          (pctRanked, exactPr, "percent_rank"), (cumeDisted, exactCd, "cume_dist"))) {
        val optimized = q.queryExecution.optimizedPlan
        val globalWindows = optimized.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        assert(globalWindows.isEmpty,
          s"$label: no unpartitioned window may survive scaleMode:\n$optimized")
        assert(optimized.toString.contains("__graft_pid"),
          s"$label: expected the range-partitioned construction:\n$optimized")
        assert(q.schema.fields(2).dataType ===
          org.apache.spark.sql.types.DoubleType, s"$label: result type")
        val got = q.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
        assert(got === exact, s"$label: distributed ratios must be bit-identical")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("scale-mode rewrites global ntile bit-identically across bucket remainders") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    // bucket counts chosen so n % b is 0, small, and large — the three
    // remainder regimes of the closed-form assignment (first n%b
    // buckets carry one extra row)
    for (b <- Seq(4, 7, 500)) {
      def tiled = docs.withColumn("nt",
        ntile(b).over(Window.orderBy(col("n_chars"), col("doc_id"))))
      val exact = tiled.collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
      try {
        spark.conf.set("spark.graft.scaleMode", "true")
        val optimized = tiled.queryExecution.optimizedPlan
        assert(optimized.toString.contains("__graft_pid"),
          s"ntile($b): expected the range-partitioned construction:\n$optimized")
        val got = tiled.collect().map(r => (r.getLong(0), r.getInt(2))).toMap
        assert(got === exact, s"ntile($b): distributed buckets must be identical")
      } finally {
        spark.experimental.extraOptimizations = Nil
        spark.conf.set("spark.graft.scaleMode", "false")
      }
    }
  }

  test("global-rank rewrite equals the native window on randomized tying data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // seeded trials over skewed duplicate keys (including negatives and
    // heavy ties): the tie-deterministic functions compare under a
    // TYING order, the row_number-based ones under a total order —
    // exact equality including every double bit
    val rnd = new scala.util.Random(20260814L)
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      for (trial <- 1 to 5) {
        val n = 200 + rnd.nextInt(1500)
        val card = 1 + rnd.nextInt(25)
        val data = (0 until n).map(i => (i.toLong, rnd.nextInt(2 * card) - card))
        val df = spark.createDataFrame(data).toDF("id", "k")
        val tying = Window.orderBy(col("k"))
        val total = Window.orderBy(col("k"), col("id"))
        val b = 1 + rnd.nextInt(n + 5)
        def q = df.select(col("id"),
          rank().over(tying).as("rk"),
          percent_rank().over(tying).as("pr"),
          cume_dist().over(tying).as("cd"),
          row_number().over(total).as("rn"),
          ntile(b).over(total).as("nt"))
        spark.conf.set("spark.graft.scaleMode", "false")
        val exact = q.collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getInt(5))).toMap
        spark.conf.set("spark.graft.scaleMode", "true")
        val plan = q.queryExecution.optimizedPlan
        assert(plan.toString.contains("__graft_pid"),
          s"trial $trial (n=$n, card=$card, b=$b): rewrite must fire:\n$plan")
        val got = q.collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getInt(5))).toMap
        assert(got === exact,
          s"trial $trial (n=$n, card=$card, b=$b): rewrite changed results")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("scale-mode leaves global rank windows alone when exchange reuse is off") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // boundary sampling is seeded per shuffle instance, so without
    // ReuseExchange the construction's two exchange copies could rank
    // against different boundaries — the rule must refuse to rewrite
    // (the native window is correct, merely single-partition)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def ranked = docs.withColumn("rk",
      row_number().over(Window.orderBy(col("n_chars"), col("doc_id"))))
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      spark.conf.set("spark.sql.exchange.reuse", "false")
      val optimized = ranked.queryExecution.optimizedPlan
      assert(!optimized.toString.contains("__graft_pid"),
        s"rewrite must not fire with exchange reuse disabled:\n$optimized")
      spark.conf.set("spark.sql.exchange.reuse", "true")
      assert(ranked.queryExecution.optimizedPlan.toString.contains("__graft_pid"),
        "rewrite must fire again once reuse is back on")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
      spark.conf.set("spark.sql.exchange.reuse", "true")
    }
  }

  test("scale-mode rewrite preserves the result type for non-double percentile children") {
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      // integer column: exact percentile is DoubleType, the approx twin
      // would be LongType without the cast guard — the rewritten plan
      // must keep the analyzed schema AND still execute
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr("percentile(l_orderkey, 0.5) as p50")
      assert(df.schema("p50").dataType === org.apache.spark.sql.types.DoubleType)
      val exprs = df.queryExecution.optimizedPlan.flatMap(_.expressions)
      assert(exprs.exists(_.exists(_.isInstanceOf[ApproximatePercentile])),
        "int-column percentile must still be rewritten under scaleMode")
      val optimizedTypes = df.queryExecution.optimizedPlan.output.map(_.dataType)
      assert(optimizedTypes === Seq(org.apache.spark.sql.types.DoubleType),
        s"rewrite changed the plan's result type: $optimizedTypes")
      val v = df.collect()(0).getDouble(0)
      assert(v > 0.0, "median orderkey must be positive")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }

  test("custom AsOfJoinExec plans, co-partitions, and matches the window twin row-for-row") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts_us").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("ts_us").as("v_ts"))
    val j = graft.plans.AsOfJoin.asof(clicks, views,
      Seq(clicks("c_user")), Seq(views("v_user")),
      clicks("c_ts"), views("v_ts"), Seq(views("v_id")))

    // the physical operator must actually plan, behind exactly the two
    // co-partitioning exchanges a sort-merge join would pay
    val got = j.orderBy("c_id").collect()
    val plans = collectPlans(j.queryExecution.executedPlan)
    assert(plans.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]),
      "the custom strategy must plan AsOfJoinExec")
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles <= 3, // 2 co-partitioning + the orderBy range shuffle
      s"as-of must cost at most the SMJ exchange bill, saw $shuffles shuffles")

    // row-for-row parity with the union+window (a)-route formulation,
    // including the (v_ts, v_id) boundary tiebreak
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_click"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val twin = ev.filter(col("event_type").isin("click", "view"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
      .withColumn("lv_id",
        last(when(col("is_click") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("lv_ts",
        last(when(col("is_click") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("is_click") === 1)
      .select(col("user_id"), col("event_id").as("c_id"), col("ts_us"),
        col("lv_id"), col("lv_ts"))
      .orderBy("c_id").collect()
    assert(got.length === twin.length)
    got.zip(twin).foreach { case (g, t) =>
      assert(g.getLong(1) === t.getLong(1), "click id")
      assert(Option(g.get(4)) === Option(t.get(3)),
        s"click ${g.getLong(1)}: matched view id must honor the tiebreak")
      assert(Option(g.get(5)) === Option(t.get(4)), "matched view ts")
    }
    // the outer side is real: clicks preceding any view survive as nulls
    assert(got.exists(_.isNullAt(4)), "unmatched clicks must null-extend")
    assert(got.exists(!_.isNullAt(4)), "matched clicks must carry their view")
  }

  test("AsOfJoinExec edges: empty right, missing keys, boundary ties, equal-time runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def asof(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      graft.plans.AsOfJoin.asof(l, r,
        Seq(l("k")), Seq(r("rk")), l("t"), r("rt"), Seq(r("rid")))

    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")

    // empty right: every left row survives null-extended
    val emptyR = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
    val e = asof(left, emptyR).orderBy("lid").collect()
    assert(e.length === 4 && e.forall(_.isNullAt(3)),
      "an empty right side must left-outer every row")

    // key present only on the right never leaks; key missing on the
    // right null-extends; boundary rt == t MATCHES (≤ bound); among
    // equal (rk, rt) the largest rid wins (the tiebreak)
    val right = Seq(
      (1L, 10L, 7L), (1L, 10L, 9L),       // tie at the k=1 t=10 boundary
      (1L, 15L, 11L),                      // between the two k=1 clicks
      (9L, 1L, 99L))                       // right-only key
      .toDF("rk", "rt", "rid")
    val got = asof(left, right).orderBy("lid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(
      100L -> 9L,   // boundary tie → rightmost rid
      101L -> 11L,  // latest rt ≤ 20
      102L -> -1L,  // k=2 absent on the right
      103L -> -1L), // k=3 absent on the right
      s"got $got")

    // a long equal-key run on the right costs one pass, not a buffer:
    // 10k right rows for one key, every left row picks the exact cut
    val runR = spark.range(10000)
      .select(lit(1L).as("rk"), col("id").as("rt"), col("id").as("rid"))
    val runL = Seq((1L, 0L, 0L), (1L, 4999L, 1L), (1L, 99999L, 2L)).toDF("k", "t", "lid")
    val run = asof(runL, runR).orderBy("lid").select("rid").collect().map(_.getLong(0))
    assert(run.toSeq === Seq(0L, 4999L, 9999L))
  }

  test("AsOfJoinExec under AQE with skewed keys: co-partitioning survives runtime re-plan") {
    // Custom ClusteredDistribution nodes are where AQE surprises live:
    // coalescing/splitting the two co-partitioning exchanges DIFFERENTLY
    // would silently mis-join. Drive AQE hard (tiny advisory size over a
    // skewed key whose slice dwarfs every other) and assert exact parity
    // with a definitional per-row max-filter computed without the exec.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "this spec must run with AQE on")
      // skew: key 0 carries 50k right rows + 2k left rows; keys 1-40
      // carry ~50 each. Deterministic (id-derived) so the oracle below
      // is exact.
      val right = spark.range(52000).select(
        when(col("id") < 50000, 0L).otherwise((col("id") - 50000) % 40 + 1).as("rk"),
        (col("id") * 7 % 100000).as("rt"),
        col("id").as("rid"))
      val left = spark.range(4000).select(
        when(col("id") < 2000, 0L).otherwise(col("id") % 40 + 1).as("k"),
        (col("id") * 13 % 100000).as("t"),
        col("id").as("lid"))
      val j = graft.plans.AsOfJoin.asof(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"), Seq(right("rid")))
      val got = j.select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // the adaptive FINAL plan must still run the custom exec
      val finalPlan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      assert(collectPlans(finalPlan).exists(_.isInstanceOf[graft.plans.AsOfJoinExec]),
        s"adaptive final plan lost AsOfJoinExec:\n$finalPlan")
      // definitional oracle: argmax over (rt, rid) among rt <= t, per left row
      val oracle = left.join(right, left("k") === right("rk") &&
          right("rt") <= left("t"), "left_outer")
        .groupBy("lid")
        .agg(max(struct(col("rt"), col("rid"))).as("m"))
        .select(col("lid"), coalesce(col("m.rid"), lit(-1L)).as("rid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === oracle.size)
      val diffs = oracle.collect { case (k, v) if got.get(k) != Some(v) =>
        s"lid=$k oracle=$v got=${got.get(k)}" }
      assert(diffs.isEmpty, s"AQE parity broke on ${diffs.size} rows: ${diffs.take(5)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AsOfJoinExec codegen path equals the interpreted path on every direction") {
    import org.apache.spark.sql.functions._
    // deterministic frames with boundary ties, equal-time runs, null
    // keys (null==null must MATCH, like RowOrdering), and a right-only
    // key — the shapes where a generated merge could drift
    val l = spark.range(200).select(
      when(col("id") % 17 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 7).as("k"),
      (col("id") * 31 % 500).as("t"),
      col("id").as("lid"))
    val r = spark.range(300).select(
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 9).as("rk"),
      (col("id") * 11 % 500).as("rt"),
      col("id").as("rid"))
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(-1L, 40L)) {
      def build() = graft.plans.AsOfJoin.asof(l, r,
          Seq(l("k")), Seq(r("rk")), l("t"), r("rt"), Seq(r("rid")),
          direction = dir, toleranceMicros = tol)
        .select("lid", "rid")
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df.collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .sortBy(_._1).toSeq
      def run(): Seq[(Long, Long)] = rows(build())
      // codegen ON: the exec must sit INSIDE a WholeStageCodegen span
      // (inspect the FINAL adaptive plan, i.e. after materialization)
      assert(spark.conf.get("spark.sql.codegen.wholeStage") == "true")
      val j = build()
      val gen = rows(j)
      val planStr = (j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      // the `*(n)` star is the WholeStageCodegen marker in AQE's
      // final-plan rendering
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(planStr).isDefined,
        s"exec must codegen ($dir):\n$planStr")
      val interpreted = try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        run()
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(gen.toSeq === interpreted.toSeq,
        s"codegen/interpreted drift at dir=$dir tol=$tol")
    }
  }

  test("AsOfJoinExec SQL metrics report true row/match counts on both paths") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 9L, 7L), (1L, 15L, 11L), (9L, 1L, 99L)).toDF("rk", "rt", "rid")
    for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val j = graft.plans.AsOfJoin.asof(l, r,
          Seq(l("k")), Seq(r("rk")), l("t"), r("rt"), Seq(r("rid")))
        j.collect()
        val exec = collectPlans(j.queryExecution.executedPlan)
          .collectFirst { case e: graft.plans.AsOfJoinExec => e }
        assert(exec.isDefined, "exec must plan")
        assert(exec.get.metrics("numOutputRows").value === 4L,
          s"4 left rows out (wholeStage=$wholeStage)")
        assert(exec.get.metrics("numMatched").value === 2L,
          s"lids 100,101 match; 102,103 null-extend (wholeStage=$wholeStage)")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("asof() adapts TimestampType inputs via unix_micros and rejects other types") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = Seq((1L, 1000000L, 10L), (1L, 3000000L, 11L)).toDF("k", "us", "lid")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Seq((1L, 2000000L, 20L)).toDF("rk", "rus", "rid")
      .withColumn("rts", timestamp_micros(col("rus")))
    // TimestampType path must equal the explicit-micros path row-for-row
    val viaTs = graft.plans.AsOfJoin.asof(l, r,
        Seq(l("k")), Seq(r("rk")), l("ts"), r("rts"), Seq(r("rid")))
      .orderBy("lid").select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq
    val viaUs = graft.plans.AsOfJoin.asof(l, r,
        Seq(l("k")), Seq(r("rk")), l("us"), r("rus"), Seq(r("rid")))
      .orderBy("lid").select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq
    assert(viaTs === Seq(10L -> -1L, 11L -> 20L))
    assert(viaTs === viaUs)
    // a non-time type fails at the API edge with the discipline named,
    // not with the exec's bare require
    val err = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.asof(l, r,
        Seq(l("k")), Seq(r("rk")), l("ts").cast("string"), r("rts"), Seq(r("rid")))
    }
    assert(err.getMessage.contains("unix micros"),
      s"error must name the time discipline, got: ${err.getMessage}")
  }
}
