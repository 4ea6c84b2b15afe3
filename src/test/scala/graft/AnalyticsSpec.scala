package graft

import graft.operators.Analytics
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q1 pricing summary: 6 flag/status groups with TPC-H Q1 columns") {
    val rows = Analytics.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    val cols = Analytics.q1PricingSummary(spark, sf).columns.toSeq
    assert(cols === Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order"))
    // groups sorted; counts positive
    assert(rows.map(_.getLong(9)).forall(_ > 0))
  }

  test("w10 pattern funnel: join-free plan, bounds hold, subset of unbounded matches") {
    import org.apache.spark.sql.functions._
    val df = Analytics.w10PatternFunnel(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      "sequence detection must be window passes, not self-joins")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: matched > purchases")
      // each matched funnel spans at most 2h end to end
      assert(r.getLong(3) <= r.getLong(2) * 2L * 3600L * 1000000L,
        s"${r.getString(0)}: span sum exceeds the per-hop bounds")
    }
    // time-bounded matches can never exceed the unbounded count of
    // purchases with ANY prior view+signup chain
    val totalMatched = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val anyChain = ev.filter(col("event_type") === "purchase").join(
      ev.filter(col("event_type") === "signup").groupBy("user_id")
        .agg(min(expr("unix_micros(ts)")).as("first_signup")), "user_id")
      .filter(expr("unix_micros(ts)") > col("first_signup")).count()
    assert(totalMatched <= anyChain)
  }

  test("a14 exact quantiles are monotone, are real data values, and bracket the median") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.a14ExactQuantiles(spark, sf).collect()
    assert(rows.length === 5)
    val values = Tables.events(spark, sf)
      .select(col("event_type"), expr("cast(round(value * 1000000) as bigint)").as("v"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val (t, n, p25, p50, p75) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p25 <= p50 && p50 <= p75, s"$t: quantiles must be monotone")
      val vs = values(t)
      assert(n === vs.length)
      // discrete quantiles select actual elements at rank ceil(q*n)
      assert(p25 === vs(math.ceil(n * 0.25).toInt - 1))
      assert(p50 === vs(math.ceil(n * 0.5).toInt - 1))
      assert(p75 === vs(math.ceil(n * 0.75).toInt - 1))
    }
  }

  test("p3 recode maps all three statuses to labels") {
    val rows = Analytics.p3Recode(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("Fulfilled", "Open", "Pending"))
  }

  test("a1 pivot produces one column per status value") {
    val df = Analytics.a1PivotMean(spark, sf)
    assert(df.columns.toSeq === Seq("o_orderpriority", "F", "O", "P"))
    assert(df.count() === 5)
  }

  test("j2 dim join covers all 25 nations with consistent totals") {
    val rows = Analytics.j2DimJoin(spark, sf).collect()
    assert(rows.length === 25)
    val totalOrders = rows.map(_.getLong(2)).sum
    assert(totalOrders === Tables.orders(spark, sf).count())
  }

  test("r1 melt yields exactly the four measures, each with full row count") {
    val li = Tables.lineitem(spark, sf).count()
    val rows = Analytics.r1Melt(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    assert(rows.map(_.getLong(2)).forall(_ === li))
  }

  test("o1 topk is sorted descending with deterministic tiebreak") {
    val rows = Analytics.o1TopK(spark, sf).collect()
    assert(rows.length === 100)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("w1 rank topn emits exactly 3 per priority") {
    val rows = Analytics.w1RankTopN(spark, sf).collect()
    assert(rows.length === 15)
    assert(rows.groupBy(_.getString(0)).forall(_._2.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3)))
  }

  test("q3/q5 broadcast-hint only dimension sides, never the orders fact table") {
    for (df <- Seq(Analytics.q3ShippingPriority(spark, sf), Analytics.q5LocalSupplier(spark, sf))) {
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h.child.toString
      }
      assert(hinted.nonEmpty)
      assert(!hinted.exists(_.contains("orders")),
        "orders is a fact table: its join strategy must be left to AQE")
    }
  }

  test("u3 intersect/except is one lazy plan: construction launches no action jobs") {
    val sites = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        js.stageInfos.foreach(si => sites.add(si.name)); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Analytics.u3IntersectExcept(spark, sf)
      df.queryExecution.optimizedPlan // force analysis + optimization, still no jobs
      Thread.sleep(500) // listener bus is async
      // the only permissible job is spark.read's one-off parquet schema
      // inference ("parquet at ..."); an eager count()/collect() inside
      // the constructor (the round-1 defect) would surface here
      val actions = sites.toArray.map(_.toString).filterNot(_.startsWith("parquet at"))
      assert(actions.isEmpty, s"constructing u3 launched action jobs: ${actions.mkString(", ")}")
      assert(df.columns.toSeq === Seq("clicked_and_purchased", "clicked_never_purchased"))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("w4 range join plans as a bucket equi-join, never a nested loop") {
    val df = Analytics.w4RangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "interval containment must go through the bucket equi-join")
    // equals the naive non-equi join at test scale
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val iv = ev.filter(pmod(col("user_id"), lit(20)) === 0)
      .groupBy(col("user_id").as("owner"))
      .agg(min("ts_us").as("start_us"))
      .withColumn("end_us", col("start_us") + lit(2L * 3600 * 1000000L))
    val naive = iv.join(ev, col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .groupBy("owner").agg(count(lit(1)).as("n_events"))
      .orderBy("owner").collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq === naive)
  }

  test("s2 column subset plan prunes the parquet read schema to 3 columns") {
    val plan = Analytics.s2ColumnSubset(spark, sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("a9 grouping sets includes the priority-only slice rollup lacks") {
    val rows = Analytics.a9GroupingSets(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === Tables.orders(spark, sf).count())
    // the (priority) slice: status=ALL with a concrete priority — the
    // set a rollup of (status, priority) never emits
    val prioritySlice = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) != "ALL")
    assert(prioritySlice.nonEmpty)
    assert(prioritySlice.map(_.getLong(2)).sum === grand.head.getLong(2))
  }

  test("w5 running total ends at each key's exact total") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.w5RunningTotal(spark, sf).collect()
    assert(rows.nonEmpty)
    // the window accumulates in (o_orderdate, o_orderkey) order, so per
    // key the LARGEST cumulative value must equal the key's full sum of
    // integer cents, recomputed independently
    val totals = Tables.orders(spark, sf).filter(col("o_custkey") < 50)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (k, rs) =>
      assert(rs.map(_.getLong(2)).max === totals(k),
        s"custkey $k: final cumulative cents must equal the key total")
      // prices are positive, so all prefix sums are distinct
      assert(rs.map(_.getLong(2)).distinct.length === rs.length)
    }
  }

  test("j4 dpp join prunes fact partitions via a dynamic pruning subquery") {
    val df = Analytics.j4DppJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      "the partitioned fact scan must carry a DynamicPruningSubquery from the dim filter")
    val rows = df.collect()
    // pruned result equals the statically-filtered equivalent
    val expected = Tables.orders(spark, sf).filter("o_orderstatus = 'F'")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === expected(r.getString(0))))
  }

  test("j5/j6 anti and semi joins partition customers at a common threshold") {
    import org.apache.spark.sql.functions._
    val total = Tables.customer(spark, sf).count()
    val anti = Analytics.j5AntiJoin(spark, sf).collect().map(_.getLong(1)).sum
    assert(anti > 0, "testdata must contain customers without a 300k order")
    // complement at the same threshold: anti + semi must cover every customer
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 300000)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi === total)
    val j6 = Analytics.j6SemiJoin(spark, sf).collect().map(_.getLong(1)).sum
    assert(j6 > 0 && j6 <= total)
  }

  test("w6 ntile balances quartiles within every priority") {
    val rows = Analytics.w6Ntile(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.orders(spark, sf).count())
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 4), "4 quartiles per priority")
      val counts = rs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, "ntile must balance within 1 row")
      // quartile price ranges must not overlap out of order
      val byQ = rs.sortBy(_.getInt(1))
      byQ.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3) + 0,
          "quartile max must not exceed next quartile min") // ties share cents
        case _ =>
      }
    }
  }

  test("q4/q21/q22 plan EXISTS/NOT-EXISTS as semi/anti joins, never a re-scan per row") {
    val semiPlans = Analytics.q4PriorityExists(spark, sf).queryExecution.executedPlan.toString
    assert(semiPlans.contains("LeftSemi"), "q4 EXISTS must plan as a left-semi join")
    val q21 = Analytics.q21WaitingSupplier(spark, sf).queryExecution.executedPlan.toString
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      "q21 needs both the EXISTS semi join and the NOT-EXISTS anti join")
    val q22 = Analytics.q22IdleCustomers(spark, sf).queryExecution.executedPlan.toString
    assert(q22.contains("LeftAnti"), "q22 NOT EXISTS must plan as a left-anti join")
  }

  test("q12 conditional counters partition the joined slice exactly") {
    val rows = Analytics.q12PriorityCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    val o = Tables.orders(spark, sf)
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(total === joined, "high+low must account for every joined line exactly once")
  }

  test("q14 promo share is a valid percentage of one-pass sums") {
    val r = Analytics.q14PromoRevenue(spark, sf).collect().head
    assert(r.getDouble(0) >= 0 && r.getDouble(0) <= r.getDouble(1))
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 100.0)
  }

  test("q15 winners all carry the maximum rounded revenue") {
    val rows = Analytics.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1, "every winner ties at the max revenue")
  }

  test("q17 decorrelates the per-part average: no more than the two expected shuffles of lineitem") {
    val df = Analytics.q17SmallQuantity(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the scalar subquery must decorrelate to an equi-join, not a nested loop")
    val r = df.collect().head
    assert(r.getLong(1) > 0, "brand slice must keep some small-quantity lines")
  }

  test("q7 bilateral volume keeps only the named pair in both directions") {
    val rows = Analytics.q7NationVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val pair = (r.getString(0), r.getString(1))
      pair == ("NATION_11", "NATION_12") || pair == ("NATION_12", "NATION_11")
    })
  }

  test("q8 market share is a valid fraction of the region's volume") {
    val rows = Analytics.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0 && r.getDouble(1) <= r.getDouble(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q9 profit sums exactly in integer micro-units") {
    val rows = Analytics.q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sum ===
      Tables.lineitem(spark, sf).join(
        Tables.part(spark, sf).filter(org.apache.spark.sql.functions.col("p_name").like("%widget%")),
        org.apache.spark.sql.functions.col("l_partkey") === org.apache.spark.sql.functions.col("p_partkey")).count(),
      "every widget line is attributed to exactly one (nation, year) group")
  }

  test("event funnel narrows monotonically with positive conversion lags") {
    val r = Analytics.e2EventFunnel(spark, sf).collect().head
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2),
      "each funnel stage can only lose users")
    assert(r.getLong(2) > 0, "testdata has full-funnel users")
    assert(r.getLong(3) > 0 && r.getLong(4) > 0, "ordered stages imply positive lags")
  }

  test("a10 histogram buckets partition all orders with consistent edges") {
    val rows = Analytics.a10Histogram(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(2) >= r.getLong(0) * 50000.0 && r.getDouble(3) < (r.getLong(0) + 1) * 50000.0,
        s"bucket ${r.getLong(0)}: min/max must fall inside the bucket edges")
    }
  }

  test("w7 gapfill densifies every key's span and carries values forward") {
    val rows = Analytics.w7GapFill(spark, sf).collect()
    assert(rows.nonEmpty)
    val gaps = rows.count(_.getLong(2) == 0L)
    assert(gaps > 0, "testdata has hour gaps, so filled rows must exist")
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val hbs = rs.map(_.getLong(1)).sorted
      assert(hbs.last - hbs.head + 1 === hbs.length, "spine must be contiguous")
      // the span starts at an observed bucket, so the fill is total
      assert(rs.forall(!_.isNullAt(3)), "forward fill must cover every bucket")
    }
  }

  test("a12 HLL sketches: merged rollup equals direct sketch, estimates near exact") {
    val est = Analytics.a12HllUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Analytics.a12CardExact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    // union of daily sketches must be register-identical to sketching
    // the whole corpus — the mergeability contract
    assert(est("all_merged") === est("all_direct"),
      s"merge must equal direct: ${est("all_merged")} vs ${est("all_direct")}")
    // lgK=14 → relative standard error ~0.8%; allow 4σ plus integer slack
    est.foreach { case (scope, e) =>
      val x = exact(scope)
      assert(math.abs(e - x) <= math.max(2.0, 0.04 * x),
        s"$scope: estimate $e too far from exact $x")
    }
  }

  test("runtime bloom join filter is injected when enabled and invisible to results") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val spark = TestSpark.spark
    val withBloom = graft.operators.Analytics.j7RuntimeBloom(spark, TestSpark.sf).collect()
    assert(withBloom.forall(_.getBoolean(3)),
      "InjectRuntimeFilter must fire under the scoped confs")
    // the same join with the rule hard-disabled: data columns identical —
    // a runtime filter may only prune, never alter
    val key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val saved = spark.conf.get(key)
    val plain =
      try {
        spark.conf.set(key, "false")
        graft.Tables.lineitem(spark, TestSpark.sf)
          .join(
            graft.Tables.orders(spark, TestSpark.sf)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
          .orderBy("l_returnflag").collect()
      } finally spark.conf.set(key, saved)
    assert(withBloom.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
