package graft

import graft.operators.Curation
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Behavior + plan-shape assertions for the corpus-curation operators.
  * Correctness vs DuckDB is the driver gate's job; these specs pin the
  * properties the oracle can't see: selection bounds, packing
  * invariants, merge classification totals, and shuffle counts.
  */
class CurationSpecCompaction extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction collapses the small-file layout without losing a row") {
    import org.apache.hadoop.fs.Path
    val (small, compacted) = graft.operators.Curation.compactionDirs(spark, TestSpark.sf)
    def parts(dir: String): Int = {
      val p = new Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    assert(parts(small) === 16, "staged ingest shape must be 16 shard files")
    assert(parts(compacted) <= 2, "compaction must collapse to the target file count")
    assert(spark.read.parquet(compacted).count() ===
      spark.read.parquet(small).count(), "compaction must preserve every row")
  }
}

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: collectPlans(q.plan)
    case other => other +: other.children.flatMap(collectPlans)
  }

  test("stratified sample rates follow the per-source ladder") {
    val rows = Curation.stratifiedSample(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val idx = r.getString(0).drop(3).toInt
      val total = r.getLong(1)
      val sampled = r.getLong(2)
      val rate = (idx + 1) * 0.05
      assert(sampled <= total)
      // binomial tolerance at tiny strata: ±4·sqrt(n·p·(1-p)) + 1
      val tol = 4 * math.sqrt(total * rate * (1 - rate)) + 1
      assert(math.abs(sampled - total * rate) <= tol,
        s"src$idx: sampled $sampled of $total at nominal rate $rate")
    }
  }

  test("stratified sample is a single-agg plan: no join, one shuffle") {
    val plan = Curation.stratifiedSample(spark, sf).queryExecution.executedPlan
    val nodes = collectPlans(plan)
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")),
      "hash-gated sampling must not join")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 2, s"expected group-by (+order-by) shuffles only, got $shuffles")
  }

  test("weighted PPS sample: HT estimates recover the corpus totals") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val (nTrue, charsTrue) = {
      val r = docs.agg(count(lit(1)), sum("n_chars")).head()
      (r.getLong(0), r.getLong(1))
    }
    val agg = Curation.weightedSample(spark, sf)
      .agg(sum("n_sampled"), sum("chars_sampled"), sum("ht_docs"), sum("ht_chars")).head()
    val (nSampled, htDocs, htChars) = (agg.getLong(0), agg.getLong(2), agg.getLong(3))
    assert(nSampled > 0 && nSampled < nTrue, "PPS must sample a strict subset")
    // Horvitz–Thompson: Σ 1/p over the sample estimates the population.
    // Tolerance 4·sqrt over the ~Poisson sample size, plus floor bias.
    assert(math.abs(htDocs - nTrue) <= 4 * nTrue / math.sqrt(nSampled.toDouble) + nSampled,
      s"HT doc estimate $htDocs vs true $nTrue")
    assert(math.abs(htChars - charsTrue).toDouble / charsTrue < 0.35,
      s"HT char estimate $htChars vs true $charsTrue")
    // p ∝ n_chars: sampled docs must be longer than the corpus average
    val avgSampled = agg.getLong(1).toDouble / nSampled
    val avgTrue = charsTrue.toDouble / nTrue
    assert(avgSampled > avgTrue, s"length-weighted sample mean $avgSampled ≤ corpus mean $avgTrue")
  }

  test("weighted PPS sample is a single-agg plan: no join, scan-side predicate") {
    val plan = Curation.weightedSample(spark, sf).queryExecution.executedPlan
    val nodes = collectPlans(plan)
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")),
      "hash-gated PPS sampling must not join")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 2, s"expected group-by (+order-by) shuffles only, got $shuffles")
  }

  test("k-anonymity: generalizing monotonically shrinks re-identification risk") {
    val rows = Curation.kAnonymity(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l1_nation_segment", "l2_region_segment", "l3_segment"))
    val risk = rows.map(_.getLong(3))
    val minG = rows.map(_.getLong(4))
    assert(risk(0) >= risk(1) && risk(1) >= risk(2),
      s"rows_at_risk must fall along the ladder: ${risk.toSeq}")
    assert(minG(0) <= minG(1) && minG(1) <= minG(2),
      s"min group size must grow along the ladder: ${minG.toSeq}")
    assert(risk(2) === 0L, "fully generalized level must be k-anonymous here")
  }

  test("k-anonymity: only the dim lookup joins, and it broadcasts") {
    val plan = Curation.kAnonymity(spark, sf).queryExecution.executedPlan
    val joins = collectPlans(plan).filter(_.nodeName.toLowerCase.contains("join"))
    assert(joins.nonEmpty && joins.forall(_.nodeName.contains("BroadcastHashJoin")),
      s"nation lookup must broadcast, got ${joins.map(_.nodeName)}")
  }

  test("l-diversity: generalizing monotonically grows sensitive diversity") {
    val rows = Curation.lDiversity(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l1_nation_segment", "l2_region_segment", "l3_segment"))
    val nGroups = rows.map(_.getLong(1))
    val risk = rows.map(_.getLong(3))
    val minDiv = rows.map(_.getLong(4))
    // a coarse group's diversity bounds every fine subgroup's from
    // above, so risk shrinks and the min diversity grows as QI merge
    assert(risk(0) >= risk(1) && risk(1) >= risk(2),
      s"rows_at_risk must fall along the ladder: ${risk.toSeq}")
    assert(minDiv(0) <= minDiv(1) && minDiv(1) <= minDiv(2),
      s"min diversity must grow along the ladder: ${minDiv.toSeq}")
    assert(nGroups(0) >= nGroups(1) && nGroups(1) >= nGroups(2))
    assert(nGroups(2) === 5L, "5 market segments at the fully generalized level")
    // bands span at most (999999 + 100000) div 100000 − 0 + 1 = 12 values
    assert(minDiv.forall(d => d >= 1 && d <= 12))
  }

  test("l-diversity: ladder internal consistency against a re-derivation") {
    // independent re-derivation of the finest level straight off the
    // table: distinct bands per (nation, segment) group
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.customer(spark, sf)
      .withColumn("band",
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"))
    val fine = cust.groupBy("c_nationkey", "c_mktsegment")
      .agg(countDistinct("band").as("div"), count(lit(1)).as("rows"))
      .collect()
    val l1 = Curation.lDiversity(spark, sf).collect()
      .find(_.getString(0) == "l1_nation_segment").get
    assert(l1.getLong(1) === fine.length.toLong)
    assert(l1.getLong(2) === fine.count(_.getAs[Long]("div") < 3L).toLong)
    assert(l1.getLong(3) ===
      fine.filter(_.getAs[Long]("div") < 3L).map(_.getAs[Long]("rows")).sum)
    assert(l1.getLong(4) === fine.map(_.getAs[Long]("div")).min)
  }

  test("eval edit distance: universe coverage, metric bounds, DP re-derivation") {
    val rows = Curation.evalEdit(spark, sf).collect()
    val evalIds = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.expr("doc_id % 97 = 0"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === evalIds,
      "every eval doc gets exactly one row")
    rows.foreach { r =>
      val (edits, le, lc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(edits >= math.abs(le - lc) && edits <= math.max(le, lc),
        s"Levenshtein bounds violated for eval ${r.getLong(0)}")
      if (r.getLong(1) === -1L) {
        assert(lc === 0L && edits === le,
          "unmatched docs distance the empty string")
        if (le > 0) assert(r.getLong(5) === 1000000L)
      }
    }
    // independent classic-DP re-derivation for every matched pair
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i.toLong
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val txt = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr("lower(trim(text))").as("tx"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_.getLong(1) >= 0L).foreach { r =>
      assert(r.getLong(2) === lev(txt(r.getLong(0)), txt(r.getLong(1))),
        s"edit distance mismatch for pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("t-closeness: EMD bounds and convexity along the QI ladder") {
    val rows = Curation.tCloseness(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l1_nation_segment", "l2_region_segment", "l3_segment"))
    val nGroups = rows.map(_.getLong(1))
    val maxEmd = rows.map(_.getLong(3))
    val meanEmd = rows.map(_.getLong(4))
    assert(nGroups(0) >= nGroups(1) && nGroups(1) >= nGroups(2))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "mean EMD cannot exceed max EMD")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L,
        "normalized EMD lives in [0, 1] ppm")
    }
    // EMD(·, q) is jointly convex, and every coarse group is a mixture
    // of its fine subgroups, so the worst-group distance can only fall
    // along the ladder (±m·(m+1) ppm integer-truncation slack)
    val slack = 200L
    assert(maxEmd(1) <= maxEmd(0) + slack,
      s"region-level max EMD must not exceed nation-level: ${maxEmd.toSeq}")
    assert(maxEmd(2) <= maxEmd(1) + slack,
      s"segment-level max EMD must not exceed region-level: ${maxEmd.toSeq}")
    assert(meanEmd.forall(_ >= 0L))
  }

  test("t-closeness: fully-generalized level re-derives in plain Scala") {
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.customer(spark, sf)
      .withColumn("band",
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"))
      .select("c_mktsegment", "band")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = cust.length.toLong
    val bands = cust.map(_._2).distinct.sorted
    val mMinus1 = math.max(bands.length - 1L, 1L)
    val qPpm = bands.map { b =>
      b -> cust.count(_._2 == b).toLong * 1000000L / total
    }.toMap
    val emds = cust.groupBy(_._1).map { case (_, rows) =>
      val ng = rows.length.toLong
      var cum = 0L
      var sabs = 0L
      bands.foreach { b =>
        val cnt = rows.count(_._2 == b).toLong
        cum += cnt * 1000000L / ng - qPpm(b)
        sabs += math.abs(cum)
      }
      sabs / mMinus1
    }.toSeq
    val l3 = Curation.tCloseness(spark, sf).collect()
      .find(_.getString(0) == "l3_segment").get
    assert(l3.getLong(1) === emds.length.toLong)
    assert(l3.getLong(2) === emds.count(_ > 200000L).toLong)
    assert(l3.getLong(3) === emds.max)
    assert(l3.getLong(4) === emds.sum / emds.length)
  }

  test("unimax: waterfill conservation, caps, and the flat share") {
    val rows = Curation.mixUnimax(spark, sf).collect()
    assert(rows.length === 20, "one row per source")
    val budget = rows.map(_.getLong(1)).sum // B = one corpus epoch
    val alloc = rows.map(_.getLong(3))
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "allocation can never exceed the cap")
      assert(r.getLong(2) === r.getLong(1) * 2L, "cap = 2 epochs of the source")
      if (r.getLong(4) === 1L)
        assert(r.getLong(3) === r.getLong(2), "capped sources take the full cap")
      assert(r.getLong(5) <= 2000000L, "nobody exceeds the epoch cap in ppm")
      if (r.getLong(4) === 1L)
        assert(r.getLong(5) === 2000000L, "capped = exactly 2 epochs")
    }
    val uncapped = rows.filter(_.getLong(4) === 0L)
    assert(uncapped.nonEmpty, "cap = 2·size with B = Σsize must bind somewhere")
    assert(uncapped.map(_.getLong(3)).distinct.length === 1,
      "every uncapped source gets the same flat share")
    val share = uncapped.head.getLong(3)
    val cappedMax = rows.filter(_.getLong(4) === 1L).map(_.getLong(2))
    if (cappedMax.nonEmpty)
      assert(share >= cappedMax.max,
        "the water level clears every consumed cap")
    assert(alloc.sum <= budget, "allocations never exceed the budget")
    assert(budget - alloc.sum < uncapped.length.toLong,
      "only the flat-share div remainder goes unallocated")
  }

  test("unimax: closed form matches an independent sequential waterfill") {
    val rows = Curation.mixUnimax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    val budget = rows.map(_._2).sum
    // the paper's sequential algorithm, caps ascending: each source in
    // turn takes min(cap, remaining div sources_left) — with the flat
    // share frozen at the first crossing, as the closed form computes
    val byCap = rows.map { case (s, n, _) => (s, n, n * 2L) }
      .sortBy { case (s, _, cap) => (cap, s) }
    var remaining = budget
    var k = byCap.length.toLong
    var frozenShare = -1L
    val expected = byCap.map { case (s, _, cap) =>
      val a =
        if (frozenShare >= 0L) frozenShare
        else if (cap * k <= remaining) cap
        else { frozenShare = remaining / k; frozenShare }
      remaining -= a; k -= 1
      s -> a
    }.toMap
    rows.foreach { case (s, _, a) =>
      assert(a === expected(s), s"allocation mismatch for $s")
    }
  }

  test("dq expectations: clean corpus passes all ten checks") {
    val rows = Curation.dqExpectations(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getBoolean(4)),
      s"clean testdata must pass: ${rows.filterNot(_.getBoolean(4)).mkString(";")}")
    assert(rows.forall(_.getLong(3) === 0L))
  }

  test("dq expectations: injected violations are detected, clean checks stay green") {
    import org.apache.spark.sql.functions._
    val dir = s"${graft.WorkDirs.rootActive}/dq_corrupt"
    // clone the sf layout, corrupting only orders: one duplicated key,
    // one negative price, one null date, one dangling custkey
    Seq("customer", "lineitem", "documents", "events").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val corrupt = o.limit(1).select(
      lit(o.select("o_orderkey").head().getLong(0)).as("o_orderkey"),
      lit(-7L).as("o_custkey"),
      col("o_orderstatus"),
      lit(-1.0).as("o_totalprice"),
      lit(null).cast("timestamp").as("o_orderdate"),
      col("o_orderpriority"))
    o.unionByName(corrupt).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val byCheck = Curation.dqExpectations(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(byCheck("unique_o_orderkey") === 1L)
    assert(byCheck("positive_o_totalprice") === 1L)
    assert(byCheck("not_null_o_orderdate") === 1L)
    assert(byCheck("fk_o_custkey") === 1L)
    assert(byCheck("fk_l_orderkey") === 0L)
    assert(byCheck("range_l_quantity_1_50") === 0L)
    assert(byCheck("consistent_n_chars") === 0L)
  }

  test("dynamic partition overwrite touches only the backfilled day and is idempotent") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val (table, revisedDay) = Curation.backfillDirs(spark, sf)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(): Map[String, Seq[(String, Long)]] =
      fs.listStatus(new Path(table)).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(f => (f.getPath.getName, f.getModificationTime)).toSeq.sorted
      }.toMap
    val before = partFiles()
    assert(before.size > 1, "events must span multiple day partitions")
    Curation.backfillDay(spark, sf, table, revisedDay)
    val after = partFiles()
    val revKey = s"day=$revisedDay"
    assert(after.keySet === before.keySet, "no partition may appear or vanish")
    before.foreach { case (k, files) =>
      if (k != revKey)
        assert(after(k) === files, s"untouched partition $k must keep its files")
    }
    assert(after(revKey) !== before(revKey), "backfilled partition must be rewritten")
    // idempotent content: revised day still carries exactly doubled values
    val base = Tables.events(spark, sf)
      .filter(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd") === revisedDay)
      .agg(round(sum(col("value") * 2), 2)).head().getDouble(0)
    val now = spark.read.parquet(table)
      .filter(col("day").cast("string") === revisedDay)
      .agg(round(sum("value"), 2)).head().getDouble(0)
    assert(now === base, s"re-backfill must leave doubled values: $now vs $base")
  }

  test("source mixing respects every quota") {
    val rows = Curation.mixSources(spark, sf).collect()
    rows.foreach { r =>
      val selected = r.getLong(1)
      val quota = r.getLong(3)
      assert(selected <= quota, s"${r.getString(0)}: $selected > quota $quota")
      assert(quota > 0)
    }
    // at sf0.001 every stratum is smaller than its quota, so the mix
    // keeps all docs of every positive-quota source
    assert(rows.map(_.getLong(1)).sum <= 500)
  }

  test("sequence packing: pack token sums reconcile and bound overflow") {
    val packs = Curation.packSequences(spark, sf).collect()
    val totalTokens = packs.map(_.getLong(3)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    import org.apache.spark.sql.functions._
    val expected = docs.select(
      sum(size(split(trim(col("text")), "\\s+")).cast("bigint"))).collect()(0).getLong(0)
    assert(totalTokens === expected, "every token lands in exactly one pack")
    assert(packs.forall(_.getLong(2) >= 1))
    // a doc is assigned to the pack where its offset STARTS, so a pack
    // overfills by at most one straddling doc (max doc length bound)
    val maxDoc = docs.select(max(size(split(trim(col("text")), "\\s+")))).collect()(0).getInt(0)
    assert(packs.forall(_.getLong(3) <= 2048L + maxDoc))
  }

  test("merge upsert classifies every key exactly once") {
    val rows = Curation.mergeUpsert(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    import org.apache.spark.sql.functions._
    val n = docs.count()
    val updates = docs.filter(col("doc_id") % 7 === 0).count()
    val inserts = docs.filter(col("doc_id") % 13 === 0).count()
    assert(rows("update") === updates)
    assert(rows("insert") === inserts)
    assert(rows("keep") === n - updates)
    assert(rows.values.sum === n + inserts)
  }

  test("contamination join is keyed on shingle hashes, never a cartesian") {
    val df = Curation.contamination(spark, sf)
    val nodes = collectPlans(df.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.nodeName.contains("BroadcastNestedLoopJoin") ||
      n.nodeName.contains("CartesianProduct")),
      "inverted-index contamination must stay an equi-join")
    val rows = df.collect()
    // shared-vocabulary corpus: some corpus/eval shingle collisions exist
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "contaminated ⊆ overlapping")
      assert(r.getLong(3) >= 1)
    }
  }

  test("write-audit-publish quarantines the failing batch and publishes atomically") {
    import org.apache.hadoop.fs.Path
    val rows = Curation.wapPublish(spark, sf).collect()
    assert(rows.length === 3)
    val byStage = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byStage("batch_clean")._2 === 0L, "clean batch must audit violation-free")
    assert(byStage("batch_corrupt")._2 > 0L, "corrupt batch must carry violations")
    assert(byStage("batch_corrupt")._3 === 0L, "corrupt batch must not be published")
    assert(byStage("published_table") === byStage("batch_clean"),
      "published table must be exactly the clean batch")
    // directory-level proof: corrupt stays staged, clean was renamed out
    val conf = spark.sparkContext.hadoopConfiguration
    val fp = graft.sources.LayoutCache.fingerprint(conf, s"$sf/documents.parquet")
    val dir = s"${graft.WorkDirs.rootActive}/wap_$fp"
    val fs = new Path(dir).getFileSystem(conf)
    assert(fs.exists(new Path(s"$dir/stage/batch_corrupt")))
    assert(!fs.exists(new Path(s"$dir/stage/batch_clean")))
    assert(fs.exists(new Path(s"$dir/published/batch_clean")))
    assert(!fs.exists(new Path(s"$dir/published/batch_corrupt")))
  }

  test("scd2 interval enrichment equals the as-of window recompute, equi-join plan") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Curation.scd2Dim(spark, sf)
    val nodes = collectPlans(df.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.nodeName.contains("BroadcastNestedLoopJoin") ||
      n.nodeName.contains("CartesianProduct")),
      "interval join must keep its user_id equi-conjunct")
    val rows = df.collect().map(_.toString)
    assert(rows.nonEmpty)
    // independent as-of recompute: last view state at each click via one
    // co-sorted window pass (views sort before clicks at equal micros;
    // among same-instant views the larger event_id wins, matching the
    // empty-interval semantics of the SCD2 build)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click"))
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("v", expr("cast(round(value * 1000000) as bigint)"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_type").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asOf = ev.withColumn("state",
        last(when(col("event_type") === "view", col("v")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"), count("state").as("n_matched"),
        sum(coalesce(col("state"), lit(0L))).as("state_sum"))
      .orderBy("user_id").collect().map(_.toString)
    assert(rows.toSeq === asOf.toSeq,
      "materialized intervals and the as-of window must agree")
  }

  test("incremental aggregate merge equals the direct whole-table group-by") {
    import org.apache.spark.sql.functions._
    val merged = Curation.incrAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 1000000) as bigint)")).as("v"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged === direct, "partial merge must be exactly the direct recompute")
    // second call serves from the materialized partials (idempotent)
    val again = Curation.incrAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again === merged)
  }

  test("bloom gate is invisible to the contamination result and actually prunes") {
    val gated = Curation.contaminationBloom(spark, sf).collect().toSeq
    val exact = Curation.contaminationNoBloomTwin(spark, sf).collect().toSeq
    assert(gated === exact,
      "bloom prefilter + exact verify join must equal the no-bloom answer")
    val (corpus, survivors) = Curation.contaminationBloomPrune(spark, sf)
    assert(corpus > 0)
    assert(survivors < corpus / 2,
      s"bloom must prune the clean corpus mass map-side ($survivors of $corpus survived)")
  }

  test("bloom membership test stays inside whole-stage codegen") {
    val plan = Curation.contaminationBloom(spark, sf).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("bloom_might_contain_long"),
      "gate expression must be present in the physical plan")
    // the gate is a scan-side Filter, not a join: no extra join nodes
    // beyond the one verify semi-join
    val joins = collectPlans(plan).count(_.nodeName.toLowerCase.contains("join"))
    assert(joins <= 1, s"bloom variant must add no join beyond the verify semi-join ($joins)")
  }

  test("int8 quantization stays in range and reconstructs the max component") {
    val rows = Curation.quantizeEmbeddings(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val n = r.getLong(1); val l1 = r.getLong(3)
      assert(l1 <= 127L * 64L * n, "every |q_i| must be <= 127")
      assert(l1 > 0)
    }
    // spot-check one vector end to end
    import org.apache.spark.sql.functions._
    val v = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val scale = v.map(math.abs).max / 127.0
    val q = v.map(x => math.round(x / scale))
    assert(q.map(math.abs).max === 127L, "max-|x| component quantizes to exactly ±127")
  }

  test("temperature mix upsamples rare sources relative to their raw share") {
    val rows = Curation.mixTemperature(spark, sf).collect()
    assert(rows.length === 20)
    // thr_ppm ∝ 1/√c: a strictly smaller source never gets a lower
    // keep-rate than a larger one (monotone dampening is the point of
    // temperature scaling)
    val byCount = rows.map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
    byCount.sliding(2).foreach { case Array((cA, thrA), (cB, thrB)) =>
      if (cA < cB) assert(thrA >= thrB, s"thr must fall as source count grows: $cA→$thrA vs $cB→$thrB")
    }
    // targets spend (almost) the whole budget: Σ floor terms ≤ budget,
    // and the floor rounding loses at most one doc per source
    val targets = rows.map(_.getLong(2)).sum
    assert(targets <= 2000L && targets >= 2000L - 20L, s"targets sum $targets")
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(1), "selected within stratum"))
  }

  test("token-budget selection: two-phase prefix sum equals the global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Curation.tokenBudgetSelect(spark, sf).collect()
    // direct single-window formulation (the scale-killer we avoided)
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("bigint").as("tokens"),
        expr("(1000000 * cast(size(array_distinct(toks)) as bigint)) div size(toks)").as("q"))
    val w = Window.orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val direct = docs.withColumn("cum", sum("tokens").over(w))
      .filter(col("cum") <= 30000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"), sum("tokens").as("tokens_selected"),
        min("q").as("min_q"))
      .orderBy("source")
      .collect()
    assert(got.toSeq === direct.toSeq,
      "bucketed prefix sum must select the identical set")
    val totalSelected = got.map(_.getLong(2)).sum
    assert(totalSelected > 0 && totalSelected <= 30000L,
      s"selected token mass $totalSelected must respect the budget")
  }

  test("token-budget selection plan has no corpus-wide single-partition window") {
    val plan = Curation.tokenBudgetSelect(spark, sf).queryExecution.executedPlan
    val nodes = collectPlans(plan)
    // every Window over the corpus must be partitioned (by bucket); the
    // only unpartitioned window allowed is the ~50-row bucket-offset one,
    // whose input is an aggregate, not the corpus scan
    val windows = nodes.filter(_.nodeName.contains("Window"))
    assert(windows.nonEmpty)
    val corpusWindows = windows.filterNot(w =>
      collectPlans(w).exists(_.nodeName.contains("HashAggregate")))
    corpusWindows.foreach { w =>
      assert(w.outputPartitioning.numPartitions > 1,
        s"corpus window must be partitioned:\n$w")
    }
  }

  test("train/val/test split partitions the corpus at the nominal rates") {
    val rows = Curation.splitTrain(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("test", "train", "val"))
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.documents(spark, sf).count())
    val train = rows.find(_.getString(0) == "train").get.getLong(1)
    // 98% ± binomial tolerance on 500 docs
    assert(math.abs(train - total * 0.98) <= 4 * math.sqrt(total * 0.98 * 0.02) + 1,
      s"train split $train of $total")
  }

  test("policy filter: stricter policy classes keep fewer docs") {
    val rows = Curation.policyFilter(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val kept = rows.map(_.getLong(2)).sum
    val total = rows.map(_.getLong(1)).sum
    assert(kept > 0 && kept < total, s"policy must bite: kept $kept of $total")
    // per policy class (source idx mod 4), the keep RATE must fall as
    // the class tightens (min_tokens up, langs down, sample rate down)
    val rateByClass = rows.groupBy(r => r.getString(0).drop(3).toInt % 4)
      .map { case (c, rs) => c -> rs.map(_.getLong(2)).sum.toDouble / rs.map(_.getLong(1)).sum }
    for (c <- 0 to 2)
      assert(rateByClass(c) >= rateByClass(c + 1),
        s"class $c must keep at least the rate of class ${c + 1}: $rateByClass")
  }

  test("z-score outliers: flags exist, are rare, and agree with float z-scores away from the boundary") {
    val rows = Curation.outlierZscore(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      assert(out > 0, s"${r.getString(0)}: heavy-tailed values must produce outliers")
      assert(out < n / 20, s"${r.getString(0)}: 3-sigma outliers must be rare, got $out of $n")
    }
    // cross-check one group against a driver-side float computation:
    // integer and float flags may only disagree within float error of
    // the 3-sigma boundary, which this data does not sit on
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(col("value")).collect().map(_.getDouble(0))
    val mu = vals.sum / vals.length
    val sigma = math.sqrt(vals.map(x => (x - mu) * (x - mu)).sum / vals.length)
    val floatFlags = vals.count(x => math.abs(x - mu) > 3 * sigma)
    val intFlags = rows.find(_.getString(0) == "click").get.getLong(2)
    assert(math.abs(floatFlags - intFlags) <= 2,
      s"float ($floatFlags) and exact-integer ($intFlags) outlier counts must agree")
  }

  test("forget-id cascade reconciles across primary and derived tables") {
    import org.apache.spark.sql.functions._
    val rows = Curation.forgetIds(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("doc_chunks", "documents", "embeddings"))
    rows.foreach { r =>
      assert(r.getLong(2) > 0, s"${r.getString(0)}: forget list must hit rows")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
    // documents row must match a direct count of the forget predicate
    val direct = Tables.documents(spark, sf).filter(col("doc_id") % 101 === 0).count()
    assert(rows.find(_.getString(0) == "documents").get.getLong(2) === direct)
    // derived chunk count must equal the exploded chunking of forgotten docs
    val chunks = Tables.documents(spark, sf)
      .filter(col("doc_id") % 101 === 0)
      .withColumn("n_tok", size(split(lower(trim(col("text"))), "\\s+")).cast("bigint"))
      .select(expr("1 + greatest(cast(ceil(greatest(n_tok - 64, 0) / 48.0) as bigint), 0)").as("nc"))
      .agg(sum("nc")).head().getLong(0)
    assert(rows.find(_.getString(0) == "doc_chunks").get.getLong(2) === chunks,
      "closed-form chunk count must equal the ceil form")
  }

  test("policy filter plan broadcasts the policy; corpus shuffles only for the rollup") {
    val nodes = collectPlans(Curation.policyFilter(spark, sf).queryExecution.executedPlan)
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "config-sized policy must broadcast")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 2, s"group-by (+order-by) shuffles only, got $shuffles")
  }

  test("outlier z-score plan broadcasts the 5-row moment table") {
    val nodes = collectPlans(Curation.outlierZscore(spark, sf).queryExecution.executedPlan)
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "per-group moments must broadcast back, never shuffle the events")
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")))
  }

  test("grouped priority sample takes exactly k weighted picks per source, rank pushed down") {
    val df = Curation.groupPrioritySample(spark, sf)
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.size === 20 && bySrc.values.forall(_.length === 10),
      "every source must contribute exactly k docs")
    bySrc.values.foreach { rs =>
      val prios = rs.sortBy(_.getInt(4)).map(_.getLong(3))
      assert(prios.zip(prios.tail).forall { case (a, b) => a >= b },
        "within a source, rank must follow priority desc")
    }
    // the rk<=k filter must reach the window as a group limit so each
    // partition keeps k rows early instead of ranking everything
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected Spark's rank-limit pushdown in the physical plan")
  }

  test("packing-efficiency sweep: packing beats one-doc-per-context, caps account exactly") {
    val rows = Curation.packEfficiency(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(64L, 128L, 512L))
    rows.foreach { r =>
      val (l, total, capped, overflow) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(capped + overflow === total, s"L=$l: cap accounting must conserve tokens")
      assert(r.getLong(7) < r.getLong(8),
        s"L=$l: packed waste must beat the one-doc-per-context baseline")
      assert(r.getLong(6) >= 0L, "waste can never be negative once tokens are capped")
    }
    // the short context truncates (docs run up to ~100 tokens), the long one never
    assert(rows.find(_.getLong(0) === 64L).get.getLong(4) > 0L, "L=64 must truncate")
    assert(rows.find(_.getLong(0) === 512L).get.getLong(4) === 0L, "L=512 must not truncate")
  }

  test("pseudonymization is injective and linkage-preserving on this corpus") {
    import org.apache.spark.sql.functions._
    val rows = Curation.pseudonymize(spark, sf).collect()
    assert(rows.nonEmpty)
    // the audit's core claims: one pseudonym per subject (a collision
    // would show as n_pseudonyms < n_users) and event linkage intact
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"${r.getString(0)}: pseudonym collision (${r.getLong(2)} users, ${r.getLong(3)} pseudonyms)")
      assert(r.getLong(1) >= r.getLong(2), "events can repeat a user, never the reverse")
    }
    // keyed: a different pepper must yield different pseudonym values
    val ev = Tables.events(spark, sf).limit(1)
      .select(expr("cast(conv(substr(md5(concat('other-pepper', cast(user_id as string))), 1, 15), 16, 10) as bigint)").as("p2"),
        expr("cast(conv(substr(md5(concat('graft-pepper-r7', cast(user_id as string))), 1, 15), 16, 10) as bigint)").as("p1"))
      .head()
    assert(ev.getLong(0) !== ev.getLong(1), "pepper rotation must re-key")
  }

  test("anneal schedule lerps uniform -> char-share exactly at the endpoints") {
    import org.apache.spark.sql.functions._
    val rows = Curation.annealMix(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getInt(0))
    assert(byEpoch.keySet === Set(0, 1, 2, 3, 4))
    // epoch 0 is the uniform phase: every source gets 10^6 div n ppm
    val n = byEpoch(0).length
    assert(byEpoch(0).forall(_.getLong(2) === 1000000L / n))
    // epoch E-1 is the char-share phase: fractions differ across sources
    assert(byEpoch(4).map(_.getLong(2)).distinct.length > 1,
      "final epoch must be proportional, not uniform")
    // each epoch's fractions sum to 10^6 within the floor-division loss
    byEpoch.values.foreach { rs =>
      val s = rs.map(_.getLong(2)).sum
      assert(s <= 1000000L && s > 1000000L - 2L * n, s"ppm sum $s out of range")
    }
    // quotas follow fractions: budget·frac div 1e6, never negative
    assert(rows.forall(r => r.getLong(3) === 1000L * r.getLong(2) / 1000000L))
  }

  test("merge upsert plans as a key-shuffled full-outer join, never BNLJ") {
    val plan = Curation.mergeUpsert(spark, sf).queryExecution.executedPlan
    val nodes = collectPlans(plan)
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "merge must be a key equi-join")
    assert(nodes.exists(n => n.nodeName.contains("SortMergeJoin") ||
      n.nodeName.contains("ShuffledHashJoin") || n.nodeName.contains("BroadcastHashJoin")),
      s"expected an equi-join node in:\n$plan")
  }

  test("lake vacuum is deterministic under repeats and spares committed files") {
    import org.apache.hadoop.fs.Path
    import graft.operators.Curation
    // two back-to-back invocations (the bench-repeat shape): each
    // re-stages the same orphans, discovers and deletes exactly them,
    // and reports an identical audit; the committed snapshot part
    // files survive untouched across both passes
    val dir = Curation.snapshotDir(spark, TestSpark.sf)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committedParts: Seq[String] =
      Seq("v1", "v2").flatMap { v =>
        fs.listStatus(new Path(s"$dir/$v")).map(_.getPath.getName)
          .filter(_.endsWith(".parquet")).sorted.toSeq
      }
    val r1 = Curation.lakeVacuum(spark, TestSpark.sf).collect().map(_.toSeq).toSeq
    val partsAfter1 = committedParts
    val r2 = Curation.lakeVacuum(spark, TestSpark.sf).collect().map(_.toSeq).toSeq
    assert(r1 === r2, "vacuum audit must be identical across repeats")
    assert(r1.head(0) === 3L, s"expected 3 orphans deleted: ${r1.head}")
    assert(committedParts === partsAfter1,
      "vacuum must never touch committed snapshot files")
    // and the orphans really are gone until re-staged
    assert(!fs.exists(new Path(s"$dir/staging_tmp")) ||
      fs.listStatus(new Path(s"$dir/staging_tmp")).isEmpty)
  }

  test("partition evolution prunes the new generation and pushes ts bounds to the old") {
    import org.apache.hadoop.fs.Path
    val (gen1Dir, gen2Dir) = Curation.partitionEvolutionDirs(spark, TestSpark.sf)
    val df = Curation.partitionEvolution(spark, TestSpark.sf)
    df.collect() // execute so scan metrics populate
    def census(dir: String): Int = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    def scanOf(frag: String): org.apache.spark.sql.execution.FileSourceScanExec =
      Explain.walkPlans(df.queryExecution.executedPlan).collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(frag)) => s
      }.getOrElse(fail(s"no scan over $frag in the plan"))
    // new generation: the day window must land in PartitionFilters and
    // list strictly fewer day dirs than exist
    val g2scan = scanOf("gen2")
    assert(g2scan.partitionFilters.nonEmpty,
      "the day window must prune the hive-partitioned generation")
    val gen2Total = census(gen2Dir)
    val gen2Read = g2scan.metrics("numFiles").value
    assert(gen2Read > 0 && gen2Read < gen2Total,
      s"gen2 must prune files: read $gen2Read of $gen2Total")
    // old generation: no partitions to prune — the ts bounds must reach
    // the parquet scan as data filters instead
    val g1scan = scanOf("gen1")
    assert(g1scan.dataFilters.exists(_.toString.contains("ts")),
      s"ts range must be a data filter on the flat generation: ${g1scan.dataFilters}")
    assert(census(gen1Dir) > 0 && gen2Total >= 10,
      "fixture sanity: both generations staged, gen2 has many day dirs")
  }

  test("merge-on-read re-stages a layer whose data files an external cleanup deleted") {
    import org.apache.hadoop.fs.Path
    val dir = Curation.snapshotDir(spark, TestSpark.sf)
    Curation.mergeOnReadFrame(spark, TestSpark.sf).count() // ensure staged
    val deltaDir = new Path(s"$dir/delta_mor")
    val fs = deltaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the positional-delete hardening scenario: data files gone, the
    // _SUCCESS sentinel left behind — the intact() gate must rebuild,
    // not scan an empty dir
    fs.listStatus(deltaDir).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.delete(f.getPath, false))
    assert(fs.exists(new Path(s"$dir/delta_mor/_SUCCESS")),
      "fixture: sentinel must survive the simulated cleanup")
    val mor = Curation.mergeOnReadFrame(spark, TestSpark.sf)
    val v2 = spark.read.parquet(s"$dir/v2")
    assert(mor.exceptAll(v2).isEmpty && v2.exceptAll(mor).isEmpty,
      "rebuilt layers must reconstruct the snapshot exactly")
  }

  test("merge-on-read reconstructs the copy-on-write snapshot row-for-row, without rewriting the base") {
    import org.apache.hadoop.fs.Path
    val dir = Curation.snapshotDir(spark, TestSpark.sf)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def baseParts: Seq[(String, Long, Long)] =
      fs.listStatus(new Path(s"$dir/v1")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
        .sortBy(_._1)
    val partsBefore = baseParts
    val mor = Curation.mergeOnReadFrame(spark, TestSpark.sf)
    val v2 = spark.read.parquet(s"$dir/v2")
    // full row identity, both directions — stronger than the audit triple
    assert(mor.exceptAll(v2).isEmpty, "MOR rows missing from the COW snapshot")
    assert(v2.exceptAll(mor).isEmpty, "COW rows missing from the MOR reconstruction")
    // the upsert cost O(changed rows): base v1 data files are untouched
    assert(baseParts === partsBefore,
      "merge-on-read must never rewrite a base data file")
    // and the layers really are layered: DV covers exactly the updated
    // rows, the delta exactly the updates + inserts
    val nUpd = spark.read.parquet(s"$dir/v1")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0).count()
    val nIns = spark.read.parquet(s"$dir/v2").count() - spark.read.parquet(s"$dir/v1").count()
    assert(spark.read.parquet(s"$dir/dv_mor").count() === nUpd)
    assert(spark.read.parquet(s"$dir/delta_mor").count() === nUpd + nIns)
  }

  test("KS drift: D in [0,1e6] ppm, attained at a real wc, and the largest source re-derives") {
    import org.apache.spark.sql.functions._
    val rows = Curation.ksDrift(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L,
        s"${r.getString(0)}: KS D is a ppm fraction")
    }
    // brute-force the quantized-ECDF KS for the largest source in Scala
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val biggest = docs.groupBy(_._1).view.mapValues(_.length).maxBy(v => (v._2, v._1))._1
    val srcWc = docs.filter(_._1 == biggest).map(_._2).sorted
    val allWc = docs.map(_._2).sorted
    val grid = allWc.distinct
    val d = grid.map { x =>
      val cs = srcWc.count(_ <= x) * 1000000L / srcWc.length
      val cg = allWc.count(_ <= x) * 1000000L / allWc.length
      math.abs(cs - cg)
    }.max
    val row = rows.find(_.getString(0) == biggest).get
    assert(row.getLong(2) === d, s"$biggest: engine KS must equal the brute-force fold")
    assert(grid.contains(row.getLong(3)), "argmax location is a real wc value")
  }

  test("temporal split: exact 80/20 cut, no future in train, overlap diagnosed") {
    import org.apache.spark.sql.functions._
    val rows = Curation.temporalSplit(spark, TestSpark.sf).collect()
    val ev = Tables.events(spark, TestSpark.sf)
    val n = ev.count()
    val nTrain = rows.map(_.getLong(1)).sum
    val nTest = rows.map(_.getLong(2)).sum
    assert(nTrain + nTest === n, "the split partitions every event")
    // cut at rank ceil(0.8n): train holds AT LEAST that many rows
    // (ties at the cutoff timestamp all land in train), test the rest
    val cutRank = (4 * n + 4) / 5
    assert(nTrain >= cutRank, "everything up to the p80 rank is train")
    assert(nTrain - cutRank < 100, "only cutoff-timestamp ties may exceed the rank")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "overlap can't exceed the user census")
      assert(r.getLong(5) === r.getLong(4) * 1000000L / r.getLong(3))
    }
    // the TIME property itself: max train ts <= min test ts, re-derived
    val times = ev.select(expr("unix_micros(ts)").as("tm")).collect().map(_.getLong(0)).sorted
    val thr = times(cutRank.toInt - 1)
    assert(times.count(_ <= thr) === nTrain, "train census matches the raw timeline cut")
  }

  test("shelf packing: whole-doc invariants and dominance over one-doc-per-context") {
    val rows = Curation.packShelf(spark, TestSpark.sf).collect()
    assert(rows.length === 3, "one row per candidate context length")
    val n = Tables.documents(spark, TestSpark.sf).count()
    rows.foreach { r =>
      val (l, docs, ctxs, capped, shelf, naive) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(docs === n)
      assert(ctxs <= docs, "shelving can never need more contexts than docs")
      assert(ctxs * l >= capped, "allocation covers the capped mass")
      assert(shelf <= naive, s"L=$l: shelf waste must dominate naive padding")
      assert(shelf >= 0 && naive <= 1000000L)
    }
  }

  test("ROUGE-2 recall: bounded, attributed to the true argmax candidate") {
    import org.apache.spark.sql.functions._
    val rows = Curation.rougeOverlap(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 97 === 0, "scored docs are the eval set")
      assert(r.getLong(1) % 97 !== 0, "candidates come from the corpus side")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3),
        s"eval ${r.getLong(0)}: 1 <= inter <= den")
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
    }
    // brute-force the best match for the first scored eval doc over the
    // raw corpus (hot-bigram cap re-applied), and confirm the argmax
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    def bgs(t: Seq[String]): Set[String] =
      (0 to math.max(t.length - 2, 0)).map(i => t.slice(i, math.min(i + 2, t.length)).mkString(" ")).toSet
    val df = scala.collection.mutable.Map.empty[String, Int]
    val evalHs = docs.filter(_._1 % 97 == 0).flatMap(d => bgs(d._2)).toSet
    docs.foreach(d => bgs(d._2).foreach(s => df(s) = df.getOrElse(s, 0) + 1))
    val kept: Set[String] = evalHs.filter(s => df(s) <= 100)
    val e0 = rows.head.getLong(0)
    val eSet = bgs(docs.find(_._1 == e0).get._2).intersect(kept)
    val cands = docs.filter(_._1 % 97 != 0)
      .map(d => (d._1, bgs(d._2).intersect(eSet).size)).filter(_._2 > 0)
    val best = cands.minBy { case (id, n) => (-n, id) }
    assert((rows.head.getLong(1), rows.head.getLong(2)) === best,
      "engine best-match must equal the brute-force argmax")
    assert(rows.head.getLong(3) === eSet.size, "denominator is the kept-bigram set size")
  }

  test("feistel shuffle is a bijection that spreads sequential ids across all shards") {
    import org.apache.spark.sql.functions._
    val perm = Curation.feistelPermuted(spark, TestSpark.sf)
    val n = Tables.documents(spark, TestSpark.sf).count()
    assert(perm.select("l", "r").distinct().count() === n,
      "a Feistel network must keep distinct ids distinct")
    // halves stay inside 32 bits (the invertibility precondition)
    assert(perm.filter(col("l") < 0 || col("l") > 4294967295L ||
      col("r") < 0 || col("r") > 4294967295L).count() === 0)
    val census = Curation.feistelShuffle(spark, TestSpark.sf).collect()
    assert(census.map(_.getLong(1)).sum === n, "shard census covers every doc")
    assert(census.length === 16, "sequential ids must reach ALL 16 shards")
    // balanced: no shard more than 3x the uniform share at 500+ docs
    assert(census.map(_.getLong(1)).max <= 3 * (n / 16 + 1),
      "the permutation must break the sequential-id clustering")
    // and it genuinely reorders: sorting by the permuted key is not the
    // identity order on doc_id
    val head = perm.orderBy("r", "l").limit(10).collect().map(_.getLong(0))
    assert(!head.sameElements(head.sorted), "shuffled head must not be id-ordered")
    // constructive bijectivity: run the inverse rounds (reverse keys,
    // un-swap) and recover every original id exactly
    val M = 4294967295L
    val inv = Curation.FeistelKeys.reverse.foldLeft(perm) { case (df, k) =>
      df.withColumn("t", expr(s"(l ^ $k) * 73244475"))
        .withColumn("f", expr(s"(t ^ shiftright(t, 16)) & $M"))
        .select(col("doc_id"), expr("r ^ f").as("l"), col("l").as("r"))
    }
    assert(inv.filter(expr("l * 4294967296 + r <> doc_id")).count() === 0,
      "inverse Feistel must reconstruct every doc_id")
  }

  test("k-fold split: partition invariants hold for every fold") {
    val rows = Curation.splitKfold(spark, sf).collect()
    assert(rows.length === 5)
    val total = Tables.documents(spark, sf).count()
    val idSum = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("doc_id")).head.getLong(0)
    rows.foreach { r =>
      // partition: test + train = whole corpus, for mass AND checksum
      assert(r.getAs[Long]("n_test") + r.getAs[Long]("n_train") === total)
      assert(r.getAs[Long]("test_id_sum") + r.getAs[Long]("train_id_sum") === idSum)
      assert(r.getAs[Long]("n_test") > 0, "every fold must be non-empty")
    }
    // folds are disjoint: the per-fold test masses sum to the corpus
    assert(rows.map(_.getAs[Long]("n_test")).sum === total)
  }

  test("BLEU-2: bounds, brevity direction, and the zero-match contract") {
    val rows = Curation.evalBleu(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p1, p2, bp, bleu) = (r.getAs[Long]("p1_ppm"), r.getAs[Long]("p2_ppm"),
        r.getAs[Long]("bp_ppm"), r.getAs[Long]("bleu2_ppm"))
      assert(p1 >= 0 && p1 <= 1000000 && p2 >= 0 && p2 <= 1000000)
      assert(bp >= 0 && bp <= 1000000)
      // geometric mean of precisions, discounted by bp, stays in range
      assert(bleu >= 0 && bleu <= 1000000)
      assert(p2 <= p1 || p1 == 0,
        "clipped bigram precision can never exceed unigram precision on the same pair")
      if (r.getAs[Long]("cand_id") == -1L)
        assert(p1 == 0 && p2 == 0 && bleu == 0, "unmatched docs emit zeros")
      // bp = 1 exactly when the hypothesis is at least reference length
      if (r.getAs[Long]("len_hyp") >= r.getAs[Long]("len_ref")
        && r.getAs[Long]("len_hyp") > 0)
        assert(bp === 1000000L)
    }
  }

  test("token F1: harmonic-mean bounds, spine agreement with BLEU, zero-match contract") {
    val rows = Curation.evalF1(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m1, lc, le) = (r.getAs[Long]("m1"),
        r.getAs[Long]("len_cand"), r.getAs[Long]("len_eval"))
      val (p, rr, f1) = (r.getAs[Long]("p_ppm"), r.getAs[Long]("r_ppm"),
        r.getAs[Long]("f1_ppm"))
      assert(p >= 0 && p <= 1000000 && rr >= 0 && rr <= 1000000)
      // clipped overlap can never exceed either side's length
      assert(m1 <= lc && m1 <= le || lc == 0,
        "clipped token overlap is bounded by both lengths")
      // floor is monotone, so the harmonic mean's min/max envelope
      // survives the ppm truncation exactly
      assert(f1 >= math.min(p, rr) && f1 <= math.max(p, rr),
        s"F1 must sit between P and R (p=$p r=$rr f1=$f1)")
      if (r.getAs[Long]("cand_id") == -1L)
        assert(m1 == 0 && lc == 0 && le == 0 && f1 == 0,
          "unmatched docs emit zeros")
    }
    // same spine as BLEU: identical pair attribution and unigram masses
    val bleu = Curation.evalBleu(spark, sf).collect()
      .map(r => r.getAs[Long]("eval_id") -> r).toMap
    rows.foreach { r =>
      val b = bleu(r.getAs[Long]("eval_id"))
      assert(r.getAs[Long]("cand_id") === b.getAs[Long]("cand_id"))
      assert(r.getAs[Long]("len_cand") === b.getAs[Long]("len_hyp"))
      assert(r.getAs[Long]("len_eval") === b.getAs[Long]("len_ref"))
    }
  }

  test("chrF: F-beta envelope, clipped bounds, spine agreement, zero-match contract") {
    val rows = Curation.evalChrf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lh, lr) = (r.getAs[Long]("m"),
        r.getAs[Long]("len_hyp_grams"), r.getAs[Long]("len_ref_grams"))
      val (p, rr, f) = (r.getAs[Long]("p_ppm"), r.getAs[Long]("r_ppm"),
        r.getAs[Long]("chrf_ppm"))
      assert(m <= lh && m <= lr || lh == 0,
        "clipped gram overlap is bounded by both pooled lengths")
      assert(p >= 0 && p <= 1000000 && rr >= 0 && rr <= 1000000)
      // the weighted harmonic mean sits between P and R; floor is
      // monotone so the envelope survives ppm truncation exactly
      assert(f >= math.min(p, rr) && f <= math.max(p, rr),
        s"chrF must sit between P and R (p=$p r=$rr f=$f)")
      assert(f === (if (4 * lr + lh > 0) 5 * m * 1000000L / (4 * lr + lh) else 0L),
        "chrf_ppm must be the committed integer identity")
      if (r.getAs[Long]("cand_id") == -1L)
        assert(m == 0 && lh == 0 && lr == 0 && f == 0, "unmatched docs emit zeros")
    }
    // same spine as F1/BLEU: identical pair attribution
    val f1 = Curation.evalF1(spark, sf).collect()
      .map(r => r.getAs[Long]("eval_id") -> r.getAs[Long]("cand_id")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("cand_id") === f1(r.getAs[Long]("eval_id")))
    }
  }

  test("layout skipping: sorted layout prunes, shuffled layout cannot") {
    val rows = graft.operators.BenchOps.xLayoutSkipping(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sorted = rows("range_sorted")
    val shuffled = rows("hash_shuffled")
    // sorted: each point probe survives in ~1 row group
    assert(sorted.getAs[Long]("surviving_rg") <= 2 * sorted.getAs[Long]("n_probes"),
      "range-sorted row groups must prune to ~1 per probe")
    // shuffled: hash order makes every row group span ~the full domain
    assert(shuffled.getAs[Long]("avg_surviving_ppm") > 900000L,
      "hash-shuffled row groups must be unprunable")
    assert(sorted.getAs[Long]("avg_surviving_ppm")
      < shuffled.getAs[Long]("avg_surviving_ppm") / 4,
      "clustering must move the pruning census by at least 4x")
  }
}
