package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global order statistics — the shared kernel behind
  * every "value at rank r of the whole corpus" cut in the engine
  * ([[TextOps.perplexityFilter]]'s p90 surprise threshold, and the
  * construction [[graft.plans.ScaleModeRewrite]] swaps in for global
  * rank windows under `spark.graft.scaleMode`).
  *
  * A literal `row_number() OVER (ORDER BY score)` ranks the corpus in a
  * SINGLE partition — the classic 100 TB scale-killer. This is the
  * bucketed two-phase construction instead (the
  * [[Curation.tokenBudgetSelect]] prefix-sum pattern applied to counts):
  *
  *  1. distinct-score counts roll up per RANGE BUCKET
  *     (`score div bucketWidth` — truncation toward zero, still a
  *     monotone coarsening, so bucket order refines to score order;
  *     note bucket 0 spans (-width, width), i.e. up to 2·width−1
  *     distinct scores when scores go negative); the exclusive running
  *     count over the ~O(score range / width) bucket rows is the only
  *     unpartitioned window — constant-size regardless of corpus scale;
  *  2. exactly ONE bucket straddles the cut rank
  *     (`offset < r <= offset + count`); only that bucket's
  *     distinct-score rows — at most `2·bucketWidth − 1` of them
  *     (the zero-straddling bucket's width; every other bucket holds
  *     at most `bucketWidth`), corpus-
  *     independent — take a bucket-partitioned running count, and the
  *     smallest score whose cumulative count reaches the rank is the
  *     answer.
  *
  * No global sort, no single-partition corpus shuffle, two tiny
  * broadcasts. The single-window formulation is the DuckDB oracle's —
  * the equivalence IS the correctness claim.
  */
object Ranks {

  /** Exact value at 1-based ascending rank `cutRank` of integer column
    * `scoreCol` in `scored` (i.e. the smallest score whose cumulative
    * frequency reaches the rank — the value at that rank under ANY
    * tie-break, since equal scores are indistinguishable by value).
    *
    * `cutRank` arrives as a 1-row (`cut_rk` BIGINT) frame so callers
    * derive it from a count aggregate without a driver round-trip.
    * Returns a 1-row frame with column `thr` (empty iff `scored` is).
    */
  def valueAtRank(
      scored: DataFrame,
      scoreCol: String,
      cutRank: DataFrame,
      bucketWidth: Long): DataFrame =
    valuesAtRanks(scored, scoreCol,
      cutRank.withColumn("qlabel", lit("_")), bucketWidth)
      .select(col("thr"))

  /** Batched form: one pass answers SEVERAL ranks at once (the
    * quantile-vector shape — p25/p50/p75 from a single distinct-score
    * aggregate). `cutRanks` carries (`qlabel` STRING, `cut_rk` BIGINT)
    * rows; returns one (`qlabel`, `thr`) row per rank that lands
    * within the population. Each rank straddles exactly one bucket, so
    * the phase-2 window is per-LABEL over at most `2·bucketWidth − 1`
    * distinct-score rows (the zero-straddling bucket's span) —
    * corpus-independent however many ranks ride along.
    */
  def valuesAtRanks(
      scored: DataFrame,
      scoreCol: String,
      cutRanks: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // Spark's `div` (IntegralDivide) TRUNCATES toward zero, which is
    // still a monotone non-decreasing coarsening of score order, so the
    // construction stays correct for negative scores; the one wrinkle
    // is that bucket 0 spans (-width, width) — up to 2·width−1 distinct
    // scores — which only affects the phase-2 window's constant bound,
    // not correctness. (DuckDB `//` floors; irrelevant here because the
    // bucketing is internal — oracles never reproduce it.)
    val scores = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(s"s div $bucketWidth"))
    val offsets = scores.groupBy("bucket").agg(sum("cnt").as("bcnt"))
      .withColumn("offset",
        coalesce(
          sum("bcnt").over(Window.partitionBy(lit(0)).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val cutBuckets = offsets.crossJoin(broadcast(cutRanks))
      .filter(col("offset") < col("cut_rk") &&
        col("cut_rk") <= col("offset") + col("bcnt"))
      .select("qlabel", "bucket", "offset", "cut_rk")
    scores.join(broadcast(cutBuckets), "bucket")
      .withColumn("cum",
        col("offset") + sum("cnt").over(
          Window.partitionBy("qlabel").orderBy("s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") >= col("cut_rk"))
      .groupBy("qlabel")
      .agg(min("s").as("thr"))
  }

  /** Grouped form: exact values at PER-GROUP ranks — the "per-language
    * perplexity tertiles" shape (CCNet's head/middle/tail split), where
    * every group needs its own cut values over its own score
    * distribution. `cutRanks` carries (`groupCol`, `qlabel` STRING,
    * `cut_rk` BIGINT) rows; returns one (`groupCol`, `qlabel`, `thr`)
    * row per rank that lands within its group's population.
    *
    * Strictly BETTER scale shape than the global kernel: grouping keys
    * partition every window (offsets per group over its bucket rows,
    * phase 2 per (group, label) over one bucket's distinct scores), so
    * there is NO unpartitioned window and no 1-row scalar attach —
    * every join is an equi-join on the group key (hash, broadcastable:
    * cutRanks and cutBuckets are O(groups × labels)). A naive
    * `PARTITION BY group ORDER BY score` row_number puts each group's
    * ENTIRE corpus slice in one partition — for low-cardinality groups
    * (languages, sources) that is the same 100 TB scale-killer as the
    * global window, which is exactly why the bucketed construction is
    * grouped here rather than the window.
    */
  def valuesAtRanksBy(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      cutRanks: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val scores = scored
      .groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(s"s div $bucketWidth"))
    val offsets = scores.groupBy(groupCol, "bucket").agg(sum("cnt").as("bcnt"))
      .withColumn("offset",
        coalesce(
          sum("bcnt").over(Window.partitionBy(groupCol).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val cutBuckets = offsets.join(broadcast(cutRanks), Seq(groupCol))
      .filter(col("offset") < col("cut_rk") &&
        col("cut_rk") <= col("offset") + col("bcnt"))
      .select(groupCol, "qlabel", "bucket", "offset", "cut_rk")
    scores.join(broadcast(cutBuckets), Seq(groupCol, "bucket"))
      .withColumn("cum",
        col("offset") + sum("cnt").over(
          Window.partitionBy(groupCol, "qlabel").orderBy("s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") >= col("cut_rk"))
      .groupBy(groupCol, "qlabel")
      .agg(min("s").as("thr"))
  }
}
