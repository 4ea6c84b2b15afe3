package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling join (SCALE.md recipe made concrete): the events fact
  * table joins a 5-row dimension on event_type — a worst-case skew key
  * (5 distinct values across all rows). The salted form:
  *
  *   fact:  salt = event_id % SALTS (deterministic, uniform)
  *   dim:   exploded × SALTS
  *   join:  on (key, salt) → each hot key spreads over SALTS partitions
  *
  * Results are identical to the unsalted join (the oracle is the plain
  * SQL), only the shuffle distribution changes. AQE's skew-join handles
  * sort-merge cases at runtime; explicit salting is the recipe when a
  * single key exceeds an executor even after AQE splits.
  */
object Skew {

  type Q = (SparkSession, String) => DataFrame

  private val Salts = 8

  private val weights = Seq(
    ("click", 1.5), ("error", 0.1), ("purchase", 5.0), ("signup", 3.0), ("view", 1.0))

  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)).cast("int"))
    val dim = weights.toDF("event_type", "weight")
      .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
    fact.join(dim, Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(
        round(sum(col("value") * col("weight")), 2).as("weighted_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** The partition budget the profile reasons against — fixed as a
    * plan literal (matching GraftSession's 32 shuffle partitions)
    * rather than read from the conf, so the emitted recommendation is
    * deterministic across sessions and re-derivable by the oracle.
    */
  private val ProfilePartitions = 32L

  /** Join-key skew profiler — the measurement that DECIDES the
    * [[saltedJoin]] recipe instead of guessing it: per join key, row
    * count, corpus share in ppm, and the recommended salt factor
    * ceil(key_rows / ideal_partition_load) — the number of partitions
    * that key's rows must spread over so no task exceeds the uniform
    * per-partition load. `skewed` flags keys needing any salting at
    * all; feeding the max back as [[Salts]] closes the loop (8 covers
    * this corpus's hottest key at 32 partitions).
    *
    * Determinism discipline: share and salt factor are BIGINT
    * floor/ceil divisions against the literal partition budget — the
    * recommendation cannot dither between engines or runs.
    *
    * Scale: one key-grouped count (map-side combined — the shuffle
    * carries one row per key per partition) plus a 1-row total
    * broadcast back; profiling cost is O(keys), never O(rows), which
    * is why the profile can run ahead of EVERY large join.
    */
  def skewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").as("total_rows"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(n_rows * 1000000) div total_rows"))
      .withColumn("ideal_load", expr(s"greatest(total_rows div $ProfilePartitions, 1)"))
      .withColumn("recommended_salts",
        expr("greatest((n_rows + ideal_load - 1) div ideal_load, 1)"))
      .select(col("event_type"), col("n_rows"), col("share_ppm"),
        col("recommended_salts"), (col("recommended_salts") > 1L).as("skewed"))
      .orderBy("event_type")
  }

  /** J9 — AQE runtime skew-join evidence (the j7_runtime_bloom
    * discipline applied to OptimizeSkewedJoin): the SAME worst-case
    * 5-key join [[saltedJoin]] handles by explicit salting, handed to
    * AQE's runtime splitter instead. Broadcast is disabled in scope to
    * force the sort-merge shape, the skew thresholds are lowered from
    * their cluster defaults (256 MB / 5× median) to fire at harness
    * bytes, and the fact side fans out first so the skewed reduce
    * partition spans many map outputs — AQE splits by map-index range,
    * so a single-mapper shuffle is UNSPLITTABLE however skewed (a real
    * 100 TB ingest never has that problem; a one-file test fixture
    * always does).
    *
    * `skew_join` is read STRUCTURALLY from the executed plan — a
    * SortMergeJoinExec carrying isSkewJoin=true, never a plan-string
    * match — and pinned TRUE by the oracle. Results must equal the
    * plain join (AQE may only change the partitioning): the spec
    * asserts identity against [[saltedJoin]], whose output is the same
    * aggregate by construction.
    */
  def aqeSkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scoped = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      scoped.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = graft.Tables.fanOut(spark, Tables.events(spark, sfDir), col("event_id"))
      // integer ×10 weights: the weighted mass folds as exact BIGINT
      // cents·w10, immune to the summation-order FP dither a fanned-out
      // double sum would hit at the round(…,2) boundary
      val dim = weights.map { case (t, w) => (t, math.round(w * 10)) }
        .toDF("event_type", "w10")
      // aggregate on a key the join does NOT partition by: splitting a
      // skewed partition invalidates the join's output partitioning,
      // and without forceOptimizeSkewedJoin AQE declines any split
      // that would ADD an exchange — grouping by day needs its own
      // exchange either way, so the split is free and the rule fires
      val df = fact.join(dim, Seq("event_type"))
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(
          sum(expr("cast(round(value * 100) as bigint)") * col("w10"))
            .as("weighted_milli"),
          count(lit(1)).as("n"))
        .orderBy("day")
      val rows = df.collect()
      val skewed = graft.Explain.walkPlans(df.queryExecution.executedPlan).exists {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj.isSkewJoin
        case _ => false
      }
      rows.toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), skewed))
        .toDF("day", "weighted_milli", "n", "skew_join")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  val registry: Map[String, Q] = Map(
    "j3_salted_join" -> saltedJoin _,
    "j9_aqe_skew" -> aqeSkewJoin _,
    "x_skew_profile" -> skewProfile _,
  )

  val oracles: Map[String, String] = Map(
    "j3_salted_join" ->
      """SELECT event_type,
        | round(sum(value * CASE event_type
        |   WHEN 'click' THEN 1.5 WHEN 'error' THEN 0.1 WHEN 'purchase' THEN 5.0
        |   WHEN 'signup' THEN 3.0 WHEN 'view' THEN 1.0 END), 2) AS weighted_value,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // plain-join recompute + the skew flag pinned TRUE: AQE may only
    // change partitioning, never the answer (exact BIGINT cents·w10)
    "j9_aqe_skew" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        | sum(round(value * 100)::BIGINT * CASE event_type
        |   WHEN 'click' THEN 15 WHEN 'error' THEN 1 WHEN 'purchase' THEN 50
        |   WHEN 'signup' THEN 30 WHEN 'view' THEN 10 END)::BIGINT AS weighted_milli,
        | count(*) AS n, TRUE AS skew_join
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    // same integer divisions against the literal 32-partition budget
    "x_skew_profile" ->
      """WITH c AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type),
        |t AS (SELECT sum(n_rows)::BIGINT AS total_rows FROM c),
        |p AS (
        | SELECT event_type, n_rows,
        |  (n_rows * 1000000) // total_rows AS share_ppm,
        |  greatest((n_rows + greatest(total_rows // 32, 1) - 1)
        |    // greatest(total_rows // 32, 1), 1) AS recommended_salts
        | FROM c, t)
        |SELECT event_type, n_rows, share_ppm::BIGINT AS share_ppm,
        | recommended_salts::BIGINT AS recommended_salts,
        | recommended_salts > 1 AS skewed
        |FROM p ORDER BY event_type""".stripMargin,
  )
}
