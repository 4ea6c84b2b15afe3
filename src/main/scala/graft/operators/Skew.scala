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

  val registry: Map[String, Q] = Map(
    "j3_salted_join" -> saltedJoin _,
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
