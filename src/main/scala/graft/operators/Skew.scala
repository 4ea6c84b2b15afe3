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

  val registry: Map[String, Q] = Map(
    "j3_salted_join" -> saltedJoin _,
  )

  val oracles: Map[String, String] = Map(
    "j3_salted_join" ->
      """SELECT event_type,
        | round(sum(value * CASE event_type
        |   WHEN 'click' THEN 1.5 WHEN 'error' THEN 0.1 WHEN 'purchase' THEN 5.0
        |   WHEN 'signup' THEN 3.0 WHEN 'view' THEN 1.0 END), 2) AS weighted_value,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
