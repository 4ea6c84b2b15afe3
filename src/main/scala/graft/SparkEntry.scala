package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, BenchOps, Bucketing, Curation, Dedup, Multimodal, Similarity, Skew, TextOps, ZOrder}
import graft.streaming.EventStreams

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * (spark, sfDir) => DataFrame; `oracleSql` carries the matching DuckDB
  * SQL (same column names, same ordering, same rounding) for the driver's
  * correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.registry ++ Dedup.registry ++ Similarity.registry ++
      TextOps.registry ++ BenchOps.registry ++ EventStreams.registry ++
      Multimodal.registry ++ Bucketing.registry ++ Skew.registry ++
      Curation.registry ++ ZOrder.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextOps.oracles ++ BenchOps.oracles ++ EventStreams.oracles ++
      Multimodal.oracles ++ Bucketing.oracles ++ Skew.oracles ++
      Curation.oracles ++ ZOrder.oracles
}
