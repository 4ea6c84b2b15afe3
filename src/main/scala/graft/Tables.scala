package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Every operator takes an `sfDir` (e.g. /root/testdata/sf0.01) so the same
  * code runs at any scale factor. Reads are plain `spark.read.parquet` —
  * Catalyst handles column pruning / predicate pushdown into the scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts has varied across testdata generations — TIMESTAMP(NANOS)
    * (which Spark's micros TimestampType can't represent; sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true per [[GraftSession]], so it
    * arrives as Long nanos and is integrally divided to micros — `/` on
    * longs would go through Double and lose precision at 1.7e18 ns) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TimestampType via
    * inferTimestampNTZ=false; the NTZ cast below covers sessions without
    * that flag — identical micros under the UTC session zone either way).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType            => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                   => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Fan a scan across all cores ahead of CPU-heavy per-row work.
    *
    * A small file arrives as ONE scan split, so downstream hashing /
    * dot-product kernels would serialize on a single core while the
    * rest idle — measured 4-6× on the sketch and embedding operators.
    * The repartition uses an EXPLICIT partition count because AQE would
    * coalesce a keyed repartition of byte-tiny input back to one
    * partition. Guarded: when the scan already has at least
    * `defaultParallelism` splits (any lake-scale table), this is a
    * no-op — an unconditional repartition there would shuffle the whole
    * table for nothing. The guard reads only the planned partition
    * count; it launches no job.
    */
  def fanOut(spark: SparkSession, df: DataFrame, key: Column): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
