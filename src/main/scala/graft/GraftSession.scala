package graft

import org.apache.spark.sql.SparkSession

/** One place for session config shared by Verify, Bench, and tests.
  *
  * Scale rationale: shuffle partitions sized to local cores (the driver
  * runs local[32]); AQE on so skewed shuffles re-plan at runtime — the
  * same knobs that matter on a 1000-executor cluster, just smaller.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as Long nanos
      // (Tables.events converts to TimestampType micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
