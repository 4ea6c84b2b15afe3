package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** The one sanctioned way to get a Hadoop `Configuration` anywhere in this
  * engine — driver or executor.
  *
  * A bare `new Configuration()` inside an executor closure silently drops
  * every s3a/hdfs/abfs credential and endpoint the session carries
  * (`spark.hadoop.*` entries land on the session conf, never on a fresh
  * default conf), so code that passes on local FS breaks on exactly the
  * remote object stores a 100 TB deployment reads. Spark's own
  * `SerializableConfiguration` is `private[spark]`, so we serialize the
  * session conf's entries (an `Array[(String, String)]` is a plain Java
  * serializable closure capture) and rebuild on the executor.
  *
  * Usage — driver side, capture BEFORE the closure:
  * {{{
  * val confEntries = SessionConf.entries(spark)
  * ds.mapPartitions { iter =>
  *   val conf = SessionConf.build(confEntries)
  *   ...
  * }
  * }}}
  * Driver-side-only code should use `spark.sparkContext.hadoopConfiguration`
  * directly (no copy needed).
  *
  * `SessionConfLintSpec` greps src/main for zero-arg `new Configuration()`
  * and fails on any occurrence, so the defect class (fixed one flagged site
  * at a time in rounds 10–11: lakeVacuum, m7PageIndex) cannot recur.
  */
object SessionConf {

  /** Serialize the session Hadoop conf to plain entries for closure
    * capture. Iterating a loadDefaults=true conf yields the defaults too,
    * so [[build]] reconstructs a complete conf, not a delta.
    */
  def entries(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toArray
  }

  /** Rebuild a Configuration from captured entries (executor side).
    * loadDefaults=false: the entries already contain the defaults, and
    * re-loading XML off the executor classpath could shadow session
    * overrides with stale cluster defaults.
    */
  def build(confEntries: Array[(String, String)]): Configuration = {
    val hc = new Configuration(false)
    confEntries.foreach { case (k, v) => hc.set(k, v) }
    hc
  }
}
