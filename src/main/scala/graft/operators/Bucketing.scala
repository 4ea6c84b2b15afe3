package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located join (SURVEY §4 / the 100 TB join strategy):
  * both fact tables are written bucketed+sorted on the join key, so the
  * sort-merge join consumes bucket files directly — zero Exchange, zero
  * sort in the join plan. This is the shape that turns a repeated
  * lineitem⋈orders from a full-cluster shuffle into a local merge.
  *
  * The demo writes both tables bucketed into the session catalog
  * (spark-warehouse/), joins, and aggregates; the spec asserts the plan
  * contains no ShuffleExchange ahead of the join.
  */
object Bucketing {

  type Q = (SparkSession, String) => DataFrame

  private val Buckets = 8

  /** Write once per (session, sfDir); re-registering is cheap and keeps
    * the query self-contained for the driver.
    */
  /** The in-memory catalog forgets tables between JVMs but their
    * warehouse directories survive, which makes saveAsTable fail with
    * LOCATION_ALREADY_EXISTS — drop both the catalog entry and the path.
    */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val p = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Source fingerprint of the last successful write in this JVM —
    * repeated invocations (bench loops) reuse the bucketed tables
    * instead of rewriting them, so b1's timing measures the JOIN; any
    * change to the source data changes the fingerprint and forces a
    * rewrite ([[graft.sources.LayoutCache]]).
    */
  private val written = scala.collection.mutable.Map[String, String]()

  /** Returns true if the tables were (re)written, false on reuse —
    * exposed for the staleness spec.
    */
  private[graft] def ensureBucketTables(spark: SparkSession, sfDir: String): Boolean =
    synchronized {
      val fp = graft.sources.LayoutCache.fingerprint(
        spark.sparkContext.hadoopConfiguration,
        Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet"))
      val fresh = written.get(sfDir).contains(fp) &&
        spark.catalog.tableExists("graft_li_bucketed") &&
        spark.catalog.tableExists("graft_o_bucketed")
      if (!fresh) {
        dropStale(spark, "graft_li_bucketed")
        dropStale(spark, "graft_o_bucketed")
        val li = Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_quantity", "l_extendedprice")
        val o = Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        li.write.mode("overwrite")
          .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_li_bucketed")
        o.write.mode("overwrite")
          .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_o_bucketed")
        written(sfDir) = fp
      }
      !fresh
    }

  /** The bucketed join itself, as a plan (exposed for the plan spec). */
  def bucketedJoinPlan(spark: SparkSession): DataFrame = {
    val li = spark.table("graft_li_bucketed")
    val o = spark.table("graft_o_bucketed")
    // merge hint: keep it a sort-merge join (a broadcast would also be
    // shuffle-free but wouldn't exercise bucket alignment)
    li.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum("l_extendedprice"), 2).as("total_price"))
      .orderBy("o_orderpriority")
  }

  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    ensureBucketTables(spark, sfDir)
    bucketedJoinPlan(spark)
  }

  val registry: Map[String, Q] = Map(
    "b1_bucketed_join" -> bucketedJoin _,
  )

  /** Result semantics are the plain join-aggregate — bucketing is purely
    * physical, so the oracle is the unbucketed SQL.
    */
  val oracles: Map[String, String] = Map(
    "b1_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
