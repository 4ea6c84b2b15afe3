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
  // One global "current contents" key (`sfDir|fp`), NOT a per-sfDir
  // map: the catalog tables are shared global names, so alternating
  // scale dirs in one session must invalidate — a per-sfDir map would
  // mark the tables "fresh" while they hold the other scale's rows.
  @volatile private var written: Option[String] = None

  /** Returns true if the tables were (re)written, false on reuse —
    * exposed for the staleness spec.
    */
  private[graft] def ensureBucketTables(spark: SparkSession, sfDir: String): Boolean =
    synchronized {
      val fp = graft.sources.LayoutCache.fingerprint(
        spark.sparkContext.hadoopConfiguration,
        Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet"))
      val fresh = written.contains(s"$sfDir|$fp") &&
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
        written = Some(s"$sfDir|$fp")
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

  // ---------------------------------------------------------------- //
  // Cost-based join reorder (CBO) evidence
  // ---------------------------------------------------------------- //

  // Same global-contents discipline as [[ensureBucketTables]]'s
  // `written`: the 3 catalog tables are shared names across scale dirs.
  @volatile private var cboWritten: Option[String] = None

  /** Stats-bearing catalog copies of the 3-table star (fingerprint-
    * gated like the bucketed pair): saveAsTable + ANALYZE .. FOR
    * COLUMNS, because CostBasedJoinReorder only sees catalog
    * statistics — path-based parquet reads have none, which is why CBO
    * never fires on the rest of the registry and needs this explicit
    * demo.
    */
  private[graft] def ensureCboTables(spark: SparkSession, sfDir: String): Unit =
    synchronized {
      val fp = graft.sources.LayoutCache.fingerprint(
        spark.sparkContext.hadoopConfiguration,
        Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet",
          s"$sfDir/customer.parquet"))
      val names = Seq("graft_cbo_lineitem", "graft_cbo_orders", "graft_cbo_customer")
      val fresh = cboWritten.contains(s"$sfDir|$fp") &&
        names.forall(spark.catalog.tableExists)
      if (!fresh) {
        names.foreach(dropStale(spark, _))
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
          .write.mode("overwrite").saveAsTable("graft_cbo_lineitem")
        Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
          .write.mode("overwrite").saveAsTable("graft_cbo_orders")
        Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
          .write.mode("overwrite").saveAsTable("graft_cbo_customer")
        spark.sql("ANALYZE TABLE graft_cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
        spark.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
        spark.sql("ANALYZE TABLE graft_cbo_customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")
        cboWritten = Some(s"$sfDir|$fp")
      }
    }

  private val CboQuery =
    """SELECT c_mktsegment, count(*) AS n,
      | sum(cast(l_quantity as bigint)) AS qty
      |FROM graft_cbo_lineitem l
      |JOIN graft_cbo_orders o ON l.l_orderkey = o.o_orderkey
      |JOIN graft_cbo_customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Leaf-relation order of the optimized logical plan — what
    * CostBasedJoinReorder changes (physical join strategy is AQE's
    * business and not inspected here).
    */
  private[graft] def leafOrder(spark: SparkSession): Seq[String] =
    spark.sql(CboQuery).queryExecution.optimizedPlan.collectLeaves().map {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        r.tableMeta.identifier.table
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table).getOrElse(r.toString)
      case other => other.nodeName
    }.toSeq

  /** COST-BASED JOIN REORDER (§4) — the query is written in the worst
    * order (fact ⋈ fact, the selective dimension last); with catalog
    * column statistics and CBO's DP reorder enabled, the optimizer
    * rewrites the logical join tree so the selective customer filter
    * cuts cardinality early. The `reordered` flag compares the
    * optimized plan's leaf-relation order with CBO on vs off and is
    * PINNED TRUE by the oracle — if the stats pipeline or the reorder
    * rule stops firing, the correctness gate fails, not a perf number.
    * Heuristic ReorderJoin (always on) keeps the written order here, so
    * the flag isolates the COST-based decision. At 100 TB, joining the
    * two fact tables before the dimension filter is the classic
    * cluster-killer this rule exists to prevent.
    */
  def cboReorder(spark: SparkSession, sfDir: String): DataFrame = {
    ensureCboTables(spark, sfDir)
    val keys = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")
    val saved = keys.map { case (k, _) => k -> spark.conf.get(k) }
    val baseline = leafOrder(spark) // CBO off: session defaults
    val (rows, reordered) =
      try {
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
        (spark.sql(CboQuery).collect(), leafOrder(spark) != baseline)
      } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    import spark.implicits._
    rows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), reordered))
      .toDF("c_mktsegment", "n", "qty", "reordered")
  }

  val registry: Map[String, Q] = Map(
    "b1_bucketed_join" -> bucketedJoin _,
    "j8_cbo_reorder" -> cboReorder _,
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
    // plain star-join re-derivation; reordered pinned TRUE so a dead
    // stats pipeline or disabled CostBasedJoinReorder fails the gate
    "j8_cbo_reorder" ->
      """SELECT c_mktsegment, count(*) AS n,
        | sum(l_quantity::BIGINT)::BIGINT AS qty, TRUE AS reordered
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
