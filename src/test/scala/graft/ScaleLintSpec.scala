package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide scale audit: every registered query EXECUTES and its
  * final (post-AQE) physical plan is walked by [[Explain.scaleLint]]
  * for the four 100 TB-killer shapes — unpartitioned windows over
  * non-aggregated frames, single-partition exchanges that moved more
  * than [[Explain.ScaleRowBound]] measured rows, BroadcastNestedLoopJoin,
  * and driver-materialized LocalTableScans beyond model size.
  *
  * Two-sided contract:
  *  - any finding NOT covered by [[Explain.scaleLintAllow]]'s written
  *    justification fails the suite (a new scale-killer can't land
  *    silently);
  *  - any allowlist entry that NO LONGER fires also fails (a stale
  *    justification would otherwise shadow a future real finding of
  *    the same kind on that query).
  */
class ScaleLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def flush(): Unit =
    org.apache.spark.GraftListenerBridge.flushListenerBus(spark.sparkContext)

  test("no registered query carries an unjustified scale-killer shape — final OR intermediate plan") {
    val capture = new Explain.PlanCapture
    spark.listenerManager.register(capture)
    try {
      val fired = scala.collection.mutable.Map.empty[String, Set[String]]
      val bad = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        flush(); capture.drainReadPlans() // discard the previous query's tail
        val df = fn(spark, sf)
        df.collect() // materialize AQE's final plan + runtime shuffle metrics
        flush()
        // every read action the query ran while being ASSEMBLED
        // (count(), first(), localCheckpoint materializations) plus
        // the final plan — a driver-assembled final frame can no
        // longer hide a join from the lint (r13)
        val plans = df.queryExecution.executedPlan +:
          capture.drainReadPlans().map(_.executedPlan)
        val findings = plans.flatMap(Explain.scaleLint).distinct
        val allow = Explain.scaleLintAllow.getOrElse(name, Map.empty)
        fired(name) = findings.map(_._1).toSet
        findings.filterNot(f => allow.contains(f._1)).foreach { case (k, d) =>
          bad += s"$name: $k($d)"
        }
      }
      assert(bad.isEmpty, s"unjustified scale findings:\n  ${bad.mkString("\n  ")}")
      // entries marked [scale-dependent] only fire above this spec's
      // sf0.001 (memory-sink sizes scale with the events table; the rank
      // kernel's bucket frame with the value range); entries marked
      // [intermediate-cold] fire only when the run builds a write-once
      // fixture — staleness is not checkable here, so both are exempt
      val stale = for {
        (name, kinds) <- Explain.scaleLintAllow.toSeq.sortBy(_._1)
        (k, why) <- kinds.toSeq.sortBy(_._1)
        if !why.startsWith("[scale-dependent]") &&
          !why.startsWith("[intermediate-cold]") &&
          !fired.getOrElse(name, Set.empty).contains(k)
      } yield s"$name: $k"
      assert(stale.isEmpty,
        s"stale scaleLintAllow entries (justification no longer fires):\n  ${stale.mkString("\n  ")}")
    } finally spark.listenerManager.unregister(capture)
  }

  test("the capture listener sees a join hidden behind a driver-assembled final frame") {
    import spark.implicits._
    val capture = new Explain.PlanCapture
    spark.listenerManager.register(capture)
    try {
      flush(); capture.drainReadPlans()
      // the exact bypass shape the r12 verdict flagged on
      // x_layout_skipping: a non-equi join executed via an
      // intermediate count(), with only a driver-built Seq(...).toDF
      // registered as the "result"
      val left = spark.range(50).toDF("a")
      val right = spark.range(40).toDF("b")
      val hidden = left.join(right, col("a") > col("b")).count()
      val visible = Seq(("census", hidden)).toDF("k", "v")
      visible.collect()
      flush()
      val plans = visible.queryExecution.executedPlan +:
        capture.drainReadPlans().map(_.executedPlan)
      val kinds = plans.flatMap(Explain.scaleLint).map(_._1).toSet
      assert(Explain.scaleLint(visible.queryExecution.executedPlan).isEmpty,
        "the final 1-row frame alone must look clean — that IS the bypass")
      assert(kinds.contains("bnlj"),
        "the captured intermediate count() plan must surface the hidden BNLJ")
    } finally spark.listenerManager.unregister(capture)
  }
}
