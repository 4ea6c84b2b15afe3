package graft

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

  test("no registered query carries an unjustified scale-killer shape") {
    val fired = scala.collection.mutable.Map.empty[String, Set[String]]
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      df.collect() // materialize AQE's final plan + runtime shuffle metrics
      val findings = Explain.scaleLint(df.queryExecution.executedPlan)
      val allow = Explain.scaleLintAllow.getOrElse(name, Map.empty)
      fired(name) = findings.map(_._1).toSet
      findings.filterNot(f => allow.contains(f._1)).foreach { case (k, d) =>
        bad += s"$name: $k($d)"
      }
    }
    assert(bad.isEmpty, s"unjustified scale findings:\n  ${bad.mkString("\n  ")}")
    // entries marked [scale-dependent] only fire above this spec's
    // sf0.001 (memory-sink sizes scale with the events table; the rank
    // kernel's bucket frame with the value range) — staleness is not
    // checkable here, so they are exempt
    val stale = for {
      (name, kinds) <- Explain.scaleLintAllow.toSeq.sortBy(_._1)
      (k, why) <- kinds.toSeq.sortBy(_._1)
      if !why.startsWith("[scale-dependent]") &&
        !fired.getOrElse(name, Set.empty).contains(k)
    } yield s"$name: $k"
    assert(stale.isEmpty,
      s"stale scaleLintAllow entries (justification no longer fires):\n  ${stale.mkString("\n  ")}")
  }
}
