package graft

import graft.functions.ThetaSketch
import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta-sketch set algebra: exactness below nominal entries,
  * partition-insensitivity of the aggregate, and the retention
  * identities. Cross-engine value parity is the driver gate's job
  * (a13 carries a full DuckDB oracle).
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("retention table satisfies the set-algebra identities and matches exact joins") {
    val rows = Analytics.a13RetentionSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: dau != retained + churned")
    }
    // exact recompute of one pair via joins
    val ev = Tables.events(spark, sf)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id")).distinct()
    val first = rows.head
    val dayUsers = ev.filter(col("day") === first.getString(0))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    val nextDay = days(days.indexOf(first.getString(0)) + 1)
    val nextUsers = ev.filter(col("day") === nextDay)
      .withColumnRenamed("user_id", "u2")
    val exactRetained = dayUsers
      .join(nextUsers, col("user_id") === col("u2")).count()
    assert(first.getLong(2) === exactRetained,
      s"sketch retained ${first.getLong(2)} vs exact $exactRetained")
  }

  test("windowed sketch union yields the exact monotone cumulative-users series") {
    val rows = Analytics.w11CumulativeUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "cumulative distinct must be nondecreasing")
    val total = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cums.last === total,
      "final cumulative point must equal the exact whole-corpus distinct")
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2),
      s"${r.getString(0)}: day_users must not exceed cumulative"))
  }

  test("sketch aggregation is partition-insensitive (same compact state any layout)") {
    val ev = Tables.events(spark, sf).select("user_id")
    def est(parts: Int): Long =
      ev.repartition(parts)
        .agg(ThetaSketch.estimate(ThetaSketch.sketchAgg(col("user_id"))).as("e"))
        .head().getLong(0)
    val e1 = est(1)
    assert(e1 === est(7))
    val exact = ev.distinct().count()
    assert(e1 === exact, s"exact-mode sketch must equal true cardinality: $e1 vs $exact")
  }
}
