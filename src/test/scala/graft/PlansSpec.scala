package graft

import graft.operators.Analytics
import graft.plans.ScaleModeRewrite
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
import org.scalatest.funsuite.AnyFunSuite

class PlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("scale-mode rule rewrites exact percentile to the bounded-memory sketch") {
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      val scaled = Analytics.a4DistributionSummary(spark, sf)
      val exprs = scaled.queryExecution.optimizedPlan.flatMap(_.expressions)
      assert(exprs.exists(_.exists(_.isInstanceOf[ApproximatePercentile])),
        "scaleMode=true must rewrite percentile → approx_percentile")
      assert(!exprs.exists(_.exists(_.isInstanceOf[Percentile])),
        "no exact percentile may survive the rewrite")
      val approx = scaled.collect()

      spark.conf.set("spark.graft.scaleMode", "false")
      val exact = Analytics.a4DistributionSummary(spark, sf)
      assert(exact.queryExecution.optimizedPlan.flatMap(_.expressions)
        .exists(_.exists(_.isInstanceOf[Percentile])),
        "flag off must leave the exact percentile untouched")
      // approx_percentile is nearest-rank (an actual data value) while
      // exact percentile interpolates: quartiles agree to within the
      // local inter-value gap; min/max are exact either way
      val exactRows = exact.collect()
      assert(approx.map(_.getString(0)).toSeq === exactRows.map(_.getString(0)).toSeq)
      for ((a, e) <- approx.zip(exactRows); i <- 1 to 3)
        assert(math.abs(a.getDouble(i) - e.getDouble(i)) < 1.0,
          s"quartile $i drifted: ${a.getDouble(i)} vs ${e.getDouble(i)}")
      for ((a, e) <- approx.zip(exactRows); i <- 4 to 5)
        assert(a.getDouble(i) === e.getDouble(i), "min/max must be exact")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }
}
