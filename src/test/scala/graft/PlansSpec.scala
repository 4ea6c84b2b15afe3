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

  test("scale-mode rewrite preserves the result type for non-double percentile children") {
    spark.experimental.extraOptimizations = Seq(ScaleModeRewrite)
    try {
      spark.conf.set("spark.graft.scaleMode", "true")
      // integer column: exact percentile is DoubleType, the approx twin
      // would be LongType without the cast guard — the rewritten plan
      // must keep the analyzed schema AND still execute
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr("percentile(l_orderkey, 0.5) as p50")
      assert(df.schema("p50").dataType === org.apache.spark.sql.types.DoubleType)
      val exprs = df.queryExecution.optimizedPlan.flatMap(_.expressions)
      assert(exprs.exists(_.exists(_.isInstanceOf[ApproximatePercentile])),
        "int-column percentile must still be rewritten under scaleMode")
      val optimizedTypes = df.queryExecution.optimizedPlan.output.map(_.dataType)
      assert(optimizedTypes === Seq(org.apache.spark.sql.types.DoubleType),
        s"rewrite changed the plan's result type: $optimizedTypes")
      val v = df.collect()(0).getDouble(0)
      assert(v > 0.0, "median orderkey must be positive")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.graft.scaleMode", "false")
    }
  }
}
