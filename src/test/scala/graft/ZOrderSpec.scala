package graft

import graft.operators.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes a Z-order layout worth its shuffle: row-group
  * stats prune selective scans on BOTH interleaved dimensions, not just
  * a primary sort key.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def scannedRows(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }.sum
  }

  test("z-ordered layout skips row groups on BOTH curve dimensions") {
    val out = ZOrder.zOrderedOrdersPath(spark, sf)
    val zdf = spark.read.parquet(out)
    val total = zdf.count()
    assert(total > 0)
    val byCust = scannedRows(zdf.filter(col("o_custkey") < 100))
    val byDate = scannedRows(zdf.filter(col("o_orderdate") < to_date(lit("1995-06-01"))))
    assert(byCust < total,
      s"customer predicate must skip on the z layout: scan=$byCust total=$total")
    assert(byDate < total,
      s"date predicate must skip on the z layout: scan=$byDate total=$total")
  }

  test("z-value mapping is a bijective interleave of the quantized inputs") {
    val rows = ZOrder.zOrderMap(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val ckq = r.getLong(1); val dyq = r.getLong(2); val z = r.getLong(3)
      assert(ckq >= 0 && ckq < 256 && dyq >= 0 && dyq < 256)
      // de-interleave and compare
      def extract(v: Long, offset: Int): Long =
        (0 until 8).map(i => ((v >> (2 * i + offset)) & 1L) << i).sum
      assert(extract(z, 1) === ckq)
      assert(extract(z, 0) === dyq)
    }
    // sorted ascending by construction
    assert(rows.map(_.getLong(3)).toSeq === rows.map(_.getLong(3)).sorted.toSeq)
  }
}
