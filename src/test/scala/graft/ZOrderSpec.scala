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

  test("hilbert mapping is a seamless bijection over the full 256x256 grid") {
    import org.apache.spark.sql.functions._
    // every (x, y) point of the curve's domain, mapped in one pass
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("gx"), (col("id") / 256).cast("bigint").as("gy"))
    val d = graft.operators.ZOrder.hilbertMapped(grid, "gx", "gy")
      .select(col("gx"), col("gy"), col("hval"))
    d.cache()
    try {
      // bijection: 65536 DISTINCT d-values covering exactly [0, 65535]
      val stats = d.agg(countDistinct("hval"), min("hval"), max("hval")).head
      assert(stats.getLong(0) === 65536L, "d-values must be distinct")
      assert(stats.getLong(1) === 0L && stats.getLong(2) === 65535L)
      // NO SEAMS: consecutive d-values are xy-adjacent (manhattan
      // distance exactly 1) — the property the Z-curve lacks and the
      // reason liquid clustering uses Hilbert
      val a = d.select(col("hval").as("d0"), col("gx").as("x0"), col("gy").as("y0"))
      val b = d.select((col("hval") - 1).as("d0"), col("gx").as("x1"), col("gy").as("y1"))
      val seams = a.join(b, "d0")
        .filter(abs(col("x1") - col("x0")) + abs(col("y1") - col("y0")) =!= 1)
        .count()
      assert(seams === 0L, s"hilbert must have zero seams, found $seams")
      // contrast: the Z-curve HAS seams on the same grid (sanity that
      // the test can fail) — at least every 2x2 block boundary jumps
      val z = grid.withColumn("ckq", col("gx")).withColumn("dyq", col("gy"))
        .withColumn("zval", expr(
          (0 until 8).map { i =>
            s"shiftleft(shiftright(ckq, $i) & 1, ${2 * i + 1}) | shiftleft(shiftright(dyq, $i) & 1, ${2 * i})"
          }.mkString(" | ")))
        .select(col("zval"), col("gx"), col("gy"))
      val za = z.select(col("zval").as("d0"), col("gx").as("x0"), col("gy").as("y0"))
      val zb = z.select((col("zval") - 1).as("d0"), col("gx").as("x1"), col("gy").as("y1"))
      val zSeams = za.join(zb, "d0")
        .filter(abs(col("x1") - col("x0")) + abs(col("y1") - col("y0")) =!= 1)
        .count()
      assert(zSeams > 0L, "the z-curve must show seams on the same grid")
      // the NATIVE codegen expression is bit-identical to the 8-step
      // expression fold (the DuckDB oracle's formulation) on the FULL
      // domain — the (b)-route claim
      val fold = graft.operators.ZOrder.hilbertMappedFold(grid, "gx", "gy")
        .select(col("gx"), col("gy"), col("hval").as("fval"))
      val drift = d.join(fold, Seq("gx", "gy"))
        .filter(col("hval") =!= col("fval")).count()
      assert(drift === 0L, s"native hilbert_d drifted from the fold on $drift points")
    } finally d.unpersist()
  }
}
