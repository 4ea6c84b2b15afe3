package graft

import graft.functions.FreqSketch
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-items sketches: exact-regime equality with the true
  * group-by counts, partition/merge-order insensitivity, and the
  * bounded-memory purge guarantee past the exact regime. Cross-engine
  * value parity is the driver gate's job (x_text_heavy_hitters
  * carries a full DuckDB oracle).
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("exact-regime top-20 equals the true pair counts, any partitioning") {
    val exact = TextOps.bpePairs(spark, sf).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sk = TextOps.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sk === exact, "sketch top-20 must equal the exact group-by in exact mode")

    // same answer when the input lands in a different partition layout
    // (merge order and per-task slices differ; counters are additive)
    val pairs = Tables.documents(spark, sf)
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")).as("pair"))
    def top(parts: Int): Seq[(String, Long)] =
      pairs.repartition(parts)
        .agg(FreqSketch.topK(FreqSketch.sketchAgg(col("pair")), 20).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.token"), col("h.est"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top(1) === top(13))
  }

  test("past the exact regime the sketch keeps the no-false-negative guarantee") {
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    // 8-slot map, 1000 distinct items, one planted heavy hitter
    val sk = new ItemsSketch[String](8)
    (1 to 1000).foreach(i => sk.update(s"item$i"))
    (1 to 500).foreach(_ => sk.update("heavy"))
    assert(sk.getMaximumError > 0, "purges must have fired")
    val reported = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).map(_.getItem)
    assert(reported.contains("heavy"),
      "an item above the N*3.5/maxMapSize band must always be reported")
    assert(math.abs(sk.getEstimate("heavy") - 500) <= sk.getMaximumError,
      "estimate must sit inside the guaranteed error band")
  }
}
