package graft

import graft.sources.BenchRunners

/** Full-scale benchmark driver (G2: the reference's main() sweeps,
  * src/metadata_benchmark.cc:232-288, src/data_read_benchmark.cc:137-156,
  * src/compression_benchmark.cc:103-121). Produces the reference's four
  * CSV families with identical column names (K2 sinks).
  *
  * Usage: runMain graft.BenchmarkSuite [outDir] [scale]
  *   scale = "full" reproduces the reference grids (cols up to 10000 —
  *   minutes of runtime); default "small" is a quick sweep.
  */
object BenchmarkSuite {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0)
      else s"${System.getProperty("user.dir")}/target/bench-results"
    val scale = if (args.length > 1) args(1) else "small"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val work = s"$outDir/files"

    val (metaCols, readCols, rgCols, rows) = scale match {
      // reference grids: src/metadata_benchmark.cc:233 (10..10000 cols),
      // src/data_read_benchmark.cc:138-139 (10..1000 cols × 100k rows),
      // src/metadata_benchmark.cc:269-281 (rg/page grid)
      case "full" => (Seq(10, 100, 1000, 10000), Seq(10, 100, 1000), Seq(10, 100, 1000), 100000L)
      case _      => (Seq(10, 100), Seq(10, 100), Seq(10), 20000L)
    }

    def sink(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/$name")
      println(s"[suite] wrote $outDir/$name")
    }

    BenchRunners.warmupFooterPath(spark, work)
    sink(BenchRunners.chunksAndPagesBenchmark(spark, metaCols, 10000L, work),
      "benchmark_chunks_and_pages")
    sink(BenchRunners.statsBenchmark(spark, metaCols, 10000L, work),
      "benchmark_stats")
    sink(BenchRunners.dataReadBenchmark(spark, readCols, rows, work),
      "data_read_benchmark")
    sink(BenchRunners.compressionBenchmark(spark, readCols, 10000L, work),
      "compression_benchmark")
    sink(BenchRunners.rowGroupGrid(spark, rgCols, 10000,
      Seq(1000, 2000, 5000, 10000), Seq(8 * 1024, 64 * 1024, 1024 * 1024, 8 * 1024 * 1024),
      work), "benchmark_rowgroup")
    sink(BenchRunners.pushdownBenchmark(spark, if (scale == "full") 10000000L else 1000000L, work),
      "pushdown_benchmark")
    spark.stop()
  }
}
