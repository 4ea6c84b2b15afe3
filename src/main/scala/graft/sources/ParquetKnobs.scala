package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet sink with writer knobs (K1: src/data_generator.cc:32-52,
  * src/metadata_benchmark.cc:132-148, src/compression_benchmark.cc:52-64):
  * codec, row-group size, page size, dictionary encoding, statistics
  * level.
  *
  * StatsLevel mapping (reference src/data_generator.h:5-9 has
  * {NONE, CHUNK, PAGE}): NONE maps exactly —
  * `parquet.column.statistics.enabled=false` suppresses all min/max
  * AND the column index (verified via footer has_min_max and
  * readColumnIndex==null, pinned by the m7_page_index oracle). CHUNK
  * has no independent switch in parquet-mr, but its GRANULARITY is
  * expressible: `parquet.page.row.count.limit` sized to one page per
  * chunk collapses the column index to one entry per chunk — page
  * stats at chunk granularity — while a small limit yields a true
  * per-page index. [[graft.operators.BenchOps.m7PageIndex]] pins the
  * full three-way ladder cross-engine; the requested level is recorded
  * in result rows here.
  */
object ParquetKnobs {

  /** Writer configuration mirroring the reference's sweep axes
    * (FIXTURES.md §A). rowGroupBytes maps parquet.block.size; the
    * reference's row-group *row counts* (1000..10000) are expressed by
    * sizing bytes ≈ rows × cols × 4B. statsLevel: 0=NONE 1=CHUNK 2=PAGE.
    */
  final case class WriteConfig(
      codec: String = "snappy",
      rowGroupBytes: Long = 128L * 1024 * 1024,
      pageBytes: Int = 1024 * 1024,
      dictionary: Boolean = true,
      statsLevel: Int = 2)

  /** Byte size that yields ~`rows` rows per row group for an
    * all-float32 table of `cols` columns.
    */
  def rowGroupBytesFor(rows: Int, cols: Int): Long =
    math.max(64L * 1024, rows.toLong * cols * 4)

  def write(df: DataFrame, path: String, cfg: WriteConfig): Unit =
    df.write
      .mode("overwrite")
      .option("compression", cfg.codec)
      .option("parquet.block.size", cfg.rowGroupBytes.toString)
      .option("parquet.page.size", cfg.pageBytes.toString)
      .option("parquet.enable.dictionary", cfg.dictionary.toString)
      .option("parquet.column.statistics.enabled", (cfg.statsLevel > 0).toString)
      .parquet(path)

  /** The reference's codec sweep list (src/compression_benchmark.cc:12-18)
    * plus lz4_raw (the parquet-spec LZ4 framing — hadoop-framed "lz4" is
    * deprecated in the spec and unreadable by second engines, so the
    * net-new sweep member uses the interoperable codec). Brotli needs an
    * external codec jar; [[codecAvailable]] detects it at runtime and
    * the sweep emits a skipped-row marker for unavailable codecs
    * (SURVEY §7.4) so results are self-describing — this container has
    * no brotli JVM codec anywhere on disk and no egress, so the
    * degradation is permanent here and the marker row documents it.
    */
  val allCodecs: Seq[String] = Seq("uncompressed", "snappy", "gzip", "brotli", "zstd", "lz4_raw")

  def codecAvailable(codec: String): Boolean = codec match {
    case "brotli" =>
      try { Class.forName("org.apache.hadoop.io.compress.BrotliCodec"); true }
      catch { case _: Throwable => false }
    case _ => true
  }

  /** Codecs usable in this build (writer paths that must not fail). */
  val codecs: Seq[String] = allCodecs.filter(codecAvailable)
}
