package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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

  /** Field-ID fixture (k15): columns carrying explicit Parquet field
    * IDs — the identity a column keeps across RENAMES in every
    * field-id-resolved table format (Iceberg/Delta column mapping).
    * parquet-mr sets them via `Types...id(n)`; one column deliberately
    * has none (the -1 sentinel path). Spark's writer only emits IDs
    * from struct-field metadata, so the fixture goes through the
    * example API like [[writeLogicalTypesFixture]].
    */
  def writeFieldIdFixture(conf: Configuration, file: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.Types
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.ParquetFileWriter

    val schema = Types.buildMessage()
      .required(INT64).id(1).named("order_key")
      .required(BINARY).id(2).named("status")
      .required(DOUBLE).id(100).named("total")
      .required(INT32).named("no_id")
      .named("fieldids")
    val writeConf = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, writeConf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new Path(file), writeConf))
      .withConf(writeConf)
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try {
      (0 until 3).foreach { i =>
        writer.write(factory.newGroup()
          .append("order_key", 1000L + i)
          .append("status", Binary.fromString(if (i % 2 == 0) "O" else "F"))
          .append("total", 10.5 * (i + 1))
          .append("no_id", i))
      }
    } finally writer.close()
  }

  /** Typed fixture covering the full Parquet logical-type annotation
    * system the reference's metadata plane models
    * (src/flatbuff_ns.fbs:77-114: DecimalType{precision,scale},
    * TimestampType{utc,unit}, IntType{bit_width,signed}, UUID, JSON,
    * BSON, Date, Time, String, Enum). Spark's writer cannot emit
    * UUID/JSON/BSON/ENUM or non-default int widths, so the fixture goes
    * through parquet-mr's example API directly — schema built with
    * `Types.buildMessage().as(LogicalTypeAnnotation...)`, rows via
    * `SimpleGroupFactory`. Deterministic content; write-once (the
    * caller gates on file existence). The file is what
    * [[FooterMeta.logicalTypes]] and DuckDB's `parquet_schema()` both
    * decode independently for the k14 census.
    */
  def writeLogicalTypesFixture(conf: Configuration, file: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.ParquetFileWriter

    val schema = Types.buildMessage()
      .required(INT32).as(LTA.decimalType(2, 9)).named("d_i32")
      .required(INT64).as(LTA.decimalType(4, 18)).named("d_i64")
      .required(FIXED_LEN_BYTE_ARRAY).length(16).as(LTA.decimalType(10, 38)).named("d_flba")
      .required(INT64).as(LTA.timestampType(true, LTA.TimeUnit.MILLIS)).named("ts_ms_utc")
      .required(INT64).as(LTA.timestampType(false, LTA.TimeUnit.MICROS)).named("ts_us_local")
      .required(INT64).as(LTA.timestampType(true, LTA.TimeUnit.NANOS)).named("ts_ns_utc")
      .required(INT32).as(LTA.dateType()).named("dt")
      .required(INT32).as(LTA.timeType(true, LTA.TimeUnit.MILLIS)).named("t_ms")
      .required(FIXED_LEN_BYTE_ARRAY).length(16).as(LTA.uuidType()).named("uid")
      .required(BINARY).as(LTA.jsonType()).named("js")
      // BSON deliberately absent: DuckDB's parquet reader rejects
      // converted type 20 ("Unsupported converted type"), which would
      // break the cross-engine oracle. The census DOES decode BSON
      // (FooterMeta.logicalTypes match arm); SourcesSpec pins it on a
      // spec-only file that no oracle reads.
      .required(INT32).as(LTA.intType(8, true)).named("i8")
      .required(INT32).as(LTA.intType(16, false)).named("u16")
      .required(INT64).as(LTA.intType(64, false)).named("u64")
      .required(BINARY).as(LTA.stringType()).named("s")
      .required(BINARY).as(LTA.enumType()).named("en")
      .required(FLOAT).named("f32")
      .required(BINARY).named("raw")
      .named("typed")

    val writeConf = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, writeConf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new Path(file), writeConf))
      .withConf(writeConf)
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try {
      (0 until 4).foreach { i =>
        val g = factory.newGroup()
        g.add("d_i32", 123456 + i)
        g.add("d_i64", 9876543210L + i)
        g.add("d_flba", Binary.fromConstantByteArray(
          Array.tabulate[Byte](16)(j => ((i * 16 + j) % 127).toByte)))
        g.add("ts_ms_utc", 1700000000000L + i * 1000L)
        g.add("ts_us_local", 1700000000000000L + i * 1000000L)
        g.add("ts_ns_utc", 1700000000000000000L + i * 1000000000L)
        g.add("dt", 19700 + i)
        g.add("t_ms", 3600000 * (i + 1))
        g.add("uid", Binary.fromConstantByteArray(
          Array.tabulate[Byte](16)(j => ((i * 31 + j * 7) % 127).toByte)))
        g.add("js", Binary.fromString(s"""{"k":$i}"""))
        g.add("i8", i - 2)
        g.add("u16", 60000 + i)
        g.add("u64", Long.MaxValue - i)
        g.add("s", Binary.fromString(s"row-$i"))
        g.add("en", Binary.fromString(if (i % 2 == 0) "RED" else "BLUE"))
        g.add("f32", i * 1.5f)
        g.add("raw", Binary.fromConstantByteArray(Array[Byte](i.toByte, 42)))
        writer.write(g)
      }
    } finally writer.close()
  }
}
