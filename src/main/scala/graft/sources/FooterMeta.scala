package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.jdk.CollectionConverters._

/** Parquet footer metadata exposed as queryable Datasets (S4/S5:
  * src/metadata_benchmark.cc:13-79, src/arrow_benchmarks.cc:9-26) — the
  * reference's "metadata is data" capability, Spark-first.
  *
  * Footer decode runs *distributed*: file paths go through a Dataset and
  * each partition opens its own ParquetFileReader, so a 100 TB lake with
  * millions of files fans out across executors instead of hammering the
  * driver. Timings per file mirror the reference's two-stage measurement
  * (Thrift decode = open+footer, schema build = schema traversal).
  */
object FooterMeta {

  /** One row per parquet file footer (S4). */
  final case class FileMetaRow(
      path: String,
      num_row_groups: Int,
      num_columns: Int,
      num_rows: Long,
      file_bytes: Long,
      created_by: String,
      footer_decode_us: Double,
      schema_build_us: Double)

  /** One row per leaf column with its logical-type annotation (the
    * reference's full type-system surface, src/flatbuff_ns.fbs:77-114).
    * Sentinels (-1 / "na") instead of nulls so cross-engine hashing is
    * exact: precision/scale/bit_width = -1, unit = "na", utc/signed
    * tri-state -1/0/1.
    */
  final case class LogicalTypeRow(
      file: String,
      column: String,
      physical: String,
      type_length: Int,
      logical: String,
      precision: Int,
      scale: Int,
      unit: String,
      utc: Int,
      bit_width: Int,
      signed: Int)

  /** One row per (row group × column chunk) with statistics (S5). */
  final case class ChunkStatRow(
      path: String,
      row_group: Int,
      column: String,
      codec: String,
      compressed_bytes: Long,
      uncompressed_bytes: Long,
      num_values: Long,
      has_min_max: Boolean,
      null_count: Long,
      encodings: String,
      dict_encoded: Boolean)

  /** Expand a path (file or directory of part files) to parquet files. */
  def parquetFiles(conf: Configuration, p: String): Seq[String] = {
    val path = new Path(p)
    val fs = path.getFileSystem(conf)
    val st = fs.getFileStatus(path)
    if (st.isDirectory)
      fs.listStatus(path).toSeq
        .filter(s => s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    else Seq(p)
  }

  /** S4 — footer-only scan with decode timings, one row per file. */
  def fileMeta(spark: SparkSession, paths: Seq[String]): Dataset[FileMetaRow] = {
    import spark.implicits._
    val files = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.flatMap(parquetFiles(conf, _))
    }
    // session conf serialized to executors — a fresh Configuration() would
    // drop s3a/hdfs credentials on a real deployment (SessionConf scaladoc)
    val confEntries = SessionConf.entries(spark)
    spark.createDataset(files).mapPartitions { iter =>
      val conf = SessionConf.build(confEntries)
      iter.map { f =>
        val t0 = System.nanoTime()
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        val footer = reader.getFooter
        val t1 = System.nanoTime()
        try {
          val schema = footer.getFileMetaData.getSchema
          // schema build stage (GetSchema analog): touch every leaf field
          val cols = schema.getColumns.asScala.map(_.getPrimitiveType.getName).size
          val t2 = System.nanoTime()
          FileMetaRow(
            path = f,
            num_row_groups = footer.getBlocks.size(),
            num_columns = cols,
            num_rows = footer.getBlocks.asScala.map(_.getRowCount).sum,
            file_bytes = new Path(f).getFileSystem(conf).getFileStatus(new Path(f)).getLen,
            created_by = footer.getFileMetaData.getCreatedBy,
            footer_decode_us = (t1 - t0) / 1e3,
            schema_build_us = (t2 - t1) / 1e3)
        } finally reader.close()
      }
    }
  }

  /** S5 — column-chunk statistics scan, one row per (row group, chunk). */
  def chunkStats(spark: SparkSession, paths: Seq[String]): Dataset[ChunkStatRow] = {
    import spark.implicits._
    val files = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.flatMap(parquetFiles(conf, _))
    }
    val confEntries = SessionConf.entries(spark)
    spark.createDataset(files).mapPartitions { iter =>
      val conf = SessionConf.build(confEntries)
      iter.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try {
          val footer = reader.getFooter
          footer.getBlocks.asScala.zipWithIndex.flatMap { case (block, rg) =>
            block.getColumns.asScala.map { chunk =>
              val stats = chunk.getStatistics
              ChunkStatRow(
                path = f,
                row_group = rg,
                column = chunk.getPath.toDotString,
                codec = chunk.getCodec.toString,
                compressed_bytes = chunk.getTotalSize,
                uncompressed_bytes = chunk.getTotalUncompressedSize,
                num_values = chunk.getValueCount,
                has_min_max = stats != null && stats.hasNonNullValue,
                null_count = if (stats == null) -1L else stats.getNumNulls,
                encodings = chunk.getEncodings.asScala.map(_.toString).toSeq.sorted.mkString("|"),
                dict_encoded = chunk.getEncodings.asScala.exists(e =>
                  e.toString.contains("DICTIONARY")))
            }
          }.toList
        } finally reader.close()
      }
    }
  }

  /** One row per row group with the typed min/max of one INT64 column —
    * the exact inputs min/max pruning consults, surfaced for
    * clustering-effectiveness analysis (x_layout_skipping).
    */
  final case class ChunkRangeRow(
      path: String,
      row_group: Int,
      min_v: Long,
      max_v: Long,
      num_rows: Long)

  /** Typed row-group ranges of `column` (must be a statistics-bearing
    * INT64 leaf). Same distributed fan-out as [[fileMeta]].
    */
  def chunkRangesLong(
      spark: SparkSession, paths: Seq[String], column: String): Dataset[ChunkRangeRow] = {
    import spark.implicits._
    val files = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.flatMap(parquetFiles(conf, _))
    }
    val confEntries = SessionConf.entries(spark)
    spark.createDataset(files).mapPartitions { iter =>
      val conf = SessionConf.build(confEntries)
      iter.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try {
          reader.getFooter.getBlocks.asScala.zipWithIndex.map { case (block, rg) =>
            val chunk = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(throw new IllegalArgumentException(
                s"column $column not found in $f"))
            chunk.getStatistics match {
              case s: org.apache.parquet.column.statistics.LongStatistics
                  if s.hasNonNullValue =>
                ChunkRangeRow(f, rg, s.getMin, s.getMax, block.getRowCount)
              case other => throw new IllegalArgumentException(
                s"column $column in $f has no usable INT64 statistics: $other")
            }
          }.toList
        } finally reader.close()
      }
    }
  }

  /** One row per leaf column with its Parquet field ID (K15) — the
    * rename-stable column identity every field-id-resolved table
    * format (Iceberg/Delta column mapping) keys on. -1 = no ID.
    */
  final case class FieldIdRow(file: String, column: String, field_id: Int)

  /** Field-ID census of `paths` (same distributed fan-out as
    * [[fileMeta]]).
    */
  def fieldIds(spark: SparkSession, paths: Seq[String]): Dataset[FieldIdRow] = {
    import spark.implicits._
    val files = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.flatMap(parquetFiles(conf, _))
    }
    val confEntries = SessionConf.entries(spark)
    spark.createDataset(files).mapPartitions { iter =>
      val conf = SessionConf.build(confEntries)
      iter.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try {
          val fileName = f.substring(f.lastIndexOf('/') + 1)
          reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.map { cd =>
            val id = cd.getPrimitiveType.getId
            FieldIdRow(fileName, cd.getPath.mkString("."),
              if (id == null) -1 else id.intValue())
          }.toList
        } finally reader.close()
      }
    }
  }

  /** K14 — logical-type annotation census, one row per leaf column.
    * Decodes `LogicalTypeAnnotation` off each footer's schema
    * (distributed, same fan-out shape as [[fileMeta]]); DuckDB's
    * `parquet_schema()` re-derives every field independently for the
    * oracle. Normalization matches src/flatbuff_ns.fbs:77-114:
    * DECIMAL(precision,scale), TIMESTAMP/TIME{unit,utc}, INT{bit_width,
    * signed}, DATE, UUID, JSON, BSON, STRING, ENUM, NONE.
    */
  def logicalTypes(spark: SparkSession, paths: Seq[String]): Dataset[LogicalTypeRow] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import spark.implicits._
    val files = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.flatMap(parquetFiles(conf, _))
    }
    val confEntries = SessionConf.entries(spark)
    spark.createDataset(files).mapPartitions { iter =>
      val conf = SessionConf.build(confEntries)
      iter.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          val fileName = f.substring(f.lastIndexOf('/') + 1)
          schema.getColumns.asScala.map { cd =>
            val pt = cd.getPrimitiveType
            // parquet-mr's enum says BINARY; the format spec (and every
            // second engine, DuckDB included) says BYTE_ARRAY
            val physicalName = pt.getPrimitiveTypeName.toString match {
              case "BINARY" => "BYTE_ARRAY"
              case x => x
            }
            val base = LogicalTypeRow(
              file = fileName,
              column = cd.getPath.mkString("."),
              physical = physicalName,
              type_length = math.max(0, pt.getTypeLength),
              logical = "NONE", precision = -1, scale = -1,
              unit = "na", utc = -1, bit_width = -1, signed = -1)
            pt.getLogicalTypeAnnotation match {
              case null => base
              case d: DecimalLogicalTypeAnnotation =>
                base.copy(logical = "DECIMAL",
                  precision = d.getPrecision, scale = d.getScale)
              case t: TimestampLogicalTypeAnnotation =>
                base.copy(logical = "TIMESTAMP", unit = t.getUnit.toString,
                  utc = if (t.isAdjustedToUTC) 1 else 0)
              case t: TimeLogicalTypeAnnotation =>
                base.copy(logical = "TIME", unit = t.getUnit.toString,
                  utc = if (t.isAdjustedToUTC) 1 else 0)
              case i: IntLogicalTypeAnnotation =>
                base.copy(logical = "INT", bit_width = i.getBitWidth,
                  signed = if (i.isSigned) 1 else 0)
              case _: DateLogicalTypeAnnotation => base.copy(logical = "DATE")
              case _: UUIDLogicalTypeAnnotation => base.copy(logical = "UUID")
              case _: JsonLogicalTypeAnnotation => base.copy(logical = "JSON")
              case _: BsonLogicalTypeAnnotation => base.copy(logical = "BSON")
              case _: StringLogicalTypeAnnotation => base.copy(logical = "STRING")
              case _: EnumLogicalTypeAnnotation => base.copy(logical = "ENUM")
              case other: LogicalTypeAnnotation =>
                base.copy(logical = other.toString)
            }
          }.toList
        } finally reader.close()
      }
    }
  }
}
