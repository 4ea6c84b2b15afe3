package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * STUB — `FakeCodec.decode` derives deterministic dimensions from a
  * hash of the bytes (clearly marked below). Everything around it is
  * the real engine surface: binary column schema, typed Dataset
  * mapPartitions (the JVM analog of batched pandas-UDF processing —
  * one codec init per partition, streaming iteration, no collect),
  * and downstream relational ops on the extracted features.
  *
  * Scale: decode is per-row CPU work with per-partition setup — the
  * classic mapPartitions shape; binary payloads never shuffle (features
  * are projected out before any wide operator).
  */
object Multimodal {

  /** Typed metadata extracted from a media blob. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB codec — stands in for a real image/audio decoder, which this
    * container does not ship. Deterministic: dimensions derive from
    * MurmurHash3 of the payload, so results are stable across runs and
    * engines-independent.
    */
  private object FakeCodec {
    def decode(format: String, bytes: Array[Byte]): (Int, Int, Int) = {
      val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
      val w = 64 + math.floorMod(h, 1856)            // 64..1919
      val ht = 64 + math.floorMod(h >> 11, 1016)     // 64..1079
      val frames = if (format == "video") 1 + math.floorMod(h >> 21, 240) else 1
      (w, ht, frames)
    }
  }

  /** Media table: documents' text re-encoded as the opaque binary
    * payload (the stand-in corpus), with a format tag derived from the
    * source id.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** Feature extraction: batched per-partition decode into typed rows. */
  def extractFeatures(spark: SparkSession, sfDir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select("doc_id", "format", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition codec init would go here (one per task, not per row)
        batch.map { case (id, fmt, bytes) =>
          val (w, h, f) = FakeCodec.decode(fmt, bytes)
          MediaMeta(id, fmt, bytes.length.toLong, w, h, f)
        }
      }
  }

  /** Registered query: per-format feature rollup (deterministic — the
    * stub codec is hash-based). No SQL oracle (JVM hash) → rows-only.
    */
  def featureRollup(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, sfDir)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"),
        max("n_frames").as("max_frames"))
      .orderBy("format")

  /** Byte-level stats on the binary column — SQL-expressible, so it
    * carries an oracle (octet_length on the original text equals the
    * UTF-8 payload size).
    */
  def byteStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_media"),
        sum(octet_length(col("media"))).as("total_bytes"),
        min(octet_length(col("media"))).as("min_bytes"),
        max(octet_length(col("media"))).as("max_bytes"))
      .orderBy("format")

  type Q = (SparkSession, String) => DataFrame

  val registry: Map[String, Q] = Map(
    "x_multimodal_features" -> featureRollup _,
    "x_multimodal_bytes" -> byteStats _,
  )

  val oracles: Map[String, String] = Map(
    "x_multimodal_bytes" ->
      """SELECT format, count(*) AS n_media,
        | sum(strlen(text))::BIGINT AS total_bytes,
        | min(strlen(text)) AS min_bytes,
        | max(strlen(text)) AS max_bytes
        |FROM (SELECT text, ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS format
        |      FROM documents)
        |GROUP BY format ORDER BY format""".stripMargin,
  )
}
