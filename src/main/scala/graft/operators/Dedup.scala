package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the training-data-pipeline
  * surface (net-new beyond the reference).
  *
  * Scale design (the point of each shape):
  *  - exact dedup shuffles on a 16-byte content hash, never on raw text;
  *  - MinHash/SimHash candidate generation is the classic
  *    shingle→signature→band→bucket-join: the only shuffle key is a
  *    band hash, so cost is O(n·bands) rows, never O(n²) pairs;
  *  - exact similarity (Jaccard / Hamming) is computed only on
  *    bucket-collision candidates;
  *  - blocked n-gram Jaccard bounds pairwise work by (source, length
  *    bucket) blocks — the fallback when no sketch is acceptable.
  * All plans are pure DataFrame ops (codegen'd); no UDFs, no collect.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 16
  private val Bands = 8 // 2 rows per band

  /** Word 3-gram shingles of the lowercased text. */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("shingles", array_distinct(
        expr("transform(sequence(0, greatest(size(tokens) - 3, 0)), i -> concat_ws(' ', slice(tokens, i + 1, 3)))")))

  /** Exact dedup summary: raw vs normalized distinct counts. */
  def exactStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("text")).as("n_distinct_text"),
      countDistinct(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))).as("n_distinct_norm"))
  }

  /** Exact dedup keeping one representative doc_id per distinct content
    * hash. The group key is md5(text) — a fixed-width shuffle key, which
    * is what survives 100 TB (raw text keys would blow shuffle buffers).
    */
  def exactKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  /** MinHash + LSH near-dup candidates, verified with exact Jaccard.
    *
    * Pipeline: shingle → 16 minhashes (xxhash64 with per-slot seed) →
    * 8 bands of 2 → explode bands → self-join on band hash → distinct
    * candidate pairs → exact Jaccard on shingle sets → top 20.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = shingled(spark, sfDir)
    val sig = docs.select(
      col("doc_id"), col("shingles"),
      array((0 until NumHashes).map(i =>
        expr(s"array_min(transform(shingles, s -> xxhash64($i, s)))")): _*).as("sig"))
    val banded = sig.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map(j =>
        xxhash64(lit(j), expr(s"sig[${2 * j}]"), expr(s"sig[${2 * j + 1}]"))): _*)).as(Seq("band", "bucket")))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sh = docs.select(col("doc_id"), col("shingles"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** SimHash near-dup: 32-bit signature from token hashes, byte-banded
    * candidate join, exact Hamming distance on candidates.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("tokens", array_distinct(split(lower(trim(col("text"))), "\\s+")))
      .withColumn("hashes", expr("transform(tokens, t -> xxhash64(t))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 31), 0L, (acc, i) -> acc +
          | if(aggregate(hashes, 0, (a, h) -> a + if(((h >> i) & 1) = 1, 1, -1)) > 0,
          |    shiftleft(1L, i), 0L))""".stripMargin))
      .select("doc_id", "simhash")
    val banded = docs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        expr(s"(simhash >> ${8 * j}) & 255")): _*)).as(Seq("band", "byte")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .select("doc_a", "doc_b", "hamming")
      .orderBy(col("hamming").asc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Blocked exact n-gram Jaccard: candidate pairs only within
    * (source, length-bucket) blocks — bounds the quadratic term by the
    * largest block, the standard fallback when sketches are ruled out.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = shingled(spark, sfDir)
      .select(col("doc_id"), col("source"), col("shingles"),
        (col("n_chars") / 64).cast("long").as("len_bucket"))
    docs.as("a")
      .join(docs.as("b"),
        col("a.source") === col("b.source") &&
          col("a.len_bucket") === col("b.len_bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
          size(array_union(col("a.shingles"), col("b.shingles"))), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  val registry: Map[String, Q] = Map(
    "x_dedup_exact" -> exactStats _,
    "x_dedup_exact_keep" -> exactKeep _,
    "x_dedup_minhash" -> minhashLsh _,
    "x_dedup_simhash" -> simhash _,
    "x_dedup_ngram_jaccard" -> ngramJaccard _,
  )

  /** MinHash/SimHash use Spark-specific xxhash64 — no SQL oracle exists;
    * the driver records rows-only checks for those.
    */
  val oracles: Map[String, String] = Map(
    "x_dedup_exact" ->
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct_text,
        | count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_distinct_norm
        |FROM documents""".stripMargin,
    "x_dedup_exact_keep" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
  )
}
