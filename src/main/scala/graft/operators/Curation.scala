package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the selection half of a training-data
  * pipeline (net-new surface beyond the reference, which stops at
  * benchmark analytics): stratified sampling, mixture (quota) selection,
  * context-window sequence packing, and CDC-style upsert merge.
  *
  * Determinism discipline: every sampling/ordering decision derives from
  * a 60-bit md5-based hash of the row key (the same construction as
  * [[Dedup]]'s minhash base hash — `conv(substr(md5(k),1,15),16,10)`,
  * mirrored in DuckDB as `('0x'||substr(md5(k),1,15))::BIGINT`), never
  * from `rand()` or partition order. That buys three things at once:
  *  - exact reproducibility across retries, executors and engine
  *    versions (a re-run of a failed 100 TB stage selects the same rows);
  *  - full DuckDB hash-match oracles for operators that are usually
  *    "approximately right by eyeball" in production pipelines;
  *  - selection can be pushed into a scan filter (it is a pure
  *    projection predicate), so sampling never shuffles the corpus.
  *
  * Scale notes per operator are on each method.
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  /** 60-bit md5-derived hash of an expression (Spark side). */
  private def h60(e: String): Column =
    expr(s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)")

  /** DuckDB twin of [[h60]]. */
  private def h60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  // ---------------------------------------------------------------- //
  // Stratified sampling
  // ---------------------------------------------------------------- //

  /** Per-stratum deterministic sampling: source `srcN` keeps a doc iff
    * `h(doc_id) mod 1e6 < (N+1)·50000` — i.e. src0 samples 5%, src9
    * 50%, src19 everything. The rate ladder stands in for the
    * per-source quality priors a real corpus mix assigns (sample
    * common crawl thin, books thick).
    *
    * Scale: the sample decision is a pure per-row predicate — it pushes
    * to the scan, selects the same rows on any cluster size or retry,
    * and the only shuffle is the 10-row summary aggregate (map-side
    * combined). This is how a 100 TB corpus is subsampled in one pass
    * with no coordination; contrast `TABLESAMPLE`/`rand()`, which are
    * neither reproducible nor pushdown-friendly.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val sampled = h60("cast(doc_id as string)") % 1000000L <
      (expr("cast(substr(source, 4) as int)") + 1) * 50000L
    Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
        sum(when(sampled, col("doc_id"))).as("sampled_id_sum"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- //
  // Mixture / quota selection
  // ---------------------------------------------------------------- //

  private val MixBudget = 300L // docs in the mixed corpus
  // weight 20-N for srcN (src0..src19): earlier sources count for more
  // of the mix — Σ(20-N) = 210
  private val MixWeightSum = 210L

  /** Data mixing with per-source quotas: rank every doc inside its
    * source by the doc-id hash (a deterministic shuffle) and keep the
    * first `budget · w_i / Σw` of each — the "sample data mixture to
    * target proportions" step of corpus assembly.
    *
    * Scale: rank-by-hash inside a stratum is a per-stratum sort at toy
    * scale; at 100 TB the identical selection is computed WITHOUT a
    * sort by thresholding the hash at the quota quantile (quota/n_i ·
    * 2^60, or an `approx_percentile` of the hash for exact budgets) —
    * the hash ordering makes rank and threshold interchangeable, which
    * is the point of ranking on a hash instead of on content.
    */
  def mixSources(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .withColumn("quota", expr(s"($MixBudget * (20 - cast(substr(source, 4) as bigint))) div $MixWeightSum"))
      .filter(col("rk") <= col("quota"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_selected"),
        sum("n_chars").as("chars_selected"),
        min("quota").as("quota"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- //
  // Sequence packing
  // ---------------------------------------------------------------- //

  private val PackBudget = 2048L // tokens per context window
  private val Packers = 16 // independent packing streams

  /** Context-window sequence packing: assign every doc to a pack of
    * ≈[[PackBudget]] whitespace tokens. Docs are dealt to [[Packers]]
    * independent packing streams by doc-id hash, ordered within a
    * stream by the same hash, and a doc belongs to the pack where its
    * running token offset starts (`(cumsum - tokens) div budget`).
    *
    * This is the offset-binning approximation of greedy first-fit:
    * truly greedy packing is inherently sequential (each decision
    * depends on the previous pack's fill), while offset binning is one
    * window function — embarrassingly parallel across streams — and
    * overfills a pack only by the tail of the one doc that straddles
    * the boundary. At 100 TB the stream count scales with the cluster
    * (the window sort is per-stream, bounded, and spill-safe), and the
    * output (pack_id, member list) feeds the tokenizer stage directly.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        h60("cast(doc_id as string)").as("h"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"))
      .withColumn("packer", pmod(col("h"), lit(Packers.toLong)).cast("int"))
    val w = Window.partitionBy("packer").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum("tokens").over(w))
      .withColumn("pack_id", expr(s"(cum - tokens) div $PackBudget"))
      .groupBy("packer", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("pack_tokens"))
      .orderBy("packer", "pack_id")
  }

  // ---------------------------------------------------------------- //
  // CDC merge / upsert
  // ---------------------------------------------------------------- //

  /** MERGE INTO semantics without a table format: a deterministic
    * change batch (every doc_id ≡ 0 mod 7 gets a revision; every
    * doc_id ≡ 0 mod 13 spawns an insert under a shifted key) merged
    * into the base corpus by full-outer join on the key, classifying
    * every output row as insert / update / keep.
    *
    * Scale: the merge is a single shuffle-on-key full-outer sort-merge
    * join — the same plan Delta/Iceberg MERGE executes under copy-on-
    * write. At 100 TB the wins come from layout, not the operator:
    * partition the base by key range so the join prunes to touched
    * partitions, and let the change batch (usually ≪ base) drive
    * AQE's broadcast/skew decisions. Row classification is a
    * projection over the join's null pattern — free.
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val updates = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" [rev2]")).as("new_text"))
    val inserts = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("synthetic doc "), col("doc_id").cast("string")).as("new_text"))
    val batch = updates.union(inserts)
    base.join(batch, Seq("doc_id"), "full_outer")
      .select(
        when(col("text").isNull, lit("insert"))
          .when(col("new_text").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"),
        length(coalesce(col("new_text"), col("text"))).cast("bigint").as("chars"))
      .groupBy("action")
      .agg(count(lit(1)).as("n_rows"), sum("chars").as("chars"))
      .orderBy("action")
  }

  val registry: Map[String, Q] = Map(
    "x_sample_stratified" -> stratifiedSample _,
    "x_mix_sources" -> mixSources _,
    "x_pack_sequences" -> packSequences _,
    "x_merge_upsert" -> mergeUpsert _,
  )

  val oracles: Map[String, String] = Map(
    "x_sample_stratified" ->
      s"""SELECT source, count(*) AS n_total,
         | sum(CASE WHEN ${h60Sql("doc_id::VARCHAR")} % 1000000
         |   < (substr(source, 4)::INT + 1) * 50000 THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
         | sum(CASE WHEN ${h60Sql("doc_id::VARCHAR")} % 1000000
         |   < (substr(source, 4)::INT + 1) * 50000 THEN doc_id END)::BIGINT AS sampled_id_sum
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_mix_sources" ->
      s"""WITH ranked AS (
         | SELECT source, n_chars,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk,
         |  ($MixBudget * (20 - substr(source, 4)::BIGINT)) // $MixWeightSum AS quota
         | FROM documents)
         |SELECT source, count(*) AS n_selected,
         | sum(n_chars)::BIGINT AS chars_selected, min(quota) AS quota
         |FROM ranked WHERE rk <= quota GROUP BY source ORDER BY source""".stripMargin,
    "x_pack_sequences" ->
      s"""WITH docs AS (
         | SELECT doc_id, ${h60Sql("doc_id::VARCHAR")} AS h,
         |  len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS tokens
         | FROM documents),
         |dealt AS (SELECT *, (h % $Packers)::INT AS packer FROM docs),
         |packed AS (
         | SELECT packer, doc_id, tokens,
         |  sum(tokens) OVER (PARTITION BY packer ORDER BY h, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum
         | FROM dealt)
         |SELECT packer, (cum - tokens) // $PackBudget AS pack_id,
         | count(*) AS n_docs, sum(tokens)::BIGINT AS pack_tokens
         |FROM packed GROUP BY packer, pack_id ORDER BY packer, pack_id""".stripMargin,
    "x_merge_upsert" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |batch AS (
        | SELECT doc_id, text || ' [rev2]' AS new_text FROM documents WHERE doc_id % 7 = 0
        | UNION ALL
        | SELECT doc_id + 10000000, 'synthetic doc ' || doc_id::VARCHAR FROM documents WHERE doc_id % 13 = 0),
        |merged AS (
        | SELECT CASE WHEN b.text IS NULL THEN 'insert'
        |             WHEN u.new_text IS NULL THEN 'keep'
        |             ELSE 'update' END AS action,
        |  length(coalesce(u.new_text, b.text))::BIGINT AS chars
        | FROM base b FULL OUTER JOIN batch u USING (doc_id))
        |SELECT action, count(*) AS n_rows, sum(chars)::BIGINT AS chars
        |FROM merged GROUP BY action ORDER BY action""".stripMargin,
  )
}
