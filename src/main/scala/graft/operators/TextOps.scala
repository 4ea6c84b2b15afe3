package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (net-new surface beyond the reference — the reference's only text
  * handling is benchmark-name parsing,
  * scripts/vizualize_flatbuffers_benchmark.py:19).
  *
  * Parity discipline for the oracle: occurrence counting uses
  * `(length(s) - length(replace(s, w, ''))) / length(w)` — `replace` is
  * replace-all with identical greedy scanning in Spark and DuckDB, so no
  * regex-engine differences leak into results.
  *
  * Scale: every op is a narrow per-row projection followed by a tiny
  * group-by — embarrassingly parallel, the only shuffle is the final
  * low-cardinality aggregate (map-side combined).
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  /** Occurrences of literal `w` in the `padded` column via replace-all
    * counting (identical semantics in Spark and DuckDB).
    */
  private def occ(w: String): Column =
    (length(col("padded")) - length(expr(s"replace(padded, '$w', '')"))) / w.length

  /** A small documents file arrives as one scan partition; spread rows
    * before the regex/replace-heavy projections so per-row CPU work
    * uses every core (explicit count — AQE would coalesce a byte-tiny
    * keyed repartition back to one partition). Same principle as
    * [[Dedup.shingled]]: input file count must never cap parallelism
    * ahead of CPU-bound row work.
    */
  private[graft] def padded(spark: SparkSession, sfDir: String): DataFrame =
    Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("padded", concat(lit(" "), lower(col("text")), lit(" ")))

  /** Token counting: whitespace tokens + a BPE-ish word/number/punct
    * regex token count.
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs
      .select(
        col("source"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))").as("n_bpe_tokens"),
        length(col("text")).as("n_chars_m"))
      .groupBy("source")
      .agg(
        sum("n_ws_tokens").as("total_tokens"),
        round(avg("n_ws_tokens"), 4).as("avg_tokens"),
        sum("n_bpe_tokens").as("total_bpe_tokens"),
        sum("n_chars_m").as("total_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length — the cheap heuristics a 100 TB corpus filter computes
    * in a single projection pass.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = padded(spark, sfDir).select(
      col("lang"),
      length(col("text")).as("len"),
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).as("punct_chars"),
      occ(" the ").as("the_hits"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    perDoc
      .select(
        col("lang"), col("len"), col("n_tokens"),
        round(col("punct_chars").cast("double") / col("len"), 6).as("punct_ratio"),
        round(col("the_hits") / col("n_tokens"), 6).as("stopword_ratio"),
        round(col("len").cast("double") / col("n_tokens"), 6).as("mean_token_len"))
      .groupBy("lang")
      .agg(
        round(avg("len"), 4).as("avg_len"),
        round(avg("punct_ratio"), 6).as("avg_punct_ratio"),
        round(avg("stopword_ratio"), 6).as("avg_stopword_ratio"),
        round(avg("mean_token_len"), 6).as("avg_token_len"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  /** Language-ID by stopword-marker scoring (n-gram heuristic): highest
    * score wins, ties broken by fixed CASE order. Output is the
    * confusion matrix (actual lang × predicted).
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = padded(spark, sfDir).select(
      col("lang"),
      (occ(" the ") + occ(" and ")).as("s_en"),
      (occ(" der ") + occ(" und ")).as("s_de"),
      (occ(" le ") + occ(" et ")).as("s_fr"),
      (occ(" el ") + occ(" los ")).as("s_es"))
    scored
      .withColumn("predicted",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Token-length distribution in power-of-two buckets — the corpus
    * length histogram every training-data report leads with (context-
    * length planning, packing-efficiency input, truncation-loss
    * estimates). Bucket = floor(log2(word count)) computed as
    * length(bin(wc)) - 1: pure integer arithmetic, so both engines
    * bucket identically with no float-log edge cases at exact powers
    * of two. One projection + one keyed aggregate — a single corpus
    * pass at any scale.
    */
  def lengthHist(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("wc"))
      .withColumn("len_bucket", (length(bin(col("wc"))) - 1).cast("int"))
      .groupBy("source", "len_bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("wc").as("sum_tokens"),
        min("wc").as("min_tokens"),
        max("wc").as("max_tokens"))
      .orderBy("source", "len_bucket")
  }

  private val ZipfTopK = 1000

  /** Zipf rank-frequency fit (round-11): the log-log least-squares
    * slope over the corpus's top-[[ZipfTopK]] token frequencies — the
    * canonical "is this corpus natural language or boilerplate" check
    * (natural text sits near slope −1; template/machine output
    * flattens or steepens it). Training-data reports lead with it next
    * to the length histogram.
    *
    * Scale shape: frequencies come off the Zipf-bounded unigram counts
    * (one corpus pass); the top-K cut is TakeOrderedAndProject (never a
    * global sort), and the rank window runs over the CONSTANT-size K
    * frame — no unpartitioned corpus window anywhere.
    *
    * Float discipline: ln(rank), ln(cnt) quantized ONCE to integer
    * milli-nats per model row; the regression is then pure BIGINT sums
    * with the numerator/denominator arranged POSITIVE (slope < 0 is
    * re-signed at the end) so Spark's truncating `div` and DuckDB's
    * floor `//` cannot diverge. Milli (not micro) keeps K·Sxy and the
    * cross products inside Long at any corpus size (the psiDrift
    * overflow lesson applied up front).
    */
  def zipfFit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = tokenized(spark, sfDir)
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val topK = counts.orderBy(col("cnt").desc, col("t").asc).limit(ZipfTopK)
    // bounded frame: the window ranks exactly K rows
    val w = Window.orderBy(col("cnt").desc, col("t").asc)
    val q = topK.withColumn("rank", row_number().over(w))
      .select(
        expr("cast(round(ln(cast(rank as double)) * 1000) as bigint)").as("lr"),
        expr("cast(round(ln(cast(cnt as double)) * 1000) as bigint)").as("lf"))
    q.agg(
        count(lit(1)).as("k"),
        sum("lr").as("sx"), sum("lf").as("sy"),
        sum(expr("lr * lr")).as("sxx"), sum(expr("lr * lf")).as("sxy"))
      .select(
        col("k"),
        expr("-(((sx * sy - k * sxy) * 1000) div (k * sxx - sx * sx))")
          .as("slope_milli"),
        expr("(sy + (((sx * sy - k * sxy) * 1000) div (k * sxx - sx * sx)) * sx div 1000) div k")
          .as("intercept_milli"))
  }

  /** Tokenizer fertility by language (round-11): BPE tokens per word
    * — THE tokenizer-equity metric multilingual corpus reports publish
    * (a language whose fertility is 2× pays 2× the context budget per
    * word; SentencePiece/tiktoken evals report exactly this). Same
    * trained merge table and delimiter-fold apply as [[bpeApply]]
    * (one model, every consumer), censused per LANGUAGE instead of per
    * source, with fertility and chars-per-token in integer ppm.
    *
    * Scale: the merge fold is a per-row string expression over the
    * word explode — one corpus pass, one lang-keyed aggregate; the
    * trained merge table is memoized per (sfDir, fingerprint) like
    * every model artifact.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainedMerges(spark, sfDir).sortBy(_._1)
    val folded = merges.foldLeft("s") { case (acc, (_, l, r, _, _)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    padded(spark, sfDir)
      .select(col("lang"), explode(split(trim(col("padded")), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 12))
      .withColumn("r", regexp_replace(col("word"), "(.)", "$1||"))
      .withColumn("s", concat(lit("|"), expr("substring(r, 1, length(r) - 1)")))
      .withColumn("t", expr(folded))
      .select(col("lang"), length(col("word")).cast("long").as("n_chars"),
        expr("cast((length(t) - length(replace(t, '|', '')) - 2) div 2 + 1 as bigint)")
          .as("n_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_chars").as("n_chars"),
        sum("n_toks").as("n_bpe_tokens"))
      .withColumn("fertility_ppm",
        expr("n_bpe_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_ppm",
        expr("n_chars * 1000000 div n_bpe_tokens"))
      .orderBy("lang")
  }

  private val HeapsCheckpoints = 5

  /** Heaps'-law vocabulary growth (round-11): V(n) ≈ K·n^β measured at
    * five doc-id prefixes of the corpus — the companion diagnostic to
    * [[zipfFit]] (a crawl whose vocabulary growth flattens is
    * duplicating itself; one that grows linearly is noise). β per
    * checkpoint is the two-point log fit against the first checkpoint.
    *
    * The TYPE unit is the 3-token shingle (the
    * [[graft.functions.TextExpressions.word_ngrams]] trigram, dedup's
    * shingle), not the unigram: the synthetic corpus's word vocabulary
    * saturates at a few dozen types in the first checkpoint (β would
    * pin to 0 and the fit would be vacuous), while the trigram type
    * space genuinely grows with the corpus — and shingle-type growth
    * is ALSO the quantity near-dup dedup actually cares about (a
    * corpus whose shingle vocabulary stops growing is repeating
    * itself).
    *
    * Scale shape — NO distinct aggregation anywhere: vocabulary at a
    * prefix is "tokens whose FIRST occurrence (min doc_id, one keyed
    * aggregate over the Zipf-bounded type frame) falls inside it", and
    * occurrence mass is five conditional sums in one corpus pass. A
    * count(DISTINCT CASE …) per checkpoint would Expand the token
    * stream five-fold; this form reads the corpus once and the model
    * once.
    *
    * Float discipline: ln quantized ONCE per scalar to milli-nats;
    * β = Δ(lnV)·1000 div Δ(lnN) with both deltas positive (vocabulary
    * and mass GROW), so the truncating div agrees cross-engine.
    */
  def heapsLaw(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.word_ngrams(col("tokens"), 3)).as("t"))
    val maxId = Tables.documents(spark, sfDir)
      .agg(max("doc_id")).first().getLong(0)
    val cuts = (1 to HeapsCheckpoints).map(i => i * maxId / HeapsCheckpoints)
    val tokenSums = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("doc_id") <= c, 1L).otherwise(0L)).as(s"n$i") }
    val model = toks.groupBy("t").agg(min("doc_id").as("fd"))
    val vocabSums = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("fd") <= c, 1L).otherwise(0L)).as(s"v$i") }
    val row = toks.agg(tokenSums.head, tokenSums.tail: _*)
      .crossJoin(model.agg(vocabSums.head, vocabSums.tail: _*))
    val points = (0 until HeapsCheckpoints).map { i =>
      struct(lit(i + 1).as("checkpoint"), lit(cuts(i)).as("max_doc_id"),
        col(s"n$i").as("n_tokens"), col(s"v$i").as("n_vocab"),
        col("n0").as("n1_t"), col("v0").as("v1_t"))
    }
    row.select(explode(array(points: _*)).as("p"))
      .select(col("p.checkpoint").as("checkpoint"),
        col("p.max_doc_id").as("max_doc_id"),
        col("p.n_tokens").as("n_tokens"), col("p.n_vocab").as("n_vocab"),
        expr("p.n_vocab * 1000000 div p.n_tokens").as("ttr_ppm"),
        expr(
          """CASE WHEN p.checkpoint = 1 THEN 0 ELSE
            | ((cast(round(ln(cast(p.n_vocab as double)) * 1000) as bigint)
            |   - cast(round(ln(cast(p.v1_t as double)) * 1000) as bigint)) * 1000)
            | div (cast(round(ln(cast(p.n_tokens as double)) * 1000) as bigint)
            |   - cast(round(ln(cast(p.n1_t as double)) * 1000) as bigint)) END""".stripMargin)
          .as("beta_milli"))
      .orderBy("checkpoint")
  }

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the content-defined key exact dedup shuffles on at scale.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs
      .select(col("source"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
      .groupBy("source")
      .agg(
        countDistinct(col("fp")).as("n_unique"),
        count(lit(1)).as("n_docs"),
        min("fp").as("min_fp"))
      .orderBy("source")
  }

  /** End-to-end training-set selection — the composition these
    * operators exist for, as ONE lazy plan: quality gate (token count +
    * punctuation ratio) → language gate (English by stopword score,
    * langId's exact scoring) → exact-dedup keep (first doc per
    * normalized fingerprint) → per-source selection stats. A 100 TB
    * corpus filter is this plan verbatim: one projection pass, one
    * fingerprint-keyed shuffle for the dedup window, one tiny final
    * aggregate.
    */
  def pipelineSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = padded(spark, sfDir).select(
      col("doc_id"), col("source"),
      length(col("text")).as("len"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"),
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).as("punct_chars"),
      (occ(" the ") + occ(" and ")).as("s_en"),
      (occ(" der ") + occ(" und ")).as("s_de"),
      (occ(" le ") + occ(" et ")).as("s_fr"),
      (occ(" el ") + occ(" los ")).as("s_es"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
    val gated = base.filter(
      col("n_tokens") >= 30 &&
        col("punct_chars").cast("double") / col("len") < 0.2 &&
        col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
        col("s_en") >= col("s_es"))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    gated.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("tokens_kept"))
      .orderBy("source")
  }

  private val ChunkLen = 64
  private val ChunkStep = 48 // 16-token overlap between adjacent chunks

  /** Document chunking — the context-window prep step of a training
    * pipeline: each document is split into fixed-size token chunks with
    * overlap (64-token chunks, stride 48). One `sequence` + `explode`
    * per document, `slice` per chunk: a single narrow generator, no
    * shuffle until the deterministic output ordering. Chunk identity is
    * md5 of the re-joined token text, so the DuckDB oracle verifies the
    * chunk CONTENT, not just counts. Limited to doc_id < 50 for a
    * compact verify output; the plan is row-count-independent.
    */
  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("n_tok", size(col("tokens")))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0, greatest(cast(ceil((n_tok - $ChunkLen) / $ChunkStep.0) AS int), 0))")))
      .withColumn("chunk_tokens", expr(s"slice(tokens, chunk_id * $ChunkStep + 1, $ChunkLen)"))
      .select(
        col("doc_id"), col("chunk_id"),
        size(col("chunk_tokens")).as("chunk_len"),
        md5(concat_ws(" ", col("chunk_tokens"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** TF-IDF top-3 terms per source: the corpus-statistics op behind
    * keyword extraction.
    *
    * Parity notes: idf is constant per term, so the per-(source, term)
    * score is `sum(tf) × ln(N/df)` — an integer times one double, no
    * order-dependent float accumulation. Ranking uses the rounded score
    * with a term tiebreak.
    *
    * Scale: two shuffles (term-frequency group-by, then document
    * frequency keyed by term). The tf⋈df join carries NO broadcast
    * hint: df's cardinality is the vocabulary, which is corpus-dependent
    * — AQE broadcasts it while it fits and falls back to a shuffled
    * term-keyed join when it doesn't (both sides already partition by
    * term, so that join is co-located anyway). No O(corpus) state.
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count() // tiny action; N is a plan literal
    val tok = docs.select(col("doc_id"), col("source"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val tf = tok.groupBy("doc_id", "source", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val score = tf.join(dfT, "term")
      .groupBy("source", "term", "df")
      .agg(sum("tf").as("sum_tf"))
      .withColumn("score", round(col("sum_tf") * log(lit(nDocs.toDouble) / col("df")), 4))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("term").asc)
    score.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("source", "term", "score")
      .orderBy("source", "term")
  }

  /** Intra-document repetition (a Gopher-style quality gate): the
    * fraction of word-3-grams that are repeats of an earlier 3-gram in
    * the same doc. Heavily repetitive docs (boilerplate, templated spam)
    * score high and get filtered before training.
    *
    * Parity discipline: ratios are integer parts-per-million over
    * SUMMED integer counts (`(n3 - d3)·1e6 div n3`) and the per-doc
    * flag is the integer cross-multiplication `(n3 - d3)·5 > n3`
    * (repeat fraction > 20%) — no float averaging anywhere, so the
    * aggregate is order-independent and exact in both engines.
    * Scale: one projection pass + a per-source integer aggregate.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("sh",
        graft.functions.TextExpressions.word_ngrams(col("tokens"), 3))
      .select(
        col("source"),
        size(col("sh")).cast("bigint").as("n3"),
        size(array_distinct(col("sh"))).cast("bigint").as("d3"))
    per.groupBy("source")
      .agg(
        sum("n3").as("total_3grams"),
        sum("d3").as("distinct_3grams"),
        expr("((sum(n3) - sum(d3)) * 1000000) div sum(n3)").as("dup_ppm"),
        sum(when((col("n3") - col("d3")) * 5 > col("n3"), 1L).otherwise(0L))
          .as("n_repetitive"))
      .orderBy("source")
  }

  /** Filter FUNNEL observability — the per-stage survivor counts a
    * curation pipeline reports while narrowing a corpus: total → length
    * gate → language gate → repetition gate (Gopher-style 3-gram
    * duplicate fraction ≤ 20%) → exact-dedup keeper. Each stage is
    * cumulative (a doc must pass every earlier gate), so the row reads
    * as the funnel. One projection pass + one fingerprint-keyed window
    * + one scalar aggregate — the same single-pass shape as
    * [[pipelineSelect]], reported as counts instead of rows.
    */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("sh",
        graft.functions.TextExpressions.word_ngrams(col("tokens"), 3))
      .select(
        col("doc_id"),
        (col("n_chars") >= 150).as("len_ok"),
        (col("lang") === "en").as("lang_ok"),
        ((size(col("sh")) - size(array_distinct(col("sh")))) * 5 <= size(col("sh"))).as("rep_ok"),
        md5(col("text")).as("fp"))
    val w = Window.partitionBy("fp")
    per.withColumn("keep_ok", col("doc_id") === min("doc_id").over(w))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("len_ok"), 1L).otherwise(0L)).as("n_len"),
        sum(when(col("len_ok") && col("lang_ok"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("len_ok") && col("lang_ok") && col("rep_ok"), 1L).otherwise(0L)).as("n_rep"),
        sum(when(col("len_ok") && col("lang_ok") && col("rep_ok") && col("keep_ok"), 1L)
          .otherwise(0L)).as("n_final"))
  }

  private[graft] val SurpriseMicroNats = 4000000L // ≈ -ln p of a rare-ish token

  /** The document corpus as one row per token occurrence — the shared
    * front of the LM train/score passes.
    */
  private def tokenized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))

  /** The trained unigram model as a (token, micro_nats) frame — the
    * static serving side shared by the batch scorers here and the
    * STREAMING scorer ([[graft.streaming.EventStreams]]'s perplexity
    * gate), exactly as the LSH plane literals are shared with the
    * streaming ANN path.
    */
  private[graft] def unigramModel(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokenized(spark, sfDir)
    // The model is Zipf-bounded (types, not tokens) — checkpoint it so
    // the token total below reads the MODEL instead of re-tokenizing
    // the corpus as a second count() job (round-11: this was one of
    // the two corpus passes behind the x_ccnet_buckets constant
    // factor), and so consumers that join the model twice don't replay
    // the tokenize either.
    val model = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .transform(graft.Ckpt.pin("TextOps.unigramModel.model"))
    // corpus token total: one exact integer scalar — model-sized
    // extraction (like IVF centroids), becomes a plan literal that the
    // oracle recomputes identically as a subquery. Σ cnt over the
    // model ≡ the corpus token count, without touching the corpus.
    val total = model.agg(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
    model
      .withColumn("micro_nats",
        expr(s"cast(round((ln(cast($total as double)) - ln(cast(cnt as double))) * 1000000) as bigint)"))
      .select("t", "micro_nats")
  }

  /** Per-doc average unigram surprise in integer micro-nats — the
    * two-pass score shared by [[unigramSurprise]] (which rolls it up)
    * and [[perplexityFilter]] (which thresholds it at a percentile).
    */
  private def surprisePerDoc(spark: SparkSession, sfDir: String): DataFrame =
    tokenized(spark, sfDir).join(unigramModel(spark, sfDir), "t")
      .groupBy("doc_id", "source")
      .agg(expr("sum(micro_nats) div count(1)").as("avg_micro_nats"))

  /** Unigram-LM surprise scoring — the cheap perplexity proxy of corpus
    * filtering, as the classic two-pass "train on the corpus, score the
    * corpus" shape: pass 1 aggregates the unigram counts (the model),
    * pass 2 joins every token occurrence back to the model and averages
    * per-token surprise `-ln p(t)` per document.
    *
    * Parity discipline: surprise is quantized to integer MICRO-NATS per
    * token BEFORE summing (`round((ln(total) - ln(cnt))·1e6)`), so
    * per-doc and per-source reductions are exact integer arithmetic in
    * any order; the 1-ulp `ln` differences between engines vanish in
    * the quantization (a flip would need ln to land within 5e-13 of a
    * half-micro boundary).
    *
    * Scale: the model is a (token, count) aggregate — a few MB for a
    * real vocabulary — joined back hash-partitioned; per-token work
    * never shuffles document text. A production pass hashes tokens to
    * 64-bit before the join (8-byte keys) exactly as
    * [[graft.operators.Curation.contamination]] does.
    */
  def unigramSurprise(spark: SparkSession, sfDir: String): DataFrame = {
    surprisePerDoc(spark, sfDir).groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("avg_micro_nats").as("sum_avg_micro_nats"),
        sum(when(col("avg_micro_nats") > SurpriseMicroNats, 1L).otherwise(0L))
          .as("n_high_surprise"))
      .orderBy("source")
  }

  /** Quantization width of the [[Ranks.valueAtRank]] range buckets for
    * the surprise cut: per-doc averages span a few million micro-nats,
    * so 100k-wide buckets give ~O(100) bucket rows for the phase-1
    * offset window and at most 100k distinct-score rows (corpus-
    * independent) in the phase-2 straddling bucket.
    */
  private val SurpriseBucketWidth = 100000L

  /** Perplexity-percentile filtering (the CCNet shape): drop the ~10%
    * of documents with the highest LM surprise, where the cut is the
    * EXACT corpus p90 — the value at rank ceil(0.9·n) of
    * (avg_micro_nats, doc_id) order — rather than a fixed constant
    * ([[unigramSurprise]]'s gate). Docs tying the threshold value are
    * kept, so the decision depends only on integer score comparisons
    * and both engines derive the identical keep set. (The value at
    * rank r of (score, doc_id) order is the smallest score whose
    * cumulative frequency reaches r — the doc_id tie-break never
    * changes the threshold VALUE, only which doc carries it.)
    *
    * Scale: the threshold comes from [[Ranks.valueAtRank]]'s bucketed
    * two-phase rank-at-cut — no single-partition corpus window
    * anywhere in the plan (the DuckDB oracle runs the global-window
    * formulation; the equivalence is the correctness claim). The
    * per-doc score frame is localCheckpoint'ed first: three consumers
    * (the count, the rank kernel, the final rollup) would otherwise
    * each replay the tokenize→train→join lineage including
    * [[unigramModel]]'s eager corpus count — the same
    * multiple-consumer discipline as
    * [[graft.operators.Similarity.pagerankFrames]], pinning only an
    * n-doc two-long-column block.
    */
  def perplexityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = surprisePerDoc(spark, sfDir)
      .transform(graft.Ckpt.pin("TextOps.perplexityFilter.perDoc"))
    val cutRank = perDoc.agg(count(lit(1)).as("n"))
      .select(expr("(9 * n + 9) div 10").as("cut_rk"))
    val thr = Ranks.valueAtRank(perDoc, "avg_micro_nats", cutRank, SurpriseBucketWidth)
    perDoc.crossJoin(broadcast(thr))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("avg_micro_nats") <= col("thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("avg_micro_nats") <= col("thr"), col("doc_id"))).as("kept_id_sum"),
        sum(when(col("avg_micro_nats") > col("thr"), col("doc_id"))).as("dropped_id_sum"))
      .orderBy("source")
  }

  /** Curriculum-phase scheduling — the easy→hard ordering a curriculum
    * training run feeds its data loader: documents split into four
    * global difficulty quartiles by unigram surprise (the
    * [[perplexityFilter]] proxy: low surprise = predictable = easy),
    * with per-(phase, source) composition so the schedule's source mix
    * is visible before any epoch runs (phase 1 skewing to one source
    * is the classic curriculum failure mode).
    *
    * Scale: the three quartile cuts come from ONE
    * [[Ranks.valuesAtRanks]] pass (the batched rank kernel — no global
    * sort, no corpus-sized window; a naive ntile(4) OVER () is the
    * single-partition killer this replaces); phase assignment is a
    * broadcast 1-row threshold attach + two integer compares per doc.
    * Ties at a cut co-phase deterministically (s > thr puts equal
    * scores in the lower phase), so phase sizes can deviate from n/4
    * by tie mass — the price of a value-deterministic split.
    */
  def curriculumPhases(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = surprisePerDoc(spark, sfDir)
      .transform(graft.Ckpt.pin("TextOps.curriculumPhases.perDoc"))
    val cutRanks = perDoc.agg(count(lit(1)).as("n"))
      .selectExpr("""stack(3, 'q1', (1 * n + 3) div 4,
                    |         'q2', (2 * n + 3) div 4,
                    |         'q3', (3 * n + 3) div 4) as (qlabel, cut_rk)""".stripMargin)
    val thr = Ranks.valuesAtRanks(perDoc, "avg_micro_nats", cutRanks, SurpriseBucketWidth)
    val thrRow = thr.agg(
      max(when(col("qlabel") === "q1", col("thr"))).as("t1"),
      max(when(col("qlabel") === "q2", col("thr"))).as("t2"),
      max(when(col("qlabel") === "q3", col("thr"))).as("t3"))
    perDoc.crossJoin(broadcast(thrRow))
      .withColumn("phase",
        lit(1) + (col("avg_micro_nats") > col("t1")).cast("int")
          + (col("avg_micro_nats") > col("t2")).cast("int")
          + (col("avg_micro_nats") > col("t3")).cast("int"))
      .groupBy("phase", "source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(avg_micro_nats) div count(1)").as("mean_micro_nats"),
        sum("doc_id").as("id_sum"))
      .orderBy("phase", "source")
  }

  /** SymSpell-style typo-pair mining: every vocabulary pair at edit
    * distance EXACTLY 1, found via DELETION-NEIGHBORHOOD blocking —
    * each token emits itself plus its single-character deletions, and
    * only tokens sharing a variant ever meet (an equi-join), so the
    * O(V²) levenshtein cross-join never exists. Two tokens sharing a
    * deletion variant are within distance 2; the exact
    * `levenshtein = 1` filter then runs on candidate pairs only. The
    * cleaning signal: a rare token one edit from a frequent one is a
    * likely typo (the counts ride along for that call).
    *
    * Scale: variants are vocab-bounded (V × avg-token-length rows of
    * short strings), the block join is a hash equi-join on the variant
    * string, and the final top-50 is a TakeOrderedAndProject with a
    * total (count-sum desc, t1, t2) order — deterministic under any
    * partitioning. Both engines' `levenshtein` are character-exact.
    *
    * Fixture honesty: the synthetic corpus draws from a ~31-word
    * generator vocabulary with NO natural near-collisions, so the
    * query first noises a deterministic 10% doc slice (md5(doc_id)
    * selects the docs AND the deleted character position) and must
    * mine back exactly those injected typo→original pairs — both
    * engines compute the identical injection, making the demo
    * self-validating instead of vacuously empty.
    */
  def typoPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val noised = tokenized(spark, sfDir)
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("t",
        when(col("h") % 10 === 0 && length(col("t")) >= 4,
          expr("""concat(substr(t, 1, cast(h % (length(t) - 2) as int) + 1),
                 |       substr(t, cast(h % (length(t) - 2) as int) + 3))""".stripMargin))
          .otherwise(col("t")))
    val vocab = noised
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .filter(length(col("t")).between(3, 20))
    val variants = vocab
      .select(col("t"), col("cnt"), explode(expr("sequence(0, length(t))")).as("i"))
      .select(col("t"), col("cnt"),
        when(col("i") === 0, col("t"))
          .otherwise(expr("concat(substr(t, 1, i - 1), substr(t, i + 1))")).as("v"))
      .distinct()
    val pairs = variants.as("a").join(variants.as("b"), Seq("v"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.t").as("t1"), col("b.t").as("t2"),
        col("a.cnt").as("cnt1"), col("b.cnt").as("cnt2"))
      .distinct()
      .filter(expr("levenshtein(t1, t2) = 1"))
    pairs.orderBy((col("cnt1") + col("cnt2")).desc, col("t1"), col("t2"))
      .limit(50)
  }

  private val DsirBuckets = 4096L

  /** DSIR-style importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by how much more likely its tokens are under a
    * TARGET-domain bag-of-hashed-ngrams model than under the raw-corpus
    * model, and keep the documents the target model prefers. The
    * hashed feature space ([[DsirBuckets]] md5 buckets) is what makes
    * the method corpus-scale: both "models" are one fixed-size count
    * vector regardless of vocabulary.
    *
    * Target domain here: sources ≡ 0 (mod 5) — a plan-literal stand-in
    * for "the domain we want more of" (a real run points this at a
    * curated corpus). Per-bucket importance weights are add-one-
    * smoothed log-ratios quantized to integer micro-nats (the
    * [[unigramModel]] discipline, so cross-engine ulp differences
    * vanish); per-doc scores are the SUMMED token weights — no
    * integer division anywhere (Spark `div` truncates while DuckDB
    * `//` floors, which diverges on negatives). Selection keeps the
    * TOP QUARTILE by score (DSIR selects top-K, never a fixed zero
    * cut — the average log-likelihood-ratio is ≤ 0 for typical docs of
    * BOTH domains by Jensen, so an absolute threshold degenerates):
    * the exact cut comes from [[Ranks.valueAtRank]] at rank
    * ceil(0.75·n) — the distributed two-phase construction, negative
    * scores included — and docs tying the threshold are kept.
    *
    * Scale: two passes over token occurrences — one to count buckets
    * (map-side combined into ≤[[DsirBuckets]] rows), one to score with
    * the broadcast weight table; document text never shuffles, and the
    * keep rule is a per-doc predicate.
    */
  def dsirResample(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokenized(spark, sfDir)
      .withColumn("b",
        expr(s"cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % $DsirBuckets"))
    val isTarget = expr("cast(substr(source, 4) as int) % 5 = 0")
    val counts = toks.groupBy("b").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = counts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val model = counts.crossJoin(broadcast(tot))
      .withColumn("w_micro", expr(
        s"""cast(round((ln(cast(ct + 1 as double)) - ln(cast(tt + $DsirBuckets as double))
           | - ln(cast(cr + 1 as double)) + ln(cast(tr + $DsirBuckets as double)))
           | * 1000000) as bigint)""".stripMargin))
      .select("b", "w_micro")
    val perDoc = toks.join(broadcast(model), "b")
      .groupBy("doc_id", "source")
      .agg(sum("w_micro").as("sum_w_micro"))
      .transform(graft.Ckpt.pin("TextOps.dsir.perDoc"))
    val cutRank = perDoc.agg(count(lit(1)).as("n"))
      .select(expr("(3 * n + 3) div 4").as("cut_rk"))
    val thr = Ranks.valueAtRank(perDoc, "sum_w_micro", cutRank, 100000L)
    perDoc.crossJoin(broadcast(thr))
      .withColumn("selected", col("sum_w_micro") >= col("thr"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selected"), col("doc_id"))).as("selected_id_sum"),
        sum("sum_w_micro").as("w_micro_total"))
      .orderBy("source")
  }

  // classifier head: integer micro-unit weights over exact-ppm features
  private val ClfWeights = (3L, 2L, 1L) // uniq-ratio, stopword-rate, length
  private val ClfThreshold = 300000L // micro-units; ~38% of this corpus passes

  /** Model-based quality filtering — the SERVING half of a fastText-
    * style quality classifier: a linear head over per-doc features,
    * thresholded into a keep decision. (Training the head is an
    * offline job; its weights arrive here as plan literals, like the
    * IVF centroids.) Every feature is an exact integer ppm — unique-
    * token ratio, stopword rate via replace-all counting, capped
    * length — and the fusion is integer-weighted, so the score and the
    * decision are bit-identical cross-engine: no float anywhere in the
    * decision path, the same discipline as [[graft.operators.Curation]]
    * gates.
    *
    * Scale: one narrow projection pass + a per-source rollup; the
    * decision never shuffles the corpus and pushes to a scan filter
    * when used as a gate.
    */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = clfScores(spark, sfDir)
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score") >= ClfThreshold, 1L).otherwise(0L)).as("n_pass"),
        sum("score").as("score_sum"),
        min("score").as("min_score"),
        max("score").as("max_score"))
      .orderBy("source")
  }

  /** Per-doc (doc_id, source, score) of the linear quality head —
    * shared by [[qualityClassifier]] (per-source rollup) and
    * [[qualityCalibration]] (reliability bins vs the Gopher label).
    */
  private def clfScores(spark: SparkSession, sfDir: String): DataFrame = {
    val (w1, w2, w3) = ClfWeights
    val wsum = w1 + w2 + w3
    padded(spark, sfDir)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .select(
        col("doc_id"), col("source"),
        expr("(1000000 * cast(size(array_distinct(toks)) as bigint)) div size(toks)").as("f_uniq"),
        expr("""(1000000 * ((length(padded) - length(replace(padded, ' the ', ''))) div 5))
               | div size(toks)""".stripMargin).as("f_stop"),
        expr("cast(least(size(toks), 256) as bigint) * 3906").as("f_len"))
      .withColumn("score",
        expr(s"($w1 * f_uniq + $w2 * f_stop + $w3 * f_len) div $wsum"))
  }

  /** Calibration census for the quality-classifier family —
    * reliability bins + expected calibration error (Guo et al. 2017),
    * in exact integer ppm: the classifier's micro-unit score plays the
    * predicted confidence that a doc is high-quality, the
    * independently-derived Gopher all-rules pass plays the reference
    * label, and the census reports, per score decile, the doc count,
    * mean predicted confidence, empirical pass rate, and |gap|, plus
    * the N-weighted ECE — the number that says whether the head's
    * scores can be USED as probabilities (mixing weights, acceptance
    * thresholds) or only as a ranking.
    *
    * Float discipline: score and pass are both exact integers already;
    * conf_ppm = Σscore div n, acc_ppm = pass·10⁶ div n, ECE =
    * Σ n_b·gap_b div N — truncating division on nonnegative operands
    * throughout, bit-identical cross-engine.
    *
    * Scale: two corpus projections (the score pass and the Gopher
    * flag pass) joined once on doc_id — a co-partitioned fixed-width
    * equi-join — then a ≤10-group aggregate; the ECE attach is a
    * window over the 10-row POST-AGGREGATE bin frame (constant-size
    * single partition, the rank-kernel shape), never corpus-sized.
    */
  def qualityCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = gopherFlags(spark, sfDir)
      .select(col("doc_id"),
        (col("r_wc") && col("r_mwl") && col("r_sym") &&
          col("r_alpha") && col("r_stop")).as("pass"))
    val bins = clfScores(spark, sfDir)
      .join(labels, "doc_id")
      .withColumn("bin", expr("cast(least(greatest(score, 0) div 100000, 9) as int)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("score").as("conf_sum"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n_docs"),
        expr("conf_sum div n_docs").as("conf_ppm"),
        expr("n_pos * 1000000 div n_docs").as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
    bins
      .withColumn("ece_ppm",
        expr("sum(n_docs * gap_ppm) over () div sum(n_docs) over ()"))
      .orderBy("bin")
  }

  /** Spearman rank agreement between the engine's two independent
    * quality signals — the linear classifier head ([[clfScores]]) and
    * the unigram-LM surprise filter ([[surprisePerDoc]]) — per source:
    * do the cheap head and the perplexity-style filter RANK documents
    * the same way (the fastText-vs-LM agreement question a CCNet-style
    * pipeline answers before trusting either as its gate)?
    * [[qualityCalibration]] asks whether the head's scores are usable
    * as probabilities; this asks whether they are usable as an ORDER.
    *
    * Ranks are tie-broken deterministically by (value, doc_id) on both
    * engines — distinct integer ranks, not average ranks, so
    * ρ = 1 − 6·Σd² / (n(n²−1)) is EXACT integer arithmetic end to end.
    * Surprise ranks DESCEND (high surprise = low quality) so that
    * agreement between the signals reads as positive ρ. The Σd² fold
    * and the ρ division run in DECIMAL(38,0) (DuckDB HUGEINT) — exact
    * to ~3·10¹⁰ docs per source (6·10⁶·n³/3 ≤ 10³⁸); the reported
    * mean_d2 = Σd² div n is a BIGINT (exact to ~3·10⁹ docs/source,
    * bound documented rather than silently wrapped). ρ itself is a
    * truncating division of nonnegative operands subtracted from 10⁶.
    *
    * Scale: the two per-doc score frames join once on (doc_id, source)
    * — fixed-width co-partitioned equi-join — and the rank windows
    * partition BY SOURCE (the [[graft.operators.Curation.quantileNorm]]
    * shape; a skewed mega-source would take the
    * [[Ranks.valuesAtRanksBy]] bucketed construction instead, at the
    * cost of tie-broken exactness).
    */
  def qualityRankCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = clfScores(spark, sfDir).select("doc_id", "source", "score")
    val lm = surprisePerDoc(spark, sfDir)
    val j = head.join(lm, Seq("doc_id", "source"))
    val byHead = Window.partitionBy("source")
      .orderBy(col("score").asc, col("doc_id").asc)
    val byLm = Window.partitionBy("source")
      .orderBy(col("avg_micro_nats").desc, col("doc_id").asc)
    j.withColumn("r1", row_number().over(byHead).cast("long"))
      .withColumn("r2", row_number().over(byLm).cast("long"))
      .withColumn("d2", expr("cast((r1 - r2) * (r1 - r2) as decimal(38,0))"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("d2").as("sum_d2"))
      .select(col("source"), col("n_docs"),
        expr("cast(sum_d2 div n_docs as bigint)").as("mean_d2"),
        expr(
          """CASE WHEN n_docs > 1 THEN
            | 1000000L - cast((cast(6000000 as decimal(38,0)) * sum_d2)
            |   div (cast(n_docs as decimal(38,0))
            |        * (cast(n_docs as decimal(38,0)) * n_docs - 1)) as bigint)
            | ELSE 1000000L END""".stripMargin).as("rho_micro"))
      .orderBy("source")
  }

  /** Cohen's κ between the two quality GATES — the classifier head's
    * threshold decision ([[clfScores]] ≥ [[ClfThreshold]]) vs the
    * Gopher all-rules pass — per source: chance-corrected DECISION
    * agreement, completing the signal-audit triptych
    * ([[qualityCalibration]]: scores as probabilities;
    * [[qualityRankCorr]]: scores as an order; this: the final binary
    * keep decisions). κ = (p_o − p_e)/(1 − p_e) over the 2×2 cell
    * counts, in the all-integer form
    * κ = (n·(a+d) − E) / (n² − E) with E = (a+b)(a+c) + (c+d)(b+d).
    *
    * Float discipline: the numerator CAN be negative (raters worse
    * than chance), and Spark's `div` truncates toward zero while
    * DuckDB's `//` floors — so κ is computed on the ABSOLUTE value
    * and re-signed explicitly, making the truncation direction
    * engine-independent. The products run in DECIMAL(38,0) (DuckDB
    * HUGEINT): exact to n ≈ 10¹⁶ docs per source. Degenerate raters
    * (p_e = 1: both constant) emit κ = 0 by convention, guarded on
    * both engines.
    *
    * Scale: the two per-doc flag projections join once on doc_id
    * (fixed-width equi-join, the [[qualityCalibration]] shape), then
    * an S-row aggregate; the κ arithmetic runs on the S-row census.
    */
  def qualityKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = gopherFlags(spark, sfDir)
      .select(col("doc_id"),
        (col("r_wc") && col("r_mwl") && col("r_sym") &&
          col("r_alpha") && col("r_stop")).as("gopher_pass"))
    val cells = clfScores(spark, sfDir)
      .withColumn("clf_pass", col("score") >= ClfThreshold)
      .join(labels, "doc_id")
      .groupBy("source")
      .agg(
        sum(when(col("clf_pass") && col("gopher_pass"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("clf_pass") && !col("gopher_pass"), 1L).otherwise(0L)).as("n_clf_only"),
        sum(when(!col("clf_pass") && col("gopher_pass"), 1L).otherwise(0L)).as("n_gopher_only"),
        sum(when(!col("clf_pass") && !col("gopher_pass"), 1L).otherwise(0L)).as("n_neither"))
      .withColumn("n_docs",
        col("n_both") + col("n_clf_only") + col("n_gopher_only") + col("n_neither"))
    cells
      .withColumn("po_ppm",
        expr("(n_both + n_neither) * 1000000 div n_docs"))
      .withColumn("e_raw", expr(
        """cast(n_both + n_clf_only as decimal(38,0)) * (n_both + n_gopher_only)
          | + cast(n_gopher_only + n_neither as decimal(38,0)) * (n_clf_only + n_neither)"""
          .stripMargin))
      .withColumn("pe_ppm", expr(
        "cast(e_raw * 1000000 div (cast(n_docs as decimal(38,0)) * n_docs) as bigint)"))
      .withColumn("kappa_num", expr(
        "cast(n_docs as decimal(38,0)) * (n_both + n_neither) - e_raw"))
      .withColumn("kappa_den", expr(
        "cast(n_docs as decimal(38,0)) * n_docs - e_raw"))
      .withColumn("kappa_ppm", expr(
        """CASE WHEN kappa_den = 0 THEN 0L
          | WHEN kappa_num >= 0
          |  THEN cast(kappa_num * 1000000 div kappa_den as bigint)
          | ELSE -cast((-kappa_num) * 1000000 div kappa_den as bigint) END"""
          .stripMargin))
      .select("source", "n_docs", "n_both", "n_clf_only", "n_gopher_only",
        "n_neither", "po_ppm", "pe_ppm", "kappa_ppm")
      .orderBy("source")
  }

  // dimension ladder for the hashing-trick census (powers of 4)
  private val HashDims = Seq(256L, 1024L, 4096L, 16384L, 65536L)

  /** Feature-hashing (hashing-trick) collision census (Weinberger et
    * al. 2009): before shrinking a classifier/embedding feature space
    * to 2^k hashed buckets, measure what each dimension choice costs —
    * per dim: vocabulary types, occupied buckets, types sharing a
    * bucket, the worst bucket load, and the TOKEN-MASS ppm that lands
    * in shared buckets (mass-weighted collisions are what move a
    * linear head, not type counts; cf. [[vocabCoverage]]'s head-mass
    * view). The bucket is the 60-bit md5 prefix mod dim — nonnegative,
    * so `%` agrees across engines.
    *
    * Scale: ONE tokenize+aggregate into the Zipf-bounded (token, cnt)
    * model frame, localCheckpointed; the ladder explodes the MODEL
    * (|dims|·|vocab| rows — model-sized, corpus-independent), never
    * the corpus. Exact integer arithmetic throughout; the one
    * division is truncating on nonnegative operands.
    */
  def featureHashing(spark: SparkSession, sfDir: String): DataFrame = {
    val model = tokenized(spark, sfDir)
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .withColumn("h", expr("cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"))
      .transform(graft.Ckpt.pin("TextOps.featureHashing.model"))
    val perBucket = model
      .select(explode(array(HashDims.map(lit): _*)).as("dim"),
        col("h"), col("cnt"))
      .withColumn("b", col("h") % col("dim"))
      .groupBy("dim", "b")
      .agg(count(lit(1)).as("types"), sum("cnt").as("mass"))
    perBucket.groupBy("dim")
      .agg(
        sum("types").as("n_types"),
        count(lit(1)).as("n_occupied"),
        sum(when(col("types") >= 2, col("types")).otherwise(0L)).as("n_collided_types"),
        max("types").as("max_bucket_types"),
        sum(when(col("types") >= 2, col("mass")).otherwise(0L)).as("collided_mass"),
        sum("mass").as("total_mass"))
      .withColumn("collided_mass_ppm",
        expr("collided_mass * 1000000 div total_mass"))
      .select("dim", "n_types", "n_occupied", "n_collided_types",
        "max_bucket_types", "collided_mass_ppm")
      .orderBy("dim")
  }

  private val VocabTopK = 128 // largest coverage bucket (powers of 2)

  /** Tokenizer-prep vocabulary induction: corpus word frequencies,
    * ranked, with the token-coverage curve at top-{1,2,4,…,128} — the
    * "how big must the seed vocab be" question answered before BPE
    * training. Coverage is exact integer ppm of ALL corpus tokens.
    *
    * Scale: the frequency table is one map-side-combined aggregate
    * (vocab-sized output); the top-K is `ORDER BY … LIMIT K` — planned
    * as TakeOrderedAndProject, a per-partition heap + one reduction,
    * never a global sort; the rank/cumulative windows then run over the
    * K-row frame (constant-size single partition, like the bucket
    * offsets in [[graft.operators.Curation.tokenBudgetSelect]]). The
    * corpus total rides a 1-row aggregate cross join.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val counts = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total_tokens"))
    val byFreq = Window.partitionBy(lit(0)).orderBy(col("cnt").desc, col("t"))
    val ranked = counts.orderBy(col("cnt").desc, col("t")).limit(VocabTopK)
      .withColumn("rank", row_number().over(byFreq))
      .withColumn("cum", sum("cnt").over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ks = spark.range(0, 8)
      .select(expr("shiftleft(1L, cast(id as int))").as("k"))
    ks.join(ranked, col("rank") <= col("k"))
      .groupBy("k")
      .agg(max(col("rank").cast("bigint")).as("n_words"),
        max("cum").as("covered_tokens"))
      .crossJoin(total)
      .withColumn("coverage_ppm", expr("(1000000 * covered_tokens) div total_tokens"))
      .select("k", "n_words", "covered_tokens", "coverage_ppm")
      .orderBy("k")
  }

  /** Bigram language model with add-one smoothing: per-doc average
    * conditional surprise −ln P(w₂|w₁) where
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V) — the next step up from
    * [[unigramSurprise]]'s context-free model, scoring how predictable
    * each document's word SEQUENCE is (boilerplate scores low, shuffled
    * text scores high even when its unigram mix is normal).
    *
    * Determinism discipline (same as the unigram LM): both count
    * models are exact integers; ln() is evaluated once per MODEL ROW
    * and rounded to integer micro-nats before any aggregation, so
    * engine-side float summation order never touches the result.
    *
    * Scale: the bigram model is corpus-vocabulary²-bounded in theory
    * but Zipf-bounded in practice (distinct observed bigrams); both
    * model builds are map-side-combined aggregates, and scoring is an
    * equi-join of the exploded fact against the two model tables —
    * shuffled on the bigram/unigram keys, never broadcast-assumed.
    */
  def bigramSurprise(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = docs.select(col("doc_id"), col("source"),
      explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, concat(t[i], ' ', t[i + 1]) as bg))"))
        .as("p"))
      .select(col("doc_id"), col("source"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    // ONE corpus aggregate materializes the bigram model (Zipf-bounded
    // types, not tokens — small at any corpus scale); the w1 marginal
    // and the vocab size are aggregates OF the model, not corpus
    // re-scans (the kneserNey/mixKl discipline, swept here r13: this
    // was 3 tokenize passes for the model alone).
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("mw1", expr("substring_index(bg, ' ', 1)"))
      .transform(graft.Ckpt.pin("TextOps.bigramLm.c2"))
    val c1 = c2.groupBy(col("mw1").as("w1")).agg(sum("c2").as("c1"))
    val vocab = c2.select(col("mw1")).distinct().count()
    val model = c2
      .join(c1, col("mw1") === c1("w1"))
      .withColumn("micro_nats",
        expr(s"cast(round((ln(cast(c1 + $vocab as double)) - ln(cast(c2 + 1 as double))) * 1000000) as bigint)"))
      .select(col("bg"), col("micro_nats"))
    val perDoc = bigrams.join(model, "bg")
      .groupBy("doc_id", "source")
      .agg(expr("sum(micro_nats) div count(1)").as("avg_micro_nats"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("avg_micro_nats").as("sum_avg_micro_nats"),
        min("avg_micro_nats").as("min_surprise"),
        max("avg_micro_nats").as("max_surprise"))
      .orderBy("source")
  }

  private val MinCollocCount = 3L // df gate: a collocation must recur

  /** PMI collocation mining (Church & Hanks 1990) — the phrase-mining
    * pass a tokenizer-training / vocab-curation pipeline runs to find
    * multiword units worth single tokens: top-30 adjacent bigrams by
    * pointwise mutual information, count-gated so hapax pairs (whose
    * PMI is degenerate-maximal) never rank. Probabilities are
    * bigram-slot relative frequencies — P(x,·) = c_x/N over the LEFT
    * slot, P(·,y) = c_y/N over the RIGHT slot, P(x,y) = c_xy/N over N
    * total bigrams — so PMI = ln(c_xy·N / (c_x·c_y)).
    *
    * Float discipline: the composite ln(c_xy) + ln(N) − ln(c_x) −
    * ln(c_y) is quantized ONCE to integer micro-nats ([[bigramSurprise]]
    * model-row discipline); counts stay exact BIGINT everywhere else.
    * Ordering (pmi_micro desc, bigram asc) is total — bigram text is
    * unique per row — so the top-30 cut is deterministic cross-engine.
    *
    * Scale: ONE exploded bigram pass into the (w1, w2) model frame
    * (map-side partials, localCheckpointed); the total and both slot
    * marginals are aggregates of the model, never corpus re-scans.
    * Only the count-gated survivors join the two vocab-sized
    * slot-count frames (shuffled equi-joins — no broadcast assumption,
    * vocab can be huge at lake scale); the final cut is
    * TakeOrderedAndProject, never a global sort.
    */
  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val pairs = docs.select(explode(expr(
      "transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, t[i + 1] as w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    // ONE bigram explode: the (w1, w2) count frame is the model
    // (localCheckpointed, bigram-vocab-sized); the total, both slot
    // marginals, and the gated survivors are aggregates OF it — one
    // corpus pass instead of four (jsdSources discipline)
    val cxyAll = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .transform(graft.Ckpt.pin("TextOps.collocations.cxy"))
    // one exact integer scalar off the model frame, a plan literal the
    // oracle recomputes
    val n = cxyAll.agg(coalesce(sum("c_xy"), lit(0L))).first().getLong(0)
    val cxy = cxyAll.filter(col("c_xy") >= MinCollocCount)
    val cx = cxyAll.groupBy("w1").agg(sum("c_xy").as("c_x"))
    val cy = cxyAll.groupBy("w2").agg(sum("c_xy").as("c_y"))
    cxy.join(cx, "w1").join(cy, "w2")
      .withColumn("pmi_micro", expr(
        s"""cast(round((ln(cast(c_xy as double)) + ln(cast(${n}L as double))
           | - ln(cast(c_x as double)) - ln(cast(c_y as double))) * 1000000) as bigint)""".stripMargin))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c_xy"), col("c_x"), col("c_y"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram").asc)
      .limit(30)
  }

  private val Bm25Terms = Seq("spark", "window", "merge") // the fixed query
  // (real corpus words so every stat path is non-vacuous)
  private val Bm25K1 = "1.2"
  private val Bm25B = "0.75"

  /** BM25 (Robertson/Spärck Jones; the Lucene `k1·(1−b+b·dl/avgdl)`
    * form with the +1 idf floor) top-20 document retrieval for a fixed
    * query — the lexical-retrieval primitive of every RAG / search
    * stack, over the same token spine as [[tfidfTopTerms]]. Score =
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    *
    * Determinism: N and total token mass are one-scalar model
    * extractions (the [[bigramSurprise]] vocab discipline) interpolated
    * as literals; each (doc, term) partial score is a fixed-shape
    * double expression of exact integers (tf, df, dl) rounded to
    * integer micro units BEFORE the per-doc sum, so float addition
    * order never touches the result — the model-row ln discipline.
    *
    * Scale: tf is one filtered explode + (doc, term) aggregate (the
    * filter keeps only query terms, so the shuffle is O(docs·|q|));
    * df is |q| rows broadcast; ranking is TakeOrderedAndProject. At
    * lake scale the tf table IS the inverted index slice for the
    * query — the posting-list scan shape.
    */
  def bm25TopDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("t"))
    val dl = docs.select(col("doc_id"), col("source"),
      size(col("t")).cast("bigint").as("dl"))
    val head = dl.agg(count(lit(1)).as("n"), sum("dl").as("tot")).collect()(0)
    val nDocs = head.getLong(0)
    val totalToks = head.getLong(1)
    val avgdl = s"(cast($totalToks as double) / cast($nDocs as double))"
    val tf = docs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .withColumn("micro", expr(
        s"""cast(round(ln((cast($nDocs as double) - df + 0.5) / (df + 0.5) + 1.0)
           | * ((tf * ($Bm25K1 + 1.0)) / (tf + $Bm25K1 * ((1.0 - $Bm25B) + ($Bm25B * dl) / $avgdl)))
           | * 1000000) as bigint)""".stripMargin))
    scored.groupBy("doc_id", "source")
      .agg(sum("micro").as("bm25_micro"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25_micro").desc, col("doc_id").asc)
      .limit(20)
  }

  private val RrfBase = 60L // the standard RRF dampening constant

  /** Hybrid retrieval fusion via Reciprocal Rank Fusion (Cormack et
    * al. 2009): fuse the [[bm25TopDocs]] lexical top-20 with an
    * embedding cosine top-20 (query = vector 0; the synthetic corpus
    * identifies doc i with vector i, standing in for "text and
    * embedding of the same document") as
    * `rrf = Σ_lists 1e6 div (60 + rank)` — the score-free fusion every
    * hybrid search stack ships because it needs no cross-modality
    * score calibration. Output: fused top-10 with both source ranks
    * (0 = absent from that list).
    *
    * Ranks come from [[graft.functions.TopKPairs]] + posexplode — the
    * sorted top-k AGGREGATE's array position IS the rank, so neither
    * list needs a rank window (no global-window shape anywhere); the
    * RRF arithmetic is pure integer floor-division.
    *
    * Scale: both list builds are corpus-scan + bounded aggregate; the
    * fusion full-outer join runs on ≤ 40 rows. The one BNLJ is the
    * 1-row query-vector attach (allowlisted).
    */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    def ranksOf(pairs: DataFrame, score: String, id: String): DataFrame =
      pairs.groupBy()
        .agg(graft.functions.TopKPairsNative.topk(col(score), col(id), 20).as("l"))
        .select(posexplode(col("l")).as(Seq("i", "p")))
        .select((col("i") + 1).as("rank"), col("p._2").as("id"))
    val bmRanks = ranksOf(
      bm25TopDocs(spark, sfDir).select(col("bm25_micro"), col("doc_id")),
      "bm25_micro", "doc_id")
      .select(col("id"), col("rank").as("r_bm25"))
    val ve = graft.functions.VectorExpressions
    val e = Tables.fanOut(spark, Tables.embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val scored = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(ve.dot_product(col("qv"), col("v"))
          / (ve.l2_norm(col("qv")) * ve.l2_norm(col("v"))) * 10000)
          .cast("bigint").as("sim_m"))
    val embRanks = ranksOf(scored, "sim_m", "vec_id")
      .select(col("id"), col("rank").as("r_emb"))
    bmRanks.join(embRanks, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("r_bm25"), lit(0)).as("r_bm25"),
        coalesce(col("r_emb"), lit(0)).as("r_emb"))
      .withColumn("rrf_ppm", expr(
        s"""CASE WHEN r_bm25 > 0 THEN 1000000 div ($RrfBase + r_bm25) ELSE 0 END
           | + CASE WHEN r_emb > 0 THEN 1000000 div ($RrfBase + r_emb) ELSE 0 END""".stripMargin))
      .orderBy(col("rrf_ppm").desc, col("id").asc)
      .limit(10)
  }

  /** NDCG@10 of the [[bm25TopDocs]] ranking (Järvelin & Kekäläinen
    * 2002) — the graded-relevance retrieval metric every search /
    * RAG eval harness reports, closing the eval loop that
    * [[graft.operators.Similarity]]'s recall query opens for ANN:
    * grade rel(d) = doc_id mod 4 (the deterministic stand-in for a
    * judgment table; swap in a real `judgments(doc_id, rel)` join at
    * deployment), gain(r) = rel·10⁶/log₂(r+1) quantized per term,
    * DCG = Σ gains over the BM25 top-10, IDCG = the same sum over the
    * corpus-ideal top-10 grades.
    *
    * The ideal ranking needs NO global sort of judged docs: grades
    * take 4 values, so the 4-row (rel, count) aggregate + a cumulative
    * window over rel desc yields each grade's ideal-rank interval
    * [cum−c+1, min(cum,10)], exploded to ≤ 10 (rank, rel) rows — the
    * corpus-independent frame however many docs are judged. The BM25
    * side's rank window runs over its top-20 aggregate output. Both
    * final scalars are 1-row aggregates; their crossJoin is the
    * allowlisted scalar attach.
    *
    * Float discipline: each gain term quantizes round(rel·10⁶/log₂(r+1))
    * ONCE from exact integers (both engines' log₂ on the same ≤ 11
    * integer arguments); dcg/idcg are exact BIGINT sums; ndcg_ppm is
    * truncating integer division.
    */
  def ndcgAt10(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gain = "cast(round(rel * 1000000 / log2(cast(rank + 1 as double))) as bigint)"
    val ranked = bm25TopDocs(spark, sfDir)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)))
      .filter(col("rank") <= 10)
      .withColumn("rel", col("doc_id") % 4)
      .withColumn("gain_micro", expr(gain))
    val dcg = ranked.agg(count(lit(1)).as("k"), sum("gain_micro").as("dcg_micro"))
    val cnt = Tables.documents(spark, sfDir)
      .select((col("doc_id") % 4).as("rel"))
      .groupBy("rel").agg(count(lit(1)).as("c"))
    val ideal = cnt
      .withColumn("cum", sum("c").over(Window.orderBy(col("rel").desc)))
      .withColumn("lo", col("cum") - col("c") + 1)
      .filter(col("lo") <= 10)
      .withColumn("hi", least(col("cum"), lit(10L)))
      .select(col("rel"), explode(expr("sequence(lo, hi)")).as("rank"))
      .withColumn("gain_micro", expr(gain))
    val idcg = ideal.agg(sum("gain_micro").as("idcg_micro"))
    dcg.crossJoin(idcg)
      .withColumn("ndcg_ppm", expr("dcg_micro * 1000000 div idcg_micro"))
      .select("k", "dcg_micro", "idcg_micro", "ndcg_ppm")
  }

  /** MRR + precision/recall@10 of the [[bm25TopDocs]] ranking — the
    * binary-relevance eval trio next to [[ndcgAt10]]'s graded one
    * (relevant = top grade of the same judgment scheme, doc_id ≡ 3
    * mod 4; swap in a judgments join at deployment). All three scores
    * are pure integer ppm: rr = 10⁶ div (first relevant rank, 0-safe),
    * p@10 = hits·10⁶ div 10, r@10 = hits·10⁶ div |relevant corpus|.
    *
    * Scale: the rank window runs over the BM25 top-20 aggregate
    * output; the corpus relevant-count is a 1-row aggregate attached
    * by the allowlisted scalar crossJoin — nothing here touches the
    * corpus beyond the BM25 spine itself.
    */
  def mrrAt10(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = bm25TopDocs(spark, sfDir)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)))
      .filter(col("rank") <= 10)
      .withColumn("rel", (col("doc_id") % 4 === 3).cast("int"))
    val head = ranked.agg(
      count(lit(1)).as("k"),
      sum("rel").as("hits"),
      min(when(col("rel") === 1, col("rank"))).as("first_rel"))
    val totalRel = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 3)
      .agg(count(lit(1)).as("n_relevant"))
    head.crossJoin(broadcast(totalRel))
      .select(col("k"), col("hits"), col("n_relevant"),
        expr("coalesce(1000000 div first_rel, cast(0 as bigint))").as("mrr_ppm"),
        expr("hits * 1000000 div 10").as("p10_ppm"),
        expr("hits * 1000000 div n_relevant").as("r10_ppm"))
  }

  /** Average precision @10 of the [[bm25TopDocs]] ranking — the
    * rank-position-weighted eval that completes the retrieval trio
    * ([[ndcgAt10]] graded, [[mrrAt10]] first-hit, AP the full ranked
    * integral): AP = Σ_{relevant k} P@k / min(R, 10), each P@k the
    * exact integer hits≤k·10⁶ div k. Same binary judgment scheme as
    * MRR (doc_id ≡ 3 mod 4).
    *
    * Scale: the cumulative-hits window runs over the BM25 top-10
    * aggregate output; the corpus relevant count is the allowlisted
    * 1-row scalar attach.
    */
  def apAt10(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)
    val ranked = bm25TopDocs(spark, sfDir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .withColumn("rel", (col("doc_id") % 4 === 3).cast("long"))
      .withColumn("hits_at_k", sum("rel").over(
        Window.orderBy(col("rank")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("p_at_k_ppm",
        when(col("rel") === 1, expr("hits_at_k * 1000000 div rank")).otherwise(lit(0L)))
    val head = ranked.agg(count(lit(1)).as("k"), sum("rel").as("hits"),
      sum("p_at_k_ppm").as("p_sum_ppm"))
    val totalRel = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 3)
      .agg(count(lit(1)).as("n_relevant"))
    head.crossJoin(broadcast(totalRel))
      .select(col("k"), col("hits"), col("n_relevant"),
        expr("p_sum_ppm div least(n_relevant, 10)").as("ap_ppm"))
  }

  private val MinBurstCf = 5L // a term must recur to have a burst profile

  /** Term burstiness (Church & Gale 1995) — mean occurrences per
    * CONTAINING document, the boilerplate detector frequency alone
    * misses: a template fragment appears 40× in each of its few docs
    * (bursty), a function word once or twice everywhere (flat); both
    * can share collection frequency. Top-30 by burst_milli =
    * cf·1000 div df (cf-gated so hapax noise can't rank), with
    * (burst desc, term asc) a total order for a deterministic cut.
    *
    * Scale: cf and df come from ONE (term, doc) aggregate pass
    * (map-side combine) followed by a term-keyed rollup; the cut is
    * TakeOrderedAndProject. No distinct buffers: df = count of
    * (term, doc) groups, cf = their sum.
    */
  def burstiness(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = tokenized(spark, sfDir)
      .groupBy("t", "doc_id").agg(count(lit(1)).as("c"))
    perDoc.groupBy("t")
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .filter(col("cf") >= MinBurstCf)
      .withColumn("burst_milli", expr("cf * 1000 div df"))
      .select(col("t").as("term"), col("cf"), col("df"), col("burst_milli"))
      .orderBy(col("burst_milli").desc, col("term").asc)
      .limit(30)
  }

  private val KnDiscount = "0.75" // the standard absolute discount, as a
  // literal string so Spark and DuckDB parse the identical double

  /** Interpolated Kneser-Ney bigram surprise (Kneser & Ney 1995; the
    * KenLM-style smoothing production quality filters actually score
    * with): −ln P_KN(w₂|w₁) where
    * `P_KN = max(c(w₁w₂)−d, 0)/c(w₁·) + d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/B`
    * — the continuation probability ranks a word by how many DISTINCT
    * contexts it follows, not raw frequency, fixing add-one's
    * overestimate of frequent-but-fixed collocations. The step up
    * from [[bigramSurprise]]'s add-one model on the same spine.
    *
    * Determinism: all four model statistics (c2, c1, right/left
    * continuation type counts, bigram-type total B) are exact
    * integers; the ln() is evaluated once per MODEL ROW on an
    * identically-parenthesized double expression and rounded to
    * integer micro-nats before any aggregation — the engines never
    * sum floats. Observed bigrams have c2 ≥ 1 > d, so the discounted
    * term is strictly positive and the max() is vacuous.
    *
    * Scale: the type-count tables derive from the c2 model (Zipf-
    * bounded), never from a second corpus pass; scoring is the same
    * bigram-keyed equi-join as the add-one model. B is a one-scalar
    * model extraction (the [[bigramSurprise]] vocab discipline).
    */
  def knBigramSurprise(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = docs.select(col("doc_id"), col("source"),
      explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, concat(t[i], ' ', t[i + 1]) as bg))"))
        .as("p"))
      .select(col("doc_id"), col("source"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    // The c2 bigram model is consumed FIVE ways (c1 marginal, right/
    // left continuation counts, the type total B — a separate count()
    // JOB — and the model join); without the checkpoint each consumer
    // replays the corpus tokenize+explode, and B's count() can't even
    // hit ReusedExchange. The model is Zipf-bounded (types, not
    // tokens), so the checkpoint is small at any corpus scale —
    // [[perplexityFilter]]'s discipline. (Round-11: this was the
    // x_text_kn_lm constant-factor regression.)
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("mw1", expr("substring_index(bg, ' ', 1)"))
      .withColumn("mw2", expr("substring_index(bg, ' ', -1)"))
      .transform(graft.Ckpt.pin("TextOps.kneserNey.c2"))
    // c(w1·) = Σ_w2 c(w1 w2): the marginal derives from the CHECKPOINTED
    // model, not from a second corpus aggregate.
    val c1 = c2.groupBy(col("mw1").as("w1")).agg(sum("c2").as("c1"))
    val n1pr = c2.groupBy(col("mw1").as("rw1")).agg(count(lit(1)).as("n1pr"))
    val n1pl = c2.groupBy(col("mw2").as("lw2")).agg(count(lit(1)).as("n1pl"))
    val b = c2.count()
    val model = c2
      .join(c1, col("mw1") === c1("w1"))
      .join(n1pr, col("mw1") === n1pr("rw1"))
      .join(n1pl, col("mw2") === n1pl("lw2"))
      .withColumn("micro_nats", expr(
        s"""cast(round(-ln(
           |  ((cast(c2 as double) - $KnDiscount) / cast(c1 as double))
           |  + ((($KnDiscount * cast(n1pr as double)) / cast(c1 as double))
           |     * (cast(n1pl as double) / cast($b as double)))
           |) * 1000000) as bigint)""".stripMargin))
      .select(col("bg"), col("micro_nats"))
    val perDoc = bigrams.join(model, "bg")
      .groupBy("doc_id", "source")
      .agg(expr("sum(micro_nats) div count(1)").as("avg_micro_nats"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("avg_micro_nats").as("sum_avg_micro_nats"),
        min("avg_micro_nats").as("min_surprise"),
        max("avg_micro_nats").as("max_surprise"))
      .orderBy("source")
  }

  /** Denylist terms for [[piiScrub]] — stand-ins for the PII patterns
    * (emails, phone numbers, IDs) a production scrubber would target;
    * this corpus is synthetic word soup, so the denylist names real
    * corpus words to keep the operator non-vacuous.
    */
  private val ScrubTerms = Seq("value", "table", "hash")

  /** PII-style denylist scrub: rewrite every denylisted word to a
    * redaction marker and account for the damage — docs touched,
    * redactions made, characters before/after, and a 60-bit checksum
    * of every scrubbed text (md5-prefix sum) proving the rewrite is
    * byte-identical across engines, not just counted the same.
    *
    * Scale: one regexp projection + one tiny per-source aggregate; the
    * scrubbed text never shuffles (only its length and checksum do).
    * The word-boundary regex compiles once per task; RE2 (DuckDB) and
    * Java regex agree on `\b` for ASCII word chars.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val pat = s"\\\\b(${ScrubTerms.mkString("|")})\\\\b"
    Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("lowered", lower(col("text")))
      .withColumn("scrubbed", expr(s"regexp_replace(lowered, '$pat', '<redacted>')"))
      .withColumn("hits", expr(s"size(regexp_extract_all(lowered, '$pat', 0))"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("hits").cast("long")).as("n_redactions"),
        sum(length(col("lowered")).cast("long")).as("chars_before"),
        sum(length(col("scrubbed")).cast("long")).as("chars_after"),
        // per-doc 60-bit digests reduced mod 1e12 before summing so the
        // corpus-level sum stays far inside int64 at any doc count
        sum(expr("cast(conv(substr(md5(scrubbed), 1, 15), 16, 10) as bigint) % 1000000000000"))
          .as("scrub_checksum"))
      .orderBy("source")
  }

  /** Tokenizer-training prep: adjacent-token-pair counts — the inner
    * statistic of one BPE merge round (the highest-count pair is the
    * merge a tokenizer trainer would pick next). Pairs are formed
    * per-document with an index-free array transform, so the fact
    * table explodes to (tokens-1) rows per doc and immediately
    * collapses in a map-side-combined count; only (pair, count)
    * partials shuffle. Top-30 plans as TakeOrderedAndProject.
    */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(30)
  }

  private val BpeVocabCap = 256 // word-frequency rows the trainer keeps
  private val BpeMerges = 8     // unrolled merge rounds (oracle mirrors)

  /** BPE tokenizer TRAINING — the iterated-merge loop [[bpePairs]] is
    * one round of, run to [[BpeMerges]] rounds over the word-frequency
    * table. This is the real trainer shape: BPE never re-scans the
    * corpus per merge — the corpus-scale work is ONE distributed
    * word-count aggregation (plus a deterministic (cnt desc, word)
    * top-[[BpeVocabCap]] cap, letters-only 2..12-char words so the
    * symbol alphabet is closed under '|' delimiting), and every merge
    * round then runs against that bounded frequency table. At 100 TB
    * the word table is ~10^8 rows where the corpus is 10^11 docs; each
    * round is a small distributed pair-count aggregate of which ONLY
    * the argmax row is collected (model-sized, like the PQ codebook
    * extraction).
    *
    * Token state is a delimited string — word "ab" starts as `|a||b|`,
    * every boundary carrying two pipes, the word edges one. A merge of
    * (l, r) is then the plain substring replacement `|l||r|` →
    * `|lr|`: each match consumes one pipe of each outer boundary and
    * the replacement restores it, so consecutive pair occurrences stay
    * matchable and left-to-right replace-all reproduces the BPE greedy
    * scan EXACTLY (the single-pipe form fails on runs: in `a a a a a`
    * it merges positions 1–2 then 4–5, not 1–2 and 3–4). `replace` has
    * identical greedy left-to-right semantics in Spark and DuckDB —
    * the file-header parity discipline — so the oracle re-trains the
    * full 8 rounds bit-identically.
    *
    * Output is the merge TABLE (the trained tokenizer artifact): one
    * row per round with the chosen pair and its weighted count.
    * Per-round argmax tiebreak is (count desc, pair asc); counts are
    * exact integer sums, so the sequence is deterministic under any
    * partitioning.
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, sfDir)
      .toDF("step", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy("step")
  }

  /** Memoized merge table per corpus dir — the trained-model cache
    * discipline the ANN family uses for its codebooks: training is
    * deterministic, so the first caller pays the 9 jobs and
    * [[bpeApply]] (and bench repeats) reuse the result.
    */
  private val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, String, Long)]]()

  private def trainedMerges(
      spark: SparkSession, sfDir: String): Seq[(Int, String, String, String, Long)] = {
    // Keyed on sfDir AND the input-file fingerprint (the quantizerCache
    // discipline): a corpus regenerated at the same path within one JVM
    // session must retrain, not serve a stale merge table.
    val fp = graft.sources.LayoutCache.fingerprint(
      spark.sparkContext.hadoopConfiguration, s"$sfDir/documents.parquet")
    bpeMergeCache.computeIfAbsent(s"$sfDir|$fp", _ => runBpeTraining(spark, sfDir))
  }

  private def runBpeTraining(
      spark: SparkSession, sfDir: String): Seq[(Int, String, String, String, Long)] = {
    val vocab0 = padded(spark, sfDir)
      .select(explode(split(trim(col("padded")), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 12))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(BpeVocabCap)
      .withColumn("r", regexp_replace(col("word"), "(.)", "$1||"))
      .select(concat(lit("|"), expr("substring(r, 1, length(r) - 1)")).as("s"),
        col("cnt"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var v = vocab0
    for (step <- 1 to BpeMerges) {
      val top = v
        .select(col("cnt"), split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))")).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("pair")).limit(1).collect()
      require(top.nonEmpty, s"BPE round $step found no pairs — vocab exhausted")
      val pair = top(0).getString(0)
      val pc = top(0).getLong(1)
      val Array(l, r) = pair.split(" ", 2)
      merges += ((step, l, r, l + r, pc))
      // symbols are [a-z]+ concatenations — safe inside SQL quotes
      v = v.withColumn("s", expr(s"replace(s, '|$l||$r|', '|$l$r|')"))
    }
    vocab0.unpersist()
    merges.toSeq
  }

  /** BPE tokenizer APPLY — re-tokenize the corpus with the trained
    * merge table, the serving half of the [[bpeTrain]] pipeline. The
    * 8 learned merges are collected (model-sized, like a broadcast
    * codebook) and compiled into a chain of 8 literal delimiter-aware
    * `replace` calls — a pure per-row codegen'd string projection, so
    * the corpus pass is embarrassingly parallel with ONE tiny
    * per-source aggregate at the end. Token counting never splits the
    * string: tokens = (pipes − 2) / 2 + 1 off the delimited form.
    *
    * Output is the compression accounting a tokenizer rollout needs:
    * per source, word/char/token totals and the per-mille character
    * saving (integer ppm, floor-division — positive operands so Spark
    * `div` and DuckDB `//` agree). The oracle re-derives the ENTIRE
    * pipeline — training chain and application fold — so a drift in
    * either half fails the gate.
    */
  def bpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainedMerges(spark, sfDir).sortBy(_._1)
    val folded = merges.foldLeft("s") { case (acc, (_, l, r, _, _)) =>
      s"replace($acc, '|$l||$r|', '|$l$r|')"
    }
    padded(spark, sfDir)
      .select(col("source"), explode(split(trim(col("padded")), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 12))
      .withColumn("r", regexp_replace(col("word"), "(.)", "$1||"))
      .withColumn("s", concat(lit("|"), expr("substring(r, 1, length(r) - 1)")))
      .withColumn("t", expr(folded))
      .select(col("source"), length(col("word")).cast("long").as("n_chars"),
        expr("cast((length(t) - length(replace(t, '|', '')) - 2) div 2 + 1 as bigint)")
          .as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum("n_chars").as("n_chars"),
        sum("n_toks").as("n_bpe_tokens"))
      .withColumn("saved_ppm",
        expr("(n_chars - n_bpe_tokens) * 1000000 div n_chars"))
      .orderBy("source")
  }

  /** Heavy hitters over word bigrams via mergeable frequent-items
    * sketches ([[graft.functions.FreqSketch]]) — the bounded-memory
    * twin of [[bpePairs]]' exact global group-by. One sketch per
    * source (each scan task ships a ≤2048-counter map, map-side
    * combined; the shuffle carries 20 serialized sketches, never
    * pair rows), a counter-wise merge to one corpus sketch, then
    * top-20 extraction on the single merged row.
    *
    * At 100 TB this is the statistic's only affordable shape when the
    * pair space is huge: the exact group-by shuffles O(corpus tokens)
    * rows, the sketch shuffles O(slices × maxMapSize) counters with a
    * guaranteed error band. Gate corpora sit in the sketch's EXACT
    * regime (~931 distinct bigrams < the 1536-counter purge
    * threshold — see FreqSketch scaladoc), so the top-20 equals the
    * exact counts and carries a full DuckDB oracle; the (est desc,
    * token asc) tiebreak pins the rank-20 boundary.
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.FreqSketch
    val pairs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")).as("pair"))
    val perSource = pairs.groupBy("source").agg(FreqSketch.sketchAgg(col("pair")).as("sk"))
    perSource.agg(FreqSketch.mergeAgg(col("sk")).as("sk"))
      .select(explode(FreqSketch.topK(col("sk"), 20)).as("hh"))
      .select(col("hh.token").as("token"), col("hh.est").as("est"))
      .orderBy(col("est").desc, col("token"))
  }

  /** Mixture diagnostics: per-source unigram ENTROPY and KL divergence
    * against the corpus distribution — the numbers a data-mixing run
    * watches to see which sources are redundant (low KL: distribution
    * ≈ corpus) vs distinctive (high KL), and how internally diverse
    * each source is (entropy). Follows [[unigramSurprise]]'s float
    * discipline: every `ln` is quantized to integer micro-nats at the
    * per-token grain, so all sums/divisions downstream are exact
    * integer arithmetic (order-insensitive, hash-oracle-able); KL is
    * clamped at 0 before the integer division so truncation semantics
    * agree cross-engine.
    *
    * Scale: ONE keyed aggregation over the token stream (map-side
    * combined) materializes the per-source model frame
    * (O(sources × vocab), localCheckpointed); the corpus distribution,
    * per-source totals, and the corpus total are all aggregates OF the
    * model — the token stream is tokenized exactly once, never
    * replayed (jsdSources discipline). The scoring join broadcasts
    * both model sides; the token stream itself is never joined
    * row-to-row. Same shape as the LM scorers.
    */
  def mixKl(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val perSrc = toks.groupBy("source", "t").agg(count(lit(1)).as("cnt_s"))
      .transform(graft.Ckpt.pin("TextOps.mixKl.perSrc"))
    // corpus token total: one exact integer scalar off the model frame,
    // a plan literal the oracle recomputes
    val total = perSrc.agg(coalesce(sum("cnt_s"), lit(0L))).first().getLong(0)
    val corpus = perSrc.groupBy("t").agg(sum("cnt_s").as("cnt_c"))
    val srcTotals = perSrc.groupBy("source").agg(sum("cnt_s").cast("long").as("t_s"))
    val terms = perSrc
      .join(broadcast(corpus), "t")
      .join(broadcast(srcTotals), "source")
      .withColumn("ln_term_micro", expr(
        s"""cast(round((ln(cast(cnt_s as double)) - ln(cast(t_s as double))
           | - ln(cast(cnt_c as double)) + ln(cast($total as double))) * 1000000) as bigint)"""
          .stripMargin))
      .withColumn("ln_cnt_micro",
        expr("cast(round(ln(cast(cnt_s as double)) * 1000000) as bigint)"))
    terms.groupBy("source")
      .agg(max("t_s").as("n_tokens"),
        sum(expr("cnt_s * ln_cnt_micro")).as("s_ln"),
        sum(expr("cnt_s * ln_term_micro")).as("s_kl"))
      .select(col("source"), col("n_tokens"),
        expr("cast(round(ln(cast(n_tokens as double)) * 1000000) as bigint) - (s_ln div n_tokens)")
          .as("entropy_micro_nats"),
        expr("greatest(s_kl, cast(0 as bigint)) div n_tokens").as("kl_micro_nats"))
      .orderBy("source")
  }

  /** Flesch–Kincaid grade-level scoring per source — the classic
    * readability heuristic quality filters stack next to the Gopher
    * rules (a corpus drifting toward very low or very high grades is a
    * boilerplate / gibberish signal the length ratios miss). Committed
    * integer definition: words = whitespace tokens, sentences =
    * [.!?]+ runs (min 1), syllables = vowel runs in the lowered text
    * (the standard cheap proxy; runs can't cross words since spaces
    * are non-vowels), and the grade in exact milli-units is
    * `390·W div S + 11800·Syl div W − 15590` — the FK constants scaled
    * to integers with per-term truncating division, so both engines
    * fold bit-identically with zero float anywhere.
    *
    * Scale: one projection (three codegen'd regex/size expressions per
    * doc) + a keyed rollup — the cheapest member of the quality
    * battery.
    */
  def readability(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"),
        greatest(size(split(lower(trim(col("text"))), "\\s+")), lit(1))
          .cast("long").as("w"),
        greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))"), lit(1))
          .cast("long").as("sents"),
        expr("cast(size(regexp_extract_all(lower(text), '[aeiou]+', 0)) as bigint)")
          .as("syl"))
      .withColumn("grade_milli",
        expr("390 * w div sents + 11800 * syl div w - 15590"))
    per.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(grade_milli) div count(1)").as("mean_grade_milli"),
        min("grade_milli").as("min_grade_milli"),
        max("grade_milli").as("max_grade_milli"),
        sum(when(col("grade_milli") > 12000L, 1L).otherwise(0L)).as("n_college"))
      .orderBy("source")
  }

  private val Ln2Micro = 693147L // round(ln 2 · 1e6) — JSD's upper bound

  /** Jensen–Shannon divergence per source vs the corpus unigram
    * distribution — the SYMMETRIC, BOUNDED source-similarity metric
    * mixture design actually ranks by (DSIR-style domain matching):
    * unlike [[mixKl]]'s KL it is finite under disjoint support with NO
    * Laplace smoothing, and jsd ∈ [0, ln 2] normalizes to a ppm score
    * comparable across corpora. JSD = (KL(p‖m) + KL(q‖m))/2,
    * m = (p+q)/2.
    *
    * No source × vocab grid: KL(p‖m) only has mass where c_s > 0 (the
    * inner-join frame), and KL(q‖m)'s absent-token tail is CLOSED-FORM
    * — every token missing from s has q/m = 2 exactly, so the tail is
    * `(n − Σ_present c_g) · ln2` — one subtraction off the same
    * aggregate, never a grid row.
    *
    * Float discipline: each ln(ratio) is computed from exact integer
    * counts widened to double in one fixed operation order (identical
    * in both engines) and quantized ONCE to micro-nats; the c·ln folds
    * are exact BIGINT (|ln ratio| ≤ ln(n²) keeps the fold inside Long
    * to ~10¹¹ tokens per source); both KL parts are clamped at 0
    * before the truncating division (quantization can graze a small
    * negative on a mathematically-nonnegative sum).
    *
    * Scale: ONE keyed aggregate over one exploded token stream into
    * the (source, token) model frame (localCheckpointed); the global
    * counts, per-source totals, and corpus total are aggregates of the
    * model. The term frame joins per-source counts to the vocab-sized
    * global counts by token — a shuffled equi-join, deliberately NOT a
    * broadcast (vocab is corpus-scale at 100 TB).
    */
  def jsdSources(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    // ONE tokenize pass: the (source, token) aggregate is the model
    // frame everything else derives from (localCheckpointed — r11
    // unigramModel discipline); the corpus total, global counts, and
    // per-source totals are aggregates OF the model, not re-scans
    val perSrc = toks.groupBy("source", "t").agg(count(lit(1)).as("cnt_s"))
      .transform(graft.Ckpt.pin("TextOps.jsdSources.perSrc"))
    // corpus token total: one exact integer scalar off the model frame,
    // a plan literal the oracle recomputes
    val n = perSrc.agg(coalesce(sum("cnt_s"), lit(0L))).first().getLong(0)
    val corpus = perSrc.groupBy("t").agg(sum("cnt_s").as("cnt_g"))
    val srcTotals = perSrc.groupBy("source").agg(sum("cnt_s").as("n_s"))
    val den = s"(cast(cnt_s as double) * cast(${n}L as double)" +
      " + cast(cnt_g as double) * cast(n_s as double))"
    val terms = perSrc
      .join(corpus, "t")
      .join(broadcast(srcTotals), "source")
      .withColumn("lp_micro", expr(
        s"""cast(round(ln(cast(2 as double) * cast(cnt_s as double)
           | * cast(${n}L as double) / $den) * 1000000) as bigint)""".stripMargin))
      .withColumn("lq_micro", expr(
        s"""cast(round(ln(cast(2 as double) * cast(cnt_g as double)
           | * cast(n_s as double) / $den) * 1000000) as bigint)""".stripMargin))
    terms.groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        sum(expr("cnt_s * lp_micro")).as("s_p"),
        sum(expr("cnt_g * lq_micro")).as("s_q"),
        sum("cnt_g").as("g_present"))
      .select(col("source"), col("n_tokens"),
        expr(s"""((greatest(s_p, cast(0 as bigint)) div n_tokens)
           | + (greatest(s_q + (${n}L - g_present) * $Ln2Micro, cast(0 as bigint))
           |    div ${n}L)) div 2""".stripMargin).as("jsd_micro_nats"))
      .withColumn("jsd_ppm", expr(s"jsd_micro_nats * 1000000 div $Ln2Micro"))
      .orderBy("source")
  }

  /** Per-DOCUMENT character-entropy scoring — the cheap gibberish /
    * boilerplate gate a corpus filter runs before any LM sees a doc:
    * a page of repeated fragments (or one stuck key) has far lower
    * character entropy than natural prose, and the signal needs no
    * model, only the doc's own byte histogram. Complements [[mixKl]]
    * (per-SOURCE token entropy — a mixing diagnostic): this is the
    * per-doc FILTER grain, H(doc) = ln n − (Σ_c cnt_c·ln cnt_c)/n
    * over the doc's character counts.
    *
    * The cut is self-calibrating: a doc is flagged when its entropy is
    * below the CORPUS MEAN of per-doc entropies, compared as the exact
    * integer cross-multiplication `e_doc · n_docs < Σ e` — no division,
    * no float threshold, no fixture-tuned constant. Float discipline as
    * [[mixKl]]: each `ln` quantized to integer micro-nats at the
    * per-(doc, char) grain, everything downstream exact integer sums.
    *
    * Scale: one keyed aggregation over the character stream (map-side
    * combined — at most ~100 distinct chars per doc survive the first
    * combine, so the shuffle is O(docs × alphabet), not O(chars)), a
    * per-doc rollup on the same doc_id key, and a 1-row mean attach
    * (broadcast crossJoin — allowlisted scalar attach).
    */
  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val chars = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), "")).as("c"))
    val perDoc = chars
      .groupBy("doc_id", "source", "c").agg(count(lit(1)).as("cnt"))
      .withColumn("ln_cnt_micro",
        expr("cast(round(ln(cast(cnt as double)) * 1000000) as bigint)"))
      .groupBy("doc_id", "source")
      .agg(sum("cnt").as("n"), sum(expr("cnt * ln_cnt_micro")).as("s_ln"))
      .select(col("doc_id"), col("source"),
        expr("cast(round(ln(cast(n as double)) * 1000000) as bigint) - (s_ln div n)")
          .as("entropy_micro"))
    val mean = perDoc.agg(
      count(lit(1)).as("n_docs_total"), sum("entropy_micro").as("sum_e"))
    perDoc.crossJoin(broadcast(mean))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("entropy_micro").as("sum_entropy_micro"),
        min("entropy_micro").as("min_entropy_micro"),
        max("entropy_micro").as("max_entropy_micro"),
        sum(when(col("entropy_micro") * col("n_docs_total") < col("sum_e"), 1L)
          .otherwise(0L)).as("n_below_mean"))
      .orderBy("source")
  }

  /** The Gopher quality-rule composite (Rae et al. 2021, Appendix A) —
    * the rule battery a web-scale curation run applies per document,
    * reported as per-source fail counts per rule plus the all-rules
    * pass count:
    *
    *  - word count in [50, 100000] (the paper's constants);
    *  - mean word length in [3, 10], as the integer cross-
    *    multiplications `3·wc ≤ charsum ∧ charsum ≤ 10·wc`;
    *  - symbol-to-word ratio ≤ 10% (`10·n_sym ≤ wc`);
    *  - ≥ 80% of words contain an alphabetic character
    *    (`10·n_alpha ≥ 8·wc`);
    *  - ≥ 2 distinct stopwords present (of the/a/and/to/of).
    *
    * The paper's line-shaped rules (bullet-start / ellipsis-end
    * fractions) have no analog here: the generator corpus is a single
    * line with no punctuation, so those rules would be vacuous —
    * omitted rather than faked.
    *
    * Fixture honesty (the [[typoPairs]] discipline): the generator
    * vocabulary is purely alphabetic, so the symbol and alpha rules
    * never fire on the raw corpus. The query therefore noises two
    * deterministic doc slices first — `h mod 7 = 0` docs get one `#`
    * token per 5 words appended, `h mod 7 = 1` docs one `1234` token
    * per 3 words — pushing exactly those slices over the 10% symbol /
    * 20% non-alpha thresholds; both engines compute the identical
    * injection from the same md5 hash, so the demo self-validates.
    *
    * Scale: stopword presence is five max-flags summed — no
    * count(distinct) expand, no per-token lambda (HigherOrderFunctions
    * are eval-only; this stays whole-stage codegen). One explode + one
    * doc_id-keyed aggregate (already partitioned by [[Tables.fanOut]],
    * partial-agg compressed) + a per-source rollup.
    */
  /** Per-doc Gopher rule flags — shared by [[gopherRules]] (fail
    * counts) and [[gopherAblation]] (unique-drop attribution); one
    * frame, two reports.
    */
  private def gopherFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val noised = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("wc0", size(split(lower(trim(col("text"))), "\\s+")))
      .withColumn("noised", concat(lower(trim(col("text"))),
        expr("""CASE WHEN h % 7 = 0 THEN repeat(' #', (wc0 + 4) div 5)
               |     WHEN h % 7 = 1 THEN repeat(' 1234', (wc0 + 2) div 3)
               |     ELSE '' END""".stripMargin)))
    noised
      .select(col("doc_id"), col("source"),
        explode(split(col("noised"), "\\s+")).as("t"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("wc"),
        sum(length(col("t"))).as("charsum"),
        sum(when(col("t") === "#", 1L).otherwise(0L)).as("n_sym"),
        sum(when(col("t").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
        (max(when(col("t") === "the", 1L).otherwise(0L))
          + max(when(col("t") === "a", 1L).otherwise(0L))
          + max(when(col("t") === "and", 1L).otherwise(0L))
          + max(when(col("t") === "to", 1L).otherwise(0L))
          + max(when(col("t") === "of", 1L).otherwise(0L))).as("stop_hits"))
      .select(col("doc_id"), col("source"),
        col("wc").between(50L, 100000L).as("r_wc"),
        (lit(3L) * col("wc") <= col("charsum") &&
          col("charsum") <= lit(10L) * col("wc")).as("r_mwl"),
        (lit(10L) * col("n_sym") <= col("wc")).as("r_sym"),
        (lit(10L) * col("n_alpha") >= lit(8L) * col("wc")).as("r_alpha"),
        (col("stop_hits") >= 2L).as("r_stop"))
  }

  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = gopherFlags(spark, sfDir)
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("r_wc"), 1L).otherwise(0L)).as("fail_wordcount"),
        sum(when(!col("r_mwl"), 1L).otherwise(0L)).as("fail_wordlen"),
        sum(when(!col("r_sym"), 1L).otherwise(0L)).as("fail_symbol"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("fail_alpha"),
        sum(when(!col("r_stop"), 1L).otherwise(0L)).as("fail_stopword"),
        sum(when(col("r_wc") && col("r_mwl") && col("r_sym") &&
          col("r_alpha") && col("r_stop"), 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source")
  }

  /** Gopher rule ABLATION — the "what does each rule uniquely buy"
    * report a curation team runs before touching thresholds: per rule,
    * the documents dropped ONLY by that rule (failing it while passing
    * the other four), plus the multi-fail mass no single-rule change
    * can rescue. Same flags frame as [[gopherRules]]; the attribution
    * is pure boolean arithmetic inside the same source-keyed aggregate,
    * so the report costs one corpus pass at any scale.
    */
  def gopherAblation(spark: SparkSession, sfDir: String): DataFrame = {
    val f = gopherFlags(spark, sfDir)
      .withColumn("n_fail",
        (when(!col("r_wc"), 1).otherwise(0) + when(!col("r_mwl"), 1).otherwise(0) +
          when(!col("r_sym"), 1).otherwise(0) + when(!col("r_alpha"), 1).otherwise(0) +
          when(!col("r_stop"), 1).otherwise(0)))
    def uniq(rule: String): Column =
      sum(when(!col(rule) && col("n_fail") === 1, 1L).otherwise(0L))
    f.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        uniq("r_wc").as("uniq_wordcount"),
        uniq("r_mwl").as("uniq_wordlen"),
        uniq("r_sym").as("uniq_symbol"),
        uniq("r_alpha").as("uniq_alpha"),
        uniq("r_stop").as("uniq_stopword"),
        sum(when(col("n_fail") >= 2, 1L).otherwise(0L)).as("multi_fail"),
        sum(when(col("n_fail") === 0, 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source")
  }

  /** CCNet's per-language head/middle/tail split (Wenzek et al. 2020):
    * score every document with the unigram-LM surprise proxy
    * ([[unigramModel]]'s integer micro-nats), then tertile each
    * LANGUAGE's own distribution — head = the lowest-perplexity third
    * of that language, tail = the highest. CCNet keeps head+middle for
    * training; the output here is the full (lang × bucket) census so
    * the cut itself is oracle-checked.
    *
    * Cuts are the EXACT per-language values at ranks ceil(n/3) and
    * ceil(2n/3) of (score, doc_id) order, computed by
    * [[Ranks.valuesAtRanksBy]] — the grouped rank kernel, NOT a
    * `row_number() OVER (PARTITION BY lang ORDER BY score)` window: a
    * low-cardinality partition key means each language's whole corpus
    * slice would land in one partition, the same 100 TB scale-killer
    * as a global window. Docs tying a threshold land in the lower
    * bucket, so bucket assignment is a pure integer comparison and
    * both engines derive the identical census (the DuckDB oracle runs
    * the per-lang window formulation — the equivalence is the claim).
    *
    * The per-doc score frame is localCheckpoint'ed: three consumers
    * (the rank counts, the kernel, the final census) would otherwise
    * each replay tokenize→train→score ([[perplexityFilter]]'s
    * discipline).
    */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val perDoc = toks.join(unigramModel(spark, sfDir), "t")
      .groupBy("doc_id", "lang")
      .agg(expr("sum(micro_nats) div count(1)").as("avg_micro_nats"))
      .transform(graft.Ckpt.pin("TextOps.ccnetBuckets.perDoc"))
    val cutRanks = perDoc.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), explode(array(
        struct(lit("t1").as("qlabel"), expr("(n + 2) div 3").as("cut_rk")),
        struct(lit("t2").as("qlabel"), expr("(2 * n + 2) div 3").as("cut_rk")))).as("q"))
      .select(col("lang"), col("q.qlabel").as("qlabel"), col("q.cut_rk").as("cut_rk"))
    val thr = Ranks
      .valuesAtRanksBy(perDoc, "lang", "avg_micro_nats", cutRanks, SurpriseBucketWidth)
      .groupBy("lang")
      .agg(
        max(when(col("qlabel") === "t1", col("thr"))).as("thr1"),
        max(when(col("qlabel") === "t2", col("thr"))).as("thr2"))
    perDoc.join(broadcast(thr), "lang")
      .withColumn("bucket",
        when(col("avg_micro_nats") <= col("thr1"), "head")
          .when(col("avg_micro_nats") <= col("thr2"), "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("doc_id").as("doc_id_sum"),
        sum("avg_micro_nats").as("sum_micro_nats"))
      .orderBy("lang", "bucket")
  }

  private val C4LineWords = 10  // words per derived pseudo-line
  private val C4MinWords = 3    // C4's "remove any line with fewer than 3 words"
  private val C4ContentMod = 1000000000000L

  /** C4-style LINE-level cleaning (Raffel et al. 2020, §2.2 of the T5
    * paper): drop lines with fewer than [[C4MinWords]] words, lines
    * containing the word "javascript", and lines containing a curly
    * brace; drop WHOLE documents containing "lorem" (the lorem-ipsum
    * page rule); reassemble each surviving document from its kept
    * lines in order. The granularity ladder this completes:
    * [[gopherRules]] judges whole docs, [[graft.operators.Dedup.spanRewrite]]
    * rewrites at token level — C4's distinctive move is the LINE.
    *
    * Fixture adaptation (the [[gopherRules]] injection discipline): the
    * synthetic corpus is one unpunctuated line per doc, so lines are
    * derived as fixed [[C4LineWords]]-word windows (making the
    * min-words rule fire naturally on short tail lines), and the
    * policy/brace/lorem triggers are INJECTED onto md5-selected doc
    * slices at an md5-chosen line index — each rule's drop count is
    * therefore self-validating against the known injection rate, and
    * `content_sum` (the [[graft.operators.Dedup.spanRewrite]] md5 fold)
    * certifies every reassembled byte. C4's terminal-punctuation rule
    * is the one omission: with zero punctuation in the generator it
    * would void the corpus rather than exercise a path.
    *
    * Scale: lines derive from an in-stage explode of word-slices (no
    * per-word shuffle); the only shuffle is the doc_id-keyed reassembly
    * aggregate (co-located with [[Tables.fanOut]]'s partitioning), then
    * an O(sources) rollup. Per-doc line buffers are bounded by doc
    * length exactly like spanRewrite's reassembly buffer.
    */
  def c4LineFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("words", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("n_lines", expr(s"(size(words) + ${C4LineWords - 1}) div $C4LineWords"))
      .withColumn("inj_li", expr("(h div 11) % n_lines"))
    val perLine = docs
      .select(col("doc_id"), col("source"), col("h"), col("inj_li"),
        explode(expr("sequence(0, n_lines - 1)")).as("li"),
        col("words"))
      .withColumn("line0",
        array_join(expr(s"slice(words, li * $C4LineWords + 1, $C4LineWords)"), " "))
      .withColumn("line", concat(col("line0"),
        when(col("h") % 11 === 0 && col("li") === col("inj_li"), lit(" javascript"))
          .when(col("h") % 11 === 1 && col("li") === col("inj_li"), lit(" {"))
          .when(col("h") % 11 === 2 && col("li") === col("inj_li"), lit(" lorem ipsum"))
          .otherwise(lit(""))))
      .withColumn("lw", split(col("line"), " "))
      .withColumn("f_short", size(col("lw")) < C4MinWords)
      .withColumn("f_policy", array_contains(col("lw"), "javascript"))
      .withColumn("f_brace", array_contains(col("lw"), "{"))
      .withColumn("has_lorem", array_contains(col("lw"), "lorem"))
      .withColumn("kept", !col("f_short") && !col("f_policy") && !col("f_brace"))
    val perDoc = perLine.groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("f_short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("f_policy"), 1L).otherwise(0L)).as("n_policy"),
        sum(when(col("f_brace"), 1L).otherwise(0L)).as("n_brace"),
        max(when(col("has_lorem"), 1L).otherwise(0L)).as("doc_lorem"),
        expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN kept THEN struct(li, line) END)), s -> s.line), ' ')").as("cleaned"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("doc_lorem").as("docs_dropped"),
        sum(when(col("doc_lorem") === 1L || col("n_kept") < col("n_lines"), 1L)
          .otherwise(0L)).as("docs_changed"),
        sum("n_lines").as("lines_total"),
        sum("n_kept").as("lines_kept"),
        sum("n_short").as("drop_short"),
        sum("n_policy").as("drop_policy"),
        sum("n_brace").as("drop_brace"),
        sum(when(col("doc_lorem") === 0L,
          expr(s"cast(conv(substr(md5(cleaned), 1, 15), 16, 10) as bigint) % $C4ContentMod"))
          .otherwise(0L)).as("content_sum"))
      .orderBy("source")
  }

  private val WinnowWindow = 4     // consecutive gram hashes per window
  private val WinnowHashMod = 1L << 20 // hash range AND the (h,pos) pack base
  private val WinnowDfCap = 50     // drop fingerprints shared by > cap docs

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS algorithm): hash every word 3-gram, slide a
    * window of [[WinnowWindow]] consecutive gram hashes over each
    * document, and keep the RIGHTMOST MINIMUM per window. The selected
    * set is a position-robust local fingerprint: any shared substring
    * of ≥ window+gram tokens between two documents is GUARANTEED to
    * contribute at least one common selected hash — the detection
    * guarantee whole-document hashes ([[fingerprint]]) and random
    * sketches (minhash) don't give.
    *
    * The rightmost-min-with-tiebreak selection is ONE window-function
    * `min` over a packed code `h * 2^20 + (2^20-1-pos)` — smallest hash
    * wins, ties break to the largest position — so the winnow pass is a
    * per-document sort, never a global one. Overlap mining then
    * equi-joins documents on selected hashes with a document-frequency
    * cap ([[WinnowDfCap]], the standard "too-common fingerprint" drop
    * that keeps boilerplate from exploding the candidate join — same
    * role as minhash's band-bucket bound).
    *
    * Scale: gram hashing is a projection; the winnow min is a window
    * partitioned BY DOC (parallel across docs, state = 4 rows); the
    * join key space is capped at [[WinnowDfCap]]² pairs per fingerprint.
    * Integer-exact everywhere; md5-derived hashes are SQL-recomputable
    * so the DuckDB oracle rebuilds identical fingerprints.
    */
  def winnowing(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.fanOut(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("tokens", split(lower(trim(col("text"))), "\\s+"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextExpressions.word_ngrams(col("tokens"), 3))
          .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        expr(s"cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint) % $WinnowHashMod")
          .as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(WinnowWindow - 1), 0)
    val fps = grams
      .withColumn("code", col("h") * WinnowHashMod + (lit(WinnowHashMod - 1) - col("pos")))
      .withColumn("sel", min("code").over(win))
      .filter(col("pos") >= WinnowWindow - 1) // full windows only
      .select(col("doc_id"), expr(s"sel div $WinnowHashMod").as("h"))
      .distinct()
      // fps ×2 consumers (the df census + the keep join) and kept ×3
      // (self-join both sides + perDoc) — checkpoint both so the
      // 3-gram md5 + winnow-window chain runs once, not 4-5× per
      // subtree (r13-opt, the bandedCandidates discipline; both frames
      // are winnow-selected fingerprint sets, far below token mass)
      .transform(graft.Ckpt.pin("TextOps.winnowing.fps"))
    val kept = fps.join(
      fps.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") <= WinnowDfCap),
      "h")
      .transform(graft.Ckpt.pin("TextOps.winnowing.kept"))
    val perDoc = kept.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .join(perDoc.select(col("doc_id").as("doc_a"), col("n_fp").as("fp_a")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("n_fp").as("fp_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_fp"), col("fp_a"), col("fp_b"),
        expr("(1000000 * shared_fp) div least(fp_a, fp_b)").as("overlap_ppm"))
      .orderBy(col("shared_fp").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  val registry: Map[String, Q] = Map(
    "x_text_winnowing" -> winnowing _,
    "x_c4_line_filter" -> c4LineFilter _,
    "x_ccnet_buckets" -> ccnetBuckets _,
    "x_gopher_rules" -> gopherRules _,
    "x_gopher_ablation" -> gopherAblation _,
    "x_text_len_hist" -> lengthHist _,
    "x_text_entropy" -> charEntropy _,
    "x_pii_scrub" -> piiScrub _,
    "x_bpe_pairs" -> bpePairs _,
    "x_bpe_train" -> bpeTrain _,
    "x_bpe_apply" -> bpeApply _,
    "x_text_zipf" -> zipfFit _,
    "x_text_heaps" -> heapsLaw _,
    "x_tokenizer_fertility" -> tokenizerFertility _,
    "x_text_heavy_hitters" -> heavyHitters _,
    "x_mix_kl" -> mixKl _,
    "x_text_jsd" -> jsdSources _,
    "x_text_readability" -> readability _,
    "x_text_bigram_lm" -> bigramSurprise _,
    "x_text_pmi" -> pmiCollocations _,
    "x_eval_ndcg" -> ndcgAt10 _,
    "x_eval_mrr" -> mrrAt10 _,
    "x_eval_ap" -> apAt10 _,
    "x_text_burstiness" -> burstiness _,
    "x_curriculum_phases" -> curriculumPhases _,
    "x_text_kn_lm" -> knBigramSurprise _,
    "x_text_bm25" -> bm25TopDocs _,
    "x_hybrid_rrf" -> hybridRrf _,
    "x_quality_classifier" -> qualityClassifier _,
    "x_quality_calibration" -> qualityCalibration _,
    "x_quality_rank_corr" -> qualityRankCorr _,
    "x_text_feature_hashing" -> featureHashing _,
    "x_quality_kappa" -> qualityKappa _,
    "x_vocab_coverage" -> vocabCoverage _,
    "x_filter_funnel" -> filterFunnel _,
    "x_text_repetition" -> repetition _,
    "x_text_unigram_lm" -> unigramSurprise _,
    "x_dsir_resample" -> dsirResample _,
    "x_text_typo_pairs" -> typoPairs _,
    "x_perplexity_filter" -> perplexityFilter _,
    "x_pipeline_select" -> pipelineSelect _,
    "x_text_chunks" -> chunkDocs _,
    "x_text_tfidf" -> tfidfTopTerms _,
    "x_text_tokens" -> tokenStats _,
    "x_text_quality" -> qualityScore _,
    "x_text_langid" -> langId _,
    "x_text_fingerprint" -> fingerprint _,
  )

  /** The DuckDB re-training of [[bpeTrain]]: the same base vocabulary
    * CTE, then [[BpeMerges]] generated iteration blocks — pair count,
    * deterministic argmax, delimiter-aware replace — exactly the
    * unrolled-iteration oracle discipline of x_emb_pagerank. DuckDB
    * `replace` shares Spark's greedy left-to-right replace-all
    * semantics, so the vocab states stay bit-identical round by round.
    */
  private def bpeTrainOracle: String = {
    val finals = (1 to BpeMerges)
      .map(k => s"SELECT $k AS step, pair, pc FROM mk$k")
      .mkString(" UNION ALL ")
    s"""$bpeTrainCtes
       |SELECT step, split_part(pair, ' ', 1) AS left_sym,
       | split_part(pair, ' ', 2) AS right_sym,
       | replace(pair, ' ', '') AS merged, pc AS pair_count
       |FROM ($finals) ORDER BY step""".stripMargin
  }

  /** The shared trainer CTE chain (base vocabulary + [[BpeMerges]]
    * unrolled rounds) — the apply oracle re-derives the merge table
    * through the SAME chain, so train and apply stay in lock-step by
    * construction.
    */
  private def bpeTrainCtes: String = {
    val base =
      """WITH w0 AS (
        | SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        | FROM documents),
        |wf AS MATERIALIZED (
        | SELECT word, count(*)::BIGINT AS cnt FROM w0
        | WHERE regexp_full_match(word, '[a-z]+') AND len(word) BETWEEN 2 AND 12
        | GROUP BY word ORDER BY cnt DESC, word LIMIT """.stripMargin + BpeVocabCap +
        """),
          |v1 AS MATERIALIZED (
          | SELECT '|' || substr(r, 1, len(r) - 1) AS s, cnt
          | FROM (SELECT regexp_replace(word, '(.)', '\1||', 'g') AS r, cnt FROM wf))""".stripMargin
    val rounds = (1 to BpeMerges).map { k =>
      s"""tk$k AS (
         | SELECT cnt, string_split(substr(s, 2, len(s) - 2), '||') AS toks FROM v$k),
         |ik$k AS (
         | SELECT cnt, toks, unnest(range(1, len(toks))) AS i FROM tk$k WHERE len(toks) >= 2),
         |pk$k AS (
         | SELECT toks[i] || ' ' || toks[i + 1] AS pair, sum(cnt)::BIGINT AS pc
         | FROM ik$k GROUP BY pair),
         |mk$k AS MATERIALIZED (SELECT pair, pc FROM pk$k ORDER BY pc DESC, pair LIMIT 1),
         |v${k + 1} AS MATERIALIZED (
         | SELECT replace(s,
         |   '|' || split_part((SELECT pair FROM mk$k), ' ', 1) ||
         |   '||' || split_part((SELECT pair FROM mk$k), ' ', 2) || '|',
         |   '|' || replace((SELECT pair FROM mk$k), ' ', '') || '|') AS s, cnt
         | FROM v$k)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  /** DuckDB oracle for [[bpeApply]]: the trainer chain yields mk1..mk8,
    * then the corpus words fold through the same 8 delimiter-aware
    * replaces (nested scalar-subquery literals) and the per-source
    * token accounting reduces it — entirely self-contained re-training
    * plus re-tokenization.
    */
  /** [[bpeApplyOracle]]'s merge-fold apply, censused per LANGUAGE with
    * the fertility/chars-per-token ratios — the [[tokenizerFertility]]
    * twin. All ratios positive integer ppm (// == div).
    */
  private def fertilityOracle: String = {
    val folded = (1 to BpeMerges).foldLeft("s") { (acc, k) =>
      s"""replace($acc,
         |   '|' || split_part((SELECT pair FROM mk$k), ' ', 1) ||
         |   '||' || split_part((SELECT pair FROM mk$k), ' ', 2) || '|',
         |   '|' || replace((SELECT pair FROM mk$k), ' ', '') || '|')""".stripMargin
    }
    s"""$bpeTrainCtes,
       |wa AS (
       | SELECT lang, word FROM (
       |  SELECT lang,
       |   unnest(regexp_split_to_array(lower(trim(text)), ${"'\\s+'"})) AS word
       |  FROM documents)
       | WHERE regexp_full_match(word, '[a-z]+') AND len(word) BETWEEN 2 AND 12),
       |delim AS (
       | SELECT lang, word, '|' || substr(r, 1, len(r) - 1) AS s FROM (
       |  SELECT lang, word,
       |   regexp_replace(word, '(.)', ${"'\\1||'"}, 'g') AS r FROM wa)),
       |ap AS (
       | SELECT lang, len(word)::BIGINT AS n_chars,
       |  ((len(t) - len(replace(t, '|', '')) - 2) // 2 + 1)::BIGINT AS n_toks
       | FROM (SELECT lang, word, $folded AS t FROM delim))
       |SELECT lang, count(*) AS n_words, sum(n_chars)::BIGINT AS n_chars,
       | sum(n_toks)::BIGINT AS n_bpe_tokens,
       | (sum(n_toks) * 1000000 // count(*))::BIGINT AS fertility_ppm,
       | (sum(n_chars) * 1000000 // sum(n_toks))::BIGINT AS chars_per_token_ppm
       |FROM ap GROUP BY lang ORDER BY lang""".stripMargin
  }

  private def bpeApplyOracle: String = {
    val folded = (1 to BpeMerges).foldLeft("s") { (acc, k) =>
      s"""replace($acc,
         |   '|' || split_part((SELECT pair FROM mk$k), ' ', 1) ||
         |   '||' || split_part((SELECT pair FROM mk$k), ' ', 2) || '|',
         |   '|' || replace((SELECT pair FROM mk$k), ' ', '') || '|')""".stripMargin
    }
    s"""$bpeTrainCtes,
       |wa AS (
       | SELECT source, word FROM (
       |  SELECT source,
       |   unnest(regexp_split_to_array(lower(trim(text)), ${"'\\s+'"})) AS word
       |  FROM documents)
       | WHERE regexp_full_match(word, '[a-z]+') AND len(word) BETWEEN 2 AND 12),
       |delim AS (
       | SELECT source, word, '|' || substr(r, 1, len(r) - 1) AS s FROM (
       |  SELECT source, word,
       |   regexp_replace(word, '(.)', ${"'\\1||'"}, 'g') AS r FROM wa)),
       |ap AS (
       | SELECT source, len(word)::BIGINT AS n_chars,
       |  ((len(t) - len(replace(t, '|', '')) - 2) // 2 + 1)::BIGINT AS n_toks
       | FROM (SELECT source, word, $folded AS t FROM delim))
       |SELECT source, count(*) AS n_words, sum(n_chars)::BIGINT AS n_chars,
       | sum(n_toks)::BIGINT AS n_bpe_tokens,
       | ((sum(n_chars) - sum(n_toks)) * 1000000 // sum(n_chars))::BIGINT AS saved_ppm
       |FROM ap GROUP BY source ORDER BY source""".stripMargin
  }

  /** The BM25 pipeline as composable CTEs (exposes `bmdoc(doc_id,
    * source, bm25_micro, n_terms_hit)`), shared by the retrieval
    * oracle and the hybrid-fusion oracle.
    */
  private val bm25OracleCtes: String =
    s"""tok AS (
       | SELECT doc_id, source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       | FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |nn AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |tf AS (
       | SELECT doc_id, tok, count(*) AS tf FROM tok
       | WHERE tok IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
       | GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |bsc AS (
       | SELECT f.doc_id,
       |  round(ln(((SELECT n FROM nn)::DOUBLE - d.df + 0.5) / (d.df + 0.5) + 1.0)
       |   * ((f.tf * ($Bm25K1 + 1.0)) / (f.tf + $Bm25K1 * ((1.0 - $Bm25B)
       |      + ($Bm25B * l.dl) / ((SELECT total FROM nn)::DOUBLE / (SELECT n FROM nn)::DOUBLE))))
       |   * 1000000)::BIGINT AS micro
       | FROM tf f JOIN dfreq d USING (tok) JOIN dl l USING (doc_id)),
       |bmdoc AS (
       | SELECT s.doc_id, doc.source, sum(s.micro)::BIGINT AS bm25_micro,
       |  count(*)::BIGINT AS n_terms_hit
       | FROM bsc s JOIN documents doc ON doc.doc_id = s.doc_id
       | GROUP BY s.doc_id, doc.source)""".stripMargin

  /** Shared DuckDB CTEs rebuilding the per-doc Gopher flags (identical
    * md5 injection, identical integer cross-multiplied rule forms) —
    * consumed by the x_gopher_rules and x_gopher_ablation oracles.
    */
  private val gopherOracleCtes: String =
    """base AS (
      | SELECT doc_id, source,
      |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h,
      |  len(regexp_split_to_array(lower(trim(text)), '\s+')) AS wc0,
      |  lower(trim(text)) AS txt
      | FROM documents),
      |noised AS (
      | SELECT doc_id, source,
      |  txt || CASE WHEN h % 7 = 0 THEN repeat(' #', ((wc0 + 4) // 5)::INT)
      |              WHEN h % 7 = 1 THEN repeat(' 1234', ((wc0 + 2) // 3)::INT)
      |              ELSE '' END AS noised
      | FROM base),
      |tok AS (
      | SELECT doc_id, source, unnest(regexp_split_to_array(noised, '\s+')) AS t
      | FROM noised),
      |per_doc AS (
      | SELECT doc_id, source,
      |  count(*) AS wc, sum(len(t)) AS charsum,
      |  sum(CASE WHEN t = '#' THEN 1 ELSE 0 END) AS n_sym,
      |  sum(CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
      |  max(CASE WHEN t = 'the' THEN 1 ELSE 0 END)
      |   + max(CASE WHEN t = 'a' THEN 1 ELSE 0 END)
      |   + max(CASE WHEN t = 'and' THEN 1 ELSE 0 END)
      |   + max(CASE WHEN t = 'to' THEN 1 ELSE 0 END)
      |   + max(CASE WHEN t = 'of' THEN 1 ELSE 0 END) AS stop_hits
      | FROM tok GROUP BY doc_id, source),
      |flags AS (
      | SELECT doc_id, source,
      |  wc BETWEEN 50 AND 100000 AS r_wc,
      |  3 * wc <= charsum AND charsum <= 10 * wc AS r_mwl,
      |  10 * n_sym <= wc AS r_sym,
      |  10 * n_alpha >= 8 * wc AS r_alpha,
      |  stop_hits >= 2 AS r_stop
      | FROM per_doc)""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical gram windows, packed rightmost-min selection, df cap
    // and ppm arithmetic (all integers, so div/// parity holds)
    "x_text_winnowing" ->
      s"""WITH t AS (SELECT doc_id,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
         |g AS (
         | SELECT doc_id, i AS pos,
         |  ('0x' || substr(md5(array_to_string(toks[i+1:least(i+3, len(toks))], ' ')), 1, 15))::BIGINT
         |    % $WinnowHashMod AS h
         | FROM t, (SELECT unnest(range(0, (SELECT max(greatest(len(toks) - 3, 0)) + 1 FROM t))) AS i) r
         | WHERE i <= greatest(len(toks) - 3, 0)),
         |s AS (
         | SELECT doc_id, pos,
         |  min(h * $WinnowHashMod + (${WinnowHashMod - 1} - pos)) OVER (
         |   PARTITION BY doc_id ORDER BY pos
         |   ROWS BETWEEN ${WinnowWindow - 1} PRECEDING AND CURRENT ROW) AS sel
         | FROM g),
         |f AS (SELECT DISTINCT doc_id, sel // $WinnowHashMod AS h FROM s
         |      WHERE pos >= ${WinnowWindow - 1}),
         |k AS (SELECT f.doc_id, f.h FROM f
         |      JOIN (SELECT h FROM f GROUP BY h HAVING count(*) <= $WinnowDfCap) d USING (h)),
         |c AS (SELECT doc_id, count(*) AS n_fp FROM k GROUP BY doc_id),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fp
         |      FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, p.shared_fp::BIGINT AS shared_fp,
         | ca.n_fp::BIGINT AS fp_a, cb.n_fp::BIGINT AS fp_b,
         | ((1000000 * p.shared_fp) // least(ca.n_fp, cb.n_fp))::BIGINT AS overlap_ppm
         |FROM p JOIN c ca ON ca.doc_id = p.doc_a JOIN c cb ON cb.doc_id = p.doc_b
         |ORDER BY shared_fp DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // identical line derivation, injections, rule battery and ordered
    // reassembly; content_sum certifies every surviving cleaned doc
    "x_c4_line_filter" ->
      s"""WITH d AS (
         | SELECT doc_id, source,
         |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS words
         | FROM documents),
         |d2 AS (
         | SELECT *, (len(words) + ${C4LineWords - 1}) // $C4LineWords AS n_lines,
         |  (h // 11) % ((len(words) + ${C4LineWords - 1}) // $C4LineWords) AS inj_li
         | FROM d),
         |pl AS (
         | SELECT doc_id, source, li,
         |  array_to_string(words[li * $C4LineWords + 1 : li * $C4LineWords + $C4LineWords], ' ') ||
         |   CASE WHEN h % 11 = 0 AND li = inj_li THEN ' javascript'
         |        WHEN h % 11 = 1 AND li = inj_li THEN ' {'
         |        WHEN h % 11 = 2 AND li = inj_li THEN ' lorem ipsum'
         |        ELSE '' END AS line
         | FROM d2, (SELECT unnest(range(0, (SELECT max(n_lines) FROM d2))) AS li) r
         | WHERE li < n_lines),
         |rl AS (
         | SELECT doc_id, source, li, line,
         |  len(string_split(line, ' ')) < $C4MinWords AS f_short,
         |  list_contains(string_split(line, ' '), 'javascript') AS f_policy,
         |  list_contains(string_split(line, ' '), '{') AS f_brace,
         |  list_contains(string_split(line, ' '), 'lorem') AS has_lorem
         | FROM pl),
         |pd AS (
         | SELECT doc_id, source,
         |  count(*) AS n_lines,
         |  sum(CASE WHEN NOT f_short AND NOT f_policy AND NOT f_brace THEN 1 ELSE 0 END) AS n_kept,
         |  sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS n_short,
         |  sum(CASE WHEN f_policy THEN 1 ELSE 0 END) AS n_policy,
         |  sum(CASE WHEN f_brace THEN 1 ELSE 0 END) AS n_brace,
         |  max(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS doc_lorem,
         |  coalesce(string_agg(CASE WHEN NOT f_short AND NOT f_policy AND NOT f_brace
         |    THEN line END, ' ' ORDER BY li), '') AS cleaned
         | FROM rl GROUP BY doc_id, source)
         |SELECT source, count(*)::BIGINT AS n_docs,
         | sum(doc_lorem)::BIGINT AS docs_dropped,
         | sum(CASE WHEN doc_lorem = 1 OR n_kept < n_lines THEN 1 ELSE 0 END)::BIGINT AS docs_changed,
         | sum(n_lines)::BIGINT AS lines_total,
         | sum(n_kept)::BIGINT AS lines_kept,
         | sum(n_short)::BIGINT AS drop_short,
         | sum(n_policy)::BIGINT AS drop_policy,
         | sum(n_brace)::BIGINT AS drop_brace,
         | sum(CASE WHEN doc_lorem = 0
         |   THEN ('0x' || substr(md5(cleaned), 1, 15))::BIGINT % $C4ContentMod
         |   ELSE 0 END)::BIGINT AS content_sum
         |FROM pd GROUP BY source ORDER BY source""".stripMargin,
    "x_bpe_train" -> bpeTrainOracle,
    "x_bpe_apply" -> bpeApplyOracle,
    // identical integer least-squares over identically-quantized
    // milli-nat logs; all divisions arranged positive (// == div)
    "x_text_zipf" ->
      s"""WITH c AS (
         | SELECT t, count(*) AS cnt FROM (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         |  FROM documents)
         | GROUP BY t),
         |top AS (SELECT t, cnt FROM c ORDER BY cnt DESC, t LIMIT $ZipfTopK),
         |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rank FROM top),
         |q AS (SELECT round(ln(rank::DOUBLE) * 1000)::BIGINT AS lr,
         |       round(ln(cnt::DOUBLE) * 1000)::BIGINT AS lf FROM r),
         |s AS (SELECT count(*)::BIGINT AS k, sum(lr)::BIGINT AS sx, sum(lf)::BIGINT AS sy,
         |       sum(lr * lr)::BIGINT AS sxx, sum(lr * lf)::BIGINT AS sxy FROM q)
         |SELECT k,
         | (-((sx * sy - k * sxy) * 1000 // (k * sxx - sx * sx)))::BIGINT AS slope_milli,
         | ((sy + ((sx * sy - k * sxy) * 1000 // (k * sxx - sx * sx)) * sx // 1000) // k)::BIGINT AS intercept_milli
         |FROM s""".stripMargin,
    "x_tokenizer_fertility" -> fertilityOracle,
    // identical prefix census (first-occurrence vocabulary, conditional
    // occurrence sums) and milli-nat two-point fit; deltas positive
    "x_text_heaps" ->
      s"""WITH tk AS (
         | SELECT doc_id,
         |  unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |    i -> array_to_string(toks[i:i+2], ' '))) AS t
         | FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), ${"'\\s+'"}) AS toks
         |       FROM documents)),
         |mx AS (SELECT max(doc_id) AS m FROM documents),
         |md AS (SELECT t, min(doc_id) AS fd FROM tk GROUP BY t),
         |cp AS (SELECT i AS checkpoint, (i * (SELECT m FROM mx)) // $HeapsCheckpoints AS c
         |       FROM range(1, ${HeapsCheckpoints + 1}) r(i)),
         |pt AS (
         | SELECT cp.checkpoint, cp.c AS max_doc_id,
         |  (SELECT count(*) FROM tk WHERE doc_id <= cp.c)::BIGINT AS n_tokens,
         |  (SELECT count(*) FROM md WHERE fd <= cp.c)::BIGINT AS n_vocab
         | FROM cp),
         |b AS (SELECT n_tokens AS n1, n_vocab AS v1 FROM pt WHERE checkpoint = 1)
         |SELECT checkpoint::INT AS checkpoint, max_doc_id::BIGINT AS max_doc_id,
         | n_tokens, n_vocab,
         | (n_vocab * 1000000 // n_tokens)::BIGINT AS ttr_ppm,
         | (CASE WHEN checkpoint = 1 THEN 0 ELSE
         |   ((round(ln(n_vocab::DOUBLE) * 1000)::BIGINT
         |     - round(ln((SELECT v1 FROM b)::DOUBLE) * 1000)::BIGINT) * 1000)
         |   // (round(ln(n_tokens::DOUBLE) * 1000)::BIGINT
         |     - round(ln((SELECT n1 FROM b)::DOUBLE) * 1000)::BIGINT) END)::BIGINT AS beta_milli
         |FROM pt ORDER BY checkpoint""".stripMargin,
    // same deletion-neighborhood blocking + exact levenshtein filter
    "x_text_typo_pairs" ->
      """WITH tok0 AS (
        | SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |tok AS (
        | SELECT CASE WHEN h % 10 = 0 AND len(t) >= 4
        |   THEN substr(t, 1, (h % (len(t) - 2))::INT + 1)
        |     || substr(t, (h % (len(t) - 2))::INT + 3)
        |   ELSE t END AS t
        | FROM (SELECT t, ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |       FROM tok0)),
        |vocab AS (
        | SELECT t, count(*) AS cnt FROM tok
        | WHERE len(t) BETWEEN 3 AND 20 GROUP BY t),
        |variants AS (
        | SELECT DISTINCT t, cnt,
        |  CASE WHEN i = 0 THEN t
        |       ELSE substr(t, 1, i - 1) || substr(t, i + 1) END AS v
        | FROM (SELECT t, cnt, unnest(range(0, len(t) + 1)) AS i FROM vocab)),
        |pairs AS (
        | SELECT DISTINCT a.t AS t1, b.t AS t2,
        |  a.cnt::BIGINT AS cnt1, b.cnt::BIGINT AS cnt2
        | FROM variants a JOIN variants b ON a.v = b.v AND a.t < b.t)
        |SELECT t1, t2, cnt1, cnt2 FROM pairs
        |WHERE levenshtein(t1, t2) = 1
        |ORDER BY cnt1 + cnt2 DESC, t1, t2 LIMIT 50""".stripMargin,
    // same hashed-bucket log-ratio model; selection at the exact p75
    // rank cut (rn = (3n+3)//4), ties kept — NOT a sign threshold,
    // which the dsirResample scaladoc argues degenerates
    "x_dsir_resample" ->
      s"""WITH tok AS (
        | SELECT doc_id, source,
        |  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
        | FROM documents),
        |tb AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(t), 1, 15))::BIGINT % $DsirBuckets AS b FROM tok),
        |counts AS (
        | SELECT b,
        |  sum(CASE WHEN substr(source, 4)::INT % 5 = 0 THEN 1 ELSE 0 END)::BIGINT AS ct,
        |  count(*)::BIGINT AS cr
        | FROM tb GROUP BY b),
        |tot AS (SELECT sum(ct)::BIGINT AS tt, sum(cr)::BIGINT AS tr FROM counts),
        |model AS (
        | SELECT b, round((ln((ct + 1)::DOUBLE) - ln((tt + $DsirBuckets)::DOUBLE)
        |   - ln((cr + 1)::DOUBLE) + ln((tr + $DsirBuckets)::DOUBLE)) * 1000000)::BIGINT AS w_micro
        | FROM counts, tot),
        |perdoc AS (
        | SELECT tb.doc_id, tb.source, sum(m.w_micro)::BIGINT AS sum_w_micro
        | FROM tb JOIN model m ON m.b = tb.b GROUP BY 1, 2),
        |nn AS (SELECT count(*)::BIGINT AS n FROM perdoc),
        |thr AS (
        | SELECT sum_w_micro AS thr FROM (
        |  SELECT sum_w_micro, row_number() OVER (ORDER BY sum_w_micro) AS rn
        |  FROM perdoc), nn
        | WHERE rn = (3 * n + 3) // 4)
        |SELECT source, count(*) AS n_docs,
        | sum(CASE WHEN sum_w_micro >= thr THEN 1 ELSE 0 END)::BIGINT AS n_selected,
        | sum(CASE WHEN sum_w_micro >= thr THEN doc_id END)::BIGINT AS selected_id_sum,
        | sum(sum_w_micro)::BIGINT AS w_micro_total
        |FROM perdoc, thr GROUP BY source ORDER BY source""".stripMargin,
    // same stats from data (equal values → identical doubles), same
    // fixed-shape per-(doc,term) expression rounded before the doc sum
    "x_text_bm25" ->
      s"""WITH $bm25OracleCtes
         |SELECT b.doc_id, b.source, b.bm25_micro, b.n_terms_hit
         |FROM bmdoc b
         |ORDER BY b.bm25_micro DESC, b.doc_id ASC LIMIT 20""".stripMargin,
    // same bm25 CTEs; per-term round(rel*1e6/log2(r+1)) quantization,
    // ideal ranks from the 4-row grade census intervals, trunc-div ppm
    "x_eval_ndcg" ->
      s"""WITH $bm25OracleCtes,
         |r AS (
         | SELECT doc_id, row_number() OVER (
         |   ORDER BY bm25_micro DESC, doc_id ASC) AS rank
         | FROM bmdoc QUALIFY rank <= 10),
         |dcg AS (
         | SELECT count(*)::BIGINT AS k,
         |  sum(round((doc_id % 4) * 1000000 / log2((rank + 1)::DOUBLE)))::BIGINT
         |    AS dcg_micro
         | FROM r),
         |cnt AS (SELECT doc_id % 4 AS rel, count(*)::BIGINT AS c
         |        FROM documents GROUP BY 1),
         |iv AS (
         | SELECT rel, sum(c) OVER (ORDER BY rel DESC) - c + 1 AS lo,
         |  least(sum(c) OVER (ORDER BY rel DESC), 10) AS hi
         | FROM cnt QUALIFY lo <= 10),
         |ideal AS (
         | SELECT rel, unnest(generate_series(lo::BIGINT, hi::BIGINT)) AS rank FROM iv),
         |idcg AS (
         | SELECT sum(round(rel * 1000000 / log2((rank + 1)::DOUBLE)))::BIGINT
         |   AS idcg_micro
         | FROM ideal)
         |SELECT k, dcg_micro, idcg_micro,
         | (dcg_micro * 1000000 // idcg_micro)::BIGINT AS ndcg_ppm
         |FROM dcg CROSS JOIN idcg""".stripMargin,
    // same bm25 CTEs + binary top-grade relevance; 0-safe reciprocal
    // rank via the null-propagating division under coalesce
    "x_eval_mrr" ->
      s"""WITH $bm25OracleCtes,
         |r AS (
         | SELECT doc_id, row_number() OVER (
         |   ORDER BY bm25_micro DESC, doc_id ASC) AS rank
         | FROM bmdoc QUALIFY rank <= 10),
         |h AS (
         | SELECT count(*)::BIGINT AS k,
         |  sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END)::BIGINT AS hits,
         |  min(CASE WHEN doc_id % 4 = 3 THEN rank END)::BIGINT AS first_rel
         | FROM r),
         |tr AS (SELECT count(*)::BIGINT AS n_relevant FROM documents WHERE doc_id % 4 = 3)
         |SELECT k, hits, n_relevant,
         | coalesce(1000000 // first_rel, 0)::BIGINT AS mrr_ppm,
         | (hits * 1000000 // 10)::BIGINT AS p10_ppm,
         | (hits * 1000000 // n_relevant)::BIGINT AS r10_ppm
         |FROM h CROSS JOIN tr""".stripMargin,
    // same bm25 CTEs; cumulative hits over the same rank order, each
    // P@k quantized by truncating division before the sum
    "x_eval_ap" ->
      s"""WITH $bm25OracleCtes,
         |r AS (
         | SELECT doc_id, row_number() OVER (
         |   ORDER BY bm25_micro DESC, doc_id ASC) AS rank
         | FROM bmdoc QUALIFY rank <= 10),
         |c AS (
         | SELECT rank, CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS rel,
         |  sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END)
         |    OVER (ORDER BY rank) AS hits_at_k
         | FROM r),
         |h AS (
         | SELECT count(*)::BIGINT AS k, sum(rel)::BIGINT AS hits,
         |  sum(CASE WHEN rel = 1 THEN hits_at_k * 1000000 // rank ELSE 0 END)::BIGINT
         |    AS p_sum_ppm
         | FROM c),
         |tr AS (SELECT count(*)::BIGINT AS n_relevant FROM documents WHERE doc_id % 4 = 3)
         |SELECT k, hits, n_relevant,
         | (p_sum_ppm // least(n_relevant, 10))::BIGINT AS ap_ppm
         |FROM h CROSS JOIN tr""".stripMargin,
    // cf/df from the same (term, doc) grain; total (burst desc, term)
    // order makes the LIMIT 30 cut deterministic cross-engine
    "x_text_burstiness" ->
      """WITH pd AS (
        | SELECT t, doc_id, count(*)::BIGINT AS c
        | FROM (SELECT doc_id,
        |        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |       FROM documents)
        | GROUP BY t, doc_id),
        |g AS (
        | SELECT t AS term, sum(c)::BIGINT AS cf, count(*)::BIGINT AS df
        | FROM pd GROUP BY t)
        |SELECT term, cf, df, (cf * 1000 // df)::BIGINT AS burst_milli
        |FROM g WHERE cf >= 5
        |ORDER BY burst_milli DESC, term ASC LIMIT 30""".stripMargin,
    // both rank lists re-derived (bm25 CTEs + cosine top-20 for vec 0),
    // integer floor-div RRF, absent rank = 0
    "x_hybrid_rrf" ->
      s"""WITH $bm25OracleCtes,
         |bmr AS (
         | SELECT doc_id AS id, row_number() OVER (
         |   ORDER BY bm25_micro DESC, doc_id ASC) AS r_bm25
         | FROM bmdoc QUALIFY r_bm25 <= 20),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |esc AS (
         | SELECT n.vec_id,
         |  round(list_cosine_similarity(q.v, n.v) * 10000)::BIGINT AS sim_m
         | FROM e n, (SELECT v FROM e WHERE vec_id = 0) q
         | WHERE n.vec_id <> 0),
         |emr AS (
         | SELECT vec_id AS id, row_number() OVER (
         |   ORDER BY sim_m DESC, vec_id ASC) AS r_emb
         | FROM esc QUALIFY r_emb <= 20)
         |SELECT coalesce(b.id, m.id) AS id,
         | coalesce(b.r_bm25, 0)::INT AS r_bm25,
         | coalesce(m.r_emb, 0)::INT AS r_emb,
         | (CASE WHEN b.r_bm25 IS NOT NULL THEN 1000000 // ($RrfBase + b.r_bm25) ELSE 0 END
         |  + CASE WHEN m.r_emb IS NOT NULL THEN 1000000 // ($RrfBase + m.r_emb) ELSE 0 END)::BIGINT
         |   AS rrf_ppm
         |FROM bmr b FULL OUTER JOIN emr m ON m.id = b.id
         |ORDER BY rrf_ppm DESC, id ASC LIMIT 10""".stripMargin,
    // same bigram spine; the four KN statistics and the identically-
    // parenthesized single-ln composite, rounded per MODEL ROW
    "x_text_kn_lm" ->
      s"""WITH tok AS (
         | SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         | FROM documents
         | WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 2),
         |idx AS (
         | SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 1)) AS i FROM tok),
         |bgs AS (
         | SELECT doc_id, source, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg FROM idx),
         |c2 AS (SELECT bg, count(*) AS c2,
         |  split_part(bg, ' ', 1) AS mw1, split_part(bg, ' ', 2) AS mw2
         | FROM bgs GROUP BY bg),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bgs GROUP BY w1),
         |n1pr AS (SELECT mw1, count(*) AS n1pr FROM c2 GROUP BY mw1),
         |n1pl AS (SELECT mw2, count(*) AS n1pl FROM c2 GROUP BY mw2),
         |bt AS (SELECT count(*) AS b FROM c2),
         |model AS (
         | SELECT c2.bg,
         |  round(-ln(
         |    ((c2.c2::DOUBLE - $KnDiscount) / c1.c1::DOUBLE)
         |    + ((($KnDiscount * n1pr.n1pr::DOUBLE) / c1.c1::DOUBLE)
         |       * (n1pl.n1pl::DOUBLE / (SELECT b FROM bt)::DOUBLE))
         |  ) * 1000000)::BIGINT AS micro_nats
         | FROM c2 JOIN c1 ON c2.mw1 = c1.w1
         |  JOIN n1pr ON n1pr.mw1 = c2.mw1
         |  JOIN n1pl ON n1pl.mw2 = c2.mw2),
         |per_doc AS (
         | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
         | FROM bgs JOIN model USING (bg) GROUP BY doc_id, source)
         |SELECT source, count(*) AS n_docs,
         | sum(avg_micro_nats)::BIGINT AS sum_avg_micro_nats,
         | min(avg_micro_nats)::BIGINT AS min_surprise,
         | max(avg_micro_nats)::BIGINT AS max_surprise
         |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    "x_text_bigram_lm" ->
      """WITH tok AS (
        | SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        | FROM documents
        | WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2),
        |idx AS (
        | SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 1)) AS i FROM tok),
        |bgs AS (
        | SELECT doc_id, source, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg FROM idx),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bgs GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS vocab FROM bgs),
        |model AS (
        | SELECT c2.bg,
        |  round((ln((c1.c1 + (SELECT vocab FROM v))::DOUBLE)
        |       - ln((c2.c2 + 1)::DOUBLE)) * 1000000)::BIGINT AS micro_nats
        | FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
        |per_doc AS (
        | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
        | FROM bgs JOIN model USING (bg) GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        | sum(avg_micro_nats)::BIGINT AS sum_avg_micro_nats,
        | min(avg_micro_nats)::BIGINT AS min_surprise,
        | max(avg_micro_nats)::BIGINT AS max_surprise
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    // same slot-count probabilities and single composite-ln
    // quantization; (pmi_micro desc, bigram asc) is a total order so
    // the LIMIT 30 cut agrees cross-engine
    "x_text_pmi" ->
      """WITH tok AS (
        | SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        | FROM documents
        | WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2),
        |idx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM tok),
        |p AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
        |n AS (SELECT count(*)::BIGINT AS n FROM p),
        |cxy AS (SELECT w1, w2, count(*)::BIGINT AS c_xy FROM p GROUP BY 1, 2
        |        HAVING count(*) >= 3),
        |cx AS (SELECT w1, count(*)::BIGINT AS c_x FROM p GROUP BY 1),
        |cy AS (SELECT w2, count(*)::BIGINT AS c_y FROM p GROUP BY 1)
        |SELECT cxy.w1 || ' ' || cxy.w2 AS bigram, c_xy, c_x, c_y,
        | round((ln(c_xy::DOUBLE) + ln((SELECT n FROM n)::DOUBLE)
        |  - ln(c_x::DOUBLE) - ln(c_y::DOUBLE)) * 1000000)::BIGINT AS pmi_micro
        |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2)
        |ORDER BY pmi_micro DESC, bigram ASC LIMIT 30""".stripMargin,
    "x_pii_scrub" ->
      s"""WITH per AS (
         | SELECT source, lower(text) AS lowered,
         |  regexp_replace(lower(text), '\\b(${ScrubTerms.mkString("|")})\\b',
         |                 '<redacted>', 'g') AS scrubbed,
         |  len(regexp_extract_all(lower(text), '\\b(${ScrubTerms.mkString("|")})\\b')) AS hits
         | FROM documents)
         |SELECT source, count(*) AS n_docs,
         | sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_hit,
         | sum(hits)::BIGINT AS n_redactions,
         | sum(length(lowered))::BIGINT AS chars_before,
         | sum(length(scrubbed))::BIGINT AS chars_after,
         | sum(('0x' || substr(md5(scrubbed), 1, 15))::BIGINT % 1000000000000)::BIGINT AS scrub_checksum
         |FROM per GROUP BY source ORDER BY source""".stripMargin,
    "x_bpe_pairs" ->
      """WITH tok AS (
        | SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
        |idx AS (
        | SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        | FROM tok WHERE len(t) >= 2),
        |pairs AS (SELECT t[i] || ' ' || t[i + 1] AS pair FROM idx)
        |SELECT pair, count(*) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    // Exact recompute of the sketch top-20: valid because the gate
    // corpus keeps the frequent-items sketch in exact mode (see
    // FreqSketch scaladoc) and the (est desc, token asc) tiebreak
    // pins the rank-20 boundary on both sides.
    "x_text_heavy_hitters" ->
      """WITH tok AS (
        | SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
        |idx AS (
        | SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        | FROM tok WHERE len(t) >= 2),
        |pairs AS (SELECT t[i] || ' ' || t[i + 1] AS token FROM idx)
        |SELECT token, count(*) AS est FROM pairs
        |GROUP BY token ORDER BY est DESC, token LIMIT 20""".stripMargin,
    "x_quality_classifier" ->
      s"""WITH f AS (
         | SELECT source,
         |  (1000000 * len(list_distinct(toks))) // len(toks) AS f_uniq,
         |  (1000000 * ((strlen(padded) - strlen(replace(padded, ' the ', ''))) // 5))
         |    // len(toks) AS f_stop,
         |  least(len(toks), 256) * 3906 AS f_len
         | FROM (SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         |        ' ' || lower(text) || ' ' AS padded FROM documents)),
         |s AS (SELECT source,
         |  (${ClfWeights._1}*f_uniq + ${ClfWeights._2}*f_stop + ${ClfWeights._3}*f_len)
         |    // ${ClfWeights._1 + ClfWeights._2 + ClfWeights._3} AS score FROM f)
         |SELECT source, count(*) AS n_docs,
         | sum(CASE WHEN score >= $ClfThreshold THEN 1 ELSE 0 END)::BIGINT AS n_pass,
         | sum(score)::BIGINT AS score_sum,
         | min(score) AS min_score, max(score) AS max_score
         |FROM s GROUP BY source ORDER BY source""".stripMargin,
    // identical classifier features + Gopher flags joined per doc;
    // every ppm is a truncating division of nonnegative integers so
    // // == div throughout, and the ECE window runs over the same
    // 10-row bin frame on both engines
    "x_quality_calibration" ->
      s"""WITH $gopherOracleCtes,
         |f AS (
         | SELECT doc_id,
         |  (1000000 * len(list_distinct(toks))) // len(toks) AS f_uniq,
         |  (1000000 * ((strlen(padded) - strlen(replace(padded, ' the ', ''))) // 5))
         |    // len(toks) AS f_stop,
         |  least(len(toks), 256) * 3906 AS f_len
         | FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         |        ' ' || lower(text) || ' ' AS padded FROM documents)),
         |clf AS (SELECT doc_id,
         |  (${ClfWeights._1}*f_uniq + ${ClfWeights._2}*f_stop + ${ClfWeights._3}*f_len)
         |    // ${ClfWeights._1 + ClfWeights._2 + ClfWeights._3} AS score FROM f),
         |j AS (
         | SELECT clf.score,
         |  flags.r_wc AND flags.r_mwl AND flags.r_sym AND flags.r_alpha AND flags.r_stop AS pass
         | FROM clf JOIN flags USING (doc_id)),
         |b AS (
         | SELECT least(greatest(score, 0) // 100000, 9)::INT AS bin,
         |  count(*)::BIGINT AS n_docs, sum(score) AS conf_sum,
         |  sum(CASE WHEN pass THEN 1 ELSE 0 END) AS n_pos
         | FROM j GROUP BY 1),
         |b2 AS (
         | SELECT bin, n_docs,
         |  (conf_sum // n_docs)::BIGINT AS conf_ppm,
         |  (n_pos * 1000000 // n_docs)::BIGINT AS acc_ppm
         | FROM b),
         |b3 AS (SELECT *, abs(conf_ppm - acc_ppm)::BIGINT AS gap_ppm FROM b2)
         |SELECT bin, n_docs, conf_ppm, acc_ppm, gap_ppm,
         | (sum(n_docs * gap_ppm) OVER () // sum(n_docs) OVER ())::BIGINT AS ece_ppm
         |FROM b3 ORDER BY bin""".stripMargin,
    // identical classifier + unigram-surprise per-doc scores, identical
    // (value, doc_id) tie-broken ranks; Σd² and the ρ division run in
    // HUGEINT (Spark DECIMAL(38,0)) — exact on both engines
    "x_quality_rank_corr" ->
      s"""WITH f AS (
         | SELECT doc_id, source,
         |  (1000000 * len(list_distinct(toks))) // len(toks) AS f_uniq,
         |  (1000000 * ((strlen(padded) - strlen(replace(padded, ' the ', ''))) // 5))
         |    // len(toks) AS f_stop,
         |  least(len(toks), 256) * 3906 AS f_len
         | FROM (SELECT doc_id, source,
         |        regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         |        ' ' || lower(text) || ' ' AS padded FROM documents)),
         |clf AS (SELECT doc_id, source,
         |  (${ClfWeights._1}*f_uniq + ${ClfWeights._2}*f_stop + ${ClfWeights._3}*f_len)
         |    // ${ClfWeights._1 + ClfWeights._2 + ClfWeights._3} AS score FROM f),
         |toks AS (
         | SELECT doc_id, source,
         |  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         | FROM documents),
         |model AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |scored AS (
         | SELECT t, round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1000000)::BIGINT AS micro_nats
         | FROM model, tot),
         |per_doc AS (
         | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
         | FROM toks JOIN scored USING (t) GROUP BY doc_id, source),
         |r AS (
         | SELECT clf.source,
         |  row_number() OVER (PARTITION BY clf.source
         |    ORDER BY clf.score ASC, clf.doc_id ASC) AS r1,
         |  row_number() OVER (PARTITION BY clf.source
         |    ORDER BY p.avg_micro_nats DESC, clf.doc_id ASC) AS r2
         | FROM clf JOIN per_doc p ON clf.doc_id = p.doc_id AND clf.source = p.source),
         |agg AS (
         | SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(((r1 - r2) * (r1 - r2))::HUGEINT) AS sum_d2
         | FROM r GROUP BY source)
         |SELECT source, n_docs,
         | (sum_d2 // n_docs)::BIGINT AS mean_d2,
         | (CASE WHEN n_docs > 1 THEN
         |   1000000 - (6000000::HUGEINT * sum_d2)
         |     // (n_docs::HUGEINT * (n_docs::HUGEINT * n_docs - 1))
         |  ELSE 1000000 END)::BIGINT AS rho_micro
         |FROM agg ORDER BY source""".stripMargin,
    // identical classifier threshold + Gopher all-rules label; the 2x2
    // cells, E, and κ run in HUGEINT with κ computed on the absolute
    // numerator and re-signed (floor-vs-trunc parity on negatives)
    "x_quality_kappa" ->
      s"""WITH $gopherOracleCtes,
         |f AS (
         | SELECT doc_id, source,
         |  (1000000 * len(list_distinct(toks))) // len(toks) AS f_uniq,
         |  (1000000 * ((strlen(padded) - strlen(replace(padded, ' the ', ''))) // 5))
         |    // len(toks) AS f_stop,
         |  least(len(toks), 256) * 3906 AS f_len
         | FROM (SELECT doc_id, source,
         |        regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         |        ' ' || lower(text) || ' ' AS padded FROM documents)),
         |clf AS (SELECT doc_id, source,
         |  ((${ClfWeights._1}*f_uniq + ${ClfWeights._2}*f_stop + ${ClfWeights._3}*f_len)
         |    // ${ClfWeights._1 + ClfWeights._2 + ClfWeights._3}) >= $ClfThreshold AS clf_pass
         | FROM f),
         |j AS (
         | SELECT clf.source, clf.clf_pass,
         |  flags.r_wc AND flags.r_mwl AND flags.r_sym AND flags.r_alpha AND flags.r_stop AS gopher_pass
         | FROM clf JOIN flags USING (doc_id)),
         |cells AS (
         | SELECT source,
         |  sum(CASE WHEN clf_pass AND gopher_pass THEN 1 ELSE 0 END)::BIGINT AS n_both,
         |  sum(CASE WHEN clf_pass AND NOT gopher_pass THEN 1 ELSE 0 END)::BIGINT AS n_clf_only,
         |  sum(CASE WHEN NOT clf_pass AND gopher_pass THEN 1 ELSE 0 END)::BIGINT AS n_gopher_only,
         |  sum(CASE WHEN NOT clf_pass AND NOT gopher_pass THEN 1 ELSE 0 END)::BIGINT AS n_neither
         | FROM j GROUP BY source),
         |k AS (
         | SELECT *,
         |  (n_both + n_clf_only + n_gopher_only + n_neither)::BIGINT AS n_docs,
         |  ((n_both + n_clf_only)::HUGEINT * (n_both + n_gopher_only)
         |   + (n_gopher_only + n_neither)::HUGEINT * (n_clf_only + n_neither)) AS e_raw
         | FROM cells),
         |k2 AS (
         | SELECT *,
         |  n_docs::HUGEINT * (n_both + n_neither) - e_raw AS kappa_num,
         |  n_docs::HUGEINT * n_docs - e_raw AS kappa_den
         | FROM k)
         |SELECT source, n_docs, n_both, n_clf_only, n_gopher_only, n_neither,
         | ((n_both + n_neither) * 1000000 // n_docs)::BIGINT AS po_ppm,
         | (e_raw * 1000000 // (n_docs::HUGEINT * n_docs))::BIGINT AS pe_ppm,
         | (CASE WHEN kappa_den = 0 THEN 0
         |       WHEN kappa_num >= 0 THEN kappa_num * 1000000 // kappa_den
         |       ELSE -((-kappa_num) * 1000000 // kappa_den) END)::BIGINT AS kappa_ppm
         |FROM k2 ORDER BY source""".stripMargin,
    // same (token, cnt) model + 60-bit md5 prefix; the ladder explodes
    // the model, and every column is exact integer arithmetic
    "x_text_feature_hashing" ->
      s"""WITH model AS (
         | SELECT t, count(*)::BIGINT AS cnt,
         |  ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
         | FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         |       FROM documents)
         | GROUP BY t),
         |lad AS (
         | SELECT dim, h % dim AS b, cnt
         | FROM model, (SELECT unnest([${HashDims.mkString(", ")}]) AS dim)),
         |pb AS (
         | SELECT dim, b, count(*)::BIGINT AS types, sum(cnt)::BIGINT AS mass
         | FROM lad GROUP BY dim, b)
         |SELECT dim, sum(types)::BIGINT AS n_types,
         | count(*)::BIGINT AS n_occupied,
         | sum(CASE WHEN types >= 2 THEN types ELSE 0 END)::BIGINT AS n_collided_types,
         | max(types)::BIGINT AS max_bucket_types,
         | (sum(CASE WHEN types >= 2 THEN mass ELSE 0 END) * 1000000
         |   // sum(mass))::BIGINT AS collided_mass_ppm
         |FROM pb GROUP BY dim ORDER BY dim""".stripMargin,
    "x_vocab_coverage" ->
      s"""WITH toks AS (
         | SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         | FROM documents),
         |counts AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         |ranked AS (
         | SELECT cnt,
         |  row_number() OVER (ORDER BY cnt DESC, t) AS rank,
         |  sum(cnt) OVER (ORDER BY cnt DESC, t ROWS UNBOUNDED PRECEDING) AS cum
         | FROM counts QUALIFY rank <= $VocabTopK),
         |ks AS (SELECT (1::BIGINT << i) AS k FROM range(0, 8) r(i))
         |SELECT k, max(rank) AS n_words, max(cum)::BIGINT AS covered_tokens,
         | ((1000000 * max(cum)) // (SELECT sum(cnt) FROM counts))::BIGINT AS coverage_ppm
         |FROM ks JOIN ranked ON rank <= k
         |GROUP BY k ORDER BY k""".stripMargin,
    "x_filter_funnel" ->
      """WITH per AS (
        | SELECT doc_id,
        |  n_chars >= 150 AS len_ok,
        |  lang = 'en' AS lang_ok,
        |  (len(sh) - len(list_distinct(sh))) * 5 <= len(sh) AS rep_ok,
        |  md5(text) AS fp
        | FROM (SELECT doc_id, lang, n_chars, text,
        |   list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |     i -> array_to_string(toks[i:i+2], ' ')) AS sh
        |  FROM (SELECT doc_id, lang, n_chars, text,
        |        regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents))),
        |flags AS (
        | SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep_ok FROM per)
        |SELECT count(*) AS n_total,
        | sum(CASE WHEN len_ok THEN 1 ELSE 0 END)::BIGINT AS n_len,
        | sum(CASE WHEN len_ok AND lang_ok THEN 1 ELSE 0 END)::BIGINT AS n_lang,
        | sum(CASE WHEN len_ok AND lang_ok AND rep_ok THEN 1 ELSE 0 END)::BIGINT AS n_rep,
        | sum(CASE WHEN len_ok AND lang_ok AND rep_ok AND keep_ok THEN 1 ELSE 0 END)::BIGINT AS n_final
        |FROM flags""".stripMargin,
    "x_text_repetition" ->
      """WITH per AS (
        | SELECT source, len(sh)::BIGINT AS n3, len(list_distinct(sh))::BIGINT AS d3
        | FROM (SELECT source,
        |   list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |     i -> array_to_string(toks[i:i+2], ' ')) AS sh
        |  FROM (SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents)))
        |SELECT source, sum(n3)::BIGINT AS total_3grams, sum(d3)::BIGINT AS distinct_3grams,
        | (((sum(n3) - sum(d3)) * 1000000) // sum(n3))::BIGINT AS dup_ppm,
        | sum(CASE WHEN (n3 - d3) * 5 > n3 THEN 1 ELSE 0 END)::BIGINT AS n_repetitive
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // same micro-nat quantization at the per-token grain; KL clamped
    // at 0 before integer division so truncation agrees cross-engine
    "x_mix_kl" ->
      """WITH toks AS (
        | SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |tot AS (SELECT count(*) AS total FROM toks),
        |corpus AS (SELECT t, count(*) AS cnt_c FROM toks GROUP BY t),
        |per_src AS (SELECT source, t, count(*) AS cnt_s FROM toks GROUP BY source, t),
        |src_tot AS (SELECT source, sum(cnt_s)::BIGINT AS t_s FROM per_src GROUP BY source),
        |terms AS (
        | SELECT p.source, p.cnt_s, s.t_s,
        |  round((ln(p.cnt_s::DOUBLE) - ln(s.t_s::DOUBLE)
        |       - ln(c.cnt_c::DOUBLE) + ln(total::DOUBLE)) * 1000000)::BIGINT AS ln_term_micro,
        |  round(ln(p.cnt_s::DOUBLE) * 1000000)::BIGINT AS ln_cnt_micro
        | FROM per_src p JOIN corpus c USING (t) JOIN src_tot s USING (source), tot),
        |g AS (
        | SELECT source, max(t_s) AS n_tokens,
        |  sum(cnt_s * ln_cnt_micro) AS s_ln, sum(cnt_s * ln_term_micro) AS s_kl
        | FROM terms GROUP BY source)
        |SELECT source, n_tokens::BIGINT AS n_tokens,
        | (round(ln(n_tokens::DOUBLE) * 1000000)::BIGINT - (s_ln // n_tokens))::BIGINT
        |   AS entropy_micro_nats,
        | (greatest(s_kl, 0) // n_tokens)::BIGINT AS kl_micro_nats
        |FROM g ORDER BY source""".stripMargin,
    // identical double widening order inside each ln, single
    // quantization per term, closed-form ln2 tail for absent tokens,
    // both KL parts clamped at 0 before the truncating division
    "x_text_jsd" ->
      """WITH toks AS (
        | SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |nn AS (SELECT count(*)::BIGINT AS n FROM toks),
        |g AS (SELECT t, count(*)::BIGINT AS cnt_g FROM toks GROUP BY t),
        |s AS (SELECT source, t, count(*)::BIGINT AS cnt_s FROM toks GROUP BY 1, 2),
        |ns AS (SELECT source, sum(cnt_s)::BIGINT AS n_s FROM s GROUP BY 1),
        |terms AS (
        | SELECT s.source, ns.n_s, s.cnt_s, g.cnt_g, nn.n,
        |  round(ln(2::DOUBLE * s.cnt_s::DOUBLE * nn.n::DOUBLE /
        |    (s.cnt_s::DOUBLE * nn.n::DOUBLE + g.cnt_g::DOUBLE * ns.n_s::DOUBLE))
        |    * 1000000)::BIGINT AS lp_micro,
        |  round(ln(2::DOUBLE * g.cnt_g::DOUBLE * ns.n_s::DOUBLE /
        |    (s.cnt_s::DOUBLE * nn.n::DOUBLE + g.cnt_g::DOUBLE * ns.n_s::DOUBLE))
        |    * 1000000)::BIGINT AS lq_micro
        | FROM s JOIN g USING (t) JOIN ns USING (source), nn),
        |p AS (
        | SELECT source, max(n_s)::BIGINT AS n_tokens, max(n)::BIGINT AS n,
        |  sum(cnt_s * lp_micro)::BIGINT AS s_p,
        |  sum(cnt_g * lq_micro)::BIGINT AS s_q,
        |  sum(cnt_g)::BIGINT AS g_present
        | FROM terms GROUP BY source)
        |SELECT source, n_tokens,
        | (((greatest(s_p, 0) // n_tokens)
        |   + (greatest(s_q + (n - g_present) * 693147, 0) // n)) // 2)::BIGINT
        |   AS jsd_micro_nats,
        | ((((greatest(s_p, 0) // n_tokens)
        |   + (greatest(s_q + (n - g_present) * 693147, 0) // n)) // 2)
        |   * 1000000 // 693147)::BIGINT AS jsd_ppm
        |FROM p ORDER BY source""".stripMargin,
    // same committed integer FK definition; per-term truncating divs
    "x_text_readability" ->
      """WITH per AS (
        | SELECT source,
        |  greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1)::BIGINT AS w,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS sents,
        |  len(regexp_extract_all(lower(text), '[aeiou]+'))::BIGINT AS syl
        | FROM documents),
        |g AS (
        | SELECT source, 390 * w // sents + 11800 * syl // w - 15590 AS grade_milli
        | FROM per)
        |SELECT source, count(*)::BIGINT AS n_docs,
        | (sum(grade_milli) // count(*))::BIGINT AS mean_grade_milli,
        | min(grade_milli)::BIGINT AS min_grade_milli,
        | max(grade_milli)::BIGINT AS max_grade_milli,
        | sum(CASE WHEN grade_milli > 12000 THEN 1 ELSE 0 END)::BIGINT AS n_college
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "x_text_unigram_lm" ->
      s"""WITH toks AS (
         | SELECT doc_id, source,
         |  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         | FROM documents),
         |model AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |scored AS (
         | SELECT t, round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1000000)::BIGINT AS micro_nats
         | FROM model, tot),
         |per_doc AS (
         | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
         | FROM toks JOIN scored USING (t) GROUP BY doc_id, source)
         |SELECT source, count(*) AS n_docs,
         | sum(avg_micro_nats)::BIGINT AS sum_avg_micro_nats,
         | sum(CASE WHEN avg_micro_nats > $SurpriseMicroNats THEN 1 ELSE 0 END)::BIGINT AS n_high_surprise
         |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    // same per-doc scoring CTEs, then the exact rank-at-ceil(0.9n)
    // threshold and the identical integer keep rule
    "x_perplexity_filter" ->
      s"""WITH toks AS (
         | SELECT doc_id, source,
         |  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         | FROM documents),
         |model AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |scored AS (
         | SELECT t, round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1000000)::BIGINT AS micro_nats
         | FROM model, tot),
         |per_doc AS (
         | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
         | FROM toks JOIN scored USING (t) GROUP BY doc_id, source),
         |nn AS (SELECT count(*) AS n FROM per_doc),
         |thr AS (
         | SELECT avg_micro_nats AS thr FROM (
         |  SELECT avg_micro_nats,
         |   row_number() OVER (ORDER BY avg_micro_nats, doc_id) AS rk
         |  FROM per_doc)
         | WHERE rk = (SELECT (9 * n + 9) // 10 FROM nn))
         |SELECT source, count(*) AS n_docs,
         | sum(CASE WHEN avg_micro_nats <= (SELECT thr FROM thr) THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         | sum(CASE WHEN avg_micro_nats <= (SELECT thr FROM thr) THEN doc_id END)::BIGINT AS kept_id_sum,
         | sum(CASE WHEN avg_micro_nats > (SELECT thr FROM thr) THEN doc_id END)::BIGINT AS dropped_id_sum
         |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    // same per-doc surprise derivation; the three quartile cuts use the
    // single-window rank formulation the Ranks kernel is provably
    // equivalent to; ties co-phase via the identical strict compare
    "x_curriculum_phases" ->
      s"""WITH toks AS (
         | SELECT doc_id, source,
         |  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
         | FROM documents),
         |model AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         |tot AS (SELECT count(*) AS total FROM toks),
         |scored AS (
         | SELECT t, round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1000000)::BIGINT AS micro_nats
         | FROM model, tot),
         |per_doc AS (
         | SELECT doc_id, source, sum(micro_nats) // count(*) AS avg_micro_nats
         | FROM toks JOIN scored USING (t) GROUP BY doc_id, source),
         |nn AS (SELECT count(*) AS n FROM per_doc),
         |rk AS (
         | SELECT avg_micro_nats,
         |  row_number() OVER (ORDER BY avg_micro_nats, doc_id) AS rk
         | FROM per_doc),
         |t1 AS (SELECT avg_micro_nats AS t FROM rk WHERE rk = (SELECT (1 * n + 3) // 4 FROM nn)),
         |t2 AS (SELECT avg_micro_nats AS t FROM rk WHERE rk = (SELECT (2 * n + 3) // 4 FROM nn)),
         |t3 AS (SELECT avg_micro_nats AS t FROM rk WHERE rk = (SELECT (3 * n + 3) // 4 FROM nn)),
         |ph AS (
         | SELECT doc_id, source, avg_micro_nats,
         |  1 + (avg_micro_nats > (SELECT t FROM t1))::INT
         |    + (avg_micro_nats > (SELECT t FROM t2))::INT
         |    + (avg_micro_nats > (SELECT t FROM t3))::INT AS phase
         | FROM per_doc)
         |SELECT phase, source, count(*)::BIGINT AS n_docs,
         | (sum(avg_micro_nats) // count(*))::BIGINT AS mean_micro_nats,
         | sum(doc_id)::BIGINT AS id_sum
         |FROM ph GROUP BY phase, source ORDER BY phase, source""".stripMargin,
    "x_pipeline_select" ->
      """WITH base AS (
        | SELECT doc_id, source, length(text) AS len,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS punct_chars,
        |  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
        |   + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5 AS s_en,
        |  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' der ', ''))) / 5
        |   + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' und ', ''))) / 5 AS s_de,
        |  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' le ', ''))) / 4
        |   + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' et ', ''))) / 4 AS s_fr,
        |  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' el ', ''))) / 4
        |   + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' los ', ''))) / 5 AS s_es,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        | FROM documents),
        |gated AS (
        | SELECT * FROM base
        | WHERE n_tokens >= 30 AND punct_chars::DOUBLE / len < 0.2
        |  AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es),
        |kept AS (
        | SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk FROM gated)
        | WHERE rk = 1)
        |SELECT source, count(*) AS n_kept, sum(n_tokens)::BIGINT AS tokens_kept
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "x_text_chunks" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        | FROM documents WHERE doc_id < 50),
        |c AS (
        | SELECT doc_id, toks,
        |  unnest(generate_series(0, greatest(ceil((len(toks) - 64) / 48.0)::INT, 0))) AS chunk_id
        | FROM t)
        |SELECT doc_id, chunk_id,
        | len(toks[chunk_id*48+1 : least(chunk_id*48+64, len(toks))])::INT AS chunk_len,
        | md5(array_to_string(toks[chunk_id*48+1 : least(chunk_id*48+64, len(toks))], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "x_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, source, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
        |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT source, term,
        |  round(sum(tf) * ln((SELECT n FROM nd)::DOUBLE / df), 4) AS score
        | FROM tf JOIN dft USING (term) GROUP BY source, term, df)
        |SELECT source, term, score FROM (
        | SELECT *, row_number() OVER (PARTITION BY source
        |   ORDER BY score DESC, term ASC) AS rk FROM sc)
        |WHERE rk <= 3 ORDER BY source, term""".stripMargin,
    "x_text_tokens" ->
      """SELECT source,
        | sum(len(regexp_split_to_array(trim(text), '\s+')))::BIGINT AS total_tokens,
        | round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 4) AS avg_tokens,
        | sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')))::BIGINT AS total_bpe_tokens,
        | sum(length(text))::BIGINT AS total_chars,
        | count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_text_quality" ->
      """WITH perdoc AS (SELECT lang, length(text) AS len,
        |  length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS punct_chars,
        |  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS the_hits,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        | FROM documents)
        |SELECT lang, round(avg(len), 4) AS avg_len,
        | round(avg(round(punct_chars::DOUBLE / len, 6)), 6) AS avg_punct_ratio,
        | round(avg(round(the_hits / n_tokens, 6)), 6) AS avg_stopword_ratio,
        | round(avg(round(len::DOUBLE / n_tokens, 6)), 6) AS avg_token_len,
        | count(*) AS n_docs
        |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin,
    "x_text_langid" ->
      """WITH p AS (SELECT lang, ' ' || lower(text) || ' ' AS padded FROM documents),
        |s AS (SELECT lang,
        |  (length(padded) - length(replace(padded, ' the ', ''))) / 5
        |   + (length(padded) - length(replace(padded, ' and ', ''))) / 5 AS s_en,
        |  (length(padded) - length(replace(padded, ' der ', ''))) / 5
        |   + (length(padded) - length(replace(padded, ' und ', ''))) / 5 AS s_de,
        |  (length(padded) - length(replace(padded, ' le ', ''))) / 4
        |   + (length(padded) - length(replace(padded, ' et ', ''))) / 4 AS s_fr,
        |  (length(padded) - length(replace(padded, ' el ', ''))) / 4
        |   + (length(padded) - length(replace(padded, ' los ', ''))) / 5 AS s_es
        | FROM p)
        |SELECT lang, CASE
        |  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |  WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted,
        | count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    // same per-doc scoring CTEs as x_perplexity_filter but grouped by
    // lang; the per-lang window formulation of the tertile cuts (value
    // at rank = score of the row_number-ranked doc — the tie-break
    // never changes the VALUE), identical integer bucket rule
    "x_ccnet_buckets" ->
      """WITH toks AS (
        | SELECT doc_id, lang,
        |  unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |model AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
        |tot AS (SELECT count(*) AS total FROM toks),
        |scored AS (
        | SELECT t, round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1000000)::BIGINT AS micro_nats
        | FROM model, tot),
        |per_doc AS (
        | SELECT doc_id, lang, sum(micro_nats) // count(*) AS avg_micro_nats
        | FROM toks JOIN scored USING (t) GROUP BY doc_id, lang),
        |ranked AS (
        | SELECT *, row_number() OVER (PARTITION BY lang ORDER BY avg_micro_nats, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM per_doc),
        |cuts AS (
        | SELECT lang,
        |  max(CASE WHEN rn = (n + 2) // 3 THEN avg_micro_nats END) AS thr1,
        |  max(CASE WHEN rn = (2 * n + 2) // 3 THEN avg_micro_nats END) AS thr2
        | FROM ranked GROUP BY lang)
        |SELECT lang,
        | CASE WHEN avg_micro_nats <= thr1 THEN 'head'
        |      WHEN avg_micro_nats <= thr2 THEN 'middle'
        |      ELSE 'tail' END AS bucket,
        | count(*) AS n_docs,
        | sum(doc_id)::BIGINT AS doc_id_sum,
        | sum(avg_micro_nats)::BIGINT AS sum_micro_nats
        |FROM per_doc JOIN cuts USING (lang)
        |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    // identical md5 injection (the typo-pairs idiom), identical
    // integer cross-multiplied rule forms; stop_hits as five summed
    // max-flags on both sides
    // identical integer bucketing: length(bin(wc)) - 1 == floor(log2)
    "x_text_len_hist" ->
      """WITH d AS (
        | SELECT source,
        |  len(regexp_split_to_array(lower(trim(text)), '\s+'))::BIGINT AS wc
        | FROM documents),
        |b AS (SELECT source, wc, (len(bin(wc)) - 1)::INT AS len_bucket FROM d)
        |SELECT source, len_bucket, count(*)::BIGINT AS n_docs,
        | sum(wc)::BIGINT AS sum_tokens, min(wc)::BIGINT AS min_tokens,
        | max(wc)::BIGINT AS max_tokens
        |FROM b GROUP BY source, len_bucket ORDER BY source, len_bucket""".stripMargin,
    // same flags CTEs; unique-drop = fails exactly this one rule
    "x_gopher_ablation" ->
      s"""WITH $gopherOracleCtes,
        |nf AS (
        | SELECT source,
        |  (CASE WHEN NOT r_wc THEN 1 ELSE 0 END) + (CASE WHEN NOT r_mwl THEN 1 ELSE 0 END)
        |   + (CASE WHEN NOT r_sym THEN 1 ELSE 0 END) + (CASE WHEN NOT r_alpha THEN 1 ELSE 0 END)
        |   + (CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS n_fail,
        |  r_wc, r_mwl, r_sym, r_alpha, r_stop
        | FROM flags)
        |SELECT source, count(*) AS n_docs,
        | sum(CASE WHEN NOT r_wc AND n_fail = 1 THEN 1 ELSE 0 END)::BIGINT AS uniq_wordcount,
        | sum(CASE WHEN NOT r_mwl AND n_fail = 1 THEN 1 ELSE 0 END)::BIGINT AS uniq_wordlen,
        | sum(CASE WHEN NOT r_sym AND n_fail = 1 THEN 1 ELSE 0 END)::BIGINT AS uniq_symbol,
        | sum(CASE WHEN NOT r_alpha AND n_fail = 1 THEN 1 ELSE 0 END)::BIGINT AS uniq_alpha,
        | sum(CASE WHEN NOT r_stop AND n_fail = 1 THEN 1 ELSE 0 END)::BIGINT AS uniq_stopword,
        | sum(CASE WHEN n_fail >= 2 THEN 1 ELSE 0 END)::BIGINT AS multi_fail,
        | sum(CASE WHEN n_fail = 0 THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |FROM nf GROUP BY source ORDER BY source""".stripMargin,
    "x_gopher_rules" ->
      s"""WITH $gopherOracleCtes
        |SELECT source, count(*) AS n_docs,
        | sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END)::BIGINT AS fail_wordcount,
        | sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END)::BIGINT AS fail_wordlen,
        | sum(CASE WHEN NOT r_sym THEN 1 ELSE 0 END)::BIGINT AS fail_symbol,
        | sum(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END)::BIGINT AS fail_alpha,
        | sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END)::BIGINT AS fail_stopword,
        | sum(CASE WHEN r_wc AND r_mwl AND r_sym AND r_alpha AND r_stop
        |     THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |FROM flags GROUP BY source ORDER BY source""".stripMargin,
    // same micro-nat quantization at the per-(doc, char) grain; the
    // below-mean flag is the integer cross-multiplication, so both
    // engines derive the identical flag set (s_ln, n >= 0 — `div`
    // truncation == `//` floor here)
    "x_text_entropy" ->
      """WITH chars AS (
        | SELECT doc_id, source, unnest(string_split(lower(text), '')) AS c
        | FROM documents),
        |per_char AS (
        | SELECT doc_id, source, c, count(*) AS cnt,
        |  round(ln(count(*)::DOUBLE) * 1000000)::BIGINT AS ln_cnt_micro
        | FROM chars GROUP BY doc_id, source, c),
        |per_doc AS (
        | SELECT doc_id, source,
        |  round(ln(sum(cnt)::DOUBLE) * 1000000)::BIGINT
        |    - (sum(cnt * ln_cnt_micro) // sum(cnt)) AS entropy_micro
        | FROM per_char GROUP BY doc_id, source),
        |mean AS (SELECT count(*) AS n_docs_total, sum(entropy_micro) AS sum_e FROM per_doc)
        |SELECT source, count(*) AS n_docs,
        | sum(entropy_micro)::BIGINT AS sum_entropy_micro,
        | min(entropy_micro)::BIGINT AS min_entropy_micro,
        | max(entropy_micro)::BIGINT AS max_entropy_micro,
        | sum(CASE WHEN entropy_micro * n_docs_total < sum_e THEN 1 ELSE 0 END)::BIGINT
        |   AS n_below_mean
        |FROM per_doc, mean GROUP BY source ORDER BY source""".stripMargin,
    "x_text_fingerprint" ->
      """SELECT source,
        | count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_unique,
        | count(*) AS n_docs,
        | min(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS min_fp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
