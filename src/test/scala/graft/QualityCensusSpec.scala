package graft

import graft.operators.{Curation, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the r13 censuses the DuckDB oracle can't see:
  * bound/consistency invariants, a hand re-derivation of ECE, the
  * LSH band guarantee, and cross-census edge-count agreement.
  */
class QualityCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("noveltyNgram: ppm bounds, overlap <= total, and the ppm identity") {
    val rows = Curation.registry("x_novelty_ngram")(spark, sf).collect()
    assert(rows.nonEmpty, "the eval split must contain docs at sf0.001")
    rows.foreach { r =>
      val total = r.getAs[Long]("n_test_ngrams")
      val ov = r.getAs[Long]("n_overlapping")
      val ppm = r.getAs[Long]("novelty_ppm")
      assert(total > 0 && ov >= 0 && ov <= total)
      assert(ppm === (total - ov) * 1000000L / total,
        "novelty_ppm must be the committed truncating-division identity")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("noveltyNgram: a sub-13-token document yields exactly one whole-doc gram") {
    import spark.implicits._
    val toks = Seq(Tuple1(Seq("only", "five", "words", "right", "here")))
      .toDF("tokens")
    val grams = toks
      .select(graft.functions.TextExpressions.word_ngrams(col("tokens"), 13).as("g"))
      .head().getSeq[String](0)
    assert(grams === Seq("only five words right here"),
      "the short-doc tail must be the single whole-doc window (the oracle mirrors this)")
  }

  test("qualityCalibration: bin partition, confidence bounds, and ECE re-derivation") {
    val rows = TextOps.registry("x_quality_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.documents(spark, sf).count()
    assert(n === corpus, "bins must partition the whole corpus (inner join loses nothing)")
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val conf = r.getAs[Long]("conf_ppm")
      val acc = r.getAs[Long]("acc_ppm")
      assert(bin >= 0 && bin <= 9)
      // mean confidence must lie inside its decile (bin 9 also holds
      // the score == 1e6 cap, still within [900000, 1000000])
      assert(conf >= bin * 100000L && conf <= (bin + 1) * 100000L,
        s"bin $bin mean confidence $conf outside its decile")
      assert(acc >= 0 && acc <= 1000000L)
      assert(r.getAs[Long]("gap_ppm") === math.abs(conf - acc))
    }
    // ECE re-derivation: identical on every row, equal to the
    // N-weighted truncating-division fold of the bins themselves
    val expected = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Long]("gap_ppm")).sum / n
    val eces = rows.map(_.getAs[Long]("ece_ppm")).distinct
    assert(eces === Seq(expected),
      s"ece_ppm must be the single weighted-gap fold, got $eces vs $expected")
  }

  test("minhashCalibration: the band guarantee (candidates share >=4 components) and ppm identities") {
    val rows = graft.operators.Dedup.registry("x_dedup_minhash_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nm = r.getAs[Int]("n_match")
      // an LSH candidate pair collided on some band = its 4 signature
      // components there are equal — the structural floor the census
      // must never dip under
      assert(nm >= 4 && nm <= 16, s"band guarantee violated: n_match=$nm")
      assert(r.getAs[Long]("est_ppm") === nm.toLong * 1000000L / 16L)
      val exact = r.getAs[Long]("mean_exact_ppm")
      assert(exact >= 0 && exact <= 1000000L)
      assert(r.getAs[Long]("bias_ppm") ===
        math.abs(r.getAs[Long]("est_ppm") - exact))
    }
  }

  test("sourceMatrix: unordered cells, ppm floor at the 0.7 cut, and edge total = sweep@70") {
    val cells = graft.operators.Dedup.registry("x_dedup_source_matrix")(spark, sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { c =>
      assert(c.getAs[String]("source_a") <= c.getAs[String]("source_b"),
        "cells must be unordered pairs (source_a <= source_b)")
      // round(j,6) >= 0.7 implies exact ppm >= 699999
      assert(c.getAs[Long]("mean_jaccard_ppm") >= 699999L)
    }
    val total = cells.map(_.getAs[Long]("n_edges")).sum
    val sweep70 = graft.operators.Dedup.registry("x_dedup_threshold_sweep")(spark, sf)
      .collect().find(_.getAs[Int]("threshold_pct") == 70).get.getAs[Long]("n_edges")
    assert(total === sweep70,
      s"matrix must partition exactly the >=0.7 edge set ($total vs sweep $sweep70)")
  }

  test("mixDoremi: anchor at zero excess, monotone weights, and the ppm normalization bound") {
    val rows = Curation.registry("x_mix_doremi")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val ex = r.getAs[Long]("excess_micro_nats")
      assert(ex >= 0 && ex <= 10000000L, "excess must be clamped to [0, 10] nats")
    }
    // the easiest source anchors the update: excess 0 → e_weight 1e6
    assert(rows.count(_.getAs[Long]("excess_micro_nats") == 0L) >= 1)
    // multiplicative weights are monotone in excess
    val byExcess = rows.sortBy(_.getAs[Long]("excess_micro_nats"))
      .map(_.getAs[Long]("weight_ppm"))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b },
      "weight_ppm must be non-decreasing in excess loss")
    // truncating renormalization: sums to 1e6 minus at most one ulp per source
    val s = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(s <= 1000000L && s > 1000000L - rows.length,
      s"weights must renormalize to ppm (got $s)")
  }

  test("qualityRankCorr: rho bounds, mass partition, and a full Scala re-derivation") {
    val rows = TextOps.registry("x_quality_rank_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total,
      "the signal join must keep every document (both scores are total functions)")
    rows.foreach { r =>
      val rho = r.getAs[Long]("rho_micro")
      assert(rho >= -1000000L && rho <= 1000000L, s"rho out of range: $rho")
      assert(r.getAs[Long]("mean_d2") >= 0L)
    }
    // exact re-derivation: collect both per-doc scores and fold the
    // tie-broken Spearman by hand (the spec-side second opinion the
    // oracle shares CTEs with and therefore cannot give)
    val head = graft.Tables.fanOut(spark, graft.Tables.documents(spark, sf), col("doc_id"))
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("padded", concat(lit(" "), lower(col("text")), lit(" ")))
      .select(col("doc_id"), col("source"),
        (expr("(1000000 * cast(size(array_distinct(toks)) as bigint)) div size(toks)") * 3L
          + expr("""(1000000 * ((length(padded) - length(replace(padded, ' the ', ''))) div 5))
                   | div size(toks)""".stripMargin) * 2L
          + expr("cast(least(size(toks), 256) as bigint) * 3906") * 1L).as("w"))
      .withColumn("score", expr("w div 6"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("score"))).toSeq
    val docsDF = graft.Tables.fanOut(spark, graft.Tables.documents(spark, sf), col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val model = docsDF.groupBy("t").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalToks = model.values.sum
    val surprise = docsDF.collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, toks) =>
        val micros = toks.map(t =>
          math.round((math.log(totalToks.toDouble) - math.log(model(t.getString(2)).toDouble)) * 1e6))
        k -> micros.sum / micros.length // truncating div on nonnegative
      }
    val expected = head.groupBy(_._2).map { case (src, ds) =>
      val r1 = ds.sortBy(d => (d._3, d._1)).zipWithIndex.map { case (d, i) => d._1 -> (i + 1L) }.toMap
      val r2 = ds.sortBy(d => (-surprise((d._1, src)), d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1L) }.toMap
      val n = ds.length.toLong
      val sumD2 = ds.map(d => { val dd = r1(d._1) - r2(d._1); BigInt(dd) * BigInt(dd) }).sum
      val rho = if (n > 1) 1000000L - (BigInt(6000000) * sumD2 / (BigInt(n) * (BigInt(n) * n - 1))).toLong
                else 1000000L
      src -> (n, (sumD2 / n).toLong, rho)
    }
    rows.foreach { r =>
      val (n, md2, rho) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("mean_d2") === md2)
      assert(r.getAs[Long]("rho_micro") === rho, s"source ${r.getString(0)}")
    }
  }

  test("qualityKappa: cell partition, integer identities, and cross-census agreement") {
    val rows = TextOps.registry("x_quality_kappa")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total,
      "the 2x2 cells must partition the corpus")
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_clf_only"),
        r.getAs[Long]("n_gopher_only"), r.getAs[Long]("n_neither"))
      val n = r.getAs[Long]("n_docs")
      assert(a + b + c + d === n)
      // the emitted ratios are the committed integer identities
      assert(r.getAs[Long]("po_ppm") === (a + d) * 1000000L / n)
      val e = BigInt(a + b) * BigInt(a + c) + BigInt(c + d) * BigInt(b + d)
      assert(BigInt(r.getAs[Long]("pe_ppm")) === e * 1000000 / (BigInt(n) * n))
      val num = BigInt(n) * (a + d) - e
      val den = BigInt(n) * n - e
      val kappa =
        if (den == 0) BigInt(0)
        else if (num >= 0) num * 1000000 / den
        else -((-num) * 1000000 / den)
      assert(BigInt(r.getAs[Long]("kappa_ppm")) === kappa)
      assert(r.getAs[Long]("kappa_ppm") >= -1000000L
        && r.getAs[Long]("kappa_ppm") <= 1000000L)
    }
    // cross-census: total Gopher passes must agree with the calibration
    // bins' positive mass (same join, different grouping)
    val calibPos = TextOps.registry("x_quality_calibration")(spark, sf).collect()
      .map(r => r.getAs[Long]("n_docs") * r.getAs[Long]("acc_ppm")).sum
    val kappaPos = rows
      .map(r => r.getAs[Long]("n_both") + r.getAs[Long]("n_gopher_only")).sum
    // acc_ppm is truncating per bin: the bin-mass product under-counts
    // by < 1 doc per bin
    assert(math.abs(calibPos - kappaPos * 1000000L) < 10 * 1000000L,
      s"gopher-positive mass must agree across censuses ($calibPos vs ${kappaPos * 1000000L})")
  }

  test("featureHashing: ladder refinement monotonicities and the type-mass anchors") {
    val rows = TextOps.registry("x_text_feature_hashing")(spark, sf).collect()
      .sortBy(_.getAs[Long]("dim"))
    assert(rows.map(_.getAs[Long]("dim")).toSeq === Seq(256L, 1024L, 4096L, 16384L, 65536L))
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .agg(countDistinct("t")).head.getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") === vocab,
        "every ladder step hashes the whole vocabulary")
      assert(r.getAs[Long]("n_occupied") <= math.min(r.getAs[Long]("dim"), vocab))
      assert(r.getAs[Long]("n_collided_types") <= vocab)
      assert(r.getAs[Long]("collided_mass_ppm") >= 0
        && r.getAs[Long]("collided_mass_ppm") <= 1000000L)
    }
    // powers of 4: each dim divides the next, so buckets REFINE —
    // occupancy grows, worst load and collisions shrink (theorems, not
    // tendencies)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_occupied") >= a.getAs[Long]("n_occupied"))
      assert(b.getAs[Long]("max_bucket_types") <= a.getAs[Long]("max_bucket_types"))
      assert(b.getAs[Long]("n_collided_types") <= a.getAs[Long]("n_collided_types"))
      assert(b.getAs[Long]("collided_mass_ppm") <= a.getAs[Long]("collided_mass_ppm"))
    }
  }
}
