package graft

import graft.operators.{Curation, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the r13 census pair the DuckDB oracle can't see:
  * bound/consistency invariants and a hand re-derivation of ECE.
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
}
