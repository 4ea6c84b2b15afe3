package graft

import graft.operators.Curation
import org.scalatest.funsuite.AnyFunSuite

/** Overflow-proofing spec for the shared PSI fold (r12 verdict task 4):
  * drives [[Curation.psiFold]] with synthetic (source, bucket) counts at
  * ≥10⁹-event mass — six orders past the old exact-BIGINT fold's silent
  * Long-wrap ceiling (~10⁵–10⁶ docs) — and checks the engine's
  * DECIMAL(38,0) result against an exact BigInt re-computation of the
  * SAME integer contract (composite-ln micro-nat quantization, exact
  * cross-difference, truncating division). BigInt is unbounded, so any
  * wrap anywhere in the engine-side fold shows up as a mismatch; DuckDB
  * mirrors the widening with HUGEINT (int128), so agreement with the
  * BigInt ground truth on both sides IS cross-engine agreement.
  */
class PsiFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The committed integer contract, folded in BigInt (never wraps). */
  private def expectedPsi(
      grid: Seq[(String, Int, Long)]): Map[String, (Long, Long, Long)] = {
    val glob = grid.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._3).sum }
    val nSrc = grid.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val n = grid.map(_._3).sum
    val nB = glob.size
    nSrc.map { case (src, ns) =>
      val terms = glob.toSeq.map { case (b, cg) =>
        val cs = grid.collectFirst { case (`src`, `b`, c) => c }.getOrElse(0L)
        val lnMicro = BigInt(math.round(
          (math.log(cs + 1.0) - math.log(ns.toDouble + nB)
            - math.log(cg + 1.0) + math.log(n.toDouble + nB)) * 1e6))
        (BigInt(cs + 1) * BigInt(n + nB) - BigInt(cg + 1) * BigInt(ns + nB)) * lnMicro
      }
      val psi = terms.sum / (BigInt(ns + nB) * BigInt(n + nB))
      assert(psi.isValidLong)
      src -> (ns, nB.toLong, psi.toLong)
    }
  }

  test("psiFold at 3e9-event mass matches the exact BigInt fold (old Long fold wrapped here)") {
    // two sources, four buckets, counts in the 1e8–1e9 range: total
    // mass ≈ 3.1e9 events. The old fold's term magnitude here is
    // ~n²·ln_micro ≈ (3e9)²·1e6 ≈ 1e25 ≫ Long.MaxValue (9.2e18).
    val grid = Seq(
      ("web", 3, 900000001L), ("web", 4, 450000007L),
      ("web", 5, 120000011L), ("web", 6, 30000013L),
      ("books", 3, 200000003L), ("books", 4, 800000009L),
      ("books", 5, 500000029L), ("books", 6, 100000037L))
    val exp = expectedPsi(grid)
    // sanity: the synthetic mass really is past the old ceiling
    assert(grid.map(_._3).sum > 3000000000L)

    import spark.implicits._
    val srcB = grid.toDF("source", "b", "cnt_s")
    val got = Curation.psiFold(srcB).collect()
    assert(got.length === 2)
    got.foreach { r =>
      val (ns, nB, psi) = exp(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === ns)
      assert(r.getAs[Long]("n_buckets") === nB)
      assert(r.getAs[Long]("psi_micro_nats") === psi,
        s"engine PSI diverged from the exact BigInt fold for ${r.get(0)}")
    }
  }

  test("psiFold still matches BigInt at small mass (regression guard for the r13 widening)") {
    val grid = Seq(
      ("a", 1, 5L), ("a", 2, 7L), ("a", 3, 2L),
      ("b", 1, 1L), ("b", 2, 9L), ("b", 3, 11L))
    val exp = expectedPsi(grid)
    import spark.implicits._
    val got = Curation.psiFold(grid.toDF("source", "b", "cnt_s")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("psi_micro_nats") === exp(r.getAs[String]("source"))._3)
    }
  }

  test("psiFold on an empty grid returns an empty frame, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(String, Int, Long)].toDF("source", "b", "cnt_s")
    assert(Curation.psiFold(empty).collect().isEmpty)
  }
}
