package graft

import graft.operators.Curation
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based proof obligations for the Feistel corpus shuffle,
  * beyond the corpus-level spec in CurationSpec: (1) a pure-JVM mirror
  * of the SQL expression chain is pinned against the Spark plan on a
  * sign/extreme-covering sample, then (2) hundreds of random 64-bit id
  * sets exercise round-trip inversion and injectivity through the
  * mirror (Spark-free, so the sweep costs milliseconds). Together:
  * the SQL chain computes the mirror, and the mirror is a bijection on
  * the FULL signed 64-bit domain — not just the nonneg corpus ids.
  */
class FeistelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val M = 4294967295L

  private def f(x: Long, k: Long): Long = {
    val t = (x ^ k) * 73244475L
    (t ^ (t >> 16)) & M
  }
  private def perm(id: Long): (Long, Long) =
    Curation.FeistelKeys.foldLeft(((id >> 32) & M, id & M)) {
      case ((l, r), k) => (r, l ^ f(r, k))
    }
  private def inv(lr: (Long, Long)): (Long, Long) =
    Curation.FeistelKeys.reverse.foldLeft(lr) {
      case ((l, r), k) => (r ^ f(l, k), l)
    }

  test("the JVM mirror computes exactly what the Spark expression chain computes") {
    import spark.implicits._
    val sample: Seq[Long] = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      42L, -42L, 4294967295L, 4294967296L, 1L << 62, -(1L << 62)) ++
      (1 to 50).map(i => i * 2654435761L) // a spread of mixed-bit ids
    val got = Curation.feistelPermute(sample.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    sample.foreach { id =>
      assert(got(id) === perm(id), s"id $id: Spark chain and JVM mirror must agree")
    }
  }

  test("round-trip inversion and injectivity hold on random signed 64-bit id sets") {
    val idsGen = Gen.listOfN(200, Gen.choose(Long.MinValue, Long.MaxValue))
    (1 to 300).foreach { seed =>
      val ids = idsGen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get.distinct
      ids.foreach { id =>
        assert(inv(perm(id)) === (((id >> 32) & M, id & M)),
          s"id $id: inverse must recover the original halves")
      }
      assert(ids.map(perm).distinct.size === ids.size,
        "distinct ids must stay distinct through the permutation")
    }
  }
}
