package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test of the 1-Bucket-Theta grid pairing algebra behind
  * [[graft.operators.Dedup.embeddingCosine]] — a pure-Scala mirror of
  * the SQL: side A replicates a block-g row to cells (g, j≥g), side B
  * to cells (i≤g, g), join on cell equality guarded by
  * (blkA < blkB || idA < idB). The invariant that makes the join exact:
  * every unordered pair of distinct ids is produced EXACTLY once, for
  * any block count and id population.
  */
class GridPairingSpec extends AnyFunSuite {

  private def pairsVia(g: Int, ids: Seq[Long]): Seq[(Long, Long)] = {
    def blk(id: Long): Int = java.lang.Math.floorMod(id, g.toLong).toInt
    val aSide = for { id <- ids; j <- blk(id) until g } yield (id, blk(id), (blk(id), j))
    val bSide = for { id <- ids; i <- 0 to blk(id) } yield (id, blk(id), (i, blk(id)))
    for {
      (ida, blkA, cellA) <- aSide
      (idb, blkB, cellB) <- bSide
      if cellA == cellB && (blkA < blkB || ida < idb)
    } yield (math.min(ida, idb), math.max(ida, idb))
  }

  test("every unordered pair of distinct ids is produced exactly once") {
    val gens = for {
      g <- Gen.choose(1, 9)
      n <- Gen.choose(0, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, 500L)).map(_.distinct)
    } yield (g, ids)
    val prop = Prop.forAll(gens) { case (g, ids) =>
      val got = pairsVia(g, ids).groupBy(identity).view.mapValues(_.size).toMap
      val want = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      got.keySet == want && got.values.forall(_ == 1)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }
}
