package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based guarantees of the sketch/filter kernels, exercised
  * Spark-free on random inputs (hundreds of cases in milliseconds):
  * Bloom no-false-negatives, frequent-items merge ≡ direct build in
  * the exact regime, and theta union associativity/exactness. The
  * Spark-side integration (shuffle layouts, window frames) is covered
  * by the per-operator specs; these pin the math the operators lean on.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)

  test("bloom filter never reports a false negative on any random key set") {
    import org.apache.spark.util.sketch.BloomFilter
    val genSet = for {
      n <- Gen.choose(1, 400)
      ks <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield ks.distinct
    cases(genSet, 100) { keys =>
      val bf = BloomFilter.create(math.max(keys.size.toLong, 8L), 0.01)
      keys.foreach(bf.putLong)
      keys.foreach(k => assert(bf.mightContainLong(k), s"false negative for $k"))
    }
  }

  test("frequent-items merge of random shards equals the direct single sketch") {
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    val genItems = for {
      n <- Gen.choose(1, 600)
      items <- Gen.listOfN(n, Gen.choose(0, 80).map(i => s"w$i"))
      cut <- Gen.choose(0, n)
    } yield (items, cut)
    cases(genItems, 60) { case (items, cut) =>
      // exact regime: 128-slot map >> 81 distinct items
      val direct = new ItemsSketch[String](128)
      items.foreach(direct.update)
      val a = new ItemsSketch[String](128)
      val b = new ItemsSketch[String](128)
      items.take(cut).foreach(a.update)
      items.drop(cut).foreach(b.update)
      a.merge(b)
      assert(direct.getMaximumError === 0 && a.getMaximumError === 0)
      val d = direct.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .map(r => r.getItem -> r.getEstimate).toMap
      val m = a.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .map(r => r.getItem -> r.getEstimate).toMap
      assert(m === d, "merged shards must equal the direct exact-mode counts")
    }
  }

  test("theta union is exact and order-insensitive below nominal entries") {
    import org.apache.datasketches.theta.SetOperation
    val genSets = for {
      n <- Gen.choose(1, 300)
      xs <- Gen.listOfN(n, Gen.choose(0L, 2000L))
    } yield xs
    cases(genSets, 60) { xs =>
      def build(items: Seq[Long]) = {
        val u = SetOperation.builder().setLogNominalEntries(12).buildUnion()
        items.foreach(u.update)
        u.getResult
      }
      val direct = build(xs)
      val (l, r) = xs.splitAt(xs.size / 2)
      val merged = SetOperation.builder().setLogNominalEntries(12).buildUnion()
      merged.union(build(r)); merged.union(build(l)) // reverse order
      assert(math.round(direct.getEstimate) === xs.distinct.size.toLong)
      assert(math.round(merged.getResult.getEstimate) === xs.distinct.size.toLong)
    }
  }
}
