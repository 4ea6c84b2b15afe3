package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based agreement of the connected-component implementations
  * beyond the planted near-dup corpus (small cliques): random graphs
  * with chains, cycles and disconnected noise for the union-find kernel
  * (Spark-free, so hundreds of graphs cost milliseconds), plus one
  * fixed adversarial graph (a long path — the diameter-sensitivity
  * case — bridged cliques and isolated pairs) for the distributed
  * loops, whose per-round Spark job cost rules out random sweeps in a
  * unit suite.
  */
class ComponentsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val edgeListGen: Gen[List[(Long, Long)]] =
    for {
      n <- Gen.choose(2, 60) // node universe
      m <- Gen.choose(1, 90) // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct

  /** Reference partition via a second, structurally different
    * implementation: label propagation over an adjacency map.
    */
  private def referenceComponents(edges: List[(Long, Long)]): Set[Set[Long]] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val seen = scala.collection.mutable.Set.empty[Long]
    val comps = scala.collection.mutable.ListBuffer.empty[Set[Long]]
    for (start <- adj.keys.toSeq.sorted if !seen(start)) {
      val comp = scala.collection.mutable.Set.empty[Long]
      val stack = scala.collection.mutable.Stack(start)
      while (stack.nonEmpty) {
        val v = stack.pop()
        if (!comp(v)) { comp += v; seen += v; adj(v).foreach(stack.push) }
      }
      comps += comp.toSet
    }
    comps.toSet
  }

  test("union-find kernel matches BFS components on 300 random graphs") {
    var seed = org.scalacheck.rng.Seed(42L)
    for (_ <- 1 to 300) {
      val edges = edgeListGen.apply(Gen.Parameters.default, seed)
        .getOrElse(List((0L, 1L)))
      seed = seed.next
      if (edges.nonEmpty) {
        val got = Dedup.unionFindClusters(edges.toArray)
        assert(got.map(_._2.toSet).toSet === referenceComponents(edges),
          s"union-find disagrees on $edges")
        // representative invariant: root is the component minimum, and
        // roots arrive sorted
        got.foreach { case (root, members) => assert(members.min === root) }
        assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
      }
    }
  }

  /** The claim TextOps.bpeTrain/bpeApply rest on: with two pipes per
    * interior boundary and one at the edges, literal left-to-right
    * replace-all of `|l||r|` → `|lr|` equals the greedy BPE merge scan
    * on ANY token sequence — runs, overlaps, merged-symbol collisions
    * included. Exercised over random multi-step merge chains against a
    * direct list-walking reference (java.lang.String.replace shares
    * Spark's and DuckDB's literal replace-all semantics).
    */
  test("delimited replace-all merging equals greedy BPE merging on random runs") {
    def encode(toks: List[String]): String = toks.mkString("|", "||", "|")
    def decode(s: String): List[String] =
      if (s.length <= 2) Nil
      else s.substring(1, s.length - 1).split("\\|\\|", -1).toList
    def greedy(toks: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toList
    }
    // alphabet chosen so merged symbols collide with raw ones (ab vs
    // a·b) and runs of identical symbols are common
    val symGen = Gen.oneOf("a", "b", "ab", "ba", "aa")
    val caseGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, symGen)
      k <- Gen.choose(1, 4)
      pairs <- Gen.listOfN(k, for {
        l <- symGen; r <- symGen
      } yield (l, r))
    } yield (toks, pairs)
    var seed = org.scalacheck.rng.Seed(4242L)
    for (_ <- 1 to 500) {
      val (toks0, pairs) = caseGen.apply(Gen.Parameters.default, seed)
        .getOrElse((List("a", "a", "a"), List(("a", "a"))))
      seed = seed.next
      var toks = toks0
      var s = encode(toks0)
      pairs.foreach { case (l, r) =>
        toks = greedy(toks, l, r)
        s = s.replace(s"|$l||$r|", s"|${l + r}|")
        assert(decode(s) === toks,
          s"delimited merge diverged: toks0=$toks0 pairs=$pairs at ($l,$r)")
      }
    }
  }

  test("distributed loops agree with union-find on an adversarial graph") {
    import spark.implicits._
    // a 30-node path (worst case for diameter-bound propagation) plus
    // two 5-cliques joined by a bridge, plus isolated pairs
    val path = (0L until 29L).map(i => (i, i + 1)).toList
    val cliqueA = (for (i <- 100L to 104L; j <- i + 1 to 104L) yield (i, j)).toList
    val cliqueB = (for (i <- 200L to 204L; j <- i + 1 to 204L) yield (i, j)).toList
    val bridge = List((104L, 200L))
    val pairs = List((300L, 301L), (400L, 401L))
    val edges = path ++ cliqueA ++ cliqueB ++ bridge ++ pairs
    val expected = Dedup.unionFindClusters(edges.toArray).map(_._2.toSet).toSet
    def labelsToComponents(rows: Array[org.apache.spark.sql.Row]): Set[Set[Long]] =
      rows.groupBy(_.getLong(1)).values.map(_.map(_.getLong(0)).toSet).toSet
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val df = edges.toDF("doc_a", "doc_b")
      val bidir = df.union(df.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val fix = Dedup.fixpointLabels(bidir)
      try assert(labelsToComponents(fix.collect()) === expected, "fixpoint disagrees")
      finally fix.unpersist()
      val star = Dedup.starContractLabels(bidir)
      try assert(labelsToComponents(star.collect()) === expected, "starcontract disagrees")
      finally star.unpersist()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevSp)
  }

  /** Plain-Scala twin of the integer PageRank update — Long `/` is
    * truncation, identical to Spark's `div` on the non-negative ranks.
    */
  private def referencePagerank(
      nodeIds: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val scale = 1000000000000L
    val n = nodeIds.size
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodeIds.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodeIds.filterNot(out.contains).map(pr).sum
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += pr(s) / out(s)
      pr = nodeIds.map(v =>
        v -> (3 * scale / (20 * n) + 17 * (contrib(v) + dang / n) / 20)).toMap
    }
    pr
  }

  test("integer PageRank frames match the Scala reference on random directed graphs") {
    import spark.implicits._
    var seed = org.scalacheck.rng.Seed(7L)
    // a handful of random graphs (each run is ~9 tiny Spark jobs), plus
    // the adversarial shapes: a pure-dangling graph and a star
    val fixed = List(
      (0L to 5L).toList -> List.empty[(Long, Long)], // all dangling
      (0L to 6L).toList -> (1L to 6L).map(i => (i, 0L)).toList) // star hub 0
    val random = (1 to 5).map { _ =>
      val edges = edgeListGen.apply(Gen.Parameters.default, seed).getOrElse(List((0L, 1L)))
      seed = seed.next
      val dir = edges.map { case (a, b) => if ((a + b) % 2 == 0) (a, b) else (b, a) }
      val nodes = (edges.flatMap(e => Seq(e._1, e._2)) :+ 0L).distinct.sorted
      (nodes, dir)
    }
    for ((nodeIds, dirEdges) <- fixed ++ random) {
      val nodes = nodeIds.toDF("vec_id")
      val edges = dirEdges.toDF("src", "dst")
      val got = graft.operators.Similarity
        .pagerankFrames(nodes, edges, nodeIds.size.toLong)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = referencePagerank(nodeIds, dirEdges, 3)
      assert(got === want, s"pagerank disagrees on nodes=$nodeIds edges=$dirEdges")
    }
  }

  /** Reference as-of: per left row, the right row of the same key with
    * the max (time, tiebreak) among time ≤ left time — straight from
    * the definition, no merge machinery to share bugs with.
    */
  private def referenceAsof(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)]): Map[Long, Option[Long]] =
    left.map { case (k, t, lid) =>
      lid -> right.filter { case (rk, rt, _) => rk == k && rt <= t }
        .sortBy { case (_, rt, rid) => (rt, rid) }.lastOption.map(_._3)
    }.toMap

  test("property: AsOfJoinExec agrees with the definitional reference on random frames") {
    import spark.implicits._
    val rowsGen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 5L)       // few keys → dense equal-key runs
        t <- Gen.choose(0L, 20L)      // narrow times → boundary ties
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }

    // Spark-side cost bounds the sweep: a handful of generated cases,
    // each exercising ties, empty sides and missing keys by density
    val cases = Gen.listOfN(6, Gen.zip(rowsGen, rowsGen))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (l, r) =>
      val lDf = l.toDF("k", "t", "lid")
      val rDf = r.toDF("rk", "rt", "rid")
      val got = graft.plans.AsOfJoin.asof(lDf, rDf,
        Seq(lDf("k")), Seq(rDf("rk")), lDf("t"), rDf("rt"), Seq(rDf("rid")))
        .select("lid", "rid").collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      assert(got === referenceAsof(l, r), s"asof disagrees on left=$l right=$r")
    }
  }

  /** Definitional reference for the round-11 direction/tolerance
    * surface: backward = max (rt, rid) with rt ≤ t, forward = min
    * (rt, rid) with rt ≥ t, nearest = the closer of the two with ties
    * going backward; a candidate only counts when |rt − t| ≤ tol
    * (tol < 0 = unbounded).
    */
  private def referenceAsofDir(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)],
      direction: String, tol: Long): Map[Long, Option[Long]] =
    left.map { case (k, t, lid) =>
      val cands = right.filter(_._1 == k)
      val bw = cands.filter(c => c._2 <= t && (tol < 0 || t - c._2 <= tol))
        .sortBy(c => (c._2, c._3)).lastOption
      val fw = cands.filter(c => c._2 >= t && (tol < 0 || c._2 - t <= tol))
        .sortBy(c => (c._2, c._3)).headOption
      val m = direction match {
        case "backward" => bw
        case "forward"  => fw
        case _ => (bw, fw) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (f._2 - t < t - b._2) Some(f) else Some(b) // tie → backward
        }
      }
      lid -> m.map(_._3)
    }.toMap

  test("property: as-of direction/tolerance surface agrees with the definitional reference") {
    import spark.implicits._
    val rowsGen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(0L, 16L) // narrow → boundary ties on both sides
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val cases = Gen.listOfN(3, Gen.zip(rowsGen, rowsGen))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    for {
      (l, r) <- cases
      dir <- Seq("backward", "forward", "nearest")
      tol <- Seq(-1L, 3L) // unbounded + a tolerance tight enough to reject
    } {
      val lDf = l.toDF("k", "t", "lid")
      val rDf = r.toDF("rk", "rt", "rid")
      val got = graft.plans.AsOfJoin.asof(lDf, rDf,
        Seq(lDf("k")), Seq(rDf("rk")), lDf("t"), rDf("rt"), Seq(rDf("rid")),
        direction = dir, toleranceMicros = tol)
        .select("lid", "rid").collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      assert(got === referenceAsofDir(l, r, dir, tol),
        s"asof($dir, tol=$tol) disagrees on left=$l right=$r")
    }
  }
}
