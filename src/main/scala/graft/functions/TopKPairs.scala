package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate over (score, id) pairs, ordered score desc
  * with id asc tiebreak — the map-side-combining replacement for the
  * `row_number() OVER (PARTITION BY query ORDER BY ...)` top-k: a
  * window ranks only AFTER shuffling every scored row of a partition
  * key to one task, so a low-cardinality query set drags the whole
  * corpus through the exchange; this buffer holds at most k pairs per
  * partial, combines inside each scan task, and the shuffle carries
  * O(k) longs per (task × key) however big the corpus is.
  *
  * The buffer is a flat Array[Long] of (score, id) pairs kept sorted
  * in output order (insertion is O(k) — k is a result-size constant).
  * Associative and commutative: merge folds one sorted buffer into the
  * other pair-by-pair, so partial aggregation applies like any
  * built-in. Ties are impossible to resolve nondeterministically by
  * construction — the (score desc, id asc) order is total.
  *
  * Scores are integer-quantized by the CALLER (the engine-parity
  * discipline: quantize once, compare exactly), which is also what
  * makes the order reproducible across engines and retries.
  */
case class TopKPairs(k: Int) extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0)

  private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(b: Array[Long], s: Long, id: Long): Array[Long] = {
    val n = b.length / 2
    if (n == k && !better(s, id, b(2 * (n - 1)), b(2 * (n - 1) + 1))) return b
    var pos = 0
    while (pos < n && better(b(2 * pos), b(2 * pos + 1), s, id)) pos += 1
    val keep = math.min(n + 1, k)
    val out = new Array[Long](keep * 2)
    System.arraycopy(b, 0, out, 0, pos * 2)
    out(2 * pos) = s
    out(2 * pos + 1) = id
    val tail = keep - pos - 1
    if (tail > 0) System.arraycopy(b, pos * 2, out, (pos + 1) * 2, tail * 2)
    out
  }

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] =
    insert(b, in._1, in._2)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var acc = x
    var i = 0
    while (i < y.length / 2) { acc = insert(acc, y(2 * i), y(2 * i + 1)); i += 1 }
    acc
  }

  override def finish(b: Array[Long]): Seq[(Long, Long)] =
    (0 until b.length / 2).map(i => (b(2 * i), b(2 * i + 1)))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
