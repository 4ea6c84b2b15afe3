package graft.functions

import org.apache.spark.sql.{Column, Encoder, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

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

/** Column-API entry point for [[TopKPairsAgg]], the native
  * Catalyst replacement for the [[TopKPairs]] typed `Aggregator`.
  */
object TopKPairsNative {
  /** Bounded top-k of (score, id) pairs, score desc / id asc, returned
    * as `array<struct<_1:bigint,_2:bigint>>` — plug-compatible with the
    * udaf form's output so callers' explode/`p._1` paths are unchanged.
    */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(TopKPairsAgg(
      GraftColumnBridge.expression(score),
      GraftColumnBridge.expression(id), k).toAggregateExpression())
}

/** Native `TypedImperativeAggregate` twin of [[TopKPairs]]: same bounded
  * top-k semantics (score desc, id asc — a total order over quantized
  * scores), but WITHOUT the typed-Aggregator encoder on the hot path.
  * The udaf form deserializes every input row into a boxed
  * `Tuple2[Long, Long]` through an `ExpressionEncoder` before `reduce`
  * sees it, and re-allocates the buffer array per accepted insert —
  * measured at sf0.1 that constant made the "scale path" 1.8× slower
  * than the window twin it exists to replace. Here `update` reads the
  * two longs straight off the `InternalRow` and inserts IN PLACE into a
  * fixed `Array[Long]` of `[n, s0, i0, …, s(k-1), i(k-1)]` — zero
  * per-row allocation, zero boxing on the reject path (the common case
  * once the buffer fills: one compare against the current floor).
  * Partial aggregation applies exactly as with the udaf (the shuffle
  * still carries O(k) pairs per task × key); only the per-row constant
  * changes. Runs under `ObjectHashAggregateExec` like every
  * TypedImperativeAggregate ([[ThetaSketchAgg]] precedent).
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(k > 0)

  // buffer layout: [n, s0, i0, s1, i1, ...] — pair j at (1+2j, 2+2j)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + 2 * k)

  private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(b: Array[Long], s: Long, i: Long): Unit = {
    val n = b(0).toInt
    if (n == k && !better(s, i, b(2 * n - 1), b(2 * n))) return
    var pos = 0
    while (pos < n && better(b(1 + 2 * pos), b(2 + 2 * pos), s, i)) pos += 1
    val keep = math.min(n + 1, k)
    var j = keep - 1
    while (j > pos) {
      b(1 + 2 * j) = b(2 * j - 1)
      b(2 + 2 * j) = b(2 * j)
      j -= 1
    }
    b(1 + 2 * pos) = s
    b(2 + 2 * pos) = i
    b(0) = keep
  }

  // After binding, the children are BoundReferences — read the longs
  // straight off the row by ordinal instead of through Expression.eval,
  // whose `Any` return boxes every value (the last per-row allocation).
  @transient private lazy val scoreOrd: Int = score match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private lazy val idOrd: Int = id match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    if (scoreOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(scoreOrd) && !input.isNullAt(idOrd))
        insert(buffer, input.getLong(scoreOrd), input.getLong(idOrd))
    } else {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        insert(buffer, s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    val n = other(0).toInt
    var j = 0
    while (j < n) { insert(buffer, other(1 + 2 * j), other(2 + 2 * j)); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer(0).toInt
    new GenericArrayData((0 until n).map(j =>
      InternalRow(buffer(1 + 2 * j), buffer(2 + 2 * j))).toArray[Any])
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val n = buffer(0).toInt
    val bb = java.nio.ByteBuffer.allocate(8 * (1 + 2 * n))
    var j = 0
    while (j <= 2 * n) { bb.putLong(buffer(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = createAggregationBuffer()
    val n = bb.getLong(0).toInt
    var j = 0
    while (j <= 2 * n) { b(j) = bb.getLong(8 * j); j += 1 }
    b
  }

  // update() reads both children as raw longs off the InternalRow
  // (getLong fast path) — reject any non-LongType input at ANALYSIS
  // time instead of producing garbage at runtime. (The udaf form this
  // aggregate replaced was type-safe via its tuple encoder.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (BIGINT score, BIGINT id) children, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}); " +
        "quantize scores to integer micros at the call site")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "topk_pairs"
}
