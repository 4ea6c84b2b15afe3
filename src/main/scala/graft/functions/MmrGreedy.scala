package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One pool candidate carried through the aggregation buffer. */
private[functions] final case class MmrCand(
    candId: Long, sim: Double, vec: Array[Double], nrm: Double)

/** Whole-trajectory MMR greedy selection as ONE aggregate
  * ([[TopKPairsAgg]] discipline): the caller feeds each query's
  * BOUNDED candidate pool (id, rounded sim, vector, norm) and gets
  * back the full `array<struct<step, neighbor_id, sim, score_m>>`
  * selection in a single `groupBy(query_id)` pass.
  *
  * Why an aggregate and not composition: MMR's greedy step j depends
  * on the j−1 already-selected rows, so the compositional form is K−1
  * sequential join+argmax BARRIERS over the whole query set — K global
  * stages (each formerly localCheckpointed to keep the plan flat) even
  * though every query's trajectory is independent. Per-query the state
  * is tiny (≤ pool vectors), which is exactly the
  * preference-order-(b) case: fold the sequential loop into a
  * TypedImperativeAggregate and let ONE shuffle co-locate each query's
  * pool. At 10⁶ queries the compositional form still runs K barriers;
  * this form is embarrassingly parallel across queries.
  *
  * Engine parity: the greedy replays the EXACT integer trajectory of
  * the unrolled form (and the DuckDB oracle). sim_m quantizes the
  * pre-rounded sim via Spark's own Round semantics
  * (`BigDecimal(d).setScale(0, HALF_UP)`, then double→long
  * truncation); pairwise psim_m is the same index-order double dot
  * product ([[VectorExpressions.DotProduct]]'s loop), scaled and
  * rounded identically; every argmax is (score_m desc, cand_id asc) —
  * a total order over integers, so buffer order cannot matter and
  * partial aggregation (merge = pool concat) is exact.
  *
  * Scale: the buffer holds at most the pool (the caller pre-filters to
  * its top-[[graft.operators.Similarity.MmrPool]] rows per query), so
  * serialized partials are O(pool·dims) doubles per (task × query) —
  * bounded, like every sketch aggregate here. Runs under
  * ObjectHashAggregateExec.
  */
case class MmrGreedyAgg(
    cand: Expression,
    sim: Expression,
    vec: Expression,
    nrm: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[MmrCand]] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(cand, sim, vec, nrm)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("score_m", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[MmrCand] =
    ArrayBuffer.empty[MmrCand]

  override def update(
      buffer: ArrayBuffer[MmrCand], input: InternalRow): ArrayBuffer[MmrCand] = {
    val c = cand.eval(input)
    val s = sim.eval(input)
    val v = vec.eval(input)
    val n = nrm.eval(input)
    if (c != null && s != null && v != null && n != null) {
      val a = v.asInstanceOf[ArrayData]
      buffer += MmrCand(c.asInstanceOf[Long], s.asInstanceOf[Double],
        a.toDoubleArray(), n.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(
      buffer: ArrayBuffer[MmrCand], other: ArrayBuffer[MmrCand]): ArrayBuffer[MmrCand] = {
    buffer ++= other
    buffer
  }

  /** Spark `round(x)` for doubles + the bigint cast, verbatim. */
  private def quant(x: Double): Long =
    if (x.isNaN || x.isInfinite) x.toLong
    else BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong

  /** Index-order double dot product — [[VectorExpressions.DotProduct]]'s loop. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  override def eval(buffer: ArrayBuffer[MmrCand]): Any = {
    val pool = buffer.toArray
    val n = pool.length
    val simM = Array.tabulate(n)(i => quant(pool(i).sim * 10000))
    // full pairwise psim_m over the ≤pool² cells, same scaling chain as
    // the SQL form: round(dot / (an·bn) * 10⁴) cast bigint
    val psimM = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0L
      else quant(dot(pool(i).vec, pool(j).vec) / (pool(i).nrm * pool(j).nrm) * 10000)
    }
    val selected = ArrayBuffer.empty[Int]
    val out = ArrayBuffer.empty[Any]
    val steps = math.min(k, n)
    var step = 1
    while (step <= steps) {
      var best = -1
      var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!selected.contains(i)) {
          var score = 7L * simM(i)
          if (selected.nonEmpty) {
            var pen = Long.MinValue
            selected.foreach { s => if (psimM(i)(s) > pen) pen = psimM(i)(s) }
            score = 7L * simM(i) - 3L * pen
          }
          if (best == -1 || score > bestScore ||
            (score == bestScore && pool(i).candId < pool(best).candId)) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      selected += best
      out += InternalRow(step.toLong, pool(best).candId, pool(best).sim, bestScore)
      step += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buffer: ArrayBuffer[MmrCand]): Array[Byte] = {
    var bytes = 4
    buffer.foreach(e => bytes += 8 + 8 + 8 + 4 + 8 * e.vec.length)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buffer.length)
    buffer.foreach { e =>
      bb.putLong(e.candId); bb.putDouble(e.sim); bb.putDouble(e.nrm)
      bb.putInt(e.vec.length)
      e.vec.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[MmrCand] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val id = bb.getLong
      val sim = bb.getDouble
      val nrm = bb.getDouble
      val d = bb.getInt
      val v = new Array[Double](d)
      var j = 0
      while (j < d) { v(j) = bb.getDouble; j += 1 }
      buf += MmrCand(id, sim, v, nrm)
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (cand.dataType == LongType && sim.dataType == DoubleType && vecOk &&
      nrm.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mmr_greedy requires (BIGINT cand, DOUBLE sim, ARRAY<DOUBLE> vec, " +
        s"DOUBLE nrm) children, got (${cand.dataType.simpleString}, " +
        s"${sim.dataType.simpleString}, ${vec.dataType.simpleString}, " +
        s"${nrm.dataType.simpleString})")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrGreedyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrGreedyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cand = newChildren(0), sim = newChildren(1), vec = newChildren(2),
      nrm = newChildren(3))
}

object MmrGreedy {
  /** The full k-step MMR selection for one query's candidate pool. */
  def greedy(cand: Column, sim: Column, vec: Column, nrm: Column, k: Int): Column =
    GraftColumnBridge.column(MmrGreedyAgg(
      GraftColumnBridge.expression(cand), GraftColumnBridge.expression(sim),
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(nrm),
      k).toAggregateExpression())
}
