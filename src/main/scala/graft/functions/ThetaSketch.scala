package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta sketches (Apache DataSketches) as first-class engine
  * aggregates — the sketch family that supports SET ALGEBRA, which HLL
  * cannot: intersection and difference of distinct-sets, the machinery
  * behind retention (users on day d AND day d+1), churn (day d NOT day
  * d+1) and audience-overlap queries at 100 TB without ever
  * materializing the sets.
  *
  * [[ThetaSketchAgg]] is a `TypedImperativeAggregate[Union]` — the
  * Catalyst API built for aggregation buffers that are opaque mutable
  * objects (Spark's own HLL aggregate uses the same seam; this
  * completes the extension-surface ladder promised in
  * [[WeightedMean]]'s scaladoc). Partials are map-side combined: each
  * scan task ships one compact sketch (≤ 8·2^lgK bytes) per group,
  * never rows.
  *
  * Determinism: a theta sketch's retained-hash state is a pure set
  * function of the input multiset (order- and partition-insensitive),
  * so every retry/cluster layout yields byte-identical compact
  * sketches. Below 2^lgK distinct items the sketch is in EXACT mode —
  * estimates are exactly the true cardinalities, which is what lets
  * the retention query carry a full DuckDB hash oracle at gate scales
  * (the corpus has ~150 users/day against lgK=12 → 4096-entry exact
  * headroom; past exact mode the gate would switch to the rows-only +
  * twin pattern used for HLL).
  *
  * The scalar set-ops ([[ThetaEstimate]]/[[ThetaIntersectEstimate]]/
  * [[ThetaAnotBEstimate]]) run on the tiny post-aggregate frame (one
  * row per day), so their CodegenFallback is off the hot path by
  * construction.
  */
object ThetaSketch {
  val LgNomEntries = 12

  private[functions] def emptyUnion(): Union =
    SetOperation.builder().setLogNominalEntries(LgNomEntries).buildUnion()

  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  def sketchAgg(c: Column): Column = GraftColumnBridge.column(
    ThetaSketchAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  def estimate(c: Column): Column =
    GraftColumnBridge.column(ThetaEstimate(GraftColumnBridge.expression(c)))

  /** Union-merge of SERIALIZED sketches — the rollup aggregate over
    * stored per-slice sketches (usable as a running window aggregate:
    * cumulative distinct-count without rescanning history).
    */
  def mergeAgg(c: Column): Column = GraftColumnBridge.column(
    ThetaMergeAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  def intersectEstimate(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaIntersectEstimate(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def aNotBEstimate(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaAnotBEstimate(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Aggregates a LONG column into a compact theta sketch (binary). */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def createAggregationBuffer(): Union = ThetaSketch.emptyUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.emptyUnion()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "theta_sketch_agg"
}

/** Merges a BINARY column of serialized theta sketches by union. */
case class ThetaMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def createAggregationBuffer(): Union = ThetaSketch.emptyUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.emptyUnion()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaMergeAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "theta_merge_agg"
}

/** Rounded cardinality estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    math.round(ThetaSketch.wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

/** Rounded |A ∩ B| estimate of two serialized theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val i = SetOperation.builder()
      .setLogNominalEntries(ThetaSketch.LgNomEntries).buildIntersection()
    i.intersect(ThetaSketch.wrap(l.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaSketch.wrap(r.asInstanceOf[Array[Byte]]))
    math.round(i.getResult.getEstimate)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEstimate = copy(left = l, right = r)
  override def prettyName: String = "theta_intersect_estimate"
}

/** Rounded |A \ B| estimate of two serialized theta sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val d = SetOperation.builder()
      .setLogNominalEntries(ThetaSketch.LgNomEntries).buildANotB()
    d.setA(ThetaSketch.wrap(l.asInstanceOf[Array[Byte]]))
    d.notB(ThetaSketch.wrap(r.asInstanceOf[Array[Byte]]))
    math.round(d.getResult(true).getEstimate)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBEstimate = copy(left = l, right = r)
  override def prettyName: String = "theta_anotb_estimate"
}
