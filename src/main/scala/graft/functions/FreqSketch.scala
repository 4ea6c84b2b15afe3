package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketches — Apache DataSketches'
  * Misra-Gries-family `ItemsSketch`, the third leg of the mergeable
  * sketch family next to HLL (counts, [[graft.operators.Analytics]]
  * a12) and theta (set algebra, [[ThetaSketch]]): "which tokens /
  * URLs / n-grams dominate this 100 TB corpus" without a full
  * group-by. Each scan task keeps a bounded map of at most
  * `maxMapSize` counters and ships ONE serialized sketch upward
  * (map-side combined); merges are counter-wise adds followed by the
  * same bounded purge. Guarantee: every item with true frequency
  * > N·3.5/maxMapSize is reported (no false negatives), and every
  * estimate is within `getMaximumError` of truth — the knob trades a
  * few KB of task memory against the error band, independent of N.
  *
  * Determinism: purge decisions depend only on counter values, and
  * below ~0.75·maxMapSize distinct items NO purge ever fires — the
  * sketch is in EXACT mode and estimates are exactly the true counts
  * regardless of merge order or partition layout. The gate corpus has
  * ~931 distinct word bigrams against lgMaxMapSize=11 (2048-slot map,
  * 1536-slot purge threshold), so [[graft.operators.TextOps.heavyHitters]]
  * carries a full DuckDB hash oracle; past exact mode the op would
  * switch to the rows-only + exact-twin pattern used for HLL.
  *
  * [[FreqTopK]] runs on the one-row post-aggregate frame, so its
  * CodegenFallback is off the hot path by construction (same argument
  * as the theta scalar set-ops).
  */
object FreqSketch {
  val LgMaxMapSize = 11

  private[functions] val serde = new ArrayOfStringsSerDe()

  private[functions] def empty(): ItemsSketch[String] =
    new ItemsSketch[String](1 << LgMaxMapSize)

  private[functions] def wrap(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  /** Aggregate a STRING column into a serialized frequent-items sketch. */
  def sketchAgg(c: Column): Column = GraftColumnBridge.column(
    FreqSketchAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  /** Merge serialized sketches (rollup of stored per-slice sketches). */
  def mergeAgg(c: Column): Column = GraftColumnBridge.column(
    FreqMergeAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  /** Top-k (estimate desc, item asc) rows of a serialized sketch. */
  def topK(c: Column, k: Int): Column =
    GraftColumnBridge.column(FreqTopK(GraftColumnBridge.expression(c), k))
}

/** Aggregates a STRING column into a frequent-items sketch (binary). */
case class FreqSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def createAggregationBuffer(): ItemsSketch[String] = FreqSketch.empty()

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.wrap(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "freq_sketch_agg"
}

/** Merges a BINARY column of serialized frequent-items sketches. */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def createAggregationBuffer(): ItemsSketch[String] = FreqSketch.empty()

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqSketch.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.wrap(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "freq_merge_agg"
}

/** array<struct<token,est>> of the k most frequent items in a
  * serialized sketch, ordered (estimate desc, token asc) — the
  * string tiebreak makes the selected set deterministic at the rank-k
  * boundary even under ties.
  */
case class FreqTopK(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val sk = FreqSketch.wrap(v.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val top = rows.sortBy(r => (-r.getEstimate, r.getItem)).take(k)
    new GenericArrayData(top.map(r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate)))
  }

  override protected def withNewChildInternal(c: Expression): FreqTopK =
    copy(child = c)
  override def prettyName: String = "freq_top_k"
}
