package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership gate — the scan-side prune that makes
  * benchmark decontamination (and any "does this row's key appear in
  * that other table" check) feasible at 100 TB.
  *
  * The pattern: the SMALL side (here: the eval/benchmark shingle set)
  * is folded into a Bloom filter — a fixed-size bit array, ~1.2 MB per
  * million keys at 1% false-positive rate — which rides to every task
  * as part of the serialized expression (executor-local after the
  * first task; Spark's own runtime `bloomFilter` join hint ships its
  * filter the same way). The HUGE side then evaluates `mightContain`
  * as a pure scan predicate: no shuffle, no join, no state. Only the
  * survivors — true hits plus the fpp-bounded false positives — ever
  * reach the exact verification join, so the bloom can only PRUNE,
  * never change a result: downstream output is exactly the no-bloom
  * answer, which is what lets [[graft.operators.Curation.contaminationBloom]]
  * share a full DuckDB hash oracle.
  *
  * Contrast the broadcast-hash-join alternative: a hash set of 100 M
  * 8-byte keys costs GBs of executor memory per core; the bloom costs
  * ~120 MB total and one branch per row. Determinism: Spark's
  * `BloomFilter` hashes with fixed seeds, so the same input set yields
  * the same bit array on every build — retries see identical gates.
  *
  * [[BloomMightContainLong]] generates code (no CodegenFallback): the
  * filter object is attached via `addReferenceObj`, so the membership
  * test inlines into the scan's whole-stage-codegen filter, keeping
  * the corpus hot path fused.
  */
object BloomGate {

  /** Serialize a built filter once; the expression carries the bytes
    * and each executor re-hydrates lazily (one deserialization per
    * task-set, not per row).
    */
  def mightContainLong(bf: BloomFilter, c: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(c), bos.toByteArray))
  }
}

/** True iff the Bloom filter might contain the LONG child value (no
  * false negatives; false-positive rate fixed at build time).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Called from both interpreted and generated code paths. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomGate", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)

  override def prettyName: String = "bloom_might_contain_long"
}
