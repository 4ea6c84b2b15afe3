package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Gram matrix Σ v·vᵀ over an embedding column — the input
  * statistic of PCA / whitening / covariance-based outlier detection,
  * computed as ONE typed Aggregator pass.
  *
  * The buffer is the full d×d accumulator (flattened row-major,
  * d=64 → 32 KB): associative and commutative, so Spark map-side
  * combines partials inside each scan task and the shuffle carries one
  * 4096-double buffer per partition — model extraction, not a data
  * collect. The d² explode-and-self-join alternative would amplify the
  * corpus 4096× before aggregating; this pass amplifies nothing.
  */
object GramMatrix extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  val Dim = 64

  override def zero: Array[Double] = new Array[Double](Dim * Dim)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    val a = v.toArray
    var i = 0
    while (i < Dim) {
      val vi = a(i)
      val row = i * Dim
      var j = 0
      while (j < Dim) { b(row + j) += vi * a(j); j += 1 }
      i += 1
    }
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var k = 0
    while (k < x.length) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
