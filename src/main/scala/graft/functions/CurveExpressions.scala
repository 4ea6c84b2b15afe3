package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve scalars as native codegen expressions — the
  * (b)-route upgrade of [[graft.operators.ZOrder]]'s 8-step expression
  * fold: one generated static call per row instead of 24 chained CASE
  * projections, with the fold retained as the cross-engine oracle
  * (DuckDB runs the fold; a spec pins the native form bit-identical to
  * it over the curve's entire domain).
  *
  * Reference analog: the curve mapping a clustering write evaluates
  * per row at 100 TB — exactly where a native expression's constant
  * factor matters and a UDF's serialization boundary would hurt.
  */
object CurveExpressions {

  /** Hilbert xy2d at the given order (bits per dimension): iterative
    * rotate/reflect, the textbook loop. Pure integer — identical
    * results on any platform.
    */
  def hilbertD(x0: Long, y0: Long, order: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the quadrant
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  case class HilbertD(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
    require(order > 0 && order <= 31, s"hilbert order out of range: $order")
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hilbert_d requires (BIGINT x, BIGINT y), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

    override protected def nullSafeEval(x: Any, y: Any): Any =
      hilbertD(x.asInstanceOf[Long], y.asInstanceOf[Long], order)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.functions.CurveExpressions.hilbertD($x, $y, $order)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HilbertD =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "hilbert_d"
  }

  /** Column API: Hilbert d-value of two quantized BIGINT coordinates. */
  def hilbert_d(x: Column, y: Column, order: Int): Column =
    GraftColumnBridge.column(HilbertD(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), order))
}
