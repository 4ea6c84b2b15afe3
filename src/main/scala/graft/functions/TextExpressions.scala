package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the shingling hot path.
  *
  * The higher-order-function formulation
  * `transform(sequence(0, greatest(size(ts)-n, 0)), i -> concat_ws(' ',
  * slice(ts, i+1, n)))` is semantically right but lambda expressions
  * are CodegenFallback in Spark: the whole Project drops out of
  * whole-stage codegen and every document's shingle loop runs through
  * the interpreter (flagged by the `graft.Explain --codegen` audit on
  * the entire minhash family). This expression computes the identical
  * word n-gram array — same windows, same single-space joining, same
  * sub-n tail behavior for short token arrays — as one static kernel
  * call that codegen inlines, so the shingle Project fuses back into
  * the scan stage.
  */
object TextExpressions {

  /** Kernel shared by eval and codegen: word n-grams of a token array.
    *
    * Window i covers tokens [i, min(i+n, len)); there are
    * max(len-n, 0) + 1 windows — including the single short window a
    * sub-n document produces (mirroring `sequence(0, greatest(len-n,
    * 0))`). Joining skips null elements exactly like `concat_ws`.
    */
  def wordNGrams(ts: ArrayData, n: Int): ArrayData = {
    val len = ts.numElements()
    val count = math.max(len - n, 0) + 1
    val out = new Array[Any](count)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val m = math.min(i + n, len) - i
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) {
        // split() output is never null, but concat_ws semantics skip
        // nulls — concatWs does the same, so null-safety is preserved
        parts(j) = if (ts.isNullAt(i + j)) null else ts.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0, "n-gram width must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      wordNGrams(v.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.wordNGrams($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: word n-gram shingles of an array<string> column. */
  def word_ngrams(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordNGrams(GraftColumnBridge.expression(tokens), n))
}
