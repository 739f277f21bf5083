package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram windows over a token array.
  *
  * Replaces the composed
  * `transform(sequence(1, size-(n-1)), i -> concat_ws(" ", slice(ws, i, n)))`
  * on the decontamination/coverage hot paths: higher-order functions are
  * interpreted per element (spark4-duckdb parity note), and each window
  * re-slices the array and re-concats from scratch. Here every window is
  * one `UTF8String.concatWs` over an array slice view — O(total output
  * chars), zero lambda dispatch — inside whole-stage codegen.
  */
object NgramUtil {

  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val sz = tokens.numElements()
    if (n < 1 || sz < n) return Empty
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val m = sz - n + 1
    val out = new Array[AnyRef](m)
    val window = new Array[UTF8String](n)
    var k = 0
    while (k < m) {
      System.arraycopy(toks, k, window, 0, n)
      out(k) = UTF8String.concatWs(Space, window: _*)
      k += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** `graft_word_ngrams(tokens, n)` → array<string>: ALL space-joined n-token
  * windows in order (positional — not distinct; wrap in `array_distinct`
  * for set semantics). Fewer than n tokens → empty array; null tokens
  * array → null. `n` must be a foldable integer literal.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(tokens: Any, n: Any): Any =
    NgramUtil.wordNgrams(tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.NgramUtil.wordNgrams($t, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object NgramFunctions {
  val Name = "graft_word_ngrams"
  def wordNgrams(tokens: Column, n: Int): Column = call_function(Name, tokens, lit(n))
}
