package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-level repetition signals over a token array — the
  * Gopher-style quality filters a training-data pipeline runs to drop
  * degenerate/repetitive documents (boilerplate, keyword stuffing, decode
  * loops). The corpus documents are single-line word streams, so the
  * signals are word/n-gram shaped rather than line shaped:
  *
  *   - `top_word_frac`    most frequent word's share of all words
  *   - `dup_word_frac`    1 − distinct/total (word-level repetition mass)
  *   - `top_bigram_frac`  most frequent word bigram / total bigrams
  *   - `top_trigram_frac` most frequent word trigram / total trigrams
  *
  * A composed formulation needs three explode→groupBy→max aggregations
  * (three shuffles of the exploded corpus — at 100 TB, shuffling ~40×
  * the corpus volume); this expression computes all four signals in one
  * narrow pass per document inside whole-stage codegen, zero shuffle.
  */
object RepetitionUtil {

  def stats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0L, 0.0, 0.0, 0.0, 0.0))
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = tokens.getUTF8String(i); i += 1 }

    val wc = new java.util.HashMap[UTF8String, Integer](n * 2)
    var maxW = 0
    i = 0
    while (i < n) {
      val c = wc.merge(words(i), 1, (a, b) => a + b)
      if (c > maxW) maxW = c
      i += 1
    }
    // n-gram keys joined on U+0001 (never produced by the whitespace
    // tokenizer, so distinct windows cannot collide to one key)
    var maxB = 0
    if (n >= 2) {
      val bc = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val k = words(i).toString + '\u0001' + words(i + 1).toString
        val c = bc.merge(k, 1, (a, b) => a + b)
        if (c > maxB) maxB = c
        i += 1
      }
    }
    var maxT = 0
    if (n >= 3) {
      val tc = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 2) {
        val k = words(i).toString + '\u0001' + words(i + 1).toString + '\u0001' + words(i + 2).toString
        val c = tc.merge(k, 1, (a, b) => a + b)
        if (c > maxT) maxT = c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong,
      maxW.toDouble / n,
      (n - wc.size).toDouble / n,
      if (n >= 2) maxB.toDouble / (n - 1) else 0.0,
      if (n >= 3) maxT.toDouble / (n - 2) else 0.0))
  }
}

/** `graft_repetition(array<string>)` → struct of the four repetition
  * signals plus the word count. Null array → null row.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = RepetitionFunctions.schema

  override protected def nullSafeEval(input: Any): Any =
    RepetitionUtil.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionFunctions {
  val Name = "graft_repetition"

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("top_trigram_frac", DoubleType, nullable = false)))

  def repetition(tokens: Column): Column = call_function(Name, tokens)
}
