package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native log-linear bucket primitives for the quantile sketch
  * ([[graft.ext.Sketch.logHistogram]] and the streaming twin).
  *
  * The composed SQL formulation
  * `greatest(length(bin(x)) - 1 - B, 0)` materializes a BINARY STRING per
  * row just to read its length — a heap allocation and an O(64) digit
  * loop on the sketch's one pass over the facts (the q13 trigram lesson,
  * fourth time). Here the octave is `63 − numberOfLeadingZeros(x)` — one
  * hardware LZCNT — and the bucket id / representative are two shifts.
  *
  * Value semantics EXACTLY match the composed form for every long,
  * including the edges the spec pins: x = 0 (bin length 1 → e = 0 →
  * bucket 0), x < 0 (bin is the 64-char two's-complement string → e = 63,
  * arithmetic `>>` keeps the sign, same as Spark's `shiftright`), and the
  * powers-of-two boundaries. The DuckDB oracle keeps the portable
  * `bin()` spelling — the hash match across the swap is the equivalence
  * proof at corpus scale.
  */
abstract class LogBucketExpression extends UnaryExpression with Serializable {
  def subBits: Int

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.simpleString}")

  /** shared scalar kernel: (shift s, mantissa m = x >> s) */
  @inline protected final def shiftOf(x: Long): Int = {
    val e = math.max(63 - java.lang.Long.numberOfLeadingZeros(x), 0)
    math.max(e - subBits, 0)
  }

  protected def genShift(x: String, s: String): String =
    s"""int $s = java.lang.Math.max(java.lang.Math.max(
       |  63 - java.lang.Long.numberOfLeadingZeros($x), 0) - $subBits, 0);""".stripMargin
}

/** bucket_id = s · 2^(subBits+1) + (x >> s) — monotone in x. */
case class LogBucketId(child: Expression, subBits: Int) extends LogBucketExpression {
  private val cap = 1L << (subBits + 1)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    val s = shiftOf(x)
    s.toLong * cap + (x >> s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""${genShift(x, s)}
         |${ev.value} = ((long) $s) * ${cap}L + ($x >> $s);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** rep = (x >> s) << s — the bucket's lower bound (exact x when s = 0). */
case class LogBucketRep(child: Expression, subBits: Int) extends LogBucketExpression {
  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    val s = shiftOf(x)
    (x >> s) << s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""${genShift(x, s)}
         |${ev.value} = ($x >> $s) << $s;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** length(bin(x)) without the string: max(64 − nlz(x), 1). Matches
  * Spark/DuckDB `bin()` digit counts for every long — 1 for x = 0, 64
  * for negatives (two's-complement form). Used by the HLL rank
  * projection; kept as a general SQL function for any future
  * floor-log2 consumer.
  */
case class BinLength(child: Expression) extends UnaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    math.max(64 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long]), 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = java.lang.Math.max(64 - java.lang.Long.numberOfLeadingZeros($x), 1);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LogBucketFunctions {
  val IdName = "graft_log_bucket_id"
  val RepName = "graft_log_bucket_rep"
  val BinLenName = "graft_bin_length"
}
