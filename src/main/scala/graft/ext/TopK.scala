package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a typed Aggregator (extension surface).
  *
  * The window-function formulation (`row_number().over(partitionBy(q)
  * .orderBy(score))` then `rank <= k`) must shuffle and SORT every
  * candidate row per query. This aggregator keeps only k rows per group in
  * a bounded buffer, so partial aggregation prunes to k·partitions rows
  * BEFORE the shuffle — at 100 TB the exchange carries k rows per
  * (partition × query) instead of the full candidate set.
  *
  * Ordering is total ((score desc, id asc)) so results are deterministic
  * and identical to the window formulation.
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  /** k best by (score desc, id asc), buffer bounded at k. The buffer is
    * kept sorted; a row worse than the current k-th is rejected in O(1)
    * with no allocation — the common path on large candidate sets.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def beats(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.size >= k && !beats(x, buf.last)) buf else best(buf :+ x)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = best(a ++ b)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** Aggregate column: top-k (id, score) structs per group. */
  def topKAgg(k: Int): (Column, Column) => Column = { (id, score) =>
    udaf(new TopKAgg(k), Encoders.product[Scored]).apply(id, score)
  }

  /** Per-query top-k over a scored pair frame — aggregation-based
    * replacement for the window+filter pattern. Output matches
    * Similarity.bruteForceTopK's schema and ordering exactly.
    */
  def perGroupTopK(scored: DataFrame, k: Int,
                   groupCol: String = "query_id", idCol: String = "neighbor_id",
                   scoreCol: String = "score"): DataFrame = {
    val agg = topKAgg(k)(col(idCol), col(scoreCol))
    scored.groupBy(col(groupCol))
      .agg(agg.as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col(groupCol), col("s.id").as(idCol), col("s.score").as(scoreCol),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
