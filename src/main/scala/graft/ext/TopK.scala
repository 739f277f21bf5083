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

  /** Top-k JOIN (rank join — Ilyas, Aref & Elmagarmid, VLDB 2003): the k
    * best (ka, kb) pairs by combined score `sa + sb` over an existing
    * pair relation, WITHOUT ranking the full join. The classic bound: if
    * θ lower-bounds the true kth pair score, every answer pair has
    * `sa ≥ θ − max(sb)` (and symmetrically), so both score relations can
    * be PRUNED before the join. θ comes from a cheap candidate pool — the
    * pairs incident to each side's single best key (kth candidate score
    * when the pool has ≥ k pairs, else no pruning) — computed entirely
    * in-plan as one-row aggregates broadcast into the side filters;
    * nothing is collected.
    *
    * The registered oracle is the BRUTE-FORCE spelling: the driver's hash
    * equality is the completeness certificate that pruning dropped no
    * answer. Scores are integer (cents); ties break (score desc, ka, kb).
    *
    * Scale shape: score relations are pruned at the SCAN by a broadcast
    * threshold predicate; the join and the final single-partition top-k
    * window run over the pruned (answer-magnitude) row set — the whole
    * point vs scoring the full pair relation. The candidate pool is two
    * key-equality filters.
    */
  def topKPairJoin(pairs: DataFrame, aScores: DataFrame, bScores: DataFrame,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val a = aScores.select(col("ka"), col("sa"))
    val b = bScores.select(col("kb"), col("sb"))
    val maxes = a.agg(max(col("sa")).as("max_sa"))
      .crossJoin(b.agg(max(col("sb")).as("max_sb")))
    // side bests (deterministic arg-max: highest score, then highest key)
    val bestA = a.agg(max(struct(col("sa"), col("ka"))).as("m"))
      .select(col("m.ka").as("best_ka"))
    val bestB = b.agg(max(struct(col("sb"), col("kb"))).as("m"))
      .select(col("m.kb").as("best_kb"))
    val pool = pairs
      .crossJoin(broadcast(bestA)).crossJoin(broadcast(bestB))
      .filter(col("ka") === col("best_ka") || col("kb") === col("best_kb"))
      .join(a, Seq("ka")).join(b, Seq("kb"))
      .withColumn("score", col("sa") + col("sb"))
    // kth pool score as an AGGREGATE (min of the top-k slice) so an
    // undersized — even empty — pool still yields the one no-prune row
    // keyspace-sized window: input is collapsed/bounded before this sort
    val wPool = Window.orderBy(col("score").desc, col("ka"), col("kb"))
    val theta = pool
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= k)
      .agg(when(count(lit(1)) === k, min(col("score")))
        .otherwise(lit(Long.MinValue / 4)).as("theta"))
    val bound = broadcast(theta.crossJoin(maxes))
    val prunedA = a.crossJoin(bound)
      .filter(col("sa") >= col("theta") - col("max_sb"))
      .select("ka", "sa")
    val prunedB = b.crossJoin(bound)
      .filter(col("sb") >= col("theta") - col("max_sa"))
      .select("kb", "sb")
    // keyspace-sized window: input is collapsed/bounded before this sort
    val w = Window.orderBy(col("score").desc, col("ka"), col("kb"))
    pairs.join(prunedA, Seq("ka")).join(prunedB, Seq("kb"))
      .withColumn("score", col("sa") + col("sb"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("ka", "kb", "score", "rank")
  }
}
