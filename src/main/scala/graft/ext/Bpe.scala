package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Pin.PinOps

/** Distributed BPE merge training (tokenizer induction) over the document
  * corpus — the vocabulary-learning stage of a training-data pipeline
  * (Sennrich et al. 2016, arXiv:1508.07909 — public paper).
  *
  * Trains on the WORD-FREQUENCY DICTIONARY, exactly like reference BPE
  * trainers: the corpus is scanned once into `(word, freq)` (one shuffle,
  * the only corpus-sized step — the dict is vocabulary-bounded by Heaps'
  * law at any corpus size), then every merge round runs on the compact
  * dict: count adjacent symbol pairs weighted by word frequency, pick the
  * most frequent pair (ties break lexicographically — strings are ASCII
  * here, so Spark and DuckDB agree on order), and apply the merge to every
  * word's symbol sequence.
  *
  * The greedy LEFT-TO-RIGHT non-overlapping application (the subtle part:
  * pair (a,a) over "aaa" merges positions 1-2, not 2-3) is expressed
  * relationally: match positions chain into runs of consecutive indices
  * (`i - row_number` constant per run), and only odd offsets within a run
  * are taken — overlaps are possible only when the pair is a doubled
  * symbol, and the parity rule reproduces the sequential greedy exactly.
  * All arithmetic is integer/string, so the DuckDB oracle replays the
  * whole training loop hash-exactly.
  */
object Bpe {

  /** `(word, freq)` — lowercase whitespace tokens of `textCol`. */
  def wordDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learned merge table `(rank, pair_a, pair_b, freq)` after `nMerges`
    * rounds; stops early (fewer rows) if the dict runs out of pairs.
    */
  def learnMerges(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame =
    train(docs, nMerges, textCol)._1

  /** Per-document BPE token counts under the `nMerges`-round vocabulary —
    * the ENCODE side of the trainer: every word's token count is the
    * length of its fully-merged symbol sequence, and a document's count is
    * the sum over its words. One broadcast-able (word → len) join against
    * the trained dict; the corpus is never re-tokenized per merge.
    */
  def tokenCounts(docs: DataFrame, nMerges: Int, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val dict = train(docs, nMerges, textCol)._2
    docs.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(dict.select(col("word"), size(col("syms")).as("n"))), "word")
      .groupBy(idCol).agg(sum("n").as("n_tokens"))
  }

  /** (merge table, trained dict `(word, freq, syms)`) after `nMerges`
    * rounds.
    */
  private def train(docs: DataFrame, nMerges: Int, textCol: String): (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    val spark = docs.sparkSession

    // initial symbol sequences: one character per symbol
    var dict = wordDict(docs, textCol)
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .pin()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // pair counts weighted by word frequency (guard: Spark's sequence
      // DESCENDS when start > stop, so single-symbol words need the if)
      val top = dict
        .select(col("freq"), explode(expr(
          """if(size(syms) > 1,
            |   transform(sequence(1, size(syms) - 1),
            |     i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)),
            |   array())""".stripMargin)).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, cnt))

        // greedy non-overlapping application, relationally
        val pos = dict.select(col("word"), col("freq"), col("syms"),
          posexplode(col("syms")).as(Seq("p0", "sym")))
          .withColumn("i", col("p0") + 1).drop("p0")
        // try_element_at: the last position has no successor — under ANSI
        // a plain element_at would throw instead of null-ing the predicate
        val matches = pos
          .filter(col("sym") === lit(a) &&
            expr("try_element_at(syms, CAST(i + 1 AS INT))") === lit(b))
          .select("word", "i")
        val sel = matches
          .withColumn("rn", row_number().over(Window.partitionBy("word").orderBy("i")))
          .withColumn("run", col("i") - col("rn"))
          .withColumn("k", row_number().over(Window.partitionBy("word", "run").orderBy("i")))
          .filter(col("k") % 2 === 1)
          .select("word", "i")
        val starts = sel.withColumn("m", lit(1))
        val consumed = sel.select(col("word"), (col("i") + 1).as("i"), lit(1).as("c"))
        dict = pos
          .join(starts, Seq("word", "i"), "left")
          .join(consumed, Seq("word", "i"), "left")
          .filter(col("c").isNull)
          .withColumn("out", when(col("m") === 1,
            concat(col("sym"), expr("try_element_at(syms, CAST(i + 1 AS INT))")))
            .otherwise(col("sym")))
          .groupBy("word", "freq")
          .agg(transform(array_sort(collect_list(struct(col("i"), col("out")))),
            x => x.getField("out")).as("syms"))
          .pin() // per merge — the dict fans into pos/matches/sel ×3 next
                 // round, so a sparser cadence multiplies recompute
                 // (measured 1.6-2.1× WORSE with pin-every-other)
        rank += 1
      }
    }

    import scala.jdk.CollectionConverters._
    val mergeDf = spark.createDataFrame(
      merges.map { case (r, a, b, c) =>
        org.apache.spark.sql.Row(r.toLong, a, b, c)
      }.toList.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_a", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_b", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("freq", org.apache.spark.sql.types.LongType, nullable = false))))
    (mergeDf, dict)
  }
}
