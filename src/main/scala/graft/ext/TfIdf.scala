package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Pin.PinOps

/** TF-IDF document vectors over a capped vocabulary — the text-side
  * counterpart of the embedding similarity family: once a document is a
  * fixed-width weight vector, every ANN operator in [[Similarity]]
  * (brute-force top-k, LSH buckets, IVF) composes unchanged.
  *
  * Determinism across engines is by construction, not by trusting libm:
  * IDF is RATIONAL fixed-point — `((N+1)·1000) div (df+1)` in exact
  * integer arithmetic (no `ln`, whose last-ulp rounding is not pinned by
  * IEEE 754 and can differ between libms) — and weights `tf · idfQ` are
  * exact integers cast to double, so the only float ops are the cosine
  * dot/norm sums, which both engines accumulate in ascending index order
  * (the established q18 policy).
  *
  * Scale: the vocabulary is top-`vocabSize` tokens by corpus frequency —
  * one token-keyed aggregate + a TakeOrdered of `vocabSize` rows, then a
  * BROADCAST join back onto per-doc term frequencies. Vector assembly is
  * per-doc (map lookup over a `vocabSize`-long index sequence, no
  * shuffle beyond the tf aggregate). Vocabulary size, not corpus size,
  * bounds the vector width, so the dense representation stays fixed as
  * the corpus grows.
  */
object TfIdf {

  /** (idCol, tfidf: array<double> of length `vocabSize`) for EVERY doc —
    * docs containing no vocabulary token get the zero vector. Index order
    * of the vocabulary: corpus frequency desc, token asc (deterministic
    * at ties).
    *
    * Runs one driver-side `count()` for N (the IDF denominator needs the
    * corpus size before the plan is built — same pattern as
    * [[Similarity.adaptivePlanes]] deriving the plane count).
    */
  def tfidfVectors(docs: DataFrame, vocabSize: Int = 64,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nDocs = docs.count()
    // pinned: the token stream feeds BOTH the vocabulary aggregate and
    // the per-doc tf aggregate — unpinned, each consumer re-tokenized
    // and re-exploded the whole corpus
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .pin()
    val vocab = toks.groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .withColumn("idx",
        // keyspace-sized window: input is collapsed/bounded before this sort
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("int") - 1)
      .withColumn("idfq", expr(s"(${nDocs + 1L}L * 1000L) div (df + 1L)"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val weights = tf
      .join(broadcast(vocab.select(col("token"), col("idx"), col("idfq"))), Seq("token"))
      .select(col(idCol), col("idx"), (col("tf") * col("idfq")).cast("double").as("w"))
    // dense assembly as vocabSize conditional-sum aggregates (one hash-agg
    // with 64 codegen'd buffers), NOT collect_list→map→transform lookups —
    // the HOF form is interpreted per element and measured ~2s for 5k docs
    val sums = (0 until vocabSize).map(i =>
      sum(when(col("idx") === i, col("w"))).as(s"__w$i"))
    val vecs = weights.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol),
        array((0 until vocabSize).map(i => coalesce(col(s"__w$i"), lit(0.0))): _*).as("tfidf"))
    docs.select(col(idCol)).join(vecs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tfidf"), array_repeat(lit(0.0), vocabSize)).as("tfidf"))
  }
}
