package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the flagship composition of the
  * training-data extension surface, the pipeline a 100 TB pretraining
  * corpus actually runs:
  *
  *   near-dup clustering (MinHash+LSH, O(n) output)
  *     → keep the best-quality copy per cluster
  *     → deterministic stratified sampling by language
  *     → minimum-quality gate
  *     → per-doc stats for the survivors.
  *
  * Every stage is one of the individually oracle-checked operators
  * (q22/q40/q41/q13); this composition is itself hash-checked end-to-end
  * (q44). Lazy all the way down: Catalyst sees ONE plan — the stats
  * subtree is shared, filters push into scans, and the only shuffles are
  * the operators' own key exchanges.
  */
object Curation {

  def curate(docs: DataFrame,
             permille: Seq[(String, Int)], defaultPermille: Int,
             minQuality: Double,
             minHashK: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val stats = TextAnalysis.stats(docs)
    val clusters = Dedup.minHashClusters(
      Dedup.minHashSignatures(docs, minHashK), minHashK, rowsPerBand)
    val best = Dedup.bestCopyPerCluster(clusters, stats)
    val kept = docs.select("doc_id", "lang")
      .join(best.select(col("keep_id").as("doc_id")), Seq("doc_id"))
    Sampling.stratifiedHashSample(kept, "doc_id", "lang", permille, defaultPermille)
      .join(stats.select("doc_id", "n_tokens", "quality"), Seq("doc_id"))
      .filter(col("quality") >= minQuality)
      .select("doc_id", "lang", "n_tokens", "quality")
  }
}
