package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning and not reproducible
  * across engines; corpus curation needs the same subset on every run,
  * engine and re-partitioning. A row's fate here is a pure function of its
  * id: survive iff `affineHash(id) mod 1000 < permille(stratum)` — the
  * MinHash affine family ([[Dedup.hashA]]/[[Dedup.hashB]], j=7) over the
  * BIGINT id, so a SQL oracle reproduces the exact row set.
  *
  * Scale: a narrow filter — no shuffle, no state, pushes through any plan.
  */
object Sampling {

  /** Per-stratum sampling rates in permille; strata are matched in the
    * given order (first match wins), unmatched rows get `defaultPermille`.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           permille: Seq[(String, Int)],
                           defaultPermille: Int): DataFrame = {
    require(permille.forall { case (_, p) => p >= 0 && p <= 1000 },
      "stratum permille out of [0, 1000]")
    require(defaultPermille >= 0 && defaultPermille <= 1000,
      "defaultPermille out of [0, 1000]")
    val h = Dedup.affineHash(col(idCol), 7) % 1000L
    val rate = permille.reverse.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(h < rate)
  }
}
