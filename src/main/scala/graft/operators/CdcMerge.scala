package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a keyed changelog of full row images
  * (op ∈ {I, U, D} — insert and update are both "upsert the image", the
  * standard Debezium/Delta `MERGE` collapse) onto a base snapshot,
  * last-writer-wins per key by a sequence column. The lakehouse compaction
  * primitive: base ⊎ changelog → next snapshot.
  *
  * Semantics per key:
  *   - changelog has rows → the HIGHEST-sequence row decides: op D drops
  *     the key, else its row image replaces (or inserts) the key.
  *   - no changelog rows → the base row survives unchanged.
  * Ties on the sequence are broken by op DESCENDING ('U' > 'I' > 'D' in
  * string order, so an update beats a delete at the same sequence),
  * making the merge a pure function of the inputs; callers with a truly
  * total sequence never hit the tie-break.
  *
  * Scale: the changelog reduces to one row per key with a (key)-partition
  * rank window — a changelog-sized shuffle, map-side prunable by
  * WindowGroupLimit — and the base is LEFT ANTI joined against those keys
  * (broadcast when the day's changelog keyset fits, the common case for a
  * 100 TB base × GB-scale daily changelog; shuffle-join otherwise, on the
  * same key both sides). The base is never window-sorted and never
  * aggregated: untouched rows stream through one join probe.
  */
object CdcMerge {

  def merge(base: DataFrame, changelog: DataFrame, keyCol: String,
            seqCol: String, opCol: String): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base must carry key column $keyCol")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changelog
      .withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    base.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(dataCols.map(col): _*)
      .union(upserts)
  }
}
