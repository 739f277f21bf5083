package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation stage (reference portfolio-etl.py:610-632).
  *
  * Both aggregations are partial+final hash aggs in Spark: map-side combine
  * runs before the single shuffle, so at 100 TB the shuffle carries only one
  * row per (partition × key), not the raw fact rows.
  */
object Aggregate {

  /** Retail units sold per SKU (A1, portfolio-etl.py:610-615):
    * project → coerce qty → groupBy(sku).sum(qty). The reference's
    * `sort_values(by='sku')` at :614 is semantically dead (feeds a groupby)
    * and intentionally dropped (SURVEY.md §2.8 O1).
    */
  def retailAgg(sales: DataFrame): DataFrame =
    sales.select(col("sku"), col("qty").cast("double").as("qty"))
      .groupBy("sku")
      .agg(sum("qty").as("qty"))

  /** Retail→wholesale mapping + aggregation (J1+F12+A2,
    * portfolio-etl.py:621-628): RIGHT OUTER join to the mapping table keeps
    * every mapping row (unmatched → null qty), multiplies by the set
    * multiplier, then sums per wholesale SKU.
    *
    * Pandas sums an all-NaN group to 0.0 while Spark sums all-null to null —
    * `coalesce(sum, 0.0)` pins the pandas behavior (SURVEY.md §7.4-a).
    *
    * Expressed as mapping LEFT JOIN sold (identical rows to the
    * reference's sold RIGHT JOIN mapping) so the broadcast build side is
    * the JOIN'S RIGHT side: Spark cannot broadcast-build the left of a
    * left-outer (or the right of a right-outer) join, so the right_outer
    * formulation silently degrades to a sort-merge join once inputs
    * outgrow auto-broadcast. The sold side is the retail AGGREGATE —
    * bounded by the SKU universe, not the fact volume — so broadcasting
    * it keeps this shuffle-free at any fact-side scale.
    */
  def wholesaleAgg(soldValue: DataFrame, skuMap: DataFrame): DataFrame =
    skuMap
      .join(broadcast(soldValue), col("sku") === col("sku_part"), "left_outer")
      .withColumn("result", col("qty") * col("multiplier"))
      .groupBy("sku_name")
      .agg(coalesce(sum("result"), lit(0.0)).as("qty"))
      .withColumnRenamed("sku_name", "sku")

  /** Multi-key brand report aggregation (A3, portfolio-etl.py:720-721,
    * :733-734): groupBy(sku, cost).sum(qty), then total = cost × qty.
    */
  def brandAgg(enriched: DataFrame): DataFrame =
    enriched.groupBy("sku", "cost")
      .agg(sum("qty").as("qty"))
      .withColumn("total", col("cost") * col("qty"))

  /** Skew-spreading two-phase aggregation pattern (shown for sum; use the
    * same shape for large-buffer aggs like collect_set/percentile sketches).
    *
    * For algebraic sums Spark's map-side partial aggregation already caps
    * shuffle volume at one row per (partition × key); salting additionally
    * spreads a hot key's FINAL merge across `salt` reducers — relevant
    * when per-key merge state is big, or upstream explodes concentrate a
    * key in few partitions. AQE's skew handling splits skewed JOIN
    * partitions, not skewed aggregation keys, so this is the aggregation-
    * side tool. Result is identical to a direct groupBy (associativity).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partial = salted.groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(valueCol).as(valueCol))
    partial.groupBy(keyCols: _*).agg(sum(valueCol).as(valueCol))
  }
}
