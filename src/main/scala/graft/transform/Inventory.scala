package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inventory decrement (J2+F13+F14, reference portfolio-etl.py:634-650).
  *
  * Stock-at-hand LEFT JOIN units-sold on sku; unmatched stock rows sell 0;
  * new_qty = on-hand − sold. The reference's colliding `qty` columns get
  * pandas suffixes `qty_x`/`qty_y` (:636); Spark would raise an ambiguous
  * reference, so the sold side is renamed before the join
  * (SURVEY.md §7.4-b).
  */
object Inventory {

  /** @param stock  inventory dim `(sku, qty, subcategory, color, brand)`
    *               (portfolio-etl.py:634)
    * @param sold   wholesale units sold `(sku, qty)` (output of
    *               [[Aggregate.wholesaleAgg]])
    * @return       stock columns with `qty` replaced by the decremented
    *               quantity, in the reference's column order (:644-646)
    *
    * `sold` is an aggregate over a bounded SKU universe → small → broadcast;
    * the decrement is then a shuffle-free map-side join however large the
    * stock table is.
    */
  def decrement(stock: DataFrame, sold: DataFrame): DataFrame = {
    val soldR = sold.select(col("sku"), col("qty").as("qty_sold"))
    stock
      .join(broadcast(soldR), Seq("sku"), "left_outer")
      .na.fill(0.0, Seq("qty_sold"))                      // fillna(0), :638
      .withColumn("new_qty", col("qty") - col("qty_sold")) // qty_x - qty_y, :640
      .select("sku", "new_qty", "subcategory", "color", "brand") // order :644-646
      .withColumnRenamed("new_qty", "qty")
  }
}
