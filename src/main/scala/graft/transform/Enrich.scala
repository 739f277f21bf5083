package graft.transform

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment + brand reporting (reference portfolio-etl.py:659-775).
  *
  * All reporting joins are single-string-key equi-joins against small dims →
  * broadcast hash joins (SURVEY.md §2.4): zero shuffle on the fact side.
  *
  * `datetime.now()` (:672, :758) is pinned to an explicit `runDate`
  * parameter for determinism (SURVEY.md §7.4-j).
  */
object Enrich {

  /** Key normalization applied to both sides before every reporting join
    * (J5, portfolio-etl.py:661-665, :750-754): stringify + strip.
    */
  def normKey(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn(keyCol, trim(col(keyCol).cast("string")))

  /** Sales enrichment (J3+F7-F12, portfolio-etl.py:659-683): LEFT JOIN the
    * cost/brand dim on sku=SKU, add run-date parts, coerce qty/cost, and
    * compute total = qty × cost (null-propagating, matches NaN).
    */
  def enrichSales(sales: DataFrame, salesMap: DataFrame, runDate: Date): DataFrame = {
    val s = normKey(sales, "sku")
    // Rename the dim key before joining: Spark's default case-insensitive
    // resolution would make drop("SKU") remove the fact's `sku` too.
    val m = normKey(salesMap, "SKU").withColumnRenamed("SKU", "sku_key")
    s.join(broadcast(m), s("sku") === m("sku_key"), "left_outer")
      .drop("sku_key")                                       // :670
      .withColumn("date", lit(runDate).cast("date"))         // :672, pinned
      .withColumn("Year", year(col("date")))                 // :674
      .withColumn("Month", date_format(col("date"), "MMMM")) // :675
      .withColumn("qty", col("qty").cast("double"))          // :680
      .withColumn("cost", col("cost").cast("double"))        // :681
      .withColumn("total", col("qty") * col("cost"))         // :683
  }

  /** Wholesale reporting enrichment (J4, portfolio-etl.py:748-764). */
  def enrichWholesale(finalResult: DataFrame, wsMap: DataFrame, runDate: Date): DataFrame = {
    val f = normKey(finalResult, "sku")
    val m = normKey(wsMap, "sku")
    f.join(broadcast(m), Seq("sku"), "left_outer")
      .withColumn("date", lit(runDate).cast("date"))
      .withColumn("Year", year(col("date")))
      .withColumn("Month", date_format(col("date"), "MMMM"))
  }

  /** Brand split (P7/P8, portfolio-etl.py:688-689, :769-770). The reference's
    * :769 filters one frame with a mask computed on another (index-aligned ⇒
    * garbage); the intended semantics — filter on this frame's own brand —
    * is implemented, divergence documented (SURVEY.md §7.4-h).
    */
  def splitByBrand(df: DataFrame, primary: String, others: Seq[String]): (DataFrame, DataFrame) =
    (df.filter(col("brand") === primary),
     df.filter(col("brand").isin(others: _*)))
}
