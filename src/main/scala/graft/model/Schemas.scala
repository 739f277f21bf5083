package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * The reference (portfolio-etl.py) never declares schemas — everything is
  * pandas-inferred (portfolio-etl.py:468, :491, :515). Here every boundary is
  * an explicit StructType so production paths never rely on inference
  * (SURVEY.md §1.3).
  */
object Schemas {

  /** Canonical sales fact — the `(sku, qty, site)` contract every extractor
    * must produce (reference `sales_header`, portfolio-etl.py:215, :252).
    */
  final case class SaleLine(sku: String, qty: Double, site: String)

  val saleLine: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("qty", DoubleType),
    StructField("site", StringType)
  ))

  /** Retail→wholesale mapping table (portfolio-etl.py:621-625): a retail
    * set-SKU maps to component wholesale SKUs with a unit multiplier.
    */
  val skuMap: StructType = StructType(Seq(
    StructField("sku_part", StringType),
    StructField("sku_name", StringType),
    StructField("multiplier", DoubleType)
  ))

  /** Cost/brand enrichment dim (portfolio-etl.py:659-668). */
  val salesMap: StructType = StructType(Seq(
    StructField("SKU", StringType),
    StructField("cost", DoubleType),
    StructField("brand", StringType)
  ))

  /** Wholesale brand dim (portfolio-etl.py:748-756). */
  val wholesaleSoldMap: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("brand", StringType)
  ))

  /** Inventory dim (portfolio-etl.py:634, column order :644-646). */
  val stock: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("qty", DoubleType),
    StructField("subcategory", StringType),
    StructField("color", StringType),
    StructField("brand", StringType)
  ))
}
