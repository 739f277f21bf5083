package graft.extract

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** API-payload readers (reference portfolio-etl.py §2.1 S3-S9, §2.2 N1-N7).
  *
  * The reference fetches each marketplace API with `requests`/curl and then
  * flattens nested JSON/XML with `json_normalize` + Python loops. Here the
  * connector boundary is a payload *file* (HTTP stays outside the engine,
  * SURVEY.md §3.1): every reader is `spark.read.json`/`format("xml")` with
  * the source's nested shape, flattened by lazy `explode`s — the per-row
  * Python loops (:63-76, :170-177, :419-429) disappear into single
  * generator expressions that run partition-parallel at any scale.
  *
  * All readers return the canonical `(sku, qty, site)` of Schemas.saleLine.
  */
object Payloads {

  private def canon(df: DataFrame, sku: org.apache.spark.sql.Column,
                    qty: org.apache.spark.sql.Column, site: String): DataFrame =
    df.select(sku.cast("string").as("sku"),
      // try_cast = errors='coerce' under ANSI mode (dirty payload rows → null)
      qty.try_cast("double").as("qty"),
      lit(site).as("site"))

  /** Walmart (N1-N2, portfolio-etl.py:54-78): double-nested
    * `list.elements.order[].orderLines.orderLine[]`. The reference's
    * iterrows loop (:63-76, quadratic append) becomes two explodes.
    */
  def walmart(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val lines = raw
      .select(explode(col("list.elements.order")).as("o"))
      .select(explode(col("o.orderLines.orderLine")).as("l"))
    canon(lines, col("l.item.sku"), col("l.orderLineQuantity.amount"), "walmart")
  }

  /** Houzz (S4+N6, portfolio-etl.py:98-135): XML `<Order><OrderItem>`;
    * built-in XML source (Spark ≥4.0), rowTag=Order, explode OrderItem.
    * XML inference yields a bare STRUCT when every order has exactly one
    * item — wrap it so single- and multi-item orders both explode (the
    * reference's findall handles both shapes, :129).
    */
  def houzz(spark: SparkSession, path: String): DataFrame = {
    val orders = spark.read.format("xml").option("rowTag", "Order").load(path)
    val itemsCol = orders.schema("OrderItem").dataType match {
      case _: org.apache.spark.sql.types.ArrayType => col("OrderItem")
      case _ => array(col("OrderItem"))
    }
    val items = orders.select(explode(itemsCol).as("i"))
    canon(items, col("i.SKU"), col("i.Quantity"), "houzz")
  }

  /** Faire (S5+N7, portfolio-etl.py:152-177): `orders[].items[]`. */
  def faire(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val items = raw.select(explode(col("orders")).as("o"))
      .select(explode(col("o.items")).as("i"))
    canon(items, col("i.sku"), col("i.quantity"), "faire")
  }

  /** WooCommerce (S6+N3+P4, portfolio-etl.py:197-226): top-level array of
    * orders; timestamp-window filter (:219) then explode line_items.
    */
  def wooCommerce(spark: SparkSession, path: String, site: String,
                  from: Timestamp, to: Timestamp): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val inWindow = raw
      .withColumn("ts", to_timestamp(col("date_created")))
      .filter(col("ts") > lit(from) && col("ts") < lit(to))
    val items = inWindow.select(explode(col("line_items")).as("li"))
    canon(items, col("li.sku"), col("li.quantity"), site)
  }

  /** DSCO (S7+N4, portfolio-etl.py:241-307): per-tenant payloads unioned by
    * the caller; tz-naive date filter (:258-263) then explode lineItems.
    * The tenant→site mapping (:268-274) is a per-branch literal, not a join.
    */
  def dsco(spark: SparkSession, path: String, site: String,
           from: Timestamp, to: Timestamp): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val inWindow = raw.select(explode(col("orders")).as("o"))
      .withColumn("ts", to_timestamp(col("o.dscoCreateDate")))
      .filter(col("ts") > lit(from) && col("ts") < lit(to))
    val items = inWindow.select(explode(col("o.lineItems")).as("i"))
    canon(items, col("i.sku"), col("i.quantity"), site)
  }

  /** Mirakl (S8+N5+P5, portfolio-etl.py:312-329): drop CANCELED orders,
    * explode order_lines; `apply(pd.Series)` struct expansion (:327) is a
    * struct-star select.
    */
  def mirakl(spark: SparkSession, path: String, site: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val live = raw.select(explode(col("orders")).as("o"))
      .filter(col("o.order_state") =!= "CANCELED")
    val items = live.select(explode(col("o.order_lines")).as("l"))
    canon(items, col("l.offer_sku"), col("l.quantity"), site)
  }

  /** Wayfair (S9+N7, portfolio-etl.py:376-429): GraphQL response
    * `data.getDropshipPurchaseOrders[].products[]`.
    */
  def wayfair(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val items = raw.select(explode(col("data.getDropshipPurchaseOrders")).as("po"))
      .select(explode(col("po.products")).as("p"))
    canon(items, col("p.partNumber"), col("p.quantity"), "wayfair")
  }
}
