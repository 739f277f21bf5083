package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-corpus adapters: map the driver's star schema
  * (`/root/testdata/sf*`, TESTDATA.md) onto the reference's logical tables
  * (SURVEY.md §1.1) so every reference operator runs over oracle-checkable
  * parquet. Mapping per FIXTURES.md §B: `lineitem` is the sales fact
  * (l_partkey→sku, l_quantity→qty, l_suppkey→site), `part` plays every
  * mapping/dim role (p_retailprice→cost, p_brand→brand, p_size→multiplier).
  */
object Tables {

  /** Every physical table in a testdata directory (TESTDATA.md). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS): Spark reads it as a nanos
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench);
    * converted here to a microsecond timestamp with true floor division —
    * `pmod` keeps the remainder non-negative, so pre-1970 (negative-epoch)
    * nanos round toward −∞ exactly like DuckDB's date_trunc('microseconds')
    * (`div` alone truncates toward zero and would diverge by 1µs there).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      // driver testdata: TIMESTAMP(NANOS) read as long (nanosAsLong) — µs truncate
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      // NTZ parquet (e.g. DuckDB-written derivations): session is pinned
      // UTC, so the instant is unchanged — normalize for ts functions
      // (unix_micros etc.) that require TIMESTAMP
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Canonical sales fact `(sku, qty, site)` (reference sales_header,
    * portfolio-etl.py:215).
    */
  def sales(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_partkey").cast("string").as("sku"),
      col("l_quantity").cast("double").as("qty"),
      col("l_suppkey").cast("string").as("site"))

  /** Retail→wholesale mapping `(sku_part, sku_name, multiplier)`
    * (portfolio-etl.py:621).
    */
  def skuMap(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey").cast("string").as("sku_part"),
      col("p_name").as("sku_name"),
      col("p_size").cast("double").as("multiplier"))

  /** Cost/brand dim `(SKU, cost, brand)` (portfolio-etl.py:659). */
  def salesMap(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey").cast("string").as("SKU"),
      col("p_retailprice").as("cost"),
      col("p_brand").as("brand"))

  /** Inventory dim `(sku, qty, subcategory, color, brand)`
    * (portfolio-etl.py:634); on-hand quantity is p_size scaled.
    */
  def stock(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_name").as("sku"),
      (col("p_size").cast("double") * 100.0).as("qty"),
      col("p_type").as("subcategory"),
      col("p_name").as("color"),
      col("p_brand").as("brand"))
      .groupBy("sku").agg(
        sum("qty").as("qty"), min("subcategory").as("subcategory"),
        min("color").as("color"), min("brand").as("brand"))

  /** Wholesale brand dim `(sku, brand)` (portfolio-etl.py:748); keyed by
    * wholesale sku (= p_name domain, deduped).
    */
  def wholesaleMap(s: SparkSession, d: String): DataFrame =
    part(s, d).groupBy(col("p_name").as("sku"))
      .agg(min("p_brand").as("brand"))
}
