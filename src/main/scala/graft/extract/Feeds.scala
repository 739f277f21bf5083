package graft.extract

import scala.util.Try
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** File-feed extraction (reference portfolio-etl.py:465-534).
  *
  * The reference has two near-duplicate reader functions (:488-505 and a
  * shadowing redefinition at :512-525) plus a bespoke Macy's reader (:465-482).
  * Here a single declarative [[FileFeed]] descriptor drives one reader
  * (SURVEY.md §3.2) — no shadowing, schema-checked output.
  */
final case class FileFeed(
    path: String,
    sep: String = ",",                 // "\t" for Amazon TSV (:491, :529)
    headerOffset: Int = 0,             // Macy's 4 preamble lines (:468)
    renames: Map[String, String] = Map.empty, // e.g. "Vendor SKU"→"sku" (:475)
    siteLiteral: Option[String] = None,       // e.g. "Walmart" (:517)
    siteColumn: Option[String] = None         // e.g. "Merchant" (:474)
)

object Feeds {

  /** Reads one feed to the canonical `(sku, qty, site)` shape.
    *
    * Missing/unreadable file ⇒ the reference's 1-row sentinel
    * `('other', 0, site)` (portfolio-etl.py:477-480, :500-503, :520-523),
    * which the clean stage later filters out (Clean.dropJunkRows).
    *
    * Preamble skipping: CSV has no skip-N-rows option, so the connector
    * pre-strips in-engine via an index filter on the raw lines — these feed
    * files are small dims; fact-scale data arrives as Parquet, never as
    * preambled CSV (SURVEY.md §2.1 S10).
    */
  def read(spark: SparkSession, feed: FileFeed): DataFrame =
    Try(readRaw(spark, feed)).getOrElse(sentinel(spark, feed))

  private def readRaw(spark: SparkSession, feed: FileFeed): DataFrame = {
    val base =
      if (feed.headerOffset == 0) {
        spark.read.option("header", "true").option("sep", feed.sep).csv(feed.path)
      } else {
        // Strip N preamble lines positionally, then re-parse. Small-file
        // path only (driver reads lines once); deterministic and testable.
        import spark.implicits._
        val lines = spark.read.textFile(feed.path).collect().drop(feed.headerOffset)
        val ds = spark.createDataset(lines.toIndexedSeq)
        spark.read.option("header", "true").option("sep", feed.sep).csv(ds)
      }
    val renamed = feed.renames.foldLeft(base) { case (df, (from, to)) =>
      if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
    val withSite = (feed.siteColumn, feed.siteLiteral) match {
      case (Some(c), _) if renamed.columns.contains(c) =>
        renamed.withColumn("site", col(c))
      case (_, Some(lit0)) => renamed.withColumn("site", lit(lit0))
      case _               => renamed.withColumn("site", lit(null).cast("string"))
    }
    withSite.select(
      col("sku").cast("string").as("sku"),
      // try_cast: dirty feed rows coerce to null (ANSI cast would throw)
      col("qty").try_cast("double").as("qty"),
      col("site").cast("string").as("site"))
  }

  /** 1-row missing-file sentinel (S14, portfolio-etl.py:477-480). */
  def sentinel(spark: SparkSession, feed: FileFeed): DataFrame = {
    val site = feed.siteLiteral.getOrElse(feed.path)
    spark.createDataFrame(
      java.util.List.of(Row("other", 0.0, site)), Schemas.saleLine)
  }
}
