package graft.load

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The scale-path sink contract: partitioned parquet written by
  * Sinks.parquet must come back with partition PRUNING — a filter on the
  * partition column reads only that directory, which at 100 TB is the
  * difference between scanning a day and scanning the lake.
  */
class ParquetSinkSpec extends SparkSpec {

  test("partitionBy round-trip: partition filter prunes the scan") {
    val dir = Files.createTempDirectory("psink").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    Sinks.parquet(events, dir, partitionCols = Seq("event_type"))

    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())

    val one = back.filter(col("event_type") === "click")
    val scan = one.queryExecution.executedPlan.toString
    // pruning shows up as a PartitionFilters entry on the scan, and the
    // files actually read are only the matching partition directory
    assert(scan.contains("PartitionFilters: [") && scan.contains("event_type"),
      s"no partition filter in:\n$scan")
    val expected = events.filter(col("event_type") === "click").count()
    assert(one.count() == expected && expected > 0)
  }

  test("unpartitioned path keeps plain overwrite semantics") {
    val dir = Files.createTempDirectory("psink2").toString
    val d = spark.range(10).toDF("id")
    Sinks.parquet(d, dir)
    Sinks.parquet(d, dir) // overwrite, not append
    assert(spark.read.parquet(dir).count() == 10)
  }
}
