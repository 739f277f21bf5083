package graft.load

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Same sink contract as ParquetSinkSpec, over the ORC container: values
  * round-trip, partition dirs prune, and value predicates reach the ORC
  * scan as PushedFilters (stripe-level min/max skipping at scale).
  */
class OrcSinkSpec extends SparkSpec {

  test("ORC round-trip with partition pruning and pushed filters") {
    val dir = Files.createTempDirectory("osink").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.orc(events, dir, partitionCols = Seq("event_type"))

    val back = spark.read.orc(dir)
    assert(back.count() == events.count())

    val one = back.filter(col("event_type") === "click" && col("value") > 50.0)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("event_type"),
      s"no partition filter in:\n$scan")
    assert(scan.contains("PushedFilters: [") && scan.contains("GreaterThan(value"),
      s"no pushed value filter in:\n$scan")
    val expected = events.filter(col("event_type") === "click" && col("value") > 50.0).count()
    assert(one.count() == expected && expected > 0)
  }

  test("ORC preserves exact doubles and timestamps") {
    val dir = Files.createTempDirectory("osink2").toString
    val src = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "value")
    Sinks.orc(src, dir)
    assertSameRows(spark.read.orc(dir).orderBy("event_id"), src.orderBy("event_id"))
  }
}
