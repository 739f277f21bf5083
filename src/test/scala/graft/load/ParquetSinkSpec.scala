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

  test("sortedParquet: files cover disjoint key ranges, rows ordered within each file") {
    val dir = Files.createTempDirectory("psort").toString
    val d = spark.range(10000).toDF("id")
      .withColumn("k", pmod(col("id") * 7919, lit(10007L))) // scrambled key
    Sinks.sortedParquet(d, dir, sortCols = Seq("k"), numFiles = 4)

    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    // per-file min/max must not overlap across files (range clustering),
    // and rows inside a file must be sorted (row-group stats useful)
    val perFile = back.withColumn("f", input_file_name())
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1, "expected multiple files")
    perFile.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: $perFile")
    case _ => ()
    }
    val files = back.withColumn("f", input_file_name())
      .select("f").distinct().collect().map(_.getString(0))
    files.take(2).foreach { f =>
      val ks = spark.read.parquet(f).select("k").collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, "rows inside a file must be sorted")
    }
  }

  test("zValue: bit interleave on known patterns; key order matters") {
    val d = df("a BIGINT, b BIGINT", Seq(
      org.apache.spark.sql.Row(3L, 0L), // 0b11 ⊗ 0b00 → 0b0101 = 5
      org.apache.spark.sql.Row(0L, 3L), // 0b00 ⊗ 0b11 → 0b1010 = 10
      org.apache.spark.sql.Row(5L, 6L), // 101 ⊗ 110 → b2a2 b1a1 b0a0 = 11 10 01 = 0b111001=57
      org.apache.spark.sql.Row(0L, 0L)))
    val out = d.select(Sinks.zValue(col("a"), col("b"), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(5L, 10L, 57L, 0L))
  }

  test("zorderParquet: files cover disjoint z-address ranges (skip on either key)") {
    val dir = Files.createTempDirectory("pzord").toString
    val d = spark.range(10000).toDF("id")
      .withColumn("x", pmod(col("id") * 7919, lit(256L)))
      .withColumn("y", pmod(col("id") * 104729, lit(256L)))
    Sinks.zorderParquet(d, dir, "x", "y", numFiles = 4, bits = 8)

    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.columns.toSet == Set("id", "x", "y"), "__z must not be written")
    // recompute the address per row: per-file z ranges must be disjoint
    val perFile = back.withColumn("f", input_file_name())
      .withColumn("z", Sinks.zValue(col("x"), col("y"), bits = 8))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1, "expected multiple files")
    perFile.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file z-ranges overlap: ${perFile.toSeq}")
    case _ => ()
    }
  }

  test("unpartitioned path keeps plain overwrite semantics") {
    val dir = Files.createTempDirectory("psink2").toString
    val d = spark.range(10).toDF("id")
    Sinks.parquet(d, dir)
    Sinks.parquet(d, dir) // overwrite, not append
    assert(spark.read.parquet(dir).count() == 10)
  }
}
