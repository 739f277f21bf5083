package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IngestionRobustnessSpec extends SparkSpec {

  test("jsonWithQuarantine: malformed lines survive verbatim, good lines parse typed") {
    val dir = java.nio.file.Files.createTempDirectory("quar")
    val f = dir.resolve("payload.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "sku": "a", "qty": 2.5}
        |not json at all
        |{"id": 2, "sku": "b"}
        |{"id": "WRONG TYPE, unclosed
        |
        |{"id": 3, "sku": "c", "qty": 9.0}
        |""".stripMargin)
    val (good, quarantine) = Feeds.jsonWithQuarantine(
      spark, f.toString, "id BIGINT, sku STRING, qty DOUBLE")
    assert(good.columns.toSeq == Seq("id", "sku", "qty"))
    assert(rowSet(good) == rows(
      Seq("1", "a", "2.5"),
      Seq("2", "b", "null"),   // missing field ≠ corrupt: schema evolution
      Seq("3", "c", "9.0")))
    assert(rowSet(quarantine) == rows(
      Seq("not json at all"),
      Seq("""{"id": "WRONG TYPE, unclosed""")))
  }

  test("readEvolved: batches with different schemas union by name, absent fields null") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    spark.range(2).selectExpr("id", "cast(id as string) as b")
      .write.parquet(dir + "/batch=1")
    spark.range(2).selectExpr("id + 10 as id", "id * 1.5 as c")
      .write.parquet(dir + "/batch=2")
    val out = Feeds.readEvolved(spark, dir)
    assert(out.columns.sorted.toSeq == Seq("b", "batch", "c", "id"))
    assert(out.count() == 4)
    // old batch: c null; new batch: b null
    assert(out.filter(col("batch") === 1 && col("c").isNull).count() == 2)
    assert(out.filter(col("batch") === 2 && col("b").isNull).count() == 2)
  }
}
