package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.extract.XlsxFixture.writeXlsx

class ExcelDataSourceSpec extends SparkSpec {

  private def book: String = writeXlsx(Seq(
    Seq(Left("sku"), Left("qty"), Left("site")),
    Seq(Left("A-1"), Right(4.0), Left("hsn")),
    Seq(Left("A-2"), Right(2.0), Left("rue")),
    Seq(Left("A-3"), Right(1.5), Left("hsn"))))

  test("format(graft-excel): schema from header, all-string rows") {
    val df = spark.read.format("graft-excel").load(book)
    assert(df.schema.fieldNames.toSeq == Seq("sku", "qty", "site"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(rowSet(df) == rows(
      Seq("A-1", "4.0", "hsn"), Seq("A-2", "2.0", "rue"), Seq("A-3", "1.5", "hsn")))
  }

  test("column pruning is pushed into the scan") {
    val df = spark.read.format("graft-excel").load(book).select("qty")
    val leaf = df.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("qty"), s"scan not pruned: ${leaf.output}")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1.5", "2.0", "4.0"))
  }

  test("composes as a real table: filter + agg over the V2 scan") {
    val df = spark.read.format("graft-excel").load(book)
      .filter(col("site") === "hsn")
      .agg(sum(col("qty").cast("double")).as("total"))
    assert(df.head().getDouble(0) == 5.5)
  }

  test("SQL USING graft-excel") {
    val p = book
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW xl USING `graft-excel` OPTIONS (path '$p')")
    assert(spark.sql("SELECT count(*) FROM xl").head().getLong(0) == 3L)
  }

  test("legacy .xls rejection propagates through the source") {
    val dir = java.nio.file.Files.createTempDirectory("xlsv2")
    val p = dir.resolve("book.xls")
    java.nio.file.Files.write(p,
      Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte) ++ new Array[Byte](32))
    val e = intercept[Exception](spark.read.format("graft-excel").load(p.toString))
    assert(e.getMessage != null && e.getMessage.contains(".xlsx"))
  }
}
