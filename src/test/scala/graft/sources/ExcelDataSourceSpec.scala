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

  test("directory of workbooks: one partition per file, union-by-name, sorted order") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("xlmulti")
    def add(name: String, cells: Seq[Seq[Either[String, Double]]]): Unit =
      Files.move(Paths.get(writeXlsx(cells)), dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    add("a.xlsx", Seq(Seq(Left("sku"), Left("qty")), Seq(Left("A-1"), Right(1.0))))
    add("b.xlsx", Seq(Seq(Left("sku"), Left("qty")), Seq(Left("B-1"), Right(2.0))))
    // c has an extra column and a different order: matched by header NAME
    add("c.xlsx", Seq(Seq(Left("extra"), Left("qty"), Left("sku")),
      Seq(Left("x"), Right(3.0), Left("C-1"))))
    Files.write(dir.resolve("notes.txt"), "ignored".getBytes) // non-xlsx skipped

    val df = spark.read.format("graft-excel").load(dir.toString)
    // schema from the first (sorted) workbook
    assert(df.schema.fieldNames.toSeq == Seq("sku", "qty"))
    assert(df.rdd.getNumPartitions == 3, "expected one partition per workbook")
    assert(rowSet(df) == rows(Seq("A-1", "1.0"), Seq("B-1", "2.0"), Seq("C-1", "3.0")))
  }

  test("glob path selects matching workbooks; empty match is an explicit error") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("xlglob")
    def add(name: String, cells: Seq[Seq[Either[String, Double]]]): Unit =
      Files.move(Paths.get(writeXlsx(cells)), dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    add("feed_1.xlsx", Seq(Seq(Left("sku")), Seq(Left("F-1"))))
    add("feed_2.xlsx", Seq(Seq(Left("sku")), Seq(Left("F-2"))))
    add("other.xlsx", Seq(Seq(Left("sku")), Seq(Left("X-1"))))

    val df = spark.read.format("graft-excel").load(s"$dir/feed_*.xlsx")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("F-1", "F-2"))
    val e = intercept[Exception](
      spark.read.format("graft-excel").load(s"$dir/nope_*.xlsx").collect())
    assert(e.getMessage.contains("no workbooks match"))
  }

  test("corrupt OLE2 surfaces a clear container error through the source (valid .xls now parses — BiffSpec)") {
    val dir = java.nio.file.Files.createTempDirectory("xlsv2")
    val p = dir.resolve("book.xls")
    java.nio.file.Files.write(p,
      Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte) ++ new Array[Byte](32))
    val e = intercept[Exception](spark.read.format("graft-excel").load(p.toString))
    assert(e.getMessage != null && e.getMessage.contains("OLE2"))
  }
}
