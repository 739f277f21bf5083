package graft.extract

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

class ExcelSpec extends SparkSpec {

  /** Writes a minimal but real OOXML workbook: shared strings + one sheet. */
  private def writeXlsx(cells: Seq[Seq[Either[String, Double]]]): String = {
    val dir = Files.createTempDirectory("xlsx")
    val path = dir.resolve("book.xlsx").toString
    val strings = cells.flatten.collect { case Left(s) => s }.distinct
    val sIdx = strings.zipWithIndex.toMap
    def colRef(i: Int): String = { // 0 → A, 27 → AB
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetRows = cells.zipWithIndex.map { case (row, r) =>
      val cs = row.zipWithIndex.map {
        case (Left(s), c)  => s"""<c r="${colRef(c)}${r + 1}" t="s"><v>${sIdx(s)}</v></c>"""
        case (Right(d), c) => s"""<c r="${colRef(c)}${r + 1}"><v>$d</v></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetRows</sheetData></worksheet>"""
    val ssXml =
      s"""<?xml version="1.0"?><sst>${strings.map(s => s"<si><t>$s</t></si>").mkString}</sst>"""
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/worksheets/sheet1.xml", sheetXml)
    put("xl/sharedStrings.xml", ssXml)
    zos.close()
    path
  }

  test("reads header + mixed string/numeric cells (S11, hsn/rue/walmart shape)") {
    val p = writeXlsx(Seq(
      Seq(Left("Supplier Code"), Left("QTY"), Left("RequestorName")),
      Seq(Left("HS-1"), Right(4.0), Left("hsn")),
      Seq(Left("HS-2"), Right(2.0), Left("hsn"))))
    val feed = FileFeed(p, renames = Map("Supplier Code" -> "sku", "QTY" -> "qty"),
      siteColumn = Some("RequestorName"))
    assert(rowSet(Excel.readFeed(spark, feed)) ==
      rows(Seq("HS-1", "4.0", "hsn"), Seq("HS-2", "2.0", "hsn")))
  }

  test("sparse rows (missing cells) align by cell reference") {
    val p = writeXlsx(Seq(
      Seq(Left("sku"), Left("qty")),
      Seq(Left("A-1"), Right(1.0))))
    val (header, rows0) = Excel.readSheet(p)
    assert(header == Seq("sku", "qty"))
    assert(rows0 == Seq(Seq("A-1", "1.0")))
  }

  test("missing/corrupt file falls back to the sentinel row (S14)") {
    val feed = FileFeed("/nonexistent/book.xlsx", siteLiteral = Some("Ruelala & Gilt"))
    assert(rowSet(Excel.readFeed(spark, feed)) == rows(Seq("other", "0.0", "Ruelala & Gilt")))
  }

  test("legacy BIFF .xls is rejected with an explicit error, not the sentinel") {
    val dir = Files.createTempDirectory("xls")
    val path = dir.resolve("book.xls").toString
    val out = new FileOutputStream(path)
    // OLE2 compound-file magic + padding: what a real .xls starts with
    out.write(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    out.write(new Array[Byte](64))
    out.close()
    val feed = FileFeed(path, siteLiteral = Some("hsn"))
    val e = intercept[UnsupportedOperationException](Excel.readFeed(spark, feed))
    assert(e.getMessage.contains(".xlsx"))
  }
}
