package graft.extract

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Writes a minimal but real OOXML workbook: shared strings + one sheet.
  * Shared by ExcelSpec (driver-side reader) and ExcelDataSourceSpec (V2
  * source).
  */
object XlsxFixture {

  def writeXlsx(cells: Seq[Seq[Either[String, Double]]]): String = {
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
}
