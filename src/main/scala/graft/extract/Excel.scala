package graft.extract

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

/** Minimal Excel reader (S11, reference portfolio-etl.py:491, :515 uses
  * `pd.read_excel` for hsn/rue/walmart feeds) — BOTH containers pandas
  * accepts: OOXML `.xlsx` (this file) and legacy BIFF8 `.xls`
  * (dispatched to [[Biff]] by magic sniff).
  *
  * Spark has no built-in Excel source; the reference's Excel inputs are
  * small mapping/feed files (README.md:19-20 sanctions flat-file mode), so
  * this is a deliberate driver-side connector: unzip the OOXML container,
  * parse `xl/worksheets/sheet1.xml` + `xl/sharedStrings.xml` with the
  * JDK's DOM parser, and hand Spark a DataFrame (first row = header, all
  * columns string — downstream casts are the engine's job, same as the
  * CSV path). Fact-scale data must arrive as Parquet/CSV; this connector
  * deliberately does not pretend to scale.
  */
object Excel {

  /** OLE2 compound-file magic — the container of legacy BIFF `.xls`. */
  private val Ole2Magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)

  /** Container sniff: the reference's `pd.read_excel` (:491, :515) accepts
    * both OOXML `.xlsx` (ZIP) and legacy BIFF `.xls` (OLE2); so do we —
    * OLE2 dispatches to the [[Biff]] reader, everything else takes the ZIP
    * path. Detection is by MAGIC, not extension, like pandas.
    */
  private def isOle2(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    // readNBytes loops until 8 bytes or EOF — a short first read (NFS/FUSE)
    // must not misroute the container
    val head = try in.readNBytes(8) finally in.close()
    head.length == 8 && java.util.Arrays.equals(head, Ole2Magic)
  }

  /** Header row only — schema inference without materializing the sheet
    * (the DOM parse itself is unavoidable with the JDK parser, but the
    * row→Seq conversion stops after row 1).
    */
  def readHeader(path: String): Seq[String] =
    if (isOle2(path)) Biff.readHeader(path)
    else readRows(path, maxRows = 1).headOption.getOrElse(Seq.empty)

  /** Parses the first worksheet into (header, rows) of strings — `.xlsx`
    * or BIFF8 `.xls`, sniffed by magic.
    */
  def readSheet(path: String): (Seq[String], Seq[Seq[String]]) =
    if (isOle2(path)) Biff.readSheet(path)
    else {
      val rows = readRows(path, maxRows = Int.MaxValue)
      (rows.headOption.getOrElse(Seq.empty), rows.drop(1))
    }

  private def readRows(path: String, maxRows: Int): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(false)
      def parse(name: String): Option[org.w3c.dom.Document] =
        Option(zip.getEntry(name)).map(e => dbf.newDocumentBuilder().parse(zip.getInputStream(e)))

      // shared strings table (cell t="s" values are indexes into it)
      val shared: IndexedSeq[String] = parse("xl/sharedStrings.xml").map { d =>
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }.getOrElse(IndexedSeq.empty)

      val sheet = parse("xl/worksheets/sheet1.xml")
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      val rowNodes = sheet.getElementsByTagName("row")

      def colIndex(ref: String): Int = {
        val letters = ref.takeWhile(_.isLetter)
        letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
      }

      val rows = (0 until math.min(rowNodes.getLength, maxRows)).map { r =>
        val cells = rowNodes.item(r).asInstanceOf[Element].getElementsByTagName("c")
        val byCol = mutable.SortedMap.empty[Int, String]
        (0 until cells.getLength).foreach { ci =>
          val c = cells.item(ci).asInstanceOf[Element]
          val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
            .map(colIndex).getOrElse(ci)
          val t = c.getAttribute("t")
          val vNode = c.getElementsByTagName("v")
          val isNode = c.getElementsByTagName("is")
          val raw =
            if (t == "inlineStr" && isNode.getLength > 0) isNode.item(0).getTextContent
            else if (vNode.getLength > 0) vNode.item(0).getTextContent
            else ""
          val value = if (t == "s") shared(raw.toInt) else raw
          byCol(idx) = value
        }
        val width = if (byCol.isEmpty) 0 else byCol.lastKey + 1
        (0 until width).map(i => byCol.getOrElse(i, "")): Seq[String]
      }
      rows
    } finally zip.close()
  }

  /** XLSX → DataFrame, all string columns, header from row 1. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readSheet(path)
    val schema = StructType(header.map(h => StructField(h, StringType)))
    val data = rows.map { r =>
      Row.fromSeq(header.indices.map(i => if (i < r.length) r(i) else null))
    }
    spark.createDataFrame(data.asJava, schema)
  }

  /** Excel-backed FileFeed read: same canonical (sku, qty, site) contract
    * and sentinel fallback as Feeds.read. A legacy-.xls rejection is NOT
    * mapped to the sentinel — a format mismatch must surface, only a
    * genuinely absent/broken feed degrades to the reference's 1-row marker.
    */
  def readFeed(spark: SparkSession, feed: FileFeed): DataFrame =
    try {
      val base = read(spark, feed.path)
      val renamed = feed.renames.foldLeft(base) { case (df, (from, to)) =>
        if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
      }
      import org.apache.spark.sql.functions._
      val withSite = (feed.siteColumn, feed.siteLiteral) match {
        case (Some(c), _) if renamed.columns.contains(c) => renamed.withColumn("site", col(c))
        case (_, Some(s)) => renamed.withColumn("site", lit(s))
        case _ => renamed.withColumn("site", lit(null).cast("string"))
      }
      withSite.select(col("sku").cast("string").as("sku"),
        col("qty").try_cast("double").as("qty"),
        col("site").cast("string").as("site"))
    } catch {
      case e: UnsupportedOperationException => throw e
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft.Excel] feed ${feed.path} unreadable (${e.getClass.getSimpleName}: ${e.getMessage}); substituting sentinel row")
        Feeds.sentinel(spark, feed)
    }
}
