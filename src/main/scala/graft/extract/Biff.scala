package graft.extract

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal legacy-`.xls` reader: OLE2/CFB compound container + BIFF8
  * records — the second container `pd.read_excel` accepts (reference
  * portfolio-etl.py:491, :515), closing the one format gap the OOXML
  * reader left. Same contract as [[Excel.readSheet]]: first worksheet,
  * first row = header, every cell rendered as a string. Numbers render via
  * `Double.toString` ("4.0"), which matches the raw `<v>` text of the
  * COMMITTED xlsx fixtures (they also write "4.0") — real Excel-written
  * .xlsx stores integral numbers as "4", so the same sheet saved both ways
  * by Excel can stringify differently; downstream try_cast absorbs either.
  *
  * Scope (documented, erroring elsewhere): BIFF8 only (Excel 97+ —
  * BIFF5's `Book` stream is rejected with an actionable message), cell
  * records LABELSST / NUMBER / RK / MULRK / LABEL / BOOLERR / FORMULA
  * (cached numeric or STRING result), SST with CONTINUE spill. No number
  * formats (dates surface as their serial numbers) and no formula
  * re-evaluation — the sanctioned inputs are small mapping files, and
  * downstream casts are the engine's job, as with CSV.
  *
  * Container coverage: regular-FAT streams AND the mini stream (streams
  * under the header's cutoff, the layout real small mapping files use),
  * plus DIFAT overflow chains for completeness.
  */
object Biff {

  /** (header, data rows) of the first worksheet. */
  def readSheet(path: String): (Seq[String], Seq[Seq[String]]) = {
    val wb = workbookStream(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)
    val rows = parseWorkbook(wb, path)
    (rows.headOption.getOrElse(Seq.empty), rows.drop(1))
  }

  /** Header row only — schema inference stops scanning cell records at the
    * first row-1 cell (BIFF cell records are row-major), so planning does
    * not materialize the sheet. The SST still parses (row-0 labels index
    * into it).
    */
  def readHeader(path: String): Seq[String] = {
    val wb = workbookStream(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)
    parseWorkbook(wb, path, maxRow = 0).headOption.getOrElse(Seq.empty)
  }

  // ------------------------------------------------------------ OLE2 / CFB

  private def le(b: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)

  private val FreeSect = -1 // 0xFFFFFFFF
  private val EndOfChain = -2 // 0xFFFFFFFE

  /** Extracts the `Workbook` stream bytes from a CFB container. */
  private[extract] def workbookStream(bytes: Array[Byte], path: String): Array[Byte] = {
    val buf = le(bytes)
    require(bytes.length >= 512, s"$path: truncated OLE2 container")
    val sectorSize = 1 << buf.getShort(30)
    val miniSize = 1 << buf.getShort(32)
    val dirStart = buf.getInt(48)
    val cutoff = buf.getInt(56)
    val miniFatStart = buf.getInt(60)
    val nDifat = buf.getInt(72)

    def sector(n: Int): Array[Byte] = {
      val off = (n + 1) * sectorSize
      require(off + sectorSize <= bytes.length, s"$path: sector $n out of range")
      java.util.Arrays.copyOfRange(bytes, off, off + sectorSize)
    }
    def ints(b: Array[Byte]): Seq[Int] = {
      val ib = le(b); (0 until b.length / 4).map(i => ib.getInt(i * 4))
    }

    // FAT sector list: 109 header DIFAT entries + overflow DIFAT chain
    val difatHead = (0 until 109).map(i => buf.getInt(76 + i * 4)).filter(_ >= 0)
    val difatExtra = mutable.ArrayBuffer.empty[Int]
    var dsec = buf.getInt(68)
    var guard = 0
    while (dsec >= 0 && guard < nDifat + 1) {
      val s = ints(sector(dsec))
      difatExtra ++= s.dropRight(1).filter(_ >= 0)
      dsec = s.last
      guard += 1
    }
    val fat: IndexedSeq[Int] =
      (difatHead ++ difatExtra).flatMap(s => ints(sector(s))).toIndexedSeq

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start
      while (s >= 0) {
        require(out.size <= fat.size, s"$path: cyclic FAT chain")
        out += s; s = fat(s)
      }
      out.toSeq
    }
    def streamBytes(start: Int, size: Long): Array[Byte] =
      chain(start).flatMap(sector).take(size.toInt).toArray

    // directory entries (128 bytes each) from the directory chain
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val dirBytes = chain(dirStart).flatMap(sector).toArray
    val entries = (0 until dirBytes.length / 128).map { i =>
      val eb = le(java.util.Arrays.copyOfRange(dirBytes, i * 128, i * 128 + 128))
      val nameLen = eb.getShort(64)
      val name =
        if (nameLen >= 2)
          new String(dirBytes, i * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      // size is the LOW dword only: [MS-CFB] v3 writers may leave garbage
      // in the high 4 bytes of the 8-byte field — reading getLong here
      // misroutes mini-stream workbooks past the cutoff on real old files
      Entry(name, dirBytes(i * 128 + 66) & 0xff, eb.getInt(116),
        eb.getInt(120).toLong & 0xFFFFFFFFL)
    }

    val root = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException(s"$path: OLE2 container has no root entry"))
    val wb = entries.find(e => e.objType == 2 && e.name == "Workbook").getOrElse {
      if (entries.exists(e => e.objType == 2 && e.name == "Book"))
        throw new UnsupportedOperationException(
          s"$path contains a BIFF5 'Book' stream (Excel 5.0/95); only BIFF8 (Excel 97+) " +
            ".xls is supported — re-save the workbook")
      else
        throw new IllegalArgumentException(s"$path: no Workbook stream in OLE2 container")
    }

    if (wb.size >= cutoff) streamBytes(wb.start, wb.size)
    else {
      // mini stream: the root entry's stream holds 64-byte mini sectors,
      // chained by the miniFAT
      val container = streamBytes(root.start, root.size)
      val miniFat: IndexedSeq[Int] =
        if (miniFatStart < 0) IndexedSeq.empty
        else chain(miniFatStart).flatMap(sector).grouped(4)
          .map(g => le(g.toArray).getInt(0)).toIndexedSeq
      val out = mutable.ArrayBuffer.empty[Byte]
      var s = wb.start
      var guard = 0
      while (s >= 0 && out.size < wb.size) {
        require(guard <= miniFat.size, s"$path: cyclic miniFAT chain")
        out ++= container.slice(s * miniSize, (s + 1) * miniSize)
        s = if (s < miniFat.size) miniFat(s) else EndOfChain
        guard += 1
      }
      out.take(wb.size.toInt).toArray
    }
  }

  // ---------------------------------------------------------- BIFF8 records

  private final case class Rec(id: Int, at: Int, data: Array[Byte])

  private def records(wb: Array[Byte], from: Int): Iterator[Rec] = new Iterator[Rec] {
    private var pos = from
    def hasNext: Boolean = pos + 4 <= wb.length
    def next(): Rec = {
      val b = le(wb)
      val id = b.getShort(pos) & 0xffff
      val len = b.getShort(pos + 2) & 0xffff
      // copyOfRange zero-pads past the array end, which would silently turn a
      // clipped NUMBER record into 0.0 — fail like every other malformed path
      require(pos + 4 + len <= wb.length, s"truncated BIFF record at $pos")
      val r = Rec(id, pos, java.util.Arrays.copyOfRange(wb, pos + 4, pos + 4 + len))
      pos += 4 + len
      r
    }
  }

  /** Cursor over an SST record plus its CONTINUE spills: strings may break
    * at a segment boundary, where a fresh flags byte restates the
    * character width for the remainder.
    */
  private final class SegCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def seg = segs(si)
    private def avail = seg.length - off
    private def ensure(): Unit = { // advance past exhausted segments
      while (avail == 0 && si + 1 < segs.size) { si += 1; off = 0 }
      require(avail > 0, "SST data exhausted mid-structure")
    }
    def u8(): Int = { ensure(); val v = seg(off) & 0xff; off += 1; v }
    def u16(): Int = { val v = u8(); v | (u8() << 8) }
    def i32(): Int = { u16() | (u16() << 16) }
    def skip(n: Int): Unit = { // non-character data continues with no flag byte
      var left = n
      while (left > 0) { ensure(); val t = math.min(left, avail); off += t; left -= t }
    }
    /** cch chars, `high` = 2-byte UTF-16LE. Per MS-XLS, character data
      * that continues into the next CONTINUE segment starts with a fresh
      * width-flag byte and splits only on character boundaries.
      */
    def chars(cch: Int, highFirst: Boolean): String = {
      val sb = new StringBuilder
      var left = cch
      var high = highFirst
      while (left > 0) {
        if (avail == 0) {
          require(si + 1 < segs.size, "SST data exhausted mid-string")
          si += 1; off = 0
          high = (u8() & 1) == 1 // continued character data restates width
        }
        val width = if (high) 2 else 1
        require(avail >= width, "SST string split mid-character")
        val n = math.min(left, avail / width)
        sb ++= (
          if (high) new String(seg, off, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else new String(seg, off, n, java.nio.charset.StandardCharsets.ISO_8859_1))
        off += n * width; left -= n
      }
      sb.toString
    }
  }

  /** XLUnicodeRichExtendedString at the cursor. */
  private def readSstString(c: SegCursor): String = {
    val cch = c.u16()
    val flags = c.u8()
    val fHigh = (flags & 1) == 1
    val fExt = (flags & 4) == 4
    val fRich = (flags & 8) == 8
    val cRun = if (fRich) c.u16() else 0
    val cbExt = if (fExt) c.i32() else 0
    val s = c.chars(cch, fHigh)
    c.skip(cRun * 4 + cbExt)
    s
  }

  /** Canonical string for a numeric cell — Double.toString ("4.0"),
    * matching the XLSX path's raw `<v>` text for the committed fixtures;
    * downstream try_cast handles the rest, as with CSV.
    */
  private def num(d: Double): String = d.toString

  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) == 1
    val isInt = (rk & 2) == 2
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  private val CellRecordIds = Set(0x00FD, 0x0203, 0x027E, 0x00BD, 0x0204, 0x0205, 0x0006)

  private[extract] def parseWorkbook(wb: Array[Byte], path: String,
                                     maxRow: Int = Int.MaxValue): Seq[Seq[String]] = {
    // pass 1 — workbook globals: SST (+CONTINUEs) and first BOUNDSHEET
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var sheetOffset = -1
    val it = records(wb, 0).buffered
    var depth = 0
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.id match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x0085 => // BOUNDSHEET
          if (sheetOffset < 0) sheetOffset = le(r.data).getInt(0)
        case 0x00FC => // SST
          val segs = mutable.ArrayBuffer(r.data)
          while (it.hasNext && it.head.id == 0x003C) segs += it.next().data
          val c = new SegCursor(segs.toIndexedSeq)
          c.skip(8) // total + unique counts
          val unique = le(r.data).getInt(4)
          sst = (0 until unique).map(_ => readSstString(c))
        case _ => ()
      }
    }
    require(sheetOffset >= 0, s"$path: no BOUNDSHEET in workbook globals")

    // pass 2 — first sheet substream: cell records until its EOF
    val cells = mutable.SortedMap.empty[(Int, Int), String]
    def put(row: Int, col: Int, v: String): Unit = cells((row, col)) = v
    val sheetIt = records(wb, sheetOffset).buffered
    var sdepth = 0
    var sdone = false
    while (sheetIt.hasNext && !sdone) {
      val r = sheetIt.next()
      val d = le(r.data)
      if (maxRow != Int.MaxValue && CellRecordIds(r.id)
          && (d.getShort(0) & 0xffff) > maxRow) {
        sdone = true // cell records are row-major: past maxRow, stop scanning
      } else r.id match {
        case 0x0809 => sdepth += 1
        case 0x000A => sdepth -= 1; if (sdepth <= 0) sdone = true
        case 0x00FD => // LABELSST
          val idx = d.getInt(6)
          require(idx >= 0 && idx < sst.size, s"$path: SST index $idx out of range")
          put(d.getShort(0) & 0xffff, d.getShort(2) & 0xffff, sst(idx))
        case 0x0203 => // NUMBER
          put(d.getShort(0) & 0xffff, d.getShort(2) & 0xffff, num(d.getDouble(6)))
        case 0x027E => // RK
          put(d.getShort(0) & 0xffff, d.getShort(2) & 0xffff, num(rkValue(d.getInt(6))))
        case 0x00BD => // MULRK: row, colFirst, n×(ixfe+rk), colLast
          val row = d.getShort(0) & 0xffff
          val colFirst = d.getShort(2) & 0xffff
          val n = (r.data.length - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i, num(rkValue(d.getInt(4 + i * 6 + 2))))
          }
        case 0x0204 => // LABEL (inline string)
          val cch = d.getShort(6) & 0xffff
          val high = (r.data(8) & 1) == 1
          val s =
            if (high) new String(r.data, 9, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 9, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
          put(d.getShort(0) & 0xffff, d.getShort(2) & 0xffff, s)
        case 0x0205 => // BOOLERR
          val row = d.getShort(0) & 0xffff; val col = d.getShort(2) & 0xffff
          if ((r.data(7) & 0xff) == 0) // bool, not error
            put(row, col, if (r.data(6) != 0) "TRUE" else "FALSE")
        case 0x0006 => // FORMULA: cached double, or string in trailing STRING
          val row = d.getShort(0) & 0xffff; val col = d.getShort(2) & 0xffff
          val hi = d.getShort(12) & 0xffff
          if (hi != 0xffff) put(row, col, num(d.getDouble(6)))
          else if ((r.data(6) & 0xff) == 0) { // string result follows
            // STRING may be separated from FORMULA only by SHRFMLA/ARRAY/
            // TABLE companions ([MS-XLS]); skip ONLY those — consuming
            // arbitrary records here would silently drop cell data from a
            // nonconforming writer, so anything else ends the scan and the
            // formula cell is left empty instead
            val companions = Set(0x04BC, 0x0221, 0x0236)
            while (sheetIt.hasNext && companions(sheetIt.head.id))
              sheetIt.next()
            if (sheetIt.hasNext && sheetIt.head.id == 0x0207) {
              val sr = sheetIt.next()
              val cch = le(sr.data).getShort(0) & 0xffff
              val high = (sr.data(2) & 1) == 1
              val s =
                if (high) new String(sr.data, 3, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
                else new String(sr.data, 3, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
              put(row, col, s)
            }
          }
        case _ => ()
      }
    }

    if (cells.isEmpty) Seq.empty
    else {
      val maxRow = cells.keys.map(_._1).max
      (0 to maxRow).map { r =>
        val rowCells = cells.iteratorFrom((r, 0)).takeWhile(_._1._1 == r).toSeq
        val width = if (rowCells.isEmpty) 0 else rowCells.map(_._1._2).max + 1
        (0 until width).map(c => cells.getOrElse((r, c), ""))
      }
    }
  }
}
