package graft.extract

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Hand-rolled legacy `.xls` generator for the BIFF reader specs: a
  * minimal OLE2/CFB container around a BIFF8 `Workbook` stream. Two
  * container layouts so BOTH reader paths are exercised:
  *   - `mini = false`: stream padded past the 4096-byte cutoff → regular
  *     FAT sectors;
  *   - `mini = true`: small stream in 64-byte mini sectors chained by the
  *     miniFAT inside the root entry's storage (the layout real small
  *     mapping files use).
  * Strings are written via SST/LABELSST (compressed Latin-1 by default,
  * UTF-16LE when any char needs it); numbers as NUMBER records.
  */
object XlsFixture {

  private def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  private def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
    val b = le(4 + payload.length)
    b.putShort(id.toShort).putShort(payload.length.toShort).put(payload)
    b.array()
  }

  private def bof(dt: Int): Array[Byte] = {
    val p = le(16)
    p.putShort(0x0600.toShort).putShort(dt.toShort) // BIFF8, substream type
    p.putShort(0).putShort(0).putInt(0).putInt(0)
    rec(0x0809, p.array())
  }

  private val eof = rec(0x000A, Array.empty)

  private def sstString(s: String): Array[Byte] = {
    val high = s.exists(_ > 0xff)
    val chars =
      if (high) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val b = le(3 + chars.length)
    b.putShort(s.length.toShort).put((if (high) 1 else 0).toByte).put(chars)
    b.array()
  }

  /** BIFF8 Workbook stream for one sheet of cells. */
  private def workbook(cells: Seq[Seq[Either[String, Double]]]): Array[Byte] = {
    val strings = cells.flatten.collect { case Left(s) => s }.distinct
    val sIdx = strings.zipWithIndex.toMap

    val sheetRecs = cells.zipWithIndex.flatMap { case (row, r) =>
      row.zipWithIndex.map {
        case (Left(s), c) =>
          val p = le(10)
          p.putShort(r.toShort).putShort(c.toShort).putShort(0).putInt(sIdx(s))
          rec(0x00FD, p.array()) // LABELSST
        case (Right(d), c) =>
          val p = le(14)
          p.putShort(r.toShort).putShort(c.toShort).putShort(0).putDouble(d)
          rec(0x0203, p.array()) // NUMBER
      }
    }
    val sheet = bof(0x0010) ++ sheetRecs.flatten ++ eof

    val sstPayload = {
      val total = cells.flatten.count(_.isLeft)
      le(8).putInt(total).putInt(strings.size).array() ++
        strings.flatMap(sstString)
    }
    def boundsheet(offset: Int): Array[Byte] = {
      val name = "Sheet1".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val p = le(8 + name.length)
      p.putInt(offset).putShort(0).put(name.length.toByte).put(0.toByte).put(name)
      rec(0x0085, p.array())
    }
    // globals length is invariant to the boundsheet offset value → assemble
    // once with a placeholder to measure, then patch the real offset
    val globalsFor = (off: Int) =>
      bof(0x0005) ++ boundsheet(off) ++ rec(0x00FC, sstPayload) ++ eof
    val globals = globalsFor(globalsFor(0).length)
    globals ++ sheet
  }

  // ------------------------------------------------------------- CFB writer

  private val Magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)
  private val End = -2 // ENDOFCHAIN
  private val FatSect = -3

  private def dirEntry(name: String, objType: Int, start: Int, size: Int): Array[Byte] = {
    val b = le(128)
    val n = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    b.put(n)
    b.putShort(64, (n.length + 2).toShort)
    b.put(66, objType.toByte)
    b.put(67, 1.toByte) // black
    b.putInt(68, -1).putInt(72, -1)
    b.putInt(76, if (objType == 5) 1 else -1) // root's child = entry 1
    b.putInt(116, start)
    b.putInt(120, size)
    b.array()
  }

  private def pad(a: Array[Byte], unit: Int): Array[Byte] =
    a ++ new Array[Byte]((unit - a.length % unit) % unit)

  private def header(nFat: Int, dirStart: Int, miniFatStart: Int, nMiniFat: Int,
                     fatSectors: Seq[Int]): Array[Byte] = {
    val b = le(512)
    b.put(Magic)
    b.putShort(24, 0x003E.toShort).putShort(26, 0x0003.toShort) // minor/major
    b.putShort(28, 0xFFFE.toShort) // little-endian
    b.putShort(30, 9.toShort).putShort(32, 6.toShort) // 512 / 64
    b.putInt(44, nFat).putInt(48, dirStart)
    b.putInt(56, 4096) // mini cutoff
    b.putInt(60, miniFatStart).putInt(64, nMiniFat)
    b.putInt(68, End).putInt(72, 0) // no DIFAT overflow
    (0 until 109).foreach(i => b.putInt(76 + i * 4, if (i < fatSectors.size) fatSectors(i) else -1))
    b.array()
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    val b = le(512)
    (0 until 128).foreach(i => b.putInt(i * 4, if (i < entries.size) entries(i) else -1))
    b.array()
  }

  /** Writes the workbook as a `.xls`; `mini` picks the container layout;
    * `streamName` defaults to BIFF8's `Workbook` (pass `Book` to fabricate
    * a BIFF5-shaped container for the rejection spec).
    */
  def writeXls(cells: Seq[Seq[Either[String, Double]]], mini: Boolean = false,
               streamName: String = "Workbook"): String = {
    val path = Files.createTempDirectory("xls").resolve("book.xls").toString
    val wbRaw = workbook(cells)
    val out: Array[Byte] =
      if (!mini) {
        // pad past the cutoff → regular FAT stream (trailing zeros are never
        // parsed: the sheet substream ends at its EOF record)
        val wb = pad(if (wbRaw.length < 4096) wbRaw ++ new Array[Byte](4096 - wbRaw.length) else wbRaw, 512)
        val nStream = wb.length / 512
        // sectors: 0=FAT, 1=directory, 2.. = stream
        val chain = (0 until nStream).map(i => if (i == nStream - 1) End else 3 + i)
        val fat = fatSector(Seq(FatSect, End) ++ chain)
        val dir = pad(dirEntry("Root Entry", 5, End, 0) ++
          dirEntry(streamName, 2, 2, wb.length), 512)
        header(1, 1, End, 0, Seq(0)) ++ fat ++ dir ++ wb
      } else {
        require(wbRaw.length < 4096, "mini fixture must stay under the cutoff")
        val wb = pad(wbRaw, 64)
        val nMini = wb.length / 64
        val container = pad(wb, 512)
        val nCont = container.length / 512
        // sectors: 0=FAT, 1=directory, 2=miniFAT, 3.. = mini-stream container
        val contChain = (0 until nCont).map(i => if (i == nCont - 1) End else 4 + i)
        val fat = fatSector(Seq(FatSect, End, End) ++ contChain)
        val miniFat = fatSector((0 until nMini).map(i => if (i == nMini - 1) End else i + 1))
        val dir = pad(dirEntry("Root Entry", 5, 3, container.length) ++
          dirEntry(streamName, 2, 0, wbRaw.length), 512)
        header(1, 1, 2, 1, Seq(0)) ++ fat ++ dir ++ miniFat ++ container
      }
    Files.write(java.nio.file.Paths.get(path), out)
    path
  }
}
