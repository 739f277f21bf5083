package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** EXIF/TIFF walk: hand-built byte-literal structures (independent of
  * the synth writer), both byte orders, synth round trips, and
  * malformed rejection.
  */
class ExifSpec extends AnyFunSuite {

  test("hand-built little-endian EXIF parses field by field") {
    // minimal TIFF: II, 42, IFD0@8 with Orientation=6 (SHORT) and an
    // Exif pointer to a sub-IFD holding ISO=400 — every byte written
    // out longhand so the test cannot share a bug with the synth writer
    val tiff = Array[Int](
      'I', 'I', 42, 0, 8, 0, 0, 0, // header, IFD0 at 8
      2, 0, // 2 entries
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0, // Orientation SHORT 6
      0x69, 0x87, 4, 0, 1, 0, 0, 0, 38, 0, 0, 0, // ExifIFD -> 38
      0, 0, 0, 0, // next IFD
      1, 0, // sub-IFD: 1 entry
      0x27, 0x88, 3, 0, 1, 0, 0, 0, 0x90, 0x01, 0, 0, // ISO SHORT 400
      0, 0, 0, 0).map(_.toByte)
    val jpeg = Array[Int](0xff, 0xd8, 0xff, 0xe1).map(_.toByte) ++
      Array[Int]((2 + 6 + tiff.length) >> 8, (2 + 6 + tiff.length) & 0xff)
        .map(_.toByte) ++
      "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff ++
      Array[Int](0xff, 0xd9).map(_.toByte)
    val e = Exif.parseExif(jpeg).getOrElse(fail("hand-built EXIF rejected"))
    assert(!e.endianBig)
    assert(e.orientation == 6)
    assert(e.iso == 400)
    assert(e.width == 0 && e.height == 0) // absent tags default 0
  }

  test("synthetic corpus round-trips every field in both byte orders") {
    for (id <- 0L to 30L) {
      val e = Exif.parseExif(Exif.synthExifPayload(id))
        .getOrElse(fail(s"parse failed for id=$id"))
      assert(e.endianBig == (id % 2 != 0), s"id=$id endianness")
      assert(e.orientation == (id % 8) + 1)
      assert(e.width == 640 + (id * 7) % 3200)
      assert(e.height == 480 + (id * 11) % 2400)
      assert(e.pixelX == e.width - (id % 16))
      assert(e.iso == 100 << (id % 7).toInt)
    }
  }

  test("malformed EXIF degrades to None") {
    val good = Exif.synthExifPayload(4L)
    assert(Exif.parseExif(good.take(10)).isEmpty) // truncated in APP1
    val noExif = good.clone(); noExif(6) = 'X' // break the "Exif" marker
    assert(Exif.parseExif(noExif).isEmpty)
    val badMagic = good.clone(); badMagic(14) = 43 // TIFF magic != 42 (II)
    assert(Exif.parseExif(badMagic).isEmpty)
    val badOrder = good.clone(); badOrder(12) = 'X' // neither II nor MM
    assert(Exif.parseExif(badOrder).isEmpty)
    // IFD offset pointing past the buffer
    val badOff = good.clone(); badOff(17) = 0x7f // II: high byte of offset
    assert(Exif.parseExif(badOff).isEmpty)
    // a plain JFIF stream (no APP1) is None, not an error
    assert(Exif.parseExif(Jpeg.synthJpegPayload(2L)).isEmpty)
  }
}
