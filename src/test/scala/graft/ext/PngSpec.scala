package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** The generalized PNG decoder: exact synthetic round trips per variant
  * (Adam7, palette, 16-bit, all five filters), EXACT cross-checks
  * against ImageIO-written files (PNG is lossless — no slop), and
  * malformed-input rejection.
  */
class PngSpec extends AnyFunSuite {

  private def expectedBytes(id: Long): Array[Int] = {
    (((id % 4) + 4) % 4).toInt match {
      case 0 =>
        Array.tabulate(21 * 13 * 3)(k =>
          Png.rgbSample(id, (k / 3) % 21, (k / 3) / 21, k % 3, 21))
      case 1 =>
        Array.tabulate(16 * 16 * 3) { k =>
          val idx = Png.palIndex(id, (k / 3) % 16, (k / 3) / 16, 16)
          Png.palEntry(id, idx, k % 3)
        }
      case 2 =>
        Array.tabulate(12 * 9 * 2) { k =>
          val v = Png.gray16(id, (k / 2) % 12, (k / 2) / 12, 12)
          if (k % 2 == 0) v >> 8 else v & 0xff
        }
      case _ =>
        Array.tabulate(3 * 3 * 3) { k =>
          val idx = Png.palIndex(id, (k / 3) % 3, (k / 3) / 3, 3)
          Png.palEntry(id, idx, k % 3)
        }
    }
  }

  test("synthetic corpus decodes exactly: Adam7 / palette / 16-bit / tiny interlaced palette") {
    for (id <- 0L to 23L) { // 6 full variant cycles
      val img = Png.decodeFull(Png.synthPngFullPayload(id))
        .getOrElse(fail(s"decode failed for id=$id (variant ${id % 4})"))
      val exp = expectedBytes(id)
      assert(img.pixels.length == exp.length, s"id=$id length")
      var k = 0
      while (k < exp.length) {
        assert((img.pixels(k) & 0xff) == exp(k),
          s"id=$id (variant ${id % 4}) byte $k: " +
            s"got ${img.pixels(k) & 0xff}, want ${exp(k)}")
        k += 1
      }
    }
  }

  private def writePng(img: BufferedImage, interlaced: Boolean): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("png").next()
    val p = w.getDefaultWriteParam
    if (interlaced) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("foreign encoder: ImageIO Adam7-interlaced truecolor decodes EXACTLY") {
    val rnd = new scala.util.Random(31)
    val src = new BufferedImage(23, 17, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 17; x <- 0 until 23)
      src.setRGB(x, y, rnd.nextInt(1 << 24))
    val bytes = writePng(src, interlaced = true)
    assert((bytes(28) & 0xff) == 1, "writer did not interlace") // IHDR interlace byte
    val mine = Png.decodeFull(bytes)
      .getOrElse(fail("decoder rejected ImageIO's interlaced PNG"))
    assert(mine.width == 23 && mine.height == 17 && mine.channels == 3)
    for (y <- 0 until 17; x <- 0 until 23) {
      val rgb = src.getRGB(x, y)
      val o = (y * 23 + x) * 3
      assert((mine.pixels(o) & 0xff) == ((rgb >> 16) & 0xff), s"r @($x,$y)")
      assert((mine.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff), s"g @($x,$y)")
      assert((mine.pixels(o + 2) & 0xff) == (rgb & 0xff), s"b @($x,$y)")
    }
  }

  test("foreign encoder: ImageIO indexed-color PNG resolves through PLTE exactly") {
    val src = new BufferedImage(9, 7, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 7; x <- 0 until 9)
      src.setRGB(x, y, ((x * 37) << 16) | ((y * 41) << 8) | (x * 7 + y * 11))
    val bytes = writePng(src, interlaced = false)
    val mine = Png.decodeFull(bytes)
      .getOrElse(fail("decoder rejected ImageIO's indexed PNG"))
    assert(mine.channels == 3 && mine.bitDepth == 8)
    for (y <- 0 until 7; x <- 0 until 9) {
      val rgb = src.getRGB(x, y) // what the palette quantized to
      val o = (y * 9 + x) * 3
      assert((mine.pixels(o) & 0xff) == ((rgb >> 16) & 0xff), s"@($x,$y)")
      assert((mine.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff), s"@($x,$y)")
      assert((mine.pixels(o + 2) & 0xff) == (rgb & 0xff), s"@($x,$y)")
    }
  }

  test("foreign encoder: ImageIO 16-bit grayscale keeps big-endian sample pairs") {
    val src = new BufferedImage(8, 6, BufferedImage.TYPE_USHORT_GRAY)
    val raster = src.getRaster
    for (y <- 0 until 6; x <- 0 until 8)
      raster.setSample(x, y, 0, (x * 8191 + y * 10007) % 65536)
    val bytes = writePng(src, interlaced = false)
    val mine = Png.decodeFull(bytes)
      .getOrElse(fail("decoder rejected ImageIO's 16-bit PNG"))
    assert(mine.bitDepth == 16 && mine.channels == 1)
    for (y <- 0 until 6; x <- 0 until 8) {
      val v = raster.getSample(x, y, 0)
      val o = (y * 8 + x) * 2
      assert(((mine.pixels(o) & 0xff) << 8 | (mine.pixels(o + 1) & 0xff)) == v,
        s"@($x,$y)")
    }
  }

  test("malformed inputs degrade to None") {
    val good = Png.synthPngFullPayload(1L) // palette variant
    assert(Png.decodeFull(good.take(40)).isEmpty) // truncated
    val badCrc = good.clone()
    badCrc(badCrc.length - 10) = (badCrc(badCrc.length - 10) ^ 0x55).toByte
    // flipping a byte near the end corrupts IDAT payload or its CRC —
    // either way the decode must fail cleanly
    assert(Png.decodeFull(badCrc).isEmpty)
    val noSig = good.clone(); noSig(0) = 0
    assert(Png.decodeFull(noSig).isEmpty)
    // interlace flag flipped without re-encoding: the IHDR CRC no
    // longer matches -> None, not a scrambled image
    val ihdrFlip = good.clone()
    ihdrFlip(28) = 1
    assert(Png.decodeFull(ihdrFlip).isEmpty)
  }
}
