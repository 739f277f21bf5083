package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG/AVI: container walk (nested LISTs, header fields, frame
  * chunks, word alignment), per-frame decode equality against the JPEG
  * closed form, and malformed-input rejection.
  */
class VideoSpec extends AnyFunSuite {

  test("AVI walk: header fields, frame extraction, byte-exact frames") {
    for (id <- 0L to 10L) {
      val avi = Video.parseAvi(Video.synthMjpegPayload(id))
        .getOrElse(fail(s"AVI parse failed for id=$id"))
      assert(avi.declaredFrames == 4)
      assert(avi.width == 16 && avi.height == 16)
      assert(avi.frames.length == 4)
      for (f <- 0 until 4)
        assert(avi.frames(f).toSeq == Jpeg.synthJpegPayload(4 * id + f).toSeq,
          s"id=$id frame $f bytes differ")
    }
  }

  test("frame chunks with odd byte lengths exercise word alignment") {
    // huffman streams have arbitrary parity; across a few videos both
    // parities must occur, or the padding path would go untested
    val lengths = (0L to 10L).flatMap(id =>
      Video.parseAvi(Video.synthMjpegPayload(id)).get.frames.map(_.length))
    assert(lengths.exists(_ % 2 == 1), "no odd-length frame in the corpus")
    assert(lengths.exists(_ % 2 == 0), "no even-length frame in the corpus")
  }

  test("mjpegStats: per-frame sums equal the JPEG closed form") {
    val spark = graft.SparkTestSession.spark
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = (0L to 11L).toDF("doc_id")
    val got = Video.mjpegStats(docs).collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 11L) {
      val frameSums = (0 until 4).map { f =>
        val img = Jpeg.decode(Jpeg.synthJpegPayload(4 * id + f)).get
        img.pixels.map(b => (b & 0xff).toLong).sum
      }
      val r = got(id)
      assert(r.getInt(1) == 4 && r.getInt(2) == 4) // decoded == declared
      assert(r.getInt(3) == 16 && r.getInt(4) == 16)
      for (f <- 0 until 4)
        assert(r.getLong(5 + f) == frameSums(f), s"id=$id frame $f sum")
      assert(r.getLong(9) == frameSums.sum)
    }
  }

  test("malformed and partial containers degrade, never throw") {
    val good = Video.synthMjpegPayload(5L)
    assert(Video.parseAvi("RIFFxxxxWAVE".getBytes ++ good.drop(12)).isEmpty)
    assert(Video.parseAvi(good.take(20)).isEmpty)
    // truncated mid-movi: chunk size exceeds the buffer -> None
    assert(Video.parseAvi(good.take(good.length / 2)).isEmpty)
    // a corrupted frame is SKIPPED by the decode loop, not fatal: zero
    // out one frame's SOI so Jpeg.decode rejects it
    val avi = Video.parseAvi(good).get
    val broken = good.clone()
    // find the second frame chunk's body and break its SOI marker
    val f0 = Jpeg.synthJpegPayload(20L)
    var off = -1
    var i = 0
    while (off < 0 && i + f0.length <= broken.length) {
      if (broken.slice(i, i + f0.length).toSeq == f0.toSeq) off = i
      i += 1
    }
    assert(off > 0, "frame 0 bytes not found in container")
    broken(off) = 0
    // parseAvi still returns 4 frames; decode drops exactly the broken one
    val parsed = Video.parseAvi(broken).get
    assert(parsed.frames.length == 4)
    val decoded = parsed.frames.flatMap(Jpeg.decode)
    assert(decoded.length == 3)
    assert(avi.frames.length == 4)
  }
}
