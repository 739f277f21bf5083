package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** G.711 and IMA ADPCM decoders: published reference points of both
  * codecs, hand-replayed state transitions, exact synth round trips,
  * RIFF-walk edge cases, and malformed-input rejection.
  */
class AudioSpec extends AnyFunSuite {

  test("G.711 µ-law: published reference points") {
    // the four corners every G.711 table publishes
    assert(Audio.ulawToPcm(0x00) == -32124) // most negative
    assert(Audio.ulawToPcm(0x80) == 32124) // most positive
    assert(Audio.ulawToPcm(0x7f) == 0) // negative zero
    assert(Audio.ulawToPcm(0xff) == 0) // positive zero
    // segment boundary: code 0x7e is the smallest negative step (-8)
    assert(Audio.ulawToPcm(0x7e) == -8)
    assert(Audio.ulawToPcm(0xfe) == 8)
    // monotone within the negative half (decreasing code = larger magnitude)
    for (c <- 1 to 0x7f)
      assert(Audio.ulawToPcm(c) > Audio.ulawToPcm(c - 1),
        s"not monotone at code $c")
  }

  test("G.711 A-law: published reference points") {
    assert(Audio.alawToPcm(0x55) == -8) // minimal negative magnitude
    assert(Audio.alawToPcm(0xd5) == 8) // minimal positive magnitude
    assert(Audio.alawToPcm(0x2a) == -32256) // most negative
    assert(Audio.alawToPcm(0xaa) == 32256) // most positive
    // segment-1 boundary (seg 0 step 16 → seg 1 keeps step 16: the
    // A-law low end is linear through 0x108-biased segment 1)
    assert(Audio.alawToPcm(0x54) == -24) // seg 0, mant 1
    // every decoded value is even... in fact a multiple of 8 in seg ≥ 1;
    // seg 0 values are 8 + 16·m — all ≡ 8 mod 16
    for (c <- 0 to 255) {
      val v = math.abs(Audio.alawToPcm(c))
      assert(v >= 8 && v <= 32256)
    }
  }

  test("IMA ADPCM: hand-replayed transitions from the spec tables") {
    // pred=0, idx=0 (step 7), nibble 7: diff = 7>>3 + 7 + 7>>1 + 7>>2
    //  = 0 + 7 + 3 + 1 = 11; index += 8
    assert(Audio.adpcmStep(0, 0, 7) == ((11, 8)))
    // pred=11, idx=8 (step 16), nibble 15 (sign bit): diff = 2+16+8+4
    //  = 30 → pred 11-30 = -19; index 8+8 = 16
    assert(Audio.adpcmStep(11, 8, 15) == ((-19, 16)))
    // nibble 0: diff = step>>3 only; index decrements, clamped at 0
    assert(Audio.adpcmStep(100, 0, 0) == ((100, 0)))
    assert(Audio.adpcmStep(100, 1, 0) == ((101, 0))) // step 8 >> 3 = 1
    // predictor clamps to int16 both sides at the top step (32767)
    assert(Audio.adpcmStep(32767, 88, 7)._1 == 32767)
    assert(Audio.adpcmStep(-32768, 88, 15)._1 == -32768)
    // index clamps at 88
    assert(Audio.adpcmStep(0, 88, 7)._2 == 88)
  }

  test("synthetic G.711 corpus decodes to the per-byte closed form") {
    for (id <- 0L to 30L) {
      val (codec, pcm) = Audio.decodeG711(Audio.synthG711Payload(id))
        .getOrElse(fail(s"G.711 decode failed for id=$id"))
      assert(codec == (if (id % 2 == 0) "ulaw" else "alaw"))
      assert(pcm.length == 64)
      for (k <- 0 until 64) {
        val d = (((id * 7 + k * 13) % 256) + 256) % 256
        val exp = if (id % 2 == 0) Audio.ulawToPcm(d.toInt)
                  else Audio.alawToPcm(d.toInt)
        assert(pcm(k) == exp, s"id=$id k=$k")
      }
    }
  }

  test("synthetic ADPCM corpus: header sample, state replay, end state") {
    for (id <- 0L to 30L) {
      val (pcm, endPred, endIdx) =
        Audio.decodeImaAdpcm(Audio.synthAdpcmPayload(id))
          .getOrElse(fail(s"ADPCM decode failed for id=$id"))
      assert(pcm.length == 65)
      val p0 = ((id * 31) % 4096 + 4096) % 4096 - 2048
      assert(pcm(0) == p0, s"id=$id header sample")
      var pred = p0.toInt
      var idx = (((id % 89) + 89) % 89).toInt
      for (k <- 0 until 64) {
        val nib = ((((id * 11 + k * 5) % 16) + 16) % 16).toInt
        val (p2, i2) = Audio.adpcmStep(pred, idx, nib)
        pred = p2; idx = i2
        assert(pcm(k + 1) == pred, s"id=$id sample ${k + 1}")
      }
      assert(endPred == pred && endIdx == idx, s"id=$id end state")
    }
  }

  test("RIFF walk: fact chunk skipped, odd chunk sizes word-aligned, malformed rejected") {
    // the ADPCM synth interposes a fact chunk between fmt and data —
    // reaching data at all proves unknown-chunk skipping
    val good = Audio.synthAdpcmPayload(3L)
    assert(Audio.parseWav(good).exists(_.formatTag == 0x11))
    // an odd-sized unknown chunk must advance past its pad byte
    val base = Audio.synthG711Payload(2L)
    val withOdd = new Array[Byte](base.length + 12) // 8 hdr + 3 data + 1 pad
    System.arraycopy(base, 0, withOdd, 0, 36) // through fmt
    // unknown 3-byte chunk "junk" (padded to 4)
    withOdd(36) = 'j'; withOdd(37) = 'u'; withOdd(38) = 'n'; withOdd(39) = 'k'
    withOdd(40) = 3; withOdd(41) = 0; withOdd(42) = 0; withOdd(43) = 0
    withOdd(44) = 1; withOdd(45) = 2; withOdd(46) = 3; withOdd(47) = 0 // pad
    System.arraycopy(base, 36, withOdd, 48, base.length - 36)
    // fix the RIFF size field
    val riffSz = withOdd.length - 8
    for (i <- 0 until 4) withOdd(4 + i) = ((riffSz >> (8 * i)) & 0xff).toByte
    val parsed = Audio.parseWav(withOdd)
    assert(parsed.exists(w => w.formatTag == 7 && w.dataLen == 64),
      "odd-size chunk skip failed")
    assert(Audio.decodeG711(withOdd).exists(_._2.length == 64))
    // malformed: wrong magic, truncation, stereo, bad step index
    assert(Audio.parseWav("notariff".getBytes ++ base.drop(8)).isEmpty)
    assert(Audio.parseWav(base.take(30)).isEmpty)
    val stereo = Audio.synthG711Payload(0L).clone()
    stereo(22) = 2 // nChannels = 2
    assert(Audio.decodeG711(stereo).isEmpty)
    val badIdx = Audio.synthAdpcmPayload(0L).clone()
    badIdx(62) = 120.toByte // step index > 88 in the block header
    assert(Audio.decodeImaAdpcm(badIdx).isEmpty)
  }

  test("audioFeatures: energy / zero crossings / peak equal direct recomputation") {
    val spark = graft.SparkTestSession.spark
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = (0L to 19L).toDF("doc_id")
    val got = Audio.audioFeatures(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 19L) {
      val pcm = (0 until 64).map { k =>
        val d = ((((id * 7 + k * 13) % 256) + 256) % 256).toInt
        if (id % 2 == 0) Audio.ulawToPcm(d) else Audio.alawToPcm(d)
      }
      val r = got(id)
      assert(r.getInt(1) == 64)
      assert(r.getLong(2) == pcm.map(v => v.toLong * v).sum, s"id=$id energy")
      assert(r.getInt(3) == pcm.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)),
        s"id=$id zcr")
      assert(r.getInt(4) == pcm.map(math.abs).max, s"id=$id peak")
    }
  }

  test("g711Stats / adpcmStats: engine stats equal closed-form recomputation") {
    val spark = graft.SparkTestSession.spark
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = (0L to 19L).toDF("doc_id")
    val g = Audio.g711Stats(docs).collect().map(r => r.getLong(0) -> r).toMap
    val a = Audio.adpcmStats(docs).collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 19L) {
      val pcm = (0 until 64).map { k =>
        val d = ((((id * 7 + k * 13) % 256) + 256) % 256).toInt
        if (id % 2 == 0) Audio.ulawToPcm(d) else Audio.alawToPcm(d)
      }
      val rg = g(id)
      assert(rg.getString(1) == (if (id % 2 == 0) "ulaw" else "alaw"))
      assert(rg.getInt(2) == 64)
      assert(rg.getLong(3) == pcm.map(_.toLong).sum)
      assert(rg.getLong(4) == pcm.zipWithIndex.map { case (v, k) => k.toLong * v }.sum)
      assert(rg.getInt(5) == pcm.min && rg.getInt(6) == pcm.max)
      val (apcm, endPred, endIdx) =
        Audio.decodeImaAdpcm(Audio.synthAdpcmPayload(id)).get
      val ra = a(id)
      assert(ra.getInt(1) == 65)
      assert(ra.getLong(2) == apcm.map(_.toLong).sum)
      assert(ra.getLong(3) == apcm.zipWithIndex.map { case (v, k) => k.toLong * v }.sum)
      assert(ra.getInt(4) == endPred && ra.getInt(5) == endIdx)
    }
  }
}
