package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload plumbing: features are deterministic and binary is pruned") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "hello world"), Row(1L, "abc")))
    val out1 = Multimodal.mediaFeatures(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    val out2 = Multimodal.mediaFeatures(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(out1 == out2)                       // deterministic stub codec
    assert(out1(0L)._1 == "hello world".length) // n_bytes from real binary column
    val cols = Multimodal.mediaFeatures(docs).columns.toSeq
    assert(!cols.contains("payload"))          // binary pruned from output
    assert(cols == Seq("media_id", "kind", "n_bytes", "checksum", "mean_byte", "frames_sampled"))
  }

  test("frameDupStats: identical payloads share every frame; unique payloads share none") {
    // ids 0 and 2 carry the same (multi-frame) payload → every frame of
    // each is cross-media shared; id 4 is unique → zero shared
    val long = ("x" * 300) + ("y" * 300) // 600 bytes → 3 frames at stride 256
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, long), Row(2L, long), Row(4L, "unique payload")))
    val out = Multimodal.frameDupStats(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((3L, 3L, 3L)))
    assert(out(2L) == ((3L, 3L, 3L)))
    assert(out(4L) == ((1L, 1L, 0L)))
  }

  test("NULL text becomes an empty payload, not a crash") {
    val docs = df("doc_id BIGINT, text STRING", Seq(Row(0L, null), Row(1L, "ok")))
    val out = Multimodal.mediaFeatures(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(0L -> 0, 1L -> 2))
  }

  test("kind split and frame sampling shape") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "x" * 3000), Row(1L, "y" * 10)))
    val out = Multimodal.mediaFeatures(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(5))).toMap
    assert(out(0L)._1 == "image" && out(1L)._1 == "audio") // even/odd split
    assert(out(0L)._2 == 3)  // ceil(3000/1024) frames sampled
    assert(out(1L)._2 == 1)
  }

  test("sampleFrames: per-frame offsets, lengths, clock, and fingerprints") {
    val docs = df("doc_id BIGINT, text STRING", Seq(Row(0L, "a" * 10)))
    val out = Multimodal.sampleFrames(
      Multimodal.fakeMediaFromDocuments(docs), stride = 4, maxFrames = 16)
      .collect().sortBy(_.frame_idx)
    assert(out.map(f => (f.frame_idx, f.byte_off, f.frame_bytes, f.frame_ts_us))
      .toSeq == Seq((0, 0, 4, 0L), (1, 4, 4, 40000L), (2, 8, 2, 80000L)))
    // frames 0 and 1 are both "aaaa" → identical content fingerprint;
    // the short tail "aa" differs
    assert(out(0).checksum == out(1).checksum)
    assert(out(0).checksum != out(2).checksum)
  }

  test("sampleFrames: maxFrames caps the fan-out; empty payload yields no frames") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "z" * 1000), Row(1L, null)))
    val out = Multimodal.sampleFrames(
      Multimodal.fakeMediaFromDocuments(docs), stride = 100, maxFrames = 3)
      .collect()
    assert(out.count(_.media_id == 0L) == 3) // 10 natural frames, capped at 3
    assert(!out.exists(_.media_id == 1L))    // NULL text → empty payload → none
  }

  test("perceptualHash: hand-computed bits, empty payload is 0") {
    // 4 chunks over 8 bytes "AAAAyyyy" = [65*4, 121*4]: total=744
    // chunk sums (len 2): 130,130,242,242
    // bits (cs*8 > 744*2): 1040<1488,1040<1488,1936>1488,1936>1488 -> 0b1100 = 12
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "AAAAyyyy"), Row(1L, null)))
    val out = Multimodal.perceptualHash(
      Multimodal.fakeMediaFromDocuments(docs), chunks = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 12L, 1L -> 0L))
  }

  test("mediaNearDupPairs: identical payloads pair at hamming 0, distant don't") {
    val base = "abcdefgh" * 32 // alternating chunk means -> odd bits set
    val far = "a" * 128 + "z" * 128 // low half / high half -> high 32 bits set
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, base), Row(2L, base), Row(3L, far)))
    val pairs = Multimodal.mediaNearDupPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(pairs.forall(p => !(p._1 == 3L || p._2 == 3L)))
  }

  test("HeaderCodec.probe: parses the synthetic BMP header fields") {
    val h = Multimodal.HeaderCodec.probe(
      Multimodal.synthPayload(4L, "image")).get
    assert((h.fmt, h.width, h.height, h.contentOff, h.contentLen) ==
      ("bmp", 8, 8, 54, 192))
  }

  test("HeaderCodec.probe: walks RIFF chunks to fmt + data on the synthetic WAV") {
    val h = Multimodal.HeaderCodec.probe(
      Multimodal.synthPayload(5L, "audio")).get
    assert((h.fmt, h.sampleRate, h.channels, h.blockAlign,
      h.contentOff, h.contentLen) == ("wav", 16000, 1, 2, 44, 128))
  }

  test("HeaderCodec.probe: rejects corrupted magic and truncated headers") {
    val bmp = Multimodal.synthPayload(2L, "image")
    bmp(0) = 'X'
    assert(Multimodal.HeaderCodec.probe(bmp).isEmpty)
    val wav = Multimodal.synthPayload(3L, "audio")
    assert(Multimodal.HeaderCodec.probe(wav.take(30)).isEmpty)
    assert(Multimodal.HeaderCodec.probe("not media at all".getBytes).isEmpty)
  }

  test("HeaderCodec featurizes over the LOCATED content, not the whole file") {
    // hand-check: features must cover exactly the pixel array / data chunk
    val row = Multimodal.MediaRow(6L, "image",
      Multimodal.synthPayload(6L, "image"), 8, 8, 16000)
    val f = Multimodal.HeaderCodec.decodeAndFeaturize(row, frameEvery = 16)
    val expectedSum = (0 until 192).map(k => (6L * 31 + k * 7) % 251).sum
    assert(f.n_bytes == 192) // not 246: header excluded
    assert(math.abs(f.mean_byte - expectedSum.toDouble / 192) < 1e-12)
    assert(f.frames_sampled == 1)
    val wavRow = Multimodal.MediaRow(7L, "audio",
      Multimodal.synthPayload(7L, "audio"), 0, 0, 16000)
    val g = Multimodal.HeaderCodec.decodeAndFeaturize(wavRow, frameEvery = 16)
    assert(g.n_bytes == 128 && g.frames_sampled == 4) // ceil(64 samples / 16)
  }

  test("HeaderCodec falls back to StubCodec whole-payload features on unknown bytes") {
    val junk = Multimodal.MediaRow(8L, "image",
      "definitely not a container".getBytes, 0, 0, 0)
    assert(Multimodal.HeaderCodec.decodeAndFeaturize(junk, 1024) ==
      Multimodal.StubCodec.decodeAndFeaturize(junk, 1024))
  }

  test("probeMedia: parsed metadata matches the closed-form corpus definition") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(10L, "x"), Row(11L, "y")))
    val out = Multimodal.probeMedia(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val bmp = out(10L)
    assert((bmp.getString(1), bmp.getInt(2), bmp.getInt(3), bmp.getInt(6)) ==
      ("bmp", 8, 8, 192))
    assert(bmp.getLong(7) == (0 until 192).map(k => (10L * 31 + k * 7) % 251).sum)
    val wav = out(11L)
    assert((wav.getString(1), wav.getInt(4), wav.getInt(5), wav.getInt(6)) ==
      ("wav", 16000, 1, 128))
    assert(wav.getLong(7) == (0 until 64).map { s =>
      val v = (11L * 13 + s * 5) % 65536
      v % 256 + v / 256
    }.sum)
  }
}
