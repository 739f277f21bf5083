package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension surface): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * run per-partition so one task amortizes (real-world) codec init across
  * its whole batch.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic stub ([[StubCodec]]); everything
  * around it — schema, batch shape, partition-parallel execution, feature
  * schema — is real and tested. Swapping StubCodec for a JNI/ffmpeg-backed
  * codec changes no plumbing.
  *
  * Scale notes: media rows are large → keep
  * `spark.sql.files.maxPartitionBytes` low for these tables, never collect,
  * and carry only (id, features) forward after extraction so the binary
  * payload is pruned from downstream shuffles.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, mean_byte: Double,
                                 frames_sampled: Int)

  /** Deterministic stand-in for the image/audio decode libraries that are
    * not installed here. Real implementation would decode `payload` with a
    * codec; the stub derives stable pseudo-features from the raw bytes so
    * the pipeline is testable end-to-end.
    */
  object StubCodec {
    /** ??? in spirit: replace with a real decode when codecs exist. */
    def decodeAndFeaturize(r: MediaRow, frameEvery: Int): MediaFeatures = {
      val bytes = r.payload
      var sum = 0L; var checksum = 1469598103934665603L // FNV-1a offset
      var i = 0
      while (i < bytes.length) {
        sum += bytes(i) & 0xff
        checksum = (checksum ^ (bytes(i) & 0xff)) * 1099511628211L
        i += 1
      }
      val frames = if (frameEvery <= 0) 0 else (bytes.length + frameEvery - 1) / frameEvery
      MediaFeatures(r.media_id, r.kind, bytes.length, checksum,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, frames)
    }
  }

  /** Per-partition decode + feature extraction. mapPartitions (not map) so
    * a real codec is initialized once per task, not once per row — the
    * JVM-side equivalent of batched pandas-UDF execution.
    */
  def extractFeatures(media: Dataset[MediaRow], frameEvery: Int = 1024)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open(...) here, once per partition
      rows.map(r => StubCodec.decodeAndFeaturize(r, frameEvery))
    }
  }

  /** Builds a deterministic fake media table from the documents corpus
    * (text bytes as payload) — exercises the binary-column path with real
    * Spark binary data without any codec dependency.
    */
  def fakeMediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      // NULL text → empty payload: the codec contract takes non-null bytes
      coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte])).as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate")
    ).as[MediaRow]
  }

  /** The registered query shape: features per media row, binary pruned. */
  def mediaFeatures(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    extractFeatures(fakeMediaFromDocuments(docs)).toDF()

  final case class MediaHash(media_id: Long, phash: Long)

  /** 64-bit average-hash perceptual fingerprint: the payload is cut into
    * `chunks` byte ranges (the stub's stand-in for an 8×8 luma grid — a
    * real codec would decode + downsample first, changing nothing below),
    * bit j = 1 iff chunk j's mean byte exceeds the whole-payload mean.
    * The compare is an integer cross-multiply (`cs·n > total·len`) — no
    * division, no floats, so the fingerprint is bit-identical in any
    * engine and SQL-derivable for the oracle.
    *
    * Near-identical payloads (a re-encode, a few changed bytes) flip few
    * chunk means → small Hamming distance; pairs come from
    * [[Dedup.nearDupPairsFromHashes]], the same banded machinery SimHash
    * uses. mapPartitions for the same codec-amortization reason as
    * [[extractFeatures]].
    */
  def perceptualHash(media: Dataset[MediaRow], chunks: Int = 64)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(chunks >= 1 && chunks <= 64, "chunks must fit a 64-bit hash")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bs = r.payload
        val n = bs.length
        var phash = 0L
        if (n > 0) {
          var total = 0L
          var i = 0
          while (i < n) { total += bs(i) & 0xff; i += 1 }
          var j = 0
          while (j < chunks) {
            val lo = (j.toLong * n / chunks).toInt
            val hi = ((j + 1).toLong * n / chunks).toInt
            var cs = 0L
            var k = lo
            while (k < hi) { cs += bs(k) & 0xff; k += 1 }
            if (cs * n > total * (hi - lo)) phash |= (1L << j)
            j += 1
          }
        }
        MediaHash(r.media_id, phash)
      }
    }.toDF()
  }

  final case class Frame(media_id: Long, frame_idx: Int, byte_off: Int,
                         frame_bytes: Int, frame_ts_us: Long, checksum: Long)

  /** Frame sampling: each media payload expands to one row per sampled
    * frame — the row-explosion step a video/audio pipeline runs before
    * per-frame featurization. The stub "frame" is a fixed `stride`-byte
    * slice of the payload (a real codec would seek keyframes; the
    * surrounding plumbing — fan-out schema, per-frame offsets/timestamps,
    * per-partition codec amortization, `maxFrames` cap — is the real
    * contract and identical either way). `frame_ts_us` stamps frames on a
    * 25 fps clock; `checksum` is the FNV-1a of the frame's own bytes, the
    * per-frame content fingerprint downstream dedup joins on.
    *
    * Scale shape: a narrow mapPartitions fan-out — no shuffle, no state;
    * output rows carry only offsets + fingerprints (the payload slice is
    * consumed inside the task and NOT emitted), so a 100 TB video corpus
    * fans out to frame rows of a few dozen bytes each. `maxFrames` bounds
    * the per-row expansion (a 4-hour stream cannot 10⁶× one task's
    * output); real decoders plug in at the marked slice without touching
    * the plan.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 256,
                   maxFrames: Int = 16)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    media.mapPartitions { rows =>
      // real impl: codec init here, once per task
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = math.min(((n + stride - 1) / stride).toLong, maxFrames.toLong).toInt
        (0 until nFrames).iterator.map { i =>
          val off = i * stride
          val len = math.min(stride, n - off)
          // stub decode: the frame IS the byte slice; FNV-1a fingerprints it
          var cs = 1469598103934665603L
          var j = off
          while (j < off + len) {
            cs = (cs ^ (r.payload(j) & 0xff)) * 1099511628211L
            j += 1
          }
          Frame(r.media_id, i, off, len, i * 40000L, cs)
        }
      }
    }
  }

  /** The registered query shape: frames sampled from the fake media
    * corpus, payloads pruned.
    */
  def mediaFrames(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    sampleFrames(fakeMediaFromDocuments(docs)).toDF()

  /** Cross-media duplicate-frame report: per media, its sampled-frame
    * count, distinct-fingerprint count (n_frames − n_distinct = INTERNAL
    * repetition — static/looping content), and how many of its frames
    * carry a fingerprint seen in at least one OTHER media (cross-media
    * sharing — re-encoded copies, intro/outro templates, contamination).
    * The frame-level complement of [[mediaNearDupPairs]]: that dedups
    * whole assets by one global hash, this localizes WHICH slices repeat.
    *
    * Scale shape: frames are fanned out once (narrow mapPartitions,
    * pinned so the fingerprint aggregate and the join-back don't decode
    * twice), the fingerprint-keyed distinct-media aggregate and the
    * equi-join back both shuffle on checksum (64-bit key, no skew
    * magnet), then one media-keyed aggregate. Payload bytes never cross
    * the wire — only (media_id, checksum) pairs.
    */
  def frameDupStats(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val f = mediaFrames(docs).select(col("media_id"), col("checksum"))
      .localCheckpoint(true)
    val byFp = f.groupBy("checksum")
      .agg(count_distinct(col("media_id")).as("n_media"))
    f.join(byFp, "checksum")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        count_distinct(col("checksum")).as("n_distinct"),
        sum(when(col("n_media") >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"))
  }

  /** Media near-duplicate pairs: perceptual hash → banded Hamming pairs.
    * The multimodal analogue of text SimHash dedup — candidate discovery
    * never touches payloads pairwise, only 64-bit fingerprints.
    */
  def mediaNearDupPairs(docs: DataFrame, maxHamming: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    Dedup.nearDupPairsFromHashes(
      perceptualHash(fakeMediaFromDocuments(docs)),
      bits = 64, maxHamming = maxHamming, idCol = "media_id",
      hashCol = "phash")
}
