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
}
