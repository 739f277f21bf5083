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
}
