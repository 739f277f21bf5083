package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizedSimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*): org.apache.spark.sql.DataFrame =
    df("vec_id BIGINT, embedding ARRAY<DOUBLE>", rows.map { case (i, v) => Row(i, v) })

  test("quantizeInt8: axis vector → ±127 on the axis, 0 elsewhere; zero vector → zeros") {
    val d = vecs(
      0L -> Seq(5.0, 0.0, 0.0),
      1L -> Seq(0.0, -3.0, 0.0),
      2L -> Seq(0.0, 0.0, 0.0))
    val out = d.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(0L) == Seq(127L, 0L, 0L))
    assert(out(1L) == Seq(0L, -127L, 0L))
    assert(out(2L) == Seq(0L, 0L, 0L))
  }

  test("quantizeInt8: every cell within [-127, 127] on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = emb.select(explode(Similarity.quantizeInt8(col("embedding"))).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(bad == 0L)
  }

  test("quantizedTopK: an exact duplicate ranks first (qdot is maximal for itself)") {
    val d = vecs(
      0L -> Seq(1.0, 2.0, -1.0, 0.5),
      1L -> Seq(1.0, 2.0, -1.0, 0.5), // dup of 0
      2L -> Seq(1.0, 1.9, -1.0, 0.6), // near
      3L -> Seq(-3.0, 0.1, 5.0, -2.0)) // far
    val out = Similarity.quantizedTopK(d.filter(col("vec_id") === 0), d, k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out.head == 1L)
    assert(out(1) == 2L)
  }

  test("quantizedTopK recall@5 vs exact float cosine ≥ 0.8 on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    val quant = pairs(Similarity.quantizedTopK(queries, emb, k = 5))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 = $recall")
  }
}
