package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TfIdfSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("vectors are vocabSize wide for every doc, zero vector when no vocab token") {
    val d = docs(1L -> "alpha beta beta", 2L -> "")
    val v = TfIdf.tfidfVectors(d, vocabSize = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v(1L).size == 8 && v(2L).size == 8)
    assert(v(2L).forall(_ == 0.0))
    assert(v(1L).count(_ != 0.0) == 2) // alpha, beta
  }

  test("weights are tf times rational idf; rarer token weighs more at equal tf") {
    // "common" in all 3 docs (df=3), "rare" in one (df=1); N=3
    val d = docs(1L -> "common rare", 2L -> "common", 3L -> "common")
    val v = TfIdf.tfidfVectors(d, vocabSize = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // vocab order: common (n=3) idx 0, rare (n=1) idx 1
    val idfCommon = (4L * 1000L) / 4L // 1000
    val idfRare = (4L * 1000L) / 2L   // 2000
    assert(v(1L) == Seq(idfCommon.toDouble, idfRare.toDouble, 0.0, 0.0))
    assert(v(2L) == Seq(idfCommon.toDouble, 0.0, 0.0, 0.0))
  }

  test("capped LSH composes on tfidf vectors and finds the exact-dup neighbor") {
    val d = docs(
      10L -> "spark scala query engine optimizer",
      20L -> "spark scala query engine optimizer",
      30L -> "totally different words entirely here banana")
    val vecs = TfIdf.tfidfVectors(d, vocabSize = 16)
    // identical vectors share every LSH bucket, so the dup must surface
    val top = Similarity.lshTopK(vecs, vecs, k = 1, dim = 16, nPlanes = 4,
      idCol = "doc_id", vecCol = "tfidf", maxBucketCandidates = Some(8)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(top(10L) == ((20L, 1.0)))
    assert(top(20L) == ((10L, 1.0)))
  }

  test("identical docs are each other's top-1 neighbor with score 1.0") {
    val d = docs(
      10L -> "spark scala query engine optimizer",
      20L -> "spark scala query engine optimizer",
      30L -> "totally different words entirely here banana")
    val vecs = TfIdf.tfidfVectors(d, vocabSize = 16)
    val top = Similarity.bruteForceTopK(vecs, vecs, k = 1,
      idCol = "doc_id", vecCol = "tfidf").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(top(10L) == ((20L, 1.0)))
    assert(top(20L) == ((10L, 1.0)))
  }
}
