package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("topComponent recovers the dominant axis of an anisotropic cloud") {
    // variance concentrated on dim 1 (values ±1), noise on dim 0 (±0.01):
    // the top component must point (essentially) along dim 1, positive
    val d = vecs((0L until 40L).map { i =>
      i -> Seq(if (i % 2 == 0) 0.01f else -0.01f,
               if (i % 3 == 0) 1.0f else -1.0f, 0.0f, 0.0f)
    })
    val v = Pca.topComponent(d, iterations = 24)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v(1) == 1000L, s"dominant axis must carry the max loading: $v")
    assert(math.abs(v(0)) < 100 && v(2) == 0L && v(3) == 0L)
  }

  test("sign is deterministic: flipping every input leaves the component unchanged") {
    val base = (0L until 30L).map { i =>
      i -> Seq((i % 5).toFloat / 5f, (i % 7).toFloat / 7f, 0.1f)
    }
    val a = Pca.topComponent(vecs(base), iterations = 16).collect().toSeq
    val b = Pca.topComponent(vecs(base.map { case (id, v) => id -> v.map(-_) }),
      iterations = 16).collect().toSeq
    assert(a.map(r => (r.getInt(0), r.getLong(1))) ==
      b.map(r => (r.getInt(0), r.getLong(1))))
  }

  test("repartition-invariant: moments are exact integers, so layout cannot matter") {
    val base = vecs((0L until 50L).map { i =>
      i -> Seq((i % 11).toFloat, (i % 4).toFloat, ((i * 3) % 13).toFloat)
    })
    val a = Pca.topComponent(base, iterations = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = Pca.topComponent(base.repartition(7), iterations = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("project: scores are the exact integer dot; top-k ordered by |score| then id") {
    // one dominant axis; the extreme vectors along it must surface first
    val d = vecs(Seq(
      1L -> Seq(10.0f, 0.0f), 2L -> Seq(-10.0f, 0.0f),
      3L -> Seq(1.0f, 0.0f), 4L -> Seq(-1.0f, 0.1f), 5L -> Seq(0.0f, 0.0f)))
    val out = Pca.project(d, iterations = 16, k = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(math.abs(out(0).getLong(1)) >= math.abs(out(1).getLong(1)))
  }

  test("powerIterate: zero matrix keeps the start vector (no division by zero)") {
    val v = Pca.powerIterate(Array.ofDim[Long](4, 4), iterations = 8)
    assert(v.toSeq == Seq(1000L, 1000L, 1000L, 1000L))
  }
}
