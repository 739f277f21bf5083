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

  test("incremental: a 3-way split's merged moments train the identical component") {
    val base = vecs((0L until 90L).map { i =>
      i -> Seq((i % 11).toFloat, (i % 4).toFloat, ((i * 3) % 13).toFloat)
    })
    val batch = Pca.topComponent(base, iterations = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = Pca.topComponentFromMoments(
      Pca.mergeMoments(
        Pca.mergeMoments(
          Pca.momentFrame(base.filter("vec_id % 3 = 0")),
          Pca.momentFrame(base.filter("vec_id % 3 = 1"))),
        Pca.momentFrame(base.filter("vec_id % 3 = 2"))),
      iterations = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == batch)
  }

  test("second component: picks the second-variance axis, near-orthogonal to the first") {
    // variance order: dim 2 (±2) > dim 0 (±1) > dim 1 (tiny); PC1 → dim 2,
    // PC2 → dim 0. Patterns use coprime periods so the axes decorrelate.
    val d = vecs((0L until 60L).map { i =>
      i -> Seq(if (i % 2 == 0) 1.0f else -1.0f,
               0.01f * (i % 3),
               if (i % 5 < 2) 2.0f else -2.0f, 0.0f)
    })
    val v1 = Pca.topComponent(d, iterations = 24)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val v2 = Pca.topComponent(d, iterations = 24, component = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(v1(2)) == 1000L, s"PC1 must ride the high-variance axis: $v1")
    assert(math.abs(v2(0)) == 1000L, s"PC2 must ride the second axis: $v2")
    // orthogonality within integer rounding: |v1·v2| ≪ ‖v1‖‖v2‖ (≈ 10⁶)
    val dot = (0 until 4).map(i => v1(i) * v2(i)).sum
    assert(math.abs(dot) < 100000L, s"components must be near-orthogonal: dot=$dot")
  }

  test("deflate: kills the projected-out direction exactly at the matrix level") {
    // C = diag-ish with a dominant direction e0: after deflation along
    // e0 (v = [1000, 0]), row/col 0 must vanish (exact integer projector)
    val c = Array(Array(500L, 0L), Array(0L, 100L))
    val d = Pca.deflate(c, Array(1000L, 0L))
    assert(d(0)(0) == 0L && d(0)(1) == 0L && d(1)(0) == 0L)
    assert(d(1)(1) == 100L) // the orthogonal direction is untouched
  }
}
