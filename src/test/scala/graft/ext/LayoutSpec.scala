package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Layout.skippingAudit on a constructed 16×16 grid where the geometry is
  * checkable by hand: 256 rows over keys (a, b) ∈ [0,16)², nFiles = 16.
  */
class LayoutSpec extends SparkSpec {

  private lazy val grid = df("id BIGINT, a BIGINT, b BIGINT",
    (0 until 256).map(i => Row(i.toLong, (i / 16).toLong, (i % 16).toLong)))

  private lazy val audit =
    Layout.skippingAudit(grid, "a", "b", "id", nFiles = 16, bits = 4,
      probeModA = 5, probeModB = 7).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("linear layout prunes its sort key perfectly") {
    // 16 files × 16 rows each = one a-value per file; probes a ∈ {1, 6, 11}
    // (a % 5 = 1) each hit exactly 1 file
    val (nf, np, hit) = audit(("linear_a", "a"))
    assert(nf == 16 && np == 3 && hit == 3)
  }

  test("linear layout cannot prune the other key at all") {
    // every file spans the full b range; probes b ∈ {3, 10} (b % 7 = 3)
    val (_, np, hit) = audit(("linear_a", "b"))
    assert(np == 2 && hit == 32)
  }

  test("z-order prunes both keys at sqrt(nFiles)") {
    // z-order on a 16×16 grid with 16 files = 4×4 tiles: each key value
    // intersects exactly 4 tiles on either dimension
    val (_, npA, hitA) = audit(("zorder", "a"))
    val (_, npB, hitB) = audit(("zorder", "b"))
    assert(hitA == npA * 4 && hitB == npB * 4)
  }

  test("audit is layout-invariant (exact ranks survive repartitioning)") {
    val shuffled = grid.repartition(7, col("b"))
    val again = Layout.skippingAudit(shuffled, "a", "b", "id", nFiles = 16,
      bits = 4, probeModA = 5, probeModB = 7)
    assert(rowSet(again) == audit.toSeq.map { case ((l, d), (nf, np, h)) =>
      s"$l|$d|$nf|$np|$h"
    }.sorted)
  }

  test("withHilbert: order-1 quadrant order and full-grid unit-step bijection") {
    // order 1: the defining U — (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    val one = Layout.withHilbert(
      df("x BIGINT, y BIGINT", Seq(Row(0L, 0L), Row(0L, 1L), Row(1L, 1L), Row(1L, 0L))),
      "x", "y", bits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(one == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
    // order 4 (16×16): the index is a bijection onto [0, 256) and
    // consecutive indices are GRID-ADJACENT (|Δx|+|Δy| = 1) — the
    // locality property the curve shootout cashes in
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield Row(x.toLong, y.toLong)
    val d4 = Layout.withHilbert(df("x BIGINT, y BIGINT", pts), "x", "y", bits = 4)
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
    assert(d4.map(_._1).sorted.toSeq == (0L until 256L))
    val byD = d4.toMap
    (0L until 255L).foreach { i =>
      val ((x1, y1), (x2, y2)) = (byD(i), byD(i + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"d=$i (${byD(i)}) -> d=${i + 1} (${byD(i + 1)}) is not a unit step")
    }
  }

  test("curveAudit: hilbert envelopes never worse than zorder on the uniform grid") {
    val out = Layout.curveAudit(grid, "a", "b", "id", nFiles = 16,
      bits = 4, probeModA = 5, probeModB = 7)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // 16 files on a 16×16 grid: hilbert tiles are 4×4 blocks too — each
    // point probe on either dim intersects exactly 4 files, matching
    // z-order's tiling on the uniform grid
    assert(out(("hilbert", "a")) <= out(("zorder", "a")))
    assert(out(("hilbert", "b")) <= out(("zorder", "b")))
    assert(out(("linear_a", "b")) >= out(("hilbert", "b"))) // linear can't prune b
  }

  test("fileBloomAudit: no false negatives; blooms beat envelopes on uncorrelated keys") {
    // 256 rows, insertion order = id, key cycles 0..15 — every file's
    // envelope spans the whole key domain, so minmax opens everything
    val t = df("id BIGINT, key BIGINT",
      (0 until 256).map(i => Row(i.toLong, (i % 16).toLong)))
    val r = Layout.fileBloomAudit(t, "key", "id", nFiles = 8, k = 3,
      mBits = 1024, probeMod = 4, probeResidue = 1).collect().head
    assert(r.getAs[Long]("n_files") == 8L)
    assert(r.getAs[Long]("n_probes") == 4L)       // keys 1, 5, 9, 13
    // every key appears in every file → exact = 4·8 = minmax = 32
    assert(r.getAs[Long]("exact_open") == 32L)
    assert(r.getAs[Long]("minmax_open") == 32L)
    assert(r.getAs[Long]("bloom_open") >= r.getAs[Long]("exact_open"))
    // sparse case: each key lives in ONE file but every file's envelope
    // spans ~the whole domain (keys j·1000+f for file f) — blooms prune,
    // envelopes can't
    val sparse = df("id BIGINT, key BIGINT",
      (0 until 256).map(i => Row(i.toLong, (i % 4 * 1000 + i / 32).toLong)))
    val s = Layout.fileBloomAudit(sparse, "key", "id", nFiles = 8, k = 3,
      mBits = 1024, probeMod = 2, probeResidue = 1).collect().head
    assert(s.getAs[Long]("bloom_open") >= s.getAs[Long]("exact_open"))
    assert(s.getAs[Long]("bloom_open") < s.getAs[Long]("minmax_open"))
    assert(s.getAs[Long]("false_open")
      == s.getAs[Long]("bloom_open") - s.getAs[Long]("exact_open"))
  }

  test("rendezvousShards: consistent-hashing property — growing S relocates only to the new shard") {
    val docs = df("doc_id BIGINT", (0L until 400L).map(Row(_)))
    def assign(nS: Int): Map[Long, Long] =
      Layout.rendezvousAssign(docs, nS).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at8 = assign(8)
    val at9 = assign(9)
    assert(at8.keySet == at9.keySet && at8.size == 400)
    // every doc either keeps its shard or moves to the NEW shard (8)
    val moved = at8.keys.filter(d => at9(d) != at8(d))
    assert(moved.forall(d => at9(d) == 8L))
    // and a nonzero but roughly 1/9 fraction moves
    assert(moved.nonEmpty && moved.size < 120)
    // balance: every shard occupied at S=8, shares within a loose band
    val counts = at8.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 8 && counts.values.forall(c => c > 20 && c < 80))
  }

  test("rendezvousShards: shares sum to ~1e6 and the audit is layout-invariant") {
    val docs = df("doc_id BIGINT", (0L until 300L).map(Row(_)))
    val a = Layout.rendezvousShards(docs.repartition(1), 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Layout.rendezvousShards(docs.repartition(13), 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._2).sum == 300L)
    val ppm = a.map(_._3).sum
    assert(ppm > 980000L && ppm <= 1000000L) // floor rounding only loses
  }
}
