package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 31L), (4L, 100L))
      .toDF("pid", "v")
    val intervals = Seq(
      (10L, 0L, 10L),   // [0, 10)  → matches v=5 only (10 exclusive)
      (11L, 10L, 11L),  // [10, 11) → matches v=10
      (12L, 4L, 40L),   // [4, 40) spans chunks → matches 5, 10, 31
      (13L, 50L, 50L),  // empty → matches nothing
      (14L, 60L, 50L)   // inverted → matches nothing (guard, no crash)
    ).toDF("iid", "lo", "hi")
    (points, intervals)
  }

  test("inclusive lo, exclusive hi, cross-chunk intervals, empty/inverted guarded") {
    val (points, intervals) = frames
    val out = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", chunkWidth = 8)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 12L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("chunk width does not change the result, only the plan") {
    val (points, intervals) = frames
    def run(w: Long) =
      RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(8) && run(8) == run(1000))
  }

  test("plan is an equi-join on the chunk, not a nested-loop cross product") {
    val (points, intervals) = frames
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degraded to a cross product:\n$plan")
  }

  test("chunk ids are exact above 2^53 (double division would misassign)") {
    import spark.implicits._
    // 2^60 + 1: a double mantissa cannot represent the +1, so a
    // divide-through-double floorDiv puts the point in the wrong chunk
    val big = (1L << 60) + 1L
    val p = Seq((1L, big)).toDF("pid", "v")
    val iv = Seq((10L, big, big + 1L), (11L, big + 1L, big + 2L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, iv, "v", "lo", "hi", chunkWidth = 7)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("negative-domain values floor to the correct chunk") {
    import spark.implicits._
    val p = Seq((1L, -3L)).toDF("pid", "v")
    val iv = Seq((10L, -5L, 0L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, iv, "v", "lo", "hi", 8)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("radiusSelfJoin2D: exact boundary inclusion, cross-cell and negative-coordinate pairs, each pair once") {
    import spark.implicits._
    // (1,2) at exactly r (30-40-50 triangle); (4) one unit left of (1)
    // across the cell-0/cell-−1 boundary; (3) outside everything
    val pts = Seq((1L, 0L, 0L), (2L, 30L, 40L), (3L, 100L, 0L),
      (4L, -1L, 0L)).toDF("id", "x", "y")
    val out = RangeJoin.radiusSelfJoin2D(pts, r = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 2500L), (1L, 4L, 1L)))
    // uniqueness under density: a 3-point cluster in one cell emits
    // exactly its 3 pairs (the 3×3 probe explosion never double-counts)
    val tight = Seq((1L, 10L, 10L), (2L, 12L, 10L), (3L, 10L, 13L))
      .toDF("id", "x", "y")
    assert(RangeJoin.radiusSelfJoin2D(tight, r = 50).count() == 3L)
  }

  test("radiusSelfJoin2D: matches the brute-force census on a deterministic scatter") {
    import spark.implicits._
    val pts = (1L to 120L).map(i =>
      (i, (i * 37) % 211 - 100, (i * 53) % 223 - 111)).toDF("id", "x", "y")
    val grid = RangeJoin.radiusSelfJoin2D(pts, r = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 1600L
    } yield (a._1, b._1, d2)).toSet
    assert(grid == brute && brute.nonEmpty)
  }
}
