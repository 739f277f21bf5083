package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalOverlapSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    val left = Seq(
      (1L, 0L, 10L),   // overlaps r10 (edge), r12
      (2L, 20L, 25L),  // overlaps r12 only
      (3L, 40L, 40L),  // empty → nothing
      (4L, 100L, 90L)  // inverted → nothing (guard, no crash)
    ).toDF("lid", "a_lo", "a_hi")
    val right = Seq(
      (10L, 9L, 12L),  // touches l1 at [9,10)
      (11L, 10L, 12L), // does NOT overlap l1 ([0,10) is half-open)
      (12L, 5L, 30L),  // long interval spanning many chunks → l1 AND l2
      (13L, 60L, 70L)  // overlaps nothing
    ).toDF("rid", "b_lo", "b_hi")
    (left, right)
  }

  private def pairs(w: Long) = {
    val (l, r) = frames
    RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", w)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("half-open overlap semantics; empty/inverted guarded") {
    assert(pairs(8) == Set((1L, 10L), (1L, 12L), (2L, 12L)))
  }

  test("each overlapping pair emits exactly ONCE even when it shares many chunks") {
    val (l, r) = frames
    // chunkWidth 2: l2=[20,25) and r12=[5,30) share chunks 10,11,12 — the
    // responsibility predicate must collapse that to one row, not DISTINCT
    val rows = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", 2L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(rows.size == rows.toSet.size, s"duplicate emits: $rows")
    assert(rows.toSet == pairs(8))
  }

  test("chunk width does not change the result") {
    assert(pairs(1) == pairs(8) && pairs(8) == pairs(1000))
  }

  test("matches brute force on a dense generated interval set") {
    import spark.implicits._
    // deterministic pseudo-random intervals, many chunk-straddling overlaps
    def gen(n: Int, seed: Long) = (0 until n).map { i =>
      val lo = (i * 37 + seed * 11) % 97
      (seed * 1000 + i, lo, lo + 1 + (i * 13 + seed) % 23)
    }
    val a = gen(60, 1).toDF("lid", "a_lo", "a_hi")
    val b = gen(60, 2).toDF("rid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = a.crossJoin(b)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.size == want.size && got.toSet == want)
  }

  test("plan is an equi-join on the chunk, not a nested-loop cross product") {
    val (l, r) = frames
    val plan = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"interval overlap degraded to a cross product:\n$plan")
  }
}
