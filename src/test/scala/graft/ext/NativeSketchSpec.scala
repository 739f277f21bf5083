package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native DataSketches (Spark 4 built-ins) — both sketch families are
  * EXACT below their promotion thresholds (HLL coupon mode ≲ 512 keys at
  * lgK=12; theta below k=4096 entries), so small-cardinality assertions
  * are equality, not tolerance.
  */
class NativeSketchSpec extends SparkSpec {

  // A = 1..30, B = 21..50, C = 25..35  →  |A∪B∪C| = 50, |A∩B∩C| = 25..30 (6)
  private def data = {
    val rows =
      (1 to 30).map(u => Row("A", u.toLong)) ++
      (21 to 50).map(u => Row("B", u.toLong)) ++
      (25 to 35).map(u => Row("C", u.toLong))
    // duplicate traffic must not move distinct counts
    df("grp STRING, user_id BIGINT", rows ++ rows.take(40))
  }

  test("nativeDistinct: per-group estimates exact at small cardinality; rollup merges binaries") {
    val out = Sketch.nativeDistinct(
      Sketch.nativeSketches(data, "user_id", "grp"), "grp")
      .select(col("grp"), round(col("distinct_est")).cast("long").as("n"))
    assert(rowSet(out) == rows(
      Seq("A", "30"), Seq("B", "30"), Seq("C", "11"), Seq("__all__", "50")))
  }

  test("nativeOverlap: theta set algebra — intersection across ALL groups, union across any") {
    val out = Sketch.nativeOverlap(Sketch.nativeSketches(data, "user_id", "grp"))
      .select(round(col("in_every_group")).cast("long"),
        round(col("in_any_group")).cast("long")).head()
    assert((out.getLong(0), out.getLong(1)) == ((6L, 50L)))
  }

  test("native sketch merge is associative: unioning partial sketches ≡ one-shot sketch") {
    val whole = Sketch.nativeSketches(data, "user_id", "grp")
      .agg(round(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false))))
        .cast("long").as("e"))
      .head().getLong(0)
    // re-sketch the same keys split on a DIFFERENT axis (odd/even users)
    val resplit = Sketch.nativeSketches(
      data.withColumn("grp", (col("user_id") % 2).cast("string")), "user_id", "grp")
      .agg(round(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false))))
        .cast("long").as("e"))
      .head().getLong(0)
    assert(whole == 50L && resplit == 50L)
  }
}
