package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SelectionSpec extends SparkSpec {

  private def longs(xs: Seq[Long]): org.apache.spark.sql.DataFrame =
    df("v BIGINT", xs.map(Row(_)))

  test("exactQuantiles: matches the sort definition on a known multiset") {
    // 1..100: rank(p50)=50 → 50, rank(p90)=90 → 90, rank(p99)=99 → 99
    val out = Selection.exactQuantiles(longs(1L to 100L), col("v"),
      Seq(500000L, 900000L, 990000L))
    assert(out.columns.toSeq == Seq("q_ppm", "rank", "value"))
    assert(rowSet(out) == rows(
      Seq("500000", "50", "50"),
      Seq("900000", "90", "90"),
      Seq("990000", "99", "99")))
  }

  test("exactQuantiles: duplicates counted, rank floor at 1, tiny buckets") {
    // multiset {5,5,5,7,9}: rank(p1)=1 → 5, rank(p60)=3 → 5, rank(p80)=4 → 7
    val out = Selection.exactQuantiles(longs(Seq(9L, 5L, 7L, 5L, 5L)),
      col("v"), Seq(10000L, 600000L, 800000L), buckets = 2)
    assert(rowSet(out) == rows(
      Seq("10000", "1", "5"),
      Seq("600000", "3", "5"),
      Seq("800000", "4", "7")))
  }

  test("exactQuantiles: negative values and a single-valued relation") {
    val out = Selection.exactQuantiles(longs(Seq(-10L, -3L, 0L, 4L)),
      col("v"), Seq(250000L, 1000000L))
    assert(rowSet(out) == rows(
      Seq("250000", "1", "-10"),
      Seq("1000000", "4", "4")))
    val const = Selection.exactQuantiles(longs(Seq(42L, 42L, 42L)),
      col("v"), Seq(500000L))
    assert(rowSet(const) == rows(Seq("500000", "2", "42")))
  }

  test("exactQuantiles: agrees with ORDER BY at every decile on a hash-scattered set") {
    val vals = (1L to 500L).map(i => (i * 2654435761L) % 100003L)
    val sorted = vals.sorted
    val ppms = (1 to 10).map(_ * 100000L)
    val out = Selection.exactQuantiles(longs(vals), col("v"), ppms)
    val expected = ppms.map { p =>
      val rank = math.max(1L, (p * 500L + 999999L) / 1000000L)
      Seq(p.toString, rank.toString, sorted((rank - 1).toInt).toString)
    }
    assert(rowSet(out) == rows(expected: _*))
  }

  test("exactGroupQuantiles: per-group ranks over skewed group sizes") {
    val data = df("g STRING, v BIGINT",
      (1L to 99L).map(i => Row("big", i)) :+ Row("small", 1000L) :+ Row("small", 2000L))
    val out = Selection.exactGroupQuantiles(data, "g", col("v"),
      Seq(500000L, 990000L))
    assert(out.columns.toSeq == Seq("key", "q_ppm", "rank", "value"))
    assert(rowSet(out) == rows(
      Seq("big", "500000", "50", "50"),
      Seq("big", "990000", "99", "99"),
      Seq("small", "500000", "1", "1000"),
      Seq("small", "990000", "2", "2000")))
  }

  test("exactGroupQuantilesWeighted: weighted median by hand; weights gate checked") {
    // values 1(w=1), 2(w=1), 10(w=8): W=10; p50 rank=5 → cum 1,2,10 → 10
    val data = df("g STRING, v BIGINT, w BIGINT",
      Seq(Row("a", 1L, 1L), Row("a", 2L, 1L), Row("a", 10L, 8L)))
    val out = Selection.exactGroupQuantilesWeighted(data, "g", col("v"),
      col("w"), Seq(100000L, 200000L, 500000L))
    assert(rowSet(out) == rows(
      Seq("a", "100000", "1", "1"), // rank 1 → first unit of weight
      Seq("a", "200000", "2", "2"), // rank 2 → second unit
      Seq("a", "500000", "5", "10"))) // rank 5 lands inside 10's mass
    // zero/negative weights violate the exact-mass contract
    val bad = df("g STRING, v BIGINT, w BIGINT", Seq(Row("a", 1L, 0L)))
    intercept[IllegalArgumentException] {
      Selection.exactGroupQuantilesWeighted(bad, "g", col("v"), col("w"),
        Seq(500000L)).collect()
    }
  }

  test("exactGroupQuantiles: layout-invariant (repartition does not change answers)") {
    val vals = (1L to 300L).map(i => (i * 40503L) % 7919L)
    val data = df("g STRING, v BIGINT",
      vals.zipWithIndex.map { case (v, i) => Row(if (i % 3 == 0) "a" else "b", v) })
    val a = rowSet(Selection.exactGroupQuantiles(
      data.repartition(1), "g", col("v"), Seq(500000L, 900000L)))
    val b = rowSet(Selection.exactGroupQuantiles(
      data.repartition(13), "g", col("v"), Seq(500000L, 900000L)))
    assert(a == b)
  }
}
