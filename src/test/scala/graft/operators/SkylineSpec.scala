package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  // deterministic scatter over a 1000×1000 integer domain
  private def points(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (i * 7919L + 13L) % 1000L, (i * 104729L + 7L) % 1000L)
    }.toDF("id", "x", "y")
  }

  private def brute(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, sx, sy) =>
        sx <= x && sy <= y && (sx < x || sy < y)
      }
    }.map(_._1).toSet

  test("matches the quadratic dominance definition") {
    val df = points(500)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Skyline.skyline2D(df, "x", "y", bucketWidth = 64)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(rows))
    assert(got.nonEmpty)
  }

  test("bucket width does not change the result (1, prime, whole-domain)") {
    val df = points(300)
    val ref = Skyline.skyline2D(df, "x", "y", 64).collect().map(_.getLong(0)).toSet
    for (w <- Seq(1L, 37L, 1000000L))
      assert(Skyline.skyline2D(df, "x", "y", w).collect().map(_.getLong(0)).toSet == ref,
        s"bucketWidth $w diverged")
  }

  test("ties on both dimensions are all kept; within-x dominance drops") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L), // tied pair — both survive
      (3L, 10L, 11L),                 // dominated within x = 10
      (4L, 9L, 20L),                  // skyline (cheapest x)
      (5L, 11L, 9L),                  // skyline (smallest y)
      (6L, 11L, 10L)                  // dominated by (1)/(2) across x
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y", 4).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("all-identical input survives entirely; singleton survives") {
    import spark.implicits._
    val same = Seq.fill(5)((7L, 7L)).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
    assert(Skyline.skyline2D(same, "x", "y", 8).count() == 5)
    val one = Seq((1L, 3L, 4L)).toDF("id", "x", "y")
    assert(Skyline.skyline2D(one, "x", "y", 8).count() == 1)
  }

  test("result is partitioning-invariant") {
    val df = points(400)
    val a = Skyline.skyline2D(df, "x", "y", 64).collect().map(_.getLong(0)).toSet
    val b = Skyline.skyline2D(df.repartition(17), "x", "y", 64)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
