package graft.operators

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based equivalence of the scale-shaped join operators against
  * their brute-force definitions on random worlds (fixed seeds —
  * deterministic CI, same manual-sampling style as graft.PropertySpec).
  */
class OperatorPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- as-of join ----------------------------------------------------------

  private val keyGen = Gen.choose(1L, 5L)
  private val tsGen = Gen.choose(0L, 3000L)

  test("asOf equals the latest-≤ brute force on random keyed series") {
    (1 to 5).foreach { i =>
      val leftRows = sample(Gen.listOfN(40, Gen.zip(keyGen, tsGen)), 100L + i)
        .zipWithIndex.map { case ((k, t), id) => (id.toLong, k, new Timestamp(t * 1000)) }
      val rightRaw = sample(Gen.listOfN(30, Gen.zip(keyGen, tsGen)), 200L + i)
      // operator contract: right unique per (key, ts) — keep max payload id
      val rightRows = rightRaw.zipWithIndex
        .map { case ((k, t), id) => (k, new Timestamp(t * 1000), id.toLong) }
        .groupBy { case (k, t, _) => (k, t) }
        .map { case ((k, t), grp) => (k, t, grp.map(_._3).max) }.toSeq

      import spark.implicits._
      val left = leftRows.toDF("event_id", "user_id", "ts")
      val right = rightRows.toDF("user_id", "ts", "view_id")

      val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap

      val expected = leftRows.map { case (id, k, t) =>
        val candidates = rightRows.filter { case (rk, rt, _) =>
          rk == k && !rt.after(t)
        }
        val best = candidates.sortBy { case (_, rt, _) => rt.getTime }.lastOption
        id -> best.map(_._3)
      }.toMap

      assert(got == expected, s"world $i")
    }
  }

  test("asOfSliced equals asOf on generated skew (one hot key) at several slice widths") {
    (1 to 3).foreach { i =>
      // hot key 1: 150 left + 120 right rows; keys 2..5 sparse — the
      // pathological shape the slicing exists for
      val hotLeft = sample(Gen.listOfN(150, tsGen), 500L + i).map(t => (1L, t))
      val coldLeft = sample(Gen.listOfN(20, Gen.zip(Gen.choose(2L, 5L), tsGen)), 600L + i)
      val leftRows = (hotLeft ++ coldLeft).zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, new Timestamp(t * 1000)) }
      val hotRight = sample(Gen.listOfN(120, tsGen), 700L + i).map(t => (1L, t))
      val coldRight = sample(Gen.listOfN(15, Gen.zip(Gen.choose(2L, 5L), tsGen)), 800L + i)
      val rightRows = (hotRight ++ coldRight).zipWithIndex
        .map { case ((k, t), id) => (k, new Timestamp(t * 1000), id.toLong) }
        .groupBy { case (k, t, _) => (k, t) }
        .map { case ((k, t), grp) => (k, t, grp.map(_._3).max) }.toSeq

      import spark.implicits._
      val left = leftRows.toDF("event_id", "user_id", "ts")
      val right = rightRows.toDF("user_id", "ts", "view_id")

      val reference = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
        .collect().map(_.toString).sorted.toSeq
      // widths spanning sub-second slices (every row its own slice), mid,
      // and one slice swallowing the whole range (degenerates to asOf)
      Seq(500L, 60L * 1000, 100L * 3600 * 1000).foreach { w =>
        val sliced = AsOfJoin.asOfSliced(left, right, Seq("user_id"), "ts", sliceWidthMs = w)
          .collect().map(_.toString).sorted.toSeq
        assert(sliced == reference, s"world $i width $w")
      }
    }
  }

  // ---- range join ----------------------------------------------------------

  test("pointInInterval equals the brute-force theta filter on random worlds") {
    (1 to 5).foreach { i =>
      val pts = sample(Gen.listOfN(50, Gen.choose(-100L, 400L)), 300L + i)
        .zipWithIndex.map { case (v, id) => (id.toLong, v) }
      val ivs = sample(Gen.listOfN(30, Gen.zip(Gen.choose(-120L, 380L), Gen.choose(-10L, 90L))), 400L + i)
        .zipWithIndex.map { case ((lo, span), id) => (id.toLong, lo, lo + span) } // may be empty/inverted

      import spark.implicits._
      val points = pts.toDF("pid", "v")
      val intervals = ivs.toDF("iid", "lo", "hi")

      val chunk = Seq(1L, 7L, 64L)(i % 3) // result must not depend on width
      val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", chunk)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val expected = (for {
        (pid, v) <- pts
        (iid, lo, hi) <- ivs
        if lo <= v && v < hi
      } yield (pid, iid)).toSet

      assert(got == expected, s"world $i chunk $chunk")
    }
  }
}
