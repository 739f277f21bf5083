package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def frames = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 10:30:00")), // other key
      (5L, 30L, ts("2024-01-01 10:30:00"))  // key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100L),
      (10L, ts("2024-01-01 10:00:00"), 101L), // equal ts → inclusive match
      (10L, ts("2024-01-01 10:45:00"), 102L),
      (20L, ts("2024-01-01 10:00:00"), 200L)
    ).toDF("user_id", "ts", "view_id")
    (left, right)
  }

  test("latest right row at-or-before each left row, per key; left-outer") {
    val (left, right) = frames
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      1L -> Some(101L), // equal-ts right row matches (inclusive)
      2L -> Some(102L),
      3L -> None,       // left row earlier than all right rows
      4L -> Some(200L), // keys don't leak across groups
      5L -> None))      // key absent from right entirely
  }

  test("payload ts travels with the match; output keeps all left columns") {
    val (left, right) = frames
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "asof_ts", "asof_view_id"))
    val r2 = out.filter(col("event_id") === 2).head()
    assert(r2.getTimestamp(3) == ts("2024-01-01 10:45:00"))
  }

  test("null-ts right rows never match (would otherwise sort first and leak)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option.empty[Timestamp], 99L),
      (10L, Option(ts("2024-01-01 10:00:00")), 100L))
      .toDF("user_id", "ts", "view_id")
    val r = AsOfJoin.asOf(left, right, Seq("user_id"), "ts").head()
    assert(r.isNullAt(3) && r.isNullAt(4)) // 09:00 click has NO earlier view
  }

  test("null-KEY right rows never match (partitionBy groups nulls; equi-join semantics don't)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[java.lang.Long], ts("2024-01-01 11:00:00")),
      (2L, Option(java.lang.Long.valueOf(10L)), ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option.empty[java.lang.Long], ts("2024-01-01 10:00:00"), 99L),
      (Option(java.lang.Long.valueOf(10L)), ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "view_id")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // the null-key left row must NOT pick up the null-key right row
    assert(out == Map(1L -> None, 2L -> Some(100L)))
  }

  test("reserved internal names and output-prefix collisions are rejected up front") {
    import spark.implicits._
    val (left, right) = frames
    val badLeft = left.withColumn("__side", lit(1))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right, Seq("user_id"), "ts")
    }
    val clashLeft = left.withColumn("asof_view_id", lit(1))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(clashLeft, right, Seq("user_id"), "ts")
    }
  }

  test("plan: one shuffle on the key, no join node (no range cross product)") {
    val (left, right) = frames
    val plan = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node in:\n$plan")
    assert(plan.contains("Window"), s"expected window scan in:\n$plan")
  }

  test("asOfForward: earliest right row at-or-after, inclusive ties, left-outer") {
    val (left, right) = frames
    val out = AsOfJoin.asOfForward(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      1L -> Some(101L), // equal-ts right row matches (inclusive)
      2L -> None,       // 11:00 is after every right row for user 10
      3L -> Some(100L), // next view after 09:00 is 09:30
      4L -> None,       // user 20's only view (10:00) precedes 10:30
      5L -> None))
  }

  test("asOfNearest: closest side wins, exact ties go backward, one-sided fallbacks") {
    import spark.implicits._
    val (_, right) = frames
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // tie at lag 0 → (same) backward
      (2L, 10L, ts("2024-01-01 11:00:00")), // nothing forward → backward 102
      (3L, 10L, ts("2024-01-01 09:00:00")), // nothing backward → forward 100
      (6L, 10L, ts("2024-01-01 10:40:00")), // back 10:00 (40m) vs fwd 10:45 (5m) → forward
      (7L, 10L, ts("2024-01-01 10:22:30")), // back 10:00 ≡ fwd 10:45 (22.5m) → backward
      (5L, 30L, ts("2024-01-01 10:30:00"))) // no right rows at all
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfNearest(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      1L -> Some(101L), 2L -> Some(102L), 3L -> Some(100L),
      6L -> Some(102L), 7L -> Some(101L), 5L -> None))
  }

  test("asOfTolerance: stale matches null out, fresh and unmatched unchanged") {
    val (left, right) = frames
    // event 1 matches at lag 0 (fresh at any tolerance); event 2 matches
    // 10:45 at lag 15 min — stale under a 10-minute bound
    val out = AsOfJoin.asOfTolerance(left, right, Seq("user_id"), "ts",
      toleranceUs = 600L * 1000000)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      1L -> Some(101L), 2L -> None, 3L -> None,
      4L -> None, // user 20: 30-minute-old match nulled
      5L -> None))
    // matched ts nulls together with the payload
    val row2 = AsOfJoin.asOfTolerance(left, right, Seq("user_id"), "ts",
      toleranceUs = 600L * 1000000)
      .filter(col("event_id") === 2L).collect()(0)
    assert(row2.isNullAt(3) && row2.isNullAt(4))
  }
}
