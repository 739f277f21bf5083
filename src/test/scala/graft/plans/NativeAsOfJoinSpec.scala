package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin

class NativeAsOfJoinSpec extends SparkSpec {

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
    val out = NativeAsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      1L -> Some(101L), // equal-ts right row matches (inclusive)
      2L -> Some(102L),
      3L -> None,       // left row earlier than all right rows
      4L -> Some(200L), // keys don't leak across groups
      5L -> None))      // key absent from right entirely
  }

  test("same column contract as the composed asOf (names, payload ts)") {
    val (left, right) = frames
    val out = NativeAsOfJoin.asOf(left, right, Seq("user_id"), "ts")
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "asof_ts", "asof_view_id"))
    val r2 = out.filter(col("event_id") === 2).head()
    assert(r2.getTimestamp(3) == ts("2024-01-01 10:45:00"))
  }

  test("null-ts and null-key right rows never match; null-key left rows survive unmatched") {
    import spark.implicits._
    val left = Seq(
      (1L, Option.empty[java.lang.Long], ts("2024-01-01 11:00:00")),
      (2L, Option(java.lang.Long.valueOf(10L)), ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option.empty[java.lang.Long], ts("2024-01-01 10:00:00"), 99L),
      (Option(java.lang.Long.valueOf(10L)), ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "view_id")
    val out = NativeAsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(100L)))
  }

  test("both-sides-derived-from-one-source (overlapping attribute ids) resolves cleanly") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "click"),
      (2L, 10L, ts("2024-01-01 09:30:00"), "view"),
      (3L, 10L, ts("2024-01-01 11:00:00"), "click"),
      (4L, 10L, ts("2024-01-01 10:30:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val clicks = events.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
    val out = NativeAsOfJoin.asOf(clicks, views, Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 2L, 3L -> 4L))
  }

  test("plan: AsOfJoinExec node, children co-partitioned and sorted — no join/window fallback") {
    val (left, right) = frames
    val plan = NativeAsOfJoin.asOf(left, right, Seq("user_id"), "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"unexpected fallback operator in:\n$plan")
  }

  test("equivalence with the composed asOf on random keyed series (many partitions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (1 to 400).map { i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, new Timestamp(base + rnd.nextInt(500000) * 1000L))
    }.toDF("event_id", "user_id", "ts")
    val right = (1 to 300).map { i =>
      ((rnd.nextInt(10) + 1).toLong, new Timestamp(base + rnd.nextInt(500000) * 1000L), i.toLong)
    }.toDF("user_id", "ts", "view_id")
      // contract: right unique per (key, ts)
      .groupBy("user_id", "ts").agg(max("view_id").as("view_id"))
    val expect = AsOfJoin.asOf(left, right, Seq("user_id"), "ts")
    val got = NativeAsOfJoin.asOf(left, right, Seq("user_id"), "ts")
    assertSameRows(expect, got)
  }

  test("bucketed+sorted sources satisfy the children's distribution — zero exchanges") {
    import spark.implicits._
    val (left, right) = frames
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    try {
      // one file per bucket (coalesce(1)) so the scan also reports the
      // sortBy ordering; 4 buckets on the join key on BOTH sides
      left.coalesce(1).write.bucketBy(4, "user_id").sortBy("user_id", "ts")
        .option("path", s"$tmp/clicks").saveAsTable("asof_clicks_b")
      right.coalesce(1).write.bucketBy(4, "user_id").sortBy("user_id", "ts")
        .option("path", s"$tmp/views").saveAsTable("asof_views_b")
      val out = NativeAsOfJoin.asOf(
        spark.table("asof_clicks_b"), spark.table("asof_views_b"), Seq("user_id"), "ts")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed sources must elide the shuffle entirely:\n$plan")
      // and the answer is still the oracle answer
      val got = out.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      assert(got == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None,
        4L -> Some(200L), 5L -> None))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_clicks_b")
      spark.sql("DROP TABLE IF EXISTS asof_views_b")
    }
  }

  test("missing columns and type mismatches fail up front with clear messages") {
    val (left, right) = frames
    val e1 = intercept[IllegalArgumentException] {
      NativeAsOfJoin.asOf(left, right, Seq("nope"), "ts")
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      NativeAsOfJoin.asOf(left.withColumn("asof_view_id", lit(1)), right, Seq("user_id"), "ts")
    }
    assert(e2.getMessage.contains("collide"))
  }
}
