package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.SparkSpec

class SessionWindowSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionWindows: gap ≤ 30min merges (inclusive boundary), gap > 30min splits") {
    // pins Spark's merge rule — a window starting exactly at the previous
    // window's end STILL merges (verified behavior; the q189 oracle's
    // gaps-and-islands condition must therefore be STRICTLY greater-than)
    val events = df("user_id BIGINT, ts TIMESTAMP, event_type STRING", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "view"),
      Row(1L, ts("2024-01-01 10:29:59"), "click"),   // merges (gap 29:59)
      Row(1L, ts("2024-01-01 10:59:59"), "click"),   // merges (gap exactly 30:00 → still merges)
      Row(1L, ts("2024-01-01 11:30:00"), "purchase"),// gap 30:01 → NEW session
      Row(2L, ts("2024-01-01 09:00:00"), "view")))
    val out = Funnel.sessionWindows(events, gap = "30 minutes")
    assert(rowSet(out) == rows(
      Seq("1", "2024-01-01 10:00:00.0", "2024-01-01 11:29:59.0", "3", "2"),
      Seq("1", "2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", "1", "1"),
      Seq("2", "2024-01-01 09:00:00.0", "2024-01-01 09:30:00.0", "1", "1")))
  }

  test("sessionWindows: session_end is always last event + gap") {
    val events = df("user_id BIGINT, ts TIMESTAMP, event_type STRING", Seq(
      Row(5L, ts("2024-03-01 00:00:00"), "a")))
    val out = Funnel.sessionWindows(events, gap = "10 minutes").collect().head
    assert(out.getTimestamp(1) == ts("2024-03-01 00:00:00"))
    assert(out.getTimestamp(2) == ts("2024-03-01 00:10:00"))
  }

  test("cross-validation: native session_window ≡ the stateful sessionize on random traffic") {
    // both operators claim the same semantics (strict-> gap split,
    // inclusive boundary merge) — pin them AGAINST EACH OTHER on seeded
    // random traffic, where any boundary or merge divergence surfaces
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = ts("2024-05-01 00:00:00").getTime
    val events = (1 to 400).map { i =>
      graft.streaming.Streams.Event(
        i.toLong, new java.sql.Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
        1L + rnd.nextInt(5), if (rnd.nextBoolean()) "view" else "click", 1.0)
    }
    val allNative = Funnel.sessionWindows(events.toDF(), gap = "30 minutes")
      .select(col("user_id"), col("session_start"),
        expr("session_end - interval 30 minutes").as("last_ts"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    // sessionize (no timeout) emits a session only when a LATER event
    // closes it — each user's final session stays open and unemitted in a
    // batch run, so the comparable set is every non-final session
    val lastStart = allNative.groupBy(_._1).view.mapValues(_.map(_._2.getTime).max).toMap
    val native = allNative.filter { case (u, st, _, _) => st.getTime < lastStart(u) }.toSet
    val stateful = graft.streaming.Streams
      .sessionize(events.toDS(), idleTimeout = false)
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events.toLong))
      .toSet
    assert(native.nonEmpty, "seeded traffic must produce at least one closed session")
    assert(native == stateful,
      "declarative session_window and custom-state sessionize must agree on every CLOSED session")
  }
}
