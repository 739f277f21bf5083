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
}
