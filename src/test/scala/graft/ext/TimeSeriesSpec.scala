package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = df(
    "event_type STRING, ts TIMESTAMP",
    Seq(
      Row("a", ts("2024-01-01 00:10:00")),
      Row("a", ts("2024-01-01 00:50:00")),
      Row("a", ts("2024-01-01 02:05:00")), // hour 1 is a gap for a
      Row("b", ts("2024-01-01 00:30:00")) // hours 1, 2 are gaps for b
    ))

  test("gapFillHourly: dense keys × hours grid with explicit zero rows") {
    val out = TimeSeries.gapFillHourly(events)
    assert(out.columns.toSeq == Seq("event_type", "hour", "n_events"))
    assert(rowSet(out) == rows(
      Seq("a", "2024-01-01 00:00:00.0", "2"),
      Seq("a", "2024-01-01 01:00:00.0", "0"),
      Seq("a", "2024-01-01 02:00:00.0", "1"),
      Seq("b", "2024-01-01 00:00:00.0", "1"),
      Seq("b", "2024-01-01 01:00:00.0", "0"),
      Seq("b", "2024-01-01 02:00:00.0", "0")))
  }

  test("forwardFillHourly: gap hours carry the last observation; leading gaps stay null") {
    val ev = df("event_type STRING, ts TIMESTAMP, value DOUBLE",
      Seq(
        Row("a", ts("2024-01-01 01:20:00"), 5.0), // a starts at hour 1 → hour-0 row is a leading gap
        Row("a", ts("2024-01-01 01:40:00"), 7.0), // max of hour 1 = 7.0
        Row("a", ts("2024-01-01 03:05:00"), 2.0), // hour 2 is a gap → carries 7.0
        Row("b", ts("2024-01-01 00:15:00"), 1.0)))
    val out = TimeSeries.forwardFillHourly(ev)
    assert(out.columns.toSeq == Seq("event_type", "hour", "v", "v_ff"))
    assert(rowSet(out) == rows(
      Seq("a", "2024-01-01 00:00:00.0", "null", "null"),
      Seq("a", "2024-01-01 01:00:00.0", "7.0", "7.0"),
      Seq("a", "2024-01-01 02:00:00.0", "null", "7.0"),
      Seq("a", "2024-01-01 03:00:00.0", "2.0", "2.0"),
      Seq("b", "2024-01-01 00:00:00.0", "1.0", "1.0"),
      Seq("b", "2024-01-01 01:00:00.0", "null", "1.0"),
      Seq("b", "2024-01-01 02:00:00.0", "null", "1.0"),
      Seq("b", "2024-01-01 03:00:00.0", "null", "1.0")))
  }

  test("gapFillHourly: single-hour corpus → one row per key, no gaps") {
    val one = df("event_type STRING, ts TIMESTAMP",
      Seq(Row("x", ts("2024-06-01 12:00:00")), Row("x", ts("2024-06-01 12:59:59"))))
    val out = TimeSeries.gapFillHourly(one)
    assert(rowSet(out) == rows(Seq("x", "2024-06-01 12:00:00.0", "2")))
  }
}
