package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.SparkSpec

/** Specs for the round-7 trend tier: conformal band, Theil–Sen, exact
  * dyadic decay, seasonal two-regressor OLS.
  */
class TrendRobustSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** n copies of an hourly timestamp — a synthetic count series. */
  private def series(counts: Seq[(String, Int)]) =
    df("ts TIMESTAMP", counts.flatMap { case (h, n) => Seq.fill(n)(Row(ts(h))) })

  test("theilSenTrend: exact slope on a clean line, immune to one outlier hour") {
    // counts 10, 12, 14, 16 → every pairwise slope = 2_000_000 ppm
    val clean = series(Seq(
      "2024-01-01 00:00:00" -> 10, "2024-01-01 01:00:00" -> 12,
      "2024-01-01 02:00:00" -> 14, "2024-01-01 03:00:00" -> 16))
    val r = TimeSeries.theilSenTrend(clean, "ts").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L) // n_hours, n_pairs
    assert(r.getLong(2) == 2000000L) // slope_ppm
    assert(r.getLong(3) == 10000000L) // intercept at t=0 (low median of exact 10e6)
    // one spiked hour: OLS slope moves, Theil–Sen's median slope survives
    val spiked = series(Seq(
      "2024-01-01 00:00:00" -> 10, "2024-01-01 01:00:00" -> 12,
      "2024-01-01 02:00:00" -> 140, "2024-01-01 03:00:00" -> 16))
    val rs = TimeSeries.theilSenTrend(spiked, "ts").head()
    assert(rs.getLong(2) == 2000000L, "median slope must shrug off one outlier")
    val ols = TimeSeries.trendFit(spiked, "ts").head()
    assert(ols.getLong(1) != 2000000L, "OLS slope must move under the outlier")
  }

  test("conformalTrendInterval: qhat is the ceil-rank residual and coverage reads back") {
    // 10 hours, constant 5 → slope 0, intercept 5e6, all residuals 0
    val const = series((0 until 10).map(h => f"2024-01-01 $h%02d:00:00" -> 5))
    val r = TimeSeries.conformalTrendInterval(const, "ts", alphaPpm = 100000L).head()
    assert(r.getLong(0) == 10L) // n_hours
    assert(r.getLong(1) == 0L && r.getLong(2) == 5000000L)
    assert(r.getLong(3) == 10L) // cal_rank = min(ceil(0.9*11), 10) = 10
    assert(r.getLong(4) == 0L) // qhat
    assert(r.getLong(5) == 1000000L) // full coverage
  }

  test("conformalTrendInterval: an outlier hour widens qhat but stays covered at its rank") {
    val counts = (0 until 9).map(h => f"2024-01-01 $h%02d:00:00" -> 5) :+
      ("2024-01-01 09:00:00" -> 50)
    val r = TimeSeries.conformalTrendInterval(series(counts), "ts",
      alphaPpm = 200000L).head()
    // cal_rank = min(ceil(0.8*11), 10) = 9 of 10 → the spike's residual is
    // EXCLUDED from the band; 9/10 hours covered
    assert(r.getLong(3) == 9L)
    assert(r.getLong(5) == 900000L)
  }

  test("conformalTrendIntervalByKey: per-key bands; a constant key reads qhat 0 beside a spiked one") {
    // key a: constant 5 over 10 hours → residuals 0 → qhat 0, cover 1e6.
    // key b: constant 5 with one doubled hour → nonzero qhat at rank 9.
    val rows10 = (0 until 10).flatMap { h =>
      val base = Seq.fill(5)(("a", f"2024-01-01 $h%02d:00:00")) ++
        Seq.fill(if (h == 9) 10 else 5)(("b", f"2024-01-01 $h%02d:00:00"))
      base
    }
    val ev = df("event_type STRING, ts TIMESTAMP",
      rows10.map { case (k, t) => Row(k, ts(t)) })
    val out = TimeSeries.conformalTrendIntervalByKey(ev, "ts", "event_type",
      alphaPpm = 200000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((0L, 1000000L)))
    // key b: cal_rank = min(ceil(0.8·11), 10) = 9 of 10 → the spike hour is
    // outside the band, 9/10 covered
    assert(out("b")._2 == 900000L && out("b")._1 > 0L)
  }

  test("decayedCountByKey: exact dyadic weights, halfLife buckets, floor shift") {
    val ev = df("k STRING, ts TIMESTAMP", Seq(
      Row("a", ts("2024-01-03 00:00:00")), // age 0 → weight 1
      Row("a", ts("2024-01-02 00:00:00")), // age 24h → 1/2
      Row("a", ts("2024-01-02 00:30:00")), // same HOUR bucket as above → 1/2
      Row("b", ts("2024-01-01 00:00:00")) // age 48h → 1/4
    ))
    val out = TimeSeries.decayedCountByKey(ev, "ts", "k",
      halfLifeHours = 24, maxShift = 40)
    assert(rowSet(out) == rows(
      Seq("a", "3", "2000000"), // 1 + 1/2 + 1/2
      Seq("b", "1", "250000"))) // 1/4
  }

  test("decayedCountByKey: ages beyond maxShift*halfLife floor at 2^-maxShift") {
    val ev = df("k STRING, ts TIMESTAMP", Seq(
      Row("old", ts("2024-01-01 00:00:00")),
      Row("new", ts("2024-12-01 00:00:00"))))
    val out = TimeSeries.decayedCountByKey(ev, "ts", "k",
      halfLifeHours = 1, maxShift = 4)
    assert(rowSet(out) == rows(
      Seq("new", "1", "1000000"),
      Seq("old", "1", "62500"))) // floored at 2^-4
  }

  test("trendFitSeasonal: recovers slope and weekend shift exactly on a planted model") {
    // 2024-01-01 is a Monday. Plant c = 100 + 3t + 40·weekend over 14 days
    // of 6-hour samples? Use hourly over 14 days (336 hours) — keyspace-small.
    val counts = (0 until 336).map { t =>
      val day = t / 24 // 0 = Monday
      val wknd = if (day % 7 >= 5) 40 else 0
      (f"2024-01-${1 + t / 24}%02d ${t % 24}%02d:00:00", 100 + 3 * t + wknd)
    }
    val r = TimeSeries.trendFitSeasonal(series(counts), "ts").head()
    assert(r.getLong(0) == 336L)
    assert(r.getLong(1) == 96L) // 4 weekend days × 24h... (2 weekends in 14 days)
    assert(r.getLong(2) == 3000000L) // slope_ppm exact
    assert(r.getLong(3) == 40000000L) // weekend_ppm exact
    assert(r.getLong(4) == 100000000L) // intercept_ppm exact
  }

  test("trendFitSeasonal: degenerate all-weekday grid yields NULL estimates, not a wrong line") {
    // Mon 00:00 .. Fri 23:00 of 2024-01-01 week — zero weekend hours
    val counts = (0 until 120).map { t =>
      (f"2024-01-${1 + t / 24}%02d ${t % 24}%02d:00:00", 10 + t)
    }
    val r = TimeSeries.trendFitSeasonal(series(counts), "ts").head()
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
