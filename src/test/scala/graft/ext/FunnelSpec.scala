package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = df(
    "user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
    Seq(
      // user 1: full strict path
      Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
      Row(1L, 2L, "click", ts("2024-01-01 00:05:00")),
      Row(1L, 3L, "purchase", ts("2024-01-01 00:10:00")),
      // user 2: purchase BEFORE click → stops at click
      Row(2L, 4L, "view", ts("2024-01-01 00:00:00")),
      Row(2L, 5L, "purchase", ts("2024-01-01 00:01:00")),
      Row(2L, 6L, "click", ts("2024-01-01 00:02:00")),
      // user 3: click only, never viewed → not even stage 0
      Row(3L, 7L, "click", ts("2024-01-01 00:00:00")),
      // user 4: view only
      Row(4L, 8L, "view", ts("2024-01-01 00:00:00"))))

  test("funnel: strict ordering — events before the prior stage don't convert") {
    val out = Funnel.funnel(events, Seq("view", "click", "purchase"))
    assert(out.columns.toSeq == Seq("stage", "event_type", "users"))
    assert(rowSet(out) == rows(
      Seq("0", "view", "3"), // users 1, 2, 4
      Seq("1", "click", "2"), // users 1, 2 (user 2's click is after the view)
      Seq("2", "purchase", "1"))) // only user 1 purchased after clicking
  }

  test("funnel: same-timestamp event does NOT count (strictly after)") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "click", ts("2024-01-01 00:00:00")))) // simultaneous
    val out = Funnel.funnel(ev, Seq("view", "click"))
    assert(rowSet(out) == rows(Seq("0", "view", "1"), Seq("1", "click", "0")))
  }

  test("funnelUsers: per-user depth and first/deepest stage times") {
    val out = Funnel.funnelUsers(events, Seq("view", "click", "purchase"))
    assert(out.columns.toSeq == Seq("user_id", "depth", "t_first", "t_last"))
    assert(rowSet(out) == rows(
      Seq("1", "2", "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0"),
      Seq("2", "1", "2024-01-01 00:00:00.0", "2024-01-01 00:02:00.0"),
      Seq("4", "0", "2024-01-01 00:00:00.0", "2024-01-01 00:00:00.0")))
  }

  test("transitionCounts: per-user consecutive steps, (types)^2 aggregate") {
    val out = Funnel.transitionCounts(events)
    assert(out.columns.toSeq == Seq("from_type", "to_type", "n", "p"))
    // user 1: view→click, click→purchase; user 2: view→purchase,
    // purchase→click; users 3/4: single events, no step
    assert(rowSet(out.select("from_type", "to_type", "n")) == rows(
      Seq("view", "click", "1"),
      Seq("view", "purchase", "1"),
      Seq("click", "purchase", "1"),
      Seq("purchase", "click", "1")))
    // conditional probabilities: view fans 50/50, the rest are certain
    val p = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(p(("view", "click")) == 0.5 && p(("view", "purchase")) == 0.5)
    assert(p(("click", "purchase")) == 1.0 && p(("purchase", "click")) == 1.0)
  }

  test("transitionCounts: simultaneous events ordered by the event_id tie-break") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 2L, "click", ts("2024-01-01 00:00:00")),
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")), // same ts, lower id first
        Row(1L, 3L, "purchase", ts("2024-01-01 00:00:01"))))
    assert(rowSet(Funnel.transitionCounts(ev).select("from_type", "to_type", "n"))
      == rows(Seq("view", "click", "1"), Seq("click", "purchase", "1")))
  }

  test("retentionCohorts: hand-traced matrix; same-day repeats collapse; offset-0 equals cohort size") {
    // u1 first on Jan 1 (active 1, 2, 4 — twice on day 1), u2 only Jan 1,
    // u3 first on Jan 2 (active 2, 3)
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 1L, "view", ts("2024-01-01 08:00:00")),
        Row(1L, 2L, "click", ts("2024-01-01 09:00:00")), // same day → 1 active row
        Row(1L, 3L, "view", ts("2024-01-02 08:00:00")),
        Row(1L, 4L, "view", ts("2024-01-04 08:00:00")),
        Row(2L, 5L, "view", ts("2024-01-01 12:00:00")),
        Row(3L, 6L, "view", ts("2024-01-02 12:00:00")),
        Row(3L, 7L, "view", ts("2024-01-03 12:00:00"))))
    val out = Funnel.retentionCohorts(ev)
    assert(rowSet(out) == rows(
      Seq("2024-01-01", "0", "2", "2", "1.0"),
      Seq("2024-01-01", "1", "1", "2", "0.5"),
      Seq("2024-01-01", "3", "1", "2", "0.5"),
      Seq("2024-01-02", "0", "1", "1", "1.0"),
      Seq("2024-01-02", "1", "1", "1", "1.0")))
    // offset-0 self-consistency on the fixture above: active_n == cohort_n
    val zero = out.filter("day_offset = 0 AND active_n <> cohort_n")
    assert(zero.count() == 0)
  }

  test("lastTouchAttribution: most recent in-horizon touch credited; out-of-horizon and touchless → none") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE",
      Seq(
        // u1: view then click then buy → click (most recent touch) credited
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00"), 0.0),
        Row(1L, 2L, "click", ts("2024-01-01 00:10:00"), 0.0),
        Row(1L, 3L, "purchase", ts("2024-01-01 00:20:00"), 5.0),
        // u2: touch 50 min before the buy — outside the 30-min horizon
        Row(2L, 4L, "view", ts("2024-01-01 00:00:00"), 0.0),
        Row(2L, 5L, "purchase", ts("2024-01-01 00:50:00"), 3.0),
        // u3: no touch at all
        Row(3L, 6L, "purchase", ts("2024-01-01 00:05:00"), 2.0),
        // u4: exactly AT the horizon boundary — still credited (≤, not <)
        Row(4L, 7L, "click", ts("2024-01-01 00:00:00"), 0.0),
        Row(4L, 8L, "purchase", ts("2024-01-01 00:30:00"), 7.0),
        // u5: an error event between click and buy must not steal credit
        Row(5L, 9L, "click", ts("2024-01-01 00:00:00"), 0.0),
        Row(5L, 10L, "error", ts("2024-01-01 00:01:00"), 0.0),
        Row(5L, 11L, "purchase", ts("2024-01-01 00:02:00"), 1.0)))
    val out = Funnel.lastTouchAttribution(ev)
    assert(out.columns.toSeq == Seq("credit", "n_conversions", "revenue_cents"))
    assert(rowSet(out) == rows(
      Seq("click", "3", "1300"), // u1 500 + u4 700 + u5 100
      Seq("none", "2", "500")))  // u2 300 + u3 200
  }

  test("armConversionTest: arms partition users, exact ppm rates, verdict matches a BigInt recompute") {
    val ev = df("user_id BIGINT, event_type STRING",
      (1L to 40L).map(u => Row(u, "view")) ++ (1L to 10L).map(u => Row(u, "purchase")))
    val r = Funnel.armConversionTest(ev).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == 40L && ca + cb == 10L)
    assert(r.getLong(4) == ca * 1000000L / na)
    assert(r.getLong(5) == cb * 1000000L / nb)
    val (zn, zd) = (BigInt(196), BigInt(100))
    val diff = BigInt(ca) * nb - BigInt(cb) * na
    val n = BigInt(na) + nb
    val c = BigInt(ca) + cb
    val want = diff * diff * n * zd * zd > zn * zn * c * (n - c) * BigInt(na) * nb
    assert(r.getBoolean(6) == want)
  }

  test("linearAttribution: equal integer split, remainder to the earliest touch, cents conserved") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE",
      Seq(
        // u1: two touches share 101 cents → view (earliest) 51, click 50
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00"), 0.0),
        Row(1L, 2L, "click", ts("2024-01-01 00:10:00"), 0.0),
        Row(1L, 3L, "purchase", ts("2024-01-01 00:20:00"), 1.01),
        // u2: touch outside the horizon → none keeps the full 300
        Row(2L, 4L, "view", ts("2024-01-01 00:00:00"), 0.0),
        Row(2L, 5L, "purchase", ts("2024-01-01 00:50:00"), 3.0),
        // u3: touchless conversion → none
        Row(3L, 6L, "purchase", ts("2024-01-01 00:05:00"), 2.0)))
    val out = Funnel.linearAttribution(ev)
    assert(rowSet(out) == rows(
      Seq("view", "1", "51"),
      Seq("click", "1", "50"),
      Seq("none", "2", "500")))
    // conservation: credited + none = total conversion cents
    val total = out.collect().map(_.getLong(2)).sum
    assert(total == 101L + 300L + 200L)
  }

  test("dwellTimes: hand-traced integer-µs totals; last event per user contributes nothing") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // u1: view (60s) → click (90s) → purchase (open)
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "click", ts("2024-01-01 00:01:00")),
        Row(1L, 3L, "purchase", ts("2024-01-01 00:02:30")),
        // u2: view (30s) → view (open) — dwell attributed to the FIRST view
        Row(2L, 4L, "view", ts("2024-01-01 00:00:00")),
        Row(2L, 5L, "view", ts("2024-01-01 00:00:30")),
        // u3: a single event — no intervals at all
        Row(3L, 6L, "click", ts("2024-01-01 00:00:00"))))
    val out = Funnel.dwellTimes(ev)
    assert(out.columns.toSeq ==
      Seq("event_type", "n_intervals", "total_dwell_us", "mean_dwell_us"))
    assert(rowSet(out) == rows(
      Seq("view", "2", "90000000", "45000000"), // 60s + 30s over 2 intervals
      Seq("click", "1", "90000000", "90000000"))) // u1's click → purchase
  }

  test("dwellTimes: simultaneous events are ordered by event id (zero dwell, not ambiguity)") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 2L, "click", ts("2024-01-01 00:00:00")), // same ts: id 1 before id 2
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 3L, "purchase", ts("2024-01-01 00:00:10"))))
    assert(rowSet(Funnel.dwellTimes(ev)) == rows(
      Seq("view", "1", "0", "0"),
      Seq("click", "1", "10000000", "10000000")))
  }

  test("conversionLagHistogram: strict-chain lag bucketed in hours; incomplete users absent") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // u1 completes in 90 min → bucket 1
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "click", ts("2024-01-01 00:30:00")),
        Row(1L, 3L, "purchase", ts("2024-01-01 01:30:00")),
        // u2 completes in 30 min → bucket 0
        Row(2L, 4L, "view", ts("2024-01-01 00:00:00")),
        Row(2L, 5L, "click", ts("2024-01-01 00:10:00")),
        Row(2L, 6L, "purchase", ts("2024-01-01 00:30:00")),
        // u3 purchase BEFORE click → never completes the strict chain
        Row(3L, 7L, "view", ts("2024-01-01 00:00:00")),
        Row(3L, 8L, "purchase", ts("2024-01-01 00:05:00")),
        Row(3L, 9L, "click", ts("2024-01-01 00:10:00"))))
    val out = Funnel.conversionLagHistogram(ev, Seq("view", "click", "purchase"))
    assert(out.columns.toSeq == Seq("lag_hours", "users"))
    assert(rowSet(out) == rows(Seq("0", "1"), Seq("1", "1")))
  }

  test("sessionPaths: idle gap splits sessions, prefix caps the path, counts rank") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // u1 session 1: view>click; then a 31-min silence → session 2: view
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "click", ts("2024-01-01 00:05:00")),
        Row(1L, 3L, "view", ts("2024-01-01 00:36:00")),
        // u2 one session: view>click (29-min gap stays inside)
        Row(2L, 4L, "view", ts("2024-01-01 00:00:00")),
        Row(2L, 5L, "click", ts("2024-01-01 00:29:00")),
        // u3 one long session: prefix caps at maxLen=2 → view>view
        Row(3L, 6L, "view", ts("2024-01-01 00:00:00")),
        Row(3L, 7L, "view", ts("2024-01-01 00:10:00")),
        Row(3L, 8L, "purchase", ts("2024-01-01 00:20:00"))))
    val out = Funnel.sessionPaths(ev, maxLen = 2, k = 10)
    assert(out.columns.toSeq == Seq("path", "sessions"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("view>click", 2L), ("view", 1L), ("view>view", 1L)))
  }

  test("sessionPaths: simultaneous events order by event id inside the path") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 2L, "click", ts("2024-01-01 00:00:00")),
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00"))))
    assert(rowSet(Funnel.sessionPaths(ev)) == rows(Seq("view>click", "1")))
  }

  test("sessionNgrams: windows, occurrence vs session support, short sessions excluded") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // u1 one session: a b a b → bigrams a>b, b>a, a>b (a>b occurs 2×,
        // but supports 1 session)
        Row(1L, 1L, "a", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "b", ts("2024-01-01 00:01:00")),
        Row(1L, 3L, "a", ts("2024-01-01 00:02:00")),
        Row(1L, 4L, "b", ts("2024-01-01 00:03:00")),
        // u2 one session: a b → one bigram a>b (second supporting session)
        Row(2L, 5L, "a", ts("2024-01-01 00:00:00")),
        Row(2L, 6L, "b", ts("2024-01-01 00:00:30")),
        // u3: single event — no bigram at all
        Row(3L, 7L, "a", ts("2024-01-01 00:00:00"))))
    val out = Funnel.sessionNgrams(ev, n = 2, k = 10)
    assert(out.columns.toSeq == Seq("gram", "occurrences", "sessions"))
    assert(out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a>b", 3L, 2L), ("b>a", 1L, 1L)))
  }

  test("sessionNgrams: n larger than every session yields nothing; n=1 counts events") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 1L, "a", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "b", ts("2024-01-01 00:01:00"))))
    assert(Funnel.sessionNgrams(ev, n = 3, k = 10).count() == 0)
    assert(rowSet(Funnel.sessionNgrams(ev, n = 1, k = 10)) == rows(
      Seq("a", "1", "1"), Seq("b", "1", "1")))
  }

  test("sessionPaths: top-k keeps the most common paths with a path tie-break") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(2L, 2L, "view", ts("2024-01-01 00:00:00")),
        Row(3L, 3L, "click", ts("2024-01-01 00:00:00")),
        Row(4L, 4L, "error", ts("2024-01-01 00:00:00"))))
    // k=2: 'view' (2 sessions) then 'click' < 'error' alphabetically
    assert(Funnel.sessionPaths(ev, k = 2).collect()
      .map(_.getString(0)).toSeq == Seq("view", "click"))
  }

  test("rollingActiveUsers: exact trailing-window distinct via contribution fan-out") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP", Seq(
      Row(1L, 1L, "view", ts("2024-01-01 10:00:00")),
      Row(1L, 2L, "click", ts("2024-01-01 12:00:00")), // same user+day dedups
      Row(2L, 3L, "view", ts("2024-01-01 23:59:59")),
      Row(1L, 4L, "view", ts("2024-01-05 00:00:00")),
      Row(3L, 5L, "view", ts("2024-01-10 08:00:00"))))
    val out = Funnel.rollingActiveUsers(ev, windowDays = 3).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out == Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 2L, // u1+u2
      "2024-01-05" -> 1L, "2024-01-06" -> 1L, "2024-01-07" -> 1L, // u1
      "2024-01-10" -> 1L)) // u3; days 11-12 clamped past the stream end
    // no-activity windows (jan 4, 8, 9) are absent, not zero
    assert(!out.contains("2024-01-04") && !out.contains("2024-01-08"))
  }

  test("matchPattern: horizon, negation, pre-start blockers, first-following-end") {
    val hourUs = 3600L * 1000000
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // user 1: view@00 → purchase@10 matches (error@30 is AFTER it);
        //         view@20 → purchase@40 blocked by error@30
        Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
        Row(1L, 2L, "purchase", ts("2024-01-01 00:10:00")),
        Row(1L, 3L, "view", ts("2024-01-01 00:20:00")),
        Row(1L, 4L, "error", ts("2024-01-01 00:30:00")),
        Row(1L, 5L, "purchase", ts("2024-01-01 00:40:00")),
        // user 2: purchase 2h later — outside the horizon
        Row(2L, 6L, "view", ts("2024-01-01 00:00:00")),
        Row(2L, 7L, "purchase", ts("2024-01-01 02:00:00")),
        // user 3: never purchases
        Row(3L, 8L, "view", ts("2024-01-01 00:00:00")),
        // user 4: error BEFORE the view does not block
        Row(4L, 9L, "error", ts("2024-01-01 00:00:00")),
        Row(4L, 10L, "view", ts("2024-01-01 00:01:00")),
        Row(4L, 11L, "purchase", ts("2024-01-01 00:02:00"))))
    val out = Funnel.matchPattern(ev, "view", "purchase", "error", hourUs)
    assert(out.columns.toSeq ==
      Seq("user_id", "start_event_id", "end_event_id", "lag_us"))
    assert(rowSet(out) == rows(
      Seq("1", "1", "2", (600L * 1000000).toString),
      Seq("4", "10", "11", (60L * 1000000).toString)))
  }

  test("matchPattern: same-microsecond end/blocker ties resolve by event id") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP",
      Seq(
        // user 5: error id 13 < purchase id 14 at the same µs → blocked
        Row(5L, 12L, "view", ts("2024-01-01 00:00:00")),
        Row(5L, 13L, "error", ts("2024-01-01 00:00:05")),
        Row(5L, 14L, "purchase", ts("2024-01-01 00:00:05")),
        // user 6: purchase id 16 < error id 17 at the same µs → match
        Row(6L, 15L, "view", ts("2024-01-01 00:00:00")),
        Row(6L, 16L, "purchase", ts("2024-01-01 00:00:05")),
        Row(6L, 17L, "error", ts("2024-01-01 00:00:05"))))
    val out = Funnel.matchPattern(ev, "view", "purchase", "error", 3600L * 1000000)
    assert(rowSet(out) == rows(Seq("6", "15", "16", "5000000")))
  }

  test("srmAudit: BigInt chi-square recompute; hash-correlated cohort trips SRM") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val ev = df("user_id BIGINT", (1L to 400L).map(Row(_)))
    val out = Funnel.srmAudit(ev, families = Seq(360, 362)).collect()
      .map(r => r.getInt(0) -> r).toMap
    // exact recompute per family
    for (j <- Seq(360, 362)) {
      val arms = ev.select(col("user_id"),
          pmod(Dedup.mixHash(col("user_id"), j), lit(2L)).as("arm"))
        .collect().map(_.getLong(1))
      val (na, nb) = (arms.count(_ == 0L).toLong, arms.count(_ == 1L).toLong)
      val r = out(j)
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(r.getLong(3) == (na - nb).abs * 1000000L / (na + nb))
      assert(r.getBoolean(4) ==
        (BigInt(na - nb).pow(2) * 10000 > BigInt(38415) * (na + nb)))
      // a healthy mixHash family must NOT trip SRM on uniform user ids
      assert(!r.getBoolean(4), s"family $j unexpectedly imbalanced")
    }
    // a cohort filtered BY the assignment hash itself (the classic SRM
    // root cause: upstream selection correlated with the bucketing hash)
    // must trip the verdict for that family
    val biased = ev.filter(
      pmod(Dedup.mixHash(col("user_id"), 360), lit(2L)) === 0)
    val trip = Funnel.srmAudit(biased, families = Seq(360)).collect().head
    assert(trip.getLong(2) == 0L && trip.getBoolean(4),
      "all-one-arm cohort must flag SRM")
  }

  test("cupedReadout: BigInt recompute exact; perfect covariate ⇒ ~full variance reduction") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // every user spends v pre-split and exactly 2v post-split: Y = 2X, so
    // θ = 2 exactly, ρ² = 1, and the CUPED-adjusted means of the two arms
    // must coincide (up to floor rounding) even though the raw means differ
    val rowsEv = (1L to 200L).flatMap { u =>
      val v = (u * 37 % 100) + 1
      Seq(Row(u, ts("2024-01-10 00:00:00"), v.toDouble),
          Row(u, ts("2024-01-20 00:00:00"), 2.0 * v))
    }
    val ev = df("user_id BIGINT, ts TIMESTAMP, value DOUBLE", rowsEv)
    val out = Funnel.cupedReadout(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L))

    // exact recompute of the documented floor-division staging
    val armOf = ev.select(col("user_id")).distinct()
      .withColumn("arm", pmod(Dedup.mixHash(col("user_id"), 362), lit(2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val per = (1L to 200L).map { u =>
      val v = (u * 37 % 100) + 1
      (armOf(u), BigInt(v * 100), BigInt(2 * v * 100))
    }
    val n = BigInt(per.size)
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxx = per.map(p => p._2 * p._2).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val syy = per.map(p => p._3 * p._3).sum
    val nn = n * sxy - sx * sy
    val thetaPpm = (nn * 1000000) / (n * sxx - sx * sx)
    assert(thetaPpm == BigInt(2000000), "Y = 2X must give θ_ppm exactly 2e6")
    for (arm <- Seq(0L, 1L)) {
      val mine = per.filter(_._1 == arm)
      val nA = BigInt(mine.size)
      val sxA = mine.map(_._2).sum; val syA = mine.map(_._3).sum
      val dxm = (sxA * 1000000) / nA - (sx * 1000000) / n
      val adj = (syA * 1000000) / nA - (thetaPpm * dxm) / 1000000
      val r = out(arm)
      assert(r.getLong(1) == nA.toLong && r.getLong(2) == (syA / nA).toLong)
      assert(r.getLong(3) == adj.toLong, s"arm $arm adjusted mean")
      assert(r.getLong(4) == thetaPpm.toLong)
      assert((thetaPpm * nn) / (n * syy - sy * sy) == BigInt(r.getLong(5)))
      assert(r.getLong(5) >= 999000L, "perfect covariate ⇒ varred ~1e6 ppm")
    }
    // the whole point: adjusted means coincide across arms, raw means don't
    val adjGap = (out(0L).getLong(3) - out(1L).getLong(3)).abs
    val rawGap = (out(0L).getLong(2) - out(1L).getLong(2)).abs
    assert(adjGap <= 10L, s"CUPED should cancel covariate imbalance, gap=$adjGap")
    assert(rawGap * 1000000 > adjGap, "raw means differ, adjusted don't")
  }

  test("markovAttribution: hand-traced two-channel chain") {
    // u1: view→purchase; u2: view→(end); u3: click→view→purchase;
    // u4: click→(end). t_ppm: start→{view,click} 500000 each;
    // click→{view,null} 500000 each; view→{conv 666666, null 333333}.
    // Base P(start) = 499999 ppm (truncation-exact). Remove view →
    // P = 0 (every path dies) → removal 1000000. Remove click →
    // P = 333333 → removal (499999−333333)·10⁶ div 499999 = 333332.
    def u(id: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => Row(id * 100 + i, ts(s"2024-01-01 0${i}:00:00"), id, t)
    }
    val ev = df("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING",
      u(1, Seq("view", "purchase")) ++ u(2, Seq("view")) ++
        u(3, Seq("click", "view", "purchase")) ++ u(4, Seq("click")))
    val out = Funnel.markovAttribution(ev, "purchase", rounds = 12)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "view" -> ((499999L, 0L, 1000000L)),
      "click" -> ((499999L, 333333L, 333332L))))
  }

  test("markovAttribution: events after first conversion are ignored") {
    val ev = df("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING",
      Seq(Row(1L, ts("2024-01-01 01:00:00"), 1L, "view"),
        Row(2L, ts("2024-01-01 02:00:00"), 1L, "purchase"),
        Row(3L, ts("2024-01-01 03:00:00"), 1L, "error"),  // post-conv noise
        Row(4L, ts("2024-01-01 04:00:00"), 1L, "purchase")))
    val out = Funnel.markovAttribution(ev, "purchase", rounds = 8).collect()
    // only channel view exists; the journey converts with certainty
    assert(out.map(_.getString(0)).toSeq == Seq("view"))
    assert(out.head.getLong(1) == 1000000L)  // p_base
    assert(out.head.getLong(3) == 1000000L)  // removing view kills it
  }

  test("diffInDifferences: cells partition the facts and did ties out to the rates") {
    import java.sql.Timestamp
    import org.apache.spark.sql.Row
    def ts(s: String) = Timestamp.valueOf(s)
    // two days of events; the midpoint hour splits them before/after
    val ev = df("user_id BIGINT, event_type STRING, ts TIMESTAMP",
      (1L to 20L).flatMap { u =>
        Seq(
          Row(u, if (u % 4 == 0) "purchase" else "view", ts("2024-01-01 05:00:00")),
          Row(u, if (u % 3 == 0) "purchase" else "view", ts("2024-01-02 05:00:00")))
      })
    val r = Funnel.diffInDifferences(ev).head()
    val (nC0, nC1, nT0, nT1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nC0 + nC1 + nT0 + nT1 == 40L, "cells must partition the facts")
    assert(nC0 == nC1 && nT0 == nT1, "every user appears once per period")
    val did = (r.getLong(7) - r.getLong(6)) - (r.getLong(5) - r.getLong(4))
    assert(r.getLong(8) == did, "did_ppm must tie out to the four rates")
    // layout invariance
    val b = Funnel.diffInDifferences(ev.repartition(7)).head()
    assert(b.getLong(8) == r.getLong(8))
  }
}
