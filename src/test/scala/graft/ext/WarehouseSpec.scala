package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.SparkSpec

class WarehouseSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("churnHazard: censoring splits the life table by hand") {
    // corpus ends day 30 (grace 7 → censor cut = day 23):
    //   u1 d0..d10  → dead at t=10      u2 d0..d30  → censored, t=30
    //   u3 d25..d26 → censored, t=5     u4 d0..d5   → dead at t=5
    // life table: t=5 ending {u3,u4} churned 1; t=10 ending {u1} churned 1;
    // t=30 ending {u2} churned 0; at_risk (reverse cum) = 4, 2, 1
    val ev = df("user_id BIGINT, ts TIMESTAMP", Seq(
      Row(1L, ts("2024-03-01 09:00:00")), Row(1L, ts("2024-03-11 09:00:00")),
      Row(2L, ts("2024-03-01 09:00:00")), Row(2L, ts("2024-03-31 09:00:00")),
      Row(3L, ts("2024-03-26 09:00:00")), Row(3L, ts("2024-03-27 09:00:00")),
      Row(4L, ts("2024-03-01 09:00:00")), Row(4L, ts("2024-03-06 09:00:00"))))
    val out = Warehouse.churnHazard(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      5L -> ((4L, 1L, 250000L)),
      10L -> ((2L, 1L, 500000L)),
      30L -> ((1L, 0L, 0L))))
    // twin core: the deduped (u, day) activity relation (what the daily
    // emitter's closed windows carry) reproduces the batch life table
    val activity = ev.select(
      org.apache.spark.sql.functions.col("user_id").as("u"),
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day")).distinct()
    assertSameRows(Warehouse.churnHazard(ev),
      Warehouse.churnHazardFromUserDays(activity))
  }

  test("paretoContribution: exact ppm shares, ROWS cumulative, head flag") {
    // a=50, b=30, c=20: shares 50/30/20%, cum 50/80/100% — head80 = {a, b}
    val t = df("g STRING, v BIGINT", Seq(
      Row("a", 30L), Row("a", 20L), Row("b", 30L), Row("c", 20L)))
    val out = Warehouse.paretoContribution(t, "g", "v", headPpm = 800000)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("a") == ((50L, 500000L, 500000L, true)))
    assert(out("b") == ((30L, 300000L, 800000L, true)))
    assert(out("c") == ((20L, 200000L, 1000000L, false)))
  }

  test("snapshotDiff: classifies insert/delete/update, drops unchanged") {
    val before = df("k BIGINT, status STRING, price DOUBLE", Seq(
      Row(1L, "O", 10.0), // unchanged → dropped
      Row(2L, "O", 20.0), // status flip → update
      Row(3L, "F", 30.0), // gone in after → delete
      Row(4L, "O", null))) // null → value → update
    val after = df("k BIGINT, status STRING, price DOUBLE", Seq(
      Row(1L, "O", 10.0),
      Row(2L, "X", 20.0),
      Row(4L, "O", 40.0),
      Row(5L, "O", 50.0))) // new key → insert
    val out = Warehouse.snapshotDiff(before, after, Seq("k"), Seq("status", "price"))
    assert(out.columns.toSeq ==
      Seq("k", "change", "b_status", "a_status", "b_price", "a_price"))
    assert(rowSet(out) == rows(
      Seq("2", "update", "O", "X", "20.0", "20.0"),
      Seq("3", "delete", "F", "null", "30.0", "null"),
      Seq("4", "update", "O", "O", "null", "40.0"),
      Seq("5", "insert", "null", "O", "null", "50.0")))
  }

  test("mergeAggregates(stored, delta) equals the full recompute") {
    val li = df(
      "l_partkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_shipdate TIMESTAMP",
      Seq(
        Row(1L, 2.0, 100.0, 0.05, ts("1997-03-01 00:00:00")),
        Row(1L, 3.0, 200.0, 0.00, ts("1998-03-01 00:00:00")),
        Row(2L, 1.0, 50.0, 0.10, ts("1998-06-01 00:00:00"))))
    val cut = ts("1998-01-01 00:00:00")
    val merged = Warehouse.mergeAggregates(
      Warehouse.aggState(li.filter(li("l_shipdate") < cut)),
      Warehouse.aggState(li.filter(li("l_shipdate") >= cut)))
    assertSameRows(
      merged.selectExpr("sku", "n", "qty", "cast(revenue as double) as revenue"),
      Warehouse.aggState(li)
        .selectExpr("sku", "n", "qty", "cast(revenue as double) as revenue"))
  }

  test("rollingDailyRevenue: RANGE frame honors calendar gaps") {
    val li = df(
      "l_returnflag STRING, l_shipdate TIMESTAMP, l_extendedprice DOUBLE",
      Seq(
        Row("A", ts("2024-01-01 10:00:00"), 10.0),
        Row("A", ts("2024-01-03 10:00:00"), 20.0), // within 7d of day 1
        Row("A", ts("2024-01-20 10:00:00"), 40.0))) // 17d later → window restarts
    val out = Warehouse.rollingDailyRevenue(li, days = 7)
    assert(rowSet(out) == rows(
      Seq("A", "2024-01-01", "10.0", "10.0"),
      Seq("A", "2024-01-03", "20.0", "30.0"),
      Seq("A", "2024-01-20", "40.0", "40.0")))
  }

  test("scd2Intervals: collapses consecutive duplicates, chains valid_to") {
    val ev = df("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP", Seq(
      Row(1L, 1L, "view", ts("2024-01-01 00:00:00")),
      Row(1L, 2L, "view", ts("2024-01-01 00:05:00")), // dup → collapsed
      Row(1L, 3L, "click", ts("2024-01-01 00:10:00")),
      Row(1L, 4L, "view", ts("2024-01-01 00:20:00")), // back to view → new interval
      Row(2L, 5L, "signup", ts("2024-01-01 01:00:00"))))
    val out = Warehouse.scd2Intervals(ev)
    assert(out.columns.toSeq == Seq("user_id", "event_type", "valid_from", "valid_to"))
    assert(rowSet(out) == rows(
      Seq("1", "view", "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0"),
      Seq("1", "click", "2024-01-01 00:10:00.0", "2024-01-01 00:20:00.0"),
      Seq("1", "view", "2024-01-01 00:20:00.0", "null"),
      Seq("2", "signup", "2024-01-01 01:00:00.0", "null")))
  }

  test("starRevenue: joins the dimension tree, filters region + date window") {
    val region = df("r_regionkey INT, r_name STRING",
      Seq(Row(0, "ASIA"), Row(1, "EUROPE")))
    val nation = df("n_nationkey INT, n_name STRING, n_regionkey INT",
      Seq(Row(10, "JP", 0), Row(11, "DE", 1)))
    val customer = df("c_custkey BIGINT, c_nationkey INT",
      Seq(Row(100L, 10), Row(101L, 11)))
    val orders = df("o_orderkey BIGINT, o_custkey BIGINT, o_orderdate TIMESTAMP", Seq(
      Row(1000L, 100L, ts("1996-06-01 00:00:00")), // in window, ASIA
      Row(1001L, 100L, ts("1995-06-01 00:00:00")), // before window
      Row(1002L, 101L, ts("1996-06-01 00:00:00")))) // EUROPE
    val li = df("l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE", Seq(
      Row(1000L, 100.0, 0.10),
      Row(1000L, 50.0, 0.00),
      Row(1001L, 999.0, 0.00),
      Row(1002L, 999.0, 0.00)))
    val out = Warehouse.starRevenue(li, orders, customer, nation, region,
      "ASIA", "1996-01-01", "1998-01-01")
    assert(rowSet(out) == rows(Seq("JP", "2", "140.0")))
  }

  test("compactionPlan: order-preserving prefix-sum bins, hand-checked") {
    val profile = df("tbl STRING, file STRING, n_rows BIGINT", Seq(
      Row("t", "a", 300L), Row("t", "b", 300L), Row("t", "c", 300L),
      Row("t", "d", 600L), Row("t", "e", 100L)))
    // exclusive cumsums 0,300,600,900,1500 div 500 → bins 0,0,1,1,3:
    // consecutive files only, never reordered by size
    val out = Warehouse.compactionPlan(profile, targetRows = 500L)
    assert(rowSet(out) == rows(
      Seq("t", "0", "2", "600", "a", "b"),
      Seq("t", "1", "2", "900", "c", "d"),
      Seq("t", "3", "1", "100", "e", "e")))
  }

  test("compactionPlan: an oversized file stays alone in its bin") {
    val profile = df("tbl STRING, file STRING, n_rows BIGINT", Seq(
      Row("t", "a", 1200L), Row("t", "b", 100L)))
    val out = Warehouse.compactionPlan(profile, targetRows = 500L)
    assert(rowSet(out) == rows(
      Seq("t", "0", "1", "1200", "a", "a"),
      Seq("t", "2", "1", "100", "b", "b")))
  }

  test("compactionPlan: tables bin independently") {
    val profile = df("tbl STRING, file STRING, n_rows BIGINT", Seq(
      Row("x", "a", 400L), Row("x", "b", 400L),
      Row("y", "a", 400L), Row("y", "b", 400L)))
    val out = Warehouse.compactionPlan(profile, targetRows = 500L)
    // each table merges its two sub-target files into ONE ~800-row bin
    // (a bin closes when the EXCLUSIVE prefix crosses the target, so bins
    // overshoot by at most one file) — and the tables never mix
    assert(rowSet(out) == rows(
      Seq("x", "0", "2", "800", "a", "b"),
      Seq("y", "0", "2", "800", "a", "b")))
  }

  test("incrementalJoinView: four delta terms reproduce the full join as a bag") {
    val mkA = (rows: Seq[Row]) => df("k BIGINT, va STRING", rows)
    val mkB = (rows: Seq[Row]) => df("k BIGINT, vb STRING", rows)
    val baseA = mkA(Seq(Row(1L, "a1"), Row(2L, "a2"), Row(2L, "a2x")))
    val deltaA = mkA(Seq(Row(1L, "a3"), Row(3L, "a4")))
    val baseB = mkB(Seq(Row(1L, "b1"), Row(3L, "b2")))
    val deltaB = mkB(Seq(Row(1L, "b3"), Row(2L, "b4")))
    val ivm = Warehouse.incrementalJoinView(baseA, deltaA, baseB, deltaB, "k")
    val full = baseA.unionByName(deltaA).join(baseB.unionByName(deltaB), Seq("k"))
    // bag equality, duplicates included: k=1 joins 2×2, k=2 joins 2×1,
    // k=3 joins 1×1 — 7 rows
    assert(rowSet(ivm) == rowSet(full))
    assert(ivm.count() == 7L)
    // empty deltas degrade to the stored view exactly
    val none = mkA(Seq.empty)
    val noneB = mkB(Seq.empty)
    assert(rowSet(Warehouse.incrementalJoinView(baseA, none, baseB, noneB, "k"))
      == rowSet(baseA.join(baseB, Seq("k"))))
  }
}
