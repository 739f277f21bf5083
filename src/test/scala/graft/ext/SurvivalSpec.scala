package graft.ext

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  test("kaplanMeier: hand-computed product-limit steps; censor-only steps are exact no-ops") {
    val dur = df("t BIGINT, event INT",
      Seq(Row(2L, 1), Row(2L, 1), Row(3L, 0), Row(5L, 1)))
    val out = Survival.kaplanMeier(dur)
    assert(out.columns.toSeq ==
      Seq("t", "n_risk", "d_events", "c_censored", "s_ppm"))
    assert(rowSet(out) == rows(
      Seq("2", "4", "2", "0", "500000"), // 1e6·(4−2)/4
      Seq("3", "2", "0", "1", "500000"), // censor only: ·2/2, exact no-op
      Seq("5", "1", "1", "0", "0"))) // last subject events → S hits 0
  }

  test("kaplanMeier: floor accumulates like the oracle's recursive CTE") {
    // 3 subjects, events at 1, 2, 3: S = 1e6·2/3 = 666666 → ·1/2 = 333333 → 0
    val dur = df("t BIGINT, event INT", Seq(Row(1L, 1), Row(2L, 1), Row(3L, 1)))
    assert(rowSet(Survival.kaplanMeier(dur)) == rows(
      Seq("1", "3", "1", "0", "666666"),
      Seq("2", "2", "1", "0", "333333"),
      Seq("3", "1", "1", "0", "0")))
  }

  test("repeatPurchaseDurations: repeaters to second order, one-timers censored at the horizon") {
    val orders = df("o_custkey BIGINT, o_orderdate DATE, o_orderkey BIGINT", Seq(
      Row(1L, Date.valueOf("2024-01-01"), 10L), // repeater: day 0 → day 2
      Row(1L, Date.valueOf("2024-01-03"), 11L),
      Row(1L, Date.valueOf("2024-01-09"), 12L), // third order ignored
      Row(2L, Date.valueOf("2024-01-02"), 20L), // one-timer → horizon 01-10
      Row(3L, Date.valueOf("2024-01-10"), 30L))) // sets the horizon; censored at 0
    val out = Survival.repeatPurchaseDurations(orders)
    assert(rowSet(out) == rows(
      Seq("2", "1"), // cust 1: event at 2 days
      Seq("8", "0"), // cust 2: censored at 8 days
      Seq("0", "0"))) // cust 3: censored immediately
  }

  test("kaplanMeier: layout-invariant on a scattered duration set") {
    val dur = df("t BIGINT, event INT",
      (1L to 200L).map(i => Row((i * 37) % 23, if (i % 3 == 0) 0 else 1)))
    val a = rowSet(Survival.kaplanMeier(dur.repartition(1)))
    val b = rowSet(Survival.kaplanMeier(dur.repartition(13)))
    assert(a == b)
  }
}
