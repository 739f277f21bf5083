package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankStatsSpec extends SparkSpec {

  test("spearman: perfect monotone agreement and reversal read ±1e6 exactly") {
    val up = df("k BIGINT, x BIGINT, y BIGINT",
      Seq(Row(1L, 10L, 1L), Row(2L, 20L, 2L), Row(3L, 30L, 3L), Row(4L, 40L, 4L)))
    assert(RankStats.spearman(up, "k", col("x"), col("y")).head().getLong(2) == 1000000L)
    val down = df("k BIGINT, x BIGINT, y BIGINT",
      Seq(Row(1L, 10L, 4L), Row(2L, 20L, 3L), Row(3L, 30L, 2L), Row(4L, 40L, 1L)))
    assert(RankStats.spearman(down, "k", col("x"), col("y")).head().getLong(2) == -1000000L)
  }

  test("spearman: hand value with one swapped pair; n<2 guards to NULL") {
    // y ranks (1,2,4,3) vs x ranks (1,2,3,4): Σd² = 2 →
    // ρ = 1 − 12/(4·15) = 0.8 → 800000 ppm
    val d1 = df("k BIGINT, x BIGINT, y BIGINT",
      Seq(Row(1L, 1L, 1L), Row(2L, 2L, 2L), Row(3L, 3L, 9L), Row(4L, 4L, 8L)))
    val r = RankStats.spearman(d1, "k", col("x"), col("y")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 800000L)
    val single = df("k BIGINT, x BIGINT, y BIGINT", Seq(Row(1L, 1L, 1L)))
    assert(RankStats.spearman(single, "k", col("x"), col("y")).head().isNullAt(2))
  }

  test("spearman: ties broken by key (rank-of-record) — deterministic under repartition") {
    val d1 = df("k BIGINT, x BIGINT, y BIGINT",
      (1L to 50L).map(i => Row(i, i % 7, (i * 13) % 5)))
    val a = RankStats.spearman(d1.repartition(1), "k", col("x"), col("y")).head()
    val b = RankStats.spearman(d1.repartition(11), "k", col("x"), col("y")).head()
    assert(a.getLong(2) == b.getLong(2))
  }

  test("rankSumAuc: hand-counted pairs with ties; separated groups read 0 and 1e6") {
    // A = {3, 5}, B = {3, 4}: pairs (a,b): (3,3)=tie, (3,4)=lt, (5,3)=gt, (5,4)=gt
    // U2 = 2·2 + 1 = 5; auc = 5/8 → 625000 ppm
    val d1 = df("grp STRING, v BIGINT",
      Seq(Row("A", 3L), Row("A", 5L), Row("B", 3L), Row("B", 4L)))
    val r = RankStats.rankSumAuc(d1, col("grp"), "A", col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 5L, 625000L)))
    val sep = df("grp STRING, v BIGINT",
      Seq(Row("A", 10L), Row("A", 11L), Row("B", 1L), Row("B", 2L)))
    assert(RankStats.rankSumAuc(sep, col("grp"), "A", col("v")).head().getLong(3) == 1000000L)
    assert(RankStats.rankSumAuc(sep, col("grp"), "B", col("v")).head().getLong(3) == 0L)
  }

  test("rankSumAuc: one empty group -> NULL effect, not a crash") {
    val d1 = df("grp STRING, v BIGINT", Seq(Row("A", 1L), Row("A", 2L)))
    val r = RankStats.rankSumAuc(d1, col("grp"), "A", col("v")).head()
    assert(r.getLong(1) == 0L && r.isNullAt(3))
  }

  test("cohenKappa: the textbook 2x2 hand value") {
    // Cohen's worked shape: a=20 (yes,yes), b=5 (yes,no), c=10 (no,yes),
    // d=15 (no,no); n=50, A=35, po=0.70
    // P = ryes*cyes + rno*cno = 25*30 + 25*20 = 1250; pe = 1250/2500 = 0.50
    // kappa = (35*50 - 1250)/(2500 - 1250) = 500/1250 = 0.40 → 400000 ppm
    val rows = Seq.fill(20)(Row("y", "y")) ++ Seq.fill(5)(Row("y", "n")) ++
      Seq.fill(10)(Row("n", "y")) ++ Seq.fill(15)(Row("n", "n"))
    val r = RankStats.cohenKappa(df("a STRING, b STRING", rows), "a", "b").head()
    assert((r.getLong(0), r.getLong(1)) == ((50L, 35L)))
    assert(r.getLong(2) == 700000L) // po_ppm
    assert(r.getLong(3) == 500000L) // pe_ppm
    assert(r.getLong(4) == 400000L) // kappa_ppm
  }

  test("cohenKappa: perfect agreement reads 1e6; constant raters read NULL; worse-than-chance is negative") {
    val perfect = df("a STRING, b STRING", Seq(Row("x", "x"), Row("y", "y")))
    assert(RankStats.cohenKappa(perfect, "a", "b").head().getLong(4) == 1000000L)
    val constant = df("a STRING, b STRING", Seq(Row("x", "x"), Row("x", "x")))
    assert(RankStats.cohenKappa(constant, "a", "b").head().isNullAt(4))
    // systematic disagreement: every y→n, n→y. A=0, P = 1*1 + 1*1 = 2
    // (n=2): kappa = (0 - 2)/(4 - 2) = -1 → -1000000 (Spark div is
    // toward-zero; exact here)
    val inverted = df("a STRING, b STRING", Seq(Row("y", "n"), Row("n", "y")))
    assert(RankStats.cohenKappa(inverted, "a", "b").head().getLong(4) == -1000000L)
  }

  test("mcnemar: hand value and the no-discordance guard") {
    // truth all "t": A right on r1,r2,r3 wrong on r4; B right on r1 only
    // → b (A-only) = 2, c (B-only) = 0, chi2 = (2-0)²/2 = 2 → 2000000 ppm
    val rows = Seq(
      Row("t", "t", "t"), // both right
      Row("t", "x", "t"), // A only
      Row("t", "x", "t"), // A only
      Row("x", "x", "t")) // both wrong
    val r = RankStats.mcnemar(df("a STRING, b STRING, tr STRING", rows),
      "a", "b", "tr").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 0L, 2000000L)))
    val agree = df("a STRING, b STRING, tr STRING",
      Seq(Row("t", "t", "t"), Row("x", "x", "t")))
    assert(RankStats.mcnemar(agree, "a", "b", "tr").head().isNullAt(3))
  }
}
