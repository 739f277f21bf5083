package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the round-7 quality tier: Tukey fences on exact quartiles,
  * two-sample KS, χ² independence.
  */
class RobustQualitySpec extends SparkSpec {

  test("tukeyOutlierReport: hand-computed fences and outlier counts") {
    // sorted: -10,1,2,3,4,5,6,7,8,100 (n=10): q1 rank 3 → 2, q3 rank 8 → 7
    // IQR 5 → fences [2-7, 7+7] = [-5, 14]; one low (-10), one high (100)
    val d1 = df("g STRING, v BIGINT",
      ((1L to 8L).map(Row("a", _)) :+ Row("a", -10L)) :+ Row("a", 100L))
    val r = Quality.tukeyOutlierReport(d1, "g", col("v")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 7L, -5L, 14L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((10L, 1L, 1L)))
  }

  test("tukeyOutlierReport: constant group has zero IQR and zero outliers") {
    val d1 = df("g STRING, v BIGINT", Seq.fill(5)(Row("c", 42L)))
    val r = Quality.tukeyOutlierReport(d1, "g", col("v")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(6), r.getLong(7)) ==
      ((42L, 42L, 0L, 0L)))
  }

  test("ksStatistic: disjoint supports read 1e6; interleaved read the hand gap") {
    val disj = df("grp STRING, v BIGINT",
      Seq(Row("A", 1L), Row("A", 2L), Row("B", 3L), Row("B", 4L)))
    val r1 = RankStats.ksStatistic(disj, col("grp"), "A", col("v")).head()
    assert(r1.getLong(3) == 1000000L && r1.getLong(2) == 2L) // max gap after v=2
    val inter = df("grp STRING, v BIGINT",
      Seq(Row("A", 1L), Row("A", 3L), Row("B", 2L), Row("B", 4L)))
    val r2 = RankStats.ksStatistic(inter, col("grp"), "A", col("v")).head()
    // gaps: v1→2, v2→0, v3→2, v4→0 (×nA·nB=4): D = 1/2, first argmax v=1
    assert(r2.getLong(3) == 500000L && r2.getLong(2) == 1L)
  }

  test("chi2Independence: exact zero on an independent table, N·1000 milli on perfect association") {
    val indep = df("a STRING, b STRING",
      Seq.fill(10)(Row("x", "0")) ++ Seq.fill(10)(Row("x", "1")) ++
        Seq.fill(20)(Row("y", "0")) ++ Seq.fill(20)(Row("y", "1")))
    val r1 = Quality.chi2Independence(indep, "a", "b").head()
    assert(r1.getLong(0) == 60L && r1.getLong(3) == 1L && r1.getLong(4) == 0L)
    val assoc = df("a STRING, b STRING",
      Seq.fill(10)(Row("x", "0")) ++ Seq.fill(10)(Row("y", "1")))
    val r2 = Quality.chi2Independence(assoc, "a", "b").head()
    // perfect association: χ² = N → 20000 in milli units
    assert(r2.getLong(4) == 20000L)
  }

  test("logHistKs: certified interval contains the exact KS; lo <= hi") {
    val d1 = df("grp STRING, v BIGINT",
      (1L to 400L).map(i => Row(if (i % 2 == 0) "R" else "A",
        if (i % 2 == 0) (i * 37) % 4000 + 1 else (i * 53) % 900 + 1)))
    def hist(flag: String) = Sketch.logHistogram(
      d1.filter(col("grp") === flag), col("v"), Seq.empty)
    val iv = Sketch.logHistKs(hist("R"), hist("A")).head()
    val exact = RankStats.ksStatistic(d1, col("grp"), "R", col("v"))
      .head().getLong(3)
    val (lo, hi) = (iv.getLong(2), iv.getLong(3))
    assert(lo <= hi, s"lo=$lo hi=$hi")
    assert(lo <= exact && exact <= hi,
      s"exact KS $exact must sit inside the certified [$lo, $hi]")
  }

  test("logHistKs: identical histograms read a zero lower bound") {
    val d1 = df("grp STRING, v BIGINT",
      (1L to 100L).flatMap(i => Seq(Row("R", i), Row("A", i))))
    def hist(flag: String) = Sketch.logHistogram(
      d1.filter(col("grp") === flag), col("v"), Seq.empty)
    val iv = Sketch.logHistKs(hist("R"), hist("A")).head()
    assert(iv.getLong(2) == 0L)
  }

  test("logHistKsSeries: per-pair intervals match pairwise logHistKs; identical adjacent hours read lo 0") {
    val hist = df("h BIGINT, bucket_id BIGINT, cnt BIGINT",
      // hour 1 and hour 2 identical; hour 3 shifted mass
      Seq(Row(1L, 10L, 5L), Row(1L, 12L, 3L),
        Row(2L, 10L, 5L), Row(2L, 12L, 3L),
        Row(3L, 14L, 8L)))
    val out = Sketch.logHistKsSeries(hist, "h")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(2L, 3L))
    assert(out(2L)._1 == 0L, "identical adjacent hours must read ks_lo 0")
    // hour 3 vs 2: disjoint buckets → lo = hi = 1e6
    assert(out(3L) == ((1000000L, 1000000L)))
    // per-pair rows equal the two-sided readout
    val pair = Sketch.logHistKs(
      df("bucket_id BIGINT, cnt BIGINT", Seq(Row(14L, 8L))),
      df("bucket_id BIGINT, cnt BIGINT", Seq(Row(10L, 5L), Row(12L, 3L)))).head()
    assert((pair.getLong(2), pair.getLong(3)) == out(3L))
  }

  test("yieldCurve: monotone non-increasing, threshold 0 retains everything") {
    val docs = df("doc_id BIGINT, text STRING",
      (1L to 30L).map(i => Row(i,
        if (i % 3 == 0) "the quick brown fox jumps over the lazy dog and runs"
        else if (i % 3 == 1) "x" else "!!! ??? !!!")))
    val out = Curation.yieldCurve(docs, steps = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out(0L) == ((30L, 1000000L))) // threshold 0 keeps all docs
    val curve = out.toSeq.sortBy(_._1).map(_._2._1)
    assert(curve.zip(curve.tail).forall { case (a, b) => a >= b },
      s"retained docs must be non-increasing in the threshold: $curve")
  }

  test("chi2Independence: zero cells contribute their expectation (full grid)") {
    // 2×2 with one absent combination: x only in b=0, y in both
    val d1 = df("a STRING, b STRING",
      Seq.fill(6)(Row("x", "0")) ++ Seq.fill(3)(Row("y", "0")) ++
        Seq.fill(3)(Row("y", "1")))
    val r = Quality.chi2Independence(d1, "a", "b").head()
    // margins: rx=6, ry=6, c0=9, c1=3, N=12
    // e(x,0)=4500, e(x,1)=1500, e(y,0)=4500, e(y,1)=1500 (milli)
    // cells: (6000-4500)²/4500=500, (0-1500)²/1500=1500,
    //        (3000-4500)²/4500=500, (3000-1500)²/1500=1500 → 4000
    assert(r.getLong(4) == 4000L)
  }
}
