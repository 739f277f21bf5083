package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("cramersV: perfect association reads 1e6, independence reads 0, degenerate NULL") {
    import org.apache.spark.sql.Row
    // x always with 1, y always with 2: χ² = n → V² = 1
    val perfect = df("a STRING, b STRING",
      Seq.fill(10)(Row("x", "1")) ++ Seq.fill(10)(Row("y", "2")))
    val p = Quality.cramersV(perfect, "a", "b").head()
    assert(p.getLong(2) == 20000L) // χ²·1000 = n·1000
    assert(p.getLong(3) == 1000000L)
    // uniform 2×2: every cell at expectation → χ² = 0 → V² = 0
    val indep = df("a STRING, b STRING",
      Seq.fill(5)(Row("x", "1")) ++ Seq.fill(5)(Row("x", "2")) ++
        Seq.fill(5)(Row("y", "1")) ++ Seq.fill(5)(Row("y", "2")))
    assert(Quality.cramersV(indep, "a", "b").head().getLong(3) == 0L)
    // one column category: min(r, c) < 2 → NULL
    val flat = df("a STRING, b STRING", Seq(Row("x", "1"), Row("y", "1")))
    assert(Quality.cramersV(flat, "a", "b").head().isNullAt(3))
  }

  test("concentrationReport: equality reads 0, monopoly reads (n-1)/n; HHI hand values") {
    import org.apache.spark.sql.Row
    val equal = df("g BIGINT, v BIGINT",
      Seq(Row(1L, 50L), Row(2L, 50L), Row(3L, 50L)))
    val e = Quality.concentrationReport(equal, "g", col("v")).head()
    assert((e.getLong(0), e.getLong(1)) == ((3L, 150L)))
    assert(e.getLong(2) == 0L)       // gini
    assert(e.getLong(3) == 333333L)  // hhi = 1/n
    val mono = df("g BIGINT, v BIGINT",
      Seq(Row(1L, 0L), Row(2L, 0L), Row(3L, 90L)))
    val m = Quality.concentrationReport(mono, "g", col("v")).head()
    assert(m.getLong(2) == 666666L)  // (n−1)/n
    assert(m.getLong(3) == 1000000L) // monopoly
    // facts collapse per group first: two rows of one group ≡ their sum
    val split = df("g BIGINT, v BIGINT",
      Seq(Row(1L, 40L), Row(1L, 50L), Row(2L, 90L)))
    val s = Quality.concentrationReport(split, "g", col("v")).head()
    assert(s.getLong(0) == 2L && s.getLong(2) == 0L && s.getLong(3) == 500000L)
  }

  test("benfordAudit: hand counts, absent digits emit, zero/negative amounts excluded") {
    import org.apache.spark.sql.Row
    val d1 = df("v BIGINT",
      Seq(Row(1L), Row(19L), Row(2L), Row(999L), Row(0L), Row(-5L)))
    val out = Quality.benfordAudit(d1, col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    assert(out.size == 9)
    // digits: 1×2, 2×1, 9×1 of n=4
    assert(out(1L) == ((2L, 500000L, 500000L - 301030L)))
    assert(out(2L) == ((1L, 250000L, 250000L - 176091L)))
    assert(out(9L) == ((1L, 250000L, 250000L - 45757L)))
    assert(out(3L) == ((0L, 0L, -124939L)))
    // the law's constants sum to exactly 1e6 (deviations sum to ~0)
    val ppm = Quality.benfordAudit(d1, col("v"))
      .agg(org.apache.spark.sql.functions.sum("benford_ppm")).head().getLong(0)
    assert(ppm == 1000000L)
  }

  test("percentileRankBy: exact cume_dist ppm over collapsed values") {
    // g: [10, 20, 20, 40] → (10,1,250000), (20,2,750000), (40,1,1000000)
    val t = df("g STRING, v BIGINT", Seq(
      Row("g", 10L), Row("g", 20L), Row("g", 20L), Row("g", 40L)))
    val out = Quality.percentileRankBy(t, "g", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((10L, 1L, 250000L), (20L, 2L, 750000L), (40L, 1L, 1000000L)))
  }

  test("domainNormalizedCut: per-group top fraction by value; ties keep whole classes") {
    val t = df("g STRING, v BIGINT", Seq(
      Row("a", 1L), Row("a", 2L), Row("a", 3L), Row("a", 4L), // keep top 50% → {3,4}
      Row("b", 5L), Row("b", 5L), Row("b", 9L)))              // cume(5)=666666
    val half = Quality.domainNormalizedCut(t, "g", "v", keepTopPpm = 500000)
      .filter(col("g") === "a")
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(half == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true))
    // asking for top 334000 of b: bound 666000 < cume(5) → the tied 5s
    // ride along with 9 (value classes are atomic)
    val tied = Quality.domainNormalizedCut(t, "g", "v", keepTopPpm = 334000)
      .filter(col("g") === "b").collect().map(_.getBoolean(3))
    assert(tied.forall(identity) && tied.length == 3)
  }

  test("modeBy: most frequent wins; count ties go to the smallest value") {
    val t = df("g STRING, v BIGINT", Seq(
      Row("a", 5L), Row("a", 5L), Row("a", 7L),
      Row("b", 1L), Row("b", 2L), Row("b", 2L), Row("b", 3L),
      Row("c", 4L), Row("c", 4L), Row("c", 6L), Row("c", 6L))) // tie → 4
    val out = Quality.modeBy(t, "g", "v", "mode_v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("a" -> ((5L, 2L)), "b" -> ((2L, 2L)), "c" -> ((4L, 2L))))
  }

  test("giniImpurityBy: hand-computed ppm — uniform, constant, all-distinct") {
    val t = df("g STRING, c STRING", Seq(
      Row("u", "x"), Row("u", "x"), Row("u", "y"), Row("u", "y"), // (16-8)/16
      Row("k", "x"), Row("k", "x"), Row("k", "x"),                // constant → 0
      Row("d", "x"), Row("d", "y"), Row("d", "z")))               // (9-3)/9
    val out = Quality.giniImpurityBy(t, "g", "c")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("u" -> ((4L, 500000L)), "k" -> ((3L, 0L)), "d" -> ((3L, 666666L))))
  }

  test("constraintReport: one pass counts all violations, uniqueness included") {
    val t = df("k BIGINT, status STRING, price DOUBLE", Seq(
      Row(1L, "O", 10.0),
      Row(1L, "O", 20.0), // dup key
      Row(2L, "Z", -5.0), // bad domain AND bad range
      Row(3L, null, 30.0))) // null status
    val out = Quality.constraintReport(t, Seq(
        Quality.Check("nonnull_status", col("status").isNull),
        Quality.Check("domain_status", !col("status").isin("O", "F")),
        Quality.Check("range_price_pos", col("price") <= 0)),
      uniqueKey = Some("k"))
    assert(out.columns.toSeq == Seq("constraint", "violations", "checked"))
    assert(rowSet(out) == rows(
      Seq("nonnull_status", "1", "4"),
      // null status: isin → null → not counted as domain violation (only nonnull counts it)
      Seq("domain_status", "1", "4"),
      Seq("range_price_pos", "1", "4"),
      Seq("unique_k", "1", "4")))
  }

  test("fkViolations: anti-join count with total checked") {
    val fact = df("fk BIGINT", Seq(Row(1L), Row(2L), Row(9L)))
    val dim = df("pk BIGINT", Seq(Row(1L), Row(2L)))
    val out = Quality.fkViolations(fact, "fk", dim, "pk", "fk_check")
    assert(rowSet(out) == rows(Seq("fk_check", "1", "3")))
  }

  test("lowerMedianBy: element of the data at position floor((n+1)/2)") {
    val t = df("g STRING, v DOUBLE", Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 100.0), // odd: middle = 2.0
      Row("b", 1.0), Row("b", 2.0), Row("b", 3.0), Row("b", 4.0))) // even: LOWER = 2.0
    val out = Quality.lowerMedianBy(t, "g", "v", "med")
    assert(rowSet(out) == rows(Seq("a", "2.0"), Seq("b", "2.0")))
  }

  test("madOutliers: median/MAD flag far points; ties counted by value") {
    // g: values 1..7 plus a wild 1000 → med(1,2,3,4,5,6,7,1000)=4 (lower of 4,5)
    // adev = 3,2,1,0,1,2,3,996 → sorted 0,1,1,2,2,3,3,996 → lower med = 2
    // outliers: |v-4| > 3*2=6 → only 1000
    val t = df("g STRING, v DOUBLE",
      (1 to 7).map(i => Row("g", i.toDouble)) :+ Row("g", 1000.0))
    val out = Quality.madOutliers(t, "g", "v", k = 3.0)
    assert(out.columns.toSeq == Seq("g", "med", "mad", "n", "n_outliers"))
    assert(rowSet(out) == rows(Seq("g", "4.0", "2.0", "8", "1")))
  }

  test("madOutliers: MAD=0 degenerate group — every deviation is an outlier") {
    val t = df("g STRING, v DOUBLE",
      Seq(Row("g", 5.0), Row("g", 5.0), Row("g", 5.0), Row("g", 7.0)))
    val out = Quality.madOutliers(t, "g", "v", k = 3.0)
    assert(rowSet(out) == rows(Seq("g", "5.0", "0.0", "4", "1")))
  }

  test("weightedMedianBy: heavy weight drags the median; exact boundary rule") {
    // g1: values 1(w1), 2(w1), 10(w10) → total 12, half 6 → cum(1)=1,
    // cum(2)=2, cum(10)=12 ≥ 6 with prev 2·2 < 12 → median 10
    // g2: 1(w2), 3(w2) → total 4 → 2·cum(1)=4 ≥ 4, prev 0 → median 1
    //     (lower-median rule at the exact half boundary)
    val t = df("g STRING, v BIGINT, w BIGINT", Seq(
      Row("g1", 1L, 1L), Row("g1", 2L, 1L), Row("g1", 10L, 10L),
      Row("g2", 1L, 2L), Row("g2", 3L, 2L)))
    val out = Quality.weightedMedianBy(t, "g", "v", "w", "wmed")
    assert(out.columns.toSeq == Seq("g", "wmed", "total_w"))
    assert(rowSet(out) == rows(
      Seq("g1", "10", "12"), Seq("g2", "1", "4")))
  }

  test("winsorizedAgg: tails clamp to exact nearest-rank bounds; mean is floor-div") {
    // 10 values 1..9 and 1000: p10 bound = min{v: cum·100 ≥ tot·10} = 1,
    // p90 bound = min{v: cum·100 ≥ 900} = 9 → 1000 clamps to 9
    val t = df("g STRING, v BIGINT",
      ((1L to 9L) :+ 1000L).map(v => Row("g", v)))
    val out = Quality.winsorizedAgg(t, "g", "v", pLo = 10, pHi = 90)
    assert(out.columns.toSeq ==
      Seq("g", "lo", "hi", "n", "winsorized_sum", "winsorized_mean"))
    // sum = 1..9 + 9 = 54; mean = 54 div 10 = 5
    assert(rowSet(out) == rows(Seq("g", "1", "9", "10", "54", "5")))
  }

  test("winsorizedAgg: degenerate single-value group clamps to itself") {
    val t = df("g STRING, v BIGINT", Seq(Row("g", 7L), Row("g", 7L)))
    assert(rowSet(Quality.winsorizedAgg(t, "g", "v")) ==
      rows(Seq("g", "7", "7", "2", "14", "7")))
  }

  test("weightedMedianBy: repeated values pool their weights; weight-1 equals lower median") {
    val t = df("g STRING, v BIGINT, w BIGINT", Seq(
      Row("g", 5L, 1L), Row("g", 5L, 1L), Row("g", 1L, 1L), Row("g", 9L, 1L)))
    // pooled: 1(1), 5(2), 9(1) → total 4; 2·cum(5)=6 ≥ 4, prev 2·1 < 4 → 5
    assert(rowSet(Quality.weightedMedianBy(t, "g", "v", "w", "m")) ==
      rows(Seq("g", "5", "4")))
  }

  test("kAnonymityAudit: bands classes by size — unique / small-crowd / passing") {
    // QI (a,b): class (x,1)×1 → band "1"; (y,1)×3 → "2..4"; (z,1)×5 → ">=5"
    val t = df("a STRING, b BIGINT", Seq(Row("x", 1L)) ++
      Seq.fill(3)(Row("y", 1L)) ++ Seq.fill(5)(Row("z", 1L)))
    assert(rowSet(Quality.kAnonymityAudit(t, Seq("a", "b"), k = 5)) == rows(
      Seq("1", "1", "1", "1", "1"),       // band, n_classes, n_rows, min, max
      Seq("2..4", "1", "3", "3", "3"),
      Seq(">=5", "1", "5", "5", "5")))
  }

  test("kAnonymityAudit: all-passing corpus emits only the >=k band") {
    val t = df("a STRING", Seq.fill(6)(Row("only")))
    assert(rowSet(Quality.kAnonymityAudit(t, Seq("a"), k = 3)) ==
      rows(Seq(">=3", "1", "6", "6", "6")))
  }

  test("lDiversityAudit: a k-anonymous but sensitive-uniform class lands in band 1") {
    // class (x): 5 rows, ALL sensitive 's1' → k=5-anonymous yet diversity 1
    // class (y): 3 rows, sensitive s1/s2 → band "2"
    // class (z): 3 rows, s1/s2/s3 → band ">=3"
    val t = df("a STRING, s STRING",
      Seq.fill(5)(Row("x", "s1")) ++
        Seq(Row("y", "s1"), Row("y", "s1"), Row("y", "s2")) ++
        Seq(Row("z", "s1"), Row("z", "s2"), Row("z", "s3")))
    assert(rowSet(Quality.lDiversityAudit(t, Seq("a"), "s", l = 3)) == rows(
      Seq("1", "1", "5", "1", "1"),  // div_band, n_classes, n_rows, min, max
      Seq("2..2", "1", "3", "2", "2"),
      Seq(">=3", "1", "3", "3", "3")))
  }

  test("tClosenessAudit: a class mirroring the global mix scores exactly 0") {
    // both classes are 50/50 a-b, like the corpus
    val t = df("g STRING, s STRING", Seq(
      Row("c1", "a"), Row("c1", "b"), Row("c2", "a"), Row("c2", "b")))
    val out = Quality.tClosenessAudit(t, Seq("g"), "s").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("c1" -> (2L, 0L), "c2" -> (2L, 0L)))
  }

  test("tClosenessAudit: hand-computed EMD — fully polarized classes score 500000 ppm") {
    // global a:2 b:2; c1 = {a,a}, c2 = {b,b}; m=2 n=4
    // c1: |cum_a(c)·n − cum_a(g)·nc| = |2·4 − 2·2| = 4 → 4·10⁶/(1·2·4)
    val t = df("g STRING, s STRING", Seq(
      Row("c1", "a"), Row("c1", "a"), Row("c2", "b"), Row("c2", "b")))
    val out = Quality.tClosenessAudit(t, Seq("g"), "s").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("c1" -> 500000L, "c2" -> 500000L))
  }

  test("tClosenessAudit: zero cells are real deficits; single-valued domain is empty") {
    // three values, one class missing two of them entirely
    val t = df("g STRING, s STRING", Seq(
      Row("c1", "a"), Row("c1", "b"), Row("c1", "c"),
      Row("c2", "a"), Row("c2", "a"), Row("c2", "a")))
    val out = Quality.tClosenessAudit(t, Seq("g"), "s").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // c2: cum a |3·6−4·3|=6, b |3·6−5·3|=3 → 9·10⁶/(2·3·6) = 250000
    // c1: cum a |1·6−4·3|=6, b |2·6−5·3|=3 → 250000 (symmetric here)
    assert(out == Map("c1" -> 250000L, "c2" -> 250000L))
    val single = df("g STRING, s STRING", Seq(Row("c1", "a"), Row("c2", "a")))
    assert(Quality.tClosenessAudit(single, Seq("g"), "s").count() == 0)
  }
}
