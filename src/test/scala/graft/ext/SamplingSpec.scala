package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
  }

  test("eval-set composition (q174 shape): exactly min(n, |cell|) winners per stratum cell") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val wl = TextAnalysis.stats(docs).select(col("doc_id"), col("quality"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val ranks = Quality.percentileRankBy(wl.withColumn("g", lit("all")), "g", "quality")
      .select(col("value").as("quality"), col("cume_ppm"))
    val cells = wl.join(ranks, Seq("quality"))
      .withColumn("q_bucket", expr("((cume_ppm - 1) * 5) div 1000000"))
      .withColumn("cell", concat_ws("|", col("lang"), col("q_bucket")))
      .select("doc_id", "lang", "q_bucket", "cell")
    val out = Sampling.sampleExactN(cells, "doc_id", "cell", n = 5)
    val sizes = out.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cellTotals = cells.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.nonEmpty)
    sizes.foreach { case (c, n) => assert(n == math.min(5L, cellTotals(c))) }
    // buckets stay in the quintile range
    assert(out.select("q_bucket").collect().map(_.getLong(0)).forall(b => b >= 0 && b <= 4))
  }

  test("remixToTarget: exact rational base and fractional ppm; copies = base + hash draw") {
    import org.apache.spark.sql.Row
    // T = 15; A (sz 10): f = 0.4·15/10 = 0.6 → base 0, frac 600000 ppm;
    // B (sz 5): f = 0.6·15/5 = 1.8 → base 1, frac 800000 ppm
    val d = df("doc_id BIGINT, source STRING, n_chars BIGINT", Seq(
      Row(1L, "A", 4L), Row(2L, "A", 6L), Row(3L, "B", 5L)))
    val out = Sampling.remixToTarget(d, "doc_id", "source", "n_chars",
      Seq("A" -> 400000L, "B" -> 600000L), 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val draws = d.select(col("doc_id"),
      pmod(Dedup.mixHash(col("doc_id"), 340), lit(1000000L)).as("dr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == (if (draws(1L) < 600000L) 1L else 0L))
    assert(out(2L) == (if (draws(2L) < 600000L) 1L else 0L))
    assert(out(3L) == 1L + (if (draws(3L) < 800000L) 1L else 0L))
  }

  test("remixToTarget: ppm 0 drops the domain; integral factor has no fractional draws") {
    import org.apache.spark.sql.Row
    // T = 20; A dropped; B: f = 1e6·20/(1e6·10) = 2 exactly → 2 copies, frac 0
    val d = df("doc_id BIGINT, source STRING, n_chars BIGINT", Seq(
      Row(1L, "A", 10L), Row(2L, "B", 10L)))
    val out = Sampling.remixToTarget(d, "doc_id", "source", "n_chars",
      Seq("A" -> 0L), 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L))
  }

  test("remixToTarget: copy vector is repartition-invariant") {
    val d = docs.withColumn("n_chars", (col("doc_id") % 7 + 1))
    val a = rowSet(Sampling.remixToTarget(d, "doc_id", "lang", "n_chars",
      Seq("en" -> 700000L), 300000L))
    val b = rowSet(Sampling.remixToTarget(d.repartition(11), "doc_id", "lang", "n_chars",
      Seq("en" -> 700000L), 300000L))
    assert(a == b)
  }

  test("survival is a pure function of (id, stratum): reproducible across runs") {
    val a = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Seq("en" -> 500, "zh" -> 100), 50).collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedHashSample(docs.repartition(7), "doc_id", "lang",
      Seq("en" -> 500, "zh" -> 100), 50).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("sampleExactN: exactly min(n, |group|) rows per group; subset of input; repartition-invariant") {
    val out = Sampling.sampleExactN(docs, "doc_id", "lang", n = 50)
    val counts = out.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 50L, "zh" -> 50L))
    val ids = out.collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf((0L until 1000L).toSet))
    val repart = Sampling.sampleExactN(docs.repartition(7), "doc_id", "lang", n = 50)
      .collect().map(_.getLong(0)).toSet
    assert(ids == repart, "winners must not depend on partitioning")
    // n beyond the group size keeps the whole group
    val all = Sampling.sampleExactN(docs, "doc_id", "lang", n = 5000)
    assert(all.count() == 1000)
  }

  test("sampleExactN: nested — the n=10 sample is a prefix of the n=50 sample per group") {
    val small = Sampling.sampleExactN(docs, "doc_id", "lang", 10)
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleExactN(docs, "doc_id", "lang", 50)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large),
      "bottom-n of a fixed hash order must nest: growing n only adds rows")
  }

  test("sampledQuantiles: exact when the group fits in k; nearest-rank indices; repartition-invariant") {
    import spark.implicits._
    // one group of 9 known values → sample IS the group (k=16 > 9)
    val d = (1L to 9L).map(i => (i, "g", i * 10L)).toDF("doc_id", "src", "value")
    val out = Sampling.sampledQuantiles(d, "doc_id", "value", "src", 16, Seq(0, 25, 50, 75, 100))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    // m=9: idx(0)=1, idx(25)=3, idx(50)=5, idx(75)=7, idx(100)=9
    assert(out == Set((0, 10L, 9), (25, 30L, 9), (50, 50L, 9), (75, 70L, 9), (100, 90L, 9)))
    // large group: estimates are partitioning-invariant (pure function of ids)
    val big = (0L until 2000L).map(i => (i, "g", i)).toDF("doc_id", "src", "value")
    val a = Sampling.sampledQuantiles(big, "doc_id", "value", "src", 64, Seq(50)).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    val b = Sampling.sampledQuantiles(big.repartition(7), "doc_id", "value", "src", 64, Seq(50))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
    // and lands within 15 points of the true median on a uniform ramp
    val med = a.head._2
    assert(med > 700 && med < 1300, s"median estimate $med vs true 1000")
  }

  test("per-stratum rates are approximately honored") {
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Seq("en" -> 500, "zh" -> 100), 50)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 334 en docs at 50%, 666 zh at 10% — allow generous hash variance
    assert(out("en") > 100 && out("en") < 234)
    assert(out("zh") > 20 && out("zh") < 140)
  }

  test("sampled set is a subset; rate 0 drops a stratum entirely; 1000 keeps all") {
    val none = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Seq("en" -> 0), 1000)
    assert(none.filter(col("lang") === "en").count() == 0)
    assert(none.filter(col("lang") === "zh").count() == docs.filter(col("lang") === "zh").count())
  }

  test("plan is a narrow filter — no shuffle introduced") {
    val plan = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Seq("en" -> 500), 100).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("weightedHashSample: inclusion tracks the weight; deterministic; clamped") {
    import spark.implicits._
    val weighted = (0L until 4000L)
      .map(i => (i, i % 4 match {
        case 0 => 0.0; case 1 => 0.25; case 2 => 0.75; case _ => 1.0
      }))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedHashSample(weighted, "doc_id", "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byW = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byW.contains(0.0)) // weight 0 never survives
    assert(byW(1.0) == 1000)   // weight 1 always survives
    // 0.25 / 0.75 land near their rates (1000 trials each)
    assert(math.abs(byW(0.25) - 250) < 80 && math.abs(byW(0.75) - 750) < 80)
    // repartitioning does not change the sampled set
    val again = Sampling.weightedHashSample(weighted.repartition(7), "doc_id", "w")
      .collect().map(r => r.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
    // out-of-range weights clamp instead of erroring
    val oob = Seq((1L, -0.5), (2L, 3.0)).toDF("doc_id", "w")
    assert(Sampling.weightedHashSample(oob, "doc_id", "w")
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("deterministicShuffle: total bijection onto (shard, 1..shardSize); rerun-identical") {
    val out = Sampling.deterministicShuffle(docs, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == docs.count())
    // positions within each shard are exactly 1..n, no gaps or dups
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = Sampling.deterministicShuffle(docs, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("deterministicShuffle actually permutes: shards balanced, in-shard order is not id order") {
    val out = Sampling.deterministicShuffle(docs, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byShard = out.groupBy(_._2)
    assert(byShard.size == 4, s"expected 4 populated shards, got ${byShard.keySet}")
    // no shard hogs the corpus (the parity-degenerate hash put 100% in shard 0)
    byShard.values.foreach(rows => assert(rows.length < out.length / 2))
    // within each shard, ids ordered by position must NOT be sorted — an
    // unwrapped affine hash is monotone in id and yields the identity order
    val sortedShards = byShard.values.count { rows =>
      val ids = rows.sortBy(_._3).map(_._1).toSeq
      ids == ids.sorted
    }
    assert(sortedShards == 0, "in-shard order must differ from id order")
  }

  test("deterministicShuffle: different seeds produce different orders") {
    val a = Sampling.deterministicShuffle(docs, 2, seed = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Sampling.deterministicShuffle(docs, 2, seed = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a != b)
  }

  test("tokenBudgetMix: per-domain take-while, boundary doc included") {
    import org.apache.spark.sql.Row
    // uniform 100-char docs: selection count is order-independent —
    // budget 250 → 3 docs (cum 100,200,300: pre-row totals 0,100,200 < 250),
    // budget 200 → 2, budget 0 → 0
    val docs = df("doc_id BIGINT, source STRING, n_chars BIGINT",
      (1L to 10L).flatMap(i => Seq(
        Row(i, "a", 100L), Row(i + 100L, "b", 100L), Row(i + 200L, "c", 100L))))
    val out = Sampling.tokenBudgetMix(docs, "doc_id", "source", "n_chars",
      budgets = Seq("a" -> 250L, "b" -> 200L), defaultBudget = 0L)
    val bySrc = out.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 3, "b" -> 2))
    // cum_size is consistent: max cum per source == 100 × selected count
    val maxCum = out.collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(3)).max).toMap
    assert(maxCum == Map("a" -> 300L, "b" -> 200L))
  }

  test("tokenBudgetMix: deterministic — same input twice, identical rows") {
    import org.apache.spark.sql.Row
    val docs = df("doc_id BIGINT, source STRING, n_chars BIGINT",
      (1L to 20L).map(i => Row(i, if (i % 2 == 0) "x" else "y", i * 10L)))
    val sel = Sampling.tokenBudgetMix(docs, "doc_id", "source", "n_chars",
      budgets = Nil, defaultBudget = 300L)
    assert(rowSet(sel) == rowSet(Sampling.tokenBudgetMix(docs.repartition(7),
      "doc_id", "source", "n_chars", budgets = Nil, defaultBudget = 300L)))
  }

  test("negativePairs: k partners per anchor minus self-collisions, in-range, deterministic") {
    import spark.implicits._
    val corpus = (0L until 500L).toDF("vec_id")
    val out = Sampling.negativePairs(corpus, k = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every partner is a real id, never the anchor itself
    assert(rows.forall { case (a, _, p) => p >= 0 && p < 500 && p != a })
    // ~k per anchor (self-collision loss is ~k/n)
    assert(rows.length > 500 * 4 - 30 && rows.length <= 500 * 4)
    // pure function of (id, j): repartitioning changes nothing
    val again = Sampling.negativePairs(corpus.repartition(9), k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // partners spread over the corpus, not clumped (rough uniformity)
    assert(rows.map(_._3).distinct.length > 300)
  }

  test("negativePairs: narrow plan — no shuffle beyond the broadcast count") {
    import spark.implicits._
    val plan = Sampling.negativePairs((0L until 100L).toDF("vec_id"), k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("dsirScores: single bucket collapses every weight to exactly 10^6; empty doc scores 0") {
    import org.apache.spark.sql.Row
    // with buckets=1 the one bucket's target share equals the corpus's, so
    // wppm = (tgt_n·raw_t·10⁶)/(raw_n·tgt_t) = 10⁶ for every token — any
    // tokenized doc scores exactly 1,000,000 regardless of content
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "aa aa", "en"), Row(2L, "aa bb cc", "zh"),
      Row(3L, "", "zh"), Row(4L, "bb", "en")))
    val out = Sampling.dsirScores(d, col("lang") === "en", buckets = 1)
    assert(rowSet(out) == rows(
      Seq("1", "2", "1000000"), Seq("2", "3", "1000000"),
      Seq("3", "0", "0"), Seq("4", "1", "1000000")))
  }

  test("dsirScores: target-exclusive tokens outscore target-absent tokens by the exact ratio") {
    import org.apache.spark.sql.Row
    // raw_t = 4 tokens, tgt_t = 2; 'alpha' bucket: raw 2 / tgt 2 →
    // wppm = 2·4·10⁶/(2·2) = 2,000,000; 'beta' bucket: tgt 0 → 0
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "alpha alpha", "en"), Row(2L, "beta beta", "zh")))
    val out = Sampling.dsirScores(d, col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2000000L, 2L -> 0L))
  }

  test("temperatureSample: sqrt-share targets upweight the tail; exact ppm arithmetic") {
    import org.apache.spark.sql.Row
    // stratum A: 100 docs, B: 25 → roots 10, 5 (Σ 15); budget 60 →
    // targets 60·10/15 = 40, 60·5/15 = 20 → keep_ppm A = 400000,
    // B = 800000: the small stratum keeps DOUBLE the fraction
    val d = df("doc_id BIGINT, lang STRING",
      (0L until 100L).map(i => Row(i, "A")) ++ (100L until 125L).map(i => Row(i, "B")))
    val out = Sampling.temperatureSample(d, budget = 60)
    val ppm = out.select("lang", "keep_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppm == Map("A" -> 400000L, "B" -> 800000L))
    // kept flag is the member-390 hash draw — deterministic and
    // repartition-invariant
    val kept = out.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val again = Sampling.temperatureSample(d.repartition(7), budget = 60)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == again && kept.nonEmpty)
    // non-square stratum sizes hit the isqrt correction path: 99 → 9
    val d2 = df("doc_id BIGINT, lang STRING",
      (0L until 99L).map(i => Row(i, "C")))
    val p2 = Sampling.temperatureSample(d2, budget = 33)
      .select("keep_ppm").distinct().collect().map(_.getLong(0)).toSeq
    assert(p2 == Seq(333333L)) // target 33·9/9 = 33 → 33·10⁶ div 99
  }

  test("dsirScores: mixed doc floor-means its tokens' bucket weights; repartition-invariant") {
    import org.apache.spark.sql.Row
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "alpha alpha", "en"), Row(2L, "beta beta", "zh"),
      Row(3L, "alpha beta", "zh")))
    // raw_t = 6, tgt_t = 2; alpha: raw 3/tgt 2 → 2·6·10⁶/(3·2) = 2,000,000;
    // beta: 0 → doc 3 = (2,000,000 + 0) div 2 = 1,000,000
    val out = Sampling.dsirScores(d, col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2000000L, 2L -> 0L, 3L -> 1000000L))
    val again = Sampling.dsirScores(d.repartition(7), col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out)
  }

  test("waterFillBudgets: hand-checked split — small domains keep all, big ones share the rest") {
    import org.apache.spark.sql.Row
    // caps: a=10, b=20, c=100, d=100; B=80.
    // prefix test (asc order): a 10·4+0=40≤80 capped, b 20·3+10=70≤80
    // capped, c 100·2+30=230>80 uncapped. base=(80-30) div 2=25, rem=0.
    val d = df("source STRING, n_chars BIGINT", Seq(
      Row("a", 10L), Row("b", 20L), Row("c", 100L), Row("d", 100L)))
    val out = Sampling.waterFillBudgets(d, budget = 80L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> (10L, 10L), "b" -> (20L, 20L),
      "c" -> (100L, 25L), "d" -> (100L, 25L)))
  }

  test("waterFillBudgets: Σalloc = min(B, Σcap); remainder +1 goes to first uncapped by name") {
    import org.apache.spark.sql.Row
    // caps: x=7, y=100, z=100; B=82 → x capped (7·3=21≤82);
    // base=(82-7) div 2=37, rem=1 → y gets 38, z gets 37.
    val d = df("source STRING, n_chars BIGINT", Seq(
      Row("x", 3L), Row("x", 4L), Row("y", 100L), Row("z", 100L)))
    val out = Sampling.waterFillBudgets(d, budget = 82L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("x" -> 7L, "y" -> 38L, "z" -> 37L))
    assert(out.values.sum == 82L)
    // budget above total capacity: everyone keeps their cap
    val full = Sampling.waterFillBudgets(d, budget = 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full == Map("x" -> 7L, "y" -> 100L, "z" -> 100L))
  }

  test("waterFillBudgets: alloc never exceeds cap; repartition-invariant") {
    import org.apache.spark.sql.Row
    val rows = (0L until 40L).map(i => Row(s"s${i % 7}", i * 3 + 1))
    val d = df("source STRING, n_chars BIGINT", rows)
    val out = Sampling.waterFillBudgets(d, budget = 300L).collect()
    assert(out.forall(r => r.getLong(2) <= r.getLong(1) && r.getLong(2) >= 0))
    assert(out.map(_.getLong(2)).sum == 300L)
    val again = Sampling.waterFillBudgets(d.repartition(5), budget = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again == out.map(r => r.getString(0) -> r.getLong(2)).toMap)
  }

  test("shardBalanceAudit: a single-category corpus deviates by exactly zero") {
    // ct = n ⇒ obs·n = st·ct for every shard, whatever the shard hash does
    val d = docs.withColumn("cat", lit("only"))
    val out = Sampling.shardBalanceAudit(d, nShards = 4, catCol = "cat")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 4)
    assert(out.map(_._2).sum == 1000L, "shard totals must partition the corpus")
    assert(out.forall(r => r._3 == 1L && r._4 == 0L && r._5 == 0L))
  }

  test("shardBalanceAudit: zero cells count as full deviation; repartition-invariant") {
    // one doc carries a unique category: every OTHER shard's cell for it
    // is a zero cell with dev exactly 10⁶ (|0·n − st·ct| / (st·ct))
    val d = docs.withColumn("cat",
      when(col("doc_id") === 0L, "rare").otherwise("common"))
    val out = Sampling.shardBalanceAudit(d, nShards = 4, catCol = "cat").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(out.count(_._2 == 2L) == 1, "exactly one shard holds the rare cat")
    assert(out.filter(_._2 == 1L).forall(_._3 == 1000000L),
      "shards missing the rare cat must report a 10⁶-ppm max deviation")
    val again = Sampling.shardBalanceAudit(
      d.repartition(7), nShards = 4, catCol = "cat").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  // ------------------------------------------- coordinated join sampling

  test("coordinatedJoinSample: permille=1000 keeps everything and is exact") {
    import spark.implicits._
    val a = (0L until 60L).map(i => (i % 20L, if (i % 3 == 0) "x" else "y")).toDF("ka", "g")
    val b = (0L until 40L).map(i => i % 10L).toDF("kb")
    val out = Sampling.coordinatedJoinSample(a, "ka", b, "kb", "g", permille = 1000)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("sample_pairs") == r.getAs[Long]("exact_pairs"))
      assert(r.getAs[Long]("est_pairs") == r.getAs[Long]("exact_pairs"))
      assert(r.getAs[Long]("err_ppm") == 0L)
    }
  }

  test("coordinatedJoinSample: sampled join == full join restricted to surviving keys; every group reports") {
    import spark.implicits._
    val a = (0L until 200L).map(i => (i % 50L, s"g${i % 4}")).toDF("ka", "g")
    val b = (0L until 120L).map(i => i % 30L).toDF("kb")
    val p = 400
    val out = Sampling.coordinatedJoinSample(a, "ka", b, "kb", "g", permille = p)
    // independent restriction of the FULL join to the sampled keyspace
    val keep = Dedup.mixHash(col("ka"), Sampling.CoordJ) % 1000 < p
    val direct = a.join(b, col("ka") === col("kb")).filter(keep)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.collect().map(r =>
      r.getAs[String]("g") -> r.getAs[Long]("sample_pairs")).toMap
    // groups absent from the sampled universe still report (as zero)
    assert(got.keySet == Set("g0", "g1", "g2", "g3"))
    got.foreach { case (g, n) => assert(n == direct.getOrElse(g, 0L), s"group $g") }
    out.collect().foreach { r =>
      assert(r.getAs[Long]("sample_pairs") <= r.getAs[Long]("exact_pairs"))
      assert(r.getAs[Long]("est_pairs") ==
        r.getAs[Long]("sample_pairs") * 1000L / p)
    }
  }

  test("bootstrapMeanCI: CI brackets the truth, tightens with data, and is repartition-invariant") {
    import org.apache.spark.sql.functions.col
    def src(n: Long) = spark.range(n).toDF("id")
      .withColumn("x", (col("id") * 7919 % 1000) + 500) // mean ≈ 999.5
    val small = Sampling.bootstrapMeanCI(src(500), "id", col("x"), resamples = 50)
      .head()
    val big = Sampling.bootstrapMeanCI(src(20000), "id", col("x"), resamples = 50)
      .head()
    for (r <- Seq(small, big)) {
      val (mean, lo, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= mean && mean <= hi, s"CI must bracket the sample mean: $r")
      assert(r.getAs[Long]("resamples") == 50L)
    }
    // 40× more data → a (stochastically) much tighter interval; the
    // deterministic weights make this a fixed fact of the inputs, not luck
    val widthSmall = small.getAs[Double]("ci_hi") - small.getAs[Double]("ci_lo")
    val widthBig = big.getAs[Double]("ci_hi") - big.getAs[Double]("ci_lo")
    assert(widthBig < widthSmall / 2, s"$widthBig vs $widthSmall")
    // weights are a pure function of id: any physical layout, same row
    val re = Sampling.bootstrapMeanCI(src(500).repartition(7), "id", col("x"),
      resamples = 50).head()
    assert(re == small)
  }

  test("bootstrapMeanCI: hand-checked on a tiny frame — resample means are exact integer-sum divisions") {
    import org.apache.spark.sql.functions.col
    val d = df("id BIGINT, x BIGINT", Seq(
      org.apache.spark.sql.Row(1L, 10L),
      org.apache.spark.sql.Row(2L, 20L),
      org.apache.spark.sql.Row(3L, 60L)))
    val out = Sampling.bootstrapMeanCI(d, "id", col("x"),
      resamples = 5, loPermille = 200, hiPermille = 800).head()
    assert(out.getAs[Long]("n") == 3L)
    assert(out.getAs[Double]("mean") == 30.0)
    // recompute resample 0..4 means directly from the weight definition:
    // one per-row S-box mix, one affine map per replicate
    val means = (0 until 5).map { r =>
      val j = Sampling.BootJ + 2 * r
      val ws = Seq(1L, 2L, 3L).map { id =>
        val p5 = d.sparkSession.range(1).select(
          graft.ext.Dedup.perm5(graft.ext.Dedup.affineHash(
            org.apache.spark.sql.functions.lit(id), Sampling.BootJ)).as("p"))
          .head().getLong(0)
        val u = ((37L * j + 11L) * p5 + (101L * j + 31L)) %
          graft.ext.Dedup.MinHashP % 10000L
        Sampling.PoissonThresholds.count(t => u >= t).toLong
      }
      val sx = ws(0) * 10 + ws(1) * 20 + ws(2) * 60
      val nn = math.max(ws.sum, 1L)
      BigDecimal(sx.toDouble / nn).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sorted
    assert(out.getAs[Double]("ci_lo") == means(0)) // rank ceil(5·0.2)=1
    assert(out.getAs[Double]("ci_hi") == means(3)) // rank ceil(5·0.8)=4
  }

  test("bootstrapMeanCI: the permitted max m=500 stays codegen'd (melt aggregate, not 1002 sum columns)") {
    import org.apache.spark.sql.functions.col
    val d = spark.range(200).toDF("id").withColumn("x", col("id") % 50 + 10)
    // end-to-end at the max bound: this OOM'd outright with the previous
    // per-row m-wide weight array
    val r = Sampling.bootstrapMeanCI(d, "id", col("x"), resamples = 500).head()
    assert(r.getAs[Long]("resamples") == 500L)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean") &&
      r.getAs[Double]("mean") <= r.getAs[Double]("ci_hi"))
    // the scan+aggregate stage (pre-checkpoint) is whole-stage codegen'd
    // with a 2-column aggregate — plan size constant in m
    val sums = Sampling.bootstrapSums(d, "id", col("x"), 500)
    assert(sums.collect().length == 501) // executes → AQE finalizes the plan
    val plan = sums.queryExecution.executedPlan.toString
    // whole-stage codegen prints as the `*(n)` stage prefix
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"melt aggregate fell out of whole-stage codegen:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash aggregate:\n$plan")
  }
}
