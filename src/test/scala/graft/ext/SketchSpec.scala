package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("k", "g")
  }

  // ------------------------------------------------------------ HyperLogLog

  test("mergeRegisters: hourly registers rolled up to daily ≡ daily sketch built from raw") {
    import spark.implicits._
    val ev = (0L until 600L).map { i =>
      val day = (i % 2) + 1
      val hour = (i % 5).toInt
      (i % 97, java.sql.Timestamp.valueOf(f"2024-01-0$day $hour%02d:30:00"))
    }.toDF("user_id", "ts")
    val hourly = Sketch.hllRegisters(
      ev.withColumn("hour", date_trunc("hour", col("ts"))), "user_id", Seq("hour"))
    val merged = Sketch.mergeRegisters(
      hourly.withColumn("day", to_date(col("hour"))), Seq("day"))
    val direct = Sketch.hllRegisters(
      ev.withColumn("day", to_date(col("ts"))), "user_id", Seq("day"))
    assertSameRows(merged, direct)
    // merge is idempotent: merging the merged table again changes nothing
    assertSameRows(Sketch.mergeRegisters(merged, Seq("day")), merged)
  }

  // ------------------------------------------------------------------- KMV

  test("kmvRegisters: ranked bottom-k of the distinct hash set; partitioning- and duplicate-invariant") {
    val k = 16
    val base = Sketch.kmvRegisters(ids(500), "k", Seq("g"), k).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // exactly k per group, ranks 1..k, h strictly increasing with rank
    assert(base.groupBy(_._1).forall(_._2.size == k))
    assert(base.groupBy(_._1).forall { case (_, rows) =>
      rows.toSeq.sortBy(_._2).map(_._3) == rows.toSeq.map(_._3).sorted })
    val repart = Sketch.kmvRegisters(ids(500).repartition(7), "k", Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val dups = Sketch.kmvRegisters(ids(500).union(ids(500)), "k", Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(base == repart, "registers must not depend on partitioning")
    assert(base == dups, "insertion dedups: duplicates must not move registers")
  }

  test("kmvRegisters: a group with fewer than k distinct keys stores its exact hash set") {
    val out = Sketch.kmvRegisters(ids(10), "k", Seq("g"), k = 16)
    assert(out.count() == 10) // 5 distinct per group, all kept
    assert(Sketch.kmvEstimate(out, Seq("g"), k = 16).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("a", 5L), ("b", 5L)))
  }

  test("kmvMerge: hourly registers rolled up ≡ sketch built from raw; merge idempotent") {
    import spark.implicits._
    val ev = (0L until 600L).map { i =>
      val day = (i % 2) + 1
      val hour = (i % 5).toInt
      (i % 97, java.sql.Timestamp.valueOf(f"2024-01-0$day $hour%02d:30:00"))
    }.toDF("user_id", "ts")
    val k = 32
    val hourly = Sketch.kmvRegisters(
      ev.withColumn("hour", date_trunc("hour", col("ts"))), "user_id", Seq("hour"), k)
    val merged = Sketch.kmvMerge(
      hourly.withColumn("day", to_date(col("hour"))), Seq("day"), k)
    val direct = Sketch.kmvRegisters(
      ev.withColumn("day", to_date(col("ts"))), "user_id", Seq("day"), k)
    assertSameRows(merged, direct)
    assertSameRows(Sketch.kmvMerge(merged, Seq("day"), k), merged)
  }

  test("kmvEstimate: within 25% of the true cardinality at n=2000") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, "x")).toDF("k", "g")
    val est = Sketch.kmvEstimate(
      Sketch.kmvRegisters(df, "k", Seq("g"), 128), Seq("g"), 128).head().getLong(1)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.25, s"estimate $est vs 2000")
  }

  test("kmvOverlap: exact when sets fit in k; estimates within 30% on overlapping ranges") {
    import spark.implicits._
    // small: a = {0..9}, b = {5..14} → union 15 < k ⇒ exact
    val small = ((0L until 10L).map(i => (i, "a")) ++
      (5L until 15L).map(i => (i, "b"))).toDF("k", "g")
    val exact = Sketch.kmvOverlap(
      Sketch.kmvRegisters(small, "k", Seq("g"), 64), "g", 64).head()
    assert(exact.getAs[Long]("union_est") == 15L)
    assert(exact.getAs[Long]("inter_est") == 5L)
    // large: a = {0..1999}, b = {1000..2999} → true J = 1/3, |A∩B| = 1000
    val big = ((0L until 2000L).map(i => (i, "a")) ++
      (1000L until 3000L).map(i => (i, "b"))).toDF("k", "g")
    val est = Sketch.kmvOverlap(
      Sketch.kmvRegisters(big, "k", Seq("g"), 256), "g", 256).head()
    assert(math.abs(est.getAs[Long]("inter_est") - 1000.0) / 1000.0 < 0.3,
      s"inter_est ${est.getAs[Long]("inter_est")} vs 1000")
    assert(math.abs(est.getAs[Double]("jaccard") - 1.0 / 3) < 0.1)
  }

  test("hllRegisters: registers are partitioning-invariant and duplicate-insensitive") {
    val base = Sketch.hllRegisters(ids(500), "k", Seq("g")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val repart = Sketch.hllRegisters(ids(500).repartition(7), "k", Seq("g")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val dups = Sketch.hllRegisters(ids(500).union(ids(500)), "k", Seq("g")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(base == repart, "registers must not depend on partitioning")
    assert(base == dups, "max is idempotent: duplicates must not move registers")
  }

  test("hllRegisters: sketch merge (max of registers) equals sketch of union") {
    val left = ids(400).filter(col("k") < 200)
    val right = ids(400).filter(col("k") >= 100) // overlapping halves
    val merged = Sketch.hllRegisters(left, "k", Seq("g"))
      .union(Sketch.hllRegisters(right, "k", Seq("g")))
      .groupBy("g", "bucket").agg(max("reg").cast("int").as("reg"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val whole = Sketch.hllRegisters(ids(400), "k", Seq("g")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(merged == whole)
  }

  test("hllEstimate: within 25% of the true cardinality at n=2000") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, "x")).toDF("k", "g")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, "k", Seq("g")), Seq("g")).head().getLong(1)
    // m=64 → σ ≈ 13% for ideal hashes; the 2-wise affine family is
    // deliberately weaker (engine portability over independence) — bound
    // loosely, this is a sanity rail not a precision claim
    assert(est > 1500 && est < 2500, s"estimate $est too far from 2000")
  }

  test("hllEstimate: small-range linear counting stays near-exact") {
    import spark.implicits._
    val df = (0L until 30L).map(i => (i, "x")).toDF("k", "g")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, "k", Seq("g")), Seq("g")).head().getLong(1)
    assert(est >= 25 && est <= 35, s"linear-counting estimate $est far from 30")
  }

  // -------------------------------------------------------------- Count-Min

  test("countMinSketch: cell totals per row equal the input row count") {
    import spark.implicits._
    val items = Seq.tabulate(300)(i => i.toLong % 17L).toDF("x")
    val sk = Sketch.countMinSketch(items, col("x"), depth = 4, width = 64)
    val perRow = sk.groupBy("row").agg(sum("cnt").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == Set(0, 1, 2, 3))
    assert(perRow.values.forall(_ == 300L), s"every row must account for all items: $perRow")
  }

  test("countMinSketchWeighted over partial counts equals the per-occurrence sketch") {
    import spark.implicits._
    val items = Seq.tabulate(500)(i => i.toLong % 23L).toDF("x")
    val perOcc = Sketch.countMinSketch(items, col("x"), depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val weighted = Sketch.countMinSketchWeighted(
      items.groupBy("x").agg(count(lit(1)).as("w")), col("x"), col("w"),
      depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(weighted == perOcc, "counts are additive: partial-count input must yield the identical sketch")
  }

  test("cmEstimate: upper-bounds the true count and is exact without collisions") {
    import spark.implicits._
    // 10 distinct items, width 2048 → collisions vanishingly unlikely
    val items = (0 until 10).flatMap(i => Seq.fill(i + 1)(i.toLong)).toDF("x")
    val truth = items.groupBy("x").agg(count(lit(1)).as("n"))
    val sk = Sketch.countMinSketch(items, col("x"))
    val out = Sketch.cmEstimate(sk, truth, col("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10)
    out.foreach { case (x, n, est) =>
      assert(est >= n, s"CM estimate must never undercount: item $x est $est < $n")
      assert(est == n, s"width 2048 with 10 items should be collision-free: $x $est vs $n")
    }
  }

  // ------------------------------------------------------------------ Bloom

  test("bloomSemiJoin: every true member survives; result is deterministic") {
    import spark.implicits._
    val build = (0L until 50L).map(i => i * 3).toDF("bk")
    val probe = (0L until 300L).map(i => (i, i % 150)).toDF("id", "pk")
    val out = Sketch.bloomSemiJoin(probe, "pk", build, "bk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val members = probe.join(build, col("pk") === col("bk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(members.subsetOf(out), "a Bloom filter has no false negatives")
    val again = Sketch.bloomSemiJoin(probe.repartition(5), "pk", build, "bk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == again, "surviving set is a pure function of the keys")
  }

  test("bloomSemiJoin: false-positive rate stays near theory at 8192 bits") {
    import spark.implicits._
    val build = (0L until 500L).toDF("bk")
    val probe = (10000L until 14000L).map(i => (i, i)).toDF("id", "pk") // disjoint keys
    val fp = Sketch.bloomSemiJoin(probe, "pk", build, "bk").count()
    // k=3, m=8192, n=500 → p ≈ (1-e^(-3·500/8192))^3 ≈ 0.47% → ~19 of 4000.
    // The affine family is only 2-wise independent; allow a wide rail.
    assert(fp < 200, s"false-positive count $fp implausibly high")
  }

  test("bitmapIndex: packed words encode exactly the key set; duplicates free") {
    import spark.implicits._
    // keys straddling a word boundary, with heavy duplication
    val df = Seq.fill(4)(Seq(("g1", 0L), ("g1", 63L), ("g1", 64L), ("g2", 1L)))
      .flatten.toDF("g", "k")
    val words = Sketch.bitmapIndex(df, "g", "k").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(words == Map(
      ("g1", 0L) -> ((1L << 0) | (1L << 63)),
      ("g1", 1L) -> (1L << 0),
      ("g2", 0L) -> (1L << 1)))
  }

  test("bitmapOverlap: popcount equals the true distinct intersection size") {
    import spark.implicits._
    // g1 = {0..99}, g2 = {50..149}, g3 = {200..202} (disjoint from both)
    val df = ((0L until 100L).map("g1" -> _) ++ (50L until 150L).map("g2" -> _)
      ++ (200L until 203L).map("g3" -> _)).toDF("g", "k")
    val bm = Sketch.bitmapIndex(df, "g", "k")
    val out = Sketch.bitmapOverlap(bm, "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // only the overlapping pair appears; |{50..99}| = 50
    assert(out == Map(("g1", "g2") -> 50L))
  }

  test("bitmap is mergeable: partitioning never changes words or overlaps") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (s"g${i % 7}", (i * 37L) % 500L))
      .toDF("g", "k")
    val a = Sketch.bitmapOverlap(Sketch.bitmapIndex(df, "g", "k"), "g")
      .collect().map(_.toSeq).toSet
    val b = Sketch.bitmapOverlap(Sketch.bitmapIndex(df.repartition(11), "g", "k"), "g")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // and the popcounts agree with COUNT(DISTINCT) ground truth
    val truth = df.distinct().as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).toSet }
    val want = (for {
      (ga, sa) <- truth; (gb, sb) <- truth if ga < gb
      c = (sa intersect sb).size if c > 0
    } yield (ga, gb) -> c.toLong).toMap
    val got = a.map(s => (s(0).toString, s(1).toString) -> s(2).asInstanceOf[Long]).toMap
    assert(got == want)
  }

  // ----------------------------------------- log-linear quantile sketch

  private def quantileMap(d: org.apache.spark.sql.DataFrame): Map[(String, Int), Long] =
    d.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("logHistQuantiles: exact below 2^(subBits+1), bounded relative error above") {
    import spark.implicits._
    // group "small": all values < 32 → every bucket exact at subBits=4.
    // group "wide": 7 octaves of spread, deterministic non-uniform values.
    val vals =
      (1L to 500L).map(i => ("small", i % 31 + 1)) ++
      (1L to 2000L).map(i => ("wide", (i * i * 37 + i) % 100000 + 1))
    val d = vals.toDF("g", "x")
    val est = quantileMap(Sketch.logHistQuantiles(
      Sketch.logHistogram(d, col("x"), Seq("g")), Seq("g")))
    // ground truth: value at rank ceil(n*q/100) in sorted order
    val truth = vals.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      Seq(50, 90, 99).map(q =>
        (g, q) -> sorted((sorted.size * q + 99) / 100 - 1))
    }
    for (((g, q), exact) <- truth) {
      val e = est((g, q))
      if (g == "small") assert(e == exact, s"($g,$q): $e != $exact")
      else {
        // bucket lower bound: est ≤ exact < est·(1 + 2^-4)
        assert(e <= exact && exact < e + (e >> 4) + 1,
          s"($g,$q): est $e not within 1/16 below exact $exact")
      }
    }
  }

  test("native log-bucket kernel ≡ composed bin()-length form on every edge") {
    import spark.implicits._
    val edges = Seq(0L, 1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 33L,
      255L, 256L, 257L, 1023L, 1024L, 1025L,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 1,
      (1L << 62) - 1, 1L << 62, Long.MaxValue,
      -1L, -32L, Long.MinValue)
    for (b <- Seq(3, 4, 6)) {
      val cap = 1L << (b + 1)
      val d = edges.toDF("x").selectExpr(
        "x",
        s"graft_log_bucket_id(x, $b) AS nid",
        s"graft_log_bucket_rep(x, $b) AS nrep",
        s"cast(greatest(length(bin(x)) - ${1 + b}, 0) as bigint) * $cap" +
          s" + shiftright(x, greatest(length(bin(x)) - ${1 + b}, 0)) AS cid",
        s"shiftleft(shiftright(x, greatest(length(bin(x)) - ${1 + b}, 0))," +
          s" greatest(length(bin(x)) - ${1 + b}, 0)) AS crep")
      d.collect().foreach { r =>
        assert(r.getLong(1) == r.getLong(3),
          s"id mismatch at x=${r.getLong(0)} subBits=$b")
        assert(r.getLong(2) == r.getLong(4),
          s"rep mismatch at x=${r.getLong(0)} subBits=$b")
      }
    }
  }

  test("logHistogram: shard merge ≡ direct build; counts conserved") {
    import spark.implicits._
    val d = (1L to 3000L).map(i => ("g", (i * 131 + 7) % 50000)).toDF("g", "x")
    val direct = Sketch.logHistogram(d, col("x"), Seq("g"))
    val sharded = Sketch.mergeLogHistograms(
      Sketch.logHistogram(d.filter(col("x") % 3 === 0), col("x"), Seq("g"))
        .unionByName(Sketch.logHistogram(d.filter(col("x") % 3 =!= 0), col("x"), Seq("g"))),
      Seq("g"))
    assertSameRows(direct.orderBy("bucket_id"), sharded.orderBy("bucket_id"))
    val total = direct.agg(sum("cnt")).head().getLong(0)
    assert(total == 3000L)
    // bounded state: bucket rows ≤ octaves · 2^subBits (+ exact small buckets)
    assert(direct.count() <= (64 - 4) * 16 + 32)
  }

  test("logHistErrorAudit: every estimate within the 2^-subBits design bound; exact below the cap") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
        col("o_orderkey"))
    val out = Sketch.logHistErrorAudit(orders, "cents", "o_orderkey",
      Seq("o_orderpriority"), subBits = 4).collect()
    assert(out.nonEmpty)
    // relative error ≤ 2^-4 (62500 ppm) by construction: rep ≤ true < rep·(1+1/16)
    assert(out.forall(_.getLong(4) <= 62500L),
      out.filter(_.getLong(4) > 62500L).mkString(", "))
    // the estimate is the bucket's LOWER bound: never above the exact value
    assert(out.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  // ------------------------------------------------------- CM join size

  test("cmJoinSize: per-row inner products upper-bound the exact join size; est is their min") {
    import spark.implicits._
    // skewed key profile: key k appears k+1 times on side A, once on B
    val a = (0L until 40L).flatMap(k => Seq.fill(k.toInt % 5 + 1)(k)).toDF("ka")
    val b = (0L until 40L by 2L).toDF("kb")
    val out = Sketch.cmJoinSize(a, col("ka"), b, col("kb"),
      depth = 4, width = 16).collect()
    assert(out.length == 1)
    val r = out.head
    val exact = r.getAs[Long]("exact_pairs")
    val ests = (0 until 4).map(i => r.getAs[Long](s"est_r$i"))
    // independent exact: sum over matched keys of cntA * cntB
    val direct = a.groupBy("ka").count().withColumnRenamed("count", "na")
      .join(b.groupBy("kb").count().withColumnRenamed("count", "nb"),
        col("ka") === col("kb"))
      .agg(sum(col("na") * col("nb"))).as[Long].head()
    assert(exact == direct)
    assert(ests.forall(_ >= exact), s"row estimate under exact: $ests vs $exact")
    assert(r.getAs[Long]("est_pairs") == ests.min)
    assert(r.getAs[Long]("err_ppm") ==
      ests.min * 1000000L / exact - 1000000L)
  }

  test("cmJoinSize: occurrence multiplicity flows through the weighted sketch (doubling one side doubles everything)") {
    import spark.implicits._
    val a = (0L until 30L).toDF("k")
    val b = (0L until 30L by 3L).toDF("k")
    val once = Sketch.cmJoinSize(a, col("k"), b, col("k"), 4, 8).collect().head
    val twice = Sketch.cmJoinSize(a.union(a), col("k"), b, col("k"), 4, 8).collect().head
    assert(twice.getAs[Long]("exact_pairs") == 2 * once.getAs[Long]("exact_pairs"))
    (0 until 4).foreach { i =>
      assert(twice.getAs[Long](s"est_r$i") == 2 * once.getAs[Long](s"est_r$i"))
    }
  }

  test("bloomFprAudit: zero false negatives; counts reconcile with a direct pass/membership recomputation") {
    import spark.implicits._
    val build = (0L until 80L).map(i => i * 3).toDF("bk")
    val probe = (0L until 300L).toDF("pk")
    val k = 3; val mBits = 512
    val r = Sketch.bloomFprAudit(probe, "pk", build, "bk", k, mBits).collect().head
    assert(r.getAs[Long]("n_build_keys") == 80L)
    // every member passes — Bloom filters have no false negatives
    assert(r.getAs[Long]("n_member_pass") == r.getAs[Long]("n_member_keys"))
    assert(r.getAs[Long]("n_member_keys") == 80L)  // multiples of 3 below 240
    assert(r.getAs[Long]("n_nonmember_keys") == 220L)
    // direct recomputation of false passes via the production filter
    val passed = Sketch.bloomSemiJoin(probe, "pk", build, "bk", k, mBits)
      .collect().map(_.getLong(0)).toSet
    val member = (x: Long) => x % 3 == 0 && x < 240
    val falsePass = (0L until 300L).count(x => !member(x) && passed(x)).toLong
    assert(r.getAs[Long]("n_false_pass") == falsePass)
    assert(r.getAs[Long]("fp_ppm") == falsePass * 1000000L / 220L)
  }

  test("countSketch: exact on sparse keys, linear under subtraction") {
    val a = df("k BIGINT, w BIGINT", Seq(Row(1L, 5L), Row(2L, 3L), Row(3L, 7L)))
    val b = df("k BIGINT, w BIGINT", Seq(Row(1L, 9L), Row(2L, 3L), Row(4L, 2L)))
    val sa = Sketch.countSketchWeighted(a, col("k"), col("w"))
    val sb = Sketch.countSketchWeighted(b, col("k"), col("w"))
    // cell-wise difference == sketch of the signed delta stream
    val diff = sb.withColumnRenamed("cnt", "c2")
      .join(sa.withColumnRenamed("cnt", "c1"), Seq("row", "bucket"), "full")
      .select(col("row"), col("bucket"),
        (coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L))).as("cnt"))
    val deltaStream = df("k BIGINT, w BIGINT", Seq(
      Row(1L, 4L), Row(2L, 0L), Row(3L, -7L), Row(4L, 2L)))
    val direct = Sketch.countSketchWeighted(deltaStream, col("k"), col("w"))
    assert(rowSet(diff.filter(col("cnt") =!= 0L))
      == rowSet(direct.filter(col("cnt") =!= 0L)))
    // with 4 keys in 256 buckets the median estimate is exact, sign
    // included
    val q = df("k BIGINT", Seq(Row(1L), Row(3L), Row(4L), Row(9L)))
    val est = Sketch.csEstimate(diff, q, col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(1L -> 4L, 3L -> -7L, 4L -> 2L, 9L -> 0L))
  }

  test("csEstimate: duplicate query rows each keep their own median row") {
    val items = df("k BIGINT, w BIGINT", Seq(Row(1L, 5L), Row(2L, 3L)))
    val sk = Sketch.countSketchWeighted(items, col("k"), col("w"))
    // the same query row three times: keying the median window by the
    // query columns alone would fuse them into one 3·depth partition and
    // emit one row with a wrong "median"; the per-row id keeps three
    // independent depth-row medians
    val q = df("k BIGINT", Seq(Row(1L), Row(1L), Row(1L)))
    val est = Sketch.csEstimate(sk, q, col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(est == Seq((1L, 5L), (1L, 5L), (1L, 5L)))
  }

  test("cmJoinSize: disjoint key sets degrade to honest zeros, never nulls") {
    val a = df("k BIGINT", (1L to 5L).map(Row(_)))
    val b = df("k BIGINT", (1001L to 1005L).map(Row(_)))
    val r = Sketch.cmJoinSize(a, col("k"), b, col("k"), depth = 4, width = 2048)
      .collect().head
    assert(r.getAs[Long]("exact_pairs") == 0L)
    // est columns are concrete longs (bucket collisions may make them > 0)
    (0 until 4).foreach(i => assert(!r.isNullAt(r.fieldIndex(s"est_r$i"))))
    val est = r.getAs[Long]("est_pairs")
    assert(est >= 0L)
    // ppm error against the greatest(exact, 1) floor — defined, not null
    assert(r.getAs[Long]("err_ppm") == est * 1000000L - 1000000L)
  }

  test("joinCardEstimates: uniformity formula vs CM vs exact, hand-traced") {
    val a = df("k BIGINT", Seq(1L, 1L, 1L, 2L).map(Row(_)))
    val b = df("k BIGINT", Seq(1L, 2L, 2L, 3L).map(Row(_)))
    val r = Sketch.joinCardEstimates(a, col("k"), b, col("k")).collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("d_a") == 2L)
    assert(r.getAs[Long]("n_b") == 4L && r.getAs[Long]("d_b") == 3L)
    // exact = 3·1 (k=1) + 1·2 (k=2) = 5; uniformity: 4·4 div 3 = 5
    assert(r.getAs[Long]("exact_pairs") == 5L)
    assert(r.getAs[Long]("est_uniform") == 5L)
    assert(r.getAs[Long]("err_uniform_ppm") == 0L)
    // CM only ever overcounts; with 3 keys in 256 buckets it is exact
    assert(r.getAs[Long]("est_cm") == 5L)
    assert(r.getAs[Long]("err_cm_ppm") == 0L)
  }

  test("joinCardEstimates: skew makes uniformity undercount, CM stays >= exact") {
    // one hot key on both sides: exact = 50·50 + 10 = 2510;
    // uniformity = 60·60 div 11 = 327 — a 7.7× undercount
    val a = df("k BIGINT", (Seq.fill(50)(0L) ++ (1L to 10L)).map(Row(_)))
    val b = df("k BIGINT", (Seq.fill(50)(0L) ++ (1L to 10L)).map(Row(_)))
    val r = Sketch.joinCardEstimates(a, col("k"), b, col("k")).collect().head
    assert(r.getAs[Long]("exact_pairs") == 2510L)
    assert(r.getAs[Long]("est_uniform") == 327L)
    assert(r.getAs[Long]("err_uniform_ppm") < -800000L) // severe undercount
    assert(r.getAs[Long]("est_cm") >= 2510L)             // CM: upper bound
    assert(r.getAs[Long]("err_cm_ppm") >= 0L)
  }

  test("csF2Estimate: collision-free sketch reads F2 exactly; estimate tracks under collisions") {
    import org.apache.spark.sql.functions._
    // 3 keys with counts 3, 2, 1 → F2 = 9 + 4 + 1 = 14; width 256 over 3
    // keys is (with these hash constants, verified) collision-free per
    // row, so every row's sum cell² IS F2 and the median is exact
    val items = df("k BIGINT", (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L))
      .map(org.apache.spark.sql.Row(_)))
    val sk = Sketch.countSketchWeighted(items, col("k"), lit(1L),
      depth = 5, width = 256)
    assert(Sketch.csF2Estimate(sk, 5).head().getLong(0) == 14L)
    // width 2 forces collisions: the estimate stays within the AMS
    // variance envelope (loose sanity band, deterministic inputs)
    val sk2 = Sketch.countSketchWeighted(items, col("k"), lit(1L),
      depth = 5, width = 2)
    val est = Sketch.csF2Estimate(sk2, 5).head().getLong(0)
    assert(est >= 0L && est <= 3 * 14L, s"estimate $est out of band")
  }

  test("csF2Estimate: repartition-invariant (pure function of the multiset)") {
    import org.apache.spark.sql.functions._
    val items = spark.range(500).toDF("k")
      .withColumn("k", col("k") % 37)
    val a = Sketch.csF2Estimate(
      Sketch.countSketchWeighted(items, col("k"), lit(1L), 5, 64), 5).head()
    val b = Sketch.csF2Estimate(
      Sketch.countSketchWeighted(items.repartition(7), col("k"), lit(1L), 5, 64),
      5).head()
    assert(a == b)
  }
}
