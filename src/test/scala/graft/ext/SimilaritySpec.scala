package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*): org.apache.spark.sql.DataFrame =
    df("vec_id BIGINT, embedding ARRAY<DOUBLE>", rows.map { case (i, v) => Row(i, v) })

  test("cosine: orthogonal → 0, identical → 1, zero-norm → 0") {
    val d = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(2.0, 0.0), 4L -> Seq(0.0, 0.0))
    val out = d.as("a").crossJoin(d.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 0.0)
    assert(out((1L, 3L)) == 1.0)
    assert(out((1L, 4L)) == 0.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break; excludes self") {
    val d = vecs(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(1.0, 0.1),   // closest to 0
      2L -> Seq(1.0, 0.5),   // second
      3L -> Seq(0.0, 1.0))   // far
    val out = Similarity.bruteForceTopK(d.filter(col("vec_id") === 0), d, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("lshBucket: identical vectors always same bucket; deterministic") {
    val d = vecs(1L -> Seq(1.0, 2.0, -1.0, 0.5), 2L -> Seq(1.0, 2.0, -1.0, 0.5))
    val b = d.select(Similarity.lshBucket(col("embedding"), dim = 4, nPlanes = 8).as("b"))
      .collect().map(_.getLong(0))
    assert(b(0) == b(1))
  }

  test("lshTopK finds the exact-dup neighbor (same bucket by construction)") {
    val d = vecs(
      0L -> Seq(1.0, 2.0, -1.0, 0.5),
      1L -> Seq(1.0, 2.0, -1.0, 0.5),
      2L -> Seq(-9.0, 1.0, 8.0, -7.0))
    val out = Similarity.lshTopK(d.filter(col("vec_id") === 0), d, k = 3, dim = 4, nPlanes = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out.contains(1L) && out(1L) == 1.0)
  }

  test("embeddingNearDupPairs finds dup pair above threshold") {
    val d = vecs(
      1L -> Seq(1.0, 2.0, -1.0, 0.5),
      2L -> Seq(1.0, 2.0, -1.0, 0.5),
      3L -> Seq(-9.0, 1.0, 8.0, -7.0))
    val out = Similarity.embeddingNearDupPairs(d, threshold = 0.95, dim = 4, nPlanes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))
  }

  test("ivfTopK: exact-dup neighbor found via its centroid cell; ranks deterministic") {
    val d = vecs(
      0L -> Seq(1.0, 2.0, -1.0, 0.5),
      1L -> Seq(1.0, 2.0, -1.0, 0.5),    // dup of 0 → same cell
      2L -> Seq(0.9, 2.1, -0.9, 0.6),    // near 0
      3L -> Seq(-9.0, 1.0, 8.0, -7.0),   // far
      4L -> Seq(-8.0, 0.5, 7.0, -6.0))   // far, near 3
    val out = Similarity.ivfTopK(
      d.filter(col("vec_id") === 0), d, k = 2,
      centroids = d.filter(col("vec_id").isin(1L, 3L)), nProbe = 1)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.head == (1L, 1)) // dup found first via probed cell
    assert(out.map(_._1).forall(id => id != 3L && id != 4L)) // far cell not probed
  }

  test("ivfTopK under a corpus predicate: neighbors all satisfy it; empty cells degrade to fewer rows") {
    val d = df("vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>", Seq(
      org.apache.spark.sql.Row(0L, 1, Seq(1.0, 2.0, -1.0, 0.5)),
      org.apache.spark.sql.Row(1L, 2, Seq(1.0, 2.0, -1.0, 0.5)),   // dup of 0, label 2
      org.apache.spark.sql.Row(2L, 1, Seq(0.9, 2.1, -0.9, 0.6)),   // near 0, wrong label
      org.apache.spark.sql.Row(3L, 2, Seq(-9.0, 1.0, 8.0, -7.0)),  // far cell, label 2
      org.apache.spark.sql.Row(4L, 1, Seq(-8.0, 0.5, 7.0, -6.0))))
    // filtered corpus = labels 2 only; probe 1 cell around the query
    val out = Similarity.ivfTopK(
      d.filter(col("vec_id") === 0), d.filter(col("label") === 2), k = 3,
      centroids = d.filter(col("vec_id").isin(1L, 3L)), nProbe = 1)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // only the label-2 member of the probed cell comes back — the
    // wrong-label near neighbor (id 2) is gated, the far cell unprobed,
    // and the result set is legitimately smaller than k
    assert(out.toSeq == Seq((1L, 1)))
  }

  test("mmrRerank: redundancy penalty promotes the diverse candidate over the near-duplicate") {
    // query (1,1,0)/∠45°: a=(1,0,0) rel .707107; a2=(1,-0.001,0) ≈ a
    // (pair sim rounds to 1.0, rel just under a's); b=(0,1,0) rel .707107,
    // orthogonal to a. Plain top-3 order is a, a2, b (score then id) —
    // MMR with λ=0.7 picks a first, then b (penalty 0) over a2 (penalty 1).
    val d = vecs(
      0L -> Seq(1.0, 1.0, 0.0),
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(1.0, -0.001, 0.0),
      3L -> Seq(0.0, 1.0, 0.0))
    val out = Similarity.mmrRerank(d.filter(col("vec_id") === 0), d,
      candidates = 3, k = 3)
      .orderBy("pick_rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("multiProbeLshTopK: probes=0 equals single-bucket LSH; probing only adds candidates") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") % 50 === 0)
    assertSameRows(
      Similarity.multiProbeLshTopK(q, emb, k = 5, dim = 16, nPlanes = 8, probes = 0),
      Similarity.lshTopK(q, emb, k = 5, dim = 16, nPlanes = 8))
    // the probed candidate set is a superset of the single-bucket one
    val plain = Similarity.lshTopK(q, emb, k = 100000, dim = 16, nPlanes = 8)
      .select("query_id", "neighbor_id")
    val multi = Similarity.multiProbeLshTopK(q, emb, k = 100000, dim = 16,
      nPlanes = 8, probes = 3).select("query_id", "neighbor_id")
    assert(plain.exceptAll(multi).count() == 0)
    assert(multi.count() >= plain.count())
  }

  test("mmrSelect: externally-scored candidates honor the same greedy rule") {
    // scores come from an arbitrary arm (RRF-style), redundancy from the
    // vectors: 2 ≈ dup of 1 (sim rounds to 1.0), 3 orthogonal to 1
    val v = vecs(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(1.0, -0.001, 0.0),
      3L -> Seq(0.0, 1.0, 0.0))
    val cand = df("query_id BIGINT, neighbor_id BIGINT, score DOUBLE", Seq(
      org.apache.spark.sql.Row(0L, 1L, 0.9),
      org.apache.spark.sql.Row(0L, 2L, 0.89),
      org.apache.spark.sql.Row(0L, 3L, 0.5)))
    val out = Similarity.mmrSelect(cand,
      v.select(col("vec_id").as("vid"), col("embedding").as("vv")),
      k = 3, lambdaPpm = 700000L)
      .orderBy("pick_rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    // pick1 = 1; pick2: mmr(2) = .7·.89 − .3·1 = .323 < mmr(3) = .35 → 3
    assert(out.toSeq == Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("mmrRerank: λ = 1 degenerates to the brute-force top-k order") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val mmr = Similarity.mmrRerank(q, emb, candidates = 10, k = 5, lambdaPpm = 1000000L)
      .select(col("query_id"), col("neighbor_id"), col("pick_rank").as("rank"))
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    assertSameRows(mmr, brute)
  }

  test("adaptivePlanes: bucket space tracks corpus size, flat per-bucket load") {
    // smallest p with 64·2^p ≥ n
    assert(Similarity.adaptivePlanes(1) == 1)
    assert(Similarity.adaptivePlanes(128) == 1)
    assert(Similarity.adaptivePlanes(129) == 2)
    assert(Similarity.adaptivePlanes(500) == 3)
    assert(Similarity.adaptivePlanes(2000) == 5)
    assert(Similarity.adaptivePlanes(2000000) == 15)
    // 10× the corpus ⇒ ~10× the buckets (log2 10 ≈ 3.3 more planes)
    assert(Similarity.adaptivePlanes(20000) - Similarity.adaptivePlanes(2000) == 4)
    // clamped at 20 planes
    assert(Similarity.adaptivePlanes(Long.MaxValue) == 20)
    assert(Similarity.adaptivePlanes(100, targetBucketSize = 8) == 4)
  }

  test("maxBucketCandidates caps the per-bucket rerank set deterministically") {
    val d = vecs((0L until 8L).map(i => i -> Seq(1.0, 1.0, 1.0, 1.0)): _*)
    // all 8 identical vectors land in one bucket; cap 3 keeps ids 0,1,2
    val capped = Similarity.lshTopK(d.filter(col("vec_id") === 0), d, k = 10,
      dim = 4, nPlanes = 2, maxBucketCandidates = Some(3))
      .collect().map(_.getLong(1)).toSet
    assert(capped == Set(1L, 2L)) // 0 is the query (self-pair excluded)
    val uncapped = Similarity.lshTopK(d.filter(col("vec_id") === 0), d, k = 10,
      dim = 4, nPlanes = 2)
      .collect().map(_.getLong(1)).toSet
    assert(uncapped == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("hardNegatives: near-dups excluded, next-most-similar promoted into top-k") {
    // 0 and 1 are exact duplicates (near-dup pair, same bucket); 2 is
    // similar-but-not-dup; 3 is far — hard negatives for query 0 must
    // skip 1 and rank 2 first
    val d = vecs(
      0L -> Seq(1.0, 2.0, -1.0, 0.5),
      1L -> Seq(1.0, 2.0, -1.0, 0.5),
      2L -> Seq(1.0, 2.0, -1.0, -0.5),
      3L -> Seq(-9.0, 1.0, 8.0, -7.0))
    val out = Similarity.hardNegatives(d.filter(col("vec_id") === 0), d,
      k = 2, dupThreshold = 0.99, dim = 4, nPlanes = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((2L, 1), (3L, 2)))
    // with the dup threshold above every score, nothing is excluded
    val none = Similarity.hardNegatives(d.filter(col("vec_id") === 0), d,
      k = 1, dupThreshold = 1.1, dim = 4, nPlanes = 2)
      .collect().map(_.getLong(1))
    assert(none.toSeq == Seq(1L))
  }

  test("bruteForceTopK plan broadcasts the query side (no corpus shuffle)") {
    val d = vecs(0L -> Seq(1.0, 0.0), 1L -> Seq(0.5, 0.5))
    val plan = Similarity.bruteForceTopK(d.filter(col("vec_id") === 0), d, k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
  }

  test("annRecall: ppm hit rate per arm; empty arm still reports a 0 row") {
    def pairs(rows: (Long, Long)*): org.apache.spark.sql.DataFrame =
      df("query_id BIGINT, neighbor_id BIGINT",
        rows.map { case (q, n) => Row(q, n) })
    val exact = pairs(1L -> 10L, 1L -> 11L, 2L -> 20L, 2L -> 21L)
    val good = pairs(1L -> 10L, 1L -> 11L, 2L -> 20L, 2L -> 99L) // 3 of 4
    val empty = pairs()
    val out = Similarity.annRecall(exact, Seq("good" -> good, "empty" -> empty))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("good") == ((3L, 4L, 750000L)))
    assert(out("empty") == ((0L, 4L, 0L)))
  }

  test("minMaxNormalize: ppm rescale per dimension; constant dimension maps to 0") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.0f, 5.0f, 2.0f)),
      Row(2L, Seq(1.0f, 5.0f, 4.0f)),
      Row(3L, Seq(4.0f, 5.0f, 3.0f))))
    val out = Similarity.minMaxNormalize(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // dim0 range [0,4]: 0→0, 1→250000, 4→10⁶; dim1 constant → 0;
    // dim2 range [2,4]: 2→0, 4→10⁶, 3→500000
    assert(out(1L) == Seq(0L, 0L, 0L))
    assert(out(2L) == Seq(250000L, 0L, 1000000L))
    assert(out(3L) == Seq(1000000L, 0L, 500000L))
  }

  test("randomProject: hand-computed components on a tiny lattice") {
    // dim=2, outDim=2; weights w(j,i) = ((j*31 + i*17) % 7) - 3:
    // j=0: w(0,0)=-3, w(0,1)=((17)%7)-3=0; j=1: w(1,0)=((31)%7)-3=0,
    // w(1,1)=((48)%7)-3=3
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.0f, 2.0f)), Row(2L, Seq(-1.0f, 0.5f))))
    val out = Similarity.randomProject(emb, dim = 2, outDim = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(-3000000L, 6000000L))
    assert(out(2L) == Seq(3000000L, 1500000L))
  }

  test("randomProject: narrow plan — no exchange anywhere") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      (1L to 20L).map(i => Row(i, Seq(0.1f * i, 0.2f * i, 0.3f * i))))
    val plan = Similarity.randomProject(emb, dim = 3, outDim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("minMaxNormalize: result is repartition-invariant (no order-dependent float path)") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      (1L to 40L).map(i => Row(i, Seq(0.1f * i, -0.3f * i))))
    val a = Similarity.minMaxNormalize(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Similarity.minMaxNormalize(emb.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.values.flatten.forall(v => v >= 0L && v <= 1000000L))
  }

  test("ivfProbeCurve: recall is monotone in nProbe; each arm matches ivfTopK at that probe") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val cent = emb.filter(col("vec_id") % 37 === 0)
    val curve = Similarity.ivfProbeCurve(q, emb, k = 5, centroids = cent,
        probes = Seq(1, 3, 8)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(curve("probe_1") <= curve("probe_3") &&
      curve("probe_3") <= curve("probe_8"), s"recall must be monotone: $curve")
    // the p=3 arm must reproduce the standalone q27 operator exactly
    val solo = Similarity.annRecall(
      Similarity.bruteForceTopK(q, emb, k = 5),
      Seq("probe_3" -> Similarity.ivfTopK(q, emb, k = 5, centroids = cent,
        nProbe = 3))).head()
    val curveRow = Similarity.ivfProbeCurve(q, emb, k = 5, centroids = cent,
        probes = Seq(1, 3, 8)).filter(col("method") === "probe_3").head()
    assert(curveRow.getLong(1) == solo.getLong(1) &&
      curveRow.getLong(2) == solo.getLong(2))
  }

  private def ranking(rows: (Long, Long, Int)*) =
    df("query_id BIGINT, neighbor_id BIGINT, rank INT",
      rows.map { case (q, n, r) => Row(q, n, r) })

  test("rankAgreement: identical rankings score exactly 10^6") {
    val r = ranking((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val out = Similarity.rankAgreement(r, r, depth = 3).head()
    assert((out.getLong(1), out.getLong(2)) == (3L, 1000000L))
  }

  test("rankAgreement: disjoint rankings score 0 but stay in the panel") {
    val a = ranking((1L, 10L, 1), (1L, 11L, 2))
    val b = ranking((1L, 20L, 1), (1L, 21L, 2))
    val out = Similarity.rankAgreement(a, b, depth = 2).head()
    assert((out.getLong(1), out.getLong(2)) == (0L, 0L))
  }

  test("rankAgreement: hand-computed AO — swapped top-2 is exactly 1/2") {
    // k=1 prefixes disjoint (0/1), k=2 prefixes identical (2/2) → AO = 1/2
    val a = ranking((7L, 1L, 1), (7L, 2L, 2))
    val b = ranking((7L, 2L, 1), (7L, 1L, 2))
    val out = Similarity.rankAgreement(a, b, depth = 2).head()
    assert((out.getLong(1), out.getLong(2)) == (2L, 500000L))
  }

  test("rankAgreement: depth 40 stays exact (wsum·10⁶ would overflow Long)") {
    // identical depth-40 rankings: wsum = 40·lcm(1..40) ≈ 2.1·10¹⁷, and
    // the ×10⁶ ppm step reaches 2.1·10²³ — far past 2⁶³. The DECIMAL(38,0)
    // numerator must still deliver exactly 10⁶ (and 0 for disjoint lists).
    val a = ranking((1L to 40L).map(r => (5L, 100L + r, r.toInt)): _*)
    val out = Similarity.rankAgreement(a, a, depth = 40).head()
    assert((out.getLong(1), out.getLong(2)) == (40L, 1000000L))
    val b = ranking((1L to 40L).map(r => (5L, 900L + r, r.toInt)): _*)
    val dj = Similarity.rankAgreement(a, b, depth = 40).head()
    assert((dj.getLong(1), dj.getLong(2)) == (0L, 0L))
  }

  test("rankAgreement: ranks beyond depth are ignored; per-query rows") {
    val a = ranking((1L, 10L, 1), (1L, 99L, 3), (2L, 20L, 1))
    val b = ranking((1L, 10L, 1), (1L, 99L, 3), (2L, 21L, 1))
    val out = Similarity.rankAgreement(a, b, depth = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the rank-3 pair never enters; AO = (1/1 + 1/2)/2 = 3/4 — prefix
    // denominators stay k even when the truncated lists are shorter
    assert(out(1L) == (1L, 750000L))
    assert(out(2L) == (0L, 0L))
  }

  test("matryoshka truncation: tail-only differences collapse the truncated ranking, prefix-only keep AO perfect") {
    import spark.implicits._
    def vec(prefix: Seq[Double], tail: Seq[Double]): Seq[Double] = prefix ++ tail
    // corpus: neighbors 2 and 3 differ ONLY in dims 5..8 (the truncated-away
    // tail); neighbor 4 differs in the prefix
    val emb = Seq(
      (0L, vec(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 0.0))),
      (2L, vec(Seq(0.9, 0.1, 0.0, 0.0), Seq(0.4, 0.0, 0.0, 0.0))),
      (3L, vec(Seq(0.9, 0.1, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 0.0))),
      (4L, vec(Seq(0.2, 0.9, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 0.0)))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    def trunc(f: org.apache.spark.sql.DataFrame) =
      f.withColumn("embedding", slice(col("embedding"), 1, 4))
    val full = Similarity.bruteForceTopK(q, emb, k = 3)
    val cut = Similarity.bruteForceTopK(trunc(q), trunc(emb), k = 3)
    // truncated arm: 2 and 3 become identical -> tie broken by id -> the
    // full arm's order (3 before 2: no tail penalty) flips
    val fullOrder = full.orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val cutOrder = cut.orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(fullOrder == Seq(3L, 2L, 4L) && cutOrder == Seq(2L, 3L, 4L))
    val ao = Similarity.rankAgreement(full, cut, depth = 3).collect().head
    assert(ao.getAs[Long]("n_common") == 3L)
    assert(ao.getAs[Long]("ao_ppm") < 1000000L)
    // prefix-only corpus: truncation changes nothing -> AO exactly 1
    val same = emb.withColumn("embedding",
      concat(slice(col("embedding"), 1, 4), array(lit(0.0), lit(0.0), lit(0.0), lit(0.0))))
    val ao2 = Similarity.rankAgreement(
      Similarity.bruteForceTopK(same.filter(col("vec_id") === 0L), same, k = 3),
      Similarity.bruteForceTopK(trunc(same.filter(col("vec_id") === 0L)), trunc(same), k = 3),
      depth = 3).collect().head
    assert(ao2.getAs[Long]("ao_ppm") == 1000000L)
  }
}
