package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class SearchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("invertedIndex: postings carry tf, positions, and df; minDf prunes") {
    val d = docs(
      1L -> "spark spark table",
      2L -> "table scan",
      3L -> "only once")
    val out = Search.invertedIndex(d, minDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSet
    // only "table" appears in ≥2 docs
    assert(out == Set(
      ("table", 2L, 1L, 1L, 2, 2),
      ("table", 2L, 2L, 1L, 0, 0)))
    val all = Search.invertedIndex(d, minDf = 1)
    assert(all.filter("token = 'spark'").collect().map(r =>
      (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toSeq == Seq((1L, 2L, 0, 1)))
  }

  test("phraseMatch: counts consecutive occurrences, including overlapping repeats") {
    val d = docs(
      1L -> "a b a b c", // "a b" twice
      2L -> "a a a", // "a a" overlaps: positions 0-1 and 1-2
      3L -> "b a", // reversed — no "a b" match
      4L -> "a x b") // gap — no match
    val ab = Search.phraseMatch(d, Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ab == Map(1L -> 2L))
    val aa = Search.phraseMatch(d, Seq("a", "a")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(aa == Map(2L -> 2L))
    // three-token phrase exercises the fold of aligned joins
    val abc = Search.phraseMatch(d, Seq("a", "b", "c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(abc == Map(1L -> 1L))
  }

  test("bm25TopK: rare-term match outranks common-term match; k bounds output") {
    // "rare" appears in 1 doc, "common" in 9 — doc 1 must rank first
    val d = docs((1L -> "rare word") +: (2L to 10L).map(i => i -> "common word"): _*)
    val out = Search.bm25TopK(d, Seq("rare", "common"), k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(out.length == 3)
    assert(out.head == (1L, 1), s"rare-term doc must rank 1: ${out.toSeq}")
  }

  test("bm25TopK: deterministic — two runs produce identical rows") {
    val d = docs((1L to 20L).map(i =>
      i -> Seq.fill((i % 5 + 1).toInt)("join scan").mkString(" ")): _*)
    val a = Search.bm25TopK(d, Seq("join", "scan"), k = 10).collect().toSeq
    val b = Search.bm25TopK(d, Seq("join", "scan"), k = 10).collect().toSeq
    assert(a == b)
  }

  private def ranking(rows: (Long, Int)*) =
    df("doc_id BIGINT, rank INT", rows.map { case (i, r) => Row(i, r) })

  test("rrfFuse: integer contributions sum across arms; id tie-break; singleton-arm docs fuse in") {
    // c=60 contributions: rank1 → 1000000 div 61 = 16393,
    // rank2 → 16129, rank3 → 15873
    val armA = ranking(10L -> 1, 20L -> 2, 30L -> 3)
    val armB = ranking(40L -> 1, 20L -> 2)
    val out = Search.rrfFuse(Seq(armA, armB), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // 20 in both arms (16129·2); 10 vs 40 tie at 16393 → id order
    assert(out == Seq((20L, 32258L, 1), (10L, 16393L, 2),
      (40L, 16393L, 3), (30L, 15873L, 4)))
  }

  test("rrfFuse: k bounds the fused list") {
    val out = Search.rrfFuse(
      Seq(ranking(1L -> 1, 2L -> 2), ranking(3L -> 1)), k = 2)
    assert(out.count() == 2)
  }

  test("rrfFusePerQuery: fusion is independent per query; absent docs contribute 0") {
    def panel(rows: (Long, Long, Int)*) =
      df("query_id BIGINT, doc_id BIGINT, rank INT",
        rows.map { case (q, dcc, r) => Row(q, dcc, r) })
    val a = panel((1L, 10L, 1), (1L, 20L, 2), (2L, 30L, 1))
    val b = panel((1L, 20L, 1), (2L, 40L, 1))
    val out = Search.rrfFusePerQuery(a, b, k0 = 60, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // q1: doc 20 = 16129 + 16393 = 32522 beats doc 10's 16393;
    // q2: docs 30 and 40 tie at 16393 → doc_id order
    assert(out == Set(
      (1L, 20L, 32522L, 1), (1L, 10L, 16393L, 2),
      (2L, 30L, 16393L, 1), (2L, 40L, 16393L, 2)))
  }

  test("rrfFusePerQuery: k bounds each query's fused list") {
    def panel(rows: (Long, Long, Int)*) =
      df("query_id BIGINT, doc_id BIGINT, rank INT",
        rows.map { case (q, dcc, r) => Row(q, dcc, r) })
    val a = panel((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val b = panel((1L, 40L, 1))
    val out = Search.rrfFusePerQuery(a, b, k0 = 60, k = 2)
    assert(out.count() == 2)
  }

  test("andSearch: every term required; total tf ranks; duplicate query terms collapse") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "hash join hash scan"),   // both terms, tf 2+1 = 3 (hash dup'd)
      Row(2L, "hash scan hash"),        // no join → out
      Row(3L, "join hash"),             // both, tf 2
      Row(4L, "sort merge")))           // neither
    val out = Search.andSearch(docs, Seq("hash", "join", "hash"), k = 10)
    assert(out.columns.toSeq == Seq("doc_id", "total_tf"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (3L, 2L)))
  }

  test("andSearch: tf tie breaks by doc id; k truncates") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(5L, "a b"), Row(2L, "a b"), Row(9L, "a b")))
    assert(Search.andSearch(docs, Seq("a", "b"), k = 2).collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 5L))
  }

  private def ranked(rows: (Long, Long, Int)*) =
    df("query_id BIGINT, doc_id BIGINT, rank INT",
      rows.map { case (q, d, r) => Row(q, d, r) })
  private def judged(rows: (Long, Long, Int)*) =
    df("query_id BIGINT, doc_id BIGINT, grade INT",
      rows.map { case (q, d, g) => Row(q, d, g) })

  test("ndcgAtK: perfect ranking scores exactly 10^6; reversal scores the hand-traced ppm") {
    // grades 3, 1 at ranks 1, 2 — ideal order. disc = ndcgDiscounts(2)
    val qrels = judged((1L, 10L, 3), (1L, 11L, 1))
    val perfect = Search.ndcgAtK(ranked((1L, 10L, 1), (1L, 11L, 2)), qrels, k = 2)
      .head()
    assert(perfect.getLong(3) == 1000000L)
    // reversed: DCG = 1·d1 + 7·d2, IDCG = 7·d1 + 1·d2 — exact integer trace
    val d = Search.ndcgDiscounts(2)
    val rev = Search.ndcgAtK(ranked((1L, 11L, 1), (1L, 10L, 2)), qrels, k = 2)
      .head()
    val expected = (BigInt(1 * d(0) + 7 * d(1)) * 1000000 /
      BigInt(7 * d(0) + 1 * d(1))).toLong
    assert((rev.getLong(1), rev.getLong(2), rev.getLong(3)) ==
      (1 * d(0) + 7 * d(1), 7 * d(0) + 1 * d(1), expected))
  }

  test("ndcgAtK: unjudged ranked docs gain 0; judged-but-unranked queries stay in the panel at 0") {
    val out = Search.ndcgAtK(
      ranked((1L, 99L, 1)),                       // ranked doc never judged
      judged((1L, 10L, 2), (2L, 20L, 3)), k = 3)  // query 2 has no ranking
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L)._1 == 0L && out(2L)._2 == 0L)
    assert(out.size == 2)
  }

  test("ndcgAtK: ideal truncates at k — extra judged docs beyond k don't inflate IDCG") {
    val qrels = judged((1 to 5).map(i => (1L, 10L + i, 2)): _*)
    val out = Search.ndcgAtK(
      ranked((1L, 11L, 1), (1L, 12L, 2)), qrels, k = 2).head()
    val d = Search.ndcgDiscounts(2)
    assert(out.getLong(2) == 3 * d(0) + 3 * d(1)) // only the top-2 ideal slots
    assert(out.getLong(3) == 1000000L)            // both ranked docs are grade-2 hits
  }

  test("precisionRecallAtK: hand-computed micro P@k and macro floored R@k; no-qrel queries weigh in") {
    import org.apache.spark.sql.Row
    val ranking = df("query_id BIGINT, doc_id BIGINT, rank INT", Seq(
      Row(1L, 100L, 1), Row(1L, 101L, 2), Row(1L, 102L, 3), // rel: 100, 102
      Row(2L, 200L, 1), Row(2L, 201L, 2), Row(2L, 202L, 3))) // no qrels
    val qrels = df("query_id BIGINT, doc_id BIGINT",
      Seq(Row(1L, 100L), Row(1L, 102L)))
    val out = Search.precisionRecallAtK(ranking, qrels, kMax = 3)
    assert(out.columns.toSeq == Seq("k", "total_hits", "p_at_k_ppm", "r_at_k_ppm"))
    assert(rowSet(out) == rows(
      Seq("1", "1", "500000", "250000"), // P = 1/2; R = (500000 + 0)/2
      Seq("2", "1", "250000", "250000"), // P = 1/4
      Seq("3", "2", "333333", "500000"))) // q1 hits both → R = (1e6 + 0)/2
  }

  test("precisionRecallAtK: short lists charge only filled slots to micro P@k") {
    import org.apache.spark.sql.Row
    val ranking = df("query_id BIGINT, doc_id BIGINT, rank INT", Seq(
      Row(1L, 100L, 1),                  // q1 returns ONE row (a hit)
      Row(2L, 200L, 1), Row(2L, 201L, 2))) // q2 full 2 rows, no hits
    val qrels = df("query_id BIGINT, doc_id BIGINT", Seq(Row(1L, 100L)))
    val out = Search.precisionRecallAtK(ranking, qrels, kMax = 2)
    // k=2: slots = 1 (q1) + 2 (q2) = 3, hits = 1 → P = 1/3, not 1/4
    assert(rowSet(out) == rows(
      Seq("1", "1", "500000", "500000"),
      Seq("2", "1", "333333", "500000")))
  }

  test("averagePrecisionAtK: hand AP; zero-relevant queries stay at 0") {
    import org.apache.spark.sql.Row
    val ranking = df("query_id BIGINT, doc_id BIGINT, rank INT", Seq(
      Row(1L, 100L, 1), Row(1L, 101L, 2), Row(1L, 102L, 3), Row(1L, 103L, 4),
      Row(2L, 200L, 1), Row(2L, 201L, 2)))
    // q1 rel = {100, 102, 900}: hits at ranks 1 and 3 →
    // AP = (⌊1e6/1⌋ + ⌊2e6/3⌋) div min(3, 10) = 1,666,666 div 3 = 555,555
    val qrels = df("query_id BIGINT, doc_id BIGINT",
      Seq(Row(1L, 100L), Row(1L, 102L), Row(1L, 900L)))
    val out = Search.averagePrecisionAtK(ranking, qrels, kMax = 10)
    assert(out.columns.toSeq == Seq("query_id", "n_rel", "n_hits", "ap_ppm"))
    assert(rowSet(out) == rows(
      Seq("1", "3", "2", "555555"),
      Seq("2", "0", "0", "0")))
  }

  test("averagePrecisionAtK: normalizer caps at k — deep qrel sets cannot starve a perfect prefix") {
    import org.apache.spark.sql.Row
    val ranking = df("query_id BIGINT, doc_id BIGINT, rank INT",
      Seq(Row(1L, 100L, 1), Row(1L, 101L, 2)))
    // 5 relevant docs but k = 2: both returned slots hit →
    // AP = (1e6 + 1e6) div min(5, 2) = 1e6 (a perfect short list reads 1)
    val qrels = df("query_id BIGINT, doc_id BIGINT",
      Seq(Row(1L, 100L), Row(1L, 101L), Row(1L, 102L), Row(1L, 103L),
        Row(1L, 104L)))
    val out = Search.averagePrecisionAtK(ranking, qrels, kMax = 2)
    assert(rowSet(out) == rows(Seq("1", "5", "2", "1000000")))
  }
}
