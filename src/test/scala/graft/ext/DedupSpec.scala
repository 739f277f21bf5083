package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("exactDedup groups normalized text and keeps smallest id deterministically") {
    val d = docs(
      1L -> "Hello  World", 2L -> "  hello world ", 3L -> "HELLO WORLD", 4L -> "different")
    val out = Dedup.exactDedup(d).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap  // keep_id -> n_copies
    assert(out == Map(1L -> 3L, 4L -> 1L))
  }

  test("minHashSignatures: identical texts get identical signatures; short docs drop") {
    val d = docs(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "zzzzzzzz", 4L -> "ab")
    val sig = Dedup.minHashSignatures(d, k = 8).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    assert(!sig.contains(4L)) // < 3 chars ⇒ no shingles
  }

  test("minHashCandidatePairs emits near-dup pairs exactly once (no per-band dups)") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",  // exact dup: all bands agree
      3L -> "completely unrelated text about spark engines")
    val sig = Dedup.minHashSignatures(d, k = 16)
    val pairs = Dedup.minHashCandidatePairs(sig, k = 16, rowsPerBand = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.count(_ == (1L, 2L)) == 1) // first-agreeing-band: once, not 4×
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minHashClusters assigns dup docs the same representative") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      5L -> "the quick brown fox jumps over the lazy dog",
      9L -> "completely unrelated text about spark engines")
    val sig = Dedup.minHashSignatures(d, k = 16)
    val cl = Dedup.minHashClusters(sig, k = 16, rowsPerBand = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(5L) == 1L) // both point at smallest dup id
    assert(cl(9L) == 9L)                 // singleton is its own rep
  }

  test("simHash: identical docs equal; near docs closer than far docs (hamming)") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "alpha beta gamma delta epsilon eta",     // 1 token differs
      4L -> "one two three four five six")            // all differ
    val h = Dedup.simHash(d, bits = 32).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
  }

  test("ngramJaccardPairs: exact dup scores 1.0; threshold excludes dissimilar") {
    val d = docs(
      1L -> "abcdefghij", 2L -> "abcdefghij", 3L -> "qrstuvwxyz")
    val out = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == Map((1L, 2L) -> 1.0))
  }

  test("single-band config (k == rowsPerBand) is legal") {
    val d = docs(1L -> "aaa bbb ccc", 2L -> "aaa bbb ccc")
    val sig = Dedup.minHashSignatures(d, k = 4)
    val pairs = Dedup.minHashCandidatePairs(sig, k = 4, rowsPerBand = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("bestCopyPerCluster keeps highest quality, ties break to smallest id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val stats = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "quality")
    val out = Dedup.bestCopyPerCluster(clusters, stats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // cluster 1: quality tie 0.9 between ids 2 and 3 → id 2 wins; 3 members
    assert(out == Set((1L, 2L, 3L), (9L, 9L, 1L)))
  }

  test("simHashNearDupPairs: pigeonhole banding is exact vs brute force") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      // clusters of 4 near-identical docs + unique tail tokens
      val base = s"alpha beta gamma delta cluster${i / 4}"
      (i, if (i % 4 == 0) base else s"$base extra${i % 4}")
    }.toDF("doc_id", "text")
    val banded = Dedup.simHashNearDupPairs(docs, bits = 32, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over all simhash pairs
    val sims = Dedup.simHash(docs, bits = 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the fixture actually produces near-dups
  }

  /** Clusters of 4 docs sharing 150 cluster-specific tokens, each with one
    * unique tail token: intra-cluster hamming over the wide hash is small
    * (only bits whose shared vote is on a knife edge flip), cross-cluster
    * hamming is ~31 — the realistic near-dup shape 6-token fixtures can't
    * produce at 62 bits.
    */
  private def wideClusters = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val base = (0 until 150).map(j => s"c${i / 4}w$j").mkString(" ")
      (i, s"$base uniq$i")
    }.toDF("doc_id", "text")
  }

  test("simHashNearDupPairs 64-bit: pigeonhole banding is exact vs brute force") {
    val docs = wideClusters
    val banded = Dedup.simHashNearDupPairs(docs, bits = 64, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sims = Dedup.simHash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty)
    // 64-bit separates the clusters 32-bit smears together: every surviving
    // pair is an intra-cluster pair
    assert(brute.forall { case (a, b, _) => a / 4 == b / 4 })
  }

  test("simHash64 uses the full wide bit range (not just the low 32)") {
    val d = docs(1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val h = Dedup.simHash64(d).head().getLong(1)
    assert(h >>> 32 != 0L, s"no bits above 32 set in $h")
    assert(h >>> Dedup.SimHash64Bits == 0L, "bits above the populated range must be 0")
  }

  test("capped candidate generation equals uncapped when the cap is not binding, bounds buckets when it is") {
    val docs = wideClusters
    def run(cap: Option[Int]) =
      Dedup.simHashNearDupPairs(docs, bits = 64, maxHamming = 3, maxBucketCandidates = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val uncapped = run(None)
    assert(run(Some(1000)) == uncapped) // non-binding cap: identical output
    // binding cap: output is a subset, and survivors are still true near-dups
    val tight = run(Some(2))
    assert(tight.subsetOf(uncapped) && tight.size < uncapped.size)
  }

  test("simHashClusters groups exact dups under the smallest id; singletons stand alone") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      5L -> "the quick brown fox jumps over the lazy dog",
      9L -> "completely unrelated text about spark engines")
    val cl = Dedup.simHashClusters(d, bits = 64, maxHamming = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(5L) == 1L)
    assert(cl(9L) == 9L)
  }

  test("candidate pairs plan has no DISTINCT exchange (first-band dedup instead)") {
    val d = docs(1L -> "aaa bbb ccc", 2L -> "aaa bbb ddd")
    val sig = Dedup.minHashSignatures(d, k = 16)
    val plan = Dedup.minHashCandidatePairs(sig).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Deduplicate"), s"unexpected distinct in:\n$plan")
  }

  private def edgeDf(rows: (Long, Long)*): org.apache.spark.sql.DataFrame =
    df("src BIGINT, dst BIGINT", rows.map { case (a, b) => Row(a, b) })

  private def nodeDf(ids: Long*): org.apache.spark.sql.DataFrame =
    df("doc_id BIGINT", ids.map(Row(_)))

  test("connectedComponents closes transitive chains the one-pass bucket-min cannot") {
    // path 1-2-3-4-5 plus isolated 9: one component labeled 1, one singleton
    val cc = Dedup.connectedComponents(
      edgeDf(2L -> 1L, 2L -> 3L, 4L -> 3L, 4L -> 5L), nodeDf(1L, 2L, 3L, 4L, 5L, 9L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L), cc.toString)
    assert(cc(9L) == 9L)
  }

  test("connectedComponents converges on a long chain (pointer jumping, not diameter rounds)") {
    // a 64-node path needs ~6 doubling rounds, far under maxRounds
    val n = 64L
    val edges = edgeDf((1L until n).map(i => (i + 1) -> i): _*)
    val cc = Dedup.connectedComponents(edges, nodeDf((1L to n): _*), maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n).forall(cc(_) == 1L))
  }

  test("dupNgramCoverage: covered positions are the union of shared-gram windows") {
    // docs 1/2 share the 3-gram "a b c" (and only it); doc 3 shares nothing;
    // doc 4 is too short for any gram
    val d = docs(
      1L -> "a b c x y z",   // gram "a b c" covers positions 1-3 of 6
      2L -> "q a b c",       // covers positions 2-4 of 4
      3L -> "u v w r s t",
      4L -> "p q")
    val got = Dedup.dupNgramCoverage(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((6L, 3L, 0.5)))
    assert(got(2L) == ((4L, 3L, 0.75)))
    assert(got(3L) == ((6L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0.0)))
  }

  test("dupNgramCoverage: overlapping shared grams count positions once") {
    // "a b c d" in both docs: doc 1 grams "a b c" and "b c d" overlap on
    // b,c — covered must be 4, not 6
    val d = docs(1L -> "a b c d e", 2L -> "z a b c d")
    val got = Dedup.dupNgramCoverage(d, n = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 4L && got(2L) == 4L)
  }

  test("connectedComponents on an empty node set returns empty, not NPE") {
    val cc = Dedup.connectedComponents(edgeDf(), nodeDf())
    assert(cc.count() == 0)
    assert(cc.columns.toSeq == Seq("doc_id", "component_rep"))
  }

  test("connectedComponents with no edges labels every node as its own singleton") {
    val cc = Dedup.connectedComponents(
      edgeDf(), nodeDf(3L, 7L, 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(3L -> 3L, 7L -> 7L, 11L -> 11L))
  }

  test("dupNgramCoverage n=1 reduces to shared-token coverage") {
    val d = docs(1L -> "x shared y", 2L -> "shared z")
    val got = Dedup.dupNgramCoverage(d, n = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 0.333333)))
    assert(got(2L) == ((1L, 0.5)))
  }

  test("trimDuplicatedSpans removes shared windows, keeps unique content in order") {
    // docs 1/2 share "a b c"; doc 1 keeps its unique tail, doc 2 its head
    val d = docs(
      1L -> "a b c x y z",
      2L -> "q r s a b c",
      3L -> "u v w")
    val got = Dedup.trimDuplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("x y z", 3L)))
    assert(got(2L) == (("q r s", 3L)))
    assert(got(3L) == (("u v w", 3L))) // nothing shared → untouched
  }

  test("trimDuplicatedSpans: fully-duplicated doc trims to empty; short docs untouched") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "xy")
    val got = Dedup.trimDuplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("", 0L)))
    assert(got(2L) == (("", 0L)))
    assert(got(3L) == (("xy", 1L)))
  }

  test("CC over star edges equals CC over all candidate pairs (star-contraction soundness)") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      4L -> "the quick brown fox jumps over the lazy dog again and again",
      7L -> "the quick brown fox jumps over the lazy cat again and again",
      9L -> "completely different content about distributed query engines")
    val sig = Dedup.minHashSignatures(d, k = 16)
    val nodes = d.select("doc_id")
    val viaStars = Dedup.connectedComponents(
      Dedup.minHashStarEdges(sig), nodes)
    val viaPairs = Dedup.connectedComponents(
      Dedup.minHashCandidatePairs(sig).withColumnsRenamed(
        Map("id_a" -> "src", "id_b" -> "dst")), nodes)
    assertSameRows(viaStars, viaPairs)
  }

  test("incrementalAssign: batch dups of indexed docs take the index rep; novel docs self-assign") {
    val index = docs(
      3L -> "the quick brown fox jumps over the lazy dog again and again",
      5L -> "the quick brown fox jumps over the lazy dog again and again",
      8L -> "completely different content about distributed query engines")
    val batch = docs(
      20L -> "the quick brown fox jumps over the lazy dog again and again", // dup of 3/5
      21L -> "unseen content never indexed before in any band bucket at all", // novel
      22L -> "ab") // too short to shingle → novel
    val out = Dedup.incrementalAssign(index, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(
      20L -> ((3L, false)),  // smallest matching indexed id
      21L -> ((21L, true)),
      22L -> ((22L, true))))
  }

  test("incrementalAssign never assigns across the batch (batch-batch dups stay novel)") {
    val index = docs(1L -> "completely different content about distributed query engines")
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog again and again",
      11L -> "the quick brown fox jumps over the lazy dog again and again")
    val out = Dedup.incrementalAssign(index, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // both are dups of EACH OTHER but match nothing in the index: each is
    // novel and represents itself — the next index build picks them up
    assert(out == Map(10L -> ((10L, true)), 11L -> ((11L, true))))
  }

  test("sortedNeighborhoodPairs: n−1 pairs matching global (simhash, id) adjacency across bucket boundaries") {
    // 40 distinct docs spread over the hash space so several top-bit
    // buckets are populated — the boundary path must fire
    val d = docs((0L until 40L).map(i =>
      i -> s"token$i alpha beta ${('a' + (i % 26)).toChar} gamma delta word${i * 7}"): _*)
    // reference: true global adjacency from the collected simhashes
    val sims = Dedup.simHash64(d).collect().map(r => (r.getLong(1), r.getLong(0))).sorted
    val expected = sims.sliding(2).collect { case Array((sa, ia), (sb, ib)) =>
      (ia, ib, java.lang.Long.bitCount(sa ^ sb))
    }.toSet
    // tiny bucketBits forces many docs per bucket; large forces many
    // boundary pairs — both must reconstruct the same global adjacency
    for (bits <- Seq(2, 8, 20)) {
      val out = Dedup.sortedNeighborhoodPairs(d, bucketBits = bits).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(out == expected, s"bucketBits=$bits")
      assert(out.size == 39)
    }
  }

  test("winnowFingerprints: shared-substring guarantee, density bound, short-doc edges") {
    val common = "the quick brown fox jumps" // ≥ w + 2 chars ⇒ guaranteed hit
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, s"AAAA $common BBBB"),
      Row(2L, s"XXXX $common YYYY"),
      Row(3L, "zz"), // < 3 chars → no 3-grams
      Row(4L, "")))
    val by = Dedup.winnowFingerprints(d, w = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(!by.contains(3L) && !by.contains(4L))
    // the winnowing guarantee: a shared substring of length ≥ w + k − 1
    // produces at least one shared fingerprint
    assert((by(1L) & by(2L)).nonEmpty)
    // density: selected set never exceeds the window count (34 chars → 32
    // grams → 29 windows), and is far below the gram count in practice
    assert(by(1L).size <= 29)
  }

  test("winnowOverlapPairs: df cap drops boilerplate duplicates, keeps the rare overlap") {
    // 25 IDENTICAL boilerplate docs (every fingerprint df = 25 > 20) plus
    // one pair sharing a rare substring behind distinct wrappers
    val d = df("doc_id BIGINT, text STRING",
      (1L to 25L).map(i => Row(i, "COMMON BOILERPLATE SENTENCE REPEATED EVERYWHERE")) ++ Seq(
        Row(31L, "aaaaaaaa shared rare passage zzzzzzzz"),
        Row(32L, "qqqqqqqq shared rare passage vvvvvvvv")))
    // 27 docs · 30% ppm → cap 8 < 25: boilerplate dropped, the rare
    // overlap (df 2 ≤ 8) survives
    val capped = Dedup.winnowOverlapPairs(d, w = 4, minShared = 1, maxDfPpm = 300000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((31L, 32L)))
    // cap at 100%: the 25 identical docs pair completely too
    assert(Dedup.winnowOverlapPairs(d, w = 4, minShared = 1, maxDfPpm = 1000000)
      .count() == 25L * 24 / 2 + 1)
  }

  test("cdcChunks: chunks partition each doc — contiguous spans, lengths sum to text length") {
    val text = ("the quick brown fox jumps over the lazy dog and then some " * 8).trim
    val d = df("doc_id BIGINT, text STRING", Seq(Row(1L, text), Row(2L, "ab")))
    val out = Dedup.cdcChunks(d, chunkMod = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._4).sum == text.length, "chunk lengths must sum to doc length")
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4, "spans must be contiguous")
    case _ => ()
    }
    assert(doc1.length > 1, s"mod 16 over ${text.length} chars should cut at least once")
    // sub-trigram doc: one whole-doc chunk, empty-interior fp = 0
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 1L, 2L, 0L)))
  }

  test("cdcChunks: edit stability — a front insertion shifts, not re-cuts, later chunks") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 6).trim
    val d = df("doc_id BIGINT, text STRING", Seq(Row(1L, text), Row(2L, "X" + text)))
    val out = Dedup.cdcChunks(d, chunkMod = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val base = out.filter(_._1 == 1L).sortBy(_._2)
    val edited = out.filter(_._1 == 2L).sortBy(_._2)
    assert(base.length >= 3, "fixture needs several chunks")
    // boundaries are content-local: every base chunk AFTER the first
    // reappears in the edited doc with identical (length, fingerprint)
    // and start shifted by exactly the insertion size — fixed-size
    // chunking (q164) re-cuts everything after the edit instead
    val editedSet = edited.map(c => (c._3, c._4, c._5)).toSet
    base.drop(1).foreach { c =>
      assert(editedSet.contains((c._3 + 1, c._4, c._5)),
        s"chunk at ${c._3} (len ${c._4}) must survive the edit shifted by 1")
    }
  }

  test("chunkDupStats: shared spans surface across docs; unique doc reports zero") {
    val shared = ("alpha beta gamma delta epsilon zeta eta theta " * 6).trim
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, shared + " one unique tail here"),
      Row(2L, shared + " two other ending text"),
      Row(3L, "completely different content with nothing in common xyzzy")))
    val out = Dedup.chunkDupStats(d, chunkMod = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // docs 1 and 2 share the long prefix: most of their mass is shared
    assert(out(1L)._3 > 0 && out(2L)._3 > 0, "shared prefix chunks must match")
    assert(out(1L)._4 > 500000L, s"doc 1 should be majority-shared: ${out(1L)}")
    // doc 3 shares nothing
    assert(out(3L)._3 == 0L && out(3L)._4 == 0L)
    // mass accounting: n_chars equals the doc's text length
    assert(out(1L)._2 == (shared + " one unique tail here").length)
  }

  test("crossSourceChunkDups: identical docs across sources share every chunk; disjoint texts share none") {
    val t = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d = df("doc_id BIGINT, text STRING, source STRING", Seq(
      Row(1L, t, "alpha"), Row(2L, t, "beta"),       // full copy across sources
      Row(3L, "zzz wwww qqqq kkkk xxxx yyyy vvvv", "gamma"))) // disjoint alphabet
    val out = Dedup.crossSourceChunkDups(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nChunks = Dedup.cdcChunks(d.filter(col("doc_id") === 1L))
      .filter(col("chunk_chars") >= 3).count()
    assert(out.keySet == Set(("alpha", "beta")), s"unexpected pairs: $out")
    assert(out(("alpha", "beta")) == nChunks)
    // pair key is ordered: src_a < src_b always
    assert(out.keys.forall { case (a, b) => a < b })
  }

  // ------------------------------------------------------ LSH tuning curve

  test("lshTuningCurve: loosest arm counts the whole candidate universe; stricter arms shrink; exact dups land in decile 10") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = (0L until 24L).map { i =>
      val text =
        if (i == 20L || i == 21L) base + " twin"            // exact dup pair
        else if (i % 2 == 0) base + s" variant number ${i}" // template family
        else s"completely different text payload ${i} ${i * 31}"
      (i, text)
    }.toDF("doc_id", "text")
    val out = Dedup.lshTuningCurve(docs, k = 16, configs = Seq(4, 8, 16)).collect()
    assert(out.forall(r => r.getAs[Int]("j_decile") >= 0 && r.getAs[Int]("j_decile") <= 10))
    def total(r: Int) = out.filter(_.getAs[Int]("rows_per_band") == r)
      .map(_.getAs[Long]("n_pairs")).sum
    // every universe pair is a candidate at the loosest config by construction
    val sigs = Dedup.minHashSignatures(docs, 16)
    val universe = Dedup.minHashCandidatePairs(sigs, 16, rowsPerBand = 4).count()
    assert(total(4) == universe)
    assert(total(4) >= total(8) && total(8) >= total(16))
    // identical docs agree on all 16 hashes -> present at EVERY config, decile 10
    Seq(4, 8, 16).foreach { r =>
      val ten = out.filter(x =>
        x.getAs[Int]("rows_per_band") == r && x.getAs[Int]("j_decile") == 10)
      assert(ten.nonEmpty && ten.head.getAs[Long]("n_pairs") >= 1L, s"config $r")
    }
  }

  test("clusteringAgreement: hand-computed Rand decomposition on the joined id set") {
    // A: {1,2,3} {4} {5} ; B: {1,2} {3,4} {5} ; id 6 only in A -> dropped
    val a = df("doc_id BIGINT, cluster_rep BIGINT", Seq(
      Row(1L, 1L), Row(2L, 1L), Row(3L, 1L), Row(4L, 4L), Row(5L, 5L),
      Row(6L, 6L)))
    val b = df("doc_id BIGINT, cluster_rep BIGINT", Seq(
      Row(1L, 1L), Row(2L, 1L), Row(3L, 3L), Row(4L, 3L), Row(5L, 5L)))
    val r = Dedup.clusteringAgreement(a, b).collect()(0)
    // n=5, pairs=10; both: {1,2}=1; A-only: {1,3},{2,3}=2; B-only: {3,4}=1
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 1L) // same_both
    assert(r.getLong(3) == 2L) // same_a_only
    assert(r.getLong(4) == 1L) // same_b_only
    assert(r.getLong(5) == 6L) // same_neither
    assert(r.getLong(6) == 700000L) // (1 + 6) / 10 in ppm
  }

  test("clusteringAgreement: identical clusterings read rand = 1; singleton docs safe") {
    val a = df("doc_id BIGINT, cluster_rep BIGINT", Seq(Row(1L, 1L), Row(2L, 1L)))
    val r = Dedup.clusteringAgreement(a, a).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(6) == 1000000L)
    val one = df("doc_id BIGINT, cluster_rep BIGINT", Seq(Row(9L, 9L)))
    val r1 = Dedup.clusteringAgreement(one, one).collect()(0)
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 0L && r1.getLong(6) == 0L)
  }
}
