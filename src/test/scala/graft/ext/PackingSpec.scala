package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {

  test("packDocuments: packs stay within budget except oversized single docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, 1000), (8L, 900), (16L, 300),  // bucket 0 (nBuckets=8)
      (1L, 5000),                         // bucket 1: oversized alone
      (2L, 10), (10L, 10))                // bucket 2: trivially packed
      .toDF("doc_id", "n_tokens")
    val out = Packing.packDocuments(docs, budget = 2048L, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val byDoc = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // bucket 0: 1000 (+900 = 1900 fits) then 300 crosses → pack 0,0,0?
    // cumsum: 1000,1900,2200 → (cum-n)/2048 = 0,0,0(1900/2048=0) — all pack 0
    assert(byDoc(0L) == ((0L, 0L)) && byDoc(8L) == ((0L, 0L)) && byDoc(16L) == ((0L, 0L)))
    // oversized doc occupies its own pack without blocking the stream
    assert(byDoc(1L) == ((1L, 0L)))
    // per-(bucket, pack) token totals never exceed budget + one doc overflow
    val packTotals = docs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.groupBy(t => (t._2, t._3)).foreach { case (_, members) =>
      val tot = members.map(m => packTotals(m._1).toLong).sum
      val maxDoc = members.map(m => packTotals(m._1).toLong).max
      assert(tot <= 2048L + maxDoc)
    }
  }

  test("packDocuments: packs never cross buckets; deterministic under repartition") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, (i % 37 + 1).toInt)).toDF("doc_id", "n_tokens")
    val a = Packing.packDocuments(docs, 100L, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Packing.packDocuments(docs.repartition(13), 100L, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.forall { case (id, bucket, _) => bucket == id % 8 })
  }

  test("packDocuments extraKeys: packing restarts per key — packs never cross the split") {
    import spark.implicits._
    val docs = (0L until 100L).map(i =>
      (if (i % 3 == 0) "eval" else "train", i, (i % 17 + 1).toInt))
      .toDF("split", "doc_id", "n_tokens")
    val out = Packing.packDocuments(docs, 50L, 4, extraKeys = Seq("split")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // each (split, bucket) stream packs independently from seq 0
    out.groupBy(t => (t._1, t._3)).foreach { case (_, grp) =>
      assert(grp.map(_._4).min == 0L)
    }
    // per-split result equals packing that split's docs alone
    val trainAlone = Packing.packDocuments(
      docs.filter($"split" === "train").drop("split"), 50L, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.filter(_._1 == "train").map(t => (t._2, t._3, t._4)).toSet == trainAlone)
  }

  test("clusterSplit: every member of a cluster lands on the same side") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val out = Packing.clusterSplit(clusters, trainPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster split across sides: $members")
    }
    // degenerate rates pin both sides
    assert(Packing.clusterSplit(clusters, 100).collect().forall(_.getString(2) == "train"))
    assert(Packing.clusterSplit(clusters, 0).collect().forall(_.getString(2) == "eval"))
  }

  test("clusterSplitWeighted: whole clusters per part, remainder to the last part") {
    import spark.implicits._
    val clusters = (1L to 40L).map(i => (i, i % 7)).toDF("doc_id", "cluster_rep")
    val out = Packing.clusterSplitWeighted(clusters,
      Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster split across parts: $members")
    }
    assert(out.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // full weight on the first part pins everything; zero-weight prefix
    // parts can never win and the remainder falls to the last
    assert(Packing.clusterSplitWeighted(clusters, Seq("only" -> 1000000L))
      .collect().forall(_.getString(2) == "only"))
    assert(Packing.clusterSplitWeighted(clusters,
        Seq("a" -> 0L, "b" -> 0L, "c" -> 0L))
      .collect().forall(_.getString(2) == "c"))
  }

  test("paddingAudit: hand-computed bins, exact-boundary doc, empty doc excluded") {
    // widths 4: "a b c" (3 tok) → bound 4; "a b c d" (4) → bound 4 (exact
    // boundary stays in its own bin, not the next); 5 tokens → bound 8;
    // "" → excluded
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c"), Row(2L, "a b c d"), Row(3L, "a b c d e"),
      Row(4L, "   ")))
    val out = Packing.paddingAudit(docs, bucketWidth = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == Set(
      (4L, 2L, 7L, 8L, 125000L),   // (8-7)*1e6 div 8
      (8L, 1L, 5L, 8L, 375000L)))  // (8-5)*1e6 div 8
  }
}
