package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.transform.Aggregate

class TopKSpec extends SparkSpec {

  test("perGroupTopK equals the window formulation exactly") {
    val emb = df("vec_id BIGINT, embedding ARRAY<DOUBLE>",
      (0L until 40L).map(i => Row(i, Seq.tabulate(8)(j => ((i * 7 + j * 3) % 11).toDouble))))
    val q = emb.filter(col("vec_id") % 10 === 0)
    val viaWindow = Similarity.bruteForceTopK(q, emb, k = 3)
    val viaAgg = Similarity.bruteForceTopKAgg(q, emb, k = 3)
    assert(viaWindow.columns.toSeq == viaAgg.columns.toSeq)
    assertSameRows(viaWindow, viaAgg)
  }

  test("TopKAgg keeps k best with (score desc, id asc) total order") {
    val scored = df("query_id BIGINT, neighbor_id BIGINT, score DOUBLE", Seq(
      Row(1L, 10L, 0.9), Row(1L, 11L, 0.9), Row(1L, 12L, 0.95), Row(1L, 13L, 0.1)))
    val out = TopK.perGroupTopK(scored, 2).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((12L, 1), (10L, 2))) // tie at 0.9 → smaller id wins
  }

  test("saltedSum equals direct groupBy sum") {
    val d = df("k STRING, v DOUBLE",
      (1 to 500).map(i => Row(if (i % 10 == 0) "cold" + i else "hot", i.toDouble)))
    val direct = d.groupBy("k").agg(sum("v").as("v"))
    val salted = Aggregate.saltedSum(d, Seq("k"), "v", salt = 8)
    assertSameRows(direct.orderBy("k"), salted.orderBy("k"))
  }
}
