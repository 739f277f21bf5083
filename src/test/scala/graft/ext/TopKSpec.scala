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

  test("topKPairJoin: pruned rank join equals brute force; undersized pair set falls back unpruned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = (0L until 30L).flatMap(i => (0L until 25L)
      .filter(j => (i * 7 + j * 11) % 3 != 0).map(j => (i, j))).toDF("ka", "kb")
    val a = (0L until 30L).map(i => (i, (i * 131 % 97) - 20)).toDF("ka", "sa")
    val b = (0L until 25L).map(j => (j, (j * 173 % 89) - 10)).toDF("kb", "sb")
    val k = 7
    val got = TopK.topKPairJoin(pairs, a, b, k)
    val w = Window.orderBy(col("score").desc, col("ka"), col("kb"))
    val brute = pairs.join(a, Seq("ka")).join(b, Seq("kb"))
      .withColumn("score", col("sa") + col("sb"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("ka", "kb", "score", "rank")
    assertSameRows(got, brute)
    // fewer pairs than k: every pair comes back, still ranked
    val tiny = Seq((1L, 2L), (3L, 4L)).toDF("ka", "kb")
    val allOut = TopK.topKPairJoin(tiny, a, b, k = 10).collect()
    assert(allOut.length == 2)
    assert(allOut.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2))
  }
}
