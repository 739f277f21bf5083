package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class LangModelSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("docBigrams emits adjacent pairs; short docs emit nothing") {
    val d = docs(1L -> "a b c", 2L -> "x", 3L -> "")
    assert(rowSet(LangModel.docBigrams(d)) ==
      rows(Seq("1", "a", "b"), Seq("1", "b", "c")))
  }

  test("scoreDocuments matches the hand-computed add-one bigram model") {
    // corpus: doc1 = "a b a b", doc2 = "a b"
    // bigrams: doc1 (a,b) (b,a) (a,b); doc2 (a,b)
    // c12(a,b)=3, c12(b,a)=1; c1(a)=3, c1(b)=1; V=2
    val d = docs(1L -> "a b a b", 2L -> "a b")
    val pAB = math.log(4.0 / 5.0) // (3+1)/(3+2)
    val pBA = math.log(2.0 / 3.0) // (1+1)/(1+2)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = r6((pAB + pBA + pAB) / 3.0)
    val exp2 = r6(pAB)
    assert(rowSet(LangModel.scoreDocuments(d)) ==
      rows(Seq("1", "3", exp1.toString), Seq("2", "1", exp2.toString)))
  }

  test("docs with fewer than two tokens score null with zero bigrams") {
    val d = docs(1L -> "a b", 2L -> "solo", 3L -> "")
    val out = LangModel.scoreDocuments(d)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(2) && byId(2L).getLong(1) == 0L)
    assert(byId(3L).isNullAt(2) && byId(3L).getLong(1) == 0L)
    assert(!byId(1L).isNullAt(2) && byId(1L).getLong(1) == 1L)
  }

  test("rarer transitions score lower than corpus-typical ones") {
    val d = docs(
      1L -> "the cat sat the cat sat the cat sat",
      2L -> "the cat sat",
      3L -> "sat cat the") // same vocab, reversed transitions
    val scores = LangModel.scoreDocuments(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(2L) > scores(3L))
  }
}
