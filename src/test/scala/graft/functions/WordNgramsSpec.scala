package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins graft_word_ngrams to the composed HOF formulation
  * (transform(sequence) → concat_ws(slice)) it replaced on the
  * decontamination/coverage paths.
  */
class WordNgramsSpec extends SparkSpec {

  private val texts = Seq(
    "a b c d e",
    "one two",          // shorter than n=3
    "solo",
    "",
    "x y z",            // exactly n
    "padded   spaces  between words here",
    "ünïcode tökens 日本 mixed in stream")

  private def composed(ws: org.apache.spark.sql.Column, n: Int) =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  test("native windows equal the composed HOF form, order and multiplicity included") {
    import spark.implicits._
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("__ws", graft.ext.TextAnalysis.tokens(col("text")))
    Seq(1, 2, 3, 5).foreach { n =>
      val native = d.select(col("doc_id"), NgramFunctions.wordNgrams(col("__ws"), n).as("g"))
      val legacy = d.select(col("doc_id"), composed(col("__ws"), n).as("g"))
      val nv = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val lv = legacy.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.indices.foreach { i =>
        assert(nv(i.toLong) == lv(i.toLong), s"n=$n doc $i (${texts(i)})")
      }
    }
  }

  test("null token array yields null; duplicate windows are preserved") {
    import spark.implicits._
    val d = Seq((0L, Option(Seq("a", "b", "a", "b"))), (1L, Option.empty[Seq[String]]))
      .toDF("doc_id", "ws")
    val rows = d.select(col("doc_id"), NgramFunctions.wordNgrams(col("ws"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(0L).map(_.asInstanceOf[scala.collection.Seq[String]].toSeq)
      .contains(Seq("a b", "b a", "a b")))
    assert(rows(1L).isEmpty)
  }
}
