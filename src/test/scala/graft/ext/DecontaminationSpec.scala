package graft.ext

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  private def frames(train: Seq[(Long, String)], eval: Seq[(Long, String)]) = {
    import spark.implicits._
    (train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"))
  }

  test("train docs sharing a word n-gram with any eval doc are flagged, others absent") {
    val (train, eval) = frames(
      Seq(1L -> "the quick brown fox jumps", 2L -> "lorem ipsum dolor sit"),
      Seq(10L -> "quick brown fox runs away"))
    val out = Dedup.crossContamination(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L)) // only "quick brown fox" is shared
  }

  test("repeated windows inside one doc count once (distinct grams per doc)") {
    val (train, eval) = frames(
      Seq(1L -> "a b a b a b"), // windows: "a b a" ×2, "b a b" ×2 → 2 distinct
      Seq(10L -> "x a b a y", 11L -> "z b a b w"))
    val out = Dedup.crossContamination(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L)) // both distinct windows hit, each once
  }

  test("docs shorter than n contribute no windows on either side") {
    val (train, eval) = frames(
      Seq(1L -> "too short", 2L -> "one two three four"),
      Seq(10L -> "one two three"))
    val out = Dedup.crossContamination(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 1L))
  }
}
