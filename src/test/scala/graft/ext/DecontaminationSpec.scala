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

  test("evalContainment: asymmetric quote — fully-contained eval doc scores 10^6 ppm") {
    // eval doc 10 is a verbatim quote inside a much longer train doc:
    // containment must be 1.0 even though Jaccard would be tiny
    val (train, eval) = frames(
      Seq(1L -> "preamble words here the quick brown fox jumps over the lazy dog and much more trailing text follows"),
      Seq(10L -> "the quick brown fox jumps",      // 3 distinct 3-grams, all in train
          11L -> "entirely novel eval content here")) // 0 contained
    val out = Dedup.evalContainment(train, eval, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out(10L) == ((3L, 3L, 1000000L)))
    assert(out(11L) == ((3L, 0L, 0L)))
  }

  test("evalContainment: partial overlap floors the ppm; short eval docs absent") {
    val (train, eval) = frames(
      Seq(1L -> "a b c d"),
      // windows: "a b c", "b c d" (hit), "c d x", ... doc 20: 3 grams, 2 hit
      Seq(20L -> "a b c d x", 21L -> "tiny one"))
    val out = Dedup.evalContainment(train, eval, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(20L -> ((3L, 2L, 666666L)))) // 2·10⁶ div 3, floor
  }
}
