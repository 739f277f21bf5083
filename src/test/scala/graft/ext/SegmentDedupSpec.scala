package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("lineSegments keeps original line numbers and drops blank lines") {
    val d = docs(1L -> "first line\n\n  second  \nthird")
    assert(rowSet(Dedup.lineSegments(d)) ==
      rows(Seq("1", "0", "first line"), Seq("1", "2", "second"), Seq("1", "3", "third")))
  }

  test("wordChunkSegments slices disjoint fixed-width chunks, short tail kept") {
    val d = docs(1L -> "a b c d e", 2L -> "", 3L -> "x")
    assert(rowSet(Dedup.wordChunkSegments(d, chunkWords = 2)) ==
      rows(Seq("1", "0", "a b"), Seq("1", "1", "c d"), Seq("1", "2", "e"),
        Seq("3", "0", "x")))
  }

  test("segmentDedup drops segments shared by >= minDf docs from every doc") {
    // "nav bar" is boilerplate (3 docs); unique lines survive in order
    val d = docs(
      1L -> "nav bar\nunique one\ntail one",
      2L -> "nav bar\nunique two",
      3L -> "nav bar",
      4L -> "standalone")
    val out = Dedup.segmentDedup(d, Dedup.lineSegments(d), minDf = 2)
    assert(rowSet(out) == rows(
      Seq("1", "unique one tail one", "3", "2"),
      Seq("2", "unique two", "2", "1"),
      Seq("3", "", "1", "0"), // fully-boilerplate doc: empty, row retained
      Seq("4", "standalone", "1", "1")))
  }

  test("segmentDedup counts df per distinct doc (repeat inside one doc is not boilerplate)") {
    val d = docs(1L -> "dup\ndup\nmid", 2L -> "other")
    val out = Dedup.segmentDedup(d, Dedup.lineSegments(d), minDf = 2)
    // "dup" appears twice but only in doc 1 → df 1 → kept both times
    assert(rowSet(out) == rows(
      Seq("1", "dup dup mid", "3", "3"),
      Seq("2", "other", "1", "1")))
  }

  test("empty docs come back with empty text and zero segments") {
    val d = docs(1L -> "", 2L -> "word")
    val out = Dedup.segmentDedup(d, Dedup.wordChunkSegments(d, 4), minDf = 2)
    assert(rowSet(out) == rows(Seq("1", "", "0", "0"), Seq("2", "word", "1", "1")))
  }
}
