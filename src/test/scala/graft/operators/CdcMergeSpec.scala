package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class CdcMergeSpec extends SparkSpec {

  private def base = df("k BIGINT, name STRING, bal DOUBLE", Seq(
    Row(1L, "alice", 10.0),
    Row(2L, "bob", 20.0),
    Row(3L, "carol", 30.0)))

  test("merge: last writer wins per key; D drops; untouched base rows survive; new keys insert") {
    val log = df("k BIGINT, name STRING, bal DOUBLE, seq BIGINT, op STRING", Seq(
      Row(1L, "alice", 11.0, 5L, "U"),
      Row(1L, "alice2", 12.0, 9L, "U"), // later seq wins
      Row(1L, "stale", 99.0, 2L, "U"),
      Row(3L, "carol", 0.0, 4L, "D"),   // delete key 3
      Row(4L, "dave", 40.0, 7L, "I")))  // brand-new key
    val out = CdcMerge.merge(base, log, "k", "seq", "op")
    assert(rowSet(out) == rows(
      Seq("1", "alice2", "12.0"),
      Seq("2", "bob", "20.0"),
      Seq("4", "dave", "40.0")))
  }

  test("merge: delete then later re-insert of the same key resurrects it") {
    val log = df("k BIGINT, name STRING, bal DOUBLE, seq BIGINT, op STRING", Seq(
      Row(2L, "bob", 0.0, 3L, "D"),
      Row(2L, "bob-back", 25.0, 8L, "I")))
    val out = CdcMerge.merge(base, log, "k", "seq", "op")
    assert(rowSet(out) == rows(
      Seq("1", "alice", "10.0"),
      Seq("2", "bob-back", "25.0"),
      Seq("3", "carol", "30.0")))
  }

  test("merge: same-seq tie broken by op descending (update beats delete)") {
    val log = df("k BIGINT, name STRING, bal DOUBLE, seq BIGINT, op STRING", Seq(
      Row(1L, "tie-u", 1.0, 5L, "U"),
      Row(1L, "tie-d", 2.0, 5L, "D")))
    val out = CdcMerge.merge(base, log, "k", "seq", "op")
    assert(rowSet(out).contains(Seq("1", "tie-u", "1.0").mkString("|")))
  }

  test("merge: empty changelog is the identity; changelog-only keys with op D never appear") {
    val empty = df("k BIGINT, name STRING, bal DOUBLE, seq BIGINT, op STRING", Seq.empty)
    assertSameRows(CdcMerge.merge(base, empty, "k", "seq", "op"), base)
    val onlyDel = df("k BIGINT, name STRING, bal DOUBLE, seq BIGINT, op STRING", Seq(
      Row(9L, "ghost", 0.0, 1L, "D")))
    assertSameRows(CdcMerge.merge(base, onlyDel, "k", "seq", "op"), base)
  }
}
