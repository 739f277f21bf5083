package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  // hot key 1L carries 80% of the fact side
  private def fact = {
    import spark.implicits._
    ((1 to 800).map(i => (1L, i.toLong)) ++ (1 to 200).map(i => (i.toLong % 50 + 2, i.toLong)))
      .toDF("k", "v")
  }
  private def dim = {
    import spark.implicits._
    (1L to 40L).map(k => (k, s"name$k")).toDF("dk", "name")
  }

  test("saltedJoin inner: row multiset identical to the plain join") {
    val plain = fact.join(dim, col("k") === col("dk")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedJoin(fact, "k", dim, "dk", salt = 7)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin left_outer: unmatched left rows surface exactly once with nulls") {
    val out = SkewJoin.saltedJoin(fact, "k", dim, "dk", salt = 5, joinType = "left_outer")
      .select("k", "v", "name").collect()
    val unmatched = out.filter(_.isNullAt(2))
    // keys 41..51 exist in fact (i%50+2 ranges 2..51) but not in dim (1..40)
    assert(unmatched.nonEmpty)
    assert(out.length == fact.count(), "left_outer must preserve left cardinality here (dim keys unique)")
    val plain = fact.join(dim, col("k") === col("dk"), "left_outer").count()
    assert(out.length == plain)
  }

  test("saltedJoin spreads the hot key across salt partitions pre-join") {
    // the salted fact side must not concentrate key 1 in one (k, salt) group
    val salt = 8
    val groups = SkewJoin.saltedJoin(fact, "k", dim, "dk", salt = salt)
      .filter(col("k") === 1L).count()
    assert(groups == 800L) // correctness first: all hot-key rows joined
  }

  test("right-preserving join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, "k", dim, "dk", joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, "k", dim, "dk", salt = 0)
    }
  }

  test("saltPlan: only keys past the target appear, with ceil-division factors, capped") {
    val plan = SkewJoin.saltPlan(fact, "k", targetRowsPerTask = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // key 1: 800 rows → ceil(800/100) = 8; every other key has ≤ 5 rows
    assert(plan == Map(1L -> ((800L, 8))))
    val capped = SkewJoin.saltPlan(fact, "k", targetRowsPerTask = 100L, maxSalt = 3)
      .collect().map(r => r.getInt(2)).toSeq
    assert(capped == Seq(3))
  }

  test("plannedSaltedJoin: multiset identical to the plain join; dim replicates only hot keys") {
    val plan = SkewJoin.saltPlan(fact, "k", targetRowsPerTask = 100L)
    val plain = fact.join(dim, col("k") === col("dk")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val planned = SkewJoin.plannedSaltedJoin(fact, "k", dim, "dk", plan)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(planned.toSeq == plain.toSeq)
    // left_outer preserves unmatched rows exactly once
    val lo = SkewJoin.plannedSaltedJoin(fact, "k", dim, "dk", plan, "left_outer")
    assert(lo.count() == fact.join(dim, col("k") === col("dk"), "left_outer").count())
  }

  test("plannedSaltedJoin: empty plan degrades to the plain join (salt 1 everywhere)") {
    val empty = SkewJoin.saltPlan(fact, "k", targetRowsPerTask = 100000L)
    assert(empty.count() == 0L)
    val out = SkewJoin.plannedSaltedJoin(fact, "k", dim, "dk", empty)
      .select("k", "v", "name").count()
    assert(out == fact.join(dim, col("k") === col("dk")).count())
  }
}
