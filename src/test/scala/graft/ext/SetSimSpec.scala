package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SetSimSpec extends SparkSpec {

  // deterministic pseudo-random token sets with a LARGE vocabulary (the
  // Zipfian-ish habitat prefix filtering is designed for): doc i draws 12
  // tokens from a 4000-token universe, consecutive docs overlap heavily
  // (i and i+1 share 9 of 12 draws) so near-dup pairs exist
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val toks = (0 until 12).map(j => s"t${(i * 3 + j * 7) % 4000}")
      (i.toLong, toks.distinct.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def bruteForce(docs: Seq[(Long, String)], tPermille: Int): Set[(Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa intersect sb).size
      if 1000L * c >= tPermille.toLong * (sa.size + sb.size - c)
    } yield (ia, ib)).toSet
  }

  test("matches brute force exactly on a high-entropy corpus") {
    val df = corpus(200)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = SetSim.jaccardJoin(df, tPermille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(rows, 500)
    assert(got == want)
    assert(want.nonEmpty, "test corpus must produce at least one pair")
  }

  test("acceptance boundary is exact integer arithmetic: pair AT threshold kept") {
    import spark.implicits._
    // |a|=|b|=3, |∩|=2 → jaccard = 2/4 = exactly 0.5
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val at = SetSim.jaccardJoin(df, tPermille = 500).collect()
    assert(at.length == 1 && at.head.getDouble(2) == 0.5)
    // one permille above the exact ratio → dropped
    assert(SetSim.jaccardJoin(df, tPermille = 501).count() == 0)
  }

  test("repeated tokens collapse to SET semantics; result is partitioning-invariant") {
    import spark.implicits._
    val df = Seq((1L, "a a a b"), (2L, "a b b b")).toDF("doc_id", "text")
    // both sets are {a, b} → jaccard 1.0
    val out = SetSim.jaccardJoin(df, tPermille = 1000).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
    val big = corpus(120)
    val a = SetSim.jaccardJoin(big, 500).collect().map(_.toSeq).toSet
    val b = SetSim.jaccardJoin(big.repartition(13), 500).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("no quadratic physical operator: equi-joins only") {
    val plan = SetSim.jaccardJoin(corpus(50), 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"quadratic join in plan:\n$plan")
  }

  test("pruningAudit: hand-computed candidate masses; degenerate 1-doc corpus NULLs the ppms") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "z w"))
      .toDF("doc_id", "text")
    // df: a=2 b=2, others 1. Prefixes at t=500 (len n − ⌈n/2⌉ + 1):
    // d1 → {c,d,a}, d2 → {x,y,a}, d3 → {w,z} (full). Prefix mass: only
    // 'a' meets twice → 1 pair. Naive mass: a and b → 2 pairs.
    val r = SetSim.pruningAudit(df, tPermille = 500).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 8L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 1L, 3L)))
    assert(r.getLong(5) == 666666L && r.getLong(6) == 333333L)
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r1 = SetSim.pruningAudit(one, 500).head()
    assert(r1.getLong(0) == 1L && r1.isNullAt(5) && r1.isNullAt(6))
  }

  test("pruningAudit: the audit predicts the anti-Zipfian blowup the join would hit") {
    import spark.implicits._
    // 40 docs over a 4-token universe: every prefix token is corpus-wide
    // → prefix mass ≈ all-pairs scale (the q113-at-sf1 signature)
    val bad = (1L to 40L).map(i => (i, "aa bb cc dd")).toDF("doc_id", "text")
    val rb = SetSim.pruningAudit(bad, 600).head()
    assert(rb.getLong(6) >= 1000000L, s"expected saturated prefix_ppm, got $rb")
    // 40 docs with unique-ish rare tokens → prefix mass collapses
    val good = (1L to 40L).map(i =>
      (i, s"u$i v$i w$i of and")).toDF("doc_id", "text")
    val rg = SetSim.pruningAudit(good, 600).head()
    assert(rg.getLong(6) < rb.getLong(6) / 10,
      s"expected pruned prefix_ppm, got good=$rg vs bad=$rb")
  }
}
