package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  private def d = df("a BIGINT, b STRING, c DOUBLE", Seq(
    Row(1L, "x", 1.5), Row(2L, "x", null), Row(3L, null, 2.5), Row(3L, "y", 2.5)))

  test("joinSkewReport: top keys by exact fan-out product; non-joining keys absent") {
    val l = df("k BIGINT", Seq(Row(1L), Row(1L), Row(1L), Row(2L), Row(3L)))
    val r = df("k BIGINT", Seq(Row(1L), Row(2L), Row(2L), Row(4L)))
    val out = Profile.joinSkewReport(l, "k", r, "k", k = 2)
      .collect().map(rr => (rr.getLong(0), rr.getLong(1), rr.getLong(2), rr.getLong(3)))
    // products: key 1 → 3·1 = 3, key 2 → 1·2 = 2; keys 3/4 never join
    assert(out.toSeq == Seq((1L, 3L, 1L, 3L), (2L, 1L, 2L, 2L)))
  }

  test("profile: exact row/non-null/distinct counts per column") {
    val out = Profile.profile(d, Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((4L, 4L, 3L)))
    assert(out("b") == ((4L, 3L, 2L)))
    assert(out("c") == ((4L, 3L, 2L)))
  }

  test("profile: unknown column and empty list are rejected") {
    intercept[IllegalArgumentException] { Profile.profile(d, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.profile(d, Seq.empty) }
  }

  test("profileDrift: hand-traced ppm null rates, signed drift, cardinality delta") {
    import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
    val before = df("k STRING, v BIGINT", Seq(
      Row("x", 1L), Row("y", 2L), Row("z", 3L), Row(null, 4L)))  // 1/4 null k
    val after = df("k STRING, v BIGINT", Seq(
      Row("x", 5L), Row(null, 5L), Row(null, 5L)))               // 2/3 null k
    val out = Profile.profileDrift(before, after, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    //                 rows_a rows_b dist_a dist_b ppm_a  ppm_b  drift  d_delta
    assert(out("k") == Seq(4L, 3L, 3L, 1L, 250000L, 666666L, 416666L, -2L))
    assert(out("v") == Seq(4L, 3L, 4L, 1L, 0L, 0L, 0L, -3L))
  }

  test("psiDrift: hand-computed Laplace-smoothed contributions; one-sided bins finite") {
    // before: a×3, b×1 (N=4); after: a×1, c×1 (N=2); bins {a,b,c}
    // p = (n+1)/(N+3); contrib = (p_before − p_after)·ln(p_before/p_after)
    val before = df("t STRING", Seq(Row("a"), Row("a"), Row("a"), Row("b")))
    val after = df("t STRING", Seq(Row("a"), Row("c")))
    val out = Profile.psiDrift(before, after, "t").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out("a") == ((3L, 1L, 750000L, 500000L, 0.061144)))
    assert(out("b") == ((1L, 0L, 250000L, 0L, 0.030572)))  // vanished bin: finite
    assert(out("c") == ((0L, 1L, 0L, 500000L, 0.264759)))  // new bin: finite
    // PSI total > 0.25 — this fixture IS a "shifted" population
    assert(out.values.map(_._5).sum > 0.25)
  }

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("embeddingDrift: identical snapshots shift by exactly zero") {
    val a = vecs((1L, Seq(0.5, -0.25, 0.125)), (2L, Seq(-0.5, 0.25, 0.0)))
    val out = Profile.embeddingDrift(a, a, k = 3).collect()
    assert(out.length == 3 && out.forall(_.getLong(3) == 0L))
  }

  test("embeddingDrift: hand-shifted dimension tops the report with the exact micro delta") {
    val before = vecs((1L, Seq(0.1, 0.2, 0.3)), (2L, Seq(0.3, 0.2, 0.1)))
    val after = vecs((3L, Seq(0.1, 0.7, 0.3)), (4L, Seq(0.3, 0.7, 0.1)))
    val top = Profile.embeddingDrift(before, after, k = 1).head()
    // dim 1 mean moves 0.2 → 0.7: exactly 500000 micro units
    assert(top.getInt(0) == 1)
    assert((top.getLong(1), top.getLong(2), top.getLong(3)) ==
      (200000L, 700000L, 500000L))
  }

  test("embeddingDrift: partition-invariant (exact integer aggregation)") {
    val a = vecs((1L, Seq(0.11, -0.37)), (2L, Seq(0.53, 0.29)),
      (3L, Seq(-0.71, 0.13)), (4L, Seq(0.23, -0.61)))
    val b = vecs((5L, Seq(0.41, 0.07)), (6L, Seq(-0.19, 0.83)))
    val x = Profile.embeddingDrift(a, b, k = 2).collect().map(_.toSeq).toSeq
    val y = Profile.embeddingDrift(a.repartition(5), b.repartition(3), k = 2)
      .collect().map(_.toSeq).toSeq
    assert(x == y)
  }

  test("corpusDigest: mergeable, subtractable, partitioning-invariant") {
    import spark.implicits._
    val mod = BigInt(1) << 61
    def mk(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "source", "text")
    val aRows = (0L until 40L).map(i => (i, "web", s"alpha document number $i with content ${i * 31}"))
    val bRows = (100L until 130L).map(i => (i, "web", s"beta payload $i body ${i * 17}"))
    val da = Profile.corpusDigest(mk(aRows)).collect().head
    val db = Profile.corpusDigest(mk(bRows)).collect().head
    val dab = Profile.corpusDigest(mk(aRows ++ bRows)).collect().head
    assert(dab.getAs[Long]("n_docs") == 70L)
    // digest(A ∪ B) == (digest(A) + digest(B)) mod 2^61
    val expect = (BigInt(da.getAs[Long]("digest")) + BigInt(db.getAs[Long]("digest"))).mod(mod)
    assert(BigInt(dab.getAs[Long]("digest")) == expect)
    // subtraction recovers the component: digest(A) == (digest(AB) - digest(B)) mod 2^61
    val back = (BigInt(dab.getAs[Long]("digest")) - BigInt(db.getAs[Long]("digest"))).mod(mod)
    assert(BigInt(da.getAs[Long]("digest")) == back)
    // order/partitioning invariance
    val shuffled = Profile.corpusDigest(mk(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(aRows ++ bRows)).repartition(5)).collect().head
    assert(shuffled.getAs[Long]("digest") == dab.getAs[Long]("digest"))
    // a single-byte edit moves the digest
    val edited = aRows.updated(3, (3L, "web", aRows(3)._3 + "x"))
    assert(Profile.corpusDigest(mk(edited ++ bRows)).collect().head
      .getAs[Long]("digest") != dab.getAs[Long]("digest"))
  }

  test("selectivityAudit: hand-traced equi-depth estimates and exact counts") {
    // values 1,1,2,3,4,4,4,10 → rank intervals: 1:[0,1] 2:[2] 3:[3]
    // 4:[4,6] 10:[7]; buckets of rank r (B=4, n=8) = r div 2 →
    // b0(1,1,cnt2) b1(2,3,cnt2) b2(4,4,cnt2) b3(4,10,cnt2)
    val v = df("x BIGINT", Seq(1L, 1L, 2L, 3L, 4L, 4L, 4L, 10L).map(Row(_)))
    val out = Profile.selectivityAudit(v, col("x"), buckets = 4, nPreds = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // span=10, grid j∈{0,1} over nPreds+2=4: j=0 → [1,8), j=1 → [3,11)
    // j=0: exact 7 (all but 10); est 2+2+2 + b3: 2·min(8,11)-max(1,4)=4 → 2·4 div 7 = 1 ⇒ 7
    assert(out(0L) == ((1L, 8L, 7L, 7L, 0L)))
    // j=1: exact 5 (3,4,4,4,10); est b0 ov0, b1 2·1 div 2=1, b2 2, b3 2·7 div 7=2 ⇒ 5
    assert(out(1L) == ((3L, 11L, 5L, 5L, 0L)))
  }

  test("selectivityAudit: bucket mass conserved and ties never split stats") {
    // 100 rows over a 10-value domain with heavy ties; whatever the tie
    // order, Σ est over the full-domain predicate == n exactly when every
    // bucket is single-valued (width 1 ⇒ interpolation is exact)
    val v = df("x BIGINT", (0 until 100).map(i => Row((i % 10).toLong)))
    val full = Profile.selectivityAudit(v, col("x"), buckets = 10, nPreds = 1)
      .collect().head
    // pred 0 covers [0, 0+10·3 div 3) = [0,10) — the whole domain
    assert(full.getAs[Long]("p_lo") == 0L && full.getAs[Long]("p_hi") == 10L)
    assert(full.getAs[Long]("est_rows") == 100L)
    assert(full.getAs[Long]("exact_rows") == 100L)
    assert(full.getAs[Long]("err_ppm") == 0L)
  }
}
