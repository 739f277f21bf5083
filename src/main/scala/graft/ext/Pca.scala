package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed PCA (top principal component) over the embedding corpus —
  * the LEARNED projection complementing the data-independent random
  * projection (`Similarity.randomProject`) and the trained IVF/PQ
  * codebooks: one pass computes the exact covariance, the driver power-
  * iterates a 64-vector, and every step is integer arithmetic so the
  * whole training replays bit-identically in an external SQL engine
  * (extension surface; the reference has no linear-algebra analogue).
  *
  * Exactness/determinism policy (the Clustering.kmeans playbook):
  * vectors quantize to `⌊x·10⁶ + 0.5⌋` longs; the Gram/sum moments
  * accumulate in DECIMAL(38,0) (per-pair products reach ~1.35e21 at 100 TB
  * row counts — past 2⁶³, the q117 HUGEINT-mirror policy); the centered,
  * n-scaled covariance `n·G − s·sᵀ` stays within 10³⁰ ≪ 10³⁸; and the
  * fixed-point scale-down divisor is `n²·10⁴`, truncated toward zero —
  * measured identical for Spark's DECIMAL `div` and DuckDB's HUGEINT `//`
  * on negative operands. Power iteration renormalizes to ‖v‖∞ = 1000 each
  * round with the same truncating division, and the final sign is fixed
  * deterministically (component with the largest |loading|, smallest index
  * on ties, made positive).
  *
  * Scale shape: ONE corpus pass builds the dim² moment table — the
  * pair explode is `dim²` rows per vector through whole-stage codegen
  * into a map-side-combined aggregate, so the shuffle carries exactly
  * dim² rows per map task regardless of corpus size; the driver holds
  * one 64×64 long matrix (32 KB) and iterates locally. Everything the
  * cluster does is embarrassingly parallel + one keyspace-sized
  * aggregate; nothing iterative touches the corpus (unlike Lloyd's,
  * power iteration here is a driver-local loop over the collected
  * moments).
  */
object Pca {

  /** Fixed-point scale shared with [[Clustering.quantize]]. */
  private val Scale = 1000000L

  /** The one-pass moment frame: `(i, j, g, n, si)` over the UPPER
    * TRIANGLE (i ≤ j) — `g = Σ xᵢxⱼ` and `si = Σ xᵢ` in DECIMAL(38,0),
    * `n` the row count. The matrix is symmetric, so the pair generator
    * emits only the triangle — the second posexplode runs over
    * `slice(v, i+1, …)`, dim·(dim+1)/2 codegen rows per vector instead
    * of dim² (measured ~2× on the wall; [[covarianceFromMoments]]
    * mirrors the lower half). Partial-aggregated map-side, so the
    * exchange is triangle-sized per map task regardless of corpus.
    *
    * These moments are MERGEABLE state ([[mergeMoments]]): all three
    * columns are sums, so day-2 moments ADD to the persisted day-1
    * frame and retraining after an append touches only the delta — at
    * 100 TB the component retrains in O(delta + dim²), never O(corpus).
    */
  def momentFrame(embeddings: DataFrame,
                  vecCol: String = "embedding"): DataFrame =
    embeddings.select(Clustering.quantize(col(vecCol)).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"),
        posexplode(expr("slice(v, i + 1, size(v) - i)")).as(Seq("jr", "xj")))
      .groupBy(col("i"), (col("i") + col("jr")).as("j"))
      .agg(sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("g"),
        count(lit(1)).as("n"),
        // per-dim sum rides the same aggregate (constant across j; the
        // diagonal j=i slice is read back) — no second corpus pass
        sum(col("xi").cast("decimal(38,0)")).as("si"))

  /** Additive merge of moment frames — sums add, the keyspace is the
    * dim² triangle, so the merge aggregate is O(dim²) regardless of how
    * much data produced either side.
    */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("i", "j")
      .agg(sum("g").cast("decimal(38,0)").as("g"), sum("n").as("n"),
        sum("si").cast("decimal(38,0)").as("si"))

  /** Collect a moment frame and finish the covariance on the driver:
    * `c2 = (n·G − s·sᵀ) div (n²·10⁴)` — entries bounded by
    * `Scale² / 10⁴ ≈ 1.35e8` for unit-range embeddings.
    */
  private[ext] def covarianceFromMoments(moments: DataFrame): Array[Array[Long]] = {
    val rows = moments.select(col("i"), col("j"), col("g"), col("n"), col("si"))
      .collect()
    require(rows.nonEmpty, "covariance of an empty corpus")
    val dim = rows.map(_.getInt(1)).max + 1
    val n = BigInt(rows.head.getLong(3))
    val s = new Array[BigInt](dim)
    rows.foreach { r =>
      if (r.getInt(1) == r.getInt(0))
        s(r.getInt(0)) = BigDecimal(r.getDecimal(4)).toBigInt
    }
    val denom = n * n * BigInt(10000)
    val c2 = Array.ofDim[Long](dim, dim)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val cij = n * BigDecimal(r.getDecimal(2)).toBigInt - s(i) * s(j)
      // BigInt `/` truncates toward zero — measured identical to Spark's
      // DECIMAL `div` and DuckDB's HUGEINT `//` on negative operands
      // (never BigDecimal `/`, whose MathContext ROUNDS)
      val v = (cij / denom).toLong
      c2(i)(j) = v
      c2(j)(i) = v // symmetric mirror
    }
    c2
  }

  /** Deterministic integer power iteration on the driver-held matrix. */
  private[ext] def powerIterate(c2: Array[Array[Long]],
                                iterations: Int): Array[Long] = {
    val dim = c2.length
    var v = Array.fill(dim)(1000L)
    var it = 0
    var done = false
    while (it < iterations && !done) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += c2(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      if (m == 0L) done = true // zero matrix: keep the current vector
      else v = w.map(x => x * 1000L / m) // Long / truncates toward zero
      it += 1
    }
    // deterministic sign: the largest-|loading| component (smallest index
    // on ties) points positive
    val a = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(a) < 0) v.map(x => -x) else v
  }

  /** Exact integer deflation: project the first component out of both
    * sides of the matrix — `C₂ = ⌊(VV·I − vvᵀ) C (VV·I − vvᵀ) / VV²⌋`
    * with `VV = vᵀv` — so power iteration on C₂ converges to the SECOND
    * component. All arithmetic is BigInt on the driver-held 64×64 matrix
    * (intermediates reach ~10²⁴, past 2⁶³ — the oracle mirrors them in
    * HUGEINT), with one truncating division back to the Long working
    * range at the end.
    */
  private[ext] def deflate(c2: Array[Array[Long]],
                           v: Array[Long]): Array[Array[Long]] = {
    val dim = c2.length
    val bv = v.map(BigInt(_))
    val vv = bv.map(x => x * x).sum
    // m1 = VV·C − v (vᵀ C)
    val vtc = Array.tabulate(dim) { j =>
      (0 until dim).map(i => bv(i) * c2(i)(j)).sum
    }
    val m1 = Array.tabulate(dim, dim)((i, j) => vv * c2(i)(j) - bv(i) * vtc(j))
    // c2' = ⌊(VV·m1 − (m1 v) vᵀ) / VV²⌋, truncation toward zero
    val m1v = Array.tabulate(dim) { i =>
      (0 until dim).map(j => m1(i)(j) * bv(j)).sum
    }
    val denom = vv * vv
    Array.tabulate(dim, dim) { (i, j) =>
      ((vv * m1(i)(j) - m1v(i) * bv(j)) / denom).toLong
    }
  }

  /** Top principal component of the embedding corpus: 64 rows of
    * (dim_idx, loading) with ‖loading‖∞ = 1000, bit-identical in any
    * engine that replays the same integer steps. `component = 2` deflates
    * the trained first component out ([[deflate]]) and iterates again —
    * the corpus is STILL touched only once (both components train from
    * the same collected moments).
    */
  def topComponent(embeddings: DataFrame, iterations: Int = 24,
                   vecCol: String = "embedding", component: Int = 1): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(component == 1 || component == 2, "component must be 1 or 2")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val c2 = covarianceFromMoments(momentFrame(embeddings, vecCol))
    val v1 = powerIterate(c2, iterations)
    val v = if (component == 1) v1
            else powerIterate(deflate(c2, v1), iterations)
    v.toSeq.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("dim_idx", "loading")
  }

  /** Train from a (possibly merged) moment frame instead of the raw
    * corpus — the incremental-retrain entry point: persist
    * [[momentFrame]] as parquet state, [[mergeMoments]] in each append's
    * delta, train from here. Exactly equal to batch training on the
    * union (the sums are associative and the downstream arithmetic sees
    * only their totals) — q256 pins that equivalence against the
    * from-scratch oracle.
    */
  def topComponentFromMoments(moments: DataFrame,
                              iterations: Int = 24): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val spark = moments.sparkSession
    import spark.implicits._
    powerIterate(covarianceFromMoments(moments), iterations)
      .toSeq.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("dim_idx", "loading")
  }

  /** Per-vector projection onto the trained component (integer dot of the
    * quantized vector with the loadings, in loading·Scale fixed point) and
    * the corpus top-k by |score| — the "most extreme along the first PC"
    * outlier readout. One narrow map with the 64-long loadings inlined as
    * a literal; one top-k sort of scores.
    */
  def project(embeddings: DataFrame, iterations: Int = 24, k: Int = 50,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = powerIterate(
      covarianceFromMoments(momentFrame(embeddings, vecCol)), iterations)
    val q = embeddings.select(col(idCol).cast(LongType).as("vec_id"),
      Clustering.quantize(col(vecCol)).as("qv"))
    val loadings = typedlit(v.toSeq)
    q.select(col("vec_id"),
      aggregate(zip_with(col("qv"), loadings, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id"))
      .limit(k)
  }
}
