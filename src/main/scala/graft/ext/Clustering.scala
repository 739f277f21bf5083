package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.functions.VectorFunctions

/** Distributed k-means (Lloyd's) and SemDeDup-style semantic deduplication
  * over the embedding corpus — the clustering layer a 100 TB curation
  * pipeline trains its IVF coarse quantizer and semantic-dedup cells with
  * (extension surface; the reference has no ML-clustering analogue).
  *
  * All iterate arithmetic is EXACT fixed-point integer math so every
  * Lloyd's step is bit-identical cross-engine and the DuckDB oracle can
  * replay the full training loop: vectors quantize to `⌊x·10⁶ + 0.5⌋`
  * longs, distances are integer squared-L2 (max `64·(1.16e6)² < 2⁵⁷`, no
  * overflow), and centroid means use truncating integer division —
  * Spark's `div` and DuckDB's `//` both truncate toward zero, verified on
  * negative operands.
  *
  * Scale shape per Lloyd's iteration:
  *   - assignment is a NARROW map: the k centroids inline into one
  *     `array_min(array(struct(dist, cid)…))` expression (no crossJoin, no
  *     per-row shuffle) — the corpus never moves;
  *   - the update is one `(cid, dim)`-keyed partial aggregation — the only
  *     shuffle, carrying k·dim partial sums per map task, not the corpus;
  *   - centroids collect to the driver between iterations (k·dim longs —
  *     the standard Lloyd's driver loop, independent of corpus size).
  * k scales with the corpus (`seeds = ids ≡ 0 mod seedMod` ⇒ k ≈
  * n/seedMod), holding expected cell size flat as the corpus grows — the
  * same self-scaling rule as the adaptive LSH planes. The inlined-centroid
  * expression is the right trade up to a few thousand centroids (codegen
  * handles k·dim constant folds); beyond that, switch the assignment to
  * the broadcast-join form `ivfTopK` uses.
  */
object Clustering {

  /** Fixed-point scale: 6 decimal digits — comfortably past the float32
    * mantissa noise floor for unit-norm-ish embeddings.
    */
  val Scale = 1000000L

  /** `⌊x·Scale + 0.5⌋` as BIGINT — `floor(x + 0.5)` not `round()`, so the
    * oracle reproduces each cell without either engine's half-tie rule
    * (same policy as [[Similarity.quantizeInt8]]).
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast(DoubleType) * Scale.toDouble + lit(0.5)).cast(LongType))

  /** Integer squared-L2 between two BIGINT vectors (exact) — the native
    * fused loop ([[graft.functions.LongL2Squared]]); with k inlined
    * centroids per row the HOF formulation would run 2k interpreted
    * lambdas and k array allocations per input row.
    */
  private def l2sq(a: Column, b: Column): Column =
    VectorFunctions.l2Squared(a, b)

  /** Trained assignment after `iterations` full Lloyd's steps
    * (assign → recompute means), plus a final assignment against the
    * trained centroids: `(vec_id, cluster, dist)` — cluster is the seed id
    * of the winning centroid, dist the exact integer squared-L2 in
    * quantized space. Ties break to the lowest cid; empty clusters drop
    * out of the centroid set (both deterministic, both replayed by the
    * oracle).
    */
  def kmeansAssign(embeddings: DataFrame, seedMod: Int = 64, iterations: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the iterative working set: quantize ONCE and pin it (the standard
    // cache-the-training-input pattern) — every Lloyd's pass re-reads
    // these blocks instead of re-scanning and re-quantizing the source
    val q = embeddings.select(
      col(idCol).cast(LongType).as("vec_id"),
      quantize(col(vecCol)).as("qv"))
      .localCheckpoint(true)

    // seed centroids: a deterministic id-spread subset, k ≈ n / seedMod
    var cent: Array[(Long, Seq[Long])] =
      q.filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id"), col("qv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
        .sortBy(_._1)

    // (vec_id, cluster, dist, qv) — narrow map, centroids inlined
    def assigned: DataFrame = {
      val candidates = cent.map { case (cid, cv) =>
        struct(
          l2sq(col("qv"), typedLit(cv)).as("dist"),
          lit(cid).as("cid"))
      }
      // struct ordering is field-order lexicographic ⇒ (min dist, min cid)
      q.withColumn("best", array_min(array(candidates.toIndexedSeq: _*)))
        .select(col("vec_id"), col("best.cid").as("cluster"),
          col("best.dist").as("dist"), col("qv"))
    }

    for (_ <- 1 to iterations) {
      // per-(cluster, dim) truncated-mean update: ONE partial-agg shuffle
      cent = assigned
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(expr("sum(v) div count(1)").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
        .sortBy(_._1)
    }

    assigned.select("vec_id", "cluster", "dist")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper):
    * semantic near-duplicate removal by clustering the embedding space and
    * comparing pairs ONLY within a cell. A vector is removed when its cell
    * holds a lower-id vector with cosine ≥ `threshold`; one representative
    * per similar group survives. Output: `(vec_id, cluster, kept)`.
    *
    * Scale: the k-means cells bound the quadratic stage — pair volume is
    * Σ cell² with cell size held ≈ seedMod by the self-scaling k, so the
    * candidate join is an equi-join on cluster id with bounded fan-in, the
    * same shape as the LSH-bucket near-dup path (q24) but in semantic
    * space rather than hash space. Cosine re-check runs on the ORIGINAL
    * float vectors (fused codegen expression), rounded to 6 decimals at
    * the decision boundary like every cosine in this engine.
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.3,
                    seedMod: Int = 64, iterations: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assign = kmeansAssign(embeddings, seedMod, iterations, idCol, vecCol)
    val v = embeddings
      .select(col(idCol).cast(LongType).as("vec_id"), col(vecCol).as("fv"))
      .join(assign, "vec_id")

    val a = v.select(col("cluster"), col("vec_id").as("id_a"), col("fv").as("av"))
    val b = v.select(col("cluster"), col("vec_id").as("id_b"), col("fv").as("bv"))
    val removed = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(VectorFunctions.cosineSim(col("av"), col("bv")), 6) >= threshold)
      .select(col("id_b").as("vec_id"))
      .distinct()

    v.join(removed.withColumn("gone", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("gone").isNull.as("kept"))
  }
}
