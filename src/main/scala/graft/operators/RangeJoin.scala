package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the theta-join trap.
  *
  * Spark turns `p.v >= i.lo AND p.v < i.hi` into a BroadcastNestedLoopJoin
  * (or worse, a cartesian) — every point against every interval, quadratic
  * at scale. Here intervals are exploded into fixed-width chunks of the
  * value domain, points hash to their one chunk, and matching becomes an
  * equi-join on the chunk id (a proper shuffle key) plus a residual range
  * filter. An interval touches `⌈span/chunkWidth⌉` chunks, so candidate
  * volume is (points per chunk) × (intervals overlapping that chunk) —
  * local density, not the global cross product.
  *
  * `chunkWidth` trades replication (long intervals explode into more
  * chunks) against selectivity (wide chunks admit more false candidates);
  * pick ≈ the typical interval span. Values are BIGINT domain (cast dates
  * to epoch days, timestamps to epoch seconds); `lo` inclusive, `hi`
  * exclusive; empty intervals (hi ≤ lo) match nothing.
  */
object RangeJoin {

  /** Exact floor division in the integer domain: `(c − pmod(c, w)) div w`.
    * The numerator is an exact multiple of w so truncating `div` equals
    * floor — and unlike Spark's `/` (double division) it never rounds
    * through a 53-bit mantissa, so chunk ids stay exact at any BIGINT
    * magnitude (values above ~2^53 would otherwise land in wrong chunks
    * and silently drop matches).
    */
  private def floorDiv(name: String, w: Long): Column =
    expr(s"(`$name` - pmod(`$name`, ${w}L)) div ${w}L")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    // staged internal names must not silently clobber user columns (same
    // contract as AsOfJoin's reserved-name guard)
    val clash = (points.columns ++ intervals.columns).filter(Set("__chunk", "__hi1"))
    require(clash.isEmpty,
      s"pointInInterval reserved column names present in input: ${clash.mkString(", ")}")
    val p = points.withColumn("__chunk", floorDiv(pointCol, chunkWidth))
    val iv = intervals
      .filter(col(hiCol) > col(loCol)) // guard: sequence(lo, hi) descends if hi < lo
      .withColumn("__hi1", col(hiCol) - 1)
      .withColumn("__chunk", explode(sequence(
        floorDiv(loCol, chunkWidth),
        floorDiv("__hi1", chunkWidth))))
      .drop("__hi1")
    p.join(iv, Seq("__chunk"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__chunk")
  }

  /** Interval × interval overlap join: pairs with `loL < hiR AND loR < hiL`
    * (both half-open [lo, hi)) — the sibling of [[pointInInterval]] for
    * session-vs-session, outage-vs-request, span-vs-span matching.
    *
    * Both sides explode to the chunks they cover and candidates equi-join
    * on the chunk id. An overlapping pair shares EVERY chunk its
    * intersection covers, so a naive chunk join double-counts; the pair is
    * emitted exactly once — by the chunk containing the intersection's left
    * edge `max(loL, loR)` (its "responsibility" chunk). That is a plain
    * codegen-able predicate, replacing the whole-output DISTINCT a dense
    * overlap set cannot afford (the q15 first-agreeing-band pattern moved
    * into the value domain).
    *
    * The two sides must use distinct lo/hi column names (rename before
    * calling); `chunkWidth` ≈ the typical interval span, as in
    * [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loL: String, hiL: String, loR: String, hiR: String,
                      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    require(Set(loL, hiL).intersect(Set(loR, hiR)).isEmpty,
      "left and right interval columns must have distinct names")
    val clash = (left.columns ++ right.columns).filter(Set("__chunk", "__hi1", "__edge"))
    require(clash.isEmpty,
      s"intervalOverlap reserved column names present in input: ${clash.mkString(", ")}")
    def chunked(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__hi1", col(hi) - 1)
      .withColumn("__chunk", explode(sequence(
        floorDiv(lo, chunkWidth), floorDiv("__hi1", chunkWidth))))
      .drop("__hi1")
    chunked(left, loL, hiL).join(chunked(right, loR, hiR), Seq("__chunk"))
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL))
      // responsibility chunk: only the chunk holding the overlap's left edge emits
      .withColumn("__edge", greatest(col(loL), col(loR)))
      .filter(col("__chunk") === floorDiv("__edge", chunkWidth))
      .drop("__chunk", "__edge")
  }

  /** 2-D radius self-join (the spatial-grid join of Bentley's 1975
    * fixed-grid method, public literature): all point pairs with
    * (x_a−x_b)² + (y_a−y_b)² ≤ r², without the cross-product trap.
    *
    * Each point hashes to its own r×r grid cell; the probe side is
    * exploded to its 3×3 cell neighborhood, so matching is ONE equi-join
    * on the cell key (a proper shuffle key) and the exact integer
    * distance filter runs only on neighborhood candidates — any pair
    * within r is in adjacent cells, and matches exactly once (the build
    * point's own cell is one specific member of the probe's
    * neighborhood). Output is (id_a < id_b, coordinates, dist2), all
    * integer.
    *
    * Scale shape: candidate volume is Σ_cell (occupancy × 9-neighborhood
    * occupancy) — local density, never n². Integer coordinates are the
    * caller's contract (quantize floats upstream); dist² stays in BIGINT
    * for |coords| < ~2·10⁹.
    */
  def radiusSelfJoin2D(points: DataFrame, r: Long): DataFrame = {
    require(r > 0, "radius must be positive")
    val p = points.select(col("id"), col("x"), col("y"))
    val build = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      floorDiv("x", r).as("cx"), floorDiv("y", r).as("cy"))
    val probe = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      floorDiv("x", r).as("px"), floorDiv("y", r).as("py"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_b"), col("xb"), col("yb"),
        (col("px") + col("dx")).as("cx"), (col("py") + col("dy")).as("cy"))
    build.join(probe, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        expr("(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)"))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
