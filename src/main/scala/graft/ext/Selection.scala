package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** EXACT distributed order statistics without a global sort.
  *
  * The classic way to read "the exact p99 of 100 TB" is
  * `ORDER BY v LIMIT 1 OFFSET k-1` — a full shuffle-sort of every fact
  * row for one scalar. This module implements iterative histogram descent
  * (the distributed selection algorithm, e.g. Blum et al.'s selection
  * made scan-parallel): each round scans the facts once, buckets the
  * values of every still-unresolved (group, quantile) probe into `B`
  * equal-width bins with a map-combined aggregate, and the driver walks
  * the tiny histogram to narrow each probe's range by a factor of `B`.
  * After at most ⌈log_B(range)⌉ rounds (2 for a cent-priced domain at
  * B=4096, ≤6 for the full 64-bit domain) every range has width 1 and
  * the bucket IS the answer — exact, not approximate, and never a
  * row-level sort or a per-group sort.
  *
  * Scale shape: per round, ONE pass over the facts. All groups and all
  * ranks share the pass (their ranges ride a broadcast side); a coarse
  * `v BETWEEN global_lo AND global_hi` literal bound is applied first so
  * later rounds push down to the parquet scan and prune row groups. The
  * per-round driver collect is ≤ probes × B histogram rows — bounded by
  * construction, never data-sized (the kmeans-centroid precedent).
  *
  * Determinism: pure integer arithmetic over a fixed bucket grid —
  * layout-invariant and bit-stable by construction.
  */
object Selection {

  private final case class Probe(g: String, qPpm: Long, rank: Long,
                                 lo: Long, hi: Long, k: Long, done: Boolean)

  /** The `rank`-th smallest (1-based, ascending, duplicates counted) for
    * quantile ppm `p` over `n` rows: ceil(p·n / 10⁶), floored at 1 — the
    * inverted-CDF convention (p=500000 over n=4 → rank 2).
    */
  private def rankOf(ppm: Long, n: Long): Long =
    math.max(1L, ((BigInt(ppm) * n + 999999) / 1000000).toLong)

  /** Exact per-group quantiles via histogram descent. `df` is projected
    * to (`grpCol` as string, `valueCol` as BIGINT); output is one row per
    * (group, quantile): `(key, q_ppm, rank, value)`. Group identity is
    * the STRING form of `grpCol` (cast up front — callers with non-string
    * keys get string-equality grouping).
    *
    * Each round re-reads the source relation rather than caching it —
    * at 100 TB a cache of the fact column is the thing that does not
    * fit, while ⌈log_B(range)⌉ pruned scans are exactly what a selection
    * pays. Values must span less than 2⁶² (guarded) so range arithmetic
    * stays in Long.
    */
  def exactGroupQuantiles(df: DataFrame, grpCol: String, valueCol: Column,
                          ppms: Seq[Long], buckets: Int = 4096): DataFrame =
    exactGroupQuantilesWeighted(df, grpCol, valueCol, lit(1L), ppms, buckets)

  /** WEIGHTED [[exactGroupQuantiles]]: the rank for quantile p is
    * max(1, ⌈p·W/10⁶⌉) over the group's total weight W, and the answer
    * is the smallest v whose cumulative weight reaches it — the weighted
    * median/percentile (e.g. "the price below which half the QUANTITY
    * trades") in the same ⌈log_B(range)⌉ descent passes, histogram
    * masses summing weights instead of counting rows. Weights must be
    * positive integers (exactness contract: a weighted rank is only
    * well-defined on exact masses).
    */
  def exactGroupQuantilesWeighted(df: DataFrame, grpCol: String,
                                  valueCol: Column, weightCol: Column,
                                  ppms: Seq[Long], buckets: Int = 4096): DataFrame = {
    require(ppms.nonEmpty && ppms.forall(p => p >= 1 && p <= 1000000),
      s"quantile ppms must be in [1, 1000000]: $ppms")
    // duplicate ppms would emit duplicate (group, quantile) range rows,
    // double-counting every fact's histogram mass in the range join —
    // the descent would silently resolve to ~half the requested rank
    require(ppms.distinct.size == ppms.size, s"duplicate quantile ppms: $ppms")
    require(buckets >= 2 && buckets <= 65536, s"buckets in [2, 65536]: $buckets")
    val spark = df.sparkSession
    val facts = df
      .select(col(grpCol).cast("string").as("g"), valueCol.cast("long").as("v"),
        weightCol.cast("long").as("w"))
      .filter(col("g").isNotNull && col("v").isNotNull && col("w").isNotNull)

    val bounds = facts.groupBy("g")
      .agg(sum("w").as("n"), min("v").as("mn"), max("v").as("mx"),
        min("w").as("wmin"))
      .collect() // one row per group — keyspace-sized by contract
    bounds.foreach { r =>
      require(r.getLong(4) >= 1,
        s"weights must be positive integers (group ${r.getString(0)} has ${r.getLong(4)})")
      require(BigInt(r.getLong(3)) - BigInt(r.getLong(2)) < (BigInt(1) << 62),
        s"value range for group ${r.getString(0)} exceeds 2^62")
    }

    var probes: Seq[Probe] = bounds.toSeq.flatMap { r =>
      val (g, n, mn, mx) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      ppms.map { p =>
        val rk = rankOf(p, n)
        // single-valued group: resolved before any descent round
        Probe(g, p, rk, mn, mx + 1, rk, done = mn == mx)
      }
    }

    while (probes.exists(!_.done)) {
      val active = probes.filter(!_.done)
      def widthOf(p: Probe): Long =
        ((BigInt(p.hi) - BigInt(p.lo) + buckets - 1) / buckets).toLong
      val rangeRows = active.map(p => Row(p.g, p.qPpm, p.lo, p.hi, widthOf(p)))
      val rangeSchema = StructType(Seq(
        StructField("rg", StringType), StructField("rq", LongType),
        StructField("rlo", LongType), StructField("rhi", LongType),
        StructField("rw", LongType)))
      val ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(rangeRows, 1), rangeSchema)
      val gLo = active.map(_.lo).min
      val gHi = active.map(_.hi).max
      val hist = facts
        .filter(col("v") >= gLo && col("v") < gHi) // literal → pushed scan bound
        .join(broadcast(ranges),
          col("g") === col("rg") && col("v") >= col("rlo") && col("v") < col("rhi"))
        .groupBy(col("rg"), col("rq"), expr("(v - rlo) div rw").as("b"))
        .agg(sum("w").as("c"))
        .collect() // ≤ active-probes × buckets rows
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sortBy(_._1) }

      probes = probes.map { p =>
        if (p.done) p
        else {
          val w = widthOf(p)
          val bs = hist.getOrElse((p.g, p.qPpm),
            throw new IllegalStateException(
              s"descent lost rank ${p.rank} for group ${p.g} — " +
                "input changed between rounds?"))
          var rem = p.k
          var chosen: Option[(Long, Long)] = None
          val it = bs.iterator
          while (chosen.isEmpty && it.hasNext) {
            val (cb, cc) = it.next()
            if (rem <= cc) chosen = Some((cb, rem)) else rem -= cc
          }
          val (b, inBucket) = chosen.getOrElse(throw new IllegalStateException(
            s"rank ${p.rank} beyond histogram mass for group ${p.g}"))
          val lo2 = p.lo + b * w
          val hi2 = math.min(p.hi, lo2 + w)
          p.copy(lo = lo2, hi = hi2, k = inBucket, done = hi2 - lo2 == 1)
        }
      }
    }

    val outRows = probes.sortBy(p => (p.g, p.qPpm))
      .map(p => Row(p.g, p.qPpm, p.rank, p.lo))
    val outSchema = StructType(Seq(
      StructField("key", StringType), StructField("q_ppm", LongType),
      StructField("rank", LongType), StructField("value", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(outRows, 1), outSchema)
  }

  /** Ungrouped [[exactGroupQuantiles]]: `(q_ppm, rank, value)` for each
    * requested quantile over the whole relation.
    */
  def exactQuantiles(df: DataFrame, valueCol: Column, ppms: Seq[Long],
                     buckets: Int = 4096): DataFrame =
    exactGroupQuantiles(df.select(lit("_").as("__g"), valueCol.as("__v")),
      "__g", col("__v"), ppms, buckets)
      .drop("key")
}
