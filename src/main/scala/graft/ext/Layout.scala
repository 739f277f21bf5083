package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Physical-layout effectiveness audits.
  *
  * [[graft.load.Sinks.zorderParquet]] WRITES a two-dimensional clustering;
  * this module MEASURES what that clustering buys: for each candidate
  * layout, split the table into `nFiles` equal row ranges in layout order,
  * compute each file's per-key min/max envelope (what parquet footers
  * store), and count how many files a panel of point queries would have to
  * open. The output is the table an OPTIMIZE decision reads — "linear on A
  * prunes A perfectly and B not at all; z-order prunes both at ~√nFiles" —
  * quantified on the actual key distribution instead of asserted.
  */
object Layout {

  /** Exact global rank under a TOTAL order (callers must include a unique
    * tiebreak column), computed distributed: range-repartition + partition
    * -local sort yields a globally sorted frame whose partitions are in
    * range order, so `zipWithIndex` (one count job + one pass) assigns the
    * exact sort rank without ever collecting a partition to one task —
    * the same device Feeds.scala uses for positional header skips. Range
    * boundaries are SAMPLED, but ranks depend only on the total order, so
    * the result is layout-invariant (the Determinism gate's property).
    */
  private def withGlobalRank(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val sorted = df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("rnk", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** File-skipping audit comparing `linear_a` (sort by keyA — the default
    * "cluster by the leading filter column" layout) against `zorder`
    * (bit-interleaved keyA×keyB). Both keys are masked to `bits` low bits
    * (the [[graft.load.Sinks.zValue]] contract; callers with wider domains
    * pre-scale). Probes are the distinct key values with
    * `key % probeMod == probeResidue` — a deterministic pseudo-random
    * panel both engines derive identically, sized by the modulus.
    *
    * Output: one row per (layout, dim) — n_files, n_probes, and
    * files_hit = Σ over probes of files whose [min, max] envelope
    * contains the probe (the files a point query on that dim must open).
    *
    * Scale shape: the two global sorts are exactly the sorts the layout
    * WRITES would perform — auditing costs what one rewrite costs, and in
    * production runs on a cluster-sample (ext.Sampling) instead of the
    * full table. Envelopes are file-keyspace-sized (nFiles rows), probes
    * are keyspace-sized; the audit joins touch only those, never facts.
    */
  def skippingAudit(df: DataFrame, keyA: String, keyB: String, idCol: String,
                    nFiles: Int = 64, bits: Int = 16,
                    probeModA: Int = 97, probeModB: Int = 61): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive: $nFiles")
    val mask = 1L << bits
    val base = df.select(col(idCol).cast("long").as("id"),
        (col(keyA).cast("long") % mask).as("ka"),
        (col(keyB).cast("long") % mask).as("kb"))
      .withColumn("z", graft.load.Sinks.zValue(col("ka"), col("kb"), bits))
      // the keys feed two independent global sorts plus two probe panels:
      // pin them once so the scan/mask runs once
      .localCheckpoint(true)
    val n = base.count()
    require(n > 0, "skippingAudit needs a non-empty table")

    def envelopes(layout: String, sortCols: Seq[String]): DataFrame =
      withGlobalRank(base, sortCols)
        .withColumn("file", expr(s"rnk * ${nFiles}L div ${n}L"))
        .groupBy("file")
        .agg(min("ka").as("min_a"), max("ka").as("max_a"),
          min("kb").as("min_b"), max("kb").as("max_b"))
        .withColumn("layout", lit(layout))

    val env = envelopes("linear_a", Seq("ka", "id"))
      .unionByName(envelopes("zorder", Seq("z", "id")))
      .localCheckpoint(true) // 2 layouts × 2 dims of range joins below

    def hits(dim: String, probes: DataFrame, lo: String, hi: String): DataFrame =
      probes.join(env, col("p") >= col(lo) && col("p") <= col(hi))
        .groupBy("layout")
        .agg(count(lit(1)).as("files_hit"))
        .crossJoin(broadcast(probes.agg(count(lit(1)).as("n_probes"))))
        .select(col("layout"), lit(dim).as("dim"),
          lit(nFiles.toLong).as("n_files"), col("n_probes"), col("files_hit"))

    val probesA = base.select(col("ka").as("p")).distinct()
      .filter(col("p") % probeModA === 1)
    val probesB = base.select(col("kb").as("p")).distinct()
      .filter(col("p") % probeModB === 3)
    hits("a", probesA, "min_a", "max_a")
      .unionByName(hits("b", probesB, "min_b", "max_b"))
  }
}
