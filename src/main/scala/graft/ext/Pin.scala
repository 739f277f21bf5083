package graft.ext

import org.apache.spark.sql.DataFrame

/** Per-round state pinning for the iterative tier (SuffixDedup's
  * prefix-doubling, connected components, k-core peel, PageRank/HITS,
  * BPE merges, k-means/k-center passes, greedy MMR) — one shared switch
  * between the two Spark checkpoint postures:
  *
  *   - DEFAULT (`spark.graft.checkpointDir` unset): eager
  *     `localCheckpoint` — blocks live on executor storage, zero
  *     distributed-FS traffic, the right call for bench parity and any
  *     single-JVM run. NON-RESILIENT: lineage is truncated, so losing an
  *     executor loses blocks nothing can recompute and the job dies.
  *   - RELIABLE (`spark.graft.checkpointDir` = an HDFS/object-store
  *     path): eager `checkpoint()` through the configured directory —
  *     each round's state survives executor loss, which is what a
  *     multi-hour 100 TB iterative job needs (a lost executor at round
  *     40 of a prefix-doubling climb must not restart the whole climb).
  *
  * Both postures return a Dataset backed by the SAME leaf shape (a
  * `LogicalRDD` over the materialized rows), so downstream plans are
  * identical — [[PinSpec]] asserts results AND optimized-plan leaf class
  * match across the switch. The config is read per call: it is a runtime
  * conf (settable mid-session), and iterative operators already
  * re-enter this helper once per round.
  */
object Pin {
  val ConfKey = "spark.graft.checkpointDir"

  /** Eagerly materializes `df` and cuts its lineage, local or reliable
    * per [[ConfKey]]. The SparkContext checkpoint dir is set lazily on
    * first reliable use (setCheckpointDir creates the directory).
    */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir stores (and mkdirs) a SCHEME-QUALIFIED
        // `<fs>:<dir>/<UUID>` CHILD — neither equality nor a plain
        // prefix match against the configured `dir` ever holds
        // (PinSpec caught both: `file:` + UUID), and a failed match
        // would re-invoke it on every per-round pin, scattering one
        // UUID directory per round across the distributed FS.
        // Containment of the configured root is the scheme-tolerant
        // "already set to this root" check.
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** `df.pin()` — chain-position drop-in for `.localCheckpoint(true)`. */
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Pin.pin(df)
  }
}
