package graft.ext

import org.apache.spark.SparkContext
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
  *
  * ==Checkpoint retention==
  * In reliable mode every round's `checkpoint()` writes a NEW file set
  * under the configured root, and Spark never deletes a superseded
  * round's files on its own: `unpersist` is a storage-level no-op for a
  * `ReliableCheckpointRDD`, and the ContextCleaner only removes
  * checkpoint data when the (non-default)
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set AND
  * the checkpointed RDD is garbage-collected on the driver. A long
  * prefix-doubling climb therefore accumulates one superseded directory
  * per round for the job's lifetime — bounded by rounds (⌈log₂ λ*⌉ for
  * the suffix tier, tens not thousands), but real distributed-FS space.
  * For multi-hour jobs set `cleanCheckpoints=true` (rounds drop their
  * upstream references, so GC reclaims superseded rounds while the climb
  * runs), or point [[ConfKey]] at a job-scoped directory and delete it
  * after the job — the checkpoint data has no value once the job ends.
  */
object Pin {
  val ConfKey = "spark.graft.checkpointDir"

  /** The exact (context, root) this helper last passed to
    * `setCheckpointDir` — `getCheckpointDir` returns a scheme-qualified
    * `<fs>:<root>/<UUID>` child, so no string test against it can
    * reliably recover which ROOT was configured (a substring test
    * false-positives when the new root is a prefix of the old one, e.g.
    * `/data/ckpt` after `/data/ckpt2`, silently landing checkpoints
    * under the stale root). Tracking the root we set is exact.
    */
  @volatile private var lastSet: (SparkContext, String) = null

  /** Eagerly materializes `df` and cuts its lineage, local or reliable
    * per [[ConfKey]]. The SparkContext checkpoint dir is set lazily on
    * first reliable use (setCheckpointDir creates the directory) and
    * re-set only when the configured root actually changes — re-invoking
    * it per pin would scatter one UUID directory per round.
    */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        val cached = lastSet
        // re-point when the configured root changed (exact field compare —
        // a substring test false-positives on prefix roots) OR when the
        // context's dir no longer sits under the root (someone ELSE called
        // setCheckpointDir on the shared context; containment is the only
        // visibility we have into that, since the stored value is a
        // scheme-qualified UUID child)
        if (cached == null || (cached._1 ne sc) || cached._2 != dir ||
            !sc.getCheckpointDir.exists(_.contains(dir))) {
          sc.setCheckpointDir(dir)
          lastSet = (sc, dir)
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** `df.pin()` — chain-position drop-in for `.localCheckpoint(true)`. */
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Pin.pin(df)
  }
}
