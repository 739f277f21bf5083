package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The iterative tier's checkpoint switch: default `localCheckpoint`
  * (bench parity) vs `spark.graft.checkpointDir`-gated reliable
  * `checkpoint()` (executor-loss resilience for multi-hour jobs). Both
  * must produce identical rows AND the identical plan leaf shape — the
  * downstream plan must not know which posture pinned the state.
  */
class PinSpec extends SparkSpec {

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Pin.ConfKey, dir)
    try body finally spark.conf.unset(Pin.ConfKey)
  }

  test("pin: identical rows and LogicalRDD leaf under both postures") {
    val base = df("id BIGINT, v BIGINT",
      (1L to 50L).map(i => Row(i, i * 7 % 13)))
    val local = Pin.pin(base.filter(col("v") > 2))
    val reliable = withReliable(Pin.pin(base.filter(col("v") > 2)))
    assert(rowSet(local) == rowSet(reliable))
    // same leaf shape: both postures cut lineage into a LogicalRDD scan,
    // so every downstream plan is identical across the switch
    assert(local.queryExecution.logical.isInstanceOf[LogicalRDD])
    assert(reliable.queryExecution.logical.isInstanceOf[LogicalRDD])
    // reliable posture actually wrote through the configured directory
    assert(spark.sparkContext.getCheckpointDir.isDefined)
  }

  test("pin: reliable mode sets the checkpoint root ONCE across rounds") {
    val base = df("id BIGINT", (1L to 20L).map(Row(_)))
    withReliable {
      Pin.pin(base)
      val first = spark.sparkContext.getCheckpointDir
      Pin.pin(base.filter(col("id") > 5))
      Pin.pin(base.filter(col("id") > 10))
      val after = spark.sparkContext.getCheckpointDir
      // setCheckpointDir stores a <dir>/<UUID> child; re-invoking it per
      // pin would rotate the UUID — the per-round helper must reuse it
      assert(first.isDefined && first == after)
      // stored path is scheme-qualified (file:<dir>/<UUID>) — contains,
      // not startsWith, is the invariant the helper relies on
      assert(first.get.contains(spark.conf.get(Pin.ConfKey)))
    }
  }

  test("pin: switching to a root that is a substring of the old one re-points") {
    val base = df("id BIGINT", (1L to 10L).map(Row(_)))
    val parent = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val oldRoot = s"$parent/ckpt2" // new root below is its strict prefix
    val newRoot = s"$parent/ckpt"
    spark.conf.set(Pin.ConfKey, oldRoot)
    try {
      Pin.pin(base)
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(oldRoot)))
      spark.conf.set(Pin.ConfKey, newRoot)
      Pin.pin(base)
      // a substring containment check would false-positive here (oldRoot
      // contains newRoot) and keep writing under the stale root
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.exists(_.contains(newRoot)) && !dir.exists(_.contains(oldRoot)))
    } finally spark.conf.unset(Pin.ConfKey)
  }

  test("pin: an externally re-pointed context checkpoint dir is restored to the root") {
    val base = df("id BIGINT", (1L to 10L).map(Row(_)))
    withReliable {
      Pin.pin(base)
      val root = spark.conf.get(Pin.ConfKey)
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(root)))
      // another library steals the shared context's checkpoint dir
      val foreign = java.nio.file.Files.createTempDirectory("graft-foreign").toString
      spark.sparkContext.setCheckpointDir(foreign)
      Pin.pin(base)
      // the helper must notice (containment check) and re-point to ITS root
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(root)))
    }
  }

  test("pin: an iterative operator (connected components) agrees across the switch") {
    val edges = df("src BIGINT, dst BIGINT", Seq(
      Row(1L, 2L), Row(2L, 3L), Row(10L, 11L), Row(11L, 12L),
      Row(20L, 21L), Row(3L, 4L), Row(12L, 10L)))
    val nodes = df("doc_id BIGINT",
      (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 99L)).map(Row(_)))
    val a = rowSet(Dedup.connectedComponents(edges, nodes))
    val b = withReliable(rowSet(Dedup.connectedComponents(edges, nodes)))
    assert(a == b && a.nonEmpty)
  }

  test("pin: suffix-indexing longest repeat agrees across the switch") {
    val ten = (1 to 10).map(i => s"L$i").mkString(" ")
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, s"a b $ten c"), Row(2L, s"x $ten y z")))
    val a = rowSet(SuffixDedup.longestRepeat(docs))
    val b = withReliable(rowSet(SuffixDedup.longestRepeat(docs)))
    assert(a == b)
    assert(a.head.startsWith("10|"))
  }
}
