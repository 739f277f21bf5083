package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge lists — the second graph operator
  * family next to [[Dedup.connectedComponents]]. Same engine shape: the
  * edge relation is checkpointed once, each round is one equi-join + one
  * key aggregate, and per-round `localCheckpoint` keeps the lineage (and
  * task closure) O(1) instead of O(rounds).
  *
  * Exactness policy: FIXED-POINT INTEGER PageRank. Floating-point PageRank
  * sums contributions in shuffle order — unreproducible across engines and
  * even across runs. Here ranks are integers at `scale`, contributions are
  * floor-divided (`pr div outdeg`), the damping step is
  * `(15·scale)/100 + (85·Σ)/100` in integer arithmetic, and iteration
  * count is fixed — every engine computes bit-identical ranks.
  */
object Graph {

  /** Fixed-iteration integer PageRank over a directed edge list.
    *
    * Every node is assumed to have outdegree ≥ 1 (true for symmetrized
    * edge lists — the caller's job otherwise); with no dangling mass the
    * per-round total stays bounded by N·scale, so with
    * `85 · N · scale < 2⁶³` the integer arithmetic cannot overflow
    * (N ≈ 10⁸ nodes at the default scale; lower `scale` for bigger
    * graphs).
    *
    * Scale shape per round: one (src) equi-join edge⋈rank, one (dst) hash
    * aggregate, one left join back to the node set — all shuffling on
    * explicit keys, nothing quadratic, matching the label-propagation
    * loop's cost model. `localCheckpoint(eager)` per round frees the
    * previous round's blocks (the overwritten reference is the only one).
    */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // edge relation partitioned by DST once: every round's contribution
    // aggregate groups by dst, so the big relation crosses the wire
    // exactly once for the whole run — per round the only data movement
    // is broadcasting the keyspace-sized rank relation
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(broadcast(deg), "src").localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var pr = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iterations) {
      val sums = withDeg.join(broadcast(pr), withDeg("src") === pr("id"))
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      pr = nodes.join(sums, Seq("id"), "left")
        .na.fill(0L, Seq("s"))
        .select(col("id"),
          (lit(15L * scale / 100L) + expr("(85 * s) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("id").as("node_id"), col("pr"))
  }
}
