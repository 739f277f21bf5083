package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins Spark's dynamic partition pruning (DPP) — the mechanism that makes
  * partitioned star joins feasible at 100 TB: a selective dim-side filter
  * becomes a RUNTIME partition filter on the fact scan (via a reused
  * broadcast / subquery), so the fact read touches only the partitions the
  * join can match instead of the whole table. Static pruning (a literal
  * filter on the partition column) is pinned by ParquetSinkSpec; this is
  * the through-a-join variant, which is what real star queries rely on —
  * the dim filter ("this month", "this region") is rarely spelled against
  * the fact's partition column directly.
  */
class DynamicPruningSpec extends SparkSpec {

  test("dim-side filter dynamically prunes fact partitions through the join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
      .toFile.getAbsolutePath
    // fact partitioned on pk (10 partitions of 100 rows)
    spark.range(0, 1000).selectExpr("id", "id % 10 AS pk")
      .write.partitionBy("pk").mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.range(0, 10)
      .selectExpr("id AS dk", "id % 5 AS attr")
    // attr = 1 selects dk ∈ {1, 6} → only 2 of 10 fact partitions can match
    val q = fact.join(dim.filter(col("attr") === 1), col("pk") === col("dk"))

    val planned = q.queryExecution.sparkPlan.toString
    assert(planned.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$planned")

    // correctness of the pruned read: 2 matching partitions × 100 rows.
    // collect() (not count()) so THIS Dataset's queryExecution is the one
    // that ran — count() builds a separate aggregate plan and the metrics
    // below would read an unexecuted scan (observed: numPartitions = 0)
    assert(q.collect().length === 200)

    // post-execution, the fact scan's own metric must show the pruned
    // partition count (2), not the static count (10) — the plan-string
    // assert alone would pass even if the filter never pruned anything.
    // AQE wraps stages, so unwrap adaptive shells / query stages manually
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case st: QueryStageExec => scans(st.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val factScans = scans(q.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("fact")))
    assert(factScans.nonEmpty, "fact FileSourceScanExec not found")
    val partsRead = factScans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L),
      s"expected 2 partitions read after dynamic pruning, got $partsRead")
  }
}
