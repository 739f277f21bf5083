package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

class RewriteHofDotProductSpec extends SparkSpec {

  // parquet-backed (a LocalRelation would be constant-folded by the core
  // optimizer before injected user rules run — real pipelines read files)
  private lazy val vecs = {
    val dir = java.nio.file.Files.createTempDirectory("hofdot").toString
    df("id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      Row(0, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      Row(1, Seq(1.0, 2.0), Seq(4.0, 5.0, 6.0)),       // length mismatch → null
      Row(2, Seq(1.0, null, 3.0), Seq(4.0, 5.0, 6.0)), // null element → null
      Row(3, null, Seq(1.0))))                          // null array → null
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).orderBy("id")
  }

  test("HOF aggregate(zip_with(*)) is rewritten to the native DotProduct") {
    // alias the output: the auto-generated column NAME embeds the original
    // expression text, which would false-positive the assertions below
    val plan = vecs.select(Similarity.dotHof(col("a"), col("b")).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("dotproduct"), s"rule did not fire:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF survived:\n$plan")
  }

  test("rewrite preserves results exactly, including null semantics") {
    // compare against the interpreted HOF evaluated WITHOUT the rule
    // (a filter with a non-matching finish lambda prevents the rewrite)
    val viaRule = vecs.select(Similarity.dotHof(col("a"), col("b")).as("d")).collect()
    val unrewritten = vecs.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v, x => x + lit(0.0))).as("d")).collect() // finish ≠ identity
    viaRule.zip(unrewritten).foreach { case (a, b) =>
      assert(a.isNullAt(0) == b.isNullAt(0))
      if (!a.isNullAt(0)) assert(a.getDouble(0) == b.getDouble(0))
    }
    assert(viaRule(0).getDouble(0) == 32.0)
    assert(viaRule(1).isNullAt(0) && viaRule(2).isNullAt(0) && viaRule(3).isNullAt(0))
  }

  test("non-matching patterns are left alone") {
    // different zero → no rewrite
    val p1 = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0), (acc, v) => acc + v))
      .queryExecution.optimizedPlan.toString
    assert(p1.contains("aggregate("))
    // sum of elements (not a product) → no rewrite
    val p2 = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0.0), (acc, v) => acc + v))
      .queryExecution.optimizedPlan.toString
    assert(p2.contains("aggregate("))
  }
}
