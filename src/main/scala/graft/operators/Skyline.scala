package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto skyline (minimize both dimensions): the rows no other row
  * strictly dominates, where `s` dominates `r` iff `s.x ≤ r.x ∧ s.y ≤ r.y`
  * with at least one strict. Ties are kept — two rows equal on both
  * dimensions dominate neither. The classic "cheapest AND smallest"
  * multi-criteria pick (price/latency, cost/error, …).
  *
  * The naive formulation is a quadratic NOT-EXISTS self-join. In 2D it
  * collapses to a PREFIX MINIMUM over the x-ordering: a row survives iff
  *   (a) `y <  min y over all rows with strictly smaller x`, and
  *   (b) `y = min y over rows with equal x`.
  * (a) kills cross-x dominance, (b) kills within-x dominance, and rows
  * tied on (x, y) all satisfy both — exactly the dominance definition.
  *
  * A single `orderBy(x)` window would serialize the corpus through one
  * partition, so the prefix min is computed in the bucketed two-level
  * shape (the [[graft.ext.Packing]] running-sum pattern): x is range-
  * bucketed by `x div bucketWidth`; the per-bucket strict-prefix min is a
  * window inside each bucket (range frame to `x − 1`); the cross-bucket
  * carry-in is a prefix min over the BUCKET-level min relation — one row
  * per non-empty bucket, value-domain-bounded, so its global window is
  * O(buckets) regardless of corpus size — broadcast-joined back. Every
  * corpus-sized shuffle keys on the bucket; nothing is quadratic.
  *
  * Both dimensions must be integral (cast money to cents first): the
  * strict-before window frame is `rangeBetween(unboundedPreceding, -1)`,
  * exact only on integers, and integer comparisons give both engines the
  * identical skyline with no float boundary.
  */
object Skyline {

  /** Skyline rows of `df` under (minimize `xCol`, minimize `yCol`); output
    * keeps the input columns. `bucketWidth` is the x-range per bucket —
    * size it so the x value domain spans enough buckets to spread load
    * (buckets ≈ domain / width).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val clash = df.columns.toSet
      .intersect(Set("__b", "__pre_b", "__pre_x", "__min_eq", "__carry"))
    require(clash.isEmpty,
      s"skyline2D reserved column names present in input: ${clash.mkString(", ")}")
    val x = col(xCol)
    val y = col(yCol)
    val bucketed = df.withColumn("__b", expr(s"$xCol div $bucketWidth"))
    // one row per non-empty bucket: its full min(y); prefix-min of the
    // PREVIOUS buckets is the carry-in (strictness is free — earlier
    // bucket ⇒ strictly smaller x)
    val carry = bucketed.groupBy("__b").agg(min(y).as("__bm"))
      .withColumn("__carry",
        // keyspace-sized window: input is collapsed/bounded before this sort
        min(col("__bm")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__carry"))
    val strictBefore = Window.partitionBy(col("__b")).orderBy(x)
      .rangeBetween(Window.unboundedPreceding, -1)
    val eqX = Window.partitionBy(col("__b"), x)
    bucketed
      .withColumn("__pre_x", min(y).over(strictBefore))
      .withColumn("__min_eq", min(y).over(eqX))
      .join(broadcast(carry), Seq("__b"))
      .withColumn("__pre_b", least(col("__pre_x"), col("__carry")))
      .filter((col("__pre_b").isNull || y < col("__pre_b")) &&
        y === col("__min_eq"))
      .drop("__b", "__pre_x", "__min_eq", "__carry", "__pre_b")
  }
}
