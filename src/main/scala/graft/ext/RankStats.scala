package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact rank statistics — the nonparametric correlation/effect-size
  * readouts an eval pipeline wants when the underlying scales are
  * arbitrary (prices, counts, scores): monotone-invariant, integer-exact,
  * no distributional assumptions.
  */
object RankStats {

  /** Spearman rank correlation (Spearman 1904, public literature) of two
    * columns over a keyed relation, EXACT: both columns are ranked by
    * `row_number` with the key as the deterministic tie-break (the
    * rank-of-record convention — documented, layout-invariant), then
    * ρ = 1 − 6Σd²/(n(n²−1)) evaluated as one integer rational in ppm
    * via DECIMAL(38,0) (Σd² alone can pass 2⁶³ at n ≳ 2·10⁶).
    *
    * Scale shape: the input is expected keyspace-sized (an entity
    * relation — parts, users, domains); two rank windows over it and a
    * 2-moment aggregate. Facts never enter — aggregate them to the
    * entity grain first.
    */
  def spearman(df: DataFrame, keyCol: String, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null x/y rows are EXCLUDED (they carry no rank information);
    // without the filter row_number would rank nulls first and silently
    // shift every rho
    val base = df.select(col(keyCol).as("k"), xCol.as("x"), yCol.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val ranked = base
      // keyspace-sized window: input is collapsed/bounded before this sort
      .withColumn("rx", row_number().over(Window.orderBy(col("x"), col("k"))))
      // keyspace-sized window: input is collapsed/bounded before this sort
      .withColumn("ry", row_number().over(Window.orderBy(col("y"), col("k"))))
    ranked
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST((rx - ry) AS DECIMAL(38,0)) * (rx - ry))").as("s"))
      .select(col("n").as("n_rows"),
        expr("CAST(s AS BIGINT)").as("sum_d2"),
        expr("CASE WHEN n < 2 THEN NULL ELSE" +
          " (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1) - 6 * s)" +
          " * 1000000 div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))" +
          " END").as("spearman_ppm"))
  }

  /** Mann–Whitney rank-sum effect (Mann & Whitney 1947, public
    * literature) between two groups — the AUC reading: `auc_ppm` =
    * P(a > b) + ½P(a = b) for a random pair drawn across groups, the
    * common-language effect size and exactly the ROC-AUC of "predict A
    * when the value is larger". EXACT via the by-value collapse: one
    * (value → per-group counts) aggregate, one running-sum window over
    * DISTINCT values, then Σ cntA·cumB pair-counting — never the n_a·n_b
    * pair materialization. `u2` = 2U (twice the U statistic) stays
    * integer under ties.
    *
    * Scale shape: facts reduce to the distinct-value keyspace in one
    * map-combined aggregate; the window sorts distinct values only.
    */
  /** Two-sample Kolmogorov–Smirnov statistic (Kolmogorov 1933 /
    * Smirnov 1939, public literature), EXACT: D = max over observed
    * values of |F_a(v) − F_b(v)|, evaluated as the integer cross-product
    * |cumA·n_b − cumB·n_a| so no division happens before the final ppm
    * readout. Also emits `at_value` — the smallest value attaining the
    * maximum gap (deterministic tie-break), which is where the two
    * distributions diverge most: the natural split point for a drift
    * investigation.
    *
    * Scale shape: one by-value map-combined aggregate, one running-sum
    * window over DISTINCT values, one max aggregate.
    */
  def ksStatistic(df: DataFrame, grpCol: Column, aValue: String,
                  valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null values are EXCLUDED: a null bucket in the by-value collapse
    // would silently shift D; null-group rows count as group B by the
    // === convention, which the filter below makes irrelevant for v
    val byValue = df
      .select(when(grpCol === aValue, lit(1L)).otherwise(lit(0L)).as("isA"),
        valueCol.as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(sum("isA").as("ca"), sum(expr("1 - isA")).as("cb"))
    // keyspace-sized window: input is collapsed/bounded before this sort
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue
      .select(col("v"), sum("ca").over(w).as("cum_a"),
        sum("cb").over(w).as("cum_b"))
      .localCheckpoint(true) // feeds totals, the max, and the argmax
    val tot = cum.agg(max("cum_a").as("n_a"), max("cum_b").as("n_b"))
    val gaps = cum.crossJoin(broadcast(tot))
      .select(col("v"), col("n_a"), col("n_b"),
        expr("abs(CAST(cum_a AS DECIMAL(38,0)) * n_b" +
          " - CAST(cum_b AS DECIMAL(38,0)) * n_a)").as("d"))
    val dmax = gaps.agg(max("d").as("dmax"))
    gaps.crossJoin(broadcast(dmax))
      .filter(col("d") === col("dmax"))
      .groupBy("n_a", "n_b")
      .agg(min("v").as("at_value"), max("d").as("d"))
      .select(col("n_a"), col("n_b"), col("at_value"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE" +
          " d * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) END").as("ks_ppm"))
  }

  def rankSumAuc(df: DataFrame, grpCol: Column, aValue: String,
                 valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same null convention as [[ksStatistic]]: null values excluded
    val byValue = df
      .select(when(grpCol === aValue, lit(1L)).otherwise(lit(0L)).as("isA"),
        valueCol.as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v")
      .agg(sum("isA").as("ca"), sum(expr("1 - isA")).as("cb"))
    // keyspace-sized window: input is collapsed/bounded before this sort
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue
      .withColumn("cum_b_lt", sum("cb").over(w) - col("cb"))
    cum
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        expr("sum(CAST(ca AS DECIMAL(38,0)) * cum_b_lt)").as("gt"),
        expr("sum(CAST(ca AS DECIMAL(38,0)) * cb)").as("eq"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(2 * gt + eq AS BIGINT)").as("u2"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE" +
          " (2 * gt + eq) * 1000000 div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b)" +
          " END").as("auc_ppm"))
  }
}
