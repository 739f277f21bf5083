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

  /** Cohen's kappa (Cohen 1960, public literature): chance-corrected
    * agreement between two categorical raters/arms over a paired
    * relation. With A = Σ agreement, n = Σ pairs and P = Σ_c r_c·c_c
    * (row × column marginal products), κ = (A/n − P/n²)/(1 − P/n²) =
    * (A·n − P)/(n² − P) — ONE integer rational, emitted in ppm. All
    * arithmetic in DECIMAL(38,0): n² and the marginal products pass 2⁶³
    * at n ≳ 3·10⁹ pairs (the q330/trendFit envelope policy). Degenerate
    * case n² = P (both raters constant) → NULL, the standard convention.
    * Toward-zero `div` matches the oracle's sign-split form (κ < 0 =
    * worse-than-chance agreement is a real outcome).
    *
    * Scale shape: one (a, b) confusion aggregate over the pair relation
    * (fact-sized input, labels²-sized output), then marginals and the
    * final rational over the labels² keyspace. Nothing pairwise.
    */
  def cohenKappa(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val conf = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("ca"), col(bCol).as("cb"))
      .agg(count(lit(1)).as("m"))
    val totals = conf.agg(sum("m").as("n"),
      sum(when(col("ca") === col("cb"), col("m")).otherwise(lit(0L))).as("agree"))
    val pe = conf.groupBy("ca").agg(sum("m").as("ra"))
      .join(conf.groupBy("cb").agg(sum("m").as("cc")),
        col("ca") === col("cb"))
      .agg(expr("sum(CAST(ra AS DECIMAL(38,0)) * cc)").as("p"))
    totals.crossJoin(pe)
      .select(col("n"), col("agree"),
        expr("CAST(agree AS DECIMAL(38,0)) * 1000000 div n").as("po_ppm"),
        expr("CAST(p * 1000000 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("pe_ppm"),
        expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n = p THEN NULL ELSE" +
          " CAST((CAST(agree AS DECIMAL(38,0)) * n - p) * 1000000" +
          " div (CAST(n AS DECIMAL(38,0)) * n - p) AS BIGINT) END")
          .as("kappa_ppm"))
      .select(col("n"), col("agree"),
        expr("CAST(po_ppm AS BIGINT)").as("po_ppm"), col("pe_ppm"),
        col("kappa_ppm"))
  }

  /** McNemar's test (McNemar 1947, public literature) for comparing two
    * classifiers on the SAME examples: only the discordant pairs carry
    * information — b = A-right/B-wrong, c = A-wrong/B-right — and the
    * statistic is χ² = (b − c)²/(b + c) (no continuity correction; the
    * exact-form convention), emitted in ppm. b + c = 0 (the classifiers
    * never disagree) → NULL. One map-combined 4-way conditional count
    * over the paired relation — a single fact pass, 1-row output.
    */
  def mcnemar(pairs: DataFrame, aCol: String, bCol: String,
              truthCol: String): DataFrame = {
    val flagged = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && col(truthCol).isNotNull)
      .select(
        when(col(aCol) === col(truthCol), 1L).otherwise(0L).as("oka"),
        when(col(bCol) === col(truthCol), 1L).otherwise(0L).as("okb"))
    flagged.agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN oka = 1 AND okb = 0 THEN 1 ELSE 0 END")).as("n_a_only"),
        sum(expr("CASE WHEN oka = 0 AND okb = 1 THEN 1 ELSE 0 END")).as("n_b_only"))
      .select(col("n"), col("n_a_only"), col("n_b_only"),
        expr("CASE WHEN n_a_only + n_b_only = 0 THEN NULL ELSE" +
          " CAST(CAST(n_a_only - n_b_only AS DECIMAL(38,0))" +
          " * (n_a_only - n_b_only) * 1000000" +
          " div (n_a_only + n_b_only) AS BIGINT) END").as("chi2_ppm"))
  }
}
