package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Survival analysis over durations with right-censoring — the
  * time-to-event readouts (repeat purchase, churn, first conversion) a
  * lifecycle dashboard plots.
  */
object Survival {

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier, JASA 1958 —
    * public literature), EXACT under the engine's scaled-floor
    * convention: survival starts at 10⁶ and steps
    * S ← S·(n−d) div n at each distinct duration (events at t count
    * before censorings at t leave the risk set — the standard
    * convention; censor-only steps multiply by n/n and are exact
    * no-ops). The recursion is inherently sequential, so it runs
    * driver-side over the COLLECTED by-duration table — duration
    * keyspace, never facts (the kmeans-centroid precedent); the oracle
    * replays it as a recursive CTE with the identical floor.
    *
    * Input: `durations` with columns `(t BIGINT, event INT)` — one row
    * per subject, `event` 1 if observed at `t`, 0 if censored at `t`.
    * Output: one row per distinct t:
    * `(t, n_risk, d_events, c_censored, s_ppm)`.
    *
    * Scale shape: one map-combined by-duration aggregate over subjects;
    * the driver loop and the output are duration-keyspace-sized.
    */
  def kaplanMeier(durations: DataFrame): DataFrame = {
    val spark = durations.sparkSession
    val byT = durations
      .groupBy(col("t").cast("long").as("t"))
      .agg(sum(when(col("event") === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col("event") === 1, 0L).otherwise(1L)).as("c"))
      .orderBy("t")
      .collect() // duration-keyspace-sized by contract
    var n = BigInt(byT.map(r => r.getLong(1) + r.getLong(2)).sum)
    var s = BigInt(1000000)
    val out = byT.map { r =>
      val (t, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val nRisk = n
      s = s * (n - d) / n
      n -= (d + c)
      Row(t, nRisk.toLong, d, c, s.toLong)
    }
    val schema = StructType(Seq(
      StructField("t", LongType), StructField("n_risk", LongType),
      StructField("d_events", LongType), StructField("c_censored", LongType),
      StructField("s_ppm", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** Repeat-purchase durations from an orders relation: per customer,
    * the days from the FIRST order to the SECOND (event = 1), or to the
    * global horizon (last order date in the corpus) for one-time buyers
    * (event = 0, right-censored). Order-date ties break on the order
    * key — deterministic, mirrored by the oracle.
    */
  def repeatPurchaseDurations(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val firstTwo = orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("o_custkey")
      .agg(max(when(col("rn") === 1, col("o_orderdate"))).as("first_d"),
        max(when(col("rn") === 2, col("o_orderdate"))).as("second_d"))
    val horizon = orders.agg(max("o_orderdate").as("horizon"))
    firstTwo.crossJoin(broadcast(horizon))
      .select(
        when(col("second_d").isNotNull,
          datediff(col("second_d"), col("first_d")))
          .otherwise(datediff(col("horizon"), col("first_d")))
          .cast("long").as("t"),
        when(col("second_d").isNotNull, lit(1)).otherwise(lit(0)).as("event"))
  }
}
