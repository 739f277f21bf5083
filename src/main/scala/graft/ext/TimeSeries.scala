package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series shaping over event streams — the resample/regularize step a
  * metrics or training-data pipeline runs before windowed models: an event
  * table is sparse in time (hours with no events simply have no rows), but
  * downstream consumers (rate alerting, seasonality models, per-hour
  * training shards) need a DENSE grid with explicit zeros.
  *
  * Scale design: the fact table is touched exactly twice, both times as a
  * full-scan aggregate (the per-(key, hour) counts and the 2-row global
  * bound) — the dense grid itself is built from the AGGREGATES, never by
  * expanding fact rows. Grid size is keys × hours (a year is 8.8k hours;
  * even 10⁶ keys is a ~10¹⁰-row logical grid that stays a cheap
  * broadcast-able cross of two tiny relations until the final left join,
  * which shuffles on the same (key, hour) key the count agg already
  * produced).
  */
object TimeSeries {

  /** Dense per-key hourly event counts over the corpus's global
    * [min, max] hour span, gaps explicit as `n_events = 0`.
    *
    * Output: (`keyCol`, hour timestamp, n_events long).
    *
    * The hour spine comes from `sequence(h0, h1, 1 hour)` on the 1-row
    * bounds aggregate — one array, exploded; fine up to decades of hours
    * (Spark caps sequences at ~2³¹ elements long before memory does).
    */
  def gapFillHourly(events: DataFrame, tsCol: String = "ts",
                    keyCol: String = "event_type"): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    grid(events, tsCol, keyCol)
      .join(hourly, Seq(keyCol, "hour"), "left")
      .na.fill(0, Seq("n_events"))
  }

  /** Dense keys × hours frame from two tiny aggregates (distinct keys,
    * exploded global hour spine) — broadcast material, never fact rows.
    */
  private def grid(events: DataFrame, tsCol: String, keyCol: String): DataFrame = {
    val bounds = events.agg(
      date_trunc("hour", min(col(tsCol))).as("h0"),
      date_trunc("hour", max(col(tsCol))).as("h1"))
    val hours = bounds.select(
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    events.select(col(keyCol)).distinct().crossJoin(hours)
  }

  /** Forward fill (last observation carried forward) on the dense hourly
    * grid: per key and hour, the max of `valueCol` observed that hour
    * (`v`, NULL on gap hours) and the last non-null observation at or
    * before it (`v_ff`, NULL only before a key's first observation) — the
    * resample→ffill step that turns sparse sensor/price events into a
    * regular series. `max` per hour keeps the pre-fill aggregate
    * order-independent (bit-exact in any engine, unlike a float sum); the
    * fill itself is one `last(ignoreNulls)` running window per key over
    * the ALREADY-AGGREGATED grid — O(keys × hours) rows, partitioned by
    * key, so the window never sees fact rows and never single-threads.
    */
  def forwardFillHourly(events: DataFrame, tsCol: String = "ts",
                        keyCol: String = "event_type",
                        valueCol: String = "value"): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(max(col(valueCol)).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid(events, tsCol, keyCol)
      .join(hourly, Seq(keyCol, "hour"), "left")
      .withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
  }
}
