package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-less semi-structured ingestion on Spark 4's VARIANT type.
  *
  * The reference's whole input world is JSON payloads whose shape drifts
  * per marketplace (portfolio-etl.py:119, :244, :318 — each connector
  * hand-walks a different nesting). q72 covers the DECLARED-schema path
  * (`from_json` with an explicit StructType); this module is the
  * schema-ON-READ path for payloads whose shape is not known at pipeline
  * compile time: `parse_json` once into a VARIANT column (a compact binary
  * encoding, parsed once, stored/shuffled as bytes), then `variant_get`
  * typed path extraction at use sites.
  *
  * 100 TB shape: parse + extraction are per-row codegen'd expressions —
  * zero shuffle, no schema-inference job over the corpus (an
  * `inferSchema` pass at this scale is a full extra read), and unlike a
  * string column each payload is parsed ONCE no matter how many fields
  * are later extracted. Missing paths surface as NULL (count them — drift
  * telemetry for free) instead of failing the batch, so one marketplace
  * adding a field never breaks the other nine's extraction.
  */
object SemiStructured {

  /** Parse a JSON string column to VARIANT (invalid documents → NULL via
    * `try_parse_json`, counted downstream rather than killing the batch).
    */
  def parseVariant(df: DataFrame, jsonCol: String, out: String = "v"): DataFrame =
    df.withColumn(out, try_parse_json(col(jsonCol)))

  /** Typed path extraction: `variant_get` with an SQL type; absent paths
    * and type mismatches are NULL (`try_variant_get`).
    */
  def getPath(v: Column, path: String, sqlType: String): Column =
    try_variant_get(v, path, sqlType)

  /** Per-shape corpus report over a VARIANT payload column: one row per
    * (status, priority) with row counts, line sums from an ARRAY path,
    * key ranges from a NESTED-object path, and a missing-path count (the
    * drift signal). Everything downstream of `parse_json` is plain typed
    * aggregation — the VARIANT column itself never reaches the shuffle.
    */
  def orderPayloadStats(payloads: DataFrame, jsonCol: String = "payload"): DataFrame = {
    val x = parseVariant(payloads, jsonCol)
      .select(
        getPath(col("v"), "$.order.key", "bigint").as("okey"),
        getPath(col("v"), "$.order.status", "string").as("status"),
        getPath(col("v"), "$.order.priority", "string").as("priority"),
        getPath(col("v"), "$.lines[0].c", "bigint").as("line0"),
        getPath(col("v"), "$.lines[1].c", "bigint").as("line1"),
        getPath(col("v"), "$.not.there", "bigint").as("missing"))
    x.groupBy("status", "priority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("line0")).as("sum_line0"),
        sum(col("line1")).as("sum_line1"),
        min(col("okey")).as("min_key"),
        max(col("okey")).as("max_key"),
        count(col("missing")).as("n_missing"))
  }
}
