package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {

  private val payloads = df("id BIGINT, payload STRING", Seq(
    Row(1L, """{"order":{"key":10,"status":"O","priority":"1-URGENT"},"lines":[{"c":7},{"c":3}]}"""),
    Row(2L, """{"order":{"key":20,"status":"F","priority":"2-HIGH"},"lines":[{"c":5}]}"""),
    Row(3L, """{"order":{"key":30,"status":"O","priority":"1-URGENT"}}"""),
    Row(4L, """not json at all""")))

  test("parseVariant: valid JSON parses, invalid is NULL (not an error)") {
    val v = SemiStructured.parseVariant(payloads, "payload")
    assert(v.filter(col("v").isNull).select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(v.filter(col("v").isNotNull).count() == 3)
  }

  test("getPath: nested object, array index, and missing paths extract typed or NULL") {
    val v = SemiStructured.parseVariant(payloads, "payload")
      .select(col("id"),
        SemiStructured.getPath(col("v"), "$.order.key", "bigint").as("okey"),
        SemiStructured.getPath(col("v"), "$.order.status", "string").as("status"),
        SemiStructured.getPath(col("v"), "$.lines[1].c", "bigint").as("line1"),
        SemiStructured.getPath(col("v"), "$.nope", "bigint").as("nope"))
    assert(rowSet(v) == rows(
      Seq("1", "10", "O", "3", "null"),
      Seq("2", "20", "F", "null", "null"),
      Seq("3", "30", "O", "null", "null"),
      Seq("4", "null", "null", "null", "null")))
  }

  test("orderPayloadStats: per-shape aggregate with drift (missing-path) count") {
    val out = SemiStructured.orderPayloadStats(payloads)
    // invalid-JSON row groups under (null, null); n_missing is 0 everywhere
    assert(rowSet(out) == rows(
      Seq("O", "1-URGENT", "2", "7", "3", "10", "30", "0"),
      Seq("F", "2-HIGH", "1", "5", "null", "20", "20", "0"),
      Seq("null", "null", "1", "null", "null", "null", "null", "0")))
  }

  test("schema_of_variant_agg: the corpus-level shape report VARIANT enables") {
    val v = SemiStructured.parseVariant(payloads.filter(col("id") =!= 4L), "payload")
    val schema = v.select(schema_of_variant_agg(col("v"))).head().getString(0)
    // merged across rows: lines is nullable (row 3 lacks it), keys unioned
    assert(schema.contains("order"))
    assert(schema.contains("lines"))
    assert(schema.toUpperCase.contains("ARRAY"))
  }
}
