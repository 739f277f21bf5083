package graft

/** Mirrors the driver's t1 smoke: the flagship query returns rows. */
class EntrySpec extends SparkSpec {
  test("entry() yields >0 rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has oracle SQL (no rows-only waivers remain)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracle without query: $stale")
  }

  test("every registered query emits a harness-safe (scalar-only) schema") {
    // The driver's oracle canonicalizer sorts rows on all columns in
    // pandas before hashing; a top-level ARRAY/MAP/STRUCT column throws
    // `unhashable type` there and the query silently becomes
    // unverifiable (round-4 q144/q148). Analysis only — no jobs run for
    // lazy plans; driver-held-state ops (k-means training) do their
    // small sf0.001 work once.
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { Verify.assertHarnessSafe(name, fn(spark, dir).schema); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q227 file profile: one row per physical file, footer-true counts") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q227_file_profile")(spark, dir).collect()
    assert(rows.length == Tables.names.length) // single-file tables here
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    val lineitemRows = rows.find(_.getString(0) == "lineitem").get.getLong(2)
    assert(lineitemRows ==
      spark.read.parquet(s"$dir/lineitem.parquet").count())
  }

  test("q228 small-order gate: strict integer cross-multiply, non-trivial survivor set") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q228_small_order_revenue")(spark, dir).collect()
    val nSmall = out.map(_.getLong(1)).sum
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(nSmall > 0 && nSmall < total,
      s"gate must keep a strict subset: $nSmall of $total")
  }

  test("assertHarnessSafe rejects array-typed top-level columns") {
    val arrDf = spark.sql("SELECT 1 AS id, array(1, 2) AS xs")
    val e = intercept[IllegalArgumentException] {
      Verify.assertHarnessSafe("probe", arrDf.schema)
    }
    assert(e.getMessage.contains("xs"))
    Verify.assertHarnessSafe("probe",
      spark.sql("SELECT 1 AS id, 'a' AS s, DATE '2026-01-01' AS d").schema)
  }

  test("assertHarnessSafe rejects decimal-typed top-level columns (q228 class)") {
    // Spark parquet DECIMAL reaches the driver's canonicalizer as
    // decimal.Decimal("10.20"); DuckDB DECIMAL becomes float64 "10.2" —
    // trailing-zero cents hash differently even when values agree.
    val decDf = spark.sql("SELECT 1 AS id, CAST(10.2 AS DECIMAL(18,2)) AS rev")
    val e = intercept[IllegalArgumentException] {
      Verify.assertHarnessSafe("probe", decDf.schema)
    }
    assert(e.getMessage.contains("rev"))
    // the sanctioned boundary shape passes
    Verify.assertHarnessSafe("probe",
      spark.sql("SELECT CAST(CAST(10.2 AS DECIMAL(18,2)) AS DOUBLE) AS rev").schema)
  }
}
