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
}
