package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class ObserveSpec extends SparkSpec {

  test("audited: CollectMetrics piggybacks counts/nulls/sum on the caller's own action") {
    val d = df("sku STRING, qty DOUBLE, site STRING", Seq(
      Row("a", 1.25, "s1"),
      Row("b", 2.50, null),
      Row("c", null, "s2")))
    val (out, obs) = Profile.audited(d, "stage_audit", "qty", Seq("sku", "site"))
    // the audit must not change the data flowing through
    assert(out.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("sum_cents") == 375L)            // 125 + 250; null qty skipped
    assert(m("nonnull_sku") == 3L)
    assert(m("nonnull_site") == 2L)
  }
}
