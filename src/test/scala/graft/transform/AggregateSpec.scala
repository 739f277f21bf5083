package graft.transform

import org.apache.spark.sql.Row
import graft.SparkSpec

class AggregateSpec extends SparkSpec {

  test("retailAgg sums qty per sku and conserves mass (A1)") {
    val sales = df("sku STRING, qty DOUBLE, site STRING", Seq(
      Row("a", 2.0, "s1"), Row("a", 3.0, "s2"), Row("b", 1.0, "s1")))
    val out = Aggregate.retailAgg(sales).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 5.0, "b" -> 1.0))
  }

  test("wholesaleAgg: right join keeps unmapped mapping rows; all-null group sums to 0.0 (§7.4-a)") {
    val sold = df("sku STRING, qty DOUBLE", Seq(Row("set1", 4.0)))
    val map = df("sku_part STRING, sku_name STRING, multiplier DOUBLE", Seq(
      Row("set1", "towel", 3.0),   // towel set: 1 set = 3 towels (README.md:22-24)
      Row("set1", "soap", 1.0),
      Row("ghost", "never-sold", 2.0))) // unmatched mapping row
    val out = Aggregate.wholesaleAgg(sold, map).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("towel" -> 12.0, "soap" -> 4.0, "never-sold" -> 0.0))
  }

  test("wholesaleAgg conserves qty×multiplier mass over mapped rows (§5.4 invariant)") {
    val sold = df("sku STRING, qty DOUBLE", (1 to 50).map(i => Row(s"r$i", i.toDouble)))
    val map = df("sku_part STRING, sku_name STRING, multiplier DOUBLE",
      (1 to 50).map(i => Row(s"r$i", s"w${i % 7}", 2.0)))
    val total = Aggregate.wholesaleAgg(sold, map)
      .agg(org.apache.spark.sql.functions.sum("qty")).collect()(0).getDouble(0)
    assert(total == (1 to 50).map(_ * 2.0).sum)
  }

  test("brandAgg groups by (sku, cost) and computes total = cost × Σqty (A3)") {
    val enr = df("sku STRING, cost DOUBLE, qty DOUBLE", Seq(
      Row("a", 10.0, 2.0), Row("a", 10.0, 3.0), Row("a", 12.0, 1.0)))
    val out = Aggregate.brandAgg(enr).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out == Map(("a", 10.0) -> (5.0, 50.0), ("a", 12.0) -> (1.0, 12.0)))
  }
}
