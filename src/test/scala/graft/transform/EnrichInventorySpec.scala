package graft.transform

import java.sql.Date
import org.apache.spark.sql.Row
import graft.SparkSpec

class EnrichInventorySpec extends SparkSpec {

  val runDate: Date = Date.valueOf("2024-06-01")

  test("decrement: sold qty subtracted; skus with no sales keep full stock (J2+F13+F14)") {
    val stock = df("sku STRING, qty DOUBLE, subcategory STRING, color STRING, brand STRING", Seq(
      Row("a", 100.0, "towels", "red", "b1"), Row("b", 50.0, "soap", "blue", "b2")))
    val sold = df("sku STRING, qty DOUBLE", Seq(Row("a", 30.0)))
    val out = Inventory.decrement(stock, sold)
    assert(out.columns.toSeq == Seq("sku", "qty", "subcategory", "color", "brand"))
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("a" -> 70.0, "b" -> 50.0)) // fillna(0) path for b
  }

  test("enrichSales: left join on trimmed keys, date parts, null-propagating total (J3+F7-F12)") {
    val sales = df("sku STRING, qty DOUBLE, site STRING", Seq(
      Row(" a ", 2.0, "s1"), Row("missing", 3.0, "s2")))
    val map = df("SKU STRING, cost DOUBLE, brand STRING", Seq(Row("a", 5.0, "b1")))
    val out = Enrich.enrichSales(sales, map, runDate)
    assert(out.columns.toSeq == Seq("sku", "qty", "site", "cost", "brand", "date", "Year", "Month", "total"))
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getDouble(8) == 10.0)      // total = qty*cost
    assert(rows("missing").get(8) == null)      // unmatched → null cost → null total
    assert(rows("a").getInt(6) == 2024 && rows("a").getString(7) == "June")
  }

  test("splitByBrand implements the intended semantics of the reference's mask bug (§7.4-h)") {
    val d = df("sku STRING, brand STRING", Seq(
      Row("a", "b1"), Row("b", "b2"), Row("c", "b3"), Row("d", null)))
    val (p, o) = Enrich.splitByBrand(d, "b1", Seq("b2", "b3"))
    assert(rowSet(p) == rows(Seq("a", "b1")))
    assert(rowSet(o) == rows(Seq("b", "b2"), Seq("c", "b3"))) // null brand in neither
  }

  test("enrichSales broadcast-joins (no shuffle on fact side)") {
    val sales = df("sku STRING, qty DOUBLE, site STRING", Seq(Row("a", 1.0, "s")))
    val map = df("SKU STRING, cost DOUBLE, brand STRING", Seq(Row("a", 1.0, "b")))
    val plan = Enrich.enrichSales(sales, map, runDate).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }
}
