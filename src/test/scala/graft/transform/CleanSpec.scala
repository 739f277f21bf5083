package graft.transform

import org.apache.spark.sql.Row
import graft.SparkSpec

class CleanSpec extends SparkSpec {

  test("unionAll aligns by name and null-fills missing columns (U2)") {
    val a = df("sku STRING, qty DOUBLE, site STRING", Seq(Row("a1", 2.0, "walmart")))
    val b = df("qty DOUBLE, sku STRING", Seq(Row(3.0, "b2"))) // shuffled order, no site
    val u = Clean.unionAll(Seq(a, b))
    assert(u.columns.toSeq == Seq("sku", "qty", "site"))
    assert(rowSet(u) == rows(Seq("a1", "2.0", "walmart"), Seq("b2", "3.0", "null")))
  }

  test("dropJunkRows removes header echoes, sentinels, and null skus (P6, §7.4-f)") {
    val d = df("sku STRING, qty DOUBLE", Seq(
      Row("a1", 1.0), Row("sku", 2.0), Row("VendorSKU123", 2.0),
      Row("other", 0.0), Row("OTHER", 0.0), Row(null, 5.0)))
    // null sku: null.contains → null → filter drops (matches pandas NaN path)
    assert(rowSet(Clean.dropJunkRows(d)) == rows(Seq("a1", "1.0")))
  }

  test("normalize lowercases/stringifies every column and trims sku (F1-F2)") {
    val d = df("sku STRING, qty DOUBLE, site STRING", Seq(Row("  AB-1 ", 2.0, "WalMart")))
    val n = Clean.normalize(d)
    assert(rowSet(n) == rows(Seq("ab-1", "2.0", "walmart")))
    assert(n.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("qty survives the stringify→coerce round-trip; garbage coerces to null (§7.4-e/g)") {
    val d = df("sku STRING, qty STRING, site STRING", Seq(
      Row("a", "7", "s"), Row("b", "2.5", "s"), Row("c", "NaN", "s"), Row("d", "junk", "s")))
    val out = Clean.cleanSales(Seq(d)).collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(out("a") == 7.0 && out("b") == 2.5)
    assert(out("d") == null)                      // unparseable → null, like to_numeric(coerce)
    assert(out("c").asInstanceOf[Double].isNaN)   // "nan" parses to NaN in both engines
  }

  test("cleanSales conserves parseable qty mass (invariant §5.4)") {
    val frames = (1 to 3).map(i => df("sku STRING, qty DOUBLE, site STRING",
      (1 to 10).map(j => Row(s"s$i$j", j.toDouble, s"site$i"))))
    val total = Clean.cleanSales(frames).agg(org.apache.spark.sql.functions.sum("qty"))
      .collect()(0).getDouble(0)
    assert(total == 3 * 55.0)
  }
}
