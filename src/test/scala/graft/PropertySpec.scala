package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.transform.{Aggregate, Inventory}

/** Property-based invariants (SURVEY.md §5.2-4) over generated SKU worlds.
  * Uses scalacheck generators with fixed seeds (deterministic CI) sampled
  * manually — the scalatest+scalacheck bridge artifact isn't a dependency.
  */
class PropertySpec extends SparkSpec {

  private val skuGen = Gen.oneOf((1 to 20).map(i => s"sku$i"))
  private val rowsGen = Gen.listOfN(60,
    Gen.zip(skuGen, Gen.choose(0, 50)).map { case (s, q) => (s, q.toDouble) })

  private def samples(n: Int): Seq[List[(String, Double)]] =
    (1 to n).map(i => rowsGen.apply(Gen.Parameters.default, Seed(42L + i)).get)

  test("retailAgg conserves total qty for arbitrary inputs (A1)") {
    samples(5).foreach { rows =>
      val d = df("sku STRING, qty DOUBLE, site STRING",
        rows.map { case (s, q) => Row(s, q, "x") })
      val agg = Aggregate.retailAgg(d)
      val total = agg.agg(sum("qty")).collect()(0).getDouble(0)
      assert(total == rows.map(_._2).sum)
      assert(agg.count() == rows.map(_._1).distinct.size)
    }
  }

  test("inventory decrement: new_qty = stock − sold for every sku (J2+F13)") {
    samples(5).foreach { rows =>
      val stockRows = rows.map(_._1).distinct.map(s => (s, 1000.0))
      val stock = df("sku STRING, qty DOUBLE, subcategory STRING, color STRING, brand STRING",
        stockRows.map { case (s, q) => Row(s, q, "c", "col", "b") })
      val sold = Aggregate.retailAgg(
        df("sku STRING, qty DOUBLE, site STRING", rows.map { case (s, q) => Row(s, q, "x") }))
      val out = Inventory.decrement(stock, sold).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val soldBySku = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      stockRows.foreach { case (s, q) =>
        assert(out(s) == q - soldBySku.getOrElse(s, 0.0))
      }
    }
  }

  test("wholesale mapping conserves qty×multiplier (J1+A2)") {
    samples(5).foreach { rows =>
      val sold = Aggregate.retailAgg(
        df("sku STRING, qty DOUBLE, site STRING", rows.map { case (s, q) => Row(s, q, "x") }))
      val mapping = df("sku_part STRING, sku_name STRING, multiplier DOUBLE",
        (1 to 20).map(i => Row(s"sku$i", s"w${i % 5}", (i % 3 + 1).toDouble)))
      val total = Aggregate.wholesaleAgg(sold, mapping)
        .agg(sum("qty")).collect()(0).getDouble(0)
      val expected = rows.map { case (s, q) =>
        val i = s.drop(3).toInt; q * (i % 3 + 1)
      }.sum
      assert(total == expected)
    }
  }
}
