package graft.extract

import java.sql.Timestamp
import graft.{Fixtures, SparkSpec}

/** Pins the committed payload fixtures (fixtures/payloads/) that back the
  * q31-q37 CORRECTNESS rows: the same files the DuckDB read_json oracles
  * flatten, asserted here at the spec level so a fixture or reader drift
  * fails `sbt test` before it fails the driver gate.
  */
class FixtureFlattenSpec extends SparkSpec {

  private val fx = Fixtures.dir
  private val from = Timestamp.valueOf("2024-05-01 00:00:00")
  private val to = Timestamp.valueOf("2024-06-01 00:00:00")

  test("walmart fixture: dirty amount nulls, null sku survives (q31)") {
    assert(rowSet(Payloads.walmart(spark, s"$fx/walmart.json")) == rows(
      Seq("W-100", "2.0", "walmart"), Seq("W-101", "1.0", "walmart"),
      Seq("W-102", "3.0", "walmart"), Seq("W-103", "null", "walmart"),
      Seq("null", "5.0", "walmart")))
  }

  test("houzz fixture: multi- and single-item orders (q32)") {
    assert(rowSet(Payloads.houzz(spark, s"$fx/houzz.xml")) == rows(
      Seq("HZ-1", "2.0", "houzz"), Seq("HZ-2", "1.0", "houzz"),
      Seq("HZ-3", "5.0", "houzz")))
  }

  test("faire fixture: missing quantity key nulls, not drops (q33)") {
    assert(rowSet(Payloads.faire(spark, s"$fx/faire.json")) == rows(
      Seq("F-1", "3.0", "faire"), Seq("F-2", "null", "faire"),
      Seq("F-3", "7.0", "faire")))
  }

  test("woocommerce fixture: out-of-window order excluded (q34)") {
    assert(rowSet(Payloads.wooCommerce(spark, s"$fx/woocommerce.json",
      "woo_site1", from, to)) == rows(
      Seq("WC-1", "2.0", "woo_site1"), Seq("WC-2", "1.0", "woo_site1"),
      Seq("WC-3", "4.0", "woo_site1")))
  }

  test("dsco fixtures: tenant union + per-order window (q35)") {
    val df = Payloads.dsco(spark, s"$fx/dsco_t1.json", "dsco_t1", from, to)
      .unionByName(Payloads.dsco(spark, s"$fx/dsco_t2.json", "dsco_t2", from, to))
    assert(rowSet(df) == rows(
      Seq("DS-1", "2.0", "dsco_t1"), Seq("DS-2", "1.0", "dsco_t1"),
      Seq("DS-3", "6.0", "dsco_t1"), Seq("DS-21", "4.0", "dsco_t2"),
      Seq("DS-22", "2.0", "dsco_t2")))
  }

  test("mirakl fixture: CANCELED order dropped (q36)") {
    assert(rowSet(Payloads.mirakl(spark, s"$fx/mirakl.json", "mirakl_s1")) == rows(
      Seq("MK-1", "2.0", "mirakl_s1"), Seq("MK-2", "1.0", "mirakl_s1"),
      Seq("MK-3", "3.0", "mirakl_s1")))
  }

  test("wayfair fixture: GraphQL envelope flatten (q37)") {
    assert(rowSet(Payloads.wayfair(spark, s"$fx/wayfair.json")) == rows(
      Seq("WF-1", "2.0", "wayfair"), Seq("WF-2", "1.0", "wayfair"),
      Seq("WF-3", "4.0", "wayfair")))
  }
}
