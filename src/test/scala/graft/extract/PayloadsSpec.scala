package graft.extract

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Fixture shapes per FIXTURES.md §A.3 — each exercises one nested
  * flattening pattern from the reference (N1-N7).
  */
class PayloadsSpec extends SparkSpec {

  private def tmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("payloads")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("walmart: double-nested orderLines flatten (N1-N2)") {
    val p = tmp("walmart.json",
      """{"list":{"elements":{"order":[
        |{"orderLines":{"orderLine":[
        |  {"item":{"sku":"W-1"},"orderLineQuantity":{"amount":"2"}},
        |  {"item":{"sku":"W-2"},"orderLineQuantity":{"amount":"1"}}]}},
        |{"orderLines":{"orderLine":[
        |  {"item":{"sku":"W-3"},"orderLineQuantity":{"amount":"5"}}]}}
        |]}}}""".stripMargin)
    assert(rowSet(Payloads.walmart(spark, p)) == rows(
      Seq("W-1", "2.0", "walmart"), Seq("W-2", "1.0", "walmart"),
      Seq("W-3", "5.0", "walmart")))
  }

  test("houzz: XML rowTag=Order + OrderItem explode (S4+N6)") {
    val p = tmp("houzz.xml",
      """<Orders>
        |  <Order><OrderItem><SKU>H-1</SKU><Quantity>3</Quantity></OrderItem>
        |         <OrderItem><SKU>H-2</SKU><Quantity>1</Quantity></OrderItem></Order>
        |  <Order><OrderItem><SKU>H-3</SKU><Quantity>4</Quantity></OrderItem></Order>
        |</Orders>""".stripMargin)
    assert(rowSet(Payloads.houzz(spark, p)) == rows(
      Seq("H-1", "3.0", "houzz"), Seq("H-2", "1.0", "houzz"),
      Seq("H-3", "4.0", "houzz")))
  }

  test("faire: orders[].items[] double explode (N7)") {
    val p = tmp("faire.json",
      """{"orders":[{"items":[{"sku":"F-1","quantity":2}]},
        |{"items":[{"sku":"F-2","quantity":6},{"sku":"F-3","quantity":1}]}]}""".stripMargin)
    assert(rowSet(Payloads.faire(spark, p)) == rows(
      Seq("F-1", "2.0", "faire"), Seq("F-2", "6.0", "faire"),
      Seq("F-3", "1.0", "faire")))
  }

  test("wooCommerce: date-window filter + line_items explode (S6+N3+P4)") {
    val p = tmp("woo.json",
      """[{"date_created":"2024-05-30T10:00:00","line_items":[{"sku":"C-1","quantity":2}]},
        | {"date_created":"2024-04-01T10:00:00","line_items":[{"sku":"C-old","quantity":9}]}]""".stripMargin)
    val out = Payloads.wooCommerce(spark, p, "brand1site",
      Timestamp.valueOf("2024-05-25 00:00:00"), Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(rowSet(out) == rows(Seq("C-1", "2.0", "brand1site")))
  }

  test("dsco: tz-naive date filter + lineItems explode, per-tenant site (S7+N4)") {
    val p = tmp("dsco.json",
      """{"orders":[
        |{"dscoCreateDate":"2024-05-30T12:00:00","lineItems":[{"sku":"D-1","quantity":1}]},
        |{"dscoCreateDate":"2024-01-01T12:00:00","lineItems":[{"sku":"D-old","quantity":2}]}]}""".stripMargin)
    val out = Payloads.dsco(spark, p, "tenant3",
      Timestamp.valueOf("2024-05-25 00:00:00"), Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(rowSet(out) == rows(Seq("D-1", "1.0", "tenant3")))
  }

  test("mirakl: CANCELED filter + order_lines struct expansion (S8+N5+P5)") {
    val p = tmp("mirakl.json",
      """{"orders":[
        |{"order_state":"SHIPPING","order_lines":[{"offer_sku":"M-1","quantity":2}]},
        |{"order_state":"CANCELED","order_lines":[{"offer_sku":"M-x","quantity":5}]}]}""".stripMargin)
    assert(rowSet(Payloads.mirakl(spark, p, "miraklsite")) == rows(Seq("M-1", "2.0", "miraklsite")))
  }

  test("wayfair: GraphQL data.getDropshipPurchaseOrders[].products[] (S9+N7)") {
    val p = tmp("wayfair.json",
      """{"data":{"getDropshipPurchaseOrders":[
        |{"products":[{"partNumber":"Y-1","quantity":4},{"partNumber":"Y-2","quantity":2}]}]}}""".stripMargin)
    assert(rowSet(Payloads.wayfair(spark, p)) == rows(
      Seq("Y-1", "4.0", "wayfair"), Seq("Y-2", "2.0", "wayfair")))
  }
}
