package graft.marts

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark
import graft.core.RunClock

/** Mart semantics on tiny hand-computed fixtures, including the
  * reference's subtle behaviors: trim-key joins (whitespace-padded IDs),
  * the status filter living INSIDE the left join condition (§7.4(7)),
  * and zero-fills for dimension rows with no sales.
  */
class MartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val clock = RunClock.fixed

  // supplier s1 sells via p1/p2; s2 has a product but no sales; s3 has
  // nothing. IDs carry stray whitespace on one side (trim-join hygiene).
  private val suppliers = Seq(
    (" s1 ", "Acme", "x", "EU"), ("s2", "Bolt", "y", "US"),
    ("s3", "Cog", "z", "AP")).toDF(
    "supplier_id", "supplier_name", "contact_details", "region")
  private val products = Seq(
    ("p1", "Widget", "tools", 10.0, 6.0, 100, 5, "s1"),
    ("p2", "Gadget", "tools", 20.0, 12.0, 50, 5, "s1 "),
    ("p3", "Sprocket", "parts", 30.0, 18.0, 10, 20, "s2")).toDF(
    "product_id", "product_name", "category", "selling_price", "cost_price",
    "stock_quantity", "reorder_level", "supplier_id")
  private val sales = Seq(
    (1L, "c1", "p1", java.sql.Date.valueOf("2001-11-04"), 2, 0.0, 1.0, "Delivered", "UPI"),
    (2L, "c1", "p1", java.sql.Date.valueOf("2001-10-01"), 1, 50.0, 1.0, "Shipped", "UPI"),
    (3L, "c2", "p2", java.sql.Date.valueOf("2001-09-01"), 3, 0.0, 2.0, "Cancelled", "Cash on Delivery"),
    (4L, "c2", "p2", java.sql.Date.valueOf("2001-08-01"), 1, 0.0, 2.0, "Delivered", "Credit Card")).toDF(
    "sale_id", "customer_id", "product_id", "sale_date", "quantity",
    "discount", "shipping_cost", "order_status", "payment_mode")
  private val customers = Seq(
    ("c1", "Ann", "Paris", "a@x", "111"),
    ("c2", "Bob", "Lyon", "b@x", "222"),
    ("c3", "Cat", "Nice", "c@x", "333")).toDF(
    "customer_id", "name", "city", "email", "phone_number")

  test("supplier performance: trim joins, cancelled excluded, zero fills") {
    val out = SupplierPerformance.build(suppliers, products, sales, clock)
      .collect().map(r => r.getString(1).trim -> r).toMap
    // s1: p1 revenue = 2*10 + 1*(10-5) = 25; p2 non-cancelled = 1*20
    val s1 = out("s1")
    assert(s1.getDouble(3) == 45.0, "TOTAL_REVENUE")
    assert(s1.getLong(4) == 3L, "TOTAL_PRODUCTS_SOLD counts sales rows")
    assert(s1.getLong(5) == 4L, "TOTAL_STOCK_SOLD sums quantity")
    assert(s1.getString(6) == "Widget", "top product by revenue")
    // s2: product exists, no sales -> zero-filled aggregates
    val s2 = out("s2")
    assert(s2.getDouble(3) == 0.0 && s2.getLong(4) == 0L && s2.getLong(5) == 0L)
    assert(s2.getString(6) == "Sprocket",
      "unsold product still ranks (NULL revenue) - reference behavior")
    // s3: no product at all
    assert(out("s3").getDouble(3) == 0.0)
  }

  test("product performance: ratio-of-sums avg, stock status, profit") {
    val out = ProductPerformance.build(products, sales, clock)
      .collect().map(r => r.getString(1) -> r).toMap
    val p1 = out("p1")
    assert(p1.getDouble(3) == 25.0, "TOTAL_SALES_AMOUNT")
    assert(p1.getLong(4) == 3L)
    assert(p1.getDouble(6) == 8.33, "AVG_SALE_PRICE = 25/3 rounded")
    assert(p1.getDouble(9) == 25.0 - 3 * 6.0, "PROFIT")
    assert(p1.getString(8) == "Sufficient Stock")
    // p3: no sales -> qty 0, avg 0; stocks_left 10 < reorder 20*10/100=2 ? no
    val p3 = out("p3")
    assert(p3.getDouble(3) == 0.0 && p3.getLong(4) == 0L && p3.getDouble(6) == 0.0)
    assert(p3.getString(8) == "Sufficient Stock")
    // p2: cancelled sale excluded: only sale 4 -> qty 1, amount 20
    assert(out("p2").getDouble(3) == 20.0 && out("p2").getLong(4) == 1L)
  }

  test("customer metrics: cancelled counted, mode tie-break, active flag") {
    val out = CustomerMetrics.build(customers, products, sales, clock)
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = out("c1")
    assert(c1.getLong(2) == 3L, "TOTAL_ORDERS = sum(quantity)")
    assert(c1.getString(9) == "UPI")
    assert(c1.getString(12) == "TRUE", "purchase on 11-04 within 4d of 11-05")
    val c2 = out("c2")
    assert(c2.getLong(2) == 4L, "cancelled sales still count here")
    assert(c2.getLong(11) == 1L, "CANCELLED_ORDERS_COUNT")
    assert(c2.getString(9) == "Cash on Delivery",
      "tie 1-1 broken alphabetically")
    assert(c2.getString(12) == "FALSE")
    val c3 = out("c3")
    assert(c3.getLong(2) == 0L && c3.getString(9) == null)
    assert(c3.getDouble(6) == 0.0, "AVERAGE_ORDER_VALUE null-safe 0")
  }

  test("customer sales report: inner product join drops saleless customers") {
    val sp = SupplierPerformance.build(suppliers, products, sales, clock)
    val out = CustomerSalesReport.build(customers, products, sales, sp, clock)
    val rows = out.collect()
    // c3 has no sales; cancelled sale 3 excluded -> sales 1,2,4 remain
    assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 4L))
    val bySale = rows.map(r => r.getLong(3) -> r).toMap
    assert(bySale(2L).getDouble(11) == 5.0, "PRICE with 50% discount")
    assert(bySale(2L).getDouble(12) == 5.0, "SALE_AMOUNT qty 1")
    assert(bySale(1L).getString(8) == "November" && bySale(1L).getInt(9) == 2001)
    // top performer: Widget is s1's top product
    assert(bySale(1L).getBoolean(14))
    assert(!bySale(4L).getBoolean(14), "Gadget not a top product")
  }
}
