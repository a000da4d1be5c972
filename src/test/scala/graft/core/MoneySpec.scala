package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Entities

class MoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("moneySum is invariant under partitioning (the core claim)") {
    val df = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select((col("l_extendedprice") * (lit(1) - col("l_discount"))).as("x"))
    def total(parts: Int): Double =
      df.repartition(parts)
        .agg(Money.round2(Money.moneySum(col("x")))).first().getDouble(0)
    val t1 = total(1)
    assert(total(7) == t1 && total(32) == t1,
      "decimal sum must not depend on partition layout")
  }

  test("ratio2 rounds through decimal space") {
    val r = spark.range(1).select(
      Money.ratio2(lit(1.0), lit(3.0)).as("r")).first().getDouble(0)
    assert(r == 0.33)
  }

  test("entity derivations have the pinned shapes and clean keys") {
    val s = Entities.suppliers(spark, TestSpark.sf)
    assert(s.columns.toSeq == Seq("supplier_id", "supplier_name",
      "contact_details", "region"))
    val p = Entities.products(spark, TestSpark.sf)
    assert(p.schema("selling_price").dataType.typeName == "double")
    assert(p.schema("stock_quantity").dataType.typeName == "integer")
    val sales = Entities.sales(spark, TestSpark.sf)
    assert(sales.schema("sale_date").dataType.typeName == "date")
    val statuses = sales.select("order_status").distinct()
      .as[String].collect().toSet
    assert(statuses.subsetOf(
      Set("Pending", "Shipped", "Delivered", "Cancelled")))
    // FK domain per FIXTURES.md §3: supplier_id = 1 + partkey % n while
    // s_suppkey is 0-based — so exactly the partkey ≡ n-1 (mod n) strip
    // dangles and supplier 0 is product-less. Both engines derive the
    // same mapping; the left joins absorb it. Assert that known shape.
    val n = graft.sources.Tables.supplier(spark, TestSpark.sf).count()
    val dangling = p.join(s, Seq("supplier_id"), "left_anti")
    assert(dangling.filter(col("supplier_id") =!= n.toString).count() == 0,
      "only the FK == n strip may dangle")
  }

  test("hash split is exhaustive, disjoint and stable") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val split = graft.functions.TextAnalysis.hashSplit(docs)
    assert(split.count() == docs.count())
    val again = graft.functions.TextAnalysis.hashSplit(docs)
    assert(split.select("doc_id", "split")
      .except(again.select("doc_id", "split")).isEmpty)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "validation", "test"))
    assert(counts("train") > counts("test"),
      "80/10/10 cut points should dominate train")
  }
}
