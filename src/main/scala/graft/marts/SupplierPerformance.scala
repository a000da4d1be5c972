package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Money, RunClock}

/** Supplier performance mart.
  *
  * Semantics from `ETL-Airflow/dags/tasks/m_supplier_performance_task.py`:
  * suppliers ⟕ products on trim'd keys (:70-84), ⟕ sales with the
  * `order_status != 'Cancelled'` residual inside the join condition
  * (:88-104 — non-matching sales still yield NULL-padded supplier rows,
  * which the `coalesce(..., 0)` zero-fills downstream), per-supplier
  * aggregate (:113-127), per-(supplier, product) revenue + row_number
  * top-1 window (:132-156), join-back for name + top product (:159-177).
  *
  * Deviations (deliberate, documented):
  *  - `DAY_DT` comes from the injected [[RunClock]], not `current_date()`.
  *  - The top-product window adds `product_name` as a secondary sort key;
  *    the reference orders only by revenue (:146-148) so ties are
  *    plan-dependent — unacceptable for a reproducible engine.
  *  - Money sums go through [[Money.moneySum]] (see its scaladoc).
  *
  * Scale: suppliers and products are dims → broadcast both sides of the
  * supplier⟕product join; the sales join shuffles on product_id (the fact
  * side's natural key). The window partitions by supplier_id after a
  * product-grain pre-aggregation, so the window input is |products|-sized,
  * not |sales|-sized. Catalyst rewrites rnk=1 to WindowGroupLimit (top-k).
  */
object SupplierPerformance {

  def build(suppliers: DataFrame, products: DataFrame, sales: DataFrame,
            clock: RunClock): DataFrame = {
    val sup = suppliers.select("supplier_id", "supplier_name")
    val prod = products.select("product_id", "product_name", "supplier_id",
      "selling_price")
    val sal = sales.select("sale_id", "product_id", "order_status",
      "quantity", "discount")

    val jnrSupplierProducts = sup.alias("s")
      .join(broadcast(prod.alias("p")),
        trim(col("s.supplier_id")) === trim(col("p.supplier_id")), "left")
      .select(
        col("s.supplier_id"), col("s.supplier_name"),
        col("p.product_id"), col("p.product_name"), col("p.selling_price"))

    val jnrMaster = jnrSupplierProducts.alias("jsp")
      .join(sal.alias("sls"),
        col("sls.product_id") === col("jsp.product_id") &&
          col("sls.order_status") =!= "Cancelled", "left")
      .select(
        col("jsp.supplier_id"), col("jsp.supplier_name"),
        col("jsp.product_name"), col("jsp.selling_price"),
        col("sls.sale_id"), col("sls.order_status"),
        col("sls.quantity"), col("sls.discount"))

    val revenueExpr =
      (col("selling_price") - col("selling_price") * col("discount") / 100.0) *
        col("quantity")
    // reference computes per-product revenue with a different (but
    // algebraically equal) fp expression ((sp*q)*(1-d/100), :132-138);
    // keep its exact per-row op order for the ranking column
    val productRevenueExpr =
      (col("selling_price") * col("quantity")) * (lit(1) - col("discount") / 100.0)

    // SINGLE fact pass: aggregate once at (supplier, product) grain with
    // decimal partials, then derive BOTH the supplier totals (window
    // sums of exact decimal partials ≡ direct sums) and the top-product
    // rank from that small frame. The naive two-groupBy form scans and
    // joins the fact twice — at 100 TB that's 2x the dominant cost.
    val perProduct = jnrMaster
      .groupBy("supplier_id", "product_name")
      .agg(
        Money.moneySum(revenueExpr).as("rev_dec"),
        Money.round2(Money.moneySum(productRevenueExpr)).as("product_revenue"),
        count(col("sale_id")).as("cnt"),
        sum(col("quantity")).as("qty"))

    val w = Window.partitionBy("supplier_id")
    val wRank = w.orderBy(desc_nulls_last("product_revenue"), asc("product_name"))
    val perSupplier = perProduct
      .withColumn("total_revenue",
        coalesce(Money.round2(sum(col("rev_dec")).over(w)), lit(0.0)))
      .withColumn("total_products_sold",
        coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("total_stock_sold",
        coalesce(sum(col("qty")).over(w), lit(0L)))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") === 1)
      .select(col("supplier_id"), col("total_revenue"),
        col("total_products_sold"), col("total_stock_sold"),
        col("product_name").as("top_product"))

    perSupplier.alias("agg")
      .join(broadcast(sup.alias("s2")),
        trim(col("agg.supplier_id")) === trim(col("s2.supplier_id")), "left")
      .select(
        clock.runDateCol.as("DAY_DT"),
        col("agg.supplier_id").as("SUPPLIER_ID"),
        col("s2.supplier_name").as("SUPPLIER_NAME"),
        col("agg.total_revenue").as("TOTAL_REVENUE"),
        col("agg.total_products_sold").as("TOTAL_PRODUCTS_SOLD"),
        col("agg.total_stock_sold").as("TOTAL_STOCK_SOLD"),
        col("agg.top_product").as("TOP_SELLING_PRODUCT"))
  }

  /** DuckDB oracle — same algebra over the OracleCtes entity views.
    * Parameterized by the run-date literal so a backfill replay can
    * union one instance per replayed day (`pipeline_backfill`).
    */
  def oracleSqlFor(runDateSql: String): String = {
    import graft.sources.OracleCtes
    val revenue = "(selling_price - selling_price * discount / 100.0) * quantity"
    val prodRevenue = "(selling_price * quantity) * (1 - discount / 100.0)"
    OracleCtes.withEntities("suppliers", "products", "sales") +
      s"""
, sup AS (SELECT supplier_id, supplier_name FROM suppliers)
, jnr AS (
  SELECT s.supplier_id, s.supplier_name, p.product_id, p.product_name, p.selling_price
  FROM sup s LEFT JOIN products p ON trim(s.supplier_id) = trim(p.supplier_id))
, master AS (
  SELECT j.supplier_id, j.supplier_name, j.product_name, j.selling_price,
         sl.sale_id, sl.order_status, sl.quantity, sl.discount
  FROM jnr j LEFT JOIN sales sl
    ON sl.product_id = j.product_id AND sl.order_status != 'Cancelled')
, agg AS (
  SELECT supplier_id,
         COALESCE(${Money.Sql.round2(Money.Sql.moneySum(revenue))}, 0.0) AS total_revenue,
         COUNT(sale_id) AS total_products_sold,
         CAST(COALESCE(SUM(quantity), 0) AS BIGINT) AS total_stock_sold
  FROM master GROUP BY supplier_id)
, per_product AS (
  SELECT supplier_id, product_name,
         ${Money.Sql.round2(Money.Sql.moneySum(prodRevenue))} AS product_revenue
  FROM master GROUP BY supplier_id, product_name)
, top AS (
  SELECT supplier_id, product_name AS top_product FROM (
    SELECT supplier_id, product_name,
           ROW_NUMBER() OVER (PARTITION BY supplier_id
             ORDER BY product_revenue DESC NULLS LAST, product_name ASC) AS rnk
    FROM per_product) ranked WHERE rnk = 1)
SELECT $runDateSql AS "DAY_DT",
       a.supplier_id AS "SUPPLIER_ID",
       s2.supplier_name AS "SUPPLIER_NAME",
       a.total_revenue AS "TOTAL_REVENUE",
       a.total_products_sold AS "TOTAL_PRODUCTS_SOLD",
       a.total_stock_sold AS "TOTAL_STOCK_SOLD",
       t.top_product AS "TOP_SELLING_PRODUCT"
FROM agg a
LEFT JOIN sup s2 ON trim(a.supplier_id) = trim(s2.supplier_id)
LEFT JOIN top t ON trim(a.supplier_id) = trim(t.supplier_id)
ORDER BY a.supplier_id"""
  }

  val oracleSql: String = oracleSqlFor(RunClock.runDateSql)
}
