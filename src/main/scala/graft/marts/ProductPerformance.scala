package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Money, RunClock}

/** Product performance mart.
  *
  * Semantics from `ETL-Airflow/dags/tasks/m_product_performance_task.py`:
  * products ⟕ sales with the status residual in the join condition
  * (:61-82), aggregate at (product_id, product_name, category,
  * stock_quantity, reorder_level, cost_price) grain (:87-92):
  * total sales amount (:94-101), guarded ratio-of-sums average sale price
  * (:103-117 — `sum(amount)/sum(qty)`, NOT `avg`), total quantity sold
  * (:118-121); then derived stock columns (:126-150):
  * `total_stocks_left = stock_quantity - qty_sold`,
  * `reordered_quantity = reorder_level * stock_quantity / 100`,
  * status flag, and `profit = sales_amount - qty_sold * cost_price`.
  *
  * Scale: products is a dim → the groupBy keys are all functionally
  * dependent on product_id, so the aggregate state is |products|-sized;
  * the join shuffles the fact on product_id (broadcast of products keeps
  * it shuffle-free on one side).
  */
object ProductPerformance {

  def build(products: DataFrame, sales: DataFrame, clock: RunClock): DataFrame = {
    val prod = products.select("product_id", "product_name", "selling_price",
      "cost_price", "category", "stock_quantity", "reorder_level")
    val sal = sales.select("product_id", "order_status", "quantity", "discount")

    // NB: products is the row-preserved side of the left join, so it
    // cannot be broadcast (Spark builds the hash map on the right); AQE
    // picks the join strategy here.
    val jnrMaster = prod.alias("p")
      .join(sal.alias("s"),
        col("s.product_id") === col("p.product_id") &&
          col("s.order_status") =!= "Cancelled", "left")
      .select(
        col("p.product_id"), col("p.product_name"), col("p.selling_price"),
        col("p.cost_price"), col("p.category"), col("p.stock_quantity"),
        col("p.reorder_level"), col("s.order_status"), col("s.quantity"),
        col("s.discount"))

    val amountExpr =
      (col("selling_price") - col("selling_price") * col("discount") / lit(100.0)) *
        col("quantity")

    val aggTrans = jnrMaster
      .groupBy("product_id", "product_name", "category", "stock_quantity",
        "reorder_level", "cost_price")
      .agg(
        coalesce(Money.round2(Money.moneySum(amountExpr)), lit(0.0))
          .as("agg_total_sales_amount"),
        when(sum(col("quantity")) > lit(0),
          coalesce(Money.ratio2(Money.moneySum(amountExpr), sum(col("quantity"))),
            lit(0.0)))
          .otherwise(lit(0.0)).as("agg_average_sale_price"),
        coalesce(sum(col("quantity")), lit(0L)).as("agg_total_quantity_sold"))

    aggTrans
      .withColumn("total_stocks_left",
        col("stock_quantity") - col("agg_total_quantity_sold"))
      .withColumn("reordered_quantity",
        col("reorder_level") * col("stock_quantity") / 100)
      .withColumn("stock_level_status",
        when(col("total_stocks_left") < col("reordered_quantity"),
          "Below Reorder Level").otherwise("Sufficient Stock"))
      .withColumn("profit",
        coalesce(
          Money.round2(
            col("agg_total_sales_amount").cast(Money.SumDec) -
              (col("agg_total_quantity_sold") * col("cost_price")).cast(Money.SumDec)),
          lit(0.0)))
      .select(
        clock.runDateCol.as("DAY_DT"),
        col("product_id").as("PRODUCT_ID"),
        col("product_name").as("PRODUCT_NAME"),
        col("agg_total_sales_amount").as("TOTAL_SALES_AMOUNT"),
        col("agg_total_quantity_sold").as("TOTAL_QUANTITY_SOLD"),
        col("stock_quantity").as("STOCK_QUANTITY"),
        col("agg_average_sale_price").as("AVG_SALE_PRICE"),
        col("reorder_level").as("REORDER_LEVEL"),
        col("stock_level_status").as("STOCK_LEVEL_STATUS"),
        col("profit").as("PROFIT"),
        col("category").as("CATEGORY"))
  }

  val oracleSql: String = {
    import graft.sources.OracleCtes
    val amount = "(selling_price - selling_price * discount / 100.0) * quantity"
    OracleCtes.withEntities("products", "sales") +
      s"""
, master AS (
  SELECT p.product_id, p.product_name, p.selling_price, p.cost_price,
         p.category, p.stock_quantity, p.reorder_level,
         s.order_status, s.quantity, s.discount
  FROM products p LEFT JOIN sales s
    ON s.product_id = p.product_id AND s.order_status != 'Cancelled')
, agg AS (
  SELECT product_id, product_name, category, stock_quantity, reorder_level, cost_price,
         COALESCE(${Money.Sql.round2(Money.Sql.moneySum(amount))}, 0.0) AS total_sales_amount,
         CASE WHEN SUM(quantity) > 0
              THEN COALESCE(${Money.Sql.ratio2(Money.Sql.moneySum(amount), "SUM(quantity)")}, 0.0)
              ELSE 0.0 END AS avg_sale_price,
         CAST(COALESCE(SUM(quantity), 0) AS BIGINT) AS total_quantity_sold
  FROM master
  GROUP BY product_id, product_name, category, stock_quantity, reorder_level, cost_price)
SELECT ${RunClock.runDateSql} AS "DAY_DT",
       product_id AS "PRODUCT_ID",
       product_name AS "PRODUCT_NAME",
       total_sales_amount AS "TOTAL_SALES_AMOUNT",
       total_quantity_sold AS "TOTAL_QUANTITY_SOLD",
       stock_quantity AS "STOCK_QUANTITY",
       avg_sale_price AS "AVG_SALE_PRICE",
       reorder_level AS "REORDER_LEVEL",
       CASE WHEN (stock_quantity - total_quantity_sold) < (reorder_level * stock_quantity / 100)
            THEN 'Below Reorder Level' ELSE 'Sufficient Stock' END AS "STOCK_LEVEL_STATUS",
       COALESCE(${Money.Sql.round2(
        s"CAST(total_sales_amount AS DECIMAL(38,6)) - CAST(total_quantity_sold * cost_price AS DECIMAL(38,6))")}, 0.0) AS "PROFIT",
       category AS "CATEGORY"
FROM agg
ORDER BY product_id"""
  }
}
