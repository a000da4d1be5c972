package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Money, RunClock}

/** Customer metrics mart (the staging side of the MERGE upsert).
  *
  * Semantics from `ETL-Airflow/dags/tasks/m_customer_metrics_task.py`:
  * customers ⟕ sales (:77-98, no status filter — cancelled orders DO
  * count here) ⟕ products (:102-122), 8-way aggregate at customer grain
  * (:126-156): TOTAL_ORDERS is `sum(quantity)` (sic, :134), min/max
  * purchase dates, shipping cost, expenditure `sum(qty*price)`, savings
  * `sum(qty*price*disc/100)`, conditional Delivered/Cancelled counts
  * (:148-155); post-agg derived AVERAGE_ORDER_VALUE and the 4-day-recency
  * ACTIVE_CUSTOMER_FLAG (:157-170); most-used payment mode as a
  * count-per-(customer, mode) + row_number window, ties broken
  * alphabetically (:176-195); final left join + projection (:198-263).
  *
  * Scale: the fact is pre-aggregated on the NARROW (customer_id,
  * payment_mode) key only — map-side combine collapses 6M rows to ~0.5M
  * before the one shuffle, and the customer dim strings (name/city/
  * email/phone) never ride the exchange; they join back at customer
  * grain. The mode is picked by a second-level `min(struct(-cnt,
  * has_mode, mode))` aggregate — exactly the reference's (cnt DESC,
  * mode ASC NULLS FIRST) window order without a window sort (ProfCm at
  * sf1: window form 3.6 s fresh, this form 0.35–0.5 s, outputs
  * except()-identical both directions; the window form of mode survives
  * as the q_mode_window gate row). Products is broadcast into the fact
  * join.
  */
object CustomerMetrics {

  def build(customers: DataFrame, products: DataFrame, sales: DataFrame,
            clock: RunClock): DataFrame = {
    val cust = customers.select("customer_id", "name", "city", "email",
      "phone_number")
    val prod = products.select("product_id", "selling_price")
    val sal = sales.select("sale_id", "product_id", "customer_id",
      "order_status", "payment_mode", "shipping_cost", "quantity",
      "discount", "sale_date")

    // Fact pass at the NARROW (customer_id, payment_mode) grain: the
    // per-mode partials re-aggregate exactly to customer grain in a
    // second (dim-sized) groupBy, and the mode is picked by an ordinary
    // min(struct) aggregate encoding the window order (cnt DESC, mode
    // ASC NULLS FIRST): smallest -cnt = largest count; has_mode=false
    // sorts a NULL mode first on ties without relying on null-field
    // struct ordering. A left-joined customer with no sales contributed
    // one all-null row to the old jnrFull groupBy — its delivered/
    // cancelled CASE sums were 0, every other partial NULL, mode NULL —
    // reproduced below by the post-join coalesces.
    val factAgg = sal
      .join(broadcast(prod), Seq("product_id"), "left")
      .groupBy("customer_id", "payment_mode")
      .agg(
        count(lit(1)).as("agg_cnt"),
        sum(col("quantity")).as("p_total_orders"),
        max(col("sale_date")).as("p_last_purchase"),
        min(col("sale_date")).as("p_first_purchase"),
        Money.moneySum(col("shipping_cost")).as("p_shipping"),
        Money.moneySum(col("quantity") * col("selling_price")).as("p_expenditure"),
        Money.moneySum(
          col("quantity") * col("selling_price") * col("discount") / lit(100))
          .as("p_savings"),
        sum(when(col("order_status") === "Delivered", lit(1)).otherwise(lit(0)))
          .as("p_delivered"),
        sum(when(col("order_status") === "Cancelled", lit(1)).otherwise(lit(0)))
          .as("p_cancelled"))

    val custAgg = factAgg.groupBy("customer_id").agg(
      sum(col("p_total_orders")).as("agg_total_orders"),
      max(col("p_last_purchase")).as("agg_last_purchase_date"),
      min(col("p_first_purchase")).as("agg_first_purchase_date"),
      sum(col("p_shipping")).as("agg_total_shipping_cost"),
      sum(col("p_expenditure")).as("agg_expenditure"),
      sum(col("p_savings")).as("agg_total_amount_savings"),
      sum(col("p_delivered")).as("agg_delivered_orders_count"),
      sum(col("p_cancelled")).as("agg_cancelled_orders_count"),
      min(struct((-col("agg_cnt")).as("neg_cnt"),
        col("payment_mode").isNotNull.as("has_mode"),
        col("payment_mode").as("payment_mode"))).as("mode_pick"))
      .withColumn("payment_mode", col("mode_pick.payment_mode"))

    cust.join(custAgg, Seq("customer_id"), "left")
      .withColumn("average_order_value",
        coalesce(Money.ratio2(col("agg_expenditure"), col("agg_total_orders")),
          lit(0.0)))
      .withColumn("active_customer_flag",
        when(col("agg_last_purchase_date") >= date_sub(clock.runDateCol, 4),
          lit("TRUE")).otherwise(lit("FALSE")))
      .select(
        col("customer_id").as("CUSTOMER_ID"),
        col("name").as("CUSTOMER_NAME"),
        coalesce(col("agg_total_orders"), lit(0L)).as("TOTAL_ORDERS"),
        Money.round2(coalesce(col("agg_total_amount_savings"),
          lit(0).cast(Money.SumDec))).as("TOTAL_AMOUNT_SAVINGS"),
        Money.round2(coalesce(col("agg_total_shipping_cost"),
          lit(0).cast(Money.SumDec))).as("TOTAL_SHIPPING_COST"),
        Money.round2(coalesce(col("agg_expenditure"),
          lit(0).cast(Money.SumDec))).as("EXPENDITURE"),
        col("average_order_value").as("AVERAGE_ORDER_VALUE"),
        col("agg_first_purchase_date").as("FIRST_PURCHASE_DATE"),
        col("agg_last_purchase_date").as("LAST_PURCHASE_DATE"),
        col("payment_mode").as("MOST_USED_PAYMENT_MODE"),
        coalesce(col("agg_delivered_orders_count"), lit(0L))
          .as("DELIVERED_ORDERS_COUNT"),
        coalesce(col("agg_cancelled_orders_count"), lit(0L))
          .as("CANCELLED_ORDERS_COUNT"),
        col("active_customer_flag").as("ACTIVE_CUSTOMER_FLAG"),
        col("city").as("CITY"),
        col("email").as("EMAIL"),
        col("phone_number").as("PHONE_NUMBER"),
        clock.loadTsCol.as("LOAD_TIMESTAMP"),
        clock.loadTsCol.as("UPDATE_TIMESTAMP"))
  }

  val oracleSql: String = {
    import graft.sources.OracleCtes
    OracleCtes.withEntities("customers", "products", "sales") +
      s"""
, jnr_full AS (
  SELECT c.customer_id, c.name, s.order_status, s.payment_mode,
         s.shipping_cost, s.quantity, s.discount, s.sale_date,
         c.city, c.email, c.phone_number, p.product_id, p.selling_price
  FROM customers c
  LEFT JOIN sales s ON s.customer_id = c.customer_id
  LEFT JOIN products p ON p.product_id = s.product_id)
, agg AS (
  SELECT customer_id, name, city, email, phone_number,
         SUM(quantity) AS agg_total_orders,
         MAX(sale_date) AS agg_last_purchase_date,
         MIN(sale_date) AS agg_first_purchase_date,
         COALESCE(${Money.Sql.moneySum("shipping_cost")}, 0) AS agg_total_shipping_cost,
         COALESCE(${Money.Sql.moneySum("quantity * selling_price")}, 0) AS agg_expenditure,
         COALESCE(${Money.Sql.moneySum("quantity * selling_price * discount / 100")}, 0) AS agg_total_amount_savings,
         CAST(SUM(CASE WHEN order_status = 'Delivered' THEN 1 ELSE 0 END) AS BIGINT) AS agg_delivered,
         CAST(SUM(CASE WHEN order_status = 'Cancelled' THEN 1 ELSE 0 END) AS BIGINT) AS agg_cancelled
  FROM jnr_full
  GROUP BY customer_id, name, city, email, phone_number)
, mode_rnk AS (
  SELECT customer_id, payment_mode FROM (
    SELECT customer_id, payment_mode,
           ROW_NUMBER() OVER (PARTITION BY customer_id
             ORDER BY count(*) DESC, payment_mode ASC NULLS FIRST) AS rnk
    FROM jnr_full GROUP BY customer_id, payment_mode) r WHERE rnk = 1)
SELECT a.customer_id AS "CUSTOMER_ID",
       a.name AS "CUSTOMER_NAME",
       CAST(COALESCE(a.agg_total_orders, 0) AS BIGINT) AS "TOTAL_ORDERS",
       ${Money.Sql.round2("a.agg_total_amount_savings")} AS "TOTAL_AMOUNT_SAVINGS",
       ${Money.Sql.round2("a.agg_total_shipping_cost")} AS "TOTAL_SHIPPING_COST",
       ${Money.Sql.round2("a.agg_expenditure")} AS "EXPENDITURE",
       COALESCE(${Money.Sql.ratio2("a.agg_expenditure", "a.agg_total_orders")}, 0.0) AS "AVERAGE_ORDER_VALUE",
       a.agg_first_purchase_date AS "FIRST_PURCHASE_DATE",
       a.agg_last_purchase_date AS "LAST_PURCHASE_DATE",
       m.payment_mode AS "MOST_USED_PAYMENT_MODE",
       a.agg_delivered AS "DELIVERED_ORDERS_COUNT",
       a.agg_cancelled AS "CANCELLED_ORDERS_COUNT",
       CASE WHEN a.agg_last_purchase_date >= ${RunClock.runDateSql} - 4
            THEN 'TRUE' ELSE 'FALSE' END AS "ACTIVE_CUSTOMER_FLAG",
       a.city AS "CITY",
       a.email AS "EMAIL",
       a.phone_number AS "PHONE_NUMBER",
       ${RunClock.loadTsSql} AS "LOAD_TIMESTAMP",
       ${RunClock.loadTsSql} AS "UPDATE_TIMESTAMP"
FROM agg a
LEFT JOIN mode_rnk m ON a.customer_id = m.customer_id
ORDER BY a.customer_id"""
  }
}
