package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Money, RunClock}

/** Customer sales report (detail-grain report with loyalty tiering).
  *
  * Semantics from `ETL-Airflow/dags/tasks/m_customer_sales_report_task.py`:
  * top-selling-product list from today's supplier_performance (:77-86 —
  * the reference `collect()`s it into a Python list and uses `isin`
  * (:164-171); we keep it distributed as a broadcast left join, J14 →
  * left_semi-style per SURVEY §7.4(9)), customers ⟕ sales with status
  * residual (:89-109), inner join products (:113-136), derived sale
  * columns (:140-171), per-customer amount aggregate (:175-180), tier
  * cutoffs at the 0.5/0.8 quantiles (:183-188 — reference uses driver-side
  * `approxQuantile(…, 0.01)`; we compute EXACT percentiles in-plan, which
  * is deterministic and oracle-comparable, SURVEY §7.4(5)), 3-way tiering
  * (:191-200), aggregate-back-to-detail inner join (:204-231).
  *
  * Scale: the per-customer aggregate and join-back shuffle on customer_id
  * twice; the tier-cutoff scalar is a single-row broadcast. The DEFAULT
  * tier mode is the scale-safe in-plan `percentile_approx` (GK sketch,
  * bounded memory per aggregation buffer, fully distributed); the exact
  * path is reserved for oracle comparison — see [[TierMode]].
  */
object CustomerSalesReport {

  /** How the 0.5/0.8 loyalty-tier cutoffs are computed. */
  sealed trait TierMode
  object TierMode {
    /** Scale default: `percentile_approx` in-plan (the same
      * Greenwald–Khanna sketch the reference's mechanism uses, ε = 0.01,
      * but distributed and bounded-memory — exact `percentile` buffers
      * every per-customer value in ONE aggregation buffer, a memory
      * cliff at 10⁸ customers).
      */
    case object Approx extends TierMode
    /** Exact in-plan percentiles — deterministic and oracle-comparable
      * (DuckDB `quantile_cont` matches bit-for-bit). Reserved for the
      * correctness twin and small/medium data.
      */
    case object Exact extends TierMode
    /** The reference's mechanism verbatim: a driver-side
      * `df.stat.approxQuantile(…, 0.01)` ACTION (A10,
      * m_customer_sales_report_task.py:183-188) whose outputs become
      * literals in the downstream plan. Costs an extra job; kept for
      * parity demonstration.
      */
    case object DriverApprox extends TierMode
  }

  /** The detail frame + per-customer amount aggregate the tiering runs
    * on — exposed so the approx-tier verification query
    * (`m_csr_approx_tiers`) can probe the same aggregate the mart uses.
    */
  def customerAmounts(customers: DataFrame, products: DataFrame,
                      sales: DataFrame, supplierPerformance: DataFrame,
                      clock: RunClock): DataFrame =
    expAdd(customers, products, sales, supplierPerformance, clock)
      .groupBy("customer_id")
      .agg(Money.moneySum(col("sale_amount")).cast("double")
        .as("agg_sales_amount"))

  /** Detail rows with derived sale columns (the mart's pre-aggregation
    * frame, reference :89-171).
    */
  private def expAdd(customers: DataFrame, products: DataFrame,
                     sales: DataFrame, supplierPerformance: DataFrame,
                     clock: RunClock): DataFrame = {
    val prod = products.select("product_id", "product_name", "category",
      "selling_price")
    val sal = sales.select("sale_id", "customer_id", "product_id",
      "order_status", "quantity", "discount", "sale_date", "shipping_cost")
    val cust = customers.select("customer_id", "name", "city")

    val topSelling = supplierPerformance
      .filter(col("DAY_DT") === clock.runDateCol &&
        col("TOP_SELLING_PRODUCT").isNotNull)
      .select(col("TOP_SELLING_PRODUCT").as("top_product"))
      .distinct()

    val jnrSalesCustomer = cust.alias("c")
      .join(sal.alias("s"),
        col("s.customer_id") === col("c.customer_id") &&
          col("s.order_status") =!= "Cancelled", "left")
      .select(
        col("s.sale_id"), col("s.product_id"), col("s.order_status"),
        col("s.quantity"), col("s.discount"), col("s.sale_date"),
        col("s.shipping_cost"), col("c.customer_id"), col("c.name"),
        col("c.city"))

    val jnrMaster = jnrSalesCustomer.alias("jsc")
      .join(broadcast(prod.alias("p")),
        col("jsc.product_id") === col("p.product_id"), "inner")
      .select(
        col("jsc.sale_id"), col("jsc.order_status"), col("jsc.quantity"),
        col("jsc.discount"), col("jsc.sale_date"), col("jsc.shipping_cost"),
        col("jsc.customer_id"), col("jsc.name"), col("jsc.city"),
        col("p.product_id"), col("p.product_name"), col("p.category"),
        col("p.selling_price"))

    jnrMaster
      .withColumn("day_dt", clock.runDateCol)
      .withColumn("price",
        col("selling_price") - col("selling_price") * col("discount") / 100)
      .withColumn("sale_amount",
        col("quantity") * col("selling_price") * (lit(1) - col("discount") / 100))
      .withColumn("sale_date",
        coalesce(col("sale_date"), date_sub(clock.runDateCol, 1)))
      .withColumn("sale_year", year(col("sale_date")))
      .withColumn("sale_month", date_format(col("sale_date"), "MMMM"))
      .withColumn("load_tstmp", clock.loadTsCol)
      .join(broadcast(topSelling),
        col("product_name") === col("top_product"), "left")
      .withColumn("top_performer", col("top_product").isNotNull)
      .drop("top_product")
  }

  def build(customers: DataFrame, products: DataFrame, sales: DataFrame,
            supplierPerformance: DataFrame, clock: RunClock,
            tiers: TierMode = TierMode.Approx): DataFrame = {
    // Deliberately NOT materialized (round-8 A/B, PLANS.md): the two
    // textual fact passes below (per-customer agg + join-back) share
    // their shuffle exchanges at runtime — Catalyst's ReusedExchange
    // dedupes the expensive lineitem⨝orders subtree — so the lazy form
    // runs ONE physical fact derivation (0.96 s warm at sf0.1), while
    // an explicit checkpoint/localCheckpoint seam measured 4.3 s (the
    // eager materialization forfeits both exchange reuse and AQE).
    val expAddSalesData =
      expAdd(customers, products, sales, supplierPerformance, clock)

    val aggCustomer = expAddSalesData
      .groupBy("customer_id")
      .agg(Money.moneySum(col("sale_amount")).cast("double")
        .as("agg_sales_amount"))

    // 0.5/0.8 cutoffs as a 1-row broadcast, computed per TierMode.
    // accuracy = 1/ε = 100 mirrors the reference's relativeError 0.01.
    val cutoffs = tiers match {
      case TierMode.Approx =>
        aggCustomer.agg(
          percentile_approx(col("agg_sales_amount"), lit(0.5), lit(100))
            .as("silver_tier"),
          percentile_approx(col("agg_sales_amount"), lit(0.8), lit(100))
            .as("gold_tier"))
      case TierMode.Exact =>
        aggCustomer.agg(
          percentile(col("agg_sales_amount"), lit(0.5)).as("silver_tier"),
          percentile(col("agg_sales_amount"), lit(0.8)).as("gold_tier"))
      case TierMode.DriverApprox =>
        val Array(silver, gold) = aggCustomer.stat
          .approxQuantile("agg_sales_amount", Array(0.5, 0.8), 0.01)
        aggCustomer.sparkSession.range(1)
          .select(lit(silver).as("silver_tier"), lit(gold).as("gold_tier"))
    }

    val tiered = graft.core.Scalars.crossBroadcast(aggCustomer, cutoffs)
      .withColumn("loyalty_tier",
        when(col("agg_sales_amount") > col("gold_tier"), "GOLD")
          .when(col("agg_sales_amount").between(col("silver_tier"), col("gold_tier")),
            "SILVER")
          .otherwise("BRONZE"))
      .select("customer_id", "loyalty_tier")

    expAddSalesData.alias("a")
      .join(tiered.alias("b"),
        col("a.customer_id") === col("b.customer_id"), "inner")
      .select(
        col("a.day_dt").as("DAY_DT"),
        col("b.customer_id").as("CUSTOMER_ID"),
        col("a.name").as("CUSTOMER_NAME"),
        col("a.sale_id").as("SALE_ID"),
        col("a.city").as("CITY"),
        col("a.product_name").as("PRODUCT_NAME"),
        col("a.category").as("CATEGORY"),
        col("a.sale_date").as("SALE_DATE"),
        col("a.sale_month").as("SALE_MONTH"),
        col("a.sale_year").as("SALE_YEAR"),
        col("a.quantity").as("QUANTITY"),
        col("a.price").as("PRICE"),
        col("a.sale_amount").as("SALE_AMOUNT"),
        col("b.loyalty_tier").as("LOYALTY_TIER"),
        col("a.top_performer").as("TOP_PERFORMER"),
        col("a.load_tstmp").as("LOAD_TSTMP"))
  }

  val oracleSql: String = {
    import graft.sources.OracleCtes
    // The top-selling-product list replays the supplier_performance
    // per-product ranking (only the ranking CTEs are needed).
    OracleCtes.withAll +
      s"""
, sp_master AS (
  SELECT s.supplier_id, p.product_name, p.selling_price,
         sl.quantity, sl.discount
  FROM (SELECT supplier_id, supplier_name FROM suppliers) s
  LEFT JOIN products p ON trim(s.supplier_id) = trim(p.supplier_id)
  LEFT JOIN sales sl ON sl.product_id = p.product_id AND sl.order_status != 'Cancelled')
, sp_per_product AS (
  SELECT supplier_id, product_name,
         ${Money.Sql.round2(Money.Sql.moneySum("(selling_price * quantity) * (1 - discount / 100.0)"))} AS product_revenue
  FROM sp_master GROUP BY supplier_id, product_name)
, top_selling AS (
  SELECT DISTINCT product_name AS top_product FROM (
    SELECT supplier_id, product_name,
           ROW_NUMBER() OVER (PARTITION BY supplier_id
             ORDER BY product_revenue DESC NULLS LAST, product_name ASC) AS rnk
    FROM sp_per_product) ranked
  WHERE rnk = 1 AND product_name IS NOT NULL)
, jnr_master AS (
  SELECT s.sale_id, s.order_status, s.quantity, s.discount, s.sale_date,
         s.shipping_cost, c.customer_id, c.name, c.city,
         p.product_id, p.product_name, p.category, p.selling_price
  FROM customers c
  LEFT JOIN sales s ON s.customer_id = c.customer_id AND s.order_status != 'Cancelled'
  JOIN products p ON s.product_id = p.product_id)
, exp_data AS (
  SELECT *,
         selling_price - selling_price * discount / 100 AS price,
         quantity * selling_price * (1 - discount / 100) AS sale_amount,
         COALESCE(sale_date, ${RunClock.runDateSql} - 1) AS sale_date2,
         EXISTS (SELECT 1 FROM top_selling t WHERE t.top_product = jnr_master.product_name) AS top_performer
  FROM jnr_master)
, agg_cust AS (
  SELECT customer_id,
         CAST(${Money.Sql.moneySum("sale_amount")} AS DOUBLE) AS agg_sales_amount
  FROM exp_data GROUP BY customer_id)
, cutoffs AS (
  SELECT quantile_cont(agg_sales_amount, 0.5) AS silver_tier,
         quantile_cont(agg_sales_amount, 0.8) AS gold_tier
  FROM agg_cust)
, tiered AS (
  SELECT customer_id,
         CASE WHEN agg_sales_amount > gold_tier THEN 'GOLD'
              WHEN agg_sales_amount BETWEEN silver_tier AND gold_tier THEN 'SILVER'
              ELSE 'BRONZE' END AS loyalty_tier
  FROM agg_cust CROSS JOIN cutoffs)
SELECT ${RunClock.runDateSql} AS "DAY_DT",
       b.customer_id AS "CUSTOMER_ID",
       a.name AS "CUSTOMER_NAME",
       a.sale_id AS "SALE_ID",
       a.city AS "CITY",
       a.product_name AS "PRODUCT_NAME",
       a.category AS "CATEGORY",
       a.sale_date2 AS "SALE_DATE",
       strftime(a.sale_date2, '%B') AS "SALE_MONTH",
       CAST(year(a.sale_date2) AS INT) AS "SALE_YEAR",
       a.quantity AS "QUANTITY",
       a.price AS "PRICE",
       a.sale_amount AS "SALE_AMOUNT",
       b.loyalty_tier AS "LOYALTY_TIER",
       a.top_performer AS "TOP_PERFORMER",
       ${RunClock.loadTsSql} AS "LOAD_TSTMP"
FROM exp_data a
JOIN tiered b ON a.customer_id = b.customer_id
ORDER BY a.sale_id, b.customer_id, a.product_name, a.quantity, a.price, a.sale_amount"""
  }
}
