package graft.sqllab

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.RunClock
import graft.marts._
import graft.sources.{Entities, OracleCtes}

/** SQL serving: the reference's 8 Superset BI queries
  * (the .sql files under `Superset-Query-Lab`) adapted to `spark.sql` over the
  * engine's materialized mart views (SURVEY §3.3 — in the reference
  * these run on Postgres over `legacy.*`; here the SQL front door and
  * the DataFrame pipelines share one Catalyst engine).
  *
  * Adaptations, kept minimal and documented:
  *  - `legacy.<t>` → temp view `<t>`; quoted idents unquoted;
  *  - `current_date` → the injected run date (determinism);
  *  - `EXTRACT(MONTH FROM d)` → `month(d)` (both dialects);
  *  - double SUMs routed through the DECIMAL(38,6) pattern (identical
  *    SQL text runs on both engines — see graft.core.Money);
  *  - ranking queries get an explicit unique tie-break column.
  *
  * FIVE reference texts additionally run with ZERO adaptation — byte-
  * identical to the .sql files, leading comments, trailing semicolons,
  * quoting and all ([[verbatimSupplierPerfSql]],
  * [[verbatimPaymentModeSql]], [[verbatimProductContribSql]],
  * [[verbatimMonthlyHeatmapSql]], [[verbatimRevenueByRegionSql]]): ANSI
  * double-quoted identifiers and the `legacy.*` schema are served
  * natively, proving the adaptations above are conveniences, not
  * dialect gaps. The `legacy` serving schema types its money columns
  * DECIMAL(38,6) — NUMERIC-style money, the standard warehouse
  * practice — which makes the reference texts' free-running
  * `SUM(money)` exact and therefore order-independent: the texts run
  * verbatim with deterministic results on both engines (a double-typed
  * column would make the same SUM FP-order-nondeterministic, which is
  * why the ADAPTED rows route their sums through the decimal pattern
  * explicitly). The remaining three texts cannot run verbatim for
  * REASONS, not dialect: `Top_Selling_Supplier_Products`' untied
  * ROW_NUMBER is nondeterministic on this data (duplicate
  * (supplier, product_name) pairs exist — the adapted row adds the
  * tie-break), and `Average_Order_Value` / `Total_Order_Over_Time`
  * filter on `current_date`, which on 2001-era testdata selects zero
  * rows at any real run date — their adapted rows pin the reference's
  * intent to the injected run date instead.
  */
object SqlLab {
  private val clock = RunClock.fixed

  /** Money-pattern SQL fragments valid in BOTH Spark SQL and DuckDB. */
  private def sum2(e: String): String =
    s"CAST(ROUND(SUM(CAST(($e) AS DECIMAL(38,6))), 2) AS DOUBLE)"
  private def ratio2(num: String, den: String): String =
    s"CAST(ROUND(CAST(CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS DECIMAL(38,10)), 2) AS DOUBLE)"

  // mart views are cached per session for the LAST-REGISTERED sfDir:
  // the 8 lab queries all re-read them, and without this each query
  // re-derives the full mart pipeline (the reference amortizes the same
  // way — BI SQL runs over MATERIALIZED mart tables). Temp views are
  // session-global, so switching sfDir must re-register — tracking the
  // last dir (not a seen-set) keeps each query a pure function of
  // (session, sfDir).
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  // cached mart frames per session, so a re-register for a NEW sfDir can
  // unpersist the superseded ones instead of letting executor storage
  // accumulate across sfDir switches in a long-lived session
  private val cachedMarts =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Seq[DataFrame]]()

  /** Register the source-entity and mart views the lab queries expect.
    *
    * SYNCHRONIZED end-to-end: the guard map used to be updated before
    * the registration work ran, so under a parallel query suite a
    * concurrent caller raced past the check and ran its SQL against
    * legacy tables MID-REWRITE (drop + saveAsTable is seconds at big
    * SFs — the 30× gate caught sql_supplier_perf_verbatim reading a
    * partially-materialized mart; invisible at small SFs where the
    * window is milliseconds). Every caller now blocks until the
    * registration that covers its sfDir has fully completed; the
    * post-registration fast path is a map read under an uncontended
    * lock.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = synchronized {
    // stopped sessions can never be re-registered — drop their entries
    registered.keySet.removeIf(s => s.sparkContext.isStopped)
    cachedMarts.keySet.removeIf(s => s.sparkContext.isStopped)
    // check-then-act is safe under the method-wide lock; the guard is
    // updated only AFTER registration fully completes, so a failure
    // mid-registration leaves no guard at all — a failed sfDir-Y
    // registration may have half-rewritten legacy tables, so even the
    // PREVIOUS sfDir's entry must not survive it (a later sfDir-X
    // caller would otherwise skip registration and read the corruption)
    if (registered.get(spark) != sfDir) {
      registered.remove(spark)
      Option(cachedMarts.get(spark))
        .foreach(_.foreach(_.unpersist(blocking = false)))
      val suppliers = Entities.suppliers(spark, sfDir)
      val customers = Entities.customers(spark, sfDir)
      val products = Entities.products(spark, sfDir)
      val sales = Entities.salesCached(spark, sfDir)
      suppliers.createOrReplaceTempView("suppliers")
      customers.createOrReplaceTempView("customers")
      products.createOrReplaceTempView("products")
      sales.createOrReplaceTempView("sales")
      val sp = SupplierPerformance.build(suppliers, products, sales, clock)
        .cache()
      sp.createOrReplaceTempView("supplier_performance")
      // Exact tiers: these views feed oracle-compared SQL rows whose
      // DuckDB twins replay quantile_cont.
      val csr = CustomerSalesReport.build(customers, products, sales, sp, clock,
        CustomerSalesReport.TierMode.Exact)
        .cache()
      csr.createOrReplaceTempView("customer_sales_report")
      // The reference's BI SQL runs over Postgres `legacy.*` tables; serve
      // that schema natively so reference texts can run VERBATIM — a real
      // `legacy` database in the session catalog holding the materialized
      // mart + source tables (the same amortization Postgres gives the
      // reference).
      spark.sql("CREATE DATABASE IF NOT EXISTS legacy")
      // money columns are typed DECIMAL(38,6) in the legacy serving
      // schema (NUMERIC-style money): free-running SUMs over them are
      // exact and order-independent, which is what lets the reference
      // texts run verbatim with deterministic cross-engine results
      val money = org.apache.spark.sql.types.DecimalType(38, 6)
      materializeLegacy(spark, "supplier_performance", sp.withColumn(
        "TOTAL_REVENUE", org.apache.spark.sql.functions.col("TOTAL_REVENUE")
          .cast(money)))
      materializeLegacy(spark, "customer_sales_report", csr.withColumn(
        "SALE_AMOUNT", org.apache.spark.sql.functions.col("SALE_AMOUNT")
          .cast(money)))
      materializeLegacy(spark, "suppliers", suppliers)
      materializeLegacy(spark, "products", products)
      materializeLegacy(spark, "sales", sales)
      cachedMarts.put(spark, Seq(sp, csr))
      registered.put(spark, sfDir)
    }
  }

  /** `saveAsTable` into the `legacy` catalog database. The warehouse
    * DIRECTORY outlives the in-memory catalog: a fresh JVM that re-runs
    * this sees no table but an existing location, and saveAsTable
    * refuses (LOCATION_ALREADY_EXISTS) — clear the orphaned location
    * (and any catalog entry) before materializing.
    */
  private def materializeLegacy(spark: SparkSession, table: String,
                                df: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS legacy.$table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"legacy.db/$table")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .saveAsTable(s"legacy.$table")
  }

  /** `Suppliers/Supplier_Performance_By_Revenue.sql:1-8` — the reference
    * query text UNMODIFIED (every other lab entry documents its
    * adaptations; this one has none). Double-quoted identifiers are the
    * ANSI dialect, parsed natively under
    * `spark.sql.ansi.doubleQuotedIdentifiers`; `legacy.supplier_performance`
    * resolves to the materialized mart table registerViews creates.
    */
  val verbatimSupplierPerfSql: String =
    "SELECT \n  \"SUPPLIER_ID\", \n  SUM(\"TOTAL_PRODUCTS_SOLD\"),\n  SUM(\"TOTAL_REVENUE\") \nFROM \n  legacy.supplier_performance\nGROUP BY \n  \"SUPPLIER_ID\""

  /** `Sales/Payment_Mode_Distribution.sql:1-8` UNMODIFIED — including
    * the leading `-- Create` comment and the trailing semicolon, both
    * parsed natively.
    */
  val verbatimPaymentModeSql: String =
    "-- Create \nSELECT \n    \"PAYMENT_MODE\",\n    count(*) AS \"COUNT\"\nfrom \n    legacy.sales\ngroup by \n    \"PAYMENT_MODE\";"

  /** `Suppliers/Product_Contribution_By_Region.sql:1-11` UNMODIFIED —
    * mixed-case keywords, unaliased `count(p."PRODUCT_ID")` (Spark's
    * generated output name is pinned by the oracle twin).
    */
  val verbatimProductContribSql: String =
    "SELECT \n    s.\"REGION\",\n    count(p.\"PRODUCT_ID\")\nFROM \n    legacy.products p\njoin \n    legacy.suppliers s \non\n    trim(s.\"SUPPLIER_ID\") = trim(p.\"SUPPLIER_ID\")\nGROUP BY\n    s.\"REGION\""

  /** `Sales/Monthly_Sales_Heatmap.sql:1-30` UNMODIFIED — the CASE month
    * map, the `legacy.customer_sales_report` read, ORDER BY the computed
    * alias, LIMIT, trailing semicolon. `SUM("SALE_AMOUNT")` is exact
    * (the legacy schema's DECIMAL money typing), so the free-running sum
    * is deterministic.
    */
  val verbatimMonthlyHeatmapSql: String =
    "SELECT \n    CONCAT(\n        CASE \"SALE_MONTH\"\n            WHEN 'January' THEN '01'\n            WHEN 'February' THEN '02'\n            WHEN 'March' THEN '03'\n            WHEN 'April' THEN '04'\n            WHEN 'May' THEN '05'\n            WHEN 'June' THEN '06'\n            WHEN 'July' THEN '07'\n            WHEN 'August' THEN '08'\n            WHEN 'September' THEN '09'\n            WHEN 'October' THEN '10'\n            WHEN 'November' THEN '11'\n            WHEN 'December' THEN '12'\n        END,\n        ' - ',\n        \"SALE_MONTH\"\n    ) AS SALE_MONTH_ORDERED,\n    \"SALE_YEAR\",\n    SUM(\"SALE_AMOUNT\") AS SUM_SALE\nFROM \n    legacy.customer_sales_report\nGROUP BY \n    \"SALE_MONTH\",\n    \"SALE_YEAR\"\nORDER BY \n    SALE_MONTH_ORDERED ASC,\n    \"SALE_YEAR\" DESC\nLIMIT 100;\n"

  /** `Sales/Revenue_By_Region.sql:1-11` UNMODIFIED — trim-key join of
    * two `legacy.*` tables, quoted output alias, no ORDER BY (the
    * deterministic presentation order is applied outside the text).
    */
  val verbatimRevenueByRegionSql: String =
    "SELECT \n    s.\"REGION\",  \n    SUM(sp.\"TOTAL_REVENUE\") as \"REGIONAL_REVENUE\"\nFROM \n    legacy.supplier_performance sp \nJOIN \n    legacy.suppliers s \non \n    trim(s.\"SUPPLIER_ID\")= trim(sp.\"SUPPLIER_ID\")\nGROUP BY \n    s.\"REGION\""

  /** Run a reference text byte-identical under ANSI double-quoted
    * identifiers. sql() parses eagerly, so the conf can be restored
    * immediately; the deterministic presentation order is applied
    * OUTSIDE the verbatim text (the gate requires row determinism; the
    * reference texts either have no ORDER BY or order on a non-unique
    * prefix), as is the hash-stable rendering of DECIMAL money sums
    * (see [[hashStablePresentation]]).
    */
  private def verbatim(text: String, orderCols: String*)
      : (SparkSession, String) => DataFrame = (s, d) => {
    registerViews(s, d)
    val key = "spark.sql.ansi.doubleQuotedIdentifiers"
    val prev = s.conf.get(key, "false")
    s.conf.set(key, "true")
    try hashStablePresentation(
      s.sql(text).orderBy(orderCols.head, orderCols.tail: _*))
    finally s.conf.set(key, prev)
  }

  /** Presentation projection applied OUTSIDE the verbatim text: DECIMAL
    * output columns (the legacy schema's NUMERIC-style money reaching a
    * free-running SUM) are rendered `ROUND(x, 2)::DOUBLE` — the exact
    * pattern every ADAPTED money row uses ([[sum2]]). The sum itself
    * stays exact decimal inside the text; only the emitted cell type
    * changes, because DECIMAL cells serialize differently across the
    * comparator's two read paths while DOUBLE is bit-stable. Oracle
    * twins render identically.
    */
  private def hashStablePresentation(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, round}
    import org.apache.spark.sql.types.DecimalType
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case _: DecimalType => round(c, 2).cast("double").as(f.name)
        case _              => c
      }
    }
    df.select(cols: _*)
  }

  /** Spark-SQL texts (also valid DuckDB modulo the mart-view CTEs). */
  val sql: Map[String, String] = Map(
    // Sales/Payment_Mode_Distribution.sql:1-8
    "sql_payment_mode_dist" ->
      """SELECT payment_mode AS PAYMENT_MODE, count(*) AS N_SALES
        |FROM sales GROUP BY payment_mode ORDER BY payment_mode""".stripMargin,
    // Sales/Total_Order_Over_Time.sql:1-9 (current_date → run date)
    "sql_total_order_over_time" ->
      s"""SELECT SALE_DATE, ${sum2("SALE_AMOUNT")} AS TOTAL_SALES
         |FROM customer_sales_report
         |WHERE SALE_DATE > DATE '2001-11-05' - 8
         |GROUP BY SALE_DATE ORDER BY SALE_DATE""".stripMargin,
    // Sales/Average_Order_Value.sql:1-14
    "sql_avg_order_value" ->
      s"""SELECT CONCAT(SALE_MONTH, '-', SALE_YEAR) AS MONTH_YEAR,
         |       ${ratio2(s"SUM(CAST(SALE_AMOUNT AS DECIMAL(38,6)))", "COUNT(SALE_ID)")} AS AVG_ORDER_VALUE
         |FROM customer_sales_report
         |WHERE SALE_DATE > DATE '2001-11-05' - 150
         |GROUP BY SALE_MONTH, SALE_YEAR, month(SALE_DATE)
         |ORDER BY month(SALE_DATE), SALE_YEAR""".stripMargin,
    // Engine extension (no reference text): correlated LATERAL derived
    // table — per-region top-2 suppliers by mart revenue. The ONE SQL
    // surface the adapted reference texts don't touch: a correlated
    // subquery in the FROM clause with its own ORDER BY + LIMIT,
    // decorrelated by Catalyst into a ranked join (DuckDB runs the
    // identical text). TOTAL_REVENUE ties break on SUPPLIER_ID.
    "sql_lateral" ->
      """SELECT r.region AS REGION, t.SUPPLIER_ID, t.TOTAL_REVENUE
        |FROM (SELECT DISTINCT region FROM suppliers) r,
        |LATERAL (
        |  SELECT sp.SUPPLIER_ID AS SUPPLIER_ID,
        |         sp.TOTAL_REVENUE AS TOTAL_REVENUE
        |  FROM supplier_performance sp
        |  JOIN suppliers s2 ON trim(s2.supplier_id) = trim(sp.SUPPLIER_ID)
        |  WHERE s2.region = r.region
        |  ORDER BY sp.TOTAL_REVENUE DESC, sp.SUPPLIER_ID
        |  LIMIT 2) t
        |ORDER BY REGION, SUPPLIER_ID""".stripMargin,
    // Sales/Revenue_By_Region.sql:1-11
    "sql_revenue_by_region" ->
      s"""SELECT s.region AS REGION, ${sum2("sp.TOTAL_REVENUE")} AS REGIONAL_REVENUE
         |FROM supplier_performance sp
         |JOIN suppliers s ON trim(s.supplier_id) = trim(sp.SUPPLIER_ID)
         |GROUP BY s.region ORDER BY s.region""".stripMargin,
    // Sales/Monthly_Sales_Heatmap.sql:1-30
    "sql_monthly_heatmap" ->
      s"""SELECT CONCAT(
         |         CASE SALE_MONTH
         |           WHEN 'January' THEN '01' WHEN 'February' THEN '02'
         |           WHEN 'March' THEN '03' WHEN 'April' THEN '04'
         |           WHEN 'May' THEN '05' WHEN 'June' THEN '06'
         |           WHEN 'July' THEN '07' WHEN 'August' THEN '08'
         |           WHEN 'September' THEN '09' WHEN 'October' THEN '10'
         |           WHEN 'November' THEN '11' WHEN 'December' THEN '12'
         |         END, ' - ', SALE_MONTH) AS SALE_MONTH_ORDERED,
         |       SALE_YEAR,
         |       ${sum2("SALE_AMOUNT")} AS SUM_SALE
         |FROM customer_sales_report
         |GROUP BY SALE_MONTH, SALE_YEAR
         |ORDER BY SALE_MONTH_ORDERED ASC, SALE_YEAR DESC
         |LIMIT 100""".stripMargin,
    // Suppliers/Product_Contribution_By_Region.sql:1-11
    "sql_product_contribution" ->
      """SELECT s.region AS REGION, count(p.product_id) AS N_PRODUCTS
        |FROM products p
        |JOIN suppliers s ON trim(s.supplier_id) = trim(p.supplier_id)
        |GROUP BY s.region ORDER BY s.region""".stripMargin,
    // Suppliers/Supplier_Performance_By_Revenue.sql:1-8
    "sql_supplier_perf_by_revenue" ->
      s"""SELECT SUPPLIER_ID,
         |       CAST(SUM(TOTAL_PRODUCTS_SOLD) AS BIGINT) AS SUM_PRODUCTS_SOLD,
         |       ${sum2("TOTAL_REVENUE")} AS SUM_REVENUE
         |FROM supplier_performance
         |GROUP BY SUPPLIER_ID ORDER BY SUPPLIER_ID""".stripMargin,
    // Suppliers/Top_Selling_Supplier_Products.sql:1-30 (+product_id tie-break)
    "sql_top_supplier_products" ->
      """SELECT SUPPLIER_ID, PRODUCT_ID, TOP_SELLING_PRODUCT, CATEGORY, TOTAL_REVENUE
        |FROM (
        |  SELECT sp.SUPPLIER_ID, sp.TOP_SELLING_PRODUCT, p.product_name AS PRODUCT_NAME,
        |         p.product_id AS PRODUCT_ID, p.category AS CATEGORY, sp.TOTAL_REVENUE,
        |         ROW_NUMBER() OVER (PARTITION BY sp.SUPPLIER_ID
        |           ORDER BY sp.TOTAL_REVENUE DESC, p.product_id ASC) AS rnk
        |  FROM supplier_performance sp
        |  JOIN products p
        |    ON trim(p.supplier_id) = trim(sp.SUPPLIER_ID)
        |   AND trim(p.product_name) = trim(sp.TOP_SELLING_PRODUCT)
        |) subquery
        |WHERE subquery.rnk = 1
        |ORDER BY SUPPLIER_ID""".stripMargin)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, text) =>
      name -> ((s: SparkSession, d: String) => {
        registerViews(s, d)
        s.sql(text)
      })
    } ++ Map(
      "sql_supplier_perf_verbatim" ->
        verbatim(verbatimSupplierPerfSql, "SUPPLIER_ID"),
      "sql_payment_mode_verbatim" ->
        verbatim(verbatimPaymentModeSql, "PAYMENT_MODE"),
      "sql_product_contrib_verbatim" ->
        verbatim(verbatimProductContribSql, "REGION"),
      // the text's own ORDER BY prefix is non-unique (same month across
      // years) — the outer presentation order totalizes it
      "sql_monthly_heatmap_verbatim" ->
        verbatim(verbatimMonthlyHeatmapSql, "SALE_MONTH_ORDERED", "SALE_YEAR"),
      "sql_revenue_region_verbatim" ->
        verbatim(verbatimRevenueByRegionSql, "REGION"))

  /** DuckDB oracles: the same SQL over CTE-materialized mart views (the
    * mart oracle queries nest as scoped WITH-subqueries).
    */
  def oracles: Map[String, String] = {
    val martCtes =
      s"""WITH sp_full AS (${SupplierPerformance.oracleSql}),
         |supplier_performance AS (
         |  SELECT "SUPPLIER_ID" AS SUPPLIER_ID,
         |         "TOTAL_REVENUE" AS TOTAL_REVENUE,
         |         "TOTAL_PRODUCTS_SOLD" AS TOTAL_PRODUCTS_SOLD,
         |         "TOP_SELLING_PRODUCT" AS TOP_SELLING_PRODUCT
         |  FROM sp_full),
         |csr_full AS (${CustomerSalesReport.oracleSql}),
         |customer_sales_report AS (
         |  SELECT "SALE_ID" AS SALE_ID, "SALE_DATE" AS SALE_DATE,
         |         "SALE_MONTH" AS SALE_MONTH, "SALE_YEAR" AS SALE_YEAR,
         |         "SALE_AMOUNT" AS SALE_AMOUNT
         |  FROM csr_full),
         |${OracleCtes.suppliers},
         |${OracleCtes.products},
         |${OracleCtes.sales}
         |""".stripMargin
    sql.map { case (name, text) => name -> (martCtes + text) } +
      // Oracle for the verbatim row: aliases pin DuckDB's output names to
      // the names Spark GENERATES for the unaliased reference text
      // (`sum(TOTAL_PRODUCTS_SOLD)` etc. — the driver compares columns by
      // name); sums cast to the Spark result types (sum of BIGINT is
      // BIGINT in Spark, HUGEINT in DuckDB).
      ("sql_supplier_perf_verbatim" -> (martCtes +
        // money reaches the verbatim reads as DECIMAL(38,6) (the legacy
        // schema's NUMERIC-style typing); the twin sums the same exact
        // decimal and renders ROUND(..,2)::DOUBLE — matching the Spark
        // side's hashStablePresentation projection
        """SELECT "SUPPLIER_ID" AS "SUPPLIER_ID",
          |       CAST(SUM("TOTAL_PRODUCTS_SOLD") AS BIGINT) AS "sum(TOTAL_PRODUCTS_SOLD)",
          |       CAST(ROUND(SUM(CAST("TOTAL_REVENUE" AS DECIMAL(38,6))), 2) AS DOUBLE) AS "sum(TOTAL_REVENUE)"
          |FROM supplier_performance
          |GROUP BY "SUPPLIER_ID" ORDER BY "SUPPLIER_ID"""".stripMargin)) +
      ("sql_payment_mode_verbatim" -> (martCtes +
        """SELECT payment_mode AS "PAYMENT_MODE", count(*) AS "COUNT"
          |FROM sales GROUP BY payment_mode ORDER BY payment_mode""".stripMargin)) +
      ("sql_product_contrib_verbatim" -> (martCtes +
        """SELECT s.region AS "REGION",
          |       CAST(count(p.product_id) AS BIGINT) AS "count(PRODUCT_ID)"
          |FROM products p
          |JOIN suppliers s ON trim(s.supplier_id) = trim(p.supplier_id)
          |GROUP BY s.region ORDER BY s.region""".stripMargin)) +
      // the inner subquery replays the TEXT's own order + LIMIT (month
      // asc, year DESC) so the kept 100-row subset matches Spark's; the
      // outer ORDER BY is the presentation order the harness applies
      ("sql_monthly_heatmap_verbatim" -> (martCtes +
        """SELECT * FROM (
          |  SELECT CONCAT(
          |           CASE SALE_MONTH
          |             WHEN 'January' THEN '01' WHEN 'February' THEN '02'
          |             WHEN 'March' THEN '03' WHEN 'April' THEN '04'
          |             WHEN 'May' THEN '05' WHEN 'June' THEN '06'
          |             WHEN 'July' THEN '07' WHEN 'August' THEN '08'
          |             WHEN 'September' THEN '09' WHEN 'October' THEN '10'
          |             WHEN 'November' THEN '11' WHEN 'December' THEN '12'
          |           END, ' - ', SALE_MONTH) AS SALE_MONTH_ORDERED,
          |         SALE_YEAR,
          |         CAST(ROUND(SUM(CAST(SALE_AMOUNT AS DECIMAL(38,6))), 2) AS DOUBLE) AS SUM_SALE
          |  FROM customer_sales_report
          |  GROUP BY SALE_MONTH, SALE_YEAR
          |  ORDER BY SALE_MONTH_ORDERED ASC, SALE_YEAR DESC
          |  LIMIT 100)
          |ORDER BY SALE_MONTH_ORDERED, SALE_YEAR""".stripMargin)) +
      ("sql_revenue_region_verbatim" -> (martCtes +
        """SELECT s.region AS "REGION",
          |       CAST(ROUND(SUM(CAST(sp.TOTAL_REVENUE AS DECIMAL(38,6))), 2) AS DOUBLE) AS "REGIONAL_REVENUE"
          |FROM supplier_performance sp
          |JOIN suppliers s ON trim(s.supplier_id) = trim(sp.SUPPLIER_ID)
          |GROUP BY s.region ORDER BY s.region""".stripMargin))
  }
}
