package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives the reference's four source entities (FIXTURES.md §1/§3) from
  * the TPC-H-ish testdata. This is the engine's ingestion layer analogue:
  * the reference ingests REST-JSON/CSV and imposes canonical names
  * positionally (`ingestion_tasks.py:48-52,121-126,196-204,280-289`); we
  * derive the same shapes from parquet, with schemas pinned explicitly.
  *
  * Every derivation here has a 1:1 SQL rendering in [[OracleCtes]] used by
  * the DuckDB oracle; the two must stay in lock-step.
  *
  * Scale note: suppliers/customers/products are dimension-sized; sales is
  * the fact. Joins against dims are broadcast; the lineitem⨝orders
  * derivation of `sales` is the one genuine shuffle (co-partitioned on
  * orderkey at 100 TB via bucketing on l_orderkey/o_orderkey).
  */
object Entities {

  /** suppliers(supplier_id, supplier_name, contact_details, region) */
  def suppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        col("s_suppkey").cast("string").as("supplier_id"),
        col("s_name").as("supplier_name"),
        col("n_name").as("contact_details"),
        col("r_name").as("region"))
  }

  /** customers(customer_id, name, city, email, phone_number) */
  def customers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        col("c_custkey").cast("string").as("customer_id"),
        col("c_name").as("name"),
        col("n_name").as("city"),
        concat(col("c_name"), lit("@test")).as("email"),
        col("c_custkey").cast("string").as("phone_number"))
  }

  /** products(product_id, product_name, category, selling_price,
    * cost_price, stock_quantity, reorder_level, supplier_id).
    * The supplier FK is modular over the supplier count, computed in-plan
    * (broadcast scalar) rather than via a driver-side `.count()`.
    */
  def products(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val nSup = Tables.supplier(spark, sfDir)
      .agg(count(lit(1)).as("n_suppliers"))
    graft.core.Scalars.crossBroadcast(p, nSup)
      .select(
        col("p_partkey").cast("string").as("product_id"),
        col("p_name").as("product_name"),
        col("p_type").as("category"),
        col("p_retailprice").as("selling_price"),
        round(col("p_retailprice") * 0.6, 2).as("cost_price"),
        (col("p_size") * 100).as("stock_quantity"),
        col("p_size").as("reorder_level"),
        (lit(1) + col("p_partkey") % col("n_suppliers"))
          .cast("string").as("supplier_id"))
  }

  /** [[sales]] routed through the session [[graft.core.PlanMemo]]: the
    * conformed fact is the one genuinely shuffle-shaped entity
    * derivation (lineitem⨝orders), and a query stream — a bench pass,
    * an interactive session, a reporting fan-out — re-pays that join on
    * every call through the plain derivation. One cached fill per
    * (session, sfDir) serves every mart/analytics consumer; same
    * session-reuse discipline as the kNN-graph and curation memos, and
    * the query-stream analogue of the pipeline's conform-once seam
    * ([[graft.pipeline.MetaMorphPipeline]] conformSources).
    */
  def salesCached(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.PlanMemo.cached("entities.sales", sales(spark, sfDir))

  /** sales(sale_id, customer_id, product_id, sale_date, quantity,
    * discount, shipping_cost, order_status, payment_mode).
    * Discount is a percentage 0–17 (reference stores percent,
    * `Rest-API/main.py:182`), statuses/payment modes are deterministic
    * functions of the order key so Spark and the oracle agree.
    */
  def sales(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("sale_id"),
        col("o_custkey").cast("string").as("customer_id"),
        col("l_partkey").cast("string").as("product_id"),
        col("l_shipdate").cast("date").as("sale_date"),
        col("l_quantity").cast("int").as("quantity"),
        (col("l_discount") * 100).as("discount"),
        round(col("l_tax") * 100, 2).as("shipping_cost"),
        when(col("o_orderstatus") === "F", "Delivered")
          .when(col("o_orderstatus") === "P", "Cancelled")
          .when(col("l_orderkey") % 2 === 0, "Pending")
          .otherwise("Shipped").as("order_status"),
        when(col("l_orderkey") % 4 === 0, "Credit Card")
          .when(col("l_orderkey") % 4 === 1, "Debit Card")
          .when(col("l_orderkey") % 4 === 2, "UPI")
          .otherwise("Cash on Delivery").as("payment_mode"))
  }
}

/** DuckDB-SQL renderings of [[Entities]], prefixed to every oracle query
  * (SparkEntry.oracleSql). Table names are the bare parquet view names the
  * driver registers. MUST produce value-identical results to [[Entities]].
  */
object OracleCtes {
  val suppliers: String =
    """suppliers AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS supplier_id,
      |         s_name AS supplier_name,
      |         n_name AS contact_details,
      |         r_name AS region
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)""".stripMargin

  val customers: String =
    """customers AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
      |         c_name AS name,
      |         n_name AS city,
      |         c_name || '@test' AS email,
      |         CAST(c_custkey AS VARCHAR) AS phone_number
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey)""".stripMargin

  val products: String =
    """products AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS product_id,
      |         p_name AS product_name,
      |         p_type AS category,
      |         p_retailprice AS selling_price,
      |         ROUND(p_retailprice * 0.6, 2) AS cost_price,
      |         p_size * 100 AS stock_quantity,
      |         p_size AS reorder_level,
      |         CAST(1 + p_partkey % n_suppliers AS VARCHAR) AS supplier_id
      |  FROM part
      |  CROSS JOIN (SELECT count(*) AS n_suppliers FROM supplier))""".stripMargin

  val sales: String =
    """sales AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS sale_id,
      |         CAST(o_custkey AS VARCHAR) AS customer_id,
      |         CAST(l_partkey AS VARCHAR) AS product_id,
      |         CAST(l_shipdate AS DATE) AS sale_date,
      |         CAST(l_quantity AS INT) AS quantity,
      |         l_discount * 100 AS discount,
      |         ROUND(l_tax * 100, 2) AS shipping_cost,
      |         CASE WHEN o_orderstatus = 'F' THEN 'Delivered'
      |              WHEN o_orderstatus = 'P' THEN 'Cancelled'
      |              WHEN l_orderkey % 2 = 0 THEN 'Pending'
      |              ELSE 'Shipped' END AS order_status,
      |         CASE l_orderkey % 4 WHEN 0 THEN 'Credit Card'
      |              WHEN 1 THEN 'Debit Card'
      |              WHEN 2 THEN 'UPI'
      |              ELSE 'Cash on Delivery' END AS payment_mode
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** WITH-clause prefix containing all four entities. */
  def withAll: String =
    s"WITH ${Seq(suppliers, customers, products, sales).mkString(",\n")}\n"

  def withEntities(names: String*): String =
    s"WITH ${names.map {
      case "suppliers" => suppliers
      case "customers" => customers
      case "products"  => products
      case "sales"     => sales
    }.mkString(",\n")}\n"
}
