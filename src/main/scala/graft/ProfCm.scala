package graft

import graft.core.{GraftSession, Money, RunClock}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: attribute m_customer_metrics' cost (slowest mart at sf1)
  * before optimizing. Compares the current single-pass form (customer
  * dim strings ride the fact shuffle + window) against a narrow-key
  * variant (fact pre-agg on (customer_id, payment_mode) only, dims
  * joined back at customer grain).
  */
object ProfCm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-cm",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val clock = RunClock.fixed

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val customers = sources.Entities.customers(spark, sfDir)
    val products = sources.Entities.products(spark, sfDir)
    val sales = sources.Entities.salesCached(spark, sfDir)

    // narrow variant: fact agg on (customer_id, payment_mode) only
    val prod = products.select("product_id", "selling_price")
    val factAgg = sales
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
    val w = Window.partitionBy("customer_id")
    val wMode = w.orderBy(desc("agg_cnt"), asc_nulls_first("payment_mode"))
    val perCust = factAgg
      .withColumn("agg_total_orders", sum(col("p_total_orders")).over(w))
      .withColumn("agg_last_purchase_date", max(col("p_last_purchase")).over(w))
      .withColumn("agg_first_purchase_date", min(col("p_first_purchase")).over(w))
      .withColumn("agg_total_shipping_cost", sum(col("p_shipping")).over(w))
      .withColumn("agg_expenditure", sum(col("p_expenditure")).over(w))
      .withColumn("agg_total_amount_savings", sum(col("p_savings")).over(w))
      .withColumn("agg_delivered_orders_count", sum(col("p_delivered")).over(w))
      .withColumn("agg_cancelled_orders_count", sum(col("p_cancelled")).over(w))
      .withColumn("rnk", row_number().over(wMode))
      .filter(col("rnk") === 1)
    val variant = customers.join(perCust, Seq("customer_id"), "left")

    // variant2: replace the window with a second-level groupBy; the mode
    // is the min of struct(-cnt, mode-not-null, mode) — exactly the
    // (cnt desc, mode asc nulls first) window ordering
    def mkVariant2() = {
    val factAgg = sales
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
    customers.join(custAgg, Seq("customer_id"), "left")
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
    val variant2full = mkVariant2()

    // isolate: fact agg alone, wide-key fact agg alone
    val wideAgg = customers.alias("c")
      .join(sales.alias("s"), col("s.customer_id") === col("c.customer_id"),
        "left")
      .join(broadcast(prod.alias("p")),
        col("p.product_id") === col("s.product_id"), "left")
      .groupBy(col("c.customer_id"), col("c.name"), col("c.city"),
        col("c.email"), col("c.phone_number"), col("s.payment_mode"))
      .agg(count(lit(1)).as("agg_cnt"),
        Money.moneySum(col("s.quantity") * col("p.selling_price"))
          .as("p_expenditure"))

    for (round <- 1 to 3) {
      t(s"r$round salesCached fill/read")(sales.count())
      t(s"r$round variant2 (two-level groupBy, fresh)")(mkVariant2().count())
      t(s"r$round current build full (fresh)")(
        marts.CustomerMetrics.build(customers, products, sales, clock).count())
    }
    val cur = marts.CustomerMetrics.build(customers, products, sales, clock)
    println("[prof] variant2 EXCEPT current: " + variant2full.except(cur).count()
      + " / current EXCEPT variant2: " + cur.except(variant2full).count())
    spark.stop()
  }
}
