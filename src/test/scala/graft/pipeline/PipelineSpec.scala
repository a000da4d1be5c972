package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.RunClock

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(): LayerCatalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    LayerCatalog(dir)
  }

  test("daily run materializes all layers in dependency order") {
    val cat = freshCatalog()
    val order = MetaMorphPipeline.runDaily(spark, TestSpark.sf, cat,
      RunClock.fixed)
    assert(order.indexOf("ingest_suppliers") < order.indexOf("m_supplier_performance"))
    assert(order.indexOf("m_supplier_performance") < order.indexOf("m_customer_sales_report"))
    val sp = spark.read.parquet(cat.legacy("supplier_performance"))
    assert(sp.count() > 0 && sp.columns.contains("DAY_DT"))
    val cm = spark.read.parquet(cat.legacy("CUSTOMER_METRICS"))
    assert(cm.count() > 0)
    val export = spark.read.parquet(cat.reporting("supplier_performance"))
    assert(export.count() == sp.count(), "today's slice fully exported")
    // export fan-out parity: all 7 reporting datasets the reference
    // exports (meta_morph_etl.py:54-61) — the 4 sources + 3 marts
    val exported = Seq("suppliers", "customers", "products", "sales",
      "supplier_performance", "product_performance", "customer_sales_report")
    exported.foreach { t =>
      assert(spark.read.parquet(cat.reporting(t)).count() > 0,
        s"reporting export missing for $t")
    }
  }

  test("JDBC sink surface: mode map and schema-qualified dbtable") {
    assert(JdbcSink.saveMode("append") == org.apache.spark.sql.SaveMode.Append)
    assert(JdbcSink.saveMode("Overwrite") ==
      org.apache.spark.sql.SaveMode.Overwrite)
    assertThrows[IllegalArgumentException] { JdbcSink.saveMode("merge") }
    assert(JdbcSink.qualifiedTable("legacy", "sales") == "legacy.sales")
    assertThrows[IllegalArgumentException] {
      JdbcSink.qualifiedTable("legacy", "sales; DROP TABLE x")
    }
    assertThrows[IllegalArgumentException] {
      JdbcSink.qualifiedTable("bad-schema", "sales")
    }
  }

  test("DAY_DT partition pruning is physical in the legacy layer") {
    val cat = freshCatalog()
    MetaMorphPipeline.runDaily(spark, TestSpark.sf, cat, RunClock.fixed)
    val plan = spark.read.parquet(cat.legacy("supplier_performance"))
      .filter(col("DAY_DT") === lit(RunClock.fixed.runDate))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("DAY_DT = "),
      s"day filter should prune partitions, not scan+filter:\n$plan")
  }

  test("second-day run MERGEs customer metrics (LOAD kept, UPDATE moves)") {
    val cat = freshCatalog()
    val d1 = RunClock(java.sql.Date.valueOf("2001-11-04"),
      java.sql.Timestamp.valueOf("2001-11-04 00:00:00"))
    val d2 = RunClock.fixed
    MetaMorphPipeline.runDaily(spark, TestSpark.sf, cat, d1)
    MetaMorphPipeline.runDaily(spark, TestSpark.sf, cat, d2)
    val cm = spark.read.parquet(cat.legacy("CUSTOMER_METRICS"))
    val row = cm.orderBy("CUSTOMER_ID").first()
    val load = row.getAs[java.sql.Timestamp]("LOAD_TIMESTAMP")
    val upd = row.getAs[java.sql.Timestamp]("UPDATE_TIMESTAMP")
    assert(load == d1.loadTs, "matched rows keep day-1 LOAD_TIMESTAMP")
    assert(upd == d2.loadTs, "UPDATE_TIMESTAMP advances to day 2")
    // ACTIVE flag is day-2 truth now
    assert(cm.filter(col("ACTIVE_CUSTOMER_FLAG") === "TRUE").count() >= 0)
  }

  test("backfill replays oldest-first and accumulates history") {
    val cat = freshCatalog()
    MetaMorphPipeline.backfill(spark, TestSpark.sf, cat, RunClock.fixed, 3)
    val sp = spark.read.parquet(cat.legacy("supplier_performance"))
    assert(sp.select("DAY_DT").distinct().count() == 3)
  }

  test("multi-day backfill does not inflate customer metrics") {
    val one = freshCatalog(); val three = freshCatalog()
    MetaMorphPipeline.runDaily(spark, TestSpark.sf, one, RunClock.fixed)
    MetaMorphPipeline.backfill(spark, TestSpark.sf, three, RunClock.fixed, 3)
    def totals(cat: LayerCatalog) =
      spark.read.parquet(cat.legacy("CUSTOMER_METRICS"))
        .select("CUSTOMER_ID", "TOTAL_ORDERS", "EXPENDITURE")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    assert(totals(one) == totals(three),
      "replayed history must not multiply the metrics aggregates")
  }

  test("conform pins names positionally and casts explicitly") {
    import spark.implicits._
    val weird = Seq(("1", "n", "c", "e", "p")).toDF("a", "b", "c", "d", "e")
    val out = Conform.conform(weird, "customers")
    assert(out.columns.toSeq == Seq("customer_id", "name", "city", "email",
      "phone_number"))
    assertThrows[IllegalArgumentException] {
      Conform.conform(weird.drop("e"), "customers")
    }
  }
}
