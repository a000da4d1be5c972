package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.pipeline.LayerWriter

class ExtensionsSpec extends AnyFunSuite {

  // a dedicated session: extensions bind at build time, and the
  // bucketing test needs a session catalog with a scratch warehouse
  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    // a shared TestSpark session may already be the default; clear the
    // handles so getOrCreate builds a NEW session (same SparkContext)
    // with the extensions actually applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("fnv1a64 is callable from SQL via GraftExtensions") {
    val h = spark.sql("SELECT fnv1a64('hello world') AS h").first().getLong(0)
    assert(h == 0x779a65e7023cd2e7L, "published FNV-1a-64 test vector")
    assert(spark.sql("SELECT fnv1a64(NULL)").first().isNullAt(0))
  }

  test("topk_sketch is callable from SQL and exact at high capacity") {
    import spark.implicits._
    Seq("a", "a", "b", "a", "c", "b").toDF("v").createOrReplaceTempView("vals")
    val m = spark.sql("SELECT topk_sketch(v, 100) AS m FROM vals")
      .selectExpr("explode(m) AS (v, c)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    LayerWriter.writeBucketed(left, "bk_left", "k", 4)
    LayerWriter.writeBucketed(right, "bk_right", "k", 4)
    val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-co-located join must not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }
}
