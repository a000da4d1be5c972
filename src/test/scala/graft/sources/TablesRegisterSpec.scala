package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The registerAll idempotence guard (round 12): a repeat call with the
  * same sfDir must be a no-op (ten fresh parquet relations per call
  * were ~10 scheduled jobs of pure overhead in every SQL-front-door
  * bench invocation), an sfDir CHANGE must re-register, and the views
  * must actually resolve through the SQL front door.
  */
class TablesRegisterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("registerAll registers all ten views and is idempotent per dir") {
    Tables.registerAll(spark, sfDir)
    Tables.names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n must exist")
    }
    val before = spark.table("orders")
    // repeat: the guard must skip re-registration — the catalog still
    // serves the SAME view plan (semantically; object identity of the
    // analyzed plan is the cheap proxy local mode gives us)
    Tables.registerAll(spark, sfDir)
    assert(spark.table("orders").queryExecution.analyzed
      .sameResult(before.queryExecution.analyzed),
      "repeat registerAll must not swap the registered relations")
    assert(spark.sql("SELECT count(*) FROM region").collect()(0).getLong(0) == 5)
  }

  test("an sfDir change re-registers over the guard") {
    Tables.registerAll(spark, sfDir)
    val small = spark.sql("SELECT count(*) FROM orders").collect()(0).getLong(0)
    Tables.registerAll(spark, "/root/testdata/sf0.01")
    val big = spark.sql("SELECT count(*) FROM orders").collect()(0).getLong(0)
    assert(big > small, "dir change must serve the NEW dir's relations")
    // restore for sibling tests in the shared session
    Tables.registerAll(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM orders")
      .collect()(0).getLong(0) == small)
  }
}
