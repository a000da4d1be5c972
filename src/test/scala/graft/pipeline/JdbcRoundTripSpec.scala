package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Ingest

/** Live JDBC round-trip against embedded Derby (ships with Spark's
  * jars): proves the S1/S2 readers and the K1 writer against a real
  * database engine, not just the option surface — overwrite creates the
  * table, append accumulates, the pushdown query executes source-side.
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private lazy val schemaReady: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute("CREATE SCHEMA legacy")
    finally conn.close()
  }

  test("K1 overwrite creates the table; S1 scan reads it back") {
    schemaReady
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "amount")
    val n = LayerWriter.writeJdbc(df, JdbcSink.Config(url, props),
      "legacy", "sales", "overwrite")
    assert(n == 2, "post-write count reports the written rows")
    val back = Ingest.readJdbc(spark, url, "legacy.sales", props)
    assert(back.count() == 2)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("amount", "id", "name"))
    val amounts = back.collect().map(_.getAs[Double]("amount")).sorted
    assert(amounts.toSeq == Seq(1.5, 2.5))
  }

  test("K1 append accumulates; S2 pushdown query filters source-side") {
    schemaReady
    import spark.implicits._
    val df = Seq((3L, "c", 3.5)).toDF("id", "name", "amount")
    LayerWriter.writeJdbc(df, JdbcSink.Config(url, props),
      "legacy", "sales2", "overwrite")
    LayerWriter.writeJdbc(df, JdbcSink.Config(url, props),
      "legacy", "sales2", "append")
    assert(Ingest.readJdbc(spark, url, "legacy.sales2", props).count() == 2)
    // Spark writes case-preserving quoted identifiers — the pushdown SQL
    // runs in Derby's dialect, so it must quote them too
    val q = Ingest.readJdbcQuery(spark, url,
      """SELECT "id", "amount" FROM legacy.sales2 WHERE "amount" > 3""", props)
    assert(q.count() == 2 && q.columns.length == 2)
  }
}
