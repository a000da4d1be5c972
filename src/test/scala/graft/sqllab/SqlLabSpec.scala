package graft.sqllab

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SqlLabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("verbatim texts are byte-identical to the reference .sql files") {
    def ref(rel: String): String = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/Superset-Query-Lab/$rel")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(SqlLab.verbatimSupplierPerfSql ==
      ref("Suppliers/Supplier_Performance_By_Revenue.sql"))
    assert(SqlLab.verbatimPaymentModeSql ==
      ref("Sales/Payment_Mode_Distribution.sql"))
    assert(SqlLab.verbatimProductContribSql ==
      ref("Suppliers/Product_Contribution_By_Region.sql"))
    assert(SqlLab.verbatimMonthlyHeatmapSql ==
      ref("Sales/Monthly_Sales_Heatmap.sql"))
    assert(SqlLab.verbatimRevenueByRegionSql ==
      ref("Sales/Revenue_By_Region.sql"))
  }

  test("queries stay pure in (session, sfDir) when the dir alternates") {
    val q = SqlLab.queries("sql_payment_mode_dist")
    def total(d: String): Long =
      q(spark, d).collect().map(_.getLong(1)).sum
    val a1 = total("/root/testdata/sf0.001")
    val b = total("/root/testdata/sf0.01")
    val a2 = total("/root/testdata/sf0.001")
    assert(a1 == a2, "switching back must re-register the views")
    assert(b > a1, "larger scale factor has more sales")
  }
}
