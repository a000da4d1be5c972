package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def psiOf(rows: Seq[(Long, Boolean)]): Double = {
    val df = rows.toDF("v", "w")
    Drift.psi(df, col("v"), col("w"), binWidth = 10, nBins = 5)
      .collect().head.getAs[Double]("psi")
  }

  test("identical distributions have PSI exactly zero") {
    // same values on both sides → p = q in every bin → ln(1) = 0 terms
    val vals = Seq(5L, 15L, 25L, 25L, 35L)
    val psi = psiOf(vals.map(_ -> false) ++ vals.map(_ -> true))
    assert(psi == 0.0, s"psi=$psi")
  }

  test("disjoint distributions read as a population change") {
    // reference mass entirely in bin 0, wave entirely in bin 4
    val psi = psiOf(
      (1 to 50).map(_ => (3L, false)) ++ (1 to 50).map(_ => (47L, true)))
    assert(psi > 0.25, s"psi=$psi must cross the 0.25 alarm bound")
  }

  test("mild shift lands between the conventional bounds") {
    // 80/20 vs 60/40 across two bins
    val ref = (1 to 80).map(_ => (3L, false)) ++ (1 to 20).map(_ => (13L, false))
    val wav = (1 to 60).map(_ => (3L, true)) ++ (1 to 40).map(_ => (13L, true))
    val psi = psiOf(ref ++ wav)
    assert(psi > 0.0 && psi < 0.25, s"psi=$psi")
  }

  test("out-of-range values land in the capped top bin") {
    val out = Drift.psi(Seq((1000L, false), (3L, true)).toDF("v", "w"),
      col("v"), col("w"), binWidth = 10, nBins = 5)
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(0L, 4L), s"buckets $out")
  }

  test("degenerate bin config fails loudly") {
    val df = Seq((1L, false)).toDF("v", "w")
    val ex = intercept[IllegalArgumentException](
      Drift.psi(df, col("v"), col("w"), binWidth = 0))
    assert(ex.getMessage.contains("bad bins"))
  }

  test("KS statistic: hand-computed D and leftmost argmax") {
    // ref {1,1,2,3}: ECDF .5 .75 1 1 | wave {1,3,3,4}: .25 .25 .75 1
    // gaps .25 .50 .25 0 → D = .5 attained only at v=2
    val rows = Seq((1L, false), (1L, false), (2L, false), (3L, false),
      (1L, true), (3L, true), (3L, true), (4L, true))
    val r = Drift.ks(rows.toDF("v", "w"), col("v"), col("w")).collect().head
    assert(r.getAs[Long]("n_ref") == 4 && r.getAs[Long]("n_wave") == 4)
    assert(r.getAs[Double]("ks_d") == 0.5, r.toString)
    assert(r.getAs[Long]("at_value") == 2L, r.toString)
  }

  test("KS of identical samples is zero; argmax tie resolves to min v") {
    val vals = Seq(2L, 5L, 5L, 9L)
    val rows = vals.map(_ -> false) ++ vals.map(_ -> true)
    val r = Drift.ks(rows.toDF("v", "w"), col("v"), col("w")).collect().head
    assert(r.getAs[Double]("ks_d") == 0.0, r.toString)
    // every value attains D=0; leftmost wins
    assert(r.getAs[Long]("at_value") == 2L, r.toString)
  }
}
