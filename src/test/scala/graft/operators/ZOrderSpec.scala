package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits: known Morton codes") {
    // (x, y) -> morton with x in the low lane: z = yx yx yx ... per bit
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (7L, 7L, 63L), (5L, 3L, 27L), (63L, 0L, 1365L))
    val got = cases.toDF("x", "y", "want")
      .withColumn("z", ZOrder.zvalue(Seq($"x", $"y"), 6))
      .collect()
    got.foreach(r => assert(r.getAs[Long]("z") == r.getAs[Long]("want"),
      s"(${r.getLong(0)},${r.getLong(1)})"))
  }

  test("zvalue round-trips every 2-dim bucket pair and stays bijective") {
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
    val z = grid.toDF("x", "y")
      .select(ZOrder.zvalue(Seq($"x", $"y"), 5).as("z"))
      .collect().map(_.getLong(0))
    assert(z.distinct.length == 1024 && z.min == 0 && z.max == 1023)
  }

  test("out-of-range bucket fails loudly instead of aliasing") {
    val ex = intercept[Exception] {
      Seq(64L).toDF("x").select(ZOrder.zvalue(Seq($"x"), 6)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("zvalueSql mirrors zvalue bit-for-bit (same lattice)") {
    val sqlExpr = ZOrder.zvalueSql(Seq("x", "y"), 6)
    // the generated SQL is engine-neutral integer bit math — evaluate it
    // in Spark itself and compare against the Column form
    val df = (0 until 64).flatMap(x => Seq((x.toLong, (63 - x).toLong)))
      .toDF("x", "y")
    val diff = df.select(
        ZOrder.zvalue(Seq($"x", $"y"), 6).as("a"), expr(sqlExpr).as("b"))
      .filter($"a" =!= $"b")
    assert(diff.isEmpty)
  }

  test("z-order files prune on the non-leading dimension; linear cannot") {
    // 64x64 uniform grid, 64 files. A linear sort on x gives every file
    // the FULL y range (width 64): a predicate on y prunes nothing.
    // Z-order gives each file an exact 8x8 cell: y-width 8, so a point
    // predicate on y hits 1/8 of the files — while x-width widens only
    // from 1 to 8. That trade is the whole point of the curve.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dims = Seq("x" -> $"x", "y" -> $"y")
    val st = ZOrder.fileStats(grid, dims, bits = 6, fileBits = 6)
      .select(avg($"max_y" - $"min_y" + 1).as("yw"),
        avg($"max_x" - $"min_x" + 1).as("xw"), count(lit(1)).as("n"))
      .head
    assert(st.getAs[Long]("n") == 64, "one file per 6-bit z prefix")
    assert(st.getAs[Double]("yw") == 8.0, s"y-width ${st.get(0)} (linear: 64)")
    assert(st.getAs[Double]("xw") == 8.0, "x-width grows 1 -> 8, not 64")
  }

  test("fileStats rejects fileBits outside [1, totalBits]") {
    // fileBits > totalBits would make shiftright's amount negative —
    // Java masks shifts mod 64, producing garbage file groupings
    // SILENTLY; the bound must fail loudly like zvalue's range check
    val df = Seq((1L, 2L)).toDF("x", "y")
    val dims = Seq("x" -> $"x", "y" -> $"y")
    intercept[IllegalArgumentException] {
      ZOrder.fileStats(df, dims, bits = 3, fileBits = 7) // totalBits = 6
    }
    intercept[IllegalArgumentException] {
      ZOrder.fileStats(df, dims, bits = 3, fileBits = 0)
    }
  }
}
