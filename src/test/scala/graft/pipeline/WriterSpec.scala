package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.streaming.EventsStream

class WriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  test("overwriteDaily replaces only the written DAY_DT partitions") {
    val dest = java.nio.file.Files.createTempDirectory("graft_ow").toString + "/t"
    val d1 = Seq((1, day("2001-11-04")), (2, day("2001-11-04")))
      .toDF("id", "DAY_DT")
    val d2 = Seq((3, day("2001-11-05"))).toDF("id", "DAY_DT")
    LayerWriter.overwriteDaily(d1, dest)
    LayerWriter.overwriteDaily(d2, dest)
    assert(spark.read.parquet(dest).count() == 3, "both days present")
    // re-run day 2 with different content: replaces, never duplicates
    val d2b = Seq((4, day("2001-11-05")), (5, day("2001-11-05")))
      .toDF("id", "DAY_DT")
    LayerWriter.overwriteDaily(d2b, dest)
    val after = spark.read.parquet(dest)
    assert(after.count() == 4)
    assert(after.filter(col("DAY_DT") === day("2001-11-04")).count() == 2,
      "untouched partition intact")
    assert(after.filter(col("DAY_DT") === day("2001-11-05"))
      .select("id").as[Int].collect().toSet == Set(4, 5))
  }

  test("CSV drop-dir streaming ingests files as they appear") {
    val drop = java.nio.file.Files.createTempDirectory("graft_drop")
    val schema = StructType(Seq(
      StructField("sale_id", LongType),
      StructField("amount", DoubleType)))
    java.nio.file.Files.writeString(drop.resolve("sales_1.csv"),
      "sale_id,amount\n1,10.5\n2,20.0\n")
    val stream = EventsStream.csvDropStream(spark, drop.toString, schema)
    assert(stream.isStreaming)
    val q = stream.groupBy().agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("drop_test").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("drop_test").first()
      assert(r1.getLong(0) == 2 && r1.getDouble(1) == 30.5)
      // second daily drop arrives
      java.nio.file.Files.writeString(drop.resolve("sales_2.csv"),
        "sale_id,amount\n3,9.5\n")
      q.processAllAvailable()
      val r2 = spark.table("drop_test").first()
      assert(r2.getLong(0) == 3 && r2.getDouble(1) == 40.0)
    } finally q.stop()
  }
}
