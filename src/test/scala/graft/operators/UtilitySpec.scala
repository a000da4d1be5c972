package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.pipeline.WorkLoader
import graft.quality.{Raptor, RaptorReport}

class UtilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join (inner and left)") {
    val fact = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"))
      .toDF("k", "v")
    val dim = Seq((1, "X"), (2, "Y")).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt)
        .select("k", "v", "w").collect().map(_.toSeq).toSet
      val salted = Salting.saltedJoin(fact, dim, "k", col("v"), 4, jt)
        .select("k", "v", "w").collect().map(_.toSeq).toSet
      assert(salted == plain, s"join type $jt")
    }
  }

  test("salt spreads a hot key across partitions deterministically") {
    val hot = (1 to 1000).map(i => (42, s"row$i")).toDF("k", "v")
    val salted = Salting.withSalt(hot, col("v"), 8)
    assert(salted.select("__salt").distinct().count() == 8)
    val again = Salting.withSalt(hot, col("v"), 8)
    assert(salted.except(again).isEmpty, "deterministic salting")
  }

  test("RaptorReport renders summary, samples, extras with escaping") {
    val src = Seq((1, "a<b"), (2, "y"), (3, "z")).toDF("id", "v")
    val tgt = Seq((1, "a>c"), (2, "y")).toDF("id", "v")
    val html = RaptorReport.render(
      Raptor.compare(src, tgt, Seq("id")), "t & t")
    assert(html.contains("<h3>Run Summary</h3>"))
    assert(html.contains("a&lt;b") && html.contains("a&gt;c"))
    assert(html.contains("t &amp; t"))
    assert(html.contains("mismatch_column_name"))
  }

  test("WorkLoader loads only datasets missing from the target") {
    val src = java.nio.file.Files.createTempDirectory("wl_src").toString
    val dst = java.nio.file.Files.createTempDirectory("wl_dst").toString
    Seq((1, "a")).toDF("id", "v").write.parquet(s"$src/t1")
    Seq((2, "b")).toDF("id", "v").write.parquet(s"$src/t2")
    Seq((9, "x")).toDF("id", "v").write.parquet(s"$dst/t1")
    assert(WorkLoader.missingDatasets(spark, src, dst) == Seq("t2"))
    assert(WorkLoader.loadMissing(spark, src, dst) == Seq("t2"))
    // t1 untouched (not reloaded), t2 copied
    assert(spark.read.parquet(s"$dst/t1").first().getInt(0) == 9)
    assert(spark.read.parquet(s"$dst/t2").first().getInt(0) == 2)
    assert(WorkLoader.loadMissing(spark, src, dst).isEmpty, "idempotent")
  }
}
