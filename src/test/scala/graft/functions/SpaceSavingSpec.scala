package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
  private lazy val tokens = docs.select(
    explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))

  test("with capacity >= distinct values the sketch is exact") {
    val nDistinct = tokens.distinct().count().toInt
    val sketch = tokens
      .agg(SpaceSavingTopK.topkSketch(col("token"), nDistinct + 8).as("m"))
      .selectExpr("explode(m) AS (token, est)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokens.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == exact)
  }

  test("under capacity pressure: overestimates bounded by n/capacity") {
    val capacity = 8
    val n = tokens.count()
    val sketch = tokens
      .agg(SpaceSavingTopK.topkSketch(col("token"), capacity).as("m"))
      .selectExpr("explode(m) AS (token, est)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= capacity)
    val exact = tokens.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch.foreach { case (tok, est) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(est >= truth, s"$tok underestimated")
      assert(est - truth <= n / capacity, s"$tok error above bound")
    }
    // every true heavy hitter above the guarantee threshold is retained
    exact.filter(_._2 > n / capacity).keys.foreach { hh =>
      assert(sketch.contains(hh), s"heavy hitter $hh lost")
    }
  }

  test("sketch works per group and in partial aggregation") {
    val perLang = docs.select(col("lang"),
        explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))
      .repartition(13)
      .groupBy("lang")
      .agg(SpaceSavingTopK.topkSketch(col("token"), 1000).as("m"))
    assert(perLang.count() == docs.select("lang").distinct().count())
    val en = perLang.filter(col("lang") === "en")
      .selectExpr("explode(m) AS (token, est)")
    assert(en.count() > 0)
  }
}
