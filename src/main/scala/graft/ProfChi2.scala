package graft
import graft.core.GraftSession
import org.apache.spark.sql.functions._
object ProfChi2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/repo/testdata_sf1"
    val spark = GraftSession.builder(appName = "prof-chi2",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def mk() = operators.Analytics.chiSquare(
      sources.Tables.events(spark, sfDir)
        .withColumn("value_band", least(floor(col("value") / 64), lit(7)).cast("long")),
      "event_type", "value_band")
    def cellsOnly() = sources.Tables.events(spark, sfDir)
      .withColumn("value_band", least(floor(col("value") / 64), lit(7)).cast("long"))
      .groupBy(col("event_type").as("x"), col("value_band").as("y"))
      .agg(count(lit(1)).as("n"))
    for (r <- 1 to 3) {
      t(s"r$r cells only (fresh)")(cellsOnly().count())
      t(s"r$r chiSquare (fresh)")(mk().count())
    }
    spark.stop()
  }
}
