package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** Dev-only profiling main: attributes time inside the graph-family
  * queries (trained-cents fill, knnGraph memo hit, downstream iterative
  * ops) so a regression can be located instead of guessed at.
  */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(appName = "graft-prof",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val e = Tables.embeddings(spark, sfDir)
    val cents = t("trainCentroids build+cache+count") {
      val c = Similarity.trainCentroids(e, k = 16, iters = 2).cache()
      c.count(); c
    }
    t("cents.collect (cached)") { cents.collect() }

    t("knnGraph 1st (build+count)") {
      Similarity.knnGraph(e, cents, k = 5, nprobe = 4).count() }
    t("knnGraph 2nd (memo-hit count)") {
      Similarity.knnGraph(e, cents, k = 5, nprobe = 4).count() }
    t("knnGraph 3rd plan-construct only") {
      Similarity.knnGraph(e, cents, k = 5, nprobe = 4) }
    val g = t("knnGraph 4th (memo hit)") {
      Similarity.knnGraph(e, cents, k = 5, nprobe = 4)
        .select(col("src"), col("dst")) }

    t("pageRank on memoized graph") { graft.operators.PageRank.pageRank(g).count() }
    t("pageRank again") { graft.operators.PageRank.pageRank(g).count() }
    val gl = t("edge collect to local") {
      val rows = g.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 4), g.schema)
    }
    t("pageRank on local edges") { graft.operators.PageRank.pageRank(gl).count() }
    val mutual = t("mutual intersect count") {
      val m = g.intersect(g.select(col("dst").as("src"), col("src").as("dst")))
      m.count(); m
    }
    t("linkpred on mutual") {
      graft.operators.LinkPred.commonNeighborPairs(mutual).count() }
    t("linkpred again") {
      graft.operators.LinkPred.commonNeighborPairs(mutual).count() }
    spark.stop()
  }
}
