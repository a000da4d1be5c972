package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute dd_ngram_jaccard cost at sf1 (suite #1 absolute
  * row after round 11's kernel/driver work). Splits: encoded-postings
  * build (memoized), candidate join volume (Σ df² over sids), pair-agg
  * output, and end-to-end warm passes.
  */
object ProfNgram2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-ngram2",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val ds = graft.functions.Dedup.docShingles(docs, 3, 1000)
    t("docShingles fill")(ds.count())
    // candidate volume via df stats (no join)
    val dfs = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
    val cand = dfs.agg(sum(col("df") * (col("df") - 1) / 2)).head.getDouble(0).toLong
    println(s"[prof] candidate pairs (sum df*(df-1)/2) = $cand")
    for (p <- 1 to 3)
      t(s"pass$p dd_ngram_jaccard")(
        SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
