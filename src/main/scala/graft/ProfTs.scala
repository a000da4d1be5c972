package graft

import graft.core.GraftSession

/** Dev-only: attribute the ts-family leaders' cost (VERDICT r10 #3 —
  * ts_novelty 1.54 s / ts_dsir 1.53 s at sf0.1, b ≈ 0.47, both
  * re-deriving corpus-wide statistic frames). Warm passes over the gate
  * entries, plus the cross-query sharing check: novelty after
  * dd_ngram_jaccard should hit the shared distinctShingles memo.
  */
object ProfTs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-ts",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    for (name <- Seq("ts_novelty", "ts_dsir", "dd_ngram_jaccard");
         pass <- 1 to 3)
      t(s"$name pass$pass")(SparkEntry.queries(name)(spark, sfDir).count())
    // cross-query share: novelty again after ngram_jaccard warmed the memo
    t("ts_novelty after dd_ngram_jaccard")(
      SparkEntry.queries("ts_novelty")(spark, sfDir).count())
    spark.stop()
  }
}
/** Stage split for dsir: feats cache read, dist/ratio, weights, sample. */
object ProfDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-dsir",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val isT = col("lang") === "en"
    // warm
    graft.functions.Importance.dsirSample(docs, isT, 200).count()
    for (p <- 1 to 2) {
      t(s"p$p feats-only")(graft.functions.Importance.featsForProf(docs, isT).count())
      t(s"p$p dist")(graft.functions.Importance.featsForProf(docs, isT)
        .groupBy("bucket").agg(sum("nf")).count())
      t(s"p$p weights")(graft.functions.Importance.dsirWeights(docs, isT).count())
      t(s"p$p sample")(graft.functions.Importance.dsirSample(docs, isT, 200).count())
    }
    spark.stop()
  }
}
