package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute dd_substring_spans cost (VERDICT r9 #5) —
  * gram-build+index aggregation vs marked-join vs island window — so
  * the optimization targets the measured stage.
  */
object ProfSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-spans",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val grams = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(graft.functions.TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(graft.functions.Dedup.shinglesFromTokens(col("toks"), 5)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
        md5(col("col")).as("g"))
    val crossDoc = grams.groupBy("g")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("g")
    for (r <- 1 to 3)
      t(s"r$r full duplicateSpans")(
        graft.functions.Dedup.duplicateSpans(docs, k = 5).count())
    val g2 = graft.core.PlanMemo.cached("dedup.spanGrams5", docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(graft.functions.TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(graft.functions.Dedup.shinglesFromTokens(col("toks"), 5)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
        conv(substring(md5(col("col")), 1, 15), 16, 10).cast("long").as("g")))
    val cd2 = g2.groupBy("g")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx")).select("g")
    t("memo grams count")(g2.count())
    t("memo crossDoc agg")(cd2.count())
    t("memo marked join")(g2.join(cd2, "g").count())
    t("memo marked join bcast")(g2.join(broadcast(cd2), "g").count())
    spark.stop()
  }
}
