package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: VERDICT r13 task 5 receipt — same-box A/B of the
  * exhaustive-join [[graft.functions.Dedup.ngramJaccard]] vs the
  * AllPairs/PPJoin [[graft.functions.Dedup.ngramJaccardPrefix]], with
  * the measured candidate volumes that decide which shape wins on this
  * corpus. Run once per rung: `SPARK_GRAFT_SF_DIR=… runmain.sh
  * graft.ProfNgramAb`.
  */
object ProfNgramAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-ngram-ab",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val cal = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[prof] calibration $cal%.3f s  sf=$sfDir")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val ds = graft.functions.Dedup.docShingles(docs, 3, 1000)
    ds.count() // shared memo fill off both arms' clocks

    // exhaustive-join candidate volume: Σ df(df−1)/2
    val dfs = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
    val exCand = dfs.agg(
      sum(col("df") * (col("df") - 1) / 2).cast("long")).head.getLong(0)
    val dfMax = dfs.agg(max("df")).head.getLong(0)
    // prefix-join candidate volume at t=0.5 (the shipped threshold):
    // distinct pairs sharing a rarity-prefix shingle
    val w = org.apache.spark.sql.expressions.Window
    val byDoc = w.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val ranked = ds.join(dfs, "shingle")
      .select(col("doc_id"), col("shingle"),
        row_number().over(byDoc).as("pos"),
        count(lit(1)).over(w.partitionBy("doc_id")).as("sz"))
    val prefix = ranked.filter(col("pos") <=
      col("sz") - ceil(lit(0.5) * col("sz") - lit(1e-9)) + 1)
    val pfPostings = prefix.count()
    val allPostings = ds.count()
    val pfCand = prefix.select(col("doc_id").as("a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    println(s"[prof] df_max=$dfMax  exhaustive_cand=$exCand  " +
      s"prefix_cand=$pfCand (${100.0 * pfCand / exCand.max(1)}%)  " +
      s"prefix_postings=$pfPostings/$allPostings")

    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag pass$p ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    time("exhaustive ")(graft.functions.Dedup
      .ngramJaccard(docs).count())
    time("prefix     ")(graft.functions.Dedup
      .ngramJaccardPrefix(docs).count())
    spark.stop()
  }
}
