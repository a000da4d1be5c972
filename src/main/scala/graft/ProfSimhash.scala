package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute dd_simhash_pairs cost (VERDICT r10 #1 — the
  * suite's steepest scale exponent, b = 0.89). Round-11 measurements:
  * composite r-subset keys cut CHANCE candidates (1.13B → 423M at 30×)
  * but genuine near-dup clusters meet on EVERY subset key (9× → 45×
  * duplicate meetings), so wall time is flat; fingerprints are 99%
  * distinct (dup factor 1.01), so collapsing identical fps is no
  * lever either. This pass measures where the candidate mass lives:
  * the (band, bucket) df distribution and the candidate/output split
  * by bucket df tier — the evidence for (or against) a df cap.
  */
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxDist = 8
    val spark = GraftSession.builder(appName = "graft-prof-simhash",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val sh = graft.functions.Dedup.simhash(docs)
    sh.count() // warm the shared fingerprint memo

    val layout = graft.functions.Dedup.simhashBandLayout(maxDist + 1)
    def bucketOf(c: org.apache.spark.sql.Column, start: Int, mask: Long) =
      shiftright(c, start).bitwiseAND(mask)
    val bands = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(layout.map { case (_, s, m) =>
        bucketOf(col("simhash"), s, m) }: _*)).as(Seq("band", "bucket")))

    // df distribution: candidates contributed per df tier
    val dfs = bands.groupBy("band", "bucket").agg(count(lit(1)).as("df"))
    dfs.withColumn("tier",
        when(col("df") <= 64, "a<=64")
          .when(col("df") <= 256, "b<=256")
          .when(col("df") <= 1024, "c<=1024")
          .when(col("df") <= 4096, "d<=4096")
          .otherwise("e>4096"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_buckets"), sum("df").as("n_rows"),
        sum(col("df") * (col("df") - 1) / 2).as("n_candidates"))
      .orderBy("tier")
      .collect().foreach(r => println(s"[prof] tier=${r.get(0)} buckets=${r.get(1)} rows=${r.get(2)} cands=${r.get(3)}"))

    // output pairs whose ONLY clean band is a hot one (what a cap would
    // lose): per output pair, the min df over its clean bands
    val xor = col("sh_a").bitwiseXOR(col("sh_b"))
    val pairs = bands.toDF("doc_a", "sh_a", "band", "bucket")
      .join(bands.toDF("doc_b", "sh_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(graft.functions.Dedup.hamming(col("sh_a"), col("sh_b")) <= maxDist)
      .join(dfs, Seq("band", "bucket"))
      .groupBy("doc_a", "doc_b").agg(min("df").as("min_df"))
    pairs.withColumn("tier",
        when(col("min_df") <= 64, "a<=64")
          .when(col("min_df") <= 256, "b<=256")
          .when(col("min_df") <= 1024, "c<=1024")
          .when(col("min_df") <= 4096, "d<=4096")
          .otherwise("e>4096"))
      .groupBy("tier").agg(count(lit(1)).as("n_pairs"))
      .orderBy("tier")
      .collect().foreach(r => println(s"[prof] pair_min_df_tier=${r.get(0)} pairs=${r.get(1)}"))

    for (r <- 1 to 2) {
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.functions.Dedup
          .simhashPairs(docs, maxDist, cleanBands = r).count()
        println(f"[prof] r=$r pass$pass pairs ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
    }
    spark.stop()
  }
}
